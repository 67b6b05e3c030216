"""Hashed n-gram importance weighting for data selection (DSIR-style).

Selecting pre-training data that "looks like" a target corpus is usually
done with importance weights over a hashed token vocabulary (Xie et al.
2023, *Data Selection for Language Models via Importance Resampling*): fit
unigram bucket distributions for a target sample and for the background
corpus, then score every background document by the sum of per-token
log-likelihood ratios. Documents scoring high are target-like; resampling
by these weights reshapes the corpus toward the target domain.

Spark-first shape, sized for the 100 TB corpus:

- Token -> bucket hashing is the same md5/hex lattice as
  `operators.splits` — pure JVM codegen, replayable bit-for-bit in ANSI
  SQL, no Python in the hot path.
- The bucket distributions are tiny (``num_buckets`` rows, default 1024)
  regardless of corpus size: fitting is one map-side-combined groupBy,
  and the two count vectors are collected to the driver exactly like the
  IVF centroid training in `operators.similarity` (a deliberate,
  bounded collect — not a driver-side loop over data).
- Log-ratio weights are computed once in Python from the *integer*
  counts and quantized to 2^-20 fixed point. Scoring then sums BIGINT
  weights, never doubles — Spark's shuffle-order-dependent float
  summation can't introduce run-to-run drift (the same trick as
  `stats.hierarchical_stats`), and any SQL engine reproduces the score
  exactly from the same (bucket, weight) table.
- Scoring is explode -> broadcast-join the weight table -> groupBy(doc)
  sum: the only shuffle carries (doc_id, partial bigint sums).

Reference scope note: the reference pipeline has no data-selection stage;
this operator belongs to the training-data-pipeline surface the graft
brief adds on top of MatsRooth/puddin's cleaning semantics.
"""
from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from puddin_spark.operators.splits import split_bucket_col

SCALE = 1 << 20  # fixed-point denominator for quantized log weights


def token_bucket_col(token: Column | str, num_buckets: int, salt: str = "") -> Column:
    """Hash a token to a bucket in [0, num_buckets) via the md5 hex
    lattice (first 4 hex chars, base-16, mod buckets). Engine-portable:
    the DuckDB twin is the strpos-over-hex-alphabet arithmetic used by
    `queries.O_HASH_SPLIT`."""
    if not 1 <= num_buckets <= 10_000:
        raise ValueError(f"num_buckets must be in [1, 10000]: {num_buckets}")
    return split_bucket_col(token, salt) % num_buckets


def tokenize(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, token) rows: lowercase whitespace tokens, empties dropped.
    Pure codegen (split + explode), no Python."""
    tok = F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("token")
    return df.select(F.col(id_col), tok).where(F.col("token") != "")


def bucket_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 1024,
    salt: str = "",
) -> DataFrame:
    """(bucket, cnt) unigram bucket histogram — at most ``num_buckets``
    rows out of any corpus size; the groupBy partial-aggregates map-side
    so the shuffle carries <= num_buckets rows per task."""
    toks = tokenize(df, text_col, id_col)
    b = token_bucket_col(F.col("token"), num_buckets, salt).alias("bucket")
    return toks.select(b).groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))


def weights_from_counts(
    target: dict[int, int],
    background: dict[int, int],
    num_buckets: int,
    alpha: float = 0.5,
) -> dict[int, int]:
    """Quantized log-likelihood-ratio weight per bucket, from integer
    counts: w_b = log p_tgt(b) - log p_bg(b) with add-alpha smoothing,
    returned as round(w * 2^20) ints. Pure Python over integers — the
    oracle builder calls this same function on DuckDB-derived counts, so
    both engines inline bit-identical weights."""
    nt = sum(target.values())
    nb = sum(background.values())
    dt = nt + alpha * num_buckets
    db = nb + alpha * num_buckets
    out = {}
    for b in range(num_buckets):
        w = math.log((target.get(b, 0) + alpha) / dt) - math.log(
            (background.get(b, 0) + alpha) / db
        )
        out[b] = int(round(w * SCALE))
    return out


def fit_importance_weights(
    target_df: DataFrame,
    background_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 1024,
    salt: str = "",
    alpha: float = 0.5,
) -> dict[int, int]:
    """Fit quantized bucket weights from a target sample vs the
    background corpus. Two bounded collects (<= num_buckets rows each)."""
    tgt = {
        r["bucket"]: r["cnt"]
        for r in bucket_counts(target_df, text_col, id_col, num_buckets, salt).collect()
    }
    bg = {
        r["bucket"]: r["cnt"]
        for r in bucket_counts(
            background_df, text_col, id_col, num_buckets, salt
        ).collect()
    }
    return weights_from_counts(tgt, bg, num_buckets, alpha)


def importance_scores(
    df: DataFrame,
    weights: dict[int, int],
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 1024,
    salt: str = "",
) -> DataFrame:
    """Score every document: (id, n_tokens, score_q) where score_q is the
    BIGINT sum of quantized per-token bucket weights (true log-ratio
    score = score_q / 2^20). Plan shape: explode -> broadcast equi-join
    on bucket (weight table is num_buckets rows — always broadcastable)
    -> groupBy(id) with map-side partial sums. Deterministic under any
    partitioning because only integers are summed."""
    if len(weights) != num_buckets:
        raise ValueError(
            f"weights has {len(weights)} entries, expected {num_buckets}"
        )
    spark = SparkSession.getActiveSession() or df.sparkSession
    wdf = spark.createDataFrame(
        [(int(b), int(q)) for b, q in sorted(weights.items())], "bucket int, w bigint"
    )
    toks = tokenize(df, text_col, id_col)
    bucketed = toks.select(
        F.col(id_col), token_bucket_col(F.col("token"), num_buckets, salt).alias("bucket")
    )
    return (
        bucketed.join(F.broadcast(wdf), "bucket", "inner")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("w").alias("score_q"),
        )
    )


def duckdb_bucket_sql(token_expr: str, num_buckets: int, salt: str = "") -> str:
    """DuckDB twin of token_bucket_col: same md5 hex lattice arithmetic.
    `token_expr` must be a SQL expression yielding the token string."""
    hx = f"substr(md5(concat(cast({token_expr} as varchar), '{salt}')), 1, 4)"
    digit = "(strpos('0123456789abcdef', substr({hx}, {i}, 1)) - 1)"
    val = " + ".join(
        f"{digit.format(hx=hx, i=i)} * {16 ** (4 - i)}" for i in range(1, 5)
    )
    return f"((({val}) % 10000) % {num_buckets})"


def select_top_importance(
    scored: DataFrame,
    budget: int,
    score_col: str = "score_q",
    token_col: str = "n_tokens",
    key_col: str = "doc_id",
    salt: str = "",
    num_partitions: int | None = None,
) -> DataFrame:
    """The DSIR SELECTION step: keep the highest-importance documents
    that fit entirely within a token budget — the greedy fill of the
    budget in score order (Xie et al. 2023 select top-k by importance;
    expressed as a budget so it composes with the scaling-law ladders of
    packing.token_budget_sample). Documents are laid out in
    (score DESC, md5(key||salt), key) order — ties broken by the same
    deterministic lattice as every other selection op — and a document is
    kept iff its exclusive prefix sum of tokens plus its own tokens is
    within `budget`.

    Scale shape: the ordered exclusive prefix sum is the two-phase
    range-partition scheme of with_global_prefix_sum(order_col=) — no
    Exchange SinglePartition, no global sort materialization; only a
    (key, hash, score, tokens) projection shuffles. Prefix property:
    growing the budget only ADDS documents. `score_col` must be integral
    (score_q is the quantized BIGINT) so every engine orders
    identically."""
    from puddin_spark.operators.packing import with_global_prefix_sum

    if budget < 0:
        raise ValueError(f"budget must be non-negative: {budget}")
    out = with_global_prefix_sum(
        scored, token_col, key_col, salt,
        num_partitions=num_partitions, order_col=score_col,
    )
    kept = out.where(
        F.col("_start") + F.col(token_col).cast("bigint") <= F.lit(budget)
    )
    return kept.drop("_start")
