"""Deterministic corpus splitting for training-data preparation.

A reproducible train/val/test assignment must be a pure function of a
stable document key — never of partitioning, sampling seeds, or row order
(Spark's randomSplit changes membership whenever the upstream plan
repartitions; a hash split never does). The assignment here is the
md5-prefix trick portable across engines (same value in DuckDB, so the
gate oracle replays it mechanically): bucket = int(md5(key || salt)[:4],
16) mod granularity, split = first weight range containing the bucket.

Reference scope note: the reference pipeline has no split stage (it
processes whole Pile shards); this operator is part of the
training-data-pipeline surface the graft brief adds on top.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

GRANULARITY = 10_000


def split_bucket_col(key: Column | str, salt: str = "") -> Column:
    """Deterministic bucket in [0, GRANULARITY): base-16 value of the
    first 4 md5 hex chars of (key || salt), mod GRANULARITY. Pure codegen
    (md5 + conv are JVM built-ins); identical arithmetic is expressible in
    ANSI SQL / DuckDB (strpos over the hex alphabet), which is what makes
    the assignment auditable outside Spark."""
    key = F.col(key) if isinstance(key, str) else key
    hx = F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 4)
    return (F.conv(hx, 16, 10).cast("bigint") % GRANULARITY).cast("int")


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Assign every row a `split` label with expected proportions
    `weights` (e.g. {'train': 0.9, 'val': 0.05, 'test': 0.05}), stable
    under repartitioning, resume, and incremental ingest — a document
    keeps its split forever because the assignment depends only on
    (key, salt). Change `salt` to draw a fresh independent split.
    Thresholds are exact integers over a 10k-bucket lattice, so engines
    agree bit-for-bit; weights must be positive and sum to ~1."""
    total = sum(weights.values())
    if total <= 0 or any(v < 0 for v in weights.values()):
        raise ValueError(f"weights must be positive: {weights}")
    bucket = split_bucket_col(key_col, salt)
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w / total
        thr = int(round(GRANULARITY * acc))
        cond = bucket < F.lit(thr)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "",
    default: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep each row with its
    stratum's fraction, decided by the same md5 bucket lattice as
    `hash_split` — so membership is exact-reproducible across engines,
    runs, and repartitionings (unlike `DataFrame.sampleBy`, whose draw
    depends on a seed AND on partition layout). The domain-rebalancing /
    source-mixing step of a training-data pipeline (e.g. take 50% of
    Common Crawl, 100% of Wikipedia) expressed as a pure-codegen filter:
    no shuffle, no UDF, fully pushdown-friendly.

    `fractions` maps stratum value -> keep fraction in [0, 1]; strata not
    listed keep `default`. Thresholds are exact integers over the 10k
    lattice, so both engines agree bit-for-bit."""
    for k, v in fractions.items():
        if not (0.0 <= v <= 1.0):
            raise ValueError(f"fraction for {k!r} outside [0,1]: {v}")
    if not (0.0 <= default <= 1.0):
        raise ValueError(f"default fraction outside [0,1]: {default}")
    bucket = split_bucket_col(key_col, salt)
    thr = None
    for name, frac in fractions.items():
        t = int(round(GRANULARITY * frac))
        cond = F.col(strata_col) == F.lit(name)
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    dthr = F.lit(int(round(GRANULARITY * default)))
    thr = dthr if thr is None else thr.otherwise(dthr)
    return df.where(bucket < thr)


def temperature_fractions(counts: dict[str, int], alpha: float) -> dict[str, float]:
    """Per-stratum keep fractions that flatten the size distribution with
    temperature `alpha` (the multilingual-pretraining mixing rule of
    XLM-R / mT5: sample stratum d with probability proportional to
    count_d**alpha). A filter can only DOWNsample, so fractions are
    normalized to give the smallest stratum fraction 1.0:

        f_d = (c_min / c_d) ** (1 - alpha)

    alpha=1 keeps everything (natural distribution); alpha=0 equalizes
    expected counts across strata. Pure driver-side floats quantized onto
    the md5 lattice by the caller, so engines agree bit-for-bit."""
    if not (0.0 <= alpha <= 1.0):
        raise ValueError(f"alpha outside [0,1]: {alpha}")
    if not counts:
        return {}
    if any(c <= 0 for c in counts.values()):
        raise ValueError(f"stratum counts must be positive: {counts}")
    c_min = min(counts.values())
    return {d: (c_min / c) ** (1.0 - alpha) for d, c in counts.items()}


def temperature_mix(
    df: DataFrame,
    alpha: float,
    strata_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "",
    counts: dict[str, int] | None = None,
) -> DataFrame:
    """Temperature-flatten the corpus mix across `strata_col` (languages,
    source domains): downsample each stratum to `temperature_fractions`
    of its size, decided per row by the deterministic md5 bucket lattice
    of `stratified_sample`. When `counts` is None they are computed with
    one tiny groupBy-count collect (bounded by the number of strata, the
    same driver-side shape as IVF centroid training); at 10^12 documents
    pass pre-computed counts from table statistics instead. Membership is
    a pure function of (counts, alpha, key, salt) — reproducible across
    runs, engines, and cluster sizes."""
    if counts is None:
        rows = df.groupBy(strata_col).count().collect()
        counts = {r[strata_col]: r["count"] for r in rows}
    fracs = temperature_fractions(counts, alpha)
    return stratified_sample(
        df, fracs, strata_col=strata_col, key_col=key_col, salt=salt, default=0.0
    )


def shard_shuffle(
    df: DataFrame,
    shard_size: int,
    key_col: str = "doc_id",
    salt: str = "",
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic global shuffle + fixed-size sharding for training
    export: order documents by md5(key || salt) (a reproducible
    permutation, unlike orderBy(rand()) whose layout changes with
    partitioning) and assign

      - `shard_id`  — zero-based shard index (shard_size docs per shard;
                      only the last shard is short)
      - `shard_pos` — the document's position within its shard

    Built on the two-phase global prefix sum over value 1 (operators.
    packing.with_global_prefix_sum), so there is no single-task sort: a
    thin (key, hash) projection range-partitions, per-partition counts
    are collected as broadcast offsets, and the rank is partition-local
    arithmetic — the same numbers at any parallelism."""
    from puddin_spark.operators.packing import with_global_prefix_sum

    if shard_size <= 0:
        raise ValueError(f"shard_size must be positive: {shard_size}")
    thin = df.withColumn("_one", F.lit(1))
    out = with_global_prefix_sum(
        thin, "_one", key_col, salt, num_partitions=num_partitions
    )
    return (
        out.withColumn("shard_id", F.expr(f"_start div {shard_size}"))
        .withColumn("shard_pos", (F.col("_start") % shard_size).cast("bigint"))
        .drop("_start", "_one")
    )
