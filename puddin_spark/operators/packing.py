"""Sequence packing and token-budget selection for LM training prep.

After cleaning, dedup, and selection, a pre-training pipeline lays the
surviving documents out as fixed-length token sequences ("packing": the
GPT-3 / T5 convention of concatenating documents in a fixed order and
chunking the stream into `seq_len`-token windows) and often cuts the
corpus to an exact token budget first (scaling-law runs: "train on the
first N tokens of the shuffled corpus"). Both need ONE primitive: an
exclusive prefix sum of per-document token counts in a deterministic
global order.

A naive `sum().over(Window.orderBy(...))` forces every row through a
single task (`Exchange SinglePartition`) — a wall at 10^12 documents.
`with_global_prefix_sum` is the two-phase scheme of
`reference_ids.with_global_row_number` (SURVEY.md §2.7) generalized from
counts to sums:

  1. range-repartition a (key, value) projection on the order keys;
  2. per-partition SUM — one tiny row per partition — collected and
     turned into broadcast cumulative offsets;
  3. partition-local window sum + offset = exact global prefix sum.

Every stage is embarrassingly parallel; all arithmetic is BIGINT, so the
result is bit-identical to the single-task window in any engine.

The deterministic order is the md5-of-key "shuffle" (same lattice family
as `operators.splits`): reproducible across runs, engines, and cluster
sizes — unlike zipWithIndex or monotonically_increasing_id, whose
numbering depends on partition layout.

Reference scope note: the reference pipeline stops at per-document
CoNLL-U output; packing belongs to the training-data-pipeline surface
the graft brief adds on top.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def shuffle_key_col(key_col: str, salt: str = "") -> Column:
    """Deterministic global shuffle order: full md5 hex of (key || salt).
    Change `salt` to draw a fresh independent order."""
    return F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))


def with_global_prefix_sum(
    df: DataFrame,
    value_col: str,
    key_col: str = "doc_id",
    salt: str = "",
    *,
    start_col: str = "_start",
    num_partitions: int | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Add `start_col` = exclusive prefix sum of `value_col` (BIGINT),
    without a single-task sort. REQUIRES non-null unique keys (the
    numbering joins back on the key — same contract as
    with_global_row_number).

    Order: md5(key||salt) by default (the deterministic shuffle); with
    `order_col`, DESCENDING on that column first (highest first — the
    data-selection convention: best-scored documents claim the budget),
    with the md5 hash + key as the deterministic tiebreak. `order_col`
    must be integral (BIGINT ordering is engine-portable; float keys
    order differently across engines only in pathological NaN cases, but
    integral is the contract the oracles pin).

    Only a (key, hash, value[, order]) projection is range-partitioned
    and persisted (the persist pins the partition boundaries between the
    offset pass and the numbering pass — Spark's range sampler is not
    deterministic across jobs); the full rows never shuffle."""
    hx = shuffle_key_col(key_col, salt).alias("_hx")
    cols = [F.col(key_col), hx, F.col(value_col).cast("bigint").alias("_v")]
    if order_col is not None:
        cols.append(F.col(order_col).cast("bigint").alias("_ord"))
        sort_cols = [F.col("_ord").desc(), F.col("_hx"), F.col(key_col)]
    else:
        sort_cols = [F.col("_hx"), F.col(key_col)]
    thin = df.select(*cols)
    parted = (
        thin.repartitionByRange(num_partitions, *sort_cols)
        if num_partitions
        else thin.repartitionByRange(*sort_cols)
    )
    parted = parted.withColumn("_gpid", F.spark_partition_id()).persist()
    sums = sorted(
        parted.groupBy("_gpid").agg(F.sum("_v").alias("s")).collect(),
        key=lambda r: r["_gpid"],
    )
    offsets, acc = [], 0
    for r in sums:
        offsets.append((r["_gpid"], acc))
        acc += r["s"]
    odf = df.sparkSession.createDataFrame(offsets, "_gpid int, _goff long")
    w = (
        Window.partitionBy("_gpid")
        .orderBy(*sort_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numbered = parted.join(F.broadcast(odf), "_gpid").withColumn(
        start_col, F.sum("_v").over(w) + F.col("_goff") - F.col("_v")
    )
    thin_cols = {key_col, value_col} | (
        {order_col} if order_col is not None else set()
    )
    if set(df.columns) == thin_cols:
        # thin input (the packing/budget/selection gates project before
        # calling): the numbered rows already carry everything — skip the
        # join-back, which otherwise costs two more full corpus shuffles
        out = [key_col, F.col("_v").alias(value_col)]
        if order_col is not None:
            out.append(F.col("_ord").alias(order_col))
        return numbered.select(*out, start_col)
    return df.join(numbered.select(key_col, start_col), key_col)


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    token_col: str,
    key_col: str = "doc_id",
    salt: str = "",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign every document its place in the packed token stream:
    concatenate documents in deterministic md5(key||salt) order and chunk
    the stream into `seq_len`-token windows. Adds

      - `pack_id`     — window index containing the document's first token
      - `pack_offset` — position of that token within its window

    A document may straddle windows (the standard GPT-3-style layout; a
    writer emits it into pack_id, pack_id+1, ... as needed). Pure integer
    arithmetic over the two-phase prefix sum — bit-reproducible at any
    parallelism."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive: {seq_len}")
    out = with_global_prefix_sum(
        df, token_col, key_col, salt, num_partitions=num_partitions
    )
    return (
        out.withColumn("pack_id", F.expr(f"_start div {seq_len}"))
        .withColumn("pack_offset", (F.col("_start") % seq_len).cast("bigint"))
        .drop("_start")
    )


def token_budget_sample(
    df: DataFrame,
    budget: int,
    token_col: str,
    key_col: str = "doc_id",
    salt: str = "",
    num_partitions: int | None = None,
) -> DataFrame:
    """Cut the corpus to an exact token budget: keep the documents that
    fit ENTIRELY within the first `budget` tokens of the md5-shuffled
    stream (start + tokens <= budget). Membership is a pure function of
    (corpus, salt) — rerunning at any cluster size selects the same
    documents, and growing the budget only ADDS documents (prefix
    property), which is what scaling-law ladders need."""
    if budget < 0:
        raise ValueError(f"budget must be non-negative: {budget}")
    out = with_global_prefix_sum(
        df, token_col, key_col, salt, num_partitions=num_partitions
    )
    kept = out.where(
        F.col("_start") + F.col(token_col).cast("bigint") <= F.lit(budget)
    )
    return kept.drop("_start")
