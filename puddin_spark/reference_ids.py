"""Reference-exact document/slice id synthesis (optional parity surface).

The pipeline's native keys are sha2(url); this module reproduces the
reference's hierarchical string ids bit-for-bit for users who need file-level
parity with existing puddin output:

- raw ids   `pcc_<label>_<NN>`            (create_ids, parse_pile.py:745-788:
  NN = row number zfilled to len(str(max_index)) — i.e. len(str(n-1)))
- slice plan: chop `limit`-sized slices while more than int(2.2*limit) rows
  remain, then halve the remainder if it exceeds int(1.1*limit)
  (slice_df, parse_pile.py:1159-1178); demo-verified split 29 -> [10, 9, 10]
- slice ids `pcc_eng_<label>_<S>.<P>_x<NN>` where S = slice number zfilled to
  len(str(n_slices)), P = position-in-slice zfilled to len(str(size-1)), and
  NN = the raw id's numeric suffix (create_ids with zfilled_slice_num)

zfill never truncates — Spark's lpad does, hence the greatest(length, w)
guard. The only driver-side work is arithmetic on row counts (two-pass O3
from SURVEY.md section 2.7); the boundary table is tiny (n/limit rows) and
broadcast.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def with_global_row_number(
    df: DataFrame,
    order_cols: list[str],
    *,
    rn_col: str = "_rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global 1-based row numbers in `order_cols` order WITHOUT a single-task
    sort — the two-phase O3 scheme (SURVEY.md section 2.7):

      1. range-repartition on the order keys, so partition i holds only keys
         that sort before everything in partition i+1 (a parallel shuffle);
      2. count rows per partition (tiny aggregate: one row per partition);
      3. broadcast the cumulative offsets and add a partition-local
         row_number — global rank = local rank + partition offset.

    Bit-identical to `row_number().over(Window.orderBy(*order_cols))` when
    the order keys are unique (all callers here: url / text_id / doc_id),
    but every stage is embarrassingly parallel — no `Exchange SinglePartition`
    wall at 10^12 rows.

    REQUIRES non-null, unique order keys: the numbers join back to `df` on
    the keys, so a NULL key row is silently DROPPED (null never equi-joins)
    and duplicate keys multiply (k copies -> k*k output rows). Callers with
    nullable or duplicated ordering columns must pre-filter/disambiguate
    (e.g. append a unique tiebreaker column).

    Only a KEY-ONLY projection is range-partitioned and persisted
    (MEMORY_AND_DISK) — the persist is required so the count pass and the
    numbering pass see the SAME partition boundaries (Spark's range sampler
    is not deterministic across separate jobs), but caching full rows would
    pin the whole corpus in executor storage for the session (the numbers
    join back to `df` on the unique keys instead: one bounded shuffle on
    keys versus an unbounded cache). The residual cached footprint is the
    key columns only, evicted LRU.
    """
    thin = df.select(*order_cols)
    parted = (
        thin.repartitionByRange(num_partitions, *order_cols)
        if num_partitions
        else thin.repartitionByRange(*order_cols)
    )
    parted = parted.withColumn("_gpid", F.spark_partition_id()).persist()
    counts = sorted(
        parted.groupBy("_gpid").agg(F.count("*").alias("c")).collect(),
        key=lambda r: r["_gpid"],
    )
    offsets, acc = [], 0
    for r in counts:
        offsets.append((r["_gpid"], acc))
        acc += r["c"]
    odf = df.sparkSession.createDataFrame(offsets, "_gpid int, _goff long")
    w = Window.partitionBy("_gpid").orderBy(*order_cols)
    numbered = (
        parted.join(F.broadcast(odf), "_gpid")
        .withColumn(rn_col, F.row_number().over(w) + F.col("_goff"))
        .drop("_gpid", "_goff")
    )
    return df.join(numbered, order_cols)


def plan_slices(n: int, limit: int) -> list[int]:
    """Slice sizes for n rows (parse_pile.py:1159-1178, incl. tail halving)."""
    sizes: list[int] = []
    rem = n
    while rem > int(2.2 * limit):
        sizes.append(limit)
        rem -= limit
    if rem > int(1.1 * limit):
        half = rem // 2
        sizes.append(half)
        rem -= half
    sizes.append(rem)
    return sizes


def _zfill(col_sql: str, width: int) -> str:
    """SQL zfill: pad to `width` but never truncate (unlike bare lpad)."""
    return f"lpad({col_sql}, greatest(length({col_sql}), {width}), '0')"


def add_raw_ids(
    df: DataFrame,
    *,
    code: str = "pcc",
    label: str,
    order_col: str = "url",
) -> DataFrame:
    """Assign reference raw ids `<code>_<label>_<NN>` in `order_col` order."""
    n = df.count()
    width = len(str(max(n - 1, 0)))
    return with_global_row_number(df, [order_col]).withColumn(
        "text_id",
        F.expr(
            f"concat('{code}_{label}_', {_zfill('cast(_rn as string)', width)})"
        ),
    ).drop("_rn")


def add_slice_ids(
    kept: DataFrame,
    spark: SparkSession,
    *,
    code: str = "pcc",
    label: str,
    limit: int = 9999,
) -> DataFrame:
    """Re-id kept docs into slice-scoped ids, ordered by raw text_id.

    Output adds: slice_numstr, orig_text_id, and the slice-form text_id
    `<code>_eng_<label>_<S>.<P>_x<NN>`.
    """
    n = kept.count()
    sizes = plan_slices(n, limit)
    slice_width = len(str(len(sizes)))
    bounds = []
    start = 1
    for i, size in enumerate(sizes):
        slice_label = str(i + 1).zfill(slice_width)
        pos_width = len(str(max(size - 1, 0)))
        bounds.append((slice_label, start, start + size - 1, pos_width))
        start += size
    bdf = spark.createDataFrame(
        bounds, "slice_numstr string, start_rn long, end_rn long, pos_width int"
    )
    ranked = with_global_row_number(kept, ["text_id"]).withColumnRenamed(
        "text_id", "orig_text_id"
    )
    joined = ranked.join(
        F.broadcast(bdf),
        (F.col("_rn") >= F.col("start_rn")) & (F.col("_rn") <= F.col("end_rn")),
    )
    pos = "cast(_rn - start_rn + 1 as string)"
    pos_z = f"lpad({pos}, greatest(length({pos}), pos_width), '0')"
    return joined.withColumn(
        "text_id",
        F.expr(
            f"concat('{code}_eng_{label}_', slice_numstr, '.', {pos_z},"
            f" '_x', element_at(split(orig_text_id, '_'), -1))"
        ),
    ).drop("_rn", "start_rn", "end_rn", "pos_width")
