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
