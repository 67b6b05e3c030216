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
