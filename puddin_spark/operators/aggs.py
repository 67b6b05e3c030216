"""Skew-hardened aggregation: explicit two-phase salting.

A groupBy on a hot key (e.g. `excl_type` where one rule dominates, or a
boilerplate fingerprint shared by millions of pages) concentrates one
reducer. Salting splits each key into `buckets` sub-keys hashed from a
high-cardinality column, pre-aggregates per (key, salt), then combines —
two small shuffles instead of one skewed one. (Spark's partial aggregation
already map-combines for simple counts; explicit salting is the pattern for
the cases AQE can't rescue: high-cardinality payloads per key, e.g.
collect_list/distinct-style state. north_rule: "salted aggregation to tame
skew from giant documents".)
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_counts(
    df: DataFrame,
    keys: list[str],
    salt_from: str | Column,
    *,
    buckets: int = 32,
    count_alias: str = "n",
) -> DataFrame:
    """Two-phase count per key group, salted by hash(salt_from) % buckets.
    Result is identical to df.groupBy(keys).count() — only the shuffle
    shape changes."""
    salt = F.pmod(
        F.xxhash64(F.col(salt_from) if isinstance(salt_from, str) else salt_from),
        F.lit(buckets),
    ).alias("_salt")
    partial = df.groupBy(*keys, salt).agg(F.count("*").alias("_pn"))
    return (
        partial.groupBy(*keys)
        .agg(F.sum("_pn").cast("bigint").alias(count_alias))
    )
