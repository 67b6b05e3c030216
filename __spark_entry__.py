"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All implementations live in puddin_spark.queries (one callable + one DuckDB
oracle per operator from SURVEY.md section 2 plus the training-data operators:
dedup families, similarity search, text analysis, multimodal plumbing).
tests/test_queries.py replays this exact comparison locally.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from puddin_spark.queries import SPARK_QUERIES, oracle_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full quality-filter pipeline (dedup -> scrub -> classify
    -> verdicts) over a web-page view of /root/testdata/sf0.001."""
    return SPARK_QUERIES["pipeline_verdicts"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    return oracle_queries()
