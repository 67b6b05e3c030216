"""SparkSession construction with the configs this pipeline needs at scale.

Defaults encode the scale posture (SURVEY.md section 4): AQE on (skew-join +
coalesce), Arrow-vectorized Python UDF transport with bounded batch sizes
(giant web documents make unbounded batches a straggler/OOM hazard), and a
shuffle-partition count sized to the local core count for tests while staying
overridable for cluster runs via normal spark-submit --conf.
"""
from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Web documents average ~2-10 KB but the tail reaches tens of MB; 512 rows per
# Arrow batch caps a batch at ~"a few hundred MB" worst-case instead of the
# 10k-row default (reference analog: 9,999-doc slices, parse_pile.py:34).
ARROW_BATCH_ROWS = 512


def get_spark(
    master: str | None = None,
    app_name: str = "puddin_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local mode: match cores; on a real cluster this is overridden by
        # --conf (and AQE coalesces anyway)
        shuffle_partitions = cpus if master.startswith("local") else 2 * cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS)
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
