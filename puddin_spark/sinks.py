"""Sinks: CoNLL-U-style text output and lineage export.

S6 in SURVEY.md section 2.1: the reference streams one CoNLL-U file per
9,999-doc slice (parse_pile.py:1412-1455). Spark-native: the sentence table
is rendered to the comment-skeleton strings (pipeline.conllu_skeleton),
repartitioned by a slice key, sorted within partitions by (doc_id, sent_num)
so document blocks stay contiguous, and written with df.write.text — one
text file per slice partition, no driver collect.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from puddin_spark.pipeline import conllu_skeleton


def write_conllu(
    sentences: DataFrame,
    out_dir: str,
    *,
    num_slices: int = 32,
) -> None:
    """sentence table (doc_id, sent_num, sent_text) -> text files.

    Slice assignment is hash(doc_id) — the url-hash partitioning of the
    north rule; every document's sentences land in one file, in order.
    """
    sk = conllu_skeleton(sentences)
    (
        # partition on the full 64-bit hash of doc_id: high-cardinality, so
        # murmur%n distributes uniformly (pre-bucketing with pmod(...,n) and
        # re-hashing n distinct values is balls-in-bins: ~1/e empty files).
        # Hashing — rather than doc_id itself — also keeps this an explicit
        # REPARTITION_BY_NUM that Catalyst can't elide into the upstream
        # window exchange (which AQE may coalesce to fewer files).
        sk.repartition(num_slices, F.xxhash64("doc_id"))
        .sortWithinPartitions("doc_id", "sent_num")
        .select(F.concat(F.col("conllu"), F.lit("\n")).alias("value"))
        .write.mode("overwrite")
        .text(out_dir)
    )


def write_lineage_csv(lineage: DataFrame, out_dir: str) -> None:
    """Lineage sidecar as CSV (the reference's slice-info/meta-index CSVs,
    parse_pile.py:1239-1240,1325-1338). Map column flattened for CSV."""
    cols = [c for c in lineage.columns if c != "rule_hit_counts"]
    (
        lineage.select(
            *cols,
            F.to_json(F.col("rule_hit_counts")).alias("rule_hit_counts"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .csv(out_dir)
    )
