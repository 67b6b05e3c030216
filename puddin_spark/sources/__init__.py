"""Sources: Pile-style jsonlines -> the canonical pages table.

S1 in SURVEY.md section 2.1: the reference streams .jsonl and keeps
d['text'] where d['meta']['pile_set_name'] == selected
(parse_pile.py:566-579). Spark-native: spark.read.json with an explicit
schema (no sampling pass), filter pushed to the scan, and the subset
predicate expressed on the nested column. The reference's jsonl has no urls
or timestamps, so stable synthetic ones are derived (url from the source
label + row hash; warc_ts constant) — document identity downstream is
sha2(url) exactly as for crawl input.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PILE_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField(
            "meta",
            T.StructType([T.StructField("pile_set_name", T.StringType())]),
        ),
    ]
)

# pile_set_name -> code (parse_pile.py:37-41 _PILE_SET_CODE_DICT); feeds
# reference_ids.add_raw_ids/add_slice_ids `code=` for reference-id parity
PILE_SET_CODES = {
    "Gutenberg (PG-19)": "Pgn",
    "Books3": "Bks",
    "BookCorpus2": "Bkc",
    "Pile-CC": "Pcc",
    "OpenWebText2": "Owt",
}


def pile_set_code(subset: str) -> str:
    """Lowercased reference code for a Pile subset (create_ids uses the
    lowercase form, parse_pile.py:754)."""
    return PILE_SET_CODES.get(subset, subset[:3]).lower()


def read_pile_jsonl(
    spark: SparkSession,
    path: str,
    selected_subset: str = "Pile-CC",
    source_label: str | None = None,
) -> DataFrame:
    """jsonl file(s) -> pages table (url, warc_ts, html, text, lang).

    The subset filter is the reference's corpus gate (S1); `lang` is set to
    'en' for the selected subset (the Pile-CC corpus is English web text),
    so the downstream pipeline's language gate passes these docs through.
    """
    label = source_label or "pile"
    raw = spark.read.schema(PILE_SCHEMA).json(path)
    sel = raw.filter(F.col("meta.pile_set_name") == selected_subset)
    return sel.select(
        F.concat(
            F.lit(f"pile://{label}/"),
            F.sha2(F.col("text"), 256).substr(1, 16),
        ).alias("url"),
        F.lit("2020-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col("text"),
        F.lit("en").alias("lang"),
    )
