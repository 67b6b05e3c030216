"""Arrow-vectorized pandas UDFs wrapping the pure rules.

All regex semantics live in puddin_spark.rules (Python `re` — required for
byte-parity with the reference, see rules.py docstring). These UDFs are thin
vectorization shells: Arrow batch in, Arrow batch out, per-row Python only
inside the batch (the `input_hint`'s "no per-row Python" at the Spark API
level). The combined `process` UDF does the whole scrub+classify chain in ONE
Python round trip per batch instead of four, which matters because each
pandas UDF column pass re-ships the document text through Arrow.
"""
from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from puddin_spark import rules

PROCESS_SCHEMA = T.StructType(
    [
        T.StructField("clean_text", T.StringType()),
        T.StructField("excl_type", T.StringType()),
    ]
)


def _process_batch(texts: pd.Series) -> pd.DataFrame:
    """raw text -> (clean_text | null, excl_type | null) per document.

    Chain (reference order, parse_pile.py:894-974 + 1428-1438):
      scrub_stage1 (C1-C4) -> classify (F1-F8, first match wins) ->
      scrub_stage2 (C5-C6, kept docs only) -> jsonish 'fail' gate.
    Dropped docs get clean_text=null; kept docs get excl_type=null.
    """
    clean_out: list[str | None] = []
    excl_out: list[str | None] = []
    for t in texts:
        if t is None:
            clean_out.append(None)
            excl_out.append("fail")
            continue
        mid = rules.scrub_stage1(t)
        label = rules.classify(mid)
        if label is not None:
            clean_out.append(None)
            excl_out.append(label)
            continue
        clean = rules.scrub_stage2(mid)
        if rules.is_jsonish(clean):
            clean_out.append(None)
            excl_out.append("fail")
        else:
            clean_out.append(clean)
            excl_out.append(None)
    return pd.DataFrame({"clean_text": clean_out, "excl_type": excl_out})


process_udf = F.pandas_udf(_process_batch, PROCESS_SCHEMA)


@F.pandas_udf(T.StringType())
def scrub_stage1_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: rules.scrub_stage1(t) if t is not None else None)


@F.pandas_udf(T.StringType())
def scrub_full_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: rules.scrub(t) if t is not None else None)


@F.pandas_udf(T.StringType())
def classify_udf(mids: pd.Series) -> pd.Series:
    return mids.map(lambda t: rules.classify(t) if t is not None else "fail")


@F.pandas_udf(T.ArrayType(T.StringType()))
def segment_udf(clean_texts: pd.Series) -> pd.Series:
    """clean document -> array of sentence strings (reference analog:
    Stanza tokenize + the linebreak re-split, parse_pile.py:1474-1624)."""
    return clean_texts.map(
        lambda t: rules.segment_sentences(t) if t is not None else []
    )


@F.pandas_udf(T.StringType())
def pii_scrub_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: rules.scrub_pii(t) if t is not None else None)


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_udf(sents: pd.Series) -> pd.Series:
    return sents.map(lambda s: rules.tokenize(s) if s is not None else [])


@F.pandas_udf(T.DoubleType())
def batch_ts_udf(texts: pd.Series) -> pd.Series:
    """Wall-clock stamp (epoch seconds) per Arrow batch. Projected alongside
    process_udf it rides the SAME ArrowEvalPython pass (projection collapse),
    so min/max per lineage partition bound when that partition's documents
    were actually processed — the rebuild of the reference slice-info's
    started_at/finished_at/parsing_time columns (parse_pile.py:1185-1188,
    1319-1338) without any extra stage or Python round trip."""
    import time

    t = float(time.time())
    return pd.Series(t, index=texts.index)
