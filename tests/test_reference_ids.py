"""Reference-id parity: ids and slice plans must match the reference's own
demo slice artifacts bit-for-bit."""
from __future__ import annotations

import pandas as pd
import pytest

from puddin_spark.pipeline import quality_pipeline
from puddin_spark.reference_ids import add_raw_ids, add_slice_ids, plan_slices
from puddin_spark.sources import read_pile_jsonl

REF = "/root/reference/demo/data"


def test_plan_slices_matches_reference_rules():
    # demo: 29 kept docs at limit 10 -> [10, 9, 10]
    assert plan_slices(29, 10) == [10, 9, 10]
    assert plan_slices(8, 10) == [8]
    # docstring examples from slice_df (parse_pile.py:1158-1167, limit 1000)
    assert plan_slices(2400, 1000) == [1000, 700, 700]
    assert plan_slices(1202, 1000) == [601, 601]
    # NB: the reference COMMENT says 1200 stays whole, but its CODE splits at
    # > int(1.1*limit) = 1100 (parse_pile.py:1169) — the code is the spec
    assert plan_slices(1200, 1000) == [600, 600]
    assert plan_slices(1100, 1000) == [1100]
    assert plan_slices(2050, 1000) == [1025, 1025]
    assert sum(plan_slices(123457, 9999)) == 123457


@pytest.mark.parametrize(
    "sample,limit,n_slices",
    [("sample-1", 10, 1), ("sample-2", 10, 3)],
)
def test_slice_ids_match_demo(spark, sample, limit, n_slices):
    pages = read_pile_jsonl(
        spark, f"{REF}/pile/{sample}.jsonl", "Pile-CC", source_label=sample
    )
    # raw ids in ingest order == reference raw df ids
    raw_ref = pd.read_pickle(
        f"{REF}/puddin/pile_tables/raw/pile_{sample}_Pile-CC_df.pkl.gz"
    )
    # ingest order = jsonl order (synthetic warc_ts is constant) — feed the
    # reference raw order explicitly
    got_ids = {
        r.text: r.text_id
        for r in add_raw_ids(
            spark.createDataFrame(
                [(i, t) for i, t in enumerate(raw_ref.raw)], "ord long, text string"
            ),
            label=sample,
            order_col="ord",
        ).collect()
    }
    want_ids = dict(zip(raw_ref.raw, raw_ref.text_id))
    assert got_ids == want_ids

    # slice ids over the KEPT docs (classified by our pipeline) == demo slices
    ids_df = spark.createDataFrame(
        [(str(tid), str(t)) for tid, t in zip(raw_ref.text_id, raw_ref.raw)],
        "text_id string, text string",
    )
    from puddin_spark.udfs import process_udf
    from pyspark.sql import functions as F

    kept = (
        ids_df.withColumn("_r", process_udf(F.col("text")))
        .filter("_r.excl_type is null")
        .select("text_id", "text")
    )
    sliced = add_slice_ids(kept, spark, label=sample, limit=limit).orderBy("text_id")
    got = [(r.slice_numstr, r.text_id, r.orig_text_id) for r in sliced.collect()]

    want = []
    for i in range(1, n_slices + 1):
        sdf = pd.read_pickle(
            f"{REF}/puddin/pile_tables/slices/PccSa{sample[-1]}/"
            f"pile_{sample}-{i}_Pile-CC_df.pkl.gz"
        )
        want += [(str(i), str(t), str(o)) for t, o in zip(sdf.text_id, sdf.orig_text_id)]
    assert sorted(got) == sorted(want)


def test_pile_set_code_helper():
    from puddin_spark.sources import pile_set_code

    assert pile_set_code("Pile-CC") == "pcc"
    assert pile_set_code("OpenWebText2") == "owt"
    assert pile_set_code("Unknown Set") == "unk"
