"""Streaming ingestion: file-stream drops -> foreachBatch pipeline ->
snapshot store; replay-idempotent."""
from __future__ import annotations

from puddin_spark.snapshots import SnapshotStore
from puddin_spark.streaming import run_streaming_pipeline, stream_pages, windowed_page_counts
from puddin_spark.synth import gen_rows, SPARK_SCHEMA_DDL


def _drop_files(spark, tmp_path, batches):
    d = tmp_path / "drops"
    d.mkdir(exist_ok=True)
    for i, (lo, hi) in enumerate(batches):
        spark.createDataFrame(gen_rows(lo, hi), SPARK_SCHEMA_DDL).coalesce(1).write.mode(
            "append"
        ).parquet(str(d))
    return str(d)


def test_stream_drops_to_snapshots(spark, tmp_path):
    inp = _drop_files(spark, tmp_path, [(0, 120), (120, 240)])
    store = SnapshotStore(tmp_path / "store")
    q = run_streaming_pipeline(
        spark, inp, store, str(tmp_path / "ckpt"), num_partitions=4
    )
    q.awaitTermination(300)

    got = store.read(spark)
    assert got is not None
    n_first = got.count()
    assert n_first > 0
    assert got.select("url").distinct().count() == n_first

    # second stream run over the same dir + a new drop: only new docs commit
    _drop_files(spark, tmp_path, [(240, 300)])
    q2 = run_streaming_pipeline(
        spark, inp, store, str(tmp_path / "ckpt"), num_partitions=4
    )
    q2.awaitTermination(300)
    got2 = store.read(spark)
    assert got2.count() > n_first
    assert got2.select("url").distinct().count() == got2.count()

    # replay from scratch (fresh checkpoint) -> store unchanged (idempotent)
    n_before = got2.count()
    q3 = run_streaming_pipeline(
        spark, inp, store, str(tmp_path / "ckpt2"), num_partitions=4
    )
    q3.awaitTermination(300)
    assert store.read(spark).count() == n_before


def test_windowed_counts_plan(spark, tmp_path):
    inp = _drop_files(spark, tmp_path, [(0, 60)])
    agg = windowed_page_counts(stream_pages(spark, inp), "1 hour", "2 hours")
    assert agg.isStreaming
    q = (
        agg.writeStream.format("memory")
        .queryName("wpc")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # append mode emits only watermark-closed windows; the plan executing
    # with a watermark + window agg is the contract here
    assert spark.table("wpc").columns == ["start", "end", "lang", "n_pages"]
