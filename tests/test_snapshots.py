"""Resume/checkpoint semantics: kill/rerun contract (BASELINE.md target 5,
FIXTURES.md invariant 4)."""
from __future__ import annotations

import json

from puddin_spark.snapshots import SnapshotStore, run_resumable_pipeline
from puddin_spark.synth import synth_pages_local


def test_resume_processes_only_new_docs(spark, tmp_path):
    store = SnapshotStore(tmp_path / "verdicts")
    pages = synth_pages_local(spark, 200).cache()
    first_half = pages.limit(120)

    snap0, n0 = run_resumable_pipeline(spark, first_half, store, num_partitions=4)
    assert snap0 == 0 and n0 > 0

    # crash simulation: rerun over the FULL input — only the new urls run
    snap1, n1 = run_resumable_pipeline(spark, pages, store, num_partitions=4)
    assert snap1 == 1 and n1 > 0

    total = store.read(spark)
    en_urls = pages.filter("lang = 'en'").select("url").distinct().count()
    # dedup_first collapses duplicate texts *within* a run; across runs the
    # union is keyed by url, still exactly once per processed url
    assert total.select("url").distinct().count() == total.count()
    assert n0 + n1 == total.count()

    # idempotence: third run adds nothing and creates no empty commit
    snap2, n2 = run_resumable_pipeline(spark, pages, store, num_partitions=4)
    assert (snap2, n2) == (-1, 0)
    assert store.current_snapshot_id() == 1

    # lineage rode the same commits and references its snapshot
    lin = store.read_lineage(spark)
    assert set(r.snapshot_id for r in lin.collect()) == {0, 1}
    assert sum(r.n_docs for r in lin.collect()) == total.count()


def test_failed_commit_is_invisible(spark, tmp_path):
    store = SnapshotStore(tmp_path / "t")
    pages = synth_pages_local(spark, 60)
    run_resumable_pipeline(spark, pages.limit(30), store, num_partitions=2)
    n_before = store.read(spark).count()

    # simulate a crash between data write and commit-record write: a data
    # dir exists but no commit record references it
    orphan = store.base / "snap-999999" / "data"
    pages.limit(5).write.parquet(str(orphan))
    assert store.read(spark).count() == n_before  # reader never sees it

    # and a stale staging dir is equally invisible
    (store.base / "_staging" / "deadbeef").mkdir(parents=True)
    assert store.read(spark).count() == n_before


def test_commit_record_shape(spark, tmp_path):
    store = SnapshotStore(tmp_path / "t")
    run_resumable_pipeline(
        spark, synth_pages_local(spark, 40), store, num_partitions=2
    )
    recs = store.commits()
    assert len(recs) == 1
    rec = recs[0]
    assert rec["snapshot_id"] == 0
    assert rec["data_dir"].startswith("snap-")
    assert rec["lineage_dir"].startswith("snap-")
    # record is valid JSON on disk (atomicity artifact)
    raw = json.loads(
        (store.base / "_commits" / "000000.json").read_text()
    )
    assert raw == rec


def test_commit_recovers_from_crash_between_rename_and_record(spark, tmp_path):
    """Crash AFTER the snapshot-dir rename but BEFORE the commit-record write
    leaves snap-<N> on disk with no record. The next commit must reclaim the
    slot instead of wedging on ENOTEMPTY forever."""
    store = SnapshotStore(tmp_path / "t")
    pages = synth_pages_local(spark, 80)
    run_resumable_pipeline(spark, pages.limit(40), store, num_partitions=2)

    # simulate the partial commit: a full data dir at the NEXT snapshot slot,
    # no commit record
    orphan = store.base / "snap-000001" / "data"
    pages.limit(7).write.parquet(str(orphan))
    n_before = store.read(spark).count()
    assert store.read(spark).count() == n_before  # invisible to readers

    snap_id, n_new = run_resumable_pipeline(spark, pages, store, num_partitions=2)
    assert snap_id == 1 and n_new > 0  # slot reclaimed, commit succeeded
    assert store.read(spark).select("url").distinct().count() == store.read(spark).count()
