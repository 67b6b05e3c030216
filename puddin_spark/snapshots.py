"""Snapshot-committed table store: Iceberg-style atomicity over parquet.

The reference's resume machinery is a filesystem state machine (stage dirs +
mtime ordering + write-after-conllu ordering, parse_pile.py:260-453,476,
1302-1306). The Spark-native replacement is snapshot commits: a table is the
union of data directories named by an append-only commit log; a crash
mid-write leaves an orphan directory that no commit references, so readers
never see partial output (SURVEY.md section 3.4).

This module implements that contract directly over parquet because the
Iceberg runtime jars are not available in this sandbox. The API is shaped so
an Iceberg catalog can replace the store without touching pipeline code:
``commit`` = snapshot append, ``read`` = table scan of the current snapshot
set, ``processed_keys`` + ``resume_filter`` = the anti-join resume
(parse_pile.py:999 isin -> left_anti).

Commit protocol (single-writer, crash-safe):
 1. write data files to  base/_staging/<token>/data        (invisible)
 2. write lineage files to base/_staging/<token>/lineage   (invisible)
 3. atomically rename base/_staging/<token> -> base/snap-<n>
 4. atomically rename a commit record tmpfile -> base/_commits/<n>.json

A snapshot is committed iff its record exists in _commits/; step 3 without
step 4 is invisible, steps 1-2 without 3 are invisible. Lineage rides the
same commit, so no phantom lineage rows can exist (SURVEY.md section 7.3).
"""
from __future__ import annotations

import json
import os
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotStore:
    def __init__(self, base_dir: str | os.PathLike):
        self.base = Path(base_dir)
        (self.base / "_commits").mkdir(parents=True, exist_ok=True)
        (self.base / "_staging").mkdir(parents=True, exist_ok=True)

    # --- commit log ---

    def commits(self) -> list[dict]:
        recs = []
        for p in sorted((self.base / "_commits").glob("*.json")):
            recs.append(json.loads(p.read_text()))
        return recs

    def current_snapshot_id(self) -> int:
        recs = self.commits()
        return recs[-1]["snapshot_id"] if recs else -1

    # --- write path ---

    def commit(self, data: DataFrame, lineage: DataFrame | None = None) -> int:
        """Atomically append one snapshot (data + optional lineage)."""
        token = uuid.uuid4().hex
        staging = self.base / "_staging" / token
        data.write.mode("overwrite").parquet(str(staging / "data"))
        if lineage is not None:
            lineage.write.mode("overwrite").parquet(str(staging / "lineage"))

        snap_id = self.current_snapshot_id() + 1
        snap_dir = self.base / f"snap-{snap_id:06d}"
        if snap_dir.exists():
            # orphan from a crash between the dir rename and the commit-record
            # write: no commit references it (readers never saw it), and this
            # is a single-writer store — reclaim the slot so commits never
            # wedge on ENOTEMPTY
            import shutil

            shutil.rmtree(snap_dir)
        os.rename(staging, snap_dir)  # atomic on POSIX

        rec = {
            "snapshot_id": snap_id,
            "data_dir": snap_dir.name + "/data",
            "lineage_dir": (snap_dir.name + "/lineage") if lineage is not None else None,
        }
        tmp = self.base / "_commits" / f".{snap_id:06d}.json.tmp"
        tmp.write_text(json.dumps(rec))
        os.rename(tmp, self.base / "_commits" / f"{snap_id:06d}.json")  # atomic
        return snap_id

    # --- read path ---

    def _dirs(self, kind: str) -> list[str]:
        out = []
        for rec in self.commits():
            d = rec.get(f"{kind}_dir")
            if d:
                out.append(str(self.base / d))
        return out

    def read(self, spark: SparkSession) -> DataFrame | None:
        dirs = self._dirs("data")
        return spark.read.parquet(*dirs) if dirs else None

    def read_lineage(self, spark: SparkSession) -> DataFrame | None:
        dirs = self._dirs("lineage")
        return spark.read.parquet(*dirs) if dirs else None

    # --- resume ---

    def resume_filter(
        self, spark: SparkSession, incoming: DataFrame, key: str = "url"
    ) -> DataFrame:
        """incoming ∖ already-committed, by key (left_anti; the committed key
        set is typically far smaller than the input, and Spark/AQE picks
        broadcast vs shuffled anti-join from runtime stats)."""
        committed = self.read(spark)
        if committed is None:
            return incoming
        return incoming.join(
            committed.select(F.col(key)).distinct(), key, "left_anti"
        )


def run_resumable_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    store: SnapshotStore,
    *,
    num_partitions: int = 32,
) -> tuple[int, int]:
    """One resumable pipeline run: process only not-yet-committed urls,
    commit verdicts + per-partition lineage atomically.

    Returns (snapshot_id, n_new_docs); snapshot_id is -1 when there was
    nothing new (no empty commits — rerun after success is a no-op, the
    kill/rerun contract from BASELINE.md).
    """
    from puddin_spark.pipeline import lineage_table, quality_pipeline

    # one scan of the commit history serves both anti-joins (url, then
    # text digest). The digest join is the global keep-first dedup across
    # runs: a url whose text body was already processed under another url in
    # a PRIOR commit never reprocesses (the within-run dedup_first only sees
    # the current todo set) — without it, urls shadowed by an in-run
    # duplicate would be rediscovered on every rerun and resume would not be
    # idempotent.
    committed = store.read(spark)
    todo = pages
    seen = None
    if committed is not None:
        cols = ["url"] + (["text_sha"] if "text_sha" in committed.columns else [])
        seen = committed.select(*cols).persist()
        todo = todo.join(seen.select("url").distinct(), "url", "left_anti")
        if "text_sha" in cols:
            todo = todo.join(
                seen.select("text_sha").distinct(),
                F.sha2(todo["text"], 256) == F.col("text_sha"),
                "left_anti",
            )
    verdicts = quality_pipeline(todo, num_partitions=num_partitions)
    verdicts = verdicts.persist()
    try:
        n_new = verdicts.count()
        if n_new == 0:
            return -1, 0
        lineage = lineage_table(verdicts, num_partitions=num_partitions).withColumn(
            "snapshot_id", F.lit(store.current_snapshot_id() + 1)
        )
        snap_id = store.commit(verdicts, lineage)
        return snap_id, n_new
    finally:
        verdicts.unpersist()
        if seen is not None:
            seen.unpersist()
