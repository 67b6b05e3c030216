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
 4. atomically link(2) a commit record tmpfile -> base/_commits/<n>.json
    (link fails with EEXIST if another writer landed the same id — the
    single-writer assumption fails loudly, never by silent clobber)

A snapshot is committed iff its record exists in _commits/; step 3 without
step 4 is invisible, steps 1-2 without 3 are invisible. Lineage rides the
same commit, so no phantom lineage rows can exist (SURVEY.md section 7.3).
Long-lived stores (one commit per streaming micro-batch) are reset to O(1)
read/commit cost by compact() + gc() — a base snapshot supersedes all
earlier ones, Iceberg's rewrite_data_files analog.
"""
from __future__ import annotations

import json
import os
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ConcurrentWriteError(RuntimeError):
    """Two writers raced on the same snapshot id — the store is
    single-writer by contract; the loser fails loudly instead of silently
    clobbering the winner's commit record."""


def _stat_value(v):
    """JSON-encodable file-stat value. Numeric and string columns only —
    the loud failure beats silently recording un-comparable stats."""
    if isinstance(v, bool) or v is None:
        return v
    if isinstance(v, (int, float, str)):
        return v
    raise TypeError(
        f"file-skipping stats support numeric/string/bool columns, got "
        f"{type(v).__name__}; cast (e.g. timestamps to epoch seconds) first"
    )


def _collect_file_stats(data_dir: Path, cols: list[str]) -> dict:
    """Per-file min/max for `cols` from the just-written parquet footers —
    the Iceberg manifest column-stats analog. Driver-side footer reads of
    files this writer just produced (no data pages touched); on a shared
    filesystem this is the same O(files) metadata pass Iceberg's commit
    performs. Returns {relpath: {col: [min, max]}} with nulls for files
    where the footer carries no stats (those files never prune)."""
    import pyarrow.parquet as pq

    out: dict[str, dict] = {}
    for f in sorted(data_dir.rglob("*.parquet")):
        rel = str(f.relative_to(data_dir))
        meta = pq.ParquetFile(f).metadata
        names = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        stats: dict[str, list] = {}
        for col in cols:
            i = names.get(col)
            if i is None:  # e.g. a partition column: lives in the path
                continue
            lo = hi = None
            ok = True
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(i).statistics
                if st is None or not st.has_min_max:
                    ok = False
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            stats[col] = (
                [_stat_value(lo), _stat_value(hi)] if ok else [None, None]
            )
        out[rel] = stats
    return out


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

    def _active_commits(self, as_of: int | None = None) -> list[dict]:
        """Commits that contribute to the table state AS OF the given
        snapshot id (default: latest): everything from the most recent base
        (compaction) snapshot at-or-before `as_of` onward, up to `as_of` —
        the Iceberg time-travel read (`VERSION AS OF`). Commits are
        immutable, so any historical state remains readable until gc()
        drops pre-base snapshots."""
        recs = self.commits()
        if as_of is not None:
            recs = [r for r in recs if r["snapshot_id"] <= as_of]
            if not recs or recs[-1]["snapshot_id"] != as_of:
                raise ValueError(f"no committed snapshot {as_of}")
        for i in range(len(recs) - 1, -1, -1):
            if recs[i].get("base"):
                return recs[i:]
        return recs

    def current_snapshot_id(self) -> int:
        recs = self.commits()
        return recs[-1]["snapshot_id"] if recs else -1

    # --- write path ---

    def commit(
        self,
        data: DataFrame,
        lineage: DataFrame | None = None,
        *,
        base: bool = False,
        partition_by: list[str] | None = None,
        stats_cols: list[str] | None = None,
        lineage_stats_cols: list[str] | None = None,
    ) -> int:
        """Atomically append one snapshot (data + optional lineage).
        base=True marks a compaction snapshot that supersedes all earlier
        ones (readers start from the latest base). partition_by writes the
        data directory-partitioned on those columns (Iceberg partition-spec
        analog) so readers filtering on them prune files; compact()
        preserves the latest commit's spec. stats_cols records per-FILE
        min/max for those columns in the commit record (the Iceberg
        manifest column-stats analog, read from the just-written parquet
        footers); read_where() uses them to open only the files whose
        range can satisfy a predicate — cluster the data on the column
        first (repartitionByRange + sortWithinPartitions) or the ranges
        all overlap and nothing prunes. lineage_stats_cols is the same for
        the LINEAGE files (read_lineage_where) — lineage accumulates one
        snapshot per batch, so per-batch metric reads on a long-lived
        store should open one snapshot's files, not every batch's since
        the last compact. Raises ConcurrentWriteError if
        another writer landed the same snapshot id first — link(2) is the
        O_EXCL of the commit protocol."""
        token = uuid.uuid4().hex
        staging = self.base / "_staging" / token
        if partition_by and not stats_cols:
            # Iceberg write.distribution-mode=hash analog (optimization
            # guide section 6): cluster rows by the partition columns before
            # a partitionBy write, or every input task writes one file into
            # every partition directory (observed: a 32-partition band frame
            # x 16 prefix dirs = ~500 tiny files per commit, and the commit
            # wall was file-creation overhead). One shuffle, one file per
            # populated directory. SKIPPED when stats_cols is set: that
            # contract requires the CALLER's range clustering
            # (repartitionByRange + sortWithinPartitions, see docstring) to
            # reach the files unchanged, or every file's min/max overlaps
            # and read_where prunes nothing.
            data = data.repartition(*[F.col(c) for c in partition_by])
        writer = data.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(str(staging / "data"))
        file_stats = (
            _collect_file_stats(staging / "data", stats_cols) if stats_cols else None
        )
        lineage_file_stats = None
        if lineage is not None:
            lineage.write.mode("overwrite").parquet(str(staging / "lineage"))
            if lineage_stats_cols:
                lineage_file_stats = _collect_file_stats(
                    staging / "lineage", lineage_stats_cols
                )

        snap_id = self.current_snapshot_id() + 1
        final = self.base / "_commits" / f"{snap_id:06d}.json"
        if final.exists():
            # cheap early exit: another writer fully landed this id since we
            # read the log (the authoritative arbitration is the link below)
            raise ConcurrentWriteError(
                f"snapshot {snap_id} was committed by another writer; "
                f"this store is single-writer"
            )
        # the data directory name carries the writer token, so concurrent
        # writers NEVER collide on a directory — no reclaim-rmtree exists to
        # misfire on a competitor's just-renamed data. The commit-record
        # link(2) below is the single arbitration point; a loser's renamed
        # directory is simply an unreferenced orphan that gc() collects.
        snap_dir = self.base / f"snap-{snap_id:06d}-{token[:8]}"
        os.rename(staging, snap_dir)  # atomic on POSIX

        rec = {
            "snapshot_id": snap_id,
            "data_dir": snap_dir.name + "/data",
            "lineage_dir": (snap_dir.name + "/lineage") if lineage is not None else None,
            "base": base,
            "partition_by": partition_by or None,
            "stats_cols": stats_cols or None,
            "file_stats": file_stats,
            "lineage_stats_cols": lineage_stats_cols or None,
            "lineage_file_stats": lineage_file_stats,
        }
        # per-writer tmp record: a shared name would let the loser unlink
        # the winner's tmp mid-protocol
        tmp = self.base / "_commits" / f".{snap_id:06d}.{token[:8]}.json.tmp"
        tmp.write_text(json.dumps(rec))
        try:
            os.link(tmp, final)  # fails with EEXIST instead of clobbering
        except FileExistsError:
            tmp.unlink()
            raise ConcurrentWriteError(
                f"snapshot {snap_id} was committed by another writer; "
                f"this store is single-writer"
            ) from None
        tmp.unlink()
        return snap_id

    # --- maintenance ---

    def compact(self, spark: SparkSession) -> int:
        """Merge every active snapshot into one base snapshot. Long-lived
        (e.g. streaming foreachBatch) stores accumulate one snapshot per
        micro-batch; read() unions every directory and commits() re-parses
        every record, both O(commit count) — compaction resets that to O(1).
        Returns the new snapshot id, or -1 for an empty store."""
        data = self.read(spark)
        if data is None:
            return -1
        lineage = self.read_lineage(spark)
        recs = self._active_commits()
        part = recs[-1].get("partition_by") if recs else None
        stats = recs[-1].get("stats_cols") if recs else None
        lin_stats = recs[-1].get("lineage_stats_cols") if recs else None
        return self.commit(
            data, lineage, base=True, partition_by=part, stats_cols=stats,
            lineage_stats_cols=lin_stats,
        )

    def rollback(self, spark: SparkSession, to_snapshot: int) -> int:
        """Restore the table to a historical state by committing it as a new
        BASE snapshot (Iceberg's rollback: history moves forward, data moves
        back). Earlier states stay readable via read(as_of=...) until gc().
        Returns the new snapshot id."""
        data = self.read(spark, as_of=to_snapshot)
        lineage = self.read_lineage(spark, as_of=to_snapshot)
        recs = self._active_commits(to_snapshot)
        part = recs[-1].get("partition_by") if recs else None
        stats = recs[-1].get("stats_cols") if recs else None
        lin_stats = recs[-1].get("lineage_stats_cols") if recs else None
        return self.commit(
            data, lineage, base=True, partition_by=part, stats_cols=stats,
            lineage_stats_cols=lin_stats,
        )

    def gc(self, *, staging_max_age_s: float = 3600.0) -> int:
        """Drop commit records and snapshot directories superseded by the
        latest base snapshot, plus unreferenced orphan directories (crashed
        or commit-race-losing writers) and STALE staging / record-tmp
        files. Returns the number of snapshot directories removed. Run
        after compact(); not concurrency-safe with in-flight readers of
        pre-base snapshots.

        staging_max_age_s guards in-flight writers everywhere a live commit
        could be holding an artifact: staging trees (aged by their NEWEST
        file — a parquet write in progress updates leaf files, not the top
        dir), never-referenced snap dirs (a writer sits between rename and
        record-link there), and leftover record tmp files. Superseded dirs
        — referenced by the records being dropped — are deleted regardless
        of age; they are committed history, not an in-flight write. Pass 0
        only when no writer can be running."""
        import shutil
        import time

        def tree_mtime(path) -> float:
            newest = path.stat().st_mtime
            for root, _, files in os.walk(path):
                for f in files:
                    newest = max(newest, os.stat(os.path.join(root, f)).st_mtime)
            return newest

        now = time.time()
        all_records = self.commits()
        active_ids = {rec["snapshot_id"] for rec in self._active_commits()}
        # keep-set by directory NAME from the records (orphans from losing
        # writers share a snapshot id with the winner but not a directory)
        active_dirs, superseded_dirs = set(), set()
        for rec in all_records:
            dirs = (
                active_dirs if rec["snapshot_id"] in active_ids else superseded_dirs
            )
            for kind in ("data_dir", "lineage_dir"):
                d = rec.get(kind)
                if d:
                    dirs.add(d.split("/")[0])
        removed = 0
        # records first: new readers stop referencing the old dirs
        for p in sorted((self.base / "_commits").glob("*.json")):
            if json.loads(p.read_text())["snapshot_id"] not in active_ids:
                p.unlink()
        for p in (self.base / "_commits").glob(".*.json.tmp"):
            # crashed writers leak their per-writer tmp record
            if now - p.stat().st_mtime >= staging_max_age_s:
                p.unlink()
        for d in sorted(self.base.glob("snap-*")):
            if d.name in active_dirs:
                continue
            if d.name in superseded_dirs or (
                now - tree_mtime(d) >= staging_max_age_s
            ):
                shutil.rmtree(d)
                removed += 1
        for d in (self.base / "_staging").iterdir():
            if now - tree_mtime(d) >= staging_max_age_s:
                shutil.rmtree(d)
        return removed

    # --- read path ---

    def _dirs(self, kind: str, as_of: int | None = None) -> list[str]:
        out = []
        for rec in self._active_commits(as_of):
            d = rec.get(f"{kind}_dir")
            if d:
                out.append(str(self.base / d))
        return out

    def _read_kind(
        self, spark: SparkSession, kind: str, as_of: int | None
    ) -> DataFrame | None:
        recs = [r for r in self._active_commits(as_of) if r.get(f"{kind}_dir")]
        if not recs:
            return None
        dirs = [str(self.base / r[f"{kind}_dir"]) for r in recs]
        # an EMPTY partitioned write leaves a snapshot dir with no data
        # files at all (Spark emits only _SUCCESS — no partition dirs, so
        # no schema-bearing 0-row part file like the unpartitioned case);
        # such dirs contribute nothing and would fail schema inference
        dirs = [d for d in dirs if any(Path(d).rglob("*.parquet"))]
        if not dirs:
            return None
        partitioned = any(r.get("partition_by") for r in recs)
        # schema evolution (Iceberg add-column analog): snapshots written
        # before a column existed must still read — old rows surface null.
        # The multi-path fast scan below takes ONE file's schema and would
        # silently DROP later-added columns, so compare per-dir schemas
        # first (driver-side footer sample each, O(active snapshots), cheap
        # because compact() bounds the snapshot count) and fall back to a
        # per-dir union that fills missing columns.
        frames = [spark.read.parquet(d) for d in dirs]
        schemas = {tuple(sorted((f.name, f.dataType.simpleString()) for f in df.schema.fields)) for df in frames}
        if len(schemas) > 1 or partitioned:
            # partitioned snapshots also union per-dir: each dir is its own
            # partition-discovery root (Spark rejects multi-root discovery).
            # Filters push through Union into every branch's scan, so
            # partition pruning is preserved.
            out = frames[0]
            for df in frames[1:]:
                out = out.unionByName(df, allowMissingColumns=True)
            return out
        return spark.read.parquet(*dirs)

    def read(self, spark: SparkSession, as_of: int | None = None) -> DataFrame | None:
        """Current table state, or — with as_of — the state as of that
        snapshot id (time travel; raises on an unknown/gc'd id)."""
        return self._read_kind(spark, "data", as_of)

    def read_lineage(
        self, spark: SparkSession, as_of: int | None = None
    ) -> DataFrame | None:
        return self._read_kind(spark, "lineage", as_of)

    def read_where(
        self,
        spark: SparkSession,
        col: str,
        lo=None,
        hi=None,
        as_of: int | None = None,
    ) -> DataFrame | None:
        """Rows with `lo <= col <= hi` (either bound may be None), opening
        ONLY the files whose recorded [min, max] range can overlap — the
        manifest-level file skipping Iceberg performs before the scan,
        driven by the stats recorded at commit(stats_cols=[...]). Results
        are identical to read().filter(...): snapshots committed without
        stats for `col` fall back to all their files, a file whose footer
        had no stats ([None, None]) is never skipped, and an all-null file
        is safely skippable because a range predicate never matches null.
        Returns None when nothing is committed (or every file was pruned
        and no schema source remains)."""
        return self._read_where_kind(spark, "data", col, lo, hi, as_of)

    def read_lineage_where(
        self,
        spark: SparkSession,
        col: str,
        lo=None,
        hi=None,
        as_of: int | None = None,
    ) -> DataFrame | None:
        """read_where over the LINEAGE files, driven by the stats recorded
        at commit(lineage_stats_cols=[...]). The pipeline commits lineage
        with per-file snapshot_id stats, so a per-batch metrics read
        (snapshot_id == s) opens exactly that batch's lineage files — on a
        long-lived incremental store the alternative is scanning one
        lineage snapshot per batch since the last compact."""
        return self._read_where_kind(spark, "lineage", col, lo, hi, as_of)

    def _read_where_kind(
        self, spark, kind: str, col: str, lo, hi, as_of: int | None
    ) -> DataFrame | None:
        dir_key, cols_key, stats_key = (
            ("data_dir", "stats_cols", "file_stats")
            if kind == "data"
            else ("lineage_dir", "lineage_stats_cols", "lineage_file_stats")
        )
        frames = []
        for r in self._active_commits(as_of):
            d = r.get(dir_key)
            if not d:
                continue
            ddir = self.base / d
            fs = r.get(stats_key) if col in (r.get(cols_key) or []) else None
            if fs is None:
                files = [str(p) for p in sorted(ddir.rglob("*.parquet"))]
            else:
                files = []
                for rel, stats in sorted(fs.items()):
                    mn, mx = stats.get(col, [None, None])
                    if mn is None or mx is None:
                        # no footer stats — cannot prune. (An all-null
                        # file records [None, None] too; keeping it is
                        # correct, merely unpruned, and the row filter
                        # below still excludes its rows.)
                        files.append(str(ddir / rel))
                    elif (lo is None or mx >= lo) and (hi is None or mn <= hi):
                        files.append(str(ddir / rel))
            if not files:
                continue
            # basePath keeps directory-partition columns visible when the
            # snapshot is partitioned
            frames.append(
                spark.read.option("basePath", str(ddir)).parquet(*files)
            )
        if not frames:
            return None
        out = frames[0]
        for df in frames[1:]:
            out = out.unionByName(df, allowMissingColumns=True)
        c = F.col(col)
        if lo is not None:
            out = out.filter(c >= F.lit(lo))
        if hi is not None:
            out = out.filter(c <= F.lit(hi))
        return out

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


def record_failures(
    spark: SparkSession,
    store: SnapshotStore,
    failed: DataFrame,
    *,
    excl_type: str = "fail",
    num_partitions: int = 32,
) -> int:
    """Post-hoc doc-level failure recording (F9): the reference appended
    parse-failure rows to its exclusions table AFTER the parse loop
    (parse_pile.py:1374-1390). Here the verdict flip (keep -> false,
    excl_type -> 'fail') lands as a new BASE snapshot — the overwrite-
    snapshot shape of table formats like Iceberg — so readers see exactly
    one row per doc and resume semantics are unchanged. Lineage is
    recomputed from the updated verdicts so rule-hit counts include the
    failures. Returns the new snapshot id, or -1 if `failed` is empty.
    """
    from puddin_spark.pipeline import lineage_table

    verdicts = store.read(spark)
    if verdicts is None:
        raise ValueError("record_failures on an empty store")
    flagged = failed.select("doc_id").distinct().withColumn("_fail", F.lit(True))
    if flagged.isEmpty():
        return -1
    # no forced broadcast: failures are normally tiny (AQE will broadcast),
    # but a mass-failure event must not OOM the driver trying to
    updated = (
        verdicts.join(flagged, "doc_id", "left")
        .withColumn(
            "keep", F.when(F.col("_fail"), F.lit(False)).otherwise(F.col("keep"))
        )
        .withColumn(
            "excl_type",
            F.when(F.col("_fail"), F.lit(excl_type)).otherwise(F.col("excl_type")),
        )
        .drop("_fail")
        .select(*verdicts.columns)
    )
    lineage = lineage_table(updated, num_partitions=num_partitions).withColumn(
        "snapshot_id", F.lit(store.current_snapshot_id() + 1)
    )
    snap_id = store.commit(
        updated, lineage, base=True, lineage_stats_cols=["snapshot_id"]
    )
    _prune_near_dedup_sidecar(spark, store, updated)
    return snap_id


def _prune_near_dedup_sidecar(spark, store: SnapshotStore, verdicts: DataFrame) -> None:
    """Keep the near-dedup indexes consistent with a verdict flip: entries
    for now-excluded docs would otherwise keep dropping future newcomers as
    near-dups of documents no longer in the corpus — both copies lost — and
    the ingest-time reconciliation gate would re-fire forever. Prunes each
    signature index (minhash AND srp) to the current kept id set as a base
    commit; the minhash band table (a derived cache) is left to its
    row-count gate, which rebuilds it from the pruned index by projection
    on the next ingest. No-op for any sidecar that was never enabled."""
    kept = verdicts.filter("keep").select(F.col("doc_id").alias("id"))
    # band caches (minhash_bands, srp_bands) are left to their row-count
    # gates, which rebuild them from the pruned indexes by projection
    for name, part in (("minhash_index", None), ("srp_index", None)):
        idx_base = store.base / name
        if not (idx_base / "_commits").exists() or not any(
            (idx_base / "_commits").glob("*.json")
        ):
            continue
        idx_store = SnapshotStore(idx_base)
        idx = idx_store.read(spark)
        if idx is None:
            continue
        idx_store.commit(
            idx.join(kept, "id", "left_semi"), base=True, partition_by=part
        )


def run_resumable_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    store: SnapshotStore,
    *,
    num_partitions: int = 32,
    near_dedup: bool = False,
    embedding_near_dedup: bool = False,
    srp_planes: int | None = None,
    srp_bands: int | None = None,
    html_fallback: bool = False,
    fix_mojibake: bool = False,
    blocked_domains=None,
    gopher: bool = False,
    gopher_min_words: int = 50,
    c4: bool = False,
    decontaminate_against: DataFrame | None = None,
    decontaminate_ngram: int = 13,
    span_window: int = 0,
    span_max_flagged: int = 0,
    ppl_lm: DataFrame | None = None,
    ppl_max: float = 0.0,
    partition_by: list[str] | None = None,
    dedup_broadcast: bool = True,
) -> tuple[int, int]:
    """One resumable pipeline run: process only not-yet-committed urls,
    commit verdicts + per-partition lineage atomically.

    near_dedup=True additionally fuzzy-dedups each batch against every
    PRIOR batch: a minhash index (shingles + signatures of surviving kept
    docs) is maintained in a sibling snapshot store at <base>/minhash_index,
    with its exploded LSH band table — directory-partitioned by band-key
    prefix for per-batch file pruning — in <base>/minhash_bands. New docs
    near-duplicating an indexed doc — or losing keep-first within the
    batch's own near-dup clusters — flip to keep=false with
    excl_type='near_dup' BEFORE the commit, and only survivors join the
    index. Per-batch cost scales with the batch (the committed corpus is
    never re-shingled or re-paired, and the band scan reads only the
    batch's prefix partitions; incremental_minhash_pairs). This is the
    near-dup analog of the exact text_sha resume dedup below; off by
    default because 'near_dup' is a graft-axis label the reference doesn't
    emit. Consistency is self-healing without a 2-phase commit: a
    (count, xor-of-ids) gate reconciles the index against the committed
    kept set in BOTH directions (crash-lag re-index AND stale-entry prune
    after record_failures/rollback), landed as a base commit so the repair
    runs once; the band cache rebuilds from the index by projection. Both
    sidecars share the verdict store's compact()/gc() lifecycle (CLI
    `compact` runs the verdict store plus all four sidecars).

    embedding_near_dedup=True is the EMBEDDING-space analog: each batch's
    kept docs are encoded (models.doc_embedding_udf — the
    sentence-transformer seam's deterministic stand-in) into an (id, v)
    index at <base>/srp_index, with its banded SRP key cache —
    directory-partitioned by bucket prefix so each batch's committed-side
    scan prunes to its own prefix partitions — at <base>/srp_bands
    (similarity.incremental_srp_band_pairs — new-vs-committed and
    new-vs-new only, the corpus is never re-encoded or re-paired).
    Newcomers with cosine >= 0.99 of an indexed doc — or keep-first losers
    within the batch's own clusters — flip to excl_type='emb_near_dup'
    before the commit. Same reconciliation gate, commit ordering, and compact()/gc()
    lifecycle as the minhash sidecar; composes with near_dedup=True
    (minhash flips land first, the embedding pass sees only survivors).
    The index is BANDED (srp_bands bucket keys per doc, each from a
    disjoint srp_planes-plane family; candidates share ANY band key) so
    near-twin recall stays high while random collisions per band scale as
    N/2^planes — the band table lives at <base>/srp_bands as a derived
    cache with the minhash band table's lifecycle. srp_planes/srp_bands
    apply on FIRST use (defaults 16/8; raise planes at larger corpus
    scales), persist in the sidecar's _meta.json, and later runs must
    match or omit them — band keys from different configs are
    incomparable, so a mismatch raises instead of silently generating no
    candidates.

    fix_mojibake=True repairs double-encoded UTF-8 in the incoming text
    (operators/encoding.py replace chain — pure codegen) BEFORE anything
    else: before the resume sha2 digest (so a re-crawl delivering the
    repaired bytes of an already-processed corrupted page still
    anti-joins consistently within a flagged pipeline) and before the
    scrub/translit chain (translit would mangle 'Ã©' into 'A(c)' instead
    of 'e'). Off by default: the reference corpus is already repaired
    upstream, and byte-parity with its fixtures is the default contract.

    gopher=True composes the Gopher/MassiveText heuristic rule battery
    (textstats.apply_gopher_gate — word-count/word-length bounds, symbol
    and ellipsis ratios, bullet/ellipsis line fractions, alpha-word
    fraction, required stopwords) after the puddin rules: kept docs
    failing any rule flip to excl_type='gopher' before dedup sees them.
    A pure-codegen projection — no extra shuffle or Python. Off by
    default ('gopher' is a graft-axis label the reference doesn't emit);
    gopher_min_words parameterizes the lower word bound.

    c4=True composes the C4 cleaning battery (textstats.apply_c4_gate):
    kept docs keep only lines ending in terminal punctuation with >=5
    words and no javascript mention (clean_text is REWRITTEN to the
    retained lines), and pages with code braces / 'lorem ipsum' / fewer
    than 3 surviving sentences flip to excl_type='c4'. Also pure codegen,
    off by default, and composes with gopher (both gates see only the
    other's survivors; order: gopher first, C4 second — C4 rewrites text,
    so gopher's ratios judge the original page).

    decontaminate_against (a DataFrame with a `text` column — the eval/
    benchmark suite) flips kept docs sharing any word n-gram
    (decontaminate_ngram, default 13) with it to excl_type='contaminated'
    BEFORE the near-dedup passes (dedup.apply_decontamination_gate; the
    eval side broadcasts, document bodies never shuffle).

    span_window > 0 applies the repeated-span hygiene gate
    (dedup.apply_repeated_span_gate, ExactSubstr-style hashed windows of
    span_window tokens): kept docs with more than span_max_flagged
    duplicated spans flip to excl_type='dup_spans'. BATCH-LOCAL by
    design: spans are compared within the current batch only (unlike the
    minhash/SRP near-dedup passes, which index all prior batches) —
    cross-batch span hygiene means running the repeated_spans operator
    over the accumulated kept corpus as a separate job.

    Returns (snapshot_id, n_new_docs); snapshot_id is -1 when there was
    nothing new (no empty commits — rerun after success is a no-op, the
    kill/rerun contract from BASELINE.md).
    """
    from puddin_spark.pipeline import lineage_table, quality_pipeline

    if embedding_near_dedup:
        # resolve/validate the sidecar band config UP FRONT: a conflicting
        # srp_planes/srp_bands must fail even when this run turns out to be
        # a no-op (the config error is real regardless of batch content)
        srp_planes, srp_bands = _srp_meta(
            store.base / "srp_index", srp_planes, srp_bands
        )
    # one scan of the commit history serves both anti-joins (url, then
    # text digest). The digest join is the global keep-first dedup across
    # runs: a url whose text body was already processed under another url in
    # a PRIOR commit never reprocesses (the within-run dedup_first only sees
    # the current todo set) — without it, urls shadowed by an in-run
    # duplicate would be rediscovered on every rerun and resume would not be
    # idempotent.
    if html_fallback:
        # substitute extracted text BEFORE the sha2 anti-join below:
        # WET-missing rows all share the empty-string digest, so hashing
        # the raw column would anti-join every later html-only row against
        # the first committed one (operators/html.py note)
        from puddin_spark.operators.html import with_html_fallback

        pages = with_html_fallback(pages)
    if fix_mojibake:
        # also before the digest anti-join: within a flagged pipeline the
        # committed digests are of REPAIRED text, so the incoming side
        # must hash the same form or resume would reprocess every
        # corrupted page on every run
        from puddin_spark.operators.encoding import fix_mojibake_expr

        pages = pages.withColumn("text", F.expr(fix_mojibake_expr("text")))
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
    # with_timing: Arrow-batch stamps ride the UDF pass so the committed
    # lineage carries real per-partition started_at/finished_at/duration_s
    # dedup_broadcast=False is the escape hatch for ingest batches whose
    # duplicate fraction makes the loser set too large to broadcast
    # (quality_pipeline docstring) — the windowed full-row dedup runs then
    verdicts = quality_pipeline(
        todo, num_partitions=num_partitions, with_timing=True,
        blocked_domains=blocked_domains, dedup_broadcast=dedup_broadcast,
    )
    if gopher:
        # cheapest gate first: a codegen-only flip that shrinks the kept
        # set before the broadcast-join (decontaminate) and shuffle
        # (near-dedup) stages do per-doc work
        from puddin_spark.operators.textstats import apply_gopher_gate

        verdicts = apply_gopher_gate(verdicts, min_words=gopher_min_words)
    if c4:
        # after gopher (which judges the original page), before the
        # joins/shuffles: C4 rewrites surviving clean_text to its
        # retained lines, so downstream dedup hashes the cleaned body
        from puddin_spark.operators.textstats import apply_c4_gate

        verdicts = apply_c4_gate(verdicts)
    if ppl_lm is not None:
        # CCNet-style quality flip against a PERSISTED target-domain LM
        # (train-lm once on e.g. a Wikipedia sample, score every ingest
        # batch): after the codegen gates, before decontaminate/span/
        # near-dedup — its three broadcast probes are cheaper than the
        # ngram-explode join stages it shrinks
        from puddin_spark.operators.ngram_lm import apply_ppl_gate

        verdicts = apply_ppl_gate(verdicts, ppl_lm, max_ppl=ppl_max)
    if decontaminate_against is not None:
        # train/test-leakage flip BEFORE the near-dedup passes: fewer kept
        # docs reach the (costlier) encoding/shingling stages, and a doc
        # that is both contaminated and a near-dup records the policy
        # reason (contaminated) rather than the incidental one
        from puddin_spark.operators.dedup import apply_decontamination_gate

        verdicts = apply_decontamination_gate(
            verdicts, decontaminate_against, n=decontaminate_ngram
        )
    if span_window:
        # after the policy gates, before the sidecar passes — a doc that
        # is both span-spam and a near-dup records the cheaper-to-compute
        # reason, and fewer docs reach the shingling/encoding stages
        from puddin_spark.operators.dedup import apply_repeated_span_gate

        verdicts = apply_repeated_span_gate(
            verdicts, window=span_window, max_flagged=span_max_flagged
        )
    raw_verdicts = verdicts = verdicts.persist()
    new_idx = None
    try:
        n_new = verdicts.count()
        if n_new == 0:
            return -1, 0
        idx_store = bands_store = srp_store = srp_bands_store = None
        new_srp_idx = new_srp_bands = None
        mh_occupancy = srp_occupancy = None
        if near_dedup:
            verdicts, new_idx, idx_store, bands_store, mh_occupancy = (
                _apply_near_dedup(spark, store, verdicts, committed)
            )
        if embedding_near_dedup:
            (
                verdicts, new_srp_idx, new_srp_bands, srp_store,
                srp_bands_store, srp_occupancy,
            ) = _apply_embedding_near_dedup(
                spark, store, verdicts, committed,
                planes=srp_planes, bands=srp_bands,
            )
        if near_dedup or embedding_near_dedup:
            verdicts = verdicts.persist()
            verdicts.count()  # materialize before committing
        lineage = lineage_table(verdicts, num_partitions=num_partitions).withColumn(
            "snapshot_id", F.lit(store.current_snapshot_id() + 1)
        )
        # proc_ts is lineage-only instrumentation — the published verdict
        # schema (OUTPUT_COLS) is what lands in the store
        # lineage carries snapshot_id on every row and is committed with
        # per-file snapshot_id stats: per-batch metric reads
        # (read_lineage_where) open exactly this batch's lineage files
        # instead of one snapshot per batch since the last compact
        snap_id = store.commit(
            verdicts.drop("proc_ts"), lineage, partition_by=partition_by,
            lineage_stats_cols=["snapshot_id"],
        )
        if near_dedup and new_idx is not None:
            # index lands AFTER the verdict commit (see docstring for the
            # crash-lag recovery); only this batch's surviving kept docs.
            # Bands land last (pure derived cache; a crash between these
            # two commits is caught by the row-count gate next batch).
            from puddin_spark.operators.dedup import (
                band_table,
                free_local_checkpoints,
            )

            if embedding_near_dedup:
                # the embedding pass ran after minhash and may have flipped
                # more docs; the minhash index must hold KEPT docs only or
                # next batch's reconciliation gate re-fires
                new_idx = new_idx.join(
                    verdicts.filter("keep").select(F.col("doc_id").alias("id")),
                    "id",
                    "left_semi",
                )
            idx_store.commit(new_idx)
            # bands carry the batch's hot-bucket occupancy as LINEAGE — the
            # no-silent-caps telemetry for LSH degeneracy (band_occupancy)
            bands_store.commit(
                band_table(new_idx, **_ND_BAND_KW),
                lineage=mh_occupancy,
                partition_by=["band_pfx"],
            )
        if embedding_near_dedup and new_srp_idx is not None:
            # index first, derived band cache last (a crash between the two
            # commits is caught by the bands row-count gate next batch)
            srp_store.commit(new_srp_idx)
            srp_bands_store.commit(
                new_srp_bands,
                lineage=srp_occupancy,
                partition_by=["bucket_pfx"],
            )
        if near_dedup or embedding_near_dedup:
            # ALL sidecar readers are committed — only now release the
            # batch's signature checkpoints and the drop-set checkpoint
            # blocks (freeing between the two index commits would drop the
            # embedding drop-set blocks the srp survivors still read: the
            # minhash index plan reaches them through `verdicts`)
            from puddin_spark.operators.dedup import free_local_checkpoints

            for frame in (new_idx, new_srp_idx, new_srp_bands, verdicts):
                if frame is not None:
                    free_local_checkpoints(frame)
        return snap_id, n_new
    finally:
        verdicts.unpersist()
        if raw_verdicts is not verdicts:
            raw_verdicts.unpersist()
        if seen is not None:
            seen.unpersist()


# near-dedup sidecar parameters — ONE definition; the index, its band
# table, and the incremental pair generation must agree bit-for-bit
_ND_IDX_KW = dict(num_hashes=16, shingle_k=3, shingle_mode="word")
_ND_BAND_KW = dict(num_hashes=16, band_size=2, hash_impl="md5")
_ND_NUM_BANDS = _ND_BAND_KW["num_hashes"] // _ND_BAND_KW["band_size"]


def _id_set_stats(df, col: str) -> tuple[int, int]:
    """(count, order-independent xor fingerprint) of an id column — two
    cheap column-scan aggregates that detect MEMBERSHIP differences, not
    just size drift (a rollback can restore an equal-sized but different
    kept set; a count-only gate would miss it and stale index entries would
    keep dropping newcomers)."""
    row = df.select(
        F.count("*").alias("n"), F.expr(f"bit_xor(xxhash64({col}))").alias("fp")
    ).first()
    return row.n, row.fp if row.fp is not None else 0


def _heal_stale_sidecar(idx_store: "SnapshotStore", committed_idx):
    """Guard for a sidecar index that outlived its verdict store (the store
    was wiped/recreated but `<verdicts>/minhash_index` or `srp_index`
    survived): the corpus is EMPTY, so deduping a first batch against the
    leftover index would silently drop newcomers as near-dups of documents
    that are not in the corpus. Prune the index to empty as a base commit
    (self-heal, consistent with the (count, xor) reconciliation philosophy)
    and proceed as a true first run. Returns the healed index (None)."""
    if committed_idx is not None:
        idx_store.commit(committed_idx.limit(0), base=True)
    return None


def _apply_near_dedup(spark, store, verdicts, committed):
    """Flip near-dup newcomers to keep=false/excl_type='near_dup'; return
    (updated_verdicts, index_of_survivors, index_store, bands_store,
    occupancy) — occupancy is the batch's top-K hottest (band, bucket)
    telemetry (similarity.band_occupancy), committed as the minhash_bands
    snapshot's lineage. See run_resumable_pipeline(near_dedup=True)."""
    from puddin_spark.operators.dedup import (
        band_table,
        free_local_checkpoints,
        incremental_minhash_pairs,
        minhash_index,
        resolve_duplicate_clusters,
    )

    idx_store = SnapshotStore(store.base / "minhash_index")
    bands_store = SnapshotStore(store.base / "minhash_bands")
    committed_idx = idx_store.read(spark)
    if committed is None:
        committed_idx = _heal_stale_sidecar(idx_store, committed_idx)
    if committed is not None:
        # index<->corpus reconciliation, gated by cheap (count, xor-of-ids)
        # aggregates on both sides. BOTH directions repair here, landed as a
        # BASE commit so the fix runs once, not on every subsequent batch:
        # - stale entries (docs flipped keep=false by record_failures /
        #   rollback / near-dup) are PRUNED — left in place they'd drop
        #   future newcomers as near-dups of excluded docs (both copies
        #   lost);
        # - missing entries (crash between the verdict and index commits)
        #   are re-indexed from committed clean_text.
        kept_committed = committed.filter("keep")
        n_kept, fp_kept = _id_set_stats(kept_committed, "doc_id")
        n_idx, fp_idx = (
            _id_set_stats(committed_idx, "id")
            if committed_idx is not None
            else (0, 0)
        )
        if (n_idx, fp_idx) != (n_kept, fp_kept):
            kept_ids = kept_committed.select(F.col("doc_id").alias("id"))
            pruned = (
                committed_idx.join(kept_ids, "id", "left_semi")
                if committed_idx is not None
                else None
            )
            lag = kept_committed.select("doc_id", "clean_text")
            if pruned is not None:
                lag = lag.join(
                    pruned.select(F.col("id").alias("doc_id")), "doc_id", "left_anti"
                )
            lag_idx = minhash_index(lag, "doc_id", "clean_text", **_ND_IDX_KW)
            reconciled = (
                lag_idx if pruned is None else pruned.unionByName(lag_idx)
            )
            idx_store.commit(reconciled, base=True)
            committed_idx = idx_store.read(spark)
        if committed_idx is not None and committed_idx.isEmpty():
            committed_idx = None

    committed_bands = None
    if committed_idx is not None:
        # the persisted band table is a pure DERIVED cache of the index
        # (band keys only — rebuilt by projection, never by re-shingling);
        # a row-count gate detects lag from a crash between the index and
        # bands commits, or an index prune above
        committed_bands = bands_store.read(spark)
        n_idx = committed_idx.count()
        n_bands = committed_bands.count() if committed_bands is not None else -1
        if n_bands != n_idx * _ND_NUM_BANDS:
            bands_store.commit(
                band_table(committed_idx, **_ND_BAND_KW),
                base=True,
                partition_by=["band_pfx"],
            )
            committed_bands = bands_store.read(spark)

    kept = verdicts.filter("keep").select("doc_id", "clean_text")
    # localCheckpoint: ONE shingling pass serves prefix discovery, the pair
    # join, and the survivors commit (blocks freed by the caller once the
    # index commit lands)
    new_idx = minhash_index(kept, "doc_id", "clean_text", **_ND_IDX_KW).localCheckpoint()
    new_bands = band_table(new_idx, **_ND_BAND_KW)
    if committed_bands is not None:
        # static prefix pruning: committed bands are directory-partitioned
        # by band_pfx, so filtering to the BATCH's own prefixes (<=16
        # values, collected from the checkpointed new bands) prunes whole
        # partitions from the scan — the per-batch read cost tracks the
        # batch, not the corpus
        pfx = [r[0] for r in new_bands.select("band_pfx").distinct().collect()]
        committed_bands = committed_bands.filter(F.col("band_pfx").isin(pfx))
    from puddin_spark.operators.similarity import band_occupancy

    occupancy = band_occupancy(
        new_bands, committed_bands, band_col="band_ix", bucket_col="band_key"
    )
    pairs = incremental_minhash_pairs(
        new_idx,
        committed_idx,
        band_size=_ND_BAND_KW["band_size"],
        jaccard_threshold=0.5,
        new_bands=new_bands,
        committed_bands=committed_bands,
    ).persist()
    new_ids = kept.select(F.col("doc_id").alias("id"))
    vs_committed = pairs.filter("committed_side")
    drops = (
        vs_committed.join(new_ids, vs_committed.id_a == new_ids.id, "left_semi")
        .select(F.col("id_a").alias("doc_id"))
        .unionByName(
            vs_committed.join(
                new_ids, vs_committed.id_b == new_ids.id, "left_semi"
            ).select(F.col("id_b").alias("doc_id"))
        )
    )
    new_new = pairs.filter("not committed_side").select("id_a", "id_b")
    clusters = None
    if not new_new.isEmpty():
        clusters = resolve_duplicate_clusters(new_new)
        drops = drops.unionByName(
            clusters.filter("id != root").select(F.col("id").alias("doc_id"))
        )
    # materialize the (tiny) drop set, then free the pair cache and the
    # cluster resolution's final checkpoint — nothing downstream re-reads
    # either (drops' own eager checkpoint is the only surviving copy)
    drops = drops.distinct().localCheckpoint()
    pairs.unpersist()
    if clusters is not None:
        free_local_checkpoints(clusters)
    drops = drops.withColumn("_nd", F.lit(True))
    updated = (
        verdicts.join(drops, "doc_id", "left")
        .withColumn(
            "keep", F.when(F.col("_nd"), F.lit(False)).otherwise(F.col("keep"))
        )
        .withColumn(
            "excl_type",
            F.when(F.col("_nd"), F.lit("near_dup")).otherwise(F.col("excl_type")),
        )
        .drop("_nd")
        .select(*verdicts.columns)
    )
    survivors_idx = new_idx.join(
        drops.select(F.col("doc_id").alias("id")), "id", "left_anti"
    )
    return updated, survivors_idx, idx_store, bands_store, occupancy


# embedding near-dedup sidecar parameters. Banded SRP: num_bands bucket
# keys per doc, each from a disjoint hyperplane family of num_planes
# planes (similarity.srp_band_table — the minhash band table's shape).
# Candidates share ANY band key, so near-twin recall stays high while
# random collisions per band scale as N/2^planes: a single wide bucket
# key has low recall for near (not exact) twins, a single narrow one
# collides linearly with a steep slope (both measured — BASELINE.md
# "Incremental embedding near-dedup"). Both knobs are configurable per
# store (srp_planes/srp_bands) and persisted in the sidecar's _meta.json:
# band-key equality across batches requires identical values, so the
# persisted config always wins and a conflicting explicit request fails
# loudly (re-bucketing requires wiping the sidecar — reconciliation then
# re-encodes from committed clean_text).
_SRP_ND_PLANES_DEFAULT = 16
_SRP_ND_BANDS_DEFAULT = 8
_SRP_ND_MIN_COS = 0.99
# bucket -> 16 'pX' directory partitions, FIXED cardinality regardless of
# num_planes (mod, not div: div 16 explodes to 2^(planes-4) dirs at high
# planes). Letter prefix: a bare hex digit would partition-type-infer as
# numeric.
_SRP_PFX_EXPR = "concat('p', lower(hex(pmod(bucket, 16))))"


def _srp_meta(
    store_base: Path, planes: int | None, bands: int | None = None
) -> tuple[int, int]:
    """Resolve the sidecar's (num_planes, num_bands): persisted _meta.json
    wins; first use writes it. Explicit values conflicting with the
    persisted config raise (band keys are only comparable at one
    configuration)."""
    meta_path = store_base / "_meta.json"

    def _validate(meta: dict) -> tuple[int, int]:
        p = meta["num_planes"]
        b = meta.get("num_bands", _SRP_ND_BANDS_DEFAULT)
        for name, got, want in (("num_planes", planes, p), ("num_bands", bands, b)):
            if got is not None and got != want:
                raise ValueError(
                    f"srp sidecar at {store_base} was built with {name}="
                    f"{want}; requested {got}. Wipe the sidecar to re-bucket "
                    "(reconciliation re-encodes committed docs)."
                )
        return p, b

    if meta_path.exists():
        return _validate(json.loads(meta_path.read_text()))
    p = planes if planes is not None else _SRP_ND_PLANES_DEFAULT
    b = bands if bands is not None else _SRP_ND_BANDS_DEFAULT
    store_base.mkdir(parents=True, exist_ok=True)
    # link(2) first-writer-wins, mirroring the commit protocol: two
    # concurrent first runs with different configs must not each proceed
    # under their own — the loser re-reads and validates against the winner
    tmp = store_base / f"._meta.{uuid.uuid4().hex[:8]}.json.tmp"
    tmp.write_text(json.dumps({"num_planes": p, "num_bands": b}))
    try:
        os.link(tmp, meta_path)
    except FileExistsError:
        tmp.unlink()
        return _validate(json.loads(meta_path.read_text()))
    tmp.unlink()
    return p, b


def _srp_index_table(kept: DataFrame) -> DataFrame:
    """(id, v) for a set of kept docs: ONE encoder pass
    (models.doc_embedding_udf — Arrow-batched, executor-singleton model).
    Band keys are NOT stored here: they are a pure function of v
    (_srp_bands_table), cached in the srp_bands sidecar and rebuilt by
    projection, never by re-encoding — the minhash band table's contract."""
    from puddin_spark.models import doc_embedding_udf

    return kept.select(
        F.col("doc_id").alias("id"),
        doc_embedding_udf("clean_text").alias("v"),
    )


def _srp_bands_table(idx: DataFrame, num_planes: int, num_bands: int) -> DataFrame:
    """(id, band, bucket, bucket_pfx) derived from an (id, v) index — one
    Arrow-batched numpy matmul per batch (srp_band_buckets_udf; the SQL
    formulation evaluates ~bands*planes*dim interpreted lambda steps per
    row and was the measured dominant ingest cost). Still a pure
    projection of the index: rebuildable without re-encoding. bucket_pfx
    is the directory-partition column of the committed layout."""
    from puddin_spark.operators.similarity import srp_band_buckets_udf

    buckets = srp_band_buckets_udf(num_planes, num_bands)
    return (
        idx.select("id", F.posexplode(buckets("v")).alias("band", "bucket"))
        .withColumn("bucket_pfx", F.expr(_SRP_PFX_EXPR))
    )


def _apply_embedding_near_dedup(
    spark, store, verdicts, committed, planes=None, bands=None
):
    """Flip embedding near-dup newcomers to keep=false /
    excl_type='emb_near_dup'; return (updated_verdicts, index_of_survivors,
    survivor_bands, srp_store, srp_bands_store, occupancy). Mirrors
    _apply_near_dedup: the same (count, xor-of-ids) reconciliation gate on
    the index, a row-count gate on the derived band cache, band-prefix
    partition pruning for the committed-side scan, and the commit ordering
    in run_resumable_pipeline's docstring. (planes, bands) resolve against
    the sidecar's persisted _meta.json (_srp_meta).

    The vs-COMMITTED flip runs through committed_srp_flip_ids (per-bucket
    numpy cosine blocks, first-hit early exit, no pair-row
    materialization — flip-set-identical to full enumeration); full pair
    enumeration remains only where cluster resolution genuinely needs it:
    new-vs-new. `occupancy` is the top-K
    hottest (band, bucket) telemetry for this batch (new + pruned
    committed membership) — committed as the srp_bands snapshot's lineage
    so uncapped-bucket growth is observable per batch."""
    from puddin_spark.operators.dedup import (
        free_local_checkpoints,
        resolve_duplicate_clusters,
    )
    from puddin_spark.operators.similarity import (
        band_occupancy,
        committed_srp_flip_ids,
        srp_batch_pairs_matmul,
    )

    srp_store = SnapshotStore(store.base / "srp_index")
    srp_bands_store = SnapshotStore(store.base / "srp_bands")
    num_planes, num_bands = _srp_meta(srp_store.base, planes, bands)
    committed_idx = srp_store.read(spark)
    if committed is None:
        committed_idx = _heal_stale_sidecar(srp_store, committed_idx)
    if committed is not None:
        # index<->corpus reconciliation (same shape as minhash: stale
        # entries pruned, crash-lag entries re-encoded from committed
        # clean_text, landed once as a base commit)
        kept_committed = committed.filter("keep")
        n_kept, fp_kept = _id_set_stats(kept_committed, "doc_id")
        n_idx, fp_idx = (
            _id_set_stats(committed_idx, "id")
            if committed_idx is not None
            else (0, 0)
        )
        if (n_idx, fp_idx) != (n_kept, fp_kept):
            kept_ids = kept_committed.select(F.col("doc_id").alias("id"))
            pruned = (
                committed_idx.join(kept_ids, "id", "left_semi")
                if committed_idx is not None
                else None
            )
            lag = kept_committed.select("doc_id", "clean_text")
            if pruned is not None:
                lag = lag.join(
                    pruned.select(F.col("id").alias("doc_id")), "doc_id", "left_anti"
                )
            lag_idx = _srp_index_table(lag)
            reconciled = (
                lag_idx if pruned is None else pruned.unionByName(lag_idx)
            )
            srp_store.commit(reconciled, base=True)
            committed_idx = srp_store.read(spark)
        if committed_idx is not None and committed_idx.isEmpty():
            committed_idx = None

    committed_bands = None
    if committed_idx is not None:
        # the persisted band table is a pure DERIVED cache of the index
        # (rebuilt by projection, never by re-encoding); a row-count gate
        # detects lag from a crash between the index and bands commits or
        # an index prune above
        committed_bands = srp_bands_store.read(spark)
        n_idx = committed_idx.count()
        n_bands_rows = committed_bands.count() if committed_bands is not None else -1
        if n_bands_rows != n_idx * num_bands:
            srp_bands_store.commit(
                _srp_bands_table(committed_idx, num_planes, num_bands),
                base=True,
                partition_by=["bucket_pfx"],
            )
            committed_bands = srp_bands_store.read(spark)

    kept = verdicts.filter("keep").select("doc_id", "clean_text")
    # localCheckpoint: ONE encoding pass serves band derivation, the pair
    # join, and the survivors commit (blocks freed by the caller once the
    # sidecar commits land)
    new_idx = _srp_index_table(kept).localCheckpoint()
    new_bands = _srp_bands_table(new_idx, num_planes, num_bands).localCheckpoint()
    if committed_bands is not None:
        # static prefix pruning: the committed band table is directory-
        # partitioned by bucket_pfx, so filtering to the BATCH's own
        # prefixes (<=16 values) prunes whole partitions from the scan;
        # incremental_srp_band_pairs then semi-joins exact (band, bucket)
        pfx = [r[0] for r in new_bands.select("bucket_pfx").distinct().collect()]
        committed_bands = committed_bands.filter(F.col("bucket_pfx").isin(pfx))
    occupancy = band_occupancy(new_bands, committed_bands)
    flips = None
    if committed_idx is not None:
        # vs-committed: per-bucket numpy cosine blocks with first-hit early
        # exit — pair rows are never materialized (enumerating every
        # (new, committed) bucket co-member grew per-batch cost linearly
        # with corpus-side occupancy — VERDICT r4, profiled in BASELINE.md)
        flips = committed_srp_flip_ids(
            new_idx, new_bands, committed_idx, committed_bands,
            min_cos=_SRP_ND_MIN_COS,
        )
    # new-vs-new needs the whole edge set (cluster resolution), but not the
    # enumerate-then-join shape: srp_batch_pairs_matmul emits the same pair
    # set from per-bucket numpy blocks (pair-set equality pytest-pinned)
    # without materializing bucket-co-member candidate rows or shuffling
    # two vectors per candidate — measured 2M candidate rows / ~2 GB of
    # shuffled vector payload per 6k-doc batch on the old path
    pairs = srp_batch_pairs_matmul(
        new_idx, new_bands, min_cos=_SRP_ND_MIN_COS
    ).persist()
    drops = (
        flips.select(F.col("new_id").alias("doc_id"))
        if flips is not None
        else kept.select("doc_id").limit(0)
    )
    new_new = pairs.select("id_a", "id_b")
    clusters = None
    if not new_new.isEmpty():
        clusters = resolve_duplicate_clusters(new_new)
        drops = drops.unionByName(
            clusters.filter("id != root").select(F.col("id").alias("doc_id"))
        )
    drops = drops.distinct().localCheckpoint()
    pairs.unpersist()
    if flips is not None:
        free_local_checkpoints(flips)
    if clusters is not None:
        free_local_checkpoints(clusters)
    drops = drops.withColumn("_ed", F.lit(True))
    updated = (
        verdicts.join(drops, "doc_id", "left")
        .withColumn(
            "keep", F.when(F.col("_ed"), F.lit(False)).otherwise(F.col("keep"))
        )
        .withColumn(
            "excl_type",
            F.when(F.col("_ed"), F.lit("emb_near_dup")).otherwise(
                F.col("excl_type")
            ),
        )
        .drop("_ed")
        .select(*verdicts.columns)
    )
    survivors_idx = new_idx.join(
        drops.select(F.col("doc_id").alias("id")), "id", "left_anti"
    )
    survivor_bands = new_bands.join(
        drops.select(F.col("doc_id").alias("id")), "id", "left_anti"
    )
    return (
        updated, survivors_idx, survivor_bands, srp_store, srp_bands_store,
        occupancy,
    )
