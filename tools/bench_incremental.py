#!/usr/bin/env python
"""Incremental near-dedup ingest cost vs full-corpus recompute.

The 10^12-doc claim for run_resumable_pipeline(near_dedup=True) is that
per-batch cost tracks the BATCH, not the corpus: the committed side is a
persisted signature index plus a band table partitioned by band-key prefix,
so an ingest never re-shingles or re-pairs committed documents and its band
scan prunes to the batch's own prefixes. This script measures exactly that:
time to near-dedup a fixed 1,000-doc batch against committed corpora of
growing size, via (a) the incremental path over the persisted index
(index build untimed — it was paid when those docs were ingested) and
(b) a full minhash_lsh_pairs recompute over committed+batch.

Prints one JSON line. Results recorded in BASELINE.md ('Incremental
near-dedup scaling'). Run standalone — never concurrently with bench.py.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from puddin_spark.operators.dedup import (  # noqa: E402
    band_table,
    incremental_minhash_pairs,
    minhash_index,
    minhash_lsh_pairs,
)
from puddin_spark.session import get_spark  # noqa: E402
from puddin_spark.synth import SPARK_SCHEMA_DDL, gen_rows  # noqa: E402

# production hash family (xxhash64): this is a PERFORMANCE measurement of
# the at-scale path, not an oracle gate, so the 1.5-1.7x cheaper JVM hash is
# the honest choice for both sides of the comparison
IDX_KW = dict(num_hashes=16, shingle_k=3, shingle_mode="word", hash_impl="xxhash64")
BAND_KW = dict(num_hashes=16, band_size=2, hash_impl="xxhash64")
BATCH = 1_000
COMMITTED_SIZES = (8_000, 32_000)
# the synthetic corpus is extremely near-dup-dense (template prose: ~90k
# verified pairs per 9k docs), which makes UNCAPPED pair generation
# quadratic in cluster size — exactly the degeneracy the hot-bucket guard
# exists for. Both paths run with the same production cap, so the
# comparison stays apples-to-apples.
MAX_BUCKET = 64


def pages(spark, start: int, end: int, parts: int = 16):
    def gen(batches):
        for pdf in batches:
            if len(pdf):
                yield gen_rows(int(pdf["id"].min()), int(pdf["id"].max()) + 1)

    return spark.range(start, end, 1, parts).mapInPandas(gen, schema=SPARK_SCHEMA_DDL)


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = get_spark(
        master=f"local[{cpus}]", app_name="bench_incremental", shuffle_partitions=64
    )
    tmp = tempfile.mkdtemp(prefix="inc_bench_")
    out: dict = {"metric": "incremental_vs_full_neardedup", "batch": BATCH}
    try:
        for n_committed in COMMITTED_SIZES:
            committed = pages(spark, 0, n_committed)
            batch = pages(spark, n_committed, n_committed + BATCH)
            idx_dir = f"{tmp}/idx_{n_committed}"
            bands_dir = f"{tmp}/bands_{n_committed}"
            # committed index + band table: built ONCE when those docs were
            # ingested — untimed here, exactly like the snapshot sidecars
            minhash_index(committed, "url", "text", **IDX_KW).write.mode(
                "overwrite"
            ).parquet(idx_dir)
            band_table(spark.read.parquet(idx_dir), **BAND_KW).write.mode(
                "overwrite"
            ).partitionBy("band_pfx").parquet(bands_dir)
            batch.count()  # warm Python workers before timing

            t0 = time.perf_counter()
            ni = minhash_index(batch, "url", "text", **IDX_KW).localCheckpoint()
            nb = band_table(ni, **BAND_KW)
            pfx = [r[0] for r in nb.select("band_pfx").distinct().collect()]
            cb = spark.read.parquet(bands_dir).filter(F.col("band_pfx").isin(pfx))
            n_inc = incremental_minhash_pairs(
                ni,
                spark.read.parquet(idx_dir),
                band_size=BAND_KW["band_size"],
                jaccard_threshold=0.5,
                hash_impl="xxhash64",
                max_bucket=MAX_BUCKET,
                new_bands=nb,
                committed_bands=cb,
            ).count()
            t_inc = time.perf_counter() - t0

            t0 = time.perf_counter()
            n_full = minhash_lsh_pairs(
                committed.unionByName(batch),
                "url",
                "text",
                num_hashes=IDX_KW["num_hashes"],
                band_size=BAND_KW["band_size"],
                shingle_k=IDX_KW["shingle_k"],
                jaccard_threshold=0.5,
                shingle_mode="word",
                hash_impl="xxhash64",
                max_bucket=MAX_BUCKET,
            ).count()
            t_full = time.perf_counter() - t0
            out[str(n_committed)] = {
                # incremental pair set excludes committed-vs-committed pairs
                # BY DESIGN (that work was done at their ingest), so counts
                # are reported, not compared
                "incremental_s": round(t_inc, 2),
                "incremental_pairs": n_inc,
                "full_s": round(t_full, 2),
                "full_pairs": n_full,
                "speedup": round(t_full / t_inc, 2),
            }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
