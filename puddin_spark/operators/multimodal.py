"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The decode libraries (Pillow, ffmpeg, torchaudio, ...) are NOT in this
container, so the actual pixel/sample decoding is stubbed behind
`NotImplementedError` (decode_image_real) with a deterministic fake
(decode_stub) that exercises the REAL Spark plumbing: binary column in,
struct-of-metadata out, bounded Arrow batches, per-executor worker reuse.
Swap `_DECODER` for a real function on a cluster with the libs installed —
the schema, partitioning and batch shape don't change.
"""
from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, sha256 string, fake_width int, fake_height int"
)


def decode_image_real(data: bytes) -> dict:
    """Real decode path — requires an image library not present here."""
    raise NotImplementedError(
        "image decoding requires Pillow/libvips; install on the cluster and "
        "swap _DECODER = decode_image_real"
    )


def decode_stub(data: bytes) -> dict:
    """Deterministic fake decode: metadata derivable from the bytes alone
    (so a SQL oracle can verify the plumbing end-to-end)."""
    n = len(data)
    return {
        "n_bytes": n,
        "sha256": hashlib.sha256(data).hexdigest(),
        "fake_width": n % 640,
        "fake_height": n % 480,
    }


_DECODER = decode_stub


def extract_media_meta(
    df: DataFrame, id_col: str = "doc_id", bin_col: str = "media"
) -> DataFrame:
    """binary column -> typed metadata via mapInPandas (iterator form: one
    worker init per partition, Arrow batch streaming, no driver collect)."""
    cols = df.select(F.col(id_col).alias("doc_id"), F.col(bin_col).alias("media"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decoder = _DECODER  # per-executor binding (model-singleton pattern)
        for pdf in batches:
            metas = [
                decoder(bytes(b)) if b is not None else
                {"n_bytes": 0, "sha256": None, "fake_width": 0, "fake_height": 0}
                for b in pdf["media"]
            ]
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return cols.mapInPandas(run, schema=META_SCHEMA)
