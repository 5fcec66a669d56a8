"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: store the raw payload as a
``binary`` column next to typed metadata, and run decode / feature-extract
as Arrow-batched Pandas functions over ``mapInPandas`` — the payload never
round-trips through Python row objects, batches stream through Arrow, and
the transform is map-only (zero shuffles).

The decode step itself is STUBBED deterministically (this container has no
image/audio codecs): ``fake_decode_features`` derives "width/height/
channels" and a checksum feature purely from the bytes, so the Spark-side
plumbing — schema, batch shape, UDF signature, partitioning — is real and
oracle-checkable, while a production deployment swaps one function body
for PIL/ffmpeg.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StructField,
    StructType,
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("channels", LongType()),
        StructField("checksum", LongType()),
    ]
)


def to_binary_payloads(documents: DataFrame) -> DataFrame:
    """Model the documents table as a multimodal table: the utf-8 bytes of
    ``text`` stand in for an opaque media payload."""
    from ..functions import ensure_parallelism

    return ensure_parallelism(documents).select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").cast(BinaryType()).alias("payload"),
        F.lit("application/octet-stream").alias("content_type"),
    )


def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: per Arrow batch, 'decode' each payload.

    Deterministic fake decode (REAL DECODE STUBBED — no codec libs in this
    container): dimensions and a Knuth-hash checksum derived from payload
    length only, so an external oracle can reproduce them. Swap this body
    for PIL/librosa/ffmpeg in production; the signature and batch shape are
    exactly what a real decoder uses.
    """
    for pdf in batches:
        payloads = pdf["payload"]
        n_bytes = payloads.map(len).astype("int64")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes,
                "width": (n_bytes % 64 + 1).astype("int64"),
                "height": (n_bytes // 64 % 64 + 1).astype("int64"),
                "channels": pd.Series([3] * len(pdf), index=pdf.index, dtype="int64"),
                "checksum": (n_bytes * 2654435761) % (2**31),
            }
        )


def decode_features(documents: DataFrame) -> DataFrame:
    """Binary payload → decoded feature table via Arrow-batched mapInPandas."""
    return to_binary_payloads(documents).mapInPandas(decode_batch, DECODED_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("out_width", LongType()),
        StructField("out_height", LongType()),
        StructField("resized", BinaryType()),
    ]
)


def resize_payloads(documents: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """'Resize' every payload to ``out_w×out_h`` via nearest-neighbor
    index resampling over the byte grid.

    The grid dims come from the same stub decode as ``decode_batch``
    (REAL IMAGE DECODE STUBBED — no codec libs here; production swaps the
    grid construction for PIL), but the resample itself is real numpy
    index arithmetic on the actual payload bytes — the batch shape,
    vectorized kernel and output schema are exactly a thumbnailing
    pipeline's. Map-only: zero shuffles at any corpus size.
    """
    import numpy as np

    def resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, outs = [], [], [], []
            for r in pdf.itertuples(index=False):
                buf = np.frombuffer(bytes(r.payload), dtype=np.uint8)
                n = len(buf)
                if n == 0:
                    out = b""
                else:
                    # stub grid dims in the spirit of decode_batch, clamped
                    # so w*h <= n always holds (w <= n implies h = n//w >= 1)
                    w = min(n, n % 64 + 1)
                    h = n // w
                    grid = buf[: w * h].reshape(h, w)
                    yi = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
                    xi = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
                    out = grid[np.ix_(yi, xi)].tobytes()
                ids.append(r.doc_id)
                ws.append(out_w)
                hs.append(out_h)
                outs.append(out)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "out_width": pd.Series(ws, dtype="int64"),
                    "out_height": pd.Series(hs, dtype="int64"),
                    "resized": outs,
                }
            )

    return to_binary_payloads(documents).mapInPandas(resize_batch, RESIZED_SCHEMA)


FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_id", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(
    documents: DataFrame, frame_size: int = 256, every_n: int = 4
) -> DataFrame:
    """Frame sampling: treat each payload as a sequence of fixed-size
    frames and keep every ``every_n``-th one — one output row per kept
    frame.

    The byte slicing is fully real (a video container parser would
    replace the fixed-stride split); the 1→many explode inside
    ``mapInPandas`` is the exact shape of real frame extraction: map-only,
    output volume ∝ kept frames, nothing buffered beyond one Arrow batch.
    """

    def frames_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fids, frames = [], [], []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload)
                n_frames = (len(payload) + frame_size - 1) // frame_size
                for fid in range(0, n_frames, every_n):
                    ids.append(r.doc_id)
                    fids.append(fid)
                    frames.append(payload[fid * frame_size : (fid + 1) * frame_size])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_id": pd.Series(fids, dtype="int64"),
                    "frame": frames,
                }
            )

    return to_binary_payloads(documents).mapInPandas(frames_batch, FRAMES_SCHEMA)
