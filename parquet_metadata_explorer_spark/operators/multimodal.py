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
