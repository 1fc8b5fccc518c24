"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct alongside. Decode / feature-extraction runs as
Arrow-batched ``mapInPandas`` (the only sanctioned Python hot path —
vectorized, ~batch-at-a-time). The actual codec step is STUBBED
deterministically because media libraries aren't in this container; the
Spark-side contract — schema, batch iteration, partitioning — is real and
tested, and a real decoder drops into ``_decode_batch`` unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

#: Output schema of the decode/feature step.
MEDIA_FEATURES_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media_type", StringType()),
    StructField("byte_size", IntegerType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("checksum", StringType()),
])


def attach_fake_media(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Synthesize an opaque binary payload column (deterministic: the UTF-8
    bytes of the text) plus a media_type tag — stands in for real image
    bytes so the binary-column path is exercised end-to-end."""
    mt = F.element_at(
        F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").cast(BinaryType()).alias("payload"),
        mt.alias("media_type"),
    )


def _decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """STUB decoder: real implementation would call PIL/av/soundfile here.

    Produces deterministic fake dimensions from the payload length so
    results are testable. Raises NotImplementedError only for media types
    the stub doesn't model — mirroring how a real decoder signals
    unsupported codecs.
    """
    import hashlib

    known = {"image/png", "audio/wav", "video/mp4"}
    bad = set(pdf["media_type"]) - known
    if bad:
        raise NotImplementedError(f"no decoder for media types: {sorted(bad)}")
    sizes = pdf["payload"].map(len)
    return pd.DataFrame({
        "doc_id": pdf["doc_id"],
        "media_type": pdf["media_type"],
        "byte_size": sizes.astype("int32"),
        "width": (sizes % 640 + 1).astype("int32"),
        "height": (sizes % 480 + 1).astype("int32"),
        "checksum": pdf["payload"].map(lambda b: hashlib.md5(b).hexdigest()),
    })


def extract_media_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Arrow-batched decode/feature extraction over the binary column.

    ``mapInPandas`` keeps whole batches in Arrow memory — payload bytes are
    never row-pickled. At scale, repartition upstream by size so decode
    tasks are balanced (media payloads are heavily skewed)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _decode_batch(pdf)

    return media.mapInPandas(gen, schema=MEDIA_FEATURES_SCHEMA)
