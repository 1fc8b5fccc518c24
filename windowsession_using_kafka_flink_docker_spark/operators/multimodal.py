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

#: Output schema of the resize step: same payload contract, new dims.
RESIZED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("media_type", StringType()),
    StructField("payload", BinaryType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
])

#: Output schema of frame sampling: one row per sampled frame (1→N).
FRAMES_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_index", IntegerType()),
    StructField("frame", BinaryType()),
    StructField("checksum", StringType()),
])


def resize_images(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Resize stub over the binary column (real impl: PIL thumbnail in
    place of the deterministic byte-fold). Same mapInPandas contract as
    decode — payload in, payload out, Arrow-batched."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            # STUB: "resize" = truncate/right-pad payload to width*height/64
            # bytes, deterministic stand-in for a real resampler.
            target = max(1, width * height // 64)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "payload": pdf["payload"].map(
                    lambda b: bytes(b[:target]).ljust(target, b"\0")),
                "width": pd.Series([width] * len(pdf), dtype="int32"),
                "height": pd.Series([height] * len(pdf), dtype="int32"),
            })

    return media.mapInPandas(gen, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling stub: one input video row fans out to ``n_frames``
    output rows (the 1→N batch shape a real av-decode would produce).
    Frames are deterministic payload slices; a real decoder replaces the
    slicing, the Spark-side contract is unchanged."""
    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vids = pdf[pdf["media_type"] == "video/mp4"]
            if not len(vids):
                continue
            out = {"doc_id": [], "frame_index": [], "frame": [], "checksum": []}
            for _, row in vids.iterrows():
                payload = bytes(row["payload"]) or b"\0"
                step = max(1, len(payload) // n_frames)
                for i in range(n_frames):
                    frame = payload[i * step:(i + 1) * step] or b"\0"
                    out["doc_id"].append(row["doc_id"])
                    out["frame_index"].append(i)
                    out["frame"].append(frame)
                    out["checksum"].append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame({
                "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                "frame_index": pd.Series(out["frame_index"], dtype="int32"),
                "frame": out["frame"],
                "checksum": out["checksum"],
            })

    return media.mapInPandas(gen, schema=FRAMES_SCHEMA)
