"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design (the part that matters at 100 TB):
- A multimodal table is ``(id, modality, content binary, meta struct)``.
  Binary payloads ride Parquet byte arrays; metadata is columnar and
  prunable, so scans that only need metadata never touch the bytes.
- Decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` UDFs: one Python worker per partition, zero-copy Arrow
  transfer, batch-shaped (pandas.Series of bytes → pandas.DataFrame).
  Partitioning is preserved; there is no shuffle in the decode path.
- The actual codec calls (PIL/librosa/ffmpeg) are NOT available in this
  environment — they are stubbed behind ``_decode_image_real`` raising
  NotImplementedError, with a deterministic fake used for tests and the
  driver's rows-only checks. The Spark-side plumbing (schemas, batch
  iteration, UDF signatures, partition behavior) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("sha", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mode", StringType()),
    ]
)


def make_binary_table(df: DataFrame, id_col: str, payload_col: str, modality: str) -> DataFrame:
    """Normalize any source into the multimodal layout. ``payload_col`` may
    be string (encoded utf-8 → binary) or already binary."""
    payload = F.col(payload_col)
    if dict(df.dtypes)[payload_col] == "string":
        payload = F.encode(payload, "UTF-8")
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        F.lit(modality).alias("modality"),
        payload.alias("content"),
        F.struct(
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.sha2(payload, 256).alias("sha"),
        ).alias("meta"),
    )


def _decode_image_real(buf: bytes) -> tuple[int, int, str]:
    """Real decoder — requires PIL, absent from this environment."""
    raise NotImplementedError(
        "image codecs not available in this container; use fake=True "
        "(deterministic stub) or install PIL at deployment"
    )


def _decode_image_fake(buf: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in: dimensions derived from the content hash so
    tests exercise the full plumbing with stable outputs."""
    h = hashlib.sha256(buf).digest()
    return (64 + h[0] % 192, 64 + h[1] % 192, "RGB")


def extract_image_meta(df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas decode: Arrow batches in, metadata rows out. The
    pattern scales linearly — each executor decodes its own partitions.
    """
    decode = _decode_image_fake if fake else _decode_image_real

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for id_, content in zip(pdf["id"], pdf["content"]):
                buf = bytes(content)
                w, h, mode = decode(buf)
                rows.append(
                    {
                        "id": int(id_),
                        "n_bytes": len(buf),
                        "sha": hashlib.sha256(buf).hexdigest(),
                        "width": w,
                        "height": h,
                        "mode": mode,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_META_SCHEMA.fields])

    return df.select("id", "content").mapInPandas(run, IMAGE_META_SCHEMA)


def make_video_table(df: DataFrame, id_col: str, payload_col: str, n_frames_col: str) -> DataFrame:
    """Video layout: opaque binary + frame-count metadata (the container
    header would supply n_frames in a real decode; here it's a column)."""
    base = make_binary_table(df, id_col, payload_col, "video")
    frames = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(n_frames_col).cast("int").alias("__nf"),
    )
    return base.join(frames, "id").withColumn(
        "meta",
        F.struct(
            F.col("meta.n_bytes").alias("n_bytes"),
            F.col("meta.sha").alias("sha"),
            F.col("__nf").alias("n_frames"),
        ),
    ).drop("__nf")


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: (id, meta.n_frames) → one row per
    sampled frame index (0, every_n, 2·every_n, … < n_frames), ready for a
    per-frame decode UDF. Pure built-ins (sequence/explode) — expansion
    happens on executors, and the content column is NOT duplicated per
    frame (join back by id only where the decoder actually needs bytes)."""
    return df.select(
        "id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.n_frames") - 1, F.lit(0)),
                F.lit(every_n),
            )
        ).alias("frame_idx"),
    )
