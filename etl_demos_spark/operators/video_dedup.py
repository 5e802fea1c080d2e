"""Video dedup: per-frame signatures over AVI containers + the shared
Hamming-banded join — closing the dedup matrix (text / embeddings /
images / audio / video).

Two signature regimes, matching the codec boundary:

- **Perceptual (decodable frames)**: where a frame payload decodes with
  the in-repo image codecs (netpbm/BMP/PNG-subset — e.g. ``00db``
  uncompressed DIB-style frames), sign each frame with dHash/pHash
  (operators/image_dedup.py — exact-integer, oracle-expressible) and
  call two videos near-duplicates when they have the SAME frame count
  and EVERY aligned frame is within a per-frame Hamming radius. The
  candidate join is the signature-agnostic pigeonhole chunk join
  (operators/dedup.py hamming_chunk_keys) with the equi-join key
  extended by ``frame_idx`` — banded per (frame, chunk, val) bucket,
  complete within the ball, never all-pairs.

- **Exact (opaque codec payloads)**: compressed frame payloads
  (MJPEG etc.) stay the declared external-codec boundary, so the
  container-level fallback signs each frame with SHA-256 and
  fingerprints the video as the SHA-256 of the ordered frame-digest
  concatenation. Exact-dup pairs are then a fingerprint equi-join —
  hash-bucketed, no global sort, the exact-dedup shape at the
  container granularity.

Scale shape: frame extraction + signing is ONE mapInPandas pass per
video payload (frames of a video live inside its row — no shuffle to
align them); only (id, frame_idx, sig) rows ever leave the decode
stage, payload bytes stay on the executor. Pair generation cost is
bounded by bucket collisions (∝ n²/2^chunk_bits per frame slot), the
same envelope measured for the image family
(perf/ab_hamming_radius_r10.json).

No analogue in the reference repo (rytakahas/etl-demos) — part of the
LLM-training-data extension surface (multimodal curation).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from etl_demos_spark.operators.dedup import (
    hamming64,
    hamming_chunk_keys,
)
from etl_demos_spark.operators.image_dedup import (
    DHASH_BITS,
    PHASH_BITS,
)
from etl_demos_spark.operators.matutil import materialize_reused
from etl_demos_spark.operators.multimodal import avi_frame_payloads, decode_image


def video_frame_signatures(
    df: DataFrame,
    algo: str = "dhash",
    id_col: str = "id",
    content_col: str = "content",
    frame_stride: int = 1,
) -> DataFrame:
    """Per-frame perceptual signatures: walk each AVI's movi run,
    decode every VIDEO frame payload (##dc/##db — ##wb audio chunks of
    a muxed A/V container are stream-separated out, never fed to the
    image decoder) with the in-repo image codecs, hash with
    dHash/pHash. One Arrow-batch mapInPandas pass — no shuffle,
    payload bytes never leave the executor. Output
    ``(id, frame_idx, n_frames, sig)``; a non-decodable video frame
    payload raises (use :func:`video_exact_fingerprints` for opaque
    codecs).

    ``frame_stride`` is the LONG-VIDEO scale knob: sign only every
    k-th video frame (container order). At thousand-frame production
    containers, signing every frame makes decode cost ∝ total frames;
    a stride bounds it at frames/k while keeping alignment exact —
    ``frame_idx`` stays the ORIGINAL container index, so two
    equal-length videos signed at the same stride compare the same
    sampled positions, and ``n_frames`` becomes the SAMPLED count so
    the all-frames pair gate stays consistent. Stride 1 ≡ sign
    everything (the certified default)."""
    if algo not in ("dhash", "phash"):
        raise ValueError(f"unknown perceptual hash {algo!r}: dhash|phash")
    if frame_stride < 1:
        raise ValueError(f"frame_stride must be >= 1, got {frame_stride}")
    from etl_demos_spark.operators.image_dedup import (
        GRID_H,
        GRID_W,
        _dhash_batch,
        _phash_batch,
        _sampled_gray_grids,
    )

    dhash = algo == "dhash"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, counts, pxs = [], [], [], []
            for id_, content in zip(pdf[id_col], pdf[content_col]):
                frames = avi_frame_payloads(
                    bytes(content), kinds=(b"dc", b"db")
                )
                sampled = list(range(0, len(frames), frame_stride))
                for i in sampled:
                    _, _, _, px = decode_image(frames[i])
                    ids.append(int(id_))
                    idxs.append(i)
                    counts.append(len(sampled))
                    pxs.append(px)
            if not pxs:
                continue
            # one batched hash pass over every decoded frame in the
            # Arrow batch (the image_signatures r12 shape — pinned
            # bit-identical to the scalar dhash_int/phash_int)
            grids = _sampled_gray_grids(
                pxs, GRID_H, (GRID_W + 1) if dhash else 8
            )
            sigs = _dhash_batch(grids) if dhash else _phash_batch(grids)
            yield pd.DataFrame(
                {
                    "id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "n_frames": pd.array(counts, dtype="int32"),
                    "sig": sigs,
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        run, "id long, frame_idx int, n_frames int, sig long"
    )


def video_near_dup_pairs(
    df: DataFrame,
    algo: str = "dhash",
    max_hamming: int = 4,
    id_col: str = "id",
    content_col: str = "content",
    frame_stride: int = 1,
) -> DataFrame:
    """Near-duplicate video pairs: same frame count, every aligned
    frame within ``max_hamming`` perceptual bits. Candidates come from
    the pigeonhole chunk join keyed by (frame_idx, chunk, val) — a
    video pair is only compared where at least one frame collides, and
    since a qualifying pair must match on frame 0 (every frame is
    within the ball, and the chunk cover is complete), the banded join
    loses nothing: recall 1 within the ball, verifiable by a plain
    all-pairs SQL oracle.

    Output ``(id_a, id_b, n_frames, total_hamming)``, each unordered
    pair once — total_hamming = Σ per-frame Hamming distance, 0 for
    bit-identical frame tracks. ``frame_stride`` passes through to the
    signature pass (the long-video scale knob: compare every k-th
    frame; n_frames becomes the sampled count on both sides)."""
    sig_bits = DHASH_BITS if algo == "dhash" else PHASH_BITS
    sigs = video_frame_signatures(
        df, algo, id_col, content_col, frame_stride=frame_stride
    )
    # both chunk-join sides and the frame-count gate reference the
    # decoded signatures: decode once, truncate the plan (the
    # simhash_pairs eager-materialize discipline)
    sigs = materialize_reused(sigs)

    keys = hamming_chunk_keys(
        sigs, sig_bits, max_hamming, extra_cols=("frame_idx", "n_frames")
    )
    right = keys.select(
        F.col("id").alias("id2"),
        F.col("sig").alias("sig2"),
        F.col("n_frames").alias("n_frames2"),
        "frame_idx",
        "chunk",
        "val",
    )
    # per-frame matches within the ball, aligned by frame index; the
    # cheap map-side Hamming filter runs BEFORE the dedup shuffle
    # (the hamming_chunk_pairs ordering, measured r7)
    frame_matches = (
        keys.join(right, ["frame_idx", "chunk", "val"])
        .filter(F.col("id") < F.col("id2"))
        .filter(F.col("n_frames") == F.col("n_frames2"))
        .select(
            F.col("id").alias("id_a"),
            F.col("id2").alias("id_b"),
            "frame_idx",
            "n_frames",
            hamming64(F.col("sig"), F.col("sig2")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b", "frame_idx"])
    )
    # a pair qualifies iff ALL n_frames aligned frames matched
    return (
        frame_matches.groupBy("id_a", "id_b", "n_frames")
        .agg(
            F.count(F.lit(1)).alias("__matched"),
            F.sum("hamming").alias("total_hamming"),
        )
        .filter(F.col("__matched") == F.col("n_frames"))
        .select(
            "id_a",
            "id_b",
            F.col("n_frames").cast("int").alias("n_frames"),
            F.col("total_hamming").cast("int").alias("total_hamming"),
        )
    )


def video_exact_fingerprints(
    df: DataFrame, id_col: str = "id", content_col: str = "content"
) -> DataFrame:
    """Container-level exact fingerprint for opaque-codec videos:
    fp = SHA-256 hex of the ordered concatenation of per-frame SHA-256
    hex digests. Frame ORDER is part of the identity (a re-cut of the
    same frames is not the same video). One mapInPandas pass; output
    ``(id, n_frames, fp)`` — 64 hex chars ship per video, payloads
    never leave the executor."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, counts, fps = [], [], []
            for id_, content in zip(pdf[id_col], pdf[content_col]):
                frames = avi_frame_payloads(bytes(content))
                digest = "".join(
                    hashlib.sha256(p).hexdigest() for p in frames
                )
                ids.append(int(id_))
                counts.append(len(frames))
                fps.append(hashlib.sha256(digest.encode()).hexdigest())
            yield pd.DataFrame(
                {
                    "id": pd.array(ids, dtype="int64"),
                    "n_frames": pd.array(counts, dtype="int32"),
                    "fp": fps,
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        run, "id long, n_frames int, fp string"
    )


def video_exact_dup_pairs(
    df: DataFrame, id_col: str = "id", content_col: str = "content"
) -> DataFrame:
    """Exact container-level duplicate pairs: fingerprint equi-join
    (hash-bucketed on fp — the exact-dedup shape, never all-pairs).
    Output ``(id_a, id_b, n_frames)``, each unordered pair once."""
    fps = materialize_reused(video_exact_fingerprints(df, id_col, content_col))
    right = fps.select(
        F.col("id").alias("id2"), F.col("n_frames").alias("nf2"), "fp"
    )
    return (
        fps.join(right, "fp")
        .filter(F.col("id") < F.col("id2"))
        .select(
            F.col("id").alias("id_a"),
            F.col("id2").alias("id_b"),
            F.col("n_frames").cast("int").alias("n_frames"),
        )
    )


def incremental_video_dedup(
    new_df: DataFrame,
    existing_fps: DataFrame | None,
    id_col: str = "id",
    content_col: str = "content",
) -> tuple[DataFrame, DataFrame]:
    """Dedup a NEW video batch against itself AND a persisted
    fingerprint store — the daily-increment form at the container
    granularity (incremental_image_dedup's shape with the exact
    fingerprint instead of a Hamming ball): prior payloads are never
    re-walked; per increment the work is one fingerprint pass over the
    batch plus an equi-join on 64-hex-char fingerprints (only
    fingerprints ever ship).

    Policy is **first-seen wins**: a new video whose fingerprint is in
    the store is dropped; within the batch, each fingerprint keeps its
    min id. Exact fingerprint equality is TRANSITIVE, so repeated
    application over increments equals one global min-per-fingerprint
    pass — the replay identity the image family certifies at
    max_hamming=0, holding here unconditionally.

    Returns ``(kept_new_ids, updated_fps)``: surviving new ids (one
    column, ``id_col``) and the (id, n_frames, fp) store for the next
    increment (existing ∪ survivors)."""
    fps = materialize_reused(
        video_exact_fingerprints(new_df, id_col, content_col)
    )
    if existing_fps is not None:
        matched = (
            fps.join(existing_fps.select("fp").distinct(), "fp")
            .select("id")
            .distinct()
        )
        fresh = materialize_reused(fps.join(matched, "id", "left_anti"))
    else:
        fresh = fps
    winners = fresh.groupBy("fp").agg(F.min("id").alias("id"))
    kept = fresh.join(winners.select("id"), "id")
    updated = (
        kept.select("id", "n_frames", "fp")
        if existing_fps is None
        else existing_fps.select("id", "n_frames", "fp").unionByName(
            kept.select("id", "n_frames", "fp")
        )
    )
    return kept.select(F.col("id").alias(id_col)), updated


def dedup_videos(
    df: DataFrame,
    algo: str = "dhash",
    max_hamming: int = 4,
    id_col: str = "id",
    content_col: str = "content",
) -> DataFrame:
    """End-to-end perceptual video dedup: near-dup pairs → connected
    components → keep the min-id representative per cluster (the
    dedup_by_image_hash composition at the video granularity)."""
    from etl_demos_spark.operators.embedding_dedup import connected_components

    pairs = video_near_dup_pairs(df, algo, max_hamming, id_col, content_col)
    comps = connected_components(pairs.select("id_a", "id_b", "total_hamming"))
    losers = comps.filter(F.col("node") != F.col("comp")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
