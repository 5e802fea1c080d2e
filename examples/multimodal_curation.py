#!/usr/bin/env python
"""Runnable example: multimodal training-data curation end to end.

    python examples/multimodal_curation.py [sf_dir]

binary tables → real decode (image headers + pixels, WAV PCM, AVI
containers) → metadata quality cuts → perceptual near-dup clustering →
canonical keep-best selection → incremental second-day increment →
frame-sampling plan for the survivors. The image/audio/video analogue
of examples/corpus_cleaning.py: every stage is a shuffle-light decode
pass or a banded signature join — payload bytes never leave their
executor, and nothing collects to the driver.

The corpora are planted from the documents table (the same
deterministic construction the certified q_dedup_image_*,
q_audio_features and q_video_meta queries use), so the example runs
hermetically at any sf_dir.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

from etl_demos_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("multimodal-curation")
    spark.sparkContext.setLogLevel("ERROR")

    from etl_demos_spark.operators import multimodal
    from etl_demos_spark.operators.image_dedup import (
        dedup_by_image_hash,
        incremental_image_dedup,
        image_signatures,
    )
    from etl_demos_spark.workload_ext import (
        _planted_audio_corpus,
        _planted_image_corpus,
        _planted_video_corpus,
    )

    # --- images: decode → quality cut → perceptual dedup ----------------
    imgs = _planted_image_corpus(spark, sf_dir)
    n0 = imgs.count()

    # metadata pass: real header decode; prune undecodable/degenerate
    # shapes BEFORE the (more expensive) hash pass
    meta = multimodal.extract_image_meta(imgs)
    good_ids = meta.filter(
        (F.col("width") >= 4) & (F.col("height") >= 4) & (F.col("n_bytes") > 0)
    ).select("id")
    imgs = imgs.join(good_ids, "id")
    n1 = imgs.count()
    print(f"images: {n0} -> {n1} after metadata quality cut")

    # perceptual dedup: dHash pairs -> connected components -> keep the
    # highest-resolution member of each near-dup cluster
    survivors = dedup_by_image_hash(
        imgs.join(meta.select("id", "n_bytes"), "id"),
        "dhash",
        max_hamming=4,
        prefer=F.col("n_bytes"),
    ).drop("n_bytes")
    n2 = survivors.count()
    print(f"images: {n1} -> {n2} after perceptual near-dup clustering")

    # day-2 increment: probe ONLY signatures of the existing corpus —
    # no re-decode of day-1 payloads
    store = image_signatures(survivors, "dhash").localCheckpoint()
    day2 = imgs.select((F.col("id") + 5_000_000).alias("id"), "content")
    kept2, store2 = incremental_image_dedup(day2, store, "dhash", max_hamming=0)
    print(
        f"day-2 increment: {day2.count()} images -> "
        f"{kept2.count()} genuinely new (exact-signature probe)"
    )

    # --- audio: real WAV decode → loudness/duration cuts -----------------
    wavs = _planted_audio_corpus(spark, sf_dir)
    feats = multimodal.audio_features(wavs)
    ok_audio = feats.filter((F.col("duration_ms") >= 0) & (F.col("rms") > 0.0))
    print(f"audio: {feats.count()} decoded, {ok_audio.count()} pass the rms/duration cut")
    ok_audio.groupBy("bits", "channels", "sample_rate").agg(
        F.count("*").alias("n"),
        F.round(F.avg("rms"), 2).alias("avg_rms"),
    ).orderBy("bits").show()

    # --- video: container walk → frame-sampling plan ---------------------
    vids = _planted_video_corpus(spark, sf_dir)
    vmeta = multimodal.video_meta(vids)
    # sample every 2nd frame of containers whose census agrees with the
    # declared header (a mismatch means a truncated/corrupt file)
    consistent = vmeta.filter(F.col("movi_frames") == F.col("total_frames"))
    plan = consistent.select(
        "id",
        F.explode(
            F.sequence(F.lit(0), F.col("total_frames") - 1, F.lit(2))
        ).alias("frame_idx"),
    )
    print(
        f"video: {vmeta.count()} containers parsed, "
        f"{consistent.count()} census-consistent, "
        f"{plan.count()} frames in the sampling plan"
    )

    # --- video dedup: per-frame perceptual + exact container fallback ----
    from etl_demos_spark.operators.video_dedup import (
        dedup_videos,
        incremental_video_dedup,
    )
    from etl_demos_spark.workload_ext import _planted_video_dedup_corpus

    dvids = _planted_video_dedup_corpus(spark, sf_dir, "perceptual")
    nv0 = dvids.count()
    vkept = dedup_videos(dvids, "dhash", max_hamming=4)
    nv1 = vkept.count()
    print(f"video dedup: {nv0} -> {nv1} after per-frame perceptual clustering")

    # day-2 video increment: exact container fingerprints only — prior
    # payloads never re-walked
    _, vstore = incremental_video_dedup(vkept, None)
    day2v = vkept.limit(50).select((F.col("id") + 9_000_000).alias("id"), "content")
    vkept2, _ = incremental_video_dedup(day2v, vstore.localCheckpoint())
    print(
        f"day-2 video increment: {day2v.count()} containers -> "
        f"{vkept2.count()} genuinely new (exact-fingerprint probe)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
