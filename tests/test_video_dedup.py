"""Video dedup family (operators/video_dedup.py): AVI frame-payload
extraction, per-frame perceptual signatures, the frame-aligned Hamming
join, and the exact container fingerprint fallback."""

from __future__ import annotations

import hashlib
import struct

import pytest

from etl_demos_spark.operators.multimodal import avi_frame_payloads


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _avi(frames: list[bytes], extra_chunk: bool = False) -> bytes:
    avih = struct.pack(
        "<14I", 33333, 0, 0, 0, len(frames), 0, 1, 0, 0, 0, 0, 0, 0, 0
    )
    movi_body = b"movi"
    for i, f in enumerate(frames):
        if extra_chunk and i == 1:  # walkers must skip non-frame chunks
            movi_body += _chunk(b"ix00", b"indexdata")
        movi_body += _chunk(b"00db", f)
    payload = (
        b"AVI "
        + _chunk(b"LIST", b"hdrl" + _chunk(b"avih", avih))
        + _chunk(b"LIST", movi_body)
    )
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def _pgm(w: int, raster: bytes) -> bytes:
    return f"P5\n{w} 8\n255\n".encode() + raster


def test_avi_frame_payloads_ordered_and_word_aligned():
    # odd-length frames force pad bytes; order and bytes must survive
    frames = [b"abc", b"defgh", b"\x00\x01\x02\x03"]
    assert avi_frame_payloads(_avi(frames)) == frames


def test_avi_frame_payloads_skips_non_frame_chunks():
    frames = [b"aaaa", b"bbbb"]
    assert avi_frame_payloads(_avi(frames, extra_chunk=True)) == frames


def test_avi_frame_payloads_rejects_non_avi_and_truncated():
    with pytest.raises(ValueError, match="AVI"):
        avi_frame_payloads(b"RIFF\x04\x00\x00\x00WAVE")
    buf = _avi([b"abcdef"])
    with pytest.raises(ValueError, match="truncated"):
        avi_frame_payloads(buf[:-3])


def test_video_frame_signatures_matches_image_dhash(spark):
    """Per-frame dHash must equal dHash of the same image standalone."""
    from etl_demos_spark.operators.image_dedup import dhash_int
    from etl_demos_spark.operators.multimodal import decode_image
    from etl_demos_spark.operators.video_dedup import video_frame_signatures

    rasters = [bytes((i * 37 + j * 11) % 256 for j in range(6 * 8)) for i in range(3)]
    frames = [_pgm(6, r) for r in rasters]
    df = spark.createDataFrame([(1, _avi(frames))], "id long, content binary")
    rows = {
        r["frame_idx"]: r
        for r in video_frame_signatures(df).collect()
    }
    assert len(rows) == 3
    for i, f in enumerate(frames):
        _, _, _, px = decode_image(f)
        assert rows[i]["sig"] == dhash_int(px)
        assert rows[i]["n_frames"] == 3


def test_video_near_dup_pairs_all_frames_gate(spark):
    """A mutated single frame within radius pairs; a video differing in
    frame COUNT (or any frame outside the ball) must not pair."""
    from etl_demos_spark.operators.video_dedup import video_near_dup_pairs

    base = [bytes((i * 13 + j) % 256 for j in range(8 * 8)) for i in range(2)]
    # near-dup: max out one byte of frame 0 (flips the (0,0)>(0,1)
    # gradient comparison — a real but small signature move)
    mut0 = b"\xff" + base[0][1:]
    # far: replace frame 1 with its bitwise complement (hamming large)
    far1 = bytes(255 - b for b in base[1])
    vids = [
        (1, _avi([_pgm(8, r) for r in base])),
        (2, _avi([_pgm(8, mut0), _pgm(8, base[1])])),
        (3, _avi([_pgm(8, r) for r in base] + [_pgm(8, base[0])])),  # 3 frames
        (4, _avi([_pgm(8, base[0]), _pgm(8, far1)])),
    ]
    df = spark.createDataFrame(vids, "id long, content binary")
    pairs = {
        (r["id_a"], r["id_b"]): r
        for r in video_near_dup_pairs(df, max_hamming=4).collect()
    }
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)]["n_frames"] == 2
    assert 0 < pairs[(1, 2)]["total_hamming"] <= 4


def test_video_exact_fingerprint_is_order_sensitive(spark):
    from etl_demos_spark.operators.video_dedup import (
        video_exact_dup_pairs,
        video_exact_fingerprints,
    )

    f1, f2 = b"frame-one-payload", b"frame-two-payload"
    vids = [
        (1, _avi([f1, f2])),
        (2, _avi([f1, f2])),  # exact dup of 1
        (3, _avi([f2, f1])),  # same frames, re-cut: NOT a dup
    ]
    df = spark.createDataFrame(vids, "id long, content binary")
    fps = {r["id"]: r["fp"] for r in video_exact_fingerprints(df).collect()}
    want = hashlib.sha256(
        (hashlib.sha256(f1).hexdigest() + hashlib.sha256(f2).hexdigest()).encode()
    ).hexdigest()
    assert fps[1] == fps[2] == want
    assert fps[3] != fps[1]
    pairs = [
        (r["id_a"], r["id_b"]) for r in video_exact_dup_pairs(df).collect()
    ]
    assert pairs == [(1, 2)]


def test_dedup_videos_keeps_one_per_cluster(spark):
    from etl_demos_spark.operators.video_dedup import dedup_videos

    base = [bytes((i * 29 + j * 3) % 256 for j in range(8 * 8)) for i in range(2)]
    mut = bytes([base[0][0] ^ 1]) + base[0][1:]
    vids = [
        (1, _avi([_pgm(8, r) for r in base])),
        (2, _avi([_pgm(8, mut), _pgm(8, base[1])])),
        (9, _avi([_pgm(8, bytes(255 - b for b in base[0])),
                  _pgm(8, bytes(255 - b for b in base[1]))])),
    ]
    df = spark.createDataFrame(vids, "id long, content binary")
    kept = sorted(r["id"] for r in dedup_videos(df, max_hamming=4).collect())
    assert kept == [1, 9]
