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


def test_muxed_av_container_stream_separation(spark):
    """A muxed A/V container (00dc video + 01wb audio chunks): the
    perceptual path signs ONLY video frames (audio bytes never reach
    the image decoder), while the exact fingerprint covers the whole
    container — the audio track is part of the identity."""
    import struct

    from etl_demos_spark.operators.video_dedup import (
        video_exact_fingerprints,
        video_frame_signatures,
    )

    def chunk(cid, body):
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    raster = bytes((i * 5 + 1) % 256 for i in range(8 * 8))
    vid_frame = b"P5\n8 8\n255\n" + raster
    audio = b"\x00\x01not-an-image"
    avih = struct.pack("<14I", 1, 0, 0, 0, 2, 0, 2, 0, 8, 8, 0, 0, 0, 0)
    movi = (b"movi" + chunk(b"00dc", vid_frame) + chunk(b"01wb", audio)
            + chunk(b"00dc", vid_frame) + chunk(b"01wb", audio))
    body = (b"AVI " + chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
            + chunk(b"LIST", movi))
    muxed = b"RIFF" + struct.pack("<I", len(body)) + body
    video_only_body = (b"AVI " + chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
                       + chunk(b"LIST", b"movi" + chunk(b"00dc", vid_frame)
                               + chunk(b"00dc", vid_frame)))
    video_only = b"RIFF" + struct.pack("<I", len(video_only_body)) + video_only_body

    # payload extraction: default census sees all 4, video-kinds sees 2
    assert len(avi_frame_payloads(muxed)) == 4
    assert avi_frame_payloads(muxed, kinds=(b"dc", b"db")) == [vid_frame, vid_frame]

    df = spark.createDataFrame(
        [(1, muxed), (2, video_only)], "id long, content binary"
    )
    sigs = video_frame_signatures(df).collect()  # must not raise on audio
    per_id = {}
    for r in sigs:
        per_id.setdefault(r["id"], []).append(r["sig"])
    # same video track -> same perceptual signatures, n_frames = 2 both
    assert per_id[1] == per_id[2]
    assert all(r["n_frames"] == 2 for r in sigs)
    # exact fingerprint differs: the audio track is part of identity
    fps = {r["id"]: r["fp"] for r in video_exact_fingerprints(df).collect()}
    assert fps[1] != fps[2]


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


def test_frame_stride_samples_aligned_positions(spark):
    """frame_stride signs every k-th container frame: stride 1 is the
    full pass; stride 2 signs indices 0,2,... with n_frames = sampled
    count, and two videos that agree on the sampled positions pair even
    if an UNSAMPLED frame differs (the documented sampling trade-off)."""
    import pytest

    from etl_demos_spark.operators.video_dedup import (
        video_frame_signatures,
        video_near_dup_pairs,
    )

    base = [bytes((i * 11 + j * 3) % 256 for j in range(8 * 8)) for i in range(4)]
    # differs ONLY at frame 1 (unsampled at stride 2) — and drastically
    far1 = bytes(255 - b for b in base[1])
    v1 = _avi([_pgm(8, r) for r in base])
    v2 = _avi([_pgm(8, base[0]), _pgm(8, far1), _pgm(8, base[2]), _pgm(8, base[3])])
    df = spark.createDataFrame([(1, v1), (2, v2)], "id long, content binary")

    s1 = video_frame_signatures(df, frame_stride=1).collect()
    s2 = video_frame_signatures(df, frame_stride=2).collect()
    assert {r["frame_idx"] for r in s1} == {0, 1, 2, 3}
    assert {r["frame_idx"] for r in s2} == {0, 2}
    assert all(r["n_frames"] == 2 for r in s2)
    # stride-2 signatures equal the full pass at the sampled indices
    full = {(r["id"], r["frame_idx"]): r["sig"] for r in s1}
    for r in s2:
        assert r["sig"] == full[(r["id"], r["frame_idx"])]

    # full compare: frame 1 is far -> no pair; stride 2 skips it -> pair
    assert video_near_dup_pairs(df, max_hamming=4).count() == 0
    pairs = video_near_dup_pairs(df, max_hamming=4, frame_stride=2).collect()
    assert [(r["id_a"], r["id_b"], r["n_frames"]) for r in pairs] == [(1, 2, 2)]

    with pytest.raises(ValueError, match="frame_stride"):
        video_frame_signatures(df, frame_stride=0).collect()


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


def test_incremental_video_dedup_matches_sequential_reference(spark):
    """Three increments against a growing store must equal a sequential
    one-at-a-time first-seen-wins replay (exact fingerprints are
    transitive, so the identity holds unconditionally)."""
    from etl_demos_spark.operators.video_dedup import incremental_video_dedup

    def vid(seed):
        return _avi([bytes([seed + j]) * 8 for j in range(3)])

    batches = [
        [(0, vid(1)), (1, vid(2))],
        [(10, vid(1)), (11, vid(3)), (12, vid(3))],  # 10 dup of 0; 12 of 11
        [(20, vid(2)), (21, vid(4))],
    ]
    store = None
    kept_all = []
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "id long, content binary")
        kept, store = incremental_video_dedup(df, store)
        kept_all += [r["id"] for r in kept.collect()]

    # sequential python reference
    seen, want = {}, []
    for rows in batches:
        for id_, buf in rows:
            frames = tuple(avi_frame_payloads(buf))
            if frames not in seen:
                seen[frames] = id_
                want.append(id_)
    assert sorted(kept_all) == sorted(want) == [0, 1, 11, 21]
    assert {r["id"] for r in store.collect()} == set(want)


def test_video_dedup_processor_across_batches_and_replay(spark, tmp_path):
    """Streaming twin: survivors across two micro-batches equal the
    first-seen-wins replay, and a full replay of a completed batch_id
    (at-least-once delivery) leaves output and store unchanged — the
    shared crash-safe scaffolding, now at the container granularity."""
    from etl_demos_spark.streaming.dedup import video_dedup_batch_processor

    a = _avi([b"frame-a1", b"frame-a2"])
    b = _avi([b"frame-b1"])
    c = _avi([b"frame-c1", b"frame-c2", b"frame-c3"])
    out = str(tmp_path / "out")
    store = str(tmp_path / "store")
    proc = video_dedup_batch_processor(out, store)

    b1 = spark.createDataFrame(
        [(0, a), (0, a), (1, b)], "id long, content binary"
    )  # same-batch physical replay of id 0
    b2 = spark.createDataFrame(
        [(10, a), (11, c)], "id long, content binary"
    )  # 10 = exact dup of 0, 11 novel
    proc(b1, 0)
    proc(b2, 1)
    got = {r["id"] for r in spark.read.parquet(out).collect()}
    assert got == {0, 1, 11}
    assert {r["id"] for r in spark.read.parquet(store).collect()} == {0, 1, 11}
    # full replay of batch 1 after its store swap: idempotent
    proc(b2, 1)
    assert {r["id"] for r in spark.read.parquet(out).collect()} == {0, 1, 11}
    assert {r["id"] for r in spark.read.parquet(store).collect()} == {0, 1, 11}


def test_video_dedup_stream_end_to_end(spark, tmp_path):
    """availableNow drain over a file source: deduped video output and
    a populated fingerprint store."""
    from etl_demos_spark.streaming.dedup import run_video_dedup_stream
    from etl_demos_spark.streaming.stateful import drain_available_now

    v1 = _avi([b"payload-one", b"payload-two"])
    v2 = _avi([b"payload-three"])
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(0, v1), (1, v2), (2, v1)], "id long, content binary"
    ).coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema

    q = run_video_dedup_stream(
        spark, src, str(tmp_path / "out"), str(tmp_path / "store"),
        schema, str(tmp_path / "ckpt"),
    )
    assert drain_available_now(q)

    got = {r["id"] for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert got == {0, 1}
    fps = {r["id"]: r["fp"] for r in
           spark.read.parquet(str(tmp_path / "store")).collect()}
    assert set(fps) == {0, 1} and len(set(fps.values())) == 2


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
