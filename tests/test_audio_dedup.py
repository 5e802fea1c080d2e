"""Audio energy-gradient fingerprint: reference exactness, mutant
locality, chunk-join completeness. Oracle parity at sf0.001/sf0.01 runs
separately via test_oracle_parity."""

from __future__ import annotations

import struct

import numpy as np

from etl_demos_spark.operators import audio_dedup as adp


def _wav(payload: bytes, ch=1, bits=8, rate=8000) -> bytes:
    block = ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block, bits)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_audio_fp_matches_reference_mono_and_stereo():
    rng = np.random.default_rng(41)
    from etl_demos_spark.operators.multimodal import decode_wav

    for ch, bits in ((1, 8), (2, 16)):
        n_bytes = 300 - 300 % (ch * bits // 8)
        payload = bytes(rng.integers(0, 256, size=n_bytes, dtype=np.uint8))
        _, c, _, s = decode_wav(_wav(payload, ch=ch, bits=bits))
        got = adp.audio_fp_int(s, c)
        # independent reference over the same spec
        mono = (s.astype(np.int64).sum(axis=1) // c) if c > 1 else s[:, 0].astype(np.int64)
        n = len(mono)
        e = [
            int((mono[(f * n) // 64 : ((f + 1) * n) // 64] ** 2).sum())
            for f in range(64)
        ]
        want = 0
        for f in range(63):
            if e[f + 1] > e[f]:
                want |= 1 << f
        assert got == want
        assert 0 <= got < (1 << 63)


def test_audio_fp_one_byte_edit_moves_at_most_two_bits():
    """A first-byte edit changes only frame 0's energy — the two
    gradient comparisons that see it."""
    rng = np.random.default_rng(42)
    from etl_demos_spark.operators.multimodal import decode_wav

    payload = bytes(rng.integers(0, 256, size=256, dtype=np.uint8))
    mutated = bytes([(payload[0] + 128) % 256]) + payload[1:]

    def fp(p):
        _, c, _, s = decode_wav(_wav(p))
        return adp.audio_fp_int(s, c)

    d = bin(fp(payload) ^ fp(mutated)).count("1")
    assert d <= 2, d
    unrelated = bytes(rng.integers(0, 256, size=256, dtype=np.uint8))
    assert bin(fp(payload) ^ fp(unrelated)).count("1") >= 15


def test_audio_near_dup_pairs_complete_vs_bruteforce(spark):
    rng = np.random.default_rng(43)
    rows = []
    for i in range(15):
        p = bytes(rng.integers(0, 256, size=280, dtype=np.uint8))
        rows.append((i, _wav(p)))
        rows.append((i + 1000, _wav(bytes([(p[0] + 128) % 256]) + p[1:])))
    df = spark.createDataFrame(rows, "id long, content binary")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in adp.audio_near_dup_pairs(df, max_hamming=4).collect()
    }
    sigs = {r["id"]: r["sig"] for r in adp.audio_fp_signatures(df).collect()}
    want = {}
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(sigs[a] ^ sigs[b]).count("1")
            if h <= 4:
                want[(a, b)] = h
    assert got == want
    planted = {(i, i + 1000) for i in range(15)}
    assert planted <= set(got), planted - set(got)
