"""Perceptual audio dedup: an energy-gradient fingerprint + the shared
Hamming-banded near-dup join — audio's entry in the dedup matrix (text
has five granularities, images have dHash/pHash; this is the
"shazam-lite" sign-of-delta-energy recipe over PCM frames).

Fingerprint spec (all exact integer, the SimHash/dHash oracle
discipline):
- decode WAV PCM (operators/multimodal.decode_wav), mono-mix stereo by
  the floor-mean ((l+r)//2 — exact for the planted corpus's positive
  16-bit samples; documented floor semantics otherwise);
- split the sample stream into N_FRAMES equal frames: frame f covers
  [f·n//N, (f+1)·n//N) — floor boundaries, empty frames allowed;
- frame energy e[f] = Σ sample² (int64: |s| ≤ 32767 ⇒ s² < 2³⁰; the
  planted payloads are ≤ 124 samples ⇒ energies < 2³⁷);
- bit f = 1 iff e[f+1] > e[f] — the energy GRADIENT, which survives
  volume scaling direction-wise and localizes a byte edit to the two
  comparisons that see its frame. N_FRAMES-1 = 63 bits, positive int64.

Pair generation is the signature-agnostic pigeonhole chunk join
(operators/dedup.hamming_chunk_pairs) — the same banded equi-join the
text and image hashes ride; complete within the ball, so a DuckDB
oracle certifies with a plain all-pairs Hamming filter.

No analogue in the reference repo (rytakahas/etl-demos) — part of the
LLM-training-data extension surface (multimodal curation).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from etl_demos_spark.operators.dedup import hamming_chunk_pairs, materialize_reused
from etl_demos_spark.operators.multimodal import decode_wav

N_FRAMES = 64
AUDIO_FP_BITS = N_FRAMES - 1  # 63 gradient comparisons


def audio_fp_int(samples, channels: int) -> int:
    """63-bit energy-gradient fingerprint of a decoded PCM sample
    matrix ((n_frames, channels) int32)."""
    import numpy as np

    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 2:
        mono = s.sum(axis=1) // channels if channels > 1 else s[:, 0]
    else:
        mono = s
    n = len(mono)
    e = np.zeros(N_FRAMES, dtype=np.int64)
    if n:
        sq = mono * mono
        bounds = (np.arange(N_FRAMES + 1) * n) // N_FRAMES
        csum = np.concatenate([[0], np.cumsum(sq)])
        e = csum[bounds[1:]] - csum[bounds[:-1]]
    sig = 0
    for f in range(AUDIO_FP_BITS):
        if e[f + 1] > e[f]:
            sig |= 1 << f
    return sig


def audio_fp_signatures(
    df: DataFrame, id_col: str = "id", content_col: str = "content"
) -> DataFrame:
    """(id, sig) fingerprints: one Arrow-batch mapInPandas WAV-decode
    pass, no shuffle, payload bytes never leave the executor."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sigs = [], []
            for id_, content in zip(pdf[id_col], pdf[content_col]):
                _, ch, _, s = decode_wav(bytes(content))
                ids.append(int(id_))
                sigs.append(audio_fp_int(s, ch))
            yield pd.DataFrame(
                {
                    "id": pd.array(ids, dtype="int64"),
                    "sig": pd.array(sigs, dtype="int64"),
                }
            )

    return df.select(id_col, content_col).mapInPandas(run, "id long, sig long")


def audio_near_dup_pairs(
    df: DataFrame,
    max_hamming: int = 4,
    id_col: str = "id",
    content_col: str = "content",
) -> DataFrame:
    """Near-duplicate audio pairs within a Hamming ball — decode once,
    then the pigeonhole chunk join (complete within the ball). The
    radius-vs-candidates guidance from image_near_dup_pairs applies
    unchanged: candidates ≈ (h+1)·n²/2^(bits//(h+1))."""
    sigs = materialize_reused(audio_fp_signatures(df, id_col, content_col))
    return hamming_chunk_pairs(sigs, AUDIO_FP_BITS, max_hamming)
