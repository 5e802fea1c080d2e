"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design (the part that matters at 100 TB):
- A multimodal table is ``(id, modality, content binary, meta struct)``.
  Binary payloads ride Parquet byte arrays; metadata is columnar and
  prunable, so scans that only need metadata never touch the bytes.
- Decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` UDFs: one Python worker per partition, zero-copy Arrow
  transfer, batch-shaped (pandas.Series of bytes → pandas.DataFrame).
  Partitioning is preserved; there is no shuffle in the decode path.
- Decoding is codec-pluggable. Four real, dependency-free decoders ship
  in-repo — PPM/PGM (P5/P6), uncompressed BMP (24/32-bit), PNG
  (stdlib zlib; 8-bit gray/RGB/RGBA, non-interlaced), and WAV (RIFF
  PCM 8/16-bit) — dispatched by magic-byte sniffing. Formats needing
  external codecs (JPEG/video/compressed audio) remain a declared
  NotImplementedError boundary; plug PIL/ffmpeg there at deployment. A
  deterministic fake decoder is kept for plumbing-only tests.
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


def decode_ppm(buf: bytes):
    """PPM (P6) / PGM (P5) binary decoder → (width, height, mode, ndarray).
    Whitespace- and comment-tolerant header parse per the netpbm spec;
    maxval ≤ 255 only (1 byte/sample)."""
    import numpy as np

    if buf[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PPM/PGM")
    mode = "L" if buf[:2] == b"P5" else "RGB"
    ch = 1 if mode == "L" else 3
    # tokenize header: magic, width, height, maxval; '#' comments to EOL
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":
            while pos < len(buf) and buf[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(buf[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm not supported")
    px = np.frombuffer(buf, dtype=np.uint8, count=w * h * ch, offset=pos)
    return w, h, mode, px.reshape((h, w, ch) if ch > 1 else (h, w))


def decode_bmp(buf: bytes):
    """Uncompressed 24/32-bit BMP decoder → (width, height, mode, ndarray).
    Handles the 4-byte row padding, bottom-up and top-down row order, and
    BGR(A)→RGB(A) channel swap."""
    import struct

    import numpy as np

    if buf[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", buf, 10)[0]
    hdr_size = struct.unpack_from("<I", buf, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER not supported")
    w, h = struct.unpack_from("<ii", buf, 18)
    planes, bpp = struct.unpack_from("<HH", buf, 26)
    compression = struct.unpack_from("<I", buf, 30)[0]
    if compression not in (0, 3) or bpp not in (24, 32):
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
    if compression == 3:
        # BI_BITFIELDS: the masks define the channel layout. This decoder
        # hard-codes BGR(A) byte order below, so accept ONLY masks that
        # declare exactly that (the overwhelmingly common case — e.g.
        # 32bpp screenshots) and refuse anything else rather than decode
        # with channels silently swapped.
        if bpp != 32:
            raise NotImplementedError("BI_BITFIELDS only supported for 32bpp")
        # masks sit at absolute offset 54 for every header size (appended
        # after a 40-byte BITMAPINFOHEADER; embedded at the same spot in
        # V2/V3/V4/V5); the alpha mask exists from V3 (hdr >= 56) on
        r_mask, g_mask, b_mask = struct.unpack_from("<III", buf, 54)
        a_mask = struct.unpack_from("<I", buf, 66)[0] if hdr_size >= 56 else 0xFF000000
        if (r_mask, g_mask, b_mask) != (0x00FF0000, 0x0000FF00, 0x000000FF) or a_mask not in (
            0xFF000000,
            0,
        ):
            raise NotImplementedError(
                f"BI_BITFIELDS masks {(r_mask, g_mask, b_mask, a_mask)} are not "
                "the standard BGRA layout this decoder assumes"
            )
    # does the 4th byte actually CARRY alpha? Only when BI_BITFIELDS
    # declares an alpha mask. For 32bpp BI_RGB the byte is "reserved,
    # must be zero" — treating it as alpha renders every standard such
    # bitmap fully transparent; for BI_BITFIELDS with a_mask == 0 the
    # format explicitly says no alpha channel.
    has_alpha = bpp == 32 and compression == 3 and a_mask == 0xFF000000
    top_down, h = h < 0, abs(h)
    ch = bpp // 8
    stride = (w * ch + 3) & ~3
    rows = np.frombuffer(buf, dtype=np.uint8, count=stride * h, offset=data_off)
    rows = rows.reshape(h, stride)[:, : w * ch].reshape(h, w, ch)
    if not top_down:
        rows = rows[::-1]
    if ch == 3:
        return w, h, "RGB", rows[:, :, ::-1].copy()
    if has_alpha:
        return w, h, "RGBA", rows[:, :, [2, 1, 0, 3]].copy()
    # 32bpp without alpha: drop the padding byte, emit RGB
    return w, h, "RGB", rows[:, :, [2, 1, 0]].copy()


_PNG_MODES = {0: ("L", 1), 2: ("RGB", 3), 6: ("RGBA", 4)}


def decode_png(buf: bytes):
    """PNG decoder on the stdlib alone (zlib inflate + per-scanline
    unfilter) → (width, height, mode, ndarray). Supports bit depth 8,
    color types 0/2/6, non-interlaced — the common case; everything else
    raises NotImplementedError (plug a real codec at deployment)."""
    import struct
    import zlib

    import numpy as np

    if buf[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = bytearray()
    while pos < len(buf):
        (length,) = struct.unpack_from(">I", buf, pos)
        ctype = buf[pos + 4 : pos + 8]
        body = buf[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color not in _PNG_MODES or interlace:
                raise NotImplementedError(
                    f"PNG depth={depth} color={color} interlace={interlace}"
                )
            mode, ch = _PNG_MODES[color]
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if f == 0:
            pass
        elif f == 2:  # Up
            line += prev
        elif f in (1, 3, 4):  # Sub / Average / Paeth need a pixel loop
            a = np.zeros(ch, dtype=np.int16)
            for x in range(0, stride, ch):
                b = prev[x : x + ch].astype(np.int16)
                cur = line[x : x + ch].astype(np.int16)
                if f == 1:
                    cur += a
                elif f == 3:
                    cur += (a + b) // 2
                else:
                    c = (
                        prev[x - ch : x].astype(np.int16)
                        if x
                        else np.zeros(ch, dtype=np.int16)
                    )
                    p = a + b - c
                    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
                    )
                    cur += pred
                line[x : x + ch] = (cur & 0xFF).astype(np.uint8)
                a = line[x : x + ch].astype(np.int16)
        else:
            raise NotImplementedError(f"PNG filter {f}")
        out[y] = line
        prev = out[y]
    arr = out.reshape((h, w, ch) if ch > 1 else (h, w))
    return w, h, mode, arr


def decode_image(buf: bytes):
    """Magic-byte sniffing codec registry → (width, height, mode, ndarray).
    JPEG/TIFF/etc. are the declared external-codec boundary."""
    if buf[:2] in (b"P5", b"P6"):
        return decode_ppm(buf)
    if buf[:2] == b"BM":
        return decode_bmp(buf)
    if buf[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(buf)
    raise NotImplementedError(
        f"no in-repo codec for magic {buf[:4]!r}; plug PIL/ffmpeg at deployment"
    )


def _decode_image_real(buf: bytes) -> tuple[int, int, str]:
    """Header decode via the in-repo codec registry (PPM/PGM/BMP/PNG)."""
    w, h, mode, _ = decode_image(buf)
    return w, h, mode


def _decode_image_fake(buf: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in: dimensions derived from the content hash so
    tests exercise the full plumbing with stable outputs."""
    h = hashlib.sha256(buf).digest()
    return (64 + h[0] % 192, 64 + h[1] % 192, "RGB")


def extract_image_meta(df: DataFrame, fake: bool = False) -> DataFrame:
    """mapInPandas decode: Arrow batches in, metadata rows out. The
    pattern scales linearly — each executor decodes its own partitions.
    ``fake=False`` (default) runs the real in-repo codecs
    (PPM/PGM/BMP/PNG); ``fake=True`` keeps the deterministic stub for
    plumbing-only tests with non-image payloads."""
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


def image_channel_stats(df: DataFrame) -> DataFrame:
    """Feature extraction: decode each payload with the in-repo codecs and
    emit per-channel pixel statistics — the canonical mapInPandas
    decode→featurize pass (one Arrow batch in, one narrow feature row
    out; no shuffle, content bytes never leave the executor)."""
    from pyspark.sql.types import ArrayType, DoubleType

    import numpy as np

    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("mode", StringType()),
            StructField("ch_mean", ArrayType(DoubleType())),
            StructField("ch_std", ArrayType(DoubleType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for id_, content in zip(pdf["id"], pdf["content"]):
                w, h, mode, arr = decode_image(bytes(content))
                px = arr.reshape(h * w, -1).astype(np.int64)
                n = float(h * w)
                # exact integer sums, then one double divide/sqrt — the
                # same value any engine gets from avg(v)/avg(v*v), so a
                # SQL oracle reproduces these doubles bit-for-bit
                # (numpy's two-pass std would differ in the last ulp)
                m = px.sum(0) / n
                s = np.sqrt((px * px).sum(0) / n - m * m)
                rows.append(
                    {
                        "id": int(id_),
                        "width": w,
                        "height": h,
                        "mode": mode,
                        "ch_mean": [float(x) for x in m],
                        "ch_std": [float(x) for x in s],
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.select("id", "content").mapInPandas(run, schema)


def resize_images(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize as a decode→transform→re-emit pass:
    (id, content) → (id, width, height, mode, pixels binary) at the target
    size. Raw pixel bytes out (row-major, channels interleaved) — the
    shape a downstream training-data writer or embedding model wants.
    numpy fancy-indexing per Arrow batch; linear in input pixels."""
    import numpy as np

    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("mode", StringType()),
            StructField("pixels", BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for id_, content in zip(pdf["id"], pdf["content"]):
                w, h, mode, arr = decode_image(bytes(content))
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                small = arr[ys][:, xs]
                rows.append(
                    {
                        "id": int(id_),
                        "width": out_w,
                        "height": out_h,
                        "mode": mode,
                        "pixels": small.tobytes(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.select("id", "content").mapInPandas(run, schema)


def decode_wav(buf: bytes):
    """RIFF/WAVE PCM decoder → (sample_rate, channels, bits, ndarray).

    Dependency-free, like the image codecs: chunk-walks the RIFF
    container, reads ``fmt `` (PCM only — compressed WAV variants are
    the declared external-codec boundary, same as JPEG) and ``data``.
    8-bit PCM is unsigned (centered: sample − 128); 16-bit is signed
    little-endian. Returns samples shaped (n_frames, channels) int32."""
    import numpy as np

    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        size = int.from_bytes(buf[pos + 4 : pos + 8], "little")
        body = buf[pos + 8 : pos + 8 + size]
        if len(body) != size and cid in (b"fmt ", b"data"):
            raise ValueError(
                f"truncated WAV: chunk {cid!r} declares {size} bytes, "
                f"buffer holds {len(body)}"
            )
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if channels < 1 or sample_rate < 1:
        raise ValueError(
            f"malformed fmt chunk (channels={channels}, rate={sample_rate})"
        )
    if audio_format != 1 or bits not in (8, 16):
        raise NotImplementedError(
            f"only PCM 8/16-bit WAV supported (format={audio_format}, "
            f"bits={bits}); plug ffmpeg/soundfile at deployment"
        )
    if bits == 8:
        s = np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128
    else:
        n = len(data) - len(data) % 2
        s = np.frombuffer(data[:n], dtype="<i2").astype(np.int32)
    frames = len(s) // channels
    return sample_rate, channels, bits, s[: frames * channels].reshape(
        frames, channels
    )


def audio_features(df: DataFrame) -> DataFrame:
    """Decode→featurize for audio: real WAV parse per payload, exact
    integer aggregates (peak = max |sample|, sumsq = Σ sample²), one
    deterministic double at the edge (rms = round(√(sumsq/n), 6) — the
    image-features sqrt-ulp-guard precedent). duration_ms is integer
    floor math: n_frames·1000 // rate. Same mapInPandas shape as the
    image passes: no shuffle, bytes never leave the executor."""
    import math

    from pyspark.sql.types import DoubleType

    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("sample_rate", IntegerType()),
            StructField("channels", IntegerType()),
            StructField("bits", IntegerType()),
            StructField("n_frames", LongType()),
            StructField("duration_ms", LongType()),
            StructField("peak", LongType()),
            StructField("sumsq", LongType()),
            StructField("rms", DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for id_, content in zip(pdf["id"], pdf["content"]):
                rate, ch, bits, s = decode_wav(bytes(content))
                n_frames = s.shape[0]
                n = n_frames * ch
                sumsq = int((s.astype("int64") ** 2).sum()) if n else 0
                peak = int(abs(s).max()) if n else 0
                rms = round(math.sqrt(sumsq / n), 6) if n else 0.0
                rows.append(
                    {
                        "id": int(id_),
                        "sample_rate": rate,
                        "channels": ch,
                        "bits": bits,
                        "n_frames": n_frames,
                        "duration_ms": n_frames * 1000 // rate,
                        "peak": peak,
                        "sumsq": sumsq,
                        "rms": rms,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.select("id", "content").mapInPandas(run, schema)


def _riff_walk(buf: bytes, pos: int, end: int):
    """Yield (chunk_id, body_offset, body_size) for a RIFF chunk run —
    word-aligned, the container grammar shared by decode_avi's census
    and avi_frame_payloads' extraction."""
    while pos + 8 <= end:
        cid = buf[pos : pos + 4]
        size = int.from_bytes(buf[pos + 4 : pos + 8], "little")
        yield cid, pos + 8, size
        pos += 8 + size + (size & 1)  # word-aligned


def avi_frame_payloads(
    buf: bytes, kinds: tuple[bytes, ...] = (b"dc", b"db", b"wb")
) -> list[bytes]:
    """Ordered frame payloads from an AVI's LIST movi run: the bytes of
    every chunk whose 2-char type suffix is in ``kinds``, in container
    order. This is the per-frame surface the video dedup family signs
    (operators/video_dedup.py) — whether a payload is *decodable* is
    the codec boundary question answered downstream (in-repo netpbm/BMP
    frames decode; compressed codecs fall back to exact payload
    hashing).

    ``kinds`` is the STREAM separation knob for muxed A/V containers:
    the default (dc/db/wb) is the full-container census — right for
    exact fingerprints, where the audio track is part of the identity —
    while the perceptual per-frame path passes ``(b"dc", b"db")`` so
    ##wb audio chunks never reach the image decoder."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    frames: list[bytes] = []
    for cid, p, size in _riff_walk(buf, 12, len(buf)):
        if cid != b"LIST" or buf[p : p + 4] != b"movi":
            continue
        for cid2, p2, size2 in _riff_walk(buf, p + 4, p + size):
            if cid2[2:4] in kinds:
                body = buf[p2 : p2 + size2]
                if len(body) != size2:
                    raise ValueError(
                        f"truncated AVI: frame chunk declares {size2} "
                        f"bytes, buffer holds {len(body)}"
                    )
                frames.append(body)
    return frames


def decode_avi(buf: bytes) -> dict:
    """AVI (RIFF) container metadata decoder — real nested chunk walk,
    no frame decode: RIFF/'AVI ' → LIST hdrl → avih (usec_per_frame,
    total_frames, width, height, n_streams) and LIST movi → per-frame
    chunk census (count + payload bytes for ##dc/##db/##wb chunks).
    Frame PAYLOADS (usually MJPEG/codec data) stay the declared
    external-codec boundary — this parses the container, which is what
    a frame-sampling plan needs (replaces make_video_table's
    n_frames-as-a-column crutch with parsed truth)."""

    def le32(b: bytes) -> int:
        return int.from_bytes(b, "little")

    if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")

    walk = lambda pos, end: _riff_walk(buf, pos, end)  # noqa: E731

    avih = None
    movi_frames = 0
    movi_bytes = 0
    for cid, p, size in walk(12, len(buf)):
        if cid != b"LIST":
            continue
        ltype = buf[p : p + 4]
        if ltype == b"hdrl":
            for cid2, p2, size2 in walk(p + 4, p + size):
                if cid2 == b"avih":
                    avih = buf[p2 : p2 + size2]
        elif ltype == b"movi":
            for cid2, p2, size2 in walk(p + 4, p + size):
                if cid2[2:4] in (b"dc", b"db", b"wb"):
                    movi_frames += 1
                    movi_bytes += size2
    if avih is None:
        raise ValueError("missing avih header")
    return {
        "usec_per_frame": le32(avih[0:4]),
        "total_frames": le32(avih[16:20]),
        "n_streams": le32(avih[24:28]),
        "width": le32(avih[32:36]),
        "height": le32(avih[36:40]),
        "movi_frames": movi_frames,
        "movi_bytes": movi_bytes,
    }


def video_meta(df: DataFrame) -> DataFrame:
    """Container-parse pass for video: one Arrow-batch mapInPandas
    decode_avi per payload — (id, usec_per_frame, total_frames,
    n_streams, width, height, movi_frames, movi_bytes). All integers;
    the same no-shuffle decode shape as the image/audio passes."""
    from pyspark.sql.types import DoubleType  # noqa: F401 (schema symmetry)

    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("usec_per_frame", LongType()),
            StructField("total_frames", LongType()),
            StructField("n_streams", LongType()),
            StructField("width", LongType()),
            StructField("height", LongType()),
            StructField("movi_frames", LongType()),
            StructField("movi_bytes", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for id_, content in zip(pdf["id"], pdf["content"]):
                m = decode_avi(bytes(content))
                rows.append({"id": int(id_), **m})
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.select("id", "content").mapInPandas(run, schema)


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
    frame (join back by id only where the decoder actually needs bytes).

    Videos with n_frames <= 0 or NULL emit NO rows: every emitted index
    satisfies the contract frame_idx < n_frames — the old greatest(...,0)
    clamp fabricated a phantom frame 0 for zero-frame containers, which
    the downstream decoder would then try to read."""
    return df.filter(F.col("meta.n_frames") >= 1).select(
        "id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.col("meta.n_frames") - 1,
                F.lit(every_n),
            )
        ).alias("frame_idx"),
    )
