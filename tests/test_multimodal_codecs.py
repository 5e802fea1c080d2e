"""In-repo dependency-free image codecs (operators/multimodal.py):
decode_ppm / decode_bmp / decode_png against hand-built fixture bytes,
plus the decode→featurize/resize Arrow passes. The PNG fixtures are
encoded here (stdlib zlib + manual scanline filtering) so every filter
type (0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth) is exercised."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyspark.sql.functions as F
import pytest

from etl_demos_spark.operators import multimodal


def _rng_img(h, w, ch, seed=11):
    return np.random.default_rng(seed).integers(0, 256, (h, w, ch), dtype=np.uint8)


# --- fixture encoders -------------------------------------------------------


def encode_ppm(arr: np.ndarray, comment: bool = False) -> bytes:
    h, w = arr.shape[:2]
    gray = arr.ndim == 2 or arr.shape[2] == 1
    magic = b"P5" if gray else b"P6"
    hdr = magic + b"\n"
    if comment:
        hdr += b"# a comment line\n"
    hdr += f"{w} {h}\n255\n".encode()
    return hdr + arr.tobytes()


def encode_bmp24(arr: np.ndarray, top_down: bool = False) -> bytes:
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    raster = bytearray()
    rows = arr if top_down else arr[::-1]
    for row in rows:
        line = row[:, ::-1].tobytes()  # RGB -> BGR
        raster += line + b"\x00" * (stride - len(line))
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24, 0,
        len(raster), 2835, 2835, 0, 0,
    )
    filehdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(raster), 0, 0, 14 + 40)
    return filehdr + info + bytes(raster)


def _paeth(a, b, c):
    p = int(a) + int(b) - int(c)
    pa, pb, pc = abs(p - int(a)), abs(p - int(b)), abs(p - int(c))
    if pa <= pb and pa <= pc:
        return int(a)
    return int(b) if pb <= pc else int(c)


def encode_png(arr: np.ndarray, filters: list[int]) -> bytes:
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color = {1: 0, 3: 2, 4: 6}[ch]
    raw = bytearray()
    prev = np.zeros((w, ch), dtype=np.uint8)
    for y in range(h):
        f = filters[y % len(filters)]
        cur = arr[y]
        out = np.zeros_like(cur)
        for x in range(w):
            for k in range(ch):
                a = int(cur[x - 1, k]) if x else 0
                b = int(prev[x, k])
                c = int(prev[x - 1, k]) if x else 0
                v = int(cur[x, k])
                if f == 0:
                    e = v
                elif f == 1:
                    e = v - a
                elif f == 2:
                    e = v - b
                elif f == 3:
                    e = v - (a + b) // 2
                else:
                    e = v - _paeth(a, b, c)
                out[x, k] = e % 256
        raw += bytes([f]) + out.tobytes()
        prev = cur

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


# --- decoder tests ----------------------------------------------------------


def test_ppm_roundtrip_rgb_and_gray_with_comments():
    rgb = _rng_img(7, 9, 3)
    w, h, mode, arr = multimodal.decode_ppm(encode_ppm(rgb, comment=True))
    assert (w, h, mode) == (9, 7, "RGB")
    np.testing.assert_array_equal(arr, rgb)
    gray = _rng_img(5, 4, 1)[:, :, 0]
    w, h, mode, arr = multimodal.decode_ppm(encode_ppm(gray))
    assert (w, h, mode) == (4, 5, "L")
    np.testing.assert_array_equal(arr, gray)


def test_bmp_bottom_up_and_top_down_with_padding():
    img = _rng_img(6, 3, 3)  # width 3 -> 3-byte row padding
    for td in (False, True):
        w, h, mode, arr = multimodal.decode_bmp(encode_bmp24(img, top_down=td))
        assert (w, h, mode) == (3, 6, "RGB")
        np.testing.assert_array_equal(arr, img)


@pytest.mark.parametrize(
    "filters", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]]
)
@pytest.mark.parametrize("ch", [1, 3, 4])
def test_png_all_filters_all_modes(filters, ch):
    img = _rng_img(6, 5, ch)
    src = img[:, :, 0] if ch == 1 else img
    w, h, mode, arr = multimodal.decode_png(encode_png(src, filters))
    assert (w, h) == (5, 6)
    assert mode == {1: "L", 3: "RGB", 4: "RGBA"}[ch]
    np.testing.assert_array_equal(arr, src)


def test_sniffing_registry_and_declared_boundary():
    img = _rng_img(3, 3, 3)
    for buf in (encode_ppm(img), encode_bmp24(img), encode_png(img, [0])):
        w, h, mode, arr = multimodal.decode_image(buf)
        np.testing.assert_array_equal(arr, img)
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\xff\xd8\xff\xe0 jpeg soi")  # JPEG -> plug-in


# --- Arrow decode passes ----------------------------------------------------


def _img_df(spark, imgs):
    rows = [(i, bytearray(b)) for i, b in enumerate(imgs)]
    return spark.createDataFrame(rows, "id long, content binary")


def test_extract_image_meta_real_decoders(spark):
    imgs = [
        encode_ppm(_rng_img(4, 6, 3)),
        encode_bmp24(_rng_img(5, 3, 3)),
        encode_png(_rng_img(3, 7, 1)[:, :, 0], [0, 2]),
    ]
    out = {r["id"]: r for r in multimodal.extract_image_meta(_img_df(spark, imgs)).collect()}
    assert (out[0]["width"], out[0]["height"], out[0]["mode"]) == (6, 4, "RGB")
    assert (out[1]["width"], out[1]["height"], out[1]["mode"]) == (3, 5, "RGB")
    assert (out[2]["width"], out[2]["height"], out[2]["mode"]) == (7, 3, "L")


def test_image_channel_stats_matches_numpy(spark):
    img = _rng_img(8, 5, 3)
    out = multimodal.image_channel_stats(_img_df(spark, [encode_ppm(img)])).collect()[0]
    px = img.reshape(-1, 3).astype(np.int64)
    n = float(len(px))
    m = px.sum(0) / n
    s = np.sqrt((px * px).sum(0) / n - m * m)
    assert out["ch_mean"] == pytest.approx(list(m), abs=0)
    assert out["ch_std"] == pytest.approx(list(s), rel=1e-12)


def test_resize_nearest_neighbor_matches_numpy(spark):
    img = _rng_img(10, 8, 3)
    out = multimodal.resize_images(_img_df(spark, [encode_ppm(img)]), 4, 5).collect()[0]
    ys = (np.arange(5) * 10) // 5
    xs = (np.arange(4) * 8) // 4
    expect = img[ys][:, xs]
    assert (out["width"], out["height"], out["mode"]) == (4, 5, "RGB")
    np.testing.assert_array_equal(
        np.frombuffer(bytes(out["pixels"]), dtype=np.uint8).reshape(5, 4, 3), expect
    )


# ---------------------------------------------------------------------------
# WAV (RIFF PCM) decoder
# ---------------------------------------------------------------------------


def _wav(payload: bytes, rate=8000, ch=1, bits=8, extra_chunk=False) -> bytes:
    import struct

    block = ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if extra_chunk:  # decoders must chunk-walk, not assume layout
        chunks += b"LIST" + struct.pack("<I", 5) + b"junk!" + b"\x00"
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_wav_8bit_mono_roundtrip():
    import numpy as np

    from etl_demos_spark.operators.multimodal import decode_wav

    payload = bytes(range(200, 210)) + bytes(range(0, 10))
    rate, ch, bits, s = decode_wav(_wav(payload, rate=44100))
    assert (rate, ch, bits) == (44100, 1, 8)
    assert s.shape == (20, 1)
    want = np.array(list(payload), dtype=np.int32) - 128
    assert (s[:, 0] == want).all()


def test_wav_16bit_stereo_roundtrip_and_sign():
    import struct

    from etl_demos_spark.operators.multimodal import decode_wav

    vals = [0, 1, -1, 32767, -32768, 1000, -1000, 12345]
    payload = b"".join(struct.pack("<h", v) for v in vals)
    rate, ch, bits, s = decode_wav(_wav(payload, rate=16000, ch=2, bits=16))
    assert (rate, ch, bits) == (16000, 2, 16)
    assert s.shape == (4, 2)
    assert s.ravel().tolist() == vals


def test_wav_chunk_walk_skips_unknown_chunks():
    from etl_demos_spark.operators.multimodal import decode_wav

    payload = bytes([128, 129, 130, 131])
    _, _, _, s = decode_wav(_wav(payload, extra_chunk=True))
    assert s[:, 0].tolist() == [0, 1, 2, 3]


def test_wav_rejects_non_riff_and_compressed():
    import struct

    import pytest

    from etl_demos_spark.operators.multimodal import decode_wav

    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS" + b"\x00" * 40)
    # audio_format=2 (ADPCM) is the declared external-codec boundary
    fmt = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 8)
    buf = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", 0)
    )
    with pytest.raises(NotImplementedError, match="PCM"):
        decode_wav(buf)


def test_wav_rejects_zero_channels_and_truncated_data():
    import struct

    import pytest

    from etl_demos_spark.operators.multimodal import decode_wav

    # channels=0: must be the codec's ValueError, not ZeroDivisionError
    fmt = struct.pack("<HHIIHH", 1, 0, 8000, 0, 0, 8)
    buf = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError, match="channels=0"):
        decode_wav(buf)

    # data chunk declaring more bytes than the buffer holds: error, not
    # a silently-shorter (plausible-but-wrong) sample array
    whole = _wav(bytes([128, 129, 130, 131]))
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(whole[:-2])


def test_audio_features_exact_integers(spark):
    """Hand-checkable: 4 samples of 8-bit PCM [138, 118, 128, 228] →
    centered [10, -10, 0, 100]: peak 100, sumsq 10200, rms
    √(10200/4) = √2550."""
    import math

    from etl_demos_spark.operators.multimodal import audio_features

    buf = _wav(bytes([138, 118, 128, 228]), rate=8000)
    df = spark.createDataFrame([(7, buf)], "id long, content binary")
    r = audio_features(df).collect()[0]
    assert (r["sample_rate"], r["channels"], r["bits"]) == (8000, 1, 8)
    assert r["n_frames"] == 4 and r["duration_ms"] == 0
    assert r["peak"] == 100 and r["sumsq"] == 10200
    assert r["rms"] == round(math.sqrt(2550.0), 6)


# ---------------------------------------------------------------------------
# AVI (RIFF container) walker
# ---------------------------------------------------------------------------


def _avi(frames, usec=40000, w=32, h=8, extra_list=False):
    import struct

    def chunk(cid, body):
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    avih = struct.pack("<14I", usec, 0, 0, 0, len(frames), 0, 1, 0, w, h, 0, 0, 0, 0)
    body = b"AVI " + chunk(b"LIST", b"hdrl" + chunk(b"avih", avih))
    if extra_list:  # walkers must skip unknown LISTs, not assume layout
        body += chunk(b"LIST", b"INFO" + chunk(b"ISFT", b"testtool"))
    body += chunk(b"LIST", b"movi" + b"".join(chunk(b"00dc", f) for f in frames))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_avi_walker_counts_frames_and_bytes():
    from etl_demos_spark.operators.multimodal import decode_avi

    frames = [b"abc", b"defgh", b"i"]  # odd sizes force pad handling
    m = decode_avi(_avi(frames, usec=33333, w=17, h=9))
    assert m["usec_per_frame"] == 33333
    assert (m["width"], m["height"], m["n_streams"]) == (17, 9, 1)
    assert m["total_frames"] == 3
    assert m["movi_frames"] == 3
    assert m["movi_bytes"] == 3 + 5 + 1


def test_avi_walker_skips_unknown_lists():
    from etl_demos_spark.operators.multimodal import decode_avi

    m = decode_avi(_avi([b"xy"], extra_list=True))
    assert m["movi_frames"] == 1 and m["movi_bytes"] == 2


def test_avi_walker_rejects_non_avi():
    import pytest

    from etl_demos_spark.operators.multimodal import decode_avi

    with pytest.raises(ValueError, match="RIFF/AVI"):
        decode_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="avih"):
        decode_avi(b"RIFF\x04\x00\x00\x00AVI ")
