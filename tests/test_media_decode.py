"""Real media decode: pure-stdlib PNG/WAV kernels + the Spark decode pass.

The PNG decoder must invert every scanline filter type (0-4), so the
round-trip tests re-filter known pixel data forward with each filter and
assert exact pixel recovery. The WAV path round-trips int16 samples
through the stdlib ``wave`` writer. Spark-side: decode_media fills typed
metadata per payload and isolates corrupt payloads as ok=false rows.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from graphrag_rs_spark.rules.media import (
    PNG_MAGIC,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    sniff_mime,
)


def _rng_pixels(h, w, ch, seed=7):
    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)
    return arr if ch > 1 else arr[:, :, 0]


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_with_filter(pixels: np.ndarray, ftype: int) -> bytes:
    """Forward-filter every scanline with ``ftype`` and assemble a PNG, so
    decode must run the matching inverse filter to recover the pixels."""
    arr = pixels if pixels.ndim == 3 else pixels[:, :, None]
    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    stride = w * ch
    flat = arr.reshape(h, stride).astype(np.int16)
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        line = flat[y]
        filt = bytearray([ftype])
        for i in range(stride):
            left = int(line[i - ch]) if i >= ch else 0
            up = int(prev[i])
            ul = int(prev[i - ch]) if i >= ch else 0
            x = int(line[i])
            if ftype == 0:
                v = x
            elif ftype == 1:
                v = x - left
            elif ftype == 2:
                v = x - up
            elif ftype == 3:
                v = x - ((left + up) >> 1)
            else:
                v = x - _paeth(left, up, ul)
            filt.append(v & 0xFF)
        out.extend(filt)
        prev = line

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(out)))
            + chunk(b"IEND", b""))


@pytest.mark.parametrize("ch", [1, 3, 4])
def test_png_roundtrip_channels(ch):
    px = _rng_pixels(9, 13, ch)
    d = decode_png(encode_png(px))
    assert (d["width"], d["height"]) == (13, 9)
    want = px if px.ndim == 3 else px[:, :, None]
    assert np.array_equal(d["pixels"], want)
    assert d["mime"] == "image/png"


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_inverse_filters_exact(ftype):
    px = _rng_pixels(8, 11, 3, seed=ftype + 1)
    d = decode_png(_png_with_filter(px, ftype))
    assert np.array_equal(d["pixels"], px)


def test_png_palette_expands_to_rgb():
    # 4-entry palette, 6x5 indexed image
    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]], dtype=np.uint8
    )
    idx = (np.arange(30, dtype=np.uint8) % 4).reshape(5, 6)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 6, 5, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(5))
    buf = (PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"PLTE", palette.tobytes())
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    d = decode_png(buf)
    assert d["channels"] == 3
    assert np.array_equal(d["pixels"], palette[idx])


def test_png_crc_corruption_detected():
    buf = bytearray(encode_png(_rng_pixels(4, 4, 3)))
    buf[40] ^= 0xFF  # flip a byte inside a chunk body
    with pytest.raises(ValueError, match="CRC|IDAT|length"):
        decode_png(bytes(buf))


def test_wav_roundtrip_and_duration():
    t = np.arange(1600)
    samples = (np.sin(2 * np.pi * 440 * t / 8000) * 20000).astype(np.int16)
    d = decode_wav(encode_wav(samples, sample_rate=8000))
    assert d["channels"] == 1
    assert d["sample_rate"] == 8000
    assert d["n_frames"] == 1600
    assert d["duration_ms"] == 200
    assert np.array_equal(d["samples"][:, 0], samples)


def test_sniff_mime():
    assert sniff_mime(encode_png(_rng_pixels(2, 2, 1))) == "image/png"
    assert sniff_mime(encode_wav(np.zeros(8, dtype=np.int16))) == "audio/wav"
    assert sniff_mime(b"\xff\xd8\xff junk") == "image/jpeg"
    assert sniff_mime(b"\x00\x01\x02") is None


# ---------------------------------------------------------------------------
# baseline JPEG codec (rules/jpeg.py)
# ---------------------------------------------------------------------------

def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([
        xx * 255 // max(w - 1, 1),
        yy * 255 // max(h - 1, 1),
        (xx + yy) * 255 // max(h + w - 2, 1),
    ], axis=2).astype(np.uint8)


@pytest.mark.parametrize("ss", ["4:4:4", "4:2:2", "4:2:0"])
def test_jpeg_roundtrip_subsamplings(ss):
    """Lossy round-trip at quality 95 on smooth content must stay within
    a few quantization steps at every chroma layout (non-multiple-of-8
    dimensions exercise the pad/crop path)."""
    from graphrag_rs_spark.rules.jpeg import decode_jpeg, encode_jpeg

    img = _gradient(41, 53)
    buf = encode_jpeg(img, quality=95, subsampling=ss)
    assert sniff_mime(buf) == "image/jpeg"
    out = decode_jpeg(buf)
    assert (out["width"], out["height"]) == (53, 41)
    assert out["pixels"].shape == (41, 53, 3)
    err = np.abs(out["pixels"].astype(int) - img.astype(int))
    assert err.max() <= 8 and err.mean() < 2.5, (ss, err.max(), err.mean())


def test_jpeg_restart_markers_roundtrip():
    """DRI/RSTn resync: per-interval DC predictor reset + bit realignment
    must reproduce the same pixels as the unsegmented stream."""
    from graphrag_rs_spark.rules.jpeg import decode_jpeg, encode_jpeg

    img = _gradient(24, 40)  # 15 MCUs at 4:4:4
    plain = decode_jpeg(encode_jpeg(img, quality=92))["pixels"]
    with_rst = decode_jpeg(
        encode_jpeg(img, quality=92, restart_interval=4)
    )["pixels"]
    assert np.array_equal(plain, with_rst)


def test_jpeg_noisy_content_and_high_detail():
    from graphrag_rs_spark.rules.jpeg import decode_jpeg, encode_jpeg

    img = _rng_pixels(17, 23, 3, seed=11)
    out = decode_jpeg(encode_jpeg(img, quality=90))["pixels"]
    err = np.abs(out.astype(int) - img.astype(int))
    # noisy content is the worst case for JPEG; bound the damage
    assert err.mean() < 12


def test_jpeg_rejects_progressive_and_garbage():
    from graphrag_rs_spark.rules.jpeg import decode_jpeg, encode_jpeg

    buf = bytearray(encode_jpeg(_gradient(8, 8)))
    sof = buf.find(b"\xff\xc0")
    buf[sof + 1] = 0xC2  # flip SOF0 → SOF2 (progressive)
    with pytest.raises(ValueError, match="SOF2"):
        decode_jpeg(bytes(buf))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0\x00\x04zz\xff\xd9")  # no SOF/SOS


# ---------------------------------------------------------------------------
# Spark decode pass
# ---------------------------------------------------------------------------

def test_decode_media_fills_metadata_and_isolates_corrupt(spark):
    from graphrag_rs_spark.operators.multimodal import decode_media, media_table
    from graphrag_rs_spark.rules.jpeg import encode_jpeg

    png = encode_png(_rng_pixels(7, 5, 3))
    wav = encode_wav(np.zeros(800, dtype=np.int16), sample_rate=8000)
    jpg = encode_jpeg(_gradient(9, 11), quality=90, subsampling="4:2:0")
    rows = [(1, png), (2, wav), (3, b"not media at all"), (4, png[:30]),
            (5, jpg)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r["media_id"]: r
        for r in decode_media(
            media_table(df, "payload", "mixed", "media_id")
        ).collect()
    }
    assert got["1"]["ok"] and got["1"]["mime"] == "image/png"
    assert (got["1"]["width"], got["1"]["height"]) == (5, 7)
    assert got["2"]["ok"] and got["2"]["mime"] == "audio/wav"
    assert got["2"]["duration_ms"] == 100 and got["2"]["sample_rate"] == 8000
    assert not got["3"]["ok"] and got["3"]["err"]
    assert not got["4"]["ok"]  # truncated PNG must not kill the stage
    assert got["5"]["ok"] and got["5"]["mime"] == "image/jpeg"
    assert (got["5"]["width"], got["5"]["height"]) == (11, 9)


def test_extract_features_real_decode(spark):
    from graphrag_rs_spark.operators.multimodal import extract_features, media_table

    from graphrag_rs_spark.rules.jpeg import encode_jpeg

    png = encode_png(_rng_pixels(16, 16, 3))
    wav = encode_wav(
        (np.sin(np.arange(400)) * 10000).astype(np.int16), sample_rate=8000
    )
    jpg = encode_jpeg(_gradient(16, 16), quality=90)
    df = spark.createDataFrame(
        [(1, png), (2, wav), (3, jpg)], "media_id long, payload binary"
    )
    feats = extract_features(
        media_table(df, "payload", "mixed", "media_id"),
        n_features=8, decode="real",
    ).collect()
    assert len(feats) == 3
    for r in feats:
        assert len(r["features"]) == 8
        assert abs(sum(r["features"]) - 1.0) < 1e-5


def test_extract_features_on_error_skip_isolates_bad_payloads(spark):
    # one JPEG-ish blob and one truncated PNG among valid media: with
    # on_error="skip" the bad payloads emit no row instead of killing
    # the stage; default on_error="raise" still fails fast.
    from graphrag_rs_spark.operators.multimodal import extract_features, media_table

    png = encode_png(_rng_pixels(8, 8, 3))
    wav = encode_wav(
        (np.sin(np.arange(200)) * 9000).astype(np.int16), sample_rate=8000
    )
    df = spark.createDataFrame(
        [
            (1, png),
            (2, wav),
            (3, b"\xff\xd8\xff\xe0 not-actually-decodable"),  # JPEG magic
            (4, png[: len(png) // 2]),  # truncated PNG: zlib error
        ],
        "media_id long, payload binary",
    )
    media = media_table(df, "payload", "mixed", "media_id")
    ok = extract_features(media, n_features=8, decode="real", on_error="skip")
    assert sorted(r["media_id"] for r in ok.collect()) == ["1", "2"]
    import pytest as _pytest

    with _pytest.raises(Exception, match="media_id"):
        extract_features(media, n_features=8, decode="real").collect()
