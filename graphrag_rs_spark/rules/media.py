"""Pure-stdlib media decode kernels (no PIL/ffmpeg in this container).

PNG and WAV are fully decodable with the standard library alone — ``zlib``
for PNG's DEFLATE stream and ``wave`` for RIFF/WAVE — so the ``real``
decode path of ``operators.multimodal`` is an actual decoder for those
formats, not a stub. Reference shape: graphrag-rs keeps media handling out
of its core (text engine), so this module follows the builder brief's
multimodal contract rather than a reference file.

PNG support: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha), 6 (RGBA); all five scanline filters (None/Sub/Up/
Average/Paeth); no interlacing (Adam7 raises). That covers every PNG the
fixture encoder below emits and the overwhelming majority of real-world
PNGs at 8-bit depth.
"""

from __future__ import annotations

import io
import struct
import zlib

# baseline-sequential JPEG lives in its own module (rules/jpeg.py);
# re-exported here so sniff → decode dispatch has one import surface
from graphrag_rs_spark.rules.jpeg import (  # noqa: F401
    decode_jpeg,
    encode_jpeg,
)

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def sniff_mime(buf: bytes) -> str | None:
    """Magic-byte MIME sniff for the formats the decoder handles."""
    if buf.startswith(PNG_MAGIC):
        return "image/png"
    if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        return "audio/wav"
    if buf.startswith(b"\xff\xd8\xff"):
        return "image/jpeg"
    return None


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(buf: bytes) -> dict:
    """Decode a PNG into ``{width, height, color_type, channels, mime,
    pixels}`` where ``pixels`` is a ``numpy.uint8`` array of shape
    (height, width, channels); palette images are expanded to RGB."""
    import numpy as np

    if not buf.startswith(PNG_MAGIC):
        raise ValueError("not a PNG (bad magic)")
    pos = len(PNG_MAGIC)
    width = height = None
    bit_depth = color_type = interlace = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(buf):
        (length,) = struct.unpack(">I", buf[pos:pos + 4])
        ctype = buf[pos + 4:pos + 8]
        data = buf[pos + 8:pos + 8 + length]
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != struct.unpack(
            ">I", buf[pos + 8 + length:pos + 12 + length]
        )[0]:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth} (only 8)")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if interlace:
        raise ValueError("interlaced (Adam7) PNG not supported")

    ch = _CHANNELS[color_type]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG IDAT payload has wrong length")

    out = np.zeros((height, stride), dtype=np.uint8)
    prev = bytearray(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
        prev = line

    pixels = out.reshape(height, width, ch)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        pixels = palette[pixels[:, :, 0]]
        ch = 3
    return {
        "width": int(width),
        "height": int(height),
        "color_type": int(color_type),
        "channels": int(ch),
        "mime": "image/png",
        "pixels": pixels,
    }


def encode_png(pixels) -> bytes:
    """Minimal PNG encoder (filter 0 scanlines) for gray/RGB/RGBA uint8
    arrays — deterministic fixture input for the decode tests."""
    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    height, width, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(height))
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def decode_wav(buf: bytes) -> dict:
    """Decode RIFF/WAVE via the stdlib ``wave`` module into ``{channels,
    sample_rate, sample_width, n_frames, duration_ms, mime, samples}``
    (``samples``: numpy int16/uint8 array, frames x channels)."""
    import numpy as np
    import wave

    with wave.open(io.BytesIO(buf), "rb") as w:
        channels = w.getnchannels()
        rate = w.getframerate()
        width = w.getsampwidth()
        n = w.getnframes()
        frames = w.readframes(n)
    dtype = {1: np.uint8, 2: np.int16}.get(width)
    if dtype is None:
        raise ValueError(f"unsupported WAV sample width {width}")
    samples = np.frombuffer(frames, dtype=dtype).reshape(-1, channels)
    return {
        "channels": int(channels),
        "sample_rate": int(rate),
        "sample_width": int(width),
        "n_frames": int(n),
        "duration_ms": int(round(1000.0 * n / rate)) if rate else 0,
        "mime": "audio/wav",
        "samples": samples,
    }


def encode_wav(samples, sample_rate: int = 8000) -> bytes:
    """Minimal WAV encoder (int16 mono/stereo) for decode-test fixtures."""
    import numpy as np
    import wave

    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    bio = io.BytesIO()
    with wave.open(bio, "wb") as w:
        w.setnchannels(arr.shape[1])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(arr.tobytes())
    return bio.getvalue()
