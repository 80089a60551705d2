"""Pure-stdlib baseline JPEG codec (decoder + test encoder).

The decode plug point in :mod:`graphrag_rs_spark.operators.multimodal`
needs a real kernel for the dominant real-corpus image format without any
external codec library (this container has no PIL/libjpeg).  This module
implements the baseline-sequential (SOF0) subset of ITU-T T.81: DQT/DHT/
SOF0/SOS/DRI parsing, byte-stuffed Huffman entropy decode with restart
markers, dequantize + inverse zigzag, 8×8 IDCT as two numpy matmuls
against the orthonormal DCT-II basis, sampling-factor chroma upsample
(4:4:4 / 4:2:2 / 4:2:0), and BT.601 YCbCr→RGB.

``encode_jpeg`` is the matching 4:4:4 baseline encoder (Annex K quant
tables scaled by the libjpeg quality curve, Annex K standard Huffman
tables) used by tests to generate real JPEG bytes in-container; it is a
correct general-purpose encoder, just not an optimizing one.

Progressive (SOF2), arithmetic coding, and 12-bit precision are out of
scope and raise ``ValueError`` at the same plug point.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MAGIC = b"\xff\xd8\xff"

# --- zigzag order (T.81 Figure A.6) ---------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)
UNZIGZAG = np.argsort(ZIGZAG)

# --- orthonormal DCT-II basis: IDCT(B) = A.T @ B @ A ----------------------

def _dct_basis() -> np.ndarray:
    a = np.zeros((8, 8))
    for k in range(8):
        c = np.sqrt(0.125) if k == 0 else 0.5
        for n in range(8):
            a[k, n] = c * np.cos((2 * n + 1) * k * np.pi / 16.0)
    return a


_A = _dct_basis()

# --- Annex K tables (T.81 §K.1, K.3) --------------------------------------

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# standard Huffman tables: (bits[1..16], values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


# --- Huffman table machinery ----------------------------------------------

def _build_decode_table(bits: list[int], vals: list[int]) -> dict:
    """(code_length, code) → value, canonical code assignment (T.81 C.2)."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], vals: list[int]) -> dict:
    return {
        v: (length, code)
        for (length, code), v in _build_decode_table(bits, vals).items()
    }


class _BitReader:
    """Entropy-segment bit reader: 0xFF00 unstuffing, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0
        self.marker = None  # set when a non-RST marker terminates the scan

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.bitbuf = (self.bitbuf << 8) | 0
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:  # stuffed 0xFF data byte
                    self.pos += 2
                    self.bitbuf = (self.bitbuf << 8) | 0xFF
                    self.nbits += 8
                    continue
                # a real marker: pad with zero bits, record it
                self.marker = nxt
                self.bitbuf = (self.bitbuf << 8) | 0
                self.nbits += 8
                continue
            self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table: dict) -> int:
        length, code = 0, 0
        for _ in range(16):
            code = (code << 1) | self.read_bit()
            length += 1
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("invalid JPEG: huffman code not in table")

    def restart(self, data: bytes) -> None:
        """Align past an RSTn marker and reset bit state."""
        # drop buffered bits, find the RST marker bytes
        self.bitbuf = 0
        self.nbits = 0
        self.marker = None
        while self.pos + 1 < len(data):
            if data[self.pos] == 0xFF and 0xD0 <= data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("invalid JPEG: expected restart marker")


def _extend(v: int, n: int) -> int:
    """T.81 F.2.2.1 EXTEND: map received magnitude bits to signed value."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


# --- decoder ---------------------------------------------------------------

def decode_jpeg(buf: bytes) -> dict:
    """Decode baseline-sequential JPEG → ``{"width", "height", "pixels"}``
    with ``pixels`` a ``(H, W, 3)`` uint8 RGB array (grayscale replicated).

    Raises ``ValueError`` on non-baseline frames (progressive SOF2,
    arithmetic coding) and on malformed streams — the multimodal
    operators' ``on_error="skip"`` isolation treats any raise as a
    per-payload failure.
    """
    if not buf.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    n = len(buf)

    while pos + 4 <= n:
        if buf[pos] != 0xFF:
            raise ValueError("invalid JPEG: expected marker")
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI before SOS
            raise ValueError("invalid JPEG: EOI before scan")
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue  # parameterless
        seglen = struct.unpack(">H", buf[pos:pos + 2])[0]
        seg = buf[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    q = np.frombuffer(seg[p:p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                else:
                    q = np.frombuffer(seg[p:p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                qtables[tq] = q  # zigzag order
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17:p + 17 + nv])
                htables[(tc, th)] = _build_decode_table(bits, vals)
                p += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/SOF1 baseline
            prec, h, w, nc = seg[0], struct.unpack(">H", seg[1:3])[0], \
                struct.unpack(">H", seg[3:5])[0], seg[5]
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                comps.append({
                    "id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq,
                })
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG frame type SOF{marker - 0xC0} "
                "(only baseline sequential is implemented)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[0:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows the header
            if frame is None:
                raise ValueError("invalid JPEG: SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tt >> 4, tt & 0x0F))
            data_start = pos + seglen
            return _decode_scan(
                buf, data_start, frame, scan, qtables, htables,
                restart_interval,
            )
        pos += seglen
    raise ValueError("invalid JPEG: no scan found")


def _decode_scan(buf, pos, frame, scan, qtables, htables, restart_interval):
    w, h = frame["w"], frame["h"]
    comps = [s[0] for s in scan]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # per-component plane buffers at component resolution
    planes = []
    for c in comps:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes.append(np.zeros((ph, pw), dtype=np.float64))

    reader = _BitReader(buf, pos)
    pred = [0] * len(comps)
    dq = []
    for c in comps:
        if c["tq"] not in qtables:
            raise ValueError("invalid JPEG: missing quant table")
        dq.append(qtables[c["tq"]])

    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                reader.restart(buf)
                pred = [0] * len(comps)
            for ci, (c, td, ta) in enumerate(scan):
                dc_tab = htables.get((0, td))
                ac_tab = htables.get((1, ta))
                if dc_tab is None or ac_tab is None:
                    raise ValueError("invalid JPEG: missing huffman table")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        t = reader.decode_huff(dc_tab)
                        diff = _extend(reader.receive(t), t)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_huff(ac_tab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError(
                                    "invalid JPEG: AC index overflow"
                                )
                            zz[k] = _extend(reader.receive(s), s)
                            k += 1
                        block = (zz * dq[ci])[UNZIGZAG].reshape(8, 8)
                        px = _A.T @ block @ _A + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px
            mcu_count += 1

    # upsample to full resolution and crop
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])

    if len(full) == 1:
        y = np.clip(full[0], 0, 255)
        rgb = np.stack([y, y, y], axis=2)
    elif len(full) == 3:
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.clip(np.stack([r, g, b], axis=2), 0, 255)
    else:
        raise ValueError(f"unsupported JPEG component count {len(full)}")
    return {"width": w, "height": h, "pixels": rgb.astype(np.uint8)}


# --- encoder (baseline 4:4:4, for in-container test-vector generation) ----

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s (T.81 F.1.2.3)


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality curve: 50 → table as-is, 100 → all-1s."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = (q * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, value-bits) for a signed coefficient (T.81 F.1.2.1)."""
    cat = int(v).bit_length() if v >= 0 else int(-v).bit_length()
    bits = v if v >= 0 else v + (1 << cat) - 1
    return cat, bits


_SUBSAMPLING = {"4:4:4": (1, 1), "4:2:2": (2, 1), "4:2:0": (2, 2)}


def _box_down(plane: np.ndarray, fx: int, fy: int) -> np.ndarray:
    """Box-average downsample by (fx, fy), edge-padding odd dimensions."""
    if fx == 1 and fy == 1:
        return plane
    h, w = plane.shape
    ph, pw = -(-h // fy) * fy, -(-w // fx) * fx
    p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))


def encode_jpeg(
    pixels,
    quality: int = 90,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as baseline-sequential JPEG
    with interleaved MCUs at the requested chroma subsampling
    (``4:4:4`` / ``4:2:2`` / ``4:2:0``). ``restart_interval`` > 0 emits a
    DRI segment and RSTn markers every that-many MCUs (exercises the
    decoder's restart/resync path, and is what real encoders emit for
    error resilience)."""
    if subsampling not in _SUBSAMPLING:
        raise ValueError(f"unknown subsampling {subsampling!r}")
    hs, vs = _SUBSAMPLING[subsampling]
    px = np.asarray(pixels, dtype=np.float64)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_jpeg expects (H, W, 3) RGB")
    h, w = px.shape[:2]
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    qy = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)

    enc_dc = [_build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS),
              _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    enc_ac = [_build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS),
              _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS)]

    # component layout: (plane, h_samp, v_samp, table_sel)
    comps = [
        (y, hs, vs, 0),
        (_box_down(cb, hs, vs), 1, 1, 1),
        (_box_down(cr, hs, vs), 1, 1, 1),
    ]
    mcux = -(-w // (8 * hs))
    mcuy = -(-h // (8 * vs))
    padded = []
    for plane, ch, cv, _sel in comps:
        ph_c, pw_c = mcuy * 8 * cv, mcux * 8 * ch
        hp, wp = plane.shape
        padded.append(np.pad(
            plane, ((0, ph_c - hp), (0, pw_c - wp)), mode="edge"
        ))

    writer = _BitWriter()
    pred = [0, 0, 0]

    def emit_block(block: np.ndarray, sel: int, ci: int) -> None:
        coef = _A @ (block - 128.0) @ _A.T
        # module tables are natural (row-major) order; DQT below emits
        # their zigzag permutation
        qnat = (qy if sel == 0 else qc).reshape(8, 8)
        zz = np.round(coef / qnat).astype(np.int32).ravel()[ZIGZAG]
        dc_t, ac_t = enc_dc[sel], enc_ac[sel]
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        cat, bits = _magnitude(diff)
        ln, code = dc_t[cat]
        writer.write(code, ln)
        if cat:
            writer.write(bits, cat)
        run = 0
        nz = np.nonzero(zz[1:])[0]
        last_nz = (nz[-1] + 1) if nz.size else 0
        for k in range(1, last_nz + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, code = ac_t[0xF0]  # ZRL
                writer.write(code, ln)
                run -= 16
            cat, bits = _magnitude(v)
            ln, code = ac_t[(run << 4) | cat]
            writer.write(code, ln)
            writer.write(bits, cat)
            run = 0
        if last_nz < 63:
            ln, code = ac_t[0x00]  # EOB
            writer.write(code, ln)

    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                writer.flush()
                writer.out += bytes([
                    0xFF, 0xD0 + ((mcu_count // restart_interval - 1) % 8)
                ])
                pred[:] = [0, 0, 0]
            for ci, (_plane, ch, cv, sel) in enumerate(comps):
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        emit_block(
                            padded[ci][y0:y0 + 8, x0:x0 + 8], sel, ci
                        )
            mcu_count += 1
    writer.flush()

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tq, tab in ((0, qy), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + \
            bytes(int(v) for v in tab.ravel()[ZIGZAG])
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xc0" + struct.pack(">H", 8 + 3 * 3) + b"\x08" + \
        struct.pack(">HH", h, w) + b"\x03"
    for cid, samp, tq in (
        (1, (hs << 4) | vs, 0), (2, 0x11, 1), (3, 0x11, 1),
    ):
        out += bytes([cid, samp, tq])
    for tc, th, bits, vals in (
        (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
        (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
        (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + \
            bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * 3) + b"\x03"
    for cid, tt in ((1, 0x00), (2, 0x11), (3, 0x11)):
        out += bytes([cid, tt])
    out += b"\x00\x3f\x00"
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)
