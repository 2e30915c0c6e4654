"""Baseline JPEG (JFIF) codec in pure Python/numpy — no external deps.

Companion to ``functions/png.py``: gives the multimodal decode stage a
second REAL image codec. Scope is baseline sequential DCT JPEG (the format
of the overwhelming majority of real-world JPEGs): 8-bit samples, Huffman
entropy coding (Annex K standard tables on encode; arbitrary tables on
decode), grayscale and YCbCr 4:4:4 / 4:2:2 / 4:2:0 sampling, restart
markers. Progressive, arithmetic-coded and 12-bit JPEGs raise
``NotImplementedError``.

JPEG is lossy by construction (DCT rounding even at the flattest
quantization), so tests assert bounded per-sample error, not bit equality;
the Ray-side value gates use the PNG codec where exactness is needed.

Encode pipeline: level-shift → (optional chroma subsample) → 8×8 FDCT →
quantize → zigzag → DC-differential + AC run-length → Huffman. Decode is
the inverse; the IDCT is a single numpy matmul per block batch.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- constants

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)

# ITU-T T.81 Annex K quantization tables (quality 50 reference)
QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)
QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# Annex K Huffman specs: (bits[1..16], values)
HT_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
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
    ],
)
HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
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
    ],
)

# orthonormal DCT-II basis: FDCT = C @ block @ C.T, IDCT = C.T @ coef @ C
_k = np.arange(8)
_C = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) * 0.5
_C[0] *= 1 / np.sqrt(2)


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * s + 50) // 100
    return np.clip(q, 1, 255).astype(np.int64)


# ------------------------------------------------------------------ huffman


def _build_codes(bits, values):
    """Canonical Huffman: symbol -> (code, length)."""
    out = {}
    code = 0
    i = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[values[i]] = (code, ln)
            code += 1
            i += 1
        code <<= 1
    return out


def _build_decoder(bits, values):
    """(code, length) -> symbol for decode."""
    out = {}
    code = 0
    i = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = values[i]
            code += 1
            i += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s
        return bytes(self.buf)


class _BitReader:
    """Reads the entropy-coded segment; un-stuffs 0xFF00, stops at markers
    (RSTn are consumed by the caller)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy data")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            else:
                raise ValueError("marker inside entropy segment")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_and_expect_rst(self, idx: int) -> None:
        """Byte-align and consume the expected restart marker."""
        self.nbits = 0
        d = self.data
        if d[self.pos] != 0xFF or d[self.pos + 1] != 0xD0 + (idx & 7):
            raise ValueError("missing restart marker")
        self.pos += 2

    def decode_symbol(self, table: dict) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("bad Huffman code")


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude category + offset bits for a signed coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    n = a.bit_length()
    bits = v if v > 0 else v + (1 << n) - 1
    return n, bits


def _extend(bits: int, n: int) -> int:
    if n == 0:
        return 0
    if bits < (1 << (n - 1)):
        return bits - (1 << n) + 1
    return bits


# ------------------------------------------------------------------- encode


def _blockify(plane: np.ndarray) -> np.ndarray:
    """(h, w) -> (n_blocks, 8, 8), edge-padded by replication."""
    h, w = plane.shape
    H, W = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")
    return (
        padded.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    ), H // 8, W // 8


def _encode_plane_blocks(blocks: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """FDCT + quantize a (n, 8, 8) float block stack -> (n, 64) zigzagged."""
    coef = _C @ blocks @ _C.T
    q = np.round(coef / qt).astype(np.int64)
    return q.reshape(-1, 64)[:, ZIGZAG]


def encode_jpeg(
    img: np.ndarray, quality: int = 90, subsample: str = "444"
) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 as baseline JFIF.

    ``subsample``: '444', '422' or '420' (chroma sampling; ignored for
    grayscale)."""
    img = np.asarray(img)
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("expected (h, w) or (h, w, 3) uint8")
    gray = img.ndim == 2
    if not gray and img.shape[2] != 3:
        raise ValueError("color images must be RGB (h, w, 3)")
    if subsample not in ("444", "422", "420"):
        raise ValueError("subsample must be '444', '422' or '420'")
    h, w = img.shape[:2]
    if h < 1 or w < 1:
        raise ValueError("empty image")
    qt_l = _quality_scale(QT_LUMA, quality)
    qt_c = _quality_scale(QT_CHROMA, quality)

    if gray:
        planes = [img.astype(np.float64) - 128.0]
        samp = [(1, 1)]
        qts = [qt_l]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        yy = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b
        sx, sy = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}[subsample]
        if sx > 1 or sy > 1:
            # pad to the sampling grid, then box-average subsample
            H = (h + sy - 1) // sy * sy
            W = (w + sx - 1) // sx * sx
            cb = np.pad(cb, ((0, H - h), (0, W - w)), mode="edge")
            cr = np.pad(cr, ((0, H - h), (0, W - w)), mode="edge")
            cb = cb.reshape(H // sy, sy, W // sx, sx).mean(axis=(1, 3))
            cr = cr.reshape(H // sy, sy, W // sx, sx).mean(axis=(1, 3))
        planes = [yy, cb, cr]
        samp = [(sx, sy), (1, 1), (1, 1)]
        qts = [qt_l, qt_c, qt_c]

    # quantized zigzag blocks per component, in MCU-interleave geometry
    comp_blocks = []
    comp_geom = []
    for p, q in zip(planes, qts):
        blocks, bh, bw = _blockify(p)
        comp_blocks.append(_encode_plane_blocks(blocks, q))
        comp_geom.append((bh, bw))
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    dc_codes = [_build_codes(*HT_DC_LUMA)] + (
        [] if gray else [_build_codes(*HT_DC_CHROMA)] * 2
    )
    ac_codes = [_build_codes(*HT_AC_LUMA)] + (
        [] if gray else [_build_codes(*HT_AC_CHROMA)] * 2
    )

    bw_ = _BitWriter()
    prev_dc = [0] * len(planes)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (sx, sy) in enumerate(samp):
                bh, bwid = comp_geom[ci]
                for by in range(sy):
                    for bx in range(sx):
                        row = min(my * sy + by, bh - 1)
                        col = min(mx * sx + bx, bwid - 1)
                        zz = comp_blocks[ci][row * bwid + col]
                        diff = int(zz[0]) - prev_dc[ci]
                        prev_dc[ci] = int(zz[0])
                        n, bits = _magnitude(diff)
                        c, ln = dc_codes[ci][n]
                        bw_.write(c, ln)
                        if n:
                            bw_.write(bits, n)
                        run = 0
                        last_nz = 0
                        nz = np.nonzero(zz[1:])[0]
                        last_nz = nz[-1] + 1 if len(nz) else 0
                        for k in range(1, last_nz + 1):
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                c, ln = ac_codes[ci][0xF0]  # ZRL
                                bw_.write(c, ln)
                                run -= 16
                            n, bits = _magnitude(v)
                            c, ln = ac_codes[ci][(run << 4) | n]
                            bw_.write(c, ln)
                            bw_.write(bits, n)
                            run = 0
                        if last_nz < 63:
                            c, ln = ac_codes[ci][0x00]  # EOB
                            bw_.write(c, ln)
    entropy = bw_.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = [b"\xff\xd8"]  # SOI
    out.append(
        seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    )
    out.append(seg(0xFFDB, b"\x00" + bytes(qt_l.reshape(64)[ZIGZAG].astype(np.uint8))))
    if not gray:
        out.append(
            seg(0xFFDB, b"\x01" + bytes(qt_c.reshape(64)[ZIGZAG].astype(np.uint8)))
        )
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sx, sy = samp[ci]
        sof += bytes([ci + 1, (sx << 4) | sy, 0 if ci == 0 else 1])
    out.append(seg(0xFFC0, sof))

    def dht(cls: int, tid: int, spec) -> bytes:
        bits, values = spec
        return seg(
            0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(values)
        )

    out.append(dht(0, 0, HT_DC_LUMA))
    out.append(dht(1, 0, HT_AC_LUMA))
    if not gray:
        out.append(dht(0, 1, HT_DC_CHROMA))
        out.append(dht(1, 1, HT_AC_CHROMA))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out.append(seg(0xFFDA, sos))
    out.append(entropy)
    out.append(b"\xff\xd9")  # EOI
    return b"".join(out)


# ------------------------------------------------------------------- decode


def decode_jpeg(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode baseline JFIF bytes -> (uint8 array, metadata dict).

    Returns (h, w) for grayscale, (h, w, 3) RGB otherwise. Supports
    arbitrary Huffman/quant tables, 4:4:4 / 4:2:2 / 4:2:0 sampling and
    restart intervals; raises NotImplementedError on progressive /
    arithmetic / 12-bit streams."""
    data = bytes(data)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    try:
        return _decode_jpeg_inner(data)
    except (IndexError, struct.error, KeyError) as e:
        # KeyError: SOS/SOF referencing an undeclared quant/Huffman table
        raise ValueError(f"truncated or corrupt JPEG: {e}") from e


def _decode_jpeg_inner(data: bytes) -> tuple[np.ndarray, dict]:
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = None
    h = w = None
    restart = 0
    scan = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad a marker
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (ln,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + ln]
        pos += ln
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq_, tq = body[i] >> 4, body[i] & 0xF
                if pq_ != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.frombuffer(body[i + 1 : i + 65], np.uint8).astype(np.int64)
                qts[tq] = tbl[UNZIGZAG].reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                values = list(body[i + 17 : i + 17 + nv])
                huff[(cls, tid)] = _build_decoder(bits, values)
                i += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec = body[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG")
            h, w = struct.unpack(">HH", body[1:5])
            nc = body[5]
            comps = []
            for ci in range(nc):
                cid, sampb, tq = body[6 + ci * 3 : 9 + ci * 3]
                comps.append(
                    {"id": cid, "sx": sampb >> 4, "sy": sampb & 0xF, "tq": tq}
                )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("progressive/extended JPEG")
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", body)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for si in range(ns):
                cid, tb = body[1 + si * 2 : 3 + si * 2]
                scan.append({"id": cid, "dc": tb >> 4, "ac": tb & 0xF})
            pos_entropy = pos
            break
    if comps is None or scan is None:
        raise ValueError("missing SOF or SOS")

    hmax = max(c["sx"] for c in comps)
    vmax = max(c["sy"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c["bw"] = mcux * c["sx"]
        c["bh"] = mcuy * c["sy"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), np.int64)
        s = next(s for s in scan if s["id"] == c["id"])
        c["hdc"] = huff[(0, s["dc"])]
        c["hac"] = huff[(1, s["ac"])]

    br = _BitReader(data, pos_entropy)
    prev_dc = {c["id"]: 0 for c in comps}
    mcu_count = 0
    rst_idx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                br.align_and_expect_rst(rst_idx)
                rst_idx = (rst_idx + 1) & 7
                prev_dc = {c["id"]: 0 for c in comps}
            mcu_count += 1
            for c in comps:
                for by in range(c["sy"]):
                    for bx in range(c["sx"]):
                        zz = np.zeros(64, np.int64)
                        t = br.decode_symbol(c["hdc"])
                        diff = _extend(br.bits(t), t) if t else 0
                        prev_dc[c["id"]] += diff
                        zz[0] = prev_dc[c["id"]]
                        k = 1
                        while k < 64:
                            rs = br.decode_symbol(c["hac"])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(br.bits(s), s)
                            k += 1
                        row = my * c["sy"] + by
                        col = mx * c["sx"] + bx
                        c["coef"][row * c["bw"] + col] = zz

    planes = []
    for c in comps:
        qt = qts[c["tq"]]
        coef = c["coef"][:, UNZIGZAG].reshape(-1, 8, 8).astype(np.float64) * qt
        pix = _C.T @ coef @ _C + 128.0
        bh, bwid = c["bh"], c["bw"]
        plane = (
            pix.reshape(bh, bwid, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bwid * 8)
        )
        # upsample to full grid (nearest) and crop
        ry, rx = vmax // c["sy"], hmax // c["sx"]
        if ry > 1:
            plane = np.repeat(plane, ry, axis=0)
        if rx > 1:
            plane = np.repeat(plane, rx, axis=1)
        planes.append(plane[:h, :w])
    meta = {
        "width": int(w),
        "height": int(h),
        "channels": len(planes),
        "bit_depth": 8,
    }
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8), meta
    # planes carry the +128 level shift; chroma is 128-centered per JFIF
    yy, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = yy + 1.402 * cr
    g = yy - 0.344136 * cb - 0.714136 * cr
    b = yy + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8), meta
