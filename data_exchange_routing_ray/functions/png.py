"""Real PNG codec in pure Python/numpy (stdlib zlib), no external deps.

The container ships no image library, but PNG needs none: the format is
zlib-compressed filtered scanlines in CRC'd chunks (RFC 2083), all of which
the stdlib + numpy cover. This gives the multimodal decode stage
(``functions/multimodal.py``) a REAL codec behind its actor boundary —
``DecodeMedia(decode="real")`` decodes genuine PNG bytes — while Pillow, when
importable, is used as the fast path.

Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha), 6 (RGBA), non-interlaced, all five filter types. Filters
0 (None), 1 (Sub, via per-phase cumsum) and 2 (Up) unfilter fully
vectorized; 3 (Average) and 4 (Paeth) fall back to a per-byte scan — their
reconstruction is inherently sequential in both axes. The encoder applies
any single filter type vectorized (the predictor reads ORIGINAL neighbor
bytes, so encoding never has the sequential dependency decoding has).

The reference treats payloads as opaque blobs (``IBlobService.kt:8-13``);
this codec is addendum scope for the training-data pipeline.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel
_SAMPLES = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_COLOR_OF_CHANNELS = {1: 0, 2: 4, 3: 2, 4: 6}


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(
    img: np.ndarray, filter_type: int = 0, compress_level: int = 6
) -> bytes:
    """Encode an (h, w) or (h, w, {1,2,3,4}) uint8 array as PNG bytes.

    ``filter_type`` applies one filter to every scanline (0=None, 1=Sub,
    2=Up, 3=Average, 4=Paeth) — all vectorized, since the encoder's
    predictors read original (unfiltered) neighbor bytes.
    """
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    if img.ndim != 3 or img.shape[2] not in _COLOR_OF_CHANNELS:
        raise ValueError("expected (h, w) or (h, w, {1,2,3,4}) uint8 array")
    h, w, ch = img.shape
    if h < 1 or w < 1:
        raise ValueError("empty image")
    color = _COLOR_OF_CHANNELS[ch]
    bpp = ch
    rows = img.reshape(h, w * ch).astype(np.int16)
    left = np.zeros_like(rows)
    left[:, bpp:] = rows[:, :-bpp]
    up = np.zeros_like(rows)
    up[1:] = rows[:-1]
    upleft = np.zeros_like(rows)
    upleft[1:, bpp:] = rows[:-1, :-bpp]
    if filter_type == 0:
        filt = rows
    elif filter_type == 1:
        filt = rows - left
    elif filter_type == 2:
        filt = rows - up
    elif filter_type == 3:
        filt = rows - ((left + up) >> 1)
    elif filter_type == 4:
        p = left + up - upleft
        pa_ = np.abs(p - left)
        pb = np.abs(p - up)
        pc = np.abs(p - upleft)
        pred = np.where(
            (pa_ <= pb) & (pa_ <= pc), left, np.where(pb <= pc, up, upleft)
        )
        filt = rows - pred
    else:
        raise ValueError(f"bad filter type {filter_type}")
    raw = np.empty((h, w * ch + 1), np.uint8)
    raw[:, 0] = filter_type
    raw[:, 1:] = (filt & 0xFF).astype(np.uint8)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw.tobytes(), compress_level))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode PNG bytes to (uint8 array, metadata dict).

    Returns (h, w) for grayscale, (h, w, c) otherwise; palette images are
    expanded to RGB. Metadata: width, height, channels (of the RETURNED
    array), bit_depth, color_type. Validates the signature and every
    chunk CRC; raises ValueError on corruption, NotImplementedError on
    bit depths != 8 or interlacing.
    """
    if bytes(data[:8]) != _SIG:
        raise ValueError("not a PNG (bad signature)")
    try:
        return _decode_png_inner(data)
    except (zlib.error, struct.error, IndexError) as e:
        # corrupt streams surface as ONE exception type at the codec
        # boundary so callers (the dead-letter stage) need a single catch
        raise ValueError(f"corrupt PNG: {e}") from e


def _decode_png_inner(data: bytes) -> tuple[np.ndarray, dict]:
    pos, n = 8, len(data)
    w = h = color = None
    idat: list[bytes] = []
    palette = None
    trns = None
    while pos + 12 <= n:
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = bytes(data[pos + 4 : pos + 8])
        body = bytes(data[pos + 8 : pos + 8 + length])
        if pos + 12 + length > n:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype.decode('latin1')} chunk")
        pos += 12 + length
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise NotImplementedError(f"bit depth {depth} (only 8)")
            if interlace:
                raise NotImplementedError("interlaced PNG")
            if comp or filt:
                raise ValueError("bad IHDR compression/filter method")
            if color not in _SAMPLES:
                raise ValueError(f"bad color type {color}")
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(body, np.uint8)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("missing IHDR or IDAT")
    ch = _SAMPLES[color]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("decompressed size mismatch")
    arr = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    ftypes = arr[:, 0]
    lines = arr[:, 1:]
    bpp = ch
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    # vectorize whole runs of same-filter rows where the filter allows it
    y = 0
    while y < h:
        f = int(ftypes[y])
        if f == 0:
            # run of filter-0 rows copies in one slice
            e = y
            while e < h and ftypes[e] == 0:
                e += 1
            out[y:e] = lines[y:e]
            prev = out[e - 1].astype(np.int32)
            y = e
            continue
        cur = lines[y].astype(np.int32)
        if f == 2:  # Up
            rec = (cur + prev) & 0xFF
        elif f == 1:  # Sub: per-phase cumsum mod 256
            rec = (
                np.cumsum(cur.reshape(w, bpp), axis=0, dtype=np.int64) & 0xFF
            ).reshape(stride)
        elif f == 3:  # Average — sequential in x
            rec = cur
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth — sequential in x
            rec = cur
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                da, db, dc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (da <= db and da <= dc) else (b if db <= dc else c)
                rec[x] = (rec[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad scanline filter {f}")
        out[y] = rec.astype(np.uint8)
        prev = rec.astype(np.int32)
        y += 1
    img = out.reshape(h, w, ch)
    if color == 3:
        if palette is None:
            raise ValueError("palette image without PLTE")
        idx = img[:, :, 0]
        if idx.max(initial=0) >= len(palette):
            raise ValueError("palette index out of range")
        if trns is not None:
            alpha = np.full(len(palette), 255, np.uint8)
            alpha[: len(trns)] = trns
            img = np.dstack([palette[idx], alpha[idx]])
            ch = 4
        else:
            img = palette[idx]
            ch = 3
    if ch == 1:
        img = img[:, :, 0]
    meta = {
        "width": int(w),
        "height": int(h),
        "channels": int(ch),
        "bit_depth": 8,
        "color_type": int(color),
    }
    return np.ascontiguousarray(img), meta
