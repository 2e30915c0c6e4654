"""Pure-Python PNG codec (functions/png.py): roundtrip across all filter
types and color types, palette expansion, tRNS alpha, and corruption
detection. No Ray needed — the codec is plain numpy/zlib."""

import struct
import zlib

import numpy as np
import pytest

from data_exchange_routing_ray.functions.png import (
    _SIG,
    _chunk,
    decode_png,
    encode_png,
)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize(
    "shape", [(1, 1), (7, 5), (32, 48), (13, 17, 3), (9, 4, 4), (5, 5, 2)]
)
def test_roundtrip_all_filters_and_colortypes(shape, filter_type):
    rng = np.random.default_rng(hash((shape, filter_type)) % 2**32)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    dec, meta = decode_png(encode_png(img, filter_type=filter_type))
    assert np.array_equal(dec, img)
    assert meta["width"] == shape[1] and meta["height"] == shape[0]
    assert meta["channels"] == (shape[2] if len(shape) == 3 else 1)


def test_mixed_filters_across_rows():
    # hand-build an IDAT whose rows use different filters; the encoder's
    # forward filters (vectorized) define the expected filtered bytes
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    per_row = []
    for ft in (0, 1, 2, 3, 4):
        # encode the full image with filter ft, steal that row's scanline
        full = encode_png(img, filter_type=ft, compress_level=0)
        # decode path revalidates; easier: decompress and slice
        pos = 8
        idat = b""
        while pos < len(full):
            (ln,) = struct.unpack(">I", full[pos : pos + 4])
            ct = full[pos + 4 : pos + 8]
            if ct == b"IDAT":
                idat += full[pos + 8 : pos + 8 + ln]
            pos += 12 + ln
        raw = np.frombuffer(zlib.decompress(idat), np.uint8).reshape(5, 19)
        per_row.append(raw[len(per_row)])
    mixed = np.stack(per_row)
    data = (
        _SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 5, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(mixed.tobytes()))
        + _chunk(b"IEND", b"")
    )
    dec, _ = decode_png(data)
    assert np.array_equal(dec, img)


def test_palette_and_trns():
    rng = np.random.default_rng(3)
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]], np.uint8)
    idx = rng.integers(0, 4, size=(6, 7), dtype=np.uint8)
    raw = np.hstack([np.zeros((6, 1), np.uint8), idx])
    base = _SIG + _chunk(b"IHDR", struct.pack(">IIBBBBB", 7, 6, 8, 3, 0, 0, 0))
    tail = _chunk(b"IDAT", zlib.compress(raw.tobytes())) + _chunk(b"IEND", b"")
    dec, meta = decode_png(base + _chunk(b"PLTE", pal.tobytes()) + tail)
    assert meta["channels"] == 3 and np.array_equal(dec, pal[idx])
    trns = bytes([255, 128, 0, 255])
    dec4, meta4 = decode_png(
        base + _chunk(b"PLTE", pal.tobytes()) + _chunk(b"tRNS", trns) + tail
    )
    assert meta4["channels"] == 4
    assert np.array_equal(dec4[:, :, :3], pal[idx])
    assert np.array_equal(dec4[:, :, 3], np.frombuffer(trns, np.uint8)[idx])


def test_corruption_and_bad_inputs_raise():
    good = bytearray(encode_png(np.zeros((4, 4), np.uint8)))
    good[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(good))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF not a png at all")
    with pytest.raises(ValueError):
        decode_png(encode_png(np.zeros((4, 4), np.uint8))[:20])  # truncated


def test_internal_codec_errors_surface_as_valueerror():
    # valid CRC but garbage deflate stream -> zlib.error must not escape
    raw = b"not deflate data"
    bad = (
        _SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0))
        + _chunk(b"IDAT", raw)
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="corrupt PNG"):
        decode_png(bad)
    # 4-byte IHDR body -> struct.error must not escape
    bad2 = _SIG + _chunk(b"IHDR", b"\x00\x00\x00\x04") + _chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        decode_png(bad2)
