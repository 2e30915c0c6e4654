"""Baseline JPEG codec (functions/jpeg.py): bounded-error roundtrips across
quality/subsampling/shape, marker-structure checks, and failure modes.
JPEG is lossy by construction, so assertions bound the error rather than
demand bit equality (the PNG codec covers the exact path)."""

import numpy as np
import pytest

from data_exchange_routing_ray.functions.jpeg import decode_jpeg, encode_jpeg


def _grad(h, w, c=None):
    y, x = np.mgrid[0:h, 0:w]
    base = (x * 3 + y * 2) % 256
    if c is None:
        return base.astype(np.uint8)
    return np.stack([(base + 30 * i) % 256 for i in range(c)], axis=2).astype(
        np.uint8
    )


@pytest.mark.parametrize("shape", [(8, 8), (16, 16), (17, 19), (24, 33), (1, 1)])
def test_gray_roundtrip_tight(shape):
    img = _grad(*shape)
    dec, meta = decode_jpeg(encode_jpeg(img, quality=95))
    assert dec.shape == img.shape
    assert meta["width"] == shape[1] and meta["height"] == shape[0]
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


@pytest.mark.parametrize("sub", ["444", "422", "420"])
def test_rgb_roundtrip_bounded(sub):
    y, x = np.mgrid[0:32, 0:48]
    img = np.stack(
        [(x * 5) % 256, (y * 7) % 256, ((x + y) * 3) % 256], axis=2
    ).astype(np.uint8)
    dec, meta = decode_jpeg(encode_jpeg(img, quality=95, subsample=sub))
    assert dec.shape == img.shape and meta["channels"] == 3
    d = np.abs(dec.astype(int) - img.astype(int))
    assert d.mean() <= 3.0
    assert d.max() <= 32  # subsampling smears chroma edges; bounded, not exact


def test_constant_color_exact():
    img = np.full((8, 8, 3), [200, 80, 40], np.uint8)
    dec, _ = decode_jpeg(encode_jpeg(img, quality=95))
    assert np.array_equal(dec, img)


def test_quality_tradeoff_monotone():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (24, 24), np.uint8)
    sizes, errs = [], []
    for q in (30, 60, 95):
        data = encode_jpeg(img, quality=q)
        dec, _ = decode_jpeg(data)
        sizes.append(len(data))
        errs.append(np.abs(dec.astype(int) - img.astype(int)).mean())
    assert sizes[0] < sizes[2]  # higher quality -> bigger file
    assert errs[0] > errs[2]  # higher quality -> lower error


def test_marker_structure():
    data = encode_jpeg(_grad(8, 8, 3), quality=80)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert b"JFIF\x00" in data[:32]


def test_bad_inputs_raise():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(encode_jpeg(_grad(8, 8))[:30])  # truncated
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4), np.float64))  # wrong dtype
    with pytest.raises(NotImplementedError):
        # forge a progressive SOF2 marker
        d = bytearray(encode_jpeg(_grad(8, 8)))
        i = d.find(b"\xff\xc0")
        d[i + 1] = 0xC2
        decode_jpeg(bytes(d))


def test_decode_media_sniffs_png_and_jpeg(ray_session):
    import pyarrow as pa

    from data_exchange_routing_ray.functions.multimodal import DecodeMedia
    from data_exchange_routing_ray.functions.png import encode_png

    img = _grad(20, 24)
    batch = pa.table(
        {
            "media_id": pa.array([0, 1], pa.int64()),
            "payload": pa.array(
                [encode_png(img), encode_jpeg(img, quality=95)], pa.binary()
            ),
        }
    )
    out = DecodeMedia(decode="real")(batch).to_pandas()
    assert list(out["width"]) == [24, 24]
    assert list(out["height"]) == [20, 20]
    assert list(out["channels"]) == [1, 1]
    assert out["error"].isna().all()
    # PNG is exact; JPEG sum within h*w*2 of exact
    exact = int(img.astype(np.int64).sum())
    assert out.loc[0, "pixel_sum"] == exact
    assert abs(out.loc[1, "pixel_sum"] - exact) <= 20 * 24 * 2


def test_missing_table_and_fill_bytes():
    import struct as _s

    data = encode_jpeg(_grad(8, 8), quality=80)
    # SOF referencing an undeclared quant table -> ValueError, not KeyError
    i = data.find(b"\xff\xdb")
    (ln,) = _s.unpack(">H", data[i + 2 : i + 4])
    stripped = data[:i] + data[i + 2 + ln :]
    with pytest.raises(ValueError, match="corrupt"):
        decode_jpeg(stripped)
    # T.81 B.1.1.2 fill bytes: 0xFF padding before a marker is legal
    j = stripped_pos = data.find(b"\xff\xc0")
    padded = data[:j] + b"\xff\xff\xff" + data[j:]
    dec, _ = decode_jpeg(padded)
    assert dec.shape == (8, 8)
