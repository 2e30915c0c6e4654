"""WAV (RIFF/PCM) codec + audio features (functions/wav.py): exact
roundtrips (PCM is lossless), structure validation, feature sanity."""

import struct

import numpy as np
import pytest

from data_exchange_routing_ray.functions.wav import (
    audio_features,
    decode_wav,
    encode_wav,
)


def test_mono_roundtrip_exact():
    rng = np.random.default_rng(0)
    x = rng.integers(-32768, 32768, 4321, dtype=np.int16)
    arr, meta = decode_wav(encode_wav(x, sample_rate=22050))
    assert np.array_equal(arr, x)
    assert meta == {
        "sample_rate": 22050, "channels": 1, "n_samples": 4321, "bit_depth": 16,
    }


def test_stereo_roundtrip_exact():
    rng = np.random.default_rng(1)
    x = rng.integers(-32768, 32768, (777, 2), dtype=np.int16)
    arr, meta = decode_wav(encode_wav(x, sample_rate=44100))
    assert np.array_equal(arr, x)
    assert meta["channels"] == 2 and meta["n_samples"] == 777


def test_extra_chunks_skipped():
    # real-world WAVs carry LIST/INFO chunks before data; decoder must skip
    x = np.arange(100, dtype=np.int16)
    data = bytearray(encode_wav(x, 8000))
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd len + pad
    i = data.find(b"data")
    data[i:i] = extra
    data[4:8] = struct.pack("<I", struct.unpack("<I", data[4:8])[0] + len(extra))
    arr, meta = decode_wav(bytes(data))
    assert np.array_equal(arr, x)


def test_bad_inputs_raise():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"\x89PNG definitely not wav")
    good = encode_wav(np.zeros(64, np.int16))
    with pytest.raises(ValueError):
        decode_wav(good[:30])
    bad_fmt = bytearray(good)
    i = bad_fmt.find(b"fmt ")
    bad_fmt[i + 8] = 3  # format tag 3 = IEEE float
    with pytest.raises(NotImplementedError, match="non-PCM"):
        decode_wav(bytes(bad_fmt))
    with pytest.raises(ValueError):
        encode_wav(np.zeros(10, np.float32))


def test_audio_features_sanity():
    sr = 16000
    t = np.arange(sr, dtype=np.float64)
    sine = (10000 * np.sin(2 * np.pi * 440 * t / sr)).astype(np.int16)
    f = audio_features(sine, sr)
    assert abs(f["rms"] - 10000 / np.sqrt(2)) < 100
    # a 440 Hz sine crosses zero ~880 times/sec
    assert abs(f["zero_cross_rate"] * sr - 880) < 10
    assert abs(f["spectral_centroid_hz"] - 440) < 30
    assert f["clip_fraction"] == 0.0
    loud = np.full(1000, 32767, np.int16)
    assert audio_features(loud, sr)["clip_fraction"] == 1.0
    silent = audio_features(np.zeros(0, np.int16), sr)
    assert silent["rms"] == 0.0


def test_decode_audio_stage(ray_session):
    import pyarrow as pa

    from data_exchange_routing_ray.functions.multimodal import (
        DecodeAudio,
        synthesize_wav_batch,
    )

    ids = pa.table({"doc_id": pa.array(list(range(9)), pa.int64())})
    media = synthesize_wav_batch(ids)
    assert all(p[:4] == b"RIFF" for p in media["payload"].to_pylist())
    out = DecodeAudio()(media).to_pandas()
    for i in range(9):
        n = 1000 + i % 3000
        t = np.arange(n, dtype=np.int64)
        expect = int(np.abs(((i + t) % 256 - 128) * 100).sum())
        assert out.loc[i, "n_samples"] == n
        assert out.loc[i, "sample_rate"] == 8000 + (i % 3) * 4000
        assert out.loc[i, "pcm_abs_sum"] == expect
        assert out.loc[i, "rms"] > 0
    assert out["error"].isna().all()
    # corrupt payload dead-letters, stage survives
    bad = media.set_column(
        media.schema.get_field_index("payload"), "payload",
        pa.array([b"MP3 junk"] + media["payload"].to_pylist()[1:], pa.binary()),
    )
    dec = DecodeAudio()(bad).to_pandas()
    assert "decode failed" in dec.loc[0, "error"]
    assert dec.loc[1:, "error"].isna().all()


def test_short_fmt_chunk_is_valueerror():
    # fmt chunk declaring only 4 bytes -> struct.error must not escape
    bad = (
        b"RIFF" + struct.pack("<I", 16) + b"WAVE"
        + b"fmt " + struct.pack("<I", 4) + b"\x01\x00\x01\x00"
    )
    with pytest.raises(ValueError, match="corrupt WAV"):
        decode_wav(bad)
