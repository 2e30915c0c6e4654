"""WAV (RIFF/PCM) codec in pure Python/numpy — the audio leg of the
multimodal surface, companion to ``functions/png.py`` / ``jpeg.py``.

PCM WAV is a length-prefixed chunk container around raw little-endian
samples, so a real codec needs only struct + numpy: ``encode_wav`` writes
canonical RIFF/fmt/data chunks for int16 mono/stereo; ``decode_wav``
validates the chunk structure (RIFF magic, WAVE form, fmt fields, data
length) and returns the sample array zero-copy via ``np.frombuffer``.
Compressed codecs (MP3/AAC/FLAC) are not in this container and stay
behind the decode stage's dead-letter boundary (exact error, no crash).
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode an int16 (n,) mono or (n, 2) stereo array as PCM WAV."""
    samples = np.asarray(samples)
    if samples.dtype != np.int16 or samples.ndim not in (1, 2):
        raise ValueError("expected int16 (n,) or (n, 2) array")
    ch = 1 if samples.ndim == 1 else samples.shape[1]
    if ch not in (1, 2):
        raise ValueError("mono or stereo only")
    data = np.ascontiguousarray(samples).tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, dict]:
    """Decode PCM WAV bytes -> (int16 array [(n,) or (n, ch)], metadata).

    Validates RIFF/WAVE structure and chunk lengths; raises ValueError on
    corruption, NotImplementedError on non-PCM or non-16-bit formats."""
    data = bytes(data)
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    try:
        return _decode_wav_inner(data)
    except (struct.error, IndexError) as e:
        # short fmt chunk etc. surface as ValueError at the codec boundary
        raise ValueError(f"corrupt WAV: {e}") from e


def _decode_wav_inner(data: bytes) -> tuple[np.ndarray, dict]:
    (riff_len,) = struct.unpack("<I", data[4:8])
    if riff_len + 8 > len(data):
        raise ValueError("truncated RIFF payload")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + clen]
        if len(body) < clen:
            raise ValueError(f"truncated {cid!r} chunk")
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            tag, ch, sr, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            if tag != 1:
                raise NotImplementedError(f"non-PCM WAV (format tag {tag})")
            if bits != 16:
                raise NotImplementedError(f"{bits}-bit WAV (only 16)")
            fmt = (ch, sr)
        elif cid == b"data":
            pcm = body
    if fmt is None or pcm is None:
        raise ValueError("missing fmt or data chunk")
    ch, sr = fmt
    if len(pcm) % (2 * ch):
        raise ValueError("data chunk not a whole number of frames")
    arr = np.frombuffer(pcm, np.int16)
    if ch > 1:
        arr = arr.reshape(-1, ch)
    meta = {
        "sample_rate": int(sr),
        "channels": int(ch),
        "n_samples": int(arr.shape[0]),
        "bit_depth": 16,
    }
    return arr, meta


def audio_features(samples: np.ndarray, sample_rate: int) -> dict:
    """Vectorized clip-level features over a mono int16 signal: the shape
    a training-data audio-quality filter needs (silence/clipping/energy/
    pitch proxies), all numpy — no Python per-sample loops."""
    x = samples.astype(np.float64)
    n = len(x)
    if n == 0:
        return {
            "rms": 0.0, "zero_cross_rate": 0.0, "peak": 0,
            "clip_fraction": 0.0, "spectral_centroid_hz": 0.0,
        }
    rms = float(np.sqrt(np.mean(x * x)))
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
    peak = int(np.abs(samples).max())
    clip = float(np.mean(np.abs(samples) >= 32767))
    spec = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(n, d=1.0 / sample_rate)
    denom = spec.sum()
    centroid = float((freqs * spec).sum() / denom) if denom > 0 else 0.0
    return {
        "rms": rms,
        "zero_cross_rate": zcr,
        "peak": peak,
        "clip_fraction": clip,
        "spectral_centroid_hz": centroid,
    }
