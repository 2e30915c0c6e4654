"""Multimodal columns: opaque binary payloads + typed metadata.

The reference treats every payload as an opaque blob with a metadata map
(``IBlobService.kt:8-13``); we carry the same shape as Arrow columns —
``payload: binary`` + typed metadata — and run decode / feature-extract /
frame-sample as actor-pool ``map_batches`` stages.

Codec boundary: ``decode="fake"`` (default) runs a deterministic
header-parse fake; ``decode="real"`` decodes genuine PNG and baseline
JPEG bytes (magic-byte sniff) — via Pillow when importable (loaded once
per actor in ``__init__``), else the pure-Python/numpy codecs in
``functions/png.py`` and ``functions/jpeg.py``. Audio/video codecs are
not in this container and remain behind the same boundary: an
undecodable payload in real mode dead-letters with an exact error
instead of crashing the stage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from data_exchange_routing_ray.functions.jpeg import decode_jpeg, encode_jpeg
from data_exchange_routing_ray.functions.png import decode_png, encode_png

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("meta_width", pa.int32()),
        ("meta_height", pa.int32()),
        ("meta_sample_rate", pa.int32()),
    ]
)


def synthesize_media_batch(batch: pa.Table, payload_from: str = "text") -> pa.Table:
    """Deterministically wrap a string column as fake binary media rows —
    test/bench plumbing for the multimodal stages."""
    payloads = [
        (s or "").encode("utf-8") for s in batch[payload_from].to_pylist()
    ]
    n = batch.num_rows
    sizes = np.array([len(p) for p in payloads], dtype=np.int64)
    return pa.table(
        {
            "media_id": batch.column(0).cast(pa.int64()),
            "media_type": pa.array(
                np.array(["image", "audio", "video"], dtype=object)[sizes % 3],
                pa.string(),
            ),
            "payload": pa.array(payloads, pa.binary()),
            "meta_width": pa.array((sizes % 640 + 1).astype(np.int32), pa.int32()),
            "meta_height": pa.array((sizes % 480 + 1).astype(np.int32), pa.int32()),
            "meta_sample_rate": pa.array(
                np.full(n, 16000, dtype=np.int32), pa.int32()
            ),
        }
    )


def synthesize_png_batch(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Deterministic REAL-PNG media rows from an id column: image i is a
    (16 + i%33) × (16 + i%49) raster, channels cycling gray/RGB/RGBA by
    i%3, every channel the row-constant gradient ``(i + x) % 256`` — so an
    oracle can compute width/height/channels/pixel_sum in closed form while
    the payload is genuine PNG bytes (zlib, CRC'd chunks, filters)."""
    ids = batch[id_col].to_numpy().astype(np.int64)
    payloads = []
    for i in ids:
        w = 16 + int(i) % 49
        h = 16 + int(i) % 33
        ch = (1, 3, 4)[int(i) % 3]
        row = ((int(i) + np.arange(w)) % 256).astype(np.uint8)
        img = np.broadcast_to(row, (h, w))
        if ch > 1:
            img = np.repeat(img[:, :, None], ch, axis=2)
        # cycle the VECTORIZED-unfilter types (0/1/2) in the bulk pipeline;
        # Average/Paeth (sequential per-byte unfilter by spec) are covered
        # by the codec test suite, not paid per-doc at pipeline scale
        payloads.append(encode_png(img, filter_type=int(i) % 3))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "media_type": pa.array(["image"] * len(ids), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


def synthesize_jpeg_batch(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Deterministic REAL-JPEG media rows from an id column: same dims
    formula as ``synthesize_png_batch`` but channels cycle gray/RGB (JPEG
    has no alpha) and chroma subsampling cycles 4:4:4 / 4:2:2 / 4:2:0 by
    id. Content is a smooth two-axis gradient so the lossy roundtrip stays
    within a small per-sample error (asserted by the decode stage's
    quantitative gate, not by exact sums — JPEG is lossy by construction)."""
    ids = batch[id_col].to_numpy().astype(np.int64)
    payloads = []
    for i in ids:
        img = _jpeg_source_raster(int(i))
        sub = ("444", "422", "420")[int(i) % 3]
        payloads.append(encode_jpeg(img, quality=95, subsample=sub))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "media_type": pa.array(["image"] * len(ids), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


def _jpeg_source_raster(i: int) -> np.ndarray:
    """The deterministic source image for media id ``i`` (shared between
    the synthesizer and the decode-check stage). The gradient stays inside
    [0, 255] WITHOUT modulo wrap-around — a wrap is a hard edge, which
    JPEG's DCT quantization smears (observed mean err 3.5 at 4:2:0); a
    smooth plane keeps the lossy roundtrip well inside the gate."""
    w = 16 + i % 49
    h = 16 + i % 33
    ch = (1, 3)[i % 2]
    y, x = np.mgrid[0:h, 0:w]
    base = (i % 100) + x + y  # ≤ 99 + 63 + 47 = 209
    if ch == 1:
        return base.astype(np.uint8)
    return np.stack(
        [base + 15 * c for c in range(ch)], axis=2
    ).astype(np.uint8)  # ≤ 239


class DecodeJpegChecked:
    """Actor-pool JPEG decode stage with an in-query quantitative gate:
    decodes each payload with the REAL codec (Pillow if importable, else
    ``functions/jpeg.py``), re-synthesizes the deterministic source raster
    from ``media_id`` and asserts mean |decoded − source| ≤ ``tol`` (JPEG
    is lossy, so content is gated by bounded error while width / height /
    channels stay exactly oracle-checkable)."""

    def __init__(self, tol: float = 3.0):
        self.tol = tol
        self._pil = None
        try:
            from PIL import Image

            self._pil = Image
        except ImportError:
            pass

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_numpy().astype(np.int64)
        payloads = batch["payload"].to_pylist()
        n = len(ids)
        widths = np.zeros(n, np.int32)
        heights = np.zeros(n, np.int32)
        chans = np.zeros(n, np.int32)
        errs = np.zeros(n, np.float64)
        for i, (mid, p) in enumerate(zip(ids, payloads)):
            if self._pil is not None:
                import io

                with self._pil.open(io.BytesIO(p)) as im:
                    arr = np.asarray(im)
            else:
                arr, _ = decode_jpeg(p)
            heights[i], widths[i] = arr.shape[0], arr.shape[1]
            chans[i] = arr.shape[2] if arr.ndim == 3 else 1
            src = _jpeg_source_raster(int(mid))
            if arr.shape != src.shape:
                raise AssertionError(
                    f"jpeg decode shape {arr.shape} != source {src.shape}"
                )
            err = float(
                np.abs(arr.astype(np.int64) - src.astype(np.int64)).mean()
            )
            errs[i] = err
            if err > self.tol:
                raise AssertionError(
                    f"jpeg decode error {err:.2f} > tol {self.tol} for id {mid}"
                )
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "channels": pa.array(chans, pa.int32()),
                "mean_abs_err": pa.array(errs, pa.float64()),
            }
        )


def synthesize_neardup_png_batch(
    batch: pa.Table, id_col: str = "doc_id", group_size: int = 5
) -> pa.Table:
    """Deterministic REAL-PNG rows with PLANTED near-duplicate groups:
    group ``g = doc_id // group_size`` shares a low-frequency base raster
    (a seeded-random 8×8 grid upsampled ×8 → 64×64 grayscale); members
    differ by a global brightness shift plus six ±2-pixel touches —
    byte-distinct payloads that are perceptually identical. A correct
    perceptual hash must therefore pair EXACTLY the in-group combinations,
    which the SQL oracle states in closed form (`doc_id // group_size`
    self-join). Measured margins on this synth: in-group Hamming 0,
    cross-group minimum 18 of 63 bits."""
    ids = batch[id_col].to_numpy().astype(np.int64)
    payloads = []
    for i in ids:
        g, m = int(i) // group_size, int(i) % group_size
        rng = np.random.default_rng(900_000 + g)
        base = rng.integers(30, 226, size=(8, 8), dtype=np.int64)
        img = np.kron(base, np.ones((8, 8), dtype=np.int64))
        img = img + (m - 2)  # global brightness shift — DC-only, AC-invariant
        prng = np.random.default_rng(700_000 + int(i))
        yy = prng.integers(0, 64, size=6)
        xx = prng.integers(0, 64, size=6)
        img[yy, xx] += prng.integers(-2, 3, size=6)
        payloads.append(
            encode_png(np.clip(img, 0, 255).astype(np.uint8), filter_type=int(i) % 3)
        )
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "media_type": pa.array(["image"] * len(ids), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


class PerceptualHash:
    """Actor-pool pHash stage: REAL PNG decode → grayscale → 32×32
    area-mean resize → 2-D DCT-II (basis matrix built ONCE per actor in
    ``__init__``) → top-left 8×8 coefficient block with DC dropped →
    median threshold → 63-bit perceptual hash (fits int64).

    A global brightness change only moves the DC coefficient (dropped)
    and cannot move the median of the remaining 63, so the hash is
    brightness-invariant by construction; small local edits perturb the
    low-frequency coefficients far less than the inter-coefficient gaps
    of any structured image, so near-duplicates land within a few bits.
    Undecodable payloads dead-letter via the ``error`` column instead of
    crashing the stage (same boundary as ``DecodeMedia``)."""

    N = 32

    def __init__(self):
        n = self.N
        x = np.arange(n)
        u = np.arange(n)[:, None]
        self._dct = np.cos(np.pi * (2 * x[None, :] + 1) * u / (2 * n))

    def _hash_one(self, payload: bytes) -> int:
        img, _ = decode_png(payload)
        a = img.astype(np.float64)
        if a.ndim == 3:
            a = a.mean(axis=2)
        h, w = a.shape
        rb = (np.arange(self.N + 1) * h) // self.N
        cb = (np.arange(self.N + 1) * w) // self.N
        rows = np.add.reduceat(a, rb[:-1], axis=0) / np.diff(rb)[:, None]
        small = np.add.reduceat(rows, cb[:-1], axis=1) / np.diff(cb)[None, :]
        t = self._dct @ small @ self._dct.T
        block = t[:8, :8].ravel()[1:]  # 63 coefficients, DC dropped
        bits = (block > np.median(block)).astype(np.uint8)
        return int.from_bytes(
            np.packbits(bits, bitorder="little").tobytes(), "little"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = np.zeros(batch.num_rows, dtype=np.int64)
        errors: list[str | None] = [None] * batch.num_rows
        payloads = batch["payload"].to_pylist()
        for i, p in enumerate(payloads):
            try:
                hashes[i] = self._hash_one(p)
            except Exception as exc:  # undecodable payload → dead-letter row
                errors[i] = f"phash: {type(exc).__name__}: {exc}"
        return pa.table(
            {
                "media_id": batch["media_id"],
                "phash": pa.array(hashes, pa.int64()),
                "error": pa.array(errors, pa.string()),
            }
        )


def synthesize_wav_batch(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Deterministic REAL-WAV media rows from an id column: clip i is a
    mono int16 sawtooth ``((i + t) % 256 - 128) * 100`` with
    ``n = 1000 + i%3000`` samples at ``sr = 8000 + (i%3)*4000`` — closed
    forms an SQL oracle can reproduce exactly (PCM is lossless), while the
    payload is genuine RIFF/fmt/data WAV bytes."""
    from data_exchange_routing_ray.functions.wav import encode_wav

    ids = batch[id_col].to_numpy().astype(np.int64)
    payloads = []
    for i in ids:
        n = 1000 + int(i) % 3000
        sr = 8000 + (int(i) % 3) * 4000
        t = np.arange(n, dtype=np.int64)
        samples = (((int(i) + t) % 256 - 128) * 100).astype(np.int16)
        payloads.append(encode_wav(samples, sample_rate=sr))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "media_type": pa.array(["audio"] * len(ids), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


class DecodeAudio:
    """Actor-pool WAV decode + feature stage: real RIFF/PCM parse
    (``functions/wav.py``) then vectorized clip-level features (RMS,
    zero-crossing rate, peak, clip fraction, spectral centroid — the
    filters an audio training-data pipeline gates on). Undecodable
    payloads dead-letter via the ``error`` column."""

    def __init__(self):
        from data_exchange_routing_ray.functions.wav import (
            audio_features,
            decode_wav,
        )

        self._decode = decode_wav
        self._features = audio_features

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        n = len(payloads)
        srs = np.zeros(n, np.int32)
        chans = np.zeros(n, np.int32)
        nsamp = np.zeros(n, np.int64)
        abssum = np.zeros(n, np.int64)
        rms = np.zeros(n, np.float64)
        zcr = np.zeros(n, np.float64)
        errs: list[str | None] = [None] * n
        for i, p in enumerate(payloads):
            try:
                arr, meta = self._decode(p or b"")
            except (ValueError, NotImplementedError) as e:
                errs[i] = f"decode failed: {e}"
                continue
            srs[i] = meta["sample_rate"]
            chans[i] = meta["channels"]
            nsamp[i] = meta["n_samples"]
            mono = arr if arr.ndim == 1 else arr.mean(axis=1).astype(np.int16)
            abssum[i] = int(np.abs(arr.astype(np.int64)).sum())
            f = self._features(mono, meta["sample_rate"])
            rms[i] = f["rms"]
            zcr[i] = f["zero_cross_rate"]
        batch = batch.append_column("sample_rate", pa.array(srs, pa.int32()))
        batch = batch.append_column("channels", pa.array(chans, pa.int32()))
        batch = batch.append_column("n_samples", pa.array(nsamp, pa.int64()))
        batch = batch.append_column("pcm_abs_sum", pa.array(abssum, pa.int64()))
        batch = batch.append_column("rms", pa.array(rms, pa.float64()))
        batch = batch.append_column("zero_cross_rate", pa.array(zcr, pa.float64()))
        return batch.append_column("error", pa.array(errs, pa.string()))


class DecodeMedia:
    """Actor-pool decode stage. ``__init__`` loads the codec once per actor
    (Pillow when importable, else the pure PNG codec); ``__call__`` decodes
    per batch.

    ``decode="fake"``: input columns + ``decoded_bytes`` (payload size) +
    ``checksum`` (deterministic content hash) — plumbing only.

    ``decode="real"``: decodes each payload as PNG and appends ``width``,
    ``height``, ``channels``, ``pixel_sum`` (Σ of all decoded samples),
    ``decoded_bytes`` (decoded raster size) and ``error`` (null on
    success; the exact codec error for undecodable payloads — the
    dead-letter shape, never a stage crash).
    """

    def __init__(self, decode: str = "fake"):
        if decode not in ("fake", "real"):
            raise ValueError(f"decode must be 'fake' or 'real', got {decode!r}")
        self.decode = decode
        self._pil = None
        if decode == "real":
            try:  # optional fast path, loaded once per actor
                from PIL import Image

                self._pil = Image
            except ImportError:
                self._pil = None

    def _decode_one(self, p: bytes):
        if self._pil is not None:
            import io

            with self._pil.open(io.BytesIO(p)) as im:
                arr = np.asarray(im)
            return arr
        if p[:2] == b"\xff\xd8":  # JPEG SOI
            arr, _meta = decode_jpeg(p)
        else:
            arr, _meta = decode_png(p)
        return arr

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        if self.decode == "real":
            n = len(payloads)
            widths = np.zeros(n, np.int32)
            heights = np.zeros(n, np.int32)
            chans = np.zeros(n, np.int32)
            sums = np.zeros(n, np.int64)
            nbytes = np.zeros(n, np.int64)
            errs: list[str | None] = [None] * n
            for i, p in enumerate(payloads):
                try:
                    arr = self._decode_one(p or b"")
                except (ValueError, NotImplementedError, OSError) as e:
                    errs[i] = f"decode failed: {e}"
                    continue
                heights[i], widths[i] = arr.shape[0], arr.shape[1]
                chans[i] = arr.shape[2] if arr.ndim == 3 else 1
                sums[i] = int(arr.astype(np.int64).sum())
                nbytes[i] = arr.size
            batch = batch.append_column("width", pa.array(widths, pa.int32()))
            batch = batch.append_column("height", pa.array(heights, pa.int32()))
            batch = batch.append_column("channels", pa.array(chans, pa.int32()))
            batch = batch.append_column("pixel_sum", pa.array(sums, pa.int64()))
            batch = batch.append_column("decoded_bytes", pa.array(nbytes, pa.int64()))
            return batch.append_column("error", pa.array(errs, pa.string()))
        sizes = np.array([len(p or b"") for p in payloads], dtype=np.int64)
        checks = np.array(
            [
                int.from_bytes((p or b"\0")[:8].ljust(8, b"\0"), "little")
                for p in payloads
            ],
            dtype=np.uint64,
        ).astype(np.int64)
        batch = batch.append_column("decoded_bytes", pa.array(sizes, pa.int64()))
        return batch.append_column("checksum", pa.array(checks, pa.int64()))


class ExtractMediaFeatures:
    """Actor-pool feature extractor: deterministic fake embedding (8-dim)
    derived from payload bytes — stands in for a model forward pass; the
    batched-inference plumbing (batch size, actor pool, output list column)
    is the real article."""

    DIM = 8

    def __init__(self):
        self.proj = np.linspace(1, 2, 256 * self.DIM).reshape(256, self.DIM)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for p in batch["payload"].to_pylist():
            b = np.frombuffer(p or b"\0", dtype=np.uint8)
            hist = np.bincount(b, minlength=256)[:256].astype(np.float64)
            hist /= max(hist.sum(), 1.0)
            feats.append((hist @ self.proj).astype(np.float32))
        return batch.append_column(
            "features", pa.array([f.tolist() for f in feats], pa.list_(pa.float32()))
        )


class ResizeMedia:
    """Actor-pool resize stage: nearest-neighbor byte resample of the
    payload to ``target_w × target_h`` (stub treating the payload as a
    ``meta_width × meta_height`` byte raster — a real impl swaps in
    Pillow/cv2 in ``__init__``; the batch plumbing and metadata update are
    the real article)."""

    def __init__(self, target_w: int = 32, target_h: int = 32):
        self.tw, self.th = target_w, target_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        ws = batch["meta_width"].to_numpy()
        hs = batch["meta_height"].to_numpy()
        out = []
        for p, w, h in zip(payloads, ws, hs):
            w, h = max(int(w), 1), max(int(h), 1)  # zero/neg dims: 1px raster
            b = np.frombuffer((p or b"\0").ljust(w * h, b"\0"), dtype=np.uint8)
            img = b[: w * h].reshape(h, w)
            yi = (np.arange(self.th) * img.shape[0] // self.th).clip(0, img.shape[0] - 1)
            xi = (np.arange(self.tw) * img.shape[1] // self.tw).clip(0, img.shape[1] - 1)
            out.append(img[np.ix_(yi, xi)].tobytes())
        n = batch.num_rows
        batch = batch.set_column(
            batch.schema.get_field_index("payload"), "payload",
            pa.array(out, pa.binary()),
        )
        batch = batch.set_column(
            batch.schema.get_field_index("meta_width"), "meta_width",
            pa.array(np.full(n, self.tw, np.int32), pa.int32()),
        )
        return batch.set_column(
            batch.schema.get_field_index("meta_height"), "meta_height",
            pa.array(np.full(n, self.th, np.int32), pa.int32()),
        )


def sample_frames(
    batch: pa.Table, frame_size: int = 64, every_nth: int = 4
) -> pa.Table:
    """Frame sampler for 'video' payloads modeled as concatenated fixed-size
    frames: 1 row in → N sampled-frame rows out (flat-map-shaped, vectorized
    offsets; real byte slicing)."""
    ids = batch["media_id"].to_pylist()
    payloads = batch["payload"].to_pylist()
    out_id, out_frame, out_bytes = [], [], []
    for mid, p in zip(ids, payloads):
        p = p or b""
        n_frames = max(len(p) // frame_size, 0)
        for f in range(0, n_frames, every_nth):
            out_id.append(mid)
            out_frame.append(f)
            out_bytes.append(p[f * frame_size : (f + 1) * frame_size])
    return pa.table(
        {
            "media_id": pa.array(out_id, pa.int64()),
            "frame_idx": pa.array(out_frame, pa.int32()),
            "frame": pa.array(out_bytes, pa.binary()),
        }
    )
