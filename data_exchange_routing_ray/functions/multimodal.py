"""Multimodal columns: opaque binary payloads + typed metadata.

The reference treats every payload as an opaque blob with a metadata map
(``IBlobService.kt:8-13``); we carry the same shape as Arrow columns —
``payload: binary`` + typed metadata — and run decode / feature-extract /
frame-sample as actor-pool ``map_batches`` stages.

Image/audio libraries are NOT in this container, so the codec boundary is
STUBBED: ``decode=\"fake\"`` (default) runs a deterministic header-parse
fake so the Ray-side plumbing (schema, batch size, actor signature, output
layout) is real and tested; ``decode=\"real\"`` raises ``NotImplementedError``
with the dependency it would use.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

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


class DecodeMedia:
    """Actor-pool decode stage. ``__init__`` loads the (stubbed) codec once
    per actor; ``__call__`` decodes per batch.

    Output layout: input columns + ``decoded_bytes`` (payload size) +
    ``checksum`` (deterministic content hash) — the shape a real decoder
    would extend with pixel/sample tensors.
    """

    def __init__(self, decode: str = "fake"):
        if decode == "real":
            raise NotImplementedError(
                "real media decode requires Pillow/torchaudio/PyAV, which are "
                "not available in this environment; use decode='fake' for the "
                "deterministic plumbing path"
            )
        self.decode = decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
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
