"""Stable, vectorized hashing used for partition assignment and dedup.

Partition assignment must be deterministic run-to-run (lake partition files
are keyed by it), so we use pandas' SipHash-based ``hash_array`` with its
documented fixed key rather than Python's randomized ``hash``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def stable_hash_strings(values) -> np.ndarray:
    """uint64 stable hash of a string array (pyarrow or numpy or pandas)."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_numpy(zero_copy_only=False)
    arr = np.asarray(values, dtype=object)
    # Nulls hash to a fixed bucket; validation upstream rejects null keys.
    mask = pd.isna(arr)
    if mask.any():
        arr = arr.copy()
        arr[mask] = ""
    return pd.util.hash_array(arr, categorize=True)


def partition_ids(conv_ids, num_partitions: int) -> np.ndarray:
    """Stable partition id in [0, num_partitions) from conv_id strings."""
    return (stable_hash_strings(conv_ids) % np.uint64(num_partitions)).astype(np.int32)
