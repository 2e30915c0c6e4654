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
    """uint64 stable hash of a string array (pyarrow or numpy or pandas).

    Arrow inputs take the dictionary path: hash only the UNIQUE values
    (C-speed dictionary encode), then gather by code — avoids materializing
    one Python object per row, which dominates at 256Ki-row batches.
    """
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        import pyarrow.compute as pc

        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        denc = pc.dictionary_encode(values)
        uniq = np.asarray(denc.dictionary.to_pylist(), dtype=object)
        mask = pd.isna(uniq)
        if mask.any():
            uniq[mask] = ""
        uh = pd.util.hash_array(uniq, categorize=False)
        codes = denc.indices.to_numpy(zero_copy_only=False)
        null_code = pd.isna(codes)
        if null_code.any():
            # nulls hash like "" (validation upstream rejects null keys)
            empty = pd.util.hash_array(np.array([""], dtype=object))[0]
            out = np.empty(len(codes), dtype=np.uint64)
            out[null_code] = empty
            out[~null_code] = uh[codes[~null_code].astype(np.int64)]
            return out
        return uh[codes.astype(np.int64)]
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


def round_half_away(x, ndigits: int = 6):
    """Round half AWAY from zero, matching DuckDB/SQL ``round()`` —
    numpy/pandas/Python ``round`` use banker's rounding, which diverges
    from the SQL oracles on exactly-representable dyadic ties (e.g.
    121/128 → 0.945312 vs SQL's 0.945313). Use this for any engine-side
    rounding whose oracle rounds in SQL."""
    scale = 10.0 ** ndigits
    x = np.asarray(x, dtype=np.float64)
    return np.copysign(np.floor(np.abs(x) * scale + 0.5), x) / scale
