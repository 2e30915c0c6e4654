"""Mergeable sketches: HyperLogLog approximate distinct counting.

The reference has no sketch aggregates (SURVEY.md §2.5); a 100 TB
training-data pipeline needs them (distinct users/documents without a
shuffle of the full key set). Classic HLL (Flajolet et al. 2007, public
algorithm): hash each value, bucket by the low ``p`` bits, register keeps
the max leading-zero rank of the remaining bits; merge = elementwise max;
estimate = bias-corrected harmonic mean with small/large-range corrections.

All vectorized numpy; per-batch sketches are tiny (2^p bytes) so the ONE
groupby ships kilobytes regardless of input size.
"""

from __future__ import annotations

import numpy as np

_ALPHA = {4: 0.673, 5: 0.697, 6: 0.709}


def _alpha(m: int) -> float:
    p = int(np.log2(m))
    return _ALPHA.get(p, 0.7213 / (1 + 1.079 / m))


def _hash64(values: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (splitmix64) of an int array."""
    x = values.astype(np.uint64, copy=True)
    x += np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def hll_sketch_batch(values: np.ndarray, precision: int = 14) -> np.ndarray:
    """(2^precision,) uint8 register array for one batch of int values."""
    m = 1 << precision
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = _hash64(np.asarray(values))
    idx = (h >> np.uint64(64 - precision)).astype(np.int64)
    rest = (h << np.uint64(precision)) | np.uint64((1 << precision) - 1)
    # rank = leading zeros of the remaining bits + 1
    # count leading zeros via bit_length: lz = 64 - bit_length(rest)
    bl = np.zeros(len(rest), dtype=np.int64)
    r = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = r >= (np.uint64(1) << np.uint64(shift))
        bl[mask] += shift
        r[mask] >>= np.uint64(shift)
    bl += 1  # bit_length
    rank = (64 - bl + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    est = _alpha(m) * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int((regs == 0).sum())
        if zeros:
            return m * np.log(m / zeros)  # linear counting
    if est > (1 << 32) / 30.0:
        return -(1 << 32) * np.log(1.0 - est / (1 << 32))
    return est


def approx_quantiles(
    ds, col: str, qs: list[float], per_batch: int = 1024
) -> list[float]:
    """Mergeable quantile summary: each batch contributes ``per_batch``
    evenly-spaced order statistics weighted by batch size (a GK/t-digest
    stand-in with the same merge shape); the driver computes weighted
    quantiles over the bounded merged summary. Error ≤ ~1/per_batch of
    rank per batch, asserted against exact quantiles in pytest."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    def summary(b: pa.Table) -> pa.Table:
        v = np.sort(b[col].to_numpy(zero_copy_only=False).astype(np.float64))
        n = len(v)
        if n == 0:
            return pa.table(
                {"value": pa.array([], pa.float64()),
                 "weight": pa.array([], pa.float64())}
            )
        m = min(per_batch, n)
        # t-digest-style tail bias: half the budget spread uniformly, a
        # quarter concentrated in each 2% tail (tail quantiles are where
        # uniform summaries lose rank resolution)
        pos = np.unique(
            np.concatenate(
                [
                    np.linspace(0, n - 1, m // 2),
                    np.linspace(0, max(0.02 * (n - 1), 1), m // 4),
                    np.linspace(min(0.98 * (n - 1), n - 2), n - 1, m // 4),
                ]
            ).round().astype(np.int64)
        )
        # piecewise weights: each kept order stat represents the ranks up
        # to the midpoint between it and its neighbors
        mid = (pos[1:] + pos[:-1]) / 2.0
        hi = np.append(mid, n - 0.5)
        lo = np.concatenate([[-0.5], mid])
        return pa.table(
            {
                "value": pa.array(v[pos], pa.float64()),
                "weight": pa.array(hi - lo, pa.float64()),
            }
        )

    merged = (
        ds.map_batches(summary, batch_format="pyarrow").to_pandas()
    )  # bounded: per_batch rows per input batch
    merged = merged.sort_values("value", kind="stable")
    w = merged["weight"].to_numpy()
    v = merged["value"].to_numpy()
    cum = np.cumsum(w) - 0.5 * w
    total = w.sum()
    return [float(np.interp(q * total, cum, v)) for q in qs]
