"""Pure-numpy host-capacity control (NO Ray): measures what the VM itself
can deliver for bandwidth-bound sort work at the two process counts the
scaling protocol compares. Every engine scaling sample should be read
against the same-window control — on this sandbox the host's concurrent
throughput drifts 2-3x between time windows (invisible co-tenants), and
the control separates "the engine stopped scaling" from "the host did".

Usage: python tools/host_control.py  (or import run_control)
"""

from __future__ import annotations

import multiprocessing as mp
import time

import numpy as np  # imported pre-fork so workers inherit it warm


def _warm(_: int) -> int:
    return 0


def _job(seed: int) -> int:
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 1 << 60, 3_000_000)
    for _ in range(5):
        np.sort(a)
    return 0


def run_control(lo: int = 8, hi: int = 32) -> dict:
    """N jobs at N processes, for N in (lo, hi): per-window host ceiling.

    ``ceiling_efficiency`` is the host's own (rate_hi/rate_lo)/(hi/lo) for
    embarrassingly parallel bandwidth-bound work — an engine cannot scale
    past it in the same window."""
    out = {}
    for procs in (lo, hi):
        with mp.Pool(procs) as p:
            # warm the pool OUTSIDE the timed window: spawn cost grows with
            # process count and would bias the hi side low
            p.map(_warm, range(procs))
            t0 = time.perf_counter()
            p.map(_job, range(procs))
            dt = time.perf_counter() - t0
        out[procs] = procs / dt
    return {
        "lo_procs": lo,
        "hi_procs": hi,
        "lo_jobs_per_s": round(out[lo], 2),
        "hi_jobs_per_s": round(out[hi], 2),
        "ceiling_efficiency": round((out[hi] / out[lo]) / (hi / lo), 3),
    }


if __name__ == "__main__":
    import json

    print(json.dumps(run_control()))
