"""Hot-key A/B for the temporal joins (round-5 verdict item): one user
owns ``--hot-frac`` of all clicks; measure asof_join / range_join_agg
wall time with the single-bucket path vs the (key, time-slice)
sub-bucketed hot path, asserting identical result checksums.

Usage::

    python tools/join_skew_ab.py [--clicks 2000000] [--hot-frac 0.3]

One JSON line on stdout; append to BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HOUR_US = 3600 * 10**6


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clicks", type=int, default=2_000_000)
    ap.add_argument("--purchases", type=int, default=400_000)
    ap.add_argument("--users", type=int, default=50_000)
    ap.add_argument("--hot-frac", type=float, default=0.3)
    ap.add_argument("--slice-hours", type=int, default=6)
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    import pyarrow as pa
    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from data_exchange_routing_ray.functions.joins import (
        asof_join,
        range_join_agg,
    )

    rng = np.random.default_rng(5)
    t0 = 1_700_000_000_000_000
    span = 30 * 24 * HOUR_US
    n_hot = int(args.clicks * args.hot_frac)
    users = np.concatenate([
        np.zeros(n_hot, np.int64),  # user 0 is the hot key
        rng.integers(1, args.users, args.clicks - n_hot).astype(np.int64),
    ])
    clicks = pa.table({
        "event_id": pa.array(np.arange(args.clicks, dtype=np.int64)),
        "user_id": pa.array(users),
        "ts": pa.array(t0 + rng.integers(0, span, args.clicks),
                       pa.timestamp("us")),
    })
    pu = rng.integers(0, args.users, args.purchases).astype(np.int64)
    purchases = pa.table({
        "user_id": pa.array(pu),
        "ts": pa.array(t0 + rng.integers(0, span, args.purchases),
                       pa.timestamp("us")),
        "value": pa.array(np.round(rng.uniform(1, 100, args.purchases), 2)),
    })
    cl_ds = ray.data.from_arrow(clicks).repartition(64).materialize()
    pu_ds = ray.data.from_arrow(purchases).repartition(16).materialize()

    slice_w = args.slice_hours * HOUR_US

    def run(tag: str, fn) -> dict:
        best, chk = None, None
        for _ in range(args.repeats):
            t = time.time()
            out = fn().to_pandas()
            dt = time.time() - t
            c = (
                int(out["event_id"].sum()),
                round(float(out.get("value", out.get("sum_in_window")).fillna(0).sum()), 2),
                len(out),
            )
            chk = c if chk is None else chk
            assert c == chk, f"{tag}: nondeterministic result"
            best = dt if best is None else min(best, dt)
        return {"sec": round(best, 3), "checksum": list(chk)}

    res: dict = {
        "metric": "temporal-join hot-key A/B",
        "clicks": args.clicks,
        "purchases": args.purchases,
        "hot_frac": args.hot_frac,
        "num_cpus": args.num_cpus,
        "slice_hours": args.slice_hours,
    }
    res["asof_base"] = run(
        "asof_base",
        lambda: asof_join(cl_ds, pu_ds, by="user_id", on="ts",
                          right_value_cols=["value"]),
    )
    res["asof_hot"] = run(
        "asof_hot",
        lambda: asof_join(cl_ds, pu_ds, by="user_id", on="ts",
                          right_value_cols=["value"],
                          hot_keys=[0], slice_width=slice_w),
    )
    assert res["asof_base"]["checksum"] == res["asof_hot"]["checksum"], \
        "hot path changed asof results"
    res["range_base"] = run(
        "range_base",
        lambda: range_join_agg(cl_ds, pu_ds, by="user_id", on="ts",
                               value_col="value", window=HOUR_US),
    )
    res["range_hot"] = run(
        "range_hot",
        lambda: range_join_agg(cl_ds, pu_ds, by="user_id", on="ts",
                               value_col="value", window=HOUR_US,
                               hot_keys=[0], slice_width=slice_w),
    )
    assert res["range_base"]["checksum"] == res["range_hot"]["checksum"], \
        "hot path changed range results"
    res["asof_speedup"] = round(
        res["asof_base"]["sec"] / res["asof_hot"]["sec"], 3)
    res["range_speedup"] = round(
        res["range_base"]["sec"] / res["range_hot"]["sec"], 3)
    print(json.dumps(res))
    ray.shutdown()


if __name__ == "__main__":
    main()
