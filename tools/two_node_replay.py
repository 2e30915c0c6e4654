"""Simulated multi-node replay of the sustained CDC job.

Two evidence modes, both using ``ray.cluster_utils.Cluster`` — the
sanctioned local multi-node harness (k raylets, k plasma stores; object
transfers between them go through the object manager exactly as between
real nodes):

1. **Default (2-node transfer-path proof):** replay the materialized
   change stream on a 2-raylet cluster and record the sustained rate
   plus peak CPUs-in-use PER RAYLET sampled during the run (proof both
   raylets executed replay tasks — the state API needs the dashboard
   server, which this sandbox disallows, so placement is evidenced by
   per-node resource sampling instead).

2. **``--scaling-nodes`` (the north rule's N vs 4N *nodes* criterion):**
   run the SAME job in fresh processes on a 1-raylet×8-CPU cluster and a
   4-raylet×8-CPU cluster, alternating pairs, and report throughput at
   both plus per-pair efficiency ``(rate_4n / rate_1n) / 4`` — the
   node-count version of bench.py --scaling's 8v32 single-process proxy.

Usage::

    python tools/two_node_replay.py [--multiplier 240] [--cpus-per-node 16]
    python tools/two_node_replay.py --scaling-nodes [--pairs 2]

One JSON line on stdout; append the result to BASELINE.md.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def replay_on_cluster(
    stream_dir: str,
    lake_root: str,
    n_raylets: int,
    cpus_per_node: int,
    object_store_mb: int,
    repeats: int = 2,
) -> dict:
    """Stand up an n-raylet cluster in THIS process, replay the stream
    through the full engine (validate → merge → two-phase commit)
    ``repeats`` times, return best-of timing + placement evidence."""
    import ray
    from ray.cluster_utils import Cluster

    store = object_store_mb * 1024 * 1024
    cluster = Cluster(
        initialize_head=True,
        connect=True,
        head_node_args={
            "num_cpus": cpus_per_node,
            "object_store_memory": store,
            "include_dashboard": False,
        },
    )
    for _ in range(n_raylets - 1):
        cluster.add_node(num_cpus=cpus_per_node, object_store_memory=store)
    cluster.wait_for_nodes()
    # the sandbox presets RAY_ADDRESS=local; point auxiliary APIs at
    # THIS cluster's GCS instead
    os.environ["RAY_ADDRESS"] = ray.get_runtime_context().gcs_address
    nodes = [n for n in ray.nodes() if n["Alive"]]
    assert len(nodes) == n_raylets, f"expected {n_raylets}, got {len(nodes)}"

    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    # placement evidence: sample per-node CPU-in-use during the replay
    import threading

    totals = {n["NodeID"][:8]: n["Resources"].get("CPU", 0.0) for n in nodes}
    peak_in_use: dict[str, float] = {k: 0.0 for k in totals}
    stop = threading.Event()

    def _sample() -> None:
        from ray._private.state import available_resources_per_node

        while not stop.is_set():
            try:
                for nid, res in available_resources_per_node().items():
                    k = nid[:8]
                    if k in totals:
                        in_use = totals[k] - res.get("CPU", 0.0)
                        peak_in_use[k] = max(peak_in_use[k], in_use)
            except Exception:
                pass
            stop.wait(0.25)

    sampler = threading.Thread(target=_sample, daemon=True)
    sampler.start()

    files = sorted(glob.glob(os.path.join(stream_dir, "*.parquet")))
    import pyarrow.parquet as pq

    total = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    times = []
    for r in range(repeats):
        d = os.path.join(lake_root, f"lake-r{r}")
        shutil.rmtree(d, ignore_errors=True)
        lake = CDCLake(d, num_partitions=64)
        t0 = time.time()
        lake.replay_files(files, files_per_epoch=len(files), quarantine=False)
        times.append(time.time() - t0)
    dt = min(times)
    stop.set()
    sampler.join(timeout=2)

    out = {
        "nodes": n_raylets,
        "cpus_per_node": cpus_per_node,
        "object_store_mb_per_node": object_store_mb,
        "events": total,
        "sec": round(dt, 3),
        "events_per_sec": round(total / dt, 1),
        "all_runs_sec": [round(t, 3) for t in times],
        "peak_cpus_in_use_per_node": {
            k: round(v, 1) for k, v in peak_in_use.items()
        },
    }
    ray.shutdown()
    cluster.shutdown()
    return out


def _child(stream_dir: str, lake_root: str, n_raylets: int,
           cpus_per_node: int, object_store_mb: int) -> dict:
    """Fresh-process cluster replay (each topology owns its process, so
    GCS/raylet state can't leak between the paired samples)."""
    out = subprocess.run(
        [
            sys.executable, os.path.abspath(__file__),
            "--cluster-replay", stream_dir,
            "--lake-root", lake_root,
            "--raylets", str(n_raylets),
            "--cpus-per-node", str(cpus_per_node),
            "--object-store-mb", str(object_store_mb),
        ],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--multiplier", type=int, default=240)
    ap.add_argument("--cpus-per-node", type=int, default=16)
    ap.add_argument("--object-store-mb", type=int, default=3000)
    ap.add_argument("--scaling-nodes", action="store_true",
                    help="N vs 4N nodes paired scaling (1x8 vs 4x8 CPUs)")
    ap.add_argument("--pairs", type=int, default=2)
    ap.add_argument("--cluster-replay", default=None,
                    help="(internal) child mode: stream dir to replay")
    ap.add_argument("--lake-root", default=None)
    ap.add_argument("--raylets", type=int, default=2)
    args = ap.parse_args()

    if args.cluster_replay:
        res = replay_on_cluster(
            args.cluster_replay, args.lake_root or tempfile.mkdtemp(),
            args.raylets, args.cpus_per_node, args.object_store_mb,
        )
        print(json.dumps(res))
        return

    # ---- materialize the stream once with a plain local session ----
    import bench

    keep = tempfile.mkdtemp(prefix="twonode-")
    stream_dir = os.path.join(keep, "stream")
    total = bench._materialize_stream(args.sf_dir, args.multiplier, stream_dir)
    import ray

    ray.shutdown()

    if args.scaling_nodes:
        pairs = []
        for p in range(args.pairs):
            lo = _child(stream_dir, os.path.join(keep, f"lo{p}"), 1, 8,
                        args.object_store_mb)
            hi = _child(stream_dir, os.path.join(keep, f"hi{p}"), 4, 8,
                        args.object_store_mb)
            eff = round(hi["events_per_sec"] / lo["events_per_sec"] / 4, 3)
            pairs.append({"lo": lo, "hi": hi, "efficiency": eff})
        effs = sorted(x["efficiency"] for x in pairs)
        median = effs[len(effs) // 2] if len(effs) % 2 else round(
            (effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2, 3)
        host_control = None
        try:
            sys.path.insert(0, os.path.join(REPO, "tools"))
            from host_control import run_control

            host_control = run_control(8, 32)
        except Exception:
            pass
        out = {
            "metric": "cdc replay node-count scaling (1 raylet x8 vs 4 raylets x8, fresh paired processes)",
            "value": median,
            "unit": "efficiency",
            "sf": args.sf_dir,
            "events": total,
            "pairs": pairs,
            "per_pair_efficiency": [x["efficiency"] for x in pairs],
            "host_control": host_control,
        }
        print(json.dumps(out))
        shutil.rmtree(keep, ignore_errors=True)
        return

    res = replay_on_cluster(
        stream_dir, keep, 2, args.cpus_per_node, args.object_store_mb
    )
    out = {
        "metric": "cdc replay sustained throughput (2 raylets / simulated 2 nodes)",
        "value": res["events_per_sec"],
        "unit": "events/sec",
        "sf": args.sf_dir,
        **res,
    }
    print(json.dumps(out))
    shutil.rmtree(keep, ignore_errors=True)


if __name__ == "__main__":
    main()
