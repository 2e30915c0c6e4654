"""Simulated 2-node replay of the sustained CDC job.

The round-4 verdict's stretch item: the spill proof and the 8v32 scaling
pairs are single-raylet samples; this script stands up a TWO-RAYLET Ray
cluster on this box (``ray.cluster_utils.Cluster`` — the sanctioned local
multi-node harness: two raylets, two plasma stores, object transfers
through the object manager exactly as between real nodes), replays the
materialized change stream through the full engine (validate → merge →
two-phase commit), and records:

- the sustained rate (events/sec) under the 2-node topology,
- peak CPUs-in-use PER RAYLET sampled during the replay (proof both
  raylets executed replay tasks — the state API needs the dashboard
  server, which this sandbox disallows, so placement is evidenced by
  per-node resource sampling instead),
- the cluster memory summary when available (grpc-less containers
  report it as unavailable).

Usage::

    python tools/two_node_replay.py [--multiplier 240] [--cpus-per-node 16]

One JSON line on stdout; append the result to BASELINE.md.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--multiplier", type=int, default=240)
    ap.add_argument("--cpus-per-node", type=int, default=16)
    ap.add_argument("--object-store-mb", type=int, default=3000)
    args = ap.parse_args()

    # ---- phase 1: materialize the stream with a plain local session ----
    import bench

    keep = tempfile.mkdtemp(prefix="twonode-")
    stream_dir = os.path.join(keep, "stream")
    total = bench._materialize_stream(args.sf_dir, args.multiplier, stream_dir)
    import ray

    ray.shutdown()

    # ---- phase 2: two-raylet cluster ----
    from ray.cluster_utils import Cluster

    store = args.object_store_mb * 1024 * 1024
    cluster = Cluster(
        initialize_head=True,
        connect=True,
        head_node_args={
            "num_cpus": args.cpus_per_node,
            "object_store_memory": store,
            "include_dashboard": False,
        },
    )
    second = cluster.add_node(
        num_cpus=args.cpus_per_node, object_store_memory=store
    )
    cluster.wait_for_nodes()
    # the sandbox presets RAY_ADDRESS=local; point every auxiliary API
    # (state API, memory_summary) at THIS cluster's GCS instead
    os.environ["RAY_ADDRESS"] = ray.get_runtime_context().gcs_address
    nodes = [n for n in ray.nodes() if n["Alive"]]
    assert len(nodes) == 2, f"expected 2 raylets, got {len(nodes)}"

    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    # ---- placement evidence: sample per-node CPU-in-use while the
    # replay runs (the state API needs the dashboard server, which this
    # sandbox disallows). Peak in-use CPUs > 0 on BOTH raylets proves
    # both executed replay tasks; the merge exchange between them then
    # necessarily moved blocks through the object manager.
    import threading

    totals = {
        n["NodeID"][:8]: n["Resources"].get("CPU", 0.0) for n in nodes
    }
    peak_in_use: dict[str, float] = {k: 0.0 for k in totals}
    stop = threading.Event()

    def _sample() -> None:
        from ray._private.state import available_resources_per_node

        while not stop.is_set():
            try:
                avail = available_resources_per_node()
                for nid, res in avail.items():
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
    times = []
    for r in range(2):
        d = os.path.join(keep, f"lake-r{r}")
        shutil.rmtree(d, ignore_errors=True)
        lake = CDCLake(d, num_partitions=64)
        t0 = time.time()
        lake.replay_files(files, files_per_epoch=len(files), quarantine=False)
        times.append(time.time() - t0)
    dt = min(times)
    stop.set()
    sampler.join(timeout=2)

    mem_summary = None
    try:
        from ray._private.internal_api import memory_summary

        mem_summary = memory_summary(
            address=ray.get_runtime_context().gcs_address, stats_only=True
        )[-1500:]
    except Exception as e:
        mem_summary = f"unavailable: {e}"

    out = {
        "metric": "cdc replay sustained throughput (2 raylets / simulated 2 nodes)",
        "value": round(total / dt, 1),
        "unit": "events/sec",
        "sf": args.sf_dir,
        "events": total,
        "sec": round(dt, 3),
        "all_runs_sec": [round(t, 3) for t in times],
        "nodes": len(nodes),
        "cpus_per_node": args.cpus_per_node,
        "object_store_mb_per_node": args.object_store_mb,
        "peak_cpus_in_use_per_node": {
            k: round(v, 1) for k, v in peak_in_use.items()
        },
        "memory_summary_tail": mem_summary,
    }
    print(json.dumps(out))
    ray.shutdown()
    cluster.shutdown()
    shutil.rmtree(keep, ignore_errors=True)


if __name__ == "__main__":
    main()
