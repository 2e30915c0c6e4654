"""Benchmark harness for the Ray-Data CDC/ingest engine.

Default mode: run the headline pipelines over ``$GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32)`` and print ONE JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, "cdc_events_per_sec": R}

Scaling mode (``--scaling``): run the identical CDC-replay job in FRESH
processes at two parallelism levels (default ``num_cpus=8`` then ``32``) on
the same input and report throughput at both plus scaling efficiency
``(rate_hi / rate_lo) / (hi / lo)`` — the sandbox stand-in for N vs 4N Ray
nodes (see BASELINE.md).  The replay input is the deterministic change
stream derived from ``events.parquet`` (see pipelines/events_cdc.py),
replicated ``--multiplier`` times with shifted seq ranges so the job is
large enough to saturate the higher CPU count; the multiplier is reported.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# Headline pipelines: flagship CDC replay + one representative per operator
# family (routing, splitter, relational agg/join/sort, window, text, dedup,
# similarity).  Full operator coverage is check_queries.py's job; bench
# tracks throughput of the families.
HEADLINE = [
    "cdc_final_state",
    "cdc_final_state_multi_epoch",
    "cdc_schema_evolution",
    "cdc_quarantine_counts",
    "cdc_route_expansion",
    "cdc_debatch",
    "agg_pricing_summary",
    "join_broadcast_segments",
    "sort_topk_orders",
    "sessionize_events",
    "window_tumbling_daily",
    "text_quality",
    "text_langid",
    "training_data_prep",
    "dedup_exact_events_props",
    "dedup_minhash_pairs",
    "emb_neardup_lsh",
    "ann_topk",
    "ann_batch_topk",
    # late-round-1 widening families
    "join_copartitioned_orders_lineitem",
    "text_dup_ngram_fraction",
    "pack_token_sequences",
    # round-2 widening families
    "left_join_customer_orders",
    "dedup_cluster_components",
    "quality_percentile_filter",
    "cdc_turn_gaps",
    "bloom_semi_join_lineitem",
    # round-2 widening, batches 6-8
    "tfidf_top_terms",
    "funnel_conversion",
    "rolling_7d_active_users",
    "pareto_orders",
    "window_dedup_first",
    # round-2 widening, batch 11
    "percent_rank_orders",
    "dedup_edit_distance",
    "weighted_median_price",
    # round-2 widening, batches 12-13
    "max_concurrent_intervals",
    "doc_bigram_familiarity",
    "profile_table_stats",
    "fk_integrity_audit",
    "interval_overlap_counts",
    # round-2 widening, batches 19-20
    "time_weighted_value_integral",
    "conv_transcript_assembly",
    "basket_part_pairs",
    "cusum_max_deviation",
    "session_path_trigrams",
    "repeated_word_stats",
    # round-2 widening, batches 21-25
    "triangle_count_parts",
    "rfm_segments",
    "session_duration_deciles",
    "zorder_pruned_read",
    "hard_negative_mining",
    "rate_limit_audit",
    "cdc_quarantine_replay",
    "group_txn_two_lakes",
    # round-2 widening, batch 27
    "pagerank_parts",
    "bm25_score_docs",
    "lake_merge_into",
    "basket_association_rules",
    "bpe_train_merges",
    "conv_context_windows",
    "pit_feature_join",
    "lake_branch_isolation",
    "windowed_emit_on_watermark",
    "cdc_changefeed_envelopes",
    # round-3: real-codec multimodal family + report envelopes
    "multimodal_decode",
    "multimodal_audio_features",
    "cdc_report_envelopes",
    # round-3 widening batches C-D families
    "conv_response_latency",
    "doc_quality_model_score",
    "dup_span_excise",
    "stream_dedup_lsh_epochs",
    # round-3 widening batch F: stateful streaming + lake data skipping
    "stream_sessionize_watermark",
    "lake_bloom_point_lookup",
    # round-3 widening batches G-H: curation, fusion, lake evolution
    "dsir_importance_weights",
    "hybrid_rrf_fusion",
    "lake_deletion_vectors",
    "incr_join_view_maintenance",
    # round-3 widening batch J: multi-leader maintenance + online migration
    "lake_tombstone_gc",
    "lake_online_migration",
    # round-3 widening batch K: interop + wall-clock time travel
    "cdc_debezium_roundtrip",
    "lake_timestamp_asof",
    # round-4: trace/config audit, 3-way config join, continuous Debezium
    # tail, cascaded lake-to-lake replication
    "cdc_trace_chain",
    "config_threeway_join",
    "cdc_debezium_tail",
    "lake_replicate_follower",
    "wal_ship_roundtrip",
    "lake_segmented_manifest",
    # round-4 session 2: blob-container source, point-in-time backup
    "blob_container_route",
    "lake_backup_restore",
    # round-5: typed tabular translator (ADF TabularTranslator parity)
    "csv_typed_translate",
]


def _init_ray(num_cpus: int, object_store_mb: int | None = None) -> None:
    import ray

    if not ray.is_initialized():
        kw = {}
        if object_store_mb:
            kw["object_store_memory"] = object_store_mb * 1024 * 1024
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
            **kw,
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    # warmup: force the worker pool to spawn + import numpy/pandas so the
    # first timed pipeline measures steady-state, not process startup
    import ray.data

    ray.data.range(num_cpus * 4, override_num_blocks=num_cpus * 4).map_batches(
        _warm, batch_format="pyarrow"
    ).count()


def _warm(batch):
    import numpy  # noqa: F401
    import pandas  # noqa: F401

    return batch


def _consume(result) -> int:
    """Force execution; return row count."""
    import pandas as pd
    import pyarrow as pa

    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.count()
    if isinstance(result, (pa.Table, pd.DataFrame)):
        return len(result)
    return 0


def run_headline(sf_dir: str, num_cpus: int) -> dict:
    _init_ray(num_cpus)
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    import gc

    for name in HEADLINE:
        # best-of-2: the sandbox host's throughput drifts ±30-50% between
        # moments (see BASELINE.md); the min is the reproducible number
        best = None
        for _ in range(2):
            # drop lingering Dataset/block refs from the previous query so
            # its object-store blocks are freed before timing this one —
            # without this, late queries in the 50+-query session time
            # 2-4x their isolated wall (measured: multi_epoch 9.1s in-
            # session vs 3.6s isolated at sf0.1)
            gc.collect()
            t0 = time.time()
            _consume(qs[name](sf_dir))
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)

    # flagship throughput: change-events/sec of the single-epoch full replay
    n_events = _num_events(sf_dir)
    rate = round(n_events / timings["cdc_final_state"], 1)

    # same-window host-capacity control, AFTER the timed section: the
    # sandbox host's deliverable throughput drifts ~10x between windows
    # (BASELINE.md); embedding the pure-numpy control in the default run
    # lets a degraded-window headline be read against what the VM itself
    # could deliver at that moment. GRAFT_BENCH_CONTROL=0 disables.
    host_control = None
    if os.environ.get("GRAFT_BENCH_CONTROL", "1") != "0":
        sys.path.insert(0, os.path.join(REPO, "tools"))
        try:
            from host_control import run_control

            host_control = run_control(8, num_cpus)
        except Exception:
            host_control = None

    return {
        "metric": "headline pipelines total wall time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "cdc_events_per_sec": rate,
        "cdc_events": n_events,
        "host_control": host_control,
        "note": (
            "cdc_events_per_sec at this sf is fixed-overhead-bound "
            f"({n_events} events); sustained rates at scale and scaling "
            "evidence are in BASELINE.md (round 3: 96M events 12.2s = "
            "7.87M ev/s, 24M events 2.73s = 8.78M ev/s at 32 cpus after "
            "the replay block-coalescing fix; pinned paired 8v32 scaling "
            "medians 0.833/0.809) via bench.py --sustained / --scaling. Round 3 "
            "also fixed the round-2 96M regression (one block per shard "
            "file entering the merge exchange) previously misattributed "
            "to host noise; see BASELINE.md round-3 headline for the "
            "paired same-window A/B against round-1/round-2 code."
        ),
    }


def _num_events(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(os.path.join(sf_dir, "events.parquet")).metadata.num_rows


# ------------------------------------------------------------------ scaling

def _materialize_stream(
    sf_dir: str, multiplier: int, out_dir: str, hot_frac: float = 0.0
) -> int:
    """Write the derived change stream ×multiplier as seq-ordered shards.

    Seq ranges of the replicas are disjoint (replica j offset by j*max_seq)
    so the replay is a valid binlog; each replica re-keys a third of the
    conversations to widen the key space.  Returns total events written.

    ``hot_frac`` > 0 plants key skew: that fraction of every replica's
    events is re-keyed onto a SINGLE conversation (turn_idx fanned out so
    rows stay distinct) — the hot-partition adversary for the salted
    pre-reduce (``--skew`` mode).
    """
    _init_ray(NUM_CPUS)
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from data_exchange_routing_ray.pipelines.events_cdc import derived_change_stream

    base = derived_change_stream(sf_dir).materialize()
    tables = [ray_get_all(base)]
    tab = pa.concat_tables(tables[0])
    if hot_frac > 0:
        import numpy as np

        n = tab.num_rows
        k = int(n * hot_frac)
        # deterministic pick: the k lowest seq%997 rows become the hot conv
        order = np.argsort(tab["seq"].to_numpy() % 997, kind="stable")[:k]
        hot = np.zeros(n, bool)
        hot[order] = True
        conv = np.asarray(tab["conv_id"].to_pylist(), object)
        conv[hot] = "conv-hot"
        turn = tab["turn_idx"].to_numpy(zero_copy_only=False).copy()
        # fan turn_idx so hot rows are distinct keys within the hot conv
        turn[hot] = np.arange(int(hot.sum()), dtype=turn.dtype) % 100_000
        tab = tab.set_column(
            tab.schema.get_field_index("conv_id"), "conv_id",
            pa.array(conv, pa.string()),
        )
        tab = tab.set_column(
            tab.schema.get_field_index("turn_idx"), "turn_idx",
            pa.array(turn, tab["turn_idx"].type),
        )
    span = pc.max(tab["seq"]).as_py() + 1
    total = 0
    os.makedirs(out_dir, exist_ok=True)
    for j in range(multiplier):
        t = tab
        if j:
            t = t.set_column(
                t.schema.get_field_index("seq"),
                "seq",
                pc.add(t["seq"], pa.scalar(j * span, pa.int64())),
            )
            conv = pc.binary_join_element_wise(
                t["conv_id"], pa.array([f"r{j}"] * t.num_rows), "-"
            )
            if hot_frac > 0:
                # the hot conversation stays ONE global key across replicas
                conv = pc.if_else(
                    pc.equal(t["conv_id"], pa.scalar("conv-hot")),
                    t["conv_id"], conv,
                )
            t = t.set_column(t.schema.get_field_index("conv_id"), "conv_id", conv)
        pq.write_table(t, os.path.join(out_dir, f"changes-{j:05d}.parquet"))
        total += t.num_rows
    return total


def ray_get_all(ds):
    import ray

    return [ray.get(r) for r in ds.to_arrow_refs()]


def _spill_stats() -> dict | None:
    """Best-effort spill counters: sum the session's on-disk spilled-object
    files (the gRPC stats API isn't available in this container)."""
    try:
        import glob

        import ray

        sess = ray._private.worker._global_node.get_session_dir_path()
        files = [
            f
            for f in glob.glob(
                os.path.join(sess, "ray_spilled_objects*", "**"),
                recursive=True,
            )
            if os.path.isfile(f)
        ]
        return {
            "spilled_mib": round(
                sum(os.path.getsize(f) for f in files) / 2**20, 1
            ),
            "spilled_files": len(files),
        }
    except Exception:
        return None


def run_replay_once(
    stream_dir: str, num_cpus: int, lake_dir: str, repeats: int = 2,
    object_store_mb: int | None = None, num_salts: int = 1,
) -> dict:
    """One fresh-process replay: full engine (validate→merge→commit).

    Runs ``repeats`` passes (fresh lake dir each) within the session and
    reports the best — measuring steady-state throughput, not page-cache /
    scheduler warmup noise."""
    _init_ray(num_cpus, object_store_mb)
    import glob
    import shutil

    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    files = sorted(glob.glob(os.path.join(stream_dir, "*.parquet")))
    if not files:
        raise SystemExit(f"no parquet change files under {stream_dir}")
    import pyarrow.parquet as pq

    n = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    times = []
    for r in range(repeats):
        d = f"{lake_dir}-r{r}"
        shutil.rmtree(d, ignore_errors=True)
        lake = CDCLake(d, num_partitions=64, num_salts=num_salts)
        t0 = time.time()
        lake.replay_files(files, files_per_epoch=len(files), quarantine=False)
        times.append(time.time() - t0)
    dt = min(times)
    out = {"num_cpus": num_cpus, "events": n, "sec": round(dt, 3),
           "events_per_sec": round(n / dt, 1),
           "all_runs_sec": [round(t, 3) for t in times]}
    if object_store_mb:
        out["object_store_mb"] = object_store_mb
        out["spill"] = _spill_stats()
    if num_salts != 1:
        out["num_salts"] = num_salts
    return out


def run_scaling(sf_dir: str, lo: int, hi: int, multiplier: int) -> dict:
    with tempfile.TemporaryDirectory(prefix="bench-scaling-") as d:
        stream_dir = os.path.join(d, "stream")
        total = _materialize_stream(sf_dir, multiplier, stream_dir)
        import ray

        ray.shutdown()

        def one(cpus: int) -> dict:
            cmd = [
                sys.executable, os.path.abspath(__file__),
                "--replay-once", stream_dir,
                "--cpus", str(cpus),
                "--lake", os.path.join(d, f"lake-{cpus}"),
            ]
            pin = os.environ.get("GRAFT_SCALING_PIN", "1") != "0"
            if pin and shutil.which("taskset"):
                # pin the session to its CPU budget (taskset, default on):
                # the lo run can't opportunistically borrow idle cores
                # beyond its grant, tightening the paired comparison
                cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
            out = subprocess.run(
                cmd, capture_output=True, text=True, check=True, cwd=REPO,
            )
            return json.loads(out.stdout.strip().splitlines()[-1])

        # Sandbox host throughput drifts ±30-50% between time windows, so a
        # single lo-vs-hi comparison measures host luck, not the engine.
        # Protocol: PAIRED sessions — each pair runs lo then hi back-to-back
        # (matched host conditions), efficiency per pair, median over pairs.
        pairs = int(os.environ.get("GRAFT_SCALING_PAIRS", "4"))
        per_pair = []
        lo_runs, hi_runs = [], []
        for _ in range(pairs):
            r_lo, r_hi = one(lo), one(hi)
            lo_runs.append(r_lo)
            hi_runs.append(r_hi)
            per_pair.append(
                round(
                    (r_hi["events_per_sec"] / r_lo["events_per_sec"]) / (hi / lo), 3
                )
            )
        eff = sorted(per_pair)[len(per_pair) // 2]  # median
        r_lo = min(lo_runs, key=lambda r: r["sec"])
        r_hi = min(hi_runs, key=lambda r: r["sec"])
        # same-window host-capacity control (tools/host_control.py): the
        # sandbox host's concurrent throughput drifts 2-3x between windows;
        # the engine cannot scale past the host's own ceiling, so every
        # sample carries the ceiling it was measured under.
        host_control = None
        if os.environ.get("GRAFT_SCALING_CONTROL", "1") != "0":
            sys.path.insert(0, os.path.join(REPO, "tools"))
            from host_control import run_control

            host_control = run_control(lo, hi)
        return {
            "metric": "cdc replay scaling (fresh paired processes, same input)",
            "value": round(eff, 3),
            "unit": "efficiency",
            "sf": sf_dir,
            "events": total,
            "multiplier": multiplier,
            "lo": r_lo,
            "hi": r_hi,
            "per_pair_efficiency": per_pair,
            "scaling_efficiency": round(eff, 3),
            "host_control": host_control,
        }


def run_sustained(sf_dir: str, multiplier: int, cpus: int) -> dict:
    """Sustained-throughput sample: materialize the derived change stream
    ×multiplier (e.g. 960 × sf0.1 ≈ 96M events) to /tmp, then replay it in
    ONE fresh process through the full upsert path and report best-of-2
    events/s (the real flagship metric; the headline-mode number at toy sf
    is fixed-overhead-bound)."""
    keep = tempfile.mkdtemp(prefix="bench-sustained-")
    stream_dir = os.path.join(keep, "stream")
    total = _materialize_stream(sf_dir, multiplier, stream_dir)
    import ray

    ray.shutdown()
    out = subprocess.run(
        [
            sys.executable, os.path.abspath(__file__),
            "--replay-once", stream_dir,
            "--cpus", str(cpus),
            "--lake", os.path.join(keep, "lake"),
        ],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    res = json.loads(out.stdout.strip().splitlines()[-1])
    shutil.rmtree(keep, ignore_errors=True)
    host_control = None
    if os.environ.get("GRAFT_SCALING_CONTROL", "1") != "0":
        sys.path.insert(0, os.path.join(REPO, "tools"))
        from host_control import run_control

        host_control = run_control(8, cpus)
    return {
        "metric": "cdc replay sustained throughput (fresh process)",
        "value": res["events_per_sec"],
        "unit": "events/sec",
        "sf": sf_dir,
        "events": total,
        "multiplier": multiplier,
        "num_cpus": cpus,
        "run": res,
        "host_control": host_control,
    }


def run_spill(sf_dir: str, multiplier: int, cpus: int,
              object_store_mb: int) -> dict:
    """Backpressure/spill proof: replay a change stream whose in-flight
    working set is far larger than a deliberately tiny object store.
    A pipeline that materializes the dataset (or any stage of it) OOMs or
    crashes here; the streaming executor instead admits blocks under
    backpressure and spills what overflows — the single-node stand-in for
    '100 TB through a 256-node object store'. Reports the same events/s
    metric plus the session's spill counters."""
    keep = tempfile.mkdtemp(prefix="bench-spill-")
    stream_dir = os.path.join(keep, "stream")
    total = _materialize_stream(sf_dir, multiplier, stream_dir)
    import ray

    ray.shutdown()
    try:
        out = subprocess.run(
            [
                sys.executable, os.path.abspath(__file__),
                "--replay-once", stream_dir,
                "--cpus", str(cpus),
                "--lake", os.path.join(keep, "lake"),
                "--object-store-mb", str(object_store_mb),
            ],
            capture_output=True, text=True, check=True, cwd=REPO,
        )
        res = json.loads(out.stdout.strip().splitlines()[-1])
    finally:
        shutil.rmtree(keep, ignore_errors=True)
    return {
        "metric": "cdc replay under constrained object store (spill proof)",
        "value": res["events_per_sec"],
        "unit": "events/sec",
        "sf": sf_dir,
        "events": total,
        "multiplier": multiplier,
        "num_cpus": cpus,
        "object_store_mb": object_store_mb,
        "run": res,
    }


def run_skew(sf_dir: str, multiplier: int, cpus: int,
             hot_frac: float) -> dict:
    """Hot-key adversary A/B: replay a stream where ``hot_frac`` of all
    events hit ONE conversation, with the salted pre-reduce off
    (num_salts=1) vs on (num_salts=4). At scale a hot key pins one merge
    partition to hot_frac of the stream; salting splits its combine work
    across 4 sub-keys with a final per-key reduce (the north-star's
    'hot-conversation skew broken by salted sub-partitioning')."""
    keep = tempfile.mkdtemp(prefix="bench-skew-")
    stream_dir = os.path.join(keep, "stream")
    total = _materialize_stream(sf_dir, multiplier, stream_dir,
                                hot_frac=hot_frac)
    import ray

    ray.shutdown()

    def one(salts: int) -> dict:
        out = subprocess.run(
            [
                sys.executable, os.path.abspath(__file__),
                "--replay-once", stream_dir,
                "--cpus", str(cpus),
                "--lake", os.path.join(keep, f"lake-s{salts}"),
                "--salts", str(salts),
            ],
            capture_output=True, text=True, check=True, cwd=REPO,
        )
        return json.loads(out.stdout.strip().splitlines()[-1])

    try:
        unsalted, salted = one(1), one(4)
    finally:
        shutil.rmtree(keep, ignore_errors=True)
    return {
        "metric": "cdc replay under planted hot-key skew (salting A/B)",
        "value": round(
            salted["events_per_sec"] / unsalted["events_per_sec"], 3
        ),
        "unit": "salted/unsalted speedup",
        "sf": sf_dir,
        "events": total,
        "multiplier": multiplier,
        "hot_frac": hot_frac,
        "num_cpus": cpus,
        "unsalted": unsalted,
        "salted": salted,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--sustained", action="store_true",
                    help="one big fresh-process replay (events/s)")
    ap.add_argument("--spill", action="store_true",
                    help="replay under a tiny object store (spill proof)")
    ap.add_argument("--object-store-mb", type=int, default=None)
    ap.add_argument("--skew", action="store_true",
                    help="hot-key stream, salted vs unsalted A/B")
    ap.add_argument("--hot-frac", type=float, default=0.2)
    ap.add_argument("--salts", type=int, default=1)
    ap.add_argument("--cpus-lo", type=int, default=8)
    ap.add_argument("--cpus-hi", type=int, default=32)
    ap.add_argument("--multiplier", type=int,
                    default=int(os.environ.get("GRAFT_BENCH_MULTIPLIER", "240")))
    ap.add_argument("--replay-once", metavar="STREAM_DIR", default=None,
                    help="internal: one fresh-process replay")
    ap.add_argument("--cpus", type=int, default=NUM_CPUS)
    ap.add_argument("--lake", default=None)
    args = ap.parse_args()

    if args.replay_once:
        auto_lake_root = None
        if args.lake is None:
            # default to a tempdir so ad-hoc runs never dump lake output
            # (None-r0/ ...) into the cwd / repo root; removed after the
            # run so repeated ad-hoc replays can't fill /tmp with lakes
            auto_lake_root = tempfile.mkdtemp(prefix="bench-replay-")
            args.lake = os.path.join(auto_lake_root, "lake")
        # fair accounting: Arrow's global pool defaults to ALL host cores,
        # letting a low-num_cpus session exceed its budget through reader/
        # sort/compression threads; cap it to the 1-CPU-per-task grant
        os.environ.setdefault("ARROW_CPU_COUNT", "1")
        os.environ.setdefault("ARROW_IO_THREADS", "2")
        try:
            res = run_replay_once(
                args.replay_once, args.cpus, args.lake,
                object_store_mb=args.object_store_mb,
                num_salts=args.salts,
            )
        finally:
            if auto_lake_root is not None:
                # the -r{i} replay lakes live under this root too
                shutil.rmtree(auto_lake_root, ignore_errors=True)
    elif args.scaling:
        res = run_scaling(SF_DIR, args.cpus_lo, args.cpus_hi, args.multiplier)
    elif args.sustained:
        res = run_sustained(SF_DIR, args.multiplier, args.cpus)
    elif args.spill:
        res = run_spill(SF_DIR, args.multiplier, args.cpus,
                        args.object_store_mb or 512)
    elif args.skew:
        res = run_skew(SF_DIR, args.multiplier, args.cpus, args.hot_frac)
    else:
        res = run_headline(SF_DIR, NUM_CPUS)
    print(json.dumps(res))
    import ray

    if ray.is_initialized():
        ray.shutdown()


if __name__ == "__main__":
    main()
