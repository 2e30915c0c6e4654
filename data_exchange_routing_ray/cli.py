"""CLI entry point — the ``ray job submit`` surface of the engine.

On a real cluster::

    ray job submit --working-dir . -- \
        python -m data_exchange_routing_ray.cli replay \
        --lake /mnt/lake --stream /mnt/changes --files-per-epoch 8

Locally the same command runs against a local session. This module is the
ONLY library-side owner of a Ray session, and only when none exists (the
driver/test harness owns it otherwise).

Subcommands:
  replay       tail a directory of seq-ordered change shards into the lake
               (resumes from the committed watermark; crash-safe)
  tail         continuously poll a change-shard dir (long-running ingest)
  status       print the lake's manifest summary + lineage tail as JSON
  vacuum       delete partition files unreferenced by the current manifest
  gc           compact multi-leader tombstones at/below the cross-site
               watermark (persists the floor fence)
  repartition  rewrite the lake into a new partition count (one epoch)
  export       incremental export of partitions changed since an epoch
  merge        MERGE INTO from a staging parquet
  diff         changefeed envelopes between two epochs
  card         dataset-card metrics
  rollback     restore the table to an archived epoch
  branch       zero-copy branch create/list/ff
  compact      fold open delta files into fresh bases
  replicate    drain a source lake's changefeed into this lake (follower)
  requeue      re-enqueue dead-letter rows above the watermark
  ship         export new epochs as Debezium JSONL WAL shards
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def _ensure_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        if num_cpus is not None:
            kwargs.update(address="local", num_cpus=num_cpus)
        ray.init(**kwargs)


def cmd_replay(args: argparse.Namespace) -> int:
    _ensure_ray(args.num_cpus)
    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    files = sorted(glob.glob(os.path.join(args.stream, "*.parquet")))
    if not files:
        print(f"error: no parquet change shards under {args.stream}", file=sys.stderr)
        return 2
    lake = CDCLake(
        args.lake,
        num_partitions=args.num_partitions,
        num_salts=args.num_salts,
        merge_mode=args.merge_mode,
        schema_policy=getattr(args, "schema_policy", "evolve"),
    )
    try:
        results = lake.replay_files(
            files,
            files_per_epoch=args.files_per_epoch,
            quarantine=not args.no_quarantine,
        )
        for r in results:
            print(
                json.dumps(
                    {
                        "epoch": r.epoch,
                        "applied_offset": r.applied_offset,
                        "changes_applied": r.changes_applied,
                        "changes_fenced": r.changes_fenced,
                        "rows_quarantined": r.rows_quarantined,
                        "total_rows": r.total_rows,
                    }
                )
            )
        if not results:
            print(json.dumps({"skipped": "all shards at or below watermark"}))
    finally:
        lake.close()
    return 0


def cmd_tail(args: argparse.Namespace) -> int:
    _ensure_ray(args.num_cpus)
    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    lake = CDCLake(
        args.lake, num_partitions=args.num_partitions, merge_mode=args.merge_mode
    )
    try:
        for r in lake.tail(
            args.stream,
            poll_interval=args.poll_interval,
            max_epochs=args.max_epochs,
            idle_polls=args.idle_polls,
            files_per_epoch=args.files_per_epoch,
        ):
            print(
                json.dumps(
                    {
                        "epoch": r.epoch,
                        "applied_offset": r.applied_offset,
                        "changes_applied": r.changes_applied,
                        "rows_quarantined": r.rows_quarantined,
                        "total_rows": r.total_rows,
                    }
                ),
                flush=True,
            )
    finally:
        lake.close()
    return 0


def cmd_status(args: argparse.Namespace) -> int:
    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    if not os.path.isdir(args.lake):
        print(f"error: no lake at {args.lake}", file=sys.stderr)
        return 2
    lake = CDCLake(args.lake)
    man = lake.manifest
    if getattr(args, "as_of", None) is not None:
        # TIMESTAMP AS OF: resolve the wall-clock µs against the lineage
        # commit log and report THAT epoch's manifest
        try:
            epoch = lake.epoch_as_of(args.as_of)
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 2
        man = lake.manifest_at(epoch)
    out = {
        "lake": args.lake,
        "epoch": man.epoch,
        "applied_offset": man.applied_offset,
        "num_partitions": man.num_partitions,
        "partitions_committed": len(man.partitions),
        "total_rows": sum(e.rows for e in man.partitions.values()),
        "schema_registry": list(man.schema_names),
        "config_version": man.config_version,
    }
    lin = lake.lineage.read_all()
    if lin.num_rows:
        tail = lin.slice(max(0, lin.num_rows - args.lineage_tail)).to_pylist()
        out["lineage_tail"] = [
            {k: (str(v) if hasattr(v, "isoformat") else v) for k, v in r.items()}
            for r in tail
        ]
    print(json.dumps(out, indent=1, default=str))
    return 0


def cmd_offsets(args: argparse.Namespace) -> int:
    """Committed consumer-group offsets plus each group's lag (epochs
    behind the lake head) — the monitoring surface of poll_changefeed."""
    if not os.path.isdir(args.lake):
        print(f"error: no lake at {args.lake}", file=sys.stderr)
        return 2
    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    lake = CDCLake(args.lake)
    head = lake.manifest.epoch
    groups = lake.consumers.groups()
    print(json.dumps({
        "head_epoch": head,
        "groups": {
            g: {"epoch": e, "lag": head - e} for g, e in groups.items()
        },
    }))
    return 0


def cmd_vacuum(args: argparse.Namespace) -> int:
    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    removed = CDCLake(args.lake).vacuum()
    print(json.dumps({"removed_files": removed}))
    return 0


def cmd_gc(args: argparse.Namespace) -> int:
    """Compact multi-leader tombstones at/below the cross-site watermark
    (min applied_offset over all replication sites) and persist that
    watermark as the floor fence future epochs enforce."""
    if not os.path.isdir(args.lake):
        print(f"error: no lake at {args.lake}", file=sys.stderr)
        return 2
    _ensure_ray(args.num_cpus)
    from data_exchange_routing_ray.pipelines.cdc import CDCLake, gc_tombstones

    # engine mode is persisted in the lake's config and adopted on reopen:
    # gc on a single-leader lake is refused by gc_tombstones' mode check
    # instead of silently rebuilding an empty table
    lake = CDCLake(args.lake)
    try:
        r = gc_tombstones(lake, args.watermark)
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 3
    print(
        json.dumps(
            {
                "epoch": r.epoch,
                "gc_watermark": args.watermark,
                "total_rows": r.total_rows,
                "applied_offset": r.applied_offset,
            }
        )
    )
    return 0


def cmd_export(args: argparse.Namespace) -> int:
    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    if not os.path.isdir(args.lake):
        print(f"error: no lake at {args.lake}", file=sys.stderr)
        return 2
    lake = CDCLake(args.lake)
    changed = lake.changed_partitions(args.since_epoch)
    rows = lake.export_incremental(args.since_epoch, args.out)
    print(
        json.dumps(
            {
                "since_epoch": args.since_epoch,
                "current_epoch": lake.manifest.epoch,
                "partitions_exported": changed,
                "rows_exported": rows,
                "out": args.out,
            }
        )
    )
    return 0


def cmd_merge(args: argparse.Namespace) -> int:
    """MERGE INTO the lake from a staging parquet (matched update/delete,
    not-matched insert) — the SQL-MERGE operational surface."""
    if not os.path.isdir(args.lake):
        print(f"error: no lake at {args.lake}", file=sys.stderr)
        return 2
    _ensure_ray(args.num_cpus)
    import ray.data

    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    lake = CDCLake(args.lake)
    staging = ray.data.read_parquet(args.staging)
    res = lake.merge_into(staging, delete_col=args.delete_col)
    print(
        json.dumps(
            {
                "epoch": res.epoch,
                "changes_applied": res.changes_applied,
                "changes_fenced": res.changes_fenced,
                "total_rows": res.total_rows,
            }
        )
    )
    return 0


def cmd_replicate(args: argparse.Namespace) -> int:
    """Cascaded lake-to-lake replication: drain the source lake's
    changefeed into this lake via consumer-group offsets (exactly-once
    across the apply/offset crash window; see CDCLake.replicate_from)."""
    if not os.path.isdir(args.source):
        print(f"error: no source lake at {args.source}", file=sys.stderr)
        return 2
    _ensure_ray(args.num_cpus)
    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    src = CDCLake(args.source, branch=args.source_branch)
    dst = CDCLake(args.lake)

    def _emit(r):
        print(json.dumps({
            "epoch": r.epoch,
            "changes_applied": r.changes_applied,
            "changes_fenced": r.changes_fenced,
            "total_rows": r.total_rows,
        }), flush=True)

    if getattr(args, "follow", False):
        import time as _time

        idle = 0
        while args.idle_polls is None or idle < args.idle_polls:
            results = dst.replicate_from(src, group=args.group)
            if results:
                idle = 0
                for r in results:
                    _emit(r)
            else:
                idle += 1
                _time.sleep(args.poll_interval)
        return 0
    results = dst.replicate_from(src, group=args.group)
    for r in results:
        _emit(r)
    if not results:
        print(json.dumps({"skipped": "already at source head"}))
    return 0


def cmd_ship(args: argparse.Namespace) -> int:
    """Outbound WAL shipping: export newly committed epochs as Debezium
    JSONL WAL shards (one per epoch) under --out; incremental via the
    shipper's consumer offset."""
    if not os.path.isdir(args.lake):
        print(f"error: no lake at {args.lake}", file=sys.stderr)
        return 2
    _ensure_ray(args.num_cpus)
    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    lake = CDCLake(args.lake)
    written = lake.ship_changefeed(args.out, group=args.group)
    print(json.dumps({
        "shards_written": [os.path.basename(p) for p in written],
        "head_epoch": lake.manifest.epoch,
    }))
    return 0


def cmd_requeue(args: argparse.Namespace) -> int:
    """Dead-letter redelivery: re-enqueue quarantined rows as a new epoch
    with seqs re-based above the watermark; consumed dead-letter files
    archive to quarantine-requeued/ so redelivery is one-shot."""
    if not os.path.isdir(args.lake):
        print(f"error: no lake at {args.lake}", file=sys.stderr)
        return 2
    _ensure_ray(args.num_cpus)
    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    lake = CDCLake(args.lake)
    res = lake.requeue_quarantined(
        epoch=args.epoch, error=args.error, op_override=args.op_override
    )
    if res is None:
        print(json.dumps({"skipped": "no matching dead-letter rows"}))
        return 0
    print(json.dumps({
        "epoch": res.epoch,
        "changes_applied": res.changes_applied,
        "rows_requarantined": res.rows_quarantined,
        "total_rows": res.total_rows,
    }))
    return 0


def cmd_rollback(args: argparse.Namespace) -> int:
    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    if not os.path.isdir(args.lake):
        print(f"error: no lake at {args.lake}", file=sys.stderr)
        return 2
    lake = CDCLake(args.lake)
    try:
        head = lake.rollback_to(args.epoch)
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 3
    print(json.dumps({"restored_epoch": args.epoch, "new_head": head}))
    return 0


def cmd_backup(args: argparse.Namespace) -> int:
    """Point-in-time consistent backup (CDCLake.backup_to): one manifest
    read + immutable-file copy; restore = point any command at the backup
    dir. Safe under live writers (CoW data files)."""
    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    if not os.path.isdir(args.lake):
        print(f"error: no lake at {args.lake}", file=sys.stderr)
        return 2
    lake = CDCLake(args.lake)
    try:
        info = lake.backup_to(args.dest)
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 3
    print(json.dumps({"dest": args.dest, **info}))
    return 0


def cmd_fsck(args: argparse.Namespace) -> int:
    """Lake integrity check: manifest-referenced files exist, footer row
    counts match, no seq above the fence; --deep re-reads every page."""
    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    if not os.path.isdir(args.lake):
        print(f"error: no lake at {args.lake}", file=sys.stderr)
        return 2
    rep = CDCLake(args.lake).fsck(deep=args.deep)
    print(json.dumps(rep))
    return 0 if rep["ok"] else 4


def cmd_alter(args: argparse.Namespace) -> int:
    """Metadata-only column DDL: rename / drop (Iceberg-style name mapping;
    no data file rewritten, OCC-fenced manifest commit)."""
    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    if not os.path.isdir(args.lake):
        print(f"error: no lake at {args.lake}", file=sys.stderr)
        return 2
    lake = CDCLake(args.lake)
    try:
        if args.action == "rename":
            if not args.to:
                print("error: rename requires --to", file=sys.stderr)
                return 2
            epoch = lake.rename_column(args.column, args.to)
        else:
            epoch = lake.drop_column(args.column)
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 3
    print(
        json.dumps(
            {
                "action": args.action,
                "column": args.column,
                "to": args.to,
                "epoch": epoch,
                "column_renames": lake.manifest.column_renames,
                "column_drops": lake.manifest.column_drops,
            }
        )
    )
    return 0


def cmd_diff(args: argparse.Namespace) -> int:
    """Changefeed envelopes between two committed epochs (row-level diff)."""
    if not os.path.isdir(args.lake):
        print(f"error: no lake at {args.lake}", file=sys.stderr)
        return 2
    _ensure_ray(args.num_cpus)
    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    lake = CDCLake(args.lake, branch=args.branch)
    try:
        feed = lake.changefeed_between(args.from_epoch, args.to_epoch)
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 3
    # STREAM the feed: a production-size epoch diff must never materialize
    # in driver memory. The distributed sort orders blocks globally, and
    # iter_batches then yields them in order — the driver holds one batch
    # at a time (bounded RSS) while emitting the same sorted output.
    feed = feed.sort(["conv_id", "turn_idx"])
    debezium = getattr(args, "format", "plain") == "debezium"
    if debezium:
        # standard Debezium envelopes so any Debezium-speaking consumer can
        # tail the lake's changefeed; source.sequence is the target epoch
        # (the commit that produced the change)
        from data_exchange_routing_ray.sources import to_debezium_envelope

    for batch in feed.iter_batches(batch_size=8192, batch_format="pyarrow"):
        ops = batch["op"].to_pylist()
        convs = batch["conv_id"].to_pylist()
        turns = batch["turn_idx"].to_pylist()
        before = batch["before_text"].to_pylist()
        after = batch["after_text"].to_pylist()
        out = []
        for op, conv, turn, b, a in zip(ops, convs, turns, before, after):
            if debezium:
                row = {
                    "conv_id": conv, "turn_idx": int(turn),
                    "role": None, "tool": None, "ts": None,
                    "text": b if op == "delete" else a,
                }
                out.append(json.dumps(
                    to_debezium_envelope(row, op, args.to_epoch), default=str
                ))
            else:
                out.append(json.dumps({
                    "op": op, "conv_id": conv, "turn_idx": int(turn),
                    "before_text": b, "after_text": a,
                }, default=str))
        if out:
            print("\n".join(out))
    return 0


def cmd_card(args: argparse.Namespace) -> int:
    """Dataset-card metrics of an existing lake (datasheet for a release)."""
    if not os.path.isdir(args.lake):
        print(f"error: no lake at {args.lake}", file=sys.stderr)
        return 2
    _ensure_ray(args.num_cpus)
    from data_exchange_routing_ray.pipelines.cdc import CDCLake
    from data_exchange_routing_ray.pipelines.events_cdc import dataset_card

    lake = CDCLake(args.lake, branch=args.branch)
    card = dataset_card(lake.final_dataset()).to_pylist()
    print(json.dumps({r["metric"]: r["value"] for r in card}))
    return 0


def cmd_branch(args: argparse.Namespace) -> int:
    """Zero-copy branch management: create / list / ff (fast-forward)."""
    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    if not os.path.isdir(args.lake):
        print(f"error: no lake at {args.lake}", file=sys.stderr)
        return 2
    lake = CDCLake(args.lake)
    if args.action == "create":
        br = lake.create_branch(args.name)
        print(json.dumps({"branch": args.name, "epoch": br.manifest.epoch}))
        return 0
    if args.action == "list":
        names = ["main"] + sorted(
            d[len("manifests-"):]
            for d in os.listdir(args.lake)
            if d.startswith("manifests-")
        )
        rows = []
        for nm in names:
            b = CDCLake(args.lake, branch=nm)
            m = b.manifest
            rows.append(
                {"branch": nm, "epoch": m.epoch, "applied_offset": m.applied_offset}
            )
        print(json.dumps(rows))
        return 0
    if args.action == "rebase":
        _ensure_ray(None)
        br = CDCLake(args.lake, branch=args.name)
        res = lake.rebase_from(br)
        print(json.dumps({"rebased": args.name, "epoch": res.epoch,
                          "changes_applied": res.changes_applied}))
        return 0
    if args.action == "ff":
        br = CDCLake(args.lake, branch=args.name)
        try:
            epoch = lake.fast_forward(br)
        except ValueError as e:
            print(f"error: {e}", file=sys.stderr)
            return 3
        print(json.dumps({"merged": args.name, "epoch": epoch}))
        return 0
    print(f"error: unknown action {args.action}", file=sys.stderr)
    return 2


def cmd_repartition(args: argparse.Namespace) -> int:
    if not os.path.isdir(args.lake):
        print(f"error: no lake at {args.lake}", file=sys.stderr)
        return 2
    _ensure_ray(args.num_cpus)
    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    lake = CDCLake(args.lake)
    r = lake.repartition_lake(args.num_partitions)
    print(
        json.dumps(
            {
                "epoch": r.epoch,
                "num_partitions": args.num_partitions,
                "total_rows": r.total_rows,
                "applied_offset": r.applied_offset,
            }
        )
    )
    return 0


def cmd_compact(args: argparse.Namespace) -> int:
    """Fold all open delta files into fresh base files (keeps the partition
    count): the manual compaction trigger for merge_policy='delta' lakes —
    e.g. before switching to the actors/exchange merge backends, which read
    base files only."""
    if not os.path.isdir(args.lake):
        print(f"error: no lake at {args.lake}", file=sys.stderr)
        return 2
    _ensure_ray(args.num_cpus)
    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    lake = CDCLake(args.lake)
    n_deltas = sum(len(e.deltas) for e in lake.manifest.partitions.values())
    if n_deltas == 0:
        print(json.dumps({"skipped": "no open delta files"}))
        return 0
    r = lake.repartition_lake(lake.num_partitions)
    print(
        json.dumps(
            {
                "epoch": r.epoch,
                "deltas_folded": n_deltas,
                "total_rows": r.total_rows,
                "applied_offset": r.applied_offset,
            }
        )
    )
    return 0


def cmd_health(args: argparse.Namespace) -> int:
    """Cheap liveness/servability probe (HealthCheckFunction.kt:7 analog):
    metadata-only, no Ray session, no data files opened — manifest parses,
    fence monotone, segment roots resolve, lineage tail parses. Exit 0
    when servable, 5 when not, 2 when the lake dir is absent."""
    from data_exchange_routing_ray.pipelines.cdc import lake_health

    rep = lake_health(args.lake, branch=args.branch)
    print(json.dumps(rep))
    if not os.path.isdir(args.lake):
        return 2
    return 0 if rep["ok"] else 5


def cmd_onboard(args: argparse.Namespace) -> int:
    """Onboarding generator (tools/onboarding/loadHL7Routes.py parity):
    emit/upsert the validated multi-route config for one stream — 1
    ingress route + 6 hl7_out_* routes for hl7 streams. Idempotent: same
    args → same file; an existing --out is upserted by route id."""
    from data_exchange_routing_ray.stages.route import onboard_routes

    existing = None
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                existing = json.load(f)
        except Exception as e:
            print(f"error: existing config unreadable: {e}", file=sys.stderr)
            return 2
    try:
        config = onboard_routes(
            args.stream_id,
            args.route,
            args.ingress_dest,
            args.program_dest,
            credential=args.credential,
            existing=existing,
        )
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 3
    tmp = args.out + ".tmp"
    with open(tmp, "w") as f:
        json.dump(config, f, indent=2, sort_keys=True)
    os.replace(tmp, args.out)
    print(
        json.dumps(
            {
                "out": args.out,
                "stream_id": args.stream_id,
                "route": args.route,
                "routes_total": len(config["routes"]),
            }
        )
    )
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="data_exchange_routing_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    rp = sub.add_parser("replay", help="replay change shards into the lake")
    rp.add_argument("--lake", required=True)
    rp.add_argument("--stream", required=True, help="dir of seq-ordered parquet shards")
    rp.add_argument("--files-per-epoch", type=int, default=8)
    rp.add_argument("--num-partitions", type=int, default=64)
    rp.add_argument("--num-salts", type=int, default=1)
    rp.add_argument("--merge-mode", choices=["groupby", "exchange", "actors"], default="groupby")
    rp.add_argument("--no-quarantine", action="store_true")
    rp.add_argument(
        "--schema-policy", choices=["evolve", "strict"], default="evolve",
        help="strict: dead-letter batches carrying unregistered columns",
    )
    rp.add_argument("--num-cpus", type=int, default=None)
    rp.set_defaults(fn=cmd_replay)

    tp = sub.add_parser("tail", help="continuously tail a change-shard dir")
    tp.add_argument("--lake", required=True)
    tp.add_argument("--stream", required=True)
    tp.add_argument("--poll-interval", type=float, default=2.0)
    tp.add_argument("--max-epochs", type=int, default=None)
    tp.add_argument("--idle-polls", type=int, default=None)
    tp.add_argument("--files-per-epoch", type=int, default=8)
    tp.add_argument("--num-partitions", type=int, default=64)
    tp.add_argument("--merge-mode", choices=["groupby", "exchange", "actors"], default="groupby")
    tp.add_argument("--num-cpus", type=int, default=None)
    tp.set_defaults(fn=cmd_tail)

    sp = sub.add_parser("status", help="manifest + lineage summary")
    sp.add_argument("--lake", required=True)
    sp.add_argument("--lineage-tail", type=int, default=8)
    sp.add_argument(
        "--as-of", type=int, default=None, metavar="TS_US",
        help="TIMESTAMP AS OF (µs since Unix epoch): report the manifest "
        "of the highest epoch committed at or before this wall-clock time",
    )
    sp.set_defaults(fn=cmd_status)

    op = sub.add_parser("offsets", help="committed consumer-group offsets")
    op.add_argument("--lake", required=True)
    op.set_defaults(fn=cmd_offsets)

    vp = sub.add_parser("vacuum", help="remove unreferenced partition files")
    vp.add_argument("--lake", required=True)
    vp.set_defaults(fn=cmd_vacuum)

    gp = sub.add_parser(
        "gc",
        help="compact multi-leader tombstones at/below the cross-site watermark",
    )
    gp.add_argument("--lake", required=True)
    gp.add_argument(
        "--watermark", type=int, required=True,
        help="min applied_offset across all replication sites",
    )
    gp.add_argument("--num-cpus", type=int, default=None)
    gp.set_defaults(fn=cmd_gc)

    rpp = sub.add_parser("repartition", help="rewrite the lake into a new partition count")
    rpp.add_argument("--lake", required=True)
    rpp.add_argument("--num-partitions", type=int, required=True)
    rpp.add_argument("--num-cpus", type=int, default=None)
    rpp.set_defaults(fn=cmd_repartition)

    ep = sub.add_parser(
        "export", help="incremental export of partitions changed since an epoch"
    )
    ep.add_argument("--lake", required=True)
    ep.add_argument("--since-epoch", type=int, required=True)
    ep.add_argument("--out", required=True)
    ep.set_defaults(fn=cmd_export)

    mg = sub.add_parser(
        "merge", help="MERGE INTO the lake from a staging parquet"
    )
    mg.add_argument("--lake", required=True)
    mg.add_argument("--staging", required=True)
    mg.add_argument("--delete-col", default="del_flag")
    mg.add_argument("--num-cpus", type=int, default=None)
    mg.set_defaults(fn=cmd_merge)

    df = sub.add_parser("diff", help="changefeed envelopes between two epochs")
    df.add_argument("--lake", required=True)
    df.add_argument("--from-epoch", type=int, required=True)
    df.add_argument("--to-epoch", type=int, required=True)
    df.add_argument("--branch", default="main")
    df.add_argument(
        "--format", choices=("plain", "debezium"), default="plain",
        help="debezium: emit standard Debezium change envelopes",
    )
    df.add_argument("--num-cpus", type=int, default=None)
    df.set_defaults(fn=cmd_diff)

    cd = sub.add_parser("card", help="dataset-card metrics of the lake")
    cd.add_argument("--lake", required=True)
    cd.add_argument("--branch", default="main")
    cd.add_argument("--num-cpus", type=int, default=None)
    cd.set_defaults(fn=cmd_card)

    rl = sub.add_parser(
        "replicate",
        help="drain a source lake's changefeed into this lake (follower)",
    )
    rl.add_argument("--lake", required=True, help="the FOLLOWER lake")
    rl.add_argument("--source", required=True, help="the leader lake dir")
    rl.add_argument("--source-branch", default="main")
    rl.add_argument(
        "--group", default=None,
        help="consumer group (default: derived from follower dir+branch)",
    )
    rl.add_argument("--follow", action="store_true",
                    help="keep polling the source (continuous follower)")
    rl.add_argument("--poll-interval", type=float, default=2.0)
    rl.add_argument("--idle-polls", type=int, default=None,
                    help="stop after N consecutive empty polls")
    rl.add_argument("--num-cpus", type=int, default=None)
    rl.set_defaults(fn=cmd_replicate)

    sh = sub.add_parser(
        "ship", help="export new epochs as Debezium JSONL WAL shards"
    )
    sh.add_argument("--lake", required=True)
    sh.add_argument("--out", required=True, help="WAL shard output dir")
    sh.add_argument("--group", default="wal-shipper")
    sh.add_argument("--num-cpus", type=int, default=None)
    sh.set_defaults(fn=cmd_ship)

    rq = sub.add_parser(
        "requeue", help="re-enqueue dead-letter rows above the watermark"
    )
    rq.add_argument("--lake", required=True)
    rq.add_argument("--epoch", type=int, default=None,
                    help="only this dead-letter epoch")
    rq.add_argument("--error", default=None,
                    help="only rows with this exact error class")
    rq.add_argument("--op-override", default=None,
                    help="repair: overwrite op before re-validation")
    rq.add_argument("--num-cpus", type=int, default=None)
    rq.set_defaults(fn=cmd_requeue)

    al = sub.add_parser("alter", help="metadata-only column rename/drop")
    al.add_argument("action", choices=["rename", "drop"])
    al.add_argument("--lake", required=True)
    al.add_argument("--column", required=True)
    al.add_argument("--to", default=None)
    al.set_defaults(fn=cmd_alter)

    rb = sub.add_parser("rollback", help="restore the table to an archived epoch")
    rb.add_argument("--lake", required=True)
    rb.add_argument("--epoch", type=int, required=True)
    rb.set_defaults(fn=cmd_rollback)

    bk = sub.add_parser("backup", help="point-in-time consistent backup")
    bk.add_argument("--lake", required=True)
    bk.add_argument("--dest", required=True)
    bk.set_defaults(fn=cmd_backup)

    fs = sub.add_parser("fsck", help="lake integrity check")
    fs.add_argument("--lake", required=True)
    fs.add_argument("--deep", action="store_true")
    fs.set_defaults(fn=cmd_fsck)

    bp = sub.add_parser("branch", help="zero-copy branch create/list/ff")
    bp.add_argument("action", choices=["create", "list", "ff", "rebase"])
    bp.add_argument("--lake", required=True)
    bp.add_argument("--name", default=None)
    bp.set_defaults(fn=cmd_branch)

    cp = sub.add_parser("compact", help="fold open delta files into fresh bases")
    cp.add_argument("--lake", required=True)
    cp.add_argument("--num-cpus", type=int, default=None)
    cp.set_defaults(fn=cmd_compact)

    hp = sub.add_parser(
        "health", help="cheap servability probe (no Ray, metadata only)"
    )
    hp.add_argument("--lake", required=True)
    hp.add_argument("--branch", default="main")
    hp.set_defaults(fn=cmd_health)

    ob = sub.add_parser(
        "onboard", help="generate/upsert the onboarding route config"
    )
    ob.add_argument("--stream-id", required=True)
    ob.add_argument("--route", required=True)
    ob.add_argument("--ingress-dest", required=True)
    ob.add_argument("--program-dest", required=True)
    ob.add_argument("--credential", default="")
    ob.add_argument("--out", required=True)
    ob.set_defaults(fn=cmd_onboard)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
