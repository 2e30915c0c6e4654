"""Round-4 trace-context + config-version audit surface.

Reference parity targets:
- RouteIngestedFile.kt:138-140 — trace_id / parent_span_id read from the
  source metadata and propagated into every processing-status report.
- RouteIngestedFile.kt:203 — the outgoing parent_span_id is THIS stage's
  child span, so stages chain.
- FnCacheUpdater.kt:22-52 — config changes are observable events: each
  epoch's manifest + lineage rows record which config routed it.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from data_exchange_routing_ray.schemas import CHANGE_SCHEMA


def _changes(rows):
    import ray.data

    cols = {f.name: [] for f in CHANGE_SCHEMA}
    for r in rows:
        for f in CHANGE_SCHEMA:
            cols[f.name].append(r.get(f.name))
    return ray.data.from_arrow(
        pa.table({k: pa.array(v, CHANGE_SCHEMA.field(k).type)
                  for k, v in cols.items()})
    )


def _row(seq, op, conv, turn, text=None):
    return {
        "seq": seq, "op": op, "conv_id": conv,
        "turn_idx": turn, "role": "user", "text": text,
        "tool": None, "ts": 1_700_000_000_000_000 + seq,
    }


def test_config_version_hot_reload_audited(ray_session, tmp_path):
    """A config hot-reload between epochs flips the stamped version in
    BOTH the manifest and that epoch's lineage rows; an epoch committed
    without a redeclared config carries the previous version forward."""
    from data_exchange_routing_ray.pipelines.cdc import CDCLake
    from data_exchange_routing_ray.stages.route import config_fingerprint

    cfg_v1 = config_fingerprint({"routes": [{"id": "r1"}]})
    cfg_v2 = config_fingerprint({"routes": [{"id": "r1"}, {"id": "r2"}]})
    assert cfg_v1 != cfg_v2
    # fingerprint is content-addressed, key-order independent
    assert cfg_v1 == config_fingerprint({"routes": [{"id": "r1"}]})

    lake = CDCLake(str(tmp_path / "cfg"), num_partitions=4)
    lake.set_config_version(cfg_v1)
    r0 = lake.apply_changes(
        _changes([_row(1, "insert", "a", 0, "x")]), quarantine=False
    )
    assert r0.config_version == cfg_v1
    assert lake.manifest.config_version == cfg_v1

    # HOT RELOAD between epochs
    lake.set_config_version(cfg_v2)
    r1 = lake.apply_changes(
        _changes([_row(2, "insert", "b", 1, "y")]), quarantine=False
    )
    assert r1.config_version == cfg_v2
    assert lake.manifest.config_version == cfg_v2

    # an epoch with no redeclared config carries the version forward
    lake2 = CDCLake(str(tmp_path / "cfg"), num_partitions=4)
    r2 = lake2.apply_changes(
        _changes([_row(3, "insert", "c", 2, "z")]), quarantine=False
    )
    assert r2.config_version == cfg_v2

    # lineage answers "which config routed epoch N" per epoch
    lin = lake2.lineage.read_all().to_pandas()
    by_epoch = lin.groupby("epoch")["config_version"].max()
    assert by_epoch[r0.epoch] == cfg_v1
    assert by_epoch[r1.epoch] == cfg_v2
    assert by_epoch[r2.epoch] == cfg_v2

    # archived manifests carry it too (time-travel audit)
    assert lake2.manifest_at(r0.epoch).config_version == cfg_v1
    assert lake2.manifest_at(r1.epoch).config_version == cfg_v2


def test_trace_context_chains_across_epochs(ray_session, tmp_path):
    """Every lineage row of an epoch carries the incoming trace context
    plus ONE deterministic child span; chaining the next epoch under
    EpochResult.span_id reproduces the reference's span tree."""
    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    lake = CDCLake(str(tmp_path / "tr"), num_partitions=4)
    r0 = lake.apply_changes(
        _changes([_row(1, "insert", "a", 0, "x"),
                  _row(2, "insert", "b", 1, "y")]),
        quarantine=False, trace_id="t-42", parent_span_id="root-span",
    )
    assert r0.span_id and len(r0.span_id) == 16
    r1 = lake.apply_changes(
        _changes([_row(3, "update", "a", 0, "x2")]),
        quarantine=False, trace_id="t-42", parent_span_id=r0.span_id,
    )
    lin = lake.lineage.read_all().to_pandas()
    e0 = lin[lin["epoch"] == r0.epoch]
    e1 = lin[lin["epoch"] == r1.epoch]
    assert set(e0["trace_id"]) == {"t-42"}
    assert set(e0["parent_span_id"]) == {"root-span"}
    assert set(e0["span_id"]) == {r0.span_id}
    assert set(e1["parent_span_id"]) == {r0.span_id}, "spans must chain"
    assert set(e1["span_id"]) == {r1.span_id}
    assert r1.span_id != r0.span_id

    # quarantine (FAILURE) reports carry the trace too
    lake.apply_changes(
        _changes([{"seq": 9, "op": "bogus", "conv_id": "c", "turn_idx": 0,
                   "role": "user", "text": "t", "tool": None,
                   "ts": 1_700_000_000_000_009}]),
        trace_id="t-43",
    )
    lin = lake.lineage.read_all().to_pandas()
    qrow = lin[lin["status"] == "QUARANTINED"].iloc[-1]
    assert qrow["trace_id"] == "t-43"
    assert qrow["span_id"]


def test_replay_files_reads_shard_trace_metadata(ray_session, tmp_path):
    """replay_files lifts trace_id/parent_span_id from the first shard's
    parquet key-value metadata (the blob sourceMetadata analog) without
    reading data pages."""
    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    shard_dir = tmp_path / "shards"
    os.makedirs(shard_dir)
    t = pa.table({
        "seq": pa.array([1, 2], pa.int64()),
        "op": pa.array(["insert", "insert"], pa.string()),
        "conv_id": pa.array(["a", "b"], pa.string()),
        "turn_idx": pa.array([0, 0], pa.int32()),
        "role": pa.array(["user", "user"], pa.string()),
        "text": pa.array(["x", "y"], pa.string()),
        "tool": pa.array([None, None], pa.string()),
        "ts": pa.array([1, 2], pa.timestamp("us")),
    })
    t = t.replace_schema_metadata(
        {b"trace_id": b"t-meta-7", b"parent_span_id": b"span-up"}
    )
    path = str(shard_dir / "shard-000001.parquet")
    pq.write_table(t, path)

    lake = CDCLake(str(tmp_path / "rf"), num_partitions=4)
    results = lake.replay_files([path], quarantine=False)
    assert len(results) == 1
    lin = lake.lineage.read_all().to_pandas()
    assert set(lin["trace_id"]) == {"t-meta-7"}
    assert set(lin["parent_span_id"]) == {"span-up"}
    assert set(lin["span_id"]) == {results[0].span_id}
