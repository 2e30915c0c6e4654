"""Regression tests for the round-3 ADVICE findings (round 4).

Each test pins one fixed bug:
 1. GC floor fence must NOT apply to self-rebuilds (repartition / a second
    GC) — live rows with seq <= gc_watermark were silently destroyed.
 2. `cli gc` on a single-leader lake must be refused, not commit an empty
    table (engine mode is persisted in lake-config.json and adopted).
 3. poll_changefeed bootstrap must pin its read to the captured head epoch
    (a concurrent commit must not leak head+1 state into an offset-head feed).
 4. The multi-leader seq-tie content digest must normalize insert/update
    (maintenance rewrites op to 'update'; digests must not diverge by site).
 5. cutover_to must never regress the global replay fence (applied_offset).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

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


def test_gc_then_rebuild_preserves_live_rows_below_watermark(
    ray_session, tmp_path
):
    """ADVICE #1 (high): after gc_tombstones persists a watermark, a
    rebuild epoch (repartition_lake, a second GC) re-injects committed
    live rows whose seqs sit at/below that watermark — the GC floor fence
    must not destroy them."""
    from data_exchange_routing_ray.pipelines.cdc import CDCLake, gc_tombstones

    lake = CDCLake(str(tmp_path / "gcr"), num_partitions=4, multi_leader=True)
    lake.apply_changes(
        _changes([
            _row(10, "insert", "conv-old", 0, "old-but-live"),
            _row(20, "delete", "conv-dead", 1),
            _row(90, "insert", "conv-new", 2, "new"),
        ]),
        quarantine=False,
    )
    before = lake.final_table().to_pandas()
    assert set(before["conv_id"]) == {"conv-old", "conv-new"}

    # GC: watermark 50 kills the seq-20 tombstone; conv-old (seq 10) is a
    # LIVE row below the watermark and must survive every maintenance epoch
    gc_tombstones(lake, 50)
    assert lake.manifest.gc_watermark == 50
    t1 = lake.final_table().to_pandas()
    assert set(t1["conv_id"]) == {"conv-old", "conv-new"}, (
        "first GC must not fence live rows below the watermark"
    )

    # repartition (a rebuild) after the floor rose
    lake.repartition_lake(8)
    t2 = lake.final_table().to_pandas()
    assert set(t2["conv_id"]) == {"conv-old", "conv-new"}, (
        "repartition after GC destroyed live rows below gc_watermark"
    )
    assert dict(zip(t2["conv_id"], t2["text"]))["conv-old"] == "old-but-live"

    # a second GC run (same watermark) is also a rebuild
    gc_tombstones(lake, 50)
    t3 = lake.final_table().to_pandas()
    assert set(t3["conv_id"]) == {"conv-old", "conv-new"}

    # the floor fence still rejects genuinely STALE external writes
    lake.apply_changes(
        _changes([_row(15, "insert", "conv-dead", 1, "resurrect?")]),
        quarantine=False, fence=False,
    )
    t4 = lake.final_table().to_pandas()
    assert "conv-dead" not in set(t4["conv_id"])


def test_cli_gc_refused_on_single_leader_lake(ray_session, tmp_path, capsys):
    """ADVICE #2 (medium): engine mode is persisted; `cli gc` on a
    single-leader lake errors out instead of committing an empty table."""
    from data_exchange_routing_ray.cli import main
    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    lake_dir = str(tmp_path / "sl")
    lake = CDCLake(lake_dir, num_partitions=4)
    lake.apply_changes(
        _changes([_row(1, "insert", "c0", 0, "x"),
                  _row(2, "insert", "c1", 1, "y")]),
        quarantine=False,
    )
    epoch_before = lake.manifest.epoch

    rc = main(["gc", "--lake", lake_dir, "--watermark", "1"])
    assert rc == 3
    err = capsys.readouterr().err
    assert "multi_leader" in err or "multi-leader" in err

    # table untouched, no rebuild epoch committed
    reopened = CDCLake(lake_dir)
    assert reopened.manifest.epoch == epoch_before
    t = reopened.final_table().to_pandas()
    assert sorted(t["conv_id"]) == ["c0", "c1"]


def test_engine_mode_persisted_and_adopted(ray_session, tmp_path):
    """Reopening a lake adopts the persisted engine mode regardless of the
    constructor default (same precedent as num_partitions adoption)."""
    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    lake_dir = str(tmp_path / "ml")
    lake = CDCLake(lake_dir, num_partitions=4, multi_leader=True)
    lake.apply_changes(
        _changes([_row(1, "insert", "a", 0, "x"),
                  _row(2, "delete", "b", 1)]),
        quarantine=False,
    )
    # default constructor (no multi_leader flag) adopts the persisted mode:
    # tombstones stay filtered on reads instead of surfacing as live rows
    reopened = CDCLake(lake_dir, num_partitions=4)
    assert reopened.multi_leader is True
    t = reopened.final_table().to_pandas()
    assert list(t["conv_id"]) == ["a"]
    # a branch of the lake inherits the mode too
    br = reopened.create_branch("feature")
    assert br.multi_leader is True


def test_poll_changefeed_bootstrap_pinned_to_head(ray_session, tmp_path):
    """ADVICE #3 (medium): the bootstrap feed must reflect the epoch the
    consumer will commit as its offset, not whatever the manifest says at
    materialization time (exactly-once under live ingest)."""
    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    lake = CDCLake(str(tmp_path / "pc"), num_partitions=4)
    lake.apply_changes(
        _changes([_row(1, "insert", "a", 0, "v1")]), quarantine=False
    )
    expect, head, feed = lake.poll_changefeed("grp")
    assert expect is None and head == lake.manifest.epoch

    # a concurrent writer commits BEFORE the consumer materializes the feed
    lake.apply_changes(
        _changes([_row(2, "update", "a", 0, "v2"),
                  _row(3, "insert", "b", 1, "w")]),
        quarantine=False,
    )
    rows = feed.to_pandas()
    assert list(rows["after_text"]) == ["v1"], (
        "bootstrap feed leaked post-head state; the next poll would "
        "re-deliver changefeed(head, head+1) and double-apply"
    )
    lake.consumers.commit("grp", head, expect=expect)
    # next poll delivers exactly the missed changes
    expect2, head2, feed2 = lake.poll_changefeed("grp")
    assert expect2 == head and head2 == head + 1
    f2 = feed2.to_pandas().sort_values(["conv_id", "turn_idx"])
    assert list(f2["op"]) == ["update", "insert"]
    assert list(f2["after_text"]) == ["v2", "w"]


def test_content_digest_op_normalized(ray_session):
    """ADVICE #4 (low): maintenance rewrites op insert→update; the seq-tie
    digest must be invariant to that, while delete still arbitrates."""
    from data_exchange_routing_ray.stages.upsert import _content_digest

    def tbl(op):
        return pa.table({
            "op": pa.array([op]),
            "role": pa.array(["user"]),
            "text": pa.array(["hello"]),
            "tool": pa.array([None], pa.string()),
            "ts": pa.array([1_700_000_000_000_000], pa.timestamp("us")),
        })

    d_ins = _content_digest(tbl("insert"))
    d_upd = _content_digest(tbl("update"))
    d_del = _content_digest(tbl("delete"))
    assert d_ins[0] == d_upd[0], "GC'd and non-GC'd sites diverge on ties"
    assert d_del[0] != d_ins[0], "delete must remain tie-break-distinct"


def test_cutover_never_regresses_applied_offset(ray_session, tmp_path):
    """ADVICE #5 (low): adopting a shadow branch whose applied_offset
    trails main's must not lower the global replay fence."""
    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    lake = CDCLake(str(tmp_path / "co"), num_partitions=4)
    lake.apply_changes(
        _changes([_row(5, "insert", "a", 0, "base")]), quarantine=False
    )
    br = lake.create_branch("shadow")
    # shadow rewrites the row at a LOWER seq space (its own migration
    # counter), so its applied_offset trails main's after main advances
    br.apply_changes(
        _changes([_row(6, "update", "a", 0, "migrated")]), quarantine=False
    )
    lake.apply_changes(
        _changes([_row(200, "insert", "b", 1, "hot")]), quarantine=False
    )
    br.apply_changes(
        _changes([_row(101, "insert", "b", 1, "hot")]), quarantine=False
    )
    # the regression scenario: shadow offset strictly below main's
    assert br.manifest.applied_offset < lake.manifest.applied_offset
    main_off = lake.manifest.applied_offset
    lake.cutover_to(br)
    assert lake.manifest.applied_offset >= main_off, (
        "cutover regressed the replay fence: a replayed shard in the gap "
        "would re-apply pre-migration rows over the migrated table"
    )
    # and a replayed stale shard in the gap is fenced
    res = lake.apply_changes(
        _changes([_row(main_off, "update", "a", 0, "pre-migration")]),
        quarantine=False,
    )
    assert res.changes_applied == 0
    t = lake.final_table().to_pandas()
    assert dict(zip(t["conv_id"], t["text"]))["a"] == "migrated"
