"""CDCLake.replicate_from — cascaded lake-to-lake replication (round 4).

Follower tails the leader's changefeed via consumer-group offsets;
exactly-once across the crash window (apply committed, offset not yet)
is guaranteed by seq fencing + the offset CAS.
"""

from __future__ import annotations

import pyarrow as pa

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
        "seq": seq, "op": op, "conv_id": conv, "turn_idx": turn,
        "role": "user", "text": text, "tool": None,
        "ts": 1_700_000_000_000_000 + seq,
    }


def _state(lake):
    t = lake.final_table().to_pandas()
    return dict(zip(zip(t["conv_id"], t["turn_idx"]), t["text"]))


def test_replicate_bootstrap_catchup_and_delete(ray_session, tmp_path):
    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    leader = CDCLake(str(tmp_path / "lead"), num_partitions=4)
    follower = CDCLake(str(tmp_path / "foll"), num_partitions=2)

    leader.apply_changes(
        _changes([_row(1, "insert", "a", 0, "x"),
                  _row(2, "insert", "b", 0, "y")]),
        quarantine=False,
    )
    r1 = follower.replicate_from(leader, group="g")
    assert len(r1) == 1 and _state(follower) == _state(leader)

    # update + delete on the leader; one catch-up diff
    leader.apply_changes(
        _changes([_row(3, "update", "a", 0, "x2"),
                  _row(4, "delete", "b", 0)]),
        quarantine=False,
    )
    r2 = follower.replicate_from(leader, group="g")
    assert len(r2) == 1
    assert r2[0].changes_applied == 2, "diff moves only the 2 changed keys"
    assert _state(follower) == _state(leader) == {("a", 0): "x2"}

    # caught up: no-op poll
    assert follower.replicate_from(leader, group="g") == []


def test_replicate_crash_between_apply_and_offset_commit(
    ray_session, tmp_path
):
    """Re-delivering the same diff (offset commit lost) is fenced to a
    no-op — exactly-once on the follower."""
    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    leader = CDCLake(str(tmp_path / "lead"), num_partitions=4)
    follower = CDCLake(str(tmp_path / "foll"), num_partitions=2)
    leader.apply_changes(
        _changes([_row(1, "insert", "a", 0, "x")]), quarantine=False
    )
    follower.replicate_from(leader, group="g")
    leader.apply_changes(
        _changes([_row(2, "update", "a", 0, "x2")]), quarantine=False
    )

    # simulate the crash: apply the diff WITHOUT committing the offset
    expect, head, feed = leader.poll_changefeed(
        "g", image_cols=("role", "text", "tool", "ts")
    )
    assert feed is not None
    seq = int(head)
    import pyarrow.compute as pc

    def to_changes(b):
        out = {
            "seq": pa.array([seq] * b.num_rows, pa.int64()),
            "op": b["op"], "conv_id": b["conv_id"],
            "turn_idx": b["turn_idx"].cast(pa.int32()),
            "role": b["after_role"], "text": b["after_text"],
            "tool": b["after_tool"],
            "ts": pc.coalesce(b["after_ts"], b["before_ts"]),
        }
        return pa.table(out)

    follower.apply_changes(
        feed.map_batches(to_changes, batch_format="pyarrow"),
        quarantine=False,
    )
    st_mid = _state(follower)

    # restart: replicate_from re-polls the SAME diff, fences it, then
    # finally advances the offset
    r = follower.replicate_from(leader, group="g")
    assert len(r) == 1
    assert r[0].changes_applied == 0 and r[0].changes_fenced > 0
    assert _state(follower) == st_mid == _state(leader)
    assert follower.replicate_from(leader, group="g") == []


def test_replicate_duplicate_follower_loses_cas(ray_session, tmp_path):
    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    leader = CDCLake(str(tmp_path / "lead"), num_partitions=4)
    f1 = CDCLake(str(tmp_path / "f1"), num_partitions=2)
    leader.apply_changes(
        _changes([_row(1, "insert", "a", 0, "x")]), quarantine=False
    )
    # two processes poll the same group concurrently: both read expect=None
    expect_a, head_a, feed_a = leader.poll_changefeed("g")
    expect_b, head_b, feed_b = leader.poll_changefeed("g")
    assert feed_a is not None and feed_b is not None
    leader.consumers.commit("g", head_a, expect=expect_a)
    import pytest

    with pytest.raises(Exception):
        leader.consumers.commit("g", head_b, expect=expect_b)
    # f1 via the API still converges
    assert f1.replicate_from(leader, group="g2") and _state(f1) == _state(leader)


def test_replicate_carries_evolved_columns(ray_session, tmp_path):
    """A leader that evolved its schema (extra payload column committed to
    the registry) replicates wholesale: the follower's table carries the
    evolved column's values, not just the round-1 columns."""
    import ray.data

    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    leader = CDCLake(str(tmp_path / "lead"), num_partitions=4)
    follower = CDCLake(str(tmp_path / "foll"), num_partitions=2)
    leader.apply_changes(
        _changes([_row(1, "insert", "a", 0, "x"),
                  _row(2, "insert", "b", 0, "y")]),
        quarantine=False,
    )
    # evolve: an update epoch carrying a new 'lang' column
    t = pa.table({
        "seq": pa.array([3], pa.int64()),
        "op": pa.array(["update"], pa.string()),
        "conv_id": pa.array(["a"], pa.string()),
        "turn_idx": pa.array([0], pa.int32()),
        "role": pa.array(["user"], pa.string()),
        "text": pa.array(["x2"], pa.string()),
        "tool": pa.array([None], pa.string()),
        "ts": pa.array([1_700_000_000_000_003], pa.timestamp("us")),
        "lang": pa.array(["en"], pa.string()),
    })
    leader.apply_changes(ray.data.from_arrow(t), quarantine=False)
    assert "lang" in leader.manifest.schema_names

    follower.replicate_from(leader, group="g")
    ft = follower.final_table().to_pandas().sort_values("conv_id")
    assert "lang" in ft.columns
    got = dict(zip(ft["conv_id"], zip(ft["text"], ft["lang"])))
    assert got["a"] == ("x2", "en")
    assert got["b"][0] == "y" and (
        got["b"][1] is None or got["b"][1] != got["b"][1]  # null/NaN
    )


def test_ship_changefeed_deletes_and_crash_reship(ray_session, tmp_path):
    """Outbound WAL shipping: deletes ship as before-image envelopes; a
    crashed shipper (offset lost for one epoch) re-ships that shard as an
    idempotent replace, and the downstream ledger skips the known name."""
    import os

    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    leader = CDCLake(str(tmp_path / "lead"), num_partitions=4)
    wal = str(tmp_path / "wal")
    leader.apply_changes(
        _changes([_row(1, "insert", "a", 0, "x"),
                  _row(2, "insert", "b", 0, "y")]),
        quarantine=False,
    )
    assert len(leader.ship_changefeed(wal)) == 1
    leader.apply_changes(
        _changes([_row(3, "delete", "a", 0),
                  _row(4, "update", "b", 0, "y2")]),
        quarantine=False,
    )
    assert len(leader.ship_changefeed(wal)) == 1
    assert leader.ship_changefeed(wal) == []

    down = CDCLake(str(tmp_path / "down"), num_partitions=2)
    list(down.tail_debezium(wal, poll_interval=0.01, idle_polls=1))
    assert _state(down) == _state(leader) == {("b", 0): "y2"}

    # crash window: the shipper's offset regresses one epoch → re-ship
    # rewrites the same shard name (idempotent replace) ...
    import json

    head = leader.manifest.epoch
    with open(  # simulate the lost CAS directly in the offsets store
        leader.consumers._path("wal-shipper"), "w"
    ) as f:
        json.dump({"group": "wal-shipper", "epoch": head - 1}, f)
    reshipped = leader.ship_changefeed(wal)
    assert [os.path.basename(p) for p in reshipped] == [
        f"wal-{head:012d}.jsonl"
    ]
    # ... and the downstream ledger already knows the name: nothing re-read
    assert list(
        down.tail_debezium(wal, poll_interval=0.01, idle_polls=1)
    ) == []
    assert _state(down) == {("b", 0): "y2"}


def test_cli_ship_then_tail(ray_session, tmp_path, capsys):
    import json as _json

    from data_exchange_routing_ray.cli import main
    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    lead = str(tmp_path / "lead")
    lake = CDCLake(lead, num_partitions=4)
    lake.apply_changes(
        _changes([_row(1, "insert", "a", 0, "x")]), quarantine=False
    )
    wal = str(tmp_path / "wal")
    rc = main(["ship", "--lake", lead, "--out", wal])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["shards_written"] == ["wal-000000000000.jsonl"]
    down = CDCLake(str(tmp_path / "down"), num_partitions=2)
    list(down.tail_debezium(wal, poll_interval=0.01, idle_polls=1))
    assert _state(down) == _state(lake)


def test_replicate_refuses_multi_leader_follower(ray_session, tmp_path):
    import pytest

    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    leader = CDCLake(str(tmp_path / "lead"), num_partitions=4)
    ml = CDCLake(str(tmp_path / "ml"), num_partitions=4, multi_leader=True)
    leader.apply_changes(
        _changes([_row(1, "insert", "a", 0, "x")]), quarantine=False
    )
    with pytest.raises(ValueError, match="single-leader follower"):
        ml.replicate_from(leader, group="g")


def test_cli_replicate_follow_stops_on_idle(ray_session, tmp_path, capsys):
    import json as _json

    from data_exchange_routing_ray.cli import main
    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    lead = str(tmp_path / "lead")
    lake = CDCLake(lead, num_partitions=4)
    lake.apply_changes(
        _changes([_row(1, "insert", "a", 0, "x")]), quarantine=False
    )
    foll = str(tmp_path / "foll")
    rc = main(["replicate", "--lake", foll, "--source", lead,
               "--follow", "--poll-interval", "0.01", "--idle-polls", "2"])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l]
    assert _json.loads(lines[-1])["total_rows"] == 1
    assert _state(CDCLake(foll)) == _state(lake)


def test_replicate_propagates_column_ddl(ray_session, tmp_path):
    """Leader column DDL is metadata-only (no changefeed rows), so the
    follower must ADOPT the leader's name mapping during replication —
    otherwise the replica shows the old logical schema forever."""
    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    leader = CDCLake(str(tmp_path / "lead"), num_partitions=4)
    follower = CDCLake(str(tmp_path / "foll"), num_partitions=2)

    leader.apply_changes(
        _changes([_row(1, "insert", "a", 0, "x"),
                  _row(2, "insert", "b", 0, "y")]),
        quarantine=False,
    )
    follower.replicate_from(leader)
    leader.rename_column("tool", "tool_name")
    leader.drop_column("role")
    # a data epoch after the DDL (producer speaks the new schema on the
    # leader side; the follower consumes physical-name envelopes)
    leader.apply_changes(
        _changes([_row(3, "insert", "c", 0, "z")]), quarantine=False
    )
    follower.replicate_from(leader)

    lt = leader.final_table()
    ft = follower.final_table()
    assert ft.column_names == lt.column_names
    assert "tool_name" in ft.column_names and "role" not in ft.column_names
    assert ft.num_rows == lt.num_rows == 3

    # DDL-only change with no data epoch: the next (empty) poll adopts it
    leader.rename_column("tool_name", "tn2")
    follower.replicate_from(leader)
    assert "tn2" in follower.final_table().column_names
