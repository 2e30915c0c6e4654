"""Skew salting + stateful actor-pool merge backend."""

import numpy as np
import pandas as pd
import pyarrow as pa

from data_exchange_routing_ray.pipelines.cdc import CDCLake
from data_exchange_routing_ray.synth import (
    make_change_stream,
    oracle_apply,
    write_change_stream,
)

TRANSCRIPT_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _check(lake, oracle):
    got = lake.final_table().to_pandas()[TRANSCRIPT_COLS].reset_index(drop=True)
    exp = oracle[TRANSCRIPT_COLS].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_salted_hot_key_matches_oracle(ray_session, tmp_path):
    """num_salts=4 pre-reduce on a stream where one conv gets ~30% of
    updates: result identical to the unsalted path and the oracle."""
    import ray.data

    changes = make_change_stream(
        num_convs=60, max_turns=8, update_frac=1.0, hot_frac=0.3, seed=91
    )
    salted = CDCLake(str(tmp_path / "salted"), num_partitions=8, num_salts=4)
    salted.apply_changes(ray.data.from_arrow(changes))
    _check(salted, oracle_apply(changes))

    plain = CDCLake(str(tmp_path / "plain"), num_partitions=8)
    plain.apply_changes(ray.data.from_arrow(changes))
    assert salted.final_table().equals(plain.final_table())


def test_salted_quarantine_still_routes(ray_session, tmp_path):
    import ray.data

    changes = make_change_stream(num_convs=30, max_turns=6, malformed_frac=0.1, seed=5)
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=4, num_salts=3)
    res = lake.apply_changes(ray.data.from_arrow(changes))
    assert res.rows_quarantined > 0
    q = lake.quarantine_table()
    assert q is not None and q.num_rows == res.rows_quarantined
    assert "salt" not in q.column_names and "part" not in q.column_names
    _check(lake, oracle_apply(changes))


def test_actor_mode_single_epoch(ray_session, tmp_path):
    import ray.data

    changes = make_change_stream(num_convs=50, max_turns=8, malformed_frac=0.05, seed=17)
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=8, merge_mode="actors", pool_size=4)
    try:
        res = lake.apply_changes(ray.data.from_arrow(changes))
        assert res.rows_quarantined > 0
        _check(lake, oracle_apply(changes))
    finally:
        lake.close()


def test_actor_mode_multi_epoch_and_fencing(ray_session, tmp_path):
    changes = make_change_stream(num_convs=70, max_turns=10, seed=23)
    files = write_change_stream(changes, str(tmp_path / "stream"), num_files=4)
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=8, merge_mode="actors", pool_size=4)
    try:
        results = lake.replay_files(files, quarantine=False)
        assert len(results) == 4
        _check(lake, oracle_apply(changes))
        # replayed epoch is a fenced no-op
        replay = lake.replay_files(files, quarantine=False)
        assert replay == []  # all files below watermark, skipped at stats level
    finally:
        lake.close()


def test_actor_mode_crash_resume_cold_start(ray_session, tmp_path):
    """Kill the pool mid-stream; a fresh lake instance cold-loads partition
    state from the committed manifest and finishes identically."""
    changes = make_change_stream(num_convs=60, max_turns=8, seed=29)
    files = write_change_stream(changes, str(tmp_path / "stream"), num_files=4)

    lake1 = CDCLake(str(tmp_path / "lake"), num_partitions=8, merge_mode="actors", pool_size=3)
    lake1.replay_files(files[:2], quarantine=False)
    lake1.close()  # the crash: in-memory LSM state gone

    lake2 = CDCLake(str(tmp_path / "lake"), num_partitions=8, merge_mode="actors", pool_size=3)
    try:
        results = lake2.replay_files(files, quarantine=False)
        assert len(results) == 2  # first two shards skipped via watermark
        _check(lake2, oracle_apply(changes))
    finally:
        lake2.close()


def test_quarantined_seqs_advance_watermark(ray_session, tmp_path):
    """Dead-lettered rows count as processed: a full re-replay of a stream
    whose tail shard ends in malformed rows is skipped entirely (no
    duplicate dead-letter rows, no re-run epochs)."""
    changes = make_change_stream(num_convs=40, max_turns=6, malformed_frac=0.1, seed=8)
    files = write_change_stream(changes, str(tmp_path / "stream"), num_files=4)
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=4)
    first = lake.replay_files(files, files_per_epoch=2)
    n_quar = sum(r.rows_quarantined for r in first)
    assert n_quar > 0
    assert lake.replay_files(files, files_per_epoch=2) == []
    assert lake.quarantine_table().num_rows == n_quar  # not duplicated
    _check(lake, oracle_apply(changes))


def test_exchange_mode_matches_groupby_and_oracle(ray_session, tmp_path):
    """Raw-task hash exchange backend: identical lake + quarantine to the
    Dataset-native path; fenced re-replay is a no-op."""
    changes = make_change_stream(num_convs=60, max_turns=8, malformed_frac=0.08, seed=19)
    files = write_change_stream(changes, str(tmp_path / "s"), num_files=4)
    ex = CDCLake(str(tmp_path / "ex"), num_partitions=8, merge_mode="exchange")
    gb = CDCLake(str(tmp_path / "gb"), num_partitions=8)
    ex.replay_files(files, files_per_epoch=2)
    gb.replay_files(files, files_per_epoch=2)
    assert ex.final_table().equals(gb.final_table())
    assert ex.quarantine_table().num_rows == gb.quarantine_table().num_rows
    _check(ex, oracle_apply(changes))
    assert ex.replay_files(files, files_per_epoch=2) == []


def test_time_travel_reads(ray_session, tmp_path):
    """final_table(epoch=N) reproduces the lake as of any committed epoch."""
    changes = make_change_stream(num_convs=40, max_turns=6, seed=71)
    files = write_change_stream(changes, str(tmp_path / "stream"), num_files=3)
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=4)
    snaps = []
    for f in files:
        lake.replay_files([f], quarantine=False)
        snaps.append(lake.final_table())
    for i, snap in enumerate(snaps):
        assert lake.final_table(epoch=i).equals(snap)
    assert lake.final_table().equals(snaps[-1])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no committed manifest"):
        lake.final_table(epoch=99)


def test_repartition_lake_preserves_state(ray_session, tmp_path):
    """Compaction/re-partitioning: new partition count, identical content;
    subsequent epochs keep fencing and merging correctly."""
    import ray.data

    changes = make_change_stream(num_convs=60, max_turns=8, seed=73)
    files = write_change_stream(changes, str(tmp_path / "stream"), num_files=4)
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=4)
    lake.replay_files(files[:2], quarantine=False)
    before = lake.final_table()
    watermark = lake.applied_offset

    res = lake.repartition_lake(16)
    assert lake.num_partitions == 16
    assert lake.manifest.num_partitions == 16
    assert res.partitions_touched > 4
    assert lake.applied_offset == watermark  # watermark preserved
    assert lake.final_table().equals(before)
    # old partition files become unreferenced -> vacuumable
    assert lake.vacuum() > 0

    # the remaining epochs apply into the NEW layout and match the oracle
    lake.replay_files(files, quarantine=False)
    _check(lake, oracle_apply(changes))


def test_repartition_keeps_null_payload_rows(ray_session, tmp_path):
    """An update that nulled a row's payload must survive repartitioning
    (rows re-enter as updates, not inserts — inserts would quarantine)."""
    import pyarrow as pa
    import ray.data

    ins = pa.table(
        {
            "seq": pa.array([1], pa.int64()),
            "op": pa.array(["insert"]),
            "conv_id": pa.array(["c1"]),
            "turn_idx": pa.array([0], pa.int32()),
            "role": pa.array(["user"]),
            "text": pa.array(["hello"]),
            "tool": pa.array([""]),
            "ts": pa.array([0], pa.timestamp("us")),
        }
    )
    upd = ins.set_column(0, "seq", pa.array([2], pa.int64()))
    upd = upd.set_column(1, "op", pa.array(["update"]))
    upd = upd.set_column(4, "role", pa.nulls(1, pa.string()))
    upd = upd.set_column(5, "text", pa.nulls(1, pa.string()))
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=2)
    lake.apply_changes(ray.data.from_arrow(pa.concat_tables([ins, upd])))
    assert lake.final_table().num_rows == 1  # null-payload row lives
    res = lake.repartition_lake(4)
    assert res.rows_quarantined == 0
    assert lake.final_table().num_rows == 1  # and survives repartition


def test_actor_state_rolls_back_on_aborted_commit(ray_session, tmp_path):
    """A concurrent writer commits between an actor-pool flush and the
    publish: the aborted writer's memtables must NOT stay ahead of the
    committed manifest — the retry has to cold-load the OTHER writer's
    committed changes instead of silently overwriting them."""
    import pytest
    import ray.data

    from data_exchange_routing_ray.state.manifest import (
        ConcurrentCommitError,
        ManifestStore,
    )

    base = make_change_stream(num_convs=30, max_turns=5, seed=61)
    theirs = make_change_stream(num_convs=30, max_turns=5, seed=63, seq_start=50_000)
    mine = make_change_stream(num_convs=30, max_turns=5, seed=62, seq_start=100_000)

    lake_a = CDCLake(
        str(tmp_path / "lake"), num_partitions=4, merge_mode="actors", pool_size=2
    )
    try:
        lake_a.apply_changes(ray.data.from_arrow(base), quarantine=False)

        orig_publish = ManifestStore.publish
        raced = {"done": False}

        def racing_publish(self, manifest, expect_epoch=None):
            if not raced["done"] and self is lake_a.store and manifest.epoch == 1:
                raced["done"] = True
                other = CDCLake(str(tmp_path / "lake"), num_partitions=4)
                other.apply_changes(ray.data.from_arrow(theirs), quarantine=False)
            return orig_publish(self, manifest, expect_epoch)

        ManifestStore.publish = racing_publish
        try:
            with pytest.raises(ConcurrentCommitError):
                lake_a.apply_changes(ray.data.from_arrow(mine), quarantine=False)
        finally:
            ManifestStore.publish = orig_publish

        # retry through the SAME actor-pool handle: memtables were reset on
        # abort, so the retry cold-loads base+theirs and merges mine on top
        lake_a.apply_changes(ray.data.from_arrow(mine), quarantine=False)
        exp = oracle_apply(pa.concat_tables([base, theirs, mine]))
        _check(lake_a, exp)
    finally:
        lake_a.close()


def test_actor_and_groupby_modes_agree(ray_session, tmp_path):
    import ray.data

    changes = make_change_stream(num_convs=40, max_turns=9, delete_frac=0.1, seed=41)
    a = CDCLake(str(tmp_path / "a"), num_partitions=8, merge_mode="actors", pool_size=2)
    g = CDCLake(str(tmp_path / "g"), num_partitions=8)
    try:
        a.apply_changes(ray.data.from_arrow(changes), quarantine=False)
        g.apply_changes(ray.data.from_arrow(changes), quarantine=False)
        assert a.final_table().equals(g.final_table())
    finally:
        a.close()
