"""LSM-lite delta merge policy: bounded write amplification for many small
epochs. Delta epochs append fenced change-table files per partition; reads
fold base+deltas; a level trigger compacts. Must be bit-identical to the
default copy-on-write rewrite policy on any stream."""

import os

import pyarrow as pa
import pytest

from data_exchange_routing_ray.pipelines.cdc import CDCLake
from data_exchange_routing_ray.synth import (
    make_change_stream,
    oracle_apply,
    write_change_stream,
)

TRANSCRIPT_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _frames_equal(a: pa.Table, b: pa.Table):
    import pandas as pd

    pd.testing.assert_frame_equal(
        a.to_pandas()[TRANSCRIPT_COLS].reset_index(drop=True),
        b.to_pandas()[TRANSCRIPT_COLS].reset_index(drop=True),
        check_dtype=False,
    )


def test_delta_policy_bit_identical_to_rewrite(ray_session, tmp_path):
    changes = make_change_stream(num_convs=50, max_turns=8, seed=33)
    files = write_change_stream(changes, str(tmp_path / "s"), num_files=10)

    delta = CDCLake(
        str(tmp_path / "d"), num_partitions=4,
        merge_policy="delta", delta_max_files=3, delta_ratio=1.0,
    )
    rewrite = CDCLake(str(tmp_path / "r"), num_partitions=4)

    saw_delta = False
    saw_compact = False
    prev_depth = 0
    for f in files:
        delta.replay_files([f], quarantine=False)
        man = delta.manifest
        depth = max(
            (len(e.deltas) for e in man.partitions.values()), default=0
        )
        saw_delta |= depth > 0
        saw_compact |= prev_depth >= 3 and depth < prev_depth
        prev_depth = depth
    rewrite.replay_files(files, files_per_epoch=1, quarantine=False)

    assert saw_delta, "small epochs must take the delta path"
    assert saw_compact, "delta_max_files must level-trigger a compaction"
    assert delta.final_table().equals(rewrite.final_table())
    _frames_equal(delta.final_table(), oracle_apply_table(changes))

    # distributed merge-on-read fold agrees with the driver fold
    ds_rows = delta.final_dataset().count()
    assert ds_rows == delta.final_table().num_rows

    # fenced re-replay is a no-op and appends no empty deltas
    depth_before = {
        pid: len(e.deltas) for pid, e in delta.manifest.partitions.items()
    }
    assert delta.replay_files(files, files_per_epoch=1, quarantine=False) == []
    depth_after = {
        pid: len(e.deltas) for pid, e in delta.manifest.partitions.items()
    }
    assert depth_before == depth_after

    # vacuum must keep live delta files (state unchanged after vacuum)
    before = delta.final_table()
    delta.vacuum()
    assert delta.final_table().equals(before)


def oracle_apply_table(changes: pa.Table) -> pa.Table:
    df = oracle_apply(changes)
    return pa.Table.from_pandas(df, preserve_index=False)


def test_delta_policy_deletes_survive_fold(ray_session, tmp_path):
    """A delete arriving in a DELTA epoch must remove the base row at read
    time (the fold applies op semantics, not just column overlay)."""
    import ray.data

    ins = pa.table(
        {
            "seq": pa.array([1, 2], pa.int64()),
            "op": pa.array(["insert", "insert"]),
            "conv_id": pa.array(["c1", "c2"]),
            "turn_idx": pa.array([0, 0], pa.int32()),
            "role": pa.array(["user", "user"]),
            "text": pa.array(["a", "b"]),
            "tool": pa.array(["", ""]),
            "ts": pa.array([0, 0], pa.timestamp("us")),
        }
    )
    delete = pa.table(
        {
            "seq": pa.array([3], pa.int64()),
            "op": pa.array(["delete"]),
            "conv_id": pa.array(["c1"]),
            "turn_idx": pa.array([0], pa.int32()),
            "role": pa.array([None], pa.string()),
            "text": pa.array([None], pa.string()),
            "tool": pa.array([None], pa.string()),
            "ts": pa.array([1], pa.timestamp("us")),
        }
    )
    lake = CDCLake(
        str(tmp_path / "lake"), num_partitions=2,
        merge_policy="delta", delta_max_files=4, delta_ratio=1.0,
    )
    lake.apply_changes(ray.data.from_arrow(ins), quarantine=False)
    lake.apply_changes(ray.data.from_arrow(delete), quarantine=False)
    # the delete rode a delta file (base untouched on disk)
    assert any(e.deltas for e in lake.manifest.partitions.values())
    out = lake.final_table()
    assert out.num_rows == 1
    assert out["conv_id"].to_pylist() == ["c2"]
    assert lake.final_dataset().count() == 1


def test_delta_policy_guards_other_merge_modes(ray_session, tmp_path):
    import ray.data

    with pytest.raises(ValueError, match="requires merge_mode"):
        CDCLake(str(tmp_path / "x"), merge_policy="delta", merge_mode="actors")

    # a lake with open deltas refuses non-groupby writers (they would read
    # stale base files and silently drop the deltas)
    lake = CDCLake(
        str(tmp_path / "lake"), num_partitions=2,
        merge_policy="delta", delta_ratio=1.0,
    )
    base = make_change_stream(num_convs=10, max_turns=3, seed=1)
    more = make_change_stream(num_convs=10, max_turns=3, seed=2, seq_start=10_000)
    lake.apply_changes(ray.data.from_arrow(base), quarantine=False)
    lake.apply_changes(ray.data.from_arrow(more), quarantine=False)
    assert any(e.deltas for e in lake.manifest.partitions.values())
    stale = CDCLake(str(tmp_path / "lake"), num_partitions=2, merge_mode="exchange")
    even_more = make_change_stream(num_convs=5, max_turns=2, seed=3, seq_start=20_000)
    with pytest.raises(ValueError, match="uncompacted delta files"):
        stale.apply_changes(ray.data.from_arrow(even_more), quarantine=False)

    # repartition_lake compacts everything away; exchange mode then works
    lake.repartition_lake(4)
    assert not any(e.deltas for e in lake.manifest.partitions.values())
    stale2 = CDCLake(str(tmp_path / "lake"), merge_mode="exchange")
    stale2.apply_changes(ray.data.from_arrow(even_more), quarantine=False)
    exp = oracle_apply_table(pa.concat_tables([base, more, even_more]))
    _frames_equal(stale2.final_table(), exp)
