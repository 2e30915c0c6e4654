"""Commit reconciliation: an OCC-aborted writer whose epoch touched a
DISJOINT partition set (and whose applied seqs sit above the rival's new
fence) rebases its already-staged entries onto the new current manifest and
publishes — no re-merge, no wasted epoch. Conflicting write sets and
fence-overlapping seq ranges still abort with ConcurrentCommitError."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from data_exchange_routing_ray.hashing import partition_ids
from data_exchange_routing_ray.pipelines.cdc import CDCLake
from data_exchange_routing_ray.state.manifest import (
    ConcurrentCommitError,
    ManifestStore,
)
from data_exchange_routing_ray.synth import make_change_stream, oracle_apply

TRANSCRIPT_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
P = 16


def _split_by_pid_parity(t: pa.Table) -> tuple[pa.Table, pa.Table]:
    """Split a change stream into two pid-DISJOINT halves (even/odd lake
    partitions), using the lake's own partition function."""
    pids = partition_ids(t["conv_id"], P)
    even = pa.array(pids % 2 == 0)
    return t.filter(even), t.filter(pc.invert(even))


def _check(lake: CDCLake, tables: list[pa.Table]):
    import pandas as pd

    exp = oracle_apply(pa.concat_tables(tables))[TRANSCRIPT_COLS].reset_index(
        drop=True
    )
    got = lake.final_table().to_pandas()[TRANSCRIPT_COLS].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def _race(lake_a: CDCLake, lake_b: CDCLake, b_stream, at_epoch: int):
    """Patch publish so lake_b commits ``b_stream`` the moment lake_a first
    tries to publish epoch ``at_epoch`` — a deterministic OCC race."""
    import ray.data

    orig = ManifestStore.publish
    state = {"done": False}

    def racing(self, manifest, expect_epoch=None):
        if (
            not state["done"]
            and self is lake_a.store
            and manifest.epoch == at_epoch
        ):
            state["done"] = True
            lake_b.apply_changes(ray.data.from_arrow(b_stream), quarantine=False)
        return orig(self, manifest, expect_epoch)

    return racing, orig


def test_disjoint_writers_reconcile_without_rerun(ray_session, tmp_path):
    import ray.data

    base = make_change_stream(num_convs=60, max_turns=5, seed=71)
    more = make_change_stream(num_convs=60, max_turns=5, seed=72, seq_start=50_000)
    mine, theirs = _split_by_pid_parity(more)
    assert mine.num_rows and theirs.num_rows
    # reconciliation requires OUR applied seqs to sit ABOVE the rival's new
    # fence (interleaved seq ranges must abort — see the fence-overlap
    # test); give this writer the later binlog range
    mine = mine.set_column(
        mine.schema.get_field_index("seq"),
        "seq",
        pc.add(mine["seq"], pa.scalar(1_000_000, pa.int64())),
    )

    lake_a = CDCLake(str(tmp_path / "lake"), num_partitions=P)
    lake_a.apply_changes(ray.data.from_arrow(base), quarantine=False)
    lake_b = CDCLake(str(tmp_path / "lake"), num_partitions=P)

    racing, orig = _race(lake_a, lake_b, theirs, at_epoch=1)
    ManifestStore.publish = racing
    try:
        # B lands epoch 1 mid-publish; A reconciles onto it as epoch 2
        res = lake_a.apply_changes(ray.data.from_arrow(mine), quarantine=False)
    finally:
        ManifestStore.publish = orig
    assert res.epoch == 2
    assert 0 < res.changes_applied <= mine.num_rows  # LWW-collapsed winners
    _check(lake_a, [base, mine, theirs])

    # entry.epoch was re-stamped to the PUBLISHED epoch: an exporter that
    # checkpointed at B's epoch must see A's partitions as changed
    mine_pids = sorted(set((partition_ids(mine["conv_id"], P)).tolist()))
    assert set(lake_a.changed_partitions(since_epoch=1)) == set(mine_pids)

    # watermark is the max across both writers
    expected_wm = max(
        int(pc.max(mine["seq"]).as_py()), int(pc.max(theirs["seq"]).as_py())
    )
    assert lake_a.applied_offset == expected_wm


def test_reconcile_refuses_fence_overlap(ray_session, tmp_path):
    """Disjoint partitions but the rival's fence moved PAST our seqs: a
    serial re-run would have fenced our rows, so reconcile must abort."""
    import ray.data

    base = make_change_stream(num_convs=60, max_turns=5, seed=73)
    more = make_change_stream(num_convs=60, max_turns=5, seed=74, seq_start=50_000)
    mine, theirs = _split_by_pid_parity(more)
    # push THEIR seqs above ours: their commit advances the global fence
    # beyond every seq we applied
    theirs = theirs.set_column(
        theirs.schema.get_field_index("seq"),
        "seq",
        pc.add(theirs["seq"], pa.scalar(1_000_000, pa.int64())),
    )

    lake_a = CDCLake(str(tmp_path / "lake"), num_partitions=P)
    lake_a.apply_changes(ray.data.from_arrow(base), quarantine=False)
    lake_b = CDCLake(str(tmp_path / "lake"), num_partitions=P)

    racing, orig = _race(lake_a, lake_b, theirs, at_epoch=1)
    ManifestStore.publish = racing
    try:
        with pytest.raises(ConcurrentCommitError):
            lake_a.apply_changes(ray.data.from_arrow(mine), quarantine=False)
    finally:
        ManifestStore.publish = orig
    # B's commit intact; A's rows were never published
    assert lake_a.manifest.epoch == 1
    _check(lake_a, [base, theirs])


def test_reconcile_refuses_overlapping_partitions(ray_session, tmp_path):
    """Same conv set on both sides -> conflicting write set -> abort, and a
    plain retry converges (the pre-reconciliation contract is unchanged)."""
    import ray.data

    base = make_change_stream(num_convs=30, max_turns=5, seed=75)
    more = make_change_stream(num_convs=30, max_turns=5, seed=76, seq_start=50_000)
    mine = make_change_stream(num_convs=30, max_turns=5, seed=77, seq_start=100_000)

    lake_a = CDCLake(str(tmp_path / "lake"), num_partitions=4)
    lake_a.apply_changes(ray.data.from_arrow(base), quarantine=False)
    lake_b = CDCLake(str(tmp_path / "lake"), num_partitions=4)

    racing, orig = _race(lake_a, lake_b, more, at_epoch=1)
    ManifestStore.publish = racing
    try:
        with pytest.raises(ConcurrentCommitError):
            lake_a.apply_changes(ray.data.from_arrow(mine), quarantine=False)
    finally:
        ManifestStore.publish = orig
    lake_a.apply_changes(ray.data.from_arrow(mine), quarantine=False)
    _check(lake_a, [base, more, mine])
