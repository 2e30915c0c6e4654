"""Write-audit-publish: a failing audit aborts the epoch with NO visible
effect; a passing audit publishes normally; the audit reads the staged
candidate state (not the committed one)."""

import pandas as pd
import pytest

from data_exchange_routing_ray.pipelines.cdc import CDCLake, read_manifest_table
from data_exchange_routing_ray.synth import make_change_stream, oracle_apply

COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _apply(lake, changes, audit_fn=None):
    import ray.data

    return lake.apply_changes(
        ray.data.from_arrow(changes), quarantine=False, audit_fn=audit_fn
    )


def test_failing_audit_aborts_with_no_visible_effect(ray_session, tmp_path):
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=4)
    base = make_change_stream(num_convs=20, max_turns=5, seed=1)
    _apply(lake, base)
    epoch_before = lake.manifest.epoch
    table_before = lake.final_table().to_pandas()

    nxt = make_change_stream(num_convs=20, max_turns=5, seed=2, seq_start=10_000)

    def audit(man, lake_dir):
        raise AssertionError("row-count audit failed")

    with pytest.raises(AssertionError, match="row-count audit failed"):
        _apply(lake, nxt, audit_fn=audit)

    # nothing visible changed: epoch, manifest, data all at the pre-state
    assert lake.manifest.epoch == epoch_before
    pd.testing.assert_frame_equal(
        lake.final_table().to_pandas(), table_before, check_dtype=False
    )
    # staged orphans are vacuumable
    assert lake.vacuum() > 0


def test_audit_sees_staged_candidate_not_committed_state(ray_session, tmp_path):
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=4)
    base = make_change_stream(num_convs=20, max_turns=5, seed=3)
    _apply(lake, base)
    committed_rows = lake.final_table().num_rows

    nxt = make_change_stream(num_convs=40, max_turns=5, seed=4, seq_start=10_000)
    seen = {}

    def audit(man, lake_dir):
        t = read_manifest_table(man, lake_dir)
        seen["staged_rows"] = t.num_rows
        seen["epoch"] = man.epoch

    _apply(lake, nxt, audit_fn=audit)
    # the audit saw the post-merge candidate (more keys than committed)
    assert seen["staged_rows"] == lake.final_table(with_seq=True).num_rows
    assert seen["staged_rows"] > committed_rows
    assert seen["epoch"] == lake.manifest.epoch


def test_retry_after_failed_audit_commits(ray_session, tmp_path):
    import pyarrow as pa

    lake = CDCLake(str(tmp_path / "lake"), num_partitions=4)
    changes = make_change_stream(num_convs=25, max_turns=4, seed=5)

    calls = {"n": 0}

    def flaky_audit(man, lake_dir):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient audit infra failure")

    with pytest.raises(RuntimeError):
        _apply(lake, changes, audit_fn=flaky_audit)
    res = _apply(lake, changes, audit_fn=flaky_audit)
    assert res.changes_applied > 0
    exp = (
        oracle_apply(changes)[COLS]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    got = (
        lake.final_table()
        .to_pandas()[COLS]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
