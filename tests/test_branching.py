"""Zero-copy lake branching: branch creation copies only the manifest;
writes on a branch are invisible to main (and vice versa); vacuum respects
both branches' references."""

import os

import pandas as pd
import pyarrow as pa
import ray.data

from data_exchange_routing_ray.pipelines.cdc import CDCLake


def _changes(rows, seq0=1):
    df = pd.DataFrame(
        [
            {
                "seq": seq0 + i,
                "op": "insert",
                "conv_id": c,
                "turn_idx": t,
                "role": "user",
                "text": x,
                "tool": "x",
                "ts": pd.Timestamp("2024-01-01"),
            }
            for i, (c, t, x) in enumerate(rows)
        ]
    )
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def test_branch_isolation_and_vacuum(ray_session, tmp_path):
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=2)
    lake.apply_changes(
        _changes([("conv-a", 0, "base-a"), ("conv-b", 0, "base-b")]),
        quarantine=False,
    )
    base = lake.final_table()

    br = lake.create_branch("exp")
    assert br.final_table().equals(base)  # zero-copy clone sees main's state

    # divergent writes on each side
    br.apply_changes(
        _changes([("conv-a", 0, "branch-edit"), ("conv-c", 0, "branch-new")], seq0=100),
        quarantine=False,
    )
    lake.apply_changes(_changes([("conv-d", 0, "main-new")], seq0=200), quarantine=False)

    main_txt = {
        (r.conv_id, r.turn_idx): r.text
        for r in lake.final_table().to_pandas().itertuples(index=False)
    }
    br_txt = {
        (r.conv_id, r.turn_idx): r.text
        for r in br.final_table().to_pandas().itertuples(index=False)
    }
    assert main_txt == {
        ("conv-a", 0): "base-a",
        ("conv-b", 0): "base-b",
        ("conv-d", 0): "main-new",
    }
    assert br_txt == {
        ("conv-a", 0): "branch-edit",
        ("conv-b", 0): "base-b",
        ("conv-c", 0): "branch-new",
    }

    # vacuum on main must NOT remove files the branch still references
    removed = lake.vacuum()
    assert br.final_table().to_pandas().shape[0] == 3
    assert {
        (r.conv_id, r.turn_idx): r.text
        for r in br.final_table().to_pandas().itertuples(index=False)
    } == br_txt
    # reopening by name sees the same branch state
    again = CDCLake(str(tmp_path / "lake"), num_partitions=2, branch="exp")
    assert {
        (r.conv_id, r.turn_idx): r.text
        for r in again.final_table().to_pandas().itertuples(index=False)
    } == br_txt
    assert removed >= 0
    # branch files carry the tag; main files never do
    names = os.listdir(str(tmp_path / "lake" / "partitions"))
    assert any(n.endswith("-exp.parquet") for n in names)


def test_fast_forward_merge(ray_session, tmp_path):
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=2)
    lake.apply_changes(_changes([("conv-a", 0, "base")]), quarantine=False)
    br = lake.create_branch("ff")
    br.apply_changes(_changes([("conv-b", 0, "from-branch")], seq0=50), quarantine=False)
    new_epoch = lake.fast_forward(br)
    assert new_epoch == br.manifest.epoch
    got = {
        (r.conv_id, r.turn_idx): r.text
        for r in lake.final_table().to_pandas().itertuples(index=False)
    }
    assert got == {("conv-a", 0): "base", ("conv-b", 0): "from-branch"}
    # main can keep ingesting after the FF (epoch counter adopted)
    lake.apply_changes(_changes([("conv-c", 0, "post-ff")], seq0=90), quarantine=False)
    assert lake.final_table().num_rows == 3


def test_fast_forward_refuses_divergence(ray_session, tmp_path):
    import pytest as _pytest

    lake = CDCLake(str(tmp_path / "lake"), num_partitions=2)
    lake.apply_changes(_changes([("conv-a", 0, "base")]), quarantine=False)
    br = lake.create_branch("dv")
    br.apply_changes(_changes([("conv-b", 0, "b")], seq0=50), quarantine=False)
    lake.apply_changes(_changes([("conv-c", 0, "m")], seq0=70), quarantine=False)
    with _pytest.raises(ValueError, match="non-fast-forward"):
        lake.fast_forward(br)
