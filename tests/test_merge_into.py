"""MERGE INTO semantics on a tiny hand-built lake: matched update, matched
delete, not-matched insert, not-matched delete no-op, within-staging dedup
(highest seq wins), and the delta-stack guard."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from data_exchange_routing_ray.pipelines.cdc import CDCLake


def _base_changes() -> ray.data.Dataset:
    df = pd.DataFrame(
        {
            "seq": [1, 2, 3],
            "op": ["insert"] * 3,
            "conv_id": ["conv-a", "conv-a", "conv-b"],
            "turn_idx": pd.array([0, 1, 0], dtype="int32"),
            "role": ["user", "assistant", "user"],
            "text": ["t0", "t1", "t2"],
            "tool": ["x", "y", "z"],
            "ts": pd.to_datetime(["2024-01-01"] * 3),
        }
    )
    return ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def _staging(rows) -> ray.data.Dataset:
    df = pd.DataFrame(
        rows,
        columns=["seq", "conv_id", "turn_idx", "role", "text", "tool", "ts", "del_flag"],
    )
    df["turn_idx"] = df["turn_idx"].astype("int32")
    df["ts"] = pd.to_datetime(df["ts"])
    return ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def test_merge_into_semantics(ray_session, tmp_path):
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=4)
    lake.apply_changes(_base_changes(), quarantine=False)

    res = lake.merge_into(
        _staging(
            [
                # matched update (and a lower-seq duplicate that must lose)
                (10, "conv-a", 0, "assistant", "upd-new", "m", "2024-02-01", False),
                (5, "conv-a", 0, "assistant", "upd-old", "m", "2024-02-01", False),
                # matched delete
                (11, "conv-a", 1, "user", "ignored", "m", "2024-02-01", True),
                # not-matched insert
                (12, "conv-c", 7, "user", "ins", "m", "2024-02-01", False),
                # not-matched delete -> no-op
                (13, "conv-d", 9, "user", "ignored", "m", "2024-02-01", True),
            ]
        )
    )
    assert res.changes_applied == 3  # update + delete + insert; no-op dropped

    final = lake.final_table().to_pandas()
    state = {
        (r.conv_id, r.turn_idx): r.text for r in final.itertuples(index=False)
    }
    assert state == {
        ("conv-a", 0): "upd-new",  # updated, higher staging seq won
        ("conv-b", 0): "t2",  # untouched
        ("conv-c", 7): "ins",  # inserted
    }


def test_merge_into_refuses_delta_stack(ray_session, tmp_path):
    lake = CDCLake(
        str(tmp_path / "lake"),
        num_partitions=2,
        merge_policy="delta",
        delta_ratio=1e9,  # force every epoch onto the delta path
    )
    lake.apply_changes(_base_changes(), quarantine=False)
    upd = _base_changes().map_batches(
        lambda b: b.set_column(
            b.column_names.index("seq"),
            "seq",
            pa.array([s.as_py() + 100 for s in b["seq"]], pa.int64()),
        ),
        batch_format="pyarrow",
    )
    lake.apply_changes(upd, quarantine=False)  # stacks a delta
    assert any(e.deltas for e in lake.manifest.partitions.values())
    with pytest.raises(ValueError, match="compact"):
        lake.merge_into(_staging([(1, "conv-a", 0, "u", "t", "m", "2024-02-01", False)]))


def test_sync_snapshot_full_sync_and_partition_wipe(ray_session, tmp_path):
    """sync_snapshot makes the lake equal the staging snapshot exactly:
    whole conversations absent from staging (entire partitions' keys)
    are deleted by the not-matched-by-source pass, and re-syncing the
    same snapshot is a no-op epoch (idempotent maintenance)."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from data_exchange_routing_ray.pipelines.cdc import CDCLake
    from data_exchange_routing_ray.synth import make_change_stream, oracle_apply

    base = make_change_stream(num_convs=40, max_turns=6, seed=51)
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=4)
    lake.apply_changes(ray.data.from_arrow(base), quarantine=False)

    final = oracle_apply(base)
    # snapshot keeps only HALF the conversations (some partitions lose
    # every key), rewrites text of kept rows
    keep = sorted(final["conv_id"].unique())[::2]
    snap = final[final["conv_id"].isin(keep)].copy()
    snap["text"] = snap["text"].str.upper()
    staging = ray.data.from_arrow(
        pa.Table.from_pandas(
            snap[["conv_id", "turn_idx", "role", "text", "tool", "ts"]],
            preserve_index=False,
        )
    )
    res = lake.sync_snapshot(staging)
    assert res.changes_applied > 0

    got = lake.final_table().to_pandas()
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    pd.testing.assert_frame_equal(
        got[cols].reset_index(drop=True),
        snap[cols].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
        check_dtype=False,
    )

    # idempotent: syncing the identical snapshot again changes nothing
    res2 = lake.sync_snapshot(staging)
    got2 = lake.final_table().to_pandas()
    pd.testing.assert_frame_equal(
        got2[cols].reset_index(drop=True),
        got[cols].reset_index(drop=True),
        check_dtype=False,
    )
