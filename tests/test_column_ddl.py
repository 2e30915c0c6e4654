"""Metadata-only column DDL: rename/drop via manifest name mapping — no
data file rewrites, logical-schema ingestion after a rename, read paths
conformed, DDL ordered/OCC-fenced on the manifest chain, time travel and
rollback restore the mapping of their epoch."""

import pyarrow as pa
import pytest

from data_exchange_routing_ray.pipelines.cdc import CDCLake
from data_exchange_routing_ray.synth import make_change_stream, oracle_apply


def _mk(tmp_path, **kw):
    return CDCLake(str(tmp_path / "lake"), num_partitions=8, **kw)


def test_rename_then_ingest_logical_schema(ray_session, tmp_path):
    import ray.data

    base = make_change_stream(num_convs=40, max_turns=6, seed=81)
    more = make_change_stream(num_convs=40, max_turns=6, seed=82, seq_start=50_000)
    lake = _mk(tmp_path)
    lake.apply_changes(ray.data.from_arrow(base), quarantine=False)
    files_before = sorted(lake.store.data_files(lake.manifest))

    e_ddl = lake.rename_column("tool", "tool_name")
    assert e_ddl == 1
    # DDL rewrote no data file
    assert sorted(lake.store.data_files(lake.manifest)) == files_before

    # producer speaks the NEW schema
    more_logical = more.rename_columns(
        [{"tool": "tool_name"}.get(c, c) for c in more.column_names]
    )
    lake.apply_changes(ray.data.from_arrow(more_logical), quarantine=False)

    exp = oracle_apply(pa.concat_tables([base, more])).rename(
        columns={"tool": "tool_name"}
    )
    got = lake.final_table().to_pandas()
    cols = ["conv_id", "turn_idx", "role", "text", "tool_name", "ts"]
    import pandas as pd

    pd.testing.assert_frame_equal(
        got[cols].reset_index(drop=True),
        exp[cols].reset_index(drop=True),
        check_dtype=False,
    )
    # pruned dataset read by LOGICAL name
    ds = lake.final_dataset(columns=["conv_id", "tool_name"])
    t = ds.take_all()
    assert t and set(t[0].keys()) == {"conv_id", "tool_name"}

    # time travel BEFORE the DDL shows the old name
    t0 = lake.final_table(epoch=0)
    assert "tool" in t0.column_names and "tool_name" not in t0.column_names


def test_drop_hides_column_and_rollback_restores(ray_session, tmp_path):
    import ray.data

    base = make_change_stream(num_convs=30, max_turns=5, seed=83)
    lake = _mk(tmp_path)
    lake.apply_changes(ray.data.from_arrow(base), quarantine=False)
    lake.drop_column("role")
    out = lake.final_table()
    assert "role" not in out.column_names
    with pytest.raises(ValueError):
        lake.final_dataset(columns=["role"])
    # a dropped column is gone: it cannot be renamed ...
    with pytest.raises(ValueError):
        lake.rename_column("role", "x")
    # ... and its logical name may not be taken by a different column
    with pytest.raises(ValueError):
        lake.rename_column("tool", "role")

    # rollback to the pre-DDL epoch restores the column
    lake.rollback_to(0)
    assert "role" in lake.final_table().column_names


def test_ddl_guards(ray_session, tmp_path):
    import ray.data

    base = make_change_stream(num_convs=10, max_turns=4, seed=84)
    lake = _mk(tmp_path)
    lake.apply_changes(ray.data.from_arrow(base), quarantine=False)
    with pytest.raises(ValueError):
        lake.rename_column("conv_id", "cid")  # key column
    with pytest.raises(ValueError):
        lake.rename_column("tool", "text")  # collision with live logical
    with pytest.raises(ValueError):
        lake.rename_column("nope", "x")  # unknown
    with pytest.raises(ValueError):
        lake.drop_column("ts")  # stable-order column
    # rename chain: tool -> t1 -> t2 keeps ONE physical mapping
    lake.rename_column("tool", "t1")
    lake.rename_column("t1", "t2")
    assert lake.manifest.column_renames == {"tool": "t2"}
    # renaming back to the physical name clears the mapping
    lake.rename_column("t2", "tool")
    assert lake.manifest.column_renames == {}
