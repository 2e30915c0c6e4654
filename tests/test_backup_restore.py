"""Point-in-time backup/restore (CDCLake.backup_to).

The backup must be a fully functional lake: fence preserved (replay of
applied shards is a no-op), resumable (remaining shards converge it to the
oracle), isolated (the original, still-ingesting lake is undisturbed), and
faithful across layout variants (delta merge policy, segmented manifests,
column DDL, consumer offsets)."""

import os

import pytest

from data_exchange_routing_ray.pipelines.cdc import CDCLake
from data_exchange_routing_ray.synth import (
    make_change_stream,
    oracle_apply,
    write_change_stream,
)


def _sorted(t):
    return t.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def test_backup_restore_resume(ray_session, tmp_path):
    changes = make_change_stream(num_convs=100, max_turns=8, seed=7)
    files = write_change_stream(changes, str(tmp_path / "stream"), num_files=4)

    lake = CDCLake(str(tmp_path / "lake"), num_partitions=16)
    lake.replay_files(files[:2])
    info = lake.backup_to(str(tmp_path / "bak"))
    assert info["data_files"] > 0
    lake.replay_files(files)  # original keeps going (first 2 fenced)

    restored = CDCLake(str(tmp_path / "bak"), num_partitions=16)
    assert restored.manifest.applied_offset == info["applied_offset"]
    before = restored.manifest.applied_offset
    restored.replay_files(files[:2])  # fenced no-op
    assert restored.manifest.applied_offset == before
    restored.replay_files(files[2:])
    a, b = _sorted(restored.final_table()), _sorted(lake.final_table())
    assert a.equals(b)
    assert a.num_rows == len(oracle_apply(changes))


def test_backup_preserves_deltas_ddl_consumers_segments(ray_session, tmp_path):
    changes = make_change_stream(num_convs=80, max_turns=6, seed=11)
    files = write_change_stream(changes, str(tmp_path / "stream"), num_files=4)

    lake = CDCLake(
        str(tmp_path / "lake"), num_partitions=16,
        merge_policy="delta", manifest_segment_size=4,
    )
    lake.replay_files(files)
    lake.rename_column("tool", "tool_name")
    lake.consumers.commit("grp", lake.manifest.epoch, expect=None)
    info = lake.backup_to(str(tmp_path / "bak"))

    restored = CDCLake(
        str(tmp_path / "bak"), num_partitions=16,
        merge_policy="delta", manifest_segment_size=4,
    )
    # delta stacks + name mapping + offsets all survive
    assert _sorted(restored.final_table()).equals(_sorted(lake.final_table()))
    assert "tool_name" in restored.final_table().column_names
    assert restored.consumers.get("grp") == info["epoch"]
    # consumer offsets beyond the captured epoch are floored, never ahead
    assert restored.consumers.get("grp") <= restored.manifest.epoch


def test_backup_refuses_empty_and_existing(ray_session, tmp_path):
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=4)
    with pytest.raises(ValueError, match="nothing committed"):
        lake.backup_to(str(tmp_path / "bak"))
    changes = make_change_stream(num_convs=10, max_turns=3, seed=3)
    files = write_change_stream(changes, str(tmp_path / "stream"), num_files=1)
    lake.replay_files(files)
    lake.backup_to(str(tmp_path / "bak"))
    with pytest.raises(ValueError, match="already holds a lake"):
        lake.backup_to(str(tmp_path / "bak"))
