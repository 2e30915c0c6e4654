"""Point-in-time backup/restore (CDCLake.backup_to).

The backup must be a fully functional lake: fence preserved (replay of
applied shards is a no-op), resumable (remaining shards converge it to the
oracle), isolated (the original, still-ingesting lake is undisturbed), and
faithful across layout variants (delta merge policy, segmented manifests,
column DDL, consumer offsets)."""

import os

import pandas as pd
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


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(0, 10_000),
    num_convs=st.integers(2, 40),
    max_turns=st.integers(1, 8),
    n_files=st.integers(2, 5),
    cut=st.integers(1, 4),
    parts=st.sampled_from([1, 4, 16]),
)
def test_property_backup_resume_matches_oracle(
    ray_session, tmp_path_factory, seed, num_convs, max_turns, n_files, cut,
    parts,
):
    """Backup property: for ANY seeded stream, shard split, backup point
    and partition count, (backup after k shards) + (resume with the rest)
    converges to the serial oracle, and the fenced replay of the first k
    shards into the restored lake never moves the watermark."""
    import os

    from data_exchange_routing_ray.synth import write_change_stream

    changes = make_change_stream(
        num_convs=num_convs, max_turns=max_turns,
        redelivery_frac=0.1, seed=seed,
    )
    tmp = tmp_path_factory.mktemp(f"bak-{seed}")
    files = write_change_stream(changes, str(tmp / "stream"), num_files=n_files)
    k = min(cut, len(files))
    lake = CDCLake(str(tmp / "lake"), num_partitions=parts)
    lake.replay_files(files[:k], files_per_epoch=len(files[:k]))
    lake.backup_to(str(tmp / "bak"))

    restored = CDCLake(str(tmp / "bak"), num_partitions=parts)
    before = restored.manifest.applied_offset
    restored.replay_files(files[:k], files_per_epoch=k)
    assert restored.manifest.applied_offset == before
    if k < len(files):
        restored.replay_files(files[k:], files_per_epoch=len(files) - k)
    exp = oracle_apply(changes)[
        ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    ].reset_index(drop=True)
    got = restored.final_table().to_pandas()[
        ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    ].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


_WRITER_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from data_exchange_routing_ray.pipelines.cdc import CDCLake

lake = CDCLake({lake!r}, num_partitions=8)
files = {files!r}
for f in files:
    lake.replay_files([f], files_per_epoch=1)
ray.shutdown()
"""


def test_backup_under_live_writer_is_tear_free(ray_session, tmp_path):
    """The claimed concurrency property, actually exercised: a writer
    subprocess commits epochs in a loop while the main process takes
    backups mid-flight. Every backup must open cleanly and its table must
    BIT-EQUAL the original lake's time-travel read at the backup's epoch
    (no torn manifest, no missing file, no half-included commit)."""
    import subprocess
    import sys
    import time

    from data_exchange_routing_ray.synth import write_change_stream

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    changes = make_change_stream(num_convs=120, max_turns=8, seed=77)
    files = write_change_stream(changes, str(tmp_path / "stream"), num_files=6)
    lake_dir = str(tmp_path / "lake")

    proc = subprocess.Popen(
        [sys.executable, "-c", _WRITER_SCRIPT.format(
            repo=repo, lake=lake_dir, files=files)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, cwd=repo,
    )
    try:
        # wait for the first commit, then snapshot while epochs keep landing
        deadline = time.time() + 120
        while time.time() < deadline:
            if os.path.exists(os.path.join(lake_dir, "manifests", "current.json")):
                break
            time.sleep(0.2)
        else:
            raise AssertionError("writer never committed")
        taken = []
        for i in range(3):
            bak = str(tmp_path / f"bak{i}")
            src = CDCLake(lake_dir, num_partitions=8)
            try:
                info = src.backup_to(bak)
            except ValueError:
                continue  # raced the very first commit; try again
            taken.append((bak, info))
            time.sleep(0.3)
    finally:
        out, err = proc.communicate(timeout=300)
        assert proc.returncode == 0, err[-2000:]

    assert taken, "no backup captured"
    final = CDCLake(lake_dir, num_partitions=8)
    for bak, info in taken:
        restored = CDCLake(bak, num_partitions=8)
        a = _sorted(restored.final_table())
        b = _sorted(final.final_table(epoch=info["epoch"]))
        assert a.equals(b), f"backup at epoch {info['epoch']} is torn"


def test_backup_multi_leader_mode_and_tombstones(ray_session, tmp_path):
    """Multi-leader backup: the persisted engine mode rides lake-config
    into the backup (reopen ADOPTS multi_leader without the flag), live
    tombstone rows survive the copy (readers still filter them), and the
    restored site keeps converging when fed a foreign WAL fence-down."""
    import pyarrow as pa_
    import ray.data

    changes = make_change_stream(
        num_convs=60, max_turns=6, redelivery_frac=0.1, seed=19
    )
    df = changes.to_pandas()
    site = (pd.util.hash_array(df["seq"].to_numpy()) % 2).astype(int)

    lake = CDCLake(str(tmp_path / "a"), num_partitions=8, multi_leader=True)
    lake.apply_changes(
        ray.data.from_arrow(
            pa_.Table.from_pandas(df[site == 0], preserve_index=False)
        ),
        quarantine=False,
    )
    lake.backup_to(str(tmp_path / "bak"))

    # reopen WITHOUT multi_leader: mode must be adopted from lake-config
    restored = CDCLake(str(tmp_path / "bak"), num_partitions=8)
    assert restored.multi_leader is True
    assert _sorted(restored.final_table()).equals(_sorted(lake.final_table()))

    # feed the other site's WAL fence-down into the restored lake:
    # convergence to the serial oracle proves tombstones survived intact
    restored.apply_changes(
        ray.data.from_arrow(
            pa_.Table.from_pandas(df[site == 1], preserve_index=False)
        ),
        quarantine=False, fence=False,
    )
    exp = oracle_apply(changes)[
        ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    ].reset_index(drop=True)
    got = restored.final_table().to_pandas()[
        ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    ].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_fsck_clean_and_detects_damage(ray_session, tmp_path):
    """fsck: green on a healthy lake (incl. deep); reports a deleted file,
    a row-count mismatch and a truncation — and a backup of a healthy
    lake fscks clean too."""
    changes = make_change_stream(num_convs=50, max_turns=6, seed=29)
    files = write_change_stream(changes, str(tmp_path / "stream"), num_files=2)
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=8)
    lake.replay_files(files)

    rep = lake.fsck(deep=True)
    assert rep["ok"] and rep["files"] > 0 and rep["errors"] == []

    lake.backup_to(str(tmp_path / "bak"))
    assert CDCLake(str(tmp_path / "bak")).fsck()["ok"]

    # damage 1: delete a referenced file
    man = lake.manifest
    pid, entry = next(iter(sorted(man.partitions.items())))
    victim = os.path.join(str(tmp_path / "lake"), entry.file)
    os.rename(victim, victim + ".gone")
    rep = lake.fsck()
    assert not rep["ok"] and any("missing file" in e for e in rep["errors"])
    os.rename(victim + ".gone", victim)

    # damage 2: truncate it (deep catches what the footer can't)
    blob = open(victim, "rb").read()
    with open(victim, "wb") as f:
        f.write(blob[: len(blob) // 2])
    rep = lake.fsck(deep=True)
    assert not rep["ok"] and rep["errors"]
    with open(victim, "wb") as f:
        f.write(blob)
    assert lake.fsck(deep=True)["ok"]
