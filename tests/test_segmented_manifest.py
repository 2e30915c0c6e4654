"""Segmented manifest layout: commit cost O(dirty partitions), reads and
time travel transparent, final state bit-identical to the monolithic root.

Reference analog: the ordered commitBlockList publishes ONE root object
(RouteIngestedFile.kt:537-547); at 10^4-10^5 lake partitions a monolithic
root costs MBs of JSON per epoch, so the segmented layout (Iceberg's
manifest-list idea) splits the partition table into content-addressed
pid-range segment files and rewrites only the dirty ones.
"""

import os

import pyarrow as pa
import pyarrow.compute as pc

from data_exchange_routing_ray.pipelines.cdc import CDCLake
from data_exchange_routing_ray.synth import (
    make_change_stream,
    oracle_apply,
    write_change_stream,
)


def _seg_files(lake_dir: str) -> list[str]:
    d = os.path.join(lake_dir, "manifests", "segments")
    return sorted(os.listdir(d)) if os.path.isdir(d) else []


def test_segmented_equals_monolithic_and_reuses_segments(ray_session, tmp_path):
    changes = make_change_stream(num_convs=120, max_turns=8, seed=23)
    files = write_change_stream(changes, str(tmp_path / "stream"), num_files=4)

    mono = CDCLake(str(tmp_path / "mono"), num_partitions=32)
    seg = CDCLake(
        str(tmp_path / "seg"), num_partitions=32, manifest_segment_size=4
    )
    mono.replay_files(files)
    seg.replay_files(files)

    # bit-identical final state across layouts
    a = mono.final_table().sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    b = seg.final_table().sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert a.equals(b)
    assert b.num_rows == len(oracle_apply(changes))

    # the manifest round-trips through the segmented layout losslessly
    man = seg.manifest
    assert len(man.partitions) > 0
    assert man.applied_offset == mono.manifest.applied_offset

    # segments are content-addressed: 4 epochs over 32 partitions at
    # segment_size=4 can never exceed epochs x ceil(32/4) segment files
    # (dirty-only reuse is asserted in the one-dirty-partition test below)
    n_epochs = 4
    worst = n_epochs * 8
    assert 0 < len(_seg_files(str(tmp_path / "seg"))) <= worst


def test_segmented_dirty_partition_writes_one_segment(ray_session, tmp_path):
    import ray.data

    base = make_change_stream(num_convs=200, max_turns=6, seed=29)
    lake = CDCLake(
        str(tmp_path / "lake"), num_partitions=64, manifest_segment_size=8
    )
    lake.apply_changes(ray.data.from_arrow(base))
    before = set(_seg_files(str(tmp_path / "lake")))

    # second epoch updates turns of ONE conversation -> one lake partition
    # dirty -> exactly one NEW segment file (its pid-range re-serialized)
    one = base.filter(pc.equal(base["conv_id"], base["conv_id"][0]))
    upd = one.set_column(
        one.schema.get_field_index("seq"),
        "seq",
        pc.add(one["seq"], pa.scalar(10_000_000, pa.int64())),
    )
    lake.apply_changes(ray.data.from_arrow(upd))
    after = set(_seg_files(str(tmp_path / "lake")))
    assert len(after - before) == 1

    # time travel: both epochs readable through the segmented roots
    t0 = lake.final_table(epoch=0)
    t1 = lake.final_table()
    assert t0.num_rows == t1.num_rows == len(oracle_apply(base))


def test_segmented_layout_persists_and_fences(ray_session, tmp_path):
    import ray.data

    changes = make_change_stream(num_convs=60, max_turns=5, seed=31)
    d = str(tmp_path / "lake")
    lake = CDCLake(d, num_partitions=16, manifest_segment_size=4)
    res = lake.apply_changes(ray.data.from_arrow(changes))

    # reopen WITHOUT the flag: the on-disk lake config wins (adopted mode)
    reopened = CDCLake(d, num_partitions=16)
    assert reopened.manifest_segment_size == 4
    n_before = len(_seg_files(d))
    # replay of the same epoch is fenced out -> no-op, no new segments
    res2 = reopened.apply_changes(ray.data.from_arrow(changes))
    assert res2.changes_applied == 0
    assert len(_seg_files(d)) == n_before
    assert reopened.final_table().num_rows == res.total_rows


def test_segmented_composes_with_delta_policy_and_rollback(ray_session, tmp_path):
    """Segmented layout is orthogonal to the LSM-lite delta policy: delta
    appends, level-triggered compaction, repartition and rollback all
    round-trip through segment files; final state equals the oracle at
    every step."""
    import ray.data

    base = make_change_stream(num_convs=100, max_turns=6, seed=41)
    lake = CDCLake(
        str(tmp_path / "lake"), num_partitions=16, manifest_segment_size=4,
        merge_policy="delta", delta_max_files=3, delta_ratio=1.0,
    )
    lake.apply_changes(ray.data.from_arrow(base), quarantine=False)
    # several small delta epochs (each touches a handful of convs)
    seqs = 100_000
    parts = [base.slice(i * 20, 20) for i in range(4)]
    applied = [base]
    for i, p in enumerate(parts):
        import pyarrow.compute as _pc

        shifted = p.set_column(
            p.schema.get_field_index("seq"), "seq",
            _pc.add(p["seq"], pa.scalar(seqs * (i + 1), pa.int64())),
        )
        applied.append(shifted)
        lake.apply_changes(ray.data.from_arrow(shifted), quarantine=False)
    exp = oracle_apply(pa.concat_tables(applied))
    got = lake.final_table()
    assert got.num_rows == len(exp)
    pre_rollback_epoch = lake.manifest.epoch

    # repartition (rebuild epoch) through the segmented store
    lake.repartition_lake(8)
    assert lake.final_table().num_rows == len(exp)
    assert lake.num_partitions == 8

    # rollback to the pre-repartition epoch restores partition count
    lake.rollback_to(pre_rollback_epoch)
    assert lake.final_table().num_rows == len(exp)
