"""Incremental export: manifest-diff planning (zero data read) and the
backup contract — changed partitions carry every key the later epochs
touched; unchanged partitions cost zero bytes; a no-op epoch exports
nothing."""

import os

import pyarrow.dataset as pads

from data_exchange_routing_ray.hashing import partition_ids
from data_exchange_routing_ray.pipelines.cdc import CDCLake
from data_exchange_routing_ray.synth import make_change_stream


def test_incremental_export_contract(ray_session, tmp_path):
    import numpy as np
    import ray.data

    base = make_change_stream(num_convs=60, max_turns=5, seed=1)
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=16)
    lake.apply_changes(ray.data.from_arrow(base), quarantine=False)

    # epoch 1 touches a conv subset
    nxt = make_change_stream(num_convs=12, max_turns=5, seed=2, seq_start=10_000)
    lake.apply_changes(ray.data.from_arrow(nxt), quarantine=False)

    changed = lake.changed_partitions(since_epoch=0)
    touched_pids = set(
        partition_ids(nxt["conv_id"].to_numpy(zero_copy_only=False), 16).tolist()
    )
    # planning: exactly the partitions the epoch touched
    assert set(changed) == touched_pids

    out = str(tmp_path / "export")
    n = lake.export_incremental(since_epoch=0, out_dir=out)
    exported = pads.dataset(out, format="parquet").to_table()
    assert exported.num_rows == n > 0
    # every key epoch 1 touched (and still lives) is in the export
    final = lake.final_table().to_pandas()
    exp_keys = set(
        zip(
            exported["conv_id"].to_numpy(zero_copy_only=False),
            exported["turn_idx"].to_numpy(),
        )
    )
    live = final[final["conv_id"].isin(set(nxt["conv_id"].to_numpy(zero_copy_only=False)))]
    for k in zip(live["conv_id"], live["turn_idx"]):
        assert k in exp_keys
    # export is exactly the changed partitions' current rows
    pids = partition_ids(
        exported["conv_id"].to_numpy(zero_copy_only=False), 16
    )
    assert set(np.unique(pids).tolist()) <= set(changed)

    # baseline = current epoch -> nothing to export
    assert lake.changed_partitions(since_epoch=lake.manifest.epoch) == []
    out2 = str(tmp_path / "export2")
    assert lake.export_incremental(lake.manifest.epoch, out2) == 0
    assert os.listdir(out2) == []
