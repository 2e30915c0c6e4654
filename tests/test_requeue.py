"""CDCLake.requeue_quarantined + `cli requeue` / `cli replicate` (round 4).

Dead-letter redelivery: rows re-enter with seqs re-based above the
watermark (queue-redelivery-gets-a-new-offset semantics); consumed
dead-letter files archive to quarantine-requeued/ so redelivery is
one-shot.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

from data_exchange_routing_ray.schemas import CHANGE_SCHEMA

BAD_OP = "Unsupported op; expected insert|update|delete"


def _changes(rows):
    import ray.data

    cols = {f.name: [] for f in CHANGE_SCHEMA}
    for r in rows:
        for f in CHANGE_SCHEMA:
            cols[f.name].append(r.get(f.name))
    return ray.data.from_arrow(
        pa.table({k: pa.array(v, CHANGE_SCHEMA.field(k).type)
                  for k, v in cols.items()})
    )


def _row(seq, op, conv, turn, text=None, ts=True):
    return {
        "seq": seq, "op": op, "conv_id": conv, "turn_idx": turn,
        "role": "user", "text": text, "tool": None,
        "ts": (1_700_000_000_000_000 + seq) if ts else None,
    }


def test_requeue_repairs_bad_op_class_once(ray_session, tmp_path):
    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    lake = CDCLake(str(tmp_path / "rq"), num_partitions=4)
    lake.apply_changes(_changes([
        _row(1, "insert", "a", 0, "x"),
        _row(2, "bogus", "b", 0, "y"),      # repairable class
        _row(3, "insert", "c", 0, None, ts=False),  # unrepairable (no ts)
    ]))
    assert lake.quarantine_table().num_rows == 2

    res = lake.requeue_quarantined(error=BAD_OP, op_override="update")
    assert res is not None and res.changes_applied == 1
    t = lake.final_table().to_pandas()
    assert dict(zip(t["conv_id"], t["text"])) == {"a": "x", "b": "y"}
    # requeued seq landed ABOVE the pre-requeue watermark
    assert res.applied_offset > 3

    # the consumed class is gone from the live dead-letter store,
    # archived under quarantine-requeued/, and a second requeue no-ops
    qt = lake.quarantine_table()
    assert BAD_OP not in set(qt["error"].to_pylist())
    assert os.path.isdir(os.path.join(lake.lake_dir, "quarantine-requeued"))
    assert lake.requeue_quarantined(error=BAD_OP, op_override="update") is None

    # the remaining class requeues as-is and (still invalid) simply
    # dead-letters again under the NEW epoch
    res2 = lake.requeue_quarantined()
    assert res2 is not None and res2.rows_quarantined == 1
    assert res2.changes_applied == 0


def test_requeue_preserves_relative_order(ray_session, tmp_path):
    """Two quarantined writes to one key keep their LWW order after the
    common seq shift."""
    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    lake = CDCLake(str(tmp_path / "rq2"), num_partitions=4)
    lake.apply_changes(_changes([
        _row(10, "insert", "k", 0, "keep"),
        _row(4, "bogus", "k", 0, "older"),
        _row(5, "bogus", "k", 0, "newer"),
    ]))
    res = lake.requeue_quarantined(error=BAD_OP, op_override="update")
    assert res.changes_applied == 1  # combiner LWW-collapses to the newer
    t = lake.final_table().to_pandas()
    assert t.loc[t["conv_id"] == "k", "text"].iloc[0] == "newer"


def test_cli_requeue_and_replicate(ray_session, tmp_path, capsys):
    from data_exchange_routing_ray.cli import main
    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    lead = str(tmp_path / "lead")
    lake = CDCLake(lead, num_partitions=4)
    lake.apply_changes(_changes([
        _row(1, "insert", "a", 0, "x"),
        _row(2, "bogus", "b", 0, "y"),
    ]))
    rc = main(["requeue", "--lake", lead, "--error", BAD_OP,
               "--op-override", "update"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["changes_applied"] == 1

    foll = str(tmp_path / "foll")
    rc = main(["replicate", "--lake", foll, "--source", lead])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert json.loads(out[-1])["total_rows"] == 2
    t = CDCLake(foll).final_table().to_pandas()
    assert dict(zip(t["conv_id"], t["text"])) == {"a": "x", "b": "y"}

    # caught-up follower: skip message
    rc = main(["replicate", "--lake", foll, "--source", lead])
    assert rc == 0
    assert "skipped" in capsys.readouterr().out
