"""CDCLake.tail_debezium — continuous external Debezium feed (round 4).

The ledger (processed shard names, written AFTER each commit) is the
Kafka-Connect offsets analog; exactly-once is guaranteed by the seq
fence, the ledger only saves re-reads. These tests pin both halves:
normal resume reads nothing twice; a crash BETWEEN commit and ledger
write re-reads one batch whose rows are all fenced to no-ops.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa


def _write_shard(shard_dir, name, rows):
    from data_exchange_routing_ray.sources import to_debezium_envelope

    lines = [
        json.dumps(to_debezium_envelope(r, r["op"], r["seq"]))
        for r in rows
    ]
    path = os.path.join(shard_dir, name)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(lines) + "\n")
    os.replace(tmp, path)


def _row(seq, op, conv, turn, text=None):
    return {
        "seq": seq, "op": op, "conv_id": conv, "turn_idx": turn,
        "role": "user", "text": text, "tool": None,
        "ts": 1_700_000_000_000_000 + seq,
    }


def test_tail_debezium_resumes_from_ledger(ray_session, tmp_path):
    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    shard_dir = str(tmp_path / "wal")
    os.makedirs(shard_dir)
    _write_shard(shard_dir, "w-000001.jsonl", [
        _row(1, "insert", "a", 0, "x"), _row(2, "insert", "b", 0, "y"),
    ])

    lake = CDCLake(str(tmp_path / "lake"), num_partitions=4)
    r1 = list(lake.tail_debezium(shard_dir, poll_interval=0.01, idle_polls=1))
    assert len(r1) == 1 and r1[0].changes_applied == 2

    # feed advances while the tailer is down; a fresh session resumes
    _write_shard(shard_dir, "w-000002.jsonl", [
        _row(3, "update", "a", 0, "x2"), _row(4, "delete", "b", 0),
    ])
    lake2 = CDCLake(str(tmp_path / "lake"), num_partitions=4)
    r2 = list(lake2.tail_debezium(shard_dir, poll_interval=0.01, idle_polls=1))
    assert len(r2) == 1 and r2[0].changes_fenced == 0

    t = lake2.final_table().to_pandas()
    assert dict(zip(t["conv_id"], t["text"])) == {"a": "x2"}

    with open(os.path.join(lake2.store.dir, "debezium-tail.json")) as f:
        assert set(json.load(f)["files"]) == {
            "w-000001.jsonl", "w-000002.jsonl",
        }


def test_tail_debezium_crash_before_ledger_is_fenced_noop(
    ray_session, tmp_path
):
    """Crash between epoch commit and ledger write: the re-read applies
    zero changes (all fenced) and final state is unchanged."""
    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    shard_dir = str(tmp_path / "wal")
    os.makedirs(shard_dir)
    _write_shard(shard_dir, "w-000001.jsonl", [
        _row(1, "insert", "a", 0, "x"), _row(2, "insert", "b", 0, "y"),
    ])
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=4)
    list(lake.tail_debezium(shard_dir, poll_interval=0.01, idle_polls=1))
    before = lake.final_table().to_pandas()
    epoch_before = lake.manifest.epoch

    # simulate the crash window: ledger lost AFTER the commit
    os.remove(os.path.join(lake.store.dir, "debezium-tail.json"))
    lake2 = CDCLake(str(tmp_path / "lake"), num_partitions=4)
    r = list(lake2.tail_debezium(shard_dir, poll_interval=0.01, idle_polls=1))
    assert len(r) == 1
    assert r[0].changes_applied == 0 and r[0].changes_fenced == 2, (
        "re-read rows must all be fenced to no-ops"
    )
    after = lake2.final_table().to_pandas()
    assert before.equals(after)
    assert lake2.manifest.epoch == epoch_before + 1  # the no-op epoch


def test_tail_debezium_quarantines_poison_lines(ray_session, tmp_path):
    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    shard_dir = str(tmp_path / "wal")
    os.makedirs(shard_dir)
    _write_shard(shard_dir, "w-000001.jsonl", [_row(1, "insert", "a", 0, "x")])
    with open(os.path.join(shard_dir, "w-000002.jsonl"), "w") as f:
        f.write('{"payload": {"op": "c", "after"\n')  # broken JSON

    lake = CDCLake(str(tmp_path / "lake"), num_partitions=4)
    rs = list(lake.tail_debezium(shard_dir, poll_interval=0.01, idle_polls=1))
    assert sum(r.rows_quarantined for r in rs) == 1
    qt = lake.quarantine_table()
    assert all(
        e.startswith("debezium: ") for e in qt["error"].to_pylist()
    )
    t = lake.final_table().to_pandas()
    assert list(t["conv_id"]) == ["a"]
