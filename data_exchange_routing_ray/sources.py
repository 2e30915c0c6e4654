"""External change-stream source adapters.

``read_debezium_jsonl`` ingests the de-facto standard binlog-to-JSON
format (Debezium's change-event envelope: ``{"payload": {"op", "before",
"after", "source", "ts_ms"}}``) as a ``ray.data.Dataset`` conforming to
``CHANGE_SCHEMA``, so any Debezium-fronted database (MySQL binlog,
Postgres WAL, Mongo oplog) can tail straight into ``CDCLake.apply_changes``.

Reference parity: the reference consumes JSON change events from a queue
(``fns-routing`` service-bus trigger, one JSON document per message);
Debezium's envelope is the open-source equivalent of that event contract.

Scale shape: ``ray.data.read_text`` streams the shard files; envelope
parsing is a per-batch ``map_batches`` stage (JSON decode is inherently
per-row — it is the SOURCE boundary, after which everything is Arrow).
Malformed lines and unknown ops are surfaced on an ``error`` column (the
dead-letter contract ``stages/validate.py`` already enforces downstream)
rather than dropped silently.
"""

from __future__ import annotations

import json

import pyarrow as pa

import ray.data

from data_exchange_routing_ray.schemas import CHANGE_SCHEMA

# Debezium op codes → engine ops ("r" = snapshot read = initial insert)
_DEBEZIUM_OPS = {"c": "insert", "r": "insert", "u": "update", "d": "delete"}

_PAYLOAD_FIELDS = ("conv_id", "turn_idx", "role", "text", "tool", "ts")


def to_debezium_envelope(row: dict, op: str, seq: int) -> dict:
    """One engine change row → a Debezium-style envelope dict (the inverse
    of the reader; used by the round-trip gate and by tests)."""
    code = {"insert": "c", "update": "u", "delete": "d"}[op]
    image = {k: row.get(k) for k in _PAYLOAD_FIELDS}
    return {
        "payload": {
            "op": code,
            "before": image if code == "d" else None,
            "after": None if code == "d" else image,
            "source": {"sequence": int(seq)},
            "ts_ms": (row.get("ts") or 0) // 1000,
        }
    }


def parse_debezium_lines(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """map_batches stage: JSONL envelope lines → CHANGE_SCHEMA columns plus
    an ``error`` column (null = parsed clean; non-null rows carry null
    payload and ride to quarantine through the normal validator)."""
    lines = batch[text_col].to_pylist()
    n = len(lines)
    cols: dict[str, list] = {f.name: [None] * n for f in CHANGE_SCHEMA}
    errors: list = [None] * n
    for i, line in enumerate(lines):
        try:
            env = json.loads(line)
            p = env.get("payload", env)  # tolerate unwrapped payloads
            code = p.get("op")
            op = _DEBEZIUM_OPS.get(code)
            if op is None:
                raise ValueError(f"unknown Debezium op {code!r}")
            image = p.get("before") if code == "d" else p.get("after")
            if image is None:
                raise ValueError(f"missing {'before' if code == 'd' else 'after'} image")
            src = p.get("source") or {}
            seq = src.get("sequence")
            if seq is None:
                raise ValueError("missing source.sequence")
            cols["seq"][i] = int(seq)
            cols["op"][i] = op
            cols["conv_id"][i] = image.get("conv_id")
            ti = image.get("turn_idx")
            cols["turn_idx"][i] = None if ti is None else int(ti)
            cols["role"][i] = image.get("role")
            cols["text"][i] = None if op == "delete" else image.get("text")
            cols["tool"][i] = None if op == "delete" else image.get("tool")
            ts = image.get("ts")
            cols["ts"][i] = None if ts is None else int(ts)
        except (ValueError, TypeError, KeyError, json.JSONDecodeError) as e:
            errors[i] = f"debezium: {e}"
    out = pa.table(
        {f.name: pa.array(cols[f.name], f.type) for f in CHANGE_SCHEMA}
    )
    return out.append_column("error", pa.array(errors, pa.string()))


def read_debezium_jsonl(paths: str | list[str]) -> ray.data.Dataset:
    """Debezium-envelope JSONL shard files → a CHANGE_SCHEMA dataset (plus
    the ``error`` column for malformed lines), ready for
    ``CDCLake.apply_changes`` (whose validator quarantines errored rows)."""
    return ray.data.read_text(paths).map_batches(
        parse_debezium_lines, batch_format="pyarrow"
    )
