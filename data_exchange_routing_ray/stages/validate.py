"""Vectorized change-event validation with dead-letter semantics.

Re-expresses the reference's fail-stop metadata validation
(``validateSourceBlobMeta``, ``RouteIngestedFile.kt:111-146``), event-type
guard (``FnRouter.kt:72-84``) and generic payload validator
(``FnCSVValidationGeneric.kt:30-49``) as ONE zero-copy Arrow ``map_batches``
stage that annotates every row with an ``error`` column (null = valid).
First failing rule wins, mirroring the reference's sequential
``stopProcessing`` short-circuit (``Util.kt:19-21``).

Invalid rows are quarantined (dead-letter sink analog of the
``route-deadletter`` container, ``RouteIngestedFile.kt:308-329``) instead of
failing the pipeline.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from data_exchange_routing_ray.schemas import VALID_OPS

# Exact error strings, asserted by tests the way the reference's unit matrix
# asserts errorMessage strings (Unit_FnDecompressor.kt:88-135).
ERR_MISSING_SEQ = "Missing seq (ordering token)"
ERR_BAD_OP = "Unsupported op; expected insert|update|delete"
ERR_MISSING_CONV = "Missing conv_id in event"
ERR_MISSING_TURN = "Missing turn_idx in event"
ERR_BAD_TS = "Missing or unparseable ts"
ERR_EMPTY_PAYLOAD = "Payload metadata is missing or empty for insert"

ERROR_COLUMN = "error"


def _null_or_empty(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    return pc.or_kleene(
        pc.is_null(col), pc.equal(pc.cast(col, pa.string()), pa.scalar(""))
    )


REQUIRED_COLUMNS = {
    "seq": pa.int64(),
    "op": pa.string(),
    "conv_id": pa.string(),
    "turn_idx": pa.int32(),
    "ts": pa.timestamp("us"),
}


def validate_batch(batch: pa.Table) -> pa.Table:
    """Append an ``error`` string column; null error == valid row.

    A batch missing a required column entirely (malformed shard schema) is
    backfilled with nulls so the per-row null rules dead-letter every row —
    schema tolerance via defaults, the reference's getOrDefault posture
    (RouteIngestedFile.kt:125-140) — instead of crashing the pipeline."""
    for name, typ in REQUIRED_COLUMNS.items():
        if name not in batch.column_names:
            batch = batch.append_column(name, pa.nulls(batch.num_rows, typ))
    n = batch.num_rows
    if ERROR_COLUMN in batch.column_names:
        # fail-stop chain across STAGES: an upstream source adapter's
        # error (e.g. a malformed Debezium envelope) outranks the row
        # rules, so the dead-letter row carries the root cause instead of
        # the knock-on null-field message. Replayers re-enqueue repaired
        # rows with the column dropped (cdc_quarantine_replay).
        err = batch[ERROR_COLUMN].cast(pa.string())
        if isinstance(err, pa.ChunkedArray):
            err = err.combine_chunks()
    else:
        err = pa.nulls(n, pa.string())

    def apply_rule(err, mask, msg):
        # first failing rule wins (fail-stop order)
        mask = pc.fill_null(mask, True)
        return pc.if_else(pc.and_kleene(pc.is_null(err), mask), pa.scalar(msg), err)

    cols = set(batch.column_names)
    err = apply_rule(err, pc.is_null(batch["seq"]), ERR_MISSING_SEQ)
    err = apply_rule(
        err,
        pc.invert(pc.is_in(batch["op"], value_set=pa.array(VALID_OPS))),
        ERR_BAD_OP,
    )
    err = apply_rule(err, _null_or_empty(batch["conv_id"]), ERR_MISSING_CONV)
    err = apply_rule(err, pc.is_null(batch["turn_idx"]), ERR_MISSING_TURN)
    err = apply_rule(err, pc.is_null(batch["ts"]), ERR_BAD_TS)
    if {"role", "text"} <= cols:
        payload_null = pc.and_kleene(
            pc.is_null(batch["role"]), pc.is_null(batch["text"])
        )
        is_insert = pc.equal(batch["op"], pa.scalar("insert"))
        err = apply_rule(
            err, pc.and_kleene(is_insert, payload_null), ERR_EMPTY_PAYLOAD
        )

    if ERROR_COLUMN in cols:
        batch = batch.drop_columns([ERROR_COLUMN])
    return batch.append_column(ERROR_COLUMN, err)


def keep_valid(batch: pa.Table) -> pa.Table:
    """Filter to valid rows and drop the error column."""
    out = batch.filter(pc.is_null(batch[ERROR_COLUMN]))
    return out.drop_columns([ERROR_COLUMN])


def keep_invalid(batch: pa.Table) -> pa.Table:
    """Filter to quarantine rows (error column retained for the dead-letter)."""
    return batch.filter(pc.is_valid(batch[ERROR_COLUMN]))


def validate_and_keep_valid(batch: pa.Table) -> pa.Table:
    """One-pass validate + filter for the hot path."""
    return keep_valid(validate_batch(batch))
