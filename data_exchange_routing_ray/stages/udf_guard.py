"""Failure-isolating UDF stage: vectorized fast path, per-row fallback.

The reference wraps every user-facing transform in try/catch with a
dead-letter path (``RouteIngestedFile.kt:308-329`` — a failing file goes to
``route-deadletter``, the pipeline keeps moving). The Ray-native analog for
row-level UDFs: run the VECTORIZED kernel on the whole batch; only when a
batch actually contains poison rows does it degrade to a per-row loop that
isolates each failure into an ``error`` column (quarantine-compatible) —
the happy path stays zero-copy/vectorized, the failure path costs O(rows)
only for the batches that need it.
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa


def guarded_udf_batch(
    batch: pa.Table,
    vector_fn: Callable[[pa.Table], pa.Table],
    row_fn: Callable[[dict], dict],
    error_column: str = "error",
) -> pa.Table:
    """Apply ``vector_fn`` to the whole batch; on ANY raise, re-run row by
    row with ``row_fn``, annotating failing rows instead of failing the
    stage. Both callables must produce the same output schema (plus the
    error column, null on success)."""
    try:
        out = vector_fn(batch)
        if error_column not in out.column_names:
            out = out.append_column(
                error_column, pa.nulls(out.num_rows, pa.string())
            )
        return out
    except Exception:
        pass  # poison batch: isolate per row below
    rows, errs = [], []
    out_keys: list[str] | None = (
        list(getattr(row_fn, "output_keys"))
        if getattr(row_fn, "output_keys", None)
        else None
    )
    for row in batch.to_pylist():
        try:
            ok = row_fn(row)
            if out_keys is None:
                # learn the OUTPUT schema from the first success and
                # retrofit earlier failure placeholders — input-keyed
                # nulls would union into a mixed schema when row_fn's
                # output columns differ from its input's
                out_keys = list(ok.keys())
                rows = [
                    r if r is not None else {k: None for k in out_keys}
                    for r in rows
                ]
            rows.append(ok)
            errs.append(None)
        except Exception as e:  # noqa: BLE001 — the whole point is isolation
            rows.append(
                None if out_keys is None else {k: None for k in out_keys}
            )
            errs.append(f"{type(e).__name__}: {e}")
    if out_keys is None:  # every row failed and no declared output_keys:
        out_keys = list(batch.column_names)  # input keys are all we have
    rows = [r if r is not None else {k: None for k in out_keys} for r in rows]
    out = pa.Table.from_pylist(rows)
    return out.append_column(error_column, pa.array(errs, pa.string()))
