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
    for row in batch.to_pylist():
        try:
            rows.append(row_fn(row))
            errs.append(None)
        except Exception as e:  # noqa: BLE001 — the whole point is isolation
            rows.append({k: None for k in row_fn_keys(row_fn, row)})
            errs.append(f"{type(e).__name__}: {e}")
    out = pa.Table.from_pylist(rows)
    return out.append_column(error_column, pa.array(errs, pa.string()))


def row_fn_keys(row_fn: Callable[[dict], dict], row: dict) -> list[str]:
    """Output keys of ``row_fn`` for building the null row of a failure —
    derived from a success row when possible, else from the input keys."""
    keys = getattr(row_fn, "output_keys", None)
    if keys:
        return list(keys)
    return list(row.keys())
