"""guarded_udf_batch: vectorized fast path on clean batches, per-row
isolation only for poison batches, exact error strings, no dropped rows."""

import pyarrow as pa

from data_exchange_routing_ray.stages.udf_guard import guarded_udf_batch


def _vec(b: pa.Table) -> pa.Table:
    import numpy as np

    v = b["x"].to_numpy()
    if (v < 0).any():
        raise ValueError("negatives")
    return pa.table({"x": b["x"], "y": pa.array((v * 2).astype(np.int64))})


def _row(row: dict) -> dict:
    if row["x"] < 0:
        raise ValueError(f"bad x={row['x']}")
    return {"x": row["x"], "y": row["x"] * 2}


_row.output_keys = ["x", "y"]


def test_clean_batch_stays_vectorized():
    calls = {"rows": 0}

    def counting_row(row):
        calls["rows"] += 1
        return _row(row)

    out = guarded_udf_batch(
        pa.table({"x": pa.array([1, 2, 3])}), _vec, counting_row
    )
    assert calls["rows"] == 0  # never degraded to the row loop
    assert out["y"].to_pylist() == [2, 4, 6]
    assert out["error"].null_count == 3


def test_poison_batch_isolates_per_row():
    out = guarded_udf_batch(
        pa.table({"x": pa.array([1, -5, 3])}), _vec, _row
    )
    assert out.num_rows == 3  # nothing dropped
    assert out["y"].to_pylist() == [2, None, 6]
    errs = out["error"].to_pylist()
    assert errs[0] is None and errs[2] is None
    assert errs[1] == "ValueError: bad x=-5"


def test_failure_placeholders_use_output_schema_not_input():
    """Round-2 ADVICE: when row_fn's output schema differs from the input,
    failed rows must be keyed by the OUTPUT schema (learned from the first
    success, retrofitted to earlier failures) — not input-keyed null dicts
    that union into a mixed schema."""
    import pyarrow as pa

    from data_exchange_routing_ray.stages.udf_guard import guarded_udf_batch

    batch = pa.table({"x": [1, 2, 3, 4]})

    def vector_fn(b):
        raise RuntimeError("force the per-row path")

    def row_fn(row):
        if row["x"] % 2 == 0:
            raise ValueError("poison")
        return {"doubled": row["x"] * 2, "tag": f"t{row['x']}"}

    # first row FAILS (x=2 ordering): put a failure before any success
    batch = pa.table({"x": [2, 1, 4, 3]})
    out = guarded_udf_batch(batch, vector_fn, row_fn)
    assert set(out.column_names) == {"doubled", "tag", "error"}
    df = out.to_pandas()
    assert df["error"].notna().tolist() == [True, False, True, False]
    assert df["doubled"].tolist()[1] == 2
    assert df["doubled"].isna().tolist() == [True, False, True, False]


def test_all_rows_fail_without_output_keys_falls_back_to_input():
    import pyarrow as pa

    from data_exchange_routing_ray.stages.udf_guard import guarded_udf_batch

    batch = pa.table({"x": [1, 2]})

    def vector_fn(b):
        raise RuntimeError("no vector path")

    def row_fn(row):
        raise ValueError("always poison")

    out = guarded_udf_batch(batch, vector_fn, row_fn)
    assert set(out.column_names) == {"x", "error"}
    assert out.to_pandas()["error"].notna().all()
