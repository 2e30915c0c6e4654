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
