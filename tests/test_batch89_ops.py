"""Round-2 batches 8-9: properties the DuckDB gate can't see —
skyline dominance (no kept point dominated, no dropped frontier point),
sliding-distinct window algebra, decorrelated-filter exactness on ties,
shuffle-sample determinism across block layouts, and predicate-delete
exactly-once semantics under redelivery.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from data_exchange_routing_ray.pipelines import events_cdc as q

SF = "/root/testdata/sf0.001"


def _as_arrow(block):
    return pa.Table.from_pandas(block) if isinstance(block, pd.DataFrame) else block


def test_pareto_frontier_dominance(ray_session):
    got = q.pareto_orders(SF).to_pandas()
    orders = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_totalprice", "o_orderdate"]
    )
    pts = pd.DataFrame(
        {
            "k": orders["o_orderkey"],
            "p": np.floor(orders["o_totalprice"].to_numpy() * 100).astype(np.int64),
            "d": orders["o_orderdate"]
            .to_numpy()
            .astype("datetime64[D]")
            .astype(np.int64),
        }
    )

    def dominated(p, d):
        m = (pts["p"].to_numpy() >= p) & (pts["d"].to_numpy() <= d) & (
            (pts["p"].to_numpy() > p) | (pts["d"].to_numpy() < d)
        )
        return m.any()

    # every kept point is non-dominated
    for _, r in got.iterrows():
        assert not dominated(r["price_ticks"], r["order_day"])
    # every non-dominated point is kept
    n_frontier = sum(
        not dominated(p, d) for p, d in zip(pts["p"], pts["d"])
    )
    assert n_frontier == len(got)


def test_rolling_7d_window_algebra(ray_session):
    got = q.rolling_7d_active_users(SF).to_pandas().set_index("day")
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    ev["d"] = ev["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
    ud = ev[["user_id", "d"]].drop_duplicates()
    for day in got.index:
        want = ud.loc[(ud["d"] >= day - 6) & (ud["d"] <= day), "user_id"].nunique()
        assert got.loc[day, "n_active_7d"] == want
    # window counts dominate the single-day counts
    daily = ud.groupby("d")["user_id"].nunique()
    for day in got.index:
        assert got.loc[day, "n_active_7d"] >= daily.get(day, 0)


def test_orders_above_avg_excludes_exact_mean(ray_session):
    """Single-order customers sit exactly AT their mean — the strict
    comparison must exclude every one of them."""
    got = int(q.orders_above_customer_avg(SF).to_pandas()["n_above"].sum())
    orders = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    t = np.floor(orders["o_totalprice"].to_numpy() * 100).astype(np.int64)
    df = pd.DataFrame({"c": orders["o_custkey"], "t": t})
    s = df.groupby("c")["t"].transform("sum")
    n = df.groupby("c")["t"].transform("size")
    assert got == int((df["t"] * n > s).sum())
    singles = df[n == 1]
    assert ((singles["t"] * 1) > singles.groupby("c")["t"].transform("sum")).sum() == 0


def test_shuffle_sample_block_invariant_and_uniformish(ray_session, monkeypatch):
    a = q.deterministic_shuffle_sample(SF).to_pandas()
    import ray.data

    orig = ray.data.read_parquet

    def perturbed(*args, **kwargs):
        kwargs["override_num_blocks"] = 9
        return orig(*args, **kwargs)

    monkeypatch.setattr(ray.data, "read_parquet", perturbed)
    b = q.deterministic_shuffle_sample(SF).to_pandas()
    monkeypatch.setattr(ray.data, "read_parquet", orig)
    pd.testing.assert_frame_equal(a, b)
    # ranks are 1..k and strictly ordered by (h, doc_id)
    assert list(a["rank"]) == list(range(1, len(a) + 1))
    hs = a[["h", "doc_id"]].to_numpy()
    assert all(tuple(hs[i]) < tuple(hs[i + 1]) for i in range(len(hs) - 1))


def test_chunk_dedup_fraction_bounds(ray_session):
    got = q.chunk_dedup_fraction(SF).to_pandas()
    assert (got["n_kept"] <= got["n_chunks"]).all()
    assert (got["n_kept"] >= 0).all()
    # totals agree with a serial chunker
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    want_chunks = ((docs["text"].str.len().clip(lower=1) - 1) // 256 + 1).astype(int)
    merged = got.set_index("doc_id")["n_chunks"]
    for did, w in zip(docs["doc_id"], want_chunks):
        assert merged[did] == w
    # global kept count equals number of distinct chunks
    allchunks = []
    for did, t in zip(docs["doc_id"], docs["text"]):
        for i in range(0, max(len(t), 1), 256):
            allchunks.append(t[i : i + 256])
    assert int(got["n_kept"].sum()) == len(set(allchunks))


def test_predicate_delete_redelivery_is_noop(ray_session, tmp_path):
    """Replaying the SAME delete epoch must be fenced to a no-op, and no
    surviving row matches the predicate."""
    import os

    import pyarrow as pa
    import pyarrow.compute as pc

    from data_exchange_routing_ray.pipelines.cdc import CDCLake
    from data_exchange_routing_ray.pipelines.events_cdc import (
        _events,
        derived_change_stream,
    )

    hi = int(_events(SF, columns=["event_id"]).max("event_id"))
    lake = CDCLake(os.path.join(str(tmp_path), "lake"), num_partitions=8)
    lake.apply_changes(derived_change_stream(SF), quarantine=False)

    def to_deletes(b: pa.Table) -> pa.Table:
        t = b.filter(pc.fill_null(pc.equal(b["tool"], "error"), False))
        n = t.num_rows
        return pa.table(
            {
                "seq": pa.array(np.full(n, hi + 1, np.int64)),
                "op": pa.array(["delete"] * n, pa.string()),
                "conv_id": t["conv_id"],
                "turn_idx": t["turn_idx"],
                "role": pa.nulls(n, pa.string()),
                "text": pa.nulls(n, pa.string()),
                "tool": pa.nulls(n, pa.string()),
                "ts": t["ts"],
            }
        )

    # materialize the delete set ONCE so redelivery replays the exact same
    # (seq, key) rows — empty-second-derivation would not exercise fencing
    refs = (
        lake.final_dataset(columns=["conv_id", "turn_idx", "tool", "ts"])
        .map_batches(to_deletes, batch_format="pyarrow")
        .to_arrow_refs()
    )
    delete_tab = pa.concat_tables(
        [_as_arrow(ray.get(r)) for r in refs], promote_options="permissive"
    )
    assert delete_tab.num_rows > 0
    lake.apply_changes(ray.data.from_arrow(delete_tab), quarantine=False)
    state1 = lake.final_table().to_pandas()
    assert not (state1["tool"] == "error").any()

    # redeliver the IDENTICAL delete epoch — seq <= watermark, fenced no-op
    lake.apply_changes(ray.data.from_arrow(delete_tab), quarantine=False)
    state2 = lake.final_table().to_pandas()
    pd.testing.assert_frame_equal(state1, state2)
