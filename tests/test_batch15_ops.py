"""Round-2 batch 15: properties the DuckDB gate can't see — A-ES sample
invariance under block layout and statistical weight bias, duplicate-charge
window boundaries, reconciliation partition totals.
"""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from data_exchange_routing_ray.pipelines import events_cdc as q

SF = "/root/testdata/sf0.001"


def test_weighted_sample_block_layout_invariant(ray_session, monkeypatch):
    """Per-block top-k partials must recover the SAME global top-k under a
    different block layout (the sample is a pure function of the keys)."""
    a = q.weighted_sample_topk(SF, k=120).to_pandas()
    import ray.data

    orig = ray.data.read_parquet

    def perturbed(*args, **kwargs):
        kwargs["override_num_blocks"] = 9
        return orig(*args, **kwargs)

    monkeypatch.setattr(ray.data, "read_parquet", perturbed)
    b = q.weighted_sample_topk(SF, k=120).to_pandas()
    monkeypatch.setattr(ray.data, "read_parquet", orig)
    pd.testing.assert_frame_equal(a, b)


def test_weighted_sample_biases_toward_heavy_rows():
    """A-ES must oversample heavy rows: the sample's mean weight exceeds
    the population mean (sanity on the weighting, not just determinism)."""
    orders = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_totalprice"]
    ).to_pandas()
    pop_mean = np.floor(orders["o_totalprice"].to_numpy() * 100).mean()
    got = q.weighted_sample_topk(SF, k=200).to_pandas()
    assert got["w_ticks"].mean() > pop_mean


def test_duplicate_charges_match_bruteforce_window():
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    p = ev[ev.event_type == "purchase"].copy()
    p["tick"] = np.floor(p["value"].to_numpy() * 10000).astype(np.int64)
    p["tsu"] = p["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    got = q.duplicate_charge_flags(SF).to_pandas().set_index("event_id")
    assert len(got) == len(p)
    for _, r in p.iterrows():
        peers = p[
            (p.user_id == r.user_id)
            & (p.tick == r.tick)
            & (p.event_id != r.event_id)
            & (np.abs(p.tsu - r.tsu) <= 3_600_000_000)
        ]
        assert int(got.loc[int(r.event_id), "n_dups"]) == len(peers)


def test_reconciliation_partitions_orders():
    out = q.order_reconciliation_audit(SF).to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet", columns=["o_orderkey"])
    assert int(out["n_orders"].sum()) == orders.num_rows
    assert (
        out["n_within_25"] + out["n_within_50"] + out["n_off"] == out["n_orders"]
    ).all()


def test_lake_role_counts_consistent_with_final_state():
    fs = q.cdc_final_state(SF).to_pandas()
    got = q.lake_final_role_counts(SF).to_pandas().set_index("conv_id")
    per = fs.groupby("conv_id").agg(
        n_user=("role", lambda s: int((s == "user").sum())),
        n_assistant=("role", lambda s: int((s == "assistant").sum())),
        n_turns=("role", "size"),
    )
    for conv in per.index:
        for c in ("n_user", "n_assistant", "n_turns"):
            assert int(got.loc[conv, c]) == int(per.loc[conv, c]), (conv, c)
