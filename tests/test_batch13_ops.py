"""Round-2 batch 13: properties the DuckDB gate can't see — the FK audit
actually catching planted orphans, interval-overlap counts vs a brute
O(C*P) pairwise check, and gini/regression partials being exact under a
perturbed block layout.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from data_exchange_routing_ray.pipelines import events_cdc as q

SF = "/root/testdata/sf0.001"


def test_fk_audit_catches_planted_orphans(ray_session):
    """The bucketed anti join behind the audit must count exactly the
    planted orphan keys, across bucket boundaries."""
    from data_exchange_routing_ray.functions.joins import filter_join_bucketed

    rng = np.random.default_rng(5)
    parent = np.arange(1000, dtype=np.int64)
    child = rng.choice(parent, size=5000).astype(np.int64)
    orphans = np.arange(10_000, 10_037, dtype=np.int64)  # 37 planted
    child = np.concatenate([child, orphans])
    out = filter_join_bucketed(
        ray.data.from_arrow(pa.table({"k": child})),
        pa.schema([("k", pa.int64())]),
        ray.data.from_arrow(pa.table({"k": parent})),
        "k",
        "k",
        keep_matches=False,
        num_buckets=16,
    )
    assert out.count() == 37


def test_interval_overlap_matches_bruteforce():
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    tsu = ev["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    ev = ev.assign(s=tsu, e=tsu + (ev["event_id"].to_numpy() % 900 + 60) * 1_000_000)
    clicks = ev[ev.event_type == "click"]
    purch = ev[ev.event_type == "purchase"]
    got = q.interval_overlap_counts(SF).to_pandas().set_index("user_id")
    for uid, cg in clicks.groupby("user_id"):
        pg = purch[purch.user_id == uid]
        n_pairs = 0
        for cs, ce in zip(cg["s"], cg["e"]):
            n_pairs += int(((pg["s"] < ce) & (cs < pg["e"])).sum())
        assert int(got.loc[uid, "n_clicks"]) == len(cg)
        assert int(got.loc[uid, "n_pairs"]) == n_pairs, uid
    assert set(got.index) == set(clicks["user_id"].unique())


def test_gini_identity_and_bounds():
    """gini_num/gini_den must equal 1 - sum p_i^2 computed serially, and
    the fraction must be in [0, 1 - 1/k] for k observed types."""
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    got = q.user_event_gini(SF).to_pandas().set_index("user_id")
    for uid, g in ev.groupby("user_id"):
        counts = g["event_type"].value_counts().to_numpy(np.int64)
        n = counts.sum()
        num, den = int(n * n - (counts**2).sum()), int(n * n)
        assert int(got.loc[uid, "gini_num"]) == num
        assert int(got.loc[uid, "gini_den"]) == den
        frac = num / den
        assert 0.0 <= frac <= 1.0 - 1.0 / len(counts) + 1e-12


def test_regression_sums_block_layout_invariant(ray_session, monkeypatch):
    """Mergeable regression partials must be bit-identical under a
    genuinely different block layout (integer sums commute)."""
    a = q.regression_sums_per_type(SF).to_pandas()
    import ray.data

    orig = ray.data.read_parquet

    def perturbed(*args, **kwargs):
        kwargs["override_num_blocks"] = 11
        return orig(*args, **kwargs)

    monkeypatch.setattr(ray.data, "read_parquet", perturbed)
    b = q.regression_sums_per_type(SF).to_pandas()
    monkeypatch.setattr(ray.data, "read_parquet", orig)
    pd.testing.assert_frame_equal(a, b)
    # slope recovered from the sums matches numpy lstsq per type
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    x = (
        ev["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        - 1_704_067_200_000_000
    ) // 3_600_000_000
    y = np.floor(ev["value"].to_numpy() * 10000.0).astype(np.int64)
    for _, r in a.iterrows():
        m = (ev["event_type"] == r["event_type"]).to_numpy()
        slope_np = np.polyfit(x[m].astype(float), y[m].astype(float), 1)[0]
        n, sx, sy, sxx, sxy = (
            int(r["n"]), int(r["sum_x"]), int(r["sum_y"]),
            int(r["sum_xx"]), int(r["sum_xy"]),
        )
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)  # exact int ratio
        assert abs(slope - slope_np) < 1e-6


def test_daily_new_returning_totals():
    """Each user is new exactly once; actives partition into new+returning."""
    got = q.daily_new_vs_returning(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    assert int(got["n_new"].sum()) == ev["user_id"].nunique()
    assert (got["n_active"] == got["n_new"] + got["n_returning"]).all()
    day = ev["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // (
        86400 * 10**6
    )
    exp_active = (
        pd.DataFrame({"user_id": ev["user_id"], "day": day})
        .drop_duplicates()
        .groupby("day")
        .size()
    )
    got_idx = got.set_index("day")["n_active"]
    assert (got_idx.sort_index() == exp_active.sort_index()).all()
