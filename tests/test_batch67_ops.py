"""Round-2 batches 6-7: properties the DuckDB driver gate can't see —
block-layout invariance of the bucketed reduces, funnel strict-ordering
semantics, streak island algebra, windowed-dedup keep-first tie-break,
and the point-lookup's partition-pruning claim.
"""

import os

import numpy as np
import pandas as pd

from data_exchange_routing_ray.pipelines import events_cdc as q

SF = "/root/testdata/sf0.001"


def _perturb_blocks(monkeypatch, n=7):
    import ray.data

    orig = ray.data.read_parquet

    def perturbed(*args, **kwargs):
        kwargs["override_num_blocks"] = n
        return orig(*args, **kwargs)

    monkeypatch.setattr(ray.data, "read_parquet", perturbed)
    return orig


def test_funnel_block_invariance_and_monotonicity(ray_session, monkeypatch):
    a = q.funnel_conversion(SF).to_pandas().sort_values("step")
    orig = _perturb_blocks(monkeypatch)
    b = q.funnel_conversion(SF).to_pandas().sort_values("step")
    monkeypatch.setattr(__import__("ray.data", fromlist=["data"]), "read_parquet", orig)
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))
    ns = a.set_index("step")["n_users"]
    # a funnel can only narrow
    assert ns["step1_view"] >= ns["step2_click"] >= ns["step3_purchase"]
    assert ns["step1_view"] > 0


def test_funnel_strict_order_semantics(ray_session):
    """Serial oracle: a user converts step k only with a strictly later
    timestamp than their step k-1 time."""
    ev = pd.read_parquet(
        f"{SF}/events.parquet", columns=["user_id", "event_type", "ts"]
    )
    got = q.funnel_conversion(SF).to_pandas().set_index("step")["n_users"]
    s1 = s2 = s3 = 0
    for _, g in ev.groupby("user_id"):
        t1 = g.loc[g.event_type == "view", "ts"].min()
        if pd.isna(t1):
            continue
        s1 += 1
        t2 = g.loc[(g.event_type == "click") & (g.ts > t1), "ts"].min()
        if pd.isna(t2):
            continue
        s2 += 1
        t3 = g.loc[(g.event_type == "purchase") & (g.ts > t2), "ts"].min()
        if not pd.isna(t3):
            s3 += 1
    assert (got["step1_view"], got["step2_click"], got["step3_purchase"]) == (
        s1,
        s2,
        s3,
    )


def test_streaks_island_algebra(ray_session):
    """longest_streak <= n_active_days, and both match a serial
    diff-based oracle."""
    got = q.user_activity_streaks(SF).to_pandas().set_index("user_id")
    assert (got["longest_streak"] <= got["n_active_days"]).all()
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    ev["d"] = ev["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
    for uid, g in ev.groupby("user_id"):
        days = np.sort(g["d"].unique())
        runs = np.split(days, np.where(np.diff(days) != 1)[0] + 1)
        assert got.loc[uid, "n_active_days"] == len(days)
        assert got.loc[uid, "longest_streak"] == max(len(r) for r in runs)


def test_cohort_retention_offset0_is_cohort_size(ray_session):
    """Every user appears at offset 0 of their own cohort, so the
    offset-0 diagonal partitions the user set."""
    got = q.cohort_retention(SF).to_pandas()
    n_users = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])[
        "user_id"
    ].nunique()
    d0 = got[got.day_offset == 0]
    assert int(d0["n_users"].sum()) == n_users
    assert (got["day_offset"] >= 0).all()


def test_window_dedup_keep_first_tiebreak(ray_session):
    """Combiner + reduce must keep the (ts, event_id)-minimal row per
    (user, type, hour) — equality with a serial keep-first."""
    got = (
        q.window_dedup_first(SF).to_pandas().sort_values("event_type").reset_index(drop=True)
    )
    ev = pd.read_parquet(
        f"{SF}/events.parquet",
        columns=["user_id", "event_type", "ts", "event_id", "value"],
    )
    tsu = ev["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    ev = ev.assign(tsu=tsu, hour=tsu // (3600 * 10**6))
    kept = ev.sort_values(["tsu", "event_id"], kind="stable").drop_duplicates(
        ["user_id", "event_type", "hour"], keep="first"
    )
    kept = kept.assign(ticks=np.floor(kept["value"].to_numpy() * 10000.0).astype(np.int64))
    want = (
        kept.groupby("event_type", as_index=False)
        .agg(n_kept=("event_id", "size"), sum_ticks=("ticks", "sum"))
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype({"n_kept": "int64"}), want)


def test_tfidf_rank_is_block_invariant(ray_session, monkeypatch):
    a = q.tfidf_top_terms(SF).to_pandas()
    orig = _perturb_blocks(monkeypatch, n=5)
    b = q.tfidf_top_terms(SF).to_pandas()
    monkeypatch.setattr(__import__("ray.data", fromlist=["data"]), "read_parquet", orig)
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )
    # exactly k rows per doc (docs have >= 3 distinct terms in testdata)
    assert (a.groupby("doc_id").size() == 3).all()


def test_lake_point_lookup_reads_one_partition(ray_session, monkeypatch):
    """The serving read must touch exactly one partition file (+its
    deltas), never scan the lake."""
    import pyarrow.parquet as pq

    opened = []
    orig = pq.read_table

    def spy(path, *a, **k):
        opened.append(str(path))
        return orig(path, *a, **k)

    monkeypatch.setattr(pq, "read_table", spy)
    out = q.lake_point_lookup(SF).to_pandas()
    monkeypatch.setattr(pq, "read_table", orig)
    lake_files = [p for p in opened if "part-" in os.path.basename(p)]
    # one base file; deltas only if that partition has them
    assert len({os.path.basename(p) for p in lake_files}) >= 1
    base_files = [p for p in lake_files if "delta" not in os.path.basename(p)]
    assert len(base_files) == 1
    assert len(out) > 0 and out["conv_id"].nunique() == 1
    assert (np.diff(out["turn_idx"].to_numpy()) > 0).all()
