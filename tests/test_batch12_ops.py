"""Round-2 batch 12: properties the DuckDB gate can't see —
partition-count invariance of the sweep-line prefix scan, brute-force
cross-checks of the trailing-window spike flags and bigram familiarity,
and partition pruning actually restricting the hive read.
"""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from data_exchange_routing_ray.pipelines import events_cdc as q

SF = "/root/testdata/sf0.001"


def _events_df() -> pd.DataFrame:
    return pq.read_table(f"{SF}/events.parquet").to_pandas()


def test_max_concurrent_range_count_invariant():
    """The two-pass prefix scan must give identical per-type peaks whether
    the boundary stream is split into 1 range (pure in-memory cumsum) or
    many ranges (base offsets broadcast across partitions)."""
    one = q.max_concurrent_intervals(SF, n_ranges=1).to_pandas()
    many = q.max_concurrent_intervals(SF, n_ranges=48).to_pandas()
    pd.testing.assert_frame_equal(
        one.reset_index(drop=True), many.reset_index(drop=True)
    )


def test_max_concurrent_matches_bruteforce_sweep():
    df = _events_df()
    tsu = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    dur = (df["event_id"].to_numpy() % 900 + 60) * 1_000_000
    got = (
        q.max_concurrent_intervals(SF)
        .to_pandas()
        .set_index("event_type")["max_concurrency"]
    )
    for et in df["event_type"].unique():
        m = (df["event_type"] == et).to_numpy()
        pts = np.concatenate(
            [
                np.stack([tsu[m], np.ones(m.sum(), np.int64)], axis=1),
                np.stack([tsu[m] + dur[m], -np.ones(m.sum(), np.int64)], axis=1),
            ]
        )
        # ends before starts at equal time => end-exclusive intervals
        order = np.lexsort((pts[:, 1], pts[:, 0]))
        peak = int(np.cumsum(pts[order, 1]).max())
        assert got[et] == peak


def test_spike_flags_match_bruteforce_rolling():
    df = _events_df()
    hour = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // (
        3600 * 10**6
    )
    brute = (
        pd.DataFrame({"event_type": df["event_type"], "hour": hour})
        .groupby(["event_type", "hour"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
        .sort_values(["event_type", "hour"])
    )
    parts = []
    for _, g in brute.groupby("event_type"):
        n = g["n"].to_numpy(np.int64)
        trail = (
            pd.Series(n).rolling(24, min_periods=0).sum().shift(1).fillna(0)
        ).to_numpy(np.int64)
        g = g.copy()
        g["trail_sum"] = trail
        g["is_spike"] = (
            (n * 24 > 2 * trail) & (np.arange(len(n)) >= 24)
        ).astype(np.int64)
        parts.append(g)
    exp = pd.concat(parts).reset_index(drop=True)
    got = q.spike_detect_hours(SF).to_pandas()
    pd.testing.assert_frame_equal(
        got.astype({"n": "int64"}),
        exp.astype({"n": "int64"})[got.columns.tolist()],
        check_dtype=False,
    )


def test_profile_distinct_counts_match_pandas():
    df = _events_df()
    got = q.profile_table_stats(SF).to_pandas().set_index("col")
    assert got.loc["event_id", "n_distinct"] == df["event_id"].nunique()
    assert got.loc["user_id", "n_distinct"] == df["user_id"].nunique()
    assert got.loc["event_type", "n_distinct"] == df["event_type"].nunique()
    assert (
        got.loc["value", "n_distinct"]
        == np.floor(df["value"].to_numpy() * 10000.0).astype(np.int64).size
        - (
            len(df)
            - pd.Series(
                np.floor(df["value"].to_numpy() * 10000.0).astype(np.int64)
            ).nunique()
        )
    )
    assert got.loc["event_id", "n_null"] == int(df["event_id"].isna().sum())


def test_hive_pruned_read_only_selected_partitions():
    out = q.hive_pruned_read(SF).to_pandas()
    assert set(out["event_type"]) <= {"click", "purchase"}
    df = _events_df()
    exp = df[df["event_type"].isin(["click", "purchase"])]
    assert out["n"].sum() == len(exp)


def test_bigram_familiarity_matches_bruteforce():
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    rows = []
    for did, text in zip(docs["doc_id"], docs["text"]):
        w = text.split(" ")
        for a, b in zip(w[:-1], w[1:]):
            rows.append((did, a + " " + b))
    bg = pd.DataFrame(rows, columns=["doc_id", "bigram"])
    dn = bg.groupby(["doc_id", "bigram"], as_index=False).size()
    gn = dn.groupby("bigram", as_index=False)["size"].sum()
    m = dn.merge(gn, on="bigram", suffixes=("_d", "_g"))
    exp = (
        (m["size_d"] * m["size_g"])
        .groupby(m["doc_id"])
        .sum()
        .rename("familiarity")
        .reset_index()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = q.doc_bigram_familiarity(SF).to_pandas()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
