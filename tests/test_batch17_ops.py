"""Round-2 batch 17: brute-force equivalences for the overlap bitmask
fold, positional trim arithmetic, zero-copy embedding reshape, temporal
bucketing, and tombstone/final-state consistency.
"""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from data_exchange_routing_ray.pipelines import events_cdc as q

SF = "/root/testdata/sf0.001"


def _events_df(cols) -> pd.DataFrame:
    return pq.read_table(f"{SF}/events.parquet", columns=cols).to_pandas()


def test_overlap_matrix_matches_bruteforce_and_is_symmetric(ray_session):
    out = q.audience_overlap_matrix(SF).to_pandas()
    ev = _events_df(["user_id", "event_type"]).drop_duplicates()
    brute = ev.merge(ev, on="user_id").groupby(
        ["event_type_x", "event_type_y"]).size()
    m = out.set_index(["type_a", "type_b"])["n_users"]
    assert len(m) == len(brute)
    for (a, b), n in brute.items():
        assert int(m.loc[(a, b)]) == int(n)
        assert int(m.loc[(b, a)]) == int(n)  # symmetry
    # diagonal = distinct users per type
    per_type = ev.groupby("event_type")["user_id"].nunique()
    for t, n in per_type.items():
        assert int(m.loc[(t, t)]) == int(n)


def test_trimmed_stats_match_positional_bruteforce(ray_session):
    out = q.trimmed_stats_per_type(SF).to_pandas().set_index("event_type")
    ev = _events_df(["event_type", "value"])
    ev["tick"] = np.floor(ev["value"].to_numpy() * 100.0).astype(np.int64)
    for et, g in ev.groupby("event_type"):
        t = np.sort(g["tick"].to_numpy())
        n = len(t)
        kept = t[n // 10: n - n // 10]
        assert int(out.loc[et, "n_kept"]) == len(kept)
        assert int(out.loc[et, "sum_ticks"]) == int(kept.sum())


def test_emb_per_dim_stats_match_numpy(ray_session):
    out = q.emb_per_dim_stats(SF).to_pandas().set_index("dim")
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
    flat = np.asarray(t["embedding"].combine_chunks().flatten(),
                      dtype=np.float64)
    arr = np.floor(flat.reshape(-1, 64) * 1_000_000.0).astype(np.int64)
    assert (out["n"] == arr.shape[0]).all()
    np.testing.assert_array_equal(
        out["sum_ticks"].to_numpy(), arr.sum(axis=0))
    np.testing.assert_array_equal(out["min_tick"].to_numpy(), arr.min(axis=0))
    np.testing.assert_array_equal(out["max_tick"].to_numpy(), arr.max(axis=0))


def test_seasonality_profile_conserves_and_matches_pandas(ray_session):
    out = q.seasonality_profile(SF).to_pandas()
    ev = _events_df(["event_type", "ts"])
    assert int(out["n"].sum()) == len(ev)
    brute = (
        pd.DataFrame(
            {
                "event_type": ev["event_type"],
                "isodow": ev["ts"].dt.dayofweek + 1,
                "hour": ev["ts"].dt.hour,
            }
        )
        .groupby(["event_type", "isodow", "hour"])
        .size()
    )
    m = out.set_index(["event_type", "isodow", "hour"])["n"]
    assert len(m) == len(brute)
    for k, n in brute.items():
        assert int(m.loc[k]) == int(n)


def test_tombstone_stats_consistent_with_final_state(ray_session):
    out = q.cdc_tombstone_stats(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet")
    ch = q.derive_changes_batch(ev).to_pandas().sort_values("seq")
    last = ch.drop_duplicates(["conv_id", "turn_idx"], keep="last")
    live = (last["op"] != "delete").sum()
    tomb = (last["op"] == "delete").sum()
    assert int(out["n_live"].sum()) == int(live)
    assert int(out["n_tombstoned"].sum()) == int(tomb)
    # per-partition split agrees with the uid % 16 routing
    last = last.assign(part=last["conv_id"].str[5:].astype(int) % 16)
    brute = last.groupby("part").agg(
        n_live=("op", lambda s: int((s != "delete").sum())),
        n_tombstoned=("op", lambda s: int((s == "delete").sum())),
    )
    m = out.set_index("part")
    for p, row in brute.iterrows():
        assert int(m.loc[p, "n_live"]) == row["n_live"]
        assert int(m.loc[p, "n_tombstoned"]) == row["n_tombstoned"]
