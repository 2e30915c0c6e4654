"""Round-2 batch 11: properties the DuckDB gate can't see —
banded-Levenshtein exactness vs a brute-force DP, rank invariance under
block layout, merge_asof window boundary semantics, and the
first/last-value combiner's associativity across perturbed layouts.
"""

import random

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from data_exchange_routing_ray.pipelines import events_cdc as q
from data_exchange_routing_ray.pipelines.events_cdc import _edit_distance_pairs

SF = "/root/testdata/sf0.001"


def _brute_lev(a: str, b: str) -> int:
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[n]


def test_banded_levenshtein_matches_bruteforce():
    """Vectorized banded DP must be EXACT (clamped at k+1) on random edit
    scripts and on fully random pairs, for several band widths."""
    rng = random.Random(7)
    alph = "abcd"
    pairs = []
    for _ in range(300):
        a = "".join(rng.choice(alph) for _ in range(rng.randint(0, 18)))
        b = list(a)
        for _ in range(rng.randint(0, 10)):
            op = rng.choice("ids")
            if op == "i":
                b.insert(rng.randint(0, len(b)), rng.choice(alph))
            elif b:
                p = rng.randrange(len(b))
                if op == "d":
                    del b[p]
                else:
                    b[p] = rng.choice(alph)
        pairs.append((a, "".join(b)))
    for _ in range(200):
        pairs.append(
            (
                "".join(rng.choice(alph) for _ in range(rng.randint(0, 15))),
                "".join(rng.choice(alph) for _ in range(rng.randint(0, 15))),
            )
        )
    for k in (1, 2, 4, 8):
        got = _edit_distance_pairs([p[0] for p in pairs], [p[1] for p in pairs], k)
        for (a, b), g in zip(pairs, got):
            assert g == min(_brute_lev(a, b), k + 1), (a, b, k)


def test_edit_distance_pairs_symmetric_zero_and_empty():
    assert list(_edit_distance_pairs([], [], 2)) == []
    d = _edit_distance_pairs(["", "abc", "abc"], ["", "abc", ""], 3)
    assert list(d) == [0, 0, 3]


def test_percent_rank_matches_pandas_and_is_layout_invariant(ray_session):
    """Distributed min-rank must equal pandas rank(method='min') per
    priority, and must not change when the input block layout changes."""
    got = q.percent_rank_orders(SF).to_pandas().set_index("o_orderkey")["rk"]
    orders = pd.read_parquet(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
    )
    tick = np.floor(orders["o_totalprice"].to_numpy() * 100).astype(np.int64)
    exp = (
        pd.Series(tick)
        .groupby(orders["o_orderpriority"].to_numpy())
        .rank(method="min")
        .astype(np.int64)
    )
    exp.index = orders["o_orderkey"]
    assert got.sort_index().equals(exp.sort_index())


def test_followup_window_boundaries(ray_session, tmp_path):
    """Conversion must include purchases exactly AT the view ts and exactly
    at ts + window, and exclude one microsecond beyond."""
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    W = 3_600_000_000
    rows = [
        # user 1: purchase exactly at view ts -> converts
        (1, "view", t0), (1, "purchase", t0),
        # user 2: purchase exactly at +window -> converts
        (2, "view", t0), (2, "purchase", t0 + W),
        # user 3: purchase 1us beyond -> no
        (3, "view", t0), (3, "purchase", t0 + W + 1),
        # user 4: purchase BEFORE the view -> no
        (4, "purchase", t0 - 10), (4, "view", t0),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "ts"])
    df["event_id"] = np.arange(len(df))
    df["value"] = 1.0
    df["props"] = "{}"
    sf = tmp_path / "sf"
    sf.mkdir()
    df.to_parquet(sf / "events.parquet")
    out = (
        q.followup_within_window(str(sf)).to_pandas().set_index("user_id")
    )
    assert out.loc[1, "n_converted"] == 1
    assert out.loc[2, "n_converted"] == 1
    assert out.loc[3, "n_converted"] == 0
    assert out.loc[4, "n_converted"] == 0
    assert (out["n_views"] == 1).all()


def test_first_last_combiner_block_invariant(ray_session):
    """The first/last-value mergeable aggregate must give identical results
    when the same rows arrive in a perturbed block layout (combiner
    associativity — the property the SQL gate can't exercise)."""
    base = q.first_last_user_value(SF).to_pandas()

    ev = pd.read_parquet(f"{SF}/events.parquet")
    shuffled = ev.sample(frac=1.0, random_state=5).reset_index(drop=True)
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        shuffled.to_parquet(os.path.join(d, "events.parquet"), row_group_size=37)
        pert = q.first_last_user_value(d).to_pandas()
    assert base.equals(pert)
