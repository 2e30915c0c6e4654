"""Hot-`by`-key sub-bucketing for the temporal joins (the salting idea
from stages/upsert.py applied to functions/joins.py): one planted hot
user owns 30% of all clicks, and the (key, time-slice) sub-bucketed path
must return bit-identical results to the single-bucket path — including
the cross-slice stitch cases where a click's matching purchase lies many
slices back."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


HOT_USER = 7
N_CLICKS = 9_000
N_USERS = 40
HOUR_US = 3600 * 10**6


def _mk_events(seed: int = 11):
    """Clicks + purchases over ~30 days; user 7 owns 30% of clicks.
    Purchases are sparse for the hot user early on so some slices have no
    purchase at all (forcing the cross-slice forward-fill stitch)."""
    rng = np.random.default_rng(seed)
    t0 = 1_700_000_000_000_000  # µs epoch
    span = 30 * 24 * HOUR_US

    n_hot = int(N_CLICKS * 0.30)
    users = np.concatenate([
        np.full(n_hot, HOT_USER, np.int64),
        rng.integers(0, N_USERS, N_CLICKS - n_hot).astype(np.int64),
    ])
    click_ts = t0 + rng.integers(0, span, N_CLICKS)
    clicks = pa.table({
        "event_id": pa.array(np.arange(N_CLICKS, dtype=np.int64)),
        "user_id": pa.array(users),
        "ts": pa.array(click_ts, pa.timestamp("us")),
    })

    n_pur = 2_000
    pur_users = rng.integers(0, N_USERS, n_pur).astype(np.int64)
    # hot user's purchases all land in the second half of the range →
    # first-half hot slices must stitch across empty slices
    pur_ts = t0 + rng.integers(0, span, n_pur)
    hot_mask = pur_users == HOT_USER
    pur_ts[hot_mask] = t0 + span // 2 + rng.integers(
        0, span // 2, int(hot_mask.sum())
    )
    purchases = pa.table({
        "user_id": pa.array(pur_users),
        "ts": pa.array(pur_ts, pa.timestamp("us")),
        "value": pa.array(np.round(rng.uniform(1, 100, n_pur), 2)),
    })
    return clicks, purchases


def _norm(df: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
    return (
        df[cols]
        .sort_values(cols, kind="stable")
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def ev(ray_session):
    import ray.data

    clicks, purchases = _mk_events()
    return (
        ray.data.from_arrow(clicks).repartition(8),
        ray.data.from_arrow(purchases).repartition(8),
    )


def test_asof_hotkey_subbucket_exact(ray_session, ev):
    from data_exchange_routing_ray.functions.joins import asof_join

    clicks, purchases = ev
    base = asof_join(
        clicks, purchases, by="user_id", on="ts",
        right_value_cols=["value"],
    ).to_pandas()
    hot = asof_join(
        clicks, purchases, by="user_id", on="ts",
        right_value_cols=["value"],
        hot_keys=[HOT_USER], slice_width=6 * HOUR_US,
    ).to_pandas()
    cols = ["event_id", "user_id", "value"]
    pd.testing.assert_frame_equal(_norm(base, cols), _norm(hot, cols))
    # the stitch actually fired: hot rows resolved from earlier slices
    hot_rows = hot[hot["user_id"] == HOT_USER]
    assert hot_rows["value"].notna().sum() > 0
    assert hot_rows["value"].isna().sum() > 0  # pre-first-purchase clicks


def test_range_hotkey_subbucket_exact(ray_session, ev):
    from data_exchange_routing_ray.functions.joins import range_join_agg

    clicks, purchases = ev
    kw = dict(by="user_id", on="ts", value_col="value", window=HOUR_US)
    base = range_join_agg(clicks, purchases, **kw).to_pandas()
    hot = range_join_agg(
        clicks, purchases, **kw,
        hot_keys=[HOT_USER], slice_width=6 * HOUR_US,
    ).to_pandas()
    cols = ["event_id", "user_id", "n_in_window", "sum_in_window"]
    pd.testing.assert_frame_equal(_norm(base, cols), _norm(hot, cols))
    assert (hot["n_in_window"] > 0).any()


def test_range_slice_width_guard(ray_session, ev):
    from data_exchange_routing_ray.functions.joins import range_join_agg

    clicks, purchases = ev
    with pytest.raises(ValueError, match="slice_width"):
        range_join_agg(
            clicks, purchases, by="user_id", on="ts", value_col="value",
            window=HOUR_US, hot_keys=[HOT_USER], slice_width=HOUR_US // 2,
        )


def test_asof_matches_pandas_reference(ray_session, ev):
    """The Arrow-native probe matches pd.merge_asof on the same input."""
    from data_exchange_routing_ray.functions.joins import asof_join

    clicks, purchases = ev
    got = asof_join(
        clicks, purchases, by="user_id", on="ts",
        right_value_cols=["value"],
    ).to_pandas()
    lf = clicks.to_pandas().sort_values("ts", kind="stable")
    rf = (
        purchases.to_pandas()
        .sort_values(["user_id", "ts"], kind="stable")
        .drop_duplicates(["user_id", "ts"], keep="last")
        .sort_values("ts", kind="stable")
    )
    ref = pd.merge_asof(
        lf, rf, on="ts", by="user_id", direction="backward",
        allow_exact_matches=True,
    )
    cols = ["event_id", "user_id", "value"]
    pd.testing.assert_frame_equal(_norm(got, cols), _norm(ref, cols))


def test_asof_positions_property_vs_bruteforce():
    """Property: the merged lexsort+cumsum probe equals the O(n·m)
    brute-force backward-inclusive match on random inputs, including
    duplicate (key, on) ties (last input wins) and empty sides."""
    from hypothesis import given, settings, strategies as st

    from data_exchange_routing_ray.functions.joins import _asof_positions

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.tuples(st.integers(0, 4), st.integers(0, 20)),
                 min_size=0, max_size=30),
        st.lists(st.tuples(st.integers(0, 4), st.integers(0, 20)),
                 min_size=0, max_size=30),
    )
    def check(left, right):
        l_code = np.array([k for k, _ in left], np.int64)
        l_on = np.array([t for _, t in left], np.int64)
        r_code_raw = np.array([k for k, _ in right], np.int64)
        r_on_raw = np.array([t for _, t in right], np.int64)
        order = np.lexsort((r_on_raw, r_code_raw))  # stable pre-sort
        rc, ro = r_code_raw[order], r_on_raw[order]
        got = _asof_positions(l_code, l_on, rc, ro)
        for i in range(len(left)):
            cands = [
                j for j in range(len(rc))
                if rc[j] == l_code[i] and ro[j] <= l_on[i]
            ]
            want = max(cands) if cands else -1  # last in sorted order
            assert got[i] == want, (i, got[i], want, left, right)

    check()
