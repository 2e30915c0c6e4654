"""Round-2 batch 14: properties the DuckDB gate can't see — patch-merge
fold associativity under perturbed block layouts, nearest-attribution vs a
brute pairwise scan, and ratio-to-parent shares closing to ~100%.
"""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from data_exchange_routing_ray.pipelines import events_cdc as q

SF = "/root/testdata/sf0.001"


def test_patch_merge_block_layout_invariant(ray_session, monkeypatch):
    """The per-column (value, seq) combiner must be associative: a
    different batching of the change stream may not alter the merged
    state."""
    a = q.cdc_patch_merge(SF).to_pandas()
    import ray.data

    orig = ray.data.read_parquet

    def perturbed(*args, **kwargs):
        kwargs["override_num_blocks"] = 13
        return orig(*args, **kwargs)

    monkeypatch.setattr(ray.data, "read_parquet", perturbed)
    b = q.cdc_patch_merge(SF).to_pandas()
    monkeypatch.setattr(ray.data, "read_parquet", orig)
    pd.testing.assert_frame_equal(a, b)


def test_patch_merge_matches_serial_fold():
    """Per key and column the merged value must be the one carried by the
    highest-seq non-null patch — verified by a serial pandas oracle."""
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    eid = ev["event_id"].to_numpy()
    df = pd.DataFrame(
        {
            "conv_id": [f"conv-{u:06d}" for u in ev["user_id"]],
            "turn_idx": (eid % 25).astype(np.int32),
            "seq": eid.astype(np.int64),
            "text": np.where(eid % 3 == 0, [f"e-{e}" for e in eid], None),
            "tool": np.where(eid % 3 == 1, ev["event_type"], None),
            "role": np.where(
                eid % 3 == 2, np.where(eid % 2 == 0, "user", "assistant"), None
            ),
        }
    ).sort_values("seq")
    got = q.cdc_patch_merge(SF).to_pandas().set_index(["conv_id", "turn_idx"])
    for (conv, turn), g in df.groupby(["conv_id", "turn_idx"]):
        row = got.loc[(conv, turn)]
        assert int(row["last_seq"]) == int(g["seq"].max())
        for col in ("text", "tool", "role"):
            nn = g[g[col].notna()]
            want = nn[col].iloc[-1] if len(nn) else None
            have = row[col]
            assert (pd.isna(have) and want is None) or have == want, (
                conv, turn, col)


def test_nearest_attribution_matches_bruteforce():
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    tsu = ev["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    ev = ev.assign(tsu=tsu)
    got = q.nearest_click_attribution(SF).to_pandas().set_index("purchase_id")
    clicks = ev[ev.event_type == "click"]
    purch = ev[ev.event_type == "purchase"]
    n_expected = 0
    for uid, pg in purch.groupby("user_id"):
        cg = clicks[clicks.user_id == uid]
        if cg.empty:
            continue
        n_expected += len(pg)
        for _, p in pg.iterrows():
            d = np.abs(cg["tsu"].to_numpy() - p["tsu"])
            best = np.lexsort((cg["event_id"].to_numpy(), d))[0]
            row = got.loc[int(p["event_id"])]
            assert int(row["click_id"]) == int(cg["event_id"].to_numpy()[best])
            assert int(row["delta_us"]) == int(d[best])
    assert len(got) == n_expected


def test_distinct_type_sets_match_pandas():
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    got = q.user_distinct_event_types(SF).to_pandas().set_index("user_id")
    for uid, g in ev.groupby("user_id"):
        want = sorted(g["event_type"].unique())
        assert got.loc[uid, "type_set"] == ",".join(want)
        assert int(got.loc[uid, "n_types"]) == len(want)


def test_region_shares_close():
    """Floor-division shares must sum to within |nations-per-region| bp of
    10000 and never exceed it."""
    out = q.revenue_share_within_region(SF).to_pandas()
    for r, g in out.groupby("r_name"):
        s = int(g["share_bp"].sum())
        assert 10000 - len(g) < s <= 10000, (r, s)


def test_pattern_counts_match_python_re():
    import re

    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    got = q.text_pattern_counts(SF).to_pandas().set_index("source")
    for src, g in docs.groupby("source"):
        dr = sum(len(re.findall(r"[0-9]+", t)) for t in g["text"])
        cw = sum(len(re.findall(r"[A-Z][a-z]+", t)) for t in g["text"])
        th = sum(len(re.findall(r"\bthe\b", t)) for t in g["text"])
        assert int(got.loc[src, "digit_runs"]) == dr
        assert int(got.loc[src, "cap_words"]) == cw
        assert int(got.loc[src, "the_hits"]) == th
