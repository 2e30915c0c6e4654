"""Round-3 widening batch C: conversation latency/tool-path vs a serial
pandas oracle, hashed-linear quality scorer determinism + actor cache, CMS
heavy-hitter error bounds with a planted hot key."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from data_exchange_routing_ray.pipelines import widen4
from data_exchange_routing_ray.pipelines.events_cdc import derived_change_stream

SF = "/root/testdata/sf0.001"


def _serial_final_state() -> pd.DataFrame:
    df = derived_change_stream(SF).to_pandas()
    idx = df.groupby(["conv_id", "turn_idx"], sort=False)["seq"].idxmax()
    w = df.loc[idx]
    return (
        w[w["op"] != "delete"]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def test_conv_response_latency_matches_serial(ray_session):
    got = widen4.conv_response_latency(SF).to_pandas()
    fs = _serial_final_state()
    rows = {}
    for cid, g in fs.groupby("conv_id", sort=True):
        lats = []
        by_turn = g.set_index("turn_idx")
        for t in by_turn.index:
            if (
                by_turn.loc[t, "role"] == "user"
                and (t + 1) in by_turn.index
                and by_turn.loc[t + 1, "role"] == "assistant"
            ):
                dt = by_turn.loc[t + 1, "ts"] - by_turn.loc[t, "ts"]
                lats.append(dt.value // 1000)  # ns -> us, exact
        if lats:
            rows[cid] = (len(lats), int(np.sum(lats)))
    assert len(got) == len(rows)
    for _, r in got.iterrows():
        n, tot = rows[r["conv_id"]]
        assert int(r["n_pairs"]) == n
        assert int(r["total_latency_us"]) == tot


def test_conv_tool_paths_matches_serial(ray_session):
    got = widen4.conv_tool_paths(SF).to_pandas()
    fs = _serial_final_state()
    fs = fs[fs["tool"].notna()]
    exp = fs.groupby("conv_id").agg(
        n_tool_turns=("tool", "size"), tool_path=("tool", ">".join)
    )
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        e = exp.loc[r["conv_id"]]
        assert int(r["n_tool_turns"]) == int(e["n_tool_turns"])
        assert r["tool_path"] == e["tool_path"]


def test_quality_scorer_matches_serial_and_caches(ray_session):
    got = widen4.doc_quality_model_score(SF).to_pandas().set_index("doc_id")
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    import re

    # [^\W_] == letters+digits, the serial equivalent of \p{L}\p{N}
    pat = re.compile(r"[^\W_]+", re.UNICODE)
    checked = 0
    for _, d in docs.head(50).iterrows():
        toks = pat.findall(d["text"].lower())
        if not toks:
            assert d["doc_id"] not in got.index
            continue
        ws = [
            int(hashlib.md5(t.encode()).hexdigest()[:8], 16) / 4294967296.0 - 0.5
            for t in toks
        ]
        row = got.loc[d["doc_id"]]
        assert int(row["n_tokens"]) == len(toks)
        assert abs(float(row["score"]) - round(float(np.mean(ws)), 6)) < 2e-6
        checked += 1
    assert checked > 10

    # actor-state cache: second batch through the same instance reuses weights
    s = widen4.HashedLinearScorer()
    b = pa.table({"doc_id": pa.array([1, 2]), "text": pa.array(["a b c", "a b d"])})
    s(b)
    n_cached = len(s._cache)
    s(b)
    assert len(s._cache) == n_cached and n_cached == 4


def test_cms_planted_heavy_hitter(ray_session, tmp_path):
    rng = np.random.default_rng(7)
    uid = rng.integers(0, 5000, size=200_000)
    uid[:40_000] = 42  # planted ~20% hot key
    t = pa.table(
        {
            "event_id": pa.array(np.arange(uid.size, dtype=np.int64)),
            "ts": pa.array(
                np.full(uid.size, 1_700_000_000_000_000, np.int64)
            ).cast(pa.timestamp("us")),
            "user_id": pa.array(uid.astype(np.int64)),
            "event_type": pa.array(["click"] * uid.size),
            "value": pa.array(np.zeros(uid.size)),
            "props": pa.array(["{}"] * uid.size),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")
    got = widen4.cms_topk_users(str(d), k=5).to_pandas()
    top = got.iloc[0]
    assert int(top["user_id"]) == 42
    exact = int((uid == 42).sum())
    assert int(top["exact_count"]) == exact
    # CMS bound: overestimate only, within 3N/w (the in-query gate asserts
    # this too; re-assert here so the test fails loudly if the gate is
    # ever relaxed)
    assert 0 <= int(top["est_count"]) - exact <= 3 * uid.size / 8192 + 1
