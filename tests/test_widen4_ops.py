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


def test_doc_number_redaction_digest(ray_session):
    got = widen4.doc_number_redaction(SF).to_pandas().set_index("doc_id")
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas().head(20)
    import re

    for _, d in docs.iterrows():
        red = re.sub(r"[0-9]+", "#", d["text"])
        r = got.loc[d["doc_id"]]
        assert int(r["n_redactions"]) == len(re.findall(r"[0-9]+", d["text"]))
        assert r["digest"] == hashlib.md5(red.encode()).hexdigest()


def test_quality_calibration_is_per_source_percent_rank(ray_session):
    got = widen4.quality_score_calibration(SF).to_pandas()
    for src, g in got.groupby("source"):
        n = len(g)
        sc = g["score"].to_numpy()
        pr = g["pct_rank"].to_numpy()
        for i in range(min(30, n)):
            rank0 = int((sc < sc[i]).sum())
            exp = round(rank0 / (n - 1), 6) if n > 1 else 0.0
            assert abs(pr[i] - exp) < 1e-9


def test_dup_span_excise_planted(ray_session, tmp_path):
    span = "alpha beta gamma delta epsilon zeta"
    texts = [
        " ".join(f"u{i}t{j}" for j in range(10)) for i in range(20)
    ]
    texts[3] = f"start{3} {span} tail{3} a b"
    texts[7] = f"start{7} {span} tail{7} c d"
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(20, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 20),
            "source": pa.array(["s"] * 20),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    got = widen4.dup_span_excise(str(d)).to_pandas().set_index("doc_id")
    # the planted 6-token span has two dup 5-gram starts -> 6 covered tokens
    for did in (3, 7):
        assert int(got.loc[did, "n_dup_span_tokens"]) == 6
    clean = got.drop(index=[3, 7])
    assert (clean["n_dup_span_tokens"] == 0).all()
    assert (clean["kept_fraction"] == 1.0).all()


def _serial_stream_lsh(docs: pd.DataFrame, n_epochs=4, bands=16, num_perm=64):
    from data_exchange_routing_ray.functions.dedup import (
        _band_keys,
        minhash_signatures,
    )

    hi = int(docs["doc_id"].max())
    bounds = [((hi + 1) * i) // n_epochs for i in range(n_epochs)] + [hi + 1]
    index: dict[tuple[int, int], int] = {}
    out = []
    for e in range(n_epochs):
        g = docs[(docs["doc_id"] >= bounds[e]) & (docs["doc_id"] < bounds[e + 1])]
        g = g.sort_values("doc_id")
        if g.empty:
            continue
        sig = minhash_signatures(g["text"].tolist(), k=3, num_perm=num_perm)
        keys = _band_keys(sig, bands)
        ids = g["doc_id"].to_numpy()
        kmin: dict[tuple[int, int], int] = {}
        for i, d in enumerate(ids):
            for b in range(bands):
                kk = (b, int(keys[i, b]))
                if kk not in kmin or kmin[kk] > d:
                    kmin[kk] = int(d)
        dup_of = {}
        for i, d in enumerate(ids):
            owners = []
            for b in range(bands):
                kk = (b, int(keys[i, b]))
                if kk in index:
                    owners.append(index[kk])
                elif kmin[kk] < d:
                    owners.append(kmin[kk])
            if owners:
                dup_of[int(d)] = min(owners)
        for i, d in enumerate(ids):
            if int(d) in dup_of:
                out.append((int(d), dup_of[int(d)], e))
                continue
            for b in range(bands):
                kk = (b, int(keys[i, b]))
                if kk not in index:
                    index[kk] = int(d)
    return sorted(out)


def test_stream_dedup_lsh_matches_serial_and_crosses_epochs(
    ray_session, tmp_path
):
    rng = np.random.default_rng(11)
    base = [
        " ".join(
            f"w{rng.integers(0, 500)}" for _ in range(30)
        )
        for _ in range(40)
    ]
    texts = list(base)
    # plant a near-dup pair far apart in doc_id space -> different epochs
    texts[38] = texts[1]  # exact dup, 3 epochs later
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(40, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 40),
            "source": pa.array(["s"] * 40),
            "n_chars": pa.array([len(x) for x in texts], pa.int64()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")
    got = widen4.stream_dedup_lsh_epochs(str(d)).to_pandas()
    got_t = sorted(
        (int(r["doc_id"]), int(r["dup_of"]), int(r["epoch"]))
        for _, r in got.iterrows()
    )
    exp = _serial_stream_lsh(t.to_pandas())
    assert got_t == exp
    # the planted cross-epoch dup must be caught, attributed to doc 1
    assert any(d_ == 38 and o == 1 for d_, o, _ in got_t)


def test_context_budget_trim_suffix_property(ray_session):
    got = widen4.conv_context_budget_trim(SF, budget_chars=48).to_pandas()
    fs = _serial_final_state()
    for _, r in got.head(25).iterrows():
        g = fs[fs["conv_id"] == r["conv_id"]].sort_values("turn_idx")
        lens = g["text"].str.len().fillna(0).astype(int).tolist()
        kept = 0
        tot = 0
        for ln in reversed(lens):
            if tot + ln > 48:
                break
            tot += ln
            kept += 1
        assert int(r["n_turns"]) == len(lens)
        assert int(r["kept_turns"]) == kept
        assert int(r["dropped_turns"]) == len(lens) - kept
        assert int(r["kept_chars"]) == tot


def test_event_time_regression_matches_serial(ray_session):
    got = widen4.conv_event_time_regression(SF).to_pandas()
    df = derived_change_stream(SF).to_pandas().sort_values("seq")
    for _, r in got.head(25).iterrows():
        g = df[df["conv_id"] == r["conv_id"]]
        ts = g["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        runmax = np.maximum.accumulate(ts)
        prevmax = np.r_[np.int64(-(2**62)), runmax[:-1]]
        late = prevmax > ts
        assert int(r["n_events"]) == len(g)
        assert int(r["n_late"]) == int(late.sum())
        exp_max = int((prevmax - ts)[late].max()) if late.any() else 0
        assert int(r["max_regression_us"]) == exp_max


def test_ann_maxsim_matches_serial(ray_session):
    got = widen4.ann_maxsim_topk(SF).to_pandas()
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    x = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    v8 = np.copysign(np.floor(np.abs(x * 127.0) + 0.5), x * 127.0).astype(
        np.int64
    )
    qi = emb["vec_id"].isin([1, 3, 5, 7]).to_numpy()
    q8 = v8[qi]
    dots = v8 @ q8.T
    doc = (emb["vec_id"].to_numpy() // 8).astype(np.int64)
    df = pd.DataFrame({"doc_id": doc})
    for j in range(4):
        df[f"m{j}"] = dots[:, j]
    m = df.groupby("doc_id").max()
    score = m.sum(axis=1).astype(np.int64)
    exp = (
        pd.DataFrame({"doc_id": m.index, "score": score.to_numpy()})
        .sort_values(["score", "doc_id"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["score"].tolist() == exp["score"].tolist()
