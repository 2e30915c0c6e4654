"""Batch 27: BM25 scoring and K-hop BFS — bruteforce equivalences."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from data_exchange_routing_ray.pipelines import events_cdc as q

SF = "/root/testdata/sf0.001"
TERMS = ("shuffle", "merge", "join")


def _tokens() -> pd.DataFrame:
    import re

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    rows = []
    for did, text in zip(docs["doc_id"], docs["text"]):
        toks = [w for w in re.split(r"[^\w]+", text.lower()) if w]
        rows.append((did, toks))
    return docs, rows


def test_bm25_matches_bruteforce(ray_session):
    got = q.bm25_score_docs(SF).to_pandas().set_index("doc_id")
    docs, rows = _tokens()
    N = len(docs)
    lens = {did: len(t) for did, t in rows}
    avglen = sum(lens.values()) / N
    df = {t: sum(1 for _, toks in rows if t in toks) for t in TERMS}
    idf = {t: np.log((N - df[t] + 0.5) / (df[t] + 0.5) + 1.0) for t in TERMS}
    k1, b = 1.2, 0.75
    want = {}
    for did, toks in rows:
        s = 0.0
        for t in TERMS:
            tf = toks.count(t)
            if tf:
                s += idf[t] * tf / (tf + k1 * (1 - b + b * lens[did] / avglen))
        if s > 0:
            want[did] = s
    assert set(got.index) == set(want)
    for did, s in want.items():
        assert abs(got.loc[did, "bm25"] - s) < 1e-5


def _edges() -> set[tuple[int, int]]:
    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pandas().drop_duplicates()
    m = li.merge(li, on="l_orderkey")
    m = m[m["l_partkey_x"] != m["l_partkey_y"]]
    return set(zip(m["l_partkey_x"], m["l_partkey_y"]))


def test_khop_matches_bruteforce_bfs(ray_session):
    got = q.khop_reachable_parts(SF, k=3).to_pandas().set_index("dist")["n_nodes"]
    edges = _edges()
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    nodes = set(adj)
    seen = {n for n in nodes if n % 97 == 0}
    levels = [len(seen)]
    frontier = set(seen)
    for _ in range(3):
        nxt = set()
        for n in frontier:
            nxt |= adj.get(n, set())
        nxt -= seen
        levels.append(len(nxt))
        seen |= nxt
        frontier = nxt
    assert [got.get(i, 0) for i in range(4)] == levels


def test_association_rules_match_bruteforce(ray_session):
    got = q.basket_association_rules(SF, k=10).to_pandas()
    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pandas().drop_duplicates()
    n_baskets = li["l_orderkey"].nunique()
    per_part = li.groupby("l_partkey")["l_orderkey"].nunique()
    m = li.merge(li, on="l_orderkey")
    m = m[m["l_partkey_x"] < m["l_partkey_y"]]
    pair_n = m.groupby(["l_partkey_x", "l_partkey_y"]).size()
    assert (got["n_baskets"] == n_baskets).all()
    for r in got.itertuples(index=False):
        assert r.n_ab == pair_n[(r.part_a, r.part_b)]
        assert r.n_a == per_part[r.part_a] and r.n_b == per_part[r.part_b]
        assert r.n_ab <= min(r.n_a, r.n_b)
        assert 0 < r.conf_a_b <= 1 and 0 < r.conf_b_a <= 1
        assert abs(r.lift - n_baskets * r.n_ab / (r.n_a * r.n_b)) < 1e-5


def test_correlation_matrix_matches_pandas(ray_session):
    got = q.event_type_correlation_matrix(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet", columns=["ts", "event_type"]).to_pandas()
    ev["day"] = ev["ts"].to_numpy().astype("datetime64[D]")
    piv = (
        ev.groupby(["event_type", "day"]).size().unstack(fill_value=0)
    )
    # reindex to the full [min, max] day grid with zero fill
    days = pd.date_range(piv.columns.min(), piv.columns.max(), freq="D")
    piv = piv.reindex(columns=days, fill_value=0)
    c = piv.T.corr()
    assert (got["n_days"] == len(days)).all()
    for r in got.itertuples(index=False):
        assert abs(r.corr - c.loc[r.type_a, r.type_b]) < 1e-5
    # symmetric upper triangle only, every unordered type pair once
    k = len(piv.index)
    assert len(got) == k * (k - 1) // 2


def test_bpe_merges_match_serial_reference(ray_session):
    import re
    from collections import Counter

    got = q.bpe_train_merges(SF, num_merges=4).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["text"]).to_pandas()
    vocab = Counter()
    for text in docs["text"]:
        for w in re.split(r"[^\w]+", text.lower()):
            if w:
                vocab[w] += 1
    merges = []
    for _ in range(4):
        pairs = Counter()
        for w, n in vocab.items():
            syms = q._bpe_apply(list(w) + ["</w>"], tuple(merges))
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        # deterministic: count DESC, pair lexicographic
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
    assert list(zip(got["left"], got["right"])) == merges
    assert list(got["rank"]) == list(range(len(merges)))


def test_group_aware_split_no_leakage_and_layout_invariant(ray_session, monkeypatch):
    import ray.data

    got = q.group_aware_split(SF).to_pandas().set_index("split")
    ev = pq.read_table(f"{SF}/events.parquet", columns=["user_id"]).to_pandas()
    h = (ev["user_id"].to_numpy().astype(np.uint64) * np.uint64(2654435761)) % np.uint64(
        1 << 32
    )
    ev["split"] = np.where(h % np.uint64(100) < 80, "train", "val")
    want = ev.groupby("split").agg(
        n_users=("user_id", "nunique"), n_events=("user_id", "size")
    )
    assert got.equals(want.astype("int64"))
    # splits partition the user set (no group leakage)
    assert got["n_users"].sum() == ev["user_id"].nunique()
    # layout invariance: same result under a perturbed block layout
    orig = ray.data.read_parquet

    def perturbed(*a, **k):
        k["override_num_blocks"] = 7
        return orig(*a, **k)

    monkeypatch.setattr(ray.data, "read_parquet", perturbed)
    got2 = q.group_aware_split(SF).to_pandas().set_index("split")
    monkeypatch.setattr(ray.data, "read_parquet", orig)
    assert got2.equals(got)


def test_write_amplification_delta_below_rewrite(ray_session):
    out = q.lake_write_amplification(SF, epochs=6).to_pandas().set_index("policy")
    assert out.loc["delta", "amplification"] < out.loc["rewrite", "amplification"]
    assert out.loc["delta", "net_rows"] == out.loc["rewrite", "net_rows"]
    assert (out["amplification"] >= 1.0).all()


def test_small_cell_suppression_invariants(ray_session):
    out = q.small_cell_suppression(SF, k=11).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet", columns=["ts", "event_type"]).to_pandas()
    ev["day"] = ev["ts"].dt.strftime("%Y-%m-%d")
    raw = ev.groupby(["day", "event_type"]).size()
    for r in out.itertuples(index=False):
        n = raw[(r.day, r.event_type)]
        if n < 11:
            assert r.status == "primary" and r.n_published == -1
        elif r.status == "published":
            assert r.n_published == n
        else:
            assert r.status == "complementary" and r.n_published == -1
    by_day = out.groupby("day")["status"].value_counts().unstack(fill_value=0)
    for day, row in by_day.iterrows():
        # a lone primary cell must drag exactly one complementary cell
        # (when the day has any published cell left to hide)
        if row.get("primary", 0) == 1 and (
            row.get("published", 0) + row.get("complementary", 0) > 0
        ):
            assert row.get("complementary", 0) == 1
        if row.get("primary", 0) != 1:
            assert row.get("complementary", 0) == 0


def test_dp_noisy_counts_deterministic_and_bounded(ray_session):
    a = q.dp_noisy_counts(SF).to_pandas()
    b = q.dp_noisy_counts(SF).to_pandas()
    assert a.equals(b)  # seeded: replay-identical
    dev = (a["noisy_n"] - a["n"]).abs()
    assert (dev > 0).all() and (dev < 50).all()  # b=2 Laplace tail sanity


def test_kcenter_matches_serial_greedy(ray_session):
    got = q.emb_kcenter_coreset(SF, k=6).to_pandas()
    emb = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]).to_pandas()
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    M = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    centers = [M[ids == 0][0]]
    chosen = [0]
    for _ in range(5):
        d = np.min(2.0 - 2.0 * (M @ np.stack(centers).T), axis=1)
        order = np.lexsort((ids, -d))
        w = order[0]
        chosen.append(int(ids[w]))
        centers.append(M[w])
    assert list(got["vec_id"]) == chosen


def test_compression_ratio_flags_planted_extremes(ray_session, tmp_path):
    import zlib

    import pyarrow as pa
    import ray.data

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": ["a" * 5000, "the quick brown fox " * 100,
                     "x9$k!q7#" * 3],
            "source": ["rep", "prose", "short"],
        }
    )
    out_dir = tmp_path / "sf"
    out_dir.mkdir()
    # reuse the real op over a tiny synthetic documents table
    pa_tab = pa.Table.from_pandas(docs, preserve_index=False)
    import pyarrow.parquet as pqw

    pqw.write_table(pa_tab, str(out_dir / "documents.parquet"))
    got = q.text_compression_ratio(str(out_dir)).to_pandas().set_index("source")
    for s, text in (("rep", "a" * 5000), ("prose", "the quick brown fox " * 100)):
        want = len(zlib.compress(text.encode(), 6)) / len(text.encode())
        assert abs(got.loc[s, "mean_ratio"] - want) < 1e-5
    assert got.loc["rep", "n_flagged"] == 1      # extreme repetition flagged
    assert got.loc["short", "n_flagged"] == 0    # tiny text compresses poorly
