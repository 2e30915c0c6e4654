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
