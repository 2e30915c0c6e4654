"""Round-1 widening operators: semi join, rollup, ordered reassembly,
deterministic sampling, weighted mixture, duplicate-ngram fraction.

Value-level correctness vs DuckDB is the driver gate's job
(tools/check_queries.py); these tests pin the properties the gate can't
see — parallelism-invariance of the deterministic samplers, ordering
correctness of the grouped concat, and cross-process bucket-hash
stability of the shingle layout.
"""

import numpy as np
import pandas as pd
import pyarrow as pa

from data_exchange_routing_ray.pipelines import events_cdc as q

SF = "/root/testdata/sf0.001"


def test_sample_hash_fraction_parallelism_invariant(ray_session, monkeypatch):
    """The hash sample must select identical rows regardless of block
    layout — rerunning with every read forced to a different
    override_num_blocks may not change a single aggregate."""
    a = q.sample_hash_fraction(SF).to_pandas().sort_values("event_type")
    import ray.data

    orig = ray.data.read_parquet

    def perturbed_read(*args, **kwargs):  # genuinely different block layout
        kwargs["override_num_blocks"] = 7
        return orig(*args, **kwargs)

    monkeypatch.setattr(ray.data, "read_parquet", perturbed_read)
    b = q.sample_hash_fraction(SF).to_pandas().sort_values("event_type")
    monkeypatch.setattr(ray.data, "read_parquet", orig)
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))
    # and the sample is a real ~10% subset, not empty / not everything
    n_total = len(pd.read_parquet(f"{SF}/events.parquet", columns=["event_id"]))
    n_kept = int(a["n"].sum())
    assert 0.05 * n_total < n_kept < 0.15 * n_total


def test_reassemble_user_histories_ordering(ray_session):
    """Grouped concat must be ordered by (ts, event_id) within each user —
    compare against a serial pandas oracle."""
    got = q.reassemble_user_histories(SF).to_pandas().set_index("user_id")
    ev = pd.read_parquet(
        f"{SF}/events.parquet", columns=["user_id", "event_id", "event_type", "ts"]
    ).sort_values(["user_id", "ts", "event_id"], kind="stable")
    want = ev.groupby("user_id").agg(
        n_events=("event_id", "size"), history=("event_type", ",".join)
    )
    assert len(got) == len(want)
    for uid in want.index:
        assert got.loc[uid, "history"] == want.loc[uid, "history"], uid
        assert int(got.loc[uid, "n_events"]) == int(want.loc[uid, "n_events"])


def test_rollup_levels_are_consistent(ray_session):
    """Each rollup level must sum to the next: nations→region, regions→grand."""
    t = q.rollup_region_nation_revenue(SF).to_pandas()
    fine = t[(t.r_name != "ALL") & (t.n_name != "ALL")]
    lvl1 = t[(t.r_name != "ALL") & (t.n_name == "ALL")].set_index("r_name")
    grand = t[(t.r_name == "ALL") & (t.n_name == "ALL")].iloc[0]
    for r, g in fine.groupby("r_name"):
        assert int(g["n_orders"].sum()) == int(lvl1.loc[r, "n_orders"])
        assert abs(g["revenue"].sum() - lvl1.loc[r, "revenue"]) < 1e-2
    assert int(fine["n_orders"].sum()) == int(grand["n_orders"])


def test_mix_weighted_sources_rates(ray_session):
    """Observed keep-rate per source must track the declared hash rate
    (exact membership is deterministic; tolerance covers small-n noise)."""
    got = q.mix_weighted_sources(SF).to_pandas().set_index("source")
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "source"])
    totals = docs.groupby("source").size()
    for src, kept in got["n_docs"].items():
        rate = (20 + 15 * (int(src[3:]) % 5)) / 100.0
        frac = kept / totals[src]
        assert abs(frac - rate) < 0.35, (src, frac, rate)


def test_dup_ngram_fraction_detects_planted_duplicates(ray_session, tmp_path):
    """A doc sharing its full text with another must have dup_frac 1.0; a
    doc with a unique vocabulary must have dup_frac 0.0."""
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                [
                    "alpha beta gamma delta epsilon",
                    "alpha beta gamma delta epsilon",
                    "zeta eta theta iota kappa",
                ],
                pa.string(),
            ),
        }
    )
    import pyarrow.parquet as pq

    d = tmp_path / "mini"
    d.mkdir()
    pq.write_table(docs, d / "documents.parquet")
    out = q.text_dup_ngram_fraction(str(d)).to_pandas().set_index("doc_id")
    assert out.loc[0, "dup_frac"] == 1.0
    assert out.loc[1, "dup_frac"] == 1.0
    assert out.loc[2, "dup_frac"] == 0.0
    assert int(out.loc[0, "n_shingles"]) == 3  # 5 words -> 3 trigrams


def test_semi_join_complements_anti_join(ray_session):
    """Semi-join row universe + anti-join customers = all customers is not
    directly comparable (different grain), but the semi join's order count
    must equal the number of orders whose custkey is in the segment —
    checked against a serial oracle."""
    got = q.semi_join_orders_building(SF).to_pandas()
    cust = pd.read_parquet(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    orders = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    )
    keys = set(cust.loc[cust.c_mktsegment == "BUILDING", "c_custkey"])
    want = orders[orders.o_custkey.isin(keys)].groupby("o_orderpriority").size()
    assert int(got["n"].sum()) == int(want.sum())
    for pri, n in want.items():
        assert int(got.set_index("o_orderpriority").loc[pri, "n"]) == int(n)


def test_filter_join_bucketed_semi_and_anti(ray_session):
    """Non-empty semi/anti results through the co-partitioned bucket join
    (the sf0.01 anti-join driver row is 0-row, so pin real rows here)."""
    import ray.data

    from data_exchange_routing_ray.functions.joins import filter_join_bucketed

    left = pa.table(
        {
            "k": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "v": pa.array(["a", "b", "c", "d", "e"], pa.string()),
        }
    )
    right = pa.table({"rk": pa.array([2, 4, 4, 9], pa.int64())})
    schema = pa.schema([("k", pa.int64()), ("v", pa.string())])
    anti = filter_join_bucketed(
        ray.data.from_arrow(left), schema, ray.data.from_arrow(right),
        "k", "rk", keep_matches=False,
    ).to_pandas().sort_values("k")
    assert list(anti["k"]) == [1, 3, 5] and list(anti["v"]) == ["a", "c", "e"]
    semi = filter_join_bucketed(
        ray.data.from_arrow(left), schema, ray.data.from_arrow(right),
        "k", "rk", keep_matches=True,
    ).to_pandas().sort_values("k")
    assert list(semi["k"]) == [2, 4]


def test_pack_token_sequences_scan_invariants(ray_session):
    """The distributed prefix-scan must partition the corpus exactly: bins
    contiguous from 0, token totals conserved, and every doc in exactly one
    bin (doc counts sum to corpus size)."""
    out = q.pack_token_sequences(SF).to_pandas().sort_values("bin_id")
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id"])
    assert list(out["bin_id"]) == list(range(len(out)))
    assert int(out["n_docs"].sum()) == len(docs)
    # all bins except the last are filled past capacity boundaries:
    # prior // 2048 increments only after >= 2048 tokens accumulated
    assert (out["bin_tokens"].iloc[:-1] >= 1).all()
    total = int(out["bin_tokens"].sum())
    # independence from bucket granularity (scan correctness, not layout)
    out2 = q.pack_token_sequences(SF, bucket_size=7).to_pandas().sort_values("bin_id")
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), out2.reset_index(drop=True)
    )
    assert int(out2["bin_tokens"].sum()) == total


def test_connected_components_long_chain_and_islands(ray_session):
    """Pointer-jumping label propagation must collapse a 200-node CHAIN
    (worst case for naive propagation: O(n) rounds without jumping) within
    the iteration budget, keep two components separate, and ignore
    vertices that never appear in an edge."""
    import ray.data

    from data_exchange_routing_ray.functions.graph import connected_components

    # component A: chain 0-1-2-...-199; component B: star around 1000
    a_src = list(range(199))
    a_dst = list(range(1, 200))
    b_src = [1000] * 5
    b_dst = [1001 + i for i in range(5)]
    edges = pa.table(
        {
            "id_a": pa.array(a_src + b_src, pa.int64()),
            "id_b": pa.array(a_dst + b_dst, pa.int64()),
        }
    )
    labels = (
        connected_components(ray.data.from_arrow(edges), max_iters=20)
        .to_pandas()
        .set_index("vertex")["label"]
    )
    assert set(labels.index) == set(range(200)) | {1000, *range(1001, 1006)}
    assert (labels.loc[list(range(200))] == 0).all()
    assert (labels.loc[[1000, *range(1001, 1006)]] == 1000).all()


def test_distributed_kmeans_recovers_planted_clusters(ray_session):
    """Full-corpus Lloyd rounds must recover 4 well-separated planted
    clusters: every planted group lands in one k-means cluster and the
    4 clusters are distinct."""
    import ray.data

    from data_exchange_routing_ray.functions.similarity import (
        distributed_kmeans,
        kmeans_cluster_stats,
    )

    rng = np.random.default_rng(3)
    centers = np.eye(4, 64) * 10.0
    rows = []
    for c in range(4):
        pts = centers[c] + rng.normal(0, 0.05, size=(50, 64))
        rows.extend(pts)
    tab = pa.table(
        {
            "vec_id": pa.array(range(200), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in rows]),
        }
    )
    ds = ray.data.from_arrow(tab)
    C = distributed_kmeans(ds, k=4, iters=6)
    stats = kmeans_cluster_stats(ray.data.from_arrow(tab), C)
    # 4 non-empty clusters of 50, each extremely tight on the sphere
    assert sorted(stats["n_vecs"]) == [50, 50, 50, 50]
    assert (stats["avg_cos"] > 0.99).all()


def test_approx_quantiles_error_bound(ray_session):
    """Merged-summary quantiles must track exact quantiles on a skewed
    (lognormal) distribution within 1% of the p50-p99 spread."""
    import ray.data

    from data_exchange_routing_ray.functions.sketch import approx_quantiles

    rng = np.random.default_rng(11)
    v = rng.lognormal(0, 1.0, size=50_000)
    ds = ray.data.from_arrow(pa.table({"value": pa.array(v, pa.float64())}))
    qs = [0.5, 0.9, 0.99]
    approx = approx_quantiles(ds, "value", qs)
    exact = np.quantile(v, qs)
    spread = exact[2] - exact[0]
    for a, e in zip(approx, exact):
        assert abs(a - e) <= 0.01 * spread, (a, e)
