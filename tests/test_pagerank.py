"""PageRank over the co-purchase part graph: bruteforce power-iteration
equivalence and rank-mass conservation (Σr = |nodes| is invariant on a
symmetric graph with r0 = 1 and no dangling mass)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from data_exchange_routing_ray.pipelines import events_cdc as q

SF = "/root/testdata/sf0.001"


def _bruteforce_pagerank(iters: int, damping: float = 0.85) -> pd.DataFrame:
    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pandas().drop_duplicates()
    m = li.merge(li, on="l_orderkey")
    m = m[m["l_partkey_x"] != m["l_partkey_y"]]
    edges = m[["l_partkey_x", "l_partkey_y"]].drop_duplicates()
    edges.columns = ["src", "dst"]
    nodes = np.sort(edges["src"].unique())
    idx = {n: i for i, n in enumerate(nodes)}
    s = edges["src"].map(idx).to_numpy()
    d = edges["dst"].map(idx).to_numpy()
    deg = np.bincount(s, minlength=len(nodes)).astype(np.float64)
    r = np.ones(len(nodes))
    for _ in range(iters):
        contrib = np.zeros(len(nodes))
        np.add.at(contrib, d, r[s] / deg[s])
        r = (1.0 - damping) + damping * contrib
    return pd.DataFrame({"part_id": nodes, "pr": r})


def test_pagerank_matches_bruteforce_power_iteration(ray_session):
    got = q.pagerank_parts(SF, iters=2).to_pandas()
    want = _bruteforce_pagerank(iters=2)
    merged = got.merge(want, on="part_id", suffixes=("_got", "_want"))
    assert len(merged) == len(got) == len(want)
    assert np.allclose(merged["pr_got"], merged["pr_want"], atol=2e-6)


def test_pagerank_conserves_rank_mass(ray_session):
    got = q.pagerank_parts(SF, iters=3).to_pandas()
    # Σr = |nodes| exactly in exact arithmetic; 6-dp rounding bounds drift
    assert abs(got["pr"].sum() - len(got)) < 1e-2
    assert (got["pr"] > 0).all()
    assert got["part_id"].is_unique


def test_pagerank_actor_mode_matches_dataset_mode(ray_session):
    a = q.pagerank_parts(SF, iters=3).to_pandas()
    b = q.pagerank_parts_actors(SF, iters=3).to_pandas()
    m = a.merge(b, on="part_id", suffixes=("_ds", "_ac"))
    assert len(m) == len(a) == len(b)
    assert np.allclose(m["pr_ds"], m["pr_ac"], atol=2e-6)


def test_khop_actor_mode_matches_dataset_mode(ray_session):
    a = q.khop_reachable_parts(SF, k=3).to_pandas()
    b = q.khop_reachable_parts(SF, k=3, actor_edge_threshold=1).to_pandas()
    m = a.merge(b, on="dist", suffixes=("_ds", "_ac"))
    assert len(m) == len(a) == len(b) == 4
    assert (m["n_nodes_ds"] == m["n_nodes_ac"]).all()


def test_pagerank_auto_promotes_to_actor_plan_above_edge_threshold(ray_session):
    # threshold 1 forces the edges-stay-put actor plan; result must be
    # bit-identical to the dataset-algebra plan at the default threshold
    a = q.pagerank_parts(SF, iters=2).to_pandas()
    b = q.pagerank_parts(SF, iters=2, actor_edge_threshold=1).to_pandas()
    m = a.merge(b, on="part_id", suffixes=("_ds", "_ac"))
    assert len(m) == len(a) == len(b)
    assert np.allclose(m["pr_ds"], m["pr_ac"], atol=2e-6)


def test_pagerank_actor_mode_partitionwise_output(ray_session, tmp_path):
    """out_dir layout: each bucket actor writes its own ranks parquet;
    the union of the per-bucket files equals the driver-collect result."""
    import os
    import pyarrow as pa
    import ray.data

    from data_exchange_routing_ray.functions.graph_actors import (
        pagerank_actor_mode,
    )

    li = pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pandas().drop_duplicates()
    m = li.merge(li, on="l_orderkey")
    m = m[m["l_partkey_x"] < m["l_partkey_y"]]
    pairs_df = (
        m[["l_partkey_x", "l_partkey_y"]]
        .drop_duplicates()
        .rename(columns={"l_partkey_x": "part_a", "l_partkey_y": "part_b"})
    )
    pairs = ray.data.from_pandas(pairs_df.reset_index(drop=True))

    stage1, stage2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    out_dir = str(tmp_path / "ranks")
    collected = pagerank_actor_mode(pairs, stage1, iters=2, num_buckets=4)
    summary = pagerank_actor_mode(
        pairs, stage2, iters=2, num_buckets=4, out_dir=out_dir
    ).to_pandas()

    # layout: one file per bucket, row counts as reported
    assert sorted(os.listdir(out_dir)) == [
        f"ranks-{b:04d}.parquet" for b in range(4)
    ]
    parts = []
    for row in summary.itertuples():
        t = pq.read_table(row.file)
        assert t.num_rows == row.rows
        parts.append(t)
    got = (
        pa.concat_tables(parts)
        .to_pandas()
        .sort_values("part_id")
        .reset_index(drop=True)
    )
    want = collected.to_pandas().sort_values("part_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
