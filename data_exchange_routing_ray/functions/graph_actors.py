"""Bucket-pinned actor BSP for iterative graph algorithms.

The pure-Dataset PageRank (``pipelines/events_cdc.py::pagerank_parts``)
re-ships the static edge set through the groupby exchange every round —
the cost of staying in checkpoint-free Dataset algebra. This module is the
other point in the design space the survey calls out (raw actors where the
Dataset API can't express the semantics): B actors each pin ONE edge
bucket (loaded once from a staged parquet shard), rank state lives inside
the actors, and a BSP round moves only rank-contribution shards as object
refs — the edges never cross the wire again. On a multi-node cluster the
staging directory is shared storage (the lake), exactly like the CDC
stage-then-commit path.

Semantics are identical to the Dataset variant (damped PageRank, r0 = 1,
symmetric graph, no dangling mass) — asserted by the A/B pytest and by
sharing the SQL oracle.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray

MIX = np.uint64(0x9E3779B97F4A7C15)


def bucket_of(nodes: np.ndarray, num_buckets: int) -> np.ndarray:
    return (
        ((nodes.astype(np.uint64) * MIX) >> np.uint64(32))
        % np.uint64(num_buckets)
    ).astype(np.int64)


@ray.remote
class _BucketActor:
    """Holds one edge bucket (all edges whose SOURCE hashes here) plus the
    rank state of the nodes owned by this bucket. Setup happens once in
    ``__init__`` (the actor-pool rule); each BSP round is two calls:
    ``contribs()`` emits per-destination-bucket contribution shards,
    ``apply()`` folds the shards addressed to this bucket into new ranks."""

    def __init__(self, path: str, num_buckets: int):
        if os.path.exists(path):
            t = pq.read_table(path, columns=["src", "dst"])
            self.src = t["src"].to_numpy()
            self.dst = t["dst"].to_numpy()
        else:  # empty bucket
            self.src = np.array([], np.int64)
            self.dst = np.array([], np.int64)
        self.nodes, inv = np.unique(self.src, return_inverse=True)
        self.deg = np.bincount(inv, minlength=len(self.nodes)).astype(
            np.float64
        )
        self.src_pos = inv  # edge -> owned-node index
        self.dst_bucket = bucket_of(self.dst, num_buckets)
        self.num_buckets = num_buckets
        self.r = np.ones(len(self.nodes), np.float64)

    def contribs(self) -> tuple:
        """Per-edge r/deg, sharded by destination bucket. Returned as B
        separate objects (``num_returns=B`` at the call site) so each
        shard travels actor→actor as an object ref — the driver routes
        REFS only, never the data."""
        w = self.r[self.src_pos] / self.deg[self.src_pos]
        out = []
        for b in range(self.num_buckets):
            m = self.dst_bucket == b
            out.append((self.dst[m], w[m]))
        return tuple(out)

    def apply(self, damping: float, *shards) -> int:
        """Fold the contribution shards addressed to this bucket (each
        shard arrives as a top-level arg so Ray dereferences it on THIS
        actor, not at the driver)."""
        acc = np.zeros(len(self.nodes), np.float64)
        for nodes, vals in shards:
            if len(nodes):
                idx = np.searchsorted(self.nodes, nodes)
                np.add.at(acc, idx, vals)
        self.r = (1.0 - damping) + damping * acc
        return len(self.nodes)

    def ranks(self) -> pa.Table:
        return pa.table(
            {"part_id": pa.array(self.nodes), "pr": pa.array(self.r)}
        )

    def write_ranks(self, path: str) -> int:
        """Partition-wise output: each actor persists its own bucket's
        ranks (rounded like the driver-collect path) so a 10^9-node rank
        vector never funnels through the driver. Staged via a temp name +
        os.replace for idempotent re-runs."""
        t = pa.table(
            {
                "part_id": pa.array(self.nodes),
                "pr": pa.array(np.round(self.r.astype(np.float64), 6)),
            }
        )
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
        return t.num_rows


@ray.remote
class _KhopBucketActor:
    """K-hop BFS counterpart of ``_BucketActor``: pins one edge bucket
    (src-sorted for vectorized frontier expansion) plus the min-dist state
    of its owned nodes. Per hop: ``expand(h)`` emits candidate-neighbor
    shards by destination bucket, ``fold(h, *shards)`` min-reduces them
    into the dist state. On the symmetric graph every dst also appears as
    a src in its own bucket (edges are materialized both directions), so
    ownership is well-defined — the same assumption the pure-Dataset
    variant's ``init_state`` makes."""

    BIG = np.int64(1 << 40)

    def __init__(self, path: str, num_buckets: int, seed_mod: int = 97):
        if os.path.exists(path):
            t = pq.read_table(path, columns=["src", "dst"])
            src = t["src"].to_numpy()
            dst = t["dst"].to_numpy()
        else:
            src = np.array([], np.int64)
            dst = np.array([], np.int64)
        order = np.argsort(src, kind="stable")
        self.src_sorted = src[order]
        self.dst_sorted = dst[order]
        self.nodes = np.unique(src)
        self.dist = np.where(self.nodes % seed_mod == 0, np.int64(0), self.BIG)
        self.num_buckets = num_buckets

    def expand(self, hop: int) -> tuple:
        frontier = self.nodes[self.dist == hop - 1]
        if not len(frontier):
            return tuple(
                np.array([], np.int64) for _ in range(self.num_buckets)
            )
        lo = np.searchsorted(self.src_sorted, frontier, "left")
        hi = np.searchsorted(self.src_sorted, frontier, "right")
        cnt = hi - lo
        total = int(cnt.sum())
        first = np.cumsum(cnt) - cnt
        idx = np.repeat(lo, cnt) + (
            np.arange(total, dtype=np.int64) - np.repeat(first, cnt)
        )
        dst = self.dst_sorted[idx]
        db = bucket_of(dst, self.num_buckets)
        return tuple(
            np.unique(dst[db == b]) for b in range(self.num_buckets)
        )

    def fold(self, hop: int, *shards) -> int:
        for cand in shards:
            if not len(cand):
                continue
            pos = np.searchsorted(self.nodes, cand)
            ok = (pos < len(self.nodes)) & (self.nodes[pos.clip(max=len(self.nodes) - 1)] == cand)
            pos = pos[ok]
            self.dist[pos] = np.minimum(self.dist[pos], np.int64(hop))
        return int((self.dist == hop).sum())

    def census(self, k: int) -> np.ndarray:
        d = self.dist[self.dist <= k]
        return np.bincount(d, minlength=k + 1).astype(np.int64)


def khop_actor_mode(
    pairs_ds,
    stage_dir: str,
    k: int = 3,
    num_buckets: int = 16,
    seed_mod: int = 97,
) -> pa.Table:
    """K-hop reachability census with bucket-pinned actors: edges stage
    once per bucket (the only edge movement), then K hops of ref-only
    candidate routing; only the ≤(K+1)-row census leaves the actors.
    Pair-asserted identical to the Dataset-algebra ``khop_reachable_parts``
    and shares its SQL oracle."""

    def to_edges(t: pa.Table) -> pa.Table:
        x = t["part_a"].to_numpy()
        y = t["part_b"].to_numpy()
        src = np.concatenate([x, y]).astype(np.int64)
        dst = np.concatenate([y, x]).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(src),
                "dst": pa.array(dst),
                "bucket": pa.array(bucket_of(src, num_buckets)),
            }
        )

    os.makedirs(stage_dir, exist_ok=True)

    def stage(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["bucket"].iloc[0])
        path = os.path.join(stage_dir, f"edges-{b:04d}.parquet")
        pq.write_table(
            pa.Table.from_pandas(g[["src", "dst"]], preserve_index=False), path
        )
        return pd.DataFrame({"bucket": [b], "n": [len(g)]})

    (
        pairs_ds.map_batches(to_edges, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(stage, batch_format="pandas")
        .to_pandas()
    )

    actors = [
        _KhopBucketActor.remote(
            os.path.join(stage_dir, f"edges-{b:04d}.parquet"),
            num_buckets,
            seed_mod,
        )
        for b in range(num_buckets)
    ]
    for hop in range(1, max(1, k) + 1):
        refs = [
            a.expand.options(num_returns=num_buckets).remote(hop)
            for a in actors
        ]
        if num_buckets == 1:
            refs = [[r] for r in refs]
        ray.get(
            [
                a.fold.remote(hop, *[refs[s][b] for s in range(num_buckets)])
                for b, a in enumerate(actors)
            ]
        )
    counts = ray.get([a.census.remote(k) for a in actors])
    for a in actors:
        ray.kill(a)
    total = np.sum(counts, axis=0)
    return pa.table(
        {
            "dist": pa.array(np.arange(k + 1, dtype=np.int64)),
            "n_nodes": pa.array(total.astype(np.int64)),
        }
    )


def pagerank_actor_mode(
    pairs_ds,
    stage_dir: str,
    iters: int = 3,
    damping: float = 0.85,
    num_buckets: int = 16,
    out_dir: str | None = None,
) -> pa.Table:
    """Run damped PageRank over the undirected pair dataset with
    bucket-pinned actors. ``pairs_ds`` has (part_a, part_b) distinct
    pairs; staging writes one parquet shard per src bucket (a groupby
    exchange — the ONLY time edges move), then K rounds of ref-only
    shard routing.

    ``out_dir``: when given, each actor writes its bucket's ranks to
    ``out_dir/ranks-{b:04d}.parquet`` itself and only a ≤num_buckets-row
    summary (bucket, rows, file) returns — the scale path for graphs
    whose rank vector exceeds driver memory. Default (None) keeps the
    driver-collect behavior (the result IS the output at query scale)."""

    def to_edges(t: pa.Table) -> pa.Table:
        x = t["part_a"].to_numpy()
        y = t["part_b"].to_numpy()
        src = np.concatenate([x, y]).astype(np.int64)
        dst = np.concatenate([y, x]).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(src),
                "dst": pa.array(dst),
                "bucket": pa.array(bucket_of(src, num_buckets)),
            }
        )

    os.makedirs(stage_dir, exist_ok=True)

    def stage(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["bucket"].iloc[0])
        path = os.path.join(stage_dir, f"edges-{b:04d}.parquet")
        pq.write_table(
            pa.Table.from_pandas(g[["src", "dst"]], preserve_index=False), path
        )
        return pd.DataFrame({"bucket": [b], "n": [len(g)]})

    (
        pairs_ds.map_batches(to_edges, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(stage, batch_format="pandas")
        .to_pandas()  # ≤ num_buckets rows; drives the staging write
    )

    actors = [
        _BucketActor.remote(
            os.path.join(stage_dir, f"edges-{b:04d}.parquet"), num_buckets
        )
        for b in range(num_buckets)
    ]
    for _ in range(max(1, iters)):
        # refs[s][b] = shard from source bucket s addressed to bucket b;
        # the driver only routes refs — shards move actor→actor
        refs = [
            a.contribs.options(num_returns=num_buckets).remote()
            for a in actors
        ]
        if num_buckets == 1:
            refs = [[r] for r in refs]
        ray.get(
            [
                a.apply.remote(
                    damping, *[refs[s][b] for s in range(num_buckets)]
                )
                for b, a in enumerate(actors)
            ]
        )
    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)
        files = [
            os.path.join(out_dir, f"ranks-{b:04d}.parquet")
            for b in range(num_buckets)
        ]
        rows = ray.get(
            [a.write_ranks.remote(f) for a, f in zip(actors, files)]
        )
        for a in actors:
            ray.kill(a)
        return pa.table(
            {
                "bucket": pa.array(np.arange(num_buckets, dtype=np.int64)),
                "rows": pa.array(np.asarray(rows, dtype=np.int64)),
                "file": pa.array(files, pa.string()),
            }
        )
    tables = ray.get([a.ranks.remote() for a in actors])
    for a in actors:
        ray.kill(a)
    out = pa.concat_tables([t for t in tables if t.num_rows])
    df = out.to_pandas()
    df["pr"] = np.round(df["pr"].astype(np.float64), 6)
    return pa.Table.from_pandas(
        df.sort_values("part_id").reset_index(drop=True), preserve_index=False
    )
