"""Distributed connected components — iterative min-label propagation with
pointer jumping.

The iterative-algorithm shape Ray Data lacks natively: a driver loop over
lazy Dataset ops, state (the vertex→label table) materialized between
rounds. Each round:

    propose: every edge offers min(label[u], label[v]) to both endpoints
             (one streaming pass over the edges; the label table is read
             zero-copy from the object store via the per-worker broadcast
             cache — size-gated, the same machinery as the dedup verifies)
    reduce:  min proposal per vertex (ONE coarse-bucket shuffle)
    apply:   label[v] = min(label[v], proposal[v], label[label[v]])
             — the label-of-label hop is pointer jumping, collapsing long
             chains in O(log diameter) rounds instead of O(diameter)

Terminates when a round changes nothing. Used for near-duplicate
CLUSTERING: LSH/minhash pairs → components → keep min-id doc per
component (the union-find the driver used to do, now distributed).

Partitioning assumption (documented per task instructions): the label
table must fit the broadcast budget per worker; beyond that the lookups
swap to ``attach_payload_bucketed`` joins keyed by vertex (the label is an
8-byte payload), same rounds, two extra shuffles per round.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from data_exchange_routing_ray.functions.dedup import (
    _BROADCAST_CACHE,
    _cache_put,
    _mix_to_bucket,
)


def _labels_lookup(refs, key_col: str = "vertex", val_col: str = "label"):
    """Per-worker cached (sorted keys, values) from int64 block refs."""
    key = (refs[0].hex() if refs else "", key_col, val_col)
    hit = _BROADCAST_CACHE.get(key)
    if hit is not None:
        return hit
    import ray as _ray

    from data_exchange_routing_ray.functions.dedup import _as_arrow_block

    tabs = [
        t for t in map(_as_arrow_block, _ray.get(list(refs))) if t.num_rows
    ]
    if tabs:
        tab = pa.concat_tables(tabs)
        ids = tab[key_col].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        val = (ids[order], tab[val_col].to_numpy(zero_copy_only=False)[order])
    else:
        val = (np.zeros(0, np.int64), np.zeros(0, np.int64))
    _cache_put(key, val)
    return val


def connected_components(
    edges: ray.data.Dataset,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iters: int = 64,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """(vertex, label) for every vertex appearing in ``edges``; label = the
    minimum vertex id of its connected component."""
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_arrow(
            pa.table(
                {"vertex": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}
            )
        )
    # Every ROUND pays a shuffle whose fixed cost scales with the number of
    # blocks entering it — size both the edge partitions and the bucket
    # count to the edge COUNT, not the upstream layout (a small pair set
    # arriving in 256 near-empty blocks would pay 256-task rounds)
    num_buckets = int(max(4, min(num_buckets, n_edges // 250_000 + 1)))
    edges = edges.repartition(int(max(4, n_edges // 1_000_000 + 1))).materialize()

    # ---- init: labels[v] = v over the distinct endpoint set --------------
    def vert_batch(b: pa.Table) -> pa.Table:
        v = np.unique(
            np.concatenate(
                [
                    b[src_col].to_numpy(zero_copy_only=False),
                    b[dst_col].to_numpy(zero_copy_only=False),
                ]
            )
        ).astype(np.int64)
        t = pa.table({"vertex": pa.array(v, pa.int64())})
        return t.append_column(
            "vbucket", pa.array(_mix_to_bucket([v], num_buckets), pa.int64())
        )

    def uniq_group(g: pd.DataFrame) -> pd.DataFrame:
        v = np.unique(g["vertex"].to_numpy())
        return pd.DataFrame({"vertex": v, "label": v})

    labels = (
        edges.map_batches(vert_batch, batch_format="pyarrow")
        .groupby("vbucket")
        .map_groups(uniq_group, batch_format="pandas")
        .materialize()
    )

    for _ in range(max_iters):
        refs = labels.to_arrow_refs()

        def propose(b: pa.Table) -> pa.Table:
            ids, lab = _labels_lookup(refs)
            a = b[src_col].to_numpy(zero_copy_only=False)
            bb = b[dst_col].to_numpy(zero_copy_only=False)
            la = lab[np.searchsorted(ids, a)]
            lb = lab[np.searchsorted(ids, bb)]
            m = np.minimum(la, lb)
            va = m < la
            vb = m < lb
            vert = np.concatenate([a[va], bb[vb]]).astype(np.int64)
            cand = np.concatenate([m[va], m[vb]]).astype(np.int64)
            t = pa.table(
                {"vertex": pa.array(vert), "cand": pa.array(cand)}
            )
            return t.append_column(
                "vbucket",
                pa.array(_mix_to_bucket([vert], num_buckets), pa.int64()),
            )

        def min_per_vertex(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby("vertex", as_index=False).agg(cand=("cand", "min"))

        updates = (
            edges.map_batches(propose, batch_format="pyarrow")
            .groupby("vbucket")
            .map_groups(min_per_vertex, batch_format="pandas")
            .materialize()
        )
        if updates.count() == 0:
            break
        urefs = updates.to_arrow_refs()

        def apply_round(b: pa.Table) -> pa.Table:
            ids, lab = _labels_lookup(refs)  # old labels (for the jump)
            uv, uc = _labels_lookup(urefs, "vertex", "cand")
            v = b["vertex"].to_numpy(zero_copy_only=False)
            newl = b["label"].to_numpy(zero_copy_only=False).copy()
            if len(uv):
                pos = np.searchsorted(uv, v)
                pos_c = np.minimum(pos, len(uv) - 1)
                hit = uv[pos_c] == v
                newl[hit] = np.minimum(newl[hit], uc[pos_c[hit]])
            # pointer jumping: label[v] = min(label[v], old_label[label[v]])
            jpos = np.searchsorted(ids, newl)
            jpos_c = np.minimum(jpos, max(len(ids) - 1, 0))
            if len(ids):
                jhit = ids[jpos_c] == newl
                newl[jhit] = np.minimum(newl[jhit], lab[jpos_c[jhit]])
            return pa.table(
                {
                    "vertex": pa.array(v, pa.int64()),
                    "label": pa.array(newl, pa.int64()),
                }
            )

        labels = labels.map_batches(apply_round, batch_format="pyarrow").materialize()
    return labels.map_batches(
        lambda b: b.select(["vertex", "label"]), batch_format="pyarrow"
    )
