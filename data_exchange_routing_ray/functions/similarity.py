"""Similarity search over an embedding column (``list<float>``).

- ``topk_cosine``: brute-force exact top-k — per-batch numpy matmul against
  a broadcast query matrix, local top-k per batch (so only ``k`` rows per
  block survive), global top-k on the tiny candidate set. This is the
  baseline and the oracle-verifiable path.
- ``IVFIndex``: scale path — coarse k-means centroids fit once on a driver
  sample, per-batch assignment, probe only the closest ``nprobe`` clusters.
  Approximate; recall vs brute force asserted in pytest.

The query matrix is broadcast (``ray.put`` once / closure constant), never
re-shipped per batch; the corpus streams.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _normalize(M: np.ndarray) -> np.ndarray:
    # einsum row norms: no (n, dim) squared-product temporary (measured
    # 100x cheaper than the temporary-allocating form on this host's
    # degraded-bandwidth windows; see functions/dedup.py cosine_of)
    norms = np.sqrt(np.einsum("ij,ij->i", M, M))
    norms[norms == 0] = 1.0
    return M / norms[:, None]


def list_col_matrix(col, dtype=np.float64) -> np.ndarray:
    """Arrow ``list<number>`` column → ``(n, dim)`` numpy matrix through the
    flattened values buffer — no per-row Python objects (``np.stack`` over
    ``to_pandas()``/``to_pylist()`` walks one object per row; this is the
    per-batch hot path of every embedding stage). Requires uniform list
    lengths and no nulls; raises on ragged input rather than misaligning."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype)
    if col.null_count:
        raise ValueError("list_col_matrix: null rows in embedding column")
    offs = col.offsets.to_numpy()
    widths = np.diff(offs)
    dim = int(widths[0])
    if not (widths == dim).all():
        raise ValueError("list_col_matrix: ragged list lengths")
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(n, dim).astype(dtype, copy=False)


def topk_cosine(
    ds: ray.data.Dataset,
    query: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Exact top-k by cosine similarity to ``query`` (1-D vector)."""
    q = np.asarray(query, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    q_ref = ray.put(q)

    def local_topk(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        M = _normalize(list_col_matrix(batch[vec_col]))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        scores = M @ qv
        kk = min(k, len(scores))
        idx = np.argpartition(-scores, kk - 1)[:kk]
        return pa.table(
            {
                id_col: pa.array(ids[idx]),
                "cosine": pa.array(np.round(scores[idx], 6), pa.float64()),
            }
        )

    cand = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(
        ["cosine", id_col], ascending=[False, True], kind="stable"
    ).head(k)
    return cand.reset_index(drop=True)


def batch_topk_cosine(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_label_col: str | None = None,
    query_labels: np.ndarray | None = None,
) -> pd.DataFrame:
    """Exact top-k per query for a BATCH of queries (one matmul per block
    against the broadcast query matrix — batched model-inference shape).

    Returns columns (query_id, vec_id, cosine); ties broken by lower vec_id.
    Cosine is computed as dot / (|a||b|) in float64 — bit-for-bit the SQL
    ``list_cosine_similarity`` formula, so the result is oracle-verifiable.

    ``exclude_label_col`` + ``query_labels`` turn this into HARD-NEGATIVE
    mining: corpus rows sharing the query's label are masked out, so the
    result is the most-similar OTHER-label rows per query.
    """
    Q = np.asarray(queries, dtype=np.float64)
    qn = np.linalg.norm(Q, axis=1)
    qn[qn == 0] = 1.0
    q_ref = ray.put((Q, qn, query_labels))
    qid = np.asarray(query_ids, dtype=np.int64)
    sel_cols = [id_col, vec_col] + ([exclude_label_col] if exclude_label_col else [])

    def local_topk(batch: pa.Table) -> pa.Table:
        Qv, qnv, qlab = ray.get(q_ref)
        df = batch.select(sel_cols).to_pandas()
        M = list_col_matrix(batch[vec_col])
        mn = np.sqrt(np.einsum("ij,ij->i", M, M))
        mn[mn == 0] = 1.0
        S = (M @ Qv.T) / np.outer(mn, qnv)  # (rows, n_queries)
        if exclude_label_col is not None:
            # hard-negative masking: a row never scores against a query of
            # its OWN label (set to -inf; all-masked columns filtered below)
            lab = df[exclude_label_col].to_numpy()
            S = np.where(lab[:, None] == np.asarray(qlab)[None, :], -np.inf, S)
        kk = min(k, S.shape[0])
        idx = np.argpartition(-S, kk - 1, axis=0)[:kk]  # (kk, n_queries)
        ids = df[id_col].to_numpy()
        out_q, out_id, out_s = [], [], []
        for j in range(S.shape[1]):
            out_q.append(np.full(kk, qid[j], dtype=np.int64))
            out_id.append(ids[idx[:, j]].astype(np.int64))
            out_s.append(S[idx[:, j], j])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                id_col: pa.array(np.concatenate(out_id), pa.int64()),
                "cosine": pa.array(
                    np.round(np.concatenate(out_s), 6), pa.float64()
                ),
            }
        )

    cand = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    if exclude_label_col is not None:
        cand = cand[np.isfinite(cand["cosine"])]
    cand = cand.sort_values(
        ["query_id", "cosine", id_col], ascending=[True, False, True], kind="stable"
    )
    return cand.groupby("query_id", as_index=False).head(k).reset_index(drop=True)


class IVFIndex:
    """Coarse-quantized (IVF-flat) approximate search.

    Centroids are k-means-fit (seeded, few Lloyd iterations) on a bounded
    driver-side sample; search streams the corpus and scores only rows whose
    assigned centroid is among the query's ``nprobe`` closest.
    """

    def __init__(self, num_clusters: int = 16, iters: int = 8, seed: int = 42):
        self.num_clusters = num_clusters
        self.iters = iters
        self.seed = seed
        self.centroids: np.ndarray | None = None

    def fit(
        self,
        ds: ray.data.Dataset,
        vec_col: str = "embedding",
        sample_rows: int = 4096,
    ) -> "IVFIndex":
        sample = ds.limit(sample_rows).to_pandas()
        X = _normalize(np.stack(sample[vec_col].to_numpy()).astype(np.float64))
        rng = np.random.default_rng(self.seed)
        kk = min(self.num_clusters, len(X))
        C = X[rng.choice(len(X), size=kk, replace=False)]
        for _ in range(self.iters):
            assign = np.argmax(X @ C.T, axis=1)
            for c in range(kk):
                members = X[assign == c]
                if len(members):
                    v = members.mean(axis=0)
                    n = np.linalg.norm(v)
                    if n > 0:
                        C[c] = v / n
        self.centroids = C
        return self

    def search(
        self,
        ds: ray.data.Dataset,
        query: np.ndarray,
        k: int = 10,
        nprobe: int = 4,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
    ) -> pd.DataFrame:
        assert self.centroids is not None, "call fit() first"
        C = self.centroids
        q = np.asarray(query, dtype=np.float64)
        q = q / (np.linalg.norm(q) or 1.0)
        probe = set(np.argsort(-(C @ q))[:nprobe].tolist())
        c_ref = ray.put(C)
        q_ref = ray.put(q)

        def probe_topk(batch: pa.Table) -> pa.Table:
            Cv, qv = ray.get(c_ref), ray.get(q_ref)
            df = batch.select([id_col, vec_col]).to_pandas()
            M = _normalize(np.stack(df[vec_col].to_numpy()).astype(np.float64))
            assign = np.argmax(M @ Cv.T, axis=1)
            mask = np.isin(assign, list(probe))
            if not mask.any():
                return pa.table(
                    {id_col: pa.array([], pa.int64()), "cosine": pa.array([], pa.float64())}
                )
            sub = M[mask]
            ids = df[id_col].to_numpy()[mask]
            scores = sub @ qv
            kk = min(k, len(scores))
            idx = np.argpartition(-scores, kk - 1)[:kk]
            return pa.table(
                {
                    id_col: pa.array(ids[idx].astype(np.int64), pa.int64()),
                    "cosine": pa.array(np.round(scores[idx], 6), pa.float64()),
                }
            )

        cand = ds.map_batches(probe_topk, batch_format="pyarrow").to_pandas()
        cand = cand.sort_values(
            ["cosine", id_col], ascending=[False, True], kind="stable"
        ).head(k)
        return cand.reset_index(drop=True)


def distributed_kmeans(
    ds: ray.data.Dataset,
    k: int = 8,
    iters: int = 5,
    vec_col: str = "embedding",
    seed: int = 42,
    sample_rows: int = 4096,
) -> np.ndarray:
    """DISTRIBUTED Lloyd k-means on the cosine sphere (IVFIndex.fit trains
    on a driver sample; this streams the FULL corpus every iteration).

    Each round: centroids broadcast via ``ray.put`` (k×dim — tiny), one
    ``map_batches`` pass emits per-batch partial (count, vector-sum) rows
    per centroid (k rows/batch, vectorized ``np.add.at``), the driver
    reduces the k×dim partials and renormalizes. Deterministic (seeded
    init from a bounded sample). Returns the (k, dim) unit centroids."""
    sample = ds.limit(sample_rows).to_pandas()
    X = _normalize(np.stack(sample[vec_col].to_numpy()).astype(np.float64))
    rng = np.random.default_rng(seed)
    kk = min(k, len(X))
    C = X[rng.choice(len(X), size=kk, replace=False)]
    dim = C.shape[1]

    for _ in range(iters):
        c_ref = ray.put(C)

        def partial(batch: pa.Table) -> pa.Table:
            Cv = ray.get(c_ref)
            M = _normalize(list_col_matrix(batch[vec_col]))
            assign = np.argmax(M @ Cv.T, axis=1)
            sums = np.zeros((kk, dim), dtype=np.float64)
            np.add.at(sums, assign, M)
            counts = np.bincount(assign, minlength=kk).astype(np.int64)
            return pa.table(
                {
                    "cid": pa.array(np.arange(kk, dtype=np.int64)),
                    "count": pa.array(counts),
                    "vecsum": pa.array(
                        [sums[i].tobytes() for i in range(kk)], pa.binary()
                    ),
                }
            )

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        counts = np.zeros(kk, dtype=np.int64)
        sums = np.zeros((kk, dim), dtype=np.float64)
        for cid, cnt, blob in zip(parts["cid"], parts["count"], parts["vecsum"]):
            counts[cid] += cnt
            sums[cid] += np.frombuffer(blob, dtype=np.float64)
        nonempty = counts > 0
        newC = C.copy()
        newC[nonempty] = sums[nonempty] / counts[nonempty, None]
        norms = np.linalg.norm(newC, axis=1)
        norms[norms == 0] = 1.0
        C = newC / norms[:, None]
    return C


def kmeans_cluster_stats(
    ds: ray.data.Dataset,
    centroids: np.ndarray,
    vec_col: str = "embedding",
) -> "pd.DataFrame":
    """Final assignment pass: per-cluster size and mean cosine-to-centroid
    (one streaming map_batches + a tiny driver reduce)."""
    import pandas as pd

    kk, dim = centroids.shape
    c_ref = ray.put(centroids)

    def partial(batch: pa.Table) -> pa.Table:
        Cv = ray.get(c_ref)
        M = _normalize(list_col_matrix(batch[vec_col]))
        S = M @ Cv.T
        assign = np.argmax(S, axis=1)
        best = S[np.arange(len(M)), assign]
        counts = np.bincount(assign, minlength=kk).astype(np.int64)
        cos_sums = np.zeros(kk, dtype=np.float64)
        np.add.at(cos_sums, assign, best)
        return pa.table(
            {
                "cluster_id": pa.array(np.arange(kk, dtype=np.int64)),
                "n_vecs": pa.array(counts),
                "cos_sum": pa.array(cos_sums, pa.float64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby("cluster_id", as_index=False).agg(
        n_vecs=("n_vecs", "sum"), cos_sum=("cos_sum", "sum")
    )
    out = out[out["n_vecs"] > 0].copy()
    out["avg_cos"] = np.round(out["cos_sum"] / out["n_vecs"], 6)
    out["n_vecs"] = out["n_vecs"].astype("int64")
    return out[["cluster_id", "n_vecs", "avg_cos"]]
