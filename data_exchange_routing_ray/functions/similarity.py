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
    norms = np.linalg.norm(M, axis=1)
    norms[norms == 0] = 1.0
    return M / norms[:, None]


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
        df = batch.select([id_col, vec_col]).to_pandas()
        M = _normalize(np.stack(df[vec_col].to_numpy()).astype(np.float64))
        scores = M @ qv
        kk = min(k, len(scores))
        idx = np.argpartition(-scores, kk - 1)[:kk]
        return pa.table(
            {
                id_col: pa.array(df[id_col].to_numpy()[idx]),
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
) -> pd.DataFrame:
    """Exact top-k per query for a BATCH of queries (one matmul per block
    against the broadcast query matrix — batched model-inference shape).

    Returns columns (query_id, vec_id, cosine); ties broken by lower vec_id.
    Cosine is computed as dot / (|a||b|) in float64 — bit-for-bit the SQL
    ``list_cosine_similarity`` formula, so the result is oracle-verifiable.
    """
    Q = np.asarray(queries, dtype=np.float64)
    qn = np.linalg.norm(Q, axis=1)
    qn[qn == 0] = 1.0
    q_ref = ray.put((Q, qn))
    qid = np.asarray(query_ids, dtype=np.int64)

    def local_topk(batch: pa.Table) -> pa.Table:
        Qv, qnv = ray.get(q_ref)
        df = batch.select([id_col, vec_col]).to_pandas()
        M = np.stack(df[vec_col].to_numpy()).astype(np.float64)
        mn = np.linalg.norm(M, axis=1)
        mn[mn == 0] = 1.0
        S = (M @ Qv.T) / np.outer(mn, qnv)  # (rows, n_queries)
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
