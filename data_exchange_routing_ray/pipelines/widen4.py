"""Round-3 widening batch C: transcript conversation analytics (response
latency, ordered tool-path listagg), model-based document quality scoring
(hashed-linear classifier as a stateful actor-pool stage), and a count-min
sketch heavy-hitter estimator.

Each operator documents its 100 TB shape inline. Reference parity notes:
the reference (CDCgov/data-exchange-routing) processes opaque blobs and has
no conversation/scoring analogs — these are training-data-pipeline addenda
(quality-classifier filtering a la fasttext-style scorers; CMS frequency
estimation). The conversation operators reuse the transcript final-state
semantics of the CDC core (LWW per (conv_id, turn_idx) over the derived
change stream — same combiner/bucket-exchange shape as
``events_cdc.conv_transcript_assembly``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_N_BUCKETS = 64


def _conv_partial_cols(b: pa.Table, cols: list[str]) -> pd.DataFrame:
    """Per-batch LWW combiner for the derived change stream: argmax(seq)
    per (conv_id, turn_idx) inside the batch, keeping ``cols``; adds the
    conv-hash bucket column for the single coarse exchange."""
    df = pd.DataFrame(
        {
            "conv_id": b["conv_id"].to_numpy(zero_copy_only=False),
            "turn_idx": b["turn_idx"].to_numpy().astype(np.int64),
            "seq": b["seq"].to_numpy(),
            "op": b["op"].to_numpy(zero_copy_only=False),
            **{c: b[c].to_numpy(zero_copy_only=False) for c in cols},
        }
    )
    idx = df.groupby(["conv_id", "turn_idx"], sort=False)["seq"].idxmax()
    w = df.loc[idx].reset_index(drop=True)
    uid = w["conv_id"].str[5:].astype(np.int64).to_numpy()
    w["bucket"] = (
        (uid.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(_N_BUCKETS)
    ).astype(np.int64)
    return w


def _conv_live(g: pd.DataFrame) -> pd.DataFrame:
    """In-bucket final LWW + delete-drop, sorted (conv_id, turn_idx)."""
    idx = g.groupby(["conv_id", "turn_idx"], sort=False)["seq"].idxmax()
    w = g.loc[idx]
    return w[w["op"] != "delete"].sort_values(["conv_id", "turn_idx"])


def conv_response_latency(sf_dir: str) -> pa.Table:
    """Per-conversation user→assistant response latency over the FINAL
    transcript state: adjacent (turn t user, turn t+1 assistant) pairs,
    latency = ts(t+1) − ts(t); per conv the pair count and the exact total
    latency in integer microseconds (mean = total/n, kept as exact int64 so
    the oracle comparison is float-free).

    100 TB shape: per-batch LWW combiner (dedupes update storms before the
    wire) → ONE conv-hash bucket exchange → whole conversations resolve
    in-bucket; the pairing is a vectorized shift over the bucket-sorted
    frame (no per-conversation Python loop). Only (conv_id, n_pairs, mean)
    leaves the bucket."""
    from data_exchange_routing_ray.pipelines.events_cdc import derived_change_stream

    def partial(b: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(
            _conv_partial_cols(b, ["role", "ts"]), preserve_index=False
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        live = _conv_live(g)
        nxt_conv = live["conv_id"].shift(-1)
        nxt_turn = live["turn_idx"].shift(-1)
        nxt_role = live["role"].shift(-1)
        nxt_ts = live["ts"].shift(-1)
        m = (
            (nxt_conv == live["conv_id"])
            & (nxt_turn == live["turn_idx"] + 1)
            & (live["role"] == "user")
            & (nxt_role == "assistant")
        )
        p = live[m]
        lat = (
            nxt_ts[m].to_numpy().astype("datetime64[us]").astype(np.int64)
            - p["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        )
        out = (
            pd.DataFrame({"conv_id": p["conv_id"].to_numpy(), "lat": lat})
            .groupby("conv_id", as_index=False)
            .agg(n_pairs=("lat", "size"), total_latency_us=("lat", "sum"))
        )
        out["n_pairs"] = out["n_pairs"].astype(np.int64)
        out["total_latency_us"] = out["total_latency_us"].astype(np.int64)
        return out

    out = (
        derived_change_stream(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    return pa.Table.from_pandas(
        out.sort_values("conv_id").reset_index(drop=True), preserve_index=False
    )


CONV_RESPONSE_LATENCY_SQL_TAIL = """
, last AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY seq DESC) AS rn
  FROM ch
), fs AS (
  SELECT conv_id, turn_idx, role, ts FROM last WHERE rn = 1 AND op <> 'delete'
), p AS (
  SELECT conv_id, turn_idx, role, ts,
         lead(role) OVER w AS nrole,
         lead(ts) OVER w AS nts,
         lead(turn_idx) OVER w AS nturn
  FROM fs WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
)
SELECT conv_id, count(*) AS n_pairs,
       CAST(sum(date_diff('microsecond', ts, nts)) AS BIGINT) AS total_latency_us
FROM p
WHERE role = 'user' AND nrole = 'assistant' AND nturn = turn_idx + 1
GROUP BY conv_id ORDER BY conv_id
"""


def conv_tool_paths(sf_dir: str) -> pa.Table:
    """Ordered tool-call path per conversation (LISTAGG/string_agg family):
    the FINAL live turns' tool values concatenated in turn order with '>'.

    100 TB shape: same combiner → one bucket exchange as
    ``conv_response_latency``; the in-bucket join is a per-conversation
    ''.join over the bucket-sorted frame (bounded: |convs|/64 per bucket),
    and only (conv_id, n_tool_turns, tool_path) leaves the bucket — the
    path string is the op's deliverable, so output size IS the result
    size."""
    from data_exchange_routing_ray.pipelines.events_cdc import derived_change_stream

    def partial(b: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(
            _conv_partial_cols(b, ["tool"]), preserve_index=False
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        live = _conv_live(g)
        live = live[live["tool"].notna()]
        if live.empty:
            return pd.DataFrame(
                {
                    "conv_id": pd.Series([], dtype=object),
                    "n_tool_turns": pd.Series([], dtype=np.int64),
                    "tool_path": pd.Series([], dtype=object),
                }
            )
        out = live.groupby("conv_id", as_index=False).agg(
            n_tool_turns=("tool", "size"), tool_path=("tool", ">".join)
        )
        out["n_tool_turns"] = out["n_tool_turns"].astype(np.int64)
        return out

    out = (
        derived_change_stream(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    return pa.Table.from_pandas(
        out.sort_values("conv_id").reset_index(drop=True), preserve_index=False
    )


CONV_TOOL_PATHS_SQL_TAIL = """
, last AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY seq DESC) AS rn
  FROM ch
), fs AS (
  SELECT conv_id, turn_idx, tool FROM last
  WHERE rn = 1 AND op <> 'delete' AND tool IS NOT NULL
)
SELECT conv_id, count(*) AS n_tool_turns,
       string_agg(tool, '>' ORDER BY turn_idx) AS tool_path
FROM fs GROUP BY conv_id ORDER BY conv_id
"""


# ------------------------------------------------- model-based quality score

class HashedLinearScorer:
    """Quality-classifier scoring stage (the fasttext-style linear scorer of
    FineWeb/DCLM-like pipelines) as a stateful actor-pool `map_batches`
    class: the "model" is a hashed-linear bag-of-words — weight(token) =
    md5(token)[:8] / 2^32 − 0.5 — deterministic, so a DuckDB oracle can
    replay it exactly. State: a token→weight cache built up in ``__init__``
    and REUSED across batches (the whole point of the actor pool — a real
    model's embedding matrix would live here); per batch only the batch's
    unique out-of-cache tokens are hashed, then scores are a vectorized
    take + segment-mean.

    100 TB shape: embarrassingly parallel map stage, zero exchange; output
    is (doc_id, n_tokens, score) only. Reference parity: the reference's
    lazy-singleton client pattern (T2, `RouteIngestedFile.kt:47-49` config
    cache) is the same setup-once-per-worker idea."""

    def __init__(self) -> None:
        self._cache: dict[str, float] = {}

    def _weights(self, uniq: np.ndarray) -> np.ndarray:
        cache = self._cache
        out = np.empty(uniq.size, np.float64)
        for i, t in enumerate(uniq):
            w = cache.get(t)
            if w is None:
                h = int(hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16)
                w = h / 4294967296.0 - 0.5
                cache[t] = w
            out[i] = w
        return out

    def __call__(self, b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(b["text"]), pattern=r"[^\p{L}\p{N}]+"
        )
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
        doc_of = np.repeat(np.arange(lens.size), lens)
        keep = flat != ""
        flat, doc_of = flat[keep], doc_of[keep]
        uniq, inv = np.unique(flat, return_inverse=True)
        w = self._weights(uniq)[inv]
        n_tok = np.bincount(doc_of, minlength=lens.size).astype(np.int64)
        tot = np.bincount(doc_of, weights=w, minlength=lens.size)
        nz = n_tok > 0
        score = np.zeros(lens.size, np.float64)
        score[nz] = tot[nz] / n_tok[nz]
        return pa.table(
            {
                "doc_id": b["doc_id"].filter(pa.array(nz)),
                "n_tokens": pa.array(n_tok[nz]),
                "score": pa.array(np.round(score[nz], 6)),
            }
        )


def doc_quality_model_score(sf_dir: str) -> pa.Table:
    from data_exchange_routing_ray.pipelines.events_cdc import _documents

    out = (
        _documents(sf_dir, columns=["doc_id", "text"])
        .map_batches(HashedLinearScorer, concurrency=(1, 8), batch_format="pyarrow")
        .to_pandas()
    )
    return pa.Table.from_pandas(
        out.sort_values("doc_id").reset_index(drop=True), preserve_index=False
    )


DOC_QUALITY_MODEL_SCORE_SQL = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+')) AS w
  FROM documents
), t AS (SELECT doc_id, w FROM tok WHERE w <> '')
SELECT doc_id, count(*) AS n_tokens,
       round(avg(CAST(concat('0x', substr(md5(w), 1, 8)) AS UBIGINT)
                 / 4294967296.0 - 0.5), 6) AS score
FROM t GROUP BY doc_id ORDER BY doc_id
"""


# --------------------------------------------------------- count-min sketch

_CMS_DEPTH = 4
_CMS_WIDTH = 8192
_CMS_A = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9, 0xD6E8FEB86659FD93],
    dtype=np.uint64,
)
_CMS_B = np.array(
    [0x2545F4914F6CDD1D, 0x9E6C63D0876A9F4B, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB],
    dtype=np.uint64,
)


def _cms_indices(keys: np.ndarray) -> np.ndarray:
    """(depth, n) bucket indices for int64 keys — vectorized uint64
    multiply-shift hashing, one row per CMS depth."""
    k = keys.astype(np.uint64)
    with np.errstate(over="ignore"):
        mixed = k[None, :] * _CMS_A[:, None] + _CMS_B[:, None]
    return ((mixed >> np.uint64(17)) % np.uint64(_CMS_WIDTH)).astype(np.int64)


def cms_topk_users(sf_dir: str, k: int = 20) -> pa.Table:
    """Count-min-sketch heavy hitters over events.user_id with an IN-QUERY
    error gate. Per-block partials emit (a) the block's CMS (depth 4 ×
    width 8192 int64, a fixed 256 KiB summary regardless of block size)
    and (b) the block's top-32 exact users as candidates — any global
    heavy hitter is heavy in some block. Partials tree-reduce through a
    32-key groupby (sketch sum + candidate count-sum are both
    commutative), so the driver folds ≤32 sketches whatever the input
    size. Estimates (min over depths, the CMS read) are then gated
    against exact counts of the candidate set computed by a second
    bounded pass; CMS guarantees est ≥ exact and the gate enforces
    est ≤ exact + 3·N/width. no-oracle op (sketch estimates are not
    SQL-expressible); quantitative pytest gate in
    tests/test_widen4_ops.py."""
    from data_exchange_routing_ray.pipelines.events_cdc import _events

    def partial(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy()
        vals, counts = np.unique(uid, return_counts=True)
        sketch = np.zeros((_CMS_DEPTH, _CMS_WIDTH), np.int64)
        idx = _cms_indices(vals)
        for d in range(_CMS_DEPTH):
            np.add.at(sketch[d], idx[d], counts)
        top = np.argsort(-counts, kind="stable")[:32]
        rk = int(vals[0] % 32) if vals.size else 0
        cand = pa.table(
            {
                "rk": pa.array(np.full(top.size, -1, np.int64)),
                "sketch": pa.array([None] * top.size, pa.list_(pa.int64())),
                "n": pa.array(counts[top].astype(np.int64)),
                "cand": pa.array(vals[top].astype(np.int64)),
            }
        )
        srow = pa.table(
            {
                "rk": pa.array([rk], pa.int64()),
                "sketch": pa.array([sketch.ravel()], pa.list_(pa.int64())),
                "n": pa.array([int(uid.size)], pa.int64()),
                "cand": pa.array([-1], pa.int64()),
            }
        )
        return pa.concat_tables([srow, cand])

    def reduce_rk(g: pd.DataFrame) -> pd.DataFrame:
        if (g["rk"] == -1).all():  # candidate rows: sum per candidate id
            out = g.groupby("cand", as_index=False).agg(n=("n", "sum"))
            out["rk"] = -1
            out["sketch"] = None
            return out[["rk", "sketch", "n", "cand"]]
        tot = np.zeros(_CMS_DEPTH * _CMS_WIDTH, np.int64)
        for s in g["sketch"]:
            if s is not None:
                tot += np.asarray(s, np.int64)
        return pd.DataFrame(
            {
                "rk": [int(g["rk"].iloc[0])],
                "sketch": [tot],
                "n": [int(g[g["sketch"].notna()]["n"].sum())],
                "cand": [-1],
            }
        )

    parts = (
        _events(sf_dir, columns=["user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("rk")
        .map_groups(reduce_rk, batch_format="pandas")
        .to_pandas()
    )
    sk_rows = parts[parts["rk"] >= 0]
    sketch = np.zeros((_CMS_DEPTH, _CMS_WIDTH), np.int64)
    for s in sk_rows["sketch"]:
        sketch += np.asarray(s, np.int64).reshape(_CMS_DEPTH, _CMS_WIDTH)
    total_n = int(sk_rows["n"].sum())

    cand_rows = parts[parts["rk"] == -1]
    cand = (
        cand_rows.groupby("cand", as_index=False)["n"]
        .sum()
        .sort_values(["n", "cand"], ascending=[False, True])
        .head(64)
    )
    cand_ids = cand["cand"].to_numpy().astype(np.int64)
    idx = _cms_indices(cand_ids)
    est = sketch[np.arange(_CMS_DEPTH)[:, None], idx].min(axis=0)

    # bounded exact pass over the candidate set only (broadcast filter)
    cset = set(int(c) for c in cand_ids)

    def exact_partial(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy()
        vals, counts = np.unique(uid, return_counts=True)
        m = np.isin(vals, cand_ids)
        return pa.table(
            {"user_id": pa.array(vals[m]), "n": pa.array(counts[m].astype(np.int64))}
        )

    from ray.data.aggregate import Sum

    exact = (
        _events(sf_dir, columns=["user_id"])
        .map_batches(exact_partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("n", alias_name="exact_count"))
        .to_pandas()
    )
    df = pd.DataFrame(
        {"user_id": cand_ids, "est_count": est.astype(np.int64)}
    ).merge(exact, on="user_id", how="left")
    df["exact_count"] = df["exact_count"].fillna(0).astype(np.int64)
    bound = 3.0 * total_n / _CMS_WIDTH
    assert (df["est_count"] >= df["exact_count"]).all(), "CMS must never undercount"
    assert (
        df["est_count"] - df["exact_count"] <= max(bound, 1.0)
    ).all(), f"CMS overcount exceeded 3N/w = {bound}"
    out = (
        df.sort_values(["exact_count", "user_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)
