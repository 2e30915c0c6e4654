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

from data_exchange_routing_ray.hashing import round_half_away
from data_exchange_routing_ray.runtime import cap_actor_pool

# LWW combiner + bucket-hash invariant shared with every conv-level op:
# defined once in events_cdc (conv_partial_cols / conv_live)


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
    from data_exchange_routing_ray.pipelines.events_cdc import (
        conv_live,
        conv_partial_cols,
        derived_change_stream,
    )

    def partial(b: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(
            conv_partial_cols(b, ["role", "ts"]), preserve_index=False
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        live = conv_live(g)
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
    from data_exchange_routing_ray.pipelines.events_cdc import (
        conv_live,
        conv_partial_cols,
        derived_change_stream,
    )

    def partial(b: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(
            conv_partial_cols(b, ["tool"]), preserve_index=False
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        live = conv_live(g)
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

def _tokenize_flat(text_col) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Shared word tokenizer (the contract the SQL oracles replay with
    ``regexp_split_to_array(lower(text), '[^\\p{L}\\p{N}]+')``): returns
    (flat non-empty tokens, doc index per token, non-empty tokens per
    doc)."""
    toks = pc.split_pattern_regex(pc.utf8_lower(text_col), pattern=r"[^\p{L}\p{N}]+")
    flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
    raw_lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
    doc_of = np.repeat(np.arange(raw_lens.size), raw_lens)
    keep = flat != ""
    flat, doc_of = flat[keep], doc_of[keep]
    lens = np.bincount(doc_of, minlength=raw_lens.size).astype(np.int64)
    return flat, doc_of, lens


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

    # weight-cache cap: weights are recomputable at md5 cost, so a full
    # cache is dropped rather than LRU-tracked (web-scale vocab is
    # unbounded; an uncapped dict would grow until the actor OOMs)
    _CACHE_CAP = 1 << 20

    def __init__(self, keep_cols: tuple[str, ...] = ()) -> None:
        self._cache: dict[str, float] = {}
        self._keep = tuple(keep_cols)

    def _weights(self, uniq: np.ndarray) -> np.ndarray:
        cache = self._cache
        can_grow = len(cache) < self._CACHE_CAP
        out = np.empty(uniq.size, np.float64)
        for i, t in enumerate(uniq):
            w = cache.get(t)
            if w is None:
                h = int(hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16)
                w = h / 4294967296.0 - 0.5
                if can_grow:
                    cache[t] = w
            out[i] = w
        return out

    def __call__(self, b: pa.Table) -> pa.Table:
        flat, doc_of, lens = _tokenize_flat(b["text"])
        uniq, inv = np.unique(flat, return_inverse=True)
        w = self._weights(uniq)[inv]
        n_tok = np.bincount(doc_of, minlength=lens.size).astype(np.int64)
        tot = np.bincount(doc_of, weights=w, minlength=lens.size)
        nz = n_tok > 0
        score = np.zeros(lens.size, np.float64)
        score[nz] = tot[nz] / n_tok[nz]
        mask = pa.array(nz)
        cols = {
            "doc_id": b["doc_id"].filter(mask),
            "n_tokens": pa.array(n_tok[nz]),
            "score": pa.array(round_half_away(score[nz], 6)),
        }
        for c in self._keep:
            cols[c] = b[c].filter(mask)
        return pa.table(cols)


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
        # spread reduce keys by block CONTENT, not min id (min user_id is
        # ~always 0, which would collapse the 32-way tree-reduce into one
        # serial task summing every per-block sketch)
        rk = (
            int((vals[0] * 31 + vals[-1] * 17 + vals.size) % 32)
            if vals.size
            else 0
        )
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


# ------------------------------------------------------ regex redaction

def doc_number_redaction(sf_dir: str) -> pa.Table:
    """PII-style regex redaction over documents (the reference's redactor,
    M10 `fn-redactor/Function.kt`, as a REAL vectorized scrub): every digit
    run becomes '#'; emits per-doc redaction count + md5 digest of the
    redacted text so the oracle can value-check the rewrite byte-for-byte
    without the output carrying the corpus.

    100 TB shape: embarrassingly parallel map stage (Arrow RE2 kernels for
    count+replace, C-speed md5 over the batch), zero exchange."""
    from data_exchange_routing_ray.pipelines.events_cdc import _documents

    def scrub(b: pa.Table) -> pa.Table:
        n_red = pc.count_substring_regex(b["text"], pattern="[0-9]+")
        red = pc.replace_substring_regex(b["text"], pattern="[0-9]+", replacement="#")
        digests = [
            hashlib.md5(s.encode("utf-8")).hexdigest() for s in red.to_pylist()
        ]
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_redactions": n_red.cast(pa.int64()),
                "digest": pa.array(digests, pa.string()),
            }
        )

    out = (
        _documents(sf_dir, columns=["doc_id", "text"])
        .map_batches(scrub, batch_format="pyarrow")
        .to_pandas()
    )
    return pa.Table.from_pandas(
        out.sort_values("doc_id").reset_index(drop=True), preserve_index=False
    )


DOC_NUMBER_REDACTION_SQL = """
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_redactions,
       md5(regexp_replace(text, '[0-9]+', '#', 'g')) AS digest
FROM documents ORDER BY doc_id
"""


# --------------------------------------------- per-source score calibration

def quality_score_calibration(sf_dir: str) -> pa.Table:
    """Quality-score calibration: each doc's hashed-linear model score is
    mapped to its exact percent-rank WITHIN its source (histogram
    equalization across sources — the mixing-stage normalizer that makes
    per-source quality thresholds comparable).

    100 TB shape: NO global sort. Scores are 6-dp-rounded, so integer
    ticks (score·10⁶ ∈ [−5·10⁵, 5·10⁵]) give a BOUNDED per-(source, tick)
    histogram: pass 1 scores + per-batch histogram partials → one small
    grouped reduce → driver builds the tick→percent-rank map (≤ sources ×
    10⁶ rows, data-size-independent); pass 2 re-scores (deterministic,
    cheaper than materializing the scored corpus mid-pipeline) and
    attaches ranks via a broadcast lookup. percent_rank uses min-rank tie
    semantics, exactly SQL's."""
    from ray.data.aggregate import Sum

    from data_exchange_routing_ray.pipelines.events_cdc import _documents

    def hist_partial(b: pa.Table) -> pa.Table:
        ticks = np.rint(b["score"].to_numpy() * 1e6).astype(np.int64)
        df = (
            pd.DataFrame({"source": b["source"].to_numpy(zero_copy_only=False), "tick": ticks})
            .groupby(["source", "tick"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        df["n"] = df["n"].astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    hist = (
        _documents(sf_dir, columns=["doc_id", "text", "source"])
        .map_batches(HashedLinearScorer, fn_constructor_kwargs={"keep_cols": ("source",)},
                     concurrency=(1, 8), batch_format="pyarrow")
        .map_batches(hist_partial, batch_format="pyarrow")
        .groupby(["source", "tick"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["source", "tick"])
    )
    pct_map: dict[tuple[str, int], float] = {}
    for src, g in hist.groupby("source", sort=False):
        n = int(g["n"].sum())
        before = g["n"].cumsum().shift(1, fill_value=0).to_numpy()
        for tick, rank0 in zip(g["tick"].to_numpy(), before):
            pct_map[(src, int(tick))] = (
                float(round_half_away(float(rank0) / (n - 1), 6))
                if n > 1
                else 0.0
            )
    pct_ref = ray.put(pct_map)

    def attach(b: pa.Table) -> pa.Table:
        m = ray.get(pct_ref)
        src = b["source"].to_numpy(zero_copy_only=False)
        ticks = np.rint(b["score"].to_numpy() * 1e6).astype(np.int64)
        pct = np.array([m[(s, int(t))] for s, t in zip(src, ticks)], np.float64)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "source": b["source"],
                "score": b["score"],
                "pct_rank": pa.array(pct),
            }
        )

    out = (
        _documents(sf_dir, columns=["doc_id", "text", "source"])
        .map_batches(HashedLinearScorer, fn_constructor_kwargs={"keep_cols": ("source",)},
                     concurrency=(1, 8), batch_format="pyarrow")
        .map_batches(attach, batch_format="pyarrow")
        .to_pandas()
    )
    return pa.Table.from_pandas(
        out.sort_values("doc_id").reset_index(drop=True), preserve_index=False
    )


QUALITY_SCORE_CALIBRATION_SQL = r"""
WITH tok AS (
  SELECT doc_id, source,
         unnest(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+')) AS w
  FROM documents
), t AS (SELECT doc_id, source, w FROM tok WHERE w <> ''),
s AS (
  SELECT doc_id, any_value(source) AS source,
         round(avg(CAST(concat('0x', substr(md5(w), 1, 8)) AS UBIGINT)
                   / 4294967296.0 - 0.5), 6) AS score
  FROM t GROUP BY doc_id
)
SELECT doc_id, source, score,
       round(percent_rank() OVER (PARTITION BY source ORDER BY score), 6)
         AS pct_rank
FROM s ORDER BY doc_id
"""


# ------------------------------------------- duplicate-span position census

_G5_MIX = np.uint64(0x100000001B3)


def dup_span_excise(sf_dir: str, n_gram: int = 5) -> pa.Table:
    """Substring-level exact dedup census (the "deduplicating training
    data" span operator): a token position is DUPLICATED if it lies inside
    any word 5-gram occurring ≥2 times corpus-wide (all occurrences count,
    including within one doc). Emits per doc the token count, the count of
    duplicated positions (what span excision would remove) and the kept
    fraction.

    100 TB shape: the exchanges carry (hash, doc_id, pos) triples — never
    text. Per-batch: Arrow tokenize → stable token hashes → vectorized
    rolling 5-gram hashes (strided numpy over the flat token array, doc
    boundaries masked via offsets). Exchange 1 groups by gram-hash bucket
    and marks duplicated starts with a vectorized ``duplicated(keep=False)``;
    exchange 2 groups by doc bucket and computes interval-union coverage as
    Σ min(5, Δstart) via a groupby shift — no per-doc Python loop. 64-bit
    gram hashing stands in for string equality (collision odds documented
    in FIXTURES.md §hashing; the SQL oracle uses true string grams, so a
    collision would surface as a value mismatch)."""
    from data_exchange_routing_ray.hashing import stable_hash_strings
    from data_exchange_routing_ray.pipelines.events_cdc import _documents

    NB = 64

    def partial(b: pa.Table) -> pa.Table:
        flat, _doc_of, lens = _tokenize_flat(b["text"])
        th = stable_hash_strings(flat) if flat.size else np.zeros(0, np.uint64)
        doc_ids = b["doc_id"].to_numpy()
        offsets = np.concatenate([[0], np.cumsum(lens)])

        n_starts = np.maximum(lens - (n_gram - 1), 0)
        tot = int(n_starts.sum())
        if tot:
            base = np.repeat(offsets[:-1], n_starts)
            cum = np.concatenate([[0], np.cumsum(n_starts)])[:-1]
            intra = np.arange(tot) - np.repeat(cum, n_starts)
            idx0 = base + intra
            with np.errstate(over="ignore"):
                gh = th[idx0].copy()
                for j in range(1, n_gram):
                    gh = gh * _G5_MIX + th[idx0 + j]
            gdoc = np.repeat(doc_ids, n_starts)
            gram_rows = pd.DataFrame(
                {
                    "bucket": (gh % np.uint64(NB)).astype(np.int64),
                    "gh": gh.astype(np.int64),
                    "doc_id": gdoc,
                    "pos": intra,
                    "n_tokens": np.int64(-1),
                }
            )
        else:
            gram_rows = pd.DataFrame(
                {
                    "bucket": pd.Series([], dtype=np.int64),
                    "gh": pd.Series([], dtype=np.int64),
                    "doc_id": pd.Series([], dtype=np.int64),
                    "pos": pd.Series([], dtype=np.int64),
                    "n_tokens": pd.Series([], dtype=np.int64),
                }
            )
        nz = lens > 0
        meta = pd.DataFrame(
            {
                "bucket": NB
                + (
                    (doc_ids[nz].astype(np.uint64) * np.uint64(2654435761))
                    % np.uint64(NB)
                ).astype(np.int64),
                "gh": np.int64(0),
                "doc_id": doc_ids[nz],
                "pos": np.int64(-1),
                "n_tokens": lens[nz],
            }
        )
        return pa.Table.from_pandas(
            pd.concat([gram_rows, meta], ignore_index=True), preserve_index=False
        )

    def mark_dups(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["bucket"].iloc[0])
        if b >= NB:  # doc-meta rows pass through to exchange 2 unchanged
            out = g[["doc_id", "pos", "n_tokens"]].copy()
            out["bucket2"] = b - NB
            return out
        dup = g[g.duplicated("gh", keep=False)]
        out = dup[["doc_id", "pos"]].copy()
        out["n_tokens"] = np.int64(-1)
        out["bucket2"] = (
            (out["doc_id"].to_numpy().astype(np.uint64) * np.uint64(2654435761))
            % np.uint64(NB)
        ).astype(np.int64)
        return out

    def coverage(g: pd.DataFrame) -> pd.DataFrame:
        meta = g[g["pos"] < 0]
        starts = g[g["pos"] >= 0].sort_values(["doc_id", "pos"])
        if len(starts):
            prev = starts.groupby("doc_id")["pos"].shift(1)
            delta = (starts["pos"] - prev).fillna(n_gram)
            contrib = np.minimum(n_gram, delta.to_numpy())
            cov = (
                pd.DataFrame({"doc_id": starts["doc_id"].to_numpy(), "c": contrib})
                .groupby("doc_id", as_index=False)["c"]
                .sum()
            )
        else:
            cov = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64), "c": []})
        out = meta[["doc_id", "n_tokens"]].merge(cov, on="doc_id", how="left")
        out["n_dup_span_tokens"] = out["c"].fillna(0).astype(np.int64)
        out["kept_fraction"] = round_half_away(
            (out["n_tokens"] - out["n_dup_span_tokens"]) / out["n_tokens"], 6
        )
        return out[["doc_id", "n_tokens", "n_dup_span_tokens", "kept_fraction"]]

    out = (
        _documents(sf_dir, columns=["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(mark_dups, batch_format="pandas")
        .groupby("bucket2")
        .map_groups(coverage, batch_format="pandas")
        .to_pandas()
    )
    return pa.Table.from_pandas(
        out.sort_values("doc_id").reset_index(drop=True), preserve_index=False
    )


DUP_SPAN_EXCISE_SQL = r"""
WITH tokarr AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
                     x -> x <> '') AS arr
  FROM documents
), tok AS (
  SELECT doc_id, unnest(arr) AS w, unnest(range(len(arr))) AS pos FROM tokarr
), grams AS (
  SELECT doc_id, pos,
         w || ' ' || lead(w, 1) OVER wd || ' ' || lead(w, 2) OVER wd
           || ' ' || lead(w, 3) OVER wd || ' ' || lead(w, 4) OVER wd AS g5
  FROM tok WINDOW wd AS (PARTITION BY doc_id ORDER BY pos)
), g AS (SELECT doc_id, pos, g5 FROM grams WHERE g5 IS NOT NULL),
dupg AS (SELECT g5 FROM g GROUP BY g5 HAVING count(*) >= 2),
starts AS (SELECT doc_id, pos FROM g WHERE g5 IN (SELECT g5 FROM dupg)),
cov AS (
  SELECT DISTINCT t.doc_id, t.pos
  FROM starts s JOIN tok t
    ON t.doc_id = s.doc_id AND t.pos BETWEEN s.pos AND s.pos + 4
), covn AS (SELECT doc_id, count(*) AS n FROM cov GROUP BY doc_id),
meta AS (SELECT doc_id, len(arr) AS n_tokens FROM tokarr WHERE len(arr) > 0)
SELECT m.doc_id, CAST(m.n_tokens AS BIGINT) AS n_tokens,
       CAST(COALESCE(c.n, 0) AS BIGINT) AS n_dup_span_tokens,
       round((m.n_tokens - COALESCE(c.n, 0)) * 1.0 / m.n_tokens, 6)
         AS kept_fraction
FROM meta m LEFT JOIN covn c USING (doc_id) ORDER BY m.doc_id
"""


# ------------------------------------ cross-epoch streaming LSH dedup index

@ray.remote(num_cpus=0.5)
class _LSHIndexShard:
    """One shard of the survivor LSH index: band-key → owner doc_id for the
    key-hash range assigned to this actor. State is the INDEX OF SURVIVORS
    only (dup docs are never inserted), sharded across actors by key hash —
    the bounded, partitioned mutable state the Dataset API can't express
    (SURVEY §2 custom-operator rule (b))."""

    def __init__(self) -> None:
        self._owner: dict[int, int] = {}

    def probe(self, keys: np.ndarray) -> np.ndarray:
        """Pre-epoch owners for each key (-1 if absent)."""
        own = self._owner
        return np.array([own.get(int(k), -1) for k in keys], np.int64)

    def insert(self, keys: np.ndarray, docs: np.ndarray) -> int:
        own = self._owner
        for k, d in zip(keys.tolist(), docs.tolist()):
            if k not in own:
                own[k] = d
        return len(own)


def stream_dedup_lsh_epochs(
    sf_dir: str, n_epochs: int = 4, n_shards: int = 8,
    num_perm: int = 64, bands: int = 16,
) -> pa.Table:
    """Streaming MinHash-LSH dedup across CDC epochs: documents arrive in
    ``n_epochs`` doc_id-ordered epochs; each epoch's docs probe a
    persistent survivor index (band-key → first owner) held on sharded
    actors, and only NON-duplicate docs are inserted — so a near-dup
    landing three epochs after its original is still caught (the
    cross-epoch state is the point; a per-epoch batch dedup would miss
    it).

    Dup rule (deterministic, serially replicable — the pytest oracle
    implements it independently): doc D is a duplicate iff any of its band
    keys (a) already has an owner in the pre-epoch index, or (b) is shared
    with a smaller doc_id in the same epoch; dup_of = min such owner.
    Within-epoch chains resolve by doc_id order, exactly like the batch
    LSH clustering's first-wins survivorship.

    100 TB shape: per epoch, ONE band-key-hash exchange of (key, doc_id)
    pairs (24 B/row, never text — same wire format as
    ``make_minhash_band_stage(with_sig=False)``); probe groups are
    co-sharded with the index actors so each group makes one actor call;
    the per-doc any-band reduce is a second small exchange of (doc_id,
    owner) pairs. Index memory = survivors × bands × 16 B sharded over
    ``n_shards`` actors."""
    from data_exchange_routing_ray.functions.dedup import (
        _band_keys,
        minhash_signatures,
    )
    from data_exchange_routing_ray.pipelines.events_cdc import _documents

    hi = int(_documents(sf_dir, columns=["doc_id"]).max("doc_id"))
    bounds = [((hi + 1) * i) // n_epochs for i in range(n_epochs)] + [hi + 1]
    # shard count changes only key placement, never the dup decision
    n_shards = cap_actor_pool(n_shards)
    shards = [_LSHIndexShard.remote() for _ in range(n_shards)]

    def band_rows(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        sig = minhash_signatures(texts, k=3, num_perm=num_perm)
        keys = _band_keys(sig, bands)  # (n_docs, bands) int64
        docs = b["doc_id"].to_numpy()
        n = docs.size
        flat_keys = keys.ravel()
        # band id folded into the key so identical rows in different bands
        # don't collide across band tables
        band_ids = np.tile(np.arange(bands, dtype=np.int64), n)
        with np.errstate(over="ignore"):
            fk = (
                flat_keys.astype(np.uint64)
                * np.uint64(0x9E3779B97F4A7C15)
                + band_ids.astype(np.uint64)
            ).astype(np.int64)
        return pa.table(
            {
                "shard": pa.array(
                    (fk.astype(np.uint64) % np.uint64(n_shards)).astype(np.int64)
                ),
                "key": pa.array(fk),
                "doc_id": pa.array(np.repeat(docs, bands)),
            }
        )

    all_dups: list[pd.DataFrame] = []
    for e in range(n_epochs):
        lo, up = bounds[e], bounds[e + 1]
        # materialized: probe AND insert consume these rows, and they are
        # the already-reduced wire format (24 B/row, one epoch's docs) —
        # re-deriving signatures for the insert pass would double the
        # epoch's CPU cost for no memory win
        epoch = (
            _documents(sf_dir, columns=["doc_id", "text"])
            .filter(expr=f"doc_id >= {lo} and doc_id < {up}")
            .map_batches(band_rows, batch_format="pyarrow")
            .materialize()
        )

        def probe_group(g: pd.DataFrame) -> pd.DataFrame:
            sh = int(g["shard"].iloc[0])
            keys = g["key"].to_numpy()
            docs = g["doc_id"].to_numpy()
            pre = ray.get(shards[sh].probe.remote(keys))
            # within-epoch: min doc_id per key is the tentative owner
            df = pd.DataFrame({"key": keys, "doc_id": docs, "pre": pre})
            kmin = df.groupby("key")["doc_id"].transform("min")
            owner = np.where(df["pre"] >= 0, df["pre"], kmin)
            evid = owner < df["doc_id"]
            return pd.DataFrame(
                {
                    "doc_id": df["doc_id"][evid],
                    "owner": owner[evid],
                    "shard": sh,
                    "key": df["key"][evid],
                }
            )

        hits = (
            epoch.groupby("shard")
            .map_groups(probe_group, batch_format="pandas")
            .to_pandas()
        )
        if len(hits):
            dup = hits.groupby("doc_id", as_index=False)["owner"].min()
        else:
            dup = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                "owner": pd.Series([], dtype=np.int64)})
        dup["epoch"] = e
        all_dups.append(dup)
        dup_set = set(dup["doc_id"].tolist())
        dup_ref = ray.put(np.array(sorted(dup_set), np.int64))

        def insert_group(g: pd.DataFrame) -> pd.DataFrame:
            sh = int(g["shard"].iloc[0])
            dups = ray.get(dup_ref)
            keep = ~np.isin(g["doc_id"].to_numpy(), dups)
            n = ray.get(
                shards[sh].insert.remote(
                    g["key"].to_numpy()[keep], g["doc_id"].to_numpy()[keep]
                )
            )
            return pd.DataFrame({"shard": [sh], "n_keys": [n]})

        # barrier: epoch e fully inserted before epoch e+1 probes
        epoch.groupby("shard").map_groups(
            insert_group, batch_format="pandas"
        ).materialize()

    out = pd.concat(all_dups, ignore_index=True)
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["owner"] = out["owner"].astype(np.int64)
    out["epoch"] = out["epoch"].astype(np.int64)
    out = out.rename(columns={"owner": "dup_of"})
    return pa.Table.from_pandas(
        out.sort_values("doc_id").reset_index(drop=True), preserve_index=False
    )


# --------------------------------------------- context-budget suffix trim

def conv_context_budget_trim(sf_dir: str, budget_chars: int = 48) -> pa.Table:
    """Context-window truncation (the serving-side sibling of
    ``conv_context_windows``): for each conversation's FINAL state, keep
    the longest SUFFIX of turns whose cumulative text length fits the
    budget — exactly what an agent runtime does before a model call.
    Emits per conv the turn census and kept char count (exact ints; the
    oracle is float-free).

    100 TB shape: same LWW combiner → ONE conv-hash exchange as the other
    conv ops; the suffix scan is a reversed groupby-cumsum over the
    bucket-sorted frame — no per-conversation loop."""
    from data_exchange_routing_ray.pipelines.events_cdc import (
        conv_live,
        conv_partial_cols,
        derived_change_stream,
    )

    def partial(b: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(
            conv_partial_cols(b, ["text"]), preserve_index=False
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        live = conv_live(g)
        ln = live["text"].str.len().fillna(0).astype(np.int64)
        rev = live.iloc[::-1]
        revcum = (
            pd.DataFrame(
                {"conv_id": rev["conv_id"].to_numpy(), "ln": ln.iloc[::-1].to_numpy()}
            )
            .groupby("conv_id", sort=False)["ln"]
            .cumsum()
            .to_numpy()[::-1]
        )
        keep = revcum <= budget_chars
        df = pd.DataFrame(
            {
                "conv_id": live["conv_id"].to_numpy(),
                "one": np.ones(len(live), np.int64),
                "k": keep.astype(np.int64),
                "kc": np.where(keep, ln.to_numpy(), 0),
            }
        )
        out = df.groupby("conv_id", as_index=False).agg(
            n_turns=("one", "sum"),
            kept_turns=("k", "sum"),
            kept_chars=("kc", "sum"),
        )
        out["dropped_turns"] = out["n_turns"] - out["kept_turns"]
        return out[
            ["conv_id", "n_turns", "kept_turns", "dropped_turns", "kept_chars"]
        ]

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


CONV_CONTEXT_BUDGET_TRIM_SQL_TAIL = """
, last AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY seq DESC) AS rn
  FROM ch
), fs AS (
  SELECT conv_id, turn_idx, text FROM last WHERE rn = 1 AND op <> 'delete'
), rc AS (
  SELECT conv_id,
         length(text) AS ln,
         sum(length(text)) OVER (PARTITION BY conv_id ORDER BY turn_idx DESC
                                 ROWS UNBOUNDED PRECEDING) AS revcum
  FROM fs
)
SELECT conv_id,
       count(*) AS n_turns,
       CAST(sum(CASE WHEN revcum <= 48 THEN 1 ELSE 0 END) AS BIGINT)
         AS kept_turns,
       CAST(count(*) - sum(CASE WHEN revcum <= 48 THEN 1 ELSE 0 END) AS BIGINT)
         AS dropped_turns,
       CAST(sum(CASE WHEN revcum <= 48 THEN ln ELSE 0 END) AS BIGINT)
         AS kept_chars
FROM rc GROUP BY conv_id ORDER BY conv_id
"""


# ------------------------------------------ event-time regression audit

def conv_event_time_regression(sf_dir: str) -> pa.Table:
    """Out-of-order event-time audit per conversation: replaying the
    change stream in arrival (seq) order, count change events whose event
    time ``ts`` regresses below the conversation's running maximum — the
    late-data profile that sizes watermark allowances (§2.8). Emits per
    conv the event count, late count and max regression in exact µs.

    100 TB shape: ONE conv-hash exchange (the combiner CANNOT pre-reduce
    here — every change event participates, so the partial only buckets);
    in-bucket the running max is a per-conv ``cummax`` over the seq-sorted
    frame — vectorized, no Python loop. Late-only rows never leave the
    bucket; output is one row per conversation."""
    from data_exchange_routing_ray.pipelines.events_cdc import derived_change_stream

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "conv_id": b["conv_id"].to_numpy(zero_copy_only=False),
                "seq": b["seq"].to_numpy(),
                "ts": b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
            }
        )
        uid = df["conv_id"].str[5:].astype(np.int64).to_numpy()
        df["bucket"] = (
            (uid.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(64)
        ).astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "seq"], kind="stable")
        prevmax = (
            g.groupby("conv_id", sort=False)["ts"].cummax().shift(1)
        )
        first = ~g["conv_id"].duplicated()
        reg = (prevmax - g["ts"]).fillna(0).astype(np.int64)
        reg[first | (reg < 0)] = 0
        df = pd.DataFrame(
            {
                "conv_id": g["conv_id"].to_numpy(),
                "one": np.ones(len(g), np.int64),
                "late": (reg > 0).astype(np.int64).to_numpy(),
                "reg": reg.to_numpy(),
            }
        )
        return df.groupby("conv_id", as_index=False).agg(
            n_events=("one", "sum"),
            n_late=("late", "sum"),
            max_regression_us=("reg", "max"),
        )

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


CONV_EVENT_TIME_REGRESSION_SQL_TAIL = """
, r AS (
  SELECT conv_id, ts,
         max(ts) OVER (PARTITION BY conv_id ORDER BY seq
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prevmax
  FROM ch
)
SELECT conv_id, count(*) AS n_events,
       CAST(sum(CASE WHEN prevmax > ts THEN 1 ELSE 0 END) AS BIGINT)
         AS n_late,
       CAST(COALESCE(max(CASE WHEN prevmax > ts
                     THEN date_diff('microsecond', ts, prevmax) END), 0)
            AS BIGINT) AS max_regression_us
FROM r GROUP BY conv_id ORDER BY conv_id
"""


# ------------------------------------ quantized late-interaction retrieval

def ann_maxsim_topk(sf_dir: str, k: int = 10, vecs_per_doc: int = 8) -> pa.Table:
    """Late-interaction retrieval (ColBERT-style MaxSim) over int8-quantized
    vectors: token-vectors group into docs (``vec_id // vecs_per_doc``),
    the 4 query token-vectors are rows vec_id ∈ {1,3,5,7} of the same
    table, and score(doc) = Σ_q max_{v∈doc} ⟨q8, v8⟩ with q8 = round(q·127)
    — integer dot products, so scores are EXACT int64 and the SQL oracle
    comparison is float-free (the production int8-quantization trick doing
    double duty as determinism).

    100 TB shape: queries broadcast once per task closure (4×64 int64);
    per-batch partial computes one (n,64)@(64,4) integer matmul and
    reduces to per-(doc, query) maxes BEFORE the wire (docs straddling
    block boundaries re-max in the fold); ONE doc-hash bucket exchange of
    4 ints/doc; per-bucket exact top-k partials; driver merges ≤64·k
    rows."""
    from data_exchange_routing_ray.pipelines.events_cdc import _read_sized
    import os as _os

    path = _os.path.join(sf_dir, "embeddings.parquet")
    import pyarrow.parquet as _pq

    qtab = _pq.read_table(path, columns=["vec_id", "embedding"])
    qsel = pc.is_in(qtab["vec_id"], value_set=pa.array([1, 3, 5, 7]))
    qrows = qtab.filter(qsel).sort_by("vec_id")
    qmat = np.stack(
        [np.asarray(v, np.float64) for v in qrows["embedding"].to_pylist()]
    )
    q8 = round_half_away(qmat * 127.0, 0).astype(np.int64)  # (4, 64)

    def partial(b: pa.Table) -> pa.Table:
        from data_exchange_routing_ray.functions.similarity import list_col_matrix

        vid = b["vec_id"].to_numpy()
        x = list_col_matrix(b["embedding"])
        v8 = round_half_away(x * 127.0, 0).astype(np.int64)
        dots = v8 @ q8.T  # (n, 4) exact int64
        doc = (vid // vecs_per_doc).astype(np.int64)
        df = pd.DataFrame(
            {"doc_id": doc, "m0": dots[:, 0], "m1": dots[:, 1],
             "m2": dots[:, 2], "m3": dots[:, 3]}
        ).groupby("doc_id", as_index=False).max()
        df["bucket"] = (
            (df["doc_id"].to_numpy().astype(np.uint64) * np.uint64(2654435761))
            % np.uint64(64)
        ).astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("doc_id", as_index=False)[["m0", "m1", "m2", "m3"]].max()
        m["score"] = m[["m0", "m1", "m2", "m3"]].sum(axis=1).astype(np.int64)
        m = m.sort_values(["score", "doc_id"], ascending=[False, True]).head(k)
        return m[["doc_id", "score"]]

    out = (
        _read_sized(path, columns=["vec_id", "embedding"], min_blocks=16)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
        .sort_values(["score", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["score"] = out["score"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


ANN_MAXSIM_TOPK_SQL = """
WITH q AS (
  SELECT vec_id AS qid,
         list_transform(embedding, x -> CAST(round(x * 127) AS BIGINT)) AS qv
  FROM embeddings WHERE vec_id IN (1, 3, 5, 7)
), v AS (
  SELECT vec_id // 8 AS doc_id,
         list_transform(embedding, x -> CAST(round(x * 127) AS BIGINT)) AS vv
  FROM embeddings
), d AS (
  SELECT v.doc_id, q.qid,
         max(CAST(list_dot_product(v.vv, q.qv) AS BIGINT)) AS m
  FROM v CROSS JOIN q GROUP BY v.doc_id, q.qid
), s AS (
  SELECT doc_id, CAST(sum(m) AS BIGINT) AS score FROM d GROUP BY doc_id
)
SELECT doc_id, score FROM s ORDER BY score DESC, doc_id LIMIT 10
"""
