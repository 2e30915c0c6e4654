"""Round-3 widening batch G: training-data curation + retrieval fusion.

- ``dsir_importance_weights`` — DSIR-style data selection (Xie et al.
  2023, "Data Selection for Language Models via Importance Resampling"):
  hashed-unigram bag-of-words language models for a target corpus and a
  raw corpus, per-doc importance weight = log p_tgt(doc) − log p_raw(doc),
  top-k raw docs selected. The published method's hashed n-gram trick is
  exactly what makes it distributable: the "model" is a fixed-size bucket
  count vector, never a vocabulary.
- ``curriculum_order_bins`` — curriculum data ordering: difficulty bins
  (NTILE over a length score) with a deterministic within-bin shuffle,
  emitting a global curriculum position per doc. The training-loader
  ordering contract (easy→hard with intra-bin randomization) computed as
  a distributed exact rank, no global sort materialization.
- ``hybrid_rrf_fusion`` — hybrid retrieval: BM25 lexical ranking fused
  with a quantized dense-embedding ranking by Reciprocal Rank Fusion
  (Cormack et al. 2009), the standard lexical+dense ensemble.

Reference parity: the reference routes and validates documents but has no
curation stage (`fn-redactor/Function.kt` is a stub); these are the
training-data additions the task brief lists as first-class. Every
operator documents its 100 TB shape inline.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from data_exchange_routing_ray.hashing import round_half_away

_DSIR_BUCKETS = 1024


class _BucketHasher:
    """token → hash bucket via DuckDB's ``md5_number_lower`` contract
    (= int.from_bytes(md5(token)[8:16], 'little')), with a bounded
    token→bucket cache reused across batches (the actor-pool
    setup-once-score-many shape; web-scale vocab is unbounded so the
    cache drops rather than LRU-tracks past the cap)."""

    _CACHE_CAP = 1 << 20

    def __init__(self, buckets: int = _DSIR_BUCKETS) -> None:
        self._cache: dict[str, int] = {}
        self._buckets = buckets

    def buckets_of(self, uniq: np.ndarray) -> np.ndarray:
        cache, B = self._cache, self._buckets
        can_grow = len(cache) < self._CACHE_CAP
        out = np.empty(uniq.size, np.int64)
        for i, t in enumerate(uniq):
            b = cache.get(t)
            if b is None:
                b = (
                    int.from_bytes(
                        hashlib.md5(t.encode("utf-8")).digest()[8:16], "little"
                    )
                    % B
                )
                if can_grow:
                    cache[t] = b
            out[i] = b
        return out


# --------------------------------------------- DSIR importance resampling


def dsir_importance_weights(
    sf_dir: str, target_lang: str = "en", k: int = 200
) -> pa.Table:
    """Hashed-unigram importance weights for data selection (DSIR).

    Pass 1 (one scan): per-batch token→bucket counts tagged by corpus
    (target = ``lang == target_lang``, raw = the rest) → a ≤2·B-row
    grouped reduce (B = 1024 buckets — the "LM" is fixed-size whatever
    the corpus). Pass 2: the two count vectors broadcast as a B-float
    log-ratio table inside the task closure; per-doc weight is a
    vectorized segment-sum of ``logratio[bucket(token)]`` over raw docs
    only — embarrassingly parallel, zero exchange. Top-k by (rounded
    weight, doc_id) folds per-block k-partials at the driver (≤blocks·k
    rows).

    100 TB shape: the only exchange is the 1024-row bucket reduce; raw
    text never leaves the scans; ranking is on 6-dp-rounded weights so
    the SQL oracle's float summation order cannot flip the cut."""
    from data_exchange_routing_ray.pipelines.events_cdc import _documents
    from data_exchange_routing_ray.pipelines.widen4 import _tokenize_flat

    B = _DSIR_BUCKETS

    class CountBuckets(_BucketHasher):
        def __call__(self, b: pa.Table) -> pa.Table:
            flat, doc_of, _ = _tokenize_flat(b["text"])
            uniq, inv = np.unique(flat, return_inverse=True)
            tok_bucket = self.buckets_of(uniq)[inv]
            is_tgt = (
                pc.equal(b["lang"], target_lang).to_numpy(zero_copy_only=False)
            )[doc_of]
            n_tgt = np.bincount(tok_bucket[is_tgt], minlength=B)
            n_raw = np.bincount(tok_bucket[~is_tgt], minlength=B)
            nz = (n_tgt > 0) | (n_raw > 0)
            return pa.table(
                {
                    "b": pa.array(np.flatnonzero(nz).astype(np.int64)),
                    "n_tgt": pa.array(n_tgt[nz].astype(np.int64)),
                    "n_raw": pa.array(n_raw[nz].astype(np.int64)),
                }
            )

    from ray.data.aggregate import Sum

    counts = (
        _documents(sf_dir, columns=["text", "lang"])
        .map_batches(CountBuckets, concurrency=(1, 8), batch_format="pyarrow")
        .groupby("b")
        .aggregate(Sum("n_tgt", alias_name="n_tgt"), Sum("n_raw", alias_name="n_raw"))
        .to_pandas()
    )
    n_tgt = np.zeros(B, np.int64)
    n_raw = np.zeros(B, np.int64)
    bi = counts["b"].to_numpy()
    n_tgt[bi] = counts["n_tgt"].to_numpy()
    n_raw[bi] = counts["n_raw"].to_numpy()
    t_tgt, t_raw = int(n_tgt.sum()), int(n_raw.sum())
    # add-1 smoothed log-likelihood ratio per bucket (B floats, broadcast
    # in the closure — never per batch)
    logratio = np.log((n_tgt + 1.0) / (t_tgt + B)) - np.log(
        (n_raw + 1.0) / (t_raw + B)
    )

    class ScoreDocs(_BucketHasher):
        def __call__(self, b: pa.Table) -> pa.Table:
            raw_mask = pc.not_equal(b["lang"], target_lang)
            b = b.filter(raw_mask)
            if b.num_rows == 0:
                return pa.table(
                    {
                        "doc_id": pa.array([], pa.int64()),
                        "n_tokens": pa.array([], pa.int64()),
                        "dsir_weight": pa.array([], pa.float64()),
                    }
                )
            flat, doc_of, lens = _tokenize_flat(b["text"])
            uniq, inv = np.unique(flat, return_inverse=True)
            w = logratio[self.buckets_of(uniq)][inv]
            tot = np.bincount(doc_of, weights=w, minlength=b.num_rows)
            n_tok = np.bincount(doc_of, minlength=b.num_rows).astype(np.int64)
            keep = n_tok > 0
            df = pd.DataFrame(
                {
                    "doc_id": b["doc_id"].to_numpy()[keep],
                    "n_tokens": n_tok[keep],
                    "dsir_weight": round_half_away(tot[keep], 6),
                }
            )
            # per-block top-k partial: only k rows per block reach the fold
            return pa.Table.from_pandas(
                df.sort_values(
                    ["dsir_weight", "doc_id"], ascending=[False, True]
                ).head(k),
                preserve_index=False,
            )

    out = (
        _documents(sf_dir, columns=["doc_id", "text", "lang"])
        .map_batches(ScoreDocs, concurrency=(1, 8), batch_format="pyarrow")
        .to_pandas()
        .sort_values(["dsir_weight", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


DSIR_IMPORTANCE_WEIGHTS_SQL = r"""
WITH tok AS (
  SELECT doc_id, lang,
         unnest(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+')) AS w
  FROM documents
), t AS (
  SELECT doc_id, lang,
         CAST(md5_number_lower(w) % 1024 AS BIGINT) AS b
  FROM tok WHERE w <> ''
), counts AS (
  SELECT b,
         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n_tgt,
         sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS n_raw
  FROM t GROUP BY b
), totals AS (
  SELECT sum(n_tgt) AS t_tgt, sum(n_raw) AS t_raw FROM counts
)
SELECT t.doc_id, count(*) AS n_tokens,
       round(sum(ln((c.n_tgt + 1.0) / (tot.t_tgt + 1024.0))
               - ln((c.n_raw + 1.0) / (tot.t_raw + 1024.0))), 6) AS dsir_weight
FROM t JOIN counts c USING (b) CROSS JOIN totals tot
WHERE t.lang <> 'en'
GROUP BY t.doc_id
ORDER BY dsir_weight DESC, doc_id LIMIT 200
"""


# ------------------------------------------------- curriculum ordering


def curriculum_order_bins(sf_dir: str, bins: int = 8) -> pa.Table:
    """Curriculum data ordering: NTILE difficulty bins over a length score
    with a deterministic (md5) within-bin shuffle → global curriculum
    position per doc (the easy→hard loader ordering with intra-bin
    randomization).

    Distributed exact rank, never a global sort materialization:
    (1) a bounded per-``n_chars`` census (distinct lengths ≤ max doc
    length) folds to cumulative offsets at the driver; (2) ONE
    length-hash exchange ranks doc_ids within each equal-length run →
    global (n_chars, doc_id) rank → NTILE bin by the exact SQL sizing
    rule; (3) a (bin, md5-first-hex) census (bins×16 rows) plus ONE
    (bin, hex) exchange assigns within-bin md5 order → curriculum_pos =
    prefix offset + in-bucket rank. At 100 TB widen the md5 prefix to 2-3
    chars so each sub-bucket stays block-sized; all censuses stay tiny."""
    from data_exchange_routing_ray.pipelines.events_cdc import _documents

    from ray.data.aggregate import Sum

    docs = _documents(sf_dir, columns=["doc_id", "n_chars"])

    def len_census(b: pa.Table) -> pa.Table:
        vals, cnt = np.unique(b["n_chars"].to_numpy(), return_counts=True)
        return pa.table(
            {"n_chars": pa.array(vals.astype(np.int64)),
             "n": pa.array(cnt.astype(np.int64))}
        )

    census = (
        docs.map_batches(len_census, batch_format="pyarrow")
        .groupby("n_chars")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("n_chars")
    )
    lens = census["n_chars"].to_numpy()
    cnts = census["n"].to_numpy()
    n_total = int(cnts.sum())
    offsets = dict(zip(lens.tolist(), np.r_[0, np.cumsum(cnts)[:-1]].tolist()))

    q, rm = divmod(n_total, bins)

    def ntile_of(rank0: np.ndarray) -> np.ndarray:
        # SQL NTILE sizing: first (n % bins) tiles hold (q+1) rows
        head = rm * (q + 1)
        out = np.where(
            rank0 < head,
            rank0 // max(q + 1, 1),
            rm + np.where(q > 0, (rank0 - head) // max(q, 1), 0),
        )
        return out.astype(np.int64) + 1  # 1-indexed like SQL

    def tag_bucket(b: pa.Table) -> pa.Table:
        nc = b["n_chars"].to_numpy()
        return b.append_column(
            "lb", pa.array(((nc.astype(np.uint64) * np.uint64(2654435761)) %
                            np.uint64(64)).astype(np.int64))
        )

    def rank_in_len(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n_chars", "doc_id"], kind="stable")
        local = g.groupby("n_chars").cumcount().to_numpy()
        base = g["n_chars"].map(offsets).to_numpy()
        rank0 = base + local
        bin_ = ntile_of(rank0)
        md5s = [
            hashlib.md5(str(int(d)).encode()).hexdigest() for d in g["doc_id"]
        ]
        return pd.DataFrame(
            {"doc_id": g["doc_id"].to_numpy(), "bin": bin_,
             "md5": np.array(md5s, object)}
        )

    binned = (
        docs.map_batches(tag_bucket, batch_format="pyarrow")
        .groupby("lb")
        .map_groups(rank_in_len, batch_format="pandas")
        .materialize()
    )

    def bin_hex_census(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"bin": b["bin"].to_numpy(),
             "h1": [m[0] for m in b["md5"].to_pylist()]}
        )
        out = df.groupby(["bin", "h1"], as_index=False).size()
        out = out.rename(columns={"size": "n"})
        return pa.Table.from_pandas(out, preserve_index=False)

    ch = (
        binned.map_batches(bin_hex_census, batch_format="pyarrow")
        .groupby(["bin", "h1"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["bin", "h1"])
    )
    starts = np.r_[0, np.cumsum(ch["n"].to_numpy())[:-1]]
    offset2 = {
        (int(b), h): int(s)
        for b, h, s in zip(ch["bin"], ch["h1"], starts)
    }

    def pos_in_bin(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["md5", "doc_id"], kind="stable").reset_index(drop=True)
        key = (int(g["bin"].iloc[0]), g["md5"].iloc[0][0])
        pos = offset2[key] + np.arange(len(g)) + 1
        return pd.DataFrame(
            {"doc_id": g["doc_id"].to_numpy(),
             "bin": g["bin"].to_numpy().astype(np.int64),
             "curriculum_pos": pos.astype(np.int64)}
        )

    def tag2(b: pa.Table) -> pa.Table:
        h1 = pa.array([m[0] for m in b["md5"].to_pylist()], pa.string())
        return b.append_column("h1", h1)

    out = (
        binned.map_batches(tag2, batch_format="pyarrow")
        .groupby(["bin", "h1"])
        .map_groups(pos_in_bin, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


CURRICULUM_ORDER_BINS_SQL = """
WITH ranked AS (
  SELECT doc_id, ntile(8) OVER (ORDER BY n_chars, doc_id) AS bin
  FROM documents
)
SELECT doc_id, bin,
       row_number() OVER (
         ORDER BY bin, md5(CAST(doc_id AS VARCHAR)), doc_id
       ) AS curriculum_pos
FROM ranked ORDER BY doc_id
"""


# ------------------------------------------------ hybrid RRF retrieval


def hybrid_rrf_fusion(
    sf_dir: str, k: int = 20, depth: int = 50, rrf_k: int = 60
) -> pa.Table:
    """Hybrid retrieval: BM25 lexical list fused with a dense-embedding
    list by Reciprocal Rank Fusion — score(d) = Σ_lists 1/(rrf_k + rank).

    Lexical side: the existing two-pass BM25 plan (stats partials → one
    vectorized scoring map; candidate set bounded by term selectivity).
    Dense side: int8-quantized dot products against one broadcast query
    vector — EXACT int64 scores (the ann_maxsim determinism trick), so
    dense ranks are float-free; per-block top-``depth`` partials fold at
    the driver (≤blocks·depth rows). Fusion itself touches only
    2·depth (doc, rank) pairs — driver-side by construction, bounded.

    100 TB shape: both sides stream; nothing but slim candidate rows and
    k-partials cross the wire; ranks come from 6-dp-rounded BM25 and
    exact integer dots, so the SQL oracle ranks identically."""
    import os

    import pyarrow.parquet as pq

    from data_exchange_routing_ray.pipelines.events_cdc import (
        _read_sized,
        bm25_score_docs,
    )

    bm = bm25_score_docs(sf_dir).to_pandas()
    bm = bm.sort_values(["bm25", "doc_id"], ascending=[False, True]).head(depth)
    bm_rank = np.arange(1, len(bm) + 1)

    path = os.path.join(sf_dir, "embeddings.parquet")
    qtab = pq.read_table(path, columns=["vec_id", "embedding"])
    qrow = qtab.filter(pc.equal(qtab["vec_id"], 2))
    q8 = round_half_away(
        np.asarray(qrow["embedding"].to_pylist()[0], np.float64) * 127.0, 0
    ).astype(np.int64)

    def dense_partial(b: pa.Table) -> pa.Table:
        from data_exchange_routing_ray.functions.similarity import list_col_matrix

        x = list_col_matrix(b["embedding"])
        v8 = round_half_away(x * 127.0, 0).astype(np.int64)
        s = v8 @ q8
        df = pd.DataFrame({"doc_id": b["vec_id"].to_numpy(), "s": s})
        return pa.Table.from_pandas(
            df.sort_values(["s", "doc_id"], ascending=[False, True]).head(depth),
            preserve_index=False,
        )

    dn = (
        _read_sized(path, columns=["vec_id", "embedding"], min_blocks=16)
        .map_batches(dense_partial, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["s", "doc_id"], ascending=[False, True])
        .head(depth)
    )
    dn_rank = np.arange(1, len(dn) + 1)

    contrib = pd.concat(
        [
            pd.DataFrame(
                {"doc_id": bm["doc_id"].to_numpy(), "c": 1.0 / (rrf_k + bm_rank)}
            ),
            pd.DataFrame(
                {"doc_id": dn["doc_id"].to_numpy(), "c": 1.0 / (rrf_k + dn_rank)}
            ),
        ],
        ignore_index=True,
    )
    fused = contrib.groupby("doc_id", as_index=False)["c"].sum()
    fused["rrf"] = round_half_away(fused["c"].to_numpy(), 6)
    out = (
        fused.sort_values(["rrf", "doc_id"], ascending=[False, True])
        .head(k)[["doc_id", "rrf"]]
        .reset_index(drop=True)
    )
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


# --------------------------------------------- merge-on-read deletion vectors


def lake_deletion_vectors(sf_dir: str, n_files: int = 8) -> pa.Table:
    """Delta-Lake-style DELETION VECTORS: predicate deletes materialize as
    per-file row-position bitmaps (sidecars), base parquet stays
    byte-identical — merge-on-read deletes without rewrite amplification.

    Two delete passes exercise DV creation AND DV update (versioned: v2 =
    v1 ∪ new positions, written as a NEW sidecar file — old versions stay
    readable for time travel, exactly the manifest-archive idiom of
    `state/manifest.py`). Readers apply the latest DV as a vectorized
    boolean mask at scan. Engine-side asserts: base files byte-identical
    (size + mtime) through both deletes, DV popcounts equal matched-row
    counts, v1 sidecars still present after v2.

    100 TB shape: each pass is one distributed task per file (position
    bitmap = n_rows/8 bytes, ~2 MB for a 128 MB block file); nothing but
    the per-file census rows reach the driver. Reference parity: the
    reference's per-object `deleteIfExists` (`RouteIngestedFile.kt`)
    generalized to columnar files where a row delete must not rewrite the
    object."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from data_exchange_routing_ray.pipelines.events_cdc import _events

    def write_base(g: pd.DataFrame, d: str) -> pd.DataFrame:
        g = g.sort_values("event_id", kind="stable")  # stable row positions
        pfile = int(g["pfile"].iloc[0])
        path = os.path.join(d, f"part-{pfile:04d}.parquet")
        pq.write_table(
            pa.Table.from_pandas(
                g.drop(columns=["pfile"]), preserve_index=False
            ),
            path,
        )
        return pd.DataFrame({"pfile": [pfile], "n_rows": [len(g)]})

    def dv_path(d: str, pfile: int, version: int) -> str:
        return os.path.join(d, f"part-{pfile:04d}.dv.v{version}")

    def apply_delete(args) -> dict:
        """One task per file: mask = predicate positions ∪ previous DV;
        write the next DV version. Base file is never touched."""
        d, pfile, version, pred_id = args
        path = os.path.join(d, f"part-{pfile:04d}.parquet")
        t = pq.read_table(path)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        val = t["value"].to_numpy()
        uid = t["user_id"].to_numpy()
        if pred_id == 1:
            mask = (et == "click") & (val < 50.0)
        else:
            mask = uid % 10 == 3
        new_matches = int(mask.sum())
        if version > 1:
            prev = np.unpackbits(
                np.frombuffer(open(dv_path(d, pfile, version - 1), "rb").read(),
                              np.uint8)
            )[: len(mask)].astype(bool)
            mask = mask | prev
        with open(dv_path(d, pfile, version), "wb") as f:
            f.write(np.packbits(mask).tobytes())
        return {
            "pfile": pfile,
            "version": version,
            "matched": new_matches,
            "dv_popcount": int(mask.sum()),
        }

    with tempfile.TemporaryDirectory(prefix="cdcdv-") as d:
        def tag(b: pa.Table) -> pa.Table:
            return b.append_column(
                "pfile",
                pa.array((b["user_id"].to_numpy() % n_files).astype(np.int64)),
            )

        base = (
            _events(sf_dir)
            .map_batches(tag, batch_format="pyarrow")
            .groupby("pfile")
            .map_groups(lambda g: write_base(g, d), batch_format="pandas")
            .to_pandas()
        )
        files = sorted(base["pfile"].tolist())
        stat0 = {
            p: (os.path.getsize(os.path.join(d, f"part-{p:04d}.parquet")),
                os.path.getmtime(os.path.join(d, f"part-{p:04d}.parquet")))
            for p in files
        }

        # two delete passes, each one distributed task per file
        dv1 = [
            ray.get(r)
            for r in [
                ray.remote(apply_delete).remote((d, p, 1, 1)) for p in files
            ]
        ]
        dv2 = [
            ray.get(r)
            for r in [
                ray.remote(apply_delete).remote((d, p, 2, 2)) for p in files
            ]
        ]
        stat1 = {
            p: (os.path.getsize(os.path.join(d, f"part-{p:04d}.parquet")),
                os.path.getmtime(os.path.join(d, f"part-{p:04d}.parquet")))
            for p in files
        }
        assert stat0 == stat1, "deletion vectors must never rewrite base files"
        for p in files:  # v1 sidecars survive the v2 update (time travel)
            assert os.path.exists(dv_path(d, p, 1))
        by_f1 = {r["pfile"]: r for r in dv1}
        for r in dv2:
            assert r["dv_popcount"] >= by_f1[r["pfile"]]["dv_popcount"]

        def read_with_dv(pfile: int) -> pa.Table:
            t = pq.read_table(os.path.join(d, f"part-{pfile:04d}.parquet"),
                              columns=["event_type", "value"])
            dv = np.unpackbits(
                np.frombuffer(open(dv_path(d, pfile, 2), "rb").read(), np.uint8)
            )[: t.num_rows].astype(bool)
            t = t.filter(pa.array(~dv))
            cents = round_half_away(t["value"].to_numpy() * 100.0, 0).astype(
                np.int64
            )
            df = pd.DataFrame(
                {"event_type": t["event_type"].to_numpy(zero_copy_only=False),
                 "cents": cents}
            )
            return pa.Table.from_pandas(
                df.groupby("event_type", as_index=False).agg(
                    n_rows=("cents", "size"), sum_value_cents=("cents", "sum")
                ),
                preserve_index=False,
            )

        parts = ray.get([ray.remote(read_with_dv).remote(p) for p in files])
        out = (
            pa.concat_tables(parts)
            .to_pandas()
            .groupby("event_type", as_index=False)
            .sum()
            .sort_values("event_type")
            .reset_index(drop=True)
        )
        out["n_rows"] = out["n_rows"].astype(np.int64)
        out["sum_value_cents"] = out["sum_value_cents"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)


LAKE_DELETION_VECTORS_SQL = """
SELECT event_type, count(*) AS n_rows,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
         AS sum_value_cents
FROM events
WHERE NOT (event_type = 'click' AND value < 50)
  AND NOT (user_id % 10 = 3)
GROUP BY event_type ORDER BY event_type
"""


# ------------------------------------------------ partition-spec evolution


def lake_partition_evolution(sf_dir: str, window_days: int = 3) -> pa.Table:
    """Iceberg-style PARTITION-SPEC EVOLUTION: the stream starts under
    spec v1 (``day=Y-m-d``), the spec evolves mid-history, and later data
    lands under spec v2 (``type=T/day=Y-m-d``) — old files are NEVER
    rewritten; one logical table spans both specs and readers prune each
    file by ITS OWN spec.

    The probe query (one event type over a day window straddling the
    evolution point) prunes v2 files on (type, day) but v1 files on day
    only — the v1 side pays a row-level type filter, exactly Iceberg's
    documented behavior for pre-evolution files. Engine asserts: no v2
    file outside the target type/window was opened, pruned-file count <
    total, and v1 files were pruned by day alone.

    100 TB shape: writes are streamed groupbys (one task per partition
    dir); the probe opens O(matching dirs) files; the spec registry is a
    2-row manifest. Reference parity: the date-partition folder template
    (`Common.kt:231-250`) is spec v1 verbatim; evolution is what a fleet
    does when the folder scheme must change without a historical
    rewrite."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from data_exchange_routing_ray.pipelines.events_cdc import _events
    from data_exchange_routing_ray.pipelines.widen5 import _ts_bounds_us

    lo, hi = _ts_bounds_us(sf_dir)
    cut_us = (lo + hi) // 2
    w_lo = cut_us - window_days * 86_400_000_000
    w_hi = cut_us + window_days * 86_400_000_000

    def day_of(ts_us: np.ndarray) -> np.ndarray:
        return (
            ts_us.astype("datetime64[us]")
            .astype("datetime64[D]")
            .astype("datetime64[us]")
            .astype(np.int64)
        )

    def day_str(day_us: np.ndarray) -> pd.Series:
        return pd.Series(day_us.astype("datetime64[us]")).dt.strftime("%Y-%m-%d")

    with tempfile.TemporaryDirectory(prefix="cdcspec-") as d:
        os.makedirs(os.path.join(d, "spec1"))
        os.makedirs(os.path.join(d, "spec2"))

        def tag(b: pa.Table) -> pa.Table:
            ts_us = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            day = day_str(day_of(ts_us))
            spec = np.where(ts_us < cut_us, 1, 2).astype(np.int64)
            return (
                b.append_column("day", pa.array(day.to_numpy(), pa.string()))
                .append_column("spec", pa.array(spec))
            )

        def write_part(g: pd.DataFrame) -> pd.DataFrame:
            spec = int(g["spec"].iloc[0])
            day = g["day"].iloc[0]
            if spec == 1:
                path = os.path.join(d, "spec1", f"day={day}")
            else:
                et = g["event_type"].iloc[0]
                path = os.path.join(d, "spec2", f"type={et}", f"day={day}")
            os.makedirs(path, exist_ok=True)
            pq.write_table(
                pa.Table.from_pandas(
                    g.drop(columns=["spec"]), preserve_index=False
                ),
                os.path.join(path, "part-0.parquet"),
            )
            return pd.DataFrame({"n": [len(g)]})

        tagged = _events(sf_dir).map_batches(tag, batch_format="pyarrow")
        # v1 groups by day only; v2 by (type, day) — each file under its spec
        n1 = (
            tagged.filter(expr="spec == 1")
            .groupby("day")
            .map_groups(write_part, batch_format="pandas")
            .sum("n")
        )
        n2 = (
            tagged.filter(expr="spec == 2")
            .groupby(["event_type", "day"])
            .map_groups(write_part, batch_format="pandas")
            .sum("n")
        )
        assert n1 and n2, "both specs must hold data"

        # ---- probe: event_type='purchase', day window straddling the cut
        lo_day = day_str(day_of(np.array([w_lo])))[0]
        hi_day = day_str(day_of(np.array([w_hi])))[0]

        v1_all = sorted(os.listdir(os.path.join(d, "spec1")))
        v1_open = [
            os.path.join(d, "spec1", x, "part-0.parquet")
            for x in v1_all
            if lo_day <= x.split("=", 1)[1] <= hi_day
        ]
        v2_type_dir = os.path.join(d, "spec2", "type=purchase")
        v2_days = sorted(os.listdir(v2_type_dir)) if os.path.isdir(v2_type_dir) else []
        v2_open = [
            os.path.join(v2_type_dir, x, "part-0.parquet")
            for x in v2_days
            if lo_day <= x.split("=", 1)[1] <= hi_day
        ]
        total_v2 = sum(
            len(days)
            for t in os.listdir(os.path.join(d, "spec2"))
            for days in [os.listdir(os.path.join(d, "spec2", t))]
        )
        assert len(v2_open) < total_v2, "v2 spec must prune on (type, day)"
        assert len(v1_open) < len(v1_all), "v1 spec must prune on day"

        def probe(path_spec) -> pa.Table:
            path, spec = path_spec
            t = pq.read_table(path, columns=["event_type", "ts", "value", "day"])
            ts_us = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            keep = (ts_us >= w_lo) & (ts_us < w_hi)
            if spec == 1:  # pre-evolution files pay the row-level type filter
                keep &= (
                    t["event_type"].to_numpy(zero_copy_only=False) == "purchase"
                )
            t = t.filter(pa.array(keep))
            cents = round_half_away(t["value"].to_numpy() * 100.0, 0).astype(
                np.int64
            )
            df = pd.DataFrame(
                {"day": t["day"].to_numpy(zero_copy_only=False), "cents": cents}
            )
            g = df.groupby("day", as_index=False).agg(
                n_rows=("cents", "size"), sum_value_cents=("cents", "sum")
            )
            # explicit schema: an empty partition must concat cleanly
            return pa.table(
                {
                    "day": pa.array(g["day"].astype(str), pa.string()),
                    "n_rows": pa.array(g["n_rows"].to_numpy(), pa.int64()),
                    "sum_value_cents": pa.array(
                        g["sum_value_cents"].to_numpy(), pa.int64()
                    ),
                }
            )

        tasks = [(p, 1) for p in v1_open] + [(p, 2) for p in v2_open]
        parts = ray.get([ray.remote(probe).remote(t) for t in tasks])
        out = (
            pa.concat_tables(parts)
            .to_pandas()
            .groupby("day", as_index=False)
            .sum()
            .sort_values("day")
            .reset_index(drop=True)
        )
        out = out[out["n_rows"] > 0]
        out["n_rows"] = out["n_rows"].astype(np.int64)
        out["sum_value_cents"] = out["sum_value_cents"].astype(np.int64)
        return pa.Table.from_pandas(
            out.reset_index(drop=True), preserve_index=False
        )


LAKE_PARTITION_EVOLUTION_SQL = """
WITH bounds AS (
  SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS cut FROM events
)
SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n_rows,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
         AS sum_value_cents
FROM events, bounds
WHERE event_type = 'purchase'
  AND epoch_us(ts) >= cut - 3 * 86400000000
  AND epoch_us(ts) <  cut + 3 * 86400000000
GROUP BY day ORDER BY day
"""


# --------------------------------------- incremental join-view maintenance


def incr_join_view_maintenance(sf_dir: str) -> pa.Table:
    """Incrementally-maintained JOIN VIEW (delta-join maintenance): the
    materialized view ``revenue per market segment = orders ⋈ customer``
    is bootstrapped once, then a change batch (deletes of orderkeys
    divisible by 97, inserts of ×1.1-priced copies of orderkeys divisible
    by 101) is applied as a DELTA JOIN — only the change rows join the
    dimension (broadcast ray.put, the J1/J2 shape) and their signed
    contributions splice onto the cached per-segment aggregates; the base
    fact table is never rescanned.

    Money is integer cents end-to-end (cents = round-half-away(price·100))
    so splice == full-recompute is EXACT, asserted in-query — a float
    view would drift under incremental ± splicing. This is the view-
    maintenance analog of `incremental_agg_recompute` (changed partitions
    only) with a JOIN in the view definition.

    100 TB shape: bootstrap = one scan with per-batch partials (segments
    census only crosses the wire); each maintenance epoch costs O(change
    batch), zero fact rescan; dim side broadcast once per epoch."""
    import os

    import ray as _ray

    from ray.data.aggregate import Sum

    from data_exchange_routing_ray.pipelines.events_cdc import _read_sized

    cust = pd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    )
    seg_ref = _ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

    def orders():
        return _read_sized(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_custkey", "o_totalprice"],
        )

    def agg_partial(df: pd.DataFrame) -> pa.Table:
        g = df.groupby("c_mktsegment", as_index=False).agg(
            n_orders=("sign", "sum"), revenue_cents=("cents", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def bootstrap(b: pa.Table) -> pa.Table:
        seg = _ray.get(seg_ref)
        df = pd.DataFrame(
            {
                "c_mktsegment": pd.Series(b["o_custkey"].to_numpy()).map(seg),
                "cents": round_half_away(
                    b["o_totalprice"].to_numpy() * 100.0, 0
                ).astype(np.int64),
                "sign": np.ones(b.num_rows, np.int64),
            }
        )
        return agg_partial(df)

    def fold(ds) -> pd.DataFrame:
        return (
            ds.groupby("c_mktsegment")
            .aggregate(
                Sum("n_orders", alias_name="n_orders"),
                Sum("revenue_cents", alias_name="revenue_cents"),
            )
            .to_pandas()
        )

    view = fold(orders().map_batches(bootstrap, batch_format="pyarrow"))

    def delta(b: pa.Table) -> pa.Table:
        """change batch → signed delta contributions (the only rows that
        move): deletes carry −1/−cents, inserts +1/+cents·1.1."""
        seg = _ray.get(seg_ref)
        okey = b["o_orderkey"].to_numpy()
        price = b["o_totalprice"].to_numpy()
        segs = pd.Series(b["o_custkey"].to_numpy()).map(seg).to_numpy()
        frames = []
        del_m = okey % 97 == 0
        if del_m.any():
            frames.append(
                pd.DataFrame(
                    {
                        "c_mktsegment": segs[del_m],
                        "cents": -round_half_away(
                            price[del_m] * 100.0, 0
                        ).astype(np.int64),
                        "sign": np.full(int(del_m.sum()), -1, np.int64),
                    }
                )
            )
        ins_m = okey % 101 == 0
        if ins_m.any():
            frames.append(
                pd.DataFrame(
                    {
                        "c_mktsegment": segs[ins_m],
                        "cents": round_half_away(
                            price[ins_m] * 1.1 * 100.0, 0
                        ).astype(np.int64),
                        "sign": np.ones(int(ins_m.sum()), np.int64),
                    }
                )
            )
        if not frames:
            return pa.table(
                {
                    "c_mktsegment": pa.array([], pa.string()),
                    "n_orders": pa.array([], pa.int64()),
                    "revenue_cents": pa.array([], pa.int64()),
                }
            )
        return agg_partial(pd.concat(frames, ignore_index=True))

    deltas = fold(orders().map_batches(delta, batch_format="pyarrow"))
    spliced = (
        pd.concat([view, deltas], ignore_index=True)
        .groupby("c_mktsegment", as_index=False)
        .sum()
    )

    # in-query gate: splice == full recompute over the modified table
    def full_modified(b: pa.Table) -> pa.Table:
        seg = _ray.get(seg_ref)
        okey = b["o_orderkey"].to_numpy()
        price = b["o_totalprice"].to_numpy()
        segs = pd.Series(b["o_custkey"].to_numpy()).map(seg).to_numpy()
        keep = okey % 97 != 0
        ins = okey % 101 == 0
        df = pd.concat(
            [
                pd.DataFrame(
                    {
                        "c_mktsegment": segs[keep],
                        "cents": round_half_away(
                            price[keep] * 100.0, 0
                        ).astype(np.int64),
                    }
                ),
                pd.DataFrame(
                    {
                        "c_mktsegment": segs[ins],
                        "cents": round_half_away(
                            price[ins] * 1.1 * 100.0, 0
                        ).astype(np.int64),
                    }
                ),
            ],
            ignore_index=True,
        )
        df["sign"] = np.ones(len(df), np.int64)
        return agg_partial(df)

    full = fold(orders().map_batches(full_modified, batch_format="pyarrow"))
    a = spliced.sort_values("c_mktsegment").reset_index(drop=True)
    f = full.sort_values("c_mktsegment").reset_index(drop=True)
    assert a.equals(f), "incremental splice must equal full recompute"

    a["n_orders"] = a["n_orders"].astype(np.int64)
    a["revenue_cents"] = a["revenue_cents"].astype(np.int64)
    return pa.Table.from_pandas(a, preserve_index=False)


INCR_JOIN_VIEW_MAINTENANCE_SQL = """
WITH modified AS (
  SELECT o_custkey, o_totalprice FROM orders WHERE o_orderkey % 97 <> 0
  UNION ALL
  SELECT o_custkey, o_totalprice * 1.1 FROM orders WHERE o_orderkey % 101 = 0
)
SELECT c_mktsegment, count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM modified m JOIN customer c ON m.o_custkey = c.c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# --------------------------------------------------- crypto-shred erasure


def _conv_key(conv_id: str) -> bytes:
    """Deterministic per-conversation data key (in production: a KMS-held
    random key; deterministic here so tests replay — the SHREDDING
    mechanics are identical either way)."""
    return hashlib.sha256(b"tenant-key|" + conv_id.encode()).digest()


def _keystream(key: bytes, turn_idx: int, nbytes: int) -> bytes:
    """CTR-style keystream: md5(key ‖ turn ‖ counter) blocks, truncated to
    the payload length. md5 is C-speed (the add_md5_fingerprint idiom);
    payloads are turn-sized so blocks-per-row is tiny."""
    blocks = (nbytes + 15) // 16
    return b"".join(
        hashlib.md5(
            key + turn_idx.to_bytes(4, "little") + i.to_bytes(4, "little")
        ).digest()
        for i in range(blocks)
    )[:nbytes]


def _keystream_xor(key: bytes, turn_idx: int, data: bytes) -> bytes:
    """Single-row keystream XOR (numpy over the byte buffer, never a
    per-byte Python loop)."""
    ks = _keystream(key, turn_idx, len(data))
    return (
        np.frombuffer(data, np.uint8) ^ np.frombuffer(ks, np.uint8)
    ).tobytes()


def _xor_rows(keys: list, turns, payloads: list) -> list:
    """Vectorized many-row keystream XOR: generate every row's keystream
    (per-block C-speed md5 — the irreducible part), then ONE numpy XOR
    over the concatenated buffer and split at the row offsets. No per-row
    (let alone per-byte) Python XOR loop."""
    if not payloads:
        return []
    lens = np.fromiter((len(p) for p in payloads), np.int64, len(payloads))
    buf = np.frombuffer(b"".join(payloads), np.uint8)
    ks = np.frombuffer(
        b"".join(
            _keystream(k, int(t), int(n))
            for k, t, n in zip(keys, turns, lens)
        ),
        np.uint8,
    )
    out = (buf ^ ks).tobytes()
    offs = np.concatenate(([0], np.cumsum(lens)))
    return [out[offs[i]: offs[i + 1]] for i in range(len(payloads))]


def crypto_shred_erasure(sf_dir: str, erase_mod: int = 37) -> pa.Table:
    """GDPR right-to-be-forgotten via CRYPTO-SHREDDING: the lake stores the
    ``text`` payload ENCRYPTED under per-conversation keys; erasure =
    deleting the key — the data files (including archived epochs, branch
    copies, backups) never need rewriting, which is the only erasure that
    scales when history is immutable (the manifest-archive design of this
    lake keeps every epoch's files!).

    Flow: final state via the LWW combiner → ONE conv-hash exchange;
    per-bucket the fold encrypts each turn (keystream XOR under the
    conv key) and writes the ENCRYPTED bucket file + the plaintext digest
    census; the key table then drops convs with ``uid % erase_mod == 0``;
    the read path decrypts only keyed convs and re-derives each digest.
    Engine asserts: every stored ciphertext differs from its plaintext,
    erased convs' rows ARE still present in storage (bit-rot-proof but
    unreadable), and every readable conv's post-decrypt digest equals its
    pre-encryption digest (round-trip proof).

    100 TB shape: encryption rides the existing merge exchange (zero
    extra shuffles); the key table is O(convs) — the only thing erasure
    ever touches. Reference parity: the reference's `deleteIfExists`
    cleanup generalized to immutable-file lakes."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from data_exchange_routing_ray.pipelines.events_cdc import (
        conv_live,
        conv_partial_cols,
        derived_change_stream,
    )

    with tempfile.TemporaryDirectory(prefix="cdcshred-") as d:

        def partial(b: pa.Table) -> pa.Table:
            return pa.Table.from_pandas(
                conv_partial_cols(b, ["text"]), preserve_index=False
            )

        def encrypt_fold(g: pd.DataFrame) -> pd.DataFrame:
            live = conv_live(g).sort_values(
                ["conv_id", "turn_idx"], kind="stable"
            )
            bucket = int(g["bucket"].iloc[0])
            digests = [
                (conv, len(grp),
                 hashlib.md5("\n".join(grp["text"].tolist()).encode()).hexdigest())
                for conv, grp in live.groupby("conv_id", sort=True)
            ]
            # vectorized encrypt: one key derivation per conv, one batched
            # keystream XOR over the whole bucket (no per-turn Python XOR)
            kcache = {c: _conv_key(c) for c in live["conv_id"].unique()}
            payloads = [x.encode() for x in live["text"]]
            cts = _xor_rows(
                [kcache[c] for c in live["conv_id"]],
                live["turn_idx"].to_numpy(),
                payloads,
            )
            assert all(ct != p for ct, p in zip(cts, payloads)), (
                "ciphertext must differ"
            )
            enc = pa.table(
                {
                    "conv_id": pa.array(live["conv_id"].tolist(), pa.string()),
                    "turn_idx": pa.array(
                        [int(t) for t in live["turn_idx"]], pa.int32()
                    ),
                    "ct": pa.array(cts, pa.binary()),
                }
            )
            pq.write_table(enc, os.path.join(d, f"enc-{bucket:04d}.parquet"))
            return pd.DataFrame(
                digests, columns=["conv_id", "n_turns", "plain_md5"]
            )

        census = (
            derived_change_stream(sf_dir)
            .map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(encrypt_fold, batch_format="pandas")
            .to_pandas()
        )
        plain_of = dict(zip(census["conv_id"], census["plain_md5"]))

        # key table: conv → key; ERASURE deletes rows, nothing else
        uids = census["conv_id"].str[5:].astype(np.int64)
        erased = set(census["conv_id"][(uids % erase_mod) == 0])
        keys = {
            c: _conv_key(c) for c in census["conv_id"] if c not in erased
        }
        assert erased, "the erasure cohort must be non-empty"
        keys_ref = ray.put(keys)

        def decrypt_read(path: str) -> pd.DataFrame:
            kmap = ray.get(keys_ref)
            t = pq.read_table(path)
            df = t.to_pandas()
            keyed = df["conv_id"].isin(kmap)
            n_stored_erased = int((~keyed).sum())
            df = df[keyed].sort_values(
                ["conv_id", "turn_idx"], kind="stable"
            )
            rows = []
            if len(df):
                # vectorized decrypt: ONE batched keystream XOR over the
                # whole file's keyed rows, then per-conv digests over the
                # already-ordered plaintexts (no per-turn Python XOR loop)
                plains = _xor_rows(
                    [kmap[c] for c in df["conv_id"]],
                    df["turn_idx"].to_numpy(),
                    [bytes(ct) for ct in df["ct"]],
                )
                df = df.assign(_plain=plains)
                for conv, grp in df.groupby("conv_id", sort=True):
                    texts = [p.decode() for p in grp["_plain"]]
                    rows.append(
                        (
                            conv,
                            len(texts),
                            hashlib.md5("\n".join(texts).encode()).hexdigest(),
                            n_stored_erased,
                        )
                    )
            if not rows:
                # sentinel row so an all-erased bucket still reports its
                # stored-but-unreadable count (dropped before output)
                rows = [(None, 0, None, n_stored_erased)]
            out = pd.DataFrame(
                rows, columns=["conv_id", "n_turns", "text_md5", "_stored_erased"]
            )
            out["_stored_erased"] = n_stored_erased
            return out

        files = sorted(
            os.path.join(d, f) for f in os.listdir(d) if f.startswith("enc-")
        )
        parts = ray.get(
            [ray.remote(decrypt_read).remote(p) for p in files]
        )
        out = pd.concat(parts, ignore_index=True)
        # erased convs are still IN storage (shredded, not deleted) ...
        stored_erased = sum(
            int(p["_stored_erased"].iloc[0]) if len(p) else 0 for p in parts
        )
        assert stored_erased > 0, "erased convs must remain in storage"
        out = out.dropna(subset=["conv_id"])[
            ["conv_id", "n_turns", "text_md5"]
        ]
        # ... but absent from the readable output
        assert not set(out["conv_id"]) & erased
        # round-trip proof: decrypt(encrypt(x)) digests equal plaintext digests
        for c, m in zip(out["conv_id"], out["text_md5"]):
            assert plain_of[c] == m, f"round-trip digest mismatch for {c}"
        out = out.sort_values("conv_id").reset_index(drop=True)
        out["n_turns"] = out["n_turns"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)


CRYPTO_SHRED_ERASURE_SQL_TAIL = """
, last AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY seq DESC) AS rn
  FROM ch
), fs AS (
  SELECT conv_id, turn_idx, text FROM last WHERE rn = 1 AND op <> 'delete'
)
SELECT conv_id, count(*) AS n_turns,
       md5(string_agg(text, chr(10) ORDER BY turn_idx)) AS text_md5
FROM fs
WHERE CAST(substr(conv_id, 6) AS BIGINT) % 37 <> 0
GROUP BY conv_id ORDER BY conv_id
"""


# ------------------------------------------------ PSI distribution drift


def psi_value_drift(sf_dir: str, n_bins: int = 10) -> pa.Table:
    """Population-Stability-Index drift monitor between the stream's first
    and second half (event-time midpoint split) — the standard
    model/feature monitoring statistic, here over ``events.value`` in
    fixed width-10 bins. PSI contribution per bin =
    (p₁−p₂)·ln(p₁/p₂) with +0.5/bin smoothing.

    100 TB shape: ONE scan emitting a ≤2·n_bins-row census per block
    (bounded regardless of input size) → one tiny grouped reduce; the
    PSI algebra runs on the driver over n_bins rows. Zero data-sized
    exchanges — the cheapest possible drift monitor, and the per-epoch
    hook the CDC lineage log would call between commits."""
    from ray.data.aggregate import Sum

    from data_exchange_routing_ray.pipelines.events_cdc import _events
    from data_exchange_routing_ray.pipelines.widen5 import _ts_bounds_us

    lo, hi = _ts_bounds_us(sf_dir)
    cut = (lo + hi) // 2

    def census(b: pa.Table) -> pa.Table:
        ts_us = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        half = (ts_us >= cut).astype(np.int64)
        v = b["value"].to_numpy()
        bins = np.clip(np.floor(v / 10.0).astype(np.int64), 0, n_bins - 1)
        key = half * n_bins + bins
        cnt = np.bincount(key, minlength=2 * n_bins)
        nz = cnt > 0
        idx = np.flatnonzero(nz)
        return pa.table(
            {
                "half": pa.array((idx // n_bins).astype(np.int64)),
                "bin": pa.array((idx % n_bins).astype(np.int64)),
                "n": pa.array(cnt[nz].astype(np.int64)),
            }
        )

    c = (
        _events(sf_dir, columns=["ts", "value"])
        .map_batches(census, batch_format="pyarrow")
        .groupby(["half", "bin"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    n1 = np.zeros(n_bins, np.int64)
    n2 = np.zeros(n_bins, np.int64)
    for h, b_, n in zip(c["half"], c["bin"], c["n"]):
        (n1 if h == 0 else n2)[b_] = n
    t1, t2 = int(n1.sum()), int(n2.sum())
    p1 = (n1 + 0.5) / (t1 + 0.5 * n_bins)
    p2 = (n2 + 0.5) / (t2 + 0.5 * n_bins)
    contrib = (p1 - p2) * np.log(p1 / p2)
    present = (n1 + n2) > 0
    out = pd.DataFrame(
        {
            "bin": np.arange(n_bins, dtype=np.int64)[present],
            "n_first": n1[present],
            "n_second": n2[present],
            "psi_contrib": round_half_away(contrib[present], 6),
        }
    )
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


PSI_VALUE_DRIFT_SQL = """
WITH bounds AS (
  SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS cut FROM events
), b AS (
  SELECT LEAST(GREATEST(CAST(floor(value / 10) AS BIGINT), 0), 9) AS bin,
         CASE WHEN epoch_us(ts) < cut THEN 0 ELSE 1 END AS half
  FROM events, bounds
), c AS (
  SELECT bin,
         sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS n_first,
         sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS n_second
  FROM b GROUP BY bin
), t AS (SELECT sum(n_first) AS t1, sum(n_second) AS t2 FROM c)
SELECT bin, CAST(n_first AS BIGINT) AS n_first,
       CAST(n_second AS BIGINT) AS n_second,
       round(((n_first + 0.5) / (t1 + 5.0) - (n_second + 0.5) / (t2 + 5.0))
             * ln(((n_first + 0.5) / (t1 + 5.0))
                  / ((n_second + 0.5) / (t2 + 5.0))), 6) AS psi_contrib
FROM c CROSS JOIN t ORDER BY bin
"""


# ------------------------------------------------------ semantic dedup


def semantic_dedup_clusters(
    sf_dir: str, n_clusters: int = 16, theta: float = 0.3
) -> pa.Table:
    """SemDeDup-style SEMANTIC deduplication (Abbas et al. 2023): k-means
    clusters the embedding space, then near-duplicates are searched ONLY
    within each cluster — pairwise cosine is confined to cluster-local
    blocks instead of the quadratic corpus. Keep rule: drop vec v iff
    some kept u < v in the same cluster has cos(u, v) ≥ θ (the
    keep-lowest-id convention shared with this repo's MinHash family).

    100 TB shape: centroids fit on a bounded sample (seeded Lloyd,
    broadcast once); assignment is one scan; ONE cluster-key exchange;
    per-cluster work is |cluster|² bounded by cluster granularity — at
    scale raise n_clusters so clusters stay block-sized (SemDeDup's own
    recipe: 50k clusters for 5B embeddings). no-oracle op (iterative
    k-means is not SQL-expressible); pinned by a serial-reference
    equality pytest + a planted-duplicate recall pytest."""
    import os

    from data_exchange_routing_ray.functions.similarity import (
        IVFIndex,
        _normalize,
    )
    from data_exchange_routing_ray.pipelines.events_cdc import _embeddings

    idx = IVFIndex(num_clusters=n_clusters, iters=8, seed=42).fit(
        _embeddings(sf_dir)
    )
    c_ref = ray.put(idx.centroids)

    def assign(b: pa.Table) -> pa.Table:
        C = ray.get(c_ref)
        from data_exchange_routing_ray.functions.similarity import (
            _normalize,
            list_col_matrix,
        )

        M = _normalize(list_col_matrix(b["embedding"]))
        cl = np.argmax(M @ C.T, axis=1).astype(np.int64)
        return pa.table(
            {
                "vec_id": b["vec_id"],
                "cluster": pa.array(cl),
                "embedding": b["embedding"],
            }
        )

    def dedup_cluster(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id", kind="stable").reset_index(drop=True)
        M = _normalize(np.stack(g["embedding"].to_numpy()).astype(np.float64))
        S = M @ M.T
        n = len(g)
        dropped = np.zeros(n, bool)
        for i in range(n):
            if dropped[i]:
                continue
            # i is kept; drop every later j similar to it
            dropped[(S[i] >= theta) & (np.arange(n) > i) & ~dropped] = True
        return pd.DataFrame(
            {
                "cluster": [int(g["cluster"].iloc[0])],
                "n_vecs": [n],
                "n_dropped": [int(dropped.sum())],
            }
        )

    out = (
        _embeddings(sf_dir)
        .map_batches(assign, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(dedup_cluster, batch_format="pandas")
        .to_pandas()
        .sort_values("cluster")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


# ------------------------------------------- active-active lake convergence


def lake_active_active_converge(sf_dir: str) -> pa.Table:
    """ACTIVE-ACTIVE multi-leader replication with deterministic conflict
    resolution: two independent lakes (regional ingest sites) each commit
    their own half of the change stream (split by ``event_id % 2``), then
    anti-entropy ships each site's RAW WAL to the other site, applied with
    the fence DOWN (cross-site seqs are older than the local watermark by
    construction). Because the merge is last-writer-wins on the GLOBAL
    ``seq`` — an LWW register per (conv_id, turn_idx) — application order
    is immaterial: A(evens→odds) and B(odds→evens) must converge
    bit-for-bit, and both must equal the single-site replay of the full
    stream. Deletes propagate because the WAL (not the materialized
    state) is what ships — the classic multi-leader pitfall this op
    proves out. Both equalities are asserted in-query; the returned table
    is site A's converged state, value-checked by the plain final-state
    oracle.

    100 TB shape: two normal epochs per site (the existing one-exchange
    merge path); anti-entropy cost = shipping the other site's shards,
    embarrassingly parallel. Reference parity: the reference's
    service-bus redelivery tolerance (`host.json` dedupe) scaled up to
    whole-site WAL exchange."""
    import os
    import tempfile

    from data_exchange_routing_ray.pipelines.cdc import CDCLake
    from data_exchange_routing_ray.pipelines.events_cdc import (
        derived_change_stream,
    )

    def half(parity: int) -> ray.data.Dataset:
        def keep(b: pa.Table) -> pa.Table:
            return b.filter(
                pc.equal(pc.bit_wise_and(b["seq"], 1), pa.scalar(parity))
            )

        return derived_change_stream(sf_dir).map_batches(
            keep, batch_format="pyarrow"
        )

    with tempfile.TemporaryDirectory(prefix="cdcaa-") as d:
        site_a = CDCLake(os.path.join(d, "a"), num_partitions=16, multi_leader=True)
        site_b = CDCLake(os.path.join(d, "b"), num_partitions=16, multi_leader=True)
        single = CDCLake(os.path.join(d, "s"), num_partitions=16)

        # local ingest: each site commits only its own half
        site_a.apply_changes(half(0), quarantine=False)
        site_b.apply_changes(half(1), quarantine=False)
        # anti-entropy: ship the OTHER site's WAL; fence down (those seqs
        # are legitimately below the local watermark — not duplicates)
        site_a.apply_changes(half(1), quarantine=False, fence=False)
        site_b.apply_changes(half(0), quarantine=False, fence=False)

        single.apply_changes(derived_change_stream(sf_dir), quarantine=False)

        ta = site_a.final_table()
        tb = site_b.final_table()
        ts_ = single.final_table()
        assert ta.equals(tb), "sites must converge regardless of order"
        assert ta.equals(ts_), "converged state must equal single-site replay"
        return ta


# ------------------------------------------- row/column security view


def rls_masked_view(sf_dir: str, tenant_mod: int = 4, tenant: int = 1) -> pa.Table:
    """Governed serving view: ROW-LEVEL security (an analyst role sees only
    its tenant's conversations, ``uid % tenant_mod == tenant``) plus
    COLUMN masking (the ``text`` payload is replaced by an 8-hex md5
    digest — referenceable, joinable, unreadable). The view is computed
    over the committed final state (LWW combiner → one conv-hash
    exchange), with the predicate pushed INTO the combiner's partial
    stage so non-tenant rows never cross the wire — predicate-pushdown
    is what makes RLS cheap at scale, not a post-filter.

    100 TB shape: pushdown cuts the exchange to the tenant's share;
    masking is a vectorized per-batch md5 map. Reference parity: the
    reference's redactor stage (M10) + per-destination credential
    scoping, composed as a governed view."""
    from data_exchange_routing_ray.pipelines.events_cdc import (
        conv_live,
        conv_partial_cols,
        derived_change_stream,
    )

    def partial(b: pa.Table) -> pa.Table:
        # RLS predicate pushdown: filter BEFORE the combiner + exchange
        uid = (
            pc.cast(pc.utf8_slice_codeunits(b["conv_id"], 5, 99), pa.int64())
            .to_numpy()
        )
        b = b.filter(pa.array(uid % tenant_mod == tenant))
        return pa.Table.from_pandas(
            conv_partial_cols(b, ["role", "text"]), preserve_index=False
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        live = conv_live(g)
        if live.empty:
            return pd.DataFrame(
                {
                    "conv_id": pd.Series([], object),
                    "turn_idx": pd.Series([], np.int32),
                    "role": pd.Series([], object),
                    "text_mask": pd.Series([], object),
                }
            )
        mask = [
            hashlib.md5(t.encode()).hexdigest()[:8] for t in live["text"]
        ]
        return pd.DataFrame(
            {
                "conv_id": live["conv_id"].to_numpy(),
                "turn_idx": live["turn_idx"].to_numpy(),
                "role": live["role"].to_numpy(),
                "text_mask": np.array(mask, object),
            }
        )

    out = (
        derived_change_stream(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    out["turn_idx"] = out["turn_idx"].astype(np.int32)
    return pa.Table.from_pandas(out, preserve_index=False)


RLS_MASKED_VIEW_SQL_TAIL = """
, last AS (
  SELECT *, row_number() OVER (PARTITION BY conv_id, turn_idx
                               ORDER BY seq DESC) AS rn
  FROM ch
)
SELECT conv_id, turn_idx, role, substr(md5(text), 1, 8) AS text_mask
FROM last
WHERE rn = 1 AND op <> 'delete'
  AND CAST(substr(conv_id, 6) AS BIGINT) % 4 = 1
ORDER BY conv_id, turn_idx
"""


# ------------------------------------------- tombstone GC (gc_grace analog)


def lake_tombstone_gc(sf_dir: str) -> pa.Table:
    """Tombstone garbage collection on a multi-leader lake — the Cassandra
    ``gc_grace_seconds`` problem solved with offsets instead of wall time.

    A multi-leader lake retains deletes as tombstone rows so a stale
    cross-site insert cannot resurrect a deleted key. A tombstone's ONLY
    job is to beat writes with a lower seq; once every site's committed
    applied-offset has passed the tombstone's seq, no site can ever emit a
    new change below it, so the tombstone is dead storage. ``gc_tombstones``
    compacts those away in one OCC-fenced rebuild epoch and PERSISTS the GC
    watermark in the manifest as a floor fence — future epochs drop
    seq <= gc_watermark even in fence-free WAL-exchange mode, so the fence
    (not the tombstone) now rejects the stale write.

    The query certifies the full cycle end-to-end: ingest with deletes →
    tombstones present in raw storage → GC at the site watermark → raw
    storage tombstone-free → a stale sub-watermark insert replayed after GC
    does NOT resurrect → live state bit-identical to the LWW oracle.

    100 TB shape: the GC epoch is a streamed rebuild (read committed
    parquet → vectorized filter → the normal ONE-exchange merge path);
    no driver materialization; storage shrinks by the tombstone share.
    Reference parity: queue redelivery fencing (`host.json:26-27`)
    generalized to cross-site stale-write fencing."""
    import os
    import tempfile

    from data_exchange_routing_ray.pipelines.cdc import CDCLake, gc_tombstones
    from data_exchange_routing_ray.pipelines.events_cdc import (
        derived_change_stream,
    )

    with tempfile.TemporaryDirectory(prefix="cdcgc-") as d:
        lake = CDCLake(os.path.join(d, "gc"), num_partitions=16,
                       multi_leader=True)
        lake.apply_changes(derived_change_stream(sf_dir), quarantine=False)

        def n_tombstones() -> int:
            n = 0
            for b in lake.final_dataset_raw().iter_batches(
                batch_format="pyarrow", batch_size=65536
            ):
                if "op" in b.column_names:
                    n += int(
                        pc.sum(
                            pc.cast(
                                pc.equal(b["op"], pa.scalar("delete")),
                                pa.int64(),
                            )
                        ).as_py()
                        or 0
                    )
            return n

        pre = n_tombstones()
        assert pre > 0, "change stream must contain deletes"
        watermark = lake.manifest.applied_offset
        gc_tombstones(lake, watermark)
        assert n_tombstones() == 0, "GC at full watermark compacts every tombstone"
        assert lake.manifest.gc_watermark == watermark

        before = lake.final_table()
        # stale write below the GC floor, replayed fence-free after GC:
        # the persisted gc_watermark fence must reject it
        stale = ray.data.from_arrow(
            pa.table(
                {
                    "seq": pa.array([0], pa.int64()),
                    "op": pa.array(["insert"], pa.string()),
                    "conv_id": pa.array(["conv-0"], pa.string()),
                    "turn_idx": pa.array([0], pa.int32()),
                    "role": pa.array(["user"], pa.string()),
                    "text": pa.array(["resurrected?"], pa.string()),
                    "tool": pa.array([None], pa.string()),
                    "ts": pa.array([1], pa.timestamp("us")),
                }
            )
        )
        lake.apply_changes(stale, quarantine=False, fence=False)
        after = lake.final_table()
        assert after.equals(before), "stale write must be fenced, not applied"
        return after


# --------------------------------------- online schema migration (gh-ost)


def lake_online_migration(sf_dir: str) -> pa.Table:
    """ONLINE schema migration on a live lake — the gh-ost /
    pt-online-schema-change pattern, lake-native: migrate every row
    through a transform (here: Unicode-uppercase ``text``, standing in
    for any column rewrite) WITHOUT stopping ingest and WITHOUT a
    non-atomic in-place rewrite.

    Phases (seq-ordered thirds of the change stream = the production
    timeline; seq pushdown at the parquet scan as in
    ``cdc_final_state_multi_epoch``):

    1. P1 → main: pre-migration production state.
    2. Backfill: fork a zero-copy shadow branch, rebuild it with the
       transform applied to every live row — seqs preserved, so later
       production changes still win LWW (gh-ost's chunked row-copy is
       the per-partition parallel merge here, one atomic branch epoch).
    3. P2 → main (production never pauses) and transform(P2) → branch:
       the binlog-tail dual-apply that keeps the shadow in sync.
    4. Cutover: DISTRIBUTED per-partition parity audit — both sides
       share the partition function, so each task diffs exactly two
       co-partitioned files (transform(main_pid) == branch_pid,
       including seqs) — then ``cutover_to`` adopts the branch manifest
       atomically, WAP-gated on that audit and OCC-fenced against racing
       production commits (gh-ost's atomic rename).
    5. P3 → main: NEW writers emit already-transformed rows.

    Final state must equal the LWW oracle with ``upper(text)``
    everywhere — the migration is exact, not just convergent.

    100 TB shape: backfill and audit are per-partition parallel with no
    driver materialization; the cutover itself moves zero data (manifest
    adopt of shared files). Reference parity: the reference's TST/PRD
    environment split (CHANGELOG.md:56-57) upgraded to an audited,
    atomic production cutover."""
    import os
    import tempfile

    from data_exchange_routing_ray.pipelines.cdc import (
        CDCLake,
        _partition_specs,
        _read_folded_df,
    )
    from data_exchange_routing_ray.pipelines.events_cdc import (
        _events,
        derive_changes_batch,
    )

    def phase(lo: int, hi: int) -> ray.data.Dataset:
        return _events(
            sf_dir, columns=["event_id", "user_id", "event_type", "ts"]
        ).filter(expr=f"event_id >= {lo} and event_id < {hi}").map_batches(
            derive_changes_batch, batch_format="pyarrow"
        )

    def xform(b: pa.Table) -> pa.Table:
        return b.set_column(
            b.column_names.index("text"), "text", pc.utf8_upper(b["text"])
        )

    hi = _events(sf_dir, columns=["event_id"]).max("event_id")
    b1, b2 = (hi + 1) // 3, (2 * (hi + 1)) // 3

    with tempfile.TemporaryDirectory(prefix="cdcmig-") as d:
        main = CDCLake(os.path.join(d, "lake"), num_partitions=16)
        # P1: pre-migration production
        main.apply_changes(phase(0, b1), quarantine=False)

        # backfill the shadow branch: transform every live row, keep seqs
        mig = main.create_branch("mig")

        def backfill(b: pa.Table) -> pa.Table:
            b = xform(b)
            if "op" not in b.column_names:
                b = b.append_column(
                    "op", pa.array(["update"] * b.num_rows, pa.string())
                )
            return b

        mig.apply_changes(
            mig.final_dataset().map_batches(backfill, batch_format="pyarrow"),
            quarantine=False, fence=False, rebuild=True, max_attempts=None,
        )

        # P2: production continues on main; the migration dual-applies the
        # same changes, transformed, to the shadow (the binlog tail)
        main.apply_changes(phase(b1, b2), quarantine=False)
        mig.apply_changes(
            phase(b1, b2).map_batches(xform, batch_format="pyarrow"),
            quarantine=False,
        )

        lake_dir = main.lake_dir

        def parity_audit(cand, _lake_dir) -> None:
            cur_specs = _partition_specs(main.manifest)
            cand_specs = _partition_specs(cand)
            key = ["conv_id", "turn_idx"]

            def check(batch: pa.Table) -> pa.Table:
                rows = []
                for pid in batch["pid"].to_pylist():
                    a = _read_folded_df(lake_dir, cur_specs.get(pid))
                    bdf = _read_folded_df(lake_dir, cand_specs.get(pid))
                    if a is None and bdf is None:
                        continue
                    if a is None or bdf is None:
                        rows.append({"pid": pid, "match": False})
                        continue
                    a = a.copy()
                    a["text"] = a["text"].str.upper()
                    cols = sorted(set(a.columns) | set(bdf.columns))
                    a = (
                        a.reindex(columns=cols)
                        .sort_values(key, kind="stable")
                        .reset_index(drop=True)
                    )
                    bdf = (
                        bdf.reindex(columns=cols)
                        .sort_values(key, kind="stable")
                        .reset_index(drop=True)
                    )
                    rows.append({"pid": pid, "match": bool(a.equals(bdf))})
                if not rows:
                    return pa.table(
                        {"pid": pa.array([], pa.int64()),
                         "match": pa.array([], pa.bool_())}
                    )
                return pa.table(
                    {"pid": pa.array([r["pid"] for r in rows], pa.int64()),
                     "match": pa.array([r["match"] for r in rows], pa.bool_())}
                )

            pids = sorted(set(cur_specs) | set(cand_specs))
            res = (
                ray.data.from_items([{"pid": p} for p in pids])
                .map_batches(check, batch_size=1, batch_format="pyarrow")
                .to_pandas()
            )
            bad = res.loc[~res["match"], "pid"].tolist()
            if bad:
                raise ValueError(
                    f"cutover parity audit failed for partitions {bad}"
                )

        main.cutover_to(mig, audit_fn=parity_audit)

        # P3: post-cutover production — NEW writers emit transformed rows
        main.apply_changes(
            phase(b2, hi + 1).map_batches(xform, batch_format="pyarrow"),
            quarantine=False,
        )
        return main.final_table()


# --------------------------------------------- TIMESTAMP AS OF time travel


def lake_timestamp_asof(sf_dir: str) -> pa.Table:
    """Delta-style ``TIMESTAMP AS OF`` time travel: three seq-ordered
    epochs commit with their lineage wall-clock ``end_ts``; a timestamp
    strictly between epoch 2's and epoch 3's commit times must resolve
    (``CDCLake.epoch_as_of``) to epoch 2, and the table read AS OF that
    timestamp must equal epoch 2's archived state — i.e. the LWW final
    state of the first two-thirds of the change stream, which is what the
    oracle recomputes. Resolution at/after the last commit must return
    the current epoch; both are asserted in-query.

    100 TB shape: resolution reads ONLY the lineage log (≤ P rows per
    epoch, no data files); the as-of read then streams the archived
    manifest's files like any epoch read — time travel costs metadata,
    not data. Reference parity: the reference's ProcessingStatus reports
    carry per-stage timestamps (``PSReportEnvelope.kt:44-46``); this op
    turns that report stream into a queryable commit clock."""
    import os
    import tempfile

    from data_exchange_routing_ray.pipelines.cdc import CDCLake
    from data_exchange_routing_ray.pipelines.events_cdc import (
        _events,
        derive_changes_batch,
    )

    hi = int(_events(sf_dir, columns=["event_id"]).max("event_id"))
    bounds = [(i * (hi + 1)) // 3 for i in range(4)]

    def stream(lo: int, up: int) -> ray.data.Dataset:
        return (
            _events(sf_dir, columns=["event_id", "user_id", "event_type", "ts"])
            .filter(expr=f"event_id >= {lo} and event_id < {up}")
            .map_batches(derive_changes_batch, batch_format="pyarrow")
        )

    with tempfile.TemporaryDirectory(prefix="cdcasof-") as d:
        lake = CDCLake(os.path.join(d, "lake"), num_partitions=16)
        epochs = []
        for i in range(3):
            lake.apply_changes(stream(bounds[i], bounds[i + 1]), quarantine=False)
            epochs.append(lake.manifest.epoch)

        lin = lake.lineage.read_all()
        end_us = (
            lin["end_ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        ep = lin["epoch"].to_numpy(zero_copy_only=False).astype(np.int64)
        commit = {int(e): int(end_us[ep == e].max()) for e in epochs}
        assert commit[epochs[2]] > commit[epochs[1]], (
            "distinct commits must carry distinct wall-clock µs"
        )
        ts_between = commit[epochs[2]] - 1  # after epoch 2, before epoch 3

        resolved = lake.epoch_as_of(ts_between)
        assert resolved == epochs[1], (
            f"AS OF between commits resolved {resolved}, want {epochs[1]}"
        )
        # at/after the last commit → the current epoch
        assert lake.epoch_as_of(commit[epochs[2]]) == epochs[2]

        asof = lake.final_table(epoch=resolved)
        assert asof.equals(lake.final_table(epoch=epochs[1]))
        return asof


# ------------------------------------------ Debezium envelope source


def _write_debezium_shards(stream, shard_dir: str, prefix: str = "shard") -> int:
    """Serialize a CHANGE_SCHEMA dataset to Debezium-envelope JSONL shards
    (write-then-rename, content-addressed names — immutable once visible).
    Returns rows written. Shared by the roundtrip and tail gates."""
    import hashlib
    import json as _json
    import os

    from data_exchange_routing_ray.sources import to_debezium_envelope

    def write_shard(b: pa.Table) -> pa.Table:
        ts_us = pc.cast(b["ts"], pa.int64()).to_pylist()
        seqs = b["seq"].to_pylist()
        ops = b["op"].to_pylist()
        fields = {
            k: b[k].to_pylist()
            for k in ("conv_id", "turn_idx", "role", "text", "tool")
        }
        lines = []
        for i in range(b.num_rows):
            row = {k: v[i] for k, v in fields.items()}
            row["ts"] = ts_us[i]
            lines.append(
                _json.dumps(to_debezium_envelope(row, ops[i], seqs[i]))
            )
        blob = "\n".join(lines) + "\n"
        # WAL-segment naming: zero-padded min-seq prefix so lexical order
        # IS seq order (what a real log shipper emits); md5 suffix keeps
        # names content-addressed/idempotent
        name = hashlib.md5(blob.encode()).hexdigest()[:16]
        lo = min(seqs) if seqs else 0
        path = os.path.join(
            shard_dir, f"{prefix}-{lo:015d}-{name}.jsonl"
        )
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(blob)
        os.replace(tmp, path)
        return pa.table({"n": pa.array([b.num_rows], pa.int64())})

    return sum(
        r["n"]
        for r in stream.map_batches(
            write_shard, batch_format="pyarrow"
        ).take_all()
    )


def cdc_debezium_roundtrip(sf_dir: str) -> pa.Table:
    """Debezium-envelope interop, end-to-end: the derived change stream is
    serialized to Debezium JSONL shards (op codes c/u/d, before/after
    images, source.sequence — the de-facto binlog-to-JSON contract), read
    back through ``sources.read_debezium_jsonl``, and applied to a lake;
    the final state must equal applying the native stream (the plain
    final-state oracle). Two planted poison lines — broken JSON and an
    unknown op code — must land in quarantine carrying the PARSER's error
    (the fail-stop chain across stages: the source adapter's root cause
    outranks the validator's knock-on null-field rules).

    100 TB shape: shard-parallel text read → per-batch JSON decode (the
    unavoidable cost of the source boundary, after which everything is
    Arrow) → the normal one-exchange epoch. Reference parity: the
    reference's queue trigger consumes exactly such per-message JSON
    change documents (``fns-routing`` service-bus entry point)."""
    import hashlib
    import json as _json
    import os
    import tempfile

    from data_exchange_routing_ray.pipelines.cdc import CDCLake
    from data_exchange_routing_ray.pipelines.events_cdc import (
        derived_change_stream,
    )
    from data_exchange_routing_ray.sources import (
        read_debezium_jsonl,
        to_debezium_envelope,
    )

    with tempfile.TemporaryDirectory(prefix="cdcdbz-") as d:
        shard_dir = os.path.join(d, "wal")
        os.makedirs(shard_dir, exist_ok=True)
        n_written = _write_debezium_shards(
            derived_change_stream(sf_dir), shard_dir
        )
        # poison shard: broken JSON + an unknown op code
        with open(os.path.join(shard_dir, "shard-poison.jsonl"), "w") as f:
            f.write('{"payload": {"op": "c", "after"\n')
            f.write(
                _json.dumps(
                    {"payload": {"op": "x", "after": {"conv_id": "conv-1"},
                                 "source": {"sequence": 10**12}}}
                )
                + "\n"
            )

        files = sorted(
            os.path.join(shard_dir, f) for f in os.listdir(shard_dir)
        )
        lake = CDCLake(os.path.join(d, "lake"), num_partitions=16)
        res = lake.apply_changes(read_debezium_jsonl(files))
        assert res.rows_quarantined == 2, (
            f"want 2 poison rows, got {res.rows_quarantined}"
        )
        qt = lake.quarantine_table()
        qerrs = qt["error"].to_pylist()
        assert all(e.startswith("debezium: ") for e in qerrs), qerrs
        t = lake.final_table()
        assert n_written > 0
        return t


def cdc_debezium_tail(sf_dir: str) -> pa.Table:
    """Continuous Debezium tail, end-to-end (`CDCLake.tail_debezium`): an
    external Debezium JSONL feed arrives in TWO waves. Session 1 tails
    wave 1 and goes idle; session 2 — a FRESH CDCLake (process restart) —
    resumes from the shard ledger and applies only wave 2 (engine
    asserts: second session commits no wave-1 re-reads — zero fenced
    rows — and the ledger names every shard). Final state must equal
    applying the native stream: the plain final-state oracle.

    100 TB shape: each poll is a shard-parallel text read → per-batch
    JSON decode → the normal one-exchange epoch; the ledger is O(shards)
    names written once per epoch (the Kafka-Connect offsets analog).
    Reference parity: the reference's service-bus trigger IS a continuous
    tail of per-message JSON change documents."""
    import os
    import tempfile

    from data_exchange_routing_ray.pipelines.cdc import CDCLake
    from data_exchange_routing_ray.pipelines.events_cdc import (
        _events,
        derive_changes_batch,
    )

    hi = int(_events(sf_dir, columns=["event_id"]).max("event_id")) + 1

    def wave(lo: int, up: int):
        return (
            _events(
                sf_dir, columns=["event_id", "user_id", "event_type", "ts"]
            )
            .filter(expr=f"event_id >= {lo} and event_id < {up}")
            .map_batches(derive_changes_batch, batch_format="pyarrow")
        )

    with tempfile.TemporaryDirectory(prefix="cdcdbztail-") as d:
        shard_dir = os.path.join(d, "wal")
        lake_dir = os.path.join(d, "lake")
        os.makedirs(shard_dir, exist_ok=True)

        # wave 1 arrives; session 1 tails until idle
        _write_debezium_shards(wave(0, hi // 2), shard_dir, prefix="w1")
        lake = CDCLake(lake_dir, num_partitions=16)
        r1 = list(
            lake.tail_debezium(
                shard_dir, poll_interval=0.01, idle_polls=1, quarantine=False
            )
        )
        assert r1, "wave 1 must commit at least one epoch"
        n_w1 = len(
            [f for f in os.listdir(shard_dir) if f.endswith(".jsonl")]
        )

        # wave 2 arrives while the tailer is DOWN; a fresh session resumes
        _write_debezium_shards(wave(hi // 2, hi), shard_dir, prefix="w2")
        lake2 = CDCLake(lake_dir, num_partitions=16)
        r2 = list(
            lake2.tail_debezium(
                shard_dir, poll_interval=0.01, idle_polls=1, quarantine=False
            )
        )
        assert r2, "wave 2 must commit"
        assert all(r.changes_fenced == 0 for r in r2), (
            "ledger resume must not re-read wave-1 shards"
        )
        import json as _json

        with open(os.path.join(lake2.store.dir, "debezium-tail.json")) as f:
            ledger = set(_json.load(f)["files"])
        on_disk = {
            f for f in os.listdir(shard_dir) if f.endswith(".jsonl")
        }
        assert ledger == on_disk and len(on_disk) > n_w1
        return lake2.final_table()


def lake_replicate_follower(sf_dir: str) -> pa.Table:
    """Cascaded lake-to-lake replication (`CDCLake.replicate_from`): a
    follower lake tails the leader's changefeed through the consumer-group
    API. The leader commits three seq-sliced epochs; the follower
    replicates after epoch 1 (bootstrap: full state as inserts) and again
    after epoch 3 (ONE catch-up diff covering epochs 2-3, deletes
    included). Engine asserts: the catch-up epoch moves only changed keys
    (changes_applied < leader row count), a re-poll after catch-up is
    empty (exactly-once at the offset CAS), and the follower's final
    table must equal the leader's — the plain final-state oracle.

    100 TB shape: per poll the follower pays O(changed keys) envelope
    rows through its normal one-exchange epoch; leader state streams
    once at bootstrap only."""
    import os
    import tempfile

    from data_exchange_routing_ray.pipelines.cdc import CDCLake
    from data_exchange_routing_ray.pipelines.events_cdc import (
        _events,
        derive_changes_batch,
    )

    hi = int(_events(sf_dir, columns=["event_id"]).max("event_id")) + 1
    bounds = [(i * hi) // 3 for i in range(4)]

    def epoch_stream(i: int):
        lo, up = bounds[i], bounds[i + 1]
        return (
            _events(
                sf_dir, columns=["event_id", "user_id", "event_type", "ts"]
            )
            .filter(expr=f"event_id >= {lo} and event_id < {up}")
            .map_batches(derive_changes_batch, batch_format="pyarrow")
        )

    with tempfile.TemporaryDirectory(prefix="cdcrepl-") as d:
        leader = CDCLake(os.path.join(d, "leader"), num_partitions=16)
        follower = CDCLake(os.path.join(d, "follower"), num_partitions=8)

        leader.apply_changes(epoch_stream(0), quarantine=False)
        r1 = follower.replicate_from(leader, group="replica-1")
        assert len(r1) == 1, "bootstrap poll must commit one follower epoch"

        leader.apply_changes(epoch_stream(1), quarantine=False)
        leader.apply_changes(epoch_stream(2), quarantine=False)
        r2 = follower.replicate_from(leader, group="replica-1")
        assert len(r2) == 1, "catch-up must drain epochs 2-3 in one diff"
        n_leader = sum(
            e.rows for e in leader.manifest.partitions.values()
        )
        assert r2[0].changes_applied < n_leader, (
            "catch-up must move only changed keys, not re-stream the lake"
        )
        # already-caught-up: the next poll is a no-op
        assert follower.replicate_from(leader, group="replica-1") == []
        return follower.final_table()


def wal_ship_roundtrip(sf_dir: str) -> pa.Table:
    """Full wire-format interop loop (outbound + inbound WAL): a leader
    lake commits three seq-sliced epochs; `ship_changefeed` exports each
    epoch as one seq-ordered Debezium JSONL WAL shard (epoch 0 ships the
    full state as insert envelopes; later epochs ship only the diff,
    deletes as before-images); a DOWNSTREAM lake `tail_debezium`s the
    shard directory. Downstream final state must equal the leader's —
    the plain final-state oracle.

    Engine asserts: shipping is INCREMENTAL (the second ship call emits
    only the two new epochs' shards — the shipper's consumer offset
    CAS-tracks what already left), and one shard per epoch.

    100 TB shape: each shard streams out via iter_batches (driver holds
    one batch), carries O(changed keys) for diff epochs; the downstream
    pays the normal one-exchange epoch per shard batch."""
    import os
    import tempfile

    from data_exchange_routing_ray.pipelines.cdc import CDCLake
    from data_exchange_routing_ray.pipelines.events_cdc import (
        _events,
        derive_changes_batch,
    )

    hi = int(_events(sf_dir, columns=["event_id"]).max("event_id")) + 1
    bounds = [(i * hi) // 3 for i in range(4)]

    def epoch_stream(i: int):
        lo, up = bounds[i], bounds[i + 1]
        return (
            _events(
                sf_dir, columns=["event_id", "user_id", "event_type", "ts"]
            )
            .filter(expr=f"event_id >= {lo} and event_id < {up}")
            .map_batches(derive_changes_batch, batch_format="pyarrow")
        )

    with tempfile.TemporaryDirectory(prefix="cdcship-") as d:
        leader = CDCLake(os.path.join(d, "leader"), num_partitions=16)
        wal_dir = os.path.join(d, "wal")

        leader.apply_changes(epoch_stream(0), quarantine=False)
        s1 = leader.ship_changefeed(wal_dir)
        assert len(s1) == 1, "first ship: exactly the bootstrap shard"

        leader.apply_changes(epoch_stream(1), quarantine=False)
        leader.apply_changes(epoch_stream(2), quarantine=False)
        s2 = leader.ship_changefeed(wal_dir)
        assert len(s2) == 2, "incremental ship: only the two new epochs"
        assert leader.ship_changefeed(wal_dir) == []  # caught up

        down = CDCLake(os.path.join(d, "down"), num_partitions=8)
        rs = list(
            down.tail_debezium(
                wal_dir, poll_interval=0.01, idle_polls=1, quarantine=False
            )
        )
        assert rs and all(r.rows_quarantined == 0 for r in rs)
        return down.final_table()


# ---------------------------------- consumer-offset-driven view maintenance


def view_roles_via_consumer(sf_dir: str) -> pa.Table:
    """A per-role live-turn count view maintained PURELY from changefeed
    envelopes under consumer-group offsets: three seq-ordered epochs
    commit; after each, the 'role-view' group polls (`poll_changefeed`),
    applies signed role deltas (+after, −before; bootstrap = inserts) and
    commits its offset CAS-style. The view never reads the lake's state —
    only envelopes — yet must equal the plain per-role census of the final
    table, which is what the oracle recomputes. A replayed poll after the
    final commit must return no feed (exactly-once at epoch granularity),
    asserted in-query.

    100 TB shape: per epoch the consumer moves O(changed keys) envelope
    rows + a one-file offset CAS — the downstream-materialized-view cost
    model consumer offsets exist for. Mechanically distinct from
    `incr_view_roles` (dirty-partition re-aggregation): this is the
    delta-apply consumer, that is the storage-diff maintainer."""
    import os
    import tempfile

    from data_exchange_routing_ray.pipelines.cdc import CDCLake
    from data_exchange_routing_ray.pipelines.events_cdc import (
        _events,
        derive_changes_batch,
    )

    hi = int(_events(sf_dir, columns=["event_id"]).max("event_id"))
    bounds = [(i * (hi + 1)) // 3 for i in range(4)]

    def stream(lo: int, up: int) -> ray.data.Dataset:
        return (
            _events(sf_dir, columns=["event_id", "user_id", "event_type", "ts"])
            .filter(expr=f"event_id >= {lo} and event_id < {up}")
            .map_batches(derive_changes_batch, batch_format="pyarrow")
        )

    counts: dict[str, int] = {}

    def fold(feed: ray.data.Dataset) -> None:
        # vectorized per-batch signed fold; only the ≤|roles| partial
        # reaches the driver
        def partial(b: pa.Table) -> pa.Table:
            df = b.to_pandas()
            plus = df.loc[df["op"] != "delete", "after_role"].value_counts()
            minus = df.loc[df["op"] != "insert", "before_role"].value_counts()
            s = plus.sub(minus, fill_value=0)
            return pa.table(
                {
                    "role": pa.array(s.index.astype(str)),
                    "delta": pa.array(s.to_numpy().astype(np.int64)),
                }
            )

        for part in feed.map_batches(partial, batch_format="pyarrow").to_pandas().itertuples():
            counts[part.role] = counts.get(part.role, 0) + int(part.delta)

    with tempfile.TemporaryDirectory(prefix="cdcview-") as d:
        lake = CDCLake(os.path.join(d, "lake"), num_partitions=16)
        for i in range(3):
            lake.apply_changes(stream(bounds[i], bounds[i + 1]), quarantine=False)
            expect, head, feed = lake.poll_changefeed(
                "role-view", image_cols=("role",)
            )
            assert feed is not None
            fold(feed)
            lake.consumers.commit("role-view", head, expect=expect)

        # exactly-once at epoch granularity: a replayed poll is empty
        _, _, feed2 = lake.poll_changefeed("role-view", image_cols=("role",))
        assert feed2 is None, "caught-up consumer must see no feed"

        roles = sorted(r for r, c in counts.items() if c)
        return pa.table(
            {
                "role": pa.array(roles, pa.string()),
                "n_turns": pa.array(
                    [counts[r] for r in roles], pa.int64()
                ),
            }
        )


def _materialize_blob_container(sf_dir: str) -> str:
    """Write the ``documents`` table out as a blob container fixture —
    one opaque file per doc at ``container/<source>/<doc_id>.txt`` —
    mirroring the reference's source store (a storage container whose
    blob URL carries the routing metadata, RouteIngestedFile.kt:95-123).
    Fixture creation only (at 100 TB the blobs already live in object
    storage); cached per sf_dir behind an atomic marker so repeated
    queries/tests reuse it."""
    import os
    import tempfile

    # cache key folds in the source file's content fingerprint
    # (size+mtime) so a regenerated documents.parquet invalidates the
    # fixture instead of silently serving stale blobs
    src_path = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src_path)
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:{st.st_size}:{st.st_mtime_ns}".encode()
    ).hexdigest()[:12]
    root = os.path.join("/tmp", f"derb-blobstore-{key}")
    marker = os.path.join(root, "_COMPLETE")
    if os.path.exists(marker):
        return os.path.join(root, "container")
    import pyarrow.parquet as pq

    t = pq.read_table(src_path, columns=["doc_id", "source", "text"])
    # private staging dir — concurrent builders never interleave writes
    tmp = tempfile.mkdtemp(prefix=f"derb-blobstore-{key}-stage-", dir="/tmp")
    cont = os.path.join(tmp, "container")
    os.makedirs(cont, exist_ok=True)
    doc_id = t["doc_id"].to_numpy()
    src = t["source"].to_pylist()
    txt = t["text"].to_pylist()
    for i in range(t.num_rows):
        d = os.path.join(cont, str(src[i]))
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, f"{int(doc_id[i])}.txt"), "wb") as f:
            f.write((txt[i] or "").encode("utf-8"))
    with open(os.path.join(tmp, "_COMPLETE"), "w") as f:
        f.write("ok")
    try:
        os.replace(tmp, root)  # atomic publish; loser of a race cleans up
    except OSError:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return os.path.join(root, "container")


def blob_container_route(sf_dir: str) -> pa.Table:
    """S3/S5 — the reference's actual ingest shape: a container of opaque
    blobs consumed as byte streams, metadata parsed from the blob URL,
    then config-routed 1→N and summarized per destination
    (RouteIngestedFile.kt:95-123 URL parse; :250 openInputStream; J6
    route fan-out). ``ray.data.read_binary_files`` IS the blob-container
    source: each row is (bytes, path); nothing is decoded driver-side.

    Routing rule (deterministic, oracle-expressible): every blob ships to
    ``dst-primary``; blobs whose doc_id % 3 == 0 ALSO ship to
    ``dst-replica`` (the 1→N expansion). Output: per-destination blob
    count + total payload bytes.

    100 TB shape: read_binary_files streams file chunks as blocks (no
    listing materialization beyond paths); path→metadata parse is one
    vectorized regex per batch; the fan-out is an index-repeat, and the
    only exchange is the final tiny 2-row groupby."""
    container = _materialize_blob_container(sf_dir)

    def parse_route(b: pa.Table) -> pa.Table:
        # vectorized URL→metadata parse (the RouteIngestedFile.kt:95-123
        # blob-URL decomposition, one Arrow regex kernel per batch)
        parts = pc.extract_regex(
            b["path"], pattern=r"container/(?P<src>[^/]+)/(?P<id>\d+)\.txt$"
        )
        nbytes = pc.binary_length(b["bytes"]).to_numpy().astype(np.int64)
        ids = pc.cast(
            pc.struct_field(parts, "id"), pa.int64()
        ).to_numpy(zero_copy_only=False)
        # 1→N: primary for all, replica where doc_id % 3 == 0
        rep = np.nonzero(ids % 3 == 0)[0]
        dest = np.concatenate([
            np.repeat("dst-primary", len(ids)),
            np.repeat("dst-replica", len(rep)),
        ])
        return pa.table({
            "destination": pa.array(dest, pa.string()),
            "nbytes": pa.array(
                np.concatenate([nbytes, nbytes[rep]]), pa.int64()
            ),
        })

    from ray.data.aggregate import Count, Sum

    out = (
        ray.data.read_binary_files(container, include_paths=True)
        .map_batches(parse_route, batch_format="pyarrow")
        .groupby("destination")
        .aggregate(
            Count(alias_name="n_blobs"),
            Sum("nbytes", alias_name="total_bytes"),
        )
        .to_pandas()
        .sort_values("destination")
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def lake_backup_restore(sf_dir: str) -> pa.Table:
    """Point-in-time backup/restore (disaster recovery): ingest half the
    change stream, ``backup_to`` a new directory (one consistent manifest
    read; immutable data files copied), keep ingesting into the ORIGINAL
    lake, then open the backup as a lake (`restore = CDCLake(backup_dir)`)
    and resume from it. In-query asserts prove the operational contract:
    (a) the backup's fence survives — replaying the already-applied first
    half into the restored lake is a fenced NO-OP; (b) resuming with the
    second half converges the restored lake to the exact final state the
    oracle computes (returned table); (c) the original lake, which never
    stopped, reaches the same state (bit-equality) — the backup never
    disturbed it.

    100 TB shape: backup cost is one manifest read + a parallelizable
    immutable-file copy (here driver-side; on an object store it is a
    server-side copy per file), never a table scan or a lock on writers."""
    import os
    import tempfile

    from data_exchange_routing_ray.pipelines.cdc import CDCLake
    from data_exchange_routing_ray.pipelines.events_cdc import (
        _events,
        derive_changes_batch,
    )

    hi = _events(sf_dir, columns=["event_id"]).max("event_id")
    mid = int(hi) // 2 + 1

    def epoch_stream(lo: int, up: int):
        return _events(
            sf_dir, columns=["event_id", "user_id", "event_type", "ts"]
        ).filter(expr=f"event_id >= {lo} and event_id < {up}").map_batches(
            derive_changes_batch, batch_format="pyarrow"
        )

    with tempfile.TemporaryDirectory(prefix="cdcbackup-") as d:
        lake = CDCLake(os.path.join(d, "lake"), num_partitions=16)
        lake.apply_changes(epoch_stream(0, mid), quarantine=False)
        info = lake.backup_to(os.path.join(d, "backup"))
        assert info["epoch"] == 0 and info["data_files"] > 0
        # original keeps ingesting after the backup was taken
        lake.apply_changes(epoch_stream(mid, int(hi) + 1), quarantine=False)

        restored = CDCLake(os.path.join(d, "backup"), num_partitions=16)
        assert restored.manifest.applied_offset == info["applied_offset"]
        # (a) replay of the already-applied half is a fenced no-op
        before = restored.manifest.applied_offset
        restored.apply_changes(epoch_stream(0, mid), quarantine=False)
        assert restored.manifest.applied_offset == before, "fence lost in backup"
        # (b) resume with the second half
        restored.apply_changes(epoch_stream(mid, int(hi) + 1), quarantine=False)
        out = restored.final_table()
        # (c) the never-stopped original reached the identical state
        assert out.equals(lake.final_table()), "backup disturbed the original"
        return out


def csv_typed_translate(sf_dir: str) -> pa.Table:
    """Typed tabular translation with truncation tolerance — the ADF
    ``TabularTranslator`` (``typeConversion: true, allowDataTruncation:
    true``) from the reference's PL_ReportStream pipeline
    (spikes/PL_ReportStream/pipeline/PL_ReportStream.json, "translator"
    block): an untyped delimited file is copied into a TYPED schema where
    lossy-but-representable conversions succeed silently (decimal → int
    truncates toward zero, timestamp → date drops the time part,
    varchar → varchar(8) right-truncates) and genuinely unconvertible
    values dead-letter the whole row with an exact error string (the
    reference's per-row fault path).

    Fixture: the events table is rendered to CSV string columns with a
    deterministic integer-built decimal (`id%1000 . id%7919`) so no float
    formatting is involved; every 97th id gets a trailing 'x' → a poison
    decimal. The CSV is written and re-read with ALL columns forced to
    string (pyarrow ConvertOptions), so the typed cast below is real.

    100 TB shape: the translator is one vectorized map_batches (regex
    validity mask + masked casts — no per-row Python); the only driver
    data is the ≤2-rows-per-block aggregate partials."""
    import tempfile

    import pyarrow.csv as pacsv

    from data_exchange_routing_ray.pipelines.events_cdc import _events

    ERR = "TypeConversion failed for column 'value': not a valid decimal"

    def to_csv_cols(b: pa.Table) -> pa.Table:
        ids = b["event_id"].to_numpy()
        m = (ids % 1000).astype(np.int64)
        f = (ids % 7919).astype(np.int64)
        vs = np.char.add(
            np.char.add(m.astype("U20"), "."), f.astype("U20")
        )
        poison = ids % 97 == 3
        vs = np.where(poison, np.char.add(vs, "x"), vs)
        return pa.table(
            {
                "event_id": b["event_id"],
                "value_str": pa.array(vs.astype(object), pa.string()),
                "ts_str": pc.strftime(b["ts"], format="%Y-%m-%dT%H:%M:%S"),
                "props8": pc.utf8_slice_codeunits(b["props"], 0, 8),
            }
        )

    def translate(b: pa.Table) -> pa.Table:
        """The typed translator: per-batch aggregate partial out."""
        vs = b["value_str"]
        valid = pc.match_substring_regex(vs, r"^-?[0-9]+\.[0-9]+$")
        valid_np = valid.to_numpy(zero_copy_only=False).astype(bool)
        # decimal → BIGINT with truncation allowed (trunc toward zero)
        clean = pc.if_else(valid, vs, pa.scalar("0"))
        vint = pc.cast(
            pc.trunc(pc.cast(clean, pa.float64())), pa.int64()
        ).to_numpy(zero_copy_only=False)
        # timestamp-string → DATE (time part truncated)
        day = pc.cast(
            pc.utf8_slice_codeunits(b["ts_str"], 0, 10), pa.date32()
        )
        day_str = pc.cast(day, pa.string()).to_numpy(zero_copy_only=False)
        props8 = b["props8"].to_numpy(zero_copy_only=False)
        n_ok = int(valid_np.sum())
        n_bad = int(len(valid_np) - n_ok)
        rows = {
            "error": [],
            "n": [],
            "sum_val": [],
            "max_day": [],
            "max_props8": [],
        }
        if n_ok:
            ok_props = props8[valid_np]
            ok_props = ok_props[ok_props != None]  # noqa: E711
            rows["error"].append("(translated)")
            rows["n"].append(n_ok)
            rows["sum_val"].append(float(vint[valid_np].sum()))
            rows["max_day"].append(str(day_str[valid_np].max()))
            rows["max_props8"].append(
                str(ok_props.max()) if len(ok_props) else None
            )
        if n_bad:
            rows["error"].append(ERR)
            rows["n"].append(n_bad)
            rows["sum_val"].append(None)
            rows["max_day"].append(None)
            rows["max_props8"].append(None)
        return pa.table(
            {
                "error": pa.array(rows["error"], pa.string()),
                "n": pa.array(rows["n"], pa.int64()),
                "sum_val": pa.array(rows["sum_val"], pa.float64()),
                "max_day": pa.array(rows["max_day"], pa.string()),
                "max_props8": pa.array(rows["max_props8"], pa.string()),
            }
        )

    with tempfile.TemporaryDirectory(prefix="csvtyped-") as d:
        _events(
            sf_dir, columns=["event_id", "ts", "value", "props"]
        ).map_batches(to_csv_cols, batch_format="pyarrow").write_csv(d)
        back = ray.data.read_csv(
            d,
            convert_options=pacsv.ConvertOptions(
                column_types={
                    "event_id": pa.string(),
                    "value_str": pa.string(),
                    "ts_str": pa.string(),
                    "props8": pa.string(),
                }
            ),
        )
        partials = back.map_batches(
            translate, batch_format="pyarrow"
        ).to_pandas()  # ≤2 rows per block
    agg = (
        partials.groupby("error", as_index=False)
        .agg(
            n=("n", "sum"),
            sum_val=("sum_val", lambda s: s.sum(min_count=1)),
            max_day=("max_day", "max"),
            max_props8=("max_props8", "max"),
        )
        .sort_values("error")
        .reset_index(drop=True)
    )
    agg["n"] = agg["n"].astype("int64")
    return pa.Table.from_pandas(agg, preserve_index=False)
