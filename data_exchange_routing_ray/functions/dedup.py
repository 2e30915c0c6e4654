"""Deduplication operators for training-data pipelines.

All variants follow the same scale shape: a vectorized per-batch signature
stage (``map_batches``, Arrow in), an explode to small bucket-key rows, ONE
``groupby`` on the bucket key (the only shuffle), candidate-pair
verification inside each bucket group, and a driver-side reduce over the
(bounded, tiny) pair set. The reference's only dedup is delivery dedup via
idempotent overwrite (``CHANGELOG.md:42``, ``RouteIngestedFile.kt:251``);
these are the content-dedup operators a 100 TB corpus needs.

- exact: content-hash partition + first-wins per group
- MinHash + LSH: word-shingle → 64-perm minhash → banded buckets →
  signature-estimated Jaccard verification
- SimHash: token-hash bit votes → 64-bit simhash → 16-bit band buckets →
  Hamming-distance verification
- n-gram Jaccard: exact shingle-set Jaccard for candidate pairs
- embedding near-dup: cosine over an embedding column, label/bucket-blocked
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from data_exchange_routing_ray.hashing import stable_hash_strings

# ----------------------------------------------------------- bucket helper
#
# groupby(fine_key).map_groups costs one Python UDF call PER GROUP; with
# millions of tiny groups (LSH buckets, content hashes, pair keys) that
# overhead dominates. The scale pattern used throughout this module: shuffle
# on a COARSE bucket = hash(fine_key) % num_buckets (hundreds of groups,
# sized ~4x cluster cores), then resolve the fine groups INSIDE each bucket
# with vectorized pandas/numpy. Same result, ~constant Python overhead.

DEFAULT_BUCKETS = 256

# Per-worker-process cache for object-store-broadcast lookup tables
# (assembled once per worker from Arrow block refs — zero-copy plasma reads;
# cheaper than an actor pool at small scale, same amortization at large).
_BROADCAST_CACHE: dict = {}


def _as_arrow_block(t) -> pa.Table:
    """to_arrow_refs() yields whatever block format the dataset holds —
    pandas blocks (from map_groups pandas stages) must be converted."""
    if isinstance(t, pa.Table):
        return t
    return pa.Table.from_pandas(t, preserve_index=False)


def _broadcast_lookup(refs, id_col: str, payload_col: str, num_cols: int, dtype):
    key = (refs[0].hex() if refs else "", payload_col, num_cols)
    hit = _BROADCAST_CACHE.get(key)
    if hit is not None:
        return hit
    import ray as _ray

    tabs = [
        t for t in map(_as_arrow_block, _ray.get(list(refs))) if t.num_rows
    ]
    if tabs:
        tab = pa.concat_tables(tabs)
        ids = tab[id_col].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        val = (ids[order], _sig_matrix(tab[payload_col], num_cols, dtype)[order])
    else:
        val = (np.zeros(0, np.int64), np.empty((0, num_cols), np.dtype(dtype)))
    _cache_put(key, val)
    return val


def _cache_put(key, val, max_entries: int = 4) -> None:
    # keep a few live broadcasts per worker (a pipeline may interleave e.g.
    # a signature lookup and a text lookup; single-slot eviction thrashes)
    while len(_BROADCAST_CACHE) >= max_entries:
        _BROADCAST_CACHE.pop(next(iter(_BROADCAST_CACHE)))
    _BROADCAST_CACHE[key] = val


def _pack_rows(M: np.ndarray) -> pa.Array:
    """(n, k) numpy matrix → pa.binary() array of one fixed-width value per
    row, built from the contiguous buffer with vectorized offsets — no
    per-row ``tobytes()`` Python loop. Inverse of ``_sig_matrix``."""
    n = len(M)
    width = M.shape[1] * M.itemsize
    if n * width >= (1 << 31):  # int32 offsets — callers are per-batch
        return pa.array([M[i].tobytes() for i in range(n)], pa.binary())
    data = np.ascontiguousarray(M).view(np.uint8).reshape(-1)
    offs = np.arange(0, (n + 1) * width, width, dtype=np.int32)
    return pa.Array.from_buffers(
        pa.binary(), n, [None, pa.py_buffer(offs), pa.py_buffer(data)]
    )


def _mix_to_bucket(cols: list[np.ndarray], num_buckets: int) -> np.ndarray:
    acc = np.zeros(len(cols[0]), dtype=np.uint64)
    for c in cols:
        acc = (acc ^ c.astype(np.int64).view(np.uint64)) * np.uint64(
            0x9E3779B97F4A7C15
        )
    return (acc % np.uint64(num_buckets)).astype(np.int64)


def _dedup_pairs(pairs: ray.data.Dataset, num_buckets: int = 64) -> ray.data.Dataset:
    """Drop duplicate (id_a, id_b) rows (same pair found by several bands)."""

    def tag(batch: pa.Table) -> pa.Table:
        b = _mix_to_bucket(
            [batch["id_a"].to_numpy(), batch["id_b"].to_numpy()], num_buckets
        )
        return batch.append_column("pair_bucket", pa.array(b, pa.int64()))

    def uniq(g: pa.Table) -> pa.Table:
        # Arrow-native drop_duplicates(['id_a','id_b'], keep='first'):
        # stable lexsort + run-start mask, indices re-sorted to preserve
        # input order (pandas parity), no pandas conversion in the bucket
        a = g["id_a"].to_numpy()
        b2 = g["id_b"].to_numpy()
        if len(a) == 0:
            return g.drop_columns(["pair_bucket"])
        order = np.lexsort((b2, a))
        aa, bb = a[order], b2[order]
        first = np.r_[True, (aa[1:] != aa[:-1]) | (bb[1:] != bb[:-1])]
        keep = np.sort(order[first])
        return g.drop_columns(["pair_bucket"]).take(pa.array(keep))

    return (
        pairs.map_batches(tag, batch_format="pyarrow")
        .groupby("pair_bucket")
        .map_groups(uniq, batch_format="pyarrow")
    )


def attach_payload_bucketed(
    pairs: ray.data.Dataset,
    pair_schema: pa.Schema,
    payload: ray.data.Dataset,
    key_col: str,
    payload_col: str,
    payload_type: pa.DataType,
    side_col: str,
    out_col: str,
    num_buckets: int = 64,
    dedup_pairs: bool = False,
) -> ray.data.Dataset:
    """Bucketed hash join: attach ``payload[payload_col]`` onto ``pairs`` as
    ``out_col`` where ``pairs[side_col] == payload[key_col]`` — with NO
    driver materialization of either side.

    ``dedup_pairs=True`` drops duplicate pair rows (same values across ALL
    ``pair_schema`` columns, which must then be numeric) inside the bucket
    before the lookup — duplicates share a bucket because the bucket key is
    a function of ``side_col``, so this folds a separate pair-dedup shuffle
    into the join.

    Both sides are tagged with ``jbucket = hash(key) % num_buckets`` and
    unioned; ONE shuffle co-locates each key's pair rows with its (unique)
    payload row; a vectorized pandas map resolves the lookup inside each
    bucket. This is the scale-safe replacement for broadcasting a lookup
    table through the driver: shuffle volume is |payload| + |pairs| rows,
    distributed, instead of |payload| bytes through the driver into every
    worker.

    ``pair_schema`` must list the columns currently on ``pairs`` (a lazy
    dataset's schema is not consulted, to avoid triggering execution).
    Payload keys must be unique (one payload row per key).
    """
    pair_cols = list(pair_schema.names)
    out_names = pair_cols + [out_col, "__is_payload", "__jbucket"]
    out_schema = pa.schema(
        [pair_schema.field(c) for c in pair_cols] + [pa.field(out_col, payload_type)]
    )

    def tag_pairs(b: pa.Table) -> pa.Table:
        jb = _mix_to_bucket(
            [b[side_col].to_numpy(zero_copy_only=False)], num_buckets
        )
        cols = {c: b[c].cast(pair_schema.field(c).type) for c in pair_cols}
        cols[out_col] = pa.nulls(b.num_rows, payload_type)
        cols["__is_payload"] = pa.array(np.zeros(b.num_rows, np.int8))
        cols["__jbucket"] = pa.array(jb, pa.int64())
        return pa.table({n: cols[n] for n in out_names})

    def tag_payload(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_numpy(zero_copy_only=False)
        jb = _mix_to_bucket([keys], num_buckets)
        cols: dict[str, pa.Array] = {}
        for c in pair_cols:
            if c == side_col:
                cols[c] = b[key_col].cast(pair_schema.field(side_col).type)
            else:
                cols[c] = pa.nulls(b.num_rows, pair_schema.field(c).type)
        cols[out_col] = b[payload_col].cast(payload_type)
        cols["__is_payload"] = pa.array(np.ones(b.num_rows, np.int8))
        cols["__jbucket"] = pa.array(jb, pa.int64())
        return pa.table({n: cols[n] for n in out_names})

    tagged_pairs = pairs.map_batches(tag_pairs, batch_format="pyarrow")
    tagged_payload = payload.map_batches(tag_payload, batch_format="pyarrow")

    def resolve(g: pa.Table) -> pa.Table:
        # Arrow-native lookup join inside the bucket: sort payload keys once,
        # searchsorted the pair side, pc.take the payload values — zero
        # Python objects on the hot path (binary/string payloads stay Arrow).
        is_pl = g["__is_payload"].to_numpy()
        pl_idx = np.nonzero(is_pl == 1)[0]
        pr_idx = np.nonzero(is_pl == 0)[0]
        if len(pr_idx) == 0:
            return out_schema.empty_table()
        if dedup_pairs and len(pr_idx) > 1:
            arrs = [
                g[c].to_numpy(zero_copy_only=False)[pr_idx] for c in pair_cols
            ]
            order = np.lexsort(arrs[::-1])
            first = np.zeros(len(order), dtype=bool)
            first[0] = True
            for a in arrs:
                s = a[order]
                first[1:] |= s[1:] != s[:-1]
            pr_idx = pr_idx[order][first]
        side_vals = g[side_col].to_numpy(zero_copy_only=False)
        cols = {c: g[c].take(pa.array(pr_idx)) for c in pair_cols}
        if len(pl_idx) == 0:
            cols[out_col] = pa.nulls(len(pr_idx), payload_type)
            return pa.table({n: cols[n] for n in [*pair_cols, out_col]})
        keys = side_vals[pl_idx]
        order = np.argsort(keys, kind="stable")
        sorted_keys = keys[order]
        want = side_vals[pr_idx]
        pos = np.searchsorted(sorted_keys, want)
        pos_c = np.minimum(pos, len(sorted_keys) - 1)
        miss = sorted_keys[pos_c] != want
        take_idx = pl_idx[order][pos_c]
        idx_arr = pa.array(take_idx, pa.int64(), mask=miss)  # null ⇒ no payload
        cols[out_col] = g[out_col].take(idx_arr)
        return pa.table({n: cols[n] for n in [*pair_cols, out_col]})

    return (
        tagged_pairs.union(tagged_payload)
        .groupby("__jbucket")
        .map_groups(resolve, batch_format="pyarrow")
    )


def _run_starts(keys: list[np.ndarray]) -> np.ndarray:
    """Start indices of equal-key runs in already-sorted parallel arrays."""
    n = len(keys[0])
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for k in keys:
        change[1:] |= k[1:] != k[:-1]
    return np.nonzero(change)[0]


# ------------------------------------------------------------------ exact

def add_content_hash(batch: pa.Table, col: str = "text", out_col: str = "content_hash") -> pa.Table:
    h = stable_hash_strings(batch[col]).astype(np.int64)
    return batch.append_column(out_col, pa.array(h, pa.int64()))


def exact_dedup(
    ds: ray.data.Dataset,
    col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = DEFAULT_BUCKETS,
) -> ray.data.Dataset:
    """Keep the lowest-id row per distinct content (hash-partitioned)."""

    def tag(b: pa.Table) -> pa.Table:
        b = add_content_hash(b, col)
        bucket = _mix_to_bucket([b["content_hash"].to_numpy()], num_buckets)
        return b.append_column("bucket", pa.array(bucket, pa.int64()))

    def first_per_hash(g: pa.Table) -> pa.Table:
        # Arrow-native lowest-id-per-hash: lexsort by (hash, id), keep
        # each hash run's first row, emit sorted by id (pandas parity)
        h = g["content_hash"].to_numpy()
        n = len(h)
        if n == 0:
            return g.drop_columns(["bucket", "content_hash"])
        ids = g[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((np.arange(n), ids, h))
        hs = h[order]
        first = np.r_[True, hs[1:] != hs[:-1]]
        keep = order[first]
        keep = keep[np.argsort(ids[keep], kind="stable")]
        return g.drop_columns(["bucket", "content_hash"]).take(pa.array(keep))

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(first_per_hash, batch_format="pyarrow")
    )


# ------------------------------------------------------------------ shingles

def _broadcast_lookup_str(refs, id_col: str, payload_col: str):
    """Per-worker cached (sorted ids, object array of strings) from block
    refs — the string-payload sibling of ``_broadcast_lookup``."""
    key = (refs[0].hex() if refs else "", payload_col, "str")
    hit = _BROADCAST_CACHE.get(key)
    if hit is not None:
        return hit
    import ray as _ray

    tabs = [
        t for t in map(_as_arrow_block, _ray.get(list(refs))) if t.num_rows
    ]
    if tabs:
        tab = pa.concat_tables(tabs)
        ids = tab[id_col].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        texts = tab[payload_col].to_numpy(zero_copy_only=False)[order]
        val = (ids[order], texts)
    else:
        val = (np.zeros(0, np.int64), np.zeros(0, object))
    _cache_put(key, val)
    return val


def _doc_shingle_hashes(texts: list[str | None], k: int) -> tuple[np.ndarray, np.ndarray]:
    """Flattened shingle hashes + doc boundaries (offsets into the flat array).

    Per-doc Python builds the shingle strings; the hashing of the flattened
    array is one vectorized SipHash call.
    """
    shingles: list[str] = []
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    for i, t in enumerate(texts):
        toks = t.split() if t else []
        if len(toks) >= k:
            shingles.extend(
                " ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)
            )
        elif toks:
            shingles.append(" ".join(toks))
        offsets[i + 1] = len(shingles)
    if shingles:
        flat = stable_hash_strings(np.array(shingles, dtype=object))
    else:
        flat = np.zeros(0, dtype=np.uint64)
    return flat, offsets


_MERSENNE = np.uint64((1 << 61) - 1)


def _perm_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 61, size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 1 << 61, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(
    texts: list[str | None], k: int = 3, num_perm: int = 64, seed: int = 42
) -> np.ndarray:
    """(n_docs, num_perm) uint64 minhash signatures over word k-shingles."""
    flat, offsets = _doc_shingle_hashes(texts, k)
    A, B = _perm_params(num_perm, seed)
    n = len(texts)
    sig = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(flat) == 0:
        return sig
    lens = np.diff(offsets)
    nonempty = np.nonzero(lens > 0)[0]
    starts = offsets[nonempty]
    for p in range(num_perm):
        v = A[p] * flat + B[p]  # universal-ish hash, wraps mod 2^64
        mins = np.minimum.reduceat(v, starts)
        sig[nonempty, p] = mins
    return sig


def _sig_matrix(arr, num_cols: int, dtype=np.uint64) -> np.ndarray:
    """Zero-copy (n, num_cols) view over a binary column of uniform
    ``itemsize*num_cols``-byte values (falls back to a per-value copy if the
    values buffer is non-contiguous). Used for minhash signatures (uint64)
    and packed embedding vectors (float64)."""
    dtype = np.dtype(dtype)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty((0, num_cols), dtype=dtype)
    width = dtype.itemsize * num_cols
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + n + 1
    ]
    if (np.diff(offs) == width).all():
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        flat = data[offs[0] : offs[-1]]
        return flat.view(dtype).reshape(n, num_cols)
    return np.stack([np.frombuffer(s, dtype=dtype) for s in arr.to_pylist()])


def _band_keys(sig: np.ndarray, bands: int) -> np.ndarray:
    """(n_docs, bands) int64 band bucket keys from a signature matrix."""
    n, num_perm = sig.shape
    r = num_perm // bands
    mix = np.uint64(0x9E3779B97F4A7C15)
    keys = np.zeros((n, bands), dtype=np.uint64)
    for b in range(bands):
        chunk = sig[:, b * r : (b + 1) * r]
        acc = np.zeros(n, dtype=np.uint64)
        for j in range(r):
            acc = (acc ^ chunk[:, j]) * mix
        keys[:, b] = acc
    return keys.astype(np.int64)


def make_minhash_band_stage(
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    seed: int = 42,
    with_sig: bool = True,
):
    """map_batches stage: docs → (band, band_key, id[, signature-bytes]) rows.

    ``with_sig=False`` is the scale path: band rows carry ONLY ids (24 B/row
    instead of ~540 B), cutting LSH shuffle volume ~20×; signatures are then
    joined back for verification (see ``minhash_candidate_pairs``).
    """

    def stage(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sig = minhash_signatures(texts, k=k, num_perm=num_perm, seed=seed)
        keys = _band_keys(sig, bands)
        n = len(texts)
        band_ids = np.tile(np.arange(bands, dtype=np.int32), n)
        doc_rep = np.repeat(ids, bands)
        cols = {
            "band": pa.array(band_ids, pa.int32()),
            "band_key": pa.array(keys.reshape(-1), pa.int64()),
            id_col: pa.array(doc_rep),
        }
        if with_sig:
            cols["sig"] = _pack_rows(np.repeat(sig, bands, axis=0))
        return pa.table(cols)

    return stage


def make_signature_stage(
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_perm: int = 64,
    seed: int = 42,
):
    """map_batches stage: docs → (id, signature-bytes) — one row per doc."""

    def stage(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        sig = minhash_signatures(texts, k=k, num_perm=num_perm, seed=seed)
        return pa.table(
            {
                id_col: batch[id_col],
                "sig": _pack_rows(sig),
            }
        )

    return stage


def _verify_pairs_grid(
    pairs_raw: ray.data.Dataset,
    sig_ds: ray.data.Dataset,
    id_col: str,
    num_perm: int,
    threshold: float,
    grid: int = 8,
) -> ray.data.Dataset:
    """Grid (1-bucket-theta) verification for PAIR-HEAVY candidate sets.

    One shuffle: pair (a, b) goes to cell (h(a)%G, h(b)%G) once (16 B);
    each signature is replicated to its row of cells as the A-side and its
    column as the B-side (2G copies). In-cell: dedup pairs (duplicates from
    multiple bands land in the same cell), look up both sigs, emit verified
    pairs. Total volume = |pairs|·16 B + 2G·|sigs|·8·num_perm B — beats the
    per-side attach join (which ships a sig per PAIR row) whenever pairs
    outnumber ~2G× the docs, i.e. dup-heavy corpora. G² is the shuffle
    parallelism: size G so G² ≳ cluster cores.
    """
    G = grid
    MIX = np.uint64(0x9E3779B97F4A7C15)

    def _cell_of(ids: np.ndarray) -> np.ndarray:
        h = (ids.astype(np.int64).view(np.uint64) * MIX) >> np.uint64(33)
        return (h % np.uint64(G)).astype(np.int64)

    def tag_pairs(b: pa.Table) -> pa.Table:
        a = b["id_a"].to_numpy()
        bb = b["id_b"].to_numpy()
        cell = _cell_of(a) * G + _cell_of(bb)
        return pa.table(
            {
                "id_a": pa.array(a, pa.int64()),
                "id_b": pa.array(bb, pa.int64()),
                "sig": pa.nulls(b.num_rows, pa.binary()),
                "kind": pa.array(np.full(b.num_rows, 2, np.int8)),
                "cell": pa.array(cell, pa.int64()),
            }
        )

    def tag_sigs(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        home = _cell_of(ids)
        j = np.tile(np.arange(G, dtype=np.int64), n)
        # A-side copies fill the doc's row of cells; B-side its column
        cell_a = np.repeat(home, G) * G + j
        cell_b = j * G + np.repeat(home, G)
        rep_ids = np.repeat(ids, G)
        sig_rep = b["sig"].take(pa.array(np.repeat(np.arange(n), G)))
        return pa.table(
            {
                "id_a": pa.array(np.concatenate([rep_ids, rep_ids]), pa.int64()),
                "id_b": pa.array(np.zeros(2 * G * n, np.int64)),
                "sig": pa.concat_arrays(
                    [sig_rep.combine_chunks()] * 2
                ) if isinstance(sig_rep, pa.ChunkedArray) else pa.concat_arrays([sig_rep] * 2),
                "kind": pa.array(
                    np.concatenate(
                        [np.zeros(G * n, np.int8), np.ones(G * n, np.int8)]
                    )
                ),
                "cell": pa.array(np.concatenate([cell_a, cell_b]), pa.int64()),
            }
        )

    tagged_pairs = pairs_raw.map_batches(tag_pairs, batch_format="pyarrow")
    tagged_sigs = sig_ds.map_batches(tag_sigs, batch_format="pyarrow")

    empty = pa.table(
        {
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "est_jaccard": pa.array([], pa.float64()),
        }
    )

    def resolve(g: pa.Table) -> pa.Table:
        kind = g["kind"].to_numpy()
        pr = np.nonzero(kind == 2)[0]
        if len(pr) == 0:
            return empty
        a = g["id_a"].to_numpy()[pr]
        bb = g["id_b"].to_numpy()[pr]
        # in-cell pair dedup (multi-band duplicates share the cell)
        order = np.lexsort((bb, a))
        a, bb = a[order], bb[order]
        first = np.r_[True, (a[1:] != a[:-1]) | (bb[1:] != bb[:-1])]
        a, bb = a[first], bb[first]

        def lut(side_kind: int):
            idx = np.nonzero(kind == side_kind)[0]
            keys = g["id_a"].to_numpy()[idx]
            o = np.argsort(keys, kind="stable")
            return keys[o], _sig_matrix(g["sig"].take(pa.array(idx[o])), num_perm)

        keys_a, mat_a = lut(0)
        keys_b, mat_b = lut(1)
        ia = np.searchsorted(keys_a, a)
        ib = np.searchsorted(keys_b, bb)
        est = (mat_a[ia] == mat_b[ib]).mean(axis=1)
        keep = est >= threshold
        return pa.table(
            {
                "id_a": pa.array(a[keep], pa.int64()),
                "id_b": pa.array(bb[keep], pa.int64()),
                "est_jaccard": pa.array(np.round(est[keep], 6), pa.float64()),
            }
        )

    return (
        tagged_pairs.union(tagged_sigs)
        .groupby("cell")
        .map_groups(resolve, batch_format="pyarrow")
    )


def _verify_pairs_broadcast(
    pairs_raw: ray.data.Dataset,
    sig_ds: ray.data.Dataset,
    id_col: str,
    num_perm: int,
    threshold: float,
) -> ray.data.Dataset:
    """Object-store-broadcast verification for SMALL signature tables.

    The classic broadcast join: the signature table stays in the shared
    object store as Arrow block refs; each verify ACTOR assembles its
    (ids, matrix) lookup once in ``__init__`` (zero-copy reads of
    node-local blocks — the table never passes through the driver as a
    Python object). Right only while n_docs × num_perm × 8 B fits a worker
    heap — the caller size-gates this and falls back to the distributed
    joins above the budget."""
    refs = sig_ds.to_arrow_refs()
    deduped = _dedup_pairs(pairs_raw)

    def verify(b: pa.Table) -> pa.Table:
        ids, mat = _broadcast_lookup(refs, id_col, "sig", num_perm, np.uint64)
        a = b["id_a"].to_numpy()
        bb = b["id_b"].to_numpy()
        est = (
            mat[np.searchsorted(ids, a)] == mat[np.searchsorted(ids, bb)]
        ).mean(axis=1)
        keep = est >= threshold
        return pa.table(
            {
                "id_a": pa.array(a[keep], pa.int64()),
                "id_b": pa.array(bb[keep], pa.int64()),
                "est_jaccard": pa.array(np.round(est[keep], 6), pa.float64()),
            }
        )

    return deduped.map_batches(verify, batch_format="pyarrow")


def minhash_candidate_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    seed: int = 42,
    num_buckets: int = DEFAULT_BUCKETS,
    grid: int = 8,
    strategy: str = "auto",
    broadcast_budget_bytes: int = 1 << 30,
) -> ray.data.Dataset:
    """MinHash-LSH near-duplicate pairs (deduplicated, id_a<id_b, with
    signature-estimated Jaccard ≥ threshold).

    Scale layout (measured 20× shuffle reduction at 500k docs): band rows
    carry ONLY (band, band_key, id); buckets emit bare candidate id pairs;
    pairs are deduped; then a verification strategy is picked by MEASURED
    sizes (``strategy="auto"``; nothing ever passes through the driver as a
    Python object):

    - ``broadcast`` — sig table ≤ ``broadcast_budget_bytes`` (default 1 GiB
      ≈ 2M docs at 64 perms): classic broadcast join; verify actors read the
      signature blocks zero-copy from the shared object store.
    - ``grid`` — pair-heavy corpora (dup storms, pairs > 2·G·docs):
      1-bucket-theta grid; each sig ships 2G times, each pair once.
    - ``attach`` — doc-heavy large corpora: two bucketed hash joins attach
      sig_a / sig_b per pair (at 1 B docs × 64 perms the 0.5 TB sig table
      shuffles once per side across the cluster — the former driver
      broadcast shipped it into every worker and OOMed the driver first).

    All three produce bit-identical pair sets (pytest + A/B-verified).
    """
    if strategy not in ("auto", "broadcast", "grid", "attach"):
        raise ValueError(f"unknown verify strategy {strategy!r}")
    # Signatures are computed ONCE (shingling + hashing dominates the
    # corpus scan) and materialized — tiny at num_perm*8 B/doc; band rows
    # and the verification broadcast both derive from it.
    sig_ds = ds.map_batches(
        make_signature_stage(text_col, id_col, k, num_perm, seed),
        batch_format="pyarrow",
    ).materialize()

    def band_and_bucket(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        if n:
            sig = _sig_matrix(batch["sig"], num_perm, np.uint64)
        else:
            sig = np.empty((0, num_perm), dtype=np.uint64)
        keys = _band_keys(sig, bands)
        band_ids = np.tile(np.arange(bands, dtype=np.int32), n)
        doc_rep = np.repeat(ids, bands)
        out = pa.table(
            {
                "band": pa.array(band_ids, pa.int32()),
                "band_key": pa.array(keys.reshape(-1), pa.int64()),
                id_col: pa.array(doc_rep),
            }
        )
        bucket = _mix_to_bucket(
            [out["band"].to_numpy(), out["band_key"].to_numpy()], num_buckets
        )
        return out.append_column("bucket", pa.array(bucket, pa.int64()))

    band_rows = sig_ds.map_batches(band_and_bucket, batch_format="pyarrow")
    pairs_raw = band_rows.groupby("bucket").map_groups(
        make_bucket_candidate_fn(id_col), batch_format="pyarrow"
    )
    # The broadcast gate needs only n_docs (free: sig_ds is materialized),
    # keeping the raw-pair stream fully pipelined in the common case. Only
    # when the sig table exceeds the broadcast budget are the candidate
    # pairs materialized (bare id pairs, 16 B/row) to choose between the
    # two distributed strategies by shuffle volume:
    #   pair-heavy (dup storms): grid verify ships each sig 2G×, pairs 1×
    #   doc-heavy (realistic):   per-side attach ships sigs 2×, pairs 2×
    n_docs = sig_ds.count()
    if strategy == "auto":
        if n_docs * num_perm * 8 <= broadcast_budget_bytes:
            strategy = "broadcast"
        else:
            pairs_raw = pairs_raw.materialize()
            strategy = (
                "grid"
                if pairs_raw.count() > 2 * grid * max(n_docs, 1)
                else "attach"
            )
    if strategy == "broadcast":
        return _verify_pairs_broadcast(
            pairs_raw, sig_ds, id_col, num_perm, threshold
        )
    if strategy == "grid":
        return _verify_pairs_grid(
            pairs_raw, sig_ds, id_col, num_perm, threshold, grid
        )

    # attach sig_a / sig_b via two bucketed joins (no driver broadcast);
    # the first join also drops duplicate pairs found by multiple bands
    # (they share the id_a bucket), folding the dedup shuffle into the join
    ids_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])
    with_a = attach_payload_bucketed(
        pairs_raw, ids_schema, sig_ds,
        key_col=id_col, payload_col="sig", payload_type=pa.binary(),
        side_col="id_a", out_col="sig_a", num_buckets=num_buckets,
        dedup_pairs=True,
    )
    ab_schema = ids_schema.append(pa.field("sig_a", pa.binary()))
    with_ab = attach_payload_bucketed(
        with_a, ab_schema, sig_ds,
        key_col=id_col, payload_col="sig", payload_type=pa.binary(),
        side_col="id_b", out_col="sig_b", num_buckets=num_buckets,
    )

    empty = pa.table(
        {
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "est_jaccard": pa.array([], pa.float64()),
        }
    )

    def verify(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return empty
        mat_a = _sig_matrix(b["sig_a"], num_perm)
        mat_b = _sig_matrix(b["sig_b"], num_perm)
        est = (mat_a == mat_b).mean(axis=1)
        keep = pa.array(np.nonzero(est >= threshold)[0])
        return pa.table(
            {
                "id_a": b["id_a"].take(keep).cast(pa.int64()),
                "id_b": b["id_b"].take(keep).cast(pa.int64()),
                "est_jaccard": pa.array(
                    np.round(est[est >= threshold], 6), pa.float64()
                ),
            }
        )

    return with_ab.map_batches(verify, batch_format="pyarrow")


def make_bucket_candidate_fn(id_col: str = "doc_id"):
    """One coarse bucket → bare candidate id pairs (no payload columns).
    Arrow-native: dedupe + group-run detection are one stable lexsort on
    numpy views of the Arrow columns; the only Python loop is over
    COLLIDING (band, key) groups (size ≥ 2 — rare by construction), each
    emitting its pairs via one vectorized triu_indices."""
    empty = pa.table(
        {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
    )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        band = g["band"].to_numpy()
        n = len(band)
        if n == 0:
            return empty
        key = g["band_key"].to_numpy()
        ids_raw = g[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids_raw, key, band))
        band, key, ids = band[order], key[order], ids_raw[order]
        dedup = np.r_[
            True,
            (band[1:] != band[:-1]) | (key[1:] != key[:-1])
            | (ids[1:] != ids[:-1]),
        ]
        band, key, ids = band[dedup], key[dedup], ids[dedup]
        starts = _run_starts([band, key])
        ends = np.append(starts[1:], len(band))
        multi = np.nonzero(ends - starts >= 2)[0]
        if len(multi) == 0:
            return empty
        a_parts, b_parts = [], []
        for r in multi:
            s, e = starts[r], ends[r]
            ia, ib = np.triu_indices(e - s, k=1)
            a_parts.append(ids[s:e][ia])
            b_parts.append(ids[s:e][ib])
        return pa.table(
            {
                "id_a": pa.array(
                    np.concatenate(a_parts).astype(np.int64), pa.int64()
                ),
                "id_b": pa.array(
                    np.concatenate(b_parts).astype(np.int64), pa.int64()
                ),
            }
        )

    return bucket_pairs


def dedup_by_pairs(
    ds: ray.data.Dataset, pairs: pd.DataFrame, id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Drop near-duplicates: union-find over the (small, driver-side) pair
    set; each connected component keeps its minimum id. The pair set is
    bounded (threshold-filtered), the corpus itself never leaves Ray."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    drop = {x for x in parent if find(x) != x}
    if not drop:
        return ds
    drop_arr = pa.array(sorted(drop), pa.int64())

    def keep_fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.invert(pc.is_in(batch[id_col], value_set=drop_arr))
        return batch.filter(mask)

    return ds.map_batches(keep_fn, batch_format="pyarrow")


# ------------------------------------------------------------------ jaccard

def jaccard_of_text_pairs(
    b: pa.Table, k: int = 3, text_a: str = "text_a", text_b: str = "text_b"
) -> pa.Table:
    """Per-pair exact word-k-shingle Jaccard over attached text columns
    (the map_batches verify stage fed by ``attach_payload_bucketed``).
    Shingle hashing of the flattened batch is one vectorized call; the
    set intersection per pair is numpy over sorted hash runs."""
    n = b.num_rows
    if n == 0:
        return pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}
        )
    flat_a, off_a = _doc_shingle_hashes(b[text_a].to_pylist(), k)
    flat_b, off_b = _doc_shingle_hashes(b[text_b].to_pylist(), k)
    jac = np.zeros(n, dtype=np.float64)
    for i in range(n):
        sa = np.unique(flat_a[off_a[i] : off_a[i + 1]])
        sb = np.unique(flat_b[off_b[i] : off_b[i + 1]])
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        union = sa.size + sb.size - inter
        jac[i] = inter / union if union else 0.0
    return pa.table(
        {
            "id_a": b["id_a"].cast(pa.int64()),
            "id_b": b["id_b"].cast(pa.int64()),
            "jaccard": pa.array(np.round(jac, 6), pa.float64()),
        }
    )


def verify_jaccard_pairs(
    docs: pd.DataFrame, pairs: pd.DataFrame, text_col="text", id_col="doc_id", k=3
) -> pd.DataFrame:
    """Exact n-gram Jaccard for candidate pairs (verification stage)."""
    texts = dict(zip(docs[id_col], docs[text_col]))

    def shingle_set(t):
        toks = t.split() if t else []
        if len(toks) < k:
            return {" ".join(toks)} if toks else set()
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    cache: dict[int, set] = {}
    out = []
    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        sa = cache.setdefault(a, shingle_set(texts.get(a)))
        sb = cache.setdefault(b, shingle_set(texts.get(b)))
        union = len(sa | sb)
        out.append(len(sa & sb) / union if union else 0.0)
    res = pairs.copy()
    res["jaccard"] = np.round(out, 6)
    return res


# ------------------------------------------------------------------ simhash

def simhash_batch(texts: list[str | None]) -> np.ndarray:
    """64-bit simhash per doc: sign of per-bit votes over token hashes."""
    flat_tokens: list[str] = []
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    for i, t in enumerate(texts):
        toks = t.split() if t else []
        flat_tokens.extend(toks)
        offsets[i + 1] = len(flat_tokens)
    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    if not flat_tokens:
        return out
    h = stable_hash_strings(np.array(flat_tokens, dtype=object))
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
        np.int32
    ) * 2 - 1
    lens = np.diff(offsets)
    nonempty = np.nonzero(lens > 0)[0]
    votes = np.add.reduceat(bits, offsets[nonempty], axis=0)
    sh = (votes > 0).astype(np.uint64)
    packed = (sh << np.arange(64, dtype=np.uint64)).sum(axis=1, dtype=np.uint64)
    out[nonempty] = packed
    return out


def make_simhash_stage(text_col="text", id_col="doc_id"):
    def stage(batch: pa.Table) -> pa.Table:
        sh = simhash_batch(batch[text_col].to_pylist())
        ids = batch[id_col]
        bands = []
        for b in range(4):
            bands.append(((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64))
        n = batch.num_rows
        return pa.table(
            {
                "band": pa.array(np.repeat(np.arange(4, dtype=np.int32), n)),
                "band_key": pa.array(np.concatenate(bands)),
                id_col: pa.concat_arrays([ids.combine_chunks()] * 4)
                if isinstance(ids, pa.ChunkedArray)
                else pa.concat_arrays([ids] * 4),
                "simhash": pa.array(
                    np.tile(sh.astype(np.int64), 4), pa.int64()
                ),
            }
        )

    return stage


def make_simhash_pair_fn(id_col="doc_id", max_hamming: int = 3):
    """One coarse bucket → pairs; fine (band, band_key) groups resolved
    vectorized inside the bucket (see `_mix_to_bucket` rationale above).
    Arrow-native: same lexsort-dedup shape as make_bucket_candidate_fn
    with a vectorized popcount Hamming filter per colliding group."""
    empty = pa.table(
        {
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "hamming": pa.array([], pa.int64()),
        }
    )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        band = g["band"].to_numpy()
        n = len(band)
        if n == 0:
            return empty
        key = g["band_key"].to_numpy()
        ids_raw = g[id_col].to_numpy(zero_copy_only=False)
        sh_raw = g["simhash"].to_numpy().astype(np.int64).astype(np.uint64)
        order = np.lexsort((ids_raw, key, band))
        band, key = band[order], key[order]
        ids, sh_all = ids_raw[order], sh_raw[order]
        dedup = np.r_[
            True,
            (band[1:] != band[:-1]) | (key[1:] != key[:-1])
            | (ids[1:] != ids[:-1]),
        ]
        band, key, ids, sh_all = (
            band[dedup], key[dedup], ids[dedup], sh_all[dedup]
        )
        starts = _run_starts([band, key])
        ends = np.append(starts[1:], len(band))
        multi = np.nonzero(ends - starts >= 2)[0]
        if len(multi) == 0:
            return empty
        a_parts, b_parts, h_parts = [], [], []
        for r in multi:
            s, e = starts[r], ends[r]
            sh = sh_all[s:e]
            ia, ib = np.triu_indices(e - s, k=1)
            x = sh[ia] ^ sh[ib]
            ham = np.unpackbits(
                x.view(np.uint8).reshape(len(x), 8), axis=1
            ).sum(axis=1)
            keep = ham <= max_hamming
            if keep.any():
                a_parts.append(ids[s:e][ia[keep]])
                b_parts.append(ids[s:e][ib[keep]])
                h_parts.append(ham[keep])
        if not a_parts:
            return empty
        return pa.table(
            {
                "id_a": pa.array(
                    np.concatenate(a_parts).astype(np.int64), pa.int64()
                ),
                "id_b": pa.array(
                    np.concatenate(b_parts).astype(np.int64), pa.int64()
                ),
                "hamming": pa.array(
                    np.concatenate(h_parts).astype(np.int64), pa.int64()
                ),
            }
        )

    return bucket_pairs


def simhash_candidate_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    num_buckets: int = DEFAULT_BUCKETS,
) -> ray.data.Dataset:
    stage = make_simhash_stage(text_col, id_col)

    def tag(batch: pa.Table) -> pa.Table:
        out = stage(batch)
        bucket = _mix_to_bucket(
            [out["band"].to_numpy(), out["band_key"].to_numpy()], num_buckets
        )
        return out.append_column("bucket", pa.array(bucket, pa.int64()))

    rows = ds.map_batches(tag, batch_format="pyarrow")
    pairs = rows.groupby("bucket").map_groups(
        make_simhash_pair_fn(id_col, max_hamming), batch_format="pyarrow"
    )
    return _dedup_pairs(pairs)


def phash_candidate_pairs(
    ds: ray.data.Dataset,
    hash_col: str = "phash",
    id_col: str = "media_id",
    max_hamming: int = 7,
    num_bands: int = 8,
    num_buckets: int = DEFAULT_BUCKETS,
) -> ray.data.Dataset:
    """Perceptual-hash (image) near-dup pairs: the 63-bit pHash is split
    into 8 bands × 8 bits — two hashes within Hamming ≤ 7 share at least
    one band by pigeonhole, so banding loses no true pair at the default
    threshold. Band rows carry only (id, hash, band, key); the in-bucket
    vectorized Hamming kernel is shared with SimHash. At larger corpus
    scale raise ``num_bands``' bit width by hashing band bytes into
    ``band_key`` buckets — the pigeonhole guarantee only needs
    ``num_bands > max_hamming``."""
    bits_per = 64 // num_bands
    mask = np.uint64((1 << bits_per) - 1)

    def tag(batch: pa.Table) -> pa.Table:
        h = batch[hash_col].to_numpy().astype(np.int64).astype(np.uint64)
        ids = batch[id_col].to_numpy().astype(np.int64)
        n = len(h)
        bands = np.repeat(np.arange(num_bands, dtype=np.int64), n)
        keys = np.concatenate(
            [
                ((h >> np.uint64(b * bits_per)) & mask).astype(np.int64)
                for b in range(num_bands)
            ]
        )
        out = pa.table(
            {
                id_col: pa.array(np.tile(ids, num_bands), pa.int64()),
                "simhash": pa.array(
                    np.tile(h.astype(np.int64), num_bands), pa.int64()
                ),
                "band": pa.array(bands, pa.int64()),
                "band_key": pa.array(keys, pa.int64()),
            }
        )
        bucket = _mix_to_bucket(
            [out["band"].to_numpy(), out["band_key"].to_numpy()], num_buckets
        )
        return out.append_column("bucket", pa.array(bucket, pa.int64()))

    rows = ds.map_batches(tag, batch_format="pyarrow")
    pairs = rows.groupby("bucket").map_groups(
        make_simhash_pair_fn(id_col, max_hamming), batch_format="pyarrow"
    )
    return _dedup_pairs(pairs)


# ------------------------------------------------------- embedding near-dup

def embedding_neardup_pairs_blocked(
    ds: ray.data.Dataset,
    block_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.3,
) -> ray.data.Dataset:
    """Cosine near-dup pairs within blocking groups (exact within block —
    SQL-verifiable). For unblocked scale use `lsh_neardup_pairs`."""

    def block_pairs(g: pa.Table) -> pa.Table:
        from data_exchange_routing_ray.functions.similarity import list_col_matrix

        ids = g[id_col].to_numpy(zero_copy_only=False)
        M = list_col_matrix(g[vec_col])
        norms = np.linalg.norm(M, axis=1)
        norms[norms == 0] = 1.0
        # dot / (|a||b|) — matches SQL list_cosine_similarity bit-for-bit
        sims = (M @ M.T) / np.outer(norms, norms)
        ia, ib = np.triu_indices(len(ids), k=1)
        s = sims[ia, ib]
        keep = s > threshold
        # canonical id order (id_a < id_b)
        a, b = ids[ia][keep], ids[ib][keep]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table(
            {
                "id_a": pa.array(lo.astype(np.int64)),
                "id_b": pa.array(hi.astype(np.int64)),
                "cosine": pa.array(np.round(s[keep], 6), pa.float64()),
            }
        )

    return ds.groupby(block_col).map_groups(block_pairs, batch_format="pyarrow")


def lsh_neardup_pairs(
    ds: ray.data.Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.3,
    num_planes: int = 4,
    num_tables: int = 24,
    dim: int = 64,
    seed: int = 42,
    num_buckets: int = DEFAULT_BUCKETS,
    broadcast_budget_bytes: int = 1 << 30,
) -> ray.data.Dataset:
    """MULTI-TABLE random-hyperplane LSH + exact cosine verification.

    Recall math (why multi-table): a pair at cosine c collides in one
    b-plane table with probability p^b, p = 1 - arccos(c)/π; L independent
    tables give 1-(1-p^b)^L. Defaults (b=4, L=24) ⇒ ≥0.96 recall at
    c=0.3 — a single 8-plane table (the former implementation) recalls
    ~2% there. Raise ``num_planes`` / lower ``num_tables`` for higher
    thresholds at larger corpora (candidate volume ~ L·n²/2^b for random
    data; bits are the precision knob, tables the recall knob).

    Scale layout mirrors ``minhash_candidate_pairs``: band rows carry ONLY
    (table, key, id) — 24 B — through the one candidate shuffle; vectors
    are attached for exact verification via the size-gated strategy
    (object-store broadcast ≤ budget, bucketed attach join above it).
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_tables, dim, num_planes))

    # embeddings packed to fixed-width float64 bytes: one materialized pass
    # feeds both banding and verification (the minhash single-scan lesson)
    def pack(b: pa.Table) -> pa.Table:
        from data_exchange_routing_ray.functions.similarity import list_col_matrix

        M = list_col_matrix(b[vec_col])
        return pa.table(
            {
                id_col: b[id_col].cast(pa.int64()),
                "vec": _pack_rows(M),
            }
        )

    emb_ds = ds.map_batches(pack, batch_format="pyarrow").materialize()
    n_vecs = emb_ds.count()

    def band(b: pa.Table) -> pa.Table:
        M = _sig_matrix(b["vec"], dim, np.float64)
        n = len(M)
        ids = b[id_col].to_numpy()
        keys = np.empty((num_tables, n), dtype=np.int64)
        for t in range(num_tables):
            signs = (M @ planes[t]) > 0
            key = np.zeros(n, dtype=np.int64)
            for j in range(num_planes):
                key |= signs[:, j].astype(np.int64) << j
            keys[t] = key
        out = pa.table(
            {
                "band": pa.array(
                    np.repeat(np.arange(num_tables, dtype=np.int32), n)
                ),
                "band_key": pa.array(keys.reshape(-1), pa.int64()),
                id_col: pa.array(np.tile(ids, num_tables), pa.int64()),
            }
        )
        bucket = _mix_to_bucket(
            [out["band"].to_numpy(), out["band_key"].to_numpy()], num_buckets
        )
        return out.append_column("bucket", pa.array(bucket, pa.int64()))

    pairs_raw = (
        emb_ds.map_batches(band, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(make_bucket_candidate_fn(id_col), batch_format="pyarrow")
    )

    empty = pa.table(
        {
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64()),
        }
    )

    def cosine_of(mat_a: np.ndarray, mat_b: np.ndarray) -> np.ndarray:
        # einsum for both the dot and the norms: no (n, dim) product
        # temporaries. On hosts with degraded memory bandwidth (this VM's
        # worst windows deliver <100 MB/s to large temporaries) the
        # (a*b).sum(axis=1) form was measured 100x slower than einsum on
        # 1.5M x 64 inputs; einsum stays in cache.
        na = np.sqrt(np.einsum("ij,ij->i", mat_a, mat_a))
        nb = np.sqrt(np.einsum("ij,ij->i", mat_b, mat_b))
        na[na == 0] = 1.0
        nb[nb == 0] = 1.0
        return np.einsum("ij,ij->i", mat_a, mat_b) / (na * nb)

    if n_vecs * dim * 8 <= broadcast_budget_bytes:
        refs = emb_ds.to_arrow_refs()
        deduped = _dedup_pairs(pairs_raw)

        def verify_bcast(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return empty
            ids, mat = _broadcast_lookup(refs, id_col, "vec", dim, np.float64)
            a = b["id_a"].to_numpy()
            bb = b["id_b"].to_numpy()
            s = cosine_of(
                mat[np.searchsorted(ids, a)], mat[np.searchsorted(ids, bb)]
            )
            keep = s > threshold
            return pa.table(
                {
                    "id_a": pa.array(a[keep], pa.int64()),
                    "id_b": pa.array(bb[keep], pa.int64()),
                    "cosine": pa.array(np.round(s[keep], 6), pa.float64()),
                }
            )

        return deduped.map_batches(verify_bcast, batch_format="pyarrow")

    ids_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])
    with_a = attach_payload_bucketed(
        pairs_raw, ids_schema, emb_ds,
        key_col=id_col, payload_col="vec", payload_type=pa.binary(),
        side_col="id_a", out_col="vec_a", num_buckets=num_buckets,
        dedup_pairs=True,
    )
    with_ab = attach_payload_bucketed(
        with_a, ids_schema.append(pa.field("vec_a", pa.binary())), emb_ds,
        key_col=id_col, payload_col="vec", payload_type=pa.binary(),
        side_col="id_b", out_col="vec_b", num_buckets=num_buckets,
    )

    def verify(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        s = cosine_of(
            _sig_matrix(b["vec_a"], dim, np.float64),
            _sig_matrix(b["vec_b"], dim, np.float64),
        )
        keep = pa.array(np.nonzero(s > threshold)[0])
        return pa.table(
            {
                "id_a": b["id_a"].take(keep).cast(pa.int64()),
                "id_b": b["id_b"].take(keep).cast(pa.int64()),
                "cosine": pa.array(np.round(s[s > threshold], 6), pa.float64()),
            }
        )

    return with_ab.map_batches(verify, batch_format="pyarrow")
