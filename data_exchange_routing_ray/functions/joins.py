"""Temporal join operators Ray Data lacks natively: as-of join, range
join + aggregate, sliding windows.

Scale shape (documented partitioning assumption): both sides are bucketed
by ``hash(by) % num_buckets`` — the ONE shuffle — and the temporal logic
runs vectorized inside each bucket (a merged lexsort + cumsum probe on
zero-copy Arrow; no pandas conversion, no per-key loop), so a bucket must
hold every row of the ``by`` keys it owns. A pathological hot key that
would concentrate one reducer is broken with **time-slice sub-bucketing**
(``hot_keys`` + ``slice_width``): hot rows re-bucket on
``(key, on // slice_width)``; as-of exactness across slice boundaries is
restored by a tiny per-(key, slice) last-right-row summary broadcast via
``ray.put``, and range-join exactness by duplicating right rows whose
window straddles a boundary into the previous slice (≤2× duplication,
requires ``slice_width >= window``).

The reference has no as-of/range joins (SURVEY.md §2.4); its merge-apply
is the degenerate latest-per-key case. These are the general operators.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _bucket_of(keys: np.ndarray, num_buckets: int) -> np.ndarray:
    return ((keys.astype(np.int64).view(np.uint64) * _MIX) % np.uint64(
        num_buckets
    )).astype(np.int64)


def _key_mix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Deterministic int64 hash of a key column (any type) for bucketing."""
    v = col.to_numpy(zero_copy_only=False)
    if v.dtype.kind in "iu":
        return (v.astype(np.int64).view(np.uint64) * _MIX).astype(np.int64)
    return pd.util.hash_array(v, categorize=False).astype(np.int64)


def _dict_codes(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Factorize a column (any type) to dense int codes, vectorized in
    Arrow (dictionary_encode over combined chunks — order-of-appearance
    codes; only equality matters to the kernels below)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    enc = col.dictionary_encode()
    return enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)


def _as_i64_us(col) -> np.ndarray:
    """Integer view of an on-column (pa column, pd.Series or ndarray):
    temporal dtypes are normalized to MICROSECONDS explicitly
    (pandas/pyarrow may surface a us Arrow column as datetime64[ns]; a
    blind .astype(int64) would silently turn a caller's µs window into a
    ns window — 3600s becoming 3.6ms)."""
    if isinstance(col, (pa.ChunkedArray, pa.Array)):
        v = col.to_numpy(zero_copy_only=False)
    elif isinstance(col, pd.Series):
        v = col.to_numpy()
    else:
        v = np.asarray(col)
    if np.issubdtype(v.dtype, np.datetime64):
        return v.astype("datetime64[us]").view("i8")
    return v.astype(np.int64)


def _asof_positions(
    l_code: np.ndarray,
    l_on: np.ndarray,
    rc: np.ndarray,
    ro: np.ndarray,
) -> np.ndarray:
    """Backward-inclusive as-of probe, fully vectorized (the Arrow-native
    replacement for ``pd.merge_asof``): for each left row, the index into
    the RIGHT arrays (which must already be stably sorted by (code, on))
    of the last right row with the same code and ``r_on <= l_on``; -1
    when none. One merged lexsort + cumsum — no per-key loop. Ties on
    (code, on) resolve to the LAST right row in sorted order (= last
    input order under a stable pre-sort), matching the engine's
    last-writer-wins rule."""
    nl, nr = len(l_code), len(rc)
    if nr == 0 or nl == 0:
        return np.full(nl, -1, np.int64)
    codes_all = np.concatenate([rc, l_code])
    ons_all = np.concatenate([ro, l_on])
    tag = np.concatenate([np.zeros(nr, np.int8), np.ones(nl, np.int8)])
    # merged order: by key, then on, then right-before-left on exact ties
    # (backward INCLUSIVE); lexsort is stable, so equal right rows keep
    # input order and the cumsum below naturally picks the last one.
    order = np.lexsort((tag, ons_all, codes_all))
    is_right = tag[order] == 0
    last_r = np.cumsum(is_right) - 1  # most recent right row so far
    left_mask = ~is_right
    left_ids = order[left_mask] - nr
    cand = last_r[left_mask]
    pos = np.full(nl, -1, np.int64)
    valid = cand >= 0
    cand_safe = np.where(valid, cand, 0)
    valid &= rc[cand_safe] == l_code[left_ids]
    pos[left_ids[valid]] = cand[valid]
    return pos


def _take_nullable(col: pa.ChunkedArray | pa.Array, pos: np.ndarray) -> pa.Array:
    """take() with -1 → null (keeps the source Arrow type)."""
    idx = pa.array(np.where(pos >= 0, pos, 0), pa.int64(), mask=pos < 0)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.take(idx)


def _filter_keys(
    ds: ray.data.Dataset, col: str, keys: list, keep_in: bool
) -> ray.data.Dataset:
    """Vectorized key-set filter (pc.is_in inside map_batches)."""
    value_set = pa.array(keys)

    def fn(b: pa.Table) -> pa.Table:
        m = pc.is_in(b[col], value_set=value_set)
        if not keep_in:
            m = pc.invert(m)
        return b.filter(pc.fill_null(m, False) if keep_in else
                        pc.fill_null(m, True))

    return ds.map_batches(fn, batch_format="pyarrow")


def filter_join_bucketed(
    left: ray.data.Dataset,
    left_schema: pa.Schema,
    right: ray.data.Dataset,
    left_key: str,
    right_key: str,
    keep_matches: bool,
    num_buckets: int = 256,
) -> ray.data.Dataset:
    """Semi (``keep_matches=True``) / anti (``False``) join via ONE
    co-partitioned bucket shuffle — both sides are hashed on their key into
    the same bucket space and the membership test runs vectorized inside
    each bucket. No driver-side key-set materialization: the distinct right
    key set can be as large as the right table and never leaves the
    workers (the former anti-join implementation collected it with
    ``unique()`` and broadcast it — a driver OOM at scale).

    ``left_schema`` lists the left columns to carry through (the right side
    is projected to its key only).
    """
    left_cols = list(left_schema.names)
    out_names = [*left_cols, "_side", "_bucket"]

    def tag_left(b: pa.Table) -> pa.Table:
        cols = {c: b[c] for c in left_cols}
        cols["_side"] = pa.array(np.zeros(b.num_rows, np.int8))
        cols["_bucket"] = pa.array(
            _bucket_of(b[left_key].to_numpy(zero_copy_only=False), num_buckets)
        )
        return pa.table({n: cols[n] for n in out_names})

    def tag_right(b: pa.Table) -> pa.Table:
        keys = b[right_key]
        cols: dict[str, pa.Array] = {}
        for c in left_cols:
            if c == left_key:
                cols[c] = keys.cast(left_schema.field(left_key).type)
            else:
                cols[c] = pa.nulls(b.num_rows, left_schema.field(c).type)
        cols["_side"] = pa.array(np.ones(b.num_rows, np.int8))
        cols["_bucket"] = pa.array(
            _bucket_of(keys.to_numpy(zero_copy_only=False), num_buckets)
        )
        return pa.table({n: cols[n] for n in out_names})

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    def resolve(g: pa.Table) -> pa.Table:
        side = g["_side"].to_numpy()
        l_idx = np.nonzero(side == 0)[0]
        if len(l_idx) == 0:
            return left_schema.empty_table()
        keys_all = g[left_key].to_numpy(zero_copy_only=False)
        r_keys = np.unique(keys_all[np.nonzero(side == 1)[0]])
        hit = np.isin(keys_all[l_idx], r_keys, assume_unique=False)
        keep = l_idx[hit if keep_matches else ~hit]
        return g.select(left_cols).take(pa.array(keep))

    return both.groupby("_bucket").map_groups(resolve, batch_format="pyarrow")


def _pad_union(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    lcols: list[str],
    right_keep: list[str],
    left_types: dict[str, pa.DataType],
    right_types: dict[str, pa.DataType],
    bucket_left,
    bucket_right,
) -> ray.data.Dataset:
    """Union left and right under ONE shared schema: each side gains the
    other's exclusive columns as typed nulls, plus _side and _bucket
    (computed by the per-side bucket callbacks)."""
    shared = [c for c in right_keep if c in lcols]
    all_cols = [*lcols, *[c for c in right_keep if c not in lcols]]

    def tag_left(b: pa.Table) -> pa.Table:
        cols = {c: b[c] for c in lcols}
        for c in right_keep:
            if c not in lcols:
                cols[c] = pa.nulls(b.num_rows, right_types[c])
        cols["_side"] = pa.array(np.zeros(b.num_rows, np.int8))
        cols["_bucket"] = pa.array(bucket_left(b), type=pa.int64())
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        buckets, take_idx = bucket_right(b)
        if take_idx is not None:
            b = b.take(pa.array(take_idx))
        cols = {}
        for c in all_cols:
            if c in right_keep:
                cols[c] = (
                    b[c].cast(left_types[c]) if c in shared else b[c]
                )
            else:
                cols[c] = pa.nulls(b.num_rows, left_types[c])
        cols["_side"] = pa.array(np.ones(b.num_rows, np.int8))
        cols["_bucket"] = pa.array(buckets, type=pa.int64())
        return pa.table(cols)

    return left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    by: str,
    on: str,
    right_value_cols: list[str],
    num_buckets: int = 256,
    hot_keys: list | None = None,
    slice_width: int | None = None,
) -> ray.data.Dataset:
    """For each left row, attach the most recent right row of the same
    ``by`` key with ``right.on <= left.on`` (backward as-of, inclusive —
    ASOF LEFT JOIN semantics). Right-side ties on (by, on) are broken by
    keeping the last row in input order.

    One shuffle (coarse ``by``-hash bucket); inside each bucket the probe
    is a single merged lexsort + cumsum (:func:`_asof_positions`) on
    zero-copy Arrow — no pandas conversion, no per-key loop.

    **Hot-key sub-bucketing** (skew breaker): pass ``hot_keys`` (the few
    ``by`` values known/measured to dominate the stream) and
    ``slice_width`` (in ``on`` units; µs for timestamps). Hot rows are
    re-bucketed by ``(key, on // slice_width)`` so one conversation/user
    no longer concentrates a single reducer; exactness across slice
    boundaries is restored by a per-(key, slice) last-right-row summary
    (≤ |hot_keys| × |slices| rows, broadcast once via ``ray.put`` — the
    small-side pattern) that backfills left rows whose match lies in an
    earlier slice. Non-hot keys take the normal path untouched.
    """
    lcols = list(left.schema().names)
    ltypes = {f.name: f.type for f in left.schema().base_schema}
    right_keep = [by, on, *right_value_cols]
    rschema = right.schema()
    rtypes = {
        f.name: f.type for f in rschema.base_schema if f.name in right_keep
    }
    r_proj = right.map_batches(
        lambda b, keep=tuple(right_keep): b.select(list(keep)),
        batch_format="pyarrow",
    )

    hot_out = None
    if hot_keys:
        if not slice_width or slice_width <= 0:
            raise ValueError("hot_keys requires a positive slice_width")
        hot_out = _asof_join_hot(
            _filter_keys(left, by, list(hot_keys), True),
            _filter_keys(r_proj, by, list(hot_keys), True),
            by, on, right_value_cols, lcols, ltypes, rtypes, slice_width,
        )
        left = _filter_keys(left, by, list(hot_keys), False)
        r_proj = _filter_keys(r_proj, by, list(hot_keys), False)

    def bucket_left(b: pa.Table) -> np.ndarray:
        return _bucket_of(_key_mix(b[by]), num_buckets)

    def bucket_right(b: pa.Table):
        return _bucket_of(_key_mix(b[by]), num_buckets), None

    both = _pad_union(
        left, r_proj, lcols, right_keep, ltypes, rtypes,
        bucket_left, bucket_right,
    )
    kernel = _make_asof_kernel(by, on, right_value_cols, lcols, sort_out=True)
    cold = both.groupby("_bucket").map_groups(kernel, batch_format="pyarrow")
    return cold.union(hot_out) if hot_out is not None else cold


def _make_asof_kernel(
    by: str,
    on: str,
    right_value_cols: list[str],
    lcols: list[str],
    sort_out: bool,
    slice_width: int | None = None,
    fill_ref=None,
):
    """In-bucket as-of reducer (Arrow-native). With ``fill_ref`` set, left
    rows unmatched in-slice are stitched from the broadcast per-(key,
    slice) last-right summary (hot path)."""
    out_names = [*lcols, *right_value_cols]

    def kernel(g: pa.Table) -> pa.Table:
        side = g["_side"].to_numpy()
        l_idx = np.nonzero(side == 0)[0]
        r_idx = np.nonzero(side == 1)[0]
        left_tbl = g.select(lcols).take(pa.array(l_idx))
        code = _dict_codes(g[by])
        on_i = _as_i64_us(g[on])
        r_code, r_on = code[r_idx], on_i[r_idx]
        r_order = np.lexsort((r_on, r_code))
        pos = _asof_positions(
            code[l_idx], on_i[l_idx], r_code[r_order], r_on[r_order]
        )
        cols = {c: left_tbl[c] for c in lcols}
        taken = {
            c: _take_nullable(
                g[c].combine_chunks().take(pa.array(r_idx[r_order])), pos
            )
            for c in right_value_cols
        }
        if fill_ref is not None:
            miss = np.nonzero(pos < 0)[0]
            if len(miss):
                import ray as _ray

                fills = _ray.get(fill_ref)
                keys = g[by].to_numpy(zero_copy_only=False)[l_idx]
                sl = on_i[l_idx] // slice_width
                # cross-slice stitch: the forward-filled last right row of
                # the latest EARLIER slice is exactly the global backward
                # as-of answer for an in-slice miss. Python loop is over
                # in-slice misses only (bounded per sub-bucket).
                patches: dict[str, dict[int, object]] = {
                    c: {} for c in right_value_cols
                }
                for i in miss:
                    ent = fills.get(keys[i])
                    if ent is None:
                        continue
                    slices, arrs = ent
                    j = int(np.searchsorted(slices, sl[i])) - 1
                    if j < 0:
                        continue
                    for c in right_value_cols:
                        patches[c][int(i)] = arrs[c][j]
                for c, pmap in patches.items():
                    if not pmap:
                        continue
                    vals = taken[c].to_pylist()
                    for i, v in pmap.items():
                        vals[i] = None if (isinstance(v, float) and np.isnan(v)) else v
                    taken[c] = pa.array(vals, type=taken[c].type)
        cols.update(taken)
        out = pa.table({c: cols[c] for c in out_names})
        if sort_out and out.num_rows:
            order = pc.sort_indices(
                out, sort_keys=[(by, "ascending"), (on, "ascending")]
            )
            out = out.take(order)
        return out

    return kernel


def _asof_join_hot(
    l_hot: ray.data.Dataset,
    r_hot: ray.data.Dataset,
    by: str,
    on: str,
    right_value_cols: list[str],
    lcols: list[str],
    ltypes: dict[str, pa.DataType],
    rtypes: dict[str, pa.DataType],
    slice_width: int,
) -> ray.data.Dataset:
    """Hot-key path of :func:`asof_join`: (key, time-slice) sub-bucketing
    with an exact cross-slice stitch. Phase 1 reduces the right side to
    per-(key, slice) LAST rows — a map_batches partial keeps ≤ one row per
    (key, slice) per block, so the driver collect is bounded by
    |hot_keys| × |slices| × |blocks| partial rows (asserted) — and
    broadcasts the forward-fill table via ``ray.put``. Phase 2 re-buckets
    hot rows by (key, slice) — the skew-breaking shuffle — and runs the
    same vectorized in-bucket probe, stitching in-slice misses from the
    broadcast."""
    import ray

    right_keep = [by, on, *right_value_cols]

    def last_per_slice(b: pa.Table) -> pa.Table:
        on_i = _as_i64_us(b[on])
        sl = on_i // slice_width
        code = _dict_codes(b[by])
        order = np.lexsort((np.arange(b.num_rows), on_i, sl, code))
        t = b.take(pa.array(order))
        code_s, sl_s = code[order], sl[order]
        is_last = np.r_[
            (code_s[1:] != code_s[:-1]) | (sl_s[1:] != sl_s[:-1]), True
        ] if b.num_rows else np.array([], bool)
        t = t.take(pa.array(np.nonzero(is_last)[0]))
        return t.append_column(
            "_slice", pa.array(sl[order][is_last], pa.int64())
        )

    partials = r_hot.map_batches(last_per_slice, batch_format="pyarrow")
    sdf = partials.to_pandas()  # bounded: ≤ keys × slices per block
    assert len(sdf) <= 4_000_000, (
        "hot-key slice summary unexpectedly large — widen slice_width"
    )
    if len(sdf):
        sdf["_on_i"] = _as_i64_us(sdf[on])
        sdf = (
            sdf.sort_values([by, "_slice", "_on_i"], kind="stable")
            .drop_duplicates([by, "_slice"], keep="last")
            .reset_index(drop=True)
        )
    fill: dict = {}
    for k, grp in sdf.groupby(by, sort=False) if len(sdf) else []:
        fill[k] = (
            grp["_slice"].to_numpy(),
            {c: grp[c].to_numpy() for c in right_keep},
        )
    fill_ref = ray.put(fill)

    def bucket_left(b: pa.Table) -> np.ndarray:
        sl = _as_i64_us(b[on]) // slice_width
        return _key_mix(b[by]) * np.int64(131071) + sl

    def bucket_right(b: pa.Table):
        sl = _as_i64_us(b[on]) // slice_width
        return _key_mix(b[by]) * np.int64(131071) + sl, None

    both = _pad_union(
        l_hot, r_hot, lcols, right_keep, ltypes, rtypes,
        bucket_left, bucket_right,
    )
    kernel = _make_asof_kernel(
        by, on, right_value_cols, lcols, sort_out=False,
        slice_width=slice_width, fill_ref=fill_ref,
    )
    return both.groupby("_bucket").map_groups(kernel, batch_format="pyarrow")


def range_join_agg(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    by: str,
    on: str,
    value_col: str,
    window: int,
    num_buckets: int = 256,
    hot_keys: list | None = None,
    slice_width: int | None = None,
) -> ray.data.Dataset:
    """Range join + aggregate: for each left row, count/sum right rows of
    the same ``by`` key with ``l.on < r.on <= l.on + window`` (µs for
    temporal ``on`` columns — normalized explicitly; integer columns are
    taken as-is). Same bucket-shuffle shape as asof_join; inside a bucket
    the window reduce is two vectorized as-of probes against per-key
    cumulative (count, longdouble-sum) arrays — fully C-vectorized on
    Arrow, no pandas, no per-key loop.

    **Hot-key sub-bucketing**: with ``hot_keys`` + ``slice_width``
    (must be ≥ ``window``), hot rows re-bucket on
    ``(key, on // slice_width)``; right rows whose window straddles a
    slice boundary are duplicated into the previous slice (≤2× for the
    hot key only), so every left row's full window is resolved inside its
    own sub-bucket — exact, no stitch phase.
    """
    lcols = list(left.schema().names)
    ltypes = {f.name: f.type for f in left.schema().base_schema}
    right_keep = [by, on, value_col]
    rtypes = {
        f.name: f.type
        for f in right.schema().base_schema
        if f.name in right_keep
    }
    r_proj = right.map_batches(
        lambda b, keep=tuple(right_keep): b.select(list(keep)),
        batch_format="pyarrow",
    )

    kernel = _make_range_kernel(by, on, value_col, lcols, window)

    hot_out = None
    if hot_keys:
        if not slice_width or slice_width < window:
            raise ValueError("slice_width must be >= window for hot_keys")
        l_hot = _filter_keys(left, by, list(hot_keys), True)
        r_hot = _filter_keys(r_proj, by, list(hot_keys), True)

        def bucket_left_hot(b: pa.Table) -> np.ndarray:
            sl = _as_i64_us(b[on]) // slice_width
            return _key_mix(b[by]) * np.int64(131071) + sl

        def bucket_right_hot(b: pa.Table):
            on_i = _as_i64_us(b[on])
            sl = on_i // slice_width
            kmix = _key_mix(b[by])
            native = kmix * np.int64(131071) + sl
            # right rows reachable from the previous slice's left rows
            # (r_on mod slice_width < window) are duplicated there too
            straddle = np.nonzero((on_i % slice_width) < window)[0]
            buckets = np.concatenate(
                [native, kmix[straddle] * np.int64(131071) + sl[straddle] - 1]
            )
            take_idx = np.concatenate(
                [np.arange(b.num_rows, dtype=np.int64), straddle]
            )
            return buckets, take_idx

        both_hot = _pad_union(
            l_hot, r_hot, lcols, right_keep, ltypes, rtypes,
            bucket_left_hot, bucket_right_hot,
        )
        hot_out = both_hot.groupby("_bucket").map_groups(
            kernel, batch_format="pyarrow"
        )
        left = _filter_keys(left, by, list(hot_keys), False)
        r_proj = _filter_keys(r_proj, by, list(hot_keys), False)

    def bucket_left(b: pa.Table) -> np.ndarray:
        return _bucket_of(_key_mix(b[by]), num_buckets)

    def bucket_right(b: pa.Table):
        return _bucket_of(_key_mix(b[by]), num_buckets), None

    both = _pad_union(
        left, r_proj, lcols, right_keep, ltypes, rtypes,
        bucket_left, bucket_right,
    )
    cold = both.groupby("_bucket").map_groups(kernel, batch_format="pyarrow")
    return cold.union(hot_out) if hot_out is not None else cold


def _make_range_kernel(
    by: str, on: str, value_col: str, lcols: list[str], window: int
):
    out_names = [*lcols, "n_in_window", "sum_in_window"]

    def kernel(g: pa.Table) -> pa.Table:
        side = g["_side"].to_numpy()
        l_idx = np.nonzero(side == 0)[0]
        r_idx = np.nonzero(side == 1)[0]
        left_tbl = g.select(lcols).take(pa.array(l_idx))
        nl = len(l_idx)
        n = np.zeros(nl, np.int64)
        s = np.zeros(nl, np.float64)
        if nl and len(r_idx):
            code = _dict_codes(g[by])
            on_i = _as_i64_us(g[on])
            l_code, l_on = code[l_idx], on_i[l_idx]
            r_code, r_on = code[r_idx], on_i[r_idx]
            r_val = (
                g[value_col]
                .to_numpy(zero_copy_only=False)[r_idx]
                .astype(np.float64)
            )
            r_order = np.lexsort((r_on, r_code))
            rc, ro, rv = r_code[r_order], r_on[r_order], r_val[r_order]
            # per-key cumulative count / sum on the sorted right side;
            # longdouble accumulation keeps the cross-key cumsum-diff
            # error below the 4-decimal rounding
            starts = np.nonzero(np.r_[True, rc[1:] != rc[:-1]])[0]
            grp_start = starts[
                np.searchsorted(starts, np.arange(len(rc)), side="right") - 1
            ]
            cnt = np.arange(len(rc)) - grp_start + 1
            total = np.cumsum(rv.astype(np.longdouble))
            base = np.where(grp_start > 0, total[grp_start - 1], 0.0)
            cum = total - base
            pos0 = _asof_positions(l_code, l_on, rc, ro)
            pos1 = _asof_positions(l_code, l_on + window, rc, ro)

            def look(pos: np.ndarray, arr: np.ndarray, fill):
                safe = np.where(pos >= 0, pos, 0)
                return np.where(pos >= 0, arr[safe], fill)

            # probes can land in different per-key runs only when a probe
            # misses entirely (pos=-1 → 0 contribution); within a key,
            # pos1 >= pos0, so the diff is the exact window aggregate
            n[:] = look(pos1, cnt, 0) - look(pos0, cnt, 0)
            s[:] = (
                look(pos1, cum, np.longdouble(0.0))
                - look(pos0, cum, np.longdouble(0.0))
            ).astype(np.float64)
        cols = {c: left_tbl[c] for c in lcols}
        cols["n_in_window"] = pa.array(n, pa.int64())
        cols["sum_in_window"] = pa.array(np.round(s, 4), pa.float64())
        return pa.table({c: cols[c] for c in out_names})

    return kernel


def sliding_window_sum(
    ds: ray.data.Dataset,
    by: str,
    day_col_source: str,
    value_col: str,
    window_days: int = 7,
    num_buckets: int = 256,
) -> ray.data.Dataset:
    """Per-(by, day) rolling ``window_days``-day sum of ``value_col``
    (RANGE frame over calendar days, missing days respected). Daily partial
    agg inside map_batches, one bucket shuffle, prefix-sum + searchsorted
    inside each bucket (the in-bucket input is already day-level partials —
    dimension-sized, not row-sized)."""
    import pyarrow.compute as pc

    def daily(b: pa.Table) -> pa.Table:
        df = pa.table(
            {
                by: b[by],
                "day": pc.strftime(b[day_col_source], format="%Y-%m-%d"),
                value_col: b[value_col],
            }
        ).to_pandas()
        g = df.groupby([by, "day"], as_index=False).agg(v=(value_col, "sum"))
        g["_bucket"] = _bucket_of(g[by].to_numpy(), num_buckets)
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(daily, batch_format="pyarrow")

    def roll_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = (
            g.groupby([by, "day"], as_index=False).agg(v=("v", "sum"))
            .sort_values([by, "day"], kind="stable")
            .reset_index(drop=True)
        )
        day_ord = pd.to_datetime(g["day"]).map(pd.Timestamp.toordinal).to_numpy()
        keys = g[by].to_numpy()
        v = g["v"].to_numpy()
        out = np.empty(len(g))
        # per-key vectorized: prefix sums + searchsorted for the frame start
        key_change = np.r_[True, keys[1:] != keys[:-1]]
        starts = np.nonzero(key_change)[0]
        ends = np.append(starts[1:], len(g))
        for s, e in zip(starts, ends):
            pref = np.concatenate([[0.0], np.cumsum(v[s:e])])
            lo = np.searchsorted(day_ord[s:e], day_ord[s:e] - (window_days - 1), side="left")
            out[s:e] = pref[np.arange(1, e - s + 1)] - pref[lo]
        g["v7"] = np.round(out, 4)
        return g[[by, "day", "v7"]]

    return partials.groupby("_bucket").map_groups(roll_bucket, batch_format="pandas")
