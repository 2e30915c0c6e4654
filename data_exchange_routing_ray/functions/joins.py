"""Temporal join operators Ray Data lacks natively: as-of join, sliding
windows.

Scale shape (documented partitioning assumption): both sides are bucketed
by ``hash(by) % num_buckets`` — the ONE shuffle — and the temporal logic
runs vectorized inside each bucket (``pd.merge_asof`` / prefix sums), so a
bucket must hold every row of the ``by`` keys it owns. Hot keys are fine
(a bucket is processed columnar, not per key); keys never span buckets.

The reference has no as-of/range joins (SURVEY.md §2.4); its merge-apply is
the degenerate latest-per-key case. These are the general operators.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _bucket_of(keys: np.ndarray, num_buckets: int) -> np.ndarray:
    return ((keys.astype(np.int64).view(np.uint64) * _MIX) % np.uint64(
        num_buckets
    )).astype(np.int64)


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


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    by: str,
    on: str,
    right_value_cols: list[str],
    num_buckets: int = 256,
) -> ray.data.Dataset:
    """For each left row, attach the most recent right row of the same
    ``by`` key with ``right.on <= left.on`` (backward as-of, inclusive —
    ASOF LEFT JOIN semantics). Right-side ties on (by, on) are broken by
    keeping the last row in input order.

    One shuffle (coarse ``by``-hash bucket); ``pd.merge_asof`` inside each
    bucket does the vectorized scan.
    """

    def tag(side: int):
        def fn(b: pa.Table) -> pa.Table:
            k = b[by].to_numpy()
            b = b.append_column("_bucket", pa.array(_bucket_of(k, num_buckets)))
            return b.append_column(
                "_side", pa.array(np.full(b.num_rows, side, np.int8), pa.int8())
            )

        return fn

    lcols = left.schema().names
    right_keep = [by, on, *right_value_cols]

    def norm_right(b: pa.Table) -> pa.Table:
        return b.select(right_keep)

    l_tagged = left.map_batches(tag(0), batch_format="pyarrow")
    r_tagged = right.map_batches(norm_right, batch_format="pyarrow").map_batches(
        tag(1), batch_format="pyarrow"
    )
    both = l_tagged.union(r_tagged)

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lf = g[g["_side"] == 0]
        rf = g[g["_side"] == 1]
        lf = lf[[c for c in lf.columns if c not in ("_bucket", "_side")]]
        lf = lf[[c for c in lf.columns if c in lcols]]
        if rf.empty:
            out = lf.copy()
            for c in right_value_cols:
                out[c] = np.nan
            return out.sort_values([by, on], kind="stable")
        rf = rf[right_keep].sort_values([by, on], kind="stable")
        # ties on (by, on): keep the last delivered right row
        rf = rf.drop_duplicates([by, on], keep="last")
        lf = lf.sort_values(on, kind="stable")
        rf = rf.sort_values(on, kind="stable")
        out = pd.merge_asof(
            lf, rf, on=on, by=by, direction="backward", allow_exact_matches=True
        )
        return out.sort_values([by, on], kind="stable")

    return both.groupby("_bucket").map_groups(join_bucket, batch_format="pandas")


def _as_i64_us(s: pd.Series) -> np.ndarray:
    """Integer view of the on-column: temporal dtypes are normalized to
    MICROSECONDS explicitly (pandas/pyarrow may surface a us Arrow column
    as datetime64[ns]; a blind .astype(int64) would silently turn a caller's
    µs window into a ns window — 3600s becoming 3.6ms)."""
    v = s.to_numpy()
    if np.issubdtype(v.dtype, np.datetime64):
        return v.astype("datetime64[us]").view("i8")
    return v.astype(np.int64)


def range_join_agg(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    by: str,
    on: str,
    value_col: str,
    window: int,
    num_buckets: int = 256,
) -> ray.data.Dataset:
    """Range join + aggregate: for each left row, count/sum right rows of
    the same ``by`` key with ``l.on < r.on <= l.on + window`` (µs for
    temporal ``on`` columns — normalized explicitly; integer columns are
    taken as-is). Same bucket-shuffle shape as asof_join; inside a bucket
    the window reduce is two ``pd.merge_asof`` probes against per-key
    cumulative (count, sum) columns — fully C-vectorized, no per-key Python
    loop (a bucket of millions of single-row keys costs two sorted merges,
    not millions of iterations)."""

    def tag(side: int, keep: list[str]):
        def fn(b: pa.Table) -> pa.Table:
            b = b.select(keep)
            k = b[by].to_numpy()
            b = b.append_column("_bucket", pa.array(_bucket_of(k, num_buckets)))
            return b.append_column(
                "_side", pa.array(np.full(b.num_rows, side, np.int8), pa.int8())
            )

        return fn

    lcols = left.schema().names
    l_tagged = left.map_batches(tag(0, lcols), batch_format="pyarrow")
    r_tagged = right.map_batches(
        tag(1, [by, on, value_col]), batch_format="pyarrow"
    )
    both = l_tagged.union(r_tagged)

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lf = g[g["_side"] == 0].sort_values([by, on], kind="stable")
        rf = g[g["_side"] == 1]
        out = lf[[c for c in lcols]].copy()
        n = np.zeros(len(lf), dtype=np.int64)
        s = np.zeros(len(lf), dtype=np.float64)
        if len(rf) and len(lf):
            # per-key cumulative (count, value-sum) on the right side; each
            # left bound is then ONE backward as-of probe:
            #   count(r_on <= x) = _cnt at the last right row with r_on <= x
            # window count = probe(l_on + window) - probe(l_on)  [strict >,
            # inclusive upper — matches searchsorted(side='right') on both]
            R = pd.DataFrame(
                {
                    by: rf[by].to_numpy(),
                    "_on": _as_i64_us(rf[on]),
                    "_val": rf[value_col].to_numpy().astype(np.float64),
                }
            ).sort_values([by, "_on"], kind="stable")
            grp = R.groupby(by, sort=False)
            R["_cnt"] = grp.cumcount() + 1
            R["_cum"] = grp["_val"].cumsum()
            R = R.sort_values("_on", kind="stable")[[by, "_on", "_cnt", "_cum"]]
            L = pd.DataFrame(
                {by: lf[by].to_numpy(), "_on": _as_i64_us(lf[on])}
            )
            L["_i"] = np.arange(len(L))
            L0 = L.sort_values("_on", kind="stable")
            m0 = pd.merge_asof(L0, R, on="_on", by=by, direction="backward")
            L1 = L0.assign(_on=L0["_on"] + window)
            m1 = pd.merge_asof(L1, R, on="_on", by=by, direction="backward")
            dn = (
                m1["_cnt"].fillna(0).to_numpy() - m0["_cnt"].fillna(0).to_numpy()
            ).astype(np.int64)
            dv = m1["_cum"].fillna(0.0).to_numpy() - m0["_cum"].fillna(0.0).to_numpy()
            idx = m0["_i"].to_numpy()
            n[idx] = dn
            s[idx] = dv
        out["n_in_window"] = n
        out["sum_in_window"] = np.round(s, 4)
        return out

    return both.groupby("_bucket").map_groups(join_bucket, batch_format="pandas")


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
    inside each bucket."""
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
