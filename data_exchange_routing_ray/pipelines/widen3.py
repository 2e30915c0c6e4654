"""Round-3 widening batch B: linear-algebra partials over embeddings,
skew-salted shuffle join, TTL-stateful stream-stream attribution, schema
drift audit, retention-window vacuum.

Each operator documents its 100 TB shape inline. Reference parity notes:
the reference routing service (CDCgov/data-exchange-routing) has no linear
algebra / attribution analogs — these are the training-data-pipeline
addenda the build brief asks for; the vacuum query extends the lake's
Delta-VACUUM-style file GC (see ``pipelines/cdc.py::CDCLake.vacuum``)
with a time-travel retention window.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

EMB_DIM = 64


def _emb_vectors(sf_dir: str, min_blocks: int = 16) -> ray.data.Dataset:
    from data_exchange_routing_ray.pipelines.events_cdc import _read_sized

    return _read_sized(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["embedding"],
        min_blocks=min_blocks,
    )


# ------------------------------------------------------- second moments / PCA


def _moment_partials(ds: ray.data.Dataset, dims: int) -> tuple[int, np.ndarray, np.ndarray]:
    """One streaming pass: per-block (n, Σx, ΣxᵀX) partials, reduced on the
    driver. Each partial is O(dims²) REGARDLESS of block size, so the
    driver gather is bounded by #blocks × dims² — at 100 TB with 128 MB
    blocks that is ~800k × (64² + 64) float64 ≈ 26 GB worth of partials for
    the full Gram, which is why ``partial`` pre-reduces to ONE row per
    block and the final fold is a tree-friendly sum over a tiny table
    (take_all of #blocks rows; for >10⁶ blocks add one combine stage:
    ``.map_batches(sum_rows, batch_size=4096)`` keeps the gather constant).
    """

    def partial(b: pa.Table) -> pa.Table:
        flat = np.asarray(b["embedding"].combine_chunks().flatten(), dtype=np.float64)
        x = flat.reshape(-1, EMB_DIM)[:, :dims]
        g = x.T @ x
        return pa.table(
            {
                "n": pa.array([x.shape[0]], pa.int64()),
                "s": pa.array([x.sum(axis=0).tolist()], pa.list_(pa.float64())),
                "g": pa.array([g.ravel().tolist()], pa.list_(pa.float64())),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    n = int(sum(p["n"] for p in parts))
    s = np.sum([np.asarray(p["s"]) for p in parts], axis=0)
    g = np.sum([np.asarray(p["g"]).reshape(dims, dims) for p in parts], axis=0)
    return n, s, g


def emb_covariance_dims(sf_dir: str, dims: int = 8) -> pa.Table:
    """Exact population covariance of the first ``dims`` embedding
    dimensions via distributed Gram partials (the feature-covariance
    profile a training pipeline computes per shard before whitening).

    Scale shape: one ``map_batches`` pass emitting an O(dims²) partial per
    block; no shuffle at all — the reduce is a driver fold over #blocks
    tiny rows (see ``_moment_partials``). Values are scaled ×10⁶ and
    rounded to 6 dp on BOTH sides of the oracle so float summation order
    cannot flip the comparison."""
    n, s, g = _moment_partials(_emb_vectors(sf_dir), dims)
    cov = (g - np.outer(s, s) / n) / n
    ii, jj = np.triu_indices(dims)
    return pa.table(
        {
            "i": pa.array((ii + 1).astype(np.int64)),
            "j": pa.array((jj + 1).astype(np.int64)),
            "cov_e6": pa.array(np.round(cov[ii, jj] * 1e6, 6)),
        }
    )


def emb_covariance_dims_sql(dims: int = 8) -> str:
    """DuckDB oracle: same ×10⁶-scaled covariance from SUM formulas (one
    scan, 36 unpivoted rows)."""
    cols = ", ".join(
        f"CAST(embedding[{k}] AS DOUBLE) AS e{k}" for k in range(1, dims + 1)
    )
    sums = ["count(*)::DOUBLE AS n"]
    sums += [f"sum(e{k}) AS s{k}" for k in range(1, dims + 1)]
    sums += [
        f"sum(e{i}*e{j}) AS p{i}_{j}"
        for i in range(1, dims + 1)
        for j in range(i, dims + 1)
    ]
    rows = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS i, CAST({j} AS BIGINT) AS j, "
        f"round((p{i}_{j} - s{i}*s{j}/n)/n * 1e6, 6) AS cov_e6 FROM s"
        for i in range(1, dims + 1)
        for j in range(i, dims + 1)
    )
    return (
        f"WITH x AS (SELECT {cols} FROM embeddings), "
        f"s AS (SELECT {', '.join(sums)} FROM x) {rows}"
    )


def emb_pca_project(sf_dir: str, k: int = 4) -> pa.Table:
    """Distributed PCA: full 64×64 covariance from one partials pass,
    eigendecomposition on the driver (64×64 — trivially small), then a
    SECOND streaming pass projects every embedding onto the top-k
    components and folds per-label mean coordinates. Component sign is
    fixed deterministically (largest-|v| entry made positive) so results
    are reproducible across eigensolver builds.

    Scale shape: two scans, zero shuffles. Pass 1 partials are O(64²)
    per block; pass 2 partials are O(labels × k) per block; both reduce
    on the driver over #blocks rows. In-query gates assert orthonormality
    and descending eigenvalues; exactness vs serial numpy PCA is pinned by
    ``tests/test_widen3_ops.py``."""
    from data_exchange_routing_ray.pipelines.events_cdc import _read_sized

    n, s, g = _moment_partials(_emb_vectors(sf_dir), EMB_DIM)
    mean = s / n
    cov = (g - np.outer(s, s) / n) / n
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    evals, evecs = evals[order], evecs[:, order]
    flip = evecs[np.argmax(np.abs(evecs), axis=0), np.arange(k)] < 0
    evecs = evecs * np.where(flip, -1.0, 1.0)
    # in-query gates: the decomposition must be a valid PCA basis
    assert np.allclose(evecs.T @ evecs, np.eye(k), atol=1e-8), "not orthonormal"
    assert np.all(np.diff(evals) <= 1e-12), "eigenvalues not descending"
    assert evals[0] <= np.trace(cov) + 1e-9, "component variance exceeds total"

    v_ref = ray.put((mean, evecs))  # broadcast once, read per task

    def project(b: pa.Table) -> pa.Table:
        mu, v = ray.get(v_ref)
        flat = np.asarray(b["embedding"].combine_chunks().flatten(), dtype=np.float64)
        x = flat.reshape(-1, EMB_DIM) - mu
        proj = x @ v  # (rows, k)
        lab = b["label"].to_numpy()
        df = pd.DataFrame(proj, columns=[f"c{i}" for i in range(k)])
        df["label"] = lab
        agg = df.groupby("label").agg(["sum", "count"])
        out = {"label": agg.index.to_numpy().astype(np.int64)}
        for i in range(k):
            out[f"sum_c{i}"] = agg[(f"c{i}", "sum")].to_numpy()
        out["cnt"] = agg[("c0", "count")].to_numpy().astype(np.int64)
        return pa.table(out)

    parts = (
        _read_sized(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["embedding", "label"],
        )
        .map_batches(project, batch_format="pyarrow")
        .take_all()
    )
    df = pd.DataFrame(parts).groupby("label", as_index=False).sum()
    total_var = float(np.trace(cov))
    rows = []
    for _, r in df.sort_values("label").iterrows():
        for i in range(k):
            rows.append(
                {
                    "label": int(r["label"]),
                    "component": i,
                    "mean_coord": round(float(r[f"sum_c{i}"] / r["cnt"]), 9),
                    "explained_var_ratio": round(float(evals[i] / total_var), 9),
                }
            )
    return pa.Table.from_pylist(rows)


# ------------------------------------------------------- skew-salted join


def join_salted_hotkey(
    sf_dir: str, n_keys: int = 1000, n_salt: int = 8, hot_frac: float = 0.05
) -> pa.Table:
    """Shuffle join with explicit hot-key salting. A planted skew key
    (50% of events land on key 42) would put half the table in one
    reducer of a naive hash join; instead the stream side salts hot keys
    into ``n_salt`` sub-partitions and the dim side replicates its hot
    rows once per salt, so the exchange is balanced and results are
    IDENTICAL to the unsalted join (the DuckDB oracle is the plain join).

    Scale shape: hot keys are detected from per-block count partials
    (bounded: #blocks × keys-per-block rows, and at web scale the census
    would sample blocks — here key cardinality is bounded by ``n_keys``);
    the salted exchange is ONE groupby on the composite (key, salt)
    bucket; per-group work is a vectorized merge + partial aggregate; the
    final fold is a tiny per-segment groupby. Dim rows ship salt-many
    copies for hot keys only — cold keys pay no replication."""
    from data_exchange_routing_ray.pipelines.events_cdc import _events

    ev = _events(sf_dir, columns=["event_id", "user_id", "value"])

    def keyed(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy()
        uid = b["user_id"].to_numpy()
        key = np.where(eid % 2 == 0, 42, uid % n_keys).astype(np.int64)
        return pa.table(
            {"k": key, "event_id": eid, "value": b["value"]}
        )

    fact = ev.map_batches(keyed, batch_format="pyarrow")

    # census: per-block exact key counts (cardinality ≤ n_keys per block)
    def census(b: pa.Table) -> pa.Table:
        k, c = np.unique(b["k"].to_numpy(), return_counts=True)
        return pa.table({"k": k, "c": c.astype(np.int64)})

    counts = pd.DataFrame(
        fact.map_batches(census, batch_format="pyarrow").take_all()
    ).groupby("k")["c"].sum()
    total = int(counts.sum())
    hot = set(counts[counts > hot_frac * total].index.tolist())
    assert 42 in hot, "planted hot key must be detected by the census"

    dim = pd.DataFrame(
        {"k": np.arange(n_keys, dtype=np.int64)}
    )
    dim["seg"] = "seg-" + (dim["k"] % 7).astype(str)
    hot_arr = np.array(sorted(hot), dtype=np.int64)

    def salt_fact(b: pa.Table) -> pa.Table:
        k = b["k"].to_numpy()
        eid = b["event_id"].to_numpy()
        is_hot = np.isin(k, hot_arr)
        salt = np.where(is_hot, eid % n_salt, 0).astype(np.int64)
        return pa.table(
            {
                "bucket": k * n_salt + salt,
                "k": k,
                "seg": pa.nulls(len(k), pa.string()),
                "value": b["value"],
                "side": np.zeros(len(k), np.int8),
            }
        )

    # dim side: cold rows → salt 0; hot rows → replicated once per salt
    cold = dim[~dim["k"].isin(hot)].copy()
    cold["bucket"] = cold["k"] * n_salt
    hot_rows = dim[dim["k"].isin(hot)]
    reps = hot_rows.loc[hot_rows.index.repeat(n_salt)].reset_index(drop=True)
    reps["bucket"] = reps["k"] * n_salt + np.tile(
        np.arange(n_salt, dtype=np.int64), len(hot_rows)
    )
    dim_all = pd.concat([cold, reps], ignore_index=True)
    dim_tbl = pa.table(
        {
            "bucket": dim_all["bucket"].to_numpy(),
            "k": dim_all["k"].to_numpy(),
            "seg": pa.array(dim_all["seg"].tolist(), pa.string()),
            "value": np.zeros(len(dim_all), np.float64),
            "side": np.ones(len(dim_all), np.int8),
        }
    )

    salted = fact.map_batches(salt_fact, batch_format="pyarrow").union(
        ray.data.from_arrow(dim_tbl)
    )

    def join_group(g: pd.DataFrame) -> pd.DataFrame:
        d = g[g["side"] == 1]
        f = g[g["side"] == 0]
        if d.empty or f.empty:
            return pd.DataFrame(
                {
                    "seg": pd.Series([], dtype=str),
                    "cnt": pd.Series([], dtype="int64"),
                    "sv": pd.Series([], dtype="float64"),
                }
            )
        m = f[["k", "value"]].merge(d[["k", "seg"]], on="k", how="inner")
        out = m.groupby("seg").agg(cnt=("value", "size"), sv=("value", "sum"))
        return out.reset_index()

    parts = salted.groupby("bucket").map_groups(
        join_group, batch_format="pandas"
    ).to_pandas()
    final = parts.groupby("seg", as_index=False).sum().sort_values("seg")
    return pa.table(
        {
            "seg": pa.array(final["seg"].tolist(), pa.string()),
            "cnt": final["cnt"].to_numpy().astype(np.int64),
            "sum_value": np.round(final["sv"].to_numpy(), 6),
        }
    )


JOIN_SALTED_HOTKEY_SQL = """
WITH f AS (
  SELECT CASE WHEN event_id % 2 = 0 THEN 42 ELSE user_id % 1000 END AS k, value
  FROM events
),
d AS (SELECT k, 'seg-' || CAST(k % 7 AS VARCHAR) AS seg FROM range(1000) t(k))
SELECT seg, count(*) AS cnt, round(sum(value), 6) AS sum_value
FROM f JOIN d USING (k) GROUP BY seg ORDER BY seg
"""


# ---------------------------------------------- TTL stream-stream attribution


@ray.remote(num_cpus=0.5)
class _TTLBucketActor:
    """Per-bucket streaming state for windowed click→purchase attribution:
    holds UNMATCHED clicks only, evicts on watermark advance. The bounded
    state (clicks younger than watermark − W) is the whole point — a 10¹⁰
    event stream never materializes, only the live window does."""

    def __init__(self, window_us: int):
        self.window_us = window_us
        # pending unmatched clicks: parallel arrays (user, ts_us)
        self.p_user = np.empty(0, np.int64)
        self.p_ts = np.empty(0, np.int64)
        # per-user rolling counts
        self.counts: dict[int, list[int]] = {}

    def _bump(self, users: np.ndarray, col: int, by: np.ndarray | None = None) -> None:
        if by is None:
            by = np.ones(len(users), np.int64)
        for u, n in zip(users.tolist(), by.tolist()):
            c = self.counts.setdefault(u, [0, 0, 0])
            c[col] += n

    def ingest(self, table: pa.Table, watermark_us: int) -> int:
        """One epoch's (ts-ordered range) events for this bucket. Epochs
        arrive in global ts order; ``watermark_us`` is the epoch's upper
        boundary — after this call no event with ts < watermark will ever
        arrive, so pending clicks older than watermark − W are evicted."""
        u = table["user"].to_numpy()
        ts = table["ts_us"].to_numpy()
        is_click = table["is_click"].to_numpy()
        cu, cts = u[is_click], ts[is_click]
        if len(cu):
            uu, cc = np.unique(cu, return_counts=True)
            self._bump(uu, 0, cc.astype(np.int64))
        # combine pending + new clicks, match against this epoch's purchases
        au = np.concatenate([self.p_user, cu])
        ats = np.concatenate([self.p_ts, cts])
        pu, pts = u[~is_click], ts[~is_click]
        if len(au):
            if len(pu):
                # first purchase strictly after each click, same user:
                # sort both sides by (user, ts); vectorized merge_asof
                c_ord = np.lexsort((ats, au))
                p_ord = np.lexsort((pts, pu))
                cdf = pd.DataFrame({"user": au[c_ord], "ts": ats[c_ord]})
                pdf = pd.DataFrame({"user": pu[p_ord], "ts": pts[p_ord]})
                m = pd.merge_asof(
                    cdf.sort_values("ts", kind="stable"),
                    pdf.sort_values("ts", kind="stable").rename(columns={"ts": "pts"}),
                    left_on="ts", right_on="pts", by="user",
                    direction="forward", allow_exact_matches=False,
                )
                matched = m["pts"].notna() & (m["pts"] <= m["ts"] + self.window_us)
                # purchase seen after window closed ⇒ definitively evicted
                dead = m["pts"].notna() & ~matched
                conv_users = m.loc[matched, "user"].to_numpy()
                if len(conv_users):
                    uu, cc = np.unique(conv_users, return_counts=True)
                    self._bump(uu, 1, cc)
                ev_users = m.loc[dead, "user"].to_numpy()
                if len(ev_users):
                    uu, cc = np.unique(ev_users, return_counts=True)
                    self._bump(uu, 2, cc)
                keep = ~(matched | dead)
                au = m.loc[keep, "user"].to_numpy()
                ats = m.loc[keep, "ts"].to_numpy()
            # watermark eviction: no future event can land in (ts, ts+W]
            expired = ats + self.window_us < watermark_us
            if expired.any():
                uu, cc = np.unique(au[expired], return_counts=True)
                self._bump(uu, 2, cc)
            au, ats = au[~expired], ats[~expired]
        self.p_user, self.p_ts = au, ats
        return int(len(self.p_user))

    def flush(self) -> pa.Table:
        """End of stream: everything still pending is evicted."""
        if len(self.p_user):
            uu, cc = np.unique(self.p_user, return_counts=True)
            self._bump(uu, 2, cc)
            self.p_user = np.empty(0, np.int64)
            self.p_ts = np.empty(0, np.int64)
        users = sorted(self.counts)
        return pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "clicks": pa.array([self.counts[u][0] for u in users], pa.int64()),
                "converted": pa.array([self.counts[u][1] for u in users], pa.int64()),
                "evicted": pa.array([self.counts[u][2] for u in users], pa.int64()),
            }
        )


def stream_click_attribution_ttl(
    sf_dir: str, window_s: int = 3600, n_buckets: int = 8, n_epochs: int = 4
) -> pa.Table:
    """Stream-stream join with TTL state eviction: clicks match the first
    purchase by the same user within (ts, ts+W]; unmatched clicks are
    EVICTED once the watermark passes ts+W (bounded state — the streaming
    analog of ``followup_within_window``'s batch merge_asof). The stream
    is replayed as ``n_epochs`` ts-range epochs through bucket-pinned
    actors holding only live-window state; matches must cross epoch
    boundaries (a click pending at epoch end matches a purchase in the
    next epoch), which is exactly what the actor state exists for.

    Scale shape: per-epoch ONE user-hash bucket shuffle of the two event
    types (filtered at the read); actor state is bounded by clicks inside
    the live window, never the stream; the final gather is per-user counts
    from ``n_buckets`` actors. Oracle: plain SQL EXISTS-within-window —
    converted + evicted must equal clicks exactly."""
    from data_exchange_routing_ray.pipelines.events_cdc import _events

    window_us = window_s * 1_000_000
    # min/max as µs ints — one pruned scan computing both aggregates
    from data_exchange_routing_ray.pipelines.widen5 import _ts_bounds_us

    tmin, tmax = _ts_bounds_us(sf_dir)
    bounds = [tmin + ((tmax - tmin + 1) * i) // n_epochs for i in range(n_epochs)]
    bounds.append(tmax + 1)

    # bucket count changes only state placement, never the match result
    from data_exchange_routing_ray.runtime import cap_actor_pool

    n_buckets = cap_actor_pool(n_buckets)
    actors = [
        _TTLBucketActor.remote(window_us) for _ in range(n_buckets)
    ]

    def make_bucketed(lo_us: int, hi_us: int):
        def to_bucketed(b: pa.Table) -> pa.Table:
            m = pc.is_in(b["event_type"], value_set=pa.array(["click", "purchase"]))
            b = b.filter(m)
            u = b["user_id"].to_numpy()
            ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            keep = (ts >= lo_us) & (ts < hi_us)
            u, ts = u[keep], ts[keep]
            return pa.table(
                {
                    "bucket": (u % n_buckets).astype(np.int64),
                    "user": u.astype(np.int64),
                    "ts_us": ts,
                    "is_click": pa.array(
                        pc.equal(b["event_type"], "click")
                        .combine_chunks()
                        .to_numpy(zero_copy_only=False)[keep]
                    ),
                }
            )

        return to_bucketed

    for e in range(n_epochs):
        lo_us, hi_us = bounds[e], bounds[e + 1]
        epoch = _events(sf_dir, columns=["user_id", "event_type", "ts"]).map_batches(
            make_bucketed(lo_us, hi_us), batch_format="pyarrow"
        )
        wm = hi_us

        def send(g: pa.Table) -> pa.Table:
            bkt = int(g["bucket"][0].as_py())
            pending = ray.get(actors[bkt].ingest.remote(g, wm))
            return pa.table({"bucket": [bkt], "pending": [pending]})

        # barrier per epoch: every bucket must finish epoch e before e+1
        # (watermark order is the correctness invariant)
        epoch.groupby("bucket").map_groups(send, batch_format="pyarrow").materialize()

    tables = ray.get([a.flush.remote() for a in actors])
    out = pa.concat_tables([t for t in tables if t.num_rows])
    out = out.sort_by("user_id")
    assert pc.all(
        pc.equal(pc.add(out["converted"], out["evicted"]), out["clicks"])
    ).as_py(), "converted + evicted must account for every click"
    return out


STREAM_CLICK_ATTRIBUTION_SQL = """
WITH c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
m AS (
  SELECT c.user_id,
         CASE WHEN EXISTS (
           SELECT 1 FROM p WHERE p.user_id = c.user_id
             AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
         ) THEN 1 ELSE 0 END AS conv
  FROM c
)
SELECT user_id, count(*) AS clicks,
       CAST(sum(conv) AS BIGINT) AS converted,
       CAST(count(*) - sum(conv) AS BIGINT) AS evicted
FROM m GROUP BY user_id ORDER BY user_id
"""


# ------------------------------------------------------- schema drift audit


def schema_drift_audit(sf_dir: str) -> pa.Table:
    """Per-period, per-column null census over the CORRUPTED change stream
    (the schema-drift monitor an ingest pipeline runs per epoch: a jump in
    a column's null fraction between periods is the canonical upstream-
    schema-change signal). Periods are event_id halves so the audit is
    deterministic.

    Scale shape: one pass; each block emits ONE partial row per (period,
    column) — the reduce is a tiny groupby over #blocks × 14 rows folded
    on the driver. No shuffle."""
    from data_exchange_routing_ray.pipelines.events_cdc import (
        _events,
        derive_changes_batch,
    )

    hi = int(_events(sf_dir, columns=["event_id"]).max("event_id"))
    cols = ["op", "conv_id", "turn_idx", "role", "text", "ts"]

    def partial(b: pa.Table) -> pa.Table:
        period = (b["seq"].to_numpy() * 2 // (hi + 1)).astype(np.int64)
        rows = []
        for p in np.unique(period):
            mask = pa.array(period == p)
            sub = b.filter(mask)
            for c in cols:
                rows.append(
                    {
                        "period": int(p),
                        "column": c,
                        "n": sub.num_rows,
                        "nulls": sub[c].null_count,
                    }
                )
        return pa.Table.from_pylist(rows)

    parts = (
        _events(sf_dir, columns=["event_id", "user_id", "event_type", "ts"])
        .map_batches(
            lambda b: derive_changes_batch(b, corrupt=True), batch_format="pyarrow"
        )
        .map_batches(partial, batch_format="pyarrow")
        .take_all()
    )
    df = (
        pd.DataFrame(parts)
        .groupby(["period", "column"], as_index=False)[["n", "nulls"]]
        .sum()
        .sort_values(["period", "column"])
    )
    return pa.table(
        {
            "period": df["period"].to_numpy().astype(np.int64),
            "column": pa.array(df["column"].tolist(), pa.string()),
            "n": df["n"].to_numpy().astype(np.int64),
            "nulls": df["nulls"].to_numpy().astype(np.int64),
        }
    )


# ------------------------------------------------------- retention vacuum


def lake_vacuum_time_travel(sf_dir: str, retain_epochs: int = 2) -> pa.Table:
    """Retention-window VACUUM (Delta-VACUUM semantics): after 4 epochs of
    full-rewrite commits, ``vacuum(retain_epochs=2)`` must (a) leave the
    CURRENT state bit-identical, (b) keep time travel alive inside the
    retention window, (c) reclaim every file only the out-of-window
    epochs referenced — and a follow-up full ``vacuum()`` reclaims the
    rest. Returns the audit counters; all invariants are asserted
    in-query (engine-internal semantics — no SQL analog, rows-only gate;
    the file-level behavior is pinned by ``tests/test_widen3_ops.py``)."""
    from data_exchange_routing_ray.pipelines.cdc import CDCLake
    from data_exchange_routing_ray.pipelines.events_cdc import (
        _events,
        derive_changes_batch,
    )

    hi = int(_events(sf_dir, columns=["event_id"]).max("event_id"))
    n = hi + 1
    bounds = [(i * n) // 4 for i in range(5)]

    def stream(lo: int, up: int) -> ray.data.Dataset:
        return (
            _events(sf_dir, columns=["event_id", "user_id", "event_type", "ts"])
            .filter(expr=f"event_id >= {lo} and event_id < {up}")
            .map_batches(derive_changes_batch, batch_format="pyarrow")
        )

    with tempfile.TemporaryDirectory(prefix="cdclake-vac-") as d:
        lake = CDCLake(os.path.join(d, "lake"), num_partitions=8)
        for i in range(4):
            lake.apply_changes(stream(bounds[i], bounds[i + 1]), quarantine=False)
        pdir = os.path.join(lake.lake_dir, "partitions")
        files_before = len(os.listdir(pdir))
        before = lake.final_table().sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
        cur_epoch = lake.manifest.epoch

        removed_retained = lake.vacuum(retain_epochs=retain_epochs)
        after = lake.final_table().sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
        assert before.equals(after), "vacuum changed the current state"
        # time travel inside the window still reads
        in_window = lake.final_table(epoch=cur_epoch - retain_epochs + 1)
        assert in_window.num_rows > 0
        # outside the window the files are gone: the read must fail loudly
        import pyarrow.lib

        try:
            lake.final_table(epoch=0)
            out_of_window_fails = False
        except (FileNotFoundError, OSError, pyarrow.lib.ArrowInvalid):
            out_of_window_fails = True
        removed_full = lake.vacuum()
        final = lake.final_table().sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
        assert before.equals(final), "full vacuum changed the current state"
        files_after = len(os.listdir(pdir))
        lake.close()
        return pa.table(
            {
                "files_before": pa.array([files_before], pa.int64()),
                "removed_retained": pa.array([removed_retained], pa.int64()),
                "removed_full": pa.array([removed_full], pa.int64()),
                "files_after": pa.array([files_after], pa.int64()),
                "out_of_window_fails": pa.array([out_of_window_fails]),
                "rows": pa.array([before.num_rows], pa.int64()),
            }
        )
