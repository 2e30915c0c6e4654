"""Round-3 widening batch B: distributed PCA vs serial numpy, retention
vacuum file-level semantics, TTL attribution cross-epoch state, salted
hot-key join equality."""

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from data_exchange_routing_ray.pipelines import events_cdc as q
from data_exchange_routing_ray.pipelines import widen3

SF = "/root/testdata/sf0.001"


def test_pca_matches_serial_numpy(ray_session):
    got = q.emb_pca_project(SF, k=4).to_pandas()
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    x = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    mu = x.mean(axis=0)
    cov = np.cov(x.T, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:4]
    evals, evecs = evals[order], evecs[:, order]
    flip = evecs[np.argmax(np.abs(evecs), axis=0), np.arange(4)] < 0
    evecs = evecs * np.where(flip, -1.0, 1.0)
    proj = (x - mu) @ evecs
    total = float(np.trace(cov))
    for lab in sorted(emb["label"].unique()):
        sel = proj[emb["label"].to_numpy() == lab]
        for i in range(4):
            row = got[(got["label"] == lab) & (got["component"] == i)]
            assert abs(float(row["mean_coord"].iloc[0]) - sel[:, i].mean()) < 1e-6
            assert (
                abs(float(row["explained_var_ratio"].iloc[0]) - evals[i] / total)
                < 1e-9
            )


def test_vacuum_retention_window(ray_session):
    from data_exchange_routing_ray.pipelines.cdc import CDCLake
    from data_exchange_routing_ray.pipelines.events_cdc import (
        _events,
        derive_changes_batch,
    )

    hi = int(_events(SF, columns=["event_id"]).max("event_id"))
    n = hi + 1
    bounds = [(i * n) // 4 for i in range(5)]

    def stream(lo, up):
        return (
            _events(SF, columns=["event_id", "user_id", "event_type", "ts"])
            .filter(expr=f"event_id >= {lo} and event_id < {up}")
            .map_batches(derive_changes_batch, batch_format="pyarrow")
        )

    with tempfile.TemporaryDirectory() as d:
        lake = CDCLake(os.path.join(d, "lake"), num_partitions=4)
        for i in range(4):
            lake.apply_changes(stream(bounds[i], bounds[i + 1]), quarantine=False)
        cur = lake.manifest.epoch
        pdir = os.path.join(lake.lake_dir, "partitions")
        before_files = set(os.listdir(pdir))
        state = lake.final_table().sort_by("conv_id")

        removed = lake.vacuum(retain_epochs=2)
        assert removed > 0
        # current + previous epoch still time-travel readable
        assert lake.final_table(epoch=cur).num_rows == state.num_rows
        assert lake.final_table(epoch=cur - 1).num_rows > 0
        # every file referenced by the retained manifests survived
        kept = set(os.listdir(pdir))
        for ep in (cur, cur - 1):
            man = lake.manifest_at(ep)
            for e in man.partitions.values():
                assert os.path.basename(e.file) in kept
        # out-of-window epoch's files are gone
        try:
            lake.final_table(epoch=cur - 3)
            raised = False
        except (FileNotFoundError, OSError, pa.lib.ArrowInvalid):
            raised = True
        assert raised, "reading beyond the retention window must fail loudly"
        # full vacuum reclaims the rest; state identical throughout
        removed2 = lake.vacuum()
        assert removed2 > 0
        assert lake.final_table().sort_by("conv_id").equals(state)
        assert len(os.listdir(pdir)) < len(before_files)
        lake.close()


def test_ttl_actor_cross_epoch_match_and_eviction(ray_session):
    """A click pending at epoch end must match a purchase in the NEXT
    epoch (the state is the point); unmatched clicks evict exactly when
    the watermark passes ts+W."""
    W = 100  # µs window
    a = widen3._TTLBucketActor.remote(W)

    def tbl(rows):
        return pa.table(
            {
                "user": pa.array([r[0] for r in rows], pa.int64()),
                "ts_us": pa.array([r[1] for r in rows], pa.int64()),
                "is_click": pa.array([r[2] for r in rows]),
            }
        )

    # epoch 1 (ts < 1000): user 1 clicks at 950 (no purchase yet);
    # user 2 clicks at 100 (window closes at 200 — must evict at wm 1000);
    # user 3 clicks at 500 and purchases at 500 (exact ts — NOT a match),
    #   then purchases at 590 (match, within (500, 600])
    pending = ray.get(
        a.ingest.remote(
            tbl(
                [
                    (1, 950, True),
                    (2, 100, True),
                    (3, 500, True),
                    (3, 500, False),
                    (3, 590, False),
                ]
            ),
            1000,
        )
    )
    assert pending == 1  # user 1's click survives the epoch boundary
    # epoch 2 (1000 <= ts < 2000): user 1 purchases at 1040 — inside
    # (950, 1050], so the carried click converts across the boundary
    ray.get(a.ingest.remote(tbl([(1, 1040, False)]), 2000))
    out = ray.get(a.flush.remote()).to_pandas().set_index("user_id")
    assert out.loc[1, "converted"] == 1 and out.loc[1, "evicted"] == 0
    assert out.loc[2, "converted"] == 0 and out.loc[2, "evicted"] == 1
    assert out.loc[3, "converted"] == 1 and out.loc[3, "evicted"] == 0
    assert (out["clicks"] == out["converted"] + out["evicted"]).all()


def test_salted_hotkey_join_matches_plain_join(ray_session):
    import duckdb

    got = q.join_salted_hotkey(SF).to_pandas()
    con = duckdb.connect()
    exp = con.sql(
        f"""
        WITH f AS (
          SELECT CASE WHEN event_id % 2 = 0 THEN 42 ELSE user_id % 1000 END AS k,
                 value
          FROM read_parquet('{SF}/events.parquet')
        ),
        d AS (SELECT k, 'seg-' || CAST(k % 7 AS VARCHAR) AS seg FROM range(1000) t(k))
        SELECT seg, count(*) AS cnt, round(sum(value), 6) AS sum_value
        FROM f JOIN d USING (k) GROUP BY seg ORDER BY seg
        """
    ).df()
    assert got["seg"].tolist() == exp["seg"].tolist()
    assert got["cnt"].tolist() == exp["cnt"].tolist()
    assert np.allclose(got["sum_value"], exp["sum_value"], atol=1e-6)
    # the planted skew is real: key 42 holds ~half the fact rows
    assert got.set_index("seg").loc["seg-0", "cnt"] > 0.4 * got["cnt"].sum()


def test_schema_drift_audit_null_census(ray_session):
    got = q.schema_drift_audit(SF).to_pandas()
    # op is never NULL (corruption plants an INVALID STRING, not a null)
    assert (got[got["column"] == "op"]["nulls"] == 0).all()
    # deletes null the payload: role/text null count = delete count per half
    halves = got[got["column"] == "role"]
    assert (halves["nulls"] > 0).all()
    # both periods cover the full half
    assert got.groupby("period")["n"].max().nunique() <= 2
