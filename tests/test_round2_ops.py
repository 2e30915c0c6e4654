"""Round-2 widening batches 2-4: properties the DuckDB driver gate can't
see — block-layout invariance of the distributed prefix scan and of the
sampled-boundary ntile, rank-with-ties semantics on planted ties, bigram
doc-boundary isolation, SCD2 interval algebra, and the incremental-view
manifest diff actually skipping clean partitions.
"""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from data_exchange_routing_ray.pipelines import events_cdc as q

SF = "/root/testdata/sf0.001"


def _perturb_blocks(monkeypatch, n=7):
    import ray.data

    orig = ray.data.read_parquet

    def perturbed(*args, **kwargs):
        kwargs["override_num_blocks"] = n
        return orig(*args, **kwargs)

    monkeypatch.setattr(ray.data, "read_parquet", perturbed)
    return orig


def test_late_data_split_block_invariant(ray_session, monkeypatch):
    """The two-pass running-max prefix scan must not depend on how the scan
    is blocked — lateness is a property of (seq, event-time) only."""
    a = q.late_data_split(SF).to_pandas().sort_values("event_type")
    orig = _perturb_blocks(monkeypatch)
    b = q.late_data_split(SF).to_pandas().sort_values("event_type")
    monkeypatch.setattr("ray.data.read_parquet", orig)
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))
    assert int(a["n_late"].sum()) > 0, "jitter must create genuine late events"


def test_ntile_balanced_and_block_invariant(ray_session, monkeypatch):
    """Sampled range boundaries steer load only: the quartile assignment is
    exact — balanced sizes (diff ≤ 1), monotone in spend, and identical
    under a perturbed block layout (different sample → same answer)."""
    a = q.ntile_users_by_spend(SF).to_pandas().sort_values("user_id")
    orig = _perturb_blocks(monkeypatch)
    b = q.ntile_users_by_spend(SF).to_pandas().sort_values("user_id")
    monkeypatch.setattr("ray.data.read_parquet", orig)
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))

    sizes = a["q"].value_counts()
    assert sizes.max() - sizes.min() <= 1
    # monotone: every user in tile t has spend >= every user in tile t+1
    # (modulo the user_id tiebreak, which only reorders equal spends)
    for t in range(1, int(a["q"].max())):
        assert (
            a.loc[a["q"] == t, "spend_ticks"].min()
            >= a.loc[a["q"] == t + 1, "spend_ticks"].max()
        )


def test_grouped_rank_topk_planted_ties(ray_session, tmp_path):
    """RANK()-with-ties: three users tied at the top must ALL get rank 1
    and push the next spend to rank 4 (excluded at k=3)."""
    ts = pd.Timestamp("2024-01-01").to_datetime64()
    rows = []
    eid = 0
    for uid, val in [(1, 5.0), (2, 5.0), (3, 5.0), (4, 4.0), (5, 3.0)]:
        rows.append((eid, ts, uid, "click", val, "{}"))
        eid += 1
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "events.parquet"))
    out = q.grouped_rank_topk(str(tmp_path)).to_pandas()
    clicks = out[out["event_type"] == "click"]
    tied = clicks[clicks["rnk"] == 1]
    assert sorted(tied["user_id"]) == [1, 2, 3]
    # 4.0 is the 4th row => rank 4 > k, excluded; 3.0 likewise
    assert set(clicks["user_id"]) == {1, 2, 3}


def test_bigram_counts_respect_doc_boundaries(ray_session, tmp_path):
    """A bigram must never span two documents: 'b c' exists only if some
    single doc contains it."""
    df = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["a b", "c d"],
            "lang": ["en", "en"],
            "source": ["s", "s"],
            "n_chars": [3, 3],
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    out = q.bigram_counts(str(tmp_path), min_count=1).to_pandas()
    assert set(out["bigram"]) == {"a b", "c d"}  # no cross-doc 'b c'


def test_scd2_interval_algebra(ray_session):
    """Per (conv, turn): versions ordered, half-open intervals chain
    (valid_to == next valid_from), exactly the final live version open."""
    out = q.scd2_turn_history(SF).to_pandas()
    for (_, _), g in out.groupby(["conv_id", "turn_idx"]):
        g = g.sort_values("valid_from")
        vf = g["valid_from"].to_numpy()
        vt = g["valid_to"].to_numpy()
        # closed versions end at a real later seq; at most one open version,
        # and it must be the last
        assert (vt[:-1] != -1).all() or len(g) == 1 or (vt[:-1] > vf[:-1]).all()
        open_mask = vt == -1
        if open_mask.any():
            assert open_mask.sum() == 1 and bool(open_mask[-1])
            assert g["is_current"].to_numpy()[-1] == 1
        # intervals never overlap: each close is at or before the next open
        assert all(vt[i] <= vf[i + 1] or vt[i] == -1 for i in range(len(g) - 1))


def test_incr_view_single_dirty_partition(ray_session, monkeypatch):
    """The manifest diff must re-aggregate exactly ONE partition (the
    hash-slice epoch B touched); clean partitions reuse epoch-A partials."""
    # the query itself asserts clean partitions exist; here check the
    # incremental result matches a full recompute of the final state
    out = q.incr_view_roles(SF).to_pandas().set_index("role")["n_turns"]
    import duckdb

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF}/events.parquet')"
    )
    exp = con.sql(
        """
        WITH ch AS (
          SELECT event_id AS seq,
                 CASE WHEN event_id % 10 < 7 THEN 'insert'
                      WHEN event_id % 10 < 9 THEN 'update'
                      ELSE 'delete' END AS op,
                 'conv-' || lpad(CAST(user_id AS VARCHAR), 6, '0') AS conv_id,
                 CAST(event_id % 25 AS INTEGER) AS turn_idx,
                 CASE WHEN event_id % 10 >= 9 THEN NULL
                      WHEN event_id % 2 = 0 THEN 'user' ELSE 'assistant'
                 END AS role
          FROM events
        ), last AS (
          SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY seq DESC) AS rn
          FROM ch
        )
        SELECT role, count(*) AS n FROM last
        WHERE rn = 1 AND op <> 'delete' GROUP BY role
        """
    ).df().set_index("role")["n"]
    for role in exp.index:
        assert int(out[role]) == int(exp[role])


def test_set_ops_users_partition_totals(ray_session):
    """click_only + both == distinct click users; purchase_only + both ==
    distinct purchase users (the set algebra the single-pass OR-reduce
    must preserve)."""
    out = q.set_ops_users(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "event_type"])
    clicks = set(ev.loc[ev["event_type"] == "click", "user_id"])
    buys = set(ev.loc[ev["event_type"] == "purchase", "user_id"])
    kinds = out.groupby("kind")["user_id"].apply(set).to_dict()
    assert kinds.get("both", set()) == clicks & buys
    assert kinds.get("click_only", set()) == clicks - buys
    assert kinds.get("purchase_only", set()) == buys - clicks
