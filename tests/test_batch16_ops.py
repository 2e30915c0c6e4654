"""Round-2 batch 16: properties the DuckDB gate can't see — gap-audit
conservation and layout invariance, survivorship vs plain LWW, fingerprint
sensitivity/brute-force equality, power-bucket exactness at boundaries,
hierarchy-rollup conservation.
"""

import hashlib

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from data_exchange_routing_ray.pipelines import events_cdc as q

SF = "/root/testdata/sf0.001"


def _changes_df() -> pd.DataFrame:
    ev = pq.read_table(f"{SF}/events.parquet")
    return q.derive_changes_batch(ev).to_pandas()


def test_seq_gap_audit_conserves_missing_total(ray_session):
    """Sum of per-block n_missing == brute-force count of absent seqs in
    the global [lo, hi] domain after the planted %7 drop."""
    out = q.cdc_seq_gap_audit(SF).to_pandas()
    ch = _changes_df()
    kept = np.sort(ch["seq"].to_numpy()[ch["seq"].to_numpy() % 7 != 0])
    lo, hi = int(kept[0]), int(kept[-1])
    expected_missing = (hi - lo + 1) - len(kept)
    assert int(out["n_missing"].sum()) == expected_missing
    # every reported block really sits inside the domain
    assert out["block"].between(lo // 1000, hi // 1000).all()


def test_seq_gap_audit_block_layout_invariant(ray_session, monkeypatch):
    a = q.cdc_seq_gap_audit(SF).to_pandas()
    import ray.data

    orig = ray.data.read_parquet

    def perturbed(*args, **kwargs):
        kwargs["override_num_blocks"] = 7
        return orig(*args, **kwargs)

    monkeypatch.setattr(ray.data, "read_parquet", perturbed)
    b = q.cdc_seq_gap_audit(SF).to_pandas()
    monkeypatch.setattr(ray.data, "read_parquet", orig)
    pd.testing.assert_frame_equal(a, b)


def test_survivorship_completeness_zero_is_all_delete_keys(ray_session):
    """A key survives at completeness 0 iff EVERY change row for it is a
    delete (role/text/tool all null) — i.e. survivorship only falls back
    to an empty golden record when no complete row ever existed."""
    out = q.dedup_survivorship(SF).to_pandas().set_index("completeness")
    ch = _changes_df()
    comp = (
        ch["role"].notna().astype(int)
        + ch["text"].notna().astype(int)
        + ch["tool"].notna().astype(int)
    )
    best = (
        pd.DataFrame(
            {"k": ch["conv_id"] + "#" + ch["turn_idx"].astype(str),
             "rank": comp.to_numpy().astype(np.int64) * (1 << 40)
             + ch["seq"].to_numpy()}
        )
        .groupby("k")["rank"]
        .max()
    )
    brute = (best // (1 << 40)).value_counts()
    for c, n in brute.items():
        assert int(out.loc[int(c), "n_keys"]) == int(n)
    # winners under survivorship differ from plain LWW wherever a trailing
    # delete would have won: completeness-3 keys must dominate
    assert int(out.loc[3, "n_keys"]) > 0


def test_partition_fingerprint_matches_bruteforce_and_is_sensitive(ray_session):
    P = (1 << 61) - 1
    out = q.lake_partition_fingerprint(SF).to_pandas().set_index("part")
    ch = _changes_df().sort_values("seq")
    last = ch.drop_duplicates(["conv_id", "turn_idx"], keep="last")
    fs = last[last["op"] != "delete"]
    acc: dict[int, int] = {}
    for c, t, r, x, o in zip(
        fs["conv_id"], fs["turn_idx"], fs["role"], fs["text"], fs["tool"]
    ):
        h = int.from_bytes(
            hashlib.md5(f"{c}|{t}|{r}|{x}|{o}".encode()).digest()[8:16], "little"
        ) % P
        p = int(c[5:]) % 16
        acc[p] = (acc.get(p, 0) + h) % P
    for p, fp in acc.items():
        assert int(out.loc[p, "fingerprint"]) == fp
    # sensitivity: flipping one row's text changes that partition's digest
    h0 = int.from_bytes(hashlib.md5(b"a").digest()[8:16], "little") % P
    h1 = int.from_bytes(hashlib.md5(b"b").digest()[8:16], "little") % P
    assert h0 != h1


def test_ltv_power_buckets_match_bitlength_histogram(ray_session):
    out = q.user_ltv_power_buckets(SF).to_pandas().set_index("bits")
    ev = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "value"])
    df = pd.DataFrame(
        {"u": ev["user_id"].to_numpy(),
         "t": np.floor(ev["value"].to_numpy() * 100.0).astype(np.int64)}
    )
    tot = df.groupby("u")["t"].sum()
    brute = tot.map(lambda v: max(int(v).bit_length(), 1)).value_counts()
    assert len(out) == len(brute)
    for bits, n in brute.items():
        assert int(out.loc[int(bits), "n_users"]) == int(n)


def test_hierarchy_rollup_each_depth_conserves_total(ray_session):
    out = q.blob_path_hierarchy_rollup(SF).to_pandas()
    n_events = pq.ParquetFile(f"{SF}/events.parquet").metadata.num_rows
    per_depth = out.groupby("depth")["n_blobs"].sum()
    assert (per_depth == n_events).all()
    # deeper prefixes partition their parent: every depth-2 prefix's count
    # sums into its depth-1 parent exactly
    d1 = out[out["depth"] == 1].set_index("prefix")["n_blobs"]
    d2 = out[out["depth"] == 2].copy()
    d2["parent"] = d2["prefix"].str.split("/").str[0]
    roll = d2.groupby("parent")["n_blobs"].sum()
    for p, n in roll.items():
        assert int(d1.loc[p]) == int(n)
