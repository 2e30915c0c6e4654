"""Zero-copy lake branching: branch creation copies only the manifest;
writes on a branch are invisible to main (and vice versa); vacuum respects
both branches' references."""

import os

import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from data_exchange_routing_ray.pipelines.cdc import CDCLake


def _changes(rows, seq0=1):
    df = pd.DataFrame(
        [
            {
                "seq": seq0 + i,
                "op": "insert",
                "conv_id": c,
                "turn_idx": t,
                "role": "user",
                "text": x,
                "tool": "x",
                "ts": pd.Timestamp("2024-01-01"),
            }
            for i, (c, t, x) in enumerate(rows)
        ]
    )
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def test_branch_isolation_and_vacuum(ray_session, tmp_path):
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=2)
    lake.apply_changes(
        _changes([("conv-a", 0, "base-a"), ("conv-b", 0, "base-b")]),
        quarantine=False,
    )
    base = lake.final_table()

    br = lake.create_branch("exp")
    assert br.final_table().equals(base)  # zero-copy clone sees main's state

    # divergent writes on each side
    br.apply_changes(
        _changes([("conv-a", 0, "branch-edit"), ("conv-c", 0, "branch-new")], seq0=100),
        quarantine=False,
    )
    lake.apply_changes(_changes([("conv-d", 0, "main-new")], seq0=200), quarantine=False)

    main_txt = {
        (r.conv_id, r.turn_idx): r.text
        for r in lake.final_table().to_pandas().itertuples(index=False)
    }
    br_txt = {
        (r.conv_id, r.turn_idx): r.text
        for r in br.final_table().to_pandas().itertuples(index=False)
    }
    assert main_txt == {
        ("conv-a", 0): "base-a",
        ("conv-b", 0): "base-b",
        ("conv-d", 0): "main-new",
    }
    assert br_txt == {
        ("conv-a", 0): "branch-edit",
        ("conv-b", 0): "base-b",
        ("conv-c", 0): "branch-new",
    }

    # vacuum on main must NOT remove files the branch still references
    removed = lake.vacuum()
    assert br.final_table().to_pandas().shape[0] == 3
    assert {
        (r.conv_id, r.turn_idx): r.text
        for r in br.final_table().to_pandas().itertuples(index=False)
    } == br_txt
    # reopening by name sees the same branch state
    again = CDCLake(str(tmp_path / "lake"), num_partitions=2, branch="exp")
    assert {
        (r.conv_id, r.turn_idx): r.text
        for r in again.final_table().to_pandas().itertuples(index=False)
    } == br_txt
    assert removed >= 0
    # branch files carry the tag; main files never do
    names = os.listdir(str(tmp_path / "lake" / "partitions"))
    assert any(n.endswith("-exp.parquet") for n in names)


def test_fast_forward_merge(ray_session, tmp_path):
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=2)
    lake.apply_changes(_changes([("conv-a", 0, "base")]), quarantine=False)
    br = lake.create_branch("ff")
    br.apply_changes(_changes([("conv-b", 0, "from-branch")], seq0=50), quarantine=False)
    new_epoch = lake.fast_forward(br)
    assert new_epoch == br.manifest.epoch
    got = {
        (r.conv_id, r.turn_idx): r.text
        for r in lake.final_table().to_pandas().itertuples(index=False)
    }
    assert got == {("conv-a", 0): "base", ("conv-b", 0): "from-branch"}
    # main can keep ingesting after the FF (epoch counter adopted)
    lake.apply_changes(_changes([("conv-c", 0, "post-ff")], seq0=90), quarantine=False)
    assert lake.final_table().num_rows == 3


def test_fast_forward_refuses_divergence(ray_session, tmp_path):
    import pytest as _pytest

    lake = CDCLake(str(tmp_path / "lake"), num_partitions=2)
    lake.apply_changes(_changes([("conv-a", 0, "base")]), quarantine=False)
    br = lake.create_branch("dv")
    br.apply_changes(_changes([("conv-b", 0, "b")], seq0=50), quarantine=False)
    lake.apply_changes(_changes([("conv-c", 0, "m")], seq0=70), quarantine=False)
    with _pytest.raises(ValueError, match="non-fast-forward"):
        lake.fast_forward(br)


def test_rebase_divergent_branch(ray_session, tmp_path):
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=2)
    lake.apply_changes(
        _changes([("conv-a", 0, "base-a"), ("conv-b", 0, "base-b"),
                  ("conv-e", 0, "base-e")]),
        quarantine=False,
    )
    br = lake.create_branch("rb")
    # branch: edit a, add c, delete e
    br.apply_changes(_changes([("conv-a", 0, "branch-a"), ("conv-c", 0, "branch-c")], seq0=50), quarantine=False)
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    dele = pd.DataFrame(
        [{"seq": 60, "op": "delete", "conv_id": "conv-e", "turn_idx": 0,
          "role": None, "text": None, "tool": None,
          "ts": pd.Timestamp("2024-01-02")}]
    )
    dele["turn_idx"] = dele["turn_idx"].astype("int32")
    br.apply_changes(rd.from_arrow(pa.Table.from_pandas(dele, preserve_index=False)), quarantine=False)
    # main diverges meanwhile: adds d, edits b
    lake.apply_changes(_changes([("conv-d", 0, "main-d"), ("conv-b", 0, "main-b2")], seq0=80), quarantine=False)

    res = lake.rebase_from(br)
    assert res.changes_applied == 3  # a-edit, c-add, e-delete
    got = {
        (r.conv_id, r.turn_idx): r.text
        for r in lake.final_table().to_pandas().itertuples(index=False)
    }
    assert got == {
        ("conv-a", 0): "branch-a",   # branch edit wins
        ("conv-b", 0): "main-b2",    # untouched by branch: main edit survives
        ("conv-c", 0): "branch-c",   # branch addition lands
        ("conv-d", 0): "main-d",     # main addition survives
    }                                 # conv-e deleted by the branch


def test_rollback_to_savepoint_then_replay_converges(ray_session, tmp_path):
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=2)
    lake.apply_changes(_changes([("conv-a", 0, "v1")]), quarantine=False)      # epoch 0
    e1_state_rows = lake.final_table().num_rows
    lake.apply_changes(_changes([("conv-a", 0, "v2"), ("conv-b", 0, "b")], seq0=10), quarantine=False)  # epoch 1
    after = lake.final_table()
    new_head = lake.rollback_to(0)
    assert new_head == 2
    restored = lake.final_table()
    assert restored.num_rows == e1_state_rows
    assert {r.text for r in restored.to_pandas().itertuples(index=False)} == {"v1"}
    # replaying the undone epoch converges to the pre-rollback state
    lake.apply_changes(_changes([("conv-a", 0, "v2"), ("conv-b", 0, "b")], seq0=10), quarantine=False)
    assert lake.final_table().equals(after)
    # rolled-back files become vacuumable orphans, current state survives
    lake.vacuum()
    assert lake.final_table().equals(after)


def test_within_epoch_arrival_order_invariance(ray_session, tmp_path):
    """LWW by seq ⇒ the final state must be identical however the epoch's
    rows are ordered/blocked on arrival (queue redelivery reorders)."""
    import numpy as np

    from data_exchange_routing_ray.synth import make_change_stream

    ch = make_change_stream(num_convs=30, max_turns=5, seed=11).to_pandas()
    rng = np.random.default_rng(7)
    perm = ch.iloc[rng.permutation(len(ch))].reset_index(drop=True)

    outs = []
    for i, frame in enumerate((ch, perm)):
        lake = CDCLake(str(tmp_path / f"lake{i}"), num_partitions=4)
        ds = ray.data.from_arrow(
            pa.Table.from_pandas(frame, preserve_index=False)
        ).repartition(7)
        lake.apply_changes(ds, quarantine=False)
        outs.append(lake.final_table())
    assert outs[0].equals(outs[1])


def test_actor_mode_branches_do_not_share_memtables(ray_session, tmp_path):
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=2, merge_mode="actors")
    lake.apply_changes(_changes([("conv-a", 0, "base")]), quarantine=False)
    br = lake.create_branch("act")
    br2 = CDCLake(str(tmp_path / "lake"), num_partitions=2,
                  merge_mode="actors", branch="act")
    br2.apply_changes(_changes([("conv-b", 0, "branch-only")], seq0=50), quarantine=False)
    # main keeps ingesting through ITS pool; branch rows must not leak in
    lake.apply_changes(_changes([("conv-c", 0, "main-only")], seq0=90), quarantine=False)
    main_keys = set(lake.final_table().to_pandas()["conv_id"])
    br_keys = set(br2.final_table().to_pandas()["conv_id"])
    assert main_keys == {"conv-a", "conv-c"}
    assert br_keys == {"conv-a", "conv-b"}
    lake.close()
    br2.close()


def test_small_block_size_layout_invariance(ray_session, tmp_path, monkeypatch):
    """Backpressure shape: a tiny target block size (many small blocks
    through the whole pipeline) must not change the committed state."""
    from ray.data import DataContext

    ch = None
    from data_exchange_routing_ray.synth import make_change_stream

    ch = make_change_stream(num_convs=40, max_turns=5, seed=21)
    base = CDCLake(str(tmp_path / "a"), num_partitions=4)
    base.apply_changes(ray.data.from_arrow(ch), quarantine=False)
    want = base.final_table()

    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 16 * 1024  # 16 KiB blocks
        small = CDCLake(str(tmp_path / "b"), num_partitions=4)
        small.apply_changes(ray.data.from_arrow(ch), quarantine=False)
        assert small.final_table().equals(want)
    finally:
        ctx.target_max_block_size = old


def test_merge_into_and_delta_policy_on_branch(ray_session, tmp_path):
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=2, merge_policy="delta")
    lake.apply_changes(_changes([("conv-a", 0, "base"), ("conv-b", 0, "keep")]), quarantine=False)
    br = lake.create_branch("mi")
    br.delta_ratio = 1e9  # force the branch's next epoch onto the delta path
    stg = pd.DataFrame(
        [{"seq": 5, "conv_id": "conv-a", "turn_idx": 0, "role": "user",
          "text": "merged-on-branch", "tool": "m",
          "ts": pd.Timestamp("2024-02-02"), "del_flag": False}]
    )
    stg["turn_idx"] = stg["turn_idx"].astype("int32")
    br.merge_into(
        ray.data.from_arrow(pa.Table.from_pandas(stg, preserve_index=False))
    )
    # branch delta file carries the branch tag; main reads unchanged
    assert any(e.deltas for e in br.manifest.partitions.values())
    for e in br.manifest.partitions.values():
        for d in e.deltas:
            assert d["file"].endswith("-mi.parquet")
    got_br = {r.conv_id: r.text for r in br.final_table().to_pandas().itertuples(index=False)}
    got_main = {r.conv_id: r.text for r in lake.final_table().to_pandas().itertuples(index=False)}
    assert got_br["conv-a"] == "merged-on-branch"
    assert got_main["conv-a"] == "base"



def test_rebase_delete_only_branch(ray_session, tmp_path):
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=2)
    lake.apply_changes(
        _changes([("conv-a", 0, "a"), ("conv-b", 0, "b")]), quarantine=False
    )
    br = lake.create_branch("del")
    dele = pd.DataFrame(
        [{"seq": 40, "op": "delete", "conv_id": "conv-a", "turn_idx": 0,
          "role": None, "text": None, "tool": None,
          "ts": pd.Timestamp("2024-01-03")}]
    )
    dele["turn_idx"] = dele["turn_idx"].astype("int32")
    br.apply_changes(
        ray.data.from_arrow(pa.Table.from_pandas(dele, preserve_index=False)),
        quarantine=False,
    )
    lake.apply_changes(_changes([("conv-c", 0, "c")], seq0=70), quarantine=False)
    res = lake.rebase_from(br)
    assert res.changes_applied == 1  # just the delete
    got = set(lake.final_table().to_pandas()["conv_id"])
    assert got == {"conv-b", "conv-c"}

def test_stream_replay_after_rebase_not_fenced(ray_session, tmp_path):
    """Round-2 ADVICE: rebase must assign COMPACT seqs. Hash-derived seqs
    advanced the watermark by up to ~2^40, silently fencing out every
    subsequent normal monotone stream seq. After a rebase, new stream
    epochs with ordinary seqs must still apply."""
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=2)
    lake.apply_changes(
        _changes([("conv-a", 0, "base-a"), ("conv-b", 0, "base-b")]),
        quarantine=False,
    )
    br = lake.create_branch("rb2")
    br.apply_changes(
        _changes([("conv-a", 0, "branch-a"), ("conv-c", 0, "branch-c")], seq0=10),
        quarantine=False,
    )
    res = lake.rebase_from(br)
    assert res.changes_applied == 2
    # watermark advance is compact: bounded by the largest per-partition
    # diff, not a hash-range jump
    assert lake.applied_offset <= 10 + 2
    # normal monotone stream seqs continue to apply after the rebase
    r2 = lake.apply_changes(
        _changes([("conv-d", 0, "post-rebase"),
                  ("conv-b", 0, "post-rebase-b")],
                 seq0=lake.applied_offset + 1),
        quarantine=False,
    )
    assert r2.changes_applied == 2
    assert r2.changes_fenced == 0
    got = {
        (r.conv_id, r.turn_idx): r.text
        for r in lake.final_table().to_pandas().itertuples(index=False)
    }
    assert got == {
        ("conv-a", 0): "branch-a",
        ("conv-b", 0): "post-rebase-b",
        ("conv-c", 0): "branch-c",
        ("conv-d", 0): "post-rebase",
    }


def test_rebase_detects_non_text_update(ray_session, tmp_path):
    """Round-2 ADVICE: update detection must compare ALL payload columns
    null-aware — a branch edit changing only `role` (text identical) must
    survive the rebase."""
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=2)
    lake.apply_changes(_changes([("conv-a", 0, "same-text")]), quarantine=False)
    br = lake.create_branch("roleonly")
    edit = pd.DataFrame(
        [{"seq": 30, "op": "update", "conv_id": "conv-a", "turn_idx": 0,
          "role": "assistant", "text": "same-text", "tool": "x",
          "ts": pd.Timestamp("2024-01-01")}]
    )
    edit["turn_idx"] = edit["turn_idx"].astype("int32")
    br.apply_changes(
        ray.data.from_arrow(pa.Table.from_pandas(edit, preserve_index=False)),
        quarantine=False,
    )
    res = lake.rebase_from(br)
    assert res.changes_applied == 1  # the role-only edit IS a change
    row = lake.final_table().to_pandas().iloc[0]
    assert row["role"] == "assistant"
    assert row["text"] == "same-text"


def test_changefeed_and_rebase_fold_delta_stacks(ray_session, tmp_path):
    """Round-2 ADVICE: under merge_policy='delta' the diff paths must fold
    each partition's delta stack, not read only the base file."""
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=2,
                   merge_policy="delta")
    lake.apply_changes(
        _changes([("conv-a", 0, "v1"), ("conv-b", 0, "b1")]), quarantine=False
    )  # epoch 0: fresh bases
    lake.delta_ratio = 1e9  # force the next epochs onto the delta path
    lake.apply_changes(
        _changes([("conv-a", 0, "v2")], seq0=10), quarantine=False
    )  # epoch 1: delta file only
    assert any(e.deltas for e in lake.manifest.partitions.values())

    feed = lake.changefeed_between(0, 1).to_pandas()
    assert len(feed) == 1
    assert feed.iloc[0]["op"] == "update"
    assert feed.iloc[0]["before_text"] == "v1"
    assert feed.iloc[0]["after_text"] == "v2"

    # rebase from a branch whose head carries an unfolded delta
    br = lake.create_branch("dstack")
    br.delta_ratio = 1e9
    br.apply_changes(
        _changes([("conv-b", 0, "b2-branch")], seq0=20), quarantine=False
    )
    assert any(e.deltas for e in br.manifest.partitions.values())
    res = lake.rebase_from(br)
    assert res.changes_applied == 1  # the delta-resident edit is seen
    got = {r.conv_id: r.text
           for r in lake.final_table().to_pandas().itertuples(index=False)}
    assert got == {"conv-a": "v2", "conv-b": "b2-branch"}

def test_changefeed_image_cols_selects_envelope_columns(ray_session, tmp_path):
    """``image_cols`` controls which payload columns ship as before_/after_
    images; change DETECTION still covers all payload columns (a role-only
    update appears even when only text images are requested)."""
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=2)
    lake.apply_changes(_changes([("conv-a", 0, "t0")]), quarantine=False)
    edit = pd.DataFrame(
        [{"seq": 30, "op": "update", "conv_id": "conv-a", "turn_idx": 0,
          "role": "assistant", "text": "t0", "tool": "y",
          "ts": pd.Timestamp("2024-01-01")}]
    )
    edit["turn_idx"] = edit["turn_idx"].astype("int32")
    lake.apply_changes(
        ray.data.from_arrow(pa.Table.from_pandas(edit, preserve_index=False)),
        quarantine=False,
    )

    # default: text images only (back-compat schema)
    feed = lake.changefeed_between(0, 1).to_pandas()
    assert list(feed.columns) == [
        "op", "conv_id", "turn_idx", "before_text", "after_text"
    ]
    assert len(feed) == 1 and feed.iloc[0]["op"] == "update"
    assert feed.iloc[0]["before_text"] == feed.iloc[0]["after_text"] == "t0"

    # multi-column images carry the actually-changed columns
    feed2 = lake.changefeed_between(0, 1, image_cols=("text", "role", "tool"))
    feed2 = feed2.to_pandas()
    r = feed2.iloc[0]
    assert (r["before_role"], r["after_role"]) == ("user", "assistant")
    assert (r["before_tool"], r["after_tool"]) == ("x", "y")


def test_cutover_refuses_on_divergence(ray_session, tmp_path):
    """Online-migration cutover is WAP-gated: if the shadow branch missed a
    production change (the dual-apply lagged), the parity audit must abort
    the cutover with NO visible effect; after the shadow catches up the
    same cutover succeeds."""
    import ray.data

    from data_exchange_routing_ray.pipelines.cdc import CDCLake
    from data_exchange_routing_ray.schemas import CHANGE_SCHEMA

    def changes(rows):
        cols = {f.name: [] for f in CHANGE_SCHEMA}
        for r in rows:
            for f in CHANGE_SCHEMA:
                cols[f.name].append(r.get(f.name))
        return ray.data.from_arrow(
            pa.table({k: pa.array(v, CHANGE_SCHEMA.field(k).type)
                      for k, v in cols.items()})
        )

    def row(seq, conv, turn, text):
        return {
            "seq": seq, "op": "insert", "conv_id": conv, "turn_idx": turn,
            "role": "user", "text": text, "tool": None,
            "ts": 1_700_000_000_000_000 + seq,
        }

    main = CDCLake(str(tmp_path / "lake"), num_partitions=4)
    main.apply_changes(changes([row(1, "conv-1", 0, "a")]), quarantine=False)
    mig = main.create_branch("mig")

    # production advances on main only — the shadow is now behind
    main.apply_changes(changes([row(2, "conv-2", 0, "b")]), quarantine=False)

    calls = {"n": 0}

    def audit(cand, lake_dir):
        calls["n"] += 1
        # branch is missing conv-2: refuse
        have = {
            (r["conv_id"], r["turn_idx"])
            for r in mig.final_table().to_pylist()
        }
        want = {
            (r["conv_id"], r["turn_idx"])
            for r in main.final_table().to_pylist()
        }
        if have != want:
            raise ValueError("shadow branch diverged from production")

    epoch_before = main.manifest.epoch
    with pytest.raises(ValueError, match="diverged"):
        main.cutover_to(mig, audit_fn=audit)
    assert calls["n"] == 1
    assert main.manifest.epoch == epoch_before, "aborted cutover must be invisible"
    assert len(main.final_table()) == 2

    # catch the shadow up (dual-apply the missed change), retry: succeeds
    mig.apply_changes(changes([row(2, "conv-2", 0, "b")]), quarantine=False)
    new_epoch = main.cutover_to(mig, audit_fn=audit)
    assert new_epoch > epoch_before
    assert len(main.final_table()) == 2
    # the adopted head is the branch's state, served from main's manifest log
    assert main.manifest.applied_offset == mig.manifest.applied_offset
