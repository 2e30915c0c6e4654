"""Two-phase-commit crash injection + hypothesis property test vs oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_exchange_routing_ray.pipelines.cdc import CDCLake
from data_exchange_routing_ray.state.manifest import ManifestStore
from data_exchange_routing_ray.synth import make_change_stream, oracle_apply

TRANSCRIPT_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _final(lake):
    return lake.final_table().to_pandas()[TRANSCRIPT_COLS].reset_index(drop=True)


def test_crash_between_stage_and_publish(ray_session, tmp_path, monkeypatch):
    """Kill the commit AFTER files are staged/merged but BEFORE the manifest
    publishes: readers still see the previous epoch; re-running the epoch
    converges to the same final state (the commitBlockList guarantee)."""
    import ray.data

    first = make_change_stream(num_convs=40, max_turns=6, seed=51)
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=4)
    lake.apply_changes(ray.data.from_arrow(first), quarantine=False)
    state_before = _final(lake)
    epoch_before = lake.manifest.epoch

    second = make_change_stream(num_convs=40, max_turns=6, seed=52, seq_start=100000)

    real_publish = ManifestStore.publish

    def exploding_publish(self, manifest, expect_epoch=None):
        raise RuntimeError("injected crash before manifest publish")

    monkeypatch.setattr(ManifestStore, "publish", exploding_publish)
    with pytest.raises(RuntimeError, match="injected crash"):
        lake.apply_changes(ray.data.from_arrow(second), quarantine=False)
    monkeypatch.setattr(ManifestStore, "publish", real_publish)

    # crashed epoch invisible: same manifest, same table
    recovered = CDCLake(str(tmp_path / "lake"), num_partitions=4)
    assert recovered.manifest.epoch == epoch_before
    pd.testing.assert_frame_equal(_final(recovered), state_before)

    # re-run the epoch normally → converges to oracle over both batches
    recovered.apply_changes(ray.data.from_arrow(second), quarantine=False)
    both = pa.concat_tables([first, second])
    exp = oracle_apply(both)[TRANSCRIPT_COLS].reset_index(drop=True)
    pd.testing.assert_frame_equal(_final(recovered), exp, check_dtype=False)


def test_concurrent_writer_fenced(ray_session, tmp_path):
    """Optimistic concurrency: a second writer that committed first wins;
    the slower writer's commit aborts cleanly and a retry converges."""
    import ray.data

    from data_exchange_routing_ray.state.manifest import ConcurrentCommitError

    base = make_change_stream(num_convs=30, max_turns=5, seed=31)
    lake_a = CDCLake(str(tmp_path / "lake"), num_partitions=4)
    lake_a.apply_changes(ray.data.from_arrow(base), quarantine=False)

    more = make_change_stream(num_convs=30, max_turns=5, seed=32, seq_start=50_000)
    # writer B commits in between: simulate by a second handle committing first
    lake_b = CDCLake(str(tmp_path / "lake"), num_partitions=4)

    # interleave: A reads manifest (epoch 0) ... B commits epoch 1 ... A publishes
    from data_exchange_routing_ray.state.manifest import ManifestStore

    orig_publish = ManifestStore.publish
    state = {"b_done": False}

    def racing_publish(self, manifest, expect_epoch=None):
        if not state["b_done"] and manifest.epoch == 1 and self is lake_a.store:
            state["b_done"] = True
            lake_b.apply_changes(ray.data.from_arrow(more), quarantine=False)
        return orig_publish(self, manifest, expect_epoch)

    ManifestStore.publish = racing_publish
    try:
        with pytest.raises(ConcurrentCommitError):
            lake_a.apply_changes(ray.data.from_arrow(more), quarantine=False)
    finally:
        ManifestStore.publish = orig_publish

    # B's commit is intact and A's retry is a fenced no-op (same seq range)
    lake_c = CDCLake(str(tmp_path / "lake"), num_partitions=4)
    r = lake_c.apply_changes(ray.data.from_arrow(more), quarantine=False)
    assert r.changes_applied == 0 and r.changes_fenced > 0
    exp = oracle_apply(pa.concat_tables([base, more]))[TRANSCRIPT_COLS].reset_index(drop=True)
    pd.testing.assert_frame_equal(_final(lake_c), exp, check_dtype=False)


def test_poison_epoch_dead_letters_after_max_attempts(ray_session, tmp_path, monkeypatch):
    """maxDequeueCount parity (reference host.json:26-27): an epoch that
    keeps failing is retried at most N times; the next attempt dead-letters
    every row with an exact poison error, advances the watermark past them,
    and the pipeline moves on (a poison message never blocks the queue)."""
    import ray.data

    changes = make_change_stream(num_convs=20, max_turns=4, seed=9)
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=4)

    real_publish = ManifestStore.publish

    def exploding_publish(self, manifest, expect_epoch=None):
        raise RuntimeError("injected transient merge/commit failure")

    monkeypatch.setattr(ManifestStore, "publish", exploding_publish)
    for _ in range(3):  # three recorded failed attempts
        with pytest.raises(RuntimeError, match="injected transient"):
            lake.apply_changes(ray.data.from_arrow(changes), max_attempts=3)
    monkeypatch.setattr(ManifestStore, "publish", real_publish)

    # 4th attempt exceeds the budget: all rows dead-letter, watermark advances
    res = lake.apply_changes(ray.data.from_arrow(changes), max_attempts=3)
    assert res.rows_quarantined == changes.num_rows
    assert res.changes_applied == 0
    assert lake.final_table().num_rows == 0
    q = lake.quarantine_table()
    assert q.num_rows == changes.num_rows
    errs = set(q["error"].to_pylist())
    assert errs == {
        "Poison: epoch exceeded maxDequeueCount=3 (3 failed processing attempts)"
    }

    # redelivery of the poisoned stream is a fenced no-op (processed = done)
    res2 = lake.apply_changes(ray.data.from_arrow(changes), max_attempts=3)
    assert res2.changes_applied == 0 and res2.rows_quarantined == 0

    # a healthy later epoch applies normally (the queue is unblocked)
    more = make_change_stream(num_convs=10, max_turns=3, seed=10, seq_start=90_000)
    res3 = lake.apply_changes(ray.data.from_arrow(more), max_attempts=3)
    assert res3.changes_applied > 0 and res3.rows_quarantined == 0


def test_tail_applies_progressively_arriving_shards(ray_session, tmp_path):
    """Binlog tail: shards appearing over time are applied as epochs; the
    final state equals a one-shot replay; idle polls terminate cleanly."""
    import shutil

    changes = make_change_stream(num_convs=50, max_turns=8, seed=77)
    staged = str(tmp_path / "staged")
    from data_exchange_routing_ray.synth import write_change_stream

    files = write_change_stream(changes, staged, num_files=4)
    live = tmp_path / "live"
    live.mkdir()
    # first two shards present before tail starts
    for f in files[:2]:
        shutil.copy(f, live / f.split("/")[-1])

    lake = CDCLake(str(tmp_path / "lake"), num_partitions=4)
    results = []
    gen = lake.tail(str(live), poll_interval=0.05, idle_polls=3, files_per_epoch=1)
    for r in gen:
        results.append(r)
        if len(results) == 2:  # drop the remaining shards mid-tail
            for f in files[2:]:
                shutil.copy(f, live / f.split("/")[-1])
    assert len(results) == 4
    offsets = [r.applied_offset for r in results]
    assert offsets == sorted(offsets)
    exp = oracle_apply(changes)[TRANSCRIPT_COLS].reset_index(drop=True)
    pd.testing.assert_frame_equal(_final(lake), exp, check_dtype=False)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(0, 10_000),
    num_convs=st.integers(2, 60),
    max_turns=st.integers(1, 12),
    malformed=st.sampled_from([0.0, 0.05, 0.2]),
    redelivery=st.sampled_from([0.0, 0.15]),
    hot=st.sampled_from([0.0, 0.3]),
    num_files=st.integers(1, 5),
    parts=st.sampled_from([1, 3, 8]),
    salts=st.sampled_from([1, 4]),
)
def test_property_replay_matches_oracle(
    ray_session, tmp_path_factory, seed, num_convs, max_turns, malformed,
    redelivery, hot, num_files, parts, salts,
):
    """Any seeded change stream, any sharding/partitioning/salting: the
    engine's final state equals the serial pandas oracle bit-for-bit."""
    from data_exchange_routing_ray.synth import write_change_stream

    changes = make_change_stream(
        num_convs=num_convs, max_turns=max_turns,
        malformed_frac=malformed, redelivery_frac=redelivery,
        hot_frac=hot, seed=seed,
    )
    tmp = tmp_path_factory.mktemp(f"prop-{seed}-{num_convs}")
    files = write_change_stream(changes, str(tmp / "stream"), num_files=num_files)
    lake = CDCLake(str(tmp / "lake"), num_partitions=parts, num_salts=salts)
    lake.replay_files(files, files_per_epoch=2)
    got = _final(lake)
    exp = oracle_apply(changes)[TRANSCRIPT_COLS].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(0, 10_000),
    num_convs=st.integers(2, 40),
    max_turns=st.integers(1, 10),
    redelivery=st.sampled_from([0.0, 0.15]),
    n_sites=st.sampled_from([2, 3]),
    parts=st.sampled_from([1, 4]),
)
def test_property_multi_leader_converges(
    ray_session, tmp_path_factory, seed, num_convs, max_turns, redelivery,
    n_sites, parts,
):
    """Active-active property: split any seeded change stream across N
    sites by seq hash; each site applies its own slice first, then every
    other site's WAL with the fence down — in a site-specific order AND
    with each foreign WAL's rows shuffled (out-of-order delivery). All
    sites must converge bit-for-bit with each other and with the serial
    oracle over the full stream."""
    import ray.data

    from data_exchange_routing_ray.synth import make_change_stream, oracle_apply

    changes = make_change_stream(
        num_convs=num_convs, max_turns=max_turns,
        redelivery_frac=redelivery, seed=seed,
    )
    df = changes.to_pandas()
    site_of = pd.util.hash_array(df["seq"].to_numpy()) % n_sites
    rng = np.random.default_rng(seed)
    tmp = tmp_path_factory.mktemp(f"ml-prop-{seed}")

    finals = []
    for s in range(n_sites):
        lake = CDCLake(
            str(tmp / f"site{s}"), num_partitions=parts, multi_leader=True
        )
        own = df[site_of == s]
        lake.apply_changes(
            ray.data.from_arrow(pa.Table.from_pandas(own, preserve_index=False)),
            quarantine=False,
        )
        others = [o for o in range(n_sites) if o != s]
        rng.shuffle(others)
        for o in others:
            wal = df[site_of == o].sample(frac=1.0, random_state=seed + s + o)
            lake.apply_changes(
                ray.data.from_arrow(
                    pa.Table.from_pandas(wal, preserve_index=False)
                ),
                quarantine=False,
                fence=False,
            )
        finals.append(_final(lake))

    exp = oracle_apply(changes)[TRANSCRIPT_COLS].reset_index(drop=True)
    for s, got in enumerate(finals):
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(0, 10_000),
    num_convs=st.integers(2, 40),
    max_turns=st.integers(1, 10),
    n_epochs=st.integers(1, 4),
    parts=st.sampled_from([1, 4]),
    fparts=st.sampled_from([2, 6]),
    poll_mask=st.integers(0, 15),
)
def test_property_replication_converges(
    ray_session, tmp_path_factory, seed, num_convs, max_turns, n_epochs,
    parts, fparts, poll_mask,
):
    """Replication property: any seeded change stream split into E leader
    epochs, a follower polling at ANY subset of commit points (including
    never-in-between, i.e. one big catch-up), must end bit-identical to
    the leader and to the serial oracle — deletes, redeliveries and a
    different follower partition count included."""
    import ray.data

    changes = make_change_stream(
        num_convs=num_convs, max_turns=max_turns,
        redelivery_frac=0.15, seed=seed,
    )
    df = changes.to_pandas().sort_values("seq", kind="stable")
    cuts = np.linspace(0, len(df), n_epochs + 1).astype(int)
    tmp = tmp_path_factory.mktemp(f"repl-{seed}")
    leader = CDCLake(str(tmp / "lead"), num_partitions=parts)
    follower = CDCLake(str(tmp / "foll"), num_partitions=fparts)
    for i in range(n_epochs):
        part = df.iloc[cuts[i]: cuts[i + 1]]
        if len(part) == 0:
            continue
        leader.apply_changes(
            ray.data.from_arrow(
                pa.Table.from_pandas(part, preserve_index=False)
            ),
            quarantine=False,
        )
        if (poll_mask >> i) & 1:
            follower.replicate_from(leader, group="g")
    follower.replicate_from(leader, group="g")  # final catch-up
    exp = oracle_apply(changes)[TRANSCRIPT_COLS].reset_index(drop=True)
    pd.testing.assert_frame_equal(_final(follower), exp, check_dtype=False)
    pd.testing.assert_frame_equal(_final(follower), _final(leader), check_dtype=False)
    # caught up: nothing further to drain
    assert follower.replicate_from(leader, group="g") == []
