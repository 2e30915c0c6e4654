"""Cross-lake transactional group commit: atomic visibility + roll-forward.

Crash points injected between the per-lake publishes exercise the three
interesting states: nothing applied, first lake applied but unrecorded,
first lake applied and recorded. In every case consistent readers see the
pre-transaction snapshot until recovery commits the group, and recovery
converges to the exactly-once final state (seq fencing absorbs any
double-apply).
"""

import pandas as pd
import pytest

from data_exchange_routing_ray.pipelines.cdc import CDCLake
from data_exchange_routing_ray.state.group_txn import GroupTransaction
from data_exchange_routing_ray.synth import make_change_stream, oracle_apply

COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _mk_changes(seed, seq_start=1):
    return make_change_stream(num_convs=30, max_turns=6, seed=seed, seq_start=seq_start)


def _apply(changes):
    def fn(lake: CDCLake):
        import ray.data

        return lake.apply_changes(ray.data.from_arrow(changes), quarantine=False)

    return fn


def _table(lake, epoch=None):
    return (
        lake.final_table(epoch=epoch)
        .to_pandas()[COLS]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def _expect(changes):
    return (
        oracle_apply(changes)[COLS]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


@pytest.fixture()
def two_lakes(tmp_path):
    lakes = {
        "a": CDCLake(str(tmp_path / "lake_a"), num_partitions=4),
        "b": CDCLake(str(tmp_path / "lake_b"), num_partitions=4),
    }
    return GroupTransaction(str(tmp_path / "journal"), lakes), lakes


def test_group_commit_all(ray_session, two_lakes):
    txn, lakes = two_lakes
    ca, cb = _mk_changes(1), _mk_changes(2)
    done = txn.run({"a": _apply(ca), "b": _apply(cb)})
    assert set(done) == {"a", "b"}
    pd.testing.assert_frame_equal(_table(lakes["a"]), _expect(ca), check_dtype=False)
    pd.testing.assert_frame_equal(_table(lakes["b"]), _expect(cb), check_dtype=False)
    assert txn.consistent_epochs() == done
    assert txn.journal.pending() == []


def test_crash_between_lakes_hides_partial_then_rolls_forward(
    ray_session, two_lakes
):
    txn, lakes = two_lakes
    # seed both lakes with a committed group so there is a visible pre-state
    base_a, base_b = _mk_changes(3), _mk_changes(4)
    pre = txn.run({"a": _apply(base_a), "b": _apply(base_b)})

    # second round: seqs above the committed watermark (upstream offsets
    # are monotone across deliveries), so nothing is fenced spuriously
    ca, cb = _mk_changes(5, seq_start=10_000), _mk_changes(6, seq_start=10_000)
    import pyarrow as _pa

    exp_a = _expect(_pa.concat_tables([base_a, ca]))
    exp_b = _expect(_pa.concat_tables([base_b, cb]))

    def boom(lake):
        raise RuntimeError("crash before lake b applies")

    with pytest.raises(RuntimeError, match="crash before lake b"):
        txn.run({"a": _apply(ca), "b": boom})

    # lake a HAS published its epoch, but consistent readers must not see it
    assert lakes["a"].manifest.epoch > pre["a"]
    pins = txn.consistent_epochs()
    assert pins == pre
    pd.testing.assert_frame_equal(
        _table(lakes["a"], epoch=pins["a"]), _expect(base_a), check_dtype=False
    )
    pd.testing.assert_frame_equal(
        _table(lakes["b"], epoch=pins["b"]), _expect(base_b), check_dtype=False
    )

    # roll-forward recovery with re-supplied inputs commits the group
    completed = txn.recover({"a": _apply(ca), "b": _apply(cb)})
    assert len(completed) == 1
    assert txn.journal.pending() == []
    # 'a' was recorded done -> applied exactly once; 'b' applied by recovery
    pd.testing.assert_frame_equal(_table(lakes["a"]), exp_a, check_dtype=False)
    pd.testing.assert_frame_equal(_table(lakes["b"]), exp_b, check_dtype=False)
    # group now visible to consistent readers
    assert txn.consistent_epochs() == {
        "a": lakes["a"].manifest.epoch,
        "b": lakes["b"].manifest.epoch,
    }
    # idempotent: nothing left to recover
    assert txn.recover({}) == []


def test_crash_after_publish_before_journal_mark(ray_session, two_lakes):
    """Worst crash point: lake a published its epoch but the journal never
    recorded it. Recovery re-applies a — seq fencing turns the re-apply
    into a no-op epoch, so the final state is still exactly-once."""
    txn, lakes = two_lakes
    ca, cb = _mk_changes(7), _mk_changes(8)

    pre = {n: lakes[n].manifest.epoch for n in lakes}
    txn_id = txn.journal.begin(pre)
    _apply(ca)(lakes["a"])  # published, but crash before mark_lake_done

    assert txn.journal.pending()[0]["txn_id"] == txn_id
    completed = txn.recover({"a": _apply(ca), "b": _apply(cb)})
    assert completed == [txn_id]
    pd.testing.assert_frame_equal(_table(lakes["a"]), _expect(ca), check_dtype=False)
    pd.testing.assert_frame_equal(_table(lakes["b"]), _expect(cb), check_dtype=False)
    # the fenced re-apply advanced a's epoch without changing rows
    assert lakes["a"].manifest.epoch == pre["a"] + 2


def test_run_requires_known_lakes(ray_session, two_lakes):
    txn, _ = two_lakes
    with pytest.raises(KeyError, match="unknown lakes"):
        txn.run({"c": lambda lake: None})
