"""Block-layout invariance for the newest distributed plans: exact rank
(_rank_ranged consumers), the CUSUM prefix-scan, the graph family, and the
group-commit journal under randomized crash points.

A correct distributed plan is a pure function of the DATA — re-running it
with every parquet read forced to a hostile block count (7, then 23) must
reproduce identical values.
"""

import pandas as pd
import pytest

from data_exchange_routing_ray.pipelines import events_cdc as q

SF = "/root/testdata/sf0.001"


def _perturb(monkeypatch, nblocks):
    import ray.data

    orig = ray.data.read_parquet

    def perturbed(*args, **kwargs):
        kwargs["override_num_blocks"] = nblocks
        return orig(*args, **kwargs)

    monkeypatch.setattr(ray.data, "read_parquet", perturbed)
    return orig


@pytest.mark.parametrize(
    "fn",
    [
        q.session_duration_deciles,
        q.cusum_max_deviation,
        q.rfm_segments,
        q.triangle_count_parts,
        q.rank_agreement_topk,
        q.time_weighted_value_integral,
        # batches 27-32: iterative graph, retrieval, mining, windows
        q.pagerank_parts,
        q.khop_reachable_parts,
        q.bm25_score_docs,
        q.basket_association_rules,
        q.event_type_correlation_matrix,
        q.conv_context_windows,
        q.small_cell_suppression,
        q.lake_merge_into,
        q.pit_feature_join,
        q.decay_weighted_user_scores,
        q.vocab_drift_topk,
    ],
    ids=lambda f: f.__name__,
)
def test_block_layout_invariance(ray_session, monkeypatch, fn):
    base = fn(SF).to_pandas()
    for nb in (7, 23):
        import ray.data

        orig = _perturb(monkeypatch, nb)
        got = fn(SF).to_pandas()
        monkeypatch.setattr(ray.data, "read_parquet", orig)
        pd.testing.assert_frame_equal(
            base.reset_index(drop=True), got.reset_index(drop=True)
        )


def test_group_txn_random_crash_points(ray_session, tmp_path):
    """Whatever lake the crash lands on, recovery must converge to the
    same committed state as a crash-free run."""
    import ray.data

    from data_exchange_routing_ray.pipelines.cdc import CDCLake
    from data_exchange_routing_ray.state.group_txn import GroupTransaction
    from data_exchange_routing_ray.synth import make_change_stream, oracle_apply

    names = ["a", "b", "c"]
    streams = {n: make_change_stream(num_convs=12, max_turns=4, seed=i) for i, n in enumerate(names)}
    want = {
        n: oracle_apply(streams[n])
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
        for n in names
    }

    def apply_fn(n):
        return lambda lake: lake.apply_changes(
            ray.data.from_arrow(streams[n]), quarantine=False
        )

    for crash_at in range(len(names)):
        lakes = {
            n: CDCLake(str(tmp_path / f"lake_{crash_at}_{n}"), num_partitions=4)
            for n in names
        }
        txn = GroupTransaction(str(tmp_path / f"journal_{crash_at}"), lakes)

        applied = {"n": 0}

        def maybe_crash(n):
            real = apply_fn(n)

            def f(lake):
                if applied["n"] == crash_at:
                    applied["n"] += 1
                    raise RuntimeError(f"crash at position {crash_at}")
                applied["n"] += 1
                return real(lake)

            return f

        with pytest.raises(RuntimeError):
            txn.run({n: maybe_crash(n) for n in names})
        assert len(txn.journal.pending()) == 1
        txn.recover({n: apply_fn(n) for n in names})
        assert txn.journal.pending() == []
        for n in names:
            got = (
                lakes[n]
                .final_table()
                .to_pandas()[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
                .sort_values(["conv_id", "turn_idx"])
                .reset_index(drop=True)
            )
            pd.testing.assert_frame_equal(
                got,
                want[n][["conv_id", "turn_idx", "role", "text", "tool", "ts"]],
                check_dtype=False,
            )
