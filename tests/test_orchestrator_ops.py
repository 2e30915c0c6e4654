"""Config-driven orchestrator + newer operator tests.

Mirrors the reference's orchestrator unit matrix (Unit_FnOrchestrator.kt:
33-340: step ordering, error routing, fan-out counts, malformed-config
errors) against our Dataset interpreter.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from data_exchange_routing_ray.pipelines.orchestrator import (
    register_stage,
    registered_stages,
    run_pipeline,
)


def _changes_table(n=10):
    return pa.table(
        {
            "seq": pa.array(range(n), pa.int64()),
            "op": pa.array(
                ["insert"] * (n - 2) + ["bogus", "delete"], pa.string()
            ),
            "conv_id": pa.array([f"c{i%3}" for i in range(n)], pa.string()),
            "turn_idx": pa.array([i % 4 for i in range(n)], pa.int32()),
            "role": pa.array(["user"] * n, pa.string()),
            "text": pa.array([f"msg {i}" for i in range(n)], pa.string()),
            "tool": pa.array([""] * n, pa.string()),
            "ts": pa.array(
                np.full(n, np.datetime64("2024-06-01", "us")), pa.timestamp("us")
            ),
        }
    )


def test_steps_run_in_stepnumber_order(ray_session):
    import ray.data

    config = {
        "steps": [
            {"stepNumber": 2, "function": "filter_expr", "config": {"expr": "op != 'delete'"}},
            {"stepNumber": 1, "function": "validate_changes", "quarantineErrors": True},
        ]
    }
    res = run_pipeline(ray.data.from_arrow(_changes_table()), config)
    assert res.steps_run == ["validate_changes", "filter_expr"]
    # 1 bogus-op row quarantined, 1 delete filtered, 8 survive
    assert res.quarantine.count() == 1
    assert res.output.count() == 8


def test_unknown_function_is_config_error(ray_session):
    import ray.data

    with pytest.raises(ValueError, match="Unknown step function 'nope'"):
        run_pipeline(
            ray.data.from_arrow(_changes_table()),
            {"steps": [{"function": "nope"}]},
        )
    with pytest.raises(ValueError, match="missing 'function'"):
        run_pipeline(ray.data.from_arrow(_changes_table()), {"steps": [{}]})


def test_fail_if_any_errors_policy(ray_session):
    """fanInFailIfAnyFail parity: both polarities."""
    import ray.data

    from data_exchange_routing_ray.pipelines.orchestrator import PipelineFailedError

    bad = ray.data.from_arrow(_changes_table())  # contains one bogus op
    with pytest.raises(PipelineFailedError, match="1 row\\(s\\) errored"):
        run_pipeline(
            bad,
            {"steps": [{"function": "validate_changes", "failIfAnyErrors": True}]},
        )
    # clean stream passes and the error column is consumed
    clean = ray.data.from_arrow(_changes_table(8))  # n=8 → no bogus/delete rows? build clean
    clean = clean.map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("op"), "op",
            pa.array(["insert"] * b.num_rows),
        ),
        batch_format="pyarrow",
    )
    res = run_pipeline(
        clean,
        {"steps": [{"function": "validate_changes", "failIfAnyErrors": True}]},
    )
    assert "error" not in res.output.schema().names
    assert res.output.count() == 8


def test_custom_registered_fanout_stage(ray_session):
    import ray.data

    @register_stage("double_rows_test")
    def double_rows(ds, config):
        return ds.map_batches(
            lambda b: pa.concat_tables([b, b]), batch_format="pyarrow"
        )

    assert "double_rows_test" in registered_stages()
    res = run_pipeline(
        ray.data.from_arrow(_changes_table(4)),
        {"steps": [{"function": "double_rows_test"}]},
    )
    assert res.output.count() == 8
    assert res.quarantine is None


def test_batch_topk_matches_bruteforce(ray_session):
    import ray.data

    from data_exchange_routing_ray.functions.similarity import batch_topk_cosine

    rng = np.random.default_rng(3)
    n, d = 300, 16
    M = rng.standard_normal((n, d))
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": M[i].tolist()} for i in range(n)]
    )
    Q = M[:3]
    out = batch_topk_cosine(ds, Q, np.arange(3), k=5)
    # oracle: full cosine matrix
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    for qi in range(3):
        scores = np.round(Mn @ (Q[qi] / np.linalg.norm(Q[qi])), 6)
        order = np.lexsort((np.arange(n), -scores))[:5]
        got = out[out["query_id"] == qi]["vec_id"].to_numpy()
        assert set(got) == set(order), (qi, got, order)
    # each query's own vector is its top hit
    top1 = out.groupby("query_id").head(1)
    assert list(top1["vec_id"]) == [0, 1, 2]


def test_bpe_token_count():
    from data_exchange_routing_ray.functions.text import add_bpe_token_count

    t = pa.table({"text": pa.array(["Hello, world42!", "", "a-b"])})
    out = add_bpe_token_count(t)
    # Hello | , | world | 42 | !  = 5 ; "" = 0 ; a | - | b = 3
    assert out["n_bpe_tokens"].to_pylist() == [5, 0, 3]


def test_hll_within_2pct_of_exact():
    from data_exchange_routing_ray.functions.sketch import (
        hll_estimate,
        hll_merge,
        hll_sketch_batch,
    )

    rng = np.random.default_rng(11)
    vals = rng.integers(0, 10**12, size=200_000)
    exact = len(np.unique(vals))
    # sketch in 4 chunks, merge — mergeability is the point
    regs = None
    for chunk in np.array_split(vals, 4):
        s = hll_sketch_batch(chunk, precision=14)
        regs = s if regs is None else hll_merge(regs, s)
    est = hll_estimate(regs)
    assert abs(est - exact) / exact < 0.02, (est, exact)
    # tiny cardinality uses linear counting and is near-exact
    small = hll_estimate(hll_sketch_batch(np.arange(100), precision=14))
    assert abs(small - 100) <= 2


def test_resize_media_stage():
    from data_exchange_routing_ray.functions.multimodal import ResizeMedia

    t = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "payload": pa.array([bytes(range(100)) * 10], pa.binary()),
            "meta_width": pa.array([40], pa.int32()),
            "meta_height": pa.array([25], pa.int32()),
        }
    )
    out = ResizeMedia(target_w=8, target_h=8)(t)
    assert [len(p) for p in out["payload"].to_pylist()] == [64]
    assert out["meta_width"].to_pylist() == [8]
    assert out["meta_height"].to_pylist() == [8]
    # deterministic: same input → same bytes
    assert out["payload"].to_pylist() == ResizeMedia(8, 8)(t)["payload"].to_pylist()


def test_sample_frames_explodes():
    from data_exchange_routing_ray.functions.multimodal import sample_frames

    t = pa.table(
        {
            "media_id": pa.array([7, 8], pa.int64()),
            "payload": pa.array([bytes(256), bytes(10)], pa.binary()),
        }
    )
    out = sample_frames(t, frame_size=64, every_nth=2)
    # media 7: 4 frames, every 2nd → idx 0, 2; media 8: too small → none
    assert out["media_id"].to_pylist() == [7, 7]
    assert out["frame_idx"].to_pylist() == [0, 2]
    assert all(len(f) == 64 for f in out["frame"].to_pylist())


def test_ngram_jaccard_verification():
    from data_exchange_routing_ray.functions.dedup import verify_jaccard_pairs

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "the quick brown fox jumps",
                "the quick brown fox leaps",
                "completely different words here now",
            ],
        }
    )
    pairs = pd.DataFrame({"id_a": [1, 1], "id_b": [2, 3]})
    out = verify_jaccard_pairs(docs, pairs)
    # 3-shingles: doc1/doc2 share 2 of 4 distinct → 0.5; doc1/doc3 share 0
    assert out["jaccard"].tolist() == [0.5, 0.0]
