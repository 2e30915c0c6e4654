"""End-to-end CDC engine correctness vs the serial pandas oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from data_exchange_routing_ray.pipelines.cdc import CDCLake
from data_exchange_routing_ray.synth import (
    make_change_stream,
    oracle_apply,
    write_change_stream,
)

TRANSCRIPT_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def assert_matches_oracle(lake: CDCLake, oracle: pd.DataFrame, cols=None):
    cols = cols or TRANSCRIPT_COLS
    got = lake.final_table().to_pandas()
    exp = oracle.reset_index(drop=True)
    got = got[cols].reset_index(drop=True)
    exp = exp[cols].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_single_epoch_upsert_matches_oracle(ray_session, tmp_path):
    import ray.data

    changes = make_change_stream(num_convs=50, max_turns=8, seed=7)
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=8)
    res = lake.apply_changes(ray.data.from_arrow(changes))
    oracle = oracle_apply(changes)
    assert res.changes_applied > 0
    assert res.total_rows == len(oracle)
    assert_matches_oracle(lake, oracle)


def test_multi_epoch_replay_matches_oracle(ray_session, tmp_path):
    changes = make_change_stream(num_convs=80, max_turns=10, seed=11)
    files = write_change_stream(changes, str(tmp_path / "stream"), num_files=5)
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=8)
    results = lake.replay_files(files)
    assert len(results) == 5
    assert_matches_oracle(lake, oracle_apply(changes))
    # watermark advanced monotonically
    offsets = [r.applied_offset for r in results]
    assert offsets == sorted(offsets)


def test_malformed_rows_quarantined(ray_session, tmp_path):
    import ray.data

    changes = make_change_stream(
        num_convs=40, max_turns=6, malformed_frac=0.1, seed=13
    )
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=4)
    res = lake.apply_changes(ray.data.from_arrow(changes))
    oracle = oracle_apply(changes)
    assert res.rows_quarantined > 0
    assert_matches_oracle(lake, oracle)
    quar = lake.quarantine_table()
    assert quar is not None and quar.num_rows == res.rows_quarantined
    assert "error" in quar.column_names
    # every quarantine row carries a non-null reference-style error message
    errs = quar["error"].to_pylist()
    assert all(e for e in errs)


def test_duplicate_redelivery_idempotent(ray_session, tmp_path):
    import ray.data

    changes = make_change_stream(
        num_convs=40, max_turns=6, redelivery_frac=0.2, seed=17
    )
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=4)
    lake.apply_changes(ray.data.from_arrow(changes))
    assert_matches_oracle(lake, oracle_apply(changes))


def test_epoch_replay_is_noop(ray_session, tmp_path):
    """Applying the same epoch twice (redelivered micro-batch) is a no-op."""
    import ray.data

    changes = make_change_stream(num_convs=30, max_turns=5, seed=19)
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=4)
    lake.apply_changes(ray.data.from_arrow(changes))
    before = lake.final_table(with_seq=True)
    res2 = lake.apply_changes(ray.data.from_arrow(changes))  # full redelivery
    after = lake.final_table(with_seq=True)
    assert res2.changes_applied == 0
    assert res2.changes_fenced > 0
    assert before.equals(after)


def test_resume_skips_committed_files(ray_session, tmp_path):
    changes = make_change_stream(num_convs=60, max_turns=8, seed=23)
    files = write_change_stream(changes, str(tmp_path / "stream"), num_files=6)
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=8)
    lake.replay_files(files[:3])
    # crash + resume: a fresh engine instance over the same lake dir
    lake2 = CDCLake(str(tmp_path / "lake"))
    results = lake2.replay_files(files)  # full list again
    assert len(results) == 3  # first 3 shards skipped via parquet stats
    assert_matches_oracle(lake2, oracle_apply(changes))


def test_bootstrap_then_changes(ray_session, tmp_path):
    import ray.data

    base = make_change_stream(num_convs=30, max_turns=5, update_frac=0, delete_frac=0, seed=29)
    base_df = oracle_apply(base)  # a plain transcript table
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=4)
    lake.bootstrap(ray.data.from_pandas(base_df[TRANSCRIPT_COLS]))
    assert lake.final_table().num_rows == len(base_df)

    changes = make_change_stream(num_convs=30, max_turns=5, seq_start=1, seed=31)
    lake.apply_changes(ray.data.from_arrow(changes))
    oracle = oracle_apply(changes, base=base_df[TRANSCRIPT_COLS].copy())
    assert_matches_oracle(lake, oracle)


def test_delete_semantics(ray_session, tmp_path):
    import ray.data

    tbl = pa.table(
        {
            "seq": pa.array([1, 2, 3, 4], pa.int64()),
            "op": ["insert", "insert", "delete", "update"],
            "conv_id": ["c1", "c1", "c1", "c2"],
            "turn_idx": pa.array([0, 1, 0, 0], pa.int32()),
            "role": ["user", "assistant", None, "user"],
            "text": ["hello", "hi", None, "late-update"],
            "tool": ["", "", None, ""],
            "ts": pa.array([1000, 2000, 3000, 4000], pa.timestamp("us")),
        }
    )
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=2)
    lake.apply_changes(ray.data.from_arrow(tbl))
    final = lake.final_table().to_pandas()
    # (c1,0) deleted; (c1,1) survives; (c2,0) update-without-insert upserts
    assert set(zip(final["conv_id"], final["turn_idx"])) == {("c1", 1), ("c2", 0)}


def test_hot_key_skew(ray_session, tmp_path):
    """One conversation receiving ~30% of update traffic still merges right."""
    import ray.data

    changes = make_change_stream(
        num_convs=50, max_turns=8, update_frac=1.0, hot_frac=0.3, seed=37
    )
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=8)
    lake.apply_changes(ray.data.from_arrow(changes))
    assert_matches_oracle(lake, oracle_apply(changes))


def test_mixed_schema_shards_in_one_epoch(ray_session, tmp_path):
    """Old-schema and evolved-schema shards applied in the SAME epoch:
    the shuffle promotes schemas and the merge backfills nulls."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    ch1 = make_change_stream(num_convs=20, max_turns=4, seed=5)
    ch2 = make_change_stream(
        num_convs=20, max_turns=4, seed=6, seq_start=10_000, evolve_lang_after=0
    )
    sdir = tmp_path / "s"
    sdir.mkdir()
    pq.write_table(ch1, str(sdir / "changes-00000.parquet"))
    pq.write_table(ch2, str(sdir / "changes-00001.parquet"))
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=4)
    lake.replay_files(sorted(glob.glob(str(sdir / "*.parquet"))), files_per_epoch=2,
                      quarantine=False)
    tab = lake.final_table()
    assert "lang" in tab.column_names
    both = pa.concat_tables([ch1, ch2], promote_options="permissive")
    exp = oracle_apply(both)
    got = tab.to_pandas()
    pd.testing.assert_frame_equal(
        got[TRANSCRIPT_COLS].reset_index(drop=True),
        exp[TRANSCRIPT_COLS].reset_index(drop=True),
        check_dtype=False,
    )
    assert (
        got.set_index(["conv_id", "turn_idx"])["lang"].sort_index().fillna("∅")
        == exp.set_index(["conv_id", "turn_idx"])["lang"].sort_index().fillna("∅")
    ).all()


def test_shard_missing_required_column_dead_letters(ray_session, tmp_path):
    """A malformed shard lacking a required column quarantines its rows
    (with the matching error string) instead of crashing the epoch."""
    import pyarrow as pa
    import ray.data

    from data_exchange_routing_ray.stages.validate import ERR_BAD_OP

    bad = pa.table(
        {
            "seq": pa.array([1, 2], pa.int64()),
            # no "op" column at all
            "conv_id": pa.array(["a", "b"], pa.string()),
            "turn_idx": pa.array([0, 0], pa.int32()),
            "role": pa.array(["user", "user"], pa.string()),
            "text": pa.array(["x", "y"], pa.string()),
            "tool": pa.array(["", ""], pa.string()),
            "ts": pa.array([0, 0], pa.timestamp("us")),
        }
    )
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=2)
    res = lake.apply_changes(ray.data.from_arrow(bad))
    assert res.changes_applied == 0
    assert res.rows_quarantined == 2
    q = lake.quarantine_table()
    assert set(q["error"].to_pylist()) == {ERR_BAD_OP}


def test_large_string_payloads(ray_session, tmp_path):
    """Wide-text safety (SURVEY §7.3): large_string columns flow through
    validate → combine → merge → commit and match the oracle."""
    import pyarrow as pa
    import ray.data

    changes = make_change_stream(num_convs=25, max_turns=6, seed=61)
    for col in ("text", "conv_id", "role", "tool", "op"):
        i = changes.schema.get_field_index(col)
        changes = changes.set_column(
            i, pa.field(col, pa.large_string()), changes[col].cast(pa.large_string())
        )
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=4)
    lake.apply_changes(ray.data.from_arrow(changes))
    assert_matches_oracle(lake, oracle_apply(changes))


def test_schema_evolution_added_column(ray_session, tmp_path):
    import ray.data

    changes = make_change_stream(num_convs=40, max_turns=6, seed=41)
    n = changes.num_rows
    first, second = changes.slice(0, n // 2), changes.slice(n // 2)
    second = second.append_column(
        "lang", pa.array(["en"] * second.num_rows, pa.string())
    )
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=4)
    lake.apply_changes(ray.data.from_arrow(first))
    lake.apply_changes(ray.data.from_arrow(second))
    final = lake.final_table()
    assert "lang" in final.column_names
    df = final.to_pandas()
    # rows last written by epoch-1 events carry lang; epoch-0-only rows are null
    assert df["lang"].notna().any() and df["lang"].isna().any()
    # value correctness vs oracle on the shared columns
    both = pa.concat_tables([first, second], promote_options="permissive")
    assert_matches_oracle(lake, oracle_apply(both), cols=TRANSCRIPT_COLS)


def test_schema_evolution_widened_types(ray_session, tmp_path):
    import ray.data

    changes = make_change_stream(num_convs=20, max_turns=4, seed=43)
    n = changes.num_rows
    first, second = changes.slice(0, n // 2), changes.slice(n // 2)
    # widen turn_idx to int64 and ts to ns in the later batch
    schema = second.schema
    widened = schema.set(
        schema.get_field_index("turn_idx"), pa.field("turn_idx", pa.int64())
    )
    widened = widened.set(
        widened.get_field_index("ts"), pa.field("ts", pa.timestamp("ns"))
    )
    second = second.cast(widened)
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=4)
    lake.apply_changes(ray.data.from_arrow(first))
    lake.apply_changes(ray.data.from_arrow(second))
    final = lake.final_table()
    assert final.schema.field("turn_idx").type == pa.int64()
    assert final.schema.field("ts").type == pa.timestamp("ns")
    both = pa.concat_tables([first, second.cast(first.schema)])
    exp = oracle_apply(both)
    got = final.to_pandas()
    assert len(got) == len(exp)
    assert list(got["text"]) == list(exp["text"])


def test_report_envelopes_carry_quarantine_issues(ray_session, tmp_path):
    """S9/S12 versioned-envelope parity (PSReportEnvelope.kt:4-58): the
    QUARANTINED lineage row carries each distinct dead-letter error as a
    structured Issue{level=ERROR, message}, SUCCESS rows carry an empty
    issues list, and every row carries the envelope constants."""
    import ray.data

    changes = make_change_stream(num_convs=20, max_turns=4, seed=47).to_pandas()
    changes.loc[changes.index[:3], "op"] = "upsert"  # invalid op -> quarantine
    changes.loc[changes.index[3:5], "conv_id"] = ""  # missing conv_id
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=4)
    lake.apply_changes(
        ray.data.from_arrow(pa.Table.from_pandas(changes, preserve_index=False))
    )
    lin = lake.lineage.read_all().to_pandas()
    assert set(lin["report_schema_version"]) == {"1.0.0"}
    assert set(lin["service"]) == {"Routing"}
    assert set(lin["stage"]) == {"dex-routing"}
    assert set(lin["content_schema_name"]) == {"lake-partition-commit"}
    qrow = lin[lin["status"] == "QUARANTINED"]
    assert len(qrow) == 1
    issues = list(qrow.iloc[0]["issues"])
    msgs = {i["message"] for i in issues}
    assert msgs == {
        "Unsupported op; expected insert|update|delete",
        "Missing conv_id in event",
    }
    assert all(i["level"] == "ERROR" for i in issues)
    ok = lin[lin["status"] == "SUCCESS"]
    assert len(ok) > 0
    assert all(len(v) == 0 for v in ok["issues"])


def test_lineage_reads_pre_envelope_epochs(ray_session, tmp_path):
    """A lake whose lineage was written BEFORE the round-3 envelope
    widening (no report_schema_version/.../issues columns) must stay
    readable after the upgrade: old epochs backfill nulls, new epochs
    carry the envelope — one concat, no schema error."""
    import pyarrow.parquet as pq

    import ray.data
    from data_exchange_routing_ray.schemas import LINEAGE_SCHEMA

    lake = CDCLake(str(tmp_path / "lake"), num_partitions=4)
    lake.apply_changes(
        ray.data.from_arrow(make_change_stream(num_convs=10, max_turns=3, seed=3))
    )
    # rewrite epoch 0's lineage file with the PRE-upgrade 9-column schema
    import glob

    f = sorted(glob.glob(str(tmp_path / "lake" / "lineage" / "epoch-*.parquet")))[0]
    old = pq.read_table(f).select(
        [n for n in LINEAGE_SCHEMA.names
         if n not in ("report_schema_version", "content_schema_name",
                      "content_schema_version", "service", "stage",
                      "version", "issues")]
    )
    pq.write_table(old, f)
    # a post-upgrade epoch appends the widened schema
    lake.apply_changes(
        ray.data.from_arrow(
            make_change_stream(num_convs=10, max_turns=3, seq_start=10_000, seed=5)
        )
    )
    lin = lake.lineage.read_all()
    assert lin.schema.equals(LINEAGE_SCHEMA)
    df = lin.to_pandas()
    assert df["report_schema_version"].isna().sum() > 0  # old epoch: nulls
    assert (df["report_schema_version"] == "1.0.0").sum() > 0  # new epoch
