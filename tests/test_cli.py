"""CLI surface smoke test: replay → status → repartition → vacuum in a
subprocess (own Ray session), asserting the JSON contract of each command."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args, check=True):
    out = subprocess.run(
        [sys.executable, "-m", "data_exchange_routing_ray.cli", *args],
        capture_output=True, text=True, cwd=REPO,
        env={**os.environ, "RAY_DEDUP_LOGS": "0"},
    )
    if check:
        assert out.returncode == 0, out.stderr[-2000:]
    return out


def test_cli_end_to_end(ray_session, tmp_path):
    # build a stream using the in-process session
    from data_exchange_routing_ray.synth import make_change_stream, write_change_stream

    ch = make_change_stream(num_convs=30, max_turns=5, malformed_frac=0.05, seed=44)
    write_change_stream(ch, str(tmp_path / "stream"), num_files=2)
    lake = str(tmp_path / "lake")

    out = _run("replay", "--lake", lake, "--stream", str(tmp_path / "stream"),
               "--files-per-epoch", "1", "--num-partitions", "4", "--num-cpus", "4")
    lines = [json.loads(l) for l in out.stdout.strip().splitlines()]
    assert [r["epoch"] for r in lines] == [0, 1]
    assert lines[-1]["total_rows"] > 0

    # resume is a no-op
    out = _run("replay", "--lake", lake, "--stream", str(tmp_path / "stream"),
               "--num-cpus", "4")
    assert "skipped" in out.stdout

    st = json.loads(_run("status", "--lake", lake).stdout)
    assert st["epoch"] == 1 and st["total_rows"] == lines[-1]["total_rows"]

    rp = json.loads(_run("repartition", "--lake", lake, "--num-partitions", "8",
                         "--num-cpus", "4").stdout.strip().splitlines()[-1])
    assert rp["num_partitions"] == 8 and rp["total_rows"] == st["total_rows"]

    vac = json.loads(_run("vacuum", "--lake", lake).stdout)
    assert vac["removed_files"] > 0

    # compact on a delta-less lake is a clean no-op
    cp = json.loads(_run("compact", "--lake", lake, "--num-cpus", "4")
                    .stdout.strip().splitlines()[-1])
    assert cp == {"skipped": "no open delta files"}

    # error paths: exit 2, no side effects
    bad = _run("status", "--lake", str(tmp_path / "nope"), check=False)
    assert bad.returncode == 2
    assert not (tmp_path / "nope").exists()


def test_cli_compact_folds_deltas(ray_session, tmp_path):
    """Delta-policy lake: cli compact folds every open delta into a fresh
    base, after which the actors/exchange backends may write again."""
    import ray.data

    from data_exchange_routing_ray.pipelines.cdc import CDCLake
    from data_exchange_routing_ray.synth import make_change_stream

    lake_dir = str(tmp_path / "lake")
    lake = CDCLake(lake_dir, num_partitions=4, merge_policy="delta", delta_ratio=1.0)
    base = make_change_stream(num_convs=20, max_turns=4, seed=6)
    more = make_change_stream(num_convs=20, max_turns=4, seed=7, seq_start=50_000)
    lake.apply_changes(ray.data.from_arrow(base), quarantine=False)
    lake.apply_changes(ray.data.from_arrow(more), quarantine=False)
    n_deltas = sum(len(e.deltas) for e in lake.manifest.partitions.values())
    assert n_deltas > 0
    before = lake.final_table()

    cp = json.loads(_run("compact", "--lake", lake_dir, "--num-cpus", "4")
                    .stdout.strip().splitlines()[-1])
    assert cp["deltas_folded"] == n_deltas

    after = CDCLake(lake_dir, num_partitions=4)
    assert not any(e.deltas for e in after.manifest.partitions.values())
    assert after.final_table().equals(before)


def test_cli_export_incremental(ray_session, tmp_path):
    from data_exchange_routing_ray.synth import make_change_stream, write_change_stream

    ch = make_change_stream(num_convs=25, max_turns=4, seed=9)
    write_change_stream(ch, str(tmp_path / "stream"), num_files=2)
    lake = str(tmp_path / "lake")
    _run(
        "replay", "--lake", lake, "--stream", str(tmp_path / "stream"),
        "--files-per-epoch", "1", "--num-partitions", "8", "--num-cpus", "2",
    )
    out = _run(
        "export", "--lake", lake, "--since-epoch", "0",
        "--out", str(tmp_path / "backup"),
    )
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    assert rep["current_epoch"] == 1
    assert rep["rows_exported"] > 0
    assert rep["partitions_exported"]
    files = os.listdir(str(tmp_path / "backup"))
    assert len(files) == len(rep["partitions_exported"])
    # exporting since the current epoch is a no-op
    out2 = _run(
        "export", "--lake", lake, "--since-epoch", str(rep["current_epoch"]),
        "--out", str(tmp_path / "backup2"),
    )
    rep2 = json.loads(out2.stdout.strip().splitlines()[-1])
    assert rep2["rows_exported"] == 0 and rep2["partitions_exported"] == []
    # missing lake errors cleanly
    bad = _run("export", "--lake", str(tmp_path / "nope"), "--since-epoch", "0",
               "--out", str(tmp_path / "x"), check=False)
    assert bad.returncode == 2


def test_cli_merge(ray_session, tmp_path):
    import pandas as pd

    from data_exchange_routing_ray.synth import make_change_stream, write_change_stream

    ch = make_change_stream(num_convs=20, max_turns=4, seed=3)
    write_change_stream(ch, str(tmp_path / "stream"), num_files=1)
    lake = str(tmp_path / "lake")
    _run(
        "replay", "--lake", lake, "--stream", str(tmp_path / "stream"),
        "--files-per-epoch", "1", "--num-partitions", "4", "--num-cpus", "2",
    )
    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    before = CDCLake(lake).final_table().to_pandas()
    key = (before.iloc[0]["conv_id"], int(before.iloc[0]["turn_idx"]))
    stg = pd.DataFrame(
        [
            {
                "seq": 1, "conv_id": key[0], "turn_idx": key[1],
                "role": "assistant", "text": "cli-merged", "tool": "m",
                "ts": pd.Timestamp("2024-03-01"), "del_flag": False,
            },
            {
                "seq": 2, "conv_id": "conv-new", "turn_idx": 0,
                "role": "user", "text": "cli-insert", "tool": "m",
                "ts": pd.Timestamp("2024-03-01"), "del_flag": False,
            },
        ]
    )
    stg["turn_idx"] = stg["turn_idx"].astype("int32")
    stg.to_parquet(str(tmp_path / "staging.parquet"))
    out = _run(
        "merge", "--lake", lake, "--staging", str(tmp_path / "staging.parquet"),
        "--num-cpus", "2",
    )
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    assert rep["changes_applied"] == 2
    after = CDCLake(lake).final_table().to_pandas()
    got = {(r.conv_id, r.turn_idx): r.text for r in after.itertuples(index=False)}
    assert got[key] == "cli-merged"
    assert got[("conv-new", 0)] == "cli-insert"
    assert len(after) == len(before) + 1


def test_cli_branch_lifecycle(ray_session, tmp_path):
    from data_exchange_routing_ray.synth import make_change_stream, write_change_stream

    ch = make_change_stream(num_convs=10, max_turns=3, seed=5)
    write_change_stream(ch, str(tmp_path / "stream"), num_files=1)
    lake = str(tmp_path / "lake")
    _run(
        "replay", "--lake", lake, "--stream", str(tmp_path / "stream"),
        "--files-per-epoch", "1", "--num-partitions", "4", "--num-cpus", "2",
    )
    out = _run("branch", "create", "--lake", lake, "--name", "exp")
    assert json.loads(out.stdout.strip().splitlines()[-1])["branch"] == "exp"
    lst = json.loads(_run("branch", "list", "--lake", lake).stdout.strip().splitlines()[-1])
    assert {r["branch"] for r in lst} == {"main", "exp"}
    assert len({r["epoch"] for r in lst}) == 1  # same head at fork
    ff = _run("branch", "ff", "--lake", lake, "--name", "exp")
    assert json.loads(ff.stdout.strip().splitlines()[-1])["merged"] == "exp"


def test_cli_card(ray_session, tmp_path):
    from data_exchange_routing_ray.synth import make_change_stream, write_change_stream

    ch = make_change_stream(num_convs=15, max_turns=3, seed=2)
    write_change_stream(ch, str(tmp_path / "stream"), num_files=1)
    lake = str(tmp_path / "lake")
    _run(
        "replay", "--lake", lake, "--stream", str(tmp_path / "stream"),
        "--files-per-epoch", "1", "--num-partitions", "4", "--num-cpus", "2",
    )
    out = _run("card", "--lake", lake, "--num-cpus", "2")
    card = json.loads(out.stdout.strip().splitlines()[-1])
    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    final = CDCLake(lake).final_table().to_pandas()
    assert card["n_rows"] == len(final)
    assert card["n_conversations"] == final["conv_id"].nunique()
    assert card["n_user_rows"] + card["n_assistant_rows"] <= card["n_rows"]


def test_cli_diff(ray_session, tmp_path):
    from data_exchange_routing_ray.synth import make_change_stream, write_change_stream

    ch = make_change_stream(num_convs=12, max_turns=3, seed=8)
    write_change_stream(ch, str(tmp_path / "stream"), num_files=2)
    lake = str(tmp_path / "lake")
    _run(
        "replay", "--lake", lake, "--stream", str(tmp_path / "stream"),
        "--files-per-epoch", "1", "--num-partitions", "4", "--num-cpus", "2",
    )
    out = _run("diff", "--lake", lake, "--from-epoch", "0", "--to-epoch", "1",
               "--num-cpus", "2")
    lines = [json.loads(x) for x in out.stdout.strip().splitlines()
             if x.startswith("{")]
    assert lines, "second epoch must produce envelopes"
    assert {r["op"] for r in lines} <= {"insert", "update", "delete"}
    # envelope count equals the row-level diff of the two committed states
    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    lk = CDCLake(lake)
    old = lk.final_table(epoch=0).to_pandas().set_index(["conv_id", "turn_idx"])["text"]
    new = lk.final_table(epoch=1).to_pandas().set_index(["conv_id", "turn_idx"])["text"]
    n_ins = len(new.index.difference(old.index))
    n_del = len(old.index.difference(new.index))
    common = old.index.intersection(new.index)
    n_upd = int((old.loc[common] != new.loc[common]).sum())
    assert len(lines) == n_ins + n_del + n_upd


def test_cli_gc(ray_session, tmp_path):
    """gc subcommand: compacts multi-leader tombstones at/below the given
    cross-site watermark and persists it as the manifest floor fence."""
    import pyarrow as pa
    import ray.data

    from data_exchange_routing_ray.pipelines.cdc import CDCLake
    from data_exchange_routing_ray.schemas import CHANGE_SCHEMA

    rows = [
        {"seq": 1, "op": "insert", "conv_id": "conv-1", "turn_idx": 0,
         "role": "user", "text": "a", "tool": None, "ts": 1_000_000},
        {"seq": 2, "op": "delete", "conv_id": "conv-2", "turn_idx": 0,
         "role": "user", "text": None, "tool": None, "ts": 2_000_000},
    ]
    cols = {
        f.name: pa.array([r[f.name] for r in rows], f.type)
        for f in CHANGE_SCHEMA
    }
    lake_dir = str(tmp_path / "ml")
    lake = CDCLake(lake_dir, num_partitions=4, multi_leader=True)
    lake.apply_changes(ray.data.from_arrow(pa.table(cols)), quarantine=False)

    out = _run("gc", "--lake", lake_dir, "--watermark", "2", "--num-cpus", "4")
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["gc_watermark"] == 2 and res["total_rows"] == 1

    reopened = CDCLake(lake_dir, multi_leader=True)
    assert reopened.manifest.gc_watermark == 2

    # watermark ahead of the site's own applied offset must fail loudly
    bad = _run("gc", "--lake", lake_dir, "--watermark", "999", check=False)
    assert bad.returncode != 0


def test_cli_status_as_of(ray_session, tmp_path):
    """status --as-of resolves a wall-clock µs timestamp to the committed
    epoch via the lineage commit log and reports THAT manifest."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from data_exchange_routing_ray.pipelines.cdc import CDCLake
    from data_exchange_routing_ray.schemas import CHANGE_SCHEMA

    def changes(seq, text):
        rows = {"seq": [seq], "op": ["insert"], "conv_id": ["conv-1"],
                "turn_idx": [seq], "role": ["user"], "text": [text],
                "tool": [None], "ts": [1_700_000_000_000_000 + seq]}
        return ray.data.from_arrow(
            pa.table({f.name: pa.array(rows[f.name], f.type)
                      for f in CHANGE_SCHEMA})
        )

    lake_dir = str(tmp_path / "tt")
    lake = CDCLake(lake_dir, num_partitions=2)
    e1 = lake.apply_changes(changes(1, "a"), quarantine=False).epoch
    e2 = lake.apply_changes(changes(2, "b"), quarantine=False).epoch

    lin = lake.lineage.read_all()
    end = (lin["end_ts"].to_numpy(zero_copy_only=False)
           .astype("datetime64[us]").astype(np.int64))
    ep = lin["epoch"].to_numpy(zero_copy_only=False).astype(np.int64)
    c2 = int(end[ep == e2].max())

    out = _run("status", "--lake", lake_dir, "--as-of", str(c2 - 1))
    res = json.loads(out.stdout)
    assert res["epoch"] == e1 and res["total_rows"] == 1

    out2 = _run("status", "--lake", lake_dir, "--as-of", str(c2))
    assert json.loads(out2.stdout)["epoch"] == e2

    bad = _run("status", "--lake", lake_dir, "--as-of", "1", check=False)
    assert bad.returncode != 0


def test_cli_diff_debezium_format(ray_session, tmp_path):
    """diff --format debezium emits parseable Debezium envelopes that the
    engine's own reader accepts back (CLI → sources round trip)."""
    import pyarrow as pa
    import ray.data

    from data_exchange_routing_ray.pipelines.cdc import CDCLake
    from data_exchange_routing_ray.schemas import CHANGE_SCHEMA
    from data_exchange_routing_ray.sources import parse_debezium_lines

    def changes(rows):
        cols = {f.name: [] for f in CHANGE_SCHEMA}
        for r in rows:
            for f in CHANGE_SCHEMA:
                cols[f.name].append(r.get(f.name))
        return ray.data.from_arrow(
            pa.table({k: pa.array(v, CHANGE_SCHEMA.field(k).type)
                      for k, v in cols.items()})
        )

    def row(seq, op, conv, turn, text=None):
        return {"seq": seq, "op": op, "conv_id": conv, "turn_idx": turn,
                "role": "user", "text": text, "tool": None,
                "ts": 1_700_000_000_000_000 + seq}

    lake_dir = str(tmp_path / "dbz")
    lake = CDCLake(lake_dir, num_partitions=4)
    r1 = lake.apply_changes(
        changes([row(1, "insert", "conv-a", 0, "a"),
                 row(2, "insert", "conv-b", 0, "b")]), quarantine=False)
    r2 = lake.apply_changes(
        changes([row(3, "delete", "conv-a", 0),
                 row(4, "update", "conv-b", 0, "b2")]), quarantine=False)

    out = _run("diff", "--lake", lake_dir, "--from-epoch", str(r1.epoch),
               "--to-epoch", str(r2.epoch), "--format", "debezium")
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == 2
    parsed = parse_debezium_lines(pa.table({"text": pa.array(lines)}))
    assert parsed["error"].null_count == 2
    got = dict(zip(parsed["conv_id"].to_pylist(), parsed["op"].to_pylist()))
    assert got == {"conv-a": "delete", "conv-b": "update"}


def test_cli_offsets(ray_session, tmp_path):
    """offsets subcommand reports each consumer group's committed epoch
    and its lag behind the lake head."""
    import pyarrow as pa
    import ray.data

    from data_exchange_routing_ray.pipelines.cdc import CDCLake
    from data_exchange_routing_ray.schemas import CHANGE_SCHEMA

    rows = [{"seq": 1, "op": "insert", "conv_id": "conv-1", "turn_idx": 0,
             "role": "user", "text": "a", "tool": None, "ts": 1_000_000}]
    cols = {f.name: pa.array([r[f.name] for r in rows], f.type)
            for f in CHANGE_SCHEMA}
    lake_dir = str(tmp_path / "off")
    lake = CDCLake(lake_dir, num_partitions=2)
    lake.apply_changes(ray.data.from_arrow(pa.table(cols)), quarantine=False)
    _, head, _ = lake.poll_changefeed("viewer")
    lake.consumers.commit("viewer", head, expect=None)

    out = _run("offsets", "--lake", lake_dir)
    res = json.loads(out.stdout)
    assert res["head_epoch"] == head
    assert res["groups"] == {"viewer": {"epoch": head, "lag": 0}}


def test_cli_alter(ray_session, tmp_path):
    from data_exchange_routing_ray.synth import make_change_stream, write_change_stream

    ch = make_change_stream(num_convs=20, max_turns=4, seed=91)
    write_change_stream(ch, str(tmp_path / "stream"), num_files=1)
    lake = str(tmp_path / "lake")
    _run("replay", "--lake", lake, "--stream", str(tmp_path / "stream"),
         "--num-partitions", "4", "--num-cpus", "4")

    out = _run("alter", "rename", "--lake", lake, "--column", "tool",
               "--to", "tool_name")
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["column_renames"] == {"tool": "tool_name"}

    out = _run("alter", "drop", "--lake", lake, "--column", "role")
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["column_drops"] == ["role"]

    # guard: key column refuses with exit code 3
    out = _run("alter", "rename", "--lake", lake, "--column", "conv_id",
               "--to", "cid", check=False)
    assert out.returncode == 3

    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    t = CDCLake(lake).final_table()
    assert "tool_name" in t.column_names and "role" not in t.column_names


def test_cli_backup(ray_session, tmp_path):
    from data_exchange_routing_ray.synth import make_change_stream, write_change_stream

    ch = make_change_stream(num_convs=20, max_turns=4, seed=51)
    write_change_stream(ch, str(tmp_path / "stream"), num_files=1)
    lake = str(tmp_path / "lake")
    _run("replay", "--lake", lake, "--stream", str(tmp_path / "stream"),
         "--num-partitions", "4", "--num-cpus", "4")

    bak = str(tmp_path / "bak")
    out = _run("backup", "--lake", lake, "--dest", bak)
    info = json.loads(out.stdout.strip().splitlines()[-1])
    assert info["dest"] == bak and info["data_files"] > 0

    # the backup answers status like any lake, at the captured epoch
    st = json.loads(_run("status", "--lake", bak).stdout)
    assert st["epoch"] == info["epoch"]

    # refuses to overwrite an existing backup
    out = _run("backup", "--lake", lake, "--dest", bak, check=False)
    assert out.returncode == 3 and "already holds a lake" in out.stderr


def test_cli_fsck(ray_session, tmp_path):
    from data_exchange_routing_ray.synth import make_change_stream, write_change_stream

    ch = make_change_stream(num_convs=15, max_turns=4, seed=61)
    write_change_stream(ch, str(tmp_path / "stream"), num_files=1)
    lake = str(tmp_path / "lake")
    _run("replay", "--lake", lake, "--stream", str(tmp_path / "stream"),
         "--num-partitions", "4", "--num-cpus", "4")
    rep = json.loads(_run("fsck", "--lake", lake, "--deep").stdout)
    assert rep["ok"] and rep["files"] > 0

    # break it: exit code 4 + the finding in the report
    from data_exchange_routing_ray.pipelines.cdc import CDCLake

    entry = next(iter(CDCLake(lake).manifest.partitions.values()))
    os.remove(os.path.join(lake, entry.file))
    out = _run("fsck", "--lake", lake, check=False)
    assert out.returncode == 4
    assert "missing file" in out.stdout
