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

    # error paths: exit 2, no side effects
    bad = _run("status", "--lake", str(tmp_path / "nope"), check=False)
    assert bad.returncode == 2
    assert not (tmp_path / "nope").exists()
