"""`cli health` / lake_health: the cheap servability probe
(HealthCheckFunction.kt:7 analog). Healthy lake → ok + exit 0; each
injected damage class (corrupt manifest root, fence regression in a
partition entry, corrupt lineage tail) flips ok → False with a named
check and exit 5 — without touching any data file."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args):
    return subprocess.run(
        [sys.executable, "-m", "data_exchange_routing_ray.cli", *args],
        capture_output=True, text=True, cwd=REPO,
    )


def _mk_lake(tmp_path, ray_session):
    import ray.data

    from data_exchange_routing_ray.pipelines.cdc import CDCLake
    from data_exchange_routing_ray.synth import make_change_stream

    ch = make_change_stream(num_convs=20, max_turns=4, malformed_frac=0.0, seed=7)
    lake = CDCLake(str(tmp_path / "lake"), num_partitions=4)
    half = ch.num_rows // 2
    lake.apply_changes(ray.data.from_arrow(ch.slice(0, half)), quarantine=False)
    lake.apply_changes(ray.data.from_arrow(ch.slice(half)), quarantine=False)
    lake.close()
    return str(tmp_path / "lake")


def test_health_ok_and_damage_cases(ray_session, tmp_path):
    from data_exchange_routing_ray.pipelines.cdc import lake_health

    lake = _mk_lake(tmp_path, ray_session)

    rep = lake_health(lake)
    assert rep["ok"], rep
    assert rep["checks"] == {
        "manifest": "ok", "fence": "ok", "archive": "ok", "lineage": "ok"
    }
    assert rep["epoch"] == 1 and rep["applied_offset"] >= 0

    out = _run("health", "--lake", lake)
    assert out.returncode == 0
    assert json.loads(out.stdout)["ok"] is True

    # --- damage 1: fence regression (partition entry above global fence)
    cur = os.path.join(lake, "manifests", "current.json")
    orig = open(cur).read()
    d = json.loads(orig)
    pid = next(iter(d["partitions"]))
    d["partitions"][pid]["applied_offset"] = d["applied_offset"] + 1000
    open(cur, "w").write(json.dumps(d))
    rep = lake_health(lake)
    assert not rep["ok"] and rep["checks"]["fence"] == "violated"
    assert _run("health", "--lake", lake).returncode == 5
    open(cur, "w").write(orig)

    # --- damage 2: corrupt manifest root
    open(cur, "w").write(orig[: len(orig) // 2])
    rep = lake_health(lake)
    assert not rep["ok"] and rep["checks"]["manifest"] == "damaged"
    assert _run("health", "--lake", lake).returncode == 5
    open(cur, "w").write(orig)

    # --- damage 3: corrupt lineage tail
    lin_dir = os.path.join(lake, "lineage")
    tail = sorted(os.listdir(lin_dir))[-1]
    tail_path = os.path.join(lin_dir, tail)
    blob = open(tail_path, "rb").read()
    open(tail_path, "wb").write(blob[: len(blob) // 2])
    rep = lake_health(lake)
    assert not rep["ok"] and rep["checks"]["lineage"] == "damaged"
    assert _run("health", "--lake", lake).returncode == 5
    open(tail_path, "wb").write(blob)

    # restored → healthy again
    assert lake_health(lake)["ok"]

    # --- absent lake dir: exit 2, ok False
    out = _run("health", "--lake", str(tmp_path / "nope"))
    assert out.returncode == 2
    assert json.loads(out.stdout)["ok"] is False


def test_health_missing_archive(ray_session, tmp_path):
    from data_exchange_routing_ray.pipelines.cdc import lake_health

    lake = _mk_lake(tmp_path, ray_session)
    man_dir = os.path.join(lake, "manifests")
    arch = [f for f in os.listdir(man_dir) if f.startswith("manifest-")]
    # remove the archived manifest of the CURRENT epoch
    victim = sorted(arch)[-1]
    os.remove(os.path.join(man_dir, victim))
    rep = lake_health(lake)
    assert not rep["ok"] and rep["checks"]["archive"] == "missing"
