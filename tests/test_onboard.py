"""`cli onboard` — onboarding-tool parity (the reference's
tools/onboarding/loadHL7Routes.py:25-51 scripted Cosmos upsert of 1
ingress + 6 hl7_out_* routes per stream): generated configs are
schema-validated, idempotent under re-onboarding, upsert by route id,
and round-trip through the real router (make_router 1→N expansion)."""

import json
import os
import subprocess
import sys

import pyarrow as pa
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args):
    return subprocess.run(
        [sys.executable, "-m", "data_exchange_routing_ray.cli", *args],
        capture_output=True, text=True, cwd=REPO,
    )


def test_onboard_generates_validates_and_routes(tmp_path):
    out = str(tmp_path / "routes.json")
    r = _run("onboard", "--stream-id", "celr", "--route", "hl7v2",
             "--ingress-dest", "hl7acct/hl7ingress",
             "--program-dest", "progacct/celr-container", "--out", out)
    assert r.returncode == 0, r.stderr
    summary = json.loads(r.stdout)
    assert summary["routes_total"] == 7  # 1 ingress + 6 hl7 outputs

    cfg = json.load(open(out))
    ids = [x["id"] for x in cfg["routes"]]
    assert ids[0] == "celr-hl7v2"
    assert sorted(ids[1:]) == sorted(
        f"celr-hl7_out_{i}" for i in
        ["recdeb", "redacted", "validation_report", "json", "lake_seg", "binary"]
    )
    # date-partition templates on the output folders (Common.kt:231-250)
    assert all(
        x["partition_folder"] == f"hl7_out_{x['id'].split('hl7_out_')[1]}/:y/:m/:d/"
        for x in cfg["routes"][1:]
    )

    # idempotent: same command → same file content
    before = open(out).read()
    r = _run("onboard", "--stream-id", "celr", "--route", "hl7v2",
             "--ingress-dest", "hl7acct/hl7ingress",
             "--program-dest", "progacct/celr-container", "--out", out)
    assert r.returncode == 0
    assert open(out).read() == before
    assert json.loads(r.stdout)["routes_total"] == 7

    # upsert: a second stream merges in (non-hl7 → single ingress route)
    r = _run("onboard", "--stream-id", "covid", "--route", "csv",
             "--ingress-dest", "csvacct/ingress",
             "--program-dest", "progacct/covid", "--out", out)
    assert json.loads(r.stdout)["routes_total"] == 8
    cfg = json.load(open(out))
    assert "covid-csv" in [x["id"] for x in cfg["routes"]]


def test_onboarded_config_roundtrips_through_router(ray_session, tmp_path):
    from data_exchange_routing_ray.stages.route import (
        make_router,
        onboard_routes,
        split_routed,
    )

    cfg = onboard_routes(
        "celr", "hl7v2", "hl7acct/hl7ingress", "progacct/celr"
    )
    router = make_router(cfg, enrich=False)
    batch = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "data_stream_id": pa.array(["celr", "celr", "nope"]),
            "data_stream_route": pa.array(
                ["hl7v2", "hl7_out_json", "hl7v2"]
            ),
        }
    )
    routed = router(batch)
    ok, bad = split_routed(routed)
    got = {
        (r["event_id"], r["route_id"], r["destination"])
        for r in ok.to_pylist()
    }
    assert got == {
        (1, "celr-hl7v2", "hl7acct/hl7ingress"),
        (2, "celr-hl7_out_json", "progacct/celr"),
    }
    assert bad.num_rows == 1  # unknown stream dead-letters


def test_onboard_validation_rejects_bad_input(tmp_path):
    from data_exchange_routing_ray.stages.route import (
        onboard_routes,
        validate_route_config,
    )

    with pytest.raises(ValueError, match="destination"):
        onboard_routes("s1", "csv", "", "prog/c")
    with pytest.raises(ValueError, match="data_stream_id"):
        onboard_routes("", "csv", "a/b", "prog/c")
    # uniqueItems enforced through the same validator
    cfg = onboard_routes("s1", "csv", "a/b", "prog/c")
    cfg["routes"].append(dict(cfg["routes"][0]))
    with pytest.raises(ValueError, match="unique"):
        validate_route_config(cfg)

    # CLI surfaces validation as exit 3
    out = str(tmp_path / "r.json")
    r = _run("onboard", "--stream-id", "", "--route", "csv",
             "--ingress-dest", "a/b", "--program-dest", "p/c", "--out", out)
    assert r.returncode == 3
    assert not os.path.exists(out)
