"""Routing, partition-template, and record-splitter operator tests
(mirrors the reference's operator unit matrix, SURVEY.md §5)."""

import io
import zipfile

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from data_exchange_routing_ray.stages.debatch import (
    ERR_BAD_ARCHIVE,
    ERR_BAD_JSON,
    ERR_EMPTY_ARCHIVE,
    debatch_json_array,
    explode_archive,
)
from data_exchange_routing_ray.stages.route import (
    ERR_NO_ROUTE,
    folders_to_path,
    load_route_config,
    make_router,
    split_routed,
)

CONFIG = {
    "routes": [
        {
            "id": "transcripts-main",
            "match": {"data_stream_id": "transcripts", "data_stream_route": "main"},
            "destination": "lake/transcripts",
            "partition_folder": ":y/:m/:d",
            "metadata": {"reporting_jurisdiction": "unknown"},
        },
        {
            "id": "transcripts-audit",
            "match": {"data_stream_id": "transcripts", "data_stream_route": "main"},
            "destination": "lake/audit",
            "partition_folder": "",
            "metadata": {"tier": "audit"},
        },
        {
            "id": "events-only",
            "match": {"data_stream_id": "events", "data_stream_route": "raw"},
            "destination": "lake/events",
            "partition_folder": ":y/:m",
            "metadata": {},
        },
    ]
}


def _batch():
    return pa.table(
        {
            "seq": pa.array([1, 2, 3], pa.int64()),
            "conv_id": ["c1", "c2", "c3"],
            "turn_idx": pa.array([0, 0, 0], pa.int32()),
            "ts": pa.array(
                [1735689600000000, 1738368000000000, 1740787200000000],
                pa.timestamp("us"),
            ),  # 2025-01-01, 2025-02-01, 2025-03-01
            "data_stream_id": ["transcripts", "events", "nope"],
            "data_stream_route": ["main", "raw", "x"],
        }
    )


def test_route_expansion_and_quarantine():
    routed = make_router(CONFIG)(_batch())
    ok, bad = split_routed(routed)
    # c1 matches two destinations (1→N expansion), c2 one, c3 none
    assert ok.num_rows == 3
    assert bad.num_rows == 1
    assert bad["error"][0].as_py() == ERR_NO_ROUTE + "nope-x"
    dests = sorted(ok["destination"].to_pylist())
    assert dests == ["lake/audit", "lake/events", "lake/transcripts"]
    # metadata overlay columns appear with per-route values
    row = {
        d: j
        for d, j in zip(ok["destination"].to_pylist(), ok["reporting_jurisdiction"].to_pylist())
    }
    assert row["lake/transcripts"] == "unknown"
    assert row["lake/audit"] is None


def test_credential_indirection_and_missing_cred():
    """Routes reference credentials by NAME (StorageAccountConfig parity,
    Common.kt:103-108): resolved routes carry only credential_ref (the
    secret never enters the data plane); a route naming an unknown
    credential dead-letters its rows with the exact error string
    (RouteIngestedFile.kt:154-175)."""
    import copy

    from data_exchange_routing_ray.stages.route import ERR_NO_CREDENTIAL

    cfg = copy.deepcopy(CONFIG)
    cfg["credentials"] = {"hot-sas": {"kind": "sas", "account": "hot"}}
    for r in cfg["routes"]:
        r["credential"] = "hot-sas"
    cfg["routes"][-1]["credential"] = "missing-cred"  # not in the map
    routed = make_router(cfg)(_batch())
    ok, bad = split_routed(routed)
    refs = set(ok["credential_ref"].to_pylist())
    assert refs == {"hot-sas"}
    # the secret payload itself must not appear in any output column
    assert "credential" not in routed.column_names
    assert not any("account" in c for c in routed.column_names)
    errs = set(bad["error"].to_pylist())
    assert ERR_NO_CREDENTIAL + "missing-cred" in errs
    # a config with every credential resolved dead-letters nothing extra
    cfg2 = copy.deepcopy(cfg)
    cfg2["credentials"]["missing-cred"] = {"kind": "sas", "account": "x"}
    ok2, bad2 = split_routed(make_router(cfg2)(_batch()))
    assert bad2.num_rows == 1  # only the genuinely unroutable row remains


def test_partition_folder_template():
    routed = make_router(CONFIG)(_batch())
    ok, _ = split_routed(routed)
    paths = dict(zip(ok["destination"].to_pylist(), ok["dest_path"].to_pylist()))
    assert paths["lake/transcripts"] == "lake/transcripts/2025/01/01"
    assert paths["lake/events"] == "lake/events/2025/02"
    assert paths["lake/audit"] == "lake/audit"  # empty template


def test_folders_to_path_tokens():
    ts = pa.array([1735693500000000], pa.timestamp("us"))  # 2025-01-01 01:05:00
    out = folders_to_path(ts, ":y/:m/:d/:h/:mm")
    assert out.to_pylist() == ["2025/01/01/01/05"]
    fn = pa.array(["f.csv"], pa.string())
    out2 = folders_to_path(ts, ":f/:y", filename=fn)
    assert out2.to_pylist() == ["f.csv/2025"]


def test_legacy_alias_resolution():
    batch = pa.table(
        {
            "seq": pa.array([1], pa.int64()),
            "conv_id": ["c1"],
            "turn_idx": pa.array([0], pa.int32()),
            "ts": pa.array([1735689600000000], pa.timestamp("us")),
            "meta_destination_id": ["transcripts"],
            "meta_ext_event": ["main"],
        }
    )
    routed = make_router(CONFIG)(batch)
    ok, bad = split_routed(routed)
    assert ok.num_rows == 2 and bad.num_rows == 0


def test_enrichment_deterministic():
    routed = make_router(CONFIG)(_batch())
    ok, _ = split_routed(routed)
    assert set(ok["system_provider"].to_pylist()) == {"DEX-ROUTING-RAY"}
    again, _ = split_routed(make_router(CONFIG)(_batch()))
    assert ok["upload_id"].to_pylist() == again["upload_id"].to_pylist()


def test_unique_route_ids_enforced():
    bad = {"routes": [{"id": "a", "destination": "x"}, {"id": "a", "destination": "y"}]}
    with pytest.raises(ValueError):
        load_route_config(bad)


# ---------------------------------------------------------------- debatchers

def test_parse_event_urls():
    from data_exchange_routing_ray.stages.route import parse_event_urls

    t = pa.table(
        {
            "url": pa.array(
                [
                    "https://myacct.blob.core.windows.net/ingest/a/b/file.csv",
                    "https://x.example.com/cont/top.json",
                    "s3://bucket/k.txt",
                ]
            )
        }
    )
    out = parse_event_urls(t)
    assert out["storage_account"].to_pylist() == ["myacct", "x", "bucket"]
    assert out["container"].to_pylist() == ["ingest", "cont", "k.txt"]
    assert out["folder_path"].to_pylist() == ["a/b", "", ""]
    assert out["file_name"].to_pylist() == ["file.csv", "top.json", ""]


def test_default_route_fallback():
    from data_exchange_routing_ray.stages.route import make_router, split_routed

    cfg = {
        "routes": [
            {
                "id": "r1",
                "match": {"data_stream_id": "a", "data_stream_route": "m"},
                "destination": "d1",
                "metadata": {},
            }
        ],
        "default_route": {"id": "misc", "destination": "d-misc"},
    }
    t = pa.table(
        {
            "data_stream_id": pa.array(["a", "zzz"]),
            "data_stream_route": pa.array(["m", "???"]),
        }
    )
    routed = make_router(cfg, enrich=False)(t)
    ok, bad = split_routed(routed)
    assert bad.num_rows == 0  # nothing dead-letters with a default route
    assert sorted(ok["destination"].to_pylist()) == ["d-misc", "d1"]


def test_config_hot_reload_between_epochs():
    """S14 config hot-reload: routing config is a broadcast dict rebuilt per
    epoch — swapping it between two runs changes routing without restart."""
    from data_exchange_routing_ray.stages.route import make_router, split_routed

    t = pa.table(
        {
            "data_stream_id": pa.array(["a"]),
            "data_stream_route": pa.array(["m"]),
        }
    )
    cfg_v1 = {"routes": [{"id": "r1", "match": {"data_stream_id": "a", "data_stream_route": "m"}, "destination": "d-old", "metadata": {}}]}
    cfg_v2 = {"routes": [{"id": "r1", "match": {"data_stream_id": "a", "data_stream_route": "m"}, "destination": "d-new", "metadata": {}}]}
    ok1, _ = split_routed(make_router(cfg_v1, enrich=False)(t))
    ok2, _ = split_routed(make_router(cfg_v2, enrich=False)(t))
    assert ok1["destination"].to_pylist() == ["d-old"]
    assert ok2["destination"].to_pylist() == ["d-new"]


def test_html_encode():
    from data_exchange_routing_ray.functions.text import html_encode_column

    t = pa.table({"x": pa.array(['<b>&"hi"\'</b>'])})
    out = html_encode_column(t, "x")
    assert out["x"].to_pylist() == ["&lt;b&gt;&amp;&quot;hi&quot;&#39;&lt;/b&gt;"]


def test_debatch_json_array():
    batch = pa.table(
        {
            "conv_id": ["c1", "c2", "c3"],
            "text": ['["m0", "m1", "m2"]', '["solo"]', "not-json"],
        }
    )
    out = debatch_json_array(batch)
    ok = out.filter(pc.is_null(out["error"]))
    bad = out.filter(pc.is_valid(out["error"]))
    assert ok.num_rows == 4
    assert bad.num_rows == 1 and bad["error"][0].as_py() == ERR_BAD_JSON
    c1 = ok.filter(pc.equal(ok["conv_id"], pa.scalar("c1")))
    assert c1["msg_idx"].to_pylist() == [0, 1, 2]
    assert c1["text"].to_pylist() == ["m0", "m1", "m2"]


def _zip_bytes(entries: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in entries.items():
            zf.writestr(name, data)
    return buf.getvalue()


def test_explode_archive_matrix():
    nested = _zip_bytes({"inner.csv": b"x,y\n7,8"})
    outer = _zip_bytes(
        {"a.csv": b"a,b\n1,2", "sub/b.csv": b"c\n3", "deep.zip": nested}
    )
    batch = pa.table(
        {
            "file_name": ["t.zip", "plain.csv", "empty.zip", "corrupt.zip"],
            "payload": pa.array(
                [outer, b"p,q\n5,6", _zip_bytes({}), b"THIS IS NOT A ZIP"],
                pa.binary(),
            ),
        }
    )
    out = explode_archive(batch)
    ok = out.filter(pc.is_null(out["error"]))
    bad = out.filter(pc.is_valid(out["error"]))
    names = sorted(ok["file_name"].to_pylist())
    # recursive extraction incl. nested zip + subdir, plus passthrough csv
    assert names == [
        "plain.csv",
        "t.zip/a.csv",
        "t.zip/deep.zip/inner.csv",
        "t.zip/sub/b.csv",
    ]
    errs = dict(zip(bad["file_name"].to_pylist(), bad["error"].to_pylist()))
    assert errs == {"empty.zip": ERR_EMPTY_ARCHIVE, "corrupt.zip": ERR_BAD_ARCHIVE}
    got = dict(zip(ok["file_name"].to_pylist(), ok["payload"].to_pylist()))
    assert got["t.zip/deep.zip/inner.csv"] == b"x,y\n7,8"


def test_default_route_metadata_type_mismatch_converges_to_string():
    """An int metadata value on the default route must not crash the
    Arrow-native expansion when the routes side inferred string — both
    sides converge to string at stage build."""
    from data_exchange_routing_ray.stages.route import make_router, split_routed

    cfg = {
        "routes": [
            {
                "id": "r1",
                "match": {"data_stream_id": "a", "data_stream_route": "m"},
                "destination": "d1",
                "metadata": {"mk": "strval"},
            }
        ],
        "default_route": {
            "id": "misc",
            "destination": "d-misc",
            "metadata": {"mk": 7},
        },
    }
    t = pa.table(
        {
            "data_stream_id": pa.array(["a", "zzz"]),
            "data_stream_route": pa.array(["m", "???"]),
        }
    )
    routed = make_router(cfg, enrich=False)(t)
    ok, bad = split_routed(routed)
    assert bad.num_rows == 0
    by_dest = dict(zip(ok["destination"].to_pylist(), ok["mk"].to_pylist()))
    assert by_dest == {"d1": "strval", "d-misc": "7"}


def test_router_handles_empty_batch():
    from data_exchange_routing_ray.stages.route import make_router

    cfg = {"routes": [{"id": "r1", "match": {"data_stream_id": "a", "data_stream_route": "m"}, "destination": "d1", "metadata": {}}]}
    t = pa.table(
        {
            "data_stream_id": pa.array([], pa.string()),
            "data_stream_route": pa.array([], pa.string()),
        }
    )
    out = make_router(cfg, enrich=False)(t)
    assert out.num_rows == 0
    assert "route_id" in out.column_names and "error" in out.column_names
