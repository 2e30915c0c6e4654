"""Config-driven routing: broadcast lookup, 1→N expansion, enrichment.

Re-expresses the reference's routing core as vectorized batch transforms:

- route-config lookup keyed by ``(data_stream_id, data_stream_route)`` with
  miss → dead-letter (inner join + anti-join spill to quarantine;
  ``RouteIngestedFile.kt:150-184, 452-462``)
- 1→N route expansion: one event × config.routes[] → one output row per
  destination (``RouteIngestedFile.kt:193, 272``)
- per-route static metadata overlay (config-driven column overlay,
  ``RouteIngestedFile.kt:196-209``)
- enrichment: ``system_provider``, deterministic ``upload_id``, ingest
  timestamp (``RouteIngestedFile.kt:196-209``, ``:138-140``)
- ``folders_to_path`` date-partition template expansion — tokens
  ``:f :y :m :d :h :mm`` (``Common.kt:231-250``;
  ``fn-ingestion-router/README.md:17-33``)

The route config is SMALL (a dimension): it rides in the task closure /
actor constructor — the broadcast-small-side join pattern — never a shuffle.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from data_exchange_routing_ray.hashing import stable_hash_strings

ERR_NO_ROUTE = "No routing configuration found for "
ERR_NO_CREDENTIAL = "No credential configuration found for "

STREAM_ID_COLUMN = "data_stream_id"
STREAM_ROUTE_COLUMN = "data_stream_route"

# Legacy alias resolution (reference RouteIngestedFile.kt:125-133).
LEGACY_ALIASES = {
    "meta_destination_id": STREAM_ID_COLUMN,
    "meta_ext_event": STREAM_ROUTE_COLUMN,
}


def config_fingerprint(config: dict | str) -> str:
    """Deterministic content-hash of a route-config document (the S14
    config-version stamp, reference FnCacheUpdater.kt:22-52): same config
    content → same version string on every site, independent of key order.
    Pass the result to ``CDCLake.set_config_version`` so each epoch's
    manifest + lineage record which config routed it."""
    import hashlib

    if isinstance(config, str):
        with open(config) as f:
            config = json.load(f)
    canon = json.dumps(config, sort_keys=True, separators=(",", ":"))
    return hashlib.sha256(canon.encode()).hexdigest()[:12]


def load_route_config(config: dict | str) -> pd.DataFrame:
    """Normalize a route-config document into a flat lookup DataFrame.

    One row per (data_stream_id, data_stream_route, destination). Validates
    unique route ids (route-config-schema.json demands uniqueItems).
    """
    if isinstance(config, str):
        with open(config) as f:
            config = json.load(f)
    rows = []
    for route in config["routes"]:
        match = route.get("match", {})
        rows.append(
            {
                STREAM_ID_COLUMN: match.get(STREAM_ID_COLUMN, ""),
                STREAM_ROUTE_COLUMN: match.get(STREAM_ROUTE_COLUMN, ""),
                "route_id": route["id"],
                "destination": route["destination"],
                "partition_folder": route.get("partition_folder", ""),
                "credential": route.get("credential", ""),
                "route_metadata": json.dumps(route.get("metadata", {}), sort_keys=True),
            }
        )
    df = pd.DataFrame(rows)
    if df["route_id"].duplicated().any():
        raise ValueError("route ids must be unique (uniqueItems)")
    return df


def parse_event_urls(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Vectorized event-URL parser (M1, ``parseMessage`` Common.kt:211-229):
    derive ``storage_account`` (host prefix before the first '.'),
    ``container`` (first path segment), ``file_name`` (last segment) and
    ``folder_path`` (segments between) — all pyarrow.compute kernels."""
    url = pc.cast(batch[url_col], pa.string())
    # strip scheme
    rest = pc.replace_substring_regex(url, pattern=r"^[a-z][a-z0-9+.-]*://", replacement="")
    host = pc.replace_substring_regex(rest, pattern=r"/.*$", replacement="")
    account = pc.replace_substring_regex(host, pattern=r"\..*$", replacement="")
    path = pc.replace_substring_regex(rest, pattern=r"^[^/]*/?", replacement="")
    container = pc.replace_substring_regex(path, pattern=r"/.*$", replacement="")
    after = pc.replace_substring_regex(path, pattern=r"^[^/]*/?", replacement="")
    file_name = pc.replace_substring_regex(after, pattern=r"^.*/", replacement="")
    folder = pc.replace_substring_regex(after, pattern=r"/?[^/]*$", replacement="")
    for name, col in (
        ("storage_account", account),
        ("container", container),
        ("folder_path", folder),
        ("file_name", file_name),
    ):
        if name in batch.column_names:
            batch = batch.drop_columns([name])
        batch = batch.append_column(name, col)
    return batch


def resolve_stream_columns(batch: pa.Table) -> pa.Table:
    """Resolve legacy alias columns into the canonical stream id/route pair."""
    for legacy, canonical in LEGACY_ALIASES.items():
        if legacy in batch.column_names:
            if canonical in batch.column_names:
                merged = pc.coalesce(batch[canonical], batch[legacy])
                batch = batch.set_column(
                    batch.schema.get_field_index(canonical),
                    pa.field(canonical, pa.string()),
                    merged.cast(pa.string()),
                )
            else:
                batch = batch.append_column(
                    canonical, batch[legacy].cast(pa.string())
                )
            batch = batch.drop_columns([legacy])
    return batch


def folders_to_path(
    ts: pa.ChunkedArray | pa.Array,
    template: str,
    filename: pa.ChunkedArray | pa.Array | None = None,
) -> pa.Array:
    """Expand a destination-folder template per row (Common.kt:231-250).

    Tokens: ``:y`` year, ``:m`` month, ``:d`` day, ``:h`` hour, ``:mm``
    minute, ``:f`` the per-row filename. Empty segments are dropped.
    """
    segments = []
    for seg in template.split("/"):
        if not seg:
            continue
        if seg == ":f":
            if filename is None:
                continue
            segments.append(pc.cast(filename, pa.string()))
        else:
            fmt = (
                seg.replace(":mm", "%M")
                .replace(":y", "%Y")
                .replace(":m", "%m")
                .replace(":d", "%d")
                .replace(":h", "%H")
            )
            segments.append(pc.strftime(ts, format=fmt))
    if not segments:
        return pa.nulls(len(ts), pa.string())
    return pc.binary_join_element_wise(*segments, "/")


def deterministic_upload_id(batch: pa.Table) -> pa.Array:
    """Stable per-event upload id (reference defaults to random UUID,
    RouteIngestedFile.kt:140; ours is deterministic for replay-idempotence)."""
    key = pc.binary_join_element_wise(
        pc.cast(batch["conv_id"], pa.string()),
        pc.cast(batch["turn_idx"], pa.string()),
        pc.cast(batch["seq"], pa.string()) if "seq" in batch.column_names
        else pa.array([""] * batch.num_rows),
        "-",
    )
    h = stable_hash_strings(key)
    return pa.array([f"up-{v:016x}" for v in h], pa.string())


def make_router(
    config: dict | str | pd.DataFrame,
    expand_metadata: bool = True,
    enrich: bool = True,
    credentials: dict | None = None,
):
    """Build the routing ``map_batches`` callable.

    Output = matched rows × their destinations (columns ``route_id``,
    ``destination``, ``dest_path``, ``credential_ref`` and metadata-overlay
    columns) plus unmatched rows annotated with an ``error`` column for
    quarantine.

    Credential indirection (J2 full parity — StorageAccountConfig,
    ``Common.kt:103-108``): a route may declare ``credential: <name>``
    referencing the config's top-level ``credentials`` map (or the
    ``credentials`` argument). Resolution happens at STAGE BUILD; routed
    rows carry only the reference name (``credential_ref``) — secrets never
    enter the data plane. A route naming an unknown credential dead-letters
    its rows with an exact error (the reference's missing-storage-account
    path, ``RouteIngestedFile.kt:154-175``).
    """
    default_route = None
    if isinstance(config, dict) and config.get("default_route"):
        # J4 default-route left join (RouteIngestedFile.cs:39-45, the
        # FileType=="?" misc route): unmatched events fall back to this
        # destination instead of dead-lettering
        default_route = config["default_route"]
    if credentials is None:
        credentials = config.get("credentials", {}) if isinstance(config, dict) else {}
    routes = config if isinstance(config, pd.DataFrame) else load_route_config(config)
    if "credential" not in routes.columns:
        routes = routes.assign(credential="")
    meta_cols: dict[str, dict[str, str]] = {
        r.route_id: json.loads(r.route_metadata) for r in routes.itertuples()
    }
    all_meta_keys = sorted({k for m in meta_cols.values() for k in m})
    cred_of_route = dict(zip(routes["route_id"], routes["credential"]))
    # resolved at build time, never per batch (lazy-singleton parity, T2)
    unresolved = {
        rid: name
        for rid, name in cred_of_route.items()
        if name and name not in credentials
    }

    # ---- build-time flattening for the Arrow-native 1→N expansion ----
    # Routes sorted by (stream_id, route, route_id) so each (sid, rt) match
    # group is a CONTIGUOUS run ordered by route_id (the old within-row
    # tie-break). Per batch the expansion is then index_in → np.repeat →
    # take: zero pandas, zero per-row Python. Keys are length-prefixed
    # (len(sid), sid, rt joined by \x1f) so (sid, rt) pairs can't collide.
    rs = routes.sort_values(
        [STREAM_ID_COLUMN, STREAM_ROUTE_COLUMN, "route_id"], kind="stable"
    ).reset_index(drop=True)
    _bsid = rs[STREAM_ID_COLUMN].fillna("").astype(str).to_numpy(dtype=object)
    _brt = rs[STREAM_ROUTE_COLUMN].fillna("").astype(str).to_numpy(dtype=object)
    _kb = np.array(
        [f"{len(s)}\x1f{s}\x1f{r}" for s, r in zip(_bsid, _brt)], dtype=object
    )
    if len(_kb):
        _change = np.flatnonzero(np.r_[True, _kb[1:] != _kb[:-1]])
        group_starts = _change.astype(np.int64)
        group_counts = np.diff(np.r_[_change, len(_kb)]).astype(np.int64)
        key_set = pa.array(_kb[group_starts].tolist(), pa.string())
    else:
        group_starts = np.array([], np.int64)
        group_counts = np.array([], np.int64)
        key_set = pa.array([], pa.string())
    _rids = rs["route_id"].tolist()
    flat_vals: dict[str, list] = {
        "route_id": _rids,
        "destination": rs["destination"].tolist(),
        "partition_folder": rs["partition_folder"].tolist(),
        "error": [
            ERR_NO_CREDENTIAL + unresolved[rid] if rid in unresolved else None
            for rid in _rids
        ],
        "credential_ref": [
            None if rid in unresolved else (cred_of_route.get(rid) or None)
            for rid in _rids
        ],
    }
    if expand_metadata:
        for k in all_meta_keys:
            flat_vals[k] = [meta_cols.get(rid, {}).get(k) for rid in _rids]
    flat_pa: dict[str, pa.Array] = {}
    for c, vals in flat_vals.items():
        arr = pa.array(vals)
        if pa.types.is_null(arr.type):
            arr = arr.cast(pa.string())
        flat_pa[c] = arr
    miss_scalar: dict[str, pa.Scalar] = {}
    if default_route is not None:
        cred = default_route.get("credential", "")
        bad_cred = bool(cred) and cred not in credentials
        miss_vals: dict[str, object] = {
            "route_id": default_route.get("id", "default"),
            "destination": default_route["destination"],
            "partition_folder": default_route.get("partition_folder", ""),
            "error": ERR_NO_CREDENTIAL + cred if bad_cred else None,
            "credential_ref": None if bad_cred else (cred or None),
        }
        if expand_metadata:
            for k in all_meta_keys:
                miss_vals[k] = default_route.get("metadata", {}).get(k)
        # typed ONCE at build; if the default route's value doesn't fit the
        # type inferred from the routes side (e.g. int metadata vs string
        # routes), both sides converge to string instead of a per-batch
        # ArrowTypeError
        for c, v in miss_vals.items():
            try:
                miss_scalar[c] = pa.scalar(v, flat_pa[c].type)
            except (pa.ArrowTypeError, pa.ArrowInvalid, OverflowError):
                flat_pa[c] = pc.cast(flat_pa[c], pa.string())
                miss_scalar[c] = pa.scalar(
                    None if v is None else str(v), pa.string()
                )

    def route_batch(batch: pa.Table) -> pa.Table:
        batch = resolve_stream_columns(batch)
        n = batch.num_rows
        for c in (STREAM_ID_COLUMN, STREAM_ROUTE_COLUMN):
            if c not in batch.column_names:
                batch = batch.append_column(c, pa.array([""] * n, pa.string()))
        sid = pc.cast(batch[STREAM_ID_COLUMN], pa.string())
        rt = pc.cast(batch[STREAM_ROUTE_COLUMN], pa.string())
        # null sid/rt → null key → miss (the old pandas merge also missed)
        key = pc.binary_join_element_wise(
            pc.cast(pc.utf8_length(sid), pa.string()), sid, rt, "\x1f"
        )
        if len(key_set):
            g = (
                pc.index_in(key, value_set=key_set)
                .combine_chunks()
                .fill_null(-1)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
        else:
            g = np.full(n, -1, np.int64)
        miss = g < 0
        gc = np.where(miss, 0, g)
        counts = (
            np.where(miss, 1, group_counts[gc])
            if len(group_counts)
            else np.ones(n, np.int64)
        )
        row_rep = np.repeat(np.arange(n, dtype=np.int64), counts)
        total = int(counts.sum())
        starts_pr = (
            np.where(miss, np.int64(-1), group_starts[gc])
            if len(group_starts)
            else np.full(n, -1, np.int64)
        )
        rep_starts = np.repeat(starts_pr, counts)
        first_out = np.cumsum(counts) - counts
        within = np.arange(total, dtype=np.int64) - np.repeat(first_out, counts)
        take_idx = rep_starts + within
        miss_exp = rep_starts < 0
        result = batch.take(pa.array(row_rep))
        idx_pa = pa.array(np.where(miss_exp, 0, take_idx), pa.int64(), mask=miss_exp)
        any_miss = bool(miss_exp.any())
        miss_pa = pa.array(miss_exp) if any_miss else None
        if any_miss and default_route is None:
            err_row = pc.binary_join_element_wise(
                pa.array([ERR_NO_ROUTE] * n),
                sid.combine_chunks().fill_null(""),
                pc.binary_join_element_wise(
                    pa.array(["-"] * n), rt.combine_chunks().fill_null(""), ""
                ),
                "",
            )
            err_exp = pc.take(err_row, pa.array(row_rep))
        route_side_cols = ["route_id", "destination", "partition_folder", "error", "credential_ref"]
        if expand_metadata:
            route_side_cols += all_meta_keys
        for c in route_side_cols:
            col = pc.take(flat_pa[c], idx_pa)  # null at missed positions
            if any_miss:
                if default_route is not None:
                    col = pc.if_else(miss_pa, miss_scalar[c], col)
                elif c == "error":
                    col = pc.if_else(miss_pa, err_exp, col)
            if c in result.column_names:
                i = result.schema.get_field_index(c)
                result = result.set_column(i, pa.field(c, col.type), col)
            else:
                result = result.append_column(c, col)

        if enrich:
            result = result.append_column(
                "system_provider",
                pa.array(["DEX-ROUTING-RAY"] * result.num_rows, pa.string()),
            )
            if "conv_id" in result.column_names and "turn_idx" in result.column_names:
                result = result.append_column(
                    "upload_id", deterministic_upload_id(result)
                )
            if "ts" in result.column_names:
                tmpl_per_route = dict(
                    zip(routes["route_id"], routes["partition_folder"])
                )
                # per-route template expansion: group rows by template value
                pf = result["partition_folder"]
                dest = result["destination"]
                paths = np.empty(result.num_rows, dtype=object)
                pf_np = pf.to_numpy(zero_copy_only=False)
                dest_np = dest.to_numpy(zero_copy_only=False)
                ts_col = result["ts"]
                for tmpl in set(x for x in pf_np if x is not None):
                    mask = pf_np == tmpl
                    idx = np.nonzero(mask)[0]
                    sub = ts_col.take(pa.array(idx))
                    expanded = folders_to_path(sub, tmpl).to_numpy(
                        zero_copy_only=False
                    )
                    base = dest_np[idx]
                    joined = [
                        (f"{b}/{e}" if e else str(b)) if b is not None else None
                        for b, e in zip(base, expanded)
                    ]
                    paths[idx] = joined
                result = result.append_column(
                    "dest_path", pa.array(paths, pa.string())
                )
        return result

    return route_batch


def split_routed(batch: pa.Table) -> tuple[pa.Table, pa.Table]:
    """(matched, unmatched-for-quarantine) from a routed batch."""
    ok = pc.is_null(batch["error"])
    return batch.filter(ok), batch.filter(pc.invert(ok))


# ------------------------------------------------------------- onboarding

HL7_OUTPUT_ITEMS = [
    "recdeb", "redacted", "validation_report", "json", "lake_seg", "binary",
]


def validate_route_config(config: dict) -> None:
    """Schema-check a route-config document (the JSON-Schema contract of
    cosmosdb/route-config-schema.json: required fields, non-empty match
    keys, uniqueItems on route ids). Raises ValueError on the first
    violation; returns None when valid."""
    if not isinstance(config, dict) or "routes" not in config:
        raise ValueError("config must be a dict with a 'routes' list")
    if not isinstance(config["routes"], list):
        raise ValueError("'routes' must be a list")
    for i, r in enumerate(config["routes"]):
        for field in ("id", "match", "destination"):
            if not r.get(field):
                raise ValueError(f"routes[{i}]: missing required '{field}'")
        m = r["match"]
        if not m.get(STREAM_ID_COLUMN):
            raise ValueError(f"routes[{i}].match: missing {STREAM_ID_COLUMN}")
        if STREAM_ROUTE_COLUMN not in m:
            raise ValueError(
                f"routes[{i}].match: missing {STREAM_ROUTE_COLUMN}"
            )
    load_route_config(config)  # enforces uniqueItems on route ids


def onboard_routes(
    stream_id: str,
    route: str,
    ingress_destination: str,
    program_destination: str,
    credential: str = "",
    existing: dict | None = None,
) -> dict:
    """Generate (or upsert into ``existing``) the standard onboarding
    route set — parity with the reference's operator workflow
    (tools/onboarding/loadHL7Routes.py:25-51): ONE ingress route
    ``<stream_id>-<route>`` into the ingress store under the fixed
    ``dex-routing`` folder, plus — when the route is an hl7 stream — SIX
    output routes ``<stream_id>-hl7_out_<item>`` into the program store
    under date-partitioned folders (``hl7_out_<item>/:y/:m/:d/``).

    Upsert semantics match Cosmos ``upsert_item``: an existing route with
    the same id is replaced, others are preserved. The returned document
    is schema-validated (``validate_route_config``) before it is handed
    back, so a generated config can never fail ``load_route_config``
    later."""
    new_routes = [
        {
            "id": f"{stream_id}-{route}",
            "match": {
                STREAM_ID_COLUMN: stream_id,
                STREAM_ROUTE_COLUMN: route,
            },
            "destination": ingress_destination,
            "partition_folder": "dex-routing",
            **({"credential": credential} if credential else {}),
        }
    ]
    if route.startswith("hl7"):
        for item in HL7_OUTPUT_ITEMS:
            new_routes.append(
                {
                    "id": f"{stream_id}-hl7_out_{item}",
                    "match": {
                        STREAM_ID_COLUMN: stream_id,
                        STREAM_ROUTE_COLUMN: f"hl7_out_{item}",
                    },
                    "destination": program_destination,
                    "partition_folder": f"hl7_out_{item}/:y/:m/:d/",
                    **({"credential": credential} if credential else {}),
                }
            )
    config = dict(existing) if existing else {"routes": []}
    config["routes"] = list(config.get("routes", []))
    by_id = {r["id"]: i for i, r in enumerate(config["routes"])}
    for r in new_routes:
        if r["id"] in by_id:
            config["routes"][by_id[r["id"]]] = r
        else:
            config["routes"].append(r)
    validate_route_config(config)
    return config
