"""Per-epoch lineage / processing-status reports.

Analog of the reference's ``PSReportEnvelope``/``StageInfo`` report stream
(``fns-routing/.../PSReportEnvelope.kt:4-58``, published per processed file,
``RouteIngestedFile.kt:409-428``): one row per (partition, epoch) with the
applied-offset watermark, row counts, status, the versioned-envelope fields
(``report_schema_version``, ``content_schema_name``/``_version``, stage info
``service``/``stage``/``version``) and a structured ``issues`` list
(``Issue{level, message}``, ``PSReportEnvelope.kt:49-54``). Written by the
driver at commit time (small — at most P rows per epoch).
"""

from __future__ import annotations

import glob
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from data_exchange_routing_ray.schemas import ISSUE_TYPE, LINEAGE_SCHEMA

# Envelope constants (PSReportEnvelope.kt:4-5, :37-46). service/stage match
# the reference's StageInfo defaults; the content schema names OUR report
# payload (a lake-partition commit, the analog of the per-file blob copy).
REPORT_SCHEMA_VERSION = "1.0.0"
CONTENT_SCHEMA_NAME = "lake-partition-commit"
CONTENT_SCHEMA_VERSION = "1.0.0"
SERVICE = "Routing"
STAGE = "dex-routing"
APP_VERSION = "1.0.0"

ENVELOPE_CONSTANTS = {
    "report_schema_version": REPORT_SCHEMA_VERSION,
    "content_schema_name": CONTENT_SCHEMA_NAME,
    "content_schema_version": CONTENT_SCHEMA_VERSION,
    "service": SERVICE,
    "stage": STAGE,
    "version": APP_VERSION,
}


class LineageLog:
    def __init__(self, lake_dir: str, branch: str = "main"):
        sub = "lineage" if branch == "main" else f"lineage-{branch}"
        self.dir = os.path.join(lake_dir, sub)
        os.makedirs(self.dir, exist_ok=True)

    def append_epoch(self, epoch: int, rows: pd.DataFrame) -> str:
        """Write one lineage file per epoch (deterministic name, idempotent).

        ``rows`` may carry an ``issues`` column of ``[{level, message}, ...]``
        lists (quarantine rows carry their exact errors); absent or null
        entries become empty lists. Envelope-constant columns are filled in
        here so callers only supply the per-commit facts.
        """
        rows = rows.copy()
        for name, value in ENVELOPE_CONSTANTS.items():
            if name not in rows.columns:
                rows[name] = value
        # trace-context defaults mirror the reference's getOrDefault("", …);
        # config_version stays null when the committer declared none
        for name in ("trace_id", "parent_span_id", "span_id"):
            if name not in rows.columns:
                rows[name] = ""
        if "config_version" not in rows.columns:
            rows["config_version"] = None
        issues = (
            [v if isinstance(v, list) else [] for v in rows["issues"]]
            if "issues" in rows.columns
            else [[] for _ in range(len(rows))]
        )
        scalar = rows.drop(columns=["issues"], errors="ignore")
        table = pa.Table.from_pandas(scalar, preserve_index=False)
        table = table.append_column("issues", pa.array(issues, type=pa.list_(ISSUE_TYPE)))
        table = table.select([f.name for f in LINEAGE_SCHEMA]).cast(LINEAGE_SCHEMA)
        path = os.path.join(self.dir, f"epoch-{epoch:012d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, path)
        return path

    def read_all(self) -> pa.Table:
        files = sorted(glob.glob(os.path.join(self.dir, "epoch-*.parquet")))
        if not files:
            return LINEAGE_SCHEMA.empty_table()
        # conform every epoch file to the CURRENT envelope schema: lakes
        # written before the round-3 widening lack the versioned-envelope
        # columns; they backfill as nulls (empty issue lists) instead of
        # failing the whole report history on a concat schema mismatch
        tables = []
        for f in files:
            t = pq.read_table(f)
            cols = []
            for fld in LINEAGE_SCHEMA:
                if fld.name in t.column_names:
                    cols.append(t[fld.name].cast(fld.type))
                else:
                    cols.append(pa.nulls(t.num_rows, fld.type))
            tables.append(pa.table(dict(zip(LINEAGE_SCHEMA.names, cols))))
        return pa.concat_tables(tables).cast(LINEAGE_SCHEMA)
