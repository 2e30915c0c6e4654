"""Per-epoch lineage / processing-status reports.

Analog of the reference's ``PSReportEnvelope``/``StageInfo`` report stream
(``fns-routing/.../PSReportEnvelope.kt:7-58``, published per processed file,
``RouteIngestedFile.kt:409-428``): one row per (partition, epoch) with the
applied-offset watermark, row counts and status. Written by the driver at
commit time (small — at most P rows per epoch).
"""

from __future__ import annotations

import glob
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from data_exchange_routing_ray.schemas import LINEAGE_SCHEMA


class LineageLog:
    def __init__(self, lake_dir: str, branch: str = "main"):
        sub = "lineage" if branch == "main" else f"lineage-{branch}"
        self.dir = os.path.join(lake_dir, sub)
        os.makedirs(self.dir, exist_ok=True)

    def append_epoch(self, epoch: int, rows: pd.DataFrame) -> str:
        """Write one lineage file per epoch (deterministic name, idempotent)."""
        table = pa.Table.from_pandas(rows, preserve_index=False)
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
        return pa.concat_tables(pq.read_table(f) for f in files)
