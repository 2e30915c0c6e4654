"""Arrow schemas for the CDC engine (see FIXTURES.md).

The reference engine is schemaless (string-keyed metadata maps + opaque
payloads, ``Common.kt:110-139``); we pin explicit Arrow schemas and handle
evolution by unification + null backfill instead of ``getOrDefault`` chains
(``RouteIngestedFile.kt:125-140``).
"""

from __future__ import annotations

import pyarrow as pa

# The lake table: multi-turn conversation / agent transcripts.
# Primary key (conv_id, turn_idx) — the analog of the reference's composite
# document key "$dataStreamId-$dataStreamRoute" (RouteIngestedFile.kt:453).
TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# Binlog change events. `seq` is the globally-unique LSN, playing the role of
# Azure's per-blob `sequencer` ordering token (HL7Message.kt:25).
CHANGE_SCHEMA = pa.schema(
    [
        ("seq", pa.int64()),
        ("op", pa.string()),  # insert | update | delete
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# Columns a lake partition file persists beyond the logical table: the
# last-writer seq per surviving row (needed for LWW on later merges and for
# lineage audits).
LAKE_EXTRA_COLUMNS = ("seq",)

# Per-(partition, epoch) lineage rows — analog of PSReportEnvelope/StageInfo
# (fns-routing/.../PSReportEnvelope.kt:7-58).
# Structured per-report issue, PSReportEnvelope.kt:49-54 (Issue{level,message},
# IssueLevel WARNING|ERROR).
ISSUE_TYPE = pa.struct([("level", pa.string()), ("message", pa.string())])

LINEAGE_SCHEMA = pa.schema(
    [
        ("partition", pa.int32()),
        ("epoch", pa.int64()),
        ("applied_offset", pa.int64()),
        ("row_count", pa.int64()),
        ("changes_applied", pa.int64()),
        ("changes_fenced", pa.int64()),
        ("status", pa.string()),  # SUCCESS | QUARANTINED (ref: SUCCESS|FAILURE)
        ("start_ts", pa.timestamp("us")),
        ("end_ts", pa.timestamp("us")),
        # --- versioned-envelope parity, PSReportEnvelope.kt:4-58 ---
        ("report_schema_version", pa.string()),  # SCHEMA_VERSION = "1.0.0"
        ("content_schema_name", pa.string()),  # ref: "blob-file-copy"; ours: per-partition commit
        ("content_schema_version", pa.string()),
        ("service", pa.string()),  # StageInfo.service
        ("stage", pa.string()),  # StageInfo.stage
        ("version", pa.string()),  # StageInfo.version
        ("issues", pa.list_(ISSUE_TYPE)),  # StageInfo.issues
        # --- trace-context parity, RouteIngestedFile.kt:138-140, :203 ---
        # trace_id / parent_span_id arrive with the change stream's source
        # metadata (default "" like the reference's getOrDefault); span_id
        # is THIS stage's child span — downstream stages chain under it
        # (the reference's sourceMetadata["parent_span_id"] = childSpanId)
        ("trace_id", pa.string()),
        ("parent_span_id", pa.string()),
        ("span_id", pa.string()),
        # config audit (S14, FnCacheUpdater.kt:22-52): content-hash of the
        # route config active when this epoch committed — answers "which
        # config routed epoch N" after a hot reload
        ("config_version", pa.string()),
    ]
)

VALID_OPS = ("insert", "update", "delete")

# Key columns of the lake table.
KEY_COLUMNS = ("conv_id", "turn_idx")

# Stable output ordering for comparison (SURVEY.md §2.6 O1: order restored at
# commit time, reference RouteIngestedFile.kt:537-547).
ORDER_COLUMNS = ("conv_id", "turn_idx", "ts")
