"""data_exchange_routing_ray — a Ray-Data-native CDC / incremental-ingest engine.

A from-scratch re-expression of the semantics of CDCgov/data-exchange-routing
(validated, keyed, idempotent, exactly-once, config-routed incremental ingest)
as ``ray.data.Dataset`` pipelines over zero-copy Arrow batches:

- change-event tail (binlog-style ``seq``-ordered insert/update/delete rows)
- vectorized validation with dead-letter quarantine
  (reference: ``RouteIngestedFile.kt:111-146``, ``:308-329``)
- broadcast config routing with 1->N route expansion
  (reference: ``RouteIngestedFile.kt:150-209``)
- hash-partitioned last-writer-wins merge-apply upsert with schema
  evolution (Arrow schema unification + backfill nulls)
- exactly-once two-phase manifest commit with offset fencing
  (reference: staged-block upload + ordered ``commitBlockList``,
  ``RouteIngestedFile.kt:470-550``)
- per-partition lineage / processing-status reports
  (reference: ``PSReportEnvelope.kt``)

None of the modules call ``ray.init()``; sessions are owned by the caller
(tests, ``bench.py``, CLI entry points).
"""

from data_exchange_routing_ray.schemas import (
    CHANGE_SCHEMA,
    LINEAGE_SCHEMA,
    TRANSCRIPT_SCHEMA,
)

__version__ = "0.1.0"

__all__ = [
    "CHANGE_SCHEMA",
    "LINEAGE_SCHEMA",
    "TRANSCRIPT_SCHEMA",
    "__version__",
]
