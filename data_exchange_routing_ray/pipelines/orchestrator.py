"""Config-driven pipeline orchestration (pipeline-as-data).

Re-expresses the reference's durable-orchestration engine — a JSON
``OrchestratorConfiguration{steps:[{stepNumber, functionToRun, ...}]}``
interpreted over activities (``OrchestratorDtos.kt:8-25``,
``FnOrchestrator.kt:71-194``) — as a declarative spec interpreted over
``ray.data.Dataset`` transforms:

- a **step** is a named stage from a registry (the activity contract,
  ``ActivityDtos.kt:3-25``): a callable ``(Dataset, config) -> Dataset``
- **fan-out** (``fanOutAfter``; decompressor returning one param set per
  extracted file, ``FnDecompressor.kt:81-88``) = a stage whose map multiplies
  rows; the Dataset is the branch set, so no sub-orchestrator machinery
- **fan-in** (``fanInBefore``) = the natural all-blocks barrier before the
  next stage
- **error routing** (``customErrorFunction`` / ``globalErrorFunction``) =
  rows failing a validating stage carry an ``error`` column and are split to
  a quarantine Dataset instead of aborting the run

The registry is the user-extension surface: register a callable by name,
reference it from config. Configs are plain dicts (JSON-loadable).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

import pyarrow.compute as pc

import ray.data

StageFn = Callable[[ray.data.Dataset, dict], ray.data.Dataset]

_REGISTRY: dict[str, StageFn] = {}


def register_stage(name: str, fn: StageFn | None = None):
    """Register a stage callable under ``name`` (usable as a decorator)."""
    if fn is None:
        def deco(f: StageFn) -> StageFn:
            _REGISTRY[name] = f
            return f
        return deco
    _REGISTRY[name] = fn
    return fn


def registered_stages() -> list[str]:
    return sorted(_REGISTRY)


class PipelineFailedError(RuntimeError):
    """A step with failIfAnyErrors saw errored rows (fanInFailIfAnyFail)."""


@dataclass
class OrchestratorResult:
    output: ray.data.Dataset
    quarantine: ray.data.Dataset | None = None
    steps_run: list[str] = field(default_factory=list)


def run_pipeline(
    ds: ray.data.Dataset, config: dict, registry: dict[str, StageFn] | None = None
) -> OrchestratorResult:
    """Interpret a step config over a Dataset.

    Config shape (mirrors the reference's orchestrator JSON,
    ``fns-csv-pipeline/README.md:50-122``)::

        {"steps": [{"function": "<registry name>", "config": {...},
                    "quarantineErrors": true|false}, ...]}

    A step with ``quarantineErrors`` splits rows whose ``error`` column is
    non-null to the quarantine Dataset before the next step (the
    customErrorFunction analog); the pipeline never aborts mid-stream.
    A step with ``failIfAnyErrors`` instead ABORTS the run when any row
    errored (the reference's ``fanInFailIfAnyFail`` policy,
    FnOrchestrator.kt:144-189), raising ``PipelineFailedError``.
    """
    reg = {**_REGISTRY, **(registry or {})}
    steps = config.get("steps", [])
    # config validation mirrors FnRouter.kt:92-126 (error on malformed)
    for s in steps:
        if "function" not in s:
            raise ValueError(f"Step missing 'function': {s}")
        if s["function"] not in reg:
            raise ValueError(
                f"Unknown step function {s['function']!r}; "
                f"registered: {sorted(reg)}"
            )
    quarantines: list[ray.data.Dataset] = []
    steps_run: list[str] = []
    for s in sorted(steps, key=lambda x: x.get("stepNumber", 0)):
        fn = reg[s["function"]]
        ds = fn(ds, s.get("config", {}))
        steps_run.append(s["function"])
        if s.get("failIfAnyErrors") and "error" in ds.schema().names:
            n_bad = ds.map_batches(
                lambda b: b.filter(pc.is_valid(b["error"])), batch_format="pyarrow"
            ).count()
            if n_bad:
                raise PipelineFailedError(
                    f"step {s['function']!r}: {n_bad} row(s) errored and "
                    "failIfAnyErrors is set"
                )
            ds = ds.map_batches(
                lambda b: b.drop_columns(["error"]), batch_format="pyarrow"
            )
        if s.get("quarantineErrors") and "error" in ds.schema().names:
            bad = ds.map_batches(
                lambda b: b.filter(pc.is_valid(b["error"])), batch_format="pyarrow"
            )
            ds = ds.map_batches(
                lambda b: b.filter(pc.is_null(b["error"])).drop_columns(["error"]),
                batch_format="pyarrow",
            )
            quarantines.append(bad)
    quar = quarantines[0] if len(quarantines) == 1 else (
        quarantines[0].union(*quarantines[1:]) if quarantines else None
    )
    return OrchestratorResult(output=ds, quarantine=quar, steps_run=steps_run)


# ----------------------------------------------------------- built-in stages

@register_stage("validate_changes")
def _validate_stage(ds: ray.data.Dataset, config: dict) -> ray.data.Dataset:
    from data_exchange_routing_ray.stages.validate import validate_batch

    return ds.map_batches(validate_batch, batch_format="pyarrow")


@register_stage("route")
def _route_stage(ds: ray.data.Dataset, config: dict) -> ray.data.Dataset:
    from data_exchange_routing_ray.stages.route import make_router

    router = make_router(config["route_config"], enrich=config.get("enrich", False))
    return ds.map_batches(router, batch_format="pyarrow")


@register_stage("debatch_json")
def _debatch_stage(ds: ray.data.Dataset, config: dict) -> ray.data.Dataset:
    from data_exchange_routing_ray.stages.debatch import debatch_json_array

    col = config.get("payload_col", "text")
    return ds.map_batches(
        lambda b: debatch_json_array(b, payload_col=col), batch_format="pyarrow"
    )


@register_stage("redact")
def _redact_stage(ds: ray.data.Dataset, config: dict) -> ray.data.Dataset:
    from data_exchange_routing_ray.functions.text import RedactText

    return ds.map_batches(
        RedactText(col=config.get("col", "text")),
        batch_format="pyarrow",
        concurrency=config.get("concurrency", 2),
    )


@register_stage("text_stats")
def _text_stats_stage(ds: ray.data.Dataset, config: dict) -> ray.data.Dataset:
    from data_exchange_routing_ray.functions.text import add_text_stats

    return ds.map_batches(
        lambda b: add_text_stats(b, config.get("col", "text")),
        batch_format="pyarrow",
    )


@register_stage("select_columns")
def _select_stage(ds: ray.data.Dataset, config: dict) -> ray.data.Dataset:
    return ds.select_columns(config["columns"])


@register_stage("filter_expr")
def _filter_stage(ds: ray.data.Dataset, config: dict) -> ray.data.Dataset:
    return ds.filter(expr=config["expr"])
