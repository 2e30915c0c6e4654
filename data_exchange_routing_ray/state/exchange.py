"""Raw-task hash exchange: the minimal shuffle for a small key domain.

The Dataset-native merge path (`groupby(part).map_groups`) runs Ray Data's
sort-based shuffle: sample → SortMap (read+sort+write) → SortReduce
(read+merge+write) → merge task (read). For our exchange the key domain is
tiny (P partition ids), so a full sort machinery is overkill; this module
is the documented raw-Ray escape hatch (SURVEY.md §2 custom-operator rule
(c)): each post-combine block is SPLIT once by pid (one argsort-take, then
zero-copy slices), and each partition's merge task gathers its slices
directly — one write + one read through the object store, no barrier, no
global sort.

Idempotence: split/merge tasks are pure; merge writes the same
deterministic staged filename as the Dataset path, so Ray task retries
overwrite their own output (the reference's idempotent-overwrite rule,
RouteIngestedFile.kt:251).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from data_exchange_routing_ray.stages.upsert import (
    PART_COLUMN,
    QUARANTINE_PARTITION,
    _limit_arrow_threads,
    merge_tables,
    stage_file_path,
)


@ray.remote
def _split_block(tab: pa.Table, num_partitions: int):
    """One block → (P+1) tables by pid (slot P = quarantine). Zero-copy
    slices of one part-sorted table; empty slots return None."""
    _limit_arrow_threads()
    out = [None] * (num_partitions + 1)
    if tab.num_rows == 0:
        return out
    pids = tab[PART_COLUMN].to_numpy()
    order = np.argsort(pids, kind="stable")
    sorted_tab = tab.take(pa.array(order))
    sp = pids[order]
    starts = np.nonzero(np.r_[True, sp[1:] != sp[:-1]])[0]
    ends = np.append(starts[1:], len(sp))
    for s, e in zip(starts, ends):
        pid = int(sp[s])
        slot = num_partitions if pid == QUARANTINE_PARTITION else pid
        out[slot] = sorted_tab.slice(s, e - s)
    return out


@ray.remote
def _merge_partition(
    pid: int,
    lake_dir: str,
    stage_dir: str,
    epoch: int,
    fence_below: int,
    base_rel: str | None,
    *tables,
):
    """Gather one partition's slices, merge against its base, stage file."""
    _limit_arrow_threads()
    tabs = [t for t in tables if t is not None and t.num_rows]
    if not tabs:
        return None
    group = pa.concat_tables(tabs, promote_options="permissive")
    if pid == QUARANTINE_PARTITION:
        out = group.drop_columns(
            [c for c in (PART_COLUMN, "salt") if c in group.column_names]
        )
        path = stage_file_path(stage_dir, epoch, pid).replace(
            f"part-{pid:05d}", "deadletter"
        )
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".inprogress"
        pq.write_table(out, tmp)
        os.replace(tmp, path)
        import pyarrow.compute as pc

        qmax = pc.max(out["seq"]).as_py() if "seq" in out.column_names else None
        return {
            "partition": pid, "epoch": epoch, "file": path,
            "changes_applied": 0, "changes_fenced": 0,
            "applied_offset": max(fence_below, qmax if qmax is not None else fence_below),
            "row_count": int(out.num_rows),
        }
    base = None
    if base_rel is not None:
        base = pq.read_table(os.path.join(lake_dir, base_rel))
    out, stats = merge_tables(base, group, fence_below)
    path = stage_file_path(stage_dir, epoch, pid)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".inprogress"
    pq.write_table(out, tmp)
    os.replace(tmp, path)
    return {"partition": pid, "epoch": epoch, "file": path, **stats}


def exchange_merge(
    prepared,
    num_partitions: int,
    lake_dir: str,
    stage_dir: str,
    epoch: int,
    fence_below: int,
    base_files: dict[int, str],
) -> pd.DataFrame:
    """Drive the split/merge task graph for one epoch; returns stats rows."""
    block_refs = prepared.to_arrow_refs()
    split_fn = _split_block.options(num_returns=num_partitions + 1)
    slots = [split_fn.remote(b, num_partitions) for b in block_refs]
    # slots[i] is a list of P+1 ObjectRefs (per-slot outputs of block i)
    merges = []
    for slot in range(num_partitions + 1):
        pid = QUARANTINE_PARTITION if slot == num_partitions else slot
        parts = [s[slot] for s in slots]
        merges.append(
            _merge_partition.remote(
                pid, lake_dir, stage_dir, epoch, fence_below,
                base_files.get(pid), *parts,
            )
        )
    rows = [r for r in ray.get(merges) if r is not None]
    return pd.DataFrame(
        rows,
        columns=[
            "partition", "epoch", "file", "changes_applied",
            "changes_fenced", "applied_offset", "row_count",
        ],
    )
