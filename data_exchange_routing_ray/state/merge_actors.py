"""Stateful actor-pool merge: per-partition LSM buffers across epochs.

The alternative merge backend to the pure-Dataset ``groupby(part)`` path
(``pipelines/cdc.py``): a pool of named, detached-within-session Ray actors,
each owning a stable slice of partitions (``pid % pool_size``). This is the
raw-actor escape hatch the Dataset API can't express — cross-EPOCH mutable
state (SURVEY.md §7.3 "per-partition state vs Ray Data's stateless
shuffle"): the actor keeps each partition's merged table in memory, so epoch
N+1 merges against live state instead of re-reading epoch N's parquet from
the lake (the reference's analog: lazy singleton clients + in-process config
cache, ``RouteIngestedFile.kt:24-72``, ``Common.kt:20-41``).

Dataflow per epoch::

    prepared Dataset (part column assigned)
      → map_batches(dispatch): split each block by pid, ship sub-tables to
        the owning actor's ingest() (direct exchange — replaces the sort
        shuffle; backpressured by waiting on the ingest futures)
      → driver: flush(epoch) on every actor → per-partition LWW merge
        against in-memory state (cold-start from the manifest's base file),
        staged parquet write, stats rows back
      → driver commits manifest (same two-phase protocol)

Crash-resume: actors are session-scoped; on restart the pool cold-loads
partition state from the committed manifest's files, and epoch fencing makes
replays no-ops — identical guarantees to the stateless path.
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
    SALT_COLUMN,
    merge_tables,
    stage_file_path,
)


@ray.remote
class PartitionMergeActor:
    """Owns partitions ``{pid : pid % pool_size == index}``; holds their
    merged tables in memory between epochs (the LSM memtable)."""

    def __init__(self, lake_dir: str):
        self.lake_dir = lake_dir
        self.state: dict[int, pa.Table] = {}  # pid -> merged table
        self.buffers: dict[int, list[pa.Table]] = {}  # pid -> epoch deltas

    def ingest(self, pid: int, table: pa.Table) -> int:
        self.buffers.setdefault(pid, []).append(table)
        return table.num_rows

    def flush(
        self,
        epoch: int,
        fence_below: int,
        base_files: dict[int, str],
        stage_dir: str,
    ) -> list[dict]:
        """Merge buffered deltas per owned partition, stage files, return
        stats rows. Buffers are cleared whether or not the driver commits —
        a failed epoch is re-dispatched from the source, not from buffers."""
        rows = []
        buffers, self.buffers = self.buffers, {}
        for pid, tables in sorted(buffers.items()):
            delta = pa.concat_tables(tables, promote_options="permissive")
            drop = [
                c for c in (PART_COLUMN, SALT_COLUMN) if c in delta.column_names
            ]
            if drop:
                delta = delta.drop_columns(drop)
            if pid == QUARANTINE_PARTITION:
                path = stage_file_path(stage_dir, epoch, 0).replace(
                    "part-00000", "deadletter"
                )
                os.makedirs(os.path.dirname(path), exist_ok=True)
                tmp = path + ".inprogress"
                pq.write_table(delta, tmp)
                os.replace(tmp, path)
                # dead-lettered rows count as processed: advance the
                # watermark past their seqs (see stages/upsert.py)
                import pyarrow.compute as pc

                qmax = (
                    pc.max(delta["seq"]).as_py()
                    if "seq" in delta.column_names
                    else None
                )
                rows.append(
                    {
                        "partition": pid,
                        "epoch": epoch,
                        "file": path,
                        "changes_applied": 0,
                        "changes_fenced": 0,
                        "applied_offset": max(
                            fence_below, qmax if qmax is not None else fence_below
                        ),
                        "row_count": int(delta.num_rows),
                    }
                )
                continue
            base = self.state.get(pid)
            if base is None:
                rel = base_files.get(pid)
                if rel is not None:  # cold start / resume from manifest
                    base = pq.read_table(os.path.join(self.lake_dir, rel))
            out, stats = merge_tables(base, delta, fence_below)
            self.state[pid] = out
            path = stage_file_path(stage_dir, epoch, pid)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + ".inprogress"
            pq.write_table(out, tmp)
            os.replace(tmp, path)
            rows.append(
                {"partition": pid, "epoch": epoch, "file": path, **stats}
            )
        return rows

    def reset(self) -> None:
        self.state.clear()
        self.buffers.clear()


class MergeActorPool:
    """Driver-side handle: stable pid→actor routing, dispatch + flush."""

    def __init__(self, lake_dir: str, pool_size: int = 8, name_prefix: str = ""):
        self.pool_size = pool_size
        self.actors = [
            PartitionMergeActor.options(
                name=f"{name_prefix}merge-{i}", get_if_exists=True
            ).remote(lake_dir)
            for i in range(pool_size)
        ]

    def actor_for(self, pid: int):
        # quarantine rows go to actor 0 deterministically
        return self.actors[pid % self.pool_size if pid >= 0 else 0]

    def make_dispatch_fn(self):
        """A map_batches callable: splits each block by pid and ships each
        sub-table to its owning actor. Returns a tiny ack table; blocking on
        the ingest futures inside the task is the backpressure."""
        actors = self.actors
        pool = self.pool_size

        def dispatch(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({"rows_sent": pa.array([0], pa.int64())})
            pids = batch[PART_COLUMN].to_numpy()
            order = np.argsort(pids, kind="stable")
            sorted_batch = batch.take(pa.array(order))
            spids = pids[order]
            starts = np.nonzero(np.r_[True, spids[1:] != spids[:-1]])[0]
            ends = np.append(starts[1:], len(spids))
            futs = []
            for s, e in zip(starts, ends):
                pid = int(spids[s])
                a = actors[pid % pool if pid >= 0 else 0]
                futs.append(a.ingest.remote(pid, sorted_batch.slice(s, e - s)))
            ray.get(futs)
            return pa.table({"rows_sent": pa.array([len(spids)], pa.int64())})

        return dispatch

    def flush(
        self,
        epoch: int,
        fence_below: int,
        base_files: dict[int, str],
        stage_dir: str,
    ) -> pd.DataFrame:
        rows = ray.get(
            [
                a.flush.remote(epoch, fence_below, base_files, stage_dir)
                for a in self.actors
            ]
        )
        flat = [r for sub in rows for r in sub]
        return pd.DataFrame(
            flat,
            columns=[
                "partition",
                "epoch",
                "file",
                "changes_applied",
                "changes_fenced",
                "applied_offset",
                "row_count",
            ],
        )

    def reset(self) -> None:
        """Drop all in-memory partition state (required before a lake
        repartition: pid→key mapping changes, so held tables are stale)."""
        ray.get([a.reset.remote() for a in self.actors])

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []
