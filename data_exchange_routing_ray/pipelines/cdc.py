"""CDCLake — the engine's public API: epoch-driven, exactly-once lake upsert.

One epoch = one micro-batch of change events (the reference's queue
micro-batch of 32 events, ``host.json:22-29``, scaled up to a seq-range of a
binlog). Per epoch:

    read change slice (column-pruned, seq-fenced at the scan)
      → validate (zero-copy Arrow map_batches) ┬→ quarantine parquet (dead-letter)
      → partition + within-batch combiner      └ (invalid rows)
      → groupby(part).map_groups(merge)   [the ONE shuffle]
      → staged partition files (deterministic names)
      → driver: rename into lake, append lineage, publish manifest (atomic)

Crash anywhere before manifest publish ⇒ previous epoch remains the visible
table; re-running the epoch is idempotent (staged names deterministic, merge
fenced by ``applied_offset``). This mirrors the reference's
stage-blocks-then-commitBlockList exactly-once pattern
(``RouteIngestedFile.kt:470-550``) and idempotent overwrite (``:251``).

No function here calls ``ray.init``; the caller owns the session.
"""

from __future__ import annotations

import hashlib as _hashlib
import os
import shutil
import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

import ray.data

from data_exchange_routing_ray.schemas import TRANSCRIPT_SCHEMA
from data_exchange_routing_ray.stages.upsert import (
    PART_COLUMN,
    QUARANTINE_PARTITION,
    SALT_COLUMN,
    add_partition_column,
    add_salt_column,
    make_merge_fn,
    partial_reduce_group,
    prepare_batch,
)
from data_exchange_routing_ray.state.lineage import LineageLog
from data_exchange_routing_ray.state.manifest import (
    ConcurrentCommitError,
    Manifest,
    ManifestStore,
    PartitionEntry,
)


def _partition_specs(man: Manifest) -> dict[int, tuple[str, list[str]]]:
    """Manifest → {pid: (base file, [delta files])} — the slim spec shipped
    into distributed diff tasks (changefeed / rebase). Including the delta
    stack makes those diffs exact under ``merge_policy="delta"`` instead of
    silently ignoring rows living in unfolded deltas (round-2 ADVICE)."""
    return {
        p: (e.file, [d["file"] for d in e.deltas])
        for p, e in man.partitions.items()
    }


def _read_folded_df(
    lake_dir: str, spec: tuple[str, list[str]] | None
) -> pd.DataFrame | None:
    """Read one partition's merge-on-read view (base + folded delta stack)
    as pandas; None when the partition does not exist on this side.

    Multi-leader lakes store deletes as TOMBSTONE rows (op='delete' kept
    in the table); those are storage, not state — filter them here so
    diff consumers (changefeed_between, rebase_from) see a deleted key as
    ABSENT (a 'delete' envelope) rather than as a live row whose 'op'
    payload changed."""
    if spec is None:
        return None
    base_rel, delta_rels = spec
    base = (
        pq.read_table(os.path.join(lake_dir, base_rel)) if base_rel else None
    )
    if delta_rels:
        from data_exchange_routing_ray.stages.upsert import fold_deltas

        base = fold_deltas(
            base,
            [pq.read_table(os.path.join(lake_dir, r)) for r in delta_rels],
        )
    if base is not None and "op" in base.column_names:
        base = base.filter(
            pc.not_equal(pc.fill_null(base["op"], ""), pa.scalar("delete"))
        ).drop_columns(["op"])
    return base.to_pandas() if base is not None else None


def _payload_changed(
    m: pd.DataFrame, payload: list[str], left_suffix: str, right_suffix: str
) -> pd.Series:
    """Null-aware any-column inequality over merged payload columns:
    value≠value, value↔null are changes; null==null is not. (A sentinel
    ``fillna('\\x00')`` would alias genuine '\\x00' text to NULL and only
    ever looked at one column — round-2 ADVICE.)"""
    changed = pd.Series(False, index=m.index)
    for c in payload:
        a, b = m[f"{c}{left_suffix}"], m[f"{c}{right_suffix}"]
        changed |= a.ne(b) & ~(a.isna() & b.isna())
    return changed


@dataclass
class EpochResult:
    epoch: int
    applied_offset: int
    partitions_touched: int
    changes_applied: int
    changes_fenced: int
    rows_quarantined: int
    total_rows: int
    # this epoch's child span (trace-context parity, RouteIngestedFile.kt
    # :203): callers chain the NEXT stage with parent_span_id=span_id
    span_id: str = ""
    config_version: str | None = None
    stats: pd.DataFrame = field(repr=False, default=None)


class CDCLake:
    """A partitioned, manifest-committed transcript lake."""

    def __init__(
        self,
        lake_dir: str,
        num_partitions: int = 64,
        combine_batch_size: int = 256 * 1024,
        num_salts: int = 1,
        merge_mode: str = "groupby",
        pool_size: int = 8,
        merge_policy: str = "rewrite",
        delta_max_files: int = 4,
        delta_ratio: float = 0.2,
        branch: str = "main",
        multi_leader: bool = False,
        schema_policy: str = "evolve",
        manifest_segment_size: int | None = None,
    ):
        # combine_batch_size: rows per fused validate/partition/combine batch.
        # Larger ⇒ better pre-shuffle dedup and fewer shuffle blocks; 256Ki
        # rows of transcript turns ≈ 25-50 MiB, well inside a worker heap.
        # num_salts > 1 enables the salted pre-reduce for hot-key skew
        # (groupby mode only; the actor pool reduces inside each actor).
        # merge_mode: "groupby" = stateless Dataset shuffle (default);
        # "actors" = named actor pool holding per-partition LSM state across
        # epochs (state/merge_actors.py) — faster for many small epochs.
        # merge_policy: "rewrite" = CoW rewrite of each touched partition
        # per epoch (default); "delta" = LSM-lite: small epochs append
        # fenced change-table delta files per partition, reads fold
        # base+deltas, and a level trigger (delta_max_files) compacts —
        # bounding write amplification at many small epochs (groupby mode).
        if merge_mode not in ("groupby", "exchange", "actors"):
            raise ValueError(
                f"merge_mode must be groupby|exchange|actors, got {merge_mode!r}"
            )
        if merge_policy not in ("rewrite", "delta"):
            raise ValueError(
                f"merge_policy must be rewrite|delta, got {merge_policy!r}"
            )
        if merge_policy == "delta" and merge_mode != "groupby":
            raise ValueError("merge_policy='delta' requires merge_mode='groupby'")
        # multi_leader: out-of-order-tolerant LWW merges (cross-site WAL
        # exchange may deliver seqs BELOW the local watermark): winners are
        # decided base-seq-vs-change-seq and deletes persist as tombstone
        # rows that readers filter. Requires the stateless rewrite path
        # (tombstone folding through delta stacks / actor memtables is a
        # documented non-goal; tombstone GC needs a cross-site watermark,
        # the Cassandra gc_grace problem).
        # schema_policy: "evolve" (default) = Arrow schema unification with
        # backfill-null semantics, newly observed payload columns REGISTER
        # in the manifest (schema_names) at commit (groupby merge mode;
        # actors/exchange modes enforce but do not extend the registry —
        # commit evolved columns through a groupby epoch first); "strict"
        # = change
        # batches carrying columns outside CHANGE_SCHEMA + the committed
        # registry dead-letter with the exact violation (schema-registry
        # compatibility enforcement) instead of silently unifying.
        if schema_policy not in ("evolve", "strict"):
            raise ValueError(
                f"schema_policy must be evolve|strict, got {schema_policy!r}"
            )
        self.schema_policy = schema_policy
        # the engine MODE is a property of the on-disk lake, not of one
        # process's constructor args: multi-leader storage carries an 'op'
        # column and tombstone rows that single-leader reads would surface
        # as live state, and a single-leader lake run through gc_tombstones
        # would fail every re-injected row's op validation. Persist the
        # mode at creation and ADOPT it on reopen (same precedent as
        # num_partitions below) — so `cli gc` on a single-leader lake is
        # refused by gc_tombstones' mode check instead of committing an
        # empty table.
        os.makedirs(lake_dir, exist_ok=True)
        cfg_path = os.path.join(lake_dir, "lake-config.json")
        if os.path.exists(cfg_path):
            import json as _json

            with open(cfg_path) as f:
                _cfg = _json.load(f)
            multi_leader = bool(_cfg.get("multi_leader", multi_leader))
            # manifest layout is likewise a property of the on-disk lake:
            # a segmented lake reopened without the flag would publish a
            # monolithic root mid-log (reads tolerate the mix, but the
            # O(dirty) commit-cost guarantee would silently vanish)
            manifest_segment_size = _cfg.get(
                "manifest_segment_size", manifest_segment_size
            )
        else:
            import json as _json

            tmp = cfg_path + ".tmp"
            with open(tmp, "w") as f:
                _json.dump(
                    {
                        "multi_leader": bool(multi_leader),
                        "manifest_segment_size": manifest_segment_size,
                    },
                    f,
                )
            os.replace(tmp, cfg_path)
        if multi_leader and (merge_policy != "rewrite" or merge_mode != "groupby"):
            raise ValueError(
                "multi_leader requires merge_mode='groupby' and merge_policy='rewrite'"
            )
        self.multi_leader = multi_leader
        self.merge_policy = merge_policy
        self.delta_max_files = delta_max_files
        self.delta_ratio = delta_ratio
        self.combine_batch_size = combine_batch_size
        self.num_salts = num_salts
        self.merge_mode = merge_mode
        self.pool_size = pool_size
        self._pool = None
        self.lake_dir = lake_dir
        self.branch = branch
        # declared content-hash of the ACTIVE route config (S14 audit):
        # set via set_config_version / the config_version arg of
        # apply_changes; stamped into every commit's manifest+lineage
        self.config_version: str | None = None
        os.makedirs(lake_dir, exist_ok=True)
        self.manifest_segment_size = manifest_segment_size
        self.store = ManifestStore(
            lake_dir, branch=branch, segment_size=manifest_segment_size
        )
        self.lineage = LineageLog(lake_dir, branch=branch)
        from data_exchange_routing_ray.state.consumers import ConsumerOffsets

        self.consumers = ConsumerOffsets(lake_dir, branch=branch)
        current = self.store.load_current()
        # resuming a lake keeps its partition count (files are keyed by it)
        self.num_partitions = (
            current.num_partitions if current and current.num_partitions else num_partitions
        )

    # ------------------------------------------------------------------ state
    @property
    def manifest(self) -> Manifest:
        m = self.store.load_current()
        return m if m is not None else Manifest(num_partitions=self.num_partitions)

    @property
    def applied_offset(self) -> int:
        return self.manifest.applied_offset

    def _file_tag(self) -> str:
        return "" if self.branch == "main" else f"-{self.branch}"

    def create_branch(self, name: str) -> "CDCLake":
        """Zero-copy branch (Nessie/LakeFS-style; the reference's TST/PRD
        environment split — CHANGELOG.md:56-57's load-test on TST against
        production data paths — done properly inside ONE lake): copy ONLY
        the current manifest into the branch's manifest log — every data file is
        shared until a branch epoch rewrites a partition (whose new file
        carries the branch tag, so branches never clobber each other).
        Readers of either branch see fully consistent, fully isolated
        tables."""
        if name == "main" or not name.isidentifier():
            raise ValueError(f"invalid branch name {name!r}")
        br = CDCLake(
            self.lake_dir,
            num_partitions=self.num_partitions,
            merge_policy=self.merge_policy,
            branch=name,
        )
        cur = self.store.load_current()
        if cur is not None and br.store.load_current() is None:
            br.store.publish(cur, expect_epoch=None)
            import json

            with open(os.path.join(br.store.dir, "fork.json"), "w") as f:
                json.dump({"fork_epoch": cur.epoch, "from": self.branch}, f)
        return br

    def _check_mode_match(self, other: "CDCLake") -> None:
        """Manifest adoption (fast_forward / cutover_to) requires matching
        engine modes: a single-leader lake adopting multi-leader files
        would surface tombstone rows as live state on streaming reads
        (final_dataset only filters op='delete' in multi-leader mode),
        and the reverse silently strips tombstone protection."""
        if self.multi_leader != other.multi_leader:
            raise ValueError(
                "engine-mode mismatch: cannot adopt a "
                f"{'multi' if other.multi_leader else 'single'}-leader "
                f"branch into a "
                f"{'multi' if self.multi_leader else 'single'}-leader lake"
            )

    def fast_forward(self, branch_lake: "CDCLake") -> int:
        """FF-ONLY branch merge (git semantics): adopt the branch's current
        manifest as this branch's new head — allowed only when this branch
        has NOT advanced past the recorded fork point (a divergent main
        needs a replay-based rebase, which the caller does by re-applying
        the branch's change stream; no silent three-way merge). Zero data
        movement: the manifest adopts the branch's tagged files in place.
        Returns the new epoch."""
        import json

        self._check_mode_match(branch_lake)
        fork_path = os.path.join(branch_lake.store.dir, "fork.json")
        if not os.path.exists(fork_path):
            raise ValueError("branch has no recorded fork point")
        with open(fork_path) as f:
            fork = json.load(f)
        if fork.get("from") != self.branch:
            raise ValueError(
                f"branch forked from {fork.get('from')!r}, not {self.branch!r}"
            )
        cur = self.manifest
        if cur.epoch != fork["fork_epoch"]:
            raise ValueError(
                f"non-fast-forward: {self.branch} advanced to epoch "
                f"{cur.epoch} past fork epoch {fork['fork_epoch']}"
            )
        head = branch_lake.manifest
        self.store.publish(head, expect_epoch=cur.epoch)
        return head.epoch

    def cutover_to(self, branch_lake: "CDCLake", audit_fn=None) -> int:
        """Online-migration cutover (gh-ost's atomic table rename): adopt
        the branch's current manifest as this branch's next epoch even
        though this branch ADVANCED past the fork — the non-fast-forward
        counterpart of ``fast_forward`` for a shadow branch the migration
        deliberately kept in sync by dual-applying production changes.

        Because divergence is allowed, the caller MUST prove parity:
        ``audit_fn(candidate_manifest, lake_dir)`` runs WAP-style before
        publish — raise and the cutover aborts with no visible effect
        (readers keep the pre-cutover table). Publish is OCC-fenced at
        this branch's current epoch, so a concurrent production commit
        that would invalidate the audited parity aborts the cutover
        instead of being silently overwritten. Returns the new epoch."""
        self._check_mode_match(branch_lake)
        cur = self.manifest
        head = branch_lake.manifest
        cand = Manifest(
            # strictly monotone and collision-free vs BOTH manifest logs:
            # the adopted manifest is archived under this epoch number
            epoch=max(cur.epoch, head.epoch) + 1,
            # never regress the global replay fence: a shadow branch whose
            # offset trails main's (parity audit checks data, not offsets)
            # must not reopen the seq gap to pre-migration replays
            applied_offset=max(cur.applied_offset, head.applied_offset),
            gc_watermark=max(cur.gc_watermark, head.gc_watermark),
            config_version=head.config_version or cur.config_version,
            num_partitions=head.num_partitions,
            schema_names=head.schema_names,
            column_renames=dict(head.column_renames),
            column_drops=list(head.column_drops),
            partitions=dict(head.partitions),
        )
        if audit_fn is not None:
            audit_fn(cand, self.lake_dir)
        self.store.publish(cand, expect_epoch=cur.epoch)
        if self._pool is not None:
            self._pool.reset()  # memtables hold pre-cutover partition state
        return cand.epoch

    def poll_changefeed(
        self, group: str, image_cols: tuple[str, ...] = ("text",)
    ) -> tuple[int | None, int, ray.data.Dataset | None]:
        """Consumer-group tail of the changefeed (Kafka-offset semantics):
        returns ``(expect, head_epoch, feed)``. ``feed`` is None when the
        group is already at the head; a group that never committed
        BOOTSTRAPS — the full current state streamed as 'insert' envelopes
        (before images null). The caller processes the feed and then calls
        ``lake.consumers.commit(group, head_epoch, expect=expect)`` —
        compare-and-set, so a crashed consumer resumes from its last
        committed epoch and a concurrent duplicate of the group loses the
        CAS instead of double-applying."""
        expect = self.consumers.get(group)
        head = self.manifest.epoch
        if expect is not None and head <= expect:
            return expect, head, None
        if expect is not None:
            return expect, head, self.changefeed_between(
                expect, head, image_cols
            )
        cols = list(image_cols)

        def to_envelopes(b: pa.Table) -> pa.Table:
            out: dict = {
                "op": pa.array(["insert"] * b.num_rows, pa.string()),
                "conv_id": b["conv_id"],
                "turn_idx": b["turn_idx"].cast(pa.int32()),
            }
            for c in cols:
                if c in b.column_names:
                    typ = b.schema.field(c).type
                    out[f"before_{c}"] = pa.nulls(b.num_rows, typ)
                    out[f"after_{c}"] = b[c]
                else:
                    out[f"before_{c}"] = pa.nulls(b.num_rows, pa.string())
                    out[f"after_{c}"] = pa.nulls(b.num_rows, pa.string())
            return pa.table(out)

        # pin the bootstrap read to the captured head epoch: a concurrent
        # writer commit between reading `head` and building the feed must
        # not leak epoch head+1 state into a feed committed as offset head
        # (the next poll would re-deliver changefeed(head, head+1) and the
        # consumer's view would double-apply those changes)
        feed = self.final_dataset(
            columns=["conv_id", "turn_idx", *cols],
            epoch=head if head >= 0 else None,  # -1 = never committed: empty
        ).map_batches(to_envelopes, batch_format="pyarrow")
        return None, head, feed

    def changefeed_between(
        self,
        from_epoch: int,
        to_epoch: int,
        image_cols: tuple[str, ...] = ("text",),
    ) -> ray.data.Dataset:
        """Row-level changefeed between two committed epochs as
        Debezium-style envelopes (op, key, before_/after_ images) — a
        DISTRIBUTED per-partition diff of the two archived manifests
        (co-partitioned file pairs; unchanged keys never leave the diff
        task). The downstream-consumer surface of the lake's history.
        Each side folds its delta stack (merge-on-read), so the diff is
        exact under ``merge_policy="delta"``; updates are detected over
        ALL payload columns null-aware, not just ``text``.
        ``image_cols`` selects which payload columns are carried as
        before_<col>/after_<col> envelope images (change DETECTION always
        covers every payload column; images are what consumers — e.g. the
        incremental index maintainer — need shipped)."""
        old_man = self.store.load_epoch(from_epoch)
        new_man = self.store.load_epoch(to_epoch)
        if old_man is None or new_man is None:
            raise ValueError(
                f"missing archived manifest for epoch {from_epoch} or {to_epoch}"
            )
        lake_dir = self.lake_dir
        old_specs = _partition_specs(old_man)
        new_specs = _partition_specs(new_man)
        pids = sorted(set(old_specs) | set(new_specs))

        def diff_pid(batch: pa.Table) -> pa.Table:
            import numpy as np

            outs = []
            for pid in batch["pid"].to_pylist():
                old = _read_folded_df(lake_dir, old_specs.get(pid))
                new = _read_folded_df(lake_dir, new_specs.get(pid))
                if old is None and new is None:
                    continue
                if old is None:
                    old = new.iloc[0:0]
                if new is None:
                    new = old.iloc[0:0]
                payload = sorted(
                    (set(old.columns) | set(new.columns))
                    - {"conv_id", "turn_idx", "seq"}
                )
                cols = ["conv_id", "turn_idx", *payload]
                old = old.reindex(columns=cols)
                new = new.reindex(columns=cols)
                m = old.merge(
                    new, on=["conv_id", "turn_idx"], how="outer",
                    suffixes=("_b", "_a"), indicator=True,
                )
                ins = m["_merge"].eq("right_only")
                dele = m["_merge"].eq("left_only")
                upd = m["_merge"].eq("both") & _payload_changed(
                    m, payload, "_b", "_a"
                )
                keep = m[ins | dele | upd]
                op = np.where(
                    keep["_merge"].eq("right_only"),
                    "insert",
                    np.where(keep["_merge"].eq("left_only"), "delete", "update"),
                )
                env = {
                    "op": op,
                    "conv_id": keep["conv_id"],
                    "turn_idx": keep["turn_idx"].astype("int32"),
                }
                for c in image_cols:
                    env[f"before_{c}"] = keep[f"{c}_b"]
                    env[f"after_{c}"] = keep[f"{c}_a"]
                outs.append(pd.DataFrame(env))
            if not outs:
                # explicit types: an empty diff block must carry the SAME
                # schema as non-empty blocks (int32 key, string images), not
                # pandas' all-object → Arrow null columns
                def _imgtype(c: str):
                    names = TRANSCRIPT_SCHEMA.names
                    return (
                        TRANSCRIPT_SCHEMA.field(c).type
                        if c in names
                        else pa.string()
                    )

                return pa.schema(
                    [("op", pa.string()), ("conv_id", pa.string()),
                     ("turn_idx", pa.int32())]
                    + [
                        (f"{p}_{c}", _imgtype(c))
                        for c in image_cols
                        for p in ("before", "after")
                    ]
                ).empty_table()
            return pa.Table.from_pandas(
                pd.concat(outs, ignore_index=True), preserve_index=False
            )

        return ray.data.from_items([{"pid": p} for p in pids]).map_batches(
            diff_pid, batch_format="pyarrow", batch_size=1
        )

    def rollback_to(self, epoch: int) -> int:
        """Savepoint restore (disaster recovery; the reference's replay
        posture — queue visibility timeout + redelivery, host.json:26 —
        generalized to whole-epoch undo): publish a NEW commit
        whose partition set and watermark are those of the archived
        ``epoch`` — the head moves forward (epoch monotone, OCC-fenced)
        while the table state moves back; the rolled-back epochs' files
        become vacuumable orphans and the lowered watermark means a
        subsequent replay of the undone seq range re-applies cleanly
        (that's the point of a rollback). Returns the new head epoch."""
        target = self.store.load_epoch(epoch)
        if target is None:
            raise ValueError(f"no archived manifest for epoch {epoch}")
        cur = self.manifest
        restored = Manifest(
            epoch=cur.epoch + 1,
            applied_offset=target.applied_offset,
            # the GC floor never rolls back: compacted tombstones cannot be
            # restored, so the fence that replaces them must survive restore
            gc_watermark=max(target.gc_watermark, cur.gc_watermark),
            num_partitions=target.num_partitions,
            schema_names=target.schema_names,
            column_renames=dict(target.column_renames),
            column_drops=list(target.column_drops),
            partitions=dict(target.partitions),
        )
        self.store.publish(restored, expect_epoch=cur.epoch)
        if self.merge_mode == "actors" and self._pool is not None:
            self._pool.reset()  # memtables are ahead of the restored state
        return restored.epoch

    def backup_to(self, dst_dir: str) -> dict:
        """Point-in-time consistent BACKUP: snapshot the lake's committed
        state (one manifest read) into ``dst_dir`` as a fully functional
        lake directory — restore is simply ``CDCLake(dst_dir)``.

        Consistency under live writers comes for free from the CoW
        layout (the reference's staged-blocks-then-commitBlockList
        posture, RouteIngestedFile.kt:470-550): data files are immutable
        and the manifest is read ONCE, so a writer committing mid-backup
        can neither tear the copied state nor be half-included. What is
        copied: every base + delta file the captured manifest references,
        lineage rows for epochs ≤ the captured epoch, consumer-group
        offsets (floored to the captured epoch so a restored consumer
        never skips uncommitted feed), and lake-config. The manifest is
        re-published into the backup via a fresh ManifestStore, so the
        fence (``applied_offset``), gc watermark, schema registry and
        column DDL all survive — a replay of already-applied shards into
        the restored lake is a fenced no-op, which is the property that
        makes the backup USABLE as a resume point. Archived history is
        NOT copied (point-in-time, not log backup): time travel in the
        restored lake starts at the captured epoch. Scope is THIS lake's
        active branch: other branches' manifest logs are not captured
        (back them up by opening the lake on that branch). The one unsafe
        concurrency is VACUUM: a vacuum racing a backup may delete a
        just-orphaned file the captured manifest still references —
        standard retention-window territory (don't vacuum files younger
        than your longest backup/read)."""
        import glob as _glob
        import json as _json
        import shutil as _shutil

        man = self.store.load_current()
        if man is None or man.epoch < 0:
            raise ValueError("nothing committed; refusing empty backup")
        os.makedirs(dst_dir, exist_ok=True)
        if os.path.exists(os.path.join(dst_dir, "lake-config.json")):
            raise ValueError(f"{dst_dir} already holds a lake")
        _shutil.copy2(
            os.path.join(self.lake_dir, "lake-config.json"),
            os.path.join(dst_dir, "lake-config.json"),
        )
        n_files = 0
        for entry in man.partitions.values():
            for rel in [entry.file] + [d["file"] for d in entry.deltas]:
                dst = os.path.join(dst_dir, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                _shutil.copy2(os.path.join(self.lake_dir, rel), dst)
                n_files += 1
        # lineage: only epochs the captured manifest covers
        sub = "lineage" if self.branch == "main" else f"lineage-{self.branch}"
        dst_lin = os.path.join(dst_dir, sub)
        os.makedirs(dst_lin, exist_ok=True)
        for f in sorted(_glob.glob(os.path.join(self.lineage.dir, "epoch-*.parquet"))):
            ep = int(os.path.basename(f)[6:-8])
            if ep <= man.epoch:
                _shutil.copy2(f, os.path.join(dst_lin, os.path.basename(f)))
        # consumer offsets, floored to the captured epoch
        csub = os.path.basename(self.consumers.dir)
        dst_con = os.path.join(dst_dir, csub)
        os.makedirs(dst_con, exist_ok=True)
        for f in _glob.glob(os.path.join(self.consumers.dir, "*.json")):
            with open(f) as fh:
                off = _json.load(fh)
            off["epoch"] = min(int(off.get("epoch", -1)), man.epoch)
            with open(os.path.join(dst_con, os.path.basename(f)), "w") as fh:
                _json.dump(off, fh)
        dst_store = ManifestStore(
            dst_dir, branch=self.branch, segment_size=self.manifest_segment_size
        )
        dst_store.publish(man, expect_epoch=None)
        return {"epoch": man.epoch, "applied_offset": man.applied_offset,
                "data_files": n_files}

    # ------------------------------------------------------------ column DDL
    _KEY_COLUMNS = frozenset(("conv_id", "turn_idx", "seq", "op"))

    def _logical_of(self, physical: str) -> str:
        return self.manifest.column_renames.get(physical, physical)

    def rename_column(self, old: str, new: str) -> int:
        """Metadata-only column RENAME (Iceberg-style name mapping): no
        data file is rewritten — the manifest records physical→logical
        and readers conform at scan time; subsequent change batches use
        the NEW name (apply_changes translates logical→physical before
        the merge). Key/plumbing columns (conv_id, turn_idx, seq, op)
        cannot rename. Published as its own OCC-fenced epoch, so the DDL
        is ordered against every data commit, branches on the archived
        manifest chain, and rolls back with rollback_to."""
        if not new.isidentifier():
            raise ValueError(f"invalid column name {new!r}")
        man = self.manifest
        renames = dict(man.column_renames)
        # resolve the LOGICAL name the caller sees back to its physical col
        inv = {v: k for k, v in renames.items()}
        phys = inv.get(old, old)
        if phys in self._KEY_COLUMNS or old in self._KEY_COLUMNS:
            raise ValueError(f"cannot rename key/plumbing column {old!r}")
        known = set(TRANSCRIPT_SCHEMA.names) | set(man.schema_names)
        if phys not in known or phys in man.column_drops:
            raise ValueError(f"unknown column {old!r}")
        logical_now = {renames.get(c, c) for c in known if c not in man.column_drops}
        if new in logical_now or new in self._KEY_COLUMNS:
            raise ValueError(f"column {new!r} already exists")
        if new in man.column_drops:
            # reusing a dropped name would resurrect its old bytes in
            # partitions never rewritten since the drop
            raise ValueError(f"column name {new!r} was dropped; pick another")
        if new == phys:
            renames.pop(phys, None)  # renamed back to its physical name
        else:
            renames[phys] = new
        new_man = Manifest(
            epoch=man.epoch + 1,
            applied_offset=man.applied_offset,
            gc_watermark=man.gc_watermark,
            config_version=man.config_version,
            num_partitions=man.num_partitions,
            schema_names=man.schema_names,
            column_renames=renames,
            column_drops=list(man.column_drops),
            partitions=dict(man.partitions),
        )
        self.store.publish(new_man, expect_epoch=man.epoch)
        return new_man.epoch

    def drop_column(self, name: str) -> int:
        """Metadata-only column DROP: hides the physical column from every
        reader (final_table / final_dataset / changefeed images are
        conformed) without touching a data file; storage written before
        the drop keeps the bytes until partitions are naturally rewritten.
        A later rename may NOT reuse the dropped logical name for a
        different physical column — re-adding a column of the same name is
        a schema evolution (new physical column), never a resurrection."""
        man = self.manifest
        inv = {v: k for k, v in man.column_renames.items()}
        phys = inv.get(name, name)
        if phys in self._KEY_COLUMNS:
            raise ValueError(f"cannot drop key/plumbing column {name!r}")
        if phys == "ts":
            raise ValueError("cannot drop ts (stable-order column)")
        known = set(TRANSCRIPT_SCHEMA.names) | set(man.schema_names)
        if phys not in known or phys in man.column_drops:
            raise ValueError(f"unknown column {name!r}")
        renames = dict(man.column_renames)
        renames.pop(phys, None)
        new_man = Manifest(
            epoch=man.epoch + 1,
            applied_offset=man.applied_offset,
            gc_watermark=man.gc_watermark,
            config_version=man.config_version,
            num_partitions=man.num_partitions,
            schema_names=man.schema_names,
            column_renames=renames,
            column_drops=sorted({*man.column_drops, phys}),
            partitions=dict(man.partitions),
        )
        self.store.publish(new_man, expect_epoch=man.epoch)
        return new_man.epoch

    def _conform_ddl_table(self, t: pa.Table, man: Manifest) -> pa.Table:
        """Apply the manifest's column DDL (drops, then physical→logical
        renames) to a physical-schema table."""
        if man.column_drops:
            t = t.drop_columns([c for c in man.column_drops if c in t.column_names])
        if man.column_renames:
            t = t.rename_columns(
                [man.column_renames.get(c, c) for c in t.column_names]
            )
        return t

    def rebase_from(self, branch_lake: "CDCLake") -> EpochResult:
        """Replay-based rebase for a DIVERGENT branch (the non-FF path):
        the branch's net change since its fork point — upserts for keys it
        added or rewrote, deletes for keys it removed — is computed as a
        DISTRIBUTED per-partition diff (branch head vs archived fork
        manifest; both sides share the partition function, so each diff
        task reads exactly two co-partitioned files) and re-applied to
        THIS branch as one normal epoch: fencing, validation, lineage and
        the two-phase commit all apply, and main-side edits since the fork
        survive unless the branch touched the same key (branch wins, LWW
        by fresh seqs — the deterministic rebase rule, documented rather
        than silently merged)."""
        import json as _json

        fork_path = os.path.join(branch_lake.store.dir, "fork.json")
        if not os.path.exists(fork_path):
            raise ValueError("branch has no recorded fork point")
        with open(fork_path) as f:
            fork = _json.load(f)
        if fork.get("from") != self.branch:
            raise ValueError(
                f"branch forked from {fork.get('from')!r}, not {self.branch!r}"
            )
        fork_man = branch_lake.store.load_epoch(fork["fork_epoch"])
        if fork_man is None:
            raise ValueError("fork manifest not archived")
        head_man = branch_lake.manifest
        lake_dir = self.lake_dir
        seq_base = self.manifest.applied_offset + 1
        key_cols = ["conv_id", "turn_idx"]

        pids = sorted(set(head_man.partitions) | set(fork_man.partitions))
        head_specs = _partition_specs(head_man)
        fork_specs = _partition_specs(fork_man)

        def diff_pid(batch: pa.Table) -> pa.Table:
            import numpy as np

            outs = []
            for pid in batch["pid"].to_pylist():
                head = _read_folded_df(lake_dir, head_specs.get(pid))
                forkt = _read_folded_df(lake_dir, fork_specs.get(pid))
                if head is None and forkt is None:
                    continue
                if head is None:
                    head = forkt.iloc[0:0]
                if forkt is None:
                    forkt = head.iloc[0:0]
                # canonical payload first so every pid block (and the empty
                # case) shares a schema; evolved columns follow sorted
                extra = sorted(
                    (set(head.columns) | set(forkt.columns))
                    - {*key_cols, "seq", "role", "text", "tool", "ts"}
                )
                payload = ["role", "text", "tool", "ts", *extra]
                cols = [*key_cols, *payload]
                head = head.reindex(columns=cols)
                forkt = forkt.reindex(columns=cols)
                m = head.merge(
                    forkt, on=key_cols, how="outer", suffixes=("", "_f"),
                    indicator=True,
                )
                # updates over ALL payload columns null-aware — a branch
                # edit that changes role/tool/ts but not text must survive
                # the rebase
                changed = m["_merge"].eq("both") & _payload_changed(
                    m, payload, "", "_f"
                )
                ups = m[m["_merge"].eq("left_only") | changed]
                dels = m[m["_merge"].eq("right_only")]
                rows = pd.DataFrame(
                    {
                        "op": np.concatenate(
                            [np.repeat("update", len(ups)),
                             np.repeat("delete", len(dels))]
                        ),
                        "conv_id": pd.concat(
                            [ups["conv_id"], dels["conv_id"]], ignore_index=True
                        ),
                        "turn_idx": pd.concat(
                            [ups["turn_idx"], dels["turn_idx"]], ignore_index=True
                        ).astype("int32"),
                        **{
                            # deletes carry the fork-side ts (tombstone
                            # event time) and null payload otherwise
                            c: pd.concat(
                                [
                                    ups[c],
                                    dels[f"{c}_f"] if c == "ts"
                                    else pd.Series(
                                        [None] * len(dels),
                                        index=dels.index,
                                        dtype=object,
                                    ),
                                ],
                                ignore_index=True,
                            )
                            for c in payload
                        },
                    }
                )
                # fresh seqs ABOVE the fence, compact: seq_base + row index
                # within this partition's diff. Seqs may repeat ACROSS
                # partitions (different keys — LWW compares seqs only within
                # a key, so that is harmless), which keeps the committed
                # watermark advance bounded by the largest per-partition
                # diff instead of a hash-range jump that would fence out all
                # subsequent normal stream seqs (round-2 ADVICE fix).
                rows.insert(
                    0, "seq", seq_base + np.arange(len(rows), dtype=np.int64)
                )
                outs.append(rows)
            if not outs:
                return pa.Table.from_pandas(
                    pd.DataFrame(
                        columns=["seq", "op", "conv_id", "turn_idx",
                                 "role", "text", "tool", "ts"]
                    ),
                    preserve_index=False,
                )
            return pa.Table.from_pandas(
                pd.concat(outs, ignore_index=True), preserve_index=False
            )

        ops = ray.data.from_items([{"pid": p} for p in pids]).map_batches(
            diff_pid, batch_format="pyarrow", batch_size=1
        )
        return self.apply_changes(ops, quarantine=False)

    def _stage_dir(self) -> str:
        sub = "_tmp" if self.branch == "main" else f"_tmp-{self.branch}"
        return os.path.join(self.lake_dir, sub)

    # -------------------------------------------------- attempt ledger
    # Poison-queue parity (reference host.json:26-27, maxDequeueCount: 6):
    # each epoch attempt is recorded durably BEFORE processing; when an
    # epoch has already failed `max_attempts` times, the next attempt
    # dead-letters every row instead of retrying forever, and the
    # watermark advances past them (a poison message never blocks the
    # queue). Entries are pruned on successful publish.
    def _attempts_path(self) -> str:
        return os.path.join(self.store.dir, "attempts.json")

    def _load_attempts(self) -> dict:
        import json

        path = self._attempts_path()
        if not os.path.exists(path):
            return {}
        with open(path) as f:
            return json.load(f)

    def _write_attempts(self, d: dict) -> None:
        import json

        path = self._attempts_path()
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(d, f)
        os.replace(tmp, path)

    def _record_attempt(self, epoch: int) -> int:
        d = self._load_attempts()
        key = str(epoch)
        d[key] = d.get(key, 0) + 1
        self._write_attempts(d)
        return d[key]

    def _prune_attempts(self, committed_epoch: int) -> None:
        d = self._load_attempts()
        kept = {k: v for k, v in d.items() if int(k) > committed_epoch}
        if kept != d:
            self._write_attempts(kept)

    def _actor_pool(self):
        if self._pool is None:
            import hashlib

            from data_exchange_routing_ray.state.merge_actors import MergeActorPool

            # the branch is part of the identity: a branch lake in actors
            # mode must NOT share main's memtables (cross-branch state
            # contamination would silently merge the two histories)
            tag = hashlib.md5(
                f"{os.path.abspath(self.lake_dir)}@{self.branch}".encode()
            ).hexdigest()[:8]
            self._pool = MergeActorPool(
                self.lake_dir, self.pool_size, name_prefix=f"cdclake-{tag}-"
            )
        return self._pool

    def close(self) -> None:
        """Tear down the merge-actor pool (if any); lake state is on disk."""
        if self._pool is not None:
            self._pool.shutdown()
            self._pool = None

    # ------------------------------------------------------------- bootstrap
    def bootstrap(self, transcripts: ray.data.Dataset, default_seq: int = 0) -> EpochResult:
        """Initial load: treat every row as an insert at ``default_seq``."""

        def to_changes(batch: pa.Table) -> pa.Table:
            if "seq" not in batch.column_names:
                batch = batch.append_column(
                    "seq", pa.array([default_seq] * batch.num_rows, pa.int64())
                )
            if "op" not in batch.column_names:
                batch = batch.append_column(
                    "op", pa.array(["insert"] * batch.num_rows, pa.string())
                )
            return batch

        changes = transcripts.map_batches(to_changes, batch_format="pyarrow")
        return self.apply_changes(changes, fence=False)

    # ---------------------------------------------------------------- epochs
    def apply_changes(
        self,
        changes: ray.data.Dataset,
        quarantine: bool = True,
        fence: bool = True,
        rebuild: bool = False,
        max_attempts: int | None = 6,
        audit_fn=None,
        trace_id: str | None = None,
        parent_span_id: str | None = None,
        config_version: str | None = None,
        reconcile: bool = True,
        _raise_gc_watermark: int | None = None,
    ) -> EpochResult:
        """Apply one epoch of change events; atomically commit; return stats.

        ``audit_fn`` enables WRITE-AUDIT-PUBLISH: called with the candidate
        (uncommitted) manifest and the lake dir AFTER all merge output is
        staged but BEFORE publish. If it raises, the epoch aborts with NO
        visible effect — readers still see the previous epoch; the staged
        files are vacuumable orphans (identical semantics to a crashed
        commit). Use ``read_manifest_table(manifest, lake_dir)`` inside the
        audit to query the candidate state.

        ``rebuild=True`` starts the epoch from an EMPTY partition set (no
        base files, no inherited entries) while preserving the epoch counter
        and watermark — the repartition/compaction path.

        ``max_attempts`` (default 6, the reference's ``maxDequeueCount``)
        bounds retries of a failing epoch: once this epoch number has failed
        that many recorded attempts, the next attempt dead-letters all its
        rows with an exact poison error instead of retrying forever (None
        disables the ledger — used by quarantine-less internal rebuilds)."""
        t0 = time.time()
        man = self.manifest
        epoch = man.epoch + 1
        # trace-context (RouteIngestedFile.kt:138-140, :203): incoming
        # trace_id/parent_span_id default "" like the reference's
        # getOrDefault; this epoch opens ONE child span (deterministic so
        # crash-retries of the same epoch report the same span) and every
        # lineage row of the epoch carries it — downstream consumers chain
        # with parent_span_id=<this span_id>.
        _trace = trace_id if trace_id is not None else ""
        _pspan = parent_span_id if parent_span_id is not None else ""
        span_id = _hashlib.sha256(
            f"{_trace}|{_pspan}|{self.branch}|{epoch}|dex-routing".encode()
        ).hexdigest()[:16]
        # config audit (S14): explicit arg > the lake's declared active
        # config > carry the previous epoch's forward (unchanged config)
        cfg_version = (
            config_version
            if config_version is not None
            else (self.config_version or man.config_version)
        )
        poison_error = None
        if max_attempts is not None and quarantine:
            n_attempt = self._record_attempt(epoch)
            if n_attempt > max_attempts:
                poison_error = (
                    f"Poison: epoch exceeded maxDequeueCount={max_attempts} "
                    f"({n_attempt - 1} failed processing attempts)"
                )
        # even with fence=False (multi-leader WAL exchange), the GC floor
        # fence holds: tombstones at/below gc_watermark are gone, so the
        # fence alone rejects stale writes below it (see gc_tombstones).
        # Self-rebuilds (repartition/compaction/GC) bypass BOTH fences:
        # they re-inject the lake's own committed rows, whose seqs may
        # legitimately sit at/below the watermark — fencing them would
        # silently destroy every live row not updated since the floor rose.
        if rebuild:
            fence_below = -(2**62)
        else:
            fence_below = man.applied_offset if fence else (
                man.gc_watermark if man.gc_watermark >= 0 else -(2**62)
            )
        P = self.num_partitions
        stage_dir = self._stage_dir()
        if rebuild:
            man = Manifest(
                epoch=man.epoch,
                applied_offset=man.applied_offset,
                gc_watermark=man.gc_watermark,
                num_partitions=P,
                schema_names=man.schema_names,
                column_renames=dict(man.column_renames),
                column_drops=list(man.column_drops),
                partitions={},
            )

        # ---- hot path: ONE fused per-row stage + ONE shuffle ----------------
        # validate → partition (invalid rows ride along as part = -1) →
        # within-batch combine, all in a single map_batches over LARGE
        # batches (combiner dedup ratio grows with batch size), then the
        # single groupby(part) exchange feeding per-partition merges.
        base_files = {pid: e.file for pid, e in man.partitions.items()}
        merge_fn = make_merge_fn(
            self.lake_dir, stage_dir, epoch, fence_below, base_files,
            base_deltas={
                pid: [d["file"] for d in e.deltas]
                for pid, e in man.partitions.items()
                if e.deltas
            },
            base_rows={pid: e.rows for pid, e in man.partitions.items()},
            policy=self.merge_policy,
            delta_max_files=self.delta_max_files,
            delta_ratio=self.delta_ratio,
            out_of_order=self.multi_leader,
        )

        if man.column_renames:
            # writers speak the LOGICAL schema after a rename; storage keeps
            # the physical names (metadata-only DDL, no file rewrite) — so
            # incoming change columns translate logical -> physical here
            _to_phys = {v: k for k, v in man.column_renames.items()}

            def _rename_to_physical(b: pa.Table) -> pa.Table:
                return b.rename_columns(
                    [_to_phys.get(c, c) for c in b.column_names]
                )

            changes = changes.map_batches(
                _rename_to_physical, batch_format="pyarrow", zero_copy_batch=True
            )
        _allowed = frozenset(man.schema_names)
        prepared = changes.map_batches(
            lambda b: prepare_batch(
                b, P, keep_quarantine=quarantine, poison_error=poison_error,
                content_tiebreak=self.multi_leader,
                schema_policy=self.schema_policy, allowed_extras=_allowed,
            ),
            batch_format="pyarrow",
            batch_size=self.combine_batch_size,
            zero_copy_batch=True,
        )
        if self.merge_mode != "groupby" and any(
            e.deltas for e in man.partitions.values()
        ):
            raise ValueError(
                "lake has uncompacted delta files; actors/exchange merge "
                "modes read base files only — compact first (merge_policy="
                "'delta' with a full-size epoch, or repartition_lake)"
            )
        if self.merge_mode == "actors":
            pool = self._actor_pool()
            prepared.map_batches(
                pool.make_dispatch_fn(), batch_format="pyarrow"
            ).count()  # drive the dispatch; ingest futures are the backpressure
            stats = pool.flush(
                epoch, fence_below, base_files, stage_dir
            )
        elif self.merge_mode == "exchange":
            from data_exchange_routing_ray.state.exchange import exchange_merge

            stats = exchange_merge(
                prepared, P, self.lake_dir, stage_dir, epoch, fence_below,
                base_files,
            )
        else:
            if self.num_salts > 1:
                # skew breaker: pre-reduce per (part, salt) so a hot key's
                # event storm is LWW-collapsed across S parallel groups before
                # the final per-partition merge (associative reduce, §4)
                S = self.num_salts
                _ml = self.multi_leader
                prepared = (
                    prepared.map_batches(
                        lambda b: add_salt_column(b, S), batch_format="pyarrow"
                    )
                    .groupby([PART_COLUMN, SALT_COLUMN])
                    .map_groups(
                        lambda g: partial_reduce_group(g, content_tiebreak=_ml),
                        batch_format="pyarrow",
                    )
                )
            stats_ds = prepared.groupby(PART_COLUMN).map_groups(
                merge_fn, batch_format="pyarrow"
            )
            stats = stats_ds.to_pandas()  # ≤ P+1 tiny rows

        # ---- commit (driver only): rename staged files, publish manifest ---
        # Order matters for abort safety: everything BEFORE publish must be
        # invisible to readers (staged/epoch-keyed orphans only); the
        # externally-visible side effects (quarantine dead-letter dir,
        # lineage rows) happen AFTER publish succeeds, so an aborted commit
        # (ConcurrentCommitError, crash) never leaves SUCCESS lineage or
        # quarantined rows for an epoch that was never committed.
        try:
            rows_quarantined = 0
            quarantine_offset = man.applied_offset
            qfile = None
            qmask = stats["partition"] == QUARANTINE_PARTITION if len(stats) else None
            if qmask is not None and qmask.any():
                qrow = stats[qmask].iloc[0]
                qfile = qrow.file
                rows_quarantined = int(qrow.row_count)
                quarantine_offset = max(quarantine_offset, int(qrow.applied_offset))
                stats = stats[~qmask].reset_index(drop=True)

            new_partitions = dict(man.partitions)
            applied_offset = quarantine_offset
            if len(stats):
                for row in stats.itertuples():
                    pid = int(row.partition)
                    if int(getattr(row, "no_change", 0) or 0):
                        # fully-fenced replay: merge skipped the rewrite;
                        # the previous manifest entry stays (and, under the
                        # segmented layout, its segment file is reused)
                        continue
                    is_delta = int(getattr(row, "is_delta", 0) or 0)
                    if is_delta:
                        if int(row.row_count) == 0:
                            continue  # fully-fenced replay: no empty deltas
                        # delta append: base entry untouched, delta stacked
                        rel = os.path.join(
                            "partitions",
                            f"delta-part-{pid:05d}-epoch-{epoch:012d}"
                            f"{self._file_tag()}.parquet",
                        )
                        dst = os.path.join(self.lake_dir, rel)
                        os.makedirs(os.path.dirname(dst), exist_ok=True)
                        os.replace(row.file, dst)
                        prev = new_partitions[pid]
                        new_partitions[pid] = PartitionEntry(
                            file=prev.file,
                            rows=prev.rows,
                            applied_offset=max(
                                prev.applied_offset, int(row.applied_offset)
                            ),
                            epoch=epoch,
                            deltas=[
                                *prev.deltas,
                                {
                                    "file": rel,
                                    "rows": int(row.row_count),
                                    "epoch": epoch,
                                },
                            ],
                        )
                        continue
                    rel = os.path.join(
                        "partitions",
                        f"part-{pid:05d}-epoch-{epoch:012d}"
                        f"{self._file_tag()}.parquet",
                    )
                    dst = os.path.join(self.lake_dir, rel)
                    os.makedirs(os.path.dirname(dst), exist_ok=True)
                    os.replace(row.file, dst)
                    new_partitions[pid] = PartitionEntry(
                        file=rel,
                        rows=int(row.row_count),
                        applied_offset=int(row.applied_offset),
                        epoch=epoch,
                        deltas=[],  # rewrite/compaction folds any stack away
                    )
                applied_offset = max(applied_offset, int(stats["applied_offset"].max()))

            # schema REGISTRY maintenance: union the evolved payload
            # columns the merge observed into the manifest, so a later
            # schema_policy='strict' lake admits exactly the committed
            # schema (groupby mode reports them via the stats frame;
            # actors/exchange modes keep the registry unchanged)
            schema_names = list(man.schema_names)
            if stats is not None and "extra_cols" in getattr(stats, "columns", ()):
                observed = {
                    c
                    for cell in stats["extra_cols"].fillna("")
                    for c in str(cell).split(",")
                    if c
                }
                schema_names = sorted(set(schema_names) | observed)
            new_man = Manifest(
                epoch=epoch,
                applied_offset=applied_offset,
                gc_watermark=(
                    man.gc_watermark
                    if _raise_gc_watermark is None
                    else max(man.gc_watermark, _raise_gc_watermark)
                ),
                config_version=cfg_version,
                num_partitions=P,
                schema_names=schema_names,
                column_renames=dict(man.column_renames),
                column_drops=list(man.column_drops),
                partitions=new_partitions,
            )
            # WRITE-AUDIT-PUBLISH: the audit sees the staged candidate state
            # (files on disk, manifest object in hand) while readers still
            # see the previous epoch; a raise here aborts publication.
            if audit_fn is not None:
                audit_fn(new_man, self.lake_dir)
            # atomic commitBlockList + optimistic single-writer fence: abort
            # if another writer published since this epoch read the manifest
            staged_epoch = epoch
            try:
                self.store.publish(new_man, expect_epoch=man.epoch)
            except ConcurrentCommitError:
                # COMMIT RECONCILIATION (Iceberg/Delta-style conflict
                # resolution): if the concurrent commit touched a DISJOINT
                # partition set and our applied seqs all sit above its new
                # fence (serial-equivalence: a re-run after it would have
                # produced byte-identical merge output), rebase our already-
                # staged entries onto the new current and retry — no
                # re-merge, no wasted epoch. Anything else re-raises.
                if audit_fn is not None or not reconcile:
                    # the audit approved a DIFFERENT candidate state; a
                    # reconciled manifest was never audited — abort instead
                    raise
                new_man = self._reconcile_publish(
                    man, new_man, epoch, stats, fenced=fence and not rebuild
                )
                epoch = new_man.epoch
                new_partitions = new_man.partitions
                applied_offset = new_man.applied_offset
                if len(stats):
                    stats = stats.assign(epoch=epoch)
                if self.merge_mode == "actors" and self._pool is not None:
                    # memtables lack the OTHER writer's committed rows;
                    # force a cold-load from the reconciled manifest
                    self._pool.reset()
            if max_attempts is not None:
                self._prune_attempts(staged_epoch)
        except BaseException:
            # the actor pool's memtables were advanced by flush(); a failed
            # publish would leave them AHEAD of the committed manifest, so a
            # later epoch could silently commit this epoch's aborted data.
            # Dropping actor state forces a cold-load from the committed
            # manifest on the next epoch (identical guarantees, just slower).
            if self.merge_mode == "actors" and self._pool is not None:
                self._pool.reset()
            raise

        # ---- post-publish effects (safe: the epoch is durably committed) ---
        q_issues: list[dict] = []
        if qfile is not None:
            qdir = os.path.join(self.lake_dir, "quarantine", f"epoch={epoch:012d}")
            if os.path.exists(qdir):
                shutil.rmtree(qdir)  # crashed attempt; dead-letter is epoch-keyed
            os.makedirs(qdir, exist_ok=True)
            qpath = os.path.join(qdir, "deadletter.parquet")
            os.replace(qfile, qpath)
            # one structured Issue per DISTINCT dead-letter error (column-
            # pruned read of one epoch's dead-letter file; Issue{level,
            # message}, PSReportEnvelope.kt:49-54)
            qerrs = pq.read_table(qpath, columns=["error"])["error"].to_pylist()
            q_issues = [
                {"level": "ERROR", "message": m}
                for m in sorted({e for e in qerrs if e})
            ]

        lineage_extra = []
        if rows_quarantined:
            # quarantine lineage row (the reference's FAILURE report stream)
            lineage_extra.append(
                {
                    "partition": QUARANTINE_PARTITION,
                    "epoch": epoch,
                    "applied_offset": quarantine_offset,
                    "row_count": rows_quarantined,
                    "changes_applied": 0,
                    "changes_fenced": 0,
                    "status": "QUARANTINED",
                    "issues": q_issues,
                }
            )
        if len(stats) or lineage_extra:
            t1 = time.time()
            cols = [
                "partition", "epoch", "applied_offset", "row_count",
                "changes_applied", "changes_fenced", "status", "issues",
            ]
            base_rows = (
                stats.assign(status="SUCCESS")
                .assign(issues=lambda d: [[] for _ in range(len(d))])[cols]
                if len(stats)
                else None
            )
            extra_rows = pd.DataFrame(lineage_extra, columns=cols) if lineage_extra else None
            lineage_rows = pd.concat(
                [df for df in (base_rows, extra_rows) if df is not None],
                ignore_index=True,
            ).assign(
                start_ts=pd.Timestamp(int(t0 * 1e6), unit="us"),
                end_ts=pd.Timestamp(int(t1 * 1e6), unit="us"),
                trace_id=_trace,
                parent_span_id=_pspan,
                span_id=span_id,
                config_version=cfg_version,
            )
            self.lineage.append_epoch(epoch, lineage_rows)

        shutil.rmtree(
            os.path.join(stage_dir, f"epoch={staged_epoch:012d}"), ignore_errors=True
        )

        return EpochResult(
            epoch=epoch,
            applied_offset=applied_offset,
            partitions_touched=len(stats),
            changes_applied=int(stats["changes_applied"].sum()) if len(stats) else 0,
            changes_fenced=int(stats["changes_fenced"].sum()) if len(stats) else 0,
            rows_quarantined=rows_quarantined,
            total_rows=sum(e.rows for e in new_partitions.values()),
            span_id=span_id,
            config_version=cfg_version,
            stats=stats,
        )

    def _reconcile_publish(
        self,
        old_man: Manifest,
        cand: Manifest,
        staged_epoch: int,
        stats,
        fenced: bool,
    ) -> Manifest:
        """Rebase an OCC-aborted commit onto the new current manifest and
        retry — WITHOUT re-running the merge (Iceberg/Delta-style conflict
        resolution; disjoint writers stop paying a full re-merge per lost
        race). Sound iff a serial re-run AFTER the rival commit would have
        produced byte-identical merge output, which requires ALL of:

        - the rival did not touch any partition this epoch rewrote or
          delta-appended (our merges read those pids' bases);
        - under ``fence=True``, our lowest applied winner seq is above the
          rival's new global fence (so the re-run would fence nothing we
          applied — winners-only is sufficient: fenced losers never affect
          LWW output); under ``fence=False`` the re-run fence is the gc
          watermark, which must be unchanged;
        - no concurrent repartition / GC / rebuild (partition count and gc
          watermark unchanged).

        Raises ConcurrentCommitError when any condition fails (caller
        re-runs the epoch, exactly the pre-reconciliation contract)."""
        touched: list[int] = []
        min_seq: int | None = None
        if stats is not None and len(stats):
            for row in stats.itertuples():
                if int(getattr(row, "no_change", 0) or 0):
                    continue  # entry not ours; cur's version is correct
                pid = int(row.partition)
                if pid == QUARANTINE_PARTITION:
                    continue
                touched.append(pid)
                ms = getattr(row, "min_seq_applied", None)
                if ms is None or ms != ms:
                    raise ConcurrentCommitError(
                        "concurrent commit; this merge mode does not report "
                        "min_seq_applied — cannot prove serial equivalence, "
                        "re-run the epoch"
                    )
                if int(row.changes_applied) > 0:
                    min_seq = (
                        int(ms) if min_seq is None else min(min_seq, int(ms))
                    )
        for _ in range(8):
            cur = self.store.load_current()
            if cur is None:
                raise ConcurrentCommitError("lake manifest disappeared")
            if (
                cur.num_partitions != cand.num_partitions
                or cur.gc_watermark != old_man.gc_watermark
                or cur.column_renames != old_man.column_renames
                or cur.column_drops != old_man.column_drops
            ):
                raise ConcurrentCommitError(
                    "concurrent repartition/GC/column-DDL — re-run the epoch"
                )
            for pid in touched:
                a = old_man.partitions.get(pid)
                b = cur.partitions.get(pid)
                if (a is None) != (b is None) or (
                    a is not None and vars(a) != vars(b)
                ):
                    raise ConcurrentCommitError(
                        f"concurrent commit touched partition {pid} — "
                        "conflicting write set, re-run the epoch"
                    )
            if fenced and min_seq is not None and min_seq <= cur.applied_offset:
                raise ConcurrentCommitError(
                    "concurrent commit advanced the fence past this epoch's "
                    "applied seqs — re-run the epoch"
                )
            e2 = cur.epoch + 1
            parts = dict(cur.partitions)
            for pid in touched:
                ent = cand.partitions[pid]
                parts[pid] = PartitionEntry(
                    file=ent.file,
                    rows=ent.rows,
                    applied_offset=ent.applied_offset,
                    # re-stamp to the PUBLISHED epoch: changed_partitions()
                    # and the lineage<->lake reconciliation key on entry.epoch
                    epoch=e2 if ent.epoch == staged_epoch else ent.epoch,
                    deltas=[
                        {**d, "epoch": e2}
                        if d.get("epoch") == staged_epoch
                        else d
                        for d in ent.deltas
                    ],
                )
            merged = Manifest(
                epoch=e2,
                applied_offset=max(cur.applied_offset, cand.applied_offset),
                gc_watermark=max(cur.gc_watermark, cand.gc_watermark),
                config_version=cand.config_version,
                num_partitions=cand.num_partitions,
                schema_names=sorted(set(cur.schema_names) | set(cand.schema_names)),
                column_renames=dict(cand.column_renames),
                column_drops=list(cand.column_drops),
                partitions=parts,
            )
            try:
                self.store.publish(merged, expect_epoch=cur.epoch)
                return merged
            except ConcurrentCommitError:
                continue  # yet another writer landed; re-check against it
        raise ConcurrentCommitError("reconcile retries exhausted — re-run")

    def merge_into(
        self,
        staging: ray.data.Dataset,
        delete_col: str = "del_flag",
        quarantine: bool = False,
    ) -> EpochResult:
        """SQL MERGE-statement semantics compiled onto the change-event
        engine (the lakehouse ``MERGE INTO`` a reference user would run
        against the routed store; the reference's closest analog is the
        idempotent overwrite-or-create upload path,
        ``fns-routing/.../RouteIngestedFile.kt:251`` + the tuple-keyed
        config match ``Common.kt:20-41`` deciding the destination):

            WHEN MATCHED AND <delete_col>      THEN DELETE
            WHEN MATCHED                       THEN UPDATE (full row, LWW)
            WHEN NOT MATCHED AND NOT delete    THEN INSERT
            (not-matched deletes are no-ops)

        ``staging`` must carry the transcript key + payload columns
        (conv_id, turn_idx, role, text, tool, ts), a ``seq`` column (used
        both for within-key staging dedup — highest seq wins, the MERGE
        "source must be unique per key" rule made deterministic — and for
        LWW once compiled), and a boolean ``delete_col``.

        Scale shape: the matched-probe never materializes the lake or the
        staging set — staging rows hash to the lake's OWN partition
        function and each per-partition group reads ONLY that partition's
        key columns from its base file (column-pruned point read), so the
        probe is one co-partitioned exchange of slim staging rows. The
        compiled ops then flow through the normal ``apply_changes`` epoch
        (validation, combiner, single shuffle, two-phase commit).
        """
        man = self.manifest
        if any(e.deltas for e in man.partitions.values()):
            raise ValueError(
                "merge_into probes base partition files only — compact the "
                "delta stack first (repartition_lake or a full-size epoch)"
            )
        base_files = {pid: e.file for pid, e in man.partitions.items()}
        lake_dir = self.lake_dir
        seq_base = man.applied_offset + 1
        P = self.num_partitions

        def probe(g: pa.Table) -> pa.Table:
            import numpy as np

            df = g.to_pandas()
            pid = int(df[PART_COLUMN].iloc[0])
            # staging dedup: one source row per key, highest seq wins
            df = (
                df.sort_values("seq", kind="stable")
                .drop_duplicates(["conv_id", "turn_idx"], keep="last")
                .reset_index(drop=True)
            )
            rel = base_files.get(pid)
            if rel is None:
                matched = np.zeros(len(df), bool)
            else:
                keys = pq.read_table(
                    os.path.join(lake_dir, rel), columns=["conv_id", "turn_idx"]
                ).to_pandas()
                idx = pd.MultiIndex.from_frame(keys)
                matched = pd.MultiIndex.from_frame(
                    df[["conv_id", "turn_idx"]]
                ).isin(idx)
            dele = df[delete_col].to_numpy(bool)
            keep = matched | ~dele  # not-matched deletes are no-ops
            df = df[keep].reset_index(drop=True)
            matched, dele = matched[keep], dele[keep]
            op = np.where(dele, "delete", np.where(matched, "update", "insert"))
            out = pd.DataFrame(
                {
                    "seq": seq_base + df["seq"].to_numpy(np.int64),
                    "op": op,
                    "conv_id": df["conv_id"],
                    "turn_idx": df["turn_idx"].astype("int32"),
                    "role": df["role"].where(~dele, None),
                    "text": df["text"].where(~dele, None),
                    "tool": df["tool"].where(~dele, None),
                    "ts": df["ts"],
                }
            )
            return pa.Table.from_pandas(out, preserve_index=False)

        ops = (
            staging.map_batches(
                lambda b: add_partition_column(b, P), batch_format="pyarrow"
            )
            .groupby(PART_COLUMN)
            .map_groups(probe, batch_format="pyarrow")
        )
        return self.apply_changes(ops, quarantine=quarantine)

    def sync_snapshot(
        self, staging: ray.data.Dataset, quarantine: bool = False
    ) -> EpochResult:
        """Full snapshot sync — SQL MERGE's ``WHEN NOT MATCHED BY SOURCE
        THEN DELETE`` composed with upserts: after this epoch the lake
        equals the staging snapshot exactly (the periodic-full-dump ingest
        shape for sources with no binlog). Staging rows upsert
        (matched → update, unmatched → insert); lake keys ABSENT from
        staging delete.

        Scale shape: staging full rows and the lake's pruned key columns
        (conv_id, turn_idx, ts — via the normal distributed merge-on-read
        scan) union through ONE co-partitioned exchange on the lake's own
        partition function; each group diffs its partition locally. The
        lake side always populates every live partition, so partitions
        with no staging rows still emit their deletes. The compiled ops
        then flow through the normal exactly-once epoch."""
        man = self.manifest
        useq = man.applied_offset + 2  # upserts outrank deletes; keys disjoint
        dseq = man.applied_offset + 1
        P = self.num_partitions
        payload = ("role", "text", "tool", "ts")

        def stage_side(b: pa.Table) -> pa.Table:
            cols = {
                "conv_id": b["conv_id"],
                "turn_idx": b["turn_idx"].cast(pa.int32()),
                **{c: b[c] for c in payload},
                "side": pa.array(
                    np.ones(b.num_rows, np.int8), pa.int8()
                ),
            }
            return add_partition_column(pa.table(cols), P)

        def lake_side(b: pa.Table) -> pa.Table:
            n = b.num_rows
            cols = {
                "conv_id": b["conv_id"],
                "turn_idx": b["turn_idx"].cast(pa.int32()),
                "role": pa.nulls(n, pa.string()),
                "text": pa.nulls(n, pa.string()),
                "tool": pa.nulls(n, pa.string()),
                "ts": b["ts"],
                "side": pa.array(np.zeros(n, np.int8), pa.int8()),
            }
            return add_partition_column(pa.table(cols), P)

        both = staging.map_batches(stage_side, batch_format="pyarrow").union(
            self.final_dataset(columns=["conv_id", "turn_idx", "ts"]).map_batches(
                lake_side, batch_format="pyarrow"
            )
        )

        def probe(g: pa.Table) -> pa.Table:
            df = g.to_pandas()
            st = df[df["side"] == 1].drop_duplicates(
                ["conv_id", "turn_idx"], keep="last"
            )
            lk = df[df["side"] == 0]
            st_idx = pd.MultiIndex.from_frame(st[["conv_id", "turn_idx"]])
            lk_idx = pd.MultiIndex.from_frame(lk[["conv_id", "turn_idx"]])
            matched = st_idx.isin(lk_idx)
            gone = lk[~lk_idx.isin(st_idx)]
            out = pd.DataFrame(
                {
                    "seq": np.concatenate(
                        [
                            np.full(len(st), useq, np.int64),
                            np.full(len(gone), dseq, np.int64),
                        ]
                    ),
                    "op": np.concatenate(
                        [
                            np.where(matched, "update", "insert"),
                            np.full(len(gone), "delete", object),
                        ]
                    ),
                    "conv_id": pd.concat(
                        [st["conv_id"], gone["conv_id"]], ignore_index=True
                    ),
                    "turn_idx": pd.concat(
                        [st["turn_idx"], gone["turn_idx"]], ignore_index=True
                    ).astype("int32"),
                    "role": pd.concat(
                        [st["role"], gone["role"]], ignore_index=True
                    ),
                    "text": pd.concat(
                        [st["text"], gone["text"]], ignore_index=True
                    ),
                    "tool": pd.concat(
                        [st["tool"], gone["tool"]], ignore_index=True
                    ),
                    "ts": pd.concat([st["ts"], gone["ts"]], ignore_index=True),
                }
            )
            return pa.Table.from_pandas(out, preserve_index=False)

        ops = both.groupby(PART_COLUMN).map_groups(probe, batch_format="pyarrow")
        return self.apply_changes(ops, quarantine=quarantine)

    def set_config_version(self, version: str | None) -> None:
        """Declare the content-hash of the ACTIVE route config (S14 config
        hot-reload audit, reference FnCacheUpdater.kt:22-52): every epoch
        committed from now on stamps it into the manifest and its lineage
        rows, so "which config routed epoch N" is answerable after the
        fact. Use ``stages.route.config_fingerprint(cfg)`` to derive it."""
        self.config_version = version

    def replay_files(
        self,
        files: list[str],
        files_per_epoch: int = 1,
        quarantine: bool = True,
        columns: list[str] | None = None,
    ) -> list[EpochResult]:
        """Replay a change log laid out as seq-ordered parquet shards.

        Resume: shards whose max(seq) ≤ the committed watermark are skipped
        without reading data (parquet column statistics only) — crash-resume
        from checkpoint per the north rule.

        Trace context: if a shard's parquet key-value metadata carries
        ``trace_id`` / ``parent_span_id`` (the analog of the reference's
        blob sourceMetadata, RouteIngestedFile.kt:138-140), the epoch's
        lineage rows propagate them; the first shard of each epoch wins.
        """
        files_per_epoch = max(1, files_per_epoch)
        results = []
        watermark = self.applied_offset
        pending = []
        for f in files:
            lo, hi = _seq_range(f)
            if hi is not None and hi <= watermark:
                continue  # fully committed; skip at file granularity
            pending.append(f)
        ncpu = int(ray.cluster_resources().get("CPU", 0)) or 32
        for i in range(0, len(pending), files_per_epoch):
            chunk = pending[i : i + files_per_epoch]
            # Block count follows shard BYTES with a CPU-aware floor:
            # 16MB blocks when data is plentiful (capped at 4×CPU — the
            # merge exchange's fixed cost scales with the block count;
            # measured: a 960-shard 96M-event epoch ran 2.2× faster at 128
            # coalesced blocks than at 960 per-file blocks), but never
            # fewer than one ≥2MB block per CPU while data allows (a
            # mid-size epoch must still parallelize the read+validate
            # stage across the cluster). A small epoch stays at one block
            # instead of fanning into the session-default ~2×-CPU count;
            # read_parquet coalesces files per read task when the override
            # is below len(files).
            nbytes = sum(os.path.getsize(f) for f in chunk)
            target = nbytes // (16 << 20)
            floor = min(ncpu, nbytes // (2 << 20))
            nblocks = int(max(1, min(4 * ncpu, max(target, floor))))
            ds = ray.data.read_parquet(
                chunk, columns=columns, override_num_blocks=nblocks
            )
            # shard-level trace context (one footer read of the first
            # shard — no data pages): RouteIngestedFile.kt:138-140
            kv = pq.read_schema(chunk[0]).metadata or {}
            results.append(self.apply_changes(
                ds,
                quarantine=quarantine,
                trace_id=(kv.get(b"trace_id") or b"").decode() or None,
                parent_span_id=(
                    kv.get(b"parent_span_id") or b""
                ).decode() or None,
            ))
        return results

    def tail(
        self,
        stream_dir: str,
        poll_interval: float = 2.0,
        max_epochs: int | None = None,
        idle_polls: int | None = None,
        quarantine: bool = True,
        files_per_epoch: int = 8,
        columns: list[str] | None = None,
    ):
        """Continuously tail a directory of seq-ordered change shards — the
        binlog-tail loop. Each poll lists ``*.parquet``, skips shards at or
        below the committed watermark (parquet stats only), applies new ones
        as epochs, and sleeps when idle. Yields each ``EpochResult`` as it
        commits, so callers can stream metrics.

        Stop conditions: ``max_epochs`` applied, or ``idle_polls``
        consecutive empty polls (None = run until externally stopped).
        Crash-safe by construction: re-running tail resumes from the
        manifest watermark.
        """
        import glob as _glob
        import time as _time

        applied = 0
        idle = 0
        while True:
            files = sorted(_glob.glob(os.path.join(stream_dir, "*.parquet")))
            results = self.replay_files(
                files,
                files_per_epoch=files_per_epoch,
                quarantine=quarantine,
                columns=columns,
            )
            if results:
                idle = 0
                for r in results:
                    applied += 1
                    yield r
                    if max_epochs is not None and applied >= max_epochs:
                        return
            else:
                idle += 1
                if idle_polls is not None and idle >= idle_polls:
                    return
                _time.sleep(poll_interval)

    def tail_debezium(
        self,
        stream_dir: str,
        poll_interval: float = 2.0,
        max_epochs: int | None = None,
        idle_polls: int | None = None,
        quarantine: bool = True,
        files_per_epoch: int = 8,
    ):
        """Follow an EXTERNAL Debezium change feed end-to-end: tail a
        directory of Debezium-envelope JSONL shards (the de-facto
        binlog-to-JSON contract any Debezium-fronted database emits) and
        apply each batch of new shards as a committed epoch. Yields each
        ``EpochResult`` like ``tail``.

        Resume/exactly-once: JSONL carries no parquet statistics, so
        processed shard NAMES are checkpointed in a ledger next to the
        manifest log (the Kafka-Connect offsets analog), written only
        AFTER the epoch commits. A crash between commit and ledger write
        re-reads at most one shard batch, whose rows the seq fence then
        drops as no-ops — exactly-once is preserved by the fence, the
        ledger only saves the re-read. Shards must be immutable once
        visible (write-then-rename, the standard log-shipping contract).

        Malformed lines / unknown op codes ride the parser's ``error``
        column into quarantine (``sources.parse_debezium_lines``)."""
        import glob as _glob
        import json as _json
        import time as _time

        from data_exchange_routing_ray.sources import read_debezium_jsonl

        ledger = os.path.join(self.store.dir, "debezium-tail.json")
        done: set[str] = set()
        if os.path.exists(ledger):
            with open(ledger) as f:
                done = set(_json.load(f).get("files", []))
        applied = 0
        idle = 0
        while True:
            files = [
                f
                for f in sorted(
                    _glob.glob(os.path.join(stream_dir, "*.jsonl"))
                )
                if os.path.basename(f) not in done
            ]
            if files:
                idle = 0
                for i in range(0, len(files), max(1, files_per_epoch)):
                    chunk = files[i : i + max(1, files_per_epoch)]
                    r = self.apply_changes(
                        read_debezium_jsonl(chunk), quarantine=quarantine
                    )
                    done.update(os.path.basename(f) for f in chunk)
                    tmp = ledger + ".tmp"
                    with open(tmp, "w") as f:
                        _json.dump({"files": sorted(done)}, f)
                    os.replace(tmp, ledger)
                    applied += 1
                    yield r
                    if max_epochs is not None and applied >= max_epochs:
                        return
            else:
                idle += 1
                if idle_polls is not None and idle >= idle_polls:
                    return
                _time.sleep(poll_interval)

    def replicate_from(
        self,
        source: "CDCLake",
        group: str | None = None,
        image_cols: tuple[str, ...] | None = None,
        max_polls: int | None = None,
    ) -> list[EpochResult]:
        """Cascaded lake-to-lake replication (a follower lake tailing a
        leader's changefeed — the multi-region read-replica / downstream-
        lake shape): each poll drains the leader's epoch diff through the
        consumer-group API (``poll_changefeed``), applies it here as ONE
        follower epoch with ``seq = leader head epoch``, then commits the
        consumer offset CAS-style.

        Exactly-once: the offset commit happens AFTER the follower commit;
        a crash in between re-polls the same diff, whose rows re-arrive at
        the same seq and are fenced to a no-op before the offset finally
        advances. A concurrent duplicate follower loses the offset CAS.
        ``seq = head`` is sound because a changefeed diff carries at most
        one change per key (it diffs two committed states), and heads are
        strictly monotone — LWW order across polls is the leader's commit
        order. The follower must take writes ONLY via replication (its
        seq space is the leader's epoch counter).

        100 TB shape: each poll moves O(changed keys) envelope rows
        through the follower's normal one-exchange epoch; full state is
        only streamed once, at bootstrap. Returns the follower
        ``EpochResult`` per poll (empty list = already caught up)."""
        if self.multi_leader:
            raise ValueError(
                "replicate_from requires a single-leader follower: a "
                "multi-leader lake's seq space is the cross-site WAL's, "
                "and the replica's seq=epoch counter would collide with it"
            )
        group = group or f"replica:{self.branch}:{self.lake_dir}"
        if image_cols is None:
            # default to the leader's FULL payload surface: the core
            # transcript columns plus every evolved column committed to
            # the leader's schema registry — an evolved lake replicates
            # wholesale, not just the round-1 columns
            image_cols = (
                "role", "text", "tool", "ts",
                *sorted(source.manifest.schema_names),
            )
        cols = tuple(dict.fromkeys(image_cols))
        results: list[EpochResult] = []
        polls = 0
        while max_polls is None or polls < max_polls:
            polls += 1
            expect, head, feed = source.poll_changefeed(group, image_cols=cols)
            if feed is None:
                break
            seq = int(head)

            def to_changes(b: pa.Table) -> pa.Table:
                out: dict = {
                    "seq": pa.array([seq] * b.num_rows, pa.int64()),
                    "op": b["op"],
                    "conv_id": b["conv_id"],
                    "turn_idx": b["turn_idx"].cast(pa.int32()),
                }
                for c in cols:
                    if c == "ts":
                        # delete envelopes carry a null after-image; the
                        # validator (rightly) demands a ts on every change
                        # row, so deletes inherit the before-image's ts
                        out[c] = pc.coalesce(b["after_ts"], b["before_ts"])
                    else:
                        out[c] = b[f"after_{c}"]
                return pa.table(out)

            res = self.apply_changes(
                feed.map_batches(to_changes, batch_format="pyarrow"),
                quarantine=False,
            )
            source.consumers.commit(group, head, expect=expect)
            results.append(res)
        # column DDL is metadata-only on the leader, so the changefeed
        # carries no trace of it (the physical files are untouched): adopt
        # the leader's current name mapping here or the replica would show
        # the OLD logical schema forever while bytes stay converged
        src_man = source.manifest
        mine = self.manifest
        if mine.epoch >= 0 and (
            src_man.column_renames != mine.column_renames
            or src_man.column_drops != mine.column_drops
        ):
            self._adopt_column_ddl(src_man)
        return results

    def _adopt_column_ddl(self, src_man: Manifest) -> int:
        """Metadata-only commit replacing this lake's column mapping with
        ``src_man``'s (replication DDL propagation)."""
        man = self.manifest
        new_man = Manifest(
            epoch=man.epoch + 1,
            applied_offset=man.applied_offset,
            gc_watermark=man.gc_watermark,
            config_version=man.config_version,
            num_partitions=man.num_partitions,
            schema_names=man.schema_names,
            column_renames=dict(src_man.column_renames),
            column_drops=list(src_man.column_drops),
            partitions=dict(man.partitions),
        )
        self.store.publish(new_man, expect_epoch=man.epoch)
        return new_man.epoch

    def ship_changefeed(
        self,
        out_dir: str,
        group: str = "wal-shipper",
        image_cols: tuple[str, ...] = ("role", "text", "tool", "ts"),
    ) -> list[str]:
        """Outbound WAL shipping: export each newly committed epoch's
        changefeed as ONE seq-ordered Debezium JSONL shard under
        ``out_dir`` (WAL-segment naming: zero-padded epoch prefix), so any
        Debezium consumer — including another lake's ``tail_debezium`` —
        can follow this lake. The inverse of ``read_debezium_jsonl``.

        Incremental + exactly-once: a consumer-group offset tracks the
        last shipped epoch (CAS-committed AFTER the shard lands, so a
        crash re-ships at most one epoch whose shard write is an
        idempotent replace). Envelope ``source.sequence`` is the commit
        epoch — the downstream tail's seq fence then reproduces this
        lake's commit order. Deletes ship the before image.

        Streaming: each epoch's diff is written via ``iter_batches`` —
        the driver holds one batch at a time. Returns the shard paths
        written this call."""
        import json as _json

        from data_exchange_routing_ray.sources import to_debezium_envelope

        os.makedirs(out_dir, exist_ok=True)
        expect = self.consumers.get(group)
        head = self.manifest.epoch
        if head < 0:
            return []
        start = 0 if expect is None else expect + 1
        written: list[str] = []
        cols = tuple(image_cols)
        prev = expect
        for e in range(start, head + 1):
            if e == 0 or self.store.load_epoch(e - 1) is None:
                # epoch 0 (or pre-archive history): ship the full state
                feed = self.final_dataset(
                    columns=["conv_id", "turn_idx", *cols], epoch=e
                ).map_batches(
                    lambda b: pa.table({
                        "op": pa.array(["insert"] * b.num_rows),
                        "conv_id": b["conv_id"],
                        "turn_idx": b["turn_idx"].cast(pa.int32()),
                        **{
                            f"after_{c}": (
                                b[c]
                                if c in b.column_names
                                else pa.nulls(b.num_rows, pa.string())
                            )
                            for c in cols
                        },
                        **{
                            f"before_{c}": pa.nulls(
                                b.num_rows,
                                b.schema.field(c).type
                                if c in b.column_names
                                else pa.string(),
                            )
                            for c in cols
                        },
                    }),
                    batch_format="pyarrow",
                )
            else:
                feed = self.changefeed_between(e - 1, e, image_cols=cols)
            path = os.path.join(out_dir, f"wal-{e:012d}.jsonl")
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                for b in feed.iter_batches(
                    batch_size=8192, batch_format="pyarrow"
                ):
                    ops = b["op"].to_pylist()
                    data = {
                        c: (
                            pc.cast(b[f"after_{c}"], pa.int64()).to_pylist()
                            if c == "ts"
                            else b[f"after_{c}"].to_pylist()
                        )
                        for c in cols
                    }
                    bdata = {
                        c: (
                            pc.cast(b[f"before_{c}"], pa.int64()).to_pylist()
                            if c == "ts"
                            else b[f"before_{c}"].to_pylist()
                        )
                        for c in cols
                    }
                    convs = b["conv_id"].to_pylist()
                    turns = b["turn_idx"].to_pylist()
                    lines = []
                    for i, op in enumerate(ops):
                        src = bdata if op == "delete" else data
                        row = {c: src[c][i] for c in cols}
                        row["conv_id"] = convs[i]
                        row["turn_idx"] = int(turns[i])
                        lines.append(_json.dumps(
                            to_debezium_envelope(row, op, e), default=str
                        ))
                    if lines:
                        f.write("\n".join(lines) + "\n")
            os.replace(tmp, path)
            written.append(path)
            self.consumers.commit(group, e, expect=prev)
            prev = e
        return written

    # --------------------------------------------------------------- readers
    def manifest_at(self, epoch: int) -> Manifest:
        """Time travel: the manifest as of a committed epoch (manifests are
        archived per epoch at publish time — the Delta-style log)."""
        m = self.store.load_epoch(epoch)
        if m is None:
            raise ValueError(f"no committed manifest for epoch {epoch}")
        return m

    def epoch_as_of(self, ts_us: int) -> int:
        """TIMESTAMP AS OF resolution (Delta Lake's wall-clock time
        travel): the highest committed epoch whose commit time — the max
        lineage ``end_ts`` over that epoch's per-partition report rows —
        is at or before ``ts_us`` (µs since the Unix epoch). The resolved
        epoch feeds ``manifest_at`` / ``final_table`` / ``final_dataset``
        / ``changefeed_between`` directly. Lineage is written at commit
        time only after a successful publish, so an aborted epoch can
        never resolve."""
        lin = self.lineage.read_all()
        if lin.num_rows == 0:
            raise ValueError("no committed epochs with lineage to resolve")
        import numpy as np

        ep = lin["epoch"].to_numpy(zero_copy_only=False).astype(np.int64)
        end = (
            lin["end_ts"]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        # commit time of an epoch = the last partition report it wrote;
        # accumulate-max over epoch order guards against clock skew making
        # a later epoch look earlier than its predecessor
        uniq, inv = np.unique(ep, return_inverse=True)
        mx = np.full(len(uniq), -(2**62), np.int64)
        np.maximum.at(mx, inv, end)
        commit_us = np.maximum.accumulate(mx)
        ok = uniq[commit_us <= ts_us]
        if ok.size == 0:
            raise ValueError(
                f"no epoch committed at or before ts={ts_us}µs "
                f"(earliest commit {int(commit_us[0])}µs)"
            )
        return int(ok.max())

    def final_dataset_raw(self, epoch: int | None = None) -> ray.data.Dataset:
        """Raw committed STORAGE — tombstones and plumbing columns (op, seq)
        included. For maintenance epochs (``gc_tombstones``) that operate on
        storage-level rows, not live state. Requires a compacted lake;
        ``multi_leader`` lakes are rewrite-policy by construction, so the
        check never fires on the intended caller."""
        man = self.manifest if epoch is None else self.manifest_at(epoch)
        if any(e.deltas for e in man.partitions.values()):
            raise ValueError(
                "final_dataset_raw requires a compacted lake (no delta stacks)"
            )
        files = self.store.data_files(man)
        if not files:
            return ray.data.from_arrow(TRANSCRIPT_SCHEMA.empty_table())
        return ray.data.read_parquet(files)

    def final_dataset(
        self, columns: list[str] | None = None, epoch: int | None = None
    ) -> ray.data.Dataset:
        man = self.manifest if epoch is None else self.manifest_at(epoch)
        if man.column_renames or man.column_drops:
            # column DDL: translate requested LOGICAL columns to physical
            # for the pruned scan, conform each batch on the way out
            inv = {v: k for k, v in man.column_renames.items()}
            dropped = set(man.column_drops)
            if columns:
                bad = [
                    c for c in columns
                    if inv.get(c, c) in dropped
                    or (c in man.column_renames and c not in inv)
                ]
                if bad:
                    raise ValueError(f"unknown or dropped column(s) {bad}")
                phys_cols = [inv.get(c, c) for c in columns]
            else:
                phys_cols = None
            ds = self._final_dataset_physical(phys_cols, man)
            conform = self._conform_ddl_table
            out = ds.map_batches(
                lambda b: conform(b, man), batch_format="pyarrow",
                zero_copy_batch=True,
            )
            return out
        return self._final_dataset_physical(columns, man)

    def _final_dataset_physical(
        self, columns: list[str] | None, man: Manifest
    ) -> ray.data.Dataset:
        files = self.store.data_files(man)
        if not files:
            schema = TRANSCRIPT_SCHEMA
            return ray.data.from_arrow(schema.empty_table())
        # evolved lakes: partitions untouched since a schema evolution lack
        # the evolved columns on disk; read under the UNION schema (footer
        # reads only) so they backfill null instead of failing the scan
        read_schema = None
        if man.schema_names:
            read_schema = pa.unify_schemas(
                [pq.read_schema(f) for f in files],
                promote_options="permissive",
            )
        if read_schema is None and not any(
            e.deltas for e in man.partitions.values()
        ):
            if self.multi_leader:
                # tombstones are storage, not state: read op, filter, drop
                rcols = (
                    list(dict.fromkeys([*columns, "op"])) if columns else None
                )

                def drop_tombstones(b: pa.Table) -> pa.Table:
                    if "op" in b.column_names:
                        b = b.filter(
                            pc.not_equal(b["op"], pa.scalar("delete"))
                        ).drop_columns(["op"])
                    if columns:
                        b = b.select([c for c in columns if c in b.column_names])
                    return b

                return ray.data.read_parquet(files, columns=rcols).map_batches(
                    drop_tombstones, batch_format="pyarrow"
                )
            return ray.data.read_parquet(files, columns=columns)
        # merge-on-read (delta policy) AND evolved lakes: one task per
        # partition folds base+deltas — distributed, never a driver
        # materialization. Evolved lakes route here because column
        # selection can't push into a scan over files that predate the
        # evolution; each partition conforms to the UNION schema (null
        # backfill) inside its own task instead.
        from data_exchange_routing_ray.stages.upsert import fold_deltas

        lake_dir = self.lake_dir
        ml = self.multi_leader
        types = (
            {f.name: f.type for f in read_schema}
            if read_schema is not None
            else None
        )
        items = [
            {"base": e.file, "deltas": [d["file"] for d in e.deltas]}
            for _, e in sorted(man.partitions.items())
        ]

        def fold(batch: pa.Table) -> pa.Table:
            outs = []
            for i in range(batch.num_rows):
                t = pq.read_table(
                    os.path.join(lake_dir, batch["base"][i].as_py())
                )
                drels = batch["deltas"][i].as_py() or []
                if drels:
                    t = fold_deltas(
                        t,
                        [
                            pq.read_table(os.path.join(lake_dir, r))
                            for r in drels
                        ],
                    )
                if ml and "op" in t.column_names:
                    t = t.filter(
                        pc.not_equal(t["op"], pa.scalar("delete"))
                    ).drop_columns(["op"])
                if types is not None:
                    want = columns or [n for n in types if n != "op"]
                    t = pa.table({
                        c: (
                            t[c]
                            if c in t.column_names
                            else pa.nulls(t.num_rows, types[c])
                        )
                        for c in want
                        if c in types or c in t.column_names
                    })
                elif columns:
                    t = t.select([c for c in columns if c in t.column_names])
                outs.append(t)
            return pa.concat_tables(outs, promote_options="permissive")

        return ray.data.from_items(items).map_batches(
            fold, batch_size=1, batch_format="pyarrow"
        )

    def repartition_lake(self, new_num_partitions: int) -> "EpochResult":
        """Compaction/re-partitioning: rewrite the lake into a different
        partition count as one epoch (manifest swap is the atomic commit;
        old files become vacuumable). Needed when key cardinality outgrows
        the original P. Rows re-enter as inserts carrying their seq, so
        LWW state is preserved exactly.

        Multi-leader lakes repartition the raw STORAGE, not the live view:
        tombstones re-enter as op='delete' rows (with their seqs) so they
        survive the rewrite — dropping them would let a stale cross-site
        insert below a dropped tombstone's seq resurrect the key, with no
        gc_watermark floor to catch it (that floor only rises via
        ``gc_tombstones``)."""
        if self.multi_leader:
            current = self.final_dataset_raw()  # op + seq: tombstones ride
        else:
            current = self.final_dataset()  # includes seq column
        old_p = self.num_partitions
        self.num_partitions = new_num_partitions
        if self._pool is not None:
            self._pool.reset()  # held tables are keyed by the OLD pid space

        def as_changes(b: pa.Table) -> pa.Table:
            # re-enter as UPDATES: already-validated lake rows may carry a
            # legitimately-null payload (an update that nulled it), which
            # insert validation would quarantine — silent data loss
            if "op" not in b.column_names:
                b = b.append_column("op", pa.array(["update"] * b.num_rows))
            return b

        try:
            return self.apply_changes(
                current.map_batches(as_changes, batch_format="pyarrow"),
                quarantine=False,
                fence=False,
                rebuild=True,
            )
        except BaseException:
            self.num_partitions = old_p
            raise

    def final_table(self, with_seq: bool = False, epoch: int | None = None) -> pa.Table:
        """Materialized final state (small lakes / tests only), stable order."""
        man = self.manifest if epoch is None else self.manifest_at(epoch)
        files = self.store.data_files(man)
        if not files:
            return TRANSCRIPT_SCHEMA.empty_table()
        from data_exchange_routing_ray.stages.upsert import fold_deltas

        tables = []
        for _, e in sorted(man.partitions.items()):
            t = pq.read_table(os.path.join(self.lake_dir, e.file))
            if e.deltas:
                t = fold_deltas(
                    t,
                    [
                        pq.read_table(os.path.join(self.lake_dir, d["file"]))
                        for d in e.deltas
                    ],
                )
            tables.append(t)
        out = pa.concat_tables(tables, promote_options="permissive")
        if "op" in out.column_names:  # multi_leader tombstones
            out = out.filter(
                pc.not_equal(out["op"], pa.scalar("delete"))
            ).drop_columns(["op"])
        out = out.sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending"), ("ts", "ascending")]
        )
        out = self._conform_ddl_table(out, man)  # column DDL (rename/drop)
        if not with_seq and "seq" in out.column_names:
            out = out.drop_columns(["seq"])
        return out

    def quarantine_table(self) -> pa.Table | None:
        qdir = os.path.join(self.lake_dir, "quarantine")
        if not os.path.exists(qdir):
            return None
        ds = pads.dataset(qdir, format="parquet")
        return ds.to_table()

    def requeue_quarantined(
        self,
        epoch: int | None = None,
        error: str | None = None,
        op_override: str | None = None,
        quarantine: bool = True,
    ) -> EpochResult | None:
        """Dead-letter REDELIVERY (the operational requeue loop, reference
        maxDequeueCount semantics): quarantined rows re-enter as a new
        epoch with seq RE-BASED above the committed watermark — like a
        real queue redelivery they get a new offset, because replaying the
        raw seq below the watermark would be fenced (or worse, resurrect
        keys deleted since). Relative LWW order among the requeued rows is
        preserved (one common shift). Filters: ``epoch`` = one dead-letter
        epoch only; ``error`` = one exact error class; ``op_override``
        repairs a bad-op class before re-validation (rows still invalid
        after repair simply dead-letter again under the new epoch).

        Redelivery CONSUMES the message: the source dead-letter files move
        to ``quarantine-requeued/`` after the new epoch commits, so a
        second requeue run doesn't double-deliver. Returns the new
        ``EpochResult`` (None when nothing matches)."""
        qroot = os.path.join(self.lake_dir, "quarantine")
        if not os.path.exists(qroot):
            return None
        subdirs = sorted(
            d for d in os.listdir(qroot)
            if d.startswith("epoch=")
            and (epoch is None or int(d.split("=")[1]) == epoch)
        )
        if not subdirs:
            return None
        import glob as _glob

        qfiles = [
            f
            for d in subdirs
            for f in sorted(
                _glob.glob(os.path.join(qroot, d, "*.parquet"))
            )
        ]
        if not qfiles:
            return None
        qt = pads.dataset(qfiles, format="parquet").to_table()
        if error is not None:
            qt = qt.filter(pc.equal(qt["error"], pa.scalar(error)))
        if qt.num_rows == 0:
            return None
        qt = qt.drop_columns(["error"])
        if op_override is not None:
            qt = qt.set_column(
                qt.schema.get_field_index("op"),
                "op",
                pa.array([op_override] * qt.num_rows, pa.string()),
            )
        # rebase: one common shift puts every requeued seq above the
        # watermark while preserving their relative order
        lo = pc.min(qt["seq"]).as_py()
        shift = self.applied_offset + 1 - int(lo if lo is not None else 0)
        if shift > 0:
            qt = qt.set_column(
                qt.schema.get_field_index("seq"),
                "seq",
                pc.add(qt["seq"], pa.scalar(shift, pa.int64())),
            )
        res = self.apply_changes(
            ray.data.from_arrow(qt), quarantine=quarantine
        )
        done_root = os.path.join(self.lake_dir, "quarantine-requeued")
        os.makedirs(done_root, exist_ok=True)
        for d in subdirs:
            if error is not None:
                # class-filtered requeue: split the source file — the
                # consumed class archives to quarantine-requeued/ (audit
                # trail), the rest stays live for later requeues
                src = pads.dataset(
                    os.path.join(qroot, d), format="parquet"
                ).to_table()
                eq = pc.equal(src["error"], pa.scalar(error))
                consumed = src.filter(eq)
                rest = src.filter(pc.invert(eq))
                if consumed.num_rows:
                    os.makedirs(os.path.join(done_root, d), exist_ok=True)
                    tag = _hashlib.md5(error.encode()).hexdigest()[:8]
                    pq.write_table(
                        consumed,
                        os.path.join(
                            done_root, d, f"deadletter-{tag}.parquet"
                        ),
                    )
                shutil.rmtree(os.path.join(qroot, d))
                if rest.num_rows:
                    os.makedirs(os.path.join(qroot, d), exist_ok=True)
                    pq.write_table(
                        rest,
                        os.path.join(qroot, d, "deadletter.parquet"),
                    )
            else:
                dst = os.path.join(done_root, d)
                if os.path.exists(dst):
                    shutil.rmtree(dst)
                os.replace(os.path.join(qroot, d), dst)
        return res

    def changed_partitions(self, since_epoch: int) -> list[int]:
        """Partitions rewritten or delta-appended AFTER ``since_epoch`` —
        a manifest-only diff (no data read), the planning step of an
        incremental export/backup. A partition untouched since the
        baseline epoch never appears, however large the lake."""
        return sorted(
            pid
            for pid, e in self.manifest.partitions.items()
            if e.epoch > since_epoch
            or any(d["epoch"] > since_epoch for d in e.deltas)
        )

    def export_incremental(self, since_epoch: int, out_dir: str) -> int:
        """Incremental export: copy the CURRENT state of every partition
        changed since ``since_epoch`` into ``out_dir`` (one parquet per
        partition, delta stacks folded). Unchanged partitions cost zero
        bytes — the incremental-backup contract. Returns rows exported."""
        from data_exchange_routing_ray.stages.upsert import fold_deltas

        os.makedirs(out_dir, exist_ok=True)
        man = self.manifest
        total = 0
        for pid in self.changed_partitions(since_epoch):
            e = man.partitions[pid]
            t = pq.read_table(os.path.join(self.lake_dir, e.file))
            if e.deltas:
                t = fold_deltas(
                    t,
                    [
                        pq.read_table(os.path.join(self.lake_dir, d["file"]))
                        for d in e.deltas
                    ],
                )
            pq.write_table(
                t, os.path.join(out_dir, f"part-{pid:05d}.parquet")
            )
            total += t.num_rows
        return total

    def fsck(self, deep: bool = False) -> dict:
        """Lake integrity check (the restore-side complement of
        ``backup_to``): verifies that every base + delta file the CURRENT
        manifest references exists, that each base file's parquet-footer
        row count matches the manifest entry's ``rows``, and that no
        partition's parquet-stats max(seq) exceeds the global fence
        (``applied_offset``) — a row above the fence could be silently
        re-fenced out of a future rebuild. ``deep=True`` additionally
        re-reads every file end-to-end (checksum-at-rest check: a
        truncated or bit-rotted page fails the parquet decoder).

        Metadata-only by default: cost is one footer read per file, no
        data scan, driver-side (file count = |partitions| + deltas).
        Returns ``{"ok": bool, "files": n, "errors": [...]}`` and never
        raises on a finding — fsck reports, callers decide."""
        import pyarrow.parquet as pq

        man = self.manifest
        errors: list[str] = []
        n_files = 0
        for pid, entry in sorted(man.partitions.items()):
            todo = [(entry.file, entry.rows)] + [
                (d["file"], d.get("rows")) for d in entry.deltas
            ]
            for rel, rows in todo:
                n_files += 1
                path = os.path.join(self.lake_dir, rel)
                if not os.path.exists(path):
                    errors.append(f"p{pid}: missing file {rel}")
                    continue
                try:
                    meta = pq.ParquetFile(path)
                    got = meta.metadata.num_rows
                    if rows is not None and got != rows:
                        errors.append(
                            f"p{pid}: {rel} has {got} rows, manifest says {rows}"
                        )
                    sidx = meta.schema_arrow.get_field_index("seq")
                    stats = [
                        meta.metadata.row_group(g).column(sidx).statistics
                        for g in range(meta.metadata.num_row_groups)
                    ] if sidx >= 0 and meta.metadata.num_rows else []
                    # skip the fence check if ANY row group lacks min/max
                    # stats (has_min_max=False yields .max=None and a
                    # TypeError here would misreport the file as unreadable)
                    if stats and all(
                        s is not None and s.has_min_max for s in stats
                    ):
                        mx = max(s.max for s in stats)
                        if int(mx) > man.applied_offset:
                            errors.append(
                                f"p{pid}: {rel} max seq {mx} above fence "
                                f"{man.applied_offset}"
                            )
                    if deep:
                        for g in range(meta.metadata.num_row_groups):
                            meta.read_row_group(g)
                except Exception as e:  # corrupt footer/page
                    errors.append(f"p{pid}: {rel} unreadable: {e}")
        return {"ok": not errors, "epoch": man.epoch, "files": n_files,
                "errors": errors}

    def vacuum(self, retain_epochs: int = 0) -> int:
        """Delete partition files not referenced by ANY branch's current
        manifest (a zero-copy branch shares main's base files, so vacuum
        considers every manifests[-<branch>]/ log before declaring a file
        orphaned).

        ``retain_epochs > 0`` adds a TIME-TRAVEL RETENTION WINDOW
        (Delta-VACUUM semantics): files referenced by a branch's archived
        manifests within the last ``retain_epochs`` epochs are also kept,
        so ``final_table(epoch=...)`` / ``rollback_to`` keep working
        inside the window; reads OUTSIDE the window fail loudly on the
        missing file (the archived manifest metadata itself is never
        deleted — it is tiny and keeps the lineage auditable)."""

        def _refs(man: Manifest, st: ManifestStore) -> set[str]:
            out = {os.path.abspath(p) for p in st.data_files(man)}
            out |= {
                os.path.abspath(os.path.join(self.lake_dir, d["file"]))
                for e in man.partitions.values()
                for d in e.deltas
            }
            return out

        live: set[str] = set()
        for sub in os.listdir(self.lake_dir):
            if sub != "manifests" and not sub.startswith("manifests-"):
                continue
            branch = "main" if sub == "manifests" else sub[len("manifests-"):]
            st = ManifestStore(self.lake_dir, branch=branch)
            man = st.load_current()
            if man is None:
                continue
            live |= _refs(man, st)
            if retain_epochs > 0:
                horizon = man.epoch - retain_epochs + 1
                for name in os.listdir(st.dir):
                    if not (name.startswith("manifest-") and name.endswith(".json")):
                        continue
                    try:
                        ep = int(name[len("manifest-"):-len(".json")])
                    except ValueError:
                        continue
                    if horizon <= ep < man.epoch:
                        arch = st.load_epoch(ep)
                        if arch is not None:
                            live |= _refs(arch, st)
        pdir = os.path.join(self.lake_dir, "partitions")
        removed = 0
        if os.path.exists(pdir):
            for name in os.listdir(pdir):
                path = os.path.abspath(os.path.join(pdir, name))
                if path not in live:
                    os.remove(path)
                    removed += 1
        return removed


def read_manifest_table(manifest: Manifest, lake_dir: str) -> pa.Table:
    """Materialize the state a manifest DESCRIBES, committed or not — the
    write-audit-publish reader: an ``audit_fn`` passed to ``apply_changes``
    uses this to query the staged candidate epoch before it becomes
    visible. Folds any delta stacks exactly like ``final_table``."""
    from data_exchange_routing_ray.stages.upsert import fold_deltas

    if not manifest.partitions:
        return TRANSCRIPT_SCHEMA.empty_table()
    tables = []
    for _, e in sorted(manifest.partitions.items()):
        t = pq.read_table(os.path.join(lake_dir, e.file))
        if e.deltas:
            t = fold_deltas(
                t,
                [
                    pq.read_table(os.path.join(lake_dir, d["file"]))
                    for d in e.deltas
                ],
            )
        tables.append(t)
    return pa.concat_tables(tables, promote_options="permissive")


def _seq_range(parquet_file: str) -> tuple[int | None, int | None]:
    """(min, max) of the seq column from parquet row-group statistics."""
    try:
        meta = pq.ParquetFile(parquet_file).metadata
        idx = None
        for i in range(meta.num_columns):
            if meta.row_group(0).column(i).path_in_schema == "seq":
                idx = i
                break
        if idx is None:
            return None, None
        lo, hi = None, None
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                return None, None
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        return lo, hi
    except Exception:
        return None, None


def gc_tombstones(lake: "CDCLake", sites_min_applied_offset: int) -> "EpochResult":
    """Tombstone GC for a ``multi_leader`` lake (the Cassandra gc_grace
    problem, solved with offsets instead of wall time): a tombstone exists
    only to beat a STALE write with a lower seq; once every replication
    site's applied-offset watermark has passed the tombstone's seq, any
    future arrival below it is dropped by the normal seq fence — the
    tombstone is dead weight and can be compacted away.

    ``sites_min_applied_offset`` = min over all sites' committed
    ``applied_offset`` (the cross-site anti-entropy watermark, gossiped
    out-of-band at deployment scale). Tombstones with seq <= that value
    are dropped by a rebuild epoch (normal OCC-fenced commit; old files
    stay archived for time travel). Returns the rebuild's EpochResult.

    Safety is asserted by ``test_tombstone_gc_safety``: a stale insert
    replayed AFTER the GC converges identically because the fence —
    not the tombstone — now rejects it."""
    if not lake.multi_leader:
        raise ValueError("gc_tombstones requires a multi_leader lake")
    watermark = int(sites_min_applied_offset)
    if watermark > lake.manifest.applied_offset:
        raise ValueError(
            "GC watermark cannot exceed this site's own applied offset"
        )

    current = lake.final_dataset_raw()
    # defense in depth (lake-config.json lost / hand-edited): multi-leader
    # storage ALWAYS carries 'op'; raw rows without it would fail
    # ERR_BAD_OP validation in the rebuild and be silently dropped
    if lake.manifest.partitions and "op" not in current.schema().names:
        raise ValueError(
            "gc_tombstones: raw storage carries no 'op' column — this lake "
            "was not written in multi-leader mode; refusing to rebuild"
        )

    def drop_dead_tombstones(b: pa.Table) -> pa.Table:
        if "op" not in b.column_names:
            return b
        is_del = pc.equal(b["op"], pa.scalar("delete"))
        dead = pc.and_(is_del, pc.less_equal(b["seq"], pa.scalar(watermark)))
        b = b.filter(pc.invert(dead))
        # live rows re-enter as UPDATES (same null-payload reasoning as
        # repartition_lake: an already-applied update may have legitimately
        # nulled the payload); surviving tombstones keep op='delete'
        op = pc.if_else(
            pc.equal(b["op"], pa.scalar("delete")),
            pa.scalar("delete"),
            pa.scalar("update"),
        )
        return b.set_column(b.column_names.index("op"), "op", op)

    return lake.apply_changes(
        current.map_batches(drop_dead_tombstones, batch_format="pyarrow"),
        quarantine=False,
        fence=False,
        rebuild=True,
        max_attempts=None,
        _raise_gc_watermark=watermark,
    )


def lake_health(lake_dir: str, branch: str = "main") -> dict:
    """Cheap servability probe — the analog of the reference's liveness
    endpoint (fns-routing HealthCheckFunction.kt:7): one metadata-only
    verb a scheduler can poll to answer "is this lake servable right
    now". Unlike ``fsck`` it opens NO data files: it checks that the
    current manifest root parses (which also resolves every referenced
    segment file), that the fence is monotone (per-partition
    applied_offset ≤ global fence, previous archived epoch's fence ≤
    current, current epoch archived consistently), and that the lineage
    tail file parses. Never raises; returns ``{"ok": bool, ...}`` with
    per-check status so callers decide. No Ray session needed."""
    import glob as _glob

    from data_exchange_routing_ray.state.manifest import ManifestStore

    checks: dict[str, str] = {}
    errors: list[str] = []

    if not os.path.isdir(lake_dir):
        return {
            "ok": False,
            "lake": lake_dir,
            "checks": {"lake_dir": "missing"},
            "errors": [f"no lake directory at {lake_dir}"],
        }

    # 1. manifest root + segment files parse
    man = None
    try:
        store = ManifestStore(lake_dir, branch=branch)
        man = store.load_current()
        checks["manifest"] = "ok" if man is not None else "empty"
    except Exception as e:
        checks["manifest"] = "damaged"
        errors.append(f"manifest unreadable: {e}")

    epoch = -1
    fence = -1
    n_parts = 0
    if man is not None:
        epoch, fence = man.epoch, man.applied_offset
        n_parts = len(man.partitions)
        # 2. fence monotone within the current manifest
        bad = [
            pid
            for pid, e in man.partitions.items()
            if e.applied_offset > man.applied_offset
        ]
        if bad:
            checks["fence"] = "violated"
            errors.append(
                f"partition fence above global fence for pids {sorted(bad)[:8]}"
            )
        else:
            checks["fence"] = "ok"
        # 2b. archived history consistent: current epoch archived with the
        # same fence; previous epoch's fence never above the current one
        try:
            arch = store.load_epoch(man.epoch)
            if arch is None:
                checks["archive"] = "missing"
                errors.append(f"current epoch {man.epoch} has no archived manifest")
            elif arch.applied_offset != man.applied_offset:
                checks["archive"] = "mismatch"
                errors.append(
                    "archived fence "
                    f"{arch.applied_offset} != current {man.applied_offset}"
                )
            else:
                prev = store.load_epoch(man.epoch - 1) if man.epoch > 0 else None
                if prev is not None and prev.applied_offset > man.applied_offset:
                    checks["archive"] = "regressed"
                    errors.append(
                        f"fence regressed: epoch {man.epoch - 1} fence "
                        f"{prev.applied_offset} > current {man.applied_offset}"
                    )
                else:
                    checks["archive"] = "ok"
        except Exception as e:
            checks["archive"] = "damaged"
            errors.append(f"archived manifest unreadable: {e}")

    # 3. lineage tail parses (newest epoch file only — O(1))
    sub = "lineage" if branch == "main" else f"lineage-{branch}"
    lin_files = sorted(_glob.glob(os.path.join(lake_dir, sub, "epoch-*.parquet")))
    if not lin_files:
        checks["lineage"] = "empty"
    else:
        try:
            import pyarrow.parquet as _pq

            t = _pq.read_table(lin_files[-1])
            checks["lineage"] = "ok" if t.num_rows >= 0 else "empty"
        except Exception as e:
            checks["lineage"] = "damaged"
            errors.append(f"lineage tail unreadable ({lin_files[-1]}): {e}")

    return {
        "ok": not errors,
        "lake": lake_dir,
        "branch": branch,
        "epoch": epoch,
        "applied_offset": fence,
        "partitions_committed": n_parts,
        "checks": checks,
        "errors": errors,
    }
