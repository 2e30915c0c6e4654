"""Two-phase manifest commit: exactly-once visibility for the lake.

Semantics transplanted from the reference's chunked upload
(``RouteIngestedFile.kt:470-550``): workers stage immutable data files under
deterministic names (the ``stageBlock`` phase — a retried task overwrites its
own staged file, so Ray task retries are idempotent), then the DRIVER alone
publishes a manifest that atomically swaps the table to the new epoch (the
ordered ``commitBlockList`` phase). Readers only ever see files referenced by
the current manifest, so a crash between staging and publish leaves the
previous epoch fully intact.

Fencing: the manifest records ``applied_offset`` (max ``seq`` applied).
Replayed / late change batches with ``seq <= applied_offset`` are no-ops
(analog of queue redelivery tolerated via idempotent overwrite,
``host.json:26-27`` + ``RouteIngestedFile.kt:251``).

On a real object store the same protocol holds: stage objects under
deterministic keys, publish the manifest object last.
"""

from __future__ import annotations

import fcntl
import json
import os
from dataclasses import dataclass, field


@dataclass
class PartitionEntry:
    file: str  # path relative to lake root
    rows: int
    applied_offset: int  # max seq applied to this partition
    epoch: int  # epoch that last rewrote this partition
    # LSM-lite (merge_policy="delta"): change-table delta files layered on
    # top of the base file, folded at read time and compacted once the list
    # reaches the level trigger. Each item: {"file","rows","epoch"}.
    deltas: list = field(default_factory=list)


@dataclass
class Manifest:
    epoch: int = -1
    applied_offset: int = -1  # global fence: max seq committed
    num_partitions: int = 0
    schema_names: list[str] = field(default_factory=list)
    partitions: dict[int, PartitionEntry] = field(default_factory=dict)
    # floor fence installed by tombstone GC (multi_leader lakes): once set,
    # EVERY future epoch drops seq <= gc_watermark even with fence=False —
    # the tombstones at/below it were compacted away, so the fence is the
    # only thing standing between a late stale write and resurrection.
    gc_watermark: int = -1
    # content-hash of the route config active when this epoch committed
    # (S14 audit, FnCacheUpdater.kt:22-52) — null when none was declared
    config_version: str | None = None
    # metadata-only column DDL (Iceberg-style name mapping — no data file
    # is ever rewritten): renames map PHYSICAL (on-disk) name -> LOGICAL
    # (reader-visible) name; drops hide a physical column from readers.
    column_renames: dict = field(default_factory=dict)
    column_drops: list = field(default_factory=list)

    def to_json(self) -> str:
        return json.dumps(
            {
                "epoch": self.epoch,
                "applied_offset": self.applied_offset,
                "gc_watermark": self.gc_watermark,
                "config_version": self.config_version,
                "column_renames": self.column_renames,
                "column_drops": self.column_drops,
                "num_partitions": self.num_partitions,
                "schema_names": self.schema_names,
                "partitions": {
                    str(pid): vars(e) for pid, e in sorted(self.partitions.items())
                },
            },
            indent=1,
        )

    @classmethod
    def from_json(cls, text: str) -> "Manifest":
        d = json.loads(text)
        return cls(
            epoch=d["epoch"],
            applied_offset=d["applied_offset"],
            gc_watermark=d.get("gc_watermark", -1),
            config_version=d.get("config_version"),
            column_renames=d.get("column_renames", {}) or {},
            column_drops=d.get("column_drops", []) or [],
            num_partitions=d["num_partitions"],
            schema_names=d.get("schema_names", []),
            partitions={
                int(pid): PartitionEntry(**{"deltas": [], **e})
                for pid, e in d["partitions"].items()
            },
        )


class ConcurrentCommitError(RuntimeError):
    """Another writer published a manifest since this epoch started."""


class ManifestStore:
    """Filesystem-backed manifest log under ``<lake>/manifests/``.

    ``segment_size`` (opt-in, persisted in lake-config.json by CDCLake)
    switches PUBLISH to the SEGMENTED layout: the partition table is split
    into pid-range segments of ``segment_size`` partitions each, every
    segment serialized to a CONTENT-ADDRESSED file under
    ``<manifests>/segments/`` and the root manifest stores only the segment
    references. An epoch that dirtied D of P partitions writes
    O(D/segment_size) new segment files instead of re-serializing all P
    entries — the Iceberg manifest-list idea, sized for 10^4-10^5-partition
    lakes where a monolithic root costs MBs of JSON per commit. Unchanged
    segments are byte-identical, hash to the same name, and are reused for
    free; archived roots share them, so time travel keeps working. READS
    resolve either layout transparently, so the flag only gates writes."""

    def __init__(
        self, lake_dir: str, branch: str = "main", segment_size: int | None = None
    ):
        # a BRANCH is a separate manifest log over the SAME data files
        # (zero-copy clone, Nessie/LakeFS-style): "main" keeps the legacy
        # layout; any other branch lives under manifests-<branch>/
        self.lake_dir = lake_dir
        self.branch = branch
        self.segment_size = segment_size
        sub = "manifests" if branch == "main" else f"manifests-{branch}"
        self.dir = os.path.join(lake_dir, sub)
        os.makedirs(self.dir, exist_ok=True)

    def _current_path(self) -> str:
        return os.path.join(self.dir, "current.json")

    def _segments_dir(self) -> str:
        return os.path.join(self.dir, "segments")

    def _read_manifest(self, path: str) -> Manifest:
        with open(path) as f:
            d = json.loads(f.read())
        segs = d.pop("segments", None)
        if segs is not None:
            parts: dict = {}
            for ref in segs:
                with open(os.path.join(self.dir, "segments", ref["file"])) as sf:
                    parts.update(json.load(sf)["partitions"])
            d["partitions"] = parts
        return Manifest.from_json(json.dumps(d))

    def load_epoch(self, epoch: int) -> Manifest | None:
        """Archived manifest of a committed epoch (time-travel read)."""
        path = os.path.join(self.dir, f"manifest-{epoch:012d}.json")
        if not os.path.exists(path):
            return None
        return self._read_manifest(path)

    def load_current(self) -> Manifest | None:
        path = self._current_path()
        if not os.path.exists(path):
            return None
        return self._read_manifest(path)

    def _segmented_payload(self, manifest: Manifest) -> str:
        """Serialize with the partition table split into content-addressed
        segment files; returns the root JSON referencing them."""
        import hashlib

        seg_dir = self._segments_dir()
        os.makedirs(seg_dir, exist_ok=True)
        size = int(self.segment_size or 0)
        by_seg: dict[int, dict] = {}
        for pid, e in sorted(manifest.partitions.items()):
            by_seg.setdefault(pid // size, {})[str(pid)] = vars(e)
        refs = []
        for seg_id, parts in sorted(by_seg.items()):
            body = json.dumps({"partitions": parts}, sort_keys=True)
            h = hashlib.sha256(body.encode()).hexdigest()[:20]
            name = f"seg-{seg_id:08d}-{h}.json"
            path = os.path.join(seg_dir, name)
            if not os.path.exists(path):  # content-addressed: reuse if present
                tmp = path + ".tmp"
                with open(tmp, "w") as f:
                    f.write(body)
                    f.flush()
                    os.fsync(f.fileno())
                os.replace(tmp, path)
            refs.append({"file": name, "segment": seg_id, "entries": len(parts)})
        return json.dumps(
            {
                "epoch": manifest.epoch,
                "applied_offset": manifest.applied_offset,
                "gc_watermark": manifest.gc_watermark,
                "config_version": manifest.config_version,
                "column_renames": manifest.column_renames,
                "column_drops": manifest.column_drops,
                "num_partitions": manifest.num_partitions,
                "schema_names": manifest.schema_names,
                "segment_size": size,
                "segments": refs,
            },
            indent=1,
        )

    def publish(self, manifest: Manifest, expect_epoch: int | None = None) -> None:
        """Atomic publish: write temp, fsync, rename (the commitBlockList).

        ``expect_epoch`` enables optimistic concurrency control: the commit
        aborts with ``ConcurrentCommitError`` if another writer published
        since this epoch started (current epoch != expect_epoch). The
        aborted writer's staged files are orphans (vacuumable); its epoch
        can be safely re-run against the new current manifest.

        The expect_epoch check and the renames are made atomic WITH RESPECT
        TO OTHER WRITERS by an exclusive flock held on a lockfile in the
        manifests dir for the whole check-then-publish window — check-then-
        rename without the lock is a lost-update race (two writers can both
        pass the check). On a real object store the analog is a conditional
        put (ETag / if-match) on the current-manifest key."""
        lock_path = os.path.join(self.dir, ".publish.lock")
        with open(lock_path, "w") as lockf:
            fcntl.flock(lockf, fcntl.LOCK_EX)
            try:
                if expect_epoch is not None:
                    cur = self.load_current()
                    cur_epoch = cur.epoch if cur is not None else -1
                    if cur_epoch != expect_epoch:
                        raise ConcurrentCommitError(
                            f"manifest moved to epoch {cur_epoch} (expected "
                            f"{expect_epoch}); another writer committed — "
                            "re-run this epoch"
                        )
                if self.segment_size:
                    payload = self._segmented_payload(manifest)
                else:
                    payload = manifest.to_json()
                archive = os.path.join(
                    self.dir, f"manifest-{manifest.epoch:012d}.json"
                )
                tmp = archive + ".tmp"
                with open(tmp, "w") as f:
                    f.write(payload)
                    f.flush()
                    os.fsync(f.fileno())
                os.replace(tmp, archive)
                tmp2 = self._current_path() + ".tmp"
                with open(tmp2, "w") as f:
                    f.write(payload)
                    f.flush()
                    os.fsync(f.fileno())
                os.replace(tmp2, self._current_path())
            finally:
                fcntl.flock(lockf, fcntl.LOCK_UN)

    def data_files(self, manifest: Manifest) -> list[str]:
        return [
            os.path.join(self.lake_dir, e.file)
            for _, e in sorted(manifest.partitions.items())
        ]
