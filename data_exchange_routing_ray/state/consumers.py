"""Durable consumer-group offsets over the lake's epoch log.

The Kafka-consumer-offset analog for changefeed consumers: a downstream
materialized view (e.g. the incremental inverted index) processes
``changefeed_between(committed, head)`` and then commits ``head`` under its
group name with compare-and-set semantics — a crashed consumer resumes
from its last committed epoch and a concurrent duplicate of the same group
loses the CAS instead of double-applying (exactly-once epoch processing on
the consumer side, mirroring the write side's OCC publish).

Storage: one JSON file per group under ``<lake>/consumers/`` with the same
flock-guarded check-then-rename the manifest publish uses (the object-store
analog is a conditional put on the group's offset key).

Reference parity: the reference's report-store consumer upserts per-event
documents keyed by event id (``FnStoreReportingEvent.kt:47-85``); group
offsets are the batch-engine equivalent of that consumer's progress cursor.
"""

from __future__ import annotations

import fcntl
import json
import os


class StaleConsumerOffsetError(RuntimeError):
    """The group's committed offset moved since this consumer read it."""


class ConsumerOffsets:
    def __init__(self, lake_dir: str, branch: str = "main"):
        sub = "consumers" if branch == "main" else f"consumers-{branch}"
        self.dir = os.path.join(lake_dir, sub)
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, group: str) -> str:
        safe = group.replace(os.sep, "_")
        return os.path.join(self.dir, f"{safe}.json")

    def get(self, group: str) -> int | None:
        """The group's committed epoch, or None if it never committed."""
        path = self._path(group)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return int(json.load(f)["epoch"])

    def commit(self, group: str, epoch: int, expect: int | None = None) -> None:
        """Compare-and-set the group's offset to ``epoch``.

        ``expect`` is the offset this consumer READ before processing
        (None = never committed); a mismatch means another instance of the
        same group advanced it — raise instead of double-applying. Offsets
        never move backwards."""
        lock_path = os.path.join(self.dir, ".offsets.lock")
        with open(lock_path, "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            try:
                cur = self.get(group)
                if cur != expect:
                    raise StaleConsumerOffsetError(
                        f"group {group!r}: committed offset is {cur}, "
                        f"expected {expect}"
                    )
                if cur is not None and epoch < cur:
                    raise ValueError(
                        f"group {group!r}: offset cannot move backwards "
                        f"({cur} -> {epoch})"
                    )
                path = self._path(group)
                tmp = path + ".tmp"
                with open(tmp, "w") as f:
                    json.dump({"group": group, "epoch": int(epoch)}, f)
                    f.flush()
                    os.fsync(f.fileno())
                os.replace(tmp, path)
            finally:
                fcntl.flock(lk, fcntl.LOCK_UN)

    def groups(self) -> dict[str, int]:
        """All committed group offsets (for status/monitoring)."""
        out = {}
        for name in sorted(os.listdir(self.dir)):
            if name.endswith(".json"):
                with open(os.path.join(self.dir, name)) as f:
                    d = json.load(f)
                out[d["group"]] = int(d["epoch"])
        return out
