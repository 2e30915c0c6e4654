"""Cross-lake transactional group commit (multi-table atomicity).

The reference fans one ingested upload out to SEVERAL destinations and
fails the whole orchestration if any branch fails
(``fns-csv-pipeline/.../FnOrchestrator`` fan-in with ``fanInFailIfAnyFail``,
and the router's multi-destination expansion in ``RouteIngestedFile.kt``).
Each CDCLake already has single-table exactly-once commits (manifest
publish, ``state/manifest.py``); this module layers MULTI-table atomic
visibility on top without touching the per-lake commit path — the same
way multi-table transactions are layered over single-table commit logs in
lakehouse designs (journal + pinned-snapshot reads + roll-forward):

1. **Intent journal.** ``begin`` durably records the transaction's lakes
   and their PRE-transaction epochs (one JSON file per txn, atomic
   replace + fsync — the same commitBlockList discipline as the manifest).
2. **Per-lake apply.** Each lake commits its own epoch with its own
   manifest publish; after each, the journal records the lake as done.
3. **Group commit.** The journal entry flips to ``committed`` — the
   transaction's effects become visible to consistent readers atomically.

**Consistent reads**: ``consistent_epochs()`` caps every lake at the
pre-epoch of any still-pending transaction, so a reader that pins its
``final_table(epoch=...)`` calls to those epochs NEVER observes a
half-committed group — snapshot isolation across tables, with zero
coordination on the write path.

**Crash recovery is roll-forward**: change batches are durable and
re-suppliable upstream (the queue-redelivery assumption the reference
makes via ``host.json`` maxDequeueCount), and per-lake seq fencing makes a
double-apply a no-op epoch — so ``recover`` simply re-applies every lake
the journal does not record as done, then commits the group. A crash at
ANY point therefore converges to the fully-committed state; the partial
state is never visible to consistent readers in the interim.
"""

from __future__ import annotations

import json
import os
from typing import Callable

from data_exchange_routing_ray.pipelines.cdc import CDCLake, EpochResult


class GroupCommitJournal:
    """One JSON file per transaction under ``journal_dir``; atomic updates."""

    def __init__(self, journal_dir: str):
        self.dir = journal_dir
        os.makedirs(self.dir, exist_ok=True)

    # ---- txn file helpers -------------------------------------------------
    def _path(self, txn_id: str) -> str:
        return os.path.join(self.dir, f"{txn_id}.json")

    def _write(self, txn: dict) -> None:
        tmp = self._path(txn["txn_id"]) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(txn, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._path(txn["txn_id"]))

    def _load(self, txn_id: str) -> dict:
        with open(self._path(txn_id)) as f:
            return json.load(f)

    def _all(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.dir)):
            if name.endswith(".json"):
                with open(os.path.join(self.dir, name)) as f:
                    out.append(json.load(f))
        return out

    # ---- protocol ---------------------------------------------------------
    def begin(self, pre_epochs: dict[str, int]) -> str:
        n = sum(1 for f in os.listdir(self.dir) if f.endswith(".json"))
        txn_id = f"txn-{n:08d}"
        self._write(
            {
                "txn_id": txn_id,
                "status": "pending",
                "pre_epochs": dict(pre_epochs),
                "done_epochs": {},
            }
        )
        return txn_id

    def mark_lake_done(self, txn_id: str, lake: str, committed_epoch: int) -> None:
        txn = self._load(txn_id)
        txn["done_epochs"][lake] = committed_epoch
        self._write(txn)

    def commit(self, txn_id: str) -> None:
        txn = self._load(txn_id)
        missing = set(txn["pre_epochs"]) - set(txn["done_epochs"])
        if missing:
            raise RuntimeError(f"cannot commit {txn_id}: lakes not done: {missing}")
        txn["status"] = "committed"
        self._write(txn)

    def pending(self) -> list[dict]:
        return [t for t in self._all() if t["status"] == "pending"]

    def committed(self) -> list[dict]:
        return [t for t in self._all() if t["status"] == "committed"]


class GroupTransaction:
    """Coordinator for atomic multi-lake change application."""

    def __init__(self, journal_dir: str, lakes: dict[str, CDCLake]):
        self.journal = GroupCommitJournal(journal_dir)
        self.lakes = dict(lakes)

    def run(
        self, apply_fns: dict[str, Callable[[CDCLake], EpochResult]]
    ) -> dict[str, int]:
        """Apply one change set per lake as one atomic group. Returns the
        committed epoch per lake. On failure the journal keeps the txn
        pending — call ``recover`` with re-supplied apply fns."""
        unknown = set(apply_fns) - set(self.lakes)
        if unknown:
            raise KeyError(f"unknown lakes: {unknown}")
        pre = {name: self.lakes[name].manifest.epoch for name in apply_fns}
        txn_id = self.journal.begin(pre)
        done: dict[str, int] = {}
        for name in sorted(apply_fns):  # deterministic order
            res = apply_fns[name](self.lakes[name])
            self.journal.mark_lake_done(txn_id, name, res.epoch)
            done[name] = res.epoch
        self.journal.commit(txn_id)
        return done

    def recover(
        self, apply_fns: dict[str, Callable[[CDCLake], EpochResult]]
    ) -> list[str]:
        """Roll every pending transaction forward to committed. Lakes the
        journal records as done are skipped; the rest are re-applied —
        idempotent under seq fencing even if the lake actually published
        before the crash (the re-apply is a fenced no-op epoch). Returns
        the txn ids completed."""
        completed = []
        for txn in self.journal.pending():
            for name in sorted(txn["pre_epochs"]):
                if name in txn["done_epochs"]:
                    continue
                if name not in apply_fns:
                    raise KeyError(
                        f"recovery of {txn['txn_id']} needs a re-supplied "
                        f"apply fn for lake '{name}'"
                    )
                res = apply_fns[name](self.lakes[name])
                self.journal.mark_lake_done(txn["txn_id"], name, res.epoch)
            self.journal.commit(txn["txn_id"])
            completed.append(txn["txn_id"])
        return completed

    def consistent_epochs(self) -> dict[str, int]:
        """Per-lake epoch pin for a cross-table-consistent snapshot: the
        lake's current epoch, capped below any pending transaction's
        pre-epoch — a half-committed group is never visible. Use with
        ``lake.final_table(epoch=pin)``."""
        pins = {name: lake.manifest.epoch for name, lake in self.lakes.items()}
        for txn in self.journal.pending():
            for name, pre in txn["pre_epochs"].items():
                if name in pins:
                    pins[name] = min(pins[name], pre)
        return pins
