"""Hash-partitioned last-writer-wins merge-apply (the CDC upsert).

Stage layout (SURVEY.md §7.1):

1. ``add_partition_column`` — stable ``part = hash(conv_id) % P`` column
   (vectorized, zero-copy in, the one shuffle key reused everywhere).
2. ``combine_batch`` — the COMBINER: within each Arrow batch, drop duplicate
   redeliveries (same ``seq``) and keep only the last event per
   ``(conv_id, turn_idx)``. Runs before the shuffle so a hot conversation's
   event storm collapses to ~unique-keys-per-batch before any data moves —
   this is the pre-aggregation that keeps the single ``groupby(part)``
   exchange small at 10^10-event scale.
3. ``make_merge_fn`` — per-partition merge executed via
   ``groupby("part").map_groups``: fence stale seqs, LWW against the
   partition's current base file, apply deletes, unify schemas
   (evolution: added columns backfill null, widened types promote), stable
   ``(conv_id, turn_idx, ts)`` sort, write the staged file under a
   deterministic name (idempotent under Ray task retry), return a stats row.
   Only the driver later publishes the manifest (see state/manifest.py).

Reference parity: idempotent overwrite ``upload(stream, true)``
(``RouteIngestedFile.kt:251``), ordered commit (``:537-547``), per-event
metadata defaulting → our null backfill (``:125-140``).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from data_exchange_routing_ray.hashing import partition_ids
from data_exchange_routing_ray.schemas import ORDER_COLUMNS

PART_COLUMN = "part"
SALT_COLUMN = "salt"

_ARROW_LIMITED = False

# Partition-file codec (GRAFT_PARQUET_CODEC: snappy|lz4|zstd|none).
# snappy is the measured default; lz4 trades a few % file size for faster
# encode on text-heavy payloads — expose it as a tunable so deployments
# can A/B against their own storage (BASELINE.md records the sandbox A/B).
_PARQUET_CODEC = os.environ.get("GRAFT_PARQUET_CODEC", "snappy")
if _PARQUET_CODEC == "none":
    _PARQUET_CODEC = None


def write_partition_file(table: pa.Table, tmp_path: str) -> None:
    pq.write_table(table, tmp_path, compression=_PARQUET_CODEC)


def _limit_arrow_threads() -> None:
    """Cap Arrow's internal thread pool to the task's resource grant.

    A Ray map/merge task is scheduled as 1 CPU, but Arrow's global pool
    defaults to ALL host cores — sorts and parquet compression inside one
    task silently steal the whole machine. That oversubscribes busy nodes
    and invalidates any num_cpus-based scaling measurement (a 2-CPU session
    was observed running at 3.7× its per-core budget through this leak).
    Called once per worker process from the hot-path entry points."""
    global _ARROW_LIMITED
    if not _ARROW_LIMITED:
        pa.set_cpu_count(1)
        pa.set_io_thread_count(2)
        _ARROW_LIMITED = True

# Columns that are CDC-plumbing, never persisted to the lake file.
_PLUMBING = (PART_COLUMN, SALT_COLUMN, "op", "error")

# every column a lake partition file may carry WITHOUT being a schema
# evolution: the transcript payload + LWW seq + the multi-leader op marker
_BASE_LAKE_COLUMNS = frozenset(
    ("conv_id", "turn_idx", "role", "text", "tool", "ts", "seq", "op")
)


def add_partition_column(batch: pa.Table, num_partitions: int) -> pa.Table:
    pid = partition_ids(batch["conv_id"], num_partitions)
    if PART_COLUMN in batch.column_names:
        batch = batch.drop_columns([PART_COLUMN])
    return batch.append_column(PART_COLUMN, pa.array(pid, type=pa.int32()))


QUARANTINE_PARTITION = -1


def add_salt_column(batch: pa.Table, num_salts: int) -> pa.Table:
    """``salt = seq % S``: splits even a SINGLE hot key's event stream across
    S sub-groups. Safe because LWW reduction is associative — each salt
    group keeps its local max-seq row per key, and the final per-partition
    merge re-reduces across salts (SURVEY.md §4 skew row). Duplicate
    redeliveries share a seq, hence a salt, so dup-dropping stays local."""
    seq = pc.fill_null(batch["seq"], 0).to_numpy()  # null seq = quarantine rows
    salt = (seq % num_salts).astype(np.int32)
    if SALT_COLUMN in batch.column_names:
        batch = batch.drop_columns([SALT_COLUMN])
    return batch.append_column(SALT_COLUMN, pa.array(salt, pa.int32()))


def partial_reduce_group(
    group: pa.Table, content_tiebreak: bool = False
) -> pa.Table:
    """Per-(part, salt) combiner stage: LWW-reduce before the final merge.
    Quarantine groups pass through untouched."""
    if group.num_rows == 0:
        return group
    if int(group[PART_COLUMN][0].as_py()) == QUARANTINE_PARTITION:
        return group
    idx = _last_per_key_indices(group, content_tiebreak)
    if len(idx) == group.num_rows:
        return group
    return group.take(pa.array(idx))


def prepare_batch(
    batch: pa.Table,
    num_partitions: int,
    keep_quarantine: bool = True,
    poison_error: str | None = None,
    content_tiebreak: bool = False,
    schema_policy: str = "evolve",
    allowed_extras: frozenset = frozenset(),
) -> pa.Table:
    """The fused hot-path stage: validate → partition → within-batch combine.

    ``poison_error`` short-circuits the stage: EVERY row is tagged with that
    exact error and routed to the quarantine partition — the poison-queue
    path for an epoch that exceeded its processing-attempt budget (the
    reference's ``maxDequeueCount``, ``host.json:26-27``: a message that
    fails N dequeues goes to the poison queue instead of blocking the
    pipeline).

    One ``map_batches`` call does all per-row work before the single shuffle.
    Feed it LARGE batches (``batch_size=256Ki``): the combiner's dedup ratio
    grows with batch size, directly shrinking the exchange. Invalid rows are
    tagged ``part = -1`` so the dead-letter sink rides the same shuffle
    instead of a second full scan (the reference routes failures to the
    ``route-deadletter`` container inside the same pipeline run,
    ``RouteIngestedFile.kt:308-329``).
    """
    from data_exchange_routing_ray.stages.validate import (
        ERROR_COLUMN,
        validate_batch,
    )

    _limit_arrow_threads()
    if poison_error is not None:
        if ERROR_COLUMN in batch.column_names:
            batch = batch.drop_columns([ERROR_COLUMN])
        if PART_COLUMN in batch.column_names:
            batch = batch.drop_columns([PART_COLUMN])
        batch = batch.append_column(
            ERROR_COLUMN, pa.array([poison_error] * batch.num_rows, pa.string())
        )
        return batch.append_column(
            PART_COLUMN,
            pa.array(
                np.full(batch.num_rows, QUARANTINE_PARTITION, np.int32),
                pa.int32(),
            ),
        )
    if schema_policy == "strict":
        # schema-registry enforcement, batch-local (mixed-schema epochs are
        # per-shard, so a driver-side schema() peek would miss late blocks):
        # columns outside CHANGE_SCHEMA + the COMMITTED registry dead-letter
        # the batch with the exact violation instead of silently unifying.
        extras = sorted(
            set(batch.column_names)
            - _BASE_LAKE_COLUMNS
            - set(_PLUMBING)
            - allowed_extras
        )
        if extras:
            msg = (
                "Schema violation: unregistered column(s) "
                f"{','.join(extras)} under schema_policy='strict'"
            )
            from data_exchange_routing_ray.stages.validate import ERROR_COLUMN as _EC

            if _EC in batch.column_names:
                batch = batch.drop_columns([_EC])
            batch = batch.append_column(
                _EC, pa.array([msg] * batch.num_rows, pa.string())
            )
    batch = validate_batch(batch)
    err_null = pc.is_null(batch[ERROR_COLUMN])
    valid = batch.filter(err_null)
    # ONE dictionary encode of conv_id serves both the partition hash
    # (stable hash of the unique values, gathered by code) and the combine
    # keys (batch-local codes) — string scans dominate this stage's memory
    # traffic, so encode once and derive both.
    if valid.num_rows:
        import pandas as _pd

        conv = valid["conv_id"].combine_chunks()
        enc = pc.dictionary_encode(conv)
        codes = _np_int64(enc.indices.to_numpy(zero_copy_only=False), -1)
        uniq = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        uh = _pd.util.hash_array(uniq, categorize=False)
        pid = (uh % np.uint64(num_partitions)).astype(np.int32)[codes]
        turn = _np_int64(valid["turn_idx"].to_numpy(zero_copy_only=False), -1)
        key = _pack_keys(codes, turn)
        seq = _np_int64(valid["seq"].to_numpy(zero_copy_only=False), -(2**62))
        tb = _content_digest(valid) if content_tiebreak else None
        idx = _winners_from_keys(key, seq, tb)
        if PART_COLUMN in valid.column_names:
            valid = valid.drop_columns([PART_COLUMN])
        valid = valid.append_column(PART_COLUMN, pa.array(pid, pa.int32()))
        if len(idx) < valid.num_rows:
            valid = valid.take(pa.array(idx))
    else:
        valid = add_partition_column(valid, num_partitions)
    if not keep_quarantine:
        return valid
    invalid = batch.filter(pc.invert(err_null))
    if invalid.num_rows == 0:
        return valid
    invalid = invalid.append_column(
        PART_COLUMN,
        pa.array(
            np.full(invalid.num_rows, QUARANTINE_PARTITION, dtype=np.int32),
            pa.int32(),
        ),
    )
    return pa.concat_tables([valid, invalid])


def _np_int64(arr: np.ndarray, nan_fill: int) -> np.ndarray:
    """int64 view of a numeric numpy array; NaN (from Arrow nulls) filled."""
    if arr.dtype.kind == "f":
        return np.nan_to_num(arr, nan=float(nan_fill)).astype(np.int64)
    return arr.astype(np.int64, copy=False)


def _key_codes(table: pa.Table, extra: pa.Table | None = None) -> np.ndarray:
    """Exact int64 key per row for (conv_id, turn_idx): batch-local Arrow
    dictionary codes (C-speed, collision-free) combined with the turn index.
    When ``extra`` is given, its rows share the code space (appended after
    ``table``'s rows) so keys are comparable across the two tables."""
    chunks = list(table["conv_id"].chunks)
    if extra is not None:
        ex = extra["conv_id"]
        if not ex.type.equals(chunks[0].type):
            ex = ex.cast(chunks[0].type)
        chunks += list(ex.chunks)
    conv = pa.chunked_array(chunks).combine_chunks()
    codes = _np_int64(
        pc.dictionary_encode(conv).indices.to_numpy(zero_copy_only=False), -1
    )
    turn = table["turn_idx"].to_numpy(zero_copy_only=False)
    if extra is not None:
        turn = np.concatenate(
            [turn, extra["turn_idx"].to_numpy(zero_copy_only=False)]
        )
    return _pack_keys(codes, _np_int64(turn, -1))


def _pack_keys(codes: np.ndarray, turn: np.ndarray) -> np.ndarray:
    """(dictionary code, turn) → one exact int64 key. Turn is normalized
    into the low 32 bits; turn indexes are per-conversation ordinals, so a
    >2^32 spread means corrupt data — fail loudly, never silently collide."""
    if len(turn):
        tmin = turn.min()
        if int(turn.max()) - int(tmin) >= (1 << 32) - 1:
            raise ValueError("turn_idx spread exceeds 2^32; cannot pack keys")
        turn = turn - tmin
    return (codes << np.int64(32)) | turn


def _winners_from_keys(
    key: np.ndarray, seq: np.ndarray, tiebreak: np.ndarray | None = None
) -> np.ndarray:
    """Indices of the winning row per key: max seq, then (multi-leader
    mode) max content-digest ``tiebreak``, then first delivery.

    Without ``tiebreak`` (single-leader), a duplicate (key, seq) can only
    be a redelivery of the same event, so first-delivery suffices. WITH
    ``tiebreak``, two sites that (illegally or via a producer bug) assign
    the same seq to CONFLICTING writes still converge: every site picks
    the same winner because the arbiter is a function of the row content,
    not of arrival order (Cassandra's value comparison on timestamp tie)."""
    if tiebreak is None:
        order = np.lexsort((seq, key))  # by key, then seq; stable → delivery
        k, s = key[order], seq[order]
        # duplicate redelivery: same (key, seq) re-emitted → keep first
        keep = np.r_[True, (k[1:] != k[:-1]) | (s[1:] != s[:-1])]
        o2, k2 = order[keep], k[keep]
    else:
        order = np.lexsort((tiebreak, seq, key))
        k, s, t = key[order], seq[order], tiebreak[order]
        keep = np.r_[
            True,
            (k[1:] != k[:-1]) | (s[1:] != s[:-1]) | (t[1:] != t[:-1]),
        ]
        o2, k2 = order[keep], k[keep]
    # winner per key = last (max-sort-order) row of each key run
    last = np.nonzero(np.r_[k2[1:] != k2[:-1], True])[0]
    return np.sort(o2[last])


#: payload columns the multi-leader seq-tie arbiter hashes, in fixed order
_DIGEST_COLUMNS = ("op", "role", "text", "tool")


def _content_digest(table: pa.Table) -> np.ndarray:
    """Deterministic per-row uint64 digest of the payload columns — the
    LWW seq-tie arbiter for multi-leader merges. Defined over column
    CONTENT only (never arrival order or storage layout), so every site
    computes the same digest for the same logical write.

    Scope: the CORE payload (_DIGEST_COLUMNS + ts) only, never evolved
    columns — the fixed column set guarantees a base row written before a
    schema evolution and the identical write shipped after it digest the
    same; two writes that tie on seq AND the whole core payload are
    treated as the same write (base kept)."""
    from data_exchange_routing_ray.hashing import stable_hash_strings

    n = table.num_rows
    acc = np.zeros(n, dtype=np.uint64)
    mult = np.uint64(0x9E3779B97F4A7C15)
    for col in _DIGEST_COLUMNS:
        if col in table.column_names:
            arr = table[col]
            if col == "op":
                # maintenance rewrites (gc_tombstones / repartition_lake)
                # rewrite surviving live rows' op to 'update'; normalize
                # insert/update to one token so a site that ran GC and one
                # that didn't digest the same logical write identically —
                # only the live-vs-tombstone distinction may arbitrate
                arr = pc.if_else(
                    pc.equal(arr, pa.scalar("delete")),
                    pa.scalar("delete"),
                    pa.scalar("write"),
                )
            h = stable_hash_strings(arr)
        else:
            h = np.zeros(n, dtype=np.uint64)
        acc = (acc ^ h) * mult
    if "ts" in table.column_names:
        ts = table["ts"].to_numpy(zero_copy_only=False)
        if np.issubdtype(ts.dtype, np.datetime64):
            tsv = ts.astype("datetime64[us]").astype(np.int64)
        else:
            tsv = _np_int64(ts, -(2**62))
        acc = (acc ^ tsv.view(np.uint64)) * mult
    return acc


def _last_per_key_indices(
    table: pa.Table, content_tiebreak: bool = False
) -> np.ndarray:
    """Row indices of the winning event per (conv_id, turn_idx) key — pure
    numpy over batch-local dictionary codes (no per-row Python objects;
    this is the combiner's hot loop). ``content_tiebreak`` adds the
    multi-leader digest arbiter for seq ties."""
    key = _key_codes(table)
    seq = _np_int64(table["seq"].to_numpy(zero_copy_only=False), -(2**62))
    tb = _content_digest(table) if content_tiebreak else None
    return _winners_from_keys(key, seq, tb)


def combine_batch(batch: pa.Table, content_tiebreak: bool = False) -> pa.Table:
    """Within-batch partial reduce: last event per key, dup seqs dropped."""
    if batch.num_rows == 0:
        return batch
    idx = _last_per_key_indices(batch, content_tiebreak)
    if len(idx) == batch.num_rows:
        return batch
    return batch.take(pa.array(idx))


def unify_and_concat(tables: list[pa.Table]) -> pa.Table:
    """Concat with schema evolution: added columns backfill null, numeric
    types widen, timestamp units promote to the finer unit."""
    tables = [t for t in tables if t is not None and t.num_rows >= 0]
    if len(tables) == 1:
        return tables[0]
    try:
        schema = pa.unify_schemas([t.schema for t in tables], promote_options="permissive")
    except (pa.ArrowInvalid, pa.ArrowTypeError, TypeError):
        schema = _manual_unify([t.schema for t in tables])
    casted = []
    for t in tables:
        missing = [f for f in schema if f.name not in t.column_names]
        for f in missing:
            t = t.append_column(f.name, pa.nulls(t.num_rows, f.type))
        t = t.select([f.name for f in schema])
        casted.append(t.cast(schema))
    return pa.concat_tables(casted)


def _manual_unify(schemas: list[pa.Schema]) -> pa.Schema:
    fields: dict[str, pa.Field] = {}
    order: list[str] = []
    for s in schemas:
        for f in s:
            if f.name not in fields:
                fields[f.name] = f
                order.append(f.name)
            else:
                fields[f.name] = pa.field(f.name, _promote(fields[f.name].type, f.type))
    return pa.schema([fields[n] for n in order])


def _promote(a: pa.DataType, b: pa.DataType) -> pa.DataType:
    if a.equals(b):
        return a
    ints = {pa.int8(): 8, pa.int16(): 16, pa.int32(): 32, pa.int64(): 64}
    if a in ints and b in ints:
        return a if ints[a] >= ints[b] else b
    units = {"s": 0, "ms": 1, "us": 2, "ns": 3}
    if pa.types.is_timestamp(a) and pa.types.is_timestamp(b):
        return a if units[a.unit] >= units[b.unit] else b
    if pa.types.is_floating(a) or pa.types.is_floating(b):
        return pa.float64()
    if pa.types.is_large_string(a) or pa.types.is_large_string(b):
        return pa.large_string()
    raise TypeError(f"cannot promote {a} vs {b}")


def stage_file_path(stage_dir: str, epoch: int, pid: int) -> str:
    return os.path.join(stage_dir, f"epoch={epoch:012d}", f"part-{pid:05d}.parquet")


def merge_tables(
    base: pa.Table | None, changes: pa.Table, fence_below: int,
    out_of_order: bool = False,
) -> tuple[pa.Table, dict]:
    """Pure merge: (base ∪ changes) → new partition table + stats.

    ``changes`` must carry CHANGE columns (op, seq, key, payload); ``base``
    carries lake columns + seq. Returns the new lake table sorted by
    ORDER_COLUMNS.

    ``out_of_order=True`` is the MULTI-LEADER mode: incoming seqs may be
    LOWER than already-applied ones (cross-site WAL exchange), so the
    winner per key is decided by comparing the base row's stored seq
    against the change's seq (true LWW-register semantics) instead of
    assuming epoch monotonicity, and deletes are RETAINED as tombstone
    rows (op='delete' kept in the stored table) — without tombstones a
    stale insert arriving after a newer delete would resurrect the key
    (the classic multi-leader pitfall). Readers filter tombstones.

    Seq TIES (two sites stamping the same seq on conflicting writes —
    a producer-contract violation the engine still must not diverge on)
    are arbitrated by a deterministic content digest (``_content_digest``;
    Cassandra's value comparison on timestamp tie): max digest wins, equal
    digest means the same write redelivered and is a no-op.
    """
    n_in = changes.num_rows
    # fence stale / replayed seqs (exactly-once no-op on redelivery)
    changes = changes.filter(pc.greater(changes["seq"], pa.scalar(fence_below)))
    n_fenced = n_in - changes.num_rows

    if changes.num_rows:
        idx = _last_per_key_indices(changes, content_tiebreak=out_of_order)
        changes = changes.take(pa.array(idx))

    applied_offset = (
        int(pc.max(changes["seq"]).as_py()) if changes.num_rows else fence_below
    )

    if base is not None and base.num_rows and changes.num_rows:
        keys = _key_codes(base, extra=changes)
        base_keys = keys[: base.num_rows]
        change_keys = keys[base.num_rows :]
        if not out_of_order:
            # monotone epochs (fenced): any change wins over its base row —
            # shared-code anti-join (exact; no Python string objects)
            keep = ~np.isin(base_keys, change_keys)
            if not keep.all():
                base = base.filter(pa.array(keep))
        else:
            # seq-aware LWW: for matched keys the HIGHER seq wins, whether
            # it lives in the base or in the change set (vectorized
            # sorted-probe; changes are already collapsed to 1 row/key)
            order = np.argsort(change_keys, kind="stable")
            ck_sorted = change_keys[order]
            pos = np.searchsorted(ck_sorted, base_keys)
            pos_cl = np.minimum(pos, len(order) - 1)
            matched = ck_sorted[pos_cl] == base_keys
            cseq = changes["seq"].to_numpy()[order][pos_cl]
            bseq = base["seq"].to_numpy()
            base_wins = matched & (bseq > cseq)
            tied = matched & (bseq == cseq)
            if tied.any():
                # seq collision (two sites stamped the same seq): arbitrate
                # by content digest so every site picks the same winner
                # regardless of WAL arrival order. Equal digest = the same
                # write redelivered — keeping the base row is a no-op.
                bdig = _content_digest(base)
                cdig = _content_digest(changes)[order][pos_cl]
                base_wins = base_wins | (tied & (bdig >= cdig))
            keep_base = ~matched | base_wins
            if not keep_base.all():
                base = base.filter(pa.array(keep_base))
            win_keys = base_keys[base_wins]
            if win_keys.size:
                stale = np.isin(change_keys, win_keys)
                changes = changes.filter(pa.array(~stale))

    if not changes.num_rows:
        surviving = changes
    elif out_of_order:
        surviving = changes  # deletes stay as TOMBSTONE rows
    else:
        surviving = changes.filter(
            pc.not_equal(changes["op"], pa.scalar("delete"))
        )
    keep_cols = ("op",) if out_of_order else ()
    drop = [
        c for c in _PLUMBING
        if c in surviving.column_names and c not in keep_cols
    ]
    if drop:
        surviving = surviving.drop_columns(drop)

    parts = []
    if base is not None and base.num_rows:
        parts.append(base)
    if surviving.num_rows:
        parts.append(surviving)
    if not parts:
        out = surviving  # empty, correct schema
    else:
        out = unify_and_concat(parts)
    if out.num_rows:
        out = out.sort_by([(c, "ascending") for c in ORDER_COLUMNS])
    n_live = int(out.num_rows)
    if out_of_order and out.num_rows and "op" in out.column_names:
        # manifest row counts stay LIVE-row counts (the stats-pushdown
        # contract); tombstones are storage, not state
        n_live -= int(
            pc.sum(
                pc.cast(pc.equal(out["op"], pa.scalar("delete")), pa.int64())
            ).as_py()
            or 0
        )
    stats = {
        "changes_applied": int(changes.num_rows),
        "changes_fenced": int(n_fenced),
        "applied_offset": applied_offset,
        # lowest applied winner seq: commit reconciliation's serial-
        # equivalence witness (all winners above the rival's new fence
        # means a re-run would produce byte-identical output)
        "min_seq_applied": (
            int(pc.min(changes["seq"]).as_py()) if changes.num_rows else 2**62
        ),
        "row_count": n_live,
        # evolved columns this partition now stores (the driver unions
        # these into the manifest's schema registry at commit)
        "extra_cols": ",".join(
            sorted(set(out.column_names) - _BASE_LAKE_COLUMNS)
        ),
    }
    return out, stats


def fold_deltas(
    base: pa.Table | None, delta_tables: list[pa.Table]
) -> pa.Table | None:
    """Fold committed change-table deltas over a base partition table
    (merge-on-read / compaction). Deltas were fenced when written, so the
    fold itself is unfenced; cross-delta ordering is LWW by seq."""
    deltas = [t for t in delta_tables if t is not None and t.num_rows]
    if not deltas:
        return base
    merged, _ = merge_tables(
        base, pa.concat_tables(deltas, promote_options="permissive"), -(2**62)
    )
    return merged


def make_merge_fn(
    lake_dir: str,
    stage_dir: str,
    epoch: int,
    fence_below: int,
    base_files: dict[int, str],
    base_deltas: dict[int, list[str]] | None = None,
    base_rows: dict[int, int] | None = None,
    policy: str = "rewrite",
    delta_max_files: int = 4,
    delta_ratio: float = 0.2,
    out_of_order: bool = False,
):
    """Build the per-group merge callable for groupby(part).map_groups.

    ``base_files`` maps partition id → lake-relative base file path (from the
    current manifest); small (P entries), shipped in the task closure — the
    broadcast-config pattern (analog of ConfigCache, ``Common.kt:20-41``).

    ``policy="delta"`` is the LSM-lite write path bounding copy-on-write
    amplification at many small epochs: when the epoch's change rows for a
    partition are small relative to its base (< ``delta_ratio``·base_rows)
    and the partition has fewer than ``delta_max_files`` stacked deltas, the
    merge writes ONLY the fenced+LWW-collapsed change rows as a delta file
    (base untouched — no read, no rewrite). Reads fold base+deltas
    (``fold_deltas``); reaching ``delta_max_files`` level-triggers a
    compaction that folds everything into a fresh base. Amplification is
    thus bounded at ~2× per ``delta_max_files`` small epochs instead of
    base_size/epoch_delta× per epoch.
    """
    base_deltas = base_deltas or {}
    base_rows = base_rows or {}

    def merge_group(group: pa.Table) -> pd.DataFrame:
        _limit_arrow_threads()
        pid = int(group[PART_COLUMN][0].as_py())
        if pid == QUARANTINE_PARTITION:
            # dead-letter group: stage as-is (error column retained)
            out = group.drop_columns(
                [c for c in (PART_COLUMN, SALT_COLUMN) if c in group.column_names]
            )
            path = stage_file_path(stage_dir, epoch, pid).replace(
                f"part-{pid:05d}", "deadletter"
            )
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + ".inprogress"
            write_partition_file(out, tmp)
            os.replace(tmp, path)
            # dead-lettered rows COUNT AS PROCESSED (the reference dead-
            # letters and moves on, never reprocessing): their max seq
            # advances the watermark so replayed shards skip them
            qmax = pc.max(out["seq"]).as_py() if "seq" in out.column_names else None
            return pd.DataFrame(
                [
                    {
                        "partition": pid,
                        "epoch": epoch,
                        "file": path,
                        "changes_applied": 0,
                        "changes_fenced": 0,
                        "applied_offset": max(
                            fence_below, qmax if qmax is not None else fence_below
                        ),
                        "min_seq_applied": 2**62,
                        "row_count": int(out.num_rows),
                        "is_delta": 0,
                        "no_change": 0,
                        "extra_cols": "",
                    }
                ]
            )
        rel = base_files.get(pid)
        delta_rels = base_deltas.get(pid, [])
        if (
            policy == "delta"
            and rel is not None
            and len(delta_rels) < delta_max_files
            and group.num_rows <= delta_ratio * max(base_rows.get(pid, 0), 1)
        ):
            # DELTA PATH: fence + LWW-collapse the change rows only; the
            # base file is neither read nor rewritten. op/seq are RETAINED
            # (deletes must survive to the read-time fold).
            changes = group.filter(
                pc.greater(group["seq"], pa.scalar(fence_below))
            )
            n_fenced = group.num_rows - changes.num_rows
            if changes.num_rows:
                changes = changes.take(pa.array(_last_per_key_indices(changes)))
            drop = [
                c
                for c in (PART_COLUMN, SALT_COLUMN, "error")
                if c in changes.column_names
            ]
            if drop:
                changes = changes.drop_columns(drop)
            path = stage_file_path(stage_dir, epoch, pid).replace(
                "part-", "delta-part-"
            )
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + ".inprogress"
            write_partition_file(changes, tmp)
            os.replace(tmp, path)
            applied = (
                int(pc.max(changes["seq"]).as_py())
                if changes.num_rows
                else fence_below
            )
            return pd.DataFrame(
                [
                    {
                        "partition": pid,
                        "epoch": epoch,
                        "file": path,
                        "changes_applied": int(changes.num_rows),
                        "changes_fenced": int(n_fenced),
                        "applied_offset": applied,
                        "min_seq_applied": (
                            int(pc.min(changes["seq"]).as_py())
                            if changes.num_rows
                            else 2**62
                        ),
                        "row_count": int(changes.num_rows),
                        "is_delta": 1,
                        "no_change": 0,
                        "extra_cols": ",".join(
                            sorted(set(changes.column_names) - _BASE_LAKE_COLUMNS)
                        ),
                    }
                ]
            )
        if rel is not None and not delta_rels:
            live = group.filter(pc.greater(group["seq"], pa.scalar(fence_below)))
            if live.num_rows == 0:
                # FULLY-FENCED REPLAY for this partition: every change row
                # is at/below the fence, so the merge result is byte-
                # identical to the committed base — skip the read AND the
                # rewrite (no_change=1 keeps the previous manifest entry).
                # Without this, replaying an applied shard rewrites the
                # whole touched key space per replay (pure write
                # amplification) and defeats manifest-segment reuse.
                return pd.DataFrame(
                    [
                        {
                            "partition": pid,
                            "epoch": epoch,
                            "file": "",
                            "changes_applied": 0,
                            "changes_fenced": int(group.num_rows),
                            "applied_offset": fence_below,
                            "min_seq_applied": 2**62,
                            "row_count": 0,
                            "is_delta": 0,
                            "no_change": 1,
                            "extra_cols": "",
                        }
                    ]
                )
        base = None
        if rel is not None:
            base = pq.read_table(os.path.join(lake_dir, rel))
        if delta_rels:  # compaction: fold committed deltas into the base
            base = fold_deltas(
                base,
                [pq.read_table(os.path.join(lake_dir, d)) for d in delta_rels],
            )
        out, stats = merge_tables(base, group, fence_below, out_of_order=out_of_order)
        path = stage_file_path(stage_dir, epoch, pid)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".inprogress"
        write_partition_file(out, tmp)
        os.replace(tmp, path)  # deterministic name → retry overwrites, idempotent
        return pd.DataFrame(
            [
                {
                    "partition": pid,
                    "epoch": epoch,
                    "file": path,
                    **stats,
                    "is_delta": 0,
                    "no_change": 0,
                }
            ]
        )

    return merge_group
