"""Driver-verifiable query pipelines over the standard test tables.

Each function here is a ``queries()`` entry in ``__ray_entry__`` with a
DuckDB oracle in ``oracle_sql()``. The CDC pipelines derive a deterministic
binlog change stream FROM the ``events`` table with a formula both Ray and
ANSI SQL can compute, then run the REAL engine (CDCLake: validation,
partitioned LWW merge, manifest commits) and compare final state against a
SQL window-function oracle.

Derivation (shared contract — keep in sync with the SQL in __ray_entry__):

    seq      = event_id
    op       = insert if event_id%10<7, update if <9, else delete
    conv_id  = 'conv-' || lpad(user_id, 6, '0')
    turn_idx = int32(event_id % 25)
    role     = user/assistant by event_id parity   (NULL for delete)
    text     = 'e-' || event_id                    (NULL for delete)
    tool     = event_type                          (NULL for delete)
    ts       = ts
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from data_exchange_routing_ray.functions.text import (
    add_lang_id,
    add_md5_fingerprint,
    add_quality_score,
    add_text_stats,
    add_winnow_fingerprint,
)
from data_exchange_routing_ray.pipelines.cdc import CDCLake
from data_exchange_routing_ray.stages.debatch import debatch_json_array
from data_exchange_routing_ray.stages.route import folders_to_path, make_router, split_routed
from data_exchange_routing_ray.stages.validate import keep_invalid, validate_batch


def _events(sf_dir: str, columns=None, min_blocks: int = 16) -> ray.data.Dataset:
    # byte-sized blocks (floor 16): small test tables skip 64-block shuffle
    # overhead; at 100 TB the 128 MB target governs (see _read_sized)
    return _read_sized(
        os.path.join(sf_dir, "events.parquet"), columns=columns,
        min_blocks=min_blocks,
    )


def _documents(sf_dir: str, columns=None, min_blocks: int = 16) -> ray.data.Dataset:
    # byte-sized blocks with a floor of 16 so per-doc compute (minhash,
    # shingling) still fans out while small corpora skip 64-block shuffles;
    # raise min_blocks at call sites whose map_groups compute is heavy
    # (grouped-shuffle fan-out follows the input block count)
    return _read_sized(
        os.path.join(sf_dir, "documents.parquet"), columns=columns,
        min_blocks=min_blocks,
    )


def _read_sized(
    path: str,
    columns=None,
    min_blocks: int = 4,
    target_bytes: int = 128 << 20,
) -> ray.data.Dataset:
    """``read_parquet`` with block count scaled to input BYTES. The sort
    shuffle's fixed cost is proportional to the number of blocks entering
    it, so a few-MB table must not inherit the session default (~2x CPUs:
    64 blocks for a 2 MB file at 32 CPUs); a 100 TB input still splits at
    ~``target_bytes``. Use for exchange-bound pipelines whose map stage is
    trivial — compute-heavy stages keep the default so maps fan wide."""
    nb = max(min_blocks, os.path.getsize(path) // target_bytes)
    return ray.data.read_parquet(path, columns=columns, override_num_blocks=nb)


def _embeddings(sf_dir: str, min_blocks: int = 16) -> ray.data.Dataset:
    return _read_sized(
        os.path.join(sf_dir, "embeddings.parquet"), min_blocks=min_blocks
    )


# --------------------------------------------------------------- derivation

def derive_changes_batch(batch: pa.Table, corrupt: bool = False) -> pa.Table:
    """events rows → CHANGE_SCHEMA rows (vectorized; formula above)."""
    ev = batch["event_id"].to_numpy()
    uid = batch["user_id"].to_numpy()
    etype = batch["event_type"].to_numpy(zero_copy_only=False)
    mod10 = ev % 10
    op = np.select(
        [mod10 < 7, mod10 < 9], ["insert", "update"], default="delete"
    ).astype(object)
    is_del = mod10 >= 9
    conv = np.char.add("conv-", np.char.zfill(uid.astype(np.str_), 6)).astype(object)
    turn = (ev % 25).astype(np.int32)
    role = np.where(ev % 2 == 0, "user", "assistant").astype(object)
    text = np.char.add("e-", ev.astype(np.str_)).astype(object)
    tool = etype.copy()
    role[is_del] = None
    text[is_del] = None
    tool[is_del] = None

    ts = batch["ts"]
    if corrupt:
        kind = ev % 101
        conv[kind == 0] = None
        op[kind == 1] = "upsert?"
        ts = pc.if_else(
            pa.array(kind == 2), pa.nulls(batch.num_rows, pa.timestamp("us")), ts
        )
        turn_arr = pa.array(turn, pa.int32())
        turn_col = pc.if_else(
            pa.array(kind == 3), pa.nulls(batch.num_rows, pa.int32()), turn_arr
        )
    else:
        turn_col = pa.array(turn, pa.int32())

    return pa.table(
        {
            "seq": pa.array(ev, pa.int64()),
            "op": pa.array(op, pa.string()),
            "conv_id": pa.array(conv, pa.string()),
            "turn_idx": turn_col,
            "role": pa.array(role, pa.string()),
            "text": pa.array(text, pa.string()),
            "tool": pa.array(tool, pa.string()),
            "ts": ts.cast(pa.timestamp("us")),
        }
    )


def derived_change_stream(sf_dir: str, corrupt: bool = False) -> ray.data.Dataset:
    return _events(sf_dir, columns=["event_id", "user_id", "event_type", "ts"]).map_batches(
        lambda b: derive_changes_batch(b, corrupt=corrupt), batch_format="pyarrow"
    )


# ------------------------------------------------------------- CDC queries

def cdc_final_state(sf_dir: str) -> pa.Table:
    """Full engine replay (single epoch): validate → partition → LWW merge →
    manifest commit; returns the committed lake state."""
    with tempfile.TemporaryDirectory(prefix="cdclake-") as d:
        lake = CDCLake(os.path.join(d, "lake"), num_partitions=16)
        lake.apply_changes(derived_change_stream(sf_dir), quarantine=False)
        return lake.final_table()


def cdc_final_state_multi_epoch(sf_dir: str, epochs: int = 4) -> pa.Table:
    """Same result via N seq-ordered epoch micro-batches + a replayed epoch
    (fencing proves idempotence end-to-end). The epoch's seq range is
    pushed onto ``event_id`` at the PARQUET SCAN (seq = event_id by
    derivation), so each epoch reads only its row groups."""
    hi = _events(sf_dir, columns=["event_id"]).max("event_id")
    bounds = np.linspace(0, hi + 1, epochs + 1).astype(np.int64)

    def epoch_stream(lo: int, up: int) -> ray.data.Dataset:
        return _events(
            sf_dir, columns=["event_id", "user_id", "event_type", "ts"]
        ).filter(expr=f"event_id >= {lo} and event_id < {up}").map_batches(
            derive_changes_batch, batch_format="pyarrow"
        )

    with tempfile.TemporaryDirectory(prefix="cdclake-") as d:
        lake = CDCLake(os.path.join(d, "lake"), num_partitions=16)
        for i in range(epochs):
            lake.apply_changes(
                epoch_stream(int(bounds[i]), int(bounds[i + 1])), quarantine=False
            )
        # redeliver the last epoch verbatim — must be a fenced no-op
        res = lake.apply_changes(
            epoch_stream(int(bounds[-2]), int(bounds[-1])), quarantine=False
        )
        assert res.changes_applied == 0, "fencing must no-op a replayed epoch"
        return lake.final_table()


def lake_rename_drop_column(sf_dir: str) -> pa.Table:
    """Metadata-only column DDL mid-stream (Iceberg-style name mapping —
    zero data files rewritten): epoch 1 applies the first half of the
    change stream, then ``tool`` RENAMES to ``tool_name`` and ``role``
    DROPS (two OCC-fenced metadata commits), then epoch 2 arrives FROM A
    PRODUCER SPEAKING THE NEW SCHEMA (its batches carry ``tool_name``)
    and must merge correctly into the physical files. The final state is
    read through the mapping: oracle = final state with ``tool AS
    tool_name`` and no ``role`` column. In-query asserts prove no
    partition file was rewritten by the DDL commits themselves."""
    hi = _events(sf_dir, columns=["event_id"]).max("event_id")
    mid = int(hi) // 2

    def epoch_stream(lo: int, up: int) -> ray.data.Dataset:
        return _events(
            sf_dir, columns=["event_id", "user_id", "event_type", "ts"]
        ).filter(expr=f"event_id >= {lo} and event_id < {up}").map_batches(
            derive_changes_batch, batch_format="pyarrow"
        )

    with tempfile.TemporaryDirectory(prefix="cdcddl-") as d:
        lake = CDCLake(os.path.join(d, "lake"), num_partitions=16)
        lake.apply_changes(epoch_stream(0, mid), quarantine=False)
        files_before = sorted(lake.store.data_files(lake.manifest))
        lake.rename_column("tool", "tool_name")
        lake.drop_column("role")
        assert sorted(lake.store.data_files(lake.manifest)) == files_before, (
            "column DDL must not rewrite data files"
        )
        new_schema = epoch_stream(mid, int(hi) + 1).map_batches(
            lambda b: b.rename_columns(
                [{"tool": "tool_name"}.get(c, c) for c in b.column_names]
            ),
            batch_format="pyarrow",
        )
        lake.apply_changes(new_schema, quarantine=False)
        out = lake.final_table()
        assert "tool_name" in out.column_names and "role" not in out.column_names
        return out


def lake_segmented_manifest(sf_dir: str, epochs: int = 4) -> pa.Table:
    """Multi-epoch replay committing through the SEGMENTED manifest layout
    (ManifestStore.segment_size): the partition table is split into
    content-addressed pid-range segment files and each commit rewrites only
    the dirty segments + a small root — the Iceberg manifest-list idea,
    sized for 10^4-10^5-partition lakes where a monolithic root costs MBs
    of JSON per epoch (the reference's single commitBlockList root,
    RouteIngestedFile.kt:537-547, kept O(dirty)). A verbatim redelivery of
    the last epoch must be a fenced no-op that creates ZERO new segment
    files (the no-change merge skip keeps every previous entry); final
    state must equal the monolithic layout's byte-for-byte."""
    hi = _events(sf_dir, columns=["event_id"]).max("event_id")
    bounds = np.linspace(0, hi + 1, epochs + 1).astype(np.int64)

    def epoch_stream(lo: int, up: int) -> ray.data.Dataset:
        return _events(
            sf_dir, columns=["event_id", "user_id", "event_type", "ts"]
        ).filter(expr=f"event_id >= {lo} and event_id < {up}").map_batches(
            derive_changes_batch, batch_format="pyarrow"
        )

    with tempfile.TemporaryDirectory(prefix="cdcseg-") as d:
        lake = CDCLake(
            os.path.join(d, "lake"), num_partitions=16, manifest_segment_size=4
        )
        for i in range(epochs):
            lake.apply_changes(
                epoch_stream(int(bounds[i]), int(bounds[i + 1])), quarantine=False
            )
        seg_dir = os.path.join(d, "lake", "manifests", "segments")
        n_segs = len(os.listdir(seg_dir))
        res = lake.apply_changes(
            epoch_stream(int(bounds[-2]), int(bounds[-1])), quarantine=False
        )
        assert res.changes_applied == 0, "fencing must no-op a replayed epoch"
        assert len(os.listdir(seg_dir)) == n_segs, (
            "fenced replay must reuse every manifest segment"
        )
        return lake.final_table()


def lake_merge_into(sf_dir: str) -> pa.Table:
    """MERGE INTO over the committed lake: build final state from the
    derived change stream, then merge a deterministic staging set
    (``event_id % 7 == 0``; every third staging row a DELETE) through
    ``CDCLake.merge_into`` — matched-probe co-partitioned with the lake's
    own partition function, compiled ops through the normal epoch path."""

    def stage_batch(b: pa.Table) -> pa.Table:
        keep = b["event_id"].to_numpy() % 7 == 0
        b = b.filter(pa.array(keep))
        eid = b["event_id"].to_numpy()
        uid = b["user_id"].to_numpy()
        conv = np.char.add(
            "conv-", np.char.zfill(uid.astype("U"), 6)
        )
        return pa.table(
            {
                "seq": pa.array(eid.astype(np.int64)),
                "conv_id": pa.array(conv),
                "turn_idx": pa.array(((eid * 3) % 25).astype(np.int32)),
                "role": pa.array(
                    np.where(eid % 2 == 0, "user", "assistant")
                ),
                "text": pa.array(np.char.add("s-", eid.astype("U"))),
                "tool": pa.array(np.full(len(eid), "merge", object)),
                "ts": b["ts"],
                "del_flag": pa.array(eid % 3 == 0),
            }
        )

    staging = _events(sf_dir, columns=["event_id", "user_id", "ts"]).map_batches(
        stage_batch, batch_format="pyarrow"
    )
    with tempfile.TemporaryDirectory(prefix="cdclake-") as d:
        lake = CDCLake(os.path.join(d, "lake"), num_partitions=16)
        lake.apply_changes(derived_change_stream(sf_dir), quarantine=False)
        lake.merge_into(staging)
        return lake.final_table()


def lake_bitemporal_asof(sf_dir: str) -> pa.Table:
    """Bitemporal slice: TRANSACTION-time travel (state as committed after
    the SECOND of four epochs — epoch ids are 0-based, so ``epoch=1`` —
    via the archived-manifest reader) × EVENT-time cut
    (rows whose ``ts`` ≤ V, V = max ts of the stream's first half).
    Epoch bounds use integer arithmetic ((i·n)//4) so the SQL oracle's
    seq fence is bit-identical — linspace floats could differ by one id."""
    hi = int(_events(sf_dir, columns=["event_id"]).max("event_id"))
    n = hi + 1
    bounds = [(i * n) // 4 for i in range(5)]
    vmax = (
        _events(sf_dir, columns=["event_id", "ts"])
        .filter(expr=f"event_id <= {hi // 2}")
        .max("ts")
    )

    def epoch_stream(lo: int, up: int) -> ray.data.Dataset:
        return _events(
            sf_dir, columns=["event_id", "user_id", "event_type", "ts"]
        ).filter(expr=f"event_id >= {lo} and event_id < {up}").map_batches(
            derive_changes_batch, batch_format="pyarrow"
        )

    with tempfile.TemporaryDirectory(prefix="cdclake-") as d:
        lake = CDCLake(os.path.join(d, "lake"), num_partitions=16)
        for i in range(4):
            lake.apply_changes(
                epoch_stream(bounds[i], bounds[i + 1]), quarantine=False
            )
        t = lake.final_table(epoch=1)  # transaction-time travel
    t = t.filter(pc.less_equal(t["ts"], pa.scalar(vmax, t.schema.field("ts").type)))
    return t


def conv_partial_cols(b: pa.Table, cols: list[str]) -> pd.DataFrame:
    """Per-batch LWW combiner for the derived change stream: argmax(seq)
    per (conv_id, turn_idx) inside the batch, keeping ``cols``; adds the
    conv-hash bucket column (64 buckets) for the single coarse exchange.
    Shared by every conv-level analytics op (role audit, transcript
    assembly shape, widen4 latency/tool-path) so the LWW + bucket-hash
    invariant lives in exactly one place."""
    df = pd.DataFrame(
        {
            "conv_id": b["conv_id"].to_numpy(zero_copy_only=False),
            "turn_idx": b["turn_idx"].to_numpy().astype(np.int64),
            "seq": b["seq"].to_numpy(),
            "op": b["op"].to_numpy(zero_copy_only=False),
            **{c: b[c].to_numpy(zero_copy_only=False) for c in cols},
        }
    )
    idx = df.groupby(["conv_id", "turn_idx"], sort=False)["seq"].idxmax()
    w = df.loc[idx].reset_index(drop=True)
    uid = w["conv_id"].str[5:].astype(np.int64).to_numpy()
    w["bucket"] = (
        (uid.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(64)
    ).astype(np.int64)
    return w


def conv_live(g: pd.DataFrame) -> pd.DataFrame:
    """In-bucket final LWW + delete-drop, sorted (conv_id, turn_idx)."""
    idx = g.groupby(["conv_id", "turn_idx"], sort=False)["seq"].idxmax()
    w = g.loc[idx]
    return w[w["op"] != "delete"].sort_values(["conv_id", "turn_idx"])


def conv_loss_mask_spans(sf_dir: str) -> pa.Table:
    """Assistant-only loss-mask span extraction (the SFT data-prep step):
    per conversation's FINAL transcript, turns pack into one training
    string as ``role: text\\n`` in turn order, and each assistant turn
    contributes the [span_start, span_end) character range of its ``text``
    within the packed string — the spans a trainer leaves unmasked while
    user/tool turns contribute context only. Same shape as
    conv_transcript_assembly: per-batch LWW combiner → ONE conv-hash
    bucket exchange → vectorized per-conv prefix-sum of contribution
    lengths inside the bucket (no packed text ever materializes; only the
    4-column span table leaves the fold)."""

    def partial(b: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(
            conv_partial_cols(b, ["role", "text"]), preserve_index=False
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        live = conv_live(g)
        empty = pd.DataFrame(
            {
                "conv_id": pd.Series([], dtype=object),
                "turn_idx": pd.Series([], dtype="int64"),
                "span_start": pd.Series([], dtype="int64"),
                "span_end": pd.Series([], dtype="int64"),
            }
        )
        if not len(live):
            return empty
        rl = live["role"].str.len().to_numpy().astype(np.int64)
        tl = live["text"].str.len().to_numpy().astype(np.int64)
        contrib = rl + 2 + tl + 1  # "role: text\n"
        off = (
            pd.Series(contrib).groupby(live["conv_id"].to_numpy()).cumsum()
            .to_numpy()
            - contrib
        )
        start = off + rl + 2
        mask = live["role"].to_numpy() == "assistant"
        if not mask.any():
            return empty
        return pd.DataFrame(
            {
                "conv_id": live["conv_id"].to_numpy()[mask],
                "turn_idx": live["turn_idx"].to_numpy()[mask].astype("int64"),
                "span_start": start[mask],
                "span_end": (start + tl)[mask],
            }
        )

    out = (
        derived_change_stream(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
    )
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )


def conv_role_alternation_audit(sf_dir: str) -> pa.Table:
    """Transcript-health audit: per conversation, does the final state
    alternate user/assistant strictly by turn order? Reports the census
    (n_alternating / n_broken) plus total adjacent violations — the
    data-quality signal a dialogue-training pipeline filters on. Same
    latest-op combiner + ONE conv-hash exchange as the assembly ops;
    violations are a shifted-equality mask per conversation (boundary-
    masked, no per-turn loop)."""

    def partial(b: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(
            conv_partial_cols(b, ["role"]), preserve_index=False
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        live = conv_live(g)
        conv = live["conv_id"].to_numpy()
        role = live["role"].to_numpy()
        same_conv = np.r_[False, conv[1:] == conv[:-1]]
        viol = same_conv & np.r_[False, role[1:] == role[:-1]]
        per = pd.DataFrame({"conv_id": conv, "v": viol.astype(np.int64)})
        agg = per.groupby("conv_id", as_index=False).agg(v=("v", "sum"))
        return pd.DataFrame(
            {
                "n_alternating": [int((agg["v"] == 0).sum())],
                "n_broken": [int((agg["v"] > 0).sum())],
                "n_violations": [int(agg["v"].sum())],
            }
        )

    parts = (
        derived_change_stream(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "n_alternating": [np.int64(parts["n_alternating"].sum())],
            "n_broken": [np.int64(parts["n_broken"].sum())],
            "n_violations": [np.int64(parts["n_violations"].sum())],
        }
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def dataset_card(final_ds: ray.data.Dataset) -> pa.Table:
    """Dataset-card metrics over a final-state Dataset (shared by the
    driver query and the CLI ``card`` command): scalar per-batch partials
    + per-batch-deduped conv/tool keys for the exact distincts."""

    def partial(b: pa.Table) -> pa.Table:
        role = b["role"].to_numpy(zero_copy_only=False)
        text = b["text"].to_numpy(zero_copy_only=False)
        conv = pd.unique(pd.Series(b["conv_id"].to_numpy(zero_copy_only=False)))
        tool = pd.unique(
            pd.Series(b["tool"].to_numpy(zero_copy_only=False)).dropna()
        )
        scal = pd.DataFrame(
            {
                "kind": ["s"],
                "key": ["_"],
                "n_rows": [np.int64(b.num_rows)],
                "n_user": [np.int64((role == "user").sum())],
                "n_assistant": [np.int64((role == "assistant").sum())],
                "chars": [
                    np.int64(sum(len(t) for t in text if t is not None))
                ],
                "max_turn": [
                    np.int64(b["turn_idx"].to_numpy().max())
                    if b.num_rows
                    else np.int64(-1)
                ],
            }
        )
        dedup = pd.DataFrame(
            {
                "kind": ["c"] * len(conv) + ["t"] * len(tool),
                "key": list(conv) + list(tool),
                "n_rows": np.int64(0),
                "n_user": np.int64(0),
                "n_assistant": np.int64(0),
                "chars": np.int64(0),
                "max_turn": np.int64(-1),
            }
        )
        return pa.Table.from_pandas(
            pd.concat([scal, dedup], ignore_index=True), preserve_index=False
        )

    parts = final_ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    s = parts[parts["kind"] == "s"]
    metrics = {
        "n_rows": int(s["n_rows"].sum()),
        "n_conversations": int(
            parts.loc[parts["kind"] == "c", "key"].nunique()
        ),
        "n_user_rows": int(s["n_user"].sum()),
        "n_assistant_rows": int(s["n_assistant"].sum()),
        "n_distinct_tools": int(
            parts.loc[parts["kind"] == "t", "key"].nunique()
        ),
        "total_text_chars": int(s["chars"].sum()),
        "max_turn_idx": int(s["max_turn"].max()),
    }
    out = pd.DataFrame(
        {"metric": list(metrics), "value": np.array(list(metrics.values()), np.int64)}
    ).sort_values("metric")
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def lake_dataset_card(sf_dir: str) -> pa.Table:
    """Dataset-card metrics over the committed final state (the datasheet
    a curated corpus ships with) — one engine replay, then the shared
    ``dataset_card`` fold (O(batches) scalar rows + deduped keys)."""
    with tempfile.TemporaryDirectory(prefix="cdclake-") as d:
        lake = CDCLake(os.path.join(d, "lake"), num_partitions=16)
        lake.apply_changes(derived_change_stream(sf_dir), quarantine=False)
        return dataset_card(lake.final_dataset())


def cdc_changefeed_envelopes(sf_dir: str) -> pa.Table:
    """Downstream changefeed export (Debezium-style envelopes with BEFORE
    and AFTER images — what a consumer of the reference's report stream
    would subscribe to): ``CDCLake.changefeed_between`` diffs the two
    archived manifests as co-partitioned file pairs (the rebase machinery
    as a read-only feed); unchanged keys never leave the diff task."""
    hi = int(_events(sf_dir, columns=["event_id"]).max("event_id"))
    n = hi + 1
    cut = n // 2

    def stream(lo: int, up: int) -> ray.data.Dataset:
        return _events(
            sf_dir, columns=["event_id", "user_id", "event_type", "ts"]
        ).filter(expr=f"event_id >= {lo} and event_id < {up}").map_batches(
            derive_changes_batch, batch_format="pyarrow"
        )

    with tempfile.TemporaryDirectory(prefix="cdclake-") as d:
        lake = CDCLake(os.path.join(d, "lake"), num_partitions=16)
        lake.apply_changes(stream(0, cut), quarantine=False)
        lake.apply_changes(stream(cut, n), quarantine=False)
        out = (
            lake.changefeed_between(0, 1)
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
    out["turn_idx"] = out["turn_idx"].astype("int32")
    return pa.Table.from_pandas(out, preserve_index=False)


def lake_branch_isolation(sf_dir: str) -> pa.Table:
    """Zero-copy branching (Nessie/LakeFS-style dev/test isolation over
    one physical lake): main ingests the first 3/4 of the stream, branch
    'exp' is forked (manifest copy only — no data copied) and ingests the
    last quarter ALONE. The census proves isolation both ways: main's
    state equals the 3/4 window, the branch's equals the full window, and
    the in-query assertion re-reads main AFTER the branch write. Branch
    partition files carry a branch tag so rewrites never collide;
    ``vacuum`` honors every branch's references."""
    hi = int(_events(sf_dir, columns=["event_id"]).max("event_id"))
    n = hi + 1
    cut = (3 * n) // 4

    def stream(lo: int, up: int) -> ray.data.Dataset:
        return _events(
            sf_dir, columns=["event_id", "user_id", "event_type", "ts"]
        ).filter(expr=f"event_id >= {lo} and event_id < {up}").map_batches(
            derive_changes_batch, batch_format="pyarrow"
        )

    def census(t: pa.Table, side: str) -> dict:
        convs = len(pd.unique(pd.Series(t["conv_id"].to_numpy(zero_copy_only=False))))
        return {"side": side, "n_rows": t.num_rows, "n_convs": convs}

    with tempfile.TemporaryDirectory(prefix="cdclake-") as d:
        lake = CDCLake(os.path.join(d, "lake"), num_partitions=16)
        lake.apply_changes(stream(0, cut), quarantine=False)
        main_before = lake.final_table()
        br = lake.create_branch("exp")
        br.apply_changes(stream(cut, n), quarantine=False)
        rows = [
            census(lake.final_table(), "main"),
            census(br.final_table(), "branch"),
        ]
        assert lake.final_table().equals(main_before), (
            "branch write leaked into main"
        )
    out = pd.DataFrame(rows)
    for c in ("n_rows", "n_convs"):
        out[c] = out[c].astype(np.int64)
    return pa.Table.from_pandas(
        out.sort_values("side").reset_index(drop=True), preserve_index=False
    )


def windowed_emit_on_watermark(sf_dir: str) -> pa.Table:
    """Event-time windows under out-of-order arrival with WATERMARK-GATED
    emission (the streaming semantics Ray Data lacks natively): the stream
    arrives in 4 seq-ordered epochs; after each, daily windows whose end
    falls below ``watermark = max event-time seen − 1 day`` CLOSE and emit;
    rows for an already-closed window are CORRECTIONS (the reprocessing
    output a downstream consumer reconciles). Per-epoch day-counts are
    distributed partials (wire ≤ span-days); only the bounded open-window
    ledger lives at the driver — the same bounded-domain argument as the
    correlation matrix. Output per day: rows in the closed emission,
    late corrections, and the closing epoch (4 = final flush)."""
    hi = int(_events(sf_dir, columns=["event_id"]).max("event_id"))
    n = hi + 1
    bounds = [(i * n) // 4 for i in range(5)]
    DAY_US = 86_400_000_000

    barr = np.array(bounds[1:], np.int64)

    def partial(b: pa.Table) -> pa.Table:
        # ONE scan: every row tagged with its arrival epoch; the per-epoch
        # loop below replays the tiny (epoch, day) frame, not the table
        tsu = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        ae = np.searchsorted(barr, b["event_id"].to_numpy(), side="right")
        df = pd.DataFrame({"ae": ae, "day": tsu // DAY_US, "tsu": tsu})
        agg = df.groupby(["ae", "day"], as_index=False).agg(
            c=("tsu", "size"), max_ts=("tsu", "max")
        )
        return pa.Table.from_pandas(agg, preserve_index=False)

    frame = (
        _events(sf_dir, columns=["event_id", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["ae", "day"], as_index=False)
        .agg(c=("c", "sum"), max_ts=("max_ts", "max"))
    )

    def day_counts(epoch: int) -> tuple[pd.DataFrame, int]:
        g = frame[frame["ae"] == epoch]
        if not len(g):
            return g[["day", "c"]], -1
        return g[["day", "c"]], int(g["max_ts"].max())

    emitted_at: dict[int, int] = {}  # day -> closing epoch
    emitted_n: dict[int, int] = {}
    corrections: dict[int, int] = {}
    open_counts: dict[int, int] = {}
    max_ts = -(1 << 62)
    for i in range(4):
        agg, epoch_max = day_counts(i)
        max_ts = max(max_ts, epoch_max)
        wm = max_ts - DAY_US
        for day, c in zip(agg["day"], agg["c"]):
            d, c = int(day), int(c)
            if d in emitted_at:
                corrections[d] = corrections.get(d, 0) + c  # late arrival
            else:
                open_counts[d] = open_counts.get(d, 0) + c
        # close every open window whose end (exclusive) <= watermark
        for d in sorted(open_counts):
            if (d + 1) * DAY_US <= wm:
                emitted_at[d] = i
                emitted_n[d] = open_counts.pop(d)
    for d, c in open_counts.items():  # final flush
        emitted_at[d] = 4
        emitted_n[d] = c
    days = sorted(emitted_at)
    out = pd.DataFrame(
        {
            "day": [
                str(np.datetime64(d * DAY_US, "us").astype("datetime64[D]"))
                for d in days
            ],
            "n_emitted": [np.int64(emitted_n[d]) for d in days],
            "n_corrections": [np.int64(corrections.get(d, 0)) for d in days],
            "emit_epoch": [np.int64(emitted_at[d]) for d in days],
        }
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def incremental_agg_recompute(sf_dir: str) -> pa.Table:
    """Changed-partitions-only aggregate refresh (the incremental-compute
    economics that matter at 100 TB: an epoch touching 3 of 10,000
    partitions should cost 3 partition reads, not a table scan). Epoch A
    ingests 3/4 of the stream and caches per-partition role counts;
    epoch B ingests the rest; the refresh recomputes ONLY
    ``changed_partitions(epoch_A)`` and splices them over the cache. The
    in-query assertion proves splice == full recompute (and that at least
    one partition was skippable at these scales would be data-dependent,
    so it is NOT asserted); the driver gate hash-checks the final counts
    against the plain window oracle."""
    hi = int(_events(sf_dir, columns=["event_id"]).max("event_id"))
    n = hi + 1
    cut = (3 * n) // 4

    def stream(lo: int, up: int) -> ray.data.Dataset:
        return _events(
            sf_dir, columns=["event_id", "user_id", "event_type", "ts"]
        ).filter(expr=f"event_id >= {lo} and event_id < {up}").map_batches(
            derive_changes_batch, batch_format="pyarrow"
        )

    def role_counts_for(lake: CDCLake, pids: list[int] | None) -> pd.DataFrame:
        man = lake.manifest
        files = [
            os.path.join(lake.lake_dir, e.file)
            for pid, e in sorted(man.partitions.items())
            if pids is None or pid in pids
        ]
        if not files:
            return pd.DataFrame({"pid": [], "role": [], "n": []})
        ds = ray.data.read_parquet(files, columns=["conv_id", "role"])

        def partial(b: pa.Table) -> pa.Table:
            from data_exchange_routing_ray.hashing import partition_ids

            df = pd.DataFrame(
                {
                    "pid": partition_ids(
                        b["conv_id"].to_numpy(zero_copy_only=False), 16
                    ),
                    "role": b["role"].to_numpy(zero_copy_only=False),
                }
            )
            return pa.Table.from_pandas(
                df.groupby(["pid", "role"], as_index=False).size().rename(
                    columns={"size": "n"}
                ),
                preserve_index=False,
            )

        return (
            ds.map_batches(partial, batch_format="pyarrow")
            .to_pandas()  # ≤ P×|roles| partial rows
            .groupby(["pid", "role"], as_index=False)
            .agg(n=("n", "sum"))
        )

    with tempfile.TemporaryDirectory(prefix="cdclake-") as d:
        lake = CDCLake(os.path.join(d, "lake"), num_partitions=16)
        res_a = lake.apply_changes(stream(0, cut), quarantine=False)
        cache = role_counts_for(lake, None)  # cached per-partition counts
        lake.apply_changes(stream(cut, n), quarantine=False)
        changed = lake.changed_partitions(res_a.epoch)
        fresh = role_counts_for(lake, changed)
        spliced = pd.concat(
            [cache[~cache["pid"].isin(changed)], fresh], ignore_index=True
        )
        full = role_counts_for(lake, None)
        a = spliced.groupby("role")["n"].sum().sort_index()
        b = full.groupby("role")["n"].sum().sort_index()
        assert a.equals(b), "incremental splice diverged from full recompute"
    out = pd.DataFrame({"role": a.index, "n": a.to_numpy(np.int64)})
    return pa.Table.from_pandas(
        out.sort_values("role").reset_index(drop=True), preserve_index=False
    )


def emb_kcenter_coreset(sf_dir: str, k: int = 8) -> pa.Table:
    """Greedy k-center coreset selection over the embedding table (the
    diversity-sampling step of training-data curation: pick K points
    maximizing pairwise spread; the farthest-point heuristic is the
    classic 2-approximation). Each of the K rounds is ONE distributed
    scan: centers broadcast via ``ray.put`` (K × dim — tiny), per block a
    vectorized min-distance-to-centers + local argmax, then a
    |blocks|-row driver fold picks the global farthest point
    (deterministic: max distance, ties by vec_id). Returns the selection
    order with each point's distance-to-previous-centers (the coverage
    radius decreases monotonically — asserted in-query). Rows-only gate;
    serial equivalence in ``test_kcenter_matches_serial_greedy``."""
    import ray as _ray

    ds = _embeddings(sf_dir)
    seed = ds.filter(expr="vec_id == 0").take(1)[0]
    centers = [np.asarray(seed["embedding"], np.float64)]
    chosen = [0]
    radii = [0.0]

    for _ in range(k - 1):
        cref = _ray.put(np.stack(centers))

        def far_partial(b: pa.Table) -> pa.Table:
            from data_exchange_routing_ray.functions.similarity import (
                list_col_matrix,
            )

            C = _ray.get(cref)
            M = list_col_matrix(b["embedding"])
            # unit vectors: squared L2 = 2 - 2·cos; min over centers
            d = (2.0 - 2.0 * (M @ C.T)).min(axis=1)
            ids = b["vec_id"].to_numpy()
            # local winner: max distance, tie → smallest vec_id
            order = np.lexsort((ids, -d))
            w = order[0]
            return pa.table(
                {
                    "vec_id": pa.array([int(ids[w])], pa.int64()),
                    "dist2": pa.array([float(d[w])], pa.float64()),
                    # the winner's vector rides along (dim × 8 B per block)
                    # so the driver never runs a fetch scan per round
                    "vec": pa.array([M[w].tobytes()], pa.binary()),
                }
            )

        cand = ds.map_batches(far_partial, batch_format="pyarrow").to_pandas()
        cand = cand.sort_values(
            ["dist2", "vec_id"], ascending=[False, True], kind="stable"
        )
        win = cand.iloc[0]
        chosen.append(int(win["vec_id"]))
        radii.append(float(win["dist2"]))
        centers.append(np.frombuffer(win["vec"], dtype=np.float64))

    # farthest-point property: each new point is at most as far as the last
    assert all(radii[i] >= radii[i + 1] - 1e-9 for i in range(1, len(radii) - 1))
    out = pd.DataFrame(
        {
            "pick_order": np.arange(k, dtype=np.int64),
            "vec_id": np.array(chosen, np.int64),
            "dist2_to_centers": np.round(np.array(radii), 6),
        }
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def udf_failures_quarantined(sf_dir: str) -> pa.Table:
    """Failure-isolating UDF stage end-to-end: a per-row transform (parse
    ``props`` JSON → k) with planted poison rows (``event_id % 37 == 0``
    raises). ``guarded_udf_batch`` keeps the vectorized kernel on clean
    batches and degrades ONLY poison batches to the per-row isolating
    loop; the census (rows ok / rows failed / Σk over ok) hash-matches the
    oracle's arithmetic — so a UDF failure that leaked into the valid set
    (or a dropped row) breaks the gate."""
    import json as _json

    from data_exchange_routing_ray.stages.udf_guard import guarded_udf_batch

    def vector_fn(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy()
        if (eid % 37 == 0).any():
            raise ValueError("poison rows in batch")  # forces row isolation
        k = pc.cast(
            pc.extract_regex(b["props"], r'"k": (?P<k>\d+)')
            .field("k"),
            pa.int64(),
        )
        return pa.table({"event_id": b["event_id"], "k": k})

    def row_fn(row: dict) -> dict:
        if row["event_id"] % 37 == 0:
            raise ValueError("poison event")
        return {"event_id": row["event_id"], "k": _json.loads(row["props"])["k"]}

    row_fn.output_keys = ["event_id", "k"]

    def stage(b: pa.Table) -> pa.Table:
        out = guarded_udf_batch(b, vector_fn, row_fn)
        ok = pc.is_null(out["error"])
        n_ok = int(pc.sum(pc.cast(ok, pa.int64())).as_py() or 0)
        ksum = int(
            pc.sum(pc.if_else(ok, out["k"], pa.scalar(0, pa.int64()))).as_py()
            or 0
        )
        return pa.table(
            {
                "n_ok": pa.array([n_ok], pa.int64()),
                "n_failed": pa.array([out.num_rows - n_ok], pa.int64()),
                "sum_k_ok": pa.array([ksum], pa.int64()),
            }
        )

    parts = (
        _events(sf_dir, columns=["event_id", "props"])
        .map_batches(stage, batch_format="pyarrow")
        .to_pandas()
    )
    out = pd.DataFrame(
        {
            "n_ok": [np.int64(parts["n_ok"].sum())],
            "n_failed": [np.int64(parts["n_failed"].sum())],
            "sum_k_ok": [np.int64(parts["sum_k_ok"].sum())],
        }
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def lake_rollback_replay(sf_dir: str) -> pa.Table:
    """Savepoint rollback + replay convergence through the driver gate:
    ingest 4 epochs, ROLL BACK to the epoch-1 savepoint (head moves
    forward, state moves back, watermark lowers), then replay the undone
    seq range — the final state must equal the never-rolled-back full
    window (the SQL oracle). Exercises rollback_to's watermark semantics
    end-to-end: if the restored watermark were wrong, fencing would drop
    the replayed changes and the hash would mismatch."""
    hi = int(_events(sf_dir, columns=["event_id"]).max("event_id"))
    n = hi + 1
    bounds = [(i * n) // 4 for i in range(5)]

    def stream(lo: int, up: int) -> ray.data.Dataset:
        return _events(
            sf_dir, columns=["event_id", "user_id", "event_type", "ts"]
        ).filter(expr=f"event_id >= {lo} and event_id < {up}").map_batches(
            derive_changes_batch, batch_format="pyarrow"
        )

    with tempfile.TemporaryDirectory(prefix="cdclake-") as d:
        lake = CDCLake(os.path.join(d, "lake"), num_partitions=16)
        for i in range(4):
            lake.apply_changes(stream(bounds[i], bounds[i + 1]), quarantine=False)
        lake.rollback_to(1)  # savepoint: state after the second epoch
        assert lake.applied_offset < bounds[4] - 1  # watermark regressed
        # replay the undone range (epochs 3-4's seqs pass the lowered fence)
        lake.apply_changes(stream(bounds[2], bounds[4]), quarantine=False)
        return lake.final_table()


def lake_lineage_consistency(sf_dir: str, epochs: int = 4) -> pa.Table:
    """Lineage↔lake reconciliation audit (the report-stream cross-check an
    operator runs before trusting a lake): after a multi-epoch replay,
    every partition's LATEST SUCCESS lineage row must agree with the
    committed manifest entry AND with the physical parquet row count; the
    manifest watermark must equal the lineage max offset. Engine-internal
    invariants (no SQL analog — the whole point is checking the engine
    against itself), so the gate is rows-only plus the in-query
    assertions."""
    hi = int(_events(sf_dir, columns=["event_id"]).max("event_id"))
    n = hi + 1
    bounds = [(i * n) // epochs for i in range(epochs + 1)]

    def epoch_stream(lo: int, up: int) -> ray.data.Dataset:
        return _events(
            sf_dir, columns=["event_id", "user_id", "event_type", "ts"]
        ).filter(expr=f"event_id >= {lo} and event_id < {up}").map_batches(
            derive_changes_batch, batch_format="pyarrow"
        )

    with tempfile.TemporaryDirectory(prefix="cdclake-") as d:
        lake = CDCLake(os.path.join(d, "lake"), num_partitions=16)
        for i in range(epochs):
            lake.apply_changes(epoch_stream(bounds[i], bounds[i + 1]), quarantine=False)
        lin = lake.lineage.read_all().to_pandas()
        man = lake.manifest
        success = lin[lin["status"] == "SUCCESS"]
        latest = success.sort_values("epoch").groupby("partition").tail(1)
        mismatches = 0
        checked = 0
        for row in latest.itertuples(index=False):
            pid = int(row.partition)
            e = man.partitions.get(pid)
            if e is None:
                mismatches += 1
                continue
            checked += 1
            import pyarrow.parquet as _pq

            physical = _pq.ParquetFile(
                os.path.join(lake.lake_dir, e.file)
            ).metadata.num_rows
            if not (
                int(row.row_count) == e.rows == physical
                and int(row.epoch) == e.epoch
                and int(row.applied_offset) == e.applied_offset
            ):
                mismatches += 1
        wm_ok = int(man.applied_offset) == int(success["applied_offset"].max())
        assert mismatches == 0 and wm_ok, (
            f"lineage/lake divergence: {mismatches} partitions, wm_ok={wm_ok}"
        )
        out = pd.DataFrame(
            {
                "partitions_checked": [np.int64(checked)],
                "mismatches": [np.int64(mismatches)],
                "watermark_consistent": [np.int64(1 if wm_ok else 0)],
                "epochs": [np.int64(epochs)],
            }
        )
    return pa.Table.from_pandas(out, preserve_index=False)


def cdc_inflight_repair(sf_dir: str) -> pa.Table:
    """In-flight repair pass BEFORE validation (the reference's
    getOrDefault/legacy-alias posture taken one step further): repairable
    corruptions are fixed deterministically — op alias mapping
    ('upsert?' → update), turn_idx re-derived from the ordering token
    (seq % 25), null ts defaulted — and the repaired stream then runs the
    REAL validator; unrepairable rows (null conv_id: no key) still
    dead-letter. Output is the audit census: per-rule repair counts +
    post-repair valid/quarantined totals. The engine earns its numbers by
    actually repairing and re-validating; the oracle derives them from the
    corruption arithmetic — a buggy repair (row still invalid after 'fix')
    breaks the match."""
    default_ts = pa.scalar(
        np.datetime64("2024-01-01T00:00:00", "us"), pa.timestamp("us")
    )

    def repair_and_census(b: pa.Table) -> pa.Table:
        op = b["op"].to_numpy(zero_copy_only=False)
        alias = op == "upsert?"
        if alias.any():
            op = np.where(alias, "update", op)
            b = b.set_column(
                b.column_names.index("op"), "op", pa.array(op, pa.string())
            )
        turn_null = pc.is_null(b["turn_idx"]).to_numpy(zero_copy_only=False)
        if turn_null.any():
            seq = b["seq"].to_numpy()
            fixed = np.where(
                turn_null,
                (seq % 25).astype(np.int32),
                b["turn_idx"].to_numpy(zero_copy_only=False),
            )
            b = b.set_column(
                b.column_names.index("turn_idx"),
                "turn_idx",
                pa.array(fixed.astype(np.int32), pa.int32()),
            )
        ts_null = pc.is_null(b["ts"]).to_numpy(zero_copy_only=False)
        if ts_null.any():
            b = b.set_column(
                b.column_names.index("ts"),
                "ts",
                pc.fill_null(b["ts"], default_ts),
            )
        v = validate_batch(b)
        quarantined = int(pc.sum(pc.is_valid(v["error"])).as_py() or 0)
        return pa.table(
            {
                "metric": pa.array(
                    [
                        "repaired_op_alias",
                        "repaired_turn_from_seq",
                        "repaired_ts_default",
                        "still_quarantined",
                        "valid_rows",
                    ]
                ),
                "n": pa.array(
                    [
                        int(alias.sum()),
                        int(turn_null.sum()),
                        int(ts_null.sum()),
                        quarantined,
                        b.num_rows - quarantined,
                    ],
                    pa.int64(),
                ),
            }
        )

    out = (
        derived_change_stream(sf_dir, corrupt=True)
        .map_batches(repair_and_census, batch_format="pyarrow")
        .groupby("metric")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("metric")
        .reset_index(drop=True)
    )
    out["n"] = out["n"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def pseudonymize_conv_ids(sf_dir: str, key: str = "k1") -> pa.Table:
    """Privacy-preserving export of the final state: conversation ids are
    replaced by a KEYED digest (sha256 over key|conv_id, truncated to 16
    hex chars) and the free-text column is DROPPED (data minimization) —
    the de-identified release a public-health pipeline ships downstream
    while the key holder can still re-link. Pure per-batch map over the
    replayed final state; the digest loop is per-row by necessity (no
    vectorized sha256 kernel in-container — a production build would use
    a C kernel), bounded per batch and embarrassingly parallel."""
    import hashlib

    def pseud(b: pa.Table) -> pa.Table:
        ids = b["conv_id"].to_numpy(zero_copy_only=False)
        pid = [
            hashlib.sha256(f"{key}|{c}".encode()).hexdigest()[:16] for c in ids
        ]
        return pa.table(
            {
                "pid": pa.array(pid, pa.string()),
                "turn_idx": b["turn_idx"],
                "role": b["role"],
                "tool": b["tool"],
                "ts": b["ts"],
            }
        )

    with tempfile.TemporaryDirectory(prefix="cdclake-") as d:
        lake = CDCLake(os.path.join(d, "lake"), num_partitions=16)
        lake.apply_changes(derived_change_stream(sf_dir), quarantine=False)
        out = (
            lake.final_dataset()
            .map_batches(pseud, batch_format="pyarrow")
            .to_pandas()
        )
    out = out.sort_values(["pid", "turn_idx"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def cdc_quarantine_counts(sf_dir: str) -> pa.Table:
    """Validation matrix over a corrupted stream: dead-letter rows per exact
    error message (first-failing-rule order)."""
    bad = (
        derived_change_stream(sf_dir, corrupt=True)
        .map_batches(validate_batch, batch_format="pyarrow")
        .map_batches(keep_invalid, batch_format="pyarrow")
    )
    out = bad.groupby("error").aggregate(Count(alias_name="n"))
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def cdc_conv_watermarks(sf_dir: str) -> pa.Table:
    """Per-conversation applied-offset watermark + event count (A-aggregates).

    conv_id cardinality grows with the data, so the reduce is a per-batch
    pandas partial + ONE coarse-bucket shuffle with a vectorized in-bucket
    groupby — not ``Dataset.aggregate`` on the raw key (Ray's per-key
    aggregate machinery is ~25× slower at high key cardinality; see
    the dup-ngram/pack ops for the same pattern)."""
    from data_exchange_routing_ray.hashing import stable_hash_strings

    def partial(b: pa.Table) -> pa.Table:
        df = pa.table({"conv_id": b["conv_id"], "seq": b["seq"]}).to_pandas()
        g = df.groupby("conv_id", as_index=False).agg(
            watermark=("seq", "max"), n_events=("seq", "size")
        )
        g["_bucket"] = (
            stable_hash_strings(g["conv_id"].to_numpy()) % np.uint64(64)
        ).astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("conv_id", as_index=False).agg(
            watermark=("watermark", "max"), n_events=("n_events", "sum")
        )

    out = (
        derived_change_stream(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
        .to_pandas()
    )
    out["n_events"] = out["n_events"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def cdc_schema_evolution(sf_dir: str) -> pa.Table:
    """Two-epoch replay where the SECOND epoch's change batches carry an
    evolved schema — an added ``lang`` column AND widened types
    (``turn_idx`` int32→int64, ``ts`` us→ns). The merge unifies schemas;
    epoch-1 survivors backfill ``lang`` with null (SURVEY.md §1.1 dynamic-
    schema semantics: tolerant parse + defaults, RouteIngestedFile.kt:125-140)."""
    stream = derived_change_stream(sf_dir)
    hi = int(_events(sf_dir, columns=["event_id"]).max("event_id")) + 1
    mid = hi // 2

    def evolve(b: pa.Table) -> pa.Table:
        seq = b["seq"].to_numpy()
        lang = np.where(seq % 2 == 0, "en", "es").astype(object)
        b = b.set_column(
            b.schema.get_field_index("turn_idx"),
            "turn_idx",
            b["turn_idx"].cast(pa.int64()),
        )
        b = b.set_column(
            b.schema.get_field_index("ts"), "ts", b["ts"].cast(pa.timestamp("ns"))
        )
        return b.append_column("lang", pa.array(lang, pa.string()))

    with tempfile.TemporaryDirectory(prefix="cdclake-") as d:
        lake = CDCLake(os.path.join(d, "lake"), num_partitions=16)
        lake.apply_changes(stream.filter(expr=f"seq < {mid}"), quarantine=False)
        evolved = stream.filter(expr=f"seq >= {mid}").map_batches(
            evolve, batch_format="pyarrow"
        )
        lake.apply_changes(evolved, quarantine=False)
        out = lake.final_table()
    # normalize for the driver compare: us timestamps, stable column order
    out = out.set_column(
        out.schema.get_field_index("ts"), "ts", out["ts"].cast(pa.timestamp("us"))
    )
    return out.select(["conv_id", "turn_idx", "role", "text", "tool", "ts", "lang"])


ROUTE_CONFIG = {
    "routes": [
        {
            "id": "transcripts-main-lake",
            "match": {"data_stream_id": "transcripts", "data_stream_route": "main"},
            "destination": "lake/clickview",
            "partition_folder": "",
            "metadata": {"tier": "hot"},
        },
        {
            "id": "transcripts-main-audit",
            "match": {"data_stream_id": "transcripts", "data_stream_route": "main"},
            "destination": "audit/clickview",
            "partition_folder": "",
            "metadata": {"tier": "audit"},
        },
        {
            "id": "transcripts-raw",
            "match": {"data_stream_id": "transcripts", "data_stream_route": "raw"},
            "destination": "lake/raw",
            "partition_folder": "",
            "metadata": {},
        },
    ]
}


def _with_stream_cols(batch: pa.Table) -> pa.Table:
    etype = batch["event_type"].to_numpy(zero_copy_only=False)
    dsid = np.where(etype == "error", "errors", "transcripts").astype(object)
    route = np.where(np.isin(etype, ["click", "view"]), "main", "raw").astype(object)
    batch = batch.append_column("data_stream_id", pa.array(dsid, pa.string()))
    return batch.append_column("data_stream_route", pa.array(route, pa.string()))


def cdc_route_expansion(sf_dir: str) -> pa.Table:
    """Broadcast route lookup + 1→N expansion: events per destination."""
    ds = _events(sf_dir, columns=["event_id", "event_type"]).map_batches(
        _with_stream_cols, batch_format="pyarrow"
    )
    router = make_router(ROUTE_CONFIG, enrich=False)
    routed = ds.map_batches(router, batch_format="pyarrow")
    ok = routed.map_batches(lambda b: split_routed(b)[0], batch_format="pyarrow")
    out = ok.groupby("destination").aggregate(Count(alias_name="n"))
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def cdc_unroutable_count(sf_dir: str) -> pa.Table:
    """Anti-join side: events with no matching route (dead-letter count)."""
    ds = _events(sf_dir, columns=["event_id", "event_type"]).map_batches(
        _with_stream_cols, batch_format="pyarrow"
    )
    router = make_router(ROUTE_CONFIG, enrich=False)
    routed = ds.map_batches(router, batch_format="pyarrow")
    bad = routed.map_batches(lambda b: split_routed(b)[1], batch_format="pyarrow")
    n = bad.count()
    return pa.table({"n_unroutable": pa.array([n], pa.int64())})


CRED_ROUTE_CONFIG = {
    # per-destination credential indirection (J2 parity: StorageAccountConfig,
    # Common.kt:103-108). "cold-sas" is deliberately absent from the map —
    # the raw route's rows must dead-letter with the exact error string.
    "credentials": {
        "hot-sas": {"kind": "sas", "account": "hotacct"},
        "audit-key": {"kind": "key", "account": "auditacct"},
    },
    "routes": [
        {
            "id": "transcripts-main-lake",
            "match": {"data_stream_id": "transcripts", "data_stream_route": "main"},
            "destination": "lake/clickview",
            "credential": "hot-sas",
        },
        {
            "id": "transcripts-main-audit",
            "match": {"data_stream_id": "transcripts", "data_stream_route": "main"},
            "destination": "audit/clickview",
            "credential": "audit-key",
        },
        {
            "id": "transcripts-raw",
            "match": {"data_stream_id": "transcripts", "data_stream_route": "raw"},
            "destination": "lake/raw",
            "credential": "cold-sas",  # NOT in the credentials map
        },
    ],
}


def cdc_route_credentials(sf_dir: str) -> pa.Table:
    """Credential-indirection routing: matched rows carry only the resolved
    credential REFERENCE (never the secret); a route naming an unknown
    credential dead-letters its rows with the exact missing-credential
    error (RouteIngestedFile.kt:154-175 analog)."""
    ds = _events(sf_dir, columns=["event_id", "event_type"]).map_batches(
        _with_stream_cols, batch_format="pyarrow"
    )
    router = make_router(CRED_ROUTE_CONFIG, enrich=False)
    routed = ds.map_batches(router, batch_format="pyarrow")

    def norm(b: pa.Table) -> pa.Table:
        # matched rows only; null-safe group keys for the driver compare
        b = b.filter(pc.is_valid(b["route_id"]))
        return pa.table(
            {
                "route_id": b["route_id"],
                "credential_ref": pc.fill_null(
                    b["credential_ref"].cast(pa.string()), ""
                ),
                "error": pc.fill_null(b["error"].cast(pa.string()), ""),
            }
        )

    out = (
        routed.map_batches(norm, batch_format="pyarrow")
        .groupby(["route_id", "credential_ref", "error"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def config_threeway_join(
    sf_dir: str, trigger_name: str = "trg-ASIA"
) -> pa.Table:
    """J5 — the ADF control-table 3-way config join, uspGetConfig.sql
    semantics (spikes/ConfigurationDrivenPipeline/DatabaseProject/dbo/
    StoredProcedures/uspGetConfig.sql): ConfigTrigger ⋈ ConfigSource ⋈
    ConfigTarget on TriggerId filtered to one @TriggerName (source ×
    target cross product within the trigger), LEFT JOIN ConfigObject on
    SourceId — sources with no objects surface with null object columns,
    and each object row carries the LoadType ('F'ull / 'I'ncremental) and
    LastModifiedTime watermark columns the pipeline consumes.

    Config tables are derived deterministically from the dims:
    trigger ← region, source/target ← nation (targets regroup by
    nationkey%5 so the cross product is non-trivial), object ← supplier
    (SourceId = s_suppkey%13+1, so sources 14..25 have NO objects — the
    LEFT-JOIN-null path is always exercised).

    100 TB shape: trigger/source/target are dimension-tiny and composed
    on the driver; the OBJECT side (the control table that grows with
    the estate) streams through map_batches with the trigger's source
    set broadcast — an index_in probe + np.repeat expansion across the
    trigger's targets, never a shuffle join."""
    reg = pd.read_parquet(os.path.join(sf_dir, "region.parquet"))
    nat = pd.read_parquet(os.path.join(sf_dir, "nation.parquet"))
    trig = pd.DataFrame({
        "trigger_id": reg["r_regionkey"].astype(np.int64) + 1,
        "trigger_name": "trg-" + reg["r_name"].astype(str),
    })
    src = pd.DataFrame({
        "source_id": nat["n_nationkey"].astype(np.int64) + 1,
        "source_name": "src-" + nat["n_name"].astype(str),
        "source_type": "blob",
        "source_config": "scfg-" + nat["n_nationkey"].astype(str),
        "trigger_id": nat["n_regionkey"].astype(np.int64) + 1,
    })
    tgt = pd.DataFrame({
        "target_name": "tgt-" + nat["n_name"].astype(str),
        "target_type": "sql",
        "target_config": "tcfg-" + nat["n_nationkey"].astype(str),
        "trigger_id": (nat["n_nationkey"].astype(np.int64) % 5) + 1,
    })
    tid = trig.loc[trig["trigger_name"] == trigger_name, "trigger_id"]
    if not len(tid):
        raise ValueError(f"no trigger named {trigger_name!r}")
    tid = int(tid.iloc[0])
    sub_src = src[src["trigger_id"] == tid].sort_values("source_id")
    sub_tgt = tgt[tgt["trigger_id"] == tid].sort_values("target_name")

    # broadcast the trigger's source set + target list; stream objects
    import ray as _ray

    src_keys = pa.array(sub_src["source_id"].to_numpy(), pa.int64())
    bcast = _ray.put((
        src_keys,
        pa.array(sub_src["source_name"], pa.string()),
        pa.array(sub_src["source_config"], pa.string()),
        sub_tgt[["target_name", "target_type", "target_config"]]
        .to_numpy(dtype=object),
    ))

    def probe_objects(b: pa.Table) -> pa.Table:
        keys, snames, scfgs, tgts = _ray.get(bcast)
        sk = b["s_suppkey"].to_numpy()
        source_id = (sk % 13 + 1).astype(np.int64)
        idx = pc.index_in(pa.array(source_id, pa.int64()), value_set=keys)
        keep = pc.is_valid(idx).to_numpy(zero_copy_only=False)
        if not keep.any():
            return _THREEWAY_SCHEMA.empty_table()
        sk = sk[keep]
        source_id = source_id[keep]
        idxk = pc.filter(idx, pa.array(keep))
        n, t = int(keep.sum()), len(tgts)
        # 1→N expansion across the trigger's targets (route-expansion idiom)
        rep = np.repeat(np.arange(n), t)
        tcol = np.tile(np.arange(t), n)
        lmt = (
            np.datetime64("2024-01-01", "us")
            + (sk % 180).astype("timedelta64[D]").astype("timedelta64[us]")
        )
        return pa.table({
            "trigger_name": pa.array([trigger_name] * n * t, pa.string()),
            "source_id": pa.array(source_id[rep], pa.int64()),
            "source_name": pc.take(snames, idxk).take(pa.array(rep)),
            "source_type": pa.array(["blob"] * n * t, pa.string()),
            "source_config": pc.take(scfgs, idxk).take(pa.array(rep)),
            "target_name": pa.array(tgts[tcol, 0], pa.string()),
            "target_type": pa.array(tgts[tcol, 1], pa.string()),
            "target_config": pa.array(tgts[tcol, 2], pa.string()),
            "object_id": pa.array(sk[rep], pa.int64()),
            "object_schema": pa.array(["dbo"] * n * t, pa.string()),
            "object_name": pa.array(
                np.char.add("obj-", sk[rep].astype(np.str_)).astype(object),
                pa.string(),
            ),
            "object_type": pa.array(["table"] * n * t, pa.string()),
            "object_config": pa.array(
                np.char.add("ocfg-", sk[rep].astype(np.str_)).astype(object),
                pa.string(),
            ),
            "load_type": pa.array(
                np.where(sk[rep] % 3 == 0, "F", "I").astype(object),
                pa.string(),
            ),
            "last_modified_time": pa.array(lmt[rep], pa.timestamp("us")),
        })

    matched = (
        _read_sized(
            os.path.join(sf_dir, "supplier.parquet"), columns=["s_suppkey"]
        )
        .map_batches(probe_objects, batch_format="pyarrow")
        .to_arrow_refs()
    )
    _parts = [t for t in map(ray.get, matched) if t.num_rows]
    matched = (
        pa.concat_tables(_parts, promote_options="default")
        if _parts
        else _THREEWAY_SCHEMA.empty_table()
    )

    # LEFT-JOIN null side: the trigger's sources with NO objects — the
    # distinct matched source set is tiny (≤ |sources|), so the anti side
    # is driver arithmetic over the broadcast dims
    have = (
        set(matched["source_id"].to_pylist()) if matched.num_rows else set()
    )
    anti = sub_src[~sub_src["source_id"].isin(have)]
    if len(anti):
        cross = anti.assign(trigger_name=trigger_name).merge(
            sub_tgt[["target_name", "target_type", "target_config"]],
            how="cross",
        )
        for c in ("object_schema", "object_name", "object_type",
                  "object_config", "load_type"):
            cross[c] = pd.Series([None] * len(cross), dtype=object)
        cross["object_id"] = pd.Series([None] * len(cross), dtype="Int64")
        cross["last_modified_time"] = pd.NaT
        anti_t = pa.Table.from_pandas(
            cross[[f.name for f in _THREEWAY_SCHEMA]],
            schema=_THREEWAY_SCHEMA, preserve_index=False,
        )
        matched = pa.concat_tables([matched, anti_t])
    out = matched.to_pandas().sort_values(
        ["source_id", "target_name", "object_id"],
        kind="stable", na_position="last",
    ).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False).cast(
        _THREEWAY_SCHEMA
    )


_THREEWAY_SCHEMA = pa.schema([
    ("trigger_name", pa.string()),
    ("source_id", pa.int64()),
    ("source_name", pa.string()),
    ("source_type", pa.string()),
    ("source_config", pa.string()),
    ("target_name", pa.string()),
    ("target_type", pa.string()),
    ("target_config", pa.string()),
    ("object_id", pa.int64()),
    ("object_schema", pa.string()),
    ("object_name", pa.string()),
    ("object_type", pa.string()),
    ("object_config", pa.string()),
    ("load_type", pa.string()),
    ("last_modified_time", pa.timestamp("us")),
])


def cdc_partition_paths(sf_dir: str) -> pa.Table:
    """Date-partition template expansion (:y/:m/:d) — rows per dest path."""

    def to_path(batch: pa.Table) -> pa.Table:
        p = folders_to_path(batch["ts"], ":y/:m/:d")
        full = pc.binary_join_element_wise(
            pa.array(["lake/transcripts"] * batch.num_rows), p, "/"
        )
        return pa.table({"dest_path": full})

    ds = _events(sf_dir, columns=["ts"]).map_batches(to_path, batch_format="pyarrow")
    out = ds.groupby("dest_path").aggregate(Count(alias_name="n"))
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def cdc_explode_turns(sf_dir: str) -> pa.Table:
    """Nested-type exploder: one change-batch row whose ``turns`` column is
    list<struct<turn_idx,text>> → N flat change rows (Arrow list-flatten,
    no Python loop)."""
    from data_exchange_routing_ray.stages.debatch import explode_turns

    def nest(b: pa.Table) -> pa.Table:
        ev = b["event_id"].to_numpy()
        n_turns = (ev % 3 + 1).astype(np.int64)  # 1..3 turns per batch row
        parent = np.repeat(np.arange(len(ev)), n_turns)
        ti = np.concatenate([np.arange(k) for k in n_turns]).astype(np.int32)
        tx = np.array(
            [f"t{e}-{i}" for e, i in zip(ev[parent], ti)], dtype=object
        )
        flat = pa.StructArray.from_arrays(
            [pa.array(ti, pa.int32()), pa.array(tx, pa.string())],
            names=["turn_idx", "text"],
        )
        offsets = np.concatenate([[0], np.cumsum(n_turns)]).astype(np.int32)
        turns = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), flat)
        return pa.table({"event_id": pa.array(ev, pa.int64()), "turns": turns})

    out = (
        _events(sf_dir, columns=["event_id"])
        .map_batches(nest, batch_format="pyarrow")
        .map_batches(explode_turns, batch_format="pyarrow")
        .to_pandas()
    )
    return pa.Table.from_pandas(
        out[["event_id", "turn_idx", "text"]], preserve_index=False
    )


def cdc_parse_urls(sf_dir: str) -> pa.Table:
    """Vectorized event-URL parsing (M1 parseMessage): synthesize blob URLs
    from events, derive account/container/folder/file columns."""
    from data_exchange_routing_ray.stages.route import parse_event_urls

    def synth_url(b: pa.Table) -> pa.Table:
        ev = b["event_id"].to_numpy()
        urls = [
            f"https://acct{e % 3}.blob.example.com/c{e % 5}/f{e % 7}/d{e % 2}/blob-{e}.json"
            for e in ev
        ]
        return pa.table(
            {"event_id": pa.array(ev, pa.int64()), "url": pa.array(urls, pa.string())}
        )

    out = (
        _events(sf_dir, columns=["event_id"])
        .map_batches(synth_url, batch_format="pyarrow")
        .map_batches(lambda b: parse_event_urls(b), batch_format="pyarrow")
        .to_pandas()
    )
    return pa.Table.from_pandas(
        out[["event_id", "storage_account", "container", "folder_path", "file_name"]],
        preserve_index=False,
    )


def cdc_route_default_fallback(sf_dir: str) -> pa.Table:
    """J4 default-route left join: unmatched events fall back to the misc
    route instead of dead-lettering; counts per destination."""
    cfg = {**ROUTE_CONFIG, "default_route": {"id": "misc", "destination": "lake/misc"}}
    ds = _events(sf_dir, columns=["event_id", "event_type"]).map_batches(
        _with_stream_cols, batch_format="pyarrow"
    )
    router = make_router(cfg, enrich=False)
    routed = ds.map_batches(router, batch_format="pyarrow")
    ok = routed.map_batches(lambda b: split_routed(b)[0], batch_format="pyarrow")
    out = ok.groupby("destination").aggregate(Count(alias_name="n"))
    return pa.Table.from_pandas(out.to_pandas(), preserve_index=False)


def cdc_debatch(sf_dir: str) -> pa.Table:
    """JSON-array debatcher: 1 event → 1 or 3 messages."""

    def make_payload(batch: pa.Table) -> pa.Table:
        ev = batch["event_id"].to_numpy()
        payloads = np.where(
            ev % 3 == 0,
            [
                f'["m{e}-0", "m{e}-1", "m{e}-2"]' for e in ev
            ],
            [f'["m{e}-0"]' for e in ev],
        ).astype(object)
        return pa.table(
            {
                "event_id": pa.array(ev, pa.int64()),
                "text": pa.array(payloads, pa.string()),
            }
        )

    ds = _events(sf_dir, columns=["event_id"]).map_batches(
        make_payload, batch_format="pyarrow"
    )
    out = ds.map_batches(
        lambda b: debatch_json_array(b, payload_col="text"), batch_format="pyarrow"
    )
    return pa.Table.from_pandas(
        out.to_pandas()[["event_id", "msg_idx", "text"]], preserve_index=False
    )


# ------------------------------------------------------- relational queries

def agg_pricing_summary(sf_dir: str) -> pa.Table:
    """Pre-aggregated grouped summary over lineitem (partial-agg combiner
    inside map_batches, then a tiny groupby — the scale pattern)."""

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(
            pc.less_equal(batch["l_shipdate"], pa.scalar(pd.Timestamp("1998-09-02")))
        )
        df = t.select(
            ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"]
        ).to_pandas()
        df["disc_price"] = df["l_extendedprice"] * (1 - df["l_discount"])
        g = (
            df.groupby(["l_returnflag", "l_linestatus"], as_index=False)
            .agg(
                sum_qty=("l_quantity", "sum"),
                sum_base_price=("l_extendedprice", "sum"),
                sum_disc_price=("disc_price", "sum"),
                count_order=("l_quantity", "size"),
            )
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    ds = _read_sized(
os.path.join(sf_dir, "lineitem.parquet"),
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    )
    partials = ds.map_batches(partial, batch_format="pyarrow")
    out = (
        partials.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_price", alias_name="sum_base_price"),
            Sum("sum_disc_price", alias_name="sum_disc_price"),
            Sum("count_order", alias_name="count_order"),
        )
        .to_pandas()
    )
    out["avg_qty"] = np.round(out["sum_qty"] / out["count_order"], 6)
    for c in ("sum_qty", "sum_base_price", "sum_disc_price"):
        out[c] = np.round(out[c], 4)
    return pa.Table.from_pandas(out, preserve_index=False)


def join_broadcast_segments(sf_dir: str) -> pa.Table:
    """orders ⋈ customer with the small side broadcast (ray.put once),
    grouped revenue per market segment — the reference's config-dimension
    join shape (J1/J2) on relational data."""
    import ray as _ray

    cust = pd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    )
    # broadcast parallel (keys, values) Arrow arrays, not a Python dict:
    # the per-batch lookup is then index_in + take (C kernels), never
    # pd.Series.map's per-row Python-object hashing
    seg_ref = _ray.put((
        pa.array(cust["c_custkey"].to_numpy(), pa.int64()),
        pa.array(cust["c_mktsegment"].astype(str), pa.string()),
    ))

    def partial(batch: pa.Table) -> pa.Table:
        keys, vals = _ray.get(seg_ref)
        idx = pc.index_in(batch["o_custkey"], value_set=keys)
        tb = pa.table({
            "c_mktsegment": pc.take(vals, idx),
            "o_totalprice": batch["o_totalprice"],
        })
        g = tb.group_by("c_mktsegment").aggregate(
            [("o_totalprice", "sum"), ("o_totalprice", "count")]
        )
        return pa.table({
            "c_mktsegment": g["c_mktsegment"],
            "revenue": g["o_totalprice_sum"],
            "n_orders": g["o_totalprice_count"].cast(pa.int64()),
        })

    ds = _read_sized(
os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey", "o_totalprice"]
    )
    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(
            Sum("revenue", alias_name="revenue"),
            Sum("n_orders", alias_name="n_orders"),
        )
        .to_pandas()
    )
    out["revenue"] = np.round(out["revenue"], 4)
    return pa.Table.from_pandas(out, preserve_index=False)


def join_multiway_region_revenue(sf_dir: str) -> pa.Table:
    """Chained broadcast joins (orders→customer→nation→region): all three
    dimension maps built once on the driver, composed into ONE int-array
    gather chain inside map_batches, partial-agg, tiny final groupby."""
    cust = pd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    )
    nat = pd.read_parquet(
        os.path.join(sf_dir, "nation.parquet"), columns=["n_nationkey", "n_regionkey"]
    )
    reg = pd.read_parquet(
        os.path.join(sf_dir, "region.parquet"), columns=["r_regionkey", "r_name"]
    )
    nat2reg = dict(zip(nat["n_nationkey"], nat["n_regionkey"]))
    reg2name = dict(zip(reg["r_regionkey"], reg["r_name"]))
    region_names = [
        reg2name[nat2reg[nk]] for nk in cust["c_nationkey"]
    ]
    import ray as _ray

    # composed dimension chain broadcast as parallel Arrow arrays; per
    # batch the 3-way join is ONE index_in + take gather (C kernels)
    ref = _ray.put((
        pa.array(cust["c_custkey"].to_numpy(), pa.int64()),
        pa.array(region_names, pa.string()),
    ))

    def partial(b: pa.Table) -> pa.Table:
        keys, vals = _ray.get(ref)
        idx = pc.index_in(b["o_custkey"], value_set=keys)
        tb = pa.table({
            "r_name": pc.take(vals, idx),
            "o_totalprice": b["o_totalprice"],
        })
        g = tb.group_by("r_name").aggregate(
            [("o_totalprice", "sum"), ("o_totalprice", "count")]
        )
        return pa.table({
            "r_name": g["r_name"],
            "revenue": g["o_totalprice_sum"],
            "n_orders": g["o_totalprice_count"].cast(pa.int64()),
        })

    out = (
        _read_sized(
os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey", "o_totalprice"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(Sum("revenue", alias_name="revenue"), Sum("n_orders", alias_name="n_orders"))
        .to_pandas()
    )
    out["revenue"] = np.round(out["revenue"], 4)
    out["n_orders"] = out["n_orders"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def anti_join_customers_no_orders(sf_dir: str) -> pa.Table:
    """Anti join: customers with no orders, via ONE co-partitioned bucket
    shuffle (``filter_join_bucketed``) — the distinct order-custkey set
    stays distributed (the former implementation collected it at the driver
    with ``unique()``, a driver OOM when the key set ~ |customers| at
    scale)."""
    from data_exchange_routing_ray.functions.joins import filter_join_bucketed

    left_schema = pa.schema(
        [("c_custkey", pa.int64()), ("c_mktsegment", pa.string())]
    )
    out = filter_join_bucketed(
        _read_sized(
os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_mktsegment"],
        ),
        left_schema,
        _read_sized(
os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey"]
        ),
        left_key="c_custkey",
        right_key="o_custkey",
        keep_matches=False,
    ).to_pandas()  # final query result, bounded by |customers with no orders|
    if not len(out):  # schema-preserving empty result
        return left_schema.empty_table()
    return pa.Table.from_pandas(
        out.sort_values("c_custkey").reset_index(drop=True), preserve_index=False
    )


def union_event_streams(sf_dir: str) -> pa.Table:
    """Union-all of two derived sub-streams (fan-in, A2): per-op counts over
    the concatenation — Dataset.union keeps both sides lazy/streaming."""
    a = derived_change_stream(sf_dir).filter(expr="op == 'insert'")
    b = derived_change_stream(sf_dir).filter(expr="op != 'insert'")
    out = (
        a.union(b)
        .groupby("op")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def sort_topk_orders(sf_dir: str) -> pa.Table:
    ds = _read_sized(
os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_totalprice"]
    )
    top = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(20)
    return pa.Table.from_pandas(top.to_pandas(), preserve_index=False)


def distinct_event_types(sf_dir: str) -> pa.Table:
    vals = sorted(_events(sf_dir, columns=["event_type"]).unique("event_type"))
    return pa.table({"event_type": pa.array(vals, pa.string())})


def split_by_category(sf_dir: str) -> pa.Table:
    """Stream-split semantics (A5): per-category row count + value sum."""
    out = (
        _events(sf_dir, columns=["event_type", "value"])
        .groupby("event_type")
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="total_value"))
        .to_pandas()
    )
    out["total_value"] = np.round(out["total_value"], 4)
    return pa.Table.from_pandas(out, preserve_index=False)


def normalize_values_by_type(sf_dir: str) -> pa.Table:
    """Per-group z-score normalization: pass 1 computes tiny per-type
    (mean, sample-std) stats, pass 2 broadcasts them and normalizes every
    row — the two-pass feature-engineering shape (stats never shuffle the
    fact table)."""
    import ray as _ray

    stats = (
        _events(sf_dir, columns=["event_type", "value"])
        .groupby("event_type")
        .map_groups(
            lambda g: pd.DataFrame(
                [{
                    "event_type": g["event_type"].iloc[0],
                    "mu": g["value"].mean(),
                    "sd": g["value"].std(ddof=1),
                }]
            ),
            batch_format="pandas",
        )
        .to_pandas()
    )
    ref = _ray.put({r.event_type: (r.mu, r.sd) for r in stats.itertuples()})

    def normalize(b: pa.Table) -> pa.Table:
        m = _ray.get(ref)
        et = b["event_type"].to_numpy(zero_copy_only=False)
        v = b["value"].to_numpy()
        mu = np.array([m[t][0] for t in et])
        sd = np.array([m[t][1] for t in et])
        z = np.round((v - mu) / sd, 4)
        return pa.table(
            {"event_id": b["event_id"], "z": pa.array(z, pa.float64())}
        )

    out = (
        _events(sf_dir, columns=["event_id", "event_type", "value"])
        .map_batches(normalize, batch_format="pyarrow")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def quantiles_by_event_type(sf_dir: str) -> pa.Table:
    """Exact per-group quantiles (p25/p50/p75/p99 of value per event_type).
    Low-cardinality groups gather whole in one task (documented constraint);
    high-cardinality keys would swap in a distributed t-digest."""

    def qs(g: pd.DataFrame) -> pd.DataFrame:
        v = g["value"].to_numpy()
        p = np.quantile(v, [0.25, 0.5, 0.75, 0.99])  # linear interpolation
        return pd.DataFrame(
            [{
                "event_type": g["event_type"].iloc[0],
                "p25": round(p[0], 6), "p50": round(p[1], 6),
                "p75": round(p[2], 6), "p99": round(p[3], 6),
            }]
        )

    out = (
        _events(sf_dir, columns=["event_type", "value"])
        .groupby("event_type")
        .map_groups(qs, batch_format="pandas")
        .to_pandas()
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def pivot_daily_event_counts(sf_dir: str) -> pa.Table:
    """Pivot to a wide table: one row per day, one count column per event
    type — partial (day, type) counts inside map_batches, tiny groupby,
    driver-side pivot of the small result."""

    def partial(b: pa.Table) -> pa.Table:
        df = pa.table(
            {"day": pc.strftime(b["ts"], format="%Y-%m-%d"),
             "event_type": b["event_type"]}
        ).to_pandas()
        g = df.groupby(["day", "event_type"], as_index=False).size()
        return pa.Table.from_pandas(g.rename(columns={"size": "n"}), preserve_index=False)

    long = (
        _events(sf_dir, columns=["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["day", "event_type"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    wide = long.pivot_table(index="day", columns="event_type", values="n",
                            fill_value=0, aggfunc="sum").reset_index()
    wide.columns.name = None
    wide = wide.rename(columns={c: f"n_{c}" for c in wide.columns if c != "day"})
    for c in wide.columns:
        if c != "day":
            wide[c] = wide[c].astype("int64")
    return pa.Table.from_pandas(wide.sort_values("day").reset_index(drop=True),
                                preserve_index=False)


def sessionize_events(sf_dir: str, gap_seconds: float = 1800.0) -> pa.Table:
    """Session windows per user (30-min inactivity gap) — the streaming
    window op Ray Data lacks natively. Scale shape: ONE shuffle on a coarse
    user-hash bucket (hundreds of groups), all per-user session logic
    vectorized inside the bucket (sort + diff over the whole bucket frame,
    boundaries masked at user changes) — no per-user Python calls."""

    def bucket(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy()
        bk = (uid * np.int64(0x9E3779B9)) % 256
        return b.append_column("bucket", pa.array(bk.astype(np.int64), pa.int64()))

    def sessions_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy()
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        gap = g["ts"].diff().dt.total_seconds().to_numpy()
        new_session = new_user | (gap > gap_seconds)
        out = pd.DataFrame({"user_id": uid, "one": 1, "ns": new_session.astype(np.int64)})
        agg = out.groupby("user_id", as_index=False, sort=False).agg(
            n_events=("one", "sum"), n_sessions=("ns", "sum")
        )
        return agg

    out = (
        _events(sf_dir, columns=["user_id", "event_id", "ts"])
        .map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sessions_bucket, batch_format="pandas")
        .to_pandas()
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def grouped_topk_orders(sf_dir: str, k: int = 3) -> pa.Table:
    """Top-k rows per group (QUALIFY shape): per-batch local top-k per
    group (bounded candidates), then a driver-side final top-k over the
    tiny candidate set — no global sort."""

    def local_topk(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df.sort_values(
            ["o_orderpriority", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True], kind="stable",
        )
        return pa.Table.from_pandas(
            df.groupby("o_orderpriority", sort=False).head(k),
            preserve_index=False,
        )

    cand = (
        _read_sized(
os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderpriority", "o_orderkey", "o_totalprice"],
        )
        .map_batches(local_topk, batch_format="pyarrow")
        .to_pandas()
    )
    cand = cand.sort_values(
        ["o_orderpriority", "o_totalprice", "o_orderkey"],
        ascending=[True, False, True], kind="stable",
    )
    out = cand.groupby("o_orderpriority", sort=False).head(k)
    return pa.Table.from_pandas(
        out[["o_orderpriority", "o_orderkey", "o_totalprice"]].reset_index(drop=True),
        preserve_index=False,
    )


def approx_distinct_users(sf_dir: str, precision: int = 14) -> pa.Table:
    """HyperLogLog approximate distinct count of users per event_type —
    the mergeable-sketch aggregate a 100 TB pipeline needs (per-batch
    sketches merged by max across registers; one tiny groupby). Gate:
    rows-only (approximate), with exact count asserted within 2% in pytest."""
    from data_exchange_routing_ray.functions.sketch import (
        hll_estimate,
        hll_sketch_batch,
    )

    m = 1 << precision

    def partial(b: pa.Table) -> pa.Table:
        df = b.select(["event_type", "user_id"]).to_pandas()
        rows = []
        for etype, g in df.groupby("event_type", sort=False):
            regs = hll_sketch_batch(g["user_id"].to_numpy(), precision)
            rows.append({"event_type": etype, "regs": regs.tobytes()})
        out = pd.DataFrame(rows)
        return pa.Table.from_pandas(out, preserve_index=False)

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.zeros(m, dtype=np.uint8)
        for b in g["regs"]:
            regs = np.maximum(regs, np.frombuffer(b, dtype=np.uint8))
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n_users_approx": [int(round(hll_estimate(regs)))],
            }
        )

    out = (
        _events(sf_dir, columns=["event_type", "user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(merge_group, batch_format="pandas")
        .to_pandas()
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def events_partitioned_write(sf_dir: str) -> pa.Table:
    """Resumable partitioned-output layout: write events partitioned by
    event date (partition_cols), read the directory tree back, count rows
    per partition dir — the 'never one giant file' output discipline."""
    import pyarrow.dataset as pads

    def with_day(b: pa.Table) -> pa.Table:
        return b.append_column("day", pc.strftime(b["ts"], format="%Y-%m-%d"))

    with tempfile.TemporaryDirectory(prefix="partwrite-") as d:
        (
            _events(sf_dir, columns=["event_id", "ts"])
            .map_batches(with_day, batch_format="pyarrow")
            .write_parquet(d, partition_cols=["day"])
        )
        back = pads.dataset(d, format="parquet", partitioning="hive")
        t = back.to_table(columns=["event_id", "day"])
    df = t.to_pandas()
    df["day"] = df["day"].astype(str)
    out = df.groupby("day", as_index=False).agg(n=("event_id", "size"))
    out["n"] = out["n"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def asof_join_clicks_purchases(sf_dir: str) -> pa.Table:
    """As-of join (backward, inclusive): each click event gets the same
    user's most recent purchase value at or before the click. The temporal
    join Ray Data lacks; oracle = DuckDB ASOF LEFT JOIN."""
    from data_exchange_routing_ray.functions.joins import asof_join

    clicks = _events(sf_dir, columns=["event_id", "user_id", "ts", "event_type"]).filter(
        expr="event_type == 'click'"
    ).map_batches(lambda b: b.drop_columns(["event_type"]), batch_format="pyarrow")
    purchases = _events(
        sf_dir, columns=["event_id", "user_id", "ts", "value", "event_type"]
    ).filter(expr="event_type == 'purchase'").map_batches(
        lambda b: pa.table(
            {
                "user_id": b["user_id"],
                "ts": b["ts"],
                "last_purchase_value": pc.round(b["value"], 4),
            }
        ),
        batch_format="pyarrow",
    )
    out = asof_join(
        clicks, purchases, by="user_id", on="ts",
        right_value_cols=["last_purchase_value"],
    ).to_pandas()
    out = out[["event_id", "user_id", "last_purchase_value"]].astype(
        {"event_id": "int64", "user_id": "int64"}
    )
    return pa.Table.from_pandas(
        out.sort_values("event_id").reset_index(drop=True), preserve_index=False
    )


def range_join_clicks_purchases(sf_dir: str) -> pa.Table:
    """Range join: purchases by the same user within 1 hour AFTER each
    click (count + value sum) — the conversion-attribution shape."""
    from data_exchange_routing_ray.functions.joins import range_join_agg

    clicks = _events(sf_dir, columns=["event_id", "user_id", "ts", "event_type"]).filter(
        expr="event_type == 'click'"
    ).map_batches(lambda b: b.drop_columns(["event_type"]), batch_format="pyarrow")
    purchases = _events(
        sf_dir, columns=["user_id", "ts", "value", "event_type"]
    ).filter(expr="event_type == 'purchase'").map_batches(
        lambda b: b.drop_columns(["event_type"]), batch_format="pyarrow"
    )
    out = range_join_agg(
        clicks, purchases, by="user_id", on="ts", value_col="value",
        window=3600 * 10**6,  # 1 hour in µs
    ).to_pandas()
    out = out[["event_id", "user_id", "n_in_window", "sum_in_window"]].astype(
        {"event_id": "int64", "user_id": "int64", "n_in_window": "int64"}
    )
    return pa.Table.from_pandas(
        out.sort_values("event_id").reset_index(drop=True), preserve_index=False
    )


def window_sliding_7d(sf_dir: str) -> pa.Table:
    """Sliding 7-calendar-day value sum per (user, day) — RANGE-frame window
    with missing days respected."""
    from data_exchange_routing_ray.functions.joins import sliding_window_sum

    out = sliding_window_sum(
        _events(sf_dir, columns=["user_id", "ts", "value"]),
        by="user_id", day_col_source="ts", value_col="value",
    ).to_pandas()
    return pa.Table.from_pandas(out, preserve_index=False)


# ------------------------------------------------------------- text queries

def text_stats(sf_dir: str) -> pa.Table:
    out = (
        _documents(sf_dir, columns=["doc_id", "text"])
        .map_batches(lambda b: add_text_stats(b), batch_format="pyarrow")
        .to_pandas()
    )
    return pa.Table.from_pandas(
        out[["doc_id", "n_tokens", "n_punct", "stop_hits"]], preserve_index=False
    )


def text_quality(sf_dir: str) -> pa.Table:
    out = (
        _documents(sf_dir, columns=["doc_id", "text"])
        .map_batches(lambda b: add_quality_score(b), batch_format="pyarrow")
        .to_pandas()
    )
    return pa.Table.from_pandas(out[["doc_id", "quality"]], preserve_index=False)


def text_langid(sf_dir: str) -> pa.Table:
    out = (
        _documents(sf_dir, columns=["doc_id", "text"])
        .map_batches(lambda b: add_lang_id(b), batch_format="pyarrow")
        .to_pandas()
    )
    return pa.Table.from_pandas(out[["doc_id", "lang_pred"]], preserve_index=False)


def text_html_encode(sf_dir: str) -> pa.Table:
    """M11 oracle gate — HTML-encode before persistence (the report
    normalizer, FnStoreReportingEvent.kt:68-71): planted markup carrying
    all five special characters (& < > \" ') round-trips through the
    chained-Arrow-kernel encoder (`functions/text.html_encode_column`,
    ampersand first) and must match DuckDB's replace chain exactly.
    1-in-100 sample keeps the value-compare bounded at any SF."""
    from data_exchange_routing_ray.functions.text import html_encode_column

    def mk(b: pa.Table) -> pa.Table:
        ev = b["event_id"].to_numpy()
        ev = ev[ev % 100 == 0]
        s = ev.astype(np.str_)
        raw = np.char.add(
            np.char.add('<msg id="', s),
            "\">&'done'</msg>",
        ).astype(object)
        t = pa.table({
            "event_id": pa.array(ev, pa.int64()),
            "text": pa.array(raw, pa.string()),
        })
        return html_encode_column(t, "text")

    out = (
        _events(sf_dir, columns=["event_id"])
        .map_batches(mk, batch_format="pyarrow")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def text_fingerprint_md5(sf_dir: str) -> pa.Table:
    out = (
        _documents(sf_dir, columns=["doc_id", "text"])
        .map_batches(lambda b: add_md5_fingerprint(b), batch_format="pyarrow")
        .to_pandas()
    )
    return pa.Table.from_pandas(out[["doc_id", "fp_md5"]], preserve_index=False)


def text_fingerprint_winnow(sf_dir: str) -> pa.Table:
    out = (
        _documents(sf_dir, columns=["doc_id", "text"])
        .map_batches(lambda b: add_winnow_fingerprint(b), batch_format="pyarrow")
        .to_pandas()
    )
    return pa.Table.from_pandas(out[["doc_id", "fp_winnow"]], preserve_index=False)


# ------------------------------------------------------------ dedup queries

def dedup_exact_events_props(sf_dir: str) -> pa.Table:
    from data_exchange_routing_ray.functions.dedup import exact_dedup

    ds = _events(sf_dir, columns=["event_id", "props"])
    out = exact_dedup(ds, col="props", id_col="event_id").to_pandas()
    return pa.Table.from_pandas(
        out[["event_id", "props"]], preserve_index=False
    )


def dedup_minhash_pairs(sf_dir: str) -> pa.Table:
    from data_exchange_routing_ray.functions.dedup import minhash_candidate_pairs

    ds = _documents(sf_dir, columns=["doc_id", "text"])
    out = minhash_candidate_pairs(ds, threshold=0.5).to_pandas()
    return pa.Table.from_pandas(
        out[["id_a", "id_b", "est_jaccard"]], preserve_index=False
    )


def dedup_simhash_pairs(sf_dir: str) -> pa.Table:
    from data_exchange_routing_ray.functions.dedup import simhash_candidate_pairs

    ds = _documents(sf_dir, columns=["doc_id", "text"])
    out = simhash_candidate_pairs(ds, max_hamming=3).to_pandas()
    return pa.Table.from_pandas(
        out[["id_a", "id_b", "hamming"]], preserve_index=False
    )


def emb_neardup_blocked(sf_dir: str, threshold: float = 0.3) -> pa.Table:
    from data_exchange_routing_ray.functions.dedup import (
        embedding_neardup_pairs_blocked,
    )

    out = embedding_neardup_pairs_blocked(
        _embeddings(sf_dir), threshold=threshold
    ).to_pandas()
    return pa.Table.from_pandas(
        out[["id_a", "id_b", "cosine"]], preserve_index=False
    )


def emb_neardup_lsh(
    sf_dir: str, threshold: float = 0.3, min_recall: float = 0.9
) -> pa.Table:
    """LSH-bucketed near-dup pairs with an IN-QUERY quantitative gate: the
    pair set's recall is measured against the exact blocked variant and the
    query FAILS (raises) below ``min_recall`` — so the driver's rows-only
    row for this approximate op still enforces quality, not just a count."""
    from data_exchange_routing_ray.functions.dedup import lsh_neardup_pairs

    # min_blocks=8: banding is trivial compute, so the block count only
    # sets the sort-shuffle's fixed cost on small corpora (A/B: 8 blocks
    # ~1.2s vs 64 blocks ~4-6s at sf0.1); at scale byte-sizing governs.
    out = lsh_neardup_pairs(
        _embeddings(sf_dir, min_blocks=8), threshold=threshold
    ).to_pandas()
    exact = emb_neardup_blocked(sf_dir, threshold=threshold).to_pandas()
    truth = set(zip(exact["id_a"], exact["id_b"]))
    found = set(zip(out["id_a"], out["id_b"]))
    recall = len(truth & found) / len(truth) if truth else 1.0
    if recall < min_recall:
        raise AssertionError(
            f"emb_neardup_lsh recall {recall:.3f} < {min_recall} "
            f"({len(truth & found)}/{len(truth)} exact pairs recovered)"
        )
    # LSH must never invent pairs below the cosine threshold (precision=1
    # within buckets by construction — verified exactly)
    assert (out["cosine"] > threshold).all()
    return pa.Table.from_pandas(
        out[["id_a", "id_b", "cosine"]], preserve_index=False
    )


def ann_topk(sf_dir: str, k: int = 10) -> pa.Table:
    from data_exchange_routing_ray.functions.similarity import topk_cosine

    ds = _embeddings(sf_dir)
    q = ds.filter(expr="vec_id == 0").take(1)[0]["embedding"]
    out = topk_cosine(ds, np.asarray(q), k=k)
    return pa.Table.from_pandas(out[["vec_id", "cosine"]], preserve_index=False)


def ann_ivf_topk(sf_dir: str, k: int = 10, min_recall: float = 0.9) -> pa.Table:
    """IVF (nprobe) top-k with an IN-QUERY recall@k gate against the exact
    brute-force top-k: the query FAILS below ``min_recall`` — the driver's
    rows-only row enforces search quality, not just result shape."""
    from data_exchange_routing_ray.functions.similarity import (
        IVFIndex,
        topk_cosine,
    )

    ds = _embeddings(sf_dir)
    q = ds.filter(expr="vec_id == 0").take(1)[0]["embedding"]
    idx = IVFIndex(num_clusters=16, seed=42).fit(ds)
    # nprobe=8 measured ≥0.9 recall@10 at sf0.001/0.01/0.1 on the weakly-
    # clustered test embeddings (max within-label cosine ~0.5); nprobe=4
    # bottomed at 0.4 — probe half the clusters when structure is weak
    out = idx.search(ds, np.asarray(q), k=k, nprobe=8)
    exact = topk_cosine(_embeddings(sf_dir), np.asarray(q), k=k)
    recall = len(set(out["vec_id"]) & set(exact["vec_id"])) / k
    if recall < min_recall:
        raise AssertionError(
            f"ann_ivf_topk recall@{k} {recall:.3f} < {min_recall} vs exact top-k"
        )
    return pa.Table.from_pandas(out[["vec_id", "cosine"]], preserve_index=False)


def cdc_explode_archive(sf_dir: str) -> pa.Table:
    """Archive exploder (S16 decompressor matrix, inc. nested zips + empty-
    zip errors) over synthesized deterministic zip payloads; per-doc rollup
    of produced entries + error rows — the full Unit_FnDecompressor matrix
    as one pipeline."""
    import io
    import zipfile

    from data_exchange_routing_ray.stages.debatch import explode_archive

    def synth_payload(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        names, blobs = [], []
        for d in ids:
            m = d % 5
            if m == 0:  # two plain entries
                buf = io.BytesIO()
                with zipfile.ZipFile(buf, "w") as z:
                    z.writestr("a.csv", f"x,{d}\n")
                    z.writestr("b.csv", f"y,{d}\n")
                names.append(f"doc{d}.zip"); blobs.append(buf.getvalue())
            elif m == 1:  # empty archive -> error row
                buf = io.BytesIO()
                with zipfile.ZipFile(buf, "w"):
                    pass
                names.append(f"doc{d}.zip"); blobs.append(buf.getvalue())
            elif m == 2:  # nested zip: one plain + one inner entry
                inner = io.BytesIO()
                with zipfile.ZipFile(inner, "w") as z:
                    z.writestr("c.csv", f"z,{d}\n")
                buf = io.BytesIO()
                with zipfile.ZipFile(buf, "w") as z:
                    z.writestr("a.csv", f"x,{d}\n")
                    z.writestr("inner.zip", inner.getvalue())
                names.append(f"doc{d}.zip"); blobs.append(buf.getvalue())
            else:  # non-archive passthrough (single CSV fan-out case)
                names.append(f"doc{d}.csv"); blobs.append(f"x,{d}\n".encode())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "file_name": pa.array(names, pa.string()),
                "payload": pa.array(blobs, pa.binary()),
            }
        )

    ds = (
        _documents(sf_dir, columns=["doc_id"])
        .map_batches(synth_payload, batch_format="pyarrow")
        .map_batches(lambda b: explode_archive(b), batch_format="pyarrow")
    )

    def rollup(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        g = df.groupby("doc_id", as_index=False).agg(
            n_entries=("file_name", "size"),
            n_errors=("error", "count"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        ds.map_batches(rollup, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("n_entries", alias_name="n_entries"), Sum("n_errors", alias_name="n_errors"))
        .to_pandas()
        .astype({"n_entries": "int64", "n_errors": "int64"})
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def cdc_lineage_epochs(sf_dir: str, epochs: int = 4) -> pa.Table:
    """Per-epoch lineage rollup after a seq-sliced multi-epoch replay: the
    processing-status report stream (S9/S12) aggregated per commit epoch,
    carrying the versioned-envelope fields (report_schema_version, stage
    info; PSReportEnvelope.kt:4-58) read back from the report rows.
    Integer epoch bounds: epoch i covers [i*hi//E, (i+1)*hi//E)."""
    stream = derived_change_stream(sf_dir)
    hi = int(_events(sf_dir, columns=["event_id"]).max("event_id")) + 1
    with tempfile.TemporaryDirectory(prefix="cdclake-") as d:
        lake = CDCLake(os.path.join(d, "lake"), num_partitions=16)
        for i in range(epochs):
            lo, up = i * hi // epochs, (i + 1) * hi // epochs
            lake.apply_changes(
                stream.filter(expr=f"seq >= {lo} and seq < {up}"), quarantine=False
            )
        lin = lake.lineage.read_all().to_pandas()
    out = (
        lin.groupby("epoch", as_index=False)
        .agg(
            n_applied=("changes_applied", "sum"),
            watermark=("applied_offset", "max"),
            report_schema_version=("report_schema_version", "max"),
            service=("service", "max"),
            stage=("stage", "max"),
        )
        .astype({"epoch": "int64", "n_applied": "int64", "watermark": "int64"})
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def cdc_report_envelopes(sf_dir: str) -> pa.Table:
    """Versioned processing-status report envelopes, full S9/S12 shape
    parity (PSReportEnvelope.kt:4-58): one quarantine-on epoch over the
    corrupted stream, then the report stream is read back and the
    QUARANTINED row's structured issues list (Issue{level, message},
    PSReportEnvelope.kt:49-54) is exploded — one row per distinct
    dead-letter error — alongside the envelope version / stage-info
    fields. The ≤5-row explode happens on the driver; the lineage table
    is at most P+1 rows per epoch by construction.

    Trace-context parity (RouteIngestedFile.kt:138-140): the epoch is
    applied under an incoming trace_id; every report row must carry it
    plus this stage's deterministic child span."""
    stream = derived_change_stream(sf_dir, corrupt=True)
    with tempfile.TemporaryDirectory(prefix="cdcenv-") as d:
        lake = CDCLake(os.path.join(d, "lake"), num_partitions=16)
        lake.apply_changes(stream, trace_id="t-req-0001")
        lin = lake.lineage.read_all().to_pandas()
    qrows = lin[lin["status"] == "QUARANTINED"]
    rows = []
    for _, r in qrows.iterrows():
        for iss in r["issues"]:
            rows.append(
                {
                    "report_schema_version": r["report_schema_version"],
                    "content_schema_name": r["content_schema_name"],
                    "content_schema_version": r["content_schema_version"],
                    "service": r["service"],
                    "stage": r["stage"],
                    "status": r["status"],
                    "level": iss["level"],
                    "message": iss["message"],
                    "n_quarantined": int(r["row_count"]),
                    "trace_id": r["trace_id"],
                    "parent_span_id": r["parent_span_id"],
                    "span_id": r["span_id"],
                }
            )
    out = pd.DataFrame(rows).sort_values("message").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def cdc_trace_chain(sf_dir: str, epochs: int = 2) -> pa.Table:
    """Trace-context propagation across chained epochs + config-version
    audit (reference: RouteIngestedFile.kt:138-140 reads trace_id/
    parent_span_id from source metadata; :203 sets the OUTGOING
    parent_span_id to this stage's child span; FnCacheUpdater.kt:22-52
    makes config changes observable events).

    Two seq-sliced epochs run under one trace: epoch 0 with the incoming
    parent, epoch 1 chained under epoch 0's span (EpochResult.span_id).
    Between the epochs the route config HOT-RELOADS — each epoch's
    lineage rows and manifest stamp the content-hash of the config that
    routed it, so "which config routed epoch N" stays answerable.
    Engine asserts: all of an epoch's report rows share ONE span."""
    from data_exchange_routing_ray.stages.route import config_fingerprint

    stream = derived_change_stream(sf_dir)
    hi = int(_events(sf_dir, columns=["event_id"]).max("event_id")) + 1
    with tempfile.TemporaryDirectory(prefix="cdctrace-") as d:
        lake = CDCLake(os.path.join(d, "lake"), num_partitions=16)
        parent = ""
        for i in range(epochs):
            lo, up = i * hi // epochs, (i + 1) * hi // epochs
            # config hot-reload between epochs, stamped per commit
            lake.set_config_version(
                config_fingerprint({"rev": i, "routes": []})
            )
            res = lake.apply_changes(
                stream.filter(expr=f"seq >= {lo} and seq < {up}"),
                quarantine=False,
                trace_id="t-req-0001",
                parent_span_id=parent,
            )
            assert lake.manifest.config_version == res.config_version
            parent = res.span_id  # child span becomes the next parent
        lin = lake.lineage.read_all().to_pandas()
    spans_per_epoch = lin.groupby("epoch")["span_id"].nunique()
    assert (spans_per_epoch == 1).all(), (
        "an epoch's report rows must share one child span"
    )
    out = (
        lin.groupby("epoch", as_index=False)
        .agg(
            n_applied=("changes_applied", "sum"),
            trace_id=("trace_id", "max"),
            parent_span_id=("parent_span_id", "max"),
            span_id=("span_id", "max"),
            config_version=("config_version", "max"),
        )
        .astype({"epoch": "int64", "n_applied": "int64"})
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def cdc_bootstrap_then_changes(sf_dir: str) -> pa.Table:
    """Initial lake load (bootstrap: every row an insert at seq=-1, from the
    customer dimension) followed by an incremental change epoch — the ADF
    spike's full-load-then-incremental `LoadType` semantics
    (`ConfigObject.sql`, LastModifiedTime watermark)."""

    def boot_batch(b: pa.Table) -> pa.Table:
        keys = b["c_custkey"].to_numpy()
        conv = np.char.add("conv-", np.char.zfill(keys.astype(np.str_), 6)).astype(object)
        text = np.char.add("profile-", keys.astype(np.str_)).astype(object)
        n = len(keys)
        return pa.table(
            {
                "conv_id": pa.array(conv, pa.string()),
                "turn_idx": pa.array(np.zeros(n, np.int32), pa.int32()),
                "role": pa.array(["system"] * n, pa.string()),
                "text": pa.array(text, pa.string()),
                "tool": pa.array([""] * n, pa.string()),
                "ts": pa.array(
                    np.full(n, np.datetime64("2024-01-01", "us")),
                    pa.timestamp("us"),
                ),
            }
        )

    boot = _read_sized(
os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"]
    ).map_batches(boot_batch, batch_format="pyarrow")
    with tempfile.TemporaryDirectory(prefix="cdclake-") as d:
        lake = CDCLake(os.path.join(d, "lake"), num_partitions=16)
        lake.bootstrap(boot, default_seq=-1)
        lake.apply_changes(derived_change_stream(sf_dir), quarantine=False)
        return lake.final_table()


ORCH_CONFIG = {
    "steps": [
        {"stepNumber": 1, "function": "validate_changes", "quarantineErrors": True},
        {"stepNumber": 2, "function": "filter_expr", "config": {"expr": "op != 'delete'"}},
        {"stepNumber": 3, "function": "text_stats", "config": {"col": "text"}},
    ]
}


def orchestrate_config_pipeline(sf_dir: str) -> pa.Table:
    """Config-driven step pipeline (the reference's OrchestratorConfiguration,
    §2.9): validate (errors → quarantine) → filter → text stats, then a
    per-op rollup of both branches' row counts."""
    from data_exchange_routing_ray.pipelines.orchestrator import run_pipeline

    res = run_pipeline(derived_change_stream(sf_dir, corrupt=True), ORCH_CONFIG)
    out = (
        res.output.groupby("op")
        .aggregate(
            Count(alias_name="n"),
            Sum("n_punct", alias_name="sum_punct"),
        )
        .to_pandas()
    )
    n_quar = res.quarantine.count() if res.quarantine is not None else 0
    out["n_quarantined"] = np.int64(n_quar)
    return pa.Table.from_pandas(out, preserve_index=False)


def text_top_words(sf_dir: str, k: int = 50) -> pa.Table:
    """Distributed word count + top-k (vocabulary analysis): per-batch
    partial counts (one Arrow split + pandas value_counts), coarse-bucket
    reduce, driver-side top-k over the small per-bucket leaders."""
    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("word", as_index=False).agg(n=("n", "sum"))
        # a word's count completes inside ONE bucket, so the per-bucket
        # top-k is exact — 64·k leader rows reach the driver, never the
        # full vocabulary histogram
        return agg.sort_values(
            ["n", "word"], ascending=[False, True], kind="stable"
        ).head(k)

    counts = (
        _documents(sf_dir, columns=["text"])
        .map_batches(_word_count_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
        .to_pandas()
    )
    top = counts.sort_values(["n", "word"], ascending=[False, True], kind="stable").head(k)
    top["n"] = top["n"].astype("int64")
    return pa.Table.from_pandas(top.reset_index(drop=True), preserve_index=False)


def bm25_score_docs(
    sf_dir: str,
    terms: tuple[str, ...] = ("shuffle", "merge", "join"),
    k1: float = 1.2,
    b: float = 0.75,
) -> pa.Table:
    """BM25 relevance scoring of every document matching a query — the
    retrieval-side scorer paired with tfidf_top_terms / the inverted index.

    Two-pass merge-on-stats plan, all in Dataset algebra: pass 1 tokenizes
    once (the shared ``[^\\p{L}\\p{N}]+`` contract) and emits ONLY slim
    per-doc hit rows (doc_id, len, tf per term) plus one stats row per
    batch (N, Σlen, df per term) — raw text never leaves the scan. The
    global BM25 constants (idf per term, avg doc length) fold from the
    per-batch stats rows at the driver (O(batches) rows), then pass 2 is a
    vectorized scoring map over the materialized hit rows. Returns ALL
    matching docs (no top-k rank cut: scores are rounded to 6 dp on both
    oracle sides, and a boundary tie between rounded scores could flip a
    LIMIT — the caller applies its own cut)."""
    nt = len(terms)

    def stage1(t: pa.Table) -> pa.Table:
        words = pc.split_pattern_regex(
            pc.utf8_lower(t["text"]), pattern=r"[^\p{L}\p{N}]+"
        )
        lc = pa.chunked_array([words]).combine_chunks()
        if isinstance(lc, pa.ChunkedArray):
            lc = lc.chunk(0)
        flat = np.asarray(lc.flatten().to_pandas(), dtype=object)
        offs = lc.offsets.to_numpy()
        n = t.num_rows
        row = np.repeat(np.arange(n), np.diff(offs))
        keep = flat != ""
        row, flat = row[keep], flat[keep]
        doc_len = np.bincount(row, minlength=n).astype(np.int64)
        tfs = []
        for term in terms:
            m = flat == term
            tfs.append(np.bincount(row[m], minlength=n).astype(np.int64))
        hit = np.zeros(n, bool)
        for tf in tfs:
            hit |= tf > 0
        ids = t["doc_id"].to_numpy()
        cols = {
            "doc_id": ids[hit],
            "len": doc_len[hit],
            **{f"tf{i}": tfs[i][hit] for i in range(nt)},
        }
        # one stats row per batch: doc_id = -1, len = Σlen, tf_i = df_i, plus n
        stats = {
            "doc_id": np.array([-1], np.int64),
            "len": np.array([int(doc_len.sum())], np.int64),
            **{
                f"tf{i}": np.array([int((tfs[i] > 0).sum())], np.int64)
                for i in range(nt)
            },
        }
        out = pd.concat(
            [
                pd.DataFrame({**cols, "n_docs": np.zeros(hit.sum(), np.int64)}),
                pd.DataFrame({**stats, "n_docs": np.array([n], np.int64)}),
            ],
            ignore_index=True,
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    tagged = (
        _documents(sf_dir, columns=["doc_id", "text"])
        .map_batches(stage1, batch_format="pyarrow")
        .materialize()  # slim hit rows + O(batches) stats rows only
    )
    st = tagged.filter(expr="doc_id < 0").to_pandas()
    N = int(st["n_docs"].sum())
    total_len = int(st["len"].sum())
    avglen = total_len / max(N, 1)
    idf = np.array(
        [
            np.log((N - int(st[f"tf{i}"].sum()) + 0.5)
                   / (int(st[f"tf{i}"].sum()) + 0.5) + 1.0)
            for i in range(nt)
        ]
    )

    def score(t: pa.Table) -> pa.Table:
        ln = t["len"].to_numpy().astype(np.float64)
        denom_norm = k1 * (1.0 - b + b * ln / avglen)
        s = np.zeros(t.num_rows, np.float64)
        for i in range(nt):
            tf = t[f"tf{i}"].to_numpy().astype(np.float64)
            s += idf[i] * tf / (tf + denom_norm)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "bm25": pa.array(np.round(s, 6)),
            }
        )

    out = (
        tagged.filter(expr="doc_id >= 0")
        .map_batches(score, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
    )
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def dau_wau_mau_stickiness(sf_dir: str) -> pa.Table:
    """DAU/WAU/MAU + stickiness (the product-analytics staple): exact
    distinct users per day/week/month via ONE scan emitting per-batch-
    deduped (period-kind, period, user) keys into a user-hash bucket
    exchange (wire ≤ distinct set, the established exact-distinct shape);
    averages fold from the ≤span-periods census. Weeks use the integer
    day//7 epoch (SQL-mirrorable, no locale weekday rules). Stickiness =
    avg_dau / avg_mau rounded to 6 dp on both sides."""

    def partial(b: pa.Table) -> pa.Table:
        d = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // 86_400_000_000
        uid = b["user_id"].to_numpy()
        frames = []
        for kind, per in (("day", d), ("week", d // 7), ("month", None)):
            if per is None:
                per = (
                    b["ts"].to_numpy().astype("datetime64[M]").astype(np.int64)
                )
            df = pd.DataFrame({"kind": kind, "period": per, "user_id": uid})
            frames.append(df.drop_duplicates())
        out = pd.concat(frames, ignore_index=True)
        out["bkt"] = (out["user_id"].to_numpy(np.int64) % 64).astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["kind", "period", "user_id"])
        return d.groupby(["kind", "period"], as_index=False).agg(
            n=("user_id", "nunique")
        )

    census = (
        _events(sf_dir, columns=["ts", "user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
        .groupby(["kind", "period"], as_index=False)
        .agg(n=("n", "sum"))
    )
    rows = []
    means = {}
    for kind in ("day", "week", "month"):
        g = census[census["kind"] == kind]
        means[kind] = g["n"].sum() / len(g)
        rows.append(
            {
                "kind": kind,
                "n_periods": np.int64(len(g)),
                "avg_active": round(float(means[kind]), 6),
            }
        )
    out = pd.DataFrame(rows)
    out["stickiness"] = np.round(means["day"] / means["month"], 6)
    return pa.Table.from_pandas(out, preserve_index=False)


def multi_agg_shared_scan(sf_dir: str) -> pa.Table:
    """Shared-scan multi-aggregate (the multi-query-optimization pattern
    that matters at 100 TB: N dashboard aggregates must not mean N table
    scans): ONE pass emits tagged partials for four aggregate families —
    by type, by day, by user-decile, global — and one tiny grouped reduce
    finishes all of them. Integer ticks keep the sums exact; the wire
    carries ≤ (|types| + span + 10 + 1) rows per batch."""

    def partial(b: pa.Table) -> pa.Table:
        tick = np.floor(b["value"].to_numpy() * 10000.0).astype(np.int64)
        day = b["ts"].to_numpy().astype("datetime64[D]").astype(str)
        et = b["event_type"].to_numpy(zero_copy_only=False)
        dec = (b["user_id"].to_numpy() % 10).astype(np.int64)
        frames = [
            pd.DataFrame({"family": "by_type", "key": et, "tick": tick}),
            pd.DataFrame({"family": "by_day", "key": day, "tick": tick}),
            pd.DataFrame(
                {"family": "by_user_decile", "key": dec.astype(str), "tick": tick}
            ),
            pd.DataFrame({"family": "global", "key": "_", "tick": tick}),
        ]
        agg = (
            pd.concat(frames, ignore_index=True)
            .groupby(["family", "key"], as_index=False)
            .agg(n=("tick", "size"), sum_ticks=("tick", "sum"))
        )
        return pa.Table.from_pandas(agg, preserve_index=False)

    out = (
        _events(sf_dir, columns=["event_type", "ts", "user_id", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["family", "key"])
        .aggregate(Sum("n", alias_name="n"), Sum("sum_ticks", alias_name="sum_ticks"))
        .to_pandas()
        .sort_values(["family", "key"])
        .reset_index(drop=True)
    )
    for c in ("n", "sum_ticks"):
        out[c] = out[c].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def text_compression_ratio(sf_dir: str) -> pa.Table:
    """Per-source zlib compression-ratio profile — the classic
    low-information/gibberish detector of web-corpus quality filtering
    (highly repetitive text compresses far below prose): per-doc
    deflate-ratio, folded to per-source (n_docs, mean ratio, n_flagged
    below 0.35). The per-row zlib call is a C-speed stdlib kernel (no
    vectorized alternative exists); only per-source scalars leave the
    scan. Deterministic (zlib level fixed), so the gate is rows-only +
    the planted-extremes pytest."""
    import zlib

    def partial(b: pa.Table) -> pa.Table:
        texts = b["text"].to_numpy(zero_copy_only=False)
        src = b["source"].to_numpy(zero_copy_only=False)
        ratios = np.array(
            [
                len(zlib.compress(t.encode(), 6)) / max(len(t.encode()), 1)
                for t in texts
            ]
        )
        df = pd.DataFrame(
            {"source": src, "r": ratios, "flag": (ratios < 0.35).astype(np.int64)}
        )
        agg = df.groupby("source", as_index=False).agg(
            n_docs=("r", "size"), sum_r=("r", "sum"), n_flagged=("flag", "sum")
        )
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts = (
        _documents(sf_dir, columns=["text", "source"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("source", as_index=False)
        .agg(n_docs=("n_docs", "sum"), sum_r=("sum_r", "sum"), n_flagged=("n_flagged", "sum"))
    )
    parts["mean_ratio"] = np.round(parts["sum_r"] / parts["n_docs"], 6)
    out = parts[["source", "n_docs", "n_flagged", "mean_ratio"]].sort_values(
        "source"
    )
    for c in ("n_docs", "n_flagged"):
        out[c] = out[c].astype(np.int64)
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def bpe_train_merges(sf_dir: str, num_merges: int = 3) -> pa.Table:
    """BPE merge-rule training (the tokenizer-construction step of a
    training-data pipeline): K rounds of most-frequent-adjacent-pair
    merging over the corpus, trained — as classic BPE is — on the WORD
    FREQUENCY DICTIONARY, not the raw corpus: one corpus scan folds
    per-batch word counts through a word-hash bucket reduce (the
    text_top_words exchange), and every merge round then runs over the
    vocab dataset (|vocab| ≪ corpus, still distributed): per-batch symbol-
    pair count partials → pair-hash bucket reduce (each pair's count
    completes inside ONE bucket, so per-bucket argmax + a 64-row driver
    fold finds the EXACT global top pair) → the winning rule broadcasts
    into the next round's split. Deterministic tie-break (count DESC,
    pair lexicographic) makes the rule sequence reproducible across block
    layouts. Rows-only driver gate; the serial-reference equivalence is
    pytest ``test_bpe_merges_match_serial_reference``."""
    vocab = (
        _documents(sf_dir, columns=["text"])
        .map_batches(_word_count_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda g: g.groupby("word", as_index=False).agg(n=("n", "sum")),
            batch_format="pandas",
        )
        .materialize()
    )

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):

        def pair_partial(b: pa.Table, merges=tuple(merges)) -> pa.Table:
            words = b["word"].to_numpy(zero_copy_only=False)
            ns = b["n"].to_numpy()
            counts: dict[tuple[str, str], int] = {}
            for w, n in zip(words, ns):
                syms = _bpe_apply(list(w) + ["</w>"], merges)
                for i in range(len(syms) - 1):
                    p = (syms[i], syms[i + 1])
                    counts[p] = counts.get(p, 0) + int(n)
            if not counts:
                return pa.table(
                    {"l": pa.array([], pa.string()), "r": pa.array([], pa.string()),
                     "n": pa.array([], pa.int64()), "bucket": pa.array([], pa.int64())}
                )
            ls, rs = zip(*counts.keys())
            out = pd.DataFrame({"l": ls, "r": rs, "n": list(counts.values())})
            out["bucket"] = (
                pd.util.hash_array((out["l"] + "\x00" + out["r"]).to_numpy(object))
                % 64
            ).astype(np.int64)
            return pa.Table.from_pandas(out, preserve_index=False)

        def bucket_best(g: pd.DataFrame) -> pd.DataFrame:
            agg = g.groupby(["l", "r"], as_index=False).agg(n=("n", "sum"))
            agg = agg.sort_values(["n", "l", "r"], ascending=[False, True, True])
            return agg.head(1)

        leaders = (
            vocab.map_batches(pair_partial, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(bucket_best, batch_format="pandas")
            .to_pandas()
        )
        if not len(leaders):
            break
        best = leaders.sort_values(
            ["n", "l", "r"], ascending=[False, True, True], kind="stable"
        ).iloc[0]
        merges.append((str(best["l"]), str(best["r"])))

    out = pd.DataFrame(
        {
            "rank": np.arange(len(merges), dtype=np.int64),
            "left": [m[0] for m in merges],
            "right": [m[1] for m in merges],
        }
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def _bpe_apply(syms: list[str], merges: tuple[tuple[str, str], ...]) -> list[str]:
    """Apply merge rules in rank order (each rule greedily left-to-right) —
    the classic BPE segmentation used by both the distributed trainer and
    the serial test reference."""
    for l, r in merges:
        out = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _word_count_partial(b: pa.Table) -> pa.Table:
    words = pc.list_flatten(
        pc.split_pattern_regex(pc.utf8_lower(b["text"]), pattern=r"[^\p{L}\p{N}]+")
    )
    s = pd.Series(words.to_numpy(zero_copy_only=False))
    s = s[s != ""]
    vc = s.value_counts()
    out = pd.DataFrame({"word": vc.index, "n": vc.to_numpy()})
    out["bucket"] = (
        pd.util.hash_array(out["word"].to_numpy(dtype=object)) % 64
    ).astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


class _BPETokenizeStage:
    """Distributed BPE ENCODE (tokenizer application — the counterpart of
    ``bpe_train_merges``): a stateful actor-pool ``map_batches`` stage.

    Scale shape: the trained merge table is tiny and broadcasts ONCE into
    each actor's ``__init__`` (where the rank-ordered rule tuple is bound —
    a real build would load a tokenizer model here); ``__call__`` encodes a
    batch. Tokenization is embarrassingly parallel — no exchange at any
    corpus size. Word splitting stays in Arrow (``utf8_lower`` +
    ``split_pattern_regex`` list kernel); the only Python-level work is
    merge application over UNIQUE words, behind a per-actor word→tokens
    cache (bounded) that exploits the Zipfian corpus so cache hits dominate
    at scale — the standard fast-BPE trick."""

    _CACHE_CAP = 1 << 20  # unique words held per actor; beyond this, recompute

    def __init__(self, merges: tuple[tuple[str, str], ...]):
        self._merges = tuple((str(l), str(r)) for l, r in merges)
        self._cache: dict[str, list[str]] = {}

    def _encode_word(self, w: str) -> list[str]:
        toks = self._cache.get(w)
        if toks is None:
            toks = _bpe_apply(list(w) + ["</w>"], self._merges)
            if len(self._cache) < self._CACHE_CAP:
                self._cache[w] = toks
        return toks

    def __call__(self, b: pa.Table) -> pa.Table:
        import hashlib

        words_per_doc = pc.split_pattern_regex(
            pc.utf8_lower(b["text"]), pattern=r"[^\p{L}\p{N}]+"
        )
        doc_ids = b["doc_id"].to_numpy()
        n_tokens = np.zeros(len(doc_ids), dtype=np.int64)
        digests: list[str] = []
        for i, wl in enumerate(words_per_doc.to_pylist()):
            toks: list[str] = []
            for w in wl:
                if w:
                    toks.extend(self._encode_word(w))
            n_tokens[i] = len(toks)
            digests.append(
                hashlib.md5("\x1f".join(toks).encode()).hexdigest()[:8]
            )
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "n_tokens": pa.array(n_tokens),
                "tok_digest": pa.array(digests, pa.string()),
            }
        )


def bpe_tokenize_corpus(sf_dir: str, num_merges: int = 8) -> pa.Table:
    """End-to-end BPE tokenization: train merge rules distributed
    (``bpe_train_merges`` — word-frequency-dict training, pair-hash bucket
    argmax per round), then ENCODE the whole corpus through the trained
    tokenizer as a stateful actor-pool stage (``_BPETokenizeStage``). Per
    doc the stage emits the exact token count and an md5 digest of the
    token sequence, so the serial-reference pytest
    (``test_bpe_tokenize_matches_serial_reference``) pins byte-exact
    segmentation, not just counts. Rows-only driver gate (iterative
    data-dependent training has no SQL analog)."""
    merges_tbl = bpe_train_merges(sf_dir, num_merges=num_merges)
    merges = tuple(
        zip(merges_tbl["left"].to_pylist(), merges_tbl["right"].to_pylist())
    )
    out = (
        _documents(sf_dir, columns=["doc_id", "text"])
        .map_batches(
            _BPETokenizeStage,
            fn_constructor_args=(merges,),
            batch_format="pyarrow",
            concurrency=(1, 8),
            batch_size=512,
        )
        .to_pandas()
        .sort_values("doc_id", kind="stable")
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


class _KeyedReranker:
    """Deterministic stand-in for a cross-encoder reranker: 'model load'
    happens once per actor in ``__init__`` (here: binding the query key —
    a real build would load weights), scoring per batch in ``__call__``.
    The fake score is the md5-low-8 keyed uniform so the SQL oracle can
    replay it exactly; the Ray-side shape (actor pool, batched scoring,
    rank fusion) is the real two-stage retrieval pattern."""

    def __init__(self, query_key: str = "q"):
        import hashlib

        self._md5 = hashlib.md5
        self.query_key = query_key

    def __call__(self, b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        u = np.array(
            [
                int.from_bytes(
                    self._md5(f"{self.query_key}|{i}".encode()).digest()[8:16],
                    "little",
                )
                % 1000
                for i in ids
            ],
            np.float64,
        )
        final = np.round(
            b["bm25"].to_numpy().astype(np.float64) + u / 1000.0, 6
        )
        return pa.table(
            {"doc_id": b["doc_id"], "bm25": b["bm25"], "final": pa.array(final)}
        )


def rerank_bm25_candidates(
    sf_dir: str, n_candidates: int = 100, k: int = 20
) -> pa.Table:
    """Two-stage retrieval (the RAG/data-curation serving pattern):
    stage 1 BM25 selects the candidate set; stage 2 reranks it with a
    stateful ACTOR-POOL ``map_batches`` stage (``_KeyedReranker`` —
    setup once per actor, score per batch). Candidates are bounded
    (n_candidates), so the rerank input is tiny however large the
    corpus; ties at both cut boundaries break on doc_id on both oracle
    sides."""
    cands = bm25_score_docs(sf_dir).to_pandas()
    cands = cands.sort_values(
        ["bm25", "doc_id"], ascending=[False, True], kind="stable"
    ).head(n_candidates)
    scored = (
        ray.data.from_arrow(pa.Table.from_pandas(cands, preserve_index=False))
        .map_batches(
            _KeyedReranker,
            batch_format="pyarrow",
            concurrency=2,
            batch_size=64,
        )
        .to_pandas()
    )
    out = scored.sort_values(
        ["final", "doc_id"], ascending=[False, True], kind="stable"
    ).head(k).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def split_train_val(sf_dir: str) -> pa.Table:
    """Deterministic train/val split (doc_id mod — replay-stable, no RNG
    state to checkpoint) with per-split doc and token budgets."""
    from data_exchange_routing_ray.functions.text import add_bpe_token_count

    def tag(b: pa.Table) -> pa.Table:
        b = add_bpe_token_count(b)
        split = np.where(b["doc_id"].to_numpy() % 10 < 8, "train", "val")
        return b.append_column("split", pa.array(split.astype(object), pa.string()))

    out = (
        _documents(sf_dir, columns=["doc_id", "text"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("split")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_bpe_tokens", alias_name="total_tokens"),
        )
        .to_pandas()
        .astype({"n_docs": "int64", "total_tokens": "int64"})
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def group_aware_split(sf_dir: str, pct_train: int = 80) -> pa.Table:
    """Group-aware (leakage-free) train/val split: the split is a pure
    function of the GROUP key (Knuth hash on user_id), so every event of a
    user lands in one split at any parallelism — the grouped analog of
    ``sample_hash_fraction``. Event counts are scalar partials; exact
    distinct-user counts shuffle only per-batch-deduped (split, user)
    pairs through a user-hash bucket exchange. The in-query leakage gate
    asserts the two splits' user sets PARTITION the global user set."""

    def partial(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy().astype(np.uint64)
        h = (uid * np.uint64(2654435761)) % np.uint64(1 << 32)
        split = np.where(h % np.uint64(100) < np.uint64(pct_train), "train", "val")
        df = (
            pd.DataFrame({"split": split, "user_id": uid.astype(np.int64)})
            .groupby(["split", "user_id"], as_index=False)
            .size()
        )
        df["bkt"] = (df["user_id"].to_numpy(np.int64) % 64).astype(np.int64)
        return pa.Table.from_pandas(
            df.rename(columns={"size": "n"}), preserve_index=False
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g.groupby(["split", "user_id"], as_index=False).agg(n=("n", "sum"))
        return d.groupby("split", as_index=False).agg(
            n_users=("user_id", "nunique"), n_events=("n", "sum")
        )

    out = (
        _events(sf_dir, columns=["user_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
        .groupby("split", as_index=False)
        .agg(n_users=("n_users", "sum"), n_events=("n_events", "sum"))
        .sort_values("split")
        .reset_index(drop=True)
    )
    # leakage gate: split user sets must partition the global user set —
    # exact because a user's split is a function of user_id (each user is
    # counted in exactly one split inside exactly one bucket)
    total = int(
        _events(sf_dir, columns=["user_id"]).map_batches(
            lambda b: pa.table(
                {"u": pa.array(np.unique(b["user_id"].to_numpy()))}
            ),
            batch_format="pyarrow",
        ).map_batches(
            lambda b: pa.table(
                {"bkt": pa.array(b["u"].to_numpy() % 64), "u": b["u"]}
            ),
            batch_format="pyarrow",
        )
        .groupby("bkt")
        .map_groups(
            lambda g: pd.DataFrame({"n": [g["u"].nunique()]}),
            batch_format="pandas",
        )
        .sum("n")
    )
    assert int(out["n_users"].sum()) == total, "group leakage: user in both splits"
    for c in ("n_users", "n_events"):
        out[c] = out[c].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def lake_write_amplification(sf_dir: str, epochs: int = 6) -> pa.Table:
    """Write-amplification A/B of the two merge policies over the SAME
    seq-ordered micro-batch schedule: copy-on-write ``rewrite`` (every
    touched partition rewritten per epoch) vs LSM-lite ``delta`` (small
    epochs append fenced change-table deltas; a level trigger compacts).
    rows_written folds from each epoch's commit stats — the operational
    evidence for the delta policy's bounded amplification (VERDICT round-1
    next-steps item 9). Rows-only gate; the delta<rewrite ordering is
    asserted in-query and in pytest."""
    hi = int(_events(sf_dir, columns=["event_id"]).max("event_id"))
    n = hi + 1
    # delta-shaped schedule: one bootstrap epoch (60% of the stream) then
    # small increments — the steady-state tail a long-running CDC ingest
    # actually sees, and the regime the delta policy exists for
    tail = epochs - 1
    bounds = [0, (6 * n) // 10] + [
        (6 * n) // 10 + (i * (n - (6 * n) // 10)) // tail for i in range(1, tail + 1)
    ]

    def epoch_stream(lo: int, up: int) -> ray.data.Dataset:
        return _events(
            sf_dir, columns=["event_id", "user_id", "event_type", "ts"]
        ).filter(expr=f"event_id >= {lo} and event_id < {up}").map_batches(
            derive_changes_batch, batch_format="pyarrow"
        )

    rows = []
    for policy in ("rewrite", "delta"):
        with tempfile.TemporaryDirectory(prefix="cdclake-") as d:
            lake = CDCLake(
                os.path.join(d, "lake"),
                num_partitions=16,
                merge_policy=policy,
            )
            written = 0
            for i in range(epochs):
                res = lake.apply_changes(
                    epoch_stream(bounds[i], bounds[i + 1]), quarantine=False
                )
                written += int(res.stats["row_count"].sum()) if len(res.stats) else 0
            net = lake.final_table().num_rows
        rows.append(
            {
                "policy": policy,
                "rows_written": written,
                "net_rows": net,
                "amplification": round(written / max(net, 1), 4),
            }
        )
    out = pd.DataFrame(rows)
    amp = out.set_index("policy")["amplification"]
    assert amp["delta"] <= amp["rewrite"], (
        f"delta policy must not amplify more than rewrite ({amp.to_dict()})"
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def text_token_counts(sf_dir: str) -> pa.Table:
    """BPE-ish sub-word token counting (token-budget estimator)."""
    from data_exchange_routing_ray.functions.text import add_bpe_token_count

    out = (
        _documents(sf_dir, columns=["doc_id", "text"])
        .map_batches(lambda b: add_bpe_token_count(b), batch_format="pyarrow")
        .to_pandas()
    )
    return pa.Table.from_pandas(out[["doc_id", "n_bpe_tokens"]], preserve_index=False)


def dedup_ngram_jaccard(sf_dir: str, est_threshold: float = 0.5) -> pa.Table:
    """Exact n-gram-Jaccard verification of MinHash-LSH candidates: the
    two-stage find→verify dedup shape. Each side's text is attached to the
    candidate pairs via a bucketed hash join (attach_payload_bucketed) and
    the exact shingle-set Jaccard is computed per pair inside map_batches —
    no driver-side gather of candidate texts (the pair set is bounded by
    LSH, but an adversarial dup rate would make a driver gather unbounded)."""
    from data_exchange_routing_ray.functions.dedup import (
        attach_payload_bucketed,
        jaccard_of_text_pairs,
        minhash_candidate_pairs,
    )

    ds = _documents(sf_dir, columns=["doc_id", "text"])
    pairs = minhash_candidate_pairs(ds, threshold=est_threshold).map_batches(
        lambda b: b.select(["id_a", "id_b"]), batch_format="pyarrow"
    )
    # size-gated text attach: small corpora verify against an object-store
    # broadcast of the docs (per-worker cached, zero-copy block reads);
    # above the budget the texts ride two bucketed attach joins instead
    if os.path.getsize(os.path.join(sf_dir, "documents.parquet")) <= (1 << 30):
        from data_exchange_routing_ray.functions.dedup import (
            _broadcast_lookup_str,
        )

        refs = ds.materialize().to_arrow_refs()

        def attach_and_verify(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table(
                    {"id_a": pa.array([], pa.int64()),
                     "id_b": pa.array([], pa.int64()),
                     "text_a": pa.array([], pa.string()),
                     "text_b": pa.array([], pa.string())}
                )
            ids, texts = _broadcast_lookup_str(refs, "doc_id", "text")
            a = b["id_a"].to_numpy()
            bb = b["id_b"].to_numpy()
            return pa.table(
                {
                    "id_a": pa.array(a, pa.int64()),
                    "id_b": pa.array(bb, pa.int64()),
                    "text_a": pa.array(texts[np.searchsorted(ids, a)], pa.string()),
                    "text_b": pa.array(texts[np.searchsorted(ids, bb)], pa.string()),
                }
            )

        with_ab = pairs.map_batches(attach_and_verify, batch_format="pyarrow")
    else:
        ids_schema = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])
        with_a = attach_payload_bucketed(
            pairs, ids_schema, ds,
            key_col="doc_id", payload_col="text", payload_type=pa.string(),
            side_col="id_a", out_col="text_a",
        )
        with_ab = attach_payload_bucketed(
            with_a, ids_schema.append(pa.field("text_a", pa.string())), ds,
            key_col="doc_id", payload_col="text", payload_type=pa.string(),
            side_col="id_b", out_col="text_b",
        )
    out = with_ab.map_batches(
        jaccard_of_text_pairs, batch_format="pyarrow"
    ).to_pandas()  # bounded: one row per verified candidate pair
    if not len(out):
        return pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}
        )
    return pa.Table.from_pandas(
        out.sort_values(["id_a", "id_b"]).reset_index(drop=True), preserve_index=False
    )


def csv_source_roundtrip(sf_dir: str) -> pa.Table:
    """Delimited-text source/sink (S15, PL_ReportStream): events → CSV files
    → read_csv → grouped rollup. Value scaled to integer ticks before the
    text roundtrip (floor(value*10000)) so float formatting cannot drift."""

    def to_csv_cols(b: pa.Table) -> pa.Table:
        v = np.floor(b["value"].to_numpy() * 10000.0).astype(np.int64)
        return pa.table(
            {
                "event_id": b["event_id"],
                "event_type": b["event_type"],
                "value_t": pa.array(v, pa.int64()),
            }
        )

    with tempfile.TemporaryDirectory(prefix="csvrt-") as d:
        _events(sf_dir, columns=["event_id", "event_type", "value"]).map_batches(
            to_csv_cols, batch_format="pyarrow"
        ).write_csv(d)
        back = ray.data.read_csv(d)
        out = (
            back.groupby("event_type")
            .aggregate(Count(alias_name="n"), Sum("value_t", alias_name="sum_ticks"))
            .to_pandas()
        )
    return pa.Table.from_pandas(out, preserve_index=False)


def jsonl_source_roundtrip(sf_dir: str) -> pa.Table:
    """JSON-lines source/sink (the reference's event payloads are JSON,
    ``RouteIngestedFile.kt:125-133``; this is the file-level analog of
    S15's delimited-text path): events → write_json (one .json shard per
    block) → read_json → grouped rollup. Value scaled to integer ticks
    before the text roundtrip so float formatting cannot drift."""

    def to_json_cols(b: pa.Table) -> pa.Table:
        v = np.floor(b["value"].to_numpy() * 10000.0).astype(np.int64)
        return pa.table(
            {
                "event_id": b["event_id"],
                "event_type": b["event_type"],
                "value_t": pa.array(v, pa.int64()),
            }
        )

    with tempfile.TemporaryDirectory(prefix="jsonrt-") as d:
        _events(sf_dir, columns=["event_id", "event_type", "value"]).map_batches(
            to_json_cols, batch_format="pyarrow"
        ).write_json(d)
        back = ray.data.read_json(d)
        out = (
            back.groupby("event_type")
            .aggregate(Count(alias_name="n"), Sum("value_t", alias_name="sum_ticks"))
            .to_pandas()
        )
    return pa.Table.from_pandas(out, preserve_index=False)


def ann_batch_topk(sf_dir: str, k: int = 10, n_queries: int = 8) -> pa.Table:
    """Batched exact top-k: one matmul per block against a broadcast query
    matrix (the batched-inference shape for similarity search)."""
    from data_exchange_routing_ray.functions.similarity import batch_topk_cosine

    ds = _embeddings(sf_dir)
    qdf = ds.filter(expr=f"vec_id < {n_queries}").to_pandas().sort_values("vec_id")
    Q = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    out = batch_topk_cosine(ds, Q, qdf["vec_id"].to_numpy(), k=k)
    return pa.Table.from_pandas(
        out[["query_id", "vec_id", "cosine"]], preserve_index=False
    )


def window_tumbling_daily(sf_dir: str) -> pa.Table:
    """Tumbling 1-day window per user: partial agg inside map_batches, then
    ONE coarse-bucket shuffle with a vectorized in-bucket reduce — the
    windowed-aggregate pattern Ray Data lacks natively. The (user, day) key
    cardinality grows with the data, so the final reduce is a bucketed
    ``map_groups``, not ``Dataset.aggregate`` on the raw composite key."""

    def partial(b: pa.Table) -> pa.Table:
        day = pc.strftime(b["ts"], format="%Y-%m-%d")
        t = pa.table(
            {"user_id": b["user_id"], "day": day, "value": b["value"]}
        ).to_pandas()
        g = t.groupby(["user_id", "day"], as_index=False).agg(
            n=("value", "size"), total_value=("value", "sum")
        )
        mix = np.uint64(0x9E3779B97F4A7C15)
        g["_bucket"] = (
            (g["user_id"].to_numpy().astype(np.int64).view(np.uint64) * mix)
            % np.uint64(64)
        ).astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["user_id", "day"], as_index=False).agg(
            n=("n", "sum"), total_value=("total_value", "sum")
        )

    out = (
        _events(sf_dir, columns=["user_id", "ts", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    out["total_value"] = np.round(out["total_value"], 4)
    return pa.Table.from_pandas(out, preserve_index=False)


def multimodal_resize_framesample(sf_dir: str) -> pa.Table:
    """Resize (actor pool) + frame-sample (1→N exploder) plumbing over
    synthetic media; per-media rollup of sampled frames + resized bytes."""
    from data_exchange_routing_ray.functions.multimodal import (
        ResizeMedia,
        sample_frames,
        synthesize_media_batch,
    )

    media = _documents(sf_dir, columns=["doc_id", "text"]).map_batches(
        synthesize_media_batch, batch_format="pyarrow"
    )
    resized = media.map_batches(
        ResizeMedia(target_w=16, target_h=16), batch_format="pyarrow", concurrency=2
    )
    frames = media.map_batches(
        lambda b: sample_frames(b, frame_size=32, every_nth=2),
        batch_format="pyarrow",
    )
    fcounts = (
        frames.groupby("media_id").aggregate(Count(alias_name="n_frames")).to_pandas()
    )
    sizes = resized.map_batches(
        lambda b: pa.table(
            {
                "media_id": b["media_id"],
                "resized_bytes": pa.array(
                    [len(p) for p in b["payload"].to_pylist()], pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()
    out = sizes.merge(fcounts, on="media_id", how="left").fillna({"n_frames": 0})
    out["n_frames"] = out["n_frames"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def multimodal_phash_dedup(sf_dir: str) -> pa.Table:
    """Perceptual-hash image dedup over REAL PNGs: per doc a genuine PNG
    payload with PLANTED near-duplicate groups (group = doc_id//5 shares a
    base raster; members differ by brightness + pixel noise) is
    synthesized, an actor-pool pHash stage (decode → 32×32 area mean →
    2-D DCT-II → median-threshold 63-bit hash; basis built once per actor)
    hashes each image, and banded-Hamming LSH (8×8-bit bands, ≤7 bits)
    pairs near-duplicates. Measured synth margins (in-group Hamming 0,
    cross-group ≥18) make the pair set EXACTLY the in-group combinations,
    so the SQL oracle is the closed-form group self-join — full recall AND
    zero false positives are value-checked, not sampled."""
    from data_exchange_routing_ray.functions.dedup import phash_candidate_pairs
    from data_exchange_routing_ray.functions.multimodal import (
        PerceptualHash,
        synthesize_neardup_png_batch,
    )

    hashed = (
        _documents(sf_dir, columns=["doc_id"])
        .map_batches(
            synthesize_neardup_png_batch, batch_format="pyarrow", batch_size=512
        )
        .map_batches(
            PerceptualHash,
            batch_format="pyarrow",
            batch_size=512,
            concurrency=(1, 8),
        )
    ).materialize()  # (media_id, phash, error) — scalars only, reused twice
    n_err = hashed.map_batches(
        lambda b: pa.table(
            {"e": pa.array([b["error"].null_count < len(b["error"])], pa.bool_())}
        ),
        batch_format="pyarrow",
    ).to_pandas()
    assert not n_err["e"].any(), "pHash stage produced decode errors"
    pairs = phash_candidate_pairs(hashed.drop_columns(["error"])).to_pandas()
    pairs = pairs.sort_values(["id_a", "id_b"], ignore_index=True)
    return pa.table(
        {
            "doc_a": pa.array(pairs["id_a"].to_numpy(), pa.int64()),
            "doc_b": pa.array(pairs["id_b"].to_numpy(), pa.int64()),
        }
    )


def training_data_prep(sf_dir: str) -> pa.Table:
    """Composite training-data prep pipeline: quality score → language ID →
    quality/lang filter → exact dedup by md5 → per-source doc/token budget.
    The end-to-end corpus-curation shape, fully SQL-verifiable."""
    from data_exchange_routing_ray.functions.dedup import exact_dedup
    from data_exchange_routing_ray.functions.text import (
        add_bpe_token_count,
        add_lang_id,
        add_quality_score,
    )

    def annotate(b: pa.Table) -> pa.Table:
        return add_bpe_token_count(add_lang_id(add_quality_score(b)))

    ds = (
        _documents(sf_dir, columns=["doc_id", "text", "source"])
        .map_batches(annotate, batch_format="pyarrow")
        .map_batches(
            lambda b: b.filter(
                pc.and_(
                    pc.greater_equal(b["quality"], pa.scalar(0.1)),
                    pc.equal(b["lang_pred"], pa.scalar("en")),
                )
            ),
            batch_format="pyarrow",
        )
    )
    deduped = exact_dedup(ds, col="text", id_col="doc_id")
    out = (
        deduped.groupby("source")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_bpe_tokens", alias_name="total_tokens"),
        )
        .to_pandas()
        .astype({"n_docs": "int64", "total_tokens": "int64"})
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def multimodal_decode(sf_dir: str) -> pa.Table:
    """REAL image decode as an actor-pool stage: per doc a genuine PNG
    payload (zlib-compressed CRC'd chunks, filter type cycling 0-4;
    ``functions/png.py``) is synthesized, then ``DecodeMedia(decode="real")``
    decodes it — Pillow if importable, else the pure-numpy codec — and the
    width/height/channels/pixel_sum columns are value-checked against the
    SQL oracle's closed form. Feature extraction (actor-pool batched
    'inference' over the decoded payloads) rides the same chain."""
    from data_exchange_routing_ray.functions.multimodal import (
        DecodeMedia,
        ExtractMediaFeatures,
        synthesize_png_batch,
    )

    ds = (
        _documents(sf_dir, columns=["doc_id"])
        .map_batches(synthesize_png_batch, batch_format="pyarrow", batch_size=512)
        .map_batches(
            DecodeMedia,
            fn_constructor_kwargs={"decode": "real"},
            batch_format="pyarrow",
            batch_size=512,
            # autoscaling pool: rigid concurrency=N deadlocks when the
            # session has fewer CPUs than the sum of this chain's pools
            concurrency=(1, 8),
        )
        .map_batches(
            ExtractMediaFeatures, batch_format="pyarrow", concurrency=(1, 4)
        )
    )
    out = ds.to_pandas()
    assert out["error"].isna().all(), "real PNG decode produced errors"
    return pa.Table.from_pandas(
        out[["media_id", "width", "height", "channels", "pixel_sum", "decoded_bytes"]],
        preserve_index=False,
    )


def multimodal_audio_features(sf_dir: str) -> pa.Table:
    """REAL WAV decode + audio features as an actor-pool stage: per doc a
    genuine RIFF/PCM payload (deterministic int16 sawtooth;
    ``functions/wav.py``) is synthesized, structurally validated and
    decoded; PCM is lossless so sample counts, rates and the |PCM| sum are
    value-checked EXACTLY by the SQL oracle (closed-form over the sawtooth);
    RMS/zero-crossing features ride the same stage and are gated in-query
    (>0 for a non-silent clip)."""
    from data_exchange_routing_ray.functions.multimodal import (
        DecodeAudio,
        synthesize_wav_batch,
    )

    ds = (
        _documents(sf_dir, columns=["doc_id"])
        .map_batches(synthesize_wav_batch, batch_format="pyarrow")
        .map_batches(DecodeAudio, batch_format="pyarrow", concurrency=2)
    )
    out = ds.to_pandas()
    assert out["error"].isna().all(), "real WAV decode produced errors"
    assert (out["rms"] > 0).all() and (out["zero_cross_rate"] > 0).all()
    return pa.Table.from_pandas(
        out[["media_id", "sample_rate", "channels", "n_samples", "pcm_abs_sum"]],
        preserve_index=False,
    )


def multimodal_decode_jpeg(sf_dir: str) -> pa.Table:
    """REAL baseline-JPEG decode as an actor-pool stage: per doc a genuine
    JFIF payload (standard Annex-K Huffman tables, chroma subsampling
    cycling 4:4:4/4:2:2/4:2:0; ``functions/jpeg.py``) is synthesized and
    decoded. width/height/channels are value-checked by the SQL oracle;
    the lossy pixel content is gated IN-QUERY by mean |decoded−source| ≤ 3
    per image (``DecodeJpegChecked`` raises on violation — JPEG rounding
    cannot be expressed in SQL)."""
    from data_exchange_routing_ray.functions.multimodal import (
        DecodeJpegChecked,
        synthesize_jpeg_batch,
    )

    ds = (
        _documents(sf_dir, columns=["doc_id"])
        .map_batches(synthesize_jpeg_batch, batch_format="pyarrow", batch_size=256)
        .map_batches(
            DecodeJpegChecked,
            batch_format="pyarrow",
            batch_size=256,
            concurrency=(1, 8),
        )
    )
    out = ds.to_pandas()
    return pa.Table.from_pandas(
        out[["media_id", "width", "height", "channels"]], preserve_index=False
    )


# ----------------------------------------------------- round-1 widening set


def semi_join_orders_building(sf_dir: str, segment: str = "BUILDING") -> pa.Table:
    """Semi join (positive counterpart of the anti join): orders whose
    customer belongs to one market segment, summarized per priority.

    The segment's distinct custkeys are broadcast once (``ray.put``); the
    fact table streams through an ``is_in`` filter plus a partial-agg
    combiner — no shuffle of orders. This is the reference's membership
    gate (route-config hit path, J1,
    fns-routing/.../RouteIngestedFile.kt:150-184) on relational data."""
    import ray as _ray

    cust = pd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_mktsegment"]
    )
    keys = pa.array(
        np.sort(cust.loc[cust["c_mktsegment"] == segment, "c_custkey"].to_numpy()),
        pa.int64(),
    )
    ref = _ray.put(keys)

    def partial(b: pa.Table) -> pa.Table:
        ks = _ray.get(ref)
        t = b.filter(pc.is_in(b["o_custkey"], value_set=ks))
        df = t.select(["o_orderpriority", "o_totalprice"]).to_pandas()
        g = df.groupby("o_orderpriority", as_index=False).agg(
            n=("o_totalprice", "size"), revenue=("o_totalprice", "sum")
        )
        return pa.table(
            {
                "o_orderpriority": pa.array(g["o_orderpriority"], pa.string()),
                "n": pa.array(g["n"], pa.int64()),
                "revenue": pa.array(g["revenue"], pa.float64()),
            }
        )

    out = (
        _read_sized(
os.path.join(sf_dir, "orders.parquet"),
            columns=["o_custkey", "o_orderpriority", "o_totalprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("n", alias_name="n"), Sum("revenue", alias_name="revenue"))
        .to_pandas()
    )
    out["revenue"] = np.round(out["revenue"], 4)
    out["n"] = out["n"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def reassemble_user_histories(sf_dir: str) -> pa.Table:
    """Grouped ORDERED concatenation — the transcript-reassembly op that
    turns a per-turn/per-event lake back into whole conversation strings
    for training export.

    Scale shape: ONE coarse bucket shuffle (user-hash % 256, same layout as
    ``sessionize_events``); inside each bucket the whole frame is sorted
    ``(user_id, ts, event_id)`` once and concatenated with a pandas
    groupby-join — per-bucket vectorized, no per-user Dataset dispatch, and
    bucket count (not user count) bounds task overhead at 10^9 users."""

    def bucket(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy()
        bk = (uid * np.int64(0x9E3779B9)) % 256
        return b.append_column("bucket", pa.array(bk.astype(np.int64), pa.int64()))

    def concat_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        return g.groupby("user_id", as_index=False, sort=False).agg(
            n_events=("event_id", "size"), history=("event_type", ",".join)
        )

    out = (
        _events(sf_dir, columns=["user_id", "event_id", "event_type", "ts"])
        .map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(concat_bucket, batch_format="pandas")
        .to_pandas()
    )
    out["n_events"] = out["n_events"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def sample_hash_fraction(sf_dir: str, pct: int = 10) -> pa.Table:
    """Deterministic hash sampling (Knuth multiplicative hash on the row
    key) — the reproducible sample a training pipeline takes instead of
    ``random_shuffle``: a pure per-batch arithmetic filter, no RNG state,
    no shuffle; the same rows are selected at any parallelism, so a
    resumed/rescaled job sees an identical sample."""

    def partial(b: pa.Table) -> pa.Table:
        ids = b["event_id"].to_numpy().astype(np.uint64)
        h = (ids * np.uint64(2654435761)) % np.uint64(1 << 32)
        t = b.filter(pa.array((h % np.uint64(100)) < np.uint64(pct)))
        df = t.select(["event_type", "value"]).to_pandas()
        g = df.groupby("event_type", as_index=False).agg(
            n=("value", "size"), total_value=("value", "sum")
        )
        return pa.table(
            {
                "event_type": pa.array(g["event_type"], pa.string()),
                "n": pa.array(g["n"], pa.int64()),
                "total_value": pa.array(g["total_value"], pa.float64()),
            }
        )

    out = (
        _events(sf_dir, columns=["event_id", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n"), Sum("total_value", alias_name="total_value"))
        .to_pandas()
    )
    out["total_value"] = np.round(out["total_value"], 4)
    out["n"] = out["n"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def mixture_temperature_weights(
    sf_dir: str, alpha: float = 0.3, budget_chars: int = 10_000_000
) -> pa.Table:
    """Temperature-based mixture weights (the mT5/XLM-R ``p ∝ n^α``
    upsampling rule): per-source corpus sizes reduce to one tiny partial
    table (per-batch counts, one source groupby — the only exchange),
    then the driver computes the renormalized sampling probability and
    the per-source repeat factor a budget of ``budget_chars`` implies.
    α<1 flattens the mixture toward low-resource sources; all heavy math
    happens on a ≤|sources|-row table, so the op costs one pruned scan
    regardless of corpus size."""

    def partial(b: pa.Table) -> pa.Table:
        df = b.select(["source", "n_chars"]).to_pandas()
        g = df.groupby("source", as_index=False).agg(
            n_docs=("n_chars", "size"), total_chars=("n_chars", "sum")
        )
        return pa.table(
            {
                "source": pa.array(g["source"], pa.string()),
                "n_docs": pa.array(g["n_docs"], pa.int64()),
                "total_chars": pa.array(g["total_chars"], pa.int64()),
            }
        )

    agg = (
        _documents(sf_dir, columns=["source", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("total_chars", alias_name="total_chars"),
        )
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    n = agg["total_chars"].to_numpy().astype(np.float64)
    w = n**alpha
    p = w / w.sum()
    return pa.table(
        {
            "source": pa.array(agg["source"], pa.string()),
            "n_docs": pa.array(agg["n_docs"].astype("int64"), pa.int64()),
            "total_chars": pa.array(
                agg["total_chars"].astype("int64"), pa.int64()
            ),
            "p_sampling": pa.array(p, pa.float64()),
            "repeat_factor": pa.array(p * budget_chars / n, pa.float64()),
        }
    )


def mix_weighted_sources(sf_dir: str) -> pa.Table:
    """Weighted mixture sampling per source (training-mixture op): each
    source keeps a deterministic hash fraction of its docs — rate(src) =
    20 + 15·(src_num mod 5) percent — then per-source doc and char budgets
    are reported. Per-batch arithmetic + tiny groupby; the mixture is
    reproducible and resumable because membership is a pure function of
    ``doc_id``, never of execution order."""

    def partial(b: pa.Table) -> pa.Table:
        df = b.select(["doc_id", "source", "n_chars"]).to_pandas()
        src_num = df["source"].str.slice(3).astype(np.int64)
        rate = (20 + 15 * (src_num % 5)).to_numpy()
        ids = df["doc_id"].to_numpy().astype(np.uint64)
        h = (ids * np.uint64(2654435761)) % np.uint64(1 << 32)
        keep = (h % np.uint64(100)).astype(np.int64) < rate
        g = df[keep].groupby("source", as_index=False).agg(
            n_docs=("doc_id", "size"), total_chars=("n_chars", "sum")
        )
        return pa.table(
            {
                "source": pa.array(g["source"], pa.string()),
                "n_docs": pa.array(g["n_docs"], pa.int64()),
                "total_chars": pa.array(g["total_chars"], pa.int64()),
            }
        )

    out = (
        _documents(sf_dir, columns=["doc_id", "source", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("total_chars", alias_name="total_chars"))
        .to_pandas()
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    out["total_chars"] = out["total_chars"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def rollup_region_nation_revenue(sf_dir: str) -> pa.Table:
    """Multi-level (ROLLUP) aggregate in ONE scan of the fact table:
    fine-grain partials per (region, nation) via the composed broadcast-join
    gather (same shape as ``join_multiway_region_revenue``), then the
    coarser levels — per-region and grand total — derived on the driver
    from the tiny fine-grain result. Orders are read once and never
    shuffled; only unrounded sums are re-aggregated, so every level is
    exact."""
    import ray as _ray

    cust = pd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_nationkey"]
    )
    nat = pd.read_parquet(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    reg = pd.read_parquet(
        os.path.join(sf_dir, "region.parquet"), columns=["r_regionkey", "r_name"]
    )
    nat_info = {
        nk: (reg_name, n_name)
        for nk, n_name, reg_name in zip(
            nat["n_nationkey"],
            nat["n_name"],
            nat["n_regionkey"].map(dict(zip(reg["r_regionkey"], reg["r_name"]))),
        )
    }
    # composed dimension chain broadcast as parallel Arrow arrays (keys +
    # one values array per output column): the per-batch 3-way join is
    # index_in + two takes — no pandas-dict per-row Python hashing
    ref = _ray.put((
        pa.array(cust["c_custkey"].to_numpy(), pa.int64()),
        pa.array(
            [nat_info[nk][0] for nk in cust["c_nationkey"]], pa.string()
        ),
        pa.array(
            [nat_info[nk][1] for nk in cust["c_nationkey"]], pa.string()
        ),
    ))

    def partial(b: pa.Table) -> pa.Table:
        keys, rvals, nvals = _ray.get(ref)
        idx = pc.index_in(b["o_custkey"], value_set=keys)
        tb = pa.table({
            "r_name": pc.take(rvals, idx),
            "n_name": pc.take(nvals, idx),
            "o_totalprice": b["o_totalprice"],
        })
        g = tb.group_by(["r_name", "n_name"]).aggregate(
            [("o_totalprice", "sum"), ("o_totalprice", "count")]
        )
        return pa.table({
            "r_name": g["r_name"],
            "n_name": g["n_name"],
            "revenue": g["o_totalprice_sum"],
            "n_orders": g["o_totalprice_count"].cast(pa.int64()),
        })

    fine = (
        _read_sized(
os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey", "o_totalprice"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["r_name", "n_name"])
        .aggregate(Sum("revenue", alias_name="revenue"), Sum("n_orders", alias_name="n_orders"))
        .to_pandas()
    )
    lvl1 = fine.groupby("r_name", as_index=False).agg(
        revenue=("revenue", "sum"), n_orders=("n_orders", "sum")
    )
    lvl1["n_name"] = "ALL"
    grand = pd.DataFrame(
        [{
            "r_name": "ALL",
            "n_name": "ALL",
            "revenue": fine["revenue"].sum(),
            "n_orders": fine["n_orders"].sum(),
        }]
    )
    out = pd.concat([fine, lvl1, grand], ignore_index=True)[
        ["r_name", "n_name", "revenue", "n_orders"]
    ]
    out["revenue"] = np.round(out["revenue"], 4)
    out["n_orders"] = out["n_orders"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def text_dup_ngram_fraction(sf_dir: str, n: int = 3) -> pa.Table:
    """Duplicate-ngram fraction per document — the Gopher/RefinedWeb-style
    corpus-level quality signal: for each doc, the fraction of its distinct
    word n-grams that also occur in at least one OTHER document.

    Scale shape: per-batch shingling emits distinct (doc_id, shingle) pairs
    bucketed by shingle-hash % 64; ONE coarse groupby on the bucket, then
    all shared-shingle marking and per-doc partials are vectorized pandas
    inside the bucket; a second coarse groupby on doc-hash buckets sums the
    per-doc partials (map_groups over buckets, NOT a per-key aggregate —
    Ray's Sum aggregate on 5000 keys measured 25 s where the bucketed
    vectorized reduce takes <1 s). Shuffle volume is the distinct-shingle
    pair set, never the corpus text."""

    def shingles(b: pa.Table) -> pa.Table:
        docs, shs = [], []
        ids = b["doc_id"].to_numpy()
        for did, txt in zip(ids, b["text"].to_pylist()):
            w = txt.split(" ")
            if len(w) < n:
                continue
            uniq = {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}
            docs.extend([did] * len(uniq))
            shs.extend(uniq)
        from zlib import crc32

        # deterministic cross-process hash (builtin hash() is seed-randomized
        # per worker and would scatter identical shingles across buckets)
        h = np.array([crc32(s.encode()) & 63 for s in shs], dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(docs, pa.int64()),
                "shingle": pa.array(shs, pa.string()),
                "bucket": pa.array(h, pa.int64()),
            }
        )

    def mark_bucket(g: pd.DataFrame) -> pd.DataFrame:
        nd = g.groupby("shingle")["doc_id"].transform("size")
        out = pd.DataFrame({"doc_id": g["doc_id"], "one": 1, "shared": (nd > 1).astype(np.int64)})
        agg = out.groupby("doc_id", as_index=False).agg(
            n_shingles=("one", "sum"), n_shared=("shared", "sum")
        )
        agg["doc_bucket"] = agg["doc_id"].to_numpy() % 64
        return agg

    def sum_doc_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("doc_id", as_index=False).agg(
            n_shingles=("n_shingles", "sum"), n_shared=("n_shared", "sum")
        )

    out = (
        _documents(sf_dir, columns=["doc_id", "text"])
        .map_batches(shingles, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(mark_bucket, batch_format="pandas")
        .groupby("doc_bucket")
        .map_groups(sum_doc_bucket, batch_format="pandas")
        .to_pandas()
    )
    out["n_shingles"] = out["n_shingles"].astype("int64")
    out["n_shared"] = out["n_shared"].astype("int64")
    out["dup_frac"] = np.round(out["n_shared"] / out["n_shingles"], 6)
    return pa.Table.from_pandas(out, preserve_index=False)


def pack_token_sequences(
    sf_dir: str, capacity: int = 2048, bucket_size: int = 64
) -> pa.Table:
    """Sequence packing for training export — assign docs (in doc_id order)
    to fixed-capacity token bins via a DISTRIBUTED ORDERED PREFIX-SCAN:
    ``bin(doc) = (tokens before doc in id order) // capacity``.

    Scan shape (the classic two-pass distributed scan): pass 0 computes
    per-doc token counts (ONE corpus scan; only (doc_id, n_tokens) pairs —
    16 B/doc — survive, materialized). Pass 1 groups pairs into coarse
    id-range buckets and collects the tiny per-bucket totals; the driver
    prefix-sums them into bucket offsets and broadcasts. Pass 2 re-groups
    the pairs per bucket, adds the bucket offset to the within-bucket
    cumulative sum (vectorized), bins every doc, and emits per-(bucket,bin)
    partials; a final tiny groupby merges bins that straddle bucket
    boundaries. The corpus text is read once; both shuffles move only the
    integer pairs."""
    import ray as _ray

    from data_exchange_routing_ray.functions.text import add_bpe_token_count

    def tokens(b: pa.Table) -> pa.Table:
        t = add_bpe_token_count(b)
        return pa.table({"doc_id": t["doc_id"], "n_tokens": t["n_bpe_tokens"]})

    pairs = (
        _documents(sf_dir, columns=["doc_id", "text"])
        .map_batches(tokens, batch_format="pyarrow")
        .map_batches(
            lambda b: b.append_column(
                "bucket",
                pa.array(b["doc_id"].to_numpy() // bucket_size, pa.int64()),
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    totals = (
        pairs.groupby("bucket")
        .aggregate(Sum("n_tokens", alias_name="tot"))
        .to_pandas()
        .sort_values("bucket")
    )
    off = np.concatenate([[0], np.cumsum(totals["tot"].to_numpy())[:-1]])
    ref = _ray.put(dict(zip(totals["bucket"], off)))

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        offsets = _ray.get(ref)
        g = g.sort_values("doc_id", kind="stable")
        n = g["n_tokens"].to_numpy()
        prior = offsets[int(g["bucket"].iloc[0])] + np.cumsum(n) - n
        out = pd.DataFrame({"bin_id": prior // capacity, "one": 1, "n_tokens": n})
        agg = out.groupby("bin_id", as_index=False).agg(
            n_docs=("one", "sum"), bin_tokens=("n_tokens", "sum")
        )
        # coarse key for the final reduce: a bin straddles ≤2 id-range
        # buckets, so partial rows ≈ n_bins + n_buckets; map_groups over 64
        # coarse buckets + vectorized sum beats a per-bin Sum aggregate
        agg["bin_bucket"] = agg["bin_id"].to_numpy() % 64
        return agg

    def sum_bins(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("bin_id", as_index=False).agg(
            n_docs=("n_docs", "sum"), bin_tokens=("bin_tokens", "sum")
        )

    out = (
        pairs.groupby("bucket")
        .map_groups(assign, batch_format="pandas")
        .groupby("bin_bucket")
        .map_groups(sum_bins, batch_format="pandas")
        .to_pandas()
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    out["bin_tokens"] = out["bin_tokens"].astype("int64")
    out["bin_id"] = out["bin_id"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def _export_shards(
    sf_dir: str, out_dir: str, n_shards: int = 8, allow=None
) -> list[int]:
    """One resumable export pass: tokenize docs, assign shard =
    doc_id % n_shards, write ONLY shards not yet committed to the
    ``_SHARDS_DONE`` manifest (and, if ``allow`` is given, only those —
    the 'interrupted run' simulation). Each pass ends with an atomic
    manifest commit (tmp + ``os.replace``), so a crash between write and
    commit re-exports at most the in-flight shards and never corrupts
    finished ones. Returns the shard ids written this pass.

    Scale shape: the shard tag is a pure function of doc_id (replay- and
    layout-invariant); the write is Ray's streaming partitioned
    ``write_parquet`` (one directory per shard, many files — never one
    giant file), so a resumed 100 TB export skips finished shard
    directories entirely and re-reads nothing."""
    from data_exchange_routing_ray.functions.text import add_bpe_token_count

    manifest = os.path.join(out_dir, "_SHARDS_DONE")
    done: set[int] = set()
    if os.path.exists(manifest):
        done = {int(x) for x in open(manifest).read().split() if x}
    todo = [
        s
        for s in range(n_shards)
        if s not in done and (allow is None or s in allow)
    ]
    if not todo:
        return []

    # crash recovery: a pass that died after write_parquet but before the
    # manifest commit left orphan files in its shard dirs — clear any
    # uncommitted shard dir before rewriting, else the rerun would APPEND
    # duplicate files beside the orphans
    import shutil

    for s in todo:
        p = os.path.join(out_dir, f"shard={s}")
        if os.path.isdir(p):
            shutil.rmtree(p)

    todo_arr = pa.array(todo, pa.int64())

    def tag_and_filter(b: pa.Table) -> pa.Table:
        t = add_bpe_token_count(b)
        shard = pa.array(t["doc_id"].to_numpy() % n_shards, pa.int64())
        t = pa.table(
            {"doc_id": t["doc_id"], "n_tokens": t["n_bpe_tokens"], "shard": shard}
        )
        return t.filter(pc.is_in(t["shard"], value_set=todo_arr))

    (
        _documents(sf_dir, columns=["doc_id", "text"])
        .map_batches(tag_and_filter, batch_format="pyarrow")
        .write_parquet(out_dir, partition_cols=["shard"])
    )
    tmp = manifest + ".tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(str(s) for s in sorted(done | set(todo))))
    os.replace(tmp, manifest)
    return todo


def export_training_shards(sf_dir: str, n_shards: int = 8) -> pa.Table:
    """Resumable tokenized training-shard export, end-to-end: run an
    'interrupted' export that commits only the first half of the shards,
    then a RESUME pass that must skip every finished shard (file listings
    asserted byte-identical) and write exactly the missing ones; read the
    partitioned tree back and return the per-shard manifest
    (n_docs, total_tokens, sorted-doc-id digest) — value-checked against a
    DuckDB md5/string_agg oracle. The digest fold runs per shard inside
    ``map_groups`` (at 100 TB the shard count scales with the corpus, and
    a production manifest would fold a streaming/merkle digest instead of
    the full id list — the id-list digest is the verification artifact
    here)."""
    import hashlib

    with tempfile.TemporaryDirectory(prefix="shardexport-") as d:
        first = _export_shards(sf_dir, d, n_shards, allow=set(range(n_shards // 2)))
        assert sorted(first) == list(range(n_shards // 2))

        def listing() -> dict[str, list[str]]:
            return {
                e: sorted(os.listdir(os.path.join(d, e)))
                for e in os.listdir(d)
                if e.startswith("shard=")
            }

        before = listing()
        second = _export_shards(sf_dir, d, n_shards)
        assert sorted(second) == list(range(n_shards // 2, n_shards))
        after = listing()
        # resume touched NO finished shard directory
        for s in first:
            assert after[f"shard={s}"] == before[f"shard={s}"]
        # a third pass is a no-op (idempotent once all shards committed)
        assert _export_shards(sf_dir, d, n_shards) == []

        def shard_digest(g: pd.DataFrame) -> pd.DataFrame:
            ids = np.sort(g["doc_id"].to_numpy())
            return pd.DataFrame(
                {
                    "shard": [int(g["shard"].iloc[0])],
                    "n_docs": [len(ids)],
                    "total_tokens": [int(g["n_tokens"].sum())],
                    "digest": [
                        hashlib.md5(
                            ",".join(map(str, ids)).encode()
                        ).hexdigest()[:8]
                    ],
                }
            )

        out = (
            ray.data.read_parquet(d)
            .groupby("shard")
            .map_groups(shard_digest, batch_format="pandas")
            .to_pandas()
            .sort_values("shard", kind="stable")
            .reset_index(drop=True)
        )
    out = out.astype(
        {"shard": "int64", "n_docs": "int64", "total_tokens": "int64"}
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def stratified_sample_per_source(sf_dir: str, k: int = 5) -> pa.Table:
    """Exact-k-per-group deterministic sample — "take k docs per domain"
    curation: rank docs within each source by Knuth hash of doc_id (ties
    broken by doc_id) and keep the k smallest.

    Scale shape: same bounded-candidate layout as ``grouped_topk_orders`` —
    each batch keeps at most k candidates per source locally, so the final
    reduce sees ≤ k·num_batches tiny rows; no shuffle of the corpus and the
    selection is a pure function of ids (parallelism- and resume-invariant)."""

    def local_k(b: pa.Table) -> pa.Table:
        df = b.select(["doc_id", "source", "n_chars"]).to_pandas()
        ids = df["doc_id"].to_numpy().astype(np.uint64)
        df["h"] = ((ids * np.uint64(2654435761)) % np.uint64(1 << 32)).astype(np.int64)
        df = df.sort_values(["source", "h", "doc_id"], kind="stable")
        return pa.Table.from_pandas(
            df.groupby("source", sort=False).head(k), preserve_index=False
        )

    cand = (
        _documents(sf_dir, columns=["doc_id", "source", "n_chars"])
        .map_batches(local_k, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["source", "h", "doc_id"], kind="stable")
    )
    out = cand.groupby("source", sort=False).head(k)[["source", "doc_id", "n_chars"]]
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def join_copartitioned_orders_lineitem(sf_dir: str, num_buckets: int = 64) -> pa.Table:
    """Large-large equi-join with NO broadcast side: lineitem ⋈ orders on
    orderkey, revenue per order priority.

    Scale shape (co-partitioned hash join): both fact tables are bucketed
    by ``hash(key) % B`` in a cheap ``map_batches`` (only the join key +
    needed columns survive the read), unioned, and exchanged ONCE on the
    bucket; inside each bucket a vectorized pandas merge joins the two
    sides and pre-aggregates, so only B×|priorities| partial rows reach the
    driver. Neither input is ever collected or broadcast — this is the
    join shape for two tables that are BOTH too big for ``ray.put``
    (contrast ``join_broadcast_segments``, J1-shape)."""

    def prep_orders(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy()
        bk = ((k.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)) % num_buckets
        return pa.table(
            {
                "bucket": pa.array(bk.astype(np.int64), pa.int64()),
                "key": b["o_orderkey"],
                "side": pa.array(np.zeros(len(k), dtype=np.int8), pa.int8()),
                "priority": b["o_orderpriority"],
                "price": pa.nulls(len(k), pa.float64()),
                "n": pa.array(np.zeros(len(k), np.int64), pa.int64()),
            }
        )

    def prep_lineitem(b: pa.Table) -> pa.Table:
        # per-batch COMBINER: several lineitems of one order collapse to a
        # (count, sum) partial before anything is shuffled — the same
        # pre-exchange reduction the CDC combiner applies
        df = b.to_pandas().groupby("l_orderkey", as_index=False).agg(
            n=("l_extendedprice", "size"), price=("l_extendedprice", "sum")
        )
        k = df["l_orderkey"].to_numpy()
        bk = ((k.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)) % num_buckets
        return pa.table(
            {
                "bucket": pa.array(bk.astype(np.int64), pa.int64()),
                "key": pa.array(k, pa.int64()),
                "side": pa.array(np.ones(len(k), dtype=np.int8), pa.int8()),
                "priority": pa.nulls(len(k), pa.string()),
                "price": pa.array(df["price"].to_numpy(), pa.float64()),
                "n": pa.array(df["n"].to_numpy(), pa.int64()),
            }
        )

    orders = _read_sized(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority"],
    ).map_batches(prep_orders, batch_format="pyarrow")
    items = _read_sized(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice"],
    ).map_batches(prep_lineitem, batch_format="pyarrow")

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0][["key", "priority"]]
        l = g[g["side"] == 1][["key", "price", "n"]]
        j = l.merge(o, on="key", how="inner")
        return j.groupby("priority", as_index=False).agg(
            n_items=("n", "sum"), revenue=("price", "sum")
        )

    partials = (
        orders.union(items)
        .groupby("bucket")
        .map_groups(join_bucket, batch_format="pandas")
        .to_pandas()
    )
    out = partials.groupby("priority", as_index=False).agg(
        n_items=("n_items", "sum"), revenue=("revenue", "sum")
    )
    out = out.rename(columns={"priority": "o_orderpriority"})
    out["revenue"] = np.round(out["revenue"], 4)
    out["n_items"] = out["n_items"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


# ------------------------------------------------------- round-2 widening

def text_normalize(sf_dir: str) -> pa.Table:
    """Text normalization for training corpora: NFC unicode normalization →
    lowercase → whitespace collapse → trim, all pyarrow.compute kernels
    (zero Python strings). Oracle: DuckDB nfc_normalize/lower/regexp."""

    def norm(b: pa.Table) -> pa.Table:
        t = pc.utf8_normalize(b["text"].cast(pa.string()), form="NFC")
        t = pc.utf8_lower(t)
        t = pc.replace_substring_regex(t, pattern=r"\s+", replacement=" ")
        t = pc.utf8_trim_whitespace(t)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "text_norm": t,
                "n_chars_norm": pc.utf8_length(t).cast(pa.int64()),
            }
        )

    out = (
        _documents(sf_dir, columns=["doc_id", "text"])
        .map_batches(norm, batch_format="pyarrow")
        .to_pandas()
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def unpivot_daily_counts(sf_dir: str) -> pa.Table:
    """Unpivot/melt: the wide daily-counts table back to long (day,
    event_type, n) INCLUDING zero cells — melt runs as a map_batches stage
    over the wide dataset (each wide row melts independently)."""
    wide = pivot_daily_event_counts(sf_dir)
    type_cols = [c for c in wide.column_names if c != "day"]

    def melt(b: pa.Table) -> pa.Table:
        n = b.num_rows
        days = b["day"].to_numpy(zero_copy_only=False)
        out_day = np.repeat(days, len(type_cols))
        out_type = np.tile(np.array([c[2:] for c in type_cols], object), n)
        counts = np.stack(
            [b[c].to_numpy() for c in type_cols], axis=1
        ).reshape(-1)
        return pa.table(
            {
                "day": pa.array(out_day, pa.string()),
                "event_type": pa.array(out_type, pa.string()),
                "n": pa.array(counts, pa.int64()),
            }
        )

    out = (
        ray.data.from_arrow(wide)
        .map_batches(melt, batch_format="pyarrow")
        .to_pandas()
    )
    return pa.Table.from_pandas(
        out.sort_values(["day", "event_type"]).reset_index(drop=True),
        preserve_index=False,
    )


def left_join_customer_orders(sf_dir: str) -> pa.Table:
    """Large-large co-partitioned LEFT OUTER join: every customer row keeps
    its orders aggregate (0 for order-less customers). Orders pre-aggregate
    per batch (combiner), both sides hash into the same bucket space, ONE
    exchange, vectorized in-bucket left merge."""
    mix = np.uint64(0x9E3779B97F4A7C15)

    def prep_orders(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        g = df.groupby("o_custkey", as_index=False).agg(
            n_orders=("o_totalprice", "size"), spend=("o_totalprice", "sum")
        )
        key = g["o_custkey"].to_numpy()
        return pa.table(
            {
                "key": pa.array(key, pa.int64()),
                "seg": pa.nulls(len(g), pa.string()),
                "n_orders": pa.array(g["n_orders"].to_numpy(), pa.int64()),
                "spend": pa.array(g["spend"].to_numpy(), pa.float64()),
                "side": pa.array(np.ones(len(g), np.int8)),
                "bucket": pa.array(
                    ((key.astype(np.int64).view(np.uint64) * mix) % np.uint64(64)).astype(np.int64)
                ),
            }
        )

    def prep_cust(b: pa.Table) -> pa.Table:
        key = b["c_custkey"].to_numpy()
        return pa.table(
            {
                "key": pa.array(key, pa.int64()),
                "seg": b["c_mktsegment"].cast(pa.string()),
                "n_orders": pa.nulls(b.num_rows, pa.int64()),
                "spend": pa.nulls(b.num_rows, pa.float64()),
                "side": pa.array(np.zeros(b.num_rows, np.int8)),
                "bucket": pa.array(
                    ((key.astype(np.int64).view(np.uint64) * mix) % np.uint64(64)).astype(np.int64)
                ),
            }
        )

    cust = _read_sized(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    ).map_batches(prep_cust, batch_format="pyarrow")
    orders = _read_sized(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_totalprice"],
    ).map_batches(prep_orders, batch_format="pyarrow")

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        c = g[g["side"] == 0][["key", "seg"]]
        o = g[g["side"] == 1]
        if len(o):
            o = o.groupby("key", as_index=False).agg(
                n_orders=("n_orders", "sum"), spend=("spend", "sum")
            )
            j = c.merge(o, on="key", how="left")
        else:
            j = c.assign(n_orders=np.nan, spend=np.nan)
        j["n_orders"] = j["n_orders"].fillna(0).astype(np.int64)
        j["spend"] = j["spend"].fillna(0.0)
        return j

    out = (
        cust.union(orders)
        .groupby("bucket")
        .map_groups(join_bucket, batch_format="pandas")
        .to_pandas()
    )
    out = out.rename(columns={"key": "c_custkey", "seg": "c_mktsegment"})
    out["spend"] = np.round(out["spend"], 4)
    return pa.Table.from_pandas(
        out.sort_values("c_custkey").reset_index(drop=True), preserve_index=False
    )


def quality_percentile_filter(sf_dir: str, q: float = 0.25) -> pa.Table:
    """Percentile-based quality filtering (two-pass broadcast-stats shape):
    pass 1 computes each source's exact q-quantile of the quality score
    (small per-source result); pass 2 streams the corpus keeping docs at or
    above their source's cutoff. Returns per-source kept counts + mean
    kept quality."""
    from data_exchange_routing_ray.functions.text import add_quality_score

    scored = _documents(sf_dir, columns=["doc_id", "source", "text"]).map_batches(
        lambda b: add_quality_score(b).select(["doc_id", "source", "quality"]),
        batch_format="pyarrow",
    )

    def src_quantile(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            [{
                "source": g["source"].iloc[0],
                "cut": float(np.quantile(g["quality"].to_numpy(), q)),
            }]
        )

    cuts = (
        scored.groupby("source")
        .map_groups(src_quantile, batch_format="pandas")
        .to_pandas()
    )
    cut_of = dict(zip(cuts["source"], cuts["cut"]))  # tiny dim: broadcast

    def keep(b: pa.Table) -> pa.Table:
        src = b["source"].to_numpy(zero_copy_only=False)
        cut_arr = pd.Series(src).map(cut_of).to_numpy()
        mask = b["quality"].to_numpy() >= cut_arr
        return b.filter(pa.array(mask))

    out = (
        scored.map_batches(keep, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Count(alias_name="n_kept"), Sum("quality", alias_name="sum_q")
        )
        .to_pandas()
    )
    out["avg_quality"] = np.round(out["sum_q"] / out["n_kept"], 6)
    out["n_kept"] = out["n_kept"].astype("int64")
    return pa.Table.from_pandas(
        out[["source", "n_kept", "avg_quality"]], preserve_index=False
    )


def dedup_cluster_components(sf_dir: str) -> pa.Table:
    """Near-dup CLUSTERING end-to-end: exact-dup edges (CHAINS of adjacent
    ids within each content group — deliberately the worst shape for naive
    propagation) → distributed connected components (pointer-jumping
    min-label, functions/graph.py) → every doc labeled with its component's
    min doc_id. Oracle: min(doc_id) OVER (PARTITION BY text)."""
    from data_exchange_routing_ray.functions.dedup import (
        _mix_to_bucket,
        add_content_hash,
    )
    from data_exchange_routing_ray.functions.graph import (
        _labels_lookup,
        connected_components,
    )

    docs = _read_sized(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    def tag(b: pa.Table) -> pa.Table:
        b2 = add_content_hash(b, "text")
        h = b2["content_hash"].to_numpy()
        t = pa.table({"doc_id": b["doc_id"].cast(pa.int64()),
                      "content_hash": b2["content_hash"]})
        return t.append_column(
            "bucket", pa.array(_mix_to_bucket([h], 256), pa.int64())
        )

    def chain_edges(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["content_hash", "doc_id"], kind="stable")
        h = g["content_hash"].to_numpy()
        d = g["doc_id"].to_numpy()
        same = h[1:] == h[:-1]
        return pd.DataFrame({"id_a": d[:-1][same], "id_b": d[1:][same]})

    edges = (
        docs.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(chain_edges, batch_format="pandas")
    )
    labels = connected_components(edges).materialize()
    refs = labels.to_arrow_refs()

    def assign(b: pa.Table) -> pa.Table:
        ids, lab = _labels_lookup(refs)
        d = b["doc_id"].to_numpy().astype(np.int64)
        comp = d.copy()
        if len(ids):
            pos = np.searchsorted(ids, d)
            pos_c = np.minimum(pos, len(ids) - 1)
            hit = ids[pos_c] == d
            comp[hit] = lab[pos_c[hit]]
        return pa.table(
            {"doc_id": pa.array(d, pa.int64()), "component": pa.array(comp, pa.int64())}
        )

    out = docs.map_batches(assign, batch_format="pyarrow").to_pandas()
    return pa.Table.from_pandas(
        out.sort_values("doc_id").reset_index(drop=True), preserve_index=False
    )


def text_decontaminate(sf_dir: str) -> pa.Table:
    """Benchmark decontamination: docs sharing an exact 40-char snippet with
    the (small, broadcast) benchmark set are flagged; per-source totals.
    The benchmark side is a config-size dimension (broadcast, never a
    shuffle); the corpus streams through vectorized substring matches. At
    real scale the snippet set becomes hashed n-gram membership — same
    shape, bucketed membership instead of per-snippet scans."""
    # snippet set: chars 11..50 of every doc_id % 97 == 0 doc (the
    # "benchmark"); tiny by construction, gathered like any config dim
    snip_tab = (
        _documents(sf_dir, columns=["doc_id", "text"])
        .map_batches(
            lambda b: b.filter(pa.array((b["doc_id"].to_numpy() % 97) == 0)),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    snippets = sorted(
        {t[10:50] for t in snip_tab["text"] if t and len(t) > 10}
    )

    def flag(b: pa.Table) -> pa.Table:
        contaminated = np.zeros(b.num_rows, dtype=bool)
        for s in snippets:
            contaminated |= pc.match_substring(b["text"], s).to_numpy(
                zero_copy_only=False
            )
        return pa.table(
            {
                "source": b["source"],
                "one": pa.array(np.ones(b.num_rows, np.int64)),
                "contaminated": pa.array(contaminated.astype(np.int64)),
            }
        )

    out = (
        _documents(sf_dir, columns=["doc_id", "source", "text"])
        .map_batches(flag, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("one", alias_name="n_docs"),
            Sum("contaminated", alias_name="n_contaminated"),
        )
        .to_pandas()
        .astype({"n_docs": "int64", "n_contaminated": "int64"})
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def text_heavy_hitters(sf_dir: str, phi: float = 0.002) -> pa.Table:
    """Frequent-word (heavy-hitter) detection with EXACT output in two
    bounded passes — the streaming-sketch shape with a deterministic
    result. Pass 1 streams the corpus once emitting each batch's
    pigeonhole survivors (words with batch count > φ·batch_words: any
    globally φ-heavy word must be batch-heavy in ≥1 batch, and ≤1/φ can
    survive per batch, so candidate memory is bounded) plus the batch word
    total. Pass 2 exactly recounts ONLY the (broadcast, config-size)
    candidate set and filters by the true global threshold. Output is
    exact ⇒ oracle is a plain GROUP BY ... HAVING."""

    def batch_words(b: pa.Table) -> pd.Series:
        words = pc.list_flatten(
            pc.split_pattern_regex(
                pc.utf8_lower(b["text"]), pattern=r"[^\p{L}\p{N}]+"
            )
        )
        s = pd.Series(words.to_numpy(zero_copy_only=False))
        return s[s != ""]

    def candidates(b: pa.Table) -> pa.Table:
        s = batch_words(b)
        vc = s.value_counts()
        surv = vc[vc > phi * len(s)]
        return pa.table(
            {
                "word": pa.array(
                    list(surv.index) + [""], pa.string()
                ),  # "" row carries the batch word total
                "batch_total": pa.array(
                    [0] * len(surv) + [len(s)], pa.int64()
                ),
            }
        )

    c = (
        _documents(sf_dir, columns=["text"])
        .map_batches(candidates, batch_format="pyarrow")
        .to_pandas()
    )
    total_words = int(c["batch_total"].sum())
    cand = set(c.loc[c["word"] != "", "word"])
    threshold = phi * total_words

    def recount(b: pa.Table) -> pa.Table:
        s = batch_words(b)
        s = s[s.isin(cand)]
        vc = s.value_counts()
        words = vc.index.to_numpy(dtype=object)
        t = pa.table(
            {
                "word": pa.array(words, pa.string()),
                "n": pa.array(vc.to_numpy(), pa.int64()),
            }
        )
        return t.append_column(
            "bucket",
            pa.array(
                (pd.util.hash_array(words) % 64).astype("int64"), pa.int64()
            ),
        )

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("word", as_index=False).agg(n=("n", "sum"))

    counts = (
        _documents(sf_dir, columns=["text"])
        .map_batches(recount, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
        .to_pandas()
    )
    out = counts[counts["n"] > threshold].copy()
    out["n"] = out["n"].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values("word").reset_index(drop=True), preserve_index=False
    )


def jsonl_source_roundtrip(sf_dir: str) -> pa.Table:
    """JSON-lines source/sink roundtrip (the other delimited-text format a
    training pipeline ingests): events → write_json → read_json → grouped
    rollup. Values are scaled to integer ticks before the text roundtrip so
    float formatting cannot drift (same contract as the CSV roundtrip)."""

    def to_json_cols(b: pa.Table) -> pa.Table:
        v = np.floor(b["value"].to_numpy() * 10000.0).astype(np.int64)
        return pa.table(
            {
                "event_id": b["event_id"],
                "event_type": b["event_type"],
                "value_t": pa.array(v, pa.int64()),
            }
        )

    with tempfile.TemporaryDirectory(prefix="jsonrt-") as d:
        _events(sf_dir, columns=["event_id", "event_type", "value"]).map_batches(
            to_json_cols, batch_format="pyarrow"
        ).write_json(d)
        back = ray.data.read_json(d)
        out = (
            back.groupby("event_type")
            .aggregate(Count(alias_name="n"), Sum("value_t", alias_name="sum_ticks"))
            .to_pandas()
        )
    out["n"] = out["n"].astype("int64")
    out["sum_ticks"] = out["sum_ticks"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def emb_kmeans_clusters(sf_dir: str, k: int = 8, iters: int = 5) -> pa.Table:
    """Distributed k-means over the embedding corpus (full-corpus Lloyd
    rounds, centroids broadcast per round — the iterative model-fitting
    shape). Deterministic (seeded init); rows-only driver gate, cluster
    recovery pinned in pytest on planted clusters."""
    from data_exchange_routing_ray.functions.similarity import (
        distributed_kmeans,
        kmeans_cluster_stats,
    )

    ds = _embeddings(sf_dir)
    C = distributed_kmeans(ds, k=k, iters=iters)
    out = kmeans_cluster_stats(_embeddings(sf_dir), C)
    # in-query invariant: every vector assigned to exactly one cluster
    n_total = _embeddings(sf_dir).count()
    if int(out["n_vecs"].sum()) != n_total:
        raise AssertionError(
            f"kmeans assignment lost rows: {int(out['n_vecs'].sum())} != {n_total}"
        )
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def approx_quantiles_value(sf_dir: str) -> pa.Table:
    """Mergeable-summary approximate quantiles of events.value with an
    IN-QUERY error gate: the approximation must sit within the exact
    p±1% value band (exact computed by the same distributed machinery the
    exact-quantiles query uses)."""
    from data_exchange_routing_ray.functions.sketch import approx_quantiles

    qs = [0.5, 0.9, 0.99]
    approx = approx_quantiles(
        _events(sf_dir, columns=["value"]), "value", qs
    )
    # in-query gate: exact quantiles via one grouped pass (single group)
    def allv(g: pd.DataFrame) -> pd.DataFrame:
        v = g["value"].to_numpy()
        p = np.quantile(v, qs)
        return pd.DataFrame([{"p50": p[0], "p90": p[1], "p99": p[2]}])

    exact = (
        _events(sf_dir, columns=["value"])
        .map_batches(
            lambda b: b.append_column("g", pa.array(np.zeros(b.num_rows, np.int64))),
            batch_format="pyarrow",
        )
        .groupby("g")
        .map_groups(allv, batch_format="pandas")
        .to_pandas()
        .iloc[0]
    )
    spread = float(exact["p99"] - exact["p50"]) or 1.0
    for a, e in zip(approx, [exact["p50"], exact["p90"], exact["p99"]]):
        if abs(a - float(e)) > 0.05 * spread:
            raise AssertionError(
                f"approx quantile {a} deviates from exact {e} beyond 5% of spread"
            )
    return pa.table(
        {
            "q": pa.array(qs, pa.float64()),
            "value_approx": pa.array(np.round(approx, 4), pa.float64()),
        }
    )


# ------------------------------------------------ round-2 widening, batch 2

def cdc_turn_gaps(sf_dir: str) -> pa.Table:
    """Per-conversation inter-turn latency over the LWW final state — the
    LAG-window shape (reference emits per-upload latency telemetry the same
    way, fns-routing ProcessingStatus counters). Scale shape: a per-batch
    local LWW combiner, ONE coarse conv-hash bucket shuffle, then the
    whole window computation (LWW + sort + masked diff) vectorized inside
    the bucket frame. Gaps are integer microseconds so the oracle compare
    is exact."""
    from data_exchange_routing_ray.hashing import stable_hash_strings

    def partial(b: pa.Table) -> pa.Table:
        df = pa.table(
            {
                "conv_id": b["conv_id"],
                "turn_idx": b["turn_idx"].cast(pa.int64()),
                "seq": b["seq"],
                "op": b["op"],
                "ts": b["ts"],
            }
        ).to_pandas()
        # local LWW per (conv,turn): cuts shuffle volume before the exchange
        df = df.sort_values("seq", kind="stable").drop_duplicates(
            ["conv_id", "turn_idx"], keep="last"
        )
        df["_bucket"] = (
            stable_hash_strings(df["conv_id"].to_numpy()) % np.uint64(64)
        ).astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("seq", kind="stable").drop_duplicates(
            ["conv_id", "turn_idx"], keep="last"
        )
        g = g[g["op"] != "delete"]
        if g.empty:
            return pd.DataFrame(
                {"conv_id": [], "n_turns": [], "sum_gap_us": [], "max_gap_us": []}
            )
        g = g.sort_values(["conv_id", "turn_idx"], kind="stable")
        conv = g["conv_id"].to_numpy()
        tsu = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        same = np.r_[False, conv[1:] == conv[:-1]]
        gap = np.r_[np.int64(0), np.diff(tsu)]
        gap_sum = np.where(same, gap, 0)
        gap_max = np.where(same, gap, np.iinfo(np.int64).min)
        agg = pd.DataFrame(
            {"conv_id": conv, "one": np.int64(1), "gs": gap_sum, "gm": gap_max}
        ).groupby("conv_id", as_index=False, sort=False).agg(
            n_turns=("one", "sum"),
            sum_gap_us=("gs", "sum"),
            max_gap_us=("gm", "max"),
        )
        agg.loc[agg["max_gap_us"] == np.iinfo(np.int64).min, "max_gap_us"] = 0
        return agg

    out = (
        derived_change_stream(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
        .to_pandas()
    )
    for c in ("n_turns", "sum_gap_us", "max_gap_us"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def chunk_documents(sf_dir: str, size: int = 512, stride: int = 384) -> pa.Table:
    """Overlapping fixed-window document chunking (training-corpus prep:
    long docs → model-context-sized pieces, stride < size for overlap).
    1→N row expansion fully inside map_batches: chunk counts and offsets
    are vectorized, the only per-row work is C-speed string slicing."""

    def chunks(b: pa.Table) -> pa.Table:
        lens = pc.utf8_length(b["text"]).to_numpy().astype(np.int64)
        n = (np.maximum(lens, 1) - 1) // stride + 1
        ids = np.repeat(b["doc_id"].to_numpy(zero_copy_only=False), n)
        # chunk_idx = 0..n_i-1 for every doc, concatenated (vectorized ragged arange)
        total = int(n.sum())
        idx = np.arange(total) - np.repeat(np.cumsum(n) - n, n)
        starts = idx * stride
        texts = np.repeat(np.asarray(b["text"].to_pylist(), dtype=object), n)
        chunk = [t[s : s + size] for t, s in zip(texts, starts)]
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "chunk_idx": pa.array(idx, pa.int64()),
                "chunk": pa.array(chunk, pa.string()),
            }
        )

    out = (
        _documents(sf_dir, columns=["doc_id", "text"])
        .map_batches(chunks, batch_format="pyarrow")
        .to_pandas()
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def text_regex_extract(sf_dir: str) -> pa.Table:
    """Per-document regex extraction counts (PII/entity-scan shape, the
    vectorized analog of the reference's redactor scrub pass) — RE2
    kernels via pyarrow.compute, zero Python in the row path."""
    kw = r"\b(batch|merge|join)\b"
    longw = r"\b[a-z]{6,}\b"

    def counts(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_kw": pc.count_substring_regex(b["text"], kw).cast(pa.int64()),
                "n_long": pc.count_substring_regex(b["text"], longw).cast(pa.int64()),
            }
        )

    out = (
        _documents(sf_dir, columns=["doc_id", "text"])
        .map_batches(counts, batch_format="pyarrow")
        .to_pandas()
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def agg_cube_events(sf_dir: str) -> pa.Table:
    """CUBE(event_type, iso-dow) counts+sums — all four grouping sets from
    ONE pass: per-batch partials at the finest grain (the only shuffle-free
    exchange), then the tiny partial table is re-aggregated driver-side into
    the coarser sets (sums/counts are re-aggregable, so no second scan).
    Values are integer ticks so the cube compare is exact."""

    def partial(b: pa.Table) -> pa.Table:
        ts = b["ts"].to_numpy().astype("datetime64[us]")
        dow = (pd.DatetimeIndex(ts).dayofweek + 1).astype(np.int64)  # ISO 1..7
        ticks = np.floor(b["value"].to_numpy() * 10000.0).astype(np.int64)
        df = pd.DataFrame(
            {
                "event_type": b["event_type"].to_numpy(zero_copy_only=False),
                "dow": dow.astype(str),
                "n": np.int64(1),
                "sum_ticks": ticks,
            }
        )
        g = df.groupby(["event_type", "dow"], as_index=False, sort=False).agg(
            n=("n", "sum"), sum_ticks=("sum_ticks", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    fine = (
        _events(sf_dir, columns=["event_type", "ts", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    fine = fine.groupby(["event_type", "dow"], as_index=False).agg(
        n=("n", "sum"), sum_ticks=("sum_ticks", "sum")
    )
    sets = [fine]
    by_et = fine.groupby("event_type", as_index=False).agg(
        n=("n", "sum"), sum_ticks=("sum_ticks", "sum")
    )
    by_et["dow"] = "ALL"
    by_dow = fine.groupby("dow", as_index=False).agg(
        n=("n", "sum"), sum_ticks=("sum_ticks", "sum")
    )
    by_dow["event_type"] = "ALL"
    total = pd.DataFrame(
        {
            "event_type": ["ALL"],
            "dow": ["ALL"],
            "n": [fine["n"].sum()],
            "sum_ticks": [fine["sum_ticks"].sum()],
        }
    )
    out = pd.concat(sets + [by_et, by_dow, total], ignore_index=True)[
        ["event_type", "dow", "n", "sum_ticks"]
    ]
    out["n"] = out["n"].astype("int64")
    out["sum_ticks"] = out["sum_ticks"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def bloom_semi_join_lineitem(sf_dir: str) -> pa.Table:
    """Bloom-prefiltered semi join (lineitem ⋉ urgent orders): the probe
    side is first cut down by a broadcast Bloom filter built from per-batch
    bitset partials (fixed 1 MiB regardless of key count — THIS is what
    ships to every worker at 100 TB, not the key set), then survivors are
    verified EXACTLY by a co-partitioned bucket semi join (false positives
    die in-bucket; false negatives are impossible by construction). Final
    aggregate is pre-reduced per bucket."""
    m_bits = 1 << 23  # 1 MiB bitset
    mask = np.uint64(m_bits - 1)

    def _h(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        k = keys.astype(np.uint64)
        h1 = (k * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)
        h2 = (k * np.uint64(0xC2B2AE3D27D4EB4F)) >> np.uint64(17)
        return (h1 & mask).astype(np.int64), (h2 & mask).astype(np.int64)

    urgent = _read_sized(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority"],
    ).map_batches(
        lambda b: b.filter(pc.equal(b["o_orderpriority"], "1-URGENT")).select(
            ["o_orderkey"]
        ),
        batch_format="pyarrow",
    )

    def bloom_partial(b: pa.Table) -> pa.Table:
        bits = np.zeros(m_bits >> 3, dtype=np.uint8)
        h1, h2 = _h(b["o_orderkey"].to_numpy())
        for h in (h1, h2):
            np.bitwise_or.at(bits, h >> 3, np.uint8(1) << (h & 7).astype(np.uint8))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    partials = urgent.map_batches(bloom_partial, batch_format="pyarrow").to_pandas()
    bits = np.zeros(m_bits >> 3, dtype=np.uint8)
    for raw in partials["bits"]:
        bits |= np.frombuffer(raw, dtype=np.uint8)
    bits_ref = ray.put(bits)

    def probe(b: pa.Table) -> pa.Table:
        bs = ray.get(bits_ref)
        keys = b["l_orderkey"].to_numpy()
        h1, h2 = _h(keys)
        hit = (
            (bs[h1 >> 3] >> (h1 & 7).astype(np.uint8)) & 1
        ) & ((bs[h2 >> 3] >> (h2 & 7).astype(np.uint8)) & 1)
        t = b.filter(pa.array(hit.astype(bool)))
        ticks = np.floor(t["l_quantity"].to_numpy() * 100.0).astype(np.int64)
        k = t["l_orderkey"].to_numpy()
        bucket = ((k.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(128)).astype(np.int64)
        return pa.table(
            {
                "k": t["l_orderkey"],
                "l_returnflag": t["l_returnflag"],
                "qty_ticks": pa.array(ticks, pa.int64()),
                "side": pa.array(np.ones(t.num_rows, np.int64)),
                "bucket": pa.array(bucket, pa.int64()),
            }
        )

    def key_rows(b: pa.Table) -> pa.Table:
        k = b["o_orderkey"].to_numpy()
        bucket = ((k.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(128)).astype(np.int64)
        n = b.num_rows
        return pa.table(
            {
                "k": b["o_orderkey"],
                "l_returnflag": pa.array([""] * n, pa.string()),
                "qty_ticks": pa.array(np.zeros(n, np.int64)),
                "side": pa.array(np.zeros(n, np.int64)),
                "bucket": pa.array(bucket, pa.int64()),
            }
        )

    probe_ds = _read_sized(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_returnflag", "l_quantity"],
    ).map_batches(probe, batch_format="pyarrow")
    keys_ds = urgent.map_batches(key_rows, batch_format="pyarrow")

    def semi_bucket(g: pd.DataFrame) -> pd.DataFrame:
        true_keys = g.loc[g["side"] == 0, "k"].to_numpy()
        probe_rows = g[g["side"] == 1]
        ok = probe_rows[np.isin(probe_rows["k"].to_numpy(), true_keys)]
        if ok.empty:
            return pd.DataFrame({"l_returnflag": [], "n": [], "sum_qty_ticks": []})
        return ok.groupby("l_returnflag", as_index=False).agg(
            n=("k", "size"), sum_qty_ticks=("qty_ticks", "sum")
        )

    part = (
        probe_ds.union(keys_ds)
        .groupby("bucket")
        .map_groups(semi_bucket, batch_format="pandas")
        .to_pandas()
    )
    out = part.groupby("l_returnflag", as_index=False).agg(
        n=("n", "sum"), sum_qty_ticks=("sum_qty_ticks", "sum")
    )
    out["n"] = out["n"].astype("int64")
    out["sum_qty_ticks"] = out["sum_qty_ticks"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def lake_snapshot_diff(sf_dir: str) -> pa.Table:
    """Binlog-style snapshot diff between two committed lake epochs via
    time travel — what a downstream consumer would read as "the change set
    of epoch 1". Both snapshots share the SAME partitioner, so the diff is
    partition-aligned: one task per partition loads base(+deltas) of each
    epoch and compares vectorized — ZERO shuffle, no driver materialization.
    Reference parity: manifest archive reads, state/manifest.py:94."""
    import pyarrow.parquet as pq

    from data_exchange_routing_ray.pipelines.cdc import CDCLake
    from data_exchange_routing_ray.stages.upsert import fold_deltas

    stream = derived_change_stream(sf_dir)
    hi = int(_events(sf_dir, columns=["event_id"]).max("event_id")) + 1
    mid = hi // 2
    with tempfile.TemporaryDirectory(prefix="cdclake-") as d:
        lake = CDCLake(os.path.join(d, "lake"), num_partitions=16)
        lake.apply_changes(stream.filter(expr=f"seq < {mid}"), quarantine=False)
        lake.apply_changes(stream.filter(expr=f"seq >= {mid}"), quarantine=False)
        man_a, man_b = lake.manifest_at(0), lake.manifest_at(1)
        lake_dir = lake.lake_dir
        pids = sorted(set(man_a.partitions) | set(man_b.partitions))
        items = []
        for pid in pids:
            ea, eb = man_a.partitions.get(pid), man_b.partitions.get(pid)
            items.append(
                {
                    "a_file": ea.file if ea else "",
                    "a_deltas": [dd["file"] for dd in ea.deltas] if ea else [],
                    "b_file": eb.file if eb else "",
                    "b_deltas": [dd["file"] for dd in eb.deltas] if eb else [],
                }
            )

        def load(rel: str, drels: list) -> pd.DataFrame:
            cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
            if not rel:
                return pd.DataFrame(columns=cols)
            t = pq.read_table(os.path.join(lake_dir, rel))
            if drels:
                t = fold_deltas(
                    t, [pq.read_table(os.path.join(lake_dir, r)) for r in drels]
                )
            df = t.select(cols).to_pandas()
            df["turn_idx"] = df["turn_idx"].astype("int64")
            return df

        NUL = "\x00<null>"

        def diff_partition(batch: pa.Table) -> pa.Table:
            outs = []
            for i in range(batch.num_rows):
                a = load(batch["a_file"][i].as_py(), batch["a_deltas"][i].as_py() or [])
                b = load(batch["b_file"][i].as_py(), batch["b_deltas"][i].as_py() or [])
                m = a.merge(
                    b,
                    on=["conv_id", "turn_idx"],
                    how="outer",
                    suffixes=("_a", "_b"),
                    indicator=True,
                )
                added = (m["_merge"] == "right_only").to_numpy()
                deleted = (m["_merge"] == "left_only").to_numpy()
                diff = np.zeros(len(m), dtype=bool)
                for c in ("role", "text", "tool"):
                    xa = m[f"{c}_a"].fillna(NUL).to_numpy()
                    xb = m[f"{c}_b"].fillna(NUL).to_numpy()
                    diff |= xa != xb
                ta = m["ts_a"].to_numpy().astype("datetime64[us]").astype(np.int64)
                tb = m["ts_b"].to_numpy().astype("datetime64[us]").astype(np.int64)
                diff |= ta != tb
                changed = (m["_merge"] == "both").to_numpy() & diff
                kind = np.where(
                    added, "added", np.where(deleted, "deleted", "changed")
                ).astype(object)
                keep = added | deleted | changed
                outs.append(
                    pa.table(
                        {
                            "conv_id": pa.array(
                                m["conv_id"].to_numpy()[keep], pa.string()
                            ),
                            "turn_idx": pa.array(
                                m["turn_idx"].to_numpy()[keep].astype(np.int64),
                                pa.int64(),
                            ),
                            "change_kind": pa.array(kind[keep], pa.string()),
                        }
                    )
                )
            return pa.concat_tables(outs)

        out = (
            ray.data.from_items(items)
            .map_batches(diff_partition, batch_size=1, batch_format="pyarrow")
            .to_pandas()
        )
    return pa.Table.from_pandas(out, preserve_index=False)


# ------------------------------------------------ round-2 widening, batch 3

def scd2_turn_history(sf_dir: str) -> pa.Table:
    """Slowly-changing-dimension Type-2 history of every (conv, turn):
    version rows with [valid_from, valid_to) seq intervals and an
    is_current flag — the audit-trail view a downstream warehouse keeps of
    the reference's routed uploads (fns-routing ProcessingEvent history).
    Scale shape: ONE conv-hash bucket shuffle; interval derivation is a
    vectorized shift within the sorted bucket frame (a version's successor
    is always in the same bucket, so no cross-bucket stitching is needed)."""
    from data_exchange_routing_ray.hashing import stable_hash_strings

    def bucketize(b: pa.Table) -> pa.Table:
        h = stable_hash_strings(b["conv_id"].to_numpy(zero_copy_only=False))
        return b.append_column(
            "_bucket", pa.array((h % np.uint64(64)).astype(np.int64))
        )

    def versions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx", "seq"], kind="stable")
        key = g["conv_id"].astype(str) + "\x00" + g["turn_idx"].astype(str)
        same_next = key.to_numpy()[1:] == key.to_numpy()[:-1]
        nxt = np.concatenate([g["seq"].to_numpy()[1:], [np.int64(-1)]])
        nxt[:-1][~same_next] = -1
        if len(nxt):
            nxt[-1] = -1
        live = (g["op"] != "delete").to_numpy()
        out = pd.DataFrame(
            {
                "conv_id": g["conv_id"].to_numpy(),
                "turn_idx": g["turn_idx"].to_numpy().astype(np.int64),
                "role": g["role"].to_numpy(),
                "text": g["text"].to_numpy(),
                "valid_from": g["seq"].to_numpy(),
                "valid_to": nxt,
                "is_current": ((nxt == -1) & live).astype(np.int64),
            }
        )
        return out[live]

    out = (
        derived_change_stream(sf_dir)
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(versions, batch_format="pandas")
        .to_pandas()
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def late_data_split(sf_dir: str, allowed_lag_us: int = 3_600_000_000) -> pa.Table:
    """Watermark lateness classification: running-max EVENT-TIME watermark
    over ARRIVAL order (seq), an event is late when it arrives after the
    watermark has moved more than ``allowed_lag_us`` past its event time —
    the reference's late-upload replay telemetry, expressed as a stream op.
    Event time is the derived ts minus a deterministic (event_id%20)^2-min
    jitter (ts itself is monotone in seq, so the jitter is what creates
    genuine lateness; the same formula lives in the oracle).

    Scale shape: the classic two-pass distributed prefix scan (same as
    ``pack_token_sequences``) — pass 1 collects per-seq-range bucket maxima
    (tiny), the driver prefix-maxes them, pass 2 re-groups per bucket,
    accumulates the in-bucket running max vectorized, ORs in the broadcast
    exclusive prefix, and emits per-event_type partials. Only (seq, etsu,
    event_type) triples ride the shuffle."""
    import ray as _ray

    def derive(b: pa.Table) -> pa.Table:
        ev = b["event_id"].to_numpy()
        tsu = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        jit = (ev % 20).astype(np.int64) ** 2 * 60_000_000
        return pa.table(
            {
                "seq": pa.array(ev, pa.int64()),
                "etsu": pa.array(tsu - jit, pa.int64()),
                "event_type": b["event_type"],
                "bucket": pa.array(ev // 4096, pa.int64()),
            }
        )

    tr = (
        _events(sf_dir, columns=["event_id", "ts", "event_type"])
        .map_batches(derive, batch_format="pyarrow")
        .materialize()
    )
    maxima = (
        tr.groupby("bucket")
        .aggregate(Max("etsu", alias_name="mx"))
        .to_pandas()
        .sort_values("bucket")
    )
    run = np.maximum.accumulate(maxima["mx"].to_numpy())
    excl = np.concatenate([[np.int64(-(1 << 62))], run[:-1]])
    ref = _ray.put(dict(zip(maxima["bucket"], excl)))

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        prior = _ray.get(ref)[int(g["bucket"].iloc[0])]
        g = g.sort_values("seq", kind="stable")
        ets = g["etsu"].to_numpy()
        wm = np.maximum(np.maximum.accumulate(ets), prior)
        late = (wm - ets) > allowed_lag_us
        out = pd.DataFrame({"event_type": g["event_type"], "late": late, "one": 1})
        return out.groupby("event_type", as_index=False).agg(
            n_events=("one", "sum"), n_late=("late", "sum")
        )

    part = tr.groupby("bucket").map_groups(classify, batch_format="pandas").to_pandas()
    out = part.groupby("event_type", as_index=False).agg(
        n_events=("n_events", "sum"), n_late=("n_late", "sum")
    )
    out["n_events"] = out["n_events"].astype("int64")
    out["n_late"] = out["n_late"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def incr_view_roles(sf_dir: str) -> pa.Table:
    """Incremental materialized-view maintenance: a per-role live-turn count
    maintained across two commits by re-aggregating ONLY the partitions the
    second epoch touched (manifest diff), then combining with the first
    epoch's untouched partition aggregates — the lake never rescans clean
    partitions. Epoch B carries exactly the convs of ONE lake partition
    (hash-slice), so at ANY scale precisely 1 of 64 partitions goes dirty —
    the deliberately-skewed "one hot tenant changed" shape (asserted).
    Epochs are conv-disjoint, so epoch B applies unfenced (the global seq
    watermark would otherwise drop its interleaved seqs — same contract as
    bootstrap). Reference parity: incremental ProcessingStatus counter
    maintenance (fns-routing report sink); manifest diff state/manifest.py:94."""
    import pyarrow.parquet as pq

    from data_exchange_routing_ray.hashing import partition_ids
    from data_exchange_routing_ray.pipelines.cdc import CDCLake
    from data_exchange_routing_ray.stages.upsert import fold_deltas

    def slice_stream(want_zero: bool) -> ray.data.Dataset:
        def f(b: pa.Table) -> pa.Table:
            pid = partition_ids(b["conv_id"].combine_chunks(), 64)
            m = (pid == 0) if want_zero else (pid != 0)
            return b.filter(pa.array(m))

        return derived_change_stream(sf_dir).map_batches(f, batch_format="pyarrow")

    with tempfile.TemporaryDirectory(prefix="cdclake-") as d:
        lake = CDCLake(os.path.join(d, "lake"), num_partitions=64)
        lake.apply_changes(slice_stream(False), quarantine=False)
        lake.apply_changes(slice_stream(True), quarantine=False, fence=False)
        man_a, man_b = lake.manifest_at(0), lake.manifest_at(1)
        lake_dir = lake.lake_dir

        def sig(e):
            return (e.file, tuple(dd["file"] for dd in e.deltas)) if e else None

        def items_for(man, pids):
            return [
                {
                    "file": man.partitions[p].file,
                    "deltas": [dd["file"] for dd in man.partitions[p].deltas],
                }
                for p in pids
                if p in man.partitions
            ]

        all_pids = set(man_a.partitions) | set(man_b.partitions)
        dirty = sorted(
            p
            for p in all_pids
            if sig(man_a.partitions.get(p)) != sig(man_b.partitions.get(p))
        )
        clean = sorted(p for p in man_a.partitions if p not in dirty)
        assert clean, "epoch B must leave some partitions untouched"

        def agg_partitions(batch: pa.Table) -> pa.Table:
            outs = []
            for i in range(batch.num_rows):
                t = pq.read_table(
                    os.path.join(lake_dir, batch["file"][i].as_py()),
                    columns=None,
                )
                drels = batch["deltas"][i].as_py() or []
                if drels:
                    t = fold_deltas(
                        t, [pq.read_table(os.path.join(lake_dir, r)) for r in drels]
                    )
                df = (
                    t.select(["role"])
                    .to_pandas()
                    .groupby("role", as_index=False)
                    .size()
                )
                outs.append(pa.Table.from_pandas(df, preserve_index=False))
            return pa.concat_tables(outs)

        def run_agg(items) -> pd.DataFrame:
            if not items:
                return pd.DataFrame({"role": [], "size": []})
            return (
                ray.data.from_items(items)
                .map_batches(agg_partitions, batch_size=4, batch_format="pyarrow")
                .to_pandas()
            )

        base = run_agg(items_for(man_a, clean))       # untouched: epoch-A result reused
        fresh = run_agg(items_for(man_b, dirty))      # touched: re-aggregated only
        out = (
            pd.concat([base, fresh], ignore_index=True)
            .groupby("role", as_index=False)["size"]
            .sum()
            .rename(columns={"size": "n_turns"})
        )
    out["n_turns"] = out["n_turns"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def numeric_comoment_stats(sf_dir: str) -> pa.Table:
    """Exact distributed co-moment partials per event_type — the mergeable
    (n, Σx, Σy, Σxy, Σx², Σy²) sketch behind corr/covariance/regression,
    kept in integer ticks so the result is EXACT and oracle-comparable
    (float corr differs in last-ulp across reduction orders; the integer
    moments do not). x = value ticks, y = hour-of-day. Single pass,
    per-batch partials, one 5-key reduce."""

    def partial(b: pa.Table) -> pa.Table:
        x = np.floor(b["value"].to_numpy() * 10000.0).astype(np.int64)
        ts = b["ts"].to_numpy().astype("datetime64[us]")
        y = pd.DatetimeIndex(ts).hour.to_numpy().astype(np.int64)
        df = pd.DataFrame(
            {
                "event_type": b["event_type"].to_numpy(zero_copy_only=False),
                "n": np.int64(1),
                "sum_x": x,
                "sum_y": y,
                "sum_xy": x * y,
                "sum_xx": x * x,
                "sum_yy": y * y,
            }
        )
        return pa.Table.from_pandas(
            df.groupby("event_type", as_index=False).sum(), preserve_index=False
        )

    out = (
        _events(sf_dir, columns=["event_type", "ts", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("event_type", as_index=False)
        .sum()
    )
    for c in ("n", "sum_x", "sum_y", "sum_xy", "sum_xx", "sum_yy"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def set_ops_users(sf_dir: str) -> pa.Table:
    """EXCEPT / INTERSECT as one streaming pass: classify every user as
    click-only, purchase-only, or both. Per-batch boolean partials
    (has_click, has_purchase per user), ONE user-hash bucket reduce with a
    vectorized OR — the distinct-set shuffles of a naive
    EXCEPT/INTERSECT plan collapse into a single exchange of bit pairs."""

    def partial(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "user_id": b["user_id"].to_numpy(),
                "c": et == "click",
                "p": et == "purchase",
            }
        )
        g = df.groupby("user_id", as_index=False).agg(c=("c", "max"), p=("p", "max"))
        g = g[g["c"] | g["p"]]
        g["bucket"] = (
            g["user_id"].to_numpy().astype(np.uint64) * np.uint64(2654435761)
        ) % np.uint64(64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("user_id", as_index=False).agg(c=("c", "max"), p=("p", "max"))
        kind = np.where(
            m["c"] & m["p"], "both", np.where(m["c"], "click_only", "purchase_only")
        )
        return pd.DataFrame({"user_id": m["user_id"].astype("int64"), "kind": kind})

    out = (
        _events(sf_dir, columns=["user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
        .to_pandas()
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def grouped_rank_topk(sf_dir: str, k: int = 3) -> pa.Table:
    """RANK()-with-ties top-k spenders per event_type. Two bounded stages:
    per-(bucket, type) candidate pruning keeps only rows whose spend is
    among the bucket's top-k DISTINCT spends (any row outside that set has
    ≥k distinct greater values globally, hence rank > k — proof in the
    bucket), then the tiny candidate set gets the exact rank at the driver.
    The full per-(type,user) total table never leaves its bucket."""

    def partial(b: pa.Table) -> pa.Table:
        ticks = np.floor(b["value"].to_numpy() * 10000.0).astype(np.int64)
        df = pd.DataFrame(
            {
                "event_type": b["event_type"].to_numpy(zero_copy_only=False),
                "user_id": b["user_id"].to_numpy(),
                "spend_ticks": ticks,
            }
        )
        g = df.groupby(["event_type", "user_id"], as_index=False).sum()
        g["bucket"] = (
            g["user_id"].to_numpy().astype(np.uint64) * np.uint64(2654435761)
        ) % np.uint64(64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(["event_type", "user_id"], as_index=False)["spend_ticks"].sum()
        keep = []
        for _, grp in m.groupby("event_type", sort=False):
            top = np.sort(grp["spend_ticks"].unique())[::-1][:k]
            keep.append(grp[grp["spend_ticks"].isin(top)])
        return pd.concat(keep, ignore_index=True)[
            ["event_type", "user_id", "spend_ticks"]
        ]

    cand = (
        _events(sf_dir, columns=["event_type", "user_id", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(prune, batch_format="pandas")
        .to_pandas()
    )
    cand = cand.sort_values(
        ["event_type", "spend_ticks"], ascending=[True, False], kind="stable"
    )
    rnk = (
        cand.groupby("event_type")["spend_ticks"]
        .rank(method="min", ascending=False)
        .astype("int64")
    )
    cand["rnk"] = rnk
    out = cand[cand["rnk"] <= k].copy()
    out["user_id"] = out["user_id"].astype("int64")
    out["spend_ticks"] = out["spend_ticks"].astype("int64")
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


# ------------------------------------------------ round-2 widening, batch 4

def inverted_index_postings(sf_dir: str, df_min: int = 2, df_max_frac: float = 0.9) -> pa.Table:
    """Search-index build: term → (df, sorted posting list), keeping the
    mid-frequency band: hapax terms and terms in > ``df_max_frac`` of the
    corpus dropped (the RELATIVE stopword bound that keeps a posting row
    small at corpus scale — an absolute cap goes vacuous as N grows). Per-batch DISTINCT
    (doc, term) pairs (the combiner), ONE term-hash bucket shuffle, posting
    assembly vectorized inside the bucket. Only the integer/term pairs ride
    the exchange; document text never leaves the scan stage."""

    def pairs(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b["text"], pattern=" ")
        flat = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        lens = np.asarray(pc.list_value_length(flat))
        doc = np.repeat(b["doc_id"].to_numpy(), lens)
        term = np.asarray(pc.list_flatten(flat).to_numpy(zero_copy_only=False))
        df = pd.DataFrame({"term": term, "doc_id": doc}).drop_duplicates()
        df["bucket"] = (
            pd.util.hash_array(df["term"].to_numpy(dtype=object)) % 64
        ).astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False)

    n_docs = int(_documents(sf_dir, columns=["doc_id"]).count())
    df_max = int(n_docs * df_max_frac)

    def build(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["term", "doc_id"]).sort_values(
            ["term", "doc_id"], kind="stable"
        )
        agg = g.groupby("term", as_index=False).agg(
            df=("doc_id", "size"),
            postings=("doc_id", lambda s: ",".join(map(str, s))),
        )
        agg = agg[(agg["df"] >= df_min) & (agg["df"] <= df_max)]
        agg["df"] = agg["df"].astype("int64")
        return agg

    out = (
        _documents(sf_dir, columns=["doc_id", "text"])
        .map_batches(pairs, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(build, batch_format="pandas")
        .to_pandas()
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def bigram_counts(sf_dir: str, min_count: int = 10) -> pa.Table:
    """N-gram LM count table (n=2): per-batch vectorized bigram extraction
    (flat token array + doc-boundary mask — no Python loop over rows),
    per-batch value_counts combiner, coarse bigram-hash bucket reduce,
    HAVING-style threshold applied in-bucket. The classic count-based LM
    pipeline stage at corpus scale."""

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b["text"], pattern=" ")
        flat = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        lens = np.asarray(pc.list_value_length(flat))
        words = np.asarray(pc.list_flatten(flat).to_numpy(zero_copy_only=False))
        if len(words) == 0:
            return pa.table(
                {"bigram": pa.array([], pa.string()), "n": pa.array([], pa.int64()),
                 "bucket": pa.array([], pa.int64())}
            )
        # last token of each doc cannot start a bigram
        ends = np.cumsum(lens) - 1
        ok = np.ones(len(words), dtype=bool)
        ok[ends] = False
        left = words[:-1][ok[:-1]]
        right = words[1:][ok[:-1]]
        s = pd.Series(np.char.add(np.char.add(left.astype(str), " "), right.astype(str)))
        vc = s.value_counts()
        out = pd.DataFrame({"bigram": vc.index, "n": vc.to_numpy()})
        out["bucket"] = (
            pd.util.hash_array(out["bigram"].to_numpy(dtype=object)) % 64
        ).astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("bigram", as_index=False).agg(n=("n", "sum"))
        agg = agg[agg["n"] >= min_count]
        agg["n"] = agg["n"].astype("int64")
        return agg

    out = (
        _documents(sf_dir, columns=["text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
        .to_pandas()
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def tool_cooccurrence(sf_dir: str) -> pa.Table:
    """Feature-cross / co-occurrence matrix: for every unordered pair of
    event types, how many users used both. Per-batch distinct pairs, ONE
    user-hash bucket shuffle, in-bucket vectorized self-merge (each user's
    full distinct set is co-located by construction), tiny final reduce —
    the pair space is |types|², never |users|²."""

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": b["user_id"].to_numpy(),
                "tool": b["event_type"].to_numpy(zero_copy_only=False),
            }
        ).drop_duplicates()
        df["bucket"] = (
            df["user_id"].to_numpy().astype(np.uint64) * np.uint64(2654435761)
        ) % np.uint64(64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def cross_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["user_id", "tool"])[["user_id", "tool"]]
        m = d.merge(d, on="user_id", suffixes=("_a", "_b"))
        m = m[m["tool_a"] < m["tool_b"]]
        return m.groupby(["tool_a", "tool_b"], as_index=False).agg(
            n_users=("user_id", "size")
        )

    part = (
        _events(sf_dir, columns=["user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(cross_bucket, batch_format="pandas")
        .to_pandas()
    )
    out = part.groupby(["tool_a", "tool_b"], as_index=False).agg(
        n_users=("n_users", "sum")
    )
    out["n_users"] = out["n_users"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def full_outer_join_users_customers(sf_dir: str) -> pa.Table:
    """Large-large co-partitioned FULL OUTER join across id domains that
    only partially overlap (event users ↔ customers): event-side totals
    pre-aggregated per batch, both sides hashed into one bucket space, ONE
    exchange, vectorized in-bucket outer merge with an indicator column.
    Completes the join matrix (inner/semi/anti/left exist elsewhere)."""
    mix = np.uint64(0x9E3779B97F4A7C15)

    def prep_events(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "key": b["user_id"].to_numpy(),
                "ticks": np.floor(b["value"].to_numpy() * 10000.0).astype(np.int64),
            }
        )
        g = df.groupby("key", as_index=False).agg(
            n_events=("ticks", "size"), sum_ticks=("ticks", "sum")
        )
        key = g["key"].to_numpy()
        return pa.table(
            {
                "key": pa.array(key, pa.int64()),
                "n_events": pa.array(g["n_events"].to_numpy(), pa.int64()),
                "sum_ticks": pa.array(g["sum_ticks"].to_numpy(), pa.int64()),
                "bal_ticks": pa.nulls(len(g), pa.int64()),
                "side": pa.array(np.zeros(len(g), np.int8)),
                "bucket": pa.array(
                    ((key.astype(np.int64).view(np.uint64) * mix) % np.uint64(64)).astype(np.int64)
                ),
            }
        )

    def prep_cust(b: pa.Table) -> pa.Table:
        key = b["c_custkey"].to_numpy()
        bal = np.floor(b["c_acctbal"].to_numpy() * 100.0).astype(np.int64)
        return pa.table(
            {
                "key": pa.array(key, pa.int64()),
                "n_events": pa.nulls(b.num_rows, pa.int64()),
                "sum_ticks": pa.nulls(b.num_rows, pa.int64()),
                "bal_ticks": pa.array(bal, pa.int64()),
                "side": pa.array(np.ones(b.num_rows, np.int8)),
                "bucket": pa.array(
                    ((key.astype(np.int64).view(np.uint64) * mix) % np.uint64(64)).astype(np.int64)
                ),
            }
        )

    ev = _events(sf_dir, columns=["user_id", "value"]).map_batches(
        prep_events, batch_format="pyarrow"
    )
    cust = _read_sized(
os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_acctbal"]
    ).map_batches(prep_cust, batch_format="pyarrow")

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["side"] == 0]
        if len(e):
            e = e.groupby("key", as_index=False).agg(
                n_events=("n_events", "sum"), sum_ticks=("sum_ticks", "sum")
            )
        else:
            e = pd.DataFrame({"key": [], "n_events": [], "sum_ticks": []})
        c = g[g["side"] == 1][["key", "bal_ticks"]]
        m = e.merge(c, on="key", how="outer", indicator=True)
        m["in_events"] = (m["_merge"] != "right_only").astype("int64")
        m["in_customers"] = (m["_merge"] != "left_only").astype("int64")
        for col in ("n_events", "sum_ticks", "bal_ticks"):
            m[col] = m[col].fillna(0).astype("int64")
        m["user_id"] = m["key"].astype("int64")
        return m[
            ["user_id", "n_events", "sum_ticks", "bal_ticks", "in_events", "in_customers"]
        ]

    out = (
        ev.union(cust)
        .groupby("bucket")
        .map_groups(join_bucket, batch_format="pandas")
        .to_pandas()
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def ntile_users_by_spend(sf_dir: str, tiles: int = 4) -> pa.Table:
    """Exact global NTILE via distributed sort-rank: (1) per-user totals by
    one user-hash bucket reduce; (2) range-partition the totals on the
    composite order key (−spend, user) using driver-sampled boundaries —
    boundaries only steer load, NEVER correctness, because the ranges
    partition the total order; (3) tiny per-range counts → driver prefix
    sums → broadcast; (4) in-range vectorized sort gives local index,
    global position = range offset + local index, ntile = the standard
    balanced formula. This is the canonical exact rank/ntile plan at
    cluster scale — no global sort materialization, two bounded shuffles."""
    import ray as _ray

    def totals_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": b["user_id"].to_numpy(),
                "ticks": np.floor(b["value"].to_numpy() * 10000.0).astype(np.int64),
            }
        )
        g = df.groupby("user_id", as_index=False).agg(spend_ticks=("ticks", "sum"))
        g["bucket"] = (
            g["user_id"].to_numpy().astype(np.uint64) * np.uint64(2654435761)
        ) % np.uint64(64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def totals_reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("user_id", as_index=False).agg(
            spend_ticks=("spend_ticks", "sum")
        )

    totals = (
        _events(sf_dir, columns=["user_id", "value"])
        .map_batches(totals_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(totals_reduce, batch_format="pandas")
        .materialize()
    )

    # driver-side SAMPLE → range boundaries on −spend. Rows with EQUAL spend
    # always land in the same range (searchsorted is deterministic on equal
    # keys), so the user-id tiebreak never crosses a range boundary and the
    # ranges partition the (−spend, user) total order exactly.
    n_ranges = 16
    sample = totals.random_sample(0.1, seed=7).limit(4096).to_pandas()
    if len(sample) >= n_ranges:
        keys = np.sort(-sample["spend_ticks"].to_numpy())
        bounds = keys[np.linspace(0, len(keys) - 1, n_ranges + 1).astype(int)][1:-1]
    else:
        bounds = np.array([], dtype=np.int64)
    bref = _ray.put(bounds)

    def assign_range(b: pa.Table) -> pa.Table:
        bs = _ray.get(bref)
        ck = -b["spend_ticks"].to_numpy()
        rng = np.searchsorted(bs, ck, side="left") if len(bs) else np.zeros(
            b.num_rows, np.int64
        )
        return b.append_column("rng", pa.array(rng.astype(np.int64)))

    ranged = totals.map_batches(assign_range, batch_format="pyarrow").materialize()
    counts = (
        ranged.groupby("rng").aggregate(Count(alias_name="cnt")).to_pandas()
        .sort_values("rng")
    )
    total_n = int(counts["cnt"].sum())
    offs = np.concatenate([[0], np.cumsum(counts["cnt"].to_numpy())[:-1]])
    oref = _ray.put(dict(zip(counts["rng"], offs)))

    def rank_range(g: pd.DataFrame) -> pd.DataFrame:
        off = _ray.get(oref)[int(g["rng"].iloc[0])]
        g = g.sort_values(
            ["spend_ticks", "user_id"], ascending=[False, True], kind="stable"
        )
        pos = off + np.arange(len(g))  # 0-based global position
        # balanced NTILE: first (N % tiles) tiles get ceil(N/tiles) rows
        big, rem = divmod(total_n, tiles)
        cutover = (big + 1) * rem
        q = np.where(
            pos < cutover, pos // (big + 1), rem + (pos - cutover) // max(big, 1)
        )
        return pd.DataFrame(
            {
                "user_id": g["user_id"].astype("int64"),
                "spend_ticks": g["spend_ticks"].astype("int64"),
                "q": (q + 1).astype("int64"),
            }
        )

    out = (
        ranged.groupby("rng").map_groups(rank_range, batch_format="pandas").to_pandas()
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def cdc_op_transition_counts(sf_dir: str) -> pa.Table:
    """Changelog grammar check: per-key (prev_op → op) transition counts
    over the change stream — the op-sequence telemetry a CDC pipeline
    watches to detect producer bugs (e.g. update-before-insert). First
    transition of a key counts as 'start' → op. ONE conv-hash bucket
    shuffle; LAG computed as a vectorized shift within the sorted bucket
    frame (a key's whole history co-locates)."""
    from data_exchange_routing_ray.hashing import stable_hash_strings

    def bucketize(b: pa.Table) -> pa.Table:
        h = stable_hash_strings(b["conv_id"].combine_chunks())
        t = pa.table(
            {
                "conv_id": b["conv_id"],
                "turn_idx": b["turn_idx"].cast(pa.int64()),
                "seq": b["seq"],
                "op": b["op"],
            }
        )
        return t.append_column(
            "_bucket", pa.array((h % np.uint64(64)).astype(np.int64))
        )

    def transitions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx", "seq"], kind="stable")
        key = g["conv_id"].astype(str) + "\x00" + g["turn_idx"].astype(str)
        same_prev = np.concatenate([[False], key.to_numpy()[1:] == key.to_numpy()[:-1]])
        prev = np.concatenate([["start"], g["op"].to_numpy()[:-1]]).astype(object)
        prev[~same_prev] = "start"
        out = pd.DataFrame({"prev_op": prev, "op": g["op"], "one": 1})
        return out.groupby(["prev_op", "op"], as_index=False).agg(n=("one", "sum"))

    part = (
        derived_change_stream(sf_dir)
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(transitions, batch_format="pandas")
        .to_pandas()
    )
    out = part.groupby(["prev_op", "op"], as_index=False).agg(n=("n", "sum"))
    out["n"] = out["n"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


# ------------------------------------------------ round-2 widening, batch 5

def paginate_orders(sf_dir: str, limit: int = 20, offset: int = 40) -> pa.Table:
    """Distributed pagination (ORDER BY … LIMIT k OFFSET m): each block
    keeps only its own top-(k+m) candidates (vectorized partial top-k — the
    only rows that can possibly appear on the page), the driver merges the
    tiny candidate union and slices the page. No global sort, no full
    materialization; candidate volume is blocks × (k+m), independent of N."""
    need = limit + offset

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "o_orderkey": b["o_orderkey"].to_numpy(),
                "price_ticks": np.floor(
                    b["o_totalprice"].to_numpy() * 100.0
                ).astype(np.int64),
            }
        )
        df = df.sort_values(
            ["price_ticks", "o_orderkey"], ascending=[False, True], kind="stable"
        ).head(need)
        return pa.Table.from_pandas(df, preserve_index=False)

    cand = (
        _read_sized(
os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_totalprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    page = cand.sort_values(
        ["price_ticks", "o_orderkey"], ascending=[False, True], kind="stable"
    ).iloc[offset : offset + limit]
    page = page.copy()
    page["o_orderkey"] = page["o_orderkey"].astype("int64")
    return pa.Table.from_pandas(page.reset_index(drop=True), preserve_index=False)


def window_running_total(sf_dir: str) -> pa.Table:
    """Per-user running spend total over time (cumulative window) — ONE
    user-hash bucket shuffle, then the cumsum is a vectorized
    groupby-cumsum inside the sorted bucket frame (each user's history
    co-locates). The canonical ROWS UNBOUNDED PRECEDING window at scale."""

    def partial(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy()
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "event_id": b["event_id"],
                "ts": b["ts"],
                "ticks": pa.array(
                    np.floor(b["value"].to_numpy() * 10000.0).astype(np.int64)
                ),
                "bucket": pa.array(
                    ((uid.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(64)).astype(np.int64)
                ),
            }
        )

    def running(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        g["running_ticks"] = g.groupby("user_id")["ticks"].cumsum().astype("int64")
        return g[["user_id", "event_id", "running_ticks"]]

    out = (
        _events(sf_dir, columns=["user_id", "event_id", "ts", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(running, batch_format="pandas")
        .to_pandas()
    )
    out["user_id"] = out["user_id"].astype("int64")
    out["event_id"] = out["event_id"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def json_extract_props(sf_dir: str) -> pa.Table:
    """Semi-structured extraction: pull the integer field out of the JSON
    props payload with ONE vectorized Arrow regex kernel (no per-row json
    loads — at corpus scale the payload parse IS the job), then aggregate
    (count, sum, distinct-count) per event_type. Distinct-count of a
    bounded-domain field is per-batch set partials unioned in a tiny
    driver reduce."""

    def partial(b: pa.Table) -> pa.Table:
        ex = pc.extract_regex(b["props"], pattern=r"\"k\": (?P<k>\d+)")
        k = pc.cast(pc.struct_field(ex, "k"), pa.int64())
        df = pd.DataFrame(
            {
                "event_type": b["event_type"].to_numpy(zero_copy_only=False),
                "k": k.to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby("event_type", as_index=False).agg(
            n=("k", "size"), sum_k=("k", "sum")
        )
        uniq = df.drop_duplicates()
        uniq["n"] = 0
        uniq["sum_k"] = 0
        g["k"] = -1
        return pa.Table.from_pandas(
            pd.concat([g, uniq[["event_type", "n", "sum_k", "k"]]], ignore_index=True),
            preserve_index=False,
        )

    part = (
        _events(sf_dir, columns=["event_type", "props"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    totals = (
        part[part["k"] == -1]
        .groupby("event_type", as_index=False)
        .agg(n=("n", "sum"), sum_k=("sum_k", "sum"))
    )
    distinct = (
        part[part["k"] >= 0]
        .drop_duplicates(["event_type", "k"])
        .groupby("event_type", as_index=False)
        .agg(n_distinct_k=("k", "size"))
    )
    out = totals.merge(distinct, on="event_type")
    for c in ("n", "sum_k", "n_distinct_k"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def argmax_latest_event(sf_dir: str) -> pa.Table:
    """ARG_MAX / keep-latest dedup: for every user the single most recent
    event row (max (ts, event_id)). Per-batch vectorized argmax combiner,
    ONE user-hash bucket reduce — the mirror of first-wins exact dedup and
    the row-level LWW shape the CDC merge uses, expressed as an operator."""

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": b["user_id"].to_numpy(),
                "event_id": b["event_id"].to_numpy(),
                "tsu": b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
                "event_type": b["event_type"].to_numpy(zero_copy_only=False),
            }
        )
        df = df.sort_values(["tsu", "event_id"], kind="stable").drop_duplicates(
            "user_id", keep="last"
        )
        df["bucket"] = (
            df["user_id"].to_numpy().astype(np.uint64) * np.uint64(2654435761)
        ) % np.uint64(64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["tsu", "event_id"], kind="stable").drop_duplicates(
            "user_id", keep="last"
        )
        return pd.DataFrame(
            {
                "user_id": g["user_id"].astype("int64"),
                "last_event_id": g["event_id"].astype("int64"),
                "last_event_type": g["event_type"],
            }
        )

    out = (
        _events(sf_dir, columns=["user_id", "event_id", "ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
        .to_pandas()
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def value_histogram(sf_dir: str, n_bins: int = 20, hi_ticks: int = 10000) -> pa.Table:
    """Fixed-width histogram of value per event_type (the profiling /
    data-quality primitive): bin assignment is pure arithmetic per batch,
    partials are (type, bin) counts — the full dataset never shuffles,
    only the tiny histogram table does."""
    width = hi_ticks // n_bins

    def partial(b: pa.Table) -> pa.Table:
        t = np.floor(b["value"].to_numpy() * 10000.0).astype(np.int64)
        bins = np.clip(t // width, 0, n_bins - 1)
        df = pd.DataFrame(
            {
                "event_type": b["event_type"].to_numpy(zero_copy_only=False),
                "bin": bins,
                "one": np.int64(1),
            }
        )
        return pa.Table.from_pandas(
            df.groupby(["event_type", "bin"], as_index=False).agg(n=("one", "sum")),
            preserve_index=False,
        )

    out = (
        _events(sf_dir, columns=["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
        .groupby(["event_type", "bin"], as_index=False)
        .agg(n=("n", "sum"))
    )
    out["bin"] = out["bin"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def mad_robust_stats(sf_dir: str) -> pa.Table:
    """Robust per-group stats: median and MAD (median absolute deviation),
    reported as 2× in integer ticks so even-count medians stay EXACT
    (2·median of ints is an int; float medians differ in last-ulp across
    engines). Two passes: exact per-type median (tiny result, broadcast),
    then deviations and their exact median. Low-cardinality groups gather
    in one task each (same documented constraint as the exact quantiles);
    the high-cardinality swap-in is the t-digest in functions/sketch.py."""
    import ray as _ray

    def med2_of(col: np.ndarray) -> int:
        s = np.sort(col)
        n = len(s)
        return int(s[(n - 1) // 2] + s[n // 2])

    def ticks(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b["event_type"],
                "t": pa.array(
                    np.floor(b["value"].to_numpy() * 10000.0).astype(np.int64)
                ),
            }
        )

    base = (
        _events(sf_dir, columns=["event_type", "value"])
        .map_batches(ticks, batch_format="pyarrow")
        .materialize()
    )

    def med_group(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            [{"event_type": g["event_type"].iloc[0], "med2": med2_of(g["t"].to_numpy())}]
        )

    med = base.groupby("event_type").map_groups(med_group, batch_format="pandas").to_pandas()
    mref = _ray.put(dict(zip(med["event_type"], med["med2"])))

    def mad_group(g: pd.DataFrame) -> pd.DataFrame:
        m2 = _ray.get(mref)[g["event_type"].iloc[0]]
        dev2 = np.abs(2 * g["t"].to_numpy() - m2)  # 2·|x − med| stays integral
        return pd.DataFrame(
            [
                {
                    "event_type": g["event_type"].iloc[0],
                    "med2": int(m2),
                    "mad4": med2_of(dev2),  # 2·median of 2·|dev| = 4·MAD
                }
            ]
        )

    out = base.groupby("event_type").map_groups(mad_group, batch_format="pandas").to_pandas()
    out["med2"] = out["med2"].astype("int64")
    out["mad4"] = out["mad4"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


# ------------------------------------------------ round-2 widening, batch 6

def orc_source_roundtrip(sf_dir: str) -> pa.Table:
    """Columnar-format interop (ORC source/sink): events → one ORC shard per
    batch (written inside map_batches — the sink is distributed, the driver
    never sees data) → shard list → distributed ORC read → grouped rollup.
    Value scaled to integer ticks before the roundtrip so the compare is
    exact. The same per-shard pattern generalizes to any pyarrow-supported
    format; shard files are the resumable unit."""
    import uuid

    import pyarrow.orc as orc

    with tempfile.TemporaryDirectory(prefix="orcrt-") as d:

        def write_shard(b: pa.Table) -> pa.Table:
            v = np.floor(b["value"].to_numpy() * 10000.0).astype(np.int64)
            t = pa.table(
                {
                    "event_id": b["event_id"],
                    "event_type": b["event_type"],
                    "value_t": pa.array(v, pa.int64()),
                }
            )
            path = os.path.join(d, f"shard-{uuid.uuid4().hex}.orc")
            orc.write_table(t, path)
            return pa.table({"path": pa.array([path], pa.string())})

        paths = (
            _events(sf_dir, columns=["event_id", "event_type", "value"])
            .map_batches(write_shard, batch_format="pyarrow")
            .to_pandas()["path"]
            .tolist()
        )

        def read_shard(b: pa.Table) -> pa.Table:
            return pa.concat_tables(
                [orc.read_table(p.as_py()) for p in b["path"]]
            )

        def partial(b: pa.Table) -> pa.Table:
            df = pd.DataFrame(
                {
                    "event_type": b["event_type"].to_numpy(zero_copy_only=False),
                    "n": np.int64(1),
                    "sum_ticks": b["value_t"].to_numpy(),
                }
            )
            return pa.Table.from_pandas(
                df.groupby("event_type", as_index=False).agg(
                    n=("n", "sum"), sum_ticks=("sum_ticks", "sum")
                ),
                preserve_index=False,
            )

        out = (
            ray.data.from_items([{"path": p} for p in paths])
            .map_batches(read_shard, batch_size=4, batch_format="pyarrow")
            .map_batches(partial, batch_format="pyarrow")
            .to_pandas()
            .groupby("event_type", as_index=False)
            .agg(n=("n", "sum"), sum_ticks=("sum_ticks", "sum"))
        )
    out["n"] = out["n"].astype("int64")
    out["sum_ticks"] = out["sum_ticks"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def clustered_sorted_write(sf_dir: str) -> pa.Table:
    """Cluster-sorted export: a REAL global sort (the one place the
    all-to-all shuffle is the right tool — range-partitioned by Ray's sort,
    not a bucket hash), written to parquet in sorted block order, read back
    and summarized per type with the globally-first/last event under the
    sort key. Downstream scan benefit: readers get (event_type, ts) ranges
    per file → row-group pruning works."""
    with tempfile.TemporaryDirectory(prefix="clsort-") as d:

        def prep(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "event_type": b["event_type"],
                    "tsu": pa.array(
                        b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
                    ),
                    "event_id": b["event_id"],
                }
            )

        (
            _events(sf_dir, columns=["event_type", "ts", "event_id"])
            .map_batches(prep, batch_format="pyarrow")
            .sort(["event_type", "tsu", "event_id"])
            .write_parquet(d)
        )

        def partial(b: pa.Table) -> pa.Table:
            df = pd.DataFrame(
                {
                    "event_type": b["event_type"].to_numpy(zero_copy_only=False),
                    "tsu": b["tsu"].to_numpy(),
                    "event_id": b["event_id"].to_numpy(),
                }
            )
            g = df.sort_values(["tsu", "event_id"], kind="stable").groupby(
                "event_type", as_index=False
            )
            first = g.first().rename(
                columns={"tsu": "first_tsu", "event_id": "first_event_id"}
            )
            last = g.last().rename(
                columns={"tsu": "last_tsu", "event_id": "last_event_id"}
            )
            cnt = g.size().rename(columns={"size": "n"})
            return pa.Table.from_pandas(
                first.merge(last, on="event_type").merge(cnt, on="event_type"),
                preserve_index=False,
            )

        part = (
            ray.data.read_parquet(d)
            .map_batches(partial, batch_format="pyarrow")
            .to_pandas()
        )
    agg = part.groupby("event_type", as_index=False).apply(
        lambda g: pd.Series(
            {
                "n": g["n"].sum(),
                "first_event_id": g.sort_values(
                    ["first_tsu", "first_event_id"]
                )["first_event_id"].iloc[0],
                "last_event_id": g.sort_values(
                    ["last_tsu", "last_event_id"]
                )["last_event_id"].iloc[-1],
            }
        ),
        include_groups=False,
    ).reset_index()
    agg = agg[["event_type", "n", "first_event_id", "last_event_id"]]
    for c in ("n", "first_event_id", "last_event_id"):
        agg[c] = agg[c].astype("int64")
    return pa.Table.from_pandas(agg, preserve_index=False)


def lake_point_lookup(sf_dir: str) -> pa.Table:
    """Serving-path point read: fetch ONE conversation's final turns by
    computing its hash partition and reading exactly that partition's base
    (+deltas) — O(lake/64) bytes touched, no scan, no shuffle. The target
    conv is the deterministic min-user conv so the oracle can name it too.
    Reference parity: per-upload status lookup (ProcessingStatus API)."""
    import pyarrow.parquet as pq

    from data_exchange_routing_ray.hashing import partition_ids
    from data_exchange_routing_ray.pipelines.cdc import CDCLake
    from data_exchange_routing_ray.stages.upsert import fold_deltas

    uid = int(_events(sf_dir, columns=["user_id"]).min("user_id"))
    conv = f"conv-{uid:06d}"

    with tempfile.TemporaryDirectory(prefix="cdclake-") as d:
        lake = CDCLake(os.path.join(d, "lake"), num_partitions=64)
        lake.apply_changes(derived_change_stream(sf_dir), quarantine=False)
        pid = int(partition_ids(np.array([conv], dtype=object), 64)[0])
        entry = lake.manifest.partitions.get(pid)
        assert entry is not None, "target partition must exist"
        t = pq.read_table(os.path.join(lake.lake_dir, entry.file))
        if entry.deltas:
            t = fold_deltas(
                t,
                [
                    pq.read_table(os.path.join(lake.lake_dir, dd["file"]))
                    for dd in entry.deltas
                ],
            )
        t = t.filter(pc.equal(t["conv_id"], conv))
        df = t.select(["conv_id", "turn_idx", "role", "text", "tool", "ts"]).to_pandas()
    df["turn_idx"] = df["turn_idx"].astype("int64")
    df = df.sort_values("turn_idx", kind="stable")
    return pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False)


def exact_distinct_pairs(sf_dir: str) -> pa.Table:
    """Exact global COUNT DISTINCT over a composite key (user, day): the
    exact counterpart of the HLL sketch op — per-batch distinct-pair
    combiner, ONE pair-hash bucket shuffle of the (already deduped) pairs,
    per-bucket exact count, tiny sum. Memory bound is distinct pairs per
    bucket, never raw rows."""

    def partial(b: pa.Table) -> pa.Table:
        day = (
            b["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        )
        df = pd.DataFrame(
            {"user_id": b["user_id"].to_numpy(), "day": day}
        ).drop_duplicates()
        key = (
            df["user_id"].to_numpy().astype(np.uint64) * np.uint64(2654435761)
            + df["day"].to_numpy().astype(np.uint64)
        )
        df["bucket"] = (key % np.uint64(64)).astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            [{"n": int(len(g.drop_duplicates(["user_id", "day"])))}]
        )

    part = (
        _events(sf_dir, columns=["user_id", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(count_bucket, batch_format="pandas")
        .to_pandas()
    )
    return pa.table({"n_user_days": pa.array([int(part["n"].sum())], pa.int64())})


# ------------------------------------------------ round-2 widening, batch 7

def _user_bucket(uid: np.ndarray, n: int = 64) -> np.ndarray:
    return ((uid.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(n)).astype(
        np.int64
    )


def funnel_conversion(sf_dir: str) -> pa.Table:
    """Ordered conversion funnel (view → click → purchase, strictly
    increasing event time): per-user min-time chaining. ONE user-hash
    bucket shuffle; inside a bucket every step is a vectorized masked
    groupby-transform (no per-user Python loop), so a bucket of millions
    of users costs three C-level scans. Per-bucket output is 3 counters —
    the driver sums a 64×3 table. Reference parity: multi-stage delivery
    tracking (upload → routed → delivered status progression)."""

    def partial(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy()
        return pa.table(
            {
                "user_id": b["user_id"],
                "event_type": b["event_type"],
                "tsu": pa.array(
                    b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
                ),
                "bucket": pa.array(_user_bucket(uid)),
            }
        )

    def funnel_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["tsu"]
        u = g["user_id"]
        t1 = ts.where(g["event_type"].eq("view")).groupby(u).transform("min")
        t2 = (
            ts.where(g["event_type"].eq("click") & (ts > t1))
            .groupby(u)
            .transform("min")
        )
        t3 = (
            ts.where(g["event_type"].eq("purchase") & (ts > t2))
            .groupby(u)
            .transform("min")
        )
        per = pd.DataFrame(
            {"u": u, "s1": t1.notna(), "s2": t2.notna(), "s3": t3.notna()}
        ).groupby("u").any()
        return pd.DataFrame(
            {
                "step": ["step1_view", "step2_click", "step3_purchase"],
                "n_users": [
                    int(per["s1"].sum()),
                    int(per["s2"].sum()),
                    int(per["s3"].sum()),
                ],
            }
        )

    part = (
        _events(sf_dir, columns=["user_id", "event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(funnel_bucket, batch_format="pandas")
        .to_pandas()
    )
    out = part.groupby("step", as_index=False).agg(n_users=("n_users", "sum"))
    out["n_users"] = out["n_users"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def cohort_retention(sf_dir: str) -> pa.Table:
    """Cohort retention matrix: users cohorted by first active day, counted
    once per (cohort_day, day_offset) they return. Per-batch distinct
    (user, day) combiner → ONE user-hash bucket shuffle (a user's full
    history co-locates, so cohort assignment is exact) → vectorized
    in-bucket matrix partials; the driver sums |days|² cells, which is
    bounded by the calendar, not the data."""

    def partial(b: pa.Table) -> pa.Table:
        day = b["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        df = pd.DataFrame(
            {"user_id": b["user_id"].to_numpy(), "d": day}
        ).drop_duplicates()
        df["bucket"] = _user_bucket(df["user_id"].to_numpy())
        return pa.Table.from_pandas(df, preserve_index=False)

    def cohort_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "d"])
        cd = g.groupby("user_id")["d"].transform("min")
        out = pd.DataFrame({"cohort_day": cd, "day_offset": g["d"] - cd})
        return out.groupby(
            ["cohort_day", "day_offset"], as_index=False
        ).size().rename(columns={"size": "n_users"})

    part = (
        _events(sf_dir, columns=["user_id", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(cohort_bucket, batch_format="pandas")
        .to_pandas()
    )
    out = part.groupby(["cohort_day", "day_offset"], as_index=False).agg(
        n_users=("n_users", "sum")
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def user_activity_streaks(sf_dir: str) -> pa.Table:
    """Gaps-and-islands: per user, total active days and the longest run of
    consecutive days (the classic streak query). Distinct-day combiner →
    user-hash bucket shuffle → island id via the day-minus-rank trick,
    fully vectorized inside the bucket; per-user rows leave the bucket
    directly (users never span buckets — no driver reduce)."""

    def partial(b: pa.Table) -> pa.Table:
        day = b["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        df = pd.DataFrame(
            {"user_id": b["user_id"].to_numpy(), "d": day}
        ).drop_duplicates()
        df["bucket"] = _user_bucket(df["user_id"].to_numpy())
        return pa.Table.from_pandas(df, preserve_index=False)

    def streak_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "d"]).sort_values(
            ["user_id", "d"], kind="stable"
        )
        isl = g["d"] - g.groupby("user_id").cumcount()
        runs = (
            pd.DataFrame({"user_id": g["user_id"], "isl": isl})
            .groupby(["user_id", "isl"], as_index=False)
            .size()
        )
        out = runs.groupby("user_id", as_index=False).agg(
            n_active_days=("size", "sum"), longest_streak=("size", "max")
        )
        return out

    out = (
        _events(sf_dir, columns=["user_id", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(streak_bucket, batch_format="pandas")
        .to_pandas()
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values("user_id", kind="stable").reset_index(drop=True),
        preserve_index=False,
    )


def tfidf_top_terms(sf_dir: str, k: int = 3) -> pa.Table:
    """Per-document top-k distinctive terms: tf is computed per batch with
    no shuffle (a document never spans rows), df via ONE term-hash bucket
    shuffle, the per-doc top-k via a second doc-hash bucket shuffle —
    both reduces vectorized. Ranking is the integer lexicographic
    (tf DESC, df ASC, term ASC): deterministic across engines, unlike
    float tf·idf whose 1-ulp ln() differences reorder near-ties; df is
    emitted so consumers can weight as they wish."""

    def tf_partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(b["text"]), pattern=r"[^\p{L}\p{N}]+"
        )
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(toks).to_numpy()
        doc = np.repeat(b["doc_id"].to_numpy(), lens)
        df = pd.DataFrame({"doc_id": doc, "term": flat})
        df = df[df["term"] != ""]
        tf = df.groupby(["doc_id", "term"], as_index=False).size().rename(
            columns={"size": "tf"}
        )
        tf["bucket"] = (
            pd.util.hash_array(tf["term"].to_numpy(dtype=object)) % 64
        ).astype("int64")
        return pa.Table.from_pandas(tf, preserve_index=False)

    def attach_df(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["df"] = g.groupby("term")["doc_id"].transform("size")
        g["bucket2"] = (
            (g["doc_id"].to_numpy().astype(np.uint64) * np.uint64(2654435761))
            % np.uint64(64)
        ).astype(np.int64)
        return g[["doc_id", "term", "tf", "df", "bucket2"]]

    def topk_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["doc_id", "tf", "df", "term"],
            ascending=[True, False, True, True],
            kind="stable",
        )
        return g.groupby("doc_id").head(k)[["doc_id", "term", "tf", "df"]]

    out = (
        _documents(sf_dir, columns=["doc_id", "text"])
        .map_batches(tf_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(attach_df, batch_format="pandas")
        .groupby("bucket2")
        .map_groups(topk_bucket, batch_format="pandas")
        .to_pandas()
    )
    for c in ("doc_id", "tf", "df"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values(["doc_id", "term"], kind="stable").reset_index(drop=True),
        preserve_index=False,
    )


def user_mode_event_type(sf_dir: str) -> pa.Table:
    """Grouped MODE with deterministic tie-break (highest count, then
    lexicographically smallest type): per-batch (user, type) count
    combiner → user-hash bucket reduce → vectorized argmax via
    sort + drop_duplicates. The shuffle carries counts, never raw rows."""

    def partial(b: pa.Table) -> pa.Table:
        df = (
            pd.DataFrame(
                {
                    "user_id": b["user_id"].to_numpy(),
                    "event_type": b["event_type"].to_numpy(zero_copy_only=False),
                }
            )
            .groupby(["user_id", "event_type"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        df["bucket"] = _user_bucket(df["user_id"].to_numpy())
        return pa.Table.from_pandas(df, preserve_index=False)

    def mode_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["user_id", "event_type"], as_index=False).agg(n=("n", "sum"))
        s = s.sort_values(
            ["user_id", "n", "event_type"],
            ascending=[True, False, True],
            kind="stable",
        )
        top = s.drop_duplicates("user_id", keep="first")
        return top.rename(columns={"event_type": "mode_event_type", "n": "n_mode"})

    out = (
        _events(sf_dir, columns=["user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(mode_bucket, batch_format="pandas")
        .to_pandas()
    )
    out["user_id"] = out["user_id"].astype("int64")
    out["n_mode"] = out["n_mode"].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values("user_id", kind="stable").reset_index(drop=True),
        preserve_index=False,
    )


def window_dedup_first(sf_dir: str) -> pa.Table:
    """Streaming dedup-within-window: keep only the FIRST event per
    (user, type, hour), by (ts, event_id). The keep-min choice is
    associative, so it runs as a per-batch combiner BEFORE the single
    user-hash bucket shuffle — the exchange carries at most one candidate
    row per (user, type, hour) per batch, not the raw stream. Reference
    parity: duplicate-delivery suppression on redelivered queue messages."""

    def partial(b: pa.Table) -> pa.Table:
        tsu = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        df = pd.DataFrame(
            {
                "user_id": b["user_id"].to_numpy(),
                "event_type": b["event_type"].to_numpy(zero_copy_only=False),
                "hour": tsu // (3600 * 10**6),
                "tsu": tsu,
                "event_id": b["event_id"].to_numpy(),
                "ticks": np.floor(b["value"].to_numpy() * 10000.0).astype(np.int64),
            }
        ).sort_values(["tsu", "event_id"], kind="stable")
        df = df.drop_duplicates(["user_id", "event_type", "hour"], keep="first")
        df["bucket"] = _user_bucket(df["user_id"].to_numpy())
        return pa.Table.from_pandas(df, preserve_index=False)

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["tsu", "event_id"], kind="stable").drop_duplicates(
            ["user_id", "event_type", "hour"], keep="first"
        )
        return g.groupby("event_type", as_index=False).agg(
            n_kept=("event_id", "size"), sum_ticks=("ticks", "sum")
        )

    part = (
        _events(sf_dir, columns=["user_id", "event_type", "ts", "event_id", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(dedup_bucket, batch_format="pandas")
        .to_pandas()
    )
    out = part.groupby("event_type", as_index=False).agg(
        n_kept=("n_kept", "sum"), sum_ticks=("sum_ticks", "sum")
    )
    out["n_kept"] = out["n_kept"].astype("int64")
    out["sum_ticks"] = out["sum_ticks"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


# ------------------------------------------------ round-2 widening, batch 8

def pareto_orders(sf_dir: str) -> pa.Table:
    """Distributed 2-D skyline (Pareto frontier): orders not dominated on
    (price HIGH, order day LOW). Dominance is transitive, so the global
    frontier is a subset of the union of per-block frontiers — each block
    prunes to its local frontier with one sort + running-min scan
    (vectorized), and only those few candidates reach the driver for the
    identical final scan. No shuffle at all; the reduction is the pruning."""

    def _frontier(df: pd.DataFrame) -> pd.DataFrame:
        # sort price DESC, day ASC; a row is dominated iff an earlier row
        # (strictly higher price, or equal price handled by the strict day
        # check within the running min) already reached a day <= mine.
        df = df.sort_values(
            ["price_ticks", "order_day"], ascending=[False, True], kind="stable"
        )
        p = df["price_ticks"].to_numpy()
        d = df["order_day"].to_numpy()
        run_min = np.minimum.accumulate(d)
        prev_min = np.concatenate(([np.iinfo(np.int64).max], run_min[:-1]))
        # min day among rows with price STRICTLY greater: reset at price ties
        first_of_price = np.concatenate(([True], p[1:] != p[:-1]))
        strict_min = prev_min.copy()
        # within an equal-price run, carry the min from BEFORE the run
        idx = np.where(first_of_price)[0]
        strict_min = prev_min[idx[np.cumsum(first_of_price) - 1]]
        dominated = strict_min <= d
        # equal (p, d) duplicates never dominate each other, but an equal-p
        # smaller-d row does:
        eq_min = np.concatenate(([np.iinfo(np.int64).max], run_min[:-1]))
        same_p_smaller_d = (~first_of_price) & (eq_min < d)
        keep = ~(dominated | same_p_smaller_d)
        return df[keep]

    def block_frontier(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "o_orderkey": b["o_orderkey"].to_numpy(),
                "price_ticks": np.floor(
                    b["o_totalprice"].to_numpy() * 100.0
                ).astype(np.int64),
                "order_day": b["o_orderdate"]
                .to_numpy()
                .astype("datetime64[D]")
                .astype(np.int64),
            }
        )
        return pa.Table.from_pandas(_frontier(df), preserve_index=False)

    cand = (
        _read_sized(
os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_totalprice", "o_orderdate"],
        )
        .map_batches(block_frontier, batch_format="pyarrow")
        .to_pandas()
    )
    out = _frontier(cand).sort_values("o_orderkey", kind="stable")
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def timeseries_gapfill_ffill(sf_dir: str) -> pa.Table:
    """Time-series gap fill + forward fill (the resample step of feature
    engineering): each user's daily value total over their OWN
    [first, last] active-day span, with missing days forward-filled from
    the previous observed day.

    Scale shape: per-batch (user, day) partial sums collapse the event
    stream to ≤ users × active-days rows before the ONE user-hash
    exchange; the fill itself is a vectorized pandas reindex + ffill
    inside ``map_groups``, bounded by the user's span in DAYS, never by
    event count. Daily totals round to 4 dp BEFORE the fill so engine and
    oracle sum identical quantities."""

    def partials(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": b["user_id"].to_numpy(),
                "day": b["ts"].to_numpy().astype("datetime64[D]").astype(np.int64),
                "v": b["value"].to_numpy(),
            }
        )
        agg = df.groupby(["user_id", "day"], as_index=False).agg(v=("v", "sum"))
        return pa.Table.from_pandas(agg, preserve_index=False)

    def fill(g: pd.DataFrame) -> pd.DataFrame:
        uid = int(g["user_id"].iloc[0])
        # merge cross-batch partials for the same day, THEN round (the
        # oracle's round(sum(value), 4) per day)
        g = g.groupby("day", as_index=False).agg(v=("v", "sum")).sort_values("day")
        days = np.arange(int(g["day"].iloc[0]), int(g["day"].iloc[-1]) + 1)
        s = pd.Series(
            np.round(g["v"].to_numpy(), 4), index=g["day"].to_numpy()
        ).reindex(days)
        return pd.DataFrame(
            {
                "user_id": [uid],
                "n_days": [len(days)],
                "n_filled": [int(s.isna().sum())],
                "total_filled": [round(float(s.ffill().sum()), 4)],
            }
        )

    out = (
        _events(sf_dir, columns=["user_id", "ts", "value"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(fill, batch_format="pandas")
        .to_pandas()
        .sort_values("user_id", kind="stable")
        .reset_index(drop=True)
        .astype({"user_id": "int64", "n_days": "int64", "n_filled": "int64"})
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def rolling_7d_active_users(sf_dir: str) -> pa.Table:
    """Sliding-window COUNT DISTINCT (7-day active users per day): distinct
    (user, day) combiner → each pair expands to its ≤7 target days (the
    expansion is bounded by the window, not the data) → user-hash bucket
    dedup → per-bucket exact counts per target day → driver sums a
    calendar-bounded table. Users never span buckets, so no double count."""
    days = (
        _events(sf_dir, columns=["ts"])
        .map_batches(
            lambda b: pa.table(
                {
                    "d": pa.array(
                        np.unique(
                            b["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
                        )
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()["d"]
        .unique()
    )
    observed = np.sort(days)
    obs_ref = ray.put(set(observed.tolist()))

    def expand(b: pa.Table) -> pa.Table:
        obs = ray.get(obs_ref)
        day = b["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        df = pd.DataFrame(
            {"user_id": b["user_id"].to_numpy(), "d": day}
        ).drop_duplicates()
        rep = df.loc[df.index.repeat(7)].reset_index(drop=True)
        rep["target"] = rep["d"] + np.tile(np.arange(7), len(df))
        rep = rep[rep["target"].isin(obs)].drop_duplicates(["user_id", "target"])
        rep["bucket"] = _user_bucket(rep["user_id"].to_numpy())
        return pa.Table.from_pandas(
            rep[["user_id", "target", "bucket"]], preserve_index=False
        )

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "target"])
        return g.groupby("target", as_index=False).size().rename(
            columns={"size": "n"}
        )

    part = (
        _events(sf_dir, columns=["user_id", "ts"])
        .map_batches(expand, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(count_bucket, batch_format="pandas")
        .to_pandas()
    )
    out = (
        part.groupby("target", as_index=False)
        .agg(n_active_7d=("n", "sum"))
        .rename(columns={"target": "day"})
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def orders_above_customer_avg(sf_dir: str) -> pa.Table:
    """Decorrelated correlated subquery (orders strictly above their own
    customer's average order value): per-batch (custkey, n, sum) combiner
    unions with order rows through ONE custkey-hash bucket shuffle; the
    comparison is the integer cross-multiply p·n > Σ — no float division,
    exact at any scale. Output is the per-priority count of above-average
    orders."""

    def order_rows(b: pa.Table) -> pa.Table:
        k = b["o_custkey"].to_numpy()
        return pa.table(
            {
                "custkey": b["o_custkey"],
                "ticks": pa.array(
                    np.floor(b["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
                ),
                "n": pa.array(np.zeros(b.num_rows, np.int64)),
                "priority": b["o_orderpriority"],
                "side": pa.array(np.ones(b.num_rows, np.int64)),
                "bucket": pa.array(_user_bucket(k, 64)),
            }
        )

    def stats_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "custkey": b["o_custkey"].to_numpy(),
                "ticks": np.floor(b["o_totalprice"].to_numpy() * 100.0).astype(
                    np.int64
                ),
            }
        )
        s = df.groupby("custkey", as_index=False).agg(
            ticks=("ticks", "sum"), n=("ticks", "size")
        )
        s["priority"] = ""
        s["side"] = np.int64(0)
        s["bucket"] = _user_bucket(s["custkey"].to_numpy(), 64)
        return pa.Table.from_pandas(
            s[["custkey", "ticks", "n", "priority", "side", "bucket"]],
            preserve_index=False,
        )

    orders = _read_sized(
os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_totalprice", "o_orderpriority"],
    )
    both = orders.map_batches(order_rows, batch_format="pyarrow").union(
        orders.map_batches(stats_partial, batch_format="pyarrow")
    )

    def filter_bucket(g: pd.DataFrame) -> pd.DataFrame:
        st = (
            g[g["side"] == 0]
            .groupby("custkey", as_index=False)
            .agg(s=("ticks", "sum"), n=("n", "sum"))
        )
        o = (
            g[g["side"] == 1]
            .drop(columns=["n"])
            .merge(st, on="custkey", how="left")
        )
        above = o[o["ticks"] * o["n"] > o["s"]]
        return above.groupby("priority", as_index=False).size().rename(
            columns={"size": "n_above"}
        )

    part = (
        both.groupby("bucket")
        .map_groups(filter_bucket, batch_format="pandas")
        .to_pandas()
    )
    out = part.groupby("priority", as_index=False).agg(n_above=("n_above", "sum"))
    out = out.rename(columns={"priority": "o_orderpriority"})
    out["n_above"] = out["n_above"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def period_over_period(sf_dir: str) -> pa.Table:
    """Period-over-period deltas (daily counts per type with LAG): count
    combiner → type-hash bucket reduce (a type's whole series co-locates,
    so the shift is exact) → vectorized sorted shift. The exchange carries
    (type, day, n) partials — calendar-bounded, never raw events."""

    def partial(b: pa.Table) -> pa.Table:
        day = b["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        df = (
            pd.DataFrame(
                {
                    "event_type": b["event_type"].to_numpy(zero_copy_only=False),
                    "day": day,
                }
            )
            .groupby(["event_type", "day"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        df["bucket"] = (
            pd.util.hash_array(df["event_type"].to_numpy(dtype=object)) % 16
        ).astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False)

    def lag_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["event_type", "day"], as_index=False).agg(n=("n", "sum"))
        s = s.sort_values(["event_type", "day"], kind="stable")
        prev = s.groupby("event_type")["n"].shift(1)
        prev_day = s.groupby("event_type")["day"].shift(1)
        # LAG is previous CALENDAR day only when contiguous; emit the raw
        # previous-row value like SQL LAG over (PARTITION BY type ORDER BY day)
        s["prev_n"] = prev.fillna(-1).astype(np.int64)
        s["delta"] = np.where(prev.isna(), 0, s["n"] - prev.fillna(0)).astype(
            np.int64
        )
        del prev_day
        return s[["event_type", "day", "n", "prev_n", "delta"]]

    out = (
        _events(sf_dir, columns=["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lag_bucket, batch_format="pandas")
        .to_pandas()
        .sort_values(["event_type", "day"], kind="stable")
    )
    for c in ("day", "n", "prev_n", "delta"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


# ------------------------------------------------ round-2 widening, batch 9

def deterministic_shuffle_sample(sf_dir: str, k: int = 100) -> pa.Table:
    """Deterministic epoch shuffle (training-order randomization WITHOUT
    RNG state): global order = Knuth multiplicative hash of doc_id — a
    replayable, resume-safe permutation. Realized as top-k under the hash
    order via per-block candidate pruning (each block ships only its own
    best k rows), so the full permutation is never materialized; a trainer
    consuming the whole epoch would read blocks range-partitioned by the
    same hash."""

    def prune(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy().astype(np.uint64)
        h = ((ids * np.uint64(2654435761)) % np.uint64(1 << 32)).astype(np.int64)
        df = pd.DataFrame({"doc_id": b["doc_id"].to_numpy(), "h": h})
        df = df.sort_values(["h", "doc_id"], kind="stable").head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    cand = (
        _documents(sf_dir, columns=["doc_id"])
        .map_batches(prune, batch_format="pyarrow")
        .to_pandas()
    )
    top = cand.sort_values(["h", "doc_id"], kind="stable").head(k).reset_index(
        drop=True
    )
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    for c in ("doc_id", "h"):
        top[c] = top[c].astype("int64")
    return pa.Table.from_pandas(top, preserve_index=False)


def dedup_source_priority(sf_dir: str) -> pa.Table:
    """Cross-source exact dedup with PRIORITY (keep the copy from the
    preferred source, not the lowest id — curated > crawled): content-hash
    bucket shuffle; within a bucket the winner per text group is the
    (source ASC, doc_id ASC) minimum via sort + drop_duplicates. The
    exchange carries (id, source, text) once; no driver materialization."""
    from data_exchange_routing_ray.functions.dedup import (
        _mix_to_bucket,
        add_content_hash,
    )

    def tag(b: pa.Table) -> pa.Table:
        b2 = add_content_hash(b, "text")
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "source": b["source"],
                "text": b["text"],
                "bucket": pa.array(
                    _mix_to_bucket([b2["content_hash"].to_numpy()], 256),
                    pa.int64(),
                ),
            }
        )

    def keep_winner(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["text", "source", "doc_id"], kind="stable")
        w = g.drop_duplicates("text", keep="first")
        return w[["doc_id", "source"]]

    out = (
        _documents(sf_dir, columns=["doc_id", "source", "text"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(keep_winner, batch_format="pandas")
        .to_pandas()
    )
    out["doc_id"] = out["doc_id"].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values("doc_id", kind="stable").reset_index(drop=True),
        preserve_index=False,
    )


def dup_cluster_size_histogram(sf_dir: str) -> pa.Table:
    """Corpus-health metric: distribution of exact-dup cluster sizes
    (how much of the corpus is 1×, 2×, …, N×-replicated). Content-hash
    bucket shuffle → per-bucket per-text counts (a text's copies co-locate)
    → count-of-counts partials → driver sums a histogram whose width is
    the max multiplicity, not the corpus."""
    from data_exchange_routing_ray.functions.dedup import (
        _mix_to_bucket,
        add_content_hash,
    )

    def tag(b: pa.Table) -> pa.Table:
        b2 = add_content_hash(b, "text")
        return pa.table(
            {
                "text": b["text"],
                "bucket": pa.array(
                    _mix_to_bucket([b2["content_hash"].to_numpy()], 256),
                    pa.int64(),
                ),
            }
        )

    def hist_bucket(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby("text").size()
        return (
            sizes.value_counts()
            .rename_axis("cluster_size")
            .reset_index(name="n_clusters")
        )

    part = (
        _documents(sf_dir, columns=["text"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(hist_bucket, batch_format="pandas")
        .to_pandas()
    )
    out = part.groupby("cluster_size", as_index=False).agg(
        n_clusters=("n_clusters", "sum")
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def chunk_dedup_fraction(sf_dir: str, size: int = 256) -> pa.Table:
    """Sub-document (chunk-level) dedup fraction, RefinedWeb line-dedup
    shape: non-overlapping fixed windows, global keep-first by
    (doc_id, chunk_idx), per-doc surviving-chunk count. Chunk totals are
    an in-batch combiner; winners need ONE chunk-hash bucket shuffle;
    both partial streams meet in a doc-hash bucket reduce — raw text
    never returns to the driver."""

    def chunks(b: pa.Table) -> pa.Table:
        lens = pc.utf8_length(b["text"]).to_numpy().astype(np.int64)
        n = (np.maximum(lens, 1) - 1) // size + 1
        ids = np.repeat(b["doc_id"].to_numpy(), n)
        total = int(n.sum())
        idx = np.arange(total) - np.repeat(np.cumsum(n) - n, n)
        texts = np.repeat(np.asarray(b["text"].to_pylist(), dtype=object), n)
        chunk = np.array(
            [t[s : s + size] for t, s in zip(texts, idx * size)], dtype=object
        )
        hb = (pd.util.hash_array(chunk) % 256).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "chunk_idx": pa.array(idx, pa.int64()),
                "chunk": pa.array(chunk, pa.string()),
                "bucket": pa.array(hb, pa.int64()),
            }
        )

    def winners(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["chunk", "doc_id", "chunk_idx"], kind="stable")
        w = g.drop_duplicates("chunk", keep="first")
        out = w.groupby("doc_id", as_index=False).size().rename(
            columns={"size": "n"}
        )
        out["kind"] = np.int64(1)
        return out[["doc_id", "n", "kind"]]

    def totals(b: pa.Table) -> pa.Table:
        lens = pc.utf8_length(b["text"]).to_numpy().astype(np.int64)
        n = (np.maximum(lens, 1) - 1) // size + 1
        return pa.table(
            {
                "doc_id": b["doc_id"].cast(pa.int64()),
                "n": pa.array(n, pa.int64()),
                "kind": pa.array(np.zeros(len(n), np.int64)),
            }
        )

    docs = _documents(sf_dir, columns=["doc_id", "text"])
    kept = (
        docs.map_batches(chunks, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(winners, batch_format="pandas")
    )
    tot = docs.map_batches(totals, batch_format="pyarrow")

    def reduce_doc(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["doc_id", "kind"], as_index=False).agg(n=("n", "sum"))
        p = s.pivot_table(
            index="doc_id", columns="kind", values="n", fill_value=0
        ).reset_index()
        p.columns = ["doc_id"] + [
            {0: "n_chunks", 1: "n_kept"}[c] for c in p.columns[1:]
        ]
        if "n_kept" not in p.columns:
            p["n_kept"] = np.int64(0)
        return p[["doc_id", "n_chunks", "n_kept"]]

    def doc_bucket(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy().astype(np.uint64)
        return b.append_column(
            "dbucket",
            pa.array(((ids * np.uint64(2654435761)) % np.uint64(64)).astype(np.int64)),
        )

    out = (
        kept.union(tot)
        .map_batches(doc_bucket, batch_format="pyarrow")
        .groupby("dbucket")
        .map_groups(reduce_doc, batch_format="pandas")
        .to_pandas()
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values("doc_id", kind="stable").reset_index(drop=True),
        preserve_index=False,
    )


def lake_predicate_delete(sf_dir: str) -> pa.Table:
    """Predicate delete against the lake (GDPR-erasure shape): the final
    state is scanned DISTRIBUTED (merge-on-read per partition), matching
    rows (tool = 'error') are turned into delete change-events with a
    post-watermark seq, and applied as a normal exactly-once epoch — the
    erasure rides the standard merge/commit path, no special-case mutation.
    Returns the post-delete committed state."""
    hi = int(_events(sf_dir, columns=["event_id"]).max("event_id"))

    with tempfile.TemporaryDirectory(prefix="cdclake-") as d:
        from data_exchange_routing_ray.pipelines.cdc import CDCLake

        lake = CDCLake(os.path.join(d, "lake"), num_partitions=16)
        lake.apply_changes(derived_change_stream(sf_dir), quarantine=False)

        def to_deletes(b: pa.Table) -> pa.Table:
            mask = pc.equal(b["tool"], "error")
            t = b.filter(pc.fill_null(mask, False))
            n = t.num_rows
            return pa.table(
                {
                    "seq": pa.array(np.full(n, hi + 1, np.int64)),
                    "op": pa.array(["delete"] * n, pa.string()),
                    "conv_id": t["conv_id"],
                    "turn_idx": t["turn_idx"],
                    "role": pa.nulls(n, pa.string()),
                    "text": pa.nulls(n, pa.string()),
                    "tool": pa.nulls(n, pa.string()),
                    "ts": t["ts"],
                }
            )

        deletes = lake.final_dataset(
            columns=["conv_id", "turn_idx", "tool", "ts"]
        ).map_batches(to_deletes, batch_format="pyarrow")
        lake.apply_changes(deletes, quarantine=False)
        return lake.final_table()


def cdc_txn_aligned_epochs(sf_dir: str, epochs: int = 3, txn_rows: int = 97) -> pa.Table:
    """Source-transaction-aligned epoch planning (Debezium transaction-
    metadata semantics): change events carry a ``txn_id`` (here txn_id =
    seq // 97 — contiguous seq runs, like a binlog's BEGIN..COMMIT spans)
    and epoch boundaries MUST NOT split a transaction, or a reader of an
    intermediate epoch would see half a source commit. Planning is a
    distributed pass over the stream reducing to ONE tiny (txn_id,
    max_seq) table of partial maxes; the driver snaps each target epoch
    bound UP to the next transaction end. In-query asserts verify no txn
    spans two epochs (via each epoch's applied-offset watermark) before
    returning the final state (plain final-state oracle)."""
    stream = derived_change_stream(sf_dir)

    def txn_partial(b: pa.Table) -> pa.Table:
        seq = b["seq"].to_numpy()
        txn = seq // txn_rows
        df = pd.DataFrame({"txn": txn, "seq": seq})
        g = df.groupby("txn", as_index=False)["seq"].max()
        return pa.table({"txn": pa.array(g["txn"]), "max_seq": pa.array(g["seq"])})

    ends = (
        stream.map_batches(txn_partial, batch_format="pyarrow")
        .groupby("txn")
        .aggregate(Max("max_seq", alias_name="max_seq"))
        .to_pandas()
        .sort_values("txn")
    )
    txn_end = ends["max_seq"].to_numpy()  # max seq per txn, ascending
    hi = int(txn_end[-1])
    targets = [((i + 1) * (hi + 1)) // epochs for i in range(epochs)]
    bounds = [0]
    for t in targets[:-1]:
        # snap UP to the first transaction end >= target (exclusive bound)
        j = int(np.searchsorted(txn_end, t - 1))
        bounds.append(int(txn_end[min(j, len(txn_end) - 1)]) + 1)
    bounds.append(hi + 1)

    with tempfile.TemporaryDirectory(prefix="cdctxn-") as d:
        lake = CDCLake(os.path.join(d, "lake"), num_partitions=16)
        for lo, up in zip(bounds, bounds[1:]):
            if lo >= up:
                continue
            res = lake.apply_changes(
                stream.filter(expr=f"seq >= {lo} and seq < {up}"),
                quarantine=False,
            )
            # the committed watermark must sit ON a transaction end:
            # no txn spans this epoch boundary
            wm = res.applied_offset
            j = int(np.searchsorted(txn_end, wm))
            assert j < len(txn_end) and int(txn_end[j]) == wm, (
                f"epoch watermark {wm} splits transaction {wm // txn_rows}"
            )
        return lake.final_table()


def lake_sync_snapshot(sf_dir: str) -> pa.Table:
    """Full snapshot sync (MERGE ... WHEN NOT MATCHED BY SOURCE THEN
    DELETE): the lake is built from the full change stream, then a
    staging snapshot arrives that KEEPS turns with turn_idx % 3 != 0,
    UPPER-CASES text where turn_idx % 3 = 1, and the lake must equal the
    snapshot afterwards — rows absent from staging (turn_idx % 3 = 0)
    are deleted by the not-matched-by-source pass. Oracle = the staging
    snapshot expressed in SQL over the final-state CTE. One
    co-partitioned exchange of staging rows + pruned lake keys
    (CDCLake.sync_snapshot)."""
    with tempfile.TemporaryDirectory(prefix="cdcsync-") as d:
        lake = CDCLake(os.path.join(d, "lake"), num_partitions=16)
        lake.apply_changes(derived_change_stream(sf_dir), quarantine=False)

        def to_snapshot(b: pa.Table) -> pa.Table:
            ti = b["turn_idx"].to_numpy()
            b = b.filter(pa.array(ti % 3 != 0))
            ti = b["turn_idx"].to_numpy()
            up = pa.array(ti % 3 == 1)
            text = pc.if_else(up, pc.utf8_upper(b["text"]), b["text"])
            return b.set_column(b.schema.get_field_index("text"), "text", text)

        staging = lake.final_dataset(
            columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        ).map_batches(to_snapshot, batch_format="pyarrow")
        res = lake.sync_snapshot(staging)
        assert res.changes_applied > 0
        return lake.final_table()


def lake_predicate_update(sf_dir: str) -> pa.Table:
    """Predicate UPDATE against the lake (the ``UPDATE ... SET col = f(row)
    WHERE pred`` maintenance shape — backfills, redactions, normalizations):
    the final state is scanned DISTRIBUTED with only the needed columns,
    matching rows (tool = 'error') become full-row ``update`` change events
    (text upper-cased, tool rewritten to 'scrubbed') with a post-watermark
    seq, and apply through the normal exactly-once epoch — same path as
    ``lake_predicate_delete``, no special-case mutation, O(matching rows)
    shipped through the one merge exchange."""
    hi = int(_events(sf_dir, columns=["event_id"]).max("event_id"))

    with tempfile.TemporaryDirectory(prefix="cdclake-") as d:
        from data_exchange_routing_ray.pipelines.cdc import CDCLake

        lake = CDCLake(os.path.join(d, "lake"), num_partitions=16)
        lake.apply_changes(derived_change_stream(sf_dir), quarantine=False)

        def to_updates(b: pa.Table) -> pa.Table:
            t = b.filter(pc.fill_null(pc.equal(b["tool"], "error"), False))
            n = t.num_rows
            return pa.table(
                {
                    "seq": pa.array(np.full(n, hi + 1, np.int64)),
                    "op": pa.array(["update"] * n, pa.string()),
                    "conv_id": t["conv_id"],
                    "turn_idx": t["turn_idx"],
                    "role": t["role"],
                    "text": pc.utf8_upper(t["text"]),
                    "tool": pa.array(["scrubbed"] * n, pa.string()),
                    "ts": t["ts"],
                }
            )

        updates = lake.final_dataset(
            columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        ).map_batches(to_updates, batch_format="pyarrow")
        lake.apply_changes(updates, quarantine=False)
        return lake.final_table()


# ----------------------------------------------- round-2 widening, batch 10

def rolling_rows_frame(sf_dir: str) -> pa.Table:
    """ROWS-frame window (sum over current + 2 preceding events per user,
    ordered by ts then event_id) — the physical-row counterpart of the
    time-based sliding window. ONE user-hash bucket shuffle; in-bucket the
    frame is cumsum minus shift(3)-cumsum per user — two C-level scans,
    no per-row loop, exact integers."""

    def partial(b: pa.Table) -> pa.Table:
        tsu = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {
                "user_id": b["user_id"],
                "event_id": b["event_id"],
                "tsu": pa.array(tsu),
                "ticks": pa.array(
                    np.floor(b["value"].to_numpy() * 10000.0).astype(np.int64)
                ),
                "bucket": pa.array(_user_bucket(b["user_id"].to_numpy())),
            }
        )

    def roll_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "tsu", "event_id"], kind="stable")
        cs = g.groupby("user_id")["ticks"].cumsum().to_numpy()
        # frame = cs[i] - cs[i-3], where i-3 is in the same user run
        # (cumcount >= 3); earlier rows sum from the run start — all
        # vectorized, no per-group Python
        cnt = g.groupby("user_id").cumcount().to_numpy()
        lag = np.where(
            cnt >= 3, np.concatenate(([0, 0, 0], cs[:-3])), 0
        ) if len(cs) >= 3 else np.zeros(len(cs), np.int64)
        g = g.assign(rolling3_ticks=(cs - lag).astype(np.int64))
        return g[["event_id", "rolling3_ticks"]]

    out = (
        _events(sf_dir, columns=["user_id", "event_id", "ts", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(roll_bucket, batch_format="pandas")
        .to_pandas()
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values("event_id", kind="stable").reset_index(drop=True),
        preserve_index=False,
    )


def dense_cross_counts(sf_dir: str) -> pa.Table:
    """Dense CROSS JOIN grid with zero preservation: every
    (region, order-priority) cell, including combinations no order hits —
    the empty-group semantics GROUP BY alone cannot give. Facts flow
    through broadcast dimension lookups (customer→nation→region maps built
    once, shipped once); per-batch partial counts; the driver reindexes
    the |regions|×|priorities| cartesian — dimension-sized, never
    fact-sized."""
    import pyarrow.parquet as pq

    region = pq.read_table(
        os.path.join(sf_dir, "region.parquet"), columns=["r_regionkey", "r_name"]
    ).to_pandas()
    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_regionkey"],
    ).to_pandas()
    customer = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    ).to_pandas()
    lut = customer.merge(
        nation, left_on="c_nationkey", right_on="n_nationkey"
    )[["c_custkey", "n_regionkey"]].rename(columns={"n_regionkey": "r_regionkey"})
    lut_ref = ray.put(lut.sort_values("c_custkey").reset_index(drop=True))

    def partial(b: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        df = (
            pd.DataFrame(
                {
                    "c_custkey": b["o_custkey"].to_numpy(),
                    "o_orderpriority": b["o_orderpriority"].to_numpy(
                        zero_copy_only=False
                    ),
                }
            )
            .merge(lut, on="c_custkey")[["r_regionkey", "o_orderpriority"]]
            .groupby(["r_regionkey", "o_orderpriority"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    part = (
        _read_sized(
os.path.join(sf_dir, "orders.parquet"),
            columns=["o_custkey", "o_orderpriority"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    agg = part.groupby(["r_regionkey", "o_orderpriority"], as_index=False).agg(
        n=("n", "sum")
    )
    prios = sorted(agg["o_orderpriority"].unique())
    grid = (
        pd.MultiIndex.from_product(
            [region["r_regionkey"].sort_values(), prios],
            names=["r_regionkey", "o_orderpriority"],
        )
        .to_frame(index=False)
        .merge(agg, how="left", on=["r_regionkey", "o_orderpriority"])
        .merge(region, on="r_regionkey")
    )
    grid["n"] = grid["n"].fillna(0).astype("int64")
    grid["r_regionkey"] = grid["r_regionkey"].astype("int64")
    out = grid[["r_name", "o_orderpriority", "n"]]
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def union_by_name_activity(sf_dir: str) -> pa.Table:
    """Schema-drift UNION BY NAME: two sources with different column sets
    (purchase events carry value ticks; orders carry a priority) unified
    under one schema with null backfill — the query-level twin of the CDC
    engine's Arrow unify/backfill merge. Both branches stay distributed;
    the summary proves which columns each side populated."""

    def ev_branch(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["event_type"], "purchase"))
        n = t.num_rows
        return pa.table(
            {
                "entity_id": t["event_id"].cast(pa.int64()),
                "kind": pa.array(["event"] * n, pa.string()),
                "ticks": pa.array(
                    np.floor(t["value"].to_numpy() * 10000.0).astype(np.int64)
                ),
                "priority": pa.nulls(n, pa.string()),
            }
        )

    def ord_branch(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "entity_id": b["o_orderkey"].cast(pa.int64()),
                "kind": pa.array(["order"] * n, pa.string()),
                "ticks": pa.nulls(n, pa.int64()),
                "priority": b["o_orderpriority"],
            }
        )

    ev = _events(sf_dir, columns=["event_id", "event_type", "value"]).map_batches(
        ev_branch, batch_format="pyarrow"
    )
    orders = _read_sized(
os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority"],
    ).map_batches(ord_branch, batch_format="pyarrow")

    def summarize(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "kind": b["kind"].to_numpy(zero_copy_only=False),
                "has_ticks": pc.is_valid(b["ticks"]).to_numpy(zero_copy_only=False),
                "ticks0": pc.fill_null(b["ticks"], 0).to_numpy(),
                "has_prio": pc.is_valid(b["priority"]).to_numpy(
                    zero_copy_only=False
                ),
            }
        )
        return pa.Table.from_pandas(
            df.groupby("kind", as_index=False).agg(
                n=("kind", "size"),
                n_ticks=("has_ticks", "sum"),
                sum_ticks=("ticks0", "sum"),
                n_priority=("has_prio", "sum"),
            ),
            preserve_index=False,
        )

    part = (
        ev.union(orders).map_batches(summarize, batch_format="pyarrow").to_pandas()
    )
    out = part.groupby("kind", as_index=False).agg(
        n=("n", "sum"),
        n_ticks=("n_ticks", "sum"),
        sum_ticks=("sum_ticks", "sum"),
        n_priority=("n_priority", "sum"),
    )
    for c in ("n", "n_ticks", "sum_ticks", "n_priority"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


# ---------------------------------------------------------------------------
# round-2 widening, batch 11
# ---------------------------------------------------------------------------


def percent_rank_orders(sf_dir: str) -> pa.Table:
    """Exact distributed RANK() (ties = min rank) of order price within each
    order priority — the percent-rank/rank family the reference's SQL spikes
    express with window functions (sql/: row_number patterns). Same plan as
    ``ntile_users_by_spend``: range-partition the composite (priority, tick)
    key with sampled boundaries (boundaries steer load only — equal keys
    always co-locate because searchsorted is deterministic), tiny per-range
    per-priority counts -> driver prefix -> broadcast offsets -> in-range
    vectorized min-rank via two searchsorteds. No global sort
    materialization; scales as two bounded exchanges."""
    import ray as _ray

    PRIO_SHIFT = np.int64(1) << np.int64(40)  # ticks < 2^40; composite key

    def partial(b: pa.Table) -> pa.Table:
        prio = b["o_orderpriority"].to_numpy(zero_copy_only=False)
        # priority strings sort lexically ('1-URGENT'..'5-LOW'); encode the
        # leading digit so the composite key orders exactly like
        # PARTITION BY o_orderpriority
        code = np.array([int(p[0]) for p in prio], dtype=np.int64)
        tick = np.floor(b["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "prio": pa.array(code),
                "tick": pa.array(tick),
                "ckey": pa.array(code * PRIO_SHIFT + tick),
            }
        )

    base = (
        _read_sized(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .materialize()
    )

    n_ranges = 16
    sample = base.random_sample(0.1, seed=11).limit(4096).to_pandas()
    if len(sample) >= n_ranges:
        keys = np.sort(sample["ckey"].to_numpy())
        bounds = keys[np.linspace(0, len(keys) - 1, n_ranges + 1).astype(int)][1:-1]
    else:
        bounds = np.array([], dtype=np.int64)
    bref = _ray.put(bounds)

    def assign_range(b: pa.Table) -> pa.Table:
        bs = _ray.get(bref)
        rng = (
            np.searchsorted(bs, b["ckey"].to_numpy(), side="left")
            if len(bs)
            else np.zeros(b.num_rows, np.int64)
        )
        return b.append_column("rng", pa.array(rng.astype(np.int64)))

    ranged = base.map_batches(assign_range, batch_format="pyarrow").materialize()

    cnt = (
        ranged.map_batches(
            lambda b: pa.Table.from_pandas(
                pd.DataFrame(
                    {"rng": b["rng"].to_numpy(), "prio": b["prio"].to_numpy()}
                )
                .groupby(["prio", "rng"], as_index=False)
                .size()
                .rename(columns={"size": "n"}),
                preserve_index=False,
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
        .groupby(["prio", "rng"], as_index=False)
        .agg(n=("n", "sum"))
        .sort_values(["prio", "rng"])
    )
    # rows of priority p in ranges strictly before r
    cnt["off"] = cnt.groupby("prio")["n"].cumsum() - cnt["n"]
    oref = _ray.put(
        {(int(p), int(r)): int(o) for p, r, o in zip(cnt["prio"], cnt["rng"], cnt["off"])}
    )

    def rank_range(g: pd.DataFrame) -> pd.DataFrame:
        offs = _ray.get(oref)
        rng = int(g["rng"].iloc[0])
        g = g.sort_values("ckey", kind="stable")
        keys = g["ckey"].to_numpy()
        prio = g["prio"].to_numpy()
        first_key = np.searchsorted(keys, keys, side="left")
        first_prio = np.searchsorted(prio, prio, side="left")
        prio_map = {int(p): offs[(int(p), rng)] for p in np.unique(prio)}
        off = np.array([prio_map[int(p)] for p in prio], dtype=np.int64)
        rk = off + (first_key - first_prio) + 1
        return pd.DataFrame(
            {
                "o_orderkey": g["o_orderkey"].astype("int64"),
                "rk": rk.astype("int64"),
            }
        )

    out = (
        ranged.groupby("rng").map_groups(rank_range, batch_format="pandas").to_pandas()
    )
    return pa.Table.from_pandas(
        out.sort_values("o_orderkey").reset_index(drop=True), preserve_index=False
    )


def followup_within_window(sf_dir: str, window_us: int = 3_600_000_000) -> pa.Table:
    """Time-constrained sequential pattern: for each 'view', was there a
    'purchase' by the same user within the next hour (inclusive both ends)?
    Per-user conversion counts. ONE user-hash bucket shuffle of the two
    event types only (filtered at the read); in-bucket a single
    merge_asof(direction='forward', tolerance) does all users at once —
    no per-user loop. The funnel operator's windowed cousin
    (reference routing has no analog; standard product-analytics op)."""

    def partial(b: pa.Table) -> pa.Table:
        m = pc.is_in(b["event_type"], value_set=pa.array(["view", "purchase"]))
        b = b.filter(m)
        tsu = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {
                "user_id": b["user_id"],
                "is_view": pc.equal(b["event_type"], "view"),
                "tsu": pa.array(tsu),
                "bucket": pa.array(_user_bucket(b["user_id"].to_numpy())),
            }
        )

    def convert_bucket(g: pd.DataFrame) -> pd.DataFrame:
        views = g[g["is_view"]].sort_values("tsu", kind="stable")
        purch = g[~g["is_view"]].sort_values("tsu", kind="stable")
        if len(views) == 0:
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype="int64"),
                 "n_views": pd.Series([], dtype="int64"),
                 "n_converted": pd.Series([], dtype="int64")}
            )
        m = pd.merge_asof(
            views[["user_id", "tsu"]],
            purch[["user_id", "tsu"]].rename(columns={"tsu": "p_tsu"}),
            left_on="tsu",
            right_on="p_tsu",
            by="user_id",
            direction="forward",
            tolerance=window_us,
            allow_exact_matches=True,
        )
        out = (
            m.assign(conv=m["p_tsu"].notna())
            .groupby("user_id", as_index=False)
            .agg(n_views=("conv", "size"), n_converted=("conv", "sum"))
        )
        return out.astype({"user_id": "int64", "n_views": "int64", "n_converted": "int64"})

    out = (
        _events(sf_dir, columns=["user_id", "event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(convert_bucket, batch_format="pandas")
        .to_pandas()
    )
    return pa.Table.from_pandas(
        out.sort_values("user_id").reset_index(drop=True), preserve_index=False
    )


def _edit_distance_pairs(a_texts, b_texts, k: int) -> np.ndarray:
    """Exact Levenshtein <= k for P pairs, vectorized across pairs within
    groups of equal left-length (so the terminal DP row is well-defined).
    Python iterates over string positions (O(maxlen) steps) and distinct
    lengths; all pair-wise work is numpy."""
    P = len(a_texts)
    dist = np.full(P, k + 1, np.int32)
    if P == 0:
        return dist
    la = np.array([len(a) for a in a_texts], np.int32)
    order = np.argsort(la, kind="stable")
    for la_val in np.unique(la):
        sel = order[la[order] == la_val]
        dist[sel] = _banded_lev_fixed_la(
            [a_texts[i] for i in sel], [b_texts[i] for i in sel], int(la_val), k
        )
    return dist


def _banded_lev_fixed_la(a_list, b_list, la: int, k: int) -> np.ndarray:
    """Banded DP where every left string has length la; right lengths may
    differ by <= k (else distance > k trivially). Vectorized across pairs."""
    P = len(a_list)
    lb = np.array([len(b) for b in b_list], np.int32)
    out = np.full(P, k + 1, np.int32)
    feasible = np.abs(lb - la) <= k
    if not feasible.any():
        return out
    idx = np.where(feasible)[0]
    a_sub = [a_list[i] for i in idx]
    b_sub = [b_list[i] for i in idx]
    lb_s = lb[idx]
    Q = len(idx)
    maxb = int(lb_s.max()) if Q else 0
    A = np.zeros((Q, max(la, 1)), np.uint32)
    B = np.zeros((Q, max(maxb, 1)), np.uint32)
    for i, s in enumerate(a_sub):
        if s:
            A[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), np.uint32)
    for i, s in enumerate(b_sub):
        if s:
            B[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), np.uint32)
    BIG = np.int32(k + 1)
    width = 2 * k + 1
    dp = np.full((Q, width), BIG, np.int32)
    for j in range(width):
        d = j - k
        if d >= 0:
            # row 0: distance = d insertions, only if column d exists for
            # the pair (d <= lb)
            dp[:, j] = np.where(d <= lb_s, np.minimum(d, int(BIG)), BIG)
    for i in range(1, la + 1):
        ndp = np.full((Q, width), BIG, np.int32)
        for j in range(width):
            col = i + (j - k)
            if col < 0 or col > maxb:
                continue
            best = np.full(Q, BIG, np.int32)
            if j + 1 < width:
                np.minimum(best, dp[:, j + 1] + 1, out=best)  # delete a[i-1]
            if j - 1 >= 0:
                np.minimum(best, ndp[:, j - 1] + 1, out=best)  # insert b[col-1]
            if col >= 1:
                achar = A[:, i - 1]
                bcol = np.minimum(col - 1, B.shape[1] - 1)
                bchar = B[:, bcol]
                ok = col - 1 < lb_s
                mism = np.where(ok & (achar == bchar), 0, 1).astype(np.int32)
                cand = np.where(ok, dp[:, j] + mism, BIG)
                np.minimum(best, cand, out=best)
            # cells beyond a pair's own (la+1)x(lb+1) table do not exist
            valid_col = col <= lb_s
            ndp[:, j] = np.where(valid_col, np.minimum(best, BIG), BIG)
        dp = ndp
    # terminal cell: row la, column lb -> band offset lb - la + k
    off = lb_s - la + k
    ok = (off >= 0) & (off < width)
    res = np.full(Q, BIG, np.int32)
    res[ok] = dp[np.arange(Q)[ok], off[ok]]
    out[idx] = np.minimum(res, BIG)
    return out


def dedup_edit_distance(
    sf_dir: str,
    k: int = 8,
    prefix: int = 16,
    max_pairs_per_run: int = 1_000_000,
) -> pa.Table:
    """Edit-distance near-dup pairs with COMPOSITE blocking: candidates =
    doc pairs sharing the first ``prefix`` chars with |len diff| <= k;
    verified by exact banded Levenshtein <= k, vectorized ACROSS pairs
    (numpy DP, band 2k+1).

    Scale shape (round-2 verdict fix): the blocking key is
    ``(prefix, len // (k+1))`` — the length filter lives IN the key, so a
    boilerplate-heavy corpus ("Lorem ipsum...", templated headers) that
    puts millions of docs behind one 16-char prefix no longer produces one
    O(run^2) pair grid; equal-prefix docs split across length bands. Band
    width k+1 means a qualifying pair (|len diff| <= k) spans at most two
    adjacent bands, so each doc is also emitted as a GHOST into the next
    band: resident x resident covers within-band pairs, resident x ghost
    covers cross-band pairs, each exactly once (ghost x ghost pairs are
    the previous band's resident pairs). Semantically identical to the
    plain prefix block + length filter — banding only re-partitions the
    same candidate set.

    Backstop, never silent: a run (one (prefix, band) group) whose pair
    grid would exceed ``max_pairs_per_run`` degrades to length-ordered
    windowed pairing (each doc vs its nearest-in-length neighbors within
    the budget — within a band all lengths already differ <= k, so these
    are the likeliest true dups) and the dropped-candidate count is
    logged loudly per run."""

    from data_exchange_routing_ray.hashing import stable_hash_strings

    band_w = np.uint64(k + 1)
    mix = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 odd constant

    def partial(b: pa.Table) -> pa.Table:
        pref = pc.utf8_slice_codeunits(b["text"], 0, prefix)
        lens = pc.utf8_length(b["text"]).to_numpy().astype(np.uint64)
        band = lens // band_w
        h = stable_hash_strings(pref)
        n = len(band)

        def bucket_of(bd: np.ndarray) -> np.ndarray:
            return (((h ^ (bd * mix)) >> np.uint64(17)) % np.uint64(64)).astype(
                np.int64
            )

        # resident rows (own band) + ghost rows (next band up)
        return pa.table(
            {
                "doc_id": pa.concat_arrays(
                    [b["doc_id"].combine_chunks(), b["doc_id"].combine_chunks()]
                ),
                "text": pa.concat_arrays(
                    [b["text"].combine_chunks(), b["text"].combine_chunks()]
                ),
                "pref": pa.concat_arrays(
                    [pref.combine_chunks(), pref.combine_chunks()]
                ),
                "band": pa.array(
                    np.concatenate([band, band + np.uint64(1)]).astype(np.int64)
                ),
                "ghost": pa.array(
                    np.concatenate([np.zeros(n, np.int8), np.ones(n, np.int8)])
                ),
                "bucket": pa.array(
                    np.concatenate(
                        [bucket_of(band), bucket_of(band + np.uint64(1))]
                    )
                ),
            }
        )

    def pairs_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # ghosts sort AFTER residents within a run so resident indices are
        # the contiguous head of each run
        g = g.sort_values(["pref", "band", "ghost", "doc_id"], kind="stable")
        a_idx_all, b_idx_all = [], []
        ids = g["doc_id"].to_numpy()
        txt = g["text"].to_numpy()
        ghost = g["ghost"].to_numpy()
        lens = np.array([len(t) for t in txt], np.int64)
        # contiguous runs of equal (prefix, band) after the sort
        pref = g["pref"].to_numpy()
        band = g["band"].to_numpy()
        starts = np.flatnonzero(
            np.concatenate(
                ([True], (pref[1:] != pref[:-1]) | (band[1:] != band[:-1]))
            )
        )
        bounds = np.concatenate((starts, [len(g)]))
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            r = int(np.count_nonzero(ghost[s:e] == 0))  # residents first
            gh = (e - s) - r
            npairs = r * (r - 1) // 2 + r * gh
            if npairs == 0:
                continue
            if npairs <= max_pairs_per_run:
                # build exactly the counted pairs: resident×resident triu +
                # resident×ghost grid. NEVER materialize the full-run triu —
                # a run with few residents and many ghosts would allocate
                # the (uncounted) ghost×ghost grid before filtering it.
                ii, jj = np.triu_indices(r, 1)
                if gh:
                    ii = np.concatenate([ii, np.repeat(np.arange(r), gh)])
                    jj = np.concatenate(
                        [jj, np.tile(np.arange(r, e - s), r)]
                    )
            else:
                # capped fallback: sort the run by length, pair each doc
                # with its next W nearest-in-length neighbors
                order = np.argsort(lens[s:e], kind="stable")
                W = max(1, max_pairs_per_run // (e - s))
                ii_w, jj_w = [], []
                for w in range(1, W + 1):
                    ii_w.append(order[:-w])
                    jj_w.append(order[w:])
                ii = np.concatenate(ii_w)
                jj = np.concatenate(jj_w)
                gg = (ii >= r) & (jj >= r)
                ii, jj = ii[~gg], jj[~gg]
                dropped = npairs - len(ii)
                import logging

                logging.getLogger(__name__).warning(
                    "dedup_edit_distance: run of %d docs (prefix=%r band=%d) "
                    "capped at %d candidate pairs (window=%d): %d candidates "
                    "dropped",
                    e - s, pref[s][:16], band[s], len(ii), W, dropped,
                )
            keep = np.abs(lens[s + ii] - lens[s + jj]) <= k
            a_idx_all.append(s + ii[keep])
            b_idx_all.append(s + jj[keep])
        out_a = np.zeros(0, np.int64)
        out_b = np.zeros(0, np.int64)
        out_d = np.zeros(0, np.int64)
        if a_idx_all:
            ai = np.concatenate(a_idx_all)
            bi = np.concatenate(b_idx_all)
            if len(ai):
                d = _edit_distance_pairs(list(txt[ai]), list(txt[bi]), k)
                m = d <= k
                a_ids, b_ids = ids[ai[m]], ids[bi[m]]
                # canonical (low, high) ordering — resident/ghost pairing
                # does not guarantee id order the way pure triu did
                out_a = np.minimum(a_ids, b_ids)
                out_b = np.maximum(a_ids, b_ids)
                out_d = d[m].astype(np.int64)
        return pd.DataFrame(
            {
                "doc_a": pd.Series(out_a, dtype="int64"),
                "doc_b": pd.Series(out_b, dtype="int64"),
                "dist": pd.Series(out_d, dtype="int64"),
            }
        )

    out = (
        _documents(sf_dir, columns=["doc_id", "text"], min_blocks=64)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs_bucket, batch_format="pandas")
        .to_pandas()
    )
    return pa.Table.from_pandas(
        out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True),
        preserve_index=False,
    )


def label_centroids(sf_dir: str) -> pa.Table:
    """Per-label embedding centroid as EXACT integer partials: each
    embedding element becomes a tick (floor(float64(e) * 1e4)), per-batch
    (label, dim) tick sums + counts are the mergeable combiner, and only
    the tiny |labels| x dims partial table ever leaves the workers. This is
    the distributed-mean building block k-means/IVF use, made
    oracle-checkable (float centroids are derived client-side as
    sum_tick / n_vecs). Zero shuffle of vectors."""

    def partial(b: pa.Table) -> pa.Table:
        from data_exchange_routing_ray.functions.similarity import list_col_matrix

        vecs = list_col_matrix(b["embedding"])
        ticks = np.floor(vecs * 10000.0).astype(np.int64)
        labels = b["label"].to_numpy().astype(np.int64)
        order = np.argsort(labels, kind="stable")
        lab_sorted = labels[order]
        uniq, starts = np.unique(lab_sorted, return_index=True)
        sums = np.add.reduceat(ticks[order], starts, axis=0)
        counts = np.diff(np.append(starts, len(lab_sorted)))
        d = ticks.shape[1]
        return pa.table(
            {
                "label": pa.array(np.repeat(uniq, d)),
                "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), len(uniq))),
                "n_vecs": pa.array(np.repeat(counts.astype(np.int64), d)),
                "sum_tick": pa.array(sums.reshape(-1)),
            }
        )

    part = (
        _embeddings(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    out = part.groupby(["label", "dim"], as_index=False).agg(
        n_vecs=("n_vecs", "sum"), sum_tick=("sum_tick", "sum")
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values(["label", "dim"]).reset_index(drop=True),
        preserve_index=False,
    )


def weighted_median_price(sf_dir: str) -> pa.Table:
    """Exact weighted median (lower median: smallest v with 2*cumweight >=
    total) of lineitem price ticks weighted by quantity ticks, per return
    flag. Plan: per-batch (flag, price_tick)->weight partials; coarse
    price-range weight totals let the driver locate the ONE range holding
    each flag's median (small table prefix); only that range's exact
    histogram is folded — the full per-tick histogram never gathers to the
    driver, so the plan survives price domains with 10^8 distinct ticks."""
    import ray as _ray

    N_RANGES = 64
    RANGE_W = (1 << 26)  # price ticks < ~6e7 at any sf; 64 coarse ranges

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "f": b["l_returnflag"].to_numpy(zero_copy_only=False),
                "v": np.floor(b["l_extendedprice"].to_numpy() * 100.0).astype(
                    np.int64
                ),
                "w": np.floor(b["l_quantity"].to_numpy() * 100.0).astype(np.int64),
            }
        )
        g = df.groupby(["f", "v"], as_index=False).agg(w=("w", "sum"))
        g["rng"] = g["v"] // RANGE_W
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = (
        _read_sized(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_returnflag", "l_extendedprice", "l_quantity"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .materialize()
    )

    coarse = (
        hist.map_batches(
            lambda b: pa.Table.from_pandas(
                pd.DataFrame(
                    {
                        "f": b["f"].to_numpy(zero_copy_only=False),
                        "rng": b["rng"].to_numpy(),
                        "w": b["w"].to_numpy(),
                    }
                )
                .groupby(["f", "rng"], as_index=False)
                .agg(w=("w", "sum")),
                preserve_index=False,
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
        .groupby(["f", "rng"], as_index=False)
        .agg(w=("w", "sum"))
        .sort_values(["f", "rng"])
    )
    coarse["cw"] = coarse.groupby("f")["w"].cumsum()
    totals = coarse.groupby("f", as_index=False).agg(tw=("w", "sum"))
    tmap = dict(zip(totals["f"], totals["tw"]))
    target = {}  # flag -> range containing the weighted median
    for f, grp in coarse.groupby("f"):
        need = tmap[f]  # 2*cw >= tw
        hit = grp[2 * grp["cw"] >= need].iloc[0]
        target[f] = (int(hit["rng"]), int(hit["cw"] - hit["w"]))  # weight before rng
    tref = _ray.put(target)

    def in_target(b: pa.Table) -> pa.Table:
        tg = _ray.get(tref)
        f = b["f"].to_numpy(zero_copy_only=False)
        rng = b["rng"].to_numpy()
        want = np.array([tg.get(x, (-1, 0))[0] for x in f], np.int64)
        return b.filter(pa.array(rng == want))

    fine = hist.map_batches(in_target, batch_format="pyarrow").to_pandas()
    fine = (
        fine.groupby(["f", "v"], as_index=False).agg(w=("w", "sum"))
        .sort_values(["f", "v"])
    )
    rows = []
    for f, grp in fine.groupby("f"):
        before = target[f][1]
        cw = before + grp["w"].cumsum().to_numpy()
        need = tmap[f]
        ix = int(np.argmax(2 * cw >= need))
        rows.append((f, int(grp["v"].to_numpy()[ix]), int(need)))
    out = pd.DataFrame(rows, columns=["l_returnflag", "wmedian_tick", "total_w"])
    return pa.Table.from_pandas(
        out.sort_values("l_returnflag").reset_index(drop=True), preserve_index=False
    )


def first_last_user_value(sf_dir: str) -> pa.Table:
    """FIRST_VALUE / LAST_VALUE per user ordered by (ts, event_id) as an
    ASSOCIATIVE combiner: each batch keeps only (argmin-key tick,
    argmax-key tick, count) per user, merges are the same min/max-by-key
    fold, ONE user-hash bucket reduce of per-user rows — raw events never
    shuffle. The window-function pair expressed as a mergeable aggregate."""

    def partial(b: pa.Table) -> pa.Table:
        tsu = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        df = pd.DataFrame(
            {
                "user_id": b["user_id"].to_numpy(),
                "tsu": tsu,
                "eid": b["event_id"].to_numpy(),
                "tick": np.floor(b["value"].to_numpy() * 10000.0).astype(np.int64),
            }
        )
        df = df.sort_values(["user_id", "tsu", "eid"], kind="stable")
        g = df.groupby("user_id", as_index=False)
        first = g.first()
        last = g.last()
        n = g.size()
        out = pd.DataFrame(
            {
                "user_id": first["user_id"],
                "f_tsu": first["tsu"],
                "f_eid": first["eid"],
                "first_tick": first["tick"],
                "l_tsu": last["tsu"],
                "l_eid": last["eid"],
                "last_tick": last["tick"],
                "n_events": n["size"],
            }
        )
        out["bucket"] = (
            out["user_id"].to_numpy().astype(np.uint64) * np.uint64(2654435761)
        ) % np.uint64(64)
        return pa.Table.from_pandas(out, preserve_index=False)

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "f_tsu", "f_eid"], kind="stable")
        first = g.groupby("user_id", as_index=False).first()[
            ["user_id", "first_tick"]
        ]
        g2 = g.sort_values(["user_id", "l_tsu", "l_eid"], kind="stable")
        last = g2.groupby("user_id", as_index=False).last()[["user_id", "last_tick"]]
        n = g.groupby("user_id", as_index=False).agg(n_events=("n_events", "sum"))
        out = first.merge(last, on="user_id").merge(n, on="user_id")
        return out.astype("int64")

    out = (
        _events(sf_dir, columns=["user_id", "event_id", "ts", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
        .to_pandas()
    )
    return pa.Table.from_pandas(
        out.sort_values("user_id").reset_index(drop=True), preserve_index=False
    )


# ---------------------------------------------------------------------------
# round-2 widening, batch 12
# ---------------------------------------------------------------------------


def spike_detect_hours(sf_dir: str) -> pa.Table:
    """Trailing-window anomaly detection (the alerting read the reference's
    ProcessingStatus/metrics side serves, fns-routing report sinks): flag
    (event_type, hour) cells whose count more than doubles the trailing
    24-observed-hour mean. Per-batch (type,hour) count partials bound the
    exchange by |types|x|hours| regardless of row count; the rolling sum is
    a cumsum difference inside each type bucket — no per-row window scan.
    Integer cross-multiply (n*24 > 2*trail_sum) avoids float division."""

    def partial(b: pa.Table) -> pa.Table:
        hour = (
            b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            // 3_600_000_000
        )
        df = (
            pd.DataFrame(
                {"event_type": b["event_type"].to_numpy(zero_copy_only=False),
                 "hour": hour}
            )
            .groupby(["event_type", "hour"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    def roll_type(g: pd.DataFrame) -> pd.DataFrame:
        g = (
            g.groupby(["event_type", "hour"], as_index=False)
            .agg(n=("n", "sum"))
            .sort_values("hour", kind="stable")
        )
        n = g["n"].to_numpy(np.int64)
        cum = np.concatenate([[0], np.cumsum(n)])
        idx = np.arange(len(n))
        lo = np.maximum(idx - 24, 0)
        trail = cum[idx] - cum[lo]          # sum over ROWS 24 PRECEDING..1 PRECEDING
        full = idx >= 24                    # window fully populated
        g["trail_sum"] = trail
        g["is_spike"] = ((n * 24 > 2 * trail) & full).astype(np.int64)
        g["n"] = g["n"].astype("int64")
        g["hour"] = g["hour"].astype("int64")
        return g[["event_type", "hour", "n", "trail_sum", "is_spike"]]

    out = (
        _events(sf_dir, columns=["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .map_groups(roll_type, batch_format="pandas")
        .to_pandas()
    )
    out["trail_sum"] = out["trail_sum"].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values(["event_type", "hour"]).reset_index(drop=True),
        preserve_index=False,
    )


def max_concurrent_intervals(sf_dir: str, n_ranges: int = 32) -> pa.Table:
    """Sweep-line max concurrency per event type: each event is an interval
    [ts, ts + (event_id%900+60)s); peak concurrency = max running sum of
    +1/-1 boundary points ordered by (time, delta) (ends before starts at
    ties => end-exclusive). Distributed as a two-pass prefix scan over
    range partitions of the composite (type, time, delta) key: sampled
    boundaries steer load only (equal keys always co-locate), per-range
    per-type delta totals -> driver prefix -> broadcast base offsets ->
    in-range vectorized cumsum + max -> tiny per-type max reduce. Raw
    points cross the wire once; no per-type skew because ranges split
    within a type."""
    import ray as _ray

    # distinct types via a tiny aggregate (5-ish rows)
    tset = (
        _events(sf_dir, columns=["event_type"])
        .groupby("event_type")
        .aggregate(Count(alias_name="n"))
        .to_pandas()["event_type"]
        .tolist()
    )
    code_of = {t: i for i, t in enumerate(sorted(tset))}
    types = sorted(tset)
    SHIFT = np.int64(1) << np.int64(54)  # epoch-us*4+delta < 2^54 through 2100

    def points(b: pa.Table) -> pa.Table:
        tsu = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        dur = (b["event_id"].to_numpy() % 900 + 60) * 1_000_000
        et = b["event_type"].to_numpy(zero_copy_only=False)
        code = pd.Series(et).map(code_of).to_numpy(np.int64)
        # delta encoded 0 (= -1, end) / 1 (= +1, start) so ends sort first
        start_key = code * SHIFT + tsu * 4 + 1
        end_key = code * SHIFT + (tsu + dur) * 4 + 0
        return pa.table(
            {
                "ckey": pa.array(np.concatenate([start_key, end_key])),
                "delta": pa.array(
                    np.concatenate(
                        [np.ones(len(tsu), np.int64), -np.ones(len(tsu), np.int64)]
                    )
                ),
            }
        )

    base = (
        _events(sf_dir, columns=["event_id", "event_type", "ts"])
        .map_batches(points, batch_format="pyarrow")
        .materialize()
    )

    sample = base.random_sample(0.05, seed=12).limit(8192).to_pandas()
    if len(sample) >= n_ranges:
        keys = np.sort(sample["ckey"].to_numpy())
        bounds = keys[np.linspace(0, len(keys) - 1, n_ranges + 1).astype(int)][1:-1]
    else:
        bounds = np.array([], dtype=np.int64)
    bref = _ray.put(bounds)

    def assign_range(b: pa.Table) -> pa.Table:
        bs = _ray.get(bref)
        rng = (
            np.searchsorted(bs, b["ckey"].to_numpy(), side="left")
            if len(bs)
            else np.zeros(b.num_rows, np.int64)
        )
        return b.append_column("rng", pa.array(rng.astype(np.int64)))

    ranged = base.map_batches(assign_range, batch_format="pyarrow").materialize()

    # pass 1: per-(range, type) delta totals — tiny (ranges x types)
    def totals(b: pa.Table) -> pa.Table:
        code = b["ckey"].to_numpy() // SHIFT
        df = (
            pd.DataFrame(
                {"rng": b["rng"].to_numpy(), "code": code,
                 "d": b["delta"].to_numpy()}
            )
            .groupby(["rng", "code"], as_index=False)
            .agg(d=("d", "sum"))
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    tot = (
        ranged.map_batches(totals, batch_format="pyarrow")
        .to_pandas()
        .groupby(["rng", "code"], as_index=False)
        .agg(d=("d", "sum"))
    )
    # driver prefix: concurrency entering each range, per type
    base_of: dict[tuple[int, int], int] = {}
    for code in range(len(types)):
        run = 0
        sub = tot[tot["code"] == code].sort_values("rng")
        totals_by_rng = dict(zip(sub["rng"], sub["d"]))
        for rng in range(n_ranges + 1):
            base_of[(rng, code)] = run
            run += int(totals_by_rng.get(rng, 0))
    oref = _ray.put(base_of)

    # pass 2: in-range cumsum from the broadcast base, per-type max
    def range_max(g: pd.DataFrame) -> pd.DataFrame:
        off = _ray.get(oref)
        g = g.sort_values("ckey", kind="stable")
        code = (g["ckey"].to_numpy() // SHIFT).astype(np.int64)
        rng = int(g["rng"].iloc[0])
        rows = []
        for c in np.unique(code):
            m = code == c
            run = np.cumsum(g["delta"].to_numpy()[m]) + off[(rng, int(c))]
            rows.append({"code": int(c), "mx": int(run.max())})
        return pd.DataFrame(rows)

    mx = (
        ranged.groupby("rng")
        .map_groups(range_max, batch_format="pandas")
        .to_pandas()
        .groupby("code", as_index=False)
        .agg(mx=("mx", "max"))
    )
    out = pd.DataFrame(
        {
            "event_type": [types[int(c)] for c in mx["code"]],
            "max_concurrency": mx["mx"].astype("int64"),
        }
    ).sort_values("event_type")
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


def profile_table_stats(sf_dir: str) -> pa.Table:
    """Per-column data-profiling pass (the validation/report stage a lake
    ingest runs before accepting a feed — reference's metadata verify +
    report sinks): null count, EXACT distinct count, min/max per column.
    Scalar stats are per-batch mergeable partials (one tiny row per batch
    per column); distinct counts shuffle only per-batch-DEDUPED
    (col, value) pairs through a hash-bucket exchange, so the wire cost is
    bounded by the distinct set, not the row count. Numerics are encoded as
    integer ticks rendered to strings so the oracle comparison is exact."""
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]

    def enc(b: pa.Table) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": b["event_id"].to_numpy(),
                "ts": b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
                "user_id": b["user_id"].to_numpy(),
                "event_type": b["event_type"].to_numpy(zero_copy_only=False),
                "value": np.floor(b["value"].to_numpy() * 10000.0).astype(np.int64),
                "props": b["props"].to_numpy(zero_copy_only=False),
            }
        )

    def scalar_partial(b: pa.Table) -> pa.Table:
        df = enc(b)
        rows = []
        for c in cols:
            s = df[c]
            rows.append(
                {
                    "col": c,
                    "n_null": int(s.isna().sum()),
                    "min_s": str(s.min()),
                    "max_s": str(s.max()),
                    "is_num": int(s.dtype != object),
                }
            )
        return pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)

    sc = (
        _events(sf_dir, columns=cols)
        .map_batches(scalar_partial, batch_format="pyarrow")
        .to_pandas()
    )

    def fold(g: pd.DataFrame) -> pd.Series:
        if g["is_num"].iloc[0]:
            mn = str(g["min_s"].astype(np.int64).min())
            mx = str(g["max_s"].astype(np.int64).max())
        else:
            mn, mx = g["min_s"].min(), g["max_s"].max()
        return pd.Series(
            {"n_null": int(g["n_null"].sum()), "min_s": mn, "max_s": mx}
        )

    scalar = sc.groupby("col").apply(fold, include_groups=False).reset_index()

    def distinct_partial(b: pa.Table) -> pa.Table:
        df = enc(b)
        frames = []
        for c in cols:
            v = df[c].dropna().astype(str).drop_duplicates()
            frames.append(pd.DataFrame({"col": c, "v": v}))
        out = pd.concat(frames, ignore_index=True)
        out["bucket"] = (
            pd.util.hash_array(out["v"].to_numpy(dtype=object)) % 64
        ).astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["col", "v"])
        return d.groupby("col", as_index=False).agg(n_distinct=("v", "size"))

    nd = (
        _events(sf_dir, columns=cols)
        .map_batches(distinct_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(count_bucket, batch_format="pandas")
        .to_pandas()
        .groupby("col", as_index=False)
        .agg(n_distinct=("n_distinct", "sum"))
    )

    out = scalar.merge(nd, on="col", how="left")
    out["n_distinct"] = out["n_distinct"].fillna(0).astype("int64")
    out["n_null"] = out["n_null"].astype("int64")
    out = out[["col", "n_null", "n_distinct", "min_s", "max_s"]]
    return pa.Table.from_pandas(
        out.sort_values("col").reset_index(drop=True), preserve_index=False
    )


def hive_pruned_read(sf_dir: str) -> pa.Table:
    """Partition-pruned lake read: write events hive-partitioned by
    event_type, then read back ONLY the 'click' and 'purchase' partitions
    via a path-level partition filter on read_parquet — the pruned
    directories never leave storage (prune-at-the-read discipline; at 100
    TB this is the difference between scanning 2/5 and 5/5 of the lake).
    Returns per-type counts + tick sums from the pruned read."""
    with tempfile.TemporaryDirectory(prefix="hiveprune-") as d:
        (
            _events(sf_dir, columns=["event_id", "event_type", "value"])
            .map_batches(
                lambda b: b.append_column(
                    "tick",
                    pa.array(
                        np.floor(b["value"].to_numpy() * 10000.0).astype(np.int64)
                    ),
                ).select(["event_id", "event_type", "tick"]),
                batch_format="pyarrow",
            )
            .write_parquet(d, partition_cols=["event_type"])
        )
        # hive-style dirs are Ray's default parquet partitioning; the path
        # filter prunes whole partition directories at file-listing time,
        # before any byte of the pruned partitions is read
        from ray.data.datasource.partitioning import (
            Partitioning,
            PathPartitionFilter,
        )

        keep = PathPartitionFilter.of(
            lambda kv: kv.get("event_type") in ("click", "purchase"),
            style="hive",
        )
        pruned = ray.data.read_parquet(
            d,
            partitioning=Partitioning("hive"),
            partition_filter=keep,
        )
        out = (
            pruned.groupby("event_type")
            .aggregate(Count(alias_name="n"), Sum("tick", alias_name="sum_tick"))
            .to_pandas()
        )
    out["n"] = out["n"].astype("int64")
    out["sum_tick"] = out["sum_tick"].astype("int64")
    out["event_type"] = out["event_type"].astype(str)
    return pa.Table.from_pandas(
        out.sort_values("event_type").reset_index(drop=True), preserve_index=False
    )


def doc_bigram_familiarity(sf_dir: str) -> pa.Table:
    """Per-document corpus-familiarity score: sum over the doc's bigrams of
    the GLOBAL bigram frequency (the count-based LM scoring stage — a
    quality signal that needs a mid-cardinality feature-attach join, not a
    broadcast: the bigram vocabulary is too big to ship to every worker).
    Plan: per-batch (doc, bigram, dn) + (bigram, gn) partials co-locate in
    ONE bigram-hash bucket exchange, global counts fold and attach
    in-bucket, then a doc-hash reduce sums dn*gn per doc. Integer exact."""

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b["text"], pattern=" ")
        flat = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        lens = np.asarray(pc.list_value_length(flat))
        words = np.asarray(pc.list_flatten(flat).to_numpy(zero_copy_only=False))
        doc = np.repeat(b["doc_id"].to_numpy(), lens)
        if len(words) == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "bigram": pa.array([], pa.string()),
                 "dn": pa.array([], pa.int64()),
                 "bucket": pa.array([], pa.int64())}
            )
        ends = np.cumsum(lens) - 1
        ok = np.ones(len(words), dtype=bool)
        ok[ends] = False
        keep = ok[:-1]
        bg = np.char.add(
            np.char.add(words[:-1][keep].astype(str), " "),
            words[1:][keep].astype(str),
        )
        df = (
            pd.DataFrame({"doc_id": doc[:-1][keep], "bigram": bg})
            .groupby(["doc_id", "bigram"], as_index=False)
            .size()
            .rename(columns={"size": "dn"})
        )
        df["bucket"] = (
            pd.util.hash_array(df["bigram"].to_numpy(dtype=object)) % 64
        ).astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False)

    def attach_bucket(g: pd.DataFrame) -> pd.DataFrame:
        gn = g.groupby("bigram", as_index=False).agg(gn=("dn", "sum"))
        m = g.merge(gn, on="bigram")
        m["part"] = m["dn"] * m["gn"]
        out = m.groupby("doc_id", as_index=False).agg(part=("part", "sum"))
        out["dbucket"] = (
            out["doc_id"].to_numpy().astype(np.uint64) * np.uint64(2654435761)
        ) % np.uint64(64)
        return out

    def doc_reduce(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("doc_id", as_index=False).agg(
            familiarity=("part", "sum")
        )
        out["familiarity"] = out["familiarity"].astype("int64")
        return out

    out = (
        _documents(sf_dir, columns=["doc_id", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(attach_bucket, batch_format="pandas")
        .groupby("dbucket")
        .map_groups(doc_reduce, batch_format="pandas")
        .to_pandas()[["doc_id", "familiarity"]]
    )
    return pa.Table.from_pandas(
        out.sort_values("doc_id").reset_index(drop=True), preserve_index=False
    )


# ---------------------------------------------------------------------------
# round-2 widening, batch 13
# ---------------------------------------------------------------------------


def fk_integrity_audit(sf_dir: str) -> pa.Table:
    """Referential-integrity audit over the star schema's FK edges (the
    conformance report a lake ingest emits before accepting a feed — the
    reference's metadata-verify + report-sink pairing applied to relational
    constraints). Per edge: child rows pre-aggregate per batch to
    (key, cnt) partials (wire bounded by the DISTINCT key set, not row
    count), parent keys dedup per batch, both sides co-partition in one
    bucket exchange, and each bucket emits a tiny orphan-count partial —
    parent key sets never leave the workers. The four independent edge
    pipelines run CONCURRENTLY from driver threads so they share the
    cluster instead of serializing four shuffles' fixed cost. n_checked is
    parquet-metadata ``count()`` (no scan)."""
    edges = [
        ("customer.c_nationkey->nation.n_nationkey",
         "customer", "c_nationkey", "nation", "n_nationkey"),
        ("lineitem.l_orderkey->orders.o_orderkey",
         "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders.o_custkey->customer.c_custkey",
         "orders", "o_custkey", "customer", "c_custkey"),
        ("supplier.s_nationkey->nation.n_nationkey",
         "supplier", "s_nationkey", "nation", "n_nationkey"),
    ]
    NB = 32

    def child_partial(key: str):
        def fn(b: pa.Table) -> pa.Table:
            k = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
            df = (
                pd.DataFrame({"key": k})
                .groupby("key", as_index=False)
                .size()
                .rename(columns={"size": "cnt"})
            )
            h = (
                df["key"].to_numpy().astype(np.uint64) * np.uint64(2654435761)
            ) % np.uint64(NB)
            df["bucket"] = h.astype(np.int64)
            df["side"] = np.int8(0)
            return pa.Table.from_pandas(df, preserve_index=False)

        return fn

    def parent_partial(key: str):
        def fn(b: pa.Table) -> pa.Table:
            k = np.unique(b[key].to_numpy(zero_copy_only=False).astype(np.int64))
            h = (k.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(NB)
            df = pd.DataFrame(
                {
                    "key": k,
                    "cnt": np.zeros(len(k), np.int64),
                    "bucket": h.astype(np.int64),
                }
            )
            df["side"] = np.int8(1)
            return pa.Table.from_pandas(df, preserve_index=False)

        return fn

    def orphans_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        child = g[g["side"] == 0]
        parent_keys = g.loc[g["side"] == 1, "key"].to_numpy()
        miss = ~child["key"].isin(parent_keys).to_numpy()
        return pd.DataFrame({"n_orphans": [int(child.loc[miss, "cnt"].sum())]})

    # build the lazy pipelines serially (read_parquet's filesystem resolve
    # is not thread-safe); only EXECUTION fans out to threads below.
    # Block count follows input BYTES (128 MB target): the sort shuffle's
    # fixed cost scales with the number of blocks entering it, so a 5 MB
    # dimension table must not inherit the session's default parallelism
    def _blocks(path: str) -> int:
        return max(4, os.path.getsize(path) // (128 << 20))

    plans = []
    for i, (_, child_t, child_k, parent_t, parent_k) in enumerate(edges):
        cpath = os.path.join(sf_dir, f"{child_t}.parquet")
        ppath = os.path.join(sf_dir, f"{parent_t}.parquet")
        child = ray.data.read_parquet(
            cpath, columns=[child_k], override_num_blocks=_blocks(cpath)
        )
        both = child.map_batches(
            child_partial(child_k), batch_format="pyarrow"
        ).union(
            ray.data.read_parquet(
                ppath, columns=[parent_k], override_num_blocks=_blocks(ppath)
            ).map_batches(parent_partial(parent_k), batch_format="pyarrow")
        )
        plans.append((i, child, both))

    def run_edge(plan) -> tuple[int, int, int]:
        i, child, both = plan
        n_checked = child.count()  # parquet-metadata pushdown, no scan
        n_orphans = int(
            both.groupby("bucket")
            .map_groups(orphans_in_bucket, batch_format="pandas")
            .to_pandas()["n_orphans"]
            .sum()
        )
        return i, n_checked, n_orphans

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(edges)) as pool:
        results = list(pool.map(run_edge, plans))

    rows = [
        {"fk": edges[i][0], "n_checked": n_checked, "n_orphans": n_orphans}
        for i, n_checked, n_orphans in results
    ]
    out = pd.DataFrame(rows).sort_values("fk").reset_index(drop=True)
    out["n_checked"] = out["n_checked"].astype("int64")
    out["n_orphans"] = out["n_orphans"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def daily_new_vs_returning(sf_dir: str) -> pa.Table:
    """Per-day active/new/returning user counts (the growth-accounting
    read behind every ingest dashboard). Wire cost is bounded by the
    DISTINCT (user, day) set, not the event count: per-batch dedup of
    (user, day) partials -> ONE user-hash bucket exchange (a user's whole
    history co-locates, so first-day is decidable in-bucket) -> per-day
    partial counts -> tiny day-key reduce."""

    def partial(b: pa.Table) -> pa.Table:
        day = (
            b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            // 86_400_000_000
        )
        df = (
            pd.DataFrame({"user_id": b["user_id"].to_numpy(), "day": day})
            .drop_duplicates()
        )
        df["bucket"] = (
            df["user_id"].to_numpy().astype(np.uint64) * np.uint64(2654435761)
        ) % np.uint64(64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def fold_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["user_id", "day"])
        first = d.groupby("user_id")["day"].transform("min")
        d = d.assign(is_new=(d["day"] == first).astype(np.int64))
        out = d.groupby("day", as_index=False).agg(
            n_active=("is_new", "size"), n_new=("is_new", "sum")
        )
        return out

    out = (
        _events(sf_dir, columns=["user_id", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold_bucket, batch_format="pandas")
        .groupby("day")
        .aggregate(
            Sum("n_active", alias_name="n_active"),
            Sum("n_new", alias_name="n_new"),
        )
        .to_pandas()
    )
    out["n_active"] = out["n_active"].astype("int64")
    out["n_new"] = out["n_new"].astype("int64")
    out["n_returning"] = (out["n_active"] - out["n_new"]).astype("int64")
    out["day"] = out["day"].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values("day").reset_index(drop=True), preserve_index=False
    )


def user_event_gini(sf_dir: str) -> pa.Table:
    """Per-user event-type concentration as EXACT integer Gini impurity:
    gini = 1 - sum_i (n_i/n)^2 emitted as the integer fraction
    (n^2 - sum n_i^2) / n^2 so the oracle comparison is exact (no float
    entropy drift). Per-batch (user, type) count partials -> user-hash
    bucket fold -> vectorized squares; exchange bounded by
    |users| x |types|."""

    def partial(b: pa.Table) -> pa.Table:
        df = (
            pd.DataFrame(
                {
                    "user_id": b["user_id"].to_numpy(),
                    "event_type": b["event_type"].to_numpy(zero_copy_only=False),
                }
            )
            .groupby(["user_id", "event_type"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        df["bucket"] = (
            df["user_id"].to_numpy().astype(np.uint64) * np.uint64(2654435761)
        ) % np.uint64(64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def fold_bucket(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["user_id", "event_type"], as_index=False).agg(n=("n", "sum"))
        per = c.groupby("user_id").agg(
            n_events=("n", "sum"), ssq=("n", lambda s: int((s.to_numpy() ** 2).sum()))
        )
        n = per["n_events"].to_numpy(np.int64)
        out = pd.DataFrame(
            {
                "user_id": per.index.to_numpy(),
                "n_events": n,
                "gini_num": n * n - per["ssq"].to_numpy(np.int64),
                "gini_den": n * n,
            }
        )
        return out

    out = (
        _events(sf_dir, columns=["user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold_bucket, batch_format="pandas")
        .to_pandas()
    )
    for c in ("n_events", "gini_num", "gini_den"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values("user_id").reset_index(drop=True), preserve_index=False
    )


def regression_sums_per_type(sf_dir: str) -> pa.Table:
    """Distributed simple-linear-regression state per event type: the five
    mergeable sums (n, Sx, Sy, Sxx, Sxy) of tick-encoded value (y) on
    hours-since-2024-01-01 (x). The sums ARE the distributed algorithm —
    slope/intercept are O(groups) driver arithmetic on exact integers
    (avoiding the catastrophic cancellation a float one-pass slope causes).
    x in [0, ~10^3] hours and y <= ~10^7 ticks keep Sxy < 2^62 up to
    ~10^9 rows per type; per-batch partials + a |types|-key reduce."""
    T0 = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in epoch-us

    def partial(b: pa.Table) -> pa.Table:
        x = (
            b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) - T0
        ) // 3_600_000_000
        y = np.floor(b["value"].to_numpy() * 10000.0).astype(np.int64)
        df = pd.DataFrame(
            {
                "event_type": b["event_type"].to_numpy(zero_copy_only=False),
                "n": np.ones(len(x), np.int64),
                "sum_x": x,
                "sum_y": y,
                "sum_xx": x * x,
                "sum_xy": x * y,
            }
        ).groupby("event_type", as_index=False).sum()
        return pa.Table.from_pandas(df, preserve_index=False)

    out = (
        _events(sf_dir, columns=["event_type", "ts", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_x", alias_name="sum_x"),
            Sum("sum_y", alias_name="sum_y"),
            Sum("sum_xx", alias_name="sum_xx"),
            Sum("sum_xy", alias_name="sum_xy"),
        )
        .to_pandas()
    )
    for c in ("n", "sum_x", "sum_y", "sum_xx", "sum_xy"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values("event_type").reset_index(drop=True), preserve_index=False
    )


def interval_overlap_counts(sf_dir: str) -> pa.Table:
    """Per-user count of overlapping (click, purchase) interval pairs —
    the interval-overlap join (sessions x campaigns shape) WITHOUT pairwise
    expansion: inside each user-hash bucket, purchase starts and ends are
    sorted once into composite (user-code, time-offset) key arrays and
    every click answers with two ``np.searchsorted`` probes
    (#starts < click_end  minus  #ends <= click_start, the standard
    interval-stabbing identity for half-open intervals). Cost is
    O((C+P) log P) per bucket, all C-vectorized; composite keys use
    bucket-local dense user codes x bucket-local time offsets (documented
    capacity: users-per-bucket x time-span-us < 2^63, so num_buckets
    scales with the user count)."""

    def tag(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        m = (et == "click") | (et == "purchase")
        if not m.any():
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "is_click": pa.array([], pa.int8()),
                    "s": pa.array([], pa.int64()),
                    "e": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64()),
                }
            )
        tsu = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)[m]
        dur = (b["event_id"].to_numpy()[m] % 900 + 60) * 1_000_000
        uid = b["user_id"].to_numpy()[m]
        return pa.table(
            {
                "user_id": pa.array(uid),
                "is_click": pa.array((et[m] == "click").astype(np.int8)),
                "s": pa.array(tsu),
                "e": pa.array(tsu + dur),
                "bucket": pa.array(
                    (
                        uid.astype(np.uint64) * np.uint64(2654435761)
                    ).astype(np.uint64)
                    % np.uint64(64)
                ),
            }
        )

    def bucket_count(g: pd.DataFrame) -> pd.DataFrame:
        codes, _ = pd.factorize(g["user_id"], sort=True)
        t0 = int(min(g["s"].min(), g["e"].min()))
        span = int(max(g["s"].max(), g["e"].max())) - t0 + 2
        ckey = codes.astype(np.int64) * np.int64(span)
        is_click = g["is_click"].to_numpy(np.bool_)
        ps = np.sort(ckey[~is_click] + (g["s"].to_numpy()[~is_click] - t0))
        pe = np.sort(ckey[~is_click] + (g["e"].to_numpy()[~is_click] - t0))
        ck = ckey[is_click]
        cs = ck + (g["s"].to_numpy()[is_click] - t0)
        ce = ck + (g["e"].to_numpy()[is_click] - t0)
        # overlap([cs,ce), [ps,pe)) <=> ps < ce AND cs < pe, within user:
        # count = #(user purchases with start < ce) - #(with end <= cs);
        # the composite key confines both probes to the user's segment
        # because time offsets are < span
        n = (
            np.searchsorted(ps, ce, side="left")
            - np.searchsorted(ps, ck, side="left")
        ) - (
            np.searchsorted(pe, cs, side="right")
            - np.searchsorted(pe, ck, side="left")
        )
        df = pd.DataFrame({"user_id": g["user_id"].to_numpy()[is_click], "np": n})
        out = df.groupby("user_id", as_index=False).agg(
            n_clicks=("np", "size"), n_pairs=("np", "sum")
        )
        return out

    out = (
        _events(sf_dir, columns=["event_id", "user_id", "event_type", "ts"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_count, batch_format="pandas")
        .to_pandas()
    )
    out["n_clicks"] = out["n_clicks"].astype("int64")
    out["n_pairs"] = out["n_pairs"].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values("user_id").reset_index(drop=True), preserve_index=False
    )


# ---------------------------------------------------------------------------
# round-2 widening, batch 14
# ---------------------------------------------------------------------------


def cdc_patch_merge(sf_dir: str) -> pa.Table:
    """PARTIAL-update (patch) merge semantics: every change row carries only
    SOME columns (the others NULL) and the merged state keeps, per column
    independently, the value from the highest-seq non-null patch — the
    JSON-merge-patch flavor of CDC the reference's metadata overlay implies
    (RouteIngestedFile merges sparse metadata onto the stored envelope).
    Derivation (shared with the SQL oracle): seq = event_id, key =
    (conv_id, turn_idx) as in the main stream; text patched when
    event_id%3==0, tool when %3==1, role when %3==2.

    Distributed shape: a per-batch COMBINER keeps, per key, the best
    (max-seq non-null) candidate for each column plus max seq — so the
    exchange carries one row per (key, batch), not per event — then ONE
    key-hash bucket reduce applies the same fold. The fold is associative/
    commutative per column, which is what makes patch-merge streamable."""

    def derive(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy()
        uid = b["user_id"].to_numpy()
        conv = np.char.add(
            "conv-", np.char.zfill(uid.astype(np.int64).astype(str), 6)
        )
        m = eid % 3
        text = np.where(m == 0, np.char.add("e-", eid.astype(str)), None)
        tool = np.where(
            m == 1, b["event_type"].to_numpy(zero_copy_only=False), None
        )
        role = np.where(m == 2, np.where(eid % 2 == 0, "user", "assistant"), None)
        return pa.table(
            {
                "conv_id": pa.array(conv),
                "turn_idx": pa.array((eid % 25).astype(np.int32)),
                "seq": pa.array(eid.astype(np.int64)),
                "text": pa.array(text, pa.string()),
                "tool": pa.array(tool, pa.string()),
                "role": pa.array(role, pa.string()),
            }
        )

    # the combiner emits per-column (value, seq) pairs — a partial that
    # kept only its local winner value WITHOUT the seq could not be
    # re-merged correctly across batches
    def partial2(b: pa.Table) -> pa.Table:
        df = derive(b).to_pandas()
        df = df.sort_values("seq", kind="stable")
        keys = ["conv_id", "turn_idx"]
        out = df.groupby(keys, as_index=False).agg(last_seq=("seq", "max"))
        for col in ("text", "tool", "role"):
            nn = df[df[col].notna()]
            best = nn.groupby(keys, as_index=False).agg(
                **{col: (col, "last"), f"{col}_seq": ("seq", "max")}
            )
            out = out.merge(best, on=keys, how="left")
        h = pd.util.hash_array(out["conv_id"].to_numpy(dtype=object))
        out["bucket"] = ((h + out["turn_idx"].to_numpy()) % 64).astype("int64")
        for col in ("text", "tool", "role"):
            out[f"{col}_seq"] = out[f"{col}_seq"].fillna(-1).astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    def reduce2(g: pd.DataFrame) -> pd.DataFrame:
        keys = ["conv_id", "turn_idx"]
        out = g.groupby(keys, as_index=False).agg(last_seq=("last_seq", "max"))
        for col in ("text", "tool", "role"):
            nn = g[g[f"{col}_seq"] >= 0].sort_values(f"{col}_seq", kind="stable")
            best = nn.groupby(keys, as_index=False).agg(**{col: (col, "last")})
            out = out.merge(best, on=keys, how="left")
        return out

    out = (
        _events(sf_dir, columns=["event_id", "user_id", "event_type"])
        .map_batches(partial2, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(reduce2, batch_format="pandas")
        .to_pandas()
    )
    out["turn_idx"] = out["turn_idx"].astype("int32")
    out["last_seq"] = out["last_seq"].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
        preserve_index=False,
    )


def text_pattern_counts(sf_dir: str) -> pa.Table:
    """Per-source PII/pattern scan totals (the redaction pre-scan a corpus
    pipeline runs to size its scrubbing stage): counts of digit runs,
    capitalized tokens and the-stopword hits, all `pyarrow.compute`
    RE2 kernels (the same regex engine DuckDB uses, so counts are exactly
    comparable). Per-batch totals → |sources|-row reduce; nothing besides
    the tiny partial rows leaves the workers."""

    def partial(b: pa.Table) -> pa.Table:
        digit_runs = pc.count_substring_regex(b["text"], r"[0-9]+")
        cap_words = pc.count_substring_regex(b["text"], r"[A-Z][a-z]+")
        the_hits = pc.count_substring_regex(b["text"], r"\bthe\b")
        df = pd.DataFrame(
            {
                "source": b["source"].to_numpy(zero_copy_only=False),
                "n_docs": np.ones(b.num_rows, np.int64),
                "digit_runs": np.asarray(digit_runs).astype(np.int64),
                "cap_words": np.asarray(cap_words).astype(np.int64),
                "the_hits": np.asarray(the_hits).astype(np.int64),
            }
        ).groupby("source", as_index=False).sum()
        return pa.Table.from_pandas(df, preserve_index=False)

    out = (
        _documents(sf_dir, columns=["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("digit_runs", alias_name="digit_runs"),
            Sum("cap_words", alias_name="cap_words"),
            Sum("the_hits", alias_name="the_hits"),
        )
        .to_pandas()
    )
    for c in ("n_docs", "digit_runs", "cap_words", "the_hits"):
        out[c] = out[c].astype("int64")
    out["source"] = out["source"].astype(str)
    return pa.Table.from_pandas(
        out.sort_values("source").reset_index(drop=True), preserve_index=False
    )


def user_distinct_event_types(sf_dir: str) -> pa.Table:
    """Per-user sorted-distinct type SET as a canonical comma string plus
    set size — the distinct-collect aggregate (array_agg DISTINCT). Wire is
    bounded by |users|x|types|: per-batch dedup of (user, type) pairs, ONE
    user-hash exchange, in-bucket sort+join."""

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": b["user_id"].to_numpy(),
                "event_type": b["event_type"].to_numpy(zero_copy_only=False),
            }
        ).drop_duplicates()
        df["bucket"] = (
            df["user_id"].to_numpy().astype(np.uint64) * np.uint64(2654435761)
        ) % np.uint64(64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["user_id", "event_type"]).sort_values(
            ["user_id", "event_type"], kind="stable"
        )
        return d.groupby("user_id", as_index=False).agg(
            type_set=("event_type", ",".join), n_types=("event_type", "size")
        )

    out = (
        _events(sf_dir, columns=["user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    out["n_types"] = out["n_types"].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values("user_id").reset_index(drop=True), preserve_index=False
    )


def nearest_click_attribution(sf_dir: str) -> pa.Table:
    """Nearest-event attribution join: each purchase is attributed to the
    temporally CLOSEST click of the same user (|Δt|, either direction —
    stricter than backward-only as-of), tie-broken by smaller click id.
    Per-user-bucket shape: clicks sorted once per bucket; every purchase
    probes its insertion point with ``np.searchsorted`` and compares the
    two neighbors — O((C+P) log C), no pairwise expansion, all vectorized
    across users via composite (user-code × time-offset) keys. Equal-ts
    clicks pre-collapse to the min id (equal distance ⇒ that id wins)."""

    def tag(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        m = (et == "click") | (et == "purchase")
        tsu = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)[m]
        uid = b["user_id"].to_numpy()[m]
        return pa.table(
            {
                "user_id": pa.array(uid),
                "event_id": pa.array(b["event_id"].to_numpy()[m]),
                "is_click": pa.array((et[m] == "click").astype(np.int8)),
                "tsu": pa.array(tsu),
                "bucket": pa.array(
                    (uid.astype(np.uint64) * np.uint64(2654435761))
                    % np.uint64(64)
                ),
            }
        )

    def bucket_attr(g: pd.DataFrame) -> pd.DataFrame:
        codes, _ = pd.factorize(g["user_id"], sort=True)
        t0 = int(g["tsu"].min())
        span = int(g["tsu"].max()) - t0 + 2
        ckey = codes.astype(np.int64) * np.int64(span) + (
            g["tsu"].to_numpy() - t0
        )
        is_click = g["is_click"].to_numpy(np.bool_)
        cl = pd.DataFrame(
            {"k": ckey[is_click], "id": g["event_id"].to_numpy()[is_click]}
        )
        # equal-ts clicks collapse to min id (deterministic tie-break)
        cl = cl.groupby("k", as_index=False).agg(id=("id", "min")).sort_values("k")
        ck = cl["k"].to_numpy()
        cid = cl["id"].to_numpy()
        pk = ckey[~is_click]
        pid = g["event_id"].to_numpy()[~is_click]
        puser = g["user_id"].to_numpy()[~is_click]
        pcode = codes[~is_click].astype(np.int64)
        pos = np.searchsorted(ck, pk)
        lo = np.clip(pos - 1, 0, max(len(ck) - 1, 0))
        hi = np.clip(pos, 0, max(len(ck) - 1, 0))
        BIG = np.int64(2**62)
        if len(ck) == 0:
            return pd.DataFrame(
                {
                    "purchase_id": pd.Series(dtype="int64"),
                    "click_id": pd.Series(dtype="int64"),
                    "delta_us": pd.Series(dtype="int64"),
                }
            )
        # neighbor valid only within the same user's key segment
        seg_lo = pcode * np.int64(span)
        seg_hi = seg_lo + np.int64(span)
        d_lo = np.where(
            (ck[lo] >= seg_lo) & (ck[lo] < seg_hi) & (pos > 0),
            pk - ck[lo],
            BIG,
        )
        d_hi = np.where(
            (hi < len(ck)) & (ck[hi] >= seg_lo) & (ck[hi] < seg_hi)
            & (pos < len(ck)),
            ck[hi] - pk,
            BIG,
        )
        # pick smaller distance; ties -> smaller click id
        use_lo = (d_lo < d_hi) | (
            (d_lo == d_hi) & (cid[lo] < cid[hi])
        )
        best_d = np.where(use_lo, d_lo, d_hi)
        best_id = np.where(use_lo, cid[lo], cid[hi])
        ok = best_d < BIG
        return pd.DataFrame(
            {
                "purchase_id": pid[ok].astype(np.int64),
                "click_id": best_id[ok].astype(np.int64),
                "delta_us": best_d[ok].astype(np.int64),
            }
        )

    out = (
        _events(sf_dir, columns=["event_id", "user_id", "event_type", "ts"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_attr, batch_format="pandas")
        .to_pandas()
    )
    return pa.Table.from_pandas(
        out.sort_values("purchase_id").reset_index(drop=True),
        preserve_index=False,
    )


def revenue_share_within_region(sf_dir: str) -> pa.Table:
    """Ratio-to-parent analytics: every nation's share of its region's
    order revenue, exact to the tick. Facts flow through ONE broadcast
    dimension gather (cust→nation→region maps built once, ray.put'd) into
    per-(region, nation) integer tick partials; shares are driver
    arithmetic over the |nations| result — the two-level rollup never
    re-shuffles the fact table."""
    cust = pd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    )
    nat = pd.read_parquet(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    reg = pd.read_parquet(
        os.path.join(sf_dir, "region.parquet"), columns=["r_regionkey", "r_name"]
    )
    import ray as _ray

    # broadcast parallel Arrow arrays; per-batch lookup = index_in + take
    ref = _ray.put((
        pa.array(cust["c_custkey"].to_numpy(), pa.int64()),
        pa.array(cust["c_nationkey"].to_numpy(), pa.int64()),
    ))

    def partial(b: pa.Table) -> pa.Table:
        keys, vals = _ray.get(ref)
        idx = pc.index_in(b["o_custkey"], value_set=keys)
        tick = np.floor(b["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
        tb = pa.table({
            "nationkey": pc.take(vals, idx),
            "tick": pa.array(tick, pa.int64()),
        })
        g = tb.group_by("nationkey").aggregate(
            [("tick", "sum"), ("tick", "count")]
        )
        return pa.table({
            "nationkey": g["nationkey"],
            "revenue_ticks": g["tick_sum"],
            "n_orders": g["tick_count"].cast(pa.int64()),
        })

    per_nat = (
        _read_sized(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_custkey", "o_totalprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("nationkey")
        .aggregate(
            Sum("revenue_ticks", alias_name="revenue_ticks"),
            Sum("n_orders", alias_name="n_orders"),
        )
        .to_pandas()
    )
    per_nat = per_nat.merge(
        nat, left_on="nationkey", right_on="n_nationkey"
    ).merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    region_tot = per_nat.groupby("r_name")["revenue_ticks"].transform("sum")
    out = pd.DataFrame(
        {
            "r_name": per_nat["r_name"].astype(str),
            "n_name": per_nat["n_name"].astype(str),
            "revenue_ticks": per_nat["revenue_ticks"].astype("int64"),
            "n_orders": per_nat["n_orders"].astype("int64"),
            "share_bp": (
                per_nat["revenue_ticks"] * 10000 // region_tot
            ).astype("int64"),
        }
    )
    return pa.Table.from_pandas(
        out.sort_values(["r_name", "n_name"]).reset_index(drop=True),
        preserve_index=False,
    )


# ---------------------------------------------------------------------------
# round-2 widening, batch 15
# ---------------------------------------------------------------------------


def weighted_sample_topk(sf_dir: str, k: int = 500) -> pa.Table:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-ES): each order draws key = ln(u)/w with u a Knuth-hash
    uniform from its key and w = price ticks; the k largest keys form the
    sample. Deterministic hash ⇒ reproducible and parallelism-invariant;
    distributed as per-batch top-k partials (k rows per block cross the
    wire, never the table) + a driver merge of block winners — the
    standard distributed top-k, here keyed by the A-ES score."""
    M32 = np.uint64(0xFFFFFFFF)

    def partial(b: pa.Table) -> pa.Table:
        kk = b["o_orderkey"].to_numpy()
        w = np.floor(b["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
        h = (kk.astype(np.uint64) * np.uint64(2654435761)) & M32
        u = (h.astype(np.float64) + 1.0) / 4294967297.0  # (0,1], never 0
        key = np.log(u) / w.astype(np.float64)
        top = np.argsort(key)[::-1][:k]  # largest keys win
        return pa.table(
            {
                "o_orderkey": pa.array(kk[top].astype(np.int64)),
                "w_ticks": pa.array(w[top]),
                "aes_key": pa.array(key[top]),
            }
        )

    part = (
        _read_sized(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_totalprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    top = part.nlargest(k, "aes_key").drop(columns=["aes_key"])
    top["o_orderkey"] = top["o_orderkey"].astype("int64")
    top["w_ticks"] = top["w_ticks"].astype("int64")
    return pa.Table.from_pandas(
        top.sort_values("o_orderkey").reset_index(drop=True), preserve_index=False
    )


def duplicate_charge_flags(sf_dir: str, window_us: int = 3_600_000_000) -> pa.Table:
    """Duplicate-charge detector: for every purchase, how many OTHER
    purchases by the same user have the same amount tick within ±1 h —
    the fraud/idempotency scan an ingest runs on payment feeds. ONE
    (user, tick)-hash bucket exchange; inside a bucket all (user, tick)
    groups answer together: events sort once by composite (group-code ×
    time-offset) key and each event counts its window neighbors with two
    ``np.searchsorted`` probes minus itself — no pairwise expansion, no
    per-group Python loop."""

    def tag(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        m = et == "purchase"
        tick = np.floor(b["value"].to_numpy()[m] * 10000.0).astype(np.int64)
        uid = b["user_id"].to_numpy()[m]
        tsu = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)[m]
        h = (
            uid.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            + tick.astype(np.uint64) * np.uint64(2654435761)
        ) % np.uint64(64)
        return pa.table(
            {
                "event_id": pa.array(b["event_id"].to_numpy()[m]),
                "user_id": pa.array(uid),
                "tick": pa.array(tick),
                "tsu": pa.array(tsu),
                "bucket": pa.array(h.astype(np.int64)),
            }
        )

    def bucket_count(g: pd.DataFrame) -> pd.DataFrame:
        codes, _ = pd.factorize(
            pd.MultiIndex.from_arrays([g["user_id"], g["tick"]]), sort=True
        )
        t0 = int(g["tsu"].min())
        span = int(g["tsu"].max()) - t0 + 2 * window_us + 2
        key = codes.astype(np.int64) * np.int64(span) + (
            g["tsu"].to_numpy() - t0 + window_us
        )
        order = np.argsort(key, kind="stable")
        sk = key[order]
        lo = np.searchsorted(sk, key - window_us, side="left")
        hi = np.searchsorted(sk, key + window_us, side="right")
        n = hi - lo - 1  # window peers minus self; offsets keep the probe
        # inside this (user,tick) group because ±window never crosses span
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy().astype(np.int64),
                "n_dups": n.astype(np.int64),
            }
        )

    out = (
        _events(sf_dir, columns=["event_id", "user_id", "event_type", "value", "ts"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_count, batch_format="pandas")
        .to_pandas()
    )
    return pa.Table.from_pandas(
        out.sort_values("event_id").reset_index(drop=True), preserve_index=False
    )


def order_reconciliation_audit(sf_dir: str) -> pa.Table:
    """Cross-table reconciliation (the conformance report between a feed
    and its rollup): per order priority, classify every order by how far
    sum(lineitem price) strays from o_totalprice — within 25%, within 50%,
    or off. Lineitem pre-aggregates per batch (combiner), both fact tables
    co-partition in ONE bucket exchange, orders with no lineitems count as
    'off'; integer tick math end to end."""
    mix = np.uint64(0x9E3779B97F4A7C15)

    def prep_orders(b: pa.Table) -> pa.Table:
        kk = b["o_orderkey"].to_numpy()
        return pa.table(
            {
                "key": pa.array(kk.astype(np.int64)),
                "prio": b["o_orderpriority"].cast(pa.string()),
                "tot": pa.array(
                    np.floor(b["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
                ),
                "lsum": pa.array(np.zeros(len(kk), np.int64)),
                "side": pa.array(np.zeros(len(kk), np.int8), pa.int8()),
                "bucket": pa.array(
                    ((kk.astype(np.uint64) * mix) >> np.uint64(40)).astype(np.int64)
                    % 64
                ),
            }
        )

    def prep_items(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "key": b["l_orderkey"].to_numpy(),
                "t": np.floor(
                    b["l_extendedprice"].to_numpy() * 100.0
                ).astype(np.int64),
            }
        ).groupby("key", as_index=False).agg(lsum=("t", "sum"))
        kk = df["key"].to_numpy()
        return pa.table(
            {
                "key": pa.array(kk.astype(np.int64)),
                "prio": pa.nulls(len(df), pa.string()),
                "tot": pa.array(np.zeros(len(df), np.int64)),
                "lsum": pa.array(df["lsum"].to_numpy()),
                "side": pa.array(np.ones(len(df), np.int8), pa.int8()),
                "bucket": pa.array(
                    ((kk.astype(np.uint64) * mix) >> np.uint64(40)).astype(np.int64)
                    % 64
                ),
            }
        )

    def audit_bucket(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0][["key", "prio", "tot"]]
        li = g[g["side"] == 1].groupby("key", as_index=False).agg(
            lsum=("lsum", "sum")
        )
        j = o.merge(li, on="key", how="left")
        lsum = j["lsum"].fillna(-1).to_numpy(np.int64)  # no items -> off
        tot = j["tot"].to_numpy(np.int64)
        diff = np.abs(lsum - tot)
        w25 = (lsum >= 0) & (4 * diff <= tot)
        w50 = (lsum >= 0) & ~w25 & (2 * diff <= tot)
        df = pd.DataFrame(
            {
                "o_orderpriority": j["prio"],
                "n_orders": np.ones(len(j), np.int64),
                "n_within_25": w25.astype(np.int64),
                "n_within_50": w50.astype(np.int64),
                "n_off": (~(w25 | w50)).astype(np.int64),
            }
        )
        return df.groupby("o_orderpriority", as_index=False).sum()

    out = (
        _read_sized(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
        )
        .map_batches(prep_orders, batch_format="pyarrow")
        .union(
            _read_sized(
                os.path.join(sf_dir, "lineitem.parquet"),
                columns=["l_orderkey", "l_extendedprice"],
            ).map_batches(prep_items, batch_format="pyarrow")
        )
        .groupby("bucket")
        .map_groups(audit_bucket, batch_format="pandas")
        .to_pandas()
        .groupby("o_orderpriority", as_index=False)
        .sum()
    )
    for c in ("n_orders", "n_within_25", "n_within_50", "n_off"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values("o_orderpriority").reset_index(drop=True),
        preserve_index=False,
    )


def lake_final_role_counts(sf_dir: str) -> pa.Table:
    """Post-merge analytics over the COMMITTED lake (not the change
    stream): replay the standard stream through the full engine, then
    aggregate role balance per conversation from ``final_dataset()`` —
    the read path a downstream consumer of the lake uses (manifest →
    partition files → distributed aggregate)."""
    with tempfile.TemporaryDirectory(prefix="cdclake-") as d:
        lake = CDCLake(os.path.join(d, "lake"), num_partitions=16)
        lake.apply_changes(derived_change_stream(sf_dir), quarantine=False)

        def partial(b: pa.Table) -> pa.Table:
            role = b["role"].to_numpy(zero_copy_only=False)
            df = pd.DataFrame(
                {
                    "conv_id": b["conv_id"].to_numpy(zero_copy_only=False),
                    "n_user": (role == "user").astype(np.int64),
                    "n_assistant": (role == "assistant").astype(np.int64),
                    "n_turns": np.ones(b.num_rows, np.int64),
                }
            ).groupby("conv_id", as_index=False).sum()
            return pa.Table.from_pandas(df, preserve_index=False)

        out = (
            lake.final_dataset(columns=["conv_id", "role"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("conv_id")
            .aggregate(
                Sum("n_user", alias_name="n_user"),
                Sum("n_assistant", alias_name="n_assistant"),
                Sum("n_turns", alias_name="n_turns"),
            )
            .to_pandas()
        )
    for c in ("n_user", "n_assistant", "n_turns"):
        out[c] = out[c].astype("int64")
    out["conv_id"] = out["conv_id"].astype(str)
    return pa.Table.from_pandas(
        out.sort_values("conv_id").reset_index(drop=True), preserve_index=False
    )


# ------------------------------------------------------------- batch 16

def cdc_seq_gap_audit(sf_dir: str, width: int = 1000, drop_mod: int = 7) -> pa.Table:
    """Binlog sequence-gap audit (delivery-integrity check; the reference
    leans on Azure's per-blob ``sequencer`` token, HL7Message.kt:25, and
    never verifies continuity): a feed with every ``drop_mod``-th seq
    dropped is scanned for holes, reported as missing-count per
    fixed-width seq block. The per-batch combiner reduces raw rows to
    per-block (n, lo, hi) partials, so only a |stream|/width-row table
    crosses the wire (no raw-row shuffle); the driver reindexes over the
    global [lo, hi] domain — wholly-missing blocks included — with pure
    integer arithmetic."""

    def partial(b: pa.Table) -> pa.Table:
        seq = b["seq"].to_numpy()
        seq = seq[seq % drop_mod != 0]  # planted delivery loss
        df = pd.DataFrame({"block": seq // width, "n": np.ones(len(seq), np.int64),
                           "lo": seq, "hi": seq})
        g = df.groupby("block", as_index=False).agg(
            n=("n", "sum"), lo=("lo", "min"), hi=("hi", "max"))
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        derived_change_stream(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("block")
        .aggregate(Sum("n", alias_name="n"), Min("lo", alias_name="lo"),
                   Max("hi", alias_name="hi"))
        .to_pandas()
    )
    lo, hi = int(agg["lo"].min()), int(agg["hi"].max())
    blocks = np.arange(lo // width, hi // width + 1, dtype=np.int64)
    n = np.zeros(len(blocks), np.int64)
    n[agg["block"].to_numpy(dtype=np.int64) - blocks[0]] = agg["n"].to_numpy(
        dtype=np.int64)
    expected = (np.minimum(hi, (blocks + 1) * width - 1)
                - np.maximum(lo, blocks * width) + 1)
    miss = expected - n
    out = pd.DataFrame({"block": blocks, "n_missing": miss})
    out = out[out["n_missing"] > 0].reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def dedup_survivorship(sf_dir: str) -> pa.Table:
    """Golden-record survivorship (the MDM generalization of LWW; the
    reference's idempotent-overwrite D1 is the completeness-blind case):
    per (conv_id, turn_idx) the surviving row is the MOST COMPLETE one
    (non-null count over role/text/tool), ties broken by latest seq — so
    a trailing delete (all-null) never beats an earlier full record.
    Associative per-batch argmax combiner on the composite integer rank
    completeness * 2^40 + seq; one key-hash bucket exchange carries only
    per-key winners; per-completeness totals leave the buckets."""
    SHIFT = np.int64(1) << np.int64(40)

    def partial(b: pa.Table) -> pa.Table:
        comp = (
            b["role"].is_valid().to_numpy(zero_copy_only=False).astype(np.int64)
            + b["text"].is_valid().to_numpy(zero_copy_only=False).astype(np.int64)
            + b["tool"].is_valid().to_numpy(zero_copy_only=False).astype(np.int64)
        )
        df = pd.DataFrame(
            {
                "conv_id": b["conv_id"].to_numpy(zero_copy_only=False),
                "turn_idx": b["turn_idx"].to_numpy().astype(np.int64),
                "rank": comp * SHIFT + b["seq"].to_numpy(),
            }
        )
        idx = df.groupby(["conv_id", "turn_idx"], sort=False)["rank"].idxmax()
        w = df.loc[idx].reset_index(drop=True)
        uid = w["conv_id"].str[5:].astype(np.int64).to_numpy()
        w["bucket"] = ((uid.astype(np.uint64) * np.uint64(2654435761))
                       % np.uint64(64)).astype(np.int64)
        return pa.Table.from_pandas(w, preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        idx = g.groupby(["conv_id", "turn_idx"], sort=False)["rank"].idxmax()
        w = g.loc[idx]
        out = pd.DataFrame(
            {
                "completeness": (w["rank"] // int(SHIFT)).astype(np.int64),
                "n_keys": np.ones(len(w), np.int64),
                "sum_winner_seq": (w["rank"] % int(SHIFT)).astype(np.int64),
            }
        )
        return out.groupby("completeness", as_index=False).agg(
            n_keys=("n_keys", "sum"), sum_winner_seq=("sum_winner_seq", "sum"))

    out = (
        derived_change_stream(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .groupby("completeness")
        .aggregate(Sum("n_keys", alias_name="n_keys"),
                   Sum("sum_winner_seq", alias_name="sum_winner_seq"))
        .to_pandas()
    )
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return pa.Table.from_pandas(
        out.sort_values("completeness").reset_index(drop=True),
        preserve_index=False,
    )


def lake_partition_fingerprint(sf_dir: str) -> pa.Table:
    """Anti-entropy table checksum (the replica-repair primitive a second
    cluster runs to verify a copy of the exactly-once lake): per-partition
    order-insensitive fingerprint = sum of md5-derived 64-bit row digests
    mod 2^61-1 over the COMMITTED final state. Rows hash where they live
    (distributed md5 inside map_batches, same per-row C-speed idiom as
    add_md5_fingerprint); only 16-row digest partials per block reach the
    driver, which folds them with exact Python-int arithmetic. DuckDB's
    ``md5_number_lower`` equals ``int.from_bytes(md5[8:16], 'little')``,
    so the oracle computes the identical checksum."""
    import hashlib

    P = (1 << 61) - 1
    MASK = np.uint64(0xFFFFFFFF)

    def partial(b: pa.Table) -> pa.Table:
        conv = b["conv_id"].to_numpy(zero_copy_only=False)
        turn = b["turn_idx"].to_numpy()
        role = b["role"].to_numpy(zero_copy_only=False)
        text = b["text"].to_numpy(zero_copy_only=False)
        tool = b["tool"].to_numpy(zero_copy_only=False)
        h = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(
                        f"{c}|{t}|{r}|{x}|{o}".encode()).digest()[8:16], "little"
                ) % P
                for c, t, r, x, o in zip(conv, turn, role, text, tool)
            ),
            np.uint64,
            len(conv),
        )
        part = pd.Series(conv).str[5:].astype(np.int64).to_numpy() % 16
        rows = []
        for p in np.unique(part):
            v = h[part == p]
            # exact sum without uint64 overflow: two 32-bit lanes
            s = ((int(np.sum(v >> np.uint64(32), dtype=np.uint64)) << 32)
                 + int(np.sum(v & MASK, dtype=np.uint64))) % P
            rows.append((int(p), s))
        return pa.table(
            {"part": pa.array([r[0] for r in rows], pa.int64()),
             "fp": pa.array([r[1] for r in rows], pa.int64())}
        )

    with tempfile.TemporaryDirectory(prefix="cdclake-") as d:
        lake = CDCLake(os.path.join(d, "lake"), num_partitions=16)
        lake.apply_changes(derived_change_stream(sf_dir), quarantine=False)
        parts = (
            lake.final_dataset(
                columns=["conv_id", "turn_idx", "role", "text", "tool"])
            .map_batches(partial, batch_format="pyarrow")
            .to_pandas()
        )
    folded = {}
    for p, s in zip(parts["part"], parts["fp"]):
        folded[int(p)] = (folded.get(int(p), 0) + int(s)) % P
    out = pd.DataFrame(
        {"part": sorted(folded), "fingerprint": [folded[k] for k in sorted(folded)]}
    ).astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def user_ltv_power_buckets(sf_dir: str) -> pa.Table:
    """Log-scale (power-of-2) lifetime-value histogram: per-user total
    value ticks → bucket = bit_length(ticks) → user count per bucket.
    Per-batch (user, ticks) sum combiner, ONE user-hash bucket exchange
    folds exact totals; bucket edges via integer ``searchsorted`` against
    [1,2,4,...] (no float log2 — 2^k-1 vs 2^k can never misround); the
    final exchange carries ≤64 histogram rows."""
    pows = np.int64(1) << np.arange(63, dtype=np.int64)

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": b["user_id"].to_numpy(),
                "ticks": np.floor(b["value"].to_numpy() * 100.0).astype(np.int64),
            }
        ).groupby("user_id", as_index=False).agg(ticks=("ticks", "sum"))
        df["bucket"] = (
            (df["user_id"].to_numpy().astype(np.uint64) * np.uint64(2654435761))
            % np.uint64(64)
        ).astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        t = g.groupby("user_id")["ticks"].sum().to_numpy()
        bits = np.maximum(np.searchsorted(pows, t, side="right"), 1)
        u, n = np.unique(bits, return_counts=True)
        return pd.DataFrame({"bits": u.astype(np.int64), "n_users": n.astype(np.int64)})

    out = (
        _events(sf_dir, columns=["user_id", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .groupby("bits")
        .aggregate(Sum("n_users", alias_name="n_users"))
        .to_pandas()
    )
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return pa.Table.from_pandas(
        out.sort_values("bits").reset_index(drop=True), preserve_index=False
    )


def blob_path_hierarchy_rollup(sf_dir: str) -> pa.Table:
    """Folder-hierarchy usage report (M4 foldersToPath flavor over
    cdc_parse_urls' synthesized layout): blob counts per path prefix at
    depths 1..3. Prefix codes are pure arithmetic on event_id (e%5, e%7,
    e%2), so per-batch partials are ``np.bincount`` over a ≤110-prefix
    dense code domain — no string splitting anywhere, prefixes render
    once from lookup tables; only the tiny histogram crosses the wire."""
    p1 = np.array([f"c{a}" for a in range(5)], object)
    p2 = np.array([f"c{a}/f{b}" for a in range(5) for b in range(7)], object)
    p3 = np.array(
        [f"c{a}/f{b}/d{c}" for a in range(5) for b in range(7) for c in range(2)],
        object,
    )

    def partial(b: pa.Table) -> pa.Table:
        ev = b["event_id"].to_numpy()
        a, bb, c = ev % 5, ev % 7, ev % 2
        c1 = np.bincount(a, minlength=5)
        c2 = np.bincount(a * 7 + bb, minlength=35)
        c3 = np.bincount((a * 7 + bb) * 2 + c, minlength=70)
        return pa.table(
            {
                "depth": pa.array(
                    np.repeat(np.int64([1, 2, 3]), [5, 35, 70]), pa.int64()),
                "prefix": pa.array(np.concatenate([p1, p2, p3]), pa.string()),
                "n_blobs": pa.array(
                    np.concatenate([c1, c2, c3]).astype(np.int64), pa.int64()),
            }
        )

    out = (
        _events(sf_dir, columns=["event_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["depth", "prefix"])
        .aggregate(Sum("n_blobs", alias_name="n_blobs"))
        .to_pandas()
    )
    out = out[out["n_blobs"] > 0]
    out["n_blobs"] = out["n_blobs"].astype(np.int64)
    return pa.Table.from_pandas(
        out.sort_values(["depth", "prefix"]).reset_index(drop=True),
        preserve_index=False,
    )


# ------------------------------------------------------------- batch 17

def audience_overlap_matrix(sf_dir: str) -> pa.Table:
    """Audience-overlap matrix (the segment-intersection report behind
    route fan-out planning): for every ordered pair of event types, how
    many distinct users did BOTH. Per-user type-set as a BITMASK — the
    per-batch combiner ORs 5 indicator bits per user (groupby-max per
    bit, fully vectorized), ONE user-hash bucket exchange ORs partials,
    and only a ≤2^|types| mask histogram leaves each bucket; the driver
    expands the |types|² matrix from 32 counters. No |users|²-anything."""
    types = sorted(
        _events(sf_dir, columns=["event_type"])
        .unique("event_type")
    )
    t_index = {t: i for i, t in enumerate(types)}
    T = len(types)

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"user_id": b["user_id"].to_numpy()})
        code = np.array(
            [t_index[t] for t in b["event_type"].to_numpy(zero_copy_only=False)],
            np.int64,
        )
        for i in range(T):
            df[f"b{i}"] = (code == i).astype(np.int64)
        g = df.groupby("user_id", as_index=False).max()
        mask = np.zeros(len(g), np.int64)
        for i in range(T):
            mask |= g[f"b{i}"].to_numpy() << i
        out = pd.DataFrame({"user_id": g["user_id"], "mask": mask})
        out["bucket"] = (
            (out["user_id"].to_numpy().astype(np.uint64) * np.uint64(2654435761))
            % np.uint64(64)
        ).astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        m = g["mask"].to_numpy()
        agg = pd.DataFrame({"user_id": g["user_id"], "mask": m})
        bits = [
            ((agg["mask"].to_numpy() >> i) & 1) for i in range(T)
        ]
        df = pd.DataFrame({"user_id": agg["user_id"]})
        for i in range(T):
            df[f"b{i}"] = bits[i]
        gg = df.groupby("user_id", as_index=False).max()
        mask = np.zeros(len(gg), np.int64)
        for i in range(T):
            mask |= gg[f"b{i}"].to_numpy() << i
        counts = np.bincount(mask, minlength=1 << T)
        nz = np.nonzero(counts)[0]
        return pd.DataFrame(
            {"mask": nz.astype(np.int64), "n": counts[nz].astype(np.int64)}
        )

    hist = (
        _events(sf_dir, columns=["user_id", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .groupby("mask")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    counts = np.zeros(1 << T, np.int64)
    counts[hist["mask"].to_numpy(dtype=np.int64)] = hist["n"].to_numpy(
        dtype=np.int64)
    rows = []
    for a in range(T):
        for b in range(T):
            sel = sum(
                int(counts[m])
                for m in range(1 << T)
                if (m >> a) & 1 and (m >> b) & 1
            )
            rows.append((types[a], types[b], sel))
    return pa.table(
        {
            "type_a": pa.array([r[0] for r in rows], pa.string()),
            "type_b": pa.array([r[1] for r in rows], pa.string()),
            "n_users": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def trimmed_stats_per_type(sf_dir: str) -> pa.Table:
    """Exact rank-trimmed aggregate (robust mean's integer core): per
    event type, drop the bottom and top decile BY RANK and report kept
    count + kept tick sum. Value ticks live in a bounded integer domain
    (floor(value·100)), so per-(type, tick) count partials reduce to a
    histogram ≤ |types|×|domain| — the exchange never carries raw rows —
    and the driver slices exact rank positions [n//10, n−n//10) from
    cumulative counts. Tie-stable: equal ticks are interchangeable, so
    the positional sum is well-defined on both sides."""

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": b["event_type"].to_numpy(zero_copy_only=False),
                "tick": np.floor(b["value"].to_numpy() * 100.0).astype(np.int64),
                "n": np.ones(b.num_rows, np.int64),
            }
        ).groupby(["event_type", "tick"], as_index=False).agg(n=("n", "sum"))
        return pa.Table.from_pandas(df, preserve_index=False)

    hist = (
        _events(sf_dir, columns=["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "tick"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["event_type", "tick"])
    )
    rows = []
    for et, g in hist.groupby("event_type", sort=True):
        c = g["n"].to_numpy(dtype=np.int64)
        t = g["tick"].to_numpy(dtype=np.int64)
        n = int(c.sum())
        lo_pos, hi_pos = n // 10, n - n // 10
        cb = np.concatenate([[0], np.cumsum(c)[:-1]])
        kept = np.clip(np.minimum(cb + c, hi_pos) - np.maximum(cb, lo_pos), 0, None)
        rows.append((et, int(kept.sum()), int(np.dot(kept, t))))
    return pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "n_kept": pa.array([r[1] for r in rows], pa.int64()),
            "sum_ticks": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def emb_per_dim_stats(sf_dir: str) -> pa.Table:
    """Per-dimension corpus stats over a list<float> embedding column
    (the feature-drift profile a training pipeline runs per shard):
    n/sum/min/max of integer ticks per dimension. Each batch reshapes the
    flat Arrow list buffer to (rows, 64) ZERO-COPY and reduces along
    axis 0 — partials are 64 rows regardless of input size; ticks are
    floor(double(float32)·10^6), bit-identical to the DuckDB oracle's
    CAST-to-DOUBLE arithmetic."""
    DIM = 64

    def partial(b: pa.Table) -> pa.Table:
        col = b["embedding"].combine_chunks()
        flat = np.asarray(col.flatten(), dtype=np.float64)
        arr = flat.reshape(-1, DIM)
        ticks = np.floor(arr * 1_000_000.0).astype(np.int64)
        return pa.table(
            {
                "dim": pa.array(np.arange(1, DIM + 1, dtype=np.int64)),
                "n": pa.array(np.full(DIM, arr.shape[0], np.int64)),
                "sum_ticks": pa.array(ticks.sum(axis=0)),
                "min_tick": pa.array(ticks.min(axis=0)),
                "max_tick": pa.array(ticks.max(axis=0)),
            }
        )

    out = (
        _embeddings(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_ticks", alias_name="sum_ticks"),
            Min("min_tick", alias_name="min_tick"),
            Max("max_tick", alias_name="max_tick"),
        )
        .to_pandas()
    )
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return pa.Table.from_pandas(
        out.sort_values("dim").reset_index(drop=True), preserve_index=False
    )


def seasonality_profile(sf_dir: str) -> pa.Table:
    """Traffic seasonality profile: event counts per (type, ISO weekday,
    hour) — the capacity-planning heatmap. Arrow temporal kernels derive
    dow/hour vectorized; the per-batch combiner collapses to a ≤|types|
    ×7×24 cell table so the exchange is O(cells), not O(rows)."""

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": b["event_type"].to_numpy(zero_copy_only=False),
                "isodow": pc.day_of_week(
                    b["ts"], count_from_zero=False, week_start=1
                ).to_numpy(zero_copy_only=False).astype(np.int64),
                "hour": pc.hour(b["ts"]).to_numpy(zero_copy_only=False).astype(
                    np.int64),
                "n": np.ones(b.num_rows, np.int64),
            }
        ).groupby(["event_type", "isodow", "hour"], as_index=False).agg(
            n=("n", "sum"))
        return pa.Table.from_pandas(df, preserve_index=False)

    out = (
        _events(sf_dir, columns=["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "isodow", "hour"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    out["n"] = out["n"].astype(np.int64)
    return pa.Table.from_pandas(
        out.sort_values(["event_type", "isodow", "hour"]).reset_index(drop=True),
        preserve_index=False,
    )


def cdc_tombstone_stats(sf_dir: str) -> pa.Table:
    """Lake-hygiene report: per partition, how many keys are LIVE vs
    TOMBSTONED (last op = delete) in the change stream — the signal that
    drives compaction/vacuum scheduling. Associative per-batch latest-op
    argmax combiner (seq-ranked), ONE key-hash bucket exchange carrying
    per-key winners, per-partition counters out."""

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "conv_id": b["conv_id"].to_numpy(zero_copy_only=False),
                "turn_idx": b["turn_idx"].to_numpy().astype(np.int64),
                "seq": b["seq"].to_numpy(),
                "is_del": (
                    b["op"].to_numpy(zero_copy_only=False) == "delete"
                ).astype(np.int64),
            }
        )
        idx = df.groupby(["conv_id", "turn_idx"], sort=False)["seq"].idxmax()
        w = df.loc[idx].reset_index(drop=True)
        uid = w["conv_id"].str[5:].astype(np.int64).to_numpy()
        w["part"] = uid % 16
        w["bucket"] = (
            (uid.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(64)
        ).astype(np.int64)
        return pa.Table.from_pandas(w, preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        idx = g.groupby(["conv_id", "turn_idx"], sort=False)["seq"].idxmax()
        w = g.loc[idx]
        out = pd.DataFrame(
            {
                "part": w["part"].to_numpy(dtype=np.int64),
                "n_live": (1 - w["is_del"].to_numpy(dtype=np.int64)),
                "n_tombstoned": w["is_del"].to_numpy(dtype=np.int64),
            }
        )
        return out.groupby("part", as_index=False).sum()

    out = (
        derived_change_stream(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .groupby("part")
        .aggregate(Sum("n_live", alias_name="n_live"),
                   Sum("n_tombstoned", alias_name="n_tombstoned"))
        .to_pandas()
    )
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return pa.Table.from_pandas(
        out.sort_values("part").reset_index(drop=True), preserve_index=False
    )


# ------------------------------------------------------------- batch 18

def ship_latency_quartiles(sf_dir: str) -> pa.Table:
    """Order→ship latency quartiles per returnflag — the SLA report. A
    co-partitioned orderkey-bucket join attaches o_orderdate to each
    lineitem (no broadcast side at scale), day-latencies collapse to a
    bounded (flag, days) histogram inside the buckets, and the driver
    takes EXACT positional quartiles (0-indexed floor((n−1)·q) — the
    tie-stable rank arithmetic the trimmed aggregate uses) from
    cumulative counts; raw rows cross the wire exactly once."""
    mix = np.uint64(0x9E3779B97F4A7C15)

    def prep_orders(b: pa.Table) -> pa.Table:
        kk = b["o_orderkey"].to_numpy()
        return pa.table(
            {
                "key": pa.array(kk.astype(np.int64)),
                "day": pa.array(
                    b["o_orderdate"].to_numpy().astype("datetime64[D]")
                    .astype(np.int64)),
                "flag": pa.array(np.array([""] * len(kk), object), pa.string()),
                "side": pa.array(np.zeros(len(kk), np.int8), pa.int8()),
                "bucket": pa.array(
                    ((kk.astype(np.uint64) * mix) >> np.uint64(40)).astype(
                        np.int64) % 64),
            }
        )

    def prep_items(b: pa.Table) -> pa.Table:
        kk = b["l_orderkey"].to_numpy()
        return pa.table(
            {
                "key": pa.array(kk.astype(np.int64)),
                "day": pa.array(
                    b["l_shipdate"].to_numpy().astype("datetime64[D]")
                    .astype(np.int64)),
                "flag": b["l_returnflag"].cast(pa.string()),
                "side": pa.array(np.ones(len(kk), np.int8), pa.int8()),
                "bucket": pa.array(
                    ((kk.astype(np.uint64) * mix) >> np.uint64(40)).astype(
                        np.int64) % 64),
            }
        )

    def join_hist(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0]
        li = g[g["side"] == 1]
        m = li.merge(
            o[["key", "day"]].rename(columns={"day": "oday"}), on="key",
            how="inner")
        lat = (m["day"] - m["oday"]).astype(np.int64)
        out = pd.DataFrame({"flag": m["flag"], "days": lat,
                            "n": np.ones(len(m), np.int64)})
        return out.groupby(["flag", "days"], as_index=False).agg(n=("n", "sum"))

    hist = (
        _read_sized(os.path.join(sf_dir, "orders.parquet"),
                    columns=["o_orderkey", "o_orderdate"])
        .map_batches(prep_orders, batch_format="pyarrow")
        .union(
            _read_sized(os.path.join(sf_dir, "lineitem.parquet"),
                        columns=["l_orderkey", "l_shipdate", "l_returnflag"])
            .map_batches(prep_items, batch_format="pyarrow")
        )
        .groupby("bucket")
        .map_groups(join_hist, batch_format="pandas")
        .groupby(["flag", "days"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["flag", "days"])
    )
    rows = []
    for fl, g in hist.groupby("flag", sort=True):
        c = g["n"].to_numpy(dtype=np.int64)
        d = g["days"].to_numpy(dtype=np.int64)
        n = int(c.sum())
        cum = np.cumsum(c)
        qs = []
        for num in (1, 2, 3):
            pos = (num * (n - 1)) // 4  # 0-indexed exact rank
            qs.append(int(d[np.searchsorted(cum, pos + 1, side="left")]))
        rows.append((fl, n, qs[0], qs[1], qs[2]))
    return pa.table(
        {
            "l_returnflag": pa.array([r[0] for r in rows], pa.string()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "p25_days": pa.array([r[2] for r in rows], pa.int64()),
            "p50_days": pa.array([r[3] for r in rows], pa.int64()),
            "p75_days": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


def revenue_abc_classification(sf_dir: str) -> pa.Table:
    """ABC / Pareto revenue classes: customers sorted by revenue DESC are
    class A while cumulative share ≤80%, B ≤95%, else C. Per-customer
    ticks fold in a custkey-hash bucket exchange; the global ordered
    cumsum uses the two-pass prefix-scan shape (range-partition on
    (−rev, cust) sampled boundaries → per-range totals → driver prefix →
    in-range vectorized cumsum) — the sort exchange carries one row per
    CUSTOMER, never per order; class split by integer cross-multiply."""

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "cust": b["o_custkey"].to_numpy(),
                "rev": np.floor(b["o_totalprice"].to_numpy() * 100.0).astype(
                    np.int64),
            }
        ).groupby("cust", as_index=False).agg(rev=("rev", "sum"))
        df["bucket"] = (
            (df["cust"].to_numpy().astype(np.uint64) * np.uint64(2654435761))
            % np.uint64(64)
        ).astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("cust", as_index=False).agg(rev=("rev", "sum"))

    cust = (
        _read_sized(os.path.join(sf_dir, "orders.parquet"),
                    columns=["o_custkey", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
    )
    # global ordered prefix over (rev DESC, cust): range-partition into
    # R coarse rev-bands (rev is the leading key, band = rev >> shift so
    # ordering is preserved band-to-band), per-band totals to the driver,
    # broadcast base offsets, in-band exact cumsum
    bands = cust.map_batches(
        lambda b: pa.table(
            {
                "cust": b["cust"],
                "rev": b["rev"],
                "band": pa.array(
                    (np.int64(63)
                     - (b["rev"].to_numpy() >> np.int64(18))).clip(0, 63)
                    .astype(np.int64)),
            }
        ),
        batch_format="pyarrow",
    )

    def band_stat(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            [{
                "band": int(g["band"].iloc[0]),
                "n": len(g),
                "rev": int(g["rev"].sum()),
            }]
        )

    totals = (
        bands.groupby("band").map_groups(band_stat, batch_format="pandas")
        .to_pandas().sort_values("band")
    )
    tot = int(totals["rev"].sum())
    base = {}
    run = 0
    for _, r in totals.iterrows():
        base[int(r["band"])] = run
        run += int(r["rev"])

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["rev", "cust"], ascending=[False, True])
        cum = base[int(g["band"].iloc[0])] + g["rev"].cumsum()
        cls = np.where(
            5 * cum <= 4 * tot, "A", np.where(20 * cum <= 19 * tot, "B", "C"))
        out = pd.DataFrame(
            {"abc": cls, "n_customers": np.ones(len(g), np.int64),
             "sum_ticks": g["rev"].to_numpy()})
        return out.groupby("abc", as_index=False).agg(
            n_customers=("n_customers", "sum"), sum_ticks=("sum_ticks", "sum"))

    out = (
        bands.groupby("band").map_groups(classify, batch_format="pandas")
        .groupby("abc")
        .aggregate(Sum("n_customers", alias_name="n_customers"),
                   Sum("sum_ticks", alias_name="sum_ticks"))
        .to_pandas()
    )
    out["n_customers"] = out["n_customers"].astype(np.int64)
    out["sum_ticks"] = out["sum_ticks"].astype(np.int64)
    return pa.Table.from_pandas(
        out.sort_values("abc").reset_index(drop=True), preserve_index=False
    )


def benford_profile_by_type(sf_dir: str) -> pa.Table:
    """Leading-digit (Benford) profile per event type — the classic
    synthetic-data / fraud smell test. Exact integer digit extraction via
    ``searchsorted`` against powers of 10 (no float log10: 10^k never
    misrounds); per-batch partials over a ≤|types|×9 cell domain."""
    pows10 = np.int64(10) ** np.arange(19, dtype=np.int64)

    def partial(b: pa.Table) -> pa.Table:
        t = np.floor(b["value"].to_numpy() * 100.0).astype(np.int64)
        exp = np.searchsorted(pows10, t, side="right") - 1
        digit = t // pows10[exp]
        df = pd.DataFrame(
            {
                "event_type": b["event_type"].to_numpy(zero_copy_only=False),
                "digit": digit.astype(np.int64),
                "n": np.ones(len(t), np.int64),
            }
        ).groupby(["event_type", "digit"], as_index=False).agg(n=("n", "sum"))
        return pa.Table.from_pandas(df, preserve_index=False)

    out = (
        _events(sf_dir, columns=["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "digit"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    for c in ("digit", "n"):
        out[c] = out[c].astype(np.int64)
    return pa.Table.from_pandas(
        out.sort_values(["event_type", "digit"]).reset_index(drop=True),
        preserve_index=False,
    )


def user_interarrival_power_histogram(sf_dir: str) -> pa.Table:
    """Inter-arrival-time profile (the ingest capacity signal): per-user
    event gaps in µs, bucketed into power-of-2 bands. ONE user-hash
    bucket exchange; in-bucket composite sort (user, ts, event_id) makes
    LAG a boundary-masked ``np.diff``; integer searchsorted bit-length
    (no float log2); only the ≤64-row band histogram leaves buckets."""
    pows = np.int64(1) << np.arange(63, dtype=np.int64)

    def tag(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b["user_id"],
                "tsu": pa.array(
                    b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)),
                "event_id": b["event_id"],
                "bucket": pa.array(
                    (
                        (b["user_id"].to_numpy().astype(np.uint64)
                         * np.uint64(2654435761)) % np.uint64(64)
                    ).astype(np.int64)),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "tsu", "event_id"])
        u = g["user_id"].to_numpy()
        t = g["tsu"].to_numpy()
        gap = np.diff(t)
        same = u[1:] == u[:-1]
        gap = gap[same]
        bits = np.maximum(np.searchsorted(pows, gap, side="right"), 1)
        ub, n = np.unique(bits, return_counts=True)
        return pd.DataFrame({"bits": ub.astype(np.int64),
                             "n": n.astype(np.int64)})

    out = (
        _events(sf_dir, columns=["user_id", "ts", "event_id"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .groupby("bits")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return pa.Table.from_pandas(
        out.sort_values("bits").reset_index(drop=True), preserve_index=False
    )


def conv_turn_density_profile(sf_dir: str) -> pa.Table:
    """Conversation-length distribution of the FINAL state (the transcript
    corpus shape report): count-of-counts histogram of live turns per
    conversation. Latest-op argmax combiner (as the tombstone census),
    key-hash bucket fold; a conversation lives wholly in its bucket, so
    per-conv counts and the count-of-counts partial both resolve in-bucket
    — the final exchange carries ≤max_turns histogram rows."""

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "conv_id": b["conv_id"].to_numpy(zero_copy_only=False),
                "turn_idx": b["turn_idx"].to_numpy().astype(np.int64),
                "seq": b["seq"].to_numpy(),
                "is_del": (
                    b["op"].to_numpy(zero_copy_only=False) == "delete"
                ).astype(np.int64),
            }
        )
        idx = df.groupby(["conv_id", "turn_idx"], sort=False)["seq"].idxmax()
        w = df.loc[idx].reset_index(drop=True)
        uid = w["conv_id"].str[5:].astype(np.int64).to_numpy()
        w["bucket"] = (
            (uid.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(64)
        ).astype(np.int64)
        return pa.Table.from_pandas(w, preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        idx = g.groupby(["conv_id", "turn_idx"], sort=False)["seq"].idxmax()
        w = g.loc[idx]
        live = w[w["is_del"] == 0]
        per_conv = live.groupby("conv_id").size()
        ub, n = np.unique(per_conv.to_numpy(), return_counts=True)
        return pd.DataFrame({"n_turns": ub.astype(np.int64),
                             "n_convs": n.astype(np.int64)})

    out = (
        derived_change_stream(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .groupby("n_turns")
        .aggregate(Sum("n_convs", alias_name="n_convs"))
        .to_pandas()
    )
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return pa.Table.from_pandas(
        out.sort_values("n_turns").reset_index(drop=True), preserve_index=False
    )


# ------------------------------------------------------------- batch 19

def time_weighted_value_integral(sf_dir: str) -> pa.Table:
    """Time-weighted aggregate (the streaming step-function integral —
    billing/utilization semantics): each event's value tick is weighted
    by the seconds until the SAME user's next event. ONE user-hash bucket
    exchange; the in-bucket composite sort (user, ts, event_id) turns
    LEAD into a boundary-masked ``np.diff``; per-type (n, Σtick·dur,
    Σdur) partials leave the bucket, so the final reduce folds ≤64×|types|
    rows. Durations are integer SECONDS (µs // 10⁶) to keep the products
    inside int64 at 100 TB row counts."""

    def tag(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy()
        return pa.table(
            {
                "user_id": b["user_id"],
                "tsu": pa.array(
                    b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
                ),
                "event_id": b["event_id"],
                "event_type": b["event_type"],
                "tick": pa.array(
                    np.floor(b["value"].to_numpy() * 100.0).astype(np.int64)
                ),
                "bucket": pa.array(
                    (
                        (uid.astype(np.uint64) * np.uint64(2654435761))
                        % np.uint64(64)
                    ).astype(np.int64)
                ),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "tsu", "event_id"])
        u = g["user_id"].to_numpy()
        t = g["tsu"].to_numpy()
        same = u[1:] == u[:-1]
        dur = ((t[1:] - t[:-1]) // 1_000_000)[same]
        et = g["event_type"].to_numpy()[:-1][same]
        tick = g["tick"].to_numpy()[:-1][same]
        out = pd.DataFrame(
            {
                "event_type": et,
                "w": tick * dur,
                "d": dur,
                "one": np.ones(len(et), np.int64),
            }
        )
        return out.groupby("event_type", as_index=False).agg(
            n_intervals=("one", "sum"),
            sum_weighted_ticks=("w", "sum"),
            sum_dur_s=("d", "sum"),
        )

    out = (
        _events(sf_dir, columns=["user_id", "ts", "event_id", "event_type", "value"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .groupby("event_type")
        .aggregate(
            Sum("n_intervals", alias_name="n_intervals"),
            Sum("sum_weighted_ticks", alias_name="sum_weighted_ticks"),
            Sum("sum_dur_s", alias_name="sum_dur_s"),
        )
        .to_pandas()
    )
    for c in ("n_intervals", "sum_weighted_ticks", "sum_dur_s"):
        out[c] = out[c].astype(np.int64)
    return pa.Table.from_pandas(
        out.sort_values("event_type").reset_index(drop=True), preserve_index=False
    )


def conv_context_windows(
    sf_dir: str, window: int = 8, stride: int = 4
) -> pa.Table:
    """Sliding context-window assembly over final-state transcripts (the
    training-sample chunking step for long conversations): per conv, the
    live turns rank 0..n-1 by turn_idx and every window [s, s+W) for
    s = 0, stride, 2·stride… < n is digested — only (conv, win_start,
    n_turns, md5) leaves the bucket, never window text. Same latest-op
    argmax combiner + ONE conv-hash exchange as conv_transcript_assembly;
    window counts per conv are bounded by the turn cap, so the in-bucket
    enumeration is O(turns·W/stride)."""
    import hashlib

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "conv_id": b["conv_id"].to_numpy(zero_copy_only=False),
                "turn_idx": b["turn_idx"].to_numpy().astype(np.int64),
                "seq": b["seq"].to_numpy(),
                "role": b["role"].to_numpy(zero_copy_only=False),
                "text": b["text"].to_numpy(zero_copy_only=False),
                "op": b["op"].to_numpy(zero_copy_only=False),
            }
        )
        idx = df.groupby(["conv_id", "turn_idx"], sort=False)["seq"].idxmax()
        w = df.loc[idx].reset_index(drop=True)
        uid = w["conv_id"].str[5:].astype(np.int64).to_numpy()
        w["bucket"] = (
            (uid.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(64)
        ).astype(np.int64)
        return pa.Table.from_pandas(w, preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        idx = g.groupby(["conv_id", "turn_idx"], sort=False)["seq"].idxmax()
        w = g.loc[idx]
        live = w[w["op"] != "delete"].sort_values(["conv_id", "turn_idx"])
        rows = []
        for cid, cg in live.groupby("conv_id", sort=True):
            lines = cg["role"].str.cat(cg["text"], sep=": ").tolist()
            n = len(lines)
            for s in range(0, n, stride):
                chunk = lines[s : s + window]
                rows.append(
                    {
                        "conv_id": cid,
                        "win_start": np.int64(s),
                        "n_turns": np.int64(len(chunk)),
                        "digest": hashlib.md5(
                            "\n".join(chunk).encode()
                        ).hexdigest(),
                    }
                )
        return pd.DataFrame(
            rows, columns=["conv_id", "win_start", "n_turns", "digest"]
        )

    out = (
        derived_change_stream(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
        .sort_values(["conv_id", "win_start"])
        .reset_index(drop=True)
    )
    for c in ("win_start", "n_turns"):
        out[c] = out[c].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def lake_codec_tradeoff(sf_dir: str) -> pa.Table:
    """Storage-codec A/B for the lake's partition files: the SAME change
    rows written distributed (file-per-block) as uncompressed, snappy and
    zstd parquet; reports bytes on disk + ratio vs uncompressed. In-query
    gate: zstd ≤ snappy ≤ none. Rows-only (byte totals are layout-
    dependent); the ordering assertion is the contract."""
    sizes = {}
    with tempfile.TemporaryDirectory(prefix="codec-") as d:
        for codec in ("none", "snappy", "zstd"):
            out_dir = os.path.join(d, codec)
            derived_change_stream(sf_dir).write_parquet(
                out_dir, compression=codec if codec != "none" else "none"
            )
            sizes[codec] = sum(
                os.path.getsize(os.path.join(out_dir, f))
                for f in os.listdir(out_dir)
            )
    assert sizes["zstd"] <= sizes["snappy"] <= sizes["none"], sizes
    out = pd.DataFrame(
        {
            "codec": list(sizes),
            "total_bytes": np.array(list(sizes.values()), np.int64),
            "ratio_vs_none": np.round(
                np.array(list(sizes.values())) / sizes["none"], 4
            ),
        }
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def conv_prefix_dup_census(sf_dir: str) -> pa.Table:
    """Prefix-duplicate census over final-state tool sequences — the
    resumed-conversation dedup signal (conv A duplicated-then-continued
    as conv B ⇒ A's full sequence is a prefix of B's). Pair COUNTS are
    computed without enumerating pairs (a short shared prefix would
    explode quadratically): per (digest, len) the census needs only
    f = #convs whose FULL sequence has that digest and p = #longer convs
    sharing the prefix — prefix pairs = f·p, exact dups = C(f,2). Shape:
    distinct lengths are a tiny broadcast; one conv-hash exchange builds
    ≤|lengths| prefix digests per conv; one digest-hash exchange folds
    the census."""
    import hashlib

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "conv_id": b["conv_id"].to_numpy(zero_copy_only=False),
                "turn_idx": b["turn_idx"].to_numpy().astype(np.int64),
                "seq": b["seq"].to_numpy(),
                "tool": b["tool"].to_numpy(zero_copy_only=False),
                "op": b["op"].to_numpy(zero_copy_only=False),
            }
        )
        idx = df.groupby(["conv_id", "turn_idx"], sort=False)["seq"].idxmax()
        w = df.loc[idx].reset_index(drop=True)
        uid = w["conv_id"].str[5:].astype(np.int64).to_numpy()
        w["bucket"] = (
            (uid.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(64)
        ).astype(np.int64)
        return pa.Table.from_pandas(w, preserve_index=False)

    # pass 1: the distinct set of FULL conversation lengths (≤ turn cap)
    def len_partial(g: pd.DataFrame) -> pd.DataFrame:
        idx = g.groupby(["conv_id", "turn_idx"], sort=False)["seq"].idxmax()
        w = g.loc[idx]
        live = w[w["op"] != "delete"]
        return live.groupby("conv_id", as_index=False).size().rename(
            columns={"size": "n"}
        )[["n"]].drop_duplicates()

    base = (
        derived_change_stream(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .materialize()
    )
    lengths = sorted(
        base.groupby("bucket")
        .map_groups(len_partial, batch_format="pandas")
        .to_pandas()["n"]
        .unique()
        .tolist()
    )

    def digests(g: pd.DataFrame, lengths=tuple(lengths)) -> pd.DataFrame:
        idx = g.groupby(["conv_id", "turn_idx"], sort=False)["seq"].idxmax()
        w = g.loc[idx]
        live = w[w["op"] != "delete"].sort_values(["conv_id", "turn_idx"])
        rows = []
        for cid, cg in live.groupby("conv_id", sort=False):
            tools = cg["tool"].tolist()
            n = len(tools)
            for L in lengths:
                if L > n:
                    break
                d = hashlib.md5("\x1f".join(tools[:L]).encode()).hexdigest()
                rows.append((d, L, int(L == n), int(n > L)))
        out = pd.DataFrame(
            rows, columns=["d", "len", "is_full", "is_longer"]
        )
        if len(out):
            out["dbkt"] = (
                pd.util.hash_array(out["d"].to_numpy(object)) % 64
            ).astype(np.int64)
        else:
            out["dbkt"] = np.array([], np.int64)
        return out

    def census(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["d", "len"], as_index=False).agg(
            f=("is_full", "sum"), p=("is_longer", "sum")
        )
        agg["prefix_pairs"] = agg["f"] * agg["p"]
        agg["exact_dups"] = agg["f"] * (agg["f"] - 1) // 2
        return agg.groupby("len", as_index=False).agg(
            prefix_pairs=("prefix_pairs", "sum"), exact_dups=("exact_dups", "sum")
        )

    parts = (
        base.groupby("bucket")
        .map_groups(digests, batch_format="pandas")
        .groupby("dbkt")
        .map_groups(census, batch_format="pandas")
        .to_pandas()
    )
    out = (
        parts.groupby("len", as_index=False)
        .agg(prefix_pairs=("prefix_pairs", "sum"), exact_dups=("exact_dups", "sum"))
        .sort_values("len")
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def conv_transcript_assembly(sf_dir: str) -> pa.Table:
    """Ordered transcript reassembly (the reference's ordered-reassembly
    sink, `RouteIngestedFile.kt` block-list ordering, as a query): the
    FINAL live turns of each conversation, sorted by turn_idx, are
    concatenated 'role: text' and md5-digested so only (conv_id, n_turns,
    digest) leaves the bucket. Latest-op argmax combiner per batch → ONE
    conv-hash bucket exchange → whole conversation resolves in-bucket;
    the digest proves byte-exact ordered assembly against the SQL
    string_agg oracle without shipping transcripts."""
    import hashlib

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "conv_id": b["conv_id"].to_numpy(zero_copy_only=False),
                "turn_idx": b["turn_idx"].to_numpy().astype(np.int64),
                "seq": b["seq"].to_numpy(),
                "role": b["role"].to_numpy(zero_copy_only=False),
                "text": b["text"].to_numpy(zero_copy_only=False),
                "op": b["op"].to_numpy(zero_copy_only=False),
            }
        )
        idx = df.groupby(["conv_id", "turn_idx"], sort=False)["seq"].idxmax()
        w = df.loc[idx].reset_index(drop=True)
        uid = w["conv_id"].str[5:].astype(np.int64).to_numpy()
        w["bucket"] = (
            (uid.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(64)
        ).astype(np.int64)
        return pa.Table.from_pandas(w, preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        idx = g.groupby(["conv_id", "turn_idx"], sort=False)["seq"].idxmax()
        w = g.loc[idx]
        live = w[w["op"] != "delete"].sort_values(["conv_id", "turn_idx"])
        convs, counts, digests = [], [], []
        for cid, cg in live.groupby("conv_id", sort=True):
            txt = "\n".join(cg["role"].str.cat(cg["text"], sep=": "))
            convs.append(cid)
            counts.append(len(cg))
            digests.append(hashlib.md5(txt.encode()).hexdigest())
        return pd.DataFrame(
            {
                "conv_id": convs,
                "n_turns": np.array(counts, np.int64),
                "digest": digests,
            }
        )

    out = (
        derived_change_stream(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    return pa.Table.from_pandas(
        out.sort_values("conv_id").reset_index(drop=True), preserve_index=False
    )


def iqr_outlier_counts(sf_dir: str) -> pa.Table:
    """Tukey-fence outlier audit: per event type, exact positional
    quartiles on integer ticks (rank (n−1)//4+1 / 3(n−1)//4+1 — the
    repo-wide positional convention) define fences q1−1.5·IQR /
    q3+1.5·IQR; outliers are counted from the SAME bounded (type, tick)
    histogram — one pass over the data, the exchange never carries raw
    rows, and the driver classifies cumsum slices. Fence comparisons run
    in doubled-tick units (2t vs 2q±3·IQR) so nothing is ever float."""

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": b["event_type"].to_numpy(zero_copy_only=False),
                "tick": np.floor(b["value"].to_numpy() * 100.0).astype(np.int64),
                "n": np.ones(b.num_rows, np.int64),
            }
        ).groupby(["event_type", "tick"], as_index=False).agg(n=("n", "sum"))
        return pa.Table.from_pandas(df, preserve_index=False)

    hist = (
        _events(sf_dir, columns=["event_type", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "tick"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["event_type", "tick"])
    )
    rows = []
    for et, g in hist.groupby("event_type", sort=True):
        c = g["n"].to_numpy(dtype=np.int64)
        t = g["tick"].to_numpy(dtype=np.int64)
        n = int(c.sum())
        cum = np.cumsum(c)
        q1 = int(t[np.searchsorted(cum, (n - 1) // 4 + 1)])
        q3 = int(t[np.searchsorted(cum, (3 * (n - 1)) // 4 + 1)])
        iqr = q3 - q1
        out_mask = (2 * t < 2 * q1 - 3 * iqr) | (2 * t > 2 * q3 + 3 * iqr)
        rows.append((et, n, int(c[out_mask].sum()), q1, q3))
    return pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "n_total": pa.array([r[1] for r in rows], pa.int64()),
            "n_outliers": pa.array([r[2] for r in rows], pa.int64()),
            "q1_tick": pa.array([r[3] for r in rows], pa.int64()),
            "q3_tick": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


def join_cardinality_stats(sf_dir: str) -> pa.Table:
    """Join-size statistics WITHOUT running the join (the optimizer's
    cardinality pass, and the capacity check before a 100 TB exchange):
    per-batch orderkey count partials from BOTH fact tables co-locate in
    ONE key-hash bucket exchange; Σ c_o(k)·c_l(k) inside the bucket is
    the exact equi-join row count. The wire carries key histograms (≤
    distinct keys per batch), never fact rows; the driver folds a 64-row
    partial table."""

    def side_partial(col: str, side: int):
        def f(b: pa.Table) -> pa.Table:
            k, n = np.unique(b[col].to_numpy(), return_counts=True)
            return pa.table(
                {
                    "k": pa.array(k, pa.int64()),
                    "n": pa.array(n.astype(np.int64)),
                    "side": pa.array(np.full(len(k), side, np.int8)),
                    "bucket": pa.array(
                        (
                            (k.astype(np.uint64) * np.uint64(2654435761))
                            % np.uint64(64)
                        ).astype(np.int64)
                    ),
                }
            )

        return f

    o = _read_sized(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey"]
    ).map_batches(side_partial("o_orderkey", 0), batch_format="pyarrow")
    l = _read_sized(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_orderkey"]
    ).map_batches(side_partial("l_orderkey", 1), batch_format="pyarrow")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["k", "side"], as_index=False)["n"].sum()
        p = s.pivot(index="k", columns="side", values="n")
        no = (
            p[0].fillna(0).to_numpy().astype(np.int64)
            if 0 in p.columns
            else np.zeros(len(p), np.int64)
        )
        nl = (
            p[1].fillna(0).to_numpy().astype(np.int64)
            if 1 in p.columns
            else np.zeros(len(p), np.int64)
        )
        return pd.DataFrame(
            {
                "n_join_rows": [int((no * nl).sum())],
                "n_keys_orders": [int((no > 0).sum())],
                "n_keys_lineitem": [int((nl > 0).sum())],
                "n_keys_both": [int(((no > 0) & (nl > 0)).sum())],
            }
        )

    parts = o.union(l).groupby("bucket").map_groups(
        fold, batch_format="pandas"
    ).to_pandas()
    tot = parts.sum()
    return pa.table(
        {
            c: pa.array([int(tot[c])], pa.int64())
            for c in (
                "n_join_rows",
                "n_keys_orders",
                "n_keys_lineitem",
                "n_keys_both",
            )
        }
    )


def k_anonymity_audit(sf_dir: str, k: int = 5) -> pa.Table:
    """k-anonymity audit over the FINAL state (the privacy gate a public
    data exchange runs before release — the reference's domain is public-
    health data): quasi-identifier = (role, tool, turn_idx); groups
    smaller than k are re-identification risks. LWW argmax combiner →
    conv-hash bucket fold emits per-bucket QI count partials (≤|QI
    domain| rows) → QI-key reduce → the driver classifies |QI| rows. The
    only row-weight exchange is the LWW fold the engine needs anyway."""

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "conv_id": b["conv_id"].to_numpy(zero_copy_only=False),
                "turn_idx": b["turn_idx"].to_numpy().astype(np.int64),
                "seq": b["seq"].to_numpy(),
                "role": b["role"].to_numpy(zero_copy_only=False),
                "tool": b["tool"].to_numpy(zero_copy_only=False),
                "op": b["op"].to_numpy(zero_copy_only=False),
            }
        )
        idx = df.groupby(["conv_id", "turn_idx"], sort=False)["seq"].idxmax()
        w = df.loc[idx].reset_index(drop=True)
        uid = w["conv_id"].str[5:].astype(np.int64).to_numpy()
        w["bucket"] = (
            (uid.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(64)
        ).astype(np.int64)
        return pa.Table.from_pandas(w, preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        idx = g.groupby(["conv_id", "turn_idx"], sort=False)["seq"].idxmax()
        w = g.loc[idx]
        live = w[w["op"] != "delete"]
        return live.groupby(
            ["role", "tool", "turn_idx"], as_index=False
        ).size().rename(columns={"size": "n"})

    qi = (
        derived_change_stream(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .groupby(["role", "tool", "turn_idx"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    n = qi["n"].to_numpy().astype(np.int64)
    risk = n < k
    return pa.table(
        {
            "k": pa.array([k], pa.int64()),
            "n_groups": pa.array([len(n)], pa.int64()),
            "n_groups_at_risk": pa.array([int(risk.sum())], pa.int64()),
            "n_rows_at_risk": pa.array([int(n[risk].sum())], pa.int64()),
        }
    )


# ------------------------------------------------------------- batch 20

def _part_pair_counts_ds(
    sf_dir: str, per_bucket_topk: int | None = None
) -> ray.data.Dataset:
    """Distributed (part_a < part_b, n_orders) co-purchase pair counts —
    shared by basket_part_pairs, association rules, triangles, PageRank
    and K-hop BFS. ONE orderkey-hash bucket exchange co-locates each
    order's lines; in-bucket the pair expansion is fully vectorized
    (per-order distinct parts sorted, pair index grids built from run
    lengths — baskets are small, ≤~15 parts, so pairs/order is bounded);
    per-bucket partial pair counts then reduce on a pair-hash bucket (the
    second exchange moves only distinct-pair partials, never rows).
    ``per_bucket_topk`` prunes each pbucket to its exact top-k leaders for
    top-k consumers — the driver then folds ≤64·k rows, never the whole
    pair histogram."""

    def tag(b: pa.Table) -> pa.Table:
        ok = b["l_orderkey"].to_numpy()
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "l_partkey": b["l_partkey"],
                "bucket": pa.array(
                    ((ok.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(64)).astype(np.int64)
                ),
            }
        )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["l_orderkey", "l_partkey"]].drop_duplicates()
        d = d.sort_values(["l_orderkey", "l_partkey"], kind="stable")
        ok = d["l_orderkey"].to_numpy()
        pk = d["l_partkey"].to_numpy()
        # run starts/lengths per order
        starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        lens = np.diff(np.r_[starts, len(ok)])
        # vectorized pair grid: for a run of length m emit m*(m-1)/2 (i<j)
        npairs = lens * (lens - 1) // 2
        tot = int(npairs.sum())
        if tot == 0:
            return pd.DataFrame({"part_a": [], "part_b": [], "n": []}).astype(np.int64)
        run_id = np.repeat(np.arange(len(lens)), npairs)
        # within-run pair rank 0..npairs[r]-1
        off = np.concatenate([[0], np.cumsum(npairs)[:-1]])
        r = np.arange(tot) - off[run_id]
        m = lens[run_id]
        # map rank r -> (i, j) with i<j in an m-element run (row-major upper tri)
        # i = m-2 - floor((sqrt(8*(npairs-1-r)+1)-1)/2) trick; use direct search
        rr = npairs[run_id] - 1 - r
        i_rev = ((np.sqrt(8.0 * rr + 1.0) - 1.0) // 2.0).astype(np.int64)
        i = m - 2 - i_rev
        j = r - (i * (2 * m - i - 1)) // 2 + i + 1
        base = starts[run_id]
        out = pd.DataFrame({"part_a": pk[base + i], "part_b": pk[base + j], "one": 1})
        agg = out.groupby(["part_a", "part_b"], as_index=False, sort=False).agg(n=("one", "sum"))
        agg["pbucket"] = (
            (agg["part_a"].to_numpy().astype(np.uint64) * np.uint64(0x9E3779B9)
             + agg["part_b"].to_numpy().astype(np.uint64)) % np.uint64(64)
        ).astype(np.int64)
        return agg

    def reduce_pairs(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["part_a", "part_b"], as_index=False).agg(
            n_orders=("n", "sum")
        )
        if per_bucket_topk is not None:
            # every pair's total completes inside ONE pbucket, so the
            # per-bucket top-k is exact — only 64·k leader rows reach the
            # driver instead of the whole pair histogram
            agg = agg.sort_values(
                ["n_orders", "part_a", "part_b"],
                ascending=[False, True, True],
                kind="stable",
            ).head(per_bucket_topk)
        return agg

    return (
        _read_sized(os.path.join(sf_dir, "lineitem.parquet"), columns=["l_orderkey", "l_partkey"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .groupby("pbucket")
        .map_groups(reduce_pairs, batch_format="pandas")
    )


def basket_part_pairs(sf_dir: str, k: int = 50) -> pa.Table:
    """Market-basket pair mining (co-purchased part pairs) — the classic
    A-priori first pass, reference-adjacent to the router's tuple-keyed
    match (J3) but over data pairs. Pair counting is _part_pair_counts_ds
    (two bounded exchanges, fully vectorized expansion) with per-bucket
    exact top-k pruning — the driver folds ≤64·k leader rows, never the
    whole pair histogram."""
    out = _part_pair_counts_ds(sf_dir, per_bucket_topk=k).to_pandas()
    out = out.sort_values(
        ["n_orders", "part_a", "part_b"], ascending=[False, True, True], kind="stable"
    ).head(k).reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def decay_weighted_user_scores(
    sf_dir: str, half_life_days: float = 7.0, k: int = 50
) -> pa.Table:
    """Exponentially time-decayed engagement score per user (the recency
    weighting a ranking/feature pipeline applies): score = Σ 2^(−age/h)
    over the user's events, age measured from the global max ts. Two tiny
    passes: the global anchor is one scalar aggregate; scores fold from
    per-batch partial sums through a user-hash reduce (partials are
    associative — decay factors multiply against the fixed anchor).
    Top-k by (score, user) with scores rounded to 6 dp on both sides;
    cross-engine float-sum order shifts (~1e-15 relative) cannot reorder
    a 6-dp-separated ranking, and ties break on user_id."""
    tmax = _events(sf_dir, columns=["ts"]).max("ts")
    tmax_us = np.datetime64(tmax, "us").astype(np.int64)
    lam = np.log(2.0) / (half_life_days * 86400.0 * 1e6)

    def partial(b: pa.Table) -> pa.Table:
        tsu = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        w = np.exp(-lam * (tmax_us - tsu).astype(np.float64))
        df = pd.DataFrame({"user_id": b["user_id"].to_numpy(), "s": w})
        agg = df.groupby("user_id", as_index=False).agg(s=("s", "sum"))
        agg["bkt"] = (agg["user_id"].to_numpy(np.int64) % 64).astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("user_id", as_index=False).agg(s=("s", "sum"))
        agg["score"] = np.round(agg["s"], 6)
        # per-bucket exact top-k (a user's partials complete in one bucket)
        return agg.sort_values(
            ["score", "user_id"], ascending=[False, True], kind="stable"
        ).head(k)[["user_id", "score"]]

    cand = (
        _events(sf_dir, columns=["user_id", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    out = cand.sort_values(
        ["score", "user_id"], ascending=[False, True], kind="stable"
    ).head(k).reset_index(drop=True)
    out["user_id"] = out["user_id"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def vocab_drift_topk(sf_dir: str, k: int = 30) -> pa.Table:
    """Vocabulary distribution drift between the two halves of the corpus
    (doc_id median split) — the training-data shift detector. The drift
    score per word is the INTEGER cross product |n1·N2 − n2·N1| (share
    difference scaled by N1·N2), so ranking is float-free and exact.
    Pass 1: per-half token totals (two scalars). Pass 2: per-(word, half)
    counts through the word-hash bucket reduce; each word completes in
    ONE bucket, so per-bucket top-k by (score, word) is exact and only
    64·k leader rows reach the driver."""
    import pyarrow.parquet as _pq

    meta = _pq.ParquetFile(os.path.join(sf_dir, "documents.parquet"))
    n_docs = meta.metadata.num_rows
    cut = n_docs // 2  # doc_id < cut → half 1 (doc_ids are 0..n-1 dense)

    def tok(b: pa.Table) -> pa.Table:
        words = pc.list_flatten(
            pc.split_pattern_regex(
                pc.utf8_lower(b["text"]), pattern=r"[^\p{L}\p{N}]+"
            )
        )
        lens = pc.list_value_length(
            pc.split_pattern_regex(
                pc.utf8_lower(b["text"]), pattern=r"[^\p{L}\p{N}]+"
            )
        ).to_numpy()
        did = np.repeat(b["doc_id"].to_numpy(), lens)
        w = pd.Series(words.to_numpy(zero_copy_only=False))
        keep = w != ""
        df = pd.DataFrame(
            {"word": w[keep.to_numpy()], "half": (did[keep.to_numpy()] >= cut)}
        )
        agg = df.groupby(["word", "half"], as_index=False).size()
        agg["bucket"] = (
            pd.util.hash_array(agg["word"].to_numpy(dtype=object)) % 64
        ).astype("int64")
        return pa.Table.from_pandas(
            agg.rename(columns={"size": "n"}), preserve_index=False
        )

    counted = (
        _documents(sf_dir, columns=["doc_id", "text"])
        .map_batches(tok, batch_format="pyarrow")
        .materialize()  # word-count partials, reused for totals + reduce
    )
    tot = (
        counted.map_batches(
            lambda b: pa.Table.from_pandas(
                pd.DataFrame(b.to_pandas().groupby("half")["n"].sum())
                .reset_index(),
                preserve_index=False,
            ),
            batch_format="pyarrow",
        )
        .to_pandas()  # O(batches) scalar partials, never the word histogram
        .groupby("half")["n"]
        .sum()
    )
    n1, n2 = int(tot.get(False, 0)), int(tot.get(True, 0))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.pivot_table(
            index="word", columns="half", values="n", aggfunc="sum", fill_value=0
        )
        w1 = agg[False].to_numpy(np.int64) if False in agg else np.zeros(len(agg), np.int64)
        w2 = agg[True].to_numpy(np.int64) if True in agg else np.zeros(len(agg), np.int64)
        out = pd.DataFrame(
            {
                "word": agg.index,
                "n_first": w1,
                "n_second": w2,
                "drift_score": np.abs(
                    w1.astype(object) * n2 - w2.astype(object) * n1
                ).astype(np.int64),
            }
        )
        return out.sort_values(
            ["drift_score", "word"], ascending=[False, True], kind="stable"
        ).head(k)

    cand = (
        counted.groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    out = cand.sort_values(
        ["drift_score", "word"], ascending=[False, True], kind="stable"
    ).head(k).reset_index(drop=True)
    for c in ("n_first", "n_second", "drift_score"):
        out[c] = out[c].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def pit_feature_join(sf_dir: str) -> pa.Table:
    """Point-in-time (leakage-free) feature join — the feature-store
    correctness rule for training labels: every purchase event gets
    features computed ONLY from the same user's STRICTLY-EARLIER events
    (events-before, clicks-before, value-tick sum before). ONE user-hash
    exchange of slim rows; in-bucket the composite key
    ``code·span + (t − t0)`` (the interval_overlap_counts layout) confines
    three vectorized searchsorted probes + one prefix-sum difference to
    each user's segment — no per-user loop, no self-join expansion, and
    integer ticks keep the sums float-free."""

    def tag(b: pa.Table) -> pa.Table:
        et = b["event_type"].to_numpy(zero_copy_only=False)
        uid = b["user_id"].to_numpy()
        return pa.table(
            {
                "user_id": pa.array(uid),
                "event_id": b["event_id"],
                "tsu": pa.array(
                    b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
                ),
                "tick": pa.array(
                    np.floor(b["value"].to_numpy() * 10000.0).astype(np.int64)
                ),
                "is_click": pa.array((et == "click").astype(np.int8)),
                "is_purchase": pa.array((et == "purchase").astype(np.int8)),
                "bucket": pa.array(
                    (
                        (uid.astype(np.uint64) * np.uint64(2654435761))
                        % np.uint64(64)
                    ).astype(np.int64)
                ),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        codes, _ = pd.factorize(g["user_id"], sort=True)
        tsu = g["tsu"].to_numpy(np.int64)
        t0 = int(tsu.min())
        span = int(tsu.max()) - t0 + 2
        ckey = codes.astype(np.int64) * np.int64(span) + (tsu - t0)
        order = np.argsort(ckey, kind="stable")
        sk = ckey[order]
        cum = np.concatenate(
            [[0], np.cumsum(g["tick"].to_numpy(np.int64)[order])]
        )
        click_k = np.sort(ckey[g["is_click"].to_numpy(np.bool_)])
        pm = g["is_purchase"].to_numpy(np.bool_)
        pk = ckey[pm]
        base = codes[pm].astype(np.int64) * np.int64(span)
        lo_all = np.searchsorted(sk, base, side="left")
        hi_all = np.searchsorted(sk, pk, side="left")
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy()[pm],
                "user_id": g["user_id"].to_numpy()[pm],
                "n_events_before": (hi_all - lo_all).astype(np.int64),
                "n_clicks_before": (
                    np.searchsorted(click_k, pk, side="left")
                    - np.searchsorted(click_k, base, side="left")
                ).astype(np.int64),
                "ticks_before": (cum[hi_all] - cum[lo_all]).astype(np.int64),
            }
        )

    out = (
        _events(sf_dir, columns=["event_id", "user_id", "event_type", "ts", "value"])
        .map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def basket_association_rules(sf_dir: str, k: int = 30) -> pa.Table:
    """Association-rule mining over co-purchase pairs (A-priori second
    pass): support count, per-direction confidence and lift for the top-k
    pairs by co-occurrence. Pair counts ride the shared
    ``_part_pair_counts_ds`` exchange; per-part basket counts are a
    part-hash bucket reduce of per-batch-deduped (order, part) partials.
    Only the k winning pairs reach the driver; their ≤2k part counts are
    fetched with a broadcast membership filter, never a full gather. The
    output keeps the INTEGER counts (n_ab, n_a, n_b, n_baskets) alongside
    6-dp confidence/lift so the comparison is float-order-proof."""
    import ray as _ray

    # top-k pairs by (n DESC, part_a, part_b) — deterministic tie-break
    pairs = _part_pair_counts_ds(sf_dir, per_bucket_topk=k).to_pandas()
    top = (
        pairs.sort_values(
            ["n_orders", "part_a", "part_b"],
            ascending=[False, True, True],
            kind="stable",
        )
        .head(k)
        .reset_index(drop=True)
    )
    want = np.unique(
        np.concatenate([top["part_a"].to_numpy(), top["part_b"].to_numpy()])
    )
    wref = _ray.put(set(int(x) for x in want))

    # per-part distinct-basket counts for the ≤2k winning parts: per-batch
    # deduped (order, part) pairs bucket on part hash (wire bounded by the
    # winning parts' distinct pairs), EXACT distinct fold in-bucket — a
    # per-batch count would double-count an (order, part) spanning batches
    def partial(b: pa.Table) -> pa.Table:
        df = (
            pa.table({"o": b["l_orderkey"], "p": b["l_partkey"]})
            .to_pandas()
            .drop_duplicates()
        )
        df = df[df["p"].isin(_ray.get(wref))]
        df["bkt"] = (df["p"].to_numpy(np.int64) % 64).astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def distinct_fold(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["o", "p"])
        return d.groupby("p", as_index=False).size().rename(columns={"size": "n"})

    counts = (
        _read_sized(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_partkey"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(distinct_fold, batch_format="pandas")
        .to_pandas()
        .set_index("p")["n"]
    )
    # total baskets: per-batch-unique orderkeys, exact nunique per bucket
    n_baskets = int(
        _read_sized(
            os.path.join(sf_dir, "lineitem.parquet"), columns=["l_orderkey"]
        )
        .map_batches(
            lambda b: pa.table(
                {"o": pa.array(np.unique(b["l_orderkey"].to_numpy()))}
            ),
            batch_format="pyarrow",
        )
        .map_batches(
            lambda b: pa.table(
                {
                    "bkt": pa.array(b["o"].to_numpy() % 64),
                    "o": b["o"],
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("bkt")
        .map_groups(
            lambda g: pd.DataFrame({"n": [g["o"].nunique()]}),
            batch_format="pandas",
        )
        .sum("n")
    )

    na = top["part_a"].map(counts).to_numpy(np.int64)
    nb = top["part_b"].map(counts).to_numpy(np.int64)
    nab = top["n_orders"].to_numpy(np.int64)
    out = pd.DataFrame(
        {
            "part_a": top["part_a"].astype(np.int64),
            "part_b": top["part_b"].astype(np.int64),
            "n_ab": nab,
            "n_a": na,
            "n_b": nb,
            "n_baskets": np.int64(n_baskets),
            "conf_a_b": np.round(nab / na, 6),
            "conf_b_a": np.round(nab / nb, 6),
            "lift": np.round(n_baskets * nab / (na.astype(np.float64) * nb), 6),
        }
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def event_type_correlation_matrix(sf_dir: str) -> pa.Table:
    """Pairwise Pearson correlation between event types' DAILY count
    series — exact integer co-moment algebra: the scan emits per-batch
    (type, day) count partials (wire ≤ types × span-days, like
    hourly_autocorr_lag1), the bounded (type, day) frame reduces once,
    and every (n, Σx, Σy, Σxy, Σx², Σy²) is int64 so the only float op is
    the final correlation division — identical on both oracle sides at
    6 dp. Day domain = all days in [min, max] with zero fill."""

    def partial(b: pa.Table) -> pa.Table:
        day = b["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        df = pd.DataFrame(
            {
                "event_type": b["event_type"].to_numpy(zero_copy_only=False),
                "day": day,
            }
        )
        agg = df.groupby(["event_type", "day"], as_index=False, sort=False).size()
        return pa.Table.from_pandas(
            agg.rename(columns={"size": "c"}), preserve_index=False
        )

    daily = (
        _events(sf_dir, columns=["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    lo, hi = int(daily["day"].min()), int(daily["day"].max())
    days = np.arange(lo, hi + 1)
    types = sorted(daily["event_type"].unique())
    mat = np.zeros((len(types), len(days)), np.int64)
    tidx = {t: i for i, t in enumerate(types)}
    mat[
        daily["event_type"].map(tidx).to_numpy(),
        daily["day"].to_numpy() - lo,
    ] = daily["c"].to_numpy(np.int64)
    n = np.int64(len(days))
    rows = []
    for i in range(len(types)):
        for j in range(i + 1, len(types)):
            x, y = mat[i], mat[j]
            sx, sy = int(x.sum()), int(y.sum())
            sxx, syy = int((x * x).sum()), int((y * y).sum())
            sxy = int((x * y).sum())
            num = n * sxy - sx * sy
            den2 = (n * sxx - sx * sx) * (n * syy - sy * sy)
            corr = float(num) / float(np.sqrt(den2)) if den2 > 0 else 0.0
            rows.append(
                {
                    "type_a": types[i],
                    "type_b": types[j],
                    "n_days": int(n),
                    "corr": round(corr, 6),
                }
            )
    return pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)


def small_cell_suppression(sf_dir: str, k: int = 11) -> pa.Table:
    """Small-cell suppression for public release (the disclosure-control
    step a public-health agency applies before publishing counts —
    reference-domain: CDC releases suppress cells below ~11): PRIMARY
    suppression of (day × event_type) cells with n < k, then
    COMPLEMENTARY suppression — a row with exactly one primary-suppressed
    cell also hides its smallest published cell so the row margin cannot
    reconstruct the hidden value. Cell counts fold from per-batch
    partials (wire ≤ days × types, the bounded-domain argument of the
    correlation matrix); the suppression pass runs on that bounded frame.
    Suppressed counts publish as -1 (never NULL) with an exact status."""
    cells = (
        _events(sf_dir, columns=["ts", "event_type"])
        .map_batches(
            lambda b: pa.Table.from_pandas(
                pd.DataFrame(
                    {
                        "day": pc.strftime(b["ts"], format="%Y-%m-%d").to_numpy(
                            zero_copy_only=False
                        ),
                        "event_type": b["event_type"].to_numpy(
                            zero_copy_only=False
                        ),
                    }
                )
                .groupby(["day", "event_type"], as_index=False)
                .size()
                .rename(columns={"size": "n"}),
                preserve_index=False,
            ),
            batch_format="pyarrow",
        )
        .groupby(["day", "event_type"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    cells["n"] = cells["n"].astype(np.int64)
    cells["prim"] = cells["n"] < k
    nprim = cells.groupby("day")["prim"].transform("sum")
    pub = cells[~cells["prim"]].copy()
    pub = pub.sort_values(["day", "n", "event_type"], kind="stable")
    pub["rnk"] = pub.groupby("day").cumcount() + 1
    cells = cells.merge(
        pub[["day", "event_type", "rnk"]], on=["day", "event_type"], how="left"
    )
    comp = (~cells["prim"]) & (nprim.to_numpy() == 1) & (cells["rnk"] == 1)
    cells["status"] = np.where(
        cells["prim"], "primary", np.where(comp, "complementary", "published")
    )
    cells["n_published"] = np.where(
        cells["prim"] | comp, np.int64(-1), cells["n"]
    ).astype(np.int64)
    out = cells.sort_values(["day", "event_type"]).reset_index(drop=True)
    return pa.Table.from_pandas(
        out[["day", "event_type", "n_published", "status"]], preserve_index=False
    )


def k_anonymity_generalize(sf_dir: str, k: int = 11) -> pa.Table:
    """K-anonymity ENFORCEMENT by generalization (the release-side
    companion to the audit and to small-cell suppression): quasi-
    identifier = (event_type, time period); the period ladder coarsens
    day → week → month until EVERY group reaches size ≥ k, and the
    chosen level's census ships. Each ladder level is one bounded
    (type × period) count aggregate (wire ≤ types × span) — the scan
    emits all three period keys at once, so the ladder costs ONE pass."""

    def partial(b: pa.Table) -> pa.Table:
        day = b["ts"].to_numpy().astype("datetime64[D]")
        frames = []
        for level, key in (
            ("day", day.astype("datetime64[D]")),
            ("week", day.astype("datetime64[W]")),
            ("month", day.astype("datetime64[M]")),
        ):
            df = pd.DataFrame(
                {
                    "level": level,
                    "event_type": b["event_type"].to_numpy(zero_copy_only=False),
                    "period": key.astype(str),
                }
            )
            frames.append(
                df.groupby(
                    ["level", "event_type", "period"], as_index=False
                ).size()
            )
        return pa.Table.from_pandas(
            pd.concat(frames, ignore_index=True).rename(columns={"size": "n"}),
            preserve_index=False,
        )

    cells = (
        _events(sf_dir, columns=["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["level", "event_type", "period"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    rows = []
    chosen = None
    for level in ("day", "week", "month"):
        g = cells[cells["level"] == level]
        mn = int(g["n"].min())
        rows.append((level, len(g), mn, mn >= k))
        if chosen is None and mn >= k:
            chosen = level
    if chosen is None:
        chosen = "suppress_all"  # even month-level fails: nothing releasable
    out = pd.DataFrame(
        rows, columns=["level", "n_groups", "min_group_size", "satisfies_k"]
    )
    out["chosen"] = np.where(out["level"] == chosen, 1, 0).astype(np.int64)
    out["n_groups"] = out["n_groups"].astype(np.int64)
    out["min_group_size"] = out["min_group_size"].astype(np.int64)
    out["satisfies_k"] = out["satisfies_k"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def dp_noisy_counts(sf_dir: str, epsilon: float = 0.5) -> pa.Table:
    """Seeded-Laplace noisy counts per event type (the mechanism plumbing
    of a differentially-private release, made REPRODUCIBLE: the uniform
    draw derives from md5 of the cell key — the same md5-low-8-bytes
    contract as the partition fingerprint — so replays and the SQL oracle
    see identical noise; a production release would swap in a true RNG).
    Sensitivity 1, b = 1/ε; counts are a tiny per-type aggregate."""
    import hashlib

    b = 1.0 / epsilon
    counts = (
        _events(sf_dir, columns=["event_type"])
        .groupby("event_type")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    u = np.array(
        [
            (
                int.from_bytes(
                    hashlib.md5(t.encode()).digest()[8:16], "little"
                )
                % (1 << 32)
                + 0.5
            )
            / float(1 << 32)
            for t in counts["event_type"]
        ]
    )
    noise = -b * np.sign(u - 0.5) * np.log(1.0 - 2.0 * np.abs(u - 0.5))
    counts["noisy_n"] = np.round(counts["n"].astype(np.float64) + noise, 6)
    counts["n"] = counts["n"].astype(np.int64)
    return pa.Table.from_pandas(counts, preserve_index=False)


def hourly_autocorr_lag1(sf_dir: str) -> pa.Table:
    """Lag-1 temporal autocorrelation building blocks per event type: the
    hourly count series paired with itself shifted one hour (pairs only
    where both hours exist), reduced to EXACT integer co-moment sums
    (n, Σxy, Σx, Σy, Σx², Σy²) so the driver (or the caller) derives
    Pearson r without float-order drift. Scale shape: the raw scan emits
    per-batch (type, hour) partial counts — the only thing that leaves a
    worker; the hourly series' cardinality is bounded by the TIME SPAN
    (types × hours, ~44k/decade/type), not the row count, so the lag pair
    fold is a driver-side array shift over a bounded frame."""

    def partial(b: pa.Table) -> pa.Table:
        hr = b["ts"].to_numpy().astype("datetime64[h]").astype(np.int64)
        df = pd.DataFrame({"event_type": b["event_type"].to_numpy(zero_copy_only=False), "hr": hr})
        agg = df.groupby(["event_type", "hr"], as_index=False, sort=False).size()
        return pa.Table.from_pandas(agg.rename(columns={"size": "c"}), preserve_index=False)

    hourly = (
        _events(sf_dir, columns=["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hr"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    rows = []
    for et, g in hourly.groupby("event_type", sort=True):
        g = g.sort_values("hr")
        h = g["hr"].to_numpy()
        c = g["c"].to_numpy().astype(np.int64)
        m = h[1:] == h[:-1] + 1  # contiguous hours only
        x, y = c[:-1][m], c[1:][m]
        rows.append(
            (et, len(x), int((x * y).sum()), int(x.sum()), int(y.sum()),
             int((x * x).sum()), int((y * y).sum()))
        )
    out = pd.DataFrame(
        rows, columns=["event_type", "n_pairs", "sxy", "sx", "sy", "sxx", "syy"]
    )
    for c_ in out.columns[1:]:
        out[c_] = out[c_].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def cusum_max_deviation(sf_dir: str) -> pa.Table:
    """Distributed CUSUM (change-detection statistic): per event type, the
    max |scaled cumulative deviation| N·Σ_{i≤k}x_i − k·ΣX over events in
    global (ts, event_id) order — all integer, exact. Scale shape: the
    classic two-pass ordered prefix-scan (same machinery as
    pack_token_sequences): pass 1 emits per-(type, day) partials (k, Σx) —
    tiny, bounded by span×types — the driver prefix-sums them into
    per-type per-day offsets and broadcasts; pass 2 groups rows by DAY
    (coarse ordered ranges), sorts in-bucket, adds the offsets to the
    within-day cumulative, and emits one max per (day, type). No global
    sort, no unbounded driver state. int64 bound: N·Σx must fit 2⁶³ —
    holds to ~3e6 rows/type at tick≤1e5; beyond that switch the scaled
    statistic to float64 (documented, not silently)."""
    import ray as _ray

    def tag(b: pa.Table) -> pa.Table:
        ts = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {
                "event_type": b["event_type"],
                "tsu": pa.array(ts),
                "event_id": b["event_id"],
                "x": pa.array(np.floor(b["value"].to_numpy() * 100.0).astype(np.int64)),
                "day": pa.array(ts // (86_400 * 1_000_000)),
            }
        )

    tagged = (
        _events(sf_dir, columns=["ts", "event_id", "event_type", "value"])
        .map_batches(tag, batch_format="pyarrow")
        .materialize()
    )

    def day_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": b["event_type"].to_numpy(zero_copy_only=False),
                "day": b["day"].to_numpy(),
                "x": b["x"].to_numpy(),
                "one": np.ones(b.num_rows, np.int64),
            }
        )
        agg = df.groupby(["event_type", "day"], as_index=False, sort=False).agg(
            k=("one", "sum"), sx=("x", "sum")
        )
        return pa.Table.from_pandas(agg, preserve_index=False)

    partials = (
        tagged.map_batches(day_partial, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(Sum("k", alias_name="k"), Sum("sx", alias_name="sx"))
        .to_pandas()
        .sort_values(["event_type", "day"])
    )
    # per-type totals + per-(type, day) BEFORE-day prefix offsets
    totals = partials.groupby("event_type").agg(N=("k", "sum"), SX=("sx", "sum"))
    offs: dict[tuple[str, int], tuple[int, int]] = {}
    for et, g in partials.groupby("event_type", sort=False):
        ck = np.concatenate([[0], np.cumsum(g["k"].to_numpy())[:-1]])
        cx = np.concatenate([[0], np.cumsum(g["sx"].to_numpy())[:-1]])
        for d, a, b_ in zip(g["day"].to_numpy(), ck, cx):
            offs[(et, int(d))] = (int(a), int(b_))
    glob = _ray.put((offs, {et: (int(r["N"]), int(r["SX"])) for et, r in totals.iterrows()}))

    def day_max(g: pd.DataFrame) -> pd.DataFrame:
        offsets, tots = _ray.get(glob)
        g = g.sort_values(["event_type", "tsu", "event_id"], kind="stable")
        et = g["event_type"].to_numpy()
        x = g["x"].to_numpy()
        day = int(g["day"].iloc[0])
        starts = np.flatnonzero(np.r_[True, et[1:] != et[:-1]])
        ends = np.r_[starts[1:], len(et)]
        rows = []
        for s, e in zip(starts, ends):
            t = et[s]
            N, SX = tots[t]
            k0, x0 = offsets[(t, day)]
            cumx = x0 + np.cumsum(x[s:e])
            kk = k0 + np.arange(1, e - s + 1)
            dev = N * cumx - kk * SX
            rows.append((t, int(np.abs(dev).max())))
        return pd.DataFrame(rows, columns=["event_type", "mx"])

    out = (
        tagged.groupby("day")
        .map_groups(day_max, batch_format="pandas")
        .groupby("event_type")
        .aggregate(Max("mx", alias_name="max_abs_scaled_cusum"))
        .to_pandas()
        .merge(totals.reset_index()[["event_type", "N"]], on="event_type")
        .rename(columns={"N": "n_events"})
    )
    out["max_abs_scaled_cusum"] = out["max_abs_scaled_cusum"].astype(np.int64)
    out["n_events"] = out["n_events"].astype(np.int64)
    return pa.Table.from_pandas(
        out.sort_values("event_type").reset_index(drop=True)[
            ["event_type", "n_events", "max_abs_scaled_cusum"]
        ],
        preserve_index=False,
    )


def repeated_word_stats(sf_dir: str) -> pa.Table:
    """Adjacent-duplicate-token quality signal per source (the Gopher-style
    repetition family, cheapest member): counts word pairs where
    word[i]==word[i-1] inside each doc. Scale shape: ZERO shuffles — the
    whole signal folds per batch in Arrow C++ (split_pattern → flattened
    values + list offsets; one shifted equality over the flat array with
    doc boundaries masked via offsets), leaving only per-source scalar
    partials; the final reduce is a ~|sources|-row aggregate."""

    def partial(b: pa.Table) -> pa.Table:
        lst = pc.split_pattern(b["text"], " ")
        flat = lst.combine_chunks().flatten() if isinstance(lst, pa.ChunkedArray) else lst.flatten()
        la = lst.combine_chunks() if isinstance(lst, pa.ChunkedArray) else lst
        off = la.offsets.to_numpy()
        w = flat.to_numpy(zero_copy_only=False)
        eq = np.r_[False, w[1:] == w[:-1]] if len(w) else np.zeros(0, bool)
        eq[off[:-1][off[:-1] < len(eq)]] = False  # doc starts are never pairs
        # per-doc repeat counts via offset segments
        cs = np.concatenate([[0], np.cumsum(eq)])
        per_doc = cs[off[1:]] - cs[off[:-1]]
        nw = off[1:] - off[:-1]
        df = pd.DataFrame(
            {
                "source": b["source"].to_numpy(zero_copy_only=False),
                "n_docs": 1,
                "n_words": nw,
                "n_repeat_pairs": per_doc,
                "n_docs_with_repeat": (per_doc > 0).astype(np.int64),
            }
        )
        agg = df.groupby("source", as_index=False, sort=False).sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    out = (
        _documents(sf_dir, columns=["source", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_words", alias_name="n_words"),
            Sum("n_repeat_pairs", alias_name="n_repeat_pairs"),
            Sum("n_docs_with_repeat", alias_name="n_docs_with_repeat"),
        )
        .to_pandas()
    )
    for c in out.columns[1:]:
        out[c] = out[c].astype(np.int64)
    return pa.Table.from_pandas(
        out.sort_values("source").reset_index(drop=True), preserve_index=False
    )


def session_path_trigrams(sf_dir: str, gap_seconds: float = 1800.0) -> pa.Table:
    """Sessionized path mining: counts of event-type TRIGRAMS inside user
    sessions (30-min gap, sessionize_events semantics) — the navigation-
    path analysis shape. Scale shape: ONE user-hash bucket exchange (same
    coarse 256-bucket layout as sessionize_events); in-bucket the session
    ids come from one cumsum over the sorted frame and the trigram join is
    three shifted array views with user+session boundary masks — no per-
    user or per-session Python; only per-bucket (trigram, n) partials
    (≤|types|³ rows each) leave, and the final reduce folds a bounded
    histogram."""

    def bucket(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy()
        bk = (uid * np.int64(0x9E3779B9)) % 256
        return b.append_column("bucket", pa.array(bk.astype(np.int64), pa.int64()))

    def tri_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        gap = g["ts"].diff().dt.total_seconds().to_numpy()
        sess = np.cumsum(new_user | (gap > gap_seconds))
        ok = (sess[2:] == sess[:-2]) if len(sess) > 2 else np.zeros(0, bool)
        if not ok.any():
            return pd.DataFrame({"trigram": pd.Series([], dtype=object), "n": pd.Series([], dtype=np.int64)})
        a, b_, c = et[:-2][ok], et[1:-1][ok], et[2:][ok]
        tri = pd.Series(a).str.cat([b_, c], sep=">")
        out = tri.value_counts().rename_axis("trigram").reset_index(name="n")
        return out

    out = (
        _events(sf_dir, columns=["user_id", "event_id", "ts", "event_type"])
        .map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(tri_bucket, batch_format="pandas")
        .groupby("trigram")
        .aggregate(Sum("n", alias_name="n_occurrences"))
        .to_pandas()
    )
    out["n_occurrences"] = out["n_occurrences"].astype(np.int64)
    return pa.Table.from_pandas(
        out.sort_values("trigram").reset_index(drop=True), preserve_index=False
    )


# ------------------------------------------------------------- batch 21

def triangle_count_parts(sf_dir: str, min_support: int = 2) -> pa.Table:
    """Distributed triangle counting over the derived co-purchase graph
    (edges = part pairs sharing ≥min_support orders, oriented a<b) — the
    graph-analytics shape Ray Data lacks natively. Node-iterator plan:
    (1) edges from _part_pair_counts_ds (bounded by the support filter);
    (2) wedges — per low-endpoint neighbor-pair grids, generated in one
    node-hash bucket exchange with the same vectorized triu expansion as
    basket mining (each triangle x<y<z is generated exactly once, from
    x's neighbor list); (3) wedge→edge membership probe as a UNION +
    one (y,z)-hash bucket exchange with an in-bucket vectorized merge —
    no broadcast of the edge set, no driver materialization; only
    per-bucket match counts leave."""

    edges = (
        _part_pair_counts_ds(sf_dir)
        .map_batches(
            lambda b: b.filter(pc.greater_equal(b["n_orders"], min_support)).select(
                ["part_a", "part_b"]
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    n_edges = edges.count()

    def tag_by_a(b: pa.Table) -> pa.Table:
        a = b["part_a"].to_numpy()
        return b.append_column(
            "abucket",
            pa.array(((a.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(64)).astype(np.int64)),
        )

    def wedges_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["part_a", "part_b"], kind="stable")
        a = g["part_a"].to_numpy()
        bnb = g["part_b"].to_numpy()
        starts = np.flatnonzero(np.r_[True, a[1:] != a[:-1]])
        lens = np.diff(np.r_[starts, len(a)])
        npairs = lens * (lens - 1) // 2
        tot = int(npairs.sum())
        if tot == 0:
            return pd.DataFrame({"y": pd.Series(dtype=np.int64), "z": pd.Series(dtype=np.int64)})
        run_id = np.repeat(np.arange(len(lens)), npairs)
        off = np.concatenate([[0], np.cumsum(npairs)[:-1]])
        r = np.arange(tot) - off[run_id]
        m = lens[run_id]
        rr = npairs[run_id] - 1 - r
        i_rev = ((np.sqrt(8.0 * rr + 1.0) - 1.0) // 2.0).astype(np.int64)
        i = m - 2 - i_rev
        j = r - (i * (2 * m - i - 1)) // 2 + i + 1
        base = starts[run_id]
        return pd.DataFrame({"y": bnb[base + i], "z": bnb[base + j]})

    wedges = (
        edges.map_batches(tag_by_a, batch_format="pyarrow")
        .groupby("abucket")
        .map_groups(wedges_in_bucket, batch_format="pandas")
    )

    def tag_pair(col_y: str, col_z: str, is_edge: int):
        def f(b: pa.Table) -> pa.Table:
            y = b[col_y].to_numpy()
            z = b[col_z].to_numpy()
            return pa.table(
                {
                    "y": pa.array(y.astype(np.int64)),
                    "z": pa.array(z.astype(np.int64)),
                    "is_edge": pa.array(np.full(len(y), is_edge, np.int64)),
                    "pbucket": pa.array(
                        ((y.astype(np.uint64) * np.uint64(0x9E3779B9)
                          + z.astype(np.uint64)) % np.uint64(64)).astype(np.int64)
                    ),
                }
            )
        return f

    probe = wedges.map_batches(tag_pair("y", "z", 0), batch_format="pyarrow").union(
        edges.map_batches(tag_pair("part_a", "part_b", 1), batch_format="pyarrow")
    )

    def count_matches(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["is_edge"] == 1][["y", "z"]].drop_duplicates()
        w = g[g["is_edge"] == 0][["y", "z"]]
        if len(e) == 0 or len(w) == 0:
            return pd.DataFrame({"n": pd.Series([0], dtype=np.int64)})
        hit = w.merge(e, on=["y", "z"], how="inner")
        return pd.DataFrame({"n": pd.Series([len(hit)], dtype=np.int64)})

    tri = (
        probe.groupby("pbucket")
        .map_groups(count_matches, batch_format="pandas")
        .sum("n")
    )
    return pa.table(
        {
            "n_edges": pa.array([int(n_edges)], pa.int64()),
            "n_triangles": pa.array([int(tri)], pa.int64()),
        }
    )


def pagerank_parts(
    sf_dir: str,
    iters: int = 3,
    damping: float = 0.85,
    num_buckets: int = 32,
    actor_edge_threshold: int = 2_000_000,
) -> pa.Table:
    """Damped PageRank (K fixed BSP rounds) over the undirected co-purchase
    part graph — the iterative-algorithm representative (alongside the
    one-shot graph ops: connected components, triangles, clustering).

    Scale shape: the rank vector lives as a BUCKETED DATASET co-partitioned
    with the edge list on node-hash — never a driver materialization and
    never a rank-vector broadcast (|nodes| grows with the data). Each round
    is exactly two bounded exchanges in pure Dataset algebra:

      1. edges ∪ ranks groupby(src bucket): every edge meets its source's
         (rank, degree) in-bucket; emits per-edge contributions r/deg keyed
         by ``bucket(dst)`` plus pass-through (node, deg) meta rows.
      2. groupby(dst bucket): new rank = (1-d) + d·Σ contrib, folded back
         against the meta rows — output is the next round's rank dataset in
         the SAME bucket layout.

    On a symmetric graph every node has an in-neighbor, so no
    dangling-mass term is needed and Σr = |nodes| is invariant. Ranks are
    normalized to mean 1 (r0 = 1) and rounded to 6 dp on both sides of the
    oracle, so cross-engine float-sum ordering (~1e-13) cannot flip the
    comparison.

    The dataset-algebra plan re-ships the static edge list in every BSP
    round (``edges.union(ranks)``) — fine at small |E|, dominant at 100×.
    Above ``actor_edge_threshold`` directed edge rows this function
    auto-promotes to the edges-stay-put plan (``pagerank_parts_actors``:
    edges staged once into per-bucket shards, bucket-pinned actors, only
    contribution refs move per round). Both plans are pair-asserted
    identical by ``test_pagerank_actor_mode_matches_dataset_mode`` and
    share one SQL oracle."""
    iters = max(1, iters)
    MIX = np.uint64(0x9E3779B97F4A7C15)
    B = np.uint64(num_buckets)

    def bucket_of(nodes: np.ndarray) -> np.ndarray:
        return (((nodes.astype(np.uint64) * MIX) >> np.uint64(32)) % B).astype(
            np.int64
        )

    # union-schema rows: side 0 = edge (a=src, b=dst), side 1 = rank state
    # (a=node, b=deg, r=rank); bucket always = bucket(a)
    def to_edges(t: pa.Table) -> pa.Table:
        x = t["part_a"].to_numpy()
        y = t["part_b"].to_numpy()
        src = np.concatenate([x, y])
        dst = np.concatenate([y, x])
        n = len(src)
        return pa.table(
            {
                "bucket": pa.array(bucket_of(src)),
                "side": pa.array(np.zeros(n, np.int8)),
                "a": pa.array(src.astype(np.int64)),
                "b": pa.array(dst.astype(np.int64)),
                "r": pa.array(np.zeros(n, np.float64)),
            }
        )

    pairs = _part_pair_counts_ds(sf_dir).materialize()
    if actor_edge_threshold and 2 * pairs.count() > actor_edge_threshold:
        # edge set too large to re-ship per round — switch to the
        # bucket-pinned actor plan (edges cross the wire exactly once);
        # the already-materialized pair dataset feeds the staging write
        from data_exchange_routing_ray.functions.graph_actors import (
            pagerank_actor_mode,
        )

        with tempfile.TemporaryDirectory(prefix="prstage-") as d:
            return pagerank_actor_mode(pairs, d, iters=iters, damping=damping)
    edges = pairs.map_batches(to_edges, batch_format="pyarrow").materialize()

    def contribs(g: pd.DataFrame) -> pd.DataFrame:
        st = g[g["side"] == 1]
        ed = g[g["side"] == 0]
        if not len(st) and len(ed):
            # first round: rank state is implicit (r0 = 1; deg derived
            # in-bucket from the edges themselves) — fusing initialization
            # into round 1 saves a full init shuffle + materialization
            deg = (
                ed.groupby("a", as_index=False)
                .size()
                .rename(columns={"size": "b"})
            )
            st = pd.DataFrame(
                {
                    "bucket": np.full(
                        len(deg), int(g["bucket"].iloc[0]), np.int64
                    ),
                    "side": np.ones(len(deg), np.int8),
                    "a": deg["a"].to_numpy(np.int64),
                    "b": deg["b"].to_numpy(np.int64),
                    "r": np.ones(len(deg), np.float64),
                }
            )
        out = [st]  # pass deg meta through to the reduce side (same bucket)
        if len(ed) and len(st):
            m = ed[["a", "b"]].merge(
                st[["a", "b", "r"]].rename(
                    columns={"b": "deg", "r": "rsrc"}
                ),
                on="a",
                how="left",
            )
            out.append(
                pd.DataFrame(
                    {
                        "bucket": bucket_of(m["b"].to_numpy(np.int64)),
                        "side": np.zeros(len(m), np.int8),
                        "a": m["b"].to_numpy(np.int64),  # dst node
                        "b": np.zeros(len(m), np.int64),
                        "r": m["rsrc"].to_numpy(np.float64)
                        / m["deg"].to_numpy(np.float64),
                    }
                )
            )
        return pa.Table.from_pandas(
            pd.concat(out, ignore_index=True), preserve_index=False
        )

    def reduce_ranks(g: pd.DataFrame) -> pd.DataFrame:
        st = g[g["side"] == 1]
        cb = g[g["side"] == 0]
        summed = (
            cb.groupby("a", as_index=False)
            .agg(s=("r", "sum"))
            if len(cb)
            else pd.DataFrame({"a": [], "s": []})
        )
        m = st[["bucket", "side", "a", "b"]].merge(summed, on="a", how="left")
        m["r"] = (1.0 - damping) + damping * m["s"].fillna(0.0)
        return pa.Table.from_pandas(m.drop(columns=["s"]), preserve_index=False)

    ranks = None
    for _ in range(iters):
        src = edges if ranks is None else edges.union(ranks)
        ranks = (
            src.groupby("bucket")
            .map_groups(contribs, batch_format="pandas")
            .groupby("bucket")
            .map_groups(reduce_ranks, batch_format="pandas")
            .materialize()
        )

    out = ranks.to_pandas()  # |nodes with ≥1 edge| rows — the query result
    res = pd.DataFrame(
        {
            "part_id": out["a"].astype("int64"),
            "pr": np.round(out["r"].astype(np.float64), 6),
        }
    ).sort_values("part_id")
    return pa.Table.from_pandas(res.reset_index(drop=True), preserve_index=False)


def pagerank_parts_actors(
    sf_dir: str, iters: int = 3, damping: float = 0.85
) -> pa.Table:
    """PageRank via BUCKET-PINNED ACTORS (the other point in the design
    space vs the pure-Dataset ``pagerank_parts``): edges stage once into
    per-bucket parquet shards, B actors pin their bucket + rank state,
    and each BSP round moves only contribution shards actor→actor as
    object refs — the static edge set never re-crosses the wire. Same
    semantics, same SQL oracle; the A/B equality is also asserted by
    ``test_pagerank_actor_mode_matches_dataset_mode``."""
    from data_exchange_routing_ray.functions.graph_actors import (
        pagerank_actor_mode,
    )

    with tempfile.TemporaryDirectory(prefix="prstage-") as d:
        return pagerank_actor_mode(
            _part_pair_counts_ds(sf_dir), d, iters=iters, damping=damping
        )


def khop_reachable_parts(
    sf_dir: str,
    k: int = 3,
    num_buckets: int = 32,
    actor_edge_threshold: int = 2_000_000,
) -> pa.Table:
    """K-hop BFS reachability census from a deterministic seed set
    (``part_id % 97 == 0``) over the co-purchase graph — the frontier-BSP
    companion to ``pagerank_parts``: per hop, the frontier meets its edge
    bucket (src-hash exchange), candidate neighbors fold into the visited
    state with a min-dist reduce (dst-hash exchange). The visited set stays
    a bucketed dataset end-to-end — no driver set, no broadcast; only the
    ≤(K+1)-row census leaves the cluster.

    Like ``pagerank_parts``, the Dataset plan re-ships the static edges
    every hop; above ``actor_edge_threshold`` directed edge rows it
    promotes to ``khop_actor_mode`` (edges staged once, bucket-pinned
    actors, ref-only candidate routing) — pair-asserted identical."""
    BIG = np.int64(1 << 40)
    MIX = np.uint64(0x9E3779B97F4A7C15)
    B = np.uint64(num_buckets)

    def bucket_of(nodes: np.ndarray) -> np.ndarray:
        return (((nodes.astype(np.uint64) * MIX) >> np.uint64(32)) % B).astype(
            np.int64
        )

    # union schema: side 0 = edge (a=src, b=dst); side 1 = state (a=node, b=dist)
    def to_edges(t: pa.Table) -> pa.Table:
        x = t["part_a"].to_numpy()
        y = t["part_b"].to_numpy()
        src = np.concatenate([x, y]).astype(np.int64)
        dst = np.concatenate([y, x]).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(bucket_of(src)),
                "side": pa.array(np.zeros(len(src), np.int8)),
                "a": pa.array(src),
                "b": pa.array(dst),
            }
        )

    pairs = _part_pair_counts_ds(sf_dir).materialize()
    if actor_edge_threshold and 2 * pairs.count() > actor_edge_threshold:
        from data_exchange_routing_ray.functions.graph_actors import (
            khop_actor_mode,
        )

        with tempfile.TemporaryDirectory(prefix="khopstage-") as d:
            return khop_actor_mode(pairs, d, k=k)
    edges = pairs.map_batches(to_edges, batch_format="pyarrow").materialize()

    def init_state(g: pd.DataFrame) -> pa.Table:
        nodes = np.unique(g["a"].to_numpy(np.int64))
        dist = np.where(nodes % 97 == 0, np.int64(0), BIG)
        return pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "bucket": np.full(len(nodes), int(g["bucket"].iloc[0]), np.int64),
                    "side": np.ones(len(nodes), np.int8),
                    "a": nodes,
                    "b": dist,
                }
            ),
            preserve_index=False,
        )

    state = (
        edges.groupby("bucket")
        .map_groups(init_state, batch_format="pandas")
        .materialize()
    )

    for hop in range(1, k + 1):
        h = hop  # bind per-iteration for the closures

        def expand(g: pd.DataFrame, h=h) -> pa.Table:
            st = g[g["side"] == 1]
            frontier = st[st["b"] == h - 1]
            out = [st]
            if len(frontier):
                ed = g[g["side"] == 0]
                cand = ed[ed["a"].isin(frontier["a"])]
                if len(cand):
                    dst = cand["b"].to_numpy(np.int64)
                    out.append(
                        pd.DataFrame(
                            {
                                "bucket": bucket_of(dst),
                                "side": np.full(len(dst), 2, np.int8),
                                "a": dst,
                                "b": np.full(len(dst), h, np.int64),
                            }
                        )
                    )
            return pa.Table.from_pandas(
                pd.concat(out, ignore_index=True), preserve_index=False
            )

        def fold(g: pd.DataFrame) -> pa.Table:
            # min dist across existing state (side 1) and candidates (side 2)
            m = g.groupby("a", as_index=False).agg(b=("b", "min"))
            m["bucket"] = int(g["bucket"].iloc[0])
            m["side"] = np.int8(1)
            return pa.Table.from_pandas(
                m[["bucket", "side", "a", "b"]], preserve_index=False
            )

        state = (
            edges.union(state)
            .groupby("bucket")
            .map_groups(expand, batch_format="pandas")
            .groupby("bucket")
            .map_groups(fold, batch_format="pandas")
            .materialize()
        )

    def census(t: pa.Table) -> pa.Table:
        d = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = d[d <= k]
        cnt = np.bincount(d, minlength=k + 1)
        return pa.table(
            {
                "dist": pa.array(np.arange(k + 1, dtype=np.int64)),
                "n_nodes": pa.array(cnt.astype(np.int64)),
            }
        )

    parts = state.map_batches(census, batch_format="pyarrow").to_pandas()
    out = parts.groupby("dist", as_index=False).agg(n_nodes=("n_nodes", "sum"))
    return pa.Table.from_pandas(
        out.sort_values("dist").reset_index(drop=True), preserve_index=False
    )


def _rank_ranged(totals, key_col: str, ascending: bool, n_ranges: int = 16):
    """Range-partition a dataset on one numeric key for EXACT global
    ranking (the ntile_users_by_spend plan, factored): driver-sampled
    boundaries steer load only — equal keys always land in one range, so
    any within-range tiebreak stays local and global position = range
    offset + local index. Returns (ranged_ds, {rng: offset}, total_n)."""
    import ray as _ray

    sign = 1 if ascending else -1
    sample = totals.random_sample(0.1, seed=7).limit(4096).to_pandas()
    if len(sample) >= n_ranges:
        keys = np.sort(sign * sample[key_col].to_numpy())
        bounds = keys[np.linspace(0, len(keys) - 1, n_ranges + 1).astype(int)][1:-1]
    else:
        bounds = np.array([], dtype=np.int64)
    bref = _ray.put(bounds)

    def assign(b: pa.Table) -> pa.Table:
        bs = _ray.get(bref)
        ck = sign * b[key_col].to_numpy()
        rng = (
            np.searchsorted(bs, ck, side="left")
            if len(bs)
            else np.zeros(b.num_rows, np.int64)
        )
        return b.append_column("rng", pa.array(rng.astype(np.int64)))

    ranged = totals.map_batches(assign, batch_format="pyarrow").materialize()
    counts = (
        ranged.groupby("rng").aggregate(Count(alias_name="cnt")).to_pandas()
        .sort_values("rng")
    )
    total_n = int(counts["cnt"].sum())
    offs = dict(
        zip(
            counts["rng"].astype(int),
            np.concatenate([[0], np.cumsum(counts["cnt"].to_numpy())[:-1]]).astype(int),
        )
    )
    return ranged, offs, total_n


def session_duration_deciles(sf_dir: str, gap_seconds: float = 1800.0) -> pa.Table:
    """Exact decile boundaries of session durations (sessionize_events'
    30-min-gap semantics): a composite of the session derivation (one
    user-hash bucket exchange, vectorized boundary masks) and the exact
    distributed order-statistic plan (_rank_ranged): each duration range
    knows its global offset, so the range holding rank r_q emits that
    decile's value locally — no global sort materialization, no driver
    collection of the duration set."""
    import ray as _ray

    def bucket(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy()
        bk = (uid * np.int64(0x9E3779B9)) % 256
        return b.append_column("bucket", pa.array(bk.astype(np.int64), pa.int64()))

    def durations(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = g["user_id"].to_numpy()
        t = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        gap = np.r_[np.inf, np.diff(t) / 1e6]
        new_sess = new_user | (gap > gap_seconds)
        starts = np.flatnonzero(new_sess)
        ends = np.r_[starts[1:], len(t)]
        return pd.DataFrame({"dur_us": t[ends - 1] - t[starts]})

    durs = (
        _events(sf_dir, columns=["user_id", "event_id", "ts"])
        .map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(durations, batch_format="pandas")
    )
    ranged, offs, n = _rank_ranged(durs, "dur_us", ascending=True)
    ranks = {q: (q * (n - 1)) // 10 for q in range(1, 10)}
    rref = _ray.put((offs, ranks))

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        offsets, rks = _ray.get(rref)
        off = offsets[int(g["rng"].iloc[0])]
        v = np.sort(g["dur_us"].to_numpy())
        rows = [
            (q, int(v[r - off]))
            for q, r in rks.items()
            if off <= r < off + len(v)
        ]
        return pd.DataFrame(rows, columns=["decile", "dur_us"]).astype(np.int64)

    out = ranged.groupby("rng").map_groups(pick, batch_format="pandas").to_pandas()
    return pa.Table.from_pandas(
        out.sort_values("decile").reset_index(drop=True), preserve_index=False
    )


def rfm_segments(sf_dir: str, tiles: int = 5) -> pa.Table:
    """RFM customer segmentation (recency / frequency / monetary), the
    marketing-analytics composite: per-customer aggregates by ONE
    custkey-hash bucket reduce, then THREE exact global quantile passes
    (_rank_ranged — rank = range offset + local sorted index, tiebreak
    custkey never crosses ranges), merged back per customer in one final
    custkey-hash exchange; only the ≤tiles³ segment histogram reaches the
    driver."""
    import ray as _ray

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "o_custkey": b["o_custkey"].to_numpy(),
                "d": b["o_orderdate"].to_numpy().astype("datetime64[D]").astype(np.int64),
                "m": np.floor(b["o_totalprice"].to_numpy() * 100.0).astype(np.int64),
            }
        )
        g = df.groupby("o_custkey", as_index=False).agg(
            lastd=("d", "max"), f=("d", "size"), m=("m", "sum")
        )
        g["bucket"] = (
            g["o_custkey"].to_numpy().astype(np.uint64) * np.uint64(2654435761)
        ) % np.uint64(64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def reduce_cust(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("o_custkey", as_index=False).agg(
            lastd=("lastd", "max"), f=("f", "sum"), m=("m", "sum")
        )

    cust = (
        _read_sized(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_custkey", "o_orderdate", "o_totalprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(reduce_cust, batch_format="pandas")
        .materialize()
    )
    maxd = int(cust.max("lastd"))
    cust = cust.map_batches(
        lambda b: pa.table(
            {
                "o_custkey": b["o_custkey"],
                "r_days": pa.array(maxd - b["lastd"].to_numpy()),
                "f": b["f"],
                "m": b["m"],
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    def quintiles_for(metric: str) -> ray.data.Dataset:
        ranged, offs, n = _rank_ranged(cust, metric, ascending=True)
        oref = _ray.put(offs)

        def score(g: pd.DataFrame) -> pd.DataFrame:
            off = _ray.get(oref)[int(g["rng"].iloc[0])]
            g = g.sort_values([metric, "o_custkey"], kind="stable")
            pos = off + np.arange(len(g))
            return pd.DataFrame(
                {
                    "o_custkey": g["o_custkey"].astype(np.int64),
                    "q": (pos * tiles // n + 1).astype(np.int64),
                }
            )

        return ranged.groupby("rng").map_groups(score, batch_format="pandas")

    def tag_scored(which: int):
        def f(b: pa.Table) -> pa.Table:
            ck = b["o_custkey"].to_numpy()
            return pa.table(
                {
                    "o_custkey": b["o_custkey"],
                    "q": b["q"],
                    "which": pa.array(np.full(len(ck), which, np.int64)),
                    "bucket": pa.array(
                        ((ck.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(64)).astype(np.int64)
                    ),
                }
            )
        return f

    scored = (
        quintiles_for("r_days").map_batches(tag_scored(100), batch_format="pyarrow")
        .union(quintiles_for("f").map_batches(tag_scored(10), batch_format="pyarrow"))
        .union(quintiles_for("m").map_batches(tag_scored(1), batch_format="pyarrow"))
    )

    def fold_segments(g: pd.DataFrame) -> pd.DataFrame:
        # segment code = Σ q·which per customer — a vectorized groupby-sum
        # (which ∈ {100, 10, 1} place-encodes the three quintile digits)
        qw = g["q"].to_numpy(np.int64) * g["which"].to_numpy(np.int64)
        seg = (
            pd.DataFrame({"o_custkey": g["o_custkey"].to_numpy(np.int64), "qw": qw})
            .groupby("o_custkey", as_index=False)["qw"]
            .sum()
        )
        out = (
            seg["qw"].value_counts().rename_axis("segment").reset_index(name="n_customers")
        )
        return out.astype(np.int64)

    out = (
        scored.groupby("bucket")
        .map_groups(fold_segments, batch_format="pandas")
        .groupby("segment")
        .aggregate(Sum("n_customers", alias_name="n_customers"))
        .to_pandas()
        .astype(np.int64)
    )
    return pa.Table.from_pandas(
        out.sort_values("segment").reset_index(drop=True), preserve_index=False
    )


def conv_edit_churn(sf_dir: str) -> pa.Table:
    """Per-conversation edit-churn audit over the CDC stream: total ops,
    distinct turns updated at least once, distinct turns deleted at least
    once — the producer-behavior telemetry an ingest operator watches.
    ONE conv-hash bucket exchange of slim (conv, turn, op) rows; in-bucket
    the distinct counts are two drop_duplicates over the whole frame."""
    from data_exchange_routing_ray.hashing import stable_hash_strings

    def bucketize(b: pa.Table) -> pa.Table:
        h = stable_hash_strings(b["conv_id"].combine_chunks())
        return pa.table(
            {
                "conv_id": b["conv_id"],
                "turn_idx": b["turn_idx"].cast(pa.int64()),
                "op": b["op"],
                "bucket": pa.array((h % np.uint64(64)).astype(np.int64)),
            }
        )

    def churn(g: pd.DataFrame) -> pd.DataFrame:
        n_ops = g.groupby("conv_id", as_index=False).size().rename(columns={"size": "n_ops"})
        upd = (
            g[g["op"] == "update"][["conv_id", "turn_idx"]]
            .drop_duplicates()
            .groupby("conv_id", as_index=False)
            .size()
            .rename(columns={"size": "n_turns_updated"})
        )
        dele = (
            g[g["op"] == "delete"][["conv_id", "turn_idx"]]
            .drop_duplicates()
            .groupby("conv_id", as_index=False)
            .size()
            .rename(columns={"size": "n_turns_deleted"})
        )
        out = n_ops.merge(upd, on="conv_id", how="left").merge(dele, on="conv_id", how="left")
        for c in ("n_turns_updated", "n_turns_deleted"):
            out[c] = out[c].fillna(0).astype(np.int64)
        out["n_ops"] = out["n_ops"].astype(np.int64)
        return out

    out = (
        derived_change_stream(sf_dir)
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(churn, batch_format="pandas")
        .to_pandas()
    )
    return pa.Table.from_pandas(
        out.sort_values("conv_id").reset_index(drop=True), preserve_index=False
    )


def time_to_first_purchase(sf_dir: str) -> pa.Table:
    """Conversion-latency histogram: hours from each user's FIRST event to
    their FIRST 'purchase' (bucket −1 = never purchased). Per-batch
    per-user min partials → one user-hash bucket reduce → per-bucket
    histogram partials → a final ≤|buckets| sum; no full-row shuffle, no
    driver per-user state."""

    # sentinel 2**62 (exactly float64-representable, though the path below
    # never leaves int64): "no purchase yet"; survives min-folds untouched
    _NOP = np.int64(1) << 62

    def partial(b: pa.Table) -> pa.Table:
        tsu = b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        is_p = b["event_type"].to_numpy(zero_copy_only=False) == "purchase"
        df = pd.DataFrame(
            {
                "user_id": b["user_id"].to_numpy(),
                "tsu": tsu,
                "tsp": np.where(is_p, tsu, _NOP),
            }
        )
        g = df.groupby("user_id", as_index=False).agg(
            fe=("tsu", "min"), fp=("tsp", "min")
        )
        g["bucket"] = (
            g["user_id"].to_numpy().astype(np.uint64) * np.uint64(2654435761)
        ) % np.uint64(64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g.groupby("user_id", as_index=False).agg(fe=("fe", "min"), fp=("fp", "min"))
        never = u["fp"] == _NOP
        hb = np.where(never, -1, (u["fp"] - u["fe"]) // 3_600_000_000)
        out = (
            pd.Series(hb).value_counts().rename_axis("hours_bucket").reset_index(name="n_users")
        )
        return out.astype(np.int64)

    out = (
        _events(sf_dir, columns=["user_id", "ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .groupby("hours_bucket")
        .aggregate(Sum("n_users", alias_name="n_users"))
        .to_pandas()
        .astype(np.int64)
    )
    return pa.Table.from_pandas(
        out.sort_values("hours_bucket").reset_index(drop=True), preserve_index=False
    )


def group_txn_two_lakes(sf_dir: str) -> pa.Table:
    """Multi-table transactional group commit, driver-checked end-to-end:
    the derived change stream splits into two lakes (even/odd users), the
    group transaction CRASHES after lake 'even' publishes but before
    'odd' applies, consistent readers are verified to still see the empty
    pre-state, then roll-forward recovery commits the group (the fenced
    re-apply of 'even' is a no-op). Output = per-lake final counts, which
    must equal the SQL final-state oracle per parity — proving atomic
    visibility AND exactly-once under the crash. See state/group_txn.py
    (reference analog: FnOrchestrator fanInFailIfAnyFail + the router's
    multi-destination expansion)."""
    from data_exchange_routing_ray.state.group_txn import GroupTransaction

    stream = derived_change_stream(sf_dir).materialize()

    def split(parity: int):
        def f(b: pa.Table) -> pa.Table:
            uid = pc.cast(pc.utf8_slice_codeunits(b["conv_id"], 5, 11), pa.int64())
            return b.filter(pc.equal(pc.bit_wise_and(uid, 1), parity))
        return f

    with tempfile.TemporaryDirectory(prefix="grouptxn-") as d:
        lakes = {
            "even": CDCLake(os.path.join(d, "lake_even"), num_partitions=8),
            "odd": CDCLake(os.path.join(d, "lake_odd"), num_partitions=8),
        }
        txn = GroupTransaction(os.path.join(d, "journal"), lakes)

        def apply_even(lake):
            return lake.apply_changes(
                stream.map_batches(split(0), batch_format="pyarrow"),
                quarantine=False,
            )

        def apply_odd(lake):
            return lake.apply_changes(
                stream.map_batches(split(1), batch_format="pyarrow"),
                quarantine=False,
            )

        def boom(lake):
            raise RuntimeError("injected crash before lake odd applies")

        try:
            txn.run({"even": apply_even, "odd": boom})
        except RuntimeError:
            pass
        # partial group is invisible to consistent readers
        pins = txn.consistent_epochs()
        assert pins == {"even": -1, "odd": -1}, pins
        assert len(txn.journal.pending()) == 1
        # roll forward
        txn.recover({"even": apply_even, "odd": apply_odd})
        assert txn.journal.pending() == []

        rows = []
        for name in ("even", "odd"):
            t = lakes[name].final_table()
            n_convs = len(pc.unique(t["conv_id"]))
            rows.append((name, n_convs, t.num_rows))
    out = pd.DataFrame(rows, columns=["lake", "n_convs", "n_rows"])
    out["n_convs"] = out["n_convs"].astype(np.int64)
    out["n_rows"] = out["n_rows"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


# ------------------------------------------------------------- batch 22

def ann_quantized_topk(sf_dir: str, k: int = 10, min_recall: float = 0.8) -> pa.Table:
    """Scalar-quantized (int8) ANN: pass 1 computes per-dimension global
    min/max (per-batch 2-row partials, driver fold — the two-pass broadcast-
    stats pattern); pass 2 materializes the QUANTIZED index (8× smaller
    than float64 — what would live in the object store / on disk at 100 TB)
    and searches it per batch (dequantize → cosine → local top-k → tiny
    driver reduce). In-query gate: recall@k vs the exact float64 top-k must
    be ≥ ``min_recall`` or the query raises — quality enforced, not just
    row shape."""
    import ray as _ray

    from data_exchange_routing_ray.functions.similarity import topk_cosine

    ds = _embeddings(sf_dir, min_blocks=8)

    def minmax(b: pa.Table) -> pa.Table:
        from data_exchange_routing_ray.functions.similarity import list_col_matrix

        M = list_col_matrix(b["embedding"])
        return pa.table(
            {
                "kind": pa.array(["min", "max"]),
                "v": pa.array([M.min(axis=0).tobytes(), M.max(axis=0).tobytes()], pa.binary()),
            }
        )

    mm = ds.map_batches(minmax, batch_format="pyarrow").to_pandas()
    lo = np.min(np.stack([np.frombuffer(v) for v in mm[mm["kind"] == "min"]["v"]]), axis=0)
    hi = np.max(np.stack([np.frombuffer(v) for v in mm[mm["kind"] == "max"]["v"]]), axis=0)
    scale = np.where(hi > lo, (hi - lo) / 255.0, 1.0)
    pref = _ray.put((lo, scale))

    def quantize(b: pa.Table) -> pa.Table:
        from data_exchange_routing_ray.functions.dedup import _pack_rows
        from data_exchange_routing_ray.functions.similarity import list_col_matrix

        lo_, sc_ = _ray.get(pref)
        M = list_col_matrix(b["embedding"])
        Q = np.clip(np.round((M - lo_) / sc_), 0, 255).astype(np.uint8)
        return pa.table(
            {
                "vec_id": b["vec_id"].cast(pa.int64()),
                "qvec": _pack_rows(Q),
            }
        )

    index = ds.map_batches(quantize, batch_format="pyarrow").materialize()

    q_raw = np.asarray(
        ds.filter(expr="vec_id == 0").take(1)[0]["embedding"], dtype=np.float64
    )
    qn = q_raw / (np.linalg.norm(q_raw) or 1.0)
    qref = _ray.put(qn)

    def search(b: pa.Table) -> pa.Table:
        lo_, sc_ = _ray.get(pref)
        qv = _ray.get(qref)
        from data_exchange_routing_ray.functions.dedup import _sig_matrix

        Q = _sig_matrix(b["qvec"], int(lo_.shape[0]), np.uint8)
        M = Q.astype(np.float64) * sc_ + lo_
        nrm = np.sqrt(np.einsum("ij,ij->i", M, M))
        nrm[nrm == 0] = 1.0
        s = (M @ qv) / nrm
        kk = min(k, len(s))
        idx = np.argpartition(-s, kk - 1)[:kk]
        return pa.table(
            {
                "vec_id": b["vec_id"].take(pa.array(idx)),
                "cosine_q": pa.array(np.round(s[idx], 6), pa.float64()),
            }
        )

    cand = index.map_batches(search, batch_format="pyarrow").to_pandas()
    out = cand.sort_values(
        ["cosine_q", "vec_id"], ascending=[False, True], kind="stable"
    ).head(k).reset_index(drop=True)

    exact = topk_cosine(_embeddings(sf_dir), q_raw, k=k)
    recall = len(set(out["vec_id"]) & set(exact["vec_id"])) / k
    if recall < min_recall:
        raise AssertionError(
            f"ann_quantized_topk recall@{k} {recall:.3f} < {min_recall} vs exact"
        )
    return pa.Table.from_pandas(out, preserve_index=False)


def vocab_coverage_by_source(sf_dir: str, vocab_k: int = 10) -> pa.Table:
    """Tokenizer-vocabulary coverage per source: pass 1 builds the global
    top-``vocab_k`` vocabulary (word-hash bucket reduce — each word's count
    completes inside ONE bucket, so per-bucket top-k then a driver merge of
    64 tiny leader lists is EXACT); pass 2 broadcasts the vocab set and
    folds per-source (n_tokens, n_in_vocab) scalar partials per batch —
    zero full-row shuffles, vocabulary never leaves the reduce buckets."""
    import ray as _ray

    def wc_partial(b: pa.Table) -> pa.Table:
        words = pc.list_flatten(pc.split_pattern(b["text"], " "))
        s = pd.Series(words.to_numpy(zero_copy_only=False))
        vc = s.value_counts()
        out = pd.DataFrame({"word": vc.index, "n": vc.to_numpy()})
        out["bucket"] = (
            pd.util.hash_array(out["word"].to_numpy(dtype=object)) % 64
        ).astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("word", as_index=False).agg(n=("n", "sum"))
        return agg.sort_values(
            ["n", "word"], ascending=[False, True], kind="stable"
        ).head(vocab_k)

    leaders = (
        _documents(sf_dir, columns=["text"])
        .map_batches(wc_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_topk, batch_format="pandas")
        .to_pandas()
    )
    vocab = set(
        leaders.sort_values(["n", "word"], ascending=[False, True], kind="stable")
        .head(vocab_k)["word"]
    )
    vref = _ray.put(vocab)

    def coverage(b: pa.Table) -> pa.Table:
        vs = _ray.get(vref)
        lst = pc.split_pattern(b["text"], " ")
        la = lst.combine_chunks() if isinstance(lst, pa.ChunkedArray) else lst
        flat = la.flatten().to_numpy(zero_copy_only=False)
        inv = np.isin(flat, list(vs))
        off = la.offsets.to_numpy()
        cs = np.concatenate([[0], np.cumsum(inv)])
        per_doc_in = cs[off[1:]] - cs[off[:-1]]
        df = pd.DataFrame(
            {
                "source": b["source"].to_numpy(zero_copy_only=False),
                "n_tokens": off[1:] - off[:-1],
                "n_in_vocab": per_doc_in,
            }
        )
        return pa.Table.from_pandas(
            df.groupby("source", as_index=False).sum(), preserve_index=False
        )

    out = (
        _documents(sf_dir, columns=["source", "text"])
        .map_batches(coverage, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("n_in_vocab", alias_name="n_in_vocab"),
        )
        .to_pandas()
    )
    for c in ("n_tokens", "n_in_vocab"):
        out[c] = out[c].astype(np.int64)
    return pa.Table.from_pandas(
        out.sort_values("source").reset_index(drop=True), preserve_index=False
    )


def local_clustering_top_parts(sf_dir: str, min_support: int = 2, k: int = 20) -> pa.Table:
    """Per-node triangle participation + degree (local clustering inputs)
    over the co-purchase graph — the node-level companion of
    triangle_count_parts. Same oriented node-iterator plan, but wedges
    carry their apex x and matched triangles fan out to all three member
    nodes; per-bucket (node, n_triangles) partials reduce in one exchange;
    degrees fold from the edge list the same way. Top-k by triangles is
    deterministic (count desc, part asc)."""

    edges = (
        _part_pair_counts_ds(sf_dir)
        .map_batches(
            lambda b: b.filter(pc.greater_equal(b["n_orders"], min_support)).select(
                ["part_a", "part_b"]
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def tag_by_a(b: pa.Table) -> pa.Table:
        a = b["part_a"].to_numpy()
        return b.append_column(
            "abucket",
            pa.array(((a.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(64)).astype(np.int64)),
        )

    def wedges_with_apex(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["part_a", "part_b"], kind="stable")
        a = g["part_a"].to_numpy()
        bnb = g["part_b"].to_numpy()
        starts = np.flatnonzero(np.r_[True, a[1:] != a[:-1]])
        lens = np.diff(np.r_[starts, len(a)])
        npairs = lens * (lens - 1) // 2
        tot = int(npairs.sum())
        if tot == 0:
            return pd.DataFrame(
                {"x": pd.Series(dtype=np.int64), "y": pd.Series(dtype=np.int64),
                 "z": pd.Series(dtype=np.int64)}
            )
        run_id = np.repeat(np.arange(len(lens)), npairs)
        off = np.concatenate([[0], np.cumsum(npairs)[:-1]])
        r = np.arange(tot) - off[run_id]
        m = lens[run_id]
        rr = npairs[run_id] - 1 - r
        i_rev = ((np.sqrt(8.0 * rr + 1.0) - 1.0) // 2.0).astype(np.int64)
        i = m - 2 - i_rev
        j = r - (i * (2 * m - i - 1)) // 2 + i + 1
        base = starts[run_id]
        return pd.DataFrame(
            {"x": a[base], "y": bnb[base + i], "z": bnb[base + j]}
        )

    wedges = (
        edges.map_batches(tag_by_a, batch_format="pyarrow")
        .groupby("abucket")
        .map_groups(wedges_with_apex, batch_format="pandas")
    )

    def tag_yz(is_edge: int, ycol: str, zcol: str, xcol: str | None):
        def f(b: pa.Table) -> pa.Table:
            y = b[ycol].to_numpy()
            z = b[zcol].to_numpy()
            x = b[xcol].to_numpy() if xcol else np.zeros(len(y), np.int64)
            return pa.table(
                {
                    "x": pa.array(x.astype(np.int64)),
                    "y": pa.array(y.astype(np.int64)),
                    "z": pa.array(z.astype(np.int64)),
                    "is_edge": pa.array(np.full(len(y), is_edge, np.int64)),
                    "pbucket": pa.array(
                        ((y.astype(np.uint64) * np.uint64(0x9E3779B9)
                          + z.astype(np.uint64)) % np.uint64(64)).astype(np.int64)
                    ),
                }
            )
        return f

    probe = wedges.map_batches(tag_yz(0, "y", "z", "x"), batch_format="pyarrow").union(
        edges.map_batches(tag_yz(1, "part_a", "part_b", None), batch_format="pyarrow")
    )

    def node_tri_partials(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["is_edge"] == 1][["y", "z"]].drop_duplicates()
        w = g[g["is_edge"] == 0]
        if len(e) == 0 or len(w) == 0:
            return pd.DataFrame({"node": pd.Series(dtype=np.int64), "nt": pd.Series(dtype=np.int64)})
        hit = w.merge(e, on=["y", "z"], how="inner")
        nodes = pd.concat([hit["x"], hit["y"], hit["z"]], ignore_index=True)
        vc = nodes.value_counts()
        return pd.DataFrame({"node": vc.index.astype(np.int64), "nt": vc.to_numpy().astype(np.int64)})

    tri = (
        probe.groupby("pbucket")
        .map_groups(node_tri_partials, batch_format="pandas")
        .groupby("node")
        .aggregate(Sum("nt", alias_name="n_triangles"))
        .to_pandas()
    )

    def deg_partial(b: pa.Table) -> pa.Table:
        nodes = np.concatenate([b["part_a"].to_numpy(), b["part_b"].to_numpy()])
        vc = pd.Series(nodes).value_counts()
        return pa.table(
            {"node": pa.array(vc.index.to_numpy().astype(np.int64)),
             "d": pa.array(vc.to_numpy().astype(np.int64))}
        )

    deg = (
        edges.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("d", alias_name="degree"))
        .to_pandas()
    )
    out = tri.merge(deg, on="node", how="inner").rename(columns={"node": "part"})
    out = out.sort_values(
        ["n_triangles", "part"], ascending=[False, True], kind="stable"
    ).head(k).reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return pa.Table.from_pandas(out[["part", "n_triangles", "degree"]], preserve_index=False)


# ------------------------------------------------------------- batch 23

def hard_negative_mining(sf_dir: str, k: int = 5) -> pa.Table:
    """Hard-negative mining for contrastive training: for one anchor per
    label (min vec_id — deterministic), the top-k most-similar vectors of
    a DIFFERENT label. Same batched-matmul shape as ann_batch_topk (one
    broadcast query matrix, per-block masked top-k, tiny driver reduce);
    the label mask runs inside the block, so corpus rows never leave
    workers. Exact float64 cosine ⇒ fully oracle-verifiable."""
    from data_exchange_routing_ray.functions.similarity import batch_topk_cosine

    ds = _embeddings(sf_dir)
    mins = (
        ds.groupby("label")
        .aggregate(Min("vec_id", alias_name="vec_id"))
        .to_pandas()
        .sort_values("vec_id")
    )
    ids = np.asarray(mins["vec_id"].astype(np.int64))
    qdf = (
        ds.map_batches(
            lambda b: b.filter(pc.is_in(b["vec_id"], pa.array(ids, pa.int64()))),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    out = batch_topk_cosine(
        ds,
        np.stack(qdf["embedding"].to_numpy()).astype(np.float64),
        qdf["vec_id"].to_numpy(),
        k=k,
        exclude_label_col="label",
        query_labels=qdf["label"].to_numpy(),
    )
    return pa.Table.from_pandas(
        out[["query_id", "vec_id", "cosine"]], preserve_index=False
    )


def zorder_pruned_read(sf_dir: str) -> pa.Table:
    """Z-order (Morton) multi-dimensional clustering + pruned read — the
    100 TB data-layout technique: lineitem is rewritten SORTED BY the bit-
    interleave of (l_partkey, l_suppkey) into small row groups, then a 2-D
    box query reads it back through parquet row-group statistics pruning.
    The distributed sort is the one exchange (range-partitioned, never a
    driver materialization); the read plans from METADATA only — the
    in-query assertion verifies the box touches a strict subset of row
    groups (the point of the layout), then the filtered aggregate is
    value-checked against SQL."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as _pq

    src = _read_sized(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"],
    ).materialize()
    pmax = int(src.max("l_partkey"))
    smax = int(src.max("l_suppkey"))
    plo, phi = pmax // 4, pmax // 2
    slo, shi = smax // 4, smax // 2

    def zcode(b: pa.Table) -> pa.Table:
        x = b["l_partkey"].to_numpy().astype(np.uint64)
        y = b["l_suppkey"].to_numpy().astype(np.uint64)

        def spread(v: np.ndarray) -> np.ndarray:
            # spread 21 low bits to even positions (Morton)
            v = v & np.uint64((1 << 21) - 1)
            v = (v | (v << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
            v = (v | (v << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
            v = (v | (v << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
            v = (v | (v << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
            v = (v | (v << np.uint64(2))) & np.uint64(0x1249249249249249)
            return v

        z = spread(x) | (spread(y) << np.uint64(1))
        return b.append_column("zcode", pa.array(z.astype(np.int64)))

    with tempfile.TemporaryDirectory(prefix="zorder-") as d:
        out_dir = os.path.join(d, "zsorted")
        (
            src.map_batches(zcode, batch_format="pyarrow")
            .sort("zcode")
            .write_parquet(out_dir, row_group_size=1024)
        )

        # metadata-only pruning audit: row groups whose [min,max] stats
        # intersect the box vs total — clustering must make this a strict
        # subset (that is what the layout buys at 100 TB)
        total_rg, hit_rg = 0, 0
        for name in os.listdir(out_dir):
            if not name.endswith(".parquet"):
                continue
            md = _pq.ParquetFile(os.path.join(out_dir, name)).metadata
            sch = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                total_rg += 1
                ps = g.column(sch["l_partkey"]).statistics
                ss = g.column(sch["l_suppkey"]).statistics
                if ps.min <= phi and ps.max >= plo and ss.min <= shi and ss.max >= slo:
                    hit_rg += 1
        if total_rg > 8:
            assert hit_rg < total_rg, (
                f"z-order layout failed to prune: {hit_rg}/{total_rg} row "
                "groups intersect the 2-D box"
            )

        filt = (
            (pads.field("l_partkey") >= plo) & (pads.field("l_partkey") <= phi)
            & (pads.field("l_suppkey") >= slo) & (pads.field("l_suppkey") <= shi)
        )
        ds2 = ray.data.read_parquet(
            out_dir,
            columns=["l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"],
            filter=filt,
        )

        def agg_partial(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "n_rows": pa.array([b.num_rows], pa.int64()),
                    "sum_qty_ticks": pa.array(
                        [int(np.floor(b["l_quantity"].to_numpy() * 100.0).astype(np.int64).sum())],
                        pa.int64(),
                    ),
                    "sum_price_ticks": pa.array(
                        [int(np.floor(b["l_extendedprice"].to_numpy() * 100.0).astype(np.int64).sum())],
                        pa.int64(),
                    ),
                }
            )

        parts = ds2.map_batches(agg_partial, batch_format="pyarrow").to_pandas()
    return pa.table(
        {
            "n_rows": pa.array([int(parts["n_rows"].sum())], pa.int64()),
            "sum_qty_ticks": pa.array([int(parts["sum_qty_ticks"].sum())], pa.int64()),
            "sum_price_ticks": pa.array([int(parts["sum_price_ticks"].sum())], pa.int64()),
        }
    )


# ------------------------------------------------------------- batch 24

def cdc_wap_audit(sf_dir: str) -> pa.Table:
    """WRITE-AUDIT-PUBLISH through the driver gate: the first commit
    attempt runs under an audit that REJECTS the candidate epoch (after
    the full merge is staged) — verified to leave no visible state, no
    epoch advance; the retry runs under a row-conservation audit (staged
    candidate must hold exactly the live keys) and publishes. Output =
    the final census, matching the SQL final-state oracle — proving the
    audited commit is still exactly-once. See CDCLake.apply_changes
    (audit_fn) and read_manifest_table."""
    from data_exchange_routing_ray.pipelines.cdc import read_manifest_table

    stream = derived_change_stream(sf_dir).materialize()

    with tempfile.TemporaryDirectory(prefix="wap-") as d:
        lake = CDCLake(os.path.join(d, "lake"), num_partitions=16)

        def reject(man, lake_dir):
            raise AssertionError("planted audit rejection")

        try:
            lake.apply_changes(stream, quarantine=False, audit_fn=reject)
        except AssertionError:
            pass
        assert lake.manifest.epoch == -1, "rejected epoch must not publish"
        assert lake.final_table().num_rows == 0

        def conserve(man, lake_dir):
            t = read_manifest_table(man, lake_dir)
            keys = pa.table({"c": t["conv_id"], "k": t["turn_idx"]})
            n_keys = keys.group_by(["c", "k"]).aggregate([]).num_rows
            assert n_keys == t.num_rows, "duplicate keys in candidate epoch"
            assert t.num_rows > 0, "empty candidate epoch"

        lake.apply_changes(stream, quarantine=False, audit_fn=conserve)
        t = lake.final_table()
        n_convs = len(pc.unique(t["conv_id"]))
        return pa.table(
            {
                "n_convs": pa.array([n_convs], pa.int64()),
                "n_rows": pa.array([t.num_rows], pa.int64()),
            }
        )


def priority_ship_sla(sf_dir: str, sla_days: int = 30) -> pa.Table:
    """Order-priority SLA rollup: fraction of orders whose FIRST line
    ships within ``sla_days``. ONE orderkey-hash co-partitioned exchange:
    lineitem min-shipdate partials (per-batch combiner — raw lines never
    shuffle) co-group with order headers; the in-bucket left merge and the
    day arithmetic are vectorized; only per-priority scalar partials
    leave."""
    _NOS = np.int64(1) << 62  # "never shipped" sentinel, min-fold stable

    def li_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "okey": b["l_orderkey"].to_numpy(),
                "sd": b["l_shipdate"].to_numpy().astype("datetime64[D]").astype(np.int64),
            }
        )
        g = df.groupby("okey", as_index=False).agg(first_ship=("sd", "min"))
        g["bucket"] = (
            g["okey"].to_numpy().astype(np.uint64) * np.uint64(2654435761)
        ) % np.uint64(64)
        g["side"] = np.int64(0)
        g["pri"] = ""
        g["od"] = np.int64(0)
        return pa.Table.from_pandas(g, preserve_index=False)

    def o_tag(b: pa.Table) -> pa.Table:
        ok = b["o_orderkey"].to_numpy()
        return pa.table(
            {
                "okey": b["o_orderkey"],
                "first_ship": pa.array(np.full(len(ok), _NOS)),
                "bucket": pa.array(
                    ((ok.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(64)).astype(np.uint64)
                ),
                "side": pa.array(np.ones(len(ok), np.int64)),
                "pri": b["o_orderpriority"],
                "od": pa.array(
                    b["o_orderdate"].to_numpy().astype("datetime64[D]").astype(np.int64)
                ),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        li = g[g["side"] == 0]
        fs = li.groupby("okey")["first_ship"].min()
        o = g[g["side"] == 1]
        first = o["okey"].map(fs).fillna(_NOS).astype(np.int64).to_numpy()
        ok30 = (first != _NOS) & (first - o["od"].to_numpy() <= sla_days)
        out = pd.DataFrame({"o_orderpriority": o["pri"].to_numpy(), "one": 1, "s": ok30.astype(np.int64)})
        return out.groupby("o_orderpriority", as_index=False).agg(
            n_orders=("one", "sum"), n_shipped_sla=("s", "sum")
        )

    li = _read_sized(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_orderkey", "l_shipdate"]
    ).map_batches(li_partial, batch_format="pyarrow")
    orders = _read_sized(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderpriority", "o_orderdate"],
    ).map_batches(o_tag, batch_format="pyarrow")

    out = (
        li.union(orders)
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .groupby("o_orderpriority")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("n_shipped_sla", alias_name="n_shipped_sla"),
        )
        .to_pandas()
    )
    for c in ("n_orders", "n_shipped_sla"):
        out[c] = out[c].astype(np.int64)
    return pa.Table.from_pandas(
        out.sort_values("o_orderpriority").reset_index(drop=True), preserve_index=False
    )


# ------------------------------------------------------------- batch 25

def cdc_quarantine_replay(sf_dir: str) -> pa.Table:
    """The operational dead-letter loop, end-to-end: corrupt stream →
    validation quarantines four error classes → the REPAIRABLE class
    (unsupported op) is read back from the dead-letter store, repaired
    deterministically (op := update) and RE-ENQUEUED: like a real queue
    redelivery it gets a NEW offset (seq + stream-high), so the normal
    fence admits it and LWW orders it after everything it originally lost
    to. (Replaying the RAW seq below the watermark would resurrect
    deleted keys — the lake keeps no tombstone seq to fence against; the
    re-enqueue offset is the correct dead-letter semantics.) Census of
    the final state + repair count must match the SQL oracle that models
    the re-enqueue inline."""
    stream = derived_change_stream(sf_dir, corrupt=True)
    bad_op_err = "Unsupported op; expected insert|update|delete"
    hi = int(_events(sf_dir, columns=["event_id"]).max("event_id")) + 1

    with tempfile.TemporaryDirectory(prefix="qreplay-") as d:
        lake = CDCLake(os.path.join(d, "lake"), num_partitions=16)
        lake.apply_changes(stream)
        qt = lake.quarantine_table()
        assert qt is not None and qt.num_rows > 0
        rep = qt.filter(pc.equal(qt["error"], bad_op_err)).drop_columns(["error"])
        n_repaired = rep.num_rows
        rep = rep.set_column(
            rep.schema.get_field_index("op"),
            "op",
            pa.array(["update"] * n_repaired, pa.string()),
        )
        rep = rep.set_column(
            rep.schema.get_field_index("seq"),
            "seq",
            pc.add(rep["seq"], hi),
        )
        lake.apply_changes(ray.data.from_arrow(rep), quarantine=False)
        t = lake.final_table()
        n_convs = len(pc.unique(t["conv_id"]))
        return pa.table(
            {
                "n_repaired": pa.array([n_repaired], pa.int64()),
                "n_convs": pa.array([n_convs], pa.int64()),
                "n_rows": pa.array([t.num_rows], pa.int64()),
            }
        )


def rate_limit_audit(sf_dir: str, window_s: int = 60) -> pa.Table:
    """Peak-burst audit (sliding-window rate limiting): each user's max
    event count inside ANY trailing-anchored ``window_s`` window, folded
    to a burst histogram. ONE user-hash bucket exchange; in-bucket the
    per-event window count is two vectorized searchsorted probes over the
    user's sorted timestamp run (peer-inclusive, matching SQL RANGE frame
    semantics) — no per-event Python, no pairwise expansion."""

    def bucket(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy()
        bk = (uid * np.int64(0x9E3779B9)) % 256
        return pa.table(
            {
                "user_id": b["user_id"],
                "tsu": pa.array(
                    b["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
                ),
                "bucket": pa.array(bk.astype(np.int64)),
            }
        )

    def burst(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "tsu"], kind="stable")
        uid = g["user_id"].to_numpy()
        t = g["tsu"].to_numpy()
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        ends = np.r_[starts[1:], len(t)]
        users, bursts = [], []
        for s, e in zip(starts, ends):
            tt = t[s:e]
            hi = np.searchsorted(tt, tt + window_s * 1_000_000, side="right")
            lo = np.searchsorted(tt, tt, side="left")
            users.append(uid[s])
            bursts.append(int((hi - lo).max()))
        out = pd.DataFrame({"burst": bursts})
        return out.groupby("burst", as_index=False).size().rename(columns={"size": "n_users"})

    out = (
        _events(sf_dir, columns=["user_id", "ts"])
        .map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(burst, batch_format="pandas")
        .groupby("burst")
        .aggregate(Sum("n_users", alias_name="n_users"))
        .to_pandas()
        .astype(np.int64)
    )
    return pa.Table.from_pandas(
        out.sort_values("burst").reset_index(drop=True), preserve_index=False
    )


def conv_tool_run_lengths(sf_dir: str) -> pa.Table:
    """Gaps-and-islands over the MERGED final state: each conversation's
    longest run of consecutive turns using the same tool, as a histogram.
    Latest-op argmax combiner per batch → ONE conv-hash exchange → whole
    conversation resolves in-bucket (same shape as transcript assembly);
    run lengths are one boundary mask + diff over the sorted frame."""

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "conv_id": b["conv_id"].to_numpy(zero_copy_only=False),
                "turn_idx": b["turn_idx"].to_numpy().astype(np.int64),
                "seq": b["seq"].to_numpy(),
                "op": b["op"].to_numpy(zero_copy_only=False),
                "tool": b["tool"].to_numpy(zero_copy_only=False),
            }
        )
        idx = df.groupby(["conv_id", "turn_idx"], sort=False)["seq"].idxmax()
        w = df.loc[idx].reset_index(drop=True)
        uid = w["conv_id"].str[5:].astype(np.int64).to_numpy()
        w["bucket"] = (
            (uid.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(64)
        ).astype(np.int64)
        return pa.Table.from_pandas(w, preserve_index=False)

    def runs(g: pd.DataFrame) -> pd.DataFrame:
        idx = g.groupby(["conv_id", "turn_idx"], sort=False)["seq"].idxmax()
        w = g.loc[idx]
        live = w[w["op"] != "delete"].sort_values(["conv_id", "turn_idx"], kind="stable")
        if not len(live):
            return pd.DataFrame({"max_run": pd.Series(dtype=np.int64),
                                 "n_convs": pd.Series(dtype=np.int64)})
        cid = live["conv_id"].to_numpy()
        tool = live["tool"].to_numpy()
        brk = np.r_[True, (cid[1:] != cid[:-1]) | (tool[1:] != tool[:-1])]
        run_id = np.cumsum(brk) - 1
        run_len = np.bincount(run_id)
        # max run per conv: conv of each run = cid at run starts
        run_conv = cid[np.flatnonzero(brk)]
        mr = pd.DataFrame({"conv_id": run_conv, "rl": run_len}).groupby(
            "conv_id"
        )["rl"].max()
        out = mr.value_counts().rename_axis("max_run").reset_index(name="n_convs")
        return out.astype({"max_run": np.int64, "n_convs": np.int64})

    out = (
        derived_change_stream(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(runs, batch_format="pandas")
        .groupby("max_run")
        .aggregate(Sum("n_convs", alias_name="n_convs"))
        .to_pandas()
        .astype(np.int64)
    )
    return pa.Table.from_pandas(
        out.sort_values("max_run").reset_index(drop=True), preserve_index=False
    )


def rank_agreement_topk(sf_dir: str, k: int = 50) -> pa.Table:
    """Rank-agreement metric between two user rankings (by total spend
    ticks vs by event count): overlap of the two exact top-k lists plus
    Kendall concordant/discordant pair counts over the intersection — the
    evaluation-metric shape for comparing scoring functions. Per-user
    totals by ONE bucket reduce; each top-k via per-block bounded
    candidates (k rows leave each block) + driver merge; the Kendall fold
    is O(overlap²) on ≤k driver rows."""

    def totals_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": b["user_id"].to_numpy(),
                "ticks": np.floor(b["value"].to_numpy() * 10000.0).astype(np.int64),
            }
        )
        g = df.groupby("user_id", as_index=False).agg(
            spend_ticks=("ticks", "sum"), n_events=("ticks", "size")
        )
        g["bucket"] = (
            g["user_id"].to_numpy().astype(np.uint64) * np.uint64(2654435761)
        ) % np.uint64(64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def totals_reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("user_id", as_index=False).agg(
            spend_ticks=("spend_ticks", "sum"), n_events=("n_events", "sum")
        )

    totals = (
        _events(sf_dir, columns=["user_id", "value"])
        .map_batches(totals_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(totals_reduce, batch_format="pandas")
        .materialize()
    )

    def local_top(metric: str):
        def f(b: pa.Table) -> pa.Table:
            df = b.to_pandas()
            return pa.Table.from_pandas(
                df.sort_values([metric, "user_id"], ascending=[False, True]).head(k),
                preserve_index=False,
            )
        return f

    top_a = (
        totals.map_batches(local_top("spend_ticks"), batch_format="pyarrow")
        .to_pandas()
        .sort_values(["spend_ticks", "user_id"], ascending=[False, True])
        .head(k)
    )
    top_b = (
        totals.map_batches(local_top("n_events"), batch_format="pyarrow")
        .to_pandas()
        .sort_values(["n_events", "user_id"], ascending=[False, True])
        .head(k)
    )
    ra = {u: i for i, u in enumerate(top_a["user_id"])}
    rb = {u: i for i, u in enumerate(top_b["user_id"])}
    both = sorted(set(ra) & set(rb))
    conc = disc = 0
    for i in range(len(both)):
        for j in range(i + 1, len(both)):
            u, v = both[i], both[j]
            conc += (ra[u] < ra[v]) == (rb[u] < rb[v])
            disc += (ra[u] < ra[v]) != (rb[u] < rb[v])
    return pa.table(
        {
            "n_overlap": pa.array([len(both)], pa.int64()),
            "n_concordant": pa.array([conc], pa.int64()),
            "n_discordant": pa.array([disc], pa.int64()),
        }
    )


# ------------------------------------------------------------- batch 26

def dq_expectations(sf_dir: str) -> pa.Table:
    """Declarative data-quality expectation suite over lineitem (the
    Great-Expectations shape, reference-adjacent to the metadata validator
    M2 elevated to the data plane): six expectations evaluated in ONE
    corpus scan of per-batch scalar partials plus two key-hash exchanges
    (exact uniqueness and FK containment — the only expectations that
    need cross-row state; both move deduped keys, never rows)."""

    def scan_partial(b: pa.Table) -> pa.Table:
        qty = b["l_quantity"].to_numpy()
        disc = b["l_discount"].to_numpy()
        rf = b["l_returnflag"].to_numpy(zero_copy_only=False)
        sd_null = int(pc.sum(pc.is_null(b["l_shipdate"])).as_py() or 0)
        return pa.table(
            {
                "n": pa.array([b.num_rows], pa.int64()),
                "v_shipdate_null": pa.array([sd_null], pa.int64()),
                "v_qty_range": pa.array([int(((qty < 1) | (qty > 50)).sum())], pa.int64()),
                "v_disc_range": pa.array(
                    [int(((disc < 0.0) | (disc > 0.10001)).sum())], pa.int64()
                ),
                "v_rf_enum": pa.array(
                    [int((~np.isin(rf, ["A", "N", "R"])).sum())], pa.int64()
                ),
            }
        )

    scan = (
        _read_sized(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_quantity", "l_discount", "l_returnflag", "l_shipdate"],
        )
        .map_batches(scan_partial, batch_format="pyarrow")
        .to_pandas()
        .sum()
    )

    # exact uniqueness of (orderkey, linenumber): rows − distinct keys
    def key_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "okey": b["l_orderkey"].to_numpy(),
                "ln": b["l_linenumber"].to_numpy().astype(np.int64),
            }
        ).drop_duplicates()
        df["bucket"] = (
            (df["okey"].to_numpy().astype(np.uint64) * np.uint64(0x9E3779B9)
             + df["ln"].to_numpy().astype(np.uint64)) % np.uint64(64)
        ).astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def distinct_count(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"d": [len(g[["okey", "ln"]].drop_duplicates())]}, dtype=np.int64
        )

    n_distinct = int(
        _read_sized(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_orderkey", "l_linenumber"],
        )
        .map_batches(key_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(distinct_count, batch_format="pandas")
        .sum("d")
    )

    # FK containment: distinct lineitem orderkeys missing from orders
    def li_keys(b: pa.Table) -> pa.Table:
        k = np.unique(b["l_orderkey"].to_numpy())
        return pa.table(
            {
                "okey": pa.array(k),
                "side": pa.array(np.zeros(len(k), np.int64)),
                "bucket": pa.array(
                    ((k.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(64)).astype(np.int64)
                ),
            }
        )

    def o_keys(b: pa.Table) -> pa.Table:
        k = np.unique(b["o_orderkey"].to_numpy())
        return pa.table(
            {
                "okey": pa.array(k),
                "side": pa.array(np.ones(len(k), np.int64)),
                "bucket": pa.array(
                    ((k.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(64)).astype(np.int64)
                ),
            }
        )

    def orphan_count(g: pd.DataFrame) -> pd.DataFrame:
        li = g[g["side"] == 0]["okey"].unique()
        oo = g[g["side"] == 1]["okey"].unique()
        return pd.DataFrame({"d": [int((~np.isin(li, oo)).sum())]}, dtype=np.int64)

    n_orphans = int(
        _read_sized(os.path.join(sf_dir, "lineitem.parquet"), columns=["l_orderkey"])
        .map_batches(li_keys, batch_format="pyarrow")
        .union(
            _read_sized(os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey"])
            .map_batches(o_keys, batch_format="pyarrow")
        )
        .groupby("bucket")
        .map_groups(orphan_count, batch_format="pandas")
        .sum("d")
    )

    n = int(scan["n"])
    rows = [
        ("shipdate_not_null", n, int(scan["v_shipdate_null"])),
        ("quantity_in_1_50", n, int(scan["v_qty_range"])),
        ("discount_in_0_010", n, int(scan["v_disc_range"])),
        ("returnflag_in_enum", n, int(scan["v_rf_enum"])),
        ("orderkey_linenumber_unique", n, n - n_distinct),
        ("orderkey_fk_in_orders", n, n_orphans),
    ]
    out = pd.DataFrame(rows, columns=["expectation", "n_checked", "n_violations"])
    out["n_checked"] = out["n_checked"].astype(np.int64)
    out["n_violations"] = out["n_violations"].astype(np.int64)
    return pa.Table.from_pandas(
        out.sort_values("expectation").reset_index(drop=True), preserve_index=False
    )


# --------------------------------------------------- round-3 widening batch B
# (defined in pipelines/widen3.py; re-exported here so the driver surface
# stays a single ``q.<name>`` namespace)
from data_exchange_routing_ray.pipelines.widen3 import (  # noqa: E402,F401
    emb_covariance_dims,
    emb_pca_project,
    join_salted_hotkey,
    lake_vacuum_time_travel,
    schema_drift_audit,
    stream_click_attribution_ttl,
)


def orders_per_customer_distribution(sf_dir: str) -> pa.Table:
    """TPC-H Q13 shape: the DISTRIBUTION of orders-per-customer INCLUDING
    zero-order customers (the classic left-outer + double aggregation).

    100 TB shape: never a customer⋈orders row join — (1) one
    groupby(o_custkey).count() exchange bounded by |customers|; (2) a
    per-block histogram partial over those counts folded by a tiny second
    groupby (|distinct counts| rows); (3) the zero bucket is pure
    arithmetic — |customers| (a count-only scan of one column) minus the
    number of customers that appear in orders (sum of the histogram)."""
    per_cust = (
        _read_sized(
            os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey"]
        )
        .groupby("o_custkey")
        .aggregate(Count(alias_name="c_count"))
    )

    def hist_partial(b: pa.Table) -> pa.Table:
        vals, counts = np.unique(
            b["c_count"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table({
            "c_count": pa.array(vals.astype(np.int64), pa.int64()),
            "custdist": pa.array(counts.astype(np.int64), pa.int64()),
        })

    hist = (
        per_cust.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("c_count")
        .aggregate(Sum("custdist", alias_name="custdist"))
        .to_pandas()
    )
    n_customers = _read_sized(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"]
    ).count()
    zero = int(n_customers) - int(hist["custdist"].sum())
    if zero > 0:
        hist = pd.concat(
            [hist, pd.DataFrame({"c_count": [0], "custdist": [zero]})],
            ignore_index=True,
        )
    hist = hist.astype({"c_count": "int64", "custdist": "int64"}).sort_values(
        ["custdist", "c_count"], ascending=[False, False], kind="stable"
    ).reset_index(drop=True)
    return pa.Table.from_pandas(hist, preserve_index=False)


def top_revenue_suppliers(sf_dir: str) -> pa.Table:
    """TPC-H Q15 shape: the supplier(s) with the GLOBAL maximum revenue —
    max-of-an-aggregate WITH ties (Q15 must return every supplier tied at
    the max, which is why it is a view + equality, not a LIMIT 1).

    Exactness: revenue is summed in integer ticks (per-row
    round-half-away(price × (1−discount) × 100) — bit-identical to the
    oracle's per-row rounding since both sides multiply the same doubles),
    so the tie comparison is integer equality, never a float ULP.

    100 TB shape: one fact-table scan with per-block (suppkey, ticks)
    partials → a groupby bounded by |suppliers| (dimension-sized) → the
    global max + tie filter is driver arithmetic on that small result."""
    from data_exchange_routing_ray.hashing import round_half_away

    def partial(b: pa.Table) -> pa.Table:
        rev = b["l_extendedprice"].to_numpy() * (
            1.0 - b["l_discount"].to_numpy()
        )
        ticks = round_half_away(rev * 100.0, 0).astype(np.int64)
        g = pa.table({
            "suppkey": b["l_suppkey"],
            "ticks": pa.array(ticks, pa.int64()),
        }).group_by("suppkey").aggregate([("ticks", "sum")])
        # select by NAME — aggregate output column order differs across
        # pyarrow versions, so a positional rename could swap key/value
        return pa.table({"suppkey": g["suppkey"], "ticks": g["ticks_sum"]})

    per_supp = (
        _read_sized(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_suppkey", "l_extendedprice", "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("suppkey")
        .aggregate(Sum("ticks", alias_name="ticks"))
        .to_pandas()  # bounded by |suppliers| (dimension table size)
    )
    top = per_supp[per_supp["ticks"] == per_supp["ticks"].max()]
    out = pd.DataFrame({
        "suppkey": top["suppkey"].astype("int64"),
        "total_revenue": (top["ticks"] / 100.0).astype("float64"),
    }).sort_values("suppkey").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def idle_rich_customers(sf_dir: str) -> pa.Table:
    """TPC-H Q22 shape: customers with above-average account balance and
    NO ORDERS IN THE TRAILING 90 DAYS (lapsed customers), rolled up per
    nation — the scalar-subquery + anti-join composition (Q22's
    positive-balance-average threshold, NOT EXISTS against a
    date-filtered orders subquery, per-group count/sum).

    Exactness: balances are compared in integer ticks with the threshold
    kept RATIONAL (ticks × count > sum_ticks), so the engine and the SQL
    oracle evaluate the identical integer inequality — no float-avg ULP
    can flip a customer across the threshold.

    100 TB shape: pass 1 is a two-number reduce (sum_ticks, count over
    positive balances) plus a column-pruned max(o_orderdate); the
    threshold condition then rides a map_batches filter, the anti side is
    date-filtered BEFORE the exchange (recent orders only), survivors
    flow through ONE co-partitioned anti-join (`filter_join_bucketed`),
    and the rollup is bounded by |nations|."""
    from data_exchange_routing_ray.functions.joins import filter_join_bucketed
    from data_exchange_routing_ray.hashing import round_half_away

    def tickify(b: pa.Table) -> pa.Table:
        ticks = round_half_away(
            b["c_acctbal"].to_numpy() * 100.0, 0
        ).astype(np.int64)
        return pa.table({
            "c_custkey": b["c_custkey"],
            "c_nationkey": pc.cast(b["c_nationkey"], pa.int64()),
            "ticks": pa.array(ticks, pa.int64()),
        })

    cust = _read_sized(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    ).map_batches(tickify, batch_format="pyarrow")

    # pass 1: the scalar subquery — avg over POSITIVE balances, kept as
    # the exact rational (sum_ticks, cnt)
    def pos_partial(b: pa.Table) -> pa.Table:
        t = b["ticks"].to_numpy()
        pos = t[t > 0]
        return pa.table({
            "s": pa.array([int(pos.sum())], pa.int64()),
            "n": pa.array([len(pos)], pa.int64()),
        })

    agg = (
        cust.map_batches(pos_partial, batch_format="pyarrow")
        .sum(["s", "n"])
    )
    sum_ticks, cnt = int(agg["sum(s)"]), int(agg["sum(n)"])

    def above_threshold(b: pa.Table) -> pa.Table:
        # ticks × cnt > sum_ticks — the exact rational comparison
        keep = pc.greater(
            pc.multiply(b["ticks"], pa.scalar(cnt, pa.int64())),
            pa.scalar(sum_ticks, pa.int64()),
        )
        return b.filter(keep)

    rich = cust.map_batches(above_threshold, batch_format="pyarrow")
    rich_schema = pa.schema([
        ("c_custkey", pa.int64()), ("c_nationkey", pa.int64()),
        ("ticks", pa.int64()),
    ])
    orders = _read_sized(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderdate"],
    )
    max_date = orders.max("o_orderdate")
    cutoff = np.datetime64(max_date, "us") - np.timedelta64(90, "D")

    def recent_only(b: pa.Table) -> pa.Table:
        keep = pc.greater_equal(
            b["o_orderdate"], pa.scalar(cutoff.item(), pa.timestamp("us"))
        )
        return b.filter(keep).select(["o_custkey"])

    idle = filter_join_bucketed(
        rich, rich_schema,
        orders.map_batches(recent_only, batch_format="pyarrow"),
        left_key="c_custkey", right_key="o_custkey", keep_matches=False,
    ).to_pandas()  # bounded by |rich customers with no recent orders|
    if not len(idle):
        return pa.schema([
            ("nationkey", pa.int64()), ("numcust", pa.int64()),
            ("totacctbal", pa.float64()),
        ]).empty_table()
    g = idle.groupby("c_nationkey", as_index=False).agg(
        numcust=("c_custkey", "size"), ticks=("ticks", "sum")
    )
    out = pd.DataFrame({
        "nationkey": g["c_nationkey"].astype("int64"),
        "numcust": g["numcust"].astype("int64"),
        "totacctbal": (g["ticks"] / 100.0).astype("float64"),
    }).sort_values("nationkey").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)
