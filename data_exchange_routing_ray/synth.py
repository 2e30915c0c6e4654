"""Deterministic synthetic transcript change-stream generator + serial oracle.

Generates a binlog-style change-event stream (FIXTURES.md §2) over the
transcript table shape from ``BASELINE.json``'s ``input_hint``:

- unique, totally-ordered ``seq`` (the LSN; analog of Azure's per-blob
  ``sequencer`` token, reference ``HL7Message.kt:25``)
- ~70% insert / 25% update / 5% delete, updates/deletes referencing
  previously-inserted keys (event position strictly after the insert)
- configurable malformed-row fraction (validation matrix, FIXTURES.md §4;
  reference error paths ``RouteIngestedFile.kt:117-145``, ``FnRouter.kt:73-75``)
- configurable duplicate redeliveries (same ``seq`` re-emitted; reference
  queue redelivery semantics ``host.json:26-27``)
- optional hot-conversation skew (one conv_id receives ~`hot_frac` of all
  update traffic) for the salted-partition test
- optional schema evolution: events with ``seq >= evolve_lang_after`` carry an
  added ``lang`` column (earlier rows backfill null at merge time)

Everything is seeded numpy — bit-for-bit reproducible.

``oracle_apply`` is the independent serial reference applier (pure pandas):
validate → dedup redeliveries → last-writer-wins per key → drop deletes →
stable (conv_id, turn_idx, ts) order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

TS_BASE_US = np.int64(1_735_689_600_000_000)  # 2025-01-01T00:00:00Z in µs
TS_SPAN_US = np.int64(30 * 86_400_000_000)  # 30 days

_TOOLS = np.array(["", "", "", "", "search", "python", "browser"], dtype=object)
_ROLES = np.array(["user", "assistant"], dtype=object)


def make_change_stream(
    num_convs: int = 100,
    min_turns: int = 1,
    max_turns: int = 10,
    update_frac: float = 0.25 / 0.70,
    delete_frac: float = 0.05 / 0.70,
    malformed_frac: float = 0.0,
    redelivery_frac: float = 0.0,
    hot_frac: float = 0.0,
    evolve_lang_after: int | None = None,
    seq_start: int = 1,
    seed: int = 42,
) -> pa.Table:
    """Build the change-event table, ordered by ``seq`` (unique, dense)."""
    rng = np.random.default_rng(seed)

    # --- insert events: every (conv, turn) key exactly once -----------------
    turns = rng.integers(min_turns, max_turns + 1, size=num_convs)
    conv_idx = np.repeat(np.arange(num_convs), turns)
    turn_idx = np.concatenate([np.arange(t) for t in turns]).astype(np.int64)
    n_ins = conv_idx.size
    u_ins = rng.random(n_ins)  # virtual time position in [0, 1)

    # --- updates / deletes reference previously inserted keys --------------
    n_upd = int(n_ins * update_frac)
    n_del = int(n_ins * delete_frac)
    if hot_frac > 0.0:
        # route ~hot_frac of update traffic at conversation 0's keys
        weights = np.where(conv_idx == 0, 1.0, 0.0)
        if weights.sum() == 0:
            weights[:1] = 1.0
        hot_n = int(n_upd * hot_frac)
        w_hot = weights / weights.sum()
        tgt_hot = rng.choice(n_ins, size=hot_n, p=w_hot)
        tgt_rest = rng.integers(0, n_ins, size=n_upd - hot_n)
        upd_tgt = np.concatenate([tgt_hot, tgt_rest])
    else:
        upd_tgt = rng.integers(0, n_ins, size=n_upd)
    del_tgt = rng.integers(0, n_ins, size=n_del)
    # position each strictly after its key's insert
    u_upd = u_ins[upd_tgt] + rng.random(n_upd) * (1.0 - u_ins[upd_tgt])
    u_del = u_ins[del_tgt] + rng.random(n_del) * (1.0 - u_ins[del_tgt])

    op = np.concatenate(
        [
            np.full(n_ins, "insert", dtype=object),
            np.full(n_upd, "update", dtype=object),
            np.full(n_del, "delete", dtype=object),
        ]
    )
    all_conv = np.concatenate([conv_idx, conv_idx[upd_tgt], conv_idx[del_tgt]])
    all_turn = np.concatenate([turn_idx, turn_idx[upd_tgt], turn_idx[del_tgt]])
    u = np.concatenate([u_ins, u_upd, u_del])

    order = np.argsort(u, kind="stable")
    op, all_conv, all_turn, u = op[order], all_conv[order], all_turn[order], u[order]
    n = op.size
    seq = np.arange(seq_start, seq_start + n, dtype=np.int64)

    conv_id = np.array([f"conv-{c:06d}" for c in all_conv], dtype=object)
    is_del = op == "delete"
    role = _ROLES[(all_turn % 2).astype(np.int64)].copy()
    text = np.array(
        [f"t-{c:06d}-{t}-s{s}" for c, t, s in zip(all_conv, all_turn, seq)],
        dtype=object,
    )
    tool = _TOOLS[rng.integers(0, len(_TOOLS), size=n)].copy()
    role[is_del] = None
    text[is_del] = None
    tool[is_del] = None
    ts = TS_BASE_US + (u * float(TS_SPAN_US)).astype(np.int64)

    df = pd.DataFrame(
        {
            "seq": seq,
            "op": op,
            "conv_id": conv_id,
            "turn_idx": all_turn.astype("int32"),
            "role": role,
            "text": text,
            "tool": tool,
            "ts": ts,
        }
    )

    # --- malformed rows (validation matrix, FIXTURES.md §4) -----------------
    if malformed_frac > 0.0:
        n_bad = max(1, int(n * malformed_frac))
        bad = df.sample(n=n_bad, random_state=int(rng.integers(0, 2**31))).copy()
        kinds = rng.integers(0, 6, size=n_bad)
        bad["conv_id"] = bad["conv_id"].where(kinds != 0, None)
        bad["conv_id"] = bad["conv_id"].where(kinds != 1, "")
        bad["op"] = bad["op"].where(kinds != 2, "upsert?")
        bad["ts"] = bad["ts"].where(kinds != 3, pd.NA)
        mask4 = kinds == 4  # insert with all-null payload
        bad.loc[mask4, "op"] = "insert"
        bad.loc[mask4, ["role", "text", "tool"]] = None
        bad["turn_idx"] = bad["turn_idx"].where(kinds != 5, pd.NA)
        # malformed rows get fresh unique seqs appended after the stream
        bad["seq"] = np.arange(seq_start + n, seq_start + n + n_bad, dtype=np.int64)
        df = pd.concat([df, bad], ignore_index=True)

    # --- duplicate redeliveries (same seq re-emitted) -----------------------
    if redelivery_frac > 0.0:
        n_dup = max(1, int(len(df) * redelivery_frac))
        dup = df.sample(n=n_dup, random_state=int(rng.integers(0, 2**31)))
        df = pd.concat([df, dup], ignore_index=True)

    df = df.sort_values("seq", kind="stable", ignore_index=True)

    table = pa.Table.from_pandas(df, preserve_index=False)
    table = table.set_column(
        table.schema.get_field_index("ts"),
        pa.field("ts", pa.timestamp("us")),
        table["ts"].cast(pa.int64()).cast(pa.timestamp("us")),
    )
    table = table.set_column(
        table.schema.get_field_index("turn_idx"),
        pa.field("turn_idx", pa.int32()),
        table["turn_idx"].cast(pa.int32()),
    )

    if evolve_lang_after is not None:
        langs = np.array(["en", "es", "fr", "de"], dtype=object)
        lang = langs[rng.integers(0, len(langs), size=len(df))].copy()
        lang[df["seq"].to_numpy() < evolve_lang_after] = None
        table = table.append_column("lang", pa.array(lang, type=pa.string()))
    return table


def write_change_stream(table: pa.Table, out_dir: str, num_files: int = 4) -> list[str]:
    """Split the stream into seq-contiguous parquet shards (epoch files)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    n = table.num_rows
    paths = []
    bounds = np.linspace(0, n, num_files + 1).astype(int)
    for i in range(num_files):
        path = os.path.join(out_dir, f"changes-{i:05d}.parquet")
        pq.write_table(table.slice(bounds[i], bounds[i + 1] - bounds[i]), path)
        paths.append(path)
    return paths


def oracle_validate_mask(df: pd.DataFrame) -> pd.Series:
    """Pure-pandas validity predicate — mirrors stages/validate.py rules."""
    ok = df["seq"].notna()
    ok &= df["op"].isin(["insert", "update", "delete"])
    ok &= df["conv_id"].notna() & (df["conv_id"] != "")
    ok &= df["turn_idx"].notna()
    ok &= df["ts"].notna()
    payload_null = df["role"].isna() & df["text"].isna()
    ok &= ~((df["op"] == "insert") & payload_null)
    return ok


def oracle_apply(
    changes: pa.Table, base: pd.DataFrame | None = None, fence_below: int | None = None
) -> pd.DataFrame:
    """Serial reference applier: the ground truth the Ray engine must match."""
    df = changes.to_pandas()
    df = df[oracle_validate_mask(df)]
    if fence_below is not None:
        df = df[df["seq"] > fence_below]
    df = df.sort_values("seq", kind="stable").drop_duplicates(
        ["seq", "conv_id", "turn_idx"], keep="first"
    )
    if base is not None and len(base):
        base = base.copy()
        if "op" not in base.columns:
            base["op"] = "insert"
        if "seq" not in base.columns:
            base["seq"] = -1
        df = pd.concat([base, df], ignore_index=True).sort_values(
            "seq", kind="stable"
        )
    last = df.drop_duplicates(["conv_id", "turn_idx"], keep="last")
    final = last[last["op"] != "delete"].copy()
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    extra = [c for c in final.columns if c not in cols + ["seq", "op"]]
    final = final[cols + extra + ["seq"]]
    return final.sort_values(
        ["conv_id", "turn_idx", "ts"], kind="stable", ignore_index=True
    )
