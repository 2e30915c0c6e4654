"""Record splitters: one input row → N output rows (batch-expanding maps).

Re-expresses the reference's exploders as vectorized ``map_batches`` stages
(1 row in → N rows out), never per-row ``flat_map`` in the hot path:

- HL7 debatcher: one batch blob parsed into an array of messages, each
  written out as its own record (``fn-debatcher/Function.kt:15-90``) →
  ``debatch_json_array``.
- Zip decompressor: one archive exploded into per-entry branches,
  recursing into nested archives (``FnDecompressor.kt:38-139``) →
  ``explode_archive`` (operates on binary payload columns).
"""

from __future__ import annotations

import io
import json
import zipfile

import numpy as np
import pyarrow as pa

ERR_EMPTY_ARCHIVE = "Zip file is empty"
ERR_BAD_ARCHIVE = "File is not a valid zip archive"
ERR_BAD_JSON = "Payload is not a JSON array of messages"


def debatch_json_array(
    batch: pa.Table, payload_col: str = "text", keep_cols: list[str] | None = None
) -> pa.Table:
    """Split rows whose ``payload_col`` holds a JSON array into one row per
    element, carrying parent columns; adds ``msg_idx`` (the ``fileName_${i}``
    suffix analog) and ``error`` for unparseable payloads."""
    keep = keep_cols or [c for c in batch.column_names if c != payload_col]
    payloads = batch[payload_col].to_pylist()
    parent_idx: list[int] = []
    msg_idx: list[int] = []
    texts: list[str | None] = []
    errors: list[str | None] = []
    for i, p in enumerate(payloads):
        try:
            arr = json.loads(p) if p is not None else None
            if not isinstance(arr, list):
                raise ValueError
        except (ValueError, TypeError):
            parent_idx.append(i)
            msg_idx.append(0)
            texts.append(None)
            errors.append(ERR_BAD_JSON)
            continue
        for j, msg in enumerate(arr):
            parent_idx.append(i)
            msg_idx.append(j)
            texts.append(msg if isinstance(msg, str) else json.dumps(msg))
            errors.append(None)
    taken = batch.select(keep).take(pa.array(parent_idx, pa.int64()))
    taken = taken.append_column("msg_idx", pa.array(msg_idx, pa.int32()))
    taken = taken.append_column(payload_col, pa.array(texts, pa.string()))
    return taken.append_column("error", pa.array(errors, pa.string()))


def explode_archive(
    batch: pa.Table,
    payload_col: str = "payload",
    name_col: str = "file_name",
    recurse: bool = True,
) -> pa.Table:
    """Explode zip payloads (binary column) into one row per entry.

    Recurses into nested zips (entry paths joined with "/") and errors on
    empty or malformed archives, mirroring the reference decompressor's
    matrix (``Unit_FnDecompressor.kt:38-135``). Non-zip payloads pass
    through unchanged (single CSV fan-out case, ``FnDecompressor.kt:81-88``).
    """
    keep = [c for c in batch.column_names if c not in (payload_col, name_col)]
    parent_idx: list[int] = []
    names: list[str | None] = []
    payloads: list[bytes | None] = []
    errors: list[str | None] = []

    def emit(i, name, data, err=None):
        parent_idx.append(i)
        names.append(name)
        payloads.append(data)
        errors.append(err)

    def walk(i, name, data):
        if name is not None and name.lower().endswith(".zip"):
            try:
                with zipfile.ZipFile(io.BytesIO(data)) as zf:
                    entries = [e for e in zf.infolist() if not e.is_dir()]
                    if not entries:
                        emit(i, name, None, ERR_EMPTY_ARCHIVE)
                        return
                    for e in entries:
                        inner = zf.read(e)
                        path = f"{name}/{e.filename}"
                        if recurse and e.filename.lower().endswith(".zip"):
                            walk(i, path, inner)
                        else:
                            emit(i, path, inner)
            except zipfile.BadZipFile:
                emit(i, name, None, ERR_BAD_ARCHIVE)
        else:
            emit(i, name, data)

    blob_np = batch[payload_col].to_pylist()
    name_np = batch[name_col].to_pylist()
    for i, (name, data) in enumerate(zip(name_np, blob_np)):
        walk(i, name, data)

    out = pa.table(
        {
            name_col: pa.array(names, pa.string()),
            payload_col: pa.array(payloads, pa.binary()),
            "error": pa.array(errors, pa.string()),
        }
    )
    if keep:
        taken = batch.select(keep).take(pa.array(parent_idx, pa.int64()))
        for i, c in enumerate(keep):
            out = out.append_column(taken.schema.field(i), taken.column(i))
    return out


def explode_turns(batch: pa.Table, turns_col: str = "turns") -> pa.Table:
    """CDC-engine exploder: one change *batch row* whose ``turns_col`` is a
    list<struct> of per-turn events → N change rows (the debatcher applied
    to the transcript model). Vectorized via Arrow list flattening."""
    lists = batch[turns_col]
    flat = pc_list_flatten(lists)
    counts = pc_list_value_length(lists)
    parent = np.repeat(np.arange(batch.num_rows), counts)
    keep = [c for c in batch.column_names if c != turns_col]
    out = batch.select(keep).take(pa.array(parent, pa.int64()))
    st = flat
    for field_idx in range(st.type.num_fields):
        f = st.type.field(field_idx)
        out = out.append_column(f.name, pc_struct_field(st, field_idx))
    return out


def pc_list_flatten(arr):
    import pyarrow.compute as pc

    return pc.list_flatten(arr)


def pc_list_value_length(arr):
    import pyarrow.compute as pc

    return pc.list_value_length(arr).fill_null(0).to_numpy(zero_copy_only=False)


def pc_struct_field(arr, idx):
    import pyarrow.compute as pc

    return pc.struct_field(arr, [idx])
