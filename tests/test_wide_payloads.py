"""Wide text payloads (SURVEY §7.3 'Wide text values'): megabyte-scale turn
texts must survive the full merge path — LWW upsert, delta stacking,
compaction — bit-exact, with no truncation or encoding loss."""

import pandas as pd
import pyarrow as pa
import ray.data

from data_exchange_routing_ray.pipelines.cdc import CDCLake


def _changes(texts: dict[tuple[str, int], str], seq0: int) -> ray.data.Dataset:
    rows = [
        {
            "seq": seq0 + i,
            "op": "insert",
            "conv_id": cid,
            "turn_idx": t,
            "role": "assistant",
            "text": txt,
            "tool": "x",
            "ts": pd.Timestamp("2024-01-01"),
        }
        for i, ((cid, t), txt) in enumerate(sorted(texts.items()))
    ]
    df = pd.DataFrame(rows)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def test_megabyte_texts_survive_merge_delta_compact(ray_session, tmp_path):
    big = {
        ("conv-a", 0): "x" * 1_000_000 + "☃ end-0",
        ("conv-a", 1): "y" * 1_500_000 + "\x00\t weird-1",
        ("conv-b", 0): "z" * 2_000_000 + " 終-0",
    }
    lake = CDCLake(
        str(tmp_path / "lake"),
        num_partitions=2,
        merge_policy="delta",
        delta_ratio=1e9,  # force delta stacking on the update epoch
    )
    lake.apply_changes(_changes(big, seq0=1), quarantine=False)
    # update one huge turn via a stacked delta, then compact
    upd = {("conv-a", 1): "w" * 1_200_000 + " updated ✓"}
    lake.apply_changes(_changes(upd, seq0=100), quarantine=False)
    assert any(e.deltas for e in lake.manifest.partitions.values())
    final = lake.final_table().to_pandas()
    want = {**big, **upd}
    got = {
        (r.conv_id, r.turn_idx): r.text for r in final.itertuples(index=False)
    }
    assert got == want  # bit-exact, megabyte strings + NUL/unicode intact
    # compaction folds the delta stack without corrupting wide payloads
    lake.repartition_lake(2)
    lake2 = CDCLake(str(tmp_path / "lake"), num_partitions=2)
    assert not any(e.deltas for e in lake2.manifest.partitions.values())
    got2 = {
        (r.conv_id, r.turn_idx): r.text
        for r in lake2.final_table().to_pandas().itertuples(index=False)
    }
    assert got2 == want
