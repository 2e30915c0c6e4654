"""Integration gauntlet: every engine feature in one stream, vs the oracle.

One stream carrying malformed rows, duplicate redeliveries, a hot key and
late schema evolution is driven through: salted epochs → mid-stream
repartition (64→96) → crash (state drop) → resume with overlapping shards
(partial fencing) → tail for the remainder. Final state must equal the
serial oracle bit-for-bit, including the evolved column.
"""

import pandas as pd
import pyarrow as pa

from data_exchange_routing_ray.pipelines.cdc import CDCLake
from data_exchange_routing_ray.synth import (
    make_change_stream,
    oracle_apply,
    write_change_stream,
)

COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def test_full_feature_gauntlet(ray_session, tmp_path):
    ch = make_change_stream(
        num_convs=400, max_turns=10, malformed_frac=0.02, redelivery_frac=0.05,
        hot_frac=0.2, evolve_lang_after=2000, seed=99,
    )
    files = write_change_stream(ch, str(tmp_path / "s"), num_files=8)

    lake = CDCLake(str(tmp_path / "lake"), num_partitions=8, num_salts=3)
    lake.replay_files(files[:4], files_per_epoch=2)   # salted epochs
    lake.repartition_lake(12)                          # compact mid-stream
    lake.close()                                       # crash: drop any state

    lake2 = CDCLake(str(tmp_path / "lake"), num_partitions=12)
    lake2.replay_files(files[:6], files_per_epoch=2)   # overlap → partial fence
    list(lake2.tail(str(tmp_path / "s"), poll_interval=0.05, idle_polls=2,
                    files_per_epoch=3))                # tail the remainder

    tab = lake2.final_table()
    exp = oracle_apply(ch)
    pd.testing.assert_frame_equal(
        tab.to_pandas()[COLS].reset_index(drop=True),
        exp[COLS].reset_index(drop=True),
        check_dtype=False,
    )
    got_lang = tab.to_pandas().set_index(["conv_id", "turn_idx"])["lang"].sort_index()
    exp_lang = exp.set_index(["conv_id", "turn_idx"])["lang"].sort_index()
    assert (got_lang.fillna("-") == exp_lang.fillna("-")).all()
    # quarantine captured the malformed rows across all phases
    assert lake2.quarantine_table().num_rows > 0
