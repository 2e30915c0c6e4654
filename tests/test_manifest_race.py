"""Multi-PROCESS manifest publish race: N OS processes hammer
``ManifestStore.publish(expect_epoch=...)`` concurrently. The flock held
across the check-then-rename window must serialize them: every epoch is won
by EXACTLY ONE process, losers always get ConcurrentCommitError (never a
silent lost update), and the archived manifest chain has no gaps. This is
the process-level proof of the optimistic-concurrency fence (a single-
process test cannot catch a broken flock)."""

import json
import multiprocessing as mp
import os

from data_exchange_routing_ray.state.manifest import (
    ConcurrentCommitError,
    Manifest,
    ManifestStore,
)


def _writer(lake_dir: str, wid: int, rounds: int, out_q) -> None:
    store = ManifestStore(lake_dir)
    wins = []
    for _ in range(rounds):
        cur = store.load_current()
        cur_epoch = -1 if cur is None else cur.epoch
        man = Manifest(
            epoch=cur_epoch + 1,
            applied_offset=(cur_epoch + 1) * 1000 + wid,
            num_partitions=2,
            schema_names=["conv_id"],
            partitions={},
        )
        try:
            store.publish(man, expect_epoch=cur_epoch)
            wins.append(man.epoch)
        except ConcurrentCommitError:
            pass  # loser: retries against the NEW current next round
    out_q.put((wid, wins))


def test_multiprocess_publish_race(tmp_path):
    lake = str(tmp_path / "lake")
    os.makedirs(lake)
    n_procs, rounds = 4, 25
    q = mp.Queue()
    procs = [
        mp.Process(target=_writer, args=(lake, w, rounds, q))
        for w in range(n_procs)
    ]
    for p in procs:
        p.start()
    results = [q.get(timeout=120) for _ in procs]
    for p in procs:
        p.join(timeout=120)

    all_wins = [e for _, wins in results for e in wins]
    # exactly-once: no epoch won twice across processes
    assert len(all_wins) == len(set(all_wins)), sorted(all_wins)
    store = ManifestStore(lake)
    cur = store.load_current()
    assert cur is not None
    # the current epoch is the max win and the archive chain has no gaps
    assert cur.epoch == max(all_wins)
    for e in range(cur.epoch + 1):
        if e in all_wins:
            archived = store.load_epoch(e)
            assert archived is not None and archived.epoch == e
    # every committed manifest's writer tag survives intact (no torn write)
    with open(os.path.join(lake, "manifests", "current.json")) as f:
        doc = json.load(f)
    assert doc["applied_offset"] % 1000 < n_procs
