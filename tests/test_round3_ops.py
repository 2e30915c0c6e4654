"""Round-3 widening ops: distributed BPE encode vs a serial reference."""

import hashlib
import re

import pyarrow.parquet as pq

from data_exchange_routing_ray.pipelines import events_cdc as q

SF = "/root/testdata/sf0.001"


def test_bpe_tokenize_matches_serial_reference(ray_session):
    got = q.bpe_tokenize_corpus(SF, num_merges=4).to_pandas().set_index("doc_id")
    merges_tbl = q.bpe_train_merges(SF, num_merges=4).to_pandas()
    merges = tuple(zip(merges_tbl["left"], merges_tbl["right"]))
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    assert len(got) == len(docs)
    for did, text in zip(docs["doc_id"], docs["text"]):
        toks = []
        # [\W_]+ == Arrow's [^\p{L}\p{N}]+ (word chars minus underscore)
        for w in re.split(r"[\W_]+", text.lower()):
            if w:
                toks.extend(q._bpe_apply(list(w) + ["</w>"], merges))
        assert got.loc[did, "n_tokens"] == len(toks)
        assert (
            got.loc[did, "tok_digest"]
            == hashlib.md5("\x1f".join(toks).encode()).hexdigest()[:8]
        )
    # the trained rules really fired: some words must have merged symbols
    assert len(merges) == 4


def test_export_shards_crash_before_commit_recovers(ray_session, tmp_path):
    """A pass that wrote files but died before the manifest commit must
    not leave duplicate rows after the retry."""
    import os

    import ray.data

    d = str(tmp_path / "out")
    os.makedirs(d)
    # pass 1: write shard 0 only, then 'crash' before commit (drop manifest)
    wrote = q._export_shards(SF, d, n_shards=4, allow={0})
    assert wrote == [0]
    os.remove(os.path.join(d, "_SHARDS_DONE"))
    # retry: full export must rewrite shard 0 cleanly, not append beside it
    wrote = q._export_shards(SF, d, n_shards=4)
    assert sorted(wrote) == [0, 1, 2, 3]
    back = ray.data.read_parquet(d).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    assert len(back) == len(docs)
    assert back["doc_id"].is_unique
    # idempotent once committed
    assert q._export_shards(SF, d, n_shards=4) == []
