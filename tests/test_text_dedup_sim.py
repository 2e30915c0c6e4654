"""Text analysis, dedup, similarity-search and multimodal operator tests."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from data_exchange_routing_ray.functions.dedup import (
    dedup_by_pairs,
    embedding_neardup_pairs_blocked,
    exact_dedup,
    lsh_neardup_pairs,
    minhash_candidate_pairs,
    simhash_candidate_pairs,
    verify_jaccard_pairs,
)
from data_exchange_routing_ray.functions.multimodal import (
    DecodeMedia,
    ExtractMediaFeatures,
    sample_frames,
    synthesize_media_batch,
)
from data_exchange_routing_ray.functions.similarity import IVFIndex, topk_cosine
from data_exchange_routing_ray.functions.text import (
    RedactText,
    add_lang_id,
    add_md5_fingerprint,
    add_quality_score,
    add_text_stats,
    add_winnow_fingerprint,
)


def _docs_table():
    return pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": [
                "The quick brown fox jumps over the lazy dog and runs to the forest",
                "The quick brown fox jumps over the lazy dog and runs to the woods",
                "el perro corre en la casa y el gato duerme en el sofa de la sala",
                "completely different content about databases and query engines here",
                "The quick brown fox jumps over the lazy dog and runs to the forest",
            ],
        }
    )


def test_text_stats_and_quality():
    out = add_quality_score(add_text_stats(_docs_table()))
    df = out.to_pandas()
    assert df.loc[0, "n_tokens"] == 14
    assert (df["quality"] >= 0).all() and (df["quality"] <= 1).all()
    assert df.loc[0, "stop_hits"] >= 3  # the, over(x0), the, and, to, the


def test_lang_id_heuristic():
    out = add_lang_id(_docs_table()).to_pandas()
    assert out.loc[0, "lang_pred"] == "en"
    assert out.loc[2, "lang_pred"] == "es"
    zh = add_lang_id(pa.table({"doc_id": [9], "text": ["这是中文文本"]})).to_pandas()
    assert zh.loc[0, "lang_pred"] == "zh"


def test_fingerprints():
    out = add_winnow_fingerprint(add_md5_fingerprint(_docs_table())).to_pandas()
    # identical docs → identical fingerprints
    assert out.loc[0, "fp_md5"] == out.loc[4, "fp_md5"]
    assert out.loc[0, "fp_winnow"] == out.loc[4, "fp_winnow"]
    assert out.loc[0, "fp_md5"] != out.loc[3, "fp_md5"]
    import hashlib

    assert out.loc[0, "fp_md5"] == hashlib.md5(
        _docs_table()["text"][0].as_py().encode()
    ).hexdigest()


def test_redactor():
    t = pa.table(
        {"text": ["call 555-123-4567 or mail bob@example.com ssn 123-45-6789"]}
    )
    out = RedactText()(t)["text"][0].as_py()
    assert "[PHONE]" in out and "[EMAIL]" in out and "[SSN]" in out
    assert "bob@" not in out and "123-45-6789" not in out


def test_exact_dedup(ray_session):
    import ray.data

    out = exact_dedup(ray.data.from_arrow(_docs_table())).to_pandas()
    # doc 4 is an exact dup of doc 0 → dropped, lowest id kept
    assert sorted(out["doc_id"]) == [0, 1, 2, 3]


def test_minhash_lsh_finds_neardups(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_docs_table())
    pairs = minhash_candidate_pairs(ds, threshold=0.5).to_pandas()
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (0, 4) in found  # exact dup
    assert (0, 1) in found or (1, 4) in found  # near dup (one word differs)
    assert not any(3 in p for p in found)  # unrelated doc never pairs

    verified = verify_jaccard_pairs(_docs_table().to_pandas(), pairs)
    exact_pair = verified[(verified.id_a == 0) & (verified.id_b == 4)]
    assert float(exact_pair["jaccard"].iloc[0]) == 1.0

    kept = dedup_by_pairs(ds, pairs[pairs.est_jaccard >= 0.9], id_col="doc_id")
    ids = sorted(kept.to_pandas()["doc_id"])
    assert 0 in ids and 4 not in ids


def test_minhash_verify_strategies_identical(ray_session):
    """broadcast / grid / attach verification must produce bit-identical
    pair sets (they only trade shuffle volume). Uses a corpus with enough
    near-dup structure to exercise multi-band duplicate candidates."""
    import ray.data

    rng = __import__("numpy").random.default_rng(5)
    words = [f"w{i}" for i in range(200)]
    ids, texts = [], []
    did = 0
    for b in range(20):
        toks = list(rng.choice(words, size=15))
        for d in range(6):  # 6 near-dup variants per base doc
            t = list(toks)
            t[int(rng.integers(0, 15))] = str(rng.choice(words))
            ids.append(did)
            texts.append(" ".join(t))
            did += 1
    tab = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})

    results = {}
    for strat in ("broadcast", "grid", "attach"):
        out = minhash_candidate_pairs(
            ray.data.from_arrow(tab), threshold=0.4, strategy=strat
        ).to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        results[strat] = out
    assert len(results["broadcast"]) > 10
    pd.testing.assert_frame_equal(results["broadcast"], results["grid"])
    pd.testing.assert_frame_equal(results["broadcast"], results["attach"])


def test_simhash_pairs(ray_session):
    import ray.data

    pairs = simhash_candidate_pairs(ray.data.from_arrow(_docs_table())).to_pandas()
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (0, 4) in found
    ham = dict(zip(zip(pairs["id_a"], pairs["id_b"]), pairs["hamming"]))
    assert ham[(0, 4)] == 0


def _emb_table(n=200, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((n, dim))
    # plant near-duplicates: vec 10 ≈ vec 11 (adjacent ids) and vec 10 ≈ vec 15
    # (same `label` block: 10 % 5 == 15 % 5 == 0)
    M[11] = M[10] + rng.standard_normal(dim) * 0.01
    M[15] = M[10] + rng.standard_normal(dim) * 0.01
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array([r.astype(np.float32).tolist() for r in M], pa.list_(pa.float32())),
            "label": pa.array((np.arange(n) % 5).astype(np.int32), pa.int32()),
        }
    )


def test_embedding_neardup_blocked(ray_session):
    import ray.data

    t = _emb_table()
    pairs = embedding_neardup_pairs_blocked(
        ray.data.from_arrow(t), threshold=0.95
    ).to_pandas()
    assert (10, 15) in set(zip(pairs["id_a"], pairs["id_b"]))
    # (10, 11) is near-dup but in different label blocks → not found (blocked
    # semantics; the LSH variant below finds it)
    assert (10, 11) not in set(zip(pairs["id_a"], pairs["id_b"]))


def test_embedding_neardup_lsh(ray_session):
    import ray.data

    t = _emb_table()
    pairs = lsh_neardup_pairs(
        ray.data.from_arrow(t), threshold=0.95, dim=16
    ).to_pandas()
    assert (10, 11) in set(zip(pairs["id_a"], pairs["id_b"]))


def test_topk_cosine_and_ivf_recall(ray_session):
    import ray.data

    t = _emb_table(n=400, dim=16)
    ds = ray.data.from_arrow(t)
    q = np.asarray(t["embedding"][10].as_py())
    exact = topk_cosine(ds, q, k=10)
    assert exact.loc[0, "vec_id"] == 10  # itself, cosine 1.0
    assert 11 in set(exact["vec_id"].head(2))  # planted near-dup right behind

    ivf = IVFIndex(num_clusters=8, seed=42).fit(ds)
    approx = ivf.search(ds, q, k=10, nprobe=4)
    recall = len(set(exact["vec_id"]) & set(approx["vec_id"])) / 10
    assert recall >= 0.6


def test_multimodal_plumbing(ray_session):
    import ray.data

    docs = _docs_table()
    media = synthesize_media_batch(docs)
    assert media.schema.names == [
        "media_id",
        "media_type",
        "payload",
        "meta_width",
        "meta_height",
        "meta_sample_rate",
    ]
    ds = ray.data.from_arrow(media)
    decoded = ds.map_batches(
        DecodeMedia, batch_format="pyarrow", concurrency=1
    ).map_batches(ExtractMediaFeatures, batch_format="pyarrow", concurrency=1)
    df = decoded.to_pandas()
    assert (df["decoded_bytes"] > 0).all()
    assert all(len(f) == 8 for f in df["features"])
    # identical payloads → identical fake features (deterministic stub)
    f0 = list(df.loc[df.media_id == 0, "features"].iloc[0])
    f4 = list(df.loc[df.media_id == 4, "features"].iloc[0])
    assert f0 == f4

    frames = sample_frames(media, frame_size=8, every_nth=2)
    assert frames.num_rows > 0
    assert set(frames.column_names) == {"media_id", "frame_idx", "frame"}


def test_multimodal_real_png_decode(ray_session):
    """decode='real' decodes genuine PNG bytes (pure-python codec,
    functions/png.py): dims/channels/pixel sums value-checked against the
    synthesizer's closed form; a corrupt payload dead-letters with an
    exact error instead of crashing the stage."""
    import ray.data

    from data_exchange_routing_ray.functions.multimodal import (
        synthesize_png_batch,
    )

    ids = pa.table({"doc_id": pa.array(list(range(12)), pa.int64())})
    media = synthesize_png_batch(ids)
    assert all(p[:8] == b"\x89PNG\r\n\x1a\n" for p in media["payload"].to_pylist())
    df = (
        ray.data.from_arrow(media)
        .map_batches(
            DecodeMedia,
            fn_constructor_kwargs={"decode": "real"},
            batch_format="pyarrow",
            concurrency=1,
        )
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    for i in range(12):
        w, h = 16 + i % 49, 16 + i % 33
        ch = (1, 3, 4)[i % 3]
        rowsum = int(((i + np.arange(w)) % 256).sum())
        assert df.loc[i, "width"] == w and df.loc[i, "height"] == h
        assert df.loc[i, "channels"] == ch
        assert df.loc[i, "pixel_sum"] == rowsum * h * ch
        assert df.loc[i, "decoded_bytes"] == w * h * ch
        assert df.loc[i, "error"] is None
    # corrupt payload -> per-row error, stage survives
    bad = media.set_column(
        media.schema.get_field_index("payload"),
        "payload",
        pa.array([b"not a png"] + media["payload"].to_pylist()[1:], pa.binary()),
    )
    dec = DecodeMedia(decode="real")(bad).to_pandas()
    assert dec.loc[0, "error"] is not None and "decode failed" in dec.loc[0, "error"]
    assert dec.loc[1:, "error"].isna().all()


def test_phash_invariances_and_error_isolation():
    """pHash is brightness-invariant (DC dropped, median over AC only),
    near-invariant to small pixel touches, far between distinct rasters,
    and dead-letters undecodable payloads instead of crashing the stage."""
    import pyarrow as pa

    from data_exchange_routing_ray.functions.multimodal import (
        PerceptualHash,
        synthesize_neardup_png_batch,
    )

    batch = pa.table({"doc_id": pa.array([0, 1, 2, 3, 4, 50, 51], pa.int64())})
    media = synthesize_neardup_png_batch(batch)
    out = PerceptualHash()(media)
    assert out["error"].null_count == out.num_rows
    h = out["phash"].to_pylist()

    def ham(a, b):
        return bin(a ^ b).count("1")

    # members of group 0 (ids 0-4) within the LSH threshold of each other
    for i in range(5):
        for j in range(i + 1, 5):
            assert ham(h[i], h[j]) <= 7
    # group 10 members (ids 50, 51) agree with each other, not with group 0
    assert ham(h[5], h[6]) <= 7
    assert ham(h[0], h[5]) > 7
    # corrupt payload -> per-row error, the rest of the batch still hashes
    bad = media.set_column(
        media.schema.get_field_index("payload"),
        "payload",
        pa.array([b"not a png"] + media["payload"].to_pylist()[1:], pa.binary()),
    )
    out2 = PerceptualHash()(bad)
    errs = out2["error"].to_pylist()
    assert errs[0] is not None and all(e is None for e in errs[1:])
    assert out2["phash"].to_pylist()[1:] == h[1:]


def test_pack_rows_matches_per_row_tobytes():
    """_pack_rows (vectorized offsets over the contiguous buffer) must be
    byte-identical to the per-row tobytes() loop it replaced, and round-trip
    through _sig_matrix, for both signature (uint64) and embedding (float64)
    layouts — including non-contiguous input."""
    import numpy as np
    import pyarrow as pa

    from data_exchange_routing_ray.functions.dedup import _pack_rows, _sig_matrix

    rng = np.random.default_rng(7)
    cases = [
        rng.integers(0, 1 << 60, (137, 64)).astype(np.uint64),
        rng.standard_normal((211, 64)),
        rng.standard_normal((50, 128))[:, ::2],  # non-contiguous view
        np.empty((0, 64), np.float64),
    ]
    for M in cases:
        arr = _pack_rows(M)
        ref = pa.array([M[i].tobytes() for i in range(len(M))], pa.binary())
        assert arr.equals(ref)
        if len(M):
            back = _sig_matrix(pa.chunked_array([arr]), M.shape[1], M.dtype)
            assert (back == M).all()


def test_list_col_matrix_matches_np_stack():
    """list_col_matrix (flatten + reshape over the Arrow values buffer) must
    equal the np.stack-over-objects path it replaced, handle chunked and
    sliced input, and refuse ragged/null columns."""
    import numpy as np
    import pyarrow as pa
    import pytest

    from data_exchange_routing_ray.functions.similarity import list_col_matrix

    rng = np.random.default_rng(11)
    M = rng.standard_normal((23, 16)).astype(np.float32)
    col = pa.array(list(M), pa.list_(pa.float32()))
    out = list_col_matrix(col)
    assert out.dtype == np.float64
    assert np.array_equal(out, np.stack([np.asarray(v, np.float64) for v in col.to_pylist()]))

    chunked = pa.chunked_array([col[:7], col[7:]])
    assert np.array_equal(list_col_matrix(chunked), out)
    assert np.array_equal(list_col_matrix(col.slice(5, 9)), out[5:14])
    assert list_col_matrix(pa.array([], pa.list_(pa.float32()))).shape == (0, 0)

    with pytest.raises(ValueError):
        list_col_matrix(pa.array([[1.0, 2.0], [3.0]], pa.list_(pa.float64())))
    with pytest.raises(ValueError):
        list_col_matrix(pa.array([[1.0, 2.0], None], pa.list_(pa.float64())))
