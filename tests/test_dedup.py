import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray.data


def _docs(rd, texts):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                "text": pa.array(texts, type=pa.string()),
            }
        )
    )


BASE = (
    "the quick brown fox jumps over the lazy dog while the rain falls softly "
    "on the quiet village and the river runs toward the distant sea"
)


def test_exact_dedup(rd):
    from raylink.dedup import exact_dedup

    texts = ["aaa", "bbb", "aaa", "ccc", "aaa", "bbb"]
    out = exact_dedup(_docs(rd, texts), "doc_id", "text").to_pandas()
    got = dict(zip(out["keep_id"], out["n_dups"]))
    assert got == {0: 3, 1: 2, 3: 1}


def test_minhash_signatures_deterministic(rd):
    from raylink.dedup import minhash_signatures_batch

    arr = pa.array([BASE, BASE, "totally different words here"])
    s1 = minhash_signatures_batch(arr, k=5, num_perm=64)
    s2 = minhash_signatures_batch(arr, k=5, num_perm=64)
    np.testing.assert_array_equal(s1, s2)
    assert (s1[0] == s1[1]).all()  # identical docs -> identical sigs
    agreement = (s1[0] == s1[2]).mean()
    assert agreement < 0.3


def test_minhash_lsh_dedup_finds_near_dups(rd):
    from raylink.dedup import minhash_lsh_dedup

    near = BASE.replace("quick", "quikc")
    texts = [BASE, near, "unrelated text about other topics entirely", BASE + " extra"]
    out = minhash_lsh_dedup(
        _docs(rd, texts), "doc_id", "text", jaccard_threshold=0.5
    )
    groups = out.groupby("dup_group")["doc_id"].apply(set).tolist()
    assert any({0, 1} <= g for g in groups)
    assert all(2 not in g for g in groups)


def test_simhash_dedup(rd):
    from raylink.dedup import simhash_dedup

    near = BASE.replace("fox", "wolf")
    texts = [BASE, near, "short odd string qqq zzz"]
    out = simhash_dedup(_docs(rd, texts), "doc_id", "text")
    if len(out):
        groups = out.groupby("dup_group")["doc_id"].apply(set).tolist()
        assert all(2 not in g for g in groups)


def test_ngram_jaccard_pairs(rd):
    from raylink.dedup import ngram_jaccard_pairs

    texts = [BASE, BASE, "completely different content with no overlap at all"]
    out = ngram_jaccard_pairs(_docs(rd, texts), "doc_id", "text", k=8, threshold=0.9)
    assert len(out) == 1
    assert (out.iloc[0]["a"], out.iloc[0]["b"]) == (0, 1)
    assert out.iloc[0]["jaccard"] == 1.0


def test_embedding_cosine_pairs(rd):
    from raylink.dedup import embedding_cosine_pairs

    vecs = [
        [1.0, 0.0, 0.0],
        [0.999, 0.01, 0.0],
        [0.0, 1.0, 0.0],
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([10, 11, 12], type=pa.int64()),
                "embedding": pa.array(vecs, type=pa.list_(pa.float64())),
            }
        )
    )
    out = embedding_cosine_pairs(ds, "vec_id", "embedding", threshold=0.99)
    assert list(zip(out["a"], out["b"])) == [(10, 11)]


def test_minhash_distributed_components_matches_driver(rd):
    from raylink.dedup import minhash_lsh_dedup

    near = BASE.replace("quick", "quikc")
    texts = [BASE, near, "unrelated words entirely different", BASE + " extra tail"]
    a = minhash_lsh_dedup(_docs(rd, texts), "doc_id", "text", jaccard_threshold=0.5)
    b = minhash_lsh_dedup(
        _docs(rd, texts), "doc_id", "text", jaccard_threshold=0.5,
        components="distributed",
    )
    ga = a.groupby("dup_group")["doc_id"].apply(frozenset).tolist()
    gb = b.groupby("dup_group")["doc_id"].apply(frozenset).tolist()
    assert set(ga) == set(gb)
