import numpy as np
import pytest

from raylink.tfidf import (
    TfidfVocab,
    TopkIndex,
    df_counts,
    fit_tfidf,
    topk_cosine,
)


def brute_tfidf(docs, n_gram_range=(3, 3)):
    """Slow oracle: sklearn TfidfVectorizer(min_df=1, analyzer=ngrams)
    defaults — smooth idf, raw tf, L2 norm — computed by hand."""
    from raylink.text import create_ngrams

    grams_per_doc = [create_ngrams(d, n_gram_range) for d in docs]
    vocab = sorted({g for gs in grams_per_doc for g in gs})
    v_idx = {g: i for i, g in enumerate(vocab)}
    n = len(docs)
    df = np.zeros(len(vocab))
    for gs in grams_per_doc:
        for g in set(gs):
            df[v_idx[g]] += 1
    idf = np.log((1 + n) / (1 + df)) + 1
    mat = np.zeros((n, len(vocab)))
    for i, gs in enumerate(grams_per_doc):
        for g in gs:
            mat[i, v_idx[g]] += 1
    mat *= idf
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    return np.divide(mat, norms, out=np.zeros_like(mat), where=norms > 0), vocab


def csr_to_dense(csr):
    out = np.zeros((csr.n_rows, csr.n_cols))
    for i in range(csr.n_rows):
        lo, hi = csr.indptr[i], csr.indptr[i + 1]
        out[i, csr.indices[lo:hi]] = csr.data[lo:hi]
    return out


@pytest.mark.parametrize("rng", [(3, 3), (2, 4)])
def test_fit_transform_matches_bruteforce(rng, fixture_lists):
    from_list, to_list = fixture_lists
    corpus = to_list + from_list
    vocab = fit_tfidf(corpus, rng)
    dense, brute_vocab = brute_tfidf(corpus, rng)
    assert [g.rstrip(b"\x00").decode() for g in vocab.vocab.tolist()] == brute_vocab
    got = csr_to_dense(vocab.transform(corpus))
    np.testing.assert_allclose(got, dense, atol=1e-12)


def test_transform_oov_and_empty():
    vocab = fit_tfidf(["apple", "house"])
    csr = vocab.transform(["zzzz", "", "apple"])
    dense = csr_to_dense(csr)
    assert dense[0].sum() == 0  # all-OOV row is zero
    assert dense[1].sum() == 0  # empty row is zero
    assert abs(np.linalg.norm(dense[2]) - 1.0) < 1e-12


def test_df_counts():
    doc_ids = np.array([0, 0, 0, 1, 1, 2], dtype=np.int64)
    grams = np.array([b"aaa", b"aaa", b"bbb", b"aaa", b"ccc", b"ccc"], dtype="S3")
    g, df = df_counts(doc_ids, grams)
    assert [x.decode() for x in g.tolist()] == ["aaa", "bbb", "ccc"]
    assert df.tolist() == [2, 1, 2]  # duplicate gram within doc counts once


def test_topk_golden_readme(fixture_lists):
    """README.md:88-96 golden numbers for the TF-IDF matcher."""
    from_list, to_list = fixture_lists
    vocab = fit_tfidf(to_list + from_list)
    index = TopkIndex(vocab.transform(to_list), np.array(to_list, dtype=object))
    idx, sims = topk_cosine(vocab.transform(from_list), index, top_n=1)
    best = {f: (int(i), s) for f, i, s in zip(from_list, idx[:, 0], sims[:, 0])}
    assert best["apple"][0] == 0 and abs(best["apple"][1] - 1.0) < 1e-9
    assert best["appl"][0] == 0 and abs(best["appl"][1] - 0.783751) < 1e-3
    assert best["house"][0] == 2 and abs(best["house"][1] - 0.587927) < 1e-3
    assert best["recal"][0] == -1
    assert best["similarity"][0] == -1


def test_topk_self_match_zeroes_diagonal():
    texts = ["apple", "apple", "banana"]
    vocab = fit_tfidf(texts)
    csr = vocab.transform(texts)
    index = TopkIndex(csr, np.array(texts, dtype=object))
    idx, sims = topk_cosine(csr, index, top_n=1, self_match=True)
    # duplicate "apple" strings still match each other at 1.0 (only the
    # positional diagonal is zeroed, polyfuzz/models/_utils.py:84-87)
    assert idx[0, 0] == 1 and abs(sims[0, 0] - 1.0) < 1e-9
    assert idx[1, 0] == 0 and abs(sims[1, 0] - 1.0) < 1e-9


def test_topk_min_similarity_lower_bound():
    texts_to = ["apple", "mouse"]
    vocab = fit_tfidf(texts_to + ["house"])
    index = TopkIndex(vocab.transform(texts_to), np.array(texts_to, dtype=object))
    fr = vocab.transform(["house"])
    idx_lo, sims_lo = topk_cosine(fr, index, top_n=1, min_similarity=0.0)
    assert idx_lo[0, 0] == 1
    # sparse path drops entries <= the bound (polyfuzz/models/_utils.py:79)
    idx_hi, sims_hi = topk_cosine(fr, index, top_n=1, min_similarity=0.9)
    assert idx_hi[0, 0] == -1 and sims_hi[0, 0] == 0.0


def test_topk_padding_when_topn_exceeds_hits():
    vocab = fit_tfidf(["apple", "zzz"])
    to = ["apple"]
    index = TopkIndex(vocab.transform(to), np.array(to, dtype=object))
    idx, sims = topk_cosine(vocab.transform(["apple"]), index, top_n=3)
    assert idx[0].tolist() == [0, -1, -1]


def test_topk_multi_chunk_consistency():
    rng = np.random.default_rng(7)
    words = ["".join(rng.choice(list("abcdef"), size=8)) for _ in range(200)]
    vocab = fit_tfidf(words)
    csr = vocab.transform(words)
    index = TopkIndex(csr, np.array(words, dtype=object))
    i1, s1 = topk_cosine(csr, index, top_n=3, self_match=True)
    i2, s2 = topk_cosine(
        csr, index, top_n=3, self_match=True, max_slab=1000
    )
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, atol=1e-12)


def test_vocab_serialize_roundtrip():
    vocab = fit_tfidf(["apple pie", "apple tart"], (2, 4))
    v2 = TfidfVocab.deserialize(vocab.serialize())
    a = csr_to_dense(vocab.transform(["apple"]))
    b = csr_to_dense(v2.transform(["apple"]))
    np.testing.assert_allclose(a, b, atol=0)


def test_tiled_kernel_matches_untiled():
    """Large to-side takes the cache-tiled path; force both paths on the
    same input and require identical results."""
    import raylink.tfidf as T

    rng = np.random.default_rng(123)
    words = ["".join(rng.choice(list("abcdefgh"), size=10)) for _ in range(6000)]
    vocab = fit_tfidf(words)
    csr = vocab.transform(words)
    index = TopkIndex(csr, np.array(words, dtype=object))
    # 6000 > TILE_ACTIVATE engages the tiled layout (single 8192-wide tile)
    assert index.tile_indptr is not None
    i_tiled, s_tiled = topk_cosine(csr, index, top_n=3, self_match=True)
    # a genuinely multi-tile geometry must agree too
    index3 = TopkIndex(csr, np.array(words, dtype=object), tile_cols=2048)
    assert index3.n_tiles > 1
    i_multi, s_multi = topk_cosine(csr, index3, top_n=3, self_match=True)
    # rebuild an index without tiling to hit the single-slab path
    index2 = TopkIndex(csr, np.array(words, dtype=object))
    index2.n_tiles = 1
    index2.tile_indptr = None
    i_flat, s_flat = topk_cosine(csr, index2, top_n=3, self_match=True)
    np.testing.assert_array_equal(i_tiled, i_flat)
    np.testing.assert_allclose(s_tiled, s_flat, atol=1e-12)
    np.testing.assert_array_equal(i_multi, i_flat)
    np.testing.assert_allclose(s_multi, s_flat, atol=1e-12)


def test_tiled_kernel_min_similarity_and_two_list():
    rng = np.random.default_rng(7)
    to_words = ["".join(rng.choice(list("abcde"), size=8)) for _ in range(5000)]
    from_words = ["".join(rng.choice(list("abcde"), size=8)) for _ in range(300)]
    vocab = fit_tfidf(to_words + from_words)
    index = TopkIndex(vocab.transform(to_words), np.array(to_words, dtype=object))
    fr = vocab.transform(from_words)
    i_t, s_t = topk_cosine(fr, index, top_n=2, min_similarity=0.5)
    index2 = TopkIndex(vocab.transform(to_words), np.array(to_words, dtype=object))
    index2.n_tiles = 1
    i_f, s_f = topk_cosine(fr, index2, top_n=2, min_similarity=0.5)
    np.testing.assert_array_equal(i_t, i_f)
    np.testing.assert_allclose(s_t, s_f, atol=1e-12)
