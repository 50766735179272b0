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
        _docs(rd, texts), "doc_id", "text", jaccard_threshold=0.5,
        output="pandas",  # small-scale opt-in (library default: dataset)
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
    a = minhash_lsh_dedup(_docs(rd, texts), "doc_id", "text",
                          jaccard_threshold=0.5, output="pandas")
    b = minhash_lsh_dedup(
        _docs(rd, texts), "doc_id", "text", jaccard_threshold=0.5,
        components="distributed", output="pandas",
    )
    ga = a.groupby("dup_group")["doc_id"].apply(frozenset).tolist()
    gb = b.groupby("dup_group")["doc_id"].apply(frozenset).tolist()
    assert set(ga) == set(gb)


def test_minhash_distributed_verification_matches_driver(rd):
    """Forced-distributed exact-Jaccard verification (pair/shingle
    co-shuffle) must reproduce the driver-side pass bit for bit."""
    from raylink.dedup import minhash_lsh_dedup

    rng = np.random.default_rng(7)
    words = ["alpha", "beta", "gamma", "delta", "omega", "sigma", "kappa"]
    texts = []
    for i in range(30):
        base = " ".join(rng.choice(words, size=20))
        texts.append(base)
        if i % 3 == 0:
            texts.append(base.replace("alpha", "alphx", 1))
    drv = minhash_lsh_dedup(
        _docs(rd, texts), "doc_id", "text", jaccard_threshold=0.6,
        verification="driver", output="pandas",
    )
    dist = minhash_lsh_dedup(
        _docs(rd, texts), "doc_id", "text", jaccard_threshold=0.6,
        verification="distributed", output="pandas",
    )
    pd.testing.assert_frame_equal(drv, dist)


def test_cc_partition_join_matches_union_find(rd):
    """The no-broadcast partition-join CC mode equals union-find labels on
    randomized graphs (chains force multiple propagation rounds)."""
    from raylink.linkage import (
        connected_components_labels,
        distributed_connected_components,
    )

    rng = np.random.default_rng(3)
    for trial in range(2):
        n = 60
        m = 80
        a = rng.integers(0, n, size=m).astype(np.int64)
        b = rng.integers(0, n, size=m).astype(np.int64)
        # chain forces many propagation rounds (diameter 19)
        chain = np.arange(100, 120, dtype=np.int64)
        a = np.concatenate([a, chain[:-1]])
        b = np.concatenate([b, chain[1:]])
        edges = rd.from_arrow(
            pa.table({"a": pa.array(a), "b": pa.array(b)})
        )
        # force the partition-join mode with a tiny broadcast bound
        labels = distributed_connected_components(
            edges, broadcast_max_nodes=1
        ).to_pandas()
        got = dict(zip(labels["node"], labels["label"]))
        want = connected_components_labels(a, b)
        assert got == want


def test_cc_broadcast_vectorized_matches_union_find(rd):
    from raylink.linkage import (
        connected_components_labels,
        distributed_connected_components,
    )

    rng = np.random.default_rng(9)
    a = rng.integers(0, 40, size=50).astype(np.int64)
    b = rng.integers(0, 40, size=50).astype(np.int64)
    edges = rd.from_arrow(pa.table({"a": pa.array(a), "b": pa.array(b)}))
    labels = distributed_connected_components(edges).to_pandas()
    got = dict(zip(labels["node"], labels["label"]))
    assert got == connected_components_labels(a, b)


def _planted_embeddings(rd, n=200, dim=32, n_dups=25, noise=0.05, seed=13):
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, dim))
    vecs = [base[i] for i in range(n)]
    # planted near-dups: small perturbations of the first n_dups rows
    for i in range(n_dups):
        vecs.append(base[i] + noise * rng.standard_normal(dim))
    ids = np.arange(len(vecs), dtype=np.int64)
    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], type=pa.list_(pa.float64())
                ),
            }
        )
    )


def test_embedding_lsh_recall_vs_brute_force(rd):
    """LSH-bucketed near-dup path: recall >= 0.95 vs the exact baseline at
    the near-dup threshold, zero false positives (candidates are verified
    with exact cosine), no full-matrix broadcast."""
    from raylink.dedup import embedding_cosine_pairs, embedding_lsh_pairs

    ds = _planted_embeddings(rd)
    exact = embedding_cosine_pairs(ds, "vec_id", "embedding", threshold=0.9)
    lsh = embedding_lsh_pairs(ds, "vec_id", "embedding", threshold=0.9)
    exact_set = set(zip(exact["a"], exact["b"]))
    lsh_set = set(zip(lsh["a"], lsh["b"]))
    assert len(exact_set) >= 20  # the planted dups are found by brute force
    assert lsh_set <= exact_set  # verification makes precision exact
    assert len(lsh_set & exact_set) / len(exact_set) >= 0.95


def test_embedding_lsh_distributed_verification(rd):
    from raylink.dedup import embedding_lsh_pairs

    ds = _planted_embeddings(rd, n=80, n_dups=10)
    drv = embedding_lsh_pairs(
        ds, "vec_id", "embedding", threshold=0.9, verification="driver"
    )
    dist = embedding_lsh_pairs(
        ds, "vec_id", "embedding", threshold=0.9, verification="distributed"
    )
    pd.testing.assert_frame_equal(drv, dist)


def test_simhash_distributed_bucketing_matches_driver(rd):
    from raylink.dedup import simhash_dedup

    near = BASE.replace("quick", "quikc")
    texts = [BASE, near, "unrelated words entirely different", BASE + " tail",
             BASE.replace("fox", "fxo"), "another distinct document here"]
    drv = simhash_dedup(_docs(rd, texts), "doc_id", "text", bucketing="driver")
    dist = simhash_dedup(
        _docs(rd, texts), "doc_id", "text", bucketing="distributed"
    )
    pd.testing.assert_frame_equal(drv, dist)
    assert len(drv) >= 2  # the planted near-dups are found


def test_ngram_jaccard_duplicate_doc_rows_guard(rd):
    """Duplicate doc_id input rows must not emit self-pairs or
    double-counted intersections."""
    import pyarrow as pa

    from raylink.dedup import ngram_jaccard_pairs

    texts = [BASE, BASE.replace("quick", "quikc"), "something else wholly"]
    ids = [0, 1, 2, 0]  # doc 0 duplicated
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.asarray(ids, dtype=np.int64)),
                "text": pa.array([texts[0], texts[1], texts[2], texts[0]]),
            }
        )
    )
    out = ngram_jaccard_pairs(ds, "doc_id", "text", k=8, threshold=0.3)
    assert not ((out["a"] == out["b"]).any())
    assert (out["jaccard"] <= 1.0).all()


def test_cc_string_nodes_both_modes(rd):
    """Connected components over STRING node ids: both the broadcast and
    the partition-join mode (object-dtype minimum/searchsorted paths)."""
    from raylink.linkage import (
        connected_components_labels,
        distributed_connected_components,
    )

    rng = np.random.default_rng(4)
    a = np.array([f"n{int(x):03d}" for x in rng.integers(0, 40, 60)], dtype=object)
    b = np.array([f"n{int(x):03d}" for x in rng.integers(0, 40, 60)], dtype=object)
    want = connected_components_labels(a, b)
    for kw in ({}, {"broadcast_max_nodes": 1}):
        edges = rd.from_arrow(
            pa.table(
                {
                    "a": pa.array(a, type=pa.string()),
                    "b": pa.array(b, type=pa.string()),
                }
            )
        )
        got = distributed_connected_components(edges, **kw).to_pandas()
        assert dict(zip(got["node"], got["label"])) == want


def test_minhash_dataset_candidates_never_touch_driver(rd, monkeypatch):
    """Forced Dataset-candidate path (band_driver_threshold=0 +
    distributed verification): candidates flow as a Dataset into the
    verify shuffle with per-partition dedup — the driver-side
    drop_duplicates/collect path must never run (VERDICT r2 #2), and the
    output must equal the default driver path exactly."""
    import raylink.dedup as dd

    rng = np.random.default_rng(7)
    words = ["alpha", "beta", "gamma", "delta", "omega", "sigma", "kappa"]
    texts = []
    for i in range(30):
        base = " ".join(rng.choice(words, size=20))
        texts.append(base)
        if i % 3 == 0:
            texts.append(base.replace("alpha", "alphx", 1))
    base_out = dd.minhash_lsh_dedup(
        _docs(rd, texts), "doc_id", "text", jaccard_threshold=0.6,
        output="pandas",
    )

    seen = {}
    orig = dd._verify_pairs_distributed

    def spy(sh_ds, cand, *a, **k):
        seen["cand_is_dataset"] = not isinstance(cand, pd.DataFrame)
        return orig(sh_ds, cand, *a, **k)

    monkeypatch.setattr(dd, "_verify_pairs_distributed", spy)

    def no_driver_dedup(self, *a, **k):
        raise AssertionError("driver-side candidate drop_duplicates ran")

    monkeypatch.setattr(pd.DataFrame, "drop_duplicates", no_driver_dedup)
    out = dd.minhash_lsh_dedup(
        _docs(rd, texts), "doc_id", "text", jaccard_threshold=0.6,
        verification="distributed", band_driver_threshold=0,
        output="pandas",
    )
    assert seen["cand_is_dataset"]
    pd.testing.assert_frame_equal(base_out, out)


def test_embedding_lsh_dataset_candidates_never_touch_driver(rd, monkeypatch):
    """Same guard for the embedding LSH path: Dataset candidates, no
    driver dedup, identical output to the default path."""
    import raylink.dedup as dd

    ds = _planted_embeddings(rd, n=80, n_dups=10)
    base_out = dd.embedding_lsh_pairs(
        ds, "vec_id", "embedding", threshold=0.9
    )

    def no_driver_dedup(self, *a, **k):
        raise AssertionError("driver-side candidate drop_duplicates ran")

    monkeypatch.setattr(pd.DataFrame, "drop_duplicates", no_driver_dedup)
    out = dd.embedding_lsh_pairs(
        ds, "vec_id", "embedding", threshold=0.9,
        verification="distributed", band_driver_threshold=0,
    )
    pd.testing.assert_frame_equal(base_out, out)


def test_minhash_dataset_candidates_distributed_components(rd):
    """End-to-end full-distributed mode: Dataset candidates + distributed
    verification + distributed components — same groups as all-driver."""
    import raylink.dedup as dd

    near = BASE.replace("quick", "quikc")
    texts = [BASE, near, "unrelated words entirely different", BASE + " extra tail"]
    a = dd.minhash_lsh_dedup(_docs(rd, texts), "doc_id", "text",
                             jaccard_threshold=0.5, output="pandas")
    b = dd.minhash_lsh_dedup(
        _docs(rd, texts), "doc_id", "text", jaccard_threshold=0.5,
        verification="distributed", band_driver_threshold=0,
        components="distributed", output="pandas",
    )
    ga = a.groupby("dup_group")["doc_id"].apply(frozenset).tolist()
    gb = b.groupby("dup_group")["doc_id"].apply(frozenset).tolist()
    assert set(ga) == set(gb)


def test_ngram_jaccard_distributed_aggregation_matches_driver(rd):
    """Forced pair-partition aggregation (driver_agg_max_rows=0) equals
    the driver-side count pass exactly."""
    from raylink.dedup import ngram_jaccard_pairs

    near = BASE.replace("quick", "quikc")
    texts = [BASE, near, "unrelated text entirely", BASE + " extra", near + " x"]
    drv = ngram_jaccard_pairs(_docs(rd, texts), "doc_id", "text", k=8, threshold=0.3)
    dist = ngram_jaccard_pairs(
        _docs(rd, texts), "doc_id", "text", k=8, threshold=0.3,
        driver_agg_max_rows=0,
    )
    pd.testing.assert_frame_equal(drv, dist)
    assert len(drv) >= 2


def test_minhash_output_dataset(rd):
    """output='dataset' in full-distributed mode returns an un-collected
    (doc_id, dup_group) Dataset with the same groups as the pandas path."""
    import raylink.dedup as dd

    near = BASE.replace("quick", "quikc")
    texts = [BASE, near, "unrelated words entirely different", BASE + " extra tail"]
    base_out = dd.minhash_lsh_dedup(
        _docs(rd, texts), "doc_id", "text", jaccard_threshold=0.5,
        output="pandas",
    )
    out_ds = dd.minhash_lsh_dedup(
        _docs(rd, texts), "doc_id", "text", jaccard_threshold=0.5,
        verification="distributed", band_driver_threshold=0,
        components="distributed", output="dataset",
    )
    got = out_ds.to_pandas().sort_values(
        ["dup_group", "doc_id"], ignore_index=True
    ).astype(np.int64)
    ga = base_out.groupby("dup_group")["doc_id"].apply(frozenset).tolist()
    gb = got.groupby("dup_group")["doc_id"].apply(frozenset).tolist()
    assert set(ga) == set(gb)
    # the raise is reserved for an EXPLICIT driver-path conflict — plain
    # output="dataset" auto-routes to distributed verification/components
    with pytest.raises(ValueError):
        dd.minhash_lsh_dedup(
            _docs(rd, texts), "doc_id", "text", output="dataset",
            verification="driver",
        )


def test_embedding_lsh_output_dataset(rd):
    import raylink.dedup as dd

    ds = _planted_embeddings(rd, n=80, n_dups=10)
    base_out = dd.embedding_lsh_pairs(ds, "vec_id", "embedding", threshold=0.9)
    out_ds = dd.embedding_lsh_pairs(
        ds, "vec_id", "embedding", threshold=0.9,
        verification="distributed", band_driver_threshold=0, output="dataset",
    )
    got = (
        out_ds.to_pandas()
        .astype({"a": np.int64, "b": np.int64})
        .sort_values(["a", "b"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(base_out, got)
    # auto + dataset output ROUTES to distributed verification (r4 review
    # fix: the raise is reserved for an explicit driver-path conflict)
    auto_ds = dd.embedding_lsh_pairs(
        ds, "vec_id", "embedding", threshold=0.9, output="dataset"
    )
    got_auto = (
        auto_ds.to_pandas()
        .astype({"a": np.int64, "b": np.int64})
        .sort_values(["a", "b"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(base_out, got_auto)
    with pytest.raises(ValueError):
        dd.embedding_lsh_pairs(
            ds, "vec_id", "embedding", verification="driver",
            output="dataset",
        )


def test_minhash_taskpool_verify_matches_serial(rd):
    """The task-parallel driver verification (left-doc-aligned ranges,
    shared kernel) must produce the same groups as the serial pass."""
    import raylink.dedup as dd

    rng = np.random.default_rng(9)
    words = ["alpha", "beta", "gamma", "delta", "omega", "sigma", "kappa"]
    texts = []
    for i in range(40):
        base = " ".join(rng.choice(words, size=18))
        texts.append(base)
        if i % 2 == 0:
            texts.append(base.replace("alpha", "alphx", 1))
    serial = dd.minhash_lsh_dedup(
        _docs(rd, texts), "doc_id", "text", jaccard_threshold=0.6,
        output="pandas",
    )
    taskpool = dd.minhash_lsh_dedup(
        _docs(rd, texts), "doc_id", "text", jaccard_threshold=0.6,
        taskpool_verify_min_pairs=0, output="pandas",
    )
    pd.testing.assert_frame_equal(serial, taskpool)
    assert len(serial) >= 2


def test_minhash_resumable_matches_streaming(rd, tmp_path):
    """Per-partition resumable minhash: same output as the streaming
    variant; a killed run (missing marker) recomputes ONLY that
    partition."""
    import pyarrow.parquet as pq

    import raylink.dedup as dd

    rng = np.random.default_rng(11)
    words = ["alpha", "beta", "gamma", "delta", "omega", "sigma", "kappa"]
    texts = []
    for i in range(24):
        base = " ".join(rng.choice(words, size=16))
        texts.append(base)
        if i % 2 == 0:
            texts.append(base.replace("alpha", "alphx", 1))
    data_dir = tmp_path / "docs"
    data_dir.mkdir()
    n_half = len(texts) // 2
    for part, lo, hi in [("a", 0, n_half), ("b", n_half, len(texts))]:
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(np.arange(lo, hi, dtype=np.int64)),
                    "text": pa.array(texts[lo:hi], type=pa.string()),
                }
            ),
            str(data_dir / f"{part}.parquet"),
        )

    streaming = dd.minhash_lsh_dedup(
        _docs(rd, texts), "doc_id", "text", jaccard_threshold=0.6,
        output="pandas",
    )
    root = str(tmp_path / "ckpt")
    resumable = dd.minhash_lsh_dedup_resumable(
        str(data_dir), root, "doc_id", "text", jaccard_threshold=0.6,
        output="pandas",
    )
    pd.testing.assert_frame_equal(streaming, resumable)
    assert len(streaming) >= 2

    # kill-one-partition resume: drop partition b's marker + part file,
    # spy on the producer via the parquet reads
    import os

    marks = os.path.join(root, "minhash_bands", "marks")
    parts = os.path.join(root, "minhash_bands", "data")
    os.remove(os.path.join(marks, "part-b.done.json"))
    os.remove(os.path.join(parts, "part-b.parquet"))
    before_a = os.path.getmtime(os.path.join(parts, "part-a.parquet"))
    again = dd.minhash_lsh_dedup_resumable(
        str(data_dir), root, "doc_id", "text", jaccard_threshold=0.6,
        output="pandas",
    )
    pd.testing.assert_frame_equal(streaming, again)
    assert os.path.getmtime(os.path.join(parts, "part-a.parquet")) == before_a
    assert os.path.exists(os.path.join(parts, "part-b.parquet"))


def test_dedup_representatives(rd):
    from raylink.dedup import dedup_representatives, minhash_lsh_dedup

    near = BASE.replace("quick", "quikc")
    texts = [
        BASE, near, "unrelated text about other topics entirely",
        BASE + " extra tail words", BASE + " x",
    ]
    ds = _docs(rd, texts)
    kw = dict(k=5, num_perm=64, bands=16, jaccard_threshold=0.5)
    pandas_kw = dict(output="pandas", groups_output="pandas", **kw)
    got = dedup_representatives(ds, "doc_id", "text", **pandas_kw)
    # oracle: compose from the (already-tested) group table + pandas
    groups = minhash_lsh_dedup(ds, "doc_id", "text", output="pandas", **kw)
    groups["n_chars"] = groups["doc_id"].map(
        {i: len(t) for i, t in enumerate(texts)}
    )
    want = (
        groups.sort_values(["dup_group", "n_chars", "doc_id"],
                           ascending=[True, False, True])
        .groupby("dup_group")
        .agg(rep_id=("doc_id", "first"), rep_chars=("n_chars", "first"),
             n_members=("doc_id", "size"))
        .reset_index()
    )
    pd.testing.assert_frame_equal(
        got, want.astype(got.dtypes.to_dict()), check_dtype=False
    )
    # representative must be the LONGEST member (doc 3), not the smallest id
    rep_of_base = got[got.n_members >= 3]
    assert len(rep_of_base) == 1 and rep_of_base.iloc[0]["rep_id"] == 3
    # forced distributed digest merge is value-identical
    got2 = dedup_representatives(ds, "doc_id", "text",
                                 driver_merge_max_rows=0, **pandas_kw)
    pd.testing.assert_frame_equal(got, got2, check_dtype=False)


def test_contamination_check_modes_identical(rd):
    from raylink.dedup import contamination_check

    rng = np.random.default_rng(3)
    vocab = [f"t{i}" for i in range(40)]
    corpus_texts = [
        " ".join(rng.choice(vocab, 12)) for _ in range(60)
    ] + ["", "  "]
    eval_texts = corpus_texts[::7][:5]  # planted overlaps
    corpus = _docs(rd, corpus_texts).repartition(4)
    ev = _docs(rd, eval_texts)
    b = contamination_check(corpus, ev, "doc_id", "text", ngram=3,
                            mode="broadcast", output="pandas")
    d = contamination_check(corpus, ev, "doc_id", "text", ngram=3,
                            mode="distributed", output="pandas")
    pd.testing.assert_frame_equal(b, d)
    # default output is an un-collected Dataset (scale surface), value-
    # identical to pandas incl. the distributed zero-fill of clean docs
    dds = contamination_check(corpus, ev, "doc_id", "text", ngram=3,
                              mode="distributed")
    dd = (dds.to_pandas().sort_values("doc_id").reset_index(drop=True)
          [list(b.columns)])
    pd.testing.assert_frame_equal(b, dd)
    # every planted eval doc must be flagged with ALL its grams hit
    for i in range(0, 35, 7):
        row = b[b.doc_id == i].iloc[0]
        assert row["contaminated"] and row["n_hit_grams"] >= 1
    # bloom prefilter mode: auto-sized bitmap AND a deliberately tiny
    # 256-bit bitmap (forces false positives through the exact confirm
    # pass) are both value-identical — the bitmap is a prefilter, never
    # the answer
    bl = contamination_check(corpus, ev, "doc_id", "text", ngram=3,
                             mode="bloom", output="pandas")
    pd.testing.assert_frame_equal(b, bl)
    bl_tiny = contamination_check(corpus, ev, "doc_id", "text", ngram=3,
                                  mode="bloom", bloom_bits=256,
                                  output="pandas")
    pd.testing.assert_frame_equal(b, bl_tiny)
    # geometry guards: non-power-of-two / unknown mode raise loudly
    with pytest.raises(ValueError, match="power of two"):
        contamination_check(corpus, ev, "doc_id", "text", ngram=3,
                            mode="bloom", bloom_bits=300, output="pandas")
    with pytest.raises(ValueError, match="unknown mode"):
        contamination_check(corpus, ev, "doc_id", "text", ngram=3,
                            mode="blom", output="pandas")
    # empty eval set: all-zero bitmap -> no candidates -> every doc clean
    bl_empty = contamination_check(
        corpus, _docs(rd, ["", " "]), "doc_id", "text", ngram=3,
        mode="bloom", output="pandas")
    assert not bl_empty["contaminated"].any()
    assert len(bl_empty) == len(b)
    # pandas brute-force oracle
    def grams(t, n=3):
        ws = t.split()
        return {" ".join(ws[j:j + n]) for j in range(len(ws) - n + 1)}
    eg = set().union(*(grams(t) for t in eval_texts))
    for _, row in b.iterrows():
        want = len(grams(corpus_texts[int(row.doc_id)]) & eg)
        assert row["n_hit_grams"] == want, row


def test_dedup_representatives_full_distributed(rd):
    """groups_output='dataset' (membership never on the driver) is
    value-identical to the default path."""
    from raylink.dedup import dedup_representatives

    near = BASE.replace("quick", "quikc")
    texts = [BASE, near, "unrelated text entirely", BASE + " extra tail"]
    ds = _docs(rd, texts)
    kw = dict(k=5, num_perm=64, bands=16, jaccard_threshold=0.5)
    default = dedup_representatives(ds, "doc_id", "text", output="pandas",
                                    groups_output="pandas", **kw)
    dist = dedup_representatives(
        ds, "doc_id", "text", groups_output="dataset", output="pandas",
        verification="distributed", components="distributed",
        band_driver_threshold=0, **kw,
    )
    pd.testing.assert_frame_equal(default, dist, check_dtype=False)


def test_apply_dedup_survivors(rd):
    from raylink.dedup import apply_dedup, dedup_representatives, minhash_lsh_dedup

    near = BASE.replace("quick", "quikc")
    texts = [
        BASE, near, "unrelated text about other topics entirely",
        BASE + " extra tail words", BASE + " x",
    ]
    ds = _docs(rd, texts)
    kw = dict(k=5, num_perm=64, bands=16, jaccard_threshold=0.5)
    surv = apply_dedup(ds, "doc_id", "text", output="pandas",
                       groups_output="pandas", **kw)
    groups = minhash_lsh_dedup(ds, "doc_id", "text", output="pandas", **kw)
    reps = dedup_representatives(ds, "doc_id", "text", output="pandas",
                                 groups_output="pandas", **kw)
    drop = set(groups.doc_id) - set(reps.rep_id)
    assert set(surv.doc_id) == set(range(len(texts))) - drop
    # survivors carry the original text unchanged
    for _, row in surv.iterrows():
        assert row["text"] == texts[int(row.doc_id)]
    # the longest member of the BASE cluster (doc 3) is the survivor
    assert 3 in set(surv.doc_id) and 0 not in set(surv.doc_id)
    # precomputed-groups pass-through: one grouping pass feeding both
    # consumers must equal the internally-recomputed paths, for pandas
    # AND Dataset groups forms
    import pandas as pd
    import ray.data as rdm

    for g in (groups, rdm.from_pandas(groups)):
        surv2 = apply_dedup(ds, "doc_id", "text", output="pandas",
                            groups_output="pandas", groups=g, **kw)
        pd.testing.assert_frame_equal(surv, surv2)
        reps2 = dedup_representatives(ds, "doc_id", "text", output="pandas",
                                      groups_output="pandas", groups=g, **kw)
        pd.testing.assert_frame_equal(reps, reps2)


def test_incremental_minhash_dedup(rd):
    from raylink.dedup import incremental_minhash_dedup

    corpus_texts = [BASE, "completely unrelated corpus doc over here"]
    delta_texts = [
        BASE.replace("quick", "quikc"),  # near-dup of corpus 0
        "brand new unique document nothing alike at all",
        BASE,                            # exact dup of corpus 0
    ]
    corpus = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(corpus_texts, pa.string()),
    }))
    delta = rd.from_arrow(pa.table({
        "doc_id": pa.array([10, 11, 12], pa.int64()),
        "text": pa.array(delta_texts, pa.string()),
    }))
    out = incremental_minhash_dedup(
        corpus, delta, "doc_id", "text", jaccard_threshold=0.5
    )
    assert out["doc_id"].tolist() == [10, 11, 12]
    assert out["is_dup"].tolist() == [True, False, True]
    # min-partner: both dups match corpus doc 0 (not each other)
    assert out["match_id"].tolist() == [0, -1, 0]
    # distributed verification path is value-identical
    dist = incremental_minhash_dedup(
        corpus, delta, "doc_id", "text", jaccard_threshold=0.5,
        verification="distributed",
    )
    pd.testing.assert_frame_equal(out, dist)
    # ingestion id convention is enforced
    with pytest.raises(ValueError):
        incremental_minhash_dedup(delta, corpus, "doc_id", "text")


def test_incremental_dedup_dataset_candidates(rd):
    """Forced full-distributed route: candidates stay a Dataset
    (band_driver_threshold=0), verification distributed, output='dataset'
    returns only matched rows — all value-identical to the driver path."""
    from raylink.dedup import incremental_minhash_dedup

    corpus_texts = [BASE, "completely unrelated corpus doc over here"]
    delta_texts = [BASE.replace("quick", "quikc"), "nothing alike here", BASE]
    corpus = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(corpus_texts, pa.string()),
    }))
    delta = rd.from_arrow(pa.table({
        "doc_id": pa.array([10, 11, 12], pa.int64()),
        "text": pa.array(delta_texts, pa.string()),
    }))
    kw = dict(jaccard_threshold=0.5)
    default = incremental_minhash_dedup(corpus, delta, "doc_id", "text", **kw)
    forced = incremental_minhash_dedup(
        corpus, delta, "doc_id", "text",
        band_driver_threshold=0, verification="distributed", **kw,
    )
    pd.testing.assert_frame_equal(default, forced)
    matched = incremental_minhash_dedup(
        corpus, delta, "doc_id", "text",
        band_driver_threshold=0, verification="distributed",
        output="dataset", **kw,
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = default[default.is_dup][["doc_id", "match_id"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(matched, want, check_dtype=False)


def test_incremental_dedup_empty_delta(rd):
    from raylink.dedup import incremental_minhash_dedup

    corpus = _docs(rd, [BASE, "other text"])
    empty = _docs(rd, [])
    out = incremental_minhash_dedup(corpus, empty, "doc_id", "text")
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "is_dup", "match_id"]


def test_fuzzy_contamination(rd):
    """Crossing pairs only: corpus docs matching an EVAL doc are flagged
    (min eval partner); corpus-corpus and eval-eval near-dups are not.
    Id spaces overlap on purpose (the internal offset must disambiguate)."""
    from raylink.dedup import fuzzy_contamination

    corpus_texts = [
        BASE,                                  # 0: matches eval 0 and 2
        BASE,                                  # 1: corpus-corpus dup of 0
        "completely unrelated corpus doc standing alone over here today",
    ]
    eval_texts = [
        BASE.replace("quick", "quikc"),        # 0: near-dup of corpus 0/1
        "brand new benchmark question nothing alike at all",
        BASE + " tail",                        # 2: also matches corpus 0/1
    ]
    corpus = _docs(rd, corpus_texts)
    evals = _docs(rd, eval_texts)
    out = fuzzy_contamination(
        corpus, evals, "doc_id", "text", jaccard_threshold=0.5,
        output="pandas",
    )
    # both BASE copies flagged with the SMALLEST eval partner; the clean
    # corpus doc and the corpus-corpus duplication are absent
    assert out["doc_id"].tolist() == [0, 1]
    assert out["eval_id"].tolist() == [0, 0]
    # forced-distributed verification and dataset candidates are
    # value-identical; output="dataset" returns the same matched rows
    forced = fuzzy_contamination(
        corpus, evals, "doc_id", "text", jaccard_threshold=0.5,
        band_driver_threshold=0, verification="distributed",
        output="pandas",
    )
    pd.testing.assert_frame_equal(out, forced)
    matched = (
        fuzzy_contamination(
            corpus, evals, "doc_id", "text", jaccard_threshold=0.5,
        )
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(matched.astype(np.int64), out)


def test_fuzzy_contamination_empty_and_invalid(rd):
    from raylink.dedup import fuzzy_contamination

    corpus = _docs(rd, [BASE, "other text"])
    empty = _docs(rd, [])
    for a, b in ((corpus, empty), (empty, corpus)):
        got = fuzzy_contamination(a, b, "doc_id", "text", output="pandas")
        assert len(got) == 0
        assert list(got.columns) == ["doc_id", "eval_id"]
        assert got["doc_id"].dtype == np.int64
        ds_got = fuzzy_contamination(a, b, "doc_id", "text")
        assert ds_got.to_pandas().empty
    neg = rd.from_arrow(pa.table({
        "doc_id": pa.array([-1], pa.int64()),
        "text": pa.array([BASE], pa.string()),
    }))
    with pytest.raises(ValueError, match="non-negative"):
        fuzzy_contamination(corpus, neg, "doc_id", "text", output="pandas")
    with pytest.raises(ValueError, match="non-negative"):
        fuzzy_contamination(neg, corpus, "doc_id", "text", output="pandas")
    # no qualifying pairs -> typed empty
    clean = _docs(rd, ["totally different words in every position here"])
    got = fuzzy_contamination(corpus, clean, "doc_id", "text", output="pandas")
    assert len(got) == 0 and list(got.columns) == ["doc_id", "eval_id"]
    # null ids reject loudly (NULL int64 policy); bad mode strings too
    withnull = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, None], pa.int64()),
        "text": pa.array([BASE, BASE], pa.string()),
    }))
    with pytest.raises(Exception, match="null"):
        fuzzy_contamination(corpus, withnull, "doc_id", "text",
                            output="pandas")
    with pytest.raises(Exception, match="null"):
        fuzzy_contamination(withnull, corpus, "doc_id", "text",
                            output="pandas")
    with pytest.raises(ValueError, match="output"):
        fuzzy_contamination(corpus, corpus, "doc_id", "text", output="Pandas")
    with pytest.raises(ValueError, match="verification"):
        fuzzy_contamination(corpus, corpus, "doc_id", "text",
                            verification="none")


def test_corpus_diff(rd):
    """added/removed/changed statuses; unchanged rows excluded by
    default; driver merge, forced shuffle, and dataset output agree."""
    from raylink.dedup import corpus_diff

    old = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(12, dtype=np.int64)),
        "text": pa.array([f"doc {i} body" for i in range(12)], pa.string()),
    }))
    new_rows = [(i, f"doc {i} body" + (" v2" if i % 3 == 0 else ""))
                for i in range(12) if i % 5 != 0] + [(100, "brand new")]
    new = rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in new_rows], pa.int64()),
        "text": pa.array([r[1] for r in new_rows], pa.string()),
    }))
    exp = pd.DataFrame({
        "doc_id": np.array([0, 3, 5, 6, 9, 10, 100], dtype=np.int64),
        "status": ["removed", "changed", "removed", "changed", "changed",
                   "removed", "added"],
    })
    got = corpus_diff(old, new, "doc_id", "text", output="pandas")
    pd.testing.assert_frame_equal(got, exp)
    forced = corpus_diff(old, new, "doc_id", "text",
                         driver_merge_max_rows=0, output="pandas")
    pd.testing.assert_frame_equal(forced, exp)
    ds_got = (
        corpus_diff(old, new, "doc_id", "text")
        .to_pandas().sort_values(["doc_id", "status"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        ds_got.astype({"doc_id": np.int64}), exp
    )
    withu = corpus_diff(old, new, "doc_id", "text",
                        include_unchanged=True, output="pandas")
    assert (withu["status"] == "unchanged").sum() == 12 - len(exp) + 1
    # identical corpora -> typed empty both modes
    same = corpus_diff(old, old, "doc_id", "text", output="pandas")
    assert len(same) == 0 and list(same.columns) == ["doc_id", "status"]
    assert corpus_diff(old, old, "doc_id", "text").to_pandas().empty


def test_corpus_diff_rejections(rd):
    from raylink.dedup import corpus_diff

    old = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["a", "b"], pa.string()),
    }))
    # duplicate ids within one side: per-block and cross-block
    dup = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 1], pa.int64()),
        "text": pa.array(["a", "b"], pa.string()),
    }))
    with pytest.raises(Exception, match="duplicate"):
        corpus_diff(old, dup, "doc_id", "text", output="pandas")
    one = lambda i, t: rd.from_arrow(pa.table({
        "doc_id": pa.array([i], pa.int64()),
        "text": pa.array([t], pa.string()),
    }))
    with pytest.raises(Exception, match="duplicate"):
        corpus_diff(old, one(1, "a").union(one(1, "b")),
                    "doc_id", "text", output="pandas")
    # nulls and reserved staging names reject loudly
    nulls = rd.from_arrow(pa.table({
        "doc_id": pa.array([2], pa.int64()),
        "text": pa.array([None], pa.string()),
    }))
    with pytest.raises(Exception, match="null"):
        corpus_diff(old, nulls, "doc_id", "text", output="pandas")
    with pytest.raises(ValueError, match="staging"):
        corpus_diff(old, old, "status", "text")


def _acd_frame(n=20):
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array([f"doc {i} body" for i in range(n)], pa.string()),
        "lang": pa.array(["en", "de"] * (n // 2), pa.string()),
    })


def test_apply_corpus_delta(rd):
    """Upserts replace same-id rows, new ids append, deletes remove;
    column order follows the base; broadcast and forced-distributed
    anti-join agree; delete of an absent id is a no-op."""
    from raylink.dedup import apply_corpus_delta

    base_tbl = _acd_frame()
    base = rd.from_arrow(base_tbl).repartition(3)
    delta = rd.from_arrow(pa.table({
        # deliberately different column ORDER — same name set
        "lang": pa.array(["fr", "fr"], pa.string()),
        "doc_id": pa.array([3, 100], pa.int64()),
        "text": pa.array(["updated 3", "brand new"], pa.string()),
    }))
    exp = base_tbl.to_pandas()
    exp = exp[~exp["doc_id"].isin([3, 7, 100])]
    exp = pd.concat([exp, pd.DataFrame({
        "doc_id": np.array([3, 100], dtype=np.int64),
        "text": ["updated 3", "brand new"],
        "lang": ["fr", "fr"],
    })]).sort_values("doc_id").reset_index(drop=True)

    got = apply_corpus_delta(
        base, delta, "doc_id", delete_ids=[7, 999], output="pandas"
    )
    pd.testing.assert_frame_equal(got, exp)
    # dataset output (default) matches; forced-distributed anti-join too
    ds_got = (
        apply_corpus_delta(base, delta, "doc_id", delete_ids=[7, 999])
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(ds_got, exp)
    dist = apply_corpus_delta(
        base, delta, "doc_id", delete_ids=[7, 999],
        mode="distributed", output="pandas",
    )
    pd.testing.assert_frame_equal(dist, exp)
    # delete_ids as a Dataset; no deletes at all
    del_ds = rd.from_arrow(pa.table({"doc_id": pa.array([7], pa.int64())}))
    got2 = apply_corpus_delta(
        base, delta, "doc_id", delete_ids=del_ds, output="pandas"
    )
    pd.testing.assert_frame_equal(got2, exp)
    no_del = apply_corpus_delta(base, delta, "doc_id", output="pandas")
    assert set(no_del["doc_id"]) == set(exp["doc_id"]) | {7}


def test_apply_corpus_delta_guards(rd):
    from raylink.dedup import apply_corpus_delta

    base = rd.from_arrow(_acd_frame())
    one = lambda i: rd.from_arrow(pa.table({
        "doc_id": pa.array([i], pa.int64()),
        "text": pa.array(["x"], pa.string()),
        "lang": pa.array(["en"], pa.string()),
    }))
    # duplicate delta ids: cross-block (two single-row blocks)
    with pytest.raises(ValueError, match="duplicate"):
        apply_corpus_delta(base, one(5).union(one(5)), "doc_id")
    # delta ∩ delete_ids is ambiguous
    with pytest.raises(ValueError, match="BOTH"):
        apply_corpus_delta(base, one(5), "doc_id", delete_ids=[5])
    # column-name sets must match
    with pytest.raises(ValueError, match="column sets differ"):
        apply_corpus_delta(
            base,
            rd.from_arrow(pa.table({"doc_id": pa.array([1], pa.int64())})),
            "doc_id",
        )
    # null / duplicate base ids reject loudly (nulls would silently
    # drop through the anti-join's join policy otherwise)
    null_base = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, None], pa.int64()),
        "text": pa.array(["a", "b"], pa.string()),
        "lang": pa.array(["en", "en"], pa.string()),
    }))
    with pytest.raises(Exception, match="null"):
        apply_corpus_delta(null_base, one(9), "doc_id", output="pandas")
    dup_base = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 1], pa.int64()),
        "text": pa.array(["a", "b"], pa.string()),
        "lang": pa.array(["en", "en"], pa.string()),
    }))
    with pytest.raises(Exception, match="duplicate"):
        apply_corpus_delta(dup_base, one(9), "doc_id", output="pandas")
    with pytest.raises(ValueError, match="output"):
        apply_corpus_delta(base, one(9), "doc_id", output="Pandas")
    # float delete ids would truncate silently through the int64 cast
    with pytest.raises(TypeError, match="integers"):
        apply_corpus_delta(base, one(9), "doc_id", delete_ids=[1.5])
    # id_col colliding with the dup-guard staging column
    renamed = rd.from_arrow(pa.table({
        "n_rows": pa.array([1], pa.int64()),
        "text": pa.array(["a"], pa.string()),
    }))
    with pytest.raises(ValueError, match="n_rows"):
        apply_corpus_delta(renamed, renamed, "n_rows")


def test_corpus_diff_leading_nul_versions(rd):
    """Two versions differing only in leading NUL bytes must report
    'changed': the seam hash folds the byte length past the FNV h0=0
    fixed point (which absorbs leading NULs)."""
    from raylink.dedup import corpus_diff

    old = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["a", ""], pa.string()),
    }))
    new = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["\x00a", "\x00"], pa.string()),
    }))
    got = corpus_diff(old, new, "doc_id", "text", output="pandas")
    assert got["doc_id"].tolist() == [0, 1]
    assert set(got["status"]) == {"changed"}


def test_simhash_dedup_short_docs_not_grouped(rd):
    """Docs whose cleaned text is shorter than k all simhash to 0 — they
    must NOT verify as near-dups of each other."""
    from raylink.dedup import simhash_dedup

    texts = ["cat", "dog", "owl", BASE, BASE.replace("fox", "wolf")]
    out = simhash_dedup(_docs(rd, texts), "doc_id", "text", k=4)
    if len(out):
        groups = out.groupby("dup_group")["doc_id"].apply(set).tolist()
        for g in groups:
            assert not (g & {0, 1, 2}), g


def test_dedup_representatives_custom_id_col(rd):
    """id_col != 'doc_id' must work end to end (the minhash group table
    hard-codes doc_id; the composition renames it)."""
    from raylink.dedup import apply_dedup, dedup_representatives

    near = BASE.replace("quick", "quikc")
    texts = [BASE, near, "unrelated text entirely"]
    ds = rd.from_arrow(pa.table({
        "media_id": pa.array(np.arange(3, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    }))
    kw = dict(k=5, num_perm=64, bands=16, jaccard_threshold=0.5)
    reps = dedup_representatives(ds, "media_id", "text", output="pandas",
                                 groups_output="pandas", **kw)
    assert list(reps.columns) == ["dup_group", "rep_id", "rep_chars", "n_members"]
    assert len(reps) == 1 and reps.iloc[0]["n_members"] == 2
    surv = apply_dedup(ds, "media_id", "text", output="pandas",
                       groups_output="pandas", **kw)
    assert "media_id" in surv.columns and len(surv) == 2


def test_minhash_negative_ids_rejected(rd):
    from raylink.dedup import minhash_lsh_dedup

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([-1, 2], pa.int64()),
        "text": pa.array([BASE, BASE], pa.string()),
    }))
    with pytest.raises(Exception, match="non-negative"):
        minhash_lsh_dedup(ds, "doc_id", "text")


def test_minhash_gramless_corpus_no_crash(rd):
    """All texts shorter than k: sentinel signatures bucket together but
    verification must return no groups (empty shingle sets), not crash."""
    from raylink.dedup import minhash_lsh_dedup

    out = minhash_lsh_dedup(_docs(rd, ["ab", "cd", "ef"]), "doc_id", "text",
                            k=5, output="pandas")
    assert len(out) == 0


def test_union_find_deep_chain():
    from raylink.linkage import UnionFind

    uf = UnionFind()
    for k in range(4999, 0, -1):  # descending unions build a deep chain
        uf.union(k, k + 1)
    groups = uf.groups()
    assert len(groups) == 1
    (members,) = groups.values()
    assert len(members) == 5000


def test_minhash_collapse_exact_parity(rd):
    """collapse_exact=True (the r4 default: exact-dup collapse before
    banding) must be frame-identical to the uncollapsed pipeline when
    bucket caps don't bind — incl. exact dups (jaccard-1 groups), near
    dups across texts, gramless repeats (NEVER grouped: empty shingle
    sets don't verify), and singletons."""
    from raylink.dedup import minhash_lsh_dedup

    near = BASE.replace("quick", "quikc")
    texts = (
        [BASE] * 3                      # exact dups -> one group
        + [near]                        # near dup of BASE
        + ["unrelated text about other topics entirely"] * 2  # exact pair
        + ["zz"] * 3                    # gramless repeats: no group
        + ["single unique document with its own content here"]
    )
    ds = _docs(rd, texts).repartition(3)
    a = minhash_lsh_dedup(ds, "doc_id", "text", jaccard_threshold=0.5,
                          collapse_exact=True, output="pandas")
    b = minhash_lsh_dedup(ds, "doc_id", "text", jaccard_threshold=0.5,
                          collapse_exact=False, output="pandas")
    pd.testing.assert_frame_equal(
        a.sort_values(["dup_group", "doc_id"], ignore_index=True),
        b.sort_values(["dup_group", "doc_id"], ignore_index=True),
    )
    groups = a.groupby("dup_group")["doc_id"].apply(set).to_dict()
    assert {0, 1, 2, 3} in list(groups.values())   # BASE x3 + near
    assert {4, 5} in list(groups.values())         # exact pair
    assert all(d not in g for g in groups.values() for d in (6, 7, 8, 9))


def test_minhash_collapse_exact_dataset_output(rd):
    """Collapsed pipeline honors output='dataset' (distributed verify +
    components): same rows as the pandas path."""
    from raylink.dedup import minhash_lsh_dedup

    near = BASE.replace("quick", "quikc")
    texts = [BASE] * 2 + [near] + ["other words entirely here now ok"]
    ds = _docs(rd, texts).repartition(2)
    want = minhash_lsh_dedup(ds, "doc_id", "text", jaccard_threshold=0.5,
                             output="pandas")
    got = (
        minhash_lsh_dedup(
            ds, "doc_id", "text", jaccard_threshold=0.5,
            verification="distributed", components="distributed",
            output="dataset",
        )
        .to_pandas()
        .astype("int64")
        .sort_values(["dup_group", "doc_id"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(want, got)


def test_remove_duplicate_spans_matches_brute(rd):
    """Both modes == the Lee-et-al.-shaped pandas oracle: keeper = global
    min (doc, pos); overlapping flagged windows union coverage; fully
    covered docs drop; short docs pass through; empty docs drop."""
    from raylink.dedup import remove_duplicate_spans

    SPAN = "the quick brown fox jumps over the lazy dog tonight"
    texts = [
        "intro words here " + SPAN + " closing remark",
        "other doc starts " + SPAN + " and then differs wholly",
        SPAN,                       # fully covered -> drops
        "totally unrelated content with no duplicated span",
        "short doc",                # < window: passes (normalized)
        "",                         # empty -> drops
    ]
    ds = _docs(rd, texts).repartition(3)
    W = 5
    b = remove_duplicate_spans(ds, window=W, mode="broadcast",
                               output="pandas")
    d = remove_duplicate_spans(ds, window=W, mode="distributed",
                               output="pandas")
    pd.testing.assert_frame_equal(b, d)
    words = {i: t.split() for i, t in enumerate(texts)}
    census: dict = {}
    for i, ws in words.items():
        for p in range(len(ws) - W + 1):
            census.setdefault(" ".join(ws[p:p + W]), []).append((i, p))
    covered: dict = {i: set() for i in words}
    for occ in census.values():
        if len(occ) > 1:
            keeper = min(occ)
            for i, p in occ:
                if (i, p) != keeper:
                    covered[i].update(range(p, p + W))
    want = {
        i: " ".join(w for j, w in enumerate(ws) if j not in covered[i])
        for i, ws in words.items()
        if any(j not in covered[i] for j in range(len(ws)))
    }
    assert dict(zip(b.doc_id, b.text)) == want
    # byte-aware auto switch routes to distributed and stays identical
    auto = remove_duplicate_spans(ds, window=W, mode="auto",
                                  max_broadcast_bytes=1, output="pandas")
    pd.testing.assert_frame_equal(b, auto)


def test_remove_duplicate_spans_guards(rd):
    import pyarrow as pa

    from raylink.dedup import remove_duplicate_spans

    dup = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 1], pa.int64()),
        "text": pa.array(["a b c d e f", "a b c d e f"], pa.string()),
    }))
    with pytest.raises(Exception, match="duplicate"):
        remove_duplicate_spans(dup, window=3, output="pandas")
    neg = rd.from_arrow(pa.table({
        "doc_id": pa.array([-1], pa.int64()),
        "text": pa.array(["a b c d"], pa.string()),
    }))
    with pytest.raises(Exception, match="2\\^42|non-negative|\\[0,"):
        remove_duplicate_spans(neg, window=3, output="pandas")


def test_semantic_dedup_planted(rd):
    """SemDeDup compose: planted near-dups drop (min id per cluster
    survives), bases keep; survivors == all ids minus non-min cluster
    members computed from brute-force pairs + union-find."""
    from raylink.dedup import embedding_cosine_pairs, semantic_dedup
    from raylink.linkage import connected_components_labels

    ds = _planted_embeddings(rd, n=120, n_dups=15)
    surv = semantic_dedup(ds, "vec_id", "embedding", threshold=0.9,
                          output="pandas")
    pairs = embedding_cosine_pairs(ds, "vec_id", "embedding", threshold=0.9)
    labels = connected_components_labels(
        pairs["a"].to_numpy(), pairs["b"].to_numpy()
    )
    drops = {n for n, lbl in labels.items() if n != lbl}
    assert set(surv.vec_id) == set(range(135)) - drops
    assert len(drops) >= 14  # the planted dups actually dropped
    # embeddings ride along (the survivor rows keep the vector column)
    assert list(surv.columns) == ["vec_id", "embedding"]


def test_remove_duplicate_spans_dup_free_corpus(rd):
    """Empty duplicated-span census (a clean corpus) must not crash:
    broadcast's index_in ran against an EMPTY value set and the keeper
    fancy-index hit an empty array (r5 review — IndexError on the
    DEFAULT path for any corpus without duplicated spans)."""
    from raylink.dedup import remove_duplicate_spans

    texts = [
        "alpha beta gamma delta epsilon zeta",
        "one two three four five six seven",
    ]
    ds = _docs(rd, texts)
    for mode in ("broadcast", "distributed", "auto"):
        out = remove_duplicate_spans(ds, window=3, mode=mode,
                                     output="pandas")
        assert dict(zip(out.doc_id, out.text)) == dict(enumerate(texts))


def test_remove_duplicate_spans_cross_block_dup_ids(rd):
    """Duplicate ids split across blocks (each block individually clean)
    raise loudly at the census merge instead of silently interleaving the
    two docs' words in distributed mode / double-keeping in broadcast.
    Short (< window words) duplicates are caught too: the id-claim rows
    are emitted per INPUT row, not per window."""
    from raylink.dedup import remove_duplicate_spans

    t1 = pa.table({"doc_id": pa.array([7], pa.int64()),
                   "text": pa.array(["a b c d e"], pa.string())})
    t2 = pa.table({"doc_id": pa.array([7], pa.int64()),
                   "text": pa.array(["f g h i j"], pa.string())})
    with pytest.raises(Exception, match="across blocks"):
        remove_duplicate_spans(rd.from_arrow([t1, t2]), window=3,
                               output="pandas")
    s1 = pa.table({"doc_id": pa.array([3], pa.int64()),
                   "text": pa.array(["a b"], pa.string())})
    s2 = pa.table({"doc_id": pa.array([3], pa.int64()),
                   "text": pa.array(["c d"], pa.string())})
    with pytest.raises(Exception, match="across blocks"):
        remove_duplicate_spans(rd.from_arrow([s1, s2]), window=3,
                               output="pandas")


def test_remove_duplicate_spans_id_dtype_preserved(rd):
    """mode must not change the output id dtype: distributed reconstructs
    ids from the packed int64 word key and now casts back to the input
    type (int32 here), matching broadcast's filter of the original
    column."""
    from raylink.dedup import remove_duplicate_spans

    span = "w x y z q r"
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int32()),
        "text": pa.array([
            "lead in " + span + " tail words",
            "other start " + span + " different tail",
            "unique content entirely its own here",
        ], pa.string()),
    })
    ds = rd.from_arrow(t)
    b = remove_duplicate_spans(ds, window=4, mode="broadcast",
                               output="pandas")
    d = remove_duplicate_spans(ds, window=4, mode="distributed",
                               output="pandas")
    pd.testing.assert_frame_equal(b, d)
    assert str(b.doc_id.dtype) == "int32"


def test_fnv64_strings_matches_scalar_fold():
    """The vectorized segment hash == the per-byte scalar FNV fold
    (the _shingle_hashes polynomial), incl. empty strings (-> hash of
    0), an empty string at the very END of the buffer (the reduceat
    sentinel case), and large_string offsets."""
    from raylink.blocking import _hash64
    from raylink.dedup import _FNV64_P, _fnv64_strings

    def scalar(s: str) -> np.uint64:
        h = np.uint64(0)
        for b in s.encode():
            h = h * _FNV64_P + np.uint64(b)
        return _hash64(np.array([h.astype(np.int64)]))[0]

    vals = ["alpha", "", "beta gamma", "a", "alphb", "", "x" * 100, ""]
    for typ in (pa.string(), pa.large_string()):
        arr = pa.array(vals, type=typ)
        got = _fnv64_strings(arr)
        want = np.array([scalar(v) for v in vals], np.uint64)
        assert (got == want).all()
        # sliced arrays use the offset-aware buffer walk
        got_slice = _fnv64_strings(arr.slice(2, 4))
        assert (got_slice == want[2:6]).all()


def test_remove_duplicate_spans_census_parity(rd):
    """census='hash' (int census + string confirmation, the default) is
    bit-identical to census='string' (the direct one-pass string
    census), incl. a near-collision pair (windows differing in ONE
    inner word — a prefix/suffix hash would conflate them)."""
    from raylink.dedup import remove_duplicate_spans

    span = "the quick brown fox jumps over the lazy dog tonight"
    near = "the quick brown fox DANCES over the lazy dog tonight"
    texts = [
        "intro words " + span + " tail one",
        "other lead " + span + " tail two",
        "near miss " + near + " must not dedup",
        "plain unique content here",
        span,
        "",
    ]
    ds = _docs(rd, texts).repartition(3)
    for mode in ("broadcast", "distributed"):
        h = remove_duplicate_spans(ds, window=5, mode=mode,
                                   census="hash", output="pandas")
        s = remove_duplicate_spans(ds, window=5, mode=mode,
                                   census="string", output="pandas")
        pd.testing.assert_frame_equal(h, s)
    # every window CONTAINING the near-miss word is unique, so the word
    # itself survives (the shared suffix around it is legitimately
    # stripped — it duplicates the span docs' suffix windows)
    assert "DANCES" in " ".join(h.text)
    with pytest.raises(Exception, match="census"):
        remove_duplicate_spans(ds, window=5, census="bogus",
                               output="pandas")


def test_remove_duplicate_spans_hash_census_dup_ids(rd):
    """The cross-block duplicate-id rejection fires on the HASH census
    path too (the id-claim rows ride the int shuffle)."""
    from raylink.dedup import remove_duplicate_spans

    s1 = pa.table({"doc_id": pa.array([7], pa.int64()),
                   "text": pa.array(["a b c d e"], pa.string())})
    s2 = pa.table({"doc_id": pa.array([7], pa.int64()),
                   "text": pa.array(["f g h i j"], pa.string())})
    with pytest.raises(Exception, match="duplicate"):
        remove_duplicate_spans(rd.from_arrow([s1, s2]), window=3,
                               census="hash", output="pandas")


def test_collapse_exact_census_parity(rd):
    """_collapse_exact_texts census='hash' (unique texts bypass the
    shuffle entirely) == census='string' (the direct string census):
    reps AND doc_map, with planted exact dups across blocks, a within-
    block dup, null texts, empty-string dups, and an int32 id column."""
    from raylink.dedup import _collapse_exact_texts

    texts = [
        "alpha beta gamma", "delta unique one", "alpha beta gamma",
        None, "", "zeta unique two", "", "alpha beta gamma",
        "eta unique three", None, "theta twice", "theta twice",
    ]
    t = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int32)),
        "text": pa.array(texts, type=pa.string()),
    })
    ds = rd.from_arrow(t).repartition(4)

    def norm(reps_ds, map_ds):
        r = (reps_ds.to_pandas()
             .sort_values("doc_id", ignore_index=True))
        m = (map_ds.to_pandas()
             .sort_values("doc_id", ignore_index=True))
        return r, m

    rh, mh = norm(*_collapse_exact_texts(ds, "doc_id", "text", 2_000_000,
                                         census="hash"))
    rs, ms = norm(*_collapse_exact_texts(ds, "doc_id", "text", 2_000_000,
                                         census="string"))
    pd.testing.assert_frame_equal(rh, rs)
    pd.testing.assert_frame_equal(mh, ms)
    # spot semantics: reps are min-id with member counts; nulls excluded
    got = dict(zip(rh.text, rh.n_members))
    assert got["alpha beta gamma"] == 3 and got[""] == 2
    assert got["theta twice"] == 2 and got["delta unique one"] == 1
    assert len(mh) == len(texts) - 2  # null-text docs have no map row
    assert str(mh.doc_id.dtype) == "int32"
    # want_doc_map=False on both paths
    r2, none2 = _collapse_exact_texts(ds, "doc_id", "text", 2_000_000,
                                      census="hash", want_doc_map=False)
    assert none2 is None
    pd.testing.assert_frame_equal(
        r2.to_pandas().sort_values("doc_id", ignore_index=True), rh)


def test_collapse_exact_force_wide_consistent_schema(rd, monkeypatch):
    """When the driver-side census decides the string merge must widen to
    large_string, EVERY output block (merge reps, kind-0 direct reps, the
    doc-map join sides) must agree on the widened type — mixed
    string/large_string blocks break pa.concat_tables
    (promote_options='default') and the equi_join key kernel (round-5
    review finding). Forces the flag via a tiny widen bound (the flag is
    computed on the DRIVER, so the patch reaches it; workers' adaptive
    backstop stays unpatched) and pins value parity vs the default run
    plus concat-ability of the union output."""
    import ray

    import raylink.pipeline as rp
    from raylink.dedup import _collapse_exact_texts

    texts = [
        "alpha beta gamma", "delta unique one", "alpha beta gamma",
        None, "", "zeta unique two", "", "alpha beta gamma",
        "eta unique three", None, "theta twice", "theta twice",
    ]
    t = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int32)),
        "text": pa.array(texts, type=pa.string()),
    })
    ds = rd.from_arrow(t).repartition(4)

    def norm(reps_ds, map_ds):
        r = (reps_ds.to_pandas()
             .sort_values("doc_id", ignore_index=True))
        m = (map_ds.to_pandas()
             .sort_values("doc_id", ignore_index=True))
        return r, m

    base_r, base_m = norm(*_collapse_exact_texts(
        ds, "doc_id", "text", 2_000_000, census="hash"))

    monkeypatch.setattr(rp, "ARROW_STR_WIDEN_BOUND", 8)
    reps, dmap = _collapse_exact_texts(ds, "doc_id", "text", 2_000_000,
                                       census="hash")
    tabs = [t_ for t_ in ray.get(reps.to_arrow_refs()) if t_.num_rows]
    # the exact op the mixed schemas broke: concat with default promotion
    cat = pa.concat_tables(tabs, promote_options="default")
    assert all(pa.types.is_large_string(t_["text"].type) for t_ in tabs)
    wr, wm = norm(rd.from_arrow(cat), dmap)
    wr["text"] = wr["text"].astype(object)
    pd.testing.assert_frame_equal(wr, base_r)
    pd.testing.assert_frame_equal(wm, base_m)

    # fallback-to-string-census path (max_broadcast_bytes=0): the widen
    # decision comes from the materialized census partials' byte total —
    # narrow at this scale, and every block must AGREE on the narrow type
    monkeypatch.setattr(rp, "ARROW_STR_WIDEN_BOUND", 1_800_000_000)
    reps2, dmap2 = _collapse_exact_texts(ds, "doc_id", "text", 2_000_000,
                                         census="hash",
                                         max_broadcast_bytes=0)
    tabs2 = [t_ for t_ in ray.get(reps2.to_arrow_refs()) if t_.num_rows]
    assert all(pa.types.is_string(t_["text"].type) for t_ in tabs2)
    fr, fm = norm(reps2, dmap2)
    pd.testing.assert_frame_equal(fr, base_r)
    pd.testing.assert_frame_equal(fm, base_m)

    # ... and the same fallback under a tiny bound must widen EVERY
    # block (the string census's own driver decision), values unchanged
    monkeypatch.setattr(rp, "ARROW_STR_WIDEN_BOUND", 8)
    reps3, dmap3 = _collapse_exact_texts(ds, "doc_id", "text", 2_000_000,
                                         census="hash",
                                         max_broadcast_bytes=0)
    tabs3 = [t_ for t_ in ray.get(reps3.to_arrow_refs()) if t_.num_rows]
    assert all(pa.types.is_large_string(t_["text"].type) for t_ in tabs3)
    wr3, wm3 = norm(reps3, dmap3)
    wr3["text"] = wr3["text"].astype(object)
    pd.testing.assert_frame_equal(wr3, base_r)
    pd.testing.assert_frame_equal(wm3, base_m)

    # explicit census="string" under the tiny bound: same driver
    # decision (this path used to keep a PER-PARTITION adaptive widen —
    # the exact mixed-schema defect the driver decision exists to kill)
    repss, dmaps = _collapse_exact_texts(ds, "doc_id", "text", 2_000_000,
                                         census="string")
    tabss = [t_ for t_ in ray.get(repss.to_arrow_refs()) if t_.num_rows]
    assert all(pa.types.is_large_string(t_["text"].type) for t_ in tabss)
    sr, sm = norm(repss, dmaps)
    sr["text"] = sr["text"].astype(object)
    pd.testing.assert_frame_equal(sr, base_r)
    pd.testing.assert_frame_equal(sm, base_m)


def test_fnv64_strings_unicode_fuzz():
    """Hypothesis fuzz: the vectorized fold == the scalar per-byte fold
    over arbitrary unicode (UTF-8 bytes drive the hash), and distinct
    strings in a batch get distinct hashes (content sensitivity at
    fuzz sizes)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from raylink.blocking import _hash64
    from raylink.dedup import _FNV64_P, _fnv64_strings

    def scalar(s: str) -> np.uint64:
        h = np.uint64(0)
        with np.errstate(over="ignore"):
            for b in s.encode():
                h = h * _FNV64_P + np.uint64(b)
        return _hash64(np.array([h.astype(np.int64)]))[0]

    @settings(max_examples=50, deadline=None)
    @given(st.lists(st.text(max_size=40), min_size=1, max_size=20))
    def check(vals):
        got = _fnv64_strings(pa.array(vals, type=pa.string()))
        want = np.array([scalar(v) for v in vals], np.uint64)
        assert (got == want).all()
        # distinctness holds modulo the documented zero fixed point of
        # the h0=0 FNV family: LEADING NUL bytes are absorbed (h = 0*P+0
        # stays 0 until the first nonzero byte), so "" / "\x00" / "\x00a"
        # vs "a" share hashes by construction — hypothesis found
        # ['', '\x00']. The SQL replays share the fixed point (same
        # fold), and every census consumer confirms string-exact past the
        # hash, so this is a test-model fix, not a kernel bug.
        canon = {v.lstrip("\x00") for v in vals}
        assert len(np.unique(got)) == len(canon)

    check()


def test_hash_census_unicode_parity(rd):
    """Hash-census paths == string-census paths on non-ASCII corpora:
    the FNV fold runs over UTF-8 bytes while the string census compares
    codepoints — parity must hold for both collapse and span dedup."""
    from raylink.dedup import _collapse_exact_texts, remove_duplicate_spans

    span = "héllo wörld ünïcode προσοχή 日本語 emoji🙂 mixed"
    texts = [
        "prefix " + span + " suffixe à",
        "autre début " + span + " fin différente",
        span,
        "ñandú unique çontent",
        "héllo wörld",  # shorter than the window: passes through
        "",
    ]
    ds = _docs(rd, texts).repartition(3)
    for mode in ("broadcast", "distributed"):
        h = remove_duplicate_spans(ds, window=4, mode=mode,
                                   census="hash", output="pandas")
        s = remove_duplicate_spans(ds, window=4, mode=mode,
                                   census="string", output="pandas")
        pd.testing.assert_frame_equal(h, s)
    dup_texts = ["日本語テキスト", "ünïcode", "日本語テキスト", None, "ünïcode", "ñ"]
    t = pa.table({
        "doc_id": pa.array(np.arange(len(dup_texts), dtype=np.int64)),
        "text": pa.array(dup_texts, type=pa.string()),
    })
    cds = rd.from_arrow(t).repartition(3)
    rh, mh = _collapse_exact_texts(cds, "doc_id", "text", 2_000_000,
                                   census="hash")
    rs, ms = _collapse_exact_texts(cds, "doc_id", "text", 2_000_000,
                                   census="string")
    pd.testing.assert_frame_equal(
        rh.to_pandas().sort_values("doc_id", ignore_index=True),
        rs.to_pandas().sort_values("doc_id", ignore_index=True))
    pd.testing.assert_frame_equal(
        mh.to_pandas().sort_values("doc_id", ignore_index=True),
        ms.to_pandas().sort_values("doc_id", ignore_index=True))


def test_span_census_force_wide_consistent_schema(rd, monkeypatch):
    """remove_duplicate_spans' census width is a DRIVER decision on both
    census paths (hash confirmation pass and explicit census='string') —
    per-partition widening would mix block widths into the broadcast
    concat / join staging (round-5 review finding). Forces the flag via
    a tiny widen bound; pins value parity for broadcast, distributed,
    and census='string' against the unpatched run."""
    import raylink.pipeline as rp
    from raylink.dedup import remove_duplicate_spans

    texts = [
        "a b c d e f g h i j k l m n", "z y a b c d e f g h i j k l",
        "totally different words here now", "a b c d e f g h i j q r s",
    ]
    t = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    })
    ds = rd.from_arrow(t).repartition(2)
    W = 5
    base_b = remove_duplicate_spans(ds, window=W, mode="broadcast",
                                    output="pandas")
    base_d = remove_duplicate_spans(ds, window=W, mode="distributed",
                                    output="pandas")
    base_s = remove_duplicate_spans(ds, window=W, census="string",
                                    output="pandas")

    monkeypatch.setattr(rp, "ARROW_STR_WIDEN_BOUND", 8)
    pd.testing.assert_frame_equal(
        remove_duplicate_spans(ds, window=W, mode="broadcast",
                               output="pandas"), base_b)
    pd.testing.assert_frame_equal(
        remove_duplicate_spans(ds, window=W, mode="distributed",
                               output="pandas"), base_d)
    pd.testing.assert_frame_equal(
        remove_duplicate_spans(ds, window=W, census="string",
                               output="pandas"), base_s)


def test_minhash_shingle_byte_bound_reroutes_to_distributed(rd, monkeypatch):
    """verification='auto' must reroute to the distributed verifier when
    the candidate-doc shingle bytes exceed the driver bound (the pair-
    count rule alone is blind to document length — round-5 review
    finding), with identical groups; an explicit verification='driver'
    raises loudly instead."""
    import raylink.dedup as dd
    from raylink.dedup import minhash_lsh_dedup

    near = BASE.replace("quick", "quikc")
    texts = [BASE, near, "unrelated text about other topics entirely",
             BASE + " extra"]
    base = minhash_lsh_dedup(
        _docs(rd, texts), "doc_id", "text", jaccard_threshold=0.5,
        output="pandas",
    )
    monkeypatch.setattr(dd, "_DRIVER_SHINGLE_BYTES_MAX", 0)
    rerouted = minhash_lsh_dedup(
        _docs(rd, texts), "doc_id", "text", jaccard_threshold=0.5,
        output="pandas",
    )
    pd.testing.assert_frame_equal(
        rerouted.sort_values("doc_id", ignore_index=True),
        base.sort_values("doc_id", ignore_index=True),
    )
    with pytest.raises(ValueError, match="byte bound"):
        minhash_lsh_dedup(
            _docs(rd, texts), "doc_id", "text", jaccard_threshold=0.5,
            verification="driver", output="pandas",
        )


def test_semantic_dedup_dup_free_corpus(rd):
    """A corpus with NO near-dup pairs keeps every row on both output
    paths (empty edges -> typed-empty labels -> schema-less drop set ->
    anti semi-join keeps all; r5 close-out regression)."""
    import numpy as np
    import pyarrow as pa

    from raylink.dedup import semantic_dedup

    rng = np.random.default_rng(0)
    V = rng.normal(size=(40, 32)).astype(np.float64)
    tbl = pa.table({"vec_id": pa.array(np.arange(40, dtype=np.int64)),
                    "embedding": pa.array(list(V))})
    ds = rd.from_arrow(tbl).repartition(3)
    out = semantic_dedup(ds, "vec_id", "embedding", threshold=0.95,
                         output="pandas")
    assert len(out) == 40 and list(out.columns) == ["vec_id", "embedding"]
    out2 = semantic_dedup(ds, "vec_id", "embedding", threshold=0.95)
    assert out2.count() == 40


def test_dedup_family_dup_free_corpus(rd):
    """A corpus with NO near-dups must flow through every dedup surface
    on BOTH output modes (r5 close-out: empty groups lost their schema
    through the reps digest, zero-row to_pandas, and schema-less drop
    sets — typed empties everywhere now)."""
    import numpy as np
    import pyarrow as pa

    from raylink.dedup import (
        apply_dedup,
        dedup_representatives,
        incremental_minhash_dedup,
        minhash_lsh_dedup,
    )

    texts = [
        f"completely unique document number {i} with distinct words "
        f"w{i}a w{i}b w{i}c w{i}d w{i}e w{i}f"
        for i in range(30)
    ]
    tbl = pa.table({"doc_id": pa.array(np.arange(30, dtype=np.int64)),
                    "text": pa.array(texts)})
    ds = rd.from_arrow(tbl).repartition(3)
    assert minhash_lsh_dedup(ds, "doc_id", "text").count() == 0
    assert apply_dedup(ds, "doc_id", "text").count() == 30
    reps = dedup_representatives(ds, "doc_id", "text")
    assert reps.count() == 0
    surv_pd = apply_dedup(ds, "doc_id", "text", output="pandas",
                          groups_output="pandas")
    assert sorted(surv_pd.doc_id) == list(range(30))
    reps_pd = dedup_representatives(ds, "doc_id", "text", output="pandas",
                                    groups_output="pandas")
    assert len(reps_pd) == 0
    assert list(reps_pd.columns) == ["dup_group", "rep_id", "rep_chars",
                                     "n_members"]
    delta = rd.from_arrow(pa.table(
        {"doc_id": pa.array([100], pa.int64()),
         "text": pa.array(["another fully unique delta doc xyz abc def"])}))
    inc = incremental_minhash_dedup(ds, delta, "doc_id", "text")
    n = len(inc) if hasattr(inc, "columns") else inc.count()
    assert n == 1  # the unique delta doc survives


def test_dedup_representatives_score_keeper(rd):
    """score_col keeper: highest int score wins (tie -> smallest id),
    value column renamed rep_score; apply_dedup keeps the best-quality
    member; float/null scores reject loudly."""
    import numpy as np
    import pyarrow as pa

    from raylink.dedup import apply_dedup, dedup_representatives

    # 3 near-dup clusters of 3 (same text => same shingles) + 2 uniques
    texts, ids, scores = [], [], []
    words = ["alpha beta gamma delta epsilon zeta eta theta",
             "monday tuesday wednesday thursday friday saturday sunday",
             "red orange yellow green blue indigo violet magenta"]
    for c in range(3):
        base = f"shared {words[c]} repeated content"
        for m in range(3):
            texts.append(base)
            ids.append(c * 10 + m)
            scores.append([5, 9, 9][m] if c == 0 else [7, 3, 1][m])
    texts += ["unique doc one aaa bbb ccc ddd eee fff",
              "unique doc two ggg hhh iii jjj kkk lll"]
    ids += [90, 91]
    scores += [2, 4]
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts),
                    "q": pa.array(scores, pa.int64())})
    ds = rd.from_arrow(tbl).repartition(3)
    reps = dedup_representatives(ds, "doc_id", "text", score_col="q",
                                 output="pandas", groups_output="pandas")
    assert list(reps.columns) == ["dup_group", "rep_id", "rep_score",
                                  "n_members"]
    by_group = {int(r.dup_group): (int(r.rep_id), int(r.rep_score))
                for r in reps.itertuples()}
    # cluster 0: scores 5,9,9 at ids 0,1,2 -> tie broken to id 1
    assert by_group[0] == (1, 9)
    # cluster 1/2: max score 7 at the first member
    assert by_group[10] == (10, 7) and by_group[20] == (20, 7)
    # forced shuffle path value-identical
    forced = dedup_representatives(ds, "doc_id", "text", score_col="q",
                                   output="pandas", groups_output="pandas",
                                   driver_merge_max_rows=0)
    import pandas as pd
    pd.testing.assert_frame_equal(reps, forced)
    # survivors = uniques + best-quality reps
    surv = apply_dedup(ds, "doc_id", "text", score_col="q",
                       output="pandas", groups_output="pandas")
    assert sorted(surv.doc_id) == [1, 10, 20, 90, 91]
    # loud rejections
    bad_float = rd.from_arrow(pa.table(
        {"doc_id": pa.array([0, 1], pa.int64()),
         "text": pa.array([texts[0], texts[0]]),
         "q": pa.array([1.0, 2.0])}))
    with pytest.raises(Exception, match="must be integer"):
        dedup_representatives(bad_float, "doc_id", "text", score_col="q",
                              output="pandas", groups_output="pandas")
    bad_null = rd.from_arrow(pa.table(
        {"doc_id": pa.array([0, 1], pa.int64()),
         "text": pa.array([texts[0], texts[0]]),
         "q": pa.array([1, None], pa.int64())}))
    with pytest.raises(Exception, match="nulls"):
        dedup_representatives(bad_null, "doc_id", "text", score_col="q",
                              output="pandas", groups_output="pandas")


# ---------------------------------------------------------------------------
# winnowing fingerprints
# ---------------------------------------------------------------------------


def _ref_winnow(h, w):
    """Pure-python winnowing over one doc's position-ordered hashes: full
    windows (min, rightmost tie) for runs >= w, whole-run rightmost min
    for shorter runs. Returns the distinct selected hash set."""
    m = len(h)
    if m == 0:
        return set()
    sel = set()
    if m < w:
        mn = min(h)
        sel.add(max(i for i in range(m) if h[i] == mn))
    else:
        for j in range(w - 1, m):
            win = h[j - w + 1 : j + 1]
            mn = min(win)
            sel.add(j - w + 1 + max(i for i in range(w) if win[i] == mn))
    return {int(h[i]) for i in sel}


def test_winnow_select_matches_pure_python_reference():
    from raylink.dedup import _positional_shingle_hashes, _winnow_select

    rng = np.random.default_rng(7)
    texts = [
        "".join(rng.choice(list("ab c"), int(rng.integers(0, 60))))
        for _ in range(150)
    ]
    # ties (all-equal hashes), short runs, empty docs, boundary lengths
    texts += ["aaaaaaaaaaaaaaaa", "a" * 7, "", "abc", "a" * 9]
    k, w = 8, 4
    d, h = _positional_shingle_hashes(pa.array(texts), k)
    sd, fp = _winnow_select(d, h, w)
    got = {}
    for dd, ff in zip(sd, fp):
        got.setdefault(int(dd), set()).add(int(np.uint64(ff)))
    for di in range(len(texts)):
        want = _ref_winnow(list(h[d == di]), w)
        assert got.get(di, set()) == want, texts[di]


def test_winnow_overlap_coverage_guarantee(rd):
    # any shared substring of >= k + w - 1 cleaned chars must share a
    # fingerprint (the winnowing coverage bound)
    from raylink.dedup import winnow_overlap_pairs

    shared = "zqxjkvwpyg bmfdl cnrt hsau eoiz qxjkvwpygb"  # 42 chars
    texts = [
        "first document unique preamble " + shared + " unique first tail",
        "second one starts differently " + shared + " and ends its own way",
        "third document with no overlap at all in any window of text here",
    ]
    out = winnow_overlap_pairs(
        _docs(rd, texts), "doc_id", "text", k=8, window=4, min_shared=1,
        output="pandas",
    )
    assert (0, 1) in set(zip(out["a"], out["b"]))
    assert not any(2 in p for p in zip(out["a"], out["b"]))


def test_winnow_dataset_pandas_and_distributed_agg_parity(rd):
    from raylink.dedup import winnow_fingerprints, winnow_overlap_pairs

    rng = np.random.default_rng(11)
    pool = list("abcdefgh ")
    texts = ["".join(rng.choice(pool, 80)) for _ in range(40)]
    # plant overlaps
    texts[5] = texts[3][:50] + " tail five"
    texts[9] = texts[3][:50] + " other tail"
    ds = _docs(rd, texts)
    fps_pd = winnow_fingerprints(ds, "doc_id", "text", k=8, window=4,
                                 output="pandas")
    fps_ds = winnow_fingerprints(ds, "doc_id", "text", k=8, window=4).to_pandas()
    fps_ds = fps_ds.sort_values(["doc_id", "fp"], ignore_index=True)
    pd.testing.assert_frame_equal(fps_pd, fps_ds)

    base = winnow_overlap_pairs(ds, "doc_id", "text", k=8, window=4,
                                min_shared=2, output="pandas")
    # force the distributed pair aggregation (driver bound 0)
    forced = winnow_overlap_pairs(ds, "doc_id", "text", k=8, window=4,
                                  min_shared=2, driver_agg_max_rows=0,
                                  output="pandas")
    pd.testing.assert_frame_equal(base, forced)
    as_ds = winnow_overlap_pairs(ds, "doc_id", "text", k=8, window=4,
                                 min_shared=2).to_pandas()
    as_ds = as_ds.sort_values(["a", "b"], ignore_index=True)
    pd.testing.assert_frame_equal(base, as_ds)
    assert len(base) >= 1


def test_winnow_rejections_and_empty(rd):
    from raylink.dedup import winnow_fingerprints, winnow_overlap_pairs

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 1], type=pa.int64()),
            "text": pa.array([BASE, BASE]),
        }
    )
    with pytest.raises(Exception, match="duplicate"):
        winnow_fingerprints(rd.from_arrow(tbl), "doc_id", "text",
                            output="pandas")
    nulls = pa.table(
        {
            "doc_id": pa.array([1, None], type=pa.int64()),
            "text": pa.array([BASE, BASE]),
        }
    )
    with pytest.raises(Exception, match="null"):
        winnow_fingerprints(rd.from_arrow(nulls), "doc_id", "text",
                            output="pandas")
    neg = pa.table(
        {
            "doc_id": pa.array([-1], type=pa.int64()),
            "text": pa.array([BASE]),
        }
    )
    with pytest.raises(Exception, match="non-negative"):
        winnow_fingerprints(rd.from_arrow(neg), "doc_id", "text",
                            output="pandas")
    with pytest.raises(ValueError):
        winnow_fingerprints(_docs(rd, [BASE]), "doc_id", "text", window=0)
    # no-overlap corpus -> typed empty pairs, both output modes
    texts = ["alpha beta gamma delta epsilon", "zeta eta theta iota kappa"]
    out = winnow_overlap_pairs(_docs(rd, texts), "doc_id", "text",
                               k=12, window=6, min_shared=1, output="pandas")
    assert list(out.columns) == ["a", "b", "n_shared"] and len(out) == 0
    out_ds = winnow_overlap_pairs(_docs(rd, texts), "doc_id", "text",
                                  k=12, window=6, min_shared=1)
    pdf = out_ds.to_pandas()
    assert len(pdf) == 0


def test_winnow_fully_empty_input(rd):
    from raylink.dedup import winnow_fingerprints, winnow_overlap_pairs

    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
    )
    ds = rd.from_arrow(empty)
    fps = winnow_fingerprints(ds, "doc_id", "text", output="pandas")
    assert list(fps.columns) == ["doc_id", "fp"] and len(fps) == 0
    pairs = winnow_overlap_pairs(ds, "doc_id", "text", output="pandas")
    assert list(pairs.columns) == ["a", "b", "n_shared"] and len(pairs) == 0


def test_winnow_id_col_name_guard(rd):
    from raylink.dedup import winnow_fingerprints

    t = pa.table(
        {"fp": pa.array([1], pa.int64()), "text": pa.array([BASE])}
    )
    with pytest.raises(ValueError, match="collides"):
        winnow_fingerprints(rd.from_arrow(t), "fp", "text")
