"""group_topk / group_quantiles / heavy_hitters vs pandas oracles."""

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


def _frame(n=3000, nkeys=40, seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "k": rng.integers(0, nkeys, n).astype(np.int64),
            # coarse grid forces value ties within keys
            "v": rng.integers(0, 50, n).astype(np.int64),
            "i": np.arange(n, dtype=np.int64),
        }
    )


@pytest.mark.parametrize("descending", [True, False])
def test_group_topk_matches_pandas(rd, descending):
    from raylink.aggs import group_topk

    df = _frame()
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(6)
    got = group_topk(ds, "k", "v", "i", k=3, descending=descending,
                     output="pandas")
    ranked = df.sort_values(
        ["k", "v", "i"], ascending=[True, not descending, True]
    )
    ranked["rank"] = ranked.groupby("k").cumcount() + 1
    want = (
        ranked[ranked["rank"] <= 3][["k", "rank", "i", "v"]]
        .sort_values(["k", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want)


def test_group_topk_k_exceeds_group_size(rd):
    from raylink.aggs import group_topk

    df = pd.DataFrame(
        {"k": [1, 1, 2], "v": [5, 9, 4], "i": [10, 11, 12]}
    ).astype(np.int64)
    ds = rd.from_arrow(pa.Table.from_pandas(df))
    got = group_topk(ds, "k", "v", "i", k=5, output="pandas")
    assert list(map(tuple, got.to_numpy())) == [
        (1, 1, 11, 9),
        (1, 2, 10, 5),
        (2, 1, 12, 4),
    ]


def _q_disc(s, q_num, q_den):
    vals = np.sort(np.asarray(s))
    target = (q_num * len(vals) + q_den - 1) // q_den
    return vals[target - 1]


def test_group_quantiles_exact(rd):
    from raylink.aggs import group_quantiles

    df = _frame(n=5000, nkeys=12, seed=19)
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(7)
    got = group_quantiles(ds, "k", "v", output="pandas")
    rows = []
    for k, grp in df.groupby("k"):
        rows.append(
            {
                "k": k,
                "n": len(grp),
                "p50": _q_disc(grp["v"], 1, 2),
                "p90": _q_disc(grp["v"], 9, 10),
                "p99": _q_disc(grp["v"], 99, 100),
            }
        )
    want = pd.DataFrame(rows).astype(np.int64).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want)


def test_group_quantiles_single_row_groups(rd):
    from raylink.aggs import group_quantiles

    df = pd.DataFrame({"k": [3, 8], "v": [42, 7]}).astype(np.int64)
    ds = rd.from_arrow(pa.Table.from_pandas(df))
    got = group_quantiles(ds, "k", "v", output="pandas")
    assert list(map(tuple, got.to_numpy())) == [
        (3, 1, 42, 42, 42),
        (8, 1, 7, 7, 7),
    ]


def test_heavy_hitters_exact_top_n_with_ties(rd):
    from raylink.aggs import heavy_hitters

    # keys 0..9 with counts 10, 20, ..., 100 plus a tie pair
    ks = np.repeat(np.arange(10, dtype=np.int64), np.arange(1, 11) * 10)
    ks = np.concatenate([ks, np.full(100, 20, dtype=np.int64)])
    import ray.data

    ds = ray.data.from_arrow(pa.table({"k": pa.array(ks)})).repartition(5)
    got = heavy_hitters(ds, "k", top_n=4)
    # counts: key 9 -> 100, key 20 -> 100 (tie: smaller key first),
    # key 8 -> 90, key 7 -> 80
    assert list(map(tuple, got.to_numpy())) == [
        (1, 9, 100),
        (2, 20, 100),
        (3, 8, 90),
        (4, 7, 80),
    ]


def test_group_ndistinct_matches_pandas(rd):
    from raylink.aggs import group_ndistinct

    df = _frame(n=4000, nkeys=25, seed=3)
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(6)
    got = group_ndistinct(ds, "k", "v", output="pandas")
    want = (
        df.groupby("k")["v"].nunique().rename("ndv").reset_index()
        .astype(np.int64)
    )
    pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want)


def test_label_centroids_exact_milli_means(rd):
    from raylink.aggs import label_centroids

    rng = np.random.default_rng(11)
    n, d = 600, 8
    lab = rng.integers(0, 5, n).astype(np.int64)
    mat = rng.normal(size=(n, d)).astype(np.float32)
    emb = pa.FixedSizeListArray.from_arrays(
        pa.array(mat.reshape(-1)), d
    )
    tbl = pa.table({"label": pa.array(lab), "embedding": emb})
    got = label_centroids(
        rd.from_arrow(tbl).repartition(5), "label", "embedding",
        output="pandas",
    )
    q = np.rint(mat.astype(np.float64) * 1000).astype(np.int64)
    rows = []
    for lb in np.unique(lab):
        sel = q[lab == lb]
        mean = sel.sum(axis=0) / (1000.0 * len(sel))
        for dim in range(d):
            rows.append((lb, dim, len(sel), mean[dim]))
    want = pd.DataFrame(rows, columns=["label", "dim", "n", "mean_val"])
    want = want.astype({"label": np.int64, "dim": np.int64, "n": np.int64})
    pd.testing.assert_frame_equal(got, want)
    # exactness: partitioning must not change a single bit
    got2 = label_centroids(
        rd.from_arrow(tbl).repartition(2), "label", "embedding",
        output="pandas",
    )
    assert (got["mean_val"].to_numpy() == got2["mean_val"].to_numpy()).all()


def test_heavy_hitters_weighted(rd):
    from raylink.aggs import heavy_hitters

    df = pd.DataFrame(
        {
            "k": np.array([1, 1, 2, 2, 3], dtype=np.int64),
            "w": np.array([10, 5, 40, 1, 30], dtype=np.int64),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(3)
    got = heavy_hitters(ds, "k", top_n=2, count_col="tot", weight_col="w")
    assert list(map(tuple, got.to_numpy())) == [(1, 2, 41), (2, 3, 30)]


def test_profile_table_counts_nulls_ndv(rd):
    from raylink.profile import profile_table

    tbl = pa.table(
        {
            "a": pa.array([1, 2, 2, None, 5], pa.int64()),
            "s": pa.array(["x", None, "x", "y", None]),
        }
    )
    got = profile_table(rd.from_arrow(tbl).repartition(3), ("a", "s"))
    assert list(map(tuple, got.to_numpy())) == [
        ("a", 5, 1, 3),
        ("s", 5, 2, 2),
    ]


def test_heavy_hitters_driver_and_groupby_paths_identical(rd):
    from raylink.aggs import heavy_hitters

    rng = np.random.default_rng(47)
    ks = rng.integers(0, 50, 5000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"k": pa.array(ks)})).repartition(6)
    fast = heavy_hitters(ds, "k", top_n=10)
    slow = heavy_hitters(ds, "k", top_n=10, driver_merge_max_rows=0)
    pd.testing.assert_frame_equal(fast, slow.astype(fast.dtypes.to_dict()))


def test_profile_table_driver_and_groupby_paths_identical(rd):
    from raylink.profile import profile_table

    rng = np.random.default_rng(53)
    tbl = pa.table(
        {
            "a": pa.array(rng.integers(0, 100, 2000), pa.int64()),
            "s": pa.array([f"s{v}" for v in rng.integers(0, 37, 2000)]),
        }
    )
    ds = rd.from_arrow(tbl).repartition(5)
    fast = profile_table(ds, ("a", "s"))
    slow = profile_table(ds, ("a", "s"), driver_merge_max_rows=0)
    pd.testing.assert_frame_equal(fast, slow)
    # byte-aware forced reroute (distinct values are unbounded strings —
    # the row bound alone could collect gigabytes) and explicit n_parts
    by_bytes = profile_table(ds, ("a", "s"), max_driver_merge_bytes=0)
    pd.testing.assert_frame_equal(fast, by_bytes)
    pinned = profile_table(ds, ("a", "s"), n_parts=3, driver_merge_max_rows=0)
    pd.testing.assert_frame_equal(fast, pinned)


def test_digest_ops_driver_and_shuffle_paths_identical(rd):
    from raylink.aggs import (
        group_ndistinct,
        group_quantiles,
        group_topk,
        label_centroids,
    )

    df = _frame(n=2500, nkeys=20, seed=61)
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(5)
    for op, kw in [
        (group_topk, dict(val_col="v", id_col="i", k=3)),
        (group_quantiles, dict(val_col="v")),
        (group_ndistinct, dict(val_col="v")),
    ]:
        a = op(ds, "k", output="pandas", **kw)
        b = op(ds, "k", output="pandas", driver_merge_max_rows=0, **kw)
        pd.testing.assert_frame_equal(a, b)
    rng = np.random.default_rng(67)
    mat = rng.normal(size=(300, 4)).astype(np.float32)
    lab = rng.integers(0, 3, 300).astype(np.int64)
    tbl = pa.table(
        {
            "label": pa.array(lab),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1)), 4
            ),
        }
    )
    eds = rd.from_arrow(tbl).repartition(3)
    a = label_centroids(eds, "label", "embedding", output="pandas")
    b = label_centroids(
        eds, "label", "embedding", output="pandas", driver_merge_max_rows=0
    )
    pd.testing.assert_frame_equal(a, b)


def test_vocabulary_matches_pandas(rd):
    from raylink.textstats import vocabulary

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab, rng.integers(0, 12)))
        for _ in range(400)
    ]
    df = pd.DataFrame({"doc_id": np.arange(400, dtype=np.int64),
                       "text": texts})
    words = df.assign(w=df.text.str.split()).explode("w").dropna(subset=["w"])
    agg = words.groupby("w").agg(
        n_occurrences=("w", "size"), n_docs=("doc_id", "nunique")
    ).reset_index().rename(columns={"w": "token"})
    want = (
        agg[agg.n_occurrences >= 4]
        .sort_values("token")
        .reset_index(drop=True)
        .astype({"n_occurrences": np.int64, "n_docs": np.int64})
    )
    for parts in (1, 7):
        ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(parts)
        got = vocabulary(ds, min_count=4, output="pandas")
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # forced distributed (groupby) merge path is value-identical
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(5)
    got = vocabulary(ds, min_count=4, output="pandas",
                     driver_merge_max_rows=0)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_group_count_string_keys(rd):
    from raylink.aggs import group_count

    t = pa.table(
        {
            "s": pa.array(["a", "a", "b", "b", "b", "c"]),
            "l": pa.array(["x", "x", "x", "y", "y", "x"]),
        }
    )
    want = pd.DataFrame(
        {"s": ["a", "b", "b", "c"], "l": ["x", "x", "y", "x"],
         "n_rows": [2, 1, 2, 1]}
    )
    for parts in (1, 3):
        ds = rd.from_arrow(t).repartition(parts)
        got = group_count(ds, ("s", "l"), output="pandas")
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # forced distributed merge identical
    ds = rd.from_arrow(t).repartition(3)
    got = group_count(ds, ("s", "l"), output="pandas",
                      driver_merge_max_rows=0)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # separator collision is rejected loudly
    bad = rd.from_arrow(pa.table({"s": pa.array(["a\x1fb"]),
                                  "l": pa.array(["x"])}))
    with pytest.raises(Exception):
        group_count(bad, ("s", "l"), output="pandas")


def test_group_count_null_key_rejected(rd):
    from raylink.aggs import group_count

    t = pa.table({"s": pa.array(["a", None]), "l": pa.array(["x", "y"])})
    ds = rd.from_arrow(t)
    with pytest.raises(Exception, match="null"):
        group_count(ds, ("s", "l"), output="pandas")


def test_group_quantiles_degenerate_spec_rejected(rd):
    """q_num=0 (or q_num>q_den, or q_den<=0) has no crossing row and
    would scatter garbage from an uninitialized buffer — reject loudly
    (ADVICE r3)."""
    from raylink.aggs import group_quantiles

    t = pa.table({"k": pa.array([1, 1, 2], pa.int64()),
                  "v": pa.array([5, 7, 9], pa.int64())})
    ds = rd.from_arrow(t)
    for bad in ((0, 2, "p0"), (3, 2, "p150"), (1, 0, "pdiv0")):
        with pytest.raises(ValueError, match="group_quantiles"):
            group_quantiles(ds, "k", "v", qs=(bad,), output="pandas")
    # the valid edge q_num == q_den (max) still works
    out = group_quantiles(ds, "k", "v", qs=((1, 1, "pmax"),),
                          output="pandas")
    assert list(out["pmax"]) == [7, 9]


def test_paragraph_counts_matches_pandas(rd):
    from raylink.textstats import paragraph_counts

    rng = np.random.default_rng(13)
    pool = ["alpha beta", "common line", "", "tail note", "solo"]
    texts = [
        "\n".join(rng.choice(pool, rng.integers(1, 5)))
        for _ in range(300)
    ] + [None]
    df = pd.DataFrame({"doc_id": np.arange(301, dtype=np.int64),
                       "text": texts})
    ex = df.assign(p=df.text.fillna("").str.split("\n")).explode("p")
    want = (
        ex.groupby("p")
        .agg(n_occurrences=("p", "size"), n_docs=("doc_id", "nunique"))
        .reset_index()
        .rename(columns={"p": "paragraph"})
        .sort_values("paragraph")
        .reset_index(drop=True)
        .astype({"n_occurrences": np.int64, "n_docs": np.int64})
    )
    for parts in (1, 6):
        ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(parts)
        got = paragraph_counts(ds, output="pandas")
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # forced distributed merge path
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(4)
    got = paragraph_counts(ds, output="pandas", driver_merge_max_rows=0)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_remove_boilerplate_modes_and_semantics(rd):
    from raylink.textstats import remove_boilerplate

    rng = np.random.default_rng(7)
    common = ["Here is what I found.", "Thanks!", ""]
    rare = [f"insight {i}" for i in range(200)]
    texts = []
    for _ in range(250):
        n = rng.integers(1, 6)
        texts.append("\n".join(
            common[rng.integers(0, 3)] if rng.random() < 0.5
            else rare[rng.integers(0, 200)]
            for _ in range(n)
        ))
    texts.append("Thanks!\nHere is what I found.")  # all boilerplate
    texts.append(None)  # null text -> one empty paragraph
    df = pd.DataFrame({"doc_id": np.arange(252, dtype=np.int64),
                       "text": texts})

    # pandas reference with the same semantics
    ex = df.assign(p=df.text.fillna("").str.split("\n")).explode("p")
    ex["ord"] = ex.groupby("doc_id").cumcount()
    freq = set(
        ex.groupby("p")["doc_id"].nunique().pipe(lambda s: s[s > 3]).index
    )
    kept = ex[~ex.p.isin(freq)]
    want = (
        kept.sort_values(["doc_id", "ord"])
        .groupby("doc_id")["p"]
        .agg("\n".join)
        .reset_index()
        .rename(columns={"p": "text"})
        .reset_index(drop=True)
    )
    assert len(want) < 252  # the all-boilerplate doc must drop

    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(5)
    got_b = remove_boilerplate(ds, max_docs=3, mode="broadcast",
                               output="pandas")
    got_d = remove_boilerplate(ds, max_docs=3, mode="distributed",
                               output="pandas")
    pd.testing.assert_frame_equal(got_b, want, check_dtype=False)
    pd.testing.assert_frame_equal(got_d, want, check_dtype=False)


def test_bpe_pair_counts_matches_brute(rd):
    from raylink.textstats import bpe_pair_counts

    rng = np.random.default_rng(2)
    vocab = ["low", "lower", "newest", "widest", "spark", "data", "a", ""]
    texts = [
        " ".join(rng.choice(vocab, rng.integers(0, 9))) for _ in range(300)
    ]
    df = pd.DataFrame({"doc_id": np.arange(300, dtype=np.int64),
                       "text": texts})
    rows = []
    for t in texts:
        for w in t.split():
            for i in range(len(w) - 1):
                rows.append((w[i], w[i + 1]))
    bf = (
        pd.DataFrame(rows, columns=["left", "right"])
        .groupby(["left", "right"]).size().reset_index(name="n_occurrences")
    )
    bf = (
        bf[bf.n_occurrences >= 3]
        .sort_values(["left", "right"])
        .reset_index(drop=True)
    )
    for parts in (1, 5):
        ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(parts)
        got = bpe_pair_counts(ds, min_count=3, output="pandas")
        pd.testing.assert_frame_equal(got, bf, check_dtype=False)
    # forced distributed merge path
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(4)
    got = bpe_pair_counts(ds, min_count=3, output="pandas",
                          driver_merge_max_rows=0)
    pd.testing.assert_frame_equal(got, bf, check_dtype=False)


def test_bpe_learn_reference(rd):
    """The merge loop on the distributed word-type census must reproduce
    the classic sequential BPE trace (Sennrich-style reference run on
    the same corpus, deterministic lexicographic tie-break)."""
    from raylink.textstats import bpe_learn

    texts = ["low low low lower lower newest newest newest newest",
             "widest widest newest newest low"]
    df = pd.DataFrame({"doc_id": np.arange(2, dtype=np.int64),
                       "text": texts})

    # reference implementation on word types
    words = {}
    for t in texts:
        for w in t.split():
            words[w] = words.get(w, 0) + 1
    syms = {tuple(w): c for w, c in words.items()}
    ref = []
    for rank in range(4):
        pairs = {}
        for s, c in syms.items():
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] = pairs.get((s[i], s[i + 1]), 0) + c
        bn = max(pairs.values())
        bp = sorted(p for p, v in pairs.items() if v == bn)[0]
        ref.append((rank, bp[0], bp[1], bn))
        joined = bp[0] + bp[1]
        new = {}
        for s, c in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == bp:
                    out.append(joined); i += 2
                else:
                    out.append(s[i]); i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + c
        syms = new

    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(2)
    got = bpe_learn(ds, n_merges=4, min_count=1)
    want = pd.DataFrame(ref, columns=["rank", "left", "right",
                                      "n_occurrences"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_rarity_score_modes_identical(rd):
    from raylink.textstats import rarity_score

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(15)]
    texts = [
        " ".join(rng.choice(vocab, rng.integers(0, 10)))
        for _ in range(200)
    ] + ["", "  ", None]  # gramless docs must zero-fill in BOTH modes
    df = pd.DataFrame({"doc_id": np.arange(203, dtype=np.int64),
                       "text": texts})
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(5)
    b = rarity_score(ds, ngram=2, mode="broadcast", output="pandas")
    d = rarity_score(ds, ngram=2, mode="distributed", output="pandas")
    pd.testing.assert_frame_equal(b, d)
    assert len(b) == 203
    # gramless rows present and zero
    z = b[b.doc_id >= 200]
    assert (z.n_distinct_grams == 0).all() and (z.commonness == 0.0).all()
    # pandas brute force on one doc
    grams = {}
    def doc_grams(t):
        w = (t or "").split()
        return set(" ".join(w[i:i+2]) for i in range(len(w)-1))
    for t in texts:
        for g in doc_grams(t):
            grams[g] = grams.get(g, 0) + 1
    for _, row in b.head(20).iterrows():
        gs = doc_grams(texts[int(row.doc_id)])
        assert row.n_distinct_grams == len(gs)
        assert row.df_sum == sum(grams[g] for g in gs)


def test_rarity_score_rejects_duplicate_ids(rd):
    import pytest

    from raylink.textstats import rarity_score

    df = pd.DataFrame({"doc_id": np.array([7, 7], dtype=np.int64),
                       "text": ["a b c", "a b c"]})
    ds = rd.from_arrow(pa.Table.from_pandas(df))
    for mode in ("broadcast", "distributed"):
        # the ValueError surfaces wrapped in RayTaskError from the worker
        with pytest.raises(Exception, match="duplicate"):
            rarity_score(ds, ngram=2, mode=mode, output="pandas")


def test_rarity_score_large_string_text(rd):
    """large_string text (the widening machinery's output type) must flow
    through the gram kernel (separator class fix) in both modes."""
    from raylink.textstats import rarity_score

    t = pa.table({
        "doc_id": pa.array(np.arange(6, dtype=np.int64)),
        "text": pa.array(
            ["a b c", "b c d", "a b c", "", "x y", "a b"],
            type=pa.large_string(),
        ),
    })
    ds = rd.from_arrow(t).repartition(2)
    b = rarity_score(ds, ngram=2, mode="broadcast", output="pandas")
    d = rarity_score(ds, ngram=2, mode="distributed", output="pandas")
    pd.testing.assert_frame_equal(b, d)
    assert len(b) == 6


def test_rarity_score_rejects_cross_batch_duplicate_ids(rd):
    """Duplicate ids SPLIT ACROSS blocks evade the per-batch check; the
    distributed mode's per-id batch-count digest must catch them loudly
    (ADVICE r4: the silent divergence was broadcast emitting two rows
    while the distributed digest merge summed them into one)."""
    import pytest

    from raylink.textstats import rarity_score

    t1 = pa.table({"doc_id": pa.array([7], pa.int64()),
                   "text": pa.array(["a b c"], pa.string())})
    t2 = pa.table({"doc_id": pa.array([7], pa.int64()),
                   "text": pa.array(["c d e"], pa.string())})
    ds = rd.from_arrow(t1).union(rd.from_arrow(t2))
    with pytest.raises(Exception, match="duplicate"):
        rarity_score(ds, ngram=2, mode="distributed", output="pandas")


def test_remove_boilerplate_rejects_duplicate_ids(rd):
    """Duplicate ids are rejected loudly in BOTH modes (same-batch) and
    in the distributed reassembly for cross-batch splits (ord clash) —
    ADVICE r4 medium: the modes previously diverged silently (broadcast
    two rows vs distributed one interleaved row)."""
    import pytest

    from raylink.textstats import remove_boilerplate

    t = pa.table({"doc_id": pa.array([1, 1], pa.int64()),
                  "text": pa.array(["a\nb", "c\nd"], pa.string())})
    ds_same = rd.from_arrow(t)
    for mode in ("broadcast", "distributed"):
        with pytest.raises(Exception, match="duplicate|clashing"):
            remove_boilerplate(ds_same, max_docs=3, mode=mode,
                               output="pandas")
    # cross-batch split: per-batch checks pass, the reassembly must raise
    t1, t2 = t.slice(0, 1), t.slice(1, 1)
    ds_split = rd.from_arrow(t1).union(rd.from_arrow(t2))
    with pytest.raises(Exception, match="clashing"):
        remove_boilerplate(ds_split, max_docs=3, mode="distributed",
                           output="pandas")


def test_byte_aware_broadcast_switch(rd):
    """mode='auto' with a tiny byte bound must route to distributed (and
    stay value-identical) even when the row bound allows broadcast —
    ADVICE r4: rows alone can't bound a collect of unbounded-length
    strings."""
    from raylink.dedup import contamination_check
    from raylink.textstats import rarity_score, remove_boilerplate

    texts = ["a b c d", "b c d e", "common line\nrare one",
             "common line\nrare two", "common line\nrare three"]
    t = pa.table({"doc_id": pa.array(np.arange(5, dtype=np.int64)),
                  "text": pa.array(texts, pa.string())})
    ds = rd.from_arrow(t).repartition(2)

    r_dist = rarity_score(ds, ngram=2, mode="auto", max_broadcast_bytes=1,
                          output="pandas")
    r_base = rarity_score(ds, ngram=2, mode="broadcast", output="pandas")
    pd.testing.assert_frame_equal(r_dist, r_base)

    b_dist = remove_boilerplate(ds, max_docs=1, mode="auto",
                                max_broadcast_bytes=1, output="pandas")
    b_base = remove_boilerplate(ds, max_docs=1, mode="broadcast",
                                output="pandas")
    pd.testing.assert_frame_equal(b_dist, b_base, check_dtype=False)

    ev = rd.from_arrow(t.slice(0, 1))
    c_dist = contamination_check(ds, ev, "doc_id", "text", ngram=2,
                                 mode="auto", max_broadcast_bytes=1,
                                 output="pandas")
    c_base = contamination_check(ds, ev, "doc_id", "text", ngram=2,
                                 mode="broadcast", output="pandas")
    pd.testing.assert_frame_equal(c_dist, c_base)


def test_bpe_encode_matches_brute(rd):
    """bpe_encode (actor-pool apply side) == per-word sequential
    rank-pass brute force, incl. empty/null/whitespace rows."""
    from raylink.textstats import _bpe_apply_word, bpe_encode, bpe_learn

    rng = np.random.default_rng(3)
    vocab = ["low", "lower", "newest", "widest", "lowest", "abab", "aab"]
    texts = [
        " ".join(rng.choice(vocab, rng.integers(0, 9))) for _ in range(150)
    ] + ["", None, "   "]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    })).repartition(4)
    merges = bpe_learn(ds, n_merges=12, min_count=2)
    assert len(merges) == 12
    out = bpe_encode(ds, merges, output="pandas")
    pairs = list(zip(merges["left"], merges["right"]))
    for i, t in enumerate(texts):
        ws = [w for w in (t or "").split() if w]
        nt = sum(
            len(_bpe_apply_word(w, range(len(pairs)), pairs)) for w in ws
        )
        row = out[out.doc_id == i].iloc[0]
        assert (row.n_tokens, row.n_words) == (nt, len(ws)), (i, t)


def test_bpe_encode_emit_tokens_and_keep_cols(rd):
    from raylink.textstats import bpe_encode, bpe_learn

    texts = ["low lower low", "newest", ""]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(3, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en", "en", "de"], pa.string()),
    }))
    merges = bpe_learn(ds, n_merges=4, min_count=2)
    out = bpe_encode(ds, merges, emit_tokens=True, keep_cols=("lang",),
                     output="pandas")
    assert list(out.columns) == ["doc_id", "n_tokens", "n_words", "lang",
                                 "tokens"]
    assert all(len(t) == n for t, n in zip(out.tokens, out.n_tokens))
    # tokens concatenate back to the words in order
    r0 = out[out.doc_id == 0].iloc[0]
    assert "".join(r0.tokens) == "lowlowerlow"
    assert out[out.doc_id == 2].iloc[0].n_tokens == 0
    import pytest

    with pytest.raises(ValueError, match="collide"):
        bpe_encode(ds, merges, keep_cols=("n_tokens",))
    with pytest.raises(ValueError, match="ranks"):
        bpe_encode(ds, merges.assign(rank=merges["rank"] + 1))


def test_bpe_fixture_matches_bpe_learn(rd):
    """The plain-pyarrow oracle fixture generator trains BIT-IDENTICAL
    merges to the distributed bpe_learn census path (shared
    _bpe_merge_loop) — the pinning guarantee behind the bpe_encode and
    training_mix oracles."""
    import pyarrow.parquet as pq

    from raylink.queries import (
        BPE_FIXTURE_MERGES,
        BPE_FIXTURE_MIN_COUNT,
        ensure_bpe_merges_fixture,
    )
    from raylink.textstats import bpe_learn

    sf = "/root/testdata/sf0.001"
    fixture = pq.read_table(ensure_bpe_merges_fixture(sf)).to_pandas()
    ds = rd.read_parquet(f"{sf}/documents.parquet", columns=["text"])
    learned = bpe_learn(
        ds, n_merges=BPE_FIXTURE_MERGES, min_count=BPE_FIXTURE_MIN_COUNT
    )
    pd.testing.assert_frame_equal(fixture, learned)


def test_packing_token_col(rd):
    """token_col routes precomputed counts through take_token_budget and
    pack_sequences (the real-tokenizer path) — whitespace counting must
    not run."""
    from raylink.packing import pack_sequences, take_token_budget

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(5, dtype=np.int64)),
        "text": pa.array(["a b", "c", "d e f", "", "g h"], pa.string()),
        "nt": pa.array([10, 3, 7, 0, 5], pa.int64()),
    })).repartition(2)
    got = take_token_budget(ds, "doc_id", "text", budget=20,
                            token_col="nt", output="pandas")
    # cum by doc_id: 10, 13, 20 (doc 2 fits exactly), doc 3 adds 0 -> 20
    assert got.doc_id.tolist() == [0, 1, 2, 3]
    assert got.n_tokens.tolist() == [10, 3, 7, 0]
    assert got.cum_tokens.tolist() == [10, 13, 20, 20]
    packed = pack_sequences(ds, "doc_id", "text", budget=8,
                            token_col="nt", output="pandas")
    assert packed.n_tokens.tolist() == [10, 3, 7, 0, 5]
    assert packed.first_seq.tolist() == [0, 1, 1, 2, 2]
    # doc 0 spans tokens 0..9 -> seqs 0..1; doc 4 tokens 20..24 -> seq 2..3
    assert packed.last_seq.tolist() == [1, 1, 2, 2, 3]
    assert packed.offset_in_first.tolist() == [0, 2, 5, 4, 4]


def test_cross_batch_id_guard_tolerates_split_blocks(rd):
    """The cross-batch duplicate-id detector must count DOC MARKER rows,
    not batches-per-id: Ray dynamically splits oversized output blocks at
    arbitrary row boundaries, so one doc's exploded gram rows can land in
    two batches — a false 'duplicate id' for valid input (r5 review).
    Simulated here by hand-splitting one doc's exploded rows."""
    import pytest

    from raylink.dedup import _doc_distinct_grams
    from raylink.textstats import _assert_unique_ids_cross_batch

    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array(["a b c d e f"], pa.string())})
    ex = _doc_distinct_grams(t, "doc_id", "text", 2)
    assert ex["dmk"].to_pylist().count(1) == 1  # one marker per doc
    split = rd.from_arrow([ex.slice(0, 2), ex.slice(2)])
    _assert_unique_ids_cross_batch(split, "doc_id", 1000)  # no raise
    # two DOCS claiming the same id in different blocks still raise
    t2 = pa.table({"doc_id": pa.array([1], pa.int64()),
                   "text": pa.array(["x y z w v"], pa.string())})
    e2 = _doc_distinct_grams(t2, "doc_id", "text", 2)
    with pytest.raises(Exception, match="duplicate"):
        _assert_unique_ids_cross_batch(rd.from_arrow([ex, e2]),
                                       "doc_id", 1000)


def test_token_budget_rejects_token_col_in_keep_cols(rd):
    import pytest

    from raylink.packing import take_token_budget

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["a b"], pa.string()),
        "nt": pa.array([2], pa.int64()),
    }))
    with pytest.raises(ValueError, match="keep_cols"):
        take_token_budget(ds, "doc_id", "text", budget=5,
                          token_col="nt", keep_cols=("nt",),
                          output="pandas")


def test_paragraph_merge_factory_matches_counts(rd):
    """paragraph_counts exact census semantics: occurrence and
    distinct-doc counts over multi-block inputs with empty paragraphs
    and a null text."""
    from raylink.textstats import paragraph_counts

    texts = ["a\nb\na", "b\nc", None, "a", "\nb"]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    out = paragraph_counts(
        rd.from_arrow(pa.Table.from_pandas(df)).repartition(3),
        output="pandas",
    )
    got = {r.paragraph: (r.n_occurrences, r.n_docs)
           for r in out.itertuples()}
    # null text -> one empty paragraph; "\nb" -> ["", "b"]
    assert got["a"] == (3, 2) and got["b"] == (3, 3)
    assert got["c"] == (1, 1) and got[""] == (2, 2)


def test_paragraph_census_force_wide_consistent_schema(rd, monkeypatch):
    """The paragraph census's large_string decision is made ONCE on the
    driver (materialized-partials byte total) — a per-partition adaptive
    widen would mix string/large_string census blocks, which
    pa.concat_tables(promote_options='default') and the anti semi-join
    staging refuse (round-5 review finding; same policy as the collapse
    census). Forces the flag via a tiny widen bound and pins (a) every
    census block agreeing on large_string, (b) value parity for
    paragraph_counts AND both remove_boilerplate modes."""
    import ray

    import raylink.pipeline as rp
    from raylink.textstats import paragraph_counts, remove_boilerplate

    texts = [
        "common para\nunique one\ncommon para", "common para\nunique two",
        "solo text here", "common para\ncommon para\nunique three",
        None, "", "unique four\ncommon para",
    ]
    t = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    })
    ds = rd.from_arrow(t).repartition(3)

    base_pc = paragraph_counts(ds, output="pandas")
    base_b = remove_boilerplate(ds, mode="broadcast", output="pandas")
    base_d = remove_boilerplate(ds, mode="distributed", output="pandas")

    monkeypatch.setattr(rp, "ARROW_STR_WIDEN_BOUND", 8)
    wide_counts = paragraph_counts(ds)
    tabs = [t_ for t_ in ray.get(wide_counts.to_arrow_refs()) if t_.num_rows]
    assert tabs and all(
        pa.types.is_large_string(t_["paragraph"].type) for t_ in tabs
    )
    wide_pc = paragraph_counts(ds, output="pandas")
    pd.testing.assert_frame_equal(wide_pc, base_pc)
    pd.testing.assert_frame_equal(
        remove_boilerplate(ds, mode="broadcast", output="pandas"), base_b)
    pd.testing.assert_frame_equal(
        remove_boilerplate(ds, mode="distributed", output="pandas"), base_d)


def test_bpe_encoder_chunked_prefilter_parity(rd):
    """The rank-chunked match_substring prefilter (bounded live matrix,
    review finding: a full R x U bool matrix OOMs a 30k-rank vocab on an
    80k-type batch) must produce byte-identical encodings to the
    one-chunk path. Forces multi-chunk by shrinking the per-chunk byte
    budget to 1 (chunk = 16 ranks) against a 60-rank merge table."""
    import ray

    from raylink.textstats import BPEEncoder, bpe_learn

    texts = [
        "the quick brown foxes jumped over the lazy dogs repeatedly",
        "the lazy dogs sleep while quick foxes jump over fences",
        "tokenization merges frequent adjacent symbol pairs repeatedly",
    ] * 10
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    }))
    merges = bpe_learn(ds, n_merges=60, min_count=1)
    assert len(merges) >= 40  # enough ranks for several 16-rank chunks
    m = (merges.to_pandas() if isinstance(merges, pa.Table)
         else merges).sort_values("rank")
    pairs = list(zip(m["left"], m["right"]))
    ref = ray.put(pairs)

    batch = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    })
    one = BPEEncoder(ref, "doc_id", "text", emit_tokens=True)
    out_one = one(batch)
    many = BPEEncoder(ref, "doc_id", "text", emit_tokens=True)
    many._rank_chunk_bytes = 1  # chunk floor = 16 ranks -> 4 chunks
    out_many = many(batch)
    assert out_one.equals(out_many)
    assert one.memo == many.memo


def _sketch_frame(seed=29):
    """Keys with planted distinct counts: key i has (i+1)*1500 distinct
    values plus duplicates."""
    rng = np.random.default_rng(seed)
    ks, vs, truth = [], [], {}
    for i in range(4):
        nd = (i + 1) * 1500
        vals = np.arange(nd, dtype=np.int64) + i * 10_000_000
        draw = np.concatenate([vals, vals[rng.integers(0, nd, nd * 2)]])
        ks.append(np.full(len(draw), i, np.int64))
        vs.append(draw)
        truth[i] = nd
    ka, va = np.concatenate(ks), np.concatenate(vs)
    perm = rng.permutation(len(ka))
    return pa.table({"k": pa.array(ka[perm]), "v": pa.array(va[perm])}), truth


def test_approx_ndistinct_sketch_accuracy(rd):
    """KMV within ~4 sigma of 1/sqrt(k-2); HLL (linear-counting regime at
    these cardinalities) within ~5x its 1.04/sqrt(m) stderr; a key with
    fewer than k distinct values is EXACT under KMV."""
    from raylink.aggs import approx_ndistinct_hll, approx_ndistinct_kmv

    tbl, truth = _sketch_frame()
    ds = rd.from_arrow(tbl).repartition(7)
    kmv = approx_ndistinct_kmv(ds, "k", "v", k=256, output="pandas")
    hll = approx_ndistinct_hll(ds, "k", "v", p=12, output="pandas")
    for df, bound in ((kmv, 0.25), (hll, 0.08)):
        assert list(df["k"]) == sorted(truth)
        for _, row in df.iterrows():
            t = truth[row["k"]]
            assert abs(row["ndv_approx"] - t) / t <= bound, (row, t)
    # exact branch: 80 distinct values < k=256
    small = pa.table(
        {
            "k": pa.array(np.zeros(240, np.int64)),
            "v": pa.array(np.arange(80, dtype=np.int64).repeat(3)),
        }
    )
    sds = rd.from_arrow(small).repartition(3)
    out = approx_ndistinct_kmv(sds, "k", "v", k=256, output="pandas")
    assert out["ndv_approx"].tolist() == [80]


def test_approx_ndistinct_hll_raw_branch(rd):
    """Above 2.5*m (p=12 -> 10240) the raw HLL integer estimator runs
    (no linear counting); accuracy stays inside ~5x stderr."""
    from raylink.aggs import approx_ndistinct_hll

    nd = 40_000
    tbl = pa.table(
        {
            "k": pa.array(np.zeros(nd, np.int64)),
            "v": pa.array(np.arange(nd, dtype=np.int64)),
        }
    )
    ds = rd.from_arrow(tbl).repartition(5)
    out = approx_ndistinct_hll(ds, "k", "v", p=12, output="pandas")
    est = out["ndv_approx"].iloc[0]
    assert abs(est - nd) / nd <= 0.08, est


def test_approx_ndistinct_driver_and_shuffle_paths_identical(rd):
    from raylink.aggs import approx_ndistinct_hll, approx_ndistinct_kmv

    tbl, _ = _sketch_frame(seed=31)
    ds = rd.from_arrow(tbl).repartition(6)
    for op, kw in [
        (approx_ndistinct_kmv, dict(k=64)),
        (approx_ndistinct_hll, dict(p=12)),
    ]:
        a = op(ds, "k", "v", output="pandas", **kw)
        b = op(ds, "k", "v", output="pandas", driver_merge_max_rows=0, **kw)
        pd.testing.assert_frame_equal(a, b)


def test_approx_ndistinct_rejects_nulls_and_bad_params(rd):
    from raylink.aggs import approx_ndistinct_hll, approx_ndistinct_kmv

    withnull = pa.table(
        {
            "k": pa.array([1, 2], pa.int64()),
            "v": pa.array([1, None], pa.int64()),
        }
    )
    ds = rd.from_arrow(withnull)
    with pytest.raises(Exception, match="null"):
        approx_ndistinct_kmv(ds, "k", "v", output="pandas")
    with pytest.raises(Exception, match="null"):
        approx_ndistinct_hll(ds, "k", "v", output="pandas")
    with pytest.raises(ValueError, match="k must be"):
        approx_ndistinct_kmv(ds, "k", "v", k=1)
    with pytest.raises(ValueError, match="p must be"):
        approx_ndistinct_hll(ds, "k", "v", p=8)


def _ctk_frame(seed=3, n=4000):
    """Domains with a planted huge doc per key: at the highest priority it
    exercises the boundary-row digest logic (everything after it must
    drop), at the lowest it is a plain tail row."""
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "dom": rng.choice(["a", "b", "web", "code"], n),
            "id": np.arange(n, dtype=np.int64),
            "prio": rng.integers(0, 1000, n).astype(np.int64),
            "nt": rng.integers(0, 40, n).astype(np.int64),
        }
    )
    for i, k in enumerate(["a", "web"]):
        df.loc[df.index[i], ["dom", "prio", "nt"]] = [k, 2000, 10_000]
    df["text"] = [" ".join(["w"] * t) for t in df["nt"]]
    return df


def _ctk_brute(df, budget_fn, desc):
    out = []
    for k, g in df.groupby("dom"):
        g = g.sort_values(["prio", "id"], ascending=[not desc, True])
        cum = g["nt"].cumsum()
        kept = g[cum <= budget_fn(k)].copy()
        kept["cum_tokens"] = cum[cum <= budget_fn(k)]
        out.append(kept)
    r = pd.concat(out)
    r = r.rename(columns={"nt": "n_tokens"})
    return (
        r[["dom", "id", "n_tokens", "cum_tokens"]]
        .sort_values(["dom", "id"])
        .reset_index(drop=True)
        .astype({"cum_tokens": "int64"})
    )


@pytest.mark.parametrize("descending", [False, True])
def test_cap_tokens_per_key_matches_brute(rd, descending):
    """Mapping budgets + default, whitespace vs precomputed token counts,
    boundary-row soundness (the planted huge doc at top priority under
    descending order must zero out its key's tail across blocks)."""
    from raylink.packing import cap_tokens_per_key

    df = _ctk_frame()
    bud = {"a": 300, "web": 900, "code": 0}
    want = _ctk_brute(df, lambda k: bud.get(k, 500), descending)
    ds = rd.from_arrow(
        pa.Table.from_pandas(
            df[["dom", "id", "prio", "text", "nt"]], preserve_index=False
        )
    ).repartition(9)
    for tc in (None, "nt"):
        got = cap_tokens_per_key(
            ds, "dom", "id", "text", bud,
            order_col="prio", descending=descending, token_col=tc,
            default_budget=500, output="pandas",
        ).astype({"cum_tokens": "int64"})
        pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


def test_cap_tokens_per_key_paths_scalar_and_validation(rd):
    from raylink.packing import cap_tokens_per_key

    df = _ctk_frame(seed=11)
    ds = rd.from_arrow(
        pa.Table.from_pandas(
            df[["dom", "id", "prio", "text"]], preserve_index=False
        )
    ).repartition(7)
    # scalar budget, id order (no order_col), driver vs forced shuffle
    a = cap_tokens_per_key(ds, "dom", "id", "text", 250, output="pandas")
    b = cap_tokens_per_key(
        ds, "dom", "id", "text", 250, output="pandas",
        driver_merge_max_rows=0,
    )
    pd.testing.assert_frame_equal(a, b)
    want = _ctk_brute(
        df.assign(prio=df["id"]), lambda k: 250, False
    )
    pd.testing.assert_frame_equal(
        a.astype({"cum_tokens": "int64"}), want.astype(
            a.astype({"cum_tokens": "int64"}).dtypes.to_dict()
        )
    )
    with pytest.raises(ValueError, match="negative"):
        cap_tokens_per_key(ds, "dom", "id", "text", -1)
    with pytest.raises(ValueError, match="negative"):
        cap_tokens_per_key(ds, "dom", "id", "text", {"a": -2})
    with pytest.raises(ValueError, match="collide"):
        cap_tokens_per_key(ds, "dom", "nt", "text", 10)


def test_cap_tokens_per_key_rejects_duplicate_key_id(rd):
    from raylink.packing import cap_tokens_per_key

    t = pa.table(
        {
            "dom": pa.array(["a", "a", "b"]),
            "id": pa.array([1, 1, 2], pa.int64()),
            "text": pa.array(["x y", "z", "w"]),
        }
    )
    with pytest.raises(Exception, match="duplicate"):
        cap_tokens_per_key(
            rd.from_arrow(t), "dom", "id", "text", 100, output="pandas"
        )


def test_approx_ndistinct_string_values(rd):
    """String value columns hash through the full-content FNV64 census
    family: KMV under k distinct stays exact (up to ~2^-64 collisions),
    HLL's linear-counting estimate lands on the planted cardinality."""
    from raylink.aggs import approx_ndistinct_hll, approx_ndistinct_kmv

    rng = np.random.default_rng(41)
    urls = np.array([f"https://example.com/p/{i}" for i in range(700)])
    draw = urls[rng.integers(0, 700, 5000)]
    t = pa.table(
        {
            "k": pa.array(np.zeros(5000, np.int64)),
            "v": pa.array(draw, pa.string()),
        }
    )
    ds = rd.from_arrow(t).repartition(6)
    seen = len(np.unique(draw))
    kmv = approx_ndistinct_kmv(ds, "k", "v", k=1024, output="pandas")
    assert kmv["ndv_approx"].tolist() == [seen]
    hll = approx_ndistinct_hll(ds, "k", "v", p=12, output="pandas")
    est = hll["ndv_approx"].iloc[0]
    assert abs(est - seen) / seen <= 0.08, (est, seen)
    # floats reject loudly
    bad = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1], pa.int64()),
                "v": pa.array([1.5], pa.float64()),
            }
        )
    )
    with pytest.raises(Exception, match="int64 or string"):
        approx_ndistinct_kmv(bad, "k", "v", output="pandas")


def test_approx_quantiles_log_guarantee_and_paths(rd):
    """Every reported quantile is the crossing bucket's lower bound:
    rep <= true percentile value < rep * (1 + 2^-sub_bits); exact below
    2^(sub_bits+1). Driver and forced-shuffle paths identical; negative
    values and bad sub_bits reject loudly."""
    from raylink.aggs import approx_quantiles_log

    rng = np.random.default_rng(5)
    n = 60_000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 8, n).astype(np.int64),
            "v": rng.lognormal(8, 2, n).astype(np.int64),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(7)
    out = approx_quantiles_log(ds, "k", "v", sub_bits=4, output="pandas")
    assert len(out) == 8
    for _, r in out.iterrows():
        g = np.sort(df[df.k == r["k"]]["v"].to_numpy())
        for q, lbl in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            true = g[int(np.ceil(q * len(g))) - 1]
            assert r[lbl] <= true < max(r[lbl], 1) * (1 + 2**-4) + 1, (
                r["k"], lbl, r[lbl], true,
            )
    b = approx_quantiles_log(
        ds, "k", "v", output="pandas", driver_merge_max_rows=0
    )
    pd.testing.assert_frame_equal(out, b)
    neg = rd.from_arrow(
        pa.table(
            {"k": pa.array([1], pa.int64()), "v": pa.array([-1], pa.int64())}
        )
    )
    with pytest.raises(Exception, match="negative"):
        approx_quantiles_log(neg, "k", "v", output="pandas")
    with pytest.raises(ValueError, match="sub_bits"):
        approx_quantiles_log(ds, "k", "v", sub_bits=0)


def test_log_bucket_kernels_exact():
    """bit_length exact across the float53 boundary; bucket/rep
    roundtrip; rep is each bucket's floor."""
    from raylink.aggs import _bit_length_u64, _log_bucket_ids, _log_bucket_rep

    v = np.array(
        [0, 1, 2, 3, 31, 32, 2**52, 2**53 - 1, 2**53, 2**60 - 1, 2**63 - 1],
        np.int64,
    )
    assert _bit_length_u64(v).tolist() == [
        int(x).bit_length() for x in v
    ]
    for s in (1, 4, 8):
        ids = _log_bucket_ids(v, s)
        reps = _log_bucket_rep(ids, s)
        assert (_log_bucket_ids(reps, s) == ids).all()
        assert (reps <= v).all()


def test_approx_ndistinct_hll_high_p_no_overflow(rd):
    """p=14/16 raw-branch estimates (review finding: a fixed 2^50 scale
    overflowed the int64 register-term sum from p=14 when most registers
    are populated; the scale is now 62-p, worst-case sum 2^61)."""
    from raylink.aggs import approx_ndistinct_hll

    for p, nd in ((14, 150_000), (16, 450_000)):
        tbl = pa.table(
            {
                "k": pa.array(np.zeros(nd, np.int64)),
                "v": pa.array(np.arange(nd, dtype=np.int64)),
            }
        )
        ds = rd.from_arrow(tbl).repartition(4)
        out = approx_ndistinct_hll(ds, "k", "v", p=p, output="pandas")
        est = out["ndv_approx"].iloc[0]
        assert abs(est - nd) / nd <= 0.05, (p, est, nd)


def test_cap_tokens_per_key_guards(rd):
    """Review findings: duplicate (key,id) with DIFFERENT order values
    must still reject (the priority sort separates the copies); an
    explicit n_parts=0 must raise, not silently collapse the shuffle;
    float values in approx_quantiles_log reject."""
    from raylink.aggs import approx_quantiles_log
    from raylink.packing import cap_tokens_per_key

    t = pa.table(
        {
            "dom": pa.array(["a", "a", "a"]),
            "id": pa.array([7, 3, 7], pa.int64()),
            "prio": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["x", "y z", "w"]),
        }
    )
    with pytest.raises(Exception, match="duplicate"):
        cap_tokens_per_key(
            rd.from_arrow(t), "dom", "id", "text", 100,
            order_col="prio", output="pandas",
        )
    ok = pa.table(
        {
            "dom": pa.array(["a"]),
            "id": pa.array([1], pa.int64()),
            "text": pa.array(["x"]),
        }
    )
    with pytest.raises(ValueError, match="n_parts"):
        cap_tokens_per_key(
            rd.from_arrow(ok), "dom", "id", "text", 100, n_parts=0
        )
    fl = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1], pa.int64()),
                "v": pa.array([2.7], pa.float64()),
            }
        )
    )
    with pytest.raises(Exception, match="integer"):
        approx_quantiles_log(fl, "k", "v", output="pandas")


def test_token_mix_quota_budgets(rd):
    """token_mix == cap_tokens_per_key with the largest-remainder quota
    budgets; unlisted keys excluded (budget 0)."""
    import pyarrow as pa

    from raylink.packing import cap_tokens_per_key, token_mix
    from raylink.sampling import _mix_quotas

    rng = np.random.default_rng(5)
    langs = rng.choice(["en", "de", "zh"], 200)
    texts = [" ".join(f"t{j}" for j in range(rng.integers(1, 9))) for _ in range(200)]
    tbl = pa.table(
        {
            "lang": pa.array(langs),
            "doc_id": pa.array(np.arange(200, dtype=np.int64)),
            "text": pa.array(texts),
        }
    )
    ds = rd.from_arrow(tbl).repartition(3)
    weights = {"en": 3, "de": 1}
    got = token_mix(ds, "lang", "doc_id", "text", 100, weights,
                    output="pandas")
    names, q = _mix_quotas(100, weights)
    want = cap_tokens_per_key(
        ds, "lang", "doc_id", "text",
        budget=dict(zip(names, q.tolist())), default_budget=0,
        output="pandas",
    )
    pd.testing.assert_frame_equal(got, want)
    assert not (got["lang"] == "zh").any()
    # per-key kept totals respect the quotas (whole-doc prefix <= quota)
    per = got.groupby("lang")["n_tokens"].sum().to_dict()
    qmap = dict(zip(names, q.tolist()))
    for k, tot in per.items():
        assert tot <= qmap[k]
    # review finding: an unlisted key's ZERO-TOKEN doc must not leak
    # through a budget-0 pass-through (the quota-join SQL excludes it) —
    # unlisted keys are filtered BEFORE the digest
    tbl2 = pa.table(
        {
            "lang": pa.array(["zh", "en", "en"]),
            "doc_id": pa.array(np.array([0, 1, 2], np.int64)),
            "text": pa.array(["", "a b", "c"]),
        }
    )
    got2 = token_mix(rd.from_arrow(tbl2), "lang", "doc_id", "text", 10,
                     {"en": 1}, output="pandas")
    assert not (got2["lang"] == "zh").any() and len(got2) == 2
    import pytest

    with pytest.raises(ValueError, match="total_tokens"):
        token_mix(ds, "lang", "doc_id", "text", 0, weights)
    # type-mismatched weights vs key column raise loudly (index_in would
    # silently cross-match int64 columns against string keys)
    tbl3 = pa.table(
        {
            "lang": pa.array(np.array([0, 1], np.int64)),
            "doc_id": pa.array(np.array([0, 1], np.int64)),
            "text": pa.array(["a", "b"]),
        }
    )
    with pytest.raises(Exception, match="does not match the weight"):
        token_mix(rd.from_arrow(tbl3), "lang", "doc_id", "text", 10,
                  {"0": 1}, output="pandas")


def test_frequent_items_guarantee_and_types(rd):
    """frequent_items == exactly the values with count*k > N (pigeonhole
    candidates + exact recount); int and string values; bounded digest
    is what distinguishes it from heavy_hitters."""
    import pyarrow as pa
    import pytest

    from raylink.aggs import frequent_items

    rng = np.random.default_rng(3)
    v = np.where(
        rng.random(20000) < 0.4, 7,
        np.where(rng.random(20000) < 0.25, 3, rng.integers(0, 1000, 20000)),
    ).astype(np.int64)
    ds = rd.from_arrow(pa.table({"v": pa.array(v)})).repartition(7)
    for k in (2, 5, 20):
        got = frequent_items(ds, "v", k)
        vc = pd.Series(v).value_counts()
        want = sorted(int(x) for x in vc.index[vc.values * k > len(v)])
        assert sorted(got["v"].tolist()) == want
        assert (got["n_rows"].to_numpy() == vc.loc[got["v"]].to_numpy()).all()
        # output provably < k rows
        assert len(got) < k
    # deterministic ordering: count desc, value asc — exercised on a
    # PLANTED multi-row result with an exact count tie (review finding:
    # the k=5 result is a single row, so asserting on it was vacuous)
    tie = np.concatenate([
        np.full(50, 9), np.full(30, 4), np.full(30, 2), np.arange(100, 110),
    ]).astype(np.int64)
    gt = frequent_items(
        rd.from_arrow(pa.table({"v": pa.array(tie)})).repartition(3), "v", 6
    )
    # N=120, N//6=20: 9 (50) then the 30/30 tie broken value-ascending
    assert gt["v"].tolist() == [9, 2, 4]
    assert gt["n_rows"].tolist() == [50, 30, 30]
    # staging-name and huge-k guards (overflow-free comparisons)
    with pytest.raises(ValueError, match="staging"):
        frequent_items(
            rd.from_arrow(pa.table({"cnt": pa.array([1, 1], pa.int64())})),
            "cnt", 2,
        )
    gk = frequent_items(ds, "v", 1 << 62)  # every value qualifies, no wrap
    assert len(gk) == pd.Series(v).nunique()
    with pytest.raises(Exception, match="signed integer"):
        frequent_items(
            rd.from_arrow(pa.table({"v": pa.array([1, 2], pa.uint64())})),
            "v", 2,
        )
    # string values
    s = np.where(
        rng.random(5000) < 0.3, "en",
        rng.choice([f"l{i}" for i in range(50)], 5000),
    )
    dss = rd.from_arrow(pa.table({"lang": pa.array(s)})).repartition(4)
    got = frequent_items(dss, "lang", 5)
    vc = pd.Series(s).value_counts()
    assert sorted(got["lang"].tolist()) == sorted(
        x for x in vc.index if vc[x] * 5 > len(s)
    )
    # k=1 can never qualify (count > N impossible); empty input
    assert len(frequent_items(ds, "v", 1)) == 0
    assert len(frequent_items(
        rd.from_arrow(pa.table({"v": pa.array([], pa.int64())})), "v", 3
    )) == 0
    # guards
    with pytest.raises(ValueError, match="k must be"):
        frequent_items(ds, "v", 0)
    with pytest.raises(Exception, match="null"):
        frequent_items(
            rd.from_arrow(pa.table({"v": pa.array([1, None], pa.int64())})),
            "v", 2,
        )
    with pytest.raises(Exception, match="string or signed integer"):
        frequent_items(
            rd.from_arrow(pa.table({"v": pa.array([1.5, 2.5])})), "v", 2
        )


def test_filter_by_key_quantile(rd):
    """Per-key percentile gate matches a per-group sort replay for string
    AND int keys, all four comparisons; forced digest-shuffle + forced
    distributed-join paths are value-identical to the defaults."""
    import math

    from raylink.aggs import filter_by_key_quantile

    rng = np.random.default_rng(3)
    n = 2000
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "lang": rng.choice(["en", "de", "fr"], size=n),
        "ki": rng.integers(0, 5, size=n).astype(np.int64),
        "score": rng.integers(0, 400, size=n).astype(np.int64),
    })
    ds = rd.from_pandas(df).repartition(5)

    def expected(key, qn, qd, keep):
        out = []
        for _, g in df.groupby(key):
            sv = np.sort(g["score"].to_numpy())
            t = sv[math.ceil(qn * len(sv) / qd) - 1]
            m = {"ge": g["score"] >= t, "gt": g["score"] > t,
                 "le": g["score"] <= t, "lt": g["score"] < t}[keep]
            out.append(g[m])
        cols = ["doc_id", "lang", "ki", "score"]
        return (
            pd.concat(out)[cols].sort_values(cols).reset_index(drop=True)
        )

    for key, qn, qd, keep in [
        ("lang", 1, 2, "ge"), ("lang", 9, 10, "gt"),
        ("ki", 1, 2, "ge"), ("ki", 1, 4, "lt"), ("lang", 99, 100, "le"),
    ]:
        got = filter_by_key_quantile(
            ds, key, "score", qn, qd, keep=keep, output="pandas"
        )
        cols = list(got.columns)
        pd.testing.assert_frame_equal(
            got.sort_values(cols).reset_index(drop=True),
            expected(key, qn, qd, keep),
        )
    base = filter_by_key_quantile(ds, "lang", "score", 1, 2, output="pandas")
    forced = filter_by_key_quantile(
        ds, "lang", "score", 1, 2, output="pandas",
        driver_merge_max_rows=0, max_broadcast_rows=0,
    )
    cols = list(base.columns)
    pd.testing.assert_frame_equal(
        base.sort_values(cols).reset_index(drop=True),
        forced.sort_values(cols).reset_index(drop=True),
    )
    ds_out = filter_by_key_quantile(ds, "lang", "score", 1, 2)
    assert ds_out.count() == len(base)


def test_filter_by_key_quantile_guards(rd):
    from raylink.aggs import filter_by_key_quantile

    ds = rd.from_arrow(pa.table({
        "k": pa.array(["a", "b"], pa.string()),
        "lang": pa.array(["a", "b"], pa.string()),
        "score": pa.array([1, 2], pa.int64()),
    }))
    with pytest.raises(ValueError, match="keep must be"):
        filter_by_key_quantile(ds, "lang", "score", 1, 2, keep="xx")
    with pytest.raises(ValueError, match="1 <= q_num <= q_den"):
        filter_by_key_quantile(ds, "lang", "score", 0, 2)
    with pytest.raises(ValueError, match="1 <= q_num <= q_den"):
        filter_by_key_quantile(ds, "lang", "score", 3, 2)
    nulls = rd.from_arrow(pa.table({
        "lang": pa.array(["a", "b"], pa.string()),
        "score": pa.array([1, None], pa.int64()),
    }))
    with pytest.raises(Exception, match="null"):
        filter_by_key_quantile(nulls, "lang", "score", 1, 2, output="pandas")
    thr = rd.from_arrow(pa.table({
        "lang": pa.array(["a"], pa.string()),
        "thr": pa.array([1], pa.int64()),
        "score": pa.array([1], pa.int64()),
    }))
    with pytest.raises(ValueError, match="thr"):
        filter_by_key_quantile(thr, "lang", "score", 1, 2)
    floats = rd.from_arrow(pa.table({
        "lang": pa.array([1.5, 2.5]),
        "score": pa.array([1, 2], pa.int64()),
    }))
    with pytest.raises(ValueError, match="int64 or string"):
        filter_by_key_quantile(floats, "lang", "score", 1, 2)
    # float / uint64 VALUES reject loudly: the digest would truncate the
    # threshold while the gate compares originals (silent wrong row set)
    fvals = rd.from_arrow(pa.table({
        "lang": pa.array(["a", "a"], pa.string()),
        "score": pa.array([0.5, 0.6]),
    }))
    with pytest.raises(Exception, match="signed integer"):
        filter_by_key_quantile(fvals, "lang", "score", 1, 2,
                               output="pandas")
    uvals = rd.from_arrow(pa.table({
        "lang": pa.array(["a", "a"], pa.string()),
        "score": pa.array([1, 2], pa.uint64()),
    }))
    with pytest.raises(Exception, match="signed integer"):
        filter_by_key_quantile(uvals, "lang", "score", 1, 2,
                               output="pandas")
    # key named "n" would be overwritten by group_quantiles' count col
    nkey = rd.from_arrow(pa.table({
        "n": pa.array([1, 2], pa.int64()),
        "score": pa.array([1, 2], pa.int64()),
    }))
    with pytest.raises(ValueError, match='"n"'):
        filter_by_key_quantile(nkey, "n", "score", 1, 2)
    with pytest.raises(ValueError, match="output"):
        filter_by_key_quantile(ds, "lang", "score", 1, 2, output="Pandas")


# ---------------------------------------------------------------------------
# rank_within_key
# ---------------------------------------------------------------------------


def _rank_frame(n=4000, nkeys=30, seed=19):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "doc": np.arange(n, dtype=np.int64),
            "key": rng.integers(0, nkeys, n).astype(np.int64),
            # coarse grid forces ties within keys
            "val": rng.integers(0, 60, n).astype(np.int64),
        }
    )


def _rank_expect(df, keyc="key"):
    exp = df.copy()
    exp["rank_lt"] = (
        df.groupby(keyc)["val"].rank(method="min").astype(np.int64) - 1
    )
    exp["key_n"] = df.groupby(keyc)["val"].transform("count").astype(np.int64)
    return exp.sort_values(list(exp.columns)).reset_index(drop=True)


def test_rank_within_key_matches_pandas_int_and_string(rd):
    from raylink.aggs import rank_within_key

    df = _rank_frame()
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(7)
    got = rank_within_key(ds, "key", "val", output="pandas")
    pd.testing.assert_frame_equal(got, _rank_expect(df))

    sdf = df.assign(key=df["key"].map(lambda x: f"lang{x:02d}"))
    sds = rd.from_arrow(pa.Table.from_pandas(sdf)).repartition(7)
    sgot = rank_within_key(sds, "key", "val", output="pandas")
    pd.testing.assert_frame_equal(sgot, _rank_expect(sdf))


def test_rank_within_key_forced_paths_and_dataset(rd):
    from raylink.aggs import rank_within_key

    df = _rank_frame(n=2500, nkeys=8, seed=23)
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(5)
    base = rank_within_key(ds, "key", "val", output="pandas")
    forced = rank_within_key(
        ds, "key", "val", output="pandas",
        driver_merge_max_rows=0, max_broadcast_rows=0, n_parts=5,
    )
    pd.testing.assert_frame_equal(base, forced)
    as_ds = rank_within_key(ds, "key", "val").to_pandas()
    as_ds = as_ds.sort_values(list(as_ds.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(base, as_ds)
    # separator-bearing string keys must not collide across pairs
    tricky = pd.DataFrame(
        {
            "key": ["a\x1f1", "a", "a\x1f1", "a"],
            "val": np.array([2, 12, 2, 9], dtype=np.int64),
        }
    )
    tds = rd.from_arrow(pa.Table.from_pandas(tricky))
    tgot = rank_within_key(tds, "key", "val", output="pandas")
    exp = tricky.copy()
    exp["rank_lt"] = (
        tricky.groupby("key")["val"].rank(method="min").astype(np.int64) - 1
    )
    exp["key_n"] = (
        tricky.groupby("key")["val"].transform("count").astype(np.int64)
    )
    exp = exp.sort_values(list(exp.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(tgot, exp)


def test_rank_within_key_rejections(rd):
    from raylink.aggs import rank_within_key

    df = _rank_frame(n=50, nkeys=3, seed=5)
    ds = rd.from_arrow(pa.Table.from_pandas(df))
    with pytest.raises(ValueError, match="staging"):
        rank_within_key(
            rd.from_arrow(pa.Table.from_pandas(df.rename(columns={"key": "v"}))),
            "v", "val",
        )
    with pytest.raises(ValueError, match="collides"):
        rank_within_key(
            rd.from_arrow(pa.Table.from_pandas(df.assign(kv=1))),
            "key", "val",
        )
    with pytest.raises(ValueError, match="differ"):
        rank_within_key(ds, "key", "val", rank_col="r", n_col="r")
    with pytest.raises(Exception, match="signed integer"):
        rank_within_key(
            rd.from_arrow(pa.Table.from_pandas(df.assign(val=df["val"] * 1.5))),
            "key", "val", output="pandas",
        )
    nulls = pa.table(
        {
            "key": pa.array([1, None], type=pa.int64()),
            "val": pa.array([1, 2], type=pa.int64()),
        }
    )
    with pytest.raises(Exception, match="null"):
        rank_within_key(rd.from_arrow(nulls), "key", "val", output="pandas")
    with pytest.raises(ValueError, match="output"):
        rank_within_key(ds, "key", "val", output="arrow")


def test_rank_within_key_empty_input(rd):
    from raylink.aggs import rank_within_key
    from raylink.joins import typed_to_pandas

    empty = pa.table(
        {
            "doc": pa.array([], pa.int64()),
            "key": pa.array([], pa.string()),
            "val": pa.array([], pa.int64()),
        }
    )
    ds = rd.from_arrow(empty)
    out = rank_within_key(ds, "key", "val", output="pandas")
    assert list(out.columns) == ["doc", "key", "val", "rank_lt", "key_n"]
    assert len(out) == 0
    dset = rank_within_key(ds, "key", "val")
    assert [f.name for f in dset.schema().base_schema] == [
        "doc", "key", "val", "rank_lt", "key_n",
    ]
    assert len(typed_to_pandas(dset)) == 0


def test_remove_repeated_lines_semantics(rd):
    from raylink.textstats import remove_repeated_lines

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "a\nb\na\nc\nb",      # interleaved repeats
                    "x\n\n\nx\nx",        # empty lines dedupe too
                    "",                   # empty doc passes through
                    "only one line here",
                ]
            ),
        }
    )
    ds = rd.from_arrow(t)
    out = remove_repeated_lines(ds, output="pandas")
    assert out["text"].tolist() == ["a\nb\nc", "x\n", "", "only one line here"]
    assert out["doc_id"].tolist() == [1, 2, 3, 4]
    # min_chars: short lines always survive (all lines here are 1 char)
    kept = remove_repeated_lines(ds, min_chars=2, output="pandas")
    assert kept["text"].tolist() == t["text"].to_pylist()
    # pure-python reference parity on random multi-line docs
    rng = np.random.default_rng(3)
    lines_pool = ["ok", "yes", "the answer is 42", "", "done", "retry"]
    docs = [
        "\n".join(rng.choice(lines_pool, int(rng.integers(0, 12))))
        for _ in range(200)
    ]
    rds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(200, dtype=np.int64)),
                "text": pa.array(docs),
            }
        )
    ).repartition(5)
    got = remove_repeated_lines(rds, output="pandas")

    def ref(s):
        seen, keep = set(), []
        for l in s.split("\n"):
            if l not in seen:
                seen.add(l)
                keep.append(l)
        return "\n".join(keep)

    assert got["text"].tolist() == [ref(d) for d in docs]
    # dataset output parity + rejection
    as_ds = remove_repeated_lines(rds).to_pandas()
    as_ds = as_ds.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, as_ds)
    with pytest.raises(ValueError, match="output"):
        remove_repeated_lines(rds, output="arrow")


def test_rank_within_key_output_name_staging_guard(rd):
    from raylink.aggs import rank_within_key

    df = _rank_frame(n=20, nkeys=2, seed=1)
    ds = rd.from_arrow(pa.Table.from_pandas(df))
    with pytest.raises(ValueError, match="staging"):
        rank_within_key(ds, "key", "val", rank_col="kv")
    with pytest.raises(ValueError, match="staging"):
        rank_within_key(ds, "key", "val", n_col="v")


# ---------------------------------------------------------------------------
# merge_records (survivorship / golden record)
# ---------------------------------------------------------------------------


def _mr_frame(n=1200, nkeys=15, seed=31):
    rng = np.random.default_rng(seed)
    words = ["acme", "acme corp", "acme corporation", "ac", "beta", "beta inc"]
    return pd.DataFrame(
        {
            "rid": np.arange(n, dtype=np.int64),
            "cluster": rng.integers(0, nkeys, n).astype(np.int64),
            "name": rng.choice(words, n),
            "score": rng.integers(0, 9, n).astype(np.int64),
        }
    )


def _mr_expect(df):
    out = []
    for k, g in df.groupby("cluster"):
        longest = g.loc[
            g.assign(_l=g["name"].str.len())
            .sort_values(["_l", "name"], ascending=[False, True])
            .index[0],
            "name",
        ]
        cnt = g.groupby("name").size().reset_index(name="c")
        mode = cnt.sort_values(["c", "name"], ascending=[False, True]).iloc[0][
            "name"
        ]
        first = g.sort_values(["rid", "score"]).iloc[0]["score"]
        out.append(
            {
                "cluster": k,
                "name": longest,
                "score": int(g["score"].max()),
                "rid": int(g["rid"].min()),
                "mode_name": mode,
                "first_score": int(first),
            }
        )
    return pd.DataFrame(out).sort_values("cluster").reset_index(drop=True)


def test_merge_records_matches_pandas(rd):
    from raylink.aggs import merge_records

    df = _mr_frame()
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(6)
    got = merge_records(
        ds, "cluster",
        {"name": "longest", "score": "max", "rid": "first"},
        id_col="rid", output="pandas",
    )
    exp = _mr_expect(df)
    pd.testing.assert_frame_equal(
        got, exp[["cluster", "name", "score", "rid"]]
    )
    # mode + first-value + string cluster keys
    sdf = df.assign(cluster=df["cluster"].map(lambda x: f"e{x:02d}"))
    sds = rd.from_arrow(pa.Table.from_pandas(sdf)).repartition(6)
    got2 = merge_records(
        sds, "cluster", {"name": "mode", "score": "first"},
        id_col="rid", output="pandas",
    )
    exp2 = _mr_expect(sdf)[["cluster", "first_score", "mode_name"]].rename(
        columns={"first_score": "score", "mode_name": "name"}
    )
    pd.testing.assert_frame_equal(got2, exp2)


def test_merge_records_forced_paths_and_guards(rd):
    from raylink.aggs import merge_records

    df = _mr_frame(n=600, nkeys=5, seed=7)
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(4)
    spec = {"name": "longest", "score": "max", "rid": "first"}
    base = merge_records(ds, "cluster", spec, id_col="rid", output="pandas")
    forced = merge_records(
        ds, "cluster", spec, id_col="rid", output="pandas",
        driver_merge_max_rows=0, max_broadcast_rows=0, n_parts=5,
    )
    pd.testing.assert_frame_equal(base, forced)
    as_ds = merge_records(ds, "cluster", spec, id_col="rid")
    from raylink.joins import typed_to_pandas

    pdf = typed_to_pandas(as_ds).sort_values("cluster", ignore_index=True)
    pd.testing.assert_frame_equal(base, pdf)
    with pytest.raises(ValueError, match="unknown rule"):
        merge_records(ds, "cluster", {"name": "best"})
    with pytest.raises(ValueError, match="requires id_col"):
        merge_records(ds, "cluster", {"name": "first"})
    with pytest.raises(ValueError, match="no input column"):
        merge_records(ds, "cluster", {"missing": "max"})
    with pytest.raises(ValueError, match="cluster column"):
        merge_records(ds, "cluster", {"cluster": "max"})
    with pytest.raises(ValueError, match="staging"):
        merge_records(
            rd.from_arrow(pa.Table.from_pandas(df.rename(columns={"name": "v"}))),
            "cluster", {"v": "longest"},
        )
    nulls = pa.table(
        {
            "cluster": pa.array([1, 1], pa.int64()),
            "name": pa.array(["a", None]),
        }
    )
    with pytest.raises(Exception, match="null"):
        merge_records(
            rd.from_arrow(nulls), "cluster", {"name": "longest"},
            output="pandas",
        )


def test_merge_records_empty_blocks_and_string_id(rd):
    from raylink.aggs import merge_records

    # more blocks than rows -> zero-row blocks WITH schema must not crash
    df = _mr_frame(n=3, nkeys=2, seed=2)
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(8)
    out = merge_records(
        ds, "cluster", {"name": "longest", "score": "max"}, output="pandas"
    )
    exp = _mr_expect(df)[["cluster", "name", "score"]]
    pd.testing.assert_frame_equal(out, exp)
    # string id_col for rule "first" (the typed-empty id hazard)
    sdf = df.assign(sid=df["rid"].map(lambda x: f"r{x:03d}"))
    sds = rd.from_arrow(pa.Table.from_pandas(sdf)).repartition(8)
    got = merge_records(
        sds, "cluster", {"name": "first"}, id_col="sid", output="pandas"
    )
    exp2 = (
        sdf.sort_values(["sid", "name"]).groupby("cluster").first()
        .reset_index()[["cluster", "name"]]
    )
    pd.testing.assert_frame_equal(got, exp2)
    with pytest.raises(ValueError, match="no input column"):
        merge_records(sds, "cluster", {"name": "first"}, id_col="nope")
    with pytest.raises(ValueError, match="staging"):
        merge_records(
            rd.from_arrow(pa.Table.from_pandas(df.rename(columns={"name": "side"}))),
            "cluster", {"side": "max"},
        )


def test_merge_records_id_col_untouched_without_first_rule(rd):
    from raylink.aggs import merge_records

    t = pa.table(
        {
            "cluster": pa.array([1, 1], pa.int64()),
            "name": pa.array(["a", "bb"]),
            "rid": pa.array([1, None], pa.int64()),
        }
    )
    # a null-bearing id_col must NOT reject when no rule needs it
    out = merge_records(
        rd.from_arrow(t), "cluster", {"name": "longest"}, id_col="rid",
        output="pandas",
    )
    assert out["name"].tolist() == ["bb"]


def test_pick_first_per_cluster_property():
    # kernel-level (no Ray): random tables with heavy ties, every rule's
    # sort spec vs the pandas sort+first reference
    from raylink.aggs import _pick_first_per_cluster, _rule_sort_keys

    rng = np.random.default_rng(41)
    for trial in range(30):
        n = int(rng.integers(1, 60))
        tbl = pa.table(
            {
                "k": pa.array(rng.integers(0, 5, n).astype(np.int64)),
                "v": pa.array(
                    rng.choice(["a", "bb", "bb", "ccc", ""], n)
                ),
                "ln": pa.array(rng.integers(0, 4, n).astype(np.int64)),
                "i": pa.array(rng.integers(0, 10, n).astype(np.int64)),
            }
        )
        df = tbl.to_pandas()
        for rule, by, asc in (
            ("longest", ["k", "ln", "v"], [True, False, True]),
            ("max", ["k", "v"], [True, False]),
            ("min", ["k", "v"], [True, True]),
            ("first", ["k", "i", "v"], [True, True, True]),
        ):
            got = _pick_first_per_cluster(
                tbl, _rule_sort_keys(rule)
            ).to_pandas()
            exp = (
                df.sort_values(by, ascending=asc, kind="stable")
                .drop_duplicates("k")
                .sort_values("k")
                .reset_index(drop=True)
            )
            got = got.sort_values("k").reset_index(drop=True)
            pd.testing.assert_frame_equal(
                got[["k", "v"]], exp[["k", "v"]], obj=f"trial{trial}:{rule}"
            )
