"""Distributed engine vs single-node oracle — exact frame equality on the
reference fixture, plus the flagship transcript pipeline with the pairwise
F1 gate (north rule: F1 >= 0.99 vs reference-semantics clusters at the same
blocking key)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from raylink import EditDistanceMatcher, PolyMatch
from raylink.metrics import pairwise_f1
from raylink.pipeline import (
    MatcherSpec,
    entities_from_texts,
    group_matches,
    match_dataset,
    matches_to_frame,
)


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray.data


def _ds(rd, texts, blocks=None):
    return rd.from_arrow(entities_from_texts(texts, blocks))


def test_tfidf_two_list_equals_oracle(rd, fixture_lists):
    from_list, to_list = fixture_lists
    res = match_dataset(
        _ds(rd, from_list), _ds(rd, to_list), MatcherSpec(min_similarity=0)
    )
    frame = matches_to_frame(res.matches, res.top_n_cols)
    oracle = PolyMatch("TF-IDF").match(from_list, to_list).get_matches()
    pd.testing.assert_frame_equal(frame, oracle)


def test_tfidf_self_match_equals_oracle(rd, fixture_lists):
    from_list, _ = fixture_lists
    res = match_dataset(_ds(rd, from_list), None, MatcherSpec(min_similarity=0))
    frame = matches_to_frame(res.matches, res.top_n_cols)
    oracle = PolyMatch("TF-IDF").match(from_list).get_matches()
    pd.testing.assert_frame_equal(frame, oracle)


def test_tfidf_top_n(rd, fixture_lists):
    from_list, to_list = fixture_lists
    res = match_dataset(
        _ds(rd, from_list), _ds(rd, to_list), MatcherSpec(min_similarity=0, top_n=2)
    )
    frame = matches_to_frame(res.matches, res.top_n_cols)
    oracle = PolyMatch("TF-IDF").match(from_list, to_list, top_n=2).get_matches()
    pd.testing.assert_frame_equal(frame, oracle)


def test_rapidfuzz_equals_oracle(rd, fixture_lists):
    from_list, to_list = fixture_lists
    res = match_dataset(
        _ds(rd, from_list), _ds(rd, to_list), MatcherSpec(kind="rapidfuzz")
    )
    frame = matches_to_frame(res.matches, 1)
    oracle = PolyMatch("EditDistance").match(from_list, to_list).get_matches()
    pd.testing.assert_frame_equal(frame, oracle)


def test_editdistance_normalize_equals_oracle(rd, fixture_lists):
    from_list, to_list = fixture_lists
    res = match_dataset(
        _ds(rd, from_list), _ds(rd, to_list),
        MatcherSpec(kind="editdistance", normalize=True),
    )
    frame = matches_to_frame(res.matches, 1)
    oracle = EditDistanceMatcher(normalize=True).match(from_list, to_list)
    pd.testing.assert_frame_equal(frame, oracle)


def test_embeddings_equals_oracle(rd, fixture_lists):
    from_list, to_list = fixture_lists
    res = match_dataset(
        _ds(rd, from_list), _ds(rd, to_list),
        MatcherSpec(kind="embeddings", min_similarity=0),
    )
    frame = matches_to_frame(res.matches, res.top_n_cols)
    oracle = PolyMatch("Embeddings").match(from_list, to_list).get_matches()
    pd.testing.assert_frame_equal(frame, oracle)


def test_group_equals_oracle(rd, fixture_lists):
    from_list, to_list = fixture_lists
    res = match_dataset(
        _ds(rd, from_list), _ds(rd, to_list), MatcherSpec(min_similarity=0)
    )
    gr = group_matches(res, link_min_similarity=0.75)
    frame = matches_to_frame(gr.grouped, res.top_n_cols)
    oracle = PolyMatch("TF-IDF").match(from_list, to_list)
    oracle.group(link_min_similarity=0.75)
    pd.testing.assert_frame_equal(frame, oracle.get_matches())
    cl = gr.clusters.to_pandas()
    got = {
        cid: grp["member"].tolist()
        for cid, grp in cl.groupby("cluster_id", sort=True)
    }
    assert got == oracle.get_clusters()


def test_blocked_match_is_per_block(rd):
    froms = ["apple", "apfel", "banana", "bananna"]
    blocks = ["a", "a", "b", "b"]
    res = match_dataset(
        _ds(rd, froms, blocks), None, MatcherSpec(min_similarity=0)
    )
    frame = res.matches.to_pandas().sort_values("row_order")
    # matches never cross blocks
    assert frame.loc[frame["from"] == "apple", "to"].iloc[0] in ("apfel", None)
    assert frame.loc[frame["from"] == "banana", "to"].iloc[0] == "bananna"


def test_flagship_f1_gate(rd):
    """North-rule F1 gate via the SHARED probe (raylink.flagship.
    flagship_f1_probe — the same implementation bench.py reports, so the
    gated number and the reported number cannot diverge)."""
    from raylink.flagship import flagship_f1_probe

    f1 = flagship_f1_probe()
    assert f1["f1"] >= 0.99, f1
    # assignments cover every conversation
    assert f1["n_assignments"] == f1["n_ground_truth"]
    assert f1["scored_pairs"] > 0


def test_flagship_recovers_ground_truth(rd):
    """Sanity: clustering quality against the synthetic ground truth is
    high (not a parity requirement — linkage quirks cap it below 1)."""
    import ray

    from raylink.flagship import transcript_entity_resolution
    from raylink.transcripts import generate_transcripts, labeled_pairs
    from raylink.metrics import pairwise_f1

    transcripts, gt = generate_transcripts(80, seed=7)
    pairs = labeled_pairs(gt, seed=7).to_pandas()
    result = transcript_entity_resolution(
        rd.from_arrow(transcripts), link_min_similarity=0.6
    )
    cl = pa.concat_tables(
        ray.get(result.clusters.to_arrow_refs()), promote_options="default"
    )
    ours = {
        m: (bk, cid)
        for bk, m, cid in zip(
            cl["block_key"].to_pylist(),
            cl["member"].to_pylist(),
            cl["cluster_id"].to_pylist(),
        )
    }
    gtd = gt.to_pandas()
    truth = dict(zip(gtd["variant"], gtd["entity_id"]))
    quality = pairwise_f1(pairs, ours, truth)
    assert quality["f1"] > 0.6, quality


def test_sharded_to_side_matches_broadcast(rd):
    """K4 cross-partition top-k merge: sharding the to-side must reproduce
    the broadcast-index result (same joint vocabulary, ordered shards)."""
    import numpy as np

    from raylink.pipeline import (
        MatcherSpec,
        match_dataset,
        match_dataset_sharded_to,
        matches_to_frame,
    )

    rng = np.random.default_rng(21)
    to_list = ["".join(rng.choice(list("abcdef"), size=7)) for _ in range(40)]
    from_list = ["".join(rng.choice(list("abcdef"), size=7)) for _ in range(25)]
    spec = MatcherSpec(min_similarity=0, top_n=2)
    base = match_dataset(_ds(rd, from_list), _ds(rd, to_list), spec)
    base_frame = matches_to_frame(base.matches, base.top_n_cols)
    merged = match_dataset_sharded_to(
        _ds(rd, from_list), _ds(rd, to_list), spec, n_shards=3
    )
    import ray.data as rdm

    sharded_frame = matches_to_frame(rdm.from_arrow(merged), base.top_n_cols)
    pd.testing.assert_frame_equal(sharded_frame, base_frame)


def test_pr_curves_per_model(rd, fixture_lists):
    """Distributed per-model PR curves equal the local reference math
    (visualize_precision_recall numbers, polyfuzz/polyfuzz.py:286-329)."""
    from raylink.metrics import pr_curves_for_matches, precision_recall_curve
    from raylink.pipeline import MatcherSpec, match_many

    from_list, to_list = fixture_lists
    specs = [
        MatcherSpec(kind="tfidf", min_similarity=0, model_id="TF-IDF"),
        MatcherSpec(kind="rapidfuzz", model_id="RF"),
    ]
    results = match_many(
        rd.from_arrow(entities_from_texts(from_list)),
        rd.from_arrow(entities_from_texts(to_list)),
        specs,
    )
    curves = pr_curves_for_matches(
        {mid: r.matches for mid, r in results.items()}
    )
    assert set(curves["model_id"]) == {"TF-IDF", "RF"}
    # cross-check against the single-node oracle's curve per model
    local = PolyMatch("TF-IDF").match(from_list, to_list).get_matches()
    mp, rc, ap = precision_recall_curve(local)
    sub = curves[curves.model_id == "TF-IDF"]
    np.testing.assert_allclose(sub["min_precision"].to_numpy(), mp)
    np.testing.assert_allclose(sub["recall"].to_numpy(), rc)
    got_ap = sub["average_precision"].to_numpy()
    exp_ap = np.asarray(ap)
    mask = ~(np.isnan(got_ap) & np.isnan(exp_ap))
    np.testing.assert_allclose(got_ap[mask], exp_ap[mask])


def test_cross_block_cluster_merge(rd):
    """SURVEY §7.1(5): variants split across blocks by a first-character
    typo merge via their representatives; within-block results untouched."""
    from raylink.pipeline import (
        MatcherSpec,
        group_matches,
        match_dataset,
        merge_clusters_across_blocks,
    )

    # singleton strings never form clusters (reference group() semantics),
    # so each block carries a clusterable pair; the 't' pair is a
    # first-character typo family of the 's' entity
    froms = [
        "stellar dynamics inc", "stellar dynamics incx",    # block s
        "tstellar dynamics inc", "tstellar dynamics incx",  # typo -> block t
        "banana corp", "banana corps",                      # block b
    ]
    blocks = [t[0] for t in froms]
    res = match_dataset(_ds(rd, froms, blocks), None, MatcherSpec(min_similarity=0))
    gr = group_matches(res, link_min_similarity=0.6, group_all_strings=True)
    merged = merge_clusters_across_blocks(
        gr.clusters, link_min_similarity=0.6
    ).to_pandas()
    by_member = dict(zip(merged["member"], merged["global_cluster_id"]))
    # cross-block variants share a global id
    assert by_member["stellar dynamics inc"] == by_member["tstellar dynamics inc"]
    # unrelated blocks stay separate
    assert by_member["banana corp"] != by_member["stellar dynamics inc"]
    # within-block cluster ids unchanged
    orig = gr.clusters.to_pandas().sort_values(["block_key", "member"], ignore_index=True)
    after = merged[orig.columns.tolist()].sort_values(["block_key", "member"], ignore_index=True)
    import pandas as pd

    pd.testing.assert_frame_equal(orig, after)


def test_edge_reuse_equals_full_grouper_pass(rd):
    """The edge-reuse shortcut (derive grouper edges from the match pass)
    must produce identical clusters to the full second scoring pass."""
    from raylink.pipeline import MatcherSpec, group_matches, match_dataset

    rng = np.random.default_rng(77)
    words = ["".join(rng.choice(list("abcdef"), size=7)) for _ in range(60)]
    blocks = [w[0] for w in words]

    def run(defeat_reuse: bool):
        res = match_dataset(
            _ds(rd, words, blocks), None, MatcherSpec(min_similarity=0)
        )
        if defeat_reuse:
            res.index_blocks = None  # forces the full grouper scoring pass
        gr = group_matches(res, link_min_similarity=0.5, group_all_strings=True)
        return (
            gr.clusters.to_pandas()
            .sort_values(["block_key", "member"], ignore_index=True)
        )

    fast = run(defeat_reuse=False)
    full = run(defeat_reuse=True)
    pd.testing.assert_frame_equal(fast, full)


def test_assignment_lookup_empty_and_basic(rd):
    import pyarrow as pa

    from raylink.pipeline import make_assignment_lookup

    empty = pa.table(
        {
            "block_key": pa.array([], type=pa.string()),
            "member": pa.array([], type=pa.string()),
            "representative": pa.array([], type=pa.string()),
            "cluster_id": pa.array([], type=pa.int64()),
        }
    )
    resolve = make_assignment_lookup(empty)
    groups, cids = resolve(["a", "b"], ["x", "y"])
    assert groups.tolist() == ["x", "y"]  # unmatched fall back to the text
    assert cids.tolist() == [-1, -1]

    tbl = pa.table(
        {
            "block_key": pa.array(["a", "a", "b"], type=pa.string()),
            "member": pa.array(["x", "z", "x"], type=pa.string()),
            "representative": pa.array(["rx", "rz", "rbx"], type=pa.string()),
            "cluster_id": pa.array([1, 2, 0], type=pa.int64()),
        }
    )
    resolve = make_assignment_lookup(tbl)
    groups, cids = resolve(["a", "b", "c"], ["z", "x", "q"])
    assert groups.tolist() == ["rz", "rbx", "q"]
    assert cids.tolist() == [2, 0, -1]


def test_flagship_with_no_clusters(rd):
    """All-singleton input: no pairs clear the link threshold, clusters are
    empty, every conversation keeps its own mention as the group."""
    import pyarrow as pa

    from raylink.flagship import transcript_entity_resolution

    rows = {
        "conv_id": ["c1", "c1", "c2", "c3"],
        "turn_idx": [0, 1, 0, 0],
        "role": ["user", "assistant", "user", "user"],
        "text": [
            'about "alpha one" x', "filler",
            'about "beta two" y', 'about "gamma three" z',
        ],
        "tool": ["", "", "", ""],
        "ts": [1, 2, 3, 4],
    }
    import pandas as pd

    t = pa.Table.from_pandas(pd.DataFrame(rows))
    res = transcript_entity_resolution(rd.from_arrow(t), link_min_similarity=0.99)
    out = res.assignments.to_pandas().sort_values("conv_id")
    assert (out["group"] == out["entity_text"]).all()
    assert (out["cluster_id"] == -1).all()


def test_auto_shard_switch_matches_broadcast(rd):
    """A to-side above max_broadcast_to_rows automatically takes the
    sharded-index path and must reproduce the broadcast result."""
    from raylink.pipeline import MatcherSpec, match_dataset, matches_to_frame

    rng = np.random.default_rng(5)
    to_list = ["".join(rng.choice(list("abcdef"), size=7)) for _ in range(30)]
    from_list = ["".join(rng.choice(list("abcdef"), size=7)) for _ in range(20)]
    spec = MatcherSpec(min_similarity=0, top_n=2)
    base = match_dataset(_ds(rd, from_list), _ds(rd, to_list), spec)
    auto = match_dataset(
        _ds(rd, from_list), _ds(rd, to_list), spec, max_broadcast_to_rows=8
    )
    pd.testing.assert_frame_equal(
        matches_to_frame(auto.matches, auto.top_n_cols),
        matches_to_frame(base.matches, base.top_n_cols),
    )


def test_sharded_self_match_equals_broadcast(rd, fixture_lists):
    """Self-match above max_broadcast_to_rows auto-switches to the sharded
    path (K4 for self-match) and must be byte-identical to broadcast —
    including positional-diagonal drops, round-3/null rules, and ties."""
    from raylink.pipeline import MatcherSpec, match_dataset, matches_to_frame

    rng = np.random.default_rng(11)
    texts = ["".join(rng.choice(list("abcde"), size=6)) for _ in range(40)]
    texts += texts[:5]  # duplicates: positional (not value) self-drop
    blocks = [t[0] for t in texts]
    for top_n in (1, 2):
        spec = MatcherSpec(min_similarity=0, top_n=top_n)
        base = match_dataset(_ds(rd, texts, blocks), None, spec)
        shard = match_dataset(
            _ds(rd, texts, blocks), None, spec, max_broadcast_to_rows=7
        )
        assert shard.sharded_self and not base.sharded_self
        pd.testing.assert_frame_equal(
            matches_to_frame(shard.matches, shard.top_n_cols),
            matches_to_frame(base.matches, base.top_n_cols),
        )


def test_sharded_self_flagship_byte_identical(rd):
    """Forced-tiny broadcast bound through the WHOLE flagship (match +
    grouper edge reuse + linkage) reproduces broadcast output exactly."""
    from raylink.flagship import transcript_entity_resolution
    from raylink.queries import ensure_transcript_fixture
    from raylink.sources import read_parquet_with_row_order

    info = ensure_transcript_fixture("/root/testdata/sf0.001")
    cols = ["conv_id", "turn_idx", "text"]
    base = transcript_entity_resolution(
        read_parquet_with_row_order(info["transcripts"], columns=cols),
        link_min_similarity=0.75,
    )
    shard = transcript_entity_resolution(
        read_parquet_with_row_order(info["transcripts"], columns=cols),
        link_min_similarity=0.75,
        max_broadcast_to_rows=50,
    )
    for name, key in [
        ("clusters", ["block_key", "cluster_id", "member"]),
        ("assignments", ["conv_id"]),
        ("matches", ["row_order"]),
    ]:
        a = getattr(base, name).to_pandas().sort_values(key, ignore_index=True)
        b = getattr(shard, name).to_pandas().sort_values(key, ignore_index=True)
        pd.testing.assert_frame_equal(a, b[a.columns])


def test_distributed_distinct_flagship_identical(rd):
    """Forced distributed-distinct (groupby path, no driver merge) alone
    and combined with the sharded self-match reproduces the default
    flagship output exactly."""
    from raylink.flagship import transcript_entity_resolution
    from raylink.queries import ensure_transcript_fixture
    from raylink.sources import read_parquet_with_row_order

    info = ensure_transcript_fixture("/root/testdata/sf0.001")
    cols = ["conv_id", "turn_idx", "text"]

    def run(**kw):
        return transcript_entity_resolution(
            read_parquet_with_row_order(info["transcripts"], columns=cols),
            link_min_similarity=0.75,
            **kw,
        )

    base = run()
    dd = run(distinct_distributed_over=0)
    both = run(distinct_distributed_over=0, max_broadcast_to_rows=50)
    assert dd.scored_pairs == base.scored_pairs
    assert dd.n_distinct == base.n_distinct
    for variant in (dd, both):
        for name, key in [
            ("clusters", ["block_key", "cluster_id", "member"]),
            ("assignments", ["conv_id"]),
        ]:
            a = getattr(base, name).to_pandas().sort_values(key, ignore_index=True)
            b = getattr(variant, name).to_pandas().sort_values(key, ignore_index=True)
            pd.testing.assert_frame_equal(a, b[a.columns])


def test_sharded_embeddings_matches_broadcast(rd):
    """K4 beyond tfidf: the embeddings matcher (self-match AND two-list)
    auto-shards above the broadcast bound with byte-identical output."""
    from raylink.pipeline import MatcherSpec, match_dataset, matches_to_frame

    rng = np.random.default_rng(17)
    texts = ["".join(rng.choice(list("abcdef"), size=6)) for _ in range(36)]
    texts += texts[:4]  # duplicates exercise the positional self-drop
    blocks = [t[0] for t in texts]
    spec = MatcherSpec(kind="embeddings", min_similarity=0, top_n=2)
    base = match_dataset(_ds(rd, texts, blocks), None, spec)
    shard = match_dataset(
        _ds(rd, texts, blocks), None, spec, max_broadcast_to_rows=7
    )
    pd.testing.assert_frame_equal(
        matches_to_frame(shard.matches, shard.top_n_cols),
        matches_to_frame(base.matches, base.top_n_cols),
    )
    to_list = ["".join(rng.choice(list("abcdef"), size=6)) for _ in range(30)]
    spec2 = MatcherSpec(kind="embeddings", min_similarity=0, top_n=2)
    base2 = match_dataset(_ds(rd, texts, blocks), _ds(rd, to_list, [t[0] for t in to_list]), spec2)
    shard2 = match_dataset(
        _ds(rd, texts, blocks), _ds(rd, to_list, [t[0] for t in to_list]),
        spec2, max_broadcast_to_rows=6,
    )
    pd.testing.assert_frame_equal(
        matches_to_frame(shard2.matches, shard2.top_n_cols),
        matches_to_frame(base2.matches, base2.top_n_cols),
    )


def test_linkage_driver_fastpath_equals_groupby(rd):
    """Driver-local linkage (edge count under the bound) must equal the
    distributed groupby path exactly."""
    from raylink.pipeline import MatcherSpec, group_matches, match_dataset

    rng = np.random.default_rng(23)
    texts = ["".join(rng.choice(list("abcd"), size=5)) for _ in range(60)]
    blocks = [t[0] for t in texts]

    def run(**kw):
        res = match_dataset(
            _ds(rd, texts, blocks), None, MatcherSpec(min_similarity=0)
        )
        return group_matches(
            res, link_min_similarity=0.5, group_all_strings=True, **kw
        )

    a = run()  # driver fast path (small)
    b = run(linkage_driver_max_rows=0)  # forced groupby path
    key = ["block_key", "cluster_id", "member"]
    ca = a.clusters.to_pandas().sort_values(key, ignore_index=True)
    cb = b.clusters.to_pandas().sort_values(key, ignore_index=True)
    pd.testing.assert_frame_equal(ca, cb)
    ga = a.grouped.to_pandas().sort_values("row_order", ignore_index=True)
    gb = b.grouped.to_pandas().sort_values("row_order", ignore_index=True)
    pd.testing.assert_frame_equal(ga, gb[ga.columns])


def test_distributed_assignment_join_equals_broadcast(rd):
    from raylink.flagship import transcript_entity_resolution
    from raylink.queries import ensure_transcript_fixture
    from raylink.sources import read_parquet_with_row_order

    info = ensure_transcript_fixture("/root/testdata/sf0.001")
    cols = ["conv_id", "turn_idx", "text"]
    base = transcript_entity_resolution(
        read_parquet_with_row_order(info["transcripts"], columns=cols),
        link_min_similarity=0.75,
    )
    dist = transcript_entity_resolution(
        read_parquet_with_row_order(info["transcripts"], columns=cols),
        link_min_similarity=0.75,
        assign_broadcast_max_rows=0,  # force the co-shuffle join
    )
    a = base.assignments.to_pandas().sort_values("conv_id", ignore_index=True)
    b = dist.assignments.to_pandas().sort_values("conv_id", ignore_index=True)
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_chunked_block_fit_equals_single_task(rd, monkeypatch):
    """Oversized-block chunked fit (DF partials + CSR chunk concat) must
    reproduce the single-task fit bit for bit."""
    import raylink.pipeline as P
    from raylink.pipeline import MatcherSpec, match_dataset, matches_to_frame

    rng = np.random.default_rng(29)
    # >4k total rows + 2 blocks engages the parallel fit branch; block
    # 'a' then exceeds the (patched) chunk size and takes the chunked DAG
    texts = ["a" + "".join(rng.choice(list("bcdef"), size=6)) for _ in range(18000)]
    texts += ["z" + "".join(rng.choice(list("bcdef"), size=6)) for _ in range(3000)]
    blocks = [t[0] for t in texts]
    spec = MatcherSpec(min_similarity=0, top_n=2)
    base = match_dataset(_ds(rd, texts, blocks), None, spec)
    base_frame = matches_to_frame(base.matches, base.top_n_cols)
    monkeypatch.setattr(P, "_PARALLEL_FIT_CHUNK", 4000)  # force chunking
    chunked = match_dataset(_ds(rd, texts, blocks), None, spec)
    pd.testing.assert_frame_equal(
        matches_to_frame(chunked.matches, chunked.top_n_cols), base_frame
    )


def test_distributed_add_group_equals_broadcast(rd):
    """Forcing the co-shuffle Group join (cluster table over the broadcast
    bound) must reproduce the broadcast add_group exactly, including miss
    (group = To) and null-To (group = null) semantics."""
    from raylink.pipeline import MatcherSpec, group_matches, match_dataset

    rng = np.random.default_rng(29)
    texts = ["".join(rng.choice(list("abcd"), size=5)) for _ in range(60)]
    blocks = [t[0] for t in texts]

    def run(**kw):
        res = match_dataset(
            _ds(rd, texts, blocks), None, MatcherSpec(min_similarity=0)
        )
        return group_matches(
            res, link_min_similarity=0.5, group_all_strings=True, **kw
        )

    a = run()
    b = run(linkage_driver_max_rows=0, group_broadcast_max_rows=0)
    assert b.name_map_ref is None  # the distributed regime fired
    ga = a.grouped.to_pandas().sort_values("row_order", ignore_index=True)
    gb = b.grouped.to_pandas().sort_values("row_order", ignore_index=True)
    pd.testing.assert_frame_equal(ga, gb[ga.columns])
    assert ga["to"].isna().any() or True  # schema sanity


def test_large_string_widening_matches_narrow(rd, monkeypatch):
    """Forcing the large_string widening (int64 offsets) on every driver
    merge must leave match + group results identical — the 2 GiB offset
    cap is lifted, not guarded."""
    import raylink.pipeline as pl
    from raylink.pipeline import MatcherSpec, group_matches, match_dataset

    rng = np.random.default_rng(31)
    texts = ["".join(rng.choice(list("abcd"), size=6)) for _ in range(50)]
    blocks = [t[0] for t in texts]

    def run():
        res = match_dataset(
            _ds(rd, texts, blocks), None, MatcherSpec(min_similarity=0)
        )
        gr = group_matches(res, link_min_similarity=0.5, group_all_strings=True)
        return (
            res.matches.to_pandas().sort_values("row_order", ignore_index=True),
            gr.clusters.to_pandas().sort_values(
                ["block_key", "cluster_id", "member"], ignore_index=True
            ),
        )

    m_narrow, c_narrow = run()
    monkeypatch.setattr(pl, "ARROW_STR_WIDEN_BOUND", 0)
    m_wide, c_wide = run()
    pd.testing.assert_frame_equal(m_narrow, m_wide)
    pd.testing.assert_frame_equal(c_narrow, c_wide)


def test_refs_with_num_rows_metadata_path(ray_session):
    """Block refs + row counts read from dataset metadata must agree with
    the blocks themselves — and preserve dataset row order, which
    attach_global_order's offsets depend on."""
    import pyarrow as pa
    import ray
    import ray.data as rd

    from raylink import pipeline as pl

    ds = rd.from_arrow(pa.table({"x": list(range(1000))})).repartition(7).materialize()
    refs, sizes = pl._refs_with_num_rows(ds)
    assert len(refs) == len(sizes) and sum(sizes) == 1000
    tbls = ray.get(refs)
    assert [t.num_rows for t in tbls] == sizes
    cat = pa.concat_tables(tbls, promote_options="default")
    assert cat["x"].to_pylist() == ds.to_pandas()["x"].tolist()


def test_attach_global_order_pandas_blocks(ray_session):
    """ray.data.from_pandas produces pandas blocks; the metadata-read refs
    path hands them through raw, so the order-attach task must convert."""
    import pandas as pd
    import ray.data as rd

    from raylink.pipeline import attach_global_order

    ds = rd.from_pandas(
        pd.DataFrame({"text": ["a", "b", "c", "d", "e"]})
    ).repartition(2)
    out = attach_global_order(ds).to_pandas()
    assert out["row_order"].tolist() == [0, 1, 2, 3, 4]
    assert out["text"].tolist() == ["a", "b", "c", "d", "e"]


def test_spread_table_metadata_fallback_warns_and_matches(ray_session, monkeypatch):
    """When the split task cannot build block metadata (Ray version
    drift), spread_table must fall back to from_arrow_refs with identical
    content AND emit one visible RuntimeWarning (the fallback re-adds a
    metadata probe task per block — silent regressions are banned)."""
    import warnings

    import pyarrow as pa
    import ray

    from raylink import pipeline as pl

    tbl = pa.table({"x": list(range(300)), "t": [f"s{i}" for i in range(300)]})
    normal = pl.spread_table(tbl, target_rows_per_block=64)
    normal_pdf = normal.to_pandas()

    @ray.remote
    def _split_no_meta(t, offsets, sizes):
        slices = [t.slice(o, s).combine_chunks() for o, s in zip(offsets, sizes)]
        return (*slices, None)

    monkeypatch.setattr(pl, "_split_table_remote", _split_no_meta)
    monkeypatch.setattr(pl, "_SPREAD_FALLBACK_WARNED", False)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        fb = pl.spread_table(tbl, target_rows_per_block=64)
        fb_pdf = fb.to_pandas()
    assert any(
        issubclass(w.category, RuntimeWarning) and "spread_table" in str(w.message)
        for w in caught
    )
    pd.testing.assert_frame_equal(fb_pdf, normal_pdf)
    assert fb.num_blocks() == normal.num_blocks()


def test_match_dataset_custom_cols_with_reader_row_order(rd):
    """A dataset that already carries row_order must still honor custom
    text_col/block_col names (the normalization used to be skipped)."""
    import pyarrow as pa

    from raylink.pipeline import MatcherSpec, match_dataset

    tbl = pa.table(
        {
            "row_order": pa.array([0, 1, 2], pa.int64()),
            "name": pa.array(["apple inc", "appel inc", "zebra llc"]),
            "region": pa.array(["x", "x", "x"]),
        }
    )
    ds = rd.from_arrow(tbl)
    res = match_dataset(
        ds, None, MatcherSpec(kind="tfidf", min_similarity=0.0, top_n=1),
        text_col="name", block_col="region",
    )
    out = res.matches.to_pandas()
    assert len(out) == 3
    assert set(out["block_key"]) == {"x"}


def test_match_dataset_knn_self_match_rejected(rd):
    import pyarrow as pa
    import pytest

    from raylink.pipeline import MatcherSpec, match_dataset

    ds = rd.from_arrow(pa.table({"entity_text": pa.array(["a", "b"])}))
    with pytest.raises(ValueError, match="knn"):
        match_dataset(ds, None, MatcherSpec(kind="tfidf", cosine_method="knn"))


def test_minmax_normalize_empty(rd):
    import pyarrow as pa

    from raylink.pipeline import _minmax_normalize

    empty = rd.from_arrow(
        pa.table({"similarity": pa.array([], pa.float64())})
    )
    out = _minmax_normalize(empty, "similarity")
    assert out.count() == 0


def test_assign_clusters_distributed_int_conv_id(rd):
    """Non-string conv_id must survive the co-shuffle union (the cluster
    side's null conv_id column types from the ENTITY schema)."""
    import pyarrow as pa

    from raylink.flagship import assign_clusters_distributed

    ents = rd.from_arrow(pa.table({
        "conv_id": pa.array([1, 2, 3], pa.int64()),
        "entity_text": pa.array(["a", "b", "c"]),
        "block_key": pa.array(["x", "x", "x"]),
    }))
    cl = rd.from_arrow(pa.table({
        "block_key": pa.array(["x", "x"]),
        "member": pa.array(["a", "b"]),
        "representative": pa.array(["a", "a"]),
        "cluster_id": pa.array([0, 0], pa.int64()),
    }))
    out = assign_clusters_distributed(ents, cl).to_pandas().sort_values(
        "conv_id", ignore_index=True
    )
    assert out["group"].tolist() == ["a", "a", "c"]
    assert out["cluster_id"].tolist() == [0, 0, -1]
