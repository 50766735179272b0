"""Canonicalize stage, integrity validation, hot-key salting utilities,
multi-model compare."""

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


def test_canonicalize_extracts_mentions(rd):
    from raylink.blocking import canonicalize_transcripts
    from raylink.transcripts import generate_transcripts

    t, gt = generate_transcripts(40)
    ents = canonicalize_transcripts(rd.from_arrow(t)).to_pandas()
    gtd = gt.to_pandas()
    merged = ents.merge(gtd, on="conv_id")
    assert (merged["entity_text"] == merged["variant"]).all()
    assert (merged["block_key_x"] == merged["block_key_y"]).all()


def test_validate_conversations_clean_and_corrupted(rd):
    from raylink.blocking import validate_conversations
    from raylink.transcripts import generate_transcripts

    t, _ = generate_transcripts(30)
    ok = validate_conversations(rd.from_arrow(t))
    assert ok["n_violations"] == 0

    # corrupt: shift one conversation's turn indices (breaks contiguity)
    df = t.to_pandas()
    victim = df["conv_id"].iloc[0]
    df.loc[df.conv_id == victim, "turn_idx"] += 1
    bad = validate_conversations(rd.from_arrow(pa.Table.from_pandas(df)))
    assert bad["n_violations"] == 1


def test_fingerprint_detects_text_and_order_changes(rd):
    from raylink.blocking import validate_conversations
    from raylink.transcripts import generate_transcripts

    t, _ = generate_transcripts(20)
    base = validate_conversations(rd.from_arrow(t))
    df = t.to_pandas()
    # text change in one turn
    df2 = df.copy()
    df2.loc[df2.index[0], "text"] = df2.loc[df2.index[0], "text"] + "!"
    r2 = validate_conversations(rd.from_arrow(pa.Table.from_pandas(df2)))
    assert r2["fingerprint_xor"] != base["fingerprint_xor"]
    # swap two turns' texts within one conversation (same multiset of texts,
    # different order) -> fingerprint changes because turn_idx is mixed in
    df3 = df.copy()
    conv = df3["conv_id"].iloc[0]
    rows = df3.index[df3.conv_id == conv][:2]
    if len(rows) == 2:
        a, b = rows
        df3.loc[a, "text"], df3.loc[b, "text"] = df3.loc[b, "text"], df3.loc[a, "text"]
        r3 = validate_conversations(rd.from_arrow(pa.Table.from_pandas(df3)))
        if df.loc[a, "text"] != df.loc[b, "text"]:
            assert r3["fingerprint_xor"] != base["fingerprint_xor"]


def test_hot_key_salting(rd):
    from raylink.blocking import add_salt_column, hot_key_counts

    keys = ["hot"] * 900 + ["cold"] * 30
    ds = rd.from_arrow(
        pa.table({"block_key": pa.array(keys), "v": pa.array(range(930))})
    )
    hot = hot_key_counts(ds, "block_key", hot_threshold=100)
    assert "hot" in hot and hot["hot"] >= 2
    assert "cold" not in hot

    batch = pa.table({"block_key": pa.array(keys), "v": pa.array(range(930))})
    salted = add_salt_column(batch, "block_key", hot)
    sk = salted["salted_key"].to_pylist()
    hot_variants = {k for k in sk if k.startswith("hot#")}
    assert len(hot_variants) == hot["hot"]  # fan-out over n_salt reducers
    assert all(k == "cold" for k in sk if not k.startswith("hot#"))
    # salted groupby-count merges back to the true count (additive)
    ds2 = rd.from_arrow(salted)
    counts = ds2.groupby("salted_key").count().to_pandas()
    assert counts[counts.salted_key.str.startswith("hot#")]["count()"].sum() == 900


def test_match_many(rd, fixture_lists):
    from raylink.pipeline import MatcherSpec, entities_from_texts, match_many

    from_list, to_list = fixture_lists
    specs = [
        MatcherSpec(kind="tfidf", min_similarity=0, model_id="TF-IDF"),
        MatcherSpec(kind="tfidf", n_gram_range=(3, 6), min_similarity=0),
        MatcherSpec(kind="rapidfuzz"),
    ]
    out = match_many(
        rd.from_arrow(entities_from_texts(from_list)),
        rd.from_arrow(entities_from_texts(to_list)),
        specs,
    )
    assert len(out) == 3
    for mid, res in out.items():
        assert res.matches.count() == 6


def test_distributed_custom_scorer(rd, fixture_lists):
    """User-extension surface distributed: named and callable scorers ride
    inside MatcherSpec into the scoring tasks."""
    import pandas as pd

    from raylink import RapidFuzzMatcher
    from raylink.pipeline import MatcherSpec, entities_from_texts, match_dataset, matches_to_frame

    from_list, to_list = fixture_lists
    res = match_dataset(
        rd.from_arrow(entities_from_texts(from_list)),
        rd.from_arrow(entities_from_texts(to_list)),
        MatcherSpec(kind="rapidfuzz", scorer="token_sort_ratio"),
    )
    frame = matches_to_frame(res.matches, 1)
    oracle = RapidFuzzMatcher(scorer="token_sort_ratio").match(from_list, to_list)
    pd.testing.assert_frame_equal(frame, oracle)

    def jaccard_chars(a: str, b: str) -> float:
        sa, sb = set(a), set(b)
        return 100.0 * len(sa & sb) / max(1, len(sa | sb))

    res2 = match_dataset(
        rd.from_arrow(entities_from_texts(from_list)),
        rd.from_arrow(entities_from_texts(to_list)),
        MatcherSpec(kind="editdistance", scorer=jaccard_chars, normalize=False),
    )
    frame2 = matches_to_frame(res2.matches, 1)
    from raylink import EditDistanceMatcher

    oracle2 = EditDistanceMatcher(scorer=jaccard_chars, normalize=False).match(
        from_list, to_list
    )
    pd.testing.assert_frame_equal(frame2, oracle2)


def test_sorted_neighborhood_pairs(ray_session):
    import ray.data as rd

    from raylink.blocking import sorted_neighborhood_pairs

    rng = np.random.default_rng(3)
    n = 200
    keys = rng.integers(0, 50, n)
    ids = rng.permutation(n).astype(np.int64)
    tbl = pa.table({"k": pa.array(keys.astype(np.int64)), "doc_id": pa.array(ids)})
    ds = rd.from_arrow(tbl).repartition(5)
    w = 4
    got = sorted_neighborhood_pairs(ds, "k", "doc_id", window=w)
    # oracle: rank by (k, id); all pairs with 0 < rank_b - rank_a < w
    order = np.lexsort((ids, keys))
    sids = ids[order]
    want_a, want_b = [], []
    for d in range(1, w):
        want_a.append(sids[:-d] if d else sids)
        want_b.append(sids[d:])
    want = set(zip(np.concatenate(want_a).tolist(), np.concatenate(want_b).tolist()))
    got_set = set(zip(got["a"].tolist(), got["b"].tolist()))
    assert got_set == want
    assert len(got) == len(want)
    # dataset output agrees
    got_ds = sorted_neighborhood_pairs(ds, "k", "doc_id", window=w, output="dataset")
    assert set(zip(*[got_ds.to_pandas()[c].tolist() for c in ("a", "b")])) == want


def test_snm_pairs_tiny_blocks_complete(rd):
    """Blocks smaller than window-1 must still yield every sliding-window
    pair (multi-block head stitching)."""
    import pandas as pd

    from raylink.blocking import sorted_neighborhood_pairs

    n, window = 23, 6
    keys = np.arange(n, dtype=np.int64)
    tbl = pa.table({"k": pa.array(keys), "i": pa.array(keys)})
    want = {
        (int(a), int(a + d))
        for a in range(n)
        for d in range(1, window)
        if a + d < n
    }
    # extreme parallelism: blocks of ~1-2 rows each
    ds = rd.from_arrow(tbl).repartition(16)
    got = sorted_neighborhood_pairs(ds, "k", "i", window=window)
    assert set(zip(got["a"], got["b"])) == want
    assert len(got) == len(want)  # no duplicates either


def test_validator_catches_duplicate_turns(rd):
    """[0,0,3,3] passes min/max; the moment checks must flag it."""
    from raylink.blocking import validate_conversations

    tbl = pa.table(
        {
            "conv_id": pa.array(["c1"] * 4 + ["c2"] * 3),
            "turn_idx": pa.array([0, 0, 3, 3, 0, 1, 2], pa.int32()),
            "text": pa.array(["x"] * 7),
        }
    )
    out = validate_conversations(rd.from_arrow(tbl))
    assert out["n_conversations"] == 2
    assert out["n_violations"] == 1


def test_salt_default_fans_out_unlisted_keys(rd):
    from raylink.blocking import add_salt_column

    batch = pa.table({"k": pa.array(["a"] * 6)})
    out = add_salt_column(batch, "k", hot_keys={}, n_salt_default=3)
    assert sorted(set(out["salted_key"].to_pylist())) == ["a#0", "a#1", "a#2"]
    # default 1 leaves keys unsalted
    out1 = add_salt_column(batch, "k", hot_keys={})
    assert set(out1["salted_key"].to_pylist()) == {"a"}
