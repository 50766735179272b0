"""Seeded randomized differential testing: the distributed engine must
equal the single-node oracle frame-for-frame across random workloads —
duplicates, empties, unicode, many blocks, varying top_n."""

import numpy as np
import pandas as pd
import pytest

from raylink import PolyMatch, TFIDFMatcher
from raylink.linkage import single_linkage
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


WORDS = [
    "apple", "apples", "appl", "aple", "maple", "grape", "grapes", "graph",
    "house", "mouse", "horse", "hose", "rose", "nose", "note", "node",
    "Ünïcode Ltd", "unicode ltd", "", "   ", "42", "a", "zz top",
]


def _random_lists(seed: int, n_from: int, n_to: int):
    rng = np.random.default_rng(seed)
    froms = [WORDS[i] for i in rng.integers(0, len(WORDS), n_from)]
    tos = [WORDS[i] for i in rng.integers(0, len(WORDS), n_to)]
    return froms, tos


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_random_two_list_tfidf(rd, seed):
    froms, tos = _random_lists(seed, 20, 12)
    top_n = [1, 2, 3][seed % 3]
    res = match_dataset(
        rd.from_arrow(entities_from_texts(froms)),
        rd.from_arrow(entities_from_texts(tos)),
        MatcherSpec(min_similarity=0, top_n=top_n),
    )
    frame = matches_to_frame(res.matches, res.top_n_cols)
    oracle = PolyMatch("TF-IDF").match(froms, tos, top_n=top_n).get_matches()
    pd.testing.assert_frame_equal(frame, oracle)


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_random_self_match_and_group(rd, seed):
    froms, _ = _random_lists(seed, 25, 0)
    res = match_dataset(
        rd.from_arrow(entities_from_texts(froms)), None,
        MatcherSpec(min_similarity=0),
    )
    gr = group_matches(res, link_min_similarity=0.6, group_all_strings=True)
    frame = matches_to_frame(gr.grouped, 1)
    oracle = PolyMatch("TF-IDF").match(froms)
    oracle.group(link_min_similarity=0.6, group_all_strings=True)
    pd.testing.assert_frame_equal(frame, oracle.get_matches())
    cl = gr.clusters.to_pandas()
    got = {
        cid: grp["member"].tolist()
        for cid, grp in cl.groupby("cluster_id", sort=True)
    }
    assert got == oracle.get_clusters()


@pytest.mark.parametrize("seed", [21, 22])
def test_random_blocked_vs_per_block_oracle(rd, seed):
    rng = np.random.default_rng(seed)
    froms, _ = _random_lists(seed, 30, 0)
    blocks = [chr(97 + int(b)) for b in rng.integers(0, 3, len(froms))]
    res = match_dataset(
        rd.from_arrow(entities_from_texts(froms, blocks)), None,
        MatcherSpec(min_similarity=0),
    )
    frame = res.matches.to_pandas().sort_values("row_order").reset_index(drop=True)
    # oracle: run the local matcher independently per block on the block's
    # rows in input order
    df = pd.DataFrame({"f": froms, "b": blocks})
    for b, grp in df.groupby("b"):
        sub = TFIDFMatcher(min_similarity=0).match(grp["f"].tolist())
        ours = frame[frame["block_key"] == b]
        assert ours["from"].tolist() == sub["From"].tolist()
        got_to = [t if t is not None else None for t in ours["to"].tolist()]
        exp_to = [t if pd.notna(t) else None for t in sub["To"].tolist()]
        assert got_to == exp_to, (b, got_to, exp_to)
        np.testing.assert_allclose(
            ours["similarity"].to_numpy(), sub["Similarity"].to_numpy(), atol=0
        )


@pytest.mark.parametrize("seed", [31, 32, 33, 34])
def test_random_linkage_frames(seed):
    """Random matches frames through both linkage implementations."""
    rng = np.random.default_rng(seed)
    n = 40
    names = [f"s{i}" for i in range(12)]
    frame = pd.DataFrame(
        {
            "From": [names[i] for i in rng.integers(0, len(names), n)],
            "To": [names[i] for i in rng.integers(0, len(names), n)],
            "Similarity": np.round(rng.random(n), 3),
        }
    )
    from raylink.linkage import single_linkage_arrays

    for thr in [0.2, 0.5, 0.8]:
        clusters, mapping, namesmap = single_linkage(frame, thr)
        members, cids, reps = single_linkage_arrays(
            frame["From"].to_numpy(object),
            frame["To"].to_numpy(object),
            frame["Similarity"].to_numpy(),
            thr,
        )
        assert dict(zip(members.tolist(), cids.tolist())) == mapping
        assert dict(zip(members.tolist(), reps.tolist())) == namesmap


@pytest.mark.parametrize("seed", [31, 32, 33])
def test_random_sharded_equals_oracle(rd, seed):
    """The sharded path (forced tiny broadcast bound) must equal the
    single-node oracle on random workloads — duplicates, empties, unicode
    — for tfidf two-list AND self-match."""
    froms, tos = _random_lists(seed, 22, 15)
    top_n = [1, 2][seed % 2]
    # two-list sharded
    res = match_dataset(
        rd.from_arrow(entities_from_texts(froms)),
        rd.from_arrow(entities_from_texts(tos)),
        MatcherSpec(min_similarity=0, top_n=top_n),
        max_broadcast_to_rows=4,
    )
    frame = matches_to_frame(res.matches, res.top_n_cols)
    oracle = PolyMatch("TF-IDF").match(froms, tos, top_n=top_n).get_matches()
    pd.testing.assert_frame_equal(frame, oracle)
    # self-match sharded
    res2 = match_dataset(
        rd.from_arrow(entities_from_texts(froms)),
        None,
        MatcherSpec(min_similarity=0, top_n=top_n),
        max_broadcast_to_rows=4,
    )
    frame2 = matches_to_frame(res2.matches, res2.top_n_cols)
    oracle2 = PolyMatch("TF-IDF").match(froms, top_n=top_n).get_matches()
    pd.testing.assert_frame_equal(frame2, oracle2)
