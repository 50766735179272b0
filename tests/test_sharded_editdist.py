"""Sharded edit-distance matching == broadcast matching, byte-for-byte.

K4 completion for the edit-distance scorer family: the to-side sharded
path (forced via n_shards / a tiny max_broadcast_to_rows) must reproduce
the broadcast path's frames exactly — including the value-equal
self-exclusion (reference ``to_list.remove(query)``), the inclusive
score cutoff, and first-occurrence tie resolution across shard borders.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from raylink.pipeline import (
    MatcherSpec,
    dataset_with_row_order,
    match_dataset,
    match_dataset_sharded,
)


def _frames_equal(a, b):
    pa_ = a.to_pandas().sort_values("row_order").reset_index(drop=True)
    pb = b.to_pandas().sort_values("row_order").reset_index(drop=True)
    pd.testing.assert_frame_equal(pa_[sorted(pa_.columns)], pb[sorted(pb.columns)])


def _mk(rd, texts, blocks):
    tbl = pa.table(
        {"entity_text": pa.array(texts, type=pa.string()),
         "block_key": pa.array(blocks, type=pa.string())}
    )
    return dataset_with_row_order(
        rd.from_arrow(tbl), "entity_text", "block_key"
    )


@pytest.fixture(scope="module")
def ed_corpus(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(5)
    words = ["apple", "apples", "appl", "mouse", "house", "grape",
             "grap", "similarity", "recal", "a"]
    texts, blocks = [], []
    for i in range(60):
        texts.append(" ".join(rng.choice(words, size=rng.integers(1, 4))))
        blocks.append("xy"[i % 2])
    # duplicates (exercise the first-value-equal self-exclusion, incl.
    # copies that will land in DIFFERENT shards), empties, and a long row
    texts += ["apple", "apple", "apple", "", "zzz " * 10]
    blocks += ["x", "x", "y", "x", "y"]
    from_ds = _mk(rd, texts, blocks)
    to_texts = [t + s for t in words for s in ("", "s", " pie")]
    to_ds = _mk(rd, to_texts, ["x", "y"] * (len(to_texts) // 2) + ["x"] * (len(to_texts) % 2))
    return from_ds, to_ds


SPECS = [
    MatcherSpec(kind="rapidfuzz", score_cutoff=0.0),
    MatcherSpec(kind="rapidfuzz", score_cutoff=0.8),
    MatcherSpec(kind="rapidfuzz", scorer="levenshtein", score_cutoff=0.5),
    MatcherSpec(kind="editdistance"),
]


@pytest.mark.parametrize("spec_i", range(len(SPECS)))
def test_sharded_self_match_equals_broadcast(ed_corpus, spec_i):
    from_ds, _ = ed_corpus
    spec = SPECS[spec_i]
    b = match_dataset(from_ds, None, spec)
    s = match_dataset_sharded(from_ds, None, spec, n_shards=3)
    _frames_equal(b.matches, s.matches)


@pytest.mark.parametrize("spec_i", range(len(SPECS)))
def test_sharded_two_list_equals_broadcast(ed_corpus, spec_i):
    from_ds, to_ds = ed_corpus
    spec = SPECS[spec_i]
    b = match_dataset(from_ds, to_ds, spec)
    s = match_dataset_sharded(from_ds, to_ds, spec, n_shards=3)
    _frames_equal(b.matches, s.matches)


def test_auto_switch_fires_for_packed_scorers(ed_corpus):
    from_ds, _ = ed_corpus
    res = match_dataset(
        from_ds, None, MatcherSpec(kind="rapidfuzz"),
        max_broadcast_to_rows=10,
    )
    assert res.sharded_self
    b = match_dataset(from_ds, None, MatcherSpec(kind="rapidfuzz"))
    _frames_equal(b.matches, res.matches)


def test_custom_scorer_stays_broadcast_and_sharded_raises(ed_corpus):
    from_ds, _ = ed_corpus

    def myscorer(a, b):
        return 100.0 if a == b else 0.0

    spec = MatcherSpec(kind="rapidfuzz", scorer=myscorer)
    # auto-switch must NOT fire (documented broadcast bound), and the
    # explicit sharded call must refuse with a clear message
    res = match_dataset(from_ds, None, spec, max_broadcast_to_rows=10)
    assert not res.sharded_self
    with pytest.raises(ValueError, match="packed scorers"):
        match_dataset_sharded(from_ds, None, spec, n_shards=2)


def test_many_tiny_shards_degenerate(ed_corpus):
    """More shards than some blocks have rows: single-row shards, blocks
    absent from most shards — merge must still equal broadcast."""
    from_ds, _ = ed_corpus
    spec = MatcherSpec(kind="rapidfuzz", score_cutoff=0.7)
    b = match_dataset(from_ds, None, spec)
    s = match_dataset_sharded(from_ds, None, spec, n_shards=20)
    _frames_equal(b.matches, s.matches)
