"""Property-based tests (hypothesis) for the rapidfuzz-free scorer family.

The edit-distance scorers are the one surface the driver can't SQL-oracle
(WRatio's partial-window DP family), so algebraic properties + batched-vs-
scalar equivalences carry the correctness argument alongside the golden
tests in test_editdist.py.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from raylink import editdist as ed

# small alphabet maximizes collisions/ties; spaces exercise tokenization
_txt = st.text(alphabet="ab d", max_size=18)
_SET = settings(max_examples=40, deadline=None)


@_SET
@given(_txt, _txt)
def test_ratio_symmetric_bounded(a, b):
    r = ed.ratio(a, b)
    assert 0.0 <= r <= 100.0
    assert r == ed.ratio(b, a)
    assert ed.ratio(a, a) == 100.0


@_SET
@given(_txt, _txt)
def test_levenshtein_metric_properties(a, b):
    d = ed.levenshtein_distance(a, b)
    assert d == ed.levenshtein_distance(b, a)
    assert (d == 0) == (a == b)
    # distance bounded by the longer length
    assert d <= max(len(a), len(b))


@_SET
@given(_txt, _txt, _txt)
def test_levenshtein_triangle_inequality(a, b, c):
    ab = ed.levenshtein_distance(a, b)
    bc = ed.levenshtein_distance(b, c)
    ac = ed.levenshtein_distance(a, c)
    assert ac <= ab + bc


@_SET
@given(_txt, _txt)
def test_partial_ratio_pairs_equals_scalar(a, b):
    got = ed.partial_ratio_pairs([(a, b), (b, a), (a, a)])
    want = np.array(
        [ed.partial_ratio(a, b), ed.partial_ratio(b, a), ed.partial_ratio(a, a)]
    )
    assert np.array_equal(got, want)


@_SET
@given(st.lists(_txt, min_size=1, max_size=8), _txt)
def test_wratio_packed_equals_scalar(to_list, q):
    ts = ed.WRatioToSide(to_list)
    packed = ed.wratio_one_to_many(q, ts)
    want = np.array([ed.WRatio(q, c) for c in to_list])
    assert np.allclose(packed, want, rtol=0, atol=1e-9)


@_SET
@given(st.lists(_txt, min_size=1, max_size=8), _txt)
def test_levenshtein_one_to_many_equals_scalar(to_list, q):
    packed = ed.PaddedStrings(to_list)
    got = ed.levenshtein_one_to_many(q, packed)
    # per-pair calls see a different padded width — catches padding bugs
    want = np.array([ed.levenshtein_distance(q, t) for t in to_list])
    assert np.array_equal(got, want)


@_SET
@given(_txt, _txt)
def test_token_sort_invariant_to_word_order(a, b):
    ra = ed.token_sort_ratio(a, b)
    a_shuf = " ".join(reversed(a.split()))
    assert ed.token_sort_ratio(a_shuf, b) == ra
