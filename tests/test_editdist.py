import numpy as np
import pytest

from raylink import editdist as ed


def slow_lcs(a, b):
    dp = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            dp[i][j] = max(
                dp[i - 1][j],
                dp[i][j - 1],
                dp[i - 1][j - 1] + (a[i - 1] == b[j - 1]),
            )
    return dp[-1][-1]


def test_lcs_against_slow_dp():
    rng = np.random.default_rng(3)
    for _ in range(50):
        a = "".join(rng.choice(list("abcd"), size=rng.integers(0, 12)))
        b = "".join(rng.choice(list("abcd"), size=rng.integers(1, 12)))
        assert ed.lcs_pair(a, b) == slow_lcs(a, b), (a, b)


def test_lcs_one_to_many_matches_pairwise():
    tos = ["apple", "apples", "mouse", "", "similarity"]
    packed = ed.PaddedStrings(tos)
    got = ed.lcs_one_to_many("house", packed)
    assert got.tolist() == [slow_lcs("house", t) for t in tos]


def test_ratio_goldens():
    assert ed.ratio("apple", "apple") == 100.0
    assert abs(ed.ratio("apple", "apples") - 200 * 5 / 11) < 1e-12
    assert abs(ed.ratio("house", "mouse") - 80.0) < 1e-12
    assert ed.ratio("", "") == 100.0
    assert ed.ratio("a", "") == 0.0


def test_partial_ratio():
    assert ed.partial_ratio("appl", "apples") == 100.0
    assert ed.partial_ratio("abc", "xxabcxx") == 100.0
    assert ed.partial_ratio("abc", "abc") == 100.0
    assert ed.partial_ratio("axc", "xxabcxx") < 100.0


def test_token_sort_and_set():
    assert ed.token_sort_ratio("world hello", "hello world") == 100.0
    assert ed.token_set_ratio("big apple pie", "pie apple") == 100.0
    assert ed.token_ratio("a b", "b a") == 100.0


def test_wratio_properties(fixture_lists):
    from_list, to_list = fixture_lists
    # identity
    for s in from_list:
        assert ed.WRatio(s, s) == 100.0
    # known pairs (rapidfuzz-compatible paths)
    assert abs(ed.WRatio("house", "mouse") - 80.0) < 1e-9
    # appl vs apples: len ratio 1.5 -> partial path, substring hit * 0.9
    assert abs(ed.WRatio("appl", "apples") - 90.0) < 1e-9
    assert ed.WRatio("", "anything") == 0.0


def test_default_process():
    assert ed.default_process("Hello, World!") == "hello  world"
    assert ed.default_process("  ABC-12  ") == "abc 12"


def test_extract_one_cutoff_and_ties():
    choices = ["aaa", "aab", "aaa"]
    got = ed.extract_one("aaa", choices, scorer=ed.ratio)
    assert got == ("aaa", 100.0)  # first of the tied pair
    assert ed.extract_one("zzz", ["aaa"], score_cutoff=50, scorer=ed.ratio) is None
    # score equal to cutoff is accepted (rapidfuzz >= semantics)
    got = ed.extract_one("ab", ["ax"], score_cutoff=50, scorer=ed.ratio)
    assert got == ("ax", 50.0)


def test_resolve_scorer():
    assert ed.resolve_scorer("WRatio") is ed.WRatio
    assert ed.resolve_scorer(ed.ratio) is ed.ratio
    with pytest.raises(ValueError):
        ed.resolve_scorer("nope")


def test_wratio_one_to_many_equals_pairwise():
    import numpy as np

    from raylink.editdist import (
        WRatio,
        WRatioToSide,
        extract_one,
        extract_one_packed,
        wratio_one_to_many,
    )

    rng = np.random.default_rng(21)
    words = ["apple", "grape", "mouse", "house", "similarity", "recal", "a"]
    to_list = []
    for _ in range(40):
        n = rng.integers(1, 5)
        to_list.append(" ".join(rng.choice(words, size=n)))
    to_list += ["", "   ", "apple apple", "x" * 30]  # edge cases
    ts = WRatioToSide(to_list)
    queries = [" ".join(rng.choice(words, size=rng.integers(1, 6))) for _ in range(25)]
    queries += ["apple", "", "x" * 25, "apple grape mouse house similarity"]
    for q in queries:
        packed = wratio_one_to_many(q, ts)
        pair = np.array([WRatio(q, c) for c in to_list])
        assert np.allclose(packed, pair), q
        # extract semantics: packed first-max == reference scan
        ref = extract_one(q, to_list, score_cutoff=0.0, scorer=WRatio)
        got = extract_one_packed(q, ts, score_cutoff=0.0)
        if ref is None:
            assert got is None
        else:
            assert got is not None
            assert ts.orig[got[0]] == ref[0] or pair[got[0]] == ref[1]
            assert got[1] == ref[1]
        # cutoff semantics
        ref_c = extract_one(q, to_list, score_cutoff=80.0, scorer=WRatio)
        got_c = extract_one_packed(q, ts, score_cutoff=80.0)
        assert (ref_c is None) == (got_c is None)
        if ref_c is not None:
            assert got_c[1] == ref_c[1]


def test_levenshtein_one_to_many_matches_naive_dp():
    from raylink.editdist import (
        PaddedStrings,
        levenshtein_distance,
        levenshtein_one_to_many,
        levenshtein_sim,
        levenshtein_sim_one_to_many,
    )

    def naive(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    rng = np.random.default_rng(7)
    alphabet = list("abcde ")
    to_list = [
        "".join(rng.choice(alphabet, size=rng.integers(0, 12)))
        for _ in range(30)
    ] + ["", "abc", "abcabcabc"]
    packed = PaddedStrings(to_list)
    for q in ["", "abc", "edcba", "aa bb cc", "abcde" * 3]:
        got = levenshtein_one_to_many(q, packed)
        want = np.array([naive(q, t) for t in to_list])
        assert np.array_equal(got, want), q
        sims = levenshtein_sim_one_to_many(q, packed)
        pair = np.array([levenshtein_sim(q, t) for t in to_list])
        assert np.array_equal(sims, pair), q
    assert levenshtein_distance("kitten", "sitting") == 3
    assert levenshtein_sim("", "") == 100.0


def test_levenshtein_scorer_registered():
    from raylink.editdist import SCORERS, levenshtein_sim, resolve_scorer

    assert resolve_scorer("levenshtein") is levenshtein_sim
    assert "levenshtein" in SCORERS


def test_partial_ratio_pairs_matches_scalar():
    rng = np.random.default_rng(11)
    alpha = list("abcde ")
    pairs = []
    for _ in range(60):
        a = "".join(rng.choice(alpha, size=rng.integers(0, 15))).strip()
        b = "".join(rng.choice(alpha, size=rng.integers(0, 40))).strip()
        pairs.append((a, b))
    # deterministic edge cases: both empty, one empty, equal lengths,
    # identical strings, single chars
    pairs += [("", ""), ("", "abc"), ("abc", ""), ("abc", "abc"),
              ("abc", "cba"), ("a", "b"), ("a", "a"), ("ab", "ba")]
    got = ed.partial_ratio_pairs(pairs)
    want = np.array([ed.partial_ratio(a, b) for a, b in pairs])
    assert np.array_equal(got, want), [
        (p, g, w) for p, g, w in zip(pairs, got, want) if g != w
    ]


def slow_lev(a, b):
    prev = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        cur = [i] + [0] * len(b)
        for j in range(1, len(b) + 1):
            cur[j] = min(prev[j - 1] + (a[i - 1] != b[j - 1]),
                         prev[j] + 1, cur[j - 1] + 1)
        prev = cur
    return prev[-1]


def test_levenshtein_myers_matches_slow_dp():
    rng = np.random.default_rng(17)
    alpha = list("abcd")
    for _ in range(25):
        qlen = int(rng.integers(0, 65))
        q = "".join(rng.choice(alpha, size=qlen))
        tos = ["".join(rng.choice(alpha, size=rng.integers(0, 30))) for _ in range(20)]
        tos += ["", q, q[: max(0, qlen // 2)]]
        packed = ed.PaddedStrings(tos)
        got = ed.levenshtein_one_to_many(q, packed)
        want = np.array([slow_lev(q, t) for t in tos])
        assert np.array_equal(got, want), (q, tos)
    # word-boundary lengths: 63/64 ride the bit-parallel path, 65+ the
    # classic DP fallback — all must agree with the scalar DP
    for qlen in (1, 63, 64, 65, 80):
        q = "".join(rng.choice(alpha, size=qlen))
        tos = ["".join(rng.choice(alpha, size=rng.integers(0, 100))) for _ in range(12)]
        packed = ed.PaddedStrings(tos)
        got = ed.levenshtein_one_to_many(q, packed)
        want = np.array([slow_lev(q, t) for t in tos])
        assert np.array_equal(got, want), qlen


def test_partial_ratio_pairs_single_oversized_pair_chunked():
    """A single pair whose window matrix alone exceeds the cell budget is
    processed in window-row chunks — exact vs the scalar partial_ratio and
    vs the unchunked batched path (ADVICE r2)."""
    import numpy as np

    from raylink.editdist import partial_ratio, partial_ratio_pairs

    rng = np.random.default_rng(3)
    long = "".join(rng.choice(list("abcdefg "), size=3000))
    short = "".join(rng.choice(list("abcdefg "), size=400))
    pairs = [(short, long), ("abc", "zabcy")]
    # window matrix of pair 0 is ~2600x400 = 1.04M cells > budget 50k
    chunked = partial_ratio_pairs(pairs, cell_budget=50_000)
    full = partial_ratio_pairs(pairs)
    np.testing.assert_allclose(chunked, full)
    np.testing.assert_allclose(
        chunked, [partial_ratio(a, b) for a, b in pairs]
    )
