"""rapidfuzz-free edit-distance scorer family.

The reference delegates to rapidfuzz's C++ scorers (fuzz.WRatio default for
``RapidFuzz.match``, polyfuzz/models/_rapidfuzz.py:48; fuzz.ratio default
for ``EditDistance``, polyfuzz/models/_distance.py:32; the documented option
list is polyfuzz/models/_rapidfuzz.py:23-35). rapidfuzz is not installed
here, so the scorers are re-derived from their published algorithms
(rapidfuzz / fuzzywuzzy semantics):

  * ``ratio``              — normalized InDel similarity 100*2*LCS/(l1+l2)
  * ``partial_ratio``      — best ``ratio`` over all length-|shorter|
                             windows of the longer string
  * ``token_sort_ratio``   — ratio over space-sorted token strings
  * ``token_set_ratio``    — fuzzywuzzy set construction, max of 3 ratios
  * ``partial_token_*``    — same with partial_ratio
  * ``WRatio``             — fuzzywuzzy weighted composite (0.95 unbase
                             scale, partial path for length ratio >= 1.5,
                             0.9 / 0.6 partial scale at length ratio 8)
  * ``QRatio``             — processed ratio

All scorers return floats in [0, 100] like rapidfuzz. ``default_process``
replaces non-word chars with spaces, lowercases and trims (rapidfuzz
``utils.default_process``).

The LCS core is a vectorized one-vs-many numpy DP: per character of the
query we update a whole (n_to x max_len) DP slab, so scoring one string
against a to-list of hundreds costs len(query) numpy ops, not a Python
loop per pair.
"""

from __future__ import annotations

import re

import numpy as np

_WORD_RE = re.compile(r"(?u)\W")


def default_process(s: str) -> str:
    """rapidfuzz ``utils.default_process``: non-alphanumeric -> space,
    lowercase, trim (internal runs of spaces are kept)."""
    return _WORD_RE.sub(" ", s.lower()).strip()


# ---------------------------------------------------------------------------
# LCS core
# ---------------------------------------------------------------------------


def _codes(s: str) -> np.ndarray:
    return np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)


class PaddedStrings:
    """A to-list packed into a padded codepoint matrix for one-vs-many DP.

    Padding value -1 never equals a real codepoint, so padded cells never
    match and the DP result at column ``lens[i]`` is exact per string.
    """

    __slots__ = ("mat", "lens")

    def __init__(self, strings: list[str]):
        lens = np.array([len(s) for s in strings], dtype=np.int64)
        width = int(lens.max()) if len(lens) else 0
        mat = np.full((len(strings), width), -1, dtype=np.int64)
        for i, s in enumerate(strings):
            if s:
                mat[i, : len(s)] = _codes(s)
        self.mat = mat
        self.lens = lens


    def __getstate__(self):
        return {k: getattr(self, k) for k in self.__slots__}

    def __setstate__(self, state):
        for k, v in state.items():
            setattr(self, k, v)


def lcs_one_to_many(query: str, packed: PaddedStrings) -> np.ndarray:
    """LCS length of ``query`` vs every packed string (vectorized DP).

    Row recurrence L[i][j] = max(L[i-1][j], L[i][j-1], L[i-1][j-1]+eq)
    collapses to a prefix-maximum: tmp = max(prev[1:], prev[:-1]+eq);
    cur = cummax(tmp) — one accumulate per query character.
    """
    n_to, width = packed.mat.shape
    if width == 0 or not query:
        return np.zeros(n_to, dtype=np.int64)
    q = _codes(query)
    prev = np.zeros((n_to, width + 1), dtype=np.int64)
    cur = np.zeros_like(prev)
    for ch in q:
        eq = packed.mat == ch
        np.maximum(prev[:, 1:], prev[:, :-1] + eq, out=cur[:, 1:])
        np.maximum.accumulate(cur[:, 1:], axis=1, out=cur[:, 1:])
        prev, cur = cur, prev
    return prev[np.arange(n_to), packed.lens]


def lcs_pair(s1: str, s2: str) -> int:
    return int(lcs_one_to_many(s1, PaddedStrings([s2]))[0])


def ratio(s1: str, s2: str) -> float:
    """fuzz.ratio: 100 * (1 - indel_dist/(l1+l2)) = 100*2*LCS/(l1+l2);
    two empty strings -> 100 (rapidfuzz convention)."""
    t = len(s1) + len(s2)
    if t == 0:
        return 100.0
    return 200.0 * lcs_pair(s1, s2) / t


def ratio_one_to_many(query: str, packed: PaddedStrings) -> np.ndarray:
    t = packed.lens + len(query)
    lcs = lcs_one_to_many(query, packed)
    out = np.where(t == 0, 100.0, 200.0 * lcs / np.maximum(t, 1))
    return out


def partial_ratio(s1: str, s2: str) -> float:
    """Best ``ratio`` of the shorter string vs every full-length window of
    the longer one (brute-force sliding windows, vectorized via the
    one-vs-many DP over the window matrix)."""
    if len(s1) > len(s2):
        s1, s2 = s2, s1
    if not s1:
        return 100.0 if not s2 else 0.0
    if len(s1) == len(s2):
        return ratio(s1, s2)
    c2 = _codes(s2)
    win = np.lib.stride_tricks.sliding_window_view(c2, len(s1))
    packed = PaddedStrings.__new__(PaddedStrings)
    packed.mat = win
    packed.lens = np.full(win.shape[0], len(s1), dtype=np.int64)
    lcs = lcs_one_to_many(s1, packed)
    return float(200.0 * lcs.max() / (2 * len(s1)))


def _token_sort(s: str) -> str:
    return " ".join(sorted(s.split()))


def token_sort_ratio(s1: str, s2: str) -> float:
    return ratio(_token_sort(s1), _token_sort(s2))


def partial_token_sort_ratio(s1: str, s2: str) -> float:
    return partial_ratio(_token_sort(s1), _token_sort(s2))


def _token_set_parts(s1: str, s2: str) -> tuple[str, str, str]:
    # one copy of the munging (shared with the packed branches) — the
    # string and set entry points must never drift
    return _token_set_parts_sets(set(s1.split()), set(s2.split()))


def token_set_ratio(s1: str, s2: str) -> float:
    inter, c1, c2 = _token_set_parts(s1, s2)
    return max(ratio(inter, c1), ratio(inter, c2), ratio(c1, c2))


def partial_token_set_ratio(s1: str, s2: str) -> float:
    inter, c1, c2 = _token_set_parts(s1, s2)
    return max(partial_ratio(inter, c1), partial_ratio(inter, c2), partial_ratio(c1, c2))


def token_ratio(s1: str, s2: str) -> float:
    return max(token_sort_ratio(s1, s2), token_set_ratio(s1, s2))


def partial_token_ratio(s1: str, s2: str) -> float:
    return max(partial_token_sort_ratio(s1, s2), partial_token_set_ratio(s1, s2))


def QRatio(s1: str, s2: str) -> float:
    return ratio(default_process(s1), default_process(s2))


def WRatio(s1: str, s2: str) -> float:
    """fuzzywuzzy/rapidfuzz weighted composite over processed strings."""
    p1, p2 = default_process(s1), default_process(s2)
    l1, l2 = len(p1), len(p2)
    if l1 == 0 or l2 == 0:
        return 0.0
    base = ratio(p1, p2)
    unbase_scale = 0.95
    len_ratio = max(l1, l2) / min(l1, l2)
    if len_ratio < 1.5:
        return max(
            base,
            token_sort_ratio(p1, p2) * unbase_scale,
            token_set_ratio(p1, p2) * unbase_scale,
        )
    partial_scale = 0.9 if len_ratio < 8 else 0.6
    return max(
        base,
        partial_ratio(p1, p2) * partial_scale,
        partial_token_sort_ratio(p1, p2) * unbase_scale * partial_scale,
        partial_token_set_ratio(p1, p2) * unbase_scale * partial_scale,
    )


class WRatioToSide:
    """Per-block to-side state for the packed one-vs-many WRatio: processed
    forms, their padded codepoint matrices (base + token-sorted), and token
    sets — built once per block (actor-state pattern), reused per query."""

    __slots__ = ("orig", "proc", "lens", "packed_proc", "packed_tsort",
                 "token_sets", "tsort")

    def __init__(self, strings: list[str]):
        self.orig = list(strings)
        self.proc = [default_process(s) for s in self.orig]
        self.lens = np.array([len(p) for p in self.proc], dtype=np.int64)
        self.tsort = [_token_sort(p) for p in self.proc]
        self.packed_proc = PaddedStrings(self.proc)
        self.packed_tsort = PaddedStrings(self.tsort)
        self.token_sets = [set(p.split()) for p in self.proc]


    def __getstate__(self):
        return {k: getattr(self, k) for k in self.__slots__}

    def __setstate__(self, state):
        for k, v in state.items():
            setattr(self, k, v)


def _token_set_parts_sets(t1: set, t2: set) -> tuple[str, str, str]:
    """fuzzywuzzy token_set construction from pre-split token SETS — the
    one copy of the inter/c1/c2 munging shared by both packed branches."""
    inter = " ".join(sorted(t1 & t2))
    d1 = " ".join(sorted(t1 - t2))
    d2 = " ".join(sorted(t2 - t1))
    c1 = (inter + " " + d1).strip()
    c2 = (inter + " " + d2).strip()
    return inter, c1, c2


def partial_ratio_pairs(
    pairs: list[tuple[str, str]], cell_budget: int = 16_000_000
) -> np.ndarray:
    """``partial_ratio`` for a LIST of string pairs in one batched DP.

    Every pair contributes its (shorter, window-of-longer) rows to a single
    ragged row-wise LCS (:func:`lcs_rowwise`); per-pair results are
    segment-maxima over the window rows. Numerically identical to calling
    :func:`partial_ratio` per pair — this is what batches the WRatio long
    branch (length ratio >= 1.5), the scoring family's last per-pair DP.

    Peak memory is bounded: pairs are processed in slices whose padded
    matrix stays under ``cell_budget`` cells (~0.5 GiB of slabs at the
    default), so a batch of very long strings degrades to smaller batches
    instead of one giant allocation. Chunking is exact — per-pair maxima
    are independent.
    """
    n = len(pairs)
    out = np.zeros(n, dtype=np.float64)
    blk_q: list[np.ndarray] = []  # shorter-string codes, one per live pair
    blk_t: list[np.ndarray] = []  # (n_windows, len_short) window matrix
    blk_pair: list[int] = []
    for j, (a, b) in enumerate(pairs):
        if len(a) > len(b):
            a, b = b, a
        if not a:
            out[j] = 100.0 if not b else 0.0
            continue
        ca, cb = _codes(a), _codes(b)
        blk_q.append(ca)
        blk_t.append(np.lib.stride_tricks.sliding_window_view(cb, len(a)))
        blk_pair.append(j)
    if not blk_pair:
        return out
    # slice the block list so each padded matrix stays under cell_budget
    lo = 0
    while lo < len(blk_pair):
        nw0, la0 = blk_t[lo].shape
        if nw0 * la0 > cell_budget:
            # a SINGLE pair whose window matrix alone exceeds the budget
            # (one very long string vs a long-ish shorter one): chunk its
            # window ROWS — per-pair maxima are independent across window
            # rows, so row chunking is exact (ADVICE r2)
            j = blk_pair[lo]
            ca = blk_q[lo]
            step = max(1, cell_budget // la0)
            for r0 in range(0, nw0, step):
                win = blk_t[lo][r0 : r0 + step]
                qp = PaddedStrings.__new__(PaddedStrings)
                qp.mat = np.broadcast_to(ca, win.shape).copy()
                qp.lens = np.full(len(win), la0, dtype=np.int64)
                tp = PaddedStrings.__new__(PaddedStrings)
                tp.mat = np.ascontiguousarray(win)
                tp.lens = qp.lens
                lcs = lcs_rowwise(qp, tp)
                out[j] = max(out[j], float((200.0 * lcs / (2 * la0)).max()))
            lo += 1
            continue
        hi, rows, width = lo, 0, 0
        while hi < len(blk_pair):
            nw, la = blk_t[hi].shape
            new_w = max(width, la)
            if hi > lo and (rows + nw) * new_w > cell_budget:
                break
            rows, width = rows + nw, new_w
            hi += 1
        mat_q = np.full((rows, width), -1, dtype=np.int64)
        mat_t = np.full((rows, width), -1, dtype=np.int64)
        lens = np.empty(rows, dtype=np.int64)
        rp = np.empty(rows, dtype=np.int64)
        r = 0
        for ca, win, j in zip(blk_q[lo:hi], blk_t[lo:hi], blk_pair[lo:hi]):
            nw, la = win.shape
            mat_q[r : r + nw, :la] = ca
            mat_t[r : r + nw, :la] = win
            lens[r : r + nw] = la
            rp[r : r + nw] = j
            r += nw
        qp = PaddedStrings.__new__(PaddedStrings)
        qp.mat = mat_q
        qp.lens = lens
        tp = PaddedStrings.__new__(PaddedStrings)
        tp.mat = mat_t
        tp.lens = lens
        lcs = lcs_rowwise(qp, tp)
        ratios = 200.0 * lcs / (2 * lens)
        starts = np.flatnonzero(np.r_[True, rp[1:] != rp[:-1]])
        np.maximum.at(out, rp[starts], np.maximum.reduceat(ratios, starts))
        lo = hi
    return out


def lcs_rowwise(qp: PaddedStrings, tp: PaddedStrings) -> np.ndarray:
    """LCS of row i of ``qp`` vs row i of ``tp`` for every i — the batched
    pairwise DP (one numpy update per query COLUMN, not per pair). Rows
    whose query is exhausted (pad -1) carry their state forward."""
    n, wq = qp.mat.shape
    _, wt = tp.mat.shape
    if n == 0 or wq == 0 or wt == 0:
        return np.zeros(n, dtype=np.int64)
    prev = np.zeros((n, wt + 1), dtype=np.int64)
    cur = np.zeros_like(prev)
    for qi in range(wq):
        ch = qp.mat[:, qi]
        active = ch >= 0
        if not active.any():
            break
        eq = tp.mat == ch[:, None]
        np.maximum(prev[:, 1:], prev[:, :-1] + eq, out=cur[:, 1:])
        np.maximum.accumulate(cur[:, 1:], axis=1, out=cur[:, 1:])
        cur[~active] = prev[~active]
        prev, cur = cur, prev
    return prev[np.arange(n), tp.lens]


def wratio_one_to_many(query: str, ts: WRatioToSide) -> np.ndarray:
    """WRatio of ``query`` vs every to-side string, numerically identical
    to per-pair :func:`WRatio`, with every DP batched:

      * base ratio + token_sort ratio: packed one-vs-many DPs;
      * token_set (short branch): ratio(inter, c1) and ratio(inter, c2)
        collapse to closed forms (inter is a PREFIX of both combined
        strings, so LCS = len(inter)); the remaining ratio(c1, c2) runs as
        ONE row-wise batched DP over all short pairs;
      * only the rare long branch (length ratio >= 1.5: the partial_*
        family) stays per pair.
    """
    n = len(ts.orig)
    out = np.zeros(n, dtype=np.float64)
    p1 = default_process(query)
    l1 = len(p1)
    if l1 == 0 or n == 0:
        return out
    base = ratio_one_to_many(p1, ts.packed_proc)
    tsort = ratio_one_to_many(_token_sort(p1), ts.packed_tsort)
    lens = ts.lens
    valid = lens > 0
    len_ratio = np.maximum(l1, lens) / np.maximum(np.minimum(l1, lens), 1)
    t1 = set(p1.split())
    unbase = 0.95
    short_i = np.flatnonzero(valid & (len_ratio < 1.5))
    if len(short_i):
        c1s: list[str] = []
        c2s: list[str] = []
        li_arr = np.empty(len(short_i), dtype=np.int64)
        for k, i in enumerate(short_i):
            inter, c1, c2 = _token_set_parts_sets(t1, ts.token_sets[i])
            c1s.append(c1)
            c2s.append(c2)
            li_arr[k] = len(inter)
        lc1 = np.array([len(c) for c in c1s], dtype=np.int64)
        lc2 = np.array([len(c) for c in c2s], dtype=np.int64)
        # closed forms: inter is a prefix of c1/c2 -> LCS == len(inter)
        with np.errstate(invalid="ignore"):
            r_i1 = np.where(li_arr + lc1 == 0, 100.0,
                            200.0 * li_arr / np.maximum(li_arr + lc1, 1))
            r_i2 = np.where(li_arr + lc2 == 0, 100.0,
                            200.0 * li_arr / np.maximum(li_arr + lc2, 1))
        lcs12 = lcs_rowwise(PaddedStrings(c1s), PaddedStrings(c2s))
        r_12 = np.where(lc1 + lc2 == 0, 100.0,
                        200.0 * lcs12 / np.maximum(lc1 + lc2, 1))
        tset = np.maximum(np.maximum(r_i1, r_i2), r_12)
        out[short_i] = np.maximum(
            base[short_i],
            np.maximum(tsort[short_i], tset) * unbase,
        )
    long_i = np.flatnonzero(valid & (len_ratio >= 1.5))
    if len(long_i):
        # batched long branch: the base and token_sort partial_ratios of
        # every long pair ride ONE row-wise window DP (partial_ratio_pairs).
        # The three token_set combinations are closed-form except one case:
        # inter is a PREFIX of both combined strings, so when inter is
        # nonempty partial_ratio(inter, c1) == partial_ratio(inter, c2)
        # == 100 exactly (200*L/(2*L)), which caps tset_part at 100 and
        # makes the (c1, c2) DP moot; when inter is empty those two are 0
        # (c1/c2 nonempty since both token sets are) and only the (c1, c2)
        # window DP remains. Numerically identical to the per-pair
        # composition — partial_ratio returns exactly 100.0 on the prefix
        # hit, and every ratio is <= 100.
        ts1 = _token_sort(p1)
        pair_list: list[tuple[str, str]] = []
        tset_part = np.empty(len(long_i), dtype=np.float64)
        extra_pairs: list[tuple[str, str]] = []
        extra_owner: list[int] = []
        for k, i in enumerate(long_i):
            inter, c1, c2 = _token_set_parts_sets(t1, ts.token_sets[i])
            pair_list.append((p1, ts.proc[i]))
            pair_list.append((ts1, ts.tsort[i]))
            if inter:
                tset_part[k] = 100.0
            else:
                tset_part[k] = 0.0  # overwritten from the (c1, c2) DP
                extra_pairs.append((c1, c2))
                extra_owner.append(k)
        pr = partial_ratio_pairs(pair_list).reshape(len(long_i), 2)
        if extra_pairs:
            tset_part[np.asarray(extra_owner)] = partial_ratio_pairs(extra_pairs)
        ps = np.where(len_ratio[long_i] < 8, 0.9, 0.6)
        out[long_i] = np.maximum(
            base[long_i],
            np.maximum(
                pr[:, 0] * ps,
                np.maximum(pr[:, 1], tset_part) * unbase * ps,
            ),
        )
    return out


def extract_one_packed(
    query: str,
    ts: WRatioToSide,
    score_cutoff: float = 0.0,
    exclude_first_equal: str | None = None,
) -> tuple[int, float] | None:
    """Packed ``extractOne``: first-max over the WRatio score vector
    (np.argmax's first-occurrence rule = the reference's tie-to-first
    scan). ``exclude_first_equal`` reproduces self-match's
    ``to_list.remove(query)`` — mask ONLY the first value-equal entry.
    Returns (to index, score) or None below the cutoff."""
    scores = wratio_one_to_many(query, ts)
    if exclude_first_equal is not None:
        for j, s in enumerate(ts.orig):
            if s == exclude_first_equal:
                scores = scores.copy()
                scores[j] = -np.inf
                break
    if not len(scores):
        return None
    j = int(np.argmax(scores))
    if scores[j] < score_cutoff or scores[j] == -np.inf:
        return None
    return j, float(scores[j])


def levenshtein_one_to_many(query: str, packed: PaddedStrings) -> np.ndarray:
    """Plain Levenshtein distance of ``query`` vs every packed string.

    Queries up to 64 chars take the Myers bit-parallel path
    (:func:`_levenshtein_myers`): the whole query lives in one uint64
    bitvector per to-string, so cost is O(width) vector ops over the
    to-side — independent of query length. Longer queries fall back to
    the classic column DP, O(len(query) x width) vector ops. Both are
    integer-exact; padded cells (code -1) never match, and the per-string
    distance is read at column ``lens[i]``.
    """
    n_to, width = packed.mat.shape
    if n_to == 0:
        return np.zeros(0, dtype=np.int64)
    if not query:
        return packed.lens.copy()
    q = _codes(query)
    if width == 0:
        return np.full(n_to, len(q), dtype=np.int64)
    if len(q) <= 64:
        return _levenshtein_myers(q, packed)
    prev = np.tile(np.arange(width + 1, dtype=np.int64), (n_to, 1))
    cur = np.empty_like(prev)
    tmp = np.empty(n_to, dtype=np.int64)
    for i, ch in enumerate(q, start=1):
        cur[:, 0] = i
        neq = packed.mat != ch
        for j in range(width):
            # substitute/match, delete-from-query, insert-into-query
            np.minimum(prev[:, j] + neq[:, j], prev[:, j + 1] + 1, out=tmp)
            np.minimum(tmp, cur[:, j] + 1, out=cur[:, j + 1])
        prev, cur = cur, prev
    return prev[np.arange(n_to), packed.lens]


def _levenshtein_myers(q: np.ndarray, packed: PaddedStrings) -> np.ndarray:
    """Myers/Hyyrö bit-parallel Levenshtein of a <=64-char query vs every
    packed string at once. VP/VN are (n_to,) uint64 vectors; per target
    column one gather (sorted-unique searchsorted maps codes to query
    match masks) plus ~10 bitwise vector ops replace a whole column sweep
    of the classic DP. Each row's running score is captured at its own
    length; later (padded or longer) columns can't disturb it."""
    n_to, width = packed.mat.shape
    m = len(q)
    # Peq: match bitmask per distinct query char, dense-indexed via
    # searchsorted over the sorted unique codes; sentinel slot 0 = "no
    # match" for codes not in the query (incl. the -1 pad).
    uniq, inv = np.unique(q, return_inverse=True)
    peq = np.zeros(len(uniq) + 1, dtype=np.uint64)
    np.bitwise_or.at(peq, inv + 1, np.uint64(1) << np.arange(m, dtype=np.uint64))
    idx = np.searchsorted(uniq, packed.mat)  # (n_to, width)
    hit = (idx < len(uniq)) & (uniq[np.minimum(idx, len(uniq) - 1)] == packed.mat)
    dense = np.where(hit, idx + 1, 0)
    full = np.uint64((1 << m) - 1) if m < 64 else np.uint64(0xFFFFFFFFFFFFFFFF)
    high = np.uint64(1) << np.uint64(m - 1)
    one = np.uint64(1)
    vp = np.full(n_to, full, dtype=np.uint64)
    vn = np.zeros(n_to, dtype=np.uint64)
    score = np.full(n_to, m, dtype=np.int64)
    out = np.full(n_to, m, dtype=np.int64)  # rows with lens == 0
    lens = packed.lens
    for j in range(width):
        pm = peq[dense[:, j]]
        d0 = (((pm & vp) + vp) ^ vp) | pm | vn
        hp = vn | ~(d0 | vp)
        hn = d0 & vp
        score += ((hp & high) != 0).astype(np.int64)
        score -= ((hn & high) != 0).astype(np.int64)
        hp = ((hp << one) | one) & full
        hn = (hn << one) & full
        vp = (hn | ~(d0 | hp)) & full
        vn = d0 & hp
        done = lens == j + 1
        if done.any():
            out[done] = score[done]
    return out


def levenshtein_distance(s1: str, s2: str) -> int:
    return int(levenshtein_one_to_many(s1, PaddedStrings([s2]))[0])


def levenshtein_sim(s1: str, s2: str) -> float:
    """Normalized Levenshtein similarity on the rapidfuzz 0-100 scale:
    100 * (1 - dist / max(len1, len2)); two empty strings -> 100. The
    division sequence is mirrored verbatim by the DuckDB oracle
    (levenshtein() builtin), which makes this scorer SQL-checkable."""
    m = max(len(s1), len(s2))
    if m == 0:
        return 100.0
    return 100.0 * (1.0 - levenshtein_distance(s1, s2) / m)


def levenshtein_sim_one_to_many(query: str, packed: PaddedStrings) -> np.ndarray:
    m = np.maximum(np.maximum(packed.lens, len(query)), 1).astype(np.float64)
    d = levenshtein_one_to_many(query, packed)
    out = 100.0 * (1.0 - d / m)
    both_empty = (packed.lens == 0) & (len(query) == 0)
    return np.where(both_empty, 100.0, out)


SCORERS = {
    "levenshtein": levenshtein_sim,
    "ratio": ratio,
    "partial_ratio": partial_ratio,
    "token_sort_ratio": token_sort_ratio,
    "partial_token_sort_ratio": partial_token_sort_ratio,
    "token_set_ratio": token_set_ratio,
    "partial_token_set_ratio": partial_token_set_ratio,
    "token_ratio": token_ratio,
    "partial_token_ratio": partial_token_ratio,
    "WRatio": WRatio,
    "QRatio": QRatio,
}


def resolve_scorer(scorer):
    """Accept a callable or a name from :data:`SCORERS` (the user-extension
    surface mirroring polyfuzz/models/_rapidfuzz.py:23-35)."""
    if callable(scorer):
        return scorer
    try:
        return SCORERS[scorer]
    except KeyError:
        raise ValueError(f"unknown scorer {scorer!r}; options: {sorted(SCORERS)}")


def extract_one(
    query: str, choices: list[str], score_cutoff: float = 0.0, scorer=WRatio
) -> tuple[str, float] | None:
    """rapidfuzz ``process.extractOne`` semantics used by RapidFuzz.match
    (polyfuzz/models/_rapidfuzz.py:106-110): best score >= cutoff wins,
    ties resolved to the FIRST choice (strict-improvement scan)."""
    best_s = None
    best = score_cutoff
    found = False
    for c in choices:
        s = scorer(query, c)
        if s >= best and (not found or s > best):
            best, best_s, found = s, c, True
    return (best_s, best) if found else None
