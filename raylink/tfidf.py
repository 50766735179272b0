"""sklearn-free TF-IDF vectorizer + sparse top-k cosine kernel.

Re-implements, in pure numpy, what the reference delegates to installed
libraries (none of which exist in this environment):

  * ``TfidfVectorizer(min_df=1, analyzer=_create_ngrams)`` with sklearn
    defaults — smooth IDF ``ln((1+n)/(1+df)) + 1``, raw term counts, L2 row
    normalization (polyfuzz/models/_tfidf.py:109-116 relies on those
    defaults). The two-list case fits JOINTLY on ``to_list + from_list``
    (polyfuzz/models/_tfidf.py:109).
  * ``sparse_dot_topn.awesome_cossim_topn`` + the top-n extraction helpers
    ``_top_n_idx_sparse`` / ``_top_n_similarities_sparse``
    (polyfuzz/models/_utils.py:73-91,128-146): per from-row top-n cosine
    against the to-side, entries <= ``min_similarity`` dropped (treated as
    0 and later nulled), self-match zeroes the positional diagonal
    (polyfuzz/models/_utils.py:84-87).

The kernel is a blocked sparse-sparse matmul expressed as vectorized numpy
joins (expand matching (from-entry, to-entry) term pairs, accumulate into a
dense (chunk x n_to) slab via ``bincount``) — the honest CSR x CSC^T
algorithm, no per-row Python loop, memory bounded by the chunk size.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from raylink._tiled_kernel import topk_cosine_tiled
from raylink.text import batch_ngrams, clean_strings_arrow, doc_term_counts


@dataclass
class CSR:
    """Minimal CSR container (scipy is not installed)."""

    indptr: np.ndarray  # int64, len n_rows+1
    indices: np.ndarray  # int64 column ids
    data: np.ndarray  # float64
    n_cols: int

    @property
    def n_rows(self) -> int:
        return len(self.indptr) - 1


@dataclass
class CSC:
    """Column-major twin of :class:`CSR`, used for the to-side index."""

    indptr: np.ndarray  # int64, len n_cols+1 (per term)
    rows: np.ndarray  # int64 row ids (to-side positions)
    data: np.ndarray  # float64
    n_rows: int


def csr_to_csc(m: CSR) -> CSC:
    order = np.argsort(m.indices, kind="stable")
    cols = m.indices[order]
    rows = np.repeat(np.arange(m.n_rows, dtype=np.int64), np.diff(m.indptr))[order]
    data = m.data[order]
    indptr = np.zeros(m.n_cols + 1, dtype=np.int64)
    np.add.at(indptr, cols + 1, 1)
    np.cumsum(indptr, out=indptr)
    return CSC(indptr=indptr, rows=rows, data=data, n_rows=m.n_rows)


def _as_arrow_strings(texts) -> pa.Array:
    if isinstance(texts, pa.ChunkedArray):
        return texts.combine_chunks()
    if isinstance(texts, pa.Array):
        return texts
    return pa.array(list(texts), type=pa.string())


class TfidfVocab:
    """Fitted vocabulary + IDF weights (the state of the reference's
    ``TfidfVectorizer``, polyfuzz/models/_tfidf.py:109-116).

    ``vocab`` is a sorted array of NUL-padded byte n-grams; ``idf`` the
    matching smooth-IDF weights. Construct via :func:`fit_tfidf` or from a
    pre-aggregated document-frequency table via :meth:`from_df_counts`
    (the distributed fit path).
    """

    __slots__ = ("vocab", "idf", "n_docs", "n_gram_range", "clean", "remove_space_ngrams")

    def __init__(self, vocab, idf, n_docs, n_gram_range, clean, remove_space_ngrams):
        self.vocab = vocab
        self.idf = idf
        self.n_docs = int(n_docs)
        self.n_gram_range = tuple(n_gram_range)
        self.clean = bool(clean)
        self.remove_space_ngrams = bool(remove_space_ngrams)


    def __getstate__(self):
        # explicit slots state: the cloudpickle by-value class fallback
        # (cross-cwd driver contract) cannot rely on __dict__
        return {k: getattr(self, k) for k in self.__slots__}

    def __setstate__(self, state):
        for k, v in state.items():
            setattr(self, k, v)

    @property
    def pad_width(self) -> int:
        return self.n_gram_range[1]

    @classmethod
    def from_df_counts(
        cls,
        grams: np.ndarray,
        df: np.ndarray,
        n_docs: int,
        n_gram_range=(3, 3),
        clean=True,
        remove_space_ngrams=True,
    ) -> "TfidfVocab":
        """Build from (gram -> document frequency) counts.

        The distributed fit computes DF via ``map_batches`` partials +
        ``groupby(gram).sum()``; this finalizes vocab + smooth IDF exactly
        as sklearn would: ``idf = ln((1+n)/(1+df)) + 1``.
        """
        pad = n_gram_range[1]
        grams = np.asarray(grams, dtype=f"S{pad}")
        order = np.argsort(grams, kind="stable")
        grams = grams[order]
        df = np.asarray(df, dtype=np.float64)[order]
        idf = np.log((1.0 + n_docs) / (1.0 + df)) + 1.0
        return cls(grams, idf, n_docs, n_gram_range, clean, remove_space_ngrams)

    def serialize(self) -> dict:
        """JSON/parquet-friendly artifact for save/load (stand-in for the
        reference's joblib pickle of the vectorizer, polyfuzz/polyfuzz.py:429-457)."""
        return {
            "vocab": [g.decode() for g in self.vocab],
            "idf": self.idf.tolist(),
            "n_docs": self.n_docs,
            "n_gram_range": list(self.n_gram_range),
            "clean": self.clean,
            "remove_space_ngrams": self.remove_space_ngrams,
        }

    @classmethod
    def deserialize(cls, d: dict) -> "TfidfVocab":
        pad = d["n_gram_range"][1]
        vocab = np.array([g.encode() for g in d["vocab"]], dtype=f"S{pad}")
        return cls(
            vocab,
            np.asarray(d["idf"], dtype=np.float64),
            d["n_docs"],
            tuple(d["n_gram_range"]),
            d["clean"],
            d["remove_space_ngrams"],
        )

    # ---- transform -------------------------------------------------------
    def transform(self, texts) -> CSR:
        """Texts -> L2-normalized TF-IDF CSR rows (sklearn ``transform``
        semantics: out-of-vocabulary grams ignored, all-OOV rows are zero)."""
        arr = _as_arrow_strings(texts)
        if self.clean:
            arr = clean_strings_arrow(arr)
        n = len(arr)
        doc_ids, grams = batch_ngrams(
            arr, self.n_gram_range, self.remove_space_ngrams, pad_width=self.pad_width
        )
        if len(grams) == 0:
            return CSR(np.zeros(n + 1, np.int64), np.empty(0, np.int64), np.empty(0, np.float64), len(self.vocab))
        pos = np.searchsorted(self.vocab, grams)
        pos = np.minimum(pos, len(self.vocab) - 1) if len(self.vocab) else pos
        known = len(self.vocab) > 0
        mask = (self.vocab[pos] == grams) if known else np.zeros(len(grams), bool)
        doc_ids = doc_ids[mask]
        term_ids = pos[mask]
        d, t, c = doc_term_counts(doc_ids, term_ids)
        w = c.astype(np.float64) * self.idf[t]
        # L2 normalize per row
        norms = np.zeros(n, np.float64)
        np.add.at(norms, d, w * w)
        np.sqrt(norms, out=norms)
        nz = norms[d] > 0
        w = np.where(nz, w / np.where(norms[d] == 0, 1.0, norms[d]), w)
        indptr = np.zeros(n + 1, np.int64)
        np.add.at(indptr, d + 1, 1)
        np.cumsum(indptr, out=indptr)
        return CSR(indptr=indptr, indices=t, data=w, n_cols=len(self.vocab))


def fit_tfidf(
    docs,
    n_gram_range=(3, 3),
    clean=True,
    remove_space_ngrams=True,
) -> TfidfVocab:
    """Single-node fit (the oracle path). DF = number of docs containing
    each gram; every doc counts toward ``n_docs`` even if it yields no
    grams — matching sklearn."""
    arr = _as_arrow_strings(docs)
    if clean:
        arr = clean_strings_arrow(arr)
    n = len(arr)
    pad = n_gram_range[1]
    doc_ids, grams = batch_ngrams(arr, n_gram_range, remove_space_ngrams, pad_width=pad)
    grams_u, df = df_counts(doc_ids, grams)
    return TfidfVocab.from_df_counts(
        grams_u, df, n, n_gram_range, clean, remove_space_ngrams
    )


def df_counts(doc_ids: np.ndarray, grams: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(doc, gram) occurrence pairs -> (unique grams, document frequency).

    Used both by the single-node fit and as the per-batch partial inside the
    distributed ``map_batches`` DF aggregation (each doc lives in exactly
    one batch, so partial DFs sum to the exact DF).
    """
    if len(grams) == 0:
        return np.empty(0, grams.dtype if len(grams) else "S8"), np.empty(0, np.int64)
    order = np.lexsort((doc_ids, grams))
    g = grams[order]
    d = doc_ids[order]
    pair_change = np.empty(len(g), bool)
    pair_change[0] = True
    pair_change[1:] = (g[1:] != g[:-1]) | (d[1:] != d[:-1])
    g = g[pair_change]  # unique (gram, doc) pairs, sorted by gram
    gram_change = np.empty(len(g), bool)
    gram_change[0] = True
    gram_change[1:] = g[1:] != g[:-1]
    starts = np.flatnonzero(gram_change)
    df = np.diff(np.append(starts, len(g)))
    return g[starts], df


# ---------------------------------------------------------------------------
# top-k cosine kernel
# ---------------------------------------------------------------------------


import os

# Cache-blocked kernel geometry. Defaults are measured on this box (see
# BASELINE.md round-3 geometry study: rc256 x tc8192 beats the round-2
# rc512 x tc4096 by ~9% at 32 CPUs on the real hot-block replay AND is
# far more stable across host phases — same 8 MB slab, flatter aspect =
# half the per-tile top-k merges and longer per-term scatter runs); env
# overrides exist for re-tuning on different hardware without code edits.
# The tile width is FROZEN INTO TopkIndex at build time (index.tile_cols)
# so driver-built indexes and worker-side scoring can never disagree
# about the layout. TILE_ACTIVATE decouples WHEN tiling kicks in from the
# tile WIDTH: blocks above it get the tiled f32-selection layout even if
# they fit a single tile (a 4-8k block on one 8192-wide tile accumulates
# into a ~5 MB f32 slab instead of the legacy up-to-256 MB f64 slab).
TILE_COLS = int(os.environ.get("RAYLINK_TILE_COLS", "8192"))
ROW_CHUNK = int(os.environ.get("RAYLINK_ROW_CHUNK", "256"))
TILE_ACTIVATE = int(os.environ.get("RAYLINK_TILE_ACTIVATE", "4096"))


class TopkIndex:
    """Broadcast-ready to-side index: CSC matrix + texts.

    This is the object placed in the Ray object store once (``ray.put``)
    and read by every scoring actor — the stand-in for the reference's
    cached ``tf_idf_to`` matrix (polyfuzz/models/_tfidf.py:110,115-116).

    For large to-sides a tile-partitioned CSC is precomputed: entries
    sorted by (column-tile, term, row) with an indptr per (tile, term), so
    the kernel can accumulate into a cache-resident (chunk x TILE_COLS)
    slab instead of a DRAM-thrashing (chunk x n_to) one — the difference
    between collapsing and scaling when many scoring tasks run per node.
    """

    __slots__ = ("csc", "to_csr", "texts", "tile_indptr", "tile_rows",
                 "tile_data", "tile_data_f32", "n_tiles", "tile_cols")

    def __init__(self, to_csr: CSR, texts=None, tile_cols: int | None = None):
        self.csc = csr_to_csc(to_csr)
        self.to_csr = to_csr  # row-major view, used by the exact rescore
        # texts ride on BlockIndex in the pipeline; kept here only for
        # standalone kernel users/tests
        self.texts = (
            np.asarray(texts, dtype=object) if isinstance(texts, (list, np.ndarray)) else texts
        )
        n_to = self.csc.n_rows
        V = to_csr.n_cols
        self.tile_cols = int(tile_cols or TILE_COLS)
        if n_to > min(self.tile_cols, TILE_ACTIVATE):
            tc = self.tile_cols
            self.n_tiles = max(1, (n_to + tc - 1) // tc)
            terms = np.repeat(
                np.arange(V, dtype=np.int64), np.diff(self.csc.indptr)
            )
            rows = self.csc.rows
            data = self.csc.data
            tile_of = rows // tc
            order = np.lexsort((rows, terms, tile_of))
            self.tile_rows = rows[order]
            self.tile_data = data[order]
            self.tile_data_f32 = self.tile_data.astype(np.float32)
            flat = tile_of[order] * V + terms[order]
            counts = np.bincount(flat, minlength=self.n_tiles * V)
            indptr = np.zeros(self.n_tiles * V + 1, dtype=np.int64)
            np.cumsum(counts, out=indptr[1:])
            self.tile_indptr = indptr
        else:
            self.n_tiles = 1
            self.tile_indptr = None
            self.tile_rows = None
            self.tile_data = None
            self.tile_data_f32 = None


    def __getstate__(self):
        # explicit slots state: the cloudpickle by-value class fallback
        # (cross-cwd driver contract) cannot rely on __dict__
        return {k: getattr(self, k) for k in self.__slots__}

    def __setstate__(self, state):
        for k, v in state.items():
            setattr(self, k, v)

    @property
    def n_to(self) -> int:
        return self.csc.n_rows


def topk_cosine(
    fr: CSR,
    index: TopkIndex,
    top_n: int,
    min_similarity: float = 0.0,
    self_match: bool = False,
    from_global_offset: int = 0,
    apply_min_similarity: bool = True,
    max_slab: int = 32_000_000,
) -> tuple[np.ndarray, np.ndarray]:
    """Blocked sparse top-k cosine: returns (indices int64 (n,k), sims (n,k)).

    Missing entries (fewer than ``top_n`` nonzero sims in a row) are padded
    with index -1 / sim 0.0 — the analogue of the reference's None padding
    (polyfuzz/models/_utils.py:128-136). Sims are NOT yet rounded — the
    match-frame builder applies round(.,3) and the <0.001 null rule
    (polyfuzz/models/_utils.py:118-123,143).

    ``apply_min_similarity`` mirrors the sparse path's lower bound (entries
    <= min_similarity dropped, polyfuzz/models/_utils.py:79-87); the dense
    "sklearn" oracle path passes False (polyfuzz/models/_utils.py:94-102
    applies no bound). ``self_match`` zeroes the positional diagonal
    (row i vs to-column from_global_offset+i).
    """
    n_from = fr.n_rows
    n_to = index.n_to
    k = int(min(top_n, n_to))
    out_idx = np.full((n_from, top_n), -1, dtype=np.int64)
    out_sim = np.zeros((n_from, top_n), dtype=np.float64)
    if n_to == 0 or k == 0:
        return out_idx, out_sim
    if index.tile_indptr is not None and k <= 16:
        topk_cosine_tiled(
            fr, index, k, out_idx, out_sim, min_similarity, self_match,
            from_global_offset, apply_min_similarity,
            getattr(index, "tile_cols", TILE_COLS), row_chunk=ROW_CHUNK,
        )
        missing = out_sim <= 0.0
        out_idx[missing] = -1
        out_sim[missing] = 0.0
        return out_idx, out_sim
    csc = index.csc

    row_chunk = max(1, min(n_from, max_slab // max(1, n_to)))
    r = 0
    while r < n_from:
        r_end = min(n_from, r + row_chunk)
        lo, hi = fr.indptr[r], fr.indptr[r_end]
        fi = np.repeat(
            np.arange(r, r_end, dtype=np.int64), np.diff(fr.indptr[r : r_end + 1])
        ) - r
        fk = fr.indices[lo:hi]
        fv = fr.data[lo:hi]
        slab = np.zeros((r_end - r, n_to), dtype=np.float64)
        # term-at-a-time outer-product accumulation: within one term the
        # (from-row, to-row) pairs are unique, so plain fancy += is a valid
        # scatter (no np.add.at needed) — this is the CSR x CSC^T matmul
        # with O(collisions) work and no expanded temp arrays.
        order = np.argsort(fk, kind="stable")
        fk_s, fi_s, fv_s = fk[order], fi[order], fv[order]
        term_change = np.empty(len(fk_s), dtype=bool)
        if len(fk_s):
            term_change[0] = True
            term_change[1:] = fk_s[1:] != fk_s[:-1]
        starts = np.flatnonzero(term_change)
        ends = np.append(starts[1:], len(fk_s))
        for s, e in zip(starts, ends):
            t = fk_s[s]
            t_lo, t_hi = csc.indptr[t], csc.indptr[t + 1]
            if t_lo == t_hi:
                continue
            rows_f = fi_s[s:e]
            vals_f = fv_s[s:e]
            cols_t = csc.rows[t_lo:t_hi]
            vals_t = csc.data[t_lo:t_hi]
            slab[rows_f[:, None], cols_t[None, :]] += (
                vals_f[:, None] * vals_t[None, :]
            )
        if self_match:
            diag = np.arange(r, r_end) + from_global_offset
            valid = diag < n_to
            slab[np.flatnonzero(valid), diag[valid]] = 0.0
        if apply_min_similarity and min_similarity > 0:
            slab[slab <= min_similarity] = 0.0
        # top-k per row, descending, ties toward the lower to-index:
        # iterative argmax (k passes) beats argpartition for the small k
        # this workload uses, and argmax's first-max rule gives the
        # deterministic tie-break for free.
        if k <= 8 or k >= n_to:
            work = slab
            for c in range(k):
                j = np.argmax(work, axis=1)
                v = work[np.arange(work.shape[0]), j]
                out_idx[r:r_end, c] = j
                out_sim[r:r_end, c] = v
                if c + 1 < k:
                    work[np.arange(work.shape[0]), j] = -np.inf
        else:
            part = np.argpartition(-slab, k - 1, axis=1)[:, :k]
            # tie-exact selection (the ann._topk_cols_tie_exact rule):
            # argpartition picks ARBITRARY tie members at the kth value,
            # which would break the lowest-column tie rule the other two
            # branches (iterative argmax, tiled) honor — rows with more
            # than k candidates at >= kth re-resolve with a stable sort.
            # kth == 0 rows are exempt: every positive is already in the
            # selected set and the zero-tie members are masked to -1
            # below, so their identity never surfaces.
            kth = np.take_along_axis(slab, part, axis=1).min(axis=1)
            amb = np.flatnonzero(
                (kth > 0.0)
                & ((slab >= kth[:, None]).sum(axis=1) > k)
            )
            if len(amb):
                part[amb] = np.argsort(
                    -slab[amb], axis=1, kind="stable"
                )[:, :k]
            vals = np.take_along_axis(slab, part, axis=1)
            order2 = np.lexsort((part, -vals), axis=1)[:, :k]
            out_idx[r:r_end, :k] = np.take_along_axis(part, order2, axis=1)
            out_sim[r:r_end, :k] = np.take_along_axis(vals, order2, axis=1)
        missing = out_sim[r:r_end] <= 0.0
        out_idx[r:r_end][missing] = -1
        out_sim[r:r_end][missing] = 0.0
        r = r_end
    return out_idx, out_sim
