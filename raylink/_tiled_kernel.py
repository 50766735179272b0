"""Cache-tiled sparse top-k cosine kernel (split out of tfidf.py).

Accumulation strategy for large to-sides:

  1. sweep the to-side in TILE_COLS-wide column tiles, scattering per-term
     outer products into a cache-resident FLOAT32 slab (half the memory
     traffic of f64 — the scoring stage is DRAM-bound under many
     concurrent tasks: measured 687 -> 1488 M pairs/s aggregate at 32
     processes from this change alone);
  2. keep the top (k + CAND_MARGIN) candidates per row across tiles
     (merged by (-value, column) for deterministic lowest-column ties);
  3. RESCORE the surviving candidates exactly in float64 via a
     candidate-restricted scatter over the full CSC, re-rank, emit top-k.

The final similarities are therefore exact f64 — identical to the
single-slab path — and the candidate selection can only differ if more
than CAND_MARGIN distinct candidates sit within float32 rounding
(~1e-7 relative) of the k-th best value, which the margin makes
vanishingly unlikely (exact ties are unaffected: equal f64 values are
equal in f32 and the column tie-break matches).

DOCUMENTED APPROXIMATION BOUNDARY (round-5 review, measured): raising
CAND_MARGIN to 8/16 costs ~5-15% kernel wall (the per-tile selection
runs k+margin argmax passes) for a scenario that requires >= 5 DISTINCT
to-texts within ~1e-7 relative similarity of the kth boundary — at that
separation the exact sims are practically indistinguishable and the
reported values are exact-f64 either way, so the margin stays at 4.
The min_similarity pre-filter slack is 1e-4 (a pure comparison
constant, no inner-loop cost): f32 accumulation error reaches the old
1e-5 slack at ~100k shared grams per pair (100 KB+ texts), and a
too-tight slack DROPS a true above-threshold candidate before the
exact rescore can save it.
"""

from __future__ import annotations

import numpy as np

CAND_MARGIN = 4


def topk_cosine_tiled(
    fr,
    index,
    k: int,
    out_idx: np.ndarray,
    out_sim: np.ndarray,
    min_similarity: float,
    self_match: bool,
    from_global_offset: int,
    apply_min_similarity: bool,
    tile_cols: int,
    row_chunk: int = 512,
) -> None:
    n_from = fr.n_rows
    n_to = index.n_to
    V = fr.n_cols
    tile_indptr = index.tile_indptr
    tile_rows = index.tile_rows
    tile_data32 = index.tile_data_f32

    km = k + CAND_MARGIN

    r = 0
    while r < n_from:
        r_end = min(n_from, r + row_chunk)
        nrows = r_end - r
        lo, hi = fr.indptr[r], fr.indptr[r_end]
        fi = np.repeat(
            np.arange(r, r_end, dtype=np.int64), np.diff(fr.indptr[r : r_end + 1])
        ) - r
        fk = fr.indices[lo:hi]
        fv64 = fr.data[lo:hi]
        fv32 = fv64.astype(np.float32)
        order = np.argsort(fk, kind="stable")
        fk_s, fi_s = fk[order], fi[order]
        fv32_s, fv64_s = fv32[order], fv64[order]
        term_change = np.empty(len(fk_s), dtype=bool)
        if len(fk_s):
            term_change[0] = True
            term_change[1:] = fk_s[1:] != fk_s[:-1]
        starts = np.flatnonzero(term_change)
        ends = np.append(starts[1:], len(fk_s))
        chunk_terms = fk_s[starts]

        best_val = np.zeros((nrows, km), dtype=np.float32)
        best_col = np.full((nrows, km), n_to, dtype=np.int64)  # sentinel high
        if self_match:
            diag = np.arange(r, r_end) + from_global_offset
        arange_rows = np.arange(nrows)
        slab = np.empty((nrows, tile_cols), dtype=np.float32)
        ms32 = np.float32(min_similarity)
        for tile in range(index.n_tiles):
            t_lo_col = tile * tile_cols
            width = min(tile_cols, n_to - t_lo_col)
            base = tile * V
            slab[:, :width] = 0.0
            sl = slab[:, :width]
            any_hit = False
            for s, e, tm in zip(starts, ends, chunk_terms):
                p_lo = tile_indptr[base + tm]
                p_hi = tile_indptr[base + tm + 1]
                if p_lo == p_hi:
                    continue
                any_hit = True
                cols_local = tile_rows[p_lo:p_hi] - t_lo_col
                sl[fi_s[s:e][:, None], cols_local[None, :]] += (
                    fv32_s[s:e][:, None] * tile_data32[p_lo:p_hi][None, :]
                )
            if not any_hit:
                continue
            if self_match:
                in_tile = (diag >= t_lo_col) & (diag < t_lo_col + width)
                sl[np.flatnonzero(in_tile), diag[in_tile] - t_lo_col] = 0.0
            if apply_min_similarity and min_similarity > 0:
                # f32 pre-filter with a safety slack; the exact rescore
                # re-applies the bound in f64
                sl[sl <= ms32 - np.float32(1e-4)] = 0.0
            kk = min(km, width)
            t_val = np.zeros((nrows, km), dtype=np.float32)
            t_col = np.full((nrows, km), n_to, dtype=np.int64)
            for c in range(kk):
                j = np.argmax(sl, axis=1)
                v = sl[arange_rows, j]
                t_val[:, c] = v
                t_col[:, c] = np.where(v > 0, j + t_lo_col, n_to)
                if c + 1 < kk:
                    sl[arange_rows, j] = -np.inf
            cand_val = np.concatenate([best_val, t_val], axis=1)
            cand_col = np.concatenate([best_col, t_col], axis=1)
            sel = np.lexsort((cand_col, -cand_val), axis=1)[:, :km]
            best_val = np.take_along_axis(cand_val, sel, axis=1)
            best_col = np.take_along_axis(cand_col, sel, axis=1)

        # ---- exact f64 rescore of surviving candidates -----------------
        # gather the candidates' to-side rows into a term-keyed mini-CSC,
        # then accumulate exactly like the main pass but over U columns
        valid = (best_val > 0) & (best_col < n_to)
        cands = np.unique(best_col[valid])
        if len(cands):
            U = len(cands)
            to_csr = index.to_csr
            c_cnt = to_csr.indptr[cands + 1] - to_csr.indptr[cands]
            total = int(c_cnt.sum())
            if total:
                offs = np.arange(total, dtype=np.int64) - np.repeat(
                    np.cumsum(c_cnt) - c_cnt, c_cnt
                )
                ptr = np.repeat(to_csr.indptr[cands], c_cnt) + offs
                m_terms = to_csr.indices[ptr]
                m_vals = to_csr.data[ptr]
                m_slots = np.repeat(np.arange(U, dtype=np.int64), c_cnt)
                m_order = np.argsort(m_terms, kind="stable")
                m_terms = m_terms[m_order]
                m_vals = m_vals[m_order]
                m_slots = m_slots[m_order]
                m_indptr = np.zeros(V + 1, dtype=np.int64)
                np.cumsum(np.bincount(m_terms, minlength=V), out=m_indptr[1:])
            slab64 = np.zeros((nrows, U), dtype=np.float64)
            if total:
                for s, e, tm in zip(starts, ends, chunk_terms):
                    q_lo, q_hi = m_indptr[tm], m_indptr[tm + 1]
                    if q_lo == q_hi:
                        continue
                    slab64[fi_s[s:e][:, None], m_slots[q_lo:q_hi][None, :]] += (
                        fv64_s[s:e][:, None] * m_vals[q_lo:q_hi][None, :]
                    )
            if self_match:
                # re-zero positional self hits among candidates
                dslot = np.searchsorted(cands, diag)
                d_ok = (dslot < U) & (cands[np.minimum(dslot, U - 1)] == diag)
                slab64[np.flatnonzero(d_ok), dslot[d_ok]] = 0.0
            if apply_min_similarity and min_similarity > 0:
                slab64[slab64 <= min_similarity] = 0.0
            cand_slot = np.searchsorted(cands, np.where(valid, best_col, cands[0]))
            exact = np.where(
                valid, slab64[arange_rows[:, None], cand_slot], 0.0
            )
            # re-rank on exact values; ties to the lower column
            sel2 = np.lexsort((best_col, -exact), axis=1)[:, :k]
            fin_val = np.take_along_axis(exact, sel2, axis=1)
            fin_col = np.take_along_axis(best_col, sel2, axis=1)
        else:
            fin_val = np.zeros((nrows, k), dtype=np.float64)
            fin_col = np.full((nrows, k), n_to, dtype=np.int64)
        good = (fin_val > 0) & (fin_col < n_to)
        out_idx[r:r_end, :k] = np.where(good, fin_col, -1)
        out_sim[r:r_end, :k] = np.where(good, fin_val, 0.0)
        r = r_end
