"""Contention micro-bench for the tiled sparse top-k kernel.

Replays the REAL sf0.1 flagship hot block (block 's': ~60k distinct
strings, 852-trigram vocab) through the production TF-IDF + TopkIndex
machinery: P concurrent forked processes each score a 1/P row share
against a SHARED index (fork-inherited copy-on-write pages, like plasma
zero-copy reads). Reports aggregate pairs/s at P=8 and P=32 per variant.

This is the instrument behind the round-3 geometry change (BASELINE.md
round 3): only interleaved same-phase A/B is trustworthy on this host —
an uncontrolled sweep showed a phantom +34% that vanished interleaved.

Usage:
  python scripts/kernel_contention_bench.py [variant ...]   # default f32
Variants compose with '-': f32 | f16 | int16 (slab dtype), rcN
(row_chunk), tcN (tile width), e.g. f32-rc256-tc8192.

Requires the sf0.1 transcript fixture (run bench.py at sf0.1 once);
builds + caches the hot-block CSR fixture at /tmp/kernel_fixture.pkl.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = "/tmp/kernel_fixture.pkl"
K = 1  # top-1, the flagship shape
N_TO = 0
V = 0


def ensure_fixture():
    import pickle

    if os.path.exists(FIXTURE):
        return
    import pyarrow.parquet as pq

    from raylink.tfidf import fit_tfidf

    gt = pq.read_table(
        "/tmp/raylink_fixtures/sf0.1-e60000/ground_truth.parquet"
    ).to_pandas()
    dist = gt[["variant", "block_key"]].drop_duplicates()
    bk = dist.groupby("block_key").size().idxmax()
    to_texts = sorted(dist[dist.block_key == bk]["variant"].tolist())
    from_texts = gt[gt.block_key == bk]["variant"].tolist()[:40000]
    vocab = fit_tfidf(to_texts)
    pickle.dump(
        {"to": vocab.transform(to_texts), "fr": vocab.transform(from_texts)},
        open(FIXTURE, "wb"),
    )

def run_variant(variant, P, index, fr_full):
    import raylink._tiled_kernel as tk
    from raylink.tfidf import CSR

    row_chunk = 512
    tile_cols = index.tile_cols
    slab_dtype = None
    for part in variant.split("-"):
        if part.startswith("rc"):
            row_chunk = int(part[2:])
        elif part == "f16":
            slab_dtype = np.float16
        elif part == "int16":
            slab_dtype = np.int16

    n_rows = fr_full.n_rows
    share = (n_rows + P - 1) // P

    def child(pi, wpipe):
        lo = pi * share
        hi = min(n_rows, lo + share)
        sub = CSR(
            indptr=fr_full.indptr[lo : hi + 1] - fr_full.indptr[lo],
            indices=fr_full.indices[fr_full.indptr[lo] : fr_full.indptr[hi]],
            data=fr_full.data[fr_full.indptr[lo] : fr_full.indptr[hi]],
            n_cols=V,
        )
        out_idx = np.full((hi - lo, K), -1, dtype=np.int64)
        out_sim = np.zeros((hi - lo, K), dtype=np.float64)
        t0 = time.perf_counter()
        if slab_dtype is None:
            tk.topk_cosine_tiled(
                sub, index, K, out_idx, out_sim, 0.0, True, lo, True,
                tile_cols, row_chunk=row_chunk,
            )
        else:
            topk_cosine_tiled_alt(
                sub, index, K, out_idx, out_sim, 0.0, True, lo, True,
                tile_cols, row_chunk=row_chunk, slab_dtype=slab_dtype,
            )
        dt = time.perf_counter() - t0
        os.write(wpipe, f"{dt:.4f} {out_sim.sum():.3f}\n".encode())
        os._exit(0)

    pipes = []
    pids = []
    t0 = time.perf_counter()
    for pi in range(P):
        r, w = os.pipe()
        pid = os.fork()
        if pid == 0:
            os.close(r)
            child(pi, w)
        os.close(w)
        pipes.append(r)
        pids.append(pid)
    walls = []
    checks = []
    for r in pipes:
        buf = b""
        while not buf.endswith(b"\n"):
            chunk = os.read(r, 256)
            if not chunk:
                break
            buf += chunk
        os.close(r)
        parts = buf.decode().split()
        walls.append(float(parts[0]))
        checks.append(float(parts[1]))
    for pid in pids:
        os.waitpid(pid, 0)
    total_wall = time.perf_counter() - t0
    pairs = n_rows * N_TO
    return total_wall, max(walls), pairs / total_wall / 1e6, sum(checks)


def topk_cosine_tiled_alt(
    fr, index, k, out_idx, out_sim, min_similarity, self_match,
    from_global_offset, apply_min_similarity, tile_cols, row_chunk=512,
    slab_dtype=np.float16,
):
    """Variant of topk_cosine_tiled with a reduced-precision slab.
    Selection in slab_dtype, exact f64 rescore unchanged. int16 uses a
    x16384 scale on the to-side factors (sum <= 1 -> slab <= ~16384+err)."""
    import raylink._tiled_kernel as tk

    CAND_MARGIN = 8
    n_from = fr.n_rows
    n_to = index.n_to
    Vv = fr.n_cols
    tile_indptr = index.tile_indptr
    tile_rows = index.tile_rows
    tile_data32 = index.tile_data_f32
    km = k + CAND_MARGIN
    is_int = slab_dtype == np.int16
    SCALE = np.float32(16384.0)

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
        best_col = np.full((nrows, km), n_to, dtype=np.int64)
        if self_match:
            diag = np.arange(r, r_end) + from_global_offset
        arange_rows = np.arange(nrows)
        slab = np.empty((nrows, tile_cols), dtype=slab_dtype)
        for tile in range(index.n_tiles):
            t_lo_col = tile * tile_cols
            width = min(tile_cols, n_to - t_lo_col)
            base = tile * Vv
            slab[:, :width] = 0
            sl = slab[:, :width]
            any_hit = False
            for s, e, tm in zip(starts, ends, chunk_terms):
                p_lo = tile_indptr[base + tm]
                p_hi = tile_indptr[base + tm + 1]
                if p_lo == p_hi:
                    continue
                any_hit = True
                cols_local = tile_rows[p_lo:p_hi] - t_lo_col
                prod = fv32_s[s:e][:, None] * tile_data32[p_lo:p_hi][None, :]
                if is_int:
                    sl[fi_s[s:e][:, None], cols_local[None, :]] += (
                        prod * SCALE
                    ).astype(np.int16)
                else:
                    sl[fi_s[s:e][:, None], cols_local[None, :]] += prod
            if not any_hit:
                continue
            if self_match:
                in_tile = (diag >= t_lo_col) & (diag < t_lo_col + width)
                sl[np.flatnonzero(in_tile), diag[in_tile] - t_lo_col] = 0
            kk = min(km, width)
            t_val = np.zeros((nrows, km), dtype=np.float32)
            t_col = np.full((nrows, km), n_to, dtype=np.int64)
            slf = sl
            for c in range(kk):
                j = np.argmax(slf, axis=1)
                v = slf[arange_rows, j].astype(np.float32)
                t_val[:, c] = v
                t_col[:, c] = np.where(v > 0, j + t_lo_col, n_to)
                if c + 1 < kk:
                    slf[arange_rows, j] = -32768 if is_int else -np.inf
            if is_int:
                t_val /= SCALE
            cand_val = np.concatenate([best_val, t_val], axis=1)
            cand_col = np.concatenate([best_col, t_col], axis=1)
            sel = np.lexsort((cand_col, -cand_val), axis=1)[:, :km]
            best_val = np.take_along_axis(cand_val, sel, axis=1)
            best_col = np.take_along_axis(cand_col, sel, axis=1)

        # exact rescore (identical to production kernel)
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
                m_indptr = np.zeros(Vv + 1, dtype=np.int64)
                np.cumsum(np.bincount(m_terms, minlength=Vv), out=m_indptr[1:])
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
                dslot = np.searchsorted(cands, diag)
                d_ok = (dslot < U) & (cands[np.minimum(dslot, U - 1)] == diag)
                slab64[np.flatnonzero(d_ok), dslot[d_ok]] = 0.0
            if apply_min_similarity and min_similarity > 0:
                slab64[slab64 <= min_similarity] = 0.0
            cand_slot = np.searchsorted(cands, np.where(valid, best_col, cands[0]))
            exact = np.where(valid, slab64[arange_rows[:, None], cand_slot], 0.0)
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


def main():
    import pickle

    from raylink.tfidf import TopkIndex

    variants = sys.argv[1:] or ["f32"]
    ensure_fixture()
    fx = pickle.load(open(FIXTURE, "rb"))
    to_csr, fr = fx["to"], fx["fr"]
    global N_TO, V
    N_TO = to_csr.n_rows
    V = to_csr.n_cols
    results = {}
    for variant in variants:
        tc = 4096
        for part in variant.split("-"):
            if part.startswith("tc"):
                tc = int(part[2:])
        index = TopkIndex(to_csr, tile_cols=tc)
        for P in (8, 32):
            wall, maxw, mps, check = run_variant(variant, P, index, fr)
            results[(variant, P)] = (wall, mps)
            print(
                f"{variant:7s} P={P:2d} wall={wall:6.2f}s maxtask={maxw:6.2f}s "
                f"agg={mps:7.1f} Mpairs/s check={check:.3f}", flush=True,
            )
    for v in variants:
        if (v, 8) in results and (v, 32) in results:
            eff = results[(v, 32)][1] / results[(v, 8)][1] / 4
            print(f"{v}: 8->32 scaling eff {eff:.2f}")


if __name__ == "__main__":
    main()
