"""Deduplication operators for large-scale text corpora.

Beyond the reference's operator set (its near-dedup IS the match+group
product), these are the standard training-data-pipeline dedup stages, each
built Ray-Data-first:

  * exact_dedup          — content hash in ``map_batches`` + one bounded
                           groupby (hash-partitioned "keep first");
  * minhash_lsh          — shingle → minhash signature per batch (vectorized
                           numpy, no per-row loop) → explode to
                           (band, band_hash, doc) rows → groupby banding →
                           candidate pairs → exact-Jaccard verification →
                           connected components;
  * simhash              — 64-bit simhash per doc; near-dup candidates via
                           4x16-bit band buckets (Hamming <= 3 guarantee by
                           pigeonhole on any single-band collision class);
  * ngram_jaccard_pairs  — exact all-pairs Jaccard over shingle sets via an
                           inverted-index self-join (bucket caps documented);
  * embedding_cosine     — near-dup pairs over an embedding column, brute
                           force per batch vs a broadcast matrix (baseline)
                           or LSH-bucketed (scale path).

Skew note: banding/shingle groupbys can hot-spot on common shingles; bucket
sizes are capped (``max_bucket``) and oversized buckets are dropped with a
count reported, never silently.
"""

from __future__ import annotations

import hashlib
import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from raylink.blocking import _fnv64_fold_rows, _hash64
from raylink.joins import typed_to_pandas

# fine staging modulus for digest shuffles (the joins _FINE_PARTS
# convention — aggs._digest_merge's sized groupby rebases it onto an
# input-sized partition count); module-level so worker closures can
# capture it
_FINE_STAGE_PARTS = 65_536

# byte bound for the driver/task-pool minhash verification's candidate-
# shingle collect (the pair-count rule alone is blind to document
# length); above it, auto verification reroutes to the distributed path
_DRIVER_SHINGLE_BYTES_MAX = 2 << 30
from raylink.broadcast import cached_object
from raylink.embed import embeddings_to_matrix, l2_normalize
from raylink.text import batch_ngrams, clean_strings_arrow
from raylink.textstats import _tokenize_flat


def _md5_hex(texts: list[str]) -> list[str]:
    return [hashlib.md5(t.encode()).hexdigest() for t in texts]


def exact_dedup(ds, id_col: str, text_col: str):
    """Exact duplicate groups: returns (text_hash, keep_id, n_dups) — one
    row per distinct content, keep_id = minimal id (deterministic winner).
    Hash computed per batch; the groupby shuffles one slim row per doc."""

    def hash_batch(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        return pa.table(
            {
                "text_hash": pa.array(_md5_hex(texts), type=pa.string()),
                id_col: batch[id_col],
            }
        )

    from ray.data.aggregate import Count, Min

    return (
        ds.map_batches(hash_batch, batch_format="pyarrow")
        .groupby("text_hash")
        .aggregate(Min(id_col, alias_name="keep_id"), Count(alias_name="n_dups"))
    )


# ---------------------------------------------------------------------------
# shingling + minhash
# ---------------------------------------------------------------------------


def _shingle_hashes(texts: pa.Array, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc k-char shingle hashes (int64), vectorized via the ngram
    byte-window machinery. Returns (doc_ids, hashes) with duplicates
    removed per doc. The dedupe of :func:`_positional_shingle_hashes` —
    ONE fold kernel, so the minhash and winnowing SQL oracles can never
    desynchronize."""
    doc_ids, h = _positional_shingle_hashes(texts, k)
    if len(h) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    order = np.lexsort((h, doc_ids))
    d, hh = doc_ids[order], h[order]
    keep = np.empty(len(d), bool)
    keep[0] = True
    keep[1:] = (d[1:] != d[:-1]) | (hh[1:] != hh[:-1])
    return d[keep], hh[keep].astype(np.int64)


_MINHASH_A: np.ndarray | None = None
_MINHASH_B: np.ndarray | None = None


def _minhash_params(num_perm: int, seed: int = 1234) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**61 - 1, size=num_perm, dtype=np.int64).astype(np.uint64) | np.uint64(1)
    b = rng.integers(0, 2**61 - 1, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signatures_batch(
    texts: pa.Array, k: int, num_perm: int, seed: int = 1234
) -> np.ndarray:
    """(n_docs x num_perm) uint64 minhash signature matrix — fully
    vectorized: expand shingle hashes x permutations in one outer op per
    doc-segment (reduceat over doc runs)."""
    n = len(texts)
    a, b = _minhash_params(num_perm, seed)
    doc_ids, sh = _shingle_hashes(texts, k)
    sig = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(sh) == 0:
        return sig
    hv = sh.astype(np.uint64)
    # permuted[h, p] = a[p]*h + b[p] (mod 2^64) — wraparound is fine for min
    permuted = hv[:, None] * a[None, :] + b[None, :]
    change = np.empty(len(doc_ids), bool)
    change[0] = True
    change[1:] = doc_ids[1:] != doc_ids[:-1]
    starts = np.flatnonzero(change)
    mins = np.minimum.reduceat(permuted, starts, axis=0)
    sig[doc_ids[starts]] = mins
    return sig


def minhash_band_rows(
    batch: pa.Table, id_col: str, text_col: str,
    k: int = 5, num_perm: int = 64, bands: int = 16, seed: int = 1234,
) -> pa.Table:
    """map_batches body: docs -> (band_id, band_hash, doc_id) rows."""
    ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False))
    if len(ids) and ids.min() < 0:
        # the distributed verify shuffle uses a=-1 to separate pair rows
        # from shingle payload rows — a real negative id would be misread
        raise ValueError("dedup id columns must be non-negative")
    sig = minhash_signatures_batch(batch[text_col].combine_chunks(), k, num_perm, seed)
    rows_per_band = num_perm // bands
    out_band = []
    out_hash = []
    out_id = []
    for bnd in range(bands):
        chunk = sig[:, bnd * rows_per_band : (bnd + 1) * rows_per_band]
        h = np.zeros(len(ids), dtype=np.uint64)
        for c in range(chunk.shape[1]):
            h = h * np.uint64(1099511628211) ^ chunk[:, c]
        out_band.append(np.full(len(ids), bnd, dtype=np.int32))
        out_hash.append(h.astype(np.int64))
        out_id.append(ids)
    return pa.table(
        {
            "band_id": pa.array(np.concatenate(out_band)),
            "band_hash": pa.array(np.concatenate(out_hash)),
            "doc_id": pa.array(np.concatenate(out_id)),
        }
    )


def _emit_bucket_pairs(
    starts: np.ndarray,
    sizes: np.ndarray,
    max_bucket: int,
    arrays: list[np.ndarray],
    oversize: str = "truncate",
) -> list[tuple[np.ndarray, np.ndarray]]:
    """Vectorized intra-bucket pair emission over PRE-SORTED bucket runs:
    buckets of equal size share one (i, j) index pattern, so the whole
    size class gathers in one shot. ``arrays`` are row-aligned with the
    sorted bucket layout; for each, the (left, right) pair columns are
    returned. ``oversize``: "truncate" keeps the first max_bucket members,
    "skip" drops the bucket entirely — both explicit, never silent."""
    outs: list[tuple[list, list]] = [([], []) for _ in arrays]
    valid = sizes >= 2
    n_over = int((sizes > max_bucket).sum())
    if n_over:
        # the module contract: caps are REPORTED, never silent
        logging.getLogger("raylink.dedup").warning(
            "%d LSH bucket(s) exceed max_bucket=%d (largest=%d): %s",
            n_over, max_bucket, int(sizes.max()),
            "truncated to the first max_bucket members"
            if oversize == "truncate" else "dropped entirely",
        )
    if oversize == "skip":
        valid &= sizes <= max_bucket
    for s in np.unique(sizes[valid]):
        sel = starts[(sizes == s) & valid]
        cap = min(int(s), max_bucket)
        i, j = np.triu_indices(cap, k=1)
        gather = sel[:, None] + np.arange(cap)[None, :]
        for ai, arr in enumerate(arrays):
            rows = arr[gather]
            outs[ai][0].append(rows[:, i].ravel())
            outs[ai][1].append(rows[:, j].ravel())
    result = []
    for ai, (ls, rs) in enumerate(outs):
        if ls:
            result.append((np.concatenate(ls), np.concatenate(rs)))
        else:
            dt = arrays[ai].dtype
            result.append((np.empty(0, dt), np.empty(0, dt)))
    return result


def candidate_pairs_from_bands(
    band_ds, max_bucket: int = 200, driver_threshold: int = 20_000_000
):
    """(band_id, band_hash) buckets -> unordered candidate pairs (a < b).
    Oversized buckets (pathological collisions) are truncated to the first
    ``max_bucket`` members — capped explicitly, never silent.

    Fast path: the band table is 3 int64 columns (n_docs x bands rows) —
    below ``driver_threshold`` rows it is collected and bucketed with one
    vectorized numpy sort+reduceat pass. Above the threshold the SAME
    vectorized scan runs per hash partition of the band key (one keyed
    groupby; per-group Python is O(partitions), never O(buckets))."""
    band_ds = band_ds.materialize()
    n = band_ds.count()

    def scan(band, bh, doc) -> tuple[np.ndarray, np.ndarray]:
        order = np.lexsort((doc, bh, band))
        band, bh, doc = band[order], bh[order], doc[order]
        if len(band) == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        chg = np.r_[True, (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])]
        starts = np.flatnonzero(chg)
        sizes = np.diff(np.append(starts, len(band)))
        (ab,) = _emit_bucket_pairs(starts, sizes, max_bucket, [doc])
        return ab

    if n <= driver_threshold:
        tbl = pa.concat_tables(
            ray.get(band_ds.to_arrow_refs()), promote_options="default"
        )
        a, b = scan(
            np.asarray(tbl["band_id"].to_numpy(zero_copy_only=False), np.int64),
            np.asarray(tbl["band_hash"].to_numpy(zero_copy_only=False), np.int64),
            np.asarray(tbl["doc_id"].to_numpy(zero_copy_only=False), np.int64),
        )
        return pd.DataFrame({"a": a, "b": b})

    P = max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)

    def add_part(batch: pa.Table) -> pa.Table:
        bh = np.asarray(batch["band_hash"].to_numpy(zero_copy_only=False), np.int64)
        return batch.append_column(
            "part", pa.array((bh % P).astype(np.int64))
        )

    def scan_part(g: pa.Table) -> pa.Table:
        a, b = scan(
            np.asarray(g["band_id"].to_numpy(zero_copy_only=False), np.int64),
            np.asarray(g["band_hash"].to_numpy(zero_copy_only=False), np.int64),
            np.asarray(g["doc_id"].to_numpy(zero_copy_only=False), np.int64),
        )
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    return (
        band_ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(scan_part, batch_format="pyarrow")
    )


def _ranges_gather(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Vectorized variable-length range gather: indices covering
    [starts[i], starts[i]+lens[i]) for every i, concatenated."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    base = np.repeat(starts, lens)
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.r_[0, np.cumsum(lens)[:-1]], lens
    )
    return base + within


def _doc_arrays_from_sorted(
    sh_doc: np.ndarray, sh_val: np.ndarray
) -> dict[int, np.ndarray]:
    """(doc, shingle) rows -> {doc: sorted shingle array} (one slice per
    doc; the per-doc dict build is O(unique docs), values are views)."""
    if not len(sh_doc):  # all candidate docs gramless (texts shorter than k)
        return {}
    o = np.lexsort((sh_val, sh_doc))
    sh_doc, sh_val = sh_doc[o], sh_val[o]
    bounds = np.flatnonzero(np.r_[True, sh_doc[1:] != sh_doc[:-1]])
    return {
        int(sh_doc[s]): sh_val[s:e]
        for s, e in zip(bounds, np.append(bounds[1:], len(sh_doc)))
    }


def _verify_with_doc_arrays(
    ca: np.ndarray,
    cb: np.ndarray,
    doc_arrays: dict[int, np.ndarray],
    jaccard_threshold: float,
) -> list[tuple[int, int]]:
    """Vectorized exact-Jaccard verification kernel (shared by the driver
    path and each distributed partition): group candidate pairs by the
    left doc, membership-test the concatenated partner shingles against
    the left doc's sorted array, segment-sum per partner."""
    verified: list[tuple[int, int]] = []
    order = np.lexsort((cb, ca))
    ca, cb = ca[order], cb[order]
    a_bounds = np.flatnonzero(np.r_[True, ca[1:] != ca[:-1]])
    for s, e in zip(a_bounds, np.append(a_bounds[1:], len(ca))):
        sa = doc_arrays.get(int(ca[s]))
        if sa is None or not len(sa):
            continue
        partners = cb[s:e]
        arrs = [doc_arrays.get(int(b)) for b in partners]
        keep_i = [i for i, x in enumerate(arrs) if x is not None and len(x)]
        if not keep_i:
            continue
        arrs_nz = [arrs[i] for i in keep_i]
        lens = np.array([len(x) for x in arrs_nz], dtype=np.int64)
        concat = np.concatenate(arrs_nz)
        pos = np.searchsorted(sa, concat)
        hit = (pos < len(sa)) & (sa[np.minimum(pos, len(sa) - 1)] == concat)
        seg_starts = np.r_[0, np.cumsum(lens)[:-1]]
        inter = np.add.reduceat(hit.astype(np.int64), seg_starts)
        union = len(sa) + lens - inter
        ok = inter / np.maximum(union, 1) >= jaccard_threshold
        for i, good in zip(keep_i, ok):
            if good:
                verified.append((int(ca[s]), int(partners[i])))
    return verified


def _default_parts() -> int:
    return max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)


def _dedupe_sorted_pairs(
    pca: np.ndarray, pcb: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Sort pairs by (a, b) and drop duplicates — the same pair reaching a
    verify partition from several LSH bands is verified once. Partitioning
    is a function of ``a``, so per-partition dedup IS global dedup (no
    driver collect, no extra shuffle)."""
    if not len(pca):
        return pca.astype(np.int64), pcb.astype(np.int64)
    o = np.lexsort((pcb, pca))
    pca, pcb = pca[o], pcb[o]
    keep = np.r_[True, (pca[1:] != pca[:-1]) | (pcb[1:] != pcb[:-1])]
    return pca[keep], pcb[keep]


def _verify_range(sh, ca: np.ndarray, cb: np.ndarray, thr: float):
    """Task body: rebuild the doc->shingle-slice map from the broadcast
    sorted shingle arrays (Ray auto-dereferences the ObjectRef argument —
    numpy args are plasma-shared zero-copy) and run the shared kernel on
    a pair range."""
    sh_doc, sh_val = sh
    got = _verify_with_doc_arrays(
        ca, cb, _doc_arrays_from_sorted(sh_doc, sh_val), thr
    )
    return (
        np.array([x[0] for x in got], dtype=np.int64),
        np.array([x[1] for x in got], dtype=np.int64),
    )


_verify_range_task = None  # lazy ray.remote wrapper


def _verify_pairs_taskpool(
    sh_doc: np.ndarray,
    sh_val: np.ndarray,
    ca: np.ndarray,
    cb: np.ndarray,
    jaccard_threshold: float,
    n_tasks: int | None = None,
) -> list[tuple[int, int]]:
    """Driver-held verification parallelized over Ray TASKS: the sorted
    shingle arrays ship once via ray.put (plasma zero-copy reads), the
    pair list splits into left-doc-aligned ranges, each task runs the
    shared vectorized kernel. Exactly the driver path's edges (disjoint
    ranges, same kernel) at ~n_tasks-way parallelism — closes the last
    single-core driver stage in minhash_lsh_dedup (1.9 s -> ~0.3 s on
    sf0.1's 243k candidate pairs)."""
    global _verify_range_task

    if n_tasks is None:
        n_tasks = max(4, int(ray.cluster_resources().get("CPU", 8)))
    o = np.lexsort((sh_val, sh_doc))
    sh_doc, sh_val = sh_doc[o], sh_val[o]
    po = np.lexsort((cb, ca))
    ca, cb = ca[po], cb[po]
    sh_ref = ray.put((sh_doc, sh_val))
    # split points aligned to left-doc boundaries so each doc's pair run
    # lands in exactly one task
    raw = np.linspace(0, len(ca), n_tasks + 1).astype(np.int64)[1:-1]
    splits = np.unique(np.searchsorted(ca, ca[np.minimum(raw, len(ca) - 1)]))
    starts = np.r_[0, splits]
    ends = np.r_[splits, len(ca)]
    if _verify_range_task is None:
        _verify_range_task = ray.remote(_verify_range)
    futs = [
        _verify_range_task.remote(sh_ref, ca[s:e], cb[s:e], float(jaccard_threshold))
        for s, e in zip(starts, ends)
        if e > s
    ]
    out: list[tuple[int, int]] = []
    for a_arr, b_arr in ray.get(futs):
        out.extend(zip(a_arr.tolist(), b_arr.tolist()))
    return out


def _candidate_need_map(cand, P: int) -> tuple[np.ndarray, np.ndarray]:
    """Distinct (doc, partition) need rows for candidate pairs, sorted by
    (doc, partition): which verify partitions need each doc's payload.
    DataFrame input -> one driver np.unique; Dataset input -> per-batch
    partial dedup + bounded driver merge — the merge is O(distinct
    candidate docs x band replication), never O(pairs), so the candidate
    pair set itself stays off the driver (VERDICT r2 #2)."""
    if isinstance(cand, pd.DataFrame):
        ca = cand["a"].to_numpy().astype(np.int64)
        cb = cand["b"].to_numpy().astype(np.int64)
        pp = (ca % P).astype(np.int64)
        need = np.unique(
            np.stack(
                [np.concatenate([ca, cb]), np.concatenate([pp, pp])], axis=1
            ),
            axis=0,
        )
        return need[:, 0], need[:, 1]

    def partial(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["a"].to_numpy(zero_copy_only=False), np.int64)
        b = np.asarray(batch["b"].to_numpy(zero_copy_only=False), np.int64)
        pp = (a % P).astype(np.int64)
        dp = np.unique(
            np.stack(
                [np.concatenate([a, b]), np.concatenate([pp, pp])], axis=1
            ),
            axis=0,
        )
        return pa.table({"doc": pa.array(dp[:, 0]), "part": pa.array(dp[:, 1])})

    parts_tbl = pa.concat_tables(
        ray.get(
            cand.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
        ),
        promote_options="default",
    )
    dp = np.unique(
        np.stack(
            [
                np.asarray(parts_tbl["doc"].to_numpy(zero_copy_only=False), np.int64),
                np.asarray(parts_tbl["part"].to_numpy(zero_copy_only=False), np.int64),
            ],
            axis=1,
        ),
        axis=0,
    )
    return dp[:, 0], dp[:, 1]


def _verify_pairs_distributed(
    sh_ds,
    cand,
    jaccard_threshold: float,
    n_parts: int | None = None,
    need: tuple[np.ndarray, np.ndarray] | None = None,
):
    """Exact-Jaccard verification distributed by PAIR partitions (the
    scale path — VERDICT.md round-1 #3): pairs are hash-partitioned by
    their left doc; each candidate doc's shingle rows are replicated to
    the partitions that need that doc ONCE (not once per pair — a
    broadcast need-map drives a vectorized range-gather), then a single
    keyed groupby co-locates each partition's pairs with all the shingle
    sets they touch and runs the same vectorized kernel as the driver
    path. Shuffle volume is O(candidate-doc shingles x replication),
    per-group Python is O(partitions).

    ``cand`` may be a pandas frame (small/forced runs) or a Dataset —
    with a Dataset the candidate pairs NEVER land on the driver: the
    need-map comes from a bounded distinct merge and the pair rows join
    the shuffle as a mapped Dataset. Returns the verified unique edges as
    a DATASET of (a, b); callers collect it only when their components
    mode is driver-side."""
    import ray.data as rd

    P = n_parts if n_parts is not None else _default_parts()
    if need is None:
        need = _candidate_need_map(cand, P)
    nd, npart = need
    run_starts = np.flatnonzero(np.r_[True, nd[1:] != nd[:-1]])
    run_docs = nd[run_starts]
    run_lens = np.diff(np.append(run_starts, len(nd)))
    need_ref = ray.put((run_docs, run_starts, run_lens, npart))

    def fan(batch: pa.Table) -> pa.Table:
        rdocs, rstarts, rlens, rparts = cached_object(need_ref)
        doc = np.asarray(batch["doc_id"].to_numpy(zero_copy_only=False))
        sh = np.asarray(batch["shingle"].to_numpy(zero_copy_only=False))
        pos = np.searchsorted(rdocs, doc)
        posc = np.minimum(pos, max(len(rdocs) - 1, 0))
        ok = (
            (pos < len(rdocs)) & (rdocs[posc] == doc)
            if len(rdocs)
            else np.zeros(len(doc), bool)
        )
        doc, sh, posc = doc[ok], sh[ok], posc[ok]
        lens = rlens[posc]
        idx = _ranges_gather(rstarts[posc], lens)
        return pa.table(
            {
                "part": pa.array(rparts[idx]),
                "doc_id": pa.array(np.repeat(doc, lens)),
                "shingle": pa.array(np.repeat(sh, lens)),
                "a": pa.array(np.full(int(lens.sum()), -1, dtype=np.int64)),
                "b": pa.array(np.full(int(lens.sum()), -1, dtype=np.int64)),
            }
        )

    def pairs_to_rows(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["a"].to_numpy(zero_copy_only=False), np.int64)
        b = np.asarray(batch["b"].to_numpy(zero_copy_only=False), np.int64)
        return pa.table(
            {
                "part": pa.array((a % P).astype(np.int64)),
                "doc_id": pa.array(np.full(len(a), -1, dtype=np.int64)),
                "shingle": pa.array(np.full(len(a), -1, dtype=np.int64)),
                "a": pa.array(a),
                "b": pa.array(b),
            }
        )

    if isinstance(cand, pd.DataFrame):
        ca = cand["a"].to_numpy().astype(np.int64)
        cb = cand["b"].to_numpy().astype(np.int64)
        pair_rows_ds = rd.from_arrow(
            pairs_to_rows(pa.table({"a": pa.array(ca), "b": pa.array(cb)}))
        )
    else:
        pair_rows_ds = cand.map_batches(pairs_to_rows, batch_format="pyarrow")

    union = sh_ds.map_batches(fan, batch_format="pyarrow").union(pair_rows_ds)

    thr = float(jaccard_threshold)

    def verify_part(g: pa.Table) -> pa.Table:
        a_all = np.asarray(g["a"].to_numpy(zero_copy_only=False), np.int64)
        is_pair = a_all >= 0
        pca = a_all[is_pair]
        pcb = np.asarray(g["b"].to_numpy(zero_copy_only=False), np.int64)[is_pair]
        if not len(pca):
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
            )
        pca, pcb = _dedupe_sorted_pairs(pca, pcb)
        doc_arrays = _doc_arrays_from_sorted(
            np.asarray(g["doc_id"].to_numpy(zero_copy_only=False), np.int64)[~is_pair],
            np.asarray(g["shingle"].to_numpy(zero_copy_only=False), np.int64)[~is_pair],
        )
        got = _verify_with_doc_arrays(pca, pcb, doc_arrays, thr)
        return pa.table(
            {
                "a": pa.array(np.array([x[0] for x in got], dtype=np.int64)),
                "b": pa.array(np.array([x[1] for x in got], dtype=np.int64)),
            }
        )

    return union.groupby("part").map_groups(verify_part, batch_format="pyarrow")


def _key_sums(k: np.ndarray, *ns: np.ndarray):
    """Per-distinct-key sums of each value array in ``ns`` over ONE
    ``np.unique`` sort of ``k`` (the int-census merge core shared by the
    hash censuses and the duplicate-id-claim checks): returns
    ``(unique_keys, summed_1, ..., summed_n)``. Variadic so multi-column
    digests (the collapse census's cnt + bl) pay the dominant O(n log n)
    key sort once, not per column."""
    u, inv = np.unique(k, return_inverse=True)
    sums = []
    for n in ns:
        tot = np.zeros(len(u), np.int64)
        np.add.at(tot, inv, n)
        sums.append(tot)
    return (u, *sums)


def _sorted_member(sorted_arr: np.ndarray, vals: np.ndarray) -> np.ndarray:
    """Membership of ``vals`` in a SORTED int64 array via searchsorted
    (the hash-census broadcast probe; empty set -> all False)."""
    if not len(sorted_arr):
        return np.zeros(len(vals), bool)
    ix = np.searchsorted(sorted_arr, vals)
    return (ix < len(sorted_arr)) & (
        sorted_arr[np.minimum(ix, len(sorted_arr) - 1)] == vals
    )


def _collapse_exact_texts(
    ds, id_col: str, text_col: str, driver_merge_max_rows: int,
    want_doc_map: bool = True,
    census: str = "hash",
    max_broadcast_bytes: int = 1 << 30,
):
    """EXACT-dup collapse before near-dup banding (round-4 scale fix):
    templated corpora repeat byte-identical texts thousands of times —
    banding every copy floods the LSH buckets (the cap then TRUNCATES
    real near-dup partners) and the verifier re-proves jaccard=1 for
    millions of identical pairs. Collapse first: one representative per
    distinct text (rep = MIN doc id, so downstream min-member group ids
    are unchanged), band/verify/cluster the reps, expand at the end.
    Returns (reps_ds, doc_map_ds): reps = ({id_col}: rep id, {text_col},
    n_members), doc_map = ({id_col}, rep_id) for every non-null-text doc.

    Scale shape (``census="hash"``, the default — round-5): a web-scale
    corpus is MOSTLY byte-unique, and unique texts don't need to shuffle
    at all. Pass 1 is an int64 full-content hash census (one (hash, cnt)
    int row per distinct hash per block through the shared digest merge);
    texts whose hash is globally unduplicated become their OWN
    representative straight off the streaming scan (zero shuffle, rep id
    = own id, n_members = 1 — exact: a unique hash implies a unique
    text). Only duplicated-hash texts (true dups + ~n^2/2^64 expected
    collisions, resolved string-exact) run the original string digest
    merge and — for ``want_doc_map`` — the doc->rep text equi_join, so
    the all-to-alls carry the DUPLICATED subset instead of the corpus.
    ``census="string"`` keeps the direct one-pass string census
    (forced-parity tests; automatic fallback when the duplicated-hash
    set exceeds ``max_broadcast_bytes``)."""
    import ray.data as rd

    from raylink.aggs import _default_parts, _digest_merge
    from raylink.joins import _string_part_hash, equi_join
    from raylink.pipeline import ARROW_STR_WIDEN_BOUND

    P = _default_parts(None)
    if census not in ("hash", "string"):
        raise ValueError("census must be 'hash' or 'string'")
    _schema = ds.schema()
    id_type = dict(zip(_schema.names, _schema.types))[id_col]
    # driver-snapshotted text type: empty post-split blocks must emit the
    # SAME type as nonempty ones or from_arrow_refs sees divergent
    # schemas (the take_token_budget empty-block landmark)
    text_type = dict(zip(_schema.names, _schema.types))[text_col]

    def partial(batch: pa.Table) -> pa.Table:
        txt = batch[text_col].combine_chunks()
        valid = pc.is_valid(txt)
        sel = batch.filter(valid) if txt.null_count else batch
        if not sel.num_rows:
            return pa.table(
                {
                    "t": pa.array([], pa.string()),
                    "mn": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                    "part": pa.array([], pa.int64()),
                }
            )
        ids = np.asarray(
            sel[id_col].to_numpy(zero_copy_only=False), np.int64
        )
        codes, uniques = pd.factorize(
            sel[text_col].combine_chunks().to_numpy(zero_copy_only=False)
        )
        mn = np.full(len(uniques), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(mn, codes, ids)
        cnt = np.bincount(codes, minlength=len(uniques)).astype(np.int64)
        tarr = pa.array(uniques, type=pa.string())
        return pa.table(
            {
                "t": tarr,
                "mn": pa.array(mn),
                "cnt": pa.array(cnt),
                "part": pa.array(
                    (_string_part_hash(tarr) % np.uint64(P)).astype(np.int64)
                ),
            }
        )

    def _make_merge(force_wide: bool):
        # full document texts ride this digest: widen to large_string
        # above the int32-offset bound BEFORE the single-array combine
        # (the ARROW_STR_WIDEN_BOUND convention; overflow would otherwise
        # raise ArrowCapacityError at ~2 GiB of concatenated text).
        # ``force_wide`` makes the output type a DRIVER decision (hash
        # path: census byte total with a 2x margin; string path: the
        # materialized partials' block-metadata byte total, which the
        # merge input is a subset of) — a per-partition adaptive widen
        # would emit large_string from some partitions and string from
        # others, and the downstream union / equi_join would then mix
        # schemas (round-5 review finding). If a narrow decision is ever
        # contradicted by an actual partition (census estimate undershot
        # past its margin), raise loudly instead of silently widening —
        # mixed schemas corrupt the downstream join, a crash does not.
        widen_bound = ARROW_STR_WIDEN_BOUND  # captured value: worker
        # bodies must not import raylink at runtime
        empty_otype = pa.large_string() if force_wide else (
            pa.large_string() if pa.types.is_large_string(text_type)
            else pa.string()
        )

        def merge(g: pa.Table) -> pa.Table:
            t_in = g["t"]
            if force_wide:
                if not pa.types.is_large_string(t_in.type):
                    g = g.set_column(
                        g.column_names.index("t"), "t",
                        t_in.cast(pa.large_string()),
                    )
            elif (
                pa.types.is_string(t_in.type)
                and t_in.nbytes > widen_bound
            ):
                raise RuntimeError(
                    "collapse merge partition exceeds the int32 string-"
                    "offset bound but the driver census decided against "
                    "widening — the byte estimate undershot its 2x "
                    "margin; report this (per-partition widening would "
                    "silently mix string/large_string block schemas)"
                )
            t = g["t"].combine_chunks()
            if not len(t):
                return pa.table(
                    {
                        id_col: pa.array([], pa.int64()),
                        text_col: pa.array([], empty_otype),
                        "n_members": pa.array([], pa.int64()),
                    }
                )
            codes, uniques = pd.factorize(t.to_numpy(zero_copy_only=False))
            mn = np.full(len(uniques), np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(mn, codes, g["mn"].to_numpy(zero_copy_only=False))
            cnt = np.zeros(len(uniques), dtype=np.int64)
            np.add.at(cnt, codes, g["cnt"].to_numpy(zero_copy_only=False))
            otype = (
                pa.large_string()
                if pa.types.is_large_string(t.type)
                else pa.string()
            )
            return pa.table(
                {
                    id_col: pa.array(mn),
                    text_col: pa.array(np.asarray(uniques), type=otype),
                    "n_members": pa.array(cnt),
                }
            )

        return merge

    use_hash = census == "hash"
    # driver-decided large_string widening for every text the merge /
    # union / join path emits — on EVERY path (hash census: byte totals
    # with a margin; string census: the materialized partials' metadata
    # byte total). Per-partition adaptive widening is banned here: it
    # mixes string/large_string block schemas (round-5 review finding).
    force_wide = False
    if use_hash:

        def hash_partial(batch: pa.Table) -> pa.Table:
            txt = batch[text_col].combine_chunks()
            sel = txt.filter(pc.is_valid(txt)) if txt.null_count else txt
            if not len(sel):
                return pa.table(
                    {
                        "h": pa.array([], pa.int64()),
                        "cnt": pa.array([], pa.int64()),
                        "bl": pa.array([], pa.int64()),
                        "part": pa.array([], pa.int64()),
                    }
                )
            u, idx, cnt = np.unique(
                _fnv64_strings(sel), return_index=True, return_counts=True
            )
            # bl = byte length of this block's instance of each distinct
            # hash: summed over duplicated hashes it is EXACTLY the
            # string-merge input size (one kind-1 row per (block, dup
            # text)), letting the driver decide large_string widening
            # deterministically instead of per merge partition
            lens = np.asarray(
                pc.binary_length(sel).to_numpy(zero_copy_only=False),
                np.int64,
            )
            return pa.table(
                {
                    "h": pa.array(u.astype(np.int64)),
                    "cnt": pa.array(cnt.astype(np.int64)),
                    "bl": pa.array(lens[idx]),
                    "part": pa.array((u % np.uint64(P)).astype(np.int64)),
                }
            )

        def hash_merge(g: pa.Table) -> pa.Table:
            # nd (total doc instances per dup hash) rides along so the
            # driver can bound the string-merge input ROW count: kind-1
            # rows are per-(block, dup text), so their count is <= nd
            # whatever the block structure — the offset-byte term of the
            # widen decision needs a bound that survives batching drift
            # between the census scan and the split scan
            h = np.asarray(g["h"].to_numpy(zero_copy_only=False), np.int64)
            u, tot, bl = _key_sums(
                h,
                np.asarray(g["cnt"].to_numpy(zero_copy_only=False), np.int64),
                np.asarray(g["bl"].to_numpy(zero_copy_only=False), np.int64),
            )
            dup = tot > 1
            return pa.table(
                {
                    "h": pa.array(u[dup]),
                    "bl": pa.array(bl[dup]),
                    "nd": pa.array(tot[dup]),
                }
            )

        hd_ds = _digest_merge(
            ds.select_columns([text_col]).map_batches(
                hash_partial, batch_format="pyarrow"
            ),
            hash_merge,
            max(driver_merge_max_rows, _INT_CENSUS_DRIVER_MAX),
        ).materialize()
        hd_tabs = [
            t
            for t in ray.get(hd_ds.to_arrow_refs())
            if t.num_rows and "h" in t.column_names
        ]
        hd = np.sort(
            np.concatenate(
                [
                    np.asarray(t["h"].to_numpy(zero_copy_only=False), np.int64)
                    for t in hd_tabs
                ]
                or [np.empty(0, np.int64)]
            )
        )
        # string-merge input bytes (see hash_partial's bl / hash_merge's
        # nd; the pc.sum calls read the plasma-mapped blocks zero-copy —
        # only the h arrays are copied onto the driver heap): the
        # driver-decided widen flag every merge partition and both union
        # sides share, so the output text type cannot diverge per block.
        # Data bytes are exact iff the census scan and the split scan see
        # the same batch boundaries (both default to whole-block batches
        # over the same plan); the 2x data + 16*rows margin absorbs
        # batching drift and the per-row offset/validity overhead the
        # backstop's nbytes check counts — widening early is always safe,
        # and the merge raises loudly if the margin is ever breached.
        dup_in_bytes = sum(
            int(pc.sum(t["bl"]).as_py() or 0) for t in hd_tabs
        )
        dup_rows = sum(
            int(pc.sum(t["nd"]).as_py() or 0) for t in hd_tabs
        )
        force_wide = (
            2 * dup_in_bytes + 16 * dup_rows > ARROW_STR_WIDEN_BOUND
        )
        if hd.nbytes > max_broadcast_bytes:
            # heavily-templated corpus: fall back to the string census
            # below (its own driver decision takes over)
            use_hash = False

    parts_ds = None
    if not use_hash:
        # explicit census="string" and the broadcast-bound fallback:
        # materialize the census partials FIRST — their block-metadata
        # byte total dominates any merge partition's t-column nbytes
        # (the merge input IS this dataset: same blocks, plus 24 B/row of
        # int columns in the total), so the widen decision is a driver
        # decision here too, with no extra scan and no margin needed
        parts_ds = ds.select_columns([id_col, text_col]).map_batches(
            partial, batch_format="pyarrow"
        ).materialize()
        force_wide = parts_ds.size_bytes() > ARROW_STR_WIDEN_BOUND

    def _cast_wide(arr):
        # one copy of the "match the driver-decided merge output type"
        # cast for every consumer (kind-0 direct reps, the doc-map join
        # sides); captures the final force_wide — worker closures must
        # not import raylink at runtime
        if force_wide and not pa.types.is_large_string(arr.type):
            return arr.cast(pa.large_string())
        return arr

    merge = _make_merge(force_wide)

    if not use_hash:
        reps_ds = _digest_merge(
            parts_ds,
            merge,
            driver_merge_max_rows,
        ).materialize()
        # the driver-merge path returns ONE block — repartition so
        # banding / shingling parallelize (measured 21 s -> 3 s at 20k
        # reps x 32 cpus)
        n_reps = reps_ds.count()
        target_blocks = max(
            1,
            min(int(ray.cluster_resources().get("CPU", 8)) * 2, n_reps // 256),
        )
        if 1 < target_blocks and reps_ds.num_blocks() < target_blocks:
            reps_ds = reps_ds.repartition(target_blocks).materialize()

        if not want_doc_map:
            # survivor-only callers (exact_dedup_survivors) skip the
            # doc->rep join entirely — equi_join's broadcast prep
            # otherwise eagerly collects every distinct text to the
            # driver for a map that would be thrown away
            return reps_ds, None

        rep_slim = reps_ds.select_columns([text_col, id_col]).map_batches(
            lambda b: pa.table(
                {text_col: b[text_col], "rep_id": b[id_col]}
            ),
            batch_format="pyarrow",
        )
        join_left = ds.select_columns([id_col, text_col])
        if force_wide and not pa.types.is_large_string(text_type):
            # reps were force-widened: the join key types must match
            join_left = join_left.map_batches(
                lambda b: b.set_column(
                    b.column_names.index(text_col),
                    text_col,
                    _cast_wide(b[text_col]),
                ),
                batch_format="pyarrow",
            )
        joined = equi_join(
            join_left,
            rep_slim,
            text_col,
            text_col,
            left_cols=(id_col,),
            right_cols=("rep_id",),
        )
        # left lazy: the pandas expansion branch streams it exactly once;
        # the Dataset branch materializes it itself before its two joins
        doc_map_ds = joined.map_batches(
            lambda b: pa.table({id_col: b[id_col], "rep_id": b["rep_id"]}),
            batch_format="pyarrow",
        )
        return reps_ds, doc_map_ds

    if not len(hd):
        # globally duplicate-free corpus (the common web-scale case):
        # every doc is its own representative — pure streaming renames,
        # no shuffle, no staged materialization, nothing held in plasma.
        def all_direct(batch: pa.Table) -> pa.Table:
            txt = batch[text_col].combine_chunks()
            sel = batch.filter(pc.is_valid(txt)) if txt.null_count else batch
            return pa.table(
                {
                    id_col: sel[id_col].cast(pa.int64()),
                    text_col: sel[text_col],
                    "n_members": pa.array(
                        np.ones(sel.num_rows, np.int64)
                    ),
                }
            )

        reps_ds = ds.select_columns([id_col, text_col]).map_batches(
            all_direct, batch_format="pyarrow"
        )
        if not want_doc_map:
            return reps_ds, None

        def all_ident(batch: pa.Table) -> pa.Table:
            txt = batch[text_col].combine_chunks()
            sel = batch.filter(pc.is_valid(txt)) if txt.null_count else batch
            return pa.table(
                {
                    id_col: sel[id_col],
                    "rep_id": sel[id_col].cast(pa.int64()),
                }
            )

        return reps_ds, ds.select_columns([id_col, text_col]).map_batches(
            all_ident, batch_format="pyarrow"
        )

    # hash path with dups present: one split scan. kind 0 = globally-
    # unique text (its own rep, identity doc-map row), kind 1 = per-block
    # DISTINCT duplicated-hash text (feeds the string digest merge),
    # kind 2 = per-DOC duplicated-hash row (feeds the doc->rep join;
    # emitted only when the caller wants the map).
    hd_ref = ray.put(hd)
    emit_doc_rows = bool(want_doc_map)

    def split_scan(batch: pa.Table) -> pa.Table:
        txt = batch[text_col].combine_chunks()
        sel = batch.filter(pc.is_valid(txt)) if txt.null_count else batch
        txtc = sel[text_col].combine_chunks()
        utype = txtc.type if len(txtc) else text_type
        if not sel.num_rows:
            return pa.table(
                {
                    "t": pa.array([], utype),
                    "mn": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                    "part": pa.array([], pa.int64()),
                    "kind": pa.array([], pa.int8()),
                }
            )
        ids = np.asarray(
            sel[id_col].to_numpy(zero_copy_only=False), np.int64
        )
        hit = _sorted_member(
            cached_object(hd_ref), _fnv64_strings(txtc).astype(np.int64)
        )
        miss_arr = pa.array(~hit)
        t_out = [txtc.filter(miss_arr)]
        mn_out = [ids[~hit]]
        cnt_out = [np.ones(int((~hit).sum()), np.int64)]
        part_out = [np.zeros(int((~hit).sum()), np.int64)]
        kind_out = [np.zeros(int((~hit).sum()), np.int8)]
        if hit.any():
            hit_arr = pa.array(hit)
            dup_txt = txtc.filter(hit_arr)
            dup_ids = ids[hit]
            codes, uniques = pd.factorize(
                dup_txt.to_numpy(zero_copy_only=False)
            )
            mn = np.full(len(uniques), np.iinfo(np.int64).max, np.int64)
            np.minimum.at(mn, codes, dup_ids)
            cnt = np.bincount(codes, minlength=len(uniques)).astype(np.int64)
            uarr = pa.array(uniques, type=utype)
            t_out.append(uarr)
            mn_out.append(mn)
            cnt_out.append(cnt)
            part_out.append(
                (_string_part_hash(uarr) % np.uint64(P)).astype(np.int64)
            )
            kind_out.append(np.ones(len(uniques), np.int8))
            if emit_doc_rows:
                t_out.append(dup_txt)
                mn_out.append(dup_ids)
                cnt_out.append(np.zeros(len(dup_ids), np.int64))
                part_out.append(np.zeros(len(dup_ids), np.int64))
                kind_out.append(np.full(len(dup_ids), 2, np.int8))
        return pa.table(
            {
                "t": pa.concat_arrays(
                    [c.combine_chunks() if isinstance(c, pa.ChunkedArray)
                     else c for c in t_out]
                ),
                "mn": pa.array(np.concatenate(mn_out)),
                "cnt": pa.array(np.concatenate(cnt_out)),
                "part": pa.array(np.concatenate(part_out)),
                "kind": pa.array(np.concatenate(kind_out)),
            }
        )

    staged = ds.select_columns([id_col, text_col]).map_batches(
        split_scan, batch_format="pyarrow"
    )
    if want_doc_map:
        # three consumers (dup merge, direct reps, identity + join doc
        # rows) — cache the scan; the survivor-only caller has two and
        # streams instead (an extra scan beats a corpus-sized plasma
        # copy at scale)
        staged = staged.materialize()

    def keep_dup(batch: pa.Table) -> pa.Table:
        sel = batch.filter(pc.equal(batch["kind"], 1))
        return sel.select(["t", "mn", "cnt", "part"])

    def keep_direct(batch: pa.Table) -> pa.Table:
        sel = batch.filter(pc.equal(batch["kind"], 0))
        t = _cast_wide(sel["t"])  # match the merge side's type
        return pa.table(
            {
                id_col: sel["mn"],
                text_col: t,
                "n_members": sel["cnt"],
            }
        )

    dup_reps = _digest_merge(
        staged.map_batches(keep_dup, batch_format="pyarrow"),
        merge,
        driver_merge_max_rows,
    ).materialize()
    n_dup_reps = dup_reps.count()
    target_blocks = max(
        1,
        min(int(ray.cluster_resources().get("CPU", 8)) * 2,
            n_dup_reps // 256),
    )
    if 1 < target_blocks and dup_reps.num_blocks() < target_blocks:
        dup_reps = dup_reps.repartition(target_blocks).materialize()
    reps_ds = staged.map_batches(keep_direct, batch_format="pyarrow")
    if n_dup_reps:
        reps_ds = reps_ds.union(dup_reps)

    if not want_doc_map:
        return reps_ds, None

    def ident_map(batch: pa.Table) -> pa.Table:
        sel = batch.filter(pc.equal(batch["kind"], 0))
        return pa.table(
            {
                id_col: sel["mn"].cast(id_type),
                "rep_id": sel["mn"],
            }
        )

    doc_map_ds = staged.map_batches(ident_map, batch_format="pyarrow")
    if n_dup_reps:

        def dup_docs(batch: pa.Table) -> pa.Table:
            sel = batch.filter(pc.equal(batch["kind"], 2))
            t = _cast_wide(sel["t"])  # join key must match reps
            return pa.table(
                {id_col: sel["mn"].cast(id_type), text_col: t}
            )

        rep_slim = dup_reps.select_columns([text_col, id_col]).map_batches(
            lambda b: pa.table(
                {text_col: b[text_col], "rep_id": b[id_col]}
            ),
            batch_format="pyarrow",
        )
        joined = equi_join(
            staged.map_batches(dup_docs, batch_format="pyarrow"),
            rep_slim,
            text_col,
            text_col,
            left_cols=(id_col,),
            right_cols=("rep_id",),
        )
        doc_map_ds = doc_map_ds.union(
            joined.map_batches(
                lambda b: pa.table(
                    {id_col: b[id_col], "rep_id": b["rep_id"]}
                ),
                batch_format="pyarrow",
            )
        )
    return reps_ds, doc_map_ds


def _make_multi_fn(id_col: str, text_col: str, k: int):
    """Batch fn: multi-member reps (n_members >= 2) that HAVE at least one
    shingle — gramless texts never verify in the uncollapsed pipeline
    (jaccard over empty sets), so their repeats must not self-group."""

    def multi(b: pa.Table) -> pa.Table:
        keep = (
            np.asarray(b["n_members"].to_numpy(zero_copy_only=False)) >= 2
        )
        sel = b.filter(pa.array(keep))
        if sel.num_rows:
            d, _ = _shingle_hashes(sel[text_col].combine_chunks(), k)
            has = np.zeros(sel.num_rows, dtype=bool)
            if len(d):
                has[np.unique(d)] = True
            sel = sel.filter(pa.array(has))
        return pa.table({"rep_id": sel[id_col]})

    return multi


def _expand_collapsed_groups(
    rep_groups,
    reps_ds,
    doc_map_ds,
    id_col: str,
    text_col: str,
    k: int,
    output: str,
):
    """Expand rep-level near-dup groups back to all docs: (1) every doc
    joins its rep's group; (2) multi-member texts whose rep is in NO
    rep-level group form their own exact-dup group (id = rep id = min
    member id), but ONLY when the text has >= 1 shingle — gramless docs
    never verify in the uncollapsed pipeline (empty jaccard), so they
    must not group here either."""
    import ray.data as rd

    from raylink.joins import equi_join, semi_join

    if isinstance(rep_groups, pd.DataFrame):
        # pandas rep groups are driver-sized by construction (the inner
        # pipeline's own output bound) — expand in ONE broadcast
        # streaming pass over doc_map (zero shuffles, zero extra
        # pipelines; the join path below costs ~6 Dataset executions of
        # fixed overhead, measured 9.1 s vs 3.5 s on the 5k-doc bench)
        multi_df = reps_ds.map_batches(
            _make_multi_fn(id_col, text_col, k), batch_format="pyarrow"
        ).to_pandas()  # rep-bounded
        rep_ids = rep_groups["doc_id"].to_numpy(dtype=np.int64)
        rep_grp = rep_groups["dup_group"].to_numpy(dtype=np.int64)
        multi_ids = (
            multi_df["rep_id"].to_numpy(dtype=np.int64)
            if "rep_id" in multi_df.columns  # empty ds loses its schema
            else np.empty(0, dtype=np.int64)
        )
        self_ids = np.setdiff1d(multi_ids, rep_ids)
        keys = np.concatenate([rep_ids, self_ids])
        vals = np.concatenate([rep_grp, self_ids])  # self group id = rep id
        order = np.argsort(keys, kind="stable")
        keys, vals = keys[order], vals[order]
        lookup_ref = ray.put((keys, vals))

        def expand(batch: pa.Table) -> pa.Table:
            ks, vs = cached_object(lookup_ref)
            rid = np.asarray(
                batch["rep_id"].to_numpy(zero_copy_only=False), np.int64
            )
            pos = np.searchsorted(ks, rid)
            posc = np.minimum(pos, max(len(ks) - 1, 0))
            hit = (
                (pos < len(ks)) & (ks[posc] == rid)
                if len(ks)
                else np.zeros(len(rid), bool)
            )
            sel = batch.filter(pa.array(hit))
            return pa.table(
                {
                    "doc_id": sel[id_col],
                    "dup_group": pa.array(vs[posc[hit]] if len(ks) else []),
                }
            )

        out = doc_map_ds.map_batches(
            expand, batch_format="pyarrow"
        )
        if output == "dataset":
            return out
        outp = out.to_pandas()
        if not len(outp):
            return pd.DataFrame(
                {"doc_id": [], "dup_group": []}
            ).astype(np.int64)
        return outp.astype(np.int64).sort_values(
            ["dup_group", "doc_id"], ignore_index=True
        )

    rg_ds = rep_groups

    def rg_rename(b: pa.Table) -> pa.Table:
        if "doc_id" not in b.column_names:  # empty placeholder block
            return pa.table(
                {
                    "rep_id": pa.array([], pa.int64()),
                    "dup_group": pa.array([], pa.int64()),
                }
            )
        return pa.table({"rep_id": b["doc_id"], "dup_group": b["dup_group"]})

    rg = rg_ds.map_batches(rg_rename, batch_format="pyarrow").materialize()
    have_rep_groups = rg.count() > 0  # a zero-block/zero-row dataset has
    # no inferable schema — skip the joins that would probe it

    # the Dataset branch feeds doc_map into TWO equi_joins (rep groups +
    # exact-dup self groups); materialize the slim (doc_id, rep_id) map
    # once so the corpus-wide collapse pipeline behind it doesn't
    # re-execute per consumer (16 B/row — object-store-spillable)
    doc_map_ds = doc_map_ds.materialize()

    if have_rep_groups:
        grouped = equi_join(
            doc_map_ds,
            rg,
            "rep_id",
            "rep_id",
            left_cols=(id_col,),
            right_cols=("dup_group",),
        ).map_batches(
            lambda b: pa.table(
                {"doc_id": b[id_col], "dup_group": b["dup_group"]}
            ),
            batch_format="pyarrow",
        )
    else:
        grouped = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "dup_group": pa.array([], pa.int64()),
                }
            )
        )

    multi_reps = reps_ds.map_batches(
        _make_multi_fn(id_col, text_col, k), batch_format="pyarrow"
    )
    self_reps = (
        semi_join(multi_reps, rg, "rep_id", "rep_id", anti=True)
        if have_rep_groups
        else multi_reps  # nothing to exclude
    ).materialize()  # rep-bounded; an all-empty result loses its schema,
    # so the join below is skipped instead of probing a None schema
    if self_reps.count():
        self_rows = equi_join(
            doc_map_ds,
            self_reps,
            "rep_id",
            "rep_id",
            left_cols=(id_col,),
        ).map_batches(
            lambda b: pa.table(
                {"doc_id": b[id_col], "dup_group": b["rep_id"]}
            ),
            batch_format="pyarrow",
        )
        res = grouped.union(self_rows)
    else:
        res = grouped
    if output == "dataset":
        return res
    out = res.to_pandas()
    if not len(out):
        return pd.DataFrame({"doc_id": [], "dup_group": []}).astype(np.int64)
    return (
        out.astype(np.int64)
        .sort_values(["dup_group", "doc_id"], ignore_index=True)
    )


def minhash_lsh_dedup(
    ds,
    id_col: str,
    text_col: str,
    k: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.7,
    max_bucket: int = 200,
    components: str = "auto",
    verification: str = "auto",
    driver_verify_max_pairs: int = 8_000_000,
    band_driver_threshold: int = 20_000_000,
    output: str = "dataset",
    taskpool_verify_min_pairs: int = 50_000,
    collapse_exact: bool = True,
    collapse_driver_merge_max_rows: int = 2_000_000,
):
    """Full MinHash-LSH near-dup pipeline. Returns (doc_id, dup_group)
    for every doc in a near-dup group, where dup_group is the minimal
    member id (connected components over verified pairs) — as an
    un-collected Dataset by DEFAULT (membership never lands on the
    driver; ``output="pandas"`` is the small-scale opt-in, VERDICT r4
    #5 — note it also relaxes verification to the driver/task-pool
    fast paths, so it is FASTER at small scale).

    Verification is exact Jaccard over shingle sets of the CANDIDATE docs
    only (fetched via a filtered second read — candidates are a tiny
    fraction of the corpus). ``verification``: "driver" keeps the
    vectorized driver-side pass, "distributed" shuffles (pair, shingle)
    rows through two keyed groupbys so verification scales with the
    cluster, "auto" (default) switches to distributed above
    ``driver_verify_max_pairs`` candidates. When the band table exceeds
    ``band_driver_threshold`` rows, the candidate pairs are themselves a
    Dataset and NEVER land on the driver: pair dedup happens inside the
    verify partitions (partitioning is a function of the left doc, so
    per-partition dedup is global), the need-map comes from a bounded
    distinct merge, and verified edges flow as a Dataset into the
    components stage. ``components="distributed"`` runs the transitive
    closure as iterative min-label propagation on Ray
    (raylink.linkage.distributed_connected_components) instead of
    driver-side union-find — the scale path when the verified edge set is
    itself large. ``output="dataset"`` (requires distributed verification
    AND components) returns the (doc_id, dup_group) Dataset un-collected
    for write_parquet consumption.

    ``collapse_exact`` (default True) collapses byte-identical texts to
    one representative BEFORE banding and expands the groups at the end
    (see :func:`_collapse_exact_texts`) — on templated corpora this cuts
    candidate-pair volume by the square of the duplication factor
    (measured 1.05M transcript rows -> 195k reps; the uncollapsed run was
    super-linear purely from identical-pair verification). Group ids and
    membership are unchanged wherever bucket caps don't bind; under caps
    the collapsed run has strictly better recall (identical copies no
    longer crowd real near-dup partners out of truncated buckets)."""
    if collapse_exact:
        reps_ds, doc_map_ds = _collapse_exact_texts(
            ds, id_col, text_col, collapse_driver_merge_max_rows
        )
        band_ds = reps_ds.map_batches(
            lambda t: minhash_band_rows(t, id_col, text_col, k, num_perm, bands),
            batch_format="pyarrow",
        )
        rep_groups = _minhash_after_bands(
            reps_ds, band_ds, id_col, text_col, k=k,
            jaccard_threshold=jaccard_threshold, max_bucket=max_bucket,
            components=components, verification=verification,
            driver_verify_max_pairs=driver_verify_max_pairs,
            band_driver_threshold=band_driver_threshold, output=output,
            taskpool_verify_min_pairs=taskpool_verify_min_pairs,
        )
        return _expand_collapsed_groups(
            rep_groups, reps_ds, doc_map_ds, id_col, text_col, k, output
        )
    band_ds = ds.map_batches(
        lambda t: minhash_band_rows(t, id_col, text_col, k, num_perm, bands),
        batch_format="pyarrow",
    )
    return _minhash_after_bands(
        ds, band_ds, id_col, text_col, k=k,
        jaccard_threshold=jaccard_threshold, max_bucket=max_bucket,
        components=components, verification=verification,
        driver_verify_max_pairs=driver_verify_max_pairs,
        band_driver_threshold=band_driver_threshold, output=output,
        taskpool_verify_min_pairs=taskpool_verify_min_pairs,
    )


def _minhash_after_bands(
    ds,
    band_ds,
    id_col: str,
    text_col: str,
    k: int,
    jaccard_threshold: float,
    max_bucket: int,
    components: str,
    verification: str,
    driver_verify_max_pairs: int,
    band_driver_threshold: int,
    output: str,
    taskpool_verify_min_pairs: int,
):
    """Candidate extraction -> verification -> components, shared by the
    streaming and the per-partition-resumable band producers."""
    if components == "auto":
        # dataset output requires the off-driver components path; pandas
        # output takes the bounded driver union-find fast path
        components = "distributed" if output == "dataset" else "driver"
    cand = candidate_pairs_from_bands(
        band_ds, max_bucket, driver_threshold=band_driver_threshold
    )
    if isinstance(cand, pd.DataFrame):
        if len(cand):
            cand = cand.drop_duplicates(ignore_index=True)
        n_pairs = len(cand)
    else:
        cand = cand.materialize()
        n_pairs = cand.count()  # pre-dedup upper bound — routing only
    if not n_pairs:
        empty = pd.DataFrame({"doc_id": [], "dup_group": []}).astype(np.int64)
        if output == "dataset":
            import ray.data as rd

            return rd.from_pandas(empty)
        return empty

    distributed = verification == "distributed" or (
        verification == "auto"
        # dataset output REQUIRES distributed verification: auto must
        # route there regardless of pair count (the loud error below is
        # for an EXPLICIT verification="driver" conflict only)
        and (n_pairs > driver_verify_max_pairs or output == "dataset")
    )
    if not distributed and not isinstance(cand, pd.DataFrame):
        # bounded collect: <= driver_verify_max_pairs rows by the auto rule
        cand = cand.to_pandas().drop_duplicates(ignore_index=True)

    P = _default_parts()
    need = None
    if distributed:
        need = _candidate_need_map(cand, P)
        nd_docs = need[0]
        cand_ids = nd_docs[np.r_[True, nd_docs[1:] != nd_docs[:-1]]]
    else:
        cand_ids = np.unique(
            np.concatenate([cand["a"].to_numpy(), cand["b"].to_numpy()])
        )
    cand_ids_ref = ray.put(cand_ids)

    # shingle sets of candidate docs only (cand_ids broadcast by ref —
    # worker-global cache, never a closure-captured array)
    def shingles_of(batch: pa.Table) -> pa.Table:
        cids = cached_object(cand_ids_ref)
        ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False))
        mask = np.isin(ids, cids)
        sel = batch.filter(pa.array(mask))
        if sel.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "shingle": pa.array([], pa.int64())})
        d, h = _shingle_hashes(sel[text_col].combine_chunks(), k)
        sids = np.asarray(sel[id_col].to_numpy(zero_copy_only=False))
        return pa.table({"doc_id": pa.array(sids[d]), "shingle": pa.array(h)})

    sh_ds_cand = ds.map_batches(shingles_of, batch_format="pyarrow")
    if not distributed:
        # byte-aware reroute (the self_top1 / remove_boilerplate switch
        # precedent): the pair-count rule alone admits corpora of LONG
        # documents whose candidate shingles exceed driver RAM — 4M
        # pairs of 20 KB docs is ~8M docs x 20k shingles x 16 B. The
        # shingle Dataset is materialized either way (the driver concat
        # consumes it); its metadata byte size decides.
        sh_ds_cand = sh_ds_cand.materialize()
        if (sh_ds_cand.size_bytes() or 0) > _DRIVER_SHINGLE_BYTES_MAX:
            if verification == "driver":
                raise ValueError(
                    "candidate shingles exceed the driver byte bound "
                    f"({_DRIVER_SHINGLE_BYTES_MAX} B) — pass "
                    'verification="distributed"'
                )
            distributed = True
            need = _candidate_need_map(cand, P)
    if distributed:
        edges_ds = _verify_pairs_distributed(
            sh_ds_cand, cand, jaccard_threshold, n_parts=P, need=need
        )
        return _components_from_edges_ds(edges_ds, components, output=output)
    if output == "dataset":
        raise ValueError(
            'output="dataset" requires verification="distributed"'
        )

    sh = pa.concat_tables(
        ray.get(sh_ds_cand.to_arrow_refs()), promote_options="default"
    )
    sh_doc = np.asarray(sh["doc_id"].to_numpy(zero_copy_only=False), np.int64)
    sh_val = np.asarray(sh["shingle"].to_numpy(zero_copy_only=False), np.int64)
    if len(cand) > taskpool_verify_min_pairs:
        # parallelize the exact-Jaccard pass across Ray tasks (same
        # kernel, left-doc-aligned disjoint ranges — identical edges)
        verified = _verify_pairs_taskpool(
            sh_doc, sh_val, cand["a"].to_numpy().astype(np.int64),
            cand["b"].to_numpy().astype(np.int64), jaccard_threshold,
        )
        return _components_output(verified, components)
    doc_arrays = _doc_arrays_from_sorted(sh_doc, sh_val)
    verified = _verify_with_doc_arrays(
        cand["a"].to_numpy(), cand["b"].to_numpy(), doc_arrays,
        jaccard_threshold,
    )
    return _components_output(verified, components)


def _components_from_edges_ds(edges_ds, components: str, output: str = "pandas"):
    """Verified-edge DATASET -> (doc_id, dup_group). Distributed mode
    feeds the Dataset straight into min-label propagation (edges never
    land on the driver); driver mode collects the verified edge set
    (far smaller than the candidate set) for union-find.

    ``output="dataset"`` (distributed components only) returns the label
    Dataset un-collected — the 100-TB path where even the group table is
    too big for the driver; consume with write_parquet."""
    edges_ds = edges_ds.materialize()
    if edges_ds.count() == 0:
        if output == "dataset":
            import ray.data as rd

            return rd.from_arrow(
                pa.table(
                    {
                        "doc_id": pa.array([], pa.int64()),
                        "dup_group": pa.array([], pa.int64()),
                    }
                )
            )
        return pd.DataFrame({"doc_id": [], "dup_group": []}).astype(np.int64)
    if components == "distributed":
        from raylink.linkage import distributed_connected_components

        labels_ds = distributed_connected_components(edges_ds)
        if output == "dataset":
            def rename(batch: pa.Table) -> pa.Table:
                return pa.table(
                    {"doc_id": batch["node"], "dup_group": batch["label"]}
                )

            return labels_ds.map_batches(rename, batch_format="pyarrow")
        labels = labels_ds.to_pandas()
        out = labels.rename(columns={"node": "doc_id", "label": "dup_group"})
        return out.astype(np.int64).sort_values(
            ["dup_group", "doc_id"], ignore_index=True
        )
    if output == "dataset":
        raise ValueError(
            'output="dataset" requires components="distributed" '
            "(driver union-find necessarily collects)"
        )
    out = edges_ds.to_pandas()
    verified = list(zip(out["a"].tolist(), out["b"].tolist()))
    return _components_output(verified, "driver")


def _components_output(
    verified: list[tuple[int, int]], components: str
) -> pd.DataFrame:
    """Verified edges -> (doc_id, dup_group) via transitive closure:
    driver union-find, or distributed min-label propagation."""
    if not verified:
        return pd.DataFrame({"doc_id": [], "dup_group": []}).astype(np.int64)

    if components == "distributed":
        import ray.data as rd

        from raylink.linkage import distributed_connected_components

        edges = pa.table(
            {
                "a": pa.array([e[0] for e in verified], type=pa.int64()),
                "b": pa.array([e[1] for e in verified], type=pa.int64()),
            }
        )
        labels = distributed_connected_components(rd.from_arrow(edges)).to_pandas()
        out = labels.rename(columns={"node": "doc_id", "label": "dup_group"})
        return out.astype(np.int64).sort_values(
            ["dup_group", "doc_id"], ignore_index=True
        )

    from raylink.linkage import UnionFind

    uf = UnionFind()
    for a, b in verified:
        uf.union(a, b)
    rows = []
    for root, members in uf.groups().items():
        if len(members) < 2:
            continue
        canon = min(members)
        for m in members:
            rows.append((m, canon))
    out = pd.DataFrame(rows, columns=["doc_id", "dup_group"]).astype(np.int64)
    return out.sort_values(["dup_group", "doc_id"], ignore_index=True)


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def simhash_batch(texts: pa.Array, k: int = 4, return_mask: bool = False):
    """64-bit simhash per doc from k-char shingle hashes (unweighted).
    ``return_mask=True`` also returns the per-doc has-grams mask: docs
    whose cleaned text is shorter than k all hash to 0, so the DEDUP
    pipeline must exclude them (they are not near-dups of each other)."""
    n = len(texts)
    doc_ids, sh = _shingle_hashes(texts, k)
    out = np.zeros(n, dtype=np.uint64)
    has = np.zeros(n, dtype=bool)
    if len(sh) == 0:
        return (out, has) if return_mask else out
    bits = ((sh.astype(np.uint64)[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    bits = bits * 2 - 1  # -1 / +1 votes
    change = np.empty(len(doc_ids), bool)
    change[0] = True
    change[1:] = doc_ids[1:] != doc_ids[:-1]
    starts = np.flatnonzero(change)
    votes = np.add.reduceat(bits, starts, axis=0)
    words = (votes > 0).astype(np.uint64)
    vals = (words << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1, dtype=np.uint64)
    out[doc_ids[starts]] = vals
    has[doc_ids[starts]] = True
    return (out, has) if return_mask else out


def _simhash_bucket_edges(
    keys: np.ndarray,
    ids: np.ndarray,
    hs: np.ndarray,
    max_hamming: int,
    max_bucket: int = 500,
) -> tuple[np.ndarray, np.ndarray]:
    """Bucket rows by (already composite) key and emit verified near-dup
    edges (true Hamming <= max_hamming), fully vectorized: buckets of
    equal size are processed together as (n_buckets, s, s) xor/popcount
    tensors — no per-bucket Python. ``keys`` need not be pre-sorted."""
    if len(keys) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    order = np.argsort(keys, kind="stable")
    ks, iis, hss = keys[order], ids[order], hs[order]
    chg = np.r_[True, ks[1:] != ks[:-1]]
    starts = np.flatnonzero(chg)
    sizes = np.diff(np.append(starts, len(ks)))
    n_over = int((sizes > max_bucket).sum())
    if n_over:
        logging.getLogger("raylink.dedup").warning(
            "%d simhash band bucket(s) exceed max_bucket=%d (largest=%d), dropped",
            n_over, max_bucket, int(sizes.max()),
        )
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    for s in np.unique(sizes[(sizes >= 2) & (sizes <= max_bucket)]):
        sel = starts[sizes == s]
        rows_h = hss[sel[:, None] + np.arange(s)[None, :]]  # (nb, s)
        rows_i = iis[sel[:, None] + np.arange(s)[None, :]]
        i, j = np.triu_indices(int(s), k=1)
        x = rows_h[:, i] ^ rows_h[:, j]  # (nb, n_pairs)
        bytes_view = np.ascontiguousarray(x).view(np.uint8).reshape(
            x.shape[0], x.shape[1], 8
        )
        dist = np.unpackbits(bytes_view, axis=2).sum(axis=2)
        bi, pi = np.nonzero(dist <= max_hamming)
        out_a.append(rows_i[bi, i[pi]].astype(np.int64))
        out_b.append(rows_i[bi, j[pi]].astype(np.int64))
    if not out_a:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(out_a), np.concatenate(out_b)


def simhash_dedup(
    ds,
    id_col: str,
    text_col: str,
    k: int = 4,
    max_hamming: int = 3,
    bucketing: str = "auto",
    driver_max_docs: int = 5_000_000,
    components: str = "driver",
    output: str = "pandas",
):
    """Near-dup groups by simhash: 4 x 16-bit bands bucket candidates (any
    pair within Hamming <= 3 shares at least one exact band), verified by
    true Hamming distance, grouped by connected components. Returns pandas
    (doc_id, dup_group).

    ``bucketing``: "driver" collects the (doc_id, simhash) table — two
    int64 columns — and buckets it with the vectorized scan; "distributed"
    shuffles (band, band_value) rows to hash partitions and runs the same
    scan per partition (full-corpus scale path, Python overhead
    O(partitions)); "auto" switches above ``driver_max_docs``."""
    import ray

    def sims(batch: pa.Table) -> pa.Table:
        h, has = simhash_batch(
            batch[text_col].combine_chunks(), k, return_mask=True
        )
        # gramless docs (cleaned text < k chars) all hash to 0 — keeping
        # them would verify every such pair at Hamming 0 (false positives)
        keep = pa.array(has)
        return pa.table(
            {
                "doc_id": batch[id_col].filter(keep),
                "simhash": pa.array(h[has].astype(np.int64)),
            }
        )

    # materialize once: the branch decision's count() and the chosen
    # branch's consumption must not each re-execute the upstream lineage
    sim_ds = ds.map_batches(sims, batch_format="pyarrow").materialize()

    distributed = bucketing == "distributed" or (
        bucketing == "auto" and sim_ds.count() > driver_max_docs
    )
    if not distributed:
        if output == "dataset":
            raise ValueError('output="dataset" requires bucketing="distributed"')
        tbl = sim_ds.to_pandas()
        ids = tbl["doc_id"].to_numpy()
        hs = tbl["simhash"].to_numpy().astype(np.uint64)
        edges_a: list[np.ndarray] = []
        edges_b: list[np.ndarray] = []
        for band in range(4):
            key = (hs >> np.uint64(band * 16)) & np.uint64(0xFFFF)
            a, b = _simhash_bucket_edges(key, ids, hs, max_hamming)
            edges_a.append(a)
            edges_b.append(b)
        verified = list(
            zip(np.concatenate(edges_a).tolist(), np.concatenate(edges_b).tolist())
        )
        return _components_output(verified, components)

    P = max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"].to_numpy(zero_copy_only=False))
        hs = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bands_l, keys_l, ids_l, hs_l = [], [], [], []
        for band in range(4):
            key = (hs >> np.uint64(band * 16)) & np.uint64(0xFFFF)
            bands_l.append(np.full(len(ids), band, dtype=np.int64))
            keys_l.append(key.astype(np.int64))
            ids_l.append(ids)
            hs_l.append(hs.astype(np.int64))
        band_arr = np.concatenate(bands_l)
        key_arr = np.concatenate(keys_l)
        comp = band_arr * 65536 + key_arr  # composite bucket key
        return pa.table(
            {
                "bkey": pa.array(comp),
                "doc_id": pa.array(np.concatenate(ids_l)),
                "simhash": pa.array(np.concatenate(hs_l)),
                "part": pa.array((comp % P).astype(np.int64)),
            }
        )

    def scan_part(g: pa.Table) -> pa.Table:
        a, b = _simhash_bucket_edges(
            np.asarray(g["bkey"].to_numpy(zero_copy_only=False), np.int64),
            np.asarray(g["doc_id"].to_numpy(zero_copy_only=False), np.int64),
            np.asarray(g["simhash"].to_numpy(zero_copy_only=False)).astype(np.uint64),
            max_hamming,
        )
        # dedupe (a, b): a pair within Hamming<=3 can collide in multiple
        # 16-bit bands, which land in DIFFERENT partitions — so dedup here
        # is per-band only; the duplicate edges across bands are harmless
        # to both components modes (idempotent union / min-label)
        a, b = _dedupe_sorted_pairs(a, b)
        return pa.table({"a": pa.array(a), "b": pa.array(b)})

    edges_ds = (
        sim_ds.map_batches(band_rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(scan_part, batch_format="pyarrow")
    )
    return _components_from_edges_ds(edges_ds, components, output=output)


# ---------------------------------------------------------------------------
# exact n-gram Jaccard pairs (inverted-index join)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    ds, id_col: str, text_col: str, k: int = 8, threshold: float = 0.5,
    max_posting: int = 1000, driver_agg_max_rows: int = 20_000_000,
):
    """All pairs with shingle-set Jaccard >= threshold.

    Inverted-index self-join: explode (shingle, doc) rows, group by
    shingle, emit co-occurrence pairs (postings capped at ``max_posting``
    — hot shingles carry little signal), sum intersections per pair, then
    jaccard = inter / (|A| + |B| - inter). Returns pandas (a, b, jaccard)
    sorted. Set sizes travel with the postings so no second join is
    needed.

    The per-pair intersection count is a driver-side aggregation below
    ``driver_agg_max_rows`` co-occurrence rows; above it the co-occurrence
    Dataset shuffles ONCE more by pair-hash partition and aggregates per
    partition (same (a, b) always co-locates, so per-partition counts are
    exact) — only pairs passing the threshold reach the driver."""

    def explode(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False))
        d, h = _shingle_hashes(batch[text_col].combine_chunks(), k)
        # set size per doc
        sizes = np.bincount(d, minlength=batch.num_rows)
        return pa.table(
            {
                "shingle": pa.array(h),
                "doc_id": pa.array(ids[d]),
                "set_size": pa.array(sizes[d].astype(np.int64)),
            }
        )

    # co-occurrence pairs per shingle, emitted with one vectorized scan per
    # HASH PARTITION of the shingle (per-group Python O(partitions), not
    # one call per shingle); oversized postings are skipped entirely
    P = _default_parts()

    def add_part(batch: pa.Table) -> pa.Table:
        sh = np.asarray(batch["shingle"].to_numpy(zero_copy_only=False), np.int64)
        return batch.append_column("part", pa.array((sh % P).astype(np.int64)))

    def pairs_part(g: pa.Table) -> pa.Table:
        sh = np.asarray(g["shingle"].to_numpy(zero_copy_only=False), np.int64)
        doc = np.asarray(g["doc_id"].to_numpy(zero_copy_only=False), np.int64)
        sz = np.asarray(g["set_size"].to_numpy(zero_copy_only=False), np.int64)
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "sa": pa.array([], pa.int64()),
                "sb": pa.array([], pa.int64()),
            }
        )
        if not len(sh):
            return empty
        order = np.lexsort((doc, sh))
        sh, doc, sz = sh[order], doc[order], sz[order]
        # guard against duplicated doc_id input rows (the old per-shingle
        # drop_duplicates): without it, dupes emit self-pairs and
        # double-count intersections
        keep = np.r_[True, (sh[1:] != sh[:-1]) | (doc[1:] != doc[:-1])]
        sh, doc, sz = sh[keep], doc[keep], sz[keep]
        starts = np.flatnonzero(np.r_[True, sh[1:] != sh[:-1]])
        sizes = np.diff(np.append(starts, len(sh)))
        ab, ss = _emit_bucket_pairs(
            starts, sizes, max_posting, [doc, sz], oversize="skip"
        )
        return pa.table(
            {
                "a": pa.array(ab[0]),
                "b": pa.array(ab[1]),
                "sa": pa.array(ss[0]),
                "sb": pa.array(ss[1]),
            }
        )

    co_ds = (
        ds.map_batches(explode, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs_part, batch_format="pyarrow")
        .materialize()
    )
    n_co = co_ds.count()
    if not n_co:
        return pd.DataFrame({"a": [], "b": [], "jaccard": []})

    thr = float(threshold)

    def agg_pairs(a, b, sa, sb) -> pa.Table:
        o = np.lexsort((b, a))
        a, b, sa, sb = a[o], b[o], sa[o], sb[o]
        starts = np.flatnonzero(np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
        inter = np.diff(np.append(starts, len(a)))
        sa0, sb0 = sa[starts], sb[starts]
        union = sa0 + sb0 - inter
        jac = inter / np.maximum(union, 1)
        keep = jac >= thr
        return pa.table(
            {
                "a": pa.array(a[starts][keep]),
                "b": pa.array(b[starts][keep]),
                "jaccard": pa.array(jac[keep]),
            }
        )

    if n_co <= driver_agg_max_rows:
        tbl = pa.concat_tables(
            ray.get(co_ds.to_arrow_refs()), promote_options="default"
        )
        out = agg_pairs(
            np.asarray(tbl["a"].to_numpy(zero_copy_only=False), np.int64),
            np.asarray(tbl["b"].to_numpy(zero_copy_only=False), np.int64),
            np.asarray(tbl["sa"].to_numpy(zero_copy_only=False), np.int64),
            np.asarray(tbl["sb"].to_numpy(zero_copy_only=False), np.int64),
        ).to_pandas()
        return out.sort_values(["a", "b"], ignore_index=True)

    # distributed per-pair aggregation: one more keyed shuffle by pair-hash
    # partition (a is the partition function, so identical (a, b) rows
    # always co-locate and per-partition counts are exact); only the pairs
    # that pass the threshold leave the workers
    def add_pair_part(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["a"].to_numpy(zero_copy_only=False), np.int64)
        return batch.append_column("p2", pa.array((a % P).astype(np.int64)))

    def agg_part(g: pa.Table) -> pa.Table:
        return agg_pairs(
            np.asarray(g["a"].to_numpy(zero_copy_only=False), np.int64),
            np.asarray(g["b"].to_numpy(zero_copy_only=False), np.int64),
            np.asarray(g["sa"].to_numpy(zero_copy_only=False), np.int64),
            np.asarray(g["sb"].to_numpy(zero_copy_only=False), np.int64),
        )

    out = (
        co_ds.map_batches(add_pair_part, batch_format="pyarrow")
        .groupby("p2")
        .map_groups(agg_part, batch_format="pyarrow")
        .to_pandas()
    )
    if not len(out):
        return pd.DataFrame({"a": [], "b": [], "jaccard": []})
    return out.sort_values(["a", "b"], ignore_index=True)


# ---------------------------------------------------------------------------
# winnowing fingerprints (Schleimer et al. 2003 — the MOSS primitive)
# ---------------------------------------------------------------------------


def _positional_shingle_hashes(
    texts: pa.Array, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc k-char shingle hashes in POSITION order (duplicates kept —
    the winnowing input, unlike _shingle_hashes' deduped sets). Same
    FNV64+splitmix64 family so DuckDB replays it bit-exactly. Returns
    (doc_ids int64 ascending, hashes uint64); within a doc the hash at
    output index i is the shingle starting at cleaned-text position i."""
    cleaned = clean_strings_arrow(pc.fill_null(texts, ""))
    doc_ids, grams = batch_ngrams(
        cleaned, (k, k), remove_space_ngrams=False, pad_width=k
    )
    if len(grams) == 0:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    raw = np.frombuffer(grams.tobytes(), dtype=np.uint8).reshape(len(grams), -1)
    h = np.zeros(len(grams), dtype=np.uint64)
    for col in range(raw.shape[1]):
        h = h * np.uint64(1099511628211) + raw[:, col].astype(np.uint64)
    return doc_ids, _hash64(h.astype(np.int64))


def _winnow_select(
    doc_ids: np.ndarray, h: np.ndarray, window: int
) -> tuple[np.ndarray, np.ndarray]:
    """Winnowing selection over position-ordered per-doc hash runs: every
    full window of ``window`` consecutive hashes keeps its minimum
    (rightmost position on ties — the Schleimer et al. rule); a run
    shorter than one full window contributes its single rightmost
    minimum. Comparison is UNSIGNED (the SQL replay ranks HUGEINT in
    [0, 2^64), so a signed min would diverge on high-bit hashes).
    Returns distinct (doc, fp) pairs, fp as the int64 wraparound view."""
    m = len(h)
    if m == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    w = int(window)
    starts = np.flatnonzero(np.r_[True, doc_ids[1:] != doc_ids[:-1]])
    run_len = np.diff(np.append(starts, m))
    sel_parts: list[np.ndarray] = []
    if m >= w:
        wv = np.lib.stride_tricks.sliding_window_view(h, w)
        # doc_ids ascend, so equal endpoints => the whole window is one doc
        vsel = np.flatnonzero(doc_ids[: m - w + 1] == doc_ids[w - 1 :])
        # slice the gather: wv[vsel] MATERIALIZES a slice_len x w copy —
        # sliced it is bounded (~128 MB at w=8), not w x the block's text
        CH = 1 << 21
        for s in range(0, len(vsel), CH):
            vs = vsel[s : s + CH]
            # argmin over the REVERSED window = rightmost minimum
            j = np.argmin(wv[vs][:, ::-1], axis=1)
            sel_parts.append(vs + (w - 1 - j))
    short = np.flatnonzero(run_len < w)
    if len(short):
        s0, l0 = starts[short], run_len[short]
        rstarts = np.cumsum(l0) - l0
        pos = (
            np.arange(int(l0.sum()), dtype=np.int64)
            - np.repeat(rstarts, l0)
            + np.repeat(s0, l0)
        )
        hh = h[pos]
        rmin = np.minimum.reduceat(hh, rstarts)
        cand = hh == np.repeat(rmin, l0)
        # positions are >= 0, so -1 never wins the rightmost-max reduce
        sel_parts.append(np.maximum.reduceat(np.where(cand, pos, -1), rstarts))
    sel = np.concatenate(sel_parts)
    d = doc_ids[sel]
    fp = h[sel].astype(np.int64)  # wraparound view, exact
    order = np.lexsort((fp, d))
    d, fp = d[order], fp[order]
    keep = np.r_[True, (d[1:] != d[:-1]) | (fp[1:] != fp[:-1])]
    return d[keep], fp[keep]


def _winnow_batch_ids(batch: pa.Table, id_col: str, op: str) -> np.ndarray:
    # worker-executed: no runtime raylink imports (the cloudpickle
    # by-value fallback invariant) — the null check is inlined
    col = batch[id_col]
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if a.null_count:
        raise ValueError(
            f"{op}: column {id_col!r} contains null values — nulls would "
            "silently corrupt the int64 kernel; filter or fill upstream"
        )
    ids = np.asarray(a.to_numpy(zero_copy_only=False), np.int64)
    if len(ids) and int(ids.min()) < 0:
        raise ValueError(f"{op}: {id_col!r} values must be non-negative int64")
    if len(np.unique(ids)) != len(ids):
        raise ValueError(
            f"{op}: duplicate {id_col!r} values within a batch — duplicate "
            "ids would silently duplicate (doc, fp) rows (cross-batch "
            "duplicates are the family's documented per-batch scope)"
        )
    return ids


def winnow_fingerprints(
    ds,
    id_col: str,
    text_col: str,
    k: int = 8,
    window: int = 4,
    output: str = "dataset",
):
    """MOSS-style winnowed fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003): hash every k-char shingle of the cleaned text, slide a
    window of ``window`` consecutive hashes, keep each window's minimum
    (rightmost on ties); a doc with fewer than ``window`` shingles
    contributes its single rightmost minimum. Guarantee: any shared
    substring of length >= k + window - 1 cleaned chars yields at least
    one SHARED fingerprint, at expected density 2/(window+1) — the
    partial-overlap primitive that minhash (whole-doc resemblance) and
    remove_duplicate_spans (exact fixed windows) don't cover.

    Output: distinct (id_col, fp) rows per doc; docs whose cleaned text
    has no k-gram emit nothing. Pure streaming map_batches — no shuffle;
    each doc's text lives in one row so selection is batch-local.
    SQL-replayable (FNV64+splitmix64 over HUGEINT — the family hash)."""
    if int(k) < 1 or int(window) < 1:
        raise ValueError("winnow_fingerprints: k and window must be >= 1")
    if id_col in ("fp", "part", "a", "b", "p2"):
        # "fp" would silently win the output table's dict-literal
        # collision (ids gone, no error); the rest are the overlap-pairs
        # staging names — rejected here so both winnow ops agree
        raise ValueError(
            f"winnow_fingerprints: id_col {id_col!r} collides with an "
            "output/staging column name — rename it upstream"
        )

    def fps(batch: pa.Table) -> pa.Table:
        ids = _winnow_batch_ids(batch, id_col, "winnow_fingerprints")
        d, h = _positional_shingle_hashes(batch[text_col].combine_chunks(), k)
        sd, fp = _winnow_select(d, h, window)
        return pa.table({id_col: pa.array(ids[sd]), "fp": pa.array(fp)})

    out = ds.map_batches(fps, batch_format="pyarrow")
    if output == "pandas":
        pdf = typed_to_pandas(out)
        if not len(pdf) and list(pdf.columns) != [id_col, "fp"]:
            # zero-block input loses even the mapped schema — rebuild
            pdf = pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    "fp": pd.Series([], dtype="int64"),
                }
            )
        return pdf.sort_values([id_col, "fp"], ignore_index=True)
    if output != "dataset":
        raise ValueError(f"winnow_fingerprints: unknown output {output!r}")
    return out


def winnow_overlap_pairs(
    ds,
    id_col: str,
    text_col: str,
    k: int = 8,
    window: int = 4,
    min_shared: int = 2,
    max_posting: int = 1000,
    driver_agg_max_rows: int = 20_000_000,
    output: str = "dataset",
):
    """Partial-overlap candidate pairs: docs sharing >= ``min_shared``
    winnowed fingerprints (a, b, n_shared). The inverted-index self-join
    shape of ngram_jaccard_pairs over a ~2/(window+1)-density fingerprint
    stream instead of the full shingle set: explode (fp, doc), hash-
    partition by fp, emit co-occurrence pairs per bucket (postings capped
    at ``max_posting``, oversized buckets dropped with a logged count —
    boilerplate fingerprints carry no overlap signal), then count shared
    fingerprints per pair. ``output="dataset"`` (default) keeps the pair
    aggregation fully distributed (pair-hash partitioned — identical
    (a, b) rows co-locate, so per-partition counts are exact);
    ``output="pandas"`` collects below ``driver_agg_max_rows``
    co-occurrence rows and returns (a, b, n_shared) sorted."""
    if int(min_shared) < 1:
        raise ValueError("winnow_overlap_pairs: min_shared must be >= 1")
    if output not in ("dataset", "pandas"):
        raise ValueError(f"winnow_overlap_pairs: unknown output {output!r}")
    fp_ds = winnow_fingerprints(ds, id_col, text_col, k=k, window=window)
    P = _default_parts()

    def add_part(batch: pa.Table) -> pa.Table:
        f = np.asarray(batch["fp"].to_numpy(zero_copy_only=False), np.int64)
        # fp is already splitmix-mixed — the raw modulus spreads evenly
        return batch.append_column("part", pa.array((f % P).astype(np.int64)))

    def pairs_part(g: pa.Table) -> pa.Table:
        f = np.asarray(g["fp"].to_numpy(zero_copy_only=False), np.int64)
        doc = np.asarray(g[id_col].to_numpy(zero_copy_only=False), np.int64)
        if not len(f):
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
            )
        order = np.lexsort((doc, f))
        f, doc = f[order], doc[order]
        # guard duplicated (fp, doc) rows (cross-batch duplicate ids):
        # without it, dupes emit self-pairs and double-count shares
        keep = np.r_[True, (f[1:] != f[:-1]) | (doc[1:] != doc[:-1])]
        f, doc = f[keep], doc[keep]
        bstarts = np.flatnonzero(np.r_[True, f[1:] != f[:-1]])
        bsizes = np.diff(np.append(bstarts, len(f)))
        (ab,) = _emit_bucket_pairs(
            bstarts, bsizes, max_posting, [doc], oversize="skip"
        )
        return pa.table({"a": pa.array(ab[0]), "b": pa.array(ab[1])})

    # materialize before the keyed groupby consumes it (fused
    # explode -> shuffle de-parallelizes; the repo-wide landmark)
    co_ds = (
        fp_ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs_part, batch_format="pyarrow")
        .materialize()
    )
    mins = int(min_shared)

    def agg_pairs(a: np.ndarray, b: np.ndarray) -> pa.Table:
        o = np.lexsort((b, a))
        a, b = a[o], b[o]
        pstarts = np.flatnonzero(
            np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        )
        n = np.diff(np.append(pstarts, len(a)))
        keep = n >= mins
        return pa.table(
            {
                "a": pa.array(a[pstarts][keep]),
                "b": pa.array(b[pstarts][keep]),
                "n_shared": pa.array(n[keep].astype(np.int64)),
            }
        )

    empty = pa.table(
        {
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "n_shared": pa.array([], pa.int64()),
        }
    )
    n_co = co_ds.count()
    if output == "pandas" and n_co <= driver_agg_max_rows:
        if not n_co:
            return empty.to_pandas()
        tbl = pa.concat_tables(
            # empty blocks can carry a zero-column placeholder schema
            [
                t
                for t in ray.get(co_ds.to_arrow_refs())
                if "a" in t.column_names
            ],
            promote_options="default",
        )
        out = agg_pairs(
            np.asarray(tbl["a"].to_numpy(zero_copy_only=False), np.int64),
            np.asarray(tbl["b"].to_numpy(zero_copy_only=False), np.int64),
        ).to_pandas()
        return out.sort_values(["a", "b"], ignore_index=True)

    if not n_co:
        import ray.data as rd

        out_ds = rd.from_arrow(empty)
        return typed_to_pandas(out_ds) if output == "pandas" else out_ds

    # distributed pair aggregation: one more keyed shuffle, partitioned by
    # a MIXED pair hash (raw `a % P` collapses strided id spaces — the
    # round-5 landmark); a is the partition function, so identical (a, b)
    # rows always co-locate and per-partition counts are exact
    def add_pair_part(batch: pa.Table) -> pa.Table:
        if "a" not in batch.column_names:  # zero-column placeholder block
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "p2": pa.array([], pa.int64()),
                }
            )
        a = np.asarray(batch["a"].to_numpy(zero_copy_only=False), np.int64)
        p2 = (_hash64(a).astype(np.int64) % P).astype(np.int64)
        return batch.append_column("p2", pa.array(p2))

    def agg_part(g: pa.Table) -> pa.Table:
        return agg_pairs(
            np.asarray(g["a"].to_numpy(zero_copy_only=False), np.int64),
            np.asarray(g["b"].to_numpy(zero_copy_only=False), np.int64),
        )

    out_ds = (
        co_ds.map_batches(add_pair_part, batch_format="pyarrow")
        .groupby("p2")
        .map_groups(agg_part, batch_format="pyarrow")
    )
    if output == "pandas":
        pdf = typed_to_pandas(out_ds)
        return pdf.sort_values(["a", "b"], ignore_index=True)
    return out_ds


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_cosine_pairs(
    ds, id_col: str, emb_col: str, threshold: float = 0.95, batch_size: int = 1024
):
    """Pairs of rows with cosine >= threshold over an embedding column.

    EXACT baseline: the (normalized) full matrix is broadcast once via
    ray.put; each streamed batch does one matmul against it — O(n^2 d)
    compute but no shuffle, bounded memory. Returns pandas (a, b, cosine).
    Scale path without the full-matrix broadcast: :func:`embedding_lsh_pairs`.
    """
    tbl = pa.concat_tables(
        ray.get(ds.select_columns([id_col, emb_col]).to_arrow_refs()),
        promote_options="default",
    )
    ids = np.asarray(tbl[id_col].to_numpy(zero_copy_only=False), np.int64)
    mat = l2_normalize(embeddings_to_matrix(tbl[emb_col]))
    ref = ray.put((ids, mat))

    def score(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = cached_object(ref)
        bids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False), np.int64)
        bmat = l2_normalize(embeddings_to_matrix(batch[emb_col]))
        sim = bmat @ all_mat.T
        ii, jj = np.nonzero(sim >= threshold)
        a = bids[ii]
        b = all_ids[jj]
        keep = a < b  # dedupe unordered pairs + drop self
        return pa.table(
            {
                "a": pa.array(a[keep]),
                "b": pa.array(b[keep]),
                "cosine": pa.array(sim[ii, jj][keep]),
            }
        )

    out = ds.map_batches(
        score, batch_format="pyarrow", batch_size=batch_size
    ).to_pandas()
    if not len(out):
        return pd.DataFrame({"a": [], "b": [], "cosine": []})
    return out.sort_values(["a", "b"], ignore_index=True)


def _hyperplanes(dim: int, n_bits: int, seed: int = 77) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, n_bits))


def embedding_lsh_band_rows(
    batch: pa.Table, id_col: str, emb_col: str, planes: np.ndarray, bands: int
) -> pa.Table:
    """map_batches body: random-hyperplane sign bits -> (band_id,
    band_hash, doc_id) rows, mirroring the minhash banding structure.
    Arrow-native: the embedding list column flattens zero-copy into the
    sign-bit matmul."""
    ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False), np.int64)
    if len(ids) and ids.min() < 0:
        # same loud guard as minhash_band_rows: the distributed verify
        # shuffle separates pair rows from vector payload rows with
        # a = -1 — a real negative id would silently DROP its pairs in
        # distributed verification while the driver path verifies them
        raise ValueError("dedup id columns must be non-negative")
    mat = l2_normalize(embeddings_to_matrix(batch[emb_col]))
    bits = (mat @ planes) > 0  # (n, n_bits)
    n_bits = planes.shape[1]
    per_band = n_bits // bands
    out_band, out_hash, out_id = [], [], []
    weights = (np.uint64(1) << np.arange(per_band, dtype=np.uint64))
    for bnd in range(bands):
        chunk = bits[:, bnd * per_band : (bnd + 1) * per_band]
        h = (chunk.astype(np.uint64) * weights[None, :]).sum(axis=1)
        out_band.append(np.full(len(ids), bnd, dtype=np.int32))
        out_hash.append(h.astype(np.int64))
        out_id.append(ids)
    return pa.table(
        {
            "band_id": pa.array(np.concatenate(out_band)),
            "band_hash": pa.array(np.concatenate(out_hash)),
            "doc_id": pa.array(np.concatenate(out_id)),
        }
    )


def _vec_list_array(mat: np.ndarray) -> pa.ListArray:
    """(n, d) float64 -> Arrow list<double> (n rows). Offsets are regular;
    values ride one flat buffer — no per-row Python lists anywhere."""
    n = len(mat)
    d = mat.shape[1] if mat.ndim == 2 and n else 0
    offsets = pa.array((np.arange(n + 1, dtype=np.int64) * d).astype(np.int32))
    return pa.ListArray.from_arrays(
        offsets, pa.array(np.ascontiguousarray(mat).ravel(), type=pa.float64())
    )


def embedding_lsh_pairs(
    ds,
    id_col: str,
    emb_col: str,
    threshold: float = 0.9,
    n_bits: int = 64,
    bands: int = 8,
    seed: int = 77,
    max_bucket: int = 500,
    batch_size: int = 1024,
    verification: str = "auto",
    driver_verify_max_pairs: int = 2_000_000,
    band_driver_threshold: int = 20_000_000,
    output: str = "pandas",
):
    """Embedding near-dup pairs WITHOUT a full-matrix broadcast (the
    random-hyperplane-LSH scale path): sign-bit signatures per batch,
    band bucketing (reusing the minhash banding/candidate machinery),
    then exact-cosine verification of candidates only. Returns pandas
    (a, b, cosine) with a < b, sorted.

    Verification: driver-side gather of candidate vectors below
    ``driver_verify_max_pairs``, else a distributed pair/vector co-shuffle
    (two bounded groupbys — same shape as the minhash verifier). When the
    band table exceeds ``band_driver_threshold`` rows, candidates are a
    DATASET and never land on the driver (VERDICT r2 #2): pair rows map
    straight into the verify shuffle, per-partition dedup is global
    (partition = f(a)), and only the verified near-dup pairs — orders of
    magnitude smaller — are collected for the sorted return frame.
    Probabilistic recall (documented, not exactness): for cosine>=0.95,
    64 bits x 8 bands gives ~0.99 pair recall. ``output="dataset"``
    (distributed verification only) returns the verified-pair Dataset
    un-collected — consume with write_parquet at scale."""
    first = ds.limit(1).to_pandas()
    empty = pd.DataFrame({"a": [], "b": [], "cosine": []})
    if not len(first):
        if output == "dataset":
            # honor the output contract on the empty edge too — a scale
            # pipeline chains .write_parquet / .map_batches on the result
            import ray.data as rd

            return rd.from_pandas(empty)
        return empty
    dim = len(first[emb_col].iloc[0])
    planes = _hyperplanes(dim, n_bits, seed)
    planes_ref = ray.put(planes)

    def band_rows(batch: pa.Table) -> pa.Table:
        return embedding_lsh_band_rows(
            batch, id_col, emb_col, cached_object(planes_ref), bands
        )

    band_ds = ds.map_batches(
        band_rows, batch_format="pyarrow", batch_size=batch_size
    )
    cand = candidate_pairs_from_bands(
        band_ds, max_bucket, driver_threshold=band_driver_threshold
    )
    if isinstance(cand, pd.DataFrame):
        if len(cand):
            cand = cand.drop_duplicates(ignore_index=True)
        n_pairs = len(cand)
    else:
        cand = cand.materialize()
        n_pairs = cand.count()  # pre-dedup upper bound — routing only
    if not n_pairs:
        if output == "dataset":
            import ray.data as rd

            return rd.from_pandas(empty)
        return empty

    distributed = verification == "distributed" or (
        verification == "auto"
        # dataset output REQUIRES distributed verification: auto must
        # route there regardless of pair count (the loud error below is
        # for an EXPLICIT verification="driver" conflict only)
        and (n_pairs > driver_verify_max_pairs or output == "dataset")
    )
    if not distributed:
        if output == "dataset":
            raise ValueError('output="dataset" requires verification="distributed"')
        if not isinstance(cand, pd.DataFrame):
            cand = cand.to_pandas().drop_duplicates(ignore_index=True)

    P = _default_parts()
    need = None
    if distributed:
        need = _candidate_need_map(cand, P)
        nd_docs = need[0]
        cand_ids = nd_docs[np.r_[True, nd_docs[1:] != nd_docs[:-1]]]
    else:
        cand_ids = np.unique(
            np.concatenate([cand["a"].to_numpy(), cand["b"].to_numpy()])
        )
    cand_ids_ref = ray.put(cand_ids)

    def cand_vecs(batch: pa.Table) -> pa.Table:
        cids = cached_object(cand_ids_ref)
        ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False), np.int64)
        mask = np.isin(ids, cids)
        return batch.select([id_col, emb_col]).filter(pa.array(mask))

    vec_ds = ds.map_batches(
        cand_vecs, batch_format="pyarrow", batch_size=batch_size
    )
    if not distributed:
        vt = pa.concat_tables(
            ray.get(vec_ds.to_arrow_refs()), promote_options="default"
        )
        ids = np.asarray(vt[id_col].to_numpy(zero_copy_only=False), np.int64)
        mat = l2_normalize(embeddings_to_matrix(vt[emb_col]))
        order = np.argsort(ids)
        ids, mat = ids[order], mat[order]
        ai = np.searchsorted(ids, cand["a"].to_numpy())
        bi = np.searchsorted(ids, cand["b"].to_numpy())
        cos = np.einsum("ij,ij->i", mat[ai], mat[bi])
        keep = cos >= threshold
        out = pd.DataFrame(
            {
                "a": cand["a"].to_numpy()[keep],
                "b": cand["b"].to_numpy()[keep],
                "cosine": cos[keep],
            }
        )
        return out.sort_values(["a", "b"], ignore_index=True)

    # distributed verification, pair-partitioned like the minhash verifier:
    # pairs hash-partition by left doc; each needed doc's (id, vector) row
    # replicates to its partitions ONCE via a broadcast need-map; one keyed
    # groupby co-locates a partition's pairs with all vectors they touch
    # and verifies with one stacked einsum — per-group Python is
    # O(partitions), never O(pairs) or O(docs). All stages Arrow-native:
    # vectors travel as list<double> built from flat buffers.
    import ray.data as rd

    nd, npart = need
    run_starts = np.flatnonzero(np.r_[True, nd[1:] != nd[:-1]])
    run_docs = nd[run_starts]
    run_lens = np.diff(np.append(run_starts, len(nd)))
    need_ref = ray.put((run_docs, run_starts, run_lens, npart))

    def fan_vec(batch: pa.Table) -> pa.Table:
        rdocs, rstarts, rlens, rparts = cached_object(need_ref)
        doc = np.asarray(batch[id_col].to_numpy(zero_copy_only=False), np.int64)
        pos = np.searchsorted(rdocs, doc)
        posc = np.minimum(pos, max(len(rdocs) - 1, 0))
        ok = (
            (pos < len(rdocs)) & (rdocs[posc] == doc)
            if len(rdocs)
            else np.zeros(len(doc), bool)
        )
        sel = np.flatnonzero(ok)
        posc = posc[sel]
        lens = rlens[posc]
        idx = _ranges_gather(rstarts[posc], lens)
        src_row = np.repeat(sel, lens)
        mat = embeddings_to_matrix(batch[emb_col])
        gathered = mat[src_row] if len(src_row) else np.empty((0, 0))
        n_out = len(src_row)
        return pa.table(
            {
                "part": pa.array(rparts[idx]),
                "doc_id": pa.array(doc[src_row]),
                "a": pa.array(np.full(n_out, -1, dtype=np.int64)),
                "b": pa.array(np.full(n_out, -1, dtype=np.int64)),
                "vec": _vec_list_array(gathered),
            }
        )

    def pairs_to_vec_rows(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["a"].to_numpy(zero_copy_only=False), np.int64)
        b = np.asarray(batch["b"].to_numpy(zero_copy_only=False), np.int64)
        n = len(a)
        return pa.table(
            {
                "part": pa.array((a % P).astype(np.int64)),
                "doc_id": pa.array(np.full(n, -1, dtype=np.int64)),
                "a": pa.array(a),
                "b": pa.array(b),
                "vec": _vec_list_array(np.empty((n, 0))),
            }
        )

    if isinstance(cand, pd.DataFrame):
        pair_rows_ds = rd.from_arrow(
            pairs_to_vec_rows(
                pa.table(
                    {
                        "a": pa.array(cand["a"].to_numpy().astype(np.int64)),
                        "b": pa.array(cand["b"].to_numpy().astype(np.int64)),
                    }
                )
            )
        )
    else:
        pair_rows_ds = cand.map_batches(pairs_to_vec_rows, batch_format="pyarrow")

    union = vec_ds.map_batches(fan_vec, batch_format="pyarrow").union(pair_rows_ds)

    thr = float(threshold)
    empty_part = pa.table(
        {
            "a": pa.array([], pa.int64()),
            "b": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64()),
        }
    )

    def verify_part(g: pa.Table) -> pa.Table:
        a_all = np.asarray(g["a"].to_numpy(zero_copy_only=False), np.int64)
        is_pair = a_all >= 0
        pa_ = a_all[is_pair]
        pb_ = np.asarray(g["b"].to_numpy(zero_copy_only=False), np.int64)[is_pair]
        if not len(pa_):
            return empty_part
        pa_, pb_ = _dedupe_sorted_pairs(pa_, pb_)
        vrows = g.filter(pa.array(~is_pair))
        ids = np.asarray(vrows["doc_id"].to_numpy(zero_copy_only=False), np.int64)
        if not len(ids):
            return empty_part
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        keep1 = np.r_[True, ids[1:] != ids[:-1]]  # dedupe replicas
        mat = l2_normalize(embeddings_to_matrix(vrows["vec"])[order])[keep1]
        ids = ids[keep1]
        ai = np.searchsorted(ids, pa_)
        bi = np.searchsorted(ids, pb_)
        aic = np.minimum(ai, len(ids) - 1)
        bic = np.minimum(bi, len(ids) - 1)
        ok = (
            (ai < len(ids)) & (ids[aic] == pa_)
            & (bi < len(ids)) & (ids[bic] == pb_)
        )
        cos = np.einsum("ij,ij->i", mat[aic], mat[bic])
        keep = ok & (cos >= thr)
        return pa.table(
            {
                "a": pa.array(pa_[keep]),
                "b": pa.array(pb_[keep]),
                "cosine": pa.array(cos[keep]),
            }
        )

    out_ds = union.groupby("part").map_groups(
        verify_part, batch_format="pyarrow"
    )
    if output == "dataset":
        return out_ds
    out = out_ds.to_pandas()
    if not len(out):
        return empty
    out["a"] = out["a"].astype(np.int64)
    out["b"] = out["b"].astype(np.int64)
    return out.sort_values(["a", "b"], ignore_index=True)


def minhash_lsh_dedup_resumable(
    parquet_path: str,
    checkpoint_root: str,
    id_col: str,
    text_col: str,
    k: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.7,
    max_bucket: int = 200,
    components: str = "auto",
    verification: str = "auto",
    driver_verify_max_pairs: int = 2_000_000,
    band_driver_threshold: int = 20_000_000,
    output: str = "dataset",
    taskpool_verify_min_pairs: int = 50_000,
):
    """Per-partition RESUMABLE MinHash-LSH dedup over a parquet file/dir
    (the north rule's restart story, extended from the flagship to the
    dedup family): the band-row stage — the full-corpus scan that
    dominates a cold run — checkpoints one partition per input file under
    ``<checkpoint_root>/minhash_bands`` via
    :func:`raylink.checkpoint.run_partitioned_stage` (stable file-derived
    keys, atomic part+marker writes, params-fingerprint wipe). A killed
    run recomputes ONLY the missing partitions; candidate extraction,
    verification and components then run from the checkpointed band table
    exactly like :func:`minhash_lsh_dedup` (shared code path, same
    ``output="dataset"`` default — ``output="pandas"`` is the small-scale
    opt-in that unlocks the driver/task-pool verification fast paths)."""
    import glob
    import os

    import pyarrow.parquet as pq

    from raylink.checkpoint import run_partitioned_stage

    if os.path.isdir(parquet_path):
        files = sorted(glob.glob(os.path.join(parquet_path, "*.parquet")))
    else:
        files = [parquet_path]
    if not files:
        raise ValueError(f"no parquet files under {parquet_path}")
    by_key = {
        os.path.splitext(os.path.basename(f))[0].replace(".", "_"): f
        for f in files
    }
    if len(by_key) != len(files):
        raise ValueError("input file basenames must be unique")

    def produce(key: str) -> pa.Table:
        tbl = pq.read_table(by_key[key], columns=[id_col, text_col])
        return minhash_band_rows(tbl, id_col, text_col, k, num_perm, bands)

    band_ds, _skipped = run_partitioned_stage(
        checkpoint_root,
        "minhash_bands",
        sorted(by_key),
        produce,
        params={
            "id_col": id_col, "text_col": text_col, "k": k,
            "num_perm": num_perm, "bands": bands,
        },
        input_stages=[],
    )
    import ray.data as rd

    ds = rd.read_parquet(files, columns=[id_col, text_col])
    return _minhash_after_bands(
        ds, band_ds, id_col, text_col, k=k,
        jaccard_threshold=jaccard_threshold, max_bucket=max_bucket,
        components=components, verification=verification,
        driver_verify_max_pairs=driver_verify_max_pairs,
        band_driver_threshold=band_driver_threshold, output=output,
        taskpool_verify_min_pairs=taskpool_verify_min_pairs,
    )


def dedup_representatives(
    ds,
    id_col: str,
    text_col: str,
    k: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.8,
    output: str = "dataset",
    driver_merge_max_rows: int = 2_000_000,
    groups_output: str = "dataset",
    groups=None,
    score_col: str | None = None,
    **minhash_kwargs,
):
    """Near-dup cluster representative selection — the end-step of corpus
    dedup: for every MinHash-LSH dup group, pick the doc to KEEP (longest
    text; tie -> smallest id) and report the group size. Output columns:
    (dup_group, rep_id, rep_chars, n_members).

    ``score_col`` (optional) switches the keeper rule to QUALITY: keep
    the member with the highest integer score (tie -> smallest id) —
    the "keep the best document per duplicate cluster" policy real
    corpus pipelines use instead of longest-text. Scores must be int64
    and non-null (quantize float quality to milli-units — the engine's
    deterministic-score discipline, which keeps the SQL oracle
    bit-exact); the value column is then named ``rep_score``.

    ``groups`` (optional) is a PRECOMPUTED :func:`minhash_lsh_dedup`
    result over the SAME input (pandas frame or Dataset with
    (doc_id, dup_group)); passing it skips the minhash pipeline — the
    pattern for pipelines that derive representatives AND survivors from
    one grouping pass instead of recomputing LSH per consumer. A lazy
    Dataset re-executes its DAG per consumer — ``materialize()`` the
    groups Dataset before passing it to BOTH this op and
    :func:`apply_dedup`, or the LSH pass runs twice anyway.

    Scale shape: the corpus streams ONCE through a slim (id, n_chars)
    projection; group membership joins in via :func:`raylink.joins.equi_join`
    (groups are the broadcast side below its bound, co-shuffled above);
    best-row + count reduce in a single combiner digest pass — each block
    shrinks to one (group, best_chars, best_id, count) row per group
    before anything shuffles (aggs._digest_merge dispatch).

    ``groups_output="dataset"`` (the DEFAULT, VERDICT r4 #5) keeps the
    group-membership table itself off the driver end to end (the minhash
    stage auto-routes to distributed verification) — the configuration
    for corpora whose near-dup membership alone exceeds driver memory.
    ``groups_output="pandas"`` / ``output="pandas"`` are the small-scale
    opt-ins (they unlock the driver/task-pool verification fast paths)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylink.aggs import _digest_merge
    from raylink.joins import equi_join

    if groups is None:
        groups = minhash_lsh_dedup(
            ds, id_col, text_col, k=k, num_perm=num_perm, bands=bands,
            jaccard_threshold=jaccard_threshold,
            output=groups_output, **minhash_kwargs,
        )
    groups_ds = _groups_with_id(
        rd.from_pandas(groups) if isinstance(groups, pd.DataFrame) else groups,
        id_col,
    )
    res = _reps_from_groups(
        ds, groups_ds, id_col, text_col, driver_merge_max_rows,
        score_col=score_col,
    )
    if output == "pandas":
        return (
            typed_to_pandas(res).sort_values("dup_group")
            .reset_index(drop=True)
        )
    return res


def _groups_with_id(groups_ds, id_col: str):
    """minhash group tables hard-code a ``doc_id`` column; rename it to the
    caller's id column so the downstream joins key correctly."""
    if id_col == "doc_id":
        return groups_ds

    def ren(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            [id_col if n == "doc_id" else n for n in t.column_names]
        )

    return groups_ds.map_batches(ren, batch_format="pyarrow")


def _reps_from_groups(
    ds, groups_ds, id_col, text_col, driver_merge_max_rows, score_col=None
):
    """The representative-selection core over an existing membership table
    (see :func:`dedup_representatives` for the scale shape). Keeper rule:
    highest value wins, tie -> smallest id; the value is text length by
    default (``rep_chars``) or the caller's integer ``score_col``
    (``rep_score`` — the quality-keeper variant; int64 only, matching
    the engine's deterministic-score discipline, so selection and the
    SQL oracle agree bit-for-bit)."""
    import pyarrow.compute as pc

    from raylink.aggs import _digest_merge
    from raylink.joins import equi_join

    tcol = text_col
    val_out = "rep_chars" if score_col is None else "rep_score"

    def slim(batch: pa.Table) -> pa.Table:
        if score_col is None:
            v = pc.cast(pc.utf8_length(batch[tcol]), pa.int64())
        else:
            sc = batch[score_col]
            if not pa.types.is_integer(sc.type):
                raise ValueError(
                    f"score_col {score_col!r} has type {sc.type} — keeper "
                    "scores must be integer (quantize floats to "
                    "milli-units; the engine's deterministic-score rule)"
                )
            if sc.null_count:
                raise ValueError(
                    f"score_col {score_col!r} contains nulls — a null "
                    "score cannot rank a representative"
                )
            v = pc.cast(sc, pa.int64())
        return pa.table({id_col: batch[id_col], "n_chars": v})

    joined = equi_join(
        ds.select_columns(
            [id_col, tcol if score_col is None else score_col]
        ).map_batches(slim, batch_format="pyarrow"),
        groups_ds,
        left_key_col=id_col,
        right_key_col=id_col,
        left_cols=("n_chars",),
        right_cols=("dup_group",),
    )
    P = _default_parts()

    def _best_and_count(g, c, i):
        """(group, best_chars, best_id, count) per group run — one lexsort."""
        order = np.lexsort((i, -c, g))
        gs, cs, is_ = g[order], c[order], i[order]
        start = np.ones(len(gs), dtype=bool)
        start[1:] = gs[1:] != gs[:-1]
        starts = np.flatnonzero(start)
        cnt = np.diff(np.append(starts, len(gs)))
        return gs[starts], cs[starts], is_[starts], cnt.astype(np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        g = np.asarray(batch["dup_group"].to_numpy(zero_copy_only=False), np.int64)
        c = np.asarray(batch["n_chars"].to_numpy(zero_copy_only=False), np.int64)
        i = np.asarray(batch[id_col].to_numpy(zero_copy_only=False), np.int64)
        gs, cs, is_, cnt = _best_and_count(g, c, i)
        return pa.table(
            {
                "g": pa.array(gs), "c": pa.array(cs), "i": pa.array(is_),
                "cnt": pa.array(cnt),
                # fine staging modulus + splitmix: _digest_merge's sized
                # groupby rebases it input-sized (a CPUs*2 modulus caps
                # the rebase; raw % collapses strided group ids)
                "part": pa.array(
                    (_hash64(gs) % np.uint64(_FINE_STAGE_PARTS)).astype(
                        np.int64
                    )
                ),
            }
        )

    def _empty_reps() -> pa.Table:
        return pa.table(
            {
                "dup_group": pa.array([], pa.int64()),
                "rep_id": pa.array([], pa.int64()),
                val_out: pa.array([], pa.int64()),
                "n_members": pa.array([], pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        g = np.asarray(t["g"].to_numpy(zero_copy_only=False), np.int64)
        c = np.asarray(t["c"].to_numpy(zero_copy_only=False), np.int64)
        i = np.asarray(t["i"].to_numpy(zero_copy_only=False), np.int64)
        n = np.asarray(t["cnt"].to_numpy(zero_copy_only=False), np.int64)
        if not len(g):
            return _empty_reps()
        order = np.lexsort((i, -c, g))
        gs, cs, is_, ns = g[order], c[order], i[order], n[order]
        start = np.ones(len(gs), dtype=bool)
        start[1:] = gs[1:] != gs[:-1]
        starts = np.flatnonzero(start)
        tot = np.add.reduceat(ns, starts)
        return pa.table(
            {
                "dup_group": pa.array(gs[starts]),
                "rep_id": pa.array(is_[starts]),
                val_out: pa.array(cs[starts]),
                "n_members": pa.array(tot.astype(np.int64)),
            }
        )

    return _digest_merge(
        joined.map_batches(partial, batch_format="pyarrow"),
        merge,
        driver_merge_max_rows,
        # a dup-free corpus has NO groups: the digest is all-empty and
        # schema-less — build the typed empty so apply_dedup's joins and
        # the pandas collect see the documented columns
        empty_fn=_empty_reps,
    )


def apply_dedup(
    ds,
    id_col: str,
    text_col: str,
    k: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.8,
    output: str = "dataset",
    driver_merge_max_rows: int = 2_000_000,
    groups_output: str = "dataset",
    groups=None,
    score_col: str | None = None,
    **minhash_kwargs,
):
    """The actual corpus dedup: stream out the SURVIVORS — every doc not
    in a near-dup group, plus each group's representative (longest text,
    tie -> smallest id; or the highest integer ``score_col`` — the
    quality-keeper rule, see :func:`dedup_representatives`).
    ``groups`` (optional) is a PRECOMPUTED
    :func:`minhash_lsh_dedup` result over the SAME input; passing it
    skips the minhash pipeline (one grouping pass can then feed both
    this op and :func:`dedup_representatives` — LSH is the dominant
    cost, never recompute it per consumer; ``materialize()`` a Dataset
    groups handle first, else its DAG re-executes per consumer).
    Composition of the existing primitives, each at
    its own scale mode: minhash groups -> representative selection
    (:func:`_reps_from_groups`) -> drop-list = members x their group's
    rep via one equi_join filtered to non-reps -> corpus ANTI semi-join
    on the drop ids. The corpus streams; only membership-sized tables
    shuffle. Returns a Dataset of (id_col, text_col) survivors
    (``output="pandas"`` collects, small scales only). ``groups_output``
    defaults to ``"dataset"`` too (VERDICT r4 #5): no default path lands
    membership on the driver; pass ``groups_output="pandas"`` at small
    scale to unlock the driver/task-pool verification fast paths."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylink.joins import equi_join, semi_join

    if groups is None:
        groups = minhash_lsh_dedup(
            ds, id_col, text_col, k=k, num_perm=num_perm, bands=bands,
            jaccard_threshold=jaccard_threshold,
            output=groups_output, **minhash_kwargs,
        )
    groups_ds = _groups_with_id(
        rd.from_pandas(groups) if isinstance(groups, pd.DataFrame) else groups,
        id_col,
    )
    reps = _reps_from_groups(
        ds, groups_ds, id_col, text_col, driver_merge_max_rows,
        score_col=score_col,
    ).select_columns(["dup_group", "rep_id"])
    member_rep = equi_join(
        groups_ds,
        reps,
        left_key_col="dup_group",
        right_key_col="dup_group",
        left_cols=(id_col,),
        right_cols=("rep_id",),
    )

    def non_reps(batch: pa.Table) -> pa.Table:
        keep = pc.not_equal(batch[id_col], batch["rep_id"])
        return pa.table({id_col: batch[id_col].filter(keep)})

    drop_ds = member_rep.map_batches(non_reps, batch_format="pyarrow")
    survivors = semi_join(
        ds.select_columns([id_col, text_col]),
        drop_ds,
        left_key_col=id_col,
        right_key_col=id_col,
        left_cols=(text_col,),
        anti=True,
    )
    if output == "pandas":
        return (
            typed_to_pandas(survivors).sort_values(id_col).reset_index(drop=True)
        )
    return survivors


def _word_ngrams_flat(texts, n: int):
    """Vectorized word n-grams of a string column: returns (doc_idx,
    grams) where grams are space-joined n-word windows. One tokenize
    pass; windows come from shifted slices of the flat word array
    (positions whose window stays inside the same doc), joined with one
    Arrow binary_join_element_wise — no per-row Python."""
    import pyarrow.compute as pc

    doc_idx, words = _tokenize_flat(texts)
    m = len(words)
    if m < n:
        return np.empty(0, np.int64), pa.array([], pa.string())
    valid = doc_idx[: m - n + 1] == doc_idx[n - 1 :]
    starts = np.flatnonzero(valid)
    if not len(starts):
        return np.empty(0, np.int64), pa.array([], pa.string())
    parts = [words.take(pa.array(starts + j)) for j in range(n)]
    # the join kernel requires a separator of the SAME string class —
    # large_string word columns (the widening machinery's output)
    # otherwise raise ArrowNotImplementedError
    sep = (
        pa.scalar(" ", pa.large_string())
        if pa.types.is_large_string(parts[0].type)
        else " "
    )
    grams = pc.binary_join_element_wise(*parts, sep)
    return doc_idx[starts], grams


def _doc_distinct_grams(batch: pa.Table, id_col: str, text_col: str, n: int):
    """Per-doc DISTINCT word n-grams of a batch: (id_col, gram) rows.
    Dedup inside the batch is GLOBAL dedup because each doc lives in
    exactly one block row. Duplicate ids WITHIN the batch are rejected
    loudly (they would make the broadcast and distributed consumers
    silently disagree; id_col must be unique corpus-wide — the engine's
    standing id contract). Duplicates SPLIT ACROSS batches evade this
    per-batch check — consumers whose distributed mode merges per id
    (rarity_score) run textstats._assert_unique_ids_cross_batch over the
    exploded rows to catch those too; the ``dmk`` marker column (1 on
    each doc's FIRST emitted gram row, 0 elsewhere) is what makes that
    detector robust to Ray's dynamic block splitting — a marker row is
    atomic, so summing markers per id counts DOCS, not the batches a
    doc's rows happen to land in after an oversized output block splits.
    Shared by contamination_check and rarity_score."""
    if id_col == "dmk":
        raise ValueError(
            "id_col may not be named 'dmk' (reserved for the internal "
            "doc-marker column of the exploded gram rows)"
        )
    d, grams = _word_ngrams_flat(batch[text_col], n)
    ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False), np.int64)
    if len(ids) != len(np.unique(ids)):
        raise ValueError(
            f"duplicate {id_col} values within a block — id_col must be "
            "unique (per-doc gram dedup and the per-id digest sums both "
            "key on it)"
        )
    if len(grams):
        codes = pd.factorize(grams.to_numpy(zero_copy_only=False))[0]
        comp = d.astype(np.int64) * np.int64(codes.max() + 1) + codes
        keep = np.unique(comp, return_index=True)[1]
        d, grams = d[keep], grams.take(pa.array(keep))
    dmk = np.zeros(len(d), np.int8)
    if len(d):
        dmk[np.unique(d, return_index=True)[1]] = 1
    return pa.table(
        {
            id_col: pa.array(ids[d] if len(d) else ids[:0]),
            "gram": grams,
            "dmk": pa.array(dmk),
        }
    )


# Bloom prefilter geometry for contamination_check's scale path: k probe
# bits per gram; bitmap sized at ~16 bits per (over-counted) distinct eval
# gram -> FP rate (1 - e^{-4/16})^4 ~ 0.24%, bounded [1 MiB-worth of bits,
# 1 GiB bitmap]. The bitmap is a PREFILTER only — every positive is
# confirmed by the exact semi-join, so the output is identical across
# modes regardless of geometry (a too-small bitmap costs confirm-shuffle
# volume, never correctness).
_BLOOM_K = 4
_BLOOM_BITS_PER_GRAM = 16
_BLOOM_BITS_MIN = 1 << 23
_BLOOM_BITS_MAX = 1 << 33


def _bloom_positions(grams, m_bits: int) -> np.ndarray:
    """(n, _BLOOM_K) uint64 bit positions for a gram string array: the
    full-content FNV64 census hash (_fnv64_strings — every byte
    contributes) splitmix64-rehashed at k additive offsets, masked to
    ``m_bits`` (a power of two). Pure function of the gram bytes — the
    same gram sets/tests the same bits on every worker."""
    g = _fnv64_strings(grams).astype(np.int64)  # wraparound view, exact
    mask = np.uint64(m_bits - 1)
    pos = np.empty((len(g), _BLOOM_K), np.uint64)
    for i in range(_BLOOM_K):
        pos[:, i] = _hash64(g + np.int64(i)) & mask
    return pos


def _bloom_test(bm: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """AND of the k probe bits per row: True = maybe-member (confirm
    exactly downstream), False = DEFINITELY absent (safe to drop)."""
    hit = np.ones(pos.shape[0], bool)
    for i in range(_BLOOM_K):
        p = pos[:, i]
        word = bm[(p >> np.uint64(6)).astype(np.int64)]
        hit &= ((word >> (p & np.uint64(63))) & np.uint64(1)).astype(bool)
    return hit


def _bloom_build(eval_grams_ds, m_bits: int) -> np.ndarray:
    """OR-fold the eval grams' probe bits into one uint64 bitmap. Each
    block ships its block-distinct positions (<= 32 bytes per gram —
    comparable to the gram strings, and the fold streams block by block
    with O(m_bits/8) driver state); the corpus side never sees the gram
    strings, only this fixed-size bitmap."""

    def partial(batch: pa.Table) -> pa.Table:
        grams = batch["gram"].combine_chunks()
        if not len(grams):
            return pa.table({"p": pa.array([], pa.uint64())})
        return pa.table(
            {"p": pa.array(np.unique(_bloom_positions(grams, m_bits)))}
        )

    bm = np.zeros(m_bits >> 6, np.uint64)
    stream = eval_grams_ds.map_batches(partial, batch_format="pyarrow")
    for t in stream.iter_batches(batch_format="pyarrow", batch_size=None):
        p = np.asarray(t["p"].to_numpy(zero_copy_only=False), np.uint64)
        if len(p):
            np.bitwise_or.at(
                bm,
                (p >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (p & np.uint64(63)),
            )
    return bm


def contamination_check(
    corpus_ds,
    eval_ds,
    id_col: str,
    text_col: str,
    ngram: int = 3,
    mode: str = "auto",
    max_broadcast_grams: int = 20_000_000,
    max_broadcast_bytes: int = 1 << 30,
    driver_merge_max_rows: int = 2_000_000,
    output: str = "dataset",
    bloom_bits: int | None = None,
):
    """Training-data DECONTAMINATION: for every corpus doc, count how many
    of its distinct word ``ngram``-grams appear anywhere in the eval set,
    and flag docs with >= 1 hit. Output: (id_col, n_hit_grams,
    contaminated) for every corpus doc — as an un-collected Dataset by
    default (the corpus-sized result must never be forced onto the
    driver; ``output="pandas"`` is the small-scale opt-in, VERDICT r3 #3).

    "broadcast" (the default below ``max_broadcast_grams`` distinct eval
    grams): eval grams reduce distributively (per-block distinct
    partials -> bounded driver unique merge), ``ray.put`` ONCE, and every
    corpus batch tests membership with one Arrow ``is_in`` (C++ hash set,
    zero-copy value set) — the corpus STREAMS, nothing shuffles.
    "bloom" (the default ABOVE the broadcast bound): eval grams OR-fold
    into a fixed-size Bloom bitmap (~16 bits/gram, <= 1 GiB even for
    billions of grams) broadcast ONCE; the corpus streams, tests each
    doc-distinct gram against the bitmap, and ONLY bloom-positive
    (doc, gram) rows enter the exact semi-join confirm — so the shuffle
    carries true hits + ~0.24% false positives instead of the whole
    corpus gram stream, and the output is still EXACT (every positive is
    confirmed against the real eval gram set).
    "distributed" (explicit opt-in): ALL corpus (doc, gram) rows
    semi-join the eval gram set on the string key (raylink.joins
    co-shuffle, eval grams never land on the driver) — the no-prefilter
    reference path. In both, per-doc hit counts reduce through the
    shared digest merge. Per-doc gram dedup inside the batch is GLOBAL
    dedup because each doc lives in exactly one block row. All three
    modes are value-identical (tested, incl. a deliberately tiny
    ``bloom_bits`` that forces false positives through the confirm)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylink.aggs import _digest_merge
    from raylink.broadcast import cached_object as _co
    from raylink.joins import semi_join

    nn = int(ngram)

    def eval_partial(batch: pa.Table) -> pa.Table:
        _, grams = _word_ngrams_flat(batch[text_col], nn)
        u = pc.unique(grams)
        return pa.table({"gram": u})

    eval_grams_ds = eval_ds.map_batches(eval_partial, batch_format="pyarrow")

    def corpus_grams(batch: pa.Table) -> pa.Table:
        """(doc_id, gram) with per-doc distinct grams (shared helper)."""
        return _doc_distinct_grams(batch, id_col, text_col, nn)

    if mode == "auto" or (mode == "bloom" and bloom_bits is None):
        eval_grams_ds = eval_grams_ds.materialize()  # count + reuse, one pass
        n_eval = eval_grams_ds.count()
        if mode == "auto":
            # byte-aware like self_top1's switch: grams are unbounded-length
            # strings, so the row bound alone can't keep the collect safe;
            # above the bound the bitmap prefilter replaces the full
            # corpus-gram shuffle ("distributed" stays the explicit opt-in)
            mode = (
                "broadcast"
                if n_eval <= max_broadcast_grams
                and (eval_grams_ds.size_bytes() or 0) <= max_broadcast_bytes
                else "bloom"
            )

    if mode == "broadcast":
        tabs = ray.get(eval_grams_ds.materialize().to_arrow_refs())
        allg = pa.concat_tables(tabs, promote_options="default")
        uniq = pc.unique(allg["gram"].combine_chunks())
        gram_ref = ray.put(uniq)

        def count_hits(batch: pa.Table) -> pa.Table:
            d, grams = _word_ngrams_flat(batch[text_col], nn)
            ids = np.asarray(
                batch[id_col].to_numpy(zero_copy_only=False), np.int64
            )
            hits = np.zeros(len(ids), dtype=np.int64)
            if len(grams):
                # per-doc distinct grams (docs never span blocks)
                codes = pd.factorize(grams.to_numpy(zero_copy_only=False))[0]
                comp = d.astype(np.int64) * np.int64(codes.max() + 1) + codes
                keep = np.unique(comp, return_index=True)[1]
                d, grams = d[keep], grams.take(pa.array(keep))
                mask = pc.is_in(
                    grams, value_set=_co(gram_ref)
                ).to_numpy(zero_copy_only=False)
                np.add.at(hits, d[mask], 1)
            return pa.table(
                {
                    id_col: pa.array(ids),
                    "n_hit_grams": pa.array(hits),
                    "contaminated": pa.array(hits > 0),
                }
            )

        res = corpus_ds.map_batches(count_hits, batch_format="pyarrow")
        if output == "pandas":
            return (
                typed_to_pandas(res).sort_values(id_col).reset_index(drop=True)
            )
        return res

    corpus_gram_fn = corpus_grams
    if mode == "bloom":
        if bloom_bits is None:
            # n_eval counts per-block-distinct rows (>= true distinct),
            # so the bitmap only ever over-sizes
            m_bits = 1 << int(
                max(
                    _BLOOM_BITS_MIN.bit_length() - 1,
                    int(np.ceil(np.log2(_BLOOM_BITS_PER_GRAM * max(n_eval, 1)))),
                )
            )
            m_bits = min(m_bits, _BLOOM_BITS_MAX)
        else:
            m_bits = int(bloom_bits)
            if m_bits < 64 or m_bits & (m_bits - 1):
                raise ValueError(
                    f"bloom_bits must be a power of two >= 64, got {bloom_bits}"
                )
        eval_grams_ds = eval_grams_ds.materialize()  # bitmap build + confirm
        bm_ref = ray.put(_bloom_build(eval_grams_ds, m_bits))

        def corpus_grams_bloom(batch: pa.Table) -> pa.Table:
            t = _doc_distinct_grams(batch, id_col, text_col, nn).select(
                [id_col, "gram"]
            )
            grams = t["gram"].combine_chunks()
            if not len(grams):
                return t
            hit = _bloom_test(
                cached_object(bm_ref), _bloom_positions(grams, m_bits)
            )
            return t.filter(pa.array(hit))

        corpus_gram_fn = corpus_grams_bloom
    elif mode != "distributed":
        raise ValueError(f"contamination_check: unknown mode {mode!r}")

    candidates = corpus_ds.map_batches(corpus_gram_fn, batch_format="pyarrow")
    if mode == "bloom":
        # the filtered candidate set is bounded (true hits + ~0.24% FPs),
        # so materialize it: semi_join consumes a lazy left THREE times
        # (schema probe, null filter, staging) — re-running the corpus
        # explode per consumer costs more than the candidates weigh
        # (materialize-before-shuffle landmark)
        candidates = candidates.materialize()

    # bloom/distributed: (bloom-positive) (doc, gram) rows semi-join the
    # eval gram set, then per-doc hit counts reduce through the shared
    # digest merge
    hit_rows = semi_join(
        candidates,
        eval_grams_ds,
        left_key_col="gram",
        right_key_col="gram",
        left_cols=(id_col,),
        mode="distributed",
    )

    def count_partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False), np.int64)
        u, c = np.unique(ids, return_counts=True)
        return pa.table(
            {
                "i": pa.array(u),
                "cnt": pa.array(c.astype(np.int64)),
                "part": pa.array(
                    (_hash64(u) % np.uint64(_FINE_STAGE_PARTS)).astype(
                        np.int64
                    )
                ),
            }
        )

    def count_merge(t: pa.Table) -> pa.Table:
        i = np.asarray(t["i"].to_numpy(zero_copy_only=False), np.int64)
        c = np.asarray(t["cnt"].to_numpy(zero_copy_only=False), np.int64)
        if not len(i):
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "n_hit_grams": pa.array([], pa.int64()),
                }
            )
        order = np.argsort(i, kind="stable")
        is_, cs = i[order], c[order]
        start = np.ones(len(is_), dtype=bool)
        start[1:] = is_[1:] != is_[:-1]
        starts = np.flatnonzero(start)
        return pa.table(
            {
                id_col: pa.array(is_[starts]),
                "n_hit_grams": pa.array(
                    np.add.reduceat(cs, starts).astype(np.int64)
                ),
            }
        )

    counts_res = _digest_merge(
        hit_rows.map_batches(count_partial, batch_format="pyarrow"),
        count_merge,
        driver_merge_max_rows,
    ).materialize()  # consumed twice below (flag_hits + the anti
    # semi-join's right side) — without this the keyed groupby shuffle
    # behind the digest merge re-executes per consumer

    # distributed zero-fill (VERDICT r3 #3): hits carry contaminated=True;
    # clean docs come from a left ANTI semi-join of corpus ids against the
    # hit ids (hash-partition co-shuffle, nothing lands on the driver) —
    # so the dataset output covers EVERY corpus doc, matching broadcast
    # mode's schema and row set exactly.
    def flag_hits(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                id_col: batch[id_col],
                "n_hit_grams": batch["n_hit_grams"],
                "contaminated": pa.array(np.ones(n, dtype=bool)),
            }
        )

    def flag_clean(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                id_col: batch[id_col],
                "n_hit_grams": pa.array(np.zeros(n, dtype=np.int64)),
                "contaminated": pa.array(np.zeros(n, dtype=bool)),
            }
        )

    clean_ids = semi_join(
        corpus_ds.select_columns([id_col]),
        counts_res,
        left_key_col=id_col,
        right_key_col=id_col,
        anti=True,
        mode="distributed",
    )
    res = counts_res.map_batches(flag_hits, batch_format="pyarrow").union(
        clean_ids.map_batches(flag_clean, batch_format="pyarrow")
    )
    if output == "pandas":
        return typed_to_pandas(res).sort_values(id_col).reset_index(drop=True)
    return res


def incremental_minhash_dedup(
    corpus_ds,
    delta_ds,
    id_col: str,
    text_col: str,
    k: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.8,
    max_bucket: int = 200,
    verification: str = "auto",
    driver_verify_max_pairs: int = 2_000_000,
    band_driver_threshold: int = 20_000_000,
    taskpool_verify_min_pairs: int = 50_000,
    output: str = "pandas",
):
    """Continual-ingestion dedup: flag each DELTA doc that near-dups any
    doc with a smaller id (existing corpus or earlier delta) — the corpus
    itself is never re-deduped, and the pair volume is bounded by pairs
    TOUCHING the delta, not the corpus quadratic. Requires the ingestion
    id convention ``min(delta ids) > max(corpus ids)`` (asserted with two
    cheap aggregates). Returns one row per delta doc: (id_col, is_dup,
    match_id) with match_id the SMALLEST verified partner (-1 if clean).

    Pipeline: band rows over corpus+delta (the persisted-band variant for
    a fixed corpus is ``minhash_lsh_dedup_resumable``'s checkpointed band
    producer) -> LSH candidates filtered to ``b >= min(delta ids)``
    (pairs are emitted a < b, so this keeps exactly the delta-touching
    pairs) -> the SAME exact-Jaccard verification dispatch as
    minhash_lsh_dedup (driver / task-pool / pair-partitioned
    distributed) -> per-delta min-partner reduction.

    ``output="pandas"`` zero-fills over the delta ids on the driver (the
    delta is the small new batch by construction); ``output="dataset"``
    returns only the MATCHED (id, match_id) rows un-collected (absent =
    clean), for fully-off-driver runs with distributed verification."""
    import pyarrow.compute as pc
    import ray.data as rd

    from raylink.aggs import _digest_merge

    corpus_slim = corpus_ds.select_columns([id_col, text_col])
    delta_slim = delta_ds.select_columns([id_col, text_col])
    corpus_max = corpus_slim.max(id_col)
    delta_min = delta_slim.min(id_col)
    if delta_min is None:  # empty delta batch: nothing to flag
        empty = pd.DataFrame({id_col: [], "match_id": []}).astype(np.int64)
        if output == "dataset":
            return rd.from_pandas(empty)
        empty["is_dup"] = empty["match_id"] >= 0
        return empty[[id_col, "is_dup", "match_id"]]
    if corpus_max is not None and corpus_max >= delta_min:
        raise ValueError(
            f"ingestion id convention violated: max(corpus {id_col})="
            f"{corpus_max} >= min(delta {id_col})={delta_min}"
        )
    dm = int(delta_min)
    union_ds = corpus_slim.union(delta_slim)
    band_ds = union_ds.map_batches(
        lambda t: minhash_band_rows(t, id_col, text_col, k, num_perm, bands),
        batch_format="pyarrow",
    )
    cand = candidate_pairs_from_bands(
        band_ds, max_bucket, driver_threshold=band_driver_threshold
    )
    if isinstance(cand, pd.DataFrame):
        cand = cand[cand["b"] >= dm].drop_duplicates(ignore_index=True)
        n_pairs = len(cand)
    else:
        cand = cand.map_batches(
            lambda t: t.filter(pc.greater_equal(t["b"], dm)),
            batch_format="pyarrow",
        ).materialize()
        n_pairs = cand.count()  # pre-dedup upper bound — routing only

    def flags_frame(matched: pd.DataFrame) -> pd.DataFrame:
        ids = delta_slim.select_columns([id_col]).to_pandas()
        out = ids.merge(matched, on=id_col, how="left")
        out["match_id"] = out["match_id"].fillna(-1).astype(np.int64)
        out["is_dup"] = out["match_id"] >= 0
        return (
            out[[id_col, "is_dup", "match_id"]]
            .sort_values(id_col)
            .reset_index(drop=True)
        )

    if not n_pairs:
        if output == "dataset":
            return rd.from_pandas(
                pd.DataFrame({id_col: [], "match_id": []}).astype(np.int64)
            )
        return flags_frame(pd.DataFrame({id_col: [], "match_id": []}))

    distributed = verification == "distributed" or (
        verification == "auto"
        # dataset output REQUIRES distributed verification: auto must
        # route there regardless of pair count (the loud error below is
        # for an EXPLICIT verification="driver" conflict only)
        and (n_pairs > driver_verify_max_pairs or output == "dataset")
    )
    if not distributed and not isinstance(cand, pd.DataFrame):
        cand = cand.to_pandas().drop_duplicates(ignore_index=True)

    P = _default_parts()
    need = None
    if distributed:
        need = _candidate_need_map(cand, P)
        nd_docs = need[0]
        cand_ids = nd_docs[np.r_[True, nd_docs[1:] != nd_docs[:-1]]]
    else:
        cand_ids = np.unique(
            np.concatenate([cand["a"].to_numpy(), cand["b"].to_numpy()])
        )
    cand_ids_ref = ray.put(cand_ids)

    def shingles_of(batch: pa.Table) -> pa.Table:
        cids = cached_object(cand_ids_ref)
        ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False))
        mask = np.isin(ids, cids)
        sel = batch.filter(pa.array(mask))
        if sel.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "shingle": pa.array([], pa.int64())})
        d, h = _shingle_hashes(sel[text_col].combine_chunks(), k)
        sids = np.asarray(sel[id_col].to_numpy(zero_copy_only=False))
        return pa.table({"doc_id": pa.array(sids[d]), "shingle": pa.array(h)})

    sh_ds_cand = union_ds.map_batches(shingles_of, batch_format="pyarrow")

    if distributed:
        edges_ds = _verify_pairs_distributed(
            sh_ds_cand, cand, jaccard_threshold, n_parts=P, need=need
        )

        # per-delta min-partner: per-block (b, min a) digests, shared merge
        def part_min(batch: pa.Table) -> pa.Table:
            a = np.asarray(batch["a"].to_numpy(zero_copy_only=False), np.int64)
            b = np.asarray(batch["b"].to_numpy(zero_copy_only=False), np.int64)
            order = np.lexsort((a, b))
            bs, as_ = b[order], a[order]
            start = np.ones(len(bs), dtype=bool)
            start[1:] = bs[1:] != bs[:-1]
            return pa.table(
                {
                    "b": pa.array(bs[start]),
                    "ma": pa.array(as_[start]),
                    "part": pa.array(
                        (_hash64(bs[start])
                         % np.uint64(_FINE_STAGE_PARTS)).astype(np.int64)
                    ),
                }
            )

        def merge_min(t: pa.Table) -> pa.Table:
            b = np.asarray(t["b"].to_numpy(zero_copy_only=False), np.int64)
            a = np.asarray(t["ma"].to_numpy(zero_copy_only=False), np.int64)
            if not len(b):
                return pa.table(
                    {
                        id_col: pa.array([], pa.int64()),
                        "match_id": pa.array([], pa.int64()),
                    }
                )
            order = np.lexsort((a, b))
            bs, as_ = b[order], a[order]
            start = np.ones(len(bs), dtype=bool)
            start[1:] = bs[1:] != bs[:-1]
            return pa.table(
                {
                    id_col: pa.array(bs[start]),
                    "match_id": pa.array(as_[start]),
                }
            )

        matched_res = _digest_merge(
            edges_ds.map_batches(part_min, batch_format="pyarrow"),
            merge_min,
            driver_verify_max_pairs,
        )
        if output == "dataset":
            return matched_res
        return flags_frame(matched_res.to_pandas())

    if output == "dataset":
        raise ValueError('output="dataset" requires verification="distributed"')

    sh = pa.concat_tables(
        ray.get(sh_ds_cand.to_arrow_refs()), promote_options="default"
    )
    sh_doc = np.asarray(sh["doc_id"].to_numpy(zero_copy_only=False), np.int64)
    sh_val = np.asarray(sh["shingle"].to_numpy(zero_copy_only=False), np.int64)
    if len(cand) > taskpool_verify_min_pairs:
        verified = _verify_pairs_taskpool(
            sh_doc, sh_val, cand["a"].to_numpy().astype(np.int64),
            cand["b"].to_numpy().astype(np.int64), jaccard_threshold,
        )
    else:
        doc_arrays = _doc_arrays_from_sorted(sh_doc, sh_val)
        verified = _verify_with_doc_arrays(
            cand["a"].to_numpy(), cand["b"].to_numpy(), doc_arrays,
            jaccard_threshold,
        )
    if verified:
        va = np.array([x[0] for x in verified], dtype=np.int64)
        vb = np.array([x[1] for x in verified], dtype=np.int64)
        order = np.lexsort((va, vb))
        vb, va = vb[order], va[order]
        start = np.ones(len(vb), dtype=bool)
        start[1:] = vb[1:] != vb[:-1]
        matched = pd.DataFrame({id_col: vb[start], "match_id": va[start]})
    else:
        matched = pd.DataFrame({id_col: [], "match_id": []})
    return flags_frame(matched)


def fuzzy_contamination(
    corpus_ds,
    eval_ds,
    id_col: str,
    text_col: str,
    k: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.8,
    max_bucket: int = 200,
    verification: str = "auto",
    driver_verify_max_pairs: int = 2_000_000,
    band_driver_threshold: int = 20_000_000,
    taskpool_verify_min_pairs: int = 50_000,
    output: str = "dataset",
):
    """Fuzzy decontamination: flag each CORPUS doc that near-dups any
    EVAL doc — the MinHash counterpart to :func:`contamination_check`'s
    exact n-gram overlap, for eval leakage that survives light edits
    (whitespace/casing noise, boilerplate wrappers). Returns the MATCHED
    corpus rows only: ``(id_col, eval_id)`` with ``eval_id`` the SMALLEST
    matching eval doc; absent = clean. The output is sized by the
    contamination, never the corpus, so neither mode collects the corpus.

    Pipeline: eval ids are remapped into a disjoint range above the
    corpus max (internal only — the two id spaces may overlap; the
    reported ``eval_id`` is the caller's) -> band corpus+eval
    (``minhash_band_rows``) -> LSH candidates filtered to CROSSING pairs
    only (``a < off <= b``: corpus x eval; corpus-corpus and eval-eval
    pairs never reach verification) -> the same exact-Jaccard
    verification dispatch as :func:`minhash_lsh_dedup` (driver /
    task-pool / pair-partitioned distributed, byte-aware reroute) ->
    per-corpus-doc min-eval-partner digest. Ids must be unique per side
    (the family contract); duplicate ids would merge shingle sets.
    """
    import ray.data as rd
    from ray.data.aggregate import Max, Min

    from raylink.aggs import _digest_merge
    from raylink.joins import _nonull

    if output not in ("dataset", "pandas"):
        raise ValueError('output must be "dataset" or "pandas"')
    if verification not in ("auto", "driver", "distributed"):
        raise ValueError(
            'verification must be "auto"/"driver"/"distributed", got '
            f"{verification!r}"
        )

    def _check_ids(batch: pa.Table) -> pa.Table:
        # loud null rejection (the NULL int64 POLICY): a null id would
        # float64-round-trip to NaN through the banding kernel and the
        # doc would silently vanish from the contamination check
        _nonull(batch[id_col], id_col, "fuzzy_contamination")
        return batch

    corpus_slim = corpus_ds.select_columns([id_col, text_col]).map_batches(
        _check_ids, batch_format="pyarrow"
    )
    eval_slim = eval_ds.select_columns([id_col, text_col]).map_batches(
        _check_ids, batch_format="pyarrow"
    )

    def _empty_matched() -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: pd.Series([], dtype=np.int64),
                "eval_id": pd.Series([], dtype=np.int64),
            }
        )

    corpus_max = corpus_slim.max(id_col)
    # one aggregate pass for BOTH eval bounds (review finding: min and
    # max as separate calls re-scanned the eval side)
    ev_stats = eval_slim.aggregate(Min(id_col), Max(id_col)) or {}
    eval_min = ev_stats.get(f"min({id_col})")
    if corpus_max is None or eval_min is None:  # either side empty: clean
        if output == "dataset":
            return rd.from_pandas(_empty_matched())
        return _empty_matched()
    if int(corpus_max) < 0 or int(eval_min) < 0:
        raise ValueError("dedup id columns must be non-negative")
    off = int(corpus_max) + 1
    eval_max = int(ev_stats[f"max({id_col})"])
    if eval_max + off >= (1 << 62):
        raise ValueError(
            f"eval ids too large to remap past the corpus max: "
            f"{eval_max} + {off} overflows the int64 staging range"
        )

    def remap_eval(batch: pa.Table) -> pa.Table:
        ids = pc.add_checked(pc.cast(batch[id_col], pa.int64()), off)
        return batch.set_column(
            batch.schema.get_field_index(id_col), id_col, ids
        )

    union_ds = corpus_slim.union(
        eval_slim.map_batches(remap_eval, batch_format="pyarrow")
    )
    band_ds = union_ds.map_batches(
        lambda t: minhash_band_rows(t, id_col, text_col, k, num_perm, bands),
        batch_format="pyarrow",
    )
    cand = candidate_pairs_from_bands(
        band_ds, max_bucket, driver_threshold=band_driver_threshold
    )
    # crossing pairs only (pairs are emitted a < b, so corpus x eval
    # means exactly a < off <= b)
    if isinstance(cand, pd.DataFrame):
        cand = cand[(cand["a"] < off) & (cand["b"] >= off)].drop_duplicates(
            ignore_index=True
        )
        n_pairs = len(cand)
    else:
        cand = cand.map_batches(
            lambda t: t.filter(
                pc.and_(pc.less(t["a"], off), pc.greater_equal(t["b"], off))
            ),
            batch_format="pyarrow",
        ).materialize()
        n_pairs = cand.count()  # pre-dedup upper bound — routing only

    if not n_pairs:
        if output == "dataset":
            return rd.from_pandas(_empty_matched())
        return _empty_matched()

    distributed = verification == "distributed" or (
        verification == "auto"
        # dataset output REQUIRES distributed verification: auto routes
        # there regardless of pair count (the loud error below is for an
        # EXPLICIT verification="driver" conflict only)
        and (n_pairs > driver_verify_max_pairs or output == "dataset")
    )
    if not distributed and not isinstance(cand, pd.DataFrame):
        cand = cand.to_pandas().drop_duplicates(ignore_index=True)

    P = _default_parts()
    need = None
    if distributed:
        need = _candidate_need_map(cand, P)
        nd_docs = need[0]
        cand_ids = nd_docs[np.r_[True, nd_docs[1:] != nd_docs[:-1]]]
    else:
        cand_ids = np.unique(
            np.concatenate([cand["a"].to_numpy(), cand["b"].to_numpy()])
        )
    cand_ids_ref = ray.put(cand_ids)

    def shingles_of(batch: pa.Table) -> pa.Table:
        cids = cached_object(cand_ids_ref)
        ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False))
        mask = np.isin(ids, cids)
        sel = batch.filter(pa.array(mask))
        if sel.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "shingle": pa.array([], pa.int64())})
        d, h = _shingle_hashes(sel[text_col].combine_chunks(), k)
        sids = np.asarray(sel[id_col].to_numpy(zero_copy_only=False))
        return pa.table({"doc_id": pa.array(sids[d]), "shingle": pa.array(h)})

    sh_ds_cand = union_ds.map_batches(shingles_of, batch_format="pyarrow")
    if not distributed:
        # byte-aware reroute (the minhash_lsh_dedup switch): the
        # pair-count rule alone admits corpora of LONG documents whose
        # candidate shingles exceed driver RAM
        sh_ds_cand = sh_ds_cand.materialize()
        if (sh_ds_cand.size_bytes() or 0) > _DRIVER_SHINGLE_BYTES_MAX:
            if verification == "driver":
                raise ValueError(
                    "candidate shingles exceed the driver byte bound "
                    f"({_DRIVER_SHINGLE_BYTES_MAX} B) — pass "
                    'verification="distributed"'
                )
            distributed = True
            need = _candidate_need_map(cand, P)

    def matched_frame(va: np.ndarray, vb: np.ndarray) -> pd.DataFrame:
        # per-corpus-doc min eval partner; report the CALLER's eval id
        order = np.lexsort((vb, va))
        as_, bs = va[order], vb[order]
        start = np.ones(len(as_), dtype=bool)
        start[1:] = as_[1:] != as_[:-1]
        return pd.DataFrame(
            {id_col: as_[start], "eval_id": bs[start] - off}
        ).astype(np.int64)

    if distributed:
        edges_ds = _verify_pairs_distributed(
            sh_ds_cand, cand, jaccard_threshold, n_parts=P, need=need
        )

        # per-corpus-doc min partner: per-block (a, min b) digests,
        # shared merge (the incremental_minhash_dedup pattern, keyed by
        # the corpus side)
        def part_min(batch: pa.Table) -> pa.Table:
            a = np.asarray(batch["a"].to_numpy(zero_copy_only=False), np.int64)
            b = np.asarray(batch["b"].to_numpy(zero_copy_only=False), np.int64)
            order = np.lexsort((b, a))
            as_, bs = a[order], b[order]
            start = np.ones(len(as_), dtype=bool)
            start[1:] = as_[1:] != as_[:-1]
            return pa.table(
                {
                    "ca": pa.array(as_[start]),
                    "mb": pa.array(bs[start]),
                    "part": pa.array(
                        (_hash64(as_[start])
                         % np.uint64(_FINE_STAGE_PARTS)).astype(np.int64)
                    ),
                }
            )

        def merge_min(t: pa.Table) -> pa.Table:
            a = np.asarray(t["ca"].to_numpy(zero_copy_only=False), np.int64)
            b = np.asarray(t["mb"].to_numpy(zero_copy_only=False), np.int64)
            if not len(a):
                return pa.table(
                    {
                        id_col: pa.array([], pa.int64()),
                        "eval_id": pa.array([], pa.int64()),
                    }
                )
            order = np.lexsort((b, a))
            as_, bs = a[order], b[order]
            start = np.ones(len(as_), dtype=bool)
            start[1:] = as_[1:] != as_[:-1]
            return pa.table(
                {
                    id_col: pa.array(as_[start]),
                    "eval_id": pa.array(bs[start] - off),
                }
            )

        def empty_min() -> pa.Table:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "eval_id": pa.array([], pa.int64()),
                }
            )

        matched_res = _digest_merge(
            edges_ds.map_batches(part_min, batch_format="pyarrow"),
            merge_min,
            driver_verify_max_pairs,
            empty_fn=empty_min,
        )
        if output == "dataset":
            return matched_res
        return (
            typed_to_pandas(matched_res)
            .sort_values(id_col)
            .reset_index(drop=True)
        )

    if output == "dataset":
        raise ValueError('output="dataset" requires verification="distributed"')

    sh = pa.concat_tables(
        ray.get(sh_ds_cand.to_arrow_refs()), promote_options="default"
    )
    sh_doc = np.asarray(sh["doc_id"].to_numpy(zero_copy_only=False), np.int64)
    sh_val = np.asarray(sh["shingle"].to_numpy(zero_copy_only=False), np.int64)
    if len(cand) > taskpool_verify_min_pairs:
        verified = _verify_pairs_taskpool(
            sh_doc, sh_val, cand["a"].to_numpy().astype(np.int64),
            cand["b"].to_numpy().astype(np.int64), jaccard_threshold,
        )
    else:
        doc_arrays = _doc_arrays_from_sorted(sh_doc, sh_val)
        verified = _verify_with_doc_arrays(
            cand["a"].to_numpy(), cand["b"].to_numpy(), doc_arrays,
            jaccard_threshold,
        )
    if not verified:
        return _empty_matched()
    va = np.array([x[0] for x in verified], dtype=np.int64)
    vb = np.array([x[1] for x in verified], dtype=np.int64)
    return (
        matched_frame(va, vb).sort_values(id_col).reset_index(drop=True)
    )


def corpus_diff(
    old_ds,
    new_ds,
    id_col: str,
    text_col: str,
    driver_merge_max_rows: int = 2_000_000,
    include_unchanged: bool = False,
    output: str = "dataset",
):
    """Snapshot diff between two corpus versions: one row per id whose
    membership or content differs — ``status`` in ``added`` (id only in
    new), ``removed`` (only in old), ``changed`` (both, content differs);
    ``include_unchanged=True`` adds the ``unchanged`` rows. The
    corpus-versioning primitive for iterative dataset building (what
    moved between crawl N and crawl N+1, what a cleaning-pass rewrite
    actually touched).

    Scale shape: each side streams once through a slim
    ``(id, content-hash, side)`` projection — full-content FNV64
    (:func:`_fnv64_strings`, the SQL-replayable family hash), ~25 B/row
    on the wire regardless of document length — then ONE id-keyed digest
    merge (driver concat below ``driver_merge_max_rows`` staged rows,
    input-sized keyed shuffle above; ids collocate by hash so each
    partition decides its ids independently). Texts never ship.
    Content equality is hash equality: a 64-bit collision between an
    id's two versions would report ``unchanged`` for a changed doc
    (probability ~2^-64 per changed id; the simhash/spans caveat). The
    byte length is folded into the seam hash, so the FNV h0=0 fold's
    leading-NUL fixed point cannot deterministically alias two versions.
    Duplicate ids WITHIN a side are rejected loudly at the merge (and
    per-block at the scan); null ids or texts are rejected loudly.
    """
    import ray.data as rd

    from raylink.aggs import _digest_merge
    from raylink.joins import _nonull

    if id_col in ("h", "s", "part", "status") or text_col in (
        "h", "s", "part", "status"
    ):
        raise ValueError(
            "corpus_diff input columns must not be named h/s/part/status "
            "(internal staging names)"
        )

    def slim_side(side: int):
        def f(batch: pa.Table) -> pa.Table:
            ids = np.asarray(
                _nonull(batch[id_col], id_col, "corpus_diff").to_numpy(
                    zero_copy_only=False
                ),
                np.int64,
            )
            txt = batch[text_col].combine_chunks()
            if txt.null_count:
                raise ValueError(
                    f"corpus_diff {text_col!r} contains nulls — drop or "
                    "fill them explicitly upstream"
                )
            if len(ids) != len(np.unique(ids)):
                raise ValueError(
                    f"duplicate {id_col!r} values within one side of "
                    "corpus_diff"
                )
            # fold the byte LENGTH into the seam hash: the h0=0 FNV fold
            # absorbs leading NUL bytes (its documented fixed point), so
            # 'a' vs '\x00a' would otherwise compare "unchanged" with
            # probability 1 — length disambiguates that whole class and
            # leaves only the generic ~2^-64 collision (review finding)
            blen = np.asarray(
                pc.binary_length(txt).to_numpy(zero_copy_only=False),
                np.int64,
            )
            h = _hash64(
                (_fnv64_strings(txt) ^ _hash64(blen)).astype(np.int64)
            ).astype(np.int64)
            return pa.table(
                {
                    id_col: pa.array(ids),
                    "h": pa.array(h),
                    "s": pa.array(np.full(len(ids), side, dtype=np.int64)),
                    "part": pa.array(
                        (_hash64(ids) % np.uint64(_FINE_STAGE_PARTS)).astype(
                            np.int64
                        )
                    ),
                }
            )

        return f

    parts_ds = (
        old_ds.select_columns([id_col, text_col])
        .map_batches(slim_side(0), batch_format="pyarrow")
        .union(
            new_ds.select_columns([id_col, text_col]).map_batches(
                slim_side(1), batch_format="pyarrow"
            )
        )
    )

    def merge_status(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col].to_numpy(zero_copy_only=False), np.int64)
        h = np.asarray(t["h"].to_numpy(zero_copy_only=False), np.int64)
        s = np.asarray(t["s"].to_numpy(zero_copy_only=False), np.int64)
        if not len(ids):
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "status": pa.array([], pa.string())}
            )
        order = np.lexsort((s, ids))
        ids, h, s = ids[order], h[order], s[order]
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        sizes = np.diff(np.append(starts, len(ids)))
        if sizes.max() > 2:
            raise ValueError(
                f"duplicate {id_col!r} values within one side of corpus_diff"
            )
        two = starts[sizes == 2]
        if len(two) and ((s[two] != 0).any() or (s[two + 1] != 1).any()):
            raise ValueError(
                f"duplicate {id_col!r} values within one side of corpus_diff"
            )
        one = starts[sizes == 1]
        out_ids = [ids[one], ids[two]]
        one_status = np.where(s[one] == 0, "removed", "added")
        both_status = np.where(h[two] != h[two + 1], "changed", "unchanged")
        out_status = [one_status, both_status]
        oid = np.concatenate(out_ids)
        ost = np.concatenate(out_status)
        if not include_unchanged:
            keep = ost != "unchanged"
            oid, ost = oid[keep], ost[keep]
        return pa.table(
            {id_col: pa.array(oid), "status": pa.array(ost, pa.string())}
        )

    def empty_diff() -> pa.Table:
        return pa.table(
            {id_col: pa.array([], pa.int64()),
             "status": pa.array([], pa.string())}
        )

    res = _digest_merge(
        parts_ds, merge_status, driver_merge_max_rows, empty_fn=empty_diff
    )
    if output == "dataset":
        return res
    if output != "pandas":
        raise ValueError('output must be "dataset" or "pandas"')
    return (
        typed_to_pandas(res)
        .sort_values([id_col, "status"])
        .reset_index(drop=True)
    )


def apply_corpus_delta(
    base_ds,
    delta_ds,
    id_col: str,
    delete_ids=None,
    mode: str = "auto",
    n_parts: int | None = None,
    output: str = "dataset",
):
    """Apply a CDC-style delta to a corpus snapshot: every ``delta_ds``
    row UPSERTS (replaces the same-id base row, or adds a new id) and
    every id in ``delete_ids`` is removed. The write side of the
    versioning pair — :func:`corpus_diff` tells you what moved between
    snapshots; this produces the next snapshot from a base plus a change
    set, without rewriting the unchanged majority through Python.

    new = base ANTI-semi-join (delta ids ∪ delete ids)  ∪  delta

    Scale shape: the BASE streams exactly once through the anti
    semi-join (broadcast of the slim int64 removal-id set below the
    semi_join bound, hash-partition co-shuffle above — ``mode`` /
    ``n_parts`` forward); the delta pays one extra slim id pass for the
    duplicate-id guard. Nothing corpus-sized lands on the driver on the
    default path.

    Guards (the versioning family's determinism rules): delta ids must
    be unique and non-null (cross-block exact, via a group_count
    digest); an id present in BOTH delta and delete_ids is ambiguous
    and rejects; base null ids and within-block base duplicate ids
    reject loudly (cross-block base uniqueness is the snapshot
    invariant the CALLER maintains — validating it would cost a second
    full base pass); base and delta must share the same column-name
    set. Deleting an id absent from the base is an idempotent no-op.
    ``delete_ids`` may be a Dataset holding an ``id_col`` column or any
    int sequence. A zero-row delta whose Dataset lost its schema
    (filter-produced) is not supported — pass a typed empty."""
    import ray.data as rd

    from raylink.aggs import group_count
    from raylink.joins import _nonull, semi_join

    base_names = list(base_ds.schema().names)
    delta_names = list(delta_ds.schema().names)
    if set(base_names) != set(delta_names):
        raise ValueError(
            "apply_corpus_delta: base and delta column sets differ: "
            f"{sorted(base_names)} vs {sorted(delta_names)}"
        )
    if id_col not in base_names:
        raise ValueError(f"apply_corpus_delta: no {id_col!r} column")
    if id_col == "n_rows":
        raise ValueError(
            "apply_corpus_delta: id_col 'n_rows' collides with the "
            "dup-guard staging column — rename the id column"
        )

    # The slim id projection is consumed up to three times (dup guard,
    # delete-clash check, removal set) — materialize it ONCE so a derived
    # delta pipeline doesn't re-execute per consumer (8 B/row in plasma).
    delta_ids = delta_ds.select_columns([id_col]).materialize()

    # delta dup-id guard: exact across blocks (group_count also rejects
    # null delta ids loudly). The delta is the small side by contract,
    # so the extra slim pass is cheap relative to the base stream.
    cnt = group_count(delta_ids, (id_col,), count_name="n_rows")

    def only_dups(t: pa.Table) -> pa.Table:
        # empty post-shuffle blocks can drop their schema entirely (the
        # SNM landmark) — skip, don't KeyError
        if "n_rows" not in t.column_names:
            return pa.table({id_col: pa.array([], pa.int64())})
        return t.select([id_col]).filter(
            pc.greater(t["n_rows"], pa.scalar(1, pa.int64()))
        )

    dup = cnt.map_batches(only_dups, batch_format="pyarrow").count()
    if dup:
        raise ValueError(
            f"apply_corpus_delta: {dup} duplicate {id_col!r} values in the "
            "delta — an upsert with two rows for one id is ambiguous"
        )

    if delete_ids is not None:
        if hasattr(delete_ids, "select_columns"):
            del_ds = delete_ids.select_columns([id_col])
        else:
            raw = np.asarray(list(delete_ids))
            if raw.size and raw.dtype.kind not in "iu":
                # a float sequence would truncate silently through the
                # int64 cast (the repo-wide float-key rejection policy)
                raise TypeError(
                    "apply_corpus_delta: delete_ids must be integers, "
                    f"got dtype {raw.dtype}"
                )
            arr = pa.array(raw.astype(np.int64), pa.int64())
            del_ds = rd.from_arrow(pa.table({id_col: arr}))
        clash = semi_join(
            delta_ids, del_ds, id_col, id_col, mode=mode, n_parts=n_parts
        ).count()
        if clash:
            raise ValueError(
                f"apply_corpus_delta: {clash} ids appear in BOTH the delta "
                "and delete_ids — upsert-then-delete order is ambiguous; "
                "resolve upstream"
            )
        remove_ids = delta_ids.union(del_ds)
    else:
        remove_ids = delta_ids

    def check_base(t: pa.Table) -> pa.Table:
        ids = np.asarray(
            _nonull(t[id_col], id_col, "apply_corpus_delta").to_numpy(
                zero_copy_only=False
            ),
            np.int64,
        )
        if len(ids) != len(np.unique(ids)):
            raise ValueError(
                f"apply_corpus_delta: duplicate {id_col!r} values in the "
                "base snapshot block — snapshot ids must be unique"
            )
        return t

    survivors = semi_join(
        base_ds.map_batches(check_base, batch_format="pyarrow"),
        remove_ids,
        id_col,
        id_col,
        left_cols=tuple(c for c in base_names if c != id_col),
        anti=True,
        mode=mode,
        n_parts=n_parts,
    )

    def reorder(t: pa.Table) -> pa.Table:
        return t.select(base_names)

    res = survivors.map_batches(reorder, batch_format="pyarrow").union(
        delta_ds.map_batches(reorder, batch_format="pyarrow")
    )
    if output == "dataset":
        return res
    if output != "pandas":
        raise ValueError('output must be "dataset" or "pandas"')
    return (
        typed_to_pandas(res)
        .sort_values(id_col)
        .reset_index(drop=True)
    )


def exact_dedup_survivors(
    ds,
    id_col: str,
    text_col: str,
    driver_merge_max_rows: int = 2_000_000,
):
    """Exact-dedup SURVIVOR rows: one (id_col, text_col) row per distinct
    text, id = minimal member id (the deterministic winner). The
    streaming composition primitive for corpus pipelines — unlike
    :func:`exact_dedup` (which emits the group census), this keeps the
    text so downstream stages (budget trim, packing) compose directly.
    Same machinery as the collapse stage (factorize partials -> bounded
    string-hash digest merge)."""
    reps_ds, _doc_map = _collapse_exact_texts(
        ds, id_col, text_col, driver_merge_max_rows, want_doc_map=False
    )
    return reps_ds.map_batches(
        lambda b: b.select([id_col, text_col]), batch_format="pyarrow"
    )


_SPAN_POS_CAP = 1 << 21  # per-doc word-position bound for the (doc, pos) key
_SPAN_ID_CAP = 1 << 42  # doc-id bound so id * POS_CAP + pos fits int64
_FNV64_P = np.uint64(1099511628211)  # the repo-wide FNV64 prime family
# driver-merge bound for INT hash censuses: the shared 2M digest bound is
# calibrated for string digests; fixed-width int64 rows are ~24 B each, so
# 16M rows is a ~400 MB driver concat + np.unique (~1-2 s) vs a cold Ray
# sort-shuffle's ~10 s of fixed overhead at exactly this volume
_INT_CENSUS_DRIVER_MAX = 16_000_000


def _fnv64_strings(a: pa.Array) -> np.ndarray:
    """Vectorized FULL-CONTENT FNV64 fold of a string array (the
    _shingle_hashes polynomial h = h*P + byte from h0=0, splitmix64
    finished). The raw segmented fold is the SHARED kernel
    blocking._fnv64_fold_rows (one copy of the reduceat sentinel /
    empty-row logic, also behind multimodal._fnv64_bytes_rows); this
    wrapper picks the string offset width and applies the splitmix
    finish. Unlike joins._string_part_hash (prefix-8 + suffix-8 +
    length, for partition BALANCE only) every byte contributes, so it
    is usable as a census key where near-identical strings must
    separate. Known fixed point of the h0=0 fold: LEADING NUL bytes are
    absorbed (h = 0*P + 0 stays 0 until the first nonzero byte), so ""
    and "\\x00a" vs "a" collide by construction — census consumers
    confirm string-exact past the hash, and the SQL replays share the
    fixed point. Returns uint64, one per row."""
    raw = _fnv64_fold_rows(a, pa.types.is_large_string(a.type))
    return _hash64(raw.astype(np.int64))


def _window_hash_positions(texts, n: int, pretok=None):
    """Hash-census analog of :func:`_word_window_positions`: all n-word
    windows WITH positions, but carrying uint64 CONTENT hashes instead of
    materialized window strings (FNV64 of each distinct word via
    dictionary_encode, polynomial-combined across the window, splitmix
    finished). Equal window strings ALWAYS hash equal — the space-join
    over whitespace-free tokens is bijective, so string equality is word
    -sequence equality; distinct windows collide with ~2^-64 per pair and
    the census treats a collision as a candidate that the string
    confirmation pass resolves exactly. Returns
    (doc_idx, pos, starts, words, hashes) — ``starts``/``words`` let the
    caller materialize strings for a SUBSET of windows only."""
    doc_idx, words = pretok if pretok is not None else _tokenize_flat(texts)
    warr = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
    m = len(warr)
    empty = (
        np.empty(0, np.int64),
        np.empty(0, np.int64),
        np.empty(0, np.int64),
        warr,
        np.empty(0, np.uint64),
    )
    if m < n:
        return empty
    valid = doc_idx[: m - n + 1] == doc_idx[n - 1 :]
    starts = np.flatnonzero(valid)
    if not len(starts):
        return empty
    run_first = np.maximum.accumulate(
        np.where(np.r_[True, doc_idx[1:] != doc_idx[:-1]],
                 np.arange(m, dtype=np.int64), 0)
    )
    pos = starts - run_first[starts]
    denc = warr.dictionary_encode()
    codes = np.asarray(denc.indices.to_numpy(zero_copy_only=False), np.int64)
    wh = _fnv64_strings(denc.dictionary)[codes]
    h = np.zeros(len(starts), np.uint64)
    for j in range(n):
        h = h * _FNV64_P + wh[starts + j]
    return doc_idx[starts], pos, starts, warr, _hash64(h.astype(np.int64))


def _word_window_positions(texts, n: int, pretok=None):
    """All ``n``-word windows of a string column WITH their start
    positions: returns (doc_idx, pos, grams) where ``pos`` is the
    0-based word position of the window start WITHIN its doc and grams
    are space-joined windows (the stride-1 span census unit). Same
    vectorized shape as :func:`_word_ngrams_flat` plus a run-rebased
    position column. ``pretok`` passes an already-computed
    (doc_idx, words) pair so callers that tokenized the batch for their
    own use don't pay the regex split twice (the tokenize dominates the
    per-batch kernel)."""
    import pyarrow.compute as pc

    doc_idx, words = pretok if pretok is not None else _tokenize_flat(texts)
    m = len(words)
    empty = (np.empty(0, np.int64), np.empty(0, np.int64),
             pa.array([], pa.string()))
    if m < n:
        return empty
    valid = doc_idx[: m - n + 1] == doc_idx[n - 1 :]
    starts = np.flatnonzero(valid)
    if not len(starts):
        return empty
    # within-doc word index of every flat word: rebase on run starts
    run_first = np.maximum.accumulate(
        np.where(np.r_[True, doc_idx[1:] != doc_idx[:-1]],
                 np.arange(m, dtype=np.int64), 0)
    )
    pos = starts - run_first[starts]
    parts = [words.take(pa.array(starts + j)) for j in range(n)]
    sep = (
        pa.scalar(" ", pa.large_string())
        if pa.types.is_large_string(parts[0].type)
        else " "
    )
    grams = pc.binary_join_element_wise(*parts, sep)
    return doc_idx[starts], pos, grams


def remove_duplicate_spans(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 20,
    mode: str = "auto",
    census: str = "hash",
    max_broadcast_grams: int = 20_000_000,
    max_broadcast_bytes: int = 1 << 30,
    n_parts: int | None = None,
    driver_merge_max_rows: int = 2_000_000,
    output: str = "dataset",
):
    """Exact duplicate-SPAN removal — the cross-document substring-dedup
    primitive (Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better", approximated on stride-1 WORD windows
    instead of a suffix array): every ``window``-word span whose exact
    text occurs more than once in the corpus is removed from all
    occurrences EXCEPT the globally first (smallest (doc_id, position)
    composite); a flagged occurrence removes all ``window`` words it
    covers and overlapping flagged windows union their coverage. Docs
    reassemble from the surviving words space-joined (whitespace is
    normalized — the operator works on tokens, like the reference
    algorithm); docs left with zero words DROP (the remove_boilerplate
    convention), docs with fewer than ``window`` words have no windows
    and pass through. Output: (id_col, text_col).

    Scale shape: the default ``census="hash"`` finds duplicated windows
    in two cheap passes — (1) an int64 HASH census (FNV64 word fold per
    window, no window strings materialized) through the shared digest
    merge, so the all-to-all carries fixed-width ints instead of W-word
    strings (~4x less volume, and the sort compares ints, not strings;
    measured 114 M windows: the string census sort alone cost 66-95 s vs
    ~10 s for the int census at 10 M docs / 32 CPUs); (2) windows whose
    hash is duplicated (true dups + ~n^2/2^64 expected collisions) are
    re-extracted WITH their strings and confirmed string-exact through
    the same digest merge, which also computes each true dup's min
    composite key — so the result is bit-identical to ``census="string"``
    (the direct one-pass string census, kept for forced-parity tests and
    as the automatic fallback when the duplicated-hash set would exceed
    ``max_broadcast_bytes``). The DUPLICATED set (count > 1) is bounded
    by total_windows / 2; "broadcast" ships (gram -> min-key) once via
    ray.put and the strip pass streams the corpus with one Arrow index_in
    per batch. "distributed" explodes (id, pos, gram) through an
    equi-join against the duplicated census, expands flagged windows to
    covered word indexes, anti semi-joins the word table on the (id,
    word-index) composite, and reassembles per doc (ordered map_groups).
    ``id_col`` must be unique (checked per batch and, cross-block, at the
    census merge), non-negative, < 2^42, and docs must stay under 2^21
    words (loud checks — the composite key packs id * 2^21 + pos).

    Reference scope note: PolyFuzz has no substring-dedup surface; this
    is part of the large-scale-pipeline extension set (SURVEY §8)."""
    import pyarrow.compute as pc

    from raylink.aggs import _digest_merge, _widen_or_raise
    from raylink.broadcast import cached_object as _co
    from raylink.joins import (
        _stage_parts,
        _string_part_hash,
        equi_join,
        semi_join,
    )
    from raylink.pipeline import ARROW_STR_WIDEN_BOUND, _widen_text_if_needed

    W = int(window)
    if W < 1:
        raise ValueError("window must be >= 1")
    # census staging modulus: explicit n_parts, else the fine modulus the
    # sized digest groupby rebases onto an input-sized count (the window
    # census grows ~10x the corpus word count — a fixed 256 let
    # per-partition payload grow without bound)
    CP = _stage_parts(n_parts)
    # snapshot the input id dtype so BOTH modes emit it (the distributed
    # path reconstructs ids from the packed int64 word key and would
    # otherwise silently widen an int32 id column as a function of
    # corpus size once mode="auto" flips)
    _schema = ds.schema()
    id_type = dict(zip(_schema.names, _schema.types))[id_col]

    def _check_ids(ids: np.ndarray):
        if len(ids) != len(np.unique(ids)):
            raise ValueError(
                f"duplicate {id_col} values within a batch — id_col must "
                "be unique corpus-wide (the span keeper rule keys on it)"
            )
        if len(ids) and (ids.min() < 0 or ids.max() >= _SPAN_ID_CAP):
            raise ValueError(
                f"{id_col} must be in [0, 2^42) — the (doc, pos) "
                "composite packs id * 2^21 + pos into int64"
            )

    def census_partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(
            batch[id_col].to_numpy(zero_copy_only=False), np.int64
        )
        _check_ids(ids)
        d, pos, grams = _word_window_positions(batch[text_col], W)
        if len(pos) and pos.max() + W > _SPAN_POS_CAP:
            raise ValueError("docs must stay under 2^21 words")
        if len(grams):
            comp = ids[d] * np.int64(_SPAN_POS_CAP) + pos
            codes, uniques = pd.factorize(grams.to_numpy(zero_copy_only=False))
            n = np.bincount(codes, minlength=len(uniques)).astype(np.int64)
            mk = np.full(len(uniques), np.iinfo(np.int64).max, np.int64)
            np.minimum.at(mk, codes, comp)
            garr = pa.array(uniques, type=pa.string())
            gpart = (_string_part_hash(garr) % np.uint64(CP)).astype(np.int64)
        else:
            garr = pa.array([], pa.string())
            n = np.empty(0, np.int64)
            mk = np.empty(0, np.int64)
            gpart = np.empty(0, np.int64)
        # id-claim rows (idr=1): one per INPUT row, carrying the id in mk
        # and partitioned by id — the census merge sums these per id and
        # raises loudly when a doc id appears in more than one input row
        # (the per-batch _check_ids can't see duplicates split across
        # blocks; both modes would otherwise silently corrupt — the
        # distributed reassembly interleaves the two docs' words into one
        # row, broadcast keeps both occurrences as keepers)
        k = len(garr)
        return pa.table(
            {
                "gram": pa.concat_arrays(
                    [garr, pa.nulls(len(ids), garr.type)]
                ),
                "n": pa.array(np.r_[n, np.ones(len(ids), np.int64)]),
                "mk": pa.array(np.r_[mk, ids]),
                "idr": pa.array(
                    np.r_[
                        np.zeros(k, np.int8), np.ones(len(ids), np.int8)
                    ]
                ),
                "part": pa.array(np.r_[
                    gpart,
                    (_hash64(ids) % np.uint64(CP)).astype(np.int64),
                ]),
            }
        )

    def _raise_dup_id_claims(claimed: np.ndarray, cn: np.ndarray):
        u, tot = _key_sums(claimed, cn)
        if (tot > 1).any():
            bad = u[tot > 1][:5].tolist()
            raise ValueError(
                f"duplicate {id_col} values split across blocks "
                f"(e.g. {bad}) — id_col must be unique corpus-wide "
                "(the span keeper rule and the reassembly key on it)"
            )

    widen_bound = ARROW_STR_WIDEN_BOUND  # captured: worker bodies must
    _wor = _widen_or_raise  # not import raylink at runtime

    def _make_census_merge(force_wide: bool):
        # the large_string decision is a DRIVER decision (the
        # materialized census partials' byte total, which each merge
        # partition's input is a subset of) — per-partition adaptive
        # widening would mix string/large_string census blocks and the
        # broadcast concat / equi-join staging refuse mixed widths
        # (round-5 review finding)
        def census_merge(g: pa.Table) -> pa.Table:
            idr = np.asarray(g["idr"].to_numpy(zero_copy_only=False), np.int8)
            idm = idr == 1
            if idm.any():
                _raise_dup_id_claims(
                    np.asarray(
                        g["mk"].to_numpy(zero_copy_only=False), np.int64
                    )[idm],
                    np.asarray(
                        g["n"].to_numpy(zero_copy_only=False), np.int64
                    )[idm],
                )
            g = _wor(
                g.filter(pa.array(~idm)), "gram", force_wide, widen_bound
            )
            ga = g["gram"].combine_chunks()
            if not len(ga):
                return pa.table(
                    {
                        "gram": pa.array(
                            [],
                            pa.large_string() if force_wide else pa.string(),
                        ),
                        "mk": pa.array([], pa.int64()),
                    }
                )
            codes, uniques = pd.factorize(ga.to_numpy(zero_copy_only=False))
            n = np.zeros(len(uniques), np.int64)
            mk = np.full(len(uniques), np.iinfo(np.int64).max, np.int64)
            np.add.at(n, codes, g["n"].to_numpy(zero_copy_only=False))
            np.minimum.at(mk, codes, g["mk"].to_numpy(zero_copy_only=False))
            dup = n > 1  # only duplicated windows matter downstream
            otype = (
                pa.large_string()
                if pa.types.is_large_string(ga.type)
                else pa.string()
            )
            return pa.table(
                {
                    "gram": pa.array(np.asarray(uniques)[dup], otype),
                    "mk": pa.array(mk[dup]),
                }
            )

        return census_merge

    if census not in ("hash", "string"):
        raise ValueError("census must be 'hash' or 'string'")

    def _string_census():
        parts = ds.select_columns([id_col, text_col]).map_batches(
            census_partial, batch_format="pyarrow"
        ).materialize()
        return _digest_merge(
            parts,
            _make_census_merge(parts.size_bytes() > ARROW_STR_WIDEN_BOUND),
            driver_merge_max_rows,
            n_parts=n_parts,
        ).materialize()

    if census == "string":
        dup_census = _string_census()
    else:
        # pass 1: int64 hash census — the all-to-all carries fixed-width
        # ints, never window strings. Id-claim rows ride along (idr=1,
        # key=id) for the cross-block duplicate-id check, as in the
        # string census.
        def hash_partial(batch: pa.Table) -> pa.Table:
            ids = np.asarray(
                batch[id_col].to_numpy(zero_copy_only=False), np.int64
            )
            _check_ids(ids)
            _d, pos, _s, _w, wh = _window_hash_positions(batch[text_col], W)
            if len(pos) and pos.max() + W > _SPAN_POS_CAP:
                raise ValueError("docs must stay under 2^21 words")
            if len(wh):
                u, cnt = np.unique(wh, return_counts=True)
                uk = u.astype(np.int64)
                upart = (_hash64(u.astype(np.int64)) % np.uint64(CP)).astype(np.int64)
            else:
                uk = np.empty(0, np.int64)
                cnt = np.empty(0, np.int64)
                upart = np.empty(0, np.int64)
            return pa.table(
                {
                    "k": pa.array(np.r_[uk, ids]),
                    "n": pa.array(np.r_[cnt.astype(np.int64),
                                        np.ones(len(ids), np.int64)]),
                    "idr": pa.array(
                        np.r_[np.zeros(len(uk), np.int8),
                              np.ones(len(ids), np.int8)]
                    ),
                    "part": pa.array(np.r_[
                        upart,
                        (_hash64(ids) % np.uint64(CP)).astype(np.int64),
                    ]),
                }
            )

        def hash_merge(g: pa.Table) -> pa.Table:
            idr = np.asarray(g["idr"].to_numpy(zero_copy_only=False), np.int8)
            idm = idr == 1
            ks = np.asarray(g["k"].to_numpy(zero_copy_only=False), np.int64)
            ns = np.asarray(g["n"].to_numpy(zero_copy_only=False), np.int64)
            if idm.any():
                _raise_dup_id_claims(ks[idm], ns[idm])
            u, tot = _key_sums(ks[~idm], ns[~idm])
            return pa.table({"k": pa.array(u[tot > 1])})

        hd_ds = _digest_merge(
            ds.select_columns([id_col, text_col]).map_batches(
                hash_partial, batch_format="pyarrow"
            ),
            hash_merge,
            max(driver_merge_max_rows, _INT_CENSUS_DRIVER_MAX),
            n_parts=n_parts,
        ).materialize()
        hd_tabs = ray.get(hd_ds.to_arrow_refs())
        hd = np.sort(
            np.concatenate(
                [
                    np.asarray(t["k"].to_numpy(zero_copy_only=False), np.int64)
                    # empty post-shuffle blocks can drop their schema
                    # entirely (the SNM landmark) — skip, don't KeyError
                    for t in hd_tabs
                    if t.num_rows and "k" in t.column_names
                ]
                or [np.empty(0, np.int64)]
            )
        )
        if hd.nbytes > max_broadcast_bytes:
            # duplicated-hash set too big to ship — a heavily-duplicated
            # corpus where the string census pays for itself anyway
            dup_census = _string_census()
        elif not len(hd):
            import ray.data as _rd

            dup_census = _rd.from_arrow(
                pa.table(
                    {"gram": pa.array([], pa.string()),
                     "mk": pa.array([], pa.int64())}
                )
            ).materialize()
        else:
            hd_ref = ray.put(hd)

            # pass 2: string-exact confirmation — windows whose hash is
            # duplicated re-extract WITH their strings (a take on the
            # flagged subset only) and run the ORIGINAL string census
            # merge, which drops hash-collision singletons (string count
            # stays 1) and computes each true dup's min composite key.
            def cand_partial(batch: pa.Table) -> pa.Table:
                ids = np.asarray(
                    batch[id_col].to_numpy(zero_copy_only=False), np.int64
                )
                _check_ids(ids)
                d, pos, starts, warr, wh = _window_hash_positions(
                    batch[text_col], W
                )
                hd_local = _co(hd_ref)
                hit = _sorted_member(hd_local, wh.astype(np.int64))
                s = starts[hit]
                if len(s):
                    parts_ = [warr.take(pa.array(s + j)) for j in range(W)]
                    sep = (
                        pa.scalar(" ", pa.large_string())
                        if pa.types.is_large_string(parts_[0].type)
                        else " "
                    )
                    grams = pc.binary_join_element_wise(*parts_, sep)
                    comp = ids[d[hit]] * np.int64(_SPAN_POS_CAP) + pos[hit]
                    codes, uniques = pd.factorize(
                        grams.to_numpy(zero_copy_only=False)
                    )
                    n = np.bincount(codes, minlength=len(uniques)).astype(
                        np.int64
                    )
                    mk = np.full(len(uniques), np.iinfo(np.int64).max, np.int64)
                    np.minimum.at(mk, codes, comp)
                    garr = pa.array(uniques, type=pa.string())
                    gpart = (
                        _string_part_hash(garr) % np.uint64(CP)
                    ).astype(np.int64)
                else:
                    garr = pa.array([], pa.string())
                    n = np.empty(0, np.int64)
                    mk = np.empty(0, np.int64)
                    gpart = np.empty(0, np.int64)
                return pa.table(
                    {
                        "gram": garr,
                        "n": pa.array(n),
                        "mk": pa.array(mk),
                        "idr": pa.array(np.zeros(len(n), np.int8)),
                        "part": pa.array(gpart),
                    }
                )

            cand_parts = ds.select_columns([id_col, text_col]).map_batches(
                cand_partial, batch_format="pyarrow"
            ).materialize()
            dup_census = _digest_merge(
                cand_parts,
                _make_census_merge(
                    cand_parts.size_bytes() > ARROW_STR_WIDEN_BOUND
                ),
                driver_merge_max_rows,
                n_parts=n_parts,
            ).materialize()

    n_dup = dup_census.count()
    if n_dup == 0:
        # duplicate-free corpus: nothing to strip. The broadcast kernel's
        # empty-value-set branch keeps every word (output still
        # whitespace-normalized, matching the op's contract); the
        # distributed path can't run at all — an empty Dataset drops its
        # schema and the equi-join staging needs one.
        mode = "broadcast"
    elif mode == "auto":
        mode = (
            "broadcast"
            if (
                n_dup <= max_broadcast_grams
                and (dup_census.size_bytes() or 0) <= max_broadcast_bytes
            )
            else "distributed"
        )

    if mode == "broadcast":
        tabs = ray.get(dup_census.to_arrow_refs()) or [
            pa.table(
                {"gram": pa.array([], pa.string()),
                 "mk": pa.array([], pa.int64())}
            )
        ]
        allc = _widen_text_if_needed(
            pa.concat_tables(tabs, promote_options="default"), "gram"
        )
        dup_ref = ray.put(
            (
                allc["gram"].combine_chunks(),
                np.asarray(allc["mk"].to_numpy(zero_copy_only=False), np.int64),
            )
        )

        def strip_spans(batch: pa.Table) -> pa.Table:
            garr, mks = _co(dup_ref)
            ids = np.asarray(
                batch[id_col].to_numpy(zero_copy_only=False), np.int64
            )
            _check_ids(ids)
            doc_idx, words = _tokenize_flat(batch[text_col])
            m = len(words)
            nrows = batch.num_rows
            d, pos, grams = _word_window_positions(
                batch[text_col], W, pretok=(doc_idx, words)
            )
            delta = np.zeros(m + 1, np.int64)
            # len(garr) guard: a duplicate-free corpus has an EMPTY value
            # set — index_in then returns all nulls and the mks[...] fancy
            # index would hit an empty array (IndexError on a clean corpus)
            if len(grams) and len(garr):
                hit = pc.index_in(grams, value_set=garr)
                hv = np.asarray(
                    pc.fill_null(hit, -1).to_numpy(zero_copy_only=False),
                    np.int64,
                )
                comp = ids[d] * np.int64(_SPAN_POS_CAP) + pos
                flagged = (hv >= 0) & (comp != mks[np.maximum(hv, 0)])
                # flat window start index: run-rebase inverse (pos is
                # within-doc; recover flat starts from doc word counts)
                wc = np.bincount(doc_idx, minlength=nrows)
                doc_first = np.concatenate(([0], np.cumsum(wc)[:-1]))
                s_flat = doc_first[d[flagged]] + pos[flagged]
                np.add.at(delta, s_flat, 1)
                np.add.at(delta, s_flat + W, -1)
            covered = np.cumsum(delta[:m]) > 0
            keep = ~covered
            kept_words = words.filter(pa.array(keep))
            kept_counts = np.bincount(doc_idx[keep], minlength=nrows)
            offs = np.zeros(nrows + 1, np.int64)
            np.cumsum(kept_counts, out=offs[1:])
            la = pa.LargeListArray.from_arrays(pa.array(offs), kept_words)
            joined = pc.binary_join(la, " ")
            alive = pa.array(kept_counts > 0)
            return pa.table(
                {
                    id_col: batch[id_col].filter(alive),
                    text_col: joined.filter(alive),
                }
            )

        res = ds.select_columns([id_col, text_col]).map_batches(
            strip_spans, batch_format="pyarrow"
        )
    else:

        def explode_words(batch: pa.Table) -> pa.Table:
            ids = np.asarray(
                batch[id_col].to_numpy(zero_copy_only=False), np.int64
            )
            _check_ids(ids)
            doc_idx, words = _tokenize_flat(batch[text_col])
            m = len(words)
            run_first = np.maximum.accumulate(
                np.where(np.r_[True, doc_idx[1:] != doc_idx[:-1]],
                         np.arange(m, dtype=np.int64), 0)
            ) if m else np.empty(0, np.int64)
            widx = np.arange(m, dtype=np.int64) - run_first
            return pa.table(
                {
                    "wkey": pa.array(
                        ids[doc_idx] * np.int64(_SPAN_POS_CAP) + widx
                    ),
                    "word": words,
                }
            )

        def explode_windows(batch: pa.Table) -> pa.Table:
            ids = np.asarray(
                batch[id_col].to_numpy(zero_copy_only=False), np.int64
            )
            _check_ids(ids)
            d, pos, grams = _word_window_positions(batch[text_col], W)
            comp = (
                ids[d] * np.int64(_SPAN_POS_CAP) + pos
                if len(pos)
                else np.empty(0, np.int64)
            )
            return pa.table({"gram": grams, "comp": pa.array(comp)})

        flagged = equi_join(
            ds.select_columns([id_col, text_col]).map_batches(
                explode_windows, batch_format="pyarrow"
            ),
            dup_census,
            left_key_col="gram",
            right_key_col="gram",
            left_cols=("comp",),
            right_cols=("mk",),
            mode="distributed",
            n_parts=n_parts,
        )

        def cover(batch: pa.Table) -> pa.Table:
            comp = np.asarray(
                batch["comp"].to_numpy(zero_copy_only=False), np.int64
            )
            mk = np.asarray(
                batch["mk"].to_numpy(zero_copy_only=False), np.int64
            )
            f = comp[comp != mk]
            # expand each flagged window to its W covered word keys
            # (same-doc by construction: pos + W <= 2^21 checked above)
            keys = (f[:, None] + np.arange(W, dtype=np.int64)[None, :]).ravel()
            return pa.table({"wkey": pa.array(np.unique(keys))})

        covered = flagged.map_batches(cover, batch_format="pyarrow")
        kept = semi_join(
            ds.select_columns([id_col, text_col]).map_batches(
                explode_words, batch_format="pyarrow"
            ),
            covered,
            left_key_col="wkey",
            right_key_col="wkey",
            left_cols=("word",),
            anti=True,
            mode="distributed",
            n_parts=n_parts,
        )

        def add_doc(batch: pa.Table) -> pa.Table:
            wk = np.asarray(
                batch["wkey"].to_numpy(zero_copy_only=False), np.int64
            )
            return pa.table(
                {
                    # cast back to the INPUT id dtype (ids were validated
                    # non-negative < 2^42 so any input integer type holds
                    # its own values) — broadcast mode filters the original
                    # column, so without this the output schema would flip
                    # between int32 and int64 as a function of corpus size
                    id_col: pa.array(wk // np.int64(_SPAN_POS_CAP)).cast(
                        id_type
                    ),
                    "widx": pa.array(wk % np.int64(_SPAN_POS_CAP)),
                    "word": batch["word"],
                }
            )

        def reassemble(g: pa.Table) -> pa.Table:
            order = pc.sort_indices(g["widx"])
            ws = g["word"].combine_chunks().take(order)
            offs = pa.array(np.array([0, len(ws)], dtype=np.int64))
            la = pa.LargeListArray.from_arrays(offs, ws)
            return pa.table(
                {
                    id_col: g[id_col].slice(0, 1),
                    text_col: pc.binary_join(la, " "),
                }
            )

        res = (
            kept.map_batches(add_doc, batch_format="pyarrow")
            .groupby(id_col)
            .map_groups(reassemble, batch_format="pyarrow")
        )

    if output == "pandas":
        return typed_to_pandas(res).sort_values(id_col).reset_index(drop=True)
    return res


def semantic_dedup(
    ds,
    id_col: str,
    emb_col: str,
    threshold: float = 0.9,
    output: str = "dataset",
    **lsh_kwargs,
):
    """SemDeDup-shaped semantic dedup compose (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication" — cluster semantically near-identical items, keep ONE
    per cluster): embedding near-dup pairs via the no-broadcast
    random-hyperplane LSH path (:func:`embedding_lsh_pairs`, exact-cosine
    verified) -> connected components over the verified pairs -> keep
    the SMALLEST id per cluster (the deterministic keeper rule the
    engine's dedup family shares) -> anti semi-join the corpus on the
    dropped ids. Returns the SURVIVOR rows (id_col, emb_col) — an
    un-collected Dataset by default; ``output="pandas"`` collects ids
    sorted (small scales).

    One named surface over existing primitives: pairs flow as a Dataset
    (``lsh_kwargs`` forwards banding/verification thresholds), components
    run distributed above the broadcast bound, membership never lands on
    the driver on the default path."""
    from raylink.joins import semi_join
    from raylink.linkage import distributed_connected_components

    pairs = embedding_lsh_pairs(
        ds, id_col, emb_col, threshold=threshold, output="dataset",
        **lsh_kwargs,
    )
    labels = distributed_connected_components(pairs.select_columns(["a", "b"]))

    def drops(batch: pa.Table) -> pa.Table:
        keep = pc.not_equal(batch["node"], batch["label"])
        return pa.table({"drop_id": batch["node"].filter(keep)})

    drop_ds = labels.map_batches(drops, batch_format="pyarrow")
    survivors = semi_join(
        ds.select_columns([id_col, emb_col]),
        drop_ds,
        left_key_col=id_col,
        right_key_col="drop_id",
        left_cols=(emb_col,),
        anti=True,
    )
    if output == "pandas":
        return (
            typed_to_pandas(survivors).sort_values(id_col).reset_index(drop=True)
        )
    return survivors
