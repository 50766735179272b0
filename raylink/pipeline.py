"""The distributed match → group engine over ``ray.data.Dataset``.

Architecture (SURVEY §3, Ray-Data-first — NOT a port of the reference's
single-process pandas flow):

  * **from-side** stays a streaming Dataset end to end; each row carries
    ``row_order`` (global input order — linkage is order-sensitive, SURVEY
    §2.8) and ``block_key``.
  * **to-side** is the SMALL side per block: collected once, fitted into a
    per-block index (TF-IDF vocab+CSC / packed strings / embedding matrix),
    put in the object store ONCE (``ray.put``) and read by every scoring
    actor in ``__init__`` — a broadcast join, no shuffle, no per-batch
    reshipping. Hot blocking keys therefore cost compute, not shuffle skew;
    from-side rows of a hot block are split across whatever batches the
    streaming executor schedules.
  * **TF-IDF fit is distributed**: per-(block, ngram) document frequencies
    come from ``map_batches`` partials + ``groupby().sum()`` (the only
    wide shuffle in the match phase, bounded by vocab size, and exact
    because every doc lives in exactly one batch); the vocab/IDF tables are
    collected (they are small) and broadcast inside the index.
  * **scoring** is an actor pool ``map_batches(cls, batch_format="pyarrow",
    concurrency=..., batch_size=...)``: vectorized kernels, state built
    once per actor.
  * **grouping** re-scores the distinct To strings per block (the
    reference's second matching pass, polyfuzz/polyfuzz.py:468-474), runs
    the quirk-exact sequential linkage per block inside ``map_groups``
    (rows pre-sorted by row_order), and joins the Group column back via a
    broadcast map.

Scale assumptions (documented per north rule): the to-side per block and
the distinct-string set per block fit in the object store (record-linkage's
standard blocking assumption); the from-side is unbounded and streams.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from raylink import editdist
from raylink.embed import HashEmbedder, dense_topk_cosine, l2_normalize
from raylink.linkage import single_linkage_arrays
from raylink.matchers import match_columns
from raylink.text import batch_ngrams, clean_strings_arrow
from raylink.tfidf import CSR, TfidfVocab, TopkIndex, df_counts, topk_cosine

ALL_BLOCK = "_all"


# ---------------------------------------------------------------------------
# matcher configuration (plain dataclass — must be cheaply serializable into
# actor constructors)
# ---------------------------------------------------------------------------


@dataclass
class MatcherSpec:
    kind: str = "tfidf"  # tfidf | rapidfuzz | editdistance | embeddings
    model_id: str | None = None
    # tfidf params (polyfuzz/models/_tfidf.py defaults)
    n_gram_range: tuple[int, int] = (3, 3)
    clean_string: bool = True
    min_similarity: float = 0.75
    top_n: int = 1
    cosine_method: str = "sparse"
    remove_space_ngrams: bool = True
    # rapidfuzz / editdistance params
    score_cutoff: float = 0.0
    scorer: Any = None  # name or callable; resolved in the actor
    normalize: bool = True
    # embeddings params
    embedder: Any = None  # callable texts -> ndarray (default HashEmbedder)

    def resolved_id(self) -> str:
        if self.model_id:
            return self.model_id
        return {"tfidf": "TF-IDF", "rapidfuzz": "EditDistance",
                "editdistance": "EditDistance", "embeddings": "Embeddings"}[self.kind]


# ---------------------------------------------------------------------------
# entities dataset helpers
# ---------------------------------------------------------------------------


def entities_from_texts(texts, block_keys=None) -> pa.Table:
    """Driver-side helper: list of strings -> entities Arrow table."""
    n = len(texts)
    if block_keys is None:
        block_keys = [ALL_BLOCK] * n
    return pa.table(
        {
            "row_order": pa.array(np.arange(n, dtype=np.int64)),
            "entity_text": pa.array(list(texts), type=pa.string()),
            "block_key": pa.array(list(block_keys), type=pa.string()),
        }
    )


from contextlib import contextmanager


@contextmanager
def ordered_execution():
    """Force deterministic block ordering for the materialization that
    PINS row_order. Without it the streaming executor emits blocks in
    completion order, so row_order — and therefore the order-sensitive
    linkage output — would differ run to run on multi-block inputs.
    Scoped to the one materialize that needs it (preserve_order throttles
    pipelining, so it must not leak into the scoring stages)."""
    from ray.data import DataContext

    opts = DataContext.get_current().execution_options
    old = opts.preserve_order
    opts.preserve_order = True
    try:
        yield
    finally:
        opts.preserve_order = old


def attach_global_order(ds):
    """Materialize (order-preserving) and append a global ``row_order``
    from cumulative block row counts — only refs + counts touch the
    driver."""
    import ray.data

    with ordered_execution():
        bundles = ds.materialize()
    refs, sizes = _refs_with_num_rows(bundles)
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]]) if sizes else []
    indexed = [
        _attach_order_remote.remote(r, int(off)) for r, off in zip(refs, offsets)
    ]
    return ray.data.from_arrow_refs(indexed)


def _refs_with_num_rows(materialized_ds):
    """Block refs + per-block row counts from a materialized Dataset's OWN
    metadata (iter_internal_ref_bundles) — no per-ref remote probe tasks.
    Falls back to one probe task per ref if the internal API drifts."""
    try:
        refs, sizes = [], []
        for bundle in materialized_ds.iter_internal_ref_bundles():
            for ref, meta in bundle.blocks:
                refs.append(ref)
                sizes.append(int(meta.num_rows))
        return refs, sizes
    except Exception:
        refs = materialized_ds.to_arrow_refs()
        return refs, ray.get([_num_rows_remote.remote(r) for r in refs])


def dataset_with_row_order(ds, text_col: str, block_col: str | None):
    """Normalize any Dataset into the entities schema with a global
    ``row_order``. Order is assigned from cumulative block row counts —
    only refs + counts touch the driver, the data stays in the object
    store. The matches produced downstream are row-identified by this
    column, which is also what makes linkage order reproducible.

    Order is captured AT THE SOURCE (the raw read's block order is
    deterministic; downstream map stages are not — their output block
    order varies run to run even under preserve_order) and then travels
    with the rows, so everything derived from it is reproducible.

    Scale note: this materializes the source in the object store to pin
    block boundaries. At 100 TB the right move is to carry a source row
    id from the reader instead (pass a dataset that already has
    ``row_order`` and this function is skipped entirely — see
    ``match_dataset``)."""

    return _normalize_entities(attach_global_order(ds), text_col, block_col)


def _normalize_entities(ds, text_col: str, block_col: str | None):
    """Rename/shape a row_order-carrying Dataset into the entities schema
    (row_order, entity_text, block_key) — shared by the order-attaching
    path above and inputs whose reader already provided row_order (custom
    text/block column names must normalize in BOTH cases)."""

    def prep(batch: pa.Table) -> pa.Table:
        out = {"row_order": batch["row_order"], "entity_text": batch[text_col]}
        if block_col and block_col in batch.column_names:
            out["block_key"] = batch[block_col]
        else:
            out["block_key"] = pa.array([ALL_BLOCK] * batch.num_rows, type=pa.string())
        return pa.table(out)

    return ds.map_batches(prep, batch_format="pyarrow")


@ray.remote
def _num_rows_remote(tbl: pa.Table) -> int:
    return tbl.num_rows


_PARALLEL_FIT_CHUNK = 16_384


@ray.remote
def _df_chunk_remote(texts_arr, n_gram_range, clean, remove_space):
    """DF counts of one chunk of a big block (each doc lives entirely in
    one chunk, so per-chunk DFs sum to the exact block DF)."""
    arr = clean_strings_arrow(texts_arr) if clean else texts_arr
    doc_ids, grams = batch_ngrams(
        arr, n_gram_range, remove_space, pad_width=n_gram_range[1]
    )
    return df_counts(doc_ids, grams)


@ray.remote
def _transform_chunk_remote(vocab, texts_arr):
    return vocab.transform(texts_arr)


@ray.remote
def _assemble_topk_remote(*csrs):
    """Concat row-chunk CSRs (offset indptrs) and build the TopkIndex
    (incl. the tiled layout) in one task."""
    indptrs = [csrs[0].indptr]
    for c in csrs[1:]:
        indptrs.append(c.indptr[1:] + indptrs[-1][-1])
    merged = CSR(
        indptr=np.concatenate(indptrs),
        indices=np.concatenate([c.indices for c in csrs]),
        data=np.concatenate([c.data for c in csrs]),
        n_cols=csrs[0].n_cols,
    )
    return TopkIndex(merged)


def _fit_big_block_parallel(bi: "BlockIndex", spec: MatcherSpec):
    """Chunked fit of one oversized block: DF partials, vocab merge, and
    CSR transform all fan out across Ray tasks — the hottest blocking key
    stops being a single-task straggler in the broadcast-fit path."""
    pad = spec.n_gram_range[1]
    n = len(bi.texts_arr)
    chunks = [
        bi.texts_arr.slice(s, _PARALLEL_FIT_CHUNK)
        for s in range(0, n, _PARALLEL_FIT_CHUNK)
    ]
    df_parts = ray.get(
        [
            _df_chunk_remote.remote(
                c, tuple(spec.n_gram_range), spec.clean_string,
                spec.remove_space_ngrams,
            )
            for c in chunks
        ]
    )
    g_all = np.concatenate([g for g, _ in df_parts]) if df_parts else np.empty(0, f"S{pad}")
    d_all = np.concatenate([d for _, d in df_parts]) if df_parts else np.empty(0, np.int64)
    if len(g_all):
        order = np.argsort(g_all, kind="stable")
        g_all, d_all = g_all[order], d_all[order]
        st = np.flatnonzero(np.r_[True, g_all[1:] != g_all[:-1]])
        g_all, d_all = g_all[st], np.add.reduceat(d_all, st)
    bi.tfidf_vocab = TfidfVocab.from_df_counts(
        g_all, d_all, n, spec.n_gram_range, spec.clean_string,
        spec.remove_space_ngrams,
    )
    vocab_ref = ray.put(bi.tfidf_vocab)
    csr_refs = [_transform_chunk_remote.remote(vocab_ref, c) for c in chunks]
    return _assemble_topk_remote.remote(*csr_refs)


@ray.remote
def _fit_twolist_block_remote(
    texts_arr, from_grams_df, n_from_docs, n_gram_range, clean, remove_space
):
    """Two-list joint fit of one block in a Ray task: to-side DF, merge
    with the (distributed) from-side DF, sklearn-parity vocab, to-side
    CSR index. Returns (TfidfVocab, TopkIndex)."""
    pad = n_gram_range[1]
    arr = clean_strings_arrow(texts_arr) if clean else texts_arr
    doc_ids, grams = batch_ngrams(arr, n_gram_range, remove_space, pad_width=pad)
    to_grams, to_df = df_counts(doc_ids, grams)
    f_grams, f_df = from_grams_df
    g_from = _gram_array(f_grams, pad)
    g_all = np.concatenate([np.asarray(to_grams, dtype=f"S{pad}"), g_from])
    d_all = np.concatenate(
        [
            np.asarray(to_df, np.int64),
            np.asarray(f_df, np.int64) if len(f_df) else np.empty(0, np.int64),
        ]
    )
    if len(g_all):
        order = np.argsort(g_all, kind="stable")
        g_all, d_all = g_all[order], d_all[order]
        st = np.flatnonzero(np.r_[True, g_all[1:] != g_all[:-1]])
        g_all, d_all = g_all[st], np.add.reduceat(d_all, st)
    n_docs = len(texts_arr) + int(n_from_docs)
    vocab = TfidfVocab.from_df_counts(
        g_all, d_all, n_docs, n_gram_range, clean, remove_space
    )
    return vocab, TopkIndex(vocab.transform(texts_arr))


@ray.remote
def _fit_tfidf_block_remote(texts, row_orders, n_gram_range, clean, remove_space):
    """Parallel per-block self-match TF-IDF fit: vocab from the block's own
    strings (the reference self-match fit, polyfuzz/models/_tfidf.py:114),
    to-side CSR index built in the same task."""
    bi = BlockIndex(texts, row_orders)
    arr = bi.texts_arr
    if clean:
        arr = clean_strings_arrow(arr)
    doc_ids, grams = batch_ngrams(arr, n_gram_range, remove_space, pad_width=n_gram_range[1])
    g, df = df_counts(doc_ids, grams)
    bi.tfidf_vocab = TfidfVocab.from_df_counts(
        g, df, len(bi.texts_arr), n_gram_range, clean, remove_space
    )
    bi.topk = TopkIndex(bi.tfidf_vocab.transform(bi.texts_arr))
    return bi


@ray.remote
def _attach_order_remote(tbl, offset: int) -> pa.Table:
    tbl = _as_arrow_block(tbl)
    order = pa.array(np.arange(offset, offset + tbl.num_rows, dtype=np.int64))
    return tbl.append_column("row_order", order)


def _as_arrow_block(block) -> pa.Table:
    """Raw dataset blocks can be pandas (ray.data.from_pandas inputs);
    _refs_with_num_rows hands them through unconverted (unlike the old
    to_arrow_refs), so block consumers normalize here."""
    if isinstance(block, pa.Table):
        return block
    from ray.data.block import BlockAccessor

    return BlockAccessor.for_block(block).to_arrow()


def distinct_entities_table(
    ds,
    text_col: str = "entity_text",
    block_col: str = "block_key",
    order_col: str = "row_order",
    drop_null_col: str | None = None,
) -> pa.Table:
    """Distinct (block, text) pairs with min(order) — the first-appearance
    rank linkage depends on — via per-batch partial dedup in ``map_batches``
    plus one driver-side merge of the partials.

    This is the pre-aggregate pattern: each batch ships at most its own
    distinct set, the driver merges sets bounded by the global distinct
    count — which must fit in memory anyway (it becomes the broadcast
    to-side index). A Ray groupby would shuffle the same rows for far more
    task overhead at this cardinality.
    """

    def partial(batch: pa.Table) -> pa.Table:
        return _dedup_partial(batch, block_col, text_col, order_col, drop_null_col)

    parts = pa.concat_tables(
        ray.get(ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()),
        promote_options="default",
    )
    return _dedup_min_arrow(parts)


def distinct_entities_dataset(
    ds,
    text_col: str = "entity_text",
    block_col: str = "block_key",
    order_col: str = "row_order",
    drop_null_col: str | None = None,
):
    """Distributed variant of :func:`distinct_entities_table`: per-batch
    partial dedup slims the exchange, then an exact
    ``groupby([block, text]).min(order)`` — the distinct set NEVER lands on
    the driver (the scale path when it exceeds the broadcast assumption;
    pair it with the sharded self-match). The composite groupby key spreads
    a hot block_key across reduce partitions, so the output feeds scoring
    without the driver-side interleave."""
    from ray.data.aggregate import Min

    def partial(batch: pa.Table) -> pa.Table:
        return _dedup_partial(batch, block_col, text_col, order_col, drop_null_col)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["block_key", "entity_text"])
        .aggregate(Min("row_order", alias_name="row_order"))
    )


def spread_table(tbl: pa.Table, target_rows_per_block: int = 512):
    """In-memory Arrow table -> Dataset split into enough blocks to keep
    every core busy (map_batches parallelism = block count; a single
    from_arrow block would serialize the scoring stage).

    Rows are INTERLEAVED round-robin across slices, not sliced
    contiguously: the table is typically sorted by block_key, and scoring
    work per row is proportional to its block's to-side size — contiguous
    slices would hand all the hot-block rows to a few straggler tasks
    (this is the skew handling for the hot blocking key: from-side split,
    to-side broadcast, SURVEY §4)."""
    import ray.data as rd

    cpus = int(ray.cluster_resources().get("CPU", 8))
    n_blocks = max(1, min(cpus * 4, (tbl.num_rows + target_rows_per_block - 1) // target_rows_per_block))
    if n_blocks <= 1:
        return rd.from_arrow(tbl)
    # ONE take of the full interleave permutation (contiguous ranges of the
    # permuted table are the round-robin slices), then ONE remote task
    # splits it into n_blocks object-store entries — per-slice driver-side
    # ray.puts cost ~10 ms each and dominated this function at 100+ slices
    n = tbl.num_rows
    idx = np.arange(n)
    perm = np.concatenate([idx[i::n_blocks] for i in range(n_blocks)])
    permuted = tbl.take(pa.array(perm))
    sizes = [len(idx[i::n_blocks]) for i in range(n_blocks)]
    offsets = np.r_[0, np.cumsum(sizes)[:-1]].astype(np.int64)
    out = _split_table_remote.options(num_returns=n_blocks + 1).remote(
        permuted, offsets.tolist(), [int(s) for s in sizes]
    )
    refs, meta_ref = list(out[:-1]), out[-1]
    # rd.from_arrow_refs launches one remote metadata probe PER block and
    # ray.gets them all (~0.9 s at 128 blocks of pure scheduling latency);
    # the split task already held every slice, so it returns the block
    # metadata as one extra output and the Dataset is assembled directly.
    # Internal-API use is fenced with a public-API fallback.
    try:
        from ray.data._internal.logical.interfaces import LogicalPlan
        from ray.data._internal.logical.operators.from_operators import FromArrow
        from ray.data._internal.plan import ExecutionPlan
        from ray.data._internal.stats import DatasetStats
        from ray.data.dataset import MaterializedDataset

        metas = ray.get(meta_ref)
        if metas is None:  # split task couldn't build metadata (version drift)
            return _from_arrow_refs_with_warning(refs)
        plan = ExecutionPlan(
            DatasetStats(metadata={"FromArrow": metas}, parent=None),
            rd.DataContext.get_current().copy(),
        )
        ds = MaterializedDataset(plan, LogicalPlan(FromArrow(refs, metas), plan._context))
        # validate the assembled shape INSIDE the fence (ADVICE r2): a Ray
        # version where construction succeeds but the metadata shape broke
        # must degrade to the warned fallback here, not fail downstream
        if ds._plan.initial_num_blocks() != len(refs):
            raise RuntimeError("spread_table: assembled block count mismatch")
        meta_rows = sum(m.metadata.num_rows or 0 for m in metas)
        if meta_rows != n:
            raise RuntimeError("spread_table: assembled row count mismatch")
        return ds
    except Exception:
        return _from_arrow_refs_with_warning(refs)


def _from_arrow_refs_with_warning(refs):
    """Public-API fallback for spread_table's direct Dataset assembly.
    The fallback re-introduces one metadata probe task per block (~0.9 s
    at 128 blocks) — warn once so the regression is visible in bench
    drift triage instead of silent."""
    import warnings

    import ray.data as rd

    global _SPREAD_FALLBACK_WARNED
    if not _SPREAD_FALLBACK_WARNED:
        _SPREAD_FALLBACK_WARNED = True
        warnings.warn(
            "spread_table: direct block-metadata assembly unavailable "
            "(Ray internal API drift); falling back to from_arrow_refs, "
            "which adds one metadata probe task per block",
            RuntimeWarning,
        )
    return rd.from_arrow_refs(refs)


_SPREAD_FALLBACK_WARNED = False


@ray.remote
def _split_table_remote(tbl: pa.Table, offsets, sizes):
    # combine_chunks per slice so each returned table owns compact buffers
    slices = [tbl.slice(o, s).combine_chunks() for o, s in zip(offsets, sizes)]
    try:  # metadata classes are version-sensitive: None -> driver fallback
        from ray.data.block import BlockExecStats, BlockMetadataWithSchema

        metas = [
            BlockMetadataWithSchema.from_block(
                s, stats=BlockExecStats.builder().build()
            )
            for s in slices
        ]
    except Exception:
        metas = None
    return (*slices, metas)


def _dedup_partial(batch: pa.Table, block_col, text_col, order_col,
                   drop_null_col) -> pa.Table:
    """Shared map_batches body of both distinct paths: drop-null filter,
    rename to the canonical entities schema, per-batch dedup."""
    if drop_null_col is not None:
        batch = batch.filter(pc.is_valid(batch[drop_null_col]))
    return _dedup_min_arrow(
        pa.table(
            {
                "block_key": batch[block_col],
                "entity_text": batch[text_col],
                "row_order": batch[order_col],
            }
        )
    )


# combine_chunks / concat of a plain-string column overflows Arrow's int32
# offsets at 2 GiB of text; above this bound the column is widened to
# large_string (int64 offsets). Patchable in tests to exercise the wide path
# at small scale.
ARROW_STR_WIDEN_BOUND = 1_800_000_000


def _widen_text_if_needed(tbl: pa.Table, col: str) -> pa.Table:
    c = tbl[col]
    if c.nbytes > ARROW_STR_WIDEN_BOUND and pa.types.is_string(c.type):
        tbl = tbl.set_column(
            tbl.column_names.index(col), col, c.cast(pa.large_string())
        )
    return tbl


def _dedup_min_arrow(tbl: pa.Table) -> pa.Table:
    """Arrow-native distinct (block, text) with min(order): one multi-key
    C sort + shifted-equality dedup — no object-dtype lexsort, no Python
    string materialization.

    Nulls in the key columns are rejected loudly (pc.equal(null, x) would
    silently keep every null row, diverging from the groupby scale path
    which collapses nulls — pass drop_null_col upstream instead). A text
    column above ~1.8 GiB is cast to ``large_string`` (int64 offsets) so
    the single-array merge cannot overflow Arrow's int32 string offsets;
    the whole downstream path (sort/take/equal, the byte-gram machinery,
    the scoring take-sources) is large_string-clean."""
    n = tbl.num_rows
    if n == 0:
        return tbl
    for col in ("block_key", "entity_text"):
        if tbl[col].null_count:
            raise ValueError(
                f"null {col} in distinct input — filter upstream "
                "(drop_null_col) so the fast and groupby paths agree"
            )
    tbl = _widen_text_if_needed(tbl, "entity_text")
    idx = pc.sort_indices(
        tbl,
        sort_keys=[
            ("block_key", "ascending"),
            ("entity_text", "ascending"),
            ("row_order", "ascending"),
        ],
    )
    t = tbl.take(idx)
    b = t["block_key"].combine_chunks()
    x = t["entity_text"].combine_chunks()
    same = pc.and_(
        pc.equal(b.slice(1), b.slice(0, n - 1)),
        pc.equal(x.slice(1), x.slice(0, n - 1)),
    )
    keep = np.r_[True, ~np.asarray(same.to_numpy(zero_copy_only=False), dtype=bool)]
    return t.filter(pa.array(keep))


# ---------------------------------------------------------------------------
# per-block to-side indexes
# ---------------------------------------------------------------------------


class BlockIndex:
    """Broadcast payload for one block: to-side texts (in to-list order)
    plus the matcher-specific index structure.

    Texts are held as an Arrow string array: (de)serialization through the
    object store is buffer-based (no per-string Python unpickling per
    worker) and the scoring hot path assembles its To column via
    ``Array.take`` without ever materializing Python strings. The lazy
    ``texts`` property gives a numpy object view for the code paths that
    genuinely need str objects (edit-distance scorers, embedders,
    driver-side artifact writing) — computed once per holder.
    """

    __slots__ = ("texts_arr", "row_orders", "tfidf_vocab", "topk", "packed",
                 "emb", "n_distinct", "_texts_np")

    def __init__(self, texts, row_orders: np.ndarray | None = None):
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        if isinstance(texts, pa.Array):
            self.texts_arr = texts
        else:
            self.texts_arr = pa.array(
                [str(t) for t in texts], type=pa.string()
            )
        self.row_orders = row_orders
        self.tfidf_vocab: TfidfVocab | None = None
        self.topk: TopkIndex | None = None
        self.packed = None
        self.emb: np.ndarray | None = None
        self.n_distinct = len(pc.unique(self.texts_arr))
        self._texts_np = None


    def __getstate__(self):
        # explicit slots state: the cloudpickle by-value class fallback
        # (cross-cwd driver contract) cannot rely on __dict__
        return {k: getattr(self, k) for k in self.__slots__}

    def __setstate__(self, state):
        for k, v in state.items():
            setattr(self, k, v)

    @property
    def texts(self) -> np.ndarray:
        if self._texts_np is None:
            self._texts_np = np.asarray(self.texts_arr.to_pylist(), dtype=object)
        return self._texts_np

    def __len__(self) -> int:
        return len(self.texts_arr)


def _collect_to_side(to_ds_or_table, text_col="entity_text", block_col="block_key",
                     order_col="row_order") -> dict[str, BlockIndex]:
    """Collect the (small) to-side into per-block ordered text arrays.

    THE broadcast assumption: to-side fits on the driver / object store.
    """
    if isinstance(to_ds_or_table, pa.Table):
        tbl = to_ds_or_table
    else:
        tbl = pa.concat_tables(
            ray.get(to_ds_or_table.to_arrow_refs()), promote_options="default"
        )
    n = tbl.num_rows
    if order_col not in tbl.column_names:
        tbl = tbl.append_column(
            order_col, pa.array(np.arange(n, dtype=np.int64))
        )
    out: dict[str, BlockIndex] = {}
    if n == 0:
        return out
    if tbl[block_col].null_count:
        raise ValueError(
            "null block_key in to-side input — assign a real key upstream"
        )
    # widen to large_string above the int32-offset bound BEFORE the take /
    # combine_chunks below can overflow (the downstream gram machinery and
    # scoring take-sources handle int64 offsets)
    tbl = _widen_text_if_needed(tbl, text_col)
    # Arrow-native: one C multi-key sort, block runs from a vectorized
    # adjacent-equality mask (no object-dtype lexsort, no Python strings)
    idx = pc.sort_indices(
        tbl,
        sort_keys=[(block_col, "ascending"), (order_col, "ascending")],
    )
    t = tbl.take(idx)
    b_arr = t[block_col].combine_chunks()
    texts_sorted = t[text_col].combine_chunks()
    orders = np.asarray(
        t[order_col].to_numpy(zero_copy_only=False), dtype=np.int64
    )
    same = np.asarray(
        pc.equal(b_arr.slice(1), b_arr.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        ),
        dtype=bool,
    )
    starts = np.flatnonzero(np.r_[True, ~same])
    ends = np.append(starts[1:], n)
    block_keys = b_arr.take(pa.array(starts, type=pa.int64())).to_pylist()
    for bk, s, e in zip(block_keys, starts, ends):
        # Arrow slice is zero-copy; combine to drop the parent buffer refs
        out[bk] = BlockIndex(texts_sorted.slice(s, e - s), orders[s:e])
    return out


def _distributed_df_counts(from_ds, spec: MatcherSpec):
    """Per-(block, gram) document frequencies + per-block doc counts of the
    FROM side, as small driver tables. The shuffle is bounded by vocab
    size; partial DF per batch is exact because each doc is in one batch.
    """
    rng = spec.n_gram_range
    clean = spec.clean_string
    rm = spec.remove_space_ngrams

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch["entity_text"].combine_chunks()
        if clean:
            texts = clean_strings_arrow(texts)
        blocks = np.asarray(batch["block_key"].to_pylist(), dtype=object)
        doc_ids, grams = batch_ngrams(texts, rng, rm, pad_width=rng[1])
        # DF must be computed per (block, gram); docs of one block only
        out_blocks: list = []
        out_grams: list = []
        out_df: list = []
        if len(grams):
            # unique (doc, gram)
            order = np.lexsort((grams, doc_ids))
            d, g = doc_ids[order], grams[order]
            keep = np.empty(len(d), bool)
            keep[0] = True
            keep[1:] = (d[1:] != d[:-1]) | (g[1:] != g[:-1])
            d, g = d[keep], g[keep]
            b = blocks[d]
            order2 = np.lexsort((g, b))
            b, g = b[order2], g[order2]
            chg = np.empty(len(b), bool)
            chg[0] = True
            chg[1:] = (b[1:] != b[:-1]) | (g[1:] != g[:-1])
            st = np.flatnonzero(chg)
            cnt = np.diff(np.append(st, len(b)))
            out_blocks = b[st].tolist()
            # grams stay fixed-width NUL-padded BYTES end to end: no
            # per-gram decode here, S-dtype (not object) sorts on merge
            out_grams = g[st].tolist()
            out_df = cnt.tolist()
        # per-block doc counts (every doc counts, even zero-gram docs);
        # marker gram = b"" (real grams are never empty/all-NUL)
        ub, uc = np.unique(blocks, return_counts=True)
        return pa.table(
            {
                "block_key": pa.array(out_blocks + ub.tolist(), type=pa.string()),
                "gram": pa.array(out_grams + [b""] * len(ub), type=pa.binary()),
                "df": pa.array(np.concatenate([np.asarray(out_df, np.int64), uc.astype(np.int64)])),
            }
        )

    # Per-batch partials are bounded by the batch's distinct (block, gram)
    # set — vocab-scale, not corpus-scale — so the exact sum happens as a
    # single vectorized driver merge (the Ray groupby here measured ~7s of
    # fixed sort-shuffle at sf-probe scale for a vocab-bounded result).
    # Above the bound the groupby fallback keeps it fully distributed.
    parts_ds = from_ds.map_batches(partial, batch_format="pyarrow").materialize()
    n_part_rows = parts_ds.count()
    if n_part_rows <= 50_000_000:
        parts = pa.concat_tables(
            ray.get(parts_ds.to_arrow_refs()), promote_options="default"
        )
        # Arrow-native C sort on (string, binary) keys; only the SORTED
        # columns materialize to numpy afterwards
        sidx = pc.sort_indices(
            parts,
            sort_keys=[("block_key", "ascending"), ("gram", "ascending")],
        )
        parts = parts.take(sidx)
        b = np.asarray(parts["block_key"].to_pylist(), dtype=object)
        g = np.asarray(parts["gram"].to_pylist(), dtype=f"S{rng[1]}")
        d = np.asarray(parts["df"].to_numpy(zero_copy_only=False), dtype=np.int64)
        if len(b):
            st = np.flatnonzero(np.r_[True, (b[1:] != b[:-1]) | (g[1:] != g[:-1])])
            b, g = b[st], g[st]
            d = np.add.reduceat(d, st)
        doc_counts: dict[str, int] = {}
        # values: (grams, df) — S-dtype/int64 numpy arrays here, plain
        # lists on the groupby fallback; consumers normalize via _gram_array
        per_block: dict[str, tuple] = {}
        if len(b):
            blk_st = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
            for s, e in zip(blk_st, np.append(blk_st[1:], len(b))):
                bk = b[s]
                grams_run = g[s:e]
                df_run = d[s:e]
                is_doc = grams_run == b""
                if is_doc.any():
                    doc_counts[bk] = int(df_run[is_doc][0])
                keep = ~is_doc
                per_block[bk] = (grams_run[keep], df_run[keep])
        return per_block, doc_counts

    agg = parts_ds.groupby(["block_key", "gram"]).sum("df")
    pdf = agg.to_pandas()
    dfcol = "sum(df)" if "sum(df)" in pdf.columns else "df"
    doc_counts = (
        pdf[pdf["gram"] == b""].set_index("block_key")[dfcol].to_dict()
    )
    gram_rows = pdf[pdf["gram"] != b""]
    per_block = {}
    for bk, gram, df in zip(gram_rows["block_key"], gram_rows["gram"], gram_rows[dfcol]):
        per_block.setdefault(bk, ([], []))[0].append(gram)
        per_block[bk][1].append(int(df))
    return per_block, doc_counts


def build_block_indexes(
    spec: MatcherSpec,
    to_blocks: dict[str, BlockIndex],
    from_ds=None,
    self_match: bool = False,
) -> dict[str, BlockIndex]:
    """Fit per-block matcher state into the BlockIndex structures.

    TF-IDF: joint fit on to+from (polyfuzz/models/_tfidf.py:109) — from-side
    DF arrives from the distributed aggregation; self-match fits on the
    from(=to) side only, whose strings are already collected per block.
    """
    if spec.kind == "tfidf":
        if self_match or from_ds is None:
            items = list(to_blocks.items())
            total = sum(len(bi.texts_arr) for _, bi in items)
            if total > 4_000 and len(items) > 1:
                # fit blocks in parallel Ray tasks (driver would be the
                # Amdahl bottleneck at scale otherwise); oversized blocks
                # additionally fan their own fit out across chunk tasks so
                # the hottest blocking key is not a single-task straggler
                big = [
                    (bk, bi)
                    for bk, bi in items
                    if len(bi.texts_arr) > _PARALLEL_FIT_CHUNK
                ]
                small = [
                    (bk, bi)
                    for bk, bi in items
                    if len(bi.texts_arr) <= _PARALLEL_FIT_CHUNK
                ]
                big_topk_refs = {
                    bk: _fit_big_block_parallel(bi, spec) for bk, bi in big
                }
                futs = [
                    _fit_tfidf_block_remote.remote(
                        bi.texts_arr, bi.row_orders,
                        tuple(spec.n_gram_range), spec.clean_string,
                        spec.remove_space_ngrams,
                    )
                    for _, bi in small
                ]
                for (bk, _), built in zip(small, ray.get(futs)):
                    to_blocks[bk] = built
                for bk, topk in zip(
                    big_topk_refs, ray.get(list(big_topk_refs.values()))
                ):
                    to_blocks[bk].topk = topk
            else:
                for bk, bi in items:
                    grams, df = _driver_df(bi.texts_arr, spec)
                    bi.tfidf_vocab = TfidfVocab.from_df_counts(
                        grams, df, len(bi.texts_arr), spec.n_gram_range,
                        spec.clean_string, spec.remove_space_ngrams,
                    )
                    bi.topk = TopkIndex(bi.tfidf_vocab.transform(bi.texts_arr))
        else:
            # joint fit per block: from-side DF is distributed; the
            # to-side DF + merge + CSR transform run in one Ray task per
            # block (round-1 did all of it on the driver, sequentially)
            per_block, from_doc_counts = _distributed_df_counts(from_ds, spec)
            items2 = list(to_blocks.items())
            futs2 = [
                _fit_twolist_block_remote.remote(
                    bi.texts_arr,
                    per_block.get(bk, ([], [])),
                    int(from_doc_counts.get(bk, 0)),
                    tuple(spec.n_gram_range), spec.clean_string,
                    spec.remove_space_ngrams,
                )
                for bk, bi in items2
            ]
            for (bk, bi), (vocab, topk) in zip(items2, ray.get(futs2)):
                bi.tfidf_vocab = vocab
                bi.topk = topk
    elif spec.kind in ("rapidfuzz", "editdistance"):
        for bi in to_blocks.values():
            bi.packed = editdist.PaddedStrings([str(t) for t in bi.texts])
    elif spec.kind == "embeddings":
        embedder = spec.embedder
        if embedder is None:
            embedder = HashEmbedder()
        for bi in to_blocks.values():
            bi.emb = l2_normalize(
                np.asarray(embedder(list(bi.texts)), dtype=np.float64)
            )
    else:
        raise ValueError(f"unknown matcher kind {spec.kind!r}")
    return to_blocks


def _driver_df(texts, spec: MatcherSpec):
    if isinstance(texts, pa.Array):
        arr = texts
    else:
        arr = pa.array([str(t) for t in texts], type=pa.string())
    if spec.clean_string:
        arr = clean_strings_arrow(arr)
    doc_ids, grams = batch_ngrams(
        arr, spec.n_gram_range, spec.remove_space_ngrams, pad_width=spec.n_gram_range[1]
    )
    return df_counts(doc_ids, grams)


# ---------------------------------------------------------------------------
# scoring actors
# ---------------------------------------------------------------------------


# Worker-process-global cache: stateless scoring tasks reuse the
# deserialized block indexes across batches on the same Ray worker, giving
# actor-pool state amortization WITHOUT actor-pool startup cost (the numpy
# buffers inside are plasma-shared zero-copy; only the small object-dtype
# parts deserialize once per worker).
_SCORER_CACHE: dict = {}


def _spec_key(spec: "MatcherSpec") -> tuple:
    return (
        spec.kind, tuple(spec.n_gram_range), spec.clean_string,
        spec.min_similarity, spec.top_n, spec.cosine_method,
        spec.remove_space_ngrams, spec.score_cutoff,
        getattr(spec.scorer, "__name__", str(spec.scorer)), spec.normalize,
    )


# broadcast caches live in raylink.broadcast (shared with ann/dedup);
# re-exported here because worker closures across the repo capture them as
# pipeline module symbols and linkage imports them from this path.
from raylink.broadcast import (  # noqa: E402
    _BROADCAST_CACHE,
    cached_derived,
    cached_object,
)


def make_assignment_lookup(cl_tbl: pa.Table):
    """Cluster table -> broadcast-ready sorted lookup (composite key
    "block\\x1fmember" -> (representative, cluster_id)) + the batch-side
    resolver. Arrow arrays ship buffer-based; each worker derives numpy
    views once; per-batch resolution is one vectorized searchsorted —
    no 100k-entry Python dicts pickled or rebuilt anywhere."""
    # composite keys + sort stay in Arrow C kernels; bytewise UTF-8 order
    # equals the former per-object codepoint sort (UTF-8 preserves
    # codepoint order), and keys are unique per (block, member) so sort
    # stability is immaterial
    # large_string: int64 offsets keep the composite-key column above the
    # 2 GiB int32 bound (same widening the distinct merges use); cast
    # BEFORE combine_chunks — combining >2 GiB of plain-string chunks is
    # itself the offset overflow being guarded against
    # clusters are non-null by construction; a null block_key/member would
    # produce a NULL composite key (binary_join_element_wise propagates
    # nulls) that sort_indices moves to the end and the resolver would
    # silently never match — fail loudly instead (ADVICE r2, mirroring
    # _dedup_min_arrow's null rejection)
    n_null = cl_tbl["block_key"].null_count + cl_tbl["member"].null_count
    if n_null:
        raise ValueError(
            f"make_assignment_lookup: {n_null} null block_key/member rows — "
            "cluster keys must be non-null (nulls would resolve to misses)"
        )
    keys_arr = pc.binary_join_element_wise(
        cl_tbl["block_key"].cast(pa.large_string()).combine_chunks(),
        cl_tbl["member"].cast(pa.large_string()).combine_chunks(),
        pa.scalar("\x1f", type=pa.large_string()),
    )
    order_arr = pc.sort_indices(keys_arr)
    payload = (
        keys_arr.take(order_arr),
        cl_tbl["representative"].combine_chunks().take(order_arr),
        cl_tbl["cluster_id"].combine_chunks().take(order_arr),
    )
    ref = ray.put(payload)

    def _derive(p):
        k, r, c = p
        return (
            np.asarray(k.to_pylist(), dtype=object),
            np.asarray(r.to_pylist(), dtype=object),
            np.asarray(c.to_numpy(zero_copy_only=False), dtype=np.int64),
        )

    def resolve(blocks: list, texts: list):
        k, r, c = cached_derived(ref, _derive, "assign")
        bk = np.asarray(
            [f"{b}\x1f{t}" for b, t in zip(blocks, texts)], dtype=object
        )
        pos = np.searchsorted(k, bk)
        pos_c = np.minimum(pos, max(len(k) - 1, 0))
        hit = (pos < len(k)) & (k[pos_c] == bk) if len(k) else np.zeros(len(bk), bool)
        groups = np.where(hit, r[pos_c] if len(k) else None, np.asarray(texts, dtype=object))
        cids = np.where(hit, c[pos_c] if len(k) else -1, -1)
        return groups, cids.astype(np.int64)

    return resolve


def _cached_scorer(index_ref, spec, top_n_cols, self_match) -> "ScorerActor":
    key = (index_ref.hex() if hasattr(index_ref, "hex") else id(index_ref),
           _spec_key(spec), top_n_cols, self_match)
    s = _SCORER_CACHE.get(key)
    if s is None:
        if len(_SCORER_CACHE) > 8:
            # pop the COLDEST entry (insertion order approximates it) —
            # clear() evicted the currently-hot scorer mid-stage and the
            # next batch re-fetched the index from plasma (the broadcast
            # cache's move-to-end LRU lesson, round-5 review finding)
            _SCORER_CACHE.pop(next(iter(_SCORER_CACHE)))
        s = ScorerActor(index_ref, spec, top_n_cols, self_match)
        _SCORER_CACHE[key] = s
    else:
        # move-to-end: a re-hit entry is hot again
        _SCORER_CACHE.pop(key, None)
        _SCORER_CACHE[key] = s
    return s


class ScorerActor:
    """Scoring ``map_batches`` callable: per-block matcher state is fetched
    from the object store ONCE per worker (broadcast read) — either as an
    actor (``__init__``) or via the worker-global task cache above;
    ``__call__`` scores one Arrow batch, grouped by block_key inside the
    batch (batches arrive mixed — scoring needs no co-location)."""

    def __init__(self, index_ref, spec: MatcherSpec, top_n_cols: int, self_match: bool):
        self.blocks: dict[str, BlockIndex] = ray.get(index_ref)
        self.spec = spec
        self.top_n_cols = top_n_cols
        self.self_match = self_match
        if spec.kind in ("rapidfuzz", "editdistance") and spec.scorer is not None:
            self.scorer = editdist.resolve_scorer(spec.scorer)
        elif spec.kind == "rapidfuzz":
            self.scorer = editdist.WRatio
        elif spec.kind == "editdistance":
            self.scorer = editdist.ratio
        else:
            self.scorer = None
        if spec.kind == "embeddings":
            self.embedder = spec.embedder
            if self.embedder is None:
                self.embedder = HashEmbedder()
        # first-occurrence position of each to-text per block (edit-distance
        # family needs value -> index resolution without an O(n) scan)
        self._pos_maps: dict[str, dict[str, int]] = {}
        # packed WRatio to-side state per block (built once per actor)
        self._wr_states: dict[str, "editdist.WRatioToSide"] = {}
        # packed plain to-side (levenshtein fast path), built once per actor
        self._packed_states: dict[str, "editdist.PaddedStrings"] = {}

    def _wr_state(self, bk: str, bi: "BlockIndex") -> "editdist.WRatioToSide":
        st = self._wr_states.get(bk)
        if st is None:
            st = editdist.WRatioToSide([str(t) for t in bi.texts])
            self._wr_states[bk] = st
        return st

    def _pos_map(self, bk: str, bi: "BlockIndex") -> dict[str, int]:
        pm = self._pos_maps.get(bk)
        if pm is None:
            pm = {}
            for j, t in enumerate(bi.texts.tolist()):
                if t not in pm:
                    pm[t] = j
            self._pos_maps[bk] = pm
        return pm

    def __call__(self, batch: pa.Table) -> pa.Table:
        spec = self.spec
        text_arr = batch["entity_text"].combine_chunks()
        blocks = np.asarray(batch["block_key"].to_pylist(), dtype=object)
        orders = np.asarray(batch["row_order"].to_numpy(zero_copy_only=False), dtype=np.int64)
        n = len(blocks)
        k = self.top_n_cols
        # global (row, col) -> (block-local to-index, sim); -1 pad
        out_idx = np.full((n, k), -1, dtype=np.int64)
        out_sim = np.zeros((n, k), dtype=np.float64)
        # per-row offset of its block's texts inside the concatenated
        # take-source, so output strings resolve via one Arrow take
        take_base = np.zeros(n, dtype=np.int64)
        take_sources: list[pa.Array] = []
        base = 0

        sort = np.argsort(blocks, kind="stable")
        b_s = blocks[sort]
        chg = np.empty(n, bool)
        if n:
            chg[0] = True
            chg[1:] = b_s[1:] != b_s[:-1]
        starts = np.flatnonzero(chg)
        needs_py_texts = spec.kind in ("rapidfuzz", "editdistance", "embeddings")
        for s, e in zip(starts, np.append(starts[1:], n)):
            bk = b_s[s]
            rows = sort[s:e]
            bi = self.blocks.get(bk)
            if bi is None:
                continue
            if needs_py_texts:
                block_texts = np.asarray(
                    text_arr.take(pa.array(rows)).to_pylist(), dtype=object
                )
            else:
                block_texts = text_arr.take(pa.array(rows))
            idx, sims = self._score_block(block_texts, orders[rows], bi, bk)
            kk = min(k, idx.shape[1])
            if spec.kind in ("tfidf", "embeddings"):
                sims = np.round(sims, 3)
                null = (sims < 0.001) | (idx < 0)
                idx = np.where(null, -1, idx)
                sims = np.where(null, 0.0, sims)
            out_idx[rows, :kk] = idx[:, :kk]
            out_sim[rows, :kk] = sims[:, :kk]
            take_base[rows] = base
            take_sources.append(bi.texts_arr)
            base += len(bi.texts_arr)

        source = (
            pa.concat_arrays(take_sources)
            if take_sources
            else pa.array([], type=pa.string())
        )
        cols: dict[str, pa.Array] = {"from": text_arr}
        for c in range(k):
            col_idx = out_idx[:, c]
            take_idx = np.where(col_idx < 0, 0, col_idx + take_base)
            # Arrow take with null indices yields nulls — exactly the pad
            taken = source.take(
                pa.array(take_idx, type=pa.int64(), mask=col_idx < 0)
            ) if len(source) else pa.array([None] * n, type=pa.string())
            to_name = "to" if c == 0 else f"to_{c + 1}"
            sim_name = "similarity" if c == 0 else f"similarity_{c + 1}"
            cols[to_name] = taken
            cols[sim_name] = pa.array(out_sim[:, c], type=pa.float64())
        cols["block_key"] = batch["block_key"].combine_chunks()
        cols["row_order"] = batch["row_order"].combine_chunks()
        return pa.table(cols)

    # ------------------------------------------------------------------
    def _score_block(self, texts, orders, bi: BlockIndex, bk: str = ""):
        spec = self.spec
        if spec.kind == "tfidf":
            fr: CSR = bi.tfidf_vocab.transform(texts)
            if self.self_match:
                # positional diagonal via the to-side row_orders
                pos = _self_positions(bi.row_orders, orders)
                return _topk_selfmap(
                    fr, bi.topk, self.top_n_cols, spec, pos
                )
            return topk_cosine(
                fr, bi.topk, self.top_n_cols,
                min_similarity=spec.min_similarity,
                apply_min_similarity=spec.cosine_method == "sparse",
            )
        if spec.kind == "embeddings":
            fe = l2_normalize(np.asarray(self.embedder(list(texts)), dtype=np.float64))
            if self.self_match:
                pos = _self_positions(bi.row_orders, orders)
                idx, sims = _dense_selfmap(fe, bi.emb, self.top_n_cols, pos)
            else:
                idx, sims = dense_topk_cosine(fe, bi.emb, self.top_n_cols)
            if spec.cosine_method == "sparse" and spec.min_similarity > 0:
                drop = sims <= spec.min_similarity
                sims = np.where(drop, 0.0, sims)
                idx = np.where(drop, -1, idx)
            return idx, sims
        # edit-distance family: best match only (top_n == 1 in reference)
        n = len(texts)
        idx = np.full((n, 1), -1, dtype=np.int64)
        sims = np.zeros((n, 1), dtype=np.float64)
        to_list = [str(t) for t in bi.texts]
        if spec.kind == "editdistance" and self.scorer is editdist.ratio and not self.self_match:
            for i, t in enumerate(texts):
                scores = editdist.ratio_one_to_many(str(t), bi.packed)
                j = int(np.argmax(scores))
                idx[i, 0] = j
                sims[i, 0] = scores[j]
            return idx, sims
        if spec.kind == "rapidfuzz" and self.scorer is editdist.levenshtein_sim:
            # packed one-vs-many Levenshtein DP sweeps the whole to-side per
            # query; first-max/cutoff/exclude semantics identical to
            # extract_one (argmax first-occurrence = tie-to-first-choice)
            packed = self._packed_states.get(bk)
            if packed is None:
                packed = editdist.PaddedStrings(to_list)
                self._packed_states[bk] = packed
            pm = self._pos_map(bk, bi)
            cutoff = spec.score_cutoff * 100
            for i, t in enumerate(texts):
                t = str(t)
                scores = editdist.levenshtein_sim_one_to_many(t, packed)
                if self.self_match:
                    for jx, s_to in enumerate(to_list):
                        if s_to == t:
                            scores = scores.copy()
                            scores[jx] = -np.inf
                            break
                if not len(scores):
                    continue
                j = int(np.argmax(scores))
                if scores[j] < cutoff or scores[j] == -np.inf:
                    continue
                idx[i, 0] = pm[to_list[j]]
                sims[i, 0] = float(scores[j]) / 100
            return idx, sims
        if spec.kind == "rapidfuzz" and self.scorer is editdist.WRatio:
            # packed one-vs-many WRatio: base + token_sort DPs sweep the
            # whole to-side per query; first-max/cutoff semantics identical
            # to extract_one (see editdist.extract_one_packed)
            ts = self._wr_state(bk, bi)
            pm = self._pos_map(bk, bi)
            for i, t in enumerate(texts):
                t = str(t)
                m = editdist.extract_one_packed(
                    t, ts, score_cutoff=spec.score_cutoff * 100,
                    exclude_first_equal=t if self.self_match else None,
                )
                if m:
                    j, s = m
                    idx[i, 0] = pm[ts.orig[j]]
                    sims[i, 0] = s / 100
            return idx, sims
        for i, t in enumerate(texts):
            t = str(t)
            choices = to_list
            if self.self_match:
                choices = to_list.copy()
                if t in choices:
                    choices.remove(t)
            if spec.kind == "rapidfuzz":
                m = editdist.extract_one(
                    t, choices, score_cutoff=spec.score_cutoff * 100,
                    scorer=self.scorer,
                )
                if m:
                    # map back to original index (first occurrence)
                    idx[i, 0] = self._pos_map(bk, bi)[m[0]]
                    sims[i, 0] = m[1] / 100
            else:
                if not choices:
                    continue
                scores = [self.scorer(t, c) for c in choices]
                j = int(np.argmax(scores))
                idx[i, 0] = self._pos_map(bk, bi)[choices[j]]
                sims[i, 0] = float(scores[j])
        return idx, sims


def _self_positions(row_orders: np.ndarray, orders: np.ndarray) -> np.ndarray:
    """Per-row to-side position of the row ITSELF, or -2 when the row's
    row_order is absent from this index (sharded self-match: only the shard
    that owns the row drops its positional diagonal)."""
    n_to = len(row_orders)
    if n_to == 0:
        return np.full(len(orders), -2, dtype=np.int64)
    pos = np.searchsorted(row_orders, orders)
    posc = np.minimum(pos, n_to - 1)
    ok = (pos < n_to) & (row_orders[posc] == orders)
    return np.where(ok, posc, -2)


def _topk_selfmap(fr, topk_index, top_n, spec, positions):
    """Self-match scoring where the from-batch is an arbitrary subset of the
    to-side: zero the matching positional entry per row, then top-k."""
    idx, sims = topk_cosine(
        fr, topk_index, top_n + 1,
        min_similarity=spec.min_similarity,
        apply_min_similarity=spec.cosine_method == "sparse",
    )
    return _drop_positional(idx, sims, positions, top_n)


def _dense_selfmap(fe, to_emb, top_n, positions):
    idx, sims = dense_topk_cosine(fe, to_emb, top_n + 1)
    return _drop_positional(idx, sims, positions, top_n)


def _drop_positional(idx, sims, positions, top_n):
    """Remove the self hit (by to-side position) from each row's top list,
    keeping top_n entries — equivalent to zeroing the diagonal before
    selection (polyfuzz/models/_utils.py:84-87)."""
    n = idx.shape[0]
    out_idx = np.full((n, top_n), -1, dtype=np.int64)
    out_sim = np.zeros((n, top_n), dtype=np.float64)
    self_col = idx == positions[:, None]
    for i in range(n):
        keep = ~self_col[i]
        vals_i = idx[i][keep][:top_n]
        sims_i = sims[i][keep][:top_n]
        out_idx[i, : len(vals_i)] = vals_i
        out_sim[i, : len(sims_i)] = sims_i
    missing = out_sim <= 0.0
    out_idx[missing] = -1
    out_sim[missing] = 0.0
    return out_idx, out_sim


# ---------------------------------------------------------------------------
# the public match / group pipeline
# ---------------------------------------------------------------------------


@dataclass
class MatchResult:
    matches: "ray.data.Dataset"
    spec: MatcherSpec
    top_n_cols: int
    index_ref: Any  # ray ObjectRef to the block indexes (for transform)
    self_match: bool
    index_blocks: Any = None  # driver-side dict[str, BlockIndex] (reuse)
    sharded_self: bool = False  # produced by the sharded self-match path


def _gram_array(grams, pad: int) -> np.ndarray:
    """Normalize a gram collection (S-dtype array, bytes list, or str
    list) into the NUL-padded fixed-width byte array TfidfVocab expects."""
    if isinstance(grams, np.ndarray) and grams.dtype.kind == "S":
        return grams.astype(f"S{pad}")
    if not len(grams):
        return np.empty(0, f"S{pad}")
    enc = [g.encode() if isinstance(g, str) else g for g in grams]
    return np.asarray(enc, dtype=f"S{pad}")


def build_selfmatch_vocabs(from_ds, spec: MatcherSpec) -> dict[str, "TfidfVocab"]:
    """Per-block TF-IDF vocab for a self-match fit, computed DISTRIBUTED:
    DF counts come from map_batches partials + a bounded groupby (the same
    machinery as the two-list joint fit) — no block's strings are ever
    collected to the driver. Only the (vocab, idf) tables land here, and
    those are bounded by the ngram alphabet, not the corpus."""
    per_block, doc_counts = _distributed_df_counts(from_ds, spec)
    pad = spec.n_gram_range[1]
    vocabs: dict[str, TfidfVocab] = {}
    for bk, n in doc_counts.items():
        grams, df = per_block.get(bk, ([], []))
        vocabs[bk] = TfidfVocab.from_df_counts(
            _gram_array(grams, pad), np.asarray(df, np.int64), int(n),
            spec.n_gram_range, spec.clean_string, spec.remove_space_ngrams,
        )
    return vocabs


@ray.remote(num_returns=2)
def _build_selfmatch_shard_remote(kind, state, *tables):
    """Build one to-side shard's per-block indexes in a Ray task. Input
    tables are consecutive sorted (block_key, row_order) blocks; ``state``
    is the per-block vocab map (tfidf) or the embedder callable
    (embeddings). Returns (dict[str, BlockIndex], dict[str, n_rows])."""
    tbl = pa.concat_tables(
        [_as_arrow_block(t) for t in tables], promote_options="default"
    )
    blocks = _collect_to_side(tbl)
    counts: dict[str, int] = {}
    for bk, bi in blocks.items():
        if kind == "tfidf":
            vocab = state[bk]
            bi.tfidf_vocab = vocab
            bi.topk = TopkIndex(vocab.transform(bi.texts_arr))
        elif kind in ("rapidfuzz", "editdistance"):
            # state is the packed-scorer tag; the heavy numeric DP
            # matrices live in this plasma object (zero-copy numpy views
            # per worker). CAVEAT: the python-side string structures
            # (WRatio token sets / orig lists, and the scorer's lazy
            # first-occurrence maps) deserialize onto each worker's heap —
            # a worker that touches every shard eventually holds the full
            # to-side's strings. That residual is inherent to python-level
            # scorers; the dominant memory (codepoint matrices) stays
            # plasma-shared, which is what the sharding bounds.
            texts = [str(t) for t in bi.texts]
            if state == "WRatio":
                bi.packed = editdist.WRatioToSide(texts)
            else:  # levenshtein | ratio share the plain padded matrix
                bi.packed = editdist.PaddedStrings(texts)
        else:  # embeddings
            bi.emb = l2_normalize(
                np.asarray(state(list(bi.texts)), dtype=np.float64)
            )
        counts[bk] = len(bi.texts_arr)
    return blocks, counts


_GPOS_PAD = np.int64(1) << 62  # sorts missing candidates last


def _ed_scorer_tag(spec: MatcherSpec) -> str | None:
    """Packed-scorer tag for the sharded edit-distance path, or None when
    the spec's scorer has no packed one-vs-many kernel (custom callables
    stay broadcast-only — a documented bound, not a silent one)."""
    if spec.scorer is None:
        return "WRatio" if spec.kind == "rapidfuzz" else "ratio"
    try:
        sc = editdist.resolve_scorer(spec.scorer)
    except (ValueError, TypeError):
        return None
    if spec.kind == "rapidfuzz" and sc is editdist.WRatio:
        return "WRatio"
    if spec.kind == "rapidfuzz" and sc is editdist.levenshtein_sim:
        return "levenshtein"
    if spec.kind == "editdistance" and sc is editdist.ratio:
        return "ratio"
    return None


class ShardedScorer:
    """Scoring (self-match OR two-list) against a SHARDED to-side: the
    per-shard indexes live in the object store as separate refs; each
    scoring task walks the shards (node-local plasma reads — one copy per
    node, zero-copy numpy), keeps a running per-row top-k, and resolves
    ties exactly like the single-index kernel (max sim, then lowest global
    to-position). No shard partial tables exist and nothing merges on the
    driver — K4 (SURVEY §2.6) realized as a per-batch in-memory merge."""

    def __init__(self, shard_refs, state_ref, shard_base_ref, spec: MatcherSpec,
                 top_n_cols: int, self_match: bool = True):
        self.shard_refs = list(shard_refs)
        # tfidf: dict[block -> TfidfVocab]; embeddings: the embedder callable
        self.state = ray.get(state_ref)
        # shard_base: dict[block_key -> np.ndarray(n_shards,)] global
        # to-position of each shard's first row of that block (-1 = absent).
        # Broadcast by ref — with many blocks this dict is big, and closure
        # capture would ship it inside every serialized scoring UDF.
        self.shard_base = ray.get(shard_base_ref)
        self.spec = spec
        self.k = top_n_cols
        self.self_match = self_match
        # per-(shard, block) first-occurrence value->local-index maps for
        # the edit-distance family's value-equal self-exclusion
        self._ed_pm: dict = {}

    def _ed_first_pos(self, si: int, bk: str, bi: "BlockIndex") -> dict:
        pm = self._ed_pm.get((si, bk))
        if pm is None:
            pm = {}
            for j, t in enumerate(bi.texts.tolist()):
                t = str(t)
                if t not in pm:
                    pm[t] = j
            self._ed_pm[(si, bk)] = pm
        return pm

    def _score_block_ed(
        self, texts_py, shards, bases, bk, rows, out_sim, out_to
    ):
        """Edit-distance family against the sharded to-side.

        Per shard: packed one-vs-many scores, per-row top-2 first-max
        candidates (top-2 because self-match may exclude exactly one
        globally-first value-equal entry, which can be a shard's top-1).
        Merge: drop the excluded candidate, pick (max score, lowest global
        to-position) — identical to the broadcast extract_one semantics
        (within-shard argmax = first max; cross-shard lowest gpos = global
        first), then the inclusive score cutoff (rapidfuzz kinds only).
        """
        spec = self.spec
        tag = self.state
        n = len(texts_py)
        sims_parts: list[np.ndarray] = []
        gpos_parts: list[np.ndarray] = []
        shard_parts: list[np.ndarray] = []
        local_parts: list[np.ndarray] = []
        eq_gpos = np.full(n, _GPOS_PAD, dtype=np.int64)
        for si, sh in enumerate(shards):
            if bases[si] < 0:
                continue
            bi = sh.get(bk)
            if bi is None or len(bi.texts_arr) == 0:
                continue
            st = bi.packed
            base = int(bases[si])
            s2 = np.full((n, 2), -np.inf, dtype=np.float64)
            g2 = np.full((n, 2), _GPOS_PAD, dtype=np.int64)
            l2 = np.full((n, 2), -1, dtype=np.int64)
            pm = self._ed_first_pos(si, bk, bi) if self.self_match else None
            for i, t in enumerate(texts_py):
                if tag == "WRatio":
                    vec = editdist.wratio_one_to_many(t, st)
                elif tag == "levenshtein":
                    vec = editdist.levenshtein_sim_one_to_many(t, st)
                else:
                    vec = editdist.ratio_one_to_many(t, st)
                j1 = int(np.argmax(vec))
                s2[i, 0] = vec[j1]
                g2[i, 0] = j1 + base
                l2[i, 0] = j1
                if len(vec) > 1:
                    vec2 = vec.copy()
                    vec2[j1] = -np.inf
                    j2 = int(np.argmax(vec2))
                    s2[i, 1] = vec2[j2]
                    g2[i, 1] = j2 + base
                    l2[i, 1] = j2
                if pm is not None:
                    fe = pm.get(t)
                    if fe is not None and fe + base < eq_gpos[i]:
                        eq_gpos[i] = fe + base
            sims_parts.append(s2)
            gpos_parts.append(g2)
            shard_parts.append(np.full((n, 2), si, dtype=np.int64))
            local_parts.append(l2)
        if not sims_parts:
            return
        S = np.concatenate(sims_parts, axis=1)
        G = np.concatenate(gpos_parts, axis=1)
        SH = np.concatenate(shard_parts, axis=1)
        L = np.concatenate(local_parts, axis=1)
        if self.self_match:
            S = np.where(G == eq_gpos[:, None], -np.inf, S)
        sel = np.lexsort((G, -S), axis=1)[:, :1]
        bs = np.take_along_axis(S, sel, axis=1)[:, 0]
        bg = np.take_along_axis(G, sel, axis=1)[:, 0]
        bsh = np.take_along_axis(SH, sel, axis=1)[:, 0]
        bl = np.take_along_axis(L, sel, axis=1)[:, 0]
        ok = np.isfinite(bs) & (bg < _GPOS_PAD)
        if spec.kind == "rapidfuzz":
            ok &= bs >= spec.score_cutoff * 100
            vals = bs / 100.0
        else:
            vals = bs
        to_obj = np.full(n, None, dtype=object)
        for si in np.unique(bsh[ok]) if ok.any() else []:
            mask = ok & (bsh == si)
            taken = shards[si][bk].texts_arr.take(
                pa.array(bl[mask], type=pa.int64())
            )
            to_obj[mask] = np.asarray(taken.to_pylist(), dtype=object)
        out_sim[rows, 0] = np.where(ok, vals, 0.0)
        out_to[rows, 0] = to_obj

    def __call__(self, batch: pa.Table) -> pa.Table:
        spec = self.spec
        k = self.k
        text_arr = batch["entity_text"].combine_chunks()
        blocks = np.asarray(batch["block_key"].to_pylist(), dtype=object)
        orders = np.asarray(
            batch["row_order"].to_numpy(zero_copy_only=False), dtype=np.int64
        )
        n = len(blocks)
        out_sim = np.zeros((n, k), dtype=np.float64)
        out_to = np.full((n, k), None, dtype=object)
        shards = [cached_object(r) for r in self.shard_refs]

        sort = np.argsort(blocks, kind="stable")
        b_s = blocks[sort]
        chg = np.empty(n, bool)
        if n:
            chg[0] = True
            chg[1:] = b_s[1:] != b_s[:-1]
        for s, e in zip(np.flatnonzero(chg), np.append(np.flatnonzero(chg)[1:], n)):
            bk = b_s[s]
            rows = sort[s:e]
            bases = self.shard_base.get(bk)
            if bases is None:
                continue
            if spec.kind in ("rapidfuzz", "editdistance"):
                texts_py = [
                    str(t) for t in text_arr.take(pa.array(rows)).to_pylist()
                ]
                self._score_block_ed(
                    texts_py, shards, bases, bk, rows, out_sim, out_to
                )
                continue
            if spec.kind == "tfidf":
                vocab = self.state.get(bk)
                if vocab is None:
                    continue
                fr = vocab.transform(text_arr.take(pa.array(rows)))
            else:  # embeddings: state is the embedder callable
                fr = l2_normalize(
                    np.asarray(
                        self.state(text_arr.take(pa.array(rows)).to_pylist()),
                        dtype=np.float64,
                    )
                )
            sims_parts: list[np.ndarray] = []
            gpos_parts: list[np.ndarray] = []
            shard_parts: list[np.ndarray] = []
            local_parts: list[np.ndarray] = []
            for si, sh in enumerate(shards):
                if bases[si] < 0:
                    continue
                bi = sh.get(bk)
                if bi is None:
                    continue
                if spec.kind == "tfidf":
                    if self.self_match:
                        pos = _self_positions(bi.row_orders, orders[rows])
                        idx, sims = _topk_selfmap(fr, bi.topk, k, spec, pos)
                    else:
                        idx, sims = topk_cosine(
                            fr, bi.topk, k,
                            min_similarity=spec.min_similarity,
                            apply_min_similarity=spec.cosine_method == "sparse",
                        )
                else:  # embeddings (dense)
                    if self.self_match:
                        pos = _self_positions(bi.row_orders, orders[rows])
                        idx, sims = _dense_selfmap(fr, bi.emb, k, pos)
                    else:
                        idx, sims = dense_topk_cosine(fr, bi.emb, k)
                    if spec.cosine_method == "sparse" and spec.min_similarity > 0:
                        drop = sims <= spec.min_similarity
                        sims = np.where(drop, 0.0, sims)
                        idx = np.where(drop, -1, idx)
                gpos = np.where(idx >= 0, idx + bases[si], _GPOS_PAD)
                sims_parts.append(sims)
                gpos_parts.append(gpos)
                shard_parts.append(np.full_like(idx, si))
                local_parts.append(idx)
            if not sims_parts:
                continue
            sims_all = np.concatenate(sims_parts, axis=1)
            gpos_all = np.concatenate(gpos_parts, axis=1)
            shard_all = np.concatenate(shard_parts, axis=1)
            local_all = np.concatenate(local_parts, axis=1)
            sel = np.lexsort((gpos_all, -sims_all), axis=1)[:, :k]
            sel_sims = np.take_along_axis(sims_all, sel, axis=1)
            sel_shard = np.take_along_axis(shard_all, sel, axis=1)
            sel_local = np.take_along_axis(local_all, sel, axis=1)
            rs = np.round(sel_sims, 3)
            null = (rs < 0.001) | (sel_local < 0)
            rs = np.where(null, 0.0, rs)
            to_obj = np.full(sel_local.shape, None, dtype=object)
            for si in np.unique(sel_shard[~null]) if (~null).any() else []:
                mask = (sel_shard == si) & ~null
                taken = shards[si][bk].texts_arr.take(
                    pa.array(sel_local[mask], type=pa.int64())
                )
                to_obj[mask] = np.asarray(taken.to_pylist(), dtype=object)
            out_sim[rows[:, None], np.arange(k)[None, :]] = rs
            out_to[rows[:, None], np.arange(k)[None, :]] = to_obj

        cols: dict[str, pa.Array] = {"from": text_arr}
        for c in range(k):
            to_name = "to" if c == 0 else f"to_{c + 1}"
            sim_name = "similarity" if c == 0 else f"similarity_{c + 1}"
            cols[to_name] = pa.array(out_to[:, c], type=pa.string())
            cols[sim_name] = pa.array(out_sim[:, c], type=pa.float64())
        cols["block_key"] = batch["block_key"].combine_chunks()
        cols["row_order"] = batch["row_order"].combine_chunks()
        return pa.table(cols)


_SHARDED_SCORER_CACHE: dict = {}


def _cached_sharded_scorer(shard_refs, vocab_ref, shard_base_ref, spec, k, sm):
    key = (
        tuple(r.hex() for r in shard_refs),
        vocab_ref.hex(),
        shard_base_ref.hex(),
        _spec_key(spec),
        k,
        sm,
    )
    s = _SHARDED_SCORER_CACHE.get(key)
    if s is None:
        if len(_SHARDED_SCORER_CACHE) > 4:
            _SHARDED_SCORER_CACHE.clear()
        s = ShardedScorer(shard_refs, vocab_ref, shard_base_ref, spec, k, sm)
        _SHARDED_SCORER_CACHE[key] = s
    return s


def build_joint_vocabs(from_ds, to_ds, spec: MatcherSpec) -> dict[str, "TfidfVocab"]:
    """Per-block JOINT (to+from, polyfuzz/models/_tfidf.py:109) TF-IDF
    vocab with BOTH sides' DF counted distributed — neither side's strings
    are collected to the driver (the two-list analogue of
    :func:`build_selfmatch_vocabs`)."""
    pad = spec.n_gram_range[1]
    pb_from, dc_from = _distributed_df_counts(from_ds, spec)
    pb_to, dc_to = _distributed_df_counts(to_ds, spec)
    vocabs: dict[str, TfidfVocab] = {}
    for bk in set(dc_from) | set(dc_to):
        g_parts = []
        d_parts = []
        for pb in (pb_from, pb_to):
            grams, df = pb.get(bk, ([], []))
            if len(grams):
                g_parts.append(_gram_array(grams, pad))
                d_parts.append(np.asarray(df, np.int64))
        if g_parts:
            g_all = np.concatenate(g_parts)
            d_all = np.concatenate(d_parts)
            order = np.argsort(g_all, kind="stable")
            g_all, d_all = g_all[order], d_all[order]
            chg = np.empty(len(g_all), bool)
            chg[0] = True
            chg[1:] = g_all[1:] != g_all[:-1]
            st = np.flatnonzero(chg)
            g_all = g_all[st]
            d_all = np.add.reduceat(d_all, st)
        else:
            g_all = np.empty(0, f"S{pad}")
            d_all = np.empty(0, np.int64)
        n_docs = int(dc_from.get(bk, 0)) + int(dc_to.get(bk, 0))
        vocabs[bk] = TfidfVocab.from_df_counts(
            g_all, d_all, n_docs, spec.n_gram_range,
            spec.clean_string, spec.remove_space_ngrams,
        )
    return vocabs


def match_dataset_sharded(
    from_ds,
    to_ds=None,
    spec: MatcherSpec | None = None,
    text_col: str = "entity_text",
    block_col: str | None = "block_key",
    batch_size: int = 1024,
    max_broadcast_to_rows: int = 2_000_000,
    n_shards: int | None = None,
) -> MatchResult:
    """Match whose to-side exceeds the single-broadcast bound — K4 for
    BOTH the self-match (``to_ds=None``, VERDICT round-1 scale-killer #2)
    and the two-list case:

      1. per-block vocab fit fully distributed (DF groupby; joint over
         to+from in the two-list case so shard scores are comparable);
      2. to-side sorted by (block_key, row_order) — one range shuffle —
         and its sorted blocks grouped into ~equal row shards, each shard's
         per-block CSR index built in its own Ray task and LEFT in the
         object store (driver handles only refs + per-shard block counts);
      3. scoring tasks stream the from-side and merge per-row top-k across
         shard indexes in memory (ties: lowest global to-position, the
         single-index argmax rule), so results are byte-identical to the
         broadcast path. No shard partial tables, no driver merge."""
    spec = spec or MatcherSpec()
    if spec.kind not in ("tfidf", "embeddings", "rapidfuzz", "editdistance"):
        raise ValueError(
            "sharded matching supports tfidf, embeddings and the packed "
            "edit-distance scorers"
        )
    if spec.kind in ("rapidfuzz", "editdistance"):
        if _ed_scorer_tag(spec) is None:
            raise ValueError(
                "sharded edit-distance matching supports the packed scorers "
                "(WRatio, levenshtein, ratio); for a custom scorer callable "
                "keep the to-side under max_broadcast_to_rows (block it or "
                "raise the bound)"
            )
    import math

    if "row_order" not in from_ds.schema().names:
        from_ds = dataset_with_row_order(from_ds, text_col, block_col)
    self_match = to_ds is None
    if self_match:
        to_side = from_ds
    else:
        if "row_order" not in to_ds.schema().names:
            to_ds = dataset_with_row_order(to_ds, text_col, block_col)
        to_side = to_ds
    if spec.kind == "tfidf":
        state = (
            build_selfmatch_vocabs(from_ds, spec)
            if self_match
            else build_joint_vocabs(from_ds, to_ds, spec)
        )
    elif spec.kind in ("rapidfuzz", "editdistance"):
        state = _ed_scorer_tag(spec)  # packed-scorer tag, validated above
    else:  # embeddings: no fit — the embedder itself is the shared state
        state = spec.embedder if spec.embedder is not None else HashEmbedder()
    state_ref = ray.put(state)

    sorted_ds = to_side.sort(["block_key", "row_order"]).materialize()
    refs, sizes = _refs_with_num_rows(sorted_ds)
    total = int(sum(sizes))
    if n_shards is None:
        n_shards = max(1, math.ceil(total / max_broadcast_to_rows))
    target = math.ceil(total / n_shards) if n_shards else total

    shard_refs: list = []
    count_refs: list = []
    group: list = []
    acc = 0
    for r, sz in zip(refs, sizes):
        group.append(r)
        acc += sz
        if acc >= target:
            i_ref, c_ref = _build_selfmatch_shard_remote.remote(
                spec.kind, state_ref, *group
            )
            shard_refs.append(i_ref)
            count_refs.append(c_ref)
            group, acc = [], 0
    if group:
        i_ref, c_ref = _build_selfmatch_shard_remote.remote(
            spec.kind, state_ref, *group
        )
        shard_refs.append(i_ref)
        count_refs.append(c_ref)
    counts = ray.get(count_refs)
    n_sh = len(shard_refs)
    shard_base: dict[str, np.ndarray] = {}
    for si, cd in enumerate(counts):
        for bk, c in cd.items():
            shard_base.setdefault(bk, np.full(n_sh, -1, dtype=np.int64))
    running: dict[str, int] = {bk: 0 for bk in shard_base}
    for si, cd in enumerate(counts):
        for bk, c in cd.items():
            shard_base[bk][si] = running[bk]
            running[bk] += int(c)

    k = spec.top_n
    if spec.kind in ("rapidfuzz", "editdistance"):
        k = 1  # the edit-distance family is best-match-only (reference)
    if not self_match and spec.top_n > 1 and spec.kind not in ("rapidfuzz", "editdistance"):
        # top_n clamp by distinct to-strings (polyfuzz/models/_utils.py:54)
        # — distributed distinct count, small result
        dcounts = (
            distinct_entities_dataset(to_side)
            .groupby("block_key")
            .count()
            .to_pandas()
        )
        max_distinct = (
            int(dcounts["count()"].max()) if len(dcounts) else spec.top_n
        )
        k = min(spec.top_n, max_distinct)
    _spec, _k, _sm = spec, k, self_match
    _refs, _vref = shard_refs, state_ref
    _base = ray.put(shard_base)

    def score_batch(batch: pa.Table) -> pa.Table:
        return _cached_sharded_scorer(_refs, _vref, _base, _spec, _k, _sm)(batch)

    matches = from_ds.map_batches(
        score_batch, batch_format="pyarrow", batch_size=batch_size
    )
    if spec.kind == "editdistance" and spec.normalize:
        matches = _minmax_normalize(matches, "similarity")
    return MatchResult(
        matches, spec, k, index_ref=None, self_match=self_match,
        index_blocks=None, sharded_self=self_match,
    )


def match_dataset_sharded_self(
    from_ds,
    spec: MatcherSpec | None = None,
    batch_size: int = 1024,
    max_broadcast_to_rows: int = 2_000_000,
    n_shards: int | None = None,
) -> MatchResult:
    """Back-compat alias: self-match case of :func:`match_dataset_sharded`."""
    return match_dataset_sharded(
        from_ds, None, spec, batch_size=batch_size,
        max_broadcast_to_rows=max_broadcast_to_rows, n_shards=n_shards,
    )


def match_dataset(
    from_ds,
    to_ds=None,
    spec: MatcherSpec | None = None,
    text_col: str = "entity_text",
    block_col: str | None = "block_key",
    concurrency=(1, 8),
    batch_size: int = 1024,
    prebuilt_index_ref=None,
    top_n_cols_override: int | None = None,
    self_match_override: bool | None = None,
    max_broadcast_to_rows: int = 2_000_000,
) -> MatchResult:
    """Distributed equivalent of ``matcher.match(from_list, to_list)``.

    ``from_ds``/``to_ds`` need columns (text_col, block_col?, row_order?).
    ``to_ds=None`` = self-match: the to-side per block is the from-side
    itself (collected — broadcast assumption).
    Returns a streaming matches Dataset with columns
    (from, to, similarity, [to_i, similarity_i...], block_key, row_order).

    When a tfidf to-side (two-list OR self-match) exceeds
    ``max_broadcast_to_rows``, the call automatically switches to the
    sharded-index path (:func:`match_dataset_sharded`): the vocabulary
    stays joint over the full corpus so scores are comparable, each
    object-store index covers one shard, and scoring tasks merge per-row
    top-k across shards in memory — identical results, bounded broadcast.
    """
    spec = spec or MatcherSpec()
    _shardable = spec.kind in ("tfidf", "embeddings") or (
        spec.kind in ("rapidfuzz", "editdistance")
        and _ed_scorer_tag(spec) is not None
    )
    if to_ds is not None and prebuilt_index_ref is None and _shardable:
        try:
            n_to_rows = to_ds.count()
        except Exception:
            n_to_rows = 0
        if n_to_rows > max_broadcast_to_rows:
            return match_dataset_sharded(
                from_ds, to_ds, spec,
                text_col=text_col, block_col=block_col,
                batch_size=batch_size,
                max_broadcast_to_rows=max_broadcast_to_rows,
            )
    _is_self = to_ds is None if self_match_override is None else self_match_override
    if spec.kind == "tfidf" and spec.cosine_method == "knn" and _is_self:
        # the reference's knn SELF-match quirk (drop column 0 of top_n+1,
        # sklearn tie order decides WHICH duplicate survives) delegates to
        # sklearn internals that are not reproducible distributed; the
        # matcher surface (raylink.matchers.TFIDFMatcher) implements it —
        # failing loudly beats silently returning sparse-semantics results
        raise ValueError(
            "cosine_method='knn' self-match is matcher-only "
            "(raylink.matchers.TFIDFMatcher); the distributed pipeline "
            "implements the 'sparse' semantics"
        )
    _from_names = from_ds.schema().names
    if "row_order" not in _from_names:
        from_ds = dataset_with_row_order(from_ds, text_col, block_col)
    elif text_col != "entity_text" or "block_key" not in _from_names:
        # reader-provided row_order with custom column names still needs
        # the schema normalization (downstream stages key on entity_text/
        # block_key — skipping it crashed the documented contract)
        from_ds = _normalize_entities(from_ds, text_col, block_col)
    self_match = to_ds is None if self_match_override is None else self_match_override

    if self_match and prebuilt_index_ref is None and _shardable:
        # auto-switch to the sharded self-match path when the to-side
        # (= the from-side itself) exceeds the single-broadcast bound;
        # pinning first is free — the broadcast path collects it anyway
        from_ds = from_ds.materialize()
        if from_ds.count() > max_broadcast_to_rows:
            return match_dataset_sharded_self(
                from_ds, spec, batch_size=batch_size,
                max_broadcast_to_rows=max_broadcast_to_rows,
            )

    if prebuilt_index_ref is not None:
        index_ref = prebuilt_index_ref
        top_n_cols = top_n_cols_override or spec.top_n
    else:
        if self_match:
            blocks = _collect_to_side(from_ds)
            top_n_cols = spec.top_n
            build_block_indexes(spec, blocks, from_ds=None, self_match=True)
        else:
            _to_names = to_ds.schema().names
            if "row_order" not in _to_names:
                to_ds = dataset_with_row_order(to_ds, text_col, block_col)
            elif text_col != "entity_text" or "block_key" not in _to_names:
                to_ds = _normalize_entities(to_ds, text_col, block_col)
            blocks = _collect_to_side(to_ds)
            # top_n clamp by distinct to-strings (polyfuzz/models/_utils.py:54-56)
            max_distinct = max((b.n_distinct for b in blocks.values()), default=0)
            top_n_cols = min(spec.top_n, max_distinct) if blocks else spec.top_n
            build_block_indexes(spec, blocks, from_ds=from_ds, self_match=False)
        index_ref = ray.put(blocks)

    built_blocks = blocks if prebuilt_index_ref is None else None
    if spec.kind in ("rapidfuzz", "editdistance"):
        top_n_cols = 1
    if spec.kind == "embeddings":
        # real stateful stage (model weights load in __init__): actor pool
        matches = from_ds.map_batches(
            ScorerActor,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            fn_constructor_kwargs={
                "index_ref": index_ref,
                "spec": spec,
                "top_n_cols": top_n_cols,
                "self_match": self_match,
            },
        )
    else:
        # index-only state: stateless tasks + worker-global cache (same
        # amortization as an actor pool, none of the pool-startup latency;
        # tasks run on Ray's pre-started workers)
        _tn, _sm = top_n_cols, self_match

        def score_batch(batch: pa.Table, _ref=index_ref, _spec=spec) -> pa.Table:
            return _cached_scorer(_ref, _spec, _tn, _sm)(batch)

        matches = from_ds.map_batches(
            score_batch,
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    if spec.kind == "editdistance" and spec.normalize:
        matches = _minmax_normalize(matches, "similarity")
    return MatchResult(matches, spec, top_n_cols, index_ref, self_match, built_blocks)


def match_dataset_sharded_to(
    from_ds,
    to_ds,
    spec: MatcherSpec | None = None,
    n_shards: int = 2,
    **kwargs,
):
    """Back-compat table-returning wrapper over the two-list case of
    :func:`match_dataset_sharded` (round 1 merged driver-side shard
    partials; the streaming per-batch merge replaced that — VERDICT
    round-1 K4 note)."""
    kwargs.pop("concurrency", None)
    res = match_dataset_sharded(
        from_ds, to_ds, spec, n_shards=n_shards, **kwargs
    )
    return pa.concat_tables(
        ray.get(res.matches.to_arrow_refs()), promote_options="default"
    )


def merge_clusters_across_blocks(
    clusters_ds,
    spec: MatcherSpec | None = None,
    link_min_similarity: float = 0.75,
    batch_size: int = 1024,
):
    """Cross-block entity merge (SURVEY §7.1 step 5): blocking can split an
    entity's variants across blocks (e.g. a typo in the blocking
    character), which per-block linkage cannot repair. This stage
    self-matches the per-block cluster REPRESENTATIVES globally (a single
    broadcast index over representatives only — tiny post-blocking) and
    union-finds clusters whose representatives clear the link threshold.

    Input: the clusters Dataset (block_key, cluster_id, member,
    representative). Returns it with a ``global_cluster_id`` column
    (canonical = lexicographically-minimal (block_key, cluster_id) pair
    encoded as "block/cid"). Within-block results are untouched — this
    only merges across blocks, so reference parity at a fixed blocking key
    is preserved when every entity stays within one block.
    """
    import ray.data as rd

    from raylink.linkage import UnionFind

    spec = spec or MatcherSpec(
        kind="tfidf", n_gram_range=(3, 3), min_similarity=link_min_similarity
    )
    cl_tbl = pa.concat_tables(
        ray.get(clusters_ds.to_arrow_refs()), promote_options="default"
    )
    # distinct representatives with their (block, cluster) identity
    reps = pd.DataFrame(
        {
            "block_key": cl_tbl["block_key"].to_pylist(),
            "cluster_id": cl_tbl["cluster_id"].to_pylist(),
            "representative": cl_tbl["representative"].to_pylist(),
        }
    ).drop_duplicates(["block_key", "cluster_id"], ignore_index=True)

    rep_entities = pa.table(
        {
            "row_order": pa.array(np.arange(len(reps), dtype=np.int64)),
            "entity_text": pa.array(reps["representative"], type=pa.string()),
            "block_key": pa.array([ALL_BLOCK] * len(reps), type=pa.string()),
        }
    )
    res = match_dataset(
        spread_table(rep_entities), None, spec, batch_size=batch_size
    )
    edges = pa.concat_tables(
        ray.get(res.matches.to_arrow_refs()), promote_options="default"
    )
    key = [
        f"{b}/{c}" for b, c in zip(reps["block_key"], reps["cluster_id"])
    ]
    rep_to_keys: dict[str, list[str]] = {}
    for k, r in zip(key, reps["representative"]):
        rep_to_keys.setdefault(r, []).append(k)
    uf = UnionFind()
    for k in key:
        uf.find(k)
    # same representative string in two blocks -> same entity
    for ks in rep_to_keys.values():
        for other in ks[1:]:
            uf.union(ks[0], other)
    for frm, to, sim in zip(
        edges["from"].to_pylist(), edges["to"].to_pylist(),
        edges["similarity"].to_pylist(),
    ):
        if to is not None and sim > link_min_similarity:
            for a in rep_to_keys.get(frm, []):
                for b in rep_to_keys.get(to, []):
                    uf.union(a, b)
    canon: dict[str, str] = {}
    for _root, members in uf.groups().items():
        label = min(members)
        for k in members:
            canon[k] = label
    gmap_ref = ray.put(canon)

    def add_global(batch: pa.Table, _ref=gmap_ref) -> pa.Table:
        gm = cached_object(_ref)
        keys = [
            f"{b}/{c}"
            for b, c in zip(
                batch["block_key"].to_pylist(), batch["cluster_id"].to_pylist()
            )
        ]
        return batch.append_column(
            "global_cluster_id",
            pa.array([gm.get(k, k) for k in keys], type=pa.string()),
        )

    return clusters_ds.map_batches(add_global, batch_format="pyarrow")


def match_many(
    from_ds, to_ds=None, specs: list[MatcherSpec] | None = None, **kwargs
) -> dict[str, MatchResult]:
    """Multi-model compare (polyfuzz/polyfuzz.py:147-152,486-497): run
    several matchers over the same inputs; model ids are deduplicated to
    "Model {i}" on collision exactly like the reference."""
    specs = list(specs or [MatcherSpec()])
    ids = [s.resolved_id() for s in specs]
    if len(set(ids)) != len(ids):
        ids = [s.model_id or f"Model {i}" for i, s in enumerate(specs)]
        if len(set(ids)) != len(ids):
            ids = [f"Model {i}" for i in range(len(specs))]
    out: dict[str, MatchResult] = {}
    if "row_order" not in from_ds.schema().names:
        from_ds = dataset_with_row_order(from_ds, kwargs.get("text_col", "entity_text"),
                                         kwargs.get("block_col", "block_key"))
        kwargs = dict(kwargs)
        kwargs.pop("text_col", None)
        kwargs.pop("block_col", None)
    for mid, spec in zip(ids, specs):
        out[mid] = match_dataset(from_ds, to_ds, spec, **kwargs)
    return out


def _minmax_normalize(ds, col: str):
    """Global min-max normalize (polyfuzz/models/_distance.py:83-87):
    Min/Max aggregate + a second streaming map pass."""
    from ray.data.aggregate import Max, Min

    stats = ds.aggregate(Min(col), Max(col))
    # zero rows: Ray yields None (or a dict of Nones depending on version)
    if stats is None or stats.get(f"min({col})") is None:
        return ds
    lo = float(stats[f"min({col})"])
    hi = float(stats[f"max({col})"])
    span = hi - lo

    def norm(batch: pa.Table) -> pa.Table:
        if span != 0:
            vals = pc.divide(
                pc.subtract(batch[col], pa.scalar(lo)), pa.scalar(span)
            )
        else:  # all-equal scores -> 0/0 -> NaN, as in the reference
            vals = pa.array([float("nan")] * batch.num_rows, type=pa.float64())
        return batch.set_column(batch.column_names.index(col), col, vals)

    return ds.map_batches(norm, batch_format="pyarrow")


def matches_to_frame(matches_ds, top_n_cols: int = 1) -> pd.DataFrame:
    """Small-result helper: matches Dataset -> reference-shaped pandas frame
    ordered by row_order with From/To/Similarity column names."""
    pdf = matches_ds.to_pandas().sort_values("row_order").reset_index(drop=True)
    ren = {"from": "From", "to": "To", "similarity": "Similarity"}
    for c in range(2, top_n_cols + 1):
        ren[f"to_{c}"] = f"To_{c}"
        ren[f"similarity_{c}"] = f"Similarity_{c}"
    if "group" in pdf.columns:
        ren["group"] = "Group"
    pdf = pdf.rename(columns=ren)
    cols = [c for c in match_columns(top_n_cols) if c in pdf.columns]
    extra = [c for c in ("Group",) if c in pdf.columns]
    out = pdf[cols + extra].copy()
    for c in out.columns:
        if c.startswith("To") or c == "Group":
            out[c] = out[c].astype(object).where(out[c].notna(), None)
    return out


# ---------------------------------------------------------------------------
# grouping
# ---------------------------------------------------------------------------


@dataclass
class GroupResult:
    grouped: "ray.data.Dataset"  # matches + group column
    clusters: "ray.data.Dataset"  # (block_key, cluster_id, member, representative)
    name_map_ref: Any


def group_matches(
    match_result: MatchResult,
    grouper_spec: MatcherSpec | None = None,
    link_min_similarity: float = 0.75,
    group_all_strings: bool = False,
    concurrency=(1, 8),
    batch_size: int = 1024,
    distinct_hint_tbl: pa.Table | None = None,
    distinct_is_from_side: bool = False,
    linkage_driver_max_rows: int = 2_000_000,
    group_broadcast_max_rows: int = 20_000_000,
) -> GroupResult:
    """Distributed ``PolyFuzz.group`` (polyfuzz/polyfuzz.py:459-484):

    1. distinct To (or From) strings per block in first-appearance order
       (= min row_order) — a bounded groupby shuffle;
    2. second self-match pass over those strings with the grouper model
       (default TF-IDF 3-grams at the link threshold, polyfuzz.py:355,369);
    3. quirk-exact sequential linkage per block inside ``map_groups``
       (rows sorted by row_order);
    4. Group column joined back via broadcast name map
       (df["Group"] = df.To.map(name_map).fillna(df.To), polyfuzz.py:479).
    """
    # matches feeds BOTH the distinct-string extraction and the grouped
    # output — pin it once instead of re-running the scoring stage.
    matches = match_result.matches.materialize()
    match_result.matches = matches
    col = "from" if group_all_strings else "to"
    grouper_spec = grouper_spec or MatcherSpec(
        kind="tfidf", n_gram_range=(3, 3), min_similarity=link_min_similarity
    )

    if (
        distinct_hint_tbl is not None
        and match_result.self_match
        and group_all_strings
    ):
        # the match pass was a self-match over exactly these distinct rows,
        # so unique(From) in first-appearance order IS the hint table —
        # skip re-deriving it from the matches stream
        dist_tbl = distinct_hint_tbl
    else:
        dist_tbl = None  # derived lazily — the edge-reuse shortcuts never
        # need it (``distinct_is_from_side`` asserts the match pass's
        # from-side WAS the distinct set without materializing it)

    def _ensure_dist_tbl() -> pa.Table:
        nonlocal dist_tbl
        if dist_tbl is None:
            dist_tbl = distinct_entities_table(
                matches, text_col=col, block_col="block_key",
                order_col="row_order", drop_null_col=col,
            )
        return dist_tbl
    # Index reuse: when the grouper's vocabulary-relevant parameters match
    # the original matcher's AND the distinct strings are exactly the
    # original self-match from-side, the fitted per-block index is
    # identical (grouper fit = self-match fit on the same strings,
    # polyfuzz/polyfuzz.py:474 + _tfidf.py:114) — skip refit + re-put and
    # let workers hit their cached index.
    index_ref = None
    blocks = None
    if (
        match_result.self_match
        and group_all_strings
        and match_result.index_blocks is not None
        and match_result.spec.kind == "tfidf" == grouper_spec.kind
        and tuple(match_result.spec.n_gram_range) == tuple(grouper_spec.n_gram_range)
        and match_result.spec.clean_string == grouper_spec.clean_string
        and match_result.spec.remove_space_ngrams == grouper_spec.remove_space_ngrams
    ):
        orig = match_result.index_blocks
        cand = _collect_to_side(_ensure_dist_tbl())
        if set(cand) == set(orig) and all(
            cand[bk].texts_arr.equals(orig[bk].texts_arr)
            and np.array_equal(cand[bk].row_orders, orig[bk].row_orders)
            for bk in cand
        ):
            index_ref = match_result.index_ref
            blocks = orig
    # Edge reuse: when the index is reused (same strings, same vocab
    # parameters), the grouper's top-1 IS the match pass's top-1 — the
    # grouper only differs by the sparse lower-bound mask, and "mask then
    # take top-1 then linkage-filter rounded > t" yields exactly the same
    # surviving (From, To) sequence as "take top-1 then linkage-filter
    # rounded > t": the mask can only null rows whose raw sim <= t, which
    # round to <= t and are dropped by the strict > filter anyway. Guard:
    # the match pass's own mask bound must sit safely below the link
    # threshold so it never removed a row the grouper would keep.
    edge_matches = None
    _match_mask_ok = (
        match_result.spec.min_similarity <= link_min_similarity - 0.001
        or not (
            match_result.spec.cosine_method == "sparse"
            and match_result.spec.min_similarity > 0
        )
    )
    _grouper_mask_ok = (
        grouper_spec.cosine_method != "sparse"
        or grouper_spec.min_similarity <= link_min_similarity
    )
    # knn has drop-first-column (not diagonal-zero) self-match semantics on
    # either side, which breaks the top-1 equivalence the shortcut relies on
    _methods_ok = (
        match_result.spec.cosine_method in ("sparse", "sklearn")
        and grouper_spec.cosine_method in ("sparse", "sklearn")
    )
    # Sharded analogue of the index-reuse check: when the match pass ran
    # the sharded self-match over EXACTLY the distinct strings (the hint
    # table) with the grouper's vocab parameters, its matches ARE the
    # grouper edges — same strings, same joint-fit vocab, same kernel.
    _sharded_edge_ok = (
        match_result.sharded_self
        and match_result.self_match
        and group_all_strings
        and (distinct_hint_tbl is not None or distinct_is_from_side)
        and match_result.spec.kind == "tfidf" == grouper_spec.kind
        and tuple(match_result.spec.n_gram_range) == tuple(grouper_spec.n_gram_range)
        and match_result.spec.clean_string == grouper_spec.clean_string
        and match_result.spec.remove_space_ngrams == grouper_spec.remove_space_ngrams
    )
    if (
        (
            (index_ref is not None and index_ref is match_result.index_ref)
            or _sharded_edge_ok
        )
        and _match_mask_ok
        and _grouper_mask_ok
        and _methods_ok
    ):
        edge_matches = matches  # already materialized; skips a full
        # scoring pass over the same pair count

    if edge_matches is None:
        edges_input = spread_table(_ensure_dist_tbl())
        if index_ref is not None:
            edge_result = match_dataset(
                edges_input,
                to_ds=None,
                spec=grouper_spec,
                concurrency=concurrency,
                batch_size=batch_size,
                prebuilt_index_ref=index_ref,
                top_n_cols_override=1,
            )
        else:
            # no reusable index: plain self-match over the distinct strings
            # — match_dataset collects or auto-shards the to-side itself
            from dataclasses import replace as _dc_replace

            gs = (
                grouper_spec
                if grouper_spec.top_n == 1
                else _dc_replace(grouper_spec, top_n=1)
            )
            edge_result = match_dataset(
                edges_input,
                to_ds=None,
                spec=gs,
                concurrency=concurrency,
                batch_size=batch_size,
            )
        edge_matches = edge_result.matches.materialize()

    lk = float(link_min_similarity)

    def linkage_group(g: pa.Table) -> pa.Table:
        # pyarrow in/out (the pandas conversion around this sequential
        # dict kernel was pure overhead, VERDICT r3 #4); the quirk-exact
        # scan itself needs Python strings, so to_pylist here is the
        # kernel's real input, not a format detour
        order = pc.sort_indices(g["row_order"].combine_chunks())
        g = g.take(order)
        members, cids, reps = single_linkage_arrays(
            np.asarray(g["from"].to_pylist(), dtype=object),
            np.asarray(g["to"].to_pylist(), dtype=object),
            np.asarray(
                g["similarity"].to_numpy(zero_copy_only=False), np.float64
            ),
            lk,
        )
        n = len(members)
        return pa.table(
            {
                "block_key": pa.array(
                    np.full(n, g["block_key"][0].as_py(), dtype=object),
                    type=pa.string(),
                ),
                "cluster_id": pa.array(cids, type=pa.int64()),
                "member": pa.array(members, type=pa.string()),
                "representative": pa.array(reps, type=pa.string()),
            }
        )

    # edge_matches is materialized before the linkage exchange: feeding a
    # scoring stream straight into groupby de-parallelizes the scoring
    # tasks (measured 2.5x slower fused), and the edge table is bounded by
    # the distinct-string count anyway.
    # Linkage is inherently SEQUENTIAL per block (the reference's
    # order-sensitive scan), so the groupby only buys cross-block
    # parallelism — below the driver bound one local sorted pass beats the
    # ~1-2s fixed sort-shuffle (the hot block dominates either way).
    n_edges = edge_matches.count()
    if n_edges <= linkage_driver_max_rows:
        import ray.data as _rd

        etbl = pa.concat_tables(
            ray.get(edge_matches.to_arrow_refs()), promote_options="default"
        )
        blocks_np = np.asarray(etbl["block_key"].to_pylist(), dtype=object)
        orders_np = np.asarray(
            etbl["row_order"].to_numpy(zero_copy_only=False), dtype=np.int64
        )
        order = np.lexsort((orders_np, blocks_np))
        blocks_np = blocks_np[order]
        froms_np = np.asarray(etbl["from"].to_pylist(), dtype=object)[order]
        tos_np = np.asarray(etbl["to"].to_pylist(), dtype=object)[order]
        sims_np = np.asarray(
            etbl["similarity"].to_numpy(zero_copy_only=False), dtype=np.float64
        )[order]
        out_bk: list[np.ndarray] = []
        out_cid: list[np.ndarray] = []
        out_mem: list[np.ndarray] = []
        out_rep: list[np.ndarray] = []
        if len(blocks_np):
            starts = np.flatnonzero(
                np.r_[True, blocks_np[1:] != blocks_np[:-1]]
            )
            for s, e in zip(starts, np.append(starts[1:], len(blocks_np))):
                members, cids, reps = single_linkage_arrays(
                    froms_np[s:e], tos_np[s:e], sims_np[s:e], lk
                )
                out_bk.append(
                    np.full(len(members), blocks_np[s], dtype=object)
                )
                out_cid.append(cids)
                out_mem.append(members)
                out_rep.append(reps)
        cl_tbl = pa.table(
            {
                "block_key": pa.array(
                    np.concatenate(out_bk) if out_bk else [], type=pa.string()
                ),
                "cluster_id": pa.array(
                    np.concatenate(out_cid) if out_cid else [],
                    type=pa.int64(),
                ),
                "member": pa.array(
                    np.concatenate(out_mem) if out_mem else [],
                    type=pa.string(),
                ),
                "representative": pa.array(
                    np.concatenate(out_rep) if out_rep else [],
                    type=pa.string(),
                ),
            }
        )
        clusters = _rd.from_arrow(cl_tbl)
    else:
        clusters = (
            edge_matches.groupby("block_key")
            .map_groups(linkage_group, batch_format="pyarrow")
        ).materialize()
        if clusters.count() > group_broadcast_max_rows:
            # cluster table exceeds the broadcast assumption: the Group
            # column joins via a hash-partitioned co-shuffle instead —
            # the cluster table never lands on the driver (the grouped-
            # output analogue of flagship.assign_clusters_distributed)
            grouped = add_group_distributed(matches, clusters)
            return GroupResult(grouped, clusters, None)
        cl_tbl = pa.concat_tables(
            ray.get(clusters.to_arrow_refs()), promote_options="default"
        )
    # broadcast sorted-array lookup (make_assignment_lookup) — no
    # hundreds-of-thousands-entry Python dict built or pickled anywhere
    resolve = make_assignment_lookup(cl_tbl)

    def add_group(batch: pa.Table, _resolve=resolve) -> pa.Table:
        bks = batch["block_key"].to_pylist()
        # the Group column always maps the To column (polyfuzz.py:479),
        # regardless of which side supplied the cluster strings
        tos = batch["to"].to_pylist()
        groups, _cids = _resolve(bks, tos)
        groups = [
            (g if t is not None else None) for g, t in zip(groups, tos)
        ]
        return batch.append_column("group", pa.array(groups, type=pa.string()))

    grouped = matches.map_batches(add_group, batch_format="pyarrow")
    return GroupResult(grouped, clusters, resolve)


def add_group_distributed(matches_ds, clusters_ds, n_parts: int | None = None):
    """Group-column join with NO driver/broadcast cluster table: match rows
    and cluster rows co-shuffle on hash(block_key, to/member) partitions;
    each partition joins vectorized (sort + searchsorted). Semantics match
    the broadcast ``add_group`` exactly: hit -> representative, miss ->
    the To string itself, null To -> null group. Generic over the match
    frame's columns (top-n extras carry through untouched)."""
    import pandas as _pd

    if n_parts is None:
        n_parts = max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)
    P = n_parts
    match_schema = matches_ds.schema()
    mcols = list(match_schema.names)
    mtypes = dict(zip(match_schema.names, match_schema.types))

    def _keys_parts(blocks: list, texts: list):
        keys = np.asarray(
            [
                (None if t is None else f"{b}\x1f{t}")
                for b, t in zip(blocks, texts)
            ],
            dtype=object,
        )
        filled = np.where(keys == None, "", keys)  # noqa: E711
        part = (
            _pd.util.hash_array(filled.astype(object), categorize=False)
            % np.uint64(P)
        ).astype(np.int64)
        return keys, part

    def tag_matches(batch: pa.Table) -> pa.Table:
        keys, part = _keys_parts(
            batch["block_key"].to_pylist(), batch["to"].to_pylist()
        )
        cols = {"part": pa.array(part), "key": pa.array(keys, type=pa.string())}
        for c in mcols:
            cols[c] = batch[c]
        cols["representative"] = pa.array(
            [None] * batch.num_rows, type=pa.string()
        )
        cols["is_cluster"] = pa.array(np.zeros(batch.num_rows, np.int8))
        return pa.table(cols)

    def tag_clusters(batch: pa.Table) -> pa.Table:
        keys, part = _keys_parts(
            batch["block_key"].to_pylist(), batch["member"].to_pylist()
        )
        cols = {"part": pa.array(part), "key": pa.array(keys, type=pa.string())}
        for c in mcols:
            cols[c] = pa.nulls(batch.num_rows, type=mtypes[c])
        cols["representative"] = batch["representative"]
        cols["is_cluster"] = pa.array(np.ones(batch.num_rows, np.int8))
        return pa.table(cols)

    union = matches_ds.map_batches(tag_matches, batch_format="pyarrow").union(
        clusters_ds.map_batches(tag_clusters, batch_format="pyarrow")
    )

    def join_part(g: pa.Table) -> pa.Table:
        is_cl = np.asarray(
            g["is_cluster"].to_numpy(zero_copy_only=False)
        ) == 1
        cl = g.filter(pa.array(is_cl))
        m = g.filter(pa.array(~is_cl))
        ck = np.asarray(cl["key"].to_pylist(), dtype=object)
        crep = np.asarray(cl["representative"].to_pylist(), dtype=object)
        o = np.argsort(ck, kind="stable")
        ck, crep = ck[o], crep[o]
        mk = np.asarray(m["key"].to_pylist(), dtype=object)
        valid = mk != None  # noqa: E711
        lookup = np.where(valid, mk, "")
        n_m = len(mk)
        if len(ck):
            pos = np.searchsorted(ck, lookup)
            posc = np.minimum(pos, len(ck) - 1)
            hit = (pos < len(ck)) & (ck[posc] == lookup) & valid
            groups = np.where(hit, crep[posc], np.asarray(m["to"].to_pylist(), dtype=object))
        else:
            groups = np.asarray(m["to"].to_pylist(), dtype=object)
        groups = np.where(valid, groups, None)
        cols = {c: m[c] for c in mcols}
        cols["group"] = pa.array(groups.tolist(), type=pa.string())
        return pa.table(cols)

    return union.groupby("part").map_groups(join_part, batch_format="pyarrow")
