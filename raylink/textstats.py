"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All are stateless-or-actor ``map_batches`` stages over Arrow batches with
vectorized (pyarrow.compute / numpy) bodies; the heuristics are
deliberately simple and DETERMINISTIC so the DuckDB oracle can reproduce
the SQL-expressible ones exactly (token_count, quality ratios, md5
fingerprint), while lang-id and the rolling fingerprint are rows-only ops.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from raylink.blocking import _hash64
from raylink.joins import typed_to_pandas
from raylink.text import batch_ngrams, clean_strings_arrow

# fine staging modulus for the per-id digest shuffles (the joins
# _FINE_PARTS convention — _digest_merge's sized groupby rebases it onto
# an input-sized effective partition count); module-level so worker
# closures can capture it
_ID_CLAIM_PARTS = 65_536

# tiny deterministic stopword profiles (lang-id heuristic)
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"],
    "es": ["el", "la", "los", "y", "es", "no", "por", "que", "una", "con"],
}
LANG_ORDER = ["en", "de", "fr", "es"]  # deterministic tie order


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count + a BPE-ish subword count (regex pieces:
    word chars runs, digits runs, single punctuation)."""
    texts = batch[text_col]
    ws = pc.count_substring_regex(pc.utf8_trim_whitespace(texts), r"\S+")
    bpe = pc.count_substring_regex(texts, r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pc.cast(ws, pa.int64()),
            "n_subtokens": pc.cast(bpe, pa.int64()),
        }
    )


def quality_score_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Deterministic quality signals: length, alnum ratio, whitespace
    ratio, mean word length — SQL-expressible and reproduced by the
    DuckDB oracle."""
    texts = batch[text_col]
    n_chars = pc.cast(pc.utf8_length(texts), pa.float64())
    n_alnum = pc.cast(
        pc.utf8_length(pc.replace_substring_regex(texts, r"[^A-Za-z0-9]", "")),
        pa.float64(),
    )
    n_space = pc.cast(
        pc.utf8_length(pc.replace_substring_regex(texts, r"[^ ]", "")), pa.float64()
    )
    n_words = pc.cast(
        pc.count_substring_regex(pc.utf8_trim_whitespace(texts), r"\S+"), pa.float64()
    )
    safe_chars = pc.if_else(pc.equal(n_chars, 0), pa.scalar(1.0), n_chars)
    safe_words = pc.if_else(pc.equal(n_words, 0), pa.scalar(1.0), n_words)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": pc.cast(n_chars, pa.int64()),
            "alnum_ratio": pc.divide(n_alnum, safe_chars),
            "space_ratio": pc.divide(n_space, safe_chars),
            "mean_word_len": pc.divide(
                pc.subtract(n_chars, n_space), safe_words
            ),
        }
    )


# one precompiled alternation per language (Arrow re2 patterns are
# module-level constants — the stage itself is stateless, so it runs as
# plain parallel map_batches tasks, not a capped actor pool)
_LANG_PATTERNS = {
    lang: r"\b(" + "|".join(words) + r")\b"
    for lang, words in LANG_STOPWORDS.items()
}


def lang_id_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Stateless language-ID stage: one lowercase pass, one vectorized
    stopword count per language, argmax with the fixed LANG_ORDER
    tie-break. SQL-oracled (queries.py lang_id)."""
    texts = pc.fill_null(batch[text_col], "")  # null text scores as empty
    low = pc.utf8_lower(texts)
    scores = np.zeros((len(texts), len(LANG_ORDER)), dtype=np.int64)
    for li, lang in enumerate(LANG_ORDER):
        scores[:, li] = pc.count_substring_regex(
            low, _LANG_PATTERNS[lang]
        ).to_numpy(zero_copy_only=False)
    best = np.argmax(scores, axis=1)  # first max = LANG_ORDER tie-break
    conf = scores[np.arange(len(texts)), best]
    langs = np.array(LANG_ORDER, dtype=object)[best]
    langs[conf == 0] = "unknown"
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "lang_pred": pa.array(langs, type=pa.string()),
            "stopword_hits": pa.array(conf.astype(np.int64)),
        }
    )


# PII redaction patterns (RE2 syntax — identical engine in Arrow and
# DuckDB, so the SQL oracle replays redaction byte-exactly). Applied in
# ORDER: emails first (their local parts contain digits/dots a later
# pattern could nibble), then IPv4 (dotted digits), then phones (digit
# runs with separators — the class excludes '.', so IPs are gone first).
PII_PATTERNS = (
    ("<EMAIL>", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("<IP>", r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"),
    ("<PHONE>", r"\+?[0-9][0-9\-() ]{6,}[0-9]"),
)


def redact_pii_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized PII scrub: sequentially count-then-replace each
    :data:`PII_PATTERNS` entry (counts are taken on the text as it stands
    at that step, so the count/replace sequence is one deterministic
    pipeline the SQL oracle mirrors with a CTE chain). Emits the redacted
    text plus per-kind match counts — the counts are what a data-governance
    pass audits, the text is what ships to training."""
    texts = batch[text_col]
    cols: dict[str, object] = {"doc_id": batch["doc_id"]}
    counts = {}
    for token, pat in PII_PATTERNS:
        name = token.strip("<>").lower()
        counts[f"n_{name}s"] = pc.cast(
            pc.count_substring_regex(texts, pat), pa.int64()
        )
        texts = pc.replace_substring_regex(texts, pat, token)
    cols["redacted"] = texts
    cols.update(counts)
    return pa.table(cols)


def repetition_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style repetition signals per document: word count, exact
    distinct-word count, and the duplicate-word fraction
    ``(n_words - n_distinct) / max(n_words, 1)``. Exactness matters (a SQL
    oracle replays it via count(DISTINCT)), so words are factorized —
    never hashed — and per-doc distinct counts come from one np.unique
    over composite (doc, word_code) int64 keys; no per-row Python."""
    doc_idx, words = _tokenize_flat(batch[text_col])
    n_words = np.zeros(batch.num_rows, dtype=np.int64)
    n_distinct = np.zeros(batch.num_rows, dtype=np.int64)
    np.add.at(n_words, doc_idx, 1)
    if doc_idx.size:
        codes = pd.factorize(words.to_numpy(zero_copy_only=False))[0]
        composite = doc_idx.astype(np.int64) * np.int64(codes.max() + 1) + codes
        uniq_docs = doc_idx[np.unique(composite, return_index=True)[1]]
        np.add.at(n_distinct, uniq_docs, 1)
    safe = np.maximum(n_words, 1).astype(np.float64)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_words": pa.array(n_words),
            "n_distinct_words": pa.array(n_distinct),
            "dup_word_frac": pa.array((n_words - n_distinct) / safe),
        }
    )


class LangIdActor:
    """Back-compat callable wrapper around :func:`lang_id_batch` (the
    stage needs no per-actor state; prefer the function)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        return lang_id_batch(batch)


def _tokenize_flat(texts) -> tuple[np.ndarray, pa.Array]:
    """Whitespace-tokenize a string column; returns (doc_idx, words) with
    empty tokens (blank/whitespace-only rows) dropped."""
    toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(texts), r"\s+")
    flat = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    offs = flat.offsets.to_numpy()
    words = flat.values
    nonempty = pc.not_equal(words, "").to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(len(texts)), np.diff(offs))[nonempty]
    return doc_idx, words.filter(pa.array(nonempty))


def vocabulary(
    ds,
    text_col: str = "text",
    min_count: int = 1,
    n_parts: int | None = None,
    output: str = "dataset",
    driver_merge_max_rows: int = 2_000_000,
):
    """Corpus vocabulary extraction (tokenizer-training primitive): exact
    per-token occurrence count and document frequency, filtered to
    ``n_occurrences >= min_count``.

    Scale shape: per-block partials factorize each block's words ONCE
    (exact string codes, never hashes) and emit one (token, n_occ,
    n_docs) digest row per distinct token per block — the shuffle carries
    vocabulary digests, not tokens. The merge re-sums via factorize +
    np.add.at and applies the min_count filter; dispatch is the shared
    bounded-driver-merge / keyed-groupby switch (aggs._digest_merge), with
    partitions assigned by the joins string partition hash (collisions
    cost balance, never correctness — merge compares exact values)."""
    from raylink.aggs import _default_parts, _digest_merge
    from raylink.joins import _string_part_hash

    P = _default_parts(n_parts)
    mc = int(min_count)

    def partial(batch: pa.Table) -> pa.Table:
        doc_idx, words = _tokenize_flat(batch[text_col])
        if not len(words):
            return pa.table(
                {
                    "token": pa.array([], pa.string()),
                    "n_occ": pa.array([], pa.int64()),
                    "n_doc": pa.array([], pa.int64()),
                    "part": pa.array([], pa.int64()),
                }
            )
        codes, uniques = pd.factorize(words.to_numpy(zero_copy_only=False))
        n_occ = np.bincount(codes, minlength=len(uniques))
        # document frequency: dedup (doc, code) pairs, then count codes
        composite = doc_idx.astype(np.int64) * np.int64(len(uniques)) + codes
        uniq_codes = np.unique(composite) % np.int64(len(uniques))
        n_doc = np.bincount(uniq_codes, minlength=len(uniques))
        tok = pa.array(uniques, type=pa.string())
        return pa.table(
            {
                "token": tok,
                "n_occ": pa.array(n_occ.astype(np.int64)),
                "n_doc": pa.array(n_doc.astype(np.int64)),
                "part": pa.array(
                    (_string_part_hash(tok) % np.uint64(P)).astype(np.int64)
                ),
            }
        )

    def merge(g: pa.Table) -> pa.Table:
        tok = g["token"].combine_chunks()
        if not len(tok):
            return pa.table(
                {
                    "token": pa.array([], pa.string()),
                    "n_occurrences": pa.array([], pa.int64()),
                    "n_docs": pa.array([], pa.int64()),
                }
            )
        codes, uniques = pd.factorize(tok.to_numpy(zero_copy_only=False))
        occ = np.zeros(len(uniques), dtype=np.int64)
        doc = np.zeros(len(uniques), dtype=np.int64)
        np.add.at(occ, codes, g["n_occ"].to_numpy(zero_copy_only=False))
        np.add.at(doc, codes, g["n_doc"].to_numpy(zero_copy_only=False))
        keep = occ >= mc
        return pa.table(
            {
                "token": pa.array(np.asarray(uniques)[keep], pa.string()),
                "n_occurrences": pa.array(occ[keep]),
                "n_docs": pa.array(doc[keep]),
            }
        )

    res = _digest_merge(
        ds.map_batches(partial, batch_format="pyarrow"),
        merge,
        driver_merge_max_rows,
        n_parts=n_parts,
    )
    if output == "pandas":
        return typed_to_pandas(res).sort_values("token").reset_index(drop=True)
    return res


def quality_filter_batch(
    batch: pa.Table,
    text_col: str = "text",
    min_words: int = 5,
    min_alnum_ratio: float = 0.5,
    max_dup_word_frac: float = 0.6,
) -> pa.Table:
    """C4-style heuristic quality filter: keep docs with at least
    ``min_words`` words, alnum ratio >= ``min_alnum_ratio`` and
    duplicate-word fraction <= ``max_dup_word_frac``. A pure streaming
    filter (composes the quality + repetition kernels, one pass, no
    shuffle); emits the surviving rows with their signals attached."""
    q = quality_score_batch(batch, text_col)
    r = repetition_stats_batch(batch, text_col)
    n_words = r["n_words"].to_numpy(zero_copy_only=False)
    alnum = q["alnum_ratio"].to_numpy(zero_copy_only=False)
    dupf = r["dup_word_frac"].to_numpy(zero_copy_only=False)
    keep = pa.array(
        (n_words >= min_words)
        & (alnum >= min_alnum_ratio)
        & (dupf <= max_dup_word_frac)
    )
    out = pa.table(
        {
            "doc_id": batch["doc_id"],
            text_col: batch[text_col],
            "n_words": r["n_words"],
            "alnum_ratio": q["alnum_ratio"],
            "dup_word_frac": r["dup_word_frac"],
        }
    )
    return out.filter(keep)


def chunk_documents_batch(
    batch: pa.Table,
    text_col: str = "text",
    size: int = 512,
    stride: int = 384,
    id_col: str = "doc_id",
) -> pa.Table:
    """Fixed-size overlapping character chunking (the RAG / pretraining
    sharding primitive): doc of length L emits ``1 + ceil(max(L-size,0) /
    stride)`` chunks covering ``[j*stride, j*stride + size)`` (last chunk
    may be shorter; empty docs emit one empty chunk). Output: (id_col,
    chunk_idx, chunk_text, chunk_chars), a flat_map-shaped expansion.

    Vectorization shape: one pass per CHUNK ORDINAL (bounded by
    max-doc-length / stride, not by rows) — each pass is a scalar-offset
    Arrow slice over the docs that still have a j-th chunk; no per-row
    Python. A flat_map over rows would pay a Python call per doc."""
    texts = batch[text_col].combine_chunks() if isinstance(
        batch[text_col], pa.ChunkedArray
    ) else batch[text_col]
    # nulls chunk as empty docs — a null length would wrap through
    # astype(int64) into a ~1e17 chunk count
    texts = pc.fill_null(texts, "")
    L = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)
    n_chunks = 1 + np.maximum(L - size + stride - 1, 0) // stride
    max_chunks = int(n_chunks.max()) if len(n_chunks) else 0
    ids = batch[id_col].combine_chunks() if isinstance(
        batch[id_col], pa.ChunkedArray
    ) else batch[id_col]
    parts = []
    for j in range(max_chunks):
        sel = np.flatnonzero(n_chunks > j)
        take = pa.array(sel, type=pa.int64())
        chunk = pc.utf8_slice_codeunits(
            texts.take(take), start=j * stride, stop=j * stride + size
        )
        parts.append(
            pa.table(
                {
                    id_col: ids.take(take),
                    "chunk_idx": pa.array(
                        np.full(len(sel), j, dtype=np.int64)
                    ),
                    "chunk_text": chunk,
                    "chunk_chars": pc.cast(
                        pc.utf8_length(chunk), pa.int64()
                    ),
                }
            )
        )
    if not parts:
        return pa.table(
            {
                id_col: pa.array([], ids.type),
                "chunk_idx": pa.array([], pa.int64()),
                "chunk_text": pa.array([], pa.string()),
                "chunk_chars": pa.array([], pa.int64()),
            }
        )
    return pa.concat_tables(parts)


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """md5 full-content fingerprint (SQL: md5(text)) + a rolling shingle
    fingerprint (min of rolling 16-char window hashes over the cleaned
    text — stable under small appends; rows-only op)."""
    texts = pc.fill_null(batch[text_col], "")  # null hashes as empty text
    md5 = [hashlib.md5(t.encode()).hexdigest() for t in texts.to_pylist()]
    cleaned = clean_strings_arrow(texts)
    d, grams = batch_ngrams(cleaned, (16, 16), remove_space_ngrams=False, pad_width=16)
    roll = np.zeros(batch.num_rows, dtype=np.int64)
    if len(grams):
        raw = np.frombuffer(grams.tobytes(), dtype=np.uint8).reshape(len(grams), -1)
        h = np.zeros(len(grams), dtype=np.uint64)
        for col in range(raw.shape[1]):
            h = h * np.uint64(1099511628211) + raw[:, col].astype(np.uint64)
        h = _hash64(h.astype(np.int64)).astype(np.uint64)
        chg = np.empty(len(d), bool)
        chg[0] = True
        chg[1:] = d[1:] != d[:-1]
        starts = np.flatnonzero(chg)
        mins = np.minimum.reduceat(h, starts)
        roll[d[starts]] = mins.astype(np.int64)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "md5": pa.array(md5, type=pa.string()),
            "rolling_min_hash": pa.array(roll),
        }
    )


def _split_paragraphs(texts, sep: str):
    """Split a string column on the LITERAL separator; returns
    (doc_idx int64, paragraphs StringArray) with EMPTY paragraphs kept
    (consecutive separators), mirroring SQL ``string_split`` exactly.
    Null text splits as empty text (one empty paragraph)."""
    parts = pc.split_pattern(pc.fill_null(texts, ""), sep)
    flat = parts.combine_chunks() if isinstance(parts, pa.ChunkedArray) else parts
    offs = flat.offsets.to_numpy()
    doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), np.diff(offs))
    return doc_idx, flat.values


def paragraph_counts(
    ds,
    text_col: str = "text",
    sep: str = "\n",
    n_parts: int | None = None,
    output: str = "dataset",
    driver_merge_max_rows: int = 2_000_000,
):
    """Corpus-wide paragraph frequency (CCNet-style boilerplate census;
    Wenzek et al. 2020 dedup paragraphs by hash across shards — here the
    count is exact by string). Output: (paragraph, n_occurrences, n_docs)
    where n_docs counts DISTINCT docs containing the paragraph.

    Scale shape mirrors ``vocabulary``: per-block partials factorize each
    block's paragraphs once and emit one digest row per distinct
    paragraph per block (the shuffle carries digests, never the exploded
    corpus); per-doc distinct counting inside the partial is GLOBAL
    because each doc lives in exactly one block row. Merge dispatch is
    the shared bounded-driver-merge / keyed-groupby switch."""
    from raylink.aggs import _default_parts, _digest_merge, _widen_or_raise
    from raylink.joins import _string_part_hash
    from raylink.pipeline import ARROW_STR_WIDEN_BOUND

    P = _default_parts(n_parts)

    def partial(batch: pa.Table) -> pa.Table:
        doc_idx, paras = _split_paragraphs(batch[text_col], sep)
        if not len(paras):
            return pa.table(
                {
                    "paragraph": pa.array([], pa.string()),
                    "n_occ": pa.array([], pa.int64()),
                    "n_doc": pa.array([], pa.int64()),
                    "part": pa.array([], pa.int64()),
                }
            )
        codes, uniques = pd.factorize(paras.to_numpy(zero_copy_only=False))
        n_occ = np.bincount(codes, minlength=len(uniques))
        composite = doc_idx * np.int64(len(uniques)) + codes
        uniq_codes = np.unique(composite) % np.int64(len(uniques))
        n_doc = np.bincount(uniq_codes, minlength=len(uniques))
        para = pa.array(uniques, type=pa.string())
        return pa.table(
            {
                "paragraph": para,
                "n_occ": pa.array(n_occ.astype(np.int64)),
                "n_doc": pa.array(n_doc.astype(np.int64)),
                "part": pa.array(
                    (_string_part_hash(para) % np.uint64(P)).astype(np.int64)
                ),
            }
        )

    # paragraph strings are unbounded-length: the large_string decision
    # is made ONCE here on the driver — the materialized partials'
    # metadata byte total dominates any merge partition's paragraph-
    # column nbytes (the merge input IS this dataset) — so the output
    # width cannot diverge per partition (round-5 review finding; the
    # consumers, remove_boilerplate's broadcast concat and anti
    # semi-join, refuse mixed string/large_string blocks)
    parts_ds = ds.map_batches(partial, batch_format="pyarrow").materialize()
    force_wide = parts_ds.size_bytes() > ARROW_STR_WIDEN_BOUND
    widen_bound = ARROW_STR_WIDEN_BOUND  # captured values: no runtime
    _wor = _widen_or_raise  # raylink imports in worker bodies

    def merge(g: pa.Table) -> pa.Table:
        g = _wor(g, "paragraph", force_wide, widen_bound)
        para = g["paragraph"].combine_chunks()
        if not len(para):
            return pa.table(
                {
                    "paragraph": pa.array(
                        [],
                        pa.large_string() if force_wide else pa.string(),
                    ),
                    "n_occurrences": pa.array([], pa.int64()),
                    "n_docs": pa.array([], pa.int64()),
                }
            )
        codes, uniques = pd.factorize(para.to_numpy(zero_copy_only=False))
        occ = np.zeros(len(uniques), dtype=np.int64)
        doc = np.zeros(len(uniques), dtype=np.int64)
        np.add.at(occ, codes, g["n_occ"].to_numpy(zero_copy_only=False))
        np.add.at(doc, codes, g["n_doc"].to_numpy(zero_copy_only=False))
        otype = (
            pa.large_string()
            if pa.types.is_large_string(para.type)
            else pa.string()
        )
        return pa.table(
            {
                "paragraph": pa.array(np.asarray(uniques), otype),
                "n_occurrences": pa.array(occ),
                "n_docs": pa.array(doc),
            }
        )

    res = _digest_merge(
        parts_ds,
        merge,
        driver_merge_max_rows,
        n_parts=n_parts,
    )
    if output == "pandas":
        return typed_to_pandas(res).sort_values("paragraph").reset_index(drop=True)
    return res


def remove_boilerplate(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    max_docs: int = 2,
    mode: str = "auto",
    max_broadcast_paras: int = 20_000_000,
    max_broadcast_bytes: int = 1 << 30,
    n_parts: int | None = None,
    output: str = "dataset",
    driver_merge_max_rows: int = 2_000_000,
):
    """CCNet-style boilerplate removal: drop every paragraph that appears
    in MORE THAN ``max_docs`` distinct documents, reassemble each doc's
    surviving paragraphs in order with ``sep``, and DROP docs whose
    paragraphs were all boilerplate (matching the SQL GROUP-BY replay).
    Output: (id_col, text_col) as an un-collected Dataset by default.

    Two passes. Pass 1 is ``paragraph_counts`` (digest shuffle only —
    a hash-prefilter variant was built and MEASURED SLOWER in every
    corpus shape, incl. 50 M mostly-unique paragraphs: short paragraphs
    make the string sort cheap while the prefilter adds two full
    split+hash scans; see BASELINE.md round 5 — unlike the span/collapse
    censuses where the strings are long and prefix-shared); the frequent
    set is then bounded by construction — paragraphs in > max_docs docs
    number at most total_paragraphs / max_docs — so
    "broadcast" (``ray.put`` the frequent set once, per-batch Arrow
    ``is_in`` + LargeListArray reassembly, corpus STREAMS) is the default
    below ``max_broadcast_paras`` rows AND ``max_broadcast_bytes``
    (paragraphs are unbounded-length strings — the byte bound keeps the
    driver collect safe, self_top1's byte-aware-switch precedent).
    "distributed" explodes (paragraph, id, ord) rows through one anti
    semi-join co-shuffle against the frequent set and reassembles with an
    ordered per-doc merge; both modes are value-identical (tested).

    ``id_col`` must be unique corpus-wide (the engine's standing id
    contract): duplicate ids within a batch are rejected loudly in BOTH
    modes, and the distributed reassembly additionally rejects clashing
    per-doc ordinals (the cross-batch symptom). A cross-batch duplicate
    whose surviving ordinal sets happen to be disjoint is undefined
    behavior (broadcast emits one row per input row; distributed merges
    per id)."""
    import ray.data as rd

    from raylink.broadcast import cached_object as _co
    from raylink.joins import semi_join

    md = int(max_docs)
    counts = paragraph_counts(
        ds,
        text_col=text_col,
        sep=sep,
        n_parts=n_parts,
        driver_merge_max_rows=driver_merge_max_rows,
    )

    def only_frequent(batch: pa.Table) -> pa.Table:
        m = pc.greater(batch["n_docs"], md)
        return pa.table({"paragraph": batch["paragraph"].filter(m)})

    frequent = counts.map_batches(
        only_frequent, batch_format="pyarrow"
    ).materialize()
    if mode == "auto":
        mode = (
            "broadcast"
            if (
                frequent.count() <= max_broadcast_paras
                and (frequent.size_bytes() or 0) <= max_broadcast_bytes
            )
            else "distributed"
        )

    def _check_ids(batch: pa.Table):
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if len(ids) != len(pd.unique(ids)):
            raise ValueError(
                f"duplicate {id_col} values within a batch — id_col must "
                "be unique (broadcast emits per input row while the "
                "distributed reassembly merges per id; the modes would "
                "silently disagree)"
            )

    if mode == "broadcast":
        tabs = ray.get(frequent.to_arrow_refs())
        allf = pa.concat_tables(tabs, promote_options="default")
        freq_ref = ray.put(allf["paragraph"].combine_chunks())

        def drop_paras(batch: pa.Table) -> pa.Table:
            _check_ids(batch)
            doc_idx, paras = _split_paragraphs(batch[text_col], sep)
            bad = pc.is_in(paras, value_set=_co(freq_ref))
            keep = pc.invert(bad).to_numpy(zero_copy_only=False)
            kept_vals = paras.filter(pa.array(keep))
            n = batch.num_rows
            kept_counts = np.bincount(doc_idx[keep], minlength=n)
            new_offs = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(kept_counts, out=new_offs[1:])
            la = pa.LargeListArray.from_arrays(
                pa.array(new_offs), kept_vals
            )
            joined = pc.binary_join(la, sep)
            docs_alive = pa.array(kept_counts > 0)
            return pa.table(
                {
                    id_col: batch[id_col].filter(docs_alive),
                    text_col: joined.filter(docs_alive),
                }
            )

        res = ds.map_batches(drop_paras, batch_format="pyarrow")
    else:
        def explode(batch: pa.Table) -> pa.Table:
            _check_ids(batch)
            doc_idx, paras = _split_paragraphs(batch[text_col], sep)
            ids = batch[id_col].combine_chunks().take(pa.array(doc_idx))
            # per-doc paragraph ordinal: positions restart at each doc
            # (doc rows are block-contiguous, so the split offsets give
            # run starts directly)
            starts = np.flatnonzero(
                np.r_[True, doc_idx[1:] != doc_idx[:-1]]
            ) if len(doc_idx) else np.array([], dtype=np.int64)
            ords = np.arange(len(doc_idx), dtype=np.int64)
            if len(starts):
                ords -= np.repeat(ords[starts], np.diff(np.r_[starts, len(doc_idx)]))
            return pa.table(
                {"paragraph": paras, id_col: ids, "ord": pa.array(ords)}
            )

        kept = semi_join(
            ds.map_batches(explode, batch_format="pyarrow"),
            frequent,
            left_key_col="paragraph",
            right_key_col="paragraph",
            left_cols=(id_col, "ord"),
            anti=True,
            mode="distributed",
            n_parts=n_parts,
        )

        def reassemble(g: pa.Table) -> pa.Table:
            ords = g["ord"].to_numpy(zero_copy_only=False)
            if len(ords) != len(np.unique(ords)):
                raise ValueError(
                    f"clashing paragraph ordinals for one {id_col} value "
                    "— duplicate ids split across batches (id_col must be "
                    "unique corpus-wide)"
                )
            order = pc.sort_indices(g["ord"])
            paras = g["paragraph"].combine_chunks().take(order)
            offs = pa.array(np.array([0, len(paras)], dtype=np.int64))
            la = pa.LargeListArray.from_arrays(offs, paras)
            return pa.table(
                {
                    id_col: g[id_col].slice(0, 1),
                    text_col: pc.binary_join(la, sep),
                }
            )

        res = kept.groupby(id_col).map_groups(
            reassemble, batch_format="pyarrow"
        )

    if output == "pandas":
        return typed_to_pandas(res).sort_values(id_col).reset_index(drop=True)
    return res


def remove_repeated_lines(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    min_chars: int = 0,
    output: str = "dataset",
):
    """Gopher-style INTRA-document repetition cleanup (Rae et al. 2021's
    repetition filters, made a transform instead of a doc drop): within
    each doc, drop every ``sep``-delimited line that exactly repeats an
    EARLIER line of the same doc — keep-first, order preserved. Lines
    shorter than ``min_chars`` always survive (a partition of equal
    lines is entirely short or entirely not, so the rule is consistent
    with the SQL replay's per-content CASE). Docs never drop: the first
    occurrence always survives, so every row keeps >= 1 line. Null text
    splits as empty text (one empty line), mirroring string_split.

    Complementary to remove_boilerplate (cross-doc paragraph census —
    needs a shuffle) and remove_duplicate_spans (cross-doc windows):
    this is purely per-row, so it is ONE streaming map_batches pass —
    no shuffle, no census, duplicate ids are harmless (each row is
    cleaned independently). Output: (id_col, text_col)."""
    if output not in ("dataset", "pandas"):
        raise ValueError(
            f'remove_repeated_lines: output must be "dataset" or '
            f'"pandas", got {output!r}'
        )
    m = int(min_chars)

    def drop_repeats(batch: pa.Table) -> pa.Table:
        if text_col not in batch.column_names:  # schema-dropped block
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    text_col: pa.array([], pa.string()),
                }
            )
        doc_idx, lines = _split_paragraphs(batch[text_col], sep)
        n = batch.num_rows
        lc = np.asarray(
            pc.utf8_length(lines).to_numpy(zero_copy_only=False), np.int64
        )
        keep = np.ones(len(lines), dtype=bool)
        cand = np.flatnonzero(lc >= m)
        if len(cand):
            enc = lines.take(pa.array(cand)).dictionary_encode()
            codes = np.asarray(
                enc.indices.to_numpy(zero_copy_only=False), np.int64
            )
            d = doc_idx[cand]
            # (doc, content, position): the first of each run is the
            # earliest occurrence — everything after it drops
            order = np.lexsort((cand, codes, d))
            ds_, cs_ = d[order], codes[order]
            dup = np.zeros(len(order), dtype=bool)
            dup[1:] = (ds_[1:] == ds_[:-1]) & (cs_[1:] == cs_[:-1])
            keep[cand[order[dup]]] = False
        kept_vals = lines.filter(pa.array(keep))
        kept_counts = np.bincount(doc_idx[keep], minlength=n)
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(kept_counts, out=offs[1:])
        la = pa.LargeListArray.from_arrays(pa.array(offs), kept_vals)
        return pa.table(
            {id_col: batch[id_col], text_col: pc.binary_join(la, sep)}
        )

    res = ds.map_batches(drop_repeats, batch_format="pyarrow")
    if output == "pandas":
        return (
            typed_to_pandas(res)
            .sort_values(id_col)
            .reset_index(drop=True)
        )
    return res


def _pair_counts_of_types(uniq: pa.Array, cnt: np.ndarray):
    """Adjacent-char pair counts over a WORD-TYPE table, weighted by type
    occurrence counts. Vectorized across words per char POSITION (the
    loop is over max word length, not words): position i contributes
    (word[i], word[i+1]) for every type longer than i+1."""
    lens = pc.utf8_length(uniq).to_numpy(zero_copy_only=False)
    out_a, out_b, out_n = [], [], []
    for i in range(int(lens.max()) - 1 if len(lens) else 0):
        valid = lens > i + 1
        if not valid.any():
            break
        va = pa.array(valid)
        sel = uniq.filter(va)
        out_a.append(pc.utf8_slice_codeunits(sel, i, i + 1))
        out_b.append(pc.utf8_slice_codeunits(sel, i + 1, i + 2))
        out_n.append(cnt[valid])
    if not out_a:
        e = pa.array([], pa.string())
        return e, e, np.empty(0, dtype=np.int64)
    a = pa.concat_arrays([x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x for x in out_a])
    b = pa.concat_arrays([x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x for x in out_b])
    return a, b, np.concatenate(out_n).astype(np.int64)


def _reduce_pairs(a: pa.Array, b: pa.Array, weights: np.ndarray):
    """Sum weights per distinct (a, b) pair. dictionary_encode keeps the
    composite key as exact BYTES (a numpy-unicode factorize would truncate
    at the embedded NUL separator and silently merge distinct pairs).
    Returns (sel_indices, totals, key_dictionary) with rows ordered by
    first appearance — sel_indices picks one representative row per pair."""
    key = pc.binary_join_element_wise(a, b, "\x00")
    enc = key.dictionary_encode()
    kcodes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    tot = np.zeros(len(enc.dictionary), dtype=np.int64)
    np.add.at(tot, kcodes, weights)
    # np.unique over codes 0..K-1: first-occurrence row per code, ordered
    # by code — aligned with tot's indexing
    first = np.unique(kcodes, return_index=True)[1]
    return first, tot, enc.dictionary


def bpe_pair_counts(
    ds,
    text_col: str = "text",
    min_count: int = 1,
    n_parts: int | None = None,
    output: str = "dataset",
    driver_merge_max_rows: int = 2_000_000,
):
    """Adjacent character-pair census over the corpus — the FIRST
    iteration of BPE tokenizer training (Sennrich et al. 2016 train on
    the word-type table; the pair count weights each type by its
    occurrence count). Output: (left, right, n_occurrences) for every
    adjacent char pair inside whitespace words, filtered to
    ``n_occurrences >= min_count``.

    Scale shape: per-block partials factorize words to TYPES first (the
    position loop runs over the block's type table, not its rows), emit
    one digest row per distinct pair per block, and merge through the
    shared bounded-driver / keyed-groupby dispatch — pair cardinality is
    at most |charset|^2, so the shuffle is tiny by construction."""
    from raylink.aggs import _default_parts, _digest_merge
    from raylink.joins import _string_part_hash

    P = _default_parts(n_parts)
    mc = int(min_count)

    def partial(batch: pa.Table) -> pa.Table:
        _, words = _tokenize_flat(batch[text_col])
        empty = pa.table(
            {
                "left": pa.array([], pa.string()),
                "right": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "part": pa.array([], pa.int64()),
            }
        )
        if not len(words):
            return empty
        codes, uniques = pd.factorize(words.to_numpy(zero_copy_only=False))
        cnt = np.bincount(codes, minlength=len(uniques)).astype(np.int64)
        a, b, n = _pair_counts_of_types(
            pa.array(uniques, type=pa.string()), cnt
        )
        if not len(n):
            return empty
        first, tot, karr = _reduce_pairs(a, b, n)
        la = a.take(pa.array(first))
        rb = b.take(pa.array(first))
        return pa.table(
            {
                "left": la,
                "right": rb,
                "n": pa.array(tot),
                "part": pa.array(
                    (_string_part_hash(karr) % np.uint64(P)).astype(np.int64)
                ),
            }
        )

    def merge(g: pa.Table) -> pa.Table:
        if not g.num_rows:
            return pa.table(
                {
                    "left": pa.array([], pa.string()),
                    "right": pa.array([], pa.string()),
                    "n_occurrences": pa.array([], pa.int64()),
                }
            )
        first, tot, _ = _reduce_pairs(
            g["left"].combine_chunks(),
            g["right"].combine_chunks(),
            g["n"].to_numpy(zero_copy_only=False),
        )
        keep = tot >= mc
        sa = pa.array(first[keep].astype(np.int64))
        return pa.table(
            {
                "left": g["left"].combine_chunks().take(sa),
                "right": g["right"].combine_chunks().take(sa),
                "n_occurrences": pa.array(tot[keep]),
            }
        )

    res = _digest_merge(
        ds.map_batches(partial, batch_format="pyarrow"),
        merge,
        driver_merge_max_rows,
        n_parts=n_parts,
    )
    if output == "pandas":
        return (
            typed_to_pandas(res)
            .sort_values(["left", "right"])
            .reset_index(drop=True)
        )
    return res


def bpe_learn(
    ds,
    text_col: str = "text",
    n_merges: int = 100,
    min_count: int = 2,
    vocab_driver_max_rows: int = 5_000_000,
):
    """BPE merge-rule training: the distributed stage is the word-TYPE
    census (:func:`vocabulary` — the shuffle carries type digests), the
    merge loop then runs DRIVER-SIDE on the bounded type table, exactly
    how reference BPE trains (the type table, not the corpus, is the
    working set; Sennrich et al. 2016). Deterministic tie-break: highest
    count, then lexicographic (left, right). Returns a pandas frame
    (rank, left, right, n_occurrences)."""
    vocab = vocabulary(
        ds, text_col=text_col, min_count=1, output="pandas",
        driver_merge_max_rows=vocab_driver_max_rows,
    )
    words = [tuple(w) for w in vocab["token"].tolist()]
    counts = [int(c) for c in vocab["n_occurrences"].to_numpy()]
    return _bpe_merge_loop(words, counts, int(n_merges), int(min_count))


def _bpe_merge_loop(
    words: list, counts: list, n_merges: int, min_count: int
) -> pd.DataFrame:
    """The driver-side greedy merge loop over a word-TYPE census, shared
    by :func:`bpe_learn` (Ray census) and the oracle fixture generator
    (plain-pyarrow census) so both train BIT-IDENTICAL merge tables."""
    # incremental pair statistics (the reference-BPE optimization): a
    # merge only touches the types CONTAINING the merged pair, so each
    # rank costs O(affected symbols), not O(total symbols)
    pair_n: dict = {}
    pair_words: dict = {}
    for wi, (sym, c) in enumerate(zip(words, counts)):
        for i in range(len(sym) - 1):
            p = (sym[i], sym[i + 1])
            pair_n[p] = pair_n.get(p, 0) + c
            pair_words.setdefault(p, set()).add(wi)
    merges = []
    for rank in range(int(n_merges)):
        if not pair_n:
            break
        # deterministic: max count, ties -> lexicographically SMALLEST pair
        bn = max(pair_n.values())
        if bn < int(min_count):
            break
        bp = min(p for p, v in pair_n.items() if v == bn)
        merges.append((rank, bp[0], bp[1], bn))
        joined = bp[0] + bp[1]
        for wi in list(pair_words.get(bp, ())):
            sym, c = words[wi], counts[wi]
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pair_n[p] -= c
                if pair_n[p] == 0:
                    del pair_n[p]
                s = pair_words.get(p)
                if s is not None:
                    s.discard(wi)
            out, i = [], 0
            while i < len(sym):
                if (
                    i + 1 < len(sym)
                    and sym[i] == bp[0]
                    and sym[i + 1] == bp[1]
                ):
                    out.append(joined)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new = tuple(out)
            words[wi] = new
            for i in range(len(new) - 1):
                p = (new[i], new[i + 1])
                pair_n[p] = pair_n.get(p, 0) + c
                pair_words.setdefault(p, set()).add(wi)
    return pd.DataFrame(
        merges, columns=["rank", "left", "right", "n_occurrences"]
    )


def _bpe_apply_word(word: str, cand_ranks, pairs) -> tuple:
    """Encode ONE word by applying the candidate merges in RANK order
    (sequential rank passes — the exact application order of the trainer
    itself, where each learned merge immediately re-encodes the types,
    and the order a SQL replace-per-rank replay reproduces). Each pass is
    the classic left-to-right non-overlapping scan."""
    sym = list(word)
    for r in cand_ranks:
        if len(sym) < 2:
            break
        a, b = pairs[r]
        i, n, out = 0, len(sym), []
        while i < n:
            if i + 1 < n and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return tuple(sym)


class BPEEncoder:
    """Actor-pool corpus tokenizer — the APPLY side of :func:`bpe_learn`
    (VERDICT r4 #1). Setup once per actor (``__init__``: fetch the
    broadcast merge table, build the substring prefilter patterns); work
    per batch (``__call__``). Encoding is per word TYPE, never per token:
    each batch factorizes its words to types, only UNSEEN types encode
    (a per-actor memo persists across batches — Zipfian corpora re-use
    almost every type), and a vectorized Arrow ``match_substring``
    prefilter reduces each type's merge loop to the ranks whose joined
    pair is a substring of the word (symbol concatenation is invariant
    under merging, so that test is sound for every pass)."""

    def __init__(self, merges_ref, id_col: str, text_col: str,
                 emit_tokens: bool = False, keep_cols: tuple = ()):
        pairs = ray.get(merges_ref)
        self.pairs = pairs  # list[(left, right)] in rank order
        self.pats = pa.array([a + b for a, b in pairs], pa.string())
        self.id_col = id_col
        self.text_col = text_col
        self.emit_tokens = bool(emit_tokens)
        self.keep_cols = tuple(keep_cols)
        self.memo: dict = {}
        # live prefilter-matrix budget (bytes); instance attr so tests
        # can force multi-chunk paths at small scale
        self._rank_chunk_bytes = 32 << 20

    def _encode_types(self, uniques: np.ndarray):
        unknown = [w for w in uniques if w not in self.memo]
        if not unknown:
            return
        ua = pa.array(unknown, pa.string())
        nu = len(unknown)
        R = len(self.pairs)
        # candidate (word, rank) pairs via rank-CHUNKED match_substring
        # passes: a full R x U boolean matrix is R*U bytes (a 30k-rank
        # vocab x an 80k-type first batch = 2.4 GB per actor — review
        # finding); chunking the rank axis bounds the live matrix at
        # ~32 MB while the surviving pairs stay sparse
        chunk = max(16, self._rank_chunk_bytes // max(1, nu))
        w_parts: list[np.ndarray] = []
        r_parts: list[np.ndarray] = []
        for r0 in range(0, R, chunk):
            sub = self.pats.slice(r0, min(chunk, R - r0))
            masks = np.stack(
                [
                    pc.match_substring(ua, p.as_py()).to_numpy(
                        zero_copy_only=False
                    )
                    for p in sub
                ]
            )
            ridx, widx = np.nonzero(masks)
            if len(ridx):
                w_parts.append(widx.astype(np.int64))
                r_parts.append(ridx.astype(np.int64) + r0)
        if w_parts:
            wi = np.concatenate(w_parts)
            ri = np.concatenate(r_parts)
            order = np.lexsort((ri, wi))  # per word, ranks ascending
            wi, ri = wi[order], ri[order]
            starts = np.flatnonzero(np.r_[True, wi[1:] != wi[:-1]])
            ends = np.append(starts[1:], len(wi))
            have = wi[starts]
        else:
            starts = ends = have = np.empty(0, np.int64)
        pos = {int(j): s for j, s in zip(have, range(len(have)))}
        for j, w in enumerate(unknown):
            s = pos.get(j)
            cand = ri[starts[s]:ends[s]] if s is not None else ()
            self.memo[w] = _bpe_apply_word(w, cand, self.pairs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_idx, words = _tokenize_flat(batch[self.text_col])
        n = batch.num_rows
        n_tokens = np.zeros(n, dtype=np.int64)
        n_words = np.zeros(n, dtype=np.int64)
        out = {
            self.id_col: batch[self.id_col],
        }
        if len(words):
            codes, uniques = pd.factorize(
                words.to_numpy(zero_copy_only=False)
            )
            self._encode_types(uniques)
            type_tok = [self.memo[w] for w in uniques]
            type_len = np.array([len(t) for t in type_tok], np.int64)
            np.add.at(n_tokens, doc_idx, type_len[codes])
            np.add.at(n_words, doc_idx, 1)
        out["n_tokens"] = pa.array(n_tokens)
        out["n_words"] = pa.array(n_words)
        for c in self.keep_cols:
            out[c] = batch[c]
        if self.emit_tokens:
            flat: list[str] = []
            offs = np.zeros(n + 1, dtype=np.int64)
            if len(words):
                # words arrive doc-contiguous (flat split order), so one
                # pass emits each doc's tokens in order
                per_word = [type_tok[c] for c in codes]
                counts = np.zeros(n, dtype=np.int64)
                np.add.at(counts, doc_idx, type_len[codes])
                np.cumsum(counts, out=offs[1:])
                for toks in per_word:
                    flat.extend(toks)
            out["tokens"] = pa.LargeListArray.from_arrays(
                pa.array(offs), pa.array(flat, pa.string())
            )
        return pa.table(out)


def bpe_encode(
    ds,
    merges,
    id_col: str = "doc_id",
    text_col: str = "text",
    emit_tokens: bool = False,
    keep_cols: tuple = (),
    concurrency=None,
    output: str = "dataset",
):
    """Distributed BPE corpus tokenization with a LEARNED merge table —
    closes bpe_learn's learn -> encode -> budget -> pack loop (VERDICT r4
    #1; reference BPE applies merges in rank order, Sennrich et al. 2016).
    One streaming actor-pool ``map_batches`` stage: the merge table
    broadcasts once via ``ray.put``, every batch encodes its word TYPES
    (per-actor memo) and emits one row per input row:
    (id_col, n_tokens, n_words[, *keep_cols pass-through][, tokens
    list<string> when ``emit_tokens``]). Empty/whitespace/null text rows
    emit 0/0.

    ``merges``: pandas frame or Arrow table with (rank, left, right)
    columns, ranks 0..R-1 (bpe_learn's output shape)."""
    bad = set(keep_cols) & {id_col, "n_tokens", "n_words", "tokens"}
    if bad:
        raise ValueError(
            f"keep_cols {sorted(bad)} collide with bpe_encode output columns"
        )
    if isinstance(merges, pa.Table):
        merges = merges.to_pandas()
    m = merges.sort_values("rank")
    ranks = m["rank"].to_numpy()
    if len(ranks) and not (ranks == np.arange(len(ranks))).all():
        raise ValueError("merge ranks must be exactly 0..R-1")
    pairs = list(zip(m["left"].tolist(), m["right"].tolist()))
    merges_ref = ray.put(pairs)
    if concurrency is None:
        concurrency = (1, max(2, int(ray.cluster_resources().get("CPU", 8))))
    res = ds.map_batches(
        BPEEncoder,
        fn_constructor_kwargs=dict(
            merges_ref=merges_ref,
            id_col=id_col,
            text_col=text_col,
            emit_tokens=emit_tokens,
            keep_cols=tuple(keep_cols),
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    if output == "pandas":
        return typed_to_pandas(res).sort_values(id_col).reset_index(drop=True)
    return res


def _assert_unique_ids_cross_batch(exploded, id_col: str,
                                   driver_merge_max_rows: int):
    """Cross-batch duplicate-id detector over exploded (id, ..., dmk)
    rows from :func:`raylink.dedup._doc_distinct_grams`, whose per-batch
    id sets are already unique (checked at explode time): sum the per-doc
    MARKER rows (``dmk`` = 1 on each doc's first emitted gram row) per id
    through the shared digest merge and raise when any id's marker count
    exceeds 1 — two docs claiming the same id each emit their own marker
    (ADVICE r4: duplicate ids split across batches made the broadcast and
    distributed modes silently disagree — broadcast emits one row per
    input row while the per-id digest merge sums them). Markers, not
    batch occurrences: Ray dynamically splits an oversized output block
    at an arbitrary row boundary, so one doc's rows can legitimately land
    in two downstream batches — counting batches-per-id would report that
    unique id as a duplicate, while its single atomic marker row still
    sums to 1."""
    from raylink.aggs import _digest_merge

    def partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(
            batch[id_col].to_numpy(zero_copy_only=False), np.int64
        )
        mk = np.asarray(batch["dmk"].to_numpy(zero_copy_only=False), np.int64)
        u, inv = np.unique(ids, return_inverse=True)
        c = np.zeros(len(u), np.int64)
        np.add.at(c, inv, mk)
        keep = c > 0  # marker-free slices of a split doc carry no claim
        u, c = u[keep], c[keep]
        return pa.table(
            {
                "i": pa.array(u),
                "c": pa.array(c),
                "part": pa.array(
                    (_hash64(u) % np.uint64(_ID_CLAIM_PARTS)).astype(
                        np.int64
                    )
                ),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        i = np.asarray(t["i"].to_numpy(zero_copy_only=False), np.int64)
        if len(i):
            u, inv = np.unique(i, return_inverse=True)
            c = np.zeros(len(u), np.int64)
            np.add.at(c, inv, t["c"].to_numpy(zero_copy_only=False))
            if (c > 1).any():
                bad = u[c > 1][:5].tolist()
                raise ValueError(
                    f"duplicate {id_col} values split across batches "
                    f"(e.g. {bad}) — id_col must be unique corpus-wide"
                )
        return pa.table({"ok": pa.array([True])})

    _digest_merge(
        exploded.select_columns([id_col, "dmk"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        merge,
        driver_merge_max_rows,
    ).count()  # consume: triggers the keyed-mode check


def rarity_score(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    mode: str = "auto",
    max_broadcast_grams: int = 20_000_000,
    max_broadcast_bytes: int = 1 << 30,
    n_parts: int | None = None,
    driver_merge_max_rows: int = 2_000_000,
    output: str = "dataset",
):
    """Corpus-statistics quality signal (the deterministic analog of
    LM-perplexity filtering): for every doc, sum the corpus DOCUMENT
    FREQUENCIES of its distinct word ``ngram``-grams. Output:
    (id_col, n_distinct_grams, df_sum, commonness) where
    ``commonness = df_sum / (n_distinct_grams * n_corpus_docs)`` — near 1
    for boilerplate every doc shares, near 1/n_docs for unique text;
    gramless docs score 0. Division-only floats from exact ints, so the
    DuckDB oracle replays it bit-exactly.

    Two passes, contamination_check's scale shape: pass 1 is the gram DF
    census (per-block (doc,gram)-deduped partials -> string-hash digest
    merge); pass 2 "broadcast" (below ``max_broadcast_grams`` rows AND
    ``max_broadcast_bytes`` of census digest — grams are unbounded-length
    strings, so the collect bound is byte-aware like self_top1's) ships
    the (gram -> df) map once via ``ray.put`` and every corpus batch
    resolves its grams with one Arrow ``index_in`` — the corpus STREAMS.
    "distributed" equi-joins (doc, gram) rows against the census on the
    string key and reduces per-doc sums through the digest merge, with
    gramless zero-fill via a left anti semi-join. ``id_col`` must be
    unique corpus-wide: checked loudly per batch in both modes, and the
    distributed mode additionally detects duplicates SPLIT ACROSS batches
    (a per-id batch-count digest over the already-materialized exploded
    rows — broadcast scores such rows independently, which matches the
    one-row-per-input-row contract there). With an EXPLICIT
    mode="distributed" the corpus is gram-extracted once (the census
    derives from the materialized exploded rows); mode="auto" that lands
    distributed pays a second extraction pass (the census must exist
    before the mode decision)."""
    from raylink.aggs import _default_parts, _digest_merge
    from raylink.broadcast import cached_object as _co
    from raylink.dedup import _doc_distinct_grams, _word_ngrams_flat
    from raylink.joins import _string_part_hash, equi_join, semi_join
    from raylink.pipeline import _widen_text_if_needed

    nn = int(ngram)
    P = _default_parts(n_parts)
    n_docs = ds.count()

    def df_partial(batch: pa.Table) -> pa.Table:
        d, grams = _word_ngrams_flat(batch[text_col], nn)
        if not len(grams):
            return pa.table(
                {
                    "gram": pa.array([], pa.string()),
                    "df": pa.array([], pa.int64()),
                    "part": pa.array([], pa.int64()),
                }
            )
        # per-doc distinct (docs never span blocks => global dedup)
        codes, uniques = pd.factorize(grams.to_numpy(zero_copy_only=False))
        comp = d.astype(np.int64) * np.int64(len(uniques)) + codes
        uniq_codes = np.unique(comp) % np.int64(len(uniques))
        df = np.bincount(uniq_codes, minlength=len(uniques)).astype(np.int64)
        garr = pa.array(uniques, type=pa.string())
        return pa.table(
            {
                "gram": garr,
                "df": pa.array(df),
                "part": pa.array(
                    (_string_part_hash(garr) % np.uint64(P)).astype(np.int64)
                ),
            }
        )

    def df_merge(g: pa.Table) -> pa.Table:
        g = _widen_text_if_needed(g, "gram")
        ga = g["gram"].combine_chunks()
        if not len(ga):
            return pa.table(
                {
                    "gram": pa.array([], pa.string()),
                    "df": pa.array([], pa.int64()),
                }
            )
        codes, uniques = pd.factorize(ga.to_numpy(zero_copy_only=False))
        tot = np.zeros(len(uniques), dtype=np.int64)
        np.add.at(tot, codes, g["df"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "gram": pa.array(np.asarray(uniques), pa.string()),
                "df": pa.array(tot),
            }
        )

    exploded = None
    if mode == "distributed":
        # one extraction pass: the census is a count-per-gram digest
        # over the per-doc-distinct exploded rows
        def dg(batch: pa.Table) -> pa.Table:
            return _doc_distinct_grams(batch, id_col, text_col, nn)

        exploded = ds.map_batches(dg, batch_format="pyarrow").materialize()
        _assert_unique_ids_cross_batch(exploded, id_col, driver_merge_max_rows)

        def df_from_rows(batch: pa.Table) -> pa.Table:
            garr = batch["gram"].combine_chunks()
            if not len(garr):
                return pa.table(
                    {
                        "gram": pa.array([], pa.string()),
                        "df": pa.array([], pa.int64()),
                        "part": pa.array([], pa.int64()),
                    }
                )
            codes, uniques = pd.factorize(garr.to_numpy(zero_copy_only=False))
            df = np.bincount(codes, minlength=len(uniques)).astype(np.int64)
            ua = pa.array(uniques, type=pa.string())
            return pa.table(
                {
                    "gram": ua,
                    "df": pa.array(df),
                    "part": pa.array(
                        (_string_part_hash(ua) % np.uint64(P)).astype(np.int64)
                    ),
                }
            )

        census = _digest_merge(
            exploded.map_batches(df_from_rows, batch_format="pyarrow"),
            df_merge,
            driver_merge_max_rows,
            n_parts=n_parts,
        ).materialize()
    else:
        census = _digest_merge(
            ds.map_batches(df_partial, batch_format="pyarrow"),
            df_merge,
            driver_merge_max_rows,
            n_parts=n_parts,
        ).materialize()

    if mode == "auto":
        mode = (
            "broadcast"
            if (
                census.count() <= max_broadcast_grams
                and (census.size_bytes() or 0) <= max_broadcast_bytes
            )
            else "distributed"
        )
        if mode == "distributed":
            exploded = ds.map_batches(
                lambda b: _doc_distinct_grams(b, id_col, text_col, nn),
                batch_format="pyarrow",
            ).materialize()
            _assert_unique_ids_cross_batch(
                exploded, id_col, driver_merge_max_rows
            )

    def finish(ids, n_grams, df_sum):
        comm = df_sum.astype(np.float64) / np.maximum(
            n_grams * np.int64(n_docs), 1
        )
        return pa.table(
            {
                id_col: pa.array(ids),
                "n_distinct_grams": pa.array(n_grams),
                "df_sum": pa.array(df_sum),
                "commonness": pa.array(comm),
            }
        )

    if mode == "broadcast":
        tabs = ray.get(census.to_arrow_refs())
        allc = _widen_text_if_needed(
            pa.concat_tables(tabs, promote_options="default"), "gram"
        )
        gref = ray.put(
            (
                allc["gram"].combine_chunks(),
                np.asarray(allc["df"].to_numpy(zero_copy_only=False), np.int64),
            )
        )

        def score(batch: pa.Table) -> pa.Table:
            garr, dfv = _co(gref)
            d, grams = _word_ngrams_flat(batch[text_col], nn)
            ids = np.asarray(
                batch[id_col].to_numpy(zero_copy_only=False), np.int64
            )
            if len(ids) != len(np.unique(ids)):
                raise ValueError(
                    f"duplicate {id_col} values within a block — id_col "
                    "must be unique (matches the distributed mode's check)"
                )
            n_grams = np.zeros(len(ids), dtype=np.int64)
            df_sum = np.zeros(len(ids), dtype=np.int64)
            if len(grams):
                codes, uniques = pd.factorize(
                    grams.to_numpy(zero_copy_only=False)
                )
                comp = d.astype(np.int64) * np.int64(len(uniques)) + codes
                keep = np.unique(comp, return_index=True)[1]
                d2 = d[keep]
                pos_arr = pc.index_in(
                    grams.take(pa.array(keep)), value_set=garr
                )
                if pos_arr.null_count:
                    raise ValueError(
                        "gram missing from the DF census — the corpus "
                        "changed between the census and scoring passes "
                        "(rarity_score requires a deterministic input)"
                    )
                pos = pos_arr.to_numpy(zero_copy_only=False)
                vals = dfv[pos.astype(np.int64)]
                np.add.at(n_grams, d2, 1)
                np.add.at(df_sum, d2, vals)
            return finish(ids, n_grams, df_sum)

        res = ds.map_batches(score, batch_format="pyarrow")
        if output == "pandas":
            return typed_to_pandas(res).sort_values(id_col).reset_index(drop=True)
        return res

    # distributed: (doc, gram) distinct rows join the census on the
    # string key, per-doc sums reduce through the digest merge, gramless
    # docs zero-fill via a left anti semi-join (contamination's shape)
    def doc_grams(batch: pa.Table) -> pa.Table:
        return _doc_distinct_grams(batch, id_col, text_col, nn)

    joined = equi_join(
        exploded,
        census,
        "gram",
        "gram",
        left_cols=(id_col,),
        right_cols=("df",),
        mode="distributed",
        n_parts=n_parts,
    )

    def sum_partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False), np.int64)
        dfv = np.asarray(batch["df"].to_numpy(zero_copy_only=False), np.int64)
        u, inv = np.unique(ids, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        s = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, dfv)
        return pa.table(
            {
                "i": pa.array(u),
                "g": pa.array(cnt),
                "s": pa.array(s),
                "part": pa.array(
                    (_hash64(u) % np.uint64(P)).astype(np.int64)
                ),
            }
        )

    def sum_merge(t: pa.Table) -> pa.Table:
        i = np.asarray(t["i"].to_numpy(zero_copy_only=False), np.int64)
        if not len(i):
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "n_distinct_grams": pa.array([], pa.int64()),
                    "df_sum": pa.array([], pa.int64()),
                    "commonness": pa.array([], pa.float64()),
                }
            )
        u, inv = np.unique(i, return_inverse=True)
        gg = np.zeros(len(u), dtype=np.int64)
        ss = np.zeros(len(u), dtype=np.int64)
        np.add.at(gg, inv, t["g"].to_numpy(zero_copy_only=False))
        np.add.at(ss, inv, t["s"].to_numpy(zero_copy_only=False))
        return finish(u, gg, ss)

    scored = _digest_merge(
        joined.map_batches(sum_partial, batch_format="pyarrow"),
        sum_merge,
        driver_merge_max_rows,
        n_parts=n_parts,
    ).materialize()

    def zero_fill(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False), np.int64)
        z = np.zeros(len(ids), dtype=np.int64)
        return finish(ids, z, z)

    clean = semi_join(
        ds.select_columns([id_col]),
        scored,
        left_key_col=id_col,
        right_key_col=id_col,
        anti=True,
        mode="distributed",
    )
    res = scored.union(clean.map_batches(zero_fill, batch_format="pyarrow"))
    if output == "pandas":
        return typed_to_pandas(res).sort_values(id_col).reset_index(drop=True)
    return res
