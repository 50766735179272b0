"""String cleaning and character n-gram extraction.

Reproduces the reference's text preparation exactly:
  * ``clean_string``   — polyfuzz/models/_tfidf.py:142-146
  * ``create_ngrams``  — polyfuzz/models/_tfidf.py:120-139 (both ends of the
    n-gram range inclusive; n-grams containing a space dropped when
    ``remove_space_ngrams`` is set, which is the default)

Two implementations are provided: a scalar one (used for tests/goldens and
tiny driver-side lists) and a vectorized one over pyarrow string buffers
(used inside ``map_batches`` hot paths — no Python loop over rows).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_NON_ALNUM_RE = re.compile(r"[^A-Za-z0-9 ]+")
_WS_RE = re.compile(r"\s+")

SPACE_BYTE = 32  # ord(' ')


def clean_string(string: str) -> str:
    """Lowercase, delete non-[A-Za-z0-9 ], collapse whitespace, strip.

    Parity: polyfuzz/models/_tfidf.py:142-146.
    """
    string = _NON_ALNUM_RE.sub("", string.lower())
    return _WS_RE.sub(" ", string).strip()


def clean_strings_arrow(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized ``clean_string`` over an Arrow string array.

    After ``utf8_lower`` + deleting everything outside ``[a-z0-9 ]`` the
    text is pure ASCII, so the collapse step only ever sees ASCII spaces —
    byte-for-byte equal to the scalar version.
    """
    x = pc.utf8_lower(arr)
    x = pc.replace_substring_regex(x, pattern=r"[^a-z0-9 ]+", replacement="")
    x = pc.replace_substring_regex(x, pattern=r"\s+", replacement=" ")
    x = pc.utf8_trim_whitespace(x)
    if isinstance(x, pa.ChunkedArray):
        x = x.combine_chunks()
    return x


def create_ngrams(
    string: str,
    n_gram_range: tuple[int, int] = (3, 3),
    clean: bool = True,
    remove_space_ngrams: bool = True,
) -> list[str]:
    """Character n-grams for every n in the range, both ends inclusive.

    Parity: polyfuzz/models/_tfidf.py:120-139. Strings shorter than ``n``
    yield no n-grams for that ``n``.
    """
    if clean:
        string = clean_string(string)
    result: list[str] = []
    for n in range(n_gram_range[0], n_gram_range[1] + 1):
        for i in range(len(string) - n + 1):
            gram = string[i : i + n]
            if remove_space_ngrams and " " in gram:
                continue
            result.append(gram)
    return result


def _string_array_buffers(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (data_bytes, offsets) views of an Arrow string array."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=off_dtype)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.empty(0, np.uint8)
    return data, offsets.astype(np.int64, copy=False)


def batch_ngrams(
    cleaned: pa.Array | pa.ChunkedArray,
    n_gram_range: tuple[int, int] = (3, 3),
    remove_space_ngrams: bool = True,
    pad_width: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized n-gram extraction over an ALREADY-CLEANED Arrow string array.

    Returns ``(doc_ids:int64, grams:bytes_ S{pad_width})`` — one row per
    extracted n-gram occurrence (duplicates kept, for TF counting). Grams of
    different lengths are padded with NUL bytes, which never appear in
    cleaned text, so padding preserves uniqueness and sort order.

    Implementation: sliding windows over the raw Arrow string data buffer;
    windows that cross string boundaries are masked out via the offsets
    buffer. No Python loop over rows.
    """
    lo, hi = n_gram_range
    if pad_width is None:
        pad_width = hi
    arr = cleaned if isinstance(cleaned, pa.Array) else cleaned.combine_chunks()
    data, offsets = _string_array_buffers(arr)
    # the byte-window kernel is exact only when byte == codepoint; cleaned
    # text is pure ASCII by construction, but clean=False callers can pass
    # non-ASCII — route those batches through the codepoint-exact scalar
    # path (UTF-8 grams padded wide; numpy S-compare ignores trailing NULs,
    # so mixed widths across batches still unify)
    n_codeunits = int(
        pc.sum(pc.utf8_length(arr)).as_py() or 0
    )
    if n_codeunits != len(data):
        docs_l: list[int] = []
        grams_l: list[bytes] = []
        for di, t in enumerate(arr.to_pylist()):
            if not t:
                continue
            for g in create_ngrams(
                t, (lo, hi), clean=False,
                remove_space_ngrams=remove_space_ngrams,
            ):
                docs_l.append(di)
                grams_l.append(g.encode("utf-8"))
        width = max(4 * pad_width, pad_width)
        return (
            np.asarray(docs_l, dtype=np.int64),
            np.asarray(grams_l, dtype=f"S{width}"),
        )
    doc_parts: list[np.ndarray] = []
    gram_parts: list[np.ndarray] = []
    nbytes = len(data)
    for n in range(lo, hi + 1):
        if nbytes < n:
            continue
        windows = np.lib.stride_tricks.sliding_window_view(data, n)
        starts = np.arange(nbytes - n + 1, dtype=np.int64)
        # doc owning each window start; windows spilling past the doc end
        # are invalid (this also kills windows that straddle two docs).
        doc = np.searchsorted(offsets, starts, side="right") - 1
        valid = (doc >= 0) & (doc < len(offsets) - 1)
        valid &= starts + n <= offsets[np.minimum(doc + 1, len(offsets) - 1)]
        if remove_space_ngrams:
            valid &= ~(windows == SPACE_BYTE).any(axis=1)
        sel = np.flatnonzero(valid)
        if len(sel) == 0:
            continue
        grams = np.ascontiguousarray(windows[sel]).view(f"S{n}").ravel()
        if n < pad_width:
            grams = grams.astype(f"S{pad_width}")
        doc_parts.append(doc[sel])
        gram_parts.append(grams)
    if not doc_parts:
        return (np.empty(0, np.int64), np.empty(0, f"S{pad_width}"))
    doc_ids = np.concatenate(doc_parts)
    grams = np.concatenate(gram_parts)
    # Group by doc for downstream run-length ops (stable to keep n-order).
    order = np.argsort(doc_ids, kind="stable")
    return doc_ids[order], grams[order]


def doc_term_counts(
    doc_ids: np.ndarray, term_ids: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Collapse (doc, term) occurrence pairs into per-document term counts.

    Returns ``(doc, term, count)`` sorted by (doc, term) — the COO form of
    the term-frequency matrix.
    """
    if len(doc_ids) == 0:
        return (
            np.empty(0, np.int64),
            np.empty(0, np.int64),
            np.empty(0, np.int64),
        )
    order = np.lexsort((term_ids, doc_ids))
    d = doc_ids[order]
    t = term_ids[order]
    change = np.empty(len(d), dtype=bool)
    change[0] = True
    change[1:] = (d[1:] != d[:-1]) | (t[1:] != t[:-1])
    starts = np.flatnonzero(change)
    counts = np.diff(np.append(starts, len(d)))
    return d[starts], t[starts], counts
