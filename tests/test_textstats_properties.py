"""Property-based tests (hypothesis) for the text-pipeline batch kernels:
invariants that hold for ANY input, complementing the SQL-oracle checks
that pin them on the fixture distributions."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from raylink.textstats import (
    chunk_documents_batch,
    quality_filter_batch,
    redact_pii_batch,
    repetition_stats_batch,
)

# includes a non-ASCII codepoint: the chunk/length kernels must slice by
# CODEPOINTS (pyarrow utf8_slice_codeunits == DuckDB substring == Python)
_txt = st.text(alphabet="ab c.d@e1-é\n", max_size=40)
_SET = settings(max_examples=40, deadline=None)


def _batch(texts):
    return pa.table(
        {
            "doc_id": pa.array(
                np.arange(len(texts), dtype=np.int64)
            ),
            "text": pa.array(texts, type=pa.string()),
        }
    )


@_SET
@given(st.lists(_txt, min_size=1, max_size=8),
       st.integers(1, 9), st.integers(1, 9))
def test_chunk_reconstruction(texts, size, stride):
    if stride > size:  # overlap convention: stride <= size covers all chars
        stride = size
    out = chunk_documents_batch(_batch(texts), size=size, stride=stride)
    df = out.to_pandas().sort_values(["doc_id", "chunk_idx"])
    for i, t in enumerate(texts):
        chunks = df[df.doc_id == i]["chunk_text"].tolist()
        assert chunks, (i, t)
        rec = chunks[0] + "".join(c[size - stride:] for c in chunks[1:])
        assert rec == t
        # every chunk except the last is exactly `size` chars
        for c in chunks[:-1]:
            assert len(c) == size


@_SET
@given(st.lists(_txt, min_size=1, max_size=8))
def test_repetition_bounds(texts):
    out = repetition_stats_batch(_batch(texts))
    n = out["n_words"].to_numpy(zero_copy_only=False)
    d = out["n_distinct_words"].to_numpy(zero_copy_only=False)
    f = out["dup_word_frac"].to_numpy(zero_copy_only=False)
    assert (d <= n).all()
    assert ((0 <= f) & (f < 1)).all()
    for i, t in enumerate(texts):
        assert n[i] == len(t.split())
        assert d[i] == len(set(t.split()))


@_SET
@given(st.lists(_txt, min_size=1, max_size=8))
def test_redact_idempotent(texts):
    """Redacting twice equals redacting once (tokens contain no PII)."""
    once = redact_pii_batch(_batch(texts))
    twice = redact_pii_batch(
        pa.table({"doc_id": once["doc_id"], "text": once["redacted"]})
    )
    assert once["redacted"].to_pylist() == twice["redacted"].to_pylist()
    for c in ("n_emails", "n_ips", "n_phones"):
        assert sum(twice[c].to_pylist()) == 0


@_SET
@given(st.lists(_txt, min_size=1, max_size=8))
def test_quality_filter_subset(texts):
    """Survivors are a subset of input rows with text unchanged."""
    out = quality_filter_batch(_batch(texts)).to_pandas()
    for _, row in out.iterrows():
        assert row["text"] == texts[int(row["doc_id"])]
        assert row["n_words"] >= 5


@_SET
@given(st.lists(st.one_of(_txt, st.none()), min_size=1, max_size=8))
def test_split_paragraphs_roundtrip(texts):
    """sep.join of each doc's paragraphs reconstructs the (null-filled)
    text exactly; paragraph count per doc == count(sep)+1; doc_idx is
    non-decreasing (the reassembly kernels rely on block-contiguous
    docs)."""
    from raylink.textstats import _split_paragraphs

    arr = pa.array(texts, type=pa.string())
    doc_idx, paras = _split_paragraphs(arr, "\n")
    assert (np.diff(doc_idx) >= 0).all()
    plist = paras.to_pylist()
    for d, t in enumerate(texts):
        want = (t or "").split("\n")
        got = [plist[i] for i in np.flatnonzero(doc_idx == d)]
        assert got == want


@_SET
@given(st.lists(st.text(alphabet="abcde", min_size=0, max_size=7),
                min_size=1, max_size=10),
       st.lists(st.integers(1, 5), min_size=10, max_size=10))
def test_pair_counts_of_types_matches_brute(words, counts):
    from raylink.textstats import _pair_counts_of_types

    counts = np.array(counts[: len(words)], dtype=np.int64)
    a, b, n = _pair_counts_of_types(
        pa.array(words, type=pa.string()), counts
    )
    # total pair weight accounting
    want_total = sum(
        int(c) * (len(w) - 1) for w, c in zip(words, counts) if len(w) >= 2
    )
    assert int(n.sum()) == want_total
    # per-pair brute-force equality
    brute: dict = {}
    for w, c in zip(words, counts):
        for i in range(len(w) - 1):
            brute[(w[i], w[i + 1])] = brute.get((w[i], w[i + 1]), 0) + int(c)
    got: dict = {}
    for x, y, z in zip(a.to_pylist(), b.to_pylist(), n):
        got[(x, y)] = got.get((x, y), 0) + int(z)
    assert got == brute
