"""Canonicalization + blocking stage (north-rule operator M8).

Turns the transcript table ``(conv_id, turn_idx, role, text, tool, ts)``
into the entities table ``(entity_id, conv_id, entity_text, block_key)``:

  * per conversation, stable turn ordering is re-established from
    ``turn_idx`` and VERIFIED (contiguous 0..n-1, unique) — the per-turn
    text-equality invariant is checked via an order-aware conversation
    fingerprint (hash(turn_idx, text) folded commutatively, so it is
    computable as a vectorized groupby aggregate with no per-group Python
    call, yet still detects any reordering or text change);
  * the entity mention is extracted from the turn-0 user text (planted
    between double quotes by the synthesizer);
  * ``block_key`` = first character of the cleaned mention (clean_string
    semantics, polyfuzz/models/_tfidf.py:142-146) — the fixed blocking key
    of the north rule; the scoring stage broadcasts per-block to-side
    indexes, so hot keys cost extra compute but NO shuffle skew; the only
    keyed shuffles (DF counts, linkage) use the salting helpers below.

Everything is ``map_batches`` + small ``groupby`` aggregates over Arrow —
no driver-side iteration over rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raylink.text import clean_strings_arrow

MENTION_PATTERN = r'"(?P<mention>[^"]+)"'


_FNV64_PRIME = np.uint64(1099511628211)  # the repo-wide FNV64 family


def _fnv64_fold_rows(a: pa.Array, is_large: bool) -> np.ndarray:
    """Raw segmented FNV64 fold per row of a variable-width string/binary
    Arrow array: h(s) = sum_j byte_j * P^(L-1-j) mod 2^64, computed off
    the flat buffers in one reduceat pass — no per-row Python. The ONE
    implementation behind dedup._fnv64_strings (splitmix-finished census
    keys) and multimodal._fnv64_bytes_rows (raw fake-codec seeds);
    ``is_large`` picks the 64-bit offset walk for the caller's type
    family. Empty rows fold to 0; a trailing empty row is guarded by a
    sentinel so reduceat never indexes past the real bytes."""
    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    n = len(a)
    if not n:
        return np.empty(0, np.uint64)
    odt = np.int64 if is_large else np.int32
    offs = np.frombuffer(a.buffers()[1], dtype=odt)[
        a.offset : a.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(a.buffers()[2], dtype=np.uint8)
    starts, ends = offs[:-1], offs[1:]
    lens = ends - starts
    lo, hi = int(offs[0]), int(offs[-1])
    if hi == lo:  # all rows empty
        return np.zeros(n, np.uint64)
    seg = data[lo:hi].astype(np.uint64)
    rev = np.repeat(ends, lens) - 1 - np.arange(lo, hi, dtype=np.int64)
    pw = np.ones(int(lens.max()), np.uint64)
    pw[1:] = _FNV64_PRIME
    pw = np.multiply.accumulate(pw)  # mod-2^64 wraparound is the point
    contrib = np.r_[seg * pw[rev], np.zeros(1, np.uint64)]
    h = np.add.reduceat(contrib, starts - lo).astype(np.uint64)
    if (lens == 0).any():
        h[lens == 0] = np.uint64(0)
    return h


def _hash64(arr: np.ndarray) -> np.ndarray:
    """Cheap deterministic 64-bit mix of an int64 array (splitmix64)."""
    x = arr.astype(np.uint64, copy=True)
    x += np.uint64(0x9E3779B97F4A7C15)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def text_fingerprint(texts: pa.Array, turn_idx: np.ndarray) -> np.ndarray:
    """Order-aware per-row fingerprint: hash(text) mixed with turn_idx.

    Summed per conversation (commutative, so it works as a distributed
    aggregate) it changes if any turn's text OR its position changes —
    the per-turn-text-equality-under-stable-turn-ordering invariant.
    """
    import pandas as pd

    # vectorized deterministic string hash (pandas siphash, fixed key);
    # pyarrow.compute has no hash kernel in this version
    base = pd.util.hash_array(
        np.asarray(texts.to_pylist(), dtype=object), categorize=False
    ).astype(np.int64, copy=False)
    mixed = base.astype(np.uint64) ^ _hash64(np.asarray(turn_idx, dtype=np.int64))
    return _hash64(mixed.astype(np.int64)).astype(np.int64)


def extract_entities_batch(batch: pa.Table) -> pa.Table:
    """Turn-0 rows -> (conv_id, entity_text, block_key). Stateless
    ``map_batches`` body; upstream filter keeps only turn_idx == 0."""
    mask = pc.equal(batch["turn_idx"], 0)
    t0 = batch.filter(mask)
    # null turn-0 text canonicalizes as empty (else the '_' empty-key
    # fallback below is bypassed and a null block_key leaks downstream)
    txt = pc.fill_null(t0["text"], "")
    ext = pc.extract_regex(txt, MENTION_PATTERN)
    mention = pc.struct_field(ext, "mention")
    # rows with no quoted mention fall back to the whole turn-0 text
    mention = pc.if_else(pc.is_valid(mention), mention, txt)
    cleaned = clean_strings_arrow(mention)
    first = pc.utf8_slice_codeunits(cleaned, 0, 1)
    block = pc.if_else(pc.equal(first, ""), pa.scalar("_"), first)
    cols = {
        "conv_id": t0["conv_id"],
        "entity_text": mention,
        "block_key": block,
    }
    if "row_order" in t0.column_names:
        # source order captured upstream travels with the rows (linkage
        # scan order must be reproducible run to run)
        cols["row_order"] = t0["row_order"]
    return pa.table(cols)


def conversation_check_batch(batch: pa.Table) -> pa.Table:
    """Per-batch partials for the ordering/integrity aggregate: emits one
    row per (conv_id) with n_turns, min/max turn_idx, fingerprint sum.
    Vectorized (numpy group-by-sort within the batch)."""
    conv = np.asarray(batch["conv_id"].to_numpy(zero_copy_only=False))
    turn = np.asarray(batch["turn_idx"].to_numpy(zero_copy_only=False), dtype=np.int64)
    fp = text_fingerprint(batch["text"].combine_chunks(), turn)
    order = np.argsort(conv, kind="stable")
    conv_s, turn_s, fp_s = conv[order], turn[order], fp[order]
    change = np.empty(len(conv_s), dtype=bool)
    if len(conv_s):
        change[0] = True
        change[1:] = conv_s[1:] != conv_s[:-1]
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], len(conv_s))
    sums_fp = np.add.reduceat(fp_s, starts) if len(starts) else np.empty(0, np.int64)
    mins = np.minimum.reduceat(turn_s, starts) if len(starts) else np.empty(0, np.int64)
    maxs = np.maximum.reduceat(turn_s, starts) if len(starts) else np.empty(0, np.int64)
    tsum = np.add.reduceat(turn_s, starts) if len(starts) else np.empty(0, np.int64)
    tsq = (
        np.add.reduceat(turn_s * turn_s, starts)
        if len(starts)
        else np.empty(0, np.int64)
    )
    return pa.table(
        {
            "conv_id": pa.array(conv_s[starts], type=pa.string()),
            "n_turns": pa.array(ends - starts, type=pa.int64()),
            "min_turn": pa.array(mins, type=pa.int64()),
            "max_turn": pa.array(maxs, type=pa.int64()),
            "fingerprint": pa.array(sums_fp, type=pa.int64()),
            "turn_sum": pa.array(tsum, type=pa.int64()),
            "turn_sumsq": pa.array(tsq, type=pa.int64()),
        }
    )


def canonicalize_transcripts(ds):
    """transcripts Dataset -> entities Dataset (conv_id, entity_text,
    block_key). Pure streaming ``map_batches``; run
    :func:`validate_conversations` separately when the integrity invariant
    must be checked (it is a bounded groupby-aggregate shuffle — one row
    per conversation — not a per-group Python pass)."""
    return ds.map_batches(extract_entities_batch, batch_format="pyarrow")


def validate_conversations(ds) -> dict:
    """Full integrity check; returns summary stats. Separate from
    canonicalize so the hot path need not pay for it on every run."""
    checks = (
        ds.map_batches(conversation_check_batch, batch_format="pyarrow")
        .groupby("conv_id")
        .aggregate(
            *_sum_min_max_aggs()
        )
    )

    def _finalize(batch: pa.Table) -> pa.Table:
        # per-BLOCK scalar digests — the old checks.to_pandas() collected
        # one row per conversation to the driver (grows with the corpus;
        # round-5 review finding). min/max alone pass duplicated-with-
        # gaps indices like [0,0,3,3]; the sum and sum-of-squares of
        # 0..n-1 pin the multiset exactly for any realistic n.
        n = batch.num_rows
        if not n or "sum(n_turns)" not in batch.column_names:
            return pa.table(
                {
                    "n": pa.array([0], pa.int64()),
                    "bad": pa.array([0], pa.int64()),
                    "xor": pa.array([0], pa.int64()),
                }
            )
        nt = np.asarray(
            batch["sum(n_turns)"].to_numpy(zero_copy_only=False), np.int64
        )
        mn = np.asarray(
            batch["min(min_turn)"].to_numpy(zero_copy_only=False), np.int64
        )
        mx = np.asarray(
            batch["max(max_turn)"].to_numpy(zero_copy_only=False), np.int64
        )
        ts = np.asarray(
            batch["sum(turn_sum)"].to_numpy(zero_copy_only=False), np.int64
        )
        tq = np.asarray(
            batch["sum(turn_sumsq)"].to_numpy(zero_copy_only=False), np.int64
        )
        fp = np.asarray(
            batch["sum(fingerprint)"].to_numpy(zero_copy_only=False),
            np.int64,
        )
        ok = (
            (mn == 0)
            & (mx == nt - 1)
            & (ts == nt * (nt - 1) // 2)
            & (tq == (nt - 1) * nt * (2 * nt - 1) // 6)
        )
        return pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "bad": pa.array([int(n - ok.sum())], pa.int64()),
                "xor": pa.array(
                    [int(np.bitwise_xor.reduce(fp))], pa.int64()
                ),
            }
        )

    rows = checks.map_batches(
        _finalize, batch_format="pyarrow"
    ).take_all()  # O(blocks) scalar rows
    n = sum(r["n"] for r in rows)
    return {
        "n_conversations": int(n),
        "n_violations": int(sum(r["bad"] for r in rows)),
        "fingerprint_xor": int(
            np.bitwise_xor.reduce(
                np.array([r["xor"] for r in rows], np.int64)
            )
        )
        if rows and n
        else 0,
    }


def _sum_min_max_aggs():
    from ray.data.aggregate import Max, Min, Sum

    return (
        Sum("n_turns"),
        Min("min_turn"),
        Max("max_turn"),
        Sum("fingerprint"),
        Sum("turn_sum"),
        Sum("turn_sumsq"),
    )


def add_salt_column(batch: pa.Table, key_col: str, hot_keys: dict, n_salt_default: int = 1) -> pa.Table:
    """Append ``salted_key`` = key#i for keys listed in ``hot_keys``
    (key -> n_salt), round-robin by row position. Used ahead of keyed
    shuffles (DF counts, candidate-pair generation) so one hot blocking
    key fans out over n_salt reducers; downstream merges are additive, so
    salting never changes results."""
    keys = batch[key_col].to_pylist()
    n = len(keys)
    pos = np.arange(n)
    salts = np.array([hot_keys.get(k, n_salt_default) for k in keys], dtype=np.int64)
    salt_i = pos % np.maximum(salts, 1)
    salted = pa.array(
        [
            f"{k}#{s}" if n_salt > 1 else k
            for k, s, n_salt in zip(keys, salt_i, salts)
        ],
        type=pa.string(),
    )
    return batch.append_column("salted_key", salted)


def hot_key_counts(ds, key_col: str, hot_threshold: int) -> dict:
    """Per-key count aggregate -> {key: n_salt} for keys above threshold
    (n_salt scales with the overload factor)."""
    counts = ds.groupby(key_col).count().to_pandas()
    out = {}
    for k, c in zip(counts[key_col], counts["count()"]):
        if c > hot_threshold:
            out[k] = int(min(64, max(2, c // hot_threshold)))
    return out


def _snm_head(tbl: pa.Table, w: int):
    """(first w rows, total rows) — the count drives multi-block
    stitching for short blocks."""
    return tbl.slice(0, max(0, w)), tbl.num_rows


def _snm_pairs_block(own: pa.Table, id_col: str, window: int, *next_heads) -> pa.Table:
    """Pairs owned by this block: every own row pairs with its up-to
    ``window - 1`` successors in global sort order (successors may spill
    into the FOLLOWING blocks' heads — stitched in, never double-counted:
    ownership = the pair's FIRST element). ``next_heads`` carries as many
    following heads as needed to cover window-1 rows (short/empty blocks
    between populated ones contribute their whole, possibly empty, head)."""
    w = window - 1
    # empty post-sort blocks may drop the schema entirely
    if own.num_rows == 0 or id_col not in own.column_names or w <= 0:
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
        )
    parts = [np.asarray(own[id_col].to_numpy(zero_copy_only=False), np.int64)]
    for h in next_heads:
        if h is not None and h.num_rows and id_col in h.column_names:
            parts.append(
                np.asarray(h[id_col].to_numpy(zero_copy_only=False), np.int64)
            )
    ids = np.concatenate(parts)
    n_own = own.num_rows
    n_all = len(ids)
    if n_all < 2:
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
        )
    # vectorized sliding pairs: offsets 1..w from each own row, clipped
    offs = np.arange(1, w + 1, dtype=np.int64)
    left = np.repeat(np.arange(n_own, dtype=np.int64), w)
    right = left + np.tile(offs, n_own)
    ok = right < n_all
    return pa.table({"a": pa.array(ids[left[ok]]), "b": pa.array(ids[right[ok]])})


_snm_head_task = None
_snm_pairs_task = None


def sorted_neighborhood_pairs(
    ds,
    key_col: str,
    id_col: str,
    window: int = 5,
    output: str = "pandas",
):
    """Sorted-neighborhood blocking (Hernandez-Stolfo): sort by
    ``(key_col, id_col)`` and emit every candidate pair within a sliding
    window of ``window`` rows. The classic record-linkage complement to
    the engine's equality blocking — catches near-boundary matches a hard
    block key splits.

    Ray-Data-first: distributed sort, then ONE remote pair task per sorted
    block with the NEXT block's first ``window - 1`` rows stitched in
    (ownership = the pair's first element, so boundary pairs are emitted
    exactly once; head slices are O(blocks x window), never a full
    collect). Returns pandas (a, b) id pairs ordered by sort position, or
    the un-collected Dataset with ``output="dataset"``."""
    import ray
    import ray.data as rd

    global _snm_head_task, _snm_pairs_task

    srt = ds.select_columns([key_col, id_col]).sort([key_col, id_col]).materialize()
    refs = srt.to_arrow_refs()
    if not refs:
        empty = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        return rd.from_arrow(empty) if output == "dataset" else empty.to_pandas()
    if _snm_head_task is None:
        _snm_head_task = ray.remote(num_returns=2)(_snm_head)
        _snm_pairs_task = ray.remote(_snm_pairs_block)
    w = window - 1
    head_pairs = [_snm_head_task.remote(r, w) for r in refs]
    head_refs = [p[0] for p in head_pairs]
    n_rows = ray.get([p[1] for p in head_pairs])  # O(blocks) scalars
    pair_refs = []
    for i, r in enumerate(refs):
        # stitch heads of FOLLOWING blocks until window-1 successor rows
        # are covered (short or empty blocks keep the walk going)
        tails, acc, j = [], 0, i + 1
        while acc < w and j < len(refs):
            tails.append(head_refs[j])
            acc += min(w, n_rows[j])
            j += 1
        pair_refs.append(
            _snm_pairs_task.remote(r, id_col, window, *tails)
        )
    out_ds = rd.from_arrow_refs(pair_refs)
    if output == "dataset":
        return out_ds
    return out_ds.to_pandas()
