"""Sequence packing for pretraining data loaders: concatenate documents
in a stable global order and cut the token stream into fixed-budget
sequences ("pack with split" — the GPT-style loader, every sequence
exactly ``budget`` tokens, documents may straddle a boundary).

The distributed primitive here is an ORDERED PREFIX SUM over a sorted
Dataset: per-block token totals collect to the driver (one int64 per
block, O(blocks)), an exclusive scan assigns each block its global base
offset, and a second per-block task pass emits the packing columns from
``base + local cumsum`` — no global shuffle beyond the sort, no
driver-side row data. The same shape serves any "running offset"
assignment (byte offsets for concatenated shards, global row numbering
with payload-dependent widths).

Reference scope note: PolyFuzz has no packing surface; this is part of
the large-scale-pipeline extension set (SURVEY §8).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd


@ray.remote(num_returns=2)
def _block_token_counts(tbl: pa.Table, text_col: str, token_col=None):
    """Token count per row: a caller-supplied precomputed int64 column
    (``token_col`` — e.g. bpe_encode's n_tokens) when given, else the
    whitespace count (same rule as textstats.token_count). Two returns so
    the driver fetches ONLY the scalar block total (the per-row array
    stays object-store resident for the emit wave)."""
    # empty post-sort blocks may drop the schema entirely
    if tbl.num_rows == 0 or text_col not in tbl.column_names or (
        token_col is not None and token_col not in tbl.column_names
    ):
        return np.empty(0, dtype=np.int64), 0
    if token_col is not None:
        col = tbl[token_col]
        if col.null_count:
            raise ValueError(f"token_col {token_col!r} must be null-free")
        n = np.asarray(col.to_numpy(zero_copy_only=False), np.int64)
        if (n < 0).any():
            raise ValueError(f"token_col {token_col!r} must be non-negative")
        return n, int(n.sum())
    # nulls count as empty docs (0 tokens) — NaN through astype(int64)
    # would silently corrupt every downstream offset
    texts = pc.fill_null(tbl[text_col], "")
    n = pc.count_substring_regex(
        pc.utf8_trim_whitespace(texts), r"\S+"
    ).to_numpy(zero_copy_only=False).astype(np.int64)
    return n, int(n.sum())


@ray.remote
def _pack_block(
    tbl: pa.Table, counts: np.ndarray, base: int, budget: int, id_col: str,
    id_type: pa.DataType,
) -> pa.Table:
    if not len(counts):  # empty blocks occur after sort/repartition
        # DRIVER-snapshotted id type: a hardcoded int64 here emits a
        # divergent block schema for non-int64 ids and from_arrow_refs
        # unifies all blocks (the take_token_budget empty-block fix,
        # applied here by the round-5 review)
        return pa.table(
            {
                id_col: pa.array([], id_type),
                "n_tokens": pa.array([], pa.int64()),
                "first_seq": pa.array([], pa.int64()),
                "last_seq": pa.array([], pa.int64()),
                "offset_in_first": pa.array([], pa.int64()),
            }
        )
    before = base + np.concatenate(([0], np.cumsum(counts)[:-1]))
    first_seq = before // budget
    # empty docs occupy no tokens: degenerate span at their position
    last_tok = before + np.maximum(counts - 1, 0)
    last_seq = np.where(counts > 0, last_tok // budget, first_seq)
    return pa.table(
        {
            id_col: tbl[id_col],
            "n_tokens": pa.array(counts),
            "first_seq": pa.array(first_seq.astype(np.int64)),
            "last_seq": pa.array(last_seq.astype(np.int64)),
            "offset_in_first": pa.array((before % budget).astype(np.int64)),
        }
    )


def pack_sequences(
    ds,
    id_col: str,
    text_col: str,
    budget: int = 2048,
    token_col: str | None = None,
    output: str = "dataset",
):
    """Assign every document its position in the packed fixed-``budget``
    token stream under ascending ``id_col`` order. Output columns:
    (id_col, n_tokens, first_seq, last_seq, offset_in_first).
    ``token_col`` names a precomputed int64 token count (bpe_encode's
    n_tokens — real tokenizer output instead of the whitespace proxy).

    Two task waves over the sorted blocks: (1) per-block token totals —
    O(blocks) int64s to the driver for the exclusive scan, (2) per-block
    emit from the broadcast base offsets. Row data never lands on the
    driver; blocks stay object-store resident between waves."""
    b = int(budget)
    if b <= 0:
        raise ValueError("budget must be positive")
    pcols = [id_col, text_col] + (
        [token_col] if token_col and token_col not in (id_col, text_col) else []
    )
    _schema = ds.schema()
    # a zero-block input can lose its schema entirely (schema() -> None);
    # there is no recoverable id type then — int64 is the documented
    # fallback for the typed-empty result
    id_type = (
        dict(zip(_schema.names, _schema.types))[id_col]
        if _schema is not None
        else pa.int64()
    )
    sorted_ds = ds.select_columns(pcols).sort(id_col).materialize()
    refs = sorted_ds.to_arrow_refs()
    if not refs:
        # zero-block input: from_arrow_refs([]) raises — build the typed
        # empty result on the driver (take_token_budget's guard)
        res = rd.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], id_type),
                    "n_tokens": pa.array([], pa.int64()),
                    "first_seq": pa.array([], pa.int64()),
                    "last_seq": pa.array([], pa.int64()),
                    "offset_in_first": pa.array([], pa.int64()),
                }
            )
        )
        if output == "pandas":
            return res.to_pandas()
        return res
    pairs = [_block_token_counts.remote(r, text_col, token_col) for r in refs]
    count_refs = [p[0] for p in pairs]
    # driver state is O(blocks) scalars — per-row arrays never leave plasma
    block_sums = np.array(ray.get([p[1] for p in pairs]), dtype=np.int64)
    bases = np.concatenate(([0], np.cumsum(block_sums)[:-1]))
    out_refs = [
        _pack_block.remote(r, cref, int(base), b, id_col, id_type)
        for r, cref, base in zip(refs, count_refs, bases)
    ]
    res = rd.from_arrow_refs(out_refs)
    if output == "pandas":
        out = res.to_pandas()
        if not len(out.columns):
            # an ALL-empty Dataset loses its schema through to_pandas
            # (the joins _sorted_pandas issue) — rebuild the typed frame
            out = pa.table(
                {
                    id_col: pa.array([], id_type),
                    "n_tokens": pa.array([], pa.int64()),
                    "first_seq": pa.array([], pa.int64()),
                    "last_seq": pa.array([], pa.int64()),
                    "offset_in_first": pa.array([], pa.int64()),
                }
            ).to_pandas()
        return out.sort_values(id_col).reset_index(drop=True)
    return res


@ray.remote
def _budget_block(
    tbl: pa.Table,
    counts: np.ndarray,
    base: int,
    budget: int,
    id_col: str,
    keep_cols: tuple,
    types: dict,
) -> pa.Table:
    # empty results use the DRIVER-snapshotted column types (a block that
    # lost its schema, or a non-int64 id, must not emit a divergent
    # schema — from_arrow_refs unifies all blocks)
    empty = pa.table(
        {
            id_col: pa.array([], types[id_col]),
            "n_tokens": pa.array([], pa.int64()),
            "cum_tokens": pa.array([], pa.int64()),
            **{c: pa.array([], types[c]) for c in keep_cols},
        }
    )
    if not len(counts):
        return empty
    cum = base + np.cumsum(counts)  # inclusive running total
    keep = cum <= budget
    if not keep.any():
        return empty
    m = pa.array(keep)
    return pa.table(
        {
            id_col: tbl[id_col].filter(m),
            "n_tokens": pa.array(counts[keep]),
            "cum_tokens": pa.array(cum[keep].astype(np.int64)),
            **{c: tbl[c].filter(m) for c in keep_cols},
        }
    )


def take_token_budget(
    ds,
    id_col: str,
    text_col: str,
    budget: int,
    order_col: str | None = None,
    descending: bool = False,
    keep_cols: tuple = (),
    token_col: str | None = None,
    output: str = "dataset",
):
    """Trim a corpus to a TOKEN BUDGET in priority order: sort by
    (``order_col`` asc/desc, ``id_col`` asc tie-break), then keep whole
    documents while the running INCLUSIVE token total stays
    ``<= budget`` — the "build a training mix to N tokens" step. Output
    columns: (id_col, n_tokens, cum_tokens) for every kept doc.
    ``token_col`` names a precomputed int64 token count (bpe_encode's
    n_tokens — real tokenizer output instead of the whitespace proxy);
    it may not appear in ``keep_cols`` (it IS the n_tokens output).

    Same ordered-prefix-sum shape as :func:`pack_sequences` (per-block
    totals -> O(blocks) driver scan -> per-block emit), plus budget
    pruning: blocks whose base offset already exceeds the budget never
    run the emit wave at all, so the second pass touches only the
    O(budget) prefix of the sorted corpus."""
    b = int(budget)
    if b < 0:
        raise ValueError("budget must be non-negative")
    keep_cols = tuple(keep_cols)
    reserved = {id_col, "n_tokens", "cum_tokens"}
    bad = [c for c in keep_cols if c in reserved]
    if bad:
        raise ValueError(
            f"keep_cols {bad} collide with take_token_budget output "
            f"columns {sorted(reserved)}"
        )
    if token_col and token_col in keep_cols:
        raise ValueError(
            f"token_col {token_col!r} may not appear in keep_cols — it "
            "already leaves as the n_tokens output column"
        )
    cols = [id_col, text_col] + (
        [order_col] if order_col and order_col not in (id_col, text_col) else []
    )
    if token_col and token_col not in cols:
        cols.append(token_col)
    for c in keep_cols:
        if c not in cols:
            cols.append(c)
    if order_col:
        keys = [order_col, id_col]
        desc = [bool(descending), False]
    else:
        keys = [id_col]
        desc = [False]
    sorted_ds = ds.select_columns(cols).sort(keys, descending=desc).materialize()
    # driver-side type snapshot: every block's empty result (and the
    # zero-block fallback) must carry the SAME schema incl. keep_cols
    sch = sorted_ds.schema()
    types = dict(zip(sch.names, sch.types)) if sch else {}
    otypes = {id_col: types.get(id_col, pa.int64())}
    otypes.update({c: types.get(c, pa.string()) for c in keep_cols})
    refs = sorted_ds.to_arrow_refs()
    pairs = [_block_token_counts.remote(r, text_col, token_col) for r in refs]
    block_sums = np.array(ray.get([p[1] for p in pairs]), dtype=np.int64)
    bases = np.concatenate(([0], np.cumsum(block_sums)[:-1]))
    out_refs = [
        _budget_block.remote(r, p[0], int(base), b, id_col, keep_cols, otypes)
        for r, p, base in zip(refs, pairs, bases)
        if base <= b  # blocks entirely past the budget never emit
    ]
    empty_tbl = pa.table(
        {
            id_col: pa.array([], otypes[id_col]),
            "n_tokens": pa.array([], pa.int64()),
            "cum_tokens": pa.array([], pa.int64()),
            **{c: pa.array([], otypes[c]) for c in keep_cols},
        }
    )
    res = rd.from_arrow_refs(out_refs) if out_refs else rd.from_arrow(empty_tbl)
    if output == "pandas":
        out = res.to_pandas()
        if not len(out):  # zero-row datasets can drop their schema
            return empty_tbl.to_pandas()
        return out.sort_values(id_col).reset_index(drop=True)
    return res
