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


def cap_tokens_per_key(
    ds,
    key_col: str,
    id_col: str,
    text_col: str,
    budget,
    order_col: str | None = None,
    descending: bool = False,
    token_col: str | None = None,
    default_budget: int = 0,
    output: str = "dataset",
    driver_merge_max_rows: int = 2_000_000,
    n_parts: int | None = None,
):
    """PER-KEY token budgets — the domain-mixing primitive ("2B tokens of
    web, 500M of code, ..."): within each key, sort by (``order_col``
    asc/desc, ``id_col`` asc tie-break) and keep whole documents while
    the per-key running INCLUSIVE token total stays within that key's
    budget. ``budget`` is one int for every key or a mapping
    {key value -> budget} (missing keys fall back to ``default_budget``;
    the mapping is config-sized — per-domain budgets — and travels by
    closure capture, not the broadcast cache). Token counts come from
    ``token_col`` (precomputed int64, e.g. bpe_encode's n_tokens) or the
    whitespace rule (textstats.token_count). Output columns:
    (key_col, id_col, n_tokens, cum_tokens).

    Scale shape (the cap_per_key digest pattern, prefix-sum variant):
    per-block partials keep, per (block, key), only rows whose EXCLUSIVE
    block-local running total is <= budget — the local prefix plus at
    most ONE boundary row. That is sound and exact: a dropped row's
    block-local inclusive total already exceeds its budget, and local <=
    global means every such row (and everything after it in its key's
    global order) is out of the true keep set; conversely every truly
    kept row's prior rows all have global total <= budget, hence local
    total <= budget, hence they all reach the merge — so the merge's
    global per-key cumsum over digest rows is the TRUE cumulative for
    every row it keeps, and each block's boundary row forces the merged
    total past the budget before any later stray row could sneak in.
    Digest volume per (block, key) is bounded by the budget in TOKENS
    plus one row; the merge rides the shared digest dispatch (driver
    concat below the bound, value-hash keyed groupby above). Keys may be
    string or int64 (the _cap_key_views contract: loud on null/float)."""
    from .aggs import _digest_merge
    from .joins import _check_reserved, _nonull, typed_to_pandas
    from .sampling import _cap_key_views

    if isinstance(budget, dict):
        bmap = {k: int(v) for k, v in budget.items()}
        for k, v in bmap.items():
            if v < 0:
                raise ValueError(f"budget for key {k!r} is negative")
        bdefault = int(default_budget)
        if bdefault < 0:
            raise ValueError("default_budget must be non-negative")
        bscalar = None
    else:
        bscalar = int(budget)
        if bscalar < 0:
            raise ValueError("budget must be non-negative")
        bmap = None
        bdefault = 0
    _check_reserved(
        "cap_tokens_per_key",
        (key_col, id_col, text_col, order_col or id_col),
        frozenset({"nt", "o", "part", "n_tokens", "cum_tokens"}),
    )
    from .joins import _stage_parts

    # the shared staging-modulus guard: n_parts=0 would make every
    # `% P` collapse the shuffle into one partition (k % 0 -> warning,
    # not error; review finding — never reimplement the modulus inline)
    P = _stage_parts(n_parts)

    def _counts(batch: pa.Table) -> np.ndarray:
        if token_col is not None:
            col = _nonull(batch[token_col], token_col, "cap_tokens_per_key")
            n = np.asarray(col.to_numpy(zero_copy_only=False), np.int64)
            if (n < 0).any():
                raise ValueError(
                    f"token_col {token_col!r} must be non-negative"
                )
            return n
        texts = pc.fill_null(batch[text_col], "")
        return pc.count_substring_regex(
            pc.utf8_trim_whitespace(texts), r"\S+"
        ).to_numpy(zero_copy_only=False).astype(np.int64)

    def _run_budgets(ka, pos, starts: np.ndarray, lens: np.ndarray):
        """Per-row budget, expanded from one lookup per key run. The key
        gather touches only the run-START positions (O(keys), not the
        O(n) full sorted take — review finding; the scalar path gathers
        nothing at all)."""
        if bmap is None:
            return None  # scalar: compare against bscalar directly
        keys = ka.take(pa.array(pos[starts], pa.int64())).to_pylist()
        per_run = np.array(
            [bmap.get(k, bdefault) for k in keys], dtype=np.int64
        )
        return np.repeat(per_run, lens)

    def _prefix(batch: pa.Table, inclusive: bool):
        """Sort (key, order, id), per-key running totals; keep rows with
        (inclusive? cum : cum - nt) <= budget. Shared by both stages —
        the partial (inclusive=False, raw input columns) keeps the
        EXCLUSIVE prefix (+ boundary row); the merge (inclusive=True,
        staged digest columns 'nt'/'o') keeps the true INCLUSIVE
        prefix."""
        ids = np.asarray(
            _nonull(batch[id_col], id_col, "cap_tokens_per_key").to_numpy(
                zero_copy_only=False
            ),
            np.int64,
        )
        ka = batch[key_col].combine_chunks()
        codes, ph = _cap_key_views(ka)
        if inclusive:
            nt = np.asarray(
                batch["nt"].to_numpy(zero_copy_only=False), np.int64
            )
            ov = np.asarray(
                batch["o"].to_numpy(zero_copy_only=False), np.int64
            )
        else:
            nt = _counts(batch)
            if order_col is not None:
                ov = np.asarray(
                    _nonull(
                        batch[order_col], order_col, "cap_tokens_per_key"
                    ).to_numpy(zero_copy_only=False),
                    np.int64,
                )
            else:
                ov = ids
        if not len(ids):
            u64 = np.empty(0, np.uint64)
            i64 = np.empty(0, np.int64)
            return ka, i64, i64, i64, u64, i64
        osort = -ov if descending else ov
        pos = np.lexsort((ids, osort, codes))
        ks, ns = codes[pos], nt[pos]
        # duplicate (key, id) pairs make the sort (and therefore which
        # row lands under the budget boundary) order-dependent — reject
        # loudly at both stages (the cap_per_key/lag_payload policy; a
        # cross-block duplicate whose first copy was dropped at the
        # partial escapes this check, but every row at or past that
        # point is already over budget — documented residual). The check
        # sorts on (key, id) DIRECTLY: under the priority sort two
        # copies with different order values land apart, so adjacency
        # there misses them (review finding)
        chk = np.lexsort((ids, codes))
        kc, ic = codes[chk], ids[chk]
        dup = (kc[1:] == kc[:-1]) & (ic[1:] == ic[:-1])
        if dup.any():
            raise ValueError(
                "cap_tokens_per_key: duplicate (key, id) pair "
                f"(key code {kc[1:][dup][0]}, id {ic[1:][dup][0]}) — "
                "ids must be unique per key for a deterministic budget "
                "boundary"
            )
        start = np.ones(len(ks), dtype=bool)
        start[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(start)
        lens = np.diff(np.append(starts, len(ks)))
        cum = np.cumsum(ns)
        base = np.repeat(
            np.concatenate(([0], cum[starts[1:] - 1])), lens
        )
        incl = cum - base
        side = incl if inclusive else incl - ns
        budgets = _run_budgets(ka, pos, starts, lens)
        keep = side <= (bscalar if budgets is None else budgets)
        kpos = np.flatnonzero(keep)
        take = pa.array(pos[kpos], pa.int64())
        return (
            ka.take(take),
            ids[pos][kpos],
            ns[kpos],
            ov[pos][kpos],
            ph[pos][kpos],
            incl[kpos],
        )

    def partial(batch: pa.Table) -> pa.Table:
        kv, ids, ns, ov, ph, _ = _prefix(batch, inclusive=False)
        return pa.table(
            {
                key_col: kv,
                id_col: pa.array(ids),
                "nt": pa.array(ns),
                "o": pa.array(ov),
                "part": pa.array((ph % np.uint64(P)).astype(np.int64)),
            }
        )

    def merge(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key_col: pa.array(
                    [], g[key_col].type if g.num_columns else pa.string()
                ),
                id_col: pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "cum_tokens": pa.array([], pa.int64()),
            }
        )
        if not g.num_rows:
            return empty
        kv, ids, ns, _ov, _ph, incl = _prefix(g, inclusive=True)
        return pa.table(
            {
                key_col: kv,
                id_col: pa.array(ids),
                "n_tokens": pa.array(ns),
                "cum_tokens": pa.array(incl.astype(np.int64)),
            }
        )

    cols = [key_col, id_col]
    if order_col and order_col not in cols:
        cols.append(order_col)
    if token_col is not None:
        if token_col not in cols:
            cols.append(token_col)
    elif text_col not in cols:
        cols.append(text_col)
    res = _digest_merge(
        ds.select_columns(cols).map_batches(partial, batch_format="pyarrow"),
        merge,
        driver_merge_max_rows,
        n_parts=n_parts,
    )
    if output == "pandas":
        out = typed_to_pandas(res)
        return out.sort_values([key_col, id_col]).reset_index(drop=True)
    return res


def token_mix(
    ds,
    key_col: str,
    id_col: str,
    text_col: str,
    total_tokens: int,
    weights: dict,
    order_col: str | None = None,
    descending: bool = False,
    token_col: str | None = None,
    output: str = "dataset",
    driver_merge_max_rows: int = 2_000_000,
    n_parts: int | None = None,
):
    """Token-denominated PROPORTIONAL mix — the training-mix allocator in
    tokens instead of rows ("a 2B-token mix: 50 parts web, 30 code, 20
    books"): integer largest-remainder TOKEN quotas per key from integer
    ``weights`` (sampling._mix_quotas — Σ quotas == total_tokens, pure
    integer, SQL-replayable), applied as :func:`cap_tokens_per_key`
    budgets (whole-doc granularity, so each key's kept total is the
    largest prefix ≤ its quota; keys absent from ``weights`` are
    FILTERED OUT before the digest — excluded by design, and a budget-0
    pass-through would leak their zero-token docs, which the quota-join
    SQL replay excludes). Inherits cap_tokens_per_key's digest scale
    shape and output columns (key_col, id_col, n_tokens, cum_tokens)."""
    from .sampling import _mix_quotas, _mix_slots, _mix_value_set

    if int(total_tokens) < 1:
        raise ValueError(
            f"total_tokens must be >= 1, got {total_tokens}"
        )
    names, quota = _mix_quotas(int(total_tokens), weights)
    value_set = _mix_value_set(names)

    def _listed(batch: pa.Table) -> pa.Table:
        slot = _mix_slots(batch[key_col], value_set, "token_mix")
        return batch.filter(pa.array(slot >= 0))

    return cap_tokens_per_key(
        ds.map_batches(_listed, batch_format="pyarrow"),
        key_col,
        id_col,
        text_col,
        budget=dict(zip(names, quota.tolist())),
        order_col=order_col,
        descending=descending,
        token_col=token_col,
        default_budget=0,
        output=output,
        driver_merge_max_rows=driver_merge_max_rows,
        n_parts=n_parts,
    )
