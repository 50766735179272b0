"""Ordered-sequence group aggregation (vectorized string_agg).

The pattern ``GROUP BY key`` + order-sensitive aggregates (``string_agg(x
ORDER BY ...)``, first value, count) appears in the canonicalization
queries. ``groupby().map_groups`` pays one Python call + frame
construction per group; this operator instead:

  1. globally sorts by ``[key, *order_cols]`` (one range shuffle — same
     exchange the groupby would do anyway);
  2. aggregates every group inside each sorted block with vectorized
     kernels: group boundaries via ``np.flatnonzero``, counts via
     ``np.diff``, first values via ``take(starts)``, sequence joins via
     ``pyarrow.compute.binary_join`` over a ListArray built from the group
     offsets — zero per-group Python;
  3. ships only each block's FIRST and LAST group row to the driver
     (groups can straddle block boundaries after a range sort — at most
     those two per block do), merges straddle chains there, and unions the
     merged boundary rows with the untouched interior blocks.

Driver traffic is O(number of blocks), not O(groups) — interior group rows
never leave the object store, so the operator holds at an unbounded group
count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray


def _group_starts(keys: np.ndarray) -> np.ndarray:
    n = len(keys)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    chg = np.empty(n, dtype=bool)
    chg[0] = True
    chg[1:] = keys[1:] != keys[:-1]
    return np.flatnonzero(chg)


def _agg_sorted_table(
    tbl: pa.Table,
    key_col: str,
    count_name: str | None,
    firsts: tuple,
    joins: tuple,
):
    """Aggregate a block already sorted by (key, order...): one output row
    per group, all kernels vectorized. Returns (table, group_starts) — the
    caller reuses the starts (the object-dtype key materialization is the
    dominant per-block cost for string keys; computing it twice doubled
    the boundary-extras step)."""
    keys = np.asarray(tbl[key_col].to_numpy(zero_copy_only=False))
    starts = _group_starts(keys)
    n = tbl.num_rows
    ends = np.append(starts[1:], n)
    take_starts = pa.array(starts, type=pa.int64())
    cols: dict[str, pa.Array] = {
        key_col: tbl[key_col].combine_chunks().take(take_starts)
    }
    if count_name:
        cols[count_name] = pa.array(ends - starts, type=pa.int64())
    for src, out in firsts:
        cols[out] = tbl[src].combine_chunks().take(take_starts)
    offsets = pa.array(np.append(starts, n), type=pa.int32())
    for src, out, sep in joins:
        lst = pa.ListArray.from_arrays(offsets, tbl[src].combine_chunks())
        cols[out] = pc.binary_join(lst, sep)
    return pa.table(cols), starts


@ray.remote(num_returns=2)
def _agg_block_remote(
    tbl: pa.Table, key_col, count_name, firsts, joins, order_cols,
    empty_fields=None,
):
    """Returns (interior_groups_table, boundary_partials_table). The first
    and last group of the block are ALWAYS routed to the boundary set (they
    may continue in a neighboring block); interior groups are final."""
    if not tbl.num_rows or key_col not in tbl.column_names:
        # empty post-sort blocks can DROP their schema entirely (the SNM
        # landmark) — guard column access and emit the driver-snapshotted
        # typed empty so from_arrow_refs never sees divergent schemas
        if empty_fields is None:
            raise ValueError(
                f"schema-less empty block and no driver schema snapshot "
                f"for {key_col!r}"
            )
        out_f, ord_f = empty_fields
        e = pa.table({n: pa.array([], t) for n, t in out_f})
        eb = e
        for n, t in ord_f:
            eb = eb.append_column(n, pa.array([], t))
        return e, eb
    agg, starts = _agg_sorted_table(tbl, key_col, count_name, firsts, joins)
    # duplicate (key, *order) rows make the join order ambiguous (the
    # sort leaves tie order arbitrary) — reject loudly like lag_payload
    # does, instead of emitting a nondeterministic sequence. Block-local
    # check (duplicates split exactly at a block boundary are the
    # documented residual, as in remove_boilerplate's ordinal rule);
    # reuses the group starts so the key column isn't rematerialized.
    if tbl.num_rows > 1 and order_cols:
        is_start = np.zeros(tbl.num_rows, dtype=bool)
        is_start[starts] = True
        same = ~is_start[1:]
        for c in order_cols:
            v = np.asarray(tbl[c].to_numpy(zero_copy_only=False))
            same &= v[1:] == v[:-1]
        if same.any():
            raise ValueError(
                f"ordered_seq_agg: duplicate ({key_col}, "
                f"{', '.join(order_cols)}) rows — the ordered join would "
                "be nondeterministic; deduplicate or extend order_cols"
            )
    # order-col first values ride along so the driver can sequence straddle
    # chains without trusting block index ordering
    take_starts = pa.array(starts, type=pa.int64())
    boundary_extra = {
        f"__ord_{c}": tbl[c].combine_chunks().take(take_starts)
        for c in order_cols
    }
    k = agg.num_rows
    if k <= 2:
        interior = agg.slice(0, 0)
        bnd = agg
        bnd_idx = np.arange(k)
    else:
        interior = agg.slice(1, k - 2)
        bnd = pa.concat_tables([agg.slice(0, 1), agg.slice(k - 1, 1)])
        bnd_idx = np.array([0, k - 1])
    for name, arr in boundary_extra.items():
        bnd = bnd.append_column(name, arr.take(pa.array(bnd_idx, type=pa.int64())))
    return interior, bnd


def ordered_seq_agg(
    ds,
    key_col: str,
    order_cols: list[str],
    count_name: str | None = None,
    firsts: tuple = (),
    joins: tuple = (),
):
    """``SELECT key, count(*), first(x), string_agg(y, sep ORDER BY ...)
    GROUP BY key`` as a Ray pipeline.

    ``firsts``: tuple of (src_col, out_name) — first value in group order.
    ``joins``: tuple of (src_col, out_name, separator) — ordered join.
    Returns a Dataset with one row per key.
    """
    import ray.data as rd

    firsts = tuple(firsts)
    joins = tuple(joins)
    # project to the columns the aggregate actually reads BEFORE the
    # all-to-all sort — unreferenced payload columns (often the heavy
    # text) must not ride the shuffle
    needed: list[str] = [key_col, *order_cols]
    for src, _name in firsts:
        if src not in needed:
            needed.append(src)
    for src, _name, _sep in joins:
        if src not in needed:
            needed.append(src)
    sch = ds.schema()  # None for a zero-block mapped dataset — skip the
    # projection and let the existing empty-input path handle it
    if sch is not None and set(needed) != set(sch.names):
        ds = ds.select_columns(needed)
    sorted_ds = ds.sort([key_col, *order_cols]).materialize()
    refs = sorted_ds.to_arrow_refs()
    # driver-snapshotted OUTPUT schema: empty post-sort blocks drop their
    # schema (the SNM landmark), and the zero-block path must return the
    # AGGREGATE schema, not the input's (round-5 review finding)
    empty_fields = None
    if sch is not None:
        types = dict(zip(sch.names, sch.types))
        out_f = [(key_col, types[key_col])]
        if count_name:
            out_f.append((count_name, pa.int64()))
        out_f += [(out, types[src]) for src, out in firsts]
        # binary_join's output width follows its input's
        out_f += [(out, types[src]) for src, out, _sep in joins]
        ord_f = [(f"__ord_{c}", types[c]) for c in order_cols]
        empty_fields = (tuple(out_f), tuple(ord_f))
    if not refs:  # zero-block input: typed empty aggregate
        if empty_fields is not None:
            return rd.from_arrow(
                pa.table(
                    {n: pa.array([], t) for n, t in empty_fields[0]}
                )
            )
        return sorted_ds
    interior_refs = []
    boundary_refs = []
    for r in refs:
        i_ref, b_ref = _agg_block_remote.remote(
            r, key_col, count_name, firsts, joins, tuple(order_cols),
            empty_fields,
        )
        interior_refs.append(i_ref)
        boundary_refs.append(b_ref)
    boundary = pa.concat_tables(ray.get(boundary_refs), promote_options="default")
    merged = _merge_boundary(boundary, key_col, count_name, firsts, joins, order_cols)
    return rd.from_arrow_refs(interior_refs + [ray.put(merged)])


def _merge_boundary(
    bnd: pa.Table, key_col, count_name, firsts, joins, order_cols
) -> pa.Table:
    """Merge straddle chains among the boundary partials (tiny: two rows
    per block). Partials of one key are sequenced by their first order-col
    values — disjoint ranges under the global sort."""
    if bnd.num_rows == 0:
        return bnd.drop_columns([f"__ord_{c}" for c in order_cols])
    sort_keys = [(key_col, "ascending")] + [
        (f"__ord_{c}", "ascending") for c in order_cols
    ]
    bnd = bnd.take(pc.sort_indices(bnd, sort_keys=sort_keys))
    keys = np.asarray(bnd[key_col].to_numpy(zero_copy_only=False))
    starts = _group_starts(keys)
    # two straddle partials of one key with IDENTICAL first order values
    # cannot be sequenced deterministically — the boundary-level face of
    # the per-block duplicate-(key, order) rejection above
    if bnd.num_rows > 1 and order_cols:
        is_start = np.zeros(bnd.num_rows, dtype=bool)
        is_start[starts] = True
        same = ~is_start[1:]
        for c in order_cols:
            v = np.asarray(
                bnd[f"__ord_{c}"].to_numpy(zero_copy_only=False)
            )
            same &= v[1:] == v[:-1]
        if same.any():
            raise ValueError(
                f"ordered_seq_agg: boundary partials of one {key_col} "
                "share identical first order values — duplicate "
                "(key, order) rows straddling a block boundary"
            )
    n = bnd.num_rows
    ends = np.append(starts[1:], n)
    take_starts = pa.array(starts, type=pa.int64())
    cols: dict[str, pa.Array] = {
        key_col: bnd[key_col].combine_chunks().take(take_starts)
    }
    if count_name:
        # exact int64 per-group sums over the key-sorted partials —
        # bincount's float64 weights silently lose low bits above 2^53
        # (the repo-wide float64 round-trip hazard)
        counts = np.add.reduceat(
            np.asarray(
                bnd[count_name].to_numpy(zero_copy_only=False), np.int64
            ),
            starts,
        )
        cols[count_name] = pa.array(counts, type=pa.int64())
    for _src, out in firsts:
        cols[out] = bnd[out].combine_chunks().take(take_starts)
    offsets = pa.array(np.append(starts, n), type=pa.int32())
    for _src, out, sep in joins:
        lst = pa.ListArray.from_arrays(offsets, bnd[out].combine_chunks())
        cols[out] = pc.binary_join(lst, sep)
    return pa.table(cols)
