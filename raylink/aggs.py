"""Scalable grouped analytics Ray Data lacks natively: per-group top-k,
exact per-group quantiles, and heavy hitters.

Shared scale shape: a PARTIAL pass inside ``map_batches`` shrinks each
block to a bounded digest (top-k rows per key, (key, value) counts, or
per-key counts) BEFORE anything shuffles, then ONE hash-partition keyed
groupby merges digests with vectorized kernels — per-group Python is
O(partitions), never O(keys) (the joins/windows co-shuffle pattern; a
per-key ``map_groups`` would pay a Python call per key). Quantile ranks
use pure integer arithmetic (ceil(q*n) as (q_num*n + q_den - 1) //
q_den) so numpy and the DuckDB oracle agree bit-for-bit — no float
rank boundaries.

Reference scope note: PolyFuzz has no grouped-analytics surface; this is
part of the large-scale-pipeline extension set (SURVEY §8).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as _rd

from raylink.blocking import _fnv64_fold_rows, _hash64
from raylink.joins import _nonull, _string_part_hash, typed_to_pandas


def _np_i64(col) -> np.ndarray:
    return np.asarray(col.to_numpy(zero_copy_only=False), np.int64)


def _default_parts(n_parts: int | None) -> int:
    """Staging modulus for the digest shuffles: the explicit ``n_parts``
    when given, else the joins FINE modulus that :func:`_digest_merge`'s
    sized groupby later rebases onto an input-sized effective partition
    count (VERDICT r4 #1 applied to the census family — a fixed CPUs*2
    count lets per-partition digest payload, and its O(n log n) merge
    sort, grow without bound as the corpus grows on a fixed cluster)."""
    from raylink.joins import _stage_parts

    return _stage_parts(n_parts)


def _key_run_ordinal(sorted_keys: np.ndarray) -> np.ndarray:
    """0-based ordinal of each row within its key run (keys pre-sorted)."""
    n = len(sorted_keys)
    idx = np.arange(n, dtype=np.int64)
    key_start = np.ones(n, dtype=bool)
    key_start[1:] = sorted_keys[1:] != sorted_keys[:-1]
    run_first = np.maximum.accumulate(np.where(key_start, idx, 0))
    return idx - run_first


def _topk_rows(k_arr, v_arr, i_arr, k: int, descending: bool):
    """Positions of the top-k rows per key under (value desc|asc, id asc)
    — one lexsort, no per-key Python. Returns (positions, ordinals)."""
    sort_val = -v_arr if descending else v_arr
    order = np.lexsort((i_arr, sort_val, k_arr))
    ordn = _key_run_ordinal(k_arr[order])
    keep = ordn < k
    return order[keep], ordn[keep]


def _widen_or_raise(
    g: pa.Table, col: str, force_wide: bool, bound: int
) -> pa.Table:
    """String-width discipline for digest merges whose key is unbounded
    text (paragraphs, span windows, full documents): the large_string
    decision is made ONCE on the driver (``force_wide``) and every merge
    partition obeys it — a per-partition adaptive widen emits
    large_string from some partitions and string from others, and the
    downstream concat/union/join then mixes block schemas (round-5
    review finding; pa.concat_tables(promote_options="default") refuses
    string vs large_string). If a narrow decision is contradicted by an
    actual partition (the driver's byte estimate undershot), raise
    loudly rather than silently diverge. Worker-safe: capture this
    function in the enclosing scope, never import it in a worker body."""
    c = g[col]
    if force_wide:
        if not pa.types.is_large_string(c.type):
            g = g.set_column(
                g.column_names.index(col), col, c.cast(pa.large_string())
            )
    elif pa.types.is_string(c.type) and c.nbytes > bound:
        raise RuntimeError(
            f"digest merge partition for {col!r} exceeds the int32 "
            "string-offset bound but the driver decided against "
            "widening — the byte estimate undershot; report this "
            "(per-partition widening would mix string/large_string "
            "block schemas)"
        )
    return g


def _digest_merge(
    parts_ds, merge_fn, driver_merge_max_rows: int,
    n_parts: int | None = None,
    empty_fn=None,
):
    """Shared digest-merge dispatch: below the bound, concatenate the
    (already partially-reduced) digest blocks on the driver and run the
    SAME vectorized merge kernel once — a Ray groupby costs ~8 s of
    overhead at digest volumes (bounded-merge landmark); above it, the
    input-sized keyed groupby (joins._sized_groupby rebases the fine
    staging modulus onto a per-partition-payload-bounded count; an
    explicit ``n_parts`` — the modulus the partials staged with — flows
    straight through). Both paths are value-identical (every kernel is
    vectorized across keys and ignores the partition column)."""
    from raylink.joins import _sized_groupby

    parts = parts_ds.materialize()
    if parts.count() <= driver_merge_max_rows:
        # an all-empty upstream can emit zero-COLUMN placeholder blocks
        # (the schema-loss hazard) — they carry no digest rows, drop them
        tabs = [t for t in ray.get(parts.to_arrow_refs()) if t.num_columns]
        if not tabs:
            # zero-block input (e.g. everything filtered upstream):
            # pa.concat_tables([]) raises. ``empty_fn`` (when the op
            # provides one) builds the TYPED empty digest so downstream
            # joins/collects see the documented schema; otherwise an
            # empty dataset is the correct empty digest
            if empty_fn is not None:
                return _rd.from_arrow(empty_fn())
            return parts
        allt = pa.concat_tables(tabs, promote_options="default")
        return _rd.from_arrow(merge_fn(allt))
    return _sized_groupby(parts, n_parts, merge_fn)


def group_topk(
    ds,
    key_col: str,
    val_col: str,
    id_col: str,
    k: int,
    descending: bool = True,
    n_parts: int | None = None,
    output: str = "dataset",
    driver_merge_max_rows: int = 2_000_000,
):
    """Top-k rows per key by value (ties: smaller id). Output columns
    (key_col, rank 1..k, id_col, val_col). The per-block partial keeps
    <= k rows per (block, key) so the shuffle carries digests, not the
    table; the per-partition merge re-runs the same kernel and emits
    ranks."""
    P = _default_parts(n_parts)
    kk = int(k)
    desc = bool(descending)

    def partial(batch: pa.Table) -> pa.Table:
        ka = _np_i64(batch[key_col])
        va = batch[val_col].to_numpy(zero_copy_only=False)
        ia = _np_i64(batch[id_col])
        pos, _ = _topk_rows(ka, va, ia, kk, desc)
        sel = batch.select([key_col, val_col, id_col]).take(pa.array(pos))
        return sel.append_column(
            "part", pa.array((_hash64(ka[pos]) % np.uint64(P)).astype(np.int64))
        )

    def merge(g: pa.Table) -> pa.Table:
        ka = _np_i64(g[key_col])
        va = g[val_col].to_numpy(zero_copy_only=False)
        ia = _np_i64(g[id_col])
        pos, ordn = _topk_rows(ka, va, ia, kk, desc)
        take = pa.array(pos)
        return pa.table(
            {
                key_col: g[key_col].combine_chunks().take(take),
                "rank": pa.array(ordn + 1, pa.int64()),
                id_col: g[id_col].combine_chunks().take(take),
                val_col: g[val_col].combine_chunks().take(take),
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
            .sort_values([key_col, "rank"])
            .reset_index(drop=True)
        )
    return res


def _quantile_crossings(ks, vs, cs, q_list):
    """Shared percentile_disc crossing scan over digest rows pre-sorted
    by (key, value) — ``ks`` int64 keys OR dictionary codes, ``vs``
    values, ``cs`` per-(key, value) counts (duplicate pairs from
    different blocks stay adjacent after the sort; the cumulative count
    walks through them exactly). One kernel for :func:`group_quantiles`
    and :func:`filter_by_key_quantile` — the rank arithmetic must never
    fork (review finding). Caller handles the empty case. Returns
    (key-run starts, per-key totals, {label: per-key crossing values})."""
    n = len(ks)
    idx = np.arange(n, dtype=np.int64)
    key_start = np.ones(n, dtype=bool)
    key_start[1:] = ks[1:] != ks[:-1]
    run_first = np.maximum.accumulate(np.where(key_start, idx, 0))
    cum_all = np.cumsum(cs)
    base = cum_all[run_first] - cs[run_first]
    cum = cum_all - base  # within-key cumulative count
    # per-key totals live at each key's last row; scatter them back
    starts = np.flatnonzero(key_start)
    ends = np.append(starts[1:], n) - 1
    totals = cum[ends]
    n_per_row = np.repeat(totals, np.diff(np.append(starts, n)))
    run_id = np.cumsum(key_start) - 1
    vals_by_label = {}
    for q_num, q_den, label in q_list:
        target = (q_num * n_per_row + q_den - 1) // q_den
        crossing = (cum >= target) & ((cum - cs) < target)
        # exactly one crossing row per key
        vals = np.empty(len(starts), dtype=np.int64)
        vals[run_id[crossing]] = vs[crossing]
        vals_by_label[label] = vals
    return starts, totals, vals_by_label


def group_quantiles(
    ds,
    key_col: str,
    val_col: str,
    qs: tuple[tuple[int, int, str], ...] = (
        (1, 2, "p50"),
        (9, 10, "p90"),
        (99, 100, "p99"),
    ),
    n_parts: int | None = None,
    output: str = "dataset",
    driver_merge_max_rows: int = 2_000_000,
):
    """EXACT per-key quantiles of an int64 value column (quantize floats
    upstream — integer values are what make exactness and the SQL oracle
    possible). Each quantile is percentile_disc semantics: the value at
    integer rank ceil(q*n) in per-key sorted order. Output: one row per
    key with (key_col, n, *labels).

    Per-block partials reduce rows to (key, value, count) digests —
    shuffle volume is distinct (key, value) pairs per block, not rows;
    the per-partition merge re-reduces counts and reads all quantiles
    from one cumulative-count crossing scan."""
    P = _default_parts(n_parts)
    q_list = [(int(a), int(b), str(lbl)) for a, b, lbl in qs]
    for q_num, q_den, label in q_list:
        # a degenerate spec (q_num=0 -> target 0, no crossing row) would
        # scatter into an uninitialized buffer and emit garbage silently
        if q_den <= 0 or not (1 <= q_num <= q_den):
            raise ValueError(
                f"group_quantiles: quantile {label!r}=({q_num},{q_den}) "
                "must satisfy 1 <= q_num <= q_den (percentile_disc rank "
                "ceil(q*n) needs a crossing row for every key)"
            )

    def partial(batch: pa.Table) -> pa.Table:
        ka = _np_i64(batch[key_col])
        va = _np_i64(batch[val_col])
        order = np.lexsort((va, ka))
        ks, vs = ka[order], va[order]
        start = np.ones(len(ks), dtype=bool)
        start[1:] = (ks[1:] != ks[:-1]) | (vs[1:] != vs[:-1])
        starts = np.flatnonzero(start)
        cnt = np.diff(np.append(starts, len(ks)))
        return pa.table(
            {
                "k": pa.array(ks[starts]),
                "v": pa.array(vs[starts]),
                "cnt": pa.array(cnt.astype(np.int64)),
                "part": pa.array((_hash64(ks[starts]) % np.uint64(P)).astype(np.int64)),
            }
        )

    def merge(g: pa.Table) -> pa.Table:
        ka = _np_i64(g["k"])
        va = _np_i64(g["v"])
        ca = _np_i64(g["cnt"])
        order = np.lexsort((va, ka))
        ks, vs, cs = ka[order], va[order], ca[order]
        n = len(ks)
        if not n:
            return pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    **{
                        lbl: pa.array([], pa.int64())
                        for _, _, lbl in q_list
                    },
                }
            )
        starts, totals, vals_by_label = _quantile_crossings(ks, vs, cs, q_list)
        cols = {
            key_col: pa.array(ks[starts]),
            "n": pa.array(totals.astype(np.int64)),
        }
        for _, _, label in q_list:
            cols[label] = pa.array(vals_by_label[label])
        return pa.table(cols)

    res = _digest_merge(
        ds.map_batches(partial, batch_format="pyarrow"),
        merge,
        driver_merge_max_rows,
        n_parts=n_parts,
    )
    if output == "pandas":
        return typed_to_pandas(res).sort_values(key_col).reset_index(drop=True)
    return res


def _int64_key_info(schema, key_col: str, op: str):
    """(int_key, str_key, pa_key_type) for an int64-or-string key column.
    pandas-backed datasets report numpy dtypes / ``object`` here, Arrow-
    backed ones a pyarrow DataType — both spellings accepted (the
    round-5 landmark). Shared by filter_by_key_quantile and
    rank_within_key so the detection quirk never forks."""
    key_type = schema.types[schema.names.index(key_col)]
    if isinstance(key_type, pa.DataType):
        int_key = pa.types.is_integer(key_type)
        str_key = pa.types.is_string(key_type) or pa.types.is_large_string(
            key_type
        )
        pa_key_type = key_type
    else:
        try:
            dt = np.dtype(key_type)
        except TypeError:
            dt = np.dtype(object)
        int_key = np.issubdtype(dt, np.integer)
        str_key = dt == np.dtype(object) or np.issubdtype(dt, np.str_)
        pa_key_type = pa.int64() if int_key else pa.string()
    if not int_key and not str_key:
        raise ValueError(
            f"{op}: key column {key_col!r} must be int64 or string, "
            f"got {key_type}"
        )
    return int_key, str_key, pa_key_type


def _make_kv_check(key_col: str, val_col: str, int_key: bool, op: str):
    """Per-batch loud rejection for (key, value) census ops: null keys/
    values, uint64 keys (wrap above 2^63), non-signed-integer values
    (floats would be silently TRUNCATED in the int64 digest while
    downstream comparisons see originals — wrong rows, no error)."""

    def check(batch: pa.Table) -> pa.Table:
        ka = _nonull(batch[key_col], key_col, op)
        if int_key and ka.type == pa.uint64():
            raise ValueError(
                f"{op}: key column {key_col!r} is uint64 — values above "
                "2^63 would wrap in the int64 digest; cast to int64 "
                "upstream"
            )
        va = _nonull(batch[val_col], val_col, op)
        if not pa.types.is_integer(va.type) or va.type == pa.uint64():
            raise ValueError(
                f"{op}: value column {val_col!r} must be a signed "
                f"integer (got {va.type}) — floats would be truncated "
                "in the int64 digest but compared raw downstream; "
                "quantize upstream (centi-units etc.)"
            )
        return batch

    return check


def _census_part_col(keys: pa.Array, P: int) -> pa.Array:
    """The census partition column: int keys hash through splitmix64
    BEFORE the modulus (raw key % P collapses strided id spaces — the
    round-5 rule), string keys through the joins flat-buffer hash.
    Shared by every census partial so the discipline can't fork."""
    if pa.types.is_integer(keys.type):
        kn = np.asarray(keys.to_numpy(zero_copy_only=False), np.int64)
        return pa.array((_hash64(kn) % np.uint64(P)).astype(np.int64))
    return pa.array((_string_part_hash(keys) % np.uint64(P)).astype(np.int64))


def _kv_census_partial(key_col: str, val_col: str, int_key: bool, P: int):
    """Per-block distinct (key, value, count) census digest — columns
    (k, v, cnt, part) with part = key hash % P, so every key's pairs
    co-locate at the merge. The shared partial behind
    filter_by_key_quantile's string branch and rank_within_key."""
    from raylink.joins import _string_part_hash

    def partial(batch: pa.Table) -> pa.Table:
        va = _np_i64(batch[val_col])
        if int_key:
            ka = _np_i64(batch[key_col])
            order = np.lexsort((va, ka))
            ks, vs = ka[order], va[order]
            start = np.ones(len(ks), dtype=bool)
            start[1:] = (ks[1:] != ks[:-1]) | (vs[1:] != vs[:-1])
            starts = np.flatnonzero(start)
            cnt = np.diff(np.append(starts, len(ks)))
            out_keys = pa.array(ks[starts])
            parts = (_hash64(ks[starts]) % np.uint64(P)).astype(np.int64)
        else:
            keys = batch[key_col].combine_chunks()
            enc = keys.dictionary_encode()
            codes = np.asarray(
                enc.indices.to_numpy(zero_copy_only=False), np.int64
            )
            order = np.lexsort((va, codes))
            cs_, vs = codes[order], va[order]
            start = np.ones(len(cs_), dtype=bool)
            start[1:] = (cs_[1:] != cs_[:-1]) | (vs[1:] != vs[:-1])
            starts = np.flatnonzero(start)
            cnt = np.diff(np.append(starts, len(cs_)))
            out_keys = enc.dictionary.take(pa.array(cs_[starts]))
            parts = (
                _string_part_hash(out_keys) % np.uint64(P)
            ).astype(np.int64)
        return pa.table(
            {
                "k": out_keys,
                "v": pa.array(vs[starts]),
                "cnt": pa.array(cnt.astype(np.int64)),
                "part": pa.array(parts),
            }
        )

    return partial


def filter_by_key_quantile(
    ds,
    key_col: str,
    val_col: str,
    q_num: int,
    q_den: int,
    keep: str = "ge",
    output: str = "dataset",
    driver_merge_max_rows: int = 2_000_000,
    n_parts: int | None = None,
    max_broadcast_rows: int = 2_000_000,
):
    """Per-key quantile gate: keep the rows whose ``val_col`` clears
    their key's EXACT quantile — percentile_disc semantics, the value at
    integer rank ceil(q*n) in per-key sorted order, the same rank
    arithmetic as :func:`group_quantiles` — the percentile-based quality
    pruning primitive ("drop the bottom half by quality score within
    each language/domain" made exact).

    ``keep``: "ge" (default) keeps ``val >= threshold``; "gt"/"le"/"lt"
    are the other comparisons. Keys may be int64 or string; values must
    be non-null int64 (quantize floats upstream — integer values are
    what make exactness and the SQL oracle possible). Null keys or
    values reject loudly (a silent drop would shift every rank).

    Scale shape: one streaming pass reduces each block to its distinct
    (key, value, count) digest (shuffle volume = distinct pairs, not
    rows); the merged thresholds — ONE row per key — join back via
    joins.equi_join (broadcast below ``max_broadcast_rows`` keys, so the
    corpus STREAMS; hash-partitioned co-shuffle above) and the gate is a
    vectorized per-batch filter. The input is consumed twice (threshold
    pass + gate pass) — materialize upstream if it is expensive to
    recompute. Output columns keep the input's order.
    """
    from raylink.joins import equi_join

    if keep not in ("ge", "gt", "le", "lt"):
        raise ValueError(
            f'filter_by_key_quantile: keep must be "ge"/"gt"/"le"/"lt", '
            f"got {keep!r}"
        )
    if output not in ("dataset", "pandas"):
        raise ValueError('output must be "dataset" or "pandas"')
    if q_den <= 0 or not (1 <= q_num <= q_den):
        raise ValueError(
            f"filter_by_key_quantile: quantile ({q_num},{q_den}) must "
            "satisfy 1 <= q_num <= q_den"
        )
    names = ds.schema().names
    if "thr" in names:
        raise ValueError(
            'filter_by_key_quantile: input column "thr" collides with '
            "the internal threshold column — rename it"
        )
    if key_col == "n":
        raise ValueError(
            'filter_by_key_quantile: key column must not be named "n" '
            "(group_quantiles' per-key count output would overwrite it)"
        )
    schema = ds.schema()
    int_key, _str_key, pa_key_type = _int64_key_info(
        schema, key_col, "filter_by_key_quantile"
    )
    check = _make_kv_check(
        key_col, val_col, int_key, "filter_by_key_quantile"
    )
    vds = ds.map_batches(check, batch_format="pyarrow")

    if int_key:
        thr_ds = group_quantiles(
            vds, key_col, val_col, qs=((q_num, q_den, "thr"),),
            n_parts=n_parts, output="dataset",
            driver_merge_max_rows=driver_merge_max_rows,
        ).select_columns([key_col, "thr"])
    else:
        P = _default_parts(n_parts)
        partial = _kv_census_partial(key_col, val_col, False, P)

        def merge(g: pa.Table) -> pa.Table:
            keys_col = g["k"].combine_chunks() if g.num_rows else None
            va = _np_i64(g["v"])
            ca = _np_i64(g["cnt"])
            n = len(va)
            if not n:
                return pa.table(
                    {
                        key_col: pa.array([], pa_key_type),
                        "thr": pa.array([], pa.int64()),
                    }
                )
            enc = keys_col.dictionary_encode()
            codes = np.asarray(
                enc.indices.to_numpy(zero_copy_only=False), np.int64
            )
            order = np.lexsort((va, codes))
            ks, vs, cs = codes[order], va[order], ca[order]
            # group_quantiles' crossing scan over dictionary codes — ONE
            # shared kernel, the rank arithmetic must never fork
            starts, _totals, vals_by_label = _quantile_crossings(
                ks, vs, cs, ((q_num, q_den, "thr"),)
            )
            return pa.table(
                {
                    key_col: enc.dictionary.take(pa.array(ks[starts])),
                    "thr": pa.array(vals_by_label["thr"]),
                }
            )

        def empty_thr() -> pa.Table:
            return pa.table(
                {key_col: pa.array([], pa_key_type),
                 "thr": pa.array([], pa.int64())}
            )

        thr_ds = _digest_merge(
            vds.map_batches(partial, batch_format="pyarrow"),
            merge,
            driver_merge_max_rows,
            n_parts=n_parts,
            empty_fn=empty_thr,
        )

    other_cols = tuple(c for c in names if c != key_col)
    joined = equi_join(
        vds, thr_ds, key_col, key_col,
        left_cols=other_cols, right_cols=("thr",),
        mode="auto", max_broadcast_rows=max_broadcast_rows,
        n_parts=n_parts, output="dataset",
    )
    cmp_fn = {
        "ge": pc.greater_equal, "gt": pc.greater,
        "le": pc.less_equal, "lt": pc.less,
    }[keep]

    def gate(batch: pa.Table) -> pa.Table:
        kept = batch.filter(cmp_fn(batch[val_col], batch["thr"]))
        return kept.select(list(names))

    res = joined.map_batches(gate, batch_format="pyarrow")
    if output == "pandas":
        return (
            typed_to_pandas(res)
            .sort_values([key_col, val_col])
            .reset_index(drop=True)
        )
    return res


def rank_within_key(
    ds,
    key_col: str,
    val_col: str,
    rank_col: str = "rank_lt",
    n_col: str = "key_n",
    output: str = "dataset",
    n_parts: int | None = None,
    driver_merge_max_rows: int = 2_000_000,
    max_broadcast_rows: int = 2_000_000,
):
    """Per-row EXACT rank within key: ``rank_col`` = count of rows in
    the same key with a STRICTLY smaller value (``RANK() OVER
    (PARTITION BY key ORDER BY value) - 1`` — ties share a rank),
    ``n_col`` = the key's total row count. The curriculum-ordering /
    per-domain score-normalization primitive ("where does this doc sit
    in its language's quality distribution"); the percentile itself is
    the division-only ratio rank/n, left to the caller so the output
    stays pure int64 (the SQL-oracle-ability rule).

    Keys may be int64 or string; values must be non-null signed int64
    (quantize floats upstream — integer ranks are what make exactness
    possible). Nulls reject loudly (a silent drop would shift ranks).

    Scale shape: one streaming pass reduces each block to its distinct
    (key, value, count) digest (shuffle volume = distinct pairs, not
    rows); per-partition merges (keys co-locate by key hash) turn
    cumulative counts into a rank MAP — one row per distinct (key,
    value) — which joins back on a composite key||US||value string
    through equi_join's broadcast/distributed auto-switch (the
    assign_clusters composite pattern; the separator parse is
    unambiguous because the value suffix after the LAST separator is
    all digits, so keys containing the separator cannot collide). The
    input is consumed twice (census + join) — materialize upstream if
    it is expensive to recompute. Output = input columns + rank + n."""
    from raylink.joins import equi_join

    if output not in ("dataset", "pandas"):
        raise ValueError('rank_within_key: output must be "dataset" or "pandas"')
    names = ds.schema().names
    staging = {"k", "v", "cnt", "part", "kv"}
    for c in (key_col, val_col):
        if c in staging:
            raise ValueError(
                f"rank_within_key: column {c!r} collides with an internal "
                f"staging name ({sorted(staging)}) — rename it upstream"
            )
    for c in (rank_col, n_col, "kv"):
        if c in names:
            raise ValueError(
                f"rank_within_key: input column {c!r} collides with an "
                "output/staging column — rename it upstream"
            )
    for c in (rank_col, n_col):
        if c in staging:
            # a rank_col/n_col named "kv"/"v"/... would silently win the
            # merge table's dict-literal collision and corrupt the join
            raise ValueError(
                f"rank_within_key: output column {c!r} collides with an "
                f"internal staging name ({sorted(staging)}) — pick another"
            )
    if rank_col == n_col:
        raise ValueError("rank_within_key: rank_col and n_col must differ")
    schema = ds.schema()
    int_key, _str_key, pa_key_type = _int64_key_info(
        schema, key_col, "rank_within_key"
    )
    P = _default_parts(n_parts)
    check = _make_kv_check(key_col, val_col, int_key, "rank_within_key")
    vds = ds.map_batches(check, batch_format="pyarrow")
    partial = _kv_census_partial(key_col, val_col, int_key, P)

    def merge(g: pa.Table) -> pa.Table:
        va = _np_i64(g["v"])
        ca = _np_i64(g["cnt"])
        if not len(va):
            return pa.table(
                {
                    key_col: pa.array([], pa_key_type),
                    "v": pa.array([], pa.int64()),
                    rank_col: pa.array([], pa.int64()),
                    n_col: pa.array([], pa.int64()),
                }
            )
        if int_key:
            codes = _np_i64(g["k"])
            dictionary = None
        else:
            enc = g["k"].combine_chunks().dictionary_encode()
            codes = np.asarray(
                enc.indices.to_numpy(zero_copy_only=False), np.int64
            )
            dictionary = enc.dictionary
        order = np.lexsort((va, codes))
        ks, vs, cs = codes[order], va[order], ca[order]
        # combine same (key, value) counts from different blocks
        pstart = np.ones(len(ks), dtype=bool)
        pstart[1:] = (ks[1:] != ks[:-1]) | (vs[1:] != vs[:-1])
        ps = np.flatnonzero(pstart)
        pk, pv = ks[ps], vs[ps]
        pcnt = np.add.reduceat(cs, ps)
        # exclusive cumulative count within each key run = rank_lt
        kstart = np.ones(len(pk), dtype=bool)
        kstart[1:] = pk[1:] != pk[:-1]
        kidx = np.flatnonzero(kstart)
        klen = np.diff(np.append(kidx, len(pk)))
        cum = np.cumsum(pcnt) - pcnt
        rank = cum - np.repeat(cum[kidx], klen)
        key_n = np.repeat(np.add.reduceat(pcnt, kidx), klen)
        out_k = (
            pa.array(pk)
            if dictionary is None
            else dictionary.take(pa.array(pk))
        )
        va_out = pa.array(pv)
        # kv emitted HERE (not via a later map_batches): a mapped empty
        # dataset loses its schema and equi_join's empty-right fallback
        # needs the typed one from the digest merge
        kv = pc.binary_join_element_wise(
            pc.cast(out_k, pa.string()), pc.cast(va_out, pa.string()), "\x1f"
        )
        return pa.table(
            {
                "kv": kv,
                key_col: out_k,
                "v": va_out,
                rank_col: pa.array(rank.astype(np.int64)),
                n_col: pa.array(key_n.astype(np.int64)),
            }
        )

    def empty_map() -> pa.Table:
        return pa.table(
            {
                "kv": pa.array([], pa.string()),
                key_col: pa.array([], pa_key_type),
                "v": pa.array([], pa.int64()),
                rank_col: pa.array([], pa.int64()),
                n_col: pa.array([], pa.int64()),
            }
        )

    map_ds = _digest_merge(
        vds.map_batches(partial, batch_format="pyarrow"),
        merge,
        driver_merge_max_rows,
        n_parts=n_parts,
        empty_fn=empty_map,
    )

    # composite key||US||value staging column on the corpus side (Arrow
    # C kernels; US = \x1f; the map side's kv comes typed from the
    # merge). Unambiguous even for keys containing US: the segment
    # after the LAST separator is all digits on both sides.
    def add_kv(batch: pa.Table) -> pa.Table:
        kstr = pc.cast(batch[key_col], pa.string())
        vstr = pc.cast(batch[val_col], pa.string())
        kv = pc.binary_join_element_wise(kstr, vstr, "\x1f")
        return batch.append_column("kv", kv)

    corpus_kv = vds.map_batches(add_kv, batch_format="pyarrow")
    if corpus_kv.schema() is None:
        # zero-row input: the mapped dataset dropped its schema (the
        # empty-input policy) — rebuild the typed empty output directly
        types = dict(zip(schema.names, schema.types))
        empty_out = pa.table(
            {
                **{n: pa.array([], _pa_type_of(types[n])) for n in names},
                rank_col: pa.array([], pa.int64()),
                n_col: pa.array([], pa.int64()),
            }
        )
        if output == "pandas":
            return empty_out.to_pandas()
        return _rd.from_arrow(empty_out)
    joined = equi_join(
        corpus_kv, map_ds, "kv", "kv",
        left_cols=tuple(names), right_cols=(rank_col, n_col),
        mode="auto", max_broadcast_rows=max_broadcast_rows,
        n_parts=n_parts, output="dataset",
    )
    out_names = [*names, rank_col, n_col]

    def strip(batch: pa.Table) -> pa.Table:
        return batch.select(out_names)

    res = joined.map_batches(strip, batch_format="pyarrow")
    if output == "pandas":
        return (
            typed_to_pandas(res)
            .sort_values(out_names)
            .reset_index(drop=True)
        )
    return res


def heavy_hitters(
    ds,
    key_col: str,
    top_n: int,
    count_col: str = "n_rows",
    weight_col: str | None = None,
    driver_merge_max_rows: int = 2_000_000,
):
    """The EXACT top-N keys by row count — or by int64 weight sum when
    ``weight_col`` is given (ties: smaller key) — the skew-diagnosis
    primitive (find the hot keys before they melt a shuffle). Per-block
    partial counts/sums bound the work at distinct-keys-per-block rows.
    Below ``driver_merge_max_rows`` total partial rows the merge runs on
    the driver (one sort + reduceat — a Ray groupby costs ~8 s of
    overhead at digest volumes, the engine's bounded-merge landmark);
    above it, the census rides the family's input-sized part-keyed
    shuffle (joins._sized_groupby — a Ray ``groupby(key)`` over a
    near-unique census measured 195 s at 34 M distinct keys, BASELINE
    r5 probe): every key's partial counts collocate by part hash, so
    each partition sums its keys vectorized and emits its LOCAL top-N —
    a superset of the global top-N (a key outside its partition's top-N
    has >= N same-partition predecessors under (count desc, key asc),
    all of which precede it globally) — and only partitions × N rows
    reach the driver's final fold. Both paths are value-identical.
    Returns pandas (rank, key_col, count_col) — intentionally small."""
    import pandas as pd

    P = _default_parts(None)

    def partial(batch: pa.Table) -> pa.Table:
        ka = _np_i64(batch[key_col])
        if weight_col is None:
            u, c = np.unique(ka, return_counts=True)
        else:
            wa = _np_i64(batch[weight_col])
            order = np.argsort(ka, kind="stable")
            ks, ws = ka[order], wa[order]
            start = np.ones(len(ks), dtype=bool)
            start[1:] = ks[1:] != ks[:-1]
            starts = np.flatnonzero(start)
            u = ks[starts]
            c = np.add.reduceat(ws, starts) if len(ks) else ws[:0]
        return pa.table(
            {
                key_col: pa.array(u),
                "_cnt": pa.array(c.astype(np.int64)),
                "part": pa.array(
                    (_hash64(u) % np.uint64(P)).astype(np.int64)
                ),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").materialize()
    if parts.count() <= driver_merge_max_rows:
        tabs = ray.get(parts.to_arrow_refs())
        ks = np.concatenate(
            [_np_i64(t[key_col]) for t in tabs]
            or [np.empty(0, dtype=np.int64)]
        )
        cs = np.concatenate(
            [_np_i64(t["_cnt"]) for t in tabs]
            or [np.empty(0, dtype=np.int64)]
        )
        order = np.argsort(ks, kind="stable")
        ks, cs = ks[order], cs[order]
        start = np.ones(len(ks), dtype=bool)
        start[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(start)
        u = ks[starts]
        tot = np.add.reduceat(cs, starts) if len(ks) else cs[:0]
        top_idx = np.lexsort((u, -tot))[: int(top_n)]
        out = pd.DataFrame(
            {key_col: u[top_idx], count_col: tot[top_idx]}
        )
    else:
        from raylink.joins import _sized_groupby

        nn = int(top_n)

        def merge(g: pa.Table) -> pa.Table:
            ks = _np_i64(g[key_col])
            cs = _np_i64(g["_cnt"])
            if not len(ks):
                return pa.table(
                    {
                        key_col: pa.array([], pa.int64()),
                        count_col: pa.array([], pa.int64()),
                    }
                )
            order = np.argsort(ks, kind="stable")
            ks, cs = ks[order], cs[order]
            start = np.ones(len(ks), dtype=bool)
            start[1:] = ks[1:] != ks[:-1]
            starts = np.flatnonzero(start)
            u = ks[starts]
            tot = np.add.reduceat(cs, starts)
            sel = np.lexsort((u, -tot))[:nn]
            return pa.table(
                {
                    key_col: pa.array(u[sel]),
                    count_col: pa.array(tot[sel].astype(np.int64)),
                }
            )

        run_k = np.empty(0, np.int64)
        run_c = np.empty(0, np.int64)
        fold = _sized_groupby(parts, None, merge)
        for t in fold.iter_batches(batch_format="pyarrow", batch_size=None):
            if not t.num_rows or key_col not in t.column_names:
                continue
            ck = np.concatenate([run_k, _np_i64(t[key_col])])
            cc = np.concatenate([run_c, _np_i64(t[count_col])])
            sel = np.lexsort((ck, -cc))[:nn]
            run_k, run_c = ck[sel], cc[sel]
        out = pd.DataFrame({key_col: run_k, count_col: run_c})
    out.insert(0, "rank", np.arange(1, len(out) + 1, dtype=np.int64))
    return pd.DataFrame(out)


def frequent_items(
    ds,
    value_col: str,
    k: int,
    count_col: str = "n_rows",
):
    """EXACTLY the values with frequency STRICTLY above total/k — the
    guaranteed-threshold frequent-items op with a BOUNDED digest (the
    Misra-Gries guarantee made exact by a recount). Where
    :func:`heavy_hitters`' partial ships one row per DISTINCT value per
    block (unbounded on near-unique columns), this op's pass-1 digest
    carries at most k-1 candidate rows per block by pigeonhole: if
    ``freq(x)·k > N`` then some block has ``freq_b(x)·k > rows_b``
    (otherwise summing gives ``freq·k ≤ N``), so the per-block locally
    heavy values are a SUPERSET of the answer. Pass 2 broadcasts the
    candidate set (< k per block, usually far fewer) and recounts ONLY
    candidates exactly; the final filter ``count·k > N`` is pure
    integers (computed as the overflow-free equivalent
    ``count > N // k`` — for ints, count·k > N ⟺ count ≥ ⌊N/k⌋+1 — so
    arbitrarily large k never wraps int64), and the SQL replay is
    GROUP BY + HAVING. The output is provably < k rows (pandas). Values
    may be signed-int or string; nulls and uint64 raise (family policy
    — a uint64 ≥ 2⁶³ would silently reinterpret negative). ``ds`` is
    consumed twice — hand it a source-backed or materialized Dataset."""
    import pandas as pd

    from .broadcast import cached_object

    kk = int(k)
    if kk < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if value_col in ("cnt", "is_total", "s"):
        raise ValueError(
            f"frequent_items: value column {value_col!r} collides with the "
            "internal staging columns ('cnt', 'is_total', 's') — rename it"
        )

    def _counts(col):
        """(values pa.Array, counts int64) of one batch column."""
        ca = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if ca.null_count:
            raise ValueError(
                f"frequent_items: null values in {value_col!r} — values "
                "must be non-null (the loud-rejection policy)"
            )
        if pa.types.is_string(ca.type) or pa.types.is_large_string(ca.type):
            enc = pc.dictionary_encode(ca)
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            cnt = np.bincount(
                np.asarray(enc.indices.to_numpy(zero_copy_only=False))
            ).astype(np.int64)
            return enc.dictionary, cnt
        if not pa.types.is_integer(ca.type) or (
            pa.types.is_unsigned_integer(ca.type) and ca.type.bit_width == 64
        ):
            raise ValueError(
                f"frequent_items: value column type {ca.type} — values "
                "must be string or signed integer (uint64 >= 2^63 would "
                "silently reinterpret negative through the int64 cast)"
            )
        u, c = np.unique(
            np.asarray(ca.to_numpy(zero_copy_only=False), np.int64),
            return_counts=True,
        )
        return pa.array(u, pa.int64()), c.astype(np.int64)

    def cand_partial(batch: pa.Table) -> pa.Table:
        vals, cnt = _counts(batch[value_col])
        rows = batch.num_rows
        if not rows:  # keep the typed empty schema (empty-input policy)
            return pa.table(
                {
                    value_col: vals,
                    "cnt": pa.array([], pa.int64()),
                    "is_total": pa.array([], pa.int8()),
                }
            )
        # the pigeonhole candidate rule: cnt·k > rows, computed division-
        # side (⟺ cnt > rows//k for ints) so huge k cannot wrap int64
        heavy = cnt > rows // kk
        take = pa.array(np.flatnonzero(heavy), pa.int64())
        n_heavy = int(heavy.sum())
        # one marker row per block carries its TOTAL row count so N sums
        # exactly even for candidate-free blocks (is_total=1 rows never
        # contribute to any value's count: their cnt only feeds N)
        return pa.table(
            {
                value_col: pa.concat_arrays(
                    [vals.take(take), vals[:1]]
                ),
                "cnt": pa.array(
                    np.concatenate([cnt[heavy], [rows]]).astype(np.int64)
                ),
                "is_total": pa.array(
                    np.concatenate(
                        [np.zeros(n_heavy, np.int8), [1]]
                    ).astype(np.int8)
                ),
            }
        )

    parts = ray.get(
        ds.select_columns([value_col])
        .map_batches(cand_partial, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    )
    parts = [t for t in parts if value_col in t.column_names]
    nonempty = [t for t in parts if t.num_rows]
    if not nonempty:
        # typed empty (empty-input policy): value dtype from the partial
        # schema when any block reported one, else object
        vals = (
            parts[0][value_col].combine_chunks().to_pandas()
            if parts
            else pd.Series([], dtype=object)
        )
        return pd.DataFrame(
            {value_col: vals, count_col: pd.Series([], dtype=np.int64)}
        )
    allp = pa.concat_tables(nonempty, promote_options="default")
    is_tot = np.asarray(allp["is_total"].to_numpy(zero_copy_only=False), bool)
    n_total = int(
        np.asarray(allp["cnt"].to_numpy(zero_copy_only=False), np.int64)[
            is_tot
        ].sum()
    )
    cand = pc.unique(allp.filter(pa.array(~is_tot))[value_col].combine_chunks())
    if not len(cand):
        empty_vals = cand.to_pandas()
        return pd.DataFrame(
            {value_col: empty_vals, count_col: pd.Series([], dtype=np.int64)}
        )
    cand_ref = ray.put(cand)

    def recount(batch: pa.Table) -> pa.Table:
        vals, cnt = _counts(batch[value_col])
        cs = cached_object(cand_ref)
        slot = pc.fill_null(pc.index_in(vals, cs), -1).to_numpy(
            zero_copy_only=False
        )
        keep = slot >= 0
        return pa.table(
            {
                "s": pa.array(slot[keep].astype(np.int64)),
                "cnt": pa.array(cnt[keep]),
            }
        )

    rec = ray.get(
        ds.select_columns([value_col])
        .map_batches(recount, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    )
    rec = [t for t in rec if t.num_rows and "s" in t.column_names]
    totals = np.zeros(len(cand), np.int64)
    for t in rec:
        np.add.at(
            totals,
            np.asarray(t["s"].to_numpy(zero_copy_only=False), np.int64),
            np.asarray(t["cnt"].to_numpy(zero_copy_only=False), np.int64),
        )
    # overflow-free equivalent of totals*k > N (count >= N//k + 1)
    qual = totals > n_total // kk
    out_vals = cand.take(pa.array(np.flatnonzero(qual), pa.int64()))
    df = pd.DataFrame(
        {value_col: out_vals.to_pandas(), count_col: totals[qual]}
    )
    order = np.lexsort((df[value_col].to_numpy(), -df[count_col].to_numpy()))
    return df.iloc[order].reset_index(drop=True)


def group_ndistinct(
    ds,
    key_col: str,
    val_col: str,
    ndv_col: str = "ndv",
    n_parts: int | None = None,
    output: str = "dataset",
    driver_merge_max_rows: int = 2_000_000,
):
    """EXACT distinct-value count per key over int64 values. Per-block
    partials dedup (key, value) pairs (one lexsort + run-length mask)
    so the shuffle carries distinct pairs, not rows; the per-partition
    merge re-dedups and counts key runs — per-group Python is
    O(partitions). Output (key_col, ndv_col)."""
    P = _default_parts(n_parts)

    def partial(batch: pa.Table) -> pa.Table:
        ka = _np_i64(batch[key_col])
        va = _np_i64(batch[val_col])
        order = np.lexsort((va, ka))
        ks, vs = ka[order], va[order]
        start = np.ones(len(ks), dtype=bool)
        start[1:] = (ks[1:] != ks[:-1]) | (vs[1:] != vs[:-1])
        return pa.table(
            {
                "k": pa.array(ks[start]),
                "v": pa.array(vs[start]),
                "part": pa.array((_hash64(ks[start]) % np.uint64(P)).astype(np.int64)),
            }
        )

    def merge(g: pa.Table) -> pa.Table:
        ka = _np_i64(g["k"])
        va = _np_i64(g["v"])
        if not len(ka):
            return pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    ndv_col: pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((va, ka))
        ks, vs = ka[order], va[order]
        pair_start = np.ones(len(ks), dtype=bool)
        pair_start[1:] = (ks[1:] != ks[:-1]) | (vs[1:] != vs[:-1])
        key_start = np.ones(len(ks), dtype=bool)
        key_start[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(key_start)
        # distinct pairs per key run = sum of pair_start within the run
        cum = np.cumsum(pair_start)
        ends = np.append(starts[1:], len(ks)) - 1
        base = np.where(starts > 0, cum[np.maximum(starts - 1, 0)], 0)
        ndv = cum[ends] - base
        return pa.table(
            {
                key_col: pa.array(ks[starts]),
                ndv_col: pa.array(ndv.astype(np.int64)),
            }
        )

    res = _digest_merge(
        ds.map_batches(partial, batch_format="pyarrow"),
        merge,
        driver_merge_max_rows,
        n_parts=n_parts,
    )
    if output == "pandas":
        return typed_to_pandas(res).sort_values(key_col).reset_index(drop=True)
    return res


def label_centroids(
    ds,
    label_col: str,
    emb_col: str,
    milli_scale: int = 1000,
    n_parts: int | None = None,
    output: str = "dataset",
    driver_merge_max_rows: int = 2_000_000,
):
    """Per-label element-wise mean embedding, EXACT: components quantize
    to integer milli-units (round(x * scale)) so partial sums are
    summation-order-proof, then mean = int_sum / (scale * n) — one
    deterministic double division on both the numpy and the SQL side.
    Per-block partials emit ONE (label, count, sum-vector) row per label
    (sort + reduceat over the matrix); the merge re-sums. Output is long
    format (label_col, dim, n, mean_val) for SQL comparability."""
    from .embed import embeddings_to_matrix

    P = _default_parts(n_parts)
    scale = int(milli_scale)

    def partial(batch: pa.Table) -> pa.Table:
        lab = _np_i64(batch[label_col])
        mat = embeddings_to_matrix(batch[emb_col]).astype(np.float64)
        q = np.rint(mat * scale).astype(np.int64)
        order = np.argsort(lab, kind="stable")
        ls, qs = lab[order], q[order]
        start = np.ones(len(ls), dtype=bool)
        start[1:] = ls[1:] != ls[:-1]
        starts = np.flatnonzero(start)
        sums = np.add.reduceat(qs, starts, axis=0)
        cnts = np.diff(np.append(starts, len(ls)))
        d = q.shape[1]
        flat = pa.array(sums.reshape(-1), pa.int64())
        return pa.table(
            {
                "lab": pa.array(ls[starts]),
                "cnt": pa.array(cnts.astype(np.int64)),
                "vec": pa.FixedSizeListArray.from_arrays(flat, d),
                "part": pa.array((_hash64(ls[starts]) % np.uint64(P)).astype(np.int64)),
            }
        )

    def merge(g: pa.Table) -> pa.Table:
        lab = _np_i64(g["lab"])
        cnt = _np_i64(g["cnt"])
        empty = pa.table(
            {
                label_col: pa.array([], pa.int64()),
                "dim": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "mean_val": pa.array([], pa.float64()),
            }
        )
        if not len(lab):
            return empty
        vec_col = g["vec"].combine_chunks()
        d = vec_col.type.list_size
        mats = np.asarray(vec_col.values.to_numpy(zero_copy_only=False)).reshape(
            -1, d
        )
        order = np.argsort(lab, kind="stable")
        ls, cs, ms = lab[order], cnt[order], mats[order]
        start = np.ones(len(ls), dtype=bool)
        start[1:] = ls[1:] != ls[:-1]
        starts = np.flatnonzero(start)
        sums = np.add.reduceat(ms, starts, axis=0)
        totals = np.add.reduceat(cs, starts)
        labels_out = ls[starts]
        k = len(labels_out)
        mean = sums.astype(np.float64) / (
            float(scale) * totals[:, None].astype(np.float64)
        )
        return pa.table(
            {
                label_col: pa.array(np.repeat(labels_out, d)),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), k)),
                "n": pa.array(np.repeat(totals.astype(np.int64), d)),
                "mean_val": pa.array(mean.reshape(-1), pa.float64()),
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
            .sort_values([label_col, "dim"])
            .reset_index(drop=True)
        )
    return res


# --- approximate-distinct sketches -----------------------------------------
#
# group_ndistinct above is EXACT: its digest carries every distinct
# (key, value) pair, so at 100 TB a high-cardinality column ships its whole
# distinct set through the shuffle. The two sketches below bound the digest
# instead — KMV at k rows per key, HLL at min(ndv, 2^p) register rows per
# key — and stay mergeable (merge = k-smallest-of-union / elementwise max),
# so the same partial/digest-merge machinery applies unchanged. Both hash
# through blocking._hash64 (splitmix64), the repo's SQL-replayable family,
# which is what lets the DuckDB oracles replay the ESTIMATES hash-exactly
# (HUGEINT arithmetic; the one transcendental — linear counting's ln — pins
# to a finite integer fixture, the IVF-centroid pattern).

_HLL_ALPHA_NUM = 7213  # alpha_m = 0.7213/(1 + 1.079/m) == 7213*m/(10000*m + 10790)
_HLL_ALPHA_DEN_OFF = 10790
# S is scaled by 2^(62-p): register terms 2^(scale-rho) (rho > scale -> 0,
# deterministic both sides). The scale is p-DEPENDENT so the int64
# per-key reduceat cannot overflow: worst case (every register at rho=1)
# sums to m * 2^(scale-1) = 2^61 for every p — a fixed scale of 50
# overflows int64 from p=14 (2^14 * 2^49 = 2^63; review finding). At the
# oracle's p=12 this is the same 50 the SQL replays.
_HLL_SCALE_FOR_P = {p: 62 - p for p in range(12, 17)}
_I64_MAX = (1 << 63) - 1


def _sketch_val_hashes(col, name: str, op: str) -> np.ndarray:
    """uint64 value hashes for the distinct sketches: splitmix64 over
    int64 values (a 64-bit bijection — distinct hashes == distinct
    values, so KMV's < k branch is EXACT), or splitmix-finished
    full-content FNV64 over string values (the dedup._fnv64_strings
    census family — distinct strings collide with ~2^-64 per pair, so
    string counts are exact only up to hash collisions; the estimates
    are unaffected). Nulls reject loudly; other types reject rather
    than silently round through float64."""
    a = _nonull(col, name, op)
    if pa.types.is_string(a.type) or pa.types.is_large_string(a.type):
        raw = _fnv64_fold_rows(a, pa.types.is_large_string(a.type))
        return _hash64(raw.astype(np.int64))
    if not pa.types.is_integer(a.type):
        raise ValueError(
            f"{op}: value column {name!r} has type {a.type} — sketch "
            "values must be int64 or string (a float value would be "
            "silently truncated)"
        )
    return _hash64(np.asarray(a.to_numpy(zero_copy_only=False), np.int64))


def _hll_lc_table(p: int) -> np.ndarray:
    """Linear-counting lookup for m=2^p registers: lc[V-1] =
    rint(m * ln(m / V)) for V zero registers, V in [1, m]. ONE numpy
    expression shared by the merge kernel and the pinned parquet fixture
    (queries.ensure_hll_lc_fixture) so the DuckDB oracle reads the exact
    integers the kernel uses — ln is the estimator's only transcendental
    and pinning it keeps the oracle hash-exact."""
    m = 1 << p
    v = np.arange(1, m + 1, dtype=np.float64)
    return np.rint(m * np.log(m / v)).astype(np.int64)


def approx_ndistinct_kmv(
    ds,
    key_col: str,
    val_col: str,
    k: int = 256,
    ndv_col: str = "ndv_approx",
    n_parts: int | None = None,
    output: str = "dataset",
    driver_merge_max_rows: int = 2_000_000,
):
    """APPROXIMATE distinct int64 values per key via a K-minimum-values
    sketch: keep the k smallest DISTINCT splitmix64 hashes per key; with
    fewer than k distinct hashes the count is exact (splitmix64 is a
    bijection on 64 bits, so distinct hashes == distinct values), else
    estimate (k-1) * 2^64 // h_k (h_k = the kth smallest hash, hashes
    uniform on [0, 2^64)) — pure integer arithmetic, replayed in HUGEINT
    by the SQL oracle. Digest is <= k rows per key per block (vs the full
    distinct set for group_ndistinct); merge = dedup + k-smallest again,
    exactly associative. Relative error ~ 1/sqrt(k-2). The final
    per-key division is a Python-int loop (>64-bit numerator) — O(keys)
    driver-light arithmetic; everything row-shaped is vectorized."""
    if k < 2:
        raise ValueError(f"approx_ndistinct_kmv: k must be >= 2, got {k}")
    P = _default_parts(n_parts)

    def _kmin(ka: np.ndarray, ha: np.ndarray):
        """Dedup (key, hash) pairs and keep the k smallest hashes per key
        (one lexsort; runs stay hash-ascending so ordinal<k is k-smallest)."""
        order = np.lexsort((ha, ka))
        ks, hs = ka[order], ha[order]
        pair = np.ones(len(ks), dtype=bool)
        pair[1:] = (ks[1:] != ks[:-1]) | (hs[1:] != hs[:-1])
        ks, hs = ks[pair], hs[pair]
        keep = _key_run_ordinal(ks) < k
        return ks[keep], hs[keep]

    def partial(batch: pa.Table) -> pa.Table:
        ka = _np_i64(_nonull(batch[key_col], key_col, "approx_ndistinct_kmv"))
        h = _sketch_val_hashes(
            batch[val_col], val_col, "approx_ndistinct_kmv"
        )
        ks, hs = _kmin(ka, h)
        return pa.table(
            {
                "k": pa.array(ks),
                "h": pa.array(hs),
                "part": pa.array(
                    (_hash64(ks) % np.uint64(P)).astype(np.int64)
                ),
            }
        )

    def merge(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key_col: pa.array([], pa.int64()),
                ndv_col: pa.array([], pa.int64()),
            }
        )
        ka = _np_i64(g["k"])
        if not len(ka):
            return empty
        ha = np.asarray(
            g["h"].combine_chunks().to_numpy(zero_copy_only=False), np.uint64
        )
        ks, hs = _kmin(ka, ha)
        key_start = np.ones(len(ks), dtype=bool)
        key_start[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(key_start)
        cnts = np.diff(np.append(starts, len(ks)))
        est = cnts.astype(np.int64)
        full = cnts >= k  # trimmed to k, so this is == k: estimate branch
        if full.any():
            num = (k - 1) << 64  # Python int: > 64 bits
            kth = hs[starts[full] + (k - 1)]
            est[full] = [min(num // int(h), _I64_MAX) for h in kth]
        return pa.table(
            {key_col: pa.array(ks[starts]), ndv_col: pa.array(est)}
        )

    res = _digest_merge(
        ds.map_batches(partial, batch_format="pyarrow"),
        merge,
        driver_merge_max_rows,
        n_parts=n_parts,
    )
    if output == "pandas":
        return typed_to_pandas(res).sort_values(key_col).reset_index(drop=True)
    return res


def approx_ndistinct_hll(
    ds,
    key_col: str,
    val_col: str,
    p: int = 12,
    ndv_col: str = "ndv_approx",
    n_parts: int | None = None,
    output: str = "dataset",
    driver_merge_max_rows: int = 2_000_000,
):
    """APPROXIMATE distinct int64 values per key via HyperLogLog (Flajolet
    et al. 2007, 64-bit variant — no large-range correction needed):
    bucket = top p bits of splitmix64(value), rho = 1 + leading zeros of
    the remaining q=64-p bits (q+1 when they are all zero), register =
    max rho per (key, bucket). Digest rows per key <= min(ndv, 2^p) —
    strictly no larger than the exact op's distinct-pair digest, and
    capped at m=2^p regardless of cardinality; merge = elementwise max.

    The estimator is engineered integer-exact so the DuckDB oracle
    replays it in HUGEINT: with scale = 62-p (= 50 at the oracle's
    p=12; p-dependent so the int64 register-term sum cannot overflow),
    S = V*2^scale + sum(2^(scale-rho)) (V = zero registers; rho > scale
    truncates to 0 — deterministic on both sides),
    raw = (7213 * m^3 * 2^scale) // ((10000*m + 10790) * S) (the alpha_m
    constant as an exact rational), and the small-range branch
    (V > 0 and 2*raw <= 5*m) reads linear counting from the pinned
    integer table (_hll_lc_table). Relative error ~ 1.04/sqrt(m).
    bit_length via np.frexp is exact because q <= 52 < 53 float64
    mantissa bits — hence the p >= 12 floor; per-key estimate is a
    Python-int loop (numerator ~2^99), O(keys) tiny arithmetic."""
    if not 12 <= p <= 16:
        raise ValueError(
            f"approx_ndistinct_hll: p must be in [12, 16], got {p} "
            "(>=12 keeps the frexp bit_length exact, <=16 bounds the "
            "register table)"
        )
    P = _default_parts(n_parts)
    q = 64 - p
    m = 1 << p
    lc = _hll_lc_table(p)
    scale = _HLL_SCALE_FOR_P[p]

    def _regs(ka: np.ndarray, ba: np.ndarray, ra: np.ndarray):
        """Max rho per (key, bucket): one lexsort, keep each run's LAST
        row (rho ascending within the run)."""
        order = np.lexsort((ra, ba, ka))
        ks, bs, rs = ka[order], ba[order], ra[order]
        last = np.ones(len(ks), dtype=bool)
        last[:-1] = (ks[1:] != ks[:-1]) | (bs[1:] != bs[:-1])
        return ks[last], bs[last], rs[last]

    def partial(batch: pa.Table) -> pa.Table:
        ka = _np_i64(_nonull(batch[key_col], key_col, "approx_ndistinct_hll"))
        h = _sketch_val_hashes(
            batch[val_col], val_col, "approx_ndistinct_hll"
        )
        bucket = (h >> np.uint64(q)).astype(np.int64)
        w = (h & np.uint64((1 << q) - 1)).astype(np.float64)  # exact: q<=52
        bl = np.frexp(w)[1].astype(np.int64)  # bit_length; 0 for w==0
        rho = (q + 1) - bl
        ks, bs, rs = _regs(ka, bucket, rho)
        return pa.table(
            {
                "k": pa.array(ks),
                "b": pa.array(bs),
                "r": pa.array(rs),
                "part": pa.array(
                    (_hash64(ks) % np.uint64(P)).astype(np.int64)
                ),
            }
        )

    def merge(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key_col: pa.array([], pa.int64()),
                ndv_col: pa.array([], pa.int64()),
            }
        )
        ka = _np_i64(g["k"])
        if not len(ka):
            return empty
        ks, bs, rs = _regs(ka, _np_i64(g["b"]), _np_i64(g["r"]))
        key_start = np.ones(len(ks), dtype=bool)
        key_start[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(key_start)
        nb = np.diff(np.append(starts, len(ks)))  # registers present
        terms = np.zeros(len(rs), dtype=np.int64)
        small = rs <= scale
        terms[small] = np.int64(1) << (scale - rs[small])
        sums = np.add.reduceat(terms, starts)
        keys_out = ks[starts]
        vz = (m - nb).astype(np.int64)
        est = np.empty(len(keys_out), dtype=np.int64)
        num = _HLL_ALPHA_NUM * (m**3) << scale  # Python int: ~2^99 at p=12
        den_base = 10000 * m + _HLL_ALPHA_DEN_OFF
        for i in range(len(keys_out)):
            s = int(vz[i]) * (1 << scale) + int(sums[i])
            if s <= 0:
                s = 1  # all-registers-above-50 degenerate; deterministic clamp
            e_raw = num // (den_base * s)
            if vz[i] > 0 and 2 * e_raw <= 5 * m:
                est[i] = lc[vz[i] - 1]
            else:
                est[i] = min(e_raw, _I64_MAX)
        return pa.table({key_col: pa.array(keys_out), ndv_col: pa.array(est)})

    res = _digest_merge(
        ds.map_batches(partial, batch_format="pyarrow"),
        merge,
        driver_merge_max_rows,
        n_parts=n_parts,
    )
    if output == "pandas":
        return typed_to_pandas(res).sort_values(key_col).reset_index(drop=True)
    return res


def _bit_length_u64(v: np.ndarray) -> np.ndarray:
    """Exact bit_length of non-negative int64 values. np.frexp is only
    exact below 2^53 (the sketch p>=12 trick does not transfer — values
    here go to 2^63-1, where float64 rounding can bump a just-below-
    power value onto the power and overstate the length by one), so:
    6-step branchless binary reduction, pure integer."""
    x = v.astype(np.uint64)
    n = np.zeros(len(x), np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        big = x >= (np.uint64(1) << np.uint64(s))
        n[big] += s
        x[big] >>= np.uint64(s)
    return n + (x == 1)


def _log_bucket_ids(v: np.ndarray, s: int) -> np.ndarray:
    """DDSketch-style log bucket of non-negative int64 values: below
    2^(s+1) the value IS its bucket (exact region); above, the bucket
    keys on (bit_length, top s+1 bits) — 2^s sub-buckets per octave, so
    the bucket's span is a <= 2^-s relative slice of its value."""
    lim = 1 << (s + 1)
    ids = v.copy()
    big = v >= lim
    if big.any():
        vb = v[big]
        bl = _bit_length_u64(vb)  # >= s+2 here
        t = (vb.astype(np.uint64) >> (bl - 1 - s).astype(np.uint64)).astype(
            np.int64
        )  # in [2^s, 2^(s+1))
        ids[big] = lim + (bl - s - 2) * (1 << s) + (t - (1 << s))
    return ids


def _log_bucket_rep(ids: np.ndarray, s: int) -> np.ndarray:
    """Deterministic representative (the bucket's LOWER bound, so
    rep <= true quantile value < rep * (1 + 2^-s)): the inverse of
    :func:`_log_bucket_ids` at the bucket floor."""
    lim = 1 << (s + 1)
    rep = ids.copy()
    big = ids >= lim
    if big.any():
        off = ids[big] - lim
        octv = off >> s
        sub = off & ((1 << s) - 1)
        rep[big] = ((1 << s) + sub) << (octv + 1)
    return rep


def approx_quantiles_log(
    ds,
    key_col: str,
    val_col: str,
    qs: tuple[tuple[int, int, str], ...] = (
        (1, 2, "p50"),
        (9, 10, "p90"),
        (99, 100, "p99"),
    ),
    sub_bits: int = 4,
    n_parts: int | None = None,
    output: str = "dataset",
    driver_merge_max_rows: int = 2_000_000,
):
    """APPROXIMATE per-key quantiles with a BOUNDED digest — the
    DDSketch idea (Masson et al. 2019) in deterministic integer form:
    values bucket by (bit_length, top ``sub_bits``+1 bits), so the
    digest is at most ~62*2^sub_bits + 2^(sub_bits+1) (key, bucket,
    count) rows per key REGARDLESS of value cardinality, where exact
    :func:`group_quantiles` ships every distinct (key, value) pair.
    Merge = count sum (trivially associative). Each reported quantile is
    the crossing bucket's LOWER bound: rep <= true value < rep *
    (1 + 2^-sub_bits) — a guaranteed relative error, exact below
    2^(sub_bits+1). Values must be non-negative int64 (loud rejection —
    log buckets are undefined for negatives; offset upstream).

    Implementation is a pure composition: bucketize per batch (exact
    integer bit_length — no float log), run the EXACT quantile machinery
    over bucket ids, then map the crossing ids back to representative
    values. Everything is integer arithmetic both sides, so the DuckDB
    oracle replays it hash-exactly (bit_length via the recursive
    powers-of-two CTE)."""
    s = int(sub_bits)
    if not 1 <= s <= 8:
        raise ValueError(
            f"approx_quantiles_log: sub_bits must be in [1, 8], got {s}"
        )
    labels = [str(lbl) for _, _, lbl in qs]

    def bucketize(batch: pa.Table) -> pa.Table:
        va = _nonull(batch[val_col], val_col, "approx_quantiles_log")
        if not pa.types.is_integer(va.type):
            # a float column would truncate toward zero silently and void
            # the relative-error guarantee (the _sketch_val_hashes rule)
            raise ValueError(
                f"approx_quantiles_log: value column {val_col!r} has "
                f"type {va.type} — values must be integer (quantize "
                "floats upstream, as group_quantiles requires)"
            )
        v = np.asarray(va.to_numpy(zero_copy_only=False), np.int64)
        if len(v) and v.min() < 0:
            raise ValueError(
                "approx_quantiles_log: negative values — log buckets "
                "are undefined for negatives; offset or split upstream"
            )
        return pa.table(
            {
                key_col: batch[key_col],
                val_col: pa.array(_log_bucket_ids(v, s)),
            }
        )

    bres = group_quantiles(
        ds.map_batches(bucketize, batch_format="pyarrow"),
        key_col,
        val_col,
        qs=qs,
        n_parts=n_parts,
        output="dataset",
        driver_merge_max_rows=driver_merge_max_rows,
    )

    def to_rep(batch: pa.Table) -> pa.Table:
        cols = {c: batch[c] for c in batch.column_names}
        for lbl in labels:
            ids = np.asarray(
                batch[lbl].to_numpy(zero_copy_only=False), np.int64
            )
            cols[lbl] = pa.array(_log_bucket_rep(ids, s))
        return pa.table(cols)

    res = bres.map_batches(to_rep, batch_format="pyarrow")
    if output == "pandas":
        return typed_to_pandas(res).sort_values(key_col).reset_index(drop=True)
    return res


def group_count(
    ds,
    key_cols: tuple[str, ...],
    count_name: str = "n_rows",
    n_parts: int | None = None,
    output: str = "dataset",
    driver_merge_max_rows: int = 2_000_000,
):
    """Exact row count per (possibly multi-column, possibly STRING) key —
    the dataset-card primitive (corpus composition by source/lang/...).
    Per-block partials factorize a composite key (columns joined on the
    \\x1f unit separator — values must not contain it; loudly asserted)
    and emit one (keys..., count) digest row per distinct key per block;
    the merge re-factorizes and sums. Dispatch = the shared bounded
    driver-merge / keyed-groupby switch; string partitions via the joins
    flat-buffer hash."""
    import pyarrow.compute as pc

    from raylink.joins import _string_part_hash

    P = _default_parts(n_parts)
    kc = tuple(key_cols)

    def composite(batch: pa.Table) -> pa.Array:
        cols = [
            pc.cast(batch[c].combine_chunks(), pa.string()) for c in kc
        ]
        for name, c in zip(kc, cols):
            # loud null rejection (make_assignment_lookup landmark): a
            # null key would factorize to -1 and crash bincount opaquely
            if c.null_count:
                raise ValueError(
                    f"group_count key column {name!r} contains nulls"
                )
        if any(
            pc.any(pc.match_substring(c, "\x1f")).as_py() for c in cols
        ):
            raise ValueError(
                "group_count key values must not contain the \\x1f separator"
            )
        if len(cols) == 1:
            return cols[0]
        return pc.binary_join_element_wise(*cols, "\x1f")

    def partial(batch: pa.Table) -> pa.Table:
        comp = composite(batch)
        import pandas as pd

        codes, _ = pd.factorize(comp.to_numpy(zero_copy_only=False))
        cnt = np.bincount(codes)
        # factorize codes are 0..k-1 in first-appearance order, so cnt is
        # already aligned with the first-occurrence rows
        first = np.unique(codes, return_index=True)[1]
        take = pa.array(first.astype(np.int64))
        out = {c: batch[c].combine_chunks().take(take) for c in kc}
        out["_cnt"] = pa.array(cnt.astype(np.int64))
        out["part"] = pa.array(
            (_string_part_hash(comp.take(take)) % np.uint64(P)).astype(
                np.int64
            )
        )
        return pa.table(out)

    def merge(t: pa.Table) -> pa.Table:
        import pandas as pd

        if not t.num_rows:
            return pa.table(
                {
                    **{c: pa.array([], t.schema.field(c).type) for c in kc},
                    count_name: pa.array([], pa.int64()),
                }
            )
        comp = composite(t)
        codes, _ = pd.factorize(comp.to_numpy(zero_copy_only=False))
        sums = np.zeros(codes.max() + 1, dtype=np.int64)
        np.add.at(sums, codes, _np_i64(t["_cnt"]))
        first = np.unique(codes, return_index=True)[1]
        take = pa.array(first.astype(np.int64))
        return pa.table(
            {
                **{c: t[c].combine_chunks().take(take) for c in kc},
                count_name: pa.array(sums),
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
            typed_to_pandas(res).sort_values(list(kc)).reset_index(drop=True)
        )
    return res


# ---------------------------------------------------------------------------
# survivorship / golden-record merge (the MDM / entity-resolution primitive)
# ---------------------------------------------------------------------------

_MERGE_RULES = ("longest", "max", "min", "first", "mode")


def _pa_type_of(t, default=pa.string()):
    """Arrow type of a ds.schema() entry — pandas-backed datasets report
    numpy dtypes / ``object`` (the round-5 quirk); default covers object."""
    if isinstance(t, pa.DataType):
        return t
    try:
        return pa.from_numpy_dtype(np.dtype(t))
    except (TypeError, pa.ArrowNotImplementedError):
        return default


def _pick_first_per_cluster(tbl: pa.Table, sort_keys) -> pa.Table:
    """One row per cluster: Arrow multi-key sort (binary string order —
    the DuckDB collation) + first-of-run mask. ``tbl`` must carry "k".
    Rows come back k-ASCENDING — the alignment the combined digest
    relies on. Zero-row tables pass through (np.r_ would emit a
    length-1 mask)."""
    if not tbl.num_rows:
        return tbl
    idx = pc.sort_indices(tbl, sort_keys=sort_keys)
    s = tbl.take(idx)
    ka = s["k"].combine_chunks()
    if pa.types.is_integer(ka.type):
        kn = np.asarray(ka.to_numpy(zero_copy_only=False))
    else:
        kn = np.asarray(
            ka.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        )
    first = np.r_[True, kn[1:] != kn[:-1]]
    return s.filter(pa.array(first))


def _rule_sort_keys(rule: str):
    if rule == "longest":
        return [("k", "ascending"), ("ln", "descending"), ("v", "ascending")]
    if rule == "max":
        return [("k", "ascending"), ("v", "descending")]
    if rule == "min":
        return [("k", "ascending"), ("v", "ascending")]
    if rule == "first":
        return [("k", "ascending"), ("i", "ascending"), ("v", "ascending")]
    raise AssertionError(rule)


def merge_records(
    ds,
    cluster_col: str,
    rules: dict,
    id_col: str | None = None,
    output: str = "dataset",
    driver_merge_max_rows: int = 2_000_000,
    n_parts: int | None = None,
    max_broadcast_rows: int = 2_000_000,
):
    """Survivorship / golden-record merge: ONE output row per cluster,
    each listed column resolved by its rule —

      * ``"longest"``: the longest string (ties -> lexicographically
        smallest, binary collation both engines);
      * ``"max"`` / ``"min"``: the extreme value (works for numerics and
        strings — Arrow's multi-key sort is the binary order SQL uses);
      * ``"first"``: the value on the row with the smallest ``id_col``
        (duplicate ids tie to the smaller value — deterministic);
      * ``"mode"``: the most frequent value (ties -> smallest value).

    The record-linkage consumer of the match->group pipeline: after
    clustering, collapse each entity's rows into one canonical record.

    Scale shape: ALL reduce rules (longest/max/min/first) share ONE
    streaming pass emitting a single combined candidate row per
    (block, cluster) — every pick sorts its cluster key ascending and
    covers the same per-block cluster set (nulls reject), so the
    per-rule picks align positionally and ride one digest through
    :func:`_digest_merge` (clusters co-locate by key hash; the
    per-partition re-pick is exact because each rule's pick is
    associative over row subsets). Each ``"mode"`` column adds its own
    (cluster, value, count) census pass (frequency is NOT reducible to
    one candidate per block), joining back cluster-keyed through
    equi_join's broadcast/distributed auto-switch. The input is
    consumed 1 + n_mode times — materialize upstream if recomputing it
    is expensive. Null clusters or values reject loudly."""
    from raylink.joins import _string_part_hash, equi_join

    if output not in ("dataset", "pandas"):
        raise ValueError('merge_records: output must be "dataset"/"pandas"')
    if not rules:
        raise ValueError("merge_records: rules must name at least one column")
    names = ds.schema().names
    types_of = dict(zip(names, ds.schema().types))
    for col, rule in rules.items():
        if rule not in _MERGE_RULES:
            raise ValueError(
                f"merge_records: unknown rule {rule!r} for {col!r} "
                f"(valid: {_MERGE_RULES})"
            )
        if col not in names:
            raise ValueError(f"merge_records: no input column {col!r}")
        if col == cluster_col:
            raise ValueError(
                "merge_records: the cluster column cannot carry a rule"
            )
    if any(r == "first" for r in rules.values()) and id_col is None:
        raise ValueError('merge_records: rule "first" requires id_col')
    if id_col is not None and id_col not in names:
        raise ValueError(f"merge_records: no input column {id_col!r}")
    # "side" is equi_join's reserved staging name — reject at THIS seam
    # so multi-rule calls don't fail deep inside the join-back
    staging = {"k", "v", "ln", "i", "cnt", "part", "side"}
    bad = staging & ({cluster_col, id_col or ""} | set(rules))
    if bad:
        raise ValueError(
            f"merge_records: column(s) {sorted(bad)} collide with internal "
            f"staging names ({sorted(staging)}) — rename upstream"
        )
    int_key, _s, pa_key_type = _int64_key_info(
        ds.schema(), cluster_col, "merge_records"
    )
    P = _default_parts(n_parts)
    reduce_cols = [c for c, r in rules.items() if r != "mode"]
    mode_cols = [c for c, r in rules.items() if r == "mode"]
    id_type = (
        _pa_type_of(types_of[id_col]) if id_col is not None else pa.int64()
    )

    def _vtype(col: str) -> pa.DataType:
        return _pa_type_of(types_of[col])

    def _part_col(keys: pa.Array) -> pa.Array:
        return _census_part_col(keys, P)

    def _check_nonull(col, name):
        a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if a.null_count:
            raise ValueError(
                f"merge_records: column {name!r} contains nulls — fill or "
                "filter upstream (a silent drop would change the winner)"
            )
        return a

    def _staged(keys, vals, rule, ids=None) -> pa.Table:
        cols = {"k": keys, "v": vals}
        if rule == "longest":
            cols["ln"] = pc.cast(pc.utf8_length(vals), pa.int64())
        if rule == "first":
            cols["i"] = ids
        return pa.table(cols)

    # ---- ONE combined reduce digest: per (block, cluster), one row
    # carrying every reduce rule's candidate (+ the winning id for
    # "first" rules, so the global min-id re-pick at the merge is exact)
    def reduce_empty() -> pa.Table:
        cols = {"k": pa.array([], pa_key_type)}
        for c in reduce_cols:
            cols[f"v_{c}"] = pa.array([], _vtype(c))
            if rules[c] == "first":
                cols[f"i_{c}"] = pa.array([], id_type)
        cols["part"] = pa.array([], pa.int64())
        return pa.table(cols)

    need_id = any(rules[c] == "first" for c in reduce_cols)

    def reduce_partial(batch: pa.Table) -> pa.Table:
        if cluster_col not in batch.column_names or not batch.num_rows:
            return reduce_empty()
        keys = _check_nonull(batch[cluster_col], cluster_col)
        # the id column is touched (and null-checked) ONLY when a
        # "first" rule needs it — an id_col passed along with other
        # rules must not newly reject null ids
        ids = _check_nonull(batch[id_col], id_col) if need_id else None
        out_cols = None
        for c in reduce_cols:
            rule = rules[c]
            vals = _check_nonull(batch[c], c)
            t = _pick_first_per_cluster(
                _staged(keys, vals, rule, ids), _rule_sort_keys(rule)
            )
            if out_cols is None:
                out_cols = {"k": t["k"]}
            # picks sort k ascending over the SAME cluster set -> aligned
            out_cols[f"v_{c}"] = t["v"]
            if rule == "first":
                out_cols[f"i_{c}"] = t["i"]
        t = pa.table(out_cols)
        return t.append_column("part", _part_col(t["k"].combine_chunks()))

    def reduce_merge(g: pa.Table) -> pa.Table:
        if not g.num_rows:
            return pa.table(
                {
                    cluster_col: pa.array([], pa_key_type),
                    **{c: pa.array([], _vtype(c)) for c in reduce_cols},
                }
            )
        out_cols = None
        for c in reduce_cols:
            rule = rules[c]
            t = _pick_first_per_cluster(
                _staged(
                    g["k"].combine_chunks(),
                    g[f"v_{c}"].combine_chunks(),
                    rule,
                    g[f"i_{c}"].combine_chunks() if rule == "first" else None,
                ),
                _rule_sort_keys(rule),
            )
            if out_cols is None:
                out_cols = {cluster_col: t["k"]}
            out_cols[c] = t["v"]
        return pa.table(out_cols)

    # ---- per-mode-column census digests
    def _mode_empty_for(col: str) -> pa.Table:
        return pa.table(
            {
                "k": pa.array([], pa_key_type),
                "v": pa.array([], _vtype(col)),
                "cnt": pa.array([], pa.int64()),
                "part": pa.array([], pa.int64()),
            }
        )

    def _mode_partial_for(col: str):
        def partial(batch: pa.Table) -> pa.Table:
            if cluster_col not in batch.column_names or not batch.num_rows:
                return _mode_empty_for(col)
            keys = _check_nonull(batch[cluster_col], cluster_col)
            vals = _check_nonull(batch[col], col)
            gb = (
                pa.table({"k": keys, "v": vals})
                .group_by(["k", "v"])
                .aggregate([([], "count_all")])
            )
            out = pa.table(
                {
                    "k": gb["k"],
                    "v": gb["v"],
                    "cnt": pc.cast(gb["count_all"], pa.int64()),
                }
            )
            return out.append_column(
                "part", _part_col(out["k"].combine_chunks())
            )

        return partial

    def _mode_merge_for(col: str):
        def merge(g: pa.Table) -> pa.Table:
            if not g.num_rows:
                return pa.table(
                    {
                        cluster_col: pa.array([], pa_key_type),
                        col: pa.array([], _vtype(col)),
                    }
                )
            gb = g.group_by(["k", "v"]).aggregate([("cnt", "sum")])
            t = _pick_first_per_cluster(
                pa.table(
                    {
                        "k": gb["k"],
                        "v": gb["v"],
                        "cnt": pc.cast(gb["cnt_sum"], pa.int64()),
                    }
                ),
                [("k", "ascending"), ("cnt", "descending"),
                 ("v", "ascending")],
            )
            return pa.table({cluster_col: t["k"], col: t["v"]})

        return merge

    tables = []
    if reduce_cols:
        tables.append(
            (
                reduce_cols,
                _digest_merge(
                    ds.map_batches(reduce_partial, batch_format="pyarrow"),
                    reduce_merge,
                    driver_merge_max_rows,
                    n_parts=n_parts,
                    empty_fn=lambda: pa.table(
                        {
                            cluster_col: pa.array([], pa_key_type),
                            **{
                                c: pa.array([], _vtype(c))
                                for c in reduce_cols
                            },
                        }
                    ),
                ),
            )
        )
    for col in mode_cols:
        tables.append(
            (
                [col],
                _digest_merge(
                    ds.map_batches(
                        _mode_partial_for(col), batch_format="pyarrow"
                    ),
                    _mode_merge_for(col),
                    driver_merge_max_rows,
                    n_parts=n_parts,
                    empty_fn=lambda c=col: pa.table(
                        {
                            cluster_col: pa.array([], pa_key_type),
                            c: pa.array([], _vtype(c)),
                        }
                    ),
                ),
            )
        )
    covered, joined = list(tables[0][0]), tables[0][1]
    for cols_n, nxt in tables[1:]:
        joined = equi_join(
            joined, nxt, cluster_col, cluster_col,
            left_cols=tuple(covered), right_cols=tuple(cols_n),
            mode="auto", max_broadcast_rows=max_broadcast_rows,
            n_parts=n_parts, output="dataset",
        )
        covered.extend(cols_n)
    out_cols = reduce_cols + mode_cols
    if output == "pandas":
        pdf = typed_to_pandas(joined)
        if not len(pdf) and list(pdf.columns) != [cluster_col, *out_cols]:
            pdf = pd.DataFrame(
                {
                    cluster_col: pd.Series(
                        [], dtype=pa_key_type.to_pandas_dtype()
                    ),
                    **{
                        c: pd.Series([], dtype=_vtype(c).to_pandas_dtype())
                        for c in out_cols
                    },
                }
            )
        return pdf.sort_values(cluster_col, ignore_index=True)
    return joined
