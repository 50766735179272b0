"""Temporal joins over Datasets — operators Ray Data lacks natively.

``asof_join``: for every left row, the LATEST right row with the same key
and ``ts_right <= ts_left`` (``strict=True``: ``<``). Inner semantics
(left rows with no admissible right row are dropped). Tie rule when
several right rows share the max admissible ts: the greatest right id —
fully deterministic, and what the SQL oracle's
``ORDER BY ts DESC, id DESC LIMIT 1`` replays.

Ray-Data-first shape: both sides map to slim (key, ts, id, payload) rows
with a side flag, hash-partition by key (one keyed groupby — per-group
Python is O(partitions), never O(keys)), and each partition runs ONE
vectorized sort-merge: lexsort by (key, ts, side, id) with rights ordered
before lefts at equal ts (after for strict), then a single
``np.maximum.accumulate`` forward-fills "latest right index so far";
a filled index pointing at a previous key's right is detected by key
inequality (positions are monotone across key runs) and dropped. No
per-row or per-key Python anywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from raylink.blocking import _hash64


def _ts_int64(col) -> np.ndarray:
    arr = col.to_numpy(zero_copy_only=False)
    if arr.dtype.kind == "M":
        return arr.astype("datetime64[us]").view(np.int64)
    return np.asarray(arr, dtype=np.int64)


def asof_join(
    left_ds,
    right_ds,
    key_col: str,
    ts_col: str,
    left_id_col: str,
    right_id_col: str,
    right_payload_cols: tuple[str, ...] = (),
    strict: bool = False,
    n_parts: int | None = None,
    output: str = "dataset",
):
    """As-of join (see module docstring). ``left_ds`` needs
    (key_col, ts_col, left_id_col); ``right_ds`` needs (key_col, ts_col,
    right_id_col, *right_payload_cols); id column names must differ.
    Returns a Dataset (default) or pandas with columns
    (left_id_col, right_id_col, *right_payload_cols)."""
    if left_id_col == right_id_col:
        raise ValueError("left_id_col and right_id_col must have distinct names")
    _check_reserved("asof_join", right_payload_cols, _ASOF_STAGE_COLS)
    P = _stage_parts(n_parts)
    payload = tuple(right_payload_cols)
    # schema BEFORE the null-filter wrap: a map over an empty dataset
    # loses the inferable schema (the semi_join round-3 landmark)
    rschema = right_ds.schema()  # Ray Data Schema: names + pyarrow types
    # null key or null ts rows can't satisfy the as-of predicate — drop
    # them on BOTH sides (the repo-wide join null semantics; without the
    # drop the int64 cast maps nulls to INT64_MIN and they match each
    # other)
    left_ds = _drop_null_keys(left_ds, key_col, ts_col)
    right_ds = _drop_null_keys(right_ds, key_col, ts_col)
    _rtypes = dict(zip(rschema.names, rschema.types))
    payload_types = {c: _rtypes[c] for c in payload}

    def left_rows(batch: pa.Table) -> pa.Table:
        # ONE id column for both sides ("side" disambiguates): a second
        # mutually-exclusive id column is 8 dead bytes per row on the
        # all-to-all, and asof's staged width IS its scale cost (the
        # round-5 probe's residual over the output-growth target was
        # byte volume, not partition sizing). Cast to int64 so the two
        # sides' blocks agree in the union (the old lid/rid staging
        # already required int64 ids implicitly — the cross-side -1
        # fill was int64).
        n = batch.num_rows
        cols = {
            "k": batch[key_col],
            "t": batch[ts_col],
            "side": pa.array(np.ones(n, dtype=np.int8)),
            "id": _nonull(
                batch[left_id_col], left_id_col, "asof_join"
            ).cast(pa.int64()),
        }
        for c in payload:
            cols[c] = pa.nulls(n, payload_types[c])
        k = np.asarray(batch[key_col].to_numpy(zero_copy_only=False), np.int64)
        cols["part"] = pa.array((_hash64(k) % np.uint64(P)).astype(np.int64))
        return pa.table(cols)

    def right_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {
            "k": batch[key_col],
            "t": batch[ts_col],
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "id": _nonull(
                batch[right_id_col], right_id_col, "asof_join"
            ).cast(pa.int64()),
        }
        for c in payload:
            cols[c] = batch[c]
        k = np.asarray(batch[key_col].to_numpy(zero_copy_only=False), np.int64)
        cols["part"] = pa.array((_hash64(k) % np.uint64(P)).astype(np.int64))
        return pa.table(cols)

    union = left_ds.map_batches(left_rows, batch_format="pyarrow").union(
        right_ds.map_batches(right_rows, batch_format="pyarrow")
    )

    is_strict = bool(strict)

    def merge_part(g: pa.Table) -> pa.Table:
        k = np.asarray(g["k"].to_numpy(zero_copy_only=False), np.int64)
        t = _ts_int64(g["t"].combine_chunks())
        side = np.asarray(g["side"].to_numpy(zero_copy_only=False), np.int8)
        rowid = np.asarray(g["id"].to_numpy(zero_copy_only=False), np.int64)
        empty_cols = {
            left_id_col: pa.array([], g.schema.field("id").type),
            right_id_col: pa.array([], g.schema.field("id").type),
            **{c: pa.array([], g.schema.field(c).type) for c in payload},
        }
        if not len(k):
            return pa.table(empty_cols)
        is_right = side == 0
        # at equal (key, ts): rights before lefts (<= admits them); strict
        # reverses so lefts cannot see equal-ts rights. Rights at equal
        # (key, ts) order by rid asc so the LAST one is the max id.
        side_order = np.where(is_right, 1, 0) if is_strict else np.where(is_right, 0, 1)
        tie_id = np.where(is_right, rowid, np.int64(0))
        order = np.lexsort((tie_id, side_order, t, k))
        ks, sides_s = k[order], side[order]
        right_s = sides_s == 0
        idx = np.where(right_s, np.arange(len(ks), dtype=np.int64), -1)
        filled = np.maximum.accumulate(idx)
        left_pos = np.flatnonzero(~right_s)
        f = filled[left_pos]
        ok = (f >= 0) & (ks[np.maximum(f, 0)] == ks[left_pos])
        left_pos, f = left_pos[ok], f[ok]
        src_left = order[left_pos]
        src_right = order[f]
        ids = g["id"].combine_chunks()
        out = {
            left_id_col: ids.take(pa.array(src_left)),
            right_id_col: ids.take(pa.array(src_right)),
        }
        for c in payload:
            out[c] = g[c].combine_chunks().take(pa.array(src_right))
        return pa.table(out)

    res = _sized_groupby(union, n_parts, merge_part)
    if output == "pandas":
        return _sorted_pandas(res, (left_id_col, right_id_col))
    return res


# ---------------------------------------------------------------------------
# general relational joins (equi / semi / anti / interval)
# ---------------------------------------------------------------------------


def _ranges_concat(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Concatenate the index ranges [starts[i], starts[i]+counts[i]) —
    vectorized (repeat + rebased arange), no per-range Python."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.cumsum(counts)
    offs = np.arange(total, dtype=np.int64) - np.repeat(ends - counts, counts)
    return np.repeat(starts, counts) + offs


def _inner_match(lk: np.ndarray, rk_sorted: np.ndarray):
    """All (left row, right sorted-position) matches on equal keys.
    Returns (left indices repeated by multiplicity, positions into the
    SORTED right key array)."""
    lo = np.searchsorted(rk_sorted, lk, "left")
    hi = np.searchsorted(rk_sorted, lk, "right")
    counts = hi - lo
    li = np.repeat(np.arange(len(lk), dtype=np.int64), counts)
    return li, _ranges_concat(lo, counts)


def _int64_col(col) -> np.ndarray:
    return np.asarray(col.to_numpy(zero_copy_only=False), np.int64)


def _is_string_key(t: pa.DataType) -> bool:
    return pa.types.is_string(t) or pa.types.is_large_string(t)


def _string_part_hash(a: pa.Array) -> np.ndarray:
    """Deterministic vectorized uint64 hash of a string array for
    PARTITION assignment only (prefix-8 + suffix-8 + length, splitmix
    mixed, straight off the flat Arrow buffers — no per-row Python).
    Kernels always compare exact key values, so a hash collision costs
    balance, never correctness."""
    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    n = len(a)
    if not n:
        return np.empty(0, dtype=np.uint64)
    odt = np.int64 if pa.types.is_large_string(a.type) else np.int32
    offs = np.frombuffer(a.buffers()[1], dtype=odt)[
        a.offset : a.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(a.buffers()[2], dtype=np.uint8)
    starts, ends = offs[:-1], offs[1:]
    lens = ends - starts
    win = np.arange(8, dtype=np.int64)
    cap = max(len(data) - 1, 0)
    ppos = starts[:, None] + win[None, :]
    pval = np.where(
        win[None, :] < lens[:, None],
        data[np.minimum(ppos, cap)] if len(data) else np.uint8(0),
        np.uint8(0),
    ).astype(np.uint64)
    spos = ends[:, None] - 8 + win[None, :]
    sval = np.where(
        spos >= starts[:, None],
        data[np.clip(spos, 0, cap)] if len(data) else np.uint8(0),
        np.uint8(0),
    ).astype(np.uint64)
    powers = (np.uint64(256) ** np.arange(8, dtype=np.uint64))[None, :]
    pre = (pval * powers).sum(axis=1, dtype=np.uint64)
    suf = (sval * powers).sum(axis=1, dtype=np.uint64)
    return _hash64(
        (_hash64(pre.astype(np.int64)) ^ _hash64((suf + lens.astype(np.uint64)).astype(np.int64))).astype(np.int64)
    )


def typed_to_pandas(ds):
    """``output="pandas"`` collect that survives the zero-row quirk: a
    zero-row Dataset's ``to_pandas()`` can come back COLUMN-LESS even
    when ``ds.schema()`` still knows the types (the recurring empty-block
    schema-loss hazard) — and the caller's ``sort_values(col)`` then
    KeyErrors on a legitimately-empty result (a fully-filtered corpus, a
    dup-free dedup, an over-strict min_count). Rebuild the typed empty
    frame from the Dataset schema in that case; non-empty results pass
    through untouched."""
    df = ds.to_pandas()
    if not len(df) and not len(df.columns):
        sch = ds.schema()
        if sch is not None:
            df = pa.schema(
                list(zip(sch.names, sch.types))
            ).empty_table().to_pandas()
    return df


def _drop_null_keys(ds, *key_cols: str):
    """Null keys never satisfy SQL equality/comparison predicates, but
    the int64 kernels would silently corrupt them (a null int64 column
    round-trips through float64 in to_numpy: nulls become INT64_MIN and
    every value above 2^53 in the batch loses precision) and the
    distributed string kernels would code every null to one shared
    sentinel and JOIN them to each other — so null-predicate rows are
    dropped from both sides up front, in every mode (documented join
    semantics; matches the broadcast paths, where invalid
    ``index_in``/``is_in`` results filter out). Variadic: asof drops on
    (key, ts) — a null timestamp can't satisfy the as-of comparison."""

    def f(batch: pa.Table) -> pa.Table:
        for key_col in key_cols:
            col = batch[key_col]
            if col.null_count:
                batch = batch.filter(pc.is_valid(col.combine_chunks()))
        return batch

    return ds.map_batches(f, batch_format="pyarrow")


def _nonull(col, name: str, op: str):
    """Loud null rejection for columns the kernels cast to int64: the
    float64 round-trip (see _drop_null_keys) is silent data corruption,
    so columns that are OUTPUTS rather than join predicates (ids, order
    columns, window keys) raise instead of dropping. Returns the
    combined array."""
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if a.null_count:
        raise ValueError(
            f"{op}: column {name!r} contains null values — nulls would "
            "silently corrupt the int64 kernel (null -> INT64_MIN via a "
            "float64 round-trip that also rounds values above 2^53); "
            "filter or fill upstream"
        )
    return a


def _key_parts(col, P: int) -> np.ndarray:
    """Partition id per row for an int64 OR string key column. Int keys
    hash through splitmix64 before the modulus — a raw ``key % P``
    collapses arithmetically structured key spaces (ids allocated in
    P-divisible strides) onto a few partitions, defeating the sized
    groupby's bounded-partition guarantee."""
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if _is_string_key(a.type):
        return (_string_part_hash(a) % np.uint64(P)).astype(np.int64)
    return (_hash64(_int64_col(a)) % np.uint64(P)).astype(np.int64)


def _key_codes(col) -> np.ndarray:
    """Exact int64 equality codes for a key column of any supported type
    (strings factorize via one dictionary_encode — equal values share a
    code, so the int searchsorted kernels apply unchanged)."""
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if _is_string_key(a.type):
        enc = pc.dictionary_encode(a)
        return np.asarray(
            enc.indices.to_numpy(zero_copy_only=False), np.int64
        )
    return _int64_col(a)


_FINE_PARTS = 65_536
_TARGET_PART_ROWS = 1_000_000
_TARGET_PART_BYTES = 128 << 20


def _cpu_floor_parts() -> int:
    return max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)


def _effective_parts(rows: int, nbytes: int) -> int:
    """Partition count sized to the STAGED input: per-partition payload
    stays bounded (~1M rows and ~128 MiB), with the CPU-derived floor for
    parallelism and the _FINE_PARTS staging-modulus cap."""
    P = max(
        _cpu_floor_parts(),
        -(-int(rows) // _TARGET_PART_ROWS),
        -(-int(nbytes) // _TARGET_PART_BYTES),
    )
    return int(min(P, _FINE_PARTS))


def _stage_parts(n_parts: int | None) -> int:
    """Partition-column modulus used at STAGING time: the explicit
    ``n_parts`` when given, else the FINE modulus that
    :func:`_sized_groupby` later rebases onto an input-sized effective
    count (the staging map can't know the input size yet)."""
    if n_parts is None:
        return _FINE_PARTS
    if int(n_parts) < 1:
        # numpy `k % 0` silently yields 0 (RuntimeWarning only): every
        # row would land in one mega-partition and the sized rebase is
        # bypassed because n_parts is explicit
        raise ValueError(f"n_parts must be >= 1, got {n_parts}")
    return int(n_parts)


def _sized_groupby(staged, n_parts: int | None, merge_fn):
    """Input-sized keyed groupby (VERDICT r4 #1: a fixed CPUs*2 partition
    count lets per-partition payload — and its O(n log n) sort — grow
    without bound as the input grows on a fixed-size cluster).

    With explicit ``n_parts`` the staged table flows straight into the
    groupby (its part column already used that modulus). Otherwise the
    staged table is materialized (the all-to-all consuming it holds the
    whole staged payload anyway, and a materialized dataset's
    count/size_bytes are metadata-free), the effective partition count is
    sized so per-partition payload stays bounded (~1M rows / 128 MiB per
    partition, CPU floor for parallelism, _FINE_PARTS cap = the staging
    modulus), and the fine part column rebases with one cheap modulus
    map fused into the shuffle read."""
    if n_parts is not None:
        return staged.groupby("part").map_groups(
            merge_fn, batch_format="pyarrow"
        )
    m = staged.materialize()
    P = _effective_parts(m.count(), m.size_bytes() or 0)
    if P < _FINE_PARTS:

        def rebase(batch: pa.Table) -> pa.Table:
            part = (
                np.asarray(
                    batch["part"].to_numpy(zero_copy_only=False), np.int64
                )
                % P
            )
            return batch.set_column(
                batch.schema.get_field_index("part"),
                "part",
                pa.array(part),
            )

        m = m.map_batches(rebase, batch_format="pyarrow")
    return m.groupby("part").map_groups(merge_fn, batch_format="pyarrow")


def _sorted_pandas(res, sort_cols):
    """Collect a (possibly empty) join result to sorted pandas; an empty
    Dataset loses its schema through to_pandas, so rebuild the columns
    (typed, from ds.schema(), when available; bare sort columns as the
    last resort for a fully schema-less result)."""
    import pandas as pd

    out = typed_to_pandas(res)
    if not len(out) and not len(out.columns):
        out = pd.DataFrame({c: [] for c in sort_cols})
    return out.sort_values(list(sort_cols)).reset_index(drop=True)


_EQUI_STAGE_COLS = frozenset({"k", "side", "part"})
_ASOF_STAGE_COLS = frozenset({"k", "t", "side", "part", "id"})


def _check_reserved(op: str, names, reserved=_EQUI_STAGE_COLS) -> None:
    """The distributed join modes stage rows through internal columns
    ('k'/'side'/'part', plus 't'/'lid'/'rid' for asof) — a user payload
    column with one of those names would be silently overwritten by the
    staging metadata (wrong values, no error). Collide loudly instead, in
    every mode: mode="auto" can flip to distributed as data grows, so a
    name that works at small scale must not break silently at large
    scale."""
    bad = sorted(set(names) & reserved)
    if bad:
        raise ValueError(
            f"{op}: payload column name(s) {bad} collide with reserved "
            f"internal staging columns {sorted(reserved)}; "
            "rename the column(s) before joining"
        )


def equi_join(
    left_ds,
    right_ds,
    left_key_col: str,
    right_key_col: str,
    left_cols: tuple[str, ...] = (),
    right_cols: tuple[str, ...] = (),
    mode: str = "auto",
    max_broadcast_rows: int = 2_000_000,
    n_parts: int | None = None,
    output: str = "dataset",
):
    """Inner hash equi-join on int64 OR string keys (the operator Ray
    Data lacks natively). Output columns: (left_key_col, *left_cols, *right_cols)
    with full inner multiplicity (every left x right key match emits a
    row). Names in ``left_cols``/``right_cols`` must be disjoint.

    "broadcast": the slim right side (key + right_cols) is collected
    once, sorted by key, ``ray.put`` once, and every left batch joins
    against it with two searchsorted passes — the left side STREAMS, the
    shuffle-free path for small dimension tables. "distributed": both
    sides hash-partition on the key (ONE keyed groupby, asof_join's
    co-shuffle shape) and each partition runs the same vectorized
    kernel — for fact x fact joins where neither side fits a broadcast.
    "auto" picks by ``right_ds.count()`` vs ``max_broadcast_rows``.
    String keys partition by a vectorized flat-buffer hash and factorize
    to exact dictionary codes inside each kernel — a hash collision
    costs balance, never correctness.
    """
    if set(left_cols) & set(right_cols):
        raise ValueError("left_cols and right_cols must be disjoint")
    _check_reserved("equi_join", (*left_cols, *right_cols))
    # schemas BEFORE the null-filter wrap: a zero-block mapped dataset
    # cannot infer its schema (empty-right fallback, distributed nulls)
    rschema = right_ds.schema()
    lschema = left_ds.schema()
    left_ds = _drop_null_keys(left_ds, left_key_col)
    right_ds = _drop_null_keys(right_ds, right_key_col)
    if mode == "auto":
        mode = (
            "broadcast"
            if right_ds.count() <= max_broadcast_rows
            else "distributed"
        )

    if mode == "broadcast":
        slim = right_ds.select_columns([right_key_col, *right_cols])
        tabs = [
            t
            for t in ray.get(slim.to_arrow_refs())
            if right_key_col in t.column_names
        ]  # empty placeholder blocks can carry a zero-column schema
        if tabs:
            tbl = pa.concat_tables(tabs, promote_options="default")
        else:
            types = dict(zip(rschema.names, rschema.types))
            tbl = pa.table(
                {
                    n: pa.array([], types[n])
                    for n in (right_key_col, *right_cols)
                }
            )
        from .broadcast import cached_object

        str_key = _is_string_key(tbl.schema.field(right_key_col).type)
        if str_key:
            keys = tbl[right_key_col].combine_chunks()
            order = pc.sort_indices(keys)
            rtbl = tbl.take(order).combine_chunks()
            ks = rtbl[right_key_col].combine_chunks()
            run_start = np.ones(len(ks), dtype=bool)
            if len(ks) > 1:
                run_start[1:] = ~np.asarray(
                    pc.equal(ks.slice(1), ks.slice(0, len(ks) - 1))
                    .to_numpy(zero_copy_only=False),
                    bool,
                )
            starts = np.flatnonzero(run_start)
            counts = np.diff(np.append(starts, len(ks)))
            uniq = ks.take(pa.array(starts))
            side_ref = ray.put(
                (uniq, starts.astype(np.int64), counts.astype(np.int64), rtbl)
            )

            def join_batch(batch: pa.Table) -> pa.Table:
                u, st, ct, rt = cached_object(side_ref)
                lk = batch[left_key_col].combine_chunks()
                m = pc.index_in(lk, u)
                valid = np.asarray(
                    m.is_valid().to_numpy(zero_copy_only=False), bool
                )
                lidx = np.flatnonzero(valid)
                uidx = np.asarray(
                    pc.fill_null(m, 0).to_numpy(zero_copy_only=False),
                    np.int64,
                )[lidx]
                cnts = ct[uidx]
                li = np.repeat(lidx, cnts)
                ri = _ranges_concat(st[uidx], cnts)
                out = {left_key_col: lk.take(pa.array(li))}
                for c in left_cols:
                    out[c] = batch[c].combine_chunks().take(pa.array(li))
                ria = pa.array(ri)
                for c in right_cols:
                    out[c] = rt[c].combine_chunks().take(ria)
                return pa.table(out)

        else:
            rk = _int64_col(tbl[right_key_col])
            order = np.argsort(rk, kind="stable")
            rtbl = tbl.take(pa.array(order)).combine_chunks()
            side_ref = ray.put((rk[order], rtbl))

            def join_batch(batch: pa.Table) -> pa.Table:
                rk_sorted, rt = cached_object(side_ref)
                lk = _int64_col(batch[left_key_col])
                li, ri = _inner_match(lk, rk_sorted)
                out = {
                    left_key_col: batch[left_key_col].combine_chunks().take(
                        pa.array(li)
                    )
                }
                for c in left_cols:
                    out[c] = batch[c].combine_chunks().take(pa.array(li))
                ria = pa.array(ri)
                for c in right_cols:
                    out[c] = rt[c].combine_chunks().take(ria)
                return pa.table(out)

        res = left_ds.map_batches(join_batch, batch_format="pyarrow")
    else:
        P = _stage_parts(n_parts)
        ltypes = dict(zip(lschema.names, lschema.types))
        rtypes = dict(zip(rschema.names, rschema.types))

        def mk_left(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {
                "k": batch[left_key_col],
                "side": pa.array(np.ones(n, dtype=np.int8)),
            }
            for c in left_cols:
                cols[c] = batch[c]
            for c in right_cols:
                cols[c] = pa.nulls(n, rtypes[c])
            cols["part"] = pa.array(_key_parts(batch[left_key_col], P))
            return pa.table(cols)

        def mk_right(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {
                "k": batch[right_key_col],
                "side": pa.array(np.zeros(n, dtype=np.int8)),
            }
            for c in left_cols:
                cols[c] = pa.nulls(n, ltypes[c])
            for c in right_cols:
                cols[c] = batch[c]
            cols["part"] = pa.array(_key_parts(batch[right_key_col], P))
            return pa.table(cols)

        union = left_ds.map_batches(mk_left, batch_format="pyarrow").union(
            right_ds.map_batches(mk_right, batch_format="pyarrow")
        )

        def join_part(g: pa.Table) -> pa.Table:
            side = np.asarray(g["side"].to_numpy(zero_copy_only=False), np.int8)
            # strings factorize to codes via one dictionary_encode;
            # equal values share a code, so the int kernel is unchanged
            k = _key_codes(g["k"])
            lpos = np.flatnonzero(side == 1)
            rpos = np.flatnonzero(side == 0)
            empty = {
                left_key_col: pa.array([], g.schema.field("k").type),
                **{c: pa.array([], g.schema.field(c).type) for c in left_cols},
                **{c: pa.array([], g.schema.field(c).type) for c in right_cols},
            }
            if not len(lpos) or not len(rpos):
                return pa.table(empty)
            rk = k[rpos]
            order = np.argsort(rk, kind="stable")
            li, ri = _inner_match(k[lpos], rk[order])
            src_l = pa.array(lpos[li])
            src_r = pa.array(rpos[order[ri]])
            out = {left_key_col: g["k"].combine_chunks().take(src_l)}
            for c in left_cols:
                out[c] = g[c].combine_chunks().take(src_l)
            for c in right_cols:
                out[c] = g[c].combine_chunks().take(src_r)
            return pa.table(out)

        res = _sized_groupby(union, n_parts, join_part)

    if output == "pandas":
        return _sorted_pandas(res, (left_key_col, *left_cols, *right_cols))
    return res


def semi_join(
    left_ds,
    right_ds,
    left_key_col: str,
    right_key_col: str,
    left_cols: tuple[str, ...] = (),
    anti: bool = False,
    mode: str = "auto",
    max_broadcast_rows: int = 20_000_000,
    n_parts: int | None = None,
    output: str = "dataset",
):
    """Semi-join (``anti=False``: left rows whose key EXISTS on the
    right) / anti-join (``anti=True``: left rows whose key does NOT).
    Output columns: (left_key_col, *left_cols), left multiplicity
    preserved, right multiplicity irrelevant.

    "broadcast": the right KEY SET is reduced distributively (per-batch
    unique partials -> bounded driver unique merge), broadcast once,
    and every left batch filters with one membership test (searchsorted
    for int64 keys, Arrow ``is_in`` for string keys) — the
    Bloom-filter-shaped path, except exact. "distributed":
    key-set distinct + membership both run inside one hash-partition
    co-shuffle (no driver state). "auto" picks by ``right_ds.count()``
    (a row-count proxy for the distinct-key bound, like the engine's
    other broadcast switches).

    Null-key rows are dropped from BOTH sides in every mode (incl. anti —
    a null key is never emitted), keeping the distributed kernels
    consistent with the broadcast membership tests."""
    is_anti = bool(anti)
    _check_reserved("semi_join", left_cols)
    # schemas BEFORE the null-filter wrap — a zero-block mapped dataset
    # cannot infer its schema (equi_join's hardening, mirrored here)
    lschema = left_ds.schema()
    rschema = right_ds.schema()
    if rschema is None and lschema is not None:
        # a zero-block right side (e.g. labels of a dup-free corpus) has
        # no schema at all; its key set is EMPTY — substitute a typed
        # empty keys table (key dtype borrowed from the left side, which
        # is what the membership test compares against) so the normal
        # broadcast path runs instead of crashing on schema access
        import ray.data as rd

        ltype = dict(zip(lschema.names, lschema.types))[left_key_col]
        right_ds = rd.from_arrow(
            pa.table({right_key_col: pa.array([], ltype)})
        )
        rschema = right_ds.schema()
    left_ds = _drop_null_keys(left_ds, left_key_col)
    right_ds = _drop_null_keys(right_ds, right_key_col)
    if mode == "auto":
        mode = (
            "broadcast"
            if right_ds.count() <= max_broadcast_rows
            else "distributed"
        )

    str_key = _is_string_key(
        dict(zip(rschema.names, rschema.types))[right_key_col]
    )
    if mode == "broadcast":

        def key_partial(batch: pa.Table) -> pa.Table:
            u = pc.unique(batch[right_key_col].combine_chunks())
            return pa.table({"k": u})

        parts = right_ds.select_columns([right_key_col]).map_batches(
            key_partial, batch_format="pyarrow"
        )
        ptabs = [
            t
            for t in ray.get(parts.to_arrow_refs())
            if "k" in t.column_names
        ]  # empty placeholder blocks can carry a zero-column schema
        from .broadcast import cached_object

        if str_key:
            merged = (
                pa.concat_tables(ptabs, promote_options="default")
                if ptabs
                else pa.table({"k": pa.array([], pa.string())})
            )
            keys_ref = ray.put(pc.unique(merged["k"].combine_chunks()))

            def filt(batch: pa.Table) -> pa.Table:
                ks = cached_object(keys_ref)
                member = np.asarray(
                    pc.is_in(
                        batch[left_key_col].combine_chunks(), value_set=ks
                    ).to_numpy(zero_copy_only=False),
                    bool,
                )
                keep = ~member if is_anti else member
                sel = batch.select([left_key_col, *left_cols])
                return sel.filter(pa.array(keep))

        else:
            keys = np.unique(
                np.concatenate(
                    [_int64_col(t["k"]) for t in ptabs]
                    or [np.empty(0, dtype=np.int64)]
                )
            )
            keys_ref = ray.put(keys)

            def filt(batch: pa.Table) -> pa.Table:
                ks = cached_object(keys_ref)
                lk = _int64_col(batch[left_key_col])
                pos = np.searchsorted(ks, lk)
                pos_c = np.minimum(pos, max(len(ks) - 1, 0))
                member = (
                    (ks[pos_c] == lk) if len(ks) else np.zeros(len(lk), bool)
                )
                keep = ~member if is_anti else member
                sel = batch.select([left_key_col, *left_cols])
                return sel.filter(pa.array(keep))

        res = left_ds.map_batches(filt, batch_format="pyarrow")
    else:
        P = _stage_parts(n_parts)
        ltypes = dict(zip(lschema.names, lschema.types))

        def mk_left(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {
                "k": batch[left_key_col],
                "side": pa.array(np.ones(n, dtype=np.int8)),
                **{c: batch[c] for c in left_cols},
                "part": pa.array(_key_parts(batch[left_key_col], P)),
            }
            return pa.table(cols)

        def mk_right(batch: pa.Table) -> pa.Table:
            u = pc.unique(batch[right_key_col].combine_chunks())
            n = len(u)
            cols = {
                "k": u,
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                **{c: pa.nulls(n, ltypes[c]) for c in left_cols},
                "part": pa.array(_key_parts(u, P)),
            }
            return pa.table(cols)

        union = left_ds.map_batches(mk_left, batch_format="pyarrow").union(
            right_ds.select_columns([right_key_col]).map_batches(
                mk_right, batch_format="pyarrow"
            )
        )

        def filt_part(g: pa.Table) -> pa.Table:
            side = np.asarray(g["side"].to_numpy(zero_copy_only=False), np.int8)
            # codes factorize strings exactly; ints pass through
            k = _key_codes(g["k"])
            lpos = np.flatnonzero(side == 1)
            rk = np.unique(k[side == 0])
            sel = g.select(["k", *left_cols]).rename_columns(
                [left_key_col, *left_cols]
            )
            if not len(lpos):
                return sel.slice(0, 0)
            lk = k[lpos]
            pos = np.searchsorted(rk, lk)
            pos_c = np.minimum(pos, max(len(rk) - 1, 0))
            member = (
                (rk[pos_c] == lk) if len(rk) else np.zeros(len(lk), bool)
            )
            keep = ~member if is_anti else member
            return sel.take(pa.array(lpos[keep]))

        res = _sized_groupby(union, n_parts, filt_part)

    if output == "pandas":
        return _sorted_pandas(res, (left_key_col, *left_cols))
    return res


def interval_join(
    ds,
    key_col: str,
    ts_col: str,
    id_col: str,
    max_gap_us: int,
    n_parts: int | None = None,
    output: str = "dataset",
):
    """Temporal self-join: all ordered pairs (a, b) with the same key,
    a before b under (ts, id) ordering, and ``ts_b - ts_a <= max_gap_us``
    (equal-ts pairs emit once, ordered by id). Output columns
    (a, b, gap_us), all int64.

    One hash-partition keyed groupby; each partition lexsorts by
    (key, ts, id), rebases timestamps onto a per-key-run composite axis
    (run ordinal x (span + gap + 1) — strictly sorted across runs, so a
    SINGLE global searchsorted finds every row's window end without
    per-key Python), and emits pairs with the repeat/arange range
    expansion. Falls back to a per-run loop only if the composite would
    overflow int64 (astronomical span x key-count — raise n_parts)."""
    P = _stage_parts(n_parts)
    gap = int(max_gap_us)
    # null key/ts rows can't satisfy the pair predicate — drop (join
    # null semantics); null ids raise (they're outputs, and the int64
    # cast would silently corrupt them)
    ds = _drop_null_keys(ds, key_col, ts_col)

    def add_part(batch: pa.Table) -> pa.Table:
        k = _int64_col(batch[key_col])
        return pa.table(
            {
                "k": batch[key_col],
                "t": batch[ts_col],
                "i": _nonull(batch[id_col], id_col, "interval_join"),
                "part": pa.array(
                    (_hash64(k) % np.uint64(P)).astype(np.int64)
                ),
            }
        )

    def pairs_part(g: pa.Table) -> pa.Table:
        k = _int64_col(g["k"])
        t = _ts_int64(g["t"].combine_chunks())
        ii = _int64_col(g["i"])
        n = len(k)
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "gap_us": pa.array([], pa.int64()),
            }
        )
        if n < 2:
            return empty
        order = np.lexsort((ii, t, k))
        ks, ts, ids = k[order], t[order], ii[order]
        idx = np.arange(n, dtype=np.int64)
        key_start = np.ones(n, dtype=bool)
        key_start[1:] = ks[1:] != ks[:-1]
        run_first = np.maximum.accumulate(np.where(key_start, idx, 0))
        rel = ts - ts[run_first]  # >= 0, ascending within each run
        span = int(rel.max()) if n else 0
        base = span + gap + 1
        run_ord = np.cumsum(key_start) - 1
        n_runs = int(run_ord[-1]) + 1
        if base > 0 and n_runs < (2**62) // base:
            shifted = rel + run_ord * base
            hi = np.searchsorted(shifted, shifted + gap, "right")
        else:  # pragma: no cover - astronomical span x key-count
            hi = np.empty(n, dtype=np.int64)
            starts = np.flatnonzero(key_start)
            ends = np.append(starts[1:], n)
            for s, e in zip(starts, ends):
                hi[s:e] = s + np.searchsorted(ts[s:e], ts[s:e] + gap, "right")
        counts = hi - idx - 1
        a_pos = np.repeat(idx, counts)
        b_pos = _ranges_concat(idx + 1, counts)
        return pa.table(
            {
                "a": pa.array(ids[a_pos], pa.int64()),
                "b": pa.array(ids[b_pos], pa.int64()),
                "gap_us": pa.array(ts[b_pos] - ts[a_pos], pa.int64()),
            }
        )

    res = _sized_groupby(
        ds.map_batches(add_part, batch_format="pyarrow"), n_parts, pairs_part
    )
    if output == "pandas":
        return _sorted_pandas(res, ("a", "b", "gap_us"))
    return res
