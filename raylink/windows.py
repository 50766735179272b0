"""Session windows over keyed event streams — the gap-based complement to
the tumbling-window aggregate in queries.q_event_windows.

``sessionize``: per key, order events by (ts, id) and start a new session
whenever the gap to the previous event exceeds ``gap_us``. Emits one row
per event with its 0-based per-key ``session_idx``. ``session_stats``
shares the same shuffle and emits one row per session (n_events,
start_us, end_us, duration_us — all int64, summation-order-proof).

Ray-Data-first shape (same as joins.asof_join): derive a hash partition
inside ``map_batches`` (integer key mod P), ONE keyed groupby — per-group
Python is O(partitions), never O(keys) — then a single vectorized pass
per partition: lexsort by (key, ts, id), gap mask, cumsum session
ordinals, ``np.maximum.accumulate`` to rebase ordinals per key run. A
partition holds every row of its keys, so per-partition results are
globally correct. No per-row or per-key Python anywhere.

Reference scope note: PolyFuzz has no windowing surface; this is part of
the large-scale-pipeline extension set (SURVEY §8), alongside
dedup/ANN/textstats.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from .blocking import _hash64
from .joins import (
    _key_codes,
    _key_parts,
    _nonull,
    _sized_groupby,
    _sorted_pandas,
    _stage_parts,
    _ts_int64,
    typed_to_pandas,
)


def _check_out_names(op: str, user_cols, generated) -> None:
    """Input column names colliding with an op's generated output or
    staging columns would silently overwrite (dict-keyed table builds)
    or break the groupby on a duplicate 'part' — collide loudly instead
    (the joins' _check_reserved policy, applied to the window family)."""
    bad = sorted(set(user_cols) & set(generated))
    if bad:
        raise ValueError(
            f"{op}: input column name(s) {bad} collide with generated "
            "output/staging columns — rename upstream"
        )


def _sorted_session_arrays(g: pa.Table, key_col, ts_col, id_col, gap_us):
    """Common partition kernel: sort and derive per-row session ordinals.

    Returns (order, ks, ts, sidx, new) — ``order`` indexes into ``g``,
    arrays are in sorted order, ``sidx`` is the 0-based session index
    within each key run, ``new`` marks session starts. Nulls in any of
    the three columns reject loudly (the int64 cast would silently map
    them to INT64_MIN via a float64 round-trip that also corrupts values
    above 2^53 — the windows null policy is loud rejection, matching the
    value-column checks)."""
    k = np.asarray(
        _nonull(g[key_col], key_col, "windows").to_numpy(
            zero_copy_only=False
        ),
        np.int64,
    )
    t = _ts_int64(_nonull(g[ts_col], ts_col, "windows"))
    i = np.asarray(
        _nonull(g[id_col], id_col, "windows").to_numpy(
            zero_copy_only=False
        ),
        np.int64,
    )
    order = np.lexsort((i, t, k))
    ks, ts, _ = k[order], t[order], i[order]
    new = np.ones(len(ks), dtype=bool)
    new[1:] = (ks[1:] != ks[:-1]) | ((ts[1:] - ts[:-1]) > gap_us)
    gsid = np.cumsum(new) - 1  # global session ordinal within the partition
    key_start = np.ones(len(ks), dtype=bool)
    key_start[1:] = ks[1:] != ks[:-1]
    # rebase to a per-key 0-based index: gsid at the key's first row,
    # forward-filled (gsid is nondecreasing, so max-accumulate fills runs)
    base = np.maximum.accumulate(np.where(key_start, gsid, 0))
    sidx = gsid - base
    return order, ks, ts, sidx, new


def _partitioned(ds, key_col: str, n_parts: int | None):
    P = _stage_parts(n_parts)

    def add_part(batch: pa.Table) -> pa.Table:
        k = np.asarray(
            _nonull(batch[key_col], key_col, "windows").to_numpy(
                zero_copy_only=False
            ),
            np.int64,
        )
        return batch.append_column(
            "part", pa.array((_hash64(k) % np.uint64(P)).astype(np.int64))
        )

    return ds.map_batches(add_part, batch_format="pyarrow")


def sessionize(
    ds,
    key_col: str,
    ts_col: str,
    id_col: str,
    gap_us: int,
    n_parts: int | None = None,
    output: str = "dataset",
):
    """Per-event session assignment: one output row per input row with
    columns (key_col, id_col, session_idx). Integer key and id columns;
    ts may be timestamp or int64 microseconds."""
    _check_out_names(
        "sessionize", (key_col, ts_col, id_col), ("session_idx", "part")
    )
    parts = _partitioned(ds.select_columns([key_col, ts_col, id_col]), key_col, n_parts)

    def assign(g: pa.Table) -> pa.Table:
        if not g.num_rows:
            return pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    "session_idx": pa.array([], pa.int64()),
                }
            )
        order, ks, _, sidx, _ = _sorted_session_arrays(
            g, key_col, ts_col, id_col, gap_us
        )
        return pa.table(
            {
                key_col: pa.array(ks),
                id_col: g[id_col].combine_chunks().take(pa.array(order)),
                "session_idx": pa.array(sidx.astype(np.int64)),
            }
        )

    res = _sized_groupby(parts, n_parts, assign)
    if output == "pandas":
        return _sorted_pandas(res, (key_col, id_col))
    return res


def session_stats(
    ds,
    key_col: str,
    ts_col: str,
    id_col: str,
    gap_us: int,
    n_parts: int | None = None,
    output: str = "dataset",
):
    """One row per session: (key_col, session_idx, n_events, start_us,
    end_us, duration_us), all int64. Computed inside the same single
    shuffle as ``sessionize`` — session boundaries are partition-local
    because a partition holds every row of its keys."""
    _check_out_names(
        "session_stats",
        (key_col, ts_col, id_col),
        ("session_idx", "n_events", "start_us", "end_us", "duration_us",
         "part"),
    )
    parts = _partitioned(ds.select_columns([key_col, ts_col, id_col]), key_col, n_parts)

    def stats(g: pa.Table) -> pa.Table:
        if not g.num_rows:
            return pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    "session_idx": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "start_us": pa.array([], pa.int64()),
                    "end_us": pa.array([], pa.int64()),
                    "duration_us": pa.array([], pa.int64()),
                }
            )
        _, ks, ts, sidx, new = _sorted_session_arrays(
            g, key_col, ts_col, id_col, gap_us
        )
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(ks)) - 1
        return pa.table(
            {
                key_col: pa.array(ks[starts]),
                "session_idx": pa.array(sidx[starts].astype(np.int64)),
                "n_events": pa.array((ends - starts + 1).astype(np.int64)),
                "start_us": pa.array(ts[starts].astype(np.int64)),
                "end_us": pa.array(ts[ends].astype(np.int64)),
                "duration_us": pa.array((ts[ends] - ts[starts]).astype(np.int64)),
            }
        )

    res = _sized_groupby(parts, n_parts, stats)
    if output == "pandas":
        return _sorted_pandas(res, (key_col, "session_idx"))
    return res


def hopping_windows(
    ds,
    key_col: str,
    ts_col: str,
    size_us: int,
    hop_us: int,
    value_col: str | None = None,
    value_scale: int = 100,
    output: str = "dataset",
    driver_merge_max_rows: int = 2_000_000,
):
    """Hopping (sliding) windows: every event lands in the
    ``size_us / hop_us`` windows [start, start + size) whose starts are
    hop-aligned — the overlapping-window complement to the tumbling
    aggregate (q_event_windows) and gap sessions (sessionize).
    ``size_us`` must be a multiple of ``hop_us``.

    The expansion happens INSIDE ``map_batches`` (rows repeat m times
    with window starts derived by integer division — no per-row Python),
    then the per-block (key, window) digests reduce through the shared
    bounded digest merge (aggs._digest_merge: driver concat below the
    bound, hash-partition keyed groupby above). A native Ray
    groupby([key, win]).aggregate here cost 110 s at 2.5M events (the
    sort shuffle orders every digest row by the composite key); the
    digest merge is the same one-exchange shape the other aggs use.
    Counts and value sums stay exact integers (``value_col`` quantized
    by ``value_scale`` — float sums are summation-order noise). Output:
    (key_col, win_start_us, n_events[, sum_value_scaled])."""
    from raylink.aggs import _default_parts, _digest_merge
    from raylink.blocking import _hash64

    _check_out_names(
        "hopping_windows",
        (key_col, ts_col) + ((value_col,) if value_col is not None else ()),
        ("win_start_us", "n_events", "sum_value_scaled", "n_partial",
         "vq", "part"),
    )
    P = _default_parts(None)
    size, hop = int(size_us), int(hop_us)
    if size <= 0 or hop <= 0 or size % hop:
        raise ValueError("size_us must be a positive multiple of hop_us")
    m = size // hop

    def expand(batch: pa.Table) -> pa.Table:
        # expansion AND partial (key, window) aggregation in one batch
        # pass — the groupby then shuffles per-block digests (distinct
        # (key, window) pairs), never the m-times-expanded rows
        t = _ts_int64(_nonull(batch[ts_col], ts_col, "hopping_windows"))
        n = len(t)
        q = np.floor_divide(t, hop)
        j = np.tile(np.arange(m, dtype=np.int64), n)
        starts = (np.repeat(q, m) - j) * hop
        keys = np.repeat(
            np.asarray(
                _nonull(
                    batch[key_col], key_col, "hopping_windows"
                ).to_numpy(zero_copy_only=False),
                np.int64,
            ),
            m,
        )
        if value_col is not None:
            import pyarrow.compute as pc

            vcol = batch[value_col].combine_chunks()
            if vcol.null_count:
                # loud rejection: NaN would unsafe-cast to INT64_MIN and
                # silently corrupt the window sums
                raise ValueError(
                    f"hopping_windows value column {value_col!r} contains nulls"
                )
            vq = np.repeat(
                np.asarray(
                    pc.round(pc.multiply(vcol, float(value_scale)))
                    .cast(pa.int64())
                    .to_numpy(zero_copy_only=False),
                    np.int64,
                ),
                m,
            )
        order = np.lexsort((starts, keys))
        ks, ws = keys[order], starts[order]
        first = np.ones(len(ks), dtype=bool)
        first[1:] = (ks[1:] != ks[:-1]) | (ws[1:] != ws[:-1])
        run_starts = np.flatnonzero(first)
        cnt = np.diff(np.append(run_starts, len(ks)))
        kk, ww = ks[run_starts], ws[run_starts]
        cols = {
            key_col: pa.array(kk),
            "win_start_us": pa.array(ww),
            "n_partial": pa.array(cnt.astype(np.int64)),
            "part": pa.array(
                ((_hash64(kk) ^ _hash64(ww)) % np.uint64(P)).astype(np.int64)
            ),
        }
        if value_col is not None:
            cols["vq"] = pa.array(
                np.add.reduceat(vq[order], run_starts)
                if len(ks)
                else np.empty(0, dtype=np.int64)
            )
        return pa.table(cols)

    has_val = value_col is not None

    def merge(g: pa.Table) -> pa.Table:
        kk = np.asarray(g[key_col].to_numpy(zero_copy_only=False), np.int64)
        ww = np.asarray(
            g["win_start_us"].to_numpy(zero_copy_only=False), np.int64
        )
        cc = np.asarray(
            g["n_partial"].to_numpy(zero_copy_only=False), np.int64
        )
        empty = {
            key_col: pa.array([], pa.int64()),
            "win_start_us": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
        }
        if has_val:
            empty["sum_value_scaled"] = pa.array([], pa.int64())
        if not len(kk):
            return pa.table(empty)
        order = np.lexsort((ww, kk))
        kk, ww, cc = kk[order], ww[order], cc[order]
        first = np.ones(len(kk), dtype=bool)
        first[1:] = (kk[1:] != kk[:-1]) | (ww[1:] != ww[:-1])
        starts = np.flatnonzero(first)
        cols = {
            key_col: pa.array(kk[starts]),
            "win_start_us": pa.array(ww[starts]),
            "n_events": pa.array(np.add.reduceat(cc, starts).astype(np.int64)),
        }
        if has_val:
            vv = np.asarray(
                g["vq"].to_numpy(zero_copy_only=False), np.int64
            )[order]
            cols["sum_value_scaled"] = pa.array(
                np.add.reduceat(vv, starts).astype(np.int64)
            )
        return pa.table(cols)

    res = _digest_merge(
        ds.map_batches(expand, batch_format="pyarrow"),
        merge,
        driver_merge_max_rows,
    )
    if output == "pandas":
        return (
            typed_to_pandas(res)
            .sort_values([key_col, "win_start_us"])
            .reset_index(drop=True)
        )
    return res


def rolling_window(
    ds,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    window: int,
    value_scale: int = 100,
    n_parts: int | None = None,
    output: str = "dataset",
):
    """Per-key rolling aggregate over the last ``window`` events under
    (ts, id) ordering — the feature-engineering primitive ("sum/mean of
    the user's last k events"). Values quantize to integer units
    (``value_scale``) so the rolling sums are exact; emits one row per
    event: (id_col, key_col, n_in_window, roll_sum_scaled).

    One keyed co-shuffle (sessionize's shape); the per-partition kernel
    is a lexsort + ONE cumulative sum with per-key-run rebasing — the
    rolling sum is cum[i] - cum[i - window] clamped at each key run's
    start, no per-key Python."""
    _check_out_names(
        "rolling_window",
        (key_col, ts_col, id_col, value_col),
        ("n_in_window", "roll_sum_scaled", "part"),
    )
    sel = ds.map_batches(
        lambda b: pa.table(
            {
                key_col: b[key_col],
                ts_col: b[ts_col],
                id_col: b[id_col],
                value_col: b[value_col],
            }
        ),
        batch_format="pyarrow",
    )
    parts = _partitioned(sel, key_col, n_parts)
    w = int(window)
    if w <= 0:
        raise ValueError("window must be positive")
    scale = float(value_scale)

    def roll(g: pa.Table) -> pa.Table:
        k = np.asarray(
            _nonull(g[key_col], key_col, "rolling_window").to_numpy(
                zero_copy_only=False
            ),
            np.int64,
        )
        t = _ts_int64(_nonull(g[ts_col], ts_col, "rolling_window"))
        i = np.asarray(
            _nonull(g[id_col], id_col, "rolling_window").to_numpy(
                zero_copy_only=False
            ),
            np.int64,
        )
        if g[value_col].null_count:
            raise ValueError(
                f"rolling_window value column {value_col!r} contains nulls"
            )
        v = np.asarray(
            g[value_col].to_numpy(zero_copy_only=False), np.float64
        )
        if len(v) and not np.isfinite(v).all():
            # non-null NaN/inf would np.rint -> astype(int64) to
            # INT64_MIN silently, poisoning every rolling sum in the
            # key's window range; hopping_windows' Arrow cast raises on
            # the same input — align the siblings on loud
            raise ValueError(
                f"rolling_window value column {value_col!r} contains "
                "NaN/inf values"
            )
        n = len(k)
        if not n:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    key_col: pa.array([], pa.int64()),
                    "n_in_window": pa.array([], pa.int64()),
                    "roll_sum_scaled": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((i, t, k))
        ks, ids = k[order], i[order]
        vq = np.rint(v[order] * scale).astype(np.int64)
        idx = np.arange(n, dtype=np.int64)
        key_start = np.ones(n, dtype=bool)
        key_start[1:] = ks[1:] != ks[:-1]
        run_first = np.maximum.accumulate(np.where(key_start, idx, 0))
        cum = np.cumsum(vq)
        # window start position: max(run_first, i - w + 1)
        lo = np.maximum(run_first, idx - w + 1)
        base = np.where(lo > 0, cum[np.maximum(lo - 1, 0)], 0)
        roll_sum = cum - base
        n_in = idx - lo + 1
        return pa.table(
            {
                id_col: pa.array(ids),
                key_col: pa.array(ks),
                "n_in_window": pa.array(n_in),
                "roll_sum_scaled": pa.array(roll_sum),
            }
        )

    res = _sized_groupby(parts, n_parts, roll)
    if output == "pandas":
        return _sorted_pandas(res, (id_col,))
    return res


def lag_deltas(
    ds,
    key_col: str,
    ts_col: str,
    id_col: str,
    n_parts: int | None = None,
    output: str = "dataset",
):
    """Per-key lag: for every event (after the key's first), the id of
    the PREVIOUS event under (ts, id) ordering and the gap to it in
    integer microseconds — inter-arrival features in one co-shuffle.
    Output (id_col, key_col, prev_id, gap_us). Kernel: lexsort + one
    shift, first-of-key rows dropped (SQL LAG semantics)."""
    _check_out_names(
        "lag_deltas", (key_col, ts_col, id_col), ("prev_id", "gap_us", "part")
    )
    sel = ds.map_batches(
        lambda b: pa.table(
            {key_col: b[key_col], ts_col: b[ts_col], id_col: b[id_col]}
        ),
        batch_format="pyarrow",
    )
    parts = _partitioned(sel, key_col, n_parts)

    def lag(g: pa.Table) -> pa.Table:
        k = np.asarray(
            _nonull(g[key_col], key_col, "lag_deltas").to_numpy(
                zero_copy_only=False
            ),
            np.int64,
        )
        t = _ts_int64(_nonull(g[ts_col], ts_col, "lag_deltas"))
        i = np.asarray(
            _nonull(g[id_col], id_col, "lag_deltas").to_numpy(
                zero_copy_only=False
            ),
            np.int64,
        )
        n = len(k)
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                key_col: pa.array([], pa.int64()),
                "prev_id": pa.array([], pa.int64()),
                "gap_us": pa.array([], pa.int64()),
            }
        )
        if n < 2:
            return empty
        order = np.lexsort((i, t, k))
        ks, ts, ids = k[order], t[order], i[order]
        same = ks[1:] == ks[:-1]
        return pa.table(
            {
                id_col: pa.array(ids[1:][same]),
                key_col: pa.array(ks[1:][same]),
                "prev_id": pa.array(ids[:-1][same]),
                "gap_us": pa.array((ts[1:] - ts[:-1])[same]),
            }
        )

    res = _sized_groupby(parts, n_parts, lag)
    if output == "pandas":
        return _sorted_pandas(res, (id_col,))
    return res


def lag_payload(
    ds,
    key_col: str,
    order_col: str,
    payload_cols: tuple[str, ...],
    n_parts: int | None = None,
    output: str = "dataset",
):
    """Per-key previous-row PAYLOAD — SQL ``LAG(col) OVER (PARTITION BY
    key ORDER BY order_col)`` for arbitrary (incl. string) payload
    columns, with string OR int64 keys. Output one row per input row
    that HAS a same-key predecessor: (key_col, order_col, *payload_cols,
    *prev_<payload_cols>).

    Shape: one keyed co-shuffle (string keys partition via the joins
    flat-buffer hash — collisions cost balance, never correctness), then
    per partition one lexsort over exact equality codes + an adjacent
    same-key mask; payloads move via two Arrow takes, never through
    Python objects."""
    _check_out_names(
        "lag_payload",
        (key_col, order_col, *payload_cols),
        {"part"} | {f"prev_{c}" for c in payload_cols},
    )
    cols = [key_col, order_col, *payload_cols]
    sel = ds.select_columns(cols)
    P = _stage_parts(n_parts)

    def add_part(batch: pa.Table) -> pa.Table:
        _nonull(batch[key_col], key_col, "lag_payload")
        return batch.append_column(
            "part", pa.array(_key_parts(batch[key_col], P))
        )

    def lag(g: pa.Table) -> pa.Table:
        codes = _key_codes(g[key_col])
        o = np.asarray(
            _nonull(g[order_col], order_col, "lag_payload").to_numpy(
                zero_copy_only=False
            ),
            np.int64,
        )
        n = len(codes)
        # same column ORDER as the main branch (interleaved c, prev_c) —
        # mismatched per-block layouts break positional Arrow consumers
        out_schema = {key_col: g[key_col].type, order_col: g[order_col].type}
        for c in payload_cols:
            out_schema[c] = g[c].type
            out_schema[f"prev_{c}"] = g[c].type
        if n < 2:
            return pa.table(
                {k: pa.array([], t) for k, t in out_schema.items()}
            )
        order = np.lexsort((o, codes))
        sc, so = codes[order], o[order]
        same = sc[1:] == sc[:-1]
        # loud rejection: duplicate (key, order) pairs would make prev_*
        # depend on Ray's nondeterministic within-partition row order
        if bool(np.any(same & (so[1:] == so[:-1]))):
            raise ValueError(
                f"lag_payload requires unique {order_col!r} values per key"
            )
        cur = pa.array(order[1:][same])
        prev = pa.array(order[:-1][same])
        out = {
            key_col: g[key_col].combine_chunks().take(cur),
            order_col: g[order_col].combine_chunks().take(cur),
        }
        for c in payload_cols:
            col = g[c].combine_chunks()
            out[c] = col.take(cur)
            out[f"prev_{c}"] = col.take(prev)
        return pa.table(out)

    res = _sized_groupby(
        sel.map_batches(add_part, batch_format="pyarrow"), n_parts, lag
    )
    if output == "pandas":
        return _sorted_pandas(res, (key_col, order_col))
    return res
