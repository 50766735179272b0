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

import ray


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
    P = n_parts if n_parts is not None else max(
        8, int(ray.cluster_resources().get("CPU", 8)) * 2
    )
    payload = tuple(right_payload_cols)
    rschema = right_ds.schema()  # Ray Data Schema: names + pyarrow types
    _rtypes = dict(zip(rschema.names, rschema.types))
    payload_types = {c: _rtypes[c] for c in payload}

    def left_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {
            "k": batch[key_col],
            "t": batch[ts_col],
            "side": pa.array(np.ones(n, dtype=np.int8)),
            "lid": batch[left_id_col],
            "rid": pa.array(np.full(n, -1, dtype=np.int64)),
        }
        for c in payload:
            cols[c] = pa.nulls(n, payload_types[c])
        k = np.asarray(batch[key_col].to_numpy(zero_copy_only=False), np.int64)
        cols["part"] = pa.array((k % P).astype(np.int64))
        return pa.table(cols)

    def right_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {
            "k": batch[key_col],
            "t": batch[ts_col],
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "lid": pa.array(np.full(n, -1, dtype=np.int64)),
            "rid": batch[right_id_col],
        }
        for c in payload:
            cols[c] = batch[c]
        k = np.asarray(batch[key_col].to_numpy(zero_copy_only=False), np.int64)
        cols["part"] = pa.array((k % P).astype(np.int64))
        return pa.table(cols)

    union = left_ds.map_batches(left_rows, batch_format="pyarrow").union(
        right_ds.map_batches(right_rows, batch_format="pyarrow")
    )

    is_strict = bool(strict)

    def merge_part(g: pa.Table) -> pa.Table:
        k = np.asarray(g["k"].to_numpy(zero_copy_only=False), np.int64)
        t = _ts_int64(g["t"].combine_chunks())
        side = np.asarray(g["side"].to_numpy(zero_copy_only=False), np.int8)
        lid = np.asarray(g["lid"].to_numpy(zero_copy_only=False), np.int64)
        rid = np.asarray(g["rid"].to_numpy(zero_copy_only=False), np.int64)
        empty_cols = {
            left_id_col: pa.array([], g.schema.field("lid").type),
            right_id_col: pa.array([], g.schema.field("rid").type),
            **{c: pa.array([], g.schema.field(c).type) for c in payload},
        }
        if not len(k):
            return pa.table(empty_cols)
        is_right = side == 0
        # at equal (key, ts): rights before lefts (<= admits them); strict
        # reverses so lefts cannot see equal-ts rights. Rights at equal
        # (key, ts) order by rid asc so the LAST one is the max id.
        side_order = np.where(is_right, 1, 0) if is_strict else np.where(is_right, 0, 1)
        tie_id = np.where(is_right, rid, np.int64(0))
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
        out = {
            left_id_col: g["lid"].combine_chunks().take(pa.array(src_left)),
            right_id_col: g["rid"].combine_chunks().take(pa.array(src_right)),
        }
        for c in payload:
            out[c] = g[c].combine_chunks().take(pa.array(src_right))
        return pa.table(out)

    res = union.groupby("part").map_groups(merge_part, batch_format="pyarrow")
    if output == "pandas":
        out = res.to_pandas()
        return out.sort_values(
            [left_id_col, right_id_col], ignore_index=True
        )
    return res
