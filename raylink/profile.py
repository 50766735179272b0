"""Table profiling — the data-quality primitive for pipeline intake:
per-column row count, null count, and EXACT distinct count in ONE pass.

Scale shape: a single ``map_batches`` pass emits two digest kinds per
block — per-column (n, n_null) count rows, and per-column DISTINCT
values (nulls excluded, ints canonicalized to decimal strings so one
string column carries every profiled type; distinctness is preserved
exactly). Distinct values travel the shuffle deduped per block and
partitioned by VALUE hash — identical values always collocate, so each
partition's ``count_distinct`` is disjoint from every other partition's
and the global ndv is the plain SUM of per-partition partials. That
keeps a high-cardinality column's distinct set spread across the whole
shuffle instead of landing on the one partition its column id hashes to
(the former ``cid % P`` layout — a single-partition hotspot once any
profiled column's distinct set outgrows one worker). The shuffle rides
``joins._sized_groupby`` (input-sized partition count, staged at the
fine modulus); only ``n_columns × n_partitions`` partial rows of four
int64s ever reach the driver.

Reference scope note: PolyFuzz has no profiling surface; part of the
large-scale-pipeline extension set (SURVEY §8).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from raylink.joins import _FINE_PARTS, _sized_groupby, _string_part_hash


def profile_table(
    ds,
    columns: tuple[str, ...],
    n_parts: int | None = None,
    driver_merge_max_rows: int = 2_000_000,
    max_driver_merge_bytes: int = 1 << 30,
):
    """Profile ``columns`` (int or string typed): returns pandas
    (col, n_rows, n_null, ndv) sorted by column name — intentionally
    small. Below ``driver_merge_max_rows`` digest rows AND
    ``max_driver_merge_bytes`` digest bytes (distinct values are
    unbounded-length strings — a row-count bound alone could collect
    gigabytes of full-document values; the self_top1 byte-aware
    precedent) the merge runs on the driver (the bounded-merge landmark
    — a Ray groupby costs ~8 s of overhead at digest volumes); above
    either bound, one keyed groupby merges per value-hash partition and
    the driver sums the tiny per-partition partials. Both paths
    value-identical."""
    import pandas as pd

    cols = list(columns)
    P = int(n_parts) if n_parts is not None else _FINE_PARTS
    if P < 1:
        raise ValueError(f"n_parts must be >= 1, got {n_parts}")
    idx_of = {c: i for i, c in enumerate(cols)}

    def digest(batch: pa.Table) -> pa.Table:
        out_cid, out_kind, out_n, out_nn, out_v, out_p = [], [], [], [], [], []
        for c in cols:
            arr = batch[c].combine_chunks()
            n = len(arr)
            nn = arr.null_count
            cid = idx_of[c]
            out_cid.append(np.full(1, cid, dtype=np.int64))
            out_kind.append(np.zeros(1, dtype=np.int64))
            out_n.append(np.full(1, n, dtype=np.int64))
            out_nn.append(np.full(1, nn, dtype=np.int64))
            out_v.append(pa.nulls(1, pa.string()))
            out_p.append(np.full(1, cid % P, dtype=np.int64))
            vals = arr.drop_null()
            if not pa.types.is_string(vals.type) and not pa.types.is_large_string(
                vals.type
            ):
                vals = vals.cast(pa.string())
            u = pc.unique(vals)
            k = len(u)
            out_cid.append(np.full(k, cid, dtype=np.int64))
            out_kind.append(np.ones(k, dtype=np.int64))
            out_n.append(np.zeros(k, dtype=np.int64))
            out_nn.append(np.zeros(k, dtype=np.int64))
            u = u.cast(pa.string())
            out_v.append(u)
            # partition by VALUE hash: duplicates of a value across blocks
            # land in one partition, so per-partition distinct counts are
            # disjoint and sum exactly
            out_p.append(
                (_string_part_hash(u) % np.uint64(P)).astype(np.int64)
            )
        return pa.table(
            {
                "cid": pa.array(np.concatenate(out_cid)),
                "kind": pa.array(np.concatenate(out_kind)),
                "n": pa.array(np.concatenate(out_n)),
                "nn": pa.array(np.concatenate(out_nn)),
                "v": pa.concat_arrays(out_v),
                "part": pa.array(np.concatenate(out_p)),
            }
        )

    def merge(g: pa.Table) -> pa.Table:
        cid = np.asarray(g["cid"].to_numpy(zero_copy_only=False), np.int64)
        kind = np.asarray(g["kind"].to_numpy(zero_copy_only=False), np.int64)
        n = np.asarray(g["n"].to_numpy(zero_copy_only=False), np.int64)
        nn = np.asarray(g["nn"].to_numpy(zero_copy_only=False), np.int64)
        out = {"cid": [], "n_rows": [], "n_null": [], "ndv": []}
        # loop bounded by schema width, not data
        for c in np.unique(cid):
            sel = cid == c
            out["cid"].append(int(c))
            out["n_rows"].append(int(n[sel & (kind == 0)].sum()))
            out["n_null"].append(int(nn[sel & (kind == 0)].sum()))
            vals = g["v"].combine_chunks().filter(
                pa.array(sel & (kind == 1))
            )
            out["ndv"].append(int(pc.count_distinct(vals).as_py()))
        return pa.table(
            {k: pa.array(v, pa.int64()) for k, v in out.items()}
        )

    parts = (
        ds.select_columns(cols)
        .map_batches(digest, batch_format="pyarrow")
        .materialize()
    )
    if (
        parts.count() <= driver_merge_max_rows
        and (parts.size_bytes() or 0) <= max_driver_merge_bytes
    ):
        tabs = ray.get(parts.to_arrow_refs())
        allt = pa.concat_tables(tabs, promote_options="default")
        outp = merge(allt).to_pandas()
    else:
        res = _sized_groupby(parts, n_parts, merge)
        # per-partition partials are disjoint (counts partition by cid,
        # distincts by value hash) — the global answer is a plain sum
        outp = (
            res.to_pandas()
            .groupby("cid", as_index=False)[["n_rows", "n_null", "ndv"]]
            .sum()
        )
    outp["col"] = outp["cid"].map({v: k for k, v in idx_of.items()})
    return pd.DataFrame(
        outp[["col", "n_rows", "n_null", "ndv"]]
        .sort_values("col")
        .reset_index(drop=True)
    )
