"""Table profiling — the data-quality primitive for pipeline intake:
per-column row count, null count, and EXACT distinct count in ONE pass.

Scale shape: a single ``map_batches`` pass emits two digest kinds per
block — per-column (n, n_null) count rows, and per-column DISTINCT
values (nulls excluded, ints canonicalized to decimal strings so one
string column carries every profiled type; distinctness is preserved
exactly). Distinct values travel the shuffle deduped per block; one
hash-partition keyed groupby merges both kinds. The per-partition merge
loops over COLUMNS (bounded by schema width, never by data) and counts
distincts with one Arrow ``count_distinct`` kernel each. Only
``n_columns`` rows ever reach the driver.

Reference scope note: PolyFuzz has no profiling surface; part of the
large-scale-pipeline extension set (SURVEY §8).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray


def profile_table(
    ds,
    columns: tuple[str, ...],
    n_parts: int | None = None,
    driver_merge_max_rows: int = 2_000_000,
):
    """Profile ``columns`` (int or string typed): returns pandas
    (col, n_rows, n_null, ndv) sorted by column name — intentionally
    small. Below ``driver_merge_max_rows`` total digest rows the merge
    runs on the driver (the bounded-merge landmark — a Ray groupby
    costs ~8 s of overhead at digest volumes); above it, one keyed
    groupby merges per hash partition. Both paths value-identical."""
    import pandas as pd

    cols = list(columns)
    P = n_parts if n_parts is not None else max(
        8, int(ray.cluster_resources().get("CPU", 8)) * 2
    )
    idx_of = {c: i for i, c in enumerate(cols)}

    def digest(batch: pa.Table) -> pa.Table:
        out_cid, out_kind, out_n, out_nn, out_v = [], [], [], [], []
        for c in cols:
            arr = batch[c].combine_chunks()
            n = len(arr)
            nn = arr.null_count
            out_cid.append(np.full(1, idx_of[c], dtype=np.int64))
            out_kind.append(np.zeros(1, dtype=np.int64))
            out_n.append(np.full(1, n, dtype=np.int64))
            out_nn.append(np.full(1, nn, dtype=np.int64))
            out_v.append(pa.nulls(1, pa.string()))
            vals = arr.drop_null()
            if not pa.types.is_string(vals.type) and not pa.types.is_large_string(
                vals.type
            ):
                vals = vals.cast(pa.string())
            u = pc.unique(vals)
            k = len(u)
            out_cid.append(np.full(k, idx_of[c], dtype=np.int64))
            out_kind.append(np.ones(k, dtype=np.int64))
            out_n.append(np.zeros(k, dtype=np.int64))
            out_nn.append(np.zeros(k, dtype=np.int64))
            out_v.append(u.cast(pa.string()))
        cid = np.concatenate(out_cid)
        return pa.table(
            {
                "cid": pa.array(cid),
                "kind": pa.array(np.concatenate(out_kind)),
                "n": pa.array(np.concatenate(out_n)),
                "nn": pa.array(np.concatenate(out_nn)),
                "v": pa.concat_arrays(out_v),
                "part": pa.array(cid % P),
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
    if parts.count() <= driver_merge_max_rows:
        tabs = ray.get(parts.to_arrow_refs())
        allt = pa.concat_tables(tabs, promote_options="default")
        outp = merge(allt).to_pandas()
    else:
        res = parts.groupby("part").map_groups(
            merge, batch_format="pyarrow"
        )
        outp = res.to_pandas()
    outp["col"] = outp["cid"].map({v: k for k, v in idx_of.items()})
    return pd.DataFrame(
        outp[["col", "n_rows", "n_null", "ndv"]]
        .sort_values("col")
        .reset_index(drop=True)
    )
