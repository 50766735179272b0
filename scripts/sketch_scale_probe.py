#!/usr/bin/env python
"""Scale probe for the approximate-distinct sketches and the per-key
token budget (round-5 third session): times each op at TWO volumes
(10M and 40M rows by default) on a deterministic synthetic int table —
a super-linear stage shows as a wall ratio well above the 4x data
ratio. Also runs EXACT group_ndistinct on the same inputs: the point of
the sketches is that their digest is bounded (k rows / 2^p registers
per key) while the exact op's digest is the full distinct set, so the
gap should WIDEN with cardinality.

Table shape (seed 17): 64 int64 keys, values drawn uniformly from
[0, rows/2) so per-key distinct counts grow linearly with volume
(~86% of the draw space is hit). cap_tokens_per_key runs on the same
rows with a synthetic precomputed token count (token_col path) and a
scalar budget sized to keep ~500 docs/key — the digest is then
budget-bounded regardless of volume.

Usage: python scripts/sketch_scale_probe.py [--rows 40000000]
Prints one JSON line; results recorded in BASELINE.md round 5.
"""
from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = "/tmp/raylink_sketch_probe"
CHUNK = 1_000_000


def synthesize(n_rows: int, seed: int = 17) -> str:
    out = os.path.join(ROOT, f"ints-n{n_rows}-s{seed}-k64")
    done = os.path.join(out, ".complete")
    if os.path.exists(done):
        return out
    tmp = f"{out}.tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(0, n_rows, CHUNK):
        n = min(CHUNK, n_rows - i)
        ids = np.arange(i, i + n, dtype=np.int64)
        t = pa.table(
            {
                "key": pa.array(rng.integers(0, 64, n).astype(np.int64)),
                "val": pa.array(
                    rng.integers(0, n_rows // 2, n).astype(np.int64)
                ),
                "id": pa.array(ids),
                "prio": pa.array(rng.integers(0, 1 << 30, n).astype(np.int64)),
                "ntok": pa.array(rng.integers(1, 20, n).astype(np.int64)),
            }
        )
        pq.write_table(t, os.path.join(tmp, f"part-{i // CHUNK:05d}.parquet"))
    with open(os.path.join(tmp, ".complete"), "w") as f:
        f.write("ok")
    os.rename(tmp, out)
    return out


def main():
    n_big = 40_000_000
    for a in sys.argv[1:]:
        if a.startswith("--rows"):
            n_big = (
                int(sys.argv[sys.argv.index(a) + 1])
                if a == "--rows"
                else int(a.split("=")[1])
            )
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=32,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from raylink.workers import ensure_workers_can_import

    ensure_workers_can_import()  # probe must run from any cwd
    from raylink.aggs import (
        approx_ndistinct_hll,
        approx_ndistinct_kmv,
        approx_quantiles_log,
        frequent_items,
        group_ndistinct,
        group_quantiles,
        heavy_hitters,
    )
    from raylink.packing import cap_tokens_per_key

    path = synthesize(n_big)
    files = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    n_small_files = max(1, len(files) // 4)
    n_small = n_small_files * CHUNK
    res = {
        "metric": "sketch_scale_probe",
        "rows_small": n_small,
        "rows_big": n_big,
    }
    for label, fl in (("small", files[:n_small_files]), ("big", files)):
        res[label] = {}
        for op, cols, thunk in (
            (
                "group_ndistinct_exact",
                ["key", "val"],
                lambda d: group_ndistinct(d, "key", "val").count(),
            ),
            (
                "approx_ndistinct_kmv",
                ["key", "val"],
                lambda d: approx_ndistinct_kmv(d, "key", "val", k=256).count(),
            ),
            (
                "approx_ndistinct_hll",
                ["key", "val"],
                lambda d: approx_ndistinct_hll(d, "key", "val", p=12).count(),
            ),
            # heavy-value detection on the NEAR-UNIQUE val column:
            # heavy_hitters ships the full per-block distinct census
            # (~rows), frequent_items ships <= k-1 candidates per block
            # (none qualify at k=16 on this uniform draw — the honest
            # empty answer with a constant-size digest)
            (
                "heavy_hitters_census",
                ["val"],
                lambda d: len(heavy_hitters(d, "val", top_n=15)),
            ),
            (
                "frequent_items_bounded",
                ["val"],
                lambda d: len(frequent_items(d, "val", k=16)),
            ),
            (
                "group_quantiles_exact",
                ["key", "val"],
                lambda d: group_quantiles(d, "key", "val").count(),
            ),
            (
                "approx_quantiles_log",
                ["key", "val"],
                lambda d: approx_quantiles_log(d, "key", "val").count(),
            ),
            (
                "cap_tokens_per_key",
                ["key", "id", "prio", "ntok"],
                lambda d: cap_tokens_per_key(
                    d,
                    "key",
                    "id",
                    "ntok",
                    5_000,
                    order_col="prio",
                    token_col="ntok",
                ).count(),
            ),
        ):
            walls, rows = [], 0
            for _ in range(3):  # big-volume rep 0 pays plasma first-touch
                ds = rd.read_parquet(fl, columns=cols)
                t0 = time.perf_counter()
                rows = thunk(ds)
                walls.append(round(time.perf_counter() - t0, 2))
            res[label][op] = {"sec": min(walls), "rows": rows, "walls": walls}
    res["big_over_small_wall_ratio"] = {
        op: round(res["big"][op]["sec"] / res["small"][op]["sec"], 2)
        for op in res["small"]
    }
    print(json.dumps(res))
    ray.shutdown()


if __name__ == "__main__":
    main()
