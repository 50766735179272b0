#!/usr/bin/env python
"""Scale probe for the PQ family (round-5 sixth session): times
pq_encode (streaming codebook quantization) and pq_topk (ADC top-10 for
32 queries over the CODES table) at two volumes, with brute_force_topk
as the contrast — PQ's point at scale is that query-time scoring reads
16 int64 codes/row instead of 64 floats and does LUT gathers instead of
a corpus matmul.

Corpus: deterministic 64-dim float32 normals (seed 23), synthesized in
250k-row parquet chunks; books fitted ONCE on the first 4096 rows of
the small volume (m=16, k=128 — the fixture config) and shared, so the
encode wall is the apply side only.

Usage: python scripts/pq_scale_probe.py [--rows 10000000]
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

ROOT = "/tmp/raylink_pq_probe"


def synthesize(n_rows: int, seed: int = 23, dim: int = 64) -> str:
    out = os.path.join(ROOT, f"emb-n{n_rows}-s{seed}-d{dim}")
    done = os.path.join(out, ".complete")
    if os.path.exists(done):
        return out
    tmp = f"{out}.tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    rng = np.random.default_rng(seed)
    chunk = 250_000
    for i in range(0, n_rows, chunk):
        n = min(chunk, n_rows - i)
        mat = rng.normal(size=(n, dim)).astype(np.float32)
        t = pa.table(
            {
                "vec_id": pa.array(np.arange(i, i + n, dtype=np.int64)),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(mat.ravel()), dim
                ).cast(pa.list_(pa.float32())),
            }
        )
        pq.write_table(t, os.path.join(tmp, f"part-{i // chunk:05d}.parquet"))
    with open(os.path.join(tmp, ".complete"), "w") as f:
        f.write("ok")
    os.rename(tmp, out)
    return out


def main():
    n_big = 10_000_000
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
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from raylink.workers import ensure_workers_can_import

    ensure_workers_can_import()
    from raylink.ann import (
        PQCodebooks,
        _stack_embeddings,
        brute_force_topk,
        pq_encode,
        pq_topk,
    )

    path = synthesize(n_big)
    files = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    n_small_files = max(1, len(files) // 4)
    n_small = n_small_files * 250_000
    head = pq.read_table(files[0], columns=["embedding"])
    sample = _stack_embeddings(
        head["embedding"].slice(0, 4096).to_pandas().to_numpy()
    )
    books = PQCodebooks.fit(sample, m=16, k=128, seed=0)
    queries = sample[:32]
    res = {"metric": "pq_scale_probe", "rows_small": n_small,
           "rows_big": n_big}
    for label, sel in (("small", files[:n_small_files]), ("big", files)):
        ds = rd.read_parquet(sel)
        res[label] = {}
        # encode ONCE per volume, materialized — the top-k reps then
        # measure pure ADC query cost over the codes table (the
        # deployed shape: encode at ingest, query many times)
        t0 = time.perf_counter()
        codes = pq_encode(ds, books).materialize()
        enc_wall = round(time.perf_counter() - t0, 2)
        res[label]["pq_encode"] = {"sec": enc_wall, "rows": codes.count()}
        for op, thunk in (
            ("pq_topk", lambda: len(pq_topk(codes, queries, books, k=10))),
            ("brute_force_topk",
             lambda: len(brute_force_topk(ds, queries, k=10))),
        ):
            walls, rows = [], 0
            for _ in range(3):
                t0 = time.perf_counter()
                rows = thunk()
                walls.append(round(time.perf_counter() - t0, 2))
            res[label][op] = {"sec": min(walls), "rows": rows,
                              "walls": walls}
    res["big_over_small_wall_ratio"] = {
        op: round(res["big"][op]["sec"] / res["small"][op]["sec"], 2)
        for op in res["small"]
    }
    print(json.dumps(res))
    ray.shutdown()


if __name__ == "__main__":
    main()
