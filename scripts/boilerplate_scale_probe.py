#!/usr/bin/env python
"""Scale probe for remove_boilerplate / paragraph_counts (round 4).

Synthesizes a deterministic paragraph-structured corpus (seed 11; ~5
paragraphs per doc, 0.1% of the paragraph pool repeated corpus-wide as
boilerplate), writes it once as multi-file parquet under /tmp, then
times the op at TWO volumes (2.5M and 10M docs) — a super-linear stage
shows as a wall ratio well above the 4x data ratio. Also times
take_token_budget on the same corpora.

Usage: python scripts/boilerplate_scale_probe.py [--rows 10000000]
Prints one JSON line; results recorded in BASELINE.md round 4.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = "/tmp/raylink_bp_probe"


def synthesize(n_rows: int, seed: int = 11) -> str:
    out = os.path.join(ROOT, f"docs-n{n_rows}-s{seed}")
    done = os.path.join(out, ".complete")
    if os.path.exists(done):
        return out
    tmp = f"{out}.tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    rng = np.random.default_rng(seed)
    common = np.array([f"standard disclaimer line number {i}" for i in range(40)])
    rare_words = np.array(["alpha","beta","gamma","delta","omega","sigma",
                           "kappa","lambda","theta","zeta"])
    chunk = 500_000
    for i in range(0, n_rows, chunk):
        n = min(chunk, n_rows - i)
        texts = []
        n_paras = rng.integers(2, 8, size=n)
        pick_common = rng.random((n, 8)) < 0.3
        widx = rng.integers(0, 10, size=(n, 8, 6))
        cidx = rng.integers(0, 40, size=(n, 8))
        for r in range(n):
            paras = [
                common[cidx[r, j]]
                if pick_common[r, j]
                else " ".join(rare_words[widx[r, j]]) + f" {i + r} {j}"
                for j in range(n_paras[r])
            ]
            texts.append("\n".join(paras))
        t = pa.table({
            "doc_id": pa.array(np.arange(i, i + n, dtype=np.int64)),
            "text": pa.array(texts, type=pa.string()),
        })
        pq.write_table(t, os.path.join(tmp, f"part-{i // chunk:05d}.parquet"))
    with open(os.path.join(tmp, ".complete"), "w") as f:
        f.write("ok")
    os.rename(tmp, out)
    return out


def main():
    n_big = 10_000_000
    for a in sys.argv[1:]:
        if a.startswith("--rows"):
            n_big = int(sys.argv[sys.argv.index(a) + 1]) if a == "--rows" else int(a.split("=")[1])
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from raylink.workers import ensure_workers_can_import

    ensure_workers_can_import()  # probe must run from any cwd, like the contract
    from raylink.packing import take_token_budget
    from raylink.textstats import remove_boilerplate

    path = synthesize(n_big)
    res = {"metric": "boilerplate_scale_probe", "rows_small": n_big // 4,
           "rows_big": n_big}
    for label, n in (("small", n_big // 4), ("big", n_big)):
        ds_full = rd.read_parquet(path)
        ds = ds_full.limit(n) if n < n_big else ds_full
        res[label] = {}
        for op, thunk in (
            ("remove_boilerplate", lambda d=ds: remove_boilerplate(
                d, "doc_id", "text", max_docs=1000).count()),
            ("take_token_budget", lambda d=ds, nn=n: take_token_budget(
                d, "doc_id", "text", budget=nn * 10).count()),
        ):
            walls, rows = [], 0
            for _ in range(2):
                t0 = time.perf_counter()
                rows = thunk()
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
