#!/usr/bin/env python
"""Scale probe for the window / join family (VERDICT r3 #7).

Synthesizes a deterministic 10M-row event table (seed 7; ~100 events per
key so interval/asof outputs stay bounded), writes it once as multi-file
parquet under /tmp, then times each operator at TWO volumes (2.5M and
10M rows read from the same files) so super-linear stages show up as a
wall ratio well above the 4x data ratio. Ops covered: sessionize,
hopping_windows, session_stats, equi_join (forced distributed),
interval_join, asof_join.

Usage: python scripts/window_join_scale_probe.py [--rows 10000000]
Prints one JSON line; results are recorded in BASELINE.md round 4.
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

ROOT = "/tmp/raylink_scale_probe"
DAY_US = 86_400_000_000


def synthesize(n_rows: int, n_keys: int, seed: int = 7) -> str:
    out = os.path.join(ROOT, f"events-n{n_rows}-k{n_keys}-s{seed}")
    done = os.path.join(out, ".complete")
    if os.path.exists(done):
        return out
    tmp = f"{out}.tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    rng = np.random.default_rng(seed)
    chunk = 1_000_000
    for i in range(0, n_rows, chunk):
        n = min(chunk, n_rows - i)
        t = pa.table(
            {
                "event_id": pa.array(np.arange(i, i + n, dtype=np.int64)),
                "user_id": pa.array(
                    rng.integers(0, n_keys, size=n).astype(np.int64)
                ),
                "ts": pa.array(
                    rng.integers(0, 30 * DAY_US, size=n).astype(np.int64)
                ),
                "value": pa.array(
                    rng.integers(0, 10_000, size=n).astype(np.int64)
                ),
            }
        )
        pq.write_table(t, os.path.join(tmp, f"part-{i // chunk:05d}.parquet"))
    with open(os.path.join(tmp, ".complete"), "w") as f:
        f.write("ok")
    try:
        os.rename(tmp, out)
    except OSError:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return out


def probe(path: str, n_files: int | None) -> dict:
    import glob

    import ray.data as rd

    from raylink.joins import asof_join, equi_join, interval_join
    from raylink.windows import hopping_windows, session_stats, sessionize

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if n_files is not None:
        files = files[:n_files]

    def events():
        return rd.read_parquet(files)

    def clicks(b: pa.Table) -> pa.Table:
        keep = (
            np.asarray(b["event_id"].to_numpy(zero_copy_only=False)) % 3 == 0
        )
        return b.filter(pa.array(keep)).rename_columns(
            ["click_id", "user_id", "ts", "value"]
        )

    def views(b: pa.Table) -> pa.Table:
        keep = (
            np.asarray(b["event_id"].to_numpy(zero_copy_only=False)) % 3 != 0
        )
        return b.filter(pa.array(keep)).rename_columns(
            ["view_id", "user_id", "ts", "view_value"]
        )

    def dim(b: pa.Table) -> pa.Table:
        # ~1 row per key (100k rows over 100k keys): inner multiplicity
        # stays ~1 so the join output tracks the left volume; the mode is
        # FORCED distributed so the co-shuffle path is what gets timed
        ids = np.asarray(b["event_id"].to_numpy(zero_copy_only=False))
        keep = ids < 100_000
        return pa.table(
            {
                "user_id": b["user_id"].filter(pa.array(keep)),
                "dim_value": b["value"].filter(pa.array(keep)),
            }
        )

    ops = {
        "sessionize": lambda: sessionize(
            events(), "user_id", "ts", "event_id", gap_us=DAY_US // 24
        ).count(),
        "session_stats": lambda: session_stats(
            events(), "user_id", "ts", "event_id", gap_us=DAY_US // 24
        ).count(),
        "hopping_windows": lambda: hopping_windows(
            events(), "user_id", "ts", size_us=DAY_US, hop_us=DAY_US // 4,
            value_col="value",
        ).count(),
        "equi_join_distributed": lambda: equi_join(
            events(),
            events().map_batches(dim, batch_format="pyarrow"),
            "user_id",
            "user_id",
            left_cols=("event_id",),
            right_cols=("dim_value",),
            mode="distributed",
        ).count(),
        "interval_join": lambda: interval_join(
            events(), "user_id", "ts", "event_id",
            max_gap_us=DAY_US // 24,
        ).count(),
        "asof_join": lambda: asof_join(
            events().map_batches(clicks, batch_format="pyarrow"),
            events().map_batches(views, batch_format="pyarrow"),
            "user_id",
            "ts",
            "click_id",
            "view_id",
            right_payload_cols=("view_value",),
        ).count(),
    }
    out = {}
    for name, thunk in ops.items():
        # best-of-2 (the bench discipline: this host shows 2-4x transient
        # neighbor noise; both walls kept)
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            n = thunk()
            walls.append(round(time.perf_counter() - t0, 2))
        out[name] = {"sec": min(walls), "rows": n, "walls": walls}
    return out


def main():
    import ray

    n_rows = 10_000_000
    for i, a in enumerate(sys.argv):
        if a == "--rows":
            n_rows = int(sys.argv[i + 1])
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from raylink.workers import ensure_workers_can_import

    ensure_workers_can_import()  # probe must run from any cwd, like the contract
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    path = synthesize(n_rows, n_keys=100_000)
    n_files = n_rows // 1_000_000
    small = probe(path, max(1, n_files // 4))
    big = probe(path, n_files)
    ratios = {
        k: round(big[k]["sec"] / max(small[k]["sec"], 1e-9), 2) for k in big
    }
    print(
        json.dumps(
            {
                "metric": "window_join_scale_probe",
                "rows_small": n_rows // 4,
                "rows_big": n_rows,
                "small": small,
                "big": big,
                "big_over_small_wall_ratio": ratios,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
