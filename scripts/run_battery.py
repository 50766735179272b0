"""Full driver-contract battery: run EVERY queries() entry at sf0.01 and
compare against its oracle_sql() DuckDB replay the way the grading driver
does — row count, schema (column names), and exact values after sorting
columns by name and rows by every column. Queries without an oracle are
reported as rows-only.

Usage:  python scripts/run_battery.py [sf_dir]   (default /root/testdata/sf0.01)

Owns its Ray session (the driver contract forbids __ray_entry__ from
calling ray.init; scripts own their sessions per CLAUDE.md).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray.data.Dataset


def _canon(df):
    import numpy as np

    cols = sorted(df.columns)
    df = df[cols].copy()
    for c in cols:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("int64")
    df = df.sort_values(cols, kind="stable").reset_index(drop=True)
    out = {}
    for c in cols:
        v = df[c].to_numpy()
        if v.dtype.kind == "f":
            v = np.round(v, 9)  # driver value-hash tolerance analog
        out[c] = v
    return cols, out, len(df)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import duckdb
    import numpy as np
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    import __ray_entry__ as mod

    qs, sqls = mod.queries(), mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    n_pass = n_rowsonly = n_fail = 0
    for name, q in qs.items():
        t0 = time.time()
        try:
            got = _to_pandas(q(sf_dir))
        except Exception as e:
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        wall = time.time() - t0
        if name not in sqls:
            print(f"rows-only  {name}: {len(got)} rows ({wall:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            ora = con.execute(sqls[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        gc, gv, gn = _canon(got)
        oc, ov, on = _canon(ora)
        if gc != oc:
            print(f"FAIL  {name}: schema {gc} vs {oc}")
            n_fail += 1
            continue
        if gn != on:
            print(f"FAIL  {name}: rows {gn} vs {on}")
            n_fail += 1
            continue
        bad = [
            c
            for c in gc
            if not (
                np.array_equal(gv[c], ov[c])
                or (
                    gv[c].dtype.kind == "f"
                    and np.allclose(gv[c], ov[c], rtol=0, atol=1e-9)
                )
            )
        ]
        if bad:
            print(f"FAIL  {name}: value mismatch in columns {bad}")
            n_fail += 1
        else:
            print(f"pass  {name}: {gn} rows hash-exact ({wall:.1f}s)")
            n_pass += 1
    print(
        f"\nBATTERY: {n_pass} hash-exact, {n_rowsonly} rows-only, "
        f"{n_fail} FAILED of {len(qs)}"
    )
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
