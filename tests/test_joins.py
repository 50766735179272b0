"""asof_join: vectorized partition merge vs a brute-force numpy oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray.data


def _brute_asof(lk, lt, lids, rk, rt, rids, strict):
    out = []
    for i in range(len(lids)):
        adm = (rk == lk[i]) & ((rt < lt[i]) if strict else (rt <= lt[i]))
        if not adm.any():
            continue
        cand = np.flatnonzero(adm)
        best = cand[np.lexsort((rids[cand], rt[cand]))][-1]
        out.append((lids[i], rids[best]))
    return sorted(out)


@pytest.mark.parametrize("strict", [False, True])
def test_asof_join_matches_brute_force(rd, strict):
    from raylink.joins import asof_join

    rng = np.random.default_rng(17)
    nl, nr = 300, 250
    lk = rng.integers(0, 12, nl).astype(np.int64)
    rk = rng.integers(0, 12, nr).astype(np.int64)
    # coarse ts grid forces equal-ts ties on both sides
    lt = rng.integers(0, 40, nl).astype(np.int64)
    rt = rng.integers(0, 40, nr).astype(np.int64)
    lids = np.arange(nl, dtype=np.int64)
    rids = np.arange(1000, 1000 + nr, dtype=np.int64)
    left = rd.from_arrow(
        pa.table({"k": pa.array(lk), "ts": pa.array(lt), "lid": pa.array(lids)})
    ).repartition(4)
    right = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(rk),
                "ts": pa.array(rt),
                "rid": pa.array(rids),
                "val": pa.array(rids.astype(np.float64) / 10),
            }
        )
    ).repartition(3)
    got = asof_join(
        left, right, "k", "ts", "lid", "rid",
        right_payload_cols=("val",), strict=strict, output="pandas",
    )
    want = _brute_asof(lk, lt, lids, rk, rt, rids, strict)
    assert list(zip(got["lid"], got["rid"])) == want
    np.testing.assert_allclose(got["val"], got["rid"].astype(np.float64) / 10)
