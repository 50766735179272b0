import math

import numpy as np
import pandas as pd
import pytest

from raylink import TFIDFMatcher
from raylink.metrics import (
    pairwise_f1,
    pr_curve_from_value_counts,
    pr_curve_from_values,
    precision_recall_curve,
)


@pytest.mark.parametrize("precision_steps", [0.01, 0.05, 0.1, 0.2, 0.5])
def test_reference_invariants(precision_steps, fixture_lists):
    """Replicates tests/test_metrics.py:12-27 of the reference."""
    from_list, to_list = fixture_lists
    matches = TFIDFMatcher(cosine_method="sparse").match(from_list, to_list)
    mp, rc, ap = precision_recall_curve(matches, precision_steps)
    n = int(1 / precision_steps) + 1
    assert len(mp) == len(rc) == len(ap) == n
    assert mp[-1] == 1.0
    assert mp[0] < mp[-1]
    assert rc[0] > rc[-1]
    assert ap[0] < ap[-1]


def test_total_includes_unmatched_rows():
    m = pd.DataFrame({"Similarity": [0.0, 0.0, 1.0, 0.5]})
    mp, rc, ap = precision_recall_curve(m, 0.5)
    assert rc[0] == 1.0  # t=0: all rows including sim-0
    assert rc[1] == 0.5  # t=0.5: two of four
    assert math.isnan(ap[0]) is False
    # empty selection -> NaN average precision (reference suppresses warning)
    mp, rc, ap = precision_recall_curve(pd.DataFrame({"Similarity": [0.2]}), 0.5)
    assert math.isnan(ap[-1])


def test_value_counts_path_matches_direct():
    rng = np.random.default_rng(11)
    sims = np.round(rng.random(500), 3)
    vals, counts = np.unique(sims, return_counts=True)
    direct = pr_curve_from_values(sims, 0.01)
    agg = pr_curve_from_value_counts(vals, counts, 0.01, threshold_mode="arange")
    np.testing.assert_allclose(agg["min_precision"].to_numpy(), direct[0])
    np.testing.assert_allclose(agg["recall"].to_numpy(), direct[1])
    np.testing.assert_allclose(agg["average_precision"].to_numpy(), direct[2])


def test_arange_fp_quirk_reproduced():
    """The reference thresholds come from np.arange and carry fp noise:
    sims of exactly 0.57 are NOT >= the 0.5700000000000001 threshold."""
    sims = np.array([0.57])
    mp, rc, ap = pr_curve_from_values(sims, 0.01)
    i = 57
    assert mp[i] > 0.57
    assert rc[i] == 0.0
    agg = pr_curve_from_value_counts(np.array([0.57]), np.array([1]), 0.01)
    assert agg["recall"].iloc[i] == 0.0
    # the decimal grid (SQL-oracle mode) uses exact 0.57
    dec = pr_curve_from_value_counts(
        np.array([0.57]), np.array([1]), 0.01, threshold_mode="decimal"
    )
    assert dec["min_precision"].iloc[i] == 0.57
    assert dec["recall"].iloc[i] == 1.0


def test_pairwise_f1():
    pairs = pd.DataFrame(
        {
            "entity_a": ["a", "a", "c", "x"],
            "entity_b": ["b", "c", "d", "y"],
        }
    )
    ref = {"a": 1, "b": 1, "c": 2, "d": 2}
    perfect = pairwise_f1(pairs, ref, ref)
    assert perfect["f1"] == 1.0
    ours = {"a": 1, "b": 2, "c": 2, "d": 2}  # breaks (a,b), keeps (c,d)
    r = pairwise_f1(pairs, ours, ref)
    assert r["tp"] == 1 and r["fn"] == 1
    assert 0 < r["f1"] < 1


def test_pr_curve_from_value_counts_empty():
    import numpy as np

    from raylink.metrics import pr_curve_from_value_counts

    out = pr_curve_from_value_counts(np.empty(0), np.empty(0))
    assert len(out) == 101
    assert (out["recall"] == 0).all()


# ---------------------------------------------------------------------------
# blocking_quality
# ---------------------------------------------------------------------------


def test_blocking_quality_counts(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raylink.metrics import blocking_quality

    # entities: {0,1,2}->A (3 true pairs), {3,4}->B (1), {5}->C (0)
    labels = rd.from_arrow(
        pa.table(
            {
                "id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
                "entity": pa.array(["A", "A", "A", "B", "B", "C"]),
            }
        )
    )
    # candidates: 2 true (0-1, 3-4), 2 false (0-3, 2-5), 1 unknown id (9)
    pairs = rd.from_arrow(
        pa.table(
            {
                "a": pa.array([0, 3, 0, 2, 9], pa.int64()),
                "b": pa.array([1, 4, 3, 5, 1], pa.int64()),
            }
        )
    )
    out = blocking_quality(pairs, labels)
    row = out.iloc[0]
    assert row["n_records"] == 6
    assert row["n_cand_pairs"] == 5
    assert row["n_true_pairs"] == 4  # 3 + 1
    assert row["n_matched"] == 2
    assert row["pair_completeness_milli"] == 500
    assert row["reduction_ratio_milli"] == (15 - 5) * 1000 // 15
    # distributed label join path must agree
    forced = blocking_quality(pairs, labels, max_broadcast_rows=0)
    pd.testing.assert_frame_equal(out, forced)
    # string ids work too (index_in lookup)
    sl = rd.from_arrow(
        pa.table(
            {
                "id": pa.array(["r0", "r1", "r2"]),
                "entity": pa.array([7, 7, 8], pa.int64()),
            }
        )
    )
    sp = rd.from_arrow(
        pa.table({"a": pa.array(["r0", "r0"]), "b": pa.array(["r1", "r2"])})
    )
    srow = blocking_quality(sp, sl).iloc[0]
    assert srow["n_true_pairs"] == 1 and srow["n_matched"] == 1
    assert srow["pair_completeness_milli"] == 1000


def test_blocking_quality_guards(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raylink.metrics import blocking_quality

    pairs = rd.from_arrow(
        pa.table({"a": pa.array([1], pa.int64()), "b": pa.array([2], pa.int64())})
    )
    dup = rd.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 1], pa.int64()),
                "entity": pa.array(["A", "B"]),
            }
        )
    )
    with pytest.raises(Exception, match="duplicate"):
        blocking_quality(pairs, dup)
    nullp = rd.from_arrow(
        pa.table(
            {
                "a": pa.array([1, None], pa.int64()),
                "b": pa.array([2, 3], pa.int64()),
            }
        )
    )
    labels = rd.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 2, 3], pa.int64()),
                "entity": pa.array([0, 0, 1], pa.int64()),
            }
        )
    )
    with pytest.raises(Exception, match="null"):
        blocking_quality(nullp, labels)
    empty = rd.from_arrow(
        pa.table(
            {"id": pa.array([], pa.int64()), "entity": pa.array([], pa.string())}
        )
    )
    row = blocking_quality(pairs, empty).iloc[0]
    assert row["n_records"] == 0 and row["n_true_pairs"] == 0


def test_clustering_quality_counts(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raylink.metrics import clustering_quality

    # pred {0:[a,b], 1:[c], 2:[d,e,f]}; true {A:[a,b,c], B:[d,e], C:[f]}
    tbl = pa.table(
        {
            "pred": pa.array([0, 0, 1, 2, 2, 2], pa.int64()),
            "truth": pa.array(["A", "A", "A", "B", "B", "C"]),
        }
    )
    out = clustering_quality(rd.from_arrow(tbl), "pred", "truth")
    row = out.iloc[0]
    assert (row["pred_pairs"], row["true_pairs"], row["tp"]) == (4, 4, 2)
    assert row["precision_milli"] == 500
    assert row["recall_milli"] == 500
    assert row["f1_milli"] == 500
    forced = clustering_quality(
        rd.from_arrow(tbl).repartition(4), "pred", "truth",
        driver_merge_max_rows=0,
    )
    pd.testing.assert_frame_equal(out, forced)
    nulls = pa.table(
        {
            "pred": pa.array([1, None], pa.int64()),
            "truth": pa.array(["A", "B"]),
        }
    )
    with pytest.raises(Exception, match="null"):
        clustering_quality(rd.from_arrow(nulls), "pred", "truth")


def test_blocking_quality_cross_batch_dup_distributed(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raylink.metrics import blocking_quality

    labels = rd.from_arrow(
        pa.table({"id": pa.array([7], pa.int64()), "entity": pa.array(["A"])})
    ).union(
        rd.from_arrow(
            pa.table(
                {"id": pa.array([7], pa.int64()), "entity": pa.array(["B"])}
            )
        )
    )
    pairs = rd.from_arrow(
        pa.table({"a": pa.array([7], pa.int64()), "b": pa.array([7], pa.int64())})
    )
    # the DISTRIBUTED path must reject cross-batch duplicates too (the
    # broadcast path checks the collected table)
    with pytest.raises(Exception, match="duplicate"):
        blocking_quality(pairs, labels, max_broadcast_rows=0)
