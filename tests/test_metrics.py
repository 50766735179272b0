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
