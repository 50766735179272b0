"""sessionize / session_stats: vectorized partition kernel vs a
brute-force per-key python oracle (gap rule, tie ordering, rebasing)."""

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


def _brute_sessions(k, t, i, gap_us):
    """Per-event session_idx + per-session stats, per-key python loop."""
    rows, stats = [], []
    for key in np.unique(k):
        m = k == key
        order = np.lexsort((i[m], t[m]))
        ts, ids = t[m][order], i[m][order]
        sidx = 0
        cur = []
        for j in range(len(ts)):
            if j > 0 and ts[j] - ts[j - 1] > gap_us:
                stats.append(
                    (key, sidx, len(cur), int(ts[cur[0]]), int(ts[cur[-1]]))
                )
                sidx += 1
                cur = []
            cur.append(j)
            rows.append((key, int(ids[j]), sidx))
        stats.append((key, sidx, len(cur), int(ts[cur[0]]), int(ts[cur[-1]])))
    return rows, stats


def _make(rng, n=400, n_keys=9, t_hi=2000, gap=50):
    k = rng.integers(0, n_keys, n).astype(np.int64)
    t = rng.integers(0, t_hi, n).astype(np.int64)
    i = rng.permutation(n).astype(np.int64)
    return k, t, i, gap


def test_sessionize_matches_brute_force(rd):
    from raylink.windows import sessionize

    rng = np.random.default_rng(23)
    k, t, i, gap = _make(rng)
    ds = rd.from_arrow(
        pa.table({"uid": pa.array(k), "ts": pa.array(t), "eid": pa.array(i)})
    ).repartition(5)
    got = sessionize(ds, "uid", "ts", "eid", gap_us=gap, output="pandas")
    want_rows, _ = _brute_sessions(k, t, i, gap)
    want = pd.DataFrame(
        sorted(want_rows), columns=["uid", "eid", "session_idx"]
    ).sort_values(["uid", "eid"], ignore_index=True)
    got = got.sort_values(["uid", "eid"], ignore_index=True)
    pd.testing.assert_frame_equal(
        got[["uid", "eid", "session_idx"]].astype(np.int64), want.astype(np.int64)
    )


def test_session_stats_matches_brute_force(rd):
    from raylink.windows import session_stats

    rng = np.random.default_rng(31)
    k, t, i, gap = _make(rng, n=500, t_hi=3000, gap=40)
    ds = rd.from_arrow(
        pa.table({"uid": pa.array(k), "ts": pa.array(t), "eid": pa.array(i)})
    ).repartition(4)
    got = session_stats(ds, "uid", "ts", "eid", gap_us=gap, output="pandas")
    _, want_stats = _brute_sessions(k, t, i, gap)
    want = pd.DataFrame(
        sorted(want_stats),
        columns=["uid", "session_idx", "n_events", "start_us", "end_us"],
    )
    want["duration_us"] = want["end_us"] - want["start_us"]
    got = got.sort_values(["uid", "session_idx"], ignore_index=True)
    cols = ["uid", "session_idx", "n_events", "start_us", "end_us", "duration_us"]
    pd.testing.assert_frame_equal(got[cols].astype(np.int64), want[cols].astype(np.int64))


def test_gap_boundary_is_strict_greater(rd):
    """Gap EXACTLY equal to gap_us stays in the same session; one more
    microsecond starts a new one. Equal-ts ties order by id."""
    from raylink.windows import session_stats, sessionize

    k = np.zeros(4, dtype=np.int64)
    t = np.array([0, 10, 20, 31], dtype=np.int64)  # gaps 10, 10, 11
    i = np.array([3, 1, 2, 0], dtype=np.int64)
    ds = rd_from(k, t, i)
    got = sessionize(ds, "uid", "ts", "eid", gap_us=10, output="pandas")
    by_eid = dict(zip(got["eid"], got["session_idx"]))
    assert by_eid == {3: 0, 1: 0, 2: 0, 0: 1}
    st = session_stats(ds, "uid", "ts", "eid", gap_us=10, output="pandas")
    assert st["n_events"].tolist() == [3, 1]
    assert st["duration_us"].tolist() == [20, 0]


def rd_from(k, t, i):
    import ray.data

    return ray.data.from_arrow(
        pa.table({"uid": pa.array(k), "ts": pa.array(t), "eid": pa.array(i)})
    )


def test_timestamp_column_and_dataset_output(rd):
    """Timestamp-typed ts columns work; default output is an un-collected
    Dataset."""
    from raylink.windows import session_stats

    k = np.array([1, 1, 2], dtype=np.int64)
    t = np.array([0, 7_200_000_000, 100], dtype="datetime64[us]")
    i = np.array([0, 1, 2], dtype=np.int64)
    ds = rd.from_arrow(
        pa.table({"uid": pa.array(k), "ts": pa.array(t), "eid": pa.array(i)})
    )
    out = session_stats(ds, "uid", "ts", "eid", gap_us=3_600_000_000)
    assert hasattr(out, "to_pandas") and not isinstance(out, pd.DataFrame)
    df = out.to_pandas().sort_values(["uid", "session_idx"], ignore_index=True)
    assert df["n_events"].tolist() == [1, 1, 1]
    assert df["session_idx"].tolist() == [0, 1, 0]


def test_hopping_windows_matches_brute_force(rd):
    import pandas as pd

    from raylink.windows import hopping_windows

    rng = np.random.default_rng(29)
    n = 800
    k = rng.integers(0, 6, n).astype(np.int64)
    t = rng.integers(0, 1000, n).astype(np.int64)
    v = rng.normal(size=n)
    ds = rd.from_arrow(
        pa.table({"k": pa.array(k), "ts": pa.array(t), "val": pa.array(v)})
    ).repartition(4)
    size, hop = 40, 10
    got = hopping_windows(
        ds, "k", "ts", size_us=size, hop_us=hop, value_col="val",
        output="pandas",
    )
    rows = {}
    for i in range(n):
        q = t[i] // hop
        for j in range(size // hop):
            ws = (q - j) * hop
            key = (k[i], ws)
            cnt, s = rows.get(key, (0, 0))
            rows[key] = (cnt + 1, s + int(round(v[i] * 100)))
    want = pd.DataFrame(
        [(a, b, c, d) for (a, b), (c, d) in sorted(rows.items())],
        columns=["k", "win_start_us", "n_events", "sum_value_scaled"],
    ).astype(np.int64)
    pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want)


def test_hopping_windows_rejects_bad_hop(rd):
    import pytest as _pytest

    from raylink.windows import hopping_windows

    ds = rd.from_arrow(pa.table({"k": pa.array([1]), "ts": pa.array([5])}))
    with _pytest.raises(ValueError):
        hopping_windows(ds, "k", "ts", size_us=30, hop_us=7)


def test_rolling_window_matches_brute_force(rd):
    import pandas as pd

    from raylink.windows import rolling_window

    rng = np.random.default_rng(83)
    n = 600
    k = rng.integers(0, 7, n).astype(np.int64)
    t = rng.integers(0, 90, n).astype(np.int64)
    v = rng.normal(size=n)
    ids = np.arange(n, dtype=np.int64)
    ds = rd.from_arrow(
        pa.table(
            {"k": pa.array(k), "ts": pa.array(t),
             "i": pa.array(ids), "val": pa.array(v)}
        )
    ).repartition(5)
    got = rolling_window(ds, "k", "ts", "i", "val", window=4,
                         output="pandas")
    vq = np.rint(v * 100).astype(np.int64)
    rows = []
    for kk in np.unique(k):
        sel = np.flatnonzero(k == kk)
        order = sel[np.lexsort((ids[sel], t[sel]))]
        for pos, ridx in enumerate(order):
            win = order[max(0, pos - 3) : pos + 1]
            rows.append((ids[ridx], kk, len(win), int(vq[win].sum())))
    want = (
        pd.DataFrame(rows, columns=["i", "k", "n_in_window",
                                    "roll_sum_scaled"])
        .sort_values("i")
        .reset_index(drop=True)
        .astype(np.int64)
    )
    pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want)


def test_lag_deltas_matches_brute_force(rd):
    import pandas as pd

    from raylink.windows import lag_deltas

    rng = np.random.default_rng(89)
    n = 400
    k = rng.integers(0, 5, n).astype(np.int64)
    t = rng.integers(0, 50, n).astype(np.int64)
    ids = np.arange(n, dtype=np.int64)
    ds = rd.from_arrow(
        pa.table({"k": pa.array(k), "ts": pa.array(t), "i": pa.array(ids)})
    ).repartition(4)
    got = lag_deltas(ds, "k", "ts", "i", output="pandas")
    rows = []
    for kk in np.unique(k):
        sel = np.flatnonzero(k == kk)
        order = sel[np.lexsort((ids[sel], t[sel]))]
        for prev, cur in zip(order[:-1], order[1:]):
            rows.append((ids[cur], kk, ids[prev], t[cur] - t[prev]))
    want = (
        pd.DataFrame(rows, columns=["i", "k", "prev_id", "gap_us"])
        .sort_values("i")
        .reset_index(drop=True)
        .astype(np.int64)
    )
    pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want)


def test_lag_payload_string_keys(rd):
    """lag_payload: SQL LAG semantics over string keys + string payload,
    partition-invariant."""
    import pyarrow as pa

    from raylink.windows import lag_payload

    t = pa.table(
        {
            "conv": pa.array(["a", "a", "a", "b", "b", "c"]),
            "turn": pa.array([0, 1, 2, 0, 1, 0], pa.int64()),
            "role": pa.array(
                ["user", "assistant", "user", "user", "assistant", "user"]
            ),
            "text": pa.array(["q1", "r1", "q2", "q3", "r3", "q4"]),
        }
    )
    want = pd.DataFrame(
        {
            "conv": ["a", "a", "b"],
            "turn": [1, 2, 1],
            "role": ["assistant", "user", "assistant"],
            "prev_role": ["user", "assistant", "user"],
            "text": ["r1", "q2", "r3"],
            "prev_text": ["q1", "r1", "q3"],
        }
    )
    for parts in (1, 4):
        ds = rd.from_arrow(t).repartition(parts)
        got = lag_payload(ds, "conv", "turn", ("role", "text"),
                          output="pandas")
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_lag_payload_duplicate_order_rejected(rd):
    import pyarrow as pa
    import pytest

    from raylink.windows import lag_payload

    t = pa.table({
        "conv": pa.array(["a", "a"]),
        "turn": pa.array([1, 1], pa.int64()),
        "text": pa.array(["x", "y"]),
    })
    with pytest.raises(Exception, match="unique"):
        lag_payload(rd.from_arrow(t), "conv", "turn", ("text",),
                    output="pandas")


def test_rolling_window_null_value_rejected(rd):
    import pyarrow as pa
    import pytest

    from raylink.windows import rolling_window

    t = pa.table({
        "k": pa.array([1, 1], pa.int64()),
        "ts": pa.array([1, 2], pa.int64()),
        "i": pa.array([1, 2], pa.int64()),
        "v": pa.array([1.0, None], pa.float64()),
    })
    with pytest.raises(Exception, match="null"):
        rolling_window(rd.from_arrow(t), "k", "ts", "i", "v", window=2,
                       output="pandas")


def test_windows_reject_nulls_loudly(rd):
    """Null key/ts/id values in the window ops would silently become
    INT64_MIN through the float64 round-trip (corrupting every value
    above 2^53 in the batch alongside) — the window null policy is loud
    rejection, like the value-column checks."""
    import pyarrow as pa

    from raylink.windows import lag_deltas, rolling_window, sessionize

    base = {
        "k": pa.array([1, 1, None], pa.int64()),
        "ts": pa.array([0, 5, 9], pa.int64()),
        "i": pa.array([10, 11, 12], pa.int64()),
    }
    ds = rd.from_arrow(pa.table(base))
    with pytest.raises(Exception, match="null"):
        sessionize(ds, "k", "ts", "i", gap_us=2, output="pandas")
    with pytest.raises(Exception, match="null"):
        lag_deltas(ds, "k", "ts", "i", output="pandas")
    null_ts = rd.from_arrow(pa.table({
        "k": pa.array([1, 1], pa.int64()),
        "ts": pa.array([0, None], pa.int64()),
        "i": pa.array([10, 11], pa.int64()),
        "v": pa.array([1.0, 2.0]),
    }))
    with pytest.raises(Exception, match="null"):
        rolling_window(null_ts, "k", "ts", "i", "v", window=2,
                       output="pandas")


def test_rolling_window_rejects_nan_values(rd):
    """A non-null NaN in the value column would np.rint -> astype(int64)
    to INT64_MIN silently (hopping's Arrow cast raises on the same
    input) — rolling must raise too."""
    import pyarrow as pa

    from raylink.windows import rolling_window

    ds = rd.from_arrow(pa.table({
        "k": pa.array([1, 1], pa.int64()),
        "ts": pa.array([0, 5], pa.int64()),
        "i": pa.array([10, 11], pa.int64()),
        "v": pa.array([1.0, float("nan")]),
    }))
    with pytest.raises(Exception, match="NaN"):
        rolling_window(ds, "k", "ts", "i", "v", window=2, output="pandas")


def test_windows_empty_input_pandas(rd):
    """output='pandas' on empty inputs must not KeyError on the sort
    columns (an empty Dataset loses its schema through to_pandas — the
    joins' _sorted_pandas rebuild, adopted by the window family)."""
    import pyarrow as pa

    from raylink.windows import (
        lag_deltas,
        lag_payload,
        rolling_window,
        session_stats,
        sessionize,
    )

    ds = rd.from_arrow(pa.table({
        "k": pa.array([], pa.int64()),
        "ts": pa.array([], pa.int64()),
        "i": pa.array([], pa.int64()),
        "v": pa.array([], pa.float64()),
        "p": pa.array([], pa.string()),
    }))
    assert len(sessionize(ds, "k", "ts", "i", gap_us=1,
                          output="pandas")) == 0
    assert len(session_stats(ds, "k", "ts", "i", gap_us=1,
                             output="pandas")) == 0
    assert len(rolling_window(ds, "k", "ts", "i", "v", window=2,
                              output="pandas")) == 0
    assert len(lag_deltas(ds, "k", "ts", "i", output="pandas")) == 0
    assert len(lag_payload(ds, "k", "i", ("p",), output="pandas")) == 0


def test_windows_reject_generated_name_collisions(rd):
    """Input columns named like an op's generated output/staging columns
    would be silently overwritten (dict-keyed table builds) or break the
    groupby on a duplicate 'part' — collide loudly (the joins'
    _check_reserved policy)."""
    import pyarrow as pa

    from raylink.windows import lag_payload, sessionize

    ds = rd.from_arrow(pa.table({
        "session_idx": pa.array([1], pa.int64()),
        "ts": pa.array([0], pa.int64()),
        "i": pa.array([10], pa.int64()),
        "part": pa.array([0], pa.int64()),
        "x": pa.array(["a"], pa.string()),
        "prev_x": pa.array(["b"], pa.string()),
    }))
    with pytest.raises(ValueError, match="collide"):
        sessionize(ds, "session_idx", "ts", "i", gap_us=1)
    with pytest.raises(ValueError, match="collide"):
        sessionize(ds, "part", "ts", "i", gap_us=1)
    with pytest.raises(ValueError, match="collide"):
        lag_payload(ds, "i", "ts", ("x", "prev_x"))
