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


# ---------------------------------------------------------------------------
# equi_join / semi_join / interval_join
# ---------------------------------------------------------------------------


def _mk_sides(rd, rng, nl=400, nr=300, nkeys=15):
    lk = rng.integers(0, nkeys, nl).astype(np.int64)
    rk = rng.integers(0, nkeys, nr).astype(np.int64)
    lids = np.arange(nl, dtype=np.int64)
    rids = np.arange(5000, 5000 + nr, dtype=np.int64)
    left = rd.from_arrow(
        pa.table({"k": pa.array(lk), "lid": pa.array(lids)})
    ).repartition(5)
    right = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(rk),
                "rid": pa.array(rids),
                "tag": pa.array([f"t{v % 7}" for v in rk]),
            }
        )
    ).repartition(3)
    return lk, lids, rk, rids, left, right


@pytest.mark.parametrize("mode", ["broadcast", "distributed"])
def test_equi_join_matches_pandas_merge(rd, mode):
    from raylink.joins import equi_join

    rng = np.random.default_rng(23)
    lk, lids, rk, rids, left, right = _mk_sides(rd, rng)
    got = equi_join(
        left, right, "k", "k", left_cols=("lid",),
        right_cols=("rid", "tag"), mode=mode, output="pandas",
    )
    want = (
        pd.DataFrame({"k": lk, "lid": lids})
        .merge(
            pd.DataFrame(
                {"k": rk, "rid": rids, "tag": [f"t{v % 7}" for v in rk]}
            ),
            on="k",
        )
        .sort_values(["k", "lid", "rid", "tag"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want)


def test_equi_join_modes_identical_and_empty(rd):
    from raylink.joins import equi_join

    rng = np.random.default_rng(5)
    _, _, _, _, left, right = _mk_sides(rd, rng, nkeys=9)
    a = equi_join(left, right, "k", "k", left_cols=("lid",),
                  right_cols=("rid",), mode="broadcast", output="pandas")
    b = equi_join(left, right, "k", "k", left_cols=("lid",),
                  right_cols=("rid",), mode="distributed", output="pandas")
    pd.testing.assert_frame_equal(a, b)
    # disjoint key domains -> empty result survives the pandas path
    shifted = right.map_batches(
        lambda t: pa.table(
            {"k": pa.array(np.asarray(t["k"]) + 1000), "rid": t["rid"]}
        ),
        batch_format="pyarrow",
    )
    for mode in ("broadcast", "distributed"):
        e = equi_join(left, shifted, "k", "k", left_cols=("lid",),
                      right_cols=("rid",), mode=mode, output="pandas")
        assert len(e) == 0 and list(e.columns) == ["k", "lid", "rid"]


@pytest.mark.parametrize("anti", [False, True])
@pytest.mark.parametrize("mode", ["broadcast", "distributed"])
def test_semi_join_matches_isin(rd, anti, mode):
    from raylink.joins import semi_join

    rng = np.random.default_rng(31)
    lk, lids, rk, _, left, right = _mk_sides(rd, rng, nkeys=25)
    got = semi_join(left, right, "k", "k", left_cols=("lid",),
                    anti=anti, mode=mode, output="pandas")
    member = np.isin(lk, rk)
    keep = ~member if anti else member
    want = (
        pd.DataFrame({"k": lk[keep], "lid": lids[keep]})
        .sort_values(["k", "lid"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want)


def _brute_interval(k, t, ids, gap):
    out = []
    for i in range(len(k)):
        for j in range(len(k)):
            if k[i] != k[j]:
                continue
            if (t[j], ids[j]) <= (t[i], ids[i]):
                continue
            if t[j] - t[i] <= gap:
                out.append((ids[i], ids[j], t[j] - t[i]))
    return sorted(out)


def test_interval_join_matches_brute_force(rd):
    from raylink.joins import interval_join

    rng = np.random.default_rng(41)
    n = 500
    k = rng.integers(0, 10, n).astype(np.int64)
    # coarse grid: plenty of equal-ts ties within keys
    t = rng.integers(0, 60, n).astype(np.int64)
    ids = np.arange(n, dtype=np.int64)
    ds = rd.from_arrow(
        pa.table({"k": pa.array(k), "ts": pa.array(t), "i": pa.array(ids)})
    ).repartition(6)
    got = interval_join(ds, "k", "ts", "i", max_gap_us=5, output="pandas")
    want = _brute_interval(k, t, ids, 5)
    assert list(map(tuple, got.to_numpy())) == want


def test_interval_join_gap_zero_equal_ts_only(rd):
    from raylink.joins import interval_join

    k = np.zeros(4, dtype=np.int64)
    t = np.array([7, 7, 9, 30], dtype=np.int64)
    ids = np.array([3, 1, 2, 4], dtype=np.int64)
    ds = rd.from_arrow(
        pa.table({"k": pa.array(k), "ts": pa.array(t), "i": pa.array(ids)})
    )
    got = interval_join(ds, "k", "ts", "i", max_gap_us=0, output="pandas")
    assert list(map(tuple, got.to_numpy())) == [(1, 3, 0)]


# ---------------------------------------------------------------------------
# string keys
# ---------------------------------------------------------------------------


def _mk_string_sides(rd, rng, nl=300, nr=200, nkeys=12, collide=False):
    if collide:
        # identical prefix-8, suffix-8 AND length -> identical partition
        # hash for every key; correctness must not depend on the hash
        key_names = [f"AAAAAAAA{i:02d}BBBBBBBB" for i in range(nkeys)]
    else:
        key_names = [f"key-{i}" for i in range(nkeys)]
    lk = [key_names[v] for v in rng.integers(0, nkeys, nl)]
    rk = [key_names[v] for v in rng.integers(0, nkeys, nr)]
    lids = np.arange(nl, dtype=np.int64)
    rids = np.arange(7000, 7000 + nr, dtype=np.int64)
    left = rd.from_arrow(
        pa.table({"k": pa.array(lk), "lid": pa.array(lids)})
    ).repartition(4)
    right = rd.from_arrow(
        pa.table({"k": pa.array(rk), "rid": pa.array(rids)})
    ).repartition(3)
    return lk, lids, rk, rids, left, right


@pytest.mark.parametrize("collide", [False, True])
@pytest.mark.parametrize("mode", ["broadcast", "distributed"])
def test_equi_join_string_keys(rd, mode, collide):
    from raylink.joins import equi_join

    rng = np.random.default_rng(71)
    lk, lids, rk, rids, left, right = _mk_string_sides(
        rd, rng, collide=collide
    )
    got = equi_join(left, right, "k", "k", left_cols=("lid",),
                    right_cols=("rid",), mode=mode, output="pandas")
    want = (
        pd.DataFrame({"k": lk, "lid": lids})
        .merge(pd.DataFrame({"k": rk, "rid": rids}), on="k")
        .sort_values(["k", "lid", "rid"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want)


@pytest.mark.parametrize("anti", [False, True])
@pytest.mark.parametrize("mode", ["broadcast", "distributed"])
def test_semi_join_string_keys(rd, mode, anti):
    from raylink.joins import semi_join

    rng = np.random.default_rng(73)
    lk, lids, rk, _, left, right = _mk_string_sides(rd, rng, nkeys=20)
    # drop some keys from the right so semi and anti are both non-trivial
    kept = {f"key-{i}" for i in range(0, 20, 2)}
    right = right.filter(lambda r: r["k"] in kept)
    got = semi_join(left, right, "k", "k", left_cols=("lid",),
                    anti=anti, mode=mode, output="pandas")
    member = np.array([k in kept and k in set(rk) for k in lk])
    keep = ~member if anti else member
    want = (
        pd.DataFrame({"k": np.array(lk)[keep], "lid": lids[keep]})
        .sort_values(["k", "lid"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want)


def test_string_part_hash_deterministic_and_spread(rd):
    from raylink.joins import _string_part_hash

    keys = pa.array([f"conv-{i}-xyz" for i in range(1000)])
    h1 = _string_part_hash(keys)
    h2 = _string_part_hash(keys)
    assert (h1 == h2).all()
    # distinct strings with distinct middles spread over partitions
    assert len(np.unique(h1 % np.uint64(64))) > 32
    # empty + short strings don't crash
    short = pa.array(["", "a", "ab", "abcdefgh", "abcdefghi"])
    hs = _string_part_hash(short)
    assert len(hs) == 5 and len(np.unique(hs)) == 5


def test_join_null_keys_dropped_everywhere(rd):
    """Null keys never match (SQL equality): dropped from both sides in
    broadcast AND distributed modes of equi_join and semi_join."""
    import pyarrow as pa

    from raylink.joins import equi_join, semi_join

    left = rd.from_arrow(pa.table({
        "k": pa.array(["a", None, "b"]),
        "x": pa.array([1, 2, 3], pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array(["a", None]),
        "y": pa.array([10, 20], pa.int64()),
    }))
    for mode in ("broadcast", "distributed"):
        ej = equi_join(left, right, "k", "k", ("x",), ("y",),
                       mode=mode, output="dataset").to_pandas()
        assert sorted(ej["k"]) == ["a"], mode
        sj = semi_join(left, right, "k", "k", ("x",),
                       mode=mode, output="dataset").to_pandas()
        assert sorted(sj["k"]) == ["a"], mode
        aj = semi_join(left, right, "k", "k", ("x",), anti=True,
                       mode=mode, output="dataset").to_pandas()
        assert sorted(aj["k"]) == ["b"], mode


def test_equi_join_empty_right(rd):
    import pyarrow as pa

    from raylink.joins import equi_join

    left = rd.from_arrow(pa.table({"k": pa.array(["a"]),
                                   "x": pa.array([1], pa.int64())}))
    empty = rd.from_arrow(pa.table({"k": pa.array([], pa.string()),
                                    "y": pa.array([], pa.int64())}))
    out = equi_join(left, empty, "k", "k", ("x",), ("y",),
                    mode="broadcast", output="dataset").to_pandas()
    assert len(out) == 0


def test_reserved_staging_names_rejected(rd):
    """Payload column names that collide with the internal staging
    columns ('k'/'side'/'part'; +'t'/'lid'/'rid' for asof) raise loudly
    instead of being silently overwritten (ADVICE r3)."""
    import pyarrow as pa

    from raylink.joins import asof_join, equi_join, semi_join

    left = rd.from_arrow(pa.table({
        "key": pa.array([1, 2], pa.int64()),
        "part": pa.array([10, 20], pa.int64()),
        "ts": pa.array([1, 2], pa.int64()),
        "lid_": pa.array([1, 2], pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "key": pa.array([1], pa.int64()),
        "side": pa.array([5], pa.int64()),
        "ts": pa.array([0], pa.int64()),
        "rid_": pa.array([9], pa.int64()),
    }))
    with pytest.raises(ValueError, match="reserved"):
        equi_join(left, right, "key", "key", ("part",), ("rid_",))
    with pytest.raises(ValueError, match="reserved"):
        equi_join(left, right, "key", "key", ("lid_",), ("side",))
    with pytest.raises(ValueError, match="reserved"):
        semi_join(left, right, "key", "key", ("k",))
    with pytest.raises(ValueError, match="reserved"):
        asof_join(left, right, "key", "ts", "lid_", "rid_",
                  right_payload_cols=("side",))
    # names reserved only for asof stay usable in equi/semi
    ok = equi_join(left, right, "key", "key", ("lid_",), ("rid_",),
                   mode="distributed", output="pandas")
    assert list(ok["key"]) == [1]


def test_semi_join_empty_right_distributed(rd):
    """A zero-block (or empty) right side must not break semi_join's
    schema snapshot (taken BEFORE the null-filter wrap, ADVICE r3)."""
    import pyarrow as pa

    from raylink.joins import semi_join

    left = rd.from_arrow(pa.table({"key": pa.array(["a", "b"]),
                                   "x": pa.array([1, 2], pa.int64())}))
    empty = rd.from_arrow(pa.table({"key": pa.array([], pa.string())}))
    for mode in ("broadcast", "distributed"):
        out = semi_join(left, empty, "key", "key", ("x",),
                        mode=mode, output="pandas")
        assert len(out) == 0, mode
        anti = semi_join(left, empty, "key", "key", ("x",), anti=True,
                         mode=mode, output="pandas")
        assert sorted(anti["key"]) == ["a", "b"], mode


def test_effective_parts_input_sized(ray_session):
    """VERDICT r4 #1: the default partition count must grow with input
    rows/bytes (bounded per-partition payload) instead of staying fixed
    at CPUs*2, while keeping the CPU floor and the staging-modulus cap."""
    from raylink.joins import (
        _FINE_PARTS,
        _cpu_floor_parts,
        _effective_parts,
    )

    floor = _cpu_floor_parts()
    assert _effective_parts(0, 0) == floor
    assert _effective_parts(1_000_000, 0) == floor  # small: floor wins
    assert _effective_parts(1_000_000_000, 0) == max(floor, 1000)
    assert _effective_parts(0, 1 << 40) == max(floor, 8192)  # 1 TiB staged
    assert _effective_parts(10**12, 10**15) == _FINE_PARTS  # capped


def test_asof_interval_null_predicate_semantics(rd):
    """asof/interval drop null key/ts rows on both sides (the repo-wide
    join null semantics) instead of letting the int64 cast map nulls to
    INT64_MIN and join them to each other; null IDS raise loudly (they
    are outputs — silently corrupting them is worse than dropping)."""
    import pyarrow as pa

    from raylink.joins import asof_join, interval_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, None, None], pa.int64()),
        "ts": pa.array([10, 10, 11], pa.int64()),
        "lid": pa.array([0, 1, 2], pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array([1, None], pa.int64()),
        "ts": pa.array([5, 5], pa.int64()),
        "rid": pa.array([100, 101], pa.int64()),
        "val": pa.array([1.0, 2.0]),
    }))
    out = asof_join(left, right, "k", "ts", "lid", "rid",
                    right_payload_cols=("val",), output="pandas")
    assert list(zip(out["lid"], out["rid"])) == [(0, 100)]

    # null ts dropped too (the as-of comparison can't be satisfied)
    left2 = rd.from_arrow(pa.table({
        "k": pa.array([1, 1], pa.int64()),
        "ts": pa.array([10, None], pa.int64()),
        "lid": pa.array([0, 1], pa.int64()),
    }))
    out2 = asof_join(left2, right, "k", "ts", "lid", "rid",
                     right_payload_cols=("val",), output="pandas")
    assert list(out2["lid"]) == [0]

    # null id raises loudly
    left3 = rd.from_arrow(pa.table({
        "k": pa.array([1], pa.int64()),
        "ts": pa.array([10], pa.int64()),
        "lid": pa.array([None], pa.int64()),
    }))
    with pytest.raises(Exception, match="null"):
        asof_join(left3, right, "k", "ts", "lid", "rid",
                  output="pandas")

    ev = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, None, None], pa.int64()),
        "ts": pa.array([0, 5, 0, 5], pa.int64()),
        "i": pa.array([10, 11, 12, 13], pa.int64()),
    }))
    pairs = interval_join(ev, "k", "ts", "i", max_gap_us=100,
                          output="pandas")
    # only the non-null key's pair emits; null-key rows never pair
    assert list(zip(pairs["a"], pairs["b"])) == [(10, 11)]


def test_asof_empty_input_pandas(rd):
    """asof_join output='pandas' on an empty input must not KeyError on
    the sort columns (empty Datasets lose their schema through
    to_pandas — the _sorted_pandas rebuild the other joins already
    use)."""
    import pyarrow as pa

    from raylink.joins import asof_join

    empty_l = rd.from_arrow(pa.table({
        "k": pa.array([], pa.int64()),
        "ts": pa.array([], pa.int64()),
        "lid": pa.array([], pa.int64()),
    }))
    empty_r = rd.from_arrow(pa.table({
        "k": pa.array([], pa.int64()),
        "ts": pa.array([], pa.int64()),
        "rid": pa.array([], pa.int64()),
    }))
    out = asof_join(empty_l, empty_r, "k", "ts", "lid", "rid",
                    output="pandas")
    assert len(out) == 0


def test_stage_parts_rejects_nonpositive(rd):
    """n_parts=0 would make every staging kernel compute k % 0 = 0
    (numpy RuntimeWarning only) and collapse the whole shuffle into one
    mega-partition — reject loudly."""
    import pyarrow as pa

    from raylink.joins import equi_join

    left = rd.from_arrow(pa.table({"k": pa.array([1], pa.int64()),
                                   "a": pa.array([1], pa.int64()),
                                   "b": pa.array([2], pa.int64())}))
    with pytest.raises(ValueError, match="n_parts"):
        equi_join(left, left, "k", "k", ("a",), ("b",), n_parts=0,
                  mode="distributed")


def test_semi_join_schemaless_right(rd):
    """A mapped-to-nothing right side can lose its schema ENTIRELY
    (ds.schema() is None — e.g. connected-component labels of a dup-free
    corpus); its key set is empty, so semi keeps nothing and anti keeps
    everything, instead of crashing on rschema.names (r5 close-out)."""
    import pyarrow as pa

    from raylink.joins import semi_join

    left = rd.from_arrow(pa.table({"key": pa.array([1, 2], pa.int64()),
                                   "x": pa.array([7, 8], pa.int64())}))
    # map every block to zero rows AND zero columns -> schema() is None
    src = rd.from_arrow(pa.table({"key": pa.array([5], pa.int64())}))
    schemaless = src.map_batches(
        lambda b: pa.table({}), batch_format="pyarrow"
    )
    assert schemaless.schema() is None
    out = semi_join(left, schemaless, "key", "key", ("x",), output="pandas")
    assert len(out) == 0
    anti = semi_join(left, schemaless, "key", "key", ("x",), anti=True,
                     output="pandas")
    assert sorted(anti["key"]) == [1, 2]
