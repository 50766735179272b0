"""Deterministic hash sampling: partition-invariance, stratum rates,
split disjointness, and direct-kernel parity."""

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


def _docs_table(n=4000, seed=3):
    rng = np.random.default_rng(seed)
    langs = np.array(["en", "de", "fr", "xx"])[rng.integers(0, 4, n)]
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "lang": pa.array(langs),
        }
    )


def test_hash_sample_deterministic_and_partition_invariant(rd):
    from raylink.sampling import hash_sample, sample_bucket

    tbl = _docs_table()
    a = hash_sample(rd.from_arrow(tbl).repartition(7), "doc_id", 0.3, seed=11)
    b = hash_sample(rd.from_arrow(tbl).repartition(2), "doc_id", 0.3, seed=11)
    ga = sorted(a.to_pandas()["doc_id"])
    gb = sorted(b.to_pandas()["doc_id"])
    assert ga == gb
    # exact parity with the kernel applied directly
    ids = np.arange(tbl.num_rows, dtype=np.int64)
    want = sorted(ids[sample_bucket(ids, 11) < 3000])
    assert ga == want
    # a different seed selects a different set
    c = hash_sample(rd.from_arrow(tbl), "doc_id", 0.3, seed=12)
    assert sorted(c.to_pandas()["doc_id"]) != ga


def test_hash_sample_rate_roughly_honored(rd):
    from raylink.sampling import hash_sample

    ds = rd.from_arrow(_docs_table(n=10000))
    got = hash_sample(ds, "doc_id", 0.25, seed=5).count()
    assert abs(got / 10000 - 0.25) < 0.02


def test_stratified_sample_per_stratum_thresholds(rd):
    from raylink.sampling import sample_bucket, stratified_sample

    tbl = _docs_table()
    rates = {"en": 0.5, "de": 0.2}
    out = stratified_sample(
        rd.from_arrow(tbl).repartition(5),
        "doc_id",
        "lang",
        rates,
        default_rate=0.05,
        seed=9,
    ).to_pandas()
    ids = np.asarray(tbl["doc_id"])
    langs = np.asarray(tbl["lang"])
    bp = np.where(langs == "en", 5000, np.where(langs == "de", 2000, 500))
    keep = sample_bucket(ids, 9) < bp
    want = (
        pd.DataFrame({"doc_id": ids[keep], "lang": langs[keep]})
        .reset_index(drop=True)
    )
    got = out.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_split_by_hash_disjoint_exhaustive(rd):
    from raylink.sampling import split_by_hash

    tbl = _docs_table(n=5000)
    out = split_by_hash(
        rd.from_arrow(tbl).repartition(4), "doc_id", seed=21
    ).to_pandas()
    assert len(out) == 5000 and out["doc_id"].is_unique
    frac = out["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.02
    assert abs(frac["val"] - 0.1) < 0.01
    assert abs(frac["test"] - 0.1) < 0.01
    # same seed -> identical assignment regardless of partitioning
    out2 = split_by_hash(rd.from_arrow(tbl), "doc_id", seed=21).to_pandas()
    m = out.sort_values("doc_id").reset_index(drop=True)
    m2 = out2.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(m, m2)


def test_split_by_hash_rejects_non_unit_sum(rd):
    from raylink.sampling import split_by_hash

    with pytest.raises(ValueError):
        split_by_hash(
            rd.from_arrow(_docs_table(16)),
            "doc_id",
            splits=(("a", 0.5), ("b", 0.4)),
        )


def test_split_by_key_group_coherent(rd):
    """Every row sharing a key lands in the same split, regardless of
    partitioning, and realized proportions are in the right ballpark
    when keys are plentiful."""
    from raylink.sampling import split_by_key

    n = 6000
    keys = pa.array([f"domain-{i % 500}.com" for i in range(n)])
    tbl = pa.table(
        {"doc_id": pa.array(np.arange(n, dtype=np.int64)), "host": keys}
    )
    out = split_by_key(
        rd.from_arrow(tbl).repartition(5), "host", seed=9
    ).to_pandas()
    assert len(out) == n
    per_key = out.groupby("host")["split"].nunique()
    assert (per_key == 1).all()
    frac = out["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.1
    # partition-invariant
    out2 = split_by_key(rd.from_arrow(tbl), "host", seed=9).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        out2.sort_values("doc_id").reset_index(drop=True),
    )


def test_split_by_key_matches_direct_kernel(rd):
    """Brute parity: bucket = splitmix64(splitmix64(fnv64(key)) + seed)
    % 10000 against the cuts, computed directly."""
    from raylink.blocking import _fnv64_fold_rows, _hash64
    from raylink.sampling import sample_bucket, split_by_key

    keys = pa.array(["", "a", "aa", "web.example", "éclair", "x" * 300])
    tbl = pa.table(
        {"doc_id": pa.array(np.arange(6, dtype=np.int64)), "k": keys}
    )
    out = (
        split_by_key(rd.from_arrow(tbl), "k", seed=42)
        .to_pandas()
        .sort_values("doc_id")
    )
    kh = _hash64(_fnv64_fold_rows(keys, False).astype(np.int64)).astype(
        np.int64
    )
    b = sample_bucket(kh, 42)
    want = np.where(b < 8000, "train", np.where(b < 9000, "val", "test"))
    assert list(out["split"]) == list(want)


def test_split_by_key_int_key_equals_split_by_hash(rd):
    from raylink.sampling import split_by_hash, split_by_key

    tbl = _docs_table(n=2000)
    a = split_by_key(rd.from_arrow(tbl), "doc_id", seed=3).to_pandas()
    b = split_by_hash(rd.from_arrow(tbl), "doc_id", seed=3).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True),
    )


def test_split_by_key_guards(rd):
    from raylink.sampling import split_by_hash, split_by_key

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "k": pa.array(["a", None]),
            "f": pa.array([1.0, 2.0]),
        }
    )
    ds = rd.from_arrow(tbl)
    with pytest.raises(Exception, match="null"):
        split_by_key(ds, "k", seed=1).materialize()
    with pytest.raises(Exception, match="string or integer"):
        split_by_key(ds, "f", seed=1).materialize()
    # uint64 keys would wrap silently through the int64 bucket view
    u64 = rd.from_arrow(pa.table({"u": pa.array([1, 2], pa.uint64())}))
    with pytest.raises(Exception, match="uint64"):
        split_by_key(u64, "u", seed=1).materialize()
    # pre-existing split column rejected (both splitters)
    tagged = rd.from_arrow(tbl.drop_columns(["k"]).append_column(
        "split", pa.array(["x", "y"])
    ))
    with pytest.raises(Exception, match="already has a column"):
        split_by_key(tagged, "doc_id", seed=1).materialize()
    with pytest.raises(Exception, match="already has a column"):
        split_by_hash(tagged, "doc_id", seed=1).materialize()
    # a split label colliding with split_col is ambiguous
    with pytest.raises(ValueError, match="collides"):
        split_by_key(
            ds, "doc_id", splits=(("s", 1.0),), split_col="s"
        )


def test_epoch_order_deterministic_and_epoch_varying(rd):
    import pyarrow as pa

    from raylink.sampling import epoch_order

    tbl = pa.table({"doc_id": pa.array(np.arange(100, dtype=np.int64))})
    for parts in (1, 5):
        ds = rd.from_arrow(tbl).repartition(parts)
        a = epoch_order(ds, "doc_id", epoch=1).to_pandas().sort_values(
            "doc_id", ignore_index=True)
        b = epoch_order(rd.from_arrow(tbl), "doc_id", epoch=1).to_pandas(
            ).sort_values("doc_id", ignore_index=True)
        pd.testing.assert_frame_equal(a, b)  # partition/replay invariant
    e2 = epoch_order(rd.from_arrow(tbl), "doc_id", epoch=2).to_pandas(
        ).sort_values("doc_id", ignore_index=True)
    # different epochs give a different permutation
    assert (a["shuffle_key"] != e2["shuffle_key"]).any()
    order1 = a.sort_values("shuffle_key")["doc_id"].tolist()
    order2 = e2.sort_values("shuffle_key")["doc_id"].tolist()
    assert order1 != order2
    assert sorted(order1) == sorted(order2)  # both are full permutations
    assert (a["shuffle_key"] >= 0).all()


def test_cap_per_key_brute_parity_and_paths(rd):
    import pyarrow as pa

    from raylink.blocking import _hash64
    from raylink.sampling import cap_per_key

    rng = np.random.default_rng(7)
    n = 3000
    keys = [f"dom{v}.com" for v in rng.integers(0, 25, n)]
    ids = rng.permutation(n).astype(np.int64)
    tbl = pa.table(
        {
            "source": pa.array(keys),
            "doc_id": pa.array(ids),
            "x": pa.array(rng.integers(0, 9, n)),
        }
    )
    ds = rd.from_arrow(tbl).repartition(7)
    got = cap_per_key(
        ds, "source", "doc_id", cap=10, seed=3, cols=("source", "x"),
        output="pandas",
    )
    df = tbl.to_pandas()
    df["h"] = _hash64(df.doc_id.to_numpy() + np.int64(3))
    keep = df.sort_values(["h", "doc_id"]).groupby("source").head(10)
    exp = (
        df[df.doc_id.isin(keep.doc_id)][["doc_id", "source", "x"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))
    # forced shuffle path and pinned n_parts — value-identical
    forced = cap_per_key(
        ds, "source", "doc_id", cap=10, seed=3, cols=("source", "x"),
        output="pandas", driver_merge_max_rows=0,
    )
    pd.testing.assert_frame_equal(got, forced)
    pinned = cap_per_key(
        ds, "source", "doc_id", cap=10, seed=3, cols=("source", "x"),
        output="pandas", driver_merge_max_rows=0, n_parts=3,
    )
    pd.testing.assert_frame_equal(got, pinned)


def test_cap_per_key_int_key_and_guards(rd):
    import pyarrow as pa
    import pytest

    from raylink.sampling import cap_per_key

    ds = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(np.arange(200, dtype=np.int64) % 5),
                "doc_id": pa.array(np.arange(200, dtype=np.int64)),
            }
        )
    ).repartition(3)
    got = cap_per_key(ds, "k", "doc_id", cap=7, output="pandas")
    assert len(got) == 35 and list(got.columns) == ["doc_id"]
    # cap >= group size keeps everything
    allkept = cap_per_key(ds, "k", "doc_id", cap=100, output="pandas")
    assert len(allkept) == 200
    with pytest.raises(Exception, match="duplicate id"):
        cap_per_key(
            rd.from_arrow(
                pa.table({"k": pa.array(["a", "a"]), "doc_id": pa.array([5, 5])})
            ),
            "k", "doc_id", cap=1, output="pandas",
        )
    with pytest.raises(Exception, match="null"):
        cap_per_key(
            rd.from_arrow(
                pa.table({"k": pa.array(["a", None]), "doc_id": pa.array([1, 2])})
            ),
            "k", "doc_id", cap=1, output="pandas",
        )
    with pytest.raises(ValueError, match="cap"):
        cap_per_key(ds, "k", "doc_id", cap=0, output="pandas")


def test_sample_n_exact_count_and_parity(rd):
    import pyarrow as pa
    import pytest

    from raylink.blocking import _hash64
    from raylink.sampling import sample_n

    rng = np.random.default_rng(11)
    ids = rng.permutation(1000).astype(np.int64)
    tbl = pa.table(
        {"doc_id": pa.array(ids), "x": pa.array(rng.integers(0, 9, 1000))}
    )
    ds = rd.from_arrow(tbl).repartition(6)
    got = sample_n(ds, "doc_id", n=57, seed=4, cols=("x",), output="pandas")
    assert len(got) == 57
    # brute force: 57 smallest (h, id)
    df = tbl.to_pandas()
    df["h"] = _hash64(df.doc_id.to_numpy() + np.int64(4))
    exp = (
        df.sort_values(["h", "doc_id"]).head(57)[["doc_id", "x"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp.astype(got.dtypes.to_dict()))
    # forced tiny-chunk rolling merge parity (every partial folds alone)
    import raylink.sampling as sampling_mod

    old = sampling_mod._SAMPLE_MERGE_CHUNK_ROWS
    sampling_mod._SAMPLE_MERGE_CHUNK_ROWS = 1
    try:
        forced = sample_n(
            ds, "doc_id", n=57, seed=4, cols=("x",), output="pandas"
        )
    finally:
        sampling_mod._SAMPLE_MERGE_CHUNK_ROWS = old
    pd.testing.assert_frame_equal(got, forced)
    assert len(sample_n(ds, "doc_id", n=5000, output="pandas")) == 1000
    with pytest.raises(ValueError, match="n must be"):
        sample_n(ds, "doc_id", n=0, output="pandas")


def test_reserved_staging_names_rejected(rd):
    # the joins-family policy: user columns named like internal staging
    # columns must collide loudly, not be silently overwritten
    from raylink.sampling import cap_per_key, epoch_order, sample_n

    tbl = pa.table({"h": pa.array([1, 2, 3]), "part": pa.array([0, 1, 0]),
                    "doc_id": pa.array([1, 2, 3])})
    ds = rd.from_arrow(tbl)
    with pytest.raises(ValueError, match="reserved"):
        cap_per_key(ds, "part", "h", cap=1)
    with pytest.raises(ValueError, match="reserved"):
        cap_per_key(ds, "part", "doc_id", cap=1, cols=("h",))
    with pytest.raises(ValueError, match="reserved"):
        sample_n(ds, "h", n=1)
    with pytest.raises(ValueError, match="reserved"):
        sample_n(ds, "doc_id", n=1, cols=("h",))
    with pytest.raises(ValueError, match="reserved"):
        epoch_order(
            rd.from_arrow(pa.table({"shuffle_key": pa.array([1, 2])})),
            "shuffle_key",
        )


def test_cap_per_key_rejects_float_keys(rd):
    from raylink.sampling import cap_per_key

    ds = rd.from_arrow(
        pa.table({"k": pa.array([1.0, 2.0]), "doc_id": pa.array([1, 2])})
    )
    with pytest.raises(Exception, match="float key"):
        cap_per_key(ds, "k", "doc_id", cap=1, output="pandas")


def test_mix_quotas_largest_remainder():
    from raylink.sampling import _mix_quotas

    names, q = _mix_quotas(150, {"en": 50, "de": 20, "es": 15, "fr": 10})
    assert dict(zip(names, q.tolist())) == {
        "de": 31, "en": 79, "es": 24, "fr": 16
    }
    assert q.sum() == 150
    # remainder ties break to the SMALLER key (the SQL ORDER BY rem DESC,
    # key ASC replay): n=5, equal weights over 3 keys -> floors 1,1,1 and
    # the 2 residual units go to 'a' and 'b'
    names, q = _mix_quotas(5, {"c": 1, "a": 1, "b": 1})
    assert dict(zip(names, q.tolist())) == {"a": 2, "b": 2, "c": 1}
    import pytest

    with pytest.raises(ValueError, match="positive INTEGERS"):
        _mix_quotas(10, {"a": 0.5})
    with pytest.raises(ValueError, match="positive INTEGERS"):
        _mix_quotas(10, {"a": 0})
    with pytest.raises(ValueError, match="non-empty"):
        _mix_quotas(10, {})


def test_sample_mix_brute_parity_and_paths(rd):
    import pyarrow as pa
    import pytest

    from raylink.blocking import _hash64
    from raylink.sampling import _mix_quotas, sample_mix

    rng = np.random.default_rng(21)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(400, dtype=np.int64),
            "lang": rng.choice(
                ["en", "de", "es", "fr", "zh"], 400, p=[0.4, 0.15, 0.15, 0.1, 0.2]
            ),
        }
    )
    ds = rd.from_pandas(df).repartition(5)
    weights = {"en": 50, "de": 20, "es": 15, "fr": 10}
    got = sample_mix(
        ds, "lang", "doc_id", 150, weights, seed=7, cols=("lang",),
        output="pandas",
    )
    # brute-force: per-key quota smallest (splitmix64(id+7), id)
    names, q = _mix_quotas(150, weights)
    want = set()
    for k, m in zip(names, q):
        sub = df[df.lang == k]
        h = _hash64(sub["doc_id"].to_numpy(np.int64) + np.int64(7))
        o = np.lexsort((sub["doc_id"].to_numpy(), h))
        want |= set(sub["doc_id"].to_numpy()[o][:m])
    assert set(got["doc_id"]) == want and len(got) == 150
    # zh (unlisted) never appears
    assert not (got["lang"] == "zh").any()
    # forced distributed merge + pinned n_parts are value-identical
    for kw in ({"driver_merge_max_rows": 0},
               {"driver_merge_max_rows": 0, "n_parts": 3}):
        alt = sample_mix(ds, "lang", "doc_id", 150, weights, seed=7,
                         cols=("lang",), output="pandas", **kw)
        pd.testing.assert_frame_equal(got, alt)
    # quota above availability keeps every row of that key, output short
    # quotas: fr 39501//100=395 rem 1, de 399//100=3 rem 99; residual 1
    # unit -> de (larger remainder) => fr 395 (capped at availability),
    # de 4
    short = sample_mix(ds, "lang", "doc_id", 399, {"fr": 99, "de": 1},
                       output="pandas")
    n_fr = int((df.lang == "fr").sum())
    assert n_fr < 395  # the fixture really is short on fr
    assert len(short) == n_fr + 4
    assert set(short["doc_id"]) >= set(df[df.lang == "fr"]["doc_id"])
    # guards: null keys, mixed key types, bad n
    with pytest.raises(Exception, match="null"):
        sample_mix(
            rd.from_arrow(pa.table({"k": pa.array(["a", None]),
                                    "doc_id": pa.array([1, 2])})),
            "k", "doc_id", 1, {"a": 1}, output="pandas",
        )
    with pytest.raises(ValueError, match="all-string or all-int"):
        sample_mix(ds, "lang", "doc_id", 10, {"en": 1, 3: 1})
    with pytest.raises(ValueError, match="n must be"):
        sample_mix(ds, "lang", "doc_id", 0, weights)
    with pytest.raises(ValueError, match="reserved"):
        sample_mix(ds, "lang", "doc_id", 10, weights, cols=("h",))
    # review findings: n_parts=0 must raise (k % 0 silently collapses the
    # shuffle), and an int key column vs string weight keys must raise
    # (index_in silently matches by decimal rendering)
    with pytest.raises(Exception, match="n_parts"):
        sample_mix(ds, "lang", "doc_id", 10, weights,
                   driver_merge_max_rows=0, n_parts=0, output="pandas")
    int_ds = rd.from_arrow(pa.table({
        "dom": pa.array(np.array([0, 1, 2], np.int64)),
        "doc_id": pa.array(np.array([0, 1, 2], np.int64)),
    }))
    with pytest.raises(Exception, match="does not match the weight"):
        sample_mix(int_ds, "dom", "doc_id", 2, {"0": 1, "1": 1},
                   output="pandas")


def test_sample_mix_int_keys(rd):
    import pyarrow as pa

    from raylink.sampling import sample_mix

    ds = rd.from_arrow(
        pa.table(
            {
                "dom": pa.array(np.arange(300, dtype=np.int64) % 6),
                "doc_id": pa.array(np.arange(300, dtype=np.int64)),
            }
        )
    ).repartition(4)
    got = sample_mix(ds, "dom", "doc_id", 30, {0: 1, 2: 1, 4: 1},
                     cols=("dom",), output="pandas")
    assert len(got) == 30
    assert set(got["dom"].unique()) == {0, 2, 4}
    assert got.groupby("dom").size().tolist() == [10, 10, 10]


def test_weighted_hash_sample(rd):
    from raylink.sampling import sample_bucket, weighted_hash_sample

    n = 4000
    ids = np.arange(n, dtype=np.int64)
    w = (ids % 7).astype(np.int64)  # weights 0..6, zeros never kept
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids), "w": pa.array(w)})
    ).repartition(5)
    out = weighted_hash_sample(ds, "doc_id", "w", bp_per_unit=800, seed=9)
    got = sorted(out.to_pandas()["doc_id"].tolist())
    thr = np.minimum(w * 800, 10000)
    exp = sorted(ids[sample_bucket(ids, 9) < thr].tolist())
    assert got == exp
    assert not any(w[i] == 0 for i in got)
    # partition invariance (membership is a pure row function)
    out2 = weighted_hash_sample(
        ds.repartition(17), "doc_id", "w", bp_per_unit=800, seed=9
    )
    assert sorted(out2.to_pandas()["doc_id"].tolist()) == exp
    # huge weights clamp to always-keep without overflowing
    big = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "w": pa.array([2**62, 10**18], pa.int64()),
            }
        )
    )
    kept = weighted_hash_sample(big, "doc_id", "w", bp_per_unit=2).to_pandas()
    assert sorted(kept["doc_id"].tolist()) == [1, 2]
    # guards
    with pytest.raises(ValueError, match="bp_per_unit"):
        weighted_hash_sample(ds, "doc_id", "w", bp_per_unit=0)
    neg = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array([1], pa.int64()), "w": pa.array([-1], pa.int64())}
        )
    )
    with pytest.raises(Exception, match="negative"):
        weighted_hash_sample(neg, "doc_id", "w", bp_per_unit=1).to_pandas()
    flt = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array([1], pa.int64()), "w": pa.array([1.5])}
        )
    )
    with pytest.raises(Exception, match="signed int64"):
        weighted_hash_sample(flt, "doc_id", "w", bp_per_unit=1).to_pandas()
