import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raylink.transcripts import (
    canonical_entity_names,
    entity_variants,
    generate_transcripts,
    labeled_pairs,
)


def test_generator_deterministic():
    t1, g1 = generate_transcripts(50, seed=42)
    t2, g2 = generate_transcripts(50, seed=42)
    assert t1.equals(t2)
    assert g1.equals(g2)
    t3, _ = generate_transcripts(50, seed=43)
    assert not t1.equals(t3)


def test_schema_matches_input_hint():
    t, _ = generate_transcripts(10)
    assert t.schema.names == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert t.schema.field("turn_idx").type == pa.int32()
    assert t.schema.field("ts").type == pa.timestamp("us")


def test_turns_contiguous_and_mention_planted():
    t, gt = generate_transcripts(30)
    df = t.to_pandas()
    for conv_id, grp in df.groupby("conv_id"):
        turns = sorted(grp["turn_idx"].tolist())
        assert turns == list(range(len(turns)))
    gtd = gt.to_pandas().set_index("conv_id")
    turn0 = df[df.turn_idx == 0].set_index("conv_id")
    for conv_id, row in turn0.iterrows():
        variant = gtd.loc[conv_id, "variant"]
        assert f'"{variant}"' in row["text"]


def test_rows_are_shuffled():
    t, _ = generate_transcripts(30)
    turn = t["turn_idx"].to_numpy()
    # a sorted-by-conversation table would have long runs of 0,1,2...
    assert not np.all(np.diff(turn)[:50] >= 0)


def test_hot_block_key():
    _, gt = generate_transcripts(300)
    keys = gt["block_key"].to_pylist()
    vals, counts = np.unique(np.asarray(keys, dtype=object), return_counts=True)
    top = counts.max() / counts.sum()
    assert top > 0.2  # the hot key holds a disproportionate share


def test_variants_similarity_graded():
    names = canonical_entity_names(100)
    variants, eids = entity_variants(names)
    assert len(set(names)) == 100
    assert len(variants) >= 100
    # first variant of each entity is the canonical name
    first_idx = np.unique(eids, return_index=True)[1]
    for i in first_idx:
        assert variants[i] == names[eids[i]]


def test_labeled_pairs():
    _, gt = generate_transcripts(60)
    pairs = labeled_pairs(gt).to_pandas()
    assert set(pairs.columns) == {"entity_a", "entity_b", "block_key", "is_match"}
    pos = pairs[pairs.is_match]
    neg = pairs[~pairs.is_match]
    assert len(pos) > 0
    assert len(neg) >= len(pos) * 3
    # positives really are same-entity pairs
    gtd = gt.to_pandas()
    v2e = dict(zip(gtd["variant"], gtd["entity_id"]))
    for _, r in pos.head(50).iterrows():
        assert v2e[r.entity_a] == v2e[r.entity_b]


def test_read_parquet_with_row_order(ray_session, tmp_path):
    """Reader contract: row_order equals the global position over sorted
    files × row groups, derived from footers only; columns prune."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raylink.sources import read_parquet_with_row_order

    d = tmp_path / "src"
    d.mkdir()
    n_per = [5, 3, 7]
    off = 0
    for i, n in enumerate(n_per):
        pq.write_table(
            pa.table(
                {
                    "x": pa.array(np.arange(off, off + n, dtype=np.int64)),
                    "y": pa.array(["v"] * n),
                    "z": pa.array(np.zeros(n)),
                }
            ),
            str(d / f"part-{i:03d}.parquet"),
        )
        off += n
    ds = read_parquet_with_row_order(str(d), columns=["x", "y"])
    pdf = ds.to_pandas().sort_values("row_order", ignore_index=True)
    assert list(pdf.columns) == ["x", "y", "row_order"]  # z pruned
    assert pdf["row_order"].tolist() == list(range(sum(n_per)))
    # row_order i corresponds to the i-th row in (file, row) order
    assert pdf["x"].tolist() == list(range(sum(n_per)))


def test_ordered_seq_agg_empty_inputs(ray_session):
    """Empty inputs return the typed AGGREGATE schema (the zero-block
    path used to return the sorted INPUT dataset — wrong columns), and a
    schema-less all-empty input raises a clear error instead of a
    KeyError inside a Ray task (round-5 review finding)."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from raylink.groupseq import ordered_seq_agg

    t = pa.table({
        "conv": pa.array([], pa.int64()),
        "ts": pa.array([], pa.int64()),
        "tool": pa.array([], pa.string()),
    })
    import ray

    out_ds = ordered_seq_agg(rd.from_arrow(t), "conv", ["ts"], count_name="n",
                             firsts=(("ts", "first_ts"),),
                             joins=(("tool", "seq", "|"),))
    tabs = ray.get(out_ds.to_arrow_refs())
    # every block carries the typed AGGREGATE schema (to_pandas on an
    # all-empty Dataset drops columns — a Ray-wide behavior; the blocks
    # are what downstream Arrow consumers see)
    assert tabs and all(
        t_.column_names == ["conv", "n", "first_ts", "seq"] for t_ in tabs
    )
    assert sum(t_.num_rows for t_ in tabs) == 0

    lost = rd.from_arrow(pa.table({
        "conv": pa.array([1], pa.int64()),
        "ts": pa.array([1], pa.int64()),
        "tool": pa.array(["x"], pa.string()),
    })).filter(lambda r: False)
    with pytest.raises(Exception, match="schema"):
        ordered_seq_agg(lost, "conv", ["ts"], count_name="n").to_pandas()


def test_ordered_seq_agg_duplicate_order_rows_raise(ray_session):
    """Duplicate (key, order) rows make the ordered join nondeterministic
    (the sort leaves tie order arbitrary) — loud rejection, the
    lag_payload discipline. Distinct keys sharing an order value stay
    legal."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from raylink.groupseq import ordered_seq_agg

    dup = pa.table({
        "conv": pa.array([1, 1, 2], pa.int64()),
        "ts": pa.array([5, 5, 5], pa.int64()),
        "tool": pa.array(["a", "b", "c"], pa.string()),
    })
    with pytest.raises(Exception, match="duplicate"):
        ordered_seq_agg(
            rd.from_arrow(dup), "conv", ["ts"],
            joins=(("tool", "seq", "|"),),
        ).to_pandas()
    ok = pa.table({
        "conv": pa.array([1, 2, 1], pa.int64()),
        "ts": pa.array([5, 5, 6], pa.int64()),
        "tool": pa.array(["a", "c", "b"], pa.string()),
    })
    out = ordered_seq_agg(
        rd.from_arrow(ok), "conv", ["ts"], joins=(("tool", "seq", "|"),),
    ).to_pandas().sort_values("conv", ignore_index=True)
    assert out["seq"].tolist() == ["a|b", "c"]
