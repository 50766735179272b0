import numpy as np
import pandas as pd
import pytest

from raylink import PolyMatch, TFIDFMatcher
from raylink.linkage import (
    UnionFind,
    connected_components_labels,
    single_linkage,
    single_linkage_arrays,
)


def frame(rows):
    return pd.DataFrame(rows, columns=["From", "To", "Similarity"])


def test_cluster_zero_steal():
    """A string in cluster 0 is indistinguishable from unmapped (truthy
    .get, polyfuzz/linkage.py:33-39) and gets silently re-assigned."""
    m = frame([("a", "b", 0.9), ("a", "c", 0.9)])
    clusters, mapping, names = single_linkage(m, 0.8)
    # row 1: a is in cluster 0 (falsy) -> treated as unmapped -> c gets
    # cluster 1 and a is re-assigned to 1; b stays stranded in cluster 0.
    assert mapping == {"b": 0, "a": 1, "c": 1}
    assert clusters == {0: ["b"], 1: ["a", "c"]}
    assert names == {"b": "b", "a": "a", "c": "a"}


def test_from_already_mapped_skips_row():
    """From mapped to a truthy cluster -> row skipped entirely; To never
    joins (polyfuzz/linkage.py:33)."""
    m = frame([("x", "y", 0.9), ("a", "b", 0.9), ("a", "z", 0.9)])
    clusters, mapping, names = single_linkage(m, 0.8)
    assert "z" not in mapping  # transitivity deliberately broken
    assert mapping == {"y": 0, "x": 0, "b": 1, "a": 1}


def test_strict_threshold():
    m = frame([("a", "b", 0.8), ("c", "d", 0.80001)])
    clusters, mapping, _ = single_linkage(m, 0.8)
    assert "a" not in mapping and "b" not in mapping
    assert mapping == {"d": 0, "c": 0}


def test_representative_is_first_inserted():
    m = frame([("f1", "t1", 0.9), ("f2", "t1", 0.9)])
    clusters, mapping, names = single_linkage(m, 0.8)
    # row 1: t1 -> 0, f1 -> 0. row 2: t1's cluster 0 is FALSY, so t1 is
    # re-assigned to a fresh cluster 1 with f2 (the steal hits To as well);
    # f1 stays stranded in cluster 0.
    assert mapping == {"t1": 1, "f1": 0, "f2": 1}
    assert clusters == {1: ["t1", "f2"], 0: ["f1"]}
    assert names == {"t1": "t1", "f1": "f1", "f2": "t1"}


def test_reference_golden_clusters(fixture_lists):
    from_list, to_list = fixture_lists
    model = PolyMatch("TF-IDF").match(from_list, to_list)
    model.group(link_min_similarity=0.75)
    assert model.get_clusters() == {1: ["apples", "apple"]}
    assert model.get_cluster_mappings() == {"apples": 1, "apple": 1}
    assert list(model.get_matches().columns) == ["From", "To", "Similarity", "Group"]


def test_reference_golden_clusters_self(fixture_lists):
    from_list, _ = fixture_lists
    model = PolyMatch("TF-IDF").match(from_list, from_list)
    model.group(link_min_similarity=0.75, group_all_strings=True)
    assert model.get_clusters() == {1: ["apples", "apple", "appl"]}
    assert model.get_cluster_mappings() == {"apples": 1, "apple": 1, "appl": 1}


@pytest.mark.parametrize(
    "min_similarity", [0, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0]
)
def test_threshold_sweep_invariants(min_similarity, fixture_lists):
    """Replicates tests/test_linkage.py:12-31 of the reference."""
    from_list, to_list = fixture_lists
    matches = TFIDFMatcher(cosine_method="sparse").match(from_list, to_list)
    clusters, mapping, names = single_linkage(matches, min_similarity)
    if min_similarity == 1.0:
        assert clusters == {} and mapping == {} and names == {}
    elif min_similarity >= 0.8:
        assert max(mapping.values()) == 1
        assert len(names) == 2
    elif min_similarity >= 0.6:
        assert max(mapping.values()) > 1
        assert len(names) == 3


def test_single_linkage_arrays_matches_frame():
    rows = [
        ("a", "b", 0.9),
        ("a", "c", 0.9),
        ("x", "y", 0.95),
        ("q", "b", 0.85),
        ("low", "b", 0.5),
    ]
    m = frame(rows)
    clusters, mapping, names = single_linkage(m, 0.8)
    members, cids, reps = single_linkage_arrays(
        m["From"].to_numpy(object), m["To"].to_numpy(object), m["Similarity"].to_numpy(), 0.8
    )
    assert dict(zip(members.tolist(), cids.tolist())) == mapping
    assert dict(zip(members.tolist(), reps.tolist())) == names


def test_union_find_and_components():
    left = np.array(["a", "b", "x"], dtype=object)
    right = np.array(["b", "c", "y"], dtype=object)
    labels = connected_components_labels(left, right)
    assert labels["a"] == labels["b"] == labels["c"] == "a"
    assert labels["x"] == labels["y"] == "x"
    uf = UnionFind()
    uf.union(1, 2)
    uf.union(3, 2)
    assert uf.find(3) == uf.find(1)


def test_distributed_connected_components():
    import pyarrow as pa
    import pytest

    pytest.importorskip("ray")
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from raylink.linkage import distributed_connected_components

    # two chains + a singleton-free edge set: {1-2-3-4}, {10-11}, {20-21-22}
    edges = pa.table(
        {
            "a": pa.array([1, 2, 3, 10, 20, 21], type=pa.int64()),
            "b": pa.array([2, 3, 4, 11, 21, 22], type=pa.int64()),
        }
    )
    labels = distributed_connected_components(rd.from_arrow(edges)).to_pandas()
    got = dict(zip(labels["node"], labels["label"]))
    assert got[1] == got[2] == got[3] == got[4] == 1
    assert got[10] == got[11] == 10
    assert got[20] == got[21] == got[22] == 20


def test_cc_high_diameter_chain_converges(ray_session):
    """A path-graph component whose diameter exceeds the round cap must
    still resolve to ONE component (pointer-jumping shortcut: O(log
    diameter) rounds; the old one-hop propagation silently returned the
    chain SPLIT into several labels — round-5 review finding). Both
    modes, with a cap far below the diameter."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from raylink.linkage import distributed_connected_components

    n = 200  # diameter 199 >> max_iters=12
    edges = pa.table({
        "a": pa.array(np.arange(n - 1, dtype=np.int64)),
        "b": pa.array(np.arange(1, n, dtype=np.int64)),
    })
    for force_partition in (False, True):
        labels = distributed_connected_components(
            rd.from_arrow(edges).repartition(3),
            "a", "b",
            max_iters=12,
            broadcast_max_nodes=0 if force_partition else 2_000_000,
        ).to_pandas().sort_values("node", ignore_index=True)
        assert len(labels) == n
        assert (labels["label"] == 0).all(), (
            f"mode={'partition' if force_partition else 'broadcast'} "
            "split the chain"
        )


def test_distributed_connected_components_zero_edges(ray_session):
    """Zero edges (a dup-free corpus) must yield a typed empty (node,
    label) Dataset instead of crashing on a schema-less node table
    (r5 close-out: semantic_dedup's default path on clean corpora)."""
    import pyarrow as pa
    import ray.data as rd

    from raylink.linkage import distributed_connected_components

    empty = rd.from_arrow(pa.table({"a": pa.array([], pa.int64()),
                                    "b": pa.array([], pa.int64())}))
    labels = distributed_connected_components(empty)
    tbl = pa.concat_tables(
        [t for t in __import__("ray").get(labels.to_arrow_refs())]
    )
    assert tbl.num_rows == 0
    assert set(tbl.column_names) == {"node", "label"}
