"""Quirk-exact single linkage + cross-block union-find.

``single_linkage`` replays polyfuzz/linkage.py:5-53 verbatim in semantics —
it is NOT connected components:

  * rows filtered ``Similarity > min_similarity`` (strict, linkage.py:25);
  * rows scanned in FRAME ORDER (linkage.py:30) — order-sensitive;
  * membership tests use dict truthiness (``if not cluster_mapping.get(x)``,
    linkage.py:33,36), so cluster id 0 is indistinguishable from unmapped:
    a string in cluster 0 can be silently re-assigned ("cluster-0 steal"),
    and a From already in a truthy cluster skips the row entirely (its To
    never joins — transitivity deliberately broken, the reference's tests
    codify the resulting ids, tests/test_polyfuzz.py:85-86,99-100);
  * representative = first member inserted into the cluster (linkage.py:51).

The distributed engine runs this exact sequential algorithm per block inside
``groupby(block_key).map_groups`` with rows pre-sorted by ``row_order``;
``UnionFind`` exists for cross-block merging of representatives (edge volume
is tiny post-blocking) and for the near-dup pipelines, where plain connected
components IS the desired semantics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def single_linkage(
    matches: pd.DataFrame, min_similarity: float = 0.8
) -> tuple[dict[int, list[str]], dict[str, int], dict[str, str]]:
    """Exact reference algorithm over a (From, To, Similarity) frame."""
    sel = matches.loc[matches.Similarity > min_similarity, :]
    cluster_mapping: dict[str, int] = {}
    cluster_id = 0
    for frm, to in zip(sel["From"].tolist(), sel["To"].tolist()):
        if not cluster_mapping.get(frm):
            if not cluster_mapping.get(to):
                cluster_mapping[to] = cluster_id
                cluster_mapping[frm] = cluster_id
                cluster_id += 1
            else:
                cluster_mapping[frm] = cluster_mapping.get(to)
    clusters: dict[int, list[str]] = {}
    for key, value in cluster_mapping.items():
        clusters.setdefault(value, [])
        clusters[value].append(key)
    cluster_name_map = {
        key: clusters.get(value)[0] for key, value in cluster_mapping.items()
    }
    return clusters, cluster_mapping, cluster_name_map


def single_linkage_arrays(
    from_arr: np.ndarray,
    to_arr: np.ndarray,
    sims: np.ndarray,
    min_similarity: float,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Array-shaped variant for use inside ``map_groups``: rows must already
    be in frame order (sorted by the carried ``row_order`` column).

    Returns (member, cluster_id, representative) arrays — the normalized
    cluster table of SURVEY §1.2. Membership insertion order is preserved so
    representatives match the reference's ``clusters[value][0]``.
    """
    keep = sims > min_similarity
    cluster_mapping: dict[str, int] = {}
    cluster_id = 0
    for frm, to in zip(from_arr[keep].tolist(), to_arr[keep].tolist()):
        if not cluster_mapping.get(frm):
            if not cluster_mapping.get(to):
                cluster_mapping[to] = cluster_id
                cluster_mapping[frm] = cluster_id
                cluster_id += 1
            else:
                cluster_mapping[frm] = cluster_mapping.get(to)
    members = np.array(list(cluster_mapping.keys()), dtype=object)
    cids = np.array(list(cluster_mapping.values()), dtype=np.int64)
    reps = np.empty(len(members), dtype=object)
    first_member: dict[int, str] = {}
    for m, c in zip(members, cids.tolist()):
        if c not in first_member:
            first_member[c] = m
    for i, c in enumerate(cids.tolist()):
        reps[i] = first_member[c]
    return members, cids, reps


class UnionFind:
    """Path-compressed union-find over arbitrary hashable keys (driver-side
    cross-block merge; also the verifier stage of the near-dup pipelines)."""

    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        # iterative with full path compression: a long union chain (e.g.
        # (k, k+1) edges unioned in descending k) builds an O(n)-deep
        # parent chain that a recursive find would blow the stack on
        root = self.parent.setdefault(x, x)
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra

    def groups(self) -> dict:
        out: dict = {}
        for x in list(self.parent):
            out.setdefault(self.find(x), []).append(x)
        return out


def distributed_connected_components(
    edges_ds,
    left_col: str = "a",
    right_col: str = "b",
    max_iters: int = 50,
    broadcast_max_nodes: int = 2_000_000,
):
    """Distributed connected components over an edge Dataset via iterative
    min-label propagation — the scale path for transitive closure when the
    edge set is too large for driver-side union-find (north-star clustering
    stage; used by the near-dup pipelines, where true transitivity IS the
    wanted semantics — the reference-parity grouper instead replays the
    quirk-exact sequential linkage per block).

    Two physical modes, same result:

      * node set fits the broadcast bound: a sorted (node, label) pair of
        arrays is broadcast per round; edge tasks do two vectorized
        searchsorted lookups, a bounded groupby-min reduces proposals, and
        the driver merges with one numpy pass (no Python per edge or node);
      * above the bound: NOTHING is broadcast — labels and edge-endpoint
        rows co-shuffle on hash(node) partitions, each partition joins
        vectorized (sort + searchsorted), per-edge minima reduce on edge
        partitions, and per-node minima reduce back. Three keyed shuffles
        per round, Python overhead O(partitions), memory O(partition).

    Converges in O(diameter) rounds. Returns a Dataset (node, label) with
    label = min node id of the component.
    """
    import pyarrow as pa

    def init_nodes(batch: pa.Table) -> pa.Table:
        vals = np.concatenate(
            [
                np.asarray(batch[left_col].to_numpy(zero_copy_only=False)),
                np.asarray(batch[right_col].to_numpy(zero_copy_only=False)),
            ]
        )
        return pa.table({"node": pa.array(np.unique(vals))})

    nodes = (
        edges_ds.map_batches(init_nodes, batch_format="pyarrow")
        .groupby("node")
        .count()
        .drop_columns(["count()"])
    ).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        # zero edges (e.g. a dup-free corpus): an all-empty Dataset can
        # drop its schema entirely (the recurring empty-block hazard), so
        # build the typed empty (node, label) result explicitly instead
        # of running the propagation machinery against a schema-less table
        import pyarrow as pa
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "label": pa.array([], pa.int64()),
                }
            )
        )
    if n_nodes <= broadcast_max_nodes:
        return _cc_broadcast(edges_ds, nodes, left_col, right_col, max_iters)
    return _cc_partition_join(edges_ds, nodes, left_col, right_col, max_iters)


def _cc_broadcast(edges_ds, nodes, left_col, right_col, max_iters):
    """Label propagation with a broadcast sorted label array: vectorized
    lookups everywhere, driver work O(n_nodes) numpy per round."""
    import pyarrow as pa
    import ray
    import ray.data as rd
    from ray.data.aggregate import Min

    from raylink.pipeline import cached_object as _co

    node_tbl = pa.concat_tables(
        ray.get(nodes.to_arrow_refs()), promote_options="default"
    )
    node_arr = np.asarray(node_tbl["node"].to_numpy(zero_copy_only=False))
    order = np.argsort(node_arr, kind="stable")
    node_arr = node_arr[order]
    labels = node_arr.copy()

    edges = edges_ds.materialize()
    for _ in range(max_iters):
        lref = ray.put((node_arr, labels))

        def propose(batch: pa.Table, _l=lref) -> pa.Table:
            na, lab = _co(_l)
            a = np.asarray(batch[left_col].to_numpy(zero_copy_only=False))
            b = np.asarray(batch[right_col].to_numpy(zero_copy_only=False))
            la = lab[np.searchsorted(na, a)]
            lb = lab[np.searchsorted(na, b)]
            m = np.minimum(la, lb)
            return pa.table(
                {
                    "node": pa.array(np.concatenate([a, b])),
                    "cand": pa.array(np.concatenate([m, m])),
                }
            )

        proposed = (
            edges.map_batches(propose, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Min("cand", alias_name="new_label"))
        )
        new_tbl = pa.concat_tables(
            ray.get(proposed.to_arrow_refs()), promote_options="default"
        )
        pn = np.asarray(new_tbl["node"].to_numpy(zero_copy_only=False))
        pl = np.asarray(new_tbl["new_label"].to_numpy(zero_copy_only=False))
        idx = np.searchsorted(node_arr, pn)
        merged = labels.copy()
        np.minimum.at(merged, idx, pl)
        changed = int((merged != labels).sum())
        labels = merged
        # pointer-jumping shortcut (labels are node ids, so they index
        # back into the label table): repeatedly replace label with
        # label-of-label until fixpoint — turns O(component diameter)
        # outer rounds into O(log diameter), so a 50-round cap covers
        # any real graph (a diameter-60 chain otherwise returned SPLIT
        # components silently; round-5 review finding)
        while True:
            nxt = labels[np.searchsorted(node_arr, labels)]
            if (nxt == labels).all():
                break
            labels = nxt
            changed = 1
        if changed == 0:
            break
    else:
        raise RuntimeError(
            "distributed_connected_components (broadcast) did not "
            f"converge in max_iters={max_iters} rounds — raising rather "
            "than returning silently split components"
        )
    return rd.from_arrow(
        pa.table({"node": pa.array(node_arr), "label": pa.array(labels)})
    )


def _hash_parts(vals: np.ndarray, n_parts: int) -> np.ndarray:
    import pandas as pd

    return (
        pd.util.hash_array(np.asarray(vals), categorize=False)
        % np.uint64(n_parts)
    ).astype(np.int64)


def _split_by(tbl, part: np.ndarray, n_parts: int) -> list:
    import pyarrow as pa

    return [
        tbl.take(pa.array(np.flatnonzero(part == p), type=pa.int64()))
        for p in range(n_parts)
    ]


def _cc_partition_join(
    edges_ds, nodes, left_col, right_col, max_iters, n_parts: int | None = None
):
    """Label propagation with NO broadcast state: a raw-Ray-task hash
    exchange (the one place the Dataset API genuinely can't express the
    semantics — iterative joins over a PINNED hash partitioning; a Ray Data
    groupby would re-sort every table every round).

    State: labels live as P node-hash partitions (sorted by node) in the
    object store; edge-endpoint rows are pre-partitioned the same way ONCE.
    Per round, three waves of P tasks exchange sub-tables through the
    object store: (1) per node-partition, attach labels to endpoint rows
    (vectorized searchsorted) and scatter by edge partition; (2) per
    edge-partition, per-edge min (sort + reduceat) scattered back by node
    hash; (3) per node-partition, fold proposals into the labels and count
    changes. Driver handles only refs and the per-round change count.
    Converges in O(diameter) rounds — near-dup components are dense, so
    diameter is small in practice."""
    import pyarrow as pa
    import ray
    import ray.data as rd

    if n_parts is None:
        n_parts = max(4, int(ray.cluster_resources().get("CPU", 8)))
    P = n_parts

    @ray.remote
    def _mem_split(tbl: pa.Table, blk: int) -> list:
        a = np.asarray(tbl[left_col].to_numpy(zero_copy_only=False))
        b = np.asarray(tbl[right_col].to_numpy(zero_copy_only=False))
        eid = (np.int64(blk) << np.int64(40)) + np.arange(len(a), dtype=np.int64)
        mem = pa.table(
            {
                "node": pa.array(np.concatenate([a, b])),
                "edge_id": pa.array(np.concatenate([eid, eid])),
            }
        )
        part = _hash_parts(
            np.asarray(mem["node"].to_numpy(zero_copy_only=False)), P
        )
        return _split_by(mem, part, P)

    @ray.remote
    def _label_split(tbl: pa.Table) -> list:
        node = np.asarray(tbl["node"].to_numpy(zero_copy_only=False))
        lab = pa.table({"node": tbl["node"], "label": tbl["node"]})
        return _split_by(lab, _hash_parts(node, P), P)

    @ray.remote
    def _concat_sorted(*tbls) -> pa.Table:
        t = pa.concat_tables([x for x in tbls], promote_options="default")
        node = np.asarray(t["node"].to_numpy(zero_copy_only=False))
        return t.take(pa.array(np.argsort(node, kind="stable"), type=pa.int64()))

    @ray.remote
    def _join_scatter(labels_tbl: pa.Table, mem_tbl: pa.Table) -> list:
        ln = np.asarray(labels_tbl["node"].to_numpy(zero_copy_only=False))
        lv = np.asarray(labels_tbl["label"].to_numpy(zero_copy_only=False))
        mn = np.asarray(mem_tbl["node"].to_numpy(zero_copy_only=False))
        eid = np.asarray(mem_tbl["edge_id"].to_numpy(zero_copy_only=False))
        lab = lv[np.searchsorted(ln, mn)] if len(ln) else lv[:0]
        out = pa.table(
            {
                "edge_id": pa.array(eid),
                "node": pa.array(mn),
                "label": pa.array(lab),
            }
        )
        return _split_by(out, (eid % P).astype(np.int64), P)

    @ray.remote
    def _edge_min_scatter(*tbls) -> list:
        t = pa.concat_tables([x for x in tbls], promote_options="default")
        eid = np.asarray(t["edge_id"].to_numpy(zero_copy_only=False))
        node = np.asarray(t["node"].to_numpy(zero_copy_only=False))
        lab = np.asarray(t["label"].to_numpy(zero_copy_only=False))
        o = np.argsort(eid, kind="stable")
        eid, node, lab = eid[o], node[o], lab[o]
        if len(eid):
            starts = np.flatnonzero(np.r_[True, eid[1:] != eid[:-1]])
            counts = np.diff(np.append(starts, len(eid)))
            mins = np.repeat(np.minimum.reduceat(lab, starts), counts)
        else:
            mins = lab
        out = pa.table({"node": pa.array(node), "cand": pa.array(mins)})
        return _split_by(out, _hash_parts(node, P), P)

    @ray.remote
    def _shortcut_request(labels_tbl: pa.Table) -> list:
        # pointer jumping, wave 1: ship each (node, label) row to the
        # partition OWNING the label value (labels are node ids, so the
        # owner is hash(label) % P and the lookup there is exact)
        lv = np.asarray(labels_tbl["label"].to_numpy(zero_copy_only=False))
        return _split_by(labels_tbl, _hash_parts(lv, P), P)

    @ray.remote
    def _shortcut_resolve(labels_tbl: pa.Table, *req_tbls) -> list:
        # wave 2: label-of-label via the owner's sorted label table,
        # scattered back by node hash; _node_fold min-folds the result
        # (label(l) <= l since labels only decrease, so min == assign)
        reqs = pa.concat_tables(
            [x for x in req_tbls], promote_options="default"
        )
        ln = np.asarray(labels_tbl["node"].to_numpy(zero_copy_only=False))
        lv = np.asarray(labels_tbl["label"].to_numpy(zero_copy_only=False))
        rl = np.asarray(reqs["label"].to_numpy(zero_copy_only=False))
        cand = lv[np.searchsorted(ln, rl)] if len(ln) else rl[:0]
        node = np.asarray(reqs["node"].to_numpy(zero_copy_only=False))
        out = pa.table({"node": pa.array(node), "cand": pa.array(cand)})
        return _split_by(out, _hash_parts(node, P), P)

    @ray.remote(num_returns=2)
    def _node_fold(labels_tbl: pa.Table, *prop_tbls):
        props = pa.concat_tables(
            [x for x in prop_tbls], promote_options="default"
        )
        ln = np.asarray(labels_tbl["node"].to_numpy(zero_copy_only=False))
        lv = np.asarray(labels_tbl["label"].to_numpy(zero_copy_only=False))
        pn = np.asarray(props["node"].to_numpy(zero_copy_only=False))
        pc = np.asarray(props["cand"].to_numpy(zero_copy_only=False))
        new = lv.copy()
        if len(pn):
            idx = np.searchsorted(ln, pn)
            np.minimum.at(new, idx, pc)
        changed = int((new != lv).sum())
        return (
            pa.table({"node": pa.array(ln), "label": pa.array(new)}),
            changed,
        )

    # one-time partitioning of membership rows and initial labels
    edge_refs = edges_ds.materialize().to_arrow_refs()
    mem_lists = [
        _mem_split.options(num_returns=P).remote(r, i)
        for i, r in enumerate(edge_refs)
    ]
    node_refs = nodes.to_arrow_refs()
    lab_lists = [
        _label_split.options(num_returns=P).remote(r) for r in node_refs
    ]
    mem_p = [
        _concat_sorted.remote(*[lst[p] for lst in mem_lists]) for p in range(P)
    ]
    labels_p = [
        _concat_sorted.remote(*[lst[p] for lst in lab_lists]) for p in range(P)
    ]

    for _ in range(max_iters):
        joined = [
            _join_scatter.options(num_returns=P).remote(labels_p[p], mem_p[p])
            for p in range(P)
        ]
        props = [
            _edge_min_scatter.options(num_returns=P).remote(
                *[joined[p][q] for p in range(P)]
            )
            for q in range(P)
        ]
        folds = [
            _node_fold.remote(labels_p[p], *[props[q][p] for q in range(P)])
            for p in range(P)
        ]
        labels_p = [f[0] for f in folds]
        changed = sum(ray.get([f[1] for f in folds]))
        # pointer-jumping shortcut round (three more waves): label-of-
        # label compression turns O(component diameter) propagation
        # rounds into O(log diameter) — a diameter > max_iters chain
        # otherwise returned silently SPLIT components (round-5 review
        # finding). Shortcut changes count toward convergence.
        sreqs = [
            _shortcut_request.options(num_returns=P).remote(labels_p[p])
            for p in range(P)
        ]
        sres = [
            _shortcut_resolve.options(num_returns=P).remote(
                labels_p[q], *[sreqs[p][q] for p in range(P)]
            )
            for q in range(P)
        ]
        sfolds = [
            _node_fold.remote(labels_p[p], *[sres[q][p] for q in range(P)])
            for p in range(P)
        ]
        labels_p = [f[0] for f in sfolds]
        changed += sum(ray.get([f[1] for f in sfolds]))
        if changed == 0:
            break
    else:
        raise RuntimeError(
            "distributed_connected_components (partition-join) did not "
            f"converge in max_iters={max_iters} rounds — raising rather "
            "than returning silently split components"
        )
    return rd.from_arrow_refs(labels_p)


def connected_components_labels(
    left: np.ndarray, right: np.ndarray
) -> dict:
    """Min-label connected components over an edge list (driver-side; used
    when the candidate set is provably small post-blocking). Returns
    node -> canonical (minimal) label."""
    uf = UnionFind()
    for a, b in zip(left.tolist(), right.tolist()):
        uf.union(a, b)
    label: dict = {}
    for root, members in uf.groups().items():
        canon = min(members)
        for m in members:
            label[m] = canon
    return label
