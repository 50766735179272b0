"""Flagship end-to-end pipeline: transcripts → canonicalize → blocked
self-match → transitive grouping → per-conversation entity assignment.

This is the north-star workload (BASELINE.json): record linkage over
multi-turn transcript tables. Stages (all streaming Datasets):

  1. canonicalize (raylink.blocking): turn-0 mention extraction + block key
     under verified stable turn ordering;
  2. distinct mention strings per block (groupby, min row_order keeps
     first-appearance order — linkage is order-sensitive);
  3. self-match of the distinct strings with the configured matcher
     (TF-IDF char-3-gram cosine by default — the reference's default
     grouper, polyfuzz/polyfuzz.py:355,369);
  4. quirk-exact per-block linkage + Group join (raylink.pipeline);
  5. broadcast map of cluster representative / id back onto every
     conversation row.

The scored-pairs metric (bench headline) is Σ_blocks |from_b| × |to_b| —
the work the scoring stage actually performs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from raylink.blocking import canonicalize_transcripts
from raylink.joins import _string_part_hash
from raylink.pipeline import MatcherSpec, group_matches, match_dataset


@dataclass
class FlagshipResult:
    entities: Any  # Dataset: conv_id, entity_text, block_key
    matches: Any  # Dataset: from, to, similarity, block_key, row_order
    grouped: Any  # matches + group
    clusters: Any  # Dataset: block_key, cluster_id, member, representative
    assignments: Any  # Dataset: conv_id, entity_text, block_key, group, cluster_id
    scored_pairs: int
    n_distinct: int
    timings: dict | None = None  # per-stage wall seconds


def transcript_entity_resolution(
    transcripts_ds,
    spec: MatcherSpec | None = None,
    link_min_similarity: float = 0.75,
    concurrency=(1, 8),
    batch_size: int = 1024,
    max_broadcast_to_rows: int = 2_000_000,
    distinct_distributed_over: int = 20_000_000,
    assign_broadcast_max_rows: int = 20_000_000,
) -> FlagshipResult:
    import time

    timings: dict[str, float] = {}
    spec = spec or MatcherSpec(kind="tfidf", min_similarity=0.0, top_n=1)
    # canonicalize once; the order-attached materialized dataset serves both
    # the distinct extraction and the final per-conversation assignment.
    t0 = time.perf_counter()
    # Order is pinned AT THE SOURCE. Preferred contract: the caller reads
    # with raylink.sources.read_parquet_with_row_order, so row_order is a
    # metadata property (footer offsets) and nothing materializes here.
    # Fallback for in-memory inputs without the column: attach_global_order
    # (order-preserving materialize — bounded inputs only).
    if "row_order" not in transcripts_ds.schema().names:
        from raylink.pipeline import attach_global_order

        transcripts_ds = attach_global_order(transcripts_ds)
    # entities (one row per conversation) is the small derived table that
    # feeds BOTH the distinct extraction and the final assignment join —
    # pin it once instead of re-running canonicalization
    entities = canonicalize_transcripts(transcripts_ds).materialize()
    timings["canonicalize"] = time.perf_counter() - t0

    # distinct mention strings per block, first-appearance ordered.
    # Fast path (distinct set within the broadcast assumption): map_batches
    # partial dedup + tiny driver merge, then driver-side round-robin
    # interleave for hot-block skew. Scale path (above
    # ``distinct_distributed_over`` entity rows): the distinct set never
    # touches the driver — a composite-key groupby keeps it distributed
    # (hot blocks spread across reduce partitions, which replaces the
    # interleave), and the sharded self-match consumes it directly.
    from raylink.pipeline import (
        distinct_entities_dataset,
        distinct_entities_table,
        spread_table,
    )

    t0 = time.perf_counter()
    distributed_distinct = entities.count() > distinct_distributed_over
    if distributed_distinct:
        dist_tbl = None
        distinct_ds = distinct_entities_dataset(entities).materialize()
        block_counts = (
            distinct_ds.groupby("block_key").count().to_pandas()
        )
        counts = block_counts["count()"].to_numpy(dtype=np.int64)
        scored_pairs = int((counts**2).sum())
        n_distinct = int(counts.sum())
    else:
        dist_tbl = distinct_entities_table(entities)
        distinct_ds = spread_table(dist_tbl)
        # Arrow C value_counts — to_pylist + object-dtype np.unique
        # materialized up to 20M Python strings inside the TIMED
        # distinct stage (the make_assignment_lookup object-argsort
        # lesson, round-5 review finding)
        vc = pc.value_counts(dist_tbl["block_key"])
        counts = np.asarray(
            vc.field("counts").to_numpy(zero_copy_only=False), np.int64
        )
        scored_pairs = int((counts**2).sum())
        n_distinct = int(dist_tbl.num_rows)
    timings["distinct"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    match_result = match_dataset(
        distinct_ds,
        to_ds=None,
        spec=spec,
        concurrency=concurrency,
        batch_size=batch_size,
        max_broadcast_to_rows=max_broadcast_to_rows,
    )
    # pin the scoring output here so the timing isolates fit + scoring —
    # the north rule's throughput metric is about this stage
    match_result.matches = match_result.matches.materialize()
    timings["score"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    group_result = group_matches(
        match_result,
        grouper_spec=MatcherSpec(
            kind="tfidf", n_gram_range=(3, 3), min_similarity=link_min_similarity
        ),
        link_min_similarity=link_min_similarity,
        group_all_strings=True,
        concurrency=concurrency,
        batch_size=batch_size,
        distinct_hint_tbl=dist_tbl,
        distinct_is_from_side=distributed_distinct,
    )
    timings["group"] = time.perf_counter() - t0

    # cluster assignment back onto conversations: broadcast sorted-array
    # lookup below the bound (one cluster-table copy in the object store),
    # else a hash-partitioned co-shuffle join (the cluster table never
    # lands on the driver — pairs with the distributed-distinct regime)
    t0 = time.perf_counter()
    if n_distinct <= assign_broadcast_max_rows:
        # the grouped output already built (and broadcast) this exact
        # lookup over the same cluster table — reuse it instead of
        # re-collecting the clusters and re-sorting the keys
        resolve = group_result.name_map_ref
        if resolve is None:
            cl_tbl = pa.concat_tables(
                ray.get(group_result.clusters.to_arrow_refs()),
                promote_options="default",
            )
            from raylink.pipeline import make_assignment_lookup

            resolve = make_assignment_lookup(cl_tbl)

        def assign(batch: pa.Table, _resolve=resolve) -> pa.Table:
            groups, cids = _resolve(
                batch["block_key"].to_pylist(), batch["entity_text"].to_pylist()
            )
            return pa.table(
                {
                    "conv_id": batch["conv_id"],
                    "entity_text": batch["entity_text"],
                    "block_key": batch["block_key"],
                    "group": pa.array(groups, type=pa.string()),
                    "cluster_id": pa.array(cids, type=pa.int64()),
                }
            )

        assignments = entities.map_batches(assign, batch_format="pyarrow")
    else:
        assignments = assign_clusters_distributed(
            entities, group_result.clusters
        )
    timings["assign_build"] = time.perf_counter() - t0

    return FlagshipResult(
        entities=entities,
        matches=match_result.matches,
        grouped=group_result.grouped,
        clusters=group_result.clusters,
        assignments=assignments,
        scored_pairs=scored_pairs,
        n_distinct=n_distinct,
        timings=timings,
    )


def _with_global_order(entities_ds):
    """Deprecated shim: order must be pinned at the SOURCE (see
    pipeline.attach_global_order) — kept for callers that already hold an
    entities dataset without row_order."""
    from raylink.pipeline import attach_global_order

    return attach_global_order(entities_ds)


def oracle_cluster_labels(
    distinct_strings_by_block: dict[str, list[str]],
    link_min_similarity: float = 0.75,
) -> dict[str, tuple[str, int]]:
    """Single-node reference-semantics oracle for the F1 gate: per block,
    run the grouper matcher + exact single linkage over the same distinct
    strings in the same order. Returns string -> (block, cluster_id)."""
    from raylink.linkage import single_linkage
    from raylink.matchers import TFIDFMatcher

    labels: dict[str, tuple[str, int]] = {}
    for bk, strings in distinct_strings_by_block.items():
        matcher = TFIDFMatcher(
            n_gram_range=(3, 3), min_similarity=link_min_similarity
        )
        matches = matcher.match(strings)
        _, mapping, _ = single_linkage(matches, link_min_similarity)
        for s, cid in mapping.items():
            labels[s] = (bk, cid)
    return labels


def assign_clusters_distributed(entities_ds, clusters_ds, n_parts: int | None = None):
    """Cluster-assignment join with NO driver/broadcast cluster table:
    entity rows and cluster rows co-shuffle on hash(block_key, member)
    partitions; each partition joins vectorized (sort + searchsorted).
    Misses keep group = entity_text / cluster_id = -1, matching the
    broadcast lookup's semantics exactly."""
    import pandas as pd
    import ray

    if n_parts is None:
        n_parts = max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)
    P = n_parts
    # the cluster side emits null conv_id columns — typed from the ENTITY
    # schema so the union never has to unify mismatched block schemas
    # (the add_group_distributed pattern)
    e_sch = entities_ds.schema()
    conv_type = dict(zip(e_sch.names, e_sch.types))["conv_id"]

    def _part(blocks, texts):
        # Arrow C kernels end to end (VERDICT r3 #4): composite key via
        # binary_join_element_wise, partition id via the shared vectorized
        # string hash — no per-row Python, no pandas
        keys = pc.binary_join_element_wise(
            blocks.combine_chunks().cast(pa.string()),
            texts.combine_chunks().cast(pa.string()),
            "\x1f",
        )
        part = (_string_part_hash(keys) % np.uint64(P)).astype(np.int64)
        return keys, part

    def tag_entities(batch: pa.Table) -> pa.Table:
        keys, part = _part(batch["block_key"], batch["entity_text"])
        return pa.table(
            {
                "part": pa.array(part),
                "key": keys,
                "conv_id": batch["conv_id"],
                "entity_text": batch["entity_text"],
                "block_key": batch["block_key"],
                "representative": pa.array(
                    [None] * batch.num_rows, type=pa.string()
                ),
                "cluster_id": pa.array(
                    np.full(batch.num_rows, -1, dtype=np.int64)
                ),
                "is_cluster": pa.array(np.zeros(batch.num_rows, np.int8)),
            }
        )

    def tag_clusters(batch: pa.Table) -> pa.Table:
        keys, part = _part(batch["block_key"], batch["member"])
        return pa.table(
            {
                "part": pa.array(part),
                "key": keys,
                "conv_id": pa.nulls(batch.num_rows, type=conv_type),
                "entity_text": batch["member"],
                "block_key": batch["block_key"],
                "representative": batch["representative"],
                "cluster_id": pa.array(
                    np.asarray(
                        batch["cluster_id"].to_numpy(zero_copy_only=False),
                        dtype=np.int64,
                    )
                ),
                "is_cluster": pa.array(np.ones(batch.num_rows, np.int8)),
            }
        )

    union = entities_ds.map_batches(tag_entities, batch_format="pyarrow").union(
        clusters_ds.map_batches(tag_clusters, batch_format="pyarrow")
    )

    def join_part(g: pa.Table) -> pa.Table:
        # pyarrow in/out (VERDICT r3 #4: the old pandas conversion was
        # pure overhead around this numpy kernel). Keys factorize to exact
        # dictionary codes; the object-dtype argsort becomes an int64 one.
        is_cl = (
            np.asarray(g["is_cluster"].to_numpy(zero_copy_only=False), np.int8)
            == 1
        )
        codes = np.asarray(
            pc.dictionary_encode(g["key"].combine_chunks())
            .indices.to_numpy(zero_copy_only=False),
            np.int64,
        )
        cpos = np.flatnonzero(is_cl)
        epos_a = pa.array(np.flatnonzero(~is_cl))
        texts = g["entity_text"].combine_chunks().take(epos_a)
        out = {
            "conv_id": g["conv_id"].combine_chunks().take(epos_a),
            "entity_text": texts,
            "block_key": g["block_key"].combine_chunks().take(epos_a),
        }
        ek = codes[~is_cl]
        if not len(cpos):
            out["group"] = texts
            out["cluster_id"] = pa.array(
                np.full(len(ek), -1, dtype=np.int64)
            )
            return pa.table(out)
        ck = codes[cpos]
        o = np.argsort(ck, kind="stable")
        ck = ck[o]
        pos = np.searchsorted(ck, ek)
        posc = np.minimum(pos, len(ck) - 1)
        hit = (pos < len(ck)) & (ck[posc] == ek)
        src_cl = cpos[o[posc]]  # row index of the matched cluster row
        rep_taken = (
            g["representative"]
            .combine_chunks()
            .take(pa.array(np.where(hit, src_cl, cpos[0])))
        )
        out["group"] = pc.if_else(pa.array(hit), rep_taken, texts)
        ccid = np.asarray(
            g["cluster_id"].to_numpy(zero_copy_only=False), np.int64
        )
        out["cluster_id"] = pa.array(
            np.where(hit, ccid[src_cl], np.int64(-1)).astype(np.int64)
        )
        return pa.table(out)

    return union.groupby("part").map_groups(join_part, batch_format="pyarrow")


def flagship_f1_probe(
    n_conversations: int = 120,
    seed: int = 42,
    threshold: float = 0.75,
) -> dict:
    """Pairwise F1 of the flagship's clusters vs the reference-semantics
    oracle on labeled pairs at fixed blocking key — the north-rule
    correctness metric, at its documented probe scale (the
    test_flagship_f1_gate fixture). ONE implementation shared by the
    gate test and bench.py so the gated number and the reported number
    can never diverge. Requires an initialized Ray session."""
    import ray
    import ray.data as rd

    from raylink.metrics import pairwise_f1
    from raylink.transcripts import generate_transcripts, labeled_pairs

    transcripts, gt = generate_transcripts(n_conversations, seed=seed)
    pairs = labeled_pairs(gt).to_pandas()
    result = transcript_entity_resolution(
        rd.from_arrow(transcripts), link_min_similarity=threshold
    )
    cl = pa.concat_tables(
        ray.get(result.clusters.to_arrow_refs()), promote_options="default"
    )
    ours = {
        m: (bk, cid)
        for bk, m, cid in zip(
            cl["block_key"].to_pylist(),
            cl["member"].to_pylist(),
            cl["cluster_id"].to_pylist(),
        )
    }
    # oracle over the SAME distinct strings per block in the SAME order
    ent = result.entities.to_pandas()
    by_block: dict[str, list[str]] = {}
    seen = set()
    for bk, t in zip(ent["block_key"], ent["entity_text"]):
        if (bk, t) not in seen:
            seen.add((bk, t))
            by_block.setdefault(bk, []).append(t)
    ref = oracle_cluster_labels(by_block, threshold)
    out = pairwise_f1(pairs, ours, ref)
    out["n_assignments"] = result.assignments.count()
    out["n_ground_truth"] = gt.num_rows
    out["scored_pairs"] = result.scored_pairs
    return out
