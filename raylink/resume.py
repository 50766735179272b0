"""Resumable flagship: the transcript pipeline composed from checkpointed
stages (north rule: re-entry after a mid-pipeline failure skips completed
stages/partitions via the lineage manifests of raylink.checkpoint).

Stage graph::

    entities    <- canonicalize + global order        (parquet + manifest)
    matches     <- distinct + blocked self-match      (parquet + score hist)
    clusters    <- grouper pass + per-block linkage   (parquet)
    assignments <- broadcast join back onto convs     (parquet)

Each stage's params fingerprint covers everything that affects its output,
so changing a threshold invalidates exactly the stages downstream of it.
"""

from __future__ import annotations

from dataclasses import asdict

import numpy as np
import pyarrow as pa
import ray

from raylink.checkpoint import run_stage
from raylink.pipeline import MatcherSpec, MatchResult, group_matches, match_dataset


def spec_checkpoint_params(spec) -> dict:
    """JSON-safe fingerprint view of a MatcherSpec. Model objects don't
    serialize, but silently POPPING them would let a swapped
    embedder/scorer resume the previous model's results — so they map to a
    stable tag (class identity + the object's own ``fingerprint``
    attribute when it provides one; two models of the same class without a
    fingerprint need distinct checkpoint roots)."""
    spec_d = asdict(spec)
    for field in ("embedder", "scorer"):
        obj = spec_d.pop(field, None)
        if obj is not None:
            spec_d[field] = (
                f"{type(obj).__module__}.{type(obj).__qualname__}:"
                f"{getattr(obj, 'fingerprint', '')}"
            )
    return spec_d


def run_flagship_checkpointed(
    transcripts_path: str,
    checkpoint_root: str,
    spec: MatcherSpec | None = None,
    link_min_similarity: float = 0.75,
    batch_size: int = 1024,
) -> dict:
    """Returns {stage: (dataset, resumed)} plus summary counts."""
    import ray.data as rd

    from raylink.blocking import canonicalize_transcripts
    from raylink.pipeline import distinct_entities_table, spread_table

    spec = spec or MatcherSpec(kind="tfidf", min_similarity=0.0, top_n=1)
    base_params = {
        "transcripts": transcripts_path,
        "spec": spec_checkpoint_params(spec),
    }

    from raylink.sources import read_parquet_with_row_order

    entities_ds, entities_resumed = run_stage(
        checkpoint_root,
        "entities",
        lambda: canonicalize_transcripts(
            read_parquet_with_row_order(transcripts_path)
        ),
        # depends ONLY on the input corpus — a spec change must not
        # invalidate the full-corpus canonicalize pass (the module's
        # stated invalidation contract)
        params={"transcripts": transcripts_path},
    )

    match_params = {**base_params, "stage": "match"}

    # scoring resumes PER PARTITION: the distinct table is deterministic
    # given the entities checkpoint, so fixed row ranges of it are stable
    # partition keys; a job killed mid-scoring re-enters and computes only
    # the ranges whose done-markers are missing. A FULLY complete stage
    # short-circuits on the manifest's recorded keys — re-entry then costs
    # a read_parquet, not a distinct pass over the corpus. The broadcast
    # index is (re)built lazily on the first missing partition.
    from raylink.checkpoint import (
        partitioned_stage_complete,
        read_checkpoint,
        run_partitioned_stage,
    )

    if partitioned_stage_complete(checkpoint_root, "matches", match_params):
        matches_ds = read_checkpoint(checkpoint_root, "matches")
        matches_resumed = True
    else:
        dist_tbl = distinct_entities_table(entities_ds)
        part_rows = 65_536
        n_parts = max(1, -(-dist_tbl.num_rows // part_rows))
        keys = [f"{i:05d}" for i in range(n_parts)]
        state: dict = {}

        def produce_matches_partition(key: str) -> pa.Table:
            if "index_ref" not in state:
                from raylink.pipeline import _collect_to_side, build_block_indexes

                blocks = _collect_to_side(dist_tbl)
                build_block_indexes(spec, blocks, self_match=True)
                state["index_ref"] = ray.put(blocks)
            sl = dist_tbl.slice(int(key) * part_rows, part_rows)
            res = match_dataset(
                spread_table(sl), None, spec, batch_size=batch_size,
                prebuilt_index_ref=state["index_ref"],
                self_match_override=True,
                top_n_cols_override=spec.top_n,
            )
            tabs = ray.get(res.matches.to_arrow_refs())
            if not tabs:  # zero-block result: typed empty from the schema
                sch = res.matches.schema()
                return pa.table(
                    {n: pa.array([], t) for n, t in zip(sch.names, sch.types)}
                )
            return pa.concat_tables(tabs, promote_options="default")

        matches_ds, matches_skipped = run_partitioned_stage(
            checkpoint_root, "matches", keys, produce_matches_partition,
            params=match_params, input_stages=["entities"],
        )
        matches_resumed = matches_skipped == n_parts

    cluster_params = {**base_params, "link": link_min_similarity}

    def produce_clusters():
        mr = MatchResult(
            matches=matches_ds, spec=spec, top_n_cols=1,
            index_ref=None, self_match=True, index_blocks=None,
        )
        gr = group_matches(
            mr,
            link_min_similarity=link_min_similarity,
            group_all_strings=True,
            batch_size=batch_size,
        )
        return gr.clusters

    clusters_ds, clusters_resumed = run_stage(
        checkpoint_root, "clusters", produce_clusters, params=cluster_params,
        input_stages=["matches"],
    )

    def produce_assignments():
        # rebuilds the lookup from the PERSISTED cluster table rather than
        # reusing GroupResult.name_map_ref (the flagship landmark): here
        # the cluster stage may be a resumed checkpoint with no in-memory
        # GroupResult at all, so the parquet table is the one source both
        # fresh and resumed runs share — the rebuild (~ms at bench scale)
        # is the price of a single code path.
        from raylink.pipeline import make_assignment_lookup

        cl_tbl = pa.concat_tables(
            ray.get(clusters_ds.to_arrow_refs()), promote_options="default"
        )
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

        return entities_ds.map_batches(assign, batch_format="pyarrow")

    assignments_ds, assignments_resumed = run_stage(
        checkpoint_root, "assignments", produce_assignments,
        params=cluster_params, input_stages=["entities", "clusters"],
    )

    return {
        "entities": (entities_ds, entities_resumed),
        "matches": (matches_ds, matches_resumed),
        "clusters": (clusters_ds, clusters_resumed),
        "assignments": (assignments_ds, assignments_resumed),
        "n_assignments": assignments_ds.count(),
    }
