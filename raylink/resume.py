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
    spec_d = asdict(spec)
    spec_d.pop("embedder", None)
    spec_d.pop("scorer", None)
    base_params = {"transcripts": transcripts_path, "spec": spec_d}

    from raylink.pipeline import attach_global_order

    entities_ds, entities_resumed = run_stage(
        checkpoint_root,
        "entities",
        lambda: canonicalize_transcripts(
            attach_global_order(rd.read_parquet(transcripts_path))
        ),
        params=base_params,
    )

    match_params = {**base_params, "stage": "match"}

    def produce_matches():
        dist_tbl = distinct_entities_table(entities_ds)
        res = match_dataset(
            spread_table(dist_tbl), None, spec, batch_size=batch_size
        )
        return res.matches

    matches_ds, matches_resumed = run_stage(
        checkpoint_root, "matches", produce_matches, params=match_params,
        input_stages=["entities"],
    )

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
