#!/usr/bin/env python
"""Cluster job entrypoint for the flagship transcript pipeline.

This is the script the north rule's ``ray job submit`` launches on a real
cluster::

    ray job submit --working-dir . -- \
        python scripts/run_flagship.py \
        --transcripts /data/transcripts \
        --output /data/out/run1 \
        --checkpoint-root /data/ckpt/run1 \
        --link-min-similarity 0.75

On the cluster, ``ray job submit`` provides the session (RAY_ADDRESS); in
the sandbox it runs standalone against a local session. Either way the
script only inits Ray when no session exists. Outputs are partitioned
Parquet (one directory per stage; clusters partitioned by block_key) so a
rerun with the same --checkpoint-root resumes past completed stages.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--transcripts", required=True, help="parquet dir/file of transcripts")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--checkpoint-root", default=None, help="resume checkpoints here")
    p.add_argument("--link-min-similarity", type=float, default=0.75)
    p.add_argument("--num-cpus", type=int, default=None,
                   help="only for standalone runs; a ray job provides the cluster")
    args = p.parse_args()

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    # standalone runs from a cwd outside the repo need the by-value pickle
    # fallback (a ray job's --working-dir ships the package instead)
    from raylink.workers import ensure_workers_can_import

    ensure_workers_can_import()

    import ray.data as rd

    t0 = time.perf_counter()
    if args.checkpoint_root:
        from raylink.resume import run_flagship_checkpointed

        result = run_flagship_checkpointed(
            args.transcripts, args.checkpoint_root,
            link_min_similarity=args.link_min_similarity,
        )
        assignments = result["assignments"][0]
        clusters = result["clusters"][0]
        resumed = {k: v[1] for k, v in result.items() if isinstance(v, tuple)}
    else:
        from raylink.flagship import transcript_entity_resolution
        from raylink.sources import read_parquet_with_row_order

        res = transcript_entity_resolution(
            read_parquet_with_row_order(args.transcripts),
            link_min_similarity=args.link_min_similarity,
        )
        assignments = res.assignments
        clusters = res.clusters
        resumed = {}

    os.makedirs(args.output, exist_ok=True)
    assignments.write_parquet(os.path.join(args.output, "assignments"))
    try:
        clusters.write_parquet(
            os.path.join(args.output, "clusters"), partition_cols=["block_key"]
        )
    except TypeError:  # older Ray without partition_cols
        clusters.write_parquet(os.path.join(args.output, "clusters"))
    summary = {
        "n_assignments": assignments.count(),
        "wall_sec": round(time.perf_counter() - t0, 2),
        "resumed_stages": resumed,
        "link_min_similarity": args.link_min_similarity,
    }
    with open(os.path.join(args.output, "summary.json"), "w") as f:
        json.dump(summary, f)
    print(json.dumps(summary))
    if owns_session:
        ray.shutdown()


if __name__ == "__main__":
    main()
