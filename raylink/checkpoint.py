"""Per-stage Parquet checkpoints with lineage metadata + resume.

North-rule requirement: every stage checkpoints per-partition Parquet with
lineage metadata (input block ids, row counts, score histograms) so a job
re-entered after a failure SKIPS completed stages/partitions instead of
recomputing (the reference can only pickle the whole model,
polyfuzz/polyfuzz.py:429-457 — this is the distributed replacement).

Layout per stage::

    <root>/<stage>/data/part-*.parquet     (atomic: written to .tmp, renamed)
    <root>/<stage>/manifest.json           {stage, n_rows, n_files, files:
                                            [{name, rows}], score_histogram,
                                            input_stages, params_fingerprint}

``run_stage`` is the composition primitive: if a valid manifest exists and
the params fingerprint matches, the stage re-enters as a ``read_parquet``
(zero recompute); otherwise the producer runs and the checkpoint is written
atomically. Histograms of any ``similarity`` column are recorded per stage
as the lineage score metric.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _fingerprint(params: dict) -> str:
    return hashlib.md5(
        json.dumps(params, sort_keys=True, default=str).encode()
    ).hexdigest()


def _score_histogram(tables: list[pa.Table], col: str = "similarity") -> list[int] | None:
    counts = np.zeros(101, dtype=np.int64)
    seen = False
    for t in tables:
        if col not in t.column_names:
            continue
        seen = True
        vals = np.asarray(t[col].to_numpy(zero_copy_only=False), dtype=np.float64)
        vals = vals[np.isfinite(vals)]
        binned = np.clip((vals * 100).astype(np.int64), 0, 100)
        counts += np.bincount(binned, minlength=101)
    return counts.tolist() if seen else None


def write_checkpoint(
    ds_or_tables,
    root: str,
    stage: str,
    params: dict | None = None,
    input_stages: list[str] | None = None,
) -> dict:
    """Write a stage checkpoint atomically; returns the manifest dict.

    Accepts a Ray Dataset (its blocks become part files — per-partition
    resume granularity) or a list of Arrow tables."""
    import ray

    stage_dir = os.path.join(root, stage)
    tmp_dir = stage_dir + ".tmp"
    if os.path.exists(tmp_dir):
        shutil.rmtree(tmp_dir)
    os.makedirs(os.path.join(tmp_dir, "data"), exist_ok=True)

    # one block at a time: the driver holds ONE table, not the whole
    # stage (at scale the assignments stage is corpus-sized)
    if isinstance(ds_or_tables, list):
        block_iter = iter(ds_or_tables)
    else:
        block_iter = (ray.get(r) for r in ds_or_tables.to_arrow_refs())
    files = []
    n_rows = 0
    part = 0
    hist = np.zeros(101, dtype=np.int64)
    hist_seen = False
    first_empty: pa.Table | None = None
    for t in block_iter:
        if t.num_rows == 0:
            if first_empty is None:
                first_empty = t
            continue
        name = f"part-{part:05d}.parquet"
        pq.write_table(t, os.path.join(tmp_dir, "data", name))
        files.append({"name": name, "rows": t.num_rows})
        n_rows += t.num_rows
        h = _score_histogram([t])
        if h is not None:
            hist += np.asarray(h, dtype=np.int64)
            hist_seen = True
        part += 1
    if part == 0:  # keep schema for empty results
        empty = first_empty if first_empty is not None else pa.table({})
        pq.write_table(empty, os.path.join(tmp_dir, "data", "part-00000.parquet"))
        files.append({"name": "part-00000.parquet", "rows": 0})
    manifest = {
        "stage": stage,
        "n_rows": n_rows,
        "n_files": len(files),
        "files": files,
        "score_histogram": hist.tolist() if hist_seen else None,
        "input_stages": input_stages or [],
        "params_fingerprint": _fingerprint(params or {}),
    }
    with open(os.path.join(tmp_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    if os.path.exists(stage_dir):
        shutil.rmtree(stage_dir)
    os.rename(tmp_dir, stage_dir)
    return manifest


def read_manifest(root: str, stage: str) -> dict | None:
    path = os.path.join(root, stage, "manifest.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def checkpoint_valid(root: str, stage: str, params: dict | None = None) -> bool:
    """A checkpoint is valid iff the manifest exists, its params fingerprint
    matches, and every listed part file exists with the recorded row count
    (guards against partial/killed writes — though the atomic rename makes
    those invisible in the first place)."""
    m = read_manifest(root, stage)
    if m is None:
        return False
    if m.get("params_fingerprint") != _fingerprint(params or {}):
        return False
    data_dir = os.path.join(root, stage, "data")
    for f in m["files"]:
        p = os.path.join(data_dir, f["name"])
        if not os.path.exists(p):
            return False
        try:
            if pq.ParquetFile(p).metadata.num_rows != f["rows"]:
                return False
        except Exception:
            return False
    return True


def read_checkpoint(root: str, stage: str):
    """Resume path: checkpoint dir -> Ray Dataset."""
    import ray.data as rd

    return rd.read_parquet(os.path.join(root, stage, "data"))


def run_stage(
    root: str,
    stage: str,
    producer,
    params: dict | None = None,
    input_stages: list[str] | None = None,
):
    """Compose resumable stages: returns (dataset, resumed: bool).

    ``producer()`` must return a Ray Dataset; it is only invoked when no
    valid checkpoint exists."""
    if checkpoint_valid(root, stage, params):
        return read_checkpoint(root, stage), True
    ds = producer()
    write_checkpoint(ds, root, stage, params, input_stages)
    return read_checkpoint(root, stage), False


# ---------------------------------------------------------------------------
# per-PARTITION resume (finer than run_stage's all-or-nothing granularity)
# ---------------------------------------------------------------------------


def _part_paths(root: str, stage: str, key: str) -> tuple[str, str]:
    # markers live OUTSIDE data/ so read_parquet on the data dir sees only
    # parquet part files
    return (
        os.path.join(root, stage, "data", f"part-{key}.parquet"),
        os.path.join(root, stage, "marks", f"part-{key}.done.json"),
    )


def partition_done(root: str, stage: str, key: str) -> bool:
    """A partition is complete iff its done-marker exists and the part file
    carries the recorded row count (markers are renamed into place after
    the data file, so a kill can never leave a marker without data)."""
    part, done = _part_paths(root, stage, key)
    if not (os.path.exists(done) and os.path.exists(part)):
        return False
    try:
        with open(done) as f:
            meta = json.load(f)
        return pq.ParquetFile(part).metadata.num_rows == meta["rows"]
    except Exception:
        return False


def partitioned_stage_complete(
    root: str, stage: str, params: dict | None = None
) -> bool:
    """True iff the stage's manifest exists with matching params and every
    recorded partition's marker validates — the cheap full-resume check
    that lets a re-entered job skip even deriving the partition keys."""
    m = read_manifest(root, stage)
    if m is None or m.get("params_fingerprint") != _fingerprint(params or {}):
        return False
    keys = m.get("partition_keys") or []
    return bool(keys) and all(partition_done(root, stage, k) for k in keys)


def run_partitioned_stage(
    root: str,
    stage: str,
    keys: list[str],
    produce_partition,
    params: dict | None = None,
    input_stages: list[str] | None = None,
):
    """Partition-granular resumable stage: returns (dataset, n_skipped).

    ``keys`` are STABLE partition identifiers (derive them from the data —
    input row groups, key ranges — never from runtime block boundaries);
    ``produce_partition(key)`` returns that partition's Arrow table (or a
    Dataset, which is collected). A re-entered job recomputes ONLY the
    partitions whose done-markers are missing — this is the kill-mid-stage
    granularity run_stage cannot give (north-rule resume requirement).

    A params change (fingerprint mismatch) wipes the whole stage first, so
    stale partitions can never mix with fresh ones."""
    import ray

    stage_dir = os.path.join(root, stage)
    data_dir = os.path.join(stage_dir, "data")
    params_path = os.path.join(stage_dir, "params.json")
    fp = _fingerprint(params or {})
    if os.path.exists(params_path):
        try:
            with open(params_path) as f:
                old = json.load(f)["params_fingerprint"]
        except Exception:
            old = None
        if old != fp:
            shutil.rmtree(stage_dir)
    os.makedirs(data_dir, exist_ok=True)
    os.makedirs(os.path.join(stage_dir, "marks"), exist_ok=True)
    if not os.path.exists(params_path):
        with open(params_path + ".tmp", "w") as f:
            json.dump({"params_fingerprint": fp}, f)
        os.rename(params_path + ".tmp", params_path)

    # prune orphans from a previous run with a DIFFERENT key set (e.g. the
    # upstream data shrank at the same path): read_checkpoint reads the
    # whole data dir, so stale part files must never survive
    want_parts = {f"part-{k}.parquet" for k in keys}
    want_marks = {f"part-{k}.done.json" for k in keys}
    for f in os.listdir(data_dir):
        # any .tmp is an incomplete write from a killed run (the replace
        # never happened) — read_checkpoint's read_parquet has NO file-
        # extension filter, so a surviving part-<key>.parquet.tmp whose
        # key left the key set would be READ, duplicating or corrupting
        # the resumed dataset (round-5 review finding). Current-run
        # writes all happen after this prune.
        if f.endswith(".tmp") or (
            f.endswith(".parquet") and f not in want_parts
        ):
            os.remove(os.path.join(data_dir, f))
    marks_dir = os.path.join(stage_dir, "marks")
    for f in os.listdir(marks_dir):
        if f.endswith(".tmp") or (
            f.endswith(".json") and f not in want_marks
        ):
            os.remove(os.path.join(marks_dir, f))

    n_skipped = 0
    for key in keys:
        if partition_done(root, stage, key):
            n_skipped += 1
            continue
        out = produce_partition(key)
        if not isinstance(out, pa.Table):
            out_ds = out
            tabs = ray.get(out_ds.to_arrow_refs())
            if tabs:
                out = pa.concat_tables(tabs, promote_options="default")
            else:  # zero-block partition: typed empty from the schema
                sch = out_ds.schema()
                out = pa.table(
                    {n: pa.array([], t) for n, t in zip(sch.names, sch.types)}
                )
        part, done = _part_paths(root, stage, key)
        pq.write_table(out, part + ".tmp")
        os.replace(part + ".tmp", part)
        with open(done + ".tmp", "w") as f:
            json.dump(
                {
                    "rows": out.num_rows,
                    "score_histogram": _score_histogram([out]),
                },
                f,
            )
        os.replace(done + ".tmp", done)

    # finalize the stage manifest from the per-partition markers
    files = []
    n_rows = 0
    hist = None
    for key in keys:
        part, done = _part_paths(root, stage, key)
        with open(done) as f:
            meta = json.load(f)
        files.append({"name": os.path.basename(part), "rows": meta["rows"]})
        n_rows += meta["rows"]
        h = meta.get("score_histogram")
        if h is not None:
            hist = h if hist is None else [a + b for a, b in zip(hist, h)]
    manifest = {
        "stage": stage,
        "n_rows": n_rows,
        "n_files": len(files),
        "files": files,
        "score_histogram": hist,
        "input_stages": input_stages or [],
        "params_fingerprint": fp,
        "partition_keys": list(keys),
    }
    with open(os.path.join(stage_dir, "manifest.json.tmp"), "w") as f:
        json.dump(manifest, f)
    os.replace(
        os.path.join(stage_dir, "manifest.json.tmp"),
        os.path.join(stage_dir, "manifest.json"),
    )
    return read_checkpoint(root, stage), n_skipped
