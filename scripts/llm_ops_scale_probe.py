#!/usr/bin/env python
"""Scale probe for remove_duplicate_spans / bpe_encode / rarity_score
(round 5): times each op at TWO volumes (2.5M and 10M docs by default)
on a deterministic synthetic corpus — a super-linear stage shows as a
wall ratio well above the 4x data ratio.

Corpus shape (seed 13): ~20 words per doc from a 1,000-word Zipf-ish
pool. The stride-1 window census is still dominated by DISTINCT windows
(1000^10 space — the honest spans working set, ~11 windows/doc at
window=10); 5% of docs embed one of 50 shared 12-word spans, so the
duplicated set is real but bounded. rarity_score runs at ngram=2 so the
DF census has genuine reuse (~hundreds of thousands of distinct bigrams
with Zipf skew) — a DF=1-everywhere trigram census over random words is
degenerate: it measures a pathological census merge, not the
commonness-resolve path real corpora exercise. BPE merges are learned
ONCE on the small corpus and applied to both (the apply wall is the
measure, mirroring bench's encode-only timing).

Usage: python scripts/llm_ops_scale_probe.py [--rows 10000000]
Prints one JSON line; results recorded in BASELINE.md round 5.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = "/tmp/raylink_llm_probe"


def synthesize(n_rows: int, seed: int = 13) -> str:
    out = os.path.join(ROOT, f"docs-n{n_rows}-s{seed}-v1000-c250k")
    done = os.path.join(out, ".complete")
    if os.path.exists(done):
        return out
    tmp = f"{out}.tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i:04d}" for i in range(1000)])
    # Zipf-ish draw: squared uniform skews toward low indices
    spans = [
        " ".join(vocab[rng.integers(0, 1000, size=12)]) for _ in range(50)
    ]
    chunk = 250_000
    for i in range(0, n_rows, chunk):
        n = min(chunk, n_rows - i)
        widx = (rng.random((n, 20)) ** 2 * 1000).astype(np.int64)
        body = [" ".join(vocab[r]) for r in widx]
        has_span = rng.random(n) < 0.05
        sidx = rng.integers(0, 50, size=n)
        texts = [
            (spans[sidx[r]] + " " + body[r]) if has_span[r] else body[r]
            for r in range(n)
        ]
        t = pa.table({
            "doc_id": pa.array(np.arange(i, i + n, dtype=np.int64)),
            "text": pa.array(texts, type=pa.string()),
        })
        pq.write_table(t, os.path.join(tmp, f"part-{i // chunk:05d}.parquet"))
    with open(os.path.join(tmp, ".complete"), "w") as f:
        f.write("ok")
    os.rename(tmp, out)
    return out


def synthesize_diverse(n_rows: int, seed: int = 17) -> str:
    """Winnow-shaped corpus: ~20 words from a 200k-word pool (16-char
    shingles mostly UNIQUE — the realistic web-diversity case; the
    Zipf corpus above makes every 3-word phrase boilerplate and the
    pair volume degenerates to the posting caps), with 4% of docs
    appending a 12-word chunk copied from the previous doc so true
    pairwise overlaps exist at bucket size ~2."""
    out = os.path.join(ROOT, f"docs-div-n{n_rows}-s{seed}-v200k")
    done = os.path.join(out, ".complete")
    if os.path.exists(done):
        return out
    tmp = f"{out}.tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    rng = np.random.default_rng(seed)
    chunk = 250_000
    for i in range(0, n_rows, chunk):
        n = min(chunk, n_rows - i)
        widx = rng.integers(0, 200_000, size=(n, 20))
        body = [" ".join(f"w{j:06d}" for j in r) for r in widx]
        copies = rng.random(n) < 0.04
        texts = [
            (body[r] + " " + " ".join(body[r - 1].split()[:12]))
            if (copies[r] and r > 0) else body[r]
            for r in range(n)
        ]
        t = pa.table({
            "doc_id": pa.array(np.arange(i, i + n, dtype=np.int64)),
            "text": pa.array(texts, type=pa.string()),
        })
        pq.write_table(t, os.path.join(tmp, f"part-{i // chunk:05d}.parquet"))
    with open(os.path.join(tmp, ".complete"), "w") as f:
        f.write("ok")
    os.rename(tmp, out)
    return out


def main():
    n_big = 10_000_000
    for a in sys.argv[1:]:
        if a.startswith("--rows"):
            n_big = int(sys.argv[sys.argv.index(a) + 1]) if a == "--rows" else int(a.split("=")[1])
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from raylink.workers import ensure_workers_can_import

    ensure_workers_can_import()  # probe must run from any cwd, like the contract
    import numpy as _np
    import pyarrow as _pa
    import pyarrow.compute as _pc

    from raylink.aggs import merge_records, rank_within_key
    from raylink.dedup import remove_duplicate_spans, winnow_overlap_pairs
    from raylink.textstats import bpe_encode, bpe_learn, rarity_score

    def _with_key_len(b):
        ids = _np.asarray(b["doc_id"].to_numpy(zero_copy_only=False))
        return _pa.table(
            {
                "doc_id": b["doc_id"],
                "text": b["text"],
                "k32": _pa.array((ids % 32).astype("int64")),
                "nc": _pc.cast(
                    _pc.utf8_length(b["text"].combine_chunks()), _pa.int64()
                ),
            }
        )

    only = None
    if "--ops" in sys.argv:
        only = set(sys.argv[sys.argv.index("--ops") + 1].split(","))

    path = synthesize(n_big)
    # Small volume = a FILE subset, never .limit(): Ray Data's limit is
    # not re-execution-stable under streaming execution (two executions
    # of the same lazy plan can pick different rows), and the two-pass
    # ops here (census -> resolve) re-execute their input. rarity_score's
    # census guard catches exactly this; file lists are deterministic.
    import glob as _glob

    files = sorted(_glob.glob(os.path.join(path, "part-*.parquet")))
    n_small_files = max(1, len(files) // 4)
    n_small = n_small_files * 250_000
    merges = bpe_learn(
        rd.read_parquet(files[:n_small_files]), n_merges=200, min_count=2
    )
    res = {"metric": "llm_ops_scale_probe", "rows_small": n_small,
           "rows_big": n_big}
    want_winnow = only is None or "winnow_overlap_pairs" in only
    dfiles = []
    if want_winnow:
        dpath = synthesize_diverse(n_big)
        dfiles = sorted(_glob.glob(os.path.join(dpath, "part-*.parquet")))
    for label, n in (("small", n_small), ("big", n_big)):
        ds = rd.read_parquet(
            files[:n_small_files] if n < n_big else files
        )
        dds = (
            rd.read_parquet(
                dfiles[:n_small_files] if n < n_big else dfiles
            )
            if want_winnow
            else None
        )
        res[label] = {}
        for op, thunk in (
            ("remove_duplicate_spans", lambda d=ds: remove_duplicate_spans(
                d, "doc_id", "text", window=10).count()),
            ("bpe_encode", lambda d=ds: bpe_encode(
                d, merges, keep_cols=()).count()),
            ("rarity_score", lambda d=ds: rarity_score(
                d, "doc_id", "text", ngram=2).count()),
            # winnowing (r5 sixth session) runs on the DIVERSE corpus:
            # the Zipf pool makes every 3-word phrase boilerplate, so
            # the mid-size fingerprint buckets alone emit a spill-
            # breaking pair volume (measured: object-store spill filled
            # the disk at 10M docs) — a degenerate all-boilerplate
            # corpus is a cap-tuning exercise, not a scale shape
            ("winnow_overlap_pairs", lambda d=dds: winnow_overlap_pairs(
                d, "doc_id", "text", k=16, window=8, min_shared=2,
                max_posting=200).count()),
            # r5 eighth session: the aggs transforms over 32 domains —
            # rank = census digest + composite-key join-back over the
            # full corpus; merge = one combined reduce digest + one
            # mode census
            ("rank_within_key", lambda d=ds: rank_within_key(
                d.map_batches(_with_key_len, batch_format="pyarrow"),
                "k32", "nc").count()),
            ("merge_records", lambda d=ds: merge_records(
                d.map_batches(_with_key_len, batch_format="pyarrow"),
                "k32",
                {"text": "longest", "nc": "max", "doc_id": "first"},
                id_col="doc_id").count()),
        ):
            if only is not None and op not in only:
                continue
            # best-of-3 (not the bench's best-of-2): the big-volume first
            # rep pays ~10-15 GiB of plasma first-touch page faults that
            # rep 2 still partially re-pays — rep 3 is the steady state
            # a long-running pipeline actually sees (raw walls kept).
            walls, rows = [], 0
            for _ in range(3):
                t0 = time.perf_counter()
                rows = thunk()
                walls.append(round(time.perf_counter() - t0, 2))
            res[label][op] = {"sec": min(walls), "rows": rows, "walls": walls}
    res["big_over_small_wall_ratio"] = {
        op: round(res["big"][op]["sec"] / res["small"][op]["sec"], 2)
        for op in res["small"]
    }
    print(json.dumps(res))
    ray.shutdown()


if __name__ == "__main__":
    main()
