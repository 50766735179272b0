#!/usr/bin/env python
"""Scale probe for contamination_check's bloom prefilter (round 5): on
the same 2.5M-doc corpus and 100k-doc eval set, time the bloom mode
(bitmap broadcast + exact confirm restricted to bloom positives) against
the pure distributed mode (ALL corpus (doc, gram) rows through the
semi-join co-shuffle). Both produce the identical exact output (asserted
on the contaminated count); the difference is shuffle volume — the probe
makes the 100 TB story measurable on one box.

Corpus = llm_ops_scale_probe.synthesize (seed 13: 20-word Zipf-ish docs,
5% embed one of 50 shared 12-word spans). Eval = a DIFFERENT-seed draw
from the same vocabulary plus the same span pool, so true hits
concentrate in the span docs — the realistic decontamination shape
(rare real hits, most of the corpus clean).

Usage: python scripts/contamination_scale_probe.py [--rows 2500000]
Prints one JSON line; results recorded in BASELINE.md round 5.
"""
from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "scripts")
)

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from llm_ops_scale_probe import ROOT, synthesize


def synthesize_eval(n_rows: int, seed: int = 29) -> str:
    # Body words come from a DISJOINT vocabulary (e####, not the corpus's
    # w####): with a shared 1000-word Zipf vocab the common trigrams alone
    # contaminate ~33% of the corpus, which is adversarial for ANY
    # prefilter — real decontamination is rare-hit (the eval benchmark is
    # not drawn from the training corpus's word distribution; overlap
    # comes from actually-copied passages, here the shared span pool).
    out = os.path.join(ROOT, f"eval-n{n_rows}-s{seed}-dvocab")
    done = os.path.join(out, ".complete")
    if os.path.exists(done):
        return out
    tmp = f"{out}.tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    rng = np.random.default_rng(13)  # SAME span pool as the corpus
    vocab = np.array([f"w{i:04d}" for i in range(1000)])
    spans = [
        " ".join(vocab[rng.integers(0, 1000, size=12)]) for _ in range(50)
    ]
    evocab = np.array([f"e{i:04d}" for i in range(1000)])
    erng = np.random.default_rng(seed)
    widx = (erng.random((n_rows, 20)) ** 2 * 1000).astype(np.int64)
    body = [" ".join(evocab[r]) for r in widx]
    has_span = erng.random(n_rows) < 0.5  # half the eval docs carry a span
    sidx = erng.integers(0, 50, size=n_rows)
    texts = [
        (spans[sidx[r]] + " " + body[r]) if has_span[r] else body[r]
        for r in range(n_rows)
    ]
    t = pa.table({
        "doc_id": pa.array(np.arange(n_rows, dtype=np.int64)),
        "text": pa.array(texts, type=pa.string()),
    })
    pq.write_table(t, os.path.join(tmp, "part-00000.parquet"))
    with open(os.path.join(tmp, ".complete"), "w") as f:
        f.write("ok")
    os.rename(tmp, out)
    return out


def main():
    n_rows = 2_500_000
    for a in sys.argv[1:]:
        if a.startswith("--rows"):
            n_rows = (
                int(sys.argv[sys.argv.index(a) + 1])
                if a == "--rows"
                else int(a.split("=")[1])
            )
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from raylink.workers import ensure_workers_can_import

    ensure_workers_can_import()
    from raylink.dedup import contamination_check

    corpus_path = synthesize(n_rows)
    files = sorted(glob.glob(os.path.join(corpus_path, "part-*.parquet")))
    eval_path = synthesize_eval(100_000)

    res = {"metric": "contamination_scale_probe", "rows": n_rows,
           "eval_rows": 100_000}
    counts = {}
    for mode in ("bloom", "distributed"):
        walls = []
        n_cont = 0
        for _ in range(3):
            corpus = rd.read_parquet(files)
            ev = rd.read_parquet(
                sorted(glob.glob(os.path.join(eval_path, "part-*.parquet")))
            )
            t0 = time.perf_counter()
            out = contamination_check(
                corpus, ev, "doc_id", "text", ngram=3, mode=mode
            )

            def _nc(t: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                s = pc.sum(pc.cast(t["contaminated"], pa.int64())).as_py()
                return pa.table({"c": pa.array([s or 0], pa.int64())})

            n_cont = int(
                out.map_batches(_nc, batch_format="pyarrow").sum("c") or 0
            )
            walls.append(round(time.perf_counter() - t0, 2))
        counts[mode] = n_cont
        res[mode] = {"sec": min(walls), "walls": walls,
                     "contaminated": n_cont}
    assert counts["bloom"] == counts["distributed"], counts
    res["distributed_over_bloom"] = round(
        res["distributed"]["sec"] / res["bloom"]["sec"], 2
    )

    # The structural difference is SHUFFLE VOLUME (what a single box
    # can't price but a network does): rows entering the confirm
    # semi-join's all-to-all under each mode.
    import pyarrow.compute as pc

    from raylink.broadcast import cached_object
    from raylink.dedup import (
        _BLOOM_BITS_MAX,
        _BLOOM_BITS_MIN,
        _BLOOM_BITS_PER_GRAM,
        _bloom_build,
        _bloom_positions,
        _bloom_test,
        _doc_distinct_grams,
        _word_ngrams_flat,
    )

    def eval_partial(batch: pa.Table) -> pa.Table:
        _, grams = _word_ngrams_flat(batch["text"], 3)
        return pa.table({"gram": pc.unique(grams)})

    eg = (
        rd.read_parquet(sorted(glob.glob(os.path.join(eval_path, "part-*.parquet"))))
        .map_batches(eval_partial, batch_format="pyarrow")
        .materialize()
    )
    n_eval = eg.count()
    # the library's auto-sizing, constants included — the probe must
    # measure the bitmap contamination_check actually uses
    m_bits = min(
        1
        << max(
            _BLOOM_BITS_MIN.bit_length() - 1,
            int(np.ceil(np.log2(_BLOOM_BITS_PER_GRAM * max(n_eval, 1)))),
        ),
        _BLOOM_BITS_MAX,
    )
    bm_ref = ray.put(_bloom_build(eg, m_bits))

    def cg_bloom(batch: pa.Table) -> pa.Table:
        t = _doc_distinct_grams(batch, "doc_id", "text", 3).select(
            ["doc_id", "gram"]
        )
        g = t["gram"].combine_chunks()
        if not len(g):
            return t
        hit = _bloom_test(cached_object(bm_ref), _bloom_positions(g, m_bits))
        return t.filter(pa.array(hit))

    def cg_all(batch: pa.Table) -> pa.Table:
        return _doc_distinct_grams(batch, "doc_id", "text", 3).select(
            ["doc_id", "gram"]
        )

    res["confirm_shuffle_rows"] = {
        "bloom": rd.read_parquet(files)
        .map_batches(cg_bloom, batch_format="pyarrow")
        .count(),
        "distributed": rd.read_parquet(files)
        .map_batches(cg_all, batch_format="pyarrow")
        .count(),
        "bloom_bitmap_mib": m_bits >> 23,
    }
    print(json.dumps(res))
    ray.shutdown()


if __name__ == "__main__":
    main()
