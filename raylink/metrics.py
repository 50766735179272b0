"""Precision-recall curve as in the reference, plus a distributed-friendly
exact variant computed from a (similarity -> count/sum) aggregate.

Parity target: polyfuzz/metrics.py:12-53 —
  * thresholds = ``np.arange(0, 1 + step, step)`` (fp noise INCLUDED: the
    reference compares ``sim >= 0.30000000000000004`` at the 0.3 step);
  * recall(t) = count(sim >= t) / total (total includes unmatched sim-0
    rows);
  * average_precision(t) = mean(sim[sim >= t]) — NaN when the selection is
    empty (the reference suppresses the RuntimeWarning, metrics.py:49-51).

The distributed path never ships the similarity column to the driver: the
engine runs ``matches.groupby("similarity").count()+sum()`` (distinct sims
are bounded — TF-IDF sims are rounded to 3 decimals, edit-distance sims are
small-denominator rationals) and finalizes the exact curve from that tiny
table via :func:`pr_curve_from_value_counts`.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def precision_recall_curve(
    matches: pd.DataFrame, precision_steps: float = 0.01
) -> tuple[list[float], list[float], list[float]]:
    """Exact reference semantics over an in-memory matches frame."""
    sims = matches["Similarity"].to_numpy(dtype=np.float64)
    return pr_curve_from_values(sims, precision_steps)


def pr_curve_from_values(
    sims: np.ndarray, precision_steps: float = 0.01
) -> tuple[list[float], list[float], list[float]]:
    min_precisions = list(np.arange(0.0, 1 + precision_steps, precision_steps))
    total = len(sims)
    recall: list[float] = []
    average_precision: list[float] = []
    for t in min_precisions:
        sel = sims[sims >= t]
        recall.append(len(sel) / total if total else 0.0)
        average_precision.append(float(np.mean(sel)) if len(sel) else float("nan"))
    return min_precisions, recall, average_precision


def pr_curve_from_value_counts(
    values: np.ndarray,
    counts: np.ndarray,
    precision_steps: float = 0.01,
    threshold_mode: str = "arange",
) -> pd.DataFrame:
    """Exact PR curve from a (distinct similarity, count) aggregate.

    ``threshold_mode="arange"`` reproduces the reference's fp-noisy
    ``np.arange`` grid; ``"decimal"`` uses exact i*step decimals (the
    SQL-oracle-friendly grid used by the driver correctness queries).
    Returns a frame (min_precision, recall, average_precision).
    """
    values = np.asarray(values, dtype=np.float64)
    counts = np.asarray(counts, dtype=np.float64)
    order = np.argsort(values)
    values, counts = values[order], counts[order]
    csum_n = np.cumsum(counts[::-1])[::-1]  # count of sims >= values[i]
    csum_v = np.cumsum((counts * values)[::-1])[::-1]
    total = counts.sum()
    if threshold_mode == "arange":
        thresholds = np.arange(0.0, 1 + precision_steps, precision_steps)
    else:
        n_steps = int(round(1 / precision_steps))
        # i/n gives the correctly-rounded decimal (matching SQL i/100.0);
        # i*step would re-introduce arange-style fp noise.
        thresholds = np.array(
            [i / n_steps for i in range(n_steps + 1)], dtype=np.float64
        )
    pos = np.searchsorted(values, thresholds, side="left")
    if not len(values):  # zero matches: all-zero curve (milli variant parity)
        n_ge = np.zeros(len(thresholds))
        s_ge = np.zeros(len(thresholds))
    else:
        n_ge = np.where(
            pos < len(values), csum_n[np.minimum(pos, len(values) - 1)], 0.0
        )
        s_ge = np.where(
            pos < len(values), csum_v[np.minimum(pos, len(values) - 1)], 0.0
        )
    recall = n_ge / total if total else np.zeros_like(n_ge)
    with np.errstate(invalid="ignore", divide="ignore"):
        avg_p = s_ge / n_ge
    return pd.DataFrame(
        {
            "min_precision": thresholds,
            "recall": recall,
            "average_precision": avg_p,
        }
    )


def pr_curve_milli_exact(
    values: np.ndarray,
    counts: np.ndarray,
    precision_steps: float = 0.01,
    threshold_mode: str = "arange",
) -> pd.DataFrame:
    """PR curve over ROUND-3 similarities with SQL-exact arithmetic: values
    quantized to integer millis (lossless for round-3 sims: milli/1000.0 is
    the correctly-rounded double on both engines), sums taken in int64, and
    the final floats produced by the exact division sequence the DuckDB
    oracle uses (sum/count/1000.0; count/total) — no accumulation-order
    noise can differ between numpy and SQL. Thresholds keep the reference's
    fp-noisy ``np.arange`` grid (polyfuzz/metrics.py:37) under ``"arange"``.
    """
    values = np.asarray(values, dtype=np.float64)
    counts_i = np.asarray(counts, dtype=np.int64)
    milli = np.round(values * 1000).astype(np.int64)
    order = np.argsort(milli)
    milli, counts_i = milli[order], counts_i[order]
    canon_vals = milli / 1000.0  # the canonical round-3 doubles
    csum_n = np.cumsum(counts_i[::-1])[::-1]
    csum_m = np.cumsum((counts_i * milli)[::-1])[::-1]
    total = int(counts_i.sum())
    if threshold_mode == "arange":
        thresholds = np.arange(0.0, 1 + precision_steps, precision_steps)
    else:
        n_steps = int(round(1 / precision_steps))
        thresholds = np.array(
            [i / n_steps for i in range(n_steps + 1)], dtype=np.float64
        )
    pos = np.searchsorted(canon_vals, thresholds, side="left")
    safe = np.minimum(pos, max(len(canon_vals) - 1, 0))
    has = pos < len(canon_vals)
    n_ge = np.where(has, csum_n[safe] if len(canon_vals) else 0, 0).astype(
        np.float64
    )
    s_ge = np.where(has, csum_m[safe] if len(canon_vals) else 0, 0).astype(
        np.float64
    )
    recall = n_ge / total if total else np.zeros_like(n_ge)
    with np.errstate(invalid="ignore", divide="ignore"):
        avg_p = s_ge / n_ge / 1000.0
    return pd.DataFrame(
        {
            "min_precision": thresholds,
            "recall": recall,
            "average_precision": avg_p,
        }
    )


def value_counts_bounded(ds, col: str):
    """Value counts of a BOUNDED-cardinality column (e.g. round-3
    similarities: ≤ 1001 distinct values) without a Ray groupby shuffle:
    per-batch ``np.unique`` partials (each at most the cardinality) merged
    once on the driver. Returns (values float64, counts float64). A
    groupby here pays a full sort-shuffle to produce ≤ 1001 rows."""
    import pyarrow as pa
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        if batch[col].null_count:
            # loud rejection: a null/NaN similarity row would sort LAST,
            # never merge with anything (NaN != NaN), and poison the PR
            # finalizers (n_ge picks up null counts above the max real
            # sim; NaN*1000 -> int64 is platform-dependent). Callers
            # following the <0.001 -> null frame rule must fill or
            # filter first (the flagship pads 0.0).
            raise ValueError(
                f"null values in {col!r} — fill or filter before the "
                "value-counts census (NaN never merges and corrupts the "
                "PR finalizers silently)"
            )
        vals = np.asarray(
            batch[col].to_numpy(zero_copy_only=False), dtype=np.float64
        )
        if len(vals) and np.isnan(vals).any():
            raise ValueError(
                f"NaN values in {col!r} — fill or filter before the "
                "value-counts census"
            )
        u, c = np.unique(vals, return_counts=True)
        return pa.table(
            {"value": pa.array(u), "n": pa.array(c.astype(np.int64))}
        )

    parts = pa.concat_tables(
        ray.get(
            ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
        ),
        promote_options="default",
    )
    v = np.asarray(parts["value"].to_numpy(zero_copy_only=False))
    n = np.asarray(parts["n"].to_numpy(zero_copy_only=False), dtype=np.float64)
    order = np.argsort(v, kind="stable")
    v, n = v[order], n[order]
    if len(v):
        starts = np.flatnonzero(np.r_[True, v[1:] != v[:-1]])
        return v[starts], np.add.reduceat(n, starts)
    return v, n


def pr_curves_for_matches(
    matches_by_model: dict, precision_steps: float = 0.01,
    threshold_mode: str = "arange", similarity_col: str = "similarity",
):
    """Per-model precision-recall curves as Ray Data aggregations — the
    distributed ``visualize_precision_recall`` numbers
    (polyfuzz/polyfuzz.py:286-329): per model, a bounded value-count
    pre-aggregate (see :func:`value_counts_bounded`) finalized exactly on
    the driver. Returns a single frame
    (model_id, min_precision, recall, average_precision)."""
    import pandas as pd

    frames = []
    for model_id, ds in matches_by_model.items():
        vals, cnts = value_counts_bounded(ds, similarity_col)
        curve = pr_curve_from_value_counts(
            vals, cnts, precision_steps, threshold_mode=threshold_mode
        )
        curve.insert(0, "model_id", model_id)
        frames.append(curve)
    return pd.concat(frames, ignore_index=True)


def pairwise_f1(
    pairs: pd.DataFrame,
    labels_ours: dict,
    labels_ref: dict,
) -> dict:
    """Pairwise F1 of our cluster co-membership vs the reference oracle's,
    evaluated on a labeled-pairs table (entity_a, entity_b) — the north-rule
    gate (BASELINE.md). ``labels_*`` map string -> cluster id; strings
    missing from a map are singletons."""
    a = pairs["entity_a"].tolist()
    b = pairs["entity_b"].tolist()

    def same(labels, x, y):
        lx = labels.get(x)
        ly = labels.get(y)
        if lx is None or ly is None:
            return x == y
        return lx == ly

    tp = fp = fn = tn = 0
    for x, y in zip(a, b):
        ref = same(labels_ref, x, y)
        ours = same(labels_ours, x, y)
        if ref and ours:
            tp += 1
        elif ours and not ref:
            fp += 1
        elif ref and not ours:
            fn += 1
        else:
            tn += 1
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall
        else 0.0
    )
    return {
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "tn": tn,
        "precision": precision,
        "recall": recall,
        "f1": f1,
    }


def blocking_quality(
    pairs_ds,
    labels_ds,
    id_a: str = "a",
    id_b: str = "b",
    label_id: str = "id",
    label_col: str = "entity",
    max_broadcast_rows: int = 20_000_000,
    driver_merge_max_rows: int = 2_000_000,
):
    """Blocking-scheme evaluation against ground truth — the two standard
    ER blocking metrics, integer-exact:

      * pair completeness  = matched candidate pairs / true pairs
        (how much of the linkage signal the blocking keeps);
      * reduction ratio    = 1 - candidate pairs / C(n, 2)
        (how much of the quadratic comparison space it prunes).

    ``pairs_ds`` = candidate pairs (rows counted AS GIVEN — deduplicate
    upstream if the scheme can emit a pair twice); ``labels_ds`` = one
    row per record (``label_id``, ``label_col``). True pairs are counted
    from per-entity sizes (sum n_e*(n_e-1)/2 — never materialized); the
    matched count joins each pair to its two labels (label map broadcast
    via ray.put below ``max_broadcast_rows`` records so the pairs stream;
    two equi_join co-shuffles above). Returns ONE pandas row of counts
    plus milli-ratios (integer * 1000 // denominator — the SQL-exact
    division rule): n_records, n_cand_pairs, n_true_pairs, n_matched,
    pair_completeness_milli, reduction_ratio_milli."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    from raylink.aggs import _digest_merge, _int64_key_info
    from raylink.blocking import _hash64
    from raylink.broadcast import cached_object
    from raylink.joins import _nonull, _string_part_hash, equi_join

    int_ent, _s, _t = _int64_key_info(
        labels_ds.schema(), label_col, "blocking_quality"
    )
    # per-batch loud rejections in EVERY mode (the broadcast path would
    # otherwise raise where the distributed equi_join path silently
    # drops null keys, and duplicate label ids make the two modes count
    # matches differently — index_in hits the first occurrence, a join
    # emits one row per duplicate). The checks run BEFORE materialize,
    # so they execute exactly once and downstream consumers read the
    # checked blocks; zero-column placeholder blocks pass through.
    def _check_pairs(batch: pa.Table) -> pa.Table:
        if id_a not in batch.column_names:  # schema-dropped empty block
            return batch
        _nonull(batch[id_a], id_a, "blocking_quality")
        _nonull(batch[id_b], id_b, "blocking_quality")
        return batch

    def _check_labels(batch: pa.Table) -> pa.Table:
        if label_id not in batch.column_names:
            return batch
        ids = _nonull(batch[label_id], label_id, "blocking_quality")
        _nonull(batch[label_col], label_col, "blocking_quality")
        n_dup = batch.num_rows - len(pc.unique(ids))
        if n_dup:
            raise ValueError(
                f"blocking_quality: {n_dup} duplicate {label_id!r} "
                "value(s) within a batch — duplicate label ids make the "
                "match count mode-dependent; dedupe upstream"
            )
        return batch

    pairs_ds = pairs_ds.map_batches(
        _check_pairs, batch_format="pyarrow"
    ).materialize()
    labels_ds = labels_ds.map_batches(
        _check_labels, batch_format="pyarrow"
    ).materialize()
    n_records = labels_ds.count()
    n_cand = pairs_ds.count()
    if n_records == 0:
        return pd.DataFrame(
            {
                "n_records": [0],
                "n_cand_pairs": [n_cand],
                "n_true_pairs": [0],
                "n_matched": [0],
                "pair_completeness_milli": [0],
                "reduction_ratio_milli": [0],
            }
        )

    # ---- true-pair count from per-entity sizes (digest, never pairs);
    # the census family's fine modulus (a hardcoded small P would cap
    # the _sized_groupby rebase above the driver bound)
    from raylink.aggs import _census_part_col, _default_parts

    P = _default_parts(None)
    _ENT_EMPTY = pa.table(
        {
            "k": pa.array([], pa.int64() if int_ent else pa.string()),
            "cnt": pa.array([], pa.int64()),
            "part": pa.array([], pa.int64()),
        }
    )

    def ent_partial(batch: pa.Table) -> pa.Table:
        if label_col not in batch.column_names or not batch.num_rows:
            return _ENT_EMPTY  # schema-dropped placeholder block
        ents = _nonull(batch[label_col], label_col, "blocking_quality")
        enc = ents.dictionary_encode()
        codes = np.asarray(
            enc.indices.to_numpy(zero_copy_only=False), np.int64
        )
        u, c = np.unique(codes, return_counts=True)
        keys = enc.dictionary.take(pa.array(u))
        return pa.table(
            {
                "k": keys,
                "cnt": pa.array(c.astype(np.int64)),
                "part": _census_part_col(keys, P),
            }
        )

    def ent_merge(g: pa.Table) -> pa.Table:
        if not g.num_rows:
            return pa.table({"tp": pa.array([], pa.int64())})
        ka = g["k"].combine_chunks()
        enc = ka.dictionary_encode()
        codes = np.asarray(
            enc.indices.to_numpy(zero_copy_only=False), np.int64
        )
        cnts = np.asarray(g["cnt"].to_numpy(zero_copy_only=False), np.int64)
        order = np.argsort(codes, kind="stable")
        cs, vs = codes[order], cnts[order]
        starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
        tot = np.add.reduceat(vs, starts)
        tp = int((tot * (tot - 1) // 2).sum())
        return pa.table({"tp": pa.array([tp], pa.int64())})

    tp_parts = _digest_merge(
        labels_ds.map_batches(ent_partial, batch_format="pyarrow"),
        ent_merge,
        driver_merge_max_rows,
        empty_fn=lambda: pa.table({"tp": pa.array([], pa.int64())}),
    )
    n_true = int(
        sum(
            int(t["tp"][i].as_py())
            for t in ray.get(tp_parts.to_arrow_refs())
            if "tp" in t.column_names
            for i in range(t.num_rows)
        )
    )

    # ---- matched candidate pairs (byte-aware broadcast switch — the
    # round-5 convention: 20M long-string labels would be a multi-GB
    # ray.put; size_bytes() of the materialized labels bounds the slim
    # projection from above)
    if (
        n_records <= max_broadcast_rows
        and (labels_ds.size_bytes() or 0) <= (1 << 30)
    ):
        slim = pa.concat_tables(
            [
                t.select([label_id, label_col])
                for t in ray.get(labels_ds.to_arrow_refs())
                if label_id in t.column_names
            ],
            promote_options="default",
        )
        ids_arr = _nonull(slim[label_id], label_id, "blocking_quality")
        ents_arr = _nonull(slim[label_col], label_col, "blocking_quality")
        if len(pc.unique(ids_arr)) != len(ids_arr):
            # the collected side sees CROSS-batch duplicates too
            raise ValueError(
                f"blocking_quality: duplicate {label_id!r} values across "
                "batches — dedupe the label table upstream"
            )
        ref = ray.put((ids_arr, ents_arr))

        def count_matched(batch: pa.Table) -> pa.Table:
            if id_a not in batch.column_names:  # placeholder block
                return pa.table({"m": pa.array([0], pa.int64())})
            sids, sents = cached_object(ref)
            # index_in: exact hash lookup, int OR string ids; misses are
            # null -> both lookups must land AND entities must equal
            ia = pc.index_in(
                _nonull(batch[id_a], id_a, "blocking_quality"),
                value_set=sids,
            )
            ib = pc.index_in(
                _nonull(batch[id_b], id_b, "blocking_quality"),
                value_set=sids,
            )
            ea = sents.take(ia)  # null index -> null value
            eb = sents.take(ib)
            eq = pc.and_kleene(
                pc.equal(ea, eb),
                pc.and_(pc.is_valid(ea), pc.is_valid(eb)),
            )
            n = int(pc.sum(pc.cast(eq, pa.int64())).as_py() or 0)
            return pa.table({"m": pa.array([n], pa.int64())})

        m_ds = pairs_ds.map_batches(count_matched, batch_format="pyarrow")
    else:
        # cross-batch duplicate label ids must fail HERE too (the
        # broadcast path checks the collected table): per-id count
        # digest partitioned by id hash — a global count > 1 raises,
        # never a silently inflated match count
        def id_partial(batch: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "k": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                    "part": pa.array([], pa.int64()),
                }
            )
            if label_id not in batch.column_names or not batch.num_rows:
                return empty
            ids = _nonull(batch[label_id], label_id, "blocking_quality")
            enc = ids.dictionary_encode()
            codes = np.asarray(
                enc.indices.to_numpy(zero_copy_only=False), np.int64
            )
            u, c = np.unique(codes, return_counts=True)
            keys = enc.dictionary.take(pa.array(u))
            return pa.table(
                {
                    "k": keys,
                    "cnt": pa.array(c.astype(np.int64)),
                    "part": _census_part_col(keys, P),
                }
            )

        def id_merge(g: pa.Table) -> pa.Table:
            if g.num_rows:
                gb = g.group_by(["k"]).aggregate([("cnt", "sum")])
                mx = pc.max(gb["cnt_sum"]).as_py()
                if mx and int(mx) > 1:
                    raise ValueError(
                        f"blocking_quality: duplicate {label_id!r} values "
                        "across batches — dedupe the label table upstream"
                    )
            return pa.table({"ok": pa.array([1], pa.int64())})

        _digest_merge(
            labels_ds.map_batches(id_partial, batch_format="pyarrow"),
            id_merge,
            driver_merge_max_rows,  # both dispatch paths see every id's
            # global count (driver concat / id-hash partitions)
            empty_fn=lambda: pa.table({"ok": pa.array([], pa.int64())}),
        ).count()

        la = equi_join(
            pairs_ds, labels_ds, id_a, label_id,
            left_cols=(id_b,), right_cols=(label_col,),
            mode="distributed", output="dataset",
        )

        def ren(batch: pa.Table) -> pa.Table:
            return batch.rename_columns(
                [id_a, id_b, "ent_a"]
            )

        la = la.map_batches(ren, batch_format="pyarrow")
        lb = equi_join(
            la, labels_ds, id_b, label_id,
            left_cols=("ent_a",), right_cols=(label_col,),
            mode="distributed", output="dataset",
        )

        def cm(batch: pa.Table) -> pa.Table:
            if "ent_a" not in batch.column_names:
                return pa.table({"m": pa.array([0], pa.int64())})
            n = int(
                pc.sum(
                    pc.equal(batch["ent_a"], batch[label_col])
                ).as_py()
                or 0
            )
            return pa.table({"m": pa.array([n], pa.int64())})

        m_ds = lb.map_batches(cm, batch_format="pyarrow")
    n_matched = int(
        sum(
            int(t["m"][i].as_py())
            for t in ray.get(m_ds.to_arrow_refs())
            if "m" in t.column_names
            for i in range(t.num_rows)
        )
    )
    space = n_records * (n_records - 1) // 2
    return pd.DataFrame(
        {
            "n_records": [n_records],
            "n_cand_pairs": [n_cand],
            "n_true_pairs": [n_true],
            "n_matched": [n_matched],
            "pair_completeness_milli": [
                (n_matched * 1000 // n_true) if n_true else 0
            ],
            "reduction_ratio_milli": [
                ((space - n_cand) * 1000 // space) if space else 0
            ],
        }
    )


def clustering_quality(
    labels_ds,
    pred_col: str,
    true_col: str,
    driver_merge_max_rows: int = 2_000_000,
):
    """Pairwise clustering evaluation against ground truth — the ER
    cluster-quality metrics, integer-exact from the CONTINGENCY census
    (no pair is ever materialized):

      * TP          = Σ_cells C(n_ij, 2)   (pairs together in BOTH)
      * pred pairs  = Σ_i C(n_i., 2)       (pairs the clustering makes)
      * true pairs  = Σ_j C(n_.j, 2)       (pairs the truth makes)
      * precision   = TP / pred pairs, recall = TP / true pairs,
        F1 = 2·TP / (pred + true)  — all as milli ratios
        (integer·1000 // denominator, the SQL division rule).

    ``labels_ds`` = one row per record with its predicted cluster and
    its true entity (int64 or string, both columns). Scale shape: one
    (pred, true, count) census partitioned by PRED hash (a pred
    cluster's cells co-locate, so per-partition Σ C(n_ij,2) and
    Σ C(n_i.,2) are exact) plus one (true, count) census partitioned by
    TRUE hash for the true marginal — the input is consumed twice
    (materialized internally). Nulls reject loudly. Returns ONE pandas
    row of counts + milli ratios."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    from raylink.aggs import _digest_merge, _int64_key_info, _pa_type_of
    from raylink.blocking import _hash64
    from raylink.joins import _nonull, _string_part_hash

    _int64_key_info(labels_ds.schema(), pred_col, "clustering_quality")
    _int64_key_info(labels_ds.schema(), true_col, "clustering_quality")
    _sch = dict(zip(labels_ds.schema().names, labels_ds.schema().types))
    pred_t = _pa_type_of(_sch[pred_col])
    true_t = _pa_type_of(_sch[true_col])
    labels_ds = labels_ds.materialize()
    n_records = labels_ds.count()
    from raylink.aggs import _census_part_col, _default_parts

    P = _default_parts(None)

    def _hash_part(keys: pa.Array) -> pa.Array:
        return _census_part_col(keys, P)

    def cell_partial(batch: pa.Table) -> pa.Table:
        if pred_col not in batch.column_names or not batch.num_rows:
            # typed empty — a string-typed placeholder would mix block
            # schemas with int64 pred/true columns at the digest concat
            return pa.table(
                {
                    "p": pa.array([], pred_t),
                    "t": pa.array([], true_t),
                    "cnt": pa.array([], pa.int64()),
                    "part": pa.array([], pa.int64()),
                }
            )
        preds = _nonull(batch[pred_col], pred_col, "clustering_quality")
        trues = _nonull(batch[true_col], true_col, "clustering_quality")
        gb = (
            pa.table({"p": preds, "t": trues})
            .group_by(["p", "t"])
            .aggregate([([], "count_all")])
        )
        out = pa.table(
            {
                "p": gb["p"],
                "t": gb["t"],
                "cnt": pc.cast(gb["count_all"], pa.int64()),
            }
        )
        return out.append_column("part", _hash_part(out["p"].combine_chunks()))

    def cell_merge(g: pa.Table) -> pa.Table:
        if not g.num_rows:
            return pa.table(
                {"tp": pa.array([], pa.int64()),
                 "pp": pa.array([], pa.int64())}
            )
        gb = g.group_by(["p", "t"]).aggregate([("cnt", "sum")])
        n = np.asarray(gb["cnt_sum"].to_numpy(zero_copy_only=False), np.int64)
        tp = int((n * (n - 1) // 2).sum())
        pm = (
            pa.table({"p": gb["p"], "n": pa.array(n)})
            .group_by(["p"])
            .aggregate([("n", "sum")])
        )
        m = np.asarray(pm["n_sum"].to_numpy(zero_copy_only=False), np.int64)
        pp = int((m * (m - 1) // 2).sum())
        return pa.table(
            {"tp": pa.array([tp], pa.int64()), "pp": pa.array([pp], pa.int64())}
        )

    def true_partial(batch: pa.Table) -> pa.Table:
        if true_col not in batch.column_names or not batch.num_rows:
            return pa.table(
                {
                    "t": pa.array([], true_t),
                    "cnt": pa.array([], pa.int64()),
                    "part": pa.array([], pa.int64()),
                }
            )
        trues = _nonull(batch[true_col], true_col, "clustering_quality")
        gb = (
            pa.table({"t": trues})
            .group_by(["t"])
            .aggregate([([], "count_all")])
        )
        out = pa.table(
            {"t": gb["t"], "cnt": pc.cast(gb["count_all"], pa.int64())}
        )
        return out.append_column("part", _hash_part(out["t"].combine_chunks()))

    def true_merge(g: pa.Table) -> pa.Table:
        if not g.num_rows:
            return pa.table({"tpair": pa.array([], pa.int64())})
        gb = g.group_by(["t"]).aggregate([("cnt", "sum")])
        m = np.asarray(gb["cnt_sum"].to_numpy(zero_copy_only=False), np.int64)
        return pa.table(
            {"tpair": pa.array([int((m * (m - 1) // 2).sum())], pa.int64())}
        )

    def _sum_col(parts_ds, col: str) -> int:
        return int(
            sum(
                int(t[col][i].as_py())
                for t in ray.get(parts_ds.to_arrow_refs())
                if col in t.column_names
                for i in range(t.num_rows)
            )
        )

    cells = _digest_merge(
        labels_ds.map_batches(cell_partial, batch_format="pyarrow"),
        cell_merge,
        driver_merge_max_rows,
        empty_fn=lambda: pa.table(
            {"tp": pa.array([], pa.int64()), "pp": pa.array([], pa.int64())}
        ),
    )
    tp = pred_pairs = 0
    for t in ray.get(cells.to_arrow_refs()):
        if "tp" in t.column_names:
            for i in range(t.num_rows):
                tp += int(t["tp"][i].as_py())
                pred_pairs += int(t["pp"][i].as_py())
    trues = _digest_merge(
        labels_ds.map_batches(true_partial, batch_format="pyarrow"),
        true_merge,
        driver_merge_max_rows,
        empty_fn=lambda: pa.table({"tpair": pa.array([], pa.int64())}),
    )
    true_pairs = _sum_col(trues, "tpair")
    return pd.DataFrame(
        {
            "n_records": [n_records],
            "pred_pairs": [pred_pairs],
            "true_pairs": [true_pairs],
            "tp": [tp],
            "precision_milli": [
                (tp * 1000 // pred_pairs) if pred_pairs else 0
            ],
            "recall_milli": [(tp * 1000 // true_pairs) if true_pairs else 0],
            "f1_milli": [
                (2 * tp * 1000 // (pred_pairs + true_pairs))
                if (pred_pairs + true_pairs)
                else 0
            ],
        }
    )
