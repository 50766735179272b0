"""Deterministic hash-based sampling over Datasets.

The 100-TB sampling idiom: membership is a PURE FUNCTION of the row id
(splitmix64(id + seed) % 10000 vs a basis-point threshold), so sampling
is an embarrassingly parallel ``map_batches`` filter — no shuffle, no
global state, no RNG stream to coordinate across workers — and the same
row set is selected no matter how the input is partitioned, re-run, or
resumed. Rates quantize to basis points (1/10000) so the selection is
integer-exact and the DuckDB oracle replays it bit-for-bit with the
engine's HUGEINT splitmix64 (queries._sql_splitmix64 — the same hash
family as the simhash/embedding kernels; see CLAUDE.md).

Reference scope note: PolyFuzz has no sampling surface; this is part of
the large-scale-pipeline extension set (SURVEY §8).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .blocking import _fnv64_fold_rows, _hash64
from .joins import (
    _check_reserved,
    _is_string_key,
    _nonull,
    _string_part_hash,
    semi_join,
    typed_to_pandas,
)


def _rate_to_bp(rate: float) -> int:
    bp = int(round(float(rate) * 10000))
    if not 0 <= bp <= 10000:
        raise ValueError(f"rate {rate} outside [0, 1]")
    return bp


def sample_bucket(ids: np.ndarray, seed: int) -> np.ndarray:
    """The shared bucket function: splitmix64(id + seed) % 10000, int64.
    Pure, partition-independent, SQL-replayable."""
    x = np.asarray(ids, dtype=np.int64) + np.int64(seed)
    return (_hash64(x) % np.uint64(10000)).astype(np.int64)


def hash_sample(ds, id_col: str, rate: float, seed: int = 0, cols=None):
    """Uniform deterministic sample: keep rows whose bucket falls below
    ``round(rate * 10000)`` basis points. Streams — one filter pass."""
    bp = _rate_to_bp(rate)

    def filt(batch: pa.Table) -> pa.Table:
        ids = np.asarray(
            _nonull(batch[id_col], id_col, "sampling").to_numpy(
                zero_copy_only=False
            ),
            np.int64,
        )
        keep = sample_bucket(ids, seed) < bp
        sel = batch.select(list(cols)) if cols is not None else batch
        return sel.filter(pa.array(keep))

    return ds.map_batches(filt, batch_format="pyarrow")


def stratified_sample(
    ds,
    id_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: int = 0,
    cols=None,
):
    """Per-stratum deterministic sample: each row's threshold comes from
    ``rates[stratum]`` (``default_rate`` for unlisted strata). The
    stratum -> basis-point map is a small fixed table resolved with ONE
    vectorized ``index_in`` per batch — never per-row Python."""
    names = list(rates)
    bp_table = np.array(
        [_rate_to_bp(rates[s]) for s in names] + [_rate_to_bp(default_rate)],
        dtype=np.int64,
    )
    value_set = pa.array(names, pa.string())

    def filt(batch: pa.Table) -> pa.Table:
        ids = np.asarray(
            _nonull(batch[id_col], id_col, "sampling").to_numpy(
                zero_copy_only=False
            ),
            np.int64,
        )
        # missing strata -> the appended default slot (fill_null keeps
        # this a single int array, no NaN round-trip)
        slot = np.asarray(
            pc.fill_null(
                pc.index_in(batch[stratum_col].combine_chunks(), value_set),
                len(names),
            ).to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        keep = sample_bucket(ids, seed) < bp_table[slot]
        sel = batch.select(list(cols)) if cols is not None else batch
        return sel.filter(pa.array(keep))

    return ds.map_batches(filt, batch_format="pyarrow")


def _split_plan(splits, split_col: str):
    """Shared split validation: labels + interior basis-point cuts.
    Rates must sum to 1 (10000 bp exactly) so every row lands in exactly
    one split."""
    names = [n for n, _ in splits]
    bps = [_rate_to_bp(r) for _, r in splits]
    if sum(bps) != 10000:
        raise ValueError(f"split rates must sum to 1.0 exactly, got {bps} bp")
    if split_col in names:
        raise ValueError(f"split_col {split_col!r} collides with a split name")
    cuts = np.cumsum(bps[:-1], dtype=np.int64)  # interior boundaries
    return pa.array(names, pa.string()), cuts


def _guard_split_col(batch: pa.Table, split_col: str):
    # Arrow append_column allows duplicate names silently; a pre-existing
    # column of the same name would make the output ambiguous downstream.
    if split_col in batch.column_names:
        raise ValueError(
            f"sampling: input already has a column named {split_col!r} — "
            "pass a different split_col"
        )


def split_by_hash(
    ds,
    id_col: str,
    splits: tuple[tuple[str, float], ...] = (
        ("train", 0.8),
        ("val", 0.1),
        ("test", 0.1),
    ),
    seed: int = 0,
    split_col: str = "split",
):
    """Disjoint, exhaustive train/val/test assignment: the bucket space
    [0, 10000) is partitioned by cumulative basis-point thresholds and
    each row gets the label of its bucket's slice."""
    labels, cuts = _split_plan(splits, split_col)

    def tag(batch: pa.Table) -> pa.Table:
        _guard_split_col(batch, split_col)
        ids = np.asarray(
            _nonull(batch[id_col], id_col, "sampling").to_numpy(
                zero_copy_only=False
            ),
            np.int64,
        )
        b = sample_bucket(ids, seed)
        slot = np.searchsorted(cuts, b, side="right")
        return batch.append_column(
            split_col, labels.take(pa.array(slot, pa.int64()))
        )

    return ds.map_batches(tag, batch_format="pyarrow")


def split_by_key(
    ds,
    key_col: str,
    splits: tuple[tuple[str, float], ...] = (
        ("train", 0.8),
        ("val", 0.1),
        ("test", 0.1),
    ),
    seed: int = 0,
    split_col: str = "split",
):
    """Leakage-safe GROUP-COHERENT split: the bucket is a pure function
    of the key (domain / source / cluster id), so every row sharing a key
    lands in the same split — near-duplicates within a group can never
    straddle train/test (the split-by-domain rule large corpus pipelines
    use to keep template families out of held-out sets). String keys
    hash through the full-content FNV64 fold + splitmix64 (the repo-wide
    SQL-replayable family; blocking._fnv64_fold_rows — note its
    documented leading-NUL fixed point, irrelevant for domain-like
    keys); int64 keys bucket directly via splitmix64(key + seed), so an
    int-keyed call equals split_by_hash on that column. Weights
    partition the KEY-hash space: realized row proportions track the
    weights only as well as group sizes balance — the price of
    coherence. Null keys reject loudly (sampler policy); streams as one
    map_batches pass, no shuffle."""
    labels, cuts = _split_plan(splits, split_col)

    def tag(batch: pa.Table) -> pa.Table:
        _guard_split_col(batch, split_col)
        a = _nonull(batch[key_col], key_col, "sampling")
        if _is_string_key(a.type):
            raw = _fnv64_fold_rows(a, pa.types.is_large_string(a.type))
            kh = _hash64(raw.astype(np.int64)).astype(np.int64)
        elif pa.types.is_integer(a.type) and not pa.types.is_uint64(
            a.type
        ):
            kh = np.asarray(a.to_numpy(zero_copy_only=False), np.int64)
        else:
            # uint64 would wrap silently through the int64 bucket view
            raise TypeError(
                f"split_by_key: key column {key_col!r} must be string or "
                f"integer (uint64 excluded), got {a.type}"
            )
        b = sample_bucket(kh, seed)
        slot = np.searchsorted(cuts, b, side="right")
        return batch.append_column(
            split_col, labels.take(pa.array(slot, pa.int64()))
        )

    return ds.map_batches(tag, batch_format="pyarrow")


def _cap_key_views(ka):
    """(group-sortable int64 codes, partition hash) for a cap key column:
    string keys factorize per table (grouping is within-table, so local
    dictionary codes suffice) and partition via the shared string hash;
    int64 keys group on their values and partition via splitmix64."""
    ka = ka.combine_chunks() if isinstance(ka, pa.ChunkedArray) else ka
    if ka.null_count:
        raise ValueError(
            "cap_per_key: null key values — cap keys must be non-null "
            "(the loud-rejection policy of the grouped ops)"
        )
    if pa.types.is_string(ka.type) or pa.types.is_large_string(ka.type):
        enc = pc.dictionary_encode(ka)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = np.asarray(
            enc.indices.to_numpy(zero_copy_only=False), np.int64
        )
        return codes, _string_part_hash(ka)
    if not pa.types.is_integer(ka.type):
        raise ValueError(
            f"cap_per_key: key column type {ka.type} — keys must be "
            "string or integer (a float key would be silently truncated)"
        )
    codes = np.asarray(ka.to_numpy(zero_copy_only=False), np.int64)
    return codes, _hash64(codes)


def _cap_topk(codes, h, ids, cap):
    """Row positions of the ``cap`` smallest (h, id) pairs per key code,
    raising on duplicate (key, id) pairs (identical hashes sort adjacent,
    so duplicates inside the table are always detected here). ``cap`` is
    a scalar (cap_per_key/sample_n) or an int64 array indexed by key code
    (sample_mix's per-key quotas)."""
    order = np.lexsort((ids, h, codes))
    kc, ki = codes[order], ids[order]
    if len(kc) > 1:
        dup = (kc[1:] == kc[:-1]) & (ki[1:] == ki[:-1])
        if dup.any():
            raise ValueError(
                f"duplicate id {int(ki[1:][dup][0])} within a key — ids "
                "must be unique (the keep-set semi-join would otherwise "
                "exceed the cap/quota)"
            )
    first = np.ones(len(kc), dtype=bool)
    first[1:] = kc[1:] != kc[:-1]
    run_start = np.flatnonzero(first)
    rank = np.arange(len(kc)) - np.repeat(
        run_start, np.diff(np.append(run_start, len(kc)))
    )
    lim = cap[kc] if isinstance(cap, np.ndarray) else cap
    return order[rank < lim]


def cap_per_key(
    ds,
    key_col: str,
    id_col: str,
    cap: int,
    seed: int = 0,
    cols: tuple[str, ...] = (),
    output: str = "dataset",
    driver_merge_max_rows: int = 2_000_000,
    n_parts: int | None = None,
):
    """Per-key capped deterministic sample — the RefinedWeb/C4-style
    "at most ``cap`` documents per domain" primitive: within each key,
    keep the ``cap`` rows with the smallest ``splitmix64(id + seed)``
    (ties -> smaller id). Membership is a pure function of (key's row
    set, id, seed): partition-independent, resume-invariant, and
    SQL-replayable (``row_number() OVER (PARTITION BY key ORDER BY
    splitmix64(id + seed), id) <= cap``).

    Scale shape: per-block partials keep <= cap rows per (block, key),
    so the shuffle carries digests, not the corpus; the keep-set merge
    rides the shared digest dispatch (driver concat below the bound,
    value-hash keyed groupby above — every key's candidates collocate);
    survivors stream out through one id semi-join. Duplicate (key, id)
    pairs raise loudly at the block AND merge stages. Output columns:
    ``(id_col, *cols)``."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    # the partial digest stages through 'h'/'part' (the joins-family
    # reserved-name policy: a user column with those names would be
    # silently overwritten by staging metadata)
    _check_reserved(
        "cap_per_key", (key_col, id_col, *cols), frozenset({"h", "part"})
    )
    from .aggs import _digest_merge

    P = int(n_parts) if n_parts is not None else 65_536
    capi = int(cap)

    def partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(
            _nonull(batch[id_col], id_col, "cap_per_key").to_numpy(
                zero_copy_only=False
            ),
            np.int64,
        )
        ka = batch[key_col].combine_chunks()
        codes, ph = _cap_key_views(ka)
        h = _hash64(ids + np.int64(seed))
        pos = _cap_topk(codes, h, ids, capi)
        take = pa.array(pos, pa.int64())
        return pa.table(
            {
                key_col: ka.take(take),
                id_col: pa.array(ids[pos]),
                "h": pa.array(h[pos].astype(np.uint64)),
                "part": pa.array((ph[pos] % np.uint64(P)).astype(np.int64)),
            }
        )

    def merge(g: pa.Table) -> pa.Table:
        ids = np.asarray(g[id_col].to_numpy(zero_copy_only=False), np.int64)
        codes, _ph = _cap_key_views(g[key_col])
        h = np.asarray(
            g["h"].to_numpy(zero_copy_only=False), np.uint64
        )
        pos = _cap_topk(codes, h, ids, capi)
        return pa.table({id_col: pa.array(ids[pos])})

    keeps = _digest_merge(
        ds.select_columns([key_col, id_col]).map_batches(
            partial, batch_format="pyarrow"
        ),
        merge,
        driver_merge_max_rows,
        n_parts=n_parts,
    )
    survivors = semi_join(
        ds.select_columns(list(dict.fromkeys((id_col,) + tuple(cols)))),
        keeps,
        left_key_col=id_col,
        right_key_col=id_col,
        left_cols=tuple(c for c in cols if c != id_col),
    )
    if output == "pandas":
        return (
            typed_to_pandas(survivors).sort_values(id_col).reset_index(drop=True)
        )
    return survivors


# rolling-merge chunk bound for sample_n (the ann._merge_partials_topk
# pattern): candidates fold into the running top-n at most this many rows
# at a time, so driver state stays O(n + chunk) regardless of block count
_SAMPLE_MERGE_CHUNK_ROWS = 4_000_000


def sample_n(
    ds,
    id_col: str,
    n: int,
    seed: int = 0,
    cols: tuple[str, ...] = (),
    output: str = "dataset",
):
    """Deterministic EXACTLY-n global sample: the n rows with the
    smallest ``splitmix64(id + seed)`` (ties -> smaller id) — the
    "give me exactly 100k docs, reproducibly" primitive. Unlike
    :func:`hash_sample` (a rate, so the count is binomial), the output
    size is exact; like the rest of the family it is a pure function of
    (row set, seed): partition/resume-invariant and SQL-replayable
    (``ORDER BY splitmix64(id + seed), id LIMIT n``).

    Scale shape: the constant-key case of :func:`cap_per_key`, except
    the single logical key makes a keyed shuffle pointless (everything
    would land in ONE merge partition — n × n_blocks rows in one task).
    Instead: per-block partials keep <= n rows, then a ROLLING bounded
    driver merge (the ann._merge_partials_topk pattern) folds partial
    refs chunk by chunk with O(n + chunk) running state — never one
    concat of all partials. Survivors stream through one id semi-join.
    Fewer than n input rows keeps everything. Output columns:
    ``(id_col, *cols)``."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    _check_reserved("sample_n", (id_col, *cols), frozenset({"h"}))
    import ray
    import ray.data as rd

    ni = int(n)

    def partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(
            _nonull(batch[id_col], id_col, "sample_n").to_numpy(
                zero_copy_only=False
            ),
            np.int64,
        )
        h = _hash64(ids + np.int64(seed))
        pos = _cap_topk(np.zeros(len(ids), np.int64), h, ids, ni)
        return pa.table(
            {
                id_col: pa.array(ids[pos]),
                "h": pa.array(h[pos].astype(np.uint64)),
            }
        )

    parts = (
        ds.select_columns([id_col])
        .map_batches(partial, batch_format="pyarrow")
        .materialize()
    )
    run_ids = np.empty(0, np.int64)
    run_h = np.empty(0, np.uint64)
    buf_ids, buf_h, buf_rows = [], [], 0

    def _fold():
        nonlocal run_ids, run_h, buf_ids, buf_h, buf_rows
        cand_ids = np.concatenate([run_ids] + buf_ids)
        cand_h = np.concatenate([run_h] + buf_h)
        pos = _cap_topk(np.zeros(len(cand_ids), np.int64), cand_h, cand_ids, ni)
        run_ids, run_h = cand_ids[pos], cand_h[pos]
        buf_ids, buf_h, buf_rows = [], [], 0

    for ref in parts.to_arrow_refs():
        t = ray.get(ref)
        if not t.num_rows:
            continue
        buf_ids.append(
            np.asarray(t[id_col].to_numpy(zero_copy_only=False), np.int64)
        )
        buf_h.append(
            np.asarray(t["h"].to_numpy(zero_copy_only=False), np.uint64)
        )
        buf_rows += t.num_rows
        if buf_rows >= _SAMPLE_MERGE_CHUNK_ROWS:
            _fold()
    if buf_rows:
        _fold()
    keeps = rd.from_arrow(pa.table({id_col: pa.array(run_ids)}))
    survivors = semi_join(
        ds.select_columns(list(dict.fromkeys((id_col,) + tuple(cols)))),
        keeps,
        left_key_col=id_col,
        right_key_col=id_col,
        left_cols=tuple(c for c in cols if c != id_col),
    )
    if output == "pandas":
        return (
            typed_to_pandas(survivors).sort_values(id_col).reset_index(drop=True)
        )
    return survivors


def _mix_slots(ka, value_set: pa.Array, op: str) -> np.ndarray:
    """Weights-dict slot per row (-1 = key not in the mix), with the
    family's loud guards: null keys raise; the key column's type CLASS
    must match the weight keys' (index_in silently cross-matches int64
    columns against string weight keys by decimal rendering — verified —
    and _mix_quotas sorted string keys LEXICALLY, so the remainder
    tie-break order would silently differ from genuine int keys); float
    keys raise (silent truncation). Shared by sample_mix and
    packing.token_mix."""
    ka = ka.combine_chunks() if isinstance(ka, pa.ChunkedArray) else ka
    if ka.null_count:
        raise ValueError(
            f"{op}: null key values — keys must be non-null "
            "(the loud-rejection policy of the grouped ops)"
        )
    col_is_str = pa.types.is_string(ka.type) or pa.types.is_large_string(
        ka.type
    )
    if col_is_str != pa.types.is_string(value_set.type):
        raise ValueError(
            f"{op}: key column type {ka.type} does not match the weight "
            f"key type ({value_set.type}) — weights and the key column "
            "must both be string or both be int"
        )
    if pa.types.is_large_string(ka.type):
        ka = pc.cast(ka, pa.string())
    elif not col_is_str:
        if not pa.types.is_integer(ka.type):
            raise ValueError(
                f"{op}: key column type {ka.type} — keys must be string "
                "or integer (a float key would be silently truncated)"
            )
        if not pa.types.is_int64(ka.type):
            ka = pc.cast(ka, pa.int64())
    return np.asarray(
        pc.fill_null(pc.index_in(ka, value_set), -1).to_numpy(
            zero_copy_only=False
        ),
        np.int64,
    )


def _mix_value_set(names: list) -> pa.Array:
    """The weight-key lookup array for _mix_slots (sorted _mix_quotas
    names -> typed Arrow value set)."""
    return (
        pa.array(names, pa.string())
        if isinstance(names[0], str)
        else pa.array([int(k) for k in names], pa.int64())
    )


def _mix_quotas(n: int, weights: dict) -> tuple[list, np.ndarray]:
    """Largest-remainder integer quotas: quota_k = n*w_k // W, plus +1
    for the R = n - Σ floors keys of largest remainder (n*w_k) % W (ties
    -> key ascending). Pure integer arithmetic — bit-replayable in SQL
    (integer division + a remainder-rank window). Returns (sorted keys,
    aligned quota vector); Σ quotas == n always."""
    keys = list(weights)
    if not keys:
        raise ValueError("mix weights must be non-empty")
    # homogeneous key type BEFORE sorting (mixed str/int keys would make
    # sorted() raise an opaque TypeError)
    if not (
        all(isinstance(k, str) for k in keys)
        or all(
            isinstance(k, (int, np.integer)) and not isinstance(k, bool)
            for k in keys
        )
    ):
        raise ValueError(
            "mix weight keys must be all-string or all-int "
            f"(got {sorted({type(k).__name__ for k in keys})})"
        )
    names = sorted(keys)
    w = [weights[k] for k in names]
    if any(not isinstance(x, (int, np.integer)) or x <= 0 for x in w):
        raise ValueError(
            "mix weights must be positive INTEGERS (integer "
            "parts keep the quota arithmetic exact and SQL-replayable; "
            f"got {weights!r})"
        )
    W = int(sum(w))
    fl = [n * int(x) // W for x in w]
    rem = [n * int(x) % W for x in w]
    R = n - sum(fl)
    order = sorted(range(len(names)), key=lambda i: (-rem[i], names[i]))
    q = np.array(fl, np.int64)
    for i in order[:R]:
        q[i] += 1
    return names, q


def sample_mix(
    ds,
    key_col: str,
    id_col: str,
    n: int,
    weights: dict,
    seed: int = 0,
    cols: tuple[str, ...] = (),
    output: str = "dataset",
    driver_merge_max_rows: int = 2_000_000,
    n_parts: int | None = None,
):
    """Deterministic PROPORTIONAL mix sample — the training-mix
    allocator ("exactly n docs: 50 parts web, 30 code, 20 books"):
    integer largest-remainder quotas per key from integer ``weights``
    (see :func:`_mix_quotas`; Σ quotas == n), then each key keeps its
    quota_k rows with the smallest ``splitmix64(id + seed)`` (ties ->
    smaller id). Rows whose key is NOT in ``weights`` are excluded by
    design (the weights define the mix); null keys raise (the family's
    loud-rejection policy). A key with fewer rows than its quota keeps
    everything it has — the output is then short of ``n``, with NO
    redistribution, so membership stays a pure function of (key row
    set, weights, n, seed): partition/resume-invariant and
    SQL-replayable (quota CTE + ``row_number() OVER (PARTITION BY key
    ORDER BY splitmix64(id + seed), id) <= quota``).

    Scale shape: the per-key generalization of :func:`cap_per_key` —
    per-block partials keep <= quota_k rows per (block, key) (a local
    top-quota is a superset of the global one), so the shuffle carries
    digests bounded by n per block; the keep-set merge rides the shared
    digest dispatch partitioned by key hash (every key's candidates
    collocate); survivors stream out through one id semi-join. The
    key -> quota map is config-sized and closure-captured (the
    cap_tokens_per_key exception to the ray.put rule). Output columns:
    ``(id_col, *cols)``."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    _check_reserved(
        "sample_mix", (key_col, id_col, *cols), frozenset({"s", "h", "part"})
    )
    from .aggs import _digest_merge

    from .joins import _stage_parts

    names, quota = _mix_quotas(int(n), weights)
    value_set = _mix_value_set(names)
    # the shared staging-modulus guard (cap_tokens_per_key landmark):
    # n_parts=0 would make `% P` silently collapse the merge shuffle
    P = _stage_parts(n_parts)

    def partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(
            _nonull(batch[id_col], id_col, "sample_mix").to_numpy(
                zero_copy_only=False
            ),
            np.int64,
        )
        slot = _mix_slots(batch[key_col], value_set, "sample_mix")
        keep = slot >= 0
        ids, slot = ids[keep], slot[keep]
        h = _hash64(ids + np.int64(seed))
        pos = _cap_topk(slot, h, ids, quota)
        return pa.table(
            {
                "s": pa.array(slot[pos]),
                id_col: pa.array(ids[pos]),
                "h": pa.array(h[pos].astype(np.uint64)),
                "part": pa.array(
                    (_hash64(slot[pos]) % np.uint64(P)).astype(np.int64)
                ),
            }
        )

    def merge(g: pa.Table) -> pa.Table:
        ids = np.asarray(g[id_col].to_numpy(zero_copy_only=False), np.int64)
        slot = np.asarray(g["s"].to_numpy(zero_copy_only=False), np.int64)
        h = np.asarray(g["h"].to_numpy(zero_copy_only=False), np.uint64)
        pos = _cap_topk(slot, h, ids, quota)
        return pa.table({id_col: pa.array(ids[pos])})

    def _empty_keeps() -> pa.Table:
        return pa.table({id_col: pa.array([], pa.int64())})

    keeps = _digest_merge(
        ds.select_columns([key_col, id_col]).map_batches(
            partial, batch_format="pyarrow"
        ),
        merge,
        driver_merge_max_rows,
        n_parts=n_parts,
        empty_fn=_empty_keeps,
    )
    survivors = semi_join(
        ds.select_columns(list(dict.fromkeys((id_col,) + tuple(cols)))),
        keeps,
        left_key_col=id_col,
        right_key_col=id_col,
        left_cols=tuple(c for c in cols if c != id_col),
    )
    if output == "pandas":
        return (
            typed_to_pandas(survivors).sort_values(id_col).reset_index(drop=True)
        )
    return survivors


def epoch_order(ds, id_col: str, epoch: int = 0, cols=None):
    """Deterministic EPOCH SHUFFLE key — the data-loader ordering
    primitive: shuffle_key = splitmix64(id + epoch) mod 2^63, a pure
    function of (id, epoch), so every worker/replica derives the same
    permutation with NO shuffle (consumers sort or range-partition by
    (shuffle_key, id); a new epoch value yields an independent order).
    Streaming map; replay/resume-invariant like the sampling family."""
    _check_reserved(
        "epoch_order",
        (id_col, *(cols or ())),
        frozenset({"shuffle_key"}),
    )

    def tag(batch: pa.Table) -> pa.Table:
        ids = np.asarray(
            _nonull(batch[id_col], id_col, "sampling").to_numpy(
                zero_copy_only=False
            ),
            np.int64,
        )
        key = (
            _hash64((ids + np.int64(epoch)).astype(np.int64))
            % np.uint64(1 << 63)
        ).astype(np.int64)
        keep = list(cols) if cols else [id_col]
        out = {c: batch[c] for c in keep}
        out["shuffle_key"] = pa.array(key)
        return pa.table(out)

    return ds.map_batches(tag, batch_format="pyarrow")


def weighted_hash_sample(
    ds,
    id_col: str,
    weight_col: str,
    bp_per_unit: int,
    seed: int = 0,
    cols=None,
):
    """Per-ROW weight-proportional deterministic sample (importance
    sampling for training mixes: "keep long / high-quality docs more
    often"): row i survives iff splitmix64(id + seed) % 10000 <
    min(10000, weight_i * bp_per_unit) — each row's keep probability is
    min(1, weight*bp/10000), membership a pure integer function of
    (id, weight, seed), so it is partition-independent, reproducible,
    and SQL-replayable exactly (the family bucket function). Weights
    must be non-negative int64 (weight 0 never keeps; quantize float
    scores upstream — the integer thresholds are what make exactness
    possible). Streams — one filter pass, no shuffle. Expected sample
    size Σ min(1, w_i·bp/10000); for an EXACT total under per-key
    quotas use sample_mix / cap_per_key instead."""
    bpu = int(bp_per_unit)
    if bpu < 1:
        raise ValueError(
            f"weighted_hash_sample: bp_per_unit must be >= 1, got {bpu}"
        )

    def filt(batch: pa.Table) -> pa.Table:
        if id_col not in batch.column_names:  # placeholder empty block
            return batch
        ids = np.asarray(
            _nonull(batch[id_col], id_col, "weighted_hash_sample").to_numpy(
                zero_copy_only=False
            ),
            np.int64,
        )
        wa = _nonull(batch[weight_col], weight_col, "weighted_hash_sample")
        if not pa.types.is_integer(wa.type) or wa.type == pa.uint64():
            raise ValueError(
                f"weighted_hash_sample: weight column {weight_col!r} must "
                f"be signed int64 (got {wa.type}) — float weights would "
                "truncate silently; quantize upstream"
            )
        w = np.asarray(wa.to_numpy(zero_copy_only=False), np.int64)
        if len(w) and int(w.min()) < 0:
            raise ValueError(
                "weighted_hash_sample: negative weights — a negative "
                "threshold silently drops the row; clamp upstream"
            )
        # clamp BEFORE the multiply: w * bpu can overflow int64 for huge
        # weights (wrapping negative would silently drop the row)
        cap_w = np.int64(10000 // bpu + 1)
        thr = np.where(w >= cap_w, np.int64(10000), w * np.int64(bpu))
        keep = sample_bucket(ids, seed) < thr
        sel = batch.select(list(cols)) if cols is not None else batch
        return sel.filter(pa.array(keep))

    return ds.map_batches(filt, batch_format="pyarrow")
