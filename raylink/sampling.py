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

from .blocking import _hash64
from .joins import _nonull


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
    each row gets the label of its bucket's slice. Rates must sum to 1
    (10000 bp exactly) so every row lands in exactly one split."""
    names = [n for n, _ in splits]
    bps = [_rate_to_bp(r) for _, r in splits]
    if sum(bps) != 10000:
        raise ValueError(f"split rates must sum to 1.0 exactly, got {bps} bp")
    cuts = np.cumsum(bps[:-1], dtype=np.int64)  # interior boundaries
    labels = pa.array(names, pa.string())

    def tag(batch: pa.Table) -> pa.Table:
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


def epoch_order(ds, id_col: str, epoch: int = 0, cols=None):
    """Deterministic EPOCH SHUFFLE key — the data-loader ordering
    primitive: shuffle_key = splitmix64(id + epoch) mod 2^63, a pure
    function of (id, epoch), so every worker/replica derives the same
    permutation with NO shuffle (consumers sort or range-partition by
    (shuffle_key, id); a new epoch value yields an independent order).
    Streaming map; replay/resume-invariant like the sampling family."""

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
