"""Approximate-nearest-neighbor search over an embedding column.

Two paths, both streaming over the data side with the query side broadcast:

  * brute-force top-k (baseline): per batch, one numpy matmul against the
    broadcast query matrix, emit per-batch partial top-k rows, then a tiny
    global merge per query (partials are bounded: n_batches x n_queries x k);
  * IVF (scale path): seeded mini k-means centroids fitted on a sample,
    batches probe only the closest ``n_probe`` centroid lists — recall/cost
    trade documented, exactness NOT claimed.

Cosine similarity = dot of L2-normalized vectors throughout.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from raylink.embed import l2_normalize


def _stack_embeddings(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def brute_force_topk(
    ds,
    queries: np.ndarray,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 10,
    batch_size: int = 4096,
    exclude_ids: np.ndarray | None = None,
) -> pd.DataFrame:
    """Exact top-k cosine for each query row. Returns
    (query_id, rank, vec_id, cosine) sorted by (query_id, rank); ties on
    cosine resolve to the smaller vec_id (deterministic)."""
    import ray

    qn = l2_normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(qn)
    excl = set() if exclude_ids is None else set(np.asarray(exclude_ids).tolist())

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        q = ray.get(q_ref)
        ids = batch[id_col].to_numpy()
        mat = l2_normalize(_stack_embeddings(batch[emb_col].to_numpy()))
        sim = q @ mat.T  # (n_q, n_batch)
        kk = min(k, sim.shape[1])
        part = np.argpartition(-sim, kk - 1, axis=1)[:, :kk]
        rows = []
        for qi in range(sim.shape[0]):
            cand = part[qi]
            rows.append(
                pd.DataFrame(
                    {
                        "query_id": qi,
                        "vec_id": ids[cand],
                        "cosine": sim[qi, cand],
                    }
                )
            )
        return pd.concat(rows, ignore_index=True)

    partials = ds.map_batches(
        partial, batch_format="pandas", batch_size=batch_size
    ).to_pandas()
    if exclude_ids is not None:
        partials = partials[~partials["vec_id"].isin(excl)]
    partials = partials.sort_values(
        ["query_id", "cosine", "vec_id"], ascending=[True, False, True]
    )
    topk = partials.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    topk["rank"] = topk.groupby("query_id").cumcount() + 1
    return topk[["query_id", "rank", "vec_id", "cosine"]]


def self_top1(
    ds,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    batch_size: int = 2048,
    round_to: int | None = 4,
) -> pd.DataFrame:
    """For every vector: its most similar OTHER vector (brute force, data
    side streamed, full normalized matrix broadcast once). Ties resolve to
    the smaller vec_id. Returns (vec_id, best_match_id, best_sim).

    ``round_to`` rounds the reported cosine so the result is stable across
    summation orders (the SQL-oracle comparison path)."""
    import ray

    full = ds.select_columns([id_col, emb_col]).to_pandas().sort_values(id_col)
    all_ids = full[id_col].to_numpy()
    all_mat = l2_normalize(_stack_embeddings(full[emb_col].to_numpy()))
    ref = ray.put((all_ids, all_mat))

    def best(batch: pd.DataFrame) -> pd.DataFrame:
        ids_b = batch[id_col].to_numpy()
        aids, amat = ray.get(ref)
        bmat = l2_normalize(_stack_embeddings(batch[emb_col].to_numpy()))
        sim = bmat @ amat.T
        self_pos = np.searchsorted(aids, ids_b)
        hit = (self_pos < len(aids)) & (aids[np.minimum(self_pos, len(aids) - 1)] == ids_b)
        sim[np.flatnonzero(hit), self_pos[hit]] = -np.inf
        # aids ascending -> np.argmax's first-max rule = smallest vec_id tie-break
        j = np.argmax(sim, axis=1)
        return pd.DataFrame(
            {
                "vec_id": ids_b,
                "best_match_id": aids[j],
                "best_sim": sim[np.arange(len(ids_b)), j],
            }
        )

    out = ds.map_batches(best, batch_format="pandas", batch_size=batch_size).to_pandas()
    if round_to is not None:
        out["best_sim"] = out["best_sim"].round(round_to)
    return out.sort_values("vec_id", ignore_index=True)


class IVFIndex:
    """Seeded mini k-means over a driver-side sample; assignment +
    restricted probing happen vectorized per batch."""

    def __init__(self, centroids: np.ndarray):
        self.centroids = l2_normalize(centroids)

    @classmethod
    def fit(cls, sample: np.ndarray, n_clusters: int, n_iter: int = 10, seed: int = 0):
        rng = np.random.default_rng(seed)
        sample = l2_normalize(np.asarray(sample, dtype=np.float64))
        n = len(sample)
        idx = rng.choice(n, size=min(n_clusters, n), replace=False)
        cents = sample[idx].copy()
        for _ in range(n_iter):
            assign = np.argmax(sample @ cents.T, axis=1)
            for c in range(len(cents)):
                members = sample[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
            cents = l2_normalize(cents)
        return cls(cents)


def ivf_topk(
    ds,
    queries: np.ndarray,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    sample_size: int = 4096,
    batch_size: int = 4096,
    seed: int = 0,
) -> pd.DataFrame:
    """IVF-style ANN: batches only score queries whose probed centroid set
    intersects the batch rows' assigned centroids. Same output schema as
    :func:`brute_force_topk`; recall < 1 by design (scale path)."""
    import ray

    sample = ds.limit(sample_size).to_pandas()
    index = IVFIndex.fit(
        _stack_embeddings(sample[emb_col].to_numpy()), n_clusters, seed=seed
    )
    qn = l2_normalize(np.asarray(queries, dtype=np.float64))
    q_probes = np.argsort(-(qn @ index.centroids.T), axis=1)[:, :n_probe]
    ref = ray.put((qn, q_probes, index.centroids))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        q, probes, cents = ray.get(ref)
        ids = batch[id_col].to_numpy()
        mat = l2_normalize(_stack_embeddings(batch[emb_col].to_numpy()))
        assign = np.argmax(mat @ cents.T, axis=1)
        frames = []
        for qi in range(len(q)):
            mask = np.isin(assign, probes[qi])
            if not mask.any():
                continue
            sim = mat[mask] @ q[qi]
            sub_ids = ids[mask]
            kk = min(k, len(sim))
            part = np.argpartition(-sim, kk - 1)[:kk]
            frames.append(
                pd.DataFrame(
                    {"query_id": qi, "vec_id": sub_ids[part], "cosine": sim[part]}
                )
            )
        if not frames:
            return pd.DataFrame({"query_id": [], "vec_id": [], "cosine": []})
        return pd.concat(frames, ignore_index=True)

    partials = ds.map_batches(
        partial, batch_format="pandas", batch_size=batch_size
    ).to_pandas()
    partials = partials.sort_values(
        ["query_id", "cosine", "vec_id"], ascending=[True, False, True]
    )
    topk = partials.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    topk["rank"] = topk.groupby("query_id").cumcount() + 1
    return topk[["query_id", "rank", "vec_id", "cosine"]]
