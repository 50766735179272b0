"""Deterministic embedding backends + cosine matching support.

The reference's five embedding matchers (Flair polyfuzz/models/_embeddings.py,
SBERT _sbert.py, Gensim _gensim.py, spaCy _spacy.py, USE _use.py) all share
one pattern: embed both lists (model held warm in the matcher), L2-normalize
(_embeddings.py:145), cache the to-side (`embeddings_to`, _sbert.py:112 et
al.), then reuse the shared cosine top-k kernel. The model libraries are not
installed in this environment, so the default backend is a deterministic
hash embedder: per-token vectors from an FNV64-fold + splitmix64 stream
(the same hash family the simhash kernel uses, which is what makes the
embedding match SQL-oracle-able — see queries._sql_fnv/_sql_splitmix64),
mean-pooled (mirroring Gensim's mean pooling with zero OOV vectors,
polyfuzz/models/_gensim.py:118-140), then L2-normalized. Any callable
``texts -> np.ndarray`` plugs in as a custom backend (the reference's
user-extension surface, _embeddings.py:60-79).
"""

from __future__ import annotations

import numpy as np

from raylink.blocking import _hash64

# must stay bit-identical to queries._SQL_FNV_P / multimodal._FNV64_PRIME
_FNV64_PRIME_INT = 1099511628211
_GAMMA = np.uint64(0x9E3779B97F4A7C15)


class HashEmbedder:
    """Deterministic token-hash embedder (seeded, no model weights).

    Token vector component d = splitmix64(fnv64(token) + seed + d*gamma)
    mapped into [-1, 1] (uniform from the top 64 hash bits); document
    vector = mean of token vectors (empty text -> zero vector); rows are
    NOT normalized here — the matcher normalizes, matching the reference
    split of responsibilities. The hash chain is wrapping uint64
    arithmetic over token CODEPOINTS, mirrored verbatim by the DuckDB
    oracle (queries: match_embeddings) in HUGEINT mod-2^64 arithmetic —
    which is why this stand-in is SQL-checkable end to end.
    """

    def __init__(self, dim: int = 64, seed: int = 42):
        self.dim = int(dim)
        self.seed = int(seed)
        self._cache: dict[str, np.ndarray] = {}
        self._dim_salt = np.arange(1, self.dim + 1, dtype=np.uint64) * _GAMMA

    def _token_vec(self, token: str) -> np.ndarray:
        v = self._cache.get(token)
        if v is not None:
            return v
        h = 0
        for ch in token:  # wrapping mod-2^64 FNV fold over codepoints
            h = (h * _FNV64_PRIME_INT + ord(ch)) & 0xFFFFFFFFFFFFFFFF
        base = (h + self.seed) & 0xFFFFFFFFFFFFFFFF
        ints = _hash64(np.uint64(base) + self._dim_salt)
        out = (ints.astype(np.float64) / np.float64(2**64)) * 2.0 - 1.0
        if len(self._cache) < 200_000:
            self._cache[token] = out
        return out

    def __getstate__(self):
        state = dict(self.__dict__)
        state["_cache"] = {}  # never ship the cache to workers
        return state

    def __call__(self, texts) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), dtype=np.float64)
        for i, t in enumerate(texts):
            toks = str(t).lower().split()
            if not toks:
                continue
            acc = np.zeros(self.dim, dtype=np.float64)
            for tok in toks:
                acc += self._token_vec(tok)
            out[i] = acc / len(toks)
        return out


def embeddings_to_matrix(col) -> np.ndarray:
    """Arrow list<float> column/chunked-array -> (n, dim) float64 matrix,
    zero-copy flatten + reshape when rows are equal-length (the embedding
    contract); per-row fallback otherwise. Shared by the ann and dedup
    batch stages (Arrow-native — no pandas object columns in hot paths)."""
    import pyarrow as pa

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    if isinstance(arr, pa.FixedSizeListArray):
        dim = arr.type.list_size
        return (
            arr.flatten()
            .to_numpy(zero_copy_only=False)
            .astype(np.float64, copy=False)
            .reshape(n, dim)
        )
    lens = np.diff(arr.offsets.to_numpy())
    dim = int(lens[0]) if len(lens) else 0
    if len(lens) and (lens == dim).all():
        return (
            arr.flatten()
            .to_numpy(zero_copy_only=False)
            .astype(np.float64, copy=False)
            .reshape(n, dim)
        )
    # ragged or null rows can't form a matrix — np.stack would raise an
    # opaque shape error, so state the contract violation explicitly
    raise ValueError(
        "embedding column must be fixed-dimension non-null lists; got "
        f"row lengths in [{int(lens.min()) if len(lens) else 0}, "
        f"{int(lens.max()) if len(lens) else 0}]"
        + (", with nulls" if arr.null_count else "")
    )


def l2_normalize(mat: np.ndarray) -> np.ndarray:
    """Row-wise L2 normalization; zero rows stay zero (sklearn
    ``preprocessing.normalize`` semantics, polyfuzz/models/_embeddings.py:145)."""
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    return np.divide(mat, norms, out=np.zeros_like(mat), where=norms > 0)


def dense_topk_cosine(
    from_mat: np.ndarray,
    to_mat: np.ndarray,
    top_n: int,
    self_match: bool = False,
    from_global_offset: int = 0,
    batch_rows: int = 4096,
) -> tuple[np.ndarray, np.ndarray]:
    """Dense blocked top-k cosine over raw (unnormalized) embeddings.

    Cosine = dot of L2-normalized rows; self-match zeroes the positional
    diagonal (polyfuzz/models/_utils.py:98). Returns (idx, sims) padded
    with -1/0.0 like the sparse kernel. to_mat is normalized once by the
    caller ideally; normalization here is idempotent-safe.
    """
    fn = l2_normalize(np.asarray(from_mat, dtype=np.float64))
    tn = l2_normalize(np.asarray(to_mat, dtype=np.float64))
    n_from, n_to = fn.shape[0], tn.shape[0]
    k = int(min(top_n, n_to))
    out_idx = np.full((n_from, top_n), -1, dtype=np.int64)
    out_sim = np.zeros((n_from, top_n), dtype=np.float64)
    if k == 0:
        return out_idx, out_sim
    for r in range(0, n_from, batch_rows):
        r_end = min(n_from, r + batch_rows)
        sim = fn[r:r_end] @ tn.T
        if self_match:
            diag = np.arange(r, r_end) + from_global_offset
            valid = diag < n_to
            sim[np.flatnonzero(valid), diag[valid]] = 0.0
        if k < n_to:
            part = np.argpartition(-sim, k - 1, axis=1)[:, :k]
            # tie-exact selection: argpartition picks ARBITRARY members
            # of a tie at the kth value (duplicate texts embed
            # byte-identically, so exact cosine ties are the NORM on
            # dup-bearing corpora) — rows with more than k candidates
            # at >= kth re-resolve with a stable sort so broadcast and
            # sharded runs emit the same lowest-index tie members
            kth = np.take_along_axis(sim, part, axis=1).min(axis=1)
            amb = np.flatnonzero((sim >= kth[:, None]).sum(axis=1) > k)
            if len(amb):
                part[amb] = np.argsort(
                    -sim[amb], axis=1, kind="stable"
                )[:, :k]
        else:
            part = np.broadcast_to(np.arange(n_to), sim.shape).copy()
        vals = np.take_along_axis(sim, part, axis=1)
        order = np.lexsort((part, -vals), axis=1)[:, :k]
        out_idx[r:r_end, :k] = np.take_along_axis(part, order, axis=1)
        out_sim[r:r_end, :k] = np.take_along_axis(vals, order, axis=1)
    return out_idx, out_sim
