"""Matcher classes mirroring the reference model zoo over our kernels.

These are the single-node building blocks: each exposes the reference's
``match(from_list, to_list=None, ...) -> DataFrame[From, To, Similarity]``
contract (polyfuzz/models/_base.py:6-31) and doubles as (a) the oracle used
in tests and (b) the scoring engine held inside Ray actor pools (the actor
wraps a matcher per block; state such as fitted vocab / to-side index /
embedder lives on the matcher exactly like the reference caches
``vectorizer`` / ``tf_idf_to`` / ``embeddings_to``).

Match-frame post-processing parity (polyfuzz/models/_utils.py:104-123):
  * columns ``From, To, Similarity[, To_2, Similarity_2, ...]``;
  * similarities rounded to 3 decimals in the cosine paths;
  * any similarity < 0.001 -> 0.0 and the paired To column -> None;
  * padded rows (fewer than top_n hits) resolve to To=None / 0.0.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import numpy as np
import pandas as pd

from raylink import editdist
from raylink.embed import HashEmbedder, dense_topk_cosine, l2_normalize
from raylink.tfidf import CSR, TfidfVocab, TopkIndex, fit_tfidf, topk_cosine


def match_columns(top_n: int) -> list[str]:
    """Interleaved column order of the reference frame
    (polyfuzz/models/_utils.py:108-116)."""
    cols = ["From", "To", "Similarity"]
    for i in range(top_n - 1):
        cols += [f"To_{i + 2}", f"Similarity_{i + 2}"]
    return cols


def build_matches_frame(
    from_texts,
    to_texts,
    idx: np.ndarray,
    sims: np.ndarray,
    top_n: int,
) -> pd.DataFrame:
    """(top-k indices, sims) -> reference-shaped matches frame.

    Applies round(., 3) (polyfuzz/models/_utils.py:70,102,143) and the
    <0.001 null rule (polyfuzz/models/_utils.py:118-123). ``idx`` may
    contain -1 padding.
    """
    to_texts = np.asarray(to_texts, dtype=object)
    n = len(from_texts)
    data: dict[str, np.ndarray] = {"From": np.asarray(from_texts, dtype=object)}
    sims = np.round(np.asarray(sims, dtype=np.float64), 3)
    for i in range(top_n):
        to_col = "To" if i == 0 else f"To_{i + 1}"
        sim_col = "Similarity" if i == 0 else f"Similarity_{i + 1}"
        if i < idx.shape[1]:
            col_idx = idx[:, i]
            col_sim = sims[:, i]
        else:
            col_idx = np.full(n, -1, dtype=np.int64)
            col_sim = np.zeros(n, dtype=np.float64)
        null = (col_sim < 0.001) | (col_idx < 0)
        tos = np.empty(n, dtype=object)
        safe = np.where(col_idx < 0, 0, col_idx)
        if len(to_texts):
            tos[:] = to_texts[safe]
        tos[null] = None
        data[to_col] = tos
        data[sim_col] = np.where(null, 0.0, col_sim)
    return pd.DataFrame(data, columns=match_columns(top_n))


class BaseMatcher(ABC):
    """User-extension surface: subclass and implement ``match``
    (mirrors polyfuzz/models/_base.py:6-31)."""

    def __init__(self, model_id: str | None = None):
        self.model_id = model_id
        self.type = "Base Model"

    @abstractmethod
    def match(
        self, from_list, to_list=None, **kwargs
    ) -> pd.DataFrame:  # pragma: no cover
        raise NotImplementedError()


def _effective_top_n(top_n: int, to_list) -> int:
    """top_n clamp by distinct to-strings — only when a to_list is given
    (polyfuzz/models/_utils.py:54-56)."""
    if to_list is not None:
        return min(top_n, len(set(to_list)))
    return top_n


class TFIDFMatcher(BaseMatcher):
    """Char-ngram TF-IDF cosine matcher (polyfuzz/models/_tfidf.py).

    Two-list fit is JOINT on ``to_list + from_list`` (_tfidf.py:109);
    ``re_train=False`` reuses the fitted vocab and cached to-side index
    (_tfidf.py:107-116) — production transform. ``cosine_method="sparse"``
    applies the min-similarity lower bound inside the kernel
    (polyfuzz/models/_utils.py:79); ``"sklearn"`` does not (:94-102).
    """

    def __init__(
        self,
        n_gram_range: tuple[int, int] = (3, 3),
        clean_string: bool = True,
        min_similarity: float = 0.75,
        top_n: int = 1,
        cosine_method: str = "sparse",
        model_id: str | None = None,
        remove_space_ngrams: bool = True,
    ):
        super().__init__(model_id)
        self.type = "TF-IDF"
        self.n_gram_range = tuple(n_gram_range)
        self.clean_string = clean_string
        self.min_similarity = min_similarity
        self.top_n = top_n
        self.cosine_method = cosine_method
        self.remove_space_ngrams = remove_space_ngrams
        self.vocab: TfidfVocab | None = None
        self.to_index: TopkIndex | None = None

    # split into fit/transform pieces so the Ray pipeline can run the fit as
    # a distributed DF-count aggregation and only broadcast the result
    def fit_vocab(self, docs) -> TfidfVocab:
        self.vocab = fit_tfidf(
            docs, self.n_gram_range, self.clean_string, self.remove_space_ngrams
        )
        return self.vocab

    def build_to_index(self, to_texts) -> TopkIndex:
        csr = self.vocab.transform(to_texts)
        self.to_index = TopkIndex(csr, np.asarray(list(to_texts), dtype=object))
        return self.to_index

    def score(
        self, from_texts, top_n: int, self_match: bool, from_global_offset: int = 0
    ) -> tuple[np.ndarray, np.ndarray]:
        fr: CSR = self.vocab.transform(from_texts)
        if self.cosine_method == "knn":
            # J1c knn path (polyfuzz/models/_utils.py:59-70): self-match
            # takes n_neighbors=top_n+1 and DROPS COLUMN 0, assuming the
            # first hit is self — which DIFFERS from the diagonal-zero
            # semantics when duplicate strings exist (documented
            # divergence in the reference itself); no min_similarity bound.
            k = top_n + 1 if self_match else top_n
            idx, sims = topk_cosine(
                fr, self.to_index, k, apply_min_similarity=False
            )
            if self_match:
                idx, sims = idx[:, 1:], sims[:, 1:]
            return idx, sims
        return topk_cosine(
            fr,
            self.to_index,
            top_n,
            min_similarity=self.min_similarity,
            self_match=self_match,
            from_global_offset=from_global_offset,
            apply_min_similarity=self.cosine_method == "sparse",
        )

    def match(self, from_list, to_list=None, re_train: bool = True) -> pd.DataFrame:
        from_list = list(from_list)
        # materialize ONCE: an iterator/generator to_list would otherwise
        # be exhausted by the corpus build and yield an empty to-index
        to_list = list(to_list) if to_list is not None else None
        self_match = to_list is None
        if re_train or self.vocab is None:
            corpus = from_list if self_match else to_list + from_list
            self.fit_vocab(corpus)
            self.build_to_index(from_list if self_match else to_list)
        top_n = _effective_top_n(self.top_n, to_list)
        idx, sims = self.score(from_list, top_n, self_match)
        # To labels come from the PASSED to_list (or from_list when
        # self-matching), as in polyfuzz/models/_utils.py:104-106.
        to_texts = from_list if self_match else to_list
        return build_matches_frame(from_list, to_texts, idx, sims, top_n)


class EmbeddingMatcher(BaseMatcher):
    """Embedding cosine matcher (pattern shared by the reference's five
    embedding models, e.g. polyfuzz/models/_embeddings.py:86-145). The
    embedding backend is any callable ``texts -> ndarray``; the default is
    the deterministic :class:`HashEmbedder` since no model libraries are
    installed. The to-side embedding matrix is cached for re_train=False
    (the ``embeddings_to`` pattern, _sbert.py:112 et al.)."""

    def __init__(
        self,
        embedder=None,
        min_similarity: float = 0.75,
        top_n: int = 1,
        cosine_method: str = "sparse",
        model_id: str | None = None,
    ):
        super().__init__(model_id)
        self.type = "Embeddings"
        self.embedder = embedder if embedder is not None else HashEmbedder()
        self.min_similarity = min_similarity
        self.top_n = top_n
        self.cosine_method = cosine_method
        self.embeddings_to: np.ndarray | None = None
        self.to_texts: np.ndarray | None = None

    def embed(self, texts) -> np.ndarray:
        return l2_normalize(np.asarray(self.embedder(list(texts)), dtype=np.float64))

    def match(
        self,
        from_list,
        to_list=None,
        embeddings_from=None,
        embeddings_to=None,
        re_train: bool = True,
    ) -> pd.DataFrame:
        from_list = list(from_list)
        self_match = to_list is None
        if embeddings_from is None:
            embeddings_from = self.embed(from_list)
        if embeddings_to is None:
            if not re_train and self.embeddings_to is not None:
                embeddings_to = self.embeddings_to
            else:
                embeddings_to = (
                    embeddings_from if self_match else self.embed(list(to_list))
                )
        self.embeddings_to = embeddings_to
        top_n = _effective_top_n(self.top_n, to_list)
        if self.cosine_method == "knn":
            k = top_n + 1 if self_match else top_n
            idx, sims = dense_topk_cosine(embeddings_from, embeddings_to, k)
            if self_match:
                idx, sims = idx[:, 1:], sims[:, 1:]
        else:
            idx, sims = dense_topk_cosine(
                embeddings_from, embeddings_to, top_n, self_match=self_match
            )
            if self.cosine_method == "sparse" and self.min_similarity > 0:
                drop = sims <= self.min_similarity
                sims = np.where(drop, 0.0, sims)
                idx = np.where(drop, -1, idx)
        to_texts = from_list if self_match else list(to_list)
        return build_matches_frame(from_list, to_texts, idx, sims, top_n)


class RapidFuzzMatcher(BaseMatcher):
    """Best-match edit distance via ``extract_one`` (polyfuzz/models/
    _rapidfuzz.py:61-113): score_cutoff scaled x100 in, /100 out, miss ->
    (From, None, 0.0). Self-match removes only the from-string itself from
    a copied to-list — the reference's ``n_jobs>1`` behavior; its
    ``n_jobs=1`` path mutates a SHARED list so each iteration sees a
    shrinking to-list (_rapidfuzz.py:103-104), an order-dependent bug we
    deliberately do not reproduce (documented divergence, SURVEY §2.4 J2).
    """

    def __init__(
        self,
        n_jobs: int = 1,
        score_cutoff: float = 0.0,
        scorer=editdist.WRatio,
        model_id: str | None = None,
    ):
        super().__init__(model_id)
        self.type = "EditDistance"
        self.score_cutoff = score_cutoff * 100
        self.scorer = editdist.resolve_scorer(scorer)
        self.n_jobs = n_jobs  # parallelism is Ray's job; kept for API parity

    def match(self, from_list, to_list=None, **kwargs) -> pd.DataFrame:
        from_list = list(from_list)
        equal_lists = to_list is None
        base_to = from_list if equal_lists else list(to_list)
        rows = []
        for from_string in from_list:
            choices = base_to
            if equal_lists:
                choices = base_to.copy()
                choices.remove(from_string)
            m = editdist.extract_one(
                from_string, choices, score_cutoff=self.score_cutoff, scorer=self.scorer
            )
            if m:
                rows.append((from_string, m[0], m[1] / 100))
            else:
                rows.append((from_string, None, 0.0))
        return pd.DataFrame(rows, columns=["From", "To", "Similarity"])


class EditDistanceMatcher(BaseMatcher):
    """Brute-force argmax scorer matcher (polyfuzz/models/_distance.py:46-102)
    with optional GLOBAL min-max normalization of the Similarity column
    (_distance.py:83-87; all-equal scores normalize to NaN exactly like the
    reference's 0/0). Vectorized fast path when the scorer is our
    ``ratio``; arbitrary callables fall back to a per-pair loop."""

    def __init__(
        self,
        n_jobs: int = 1,
        scorer=editdist.ratio,
        model_id: str | None = None,
        normalize: bool = True,
    ):
        super().__init__(model_id)
        self.type = "EditDistance"
        self.scorer = editdist.resolve_scorer(scorer)
        self.normalize = normalize
        self.n_jobs = n_jobs

    def match(self, from_list, to_list=None, **kwargs) -> pd.DataFrame:
        from_list = list(from_list)
        equal_lists = to_list is None
        base_to = from_list if equal_lists else list(to_list)
        froms, tos, sims = [], [], []
        fast = self.scorer is editdist.ratio and not equal_lists and len(base_to) > 0
        packed = editdist.PaddedStrings(base_to) if fast else None
        for from_string in from_list:
            if fast:
                scores = editdist.ratio_one_to_many(from_string, packed)
                i = int(np.argmax(scores))
                froms.append(from_string)
                tos.append(base_to[i])
                sims.append(float(scores[i]))
            else:
                list_to_match = base_to.copy()
                if equal_lists:
                    list_to_match.remove(from_string)
                scores = [self.scorer(from_string, t) for t in list_to_match]
                i = int(np.argmax(scores))
                froms.append(from_string)
                tos.append(list_to_match[i])
                sims.append(float(scores[i]))
        matches = pd.DataFrame(
            {"From": froms, "To": tos, "Similarity": sims}
        )
        if self.normalize:
            lo = matches["Similarity"].min()
            hi = matches["Similarity"].max()
            matches["Similarity"] = (matches["Similarity"] - lo) / (hi - lo)
        return matches
