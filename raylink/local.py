"""Single-node orchestrator mirroring ``polyfuzz.PolyFuzz``.

This is the reference-semantics oracle used by the test suite and the
driver-side API for small lists; the distributed engine lives in
``raylink.pipeline``. Mirrors polyfuzz/polyfuzz.py:

  * method dispatch str / matcher / list of matchers (:124-152) — the
    quick-access "TF-IDF" / "Embeddings" paths get ``min_similarity=0``
    (:126,132) and "EditDistance" maps to :class:`RapidFuzzMatcher` (:129);
  * ``fit`` remembers the golden to_list (:203-206); ``transform`` reuses
    cached state via ``re_train=False`` and keys results by model TYPE
    (:235-240 — the reference wart where two same-type models collide is
    reproduced);
  * ``group`` (:331-373,459-484): default grouper = TF-IDF 3-grams at the
    link threshold, second self-match pass over distinct To (or From)
    strings, quirk-exact single linkage, Group column join. The reference's
    string-dispatch bug (:356-358 tests ``self.method`` instead of the
    ``model`` argument, so ``group(model="EditDistance")`` raises) is NOT
    reproduced — all three strings are accepted (SURVEY §2.8).
  * ``save``/``load`` via pickle (:429-457 uses joblib, not installed).
"""

from __future__ import annotations

import pickle
from collections.abc import Iterable

import pandas as pd

from raylink.linkage import single_linkage
from raylink.matchers import (
    BaseMatcher,
    EmbeddingMatcher,
    RapidFuzzMatcher,
    TFIDFMatcher,
)
from raylink.metrics import precision_recall_curve


def _quick_model(method: str, top_n: int = 1):
    if method in ("TF-IDF", "TFIDF"):
        return "TF-IDF", TFIDFMatcher(min_similarity=0, top_n=top_n)
    if method in ("EditDistance", "Edit Distance"):
        return "EditDistance", RapidFuzzMatcher()
    if method in ("Embeddings", "Embedding"):
        return "Embeddings", EmbeddingMatcher(min_similarity=0, top_n=top_n)
    raise ValueError(
        "Please instantiate the model with one of the following methods: \n"
        "* 'TF-IDF'\n* 'EditDistance'\n* 'Embeddings'\n"
    )


class PolyMatch:
    def __init__(self, method="TF-IDF", verbose: bool = False):
        self.method = method
        self.matches: dict[str, pd.DataFrame] | None = None
        self.min_precisions = None
        self.recalls = None
        self.average_precisions = None
        self.clusters = None
        self.cluster_mappings = None
        self.to_list = None

    # ------------------------------------------------------------------
    def match(self, from_list, to_list=None, top_n: int = 1) -> "PolyMatch":
        if isinstance(self.method, str):
            name, model = _quick_model(self.method, top_n)
            self.method = model
            self.matches = {name: model.match(from_list, to_list)}
        elif isinstance(self.method, BaseMatcher):
            self.matches = {self.method.model_id: self.method.match(from_list, to_list)}
        elif isinstance(self.method, Iterable):
            self._update_model_ids()
            self.matches = {}
            for model in self.method:
                self.matches[model.model_id] = model.match(from_list, to_list)
        return self

    def fit(self, from_list, to_list=None) -> "PolyMatch":
        self.match(from_list, to_list)
        self.to_list = to_list if to_list is not None else from_list
        return self

    def transform(self, from_list) -> dict[str, pd.DataFrame]:
        all_matches = {}
        if isinstance(self.method, BaseMatcher):
            all_matches[self.method.type] = self.method.match(
                from_list, self.to_list, re_train=False
            )
        elif isinstance(self.method, Iterable):
            for model in self.method:
                all_matches[model.type] = model.match(
                    from_list, self.to_list, re_train=False
                )
        return all_matches

    def fit_transform(self, from_list, to_list=None) -> dict[str, pd.DataFrame]:
        self.fit(from_list, to_list)
        return self.transform(from_list)

    # ------------------------------------------------------------------
    def group(
        self,
        model=None,
        link_min_similarity: float = 0.75,
        group_all_strings: bool = False,
    ):
        self._check_matches()
        self.clusters = {}
        self.cluster_mappings = {}
        if isinstance(model, str):
            if model in ("TF-IDF", "TFIDF"):
                model = TFIDFMatcher(
                    n_gram_range=(3, 3), min_similarity=link_min_similarity
                )
            elif model in ("EditDistance", "Edit Distance"):
                model = RapidFuzzMatcher()
            elif model in ("Embeddings", "Embedding"):
                model = EmbeddingMatcher(min_similarity=link_min_similarity)
            else:
                raise ValueError(
                    "Please instantiate the model with one of the following "
                    "methods: \n* 'TF-IDF'\n* 'EditDistance'\n* 'Embeddings'\n"
                    "* Or None if you want to automatically use TF-IDF"
                )
        elif not model:
            model = TFIDFMatcher(
                n_gram_range=(3, 3), min_similarity=link_min_similarity
            )
        for name in list(self.matches):
            self._create_groups(name, model, link_min_similarity, group_all_strings)

    def _create_groups(self, name, model, link_min_similarity, group_all_strings):
        if group_all_strings:
            strings = list(self.matches[name].From.dropna().unique())
        else:
            strings = list(self.matches[name].To.dropna().unique())
        matches = model.match(strings)
        clusters, cluster_id_map, cluster_name_map = single_linkage(
            matches, link_min_similarity
        )
        df = self.matches[name]
        df["Group"] = df["To"].map(cluster_name_map).fillna(df["To"])
        self.matches[name] = df
        self.clusters[name] = clusters
        self.cluster_mappings[name] = cluster_id_map

    # ------------------------------------------------------------------
    def precision_recall_curves(self, precision_steps: float = 0.01):
        """The numbers behind ``visualize_precision_recall``
        (polyfuzz/polyfuzz.py:286-329); plotting is out of engine scope."""
        self._check_matches()
        self.min_precisions, self.recalls, self.average_precisions = {}, {}, {}
        for name, match in self.matches.items():
            mp, rc, ap = precision_recall_curve(match, precision_steps)
            self.min_precisions[name] = mp
            self.recalls[name] = rc
            self.average_precisions[name] = ap
        return self.min_precisions, self.recalls, self.average_precisions

    # ------------------------------------------------------------------
    def get_ids(self):
        self._check_matches()
        if isinstance(self.method, str):
            return self.method
        if isinstance(self.method, BaseMatcher):
            return None
        if isinstance(self.method, Iterable):
            return [m.model_id for m in self.method]
        return None

    def get_matches(self, model_id: str | None = None):
        self._check_matches()
        if len(self.matches) == 1:
            return list(self.matches.values())[0]
        if len(self.matches) > 1 and model_id:
            return self.matches[model_id]
        return self.matches

    def get_clusters(self, model_id: str | None = None):
        self._check_matches()
        self._check_grouped()
        if len(self.matches) == 1:
            return list(self.clusters.values())[0]
        if len(self.matches) > 1 and model_id:
            return self.clusters[model_id]
        return self.clusters

    def get_cluster_mappings(self, name: str | None = None):
        self._check_matches()
        self._check_grouped()
        if len(self.matches) == 1:
            return list(self.cluster_mappings.values())[0]
        if len(self.matches) > 1 and name:
            return self.cluster_mappings[name]
        return self.cluster_mappings

    # ------------------------------------------------------------------
    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            pickle.dump(self, f)

    @classmethod
    def load(cls, path: str) -> "PolyMatch":
        with open(path, "rb") as f:
            return pickle.load(f)

    # ------------------------------------------------------------------
    def _check_matches(self):
        if not self.matches:
            raise ValueError(
                "This PolyMatch instance is not fitted yet. Call 'match' with "
                "appropriate arguments before using this estimator."
            )

    def _check_grouped(self):
        if not self.cluster_mappings and not self.clusters:
            raise ValueError(
                "This PolyMatch instance is not grouped yet. Call 'group' with "
                "appropriate arguments before using this estimator."
            )

    def _update_model_ids(self):
        for index, model in enumerate(self.method):
            if not model.model_id:
                model.model_id = f"Model {index}"
        model_ids = [m.model_id for m in self.method]
        if len(set(model_ids)) != len(model_ids):
            for index, model in enumerate(self.method):
                model.model_id = f"Model {index}"
