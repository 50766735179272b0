"""Production fit → transform lifecycle with persisted artifacts (E2).

Mirrors ``PolyFuzz.fit/transform/save/load`` (polyfuzz/polyfuzz.py:156-242,
429-457) distributed: ``fit`` runs the match pipeline and freezes the
per-block to-side state (TF-IDF vocab + IDF + to-side texts, or embedding
matrix); ``transform`` scores new from-side Datasets against the frozen
index WITHOUT refitting (``re_train=False`` semantics: the vocabulary is
not refit and the to-side is not re-vectorized, polyfuzz/models/
_tfidf.py:107-116, _sbert.py:98-112).

Persistence replaces the reference's whole-object joblib pickle with
inspectable artifacts::

    <dir>/spec.json                 matcher parameters
    <dir>/to_side.parquet           (block_key, entity_text, row_order)
    <dir>/vocab/<block>.json        TF-IDF vocab + IDF per block
    <dir>/embeddings.npz            embedding matrices per block (embeddings)

``load`` rebuilds the broadcast index from the artifacts and returns a
model whose ``transform`` matches the fitted one bit-for-bit.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from raylink.pipeline import (
    BlockIndex,
    MatcherSpec,
    MatchResult,
    _collect_to_side,
    build_block_indexes,
    match_dataset,
)
from raylink.tfidf import TfidfVocab, TopkIndex


class RayLinkModel:
    def __init__(self, spec: MatcherSpec | None = None):
        self.spec = spec or MatcherSpec()
        self.blocks: dict[str, BlockIndex] | None = None
        self.index_ref = None
        self.top_n_cols: int | None = None
        self.last_match: MatchResult | None = None

    # ------------------------------------------------------------------
    def fit(self, from_ds, to_ds=None, **kwargs) -> "RayLinkModel":
        """Run match; remember the golden to-side (from-side when to_ds is
        None, polyfuzz/polyfuzz.py:203-206) as the frozen index."""
        result = match_dataset(from_ds, to_ds, self.spec, **kwargs)
        if result.index_ref is None:
            # the sharded auto-switch returns shard refs, not the frozen
            # broadcast index this lifecycle persists — failing HERE beats
            # a misleading "fit the model first" at transform/save time
            raise ValueError(
                "fit requires the broadcast index, but the to-side exceeded "
                "max_broadcast_to_rows and match_dataset auto-sharded; raise "
                "the bound (kwargs: max_broadcast_to_rows) to fit this model"
            )
        self.last_match = result
        self.index_ref = result.index_ref
        self.blocks = result.index_blocks
        self.top_n_cols = result.top_n_cols
        return self

    def transform(self, from_ds, **kwargs) -> MatchResult:
        if self.index_ref is None:
            raise ValueError("fit (or load) the model before transform")
        return match_dataset(
            from_ds,
            to_ds=None,  # the to-side comes from the frozen index
            spec=self.spec,
            prebuilt_index_ref=self.index_ref,
            top_n_cols_override=self.top_n_cols,
            # new from-rows are NOT the to-side: no diagonal exclusion
            self_match_override=False,
            **kwargs,
        )

    def fit_transform(self, from_ds, to_ds=None, **kwargs) -> MatchResult:
        self.fit(from_ds, to_ds, **kwargs)
        return self.last_match

    # ------------------------------------------------------------------
    def save(self, path: str) -> None:
        if self.blocks is None:
            raise ValueError("nothing fitted to save")
        os.makedirs(path, exist_ok=True)
        spec_d = asdict(self.spec)
        # custom model objects persist via cloudpickle sidecars (the
        # reference joblib-pickles the whole model); silently dropping the
        # embedder made load() substitute HashEmbedder — wrong similarities
        from ray import cloudpickle

        for field in ("embedder", "scorer"):
            obj = spec_d.pop(field, None)
            if obj is not None and not isinstance(obj, str):
                with open(os.path.join(path, f"{field}.pkl"), "wb") as f:
                    cloudpickle.dump(obj, f)
                spec_d[field] = f"__pickled__:{field}.pkl"
            else:
                spec_d[field] = obj
        with open(os.path.join(path, "spec.json"), "w") as f:
            json.dump({"spec": spec_d, "top_n_cols": self.top_n_cols}, f)
        rows_b, rows_t, rows_o = [], [], []
        vocab_dir = os.path.join(path, "vocab")
        os.makedirs(vocab_dir, exist_ok=True)
        emb: dict[str, np.ndarray] = {}
        for bk, bi in self.blocks.items():
            rows_b += [bk] * len(bi.texts)
            rows_t += [str(t) for t in bi.texts]
            rows_o += list(
                bi.row_orders
                if bi.row_orders is not None
                else range(len(bi.texts))
            )
            if bi.tfidf_vocab is not None:
                with open(os.path.join(vocab_dir, f"{_safe(bk)}.json"), "w") as f:
                    json.dump(bi.tfidf_vocab.serialize(), f)
            if bi.emb is not None:
                emb[_safe(bk)] = bi.emb
        pq.write_table(
            pa.table(
                {
                    "block_key": pa.array(rows_b, type=pa.string()),
                    "entity_text": pa.array(rows_t, type=pa.string()),
                    "row_order": pa.array(np.asarray(rows_o, dtype=np.int64)),
                }
            ),
            os.path.join(path, "to_side.parquet"),
        )
        if emb:
            np.savez(os.path.join(path, "embeddings.npz"), **emb)

    @classmethod
    def load(cls, path: str) -> "RayLinkModel":
        with open(os.path.join(path, "spec.json")) as f:
            meta = json.load(f)
        sd = meta["spec"]
        sd["n_gram_range"] = tuple(sd["n_gram_range"])
        from ray import cloudpickle

        for field in ("embedder", "scorer"):
            tag = sd.get(field)
            if isinstance(tag, str) and tag.startswith("__pickled__:"):
                with open(os.path.join(path, tag.split(":", 1)[1]), "rb") as f:
                    sd[field] = cloudpickle.load(f)
        spec = MatcherSpec(**sd)
        model = cls(spec)
        to_tbl = pq.read_table(os.path.join(path, "to_side.parquet"))
        blocks = _collect_to_side(to_tbl)
        vocab_dir = os.path.join(path, "vocab")
        emb_path = os.path.join(path, "embeddings.npz")
        emb = np.load(emb_path) if os.path.exists(emb_path) else None
        for bk, bi in blocks.items():
            vpath = os.path.join(vocab_dir, f"{_safe(bk)}.json")
            if os.path.exists(vpath):
                with open(vpath) as f:
                    bi.tfidf_vocab = TfidfVocab.deserialize(json.load(f))
                bi.topk = TopkIndex(bi.tfidf_vocab.transform(bi.texts), bi.texts)
            if emb is not None and _safe(bk) in emb:
                bi.emb = emb[_safe(bk)]
        if spec.kind in ("rapidfuzz", "editdistance"):
            build_block_indexes(spec, blocks, self_match=True)
        model.blocks = blocks
        model.index_ref = ray.put(blocks)
        model.top_n_cols = meta["top_n_cols"]
        return model


def _safe(bk: str) -> str:
    return "".join(c if c.isalnum() else f"_{ord(c):02x}" for c in bk)
