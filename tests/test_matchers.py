import numpy as np
import pandas as pd
import pytest

from raylink import (
    EditDistanceMatcher,
    EmbeddingMatcher,
    PolyMatch,
    RapidFuzzMatcher,
    TFIDFMatcher,
)
from raylink import editdist
from raylink.matchers import BaseMatcher


class MyModel(BaseMatcher):
    """Custom-matcher extension surface (tests/test_polyfuzz.py:23-37)."""

    def match(self, from_list, to_list=None, **kwargs):
        scores = [
            [editdist.ratio(f, t) / 100 for t in to_list] for f in from_list
        ]
        mappings = [to_list[int(np.argmax(row))] for row in scores]
        return pd.DataFrame(
            {
                "From": from_list,
                "To": mappings,
                "Similarity": np.max(scores, axis=1),
            }
        )


METHODS = ["EditDistance", "TF-IDF", "Embeddings", MyModel()]


@pytest.mark.parametrize("method", METHODS)
def test_base_model(method, fixture_lists):
    from_list, to_list = fixture_lists
    model = PolyMatch(method).match(from_list, to_list)
    matches = model.get_matches()
    assert isinstance(matches, pd.DataFrame)
    assert matches.Similarity.mean() > 0.3
    assert len(matches) == 6
    assert list(matches.columns) == ["From", "To", "Similarity"]


@pytest.mark.parametrize("method", METHODS)
def test_fit_transform(method, fixture_lists):
    from_list, to_list = fixture_lists
    model = PolyMatch(method).fit(from_list, to_list)
    matches = model.get_matches()
    assert len(matches) == 6
    results = model.transform(to_list)
    key = list(results.keys())[0]
    assert isinstance(results[key], pd.DataFrame)
    assert results[key].Similarity.sum() > 0


@pytest.mark.parametrize("method", METHODS)
def test_grouper(method, fixture_lists):
    from_list, to_list = fixture_lists
    model = PolyMatch(method).match(from_list, to_list)
    model.group(link_min_similarity=0.75)
    matches = model.get_matches()
    assert list(matches.columns) == ["From", "To", "Similarity", "Group"]
    assert model.get_clusters() == {1: ["apples", "apple"]}
    assert model.get_cluster_mappings() == {"apples": 1, "apple": 1}


def test_wrong_method_raises(fixture_lists):
    from_list, to_list = fixture_lists
    with pytest.raises(ValueError):
        PolyMatch("Unknown Model").match(from_list, to_list)


def test_multiple_models(fixture_lists):
    from_list, to_list = fixture_lists
    matchers = [
        TFIDFMatcher(n_gram_range=(3, 3), min_similarity=0, model_id="TF-IDF"),
        TFIDFMatcher(n_gram_range=(3, 6), min_similarity=0),
        EditDistanceMatcher(n_jobs=1),
        EditDistanceMatcher(n_jobs=1, scorer=editdist.ratio),
        RapidFuzzMatcher(n_jobs=1),
    ]
    model = PolyMatch(matchers).match(from_list, to_list)
    for model_id in model.get_ids():
        assert model_id in model.get_matches().keys()
    assert len(model.get_matches()) == len(matchers)
    with pytest.raises(ValueError):
        model.get_clusters()
    model.group()
    for model_id in model.get_ids():
        assert model_id in model.get_cluster_mappings().keys()


def test_top_n_columns(fixture_lists):
    from_list, to_list = fixture_lists
    matches = TFIDFMatcher(min_similarity=0, top_n=2).match(from_list, to_list)
    assert list(matches.columns) == ["From", "To", "Similarity", "To_2", "Similarity_2"]
    # top_n clamp: only 3 distinct to-strings (polyfuzz/models/_utils.py:54-56)
    matches = TFIDFMatcher(min_similarity=0, top_n=10).match(from_list, to_list)
    assert list(matches.columns) == [
        "From", "To", "Similarity", "To_2", "Similarity_2", "To_3", "Similarity_3",
    ]


def test_small_similarity_nulled():
    m = TFIDFMatcher(min_similarity=0).match(["qqq"], ["zzz"])
    assert m["To"].iloc[0] is None
    assert m["Similarity"].iloc[0] == 0.0


def test_rapidfuzz_score_cutoff(fixture_lists):
    from_list, to_list = fixture_lists
    matches = RapidFuzzMatcher(score_cutoff=0.95).match(from_list, to_list)
    # only exact-ish matches survive; misses are (None, 0.)
    assert matches.loc[matches.From == "recal", "To"].iloc[0] is None
    assert matches.loc[matches.From == "recal", "Similarity"].iloc[0] == 0.0
    assert matches.loc[matches.From == "apple", "To"].iloc[0] == "apple"


def test_rapidfuzz_self_match_removes_self(fixture_lists):
    from_list, _ = fixture_lists
    matches = RapidFuzzMatcher().match(from_list)
    assert (matches["From"] != matches["To"]).all()
    assert matches.loc[matches.From == "apple", "To"].iloc[0] == "apples"


def test_editdistance_normalize(fixture_lists):
    from_list, to_list = fixture_lists
    raw = EditDistanceMatcher(normalize=False).match(from_list, to_list)
    assert raw.Similarity.max() > 1  # raw 0-100 scorer values
    norm = EditDistanceMatcher(normalize=True).match(from_list, to_list)
    assert norm.Similarity.min() == 0.0
    assert norm.Similarity.max() == 1.0


def test_editdistance_custom_scorer(fixture_lists):
    from_list, to_list = fixture_lists
    jaccard = lambda a, b: len(set(a) & set(b)) / len(set(a) | set(b))
    m = EditDistanceMatcher(scorer=jaccard, normalize=False).match(from_list, to_list)
    assert m.Similarity.between(0, 1).all()


def test_embedding_custom_backend(fixture_lists):
    from_list, to_list = fixture_lists

    def char_embed(texts):
        out = np.zeros((len(texts), 26))
        for i, t in enumerate(texts):
            for c in t:
                if c.isalpha():
                    out[i, ord(c.lower()) - 97] += 1
        return out

    m = EmbeddingMatcher(embedder=char_embed, min_similarity=0).match(
        from_list, to_list
    )
    assert m.loc[m.From == "apple", "To"].iloc[0] == "apple"
    assert m.loc[m.From == "apple", "Similarity"].iloc[0] == 1.0


def test_embedding_retrain_false_caches(fixture_lists):
    from_list, to_list = fixture_lists
    m = EmbeddingMatcher(min_similarity=0)
    m.match(from_list, to_list)
    cached = m.embeddings_to
    m.match(["apple"], to_list, re_train=False)
    assert m.embeddings_to is cached


def test_save_load_roundtrip(tmp_path, fixture_lists):
    from_list, to_list = fixture_lists
    model = PolyMatch("TF-IDF").fit(from_list, to_list)
    p = str(tmp_path / "model.pkl")
    model.save(p)
    loaded = PolyMatch.load(p)
    out = loaded.transform(["appl"])
    assert out["TF-IDF"]["To"].iloc[0] == "apple"


@pytest.mark.parametrize("method", ["sparse", "sklearn", "knn"])
@pytest.mark.parametrize("rng", [(3, 3), (3, 6)])
def test_tfidf_cosine_methods(method, rng, fixture_lists):
    """Replicates the reference's cosine-method parametrization
    (tests/models/test_tfidf.py:9-27)."""
    from_list, to_list = fixture_lists
    m = TFIDFMatcher(n_gram_range=rng, min_similarity=0, cosine_method=method)
    matches = m.match(from_list, to_list)
    assert len(matches) == 6
    assert list(matches.columns) == ["From", "To", "Similarity"]
    assert matches.Similarity.mean() > 0.3
    assert matches.loc[matches.From == "apple", "To"].iloc[0] == "apple"


def test_knn_self_match_drops_first_column():
    """J1c quirk: knn self-match drops column 0 assuming it is self — with
    duplicate strings the assumption fails and results DIVERGE from the
    diagonal-zero methods (polyfuzz/models/_utils.py:59-66)."""
    texts = ["apple", "apple", "zebra"]
    knn = TFIDFMatcher(min_similarity=0, cosine_method="knn").match(texts)
    sparse = TFIDFMatcher(min_similarity=0, cosine_method="sparse").match(texts)
    # sparse: each "apple" matches the other duplicate at 1.0
    assert sparse.loc[0, "To"] == "apple" and sparse.loc[0, "Similarity"] == 1.0
    # knn: the dropped first hit for row 0 IS one of the duplicates; the
    # surviving column is the other duplicate (still 1.0) — but for zebra
    # (unique) the drop removes its true self-hit, same outcome. The knn
    # frame must still be a valid matches frame:
    assert list(knn.columns) == ["From", "To", "Similarity"]
    assert len(knn) == 3


def test_hash_embedder_components_bit_equal_vs_duckdb():
    """The HashEmbedder token hash (FNV64 fold over codepoints +
    splitmix64 per dim) must be reproducible in DuckDB HUGEINT arithmetic
    bit-exactly — that equivalence is what makes the match_embeddings
    driver query SQL-oracle-able (queries._EMBED_MATCH_SQL)."""
    import duckdb

    from raylink.embed import HashEmbedder
    from raylink.queries import _SQL_M64, _sql_mulmod64, _sql_splitmix64

    smix = _sql_splitmix64(
        f"((th.h + 42 + {_sql_mulmod64('CAST(dd.d AS HUGEINT)', 0x9E3779B97F4A7C15)})"
        f" % {_SQL_M64})"
    )
    sql = f"""
    WITH th AS (
      SELECT tok, list_reduce(
          list_prepend(CAST(0 AS HUGEINT),
            list_transform(regexp_split_to_array(tok, ''),
                           c -> CAST(ascii(c) AS HUGEINT))),
          (h, c) -> (h * CAST(1099511628211 AS HUGEINT) + c) % {_SQL_M64}
        ) AS h
      FROM (VALUES ('apple'), ('x'), ('zq9'), ('averylongtokenthatwrapsmanytimes')) t(tok)
    )
    SELECT th.tok, dd.d,
           (CAST({smix} AS DOUBLE) / 18446744073709551616.0) * 2.0 - 1.0 AS c
    FROM th, (SELECT unnest(range(1, 65)) AS d) dd
    ORDER BY th.tok, dd.d
    """
    rows = duckdb.connect().execute(sql).fetchall()
    by_tok: dict[str, dict[int, float]] = {}
    for tok, d, c in rows:
        by_tok.setdefault(tok, {})[d] = c
    emb = HashEmbedder()
    for tok, comps in by_tok.items():
        want = emb._token_vec(tok)
        got = np.array([comps[d] for d in range(1, 65)])
        assert np.array_equal(got, want), tok


def test_tfidf_match_accepts_iterator_to_list():
    """A generator to_list must not be exhausted by the corpus build."""
    from raylink.matchers import TFIDFMatcher

    eager = TFIDFMatcher(min_similarity=0).match(
        ["apple"], ["apple", "apply"]
    )
    lazy = TFIDFMatcher(min_similarity=0).match(
        ["apple"], iter(["apple", "apply"])
    )
    pd.testing.assert_frame_equal(eager, lazy)
    assert lazy.iloc[0]["To"] == "apple"
