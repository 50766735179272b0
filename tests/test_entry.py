"""Replicates the driver's correctness harness locally: run every
``queries()`` entry at sf0.001 and compare SQL-checked ones against
``oracle_sql()`` via DuckDB (row count, sorted-column value equality)."""

import math
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as mod

    return mod


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def to_pandas(result):
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    sort_cols = list(df.columns)
    df = df.sort_values(by=sort_cols, ignore_index=True, kind="mergesort")
    return df


def assert_frames_match(ours: pd.DataFrame, oracle: pd.DataFrame, name: str):
    assert len(ours) == len(oracle), f"{name}: row count {len(ours)} != {len(oracle)}"
    a, b = canon(ours), canon(oracle)
    assert list(a.columns) == list(b.columns), f"{name}: columns {list(a.columns)} vs {list(b.columns)}"
    for col in a.columns:
        va, vb = a[col].to_numpy(), b[col].to_numpy()
        if np.issubdtype(va.dtype, np.floating) or np.issubdtype(vb.dtype, np.floating):
            va = va.astype(np.float64)
            vb = vb.astype(np.float64)
            both_nan = np.isnan(va) & np.isnan(vb)
            assert np.array_equal(va[~both_nan], vb[~both_nan]), f"{name}.{col} values differ"
        else:
            assert (
                pd.Series(va).astype(str).tolist()
                == pd.Series(vb).astype(str).tolist()
            ), f"{name}.{col} values differ"


def test_entry_smoke(entry_mod):
    result = entry_mod.entry()
    df = to_pandas(result)
    assert len(df) > 0
    assert {"from", "to", "similarity", "group"} <= set(df.columns)


def test_every_query_runs(entry_mod):
    qs = entry_mod.queries()
    assert len(qs) >= 20
    for name, fn in qs.items():
        out = to_pandas(fn(SF_DIR))
        assert isinstance(out, pd.DataFrame), name
        assert len(out) >= 0, name


@pytest.mark.parametrize(
    "name",
    [
        "clean_documents",
        "ngram_df",
        "exact_dedup",
        "minmax_normalize",
        "threshold_filter",
        "pr_curve",
        "canonicalize_events",
        "ann_self_top1",
        "token_count",
        "quality_score",
        "lang_id",
        "fingerprint",
        "ann_topk",
        "match_tfidf_documents",
        "wratio_short_branch",
        "fit_transform",
        "group_documents",
        "simhash",
        "match_editdistance",
        "minhash_dedup",
        "embedding_cosine_pairs",
        "embedding_lsh_pairs",
        "ngram_jaccard_pairs",
        "ann_topk_join",
        "snm_pairs",
        "asof_clicks_views",
        "event_windows",
        "session_stats",
        "join_orders_customers",
        "customers_no_urgent",
        "event_pairs",
        "stratified_sample",
        "sample_mix",
        "split_documents",
        "top_orders_per_customer",
        "event_value_quantiles",
        "heavy_users",
        "user_active_days",
        "label_centroids",
        "hopping_event_windows",
        "top_revenue_customers",
        "profile_documents",
        "docs_in_major_langs",
        "rolling_user_value",
        "event_lag_gaps",
        "redact_pii",
        "repetition_stats",
        "vocabulary",
        "dedup_representatives",
        "contamination_check",
        "contamination_bloom",
        "chunk_documents",
        "pack_sequences",
        "token_budget",
        "token_mix",
        "frequent_langs",
        "bpe_pairs",
        "remove_duplicate_spans",
        "semantic_dedup",
        "dedup_reps_quality",
        "rarity_score",
        "deduped_corpus",
        "quality_filter",
        "incremental_dedup",
        "corpus_report",
        "epoch_shuffle",
    ],
)
def test_sql_checked_queries(entry_mod, con, name):
    ours = to_pandas(entry_mod.queries()[name](SF_DIR))
    oracle = con.sql(entry_mod.oracle_sql()[name]).df()
    assert_frames_match(ours, oracle, name)


def test_transcript_sql_queries(entry_mod):
    """Transcript oracles are pinned to the sf0.01 fixture path (the
    driver's comparison scale); verify at that scale."""
    from raylink.queries import ensure_transcript_fixture

    ensure_transcript_fixture("/root/testdata/sf0.01")
    c = duckdb.connect()
    for name in [
        "transcript_canonicalize",
        "transcript_from_json",
        "transcript_conv_text",
        "transcript_turn_stats",
        "transcript_tool_stats",
        "sft_pairs",
        "remove_boilerplate",
        "transcript_flagship",
        "transcript_pr_curve",
    ]:
        ours = to_pandas(entry_mod.queries()[name]("/root/testdata/sf0.01"))
        oracle = c.sql(entry_mod.oracle_sql()[name]).df()
        assert_frames_match(ours, oracle, name)


def test_bpe_sql_queries(entry_mod):
    """bpe_encode / training_mix oracles replay the rank-ordered merge
    passes from the PINNED merge fixture (static sf0.01 path, the
    driver's comparison scale — the IVF/transcript pinning convention);
    verify hash-exact there."""
    from raylink.queries import ensure_bpe_merges_fixture

    sf = "/root/testdata/sf0.01"
    ensure_bpe_merges_fixture(sf)
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    for name in ["bpe_encode", "training_mix"]:
        ours = to_pandas(entry_mod.queries()[name](sf))
        oracle = c.sql(entry_mod.oracle_sql()[name]).df()
        assert_frames_match(ours, oracle, name)


def test_ivf_sql_queries(entry_mod):
    """IVF oracles replay assignment + probing from the PINNED centroid
    fixture (static sf0.01 path, the driver's comparison scale); verify
    hash-exact there."""
    c = duckdb.connect()
    sf = "/root/testdata/sf0.01"
    c.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet')"
    )
    for name in ["ann_ivf_topk", "ann_ivf_partitioned"]:
        ours = to_pandas(entry_mod.queries()[name](sf))
        oracle = c.sql(entry_mod.oracle_sql()[name]).df()
        assert_frames_match(ours, oracle, name)


def test_oracle_keys_subset_of_queries(entry_mod):
    qs = set(entry_mod.queries())
    os_ = set(entry_mod.oracle_sql())
    assert os_ <= qs
    assert len(os_) >= 12
