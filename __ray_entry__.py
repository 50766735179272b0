"""Driver contract for the graft builder (Ray Data target).

The driver initializes Ray BEFORE importing this module; nothing here (or
in raylink) calls ray.init()/ray.shutdown(). ``entry()`` runs the flagship
record-linkage pipeline on sf0.001; ``queries()``/``oracle_sql()`` expose
the operator battery from SURVEY §2 plus the training-data extras, with
DuckDB oracles for every SQL-expressible operator (kernel-only ops are
rows-only checks, parity being pytest-gated instead).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

def _ensure_workers_can_import() -> None:
    """Delegates to raylink.workers — the by-value pickle fallback shared
    with the ray-job-submit entrypoint (scripts/run_flagship.py)."""
    from raylink.workers import ensure_workers_can_import

    ensure_workers_can_import()


def entry() -> Any:
    """Flagship on /root/testdata/sf0.001: document near-dedup linkage —
    read documents, self-match text per lang block with TF-IDF char
    3-grams, group with the reference's linkage semantics, return the
    grouped matches (stable schema: from, to, similarity, block_key,
    row_order, group)."""
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    _ensure_workers_can_import()

    from raylink.pipeline import MatcherSpec, group_matches, match_dataset

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    res = match_dataset(
        ds,
        None,
        MatcherSpec(kind="tfidf", min_similarity=0.0, top_n=1),
        text_col="text",
        block_col="lang",
    )
    gr = group_matches(res, link_min_similarity=0.75, group_all_strings=True)
    return gr.grouped


def queries() -> dict[str, Callable[[str], Any]]:
    from raylink.queries import QUERIES

    _ensure_workers_can_import()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from raylink.queries import ORACLE_SQL, ensure_transcript_fixture

    # The transcript-query oracles read a deterministic fixture from /tmp;
    # synthesize it now (idempotent, seed-fixed) so the SQL side never
    # depends on the Ray side having run first.
    try:
        ensure_transcript_fixture("/root/testdata/sf0.01")
    except Exception:
        pass  # oracle comparison will surface any real problem
    try:
        from raylink.queries import ensure_embedding_lsh_fixture

        ensure_embedding_lsh_fixture()
    except Exception:
        pass
    try:
        from raylink.queries import ensure_media_fixture

        ensure_media_fixture()
    except Exception:
        pass
    try:
        from raylink.queries import ensure_ivf_centroid_fixture

        ensure_ivf_centroid_fixture("/root/testdata/sf0.01")
    except Exception:
        pass
    try:
        from raylink.queries import ensure_bpe_merges_fixture

        ensure_bpe_merges_fixture("/root/testdata/sf0.01")
    except Exception:
        pass
    try:
        from raylink.queries import ensure_hll_lc_fixture

        ensure_hll_lc_fixture(12)
    except Exception:
        pass
    return dict(ORACLE_SQL)
