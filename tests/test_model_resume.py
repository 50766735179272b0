"""fit/transform/save/load lifecycle + resumable checkpointed flagship."""

import os
import shutil

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def rd(ray_session):
    import ray.data
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray.data


def _ds(rd, texts, blocks=None):
    from raylink.pipeline import entities_from_texts

    return rd.from_arrow(entities_from_texts(texts, blocks))


def test_fit_transform_matches_local(rd, fixture_lists):
    from raylink import PolyMatch
    from raylink.model import RayLinkModel
    from raylink.pipeline import MatcherSpec, matches_to_frame

    from_list, to_list = fixture_lists
    model = RayLinkModel(MatcherSpec(min_similarity=0)).fit(
        _ds(rd, from_list), _ds(rd, to_list)
    )
    out = model.transform(_ds(rd, ["appl", "maus", "house"]))
    frame = matches_to_frame(out.matches, 1)
    local = PolyMatch("TF-IDF").fit(from_list, to_list)
    expect = local.transform(["appl", "maus", "house"])["TF-IDF"]
    pd.testing.assert_frame_equal(frame, expect)


def test_save_load_roundtrip(rd, fixture_lists, tmp_path):
    from raylink.model import RayLinkModel
    from raylink.pipeline import MatcherSpec, matches_to_frame

    from_list, to_list = fixture_lists
    model = RayLinkModel(MatcherSpec(min_similarity=0)).fit(
        _ds(rd, from_list), _ds(rd, to_list)
    )
    before = matches_to_frame(model.transform(_ds(rd, ["appl"])).matches, 1)
    path = str(tmp_path / "model")
    model.save(path)
    loaded = RayLinkModel.load(path)
    after = matches_to_frame(loaded.transform(_ds(rd, ["appl"])).matches, 1)
    pd.testing.assert_frame_equal(before, after)
    assert os.path.exists(os.path.join(path, "to_side.parquet"))
    assert os.path.exists(os.path.join(path, "spec.json"))


def test_save_load_rapidfuzz(rd, fixture_lists, tmp_path):
    from raylink.model import RayLinkModel
    from raylink.pipeline import MatcherSpec, matches_to_frame

    from_list, to_list = fixture_lists
    model = RayLinkModel(MatcherSpec(kind="rapidfuzz")).fit(
        _ds(rd, from_list), _ds(rd, to_list)
    )
    path = str(tmp_path / "m2")
    model.save(path)
    loaded = RayLinkModel.load(path)
    a = matches_to_frame(model.transform(_ds(rd, ["appl"])).matches, 1)
    b = matches_to_frame(loaded.transform(_ds(rd, ["appl"])).matches, 1)
    pd.testing.assert_frame_equal(a, b)


@pytest.fixture(scope="module")
def transcripts_dir(tmp_path_factory):
    from raylink.transcripts import write_transcripts_dataset

    out = str(tmp_path_factory.mktemp("tr"))
    info = write_transcripts_dataset(out, 60, seed=11)
    return info["transcripts"]


def test_flagship_resume_skips_stages(rd, transcripts_dir, tmp_path):
    from raylink.resume import run_flagship_checkpointed

    root = str(tmp_path / "ckpt")
    r1 = run_flagship_checkpointed(transcripts_dir, root)
    assert all(not r1[s][1] for s in ("entities", "matches", "clusters", "assignments"))
    a1 = r1["assignments"][0].to_pandas().sort_values("conv_id").reset_index(drop=True)

    r2 = run_flagship_checkpointed(transcripts_dir, root)
    assert all(r2[s][1] for s in ("entities", "matches", "clusters", "assignments"))
    a2 = r2["assignments"][0].to_pandas().sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a1, a2)


def test_flagship_resume_after_partial_failure(rd, transcripts_dir, tmp_path):
    from raylink.resume import run_flagship_checkpointed

    root = str(tmp_path / "ckpt2")
    r1 = run_flagship_checkpointed(transcripts_dir, root)
    a1 = r1["assignments"][0].to_pandas().sort_values("conv_id").reset_index(drop=True)
    # simulate a crash after the match stage: downstream checkpoints lost
    shutil.rmtree(os.path.join(root, "clusters"))
    shutil.rmtree(os.path.join(root, "assignments"))
    r2 = run_flagship_checkpointed(transcripts_dir, root)
    assert r2["entities"][1] and r2["matches"][1]  # resumed
    assert not r2["clusters"][1] and not r2["assignments"][1]  # recomputed
    a2 = r2["assignments"][0].to_pandas().sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a1, a2)


def test_param_change_invalidates_downstream(rd, transcripts_dir, tmp_path):
    from raylink.resume import run_flagship_checkpointed

    root = str(tmp_path / "ckpt3")
    run_flagship_checkpointed(transcripts_dir, root, link_min_similarity=0.75)
    r2 = run_flagship_checkpointed(transcripts_dir, root, link_min_similarity=0.6)
    assert r2["entities"][1] and r2["matches"][1]  # unaffected stages resumed
    assert not r2["clusters"][1]  # threshold change recomputes linkage


def test_kill_mid_scoring_resumes_missing_partitions_only(rd, tmp_path):
    """Per-partition resume: a stage killed after some partitions wrote
    re-enters and recomputes ONLY the missing partitions, byte-identical
    to an uninterrupted run."""
    import pyarrow as pa

    from raylink.checkpoint import run_partitioned_stage

    root = str(tmp_path / "ckpt")
    calls: list[str] = []

    def produce(key: str) -> pa.Table:
        calls.append(key)
        i = int(key)
        return pa.table({"part": [i] * 3, "v": list(range(i, i + 3))})

    keys = [f"{i:05d}" for i in range(5)]

    class Boom(RuntimeError):
        pass

    def produce_then_die(key: str) -> pa.Table:
        if len(calls) == 2 and key not in calls:
            raise Boom()  # "kill" after two partitions landed
        return produce(key)

    import pytest as _pytest

    with _pytest.raises(Boom):
        run_partitioned_stage(root, "score", keys, produce_then_die)
    assert calls == keys[:2]

    ds, n_skipped = run_partitioned_stage(root, "score", keys, produce)
    assert n_skipped == 2  # the two landed partitions were NOT recomputed
    assert calls == keys[:2] + keys[2:]
    out = ds.to_pandas().sort_values(["part", "v"], ignore_index=True)
    assert len(out) == 15

    # fully-complete stage: nothing recomputes
    ds2, n_skipped2 = run_partitioned_stage(root, "score", keys, produce)
    assert n_skipped2 == 5 and len(calls) == 5

    # params change wipes and recomputes everything
    ds3, n_skipped3 = run_partitioned_stage(
        root, "score", keys, produce, params={"v": 2}
    )
    assert n_skipped3 == 0 and len(calls) == 10


def test_shrunken_key_set_prunes_stale_partitions(rd, tmp_path):
    """If the key set shrinks between runs (same params would be unusual,
    but a changed-params wipe also covers it), stale part files must not
    leak into the returned dataset."""
    import pyarrow as pa

    from raylink.checkpoint import run_partitioned_stage

    root = str(tmp_path / "ckpt")

    def produce(key: str) -> pa.Table:
        return pa.table({"part": [int(key)] * 2})

    ds1, _ = run_partitioned_stage(
        root, "s", [f"{i:05d}" for i in range(5)], produce
    )
    assert ds1.count() == 10
    ds2, _ = run_partitioned_stage(
        root, "s", [f"{i:05d}" for i in range(3)], produce
    )
    out = ds2.to_pandas()
    assert len(out) == 6 and set(out["part"]) == {0, 1, 2}


def test_full_resume_skips_distinct_pass(rd, transcripts_dir, tmp_path):
    """A fully-complete matches stage short-circuits on the manifest —
    partitioned_stage_complete is true and re-entry reads parquet only."""
    from raylink.checkpoint import partitioned_stage_complete
    from raylink.resume import run_flagship_checkpointed

    root = str(tmp_path / "ckpt")
    r1 = run_flagship_checkpointed(transcripts_dir, root)
    assert not r1["matches"][1]
    # manifest-based completeness check holds without touching data
    import json
    import os

    with open(os.path.join(root, "matches", "manifest.json")) as f:
        assert json.load(f)["partition_keys"]
    r2 = run_flagship_checkpointed(transcripts_dir, root)
    assert r2["matches"][1]  # resumed via the short-circuit
    assert r2["n_assignments"] == r1["n_assignments"]


def test_spec_fingerprint_distinguishes_models():
    """Swapping the embedder/scorer object must change the checkpoint
    fingerprint (a silent pop used to let ModelB resume ModelA's results)."""
    from raylink.pipeline import MatcherSpec
    from raylink.resume import spec_checkpoint_params

    class EmbA:
        fingerprint = "dim=16,seed=1"

    class EmbB:
        fingerprint = "dim=32,seed=2"

    pa_ = spec_checkpoint_params(
        MatcherSpec(kind="embeddings", embedder=EmbA())
    )
    pb_ = spec_checkpoint_params(
        MatcherSpec(kind="embeddings", embedder=EmbB())
    )
    assert pa_ != pb_
    assert "EmbA" in pa_["embedder"] and "dim=16" in pa_["embedder"]
    # same class+fingerprint -> identical params (resume still works)
    assert pa_ == spec_checkpoint_params(
        MatcherSpec(kind="embeddings", embedder=EmbA())
    )


def test_broadcast_cache_lru_keeps_hot_entry(ray_session):
    """Cycling past the cache cap must evict the coldest entry, not the
    one being re-used (a clear-all forced mid-stage re-fetches)."""
    import numpy as np
    import ray

    from raylink import broadcast as bc

    bc._BROADCAST_CACHE.clear()
    hot = ray.put(np.arange(4))
    bc.cached_object(hot)
    refs = [ray.put(np.arange(i + 1)) for i in range(bc._MAX_ENTRIES + 4)]
    for i, r in enumerate(refs):
        bc.cached_object(r)
        bc.cached_object(hot)  # keep the hot entry recent
    hot_key = hot.hex()
    assert hot_key in bc._BROADCAST_CACHE
    assert len(bc._BROADCAST_CACHE) <= bc._MAX_ENTRIES


def test_model_save_load_custom_embedder_roundtrip(ray_session, tmp_path):
    """A custom embedder must survive save/load (it used to be silently
    replaced by the default HashEmbedder — wrong similarities)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from raylink.embed import HashEmbedder
    from raylink.model import RayLinkModel
    from raylink.pipeline import MatcherSpec

    custom = HashEmbedder(dim=24, seed=123)  # non-default config
    texts = ["alpha beta", "alpha bets", "gamma delta", "epsilon zeta"]
    ds = rd.from_arrow(pa.table({"entity_text": pa.array(texts)}))
    m = RayLinkModel(MatcherSpec(kind="embeddings", embedder=custom,
                                 min_similarity=0.0, top_n=1)).fit(ds)
    before = m.transform(ds).matches.to_pandas().sort_values(
        "row_order", ignore_index=True)
    path = str(tmp_path / "model")
    m.save(path)
    m2 = RayLinkModel.load(path)
    emb2 = m2.spec.embedder
    assert getattr(emb2, "dim", None) == 24  # custom config survived
    after = m2.transform(ds).matches.to_pandas().sort_values(
        "row_order", ignore_index=True)
    pd.testing.assert_frame_equal(before, after)


def test_model_fit_refuses_sharded_index(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from raylink.model import RayLinkModel
    from raylink.pipeline import MatcherSpec

    texts = [f"text number {i}" for i in range(40)]
    ds = rd.from_arrow(pa.table({"entity_text": pa.array(texts)}))
    with pytest.raises(ValueError, match="broadcast index"):
        RayLinkModel(MatcherSpec(kind="tfidf")).fit(
            ds, max_broadcast_to_rows=10
        )


def test_partitioned_stage_prunes_orphan_tmp(rd, tmp_path):
    import pyarrow as pa
    """A part-<key>.parquet.tmp left by a killed run whose key then
    LEAVES the key set must be pruned — read_checkpoint's read_parquet
    has no file-extension filter, so a surviving orphan would be READ
    into the resumed dataset (round-5 review finding)."""
    import os

    import pyarrow.parquet as pq

    from raylink.checkpoint import read_checkpoint, run_partitioned_stage

    root = str(tmp_path)

    def produce(key):
        return pa.table({"k": pa.array([key]), "v": pa.array([1])})

    run_partitioned_stage(root, "st", ["a", "b"], produce)
    # simulate a killed run for a key that will leave the key set
    orphan = os.path.join(root, "st", "data", "part-zz.parquet.tmp")
    pq.write_table(pa.table({"k": pa.array(["zz"]), "v": pa.array([9])}),
                   orphan)
    run_partitioned_stage(root, "st", ["a", "b"], produce)
    assert not os.path.exists(orphan)
    got = read_checkpoint(root, "st").to_pandas().sort_values(
        "k", ignore_index=True)
    assert list(got["k"]) == ["a", "b"]


def test_pack_sequences_string_ids_and_empty_input(rd):
    import pyarrow as pa
    """pack_sequences must not emit a divergent empty-block schema for
    non-int64 ids (the take_token_budget fix, applied by review), and a
    zero-block input must return a typed empty result instead of
    crashing from from_arrow_refs([])."""
    from raylink.packing import pack_sequences

    t = pa.table({
        "doc": pa.array(["b", "a", "c"], pa.string()),
        "text": pa.array(["x y", "z", "w w w"], pa.string()),
    })
    out = pack_sequences(rd.from_arrow(t).repartition(4), "doc", "text",
                         budget=3, output="pandas")
    assert list(out["doc"]) == ["a", "b", "c"]
    assert out["n_tokens"].tolist() == [1, 2, 3]

    empty = rd.from_arrow(pa.table({
        "doc": pa.array([], pa.string()),
        "text": pa.array([], pa.string()),
    })).filter(lambda r: False)
    eo = pack_sequences(empty, "doc", "text", budget=3, output="pandas")
    assert len(eo) == 0
