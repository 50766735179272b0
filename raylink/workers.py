"""Worker-import fallback shared by every driver entrypoint.

Ray workers import ``raylink`` by module reference when they deserialize
map_batches callables / broadcast indexes. When the driver's session was
started from a cwd that is not the repo (so the workers' sys.path lacks
it), fall back to cloudpickle BY-VALUE registration of the whole package —
slower pickles, but the contract keeps working regardless of where the
harness (or ``ray job submit`` standalone mode) ran from. Call once after
``ray.init``; both ``__ray_entry__`` and ``scripts/run_flagship.py`` do.
"""

from __future__ import annotations

import os
import sys

_CHECKED = False
_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SUBMODULES = [
    "raylink", "raylink.text", "raylink.tfidf", "raylink.editdist",
    "raylink.embed", "raylink.linkage", "raylink.metrics",
    "raylink.matchers", "raylink.local", "raylink.blocking",
    "raylink.pipeline", "raylink.flagship", "raylink.model",
    "raylink.resume", "raylink.checkpoint", "raylink.transcripts",
    "raylink.dedup", "raylink.ann", "raylink.textstats",
    "raylink.multimodal", "raylink.queries", "raylink.sources",
    "raylink.groupseq", "raylink.broadcast", "raylink.joins",
    "raylink.windows", "raylink.sampling", "raylink.aggs",
    "raylink.profile", "raylink.packing",
]


def ensure_workers_can_import() -> None:
    global _CHECKED
    if _CHECKED:
        return
    import ray

    if not ray.is_initialized():
        return
    _CHECKED = True

    @ray.remote(num_cpus=0)
    def _canary(path: str) -> bool:
        import importlib.util

        return importlib.util.find_spec("raylink") is not None

    try:
        ok = ray.get(_canary.remote(_REPO_DIR), timeout=30)
    except Exception:
        ok = False
    if ok:
        return
    # eagerly import every submodule so the by-value registration covers
    # the lazily-imported ones too
    import importlib

    for name in _SUBMODULES:
        importlib.import_module(name)
    from ray import cloudpickle

    for name, mod in list(sys.modules.items()):
        if name == "raylink" or name.startswith("raylink."):
            try:
                cloudpickle.register_pickle_by_value(mod)
            except Exception:
                pass
