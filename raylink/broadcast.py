"""Worker-global broadcast caches for ``ray.put`` objects.

A dict or numpy array pickled into every task closure costs once per TASK;
a ``ray.put`` ref + these caches cost once per WORKER (the numpy buffers
inside are plasma-shared zero-copy; only small object-dtype parts
deserialize). Every worker-executed raylink closure that references a
broadcast follows this pattern — closure-captured arrays >= ~1 MB are a
banned anti-pattern (CLAUDE.md landmark; VERDICT r2 #4).
"""

from __future__ import annotations

import ray

_BROADCAST_CACHE: dict = {}


def cached_object(ref):
    """Worker-global fetch-once for ray.put broadcasts referenced from task
    closures (a dict pickled into every task closure costs per-task; a ref
    + this cache costs once per worker)."""
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    obj = _BROADCAST_CACHE.get(key)
    if obj is None:
        if len(_BROADCAST_CACHE) > 16:
            _BROADCAST_CACHE.clear()
        obj = ray.get(ref)
        _BROADCAST_CACHE[key] = obj
    return obj


def cached_derived(ref, fn, tag: str):
    """Worker-global cache of ``fn(ray.get(ref))`` — for broadcasts that
    need a once-per-worker derived form (e.g. arrow arrays -> numpy lookup
    arrays)."""
    key = ("derived", ref.hex() if hasattr(ref, "hex") else id(ref), tag)
    obj = _BROADCAST_CACHE.get(key)
    if obj is None:
        if len(_BROADCAST_CACHE) > 16:
            _BROADCAST_CACHE.clear()
        obj = fn(ray.get(ref))
        _BROADCAST_CACHE[key] = obj
    return obj
