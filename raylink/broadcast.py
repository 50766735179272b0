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
_MAX_ENTRIES = 16
_MISSING = object()


def _cache_fetch(key, producer):
    """LRU fetch-or-produce: a hit moves the entry to the back, so a
    session cycling many broadcasts evicts the COLDEST entry — never the
    hot in-use index (a clear-all at the cap forced a mid-stage re-fetch
    and re-derivation of whatever was live). Sentinel-based presence test
    keeps legitimately-None broadcasts cached too."""
    obj = _BROADCAST_CACHE.pop(key, _MISSING)
    if obj is _MISSING:
        while len(_BROADCAST_CACHE) >= _MAX_ENTRIES:
            _BROADCAST_CACHE.pop(next(iter(_BROADCAST_CACHE)))
        obj = producer()
    _BROADCAST_CACHE[key] = obj  # (re)insert at the back = most recent
    return obj


def cached_object(ref):
    """Worker-global fetch-once for ray.put broadcasts referenced from task
    closures (a dict pickled into every task closure costs per-task; a ref
    + this cache costs once per worker)."""
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    return _cache_fetch(key, lambda: ray.get(ref))


def cached_derived(ref, fn, tag: str):
    """Worker-global cache of ``fn(ray.get(ref))`` — for broadcasts that
    need a once-per-worker derived form (e.g. arrow arrays -> numpy lookup
    arrays)."""
    key = ("derived", ref.hex() if hasattr(ref, "hex") else id(ref), tag)
    return _cache_fetch(key, lambda: fn(ray.get(ref)))
