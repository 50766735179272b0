"""raylink — a Ray-Data-native record-linkage engine.

Recreates the match-then-group semantics of MaartenGr/PolyFuzz v0.4.3
(reference at /root/reference, cited per-function as file:line) as a
from-scratch Ray Data pipeline: blocking, pairwise scoring over zero-copy
Arrow batches with actor pools, and transitive clustering that replays the
reference's order-sensitive single-linkage exactly per block.

Layers:
  * kernels  — pure numpy/pyarrow re-implementations of every scoring kernel
               the reference delegates to sklearn / sparse_dot_topn /
               rapidfuzz (none of which are installed here):
               ``text``, ``tfidf``, ``editdist``, ``embed``, ``linkage``,
               ``metrics``.
  * local    — ``raylink.local.PolyMatch``: single-node driver API mirroring
               ``polyfuzz.PolyFuzz`` (match / fit / transform / group); used
               as the reference-semantics oracle in tests.
  * ray      — ``raylink.pipeline`` / ``raylink.blocking``: the distributed
               engine (Dataset -> Dataset stages).
"""

from raylink.local import PolyMatch
from raylink.matchers import (
    BaseMatcher,
    EditDistanceMatcher,
    EmbeddingMatcher,
    RapidFuzzMatcher,
    TFIDFMatcher,
)

__version__ = "0.1.0"

__all__ = [
    "PolyMatch",
    "BaseMatcher",
    "TFIDFMatcher",
    "RapidFuzzMatcher",
    "EditDistanceMatcher",
    "EmbeddingMatcher",
]
