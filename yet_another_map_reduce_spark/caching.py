"""Operator-owned cache lifecycle.

Several operators cache an intermediate relation that their returned
(lazy) DataFrame consumes more than once — tfidf's term frequencies,
bigram/PMI tokenizations, BM25 lengths, pagerank's edges/degrees,
semantic-dedup cluster assignments, funnel events, and the per-query
corpus caches in queries.py.  The operator cannot unpersist inside
itself (the consumer has not run yet), and a long-lived session that
invokes these operators repeatedly would otherwise accumulate
InMemoryRelations until LRU eviction churns storage memory.

``tracked_cache`` is the single chokepoint: it caches the relation and
records it so ``release_operator_caches()`` can unpersist everything an
operator ever cached — the explicit release handle for long-lived
sessions (call it between logical jobs; it never touches caches the
USER created directly, unlike ``spark.catalog.clearCache()``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_TRACKED: list[DataFrame] = []


def tracked_cache(
    df: DataFrame, level: StorageLevel | None = None
) -> DataFrame:
    """``df.cache()`` (or ``persist(level)``) plus lifecycle tracking."""
    out = df.persist(level) if level is not None else df.cache()
    _TRACKED.append(out)
    return out


def release_operator_caches() -> int:
    """Unpersist every operator-tracked cached relation; returns how
    many were released.  Blocking=False: eviction proceeds async, new
    jobs simply recompute."""
    global _TRACKED
    released = 0
    for df in _TRACKED:
        try:
            df.unpersist()
            released += 1
        except Exception:
            pass  # session already stopped — nothing to release
    _TRACKED = []
    return released


def tracked_count() -> int:
    return len(_TRACKED)
