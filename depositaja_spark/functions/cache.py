"""Tracked persist: cache lifecycle for operator-internal intermediates.

Several operators persist an intermediate frame that feeds multiple
consumers inside ONE returned plan (shared shingle frames in dedup, the
IVF assignment, connected-components frontiers).  The persist must outlive
the function — the returned DataFrame is lazy and the cache is only read
when the caller materializes it — so the functions themselves cannot
unpersist.  Left alone, repeated invocations in a long session accumulate
cached state until executor LRU eviction.

``tracked_persist`` registers every such frame; ``release_caches()`` drops
them all.  Callers that materialize a result and are done with it (bench
loops, tests, batch jobs) call ``release_caches()`` between queries; a
caller that wants to keep reusing a returned plan simply doesn't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []

#: (SparkContext, rdd-id) pairs for pinned blocks that have no DataFrame
#: handle — the final-round localCheckpoint blocks iterative operators
#: (connected components, k-core, pagerank) leave for their caller.
#: ``release_caches`` retires these too, so "call release_caches between
#: queries" is the whole cache-hygiene contract for library users.
_TRACKED_RDDS: list[tuple[object, int]] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() + register for a later bulk ``release_caches()``."""
    df.persist()
    _TRACKED.append(df)
    return df


def track_pinned_rdds(sc, ids: set) -> None:
    """Register already-pinned RDD ids (localCheckpoint blocks) for the
    next ``release_caches()`` sweep."""
    for rid in ids:
        _TRACKED_RDDS.append((sc, int(rid)))


def untrack(df: DataFrame) -> None:
    """Unpersist one frame eagerly (used by loops that retire a frontier
    mid-algorithm) and forget it."""
    try:
        df.unpersist()
    finally:
        try:
            _TRACKED.remove(df)
        except ValueError:
            pass


def release_caches() -> int:
    """Unpersist every tracked frame AND every tracked pinned RDD
    (final-round checkpoint blocks); returns how many were released."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    while _TRACKED_RDDS:
        sc, rid = _TRACKED_RDDS.pop()
        try:
            unpersist_rdd_ids(sc, {rid})
            n += 1
        except Exception:
            pass
    return n


def pinned_rdd_ids(sc) -> set:
    """Ids of every RDD currently pinned in executor storage (persisted
    caches AND localCheckpoint blocks).  Used by iterative operators to
    diff-and-retire the previous round's checkpoint blocks — DataFrames
    expose no handle on the checkpointed internal RDD, so retired blocks
    are found by diffing this set around each checkpoint (rounds are
    driver-sequential, so the diff is exact)."""
    return {int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()}


def unpersist_rdd_ids(sc, ids: set) -> None:
    """Release the given pinned RDDs (non-blocking)."""
    jmap = sc._jsc.getPersistentRDDs()
    for rid in ids:
        jrdd = jmap.get(rid)
        if jrdd is not None:
            jrdd.unpersist(False)
