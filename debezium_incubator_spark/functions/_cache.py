"""Scoped persists for self-join intermediates.

The dedup/ANN operators persist a slim intermediate that feeds both
sides of a self-join (signatures, fingerprints, inverted index). A bare
``persist()`` registers the plan in Spark's CacheManager, which holds a
strong reference for the session lifetime — callers running many queries
in one session would accumulate storage blocks unboundedly.

``finalize`` scopes the cache to the call: it materializes the (small)
result eagerly via ``localCheckpoint`` — whose blocks ARE released by the
ContextCleaner once the result DataFrame is garbage collected, unlike
CacheManager entries — then unpersists the intermediates immediately.

``eager=False`` restores full laziness (plan inspection, or outputs too
large to materialize — e.g. a 100 TB-corpus pair listing that should
stream straight into a writer); callers then own the cache lifetime and
should ``spark.catalog.clearCache()`` when done.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def finalize(result: DataFrame, cached: list[DataFrame], eager: bool = True) -> DataFrame:
    if not eager:
        return result
    out = result.localCheckpoint(eager=True)
    for d in cached:
        d.unpersist(blocking=False)
    return out


def scoped(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize a multiply-referenced self-join INTERMEDIATE (the slim
    side: inverted index, signatures, fingerprints) instead of the
    operator's result.

    ``eager=True`` → ``localCheckpoint(eager)``: the pipeline above it
    runs exactly once, the blocks are ContextCleaner-released on GC (no
    CacheManager entry to leak), and the operator's RESULT stays lazy —
    one downstream action computes it once, and a result that is itself
    large (a near-copy corpus's pair listing) is never force-
    materialized the way ``finalize`` did.

    ``eager=False`` → plain ``persist``: the full lineage stays
    inspectable in the lazy plan; the caller owns cache cleanup
    (``spark.catalog.clearCache()``), matching ``finalize``'s opt-out."""
    if eager:
        return df.localCheckpoint(eager=True)
    from pyspark import StorageLevel

    return df.persist(StorageLevel.MEMORY_AND_DISK)
