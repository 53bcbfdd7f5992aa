"""Bounded persist pool — persist() without the session-lifetime leak.

Query functions persist intermediate tables (the NB (doc, term, tf)
reduction, the GD margin table) because several downstream legs re-read
them inside one action. But the query functions return lazy DataFrames,
so there is no in-function point where "the consuming aggregates are
done" — an unpersist() before return would defeat the cache. Left alone,
every invocation in a long-lived session (the 350-query parity sweep,
repeated bench runs) leaks one cached DataFrame into storage memory
(ADVICE r6).

`pooled_persist` keeps a bounded FIFO of live handles: persisting a new
DataFrame evicts the oldest beyond POOL_LIMIT. Queries run sequentially
in the sweep/bench/driver harnesses, so by the time a new query persists
its table, prior queries' results have been collected and their caches
are dead weight. Unpersist is correctness-neutral regardless — Spark
recomputes evicted partitions from lineage — so a rare overlapping
re-collect only costs time, never accuracy.

Same-plan hazard (r11): Spark's CacheManager keeps ONE entry per
canonical plan, so persisting a DataFrame whose plan matches an entry
still in the pool would create a second handle over the SAME entry —
and the FIFO's later unpersist of the older handle would kill the cache
out from under the newer one, turning every downstream leg into a full
recompute (measured: a repeat text_lr_calibrate invocation went
27.3 s vs 2 s, ~500 one-task recompute stages). `pooled_persist` now
detects the match with `sameSemantics` and refreshes the existing
handle's FIFO position instead of re-persisting.
"""
from __future__ import annotations

from pyspark.sql import DataFrame

POOL_LIMIT = 4

_POOL: list[DataFrame] = []


def pooled_persist(df: DataFrame) -> DataFrame:
    """persist() `df` (or adopt the pooled cache entry that already covers
    this exact plan) and evict the oldest pooled handles beyond
    POOL_LIMIT (non-blocking). Returns `df` for chaining."""
    for i, old in enumerate(_POOL):
        try:
            match = old.sameSemantics(df)
        except Exception:
            match = False
        if match:
            # one CacheManager entry per canonical plan: refresh its FIFO
            # position; the entry applies to `df` automatically at exec
            _POOL.append(_POOL.pop(i))
            return df
    df = df.persist()
    _POOL.append(df)
    while len(_POOL) > POOL_LIMIT:
        old = _POOL.pop(0)
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass  # session torn down between queries — nothing to free
    return df


def drain_pool() -> None:
    """Unpersist everything in the pool (test hook / session teardown)."""
    while _POOL:
        old = _POOL.pop()
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass
    return None
