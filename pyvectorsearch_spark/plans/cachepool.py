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
"""
from __future__ import annotations

from pyspark.sql import DataFrame

POOL_LIMIT = 4

_POOL: list[DataFrame] = []


def pooled_persist(df: DataFrame) -> DataFrame:
    """persist() `df` and evict the oldest pooled handles beyond
    POOL_LIMIT (non-blocking). Returns `df` for chaining."""
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
