"""Deterministic Bloom-filter semi-join reduction — the runtime-filter
technique Spark's own bloom runtime filters apply, made explicit and
engine-deterministic (md5-derived bit positions instead of xxhash, so the
filter and its false positives are bit-identical across engines and the
whole pre-filter is oracle-checkable).

Scale rationale: a selective dimension can prune most of a fact scan BEFORE
the join shuffle. The filter itself is tiny (2^16 bits = 8 KB here) and is
embedded as a LITERAL array in the probe projection — the fact side is
filtered with ZERO additional shuffle or join; only survivors reach the
exact semi join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_BITS = 1 << 16
WORD_BITS = 32  # positive range in both engines' signed arithmetic
N_WORDS = BLOOM_BITS // WORD_BITS
N_HASHES = 3


def _positions(key: Column) -> list[Column]:
    """k deterministic bit positions: md5(i || ':' || key) mod bits."""
    return [
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{i}:"), key.cast("string"))), 1, 12),
            16,
            10,
        ).cast("bigint")
        % BLOOM_BITS
        for i in range(N_HASHES)
    ]


def duckdb_positions(key_expr: str) -> list[str]:
    return [
        f"(('0x' || substr(md5('{i}:' || CAST({key_expr} AS VARCHAR)), 1, 12))"
        f"::BIGINT % {BLOOM_BITS})"
        for i in range(N_HASHES)
    ]


def bloom_build(dim: DataFrame, key_col: str) -> list[int]:
    """Aggregate the dimension's keys into a dense word array (driver-side
    list of N_WORDS 32-bit ints, ~8 KB — the broadcast-literal footprint).
    One map-side-combined groupBy over (key x N_HASHES) positions."""
    pos = dim.select(
        F.explode(F.array(*_positions(F.col(key_col)))).alias("p")
    )
    words = (
        pos.select(
            (F.col("p") / WORD_BITS).cast("int").alias("w"),
            # shiftleft needs a literal count; 2^bit is exact in double
            # for bit < 32 and casts back to bigint losslessly
            F.pow(F.lit(2.0), (F.col("p") % WORD_BITS).cast("int"))
            .cast("bigint")
            .alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("word"))
        .collect()
    )
    dense = [0] * N_WORDS
    for r in words:
        dense[r["w"]] = r["word"]
    return dense


def bloom_might_contain(key: Column, words: list[int]) -> Column:
    """Membership test as a pure projection over the literal word array:
    all k bit positions set => candidate (false positives possible, false
    negatives impossible)."""
    arr = F.array(*[F.lit(w).cast("bigint") for w in words])
    cond = F.lit(True)
    for p in _positions(key):
        word = F.element_at(arr, (p / WORD_BITS).cast("int") + 1)
        bit = F.pow(F.lit(2.0), (p % WORD_BITS).cast("int")).cast("bigint")
        cond = cond & (word.bitwiseAND(bit) != 0)
    return cond
