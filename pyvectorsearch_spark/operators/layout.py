"""Data-layout operators: Z-order (Morton) interleaving for multi-column
data skipping (north-star extension — the 100 TB companion to partitioning:
sorting a table by a Z-key clusters rows so per-file min/max ranges on EVERY
interleaved dimension stay tight, and format-level zone maps can skip files
for predicates on any of them; cf. the layout optimizers in Delta/Iceberg
OPTIMIZE ZORDER).

The key is a pure integer expression (bit interleave of fixed-width column
codes) — engine-exact, zero shuffle to compute; the one shuffle in a re-layout
job is the global range-sort by the key, which is exactly the shuffle any
sort-based layout pays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list[Column], *, bits: int = 16) -> Column:
    """Morton/Z-order key: interleave the low ``bits`` bits of each column
    (callers pre-scale values into [0, 2^bits)). For d columns the key has
    d*bits bits — keep d*bits <= 62 so the BIGINT stays exact.

    Bit i of column j lands at position i*d + j. Closed-form integer
    expression: sum over (i, j) of ((col_j >> i) & 1) << (i*d + j).
    """
    d = len(cols)
    if d < 1:
        raise ValueError("need at least one column")
    if d * bits > 62:
        raise ValueError(f"{d} cols x {bits} bits exceeds 62-bit exact range")
    terms = []
    for j, c in enumerate(cols):
        v = c.cast("bigint")
        for i in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(v, i).bitwiseAND(F.lit(1)), i * d + j)
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def duckdb_zorder(cols: list[str], *, bits: int = 16) -> str:
    """DuckDB twin of :func:`zorder_key` — same bit placement."""
    d = len(cols)
    terms = []
    for j, c in enumerate(cols):
        for i in range(bits):
            terms.append(f"((({c}::BIGINT >> {i}) & 1) << {i * d + j})")
    return " + ".join(terms)


def zorder_layout_stats(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 10,
    file_bits: int = 4,
) -> DataFrame:
    """Simulate a Z-order re-layout: cut the key space into ``2^file_bits``
    Z-RANGE files (the top ``file_bits`` bits of the Morton key — the cuts a
    value-range layout optimizer writes) and report each file's
    per-dimension min/max span: the zone-map ranges a scan would prune
    with. Tight spans on every dimension = effective multi-column skipping.

    Deliberately value-range cuts, not equal-count cuts: the file id is then
    a pure projection (zero extra shuffle, no global rank — an exact
    equal-count cut needs a single-task row_number over the corpus, which is
    precisely the plan shape a 100 TB layout job must avoid; production
    optimizers use range boundaries from a sample for the same reason).

    Returns (file_id, n_rows, and min_/max_ per dimension) — one
    map-side-combined aggregation over the scan."""
    z = zorder_key([F.col(c) for c in cols], bits=bits)
    file_id = F.shiftright(z, len(cols) * bits - file_bits).cast("int")
    aggs = []
    for c in cols:
        aggs += [
            F.min(c).cast("bigint").alias(f"min_{c}"),
            F.max(c).cast("bigint").alias(f"max_{c}"),
        ]
    return (
        df.select(*cols)
        .groupBy(file_id.alias("file_id"))
        .agg(F.count("*").cast("bigint").alias("n_rows"), *aggs)
        .orderBy("file_id")
    )


def hrw_assign(
    df,
    *,
    id_col: str = "doc_id",
    n_nodes: int = 8,
    salt: str = "hrw-v1",
):
    """Rendezvous (highest-random-weight) assignment: each key goes to the
    node with the highest md5(salt#node#id) score (Thaler–Ravishankar
    1996). Returns ``df`` with an added ``node`` column.

    THE property that justifies HRW over mod-N: removing node X remaps
    ONLY the keys that were on X (every other key's argmax is unchanged —
    its winning node still scores the same), so a topology change moves
    1/N of the data instead of (N−1)/N. Pinned by a property test.

    Scale: the node axis is an n_nodes-row broadcast fan-out; the argmax
    is a per-key window over n_nodes rows — no shuffle of the data beyond
    the id-keyed window."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark = df.sparkSession
    nodes = spark.range(n_nodes).select(F.col("id").cast("int").alias("node"))
    score = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(salt + "#"),
                    F.col("node").cast("string"),
                    F.lit("#"),
                    F.col(id_col).cast("string"),
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("bigint")
    scored = df.crossJoin(F.broadcast(nodes)).withColumn("_s", score)
    w = Window.partitionBy(id_col).orderBy(F.desc("_s"), F.asc("node"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_s", "_rk")
    )
