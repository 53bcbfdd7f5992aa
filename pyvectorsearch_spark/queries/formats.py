"""Source/sink format coverage queries: JSONL round-trip with a declared
schema. The oracle runs on the original parquet view, so a hash match proves
the export → re-import path is value-faithful (ids, text, counts survive the
JSON representation bit-for-bit)."""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyvectorsearch_spark.sources.jsonl import read_jsonl, write_jsonl
from pyvectorsearch_spark.sources.tables import dataset_tag, load_table


def _jsonl_landing(spark: SparkSession, sf_dir: str, shards: int = 4) -> str:
    """Export documents to a sharded JSONL directory once per source
    SNAPSHOT (mtime-keyed, so regenerated testdata never serves a stale
    export; atomically published like the streaming landing copies)."""
    return _landing(
        spark,
        sf_dir,
        "jsonl",
        lambda tmp: write_jsonl(
            load_table(spark, sf_dir, "documents"), tmp, shards=shards
        ),
    )


def q_jsonl_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → sharded JSONL → declared-schema read → per-(lang, source)
    rollup. Matching the parquet-side oracle proves the round trip loses
    nothing: same row count, same char sums, same id checksum."""
    docs = read_jsonl(spark, _jsonl_landing(spark, sf_dir))
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("doc_id").alias("id_checksum"),
            F.sum(F.length("text")).alias("text_chars"),
        )
        .orderBy("lang", "source")
    )


ORACLE_JSONL_ROUNDTRIP = """
SELECT lang, source, count(*) AS n_docs,
       sum(n_chars)::BIGINT AS total_chars,
       sum(doc_id)::BIGINT AS id_checksum,
       sum(length(text))::BIGINT AS text_chars
FROM documents
GROUP BY lang, source
ORDER BY lang, source
"""


def q_pyds_vectorgen_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource end to end: read the ``vectorgen`` format
    (one Spark task per declared partition), aggregate per label. Every cell
    is md5-derived, so the oracle REGENERATES the identical table in SQL —
    the source itself is hash-verified. (sf_dir unused: the source
    generates; parameters pinned below.)"""
    from pyvectorsearch_spark.sources.pyds import register

    register(spark)
    df = (
        spark.read.format("vectorgen")
        .option("n", 2000)
        .option("dim", 8)
        .option("parts", 16)
        .option("seed", "42")
        .load()
    )
    return (
        df.groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.sum("vec_id").alias("id_checksum"),
            F.round(F.min(F.element_at("embedding", 1)), 6).alias("min_e0"),
            F.round(F.max(F.element_at("embedding", 1)), 6).alias("max_e0"),
        )
        .orderBy("label")
    )


def _h48(key: str) -> str:
    return f"('0x' || substr(md5({key}), 1, 12))::BIGINT"


ORACLE_PYDS_VECTORGEN = f"""
WITH g AS (
  SELECT i AS vec_id,
         ({_h48("'42:' || i || ':0'")} % 1000000) / 1000000.0 AS e0,
         ({_h48("'42:' || i || ':label'")} % 10)::INT AS label
  FROM (SELECT unnest(range(0, 2000)) AS i)
)
SELECT label, count(*) AS n, sum(vec_id)::BIGINT AS id_checksum,
       round(min(e0), 6) AS min_e0, round(max(e0), 6) AS max_e0
FROM g GROUP BY label ORDER BY label
"""


def _landing(spark: SparkSession, sf_dir: str, kind: str, write) -> str:
    """Snapshot-keyed landing directory (mtime in the key — regenerated
    testdata never serves a stale export; atomically published)."""
    base = dataset_tag(sf_dir, "documents")
    path = os.path.join(tempfile.gettempdir(), f"pvs_docs_{kind}_{base}")
    if not os.path.isdir(path):
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        write(tmp)
        try:
            os.rename(tmp, path)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.isdir(path):
                raise
    return path


def q_orc_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → ORC (Spark's built-in columnar alternative to parquet) →
    read back → per-source rollup. The oracle runs on the original parquet
    view, so a hash match proves the ORC writer/reader pair is
    value-faithful."""
    path = _landing(
        spark,
        sf_dir,
        "orc",
        lambda tmp: load_table(spark, sf_dir, "documents")
        .repartition(4)
        .write.orc(tmp),
    )
    docs = spark.read.orc(path)
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("doc_id").alias("id_checksum"),
            F.sum(F.length("text")).alias("text_chars"),
        )
        .orderBy("source")
    )


ORACLE_ORC_ROUNDTRIP = """
SELECT source, count(*) AS n_docs,
       sum(n_chars)::BIGINT AS total_chars,
       sum(doc_id)::BIGINT AS id_checksum,
       sum(length(text))::BIGINT AS text_chars
FROM documents
GROUP BY source
ORDER BY source
"""


PRUNE_SOURCES = ["src3", "src7"]


def partitioned_docs_landing(spark: SparkSession, sf_dir: str) -> str:
    """documents written as hive-partitioned parquet (partitionBy source) —
    the standard 100 TB sink layout that lets every downstream filter on the
    partition key skip directories instead of reading the corpus."""
    return _landing(
        spark,
        sf_dir,
        "part",
        lambda tmp: load_table(spark, sf_dir, "documents")
        .write.partitionBy("source")
        .parquet(tmp),
    )


def q_partition_prune_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruned read over the partitioned landing: filter on the
    partition key, per-(source, lang) rollup. The companion plan test pins
    that the scan carries PartitionFilters (directory skipping), and the
    oracle hash match proves pruning loses no rows."""
    docs = spark.read.parquet(partitioned_docs_landing(spark, sf_dir))
    return (
        docs.filter(F.col("source").isin(PRUNE_SOURCES))
        .groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("doc_id").alias("id_checksum"),
        )
        .orderBy("source", "lang")
    )


_PRUNE_IN = ", ".join(f"'{s}'" for s in PRUNE_SOURCES)

ORACLE_PARTITION_PRUNE = f"""
SELECT source, lang, count(*) AS n_docs,
       sum(n_chars)::BIGINT AS total_chars,
       sum(doc_id)::BIGINT AS id_checksum
FROM documents
WHERE source IN ({_PRUNE_IN})
GROUP BY source, lang
ORDER BY source, lang
"""


def q_csv_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → CSV (header + full quoting, the reference's native
    format — its only source is a CSV scan, `/root/reference/example_cpp/
    main.cpp:16-41`) → declared-schema read back → rollup. Matching the
    parquet-side oracle proves the CSV writer/reader pair survives quoting
    and type round-trips (ints, free text) bit-for-bit."""
    from pyspark.sql import types as T

    path = _landing(
        spark,
        sf_dir,
        "csv",
        lambda tmp: load_table(spark, sf_dir, "documents")
        .repartition(4)
        .write.option("header", True)
        .option("quoteAll", True)
        .csv(tmp),
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    docs = spark.read.csv(path, header=True, schema=schema)
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
            F.sum(F.length("text")).cast("bigint").alias("text_chars"),
            F.sum(F.length("lang")).cast("bigint").alias("lang_chars"),
        )
        .orderBy("source")
    )


ORACLE_CSV_ROUNDTRIP = """
SELECT source, count(*) AS n_docs,
       sum(n_chars)::BIGINT AS total_chars,
       sum(doc_id)::BIGINT AS id_checksum,
       sum(length(text))::BIGINT AS text_chars,
       sum(length(lang))::BIGINT AS lang_chars
FROM documents
GROUP BY source ORDER BY source
"""




def _evolution_landing(spark: SparkSession, sf_dir: str) -> str:
    """Two-generation parquet landing for schema-evolution reads: writer v1
    lands (doc_id, source, n_chars); writer v2 adds a ``lang`` column —
    the additive-column upgrade every long-lived dataset goes through."""

    def write(tmp: str) -> None:
        docs = load_table(spark, sf_dir, "documents")
        v1 = docs.filter(F.col("doc_id") % 2 == 0).select(
            "doc_id", "source", "n_chars"
        )
        v2 = docs.filter(F.col("doc_id") % 2 == 1).select(
            "doc_id", "source", "n_chars", "lang"
        )
        v1.write.parquet(f"{tmp}/gen=1")
        v2.write.parquet(f"{tmp}/gen=2")

    return _landing(spark, sf_dir, "evolution", write)


def q_schema_evolution_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read: two parquet generations (v2 adds ``lang``)
    scanned in ONE read with ``mergeSchema`` — old files surface NULL for
    the new column (no rewrite of historical data, the additive-evolution
    contract). Rollup per source: row counts, and lang presence split by
    generation proves old rows got NULLs and new rows kept values."""
    d = (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(_evolution_landing(spark, sf_dir))
    )
    return (
        d.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.when(F.col("lang").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_old_schema"),
            F.sum(F.when(F.col("lang").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_new_schema"),
            F.sum(F.length("lang")).cast("bigint").alias("lang_chars"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
        )
        .orderBy("source")
    )


ORACLE_SCHEMA_EVOLUTION = """
SELECT source, count(*)::BIGINT AS n_rows,
       sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_old_schema,
       sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS n_new_schema,
       sum(CASE WHEN doc_id % 2 = 1 THEN length(lang) ELSE NULL END)::BIGINT AS lang_chars,
       sum(doc_id)::BIGINT AS id_checksum
FROM documents
GROUP BY source ORDER BY source
"""


def q_nested_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-type round trip: orders denormalized to one row per order
    with an ARRAY OF STRUCTS of its line items (sorted by linenumber) →
    parquet → read back → explode → rollup. A hash match against the flat
    lineitem oracle proves the nested encode/decode loses nothing — the
    document-shaped layout (order + items) every log/event pipeline uses."""

    def write(tmp: str) -> None:
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey",
            F.struct(
                "l_linenumber", "l_quantity", "l_extendedprice"
            ).alias("_item"),
        )
        nested = li.groupBy("l_orderkey").agg(
            F.array_sort(F.collect_list("_item")).alias("items")
        )
        nested.write.parquet(tmp)

    path = _landing(spark, sf_dir, "nested", write)
    n = spark.read.parquet(path)
    ex = n.select(
        "l_orderkey", F.explode("items").alias("it")
    ).select("l_orderkey", "it.*")
    return ex.agg(
        F.count("*").cast("bigint").alias("n_lines"),
        F.countDistinct("l_orderkey").cast("bigint").alias("n_orders"),
        F.sum("l_quantity").cast("bigint").alias("qty_sum"),
        F.round(F.sum("l_extendedprice"), 2).alias("price_sum"),
        F.sum(F.col("l_orderkey") * F.col("l_linenumber"))
        .cast("bigint")
        .alias("cross_checksum"),
    )


ORACLE_NESTED_ROUNDTRIP = """
SELECT count(*)::BIGINT AS n_lines,
       count(DISTINCT l_orderkey)::BIGINT AS n_orders,
       sum(l_quantity)::BIGINT AS qty_sum,
       round(sum(l_extendedprice), 2) AS price_sum,
       sum(l_orderkey * l_linenumber)::BIGINT AS cross_checksum
FROM lineitem
"""



QUERIES = {
    "schema_evolution_stats": q_schema_evolution_stats,
    "nested_roundtrip_stats": q_nested_roundtrip_stats,
    "jsonl_roundtrip_stats": q_jsonl_roundtrip_stats,
    "pyds_vectorgen_stats": q_pyds_vectorgen_stats,
    "orc_roundtrip_stats": q_orc_roundtrip_stats,
    "partition_prune_stats": q_partition_prune_stats,
    "csv_roundtrip_stats": q_csv_roundtrip_stats,
}
ORACLES = {
    "schema_evolution_stats": ORACLE_SCHEMA_EVOLUTION,
    "nested_roundtrip_stats": ORACLE_NESTED_ROUNDTRIP,
    "jsonl_roundtrip_stats": ORACLE_JSONL_ROUNDTRIP,
    "pyds_vectorgen_stats": ORACLE_PYDS_VECTORGEN,
    "orc_roundtrip_stats": ORACLE_ORC_ROUNDTRIP,
    "partition_prune_stats": ORACLE_PARTITION_PRUNE,
    "csv_roundtrip_stats": ORACLE_CSV_ROUNDTRIP,
}
