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
from pyvectorsearch_spark.sources.tables import load_table


def _jsonl_landing(spark: SparkSession, sf_dir: str, shards: int = 4) -> str:
    """Export documents to a sharded JSONL directory once per sf dir
    (atomically published, same pattern as the streaming landing copies)."""
    base = os.path.basename(sf_dir.rstrip("/"))
    path = os.path.join(tempfile.gettempdir(), f"pvs_docs_jsonl_{base}")
    if not os.path.isdir(path):
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        write_jsonl(load_table(spark, sf_dir, "documents"), tmp, shards=shards)
        try:
            os.rename(tmp, path)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.isdir(path):
                raise
    return path


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


QUERIES = {"jsonl_roundtrip_stats": q_jsonl_roundtrip_stats}
ORACLES = {"jsonl_roundtrip_stats": ORACLE_JSONL_ROUNDTRIP}
