"""UDF / UDAF / UDTF surface (SURVEY.md §2.4, absent in the reference —
its only extension point is C++ template generics,
``/root/reference/include/pktree.hpp:43,1362-1381``).

Policy stays "native expressions first" (the hot paths in ``functions/`` and
``operators/`` never use row-at-a-time Python); these queries pin the three
EXTENSION points a user of the engine gets, each Arrow-batched and each with
an exact DuckDB oracle:

- scalar pandas UDF (vectorized, JVM↔Arrow batch transfer)
- grouped-aggregate pandas UDF (a real UDAF)
- Python UDTF (table function, lateral-joined in SQL)
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyvectorsearch_spark.sources.tables import load_table


def udaf_geomean_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF (UDAF): geometric mean of extended price per
    return flag, plus a scalar pandas UDF (log1p) aggregated the native way.
    Oracle: exp(avg(ln x)) — identical math, 6 dp. (UDFs are defined inside
    the function: pandas_udf parses its DDL type against the ACTIVE session,
    so module scope would break import-before-session.)"""

    @F.pandas_udf("double")
    def _log1p_price(v: pd.Series) -> pd.Series:
        return np.log1p(v)

    @F.pandas_udf("double")
    def _geomean(v: pd.Series) -> float:
        return float(np.exp(np.log(v).mean()))

    @F.pandas_udf("double")
    def _mean(v: pd.Series) -> float:
        return float(v.mean())

    @F.pandas_udf("long")
    def _count(v: pd.Series) -> int:
        return len(v)

    # Spark refuses to mix grouped-agg pandas UDFs with native aggregates
    # in one agg (INVALID_PANDAS_UDF_PLACEMENT) — all three go through the
    # UDAF path.
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.withColumn("lp", _log1p_price("l_extendedprice"))
        .groupBy("l_returnflag")
        .agg(
            F.round(_geomean("l_extendedprice"), 6).alias("geomean_price"),
            F.round(_mean("lp"), 6).alias("mean_log1p"),
            _count("lp").alias("n"),
        )
        .orderBy("l_returnflag")
    )


ORACLE_GEOMEAN = """
SELECT l_returnflag,
       round(exp(avg(ln(l_extendedprice))), 6) AS geomean_price,
       round(avg(ln(1 + l_extendedprice)), 6) AS mean_log1p,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def udtf_word_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF lateral-joined in SQL: one row per (position, token) of
    each document's first 8 tokens, then re-aggregated. Native ``explode``
    is the production path (see operators/dedup); this pins the UDTF
    extension point end-to-end. Oracle: unnest over string_split."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, word string")
    class HeadWords:
        def eval(self, text: str):
            if text is None:
                return
            words = [w for w in text.lower().split(" ") if w]
            for i, w in enumerate(words[:8]):
                yield i, w

    spark.udtf.register("head_words", HeadWords)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_docs_udtf")
    return spark.sql(
        """
        SELECT w.pos, count(*) AS n, min(w.word) AS first_word
        FROM _docs_udtf d, LATERAL head_words(d.text) w
        GROUP BY w.pos ORDER BY w.pos
        """
    )


ORACLE_UDTF_WORDS = """
WITH toks AS (
  SELECT list_filter(string_split(lower(text), ' '), x -> x <> '') AS lst
  FROM documents
), ex AS (
  SELECT CAST(i AS INT) - 1 AS pos, lst[CAST(i AS INT)] AS word
  FROM toks, LATERAL unnest(range(1, least(len(lst), 8) + 1)) AS t(i)
)
SELECT pos, count(*) AS n, min(word) AS first_word
FROM ex GROUP BY pos ORDER BY pos
"""


QUERIES = {
    "udaf_geomean_price": udaf_geomean_price,
    "udtf_head_words": udtf_word_rows,
}
ORACLES = {
    "udaf_geomean_price": ORACLE_GEOMEAN,
    "udtf_head_words": ORACLE_UDTF_WORDS,
}
