"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` is the smoke check; ``queries()`` / ``oracle_sql()`` feed the
DuckDB-oracle correctness gate at sf=0.01 (row-count + schema +
order-insensitive value-hash). The implementations live in
``pyvectorsearch_spark.queries.*``; this module only aggregates them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: batch exact k-NN join (the reference's core operation,
    ``/root/reference/include/pktree.hpp:948-973``) on sf0.001."""
    from pyvectorsearch_spark.queries.vector import q_knn_bruteforce

    return q_knn_bruteforce(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from pyvectorsearch_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents, keyed like ``queries()``."""
    from pyvectorsearch_spark.queries import all_oracles

    return all_oracles()
