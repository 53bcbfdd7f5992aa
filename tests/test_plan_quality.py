"""Plan-shape assertions: pushdown, pruning, broadcast choice, shuffle
counts. These are the 100 TB contract — a correct plan with the wrong shape
fails here before it fails in production."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyvectorsearch_spark.plans import (
    count_exchanges,
    explain_str,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
)
from pyvectorsearch_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_filter_pushdown_reaches_scan(spark):
    df = (
        load_table(spark, SF_SMOKE, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_totalprice")
    )
    pf = pushed_filters(df)
    assert any("o_orderstatus" in f for f in pf), pf


def test_column_pruning_reaches_scan(spark):
    df = load_table(spark, SF_SMOKE, "lineitem").select("l_orderkey", "l_quantity")
    scans = read_schema_columns(df)
    assert scans and scans[0] == {"l_orderkey", "l_quantity"}, scans


def test_small_dim_join_broadcasts(spark):
    nation = load_table(spark, SF_SMOKE, "nation")
    customer = load_table(spark, SF_SMOKE, "customer")
    j = customer.join(nation, customer.c_nationkey == nation.n_nationkey)
    assert has_broadcast_join(j)
    assert count_exchanges(j) == 0  # broadcast join: no shuffle exchange


def test_knn_bruteforce_single_shuffle(spark):
    """The kNN join must shuffle only the tiny candidate set (one exchange
    for the per-query window), never the full pair space."""
    from pyvectorsearch_spark.queries.vector import q_knn_bruteforce

    df = q_knn_bruteforce(spark, SF_SMOKE)
    assert count_exchanges(df) <= 2, explain_str(df)[:2000]


def test_agg_has_partial_mapside(spark):
    """groupBy sum compiles to partial + final HashAggregate around one
    exchange — map-side combine is what keeps 100 TB aggs shuffle-light."""
    df = (
        load_table(spark, SF_SMOKE, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity"))
    )
    s = explain_str(df)
    assert s.count("HashAggregate") >= 2
    assert count_exchanges(df) == 1
