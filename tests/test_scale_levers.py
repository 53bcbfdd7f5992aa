"""Bucketing and salting: the plan-level proof that the levers work —
bucketed joins run with zero shuffle Exchanges; salted two-phase aggregation
returns exactly the plain groupBy answer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyvectorsearch_spark.plans import count_exchanges
from pyvectorsearch_spark.plans.scale import bucketed_write, two_phase_agg
from pyvectorsearch_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # tables land in the session's default warehouse (./spark-warehouse,
    # gitignored); dropped on teardown
    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem")
    bucketed_write(
        orders, "orders_b", keys=["o_orderkey"], n_buckets=8, sort_by=["o_orderkey"]
    )
    bucketed_write(
        lineitem,
        "lineitem_b",
        keys=["l_orderkey"],
        n_buckets=8,
        sort_by=["l_orderkey"],
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_no_shuffle(spark, bucketed_tables):
    ot, lt = bucketed_tables
    o = spark.table(ot)
    li = spark.table(lt)
    # disable broadcast so the join must co-locate — bucketing provides it
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = o.join(li, o.o_orderkey == li.l_orderkey).select(
            "o_orderkey", "l_quantity"
        )
        assert count_exchanges(j) == 0
        unbucketed = load_table(spark, SF_SMOKE, "orders").join(
            load_table(spark, SF_SMOKE, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        assert count_exchanges(unbucketed) >= 2
        # same answer as the unbucketed join
        assert j.count() == unbucketed.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_two_phase_agg_matches_plain(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    salted = two_phase_agg(
        li,
        ["l_returnflag"],
        {
            "n": ("count", "l_quantity"),
            "total_qty": ("sum", "l_quantity"),
            "min_qty": ("min", "l_quantity"),
            "max_qty": ("max", "l_quantity"),
        },
        n_salts=8,
    )
    plain = li.groupBy("l_returnflag").agg(
        F.count("l_quantity").alias("n"),
        F.sum("l_quantity").alias("total_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )
    s = {tuple(r) for r in salted.collect()}
    p = {tuple(r) for r in plain.collect()}
    assert s == p


def test_two_phase_rejects_non_reaggregable(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    with pytest.raises(ValueError):
        two_phase_agg(li, ["l_returnflag"], {"a": ("avg", "l_quantity")})
