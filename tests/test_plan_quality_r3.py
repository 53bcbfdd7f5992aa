"""Plan-shape pins for the round-3 curation/monitoring operators — the
100 TB contract: histogram-sized shuffles stay histogram-sized, projections
stay shuffle-free, partial aggregation stays map-side."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyvectorsearch_spark.operators.layout import zorder_layout_stats
from pyvectorsearch_spark.operators.quality import psi_drift
from pyvectorsearch_spark.operators.textops import c4_line_filter, top_terms
from pyvectorsearch_spark.plans import count_exchanges, explain_str
from pyvectorsearch_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_c4_line_filter_zero_shuffle(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    df = c4_line_filter(docs)
    assert count_exchanges(df) == 0, explain_str(df)[:1500]


def test_top_terms_partial_agg_before_shuffle(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    df = top_terms(docs, by="source", k=5)
    s = explain_str(df)
    # the token stream must collapse map-side: a partial count precedes the
    # exchange, so only (group, term, partial-count) rows move
    assert "partial_count" in s or "partial count" in s.lower(), s[:1500]
    assert count_exchanges(df) <= 2, s[:1500]


def test_psi_histogram_sized_shuffles(spark):
    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "_cur", F.dayofmonth("ts") >= 16
    )
    df = psi_drift(
        ev, by="event_type", value_col="value", split_col="_cur", bucket_width=25.0
    )
    # histogram groupBy + window over the histogram + final groupBy: every
    # post-scan exchange moves <= groups x buckets rows
    assert count_exchanges(df) <= 3, explain_str(df)[:1500]


def test_zorder_stats_single_agg_exchange(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        (F.col("l_partkey") % 1024).alias("x"),
        (F.col("l_suppkey") % 1024).alias("y"),
    )
    df = zorder_layout_stats(li, ["x", "y"], bits=10, file_bits=4)
    s = explain_str(df)
    # value-range file cuts: the file id is a projection, so the only
    # exchanges are the agg shuffle and the output sort
    assert count_exchanges(df) <= 2, s[:1500]
    assert "partial" in s.lower(), s[:1500]
