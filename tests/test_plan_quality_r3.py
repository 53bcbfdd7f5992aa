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


def test_radius_join_two_scan_exchanges_only(spark):
    """The ε-join shuffles each side once on the cell key — no extra
    exchanges, no cartesian (replication is an explode, not a join)."""
    from pyvectorsearch_spark.operators.spatial import radius_self_join

    emb = (
        load_table(spark, SF_SMOKE, "embeddings")
        .withColumn("p2", F.slice("embedding", 1, 2))
        .select("vec_id", "p2")
    )
    df = radius_self_join(emb, radius=0.02, dim=2, id_col="vec_id", vec_col="p2")
    s = explain_str(df)
    assert "CartesianProduct" not in s and "BroadcastNestedLoop" not in s
    from pyvectorsearch_spark.plans import count_exchanges

    assert count_exchanges(df) <= 2, s[:1500]


def test_boilerplate_single_reduced_shuffle(spark):
    """Docs reduce to one (group, prefix) row map-side; exactly one
    aggregation exchange."""
    from pyvectorsearch_spark.operators.textops import boilerplate_prefixes
    from pyvectorsearch_spark.plans import count_exchanges

    docs = load_table(spark, SF_SMOKE, "documents")
    df = boilerplate_prefixes(docs, k=6, min_docs=3)
    assert count_exchanges(df) <= 1, explain_str(df)[:1500]


def test_audience_overlap_joins_audiences_not_events(spark):
    """The pair join's inputs are the deduped (type, user) audience rows —
    partial aggregates appear below the join exchanges."""
    from pyvectorsearch_spark.queries.funnel_extra import q_audience_overlap

    out = q_audience_overlap(spark, SF_SMOKE)
    s = explain_str(out)
    assert "HashAggregate" in s  # the distinct collapse exists
    assert "CartesianProduct" not in s
