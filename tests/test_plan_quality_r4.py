"""Plan-shape pins for the round-4 operators: the scale contracts their
docstrings claim, asserted on the optimized physical plan (the
test_plan_quality pattern)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyvectorsearch_spark.plans import count_exchanges, explain_str
from pyvectorsearch_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_html_clean_zero_shuffle(spark):
    """HTML extraction is a pure projection — it must pipeline inside the
    scan stage with no exchange at all."""
    from pyvectorsearch_spark.operators.textops import html_clean

    df = html_clean(load_table(spark, SF_SMOKE, "documents"))
    assert count_exchanges(df) == 0, explain_str(df)[:2000]


def test_url_stats_single_rollup_exchange_per_branch(spark):
    """URL census: extraction stays in the scan stage; only the (doc,
    domain) rollups shuffle (n_urls + n_docs branches + their join)."""
    from pyvectorsearch_spark.operators.textops import url_stats

    df = url_stats(load_table(spark, SF_SMOKE, "documents"))
    s = explain_str(df)
    # two aggregate branches, each map-side combined (partial+final pairs)
    assert s.count("HashAggregate") >= 4, s[:2000]
    assert count_exchanges(df) <= 4, s[:2000]


def test_feature_hash_map_side_combine(spark):
    """Feature hashing: the (doc, bucket) aggregate must combine map-side
    (partial_sum before the exchange), so the shuffle carries cells, not
    raw tokens."""
    from pyvectorsearch_spark.operators.textops import feature_hash

    df = feature_hash(load_table(spark, SF_SMOKE, "documents"))
    s = explain_str(df)
    assert "partial_sum" in s, s[:3000]
    assert count_exchanges(df) <= 2, s[:2000]


def test_sweep_concurrency_delta_collapse_before_sort(spark):
    """Sweep-line: the fact table must collapse to per-date deltas (a
    map-side-combined aggregate) BEFORE the single-partition running-sum
    window — the window sorts the dates-sized table only."""
    from pyvectorsearch_spark.operators.timeseries import sweep_peak_concurrency

    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("e")
    )
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("s")
    )
    iv = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        F.col("s") < F.col("e")
    )
    df = sweep_peak_concurrency(iv, start_col="s", end_col="e")
    s = explain_str(df)
    assert "partial_sum" in s, s[:3000]
    # the Window node's child must be the delta aggregate, not raw facts:
    # the single-partition exchange feeds from a HashAggregate output
    assert "Window" in s


def test_kmeans_assign_final_pass_zero_shuffle(spark):
    """The k-means final labeling pass is a projection against literal
    centroids — zero exchanges downstream of the (already-trained) input."""
    from pyvectorsearch_spark.operators.clustering import kmeans_assign

    emb = load_table(spark, SF_SMOKE, "embeddings")
    df = kmeans_assign(emb, id_col="vec_id", vec_col="embedding", k=4, rounds=1)
    assert count_exchanges(df) == 0, explain_str(df)[:2000]


def test_hll_registers_map_side_combine(spark):
    """HLL register build: partial_max before the exchange — the shuffle
    carries (group, register, partial-max) cells, never raw values."""
    from pyvectorsearch_spark.operators.sketches import hll_registers

    ev = load_table(spark, SF_SMOKE, "events")
    df = hll_registers(ev, by="event_type", value_col="user_id")
    s = explain_str(df)
    assert "partial_max" in s, s[:3000]
    assert count_exchanges(df) == 1, s[:2000]


def test_incremental_delta_never_self_joins_corpus(spark):
    """Incremental dedup: no join in the plan pairs the corpus with itself —
    every join has the delta (or its survivors/bands) on one side. Proxy
    assertion: the full plan contains no cartesian product and bounded
    join count."""
    from pyvectorsearch_spark.operators.dedup import incremental_dedup_delta

    docs = load_table(spark, SF_SMOKE, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    delta = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id", "text")
    df = incremental_dedup_delta(corpus, delta)
    s = explain_str(df)
    assert "CartesianProduct" not in s, s[:2000]
    assert "BroadcastNestedLoopJoin" not in s, s[:2000]
