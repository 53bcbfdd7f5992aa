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


def test_interval_join_no_nested_loop(spark):
    """The bucketed interval join must compile to an equi-join (hash or
    sort-merge on the bucket key), never BroadcastNestedLoopJoin/cartesian —
    the whole point of the bucket trick."""
    from pyvectorsearch_spark.queries.temporal import q_interval_order_shipments

    df = q_interval_order_shipments(spark, SF_SMOKE)
    s = explain_str(df)
    assert "NestedLoop" not in s and "Cartesian" not in s, s[:2000]


def test_semi_join_stays_semi(spark):
    """EXISTS compiles to LeftSemi (no row multiplication on multi-match)."""
    from pyvectorsearch_spark.queries.relational import priority_with_returns

    df = priority_with_returns(spark, SF_SMOKE)
    assert "LeftSemi" in explain_str(df)


def test_q13_single_real_exchange_for_both_aggs(spark):
    """The per-customer agg must reuse the join's partitioning on c_custkey;
    only the tiny histogram agg adds an exchange."""
    from pyvectorsearch_spark.queries.relational import customer_order_distribution

    df = customer_order_distribution(spark, SF_SMOKE)
    # exchanges: join (2 sides) + histogram re-key + final orderBy range —
    # crucially NO extra exchange between the join and the first groupBy
    assert count_exchanges(df) <= 4, explain_str(df)[:2000]


def test_jaccard_window_df_single_explode(spark):
    """df(s) comes from a partition-wide Window count over the one shingle
    exchange (no groupBy(s)+join-back), so the CPU-heavy
    tokenize→shingle→explode pipeline runs ONCE: exactly one Generate
    upstream of the Window in the final main plan, and the per-doc array
    exchange is reused across the prefix self-join sides (ReusedExchange)."""
    from pyvectorsearch_spark.queries.dedup import q_dedup_jaccard

    df = q_dedup_jaccard(spark, SF_SMOKE)
    df.collect()  # AQE only dedupes stages at runtime; static plans duplicate
    s = explain_str(df)
    assert "isFinalPlan=true" in s
    assert "ReusedExchange" in s, s[:2000]
    # Count operators in the executed FINAL plan tree only (the formatted
    # dump repeats everything in the Initial Plan section): one Window,
    # Generates only for the single shingle explode + two prefix-explode
    # sides.
    final = s.split("== Initial Plan ==")[0]
    assert final.count("Window (") == 1, final[:2000]
    assert final.count("Generate (") <= 3, final[:2000]


def test_large_quantity_orders_broadcasts_having_side(spark):
    """Q18 shape: the HAVING-filtered per-order aggregate is tiny, so it must
    broadcast into orders — the 6B-row orders side never shuffles for the
    join; the only exchanges are the lineitem pre-agg and the final top-k."""
    from pyvectorsearch_spark.queries.relational import large_quantity_orders

    df = large_quantity_orders(spark, SF_SMOKE)
    s = explain_str(df)
    assert "BroadcastHashJoin" in s, s[:2000]
    assert "TakeOrderedAndProject" in s, s[:2000]  # top-k never total-sorts
    assert count_exchanges(df) <= 1, s[:2000]


def test_promo_revenue_share_factside_no_shuffle(spark):
    """Q14 shape: part broadcasts and the single-row conditional aggregate
    uses map-side partials — lineitem contributes zero shuffle exchanges
    beyond the final single-partition combine."""
    from pyvectorsearch_spark.queries.relational import promo_revenue_share

    df = promo_revenue_share(spark, SF_SMOKE)
    s = explain_str(df)
    assert "BroadcastHashJoin" in s, s[:2000]
    assert s.count("HashAggregate") >= 2, s[:2000]
    assert count_exchanges(df) <= 1, s[:2000]


def test_pii_redact_zero_shuffle(spark):
    """PII redaction is a pure projection — it must pipeline inside the scan
    stage with no exchange at all."""
    from pyvectorsearch_spark.operators.textops import pii_redact

    df = pii_redact(load_table(spark, SF_SMOKE, "documents"))
    assert count_exchanges(df) == 0, explain_str(df)[:2000]


def test_bm25_broadcasts_small_sides_and_prunes_scan(spark):
    """BM25: the doc-frequency and corpus-stats sides are tiny and must
    broadcast (no extra shuffle); the scan reads only (doc_id, text)."""
    from pyvectorsearch_spark.operators.textops import bm25_rank

    df = bm25_rank(load_table(spark, SF_SMOKE, "documents"), ["spark", "hash"])
    assert has_broadcast_join(df)
    scans = read_schema_columns(df)
    assert scans and all(s <= {"doc_id", "text"} for s in scans), scans
    # postings groupBy + dfreq agg + final per-doc agg; top-k is
    # TakeOrdered, not a global sort exchange
    assert count_exchanges(df) <= 4, explain_str(df)[:2000]


def test_vocab_encode_broadcasts_vocab(spark):
    """The vocabulary (small) joins the corpus-sized token stream by
    broadcast — the token stream must not shuffle for the join itself."""
    from pyvectorsearch_spark.operators.textops import vocab_encode

    df = vocab_encode(load_table(spark, SF_SMOKE, "documents"), vocab_size=24)
    assert has_broadcast_join(df)


def test_dup_span_stats_shuffles_hashes_not_text(spark):
    """Duplicated-span detection: every exchange moves md5 gram hashes or
    per-doc counters — the raw text column never appears below a shuffle."""
    from pyvectorsearch_spark.operators.textops import dup_span_stats

    df = dup_span_stats(load_table(spark, SF_SMOKE, "documents"), n=8)
    s = explain_str(df)
    import re

    for m in re.finditer(r"Arguments: hashpartitioning\(([^)]*)\)", s):
        assert "text" not in m.group(1), m.group(0)


def test_partitioned_sink_read_prunes_partitions(spark):
    """Reading the hive-partitioned landing with a partition-key filter must
    carry PartitionFilters on the scan (directory skipping) — the filter
    never runs as a post-scan row filter over the whole dataset."""
    from pyvectorsearch_spark.plans import partition_filters
    from pyvectorsearch_spark.queries.formats import q_partition_prune_stats

    df = q_partition_prune_stats(spark, SF_SMOKE)
    pf = partition_filters(df)
    assert any("source" in f for f in pf), explain_str(df)[:2000]


def test_tfidf_prunes_scan_and_bounded_exchanges(spark):
    """TF-IDF must read only (doc_id, text) from parquet; the shuffles are
    the tf partial-agg, the term-df window, and the per-doc top-k window —
    all over the REDUCED (doc, term) table, never raw tokens."""
    from pyvectorsearch_spark.queries.text_extra import q_text_tfidf

    df = q_text_tfidf(spark, SF_SMOKE)
    scans = read_schema_columns(df)
    assert scans and scans[0] <= {"doc_id", "text"}, scans
    # tf partial-agg, df window (term), top-k window (doc), the distinct
    # n_docs aggregate (2), and the presentation sort — all over the
    # REDUCED doc x term table. 8 is the observed plan; anything well above
    # would mean the raw token stream itself started shuffling.
    assert count_exchanges(df) <= 8, explain_str(df)[:2000]


def test_cms_no_cartesian_and_pruned_scan(spark):
    """Count-min build+probe: documents scanned for (text) only; no
    cartesian product anywhere (probe/sketch joins are equi-joins)."""
    from pyvectorsearch_spark.queries.sketch_extra import q_sketch_cms_terms

    df = q_sketch_cms_terms(spark, SF_SMOKE)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, plan[:2000]


def test_winsorize_fact_scans_bounded(spark):
    """Winsorize reads only (event_type, value); bound attach is a
    broadcast join (the bounds table is groups-sized)."""
    from pyvectorsearch_spark.queries.skew_extra import q_events_winsorize

    df = q_events_winsorize(spark, SF_SMOKE)
    scans = read_schema_columns(df)
    assert scans and all(s <= {"event_type", "value"} for s in scans), scans
    assert has_broadcast_join(df)


def test_join_size_estimate_never_joins_facts(spark):
    """The join-size estimator joins the two COUNT tables, not the fact
    tables: scans read only the key columns."""
    from pyvectorsearch_spark.queries.skew_extra import q_join_size_estimate

    df = q_join_size_estimate(spark, SF_SMOKE)
    scans = read_schema_columns(df)
    assert scans and all(
        s <= {"o_orderkey"} or s <= {"l_orderkey"} for s in scans
    ), scans


def test_attribution_no_cartesian(spark):
    """The attribution interval predicate must ride the user_id equi-join —
    never a nested-loop/cartesian over events x events."""
    from pyvectorsearch_spark.queries.incremental_extra import (
        q_attribution_linear,
    )

    df = q_attribution_linear(spark, SF_SMOKE)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, plan[:2000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:2000]
