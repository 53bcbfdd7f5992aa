"""Plan-shape assertions for the extended TPC-H and analytic query modules —
the 100 TB contract for the new shapes: snowflake joins must broadcast every
dim, disjunctive joins must stay hash joins, grouping sets must expand in one
pass, and global scalars must broadcast rather than collect."""

from __future__ import annotations

from pyvectorsearch_spark.plans import count_exchanges, explain_str
from tests.conftest import SF_SMOKE


def test_q8_snowflake_broadcasts_all_dims(spark):
    """Six-way snowflake: every dim join is a BroadcastHashJoin; the only
    shuffles are lineitem⋈orders and the final year agg."""
    from pyvectorsearch_spark.queries.tpch_extra import q8_market_share

    df = q8_market_share(spark, SF_SMOKE)
    s = explain_str(df)
    assert s.count("BroadcastHashJoin") >= 5, s[:3000]
    # lineitem⋈orders may sort-merge; every dim join must not. Allow at most
    # that single SortMergeJoin occurrence in the plan.
    assert s.count("SortMergeJoin") <= 1, s[:3000]
    # lineitem + orders shuffle for the join, plus the tiny agg + sort
    assert count_exchanges(df) <= 5, s[:3000]


def test_q2_correlated_min_single_fact_shuffle(spark):
    """Q2: every dim (part/supplier/nation/region) broadcasts so lineitem
    shuffles only for the (part, supplier) cost aggregate; the correlated MIN
    decorrelates to a window, and the final top-100 is TakeOrderedAndProject."""
    from pyvectorsearch_spark.queries.tpch_extra import q2_min_cost_supplier

    df = q2_min_cost_supplier(spark, SF_SMOKE)
    s = explain_str(df)
    assert s.count("BroadcastHashJoin") >= 4, s[:3000]
    assert "SortMergeJoin" not in s, s[:3000]
    assert "Window" in s, s[:2000]
    assert "TakeOrderedAndProject" in s, s[:2000]
    # cost agg + window repartition (+AQE reads); never a join shuffle
    assert count_exchanges(df) <= 3, s[:3000]


def test_q4_exists_compiles_to_semi_join(spark):
    """Q4's correlated EXISTS (with a non-key residual condition) must become
    a left-semi join, never a per-row subquery or cartesian product."""
    from pyvectorsearch_spark.queries.tpch_extra import q4_order_priority

    df = q4_order_priority(spark, SF_SMOKE)
    s = explain_str(df)
    assert "LeftSemi" in s, s[:2000]
    assert "Cartesian" not in s and "NestedLoop" not in s.replace(
        "BroadcastNestedLoop", ""
    ), s[:2000]


def test_q20_nested_in_stays_semi_joins(spark):
    """Q20's IN-IN nesting compiles to two semi joins (part filter into
    lineitem, qualifying suppliers into supplier) — no row explosion."""
    from pyvectorsearch_spark.queries.tpch_extra import q20_heavy_shippers

    df = q20_heavy_shippers(spark, SF_SMOKE)
    s = explain_str(df)
    assert s.count("LeftSemi") >= 2, s[:3000]
    assert "BroadcastHashJoin" in s, s[:2000]
    assert "Cartesian" not in s, s[:2000]


def test_q19_disjunction_stays_hash_join(spark):
    """The OR-of-conjuncts must remain a residual filter on the equi-join,
    never degrade to a nested-loop join."""
    from pyvectorsearch_spark.queries.tpch_extra import q19_disjunctive_join

    df = q19_disjunctive_join(spark, SF_SMOKE)
    s = explain_str(df)
    assert "BroadcastHashJoin" in s, s[:2000]
    assert "NestedLoop" not in s and "Cartesian" not in s, s[:2000]


def test_q11_scalar_threshold_broadcasts(spark):
    """The global-sum threshold is a one-row aggregate: it must broadcast
    (BroadcastNestedLoopJoin over 1 row is fine), and the per-part aggregate
    must be computed with map-side partials."""
    from pyvectorsearch_spark.queries.tpch_extra import q11_valuable_parts

    df = q11_valuable_parts(spark, SF_SMOKE)
    s = explain_str(df)
    assert "Broadcast" in s, s[:2000]
    assert s.count("HashAggregate") >= 2, s[:2000]


def test_q22_anti_join_no_explosion(spark):
    """NOT EXISTS compiles to LeftAnti; the scalar avg broadcasts."""
    from pyvectorsearch_spark.queries.tpch_extra import q22_idle_customers

    df = q22_idle_customers(spark, SF_SMOKE)
    s = explain_str(df)
    assert "LeftAnti" in s, s[:2000]
    assert "Broadcast" in s, s[:2000]


def test_q21_single_window_shuffle(spark):
    """Both window functions (max ship date, supplier set) share one
    partitioning on l_orderkey — a single exchange feeds both."""
    from pyvectorsearch_spark.queries.tpch_extra import q21_blame_supplier

    df = q21_blame_supplier(spark, SF_SMOKE)
    s = explain_str(df)
    # one exchange for the window, one for distinct, one for the name agg,
    # final top-k is TakeOrderedAndProject (no exchange)
    assert count_exchanges(df) <= 4, s[:3000]
    assert "TakeOrderedAndProject" in s, s[:2000]


def test_grouping_sets_single_expand(spark):
    """GROUPING SETS compiles to one Expand + one aggregate pair — not a
    union of four scans."""
    from pyvectorsearch_spark.queries.analytic_extra import priority_grouping_sets

    df = priority_grouping_sets(spark, SF_SMOKE)
    s = explain_str(df)
    assert s.count("Expand") >= 1, s[:2000]
    # exactly one scan feeds the Expand — not a union of four
    assert s.count("Location: InMemoryFileIndex") <= 1, s[:2000]


def test_deciles_window_over_aggregate(spark):
    """The ntile window must consume the per-customer AGGREGATE (1 row per
    customer), not raw orders — aggregate-then-window."""
    from pyvectorsearch_spark.queries.analytic_extra import customer_revenue_deciles

    df = customer_revenue_deciles(spark, SF_SMOKE)
    s = explain_str(df)
    i_agg = s.find("HashAggregate")
    i_win = s.find("Window")
    assert i_agg != -1 and i_win != -1, s[:2000]


def test_doc_top_words_partial_agg_before_window(spark):
    """The (doc_id, word) count collapses map-side before the rank window."""
    from pyvectorsearch_spark.queries.analytic_extra import doc_top_words

    df = doc_top_words(spark, SF_SMOKE)
    s = explain_str(df)
    assert s.count("HashAggregate") >= 2, s[:2000]
    assert "Window" in s, s[:2000]
