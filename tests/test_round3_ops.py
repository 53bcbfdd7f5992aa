"""Unit tests for the round-3 third-session operators on small synthetic
inputs with hand-computable answers (the oracle-parity suite covers the
registered queries; these pin operator semantics directly)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyvectorsearch_spark.operators.graph import label_propagation, triangle_stats
from pyvectorsearch_spark.operators.incremental import merge_rollups
from pyvectorsearch_spark.operators.sketches import cms_build, cms_lookup
from pyvectorsearch_spark.plans.scale import key_skew_report


def test_triangle_stats_known_graph(spark):
    # K3 triangle (1,2,3) plus a pendant edge 3-4: 1 triangle,
    # wedges = C(2,2)+C(2,2)+C(3,2)+C(1,2) = 1+1+3+0 = 5
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "d1 bigint, d2 bigint"
    )
    row = triangle_stats(pairs).collect()[0]
    assert row["n_nodes"] == 4
    assert row["n_edges"] == 4
    assert row["n_triangles"] == 1
    assert row["n_wedges"] == 5
    assert row["gcc_r"] == 0.6  # 3*1/5


def test_triangle_stats_no_triangles(spark):
    pairs = spark.createDataFrame([(1, 2), (3, 4)], "d1 bigint, d2 bigint")
    row = triangle_stats(pairs).collect()[0]
    assert row["n_triangles"] == 0
    assert row["gcc_r"] == 0.0


def test_label_propagation_two_cliques(spark):
    # two triangles joined by one bridge edge: LPA should keep two
    # communities (min-label floods each clique; the bridge cannot outvote
    # a clique majority)
    edges = [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]
    pairs = spark.createDataFrame(edges, "d1 bigint, d2 bigint")
    out = {r["node"]: r["community"] for r in label_propagation(pairs, iters=2).collect()}
    assert len(out) == 6
    left = {out[1], out[2]}
    right = {out[5], out[6]}
    assert left.isdisjoint(right)


def test_merge_rollups_equals_direct(spark):
    rows = [(i % 3, i) for i in range(100)]
    df = spark.createDataFrame(rows, "g int, v bigint")
    def roll(d):
        return d.groupBy("g").agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("v").cast("bigint").alias("s"),
            F.min("v").cast("bigint").alias("mn"),
            F.max("v").cast("bigint").alias("mx"),
        )
    merged = merge_rollups(
        roll(df.filter(F.col("v") < 40)),
        roll(df.filter(F.col("v") >= 40)),
        keys=["g"], add_cols=["n", "s"], min_cols=["mn"], max_cols=["mx"],
    )
    direct = roll(df)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_merge_rollups_disjoint_keys(spark):
    # keys present on only one side must survive with that side's values
    b = spark.createDataFrame([(1, 5)], "g int, n bigint")
    d = spark.createDataFrame([(2, 7)], "g int, n bigint")
    out = {r["g"]: r["n"] for r in merge_rollups(b, d, keys=["g"], add_cols=["n"]).collect()}
    assert out == {1: 5, 2: 7}


def test_cms_never_undercounts(spark):
    rows = [(f"t{i % 17}",) for i in range(300)]
    df = spark.createDataFrame(rows, "term string")
    tf = df.groupBy("term").agg(F.count("*").cast("bigint").alias("n"))
    sk = cms_build(tf, term_col="term", count_col="n", depth=3, width=8)
    est = cms_lookup(sk, tf, term_col="term", depth=3, width=8)
    for r in est.collect():
        assert r["cms_estimate"] >= r["n"]  # CMS overcounts, never under


def test_key_skew_report_uniform_vs_skewed(spark):
    uni = spark.createDataFrame([(i % 10,) for i in range(100)], "k int")
    skw = spark.createDataFrame([(0,)] * 91 + [(i,) for i in range(1, 10)], "k int")
    u = key_skew_report(uni, key="k").collect()[0]
    v = key_skew_report(skw, key="k").collect()[0]
    assert u["cv_r"] == 0.0 and u["top1_share_r"] == 0.1
    assert v["top1_share_r"] == 0.91 and v["cv_r"] > 2.0
    assert v["max_n"] == 91 and v["n_keys"] == 10


def test_recall_report_counts_misses(spark):
    from pyvectorsearch_spark.operators.knn import recall_report

    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 21)], "query_id bigint, neighbor_id bigint"
    )
    approx = spark.createDataFrame(
        [(1, 10), (1, 99), (2, 20), (2, 21)], "query_id bigint, neighbor_id bigint"
    )
    out = {r["query_id"]: r for r in recall_report(approx, exact).collect()}
    assert out[1]["n_hits"] == 1 and out[1]["recall_r"] == 0.5
    assert out[2]["n_hits"] == 2 and out[2]["recall_r"] == 1.0


def test_recall_report_zero_overlap(spark):
    from pyvectorsearch_spark.operators.knn import recall_report

    exact = spark.createDataFrame([(1, 10)], "query_id bigint, neighbor_id bigint")
    approx = spark.createDataFrame([(1, 99)], "query_id bigint, neighbor_id bigint")
    r = recall_report(approx, exact).collect()[0]
    assert r["n_hits"] == 0 and r["recall_r"] == 0.0
