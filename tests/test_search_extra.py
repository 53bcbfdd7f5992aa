"""Plan-shape and semantics tests for filtered kNN and hybrid RRF (sf-parity
lives in test_oracle_parity.py)."""

from __future__ import annotations

from pyvectorsearch_spark.plans import pushed_filters
from pyvectorsearch_spark.queries.search_extra import (
    ALLOWED_LABELS,
    K,
    RRF_TOPK,
    q_hybrid_rrf,
    q_knn_filtered,
)
from tests.conftest import SF_SMOKE


def test_filtered_knn_pushes_label_filter_to_scan(spark):
    # a prior test may have persisted the embeddings scan; a cached relation
    # has no PushedFilters node, so inspect a cache-free plan
    spark.catalog.clearCache()
    df = q_knn_filtered(spark, SF_SMOKE)
    pf = pushed_filters(df)
    assert any("label" in f for f in pf), pf


def test_filtered_knn_prefilter_semantics(spark):
    rows = q_knn_filtered(spark, SF_SMOKE).collect()
    assert rows and all(r["label"] in ALLOWED_LABELS for r in rows)
    # pre-filter: every query still gets a full k (the allow-set has >= k
    # members at every SF) — post-filtering a top-k list could not promise this
    from collections import Counter

    per_q = Counter(r["query_id"] for r in rows)
    assert all(v == K for v in per_q.values()), per_q


def test_sq8_quantization_error_bounded(spark):
    # decode(encode(v)) must be within step/2 per dimension
    from pyvectorsearch_spark.index.sq import SQ8Index, sq8_decode_expr
    from pyvectorsearch_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_SMOKE, "embeddings")
    idx = SQ8Index.build(emb)
    dec = idx.df.select(
        F.col(idx.vec_col).cast("array<double>").alias("v"),
        sq8_decode_expr(F.col("_sq8"), idx.lo, idx.step).alias("vh"),
    )
    worst = dec.select(
        F.array_max(
            F.zip_with(
                "v",
                "vh",
                lambda a, b: F.abs(a - b)
                / F.lit(max(idx.step)),
            )
        ).alias("rel")
    ).agg(F.max("rel")).collect()[0][0]
    assert worst <= 0.5 + 1e-9


def test_sq8_recall_perfect_on_smoke(spark):
    # generous rerank on the smoke table: SQ8 shortlist + exact re-rank
    # should recover the true top-k exactly
    from pyvectorsearch_spark.index.sq import SQ8Index
    from pyvectorsearch_spark.operators.knn import knn_join
    from pyvectorsearch_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_SMOKE, "embeddings")
    probes = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in SQ8Index.build(emb).knn(probes, 5, rerank=40).collect()
    }
    want = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in knn_join(emb, probes, 5).collect()
    }
    assert got == want


def test_sq8_dim_mismatch_raises(spark):
    from pyvectorsearch_spark.index.sq import SQ8Index
    from pyvectorsearch_spark.sources.tables import load_table

    import pytest

    emb = load_table(spark, SF_SMOKE, "embeddings")
    idx = SQ8Index.build(emb)
    bad = spark.createDataFrame([(0, [1.0, 2.0])], "query_id long, qvec array<double>")
    with pytest.raises(Exception, match="dim mismatch"):
        idx.knn(bad, 3).collect()


def test_hybrid_rrf_fuses_both_lists(spark):
    rows = q_hybrid_rrf(spark, SF_SMOKE).collect()
    assert len(rows) == RRF_TOPK
    # a doc present in both lists must outrank the same ranks seen singly;
    # minimally: the result contains at least one id with both ranks set
    assert any(r["lex_rank"] > 0 and r["vec_rank"] > 0 for r in rows)
    # rrf scores are monotone non-increasing in output order
    scores = [r["rrf"] for r in rows]
    assert scores == sorted(scores, reverse=True)
