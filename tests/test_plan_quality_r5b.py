"""Plan-shape pins for the round-5 continuation operators: DSIR's bucket
table and totals must pair by BROADCAST (never a shuffled cartesian), BQ's
probe side likewise, and the temperature-mixture membership must be a
broadcast-joined projection. These are the shapes the 100 TB story claims;
the pins keep refactors honest."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_T2


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_dsir_plan_is_broadcast_shaped(spark):
    from pyvectorsearch_spark.operators.sampling import dsir_logweights

    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    plan = _plan(dsir_logweights(docs, target=F.col("lang") == "en"))
    assert "CartesianProduct" not in plan
    # the one-row totals pair via broadcast nested loop; the 256-row bucket
    # weight table joins back via broadcast hash
    assert "BroadcastNestedLoopJoin" in plan
    assert "BroadcastHashJoin" in plan


def test_bq_plan_broadcasts_probes(spark):
    from pyvectorsearch_spark.index.bq import bq_knn

    emb = spark.read.parquet(f"{SF_T2}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    plan = _plan(bq_knn(emb, probes, 5, dim=64, rerank=20))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan
    # the packed code is a scan-stage projection: no exchange before the
    # first window (exactly one partial/final window pair per top-k stage)
    assert plan.count("Exchange") <= 4


def test_temperature_mixture_membership_is_broadcast(spark):
    from pyvectorsearch_spark.operators.sampling import (
        hash_bucket,
        temperature_mixture_thresholds,
    )

    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    thr = temperature_mixture_thresholds(docs, target_rows=200)
    kept = docs.join(F.broadcast(thr), "source").filter(
        hash_bucket(F.col("doc_id"), "tmix") < F.col("threshold")
    )
    plan = _plan(kept)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_cdc_ratio_plan_has_no_inferred_scan_filter(spark):
    """Same InferFiltersFromGenerate guard as the winnowing pair join: the
    chunk expression must never be re-inlined into a scan-stage Filter."""
    from pyvectorsearch_spark.queries.text_extra import q_dedup_cdc_ratio

    plan = (
        q_dedup_cdc_ratio(spark, SF_T2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    for line in plan.splitlines():
        stripped = line.strip().lstrip("+-*( ")
        if stripped.startswith("Filter") or "FileScan" in line:
            assert "md5" not in line, line[:200]
