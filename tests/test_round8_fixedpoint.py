"""Round-8: fixed-point IVF / PQ search (`index/fixedpoint.py`) — the
hash-checkable ANN families behind `ivf_recall_report` / `pq_recall_report`
(VERDICT r7 ask #2).

Pins: (a) nprobe == n_lists is EXACT (equals the brute-force integer
top-k); (b) recall is monotone in nprobe and genuinely < 1 somewhere at
nprobe=2 on the fixture (the report measures a real approximation);
(c) PQ codes stay in range and the ADC ranking degrades gracefully
(recall > 0); (d) parameter validation."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from pyvectorsearch_spark.index.fixedpoint import (
    _d2,
    ivf_fixedpoint_knn,
    pq_adc_knn,
    train_pq_fixedpoint,
)
from pyvectorsearch_spark.operators.clustering import _km_quantize, _km_train
from pyvectorsearch_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE

pytestmark = pytest.mark.slow  # soak/property tier: excluded from the default (driver-visible) run, see pytest.ini (r11)

K = 5
NP = 8


@pytest.fixture(scope="module")
def emb(spark):
    df = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", "embedding"
    )
    df.cache().count()
    return df


def _probes(emb):
    return emb.filter(F.col("vec_id") < NP).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )


def _brute(emb, k):
    qb = _probes(emb).select(
        F.col("query_id").alias("_qid"), _km_quantize("qvec").alias("_qq")
    )
    xb = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        _km_quantize("embedding").alias("_xq"),
    )
    w = Window.partitionBy("_qid").orderBy(
        F.col("d2q").asc(), F.col("neighbor_id").asc()
    )
    return (
        xb.crossJoin(F.broadcast(qb))
        .select("_qid", "neighbor_id", _d2(F.col("_qq"), F.col("_xq")).alias("d2q"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("_qid").alias("query_id"), "neighbor_id", "d2q", "rank")
    )


class TestIVFFixedpoint:
    def test_exhaustive_nprobe_is_exact(self, spark, emb):
        got = ivf_fixedpoint_knn(
            emb, _probes(emb), K, n_lists=8, rounds=2, nprobe=8
        )
        exp = _brute(emb, K)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, exp.collect())
        )

    def test_recall_monotone_in_nprobe_and_lossy_at_low_nprobe(
        self, spark, emb
    ):
        base = emb.select(
            F.col("vec_id").alias("_id"), _km_quantize("embedding").alias("_q")
        )
        cents = _km_train(base, 8, 2)
        exact = {
            (r["query_id"], r["neighbor_id"]) for r in _brute(emb, K).collect()
        }
        recalls = []
        for nprobe in (1, 2, 4, 8):
            got = {
                (r["query_id"], r["neighbor_id"])
                for r in ivf_fixedpoint_knn(
                    emb, _probes(emb), K, n_lists=8, rounds=2,
                    nprobe=nprobe, cents=cents,
                ).collect()
            }
            recalls.append(len(got & exact) / len(exact))
        assert recalls == sorted(recalls), recalls
        assert recalls[-1] == 1.0
        assert recalls[0] < 1.0, (
            "fixture gives recall 1.0 at nprobe=1 — report proves nothing"
        )

    def test_output_is_top_k_shaped(self, spark, emb):
        out = ivf_fixedpoint_knn(
            emb, _probes(emb), K, n_lists=8, rounds=2, nprobe=2
        ).collect()
        per_q = {}
        for r in out:
            per_q.setdefault(r["query_id"], []).append(r)
        assert set(per_q) == set(range(NP))
        for rows in per_q.values():
            assert sorted(r["rank"] for r in rows) == list(range(1, K + 1))
            by_rank = sorted(rows, key=lambda r: r["rank"])
            d = [r["d2q"] for r in by_rank]
            assert d == sorted(d)


class TestPQFixedpoint:
    def test_codebook_shape(self, spark, emb):
        books = train_pq_fixedpoint(emb, dim=64, m=4, ks=8, rounds=1)
        assert len(books) == 4
        for b in books:
            assert len(b) == 8 and all(len(cv) == 16 for cv in b)

    def test_adc_topk_overlaps_exact(self, spark, emb):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in pq_adc_knn(
                emb, _probes(emb), K, dim=64, m=4, ks=8, rounds=1
            ).collect()
        }
        exact = {
            (r["query_id"], r["neighbor_id"]) for r in _brute(emb, K).collect()
        }
        recall = len(got & exact) / len(exact)
        assert 0.0 < recall < 1.0, (
            f"PQ recall {recall}: 0 means broken, 1 means the fixture "
            "proves nothing about lossiness"
        )

    def test_self_is_top1_under_adc_often(self, spark, emb):
        # ADC is lossy but the probe's own code distance is the minimum
        # achievable for its own codes; the probe should rank itself first
        # for a majority of probes even at this tiny code budget.
        out = pq_adc_knn(
            emb, _probes(emb), 1, dim=64, m=4, ks=8, rounds=1
        ).collect()
        hits = sum(1 for r in out if r["query_id"] == r["neighbor_id"])
        assert hits >= NP // 2, f"{hits}/{NP} self-top1"

    def test_dim_not_divisible_raises(self, spark, emb):
        with pytest.raises(ValueError, match="not divisible"):
            pq_adc_knn(emb, _probes(emb), K, dim=64, m=5)
