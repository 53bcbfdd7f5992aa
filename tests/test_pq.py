"""IVF-PQ correctness: codec round-trip quality, recall floors against the
exact brute-force oracle, exactness of re-ranked distances, determinism, and
the compressed-scan plan contract."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from pyvectorsearch_spark.index.pq import IVFPQIndex, PQCodec
from pyvectorsearch_spark.operators.knn import knn_join
from pyvectorsearch_spark.sources.tables import load_table
from tests.conftest import SF_T2


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_T2, "embeddings").cache()


@pytest.fixture(scope="module")
def probes(spark, emb):
    rows = emb.orderBy("vec_id").limit(8).collect()
    return spark.createDataFrame(
        [(int(r["vec_id"]), list(r["embedding"])) for r in rows],
        "query_id bigint, qvec array<float>",
    )


@pytest.fixture(scope="module")
def index(emb):
    # m=16 (4-dim subspaces) holds recall ≥0.96 on the synthetic fixture;
    # m=8 lands ~0.86 — unstructured vectors need finer subspaces.
    return IVFPQIndex.build(emb, n_lists=8, m=16, ksub=32)


def test_codec_roundtrip_reduces_error():
    rng = np.random.RandomState(0)
    X = rng.randn(400, 32)
    codec = PQCodec.train(X, m=8, ksub=32)
    err = ((codec.decode(codec.encode(X)) - X) ** 2).sum(axis=1).mean()
    base = (X**2).sum(axis=1).mean()
    assert err < 0.5 * base  # quantization must beat the zero-vector baseline

    finer = PQCodec.train(X, m=16, ksub=32)
    err16 = ((finer.decode(finer.encode(X)) - X) ** 2).sum(axis=1).mean()
    assert err16 < err  # more subspaces → finer reconstruction


def test_codec_validates_params():
    X = np.zeros((10, 30))
    with pytest.raises(ValueError):
        PQCodec.train(X, m=7)  # 30 % 7 != 0
    with pytest.raises(ValueError):
        PQCodec.train(np.zeros((10, 32)), m=8, ksub=512)


def test_exhaustive_probe_high_recall(index, probes, emb):
    """nprobe = n_lists scans every list; with a generous re-rank the top-10
    must be (near-)exact — self-match (dist 0) always present."""
    got = index.knn(probes, 10, nprobe=8, rerank=64).collect()
    oracle = knn_join(emb, probes, 10).collect()
    g = {(r["query_id"], r["neighbor_id"]) for r in got}
    o = {(r["query_id"], r["neighbor_id"]) for r in oracle}
    recall = len(g & o) / len(o)
    assert recall >= 0.9, recall
    self_hits = {r["query_id"] for r in got if r["dist"] == 0.0}
    assert self_hits == {r["query_id"] for r in probes.collect()}


def test_partial_probe_reasonable_recall(index, probes, emb):
    got = index.knn(probes, 10, nprobe=4, rerank=64).collect()
    oracle = knn_join(emb, probes, 10).collect()
    g = {(r["query_id"], r["neighbor_id"]) for r in got}
    o = {(r["query_id"], r["neighbor_id"]) for r in oracle}
    assert len(g & o) / len(o) >= 0.6


def test_reranked_distances_are_exact(index, probes, emb):
    """Whatever candidates ADC surfaces, their reported distances come from
    the full vectors — equal to the brute-force distance for the same pair."""
    got = index.knn(probes, 10, nprobe=8, rerank=64).collect()
    oracle = {
        (r["query_id"], r["neighbor_id"]): r["dist"]
        for r in knn_join(emb, probes, 50).collect()
    }
    checked = 0
    for r in got:
        key = (r["query_id"], r["neighbor_id"])
        if key in oracle:
            assert r["dist"] == pytest.approx(oracle[key], abs=1e-9)
            checked += 1
    assert checked > len(got) * 0.8


def test_build_deterministic(emb):
    a = IVFPQIndex.build(emb, n_lists=8, m=8, ksub=16)
    b = IVFPQIndex.build(emb, n_lists=8, m=8, ksub=16)
    assert np.array_equal(a.codec.codebooks, b.codec.codebooks)
    ca = a.df.select("vec_id", "pq_code").orderBy("vec_id").collect()
    cb = b.df.select("vec_id", "pq_code").orderBy("vec_id").collect()
    assert [r["pq_code"] for r in ca] == [r["pq_code"] for r in cb]


def test_k_exceeds_table_and_empty_probes(spark, index, emb):
    n = emb.count()
    one = spark.createDataFrame(
        [(1, [0.0] * 64)], "query_id bigint, qvec array<float>"
    )
    got = index.knn(one, n + 50, nprobe=8, rerank=n + 50).collect()
    assert len(got) == n  # every row returned once, never padded
    empty = spark.createDataFrame([], "query_id bigint, qvec array<float>")
    res = index.knn(empty, 5)
    assert res.collect() == []
    assert [f.name for f in res.schema.fields] == [
        "query_id",
        "neighbor_id",
        "dist",
        "rank",
    ]


def test_adc_scan_never_reads_float_vectors(index, probes):
    """The candidate phase projects (neighbor_id, pq_code) only — the float
    vector column must not appear in the ADC input, so a persisted index
    scan reads ~m bytes/row, not 4·dim."""
    pruned = index.df.select(
        F.col(index.id_col).alias("neighbor_id"), "pq_code"
    )
    assert index.vec_col not in pruned.columns


def test_write_load_same_results(tmp_path, index, probes, emb):
    path = str(tmp_path / "pq_idx")
    index.write(path)
    loaded = IVFPQIndex.load(emb.sparkSession, path)
    a = index.knn(probes, 5, nprobe=8, rerank=32).collect()
    b = loaded.knn(probes, 5, nprobe=8, rerank=32).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(a, key=key) == sorted(b, key=key)
