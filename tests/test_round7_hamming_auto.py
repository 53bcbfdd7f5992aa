"""Round-7: density-adaptive Hamming dispatch (VERDICT r6 ask #2).

Pins that `hamming_pairs_auto` (a) picks the exact-GEMM kernel on a
planted near-dup-DENSE corpus, (b) flips to the pigeonhole-bucketed
kernel on a planted SPARSE corpus, (c) is exact either way (identical
rows to both fixed kernels), and (d) that the candidate estimator prices
the bucketed join exactly (Σ C(n_k, 2) over chunk buckets)."""
from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from pyvectorsearch_spark.operators.dedup import (
    SIMHASH_BITS,
    hamming_candidate_stats,
    hamming_pairs_auto,
    hamming_pairs_bucketed,
    hamming_pairs_gemm,
)

MAXH = 6


def _hash60(token: str) -> int:
    return int(hashlib.md5(token.encode()).hexdigest()[:15], 16)


def _dense_rows(n=120):
    """One base fingerprint, each doc ≤ 2 bit flips away — every pair is
    within 2*2 flips, so every chunk bucket is ~the whole corpus."""
    base = _hash60("base")
    rows = []
    for i in range(n):
        h = base ^ (1 << (i % 5))  # flip one of 5 low bits
        rows.append((i, h))
    return rows


def _sparse_rows(n=400):
    """md5-random fingerprints — chunk buckets are ~all singletons."""
    return [(i, _hash60(f"doc-{i}")) for i in range(n)]


def _pairs(df):
    return sorted(tuple(r) for r in df.select("d1", "d2", "hamming").collect())


def test_dispatch_picks_gemm_on_dense(spark):
    hashes = spark.createDataFrame(_dense_rows(), "doc_id long, simhash long")
    dec = {}
    out = hamming_pairs_auto(
        hashes,
        id_col="doc_id",
        hash_col="simhash",
        bits=SIMHASH_BITS,
        max_hamming=MAXH,
        decision_out=dec,
    )
    got = _pairs(out)
    assert dec["kernel"] == "gemm"
    assert dec["density"] >= 0.5  # planted: buckets ≈ whole corpus
    exact = _pairs(
        hamming_pairs_gemm(
            hashes, id_col="doc_id", hash_col="simhash",
            bits=SIMHASH_BITS, max_hamming=MAXH,
        )
    )
    assert got == exact and len(got) > 0


def test_dispatch_flips_to_bucketed_on_sparse(spark):
    """Wide chunks (max_hamming=3 -> 15-bit chunks) push the
    random-collision floor to ~1e-4, far below the cutoff, so a random
    corpus flips to the bucketed kernel. (With narrow 6-bit chunks the
    floor is ~0.16 and GEMM is cost-correct even on random data — see
    DENSITY_CUTOFF's docstring.)"""
    hashes = spark.createDataFrame(_sparse_rows(), "doc_id long, simhash long")
    dec = {}
    out = hamming_pairs_auto(
        hashes,
        id_col="doc_id",
        hash_col="simhash",
        bits=SIMHASH_BITS,
        max_hamming=3,
        decision_out=dec,
    )
    got = _pairs(out)
    assert dec["kernel"] == "bucketed"
    assert dec["density"] < 0.01
    exact = _pairs(
        hamming_pairs_bucketed(
            hashes, id_col="doc_id", hash_col="simhash",
            bits=SIMHASH_BITS, max_hamming=3,
        )
    )
    assert got == exact  # random 60-bit hashes: likely empty, must agree


def test_size_bound_forces_bucketed_even_when_dense(spark):
    hashes = spark.createDataFrame(_dense_rows(), "doc_id long, simhash long")
    dec = {}
    hamming_pairs_auto(
        hashes,
        id_col="doc_id",
        hash_col="simhash",
        bits=SIMHASH_BITS,
        max_hamming=MAXH,
        gemm_max_n=50,  # corpus (120) exceeds the broadcast bound
        decision_out=dec,
    )
    assert dec["kernel"] == "bucketed"


def test_kernels_agree_on_mixed_corpus(spark):
    rows = _dense_rows(40) + [(1000 + i, h) for i, h in _sparse_rows(60)]
    hashes = spark.createDataFrame(rows, "doc_id long, simhash long")
    g = _pairs(
        hamming_pairs_gemm(
            hashes, id_col="doc_id", hash_col="simhash",
            bits=SIMHASH_BITS, max_hamming=MAXH,
        )
    )
    b = _pairs(
        hamming_pairs_bucketed(
            hashes, id_col="doc_id", hash_col="simhash",
            bits=SIMHASH_BITS, max_hamming=MAXH,
        )
    )
    a = _pairs(
        hamming_pairs_auto(
            hashes, id_col="doc_id", hash_col="simhash",
            bits=SIMHASH_BITS, max_hamming=MAXH,
        )
    )
    assert g == b == a and len(g) > 0


def test_estimator_prices_bucket_join_exactly(spark):
    rows = _dense_rows(25) + [(1000 + i, h) for i, h in _sparse_rows(30)]
    hashes = spark.createDataFrame(rows, "doc_id long, simhash long")
    st = hamming_candidate_stats(
        hashes, id_col="doc_id", hash_col="simhash",
        bits=SIMHASH_BITS, max_hamming=MAXH,
    )
    assert st["n_docs"] == 55
    # recompute Σ C(n_k,2) in plain python over the same chunk split
    b = MAXH + 1
    bounds = [(SIMHASH_BITS * j) // b for j in range(b + 1)]
    from collections import Counter

    c = Counter()
    for _, h in rows:
        for j in range(b):
            mask = (1 << (bounds[j + 1] - bounds[j])) - 1
            c[(j, (h >> bounds[j]) & mask)] += 1
    expect = sum(k * (k - 1) // 2 for k in c.values())
    assert st["cand_pairs"] == expect


def test_empty_and_single_doc(spark):
    empty = spark.createDataFrame([], "doc_id long, simhash long")
    dec = {}
    out = hamming_pairs_auto(
        empty, id_col="doc_id", hash_col="simhash",
        bits=SIMHASH_BITS, max_hamming=MAXH, decision_out=dec,
    )
    assert out.count() == 0 and dec["kernel"] == "bucketed"
    one = spark.createDataFrame([(7, 12345)], "doc_id long, simhash long")
    assert (
        hamming_pairs_auto(
            one, id_col="doc_id", hash_col="simhash",
            bits=SIMHASH_BITS, max_hamming=MAXH,
        ).count()
        == 0
    )


def test_density_query_matches_estimator(spark):
    """The registered report and the dispatch's own estimator agree on the
    same corpus (same fingerprints, same census)."""
    from pyvectorsearch_spark.operators.dedup import simhash_64
    from pyvectorsearch_spark.queries.dedup import MAX_HAMMING
    from pyvectorsearch_spark.queries.round7_extra import q_dedup_simhash_density
    from pyvectorsearch_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    row = q_dedup_simhash_density(spark, sf).collect()[0]
    docs = load_table(spark, sf, "documents")
    st = hamming_candidate_stats(
        simhash_64(docs), id_col="doc_id", hash_col="simhash",
        bits=SIMHASH_BITS, max_hamming=MAX_HAMMING,
    )
    assert row.n_docs == st["n_docs"]
    assert row.cand_pairs == st["cand_pairs"]
    assert row.full_pairs == st["n_docs"] * (st["n_docs"] - 1) // 2
    assert row.kernel in ("gemm", "bucketed")
    assert 0.0 <= row.density_r
