from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyvectorsearch_spark.operators.dedup import (
    exact_dedup,
    jaccard_similarity_pairs,
    jaccard_similarity_pairs_exhaustive,
    minhash_lsh_pairs,
    simhash_pairs,
)
from pyvectorsearch_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_exact_dedup_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, "other"), (4, "HELLO world")],
        "doc_id long, text string",
    )
    kept = sorted(r.doc_id for r in exact_dedup(df).collect())
    # exact dedup is case-sensitive: 4 differs from 1/2
    assert kept == [1, 3, 4]


def test_jaccard_pairs_self_similarity(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "a b c d e f g h"),  # identical → J=1
            (3, "z y x w v u t s"),
        ],
        "doc_id long, text string",
    )
    pairs = jaccard_similarity_pairs(df, threshold=0.9).collect()
    assert len(pairs) == 1
    assert (pairs[0].d1, pairs[0].d2) == (1, 2)
    assert pairs[0].jaccard == 1.0


@pytest.mark.slow
def test_jaccard_prefix_filter_is_lossless(spark):
    """The prefix-filtered join must return EXACTLY the exhaustive join's
    pairs — prefix filtering only prunes candidates that cannot reach the
    threshold. Low thresholds stress the prefix-length math hardest."""
    docs = load_table(spark, SF_SMOKE, "documents")
    for t in (0.3, 0.5, 0.8, 0.95, 1.0):
        fast = {
            (r.d1, r.d2, r.n_common)
            for r in jaccard_similarity_pairs(docs, threshold=t).collect()
        }
        slow = {
            (r.d1, r.d2, r.n_common)
            for r in jaccard_similarity_pairs_exhaustive(docs, threshold=t).collect()
        }
        assert fast == slow, f"threshold {t}: {fast ^ slow}"


def test_lsh_finds_planted_near_dups(spark):
    """LSH candidates must cover the high-Jaccard pairs found exactly
    (16 hashes / 4 bands: P[caught] = 1-(1-J^4)^4 ≈ 0.998 at J=0.95)."""
    docs = load_table(spark, SF_SMOKE, "documents")
    exact = {
        (r.d1, r.d2)
        for r in jaccard_similarity_pairs(docs, threshold=0.95).collect()
    }
    assert exact, "fixture should contain planted near-dups"
    lsh = {(r.d1, r.d2) for r in minhash_lsh_pairs(docs, threshold=0.5).collect()}
    missed = exact - lsh
    assert len(missed) <= max(1, len(exact) // 10), f"LSH missed too many: {missed}"


def test_simhash_near_dups_low_hamming(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    exact = {
        (r.d1, r.d2)
        for r in jaccard_similarity_pairs(docs, threshold=0.95).collect()
    }
    sh = {(r.d1, r.d2): r.hamming for r in simhash_pairs(docs, max_hamming=60).collect()}
    for pair in exact:
        assert sh[pair] <= 12, f"near-dup pair {pair} has hamming {sh[pair]}"


def test_connected_components_chain_and_triangle(spark):
    """A 4-chain (tests multi-round propagation), a triangle, and an isolated
    pair; every node must get its component's min id."""
    from pyvectorsearch_spark.operators.graph import connected_components, dup_clusters

    pairs = spark.createDataFrame(
        [(10, 11), (11, 12), (12, 13), (20, 21), (21, 22), (20, 22), (30, 31)],
        "d1 long, d2 long",
    )
    comp = {r.node: r.cluster for r in connected_components(pairs).collect()}
    assert comp == {10: 10, 11: 10, 12: 10, 13: 10,
                    20: 20, 21: 20, 22: 20, 30: 30, 31: 30}

    docs = spark.createDataFrame([(i,) for i in [10, 11, 12, 13, 40]], "doc_id long")
    clusters = {r.doc_id: r.cluster_id for r in dup_clusters(docs, pairs).collect()}
    assert clusters == {10: 10, 11: 10, 12: 10, 13: 10, 40: 40}


def test_connected_components_long_path_converges(spark):
    """A 40-node path needs ~log-diameter... min-propagation needs diameter
    rounds; assert max_iter guards and convergence result is exact."""
    from pyvectorsearch_spark.operators.graph import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "d1 long, d2 long"
    )
    comp = connected_components(pairs, max_iter=45).collect()
    assert all(r.cluster == 0 for r in comp) and len(comp) == 41


def test_simhash_bucketed_equals_kernel(spark):
    """Pigeonhole chunk equi-join (no collect) must produce exactly the
    blocked kernel's pairs — the pigeonhole split is lossless for
    hamming <= max_hamming."""
    from pyvectorsearch_spark.operators.dedup import (
        simhash_pairs_bucketed,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    kern = {(r.d1, r.d2, r.hamming) for r in simhash_pairs(docs, max_hamming=9).collect()}
    buck = {(r.d1, r.d2, r.hamming)
            for r in simhash_pairs_bucketed(docs, max_hamming=9).collect()}
    assert buck == kern
    assert len(buck) > 0


@pytest.mark.slow
def test_embedding_bucketed_equals_bruteforce(spark):
    """Angular-IVF bucketing is lossless: bucketed pairs == the exact
    expression-path self-join, at a threshold tight enough that buckets
    actually prune AND one loose enough that they barely do."""
    from pyvectorsearch_spark.operators.dedup import (
        embedding_dup_pairs,
        embedding_dup_pairs_blocked,
        embedding_dup_pairs_bucketed,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings").cache()
    for t in (0.4, 0.9):
        brute = {(r.d1, r.d2) for r in embedding_dup_pairs(emb, min_cosine=t).collect()}
        buck = {(r.d1, r.d2)
                for r in embedding_dup_pairs_bucketed(emb, min_cosine=t).collect()}
        blocked = {(r.d1, r.d2)
                   for r in embedding_dup_pairs_blocked(emb, min_cosine=t).collect()}
        assert buck == brute, f"threshold {t}"
        assert blocked == brute, f"threshold {t}"


def test_dedup_joins_broadcast_via_aqe_not_hint(spark):
    """The verify joins carry NO broadcast hint (the per-doc table is the
    whole corpus at scale); at this size AQE must still pick broadcast-hash
    joins from runtime stats — check the EXECUTED adaptive plan."""
    docs = load_table(spark, SF_SMOKE, "documents")
    for out in (
        jaccard_similarity_pairs(docs, threshold=0.8),
        minhash_lsh_pairs(docs, threshold=0.5),
    ):
        out.collect()
        final = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in final, final[:3000]


from hypothesis import HealthCheck, given, settings as hyp_settings, strategies as st

# Sparse-corpus regime: a wide vocabulary (hash-spread words) makes SimHash
# fingerprints near-uniform — the regime the pigeonhole bucketed path exists
# for (the dense fixture keeps everything within a few hamming bits, which
# under-exercises the chunk partition logic).
_sparse_doc = st.lists(
    st.integers(min_value=0, max_value=5000).map(lambda n: f"w{n}"),
    min_size=4,
    max_size=30,
)
_sparse_corpus = st.lists(_sparse_doc, min_size=4, max_size=16)


@given(corpus=_sparse_corpus, dup_of=st.integers(min_value=0, max_value=3))
@hyp_settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
def test_simhash_bucketed_equals_kernel_sparse(spark, corpus, dup_of):
    """Property: pigeonhole-bucketed SimHash pairs == dense-kernel pairs on
    arbitrary sparse corpora (plus one planted near-dup so the non-empty
    case is exercised), across the full hamming spectrum."""
    from pyvectorsearch_spark.operators.dedup import (
        simhash_pairs,
        simhash_pairs_bucketed,
    )

    rows = [(i, " ".join(words)) for i, words in enumerate(corpus)]
    # plant a near-dup of one doc (one word appended)
    src = rows[dup_of % len(rows)]
    rows.append((len(rows), src[1] + " extraword"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for max_h in (9, 25):
        kern = {
            (r.d1, r.d2, r.hamming)
            for r in simhash_pairs(docs, max_hamming=max_h).collect()
        }
        buck = {
            (r.d1, r.d2, r.hamming)
            for r in simhash_pairs_bucketed(docs, max_hamming=max_h).collect()
        }
        assert buck == kern
