"""Unit tests for the round-3 fourth-session operators: spatial ε-join,
phrase search, SRP LSH, containment join — semantics against brute force on
tiny inputs plus the plan-shape scale pins."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyvectorsearch_spark.functions.vector import l2_sq
from pyvectorsearch_spark.operators.spatial import radius_self_join
from pyvectorsearch_spark.operators.textops import phrase_match
from pyvectorsearch_spark.plans import count_exchanges, explain_str
from pyvectorsearch_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _p2(spark):
    return (
        load_table(spark, SF_SMOKE, "embeddings")
        .withColumn("p2", F.slice("embedding", 1, 2))
        .select("vec_id", "p2")
    )


def _brute_pairs(df, radius):
    a = df.select(F.col("vec_id").alias("d1"), F.col("p2").alias("v1"))
    b = df.select(F.col("vec_id").alias("d2"), F.col("p2").alias("v2"))
    return (
        a.join(b, F.col("d1") < F.col("d2"))
        .withColumn("dist2", l2_sq("v1", "v2"))
        .filter(F.col("dist2") <= radius * radius)
        .select("d1", "d2")
    )


def test_radius_join_equals_bruteforce(spark):
    """Grid-bin bucketing is lossless at several radii, including one large
    enough that most points share a cell and one near the coordinate
    granularity."""
    df = _p2(spark)
    for radius in (0.005, 0.02, 0.15):
        got = {
            (r["d1"], r["d2"])
            for r in radius_self_join(
                df, radius=radius, dim=2, id_col="vec_id", vec_col="p2"
            ).collect()
        }
        want = {(r["d1"], r["d2"]) for r in _brute_pairs(df, radius).collect()}
        assert got == want, f"radius={radius}: {len(got)} vs {len(want)}"


def test_radius_join_no_cartesian(spark):
    df = _p2(spark)
    s = explain_str(radius_self_join(df, radius=0.02, dim=2, id_col="vec_id", vec_col="p2"))
    assert "Cartesian" not in s and "BroadcastNestedLoop" not in s, s[:1500]


def test_phrase_match_counts_overlapping(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b a b a"),  # "a b a" at positions 1 and 3 (overlap)
            (2, "A, b; a!"),  # normalization: punctuation/case stripped
            (3, "a b"),  # shorter than the phrase
            (4, "x y z"),  # no match
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_matches"] for r in phrase_match(docs, "a b a").collect()}
    assert got == {1: 2, 2: 1}


def test_phrase_match_zero_shuffle(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    df = phrase_match(docs, "slow hash batch")
    assert count_exchanges(df) == 0, explain_str(df)[:1500]


def test_containment_catches_subset_jaccard_misses(spark):
    """A 5-token doc pasted inside a 60-token doc: containment 1.0, Jaccard
    ~0.05 — the asymmetric join finds it, the symmetric one never would."""
    from pyvectorsearch_spark.operators.dedup import (
        containment_pairs,
        jaccard_similarity_pairs,
    )

    small = "alpha beta gamma delta epsilon"
    big = small + " " + " ".join(f"w{i}" for i in range(55))
    docs = spark.createDataFrame(
        [(1, small), (2, big)], "doc_id long, text string"
    )
    cont = containment_pairs(docs, threshold=0.9).collect()
    assert [(r["d1"], r["d2"], r["containment"]) for r in cont] == [(1, 2, 1.0)]
    assert jaccard_similarity_pairs(docs, threshold=0.9).count() == 0


def test_containment_equals_exhaustive(spark):
    """Probe-prefix filtering is lossless on the real corpus fixture."""
    from pyvectorsearch_spark.functions.text import shingles, tokens
    from pyvectorsearch_spark.operators.dedup import containment_pairs

    docs = load_table(spark, SF_SMOKE, "documents")
    t = 0.8
    got = {
        (r["d1"], r["d2"], r["n_common"])
        for r in containment_pairs(docs, threshold=t).collect()
    }
    ex = docs.select(
        F.col("doc_id").alias("doc"),
        F.explode(shingles(tokens("text"), 3)).alias("s"),
    )
    sizes = ex.groupBy("doc").agg(F.count("*").alias("n_sh"))
    a, b = ex.alias("a"), ex.alias("b")
    common = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc") != F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("d1"), F.col("b.doc").alias("d2"))
        .agg(F.count("*").alias("n_common"))
    )
    want = {
        (r["d1"], r["d2"], r["n_common"])
        for r in common.join(
            sizes.select(F.col("doc").alias("d1"), F.col("n_sh").alias("n1")), "d1"
        )
        .filter(F.round(F.col("n_common") / F.col("n1"), 6) >= t)
        .collect()
    }
    assert got == want


def test_srp_pairs_verified_and_subset_of_bruteforce(spark):
    from pyvectorsearch_spark.functions.vector import cosine_sim
    from pyvectorsearch_spark.operators.dedup import srp_lsh_pairs

    emb = load_table(spark, SF_SMOKE, "embeddings")
    t = 0.4
    got = srp_lsh_pairs(emb, dim=64, min_cosine=t).collect()
    assert all(r["cosine"] >= t for r in got)
    a = emb.select(F.col("vec_id").alias("d1"), F.col("embedding").alias("v1"))
    b = emb.select(F.col("vec_id").alias("d2"), F.col("embedding").alias("v2"))
    brute = {
        (r["d1"], r["d2"])
        for r in a.join(b, F.col("d1") < F.col("d2"))
        .withColumn("c", F.round(cosine_sim("v1", "v2"), 6))
        .filter(F.col("c") >= t)
        .collect()
    }
    assert {(r["d1"], r["d2"]) for r in got} <= brute
    assert len(got) > 0  # candidates exist on this fixture


def test_srp_no_collect_no_broadcast_of_corpus(spark):
    """SRP signatures are a scan projection; the candidate join is an
    equi-join on band keys — no cartesian, no nested-loop."""
    from pyvectorsearch_spark.operators.dedup import srp_lsh_pairs

    emb = load_table(spark, SF_SMOKE, "embeddings")
    s = explain_str(srp_lsh_pairs(emb, dim=64, min_cosine=0.4))
    assert "Cartesian" not in s and "BroadcastNestedLoop" not in s, s[:1500]


def test_cluster_split_never_splits_a_cluster(spark):
    """The leakage-safety invariant itself: every near-dup cluster lands in
    exactly one split."""
    from pyvectorsearch_spark.operators.dedup import jaccard_similarity_pairs
    from pyvectorsearch_spark.operators.graph import dup_clusters
    from pyvectorsearch_spark.operators.sampling import assign_split
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_SMOKE, "documents")
    pairs = jaccard_similarity_pairs(docs, threshold=0.8)
    clustered = dup_clusters(docs, pairs)
    split = assign_split(clustered, id_col="cluster_id", salt="clsplit")
    spans = (
        split.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert spans == 0


def test_dbscan_textbook_fixture(spark):
    """Two dense blobs + one isolated point: blobs become two clusters with
    the ids' minima as labels, the loner is noise, and a point within eps
    of a core but below the density bar is a border."""
    from pyvectorsearch_spark.operators.clustering import dbscan

    pts = [
        # blob A: 4 mutually-close points (all core at min_pts=4)
        (1, [0.0, 0.0]), (2, [0.1, 0.0]), (3, [0.0, 0.1]), (4, [0.1, 0.1]),
        # border: within eps of blob A's corner but only 2 neighbors
        (5, [0.25, 0.1]),
        # blob B: 4 mutually-close points far away
        (10, [5.0, 5.0]), (11, [5.1, 5.0]), (12, [5.0, 5.1]), (13, [5.1, 5.1]),
        # noise
        (99, [9.0, 9.0]),
    ]
    df = spark.createDataFrame(pts, "vec_id long, p2 array<double>")
    out = {
        r["vec_id"]: (r["role"], r["cluster"])
        for r in dbscan(
            df, eps=0.2, min_pts=4, dim=2, id_col="vec_id", vec_col="p2"
        ).collect()
    }
    assert out[1] == ("core", 1) and out[4] == ("core", 1)
    assert out[10] == ("core", 10) and out[13] == ("core", 10)
    assert out[5] == ("border", 1)
    assert out[99] == ("noise", None)


def test_kcore_peels_pendants_keeps_clique(spark):
    """A 4-clique with a pendant chain: the chain peels away, the clique
    survives with within-clique degree 3."""
    from pyvectorsearch_spark.operators.graph import kcore_peel

    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),  # K4
             (4, 5), (5, 6)]  # pendant chain
    pairs = spark.createDataFrame(edges, "d1 long, d2 long")
    out = {r["node"]: r["deg"] for r in kcore_peel(pairs, k=3, rounds=3).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_skyline_exact_with_ties(spark):
    """Dominated rows drop; equal-pair ties both survive; the frontier is
    exactly the brute-force non-dominated set."""
    from pyvectorsearch_spark.operators.skyline import skyline_2d

    rows = [
        (10.0, 5), (10.0, 5),   # tie pair: both kept
        (12.0, 5),              # dominated (worse price, same qty)
        (9.0, 3),               # frontier (cheapest overall)
        (15.0, 9),              # frontier (biggest qty)
        (16.0, 8),              # dominated by (15, 9)
    ]
    df = spark.createDataFrame(rows, "price double, qty long").repartition(3)
    got = sorted(
        (r["price"], r["qty"])
        for r in skyline_2d(df, minimize="price", maximize="qty").collect()
    )
    assert got == [(9.0, 3), (10.0, 5), (10.0, 5), (15.0, 9)]
