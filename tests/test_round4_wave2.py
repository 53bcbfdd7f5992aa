"""Unit tests for the round-4 second-wave operators on hand-checkable
inputs (oracle parity covers the registered queries; these pin operator
semantics directly)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_nb_classify_separable_corpus(spark):
    from pyvectorsearch_spark.operators.textops import nb_classify

    rows = [
        (1, "apple banana apple fruit", "food"),
        (2, "banana fruit apple apple", "food"),
        (3, "gear piston engine motor", "cars"),
        (4, "engine motor gear gear", "cars"),
        (5, "apple fruit banana", "food"),
        (6, "piston engine gear", "cars"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    out = {r["doc_id"]: r["pred_label"] for r in nb_classify(df).collect()}
    assert all(out[i] == "food" for i in (1, 2, 5))
    assert all(out[i] == "cars" for i in (3, 4, 6))


def test_maxsim_prefers_aligned_tokens(spark):
    from pyvectorsearch_spark.operators.embeddings import maxsim_topk

    # query doc 0 has two orthogonal unit tokens; doc 1 matches both, doc 2
    # matches only one -> doc 1 must outrank doc 2
    rows = [
        (0, 100, [1.0, 0.0]),
        (0, 101, [0.0, 1.0]),
        (1, 110, [1.0, 0.0]),
        (1, 111, [0.0, 1.0]),
        (2, 120, [1.0, 0.0]),
        (2, 121, [1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "doc bigint, tok_id bigint, embedding array<double>")
    q = df.filter(F.col("doc") == 0)
    out = maxsim_topk(df, q, k=2).collect()
    by_rank = {r["rank"]: (r["doc"], r["maxsim_r"]) for r in out}
    assert by_rank[1][0] == 1 and by_rank[1][1] == 2.0
    assert by_rank[2][0] == 2 and by_rank[2][1] == 1.0


def test_stem_token_rules(spark):
    from pyvectorsearch_spark.operators.textops import stem_token

    cases = {
        "classes": "class",
        "ponies": "poni",
        "cats": "cat",
        "glass": "glass",   # -ss protected
        "bus": "bus",       # -us protected
        "running": "runn",
        "jumped": "jump",
        "bed": "bed",       # too short for -ed strip
        "sing": "sing",     # too short for -ing strip
    }
    df = spark.createDataFrame([(w,) for w in cases], "t string")
    got = {
        r["t"]: r["s"]
        for r in df.select("t", stem_token(F.col("t")).alias("s")).collect()
    }
    assert got == cases


def test_kcenter_selects_extremes(spark):
    from pyvectorsearch_spark.operators.clustering import kcenter_coreset

    # seed = id 0 at origin; farthest point is (10, 0); then (0, 8)
    rows = [
        (0, [0.0, 0.0]),
        (1, [0.1, 0.1]),
        (2, [10.0, 0.0]),
        (3, [0.0, 8.0]),
        (4, [5.0, 0.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, v array<double>")
    out = kcenter_coreset(df, id_col="vec_id", vec_col="v", k=3).collect()
    order = [r["vec_id"] for r in sorted(out, key=lambda r: r["sel_order"])]
    assert order == [0, 2, 3]


def test_mutual_knn_symmetry_and_k_bound(spark):
    from pyvectorsearch_spark.operators.graph import mutual_knn_pairs

    rows = [(i, [float(i), 0.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = mutual_knn_pairs(df, k=1).collect()
    # k=1 on a line: only adjacent pairs where each is the other's nearest;
    # 0-1 qualifies (0's NN is 1, 1's NN is 0 by id tie-break), 2-3 and 4-5
    pairs = sorted((r["d1"], r["d2"]) for r in out)
    for d1, d2 in pairs:
        assert d1 < d2
    assert (0, 1) in pairs
    assert all(r["rank_ab"] <= 1 and r["rank_ba"] <= 1 for r in out)


def test_kmeans_kcenter_empty_input_raise(spark):
    import pytest

    from pyvectorsearch_spark.operators.clustering import (
        kcenter_coreset,
        kmeans_fixed,
    )

    empty = spark.createDataFrame([], "vec_id bigint, v array<double>")
    with pytest.raises(ValueError, match="no rows"):
        kmeans_fixed(empty, id_col="vec_id", vec_col="v", k=2, rounds=1)
    with pytest.raises(ValueError, match="no rows"):
        kcenter_coreset(empty, id_col="vec_id", vec_col="v", k=2)


def test_kcenter_k_exceeds_n_no_duplicates(spark):
    from pyvectorsearch_spark.operators.clustering import kcenter_coreset

    rows = [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id bigint, v array<double>")
    out = kcenter_coreset(df, id_col="vec_id", vec_col="v", k=8).collect()
    ids = [r["vec_id"] for r in out]
    assert len(ids) == len(set(ids)) <= 3


def test_bursts_first_bucket_not_flagged(spark):
    """A flat series must report ZERO bursts — in particular the first
    bucket (whose trailing window is empty) must not fire."""
    import datetime as dt

    from pyvectorsearch_spark.operators.timeseries import resample_counts

    # mirror the query's logic on a flat synthetic series
    from pyspark.sql import Window

    rows = [
        ("a", dt.datetime(2024, 1, 1, h, m))
        for h in range(6)
        for m in (0, 30)
    ]
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp")
    grid = resample_counts(ev, by="event_type", ts_col="ts", width_s=3600)
    wt = (
        Window.partitionBy("event_type")
        .orderBy("bucket_epoch")
        .rowsBetween(-24, -1)
    )
    trail = F.round(F.sum("n").over(wt) / F.count("n").over(wt), 6)
    flagged = grid.select("n", trail.alias("_t")).filter(
        F.col("_t").isNotNull() & (F.col("n").cast("double") > 2.0 * F.col("_t"))
    )
    assert flagged.count() == 0


def test_twostar_cc_chain_and_cliques(spark):
    from pyvectorsearch_spark.operators.graph import connected_components_twostar

    # a 7-node chain (the min-label worst case) + a separate triangle
    edges = [(i, i + 1) for i in range(6)] + [(10, 11), (11, 12), (10, 12)]
    pairs = spark.createDataFrame(edges, "d1 bigint, d2 bigint")
    out = {
        r["node"]: r["cluster"]
        for r in connected_components_twostar(pairs).collect()
    }
    assert all(out[i] == 0 for i in range(7))
    assert all(out[i] == 10 for i in (10, 11, 12))


from hypothesis import HealthCheck, given, settings as hyp_settings, strategies as st

_edge = st.tuples(
    st.integers(min_value=0, max_value=14), st.integers(min_value=0, max_value=14)
)


@given(edges=st.lists(_edge, min_size=1, max_size=20))
@hyp_settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
def test_twostar_cc_equals_minlabel_property(spark, edges):
    """Property: the log-round two-star algorithm and diameter-round
    min-label propagation produce the IDENTICAL (node, component-min)
    labeling on arbitrary graphs (self-loops dropped on both sides)."""
    from pyvectorsearch_spark.operators.graph import (
        connected_components,
        connected_components_twostar,
    )

    clean = [(a, b) for a, b in edges if a != b]
    if not clean:
        clean = [(0, 1)]
    pairs = spark.createDataFrame(clean, "d1 bigint, d2 bigint")
    a = {
        r["node"]: r["cluster"] for r in connected_components(pairs).collect()
    }
    b = {
        r["node"]: r["cluster"]
        for r in connected_components_twostar(pairs).collect()
    }
    assert a == b


def test_srp_multiprobe_superset_recall(spark):
    """Multi-probe SRP must find a SUPERSET of the exact-probe pairs at the
    same threshold (the extra probes only ADD collisions)."""
    from pyvectorsearch_spark.operators.dedup import srp_lsh_pairs
    from pyvectorsearch_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    base = {
        (r["d1"], r["d2"])
        for r in srp_lsh_pairs(emb, dim=64, min_cosine=0.2).collect()
    }
    multi = {
        (r["d1"], r["d2"])
        for r in srp_lsh_pairs(
            emb, dim=64, min_cosine=0.2, probe_flips=1
        ).collect()
    }
    assert base <= multi
    assert len(multi) > len(base)
