"""Unit tests for the round-4 additions: HyperLogLog distinct sketch, HTML
extraction, and the URL census (oracle-parity covers the registered queries;
these pin operator semantics on hand-checkable inputs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyvectorsearch_spark.operators.sketches import HLL_M, hll_distinct
from pyvectorsearch_spark.operators.textops import html_clean, url_stats


def test_hll_small_range_is_linear_counting_and_accurate(spark):
    # 50 distinct values << m=256: the linear-counting branch fires and is
    # typically within a few percent at this load factor
    df = spark.createDataFrame([("g", i) for i in range(50)], "g string, v int")
    r = hll_distinct(df, by="g", value_col="v").collect()[0]
    assert r["n_distinct_exact"] == 50
    assert r["n_empty_registers"] > 0
    assert abs(r["hll_estimate"] - 50) / 50 < 0.15


def test_hll_raw_estimator_accuracy(spark):
    # 5000 distinct >> m: the raw harmonic estimator fires; standard error
    # is ~1.04/sqrt(256) = 6.5%, assert a generous 3-sigma band
    df = spark.createDataFrame(
        [("g", i) for i in range(5000)], "g string, v int"
    )
    r = hll_distinct(df, by="g", value_col="v").collect()[0]
    assert r["n_distinct_exact"] == 5000
    assert abs(r["hll_estimate"] - 5000) / 5000 < 0.20


def test_hll_duplicate_insensitive(spark):
    # the sketch is a function of the value SET: duplicates change nothing
    once = spark.createDataFrame([("g", i) for i in range(300)], "g string, v int")
    thrice = once.union(once).union(once)
    a = hll_distinct(once, by="g", value_col="v").collect()[0]
    b = hll_distinct(thrice, by="g", value_col="v").collect()[0]
    assert a["harmonic_scaled"] == b["harmonic_scaled"]
    assert a["hll_estimate"] == b["hll_estimate"]


def test_hll_register_checksum_bounds(spark):
    # every register empty except those hit: harmonic_scaled <= m * 2^45
    df = spark.createDataFrame([("g", 1)], "g string, v int")
    r = hll_distinct(df, by="g", value_col="v").collect()[0]
    assert r["n_empty_registers"] == HLL_M - 1
    assert r["harmonic_scaled"] < HLL_M * (1 << 45)


def test_html_clean_semantics(spark):
    df = spark.createDataFrame(
        [
            (
                1,
                '<html><body><h1>Hi</h1><p>a &amp; b &lt;c&gt;</p>'
                "<script>drop()</script><style>x{}</style>ok</body></html>",
            ),
            (2, "no markup at all"),
            (3, "&amp;lt; stays encoded once"),
        ],
        "doc_id bigint, text string",
    )
    rows = {r.doc_id: r for r in html_clean(df).collect()}
    assert rows[1].clean == 'Hi a & b <c> ok'
    # html, body, h1, /h1, p, /p, /body, /html = 8 tags after script/style
    # blocks (content included) are gone
    assert rows[1].n_tags == 8
    assert rows[2].clean == "no markup at all" and rows[2].n_tags == 0
    # &amp; decodes last: '&amp;lt;' -> '&lt;' literally, never '<'
    assert rows[3].clean == "&lt; stays encoded once"


def test_html_clean_multiline_script(spark):
    df = spark.createDataFrame(
        [(1, "before<script>\nline1\nline2\n</script>after")],
        "doc_id bigint, text string",
    )
    r = html_clean(df).collect()[0]
    assert r.clean == "before after"


def test_url_stats_counts_and_blocklist(spark):
    df = spark.createDataFrame(
        [
            (1, "go https://a.example.org/x and https://a.example.org/y"),
            (2, "see https://a.example.org/z plus http://ads.bad.net/p"),
            (3, "nothing here"),
        ],
        "doc_id bigint, text string",
    )
    out = {r.domain: r for r in url_stats(df, blocked_suffixes=[".bad.net"]).collect()}
    assert out["a.example.org"].n_urls == 3
    assert out["a.example.org"].n_docs == 2
    assert out["a.example.org"].blocked is False
    assert out["ads.bad.net"].n_urls == 1 and out["ads.bad.net"].blocked is True
    assert set(out) == {"a.example.org", "ads.bad.net"}


def _vec_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, v array<double>")


def test_kmeans_two_blobs(spark):
    from pyvectorsearch_spark.operators.clustering import kmeans_fixed

    # two tight, well-separated 2-d blobs; ids 0/1 (one in each blob) seed
    # the centroids, so Lloyd must recover the blobs exactly
    blob_a = [(i, [0.1 + 0.001 * i, 0.1]) for i in range(0, 10, 2)]
    blob_b = [(i, [0.9 + 0.001 * i, 0.9]) for i in range(1, 11, 2)]
    df = _vec_df(spark, blob_a + blob_b)
    out = kmeans_fixed(df, id_col="vec_id", vec_col="v", k=2, rounds=2).collect()
    sizes = sorted(r["n_members"] for r in out)
    assert sizes == [5, 5]
    # tight blobs -> tiny within-cluster inertia
    assert all(r["inertia"] < 1000 for r in out)


def test_kmeans_inertia_nonincreasing(spark):
    from pyvectorsearch_spark.operators.clustering import kmeans_fixed

    from pyvectorsearch_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    tot = {}
    for rounds in (1, 2, 3):
        out = kmeans_fixed(
            emb, id_col="vec_id", vec_col="embedding", k=4, rounds=rounds
        ).collect()
        tot[rounds] = sum(r["inertia"] for r in out)
    # Lloyd monotonicity (integer rounding can add ~per-dim slack; allow it)
    assert tot[2] <= tot[1] + 64
    assert tot[3] <= tot[2] + 64


def test_kmeans_empty_cluster_survives(spark):
    from pyvectorsearch_spark.operators.clustering import kmeans_fixed

    # three seeds but only two real locations: one cluster may end empty —
    # the run must not error and the members must still sum to the input
    rows = [(0, [0.0, 0.0]), (1, [0.001, 0.0]), (2, [1.0, 1.0]),
            (3, [0.0, 0.001]), (4, [1.0, 0.999])]
    df = _vec_df(spark, rows)
    out = kmeans_fixed(df, id_col="vec_id", vec_col="v", k=3, rounds=2).collect()
    assert sum(r["n_members"] for r in out) == 5


def test_incremental_dedup_delta_verdicts(spark):
    from pyvectorsearch_spark.operators.dedup import incremental_dedup_delta

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six seven eight nine"),
            (3, "totally different words entirely here now ok fine"),
        ],
        "doc_id bigint, text string",
    )
    delta = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta eta theta"),  # exact of 1
            (11, "one two three four five six seven eight XXXX"),  # near of 2
            (12, "nothing in common with anything in the corpus at all"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: (r["verdict"], r["match_id"])
        for r in incremental_dedup_delta(corpus, delta, threshold=0.3).collect()
    }
    assert out[10] == ("exact_dup", 1)
    assert out[11][0] == "near_dup" and out[11][1] == 2
    assert out[12] == ("unique", None)


def test_incremental_dedup_exact_wins_over_near(spark):
    from pyvectorsearch_spark.operators.dedup import incremental_dedup_delta

    # a delta doc that exactly matches corpus doc 5 AND near-matches doc 1
    # must report exact_dup with the exact match id
    text = "alpha beta gamma delta epsilon zeta eta theta"
    corpus = spark.createDataFrame(
        [(1, text + " extra"), (5, text)], "doc_id bigint, text string"
    )
    delta = spark.createDataFrame([(9, text)], "doc_id bigint, text string")
    r = incremental_dedup_delta(corpus, delta, threshold=0.3).collect()[0]
    assert (r["verdict"], r["match_id"]) == ("exact_dup", 5)


def test_grid_box_search_semantics(spark):
    from pyvectorsearch_spark.index.grid import GridIndex

    rows = [(i, [float(i) / 10.0, float(i) / 10.0]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id bigint, v array<float>")
    idx = GridIndex.build(df, vec_col="v", id_col="vec_id", target_occupancy=4)
    probes = spark.createDataFrame(
        [
            (1, [0.15, 0.15], [0.45, 0.45]),  # points 2,3,4
            (2, [5.0, 5.0], [6.0, 6.0]),      # empty
            (3, [-1.0, -1.0], [2.0, 2.0]),    # everything
        ],
        "query_id bigint, qlo array<float>, qhi array<float>",
    )
    out = idx.box(probes).collect()
    got = {}
    for r in out:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert got[1] == {2, 3, 4}
    assert 2 not in got
    assert got[3] == set(range(10))


def test_round4_ops_empty_input_stable_schema(spark):
    """Empty inputs must yield empty results with the declared schema, not
    errors (the per-batch caller contract)."""
    from pyvectorsearch_spark.operators.dedup import incremental_dedup_delta
    from pyvectorsearch_spark.operators.graph import mutual_knn_pairs
    from pyvectorsearch_spark.operators.sketches import hll_distinct
    from pyvectorsearch_spark.operators.textops import (
        feature_hash,
        html_clean,
        url_stats,
    )
    from pyvectorsearch_spark.operators.timeseries import sweep_peak_concurrency

    edocs = spark.createDataFrame([], "doc_id long, text string")
    h = html_clean(edocs)
    assert h.collect() == [] and h.columns == ["doc_id", "text", "n_tags", "clean"]
    u = url_stats(edocs)
    assert u.collect() == [] and u.columns == ["domain", "n_urls", "n_docs", "blocked"]
    f = feature_hash(edocs)
    assert f.collect() == [] and f.columns == ["doc_id", "nnz", "l1_norm", "vec_digest"]

    eev = spark.createDataFrame([], "event_type string, user_id long")
    s = hll_distinct(eev, by="event_type", value_col="user_id")
    assert s.collect() == [] and s.columns == [
        "event_type", "n_distinct_exact", "hll_estimate",
        "n_empty_registers", "harmonic_scaled",
    ]

    eiv = spark.createDataFrame([], "s date, e date")
    p = sweep_peak_concurrency(eiv, start_col="s", end_col="e")
    assert p.collect() == [] and p.columns == [
        "bucket", "peak_concurrent", "peak_date",
    ]

    evec = spark.createDataFrame([], "vec_id long, embedding array<float>")
    m = mutual_knn_pairs(evec, k=3)
    assert m.collect() == [] and m.columns == [
        "d1", "d2", "rank_ab", "rank_ba", "dist_r",
    ]

    # empty DELTA against a non-empty corpus: all verdict machinery must
    # survive with zero output rows
    corpus = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    d = incremental_dedup_delta(corpus, edocs)
    assert d.collect() == [] and d.columns == ["doc_id", "verdict", "match_id"]


def test_url_canonical_edge_cases(spark):
    from pyvectorsearch_spark.operators.textops import url_canonical

    cases = [
        (1, "HTTPS://WWW.Example.ORG/A/B"),        # case: host lowered, path kept
        (2, "https://x.org:443/p"),                 # default port stripped
        (3, "http://x.org:80/p"),                   # default http port stripped
        (4, "https://x.org:8080/p"),                # non-default port kept
        (5, "https://x.org/p?utm_source=a&q=1"),    # utm stripped, q kept
        (6, "https://x.org/p?utm_source=a"),        # only-utm -> bare path
        (7, "https://x.org/p#sec"),                 # fragment stripped
        (8, "https://x.org/p/"),                    # trailing slash stripped
        (9, "https://x.org/p?xutm_a=1"),            # NOT a utm param: kept
        (10, "https://x.org/p?UTM_SOURCE=a"),       # uppercase utm stripped
        (11, "https://x.org/p?utm_a=1&utm_b=2"),    # every utm param goes
        (12, "https://x.org/p?q=1&utm_a=2"),        # non-utm neighbor kept
    ]
    df = spark.createDataFrame(cases, "id bigint, u string")
    got = {
        r["id"]: r["c"]
        for r in df.select("id", url_canonical(F.col("u")).alias("c")).collect()
    }
    assert got[1] == "https://www.example.org/A/B"
    assert got[2] == "https://x.org/p"
    assert got[3] == "http://x.org/p"
    assert got[4] == "https://x.org:8080/p"
    assert got[5] == "https://x.org/p?q=1"
    assert got[6] == "https://x.org/p"
    assert got[7] == "https://x.org/p"
    assert got[8] == "https://x.org/p"
    assert got[9] == "https://x.org/p?xutm_a=1"
    assert got[10] == "https://x.org/p"
    assert got[11] == "https://x.org/p"
    assert got[12] == "https://x.org/p?q=1"


def test_hll_registers_mergeable(spark):
    """The HLL state claim: registers of A ∪ B == per-register max of the
    two register tables — union across shards/epochs without re-reading."""
    from pyvectorsearch_spark.operators.sketches import (
        hll_fold,
        hll_registers,
    )

    a = spark.createDataFrame([("g", i) for i in range(0, 400)], "g string, v int")
    b = spark.createDataFrame([("g", i) for i in range(200, 700)], "g string, v int")
    ra, rb = hll_registers(a, by="g", value_col="v"), hll_registers(
        b, by="g", value_col="v"
    )
    merged = (
        ra.unionByName(rb)
        .groupBy("g", "_j")
        .agg(F.max("_mj").alias("_mj"))
    )
    direct = hll_registers(a.union(b), by="g", value_col="v")
    fm = hll_fold(merged, by="g").collect()[0]
    fd = hll_fold(direct, by="g").collect()[0]
    assert fm["harmonic_scaled"] == fd["harmonic_scaled"]
    assert fm["hll_estimate"] == fd["hll_estimate"]


# --- property: delta dedup vs ground truth ---------------------------------

from hypothesis import HealthCheck, given, settings as hyp_settings, strategies as st

_word = st.integers(min_value=0, max_value=40).map(lambda n: f"w{n}")
_doc = st.lists(_word, min_size=4, max_size=12).map(" ".join)


@given(
    corpus=st.lists(_doc, min_size=2, max_size=6),
    delta=st.lists(_doc, min_size=1, max_size=4),
    copy_idx=st.integers(min_value=0, max_value=5),
)
@hyp_settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
def test_incremental_dedup_exact_verdicts_property(
    spark, corpus, delta, copy_idx
):
    """Property: the exact_dup verdict set is EXACTLY the delta docs whose
    text occurs verbatim in the corpus (with the smallest matching id), for
    arbitrary corpora — including a planted copy so the non-empty case
    always fires. (The near tier is probabilistic by design — LSH — so the
    property pins the exact tier and verdict partitioning only.)"""
    from pyvectorsearch_spark.operators.dedup import incremental_dedup_delta

    crows = [(i, t) for i, t in enumerate(corpus)]
    drows = [(100 + i, t) for i, t in enumerate(delta)]
    drows.append((200, corpus[copy_idx % len(corpus)]))
    c = spark.createDataFrame(crows, "doc_id bigint, text string")
    d = spark.createDataFrame(drows, "doc_id bigint, text string")
    out = {
        r["doc_id"]: (r["verdict"], r["match_id"])
        for r in incremental_dedup_delta(c, d, threshold=0.9).collect()
    }
    ctext = {}
    for i, t in crows:
        ctext.setdefault(t, i)
    assert set(out) == {i for i, _ in drows}
    for did, t in drows:
        verdict, match = out[did]
        if t in ctext:
            assert verdict == "exact_dup" and match == ctext[t]
        else:
            assert verdict in ("near_dup", "unique")
            if verdict == "unique":
                assert match is None
