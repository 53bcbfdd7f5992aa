"""Property-based tests (hypothesis) for the search semantics — the
invariants SURVEY.md §5 prescribes: result size ≤ k, sorted distances, range
predicate satisfaction, monotonicity in k and radius, insert-order
invariance, and blocked-path equivalence."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from pyvectorsearch_spark.operators.knn import knn_join, knn_join_blocked, range_join

import pytest
pytestmark = pytest.mark.slow  # soak/property tier: excluded from the default (driver-visible) run, see pytest.ini (r11)

DIM = 3

vec = st.lists(
    st.floats(min_value=-8, max_value=8, allow_nan=False, width=32),
    min_size=DIM,
    max_size=DIM,
)
dataset = st.lists(vec, min_size=5, max_size=24)

PROP_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _frames(spark, vecs):
    data = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(0, [float(x) for x in vecs[0]]), (1, [0.0] * DIM)],
        "query_id long, qvec array<float>",
    )
    return data, queries


@given(vecs=dataset, k=st.integers(min_value=1, max_value=30))
@PROP_SETTINGS
def test_knn_size_sorted_and_self_nearest(spark, vecs, k):
    data, queries = _frames(spark, vecs)
    rows = knn_join(data, queries, k).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rs in by_q.items():
        assert len(rs) <= k
        assert len(rs) == min(k, len(vecs))
        ds = [r.dist for r in sorted(rs, key=lambda r: r.rank)]
        assert ds == sorted(ds)
        assert all(d >= 0 for d in ds)
    # query 0 is data point 0: its nearest neighbor distance must be 0
    assert min(r.dist for r in by_q[0]) == 0.0


@given(vecs=dataset, k=st.integers(min_value=1, max_value=10))
@PROP_SETTINGS
def test_knn_monotone_in_k(spark, vecs, k):
    data, queries = _frames(spark, vecs)
    small = {(r.query_id, r.neighbor_id) for r in knn_join(data, queries, k).collect()}
    big = {(r.query_id, r.neighbor_id) for r in knn_join(data, queries, k + 3).collect()}
    assert small <= big


@given(vecs=dataset, radius=st.floats(min_value=0.1, max_value=12.0))
@PROP_SETTINGS
def test_range_predicate_and_monotone(spark, vecs, radius):
    data, queries = _frames(spark, vecs)
    rows = range_join(data, queries, radius).collect()
    assert all(r.dist <= radius**2 + 1e-9 for r in rows)
    bigger = range_join(data, queries, radius * 1.5).collect()
    assert {(r.query_id, r.neighbor_id) for r in rows} <= {
        (r.query_id, r.neighbor_id) for r in bigger
    }


@given(vecs=dataset)
@PROP_SETTINGS
def test_insert_order_invariance(spark, vecs):
    """The reference's one stable observable (SURVEY.md §7): search results
    don't depend on arrival order."""
    data, queries = _frames(spark, vecs)
    shuffled = data.orderBy(F.reverse(F.col("vec_id")))
    a = sorted(
        (r.query_id, r.neighbor_id, r.rank)
        for r in knn_join(data, queries, 4).collect()
    )
    b = sorted(
        (r.query_id, r.neighbor_id, r.rank)
        for r in knn_join(shuffled, queries, 4).collect()
    )
    assert a == b


@given(vecs=dataset, k=st.integers(min_value=1, max_value=8))
@PROP_SETTINGS
def test_blocked_equals_expression_path(spark, vecs, k):
    data, queries = _frames(spark, vecs)
    a = sorted(
        (r.query_id, r.neighbor_id, r.rank, round(r.dist, 9))
        for r in knn_join(data, queries, k).collect()
    )
    b = sorted(
        (r.query_id, r.neighbor_id, r.rank, round(r.dist, 9))
        for r in knn_join_blocked(data, queries, k).collect()
    )
    assert a == b


# ---------------- interval join vs brute force ----------------

_iv = st.tuples(
    st.integers(min_value=0, max_value=5_000_000),  # start offset seconds
    st.integers(min_value=0, max_value=2_000_000),  # length seconds
)


@given(
    points=st.lists(st.integers(min_value=0, max_value=7_000_000), min_size=1, max_size=25),
    intervals=st.lists(_iv, min_size=1, max_size=10),
    bucket=st.sampled_from([3600.0, 86400.0, 604800.0]),
)
@PROP_SETTINGS
def test_interval_join_equals_bruteforce(spark, points, intervals, bucket):
    from pyvectorsearch_spark.operators.temporal import interval_join

    base = 1_700_000_000  # fixed epoch anchor
    p = spark.createDataFrame(
        [(i, base + s) for i, s in enumerate(points)], "pid long, sec long"
    ).withColumn("ts", F.timestamp_seconds("sec"))
    iv = spark.createDataFrame(
        [(j, base + s, base + s + ln) for j, (s, ln) in enumerate(intervals)],
        "iid long, s long, e long",
    ).withColumn("start", F.timestamp_seconds("s")).withColumn(
        "end", F.timestamp_seconds("e")
    )
    got = {
        (r.pid, r.iid)
        for r in interval_join(
            p.select("pid", "ts"), iv.select("iid", "start", "end"),
            bucket_seconds=bucket,
        ).collect()
    }
    want = {
        (i, j)
        for i, s in enumerate(points)
        for j, (st_, ln) in enumerate(intervals)
        if st_ <= s <= st_ + ln
    }
    assert got == want


# ---------------- connected components vs union-find ----------------

@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=14),
            st.integers(min_value=0, max_value=14),
        ),
        min_size=1,
        max_size=20,
    )
)
@PROP_SETTINGS
def test_connected_components_equals_union_find(spark, edges):
    from pyvectorsearch_spark.operators.graph import connected_components

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}

    pairs = spark.createDataFrame(edges, "d1 long, d2 long")
    got = {r.node: r.cluster for r in connected_components(pairs).collect()}
    assert got == want


# ---- text-operator properties: Spark vs pure-Python reference twins ----

words = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"])
doc = st.lists(words, min_size=0, max_size=12)
corpus = st.lists(doc, min_size=1, max_size=10)


def _doc_frame(spark, docs):
    return spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(docs)],
        "doc_id long, text string",
    )


@given(docs=corpus, k=st.integers(min_value=1, max_value=8))
@PROP_SETTINGS
def test_bm25_matches_python_reference(spark, docs, k):
    from pyvectorsearch_spark.operators.textops import bm25_rank

    terms = ["aa", "bb"]
    k1, b = 1.2, 0.75
    got = {
        r.doc_id: r.bm25
        for r in bm25_rank(_doc_frame(spark, docs), terms, k1=k1, b=b, topk=50).collect()
    }
    n = len(docs)
    avgdl = sum(len(d) for d in docs) / n
    dfreq = {t: sum(1 for d in docs if t in d) for t in terms}
    want = {}
    for i, d in enumerate(docs):
        s = 0.0
        for t in terms:
            tf = d.count(t)
            if tf == 0:
                continue
            idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += round(
                idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * len(d) / avgdl)), 6
            )
        if s:
            want[i] = round(s, 6)
    assert got == {i: v for i, v in want.items()}


@given(docs=corpus, n=st.integers(min_value=1, max_value=4))
@PROP_SETTINGS
def test_dup_span_stats_matches_bruteforce(spark, docs, n):
    from pyvectorsearch_spark.operators.textops import dup_span_stats

    got = {
        r.doc_id: (r.n_grams, r.n_dup_positions)
        for r in dup_span_stats(_doc_frame(spark, docs), n=n).collect()
    }
    grams = [
        [tuple(d[i : i + n]) for i in range(len(d) - n + 1)] if len(d) >= n else []
        for d in docs
    ]
    by_gram: dict[tuple, set[int]] = {}
    for i, gs in enumerate(grams):
        for g in gs:
            by_gram.setdefault(g, set()).add(i)
    want = {
        i: (len(gs), sum(1 for g in gs if len(by_gram[g]) >= 2))
        for i, gs in enumerate(grams)
    }
    assert got == want


@given(docs=corpus, v=st.integers(min_value=1, max_value=6))
@PROP_SETTINGS
def test_vocab_encode_matches_python_reference(spark, docs, v):
    import hashlib
    from collections import Counter

    from pyvectorsearch_spark.operators.textops import vocab_encode

    got = {
        r.doc_id: (r.n_tokens, r.n_oov, r.ids_digest)
        for r in vocab_encode(_doc_frame(spark, docs), vocab_size=v).collect()
    }
    cnt = Counter(w for d in docs for w in d)
    ranked = sorted(cnt, key=lambda t: (-cnt[t], t))[:v]
    tid = {t: i + 1 for i, t in enumerate(ranked)}
    want = {}
    for i, d in enumerate(docs):
        if not d:
            continue  # explode drops token-less docs (documented)
        ids = [tid.get(w, 0) for w in d]
        want[i] = (
            len(d),
            sum(1 for w in d if w not in tid),
            hashlib.md5(",".join(map(str, ids)).encode()).hexdigest(),
        )
    assert got == want


@given(
    vecs=st.lists(
        st.lists(
            st.floats(min_value=-4, max_value=4, allow_nan=False, width=32),
            min_size=2,
            max_size=2,
        ),
        min_size=4,
        max_size=20,
    ),
    radius=st.sampled_from([0.05, 0.5, 2.0, 7.9]),
)
@PROP_SETTINGS
def test_radius_join_lossless_property(spark, vecs, radius):
    """Grid-bin ε-join == brute-force θ-join on arbitrary point sets and
    radii (incl. radii larger than the whole extent and boundary-exact
    distances from duplicated points)."""
    from pyvectorsearch_spark.functions.vector import l2_sq
    from pyvectorsearch_spark.operators.spatial import radius_self_join

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, p2 array<double>",
    )
    got = {
        (r["d1"], r["d2"])
        for r in radius_self_join(
            df, radius=radius, dim=2, id_col="vec_id", vec_col="p2"
        ).collect()
    }
    a = df.select(F.col("vec_id").alias("d1"), F.col("p2").alias("v1"))
    b = df.select(F.col("vec_id").alias("d2"), F.col("p2").alias("v2"))
    want = {
        (r["d1"], r["d2"])
        for r in a.join(b, F.col("d1") < F.col("d2"))
        .filter(l2_sq("v1", "v2") <= radius * radius)
        .collect()
    }
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),   # price (small ints force ties)
            st.integers(min_value=0, max_value=6),   # qty
        ),
        min_size=1,
        max_size=24,
    )
)
@PROP_SETTINGS
def test_skyline_equals_bruteforce_property(spark, rows):
    """Two-phase skyline == the O(n²) dominance definition, including
    heavy tie regimes (tiny integer domains)."""
    from pyvectorsearch_spark.operators.skyline import skyline_2d

    df = spark.createDataFrame(
        [(float(p), int(q)) for p, q in rows], "price double, qty long"
    ).repartition(3)
    got = sorted(
        (r["price"], r["qty"])
        for r in skyline_2d(df, minimize="price", maximize="qty").collect()
    )
    want = sorted(
        (float(p), q)
        for (p, q) in rows
        if not any(
            (p2 <= p and q2 >= q and (p2 < p or q2 > q)) for (p2, q2) in rows
        )
    )
    assert got == want


@given(
    a=st.lists(st.tuples(st.integers(0, 4), st.integers(0, 100)), min_size=0, max_size=15),
    b=st.lists(st.tuples(st.integers(0, 4), st.integers(0, 3)), min_size=0, max_size=10),
    asplit=st.integers(2, 4),
    bsplit=st.integers(2, 4),
)
@PROP_SETTINGS
def test_delta_join_equals_from_scratch(spark, a, b, asplit, bsplit):
    """Bilinearity: base-view ⊎ (ΔA⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈ΔB) == rollup of the
    full join, for arbitrary relations and split rules."""
    from pyvectorsearch_spark.operators.incremental import delta_join_counts

    A = spark.createDataFrame(
        [(k, i, float(v)) for i, (k, v) in enumerate(a)], "k long, rid long, val double"
    )
    B = spark.createDataFrame(
        [(k, g) for k, g in b], "k long, g long"
    )
    out = delta_join_counts(
        A.filter(F.col("rid") % asplit != 0),
        A.filter(F.col("rid") % asplit == 0),
        B.filter(F.col("g") % bsplit != 0),
        B.filter(F.col("g") % bsplit == 0),
        key="k",
        group_cols=["g"],
        agg_col="val",
    )
    got = {(r["g"], r["n_pairs"], r["sum_val"]) for r in out.collect()}
    full = (
        A.join(B, "k")
        .groupBy("g")
        .agg(F.count("*").cast("bigint").alias("n"), F.sum("val").alias("s"))
    )
    want = {(r["g"], r["n"], r["s"]) for r in full.collect()}
    assert got == want
