"""Regression tests for the round-3 ADVICE findings (all four fixed in
round 4):

1. ``hamming_pairs_bucketed`` chunk extraction must be sign-independent
   (mask, not ``%``) so hashes with bit 63 set — Spark negative longs, as
   ``image_dhash`` produces — keep the lossless pigeonhole guarantee.
2. ``cms_lookup`` must return 0 for never-seen terms (CMS contract: absent
   cells are zero) instead of dropping or overestimating them.
3. ``pii_redact`` counts must agree with the sequential replacements: a
   phone-shaped substring consumed by the email rule is not a phone.
4. ``triangle_stats`` must canonicalize edges defensively so duplicate
   orientations / unordered pairs / self-loops cannot skew the census.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pyvectorsearch_spark.operators.dedup import hamming_pairs_bucketed
from pyvectorsearch_spark.operators.graph import triangle_stats
from pyvectorsearch_spark.operators.sketches import cms_build, cms_lookup
from pyvectorsearch_spark.operators.textops import pii_redact


def _to_i64(v: int) -> int:
    """Wrap a Python non-negative int into the signed 64-bit value Spark
    stores (bit 63 set -> negative long)."""
    return v - (1 << 64) if v >= (1 << 63) else v


def test_hamming_bucketed_negative_hash_chunk0(spark):
    # bits=64, max_hamming=3 -> 4 chunks of 16 bits. h1 and h2 differ in
    # exactly bit 16 (chunk 1), bit 32 (chunk 2) and bit 63 (chunk 3):
    # Hamming distance 3, and the ONLY agreeing chunk is chunk 0. h1 has
    # bit 63 set, so it is a negative long in Spark; with the old `%`
    # extraction its chunk-0 value came out negative and the pair was
    # silently dropped despite being within max_hamming.
    low = 0x1234  # shared chunk-0 bits
    h1 = _to_i64((1 << 63) | (1 << 32) | low)
    h2 = _to_i64((1 << 16) | low)
    df = spark.createDataFrame([(1, h1), (2, h2)], "id bigint, h bigint")
    out = hamming_pairs_bucketed(
        df, id_col="id", hash_col="h", bits=64, max_hamming=3
    ).collect()
    assert [(r["d1"], r["d2"], r["hamming"]) for r in out] == [(1, 2, 3)]


def test_hamming_bucketed_negative_hash_exact_match(spark):
    # identical negative hashes must pair at distance 0 through every chunk
    h = _to_i64(0xFFFF_FFFF_FFFF_FFFF)
    df = spark.createDataFrame([(1, h), (2, h)], "id bigint, h bigint")
    out = hamming_pairs_bucketed(
        df, id_col="id", hash_col="h", bits=64, max_hamming=2
    ).collect()
    assert [(r["d1"], r["d2"], r["hamming"]) for r in out] == [(1, 2, 0)]


def test_cms_lookup_unseen_term_is_zero(spark):
    tf = spark.createDataFrame(
        [("alpha", 5), ("beta", 3)], "term string, n bigint"
    ).withColumn("n", F.col("n").cast("bigint"))
    sk = cms_build(tf, term_col="term", count_col="n", depth=3, width=64)
    probes = spark.createDataFrame(
        [("alpha",), ("never-seen-term",)], "term string"
    )
    est = {
        r["term"]: r["cms_estimate"]
        for r in cms_lookup(sk, probes, term_col="term", depth=3, width=64).collect()
    }
    # the probe row must survive the lookup AND estimate 0 (width=64 for 2
    # terms -> vanishing collision odds; a collision would only raise alpha)
    assert est["alpha"] >= 5
    assert est["never-seen-term"] == 0


def test_pii_phone_inside_email_not_double_counted(spark):
    df = spark.createDataFrame(
        [(1, "reach a+12345678@x.com or dial +4915112345678")],
        "doc_id bigint, text string",
    )
    r = pii_redact(df).collect()[0]
    # the +12345678 local part is consumed by the email rule; only the real
    # standalone phone counts — and counts match the tags in the output
    assert (r["n_emails"], r["n_phones"], r["n_ips"]) == (1, 1, 0)
    assert r["redacted"] == "reach [EMAIL] or dial [PHONE]"
    assert r["redacted"].count("[PHONE]") == r["n_phones"]


def test_triangle_stats_uncanonical_input(spark):
    # the same K3 + pendant graph as test_triangle_stats_known_graph, but
    # fed with mixed orientations, a reversed duplicate, and a self-loop —
    # the census must match the canonical-input answer exactly
    pairs = spark.createDataFrame(
        [(2, 1), (1, 3), (3, 2), (2, 3), (4, 3), (1, 1)],
        "d1 bigint, d2 bigint",
    )
    row = triangle_stats(pairs).collect()[0]
    assert row["n_nodes"] == 4
    assert row["n_edges"] == 4
    assert row["n_triangles"] == 1
    assert row["n_wedges"] == 5
    assert row["gcc_r"] == 0.6


# --- property: pigeonhole completeness over arbitrary 64-bit hash sets -----

from hypothesis import HealthCheck, given, settings as hyp_settings, strategies as st

_hash64 = st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1)


@given(
    hashes=st.lists(_hash64, min_size=2, max_size=10, unique=True),
    flips=st.sets(st.integers(min_value=0, max_value=63), min_size=0, max_size=3),
)
@hyp_settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_hamming_bucketed_lossless_property(spark, hashes, flips):
    """Property: for ANY 64-bit hash set (negative longs included) plus one
    planted neighbor within max_hamming=3 flips, the pigeonhole join finds
    exactly the brute-force pair set — the lossless guarantee the chunk-sign
    fix restored."""
    base = hashes[0]
    # work in the unsigned 64-bit domain: Python's infinite two's
    # complement makes (-1 ^ (1 << 63)) = -2^63 - 1, outside int64
    # (hypothesis-found with flips={0, 63} on base -1)
    planted = base & ((1 << 64) - 1)
    for b in flips:
        planted ^= 1 << b
    planted = planted - (1 << 64) if planted >= (1 << 63) else planted
    vals = list(hashes)
    if planted not in vals:
        vals.append(planted)
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id bigint, h bigint")
    got = {
        (r["d1"], r["d2"], r["hamming"])
        for r in hamming_pairs_bucketed(
            df, id_col="id", hash_col="h", bits=64, max_hamming=3
        ).collect()
    }
    want = set()
    for i, a in rows:
        for j, b in rows:
            if i < j:
                d = bin((a ^ b) & ((1 << 64) - 1)).count("1")
                if d <= 3:
                    want.add((i, j, d))
    assert got == want
