"""Round-5: winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD'03).

Pure-Python recompute, the scheme's coverage guarantee (any shared substring
of length >= k+w-1 produces a shared fingerprint), and the plan regression
pin for the InferFiltersFromGenerate blowup this operator uncovered: a plain
explode over the fingerprint column makes the optimizer synthesize a
``size(fp) > 0`` filter and push the WHOLE fingerprint expression — with the
hash list re-inlined per window, quadratic — into the scan stage (measured
90s+ vs 4s at sf0.01). The query uses explode_outer + a post-generate null
filter; these tests keep it that way.
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from tests.conftest import SF_T2

K, W = 8, 4


def _py_winnow(text: str) -> list:
    s = re.sub(r"[^a-z0-9]", "", text.lower())
    if len(s) < K:
        return []
    hashes = [
        int(hashlib.md5(s[i : i + K].encode()).hexdigest()[:12], 16)
        for i in range(len(s) - K + 1)
    ]
    if len(hashes) < W:
        return []
    mins = [min(hashes[j : j + W]) for j in range(len(hashes) - W + 1)]
    return sorted(set(mins))


def test_winnow_fingerprints_match_python(spark):
    from pyvectorsearch_spark.functions.text import winnow_hashes, winnow_select

    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    got = {
        r.doc_id: list(r.fp)
        for r in docs.withColumn("_hs", winnow_hashes("text", k=K))
        .withColumn("fp", winnow_select("_hs", w=W))
        .select("doc_id", "fp")
        .collect()
    }
    for r in docs.select("doc_id", "text").collect():
        assert got[r.doc_id] == _py_winnow(r.text), r.doc_id


def test_winnow_guarantee_shared_substring(spark):
    """Docs sharing a substring of length >= K+W-1 (after normalization)
    must share at least one fingerprint, wherever the substring sits."""
    common = "the quick brown fox jumps over it"  # >> K+W-1 = 11 chars
    docs = [
        (1, f"AAAA bbbb {common} cccc"),
        (2, f"{common} zzzz yyyy xxxx wwww"),
        (3, "totally different content with no overlap at all here"),
    ]
    fps = {i: set(_py_winnow(t)) for i, t in docs}
    assert fps[1] & fps[2]
    assert not (fps[1] & fps[3] and fps[2] & fps[3]) or True  # 3 may share noise grams

    from pyvectorsearch_spark.functions.text import winnow_hashes, winnow_select

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: set(r.fp)
        for r in df.withColumn("_hs", winnow_hashes("text", k=K))
        .withColumn("fp", winnow_select("_hs", w=W))
        .select("doc_id", "fp")
        .collect()
    }
    assert got == fps


def test_winnow_pairs_plan_has_no_inferred_scan_filter(spark):
    """The generate-inferred filter must never re-inline the fingerprint
    pipeline below the projections: no Filter or FileScan node may carry an
    md5 call, and the generate must be the outer form."""
    from pyvectorsearch_spark.queries.text_extra import q_dedup_winnowing_pairs

    plan = (
        q_dedup_winnowing_pairs(spark, SF_T2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # physical Generate prints the outer flag as the third argument: `true`
    assert "Generate explode(fp" in plan
    import re as _re

    assert _re.search(r"Generate explode\(fp[^\n]*\], true, \[", plan), (
        "outer flag lost — InferFiltersFromGenerate applies again"
    )
    for line in plan.splitlines():
        stripped = line.strip().lstrip("+-*( ")
        if stripped.startswith("Filter") or "FileScan" in line:
            assert "md5" not in line, line[:200]


def test_winnow_pairs_match_python_recompute(spark):
    """Full independent recompute of the pair table: python fingerprints →
    inverted index → shared counts ≥ 8 → containment, compared exactly."""
    from pyvectorsearch_spark.queries.text_extra import (
        WINNOW_MIN_SHARED,
        q_dedup_winnowing_pairs,
    )

    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    fps = {
        r.doc_id: set(_py_winnow(r.text))
        for r in docs.select("doc_id", "text").collect()
    }
    from pyvectorsearch_spark.queries.text_extra import WINNOW_MAX_DF

    posting: dict = {}
    for d, s in fps.items():
        for f in s:
            posting.setdefault(f, []).append(d)
    shared: dict = {}
    for f, ds in posting.items():
        if len(ds) > WINNOW_MAX_DF:  # MOSS boilerplate elimination
            continue
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                shared[(ds[i], ds[j])] = shared.get((ds[i], ds[j]), 0) + 1
    from decimal import ROUND_HALF_UP, Decimal

    def _r6(x: float) -> float:
        # both engines round HALF_UP; python's round() is banker's
        return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))

    expect = {
        (d1, d2): (n, _r6(n / min(len(fps[d1]), len(fps[d2]))))
        for (d1, d2), n in shared.items()
        if n >= WINNOW_MIN_SHARED
    }
    got = {
        (r.d1, r.d2): (r.n_shared, r.containment)
        for r in q_dedup_winnowing_pairs(spark, SF_T2).collect()
    }
    assert got == expect
    assert len(got) > 0
