"""Round-5: content-defined chunking (LBFS, Muthitacharoen et al. SOSP'01).

Pure-Python recompute of boundaries/chunks, and the property that justifies
CDC over fixed-stride chunking: prepending text to a document disturbs only
a bounded prefix of its chunk set — the shared suffix re-aligns.
"""

from __future__ import annotations

import hashlib
import re

from tests.conftest import SF_T2

W, DIV = 8, 32


def _py_cdc(text: str) -> list:
    s = re.sub(r"[^a-z0-9 ]", "", text.lower())
    bnd = [
        i
        for i in range(W, len(s) + 1)
        if int(hashlib.md5(s[i - W : i].encode()).hexdigest()[:12], 16) % DIV == 0
    ]
    starts = [1] + [x + 1 for x in bnd]
    ends = bnd + [len(s)]
    return [s[a - 1 : e] for a, e in zip(starts, ends) if e - a + 1 > 0]


def test_cdc_chunks_match_python(spark):
    from pyspark.sql import functions as F

    from pyvectorsearch_spark.functions.text import (
        cdc_boundaries,
        cdc_chunks,
        cdc_normalized,
    )

    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    got = {
        r.doc_id: list(r.ch)
        for r in docs.withColumn("_s", cdc_normalized("text"))
        .withColumn("_bnd", cdc_boundaries("_s"))
        .withColumn("ch", cdc_chunks("_s", "_bnd"))
        .select("doc_id", "ch")
        .collect()
    }
    for r in docs.select("doc_id", "text").collect():
        assert got[r.doc_id] == _py_cdc(r.text), r.doc_id
        # chunks reassemble the normalized text exactly
        assert "".join(got[r.doc_id]) == re.sub(r"[^a-z0-9 ]", "", r.text.lower())


def test_cdc_realigns_after_prefix_insertion():
    """The CDC property: prepending content to a long document leaves the
    chunk MULTISET largely intact (boundaries are content-local), whereas
    fixed-stride chunking shifts every chunk."""
    base = (
        "spark shuffles the sorted runs into partitioned batches while the "
        "driver tracks lineage and the executors spill to disk under pressure "
        "then adaptive execution replans the join as a broadcast when the map "
        "side output turns out to be small enough to ship everywhere cheaply"
    ) * 3
    shifted = "breaking news preamble inserted here " + base

    a = _py_cdc(base)
    b = _py_cdc(shifted)
    from collections import Counter

    common = sum((Counter(a) & Counter(b)).values())
    assert common >= 0.7 * len(a)  # most chunks survive the shift

    stride = 32
    fa = [base[i : i + stride] for i in range(0, len(base), stride)]
    norm_shift = re.sub(r"[^a-z0-9 ]", "", shifted.lower())
    fb = [norm_shift[i : i + stride] for i in range(0, len(norm_shift), stride)]
    fixed_common = sum((Counter(fa) & Counter(fb)).values())
    assert common > fixed_common  # CDC strictly beats fixed-stride here


def test_cdc_ratio_consistency(spark):
    """dedup_cdc_ratio internal arithmetic: totals from the per-digest table
    must reproduce the python recompute exactly."""
    from collections import Counter

    from pyvectorsearch_spark.queries.text_extra import q_dedup_cdc_ratio

    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    all_chunks: Counter = Counter()
    for r in docs.select("text").collect():
        all_chunks.update(_py_cdc(r.text))
    total = sum(all_chunks.values())
    distinct = len(all_chunks)
    total_chars = sum(len(c) * n for c, n in all_chunks.items())
    distinct_chars = sum(len(c) for c in all_chunks)

    row = q_dedup_cdc_ratio(spark, SF_T2).first()
    assert row.total_chunks == total
    assert row.distinct_chunks == distinct
    assert row.total_chars == total_chars
    assert row.distinct_chars == distinct_chars
    assert 0.0 <= row.dedup_ratio < 1.0


def test_cdc_containment_matches_python(spark):
    """Independent recompute: per-doc shared-chunk byte fraction."""
    from collections import Counter

    from pyvectorsearch_spark.queries.text_extra import q_dedup_cdc_containment

    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    chunks_by_doc = {
        r.doc_id: _py_cdc(r.text) for r in docs.select("doc_id", "text").collect()
    }
    df: Counter = Counter()
    for ch in chunks_by_doc.values():
        df.update(ch)
    got = {r.doc_id: r for r in q_dedup_cdc_containment(spark, SF_T2).collect()}
    for d, ch in chunks_by_doc.items():
        n_chars = sum(len(c) for c in ch)
        shared = sum(len(c) for c in ch if df[c] > 1)
        assert got[d].n_chunks == len(ch), d
        assert got[d].n_chars == n_chars, d
        assert got[d].shared_chars == shared, d
    # the fixture has near-dups: some docs must show high containment
    assert any(r.containment > 0.5 for r in got.values())
    assert any(r.containment < 0.5 for r in got.values())
