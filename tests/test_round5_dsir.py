"""Round-5: DSIR importance resampling (Xie et al., NeurIPS 2023).

Three-way verification like every round-4/5 statistic: the Spark plan
(operators/sampling.dsir_logweights) vs the DuckDB oracle
(tests/test_oracle_parity.py covers that) vs an INDEPENDENT pure-Python
recompute here — hashlib md5 bucketing, Counter features, math.log — so a
shared bug in the SQL twin can't hide.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_T2

BUCKETS = 256


def _py_features(text: str) -> Counter:
    toks = [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split() if t]
    grams = list(toks) + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    c: Counter = Counter()
    for g in grams:
        b = int(hashlib.md5(f"dsir:{g}".encode()).hexdigest()[:12], 16) % BUCKETS
        c[b] += 1
    return c


def _py_dsir(rows) -> dict:
    """rows: (doc_id, lang, text). Returns doc_id -> log importance."""
    per_doc = {r[0]: _py_features(r[2]) for r in rows}
    lang = {r[0]: r[1] for r in rows}
    rc: Counter = Counter()
    tc: Counter = Counter()
    for d, c in per_doc.items():
        rc.update(c)
        if lang[d] == "en":
            tc.update(c)
    r_tot, t_tot = sum(rc.values()), sum(tc.values())
    w = {
        b: math.log((tc[b] + 1) / (t_tot + BUCKETS))
        - math.log((rc[b] + 1) / (r_tot + BUCKETS))
        for b in rc
    }
    return {d: sum(n * w[b] for b, n in c.items()) for d, c in per_doc.items()}


def test_dsir_logweights_match_python_recompute(spark):
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    rows = [(r.doc_id, r.lang, r.text) for r in docs.collect()]
    expect = _py_dsir(rows)

    from pyvectorsearch_spark.operators.sampling import dsir_logweights

    got = {
        r.doc_id: r.logweight
        for r in dsir_logweights(docs, target=F.col("lang") == "en").collect()
    }
    assert set(got) == set(expect)
    for d in expect:
        assert got[d] == pytest.approx(expect[d], abs=1e-9), d


def test_dsir_weights_separate_target_from_offdomain(spark):
    """The point of DSIR: target-domain docs must score higher on average
    than off-domain docs, and the keep flag must select a non-trivial,
    en-enriched subset."""
    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")

    from pyvectorsearch_spark.operators.sampling import dsir_logweights

    w = dsir_logweights(docs, target=F.col("lang") == "en")
    j = docs.select("doc_id", "lang").join(w, "doc_id")
    avg = {r.lang: r.m for r in j.groupBy("lang").agg(F.avg("logweight").alias("m")).collect()}
    non_en = [v for k, v in avg.items() if k != "en"]
    assert avg["en"] > max(non_en)

    kept = j.filter(F.col("logweight") > 0)
    n_kept, n_all = kept.count(), j.count()
    assert 0 < n_kept < n_all
    en_share_kept = kept.filter(F.col("lang") == "en").count() / n_kept
    en_share_all = j.filter(F.col("lang") == "en").count() / n_all
    assert en_share_kept > en_share_all
