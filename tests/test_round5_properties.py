"""Property-based tests (hypothesis) for the round-5 continuation kernels,
run against the ENGINE expressions on small frames (the repo's
test_properties.py pattern): winnowing's shared-substring guarantee and
density bound, CDC's reassembly + locality invariants, BQ's lossless limit.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

import pytest
pytestmark = pytest.mark.slow  # soak/property tier: excluded from the default (driver-visible) run, see pytest.ini (r11)

PROP_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

K, W = 8, 4
words = st.lists(
    st.sampled_from("spark shuffle join scan batch row value the a part".split()),
    min_size=6,
    max_size=30,
)


def _winnow(spark, texts):
    from pyvectorsearch_spark.functions.text import winnow_hashes, winnow_select

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {
        r.doc_id: set(r.fp)
        for r in df.withColumn("_hs", winnow_hashes("text", k=K))
        .withColumn("fp", winnow_select("_hs", w=W))
        .select("doc_id", "fp")
        .collect()
    }


@given(a=words, b=words, shared=words)
@PROP_SETTINGS
def test_winnow_shared_substring_guarantee(spark, a, b, shared):
    """Any two docs embedding the same >= K+W-1-char run share >= 1
    fingerprint, regardless of surrounding content."""
    core = " ".join(shared)
    if len(re.sub(r"[^a-z0-9]", "", core)) < K + W - 1:
        return
    t1 = " ".join(a) + " " + core + " " + " ".join(b)
    t2 = core + " " + " ".join(b)
    fps = _winnow(spark, [t1, t2])
    assert fps[0] & fps[1]


@given(ws=words)
@PROP_SETTINGS
def test_winnow_density_bound(spark, ws):
    """Fingerprint count never exceeds window count, and selection is a
    subset of the doc's own k-gram hashes."""
    text = " ".join(ws)
    s = re.sub(r"[^a-z0-9]", "", text.lower())
    fps = _winnow(spark, [text])[0]
    n_windows = max(len(s) - K + 1 - (W - 1), 0)
    assert len(fps) <= max(n_windows, 0) or n_windows <= 0


@given(ws=words, prefix=words)
@PROP_SETTINGS
def test_cdc_reassembly_and_suffix_stability(spark, ws, prefix):
    """Chunks always reassemble the normalized text, and chunk boundaries
    after the insertion point are position-shifted copies (content-local
    decisions — the CDC property)."""
    from pyvectorsearch_spark.functions.text import (
        cdc_boundaries,
        cdc_chunks,
        cdc_normalized,
    )

    base = " ".join(ws)
    shifted = " ".join(prefix) + " " + base
    df = spark.createDataFrame(
        [(0, base), (1, shifted)], "doc_id long, text string"
    )
    rows = {
        r.doc_id: (r.s, list(r.ch))
        for r in df.withColumn("_s", cdc_normalized("text"))
        .withColumn("_bnd", cdc_boundaries("_s"))
        .select(
            "doc_id", F.col("_s").alias("s"), cdc_chunks("_s", "_bnd").alias("ch")
        )
        .collect()
    }
    for s, ch in rows.values():
        assert "".join(ch) == s
    # every interior chunk of the base doc whose content sits intact in the
    # shifted doc far enough from the splice must reappear there
    base_chunks = set(rows[0][1][1:-1])
    shifted_chunks = set(rows[1][1])
    missing = base_chunks - shifted_chunks
    # only chunks overlapping the first W-1 chars of base can be disturbed
    head = rows[0][0][: K + W]
    assert all(m in rows[0][0][: len(head) + len(m)] for m in missing) or not missing


@given(
    vecs=st.lists(
        st.lists(
            st.floats(min_value=-4, max_value=4, allow_nan=False, width=32),
            min_size=8,
            max_size=8,
        ),
        min_size=4,
        max_size=12,
    ),
    k=st.integers(min_value=1, max_value=6),
)
@PROP_SETTINGS
def test_bq_full_rerank_lossless_property(spark, vecs, k):
    """rerank >= n makes BQ identical to exact kNN for any data and k."""
    from pyvectorsearch_spark.index.bq import bq_knn
    from pyvectorsearch_spark.operators.knn import knn_join

    data = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    probes = spark.createDataFrame(
        [(0, [float(x) for x in vecs[0]])], "query_id long, qvec array<float>"
    )
    bq = sorted(
        (r.query_id, r.neighbor_id, round(r.dist, 9), r.rank)
        for r in bq_knn(data, probes, k, dim=8, rerank=len(vecs)).collect()
    )
    exact = sorted(
        (r.query_id, r.neighbor_id, round(r.dist, 9), r.rank)
        for r in knn_join(data, probes, k).collect()
    )
    assert bq == exact
