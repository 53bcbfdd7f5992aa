"""Round-6: regression pins for the two ADVICE r5 findings.

1. ``winnow_hashes`` short-input guard: for normalized length L < k,
   Spark's ``sequence(1, L-(k-1))`` counts DOWN — without the guard an
   empty/short doc got 9-L garbage gram hashes and a phantom fingerprint,
   while the DuckDB twin (empty ``range``) and the Python reference
   return []. (ADVICE r5, high.)
2. ``cdc_boundaries`` at normalized length exactly w-1: with
   ``greatest(length, w-1)`` the sequence descended to i = w-1, which
   passed the ``i <= length`` filter and hashed ``substring(s, 0, w)``
   (the whole short string), emitting a boundary DuckDB never sees.
   (ADVICE r5, medium.)

Both are pinned Spark == pure-Python == DuckDB on a corpus of boundary
lengths the sf fixtures never exercise (property texts have min 6 words).
"""

from __future__ import annotations

import hashlib
import re

import duckdb
from pyspark.sql import functions as F

K, WINW = 8, 4  # winnowing k-gram / window
CW, DIV = 8, 32  # CDC window / divisor


def _py_winnow(text: str) -> list:
    s = re.sub(r"[^a-z0-9]", "", text.lower())
    if len(s) < K:
        return []
    hashes = [
        int(hashlib.md5(s[i : i + K].encode()).hexdigest()[:12], 16)
        for i in range(len(s) - K + 1)
    ]
    if len(hashes) < WINW:
        return []
    mins = [min(hashes[j : j + WINW]) for j in range(len(hashes) - WINW + 1)]
    return sorted(set(mins))


def _py_cdc_bnd(text: str) -> list:
    s = re.sub(r"[^a-z0-9 ]", "", text.lower())
    return [
        i
        for i in range(CW, len(s) + 1)
        if int(hashlib.md5(s[i - CW : i].encode()).hexdigest()[:12], 16) % DIV == 0
    ]


# Lengths that straddle every guard: empty, 1, k-1, k, k+w-2 (grams < w),
# k+w-1 (first real fingerprint), and a long control. 'abcaaav' is the
# advisor's verified length-7 CDC repro.
SHORT_DOCS = [
    (0, ""),
    (1, "a"),
    (2, "ab cd"),  # normalized winnow len 4 < k
    (3, "abcdefg"),  # len 7 == k-1 == CW-1
    (4, "abcaaav"),  # the ADVICE cdc repro, len 7
    (5, "abcdefgh"),  # len 8 == k: 1 gram, < w -> winnow []
    (6, "abcdefghij"),  # len 10 == k+w-2: 3 grams, < w -> winnow []
    (7, "abcdefghijk"),  # len 11 == k+w-1: exactly w grams -> 1 window
    (8, "the quick brown fox jumps over the lazy dog repeatedly"),
]


def _duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", SHORT_DOCS)
    return con


def test_winnow_short_docs_spark_python_duckdb(spark):
    from pyvectorsearch_spark.functions.text import (
        duckdb_winnow_hashes,
        duckdb_winnow_select,
        winnow_hashes,
        winnow_select,
    )

    df = spark.createDataFrame(SHORT_DOCS, "doc_id long, text string")
    got = {
        r.doc_id: list(r.fp)
        for r in df.withColumn("_hs", winnow_hashes("text", k=K))
        .withColumn("fp", winnow_select("_hs", w=WINW))
        .collect()
    }
    want = {i: _py_winnow(t) for i, t in SHORT_DOCS}
    assert got == want
    # the advisor's exact repro: empty doc must NOT yield a phantom print
    assert got[0] == []

    con = _duck()
    hs = duckdb_winnow_hashes("text", k=K)
    fp = duckdb_winnow_select("hs", w=WINW)
    oracle = {
        i: list(v)
        for i, v in con.execute(
            f"SELECT doc_id, {fp} FROM (SELECT doc_id, {hs} AS hs FROM d) ORDER BY doc_id"
        ).fetchall()
    }
    assert oracle == want


def test_cdc_short_docs_spark_python_duckdb(spark):
    from pyvectorsearch_spark.functions.text import (
        cdc_boundaries,
        cdc_chunks,
        cdc_normalized,
        duckdb_cdc,
    )

    df = spark.createDataFrame(SHORT_DOCS, "doc_id long, text string")
    rows = (
        df.withColumn("_s", cdc_normalized("text"))
        .withColumn("bnd", cdc_boundaries("_s"))
        .withColumn("ch", cdc_chunks("_s", "bnd"))
        .collect()
    )
    got_bnd = {r.doc_id: list(r.bnd) for r in rows}
    got_ch = {r.doc_id: list(r.ch) for r in rows}
    want = {i: _py_cdc_bnd(t) for i, t in SHORT_DOCS}
    assert got_bnd == want
    # the advisor's exact repro: length-7 doc must have NO boundary
    assert got_bnd[4] == []
    for i, t in SHORT_DOCS:
        assert "".join(got_ch[i]) == re.sub(r"[^a-z0-9 ]", "", t.lower())

    con = _duck()
    s_sql, bnd_sql, chunks_sql = duckdb_cdc("text")
    oracle = {
        i: list(v)
        for i, v in con.execute(
            f"SELECT doc_id, {bnd_sql} AS bnd FROM "
            f"(SELECT doc_id, {s_sql} AS s FROM d) ORDER BY doc_id"
        ).fetchall()
    }
    assert oracle == want


def test_cdc_ingest_matches_python(spark):
    """dedupe-on-ingest recompute: batch chunk bytes already present in the
    corpus store, in pure python from the parquet fixture."""
    import hashlib

    import pandas as pd

    from pyvectorsearch_spark.queries.text_extra import q_dedup_cdc_ingest
    from tests.conftest import SF_T2

    [row] = q_dedup_cdc_ingest(spark, SF_T2).collect()
    docs = pd.read_parquet(f"{SF_T2}/documents.parquet")

    def chunks(t):
        s = re.sub(r"[^a-z0-9 ]", "", t.lower())
        bnd = [
            i for i in range(CW, len(s) + 1)
            if int(hashlib.md5(s[i - CW:i].encode()).hexdigest()[:12], 16)
            % DIV == 0
        ]
        starts = [1] + [x + 1 for x in bnd]
        ends = bnd + [len(s)]
        return [s[a - 1:e] for a, e in zip(starts, ends) if e - a + 1 > 0]

    store = set()
    batch_rows = []
    for _, r in docs.iterrows():
        for c in chunks(r["text"]):
            d = hashlib.md5(c.encode()).hexdigest()
            if r["doc_id"] % 10 == 0:
                batch_rows.append((r["doc_id"], d, len(c)))
            else:
                store.add(d)
    n_docs = len({i for i, _, _ in batch_rows})
    present = [(i, d, l) for i, d, l in batch_rows if d in store]
    assert row.n_batch_docs == n_docs
    assert row.batch_chunks == len(batch_rows)
    assert row.chunks_present == len(present)
    assert row.batch_bytes == sum(l for _, _, l in batch_rows)
    assert row.bytes_present == sum(l for _, _, l in present)
    sav = sum(l for _, _, l in present) / sum(l for _, _, l in batch_rows)
    assert abs(row.transfer_saving_r - round(sav, 6)) < 1e-9
    # the fixture's repeated phrasing makes SOME but not all bytes skippable
    assert 0.05 < sav < 0.95
