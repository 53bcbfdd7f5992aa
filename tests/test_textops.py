from __future__ import annotations

from pyvectorsearch_spark.operators.textops import (
    doc_fingerprint,
    language_id,
    text_quality,
    token_counts,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_language_id_picks_stopword_language(spark):
    df = _df(
        spark,
        [
            (1, "der Hund und die Katze ist ein Tier zu den"),
            (2, "the cat and the dog is a pet of it"),
            (3, "xyzzy qwerty plugh"),  # no stopwords → und
        ],
    )
    out = {r.doc_id: r.pred_lang for r in language_id(df).collect()}
    assert out == {1: "de", 2: "en", 3: "und"}


def test_quality_score_bounds_and_ordering(spark):
    df = _df(
        spark,
        [
            (1, "the " * 60 + "of data and value in it is a table"),  # long, clean
            (2, "@#$% ^&*! ~~"),  # pure punctuation
        ],
    )
    rows = {r.doc_id: r for r in text_quality(df).collect()}
    for r in rows.values():
        assert 0.0 <= r.quality_score <= 1.0
    assert rows[1].quality_score > rows[2].quality_score
    assert rows[2].nonalnum_ratio > 0.5


def test_token_counts(spark):
    df = _df(spark, [(1, "Hello, world! abc123 x")])
    r = token_counts(df).first()
    # tokens: hello, world, abc123, x → ws=4; BPE: hello , world ! abc 123 x
    assert r.n_ws_tokens == 4
    assert r.n_bpe_tokens == 7


def test_fingerprint_normalization_invariance(spark):
    df = _df(
        spark,
        [
            (1, "Key AGG row;   scan!"),
            (2, "key agg row scan"),  # same normalized text
            (3, "completely different content here"),
        ],
    )
    rows = {r.doc_id: r.fingerprint for r in doc_fingerprint(df).collect()}
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]


def test_decontamination_self_match_and_broadcast(spark):
    """Every probe doc is fully contaminated with itself (overlap 1.0), and
    the probe side joins as a broadcast — the corpus never shuffles docs."""
    from pyspark.sql import functions as F

    from pyvectorsearch_spark.operators.textops import ngram_contamination
    from pyvectorsearch_spark.plans import explain_str
    from pyvectorsearch_spark.sources.tables import load_table
    from tests.conftest import SF_T2

    docs = load_table(spark, SF_T2, "documents")
    probes = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("probe_id"), "text"
    )
    out = ngram_contamination(docs, probes, n=8)
    s = explain_str(out)
    assert "BroadcastHashJoin" in s, s[:2000]
    self_rows = {
        r["doc_id"]: r
        for r in out.filter(F.col("doc_id") == F.col("probe_id")).collect()
    }
    assert set(self_rows) == {0, 1, 2}
    for r in self_rows.values():
        assert r["overlap_frac"] == 1.0
        assert r["n_matched"] == r["n_doc_grams"]


def test_repetition_stats_known_values(spark):
    """Hand-checked repetition metrics on constructed docs."""
    from pyvectorsearch_spark.operators.textops import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),      # 2-grams: ab ba ab ba ab -> top 'a b' x3
            (2, "x y z"),            # all distinct: xy yz
            (3, "w"),                # too short: zero grams
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df, n=2).collect()}
    assert rows[1]["n_grams"] == 5 and rows[1]["top_count"] == 3
    assert rows[1]["n_distinct"] == 2
    assert rows[2]["n_grams"] == 2 and rows[2]["dup_gram_frac"] == 0.0
    assert rows[3]["n_grams"] == 0 and rows[3]["top_gram_frac"] == 0.0


def test_chunk_text_coverage_and_overlap(spark):
    """Chunks reconstruct the normalized text (stride-prefixes + last chunk),
    overlap by size-stride chars, and an empty doc yields one empty chunk."""
    from pyvectorsearch_spark.operators.textops import chunk_text

    docs = spark.createDataFrame(
        [
            (1, "The quick brown fox jumps over the lazy dog " * 8),
            (2, "short text"),
            (3, "!!!"),  # normalizes to empty
        ],
        "doc_id long, text string",
    )
    size, stride = 20, 12
    rows = chunk_text(docs, size=size, stride=stride).collect()
    per: dict[int, list] = {}
    for r in rows:
        per.setdefault(r["doc_id"], []).append(r)
    for doc_id, chunks in per.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        # starts advance by exactly stride from 1
        assert [c["chunk_start"] for c in chunks] == [
            1 + i * stride for i in range(len(chunks))
        ]
        # reconstruction: stride-prefix of every chunk but the last + last
        rebuilt = "".join(c["chunk_text"][:stride] for c in chunks[:-1])
        rebuilt += chunks[-1]["chunk_text"]
        # overlap: chunk i's tail == chunk i+1's head (size - stride chars)
        for a, b in zip(chunks, chunks[1:]):
            ov = len(a["chunk_text"]) - stride
            if ov > 0:
                assert a["chunk_text"][stride:] == b["chunk_text"][:ov]
        if doc_id == 3:
            assert chunks == [chunks[0]] and chunks[0]["chunk_text"] == ""
        else:
            norm = " ".join(
                w for w in "".join(
                    ch if ch.isalnum() else " "
                    for ch in dict((r["doc_id"], r["text"]) for r in docs.collect())[doc_id].lower()
                ).split()
            )
            assert rebuilt == norm


def test_chunk_text_rejects_bad_params(spark):
    from pyvectorsearch_spark.operators.textops import chunk_text

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    import pytest

    with pytest.raises(ValueError):
        chunk_text(docs, size=0, stride=1)
    with pytest.raises(ValueError):
        chunk_text(docs, size=10, stride=0)


def test_bm25_rank_basic(spark):
    from pyvectorsearch_spark.operators.textops import bm25_rank

    df = _df(
        spark,
        [
            (1, "spark spark spark fast"),     # high tf for 'spark'
            (2, "spark slow and heavy thing"), # one hit
            (3, "nothing relevant here"),      # no hit → absent
            (4, "hash join"),                  # hits the rarer term
        ],
    )
    rows = bm25_rank(df, ["spark", "hash"], topk=10).collect()
    ids = [r.doc_id for r in rows]
    assert 3 not in ids  # docs without any query term never appear
    by_id = {r.doc_id: r.bm25 for r in rows}
    assert by_id[1] > by_id[2]  # higher tf ⇒ higher score, same term
    assert all(r.bm25 > 0 for r in rows)
    # descending order with id tiebreak
    assert rows == sorted(rows, key=lambda r: (-r.bm25, r.doc_id))


def test_vocab_encode_oov_and_order(spark):
    from pyvectorsearch_spark.operators.textops import vocab_encode

    df = _df(
        spark,
        [
            (1, "aa bb aa cc"),
            (2, "bb zz aa"),
        ],
    )
    # counts: aa=3, bb=2, cc=1, zz=1 → vocab_size=2 keeps aa(1), bb(2)
    rows = {r.doc_id: r for r in vocab_encode(df, vocab_size=2).collect()}
    assert rows[1].n_tokens == 4 and rows[1].n_oov == 1  # cc is OOV
    assert rows[2].n_tokens == 3 and rows[2].n_oov == 1  # zz is OOV
    import hashlib

    # doc1 ids: aa,bb,aa,cc → 1,2,1,0; doc2: bb,zz,aa → 2,0,1
    assert rows[1].ids_digest == hashlib.md5(b"1,2,1,0").hexdigest()
    assert rows[2].ids_digest == hashlib.md5(b"2,0,1").hexdigest()


def test_dup_span_stats_short_docs_and_coverage(spark):
    from pyvectorsearch_spark.operators.textops import dup_span_stats

    df = _df(
        spark,
        [
            (1, "a b c d e f"),   # identical to doc 2 → all grams duplicated
            (2, "a b c d e f"),
            (3, "p q r s t u"),   # unique → zero dup positions
            (4, "x y"),           # shorter than n → zero grams, still present
        ],
    )
    rows = {r.doc_id: r for r in dup_span_stats(df, n=3).collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[1].n_grams == 4 and rows[1].n_dup_positions == 4
    assert rows[1].dup_frac == 1.0
    assert rows[3].n_dup_positions == 0 and rows[3].dup_frac == 0.0
    assert rows[4].n_grams == 0 and rows[4].dup_frac == 0.0


def test_pii_redact_counts_and_order(spark):
    from pyvectorsearch_spark.operators.textops import pii_redact

    df = _df(
        spark,
        [
            (1, "mail a.user+tag@sub.example.org now"),
            (2, "call +4915112345678 or ping 192.168.0.1 twice 10.0.0.255"),
            # an all-numeric "domain" has no alphabetic TLD → not an email;
            # both dotted quads fall through to the IP rule
            (3, "x 1.2.3.4@44.55.66.77 y"),
            (4, "clean text no pii"),
        ],
    )
    rows = {r.doc_id: r for r in pii_redact(df).collect()}
    assert (rows[1].n_emails, rows[1].n_phones, rows[1].n_ips) == (1, 0, 0)
    assert rows[1].redacted == "mail [EMAIL] now"
    assert (rows[2].n_emails, rows[2].n_phones, rows[2].n_ips) == (0, 1, 2)
    assert rows[2].redacted == "call [PHONE] or ping [IP] twice [IP]"
    assert rows[3].n_emails == 0 and rows[3].redacted == "x [IP]@[IP] y"
    assert rows[4].redacted == "clean text no pii"


def test_new_ops_empty_input_stable_schema(spark):
    """Empty corpora must yield empty results with the declared schema (the
    per-batch caller contract), not errors — including BM25, whose corpus
    stats (N, avgdl) degenerate to a null row."""
    from pyvectorsearch_spark.operators.textops import (
        bm25_rank,
        dup_span_stats,
        pii_redact,
        vocab_encode,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    b = bm25_rank(empty, ["spark"])
    assert b.collect() == [] and b.columns == ["doc_id", "bm25"]
    v = vocab_encode(empty)
    assert v.collect() == [] and v.columns == [
        "doc_id", "n_tokens", "n_oov", "ids_digest",
    ]
    d = dup_span_stats(empty)
    assert d.collect() == [] and d.columns == [
        "doc_id", "n_grams", "n_dup_positions", "dup_frac",
    ]
    p = pii_redact(empty)
    assert p.collect() == [] and p.columns == [
        "doc_id", "text", "n_emails", "n_phones", "n_ips", "redacted",
    ]
