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
