"""Unit tests for top_terms / bigram_lm_score / c4_line_filter against tiny
fixtures with pure-Python twins (sf-parity lives in test_oracle_parity.py)."""

from __future__ import annotations

import math

import pytest

from pyvectorsearch_spark.operators.textops import (
    bigram_lm_score,
    c4_line_filter,
    top_terms,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat sat on the mat", "a"),
        (2, "the cat ran", "a"),
        (3, "dogs bark", "b"),
        (4, "x", "b"),  # single token: no bigrams
    ]
    return spark.createDataFrame(rows, "doc_id int, text string, source string")


def test_top_terms_exact(docs):
    got = {
        (r["source"], r["rank"]): (r["term"], r["n"])
        for r in top_terms(docs, by="source", k=2).collect()
    }
    # source a counts: the=3, cat=2, ...; tie-break term asc
    assert got[("a", 1)] == ("the", 3)
    assert got[("a", 2)] == ("cat", 2)
    # source b: all counts 1 -> alphabetical
    assert got[("b", 1)] == ("bark", 1)
    assert got[("b", 2)] == ("dogs", 1)


def _r6(x: float) -> float:
    """HALF_UP 6-dp rounding on the shortest decimal repr — what Spark's
    ``F.round`` does (BigDecimal.valueOf -> setScale(HALF_UP)); Python's
    built-in round() is half-even and disagrees on exact .5 boundaries."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def _twin_bigram_lm(texts: dict[int, str], smooth: float = 0.5):
    toks = {d: t.split() for d, t in texts.items()}
    vocab = {w for t in toks.values() for w in t}
    bigrams = {d: list(zip(t, t[1:])) for d, t in toks.items()}
    from collections import Counter

    cbg = Counter(b for bs in bigrams.values() for b in bs)
    cuni = Counter(b[0] for bs in bigrams.values() for b in bs)
    out = {}
    for d, bs in bigrams.items():
        if not bs:
            continue
        contribs = [
            _r6(math.log((cbg[b] + smooth) / (cuni[b[0]] + smooth * len(vocab))))
            for b in bs
        ]
        total = _r6(sum(contribs))
        out[d] = (len(bs), _r6(total / len(bs)))
    return out


def test_bigram_lm_matches_python_twin(docs):
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    expect = _twin_bigram_lm(texts)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in bigram_lm_score(docs).collect()
    }
    assert got == expect
    assert 4 not in got  # no-bigram doc excluded


def test_bigram_lm_repeated_text_scores_higher(spark):
    rows = [(1, "a b a b a b a b"), (2, "q w e r t y u i")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r["avg_logprob"] for r in bigram_lm_score(df).collect()}
    assert got[1] > got[2]  # frequent bigrams -> higher mean logprob


def test_c4_line_filter_rules(spark):
    text = "\n".join(
        [
            "this line is long enough.",  # kept
            "too short.",  # < 3 words
            "no terminal punctuation here",  # no [.!?] ending
            "we use a cookie banner here.",  # blacklist hit
            "is this long enough to keep?",  # kept (?)
        ]
    )
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    r = c4_line_filter(df, min_words=3).collect()[0]
    assert r["n_lines"] == 5
    assert r["n_kept"] == 2
    assert r["cleaned"] == "this line is long enough.\nis this long enough to keep?"
    assert r["n_kept_chars"] == len(r["cleaned"])


def test_c4_all_dropped_keeps_doc(spark):
    df = spark.createDataFrame([(1, "short")], "doc_id int, text string")
    r = c4_line_filter(df).collect()[0]
    assert r["n_lines"] == 1 and r["n_kept"] == 0 and r["cleaned"] == ""


def test_bpe_learn_textbook_merges(spark):
    """'low lower lowest' ×weights: the most frequent pair is learned
    first, merged symbols participate in later rounds, ties break
    lexically."""
    from pyvectorsearch_spark.operators.textops import bpe_learn

    docs = spark.createDataFrame(
        [(1, "low low low lower lowest")], "doc_id long, text string"
    )
    rows = bpe_learn(docs, rounds=3).collect()
    got = [(r["merge_rank"], r["pair"], r["merged"], r["n_occurrences"]) for r in rows]
    # 'l o' and 'o w' both appear 5x -> lexical tie-break picks 'l o';
    # round 2 then sees 'lo w' 5x; round 3 merges 'low' pairs onward
    assert got[0] == (1, "l o", "lo", 5)
    assert got[1] == (2, "lo w", "low", 5)
    assert got[2][0] == 3 and got[2][3] >= 1
