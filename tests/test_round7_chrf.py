"""Round-7 addition: chrF pair scoring (Popović WMT'15).

Hand-computed fixtures pin the clipping/averaging/F-beta math; oracle
parity for the registered `text_chrf_pairs` query lives in
tests/test_oracle_parity.py.
"""
from __future__ import annotations

from pyvectorsearch_spark.operators.textops import chrf_pairs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "d1 long, d2 long")


def _run(spark, docs, pairs, **kw):
    out = chrf_pairs(_docs(spark, docs), _pairs(spark, pairs), **kw)
    return {(r["d1"], r["d2"]): r.asDict() for r in out.collect()}


class TestChrfPairs:
    def test_identical_docs_score_one(self, spark):
        got = _run(
            spark,
            [(1, "hello world"), (2, "hello world")],
            [(1, 2)],
        )[(1, 2)]
        assert got["chrf_p_r"] == 1.0
        assert got["chrf_r_r"] == 1.0
        assert got["chrf_r"] == 1.0

    def test_disjoint_docs_score_zero(self, spark):
        got = _run(
            spark,
            [(1, "aaaa"), (2, "bbbb")],
            [(1, 2)],
        )[(1, 2)]
        assert got["chrf_r"] == 0.0

    def test_hand_computed_two_orders(self, spark):
        # ref "abc" / cand "abd": 1-gram clip 2 of 3; 2-gram clip 1 of 2
        # P = R = (2/3 + 1/2)/2 = 7/12; beta=2 -> chrF = 5P^2/(5P) = P
        got = _run(
            spark,
            [(1, "abc"), (2, "abd")],
            [(1, 2)],
            max_n=2,
        )[(1, 2)]
        exp = round(7 / 12, 6)
        assert got["chrf_p_r"] == exp
        assert got["chrf_r_r"] == exp
        assert got["chrf_r"] == exp

    def test_beta_weights_recall(self, spark):
        # cand contains ref exactly plus extra chars -> recall 1, precision<1
        # beta=2 must score HIGHER than beta=0.5 (recall-heavy pair)
        docs = [(1, "abab"), (2, "ababxyxy")]
        hi = _run(spark, docs, [(1, 2)], max_n=1, beta=2.0)[(1, 2)]
        lo = _run(spark, docs, [(1, 2)], max_n=1, beta=0.5)[(1, 2)]
        assert hi["chrf_r_r"] == 1.0 and hi["chrf_p_r"] == 0.5
        assert hi["chrf_r"] > lo["chrf_r"]

    def test_short_doc_missing_orders_contribute_zero(self, spark):
        # cand shorter than n=3 chars: order-3 precision/recall terms are 0,
        # but orders 1..2 still count (the documented convention)
        got = _run(
            spark,
            [(1, "abcd"), (2, "ab")],
            [(1, 2)],
            max_n=3,
        )[(1, 2)]
        # p1 = 2/2, p2 = 1/1, p3 = 0 (no cand 3-grams) -> P = 2/3
        assert got["chrf_p_r"] == round(2 / 3, 6)
        # r1 = 2/4, r2 = 1/3, r3 = 0/2 -> R = (1/2 + 1/3)/3
        assert got["chrf_r_r"] == round((0.5 + 1 / 3) / 3, 6)

    def test_unknown_doc_keeps_zero_row(self, spark):
        got = _run(spark, [(1, "abc")], [(1, 99)])
        assert got[(1, 99)]["chrf_r"] == 0.0
