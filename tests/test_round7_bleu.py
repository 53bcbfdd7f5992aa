"""Round-7 addition: self-BLEU pair scoring (Papineni ACL'02 / Zhu SIGIR'18).

Hand-computed fixtures pin the math (clipping, brevity penalty, the
unsmoothed zero rule); oracle parity for the registered `text_bleu_pairs`
query lives in tests/test_oracle_parity.py like every other oracled query.
"""
from __future__ import annotations

import math

from pyvectorsearch_spark.operators.textops import bleu_n_pairs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "d1 long, d2 long")


def _run(spark, docs, pairs, **kw):
    out = bleu_n_pairs(_docs(spark, docs), _pairs(spark, pairs), **kw)
    return {(r["d1"], r["d2"]): r.asDict() for r in out.collect()}


class TestBleuPairs:
    def test_identical_docs_score_one(self, spark):
        got = _run(
            spark,
            [(1, "a b c d"), (2, "a b c d")],
            [(1, 2)],
        )[(1, 2)]
        assert got["clip_1"] == 4 and got["clip_2"] == 3
        assert got["p_1_r"] == 1.0 and got["p_2_r"] == 1.0
        assert got["bp_r"] == 1.0 and got["bleu_r"] == 1.0

    def test_disjoint_docs_score_zero(self, spark):
        got = _run(
            spark,
            [(1, "a b c"), (2, "x y z")],
            [(1, 2)],
        )[(1, 2)]
        assert got["clip_1"] == 0 and got["clip_2"] == 0
        assert got["bleu_r"] == 0.0

    def test_unsmoothed_zero_when_any_order_misses(self, spark):
        # unigrams overlap ("a", "b") but no shared bigram -> p2 = 0 -> BLEU 0
        got = _run(
            spark,
            [(1, "a x b"), (2, "a y b")],
            [(1, 2)],
        )[(1, 2)]
        assert got["clip_1"] == 2 and got["clip_2"] == 0
        assert got["p_1_r"] > 0 and got["bleu_r"] == 0.0

    def test_clipping_and_brevity_hand_computed(self, spark):
        # ref = "a a b c" (r=4), cand = "a a a" (c=3, shorter -> BP applies)
        # clip_1 = min(2,3)[a] = 2; den1 = 3 -> p1 = 2/3
        # cand bigrams: "a a" x2; ref has "a a" x1 -> clip_2 = 1; den2 = 2
        got = _run(
            spark,
            [(1, "a a b c"), (2, "a a a")],
            [(1, 2)],
        )[(1, 2)]
        assert got["clip_1"] == 2 and got["clip_2"] == 1
        assert got["p_1_r"] == round(2 / 3, 6)
        assert got["p_2_r"] == 0.5
        bp = round(math.exp(1.0 - 4.0 / 3.0), 9)
        assert got["bp_r"] == round(bp, 6)
        assert got["bleu_r"] == round(bp * math.sqrt((2 / 3) * 0.5), 6)

    def test_longer_cand_has_no_penalty(self, spark):
        # cand longer than ref -> BP = 1 exactly
        got = _run(
            spark,
            [(1, "a b"), (2, "a b c d e")],
            [(1, 2)],
        )[(1, 2)]
        assert got["bp_r"] == 1.0
        # p1 = 2/5, p2 = 1/4
        assert got["bleu_r"] == round(math.sqrt(0.4 * 0.25), 6)

    def test_pair_with_unknown_doc_keeps_row_zeroed(self, spark):
        got = _run(
            spark,
            [(1, "a b c")],
            [(1, 99)],
        )
        row = got[(1, 99)]
        assert row["bleu_r"] == 0.0 and row["clip_1"] == 0

    def test_unigram_only_order(self, spark):
        got = _run(
            spark,
            [(1, "a b"), (2, "b c")],
            [(1, 2)],
            max_n=1,
        )[(1, 2)]
        assert got["clip_1"] == 1 and got["p_1_r"] == 0.5
        assert got["bleu_r"] == 0.5  # BP=1 (equal length), geo = p1
