"""Round-7 additions: margin-based pair mining + ROUGE-N pair scoring.

Hand-computed fixtures pin the math; oracle parity for the registered
queries (`embedding_margin_mining`, `text_rouge_pairs`) lives in
tests/test_oracle_parity.py like every other oracled query.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from pyvectorsearch_spark.operators.embeddings import margin_mining
from pyvectorsearch_spark.operators.textops import rouge_n_pairs


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


class TestMarginMining:
    def test_hub_demotion(self, spark):
        # y=10 is a HUB: moderately close to both anchors. y=11 matches x=0
        # exclusively. Raw cosine would rank the hub equal; the margin ranks
        # the exclusive match higher because the hub's backward top-k mean
        # (its local density) is high.
        x = _emb(spark, [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])])
        y = _emb(
            spark,
            [
                (10, [1.0, 1.0, 0.0]),   # hub: cos .7071 to both anchors
                (11, [0.9, 0.1, 0.0]),   # exclusive near-match of x=0
                (12, [0.0, 0.9, 0.3]),   # near-match of x=1
            ],
        )
        out = {
            r["x_id"]: r
            for r in margin_mining(x, y, k=2).collect()
        }
        assert out[0]["y_id"] == 11  # exclusive match beats the hub on cos
        assert out[1]["y_id"] == 12
        # both best pairs are mutual here (each y's best x is its anchor)
        assert out[0]["mutual"] and out[1]["mutual"]
        # margin > 1: the best match stands out of its local neighborhood
        assert out[0]["margin_r"] > 1.0

    def test_mutual_flag_asymmetric(self, spark):
        # Two anchors share the same best y; only one direction is mutual.
        x = _emb(spark, [(0, [1.0, 0.0]), (1, [0.95, 0.31225])])
        y = _emb(spark, [(10, [1.0, 0.05]), (11, [-1.0, 0.5])])
        rows = {r["x_id"]: r for r in margin_mining(x, y, k=1).collect()}
        assert rows[0]["y_id"] == 10 and rows[1]["y_id"] == 10
        # y=10's single best x is x=0 (cos higher), so only x=0 is mutual
        assert rows[0]["mutual"] is True
        assert rows[1]["mutual"] is False

    def test_k_validation(self, spark):
        x = _emb(spark, [(0, [1.0, 0.0])])
        try:
            margin_mining(x, x, k=0)
            raise AssertionError("expected ValueError")
        except ValueError:
            pass


class TestRougePairs:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_hand_computed_bigrams(self, spark):
        # ref: "a b a b c" -> bigrams [ab, ba, ab, bc]: counts ab=2 ba=1 bc=1 (t=4)
        # cand: "a b c a b" -> bigrams [ab, bc, ca, ab]: counts ab=2 bc=1 ca=1 (t=4)
        # clip = min(2,2) + min(1,0) + min(1,1) = 3
        docs = self._docs(spark, [(1, "a b a b c"), (2, "a b c a b")])
        pairs = spark.createDataFrame([(1, 2)], "d1 long, d2 long")
        r = rouge_n_pairs(docs, pairs, n=2).collect()[0]
        assert r["clip"] == 3
        assert r["rouge_recall_r"] == 0.75
        assert r["rouge_precision_r"] == 0.75
        assert r["rouge_f1_r"] == 0.75

    def test_zero_overlap_keeps_row(self, spark):
        docs = self._docs(spark, [(1, "a b c"), (2, "x y z")])
        pairs = spark.createDataFrame([(1, 2)], "d1 long, d2 long")
        r = rouge_n_pairs(docs, pairs, n=2).collect()[0]
        assert r["clip"] == 0 and r["rouge_f1_r"] == 0.0

    def test_unigram_multiset_clipping(self, spark):
        # ref "a a a b" vs cand "a b b b": clip = min(3,1) + min(1,3) = 2
        docs = self._docs(spark, [(1, "a a a b"), (2, "a b b b")])
        pairs = spark.createDataFrame([(1, 2)], "d1 long, d2 long")
        r = rouge_n_pairs(docs, pairs, n=1).collect()[0]
        assert r["clip"] == 2 and r["rouge_f1_r"] == 0.5

    def test_asymmetric_lengths(self, spark):
        # ref "a b" (1 bigram), cand "a b a b a b" (5 bigrams: ab x3, ba x2)
        # clip = min(1,3) = 1; R = 1/1, P = 1/5, F1 = 2/6
        docs = self._docs(spark, [(1, "a b"), (2, "a b a b a b")])
        pairs = spark.createDataFrame([(1, 2)], "d1 long, d2 long")
        r = rouge_n_pairs(docs, pairs, n=2).collect()[0]
        assert r["rouge_recall_r"] == 1.0
        assert r["rouge_precision_r"] == 0.2
        assert r["rouge_f1_r"] == round(2.0 / 6.0, 6)

    def test_n_validation(self, spark):
        docs = self._docs(spark, [(1, "a b")])
        pairs = spark.createDataFrame([(1, 1)], "d1 long, d2 long")
        try:
            rouge_n_pairs(docs, pairs, n=0)
            raise AssertionError("expected ValueError")
        except ValueError:
            pass
