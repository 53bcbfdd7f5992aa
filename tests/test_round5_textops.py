"""Round-5: char-n-gram NB language ID beats the stopword baseline.

VERDICT r4 item 6. The fixture corpus is domain-word text where stopword
hits barely separate labels (the baseline predicts 'en' for almost
everything); char trigrams see sub-word orthography and must win by a
wide margin.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_T2


def test_chargrams_matches_python(spark):
    from pyvectorsearch_spark.functions.text import chargrams

    df = spark.createDataFrame(
        [(1, "Ab c! d"), (2, "xy"), (3, "")], "id long, text string"
    )
    got = {r.id: r.g for r in df.select("id", chargrams("text", 3).alias("g")).collect()}

    def ref(s):
        import re

        s = re.sub(r"[^a-z0-9 ]", "", s.lower())
        return [s[i : i + 3] for i in range(len(s) - 2)]

    assert got[1] == ref("Ab c! d")
    assert got[2] == []  # shorter than n after normalization
    assert got[3] == []


def test_chargrams_duckdb_twin(spark, duck):
    from pyvectorsearch_spark.functions.text import chargrams, duckdb_chargrams

    texts = ["Ab c! d", "xy", "", "hello world 42", "ZZ top?!"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    got = {
        r.id: list(r.g)
        for r in df.select("id", chargrams("text", 3).alias("g")).collect()
    }
    for i, t in enumerate(texts):
        esc = t.replace("'", "''")
        want = duck.sql(
            f"select {duckdb_chargrams(f'''('{esc}')''', 3)}"
        ).fetchone()[0]
        assert got[i] == list(want), t


def _accuracy(pred_df):
    row = (
        pred_df.agg(
            F.avg(
                (F.col("true_label") == F.col("pred_label")).cast("double")
            ).alias("acc")
        ).first()
    )
    return float(row["acc"])


def test_lang_nb_beats_stopword_baseline(spark):
    from pyvectorsearch_spark.functions.text import chargrams
    from pyvectorsearch_spark.operators.textops import language_id, nb_classify
    from pyvectorsearch_spark.sources.tables import load_table

    docs = load_table(spark, SF_T2, "documents").cache()
    nb = nb_classify(docs, features=lambda c: chargrams(c, 3))
    nb_acc = _accuracy(nb)

    base = language_id(docs).join(
        docs.select("doc_id", F.col("lang").alias("true_label")), "doc_id"
    ).select("true_label", F.col("pred_lang").alias("pred_label"))
    base_acc = _accuracy(base)

    # measured on this fixture: ~0.576 vs ~0.396 — pin a wide margin so the
    # assertion survives fixture jitter but catches any feature regression
    assert nb_acc > base_acc + 0.10, (nb_acc, base_acc)
    assert nb_acc > 0.5
    docs.unpersist()
