"""Distributed model training as pure relational algebra (outside the
driver's pinned 50-entry window; covered by tests/test_oracle_parity.py).

``text_lr_calibrate`` — Platt calibration (Platt 1999) of the char-trigram
Naive Bayes language-ID margin: 1-D logistic regression p(en | margin) =
sigmoid(a*s + b), trained with LR_ITERS full-batch gradient-descent steps.
This is the canonical distributed training loop: each step is ONE
map-side-combined aggregate over the corpus (the 2-term gradient), and the
weight pair broadcasts back — at 100 TB an epoch costs one scan of a
2-column margin table plus a 2-double reduce, the same aggregate shape
MLlib's LBFGS uses underneath. Fixed iterations + deterministic features
keep the WHOLE RUN SQL-expressible, so the learned weights, the
monotonically-decreasing train log-loss, and the calibrated accuracy are
all hash-checked against DuckDB — a training loop with an exactness
oracle. Convergence (log-loss strictly decreases every step; calibrated
accuracy beats the majority class) is re-proven independently in numpy by
tests/test_round6_ml.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyvectorsearch_spark.plans.cachepool import pooled_persist
from pyvectorsearch_spark.sources.tables import load_table, spread

LR_ITERS = 6
LR_RATE = 4.0
MARGIN_SCALE = 10.0  # NB margins span ~±17 on this corpus; /10 keeps GD stable
# Each step's gradient components round to GRAD_DP before the weight
# update ON BOTH ENGINES: F.avg over doubles sums in nondeterministic
# partition order (~1e-16 relative drift), and without the rounding the
# whole LR_RATE-amplified trajectory relies on the final 6-dp rounding
# to absorb it (ADVICE r6). With it, every (b, a) along the trajectory
# is a bit-identical IEEE double in Spark and DuckDB — the same
# integer-exact-ladder discipline the NB scores use. 10 dp absorbs
# summation-order drift (~1e-16) with 6 decades of headroom while
# perturbing the gradient ~1e-10, invisible at the 6-dp report scale.
GRAD_DP = 10


def _margin_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(y, s): is-English label and the scaled NB margin
    score(en) - max(score(other)) — binary reduction of the multi-class
    score table (one filter + one max rollup + one id-keyed join)."""
    from pyvectorsearch_spark.functions.text import chargrams
    from pyvectorsearch_spark.operators.textops import nb_score_table

    docs = spread(load_table(spark, sf_dir, "documents"))
    scores = nb_score_table(docs, features=lambda c: chargrams(c, 3))
    en = scores.filter(F.col("_ml") == "en").select(
        "_id", "_lbl", F.col("_score").alias("_se")
    )
    other = (
        scores.filter(F.col("_ml") != "en")
        .groupBy("_id")
        .agg(F.max("_score").alias("_so"))
    )
    return en.join(other, "_id").select(
        F.col("_id").alias("doc_id"),
        (F.col("_lbl") == "en").cast("double").alias("y"),
        (F.round(F.col("_se") - F.col("_so"), 6) / MARGIN_SCALE).alias("s"),
    )


def _train_calibration(m) -> tuple[float, float]:
    """LR_ITERS full-batch GD steps on the persisted margin table; each
    step is one map-side-combined 2-term gradient aggregate (the weights
    broadcast back as literals)."""
    b, a = 0.0, 0.0
    for _ in range(LR_ITERS):
        z = F.lit(b) + F.lit(a) * F.col("s")
        sig = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        g = m.agg(
            F.avg(sig - F.col("y")).alias("gb"),
            F.avg((sig - F.col("y")) * F.col("s")).alias("ga"),
        ).collect()[0]
        b -= LR_RATE * round(g["gb"], GRAD_DP)
        a -= LR_RATE * round(g["ga"], GRAD_DP)
    return b, a


def q_text_lr_calibrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train (b, a) from zero with LR_ITERS GD steps (lr = LR_RATE) on the
    persisted margin table, then report start/final train log-loss, the
    learned weights, and the accuracy/confusion of the calibrated
    decision a*s + b >= 0 (weights ROUNDED to 6 before the decision pass
    so the prediction set is bit-stable across engines). The margin table
    is persisted once — each GD step and the final report are tiny
    aggregates against it."""
    m = pooled_persist(_margin_spark(spark, sf_dir))
    b, a = _train_calibration(m)
    br, ar = round(b, 6), round(a, 6)
    z = F.lit(b) + F.lit(a) * F.col("s")
    sig = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    ll = -(F.col("y") * F.log(sig) + (F.lit(1.0) - F.col("y")) * F.log(1.0 - sig))
    pred = (F.lit(br) + F.lit(ar) * F.col("s") >= 0).cast("int")
    return m.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("y").cast("bigint").alias("n_pos"),
        F.round(F.lit(float(__import__("math").log(2.0))), 6).alias("ll_start"),
        F.round(F.avg(ll), 6).alias("ll_final"),
        F.lit(br).alias("bias"),
        F.lit(ar).alias("slope"),
        F.sum(((pred == 1) & (F.col("y") == 1.0)).cast("long")).alias("tp"),
        F.sum(((pred == 1) & (F.col("y") == 0.0)).cast("long")).alias("fp"),
        F.sum(((pred == 0) & (F.col("y") == 0.0)).cast("long")).alias("tn"),
        F.sum(((pred == 0) & (F.col("y") == 1.0)).cast("long")).alias("fn"),
        F.round(
            F.avg((pred.cast("double") == F.col("y")).cast("double")), 6
        ).alias("accuracy"),
    ).select(
        "n_docs", "n_pos", "ll_start", "ll_final", "bias", "slope",
        "tp", "fp", "tn", "fn", "accuracy",
    )


def _margin_weight_ctes() -> str:
    """margin (doc_id, y, s) + w0..w{LR_ITERS-1} CTE fragments — shared by
    the calibrate report oracle and the pipeline_lr_curate oracle."""
    lr = LR_RATE
    parts = [f""", margin AS (
  SELECT doc_id, CAST(any_value(tl) = 'en' AS DOUBLE) AS y,
         round(max(CASE WHEN ml = 'en' THEN score END)
               - max(CASE WHEN ml <> 'en' THEN score END), 6)
           / {MARGIN_SCALE} AS s
  FROM sc GROUP BY doc_id
)"""]
    prev = None
    for it in range(LR_ITERS):
        if prev is None:
            parts.append(f""", w0 AS (
  SELECT -{lr} * round(avg(0.5 - y), {GRAD_DP}) AS b,
         -{lr} * round(avg((0.5 - y) * s), {GRAD_DP}) AS a
  FROM margin
)""")
        else:
            sig = f"1.0 / (1.0 + exp(-(w.b + w.a * m.s)))"
            parts.append(f""", w{it} AS (
  SELECT w.b - {lr} * round(avg({sig} - m.y), {GRAD_DP}) AS b,
         w.a - {lr} * round(avg(({sig} - m.y) * m.s), {GRAD_DP}) AS a
  FROM margin m, {prev} w GROUP BY w.b, w.a
)""")
        prev = f"w{it}"
    return "".join(parts)


def _calibrate_oracle() -> str:
    """The same margin + LR_ITERS GD steps as nested CTEs over the SAME
    NB score CTE chain the `text_lang_nb` oracle uses."""
    from pyvectorsearch_spark.queries.text_lm import _LANG_NB_CTES

    lr = LR_RATE
    sql = [f"WITH {_LANG_NB_CTES}"]
    sql.append(_margin_weight_ctes())
    prev = f"w{LR_ITERS - 1}"
    sig = f"1.0 / (1.0 + exp(-(w.b + w.a * m.s)))"
    pred = "CASE WHEN round(w.b, 6) + round(w.a, 6) * m.s >= 0 THEN 1.0 ELSE 0.0 END"
    sql.append(f"""
SELECT count(*)::BIGINT AS n_docs, sum(m.y)::BIGINT AS n_pos,
       round(ln(2.0), 6) AS ll_start,
       round(avg(-(m.y * ln({sig}) + (1.0 - m.y) * ln(1.0 - {sig}))), 6)
         AS ll_final,
       round(max(w.b), 6) AS bias, round(max(w.a), 6) AS slope,
       sum(CASE WHEN {pred} = 1.0 AND m.y = 1.0 THEN 1 ELSE 0 END)::BIGINT AS tp,
       sum(CASE WHEN {pred} = 1.0 AND m.y = 0.0 THEN 1 ELSE 0 END)::BIGINT AS fp,
       sum(CASE WHEN {pred} = 0.0 AND m.y = 0.0 THEN 1 ELSE 0 END)::BIGINT AS tn,
       sum(CASE WHEN {pred} = 0.0 AND m.y = 1.0 THEN 1 ELSE 0 END)::BIGINT AS fn,
       round(avg(CASE WHEN {pred} = m.y THEN 1.0 ELSE 0.0 END), 6) AS accuracy
FROM margin m, {prev} w
""")
    return "".join(sql)


QUERIES = {"text_lr_calibrate": q_text_lr_calibrate}
ORACLES = {"text_lr_calibrate": _calibrate_oracle()}


def q_pipeline_lr_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation with a LEARNED gate: train the Platt-calibrated
    is-English classifier (same 6 GD steps as `text_lr_calibrate`), keep
    documents the calibrated decision a*s + b >= 0 accepts, exact-dedup
    the keeps (min-id per md5 digest), and report per source: corpus
    size, predicted-English count, post-dedup keeps, and kept chars.
    The model is trained INSIDE the pipeline — the composed plan is
    train -> gate -> dedup -> rollup, and the whole composition (learned
    weights included) hash-checks against one DuckDB CTE chain.

    Scale shape: training is LR_ITERS tiny aggregates over the persisted
    margin table; the gate is a semi-join on doc_id; dedup is one digest
    rollup; nothing materializes doc text beyond the digest."""
    from pyvectorsearch_spark.operators.dedup import exact_dedup

    docs = spread(load_table(spark, sf_dir, "documents"))
    m = pooled_persist(_margin_spark(spark, sf_dir))
    b, a = _train_calibration(m)
    br, ar = round(b, 6), round(a, 6)
    keep_ids = m.filter(F.lit(br) + F.lit(ar) * F.col("s") >= 0).select("doc_id")
    kept = docs.join(keep_ids, "doc_id", "left_semi")
    deduped = exact_dedup(kept)
    per_kept = deduped.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.sum("n_chars").cast("bigint").alias("kept_chars"),
    )
    per_pred = kept.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_pred_en")
    )
    per_all = docs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    return (
        per_all.join(per_pred, "source", "left")
        .join(per_kept, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_pred_en", F.lit(0)).cast("bigint").alias("n_pred_en"),
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            F.coalesce("kept_chars", F.lit(0)).cast("bigint").alias("kept_chars"),
        )
        .orderBy("source")
    )


def _pipeline_lr_oracle() -> str:
    from pyvectorsearch_spark.queries.text_lm import _LANG_NB_CTES

    prev = f"w{LR_ITERS - 1}"
    return f"""
WITH {_LANG_NB_CTES}{_margin_weight_ctes()},
keep_ids AS (
  SELECT m.doc_id FROM margin m, {prev} w
  WHERE round(w.b, 6) + round(w.a, 6) * m.s >= 0
),
kept AS (
  SELECT d.* FROM documents d SEMI JOIN keep_ids k ON k.doc_id = d.doc_id
),
dedup AS (
  SELECT * FROM kept
  WHERE doc_id IN (SELECT min(doc_id) FROM kept GROUP BY md5(text))
),
per_all AS (SELECT source, count(*)::BIGINT AS n_docs FROM documents GROUP BY source),
per_pred AS (SELECT source, count(*)::BIGINT AS n_pred_en FROM kept GROUP BY source),
per_kept AS (
  SELECT source, count(*)::BIGINT AS n_kept, sum(n_chars)::BIGINT AS kept_chars
  FROM dedup GROUP BY source
)
SELECT a.source, a.n_docs,
       coalesce(p.n_pred_en, 0)::BIGINT AS n_pred_en,
       coalesce(k.n_kept, 0)::BIGINT AS n_kept,
       coalesce(k.kept_chars, 0)::BIGINT AS kept_chars
FROM per_all a
LEFT JOIN per_pred p ON p.source = a.source
LEFT JOIN per_kept k ON k.source = a.source
ORDER BY a.source
"""


QUERIES.update({"pipeline_lr_curate": q_pipeline_lr_curate})
ORACLES.update({"pipeline_lr_curate": _pipeline_lr_oracle()})


RELIA_BINS = 5


def q_text_lr_reliability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + Brier score for the calibrated classifier
    (Murphy 1973 decomposition territory): predicted p(en) binned into
    RELIA_BINS probability bands, per band the mean prediction vs the
    empirical rate (the calibration gap a reliability curve plots), with
    the corpus Brier score riding every row. Predictions bin on
    ROUND(p, 6) so the band assignment is bit-stable across engines.
    Same train-then-evaluate shape as `text_lr_calibrate`: LR_ITERS tiny
    gradient aggregates, then one rollup."""
    m = pooled_persist(_margin_spark(spark, sf_dir))
    b, a = _train_calibration(m)
    br, ar = round(b, 6), round(a, 6)
    p = F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.lit(br) + F.lit(ar) * F.col("s")))), 6
    )
    binned = m.withColumn("p", p).withColumn(
        "band",
        F.least(F.floor(F.col("p") * RELIA_BINS), F.lit(RELIA_BINS - 1)).cast(
            "bigint"
        ),
    )
    g = binned.groupBy("band").agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.avg("p"), 6).alias("mean_pred_r"),
        F.round(F.avg("y"), 6).alias("emp_rate_r"),
    )
    brier = binned.agg(
        F.round(F.avg((F.col("p") - F.col("y")) * (F.col("p") - F.col("y"))), 6)
        .alias("brier_r")
    )
    return (
        g.crossJoin(F.broadcast(brier))
        .select(
            "band",
            "n",
            "mean_pred_r",
            "emp_rate_r",
            F.round(F.abs(F.col("mean_pred_r") - F.col("emp_rate_r")), 6).alias(
                "gap_r"
            ),
            "brier_r",
        )
        .orderBy("band")
    )


def _reliability_oracle() -> str:
    from pyvectorsearch_spark.queries.text_lm import _LANG_NB_CTES

    prev = f"w{LR_ITERS - 1}"
    p = "round(1.0 / (1.0 + exp(-(round(w.b, 6) + round(w.a, 6) * m.s))), 6)"
    return f"""
WITH {_LANG_NB_CTES}{_margin_weight_ctes()},
pred AS (
  SELECT m.y, {p} AS p,
         least(CAST(floor({p} * {RELIA_BINS}) AS BIGINT), {RELIA_BINS - 1})
           AS band
  FROM margin m, {prev} w
),
g AS (
  SELECT band, count(*)::BIGINT AS n,
         round(avg(p), 6) AS mean_pred_r, round(avg(y), 6) AS emp_rate_r
  FROM pred GROUP BY band
),
brier AS (SELECT round(avg((p - y) * (p - y)), 6) AS brier_r FROM pred)
SELECT band, n, mean_pred_r, emp_rate_r,
       round(abs(mean_pred_r - emp_rate_r), 6) AS gap_r, brier_r
FROM g CROSS JOIN brier ORDER BY band
"""


QUERIES.update({"text_lr_reliability": q_text_lr_reliability})
ORACLES.update({"text_lr_reliability": _reliability_oracle()})
