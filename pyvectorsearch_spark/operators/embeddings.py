"""Embedding-statistics operators for training-data curation (north-star
extensions — the reference's only embedding operation is spatial search,
``/root/reference/include/pktree.hpp:948,933``; centroid/outlier analysis is
the standard companion step in embedding-based data curation, cf. SemDeDup
(Abbas et al. 2023) which prunes *within-cluster* by distance to centroid).

Scale shape: the per-label centroid table is ``labels x dim`` rows after a
map-side-combined average — tiny regardless of corpus size — so it broadcasts
back onto the vector table and the cosine runs as a zero-additional-shuffle
projection. The only corpus-sized shuffles are the centroid partial-aggregate
(bytes per row: one (label, pos, partial-sum, count) tuple) and the final
per-label top-k window, which operates on (id, label, cosine) triples only —
never on the vectors themselves.

Float parity with the DuckDB oracle: centroid components are rounded to
``round_dp`` decimals *before* the cosine (averaging order across engines
differs in final-ulp ways; rounding re-synchronizes), and the cosine itself is
the shared left-fold kernel from ``functions/vector.py`` whose accumulation
order matches ``duckdb_dot`` exactly.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pyvectorsearch_spark.functions.vector import cosine_sim
from pyvectorsearch_spark.functions.lits import lit_long_array


def label_centroids(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    label_col: str = "label",
    round_dp: int = 6,
) -> DataFrame:
    """Per-label mean vector: posexplode -> two-stage avg per (label, pos) ->
    reassembled double array with components rounded to ``round_dp``.

    Returns (``label_col``, centroid: array<double>, n_vectors)."""
    e = df.select(
        F.col(label_col),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("_pos", "_v"),
    )
    comp = e.groupBy(label_col, "_pos").agg(
        F.round(F.avg("_v"), round_dp).alias("_cv"),
        F.count("*").alias("_n"),
    )
    return comp.groupBy(label_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_pos", "_cv"))), lambda s: s["_cv"]
        ).alias("centroid"),
        F.max("_n").cast("bigint").alias("n_vectors"),
    )


def negative_samples(
    anchors: DataFrame,
    pool: DataFrame,
    *,
    k: int = 5,
    anchor_id: str = "anchor_id",
    pool_id: str = "vec_id",
    label_col: str = "label",
    salt: str = "negatives",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: for each
    anchor, the ``k`` pool rows with a DIFFERENT label, ranked by
    md5(salt || anchor || candidate) — a reproducible pseudo-random draw
    (the md5-keyed analog of in-batch negative selection; new salt = new
    epoch's negatives).

    Scale shape: the anchor side is a training batch (hundreds-thousands of
    rows) and BROADCASTS; the pool scans once and the pair stream is
    anchors x pool filtered before the per-anchor top-k window — the
    documented regime is |anchors| << |pool|, the contrastive-batch case.

    Returns (``anchor_id``, neg_id, rank)."""
    a = anchors.select(
        F.col(anchor_id).alias("_aid"), F.col(label_col).alias("_albl")
    )
    p = pool.select(F.col(pool_id).alias("_pid"), F.col(label_col).alias("_plbl"))
    key = F.md5(
        F.concat(
            F.lit(salt),
            F.col("_aid").cast("string"),
            F.lit("|"),
            F.col("_pid").cast("string"),
        )
    )
    pairs = p.crossJoin(F.broadcast(a)).filter(
        F.col("_plbl") != F.col("_albl")
    )
    w = Window.partitionBy("_aid").orderBy(key, F.col("_pid"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("_aid").alias(anchor_id), F.col("_pid").alias("neg_id"), "rank")
    )


def centroid_outliers(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    label_col: str = "label",
    id_col: str = "vec_id",
    k: int = 5,
    round_dp: int = 6,
) -> DataFrame:
    """Per-label outlier detection: the ``k`` vectors per label with the
    LOWEST cosine similarity to their label centroid (the curation signal for
    mislabeled / off-distribution rows; SemDeDup prunes the other end of the
    same ranking).

    The centroid table broadcasts (labels x dim doubles); ranking sorts only
    (id, label, cosine) rows. Cosine is rounded to ``round_dp`` before the
    ranking so the order (cos asc, id asc) is engine-stable.

    Returns (``id_col``, ``label_col``, cos_centroid, rank), rank 1 = most
    outlying."""
    cents = label_centroids(
        df, vec_col=vec_col, label_col=label_col, round_dp=round_dp
    ).select(label_col, "centroid")
    scored = df.join(F.broadcast(cents), label_col).select(
        id_col,
        label_col,
        F.round(cosine_sim(vec_col, "centroid"), round_dp).alias("cos_centroid"),
    )
    w = Window.partitionBy(label_col).orderBy(F.asc("cos_centroid"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, label_col, "cos_centroid", "rank")
    )


def centroid_drift(
    a: DataFrame,
    b: DataFrame,
    *,
    vec_col: str = "embedding",
    label_col: str = "label",
    round_dp: int = 6,
) -> DataFrame:
    """Embedding drift between two cohorts (time slices, data sources,
    pipeline versions): per-label cosine between the cohorts' centroids —
    the embedding-space analog of the PSI drift alarm (a drop below ~0.99
    means the label's representation moved). Each side is one
    `label_centroids` pass (labels x dim result, broadcast-sized); the
    comparison is a labels-sized join, so the monitor costs two
    map-side-combined scans regardless of corpus size.

    Returns (``label_col``, n_a, n_b, cos_r, drift_r)."""
    ca = label_centroids(a, vec_col=vec_col, label_col=label_col, round_dp=round_dp)
    cb = label_centroids(b, vec_col=vec_col, label_col=label_col, round_dp=round_dp)
    j = ca.select(
        label_col,
        F.col("centroid").alias("_ca"),
        F.col("n_vectors").alias("n_a"),
    ).join(
        cb.select(
            label_col,
            F.col("centroid").alias("_cb"),
            F.col("n_vectors").alias("n_b"),
        ),
        label_col,
    )
    cos = F.round(cosine_sim("_ca", "_cb"), round_dp)
    return j.select(
        label_col,
        "n_a",
        "n_b",
        cos.alias("cos_r"),
        F.round(1.0 - cos, round_dp).alias("drift_r"),
    )


def maxsim_topk(
    doc_tokens: DataFrame,
    query_tokens: DataFrame,
    *,
    doc_col: str = "doc",
    tok_id: str = "tok_id",
    tok_vec: str = "embedding",
    k: int = 3,
    round_dp: int = 6,
) -> DataFrame:
    """Late-interaction (ColBERT-style) MaxSim retrieval: documents and
    queries are SETS of token vectors; score(q, d) = Σ over q's tokens of
    the max cosine against d's tokens. The modern multi-vector retrieval
    primitive single-vector kNN can't express (per-token alignment).

    Determinism: per-pair cosines round to ``round_dp`` before the exact
    max; the per-(query, doc) sum of rounded maxima rounds again — the
    standard ladder, so rankings (score desc, doc asc) are engine-exact.

    Scale shape: query tokens broadcast (queries are small by definition);
    the token-pair table is |q_tokens| × |doc_tokens| rows but collapses
    immediately through two map-side-combined aggregates (max, then sum) —
    at corpus scale feed ``doc_tokens`` from a first-stage candidate
    retriever instead of the full corpus, exactly like the re-rank stage
    it is in production.

    Returns (query_doc, rank, ``doc_col``, maxsim_r)."""
    from pyspark.sql import Window

    from pyvectorsearch_spark.functions.vector import cosine_sim

    q = query_tokens.select(
        F.col(doc_col).alias("_qd"),
        F.col(tok_vec).alias("_qv"),
        F.col(tok_id).alias("_qt"),
    )
    d = doc_tokens.select(F.col(doc_col).alias("_dd"), F.col(tok_vec).alias("_dv"))
    pairs = d.join(F.broadcast(q), F.col("_qd") != F.col("_dd"))
    c = F.round(cosine_sim("_qv", "_dv"), round_dp)
    per_tok = pairs.select("_qd", "_qt", "_dd", c.alias("_c")).groupBy(
        "_qd", "_qt", "_dd"
    ).agg(F.max("_c").alias("_m"))
    scores = per_tok.groupBy("_qd", "_dd").agg(
        F.round(F.sum("_m"), round_dp).alias("_s")
    )
    w = Window.partitionBy("_qd").orderBy(F.desc("_s"), F.asc("_dd"))
    return (
        scores.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .select(
            F.col("_qd").alias("query_doc"),
            F.col("_r").cast("int").alias("rank"),
            F.col("_dd").alias(doc_col),
            F.col("_s").alias("maxsim_r"),
        )
    )


def margin_mining(
    x: DataFrame,
    y: DataFrame,
    *,
    k: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> DataFrame:
    """Margin-based candidate-pair mining (Artetxe & Schwenk, ACL 2019 —
    the bitext-mining scorer behind CCMatrix/LASER): for each x row, its
    best y match scored by the RATIO margin

        margin(x, y) = cos(x, y) / ((avgF(x) + avgB(y)) / 2)

    where avgF(x) is the mean cosine of x's k nearest y's and avgB(y) the
    mean cosine of y's k nearest x's. Raw cosine over-selects hubs (rows
    near everything); the margin normalizes by each side's local density so
    a match counts only if it stands OUT of its neighborhood — the standard
    mined-parallel-data filter (margin > ~1.06 in the papers).

    Both direction windows read the SAME x-broadcast pair table, so the
    plan is one |x|·|y| scored stream -> two window ranks -> one broadcast
    re-join; y never re-exchanges. The documented regime is |x| small
    (a query batch / one language's shard): x broadcasts, cost is linear
    in |y|. For corpus x corpus mining, pre-bucket both sides with the
    angular IVF of `dedup_embedding_cosine` and run per bucket — the
    margin is local by construction, so bucket-local kNN preserves it.

    Determinism ladder: cosines round to ``round_dp`` before ranking
    (ties by id asc); the two top-k means round again; the final margin
    division rounds once more — every comparison engine-exact.

    Returns (x_id, y_id, cos_r, margin_r, mutual) — one row per x, its
    forward-best y; ``mutual`` marks pairs where x is also y's best x
    (the intersection criterion of the paper's §3.2)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    xs = x.select(F.col(id_col).alias("_xid"), F.col(vec_col).alias("_xv"))
    ys = y.select(F.col(id_col).alias("_yid"), F.col(vec_col).alias("_yv"))
    pairs = ys.crossJoin(F.broadcast(xs)).select(
        "_xid",
        "_yid",
        F.round(cosine_sim("_xv", "_yv"), round_dp).alias("_c"),
    )
    wf = Window.partitionBy("_xid").orderBy(F.desc("_c"), F.asc("_yid"))
    wb = Window.partitionBy("_yid").orderBy(F.desc("_c"), F.asc("_xid"))
    from pyvectorsearch_spark.plans.cachepool import pooled_persist

    ranked = pairs.withColumn("_rf", F.row_number().over(wf)).withColumn(
        "_rb", F.row_number().over(wb)
    )
    # three downstream legs (fwd avg, bwd avg, best) re-read the scored
    # ranks inside one action; bounded pool per ADVICE r6
    ranked = pooled_persist(ranked)
    # top-k mean as a SORTED left fold, not F.avg: distributed avg adds
    # partials in nondeterministic order (the ADVICE-r6 GD lesson); folding
    # the sorted k values makes the mean bit-identical on both engines
    def _sorted_mean(col: str) -> Column:
        s = F.aggregate(
            F.array_sort(F.collect_list(col)), F.lit(0.0), lambda a, v: a + v
        )
        return F.round(s / F.lit(float(k)), round_dp)

    fwd_avg = (
        ranked.filter(F.col("_rf") <= k)
        .groupBy("_xid")
        .agg(_sorted_mean("_c").alias("_af"))
    )
    bwd_avg = (
        ranked.filter(F.col("_rb") <= k)
        .groupBy("_yid")
        .agg(_sorted_mean("_c").alias("_ab"))
    )
    best = ranked.filter(F.col("_rf") == 1).select(
        "_xid", "_yid", "_c", (F.col("_rb") == 1).alias("mutual")
    )
    out = (
        best.join(F.broadcast(fwd_avg), "_xid")
        .join(bwd_avg, "_yid")
        .select(
            F.col("_xid").alias("x_id"),
            F.col("_yid").alias("y_id"),
            F.col("_c").alias("cos_r"),
            F.round(
                F.col("_c") / ((F.col("_af") + F.col("_ab")) / F.lit(2.0)),
                round_dp,
            ).alias("margin_r"),
            "mutual",
        )
    )
    return out


def kmeans_fixedpoint(
    df: DataFrame,
    *,
    k: int = 8,
    iters: int = 3,
    scale: float = 1e6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed Lloyd k-means made INTEGER-EXACT: components quantize to
    a fixed-point grid (``floor(x·scale + 0.5)`` — half-up via floor, the
    same in every engine), so squared distances and per-cluster component
    sums are BIGINT arithmetic — order-independent, bit-identical across
    engines, no float-accumulation drift anywhere. The only non-integer op
    is the centroid update ``floor(float(sum)/n + 0.5)``: the sum is cast
    to double FIRST — the same rounding order as the oracle's
    ``CAST(s AS DOUBLE)/n`` — so the step stays bit-stable even when
    ``|sum| >= 2^53`` (Python's exact-rational int/int division would
    differ by up to 1 ulp there and could flip the floor; ADVICE r7). The whole
    training trajectory therefore oracle-checks exactly — the corpus
    clustering primitive (topic balancing, SemDeDup prep, IVF coarse
    quantizers) as a hash-checkable query rather than a "close enough"
    one.

    Seeding: the ``k`` rows with the smallest ``id_col`` (deterministic,
    SQL-trivial). Empty clusters keep their previous centroid. Assignment
    ties break toward the smaller cluster id.

    Scale shape: per iteration, ONE broadcast of k·d quantized centroid
    values into a map-side distance expression (no shuffle to assign), one
    (cluster, dim) aggregate for the update — the k·d result is
    driver-bounded like the GD loop's gradients. Nothing grows with the
    corpus except the two scans.

    Returns (cluster_id, n_points, wcss, dim_i, centroid_q): the
    post-update centroids after ``iters`` rounds, with the LAST
    assignment's population and integer within-cluster sum of squares."""
    if k < 1 or iters < 1:
        raise ValueError(f"need k >= 1 and iters >= 1, got k={k}, iters={iters}")
    spark = df.sparkSession
    from pyvectorsearch_spark.plans.cachepool import pooled_persist

    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast("long"),
    )
    pts = pooled_persist(
        df.select(F.col(id_col).alias("_id"), q.alias("_q"))
    )
    cents = {
        int(r["_id"]): [int(v) for v in r["_q"]]
        for r in pts.orderBy("_id").limit(k).collect()
    }
    if len(cents) < k:
        raise ValueError(f"need at least k={k} rows to seed, got {len(cents)}")
    cent_ids = sorted(cents)

    last_assign = None
    for _ in range(iters):
        # assignment: k integer distance expressions, evaluated map-side —
        # the centroid table rides the plan as literals (k·d values), so
        # no join, no shuffle, ties break toward the smaller cluster id
        dists = [
            F.aggregate(
                F.zip_with(
                    "_q",
                    lit_long_array(cents[j]),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias(f"_d{j}")
            for j in cent_ids
        ]
        scored = pts.select("_id", "_q", *dists)
        structs = [
            F.struct(F.col(f"_d{j}").alias("d"), F.lit(j).alias("j"))
            for j in cent_ids
        ]
        # F.least needs >= 2 args; k=1 is a valid degenerate clustering
        # (everything in one cluster), so take the single struct directly
        # (ADVICE r7).
        best = structs[0] if len(structs) == 1 else F.least(*structs)
        last_assign = pooled_persist(
            scored.select(
                "_id", "_q",
                best["j"].alias("_j"), best["d"].alias("_dist"),
            )
        )
        upd = (
            last_assign.select(
                "_j", F.posexplode("_q").alias("_i", "_v")
            )
            .groupBy("_j", "_i")
            .agg(F.sum("_v").alias("_s"), F.count("*").alias("_n"))
            .collect()
        )
        new_cents = {j: list(cents[j]) for j in cent_ids}
        for r in upd:
            # float(s)/n mirrors the oracle's CAST(s AS DOUBLE)/n rounding
            # order: Python's exact-rational int/int division differs by up
            # to 1 ulp once |s| >= 2^53, which can flip floor(x + 0.5) and
            # break bit parity for very large clusters (ADVICE r7).
            new_cents[int(r["_j"])][int(r["_i"])] = int(
                math.floor(float(r["_s"]) / r["_n"] + 0.5)
            )
        cents = new_cents

    npts = last_assign.groupBy("_j").agg(
        F.count("*").alias("_n"), F.sum("_dist").alias("_w")
    )
    cent_rows = [
        (j, i, cents[j][i]) for j in cent_ids for i in range(len(cents[j]))
    ]
    cent_df = spark.createDataFrame(
        cent_rows, "cluster_id long, dim_i int, centroid_q long"
    )
    return (
        cent_df.join(
            npts.select(
                F.col("_j").alias("cluster_id"),
                F.col("_n").alias("n_points"),
                F.col("_w").alias("wcss"),
            ),
            "cluster_id",
            "left",
        )
        .select(
            "cluster_id",
            F.coalesce("n_points", F.lit(0)).cast("bigint").alias("n_points"),
            F.coalesce("wcss", F.lit(0)).cast("bigint").alias("wcss"),
            "dim_i",
            "centroid_q",
        )
    )
