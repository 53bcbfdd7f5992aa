"""Deterministic sampling / splitting / mixing / packing operators for
training-data pipelines (north-star extensions; the reference has no
sampling surface — its only "selection" is the search predicates,
/root/reference/include/pktree.hpp:933-973).

Everything is hash-deterministic, never RNG-based: membership of a row in a
split/sample depends only on (salt, id), so re-running a pipeline — or
running it on a different cluster layout — selects the identical rows. The
hash is the same md5→48-bit→bucket construction the dedup family uses
(operators/dedup.py:201-203), which DuckDB reproduces exactly, so every
operator here has a bit-exact SQL oracle.

Scale posture (100 TB):
  - ``assign_split`` / ``sample_flag`` are zero-shuffle projections that
    pipeline inside the parquet scan stage;
  - ``mixture_thresholds`` aggregates one row per source (a ~dozens-row
    driver result — metadata, not data) and everything downstream is again a
    zero-shuffle projection;
  - packing shuffles once: a window per shard (``by``) — a global sequential
    pack would be a single-partition scale trap, so a shard key is required
    (same policy as asof_join, operators/temporal.py).
"""

from __future__ import annotations

from typing import Mapping

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

BUCKETS = 10_000  # hash-bucket resolution: fractions quantized to 0.01%


def hash_bucket(col: Column, salt: str) -> Column:
    """Deterministic bucket in [0, BUCKETS): first 48 bits of
    md5(salt || id) mod BUCKETS. 48 bits keeps the integer exact in any
    engine's 64-bit (or double) arithmetic; DuckDB twin:
    ``('0x' || substr(md5('<salt>' || id::VARCHAR), 1, 12))::BIGINT % 10000``.
    """
    h = F.md5(F.concat(F.lit(salt), col.cast("string")))
    return F.conv(F.substring(h, 1, 12), 16, 10).cast("bigint") % BUCKETS


def _integer_thresholds(fractions: Mapping[str, float]) -> list[tuple[str, int]]:
    """Cumulative integer bucket thresholds. Fractions are quantized to
    1/BUCKETS at plan-build time so the membership test is pure integer
    comparison — no FP boundary can flip a row between engines."""
    out, acc = [], 0
    for name, frac in fractions.items():
        acc += int(round(frac * BUCKETS))
        out.append((name, acc))
    if out and out[-1][1] > BUCKETS:
        raise ValueError(f"fractions sum past 1.0: {fractions}")
    return out


def assign_split(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    fractions: Mapping[str, float] | None = None,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test (or arbitrary) split assignment.

    Adds ``out_col`` with the split name; rows past the last cumulative
    threshold (when fractions sum < 1) get NULL — a holdout. Zero shuffle:
    one projection, pipelined into the scan."""
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    b = hash_bucket(F.col(id_col), salt)
    expr = None
    for name, upper in _integer_thresholds(fractions):
        clause = b < upper
        expr = F.when(clause, name) if expr is None else expr.when(clause, name)
    return df.withColumn(out_col, expr)


def sample_flag(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    fraction: float | None = None,
    strata_col: str | None = None,
    fractions: Mapping[str, float] | None = None,
    salt: str = "sample",
    out_col: str = "sampled",
) -> DataFrame:
    """Deterministic (optionally stratified) Bernoulli-by-hash sampling.

    Uniform mode: ``fraction`` applies to every row. Stratified mode:
    ``fractions[stratum]`` applies per ``strata_col`` value (strata absent
    from the mapping keep nothing). Adds a boolean ``out_col`` rather than
    filtering, so callers can audit kept/total in a single pass; filter on
    it for the sampled view. Zero shuffle either way."""
    if (fraction is None) == (fractions is None):
        raise ValueError("pass exactly one of fraction= or fractions=")
    b = hash_bucket(F.col(id_col), salt)
    if fraction is not None:
        keep = b < int(round(fraction * BUCKETS))
    else:
        if strata_col is None:
            raise ValueError("fractions= requires strata_col=")
        mapping = F.create_map(
            *[
                x
                for k, v in fractions.items()
                for x in (F.lit(k), F.lit(int(round(v * BUCKETS))))
            ]
        )
        thresh = F.element_at(mapping, F.col(strata_col))
        keep = b < F.coalesce(thresh, F.lit(0))
    return df.withColumn(out_col, keep)


def mixture_thresholds(
    df: DataFrame,
    *,
    source_col: str = "source",
    weights: Mapping[str, int],
    target_rows: int,
) -> DataFrame:
    """Per-source keep thresholds for building a weighted mixture of
    ``target_rows`` rows: source s gets a share target_rows * w_s / Σw, and
    its threshold is that share scaled into hash buckets, capped at BUCKETS
    when the source is too small to fill its share.

    All arithmetic is INTEGER (weights are integers by contract; ``div`` is
    integer division), so the thresholds — and therefore mixture membership
    — are bit-identical in any engine. Returns a tiny DataFrame
    (source, n_source, threshold): one row per source, broadcast-joined by
    ``weighted_mixture_flag``; nothing is collected."""
    w_sum = sum(weights.values())
    wmap = F.create_map(
        *[x for k, v in weights.items() for x in (F.lit(k), F.lit(int(v)))]
    )
    counts = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count("*").alias("n_source")
    )
    num = (
        F.lit(int(target_rows)).cast("decimal(38,0)")
        * F.coalesce(F.element_at(wmap, F.col("source")), F.lit(0)).cast(
            "decimal(38,0)"
        )
        * F.lit(BUCKETS).cast("decimal(38,0)")
    )
    den = F.lit(int(w_sum)).cast("decimal(38,0)") * F.col("n_source").cast(
        "decimal(38,0)"
    )
    # Exact integer quotient: Spark decimal division carries scale 6 and
    # rounds HALF_UP, so floor(num/den) can be off by one when the true
    # remainder fraction exceeds 0.9999995. Subtracting the modulus first
    # makes the dividend exactly divisible — the quotient is then an
    # integer-valued decimal with no rounding, bit-identical to DuckDB's `//`.
    quotient = ((num - num % den) / den).cast("bigint")
    return counts.withColumn(
        "threshold", F.least(F.lit(BUCKETS).cast("bigint"), quotient)
    )


def weighted_mixture_flag(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    source_col: str = "source",
    weights: Mapping[str, int],
    target_rows: int,
    salt: str = "mix",
    out_col: str = "sampled",
) -> DataFrame:
    """Weighted multi-source mixture: flag a deterministic subset whose
    per-source sizes approximate target_rows * w_s / Σw (exact up to hash
    granularity; capped by source size). One tiny per-source aggregate
    broadcast back onto the scan — the fact table shuffles zero times."""
    thresholds = mixture_thresholds(
        df, source_col=source_col, weights=weights, target_rows=target_rows
    ).select("source", "threshold")
    b = hash_bucket(F.col(id_col), salt)
    return (
        df.join(
            F.broadcast(thresholds),
            df[source_col] == thresholds["source"],
            "left",
        )
        .drop(thresholds["source"])
        .withColumn(out_col, b < F.coalesce(F.col("threshold"), F.lit(0)))
        .drop("threshold")
    )


def pack_chunked(
    df: DataFrame,
    *,
    by: str,
    id_col: str = "doc_id",
    size_col: str = "n_chars",
    budget: int,
    pack_col: str = "pack_id",
    offset_col: str = "pack_offset",
) -> DataFrame:
    """Concatenate-and-chunk sequence packing: rows ordered by ``id_col``
    within each ``by`` shard are laid head-to-tail; a row is assigned to the
    pack where it STARTS (pack = exclusive-prefix-sum div budget), with its
    offset inside that pack. Rows may straddle pack boundaries — this is the
    streaming-friendly "chunk the token stream" packing used by LLM data
    loaders, one window shuffle per shard.

    A shard key is mandatory: a global pack order would funnel 100 TB
    through one partition (same policy as asof_join's keyless mode)."""
    if not by:
        raise ValueError("pack_chunked requires a shard key (by=)")
    w = (
        Window.partitionBy(by)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(size_col).over(w), F.lit(0)).cast("bigint")
    # (start - start % budget) / budget instead of floor(start / budget):
    # decimal division rounds HALF_UP at scale 6, so a naive floor can be
    # one pack too high for budgets > 2e6 — and would then disagree with
    # offset_col (= start % budget) and the `//` oracle.
    off = start % budget
    return df.withColumn(
        pack_col,
        ((start - off).cast("decimal(38,0)") / F.lit(budget)).cast("bigint"),
    ).withColumn(offset_col, off)


def sample_exact_k(
    df: DataFrame,
    *,
    strata_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "exactk",
    out_col: str = "sample_rank",
    sub_shards: int = 8,
) -> DataFrame:
    """Exact-``k``-per-stratum deterministic sampling (the batch analog of
    per-stratum reservoir sampling): rows rank by (hash_bucket, id) within
    each stratum and ranks 1..k survive. Unlike the Bernoulli
    ``sample_flag``, the output size per stratum is exactly min(k, |stratum|)
    — what an eval-set builder needs.

    Scale shape: two-phase top-k. Phase 1 ranks within (stratum, hash
    sub-shard) and keeps ≤ k per sub-shard, so a corpus-sized stratum never
    sorts in one task; phase 2 ranks the ≤ k·sub_shards survivors per
    stratum. The ranking key (bucket, id) is total, so the two-phase result
    is identical to a single global rank — which is what the one-window
    oracle computes.
    """
    if k < 1 or sub_shards < 1:
        raise ValueError(f"k and sub_shards must be >= 1, got {k=} {sub_shards=}")
    b = hash_bucket(F.col(id_col), salt)
    sub = (b * sub_shards) / F.lit(BUCKETS)
    w1 = Window.partitionBy(strata_col, F.floor(sub)).orderBy(b, F.col(id_col))
    cand = df.withColumn("_r1", F.row_number().over(w1)).filter(
        F.col("_r1") <= k
    )
    w2 = Window.partitionBy(strata_col).orderBy(b, F.col(id_col))
    return (
        cand.withColumn(out_col, F.row_number().over(w2))
        .filter(F.col(out_col) <= k)
        .drop("_r1")
    )


def pack_greedy(
    df: DataFrame,
    *,
    by: str,
    id_col: str = "doc_id",
    size_col: str = "n_chars",
    budget: int,
    pack_col: str = "pack_id",
    sub_shards: int = 1,
    salt: str = "packsub",
) -> DataFrame:
    """Greedy whole-document packing: rows in ``id_col`` order within each
    ``by`` shard; a row joins the current pack if it fits in the remaining
    budget, else opens a new pack (an oversized row gets a pack to itself).
    No row is split — the semantics for training examples that must stay
    intact.

    The running-remainder reset makes this inexpressible as a window
    function, so it runs as an Arrow-batched ``applyInPandas`` per shard —
    shards are independent, so the 100 TB plan is one shuffle by the group
    key and embarrassingly parallel packing inside each group. (DuckDB
    expresses the same walk as a recursive CTE — the oracle in
    queries/sampling.py.)

    ``sub_shards``: greedy packing is inherently sequential per group, so a
    LOW-cardinality ``by`` (e.g. a handful of sources) would funnel a
    corpus-sized group through one task. ``sub_shards=N`` splits every
    shard into N deterministic hash sub-shards (``hash_bucket(id) · N div
    BUCKETS``) that pack independently and in parallel; the sub-shard index
    is encoded in the high bits of ``pack_col`` (``sub · 2^32 + local``),
    so pack ids stay unique per shard and the assignment is deterministic.
    The trade: pack ids are dense per sub-shard (not per shard) and each
    sub-shard may leave one partially-filled tail pack (≤ N per shard)."""
    if not by:
        raise ValueError("pack_greedy requires a shard key (by=)")
    if sub_shards < 1:
        raise ValueError(f"sub_shards must be >= 1, got {sub_shards}")
    keys = [by]
    slim = df.select(by, id_col, size_col)
    if sub_shards > 1:
        # b·N/BUCKETS with b·N ≤ 1e4·N ≪ 2^53: float division exact, floor
        # exact → value in [0, N). Same integer result as DuckDB's
        # (b * N) // BUCKETS.
        sub = F.floor(
            hash_bucket(F.col(id_col), salt) * sub_shards / BUCKETS
        ).cast("bigint")
        slim = slim.withColumn("_sub", sub)
        keys = [by, "_sub"]
    schema = T.StructType(
        [f for f in slim.schema.fields if f.name != "_sub"]
        + [T.StructField(pack_col, T.LongType(), False)]
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        base = int(pdf["_sub"].iloc[0]) << 32 if "_sub" in pdf.columns else 0
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        packs = []
        pack, fill = 0, 0
        first = True
        for s in pdf[size_col].astype("int64"):
            if first:
                pack, fill, first = 0, int(s), False
            elif fill + int(s) <= budget:
                fill += int(s)
            else:
                pack, fill = pack + 1, int(s)
            packs.append(base + pack)
        if "_sub" in pdf.columns:
            pdf = pdf.drop(columns=["_sub"])
        pdf[pack_col] = pd.Series(packs, dtype="int64")
        return pdf

    return slim.groupBy(*keys).applyInPandas(_pack, schema)


def select_token_budget(
    df: DataFrame,
    *,
    budget: int,
    quality_col: str,
    size_col: str,
    id_col: str = "doc_id",
    bucket_scale: int = 1_000_000,
) -> DataFrame:
    """Budget-bounded corpus selection: walk documents in (quality desc, id
    asc) order and keep the maximal PREFIX whose cumulative ``size_col``
    stays <= ``budget`` (take-while semantics: the first overflowing doc
    stops selection — later smaller docs are NOT back-filled; this keeps the
    selected set a deterministic quality prefix, the usual "best N tokens"
    curation contract).

    Scale shape — a naive global cumulative-sum window is a single-task
    sort of the corpus; instead quality is bucketed exactly (scores are
    ``1/bucket_scale``-quantized already, so ``round(q*scale)`` is a lossless
    integer key) and the walk decomposes into:

    1. per-bucket token totals (map-side combined; bucket table <= scale+1
       rows) with a cumulative sum over the TINY bucket table;
    2. buckets whose running total fits entirely -> selected wholesale, no
       per-row sort anywhere;
    3. only the single boundary bucket sorts its rows (window by id) to cut
       the prefix mid-bucket.

    Equivalent to the one-window walk by construction: a row is selected iff
    (tokens of all strictly-better buckets) + (its within-bucket running
    sum) <= budget, which is exactly the global take-while condition.

    Returns the selected rows of ``df`` (all original columns).
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    b = F.round(F.col(quality_col) * bucket_scale, 0).cast("bigint")
    d = df.withColumn("_qb", b)
    per_bucket = d.groupBy("_qb").agg(F.sum(size_col).cast("bigint").alias("_bsum"))
    wcum = (
        Window.orderBy(F.desc("_qb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = per_bucket.withColumn("_cum", F.sum("_bsum").over(wcum)).select(
        "_qb", (F.col("_cum") - F.col("_bsum")).alias("_prior"), "_bsum"
    )
    full = cum.filter(F.col("_prior") + F.col("_bsum") <= budget).select("_qb")
    boundary = cum.filter(
        (F.col("_prior") <= budget) & (F.col("_prior") + F.col("_bsum") > budget)
    ).select("_qb", "_prior")
    picked_full = d.join(F.broadcast(full), "_qb")
    win = Window.partitionBy("_qb").orderBy(F.col(id_col).asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    picked_boundary = (
        d.join(F.broadcast(boundary), "_qb")
        .withColumn("_cin", F.sum(size_col).over(win))
        .filter(F.col("_prior") + F.col("_cin") <= budget)
        .drop("_cin", "_prior")
    )
    return picked_full.unionByName(picked_boundary).drop("_qb")


def shuffle_deterministic(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    salt: str = "shuffle",
) -> DataFrame:
    """Reproducible global corpus shuffle: total order by
    (md5(salt || id), id) — the training-order primitive. Same salt → same
    order on every run and every engine; a new salt is a fresh epoch
    permutation. The sort is a range exchange (distributed), and the key
    column ``skey`` stays in the output so downstream stages can re-sort or
    verify without recomputing."""
    key = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    return df.withColumn("skey", key).orderBy("skey", id_col)


def sample_weighted_k(
    df: DataFrame,
    *,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "wsample",
    sub_shards: int = 16,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, A-Res): each row draws u = hash(salt || id) in (0,1) and
    scores key = ln(u) / w; the k LARGEST keys win — inclusion probability
    proportional to weight, reproducible across runs and engines because u
    is the 52-bit md5 hash, not a RNG. The standard quality-weighted corpus
    subsample.

    Scale shape: two-phase top-k (the `sample_exact_k` pattern) — phase 1
    keeps k per hash sub-shard so no single task sorts the corpus; phase 2
    ranks the <= k*sub_shards survivors. Keys are rounded to 9 dp with id
    tiebreak so the ranking is engine-stable.

    Rows with weight <= 0 are excluded (they have -inf keys in the limit;
    the oracle mirrors the filter). Returns the winning rows plus
    (ws_key, ws_rank)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyvectorsearch_spark.operators.sketches import kmv_hash

    u = kmv_hash(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    key = F.round(F.log(u) / F.col(weight_col), 9)
    d = df.filter(F.col(weight_col) > 0).withColumn("ws_key", key)
    shard = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + "#"), F.col(id_col).cast("string"))), 1, 4),
        16,
        10,
    ).cast("bigint") % sub_shards
    w1 = Window.partitionBy(shard).orderBy(F.desc("ws_key"), F.col(id_col))
    cand = d.withColumn("_r1", F.row_number().over(w1)).filter(F.col("_r1") <= k)
    w2 = Window.orderBy(F.desc("ws_key"), F.col(id_col))
    return (
        cand.withColumn("ws_rank", F.row_number().over(w2))
        .filter(F.col("ws_rank") <= k)
        .drop("_r1")
    )


def sample_stratified_exact_frac(
    df: DataFrame,
    *,
    strata_col: str,
    frac_num: int,
    frac_den: int,
    id_col: str = "doc_id",
    salt: str = "exactfrac",
    sub_shards: int = 8,
) -> DataFrame:
    """EXACT proportional stratified sampling: every stratum contributes
    floor(n_s * frac_num / frac_den) rows — unlike Bernoulli-by-hash (whose
    per-stratum counts fluctuate), the realized fraction is exact, which is
    what benchmark/val splits that must preserve source mixture need. The
    fraction is a rational (integer arithmetic — no FP boundary can flip a
    count between engines).

    Scale shape: per-stratum counts attach via one aggregate joined back
    (stratum-cardinality table, AQE-broadcast); membership is the same
    two-phase deterministic-hash top-k as ``sample_exact_k``, so no stratum
    sorts in one task. Returns the sampled rows + ``sample_rank``."""
    if frac_num < 0 or frac_den < 1:
        raise ValueError(f"bad fraction {frac_num}/{frac_den}")
    counts = df.groupBy(strata_col).agg(F.count("*").alias("_ns"))
    quota = counts.withColumn(
        "_k", ((F.col("_ns") * frac_num) - (F.col("_ns") * frac_num) % frac_den)
        / frac_den
    ).select(strata_col, F.col("_k").cast("bigint"))
    b = hash_bucket(F.col(id_col), salt)
    d = df.join(quota, strata_col)
    sub = (b * sub_shards) / F.lit(BUCKETS)
    w1 = Window.partitionBy(strata_col, F.floor(sub)).orderBy(b, F.col(id_col))
    cand = d.withColumn("_r1", F.row_number().over(w1)).filter(
        F.col("_r1") <= F.col("_k")
    )
    w2 = Window.partitionBy(strata_col).orderBy(b, F.col(id_col))
    return (
        cand.withColumn("sample_rank", F.row_number().over(w2))
        .filter(F.col("sample_rank") <= F.col("_k"))
        .drop("_r1", "_k")
    )


def dsir_logweights(
    df: DataFrame,
    *,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    salt: str = "dsir",
) -> DataFrame:
    """DSIR importance weights: hashed-n-gram log importance of every
    document against a target domain (Xie, Santurkar, Ma & Liang, "Data
    Selection for Language Models via Importance Resampling", NeurIPS 2023).

    Features are word unigrams+bigrams WITH multiplicity, hashed into
    ``n_buckets`` buckets by the corpus-standard md5→48-bit construction
    (same as ``hash_bucket`` — so DuckDB reproduces every bucket id
    exactly). Bucket distributions with add-1 smoothing:

        p̂(b) = (tc_b + 1) / (T + B)   over docs where ``target`` holds
        q̂(b) = (rc_b + 1) / (R + B)   over the whole (raw) pool

    and the per-document log importance weight is

        log w(doc) = Σ_b c_doc(b) · (log p̂(b) − log q̂(b)).

    The paper resamples with Gumbel-noised weights; we keep the weight
    computation (the data-dependent part) and leave selection to the
    deterministic samplers in this module (e.g. flag ``log w > 0`` or
    top-k by weight), so the whole operator stays RNG-free and
    oracle-checkable.

    Scale shape (100 TB): one explode → partial-aggregated
    groupBy(doc, bucket); the bucket table is ``n_buckets`` rows — a
    broadcast-joined constant regardless of corpus size; the final
    groupBy(doc) is the only full-width shuffle. The raw/target totals are
    a one-row aggregate (metadata, not data).

    Returns ``(id_col, logweight)`` — one row per document that produced at
    least one feature; join back to the corpus and ``coalesce`` to 0.0 for
    featureless docs.
    """
    from pyvectorsearch_spark.functions.text import tokens, word_ngrams

    tok = tokens(text_col)
    grams = F.concat(tok, word_ngrams(tok, 2))
    feats = df.select(
        F.col(id_col), target.alias("_is_t"), F.explode(grams).alias("_g")
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt + ":"), F.col("_g"))), 1, 12),
            16,
            10,
        ).cast("long")
        % n_buckets
    )
    cb = feats.groupBy(F.col(id_col), F.col("_is_t"), bucket.alias("_b")).agg(
        F.count("*").alias("_c")
    )
    bl = cb.groupBy("_b").agg(
        F.sum("_c").alias("_rc"),
        F.sum(F.when(F.col("_is_t"), F.col("_c")).otherwise(F.lit(0))).alias("_tc"),
    )
    tot = bl.agg(F.sum("_rc").alias("_R"), F.sum("_tc").alias("_T"))
    w = bl.crossJoin(F.broadcast(tot)).select(
        "_b",
        (
            F.log((F.col("_tc") + 1) / (F.col("_T") + n_buckets))
            - F.log((F.col("_rc") + 1) / (F.col("_R") + n_buckets))
        ).alias("_w"),
    )
    return (
        cb.join(F.broadcast(w), "_b")
        .groupBy(id_col)
        .agg(F.sum(F.col("_c") * F.col("_w")).alias("logweight"))
    )


def temperature_mixture_thresholds(
    df: DataFrame,
    *,
    source_col: str = "source",
    target_rows: int,
    salt: str = "tmix",
) -> DataFrame:
    """Temperature-scaled mixture thresholds at T = 1/2: source s gets a
    share of ``target_rows`` proportional to ``sqrt(n_s)`` — the standard
    upsample-the-tail policy for multilingual/multi-source LM training
    (exponent-smoothed sampling, as popularized by multilingual NMT and
    mT5-style pipelines; T=1 is proportional, T→0 uniform).

    T is fixed at 1/2 deliberately: IEEE-754 specifies ``sqrt`` as correctly
    rounded, so ``sqrt(n_s)`` is bit-identical in every engine, unlike
    ``pow(n, 1/T)`` whose last ulp is libm-specific. The share denominator
    Σ√n_s is folded over sources in SORTED source order on both sides
    (Spark: array_sort + aggregate; oracle: list_reduce over list(... ORDER
    BY source)), so even the double SUM is bit-identical and the floor'd
    integer thresholds — and therefore mixture MEMBERSHIP — can never flip
    between engines.

    Returns (source, n_source, threshold) — one row per source,
    broadcast-joined by ``weighted_mixture_flag``-style membership
    (``hash_bucket(id, salt) < threshold``). Scale shape: identical to
    ``mixture_thresholds`` — a source-count aggregate (metadata-sized) and a
    zero-shuffle membership projection.
    """
    counts = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count("*").alias("n_source")
    )
    rts = counts.withColumn("_rt", F.sqrt(F.col("n_source").cast("double")))
    s = rts.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("source", "_rt"))),
            F.lit(0.0),
            lambda acc, x: acc + x["_rt"],
        ).alias("_sum_rt")
    )
    thr = (
        F.lit(float(target_rows))
        * F.col("_rt")
        / F.col("_sum_rt")
        / F.col("n_source").cast("double")
        * F.lit(float(BUCKETS))
    )
    return (
        rts.crossJoin(F.broadcast(s))
        .withColumn(
            "threshold",
            F.least(F.floor(thr).cast("bigint"), F.lit(BUCKETS).cast("bigint")),
        )
        .select("source", "n_source", "threshold")
    )
