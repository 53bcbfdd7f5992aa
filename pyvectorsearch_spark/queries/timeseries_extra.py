"""Time-series queries (outside the driver's pinned 50-entry window; covered
by tests/test_oracle_parity.py against the same DuckDB oracles).

Operators exercised: `operators/timeseries.py::resample_counts` (dense
fixed-width grid with zero-filled gaps) and `interpolate_gaps` (linear
in-fill over missing cells). Buckets are epoch-second integers — engine-
exact by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyvectorsearch_spark.operators.timeseries import interpolate_gaps, resample_counts
from pyvectorsearch_spark.sources.tables import load_table, spread

TS_WIDTH_S = 900  # 15-minute buckets


def q_events_resample_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense 15-minute resampling of the event stream per type: every
    bucket between a type's first and last event, zero-filled counts and
    NULL value sums for empty buckets."""
    ev = spread(load_table(spark, sf_dir, "events"))
    return resample_counts(
        ev, by="event_type", ts_col="ts", value_col="value", width_s=TS_WIDTH_S
    ).orderBy("event_type", "bucket_epoch")


ORACLE_RESAMPLE = f"""
WITH h AS (
  SELECT event_type,
         (floor(epoch(ts) / {TS_WIDTH_S}) * {TS_WIDTH_S})::BIGINT AS be,
         count(*)::BIGINT AS n, round(sum(value), 6) AS tv
  FROM events GROUP BY event_type, be
),
mm AS (SELECT event_type, min(be) AS mn, max(be) AS mx FROM h GROUP BY event_type),
grid AS (
  SELECT event_type, unnest(range(mn, mx + 1, {TS_WIDTH_S})) AS be FROM mm
)
SELECT g.event_type, g.be AS bucket_epoch,
       coalesce(h.n, 0)::BIGINT AS n, h.tv AS total_value
FROM grid g LEFT JOIN h ON h.event_type = g.event_type AND h.be = g.be
ORDER BY g.event_type, bucket_epoch
"""


def q_events_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over the empty buckets of the dense grid,
    summarized per type with a digest over every filled cell (values scaled
    to exact integers so the digest is engine-stable)."""
    ev = spread(load_table(spark, sf_dir, "events"))
    grid = resample_counts(
        ev, by="event_type", ts_col="ts", value_col="value", width_s=TS_WIDTH_S
    )
    filled = interpolate_gaps(grid, by="event_type")
    fb = F.round(F.col("filled") * 1_000_000).cast("bigint")
    return (
        filled.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_buckets"),
            F.sum("was_gap").cast("bigint").alias("n_gaps"),
            F.round(F.sum(fb) / 1_000_000.0, 4).alias("filled_sum"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("bucket_epoch", fb.alias("_fb")))
                        ),
                        lambda s: s["_fb"].cast("string"),
                    ),
                )
            ).alias("filled_digest"),
        )
        .orderBy("event_type")
    )


ORACLE_INTERPOLATE = f"""
WITH h AS (
  SELECT event_type,
         (floor(epoch(ts) / {TS_WIDTH_S}) * {TS_WIDTH_S})::BIGINT AS be,
         round(sum(value), 6) AS tv
  FROM events GROUP BY event_type, be
),
mm AS (SELECT event_type, min(be) AS mn, max(be) AS mx FROM h GROUP BY event_type),
grid AS (
  SELECT event_type, unnest(range(mn, mx + 1, {TS_WIDTH_S})) AS be FROM mm
),
g AS (
  SELECT grid.event_type, grid.be, h.tv
  FROM grid LEFT JOIN h ON h.event_type = grid.event_type AND h.be = grid.be
),
w AS (
  SELECT event_type, be, tv,
         last_value(tv IGNORE NULLS) OVER
           (PARTITION BY event_type ORDER BY be
            ROWS UNBOUNDED PRECEDING) AS pv,
         last_value(CASE WHEN tv IS NOT NULL THEN be::DOUBLE END IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY be
                 ROWS UNBOUNDED PRECEDING) AS pt,
         first_value(tv IGNORE NULLS) OVER
           (PARTITION BY event_type ORDER BY be
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         first_value(CASE WHEN tv IS NOT NULL THEN be::DOUBLE END IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY be
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
  FROM g
),
f AS (
  SELECT event_type, be,
         CASE WHEN tv IS NULL THEN 1 ELSE 0 END AS was_gap,
         round(
           CASE WHEN tv IS NOT NULL THEN tv
                WHEN pv IS NULL THEN nv
                WHEN nv IS NULL THEN pv
                ELSE pv + (nv - pv) * (be::DOUBLE - pt) / (nt - pt)
           END, 6) AS filled
  FROM w
),
s AS (
  SELECT event_type, be, was_gap,
         round(filled * 1000000)::BIGINT AS fb
  FROM f
)
SELECT event_type, count(*)::BIGINT AS n_buckets,
       sum(was_gap)::BIGINT AS n_gaps,
       round(sum(fb) / 1000000.0, 4) AS filled_sum,
       md5(string_agg(fb::VARCHAR, ',' ORDER BY be)) AS filled_digest
FROM s GROUP BY event_type ORDER BY event_type
"""


ROLL_W = 4  # trailing 4-bucket (1-hour) window


def q_events_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour rolling statistics over the dense grid: moving
    average / max / min of the 15-minute counts per type (exact integer
    sums ÷ varying window width — deterministic division, rounded 6 dp).
    The dense grid matters: without gap fill the window would skip empty
    buckets and overstate activity."""
    from pyspark.sql import Window

    ev = spread(load_table(spark, sf_dir, "events"))
    grid = resample_counts(ev, by="event_type", ts_col="ts", width_s=TS_WIDTH_S)
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_epoch")
        .rowsBetween(-(ROLL_W - 1), Window.currentRow)
    )
    return (
        grid.select(
            "event_type",
            "bucket_epoch",
            "n",
            F.round(F.avg("n").over(w), 6).alias("roll_avg"),
            F.max("n").over(w).alias("roll_max"),
            F.min("n").over(w).alias("roll_min"),
        )
        .orderBy("event_type", "bucket_epoch")
    )


ORACLE_ROLLING = f"""
WITH h AS (
  SELECT event_type,
         (floor(epoch(ts) / {TS_WIDTH_S}) * {TS_WIDTH_S})::BIGINT AS be,
         count(*)::BIGINT AS n
  FROM events GROUP BY event_type, be
),
mm AS (SELECT event_type, min(be) AS mn, max(be) AS mx FROM h GROUP BY event_type),
grid AS (
  SELECT mm.event_type, unnest(range(mn, mx + 1, {TS_WIDTH_S})) AS be FROM mm
),
g AS (
  SELECT grid.event_type, grid.be, coalesce(h.n, 0)::BIGINT AS n
  FROM grid LEFT JOIN h ON h.event_type = grid.event_type AND h.be = grid.be
)
SELECT event_type, be AS bucket_epoch, n,
       round(avg(n) OVER w, 6) AS roll_avg,
       max(n) OVER w AS roll_max,
       min(n) OVER w AS roll_min
FROM g
WINDOW w AS (PARTITION BY event_type ORDER BY be
             ROWS BETWEEN {ROLL_W - 1} PRECEDING AND CURRENT ROW)
ORDER BY event_type, bucket_epoch
"""


ANOM_W = 16  # 4-hour trailing baseline, current bucket excluded
ANOM_SIGMA = 2.0


def q_events_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection over the dense grid: buckets whose
    count deviates more than 2 sigma from the trailing 4-hour baseline
    (current bucket excluded; only full windows flag). The rolling moments
    are EXACT integer sums (sum, sum of squares over bigint counts), so
    mean/variance are deterministic double divisions — no Welford-vs-naive
    engine divergence can occur."""
    from pyspark.sql import Window

    ev = spread(load_table(spark, sf_dir, "events"))
    grid = resample_counts(ev, by="event_type", ts_col="ts", width_s=TS_WIDTH_S)
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_epoch")
        .rowsBetween(-ANOM_W, -1)
    )
    s = F.sum("n").over(w).cast("double")
    sq = F.sum(F.col("n") * F.col("n")).over(w).cast("double")
    cnt = F.count("n").over(w).cast("double")
    mean = s / cnt
    var = sq / cnt - mean * mean
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    flagged = (
        grid.withColumn("_mean", mean)
        .withColumn("_sd", sd)
        .withColumn("_cnt", cnt)
        .filter(
            (F.col("_cnt") == ANOM_W)
            & (F.abs(F.col("n") - F.col("_mean")) > ANOM_SIGMA * F.col("_sd"))
        )
    )
    return flagged.select(
        "event_type",
        "bucket_epoch",
        "n",
        F.round("_mean", 6).alias("baseline_mean"),
        F.round("_sd", 6).alias("baseline_sd"),
    ).orderBy("event_type", "bucket_epoch")


ORACLE_ANOMALIES = f"""
WITH h AS (
  SELECT event_type,
         (floor(epoch(ts) / {TS_WIDTH_S}) * {TS_WIDTH_S})::BIGINT AS be,
         count(*)::BIGINT AS n
  FROM events GROUP BY event_type, be
),
mm AS (SELECT event_type, min(be) AS mn, max(be) AS mx FROM h GROUP BY event_type),
grid AS (
  SELECT mm.event_type, unnest(range(mn, mx + 1, {TS_WIDTH_S})) AS be FROM mm
),
g AS (
  SELECT grid.event_type, grid.be, coalesce(h.n, 0)::BIGINT AS n
  FROM grid LEFT JOIN h ON h.event_type = grid.event_type AND h.be = grid.be
),
m AS (
  SELECT event_type, be, n,
         sum(n) OVER w::DOUBLE AS s,
         sum(n * n) OVER w::DOUBLE AS sq,
         count(n) OVER w::DOUBLE AS cnt
  FROM g
  WINDOW w AS (PARTITION BY event_type ORDER BY be
               ROWS BETWEEN {ANOM_W} PRECEDING AND 1 PRECEDING)
),
z AS (
  SELECT event_type, be, n, s / cnt AS mean,
         sqrt(greatest(sq / cnt - (s / cnt) * (s / cnt), 0.0)) AS sd, cnt
  FROM m
)
SELECT event_type, be AS bucket_epoch, n,
       round(mean, 6) AS baseline_mean,
       round(sd, 6) AS baseline_sd
FROM z
WHERE cnt = {ANOM_W} AND abs(n - mean) > {ANOM_SIGMA} * sd
ORDER BY event_type, bucket_epoch
"""


HOP_WIDTH_S = 1800
HOP_SLIDE_S = 900


def q_events_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOPPING (sliding) window aggregation — 30-minute windows every 15
    minutes via Spark's native `window(ts, width, slide)`, so each event
    lands in exactly two overlapping windows. Completes the window-shape
    matrix next to the tumbling and session streaming queries; the oracle
    derives each event's two epoch-aligned window starts arithmetically."""
    ev = spread(load_table(spark, sf_dir, "events"))
    w = F.window("ts", f"{HOP_WIDTH_S} seconds", f"{HOP_SLIDE_S} seconds")
    return (
        ev.groupBy("event_type", w.alias("w"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            "event_type",
            F.unix_timestamp(F.col("w.start")).cast("bigint").alias("win_start"),
            "n",
            "total_value",
        )
        .orderBy("event_type", "win_start")
    )


ORACLE_HOPPING = f"""
WITH e AS (
  SELECT event_type, value,
         (floor(epoch(ts) / {HOP_SLIDE_S}) * {HOP_SLIDE_S})::BIGINT AS b
  FROM events
),
x AS (
  SELECT event_type, value, unnest([b, b - {HOP_SLIDE_S}]) AS win_start FROM e
)
SELECT event_type, win_start, count(*)::BIGINT AS n,
       round(sum(value), 6) AS total_value
FROM x GROUP BY event_type, win_start
ORDER BY event_type, win_start
"""



EWMA_ALPHA = 0.5
EWMA_LOOKBACK = 8


def q_events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated EWMA smoother over the dense 15-minute grid (alpha=0.5,
    8-bucket lookback, pandas `ewm(adjust=True)`-style normalization by
    the available weights at the series head): the forecasting-smoother
    companion of the rolling stats. The recursion is unrolled into a
    FIXED sum of 8 lag terms in a pinned order, so the result is
    engine-exact and the oracle replays the identical expression."""
    from pyspark.sql import Window

    from pyvectorsearch_spark.operators.timeseries import resample_counts

    ev = spread(load_table(spark, sf_dir, "events"))
    grid = resample_counts(ev, by="event_type", ts_col="ts", width_s=TS_WIDTH_S)
    w = Window.partitionBy("event_type").orderBy("bucket_epoch")
    num = F.lit(0.0)
    den = F.lit(0.0)
    for k in range(EWMA_LOOKBACK):
        coef = EWMA_ALPHA ** k
        x = F.lag(F.col("n").cast("double"), k).over(w)
        num = num + F.when(x.isNotNull(), F.lit(coef) * x).otherwise(F.lit(0.0))
        den = den + F.when(x.isNotNull(), F.lit(coef)).otherwise(F.lit(0.0))
    return grid.select(
        "event_type",
        "bucket_epoch",
        "n",
        F.round(num / den, 6).alias("ewma_r"),
    ).orderBy("event_type", "bucket_epoch")


def _oracle_ewma() -> str:
    terms_n, terms_d = [], []
    for k in range(EWMA_LOOKBACK):
        coef = repr(EWMA_ALPHA ** k)
        lagx = f"lag(CAST(n AS DOUBLE), {k}) OVER (PARTITION BY event_type ORDER BY bucket_epoch)"
        terms_n.append(
            f"CASE WHEN {lagx} IS NOT NULL THEN {coef} * {lagx} ELSE 0.0 END"
        )
        terms_d.append(f"CASE WHEN {lagx} IS NOT NULL THEN {coef} ELSE 0.0 END")
    num = "0.0 + " + " + ".join(terms_n)
    den = "0.0 + " + " + ".join(terms_d)
    return f"""
WITH h AS (
  SELECT event_type,
         (floor(epoch(ts) / {TS_WIDTH_S}) * {TS_WIDTH_S})::BIGINT AS be,
         count(*)::BIGINT AS n
  FROM events GROUP BY event_type, be
),
mm AS (SELECT event_type, min(be) AS mn, max(be) AS mx FROM h GROUP BY event_type),
grid AS (
  SELECT event_type, unnest(range(mn, mx + 1, {TS_WIDTH_S})) AS be FROM mm
),
g AS (
  SELECT gr.event_type, gr.be AS bucket_epoch, coalesce(h.n, 0)::BIGINT AS n
  FROM grid gr LEFT JOIN h ON h.event_type = gr.event_type AND h.be = gr.be
)
SELECT event_type, bucket_epoch, n, round(({num}) / ({den}), 6) AS ewma_r
FROM g ORDER BY event_type, bucket_epoch
"""


ORACLE_EVENTS_EWMA = _oracle_ewma()


def q_events_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling DISTINCT-user count per event type: active users in the
    trailing 1 hour, evaluated on the 15-minute grid — the live-audience
    metric plain rolling sums cannot express (sums double-count repeat
    users). Exact two-stage shape: events collapse to distinct
    (type, bucket, user) rows first (map-side combinable), then a
    rows-window of per-bucket user ARRAYS unions the trailing 4 buckets —
    set arithmetic over per-bucket distinct sets, never raw events, and the
    window is rows-bounded (4), not range-unbounded. First 3 grid buckets
    per type are emitted too (shorter lookback, like the EWMA head)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    b = (F.unix_timestamp("ts") - F.unix_timestamp("ts") % 900).cast("bigint")
    tb = (
        ev.select("event_type", b.alias("bucket"), "user_id")
        .distinct()
        .groupBy("event_type", "bucket")
        .agg(F.collect_set("user_id").alias("_users"))
    )
    w = Window.partitionBy("event_type").orderBy("bucket").rowsBetween(-3, 0)
    # grid gaps: buckets with zero events are absent from tb, so a rows
    # window could reach further back than 1 h — re-densify on the grid
    grid = tb.groupBy("event_type").agg(
        F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi")
    )
    dense = grid.select(
        "event_type",
        F.explode(F.sequence("_lo", "_hi", F.lit(900))).alias("bucket"),
    )
    tbd = dense.join(tb, ["event_type", "bucket"], "left").withColumn(
        "_users", F.coalesce("_users", F.array().cast("array<bigint>"))
    )
    rolled = tbd.withColumn(
        "n_active",
        F.size(F.array_distinct(F.flatten(F.collect_list("_users").over(w)))).cast(
            "bigint"
        ),
    )
    return rolled.select("event_type", "bucket", "n_active").orderBy(
        "event_type", "bucket"
    )


ORACLE_ROLLING_DISTINCT = """
WITH e AS (
  SELECT DISTINCT event_type,
         (floor(epoch(ts) / 900) * 900)::BIGINT AS bucket,
         user_id
  FROM events
),
grid AS (
  SELECT event_type, unnest(range(min(bucket), max(bucket) + 900, 900)) AS bucket
  FROM e GROUP BY event_type
)
SELECT g.event_type, g.bucket,
       (SELECT count(DISTINCT e.user_id) FROM e
        WHERE e.event_type = g.event_type
          AND e.bucket BETWEEN g.bucket - 2700 AND g.bucket)::BIGINT AS n_active
FROM grid g
ORDER BY g.event_type, g.bucket
"""


def q_events_seasonal_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal profile per event type — the seasonality FOLD
    (all days overlaid on one 24-hour clock, unlike the hourly rollup's
    calendar axis): volume share and value level per (type, hour), plus
    each type's peak hour broadcast onto its rows. One map-side-combined
    aggregate to types×24 rows; everything after runs on that tiny table."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    prof = ev.groupBy(
        "event_type", F.hour("ts").alias("hod")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(F.avg("value"), 6).alias("avg_value"),
    )
    w = Window.partitionBy("event_type")
    wpk = Window.partitionBy("event_type").orderBy(F.desc("n"), F.asc("hod"))
    return (
        prof.withColumn(
            "share", F.round(F.col("n") / F.sum("n").over(w), 6)
        )
        .withColumn("_rk", F.row_number().over(wpk))
        .withColumn(
            "peak_hod", F.max(F.when(F.col("_rk") == 1, F.col("hod"))).over(w)
        )
        .drop("_rk")
        .orderBy("event_type", "hod")
    )


ORACLE_SEASONAL_HOURLY = """
WITH prof AS (
  SELECT event_type, extract(hour FROM ts)::INT AS hod,
         count(*)::BIGINT AS n, round(avg(value), 6) AS avg_value
  FROM events GROUP BY 1, 2
),
pk AS (
  SELECT event_type, hod AS peak_hod,
         row_number() OVER (PARTITION BY event_type ORDER BY n DESC, hod ASC) AS rk
  FROM prof
)
SELECT p.event_type, p.hod, p.n, p.avg_value,
       round(p.n / sum(p.n) OVER (PARTITION BY p.event_type), 6) AS share,
       pk.peak_hod
FROM prof p JOIN pk ON pk.event_type = p.event_type AND pk.rk = 1
ORDER BY p.event_type, p.hod
"""


RKMV_K = 8  # small on purpose: 96% of sf0.01 windows exceed capacity, so the estimator actually fires


def q_events_rolling_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE path for rolling distinct users: per-bucket KMV k-min
    sketches merged across the trailing-1h window — per-bucket state is
    capped at k hashes however large the audience, unlike the exact
    set-array variant whose arrays grow with it. KMV merge is "k smallest
    of the union", so the merged sketch equals the k smallest distinct
    hashes of the whole window — exactly what the oracle recomputes from
    raw rows; the estimate (k−1)/u_k (exact below capacity) is therefore
    engine-identical, like every KMV number in `operators/sketches.py`.
    The exact windowed distinct rides along as the accuracy reference.
    Returns (bucket, n_window, kmv_estimate)."""
    from pyspark.sql import Window

    from pyvectorsearch_spark.operators.sketches import kmv_hash

    ev = load_table(spark, sf_dir, "events")
    b = (F.floor(F.unix_timestamp("ts") / 900) * 900).cast("bigint")
    tb = (
        ev.select(b.alias("bucket"), kmv_hash(F.col("user_id")).alias("_u"))
        .distinct()
        .groupBy("bucket")
        .agg(F.array_sort(F.collect_set("_u")).alias("_all"))
        .withColumn("_sk", F.slice("_all", 1, RKMV_K))
    )
    grid = tb.agg(F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi"))
    dense = grid.select(
        F.explode(F.sequence("_lo", "_hi", F.lit(900))).alias("bucket")
    )
    tbd = (
        dense.join(tb, "bucket", "left")
        .withColumn("_sk", F.coalesce("_sk", F.array().cast("array<double>")))
        .withColumn("_all", F.coalesce("_all", F.array().cast("array<double>")))
    )
    w = Window.orderBy("bucket").rowsBetween(-3, 0)
    merged = F.slice(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("_sk").over(w)))),
        1,
        RKMV_K,
    )
    n_exact = F.size(
        F.array_distinct(F.flatten(F.collect_list("_all").over(w)))
    ).cast("bigint")
    rolled = tbd.select(
        "bucket",
        n_exact.alias("n_window"),
        merged.alias("_m"),
    ).select(
        "bucket",
        "n_window",
        F.size("_m").cast("bigint").alias("_n_m"),
        F.try_element_at("_m", F.lit(RKMV_K)).alias("_uk"),
    )
    est = F.when(
        F.col("_uk").isNotNull(), F.round((RKMV_K - 1) / F.col("_uk"), 3)
    ).otherwise(F.col("_n_m").cast("double"))
    return rolled.select(
        "bucket", "n_window", est.alias("kmv_estimate")
    ).orderBy("bucket")


def _oracle_rolling_kmv() -> str:
    from pyvectorsearch_spark.operators.sketches import duckdb_kmv_hash

    u = duckdb_kmv_hash("user_id")
    return f"""
WITH e AS (
  SELECT DISTINCT (floor(epoch(ts) / 900) * 900)::BIGINT AS bucket, {u} AS u
  FROM events
),
grid AS (SELECT unnest(range(min(bucket), max(bucket) + 900, 900)) AS bucket FROM e)
SELECT g.bucket,
       (SELECT count(DISTINCT e.u) FROM e
        WHERE e.bucket BETWEEN g.bucket - 2700 AND g.bucket)::BIGINT AS n_window,
       coalesce(
         (SELECT round({RKMV_K - 1} / u, 3) FROM (
            SELECT DISTINCT e.u AS u FROM e
            WHERE e.bucket BETWEEN g.bucket - 2700 AND g.bucket
            ORDER BY u LIMIT 1 OFFSET {RKMV_K - 1}
         )),
         (SELECT count(DISTINCT e.u) FROM e
          WHERE e.bucket BETWEEN g.bucket - 2700 AND g.bucket)::DOUBLE
       ) AS kmv_estimate
FROM grid g
ORDER BY g.bucket
"""


ORACLE_ROLLING_KMV = _oracle_rolling_kmv()


def q_events_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type linear TREND of hourly volume: OLS slope/intercept of count
    vs hour index from EXACT integer moment sums (n, Σx, Σy, Σxy, Σx² —
    all bigint; division and rounding only at the end), so the fit is
    engine-identical (the Zipf-fit determinism ladder on the time axis).
    One map-side aggregate to types×hours rows, then a types-sized moment
    rollup."""
    ev = load_table(spark, sf_dir, "events")
    hb = (F.floor(F.unix_timestamp("ts") / 3600)).cast("bigint")
    hc = ev.groupBy("event_type", hb.alias("h")).agg(
        F.count("*").cast("bigint").alias("y")
    )
    base = hc.groupBy("event_type").agg(F.min("h").alias("_h0"))
    d = hc.join(base, "event_type").select(
        "event_type", (F.col("h") - F.col("_h0")).alias("x"), "y"
    )
    m = d.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    den = m["n"] * m["sxx"] - m["sx"] * m["sx"]
    slope = F.when(
        den != 0,
        F.round((m["n"] * m["sxy"] - m["sx"] * m["sy"]) / den.cast("double"), 6),
    ).otherwise(F.lit(0.0))
    intercept = F.round(
        (m["sy"] - F.col("slope") * m["sx"]) / m["n"].cast("double"), 6
    )
    return (
        m.withColumn("slope", slope)
        .withColumn("intercept", intercept)
        .select("event_type", "n", "slope", "intercept")
        .orderBy("event_type")
    )


ORACLE_EVENTS_TREND = """
WITH hc AS (
  SELECT event_type, floor(epoch(ts) / 3600)::BIGINT AS h, count(*)::BIGINT AS y
  FROM events GROUP BY 1, 2
),
d AS (
  SELECT event_type, h - min(h) OVER (PARTITION BY event_type) AS x, y FROM hc
),
m AS (
  SELECT event_type, count(*)::BIGINT AS n,
         sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
         sum(x * y)::BIGINT AS sxy, sum(x * x)::BIGINT AS sxx
  FROM d GROUP BY event_type
)
SELECT event_type, n,
       CASE WHEN n * sxx - sx * sx <> 0
            THEN round((n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE), 6)
            ELSE 0.0 END AS slope,
       round((sy - (CASE WHEN n * sxx - sx * sx <> 0
            THEN round((n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE), 6)
            ELSE 0.0 END) * sx) / CAST(n AS DOUBLE), 6) AS intercept
FROM m ORDER BY event_type
"""


def q_events_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per event type: the cumulative sum of
    hourly-count deviations from the type mean peaks (in |S|) at the most
    likely level-shift point (Page 1954's offline CUSUM scan). Determinism
    ladder: deviations are exact (count·n − total, all bigint — the mean is
    never materialized as a float), the running sum is an ordered window
    over the dense hour grid, and the argmax tie-breaks on the earliest
    bucket — so the detected changepoint and its magnitude are
    engine-identical. Dense grid ⇒ zero-count hours count as deviations
    (a silent outage IS a level shift). Scale: one map-side hourly rollup,
    one grid window per type, one types-sized argmax."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    hb = (F.floor(F.unix_timestamp("ts") / 3600)).cast("bigint")
    hc = ev.groupBy("event_type", hb.alias("h")).agg(
        F.count("*").cast("bigint").alias("y")
    )
    grid = hc.groupBy("event_type").agg(
        F.min("h").alias("_lo"), F.max("h").alias("_hi")
    )
    dense = grid.select(
        "event_type", F.explode(F.sequence("_lo", "_hi")).alias("h")
    )
    dn = dense.join(hc, ["event_type", "h"], "left").withColumn(
        "y", F.coalesce("y", F.lit(0)).cast("bigint")
    )
    tot = dn.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("nh"),
        F.sum("y").cast("bigint").alias("ty"),
    )
    w = Window.partitionBy("event_type").orderBy("h").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # scaled deviation y*nh - ty keeps everything integer; S is its exact
    # running sum (bigint), |S| compared in integers, argmax ties -> min h
    dev = dn.join(tot, "event_type").withColumn(
        "_s", F.sum(F.col("y") * F.col("nh") - F.col("ty")).over(w).cast("bigint")
    )
    wmax = Window.partitionBy("event_type").orderBy(
        F.abs("_s").desc(), F.asc("h")
    )
    return (
        dev.withColumn("_rk", F.row_number().over(wmax))
        .filter(F.col("_rk") == 1)
        .select(
            "event_type",
            F.col("h").alias("cp_hour"),
            F.round(F.abs("_s") / F.col("nh").cast("double"), 6).alias(
                "cusum_peak"
            ),
        )
        .orderBy("event_type")
    )


ORACLE_EVENTS_CHANGEPOINT = """
WITH hc AS (
  SELECT event_type, floor(epoch(ts) / 3600)::BIGINT AS h, count(*)::BIGINT AS y
  FROM events GROUP BY 1, 2
),
grid AS (
  SELECT event_type, unnest(range(min(h), max(h) + 1)) AS h
  FROM hc GROUP BY event_type
),
dn AS (
  SELECT g.event_type, g.h, coalesce(hc.y, 0)::BIGINT AS y
  FROM grid g LEFT JOIN hc ON hc.event_type = g.event_type AND hc.h = g.h
),
tot AS (
  SELECT event_type, count(*)::BIGINT AS nh, sum(y)::BIGINT AS ty
  FROM dn GROUP BY event_type
),
cs AS (
  SELECT dn.event_type, dn.h,
         sum(dn.y * tot.nh - tot.ty) OVER (
           PARTITION BY dn.event_type ORDER BY dn.h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         )::BIGINT AS s,
         tot.nh
  FROM dn JOIN tot USING (event_type)
),
pk AS (
  SELECT event_type, h AS cp_hour, round(abs(s) / CAST(nh AS DOUBLE), 6) AS cusum_peak,
         row_number() OVER (PARTITION BY event_type ORDER BY abs(s) DESC, h ASC) AS rk
  FROM cs
)
SELECT event_type, cp_hour, cusum_peak FROM pk WHERE rk = 1
ORDER BY event_type
"""



def q_fulfillment_peak_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line peak concurrency: how many line items were simultaneously
    open (ordered but not yet shipped) at the monthly peak, and the earliest
    date the peak was hit. The fact table collapses map-side to per-date
    deltas before the only ordered scan (dates-sized)."""
    from pyvectorsearch_spark.operators.timeseries import sweep_peak_concurrency

    li = spread(load_table(spark, sf_dir, "lineitem")).select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("e")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("s")
    )
    iv = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        F.col("s") < F.col("e")
    )
    out = sweep_peak_concurrency(iv, start_col="s", end_col="e")
    # dates stringified on both sides: DuckDB DATE surfaces as pandas
    # Timestamp, Spark's as datetime.date (the retention-cohort precedent)
    return out.select(
        F.date_format("bucket", "yyyy-MM-dd").alias("bucket"),
        "peak_concurrent",
        F.date_format("peak_date", "yyyy-MM-dd").alias("peak_date"),
    ).orderBy("bucket")


ORACLE_FULFILLMENT_PEAK = """
WITH iv AS (
  SELECT CAST(o.o_orderdate AS DATE) AS s, CAST(l.l_shipdate AS DATE) AS e
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE CAST(o.o_orderdate AS DATE) < CAST(l.l_shipdate AS DATE)
),
dl AS (
  SELECT d, sum(delta)::BIGINT AS net FROM (
    SELECT s AS d, 1 AS delta FROM iv
    UNION ALL SELECT e AS d, -1 AS delta FROM iv
  ) GROUP BY d
),
c AS (SELECT d, sum(net) OVER (ORDER BY d)::BIGINT AS open_now FROM dl),
b AS (SELECT date_trunc('month', d)::DATE AS bucket, d, open_now FROM c),
p AS (
  SELECT bucket, max(open_now)::BIGINT AS peak_concurrent FROM b GROUP BY bucket
)
SELECT CAST(b.bucket AS VARCHAR) AS bucket, p.peak_concurrent,
       CAST(min(b.d) AS VARCHAR) AS peak_date
FROM b JOIN p ON b.bucket = p.bucket AND b.open_now = p.peak_concurrent
GROUP BY b.bucket, p.peak_concurrent
ORDER BY b.bucket
"""


STL_W = 12  # centered trend window: +/- 12 hourly buckets


def q_events_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite seasonal decomposition on the hourly dense grid per event
    type: trend = centered rolling mean (exact integer window sums),
    seasonal = hour-of-day mean of the detrended series (rounded ladder),
    residual = the rest. Reports the 24-hour seasonal profile per type with
    within-hour residual mass — the classic trend/seasonal/residual split,
    engine-exact through the rounding ladder, composed from the existing
    resample + window machinery."""
    from pyspark.sql import Window

    from pyvectorsearch_spark.operators.timeseries import resample_counts

    ev = spread(load_table(spark, sf_dir, "events"))
    grid = resample_counts(ev, by="event_type", ts_col="ts", width_s=3600)
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_epoch")
        .rowsBetween(-STL_W, STL_W)
    )
    trend = F.round(F.sum("n").over(w) / F.count("n").over(w), 6)
    dt = grid.select(
        "event_type",
        "bucket_epoch",
        "n",
        F.round(F.col("n") - trend, 6).alias("_d"),
    )
    hod = F.expr("(bucket_epoch % 86400) div 3600").cast("int")
    byhod = dt.select("event_type", hod.alias("hod"), "_d")
    seas = byhod.groupBy("event_type", "hod").agg(
        F.count("*").cast("bigint").alias("n_cells"),
        F.round(F.round(F.sum("_d"), 6) / F.count("*"), 6).alias("seasonal_r"),
    )
    resid = (
        byhod.join(seas, ["event_type", "hod"])
        .select(
            "event_type",
            "hod",
            F.round(F.abs(F.round(F.col("_d") - F.col("seasonal_r"), 6)), 6).alias(
                "_ar"
            ),
        )
        .groupBy("event_type", "hod")
        .agg(F.round(F.sum("_ar"), 6).alias("sum_abs_resid_r"))
    )
    return (
        seas.join(resid, ["event_type", "hod"])
        .select("event_type", "hod", "n_cells", "seasonal_r", "sum_abs_resid_r")
        .orderBy("event_type", "hod")
    )


ORACLE_EVENTS_STL = f"""
WITH hist AS (
  SELECT event_type,
         (CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600) AS be,
         count(*)::BIGINT AS n
  FROM events GROUP BY event_type, be
),
grid AS (
  SELECT h.event_type, gs.be, coalesce(hist.n, 0)::BIGINT AS n
  FROM (
    SELECT event_type, unnest(range(mn, mx + 3600, 3600)) AS be
    FROM (SELECT event_type, min(be) AS mn, max(be) AS mx
          FROM hist GROUP BY event_type)
  ) gs(event_type, be)
  JOIN (SELECT DISTINCT event_type FROM hist) h ON h.event_type = gs.event_type
  LEFT JOIN hist ON hist.event_type = gs.event_type AND hist.be = gs.be
),
tr AS (
  SELECT event_type, be, n,
         round(sum(n) OVER w / CAST(count(n) OVER w AS DOUBLE), 6) AS trend
  FROM grid
  WINDOW w AS (PARTITION BY event_type ORDER BY be
               ROWS BETWEEN {STL_W} PRECEDING AND {STL_W} FOLLOWING)
),
dt AS (
  SELECT event_type, CAST((be % 86400) // 3600 AS INT) AS hod,
         round(n - trend, 6) AS d
  FROM tr
),
seas AS (
  SELECT event_type, hod, count(*)::BIGINT AS n_cells,
         round(round(sum(d), 6) / count(*), 6) AS seasonal_r
  FROM dt GROUP BY event_type, hod
),
resid AS (
  SELECT dt.event_type, dt.hod,
         round(sum(round(abs(round(dt.d - seas.seasonal_r, 6)), 6)), 6)
           AS sum_abs_resid_r
  FROM dt JOIN seas ON dt.event_type = seas.event_type AND dt.hod = seas.hod
  GROUP BY dt.event_type, dt.hod
)
SELECT seas.event_type, seas.hod, seas.n_cells, seas.seasonal_r,
       resid.sum_abs_resid_r
FROM seas JOIN resid ON seas.event_type = resid.event_type
                    AND seas.hod = resid.hod
ORDER BY seas.event_type, seas.hod
"""


BURST_FACTOR = 2.0  # bucket is bursting when count > factor x trailing mean
BURST_TRAIL = 24  # trailing-mean lookback (hourly buckets), current excluded


def q_events_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection (Kleinberg-lite threshold runs): hourly buckets whose
    count exceeds 2x the trailing-24h mean flag as bursting; consecutive
    flagged buckets fuse into burst intervals via the lag-gap sessionization
    trick on the flagged subset. Per burst: start/end epoch, length, peak
    count — all integer/rounded-exact. Shuffle shape: the dense grid is the
    input (one type-keyed exchange serves the trailing window, the flag lag,
    and the interval rollup)."""
    from pyspark.sql import Window

    from pyvectorsearch_spark.operators.timeseries import resample_counts

    ev = spread(load_table(spark, sf_dir, "events"))
    grid = resample_counts(ev, by="event_type", ts_col="ts", width_s=3600)
    wt = (
        Window.partitionBy("event_type")
        .orderBy("bucket_epoch")
        .rowsBetween(-BURST_TRAIL, -1)
    )
    trail = F.round(F.sum("n").over(wt) / F.count("n").over(wt), 6)
    # the first bucket of a series has no trailing history — it cannot be
    # judged (coalescing the NULL trail to 0 would flag EVERY series start
    # as a burst, since the grid begins at each group's first active hour)
    flagged = grid.select(
        "event_type",
        "bucket_epoch",
        "n",
        trail.alias("_trail"),
    ).filter(
        F.col("_trail").isNotNull()
        & (F.col("n").cast("double") > F.lit(BURST_FACTOR) * F.col("_trail"))
    )
    wl = Window.partitionBy("event_type").orderBy("bucket_epoch")
    runs = flagged.withColumn(
        "_new",
        (
            F.coalesce(
                F.col("bucket_epoch") - F.lag("bucket_epoch").over(wl),
                F.lit(999999),
            )
            > 3600
        ).cast("int"),
    ).withColumn(
        "_run",
        F.sum("_new").over(
            wl.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        runs.groupBy("event_type", "_run")
        .agg(
            F.min("bucket_epoch").alias("start_epoch"),
            F.max("bucket_epoch").alias("end_epoch"),
            F.count("*").cast("bigint").alias("n_buckets"),
            F.max("n").cast("bigint").alias("peak_n"),
        )
        .select("event_type", "start_epoch", "end_epoch", "n_buckets", "peak_n")
        .orderBy("event_type", "start_epoch")
    )


ORACLE_EVENTS_BURSTS = f"""
WITH hist AS (
  SELECT event_type,
         (CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600) AS be,
         count(*)::BIGINT AS n
  FROM events GROUP BY event_type, be
),
grid AS (
  SELECT h.event_type, gs.be, coalesce(hist.n, 0)::BIGINT AS n
  FROM (
    SELECT event_type, unnest(range(mn, mx + 3600, 3600)) AS be
    FROM (SELECT event_type, min(be) AS mn, max(be) AS mx
          FROM hist GROUP BY event_type)
  ) gs(event_type, be)
  JOIN (SELECT DISTINCT event_type FROM hist) h ON h.event_type = gs.event_type
  LEFT JOIN hist ON hist.event_type = gs.event_type AND hist.be = gs.be
),
tr AS (
  SELECT event_type, be, n,
         round(sum(n) OVER w / CAST(count(n) OVER w AS DOUBLE), 6) AS trail
  FROM grid
  WINDOW w AS (PARTITION BY event_type ORDER BY be
               ROWS BETWEEN {BURST_TRAIL} PRECEDING AND 1 PRECEDING)
),
hot AS (
  SELECT event_type, be, n FROM tr
  WHERE trail IS NOT NULL
    AND CAST(n AS DOUBLE) > {BURST_FACTOR!r} * trail
),
marks AS (
  SELECT event_type, be, n,
         CASE WHEN coalesce(be - lag(be) OVER (PARTITION BY event_type
                                               ORDER BY be), 999999) > 3600
              THEN 1 ELSE 0 END AS newrun
  FROM hot
),
runs AS (
  SELECT event_type, be, n,
         sum(newrun) OVER (PARTITION BY event_type ORDER BY be) AS run
  FROM marks
)
SELECT event_type, min(be) AS start_epoch, max(be) AS end_epoch,
       count(*)::BIGINT AS n_buckets, max(n)::BIGINT AS peak_n
FROM runs GROUP BY event_type, run
ORDER BY event_type, start_epoch
"""


FC_SEASON = 24  # seasonal-naive lag: one day of hourly buckets


def q_events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin forecast backtest on the dense hourly grid: the
    seasonal-naive forecast (count 24 h earlier) vs the naive one (previous
    hour) scored per type with MAE and bias over every bucket that has both
    references — the forecasting EVAL harness, entirely in exact integer
    arithmetic (counts are ints, errors are int differences; only the final
    mean divides). The model that wins here sets the baseline any fancier
    forecaster must beat. One type-keyed exchange serves both lags and the
    rollup."""
    from pyspark.sql import Window

    from pyvectorsearch_spark.operators.timeseries import resample_counts

    ev = spread(load_table(spark, sf_dir, "events"))
    grid = resample_counts(ev, by="event_type", ts_col="ts", width_s=3600)
    w = Window.partitionBy("event_type").orderBy("bucket_epoch")
    lagged = grid.select(
        "event_type",
        "n",
        F.lag("n", 1).over(w).alias("_naive"),
        F.lag("n", FC_SEASON).over(w).alias("_snaive"),
    ).filter(F.col("_naive").isNotNull() & F.col("_snaive").isNotNull())
    return (
        lagged.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_buckets"),
            F.sum(F.abs(F.col("n") - F.col("_naive")))
            .cast("bigint")
            .alias("_ae_n"),
            F.sum(F.abs(F.col("n") - F.col("_snaive")))
            .cast("bigint")
            .alias("_ae_s"),
            F.sum(F.col("n") - F.col("_snaive")).cast("bigint").alias("_bias_s"),
        )
        .select(
            "event_type",
            "n_buckets",
            F.round(F.col("_ae_n") / F.col("n_buckets"), 6).alias("mae_naive_r"),
            F.round(F.col("_ae_s") / F.col("n_buckets"), 6).alias(
                "mae_seasonal_r"
            ),
            F.round(F.col("_bias_s") / F.col("n_buckets"), 6).alias(
                "bias_seasonal_r"
            ),
            (F.col("_ae_s") < F.col("_ae_n")).alias("seasonal_wins"),
        )
        .orderBy("event_type")
    )


ORACLE_FORECAST_BACKTEST = f"""
WITH hist AS (
  SELECT event_type,
         (CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600) AS be,
         count(*)::BIGINT AS n
  FROM events GROUP BY event_type, be
),
grid AS (
  SELECT h.event_type, gs.be, coalesce(hist.n, 0)::BIGINT AS n
  FROM (
    SELECT event_type, unnest(range(mn, mx + 3600, 3600)) AS be
    FROM (SELECT event_type, min(be) AS mn, max(be) AS mx
          FROM hist GROUP BY event_type)
  ) gs(event_type, be)
  JOIN (SELECT DISTINCT event_type FROM hist) h ON h.event_type = gs.event_type
  LEFT JOIN hist ON hist.event_type = gs.event_type AND hist.be = gs.be
),
lagd AS (
  SELECT event_type, n,
         lag(n, 1) OVER w AS naive, lag(n, {FC_SEASON}) OVER w AS snaive
  FROM grid WINDOW w AS (PARTITION BY event_type ORDER BY be)
),
ok AS (SELECT * FROM lagd WHERE naive IS NOT NULL AND snaive IS NOT NULL)
SELECT event_type, count(*)::BIGINT AS n_buckets,
       round(sum(abs(n - naive)) / CAST(count(*) AS DOUBLE), 6) AS mae_naive_r,
       round(sum(abs(n - snaive)) / CAST(count(*) AS DOUBLE), 6)
         AS mae_seasonal_r,
       round(sum(n - snaive) / CAST(count(*) AS DOUBLE), 6) AS bias_seasonal_r,
       (sum(abs(n - snaive)) < sum(abs(n - naive))) AS seasonal_wins
FROM ok GROUP BY event_type ORDER BY event_type
"""

QUERIES = {
    "events_trend": q_events_trend,
    "events_changepoint": q_events_changepoint,
    "events_rolling_distinct_kmv": q_events_rolling_distinct_kmv,
    "events_seasonal_hourly": q_events_seasonal_hourly,
    "events_rolling_distinct": q_events_rolling_distinct,
    "events_resample_15m": q_events_resample_15m,
    "events_interpolate": q_events_interpolate,
    "events_rolling": q_events_rolling,
    "events_anomalies": q_events_anomalies,
    "events_hopping": q_events_hopping,
    "events_ewma": q_events_ewma,
    "fulfillment_peak_monthly": q_fulfillment_peak_monthly,
    "events_stl_decompose": q_events_stl_decompose,
    "events_bursts": q_events_bursts,
    "events_forecast_backtest": q_events_forecast_backtest,
}
ORACLES = {
    "events_trend": ORACLE_EVENTS_TREND,
    "events_changepoint": ORACLE_EVENTS_CHANGEPOINT,
    "events_rolling_distinct_kmv": ORACLE_ROLLING_KMV,
    "events_seasonal_hourly": ORACLE_SEASONAL_HOURLY,
    "events_rolling_distinct": ORACLE_ROLLING_DISTINCT,
    "events_resample_15m": ORACLE_RESAMPLE,
    "events_interpolate": ORACLE_INTERPOLATE,
    "events_rolling": ORACLE_ROLLING,
    "events_anomalies": ORACLE_ANOMALIES,
    "events_hopping": ORACLE_HOPPING,
    "events_ewma": ORACLE_EVENTS_EWMA,
    "fulfillment_peak_monthly": ORACLE_FULFILLMENT_PEAK,
    "events_stl_decompose": ORACLE_EVENTS_STL,
    "events_bursts": ORACLE_EVENTS_BURSTS,
    "events_forecast_backtest": ORACLE_FORECAST_BACKTEST,
}


# --- autocorrelation function (ACF) -----------------------------------------

ACF_MAX_LAG = 6


def q_events_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of hourly event volume at lags 1..6 per event type —
    the seasonality/persistence diagnostic that tells a forecaster which
    lags carry signal (the companion to `events_trend`'s level fit and
    `events_stl_decompose`'s fixed 24 h seasonal: ACF *finds* the period).

    Determinism ladder (the `events_trend` pattern on lag pairs): lag pairs
    come from an equi-join of the DENSE hour grid against itself shifted by
    the lag (gap hours count as 0 — a silent outage decorrelates), Pearson
    moments (n, Σx, Σy, Σxy, Σx², Σy²) are exact bigints, and division /
    sqrt / rounding happen once at the end, so r_k is engine-identical.

    Scale: one map-side hourly rollup shrinks the fact table to types×hours
    rows; the lag fan-out (6×) and self-join run on that tiny grid, never
    on raw events. The join key (event_type, h) is the grid's natural
    partitioning — one shuffle of the grid, reused across all lags."""
    ev = load_table(spark, sf_dir, "events")
    hb = (F.floor(F.unix_timestamp("ts") / 3600)).cast("bigint")
    hc = ev.groupBy("event_type", hb.alias("h")).agg(
        F.count("*").cast("bigint").alias("y")
    )
    grid = hc.groupBy("event_type").agg(
        F.min("h").alias("_lo"), F.max("h").alias("_hi")
    )
    dense = grid.select(
        "event_type", F.explode(F.sequence("_lo", "_hi")).alias("h")
    )
    dn = dense.join(hc, ["event_type", "h"], "left").withColumn(
        "y", F.coalesce("y", F.lit(0)).cast("bigint")
    )
    lags = spark.range(1, ACF_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    shifted = dn.crossJoin(F.broadcast(lags)).select(
        "event_type", "lag", (F.col("h") + F.col("lag")).alias("h"),
        F.col("y").alias("x"),
    )
    pairs = shifted.join(dn, ["event_type", "h"]).select(
        "event_type", "lag", "x", "y"
    )
    m = pairs.groupBy("event_type", "lag").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    # variance factors in DECIMAL(38,0): micro-unit moment products
    # pass 2^63 at realistic hourly magnitudes (the Spearman
    # overflow lesson) -- bigint would wrap silently with ANSI off
    dd = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    den2 = (
        (dd(m["n"]) * dd(m["sxx"]) - dd(m["sx"]) * dd(m["sx"]))
        * (dd(m["n"]) * dd(m["syy"]) - dd(m["sy"]) * dd(m["sy"]))
    )
    r = F.when(
        den2 > 0,
        F.round(
            (dd(m["n"]) * dd(m["sxy"])
             - dd(m["sx"]) * dd(m["sy"])).cast("double")
            / F.sqrt(den2.cast("double")),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return (
        m.select("event_type", "lag", "n", r.alias("acf_r"))
        .orderBy("event_type", "lag")
    )


ORACLE_EVENTS_ACF = f"""
WITH hc AS (
  SELECT event_type, floor(epoch(ts) / 3600)::BIGINT AS h, count(*)::BIGINT AS y
  FROM events GROUP BY 1, 2
),
grid AS (
  SELECT event_type, unnest(range(min(h), max(h) + 1)) AS h
  FROM hc GROUP BY event_type
),
dn AS (
  SELECT g.event_type, g.h, coalesce(hc.y, 0)::BIGINT AS y
  FROM grid g LEFT JOIN hc ON g.event_type = hc.event_type AND g.h = hc.h
),
lags AS (SELECT unnest(range(1, {ACF_MAX_LAG + 1}))::INT AS lag),
pairs AS (
  SELECT a.event_type, l.lag, a.y AS x, b.y AS y
  FROM dn a CROSS JOIN lags l
  JOIN dn b ON b.event_type = a.event_type AND b.h = a.h + l.lag
),
m AS (
  SELECT event_type, lag, count(*)::BIGINT AS n,
         sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
         sum(x * y)::BIGINT AS sxy,
         sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy
  FROM pairs GROUP BY event_type, lag
)
SELECT event_type, lag, n,
       CASE WHEN (n::HUGEINT * sxx - sx::HUGEINT * sx) * (n::HUGEINT * syy - sy::HUGEINT * sy) > 0
            THEN round(CAST(n::HUGEINT * sxy - sx::HUGEINT * sy AS DOUBLE)
                       / sqrt(CAST((n::HUGEINT * sxx - sx::HUGEINT * sx)
                                   * (n::HUGEINT * syy - sy::HUGEINT * sy) AS DOUBLE)), 6)
            ELSE 0.0 END AS acf_r
FROM m ORDER BY event_type, lag
"""

QUERIES.update({"events_acf": q_events_acf})
ORACLES.update({"events_acf": ORACLE_EVENTS_ACF})


# --- Haar wavelet energy decomposition ---------------------------------------

HAAR_LEVELS = 4


def q_events_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haar wavelet energy spectrum of hourly volume per event type: detail
    energy at scales 2h/4h/8h/16h — which time scale carries the variance?
    (spiky traffic → energy at fine scales; slow regime shifts → coarse;
    the multi-resolution companion to `events_acf`'s single-lag view and
    `events_stl_decompose`'s fixed daily season).

    Determinism: a level-k detail coefficient is the SIGNED integer sum
    Σ y·(1 − 2·parity(h >> (k−1))) over each 2^k-hour block of the dense
    grid (missing hours contribute 0 by construction), energy is the exact
    bigint Σd²; only the display share divides.

    Scale: one hourly rollup of the fact table; the level fan-out is a
    4-row broadcast against the types×hours grid; each level is one
    map-side-combinable aggregate on (type, level, block)."""
    ev = load_table(spark, sf_dir, "events")
    hb = (F.floor(F.unix_timestamp("ts") / 3600)).cast("bigint")
    hc = ev.groupBy("event_type", hb.alias("h")).agg(
        F.count("*").cast("bigint").alias("y")
    )
    base = hc.groupBy("event_type").agg(
        F.min("h").alias("_lo"), F.max("h").alias("_hi")
    )
    dense = base.select(
        "event_type",
        "_lo",
        F.explode(F.sequence("_lo", "_hi")).alias("h"),
    )
    rel = (
        dense.join(hc, ["event_type", "h"], "left")
        .select(
            "event_type",
            (F.col("h") - F.col("_lo")).alias("hr"),
            F.coalesce("y", F.lit(0)).cast("bigint").alias("y"),
        )
    )
    levels = spark.range(1, HAAR_LEVELS + 1).select(
        F.col("id").cast("int").alias("level")
    )
    fan = rel.crossJoin(F.broadcast(levels))
    sign = 1 - 2 * (
        F.expr("shiftrightunsigned(hr, level - 1)").bitwiseAND(F.lit(1))
    )
    det = fan.groupBy(
        "event_type",
        "level",
        F.expr("shiftrightunsigned(hr, level)").alias("_blk"),
    ).agg(F.sum(F.col("y") * sign).cast("bigint").alias("_d"))
    en = det.groupBy("event_type", "level").agg(
        F.count("*").cast("bigint").alias("n_blocks"),
        F.sum(F.col("_d") * F.col("_d")).cast("bigint").alias("energy"),
    )
    tot = en.groupBy("event_type").agg(
        F.sum("energy").cast("bigint").alias("_tot")
    )
    return (
        en.join(tot, "event_type")
        .select(
            "event_type",
            "level",
            "n_blocks",
            "energy",
            F.when(
                F.col("_tot") > 0,
                F.round(F.col("energy") / F.col("_tot").cast("double"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("energy_share_r"),
        )
        .orderBy("event_type", "level")
    )


ORACLE_EVENTS_HAAR = f"""
WITH hc AS (
  SELECT event_type, floor(epoch(ts) / 3600)::BIGINT AS h, count(*)::BIGINT AS y
  FROM events GROUP BY 1, 2
),
grid AS (
  SELECT event_type, min(h) AS lo, unnest(range(min(h), max(h) + 1)) AS h
  FROM hc GROUP BY event_type
),
rel AS (
  SELECT g.event_type, g.h - g.lo AS hr, coalesce(hc.y, 0)::BIGINT AS y
  FROM grid g LEFT JOIN hc ON g.event_type = hc.event_type AND g.h = hc.h
),
lv AS (SELECT unnest(range(1, {HAAR_LEVELS + 1}))::INT AS level),
det AS (
  SELECT event_type, level, hr >> level AS blk,
         sum(y * (1 - 2 * ((hr >> (level - 1)) & 1)))::BIGINT AS d
  FROM rel CROSS JOIN lv
  GROUP BY event_type, level, blk
),
en AS (
  SELECT event_type, level, count(*)::BIGINT AS n_blocks,
         sum(d * d)::BIGINT AS energy
  FROM det GROUP BY event_type, level
),
tot AS (SELECT event_type, sum(energy)::BIGINT AS tot FROM en GROUP BY event_type)
SELECT en.event_type, en.level, en.n_blocks, en.energy,
       CASE WHEN tot.tot > 0
            THEN round(en.energy / CAST(tot.tot AS DOUBLE), 6)
            ELSE 0.0 END AS energy_share_r
FROM en JOIN tot ON en.event_type = tot.event_type
ORDER BY en.event_type, en.level
"""

QUERIES.update({"events_haar_energy": q_events_haar_energy})
ORACLES.update({"events_haar_energy": ORACLE_EVENTS_HAAR})


# --- cross-type volume correlation matrix ------------------------------------


def q_events_type_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between every PAIR of event types' hourly volume
    on the shared global dense grid — do purchases co-move with clicks, or
    does an error spike suppress everything else? (`events_mi` bins one
    type's values; this correlates volumes ACROSS types.) The upper
    triangle (type_a < type_b) of the type×type matrix.

    Determinism: counts on the GLOBAL hour range (so every pair aligns on
    the identical grid, zeros filled) and exact bigint Pearson moments;
    one rounded division per pair.

    Scale: the fact table collapses to types×hours once; the pair fan-out
    is a self-join of that tiny grid on the hour key; moments collapse
    map-side to types² rows."""
    ev = load_table(spark, sf_dir, "events")
    hb = (F.floor(F.unix_timestamp("ts") / 3600)).cast("bigint")
    hc = ev.groupBy("event_type", hb.alias("h")).agg(
        F.count("*").cast("bigint").alias("y")
    )
    rng = hc.agg(F.min("h").alias("_lo"), F.max("h").alias("_hi"))
    hours = rng.select(F.explode(F.sequence("_lo", "_hi")).alias("h"))
    types = hc.select("event_type").distinct()
    dense = (
        hours.crossJoin(F.broadcast(types))
        .join(hc, ["event_type", "h"], "left")
        .select(
            "event_type",
            "h",
            F.coalesce("y", F.lit(0)).cast("bigint").alias("y"),
        )
    )
    a = dense.select(
        F.col("event_type").alias("type_a"), "h", F.col("y").alias("x")
    )
    b = dense.select(
        F.col("event_type").alias("type_b"), "h", F.col("y").alias("y")
    )
    pairs = a.join(b, "h").filter(F.col("type_a") < F.col("type_b"))
    m = pairs.groupBy("type_a", "type_b").agg(
        F.count("*").cast("bigint").alias("n_hours"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    # variance factors in DECIMAL(38,0): micro-unit moment products
    # pass 2^63 at realistic hourly magnitudes (the Spearman
    # overflow lesson) -- bigint would wrap silently with ANSI off
    dd = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    den2 = (
        (dd(m["n_hours"]) * dd(m["sxx"]) - dd(m["sx"]) * dd(m["sx"]))
        * (dd(m["n_hours"]) * dd(m["syy"]) - dd(m["sy"]) * dd(m["sy"]))
    )
    r = F.when(
        den2 > 0,
        F.round(
            (dd(m["n_hours"]) * dd(m["sxy"])
             - dd(m["sx"]) * dd(m["sy"])).cast("double")
            / F.sqrt(den2.cast("double")),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return m.select("type_a", "type_b", "n_hours", r.alias("corr_r")).orderBy(
        "type_a", "type_b"
    )


ORACLE_EVENTS_TYPE_CORR = """
WITH hc AS (
  SELECT event_type, floor(epoch(ts) / 3600)::BIGINT AS h, count(*)::BIGINT AS y
  FROM events GROUP BY 1, 2
),
rng AS (SELECT min(h) AS lo, max(h) AS hi FROM hc),
hours AS (SELECT unnest(range(lo, hi + 1)) AS h FROM rng),
types AS (SELECT DISTINCT event_type FROM hc),
dense AS (
  SELECT t.event_type, hr.h, coalesce(hc.y, 0)::BIGINT AS y
  FROM hours hr CROSS JOIN types t
  LEFT JOIN hc ON hc.event_type = t.event_type AND hc.h = hr.h
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, a.y AS x, b.y AS y
  FROM dense a JOIN dense b ON a.h = b.h AND a.event_type < b.event_type
),
m AS (
  SELECT type_a, type_b, count(*)::BIGINT AS n_hours,
         sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
         sum(x * y)::BIGINT AS sxy,
         sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy
  FROM pairs GROUP BY type_a, type_b
)
SELECT type_a, type_b, n_hours,
       CASE WHEN (n_hours::HUGEINT * sxx - sx::HUGEINT * sx) * (n_hours::HUGEINT * syy - sy::HUGEINT * sy) > 0
            THEN round(CAST(n_hours::HUGEINT * sxy - sx::HUGEINT * sy AS DOUBLE)
                       / sqrt(CAST((n_hours::HUGEINT * sxx - sx::HUGEINT * sx)
                                   * (n_hours::HUGEINT * syy - sy::HUGEINT * sy) AS DOUBLE)), 6)
            ELSE 0.0 END AS corr_r
FROM m ORDER BY type_a, type_b
"""

QUERIES.update({"events_type_correlation": q_events_type_correlation})
ORACLES.update({"events_type_correlation": ORACLE_EVENTS_TYPE_CORR})


# --- inter-event burstiness ----------------------------------------------------


def q_events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goh–Barabási burstiness B = (σ−μ)/(σ+μ) of inter-event gaps per
    event type (gaps between a user's consecutive events of that type,
    pooled across users): B→−1 is a metronome, B≈0 Poisson, B→+1 bursty.
    Tells the capacity planner whether `events_bursts`' episodes are
    anomalies or the steady state of a heavy-tailed arrival process.

    Determinism: gaps are integer seconds from a per-(user,type) ordered
    window; μ/σ come from exact bigint moment sums (n, Σg, Σg² — σ² =
    (n·Σg² − (Σg)²)/n² stays integer-exact in DECIMAL/HUGEINT through the
    products); one final sqrt + division rounds for display.

    Scale: the window partitions by (user, type) — bounded per-user state,
    one shuffle of the fact table; moments collapse map-side to one row
    per type."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        F.unix_timestamp("ts").cast("bigint").alias("_s"),
        "event_id",
    )
    w = Window.partitionBy("event_type", "user_id").orderBy("_s", "event_id")
    gaps = (
        ev.withColumn("_prev", F.lag("_s", 1).over(w))
        .filter(F.col("_prev").isNotNull())
        .select("event_type", (F.col("_s") - F.col("_prev")).alias("_g"))
    )
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = gaps.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_gaps"),
        F.sum("_g").cast("bigint").alias("_sg"),
        F.sum(d(F.col("_g")) * d(F.col("_g"))).alias("_sg2"),
    )
    var_num = d(m["n_gaps"]) * m["_sg2"] - d(m["_sg"]) * d(m["_sg"])
    mu = m["_sg"].cast("double") / m["n_gaps"].cast("double")
    sigma = F.sqrt(var_num.cast("double")) / m["n_gaps"].cast("double")
    return (
        m.select(
            "event_type",
            "n_gaps",
            F.round(mu / 3600.0, 4).alias("mean_gap_hours_r"),
            F.round(
                F.when(sigma + mu > 0, (sigma - mu) / (sigma + mu)).otherwise(
                    F.lit(0.0)
                ),
                6,
            ).alias("burstiness_r"),
        )
        .orderBy("event_type")
    )


ORACLE_EVENTS_BURSTINESS = """
WITH ev AS (
  SELECT event_type, user_id, epoch(ts)::BIGINT AS s, event_id FROM events
),
gaps AS (
  SELECT event_type,
         s - lag(s) OVER (PARTITION BY event_type, user_id
                          ORDER BY s, event_id) AS g
  FROM ev
),
m AS (
  SELECT event_type, count(*)::BIGINT AS n_gaps,
         sum(g)::BIGINT AS sg, sum(g::HUGEINT * g::HUGEINT) AS sg2
  FROM gaps WHERE g IS NOT NULL GROUP BY event_type
)
SELECT event_type, n_gaps,
       round((sg / CAST(n_gaps AS DOUBLE)) / 3600.0, 4) AS mean_gap_hours_r,
       round(CASE WHEN sqrt(CAST(n_gaps::HUGEINT * sg2
                                 - sg::HUGEINT * sg::HUGEINT AS DOUBLE))
                       / n_gaps
                       + sg / CAST(n_gaps AS DOUBLE) > 0
             THEN (sqrt(CAST(n_gaps::HUGEINT * sg2
                             - sg::HUGEINT * sg::HUGEINT AS DOUBLE)) / n_gaps
                   - sg / CAST(n_gaps AS DOUBLE))
                  / (sqrt(CAST(n_gaps::HUGEINT * sg2
                               - sg::HUGEINT * sg::HUGEINT AS DOUBLE)) / n_gaps
                     + sg / CAST(n_gaps AS DOUBLE))
             ELSE 0.0 END, 6) AS burstiness_r
FROM m ORDER BY event_type
"""

QUERIES.update({"events_burstiness": q_events_burstiness})
ORACLES.update({"events_burstiness": ORACLE_EVENTS_BURSTINESS})


# --- Mann–Kendall trend test --------------------------------------------------

MK_Z_CRIT = 1.959964


def q_events_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall monotonic-trend test on DAILY volume per event type:
    S = Σ_{i<j} sign(y_j − y_i) over the dense day grid, tie-corrected
    variance, and the Z statistic with a ±1.96 verdict — the rank-based,
    distribution-free complement to `events_trend`'s OLS slope (OLS finds
    a line; MK certifies monotonicity without assuming one).

    Determinism: S, the tie groups, and the variance numerator are ALL
    exact bigint counts; Z divides once at the end. Sign pairs come from
    a self-join with i<j on the day index.

    Scale: the pair table is quadratic in DAYS, not rows — bounded by the
    calendar (10 years ≈ 3,650 days ⇒ ~6.7M pairs per type), so the
    quadratic join is safe at any corpus size; the fact table itself
    collapses to types×days map-side first."""
    ev = load_table(spark, sf_dir, "events")
    db = F.to_date("ts").alias("d")
    dc = ev.groupBy("event_type", db).agg(
        F.count("*").cast("bigint").alias("y")
    )
    rng = dc.groupBy("event_type").agg(
        F.min("d").alias("_lo"), F.max("d").alias("_hi")
    )
    dense = rng.select(
        "event_type",
        F.explode(F.sequence("_lo", "_hi")).alias("d"),
    )
    dn = dense.join(dc, ["event_type", "d"], "left").select(
        "event_type",
        F.datediff(F.col("d"), F.lit("1970-01-01")).cast("bigint").alias("i"),
        F.coalesce("y", F.lit(0)).cast("bigint").alias("y"),
    )
    a = dn.select("event_type", F.col("i").alias("_i"), F.col("y").alias("_yi"))
    b = dn.select("event_type", F.col("i").alias("_j"), F.col("y").alias("_yj"))
    s = (
        a.join(b, "event_type")
        .filter(F.col("_i") < F.col("_j"))
        .groupBy("event_type")
        .agg(
            F.sum(F.signum(F.col("_yj") - F.col("_yi")).cast("bigint"))
            .cast("bigint")
            .alias("s_stat")
        )
    )
    n = dn.groupBy("event_type").agg(F.count("*").cast("bigint").alias("n_days"))
    ties = (
        dn.groupBy("event_type", "y")
        .agg(F.count("*").cast("bigint").alias("_t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("_t") * (F.col("_t") - 1) * (2 * F.col("_t") + 5)
            )
            .cast("bigint")
            .alias("_tie")
        )
    )
    m = s.join(n, "event_type").join(ties, "event_type")
    var18 = (
        m["n_days"] * (m["n_days"] - 1) * (2 * m["n_days"] + 5) - m["_tie"]
    )
    z = F.when(
        m["s_stat"] > 0,
        (m["s_stat"] - 1) / F.sqrt(var18.cast("double") / 18.0),
    ).when(
        m["s_stat"] < 0,
        (m["s_stat"] + 1) / F.sqrt(var18.cast("double") / 18.0),
    ).otherwise(F.lit(0.0))
    return (
        m.withColumn("z_r", F.round(z, 6))
        .select(
            "event_type",
            "n_days",
            "s_stat",
            "z_r",
            F.when(F.col("z_r") > MK_Z_CRIT, "increasing")
            .when(F.col("z_r") < -MK_Z_CRIT, "decreasing")
            .otherwise("no_trend")
            .alias("trend"),
        )
        .orderBy("event_type")
    )


ORACLE_EVENTS_MANN_KENDALL = f"""
WITH dc AS (
  SELECT event_type, CAST(ts AS DATE) AS d, count(*)::BIGINT AS y
  FROM events GROUP BY 1, 2
),
grid AS (
  SELECT event_type,
         unnest(generate_series(min(d), max(d), INTERVAL 1 DAY)) AS d
  FROM dc GROUP BY event_type
),
dn AS (
  SELECT g.event_type,
         date_diff('day', DATE '1970-01-01', CAST(g.d AS DATE))::BIGINT AS i,
         coalesce(dc.y, 0)::BIGINT AS y
  FROM grid g LEFT JOIN dc ON g.event_type = dc.event_type
                           AND CAST(g.d AS DATE) = dc.d
),
s AS (
  SELECT a.event_type,
         sum(CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1
                  ELSE 0 END)::BIGINT AS s_stat
  FROM dn a JOIN dn b ON a.event_type = b.event_type AND a.i < b.i
  GROUP BY a.event_type
),
n AS (SELECT event_type, count(*)::BIGINT AS n_days FROM dn GROUP BY event_type),
ties AS (
  SELECT event_type,
         sum(t * (t - 1) * (2 * t + 5))::BIGINT AS tie
  FROM (SELECT event_type, y, count(*)::BIGINT AS t
        FROM dn GROUP BY event_type, y)
  GROUP BY event_type
),
m AS (
  SELECT s.event_type, s.s_stat, n.n_days,
         n.n_days * (n.n_days - 1) * (2 * n.n_days + 5) - ties.tie AS var18
  FROM s JOIN n ON s.event_type = n.event_type
  JOIN ties ON s.event_type = ties.event_type
),
zc AS (
  SELECT event_type, n_days, s_stat,
         round(CASE WHEN s_stat > 0
                    THEN (s_stat - 1) / sqrt(var18 / 18.0)
                    WHEN s_stat < 0
                    THEN (s_stat + 1) / sqrt(var18 / 18.0)
                    ELSE 0.0 END, 6) AS z_r
  FROM m
)
SELECT event_type, n_days, s_stat, z_r,
       CASE WHEN z_r > {MK_Z_CRIT} THEN 'increasing'
            WHEN z_r < -{MK_Z_CRIT} THEN 'decreasing'
            ELSE 'no_trend' END AS trend
FROM zc ORDER BY event_type
"""

QUERIES.update({"events_mann_kendall": q_events_mann_kendall})
ORACLES.update({"events_mann_kendall": ORACLE_EVENTS_MANN_KENDALL})


# --- lead-lag cross-correlation (CCF) -----------------------------------------

CCF_MAX_LAG = 3


def q_events_ccf_leadlag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead–lag cross-correlation between event-type pairs: corr(A at t,
    B at t+lag) for lags −3..+3 hours on the shared dense grid, reporting
    each pair's best lag (max |r|, ties → smallest lag) — does one signal
    LEAD the other? (`events_type_correlation` is this at lag 0; the lag
    argmax is what turns co-movement into an ordering hint.)

    Determinism: the `events_acf` bigint-moment ladder per (pair, lag);
    the argmax compares micro-fixed |r| integers with a deterministic
    tie-break.

    Scale: all fan-outs (7 lags × type pairs) run on the types×hours grid;
    the fact table is touched once."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    hb = (F.floor(F.unix_timestamp("ts") / 3600)).cast("bigint")
    hc = ev.groupBy("event_type", hb.alias("h")).agg(
        F.count("*").cast("bigint").alias("y")
    )
    rng = hc.agg(F.min("h").alias("_lo"), F.max("h").alias("_hi"))
    hours = rng.select(F.explode(F.sequence("_lo", "_hi")).alias("h"))
    types = hc.select("event_type").distinct()
    dense = (
        hours.crossJoin(F.broadcast(types))
        .join(hc, ["event_type", "h"], "left")
        .select(
            "event_type", "h",
            F.coalesce("y", F.lit(0)).cast("bigint").alias("y"),
        )
    )
    lags = spark.range(-CCF_MAX_LAG, CCF_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = dense.crossJoin(F.broadcast(lags)).select(
        F.col("event_type").alias("type_a"),
        "lag",
        (F.col("h") + F.col("lag")).alias("h"),
        F.col("y").alias("x"),
    )
    b = dense.select(
        F.col("event_type").alias("type_b"), "h", F.col("y").alias("y")
    )
    pairs = a.join(b, "h").filter(F.col("type_a") < F.col("type_b"))
    m = pairs.groupBy("type_a", "type_b", "lag").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    # variance factors in DECIMAL(38,0): micro-unit moment products
    # pass 2^63 at realistic hourly magnitudes (the Spearman
    # overflow lesson) -- bigint would wrap silently with ANSI off
    dd = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    den2 = (
        (dd(m["n"]) * dd(m["sxx"]) - dd(m["sx"]) * dd(m["sx"]))
        * (dd(m["n"]) * dd(m["syy"]) - dd(m["sy"]) * dd(m["sy"]))
    )
    r = F.when(
        den2 > 0,
        F.round(
            (dd(m["n"]) * dd(m["sxy"])
             - dd(m["sx"]) * dd(m["sy"])).cast("double")
            / F.sqrt(den2.cast("double")),
            6,
        ),
    ).otherwise(F.lit(0.0))
    scored = m.select(
        "type_a", "type_b", "lag", r.alias("r"),
        F.round(F.abs(r) * 1000000).cast("bigint").alias("_au"),
    )
    w = Window.partitionBy("type_a", "type_b").orderBy(
        F.desc("_au"), F.asc("lag")
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(
            "type_a",
            "type_b",
            F.col("lag").alias("best_lag"),
            F.col("r").alias("best_corr_r"),
        )
        .orderBy("type_a", "type_b")
    )


ORACLE_EVENTS_CCF = f"""
WITH hc AS (
  SELECT event_type, floor(epoch(ts) / 3600)::BIGINT AS h, count(*)::BIGINT AS y
  FROM events GROUP BY 1, 2
),
rng AS (SELECT min(h) AS lo, max(h) AS hi FROM hc),
hours AS (SELECT unnest(range(lo, hi + 1)) AS h FROM rng),
types AS (SELECT DISTINCT event_type FROM hc),
dense AS (
  SELECT t.event_type, hr.h, coalesce(hc.y, 0)::BIGINT AS y
  FROM hours hr CROSS JOIN types t
  LEFT JOIN hc ON hc.event_type = t.event_type AND hc.h = hr.h
),
lags AS (SELECT unnest(range(-{CCF_MAX_LAG}, {CCF_MAX_LAG + 1}))::INT AS lag),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, l.lag,
         a.y AS x, b.y AS y
  FROM dense a CROSS JOIN lags l
  JOIN dense b ON b.h = a.h + l.lag AND a.event_type < b.event_type
),
m AS (
  SELECT type_a, type_b, lag, count(*)::BIGINT AS n,
         sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
         sum(x * y)::BIGINT AS sxy,
         sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy
  FROM pairs GROUP BY 1, 2, 3
),
sc AS (
  SELECT type_a, type_b, lag,
         CASE WHEN (n::HUGEINT * sxx - sx::HUGEINT * sx) * (n::HUGEINT * syy - sy::HUGEINT * sy) > 0
              THEN round(CAST(n::HUGEINT * sxy - sx::HUGEINT * sy AS DOUBLE)
                         / sqrt(CAST((n::HUGEINT * sxx - sx::HUGEINT * sx)
                                     * (n::HUGEINT * syy - sy::HUGEINT * sy) AS DOUBLE)), 6)
              ELSE 0.0 END AS r
  FROM m
),
rk AS (
  SELECT *, row_number() OVER (
    PARTITION BY type_a, type_b
    ORDER BY CAST(round(abs(r) * 1000000) AS BIGINT) DESC, lag ASC) AS rn
  FROM sc
)
SELECT type_a, type_b, lag AS best_lag, r AS best_corr_r
FROM rk WHERE rn = 1 ORDER BY type_a, type_b
"""

QUERIES.update({"events_ccf_leadlag": q_events_ccf_leadlag})
ORACLES.update({"events_ccf_leadlag": ORACLE_EVENTS_CCF})


# --- fixed-frequency periodogram -----------------------------------------------------

PERIODOGRAM_PERIODS = [24, 12, 168]


def q_events_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-Fourier power at the candidate periods (24 h, 12 h, one
    week) per event type — the frequency-domain member of the spectral
    family: ACF sees lags, Haar sees dyadic scales, STL assumes 24 h; the
    periodogram RANKS the candidate periods by how much variance each
    frequency actually carries (power = (Σy·cos)² + (Σy·sin)² over the
    dense mean-centered grid).

    Determinism: the trig factors round to 6 dp per hour (the ln-ladder
    convention for transcendental parity), each product micro-fixes to a
    bigint, sums are exact, and the squares accumulate in DECIMAL/HUGEINT;
    mean-centering uses exact counts (y·n − total, never a float mean).

    Scale: trig projection is scan-stage arithmetic on the types×hours
    grid; one rollup per (type, period)."""
    ev = load_table(spark, sf_dir, "events")
    hb = (F.floor(F.unix_timestamp("ts") / 3600)).cast("bigint")
    hc = ev.groupBy("event_type", hb.alias("h")).agg(
        F.count("*").cast("bigint").alias("y")
    )
    rng = hc.groupBy("event_type").agg(
        F.min("h").alias("_lo"), F.max("h").alias("_hi")
    )
    dense = rng.select(
        "event_type", "_lo", F.explode(F.sequence("_lo", "_hi")).alias("h")
    )
    dn = (
        dense.join(hc, ["event_type", "h"], "left")
        .select(
            "event_type",
            (F.col("h") - F.col("_lo")).alias("hr"),
            F.coalesce("y", F.lit(0)).cast("bigint").alias("y"),
        )
    )
    tot = dn.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("_n"),
        F.sum("y").cast("bigint").alias("_ty"),
    )
    periods = spark.createDataFrame(
        [(p,) for p in PERIODOGRAM_PERIODS], "period int"
    )
    fan = dn.join(tot, "event_type").crossJoin(F.broadcast(periods))
    # mean-centered value scaled by n: yc = y*n - ty (exact integer)
    yc = F.col("y") * F.col("_n") - F.col("_ty")
    ang = 2.0 * 3.141592653589793 * F.col("hr") / F.col("period").cast("double")
    cosr = F.round(F.cos(ang), 6)
    sinr = F.round(F.sin(ang), 6)
    proj = fan.select(
        "event_type",
        "period",
        "_n",
        F.round(yc * cosr * 1000000).cast("bigint").alias("_cu"),
        F.round(yc * sinr * 1000000).cast("bigint").alias("_su"),
    )
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = proj.groupBy("event_type", "period", "_n").agg(
        F.sum("_cu").cast("bigint").alias("_sc"),
        F.sum("_su").cast("bigint").alias("_ss"),
    )
    power = (d(m["_sc"]) * d(m["_sc"]) + d(m["_ss"]) * d(m["_ss"])).cast(
        "double"
    )
    scored = m.select(
        "event_type",
        "period",
        # normalize out the micro scale, the n-scaling of yc, and grid size
        F.round(
            power
            / (
                F.lit(1e12)
                * (F.col("_n") * F.col("_n")).cast("double")
                * F.col("_n").cast("double")
            ),
            4,
        ).alias("power_r"),
    )
    tot2 = scored.groupBy("event_type").agg(
        F.sum(F.round(F.col("power_r") * 10000).cast("bigint")).alias("_tp")
    )
    return (
        scored.join(tot2, "event_type")
        .select(
            "event_type",
            "period",
            "power_r",
            F.when(
                F.col("_tp") > 0,
                F.round(
                    F.round(F.col("power_r") * 10000).cast("bigint")
                    / F.col("_tp").cast("double"),
                    4,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("power_share_r"),
        )
        .orderBy("event_type", "period")
    )


_PG_LIST = ", ".join(str(p) for p in PERIODOGRAM_PERIODS)

ORACLE_EVENTS_PERIODOGRAM = f"""
WITH hc AS (
  SELECT event_type, floor(epoch(ts) / 3600)::BIGINT AS h, count(*)::BIGINT AS y
  FROM events GROUP BY 1, 2
),
grid AS (
  SELECT event_type, min(h) AS lo, unnest(range(min(h), max(h) + 1)) AS h
  FROM hc GROUP BY event_type
),
dn AS (
  SELECT g.event_type, g.h - g.lo AS hr, coalesce(hc.y, 0)::BIGINT AS y
  FROM grid g LEFT JOIN hc ON g.event_type = hc.event_type AND g.h = hc.h
),
tot AS (
  SELECT event_type, count(*)::BIGINT AS n, sum(y)::BIGINT AS ty
  FROM dn GROUP BY event_type
),
periods AS (SELECT unnest([{_PG_LIST}])::INT AS period),
proj AS (
  SELECT dn.event_type, p.period, t.n,
         CAST(round((dn.y * t.n - t.ty)
              * round(cos(2.0 * 3.141592653589793 * dn.hr / p.period), 6)
              * 1000000) AS BIGINT) AS cu,
         CAST(round((dn.y * t.n - t.ty)
              * round(sin(2.0 * 3.141592653589793 * dn.hr / p.period), 6)
              * 1000000) AS BIGINT) AS su
  FROM dn JOIN tot t ON dn.event_type = t.event_type
  CROSS JOIN periods p
),
m AS (
  SELECT event_type, period, n,
         sum(cu)::BIGINT AS sc, sum(su)::BIGINT AS ss
  FROM proj GROUP BY event_type, period, n
),
scored AS (
  SELECT event_type, period,
         round(CAST(sc::HUGEINT * sc::HUGEINT + ss::HUGEINT * ss::HUGEINT
                    AS DOUBLE)
               / (1e12 * CAST(n * n AS DOUBLE) * CAST(n AS DOUBLE)), 4)
           AS power_r
  FROM m
),
tot2 AS (
  SELECT event_type,
         sum(CAST(round(power_r * 10000) AS BIGINT))::BIGINT AS tp
  FROM scored GROUP BY event_type
)
SELECT s.event_type, s.period, s.power_r,
       CASE WHEN t.tp > 0
            THEN round(CAST(round(s.power_r * 10000) AS BIGINT)
                       / CAST(t.tp AS DOUBLE), 4)
            ELSE 0.0 END AS power_share_r
FROM scored s JOIN tot2 t ON s.event_type = t.event_type
ORDER BY s.event_type, s.period
"""

QUERIES.update({"events_periodogram": q_events_periodogram})
ORACLES.update({"events_periodogram": ORACLE_EVENTS_PERIODOGRAM})


# --- pinball (quantile) forecast loss ---------------------------------------------------

PINBALL_QS = [50, 90]
PINBALL_LAG_H = 24


def q_events_forecast_pinball(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile (pinball) loss of the seasonal-naive forecaster per event
    type: L_q = mean(max(q·e, (q−1)·e)) with e = y − ŷ, ŷ = y(t−24 h) on
    the dense grid — the asymmetric score a P90 capacity forecast is
    actually judged by (`events_forecast_backtest` scores the median;
    under-forecasting a P90 costs 9× more than over, and MAE can't see
    that).

    Determinism: errors are exact integers; per-q losses are integer
    sums of max(q·e, (q−100)·e) in percent units; one division at the
    end.

    Scale: the lag join and loss rollup run on the types×hours grid."""
    ev = load_table(spark, sf_dir, "events")
    hb = (F.floor(F.unix_timestamp("ts") / 3600)).cast("bigint")
    hc = ev.groupBy("event_type", hb.alias("h")).agg(
        F.count("*").cast("bigint").alias("y")
    )
    rng = hc.groupBy("event_type").agg(
        F.min("h").alias("_lo"), F.max("h").alias("_hi")
    )
    dense = rng.select(
        "event_type", F.explode(F.sequence("_lo", "_hi")).alias("h")
    )
    dn = dense.join(hc, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce("y", F.lit(0)).cast("bigint").alias("y")
    )
    pred = dn.select(
        "event_type",
        (F.col("h") + PINBALL_LAG_H).alias("h"),
        F.col("y").alias("_yhat"),
    )
    j = dn.join(pred, ["event_type", "h"]).withColumn(
        "_e", (F.col("y") - F.col("_yhat")).cast("bigint")
    )
    qs = spark.createDataFrame([(q,) for q in PINBALL_QS], "q int")
    fan = j.crossJoin(F.broadcast(qs)).withColumn(
        "_loss",
        F.greatest(
            F.col("q") * F.col("_e"), (F.col("q") - 100) * F.col("_e")
        ).cast("bigint"),
    )
    return (
        fan.groupBy("event_type", "q")
        .agg(
            F.count("*").cast("bigint").alias("n_hours"),
            F.round(
                F.sum("_loss") / (F.count("*") * F.lit(100.0)), 4
            ).alias("pinball_loss_r"),
        )
        .orderBy("event_type", "q")
    )


_PB_QS = ", ".join(str(q) for q in PINBALL_QS)

ORACLE_EVENTS_PINBALL = f"""
WITH hc AS (
  SELECT event_type, floor(epoch(ts) / 3600)::BIGINT AS h, count(*)::BIGINT AS y
  FROM events GROUP BY 1, 2
),
grid AS (
  SELECT event_type, unnest(range(min(h), max(h) + 1)) AS h
  FROM hc GROUP BY event_type
),
dn AS (
  SELECT g.event_type, g.h, coalesce(hc.y, 0)::BIGINT AS y
  FROM grid g LEFT JOIN hc ON g.event_type = hc.event_type AND g.h = hc.h
),
j AS (
  SELECT a.event_type, (a.y - b.y)::BIGINT AS e
  FROM dn a JOIN dn b
    ON a.event_type = b.event_type AND b.h = a.h - {PINBALL_LAG_H}
),
qs AS (SELECT unnest([{_PB_QS}])::INT AS q)
SELECT j.event_type, q.q, count(*)::BIGINT AS n_hours,
       round(sum(greatest(q.q * j.e, (q.q - 100) * j.e)) / (count(*) * 100.0),
             4) AS pinball_loss_r
FROM j CROSS JOIN qs q
GROUP BY j.event_type, q.q ORDER BY j.event_type, q.q
"""

QUERIES.update({"events_forecast_pinball": q_events_forecast_pinball})
ORACLES.update({"events_forecast_pinball": ORACLE_EVENTS_PINBALL})


# --- split-conformal forecast intervals -------------------------------------

CP_ALPHA = 0.1  # target 90% coverage
CP_CAL_FRAC = 0.7  # time-ordered calibration prefix


def q_events_conformal_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals (Vovk et al. 2005; Lei et al.
    JASA 2018) for the seasonal-naive hourly forecast: per event type the
    time-ordered first 70% of scored buckets calibrates the absolute
    residual, the conformal radius is the ceil((n_cal+1)*(1-alpha))-th
    smallest calibration residual (exact order statistic — residuals are
    INTEGER count differences, so the whole interval construction is
    engine-exact), and held-out coverage of y in yhat +/- q is reported
    on the remaining 30%. The distribution-free finite-sample guarantee
    (coverage >= 1-alpha in expectation under exchangeability) is the
    point: an uncertainty band with a testable contract, no likelihood
    assumptions. Shape: one type-keyed exchange serves the lag, the
    split ranking, AND the order statistic; the report is types-sized."""
    from pyspark.sql import Window

    from pyvectorsearch_spark.operators.timeseries import resample_counts

    ev = spread(load_table(spark, sf_dir, "events"))
    grid = resample_counts(ev, by="event_type", ts_col="ts", width_s=3600)
    w = Window.partitionBy("event_type").orderBy("bucket_epoch")
    scored = (
        grid.select(
            "event_type",
            "bucket_epoch",
            "n",
            F.lag("n", FC_SEASON).over(w).alias("_f"),
        )
        .filter(F.col("_f").isNotNull())
        .withColumn("_res", F.abs(F.col("n") - F.col("_f")).cast("bigint"))
        .withColumn("_rn", F.row_number().over(w))
    )
    counts = scored.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("_n_all")
    )
    sc = scored.join(F.broadcast(counts), "event_type").withColumn(
        "_n_cal", F.floor(F.lit(CP_CAL_FRAC) * F.col("_n_all")).cast("bigint")
    )
    cal = sc.filter(F.col("_rn") <= F.col("_n_cal"))
    test = sc.filter(F.col("_rn") > F.col("_n_cal"))
    # conformal radius: k-th smallest calibration residual,
    # k = ceil((n_cal + 1) * (1 - alpha)), deterministic tiebreak
    wq = Window.partitionBy("event_type").orderBy(
        F.col("_res").asc(), F.col("bucket_epoch").asc()
    )
    k = F.ceil((F.col("_n_cal") + 1) * F.lit(1.0 - CP_ALPHA)).cast("bigint")
    q = (
        cal.withColumn("_qr", F.row_number().over(wq))
        .filter(F.col("_qr") == F.least(k, F.col("_n_cal")))
        .select("event_type", F.col("_res").alias("q_radius"),
                F.col("_n_cal").alias("n_cal"))
    )
    return (
        test.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n_cal").alias("n_cal"),
            F.count("*").cast("bigint").alias("n_test"),
            F.max("q_radius").alias("q_radius"),
            F.sum((F.col("_res") <= F.col("q_radius")).cast("long"))
            .cast("bigint")
            .alias("n_covered"),
            F.round(
                F.avg((F.col("_res") <= F.col("q_radius")).cast("double")), 6
            ).alias("coverage_r"),
        )
        .orderBy("event_type")
    )


ORACLE_CONFORMAL_FORECAST = f"""
WITH hist AS (
  SELECT event_type,
         (CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600) AS be,
         count(*)::BIGINT AS n
  FROM events GROUP BY event_type, be
),
grid AS (
  SELECT h.event_type, gs.be, coalesce(hist.n, 0)::BIGINT AS n
  FROM (
    SELECT event_type, unnest(range(mn, mx + 3600, 3600)) AS be
    FROM (SELECT event_type, min(be) AS mn, max(be) AS mx
          FROM hist GROUP BY event_type)
  ) gs(event_type, be)
  JOIN (SELECT DISTINCT event_type FROM hist) h ON h.event_type = gs.event_type
  LEFT JOIN hist ON hist.event_type = gs.event_type AND hist.be = gs.be
),
scored AS (
  SELECT * FROM (
    SELECT event_type, be, n, lag(n, {FC_SEASON}) OVER w AS f
    FROM grid WINDOW w AS (PARTITION BY event_type ORDER BY be)
  ) WHERE f IS NOT NULL
),
ranked AS (
  SELECT event_type, be, abs(n - f)::BIGINT AS res,
         row_number() OVER (PARTITION BY event_type ORDER BY be) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n_all
  FROM scored
),
split AS (
  SELECT *, CAST(floor({CP_CAL_FRAC} * n_all) AS BIGINT) AS n_cal
  FROM ranked
),
q AS (
  SELECT event_type, res AS q_radius, n_cal FROM (
    SELECT event_type, res, n_cal,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY res ASC, be ASC) AS qr
    FROM split WHERE rn <= n_cal
  ) WHERE qr = least(CAST(ceil((n_cal + 1) * {1.0 - CP_ALPHA}) AS BIGINT),
                     n_cal)
)
SELECT s.event_type, max(q.n_cal)::BIGINT AS n_cal,
       count(*)::BIGINT AS n_test, max(q.q_radius)::BIGINT AS q_radius,
       sum(CASE WHEN s.res <= q.q_radius THEN 1 ELSE 0 END)::BIGINT
         AS n_covered,
       round(avg(CASE WHEN s.res <= q.q_radius THEN 1.0 ELSE 0.0 END), 6)
         AS coverage_r
FROM split s JOIN q ON q.event_type = s.event_type
WHERE s.rn > s.n_cal
GROUP BY s.event_type ORDER BY s.event_type
"""

QUERIES.update({"events_conformal_forecast": q_events_conformal_forecast})
ORACLES.update({"events_conformal_forecast": ORACLE_CONFORMAL_FORECAST})


# --- banded exact matrix profile (motif discovery) ---------------------------

MP_W = 24  # window length: one day of hourly buckets
MP_BAND = 168  # search band: up to one week apart (d in [MP_W, MP_BAND])


def q_events_matrix_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded exact matrix profile (the MASS/STOMP family — Yeh et al.
    ICDM 2016 — restricted to a fixed offset band): for every pair of
    day-long windows (i, j = i + d), d in [MP_W, MP_BAND] hours (the
    exclusion zone removes trivial self-matches), the z-normalized
    Euclidean distance; per event type report the MOTIF (closest pair)
    and the profile mean. Because the series are COUNTS, every sliding
    sum (s1, s2, the dot products) is exact integer arithmetic — floats
    appear only in the final closed form dist = sqrt(2W(1 - corr)), so
    both engines compute identical IEEE doubles and the motif is
    hash-checkable.

    Scale shape: this runs on the RESAMPLED grid (T buckets, not raw
    events), so cost is T x BAND sliding-sum rows per type — independent
    of event count; the d-expansion and both sliding windows ride ONE
    (type, d)-partitioned sort, and the per-type argmin is a bounded
    top-1."""
    from pyspark.sql import Window

    from pyvectorsearch_spark.operators.timeseries import resample_counts

    ev = spread(load_table(spark, sf_dir, "events"))
    grid = resample_counts(ev, by="event_type", ts_col="ts", width_s=3600)
    wb = (
        Window.partitionBy("event_type")
        .orderBy("bucket_epoch")
        .rowsBetween(Window.currentRow, MP_W - 1)
    )
    stats = (
        grid.select(
            "event_type",
            "bucket_epoch",
            "n",
            F.sum("n").over(wb).cast("bigint").alias("s1"),
            F.sum(F.col("n") * F.col("n")).over(wb).cast("bigint").alias("s2"),
            F.count("*").over(wb).alias("_cw"),
        )
        .filter(F.col("_cw") == MP_W)
        .select("event_type", "bucket_epoch", "s1", "s2")
    )
    dvals = F.explode(F.array(*[F.lit(d) for d in range(MP_W, MP_BAND + 1)]))
    a = grid.select("event_type", "bucket_epoch", "n").withColumn("d", dvals)
    b = grid.select(
        F.col("event_type").alias("event_type"),
        F.col("bucket_epoch").alias("_be2"),
        F.col("n").alias("_n2"),
    )
    prod = a.withColumn("_be2", F.col("bucket_epoch") + F.col("d") * 3600).join(
        b, ["event_type", "_be2"]
    )
    wd = (
        Window.partitionBy("event_type", "d")
        .orderBy("bucket_epoch")
        .rowsBetween(Window.currentRow, MP_W - 1)
    )
    dots = (
        prod.select(
            "event_type",
            "d",
            "bucket_epoch",
            F.sum(F.col("n") * F.col("_n2")).over(wd).cast("bigint").alias("dot"),
            F.count("*").over(wd).alias("_cd"),
        )
        .filter(F.col("_cd") == MP_W)
        .select("event_type", "d", "bucket_epoch", "dot")
    )
    si = stats.select(
        "event_type",
        F.col("bucket_epoch").alias("bucket_epoch"),
        F.col("s1").alias("_s1i"),
        F.col("s2").alias("_s2i"),
    )
    sj = stats.select(
        "event_type",
        F.col("bucket_epoch").alias("_bej"),
        F.col("s1").alias("_s1j"),
        F.col("s2").alias("_s2j"),
    )
    w_ = float(MP_W)
    scored = (
        dots.join(si, ["event_type", "bucket_epoch"])
        .withColumn("_bej", F.col("bucket_epoch") + F.col("d") * 3600)
        .join(sj, ["event_type", "_bej"])
        .withColumn("_mi", F.col("_s1i") / w_)
        .withColumn("_mj", F.col("_s1j") / w_)
        .withColumn(
            "_vi", F.col("_s2i") / w_ - (F.col("_s1i") / w_) * (F.col("_s1i") / w_)
        )
        .withColumn(
            "_vj", F.col("_s2j") / w_ - (F.col("_s1j") / w_) * (F.col("_s1j") / w_)
        )
        .filter((F.col("_vi") > 0) & (F.col("_vj") > 0))
        .withColumn(
            "_corr",
            (F.col("dot") / w_ - F.col("_mi") * F.col("_mj"))
            / (F.sqrt("_vi") * F.sqrt("_vj")),
        )
        .withColumn(
            "dist",
            F.sqrt(F.greatest(F.lit(0.0), 2.0 * w_ * (1.0 - F.col("_corr")))),
        )
    )
    wtop = Window.partitionBy("event_type").orderBy(
        F.round("dist", 6).asc(), F.col("bucket_epoch").asc(), F.col("d").asc()
    )
    top = scored.withColumn("_r", F.row_number().over(wtop)).filter(F.col("_r") == 1)
    agg = scored.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.round(F.avg("dist"), 6).alias("mean_dist_r"),
    )
    return (
        top.select(
            "event_type",
            F.col("bucket_epoch").alias("motif_i_epoch"),
            F.col("_bej").alias("motif_j_epoch"),
            F.round("dist", 6).alias("motif_dist_r"),
        )
        .join(agg, "event_type")
        .select(
            "event_type", "n_pairs", "motif_i_epoch", "motif_j_epoch",
            "motif_dist_r", "mean_dist_r",
        )
        .orderBy("event_type")
    )


ORACLE_MATRIX_PROFILE = f"""
WITH hist AS (
  SELECT event_type,
         (CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600) AS be,
         count(*)::BIGINT AS n
  FROM events GROUP BY event_type, be
),
grid AS (
  SELECT h.event_type, gs.be, coalesce(hist.n, 0)::BIGINT AS n
  FROM (
    SELECT event_type, unnest(range(mn, mx + 3600, 3600)) AS be
    FROM (SELECT event_type, min(be) AS mn, max(be) AS mx
          FROM hist GROUP BY event_type)
  ) gs(event_type, be)
  JOIN (SELECT DISTINCT event_type FROM hist) h ON h.event_type = gs.event_type
  LEFT JOIN hist ON hist.event_type = gs.event_type AND hist.be = gs.be
),
stats AS (
  SELECT * FROM (
    SELECT event_type, be,
           sum(n) OVER w AS s1, sum(n * n) OVER w AS s2,
           count(*) OVER w AS cw
    FROM grid
    WINDOW w AS (PARTITION BY event_type ORDER BY be
                 ROWS BETWEEN CURRENT ROW AND {MP_W - 1} FOLLOWING)
  ) WHERE cw = {MP_W}
),
prod AS (
  SELECT a.event_type, dv.d, a.be, a.n * b.n AS p
  FROM grid a
  CROSS JOIN (SELECT unnest(range({MP_W}, {MP_BAND} + 1)) AS d) dv
  JOIN grid b ON b.event_type = a.event_type AND b.be = a.be + dv.d * 3600
),
dots AS (
  SELECT * FROM (
    SELECT event_type, d, be,
           sum(p) OVER w AS dot, count(*) OVER w AS cd
    FROM prod
    WINDOW w AS (PARTITION BY event_type, d ORDER BY be
                 ROWS BETWEEN CURRENT ROW AND {MP_W - 1} FOLLOWING)
  ) WHERE cd = {MP_W}
),
scored AS (
  SELECT dt.event_type, dt.be, dt.be + dt.d * 3600 AS bej,
         sqrt(greatest(0.0, 2.0 * {MP_W}.0 * (1.0 -
           (dt.dot / {MP_W}.0 - (si.s1 / {MP_W}.0) * (sj.s1 / {MP_W}.0))
           / (sqrt(si.s2 / {MP_W}.0 - (si.s1 / {MP_W}.0) * (si.s1 / {MP_W}.0))
              * sqrt(sj.s2 / {MP_W}.0 - (sj.s1 / {MP_W}.0) * (sj.s1 / {MP_W}.0)))
         ))) AS dist,
         dt.d
  FROM dots dt
  JOIN stats si ON si.event_type = dt.event_type AND si.be = dt.be
  JOIN stats sj ON sj.event_type = dt.event_type
               AND sj.be = dt.be + dt.d * 3600
  WHERE si.s2 / {MP_W}.0 - (si.s1 / {MP_W}.0) * (si.s1 / {MP_W}.0) > 0
    AND sj.s2 / {MP_W}.0 - (sj.s1 / {MP_W}.0) * (sj.s1 / {MP_W}.0) > 0
),
top AS (
  SELECT event_type, be AS motif_i_epoch, bej AS motif_j_epoch,
         round(dist, 6) AS motif_dist_r,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY round(dist, 6) ASC, be ASC, d ASC) AS r
  FROM scored
),
agg AS (
  SELECT event_type, count(*)::BIGINT AS n_pairs,
         round(avg(dist), 6) AS mean_dist_r
  FROM scored GROUP BY event_type
)
SELECT t.event_type, a.n_pairs, t.motif_i_epoch, t.motif_j_epoch,
       t.motif_dist_r, a.mean_dist_r
FROM top t JOIN agg a ON a.event_type = t.event_type
WHERE t.r = 1 ORDER BY t.event_type
"""

QUERIES.update({"events_matrix_profile": q_events_matrix_profile})
ORACLES.update({"events_matrix_profile": ORACLE_MATRIX_PROFILE})


# --- Theil-Sen robust trend (banded) -----------------------------------------

TS_SEN_BAND = 168  # pair gap cap: one week of hourly buckets


def q_events_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded Theil-Sen robust trend (Theil 1950/Sen 1968): the median of
    pairwise slopes (y_j - y_i)/(j - i) over all bucket pairs at most
    TS_SEN_BAND hours apart, per event type, next to the exact OLS slope
    — the estimator that survives up to ~29% outliers where OLS breaks
    (breakdown proven on a planted-corruption fixture in
    tests/test_round6_theilsen.py). Slopes are int-difference ratios and
    the median is an explicit order statistic (lower/upper middle
    averaged), so the report is engine-exact.

    Scale shape: same band-offset equi-join as `events_matrix_profile` —
    pairs are (T x band) per type regardless of raw event count; the OLS
    slope folds from five integer sums in one rollup."""
    from pyspark.sql import Window

    from pyvectorsearch_spark.operators.timeseries import resample_counts

    ev = spread(load_table(spark, sf_dir, "events"))
    grid = resample_counts(ev, by="event_type", ts_col="ts", width_s=3600)
    idx = grid.select(
        "event_type",
        ((F.col("bucket_epoch") / 3600).cast("bigint")).alias("t"),
        F.col("n").cast("bigint").alias("y"),
    )
    dvals = F.explode(F.array(*[F.lit(d) for d in range(1, TS_SEN_BAND + 1)]))
    a = idx.withColumn("d", dvals).withColumn("t2", F.col("t") + F.col("d"))
    b = idx.select(
        F.col("event_type").alias("event_type"),
        F.col("t").alias("t2"),
        F.col("y").alias("y2"),
    )
    pairs = a.join(b, ["event_type", "t2"]).withColumn(
        "slope", (F.col("y2") - F.col("y")) / F.col("d").cast("double")
    )
    cnt = pairs.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_pairs")
    ).select(F.col("event_type").alias("c_et"), "n_pairs")
    wr = Window.partitionBy("event_type").orderBy(
        F.col("slope").asc(), F.col("t").asc(), F.col("d").asc()
    )
    lo = (F.col("n_pairs") + 1) / 2
    hi = (F.col("n_pairs") + 2) / 2
    med = (
        pairs.join(F.broadcast(cnt), F.col("event_type") == F.col("c_et"))
        .withColumn("_r", F.row_number().over(wr))
        .filter(
            (F.col("_r") == F.floor(lo).cast("bigint"))
            | (F.col("_r") == F.floor(hi).cast("bigint"))
        )
        .groupBy("event_type")
        .agg(
            F.round(F.avg("slope"), 6).alias("theilsen_slope_r"),
            F.max("n_pairs").alias("n_pairs"),
        )
    )
    ols = idx.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_points"),
        F.sum("t").cast("bigint").alias("_st"),
        F.sum("y").cast("bigint").alias("_sy"),
        F.sum(F.col("t") * F.col("y")).cast("bigint").alias("_sty"),
        F.sum(F.col("t") * F.col("t")).cast("bigint").alias("_stt"),
    ).select(
        "event_type",
        "n_points",
        F.round(
            (F.col("n_points") * F.col("_sty") - F.col("_st") * F.col("_sy"))
            / (
                F.col("n_points") * F.col("_stt")
                - F.col("_st") * F.col("_st")
            ).cast("double"),
            6,
        ).alias("ols_slope_r"),
    )
    return (
        med.join(ols, "event_type")
        .select(
            "event_type", "n_points", "n_pairs",
            "theilsen_slope_r", "ols_slope_r",
        )
        .orderBy("event_type")
    )


ORACLE_THEILSEN = f"""
WITH hist AS (
  SELECT event_type,
         (CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600) AS be,
         count(*)::BIGINT AS n
  FROM events GROUP BY event_type, be
),
grid AS (
  SELECT h.event_type, gs.be, coalesce(hist.n, 0)::BIGINT AS n
  FROM (
    SELECT event_type, unnest(range(mn, mx + 3600, 3600)) AS be
    FROM (SELECT event_type, min(be) AS mn, max(be) AS mx
          FROM hist GROUP BY event_type)
  ) gs(event_type, be)
  JOIN (SELECT DISTINCT event_type FROM hist) h ON h.event_type = gs.event_type
  LEFT JOIN hist ON hist.event_type = gs.event_type AND hist.be = gs.be
),
idx AS (
  SELECT event_type, CAST(be / 3600 AS BIGINT) AS t, n AS y FROM grid
),
pairs AS (
  SELECT a.event_type, a.t, b.t - a.t AS d,
         (b.y - a.y) / CAST(b.t - a.t AS DOUBLE) AS slope
  FROM idx a JOIN idx b
    ON b.event_type = a.event_type
   AND b.t > a.t AND b.t <= a.t + {TS_SEN_BAND}
),
cnt AS (SELECT event_type, count(*)::BIGINT AS n_pairs FROM pairs GROUP BY 1),
med AS (
  SELECT event_type, round(avg(slope), 6) AS theilsen_slope_r,
         max(n_pairs)::BIGINT AS n_pairs
  FROM (
    SELECT p.event_type, p.slope, c.n_pairs,
           row_number() OVER (PARTITION BY p.event_type
                              ORDER BY p.slope ASC, p.t ASC, p.d ASC) AS r
    FROM pairs p JOIN cnt c ON c.event_type = p.event_type
  )
  WHERE r = CAST(floor((n_pairs + 1) / 2.0) AS BIGINT)
     OR r = CAST(floor((n_pairs + 2) / 2.0) AS BIGINT)
  GROUP BY event_type
),
ols AS (
  SELECT event_type, count(*)::BIGINT AS n_points,
         round((count(*) * sum(t * y) - sum(t) * sum(y))
               / CAST(count(*) * sum(t * t) - sum(t) * sum(t) AS DOUBLE), 6)
           AS ols_slope_r
  FROM idx GROUP BY event_type
)
SELECT m.event_type, o.n_points, m.n_pairs, m.theilsen_slope_r, o.ols_slope_r
FROM med m JOIN ols o ON o.event_type = m.event_type
ORDER BY m.event_type
"""

QUERIES.update({"events_theilsen_trend": q_events_theilsen_trend})
ORACLES.update({"events_theilsen_trend": ORACLE_THEILSEN})
