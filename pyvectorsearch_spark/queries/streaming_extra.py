"""Streaming document-curation query (outside the driver's pinned 50-entry
window; covered by tests/test_oracle_parity.py).

The continuous-ingestion shape of the batch curation pipeline: a file-source
document stream scored with the SAME quality/token operators used in batch
(`operators/textops.py::quality_score_col` — pure stateless projections, so
they are stream-safe by construction), aggregated per source in complete
mode. The oracle is plain SQL over the parquet table, so the hash match
checks the streaming engine's execution of the curation expressions, not a
batch stand-in.

Scale shape: stateless scoring pipelines inside the micro-batch scan stage;
the only state is the per-source aggregate (source-cardinality rows). At
production scale the same plan runs against a real file/queue source with a
processing-time trigger.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyvectorsearch_spark.functions.text import duckdb_quality, duckdb_tokens, tokens
from pyvectorsearch_spark.operators.textops import quality_score_col
from pyvectorsearch_spark.sources.tables import dataset_tag, load_table

QUALITY_MIN = 0.5


def _docs_landing(spark: SparkSession, sf_dir: str, n_files: int = 8) -> str:
    """Multi-file landing copy of documents (snapshot-keyed, atomically
    published) so the file stream delivers real multi-batch arrival."""
    base = dataset_tag(sf_dir, "documents")
    path = os.path.join(tempfile.gettempdir(), f"pvs_docs_landing8_{base}")
    if not os.path.isdir(path):
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        load_table(spark, sf_dir, "documents").repartition(n_files).write.parquet(tmp)
        try:
            os.rename(tmp, path)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.isdir(path):
                raise
    return path


def q_docs_curate_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation stats computed BY THE STREAMING ENGINE over a
    multi-batch document stream: doc counts, quality-gate keeps, and token
    totals (complete-mode aggregate, availableNow drain)."""
    path = _docs_landing(spark, sf_dir)
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    scored = stream.select(
        "source",
        F.size(tokens("text")).alias("_n_tok"),
        quality_score_col(F.col("text"), tokens("text")).alias("_q"),
    )
    agg = scored.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum((F.col("_q") >= QUALITY_MIN).cast("int")).cast("bigint").alias("n_kept"),
        F.sum("_n_tok").cast("bigint").alias("total_tokens"),
        F.round(F.sum("_q"), 4).alias("sum_quality"),
    )
    name = f"docs_curate_stream_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            "availableNow drain exceeded 300 s; the memory sink "
            "would be partial — failing loud instead (ADVICE r6)"
        )
    return spark.table(name).orderBy("source")


_TOK = duckdb_tokens("text")
_Q = duckdb_quality("text", "t")

ORACLE_DOCS_CURATE_STREAM = f"""
WITH s AS (SELECT source, {_TOK} AS t, text FROM documents),
m AS (SELECT source, len(t) AS n_tok, {_Q} AS q FROM s)
SELECT source, count(*)::BIGINT AS n_docs,
       sum(CASE WHEN q >= {QUALITY_MIN} THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       sum(n_tok)::BIGINT AS total_tokens,
       round(sum(q), 4) AS sum_quality
FROM m GROUP BY source ORDER BY source
"""


def q_events_hopping_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOPPING windows computed BY THE STREAMING ENGINE: 30-minute windows
    sliding every 15, watermarked, availableNow drain — each event counted
    in exactly two overlapping windows. Streaming twin of the batch
    `events_hopping`; the oracle derives the two epoch-aligned window
    starts arithmetically."""
    from pyvectorsearch_spark.queries.streaming import _drain, _event_stream
    from pyvectorsearch_spark.streaming.ingest import windowed_event_counts

    out = windowed_event_counts(
        _event_stream(spark, sf_dir),
        window="1800 seconds",
        slide="900 seconds",
        watermark="2 hours",
    )
    name = _drain(out, "events_hopping_stream")
    return (
        spark.table(name)
        .select(
            "event_type",
            F.unix_timestamp("window_start").cast("bigint").alias("win_start"),
            F.col("n_events").cast("bigint").alias("n"),
            F.round("sum_value", 6).alias("total_value"),
        )
        .orderBy("event_type", "win_start")
    )


ORACLE_HOPPING_STREAM = """
WITH e AS (
  SELECT event_type, value,
         (floor(epoch(ts) / 900) * 900)::BIGINT AS b
  FROM events
),
x AS (
  SELECT event_type, value, unnest([b, b - 900]) AS win_start FROM e
)
SELECT event_type, win_start, count(*)::BIGINT AS n,
       round(sum(value), 6) AS total_value
FROM x GROUP BY event_type, win_start
ORDER BY event_type, win_start
"""


# stream-static dimension: event_type -> (category, weight). Literal on both
# sides so the oracle is self-contained.
ENRICH_DIM = [
    ("view", "engagement", 1),
    ("click", "engagement", 2),
    ("purchase", "conversion", 5),
    ("signup", "conversion", 3),
    ("error", "ops", 0),
]


def q_events_enrich_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC broadcast join executed by the streaming engine: each
    micro-batch of the event stream joins the in-memory category/weight
    dimension (the canonical streaming-enrichment shape — the static side
    broadcasts once, no state beyond the final aggregate), then folds into
    a per-category stateful aggregate. Revenue is weighted in integer
    cents so the multi-batch sum is order-independent and the batch oracle
    applies verbatim."""
    from pyvectorsearch_spark.queries.streaming import _drain, _event_stream

    dim = spark.createDataFrame(
        ENRICH_DIM, "event_type string, category string, weight int"
    )
    stream = _event_stream(spark, sf_dir)
    joined = stream.join(F.broadcast(dim), "event_type")
    agg = joined.groupBy("category").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(
            F.round(F.col("value") * 100).cast("bigint") * F.col("weight")
        )
        .cast("bigint")
        .alias("weighted_cents"),
    )
    name = _drain(agg, "events_enrich_stream")
    return spark.table(name).orderBy("category")


_ENRICH_CASES_CAT = " ".join(
    f"WHEN '{et}' THEN '{cat}'" for et, cat, _ in ENRICH_DIM
)
_ENRICH_CASES_W = " ".join(f"WHEN '{et}' THEN {w}" for et, _, w in ENRICH_DIM)

ORACLE_ENRICH_STREAM = f"""
WITH e AS (
  SELECT CASE event_type {_ENRICH_CASES_CAT} END AS category,
         CAST(round(value * 100) AS BIGINT)
           * (CASE event_type {_ENRICH_CASES_W} END) AS wc
  FROM events
  WHERE event_type IN ({", ".join(f"'{et}'" for et, _, _ in ENRICH_DIM)})
)
SELECT category, count(*)::BIGINT AS n_events, sum(wc)::BIGINT AS weighted_cents
FROM e GROUP BY category ORDER BY category
"""


def q_events_file_sink_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY-ONCE FILE SINK: the streaming engine writes the event stream
    to a checkpointed parquet sink (the production landing shape — memory
    sinks are test-only), then a batch read of the sink output proves
    every event landed exactly once: the per-type rollup must hash-match
    the batch oracle over the source table. Checkpoint + sink dirs are
    snapshot-keyed and rebuilt per source snapshot."""
    from pyvectorsearch_spark.queries.streaming import _event_stream
    from pyvectorsearch_spark.sources.tables import dataset_tag

    from pyvectorsearch_spark.streaming.ingest import (
        drain_complete,
        mark_drain_complete,
    )

    base = dataset_tag(sf_dir, "events")
    out = os.path.join(tempfile.gettempdir(), f"pvs_events_sink_{base}")
    ck = f"{out}.ck"
    # Sentinel-gated reuse: dir existence alone survives a crash/timeout
    # mid-stream and would silently serve a partial sink (ADVICE r7).
    if not drain_complete(out, ck):
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(ck, ignore_errors=True)
        stream = _event_stream(spark, sf_dir).select(
            "event_id",
            "event_type",
            F.round(F.col("value") * 100).cast("bigint").alias("vc"),
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "availableNow drain exceeded 300 s; the memory sink "
                "would be partial — failing loud instead (ADVICE r6)"
            )
        mark_drain_complete(out)
    sunk = spark.read.parquet(out)
    return (
        sunk.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.countDistinct("event_id").cast("bigint").alias("n_distinct_ids"),
            F.sum("vc").cast("bigint").alias("sum_cents"),
        )
        .orderBy("event_type")
    )


ORACLE_FILE_SINK_STREAM = """
SELECT event_type, count(*)::BIGINT AS n_events,
       count(DISTINCT event_id)::BIGINT AS n_distinct_ids,
       sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS sum_cents
FROM events GROUP BY event_type ORDER BY event_type
"""




def q_events_topk_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending detection: hourly tumbling-window event-type counts computed
    BY THE STREAMING ENGINE (watermarked stateful aggregation over the
    multi-batch landing copy), then the top-3 types per window ranked on the
    drained state table — the standard streaming-top-k decomposition
    (windowed counts are streaming state; rank is a projection of that
    state, applied at read time exactly as a dashboard would; streaming
    aggregations cannot nest a rank window). Ties break by event_type, so
    the result is engine-exact."""
    from pyspark.sql import Window

    from pyvectorsearch_spark.queries.streaming import (
        _drain,
        _event_stream,
        _events_landing,
    )
    from pyvectorsearch_spark.streaming.ingest import windowed_event_counts

    landing = _events_landing(spark, sf_dir)
    load_table(spark, sf_dir, "events")  # nanosAsLong conf
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = spark.readStream.schema(raw_schema).parquet(landing)
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    out = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    name = _drain(out, "events_topk_stream")
    w = Window.partitionBy("window_start").orderBy(
        F.desc("n_events"), F.asc("event_type")
    )
    return (
        spark.table(name)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            F.col("window_start").alias("hour"),
            "event_type",
            F.col("n_events").alias("n"),
            F.col("rnk").cast("int").alias("rnk"),
        )
        .orderBy("hour", "rnk")
    )


ORACLE_TOPK_STREAM = """
WITH c AS (
  SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT hour, event_type, n,
         row_number() OVER (PARTITION BY hour ORDER BY n DESC, event_type ASC)::INT AS rnk
  FROM c
)
SELECT hour, event_type, n, rnk FROM r WHERE rnk <= 3 ORDER BY hour, rnk
"""





LEFT_JOIN_CUTOFF = "2024-01-30 00:00:00"  # ≥ watermark+lag before stream end at every sf


def q_click_left_join_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join BY THE STREAMING ENGINE:
    every click paired with same-user purchases in the next 30 minutes, OR
    emitted with NULLs once the watermark proves no purchase can arrive —
    the conversion/no-conversion split an inner join cannot produce.

    The comparison window is cut off a day before stream end — AFTER the
    drain, never inside the stream: filtering the click SOURCE would cap
    that source's max event time and drag the global watermark (the min
    across sources) back to cutoff − delay, leaving the last 2.5 h of
    clicks unproven (measured: exactly the tail clicks dropped). The full
    stream keeps the watermark at stream-end − delay, so every click
    before the cutoff has its no-match proven inside the availableNow
    drain; the oracle applies the identical post-hoc cutoff."""
    from pyvectorsearch_spark.queries.streaming import _drain, _event_stream
    from pyvectorsearch_spark.streaming.ingest import stream_stream_left_join

    clicks = (
        _event_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), "user_id", "ts")
    )
    purchases = (
        _event_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
        )
    )
    joined = stream_stream_left_join(
        clicks,
        purchases,
        key_col="user_id",
        left_ts="ts",
        right_ts="p_ts",
        max_lag="30 minutes",
        watermark="2 hours",
    )
    name = _drain(joined, "click_left_join_stream", mode="append")
    return (
        spark.table(name)
        .filter(F.col("ts") < F.lit(LEFT_JOIN_CUTOFF).cast("timestamp"))
        .groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.when(F.col("purchase_id").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_unconverted"),
            F.countDistinct("purchase_id").cast("bigint").alias("n_purchases"),
        )
        .orderBy("user_id")
    )


ORACLE_CLICK_LEFT_JOIN = f"""
SELECT c.user_id, count(*)::BIGINT AS n_rows,
       sum(CASE WHEN p.event_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_unconverted,
       count(DISTINCT p.event_id)::BIGINT AS n_purchases
FROM (SELECT * FROM events
      WHERE event_type = 'click' AND ts < TIMESTAMP '{LEFT_JOIN_CUTOFF}') c
LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
GROUP BY c.user_id ORDER BY c.user_id
"""



def q_click_full_join_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER interval join BY THE STREAMING ENGINE:
    clicks ⟗ next-30-min purchases per user — unconverted clicks AND
    spontaneous purchases (no preceding click) both surface as NULL-padded
    rows once the watermark proves them. Both sides cut off post-drain a
    day before stream end (the min-across-sources watermark rule — see the
    left-join query); the oracle applies identical cutoffs."""
    from pyvectorsearch_spark.queries.streaming import _drain, _event_stream
    from pyvectorsearch_spark.streaming.ingest import stream_stream_full_join

    clicks = (
        _event_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), "user_id", "ts")
    )
    purchases = (
        _event_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
        )
    )
    joined = stream_stream_full_join(
        clicks,
        purchases,
        key_col="user_id",
        left_ts="ts",
        right_ts="p_ts",
        max_lag="30 minutes",
        watermark="2 hours",
    )
    name = _drain(joined, "click_full_join_stream", mode="append")
    cut = F.lit(LEFT_JOIN_CUTOFF).cast("timestamp")
    return (
        spark.table(name)
        .filter(F.coalesce("ts", "p_ts") < cut)
        .filter(F.col("p_ts").isNull() | (F.col("p_ts") < cut))
        .groupBy(F.col("_key").alias("user_id"))
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.when(F.col("purchase_id").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_unconverted_clicks"),
            F.sum(F.when(F.col("click_id").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_spontaneous_purchases"),
        )
        .orderBy("user_id")
    )


ORACLE_CLICK_FULL_JOIN = f"""
WITH j AS (
  SELECT coalesce(c.user_id, p.user_id) AS user_id,
         c.event_id AS click_id, p.event_id AS purchase_id,
         c.ts AS ts, p.ts AS p_ts
  FROM (SELECT * FROM events WHERE event_type = 'click') c
  FULL OUTER JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
    ON c.user_id = p.user_id
   AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
)
SELECT user_id, count(*)::BIGINT AS n_rows,
       sum(CASE WHEN purchase_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_unconverted_clicks,
       sum(CASE WHEN click_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_spontaneous_purchases
FROM j
WHERE coalesce(ts, p_ts) < TIMESTAMP '{LEFT_JOIN_CUTOFF}'
  AND (p_ts IS NULL OR p_ts < TIMESTAMP '{LEFT_JOIN_CUTOFF}')
GROUP BY user_id ORDER BY user_id
"""


def q_events_upsert_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING KEYED UPSERT (SCD1 latest-wins) via foreachBatch: every
    micro-batch MERGES into a stored per-user dimension — new keys insert,
    existing keys overwrite when the arriving event is later ((ts,
    event_id) order, so ties are deterministic) — the materialized-view
    maintenance pattern file sinks can't express (append-only). The
    multi-file landing forces several real merge rounds; each round
    rewrites the keyed dim atomically (tmp + rename) so a crashed batch
    can't leave a torn table, and the merge is idempotent (latest-wins is
    associative/commutative over batches), which is what makes foreachBatch
    retries safe. Final state must equal the batch argmax oracle — batching
    is invisible, the exactly-once-EFFECT contract."""
    import os
    import shutil
    import tempfile
    import uuid

    from pyvectorsearch_spark.queries.streaming import _events_landing
    from pyvectorsearch_spark.sources.tables import dataset_tag

    landing = _events_landing(spark, sf_dir)
    load_table(spark, sf_dir, "events")  # nanosAsLong conf
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    base = dataset_tag(sf_dir, "events")
    from pyvectorsearch_spark.streaming.ingest import (
        drain_complete,
        mark_drain_complete,
    )

    dim = os.path.join(tempfile.gettempdir(), f"pvs_user_dim_{base}")
    ck = f"{dim}.ck"
    # Sentinel-gated reuse (ADVICE r7): the sentinel lands inside dim AFTER
    # the drain, so a crash mid-merge leaves dim without it → full rebuild.
    if not drain_complete(dim, ck):
        shutil.rmtree(dim, ignore_errors=True)
        shutil.rmtree(ck, ignore_errors=True)
        stream = spark.readStream.schema(raw_schema).parquet(landing)
        ts_type = dict(stream.dtypes).get("ts")
        if ts_type == "bigint":
            stream = stream.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        elif ts_type == "timestamp_ntz":
            stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
        stream = stream.select(
            "user_id", "event_id", "event_type", "ts",
            F.round(F.col("value") * 100).cast("bigint").alias("vc"),
        )

        def merge(batch, batch_id):
            from pyspark.sql import Window

            sp = batch.sparkSession
            cur = (
                sp.read.parquet(dim)
                if os.path.isdir(dim)
                else sp.createDataFrame([], batch.schema)
            )
            w = Window.partitionBy("user_id").orderBy(
                F.desc("ts"), F.desc("event_id")
            )
            merged = (
                cur.unionByName(batch)
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
            tmp = f"{dim}.tmp-{uuid.uuid4().hex[:8]}"
            merged.coalesce(4).write.parquet(tmp)
            old = f"{dim}.old-{uuid.uuid4().hex[:8]}"
            if os.path.isdir(dim):
                os.rename(dim, old)
            os.rename(tmp, dim)
            shutil.rmtree(old, ignore_errors=True)

        q = (
            stream.writeStream.foreachBatch(merge)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError(
                "availableNow drain exceeded 300 s; the memory sink "
                "would be partial — failing loud instead (ADVICE r6)"
            )
        mark_drain_complete(dim)
    out = spark.read.parquet(dim)
    return out.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("vc").alias("last_cents"),
    ).orderBy("user_id")


ORACLE_UPSERT_STREAM = """
WITH r AS (
  SELECT user_id, event_id, event_type,
         round(value * 100)::BIGINT AS vc,
         row_number() OVER (
           PARTITION BY user_id ORDER BY ts DESC, event_id DESC
         ) AS rn
  FROM events
)
SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
       vc AS last_cents
FROM r WHERE rn = 1 ORDER BY user_id
"""


QUERIES = {
    "events_upsert_stream": q_events_upsert_stream,
    "click_full_join_stream": q_click_full_join_stream,
    "click_left_join_stream": q_click_left_join_stream,
    "docs_curate_stream": q_docs_curate_stream,
    "events_hopping_stream": q_events_hopping_stream,
    "events_enrich_stream": q_events_enrich_stream,
    "events_file_sink_stream": q_events_file_sink_stream,
    "events_topk_stream": q_events_topk_stream,
}
ORACLES = {
    "events_upsert_stream": ORACLE_UPSERT_STREAM,
    "click_full_join_stream": ORACLE_CLICK_FULL_JOIN,
    "click_left_join_stream": ORACLE_CLICK_LEFT_JOIN,
    "docs_curate_stream": ORACLE_DOCS_CURATE_STREAM,
    "events_hopping_stream": ORACLE_HOPPING_STREAM,
    "events_enrich_stream": ORACLE_ENRICH_STREAM,
    "events_file_sink_stream": ORACLE_FILE_SINK_STREAM,
    "events_topk_stream": ORACLE_TOPK_STREAM,
}
