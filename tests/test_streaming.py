"""Structured Streaming: windowed/session aggregation and incremental index
ingestion, verified against the equivalent batch computation (the streaming
plan with availableNow must produce exactly the batch answer)."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from pyvectorsearch_spark.sources.tables import load_table
from pyvectorsearch_spark.streaming.ingest import (
    read_event_stream,
    sessionized_stream,
    stream_index_ingest,
    windowed_event_counts,
)
from tests.conftest import SF_SMOKE


@pytest.fixture()
def event_landing(spark, tmp_path):
    """Write the smoke events table as multiple parquet files into a landing
    dir so the file stream sees several micro-batch candidates."""
    src = load_table(spark, SF_SMOKE, "events")
    land = str(tmp_path / "landing")
    src.repartition(4).write.parquet(land)
    return land


def _run_to_memory(stream_df, name: str, mode: str = "complete"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_windowed_counts_match_batch(spark, event_landing):
    stream = read_event_stream(spark, event_landing, max_files_per_trigger=2)
    out = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    _run_to_memory(out, "win_counts")
    got = spark.table("win_counts")

    batch = load_table(spark, SF_SMOKE, "events")
    exp = (
        batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    g = {tuple(r) for r in got.collect()}
    e = {tuple(r) for r in exp.collect()}
    assert g == e and len(g) > 0


def test_sessionized_stream_matches_batch_session_window(spark, event_landing):
    stream = read_event_stream(spark, event_landing)
    out = sessionized_stream(stream, gap="30 minutes", watermark="4 hours")
    _run_to_memory(out, "sessions")
    got = spark.table("sessions")

    batch = load_table(spark, SF_SMOKE, "events")
    exp = (
        batch.groupBy(F.session_window("ts", "30 minutes").alias("s"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )
    g = {tuple(r) for r in got.collect()}
    e = {tuple(r) for r in exp.collect()}
    assert g == e and len(g) > 0


def test_stream_index_ingest_appends_partitioned(spark, tmp_path):
    """Micro-batch ingestion with a cell-style assignment: rows land under
    ingest_batch=<id>/cell=... partition dirs (batch-keyed for idempotent
    replay, ADVICE r7) and the accumulated dataset equals the input."""
    emb = load_table(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    land = str(tmp_path / "vec_landing")
    emb.repartition(3).write.parquet(land)

    out_path = str(tmp_path / "index_data")
    ckpt = str(tmp_path / "ckpt")

    def assign(df):
        # closed-form cell id (1-d grid on the first coordinate), the same
        # shape GridIndex uses; any per-row expression works here
        return df.withColumn(
            "cell", F.floor(F.element_at("embedding", 1) * 4).cast("long")
        )

    stream = spark.readStream.schema(emb.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(land)
    q = stream_index_ingest(
        stream, assign=assign, out_path=out_path, checkpoint=ckpt,
        layout="cells",
    )
    q.awaitTermination(120)

    assert glob.glob(
        os.path.join(out_path, "ingest_batch=*", "cell=*")
    ), "no batch-keyed partition dirs"
    back = spark.read.parquet(out_path)
    assert back.count() == emb.count()
    assert set(back.select("vec_id").toPandas()["vec_id"]) == set(
        emb.select("vec_id").toPandas()["vec_id"]
    )
    # exactly-once: restarting with the same checkpoint must not duplicate
    stream2 = spark.readStream.schema(emb.schema).parquet(land)
    q2 = stream_index_ingest(
        stream2, assign=assign, out_path=out_path, checkpoint=ckpt,
        layout="cells",
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out_path).count() == emb.count()
    shutil.rmtree(ckpt, ignore_errors=True)


def test_session_stream_equals_batch_sessionize(spark):
    """The streaming session_window result must agree with an independent
    batch lag-gap sessionization of the same events (same gap, same
    merge-at-exact-gap boundary rule)."""
    from pyspark.sql import Window

    from pyvectorsearch_spark.queries.streaming import q_events_sessions_stream

    got = {
        (r.user_id, r.session_start, r.n_events)
        for r in q_events_sessions_stream(spark, SF_SMOKE).collect()
    }

    e = load_table(spark, SF_SMOKE, "events").filter(F.col("user_id") < 50)
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    sess = (
        e.withColumn("is_new", F.when(gap.isNull() | (gap > 1800.0), 1).otherwise(0))
        .withColumn(
            "sid",
            F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "sid")
        .agg(F.min("ts").alias("session_start"), F.count("*").alias("n_events"))
    )
    want = {
        (r.user_id, r.session_start, r.n_events) for r in sess.collect()
    }
    assert got == want


def test_stateful_running_counts_split_invariant(spark, tmp_path):
    """applyInPandasWithState totals must equal the batch aggregate no
    matter how rows are split into micro-batches."""
    from pyvectorsearch_spark.streaming.ingest import stateful_running_counts

    e = load_table(spark, SF_SMOKE, "events")
    want = {
        (r.user_id, r.n, round(r.s, 6))
        for r in e.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    for n_files in (1, 5):
        land = str(tmp_path / f"land{n_files}")
        e.repartition(n_files).write.parquet(land)
        stream = (
            spark.readStream.schema(e.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(land)
        )
        name = f"state_test_{n_files}"
        q = (
            stateful_running_counts(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r.user_id, r.n, round(r.s, 6))
            for r in spark.table(name)
            .groupBy("user_id")
            .agg(
                F.max("running_count").alias("n"),
                F.max_by("running_sum", "running_count").alias("s"),
            )
            .collect()
        }
        assert got == want, f"n_files={n_files}"


def test_dedup_stream_within_watermark(spark, event_landing):
    """`deduplicated_stream` with an event-time watermark uses the
    bounded-state `dropDuplicatesWithinWatermark` operator. With availableNow
    over a landing dir the watermark never passes mid-key here, so the result
    still equals exact distinct keys — while the plan carries the
    state-evicting operator (the 100 TB posture)."""
    from pyvectorsearch_spark.streaming.ingest import deduplicated_stream

    schema = spark.read.parquet(event_landing).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(event_landing)
    )
    # Watermark wider than the table's 30-day span: no row is late, no key
    # state evicts mid-run, so the result must equal exact distinct.
    out = deduplicated_stream(
        stream, ["user_id", "event_type"], event_time="ts", watermark="60 days"
    ).select("user_id", "event_type")
    q = _run_to_memory(out, "dedup_wm_stream", mode="append")
    try:
        got = spark.table("dedup_wm_stream").count()
        exact = (
            spark.read.parquet(event_landing)
            .select("user_id", "event_type")
            .distinct()
            .count()
        )
        assert got == exact
    finally:
        q.stop()


def test_stream_stream_interval_join_single_key_column(spark, event_landing):
    """The interval-join helper drops the right-side key: output exposes ONE
    `user_id`, and pairs equal the batch interval join."""
    from pyvectorsearch_spark.streaming.ingest import stream_stream_interval_join

    schema = spark.read.parquet(event_landing).schema
    def side(evt, ts_name):
        s = spark.readStream.schema(schema).parquet(event_landing)
        s = s.filter(F.col("event_type") == evt)
        return s.select(
            F.col("event_id").alias(f"{evt}_id"),
            "user_id",
            F.col("ts").alias(ts_name),
        )

    joined = stream_stream_interval_join(
        side("click", "ts"), side("purchase", "p_ts"),
        key_col="user_id", left_ts="ts", right_ts="p_ts",
        max_lag="30 minutes", watermark="2 hours",
    )
    assert [c for c in joined.columns].count("user_id") == 1
    q = _run_to_memory(joined, "ssij_stream", mode="append")
    try:
        got = spark.table("ssij_stream").count()
        b = spark.read.parquet(event_landing)
        c = b.filter(F.col("event_type") == "click").select(
            F.col("event_id").alias("click_id"), "user_id", "ts"
        )
        p = b.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("p_ts"),
        )
        exact = c.join(
            p,
            (c.user_id == p.p_user_id)
            & (p.p_ts >= c.ts)
            & (p.p_ts <= c.ts + F.expr("INTERVAL 30 MINUTES")),
        ).count()
        assert got == exact
    finally:
        q.stop()
