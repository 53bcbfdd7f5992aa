"""Streaming queries for the driver contract — each runs a REAL Structured
Streaming pipeline (file source → watermarked agg → availableNow → memory
sink) and returns the materialized result, so the DuckDB oracle checks the
streaming execution path itself, not a batch stand-in."""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyvectorsearch_spark.sources.tables import load_table
from pyvectorsearch_spark.streaming.ingest import windowed_event_counts


def q_events_hourly_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling-window counts per event_type, computed BY THE
    STREAMING ENGINE (watermark + window, availableNow drain). Equivalent to
    the batch ``events_hourly`` rollup; the oracle is plain SQL."""
    load_table(spark, sf_dir, "events")  # sets the nanosAsLong conf
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # file-source streaming wants a directory; glob-filter to the one table
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # parquet timestamps are ns → load_table truncates; mirror that here
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    out = windowed_event_counts(
        stream, window="1 hour", watermark="2 hours"
    )
    name = f"events_hourly_stream_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name).select(
        F.col("window_start").alias("hour"),
        "event_type",
        F.col("n_events").alias("n"),
        F.round("sum_value", 6).alias("total_value"),
    )


ORACLE_HOURLY_STREAM = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n, round(sum(value), 6) AS total_value
FROM events
GROUP BY 1, 2
"""

QUERIES = {"events_hourly_stream": q_events_hourly_stream}
ORACLES = {"events_hourly_stream": ORACLE_HOURLY_STREAM}
