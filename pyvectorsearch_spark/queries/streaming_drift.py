"""Streaming drift monitoring (outside the driver's pinned 50-entry window;
covered by tests/test_oracle_parity.py).

The continuous form of `events_psi_drift`: the STREAMING ENGINE builds the
per-(event_type, bucket) cohort histogram over a multi-batch event stream
(complete-mode stateful aggregate — the only state is groups x buckets
rows), and the batch-side `psi_from_histogram` fold turns the tiny result
into PSI. The oracle is the identical batch SQL, so the hash match verifies
the streaming execution end to end.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyvectorsearch_spark.operators.quality import psi_from_histogram
from pyvectorsearch_spark.queries.quality_extra import (
    ORACLE_EVENTS_PSI,
    PSI_BUCKET_W,
    PSI_BUCKETS,
    PSI_EPS,
    PSI_SPLIT_DAY,
)
from pyvectorsearch_spark.sources.tables import dataset_tag, load_table


def _events_landing(spark: SparkSession, sf_dir: str, n_files: int = 8) -> str:
    """Multi-file landing copy of events (snapshot-keyed, atomically
    published) so the file stream delivers real multi-batch arrival."""
    base = dataset_tag(sf_dir, "events")
    path = os.path.join(tempfile.gettempdir(), f"pvs_events_landing8_{base}")
    if not os.path.isdir(path):
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        load_table(spark, sf_dir, "events").repartition(n_files).write.parquet(tmp)
        try:
            os.rename(tmp, path)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.isdir(path):
                raise
    return path


def q_events_psi_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI drift computed from a STREAMED histogram: the stateful streaming
    aggregate holds only (event_type, bucket) cohort counts; the PSI fold
    runs on that drained result. Same parameters as `events_psi_drift`, so
    the batch oracle applies verbatim."""
    path = _events_landing(spark, sf_dir)
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    b = F.least(
        F.floor(F.col("value") / PSI_BUCKET_W).cast("int"), F.lit(PSI_BUCKETS - 1)
    )
    hist = (
        stream.select(
            "event_type",
            b.alias("_b"),
            (F.dayofmonth(F.col("ts").cast("timestamp")) >= PSI_SPLIT_DAY).alias(
                "_cur"
            ),
        )
        .groupBy("event_type", "_b")
        .agg(
            F.sum(F.when(~F.col("_cur"), 1).otherwise(0)).alias("_nb"),
            F.sum(F.when(F.col("_cur"), 1).otherwise(0)).alias("_nc"),
        )
    )
    name = f"events_psi_stream_{uuid.uuid4().hex[:8]}"
    q = (
        hist.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return psi_from_histogram(spark.table(name), by="event_type", eps=PSI_EPS).orderBy(
        "event_type"
    )


def q_events_hll_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user sketch built BY THE STREAMING ENGINE: the
    stateful complete-mode aggregate holds exactly the mergeable HLL state
    (per-(event_type, register) rank maxima — m rows/group, the textbook
    bounded-state streaming distinct), drained after the multi-batch
    arrival; the estimate fold runs on the drained registers. Same
    hash/register/estimator ladder as `sketch_hll_users`, so a batch SQL
    oracle verifies the streamed sketch bit-for-bit."""
    import uuid as _uuid

    from pyvectorsearch_spark.operators.sketches import hll_fold, hll_registers

    path = _events_landing(spark, sf_dir)
    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    # the SAME operator as the batch sketch (select + groupBy/agg only, so
    # it runs unchanged on a streaming DataFrame) — streamed and batch
    # register state cannot drift apart
    reg = hll_registers(stream, by="event_type", value_col="user_id")
    name = f"events_hll_stream_{_uuid.uuid4().hex[:8]}"
    q = (
        reg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return hll_fold(spark.table(name), by="event_type").orderBy("event_type")


def _hll_stream_oracle() -> str:
    from pyvectorsearch_spark.operators.sketches import duckdb_hll_sql

    inner = duckdb_hll_sql("events", "event_type", "user_id")
    return f"""
WITH u AS ({inner})
SELECT grp AS event_type, hll_estimate, n_empty_registers, harmonic_scaled
FROM u ORDER BY event_type
"""


ORACLE_EVENTS_HLL_STREAM = _hll_stream_oracle()


QUERIES = {"events_psi_stream": q_events_psi_stream,
           "events_hll_stream": q_events_hll_stream}
ORACLES = {"events_psi_stream": ORACLE_EVENTS_PSI,
           "events_hll_stream": ORACLE_EVENTS_HLL_STREAM}
