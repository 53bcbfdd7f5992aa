"""asof_join semantics on handcrafted rows: backward/forward, strict,
keyed matching, and left rows with no match."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyvectorsearch_spark.operators.temporal import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "a", 5), (4, "b", 15), (5, "c", 7)],
        "lid long, k string, ts long",
    )
    right = spark.createDataFrame(
        [(100, "a", 10), (101, "a", 12), (102, "b", 15), (103, "b", 1)],
        "rid long, k string, ts long",
    )
    return left, right


def test_backward_default(spark):
    left, right = _frames(spark)
    out = {
        r.lid: r.rid_right
        for r in asof_join(left, right, on="ts", by="k", right_cols=["rid"]).collect()
    }
    assert out == {1: 100, 2: 101, 3: None, 4: 102, 5: None}


def test_backward_strict_excludes_equal(spark):
    left, right = _frames(spark)
    out = {
        r.lid: r.rid_right
        for r in asof_join(
            left, right, on="ts", by="k", right_cols=["rid"], strict=True
        ).collect()
    }
    assert out == {1: None, 2: 101, 3: None, 4: 103, 5: None}


def test_forward(spark):
    left, right = _frames(spark)
    out = {
        r.lid: r.rid_right
        for r in asof_join(
            left, right, on="ts", by="k", right_cols=["rid"], direction="forward"
        ).collect()
    }
    # smallest right.ts >= left.ts per key
    assert out == {1: 100, 2: None, 3: 100, 4: 102, 5: None}


def test_matches_duckdb_asof(spark, duck):
    """Parity with DuckDB's native ASOF LEFT JOIN on the events table."""
    from pyspark.sql import functions as F

    from pyvectorsearch_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"), "value"
    )
    got = asof_join(
        left, right, on="ts", by="user_id", right_cols=["click_id", "value"]
    ).collect()
    g = sorted((r.event_id, r.click_id_right, r.value_right) for r in got)

    duck.execute(
        f"CREATE OR REPLACE VIEW events AS SELECT * FROM '{SF_SMOKE}/events.parquet'"
    )
    exp = duck.sql(
        """
        SELECT l.event_id, r.event_id AS click_id, r.value
        FROM (SELECT * FROM events WHERE event_type='purchase') l
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type='click') r
          ON l.user_id = r.user_id AND l.ts >= r.ts
        """
    ).fetchall()
    e = sorted((a, b, c) for a, b, c in exp)
    assert g == e and len(g) > 0


def test_interval_join_boundaries_and_bucket_seam(spark):
    """Inclusive bounds on both ends; matches must survive bucket-boundary
    crossings (interval spanning multiple buckets, point at bucket edge)."""
    from pyvectorsearch_spark.operators.temporal import interval_join

    points = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"),   # == interval start → match
         (2, "2024-01-08 00:00:00"),   # == interval end → match
         (3, "2024-01-08 00:00:01"),   # 1s past end → no match
         (4, "2024-01-04 12:00:00"),   # middle, different bucket than start
         (5, "2023-12-31 23:59:59")],  # before start → no match
        "pid long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    intervals = spark.createDataFrame(
        [(100, "2024-01-01 00:00:00", "2024-01-08 00:00:00")],
        "iid long, start string, end string",
    ).withColumn("start", F.col("start").cast("timestamp")) \
     .withColumn("end", F.col("end").cast("timestamp"))

    # tiny bucket (1 day) forces the interval across 8 buckets
    got = {
        r.pid
        for r in interval_join(
            points, intervals, bucket_seconds=86400.0
        ).collect()
    }
    assert got == {1, 2, 4}

    # exactly-one output row per (point, interval) pair despite the explode
    rows = interval_join(points, intervals, bucket_seconds=86400.0).count()
    assert rows == 3


def test_keyless_requires_opt_in(spark):
    """Keyless as-of funnels everything through one task — it must be an
    explicit choice, never a default."""
    import pytest

    left, right = _frames(spark)
    with pytest.raises(ValueError, match="single task"):
        asof_join(left, right, on="ts", right_cols=["rid"])
    # explicit opt-in works and matches the keyed result collapsed to one key
    out = {
        r.lid: r.rid_right
        for r in asof_join(
            left.filter("k = 'a'"), right.filter("k = 'a'"),
            on="ts", right_cols=["rid"], allow_single_partition=True,
        ).collect()
    }
    keyed = {
        r.lid: r.rid_right
        for r in asof_join(
            left.filter("k = 'a'"), right.filter("k = 'a'"),
            on="ts", by="k", right_cols=["rid"],
        ).collect()
    }
    assert out == keyed


def test_keyed_asof_has_no_single_partition_exchange(spark):
    """The keyed path must hash-partition the window on the key: no
    SinglePartition exchange anywhere in the plan."""
    left, right = _frames(spark)
    from pyvectorsearch_spark.plans import explain_str

    df = asof_join(left, right, on="ts", by="k", right_cols=["rid"])
    s = explain_str(df)
    assert "SinglePartition" not in s, s[:3000]
    assert "hashpartitioning(k" in s, s[:3000]
