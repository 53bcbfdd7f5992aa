"""Table sources.

The driver materializes deterministic TPC-H-ish parquet under
``/root/testdata/sf{0.001,0.01,0.1}/`` (see TESTDATA.md). The reference's only
source is a CSV scan (``/root/reference/example_cpp/main.cpp:16-41``); the
Spark equivalent is ``spark.read.csv`` with an explicit schema — no
``inferSchema`` in production paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Schema of the reference's dutch_cities.csv
# (/root/reference/example_cpp/dutch_cities.csv:1 header; the example consumes
# only city/lat/lng, main.cpp:30-36).
CITIES_SCHEMA = T.StructType(
    [
        T.StructField("city", T.StringType()),
        T.StructField("lat", T.FloatType()),
        T.StructField("lng", T.FloatType()),
        T.StructField("country", T.StringType()),
        T.StructField("iso2", T.StringType()),
        T.StructField("admin_name", T.StringType()),
        T.StructField("capital", T.StringType()),
        T.StructField("population", T.LongType()),
        T.StructField("population_proper", T.LongType()),
    ]
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan — Catalyst pushes filters/column pruning into it.

    Timestamp normalization (both shapes exist across driver generations):
    - nanosecond parquet timestamps, which Spark rejects
      (``illegalParquetTypeError``): read as raw int64 (``nanosAsLong``) and
      truncate to microseconds with integer division — the same truncation
      DuckDB applies, and no double round-trip (an ns epoch exceeds 2^53, so
      float division would corrupt low-order digits);
    - microsecond timestamps with ``isAdjustedToUTC=false``, which Spark
      reads as TIMESTAMP_NTZ: cast to TIMESTAMP (LTZ). NTZ supports neither
      watermarks nor numeric casts, and the cast is wall-clock-exact because
      the session timezone is pinned to UTC here (the DuckDB oracle side is
      timezone-naive, so UTC is also what makes comparisons bit-stable in a
      driver-built session that didn't set it).

    PUBLIC-API NOTE — session mutation: the NTZ→LTZ cast is only correct
    under a UTC session timezone, so if the session is NOT already UTC this
    function pins ``spark.sql.session.timeZone = UTC`` (with a warning) for
    the rest of the session. Sessions from ``session.get_spark`` are built
    UTC and are never touched. Callers that need a different display
    timezone should render with ``from_utc_timestamp`` rather than a
    non-UTC session zone.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        import warnings

        warnings.warn(
            "load_table: pinning spark.sql.session.timeZone=UTC for "
            "oracle-exact timestamp semantics (was "
            f"{spark.conf.get('spark.sql.session.timeZone')!r})",
            stacklevel=2,
        )
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    dtypes = dict(df.dtypes)
    if name == "events" and dtypes.get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if ntz:
        from pyspark.sql import functions as F

        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})
    return df


def dataset_tag(sf_dir: str, name: str) -> str:
    """Cache-key component identifying a driver table SNAPSHOT: basename +
    source mtime. Any /tmp artifact derived from driver data (landing
    copies, index builds, bucketing models) must key on this, not the
    basename alone — the driver regenerates testdata in place between
    rounds, and a basename-only key silently serves stale derived data."""
    import os

    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    try:
        mtime = int(os.path.getmtime(path))
    except OSError:
        mtime = 0
    return f"{os.path.basename(sf_dir.rstrip('/'))}_{mtime}"


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition a scan UP to the session's parallelism when the source
    files under-split (a handful of small parquet files → 1-2 input
    partitions → CPU-heavy map work runs on one core). No-op when the scan
    already has enough partitions — at production scale the input is
    thousands of files and this never shuffles."""
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register each table as a temp view so operators can be written in SQL."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def load_cities_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV scan analog of the reference example's ``read_cities``
    (``/root/reference/example_cpp/main.cpp:16-41``): header-skipping read with
    a declared schema; the lat/lng pair is the 2-d index point."""
    return spark.read.csv(path, header=True, schema=CITIES_SCHEMA)
