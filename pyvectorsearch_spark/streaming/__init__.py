from pyvectorsearch_spark.streaming import ingest  # noqa: F401
