"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) — the
engine-level source extension point, demonstrated with a deterministic
synthetic vector generator.

Why this exists: the reference's only source is a hand-rolled CSV reader
(/root/reference/example_cpp/main.cpp:16-41). Spark's public Python
DataSource API is the idiomatic way to add a NEW format/source to this
engine without touching the JVM: implement ``DataSource`` +
``DataSourceReader``, register once per session, and every consumer uses
plain ``spark.read.format("vectorgen")`` with options.

Scale shape: the reader declares ``partitions()`` so Spark schedules one
task per partition — generation (or, for a real source, fetching) is
embarrassingly parallel and never bottlenecks on the driver. Rows are
yielded as tuples from each executor-side ``read(partition)``.

Determinism contract: every cell value derives from md5(seed:id:dim) via
the same 48-bit construction the sampling/dedup operators use, so a DuckDB
oracle can regenerate the identical table in SQL — the source itself is
hash-verifiable end to end.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

BUCKETS = 1_000_000  # value resolution: h mod 1e6 scaled to [0, 1)


class VectorGenSource(DataSource):
    """``spark.read.format("vectorgen").option("n", ...).option("dim", ...)
    .option("parts", ...).option("seed", ...)`` → deterministic vector table
    ``(vec_id bigint, embedding array<double>, label int)``."""

    @classmethod
    def name(cls) -> str:
        return "vectorgen"

    def schema(self) -> str:
        return "vec_id bigint, embedding array<double>, label int"

    def reader(self, schema) -> "VectorGenReader":
        return VectorGenReader(
            n=int(self.options.get("n", 1000)),
            dim=int(self.options.get("dim", 8)),
            parts=int(self.options.get("parts", 8)),
            seed=str(self.options.get("seed", "42")),
        )


class _Part(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class VectorGenReader(DataSourceReader):
    def __init__(self, n: int, dim: int, parts: int, seed: str):
        self.n, self.dim, self.parts, self.seed = n, dim, max(1, parts), seed

    def partitions(self):
        per = -(-self.n // self.parts)
        return [
            _Part(lo, min(lo + per, self.n))
            for lo in range(0, self.n, per)
        ]

    def read(self, partition: "_Part"):
        import hashlib

        def h48(key: str) -> int:
            return int(hashlib.md5(key.encode()).hexdigest()[:12], 16)

        for i in range(partition.start, partition.end):
            vec = [
                (h48(f"{self.seed}:{i}:{j}") % BUCKETS) / float(BUCKETS)
                for j in range(self.dim)
            ]
            label = h48(f"{self.seed}:{i}:label") % 10
            yield (i, vec, label)


def register(spark) -> None:
    """Idempotent session registration."""
    spark.dataSource.register(VectorGenSource)
