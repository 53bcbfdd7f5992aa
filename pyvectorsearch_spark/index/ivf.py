"""IVF (inverted-file) index — the ANN scale path for high-dimensional
vectors, where the reference's grid decomposition degenerates (at dim ≫ 8 a
rectangular grid puts all points in one cell or one point per cell; the
PK-tree was built for low-dim spatial data like the 2-d cities example).

Spark-first design:

- **Coarse quantizer**: deterministic k-means (seeded, fixed iterations) on a
  deterministic sample collected to the driver — at 100 TB the sample is
  ``sample_per_list · n_lists`` rows regardless of corpus size.
- **Assignment**: centroids broadcast; each row's nearest-centroid id is
  computed in one Arrow-batched numpy pass (``mapInPandas``, BLAS matmul) —
  a single map-side projection, no shuffle.
- **Search**: per query, probe the ``nprobe`` nearest centroid lists: a
  filter on ``list_id`` (partition/file pruning once the index is persisted
  ``partitionBy("list_id")``), then exact distances + window top-k on the
  shortlist. nprobe trades recall for scan fraction; ``nprobe = n_lists``
  is exhaustive (exact).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _kmeans(sample: np.ndarray, n_lists: int, iters: int, seed: int) -> np.ndarray:
    """Seeded Lloyd iterations; empty clusters re-seeded deterministically."""
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(sample), size=n_lists, replace=False)
    cent = sample[idx].copy()
    for _ in range(iters):
        d2 = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(n_lists):
            members = sample[assign == j]
            if len(members):
                cent[j] = members.mean(axis=0)
            else:
                cent[j] = sample[rng.randint(len(sample))]
    return cent


@dataclass
class IVFIndex:
    df: DataFrame  # source rows + list_id
    centroids: np.ndarray  # (n_lists, dim)
    id_col: str
    vec_col: str
    # The k-means training sample, kept ONLY on freshly-built indexes (not
    # persisted/loaded) so stacked quantizers (IVF-PQ) can train on the same
    # rows without re-running the count + stride-sample jobs.
    train_sample: np.ndarray | None = None

    @staticmethod
    def build(
        df: DataFrame,
        *,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        n_lists: int = 16,
        sample_per_list: int = 64,
        iters: int = 10,
        seed: int = 42,
    ) -> "IVFIndex":
        # Deterministic partition-head sample (same pattern as
        # ``operators.dedup.angular_bucket_model``): take the first
        # ceil(target / n_parts) rows of every partition — one map-side job,
        # no count, no full scan (tasks stop after their head slice), and
        # every partition contributes equally so the sample is not skewed
        # toward any one partition's id range.
        target = n_lists * sample_per_list
        n_parts = df.rdd.getNumPartitions()
        per_part = max(1, -(-target // max(n_parts, 1)))
        vec_type = dict(df.dtypes)[vec_col]

        def head_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            left = per_part
            for pdf in batches:
                if left <= 0 or not len(pdf):
                    break
                take = pdf.iloc[:left]
                left -= len(take)
                yield take

        sample_rows = (
            df.select(F.col(vec_col).alias("_v"))
            .mapInPandas(head_sample, schema=f"_v {vec_type}")
            .limit(target)
            .collect()
        )
        sample = np.asarray([list(r[0]) for r in sample_rows], dtype=np.float64)
        if not len(sample):
            raise ValueError("IVFIndex.build: empty input")
        n_lists = min(n_lists, len(sample))
        cent = _kmeans(sample, n_lists, iters, seed)

        sc = df.sparkSession.sparkContext
        bc = sc.broadcast(cent)

        def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            C = bc.value  # (L, d)
            c2 = (C * C).sum(axis=1)
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
                d2 = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ C.T) + c2[None, :]
                pdf = pdf.drop(columns=["_v"])
                pdf["list_id"] = d2.argmin(axis=1).astype("int32")
                yield pdf

        cols = [c for c in df.columns]
        with_v = df.withColumn("_v", F.col(vec_col))
        schema = ", ".join(f"{name} {dtype}" for name, dtype in df.dtypes) + ", list_id int"
        assigned = with_v.select(*cols, "_v").mapInPandas(assign, schema=schema)
        return IVFIndex(
            df=assigned,
            centroids=cent,
            id_col=id_col,
            vec_col=vec_col,
            train_sample=sample,
        )

    def knn(
        self,
        queries: DataFrame,
        k: int,
        *,
        nprobe: int = 4,
        query_id: str = "query_id",
        query_vec: str = "qvec",
        candidates: str = "driver",
    ) -> DataFrame:
        """Top-k by L2 over each query's ``nprobe`` nearest lists. Exact iff
        nprobe == n_lists; otherwise approximate with recall rising in nprobe
        (tested ≥0.9 at nprobe=L/4 on the fixture).

        ``candidates="driver"`` collects the probe set and prunes with one
        ``isin`` filter over the UNION of all probes' lists (right for a
        handful of probes — minimum plan depth, partition pruning on the
        persisted index). ``candidates="distributed"`` never collects the
        queries: each query's nprobe lists are picked by a window over the
        broadcast centroid table and the data join carries (query, list)
        pairs — the path for a query TABLE of 10⁴+ probes. At partial nprobe
        the distributed form is per-query-strict (a query only sees its OWN
        lists, not the union), which is canonical IVF semantics."""
        if candidates not in ("driver", "distributed"):
            raise ValueError(f"unknown candidates mode {candidates!r}")
        if candidates == "distributed":
            return self._knn_distributed(queries, k, nprobe, query_id, query_vec)
        q_rows = queries.select(query_id, query_vec).collect()
        Q = np.asarray([list(r[1]) for r in q_rows], dtype=np.float64)
        d2 = ((Q[:, None, :] - self.centroids[None, :, :]) ** 2).sum(axis=2)
        lists = set()
        for row in d2:
            lists.update(np.argsort(row, kind="stable")[:nprobe].tolist())

        from pyvectorsearch_spark.operators.knn import knn_join

        pruned = self.df.filter(F.col("list_id").isin([int(x) for x in lists]))
        return knn_join(
            pruned,
            queries,
            k,
            data_id=self.id_col,
            data_vec=self.vec_col,
            query_id=query_id,
            query_vec=query_vec,
        )

    def _knn_distributed(
        self,
        queries: DataFrame,
        k: int,
        nprobe: int,
        query_id: str,
        query_vec: str,
    ) -> DataFrame:
        """Distributed candidate selection: queries × broadcast centroids →
        per-query nprobe nearest lists (window) → join the inverted lists on
        ``list_id`` (dynamic partition pruning on a persisted index) → exact
        distance + per-query top-k. No ``collect()`` anywhere; scales in the
        number of probes."""
        from pyspark.sql import Window
        from pyvectorsearch_spark.functions.vector import l2_sq

        spark = self.df.sparkSession
        cent = spark.createDataFrame(
            [(int(i), [float(x) for x in c]) for i, c in enumerate(self.centroids)],
            "list_id int, _centroid array<double>",
        )
        # Hash-partition queries on the id first: the |Q|·|lists| distance
        # expressions spread across every core (not the query table's few
        # source partitions) and the per-query window reuses the exchange.
        qs = queries.select(
            F.col(query_id).alias("_qid"), F.col(query_vec).alias("_qvec")
        ).repartition(spark.sparkContext.defaultParallelism, "_qid")
        w_sel = Window.partitionBy("_qid").orderBy(
            F.col("_cd2").asc(), F.col("list_id").asc()
        )
        sel = (
            qs.crossJoin(F.broadcast(cent))
            .withColumn("_cd2", l2_sq(F.col("_qvec"), F.col("_centroid")))
            .withColumn("_rn", F.row_number().over(w_sel))
            .filter(F.col("_rn") <= nprobe)
            .select("_qid", "list_id", "_qvec")
        )
        d = self.df.select(
            "list_id",
            F.col(self.id_col).alias("neighbor_id"),
            F.col(self.vec_col).alias("_dvec"),
        )
        w = Window.partitionBy("_qid").orderBy(
            F.col("dist").asc(), F.col("neighbor_id").asc()
        )
        return (
            d.join(sel, "list_id")
            .withColumn("dist", l2_sq(F.col("_dvec"), F.col("_qvec")))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col("_qid").alias("query_id"), "neighbor_id", "dist", "rank")
        )

    def write(
        self,
        path: str,
        mode: str = "overwrite",
        *,
        partition_rows_threshold: int = 100_000,
        target_file_rows: int = 4_000_000,
    ) -> None:
        """Persist parquet + centroid table. Like ``GridIndex.write``: big
        lists get directory partitioning (partition pruning on ``list_id``);
        small lists get few cell-sorted files (row-group stats pruning) to
        avoid per-list directory sprawl."""
        n = self.df.count()
        n_lists = max(len(self.centroids), 1)
        if n and n / n_lists >= partition_rows_threshold:
            self.df.repartition("list_id").write.mode(mode).partitionBy(
                "list_id"
            ).parquet(f"{path}/data")
        else:
            files = max(1, math.ceil(n / max(target_file_rows, 1)))
            (
                self.df.repartitionByRange(files, "list_id")
                .sortWithinPartitions("list_id")
                .write.mode(mode)
                .parquet(f"{path}/data")
            )
        spark = self.df.sparkSession
        rows = [(i, [float(x) for x in c]) for i, c in enumerate(self.centroids)]
        spark.createDataFrame(rows, "list_id int, centroid array<double>").coalesce(
            1
        ).write.mode(mode).parquet(f"{path}/centroids")
        meta = [(self.id_col, self.vec_col)]
        spark.createDataFrame(meta, "id_col string, vec_col string").coalesce(
            1
        ).write.mode(mode).parquet(f"{path}/meta")

    @staticmethod
    def load(spark, path: str) -> "IVFIndex":
        data = spark.read.parquet(f"{path}/data")
        # centroids/meta are tens of tiny rows: read them driver-side when
        # local instead of paying two Spark jobs per query invocation
        # (r10 optimization round; see read_small_sidecar)
        from pyvectorsearch_spark.index.cache import read_small_sidecar

        cent_rows = read_small_sidecar(f"{path}/centroids")
        if cent_rows is None:
            cent_rows = [
                r.asDict()
                for r in spark.read.parquet(f"{path}/centroids").collect()
            ]
        cent_rows = sorted(cent_rows, key=lambda r: r["list_id"])
        cent = np.asarray([list(r["centroid"]) for r in cent_rows])
        meta_rows = read_small_sidecar(f"{path}/meta")
        meta = (
            meta_rows[0]
            if meta_rows
            else spark.read.parquet(f"{path}/meta").first()
        )
        return IVFIndex(df=data, centroids=cent, id_col=meta["id_col"], vec_col=meta["vec_col"])
