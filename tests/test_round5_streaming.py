"""Round-5: streamed arrival OUTSIDE the pinned root box stays exact.

VERDICT r4 item 3: the reference grows its root incrementally when an
insert lands outside the current box (`grow_root_to_cover_point`,
/root/reference/include/pktree.hpp:841-929). The Spark restatement pins
geometry from the batch build and labels out-of-box points with the SAME
closed-form cell expression — coords simply go negative (or beyond the
in-box range); the point-to-cell bound math is closed-form in coords, so
search stays exact with no root surgery. This test plants streamed
outliers far outside the box and pins that (a) negative/oversized cells
actually appear, and (b) kNN and range over the ingested dataset exactly
match brute force, in BOTH candidate-selection modes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyvectorsearch_spark.index.grid import CELL_SEP, GridIndex
from pyvectorsearch_spark.operators.knn import knn_join, range_join
from pyvectorsearch_spark.streaming.ingest import stream_index_ingest

OUTLIERS = [
    (10_000, [-5.0, -3.0]),   # below the box in both dims -> negative coords
    (10_001, [10.0, 12.0]),   # above in both dims
    (10_002, [120.0, -40.0]),  # far out, mixed sign
    (10_003, [0.5, 9.0]),     # inside in x, outside in y
]


@pytest.fixture(scope="module")
def ingested_index(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("oob_ingest")
    # deterministic 15x15 in-box lattice on [0, 1]^2
    base = spark.createDataFrame(
        [(15 * i + j, [i / 14.0, j / 14.0]) for i in range(15) for j in range(15)],
        "vec_id long, p2 array<float>",
    )
    geom = GridIndex.build(base, vec_col="p2", id_col="vec_id", target_occupancy=8)

    landing = str(root / "landing")
    base.repartition(3).write.parquet(landing)
    spark.createDataFrame(OUTLIERS, "vec_id long, p2 array<float>").coalesce(
        1
    ).write.mode("append").parquet(landing)

    out, ck = str(root / "out"), str(root / "ck")
    schema = spark.read.parquet(landing).schema
    stream = spark.readStream.schema(schema).parquet(landing)
    assign = lambda df: df.withColumn(  # noqa: E731
        "cell",
        GridIndex._cell_expr(
            "p2", geom.origin, geom.width, geom.fine_level,
            geom.dim, geom.rr, geom.ratio, clamp=False,
        ),
    )
    q = stream_index_ingest(stream, assign=assign, out_path=out, checkpoint=ck)
    q.awaitTermination(300)

    ingested = spark.read.parquet(out)
    parts = F.split("cell", CELL_SEP)
    stats = (
        ingested.groupBy("cell")
        .agg(F.count("*").cast("long").alias("count"))
        .select(
            "cell",
            F.element_at(parts, 1).cast("int").alias("level"),
            F.slice(parts, 2, geom.dim).cast("array<long>").alias("coords"),
            "count",
        )
    )
    idx = GridIndex(
        df=ingested,
        stats_df=stats,
        origin=geom.origin,
        width=geom.width,
        dim=geom.dim,
        rank=geom.rank,
        rr=geom.rr,
        ratio=geom.ratio,
        fine_level=geom.fine_level,
        id_col="vec_id",
        vec_col="p2",
    )
    everything = spark.read.parquet(out).select("vec_id", "p2").cache()
    everything.count()
    return idx, everything


def _probes(spark):
    # probe AT each outlier plus one in-box point: nearest neighbors mix
    # out-of-box and in-box data, so pruning must bound both cell kinds
    rows = [(qid, vec) for qid, vec in enumerate(v for _, v in OUTLIERS)]
    rows.append((99, [0.5, 0.5]))
    return spark.createDataFrame(rows, "query_id long, qvec array<float>")


def test_outlier_cells_landed_negative_coords(ingested_index):
    idx, _ = ingested_index
    coords = [r["coords"] for r in idx.stats_df.collect()]
    assert any(min(c) < 0 for c in coords), "no negative-coord cell landed"
    n = idx.df.count()
    assert n == 15 * 15 + len(OUTLIERS)


@pytest.mark.parametrize("mode", ["driver", "distributed"])
def test_knn_exact_with_out_of_box_points(spark, ingested_index, mode):
    idx, everything = ingested_index
    probes = _probes(spark)
    got = idx.knn(probes, 4, candidates=mode).collect()
    exact = knn_join(
        everything, probes, 4, data_id="vec_id", data_vec="p2"
    ).collect()
    key = lambda rows: sorted(  # noqa: E731
        (r.query_id, r.neighbor_id, round(r.dist, 9)) for r in rows
    )
    assert key(got) == key(exact)
    # each outlier probe must find ITSELF at distance ~0 (it was ingested)
    self_hits = {
        r.query_id for r in got if r.rank == 1 and r.dist < 1e-9
    }
    assert {0, 1, 2, 3} <= self_hits


@pytest.mark.parametrize("mode", ["driver", "distributed"])
def test_range_exact_with_out_of_box_points(spark, ingested_index, mode):
    idx, everything = ingested_index
    probes = _probes(spark)
    # radius big enough that out-of-box probes reach in-box lattice points
    got = idx.range(probes, 15.0, candidates=mode).collect()
    exact = range_join(
        everything, probes, 15.0, data_id="vec_id", data_vec="p2"
    ).collect()
    key = lambda rows: sorted((r.query_id, r.neighbor_id) for r in rows)  # noqa: E731
    assert key(got) == key(exact)
    assert len(got) > 0
