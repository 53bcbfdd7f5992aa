"""Round-10 wave-2 queries (registered AFTER the driver's pinned window).

Sharded-corpus containers + GIF, all ORACLE-CHECKED:

- ``shards_tar_roundtrip``: documents -> deterministic WebDataset tar
  shards -> unpack -> per-doc byte length + md5.  The oracle computes
  the same digests straight from ``documents`` — DuckDB never sees a
  tar byte, so any framing/encoding bug in the pack/unpack path flips
  the value hash.
- ``text_warc_wet_ingest``: documents -> WET-style multi-member-gzip
  WARC shards -> header-driven record parse -> per-shard aggregates.
- ``shards_zip_roundtrip``: documents -> DEFLATE zip shards -> unpack
  -> global integrity aggregate.
- ``multimodal_gif_pixelsum``: deterministic indexed frames -> real
  GIF89a encode (LZW, interlace on odd media) -> real decode -> pixel
  sums; the oracle recomputes the sums from the generator's closed-form
  palette/index arithmetic alone (same pattern as
  ``multimodal_avi_pixelsum``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_N_SHARDS = 8

#: GIF generator spec shared by the Spark side and the SQL oracle below —
#: any drift between them is a test bug: n=24 media, seed=11,
#: w = 8+(i%3)*4, h = 8+((i+1)%2)*4, nf = 1+(i%4),
#: idx(x,y,fi) = (x*7 + y*13 + fi*3 + i*5) % 16,
#: pal[j] = ((j*31+seed)%256, (j*59+seed)%256, (j*83+seed)%256).
_GIF_N = 24
_GIF_SEED = 11


def q_shards_tar_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebDataset tar shard pack -> unpack roundtrip, per-doc digest."""
    from pyvectorsearch_spark.operators.shards import (
        pack_tar_shards,
        unpack_tar_shards,
    )
    from pyvectorsearch_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    shards = pack_tar_shards(docs, n_shards=_N_SHARDS)
    members = unpack_tar_shards(shards)
    return members.select(
        F.split(F.col("member_name"), r"\.")
        .getItem(0)
        .cast("bigint")
        .alias("doc_id"),
        F.length("payload").cast("bigint").alias("n_bytes"),
        F.md5("payload").alias("digest"),
    )


ORACLE_SHARDS_TAR_ROUNDTRIP = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS digest
FROM documents
"""


def q_text_warc_wet_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WET (multi-member gzip WARC) pack -> record parse -> per-shard
    aggregate: record count, payload bytes from the Content-Length
    HEADERS (not the payload — a mis-framed parse diverges), id range."""
    from pyvectorsearch_spark.operators.shards import (
        pack_wet_shards,
        unpack_wet_shards,
    )
    from pyvectorsearch_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    shards = pack_wet_shards(docs, n_shards=_N_SHARDS)
    records = unpack_wet_shards(shards)
    per_doc = records.select(
        F.regexp_extract("target_uri", r"(\d+)$", 1)
        .cast("bigint")
        .alias("doc_id"),
        F.col("content_length"),
    )
    return (
        per_doc.groupBy(
            (F.col("doc_id") % _N_SHARDS).alias("shard_id")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_records"),
            F.sum("content_length").cast("bigint").alias("total_bytes"),
            F.min("doc_id").cast("bigint").alias("min_doc_id"),
            F.max("doc_id").cast("bigint").alias("max_doc_id"),
        )
    )


ORACLE_TEXT_WARC_WET_INGEST = f"""
SELECT CAST(doc_id % {_N_SHARDS} AS BIGINT) AS shard_id,
       CAST(count(*) AS BIGINT) AS n_records,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(min(doc_id) AS BIGINT) AS min_doc_id,
       CAST(max(doc_id) AS BIGINT) AS max_doc_id
FROM documents
GROUP BY doc_id % {_N_SHARDS}
"""


def q_shards_zip_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEFLATE zip shard pack -> unpack -> one-row global integrity
    aggregate (member count, payload bytes, distinct digests)."""
    from pyvectorsearch_spark.operators.shards import (
        pack_zip_shards,
        unpack_zip_shards,
    )
    from pyvectorsearch_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    shards = pack_zip_shards(docs, n_shards=_N_SHARDS)
    members = unpack_zip_shards(shards)
    return members.agg(
        F.count("*").cast("bigint").alias("n_members"),
        F.sum(F.length("payload")).cast("bigint").alias("total_bytes"),
        F.countDistinct(F.md5("payload")).cast("bigint").alias("n_digests"),
    )


ORACLE_SHARDS_ZIP_ROUNDTRIP = """
SELECT CAST(count(*) AS BIGINT) AS n_members,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_digests
FROM documents
"""


def _synthetic_media_gif(spark: SparkSession) -> DataFrame:
    """n=_GIF_N deterministic GIF blobs per the module-constant spec;
    odd media are written interlaced (same pixels, different wire
    layout) so the de-interlace path is inside the oracle check."""
    from typing import Iterator

    import pandas as pd

    from pyvectorsearch_spark.operators.gif import encode_gif

    ids = spark.range(_GIF_N).select(F.col("id").alias("media_id"))

    def build(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        pal = [
            (
                (j * 31 + _GIF_SEED) % 256,
                (j * 59 + _GIF_SEED) % 256,
                (j * 83 + _GIF_SEED) % 256,
            )
            for j in range(16)
        ]
        for pdf in batches:
            blobs = []
            for mid in pdf["media_id"]:
                i = int(mid)
                w = 8 + (i % 3) * 4
                h = 8 + ((i + 1) % 2) * 4
                nf = 1 + (i % 4)
                frames = [
                    bytes(
                        (x * 7 + y * 13 + fi * 3 + i * 5) % 16
                        for y in range(h)
                        for x in range(w)
                    )
                    for fi in range(nf)
                ]
                blobs.append(
                    encode_gif(w, h, frames, pal, interlace=bool(i % 2))
                )
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "blob": blobs}
            )

    return ids.mapInPandas(build, schema="media_id bigint, blob binary")


def q_multimodal_gif_pixelsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode real GIF89a blobs (LZW + interlace + multi-frame) and sum
    every decoded RGB byte per media; the oracle recomputes the sums
    from the generator arithmetic alone (module constants)."""
    from typing import Iterator

    import pandas as pd

    from pyvectorsearch_spark.operators.gif import parse_gif

    media = _synthetic_media_gif(spark)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            mids, nfs, sums = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                w, h, frames = parse_gif(bytes(blob))
                mids.append(int(mid))
                nfs.append(len(frames))
                sums.append(sum(sum(f) for f in frames))
            yield pd.DataFrame(
                {"media_id": mids, "n_frames": nfs, "pixel_sum": sums}
            )

    return media.mapInPandas(
        run, schema="media_id bigint, n_frames bigint, pixel_sum bigint"
    )


ORACLE_MULTIMODAL_GIF_PIXELSUM = f"""
WITH m AS (
  SELECT i,
         8 + (i % 3) * 4 AS w,
         8 + ((i + 1) % 2) * 4 AS h,
         1 + (i % 4) AS nf
  FROM generate_series(0, {_GIF_N - 1}) AS t(i)
), px AS (
  SELECT m.i, m.nf,
         ((x * 7 + y * 13 + fi * 3 + m.i * 5) % 16) AS j
  FROM m
  JOIN generate_series(0, 3) AS fs(fi) ON fi < m.nf
  JOIN generate_series(0, 15) AS ys(y) ON y < m.h
  JOIN generate_series(0, 15) AS xs(x) ON x < m.w
), rgb AS (
  SELECT i, nf,
         ((j * 31 + {_GIF_SEED}) % 256)
         + ((j * 59 + {_GIF_SEED}) % 256)
         + ((j * 83 + {_GIF_SEED}) % 256) AS v
  FROM px
)
SELECT CAST(i AS BIGINT) AS media_id,
       CAST(max(nf) AS BIGINT) AS n_frames,
       CAST(sum(v) AS BIGINT) AS pixel_sum
FROM rgb
GROUP BY i
"""


def q_shards_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streamed WebDataset ingest, ORACLE-CHECKED: tar shard FILES land
    in a directory and arrive as micro-batches through Spark's
    ``binaryFile`` streaming source (``maxFilesPerTrigger=1`` — one
    shard per batch, 12 batches); each batch is unpacked in-stream by
    the same shuffle-free ``mapInPandas`` stage as the batch path, and
    the STREAMING ENGINE maintains per-group doc counts / byte totals /
    id ranges in complete mode.  DuckDB recomputes the aggregates from
    ``documents`` directly — a mis-framed tar member or a dropped
    micro-batch flips counts, sums, or ranges.

    Scale shape: this is the arrival path of a real corpus (shards
    landing on shared storage, unpacked as they arrive); per-batch work
    is one shard blob per task, no shuffle until the final keyed agg."""
    import os
    import uuid

    from pyvectorsearch_spark.operators.shards import (
        pack_shards_to_files,
        unpack_tar_shards,
    )
    from pyvectorsearch_spark.sources.tables import dataset_tag, load_table

    import tempfile

    base = dataset_tag(sf_dir, "documents")
    landing = os.path.join(
        tempfile.gettempdir(), f"pvs_shard_stream_landing_{base}"
    )
    if not os.path.isdir(landing):
        tmp = f"{landing}.tmp-{uuid.uuid4().hex[:8]}"
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        pack_shards_to_files(docs, tmp, fmt="tar", n_shards=12).collect()
        try:
            os.rename(tmp, landing)
        except OSError:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.isdir(landing):
                raise
    schema = spark.read.format("binaryFile").load(landing).schema
    stream = (
        spark.readStream.format("binaryFile")
        .schema(schema)
        .option("pathGlobFilter", "*.tar")
        .option("maxFilesPerTrigger", "1")
        .load(landing)
        .select(F.col("content").alias("blob"))
    )
    members = unpack_tar_shards(stream)
    agg = (
        members.select(
            F.split(F.col("member_name"), r"\.")
            .getItem(0)
            .cast("bigint")
            .alias("doc_id"),
            F.length("payload").cast("bigint").alias("n_bytes"),
        )
        .groupBy((F.col("doc_id") % 4).alias("group_id"))
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
            F.min("doc_id").cast("bigint").alias("min_doc_id"),
            F.max("doc_id").cast("bigint").alias("max_doc_id"),
        )
    )
    name = f"shards_stream_ingest_{uuid.uuid4().hex[:8]}"
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
            "availableNow drain exceeded 300 s; the memory sink would "
            "be partial — failing loud instead"
        )
    return spark.table(name)


ORACLE_SHARDS_STREAM_INGEST = """
SELECT CAST(doc_id % 4 AS BIGINT) AS group_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(min(doc_id) AS BIGINT) AS min_doc_id,
       CAST(max(doc_id) AS BIGINT) AS max_doc_id
FROM documents
GROUP BY doc_id % 4
"""



def q_shards_media_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal WebDataset roundtrip, ORACLE-CHECKED: GIF media blobs
    plus a JSON metadata member per sample ({id}.gif + {id}.json, the
    WebDataset multi-file-sample convention) pack into tar shards as
    RAW BYTES, unpack, and the gif members decode through the LZW codec
    to per-media pixel sums while the json members are parsed and
    counted.  The oracle recomputes the pixel sums from the generator
    arithmetic (same spec as ``multimodal_gif_pixelsum``) — a corrupted
    binary member, a text-mangled payload, or a lost/mispaired sample
    file all flip the hash."""
    from typing import Iterator

    import json

    import pandas as pd

    from pyvectorsearch_spark.operators.gif import parse_gif
    from pyvectorsearch_spark.operators.shards import (
        pack_tar_shards,
        unpack_tar_shards,
    )

    media = _synthetic_media_gif(spark).withColumn(
        "meta",
        F.to_json(F.struct(F.col("media_id").alias("id"))),
    )
    shards = pack_tar_shards(
        media, n_shards=4, id_col="media_id",
        member_cols={"gif": "blob", "json": "meta"},
    )
    members = unpack_tar_shards(shards)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            mids, nfs, sums, njs = [], [], [], []
            for name, payload in zip(pdf["member_name"], pdf["payload"]):
                key, suffix = name.rsplit(".", 1)
                mid = int(key)
                b = bytes(payload)
                if suffix == "gif":
                    _, _, frames = parse_gif(b)
                    mids.append(mid)
                    nfs.append(len(frames))
                    sums.append(sum(sum(f) for f in frames))
                    njs.append(0)
                else:
                    assert json.loads(b.decode()) == {"id": mid}
                    mids.append(mid)
                    nfs.append(0)
                    sums.append(0)
                    njs.append(1)
            yield pd.DataFrame(
                {
                    "media_id": mids, "n_frames": nfs,
                    "pixel_sum": sums, "n_json": njs,
                }
            )

    per_member = members.mapInPandas(
        run,
        schema="media_id bigint, n_frames bigint, "
               "pixel_sum bigint, n_json bigint",
    )
    return per_member.groupBy("media_id").agg(
        F.sum("n_frames").cast("bigint").alias("n_frames"),
        F.sum("pixel_sum").cast("bigint").alias("pixel_sum"),
        F.sum("n_json").cast("bigint").alias("n_json"),
    )


ORACLE_SHARDS_MEDIA_ROUNDTRIP = f"""
WITH m AS (
  SELECT i,
         8 + (i % 3) * 4 AS w,
         8 + ((i + 1) % 2) * 4 AS h,
         1 + (i % 4) AS nf
  FROM generate_series(0, {_GIF_N - 1}) AS t(i)
), px AS (
  SELECT m.i, m.nf,
         ((x * 7 + y * 13 + fi * 3 + m.i * 5) % 16) AS j
  FROM m
  JOIN generate_series(0, 3) AS fs(fi) ON fi < m.nf
  JOIN generate_series(0, 15) AS ys(y) ON y < m.h
  JOIN generate_series(0, 15) AS xs(x) ON x < m.w
), rgb AS (
  SELECT i, nf,
         ((j * 31 + {_GIF_SEED}) % 256)
         + ((j * 59 + {_GIF_SEED}) % 256)
         + ((j * 83 + {_GIF_SEED}) % 256) AS v
  FROM px
)
SELECT CAST(i AS BIGINT) AS media_id,
       CAST(max(nf) AS BIGINT) AS n_frames,
       CAST(sum(v) AS BIGINT) AS pixel_sum,
       CAST(1 AS BIGINT) AS n_json
FROM rgb
GROUP BY i
"""



def q_shards_jsonl_gz_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``.jsonl.gz`` shard roundtrip (the C4/Pile text-corpus layout),
    ORACLE-CHECKED per doc: JSON-escape + gzip + unsplit + parse must be
    lossless for arbitrary text — the oracle digests the original
    ``documents.text`` directly."""
    from pyvectorsearch_spark.operators.shards import (
        pack_jsonl_gz_shards,
        unpack_jsonl_gz_shards,
    )
    from pyvectorsearch_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    shards = pack_jsonl_gz_shards(docs, n_shards=_N_SHARDS)
    back = unpack_jsonl_gz_shards(shards)
    return back.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.octet_length("text").cast("bigint").alias("n_bytes"),
        F.md5(F.encode("text", "UTF-8")).alias("digest"),
    )


ORACLE_SHARDS_JSONL_GZ_ROUNDTRIP = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS digest
FROM documents
"""


QUERIES = {
    "shards_tar_roundtrip": q_shards_tar_roundtrip,
    "text_warc_wet_ingest": q_text_warc_wet_ingest,
    "shards_zip_roundtrip": q_shards_zip_roundtrip,
    "multimodal_gif_pixelsum": q_multimodal_gif_pixelsum,
    "shards_stream_ingest": q_shards_stream_ingest,
    "shards_media_roundtrip": q_shards_media_roundtrip,
    "shards_jsonl_gz_roundtrip": q_shards_jsonl_gz_roundtrip,
}
ORACLES: dict[str, str] = {
    "shards_tar_roundtrip": ORACLE_SHARDS_TAR_ROUNDTRIP,
    "text_warc_wet_ingest": ORACLE_TEXT_WARC_WET_INGEST,
    "shards_zip_roundtrip": ORACLE_SHARDS_ZIP_ROUNDTRIP,
    "multimodal_gif_pixelsum": ORACLE_MULTIMODAL_GIF_PIXELSUM,
    "shards_stream_ingest": ORACLE_SHARDS_STREAM_INGEST,
    "shards_media_roundtrip": ORACLE_SHARDS_MEDIA_ROUNDTRIP,
    "shards_jsonl_gz_roundtrip": ORACLE_SHARDS_JSONL_GZ_ROUNDTRIP,
}
