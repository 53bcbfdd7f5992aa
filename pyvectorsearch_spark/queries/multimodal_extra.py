"""Multimodal perceptual-fingerprint queries (outside the driver's pinned
50-entry window — the window is kept byte-stable for cross-round
comparability; these are covered by the rows-only driver check and the
golden pair tests in tests/test_multimodal.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def q_image_dhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup mining over the multimodal table: REAL PPM decode →
    perceptual dHash → generic pigeonhole Hamming join (blobs reduce to
    8-byte hashes before any shuffle). The fixture plants 6 patched-image
    duplicates; deterministic end to end, but binary decode is not
    SQL-expressible — rows-only check, like ``multimodal_byte_stats``
    (golden pair assertions live in tests/test_multimodal.py)."""
    from pyvectorsearch_spark.operators.multimodal import (
        image_dhash_pairs,
        synthetic_media_with_dups,
    )

    media = synthetic_media_with_dups(spark, 96, n_dups=6).coalesce(4)
    return image_dhash_pairs(media, max_hamming=6).orderBy("d1", "d2")


def q_audio_fingerprint_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup mining: REAL WAV decode → energy-gradient fingerprint
    → pigeonhole Hamming join (the audio analog of the image dHash path;
    same rows-only check — binary decode is not SQL-expressible; golden
    pair assertions in tests/test_multimodal.py)."""
    from pyvectorsearch_spark.operators.multimodal import (
        audio_fingerprint_pairs,
        synthetic_media_with_dups,
    )

    media = synthetic_media_with_dups(spark, 96, n_dups=6).coalesce(4)
    return audio_fingerprint_pairs(media).orderBy("d1", "d2")


def q_multimodal_binaryfile_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical Spark multimodal INGESTION path: media blobs land as
    individual files and are read back with the built-in ``binaryFile``
    source (path, length, content), then verified byte-for-byte against
    the in-memory truth (md5 + length per media id, id recovered from the
    file name). A correct ingest reports n_digest_match == n_files per
    kind — the self-verifying round trip. Binary generation is not
    SQL-expressible, so this is a documented rows-only row like the other
    multimodal entries; the byte-level check is INSIDE the query and
    golden-tested locally.

    Scale shape: binaryFile parallelizes file listing/reads across
    executors (one row per file, content never collected); the verify join
    is media-id keyed."""
    import os
    import shutil
    import tempfile
    import uuid

    from pyvectorsearch_spark.operators.multimodal import synthetic_media

    media = synthetic_media(spark, n=48)
    base = os.path.join(tempfile.gettempdir(), "pvs_binfile_landing_48_v1")
    if not os.path.isdir(base):
        tmp = f"{base}.tmp-{uuid.uuid4().hex[:8]}"
        os.makedirs(tmp)
        for r in media.select("media_id", "kind", "blob").collect():
            with open(os.path.join(tmp, f"{r['kind']}_{r['media_id']}.bin"), "wb") as f:
                f.write(bytes(r["blob"]))
        try:
            os.rename(tmp, base)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.isdir(base):
                raise
    files = spark.read.format("binaryFile").load(base)
    mid = F.regexp_extract(
        F.element_at(F.split(F.col("path"), "/"), -1), r"_(\d+)\.bin$", 1
    ).cast("bigint")
    got = files.select(
        mid.alias("media_id"),
        F.md5("content").alias("got_digest"),
        F.col("length").cast("bigint").alias("got_len"),
    )
    truth = media.select(
        "media_id",
        "kind",
        F.md5("blob").alias("want_digest"),
        F.length("blob").cast("bigint").alias("want_len"),
    )
    j = truth.join(got, "media_id")
    return (
        j.groupBy("kind")
        .agg(
            F.count("*").cast("bigint").alias("n_files"),
            F.sum((F.col("got_digest") == F.col("want_digest")).cast("bigint"))
            .cast("bigint")
            .alias("n_digest_match"),
            F.sum((F.col("got_len") == F.col("want_len")).cast("bigint"))
            .cast("bigint")
            .alias("n_len_match"),
            F.sum("got_len").cast("bigint").alias("total_bytes"),
        )
        .orderBy("kind")
    )


def _crossformat_pairs(
    spark: SparkSession, *, image_hamming: int, with_distance: bool
) -> DataFrame:
    """Shared body of the two cross-container mining regimes (see the two
    public queries below)."""
    from pyvectorsearch_spark.operators.multimodal import (
        audio_fingerprint_pairs,
        image_dhash_pairs,
        synthetic_media_mixed,
    )

    media = synthetic_media_mixed(spark, 72, n_twins=8).coalesce(4)
    img = image_dhash_pairs(media, max_hamming=image_hamming).select(
        F.lit("image").alias("modality"), "d1", "d2",
        F.col("hamming").cast("bigint").alias("hamming"),
    )
    aud = audio_fingerprint_pairs(media, max_hamming=0).select(
        F.lit("audio").alias("modality"), "d1", "d2",
        F.lit(0).cast("bigint").alias("hamming"),
    )
    fmt = media.select(
        F.col("media_id"), F.col("meta.format").alias("fmt")
    )
    pairs = img.unionByName(aud)
    cols = ["modality", "d1", "d2", "fmt1", "fmt2"]
    if with_distance:
        cols.append("hamming")
    return (
        pairs.join(fmt.withColumnRenamed("media_id", "d1"), "d1")
        .withColumnRenamed("fmt", "fmt1")
        .join(fmt.withColumnRenamed("media_id", "d2"), "d2")
        .withColumnRenamed("fmt", "fmt2")
        .select(*cols)
        .orderBy("modality", "d1", "d2")
    )


def q_multimodal_crossformat_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-CONTAINER duplicate mining, LOSSLESS regime (round 5 form,
    restored in round 9 — ADVICE r8): the mixed fixture holds the same
    pixels encoded as PPM, uncompressed 24-bit BMP and PNG, and the same
    samples as WAV *and* AIFF — all parsed by real pure-stdlib decoders
    (`operators/multimodal.py`). Decode normalizes containers to identical
    pixel/sample arrays, so lossless twins collide at Hamming 0 exactly —
    the pair set is a pure function of the planted twins, never of
    incidental fixture noise. The lossy-JPEG regime lives in the separate
    ``multimodal_crossformat_lossy`` query (round 9). Deterministic end to
    end; binary decode is not SQL-expressible — rows-only check (golden
    twin assertions in tests/test_round5_multimodal.py)."""
    return _crossformat_pairs(spark, image_hamming=0, with_distance=False)


def q_multimodal_crossformat_lossy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-container mining, LOSSY regime (round 9; split out of the
    round-5 query per ADVICE r8): image pairs are mined at Hamming
    radius 6 so the baseline-JPEG re-encodes of the planted twins
    (`operators/jpeg.py`, quality 95 — a few dHash bits off the lossless
    originals) surface alongside the exact collisions, and every pair
    carries its distance. At radius 6 incidental near-pairs from the
    72-row fixture may appear; the FULL expected pair set (planted and
    incidental) is pinned in tests/test_round9_advice.py, so any fixture
    drift is caught rather than absorbed. Rows-only by design (binary
    decode is not SQL-expressible)."""
    return _crossformat_pairs(spark, image_hamming=6, with_distance=True)


QUERIES = {
    "multimodal_image_dhash": q_image_dhash_pairs,
    "multimodal_audio_fingerprint": q_audio_fingerprint_pairs,
    "multimodal_binaryfile_ingest": q_multimodal_binaryfile_ingest,
    "multimodal_crossformat_pairs": q_multimodal_crossformat_pairs,
}
ORACLES: dict[str, str] = {}


def q_multimodal_cdc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary content-defined chunking dedup report over the planted-dup
    media fixture: per kind, total vs distinct chunks/bytes and the
    content-addressed-store savings ratio. The planted near-dups differ in
    a small byte patch, so CDC must recover most of their storage — the
    blob-level twin of ``dedup_cdc_ratio``. Rows-only (binary content is
    not SQL-addressable); the kernel is pinned by golden + property tests
    in tests/test_round5_cdc_binary.py."""
    from pyvectorsearch_spark.operators.multimodal import (
        cdc_chunk_rows,
        spread_media,
        synthetic_media_with_dups,
    )

    media = spread_media(synthetic_media_with_dups(spark, 96))
    ch = cdc_chunk_rows(media)
    per = ch.groupBy("kind", "digest").agg(
        F.count("*").alias("cnt"), F.first("n_bytes").alias("n_bytes")
    )
    return (
        per.groupBy("kind")
        .agg(
            F.sum("cnt").cast("bigint").alias("total_chunks"),
            F.count("*").cast("bigint").alias("distinct_chunks"),
            F.sum(F.col("cnt") * F.col("n_bytes")).cast("bigint").alias("total_bytes"),
            F.sum("n_bytes").cast("bigint").alias("distinct_bytes"),
            F.round(
                F.lit(1.0)
                - F.sum("n_bytes")
                / F.sum(F.col("cnt") * F.col("n_bytes")).cast("double"),
                6,
            ).alias("dedup_ratio"),
        )
        .orderBy("kind")
    )


QUERIES.update({"multimodal_cdc_dedup": q_multimodal_cdc_dedup})
# rows-only by design: binary chunking is not SQL-expressible


def q_multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode + nearest-neighbor RESIZE to an 8x8 thumbnail grid (the
    brief's resize step; REAL for PPM/BMP — header parse + resample, no
    codec lib). Per width-bucket report over the thumbnail channel means
    proves the decode/resize path end-to-end. Rows-only: binary decode is
    not SQL-expressible (golden values pinned in
    tests/test_round6_multimodal.py)."""
    from pyvectorsearch_spark.operators.multimodal import (
        image_resize_features,
        synthetic_media,
    )

    media = synthetic_media(spark, 96).coalesce(4)
    feats = image_resize_features(media, width=8, height=8)
    return (
        feats.withColumn("n_px", F.size("pixels"))
        .groupBy("n_px")
        .agg(
            F.count("*").cast("bigint").alias("n_images"),
            F.round(F.avg("mean_r"), 6).alias("avg_r"),
            F.round(F.avg("mean_g"), 6).alias("avg_g"),
            F.round(F.avg("mean_b"), 6).alias("avg_b"),
        )
        .orderBy("n_px")
    )


def q_multimodal_audio_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction: REAL WAV decode → rFFT power spectrum →
    dominant bin / spectral centroid / flatness. The md5-chained PCM
    fixture is white noise, so flatness must sit near 1 and the dominant
    bins spread — asserted in tests/test_round6_multimodal.py against a
    direct numpy recompute on the encoded blobs. Rows-only by design."""
    from pyvectorsearch_spark.operators.multimodal import (
        audio_spectral_features,
        synthetic_media,
    )

    media = synthetic_media(spark, 96).coalesce(4)
    feats = audio_spectral_features(media, n_samples=1024)
    return (
        feats.groupBy()
        .agg(
            F.count("*").cast("bigint").alias("n_audio"),
            F.countDistinct("dom_bin").cast("bigint").alias("distinct_dom_bins"),
            F.round(F.avg("centroid"), 6).alias("avg_centroid"),
            F.round(F.avg("flatness"), 6).alias("avg_flatness"),
            F.round(F.avg("energy"), 6).alias("avg_energy"),
        )
    )


def q_multimodal_video_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling (every 4th frame index; per-frame decode is the
    documented stub — the container formats need av, absent here — but the
    Spark-side plumbing is real: meta-driven index fan-out, one row per
    sampled frame, pixels reduced to a mean before any shuffle). Per-video
    frame counts prove the sampling arithmetic. Rows-only by design."""
    from pyvectorsearch_spark.operators.multimodal import (
        synthetic_media,
        video_frame_sample,
    )

    media = synthetic_media(spark, 96).coalesce(4)
    frames = video_frame_sample(media, every_n=4)
    per = frames.groupBy("media_id").agg(
        F.count("*").cast("bigint").alias("n_sampled"),
        F.max("frame_idx").alias("max_idx"),
    )
    return (
        per.groupBy("n_sampled")
        .agg(
            F.count("*").cast("bigint").alias("n_videos"),
            F.max("max_idx").alias("max_frame_idx"),
        )
        .orderBy("n_sampled")
    )


QUERIES.update(
    {
        "multimodal_image_resize": q_multimodal_image_resize,
        "multimodal_audio_spectrum": q_multimodal_audio_spectrum,
        "multimodal_video_framesample": q_multimodal_video_framesample,
    }
)
# rows-only by design: binary decode / frame fan-out are not SQL-expressible
