"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

North-star extension (BASELINE.json): the reference has no media handling.
The engine treats media as ``binary`` blobs with a typed ``meta`` struct; all
heavy per-item work (decode, resize, feature extraction, frame sampling) runs
as Arrow-batched ``mapInPandas`` so only the Python worker touches bytes and
the JVM moves columnar batches.

Decode is REAL for every format that needs no external codec library:
binary PPM (P6), uncompressed 24-bit BMP, 8-bit RGB PNG (pure-stdlib
zlib inflate + the five row filters — r7), 16-bit PCM WAV and AIFF are
all parsed from bytes right here (``_parse_ppm`` / ``_parse_bmp`` /
``_parse_png`` / ``_parse_wav`` / ``_parse_aiff``), and the synthetic
fixtures emit genuine blobs in each container, so the image/audio paths
exercise true decode → resample → featurize end to end. The remaining
compressed formats (JPEG, ogg/mp3, video containers) still need
PIL/soundfile/av, absent in this container: those imports are gated,
with a DETERMINISTIC FAKE fallback (pixels/samples derived from a
rolling hash of the blob) so every downstream shape, schema, and
partition strategy stays real and tested.

Scale notes: blobs never shuffle — every operator is a map-side projection of
the scan (mapInPandas pipelines with the parquet reader). Feature outputs are
small typed columns, so downstream joins/aggs shuffle features, not media.
Size-skewed blobs are the one hazard: repartitioning by a hash of the id
(``spread_media``) levels batch bytes across tasks.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("blob", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("channels", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("format", T.StringType()),
                ]
            ),
        ),
    ]
)


def _chain_bytes(key: bytes, count: int) -> bytes:
    """Deterministic md5-chained byte stream (incompressible by design)."""
    chunks, state, have = [], key, 0
    while have < count:
        state = hashlib.md5(state).digest()
        chunks.append(state)
        have += len(state)
    return b"".join(chunks)[:count]


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Binary PPM (P6) container — the real, public format (netpbm)."""
    payload = rgb[: width * height * 3].ljust(width * height * 3, b"\x00")
    return b"P6\n%d %d\n255\n" % (width, height) + payload


def _parse_ppm(blob: bytes):
    """Parse a P6 PPM: returns (width, height, rgb bytes) or None."""
    if not blob.startswith(b"P6"):
        return None
    pos, fields = 2, []
    while len(fields) < 3 and pos < len(blob):
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        if blob[pos : pos + 1] == b"#":  # comment line
            while pos < len(blob) and blob[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos : pos + 1].isspace():
            pos += 1
        fields.append(blob[start:pos])
    try:
        w, h, maxval = (int(f) for f in fields)
    except ValueError:
        return None
    if maxval != 255 or w <= 0 or h <= 0:
        return None
    pos += 1  # single whitespace after maxval
    rgb = blob[pos : pos + w * h * 3]
    if len(rgb) < w * h * 3:
        return None
    return w, h, rgb


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png(
    width: int, height: int, rgb: bytes, *, filter_type: int | str = 0
) -> bytes:
    """Real PNG encoder — pure stdlib (struct + zlib), no PIL. 8-bit
    truecolor (color type 2), non-interlaced, one IDAT. PNG is just
    zlib-deflate scanlines behind a chunk walk (W3C PNG spec / RFC 2083),
    and python's zlib ships in this container (VERDICT r6 ask #3).

    ``filter_type``: 0-4 applies that PNG row filter to every row;
    "mixed" cycles 0,1,2,3,4 by row — exercises every unfilter path in
    ``_parse_png`` while remaining byte-deterministic."""
    import struct
    import zlib

    stride = width * 3
    payload = rgb[: height * stride].ljust(height * stride, b"\x00")
    rows = []
    prev = bytes(stride)
    for y in range(height):
        line = payload[y * stride : (y + 1) * stride]
        f = (y % 5) if filter_type == "mixed" else int(filter_type)
        if f == 0:
            filt = line
        elif f == 1:  # Sub
            filt = bytes(
                (line[x] - (line[x - 3] if x >= 3 else 0)) & 0xFF
                for x in range(stride)
            )
        elif f == 2:  # Up
            filt = bytes((line[x] - prev[x]) & 0xFF for x in range(stride))
        elif f == 3:  # Average
            filt = bytes(
                (line[x] - (((line[x - 3] if x >= 3 else 0) + prev[x]) >> 1))
                & 0xFF
                for x in range(stride)
            )
        elif f == 4:  # Paeth
            filt = bytes(
                (
                    line[x]
                    - _paeth(
                        line[x - 3] if x >= 3 else 0,
                        prev[x],
                        prev[x - 3] if x >= 3 else 0,
                    )
                )
                & 0xFF
                for x in range(stride)
            )
        else:
            raise ValueError(f"PNG filter {f} out of range 0-4")
        rows.append(bytes([f]) + filt)
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(rows), 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (left, up, up-left)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _parse_png(blob: bytes):
    """Parse an 8-bit truecolor non-interlaced PNG: chunk walk (CRC
    verified), zlib-inflate the IDAT stream, undo all five row filters.
    Returns (width, height, top-down RGB bytes) or None — same contract
    as ``_parse_ppm`` / ``_parse_bmp``, so the decode→dHash pipeline is
    container-invariant across all three image formats."""
    import struct
    import zlib

    import numpy as np

    if not blob.startswith(_PNG_SIG):
        return None
    pos, w, h, idat = 8, None, None, []
    while pos + 12 <= len(blob):
        (ln,) = struct.unpack(">I", blob[pos : pos + 4])
        typ = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + ln]
        if len(data) < ln:
            return None
        (crc,) = struct.unpack(">I", blob[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            return None
        if typ == b"IHDR":
            if ln < 13:
                return None
            w, h, depth, color, comp, filt, inter = struct.unpack(
                ">IIBBBBB", data[:13]
            )
            # scope: 8-bit RGB, no palette/alpha/interlace (the fixture
            # surface); anything else falls through to the gated PIL path
            if depth != 8 or color != 2 or comp != 0 or filt != 0 or inter != 0:
                return None
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if not w or not h or not idat:
        return None
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    stride = w * 3
    if len(raw) < h * (stride + 1):
        return None
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    rpos = 0
    for y in range(h):
        f = raw[rpos]
        line = np.frombuffer(raw[rpos + 1 : rpos + 1 + stride], dtype=np.uint8)
        rpos += 1 + stride
        cur = line.astype(np.int32)
        if f == 0:
            pass
        elif f == 1:  # Sub: left-neighbor chain, sequential by pixel
            for x in range(3, stride):
                cur[x] = (cur[x] + cur[x - 3]) & 0xFF
        elif f == 2:  # Up: vectorized
            cur = (cur + prev) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                left = cur[x - 3] if x >= 3 else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = cur[x - 3] if x >= 3 else 0
                c = prev[x - 3] if x >= 3 else 0
                cur[x] = (cur[x] + _paeth(int(a), int(prev[x]), int(c))) & 0xFF
        else:
            return None
        out[y] = cur.astype(np.uint8)
        prev = cur
    return w, h, out.tobytes()


def encode_wav(pcm16: bytes, sample_rate: int = 16000) -> bytes:
    """Minimal RIFF/WAVE container around mono 16-bit PCM."""
    import struct

    n = len(pcm16)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + n)
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", n)
        + pcm16
    )


def _parse_wav(blob: bytes):
    """Parse mono 16-bit PCM WAV: returns (sample_rate, int16 samples) or
    None. Walks RIFF chunks, so extra chunks before 'data' are fine."""
    import struct

    import numpy as np

    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        return None
    pos, rate, bits, channels = 12, None, None, None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            _, channels, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data" and rate is not None:
            if bits != 16 or channels != 1:
                return None
            samples = np.frombuffer(body[: len(body) // 2 * 2], dtype="<i2")
            return int(rate), samples
        pos += 8 + size + (size % 2)
    return None


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Uncompressed 24-bit BI_RGB Windows bitmap (BITMAPINFOHEADER) —
    pure-struct container like PPM/WAV: bottom-up rows, BGR byte order,
    rows padded to 4 bytes. Public format (Windows BMP v3)."""
    import struct

    payload = rgb[: width * height * 3].ljust(width * height * 3, b"\x00")
    row_out = (width * 3 + 3) // 4 * 4
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up
        line = payload[y * width * 3 : (y + 1) * width * 3]
        # RGB -> BGR per pixel
        bgr = bytearray(line)
        bgr[0::3], bgr[2::3] = line[2::3], line[0::3]
        rows.append(bytes(bgr).ljust(row_out, b"\x00"))
    data = b"".join(rows)
    off = 14 + 40
    header = (
        b"BM"
        + struct.pack("<IHHI", off + len(data), 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(data), 2835, 2835, 0, 0)
    )
    return header + data


def _parse_bmp(blob: bytes):
    """Parse an uncompressed 24-bit BMP: returns (width, height, top-down
    RGB bytes) or None. Handles bottom-up (h>0) and top-down (h<0) rows."""
    import struct

    import numpy as np

    if blob[:2] != b"BM" or len(blob) < 54:
        return None
    (data_off,) = struct.unpack("<I", blob[10:14])
    (hdr_size,) = struct.unpack("<I", blob[14:18])
    if hdr_size < 40:
        return None
    w, h = struct.unpack("<ii", blob[18:26])
    _, bpp = struct.unpack("<HH", blob[26:30])
    (compression,) = struct.unpack("<I", blob[30:34])
    if bpp != 24 or compression != 0 or w <= 0 or h == 0:
        return None
    bottom_up, h = h > 0, abs(h)
    row = (w * 3 + 3) // 4 * 4
    body = blob[data_off : data_off + row * h]
    if len(body) < row * h:
        return None
    px = np.frombuffer(body, dtype=np.uint8).reshape(h, row)[:, : w * 3]
    px = px.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if bottom_up:
        px = px[::-1]
    return w, h, px.tobytes()


def _ext80_encode(x: int) -> bytes:
    """IEEE 754 80-bit extended float from a positive int (AIFF sample
    rate field) — sign 0, 15-bit biased exponent, explicit-1 mantissa."""
    import struct

    if x <= 0:
        return b"\x00" * 10
    e = x.bit_length() - 1
    return struct.pack(">HQ", 16383 + e, x << (63 - e))


def _ext80_decode(b: bytes) -> int:
    import struct

    se, mant = struct.unpack(">HQ", b[:10])
    if mant == 0:
        return 0
    e = (se & 0x7FFF) - 16383
    return int(round(mant * (2.0 ** (e - 63))))


def encode_aiff(pcm16: bytes, sample_rate: int = 16000) -> bytes:
    """Minimal AIFF container around mono 16-bit PCM — the big-endian IFF
    twin of ``encode_wav`` (Apple AIFF-C ancestor; pure struct, no codec).
    ``pcm16`` is little-endian int16 bytes (same convention as
    ``encode_wav``); AIFF stores samples big-endian, so they are byte-
    swapped into the SSND body."""
    import struct

    import numpy as np

    samples = np.frombuffer(pcm16[: len(pcm16) // 2 * 2], dtype="<i2")
    body = samples.astype(">i2").tobytes()
    comm = b"COMM" + struct.pack(">I", 18) + struct.pack(
        ">hIh", 1, len(samples), 16
    ) + _ext80_encode(sample_rate)
    ssnd = b"SSND" + struct.pack(">I", 8 + len(body)) + struct.pack(">II", 0, 0) + body
    if len(body) % 2:
        ssnd += b"\x00"
    form_len = 4 + len(comm) + len(ssnd)
    return b"FORM" + struct.pack(">I", form_len) + b"AIFF" + comm + ssnd


def _parse_aiff(blob: bytes):
    """Parse mono 16-bit PCM AIFF: returns (sample_rate, int16 samples) or
    None. Walks IFF chunks (big-endian sizes, padded to even), so extra
    chunks are fine — the big-endian mirror of ``_parse_wav``."""
    import struct

    import numpy as np

    if blob[:4] != b"FORM" or blob[8:12] != b"AIFF":
        return None
    pos, rate, bits, channels, nframes = 12, None, None, None, 0
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack(">I", blob[pos + 4 : pos + 8])
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"COMM" and len(body) >= 18:
            channels, nframes, bits = struct.unpack(">hIh", body[:8])
            rate = _ext80_decode(body[8:18])
        elif cid == b"SSND" and rate is not None:
            if bits != 16 or channels != 1:
                return None
            (offset,) = struct.unpack(">I", body[:4])
            data = body[8 + offset : 8 + offset + nframes * 2]
            samples = np.frombuffer(
                data[: len(data) // 2 * 2], dtype=">i2"
            ).astype("<i2")
            return int(rate), samples
        pos += 8 + size + (size % 2)
    return None


def synthetic_media(spark: SparkSession, n: int = 64, *, seed: int = 7) -> DataFrame:
    """Deterministic media table matching MEDIA_SCHEMA. Image blobs are REAL
    binary PPM (P6) files and audio blobs REAL mono PCM16 WAV files (payload
    bytes md5-chained from (seed, media_id) — incompressible by design);
    video blobs stay an opaque fake container (no codec-free public raw
    format worth inventing).

    The rows are parallelized into ~24-row slices instead of the default
    ``defaultParallelism`` slices: a pickled local collection pays one
    Python-worker round trip per PARTITION at every scan, so 96 rows split
    32 ways measured 1.86 s/scan on local[32] vs 0.50 s split 4 ways (r10
    optimization round). Slice count still grows with ``n`` so big synthetic
    corpora keep their parallelism."""
    rows = _media_rows(n, seed)
    n_slices = max(1, min(spark.sparkContext.defaultParallelism, len(rows) // 24))
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, n_slices), MEDIA_SCHEMA
    )


def _media_rows(n: int, seed: int) -> list:
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        key = f"{seed}:{i}".encode()
        if kind == "image":
            w, h = 16 + (i % 4) * 8, 16 + (i % 3) * 8
            blob = encode_ppm(w, h, _chain_bytes(key, w * h * 3))
            meta = {
                "width": w, "height": h, "channels": 3,
                "sample_rate": None, "n_frames": 1, "format": "ppm",
            }
        elif kind == "audio":
            n_samp = 1024 + (i % 5) * 256
            blob = encode_wav(_chain_bytes(key, n_samp * 2), 16000)
            meta = {
                "width": None, "height": None, "channels": 1,
                "sample_rate": 16000, "n_frames": None, "format": "wav",
            }
        else:
            blob = _chain_bytes(key, 128 + 16 * (i % 5))
            meta = {
                "width": 16 + (i % 4) * 8, "height": 16 + (i % 3) * 8,
                "channels": 3, "sample_rate": None,
                "n_frames": 12 + (i % 7), "format": "fake-vid",
            }
        rows.append((i, kind, blob, meta))
    return rows


def synthetic_media_avi(
    spark: SparkSession, n: int = 24, *, seed: int = 5
) -> DataFrame:
    """Video table whose blobs are REAL uncompressed AVIs
    (``operators/avi.py``): deterministic per-pixel gradients salted by
    media id and frame index, plus an interleaved mono PCM16 audio track
    from a closed-form sample formula — both exactly reproducible (the
    spec-built-golden regime, like the PPM/BMP/WAV fixtures), so BOTH
    decode paths admit pure-SQL oracles."""
    import numpy as np

    from pyvectorsearch_spark.operators.avi import encode_avi

    rows = []
    for i in range(n):
        w = 8 + (i % 3) * 4
        h = 8 + ((i + 1) % 2) * 4
        nf = 6 + (i % 5)
        frames = [
            bytes(
                (x * 37 + y * 11 + fi * 29 + i * 53 + c * 17 + seed) % 256
                for y in range(h)
                for x in range(w)
                for c in range(3)
            )
            for fi in range(nf)
        ]
        ns = 800 + (i % 4) * 200
        j = np.arange(ns, dtype=np.int64)
        samples = ((j * 131 + i * 17 + seed * 7) % 4096 - 2048).astype(
            "<i2"
        )
        rows.append((
            i, "video",
            encode_avi(
                w, h, frames, fps=8,
                audio_pcm16=samples.tobytes(), sample_rate=16000,
            ),
            {
                "width": w, "height": h, "channels": 3,
                "sample_rate": 16000, "n_frames": nf, "format": "avi-db",
            },
        ))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthetic_media_with_dups(
    spark: SparkSession, n: int = 96, *, seed: int = 7, n_dups: int = 6
) -> DataFrame:
    """``synthetic_media`` plus PLANTED near-duplicates: ``n_dups`` patched
    image copies (media_id + 100000) and ``n_dups`` patched audio copies
    (media_id + 200000). Image patches alternate corner (usually invisible
    to the dHash sample grid — the re-encode regime) and center (a few
    gradient bits flip — the small-edit regime); audio patches overwrite 64
    PCM bytes mid-stream (one RMS frame nudged). Everything deterministic —
    the fixture for perceptual near-dup mining in both modalities."""
    rows = _media_rows(n, seed)
    dups = []
    audio_dups = []
    for mid, kind, blob, meta in rows:
        if kind == "audio" and len(audio_dups) < n_dups:
            mid_off = len(blob) // 2
            patched = blob[:mid_off] + b"\x7f" * 64 + blob[mid_off + 64 :]
            audio_dups.append((mid + 200000, kind, patched, meta))
            continue
        if kind != "image" or len(dups) >= n_dups:
            continue
        if len(dups) % 2 == 0:
            # corner patch: usually invisible to the 8x8 sample grid
            # (byte-identical dHash — the "re-encode" regime)
            patched = blob[:-24] + b"\xff" * 24
        else:
            # center patch: hits sampled pixels, a few gradient bits flip
            # (the "small edit" regime — nonzero Hamming)
            mid_off = len(blob) // 2
            patched = blob[:mid_off] + b"\xff" * 24 + blob[mid_off + 24 :]
        dups.append((mid + 100000, kind, patched, meta))
    return spark.createDataFrame(rows + dups + audio_dups, MEDIA_SCHEMA)


def synthetic_media_mixed(
    spark: SparkSession, n: int = 64, *, seed: int = 7, n_twins: int = 8
) -> DataFrame:
    """``synthetic_media`` plus CROSS-CONTAINER twins: the first ``n_twins``
    images get a BMP re-encode of the SAME pixels (media_id + 300000), a
    PNG re-encode (media_id + 500000, mixed row filters so every unfilter
    path runs — r7), AND a baseline-JPEG re-encode (media_id + 600000,
    quality 95, alternating 4:4:4 / 4:2:0 so both MCU layouts decode —
    r8); the first ``n_twins`` audio rows an AIFF re-encode of the SAME
    samples (media_id + 400000). Decode normalizes all containers to
    identical pixel/sample arrays, so each LOSSLESS twin group MUST
    collide exactly (Hamming 0) under dHash / the energy fingerprint —
    the "same asset re-encoded in a different container" dedup regime,
    with zero false-positive tolerance. The JPEG twin is the LOSSY
    re-encode regime: on this worst-case noise fixture q95 re-encodes
    land within a few dHash bits (measured max 4 across both layouts),
    inside the pair miners' default Hamming-6 radius.
    """
    rows = _media_rows(n, seed)
    twins = []
    n_img = n_aud = 0
    for mid, kind, blob, meta in rows:
        if kind == "image" and n_img < n_twins:
            from pyvectorsearch_spark.operators.jpeg import encode_jpeg

            w, h, rgb = _parse_ppm(blob)
            twins.append(
                (mid + 300000, kind, encode_bmp(w, h, rgb), {**meta, "format": "bmp"})
            )
            twins.append(
                (
                    mid + 500000,
                    kind,
                    encode_png(w, h, rgb, filter_type="mixed"),
                    {**meta, "format": "png"},
                )
            )
            twins.append(
                (
                    mid + 600000,
                    kind,
                    encode_jpeg(
                        w, h, rgb, quality=95,
                        subsampling="444" if n_img % 2 == 0 else "420",
                    ),
                    {**meta, "format": "jpeg"},
                )
            )
            n_img += 1
        elif kind == "audio" and n_aud < n_twins:
            rate, samples = _parse_wav(blob)
            twins.append(
                (
                    mid + 400000,
                    kind,
                    encode_aiff(samples.tobytes(), rate),
                    {**meta, "format": "aiff"},
                )
            )
            n_aud += 1
    return spark.createDataFrame(rows + twins, MEDIA_SCHEMA)


def spread_media(df: DataFrame, parts: int | None = None) -> DataFrame:
    """Hash-repartition media rows so size-skewed blobs spread across tasks."""
    target = parts or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(target, F.crc32(F.col("media_id").cast("string")))


def _prand_floats(blob: bytes, count: int) -> list[float]:
    """Deterministic pseudo-decode: md5-chained floats in [0, 1)."""
    out: list[float] = []
    state = blob[:16] or b"\x00"
    while len(out) < count:
        state = hashlib.md5(state).digest()
        for off in range(0, 16, 4):
            out.append(int.from_bytes(state[off : off + 4], "big") / 2**32)
            if len(out) == count:
                break
    return out


def _parse_jpeg(blob: bytes):
    """Baseline (r8) or progressive (r9) JFIF/JPEG via the pure-stdlib
    codec (``operators/jpeg.py``): returns (w, h, rgb bytes) or None for
    non-JPEG / out-of-scope coding modes (arithmetic, 12-bit)."""
    from pyvectorsearch_spark.operators.jpeg import decode_jpeg

    return decode_jpeg(blob)


def _parse_gif_still(blob: bytes):
    """First frame of a GIF87a/89a via the pure-stdlib LZW codec
    (``operators/gif.py``): returns (w, h, rgb bytes) or None."""
    from pyvectorsearch_spark.operators.gif import parse_gif

    parsed = parse_gif(blob)
    if parsed is None:
        return None
    w, h, frames = parsed
    return w, h, frames[0]


def _resample_rgb(
    w: int, h: int, rgb: bytes, width: int, height: int
) -> list[float]:
    """Nearest-neighbor resample of top-down RGB24 bytes to the requested
    grid, normalized to [0,1] floats."""
    import numpy as np

    px = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
    yi = (np.arange(height) * h) // height
    xi = (np.arange(width) * w) // width
    out = px[yi][:, xi].astype(np.float64) / 255.0
    return out.reshape(-1).tolist()


def _decode_rgb(blob: bytes, width: int, height: int) -> list[float]:
    """Decode → flat H×W×3 float pixels in [0,1].

    REAL for binary PPM (P6), uncompressed 24-bit BMP, 8-bit RGB PNG
    (pure-stdlib zlib inflate + the five row filters, r7), AND baseline
    JPEG (pure-stdlib Huffman + IDCT, r8), AND GIF (pure-stdlib LZW,
    r10 wave 2): header/marker parse +
    nearest-neighbor resample, no codec library needed — and because all
    four decode to the SAME normalized pixel grid, the dHash downstream
    is format-invariant (a PPM, a BMP and a PNG of the same image collide
    at Hamming 0; a JPEG re-encode lands within a few bits — the lossy
    re-encode regime). Progressive (SOF2) JPEG decodes for real too since
    r9. Remaining compressed formats (ogg, video) go through a gated PIL
    import; the deterministic fake is the last resort (clearly marked)."""
    parsed = (
        _parse_ppm(blob) or _parse_bmp(blob) or _parse_png(blob)
        or _parse_jpeg(blob) or _parse_gif_still(blob)
    )
    if parsed is not None:
        w, h, rgb = parsed
        return _resample_rgb(w, h, rgb, width, height)
    try:  # pragma: no cover - library absent in this container
        import io

        from PIL import Image  # type: ignore

        img = Image.open(io.BytesIO(blob)).convert("RGB").resize((width, height))
        return [p / 255.0 for px in img.getdata() for p in px]
    except Exception:
        # DETERMINISTIC FAKE — same shape/dtype as the real decode
        return _prand_floats(blob, width * height * 3)


def _decode_pcm(blob: bytes, n_samples: int) -> list[float]:
    """Audio decode → n_samples floats in [-1, 1].

    REAL for mono PCM16 WAV (RIFF chunk walk) AND AIFF (big-endian IFF
    walk) — both normalize to the same float samples, so downstream
    fingerprints are container-invariant; compressed formats would go
    through soundfile (absent here) — deterministic fake fallback keeps
    the shape."""
    parsed = _parse_wav(blob) or _parse_aiff(blob)
    if parsed is not None:
        _, samples = parsed
        x = (samples.astype("float64") / 32768.0)[:n_samples]
        out = x.tolist()
        out.extend([0.0] * (n_samples - len(out)))
        return out
    return [2.0 * x - 1.0 for x in _prand_floats(blob, n_samples)]


def image_resize_features(
    df: DataFrame, *, width: int = 8, height: int = 8
) -> DataFrame:
    """Decode+resize each image to (height, width, 3) and emit the flat pixel
    vector plus channel means — the standard thumbnail-embedding shape.

    Returns (media_id, pixels array<float>, mean_r, mean_g, mean_b)."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "image"]
            if not len(pdf):
                continue
            pixels, means = [], []
            for blob in pdf["blob"]:
                px = _decode_rgb(bytes(blob), width, height)
                pixels.append(px)
                means.append(
                    [
                        sum(px[c::3]) / (width * height)
                        for c in range(3)
                    ]
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "pixels": pixels,
                    "mean_r": [m[0] for m in means],
                    "mean_g": [m[1] for m in means],
                    "mean_b": [m[2] for m in means],
                }
            )

    return df.select("media_id", "kind", "blob").mapInPandas(
        run,
        schema=(
            "media_id long, pixels array<float>, "
            "mean_r double, mean_g double, mean_b double"
        ),
    )


def audio_rms_features(
    df: DataFrame, *, n_samples: int = 1024, frame: int = 256
) -> DataFrame:
    """Decode audio (stubbed) and compute per-frame RMS energy — the real
    windowing/batching plumbing of an audio featurizer.

    Returns (media_id, rms array<float>, rms_mean)."""
    import numpy as np
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "audio"]
            if not len(pdf):
                continue
            rms_all, rms_mean = [], []
            for blob in pdf["blob"]:
                x = np.asarray(_decode_pcm(bytes(blob), n_samples))
                frames = x[: (len(x) // frame) * frame].reshape(-1, frame)
                rms = np.sqrt((frames * frames).mean(axis=1))
                rms_all.append(rms.astype("float32").tolist())
                rms_mean.append(float(rms.mean()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "rms": rms_all,
                    "rms_mean": rms_mean,
                }
            )

    return df.select("media_id", "kind", "blob").mapInPandas(
        run, schema="media_id long, rms array<float>, rms_mean double"
    )


def video_frame_sample(df: DataFrame, *, every_n: int = 4) -> DataFrame:
    """Sample every ``every_n``-th frame index per video (real plumbing: one
    output row per sampled frame via explode of a computed index array).
    Per-frame decode is REAL for uncompressed AVI blobs (r10,
    ``operators/avi.py`` — RIFF walk + raw-DIB frames, no codec library)
    AND animated GIF (r10 wave 2, ``operators/gif.py`` — LZW);
    other containers keep the clearly-marked deterministic fake. Returns
    (media_id, frame_idx, pixels array<float>)."""
    import pandas as pd

    from pyvectorsearch_spark.operators.avi import parse_avi
    from pyvectorsearch_spark.operators.gif import parse_gif

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "video"]
            if not len(pdf):
                continue
            mids, fidx, pixels = [], [], []
            for mid, blob, meta in zip(
                pdf["media_id"], pdf["blob"], pdf["meta"]
            ):
                blob_b = bytes(blob)
                try:
                    parsed = parse_avi(blob_b) or parse_gif(blob_b)
                except ValueError:
                    parsed = None  # compressed container: fake path below
                if parsed is not None and parsed[2]:
                    w0, h0, rgb_frames = parsed
                    for fi in range(0, len(rgb_frames), every_n):
                        mids.append(mid)
                        fidx.append(fi)
                        pixels.append(
                            _resample_rgb(w0, h0, rgb_frames[fi], 4, 4)
                        )
                    continue
                n_frames = int(meta["n_frames"] or 0)
                for fi in range(0, n_frames, every_n):
                    mids.append(mid)
                    fidx.append(fi)
                    # frame decode stub: frame index salts the fake decode
                    pixels.append(
                        _decode_rgb(blob_b + fi.to_bytes(4, "big"), 4, 4)
                    )
            yield pd.DataFrame(
                {"media_id": mids, "frame_idx": fidx, "pixels": pixels}
            )

    return df.select("media_id", "kind", "blob", "meta").mapInPandas(
        run, schema="media_id long, frame_idx int, pixels array<float>"
    )


def media_byte_stats(df: DataFrame) -> DataFrame:
    """Pure byte-level features — fully real (no codec): size, crc32,
    Shannon entropy of the byte histogram, compressibility ratio."""
    import numpy as np
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            size, crc, ent, comp = [], [], [], []
            for blob in pdf["blob"]:
                b = bytes(blob)
                size.append(len(b))
                crc.append(zlib.crc32(b))
                n = max(len(b), 1)
                # byte histogram vectorized: frombuffer + bincount, entropy
                # from the nonzero bins only
                cnt = np.bincount(np.frombuffer(b, dtype=np.uint8), minlength=256)
                p = cnt[cnt > 0] / n
                ent.append(float(-(p * np.log2(p)).sum()) if len(p) else 0.0)
                comp.append(len(zlib.compress(b)) / n)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "n_bytes": size,
                    "crc32": crc,
                    "entropy": ent,
                    "compress_ratio": comp,
                }
            )

    return df.select("media_id", "kind", "blob").mapInPandas(
        run,
        schema=(
            "media_id long, kind string, n_bytes long, crc32 long, "
            "entropy double, compress_ratio double"
        ),
    )


def image_dhash(df: DataFrame, *, hash_w: int = 8, hash_h: int = 8) -> DataFrame:
    """Perceptual difference-hash (dHash) per image: decode → grayscale →
    nearest-neighbor resample to (hash_w+1) × hash_h → horizontal-gradient
    sign bits packed into a 64-bit int — the standard cheap near-dup
    fingerprint for images (robust to re-encode/resize, public algorithm).

    Decode is REAL for binary PPM (the deterministic fake covers compressed
    formats absent a codec, see module docstring), so on PPM corpora the
    hash is a true perceptual fingerprint. Map-side Arrow-batched projection
    — blobs never shuffle; output is (media_id, dhash).

    Pairs come from ``operators.dedup.hamming_pairs_bucketed`` (the generic
    pigeonhole join) — blobs reduced to 8-byte hashes BEFORE any join."""
    import numpy as np
    import pandas as pd

    n_bits = hash_w * hash_h
    if n_bits > 64:
        raise ValueError(f"dhash must fit a long: {hash_w}x{hash_h} > 64 bits")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "image"]
            if not len(pdf):
                continue
            out = []
            for blob in pdf["blob"]:
                px = np.asarray(
                    _decode_rgb(bytes(blob), hash_w + 1, hash_h)
                ).reshape(hash_h, hash_w + 1, 3)
                gray = px @ np.array([0.299, 0.587, 0.114])
                bits = (gray[:, 1:] > gray[:, :-1]).reshape(-1)
                h = 0
                for bit in bits:
                    h = (h << 1) | int(bit)
                # two's-complement wrap: a 64-bit hash with the top bit set
                # must land in signed-long range; XOR/bit_count/unsigned
                # shifts downstream are sign-agnostic
                if h >= 1 << 63:
                    h -= 1 << 64
                out.append(h)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].to_numpy(), "dhash": out}
            )

    return df.select("media_id", "kind", "blob").mapInPandas(
        run, schema="media_id long, dhash long"
    )


def image_dhash_pairs(
    df: DataFrame, *, hash_w: int = 8, hash_h: int = 8, max_hamming: int = 6
) -> DataFrame:
    """Near-duplicate IMAGE pairs: dHash fingerprints joined by the generic
    pigeonhole Hamming bucket join (no collect, no broadcast — the same
    beyond-10⁸-items path as SimHash text dedup). Returns
    (d1, d2, hamming) with d1 < d2, hamming ≤ max_hamming."""
    from pyvectorsearch_spark.operators.dedup import hamming_pairs_bucketed

    return hamming_pairs_bucketed(
        image_dhash(df, hash_w=hash_w, hash_h=hash_h),
        id_col="media_id",
        hash_col="dhash",
        bits=hash_w * hash_h,
        max_hamming=max_hamming,
    )


def audio_fingerprint(df: DataFrame, *, n_frames: int = 64, frame: int = 32) -> DataFrame:
    """Energy-gradient audio fingerprint: REAL WAV decode → per-frame RMS →
    sign-of-gradient bits (rms[i+1] > rms[i]) packed into a 63-bit int — the
    audio analog of the image dHash (a cheap deterministic stand-in for
    spectral fingerprints like Chromaprint, which need FFT libraries; the
    SHAPE — decode → frame → sign bits → Hamming join — is the real
    pipeline). Map-side projection; blobs never shuffle.

    Returns (media_id, afp) for audio rows."""
    import numpy as np
    import pandas as pd

    n_bits = n_frames - 1
    if n_bits > 63:
        raise ValueError(f"fingerprint must fit a signed long: {n_frames - 1} bits")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "audio"]
            if not len(pdf):
                continue
            out = []
            for blob in pdf["blob"]:
                x = np.asarray(_decode_pcm(bytes(blob), n_frames * frame))
                frames = x.reshape(n_frames, frame)
                rms = np.sqrt((frames * frames).mean(axis=1))
                bits = rms[1:] > rms[:-1]
                h = 0
                for bit in bits:
                    h = (h << 1) | int(bit)
                out.append(h)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].to_numpy(), "afp": out}
            )

    return df.select("media_id", "kind", "blob").mapInPandas(
        run, schema="media_id long, afp long"
    )


def audio_fingerprint_pairs(
    df: DataFrame, *, n_frames: int = 64, frame: int = 32, max_hamming: int = 4
) -> DataFrame:
    """Near-duplicate AUDIO pairs: energy fingerprints through the generic
    pigeonhole Hamming bucket join (no collect/broadcast). Returns
    (d1, d2, hamming), d1 < d2."""
    from pyvectorsearch_spark.operators.dedup import hamming_pairs_bucketed

    return hamming_pairs_bucketed(
        audio_fingerprint(df, n_frames=n_frames, frame=frame),
        id_col="media_id",
        hash_col="afp",
        bits=n_frames - 1,
        max_hamming=max_hamming,
    )


# ---------------------------------------------------------------------------
# Content-defined chunking over raw blob bytes (FastCDC-style gear hash —
# Xia et al., USENIX ATC'16; same boundary idea as the text CDC in
# functions/text.py, but byte-level and Arrow-batched since SQL cannot
# address binary content).

CDC_GEAR_MASK = (1 << 48) - 1
CDC_BIN_DIVISOR = 512  # ~512-byte average chunks
CDC_MIN_CHUNK = 64  # FastCDC min-size guard: skip boundary tests early


def _gear_table() -> list:
    """256-entry random table derived from md5 (deterministic everywhere)."""
    import hashlib

    return [
        int(hashlib.md5(f"gear:{b}".encode()).hexdigest()[:12], 16)
        for b in range(256)
    ]


def _cdc_chunks_bytes(blob: bytes, gear: list) -> list:
    """Split one blob at gear-hash boundaries; returns (offset, length,
    md5hex) per chunk. h = ((h << 1) + gear[byte]) & 48-bit mask; boundary
    when h % divisor == 0 and the chunk has reached CDC_MIN_CHUNK."""
    import hashlib

    chunks = []
    h = 0
    start = 0
    for i, b in enumerate(blob):
        h = ((h << 1) + gear[b]) & CDC_GEAR_MASK
        if i + 1 - start >= CDC_MIN_CHUNK and h % CDC_BIN_DIVISOR == 0:
            seg = blob[start : i + 1]
            chunks.append((start, len(seg), hashlib.md5(seg).hexdigest()))
            start = i + 1
            h = 0
    if start < len(blob):
        seg = blob[start:]
        chunks.append((start, len(seg), hashlib.md5(seg).hexdigest()))
    return chunks


def cdc_chunk_rows(df: DataFrame, *, blob_col: str = "blob") -> DataFrame:
    """Explode every blob into its CDC chunk rows
    ``(media_id, kind, offset, n_bytes, digest)`` — the content-addressed
    store's index. Arrow-batched mapInPandas: bytes never leave the worker;
    only 8-byte offsets + 32-char digests shuffle. The 100 TB shape: chunk
    rows are ~1% of blob bytes, and all downstream dedup joins run on
    digests."""
    import pandas as pd

    gear = _gear_table()

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out = {"media_id": [], "kind": [], "offset": [], "n_bytes": [], "digest": []}
            for mid, kind, blob in zip(pdf["media_id"], pdf["kind"], pdf[blob_col]):
                for off, ln, dg in _cdc_chunks_bytes(bytes(blob), gear):
                    out["media_id"].append(mid)
                    out["kind"].append(kind)
                    out["offset"].append(off)
                    out["n_bytes"].append(ln)
                    out["digest"].append(dg)
            yield pd.DataFrame(out)

    return df.select("media_id", "kind", blob_col).mapInPandas(
        run,
        schema="media_id long, kind string, offset long, n_bytes long, digest string",
    )


def audio_spectral_features(
    df: DataFrame, *, n_samples: int = 1024
) -> DataFrame:
    """Real spectral featurizer over the decoded PCM: rFFT magnitude →
    dominant frequency bin, spectral centroid, and spectral flatness
    (geometric/arithmetic mean ratio — the classic tonality measure).
    REAL math on REAL WAV/AIFF decode (``_decode_pcm``); Arrow-batched
    ``mapInPandas`` — blobs reduce to 3 doubles + 1 int before any
    shuffle (the 100 TB shape for audio feature extraction).

    Returns (media_id, dom_bin, centroid, flatness, energy)."""
    import numpy as np
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["kind"] == "audio"]
            if not len(pdf):
                continue
            dom, cent, flat, energy = [], [], [], []
            for blob in pdf["blob"]:
                x = np.asarray(_decode_pcm(bytes(blob), n_samples))
                mag = np.abs(np.fft.rfft(x))[1:]  # drop DC
                p = mag * mag
                tot = float(p.sum())
                bins = np.arange(1, len(p) + 1, dtype=np.float64)
                dom.append(int(np.argmax(p)) + 1)
                cent.append(float((bins * p).sum() / tot) if tot else 0.0)
                # flatness over the power spectrum, eps-guarded
                eps = 1e-12
                flat.append(
                    float(np.exp(np.mean(np.log(p + eps))) / (p.mean() + eps))
                )
                energy.append(float(np.mean(x * x)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "dom_bin": dom,
                    "centroid": cent,
                    "flatness": flat,
                    "energy": energy,
                }
            )

    return df.select("media_id", "kind", "blob").mapInPandas(
        run,
        schema="media_id long, dom_bin int, centroid double, "
        "flatness double, energy double",
    )
