"""Round-10 wave-2: GIF codec goldens + sharded-container roundtrips.

The GIF codec is validated three independent ways: (1) pure-LZW
property roundtrips across code sizes, dictionary overflow, and the
KwKwK case; (2) a hand-assembled spec vector (the canonical 43-byte
1x1 GIF, built byte-by-byte from the GIF89a spec, not by our encoder)
decoded correctly; (3) container roundtrips covering interlace,
animation, sub-block framing, and local color tables.  The shard ops
are validated for byte determinism (what the DuckDB-blind oracle
relies on) and content integrity.
"""

from __future__ import annotations

import random

import pytest

from pyvectorsearch_spark.operators.gif import (
    encode_gif,
    lzw_decode,
    lzw_encode,
    parse_gif,
)

# --------------------------------------------------------------------------
# LZW
# --------------------------------------------------------------------------


@pytest.mark.parametrize("mcs", [2, 3, 5, 8])
def test_lzw_roundtrip_random(mcs):
    rng = random.Random(100 + mcs)
    for n in (0, 1, 2, 255, 256, 4096, 30000):
        data = bytes(rng.randrange(1 << mcs) for _ in range(n))
        assert lzw_decode(lzw_encode(data, mcs), mcs) == data


def test_lzw_dict_overflow_forces_clear_reset():
    """>4096 distinct sequences force a mid-stream CLEAR; the decoder
    must resynchronize its table and code width."""
    rng = random.Random(7)
    data = bytes(rng.randrange(256) for _ in range(120_000))
    assert lzw_decode(lzw_encode(data, 8), 8) == data


def test_lzw_kwkwk_case():
    """aaaa... is the classic code==next (KwKwK) sequence."""
    for n in (2, 3, 10, 1000):
        data = b"\x01" * n
        assert lzw_decode(lzw_encode(data, 2), 2) == data


def test_lzw_rejects_corrupt_code():
    enc = lzw_encode(bytes(range(16)), 4)
    with pytest.raises(ValueError, match="corrupt"):
        # all-ones stream decodes to out-of-range codes quickly
        lzw_decode(b"\xff" * 8, 2)
    assert lzw_decode(enc, 4) == bytes(range(16))


# --------------------------------------------------------------------------
# Spec vector: the canonical minimal GIF, assembled from the spec by hand
# --------------------------------------------------------------------------

_MINIMAL_GIF = bytes(
    [
        0x47, 0x49, 0x46, 0x38, 0x39, 0x61,  # "GIF89a"
        0x01, 0x00, 0x01, 0x00,              # screen 1x1
        0x80, 0x00, 0x00,                    # GCT flag, 2 colors
        0xFF, 0xFF, 0xFF,                    # color 0: white
        0x00, 0x00, 0x00,                    # color 1: black
        0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00,  # GCE
        0x2C, 0x00, 0x00, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00,
        0x02,                                # LZW min code size
        0x02, 0x44, 0x01,                    # 1 sub-block: CLEAR,0,EOI
        0x00,                                # block terminator
        0x3B,                                # trailer
    ]
)


def test_minimal_spec_gif_decodes():
    w, h, frames = parse_gif(_MINIMAL_GIF)
    assert (w, h) == (1, 1)
    assert len(frames) == 1
    assert frames[0] == b"\xff\xff\xff"  # one white pixel


def test_non_gif_returns_none():
    assert parse_gif(b"\x89PNG\r\n\x1a\n....") is None
    assert parse_gif(b"") is None


# --------------------------------------------------------------------------
# Container roundtrips
# --------------------------------------------------------------------------


def _expect_rgb(frame_idx, pal):
    return b"".join(bytes(pal[i]) for i in frame_idx)


def test_gif_roundtrip_still_and_interlace():
    rng = random.Random(5)
    w, h = 37, 23  # odd sizes stress interlace pass boundaries
    pal = [tuple(rng.randrange(256) for _ in range(3)) for _ in range(32)]
    frame = bytes(rng.randrange(32) for _ in range(w * h))
    for interlace in (False, True):
        blob = encode_gif(w, h, [frame], pal, interlace=interlace)
        pw, ph, frames = parse_gif(blob)
        assert (pw, ph, len(frames)) == (w, h, 1)
        assert frames[0] == _expect_rgb(frame, pal)


def test_gif_animation_and_subblock_framing():
    """5 frames of 64x64 random 256-color data: compressed stream far
    exceeds 255 bytes, exercising multi-sub-block framing per frame."""
    rng = random.Random(6)
    w = h = 64
    pal = [tuple(rng.randrange(256) for _ in range(3)) for _ in range(256)]
    frames_idx = [
        bytes(rng.randrange(256) for _ in range(w * h)) for _ in range(5)
    ]
    blob = encode_gif(w, h, frames_idx, pal)
    assert b"NETSCAPE2.0" in blob  # loop extension present
    _, _, frames = parse_gif(blob)
    assert len(frames) == 5
    for out, idx in zip(frames, frames_idx):
        assert out == _expect_rgb(idx, pal)


def test_gif_encode_is_deterministic():
    rng = random.Random(8)
    pal = [(i, i, i) for i in range(4)]
    frame = bytes(rng.randrange(4) for _ in range(12 * 9))
    a = encode_gif(12, 9, [frame], pal)
    b = encode_gif(12, 9, [frame], pal)
    assert a == b


def test_gif_local_color_table_and_subframe():
    """Hand-build a 2-frame GIF where frame 2 is a 2x2 sub-rectangle
    with a LOCAL color table, compositing onto frame 1 (disposal 0)."""
    import struct

    pal_g = [(10, 20, 30), (40, 50, 60)]
    base = bytes([0]) * 16  # 4x4 of color 0
    blob = bytearray(encode_gif(4, 4, [base], pal_g)[:-1])  # drop trailer
    # frame 2: 2x2 at (1,1), LCT of 2 colors, all pixels LCT color 1
    blob += b"\x2c" + struct.pack("<HHHHB", 1, 1, 2, 2, 0x80)
    blob += bytes([200, 201, 202, 210, 211, 212])  # LCT
    sub = lzw_encode(bytes([1, 1, 1, 1]), 2)
    blob += bytes([2, len(sub)]) + sub + b"\x00"
    blob += b"\x3b"
    w, h, frames = parse_gif(bytes(blob))
    assert len(frames) == 2
    px = frames[1]
    # corner untouched (global color 0), center overwritten by LCT[1]
    assert px[0:3] == bytes(pal_g[0])
    at = lambda x, y: px[(y * 4 + x) * 3 :][:3]  # noqa: E731
    assert at(1, 1) == bytes([210, 211, 212])
    assert at(2, 2) == bytes([210, 211, 212])
    assert at(3, 3) == bytes(pal_g[0])


def test_gif_dispatches_in_image_decode():
    """_decode_rgb must decode GIF for real (not the deterministic
    fake): a solid-color GIF resamples to exactly that color."""
    from pyvectorsearch_spark.operators.multimodal import _decode_rgb

    pal = [(255, 0, 0), (0, 0, 255)]
    frame = bytes([1]) * (16 * 16)  # solid blue
    blob = encode_gif(16, 16, [frame], pal)
    px = _decode_rgb(blob, 4, 4)
    assert px == pytest.approx([0.0, 0.0, 1.0] * 16)


# --------------------------------------------------------------------------
# Shard containers
# --------------------------------------------------------------------------


def test_tar_shards_roundtrip_and_determinism(spark):
    from pyvectorsearch_spark.operators.shards import (
        pack_tar_shards,
        unpack_tar_shards,
    )

    docs = spark.createDataFrame(
        [(i, f"döc-{i} " * (i + 1)) for i in range(20)],
        "doc_id bigint, text string",
    )
    shards = pack_tar_shards(docs, n_shards=4)
    rows = {r["shard_id"]: r for r in shards.collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert sum(r["n_members"] for r in rows.values()) == 20
    # byte determinism: re-pack must produce identical blobs
    rows2 = {r["shard_id"]: r for r in pack_tar_shards(
        docs, n_shards=4).collect()}
    for sid in rows:
        assert bytes(rows[sid]["blob"]) == bytes(rows2[sid]["blob"])
    got = {
        int(r["member_name"].split(".")[0]): bytes(r["payload"])
        for r in unpack_tar_shards(shards).collect()
    }
    assert got == {
        i: (f"döc-{i} " * (i + 1)).encode("utf-8") for i in range(20)
    }


def test_wet_record_format_and_parse():
    from pyvectorsearch_spark.operators.shards import (
        _wet_record,
        parse_wet_records,
    )

    payload = "héllo\nworld".encode("utf-8")
    blob = _wet_record("corpus://doc/7", "07", payload)
    blob += _wet_record("corpus://doc/8", "08", b"x" * 300)
    recs = parse_wet_records(blob)
    assert [r[0] for r in recs] == ["corpus://doc/7", "corpus://doc/8"]
    assert recs[0][2] == len(payload) and recs[0][3] == payload
    assert recs[1][2] == 300
    # payload containing a fake record head must NOT split the record
    tricky = b"WARC/1.0\r\nnot a real header"
    blob2 = _wet_record("corpus://doc/9", "09", tricky)
    recs2 = parse_wet_records(blob2)
    assert len(recs2) == 1 and recs2[0][3] == tricky


def test_wet_parse_rejects_bad_content_length():
    from pyvectorsearch_spark.operators.shards import (
        _wet_record,
        parse_wet_records,
    )
    import gzip

    blob = _wet_record("corpus://doc/1", "01", b"abcdef")
    raw = gzip.decompress(blob).replace(b"Content-Length: 6",
                                        b"Content-Length: 9999")
    import io

    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(raw)
    with pytest.raises(ValueError, match="Content-Length"):
        parse_wet_records(buf.getvalue())


def test_zip_shards_roundtrip(spark):
    from pyvectorsearch_spark.operators.shards import (
        pack_zip_shards,
        unpack_zip_shards,
    )

    docs = spark.createDataFrame(
        [(i, "the quick brown fox " * 50) for i in range(10)],
        "doc_id bigint, text string",
    )
    shards = pack_zip_shards(docs, n_shards=2)
    srows = shards.collect()
    # DEFLATE must actually compress the repetitive text
    text_bytes = len("the quick brown fox " * 50) * 10
    assert sum(len(bytes(r["blob"])) for r in srows) < text_bytes // 5
    got = {
        int(r["member_name"].split(".")[0]): bytes(r["payload"])
        for r in unpack_zip_shards(shards).collect()
    }
    assert got == {
        i: ("the quick brown fox " * 50).encode() for i in range(10)
    }


def test_shard_count_scales_with_data(spark):
    from pyvectorsearch_spark.operators.shards import (
        pack_tar_shards,
        shard_count_for,
    )

    docs = spark.createDataFrame(
        [(i, "x" * 100_000) for i in range(50)],
        "doc_id bigint, text string",
    )
    # 5 MB of text at 1 MB target -> 5 shards; at 256 MB -> 1 shard
    assert shard_count_for(docs, target_shard_mb=1) == 5
    assert shard_count_for(docs, target_shard_mb=256) == 1
    auto = pack_tar_shards(docs, n_shards=None, target_shard_mb=1)
    assert auto.select("shard_id").distinct().count() == 5


def test_video_frame_sample_decodes_gif_for_real(spark):
    """An animated GIF must flow through video_frame_sample as a REAL
    decode: solid-color frames come back as exactly those colors."""
    from pyvectorsearch_spark.operators.gif import encode_gif
    from pyvectorsearch_spark.operators.multimodal import (
        video_frame_sample,
    )

    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255)]
    frames = [bytes([c]) * 64 for c in (0, 1, 2, 0, 1, 2)]
    blob = encode_gif(8, 8, frames, pal)
    df = spark.createDataFrame(
        [(1, "video", bytearray(blob), {"n_frames": "6"})],
        "media_id long, kind string, blob binary, meta map<string,string>",
    )
    rows = {
        r["frame_idx"]: r["pixels"]
        for r in video_frame_sample(df, every_n=2).collect()
    }
    assert set(rows) == {0, 2, 4}
    assert rows[0][:3] == pytest.approx([1.0, 0.0, 0.0])  # red frame
    assert rows[2][:3] == pytest.approx([0.0, 0.0, 1.0])  # blue frame
    assert rows[4][:3] == pytest.approx([0.0, 1.0, 0.0])  # green frame


def test_pack_shards_to_files_roundtrip(spark, tmp_path):
    """File-sink export -> binaryFile read-back -> unpack must recover
    every document byte-for-byte, for all three formats."""
    from pyvectorsearch_spark.operators.shards import (
        pack_shards_to_files,
        read_shard_files,
        unpack_tar_shards,
        unpack_wet_shards,
        unpack_zip_shards,
    )

    docs = spark.createDataFrame(
        [(i, f"payload-{i} " * (i % 7 + 1)) for i in range(30)],
        "doc_id bigint, text string",
    )
    for fmt, unpack, glob in [
        ("tar", unpack_tar_shards, "*.tar"),
        ("wet", unpack_wet_shards, "*.warc.wet.gz"),
        ("zip", unpack_zip_shards, "*.zip"),
    ]:
        out = str(tmp_path / fmt)
        meta = pack_shards_to_files(
            docs, out, fmt=fmt, n_shards=3
        ).collect()
        assert len(meta) == 3
        assert sum(r["n_members"] for r in meta) == 30
        blobs = read_shard_files(spark, f"{out}/{glob}")
        members = unpack(blobs).collect()
        assert len(members) == 30
        if fmt == "wet":
            got = {
                int(r["target_uri"].rsplit("/", 1)[1]): bytes(r["payload"])
                for r in members
            }
        else:
            got = {
                int(r["member_name"].split(".")[0]): bytes(r["payload"])
                for r in members
            }
        assert got == {
            i: (f"payload-{i} " * (i % 7 + 1)).encode() for i in range(30)
        }


def test_pack_shards_to_files_rejects_bad_fmt(spark, tmp_path):
    from pyvectorsearch_spark.operators.shards import pack_shards_to_files

    docs = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="fmt"):
        pack_shards_to_files(docs, str(tmp_path), fmt="rar")


def test_gif_rejects_out_of_range_indices():
    """Encoder: index beyond the palette fails loud up front.  Decoder:
    a crafted frame referencing a missing color raises instead of
    silently RESIZING the canvas bytearray (short-slice assignment)."""
    import struct

    from pyvectorsearch_spark.operators.gif import lzw_encode

    pal = [(1, 2, 3), (4, 5, 6)]
    with pytest.raises(ValueError, match="palette index"):
        encode_gif(2, 2, [bytes([0, 1, 2, 3])], pal)
    # hand-build: 2-color GCT (mcs=2 -> codes up to 3 are valid LZW
    # singles) but pixel index 3 has no palette entry
    blob = bytearray(b"GIF89a")
    blob += struct.pack("<HHBBB", 2, 2, 0x80, 0, 0)
    blob += bytes([1, 2, 3, 4, 5, 6])  # GCT: 2 colors
    blob += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
    sub = lzw_encode(bytes([0, 1, 3, 0]), 2)
    blob += bytes([2, len(sub)]) + sub + b"\x00\x3b"
    with pytest.raises(ValueError, match="color index"):
        parse_gif(bytes(blob))


def test_gif_crossformat_dhash_identity():
    """A palette image encoded as GIF and as PPM must produce the SAME
    dHash (decode is lossless for palette-representable images) — the
    format-invariance property the other codec-free containers pin."""
    import random

    from pyvectorsearch_spark.operators.multimodal import (
        _decode_rgb,
        encode_ppm,
    )

    rng = random.Random(21)
    w, h = 24, 16
    pal = [tuple(rng.randrange(256) for _ in range(3)) for _ in range(16)]
    idx = bytes(rng.randrange(16) for _ in range(w * h))
    rgb = b"".join(bytes(pal[i]) for i in idx)
    px_gif = _decode_rgb(encode_gif(w, h, [idx], pal), 8, 8)
    px_ppm = _decode_rgb(encode_ppm(w, h, rgb), 8, 8)
    assert px_gif == pytest.approx(px_ppm)


def test_tar_shards_binary_and_multi_member(spark):
    """Binary payload columns pass through byte-exact (no utf-8
    mangling), and member_cols emits one member per (row, suffix)."""
    from pyvectorsearch_spark.operators.shards import (
        pack_tar_shards,
        unpack_tar_shards,
    )

    raw = [bytes([i, 0, 255, 10, 13, i]) for i in range(6)]
    docs = spark.createDataFrame(
        [(i, bytearray(raw[i]), f"meta-{i}") for i in range(6)],
        "doc_id bigint, blob binary, meta string",
    )
    shards = pack_tar_shards(
        docs, n_shards=2, member_cols={"bin": "blob", "txt": "meta"}
    )
    members = {
        r["member_name"]: bytes(r["payload"])
        for r in unpack_tar_shards(shards).collect()
    }
    assert len(members) == 12
    for i in range(6):
        assert members[f"{i:012d}.bin"] == raw[i]
        assert members[f"{i:012d}.txt"] == f"meta-{i}".encode()


def test_gif_transparency_and_disposal_background():
    """Hand-build a 3-frame animation: frame 2 paints a 2x2 rect with
    one TRANSPARENT pixel (canvas must show through) and disposal
    method 2 (rect restored to background color before frame 3)."""
    import struct

    from pyvectorsearch_spark.operators.gif import lzw_encode

    gct = [(9, 9, 9), (100, 110, 120), (200, 210, 220), (0, 0, 0)]
    blob = bytearray(b"GIF89a")
    # bg color index 1
    blob += struct.pack("<HHBBB", 4, 4, 0x81, 1, 0)
    for c in gct:
        blob += bytes(c)

    def image(left, top, w, h, idx):
        out = bytearray(b"\x2c")
        out += struct.pack("<HHHHB", left, top, w, h, 0)
        sub = lzw_encode(bytes(idx), 2)
        out += bytes([2, len(sub)]) + sub + b"\x00"
        return out

    # frame 1: full 4x4 of color 0
    blob += image(0, 0, 4, 4, [0] * 16)
    # GCE: disposal 2, transparency on index 3
    blob += b"\x21\xf9\x04" + bytes([(2 << 2) | 1, 0, 0, 3]) + b"\x00"
    # frame 2: 2x2 at (1,1): [2, transparent, 2, 2]
    blob += image(1, 1, 2, 2, [2, 3, 2, 2])
    # frame 3: 1x1 at (0,0) color 0 (elsewhere shows disposal result)
    blob += image(0, 0, 1, 1, [0])
    blob += b"\x3b"

    w, h, frames = parse_gif(bytes(blob))
    at = lambda f, x, y: frames[f][(y * 4 + x) * 3 :][: 3]  # noqa: E731
    # frame 2: (1,1) painted, (2,1) transparent -> frame-1 color shows
    assert at(1, 1, 1) == bytes(gct[2])
    assert at(1, 2, 1) == bytes(gct[0])
    assert at(1, 1, 2) == bytes(gct[2])
    # frame 3: the 2x2 rect was restored to BACKGROUND (index 1)
    assert at(2, 1, 1) == bytes(gct[1])
    assert at(2, 2, 2) == bytes(gct[1])
    # outside the rect: untouched composite from frame 1
    assert at(2, 3, 3) == bytes(gct[0])


def test_shard_plan_shapes(spark):
    """The 100 TB plan contract for the shard ops: pack is exactly ONE
    exchange (the group-by-shard hash shuffle); unpack adds NO exchange
    on top of its input (embarrassingly parallel mapInPandas)."""
    from pyvectorsearch_spark.operators.shards import (
        pack_tar_shards,
        unpack_tar_shards,
    )
    from pyvectorsearch_spark.plans import count_exchanges

    docs = spark.createDataFrame(
        [(i, f"t-{i}") for i in range(40)], "doc_id bigint, text string"
    )
    shards = pack_tar_shards(docs, n_shards=4)
    assert count_exchanges(shards) == 1, shards._jdf.queryExecution()
    members = unpack_tar_shards(shards)
    # unpack introduces zero additional exchanges over the pack plan
    assert count_exchanges(members) == count_exchanges(shards)


def test_jsonl_gz_shards_lossless_for_hostile_text(spark):
    """Newlines, quotes, tabs, control chars, and unicode must survive
    the jsonl.gz roundtrip byte-exact (JSON escapes them all)."""
    from pyvectorsearch_spark.operators.shards import (
        pack_jsonl_gz_shards,
        unpack_jsonl_gz_shards,
    )

    texts = [
        "line1\nline2\r\nline3",
        "quote \" backslash \\ brace }{",
        "unicode: h\u00e9llo \u4e16\u754c emoji \U0001F600 nel \u0085",
        "tabs\tand control \x01\x0b\x0c chars",
        "",
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    shards = pack_jsonl_gz_shards(docs, n_shards=2)
    got = {
        r["doc_id"]: r["text"]
        for r in unpack_jsonl_gz_shards(shards).collect()
    }
    assert got == dict(enumerate(texts))
