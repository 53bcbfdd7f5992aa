"""Round-10: uncompressed AVI (RIFF) encode/decode — spec-built goldens
(VERDICT r9 ask #5: extend the real-decode matrix with the one video
container that needs no codec library).

Pins:
(a) byte-level golden: the encoder emits the exact RIFF/hdrl/movi/idx1
    layout the spec mandates (checked field by field, not round-trip);
(b) round-trip: frames come back pixel-identical, top-down RGB;
(c) container invariance: an AVI frame and a BMP of the same image decode
    to identical pixels (the same cross-format property the PPM/BMP/PNG
    matrix pins);
(d) graceful refusal: non-AVI returns None, compressed AVI raises;
(e) `video_frame_sample` decodes REAL pixels for AVI media and keeps the
    deterministic fake for fake-vid blobs (existing results unchanged).
"""

from __future__ import annotations

import struct

import pytest

from pyvectorsearch_spark.operators.avi import (
    _row_stride,
    encode_avi,
    parse_avi,
)


def _gradient(w: int, h: int, salt: int) -> bytes:
    return bytes(
        (x * 37 + y * 11 + salt * 29 + c * 17) % 256
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )


class TestGolden:
    def test_riff_layout_fields(self):
        w, h = 4, 2
        frames = [_gradient(w, h, 0), _gradient(w, h, 1)]
        blob = encode_avi(w, h, frames, fps=8)
        assert blob[:4] == b"RIFF" and blob[8:12] == b"AVI "
        (riff_size,) = struct.unpack_from("<I", blob, 4)
        assert 8 + riff_size == len(blob)
        # hdrl LIST comes first
        assert blob[12:16] == b"LIST" and blob[20:24] == b"hdrl"
        # avih: us/frame, total frames, streams, width, height
        avih_off = 24 + 8  # 'avih'+size
        us_pf = struct.unpack_from("<I", blob, avih_off)[0]
        assert us_pf == 125000  # 1e6/8 fps
        total = struct.unpack_from("<I", blob, avih_off + 16)[0]
        assert total == 2
        width, height = struct.unpack_from("<II", blob, avih_off + 32)
        assert (width, height) == (w, h)
        # one '00db' chunk per frame, each stride-padded
        stride = _row_stride(w)
        assert blob.count(b"00db") == 2 + 2  # movi chunks + idx1 entries
        i = blob.index(b"movi")
        first = blob.index(b"00db", i)
        (sz,) = struct.unpack_from("<I", blob, first + 4)
        assert sz == stride * h
        # idx1 present with one 16-byte entry per frame
        idx = blob.index(b"idx1")
        (isz,) = struct.unpack_from("<I", blob, idx + 4)
        assert isz == 16 * 2

    def test_dib_rows_bottom_up_bgr(self):
        # one red pixel top-left in a 2x2 frame: in the DIB it must be in
        # the LAST row, BGR order
        w, h = 2, 2
        rgb = bytes([255, 0, 0]) + bytes(9)
        blob = encode_avi(w, h, [rgb])
        i = blob.index(b"movi")
        data_off = blob.index(b"00db", i) + 8
        stride = _row_stride(w)
        dib = blob[data_off : data_off + stride * h]
        assert dib[stride : stride + 3] == bytes([0, 0, 255])  # BGR
        assert dib[:3] == bytes(3)  # bottom row untouched


class TestRoundTrip:
    @pytest.mark.parametrize("w,h,nf", [(4, 2, 1), (8, 8, 5), (12, 8, 3)])
    def test_frames_identical(self, w, h, nf):
        frames = [_gradient(w, h, fi) for fi in range(nf)]
        got = parse_avi(encode_avi(w, h, frames))
        assert got is not None
        gw, gh, gframes = got
        assert (gw, gh) == (w, h)
        assert gframes == frames

    def test_cross_format_bmp_identity(self):
        """An AVI frame and a BMP of the same image must decode to the
        same pixel grid — container invariance, like PPM/BMP/PNG."""
        from pyvectorsearch_spark.operators.multimodal import (
            _parse_bmp,
            encode_bmp,
        )

        w, h = 8, 6
        rgb = _gradient(w, h, 3)
        _, _, from_avi = parse_avi(encode_avi(w, h, [rgb]))
        bw, bh, from_bmp = _parse_bmp(encode_bmp(w, h, rgb))
        assert (bw, bh) == (w, h)
        assert from_avi[0] == from_bmp == rgb


class TestRefusal:
    def test_non_avi_returns_none(self):
        assert parse_avi(b"not a riff at all") is None
        assert parse_avi(b"RIFF\x04\x00\x00\x00WAVE") is None

    def test_compressed_avi_raises(self):
        w, h = 4, 2
        blob = bytearray(encode_avi(w, h, [_gradient(w, h, 0)]))
        strf = blob.index(b"strf") + 8
        struct.pack_into("<I", blob, strf + 16, 0x44495658)  # 'XVID'
        with pytest.raises(ValueError, match="unsupported AVI"):
            parse_avi(bytes(blob))

    def test_frame_size_validated(self):
        with pytest.raises(ValueError, match="RGB bytes"):
            encode_avi(4, 4, [b"\x00" * 5])


class TestAudioTrack:
    def _pcm(self, n, salt=0):
        import numpy as np

        j = np.arange(n, dtype=np.int64)
        return ((j * 7 + salt) % 4096 - 2048).astype("<i2")

    def test_audio_roundtrip_and_video_unaffected(self):
        import numpy as np

        from pyvectorsearch_spark.operators.avi import parse_avi_audio

        w, h = 8, 6
        frames = [_gradient(w, h, fi) for fi in range(3)]
        pcm = self._pcm(1000, 3)
        blob = encode_avi(
            w, h, frames, audio_pcm16=pcm.tobytes(), sample_rate=22050
        )
        rate, got = parse_avi_audio(blob)
        assert rate == 22050
        assert np.array_equal(got, pcm)
        # the video stream decodes exactly as without audio
        gw, gh, gframes = parse_avi(blob)
        assert (gw, gh) == (w, h) and gframes == frames

    def test_interleaving_one_audio_chunk_per_frame(self):
        w, h = 4, 2
        frames = [_gradient(w, h, fi) for fi in range(5)]
        blob = encode_avi(w, h, frames, audio_pcm16=self._pcm(500).tobytes())
        assert blob.count(b"01wb") == 5 + 5  # movi chunks + idx1 entries

    def test_cross_container_wav_identity(self):
        """The PCM track of an AVI and a WAV of the same samples must
        decode to identical sample arrays — container invariance."""
        import numpy as np

        from pyvectorsearch_spark.operators.avi import parse_avi_audio
        from pyvectorsearch_spark.operators.multimodal import (
            _parse_wav,
            encode_wav,
        )

        pcm = self._pcm(1200, 9)
        _, from_avi = parse_avi_audio(
            encode_avi(4, 2, [_gradient(4, 2, 0)],
                       audio_pcm16=pcm.tobytes(), sample_rate=16000)
        )
        _, from_wav = _parse_wav(encode_wav(pcm.tobytes(), 16000))
        assert np.array_equal(from_avi, np.asarray(from_wav))

    def test_no_audio_returns_none(self):
        from pyvectorsearch_spark.operators.avi import parse_avi_audio

        blob = encode_avi(4, 2, [_gradient(4, 2, 0)])
        assert parse_avi_audio(blob) is None
        assert parse_avi_audio(b"junk") is None

    def test_compressed_audio_raises(self):
        import struct as st

        from pyvectorsearch_spark.operators.avi import parse_avi_audio

        blob = bytearray(encode_avi(
            4, 2, [_gradient(4, 2, 0)],
            audio_pcm16=self._pcm(64).tobytes(),
        ))
        # flip wFormatTag from PCM(1) to 2 in the audio strf
        strh_a = blob.index(b"auds")
        strf_a = blob.index(b"strf", strh_a) + 8
        st.pack_into("<H", blob, strf_a, 2)
        with pytest.raises(ValueError, match="unsupported AVI audio"):
            parse_avi_audio(bytes(blob))

    def test_odd_byte_audio_rejected(self):
        with pytest.raises(ValueError, match="16-bit"):
            encode_avi(4, 2, [_gradient(4, 2, 0)], audio_pcm16=b"\x00" * 3)


class TestFrameSample:
    def test_real_decode_for_avi_media(self, spark):
        from pyvectorsearch_spark.operators.multimodal import (
            _resample_rgb,
            synthetic_media_avi,
            video_frame_sample,
        )

        media = synthetic_media_avi(spark, 6)
        out = video_frame_sample(media, every_n=4).toPandas()
        # every media contributes ceil(n_frames/4) rows
        metas = {
            r["media_id"]: r["meta"]
            for r in media.select("media_id", "meta").collect()
        }
        want_rows = sum(
            (m["n_frames"] + 3) // 4 for m in metas.values()
        )
        assert len(out) == want_rows
        # spot-check one frame against a driver-side reference decode
        row = out[(out.media_id == 0) & (out.frame_idx == 4)].iloc[0]
        blob = media.filter("media_id = 0").collect()[0]["blob"]
        w, h, frames = parse_avi(bytes(blob))
        want = _resample_rgb(w, h, frames[4], 4, 4)
        assert list(row["pixels"]) == pytest.approx(want)

    def test_fake_vid_results_unchanged(self, spark):
        """The pre-r10 fake path must produce byte-identical pixels for
        non-AVI blobs (pinned so the rows-only driver query stays stable)."""
        from pyvectorsearch_spark.operators.multimodal import (
            _decode_rgb,
            synthetic_media,
            video_frame_sample,
        )

        media = synthetic_media(spark, 9)
        out = video_frame_sample(media, every_n=4).toPandas()
        vids = media.filter("kind = 'video'").collect()
        assert len(out) == sum(
            len(range(0, r["meta"]["n_frames"], 4)) for r in vids
        )
        r0 = vids[0]
        got = out[
            (out.media_id == r0["media_id"]) & (out.frame_idx == 0)
        ].iloc[0]["pixels"]
        want = _decode_rgb(
            bytes(r0["blob"]) + (0).to_bytes(4, "big"), 4, 4
        )
        assert list(got) == pytest.approx(want)
