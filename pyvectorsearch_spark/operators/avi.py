"""Uncompressed AVI (RIFF) container — pure-stdlib encode/decode.

Round-10 extension of the real-decode matrix (VERDICT r9 ask #5): the one
VIDEO container that needs no codec library is AVI with raw DIB ('DIB '
handler, BI_RGB 24-bit) frames — the same uncompressed bottom-up BGR rows
as the BMP decoder (`operators/multimodal.py`), wrapped in a RIFF chunk
walk like the WAV decoder. With this, `video_frame_sample` decodes real
pixels for AVI blobs and the deterministic-fake surface shrinks to ogg
audio and compressed video codecs (the declared-final scope boundary,
SURVEY §8.4).

Layout produced/consumed (all little-endian, chunks even-padded):

    RIFF <size> 'AVI '
      LIST <size> 'hdrl'
        'avih' 56  MainAVIHeader   (us/frame, flags, total frames, w, h)
        LIST <size> 'strl'
          'strh' 56  fccType='vids' fccHandler='DIB ' scale/rate/length
          'strf' 40  BITMAPINFOHEADER (biBitCount=24, biCompression=0)
      LIST <size> 'movi'
        '00db' <size> <bottom-up BGR rows, stride padded to 4 bytes> ...
      'idx1' <16*frames>  (ckid, flags=AVIIF_KEYFRAME, offset, size)

Reference parity: the reference engine has no media path at all — this
belongs to the repo's LLM-pipeline surface (multimodal columns per the
build brief), not to `pktree.hpp`.
"""

from __future__ import annotations

import struct

_AVIIF_KEYFRAME = 0x10


def _row_stride(width: int) -> int:
    return (width * 3 + 3) & ~3


def _rgb_to_dib(width: int, height: int, rgb: bytes) -> bytes:
    """Top-down RGB24 -> bottom-up BGR rows, 4-byte-aligned stride."""
    stride = _row_stride(width)
    pad = b"\x00" * (stride - width * 3)
    rows = []
    for y in range(height - 1, -1, -1):
        row = bytearray(rgb[y * width * 3 : (y + 1) * width * 3])
        row[0::3], row[2::3] = row[2::3], row[0::3]  # RGB -> BGR
        rows.append(bytes(row) + pad)
    return b"".join(rows)


def _dib_to_rgb(width: int, height: int, dib: bytes) -> bytes:
    stride = _row_stride(width)
    out = bytearray(width * height * 3)
    for y in range(height):
        src = dib[(height - 1 - y) * stride :][: width * 3]
        row = bytearray(src)
        row[0::3], row[2::3] = row[2::3], row[0::3]  # BGR -> RGB
        out[y * width * 3 : (y + 1) * width * 3] = row
    return bytes(out)


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    data = fourcc + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        data += b"\x00"  # RIFF chunks are word-aligned
    return data


def _list(fourcc: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + payload)


def encode_avi(
    width: int,
    height: int,
    frames: list[bytes],
    *,
    fps: int = 10,
    audio_pcm16: bytes | None = None,
    sample_rate: int = 16000,
) -> bytes:
    """Uncompressed ('DIB ' / BI_RGB) AVI from top-down RGB24 frames
    (each ``width*height*3`` bytes). ``audio_pcm16`` (mono little-endian
    PCM16 bytes) adds a second 'auds' stream, interleaved one '01wb'
    chunk per video frame — the uncompressed-audio track the declared
    decode boundary still permits (SURVEY §8.4)."""
    for i, f in enumerate(frames):
        if len(f) != width * height * 3:
            raise ValueError(
                f"frame {i}: want {width * height * 3} RGB bytes, "
                f"got {len(f)}"
            )
    if audio_pcm16 is not None and len(audio_pcm16) % 2:
        raise ValueError("audio_pcm16 must be whole 16-bit samples")
    n_streams = 2 if audio_pcm16 is not None else 1
    frame_bytes = _row_stride(width) * height
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,             # dwMicroSecPerFrame
        frame_bytes * fps,            # dwMaxBytesPerSec
        0,                            # dwPaddingGranularity
        0x10,                         # dwFlags: AVIF_HASINDEX
        len(frames), 0, n_streams,    # totalframes, initial, streams
        frame_bytes,                  # dwSuggestedBufferSize
        width, height, 0, 0, 0, 0,    # w, h, reserved[4]
    )
    strh_v = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"DIB ", 0, 0, 0, 0,
        1, fps,                       # dwScale / dwRate -> fps
        0, len(frames),               # dwStart, dwLength
        frame_bytes, 0xFFFFFFFF, 0,   # bufsize, quality(-1), samplesize
        0, 0, width, height,          # rcFrame
    )
    strf_v = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, 0,  # BITMAPINFOHEADER, BI_RGB
        frame_bytes, 0, 0, 0, 0,
    )
    strls = _list(b"strl", _chunk(b"strh", strh_v) + _chunk(b"strf", strf_v))
    if audio_pcm16 is not None:
        n_samples = len(audio_pcm16) // 2
        strh_a = struct.pack(
            "<4s4sIHHIIIIIIII4H",
            b"auds", b"\x00\x00\x00\x00", 0, 0, 0, 0,
            1, sample_rate,           # dwScale / dwRate -> samples/sec
            0, n_samples,             # dwStart, dwLength (in samples)
            sample_rate * 2, 0xFFFFFFFF, 2,  # bufsize, quality, samplesize
            0, 0, 0, 0,
        )
        strf_a = struct.pack(
            "<HHIIHH",
            1, 1,                     # wFormatTag=PCM, nChannels=1
            sample_rate, sample_rate * 2,  # nSamplesPerSec, nAvgBytesPerSec
            2, 16,                    # nBlockAlign, wBitsPerSample
        )
        strls += _list(
            b"strl", _chunk(b"strh", strh_a) + _chunk(b"strf", strf_a)
        )
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strls)
    movi_payload = b"movi"
    idx = b""
    n_f = max(len(frames), 1)
    for i, f in enumerate(frames):
        # idx1 offsets are relative to the 'movi' fourcc position
        offset = len(movi_payload)
        dib = _rgb_to_dib(width, height, f)
        movi_payload += _chunk(b"00db", dib)
        idx += struct.pack(
            "<4sIII", b"00db", _AVIIF_KEYFRAME, offset, len(dib)
        )
        if audio_pcm16 is not None:
            # interleave: the i-th even-length slice of the PCM stream
            lo = (len(audio_pcm16) // 2 * i // n_f) * 2
            hi = (len(audio_pcm16) // 2 * (i + 1) // n_f) * 2
            offset = len(movi_payload)
            movi_payload += _chunk(b"01wb", audio_pcm16[lo:hi])
            idx += struct.pack(
                "<4sIII", b"01wb", _AVIIF_KEYFRAME, offset, hi - lo
            )
    body = hdrl + _chunk(b"LIST", movi_payload) + _chunk(b"idx1", idx)
    return _chunk(b"RIFF", b"AVI " + body)


def _walk_chunks(buf: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_size); tolerant of padding."""
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        start = pos + 8
        if start + size > end:
            break  # truncated chunk: stop, use what we have
        yield fourcc, start, size
        pos = start + size + (size & 1)


def _parse_container(blob: bytes):
    """Shared RIFF/AVI walk: returns None for non-AVI, else a dict with
    the avih dimensions, the per-stream headers keyed by STREAM INDEX
    (strl order — the index that prefixes its movi chunk ids), and the
    movi chunks grouped by stream index."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        return None
    (riff_size,) = struct.unpack_from("<I", blob, 4)
    end = min(len(blob), 8 + riff_size)
    out = {"width": None, "height": None, "streams": {}, "chunks": {}}
    stream_idx = 0
    for fourcc, start, size in _walk_chunks(blob, 12, end):
        if fourcc != b"LIST":
            continue
        kind = blob[start : start + 4]
        if kind == b"hdrl":
            for f2, s2, z2 in _walk_chunks(blob, start + 4, start + size):
                if f2 == b"avih" and z2 >= 40:
                    out["width"], out["height"] = struct.unpack_from(
                        "<II", blob, s2 + 32
                    )
                elif f2 == b"LIST" and blob[s2 : s2 + 4] == b"strl":
                    stream: dict = {"type": None}
                    for f3, s3, z3 in _walk_chunks(blob, s2 + 4, s2 + z2):
                        if f3 == b"strh" and z3 >= 8:
                            stream["type"] = blob[s3 : s3 + 4]
                        elif f3 == b"strf" and stream["type"] == b"vids" \
                                and z3 >= 40:
                            (bw, bh, _, bc, comp) = struct.unpack_from(
                                "<iiHHI", blob, s3 + 4
                            )
                            stream.update(
                                w=bw, h=abs(bh), bitcount=bc,
                                compression=comp,
                            )
                        elif f3 == b"strf" and stream["type"] == b"auds" \
                                and z3 >= 16:
                            (tag, ch, rate, _, _, bits) = struct.unpack_from(
                                "<HHIIHH", blob, s3
                            )
                            stream.update(
                                fmt=tag, channels=ch, rate=rate, bits=bits,
                            )
                    out["streams"][stream_idx] = stream
                    stream_idx += 1
        elif kind == b"movi":
            for f2, s2, z2 in _walk_chunks(blob, start + 4, start + size):
                if f2[2:] in (b"db", b"dc", b"wb") and f2[:2].isdigit():
                    out["chunks"].setdefault(int(f2[:2]), []).append(
                        blob[s2 : s2 + z2]
                    )
    return out


def parse_avi(blob: bytes):
    """Parse an uncompressed 24-bit AVI: returns
    ``(width, height, [top-down RGB24 frame bytes])`` or None when the
    blob is not RIFF/AVI. Raises ValueError for an AVI whose video
    stream is not raw BI_RGB 24-bit (compressed codecs are out of scope
    — SURVEY §8.4)."""
    c = _parse_container(blob)
    if c is None:
        return None
    vids = [
        (i, s) for i, s in c["streams"].items() if s["type"] == b"vids"
    ]
    width, height = c["width"], c["height"]
    bitcount, compression = 24, 0
    vid_idx = 0
    if vids:
        vid_idx, s = vids[0]
        width = width or s.get("w")
        height = height or s.get("h")
        bitcount = s.get("bitcount", 24)
        compression = s.get("compression", 0)
    if width is None or height is None:
        raise ValueError("AVI without avih/strf headers")
    if bitcount != 24 or compression != 0:
        raise ValueError(
            f"unsupported AVI stream (biBitCount={bitcount}, "
            f"biCompression={compression}); only raw BI_RGB 24-bit is "
            "decodable without a codec library"
        )
    want = _row_stride(width) * height
    rgb_frames = [
        _dib_to_rgb(width, height, f)
        for f in c["chunks"].get(vid_idx, [])
        if len(f) == want
    ]
    return width, height, rgb_frames


def parse_avi_audio(blob: bytes):
    """Decode the uncompressed PCM16 audio track of an AVI: returns
    ``(sample_rate, int16 numpy samples)``, or None when the blob is not
    AVI or carries no audio stream. Raises ValueError for a non-PCM16
    track (compressed audio is out of scope — SURVEY §8.4)."""
    import numpy as np

    c = _parse_container(blob)
    if c is None:
        return None
    auds = [
        (i, s) for i, s in c["streams"].items() if s["type"] == b"auds"
    ]
    if not auds:
        return None
    idx, s = auds[0]
    if s.get("fmt", 1) != 1 or s.get("bits", 16) != 16 or \
            s.get("channels", 1) != 1:
        raise ValueError(
            f"unsupported AVI audio (fmt={s.get('fmt')}, "
            f"bits={s.get('bits')}, channels={s.get('channels')}); only "
            "mono PCM16 is decodable without a codec library"
        )
    pcm = b"".join(c["chunks"].get(idx, []))
    return s.get("rate", 16000), np.frombuffer(
        pcm[: len(pcm) // 2 * 2], dtype="<i2"
    )
