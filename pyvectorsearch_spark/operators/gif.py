"""GIF87a/89a — pure-stdlib encode/decode with a real LZW codec.

Round-10 wave-2 extension of the real-decode matrix (PPM, BMP, PNG,
baseline+progressive JPEG, WAV, AIFF, uncompressed AVI): GIF is the one
remaining ubiquitous image container whose compression (LZW, GIF89a spec
appendix) is fully specified without an external codec library.  Both
directions are implemented from the spec:

- variable-width LZW codes (min-code-size+1 .. 12 bits, LSB-first bit
  packing), CLEAR / EOI handling, dictionary reset at 4096 entries,
  the KwKwK (``code == next``) decoder case;
- logical screen descriptor + global color table;
- per-frame image descriptors with optional local color tables;
- the four-pass interlace row order (encode and de-interlace);
- 255-byte data sub-block framing;
- GIF89a graphic-control and Netscape looping extensions (parsed and
  skipped / emitted for animations).

Reference parity: the reference engine (`pktree.hpp`) has no media path;
this belongs to the repo's LLM-pipeline multimodal surface, same as
`operators/jpeg.py` and `operators/avi.py`.
"""

from __future__ import annotations

import struct

_MAX_CODE_WIDTH = 12
_DICT_LIMIT = 1 << _MAX_CODE_WIDTH  # 4096

#: Four-pass interlace schedule from the GIF89a spec: (start row, step).
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlaced_row_order(height: int) -> list[int]:
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, height, step))
    return order


# ---------------------------------------------------------------------------
# LZW (GIF flavor: LSB-first bit packing, variable code width)
# ---------------------------------------------------------------------------


class _BitWriter:
    """LSB-first bit packer (GIF packs code bits little-endian)."""

    def __init__(self) -> None:
        self._out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, code: int, width: int) -> None:
        self._acc |= code << self._nbits
        self._nbits += width
        while self._nbits >= 8:
            self._out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._nbits -= 8

    def finish(self) -> bytes:
        if self._nbits:
            self._out.append(self._acc & 0xFF)
        return bytes(self._out)


def lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """GIF LZW compress ``data`` (palette indices) at ``min_code_size``.

    Emits CLEAR first, resets the dictionary whenever it would overflow
    4096 entries, widens the code size exactly one emitted code before
    the decoder does (the classic ``next == (1 << width) + 1`` encoder
    rule that keeps both sides in sync), and terminates with EOI.
    """
    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _BitWriter()

    def fresh() -> tuple[dict, int, int]:
        return (
            {bytes([i]): i for i in range(clear)},
            eoi + 1,
            min_code_size + 1,
        )

    table, nxt, width = fresh()
    bw.write(clear, width)
    if not data:
        bw.write(eoi, width)
        return bw.finish()

    w = data[:1]
    for i in range(1, len(data)):
        c = data[i : i + 1]
        if w + c in table:
            w += c
            continue
        bw.write(table[w], width)
        table[w + c] = nxt
        nxt += 1
        if nxt == (1 << width) + 1 and width < _MAX_CODE_WIDTH:
            width += 1
        if nxt >= _DICT_LIMIT:
            # table full: the entry just assigned was the last 12-bit
            # code; emit CLEAR and restart so the decoder resets too
            bw.write(clear, width)
            table, nxt, width = fresh()
        w = c
    bw.write(table[w], width)
    bw.write(eoi, width)
    return bw.finish()


def lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """GIF LZW decompress — the exact inverse of :func:`lzw_encode`,
    including the KwKwK case (``code == next``: output prev + prev[0])."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()

    table: list[bytes] = []
    nxt = 0
    width = min_code_size + 1
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, nxt, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        nxt = eoi + 1
        width = min_code_size + 1
        prev = None

    reset()
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)  # truncated stream: emit what we have
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            reset()
            continue
        if code == eoi:
            return bytes(out)
        if code < nxt and code < len(table):
            entry = table[code]
        elif code == nxt and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"corrupt LZW stream: code {code} > next {nxt}")
        out += entry
        if prev is not None and nxt < _DICT_LIMIT:
            table.append(prev + entry[:1])
            nxt += 1
            if nxt == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        prev = entry


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------


def _sub_blocks(data: bytes) -> bytes:
    """Frame ``data`` into <=255-byte GIF data sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _palette_bits(n_colors: int) -> int:
    """Smallest b in [1, 8] with 2**b >= n_colors."""
    bits = 1
    while (1 << bits) < n_colors:
        bits += 1
    if bits > 8:
        raise ValueError(f"palette too large: {n_colors}")
    return bits


def encode_gif(
    width: int,
    height: int,
    frames: list[bytes],
    palette: list[tuple[int, int, int]],
    *,
    delay_cs: int = 4,
    interlace: bool = False,
    loop: bool = True,
) -> bytes:
    """Encode index frames (row-major palette indices, one byte per
    pixel) into a GIF89a blob with a global color table.

    Multi-frame inputs get a graphic-control extension per frame and the
    Netscape looping application extension (the standard animation
    layout); single frames produce a plain still.
    """
    if not frames:
        raise ValueError("need at least one frame")
    bits = _palette_bits(len(palette))
    for f in frames:
        if len(f) != width * height:
            raise ValueError("frame size != width*height")
        if f and max(f) >= len(palette):
            raise ValueError(
                f"palette index {max(f)} >= palette size {len(palette)}"
            )
    gct = bytearray()
    for i in range(1 << bits):
        r, g, b = palette[i] if i < len(palette) else (0, 0, 0)
        gct += bytes((r, g, b))

    out = bytearray(b"GIF89a")
    packed = 0x80 | ((bits - 1) << 4) | (bits - 1)  # GCT flag, res, size
    out += struct.pack("<HHBBB", width, height, packed, 0, 0)
    out += gct

    if len(frames) > 1 and loop:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"

    mcs = max(2, bits)  # spec: LZW min code size is at least 2
    for frame in frames:
        if len(frames) > 1:
            out += b"\x21\xf9\x04"  # GCE: disposal=0, no transparency
            out += struct.pack("<BHB", 0x00, delay_cs, 0)
            out += b"\x00"
        out += b"\x2c" + struct.pack(
            "<HHHHB", 0, 0, width, height, 0x40 if interlace else 0x00
        )
        px = frame
        if interlace:
            rows = _interlaced_row_order(height)
            px = b"".join(
                frame[y * width : (y + 1) * width] for y in rows
            )
        out.append(mcs)
        out += _sub_blocks(lzw_encode(px, mcs))
    out += b"\x3b"
    return bytes(out)


def _read_sub_blocks(blob: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(blob):
            raise ValueError("truncated sub-block stream")
        n = blob[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += blob[pos : pos + n]
        pos += n


def parse_gif(blob: bytes):
    """Parse a GIF87a/89a blob -> ``(width, height, [rgb bytes])`` with
    one top-down RGB24 buffer per frame, or ``None`` if the magic does
    not match.  Handles global AND local color tables, interlaced
    frames, sub-frame image descriptors (composited onto the previous
    frame), GCE transparency (index skips compositing) and disposal
    methods 0/1 (leave) and 2 (restore the rect to the background
    color after the frame, GIF89a §23); other extensions are skipped."""
    if len(blob) < 13 or blob[:4] != b"GIF8" or blob[4:6] not in (b"7a", b"9a"):
        return None
    sw, sh, packed, _bg, _par = struct.unpack("<HHBBB", blob[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = blob[pos : pos + 3 * n]
        pos += 3 * n

    frames: list[bytes] = []
    # canvas holds the running composite for animations
    canvas = bytearray(sw * sh * 3)
    bg_rgb = (
        bytes(gct[_bg * 3 : _bg * 3 + 3])
        if gct is not None and _bg * 3 + 3 <= len(gct)
        else b"\x00\x00\x00"
    )
    disposal = 0
    transparent: int | None = None
    while pos < len(blob):
        b0 = blob[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            label = blob[pos]
            pos += 1
            data, pos = _read_sub_blocks(blob, pos)
            if label == 0xF9 and len(data) >= 4:
                # graphic control: disposal + transparency for the NEXT
                # image (packed, delay lo, delay hi, transparent index)
                disposal = (data[0] >> 2) & 0x07
                transparent = data[3] if data[0] & 0x01 else None
            continue
        if b0 != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b0:02x} at {pos - 1}")
        left, top, w, h, ipacked = struct.unpack("<HHHHB", blob[pos : pos + 9])
        pos += 9
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            ct = blob[pos : pos + 3 * n]
            pos += 3 * n
        if ct is None:
            raise ValueError("frame with no color table")
        n_colors = len(ct) // 3
        mcs = blob[pos]
        pos += 1
        data, pos = _read_sub_blocks(blob, pos)
        idx = lzw_decode(data, mcs)
        if len(idx) < w * h:
            raise ValueError(f"short frame: {len(idx)} < {w * h}")
        if ipacked & 0x40:  # de-interlace
            ordered = bytearray(w * h)
            for src_row, y in enumerate(_interlaced_row_order(h)):
                ordered[y * w : (y + 1) * w] = idx[
                    src_row * w : (src_row + 1) * w
                ]
            idx = bytes(ordered)
        for y in range(h):
            cy = top + y
            if cy >= sh:
                break
            row = idx[y * w : (y + 1) * w]
            base = (cy * sw + left) * 3
            for x, ci in enumerate(row):
                if left + x >= sw:
                    break
                if ci == transparent:
                    continue  # transparent pixel: canvas shows through
                if ci >= n_colors:
                    # a short slice would silently RESIZE the bytearray
                    raise ValueError(
                        f"color index {ci} >= table size {n_colors}"
                    )
                o = base + x * 3
                canvas[o : o + 3] = ct[ci * 3 : ci * 3 + 3]
        frames.append(bytes(canvas))
        if disposal == 2:
            # restore-to-background: clear this frame's rect AFTER the
            # emitted composite, per GIF89a §23 disposal semantics
            for y in range(h):
                cy = top + y
                if cy >= sh:
                    break
                for x in range(w):
                    if left + x >= sw:
                        break
                    o = (cy * sw + left + x) * 3
                    canvas[o : o + 3] = bg_rgb
        disposal = 0
        transparent = None
    if not frames:
        raise ValueError("GIF with no image data")
    return sw, sh, frames
