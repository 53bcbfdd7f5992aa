"""Pure-stdlib(+numpy) baseline JPEG codec — no PIL, no libjpeg.

Round-8 (VERDICT r7 ask #4): shrinks the deterministic-fake decode surface
to ogg/video by making JFIF baseline JPEG — the dominant real-web image
format — a REAL decode path in ``operators/multimodal.py``. Follows the
round-7 PNG-codec playbook: the container is a marker walk, the payload is
entropy-coded DCT blocks (ITU-T T.81 / ISO 10918-1; tables from the
file's own DQT/DHT segments, so decoder correctness never depends on the
encoder's Annex-K constants), and everything normalizes to the same pixel
grid as the PPM/BMP/PNG decoders.

Decoder scope (returns None outside it, like the other ``_parse_*``):
baseline sequential DCT (SOF0/1) and — round 9 — progressive DCT (SOF2,
spectral selection + successive approximation, T.81 Annex G), 8-bit, 1 or
3 components, sampling factors ≤ 2 (4:4:4, 4:2:2, 4:2:0), restart
intervals. Arithmetic coding, hierarchical, and 12-bit stay out of scope
by design.

Encoder scope: baseline (Annex-K quantization with libjpeg quality
scaling, 4:4:4 or 4:2:0) plus a progressive encoder (4:4:4, default
10-scan script exercising DC/AC first and refinement passes) — used for
fixtures and the crossformat twins; the round-trip and spec-built goldens
cross-check the directions against each other and against hand-assembled
streams, and a progressive encode must decode pixel-identical to the
baseline encode at the same quality (same coefficients by construction).

Scale shape: the codec runs inside Arrow ``mapInPandas`` batches like
every other decode kernel — bytes never shuffle, digests travel.
"""

from __future__ import annotations

import struct

import numpy as np


def _make_zigzag() -> list[int]:
    out = []
    for s in range(15):
        diag = [(r, s - r) for r in range(8) if 0 <= s - r < 8]
        if s % 2 == 0:
            diag = diag[::-1]
        out.extend(r * 8 + c for r, c in diag)
    return out


ZIGZAG = _make_zigzag()  # zigzag position -> natural (row-major) index

# Annex K.1/K.2 quantization tables (natural order, row-major)
_K_LUM = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_K_CHR = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K.3 Huffman specs: (BITS[1..16], HUFFVAL)
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    C = np.zeros((8, 8))
    for u in range(8):
        cu = np.sqrt(1.0 / 8.0) if u == 0 else np.sqrt(2.0 / 8.0)
        for x in range(8):
            C[u, x] = cu * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return C


_C = _dct_matrix()


def _quality_scale(table: list[int], quality: int) -> np.ndarray:
    """libjpeg quality scaling: 1..100 → per-entry clamp to [1, 255]."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = np.array([(v * scale + 50) // 100 for v in table], dtype=np.int32)
    return np.clip(t, 1, 255)


def _canonical_codes(bits: list[int], vals: list[int]):
    """BITS/HUFFVAL → {symbol: (code, length)} (T.81 C.2 code assignment)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]):
    """BITS/HUFFVAL → {(length, code): symbol} for the bit-serial reader."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # 1-fill to byte boundary


def _magnitude(v: int) -> tuple[int, int]:
    """Value → (size, size-bit amplitude) per T.81 F.1.2.1 (negative values
    use the one's-complement style encoding)."""
    if v == 0:
        return 0, 0
    size = int(v).bit_length() if v > 0 else int(-v).bit_length()
    amp = v if v > 0 else v + (1 << size) - 1
    return size, amp


def _extend(amp: int, size: int) -> int:
    """Inverse of ``_magnitude`` (T.81 F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    if amp < (1 << (size - 1)):
        return amp - (1 << size) + 1
    return amp


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1), 0.0, 255.0)


def _pad_to_blocks(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Edge-replicate pad to multiples of (bh, bw)."""
    h, w = plane.shape
    H = -(-h // bh) * bh
    W = -(-w // bw) * bw
    return np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")


def _encode_block(
    bw: _BitWriter,
    block: np.ndarray,
    qtab: np.ndarray,
    dc_codes,
    ac_codes,
    pred: int,
) -> int:
    coeff = _C @ (block - 128.0) @ _C.T
    q = np.rint(coeff.reshape(-1) / qtab).astype(int)
    zz = [int(q[ZIGZAG[i]]) for i in range(64)]
    # Baseline 8-bit entropy coding caps magnitudes: AC size <= 10 (|v| <=
    # 1023), DC diff size <= 11 (|diff| <= 2047) — T.81 F.1.2.1/F.1.2.2. At
    # high quality the Annex-K tables scale to 1 and a near-basis-aligned
    # block can quantize past that, which has no Huffman entry; clip like
    # real baseline encoders (ADVICE r8) and carry the CLAMPED DC forward
    # so encoder prediction matches what the decoder reconstructs.
    zz = [zz[0]] + [min(1023, max(-1023, v)) for v in zz[1:]]
    diff = min(2047, max(-2047, zz[0] - pred))
    size, amp = _magnitude(diff)
    code, length = dc_codes[size]
    bw.write(code, length)
    if size:
        bw.write(amp, size)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if zz[i] != 0:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        if zz[i] == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        size, amp = _magnitude(zz[i])
        code, length = ac_codes[(run << 4) | size]
        bw.write(code, length)
        bw.write(amp, size)
        run = 0
    if last_nz != 63:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return pred + diff


def encode_jpeg(
    width: int,
    height: int,
    rgb: bytes,
    *,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF encoder (Annex-K tables, libjpeg quality scaling).
    ``subsampling``: "444" (one block per component per MCU) or "420"
    (2x2 luma blocks + box-averaged chroma per MCU). ``restart_interval``
    > 0 emits a DRI segment and RSTn markers every that-many MCUs (the
    error-resilience feature real encoders use on large images; also how
    the decoder's RST path gets exercised without third-party files)."""
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    px = (
        np.frombuffer(rgb, dtype=np.uint8)
        .reshape(height, width, 3)
        .astype(np.float64)
    )
    ycc = _rgb_to_ycbcr(px)
    qlum = _quality_scale(_K_LUM, quality)
    qchr = _quality_scale(_K_CHR, quality)
    dc_l = _canonical_codes(*_DC_LUM)
    ac_l = _canonical_codes(*_AC_LUM)
    dc_c = _canonical_codes(*_DC_CHR)
    ac_c = _canonical_codes(*_AC_CHR)

    if subsampling == "444":
        hv = [(1, 1), (1, 1), (1, 1)]
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
    else:
        hv = [(2, 2), (1, 1), (1, 1)]
        ypad = _pad_to_blocks(ycc[..., 0], 2, 2)
        cb = ycc[..., 1]
        cr = ycc[..., 2]
        cbp = _pad_to_blocks(cb, 2, 2)
        crp = _pad_to_blocks(cr, 2, 2)
        cb2 = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(
            axis=(1, 3)
        )
        cr2 = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(
            axis=(1, 3)
        )
        planes = [ypad, cb2, cr2]

    hmax = max(h for h, _ in hv)
    vmax = max(v for _, v in hv)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    # edge-replicate each component plane out to full MCU coverage
    padded = [
        np.pad(
            p,
            (
                (0, 8 * hv[c][1] * mcuy - p.shape[0]),
                (0, 8 * hv[c][0] * mcux - p.shape[1]),
            ),
            mode="edge",
        )
        for c, p in enumerate(planes)
    ]

    bw = _BitWriter()
    preds = [0, 0, 0]
    n_mcu = 0
    n_rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + (n_rst % 8)])
                n_rst += 1
                preds = [0, 0, 0]
            n_mcu += 1
            for c in range(3):
                h, v = hv[c]
                qt = qlum if c == 0 else qchr
                dct_codes = dc_l if c == 0 else dc_c
                act_codes = ac_l if c == 0 else ac_c
                for by in range(v):
                    for bx in range(h):
                        y0 = (my * v + by) * 8
                        x0 = (mx * h + bx) * 8
                        block = padded[c][y0 : y0 + 8, x0 : x0 + 8]
                        preds[c] = _encode_block(
                            bw, block, qt, dct_codes, act_codes, preds[c]
                        )
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    # DQT (zigzag order on the wire)
    for tid, qt in ((0, qlum), (1, qchr)):
        zz = bytes(int(qt[ZIGZAG[i]]) for i in range(64))
        out += seg(0xFFDB, bytes([tid]) + zz)
    # SOF0
    sof = struct.pack(">BHHB", 8, height, width, 3)
    for cid, (h, v), tq in ((1, hv[0], 0), (2, hv[1], 1), (3, hv[2], 1)):
        sof += bytes([cid, (h << 4) | v, tq])
    out += seg(0xFFC0, sof)
    # DHT
    for tc_th, (bits, vals) in (
        (0x00, _DC_LUM), (0x10, _AC_LUM), (0x01, _DC_CHR), (0x11, _AC_CHR)
    ):
        out += seg(0xFFC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    # SOS
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += seg(0xFFDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing;
    stops at any non-stuffing marker (caller handles RST)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.marker: int | None = None

    def _fill(self) -> bool:
        if self.marker is not None:
            return False
        if self.pos >= len(self.data):
            return False
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 < len(self.data) and self.data[self.pos + 1] == 0x00:
                self.pos += 2
            else:
                self.marker = (
                    self.data[self.pos + 1]
                    if self.pos + 1 < len(self.data)
                    else None
                )
                return False
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._n += 8
        return True

    def bit(self) -> int:
        if self._n == 0 and not self._fill():
            raise EOFError("entropy data exhausted")
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def byte_align(self) -> None:
        self._n = 0
        self._acc = 0

    def skip_rst(self) -> None:
        """Consume an RSTn marker at the current byte position (skipping
        any stuffed 0xFF00 produced by 1-bit padding before the marker)."""
        self.byte_align()
        if self.marker is not None:
            self.marker = None
            self.pos += 2
            return
        while self.pos + 1 < len(self.data) and self.data[self.pos] == 0xFF:
            m = self.data[self.pos + 1]
            if m == 0x00:  # stuffed pad byte from 1-filling
                self.pos += 2
                continue
            if 0xD0 <= m <= 0xD7:
                self.pos += 2
                return
            break
        raise ValueError("expected RST marker")


def decode_jpeg(blob: bytes):
    """Decode a baseline (SOF0/1) or progressive (SOF2, round 9) JFIF/JPEG
    → (width, height, rgb bytes), or None when the blob is not a JPEG or
    uses an out-of-scope coding mode (arithmetic, hierarchical, 12-bit,
    sampling factors > 2)."""
    try:
        return _decode_jpeg_strict(blob)
    except (ValueError, EOFError, IndexError, struct.error, KeyError):
        return None


def _decode_jpeg_strict(blob: bytes):
    if len(blob) < 4 or blob[0:2] != b"\xff\xd8":
        return None
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[int, dict] = {}
    comps = None
    w = h = 0
    restart = 0
    progressive = False
    coef = None  # progressive: per-component zigzag coefficient arrays
    pos = 2
    while pos + 2 <= len(blob):
        if blob[pos] != 0xFF:
            return None
        # T.81 B.1.1.2: a marker may be preceded by any number of 0xFF
        # fill bytes — skip them instead of parsing 0xFFFF as a segment
        # (ADVICE r8: other encoders' spec-valid files decoded to None).
        while pos + 1 < len(blob) and blob[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(blob):
            return None
        marker = blob[pos + 1]
        if marker == 0xD9:  # EOI
            if progressive and coef is not None:
                return _reconstruct_progressive(w, h, comps, qtabs, coef)
            return None  # EOI before any decodable scan
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2  # TEM / stray RSTn: standalone, no length field
            continue
        if pos + 4 > len(blob):
            return None
        seg_len = struct.unpack(">H", blob[pos + 2 : pos + 4])[0]
        payload = blob[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    return None  # 16-bit tables: out of scope
                zz = payload[p + 1 : p + 65]
                tab = np.zeros(64, dtype=np.int32)
                for i in range(64):
                    tab[ZIGZAG[i]] = zz[i]
                qtabs[tq] = tab
                p += 65
        elif marker == 0xC4:  # DHT (possibly several tables per segment)
            p = 0
            while p < len(payload):
                tc_th = payload[p]
                bits = list(payload[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(payload[p + 17 : p + 17 + nv])
                htabs[tc_th] = _decode_table(bits, vals)
                p += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            progressive = marker == 0xC2
            prec = payload[0]
            if prec != 8:
                return None
            h, w = struct.unpack(">HH", payload[1:5])
            nc = payload[5]
            if nc not in (1, 3):
                return None
            comps = []
            for c in range(nc):
                cid, hvb, tq = payload[6 + 3 * c : 9 + 3 * c]
                ch, cv = hvb >> 4, hvb & 0x0F
                if not (1 <= ch <= 2 and 1 <= cv <= 2):
                    return None
                comps.append({"id": cid, "h": ch, "v": cv, "tq": tq})
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            return None  # lossless / arithmetic / hierarchical
        elif marker == 0xDD:  # DRI
            restart = struct.unpack(">H", payload[:2])[0]
        elif marker == 0xDA:  # SOS
            if comps is None:
                return None
            ns = payload[0]
            sel = {}
            order = []
            for s in range(ns):
                cs, td_ta = payload[1 + 2 * s : 3 + 2 * s]
                sel[cs] = (td_ta >> 4, td_ta & 0x0F)
                order.append(cs)
            scan_pos = pos + 2 + seg_len
            if not progressive:
                return _decode_scan(
                    blob, scan_pos, w, h, comps, sel, qtabs, htabs, restart
                )
            # progressive: accumulate this scan's coefficient contribution
            # and keep walking — reconstruction happens at EOI
            if coef is None:
                coef = _alloc_prog_coef(w, h, comps)
            ss, se, ahal = payload[1 + 2 * ns : 4 + 2 * ns]
            pos = _decode_progressive_scan(
                blob, scan_pos, w, h, comps, sel, order, htabs, restart,
                coef, ss, se, ahal >> 4, ahal & 0x0F,
            )
            continue
        pos += 2 + seg_len
    return None


def _decode_scan(blob, pos, w, h, comps, sel, qtabs, htabs, restart):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [
        np.zeros((8 * c["v"] * mcuy, 8 * c["h"] * mcux)) for c in comps
    ]
    rdr = _BitReader(blob, pos)
    preds = [0] * len(comps)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and n_mcu and n_mcu % restart == 0:
                rdr.skip_rst()
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                td, ta = sel[c["id"]]
                dc_tab = htabs[td]  # tc=0 → key 0x0t
                ac_tab = htabs[0x10 | ta]
                qt = qtabs[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        size = rdr.huff(dc_tab)
                        diff = _extend(rdr.bits(size), size)
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = rdr.huff(ac_tab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(rdr.bits(s), s)
                            k += 1
                        coeff = np.zeros(64)
                        coeff[ZIGZAG] = zz * qt[ZIGZAG]
                        block = (
                            _C.T @ coeff.reshape(8, 8) @ _C
                        ) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            n_mcu += 1

    up = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        up.append(p[:h, :w])
    if len(comps) == 1:
        rgb = np.clip(up[0], 0.0, 255.0)
        px = np.stack([rgb, rgb, rgb], axis=-1)
    else:
        px = _ycbcr_to_rgb(up[0], up[1], up[2])
    return w, h, np.rint(px).astype(np.uint8).tobytes()


# ---------------------------------------------------------------------------
# Progressive DCT (SOF2) — round 9, VERDICT r8 ask #6.
#
# A progressive stream carries the SAME quantized coefficients as a baseline
# one, split across scans two ways (T.81 Annex G): SPECTRAL SELECTION (each
# AC scan covers a zigzag band [Ss, Se] of ONE component; DC scans may
# interleave components in MCU order) and SUCCESSIVE APPROXIMATION (the
# first scan of a band sends coefficients at reduced precision — a point
# transform by Al — and refinement scans with Ah = Al+1 append one
# magnitude bit each). Decoding therefore accumulates into per-component
# coefficient arrays and runs the IDCT once, at EOI. The refinement-bit
# semantics (correction bits on already-nonzero history coefficients, EOB
# runs that still carry correction bits) follow T.81 G.1.2.2-G.1.2.3; the
# two's-complement |= / += tricks are the standard realization of the
# spec's magnitude-bit appends.
# ---------------------------------------------------------------------------


def _comp_blocks(w: int, h: int, c: dict, hmax: int, vmax: int):
    """Non-interleaved block grid of a component: ceil dims of the
    component's OWN sample array (T.81 A.2.2 — no MCU padding)."""
    cw = -(-w * c["h"] // hmax)
    ch = -(-h * c["v"] // vmax)
    return -(-cw // 8), -(-ch // 8)


def _alloc_prog_coef(w: int, h: int, comps: list[dict]) -> list[np.ndarray]:
    """Per-component (block_rows, block_cols, 64) zigzag-indexed coefficient
    store, padded to full MCU coverage (interleaved DC scans write the
    padding data units; reconstruction crops them away)."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    return [
        np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        for c in comps
    ]


def _decode_progressive_scan(
    blob, pos, w, h, comps, sel, order, htabs, restart, coef, ss, se, ah, al
):
    """Decode one progressive scan into ``coef``; returns the stream
    position of the marker that ended the entropy data."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    rdr = _BitReader(blob, pos)
    by_id = {c["id"]: (ci, c) for ci, c in enumerate(comps)}
    scomps = [by_id[cid] for cid in order]

    if ss == 0:  # DC scan (Se must be 0; interleaved in MCU order)
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        preds = {ci: 0 for ci, _ in scomps}
        if len(scomps) > 1:
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            units = [
                [
                    (ci, c, my * c["v"] + by, mx * c["h"] + bx)
                    for ci, c in scomps
                    for by in range(c["v"])
                    for bx in range(c["h"])
                ]
                for my in range(mcuy)
                for mx in range(mcux)
            ]
        else:
            ci, c = scomps[0]
            bw_, bh_ = _comp_blocks(w, h, c, hmax, vmax)
            units = [
                [(ci, c, by, bx)] for by in range(bh_) for bx in range(bw_)
            ]
        n_unit = 0
        for unit in units:
            if restart and n_unit and n_unit % restart == 0:
                rdr.skip_rst()
                preds = {ci: 0 for ci, _ in scomps}
            n_unit += 1
            for ci, c, by, bx in unit:
                blk = coef[ci][by, bx]
                if ah == 0:
                    td, _ = sel[c["id"]]
                    size = rdr.huff(htabs[td])
                    preds[ci] += _extend(rdr.bits(size), size)
                    blk[0] = preds[ci] << al
                elif rdr.bit():
                    blk[0] |= 1 << al  # two's complement: appends the bit
        return rdr.pos

    # AC scan: exactly one component, its own block raster (T.81 G.1.1)
    if len(scomps) != 1:
        raise ValueError("progressive AC scan must be non-interleaved")
    ci, c = scomps[0]
    _, ta = sel[c["id"]]
    actab = htabs[0x10 | ta]
    bw_, bh_ = _comp_blocks(w, h, c, hmax, vmax)
    eobrun = 0
    n_unit = 0
    for by in range(bh_):
        for bx in range(bw_):
            if restart and n_unit and n_unit % restart == 0:
                rdr.skip_rst()
                eobrun = 0
            n_unit += 1
            blk = coef[ci][by, bx]
            if ah == 0:
                eobrun = _ac_first_pass(rdr, actab, blk, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine_pass(rdr, actab, blk, ss, se, al, eobrun)
    return rdr.pos


def _ac_first_pass(rdr, actab, blk, ss, se, al, eobrun):
    """First AC scan of a band: place coefficients at precision Al
    (T.81 G.1.2.2 — baseline run/size coding plus EOBn run symbols)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = rdr.huff(actab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r < 15:
                eobrun = (1 << r) - 1  # current block is part of the run
                if r:
                    eobrun += rdr.bits(r)
                break
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC band overflow")
        blk[k] = _extend(rdr.bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine_pass(rdr, actab, blk, ss, se, al, eobrun):
    """Refinement AC scan: one correction bit per already-nonzero
    coefficient, ±1<<Al for newly-nonzero ones (T.81 G.1.2.3; the
    traversal mirrors the reference decoder structure in Annex G)."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = rdr.huff(actab)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += rdr.bits(r)
                    break
                # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("refinement size must be 1")
                val = p1 if rdr.bit() else m1
            while k <= se:
                cur = int(blk[k])
                if cur != 0:
                    if rdr.bit() and not (cur & p1):
                        blk[k] = cur + (p1 if cur >= 0 else m1)
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if s and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:  # EOB run still carries correction bits
            cur = int(blk[k])
            if cur != 0 and rdr.bit() and not (cur & p1):
                blk[k] = cur + (p1 if cur >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct_progressive(w, h, comps, qtabs, coef):
    """Dequantize + IDCT the accumulated coefficient arrays — the baseline
    tail applied once at EOI."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for ci, c in enumerate(comps):
        qt = qtabs[c["tq"]]
        rows, cols, _ = coef[ci].shape
        plane = np.zeros((rows * 8, cols * 8))
        for by in range(rows):
            for bx in range(cols):
                nat = np.zeros(64)
                nat[ZIGZAG] = coef[ci][by, bx] * qt[ZIGZAG]
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _C.T @ nat.reshape(8, 8) @ _C
                ) + 128.0
        planes.append(plane)
    up = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        up.append(p[:h, :w])
    if len(comps) == 1:
        g = np.clip(up[0], 0.0, 255.0)
        px = np.stack([g, g, g], axis=-1)
    else:
        px = _ycbcr_to_rgb(up[0], up[1], up[2])
    return w, h, np.rint(px).astype(np.uint8).tobytes()


#: progressive AC alphabet: every (run, size) with size ≤ 10 — including
#: the EOBn symbols 0x10..0xE0 that BASELINE tables never carry (baseline
#: uses only EOB/ZRL; Annex K therefore cannot encode progressive scans).
#: All 176 symbols at canonical length 8: a legal DHT (the all-ones code
#: stays unassigned), suboptimal but table-driven decoders don't care —
#: the decoder always reads tables from the file's own DHT.
_AC_PROG = (
    [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0],
    [(r << 4) | s for r in range(16) for s in range(11)],
)

#: default progressive scan script (4:4:4): DC first with point transform,
#: spectrally-split AC first scans, then refinement scans for every band —
#: exercises all four progressive coding modes end to end
_PROG_SCANS = [
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((1,), 1, 63, 0, 1),
    ((2,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
]


class _ProgAcState:
    """Cross-block AC entropy state of one scan: the pending EOB run and,
    in refinement scans, the correction bits buffered until the run is
    flushed (T.81 G.1.2.2-3)."""

    def __init__(self, bw: _BitWriter, actab) -> None:
        self.bw = bw
        self.actab = actab
        self.eobrun = 0
        self.br: list[int] = []

    def flush(self) -> None:
        if self.eobrun > 0:
            n = self.eobrun.bit_length() - 1
            code, length = self.actab[n << 4]
            self.bw.write(code, length)
            if n:
                self.bw.write(self.eobrun - (1 << n), n)
            self.eobrun = 0
        for b in self.br:
            self.bw.write(b, 1)
        self.br = []


def encode_jpeg_progressive(
    width: int,
    height: int,
    rgb: bytes,
    *,
    quality: int = 90,
    scans=None,
) -> bytes:
    """Progressive (SOF2) JFIF encoder, 4:4:4, Annex-K tables — same
    quantized coefficients as ``encode_jpeg``, delivered as spectral-
    selection + successive-approximation scans (default script
    ``_PROG_SCANS``). Exists so the progressive decoder has spec-built
    fixtures with NO third-party files; a progressive encode must decode
    to exactly the same pixels as the baseline encode at the same
    quality (pinned in tests/test_round9_progressive.py)."""
    px = (
        np.frombuffer(rgb, dtype=np.uint8)
        .reshape(height, width, 3)
        .astype(np.float64)
    )
    ycc = _rgb_to_ycbcr(px)
    qlum = _quality_scale(_K_LUM, quality)
    qchr = _quality_scale(_K_CHR, quality)
    dc_t = [_canonical_codes(*_DC_LUM)] + [_canonical_codes(*_DC_CHR)] * 2
    ac_prog = _canonical_codes(*_AC_PROG)
    ac_t = [ac_prog, ac_prog, ac_prog]

    bh, bwid = -(-height // 8), -(-width // 8)
    coefs = []
    for c in range(3):
        plane = _pad_to_blocks(ycc[..., c], 8, 8)
        qt = qlum if c == 0 else qchr
        arr = np.zeros((bh, bwid, 64), dtype=np.int32)
        for by in range(bh):
            for bx in range(bwid):
                block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                q = np.rint(
                    (_C @ (block - 128.0) @ _C.T).reshape(-1) / qt
                ).astype(int)
                zz = q[ZIGZAG]
                zz[1:] = np.clip(zz[1:], -1023, 1023)  # same clamp as baseline
                arr[by, bx] = zz
        coefs.append(arr)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, qt in ((0, qlum), (1, qchr)):
        out += seg(
            0xFFDB, bytes([tid]) + bytes(int(qt[ZIGZAG[i]]) for i in range(64))
        )
    sof = struct.pack(">BHHB", 8, height, width, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, tq])
    out += seg(0xFFC2, sof)  # SOF2: progressive DCT
    for tc_th, spec_ in (
        (0x00, _DC_LUM), (0x10, _AC_PROG), (0x01, _DC_CHR), (0x11, _AC_PROG)
    ):
        out += seg(0xFFC4, bytes([tc_th]) + bytes(spec_[0]) + bytes(spec_[1]))

    for comps_, ss, se, ah, al in (scans or _PROG_SCANS):
        sos = bytes([len(comps_)])
        for c in comps_:
            td = 0 if c == 0 else 1
            sos += bytes([c + 1, (td << 4) | td])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xFFDA, sos)
        bw = _BitWriter()
        if ss == 0:
            if ah == 0:  # DC first: diff-code the point-transformed DC
                preds = {c: 0 for c in comps_}
                for by in range(bh):
                    for bx in range(bwid):
                        for c in comps_:
                            v = int(coefs[c][by, bx, 0]) >> al
                            size, amp = _magnitude(v - preds[c])
                            preds[c] = v
                            code, length = dc_t[c][size]
                            bw.write(code, length)
                            if size:
                                bw.write(amp, size)
            else:  # DC refinement: one raw bit per data unit
                for by in range(bh):
                    for bx in range(bwid):
                        for c in comps_:
                            bw.write(
                                (int(coefs[c][by, bx, 0]) >> al) & 1, 1
                            )
        else:
            c = comps_[0]
            st = _ProgAcState(bw, ac_t[c])
            for by in range(bh):
                for bx in range(bwid):
                    blk = coefs[c][by, bx]
                    if ah == 0:
                        _enc_ac_first(st, blk, ss, se, al)
                    else:
                        _enc_ac_refine(st, blk, ss, se, al)
            st.flush()
        bw.flush()
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _enc_ac_first(st: _ProgAcState, blk, ss, se, al) -> None:
    bw, actab = st.bw, st.actab
    r = 0
    for k in range(ss, se + 1):
        v = int(blk[k])
        t = abs(v) >> al  # AC point transform truncates toward zero
        if t == 0:
            r += 1
            continue
        st.flush()  # pending EOB run ends before this block's symbol
        while r > 15:
            code, length = actab[0xF0]
            bw.write(code, length)
            r -= 16
        size, amp = _magnitude(t if v > 0 else -t)
        code, length = actab[(r << 4) | size]
        bw.write(code, length)
        bw.write(amp, size)
        r = 0
    if r > 0:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush()


def _enc_ac_refine(st: _ProgAcState, blk, ss, se, al) -> None:
    bw, actab = st.bw, st.actab
    absv = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
    eob_idx = -1  # band index of the LAST newly-nonzero coefficient
    for i, t in enumerate(absv):
        if t == 1:
            eob_idx = i
    r = 0
    pend: list[int] = []  # correction bits awaiting the next symbol
    for i, t in enumerate(absv):
        if t == 0:
            r += 1
            continue
        # A pending zero run past 15 must emit ZRL at the FIRST nonzero —
        # history or new — while a later symbol will still cover this
        # position: the decoder assigns each buffered correction bit to
        # the symbol whose positional walk passes it, so deferring the
        # ZRL past a history coefficient would misalign the bitstream.
        while r > 15 and i <= eob_idx:
            st.flush()
            code, length = actab[0xF0]
            bw.write(code, length)
            r -= 16
            for b in pend:
                bw.write(b, 1)
            pend = []
        if t > 1:  # history coefficient: buffer its correction bit
            pend.append(t & 1)
            continue
        # newly-nonzero (t == 1)
        st.flush()
        code, length = actab[(r << 4) | 1]
        bw.write(code, length)
        bw.write(1 if int(blk[ss + i]) > 0 else 0, 1)
        for b in pend:
            bw.write(b, 1)
        pend = []
        r = 0
    if r > 0 or pend:
        st.eobrun += 1
        st.br.extend(pend)
        if st.eobrun == 0x7FFF or len(st.br) > 900:
            st.flush()
