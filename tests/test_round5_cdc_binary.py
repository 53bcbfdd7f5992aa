"""Round-5: binary content-defined chunking (FastCDC-style gear hash).

The kernel is Python (bytes are not SQL-addressable), so the pins are
structural: chunks exactly tile the blob, boundaries are content-local
(a small byte patch disturbs only the chunks it touches), and the planted
near-dup media recover most of their storage.
"""

from __future__ import annotations

import hashlib

from pyvectorsearch_spark.operators.multimodal import (
    CDC_MIN_CHUNK,
    _cdc_chunks_bytes,
    _gear_table,
)

GEAR = _gear_table()


def _blob(seed: bytes, n: int) -> bytes:
    out = b""
    h = seed
    while len(out) < n:
        h = hashlib.md5(h).digest()
        out += h
    return out[:n]


def test_cdc_binary_chunks_tile_the_blob():
    blob = _blob(b"tile", 20_000)
    chunks = _cdc_chunks_bytes(blob, GEAR)
    pos = 0
    for off, ln, dg in chunks:
        assert off == pos
        assert hashlib.md5(blob[off : off + ln]).hexdigest() == dg
        pos += ln
    assert pos == len(blob)
    sizes = [ln for _, ln, _ in chunks[:-1]]
    assert all(s >= CDC_MIN_CHUNK for s in sizes)


def test_cdc_binary_patch_locality():
    """Overwriting 64 bytes mid-blob must leave the untouched majority of
    chunks identical — the reason CDC beats fixed-offset chunking for
    binary near-dup storage."""
    from collections import Counter

    blob = _blob(b"patch", 40_000)
    mid = len(blob) // 2
    patched = blob[:mid] + b"\x7f" * 64 + blob[mid + 64 :]
    a = Counter(dg for _, _, dg in _cdc_chunks_bytes(blob, GEAR))
    b = Counter(dg for _, _, dg in _cdc_chunks_bytes(patched, GEAR))
    common = sum((a & b).values())
    assert common >= 0.8 * sum(a.values())


def test_cdc_binary_gear_table_is_deterministic():
    assert GEAR == _gear_table()
    assert GEAR[0] == int(hashlib.md5(b"gear:0").hexdigest()[:12], 16)
    assert len(set(GEAR)) == 256  # 48-bit values: collisions would be a bug


def test_cdc_binary_query_recovers_planted_dups(spark):
    """The planted audio/image near-dups differ by a 64/24-byte patch, so
    per-kind dedup ratio must be positive for audio and image and zero for
    video (no planted dups)."""
    from pyvectorsearch_spark.queries.multimodal_extra import (
        q_multimodal_cdc_dedup,
    )

    rows = {r.kind: r for r in q_multimodal_cdc_dedup(spark, "unused").collect()}
    assert rows["audio"].dedup_ratio > 0.05
    assert rows["image"].dedup_ratio > 0.03
    assert rows["video"].dedup_ratio == 0.0
    for r in rows.values():
        assert r.distinct_bytes <= r.total_bytes
