"""Round-9 queries, registered AFTER the driver's pinned 50-entry window.

- ``multimodal_crossformat_lossy``: the lossy-JPEG cross-container mining
  regime, split out of the stable round-5 Hamming-0 query per ADVICE r8
  (widening the original in place made its rows-only expectation
  fixture-sensitive and changed a shipped schema).
"""

from __future__ import annotations

from pyvectorsearch_spark.queries.multimodal_extra import (
    q_multimodal_crossformat_lossy,
)

QUERIES = {
    "multimodal_crossformat_lossy": q_multimodal_crossformat_lossy,
}
#: binary decode is not SQL-expressible — rows-only, like the other
#: multimodal rows (documented in SURVEY §8.4).
ORACLES: dict[str, str] = {}
