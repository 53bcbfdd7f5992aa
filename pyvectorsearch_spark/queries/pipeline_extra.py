"""Registration shim for the cross-modal curation pipeline (defined in
queries/pipeline.py, registered OUTSIDE the driver's pinned 50-entry window
so the window stays r2-comparable; covered by tests/test_oracle_parity.py).
"""

from __future__ import annotations

from pyvectorsearch_spark.queries.pipeline import (
    ORACLE_PIPELINE_SEMANTIC,
    q_pipeline_semantic_curate,
)

QUERIES = {"pipeline_semantic_curate": q_pipeline_semantic_curate}
ORACLES = {"pipeline_semantic_curate": ORACLE_PIPELINE_SEMANTIC}
