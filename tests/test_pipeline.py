"""Plan-shape and cache-key contracts for the composed curation pipeline
and the snapshot-keyed derived-data caches."""

from __future__ import annotations

import os
import time

from pyvectorsearch_spark.plans import explain_str
from tests.conftest import SF_SMOKE, SF_T2


def test_pipeline_quality_filter_is_inline(spark):
    """The quality filter must be a projection fused into the scan — no join
    against (and certainly no broadcast of) a per-document score table, the
    corpus-sized-broadcast trap."""
    from pyvectorsearch_spark.queries.pipeline import q_pipeline_curate

    df = q_pipeline_curate(spark, SF_SMOKE)
    s = explain_str(df)
    # one scan of documents: the dedup semi join consumes the SAME filtered
    # subtree; nothing re-reads the table for a score join
    assert s.count("Location: InMemoryFileIndex") <= 2, s[:3000]
    assert "LeftSemi" in s, s[:2000]  # the dedup keep-rule
    assert "Window" in s, s[:2000]  # the packing prefix sum


def test_pipeline_runs_end_to_end(spark):
    from pyvectorsearch_spark.queries.pipeline import q_pipeline_curate

    rows = q_pipeline_curate(spark, SF_T2).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["n_docs"] > 0 and r["total_chars"] > 0


def test_dataset_tag_tracks_source_mtime(tmp_path):
    """Same basename + changed mtime → different tag (regenerated testdata
    must invalidate every derived /tmp artifact)."""
    from pyvectorsearch_spark.sources.tables import dataset_tag

    sf = tmp_path / "sf0.5"
    sf.mkdir()
    f = sf / "documents.parquet"
    f.write_bytes(b"x")
    t1 = dataset_tag(str(sf), "documents")
    os.utime(f, (time.time() + 100, time.time() + 100))
    t2 = dataset_tag(str(sf), "documents")
    assert t1 != t2
    assert t1.startswith("sf0.5_") and t2.startswith("sf0.5_")
    # missing source: stable fallback, no exception
    assert dataset_tag(str(sf), "absent") == "sf0.5_0"
