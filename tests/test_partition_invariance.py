"""Partition-count invariance: the determinism ladders claim results are a
pure function of the DATA — so changing the shuffle width must change
NOTHING. This is the meta-test behind every oracle row: a hidden dependence
on partition order (float accumulation order, first-row-wins ties,
partition-local ids) shows up here as a diff between two widths.

Queries chosen for maximal sensitivity: order-independent checksums (XOR),
argmax tie-breaks, float micro-ladders, window ranks, and the iterative
CC/LPA loops."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE

pytestmark = pytest.mark.slow  # soak/property tier: excluded from the default (driver-visible) run, see pytest.ini (r11)

SENSITIVE = [
    ("audit_checksums", None),
    ("audit_merkle_ranges", None),
    ("dedup_clusters", None),
    ("dedup_modularity", None),
    ("events_ks_drift", None),
    ("orders_mad_outliers", None),
    ("text_char_entropy", None),
    ("embedding_silhouette", None),
    ("events_haar_energy", None),
    ("layout_rendezvous", None),
    ("sample_group_kfold", None),
    ("orders_bootstrap_ci", None),
]


def _rows(df):
    cols = sorted(df.columns)
    return sorted(repr(t) for t in df[cols].toPandas().itertuples(index=False))


@pytest.mark.parametrize("name,_", SENSITIVE)
def test_partition_count_invariance(spark, name, _):
    import __spark_entry__ as e

    q = e.queries()[name]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _rows(q(spark, SF_SMOKE))
        spark.conf.set("spark.sql.shuffle.partitions", "11")
        b = _rows(q(spark, SF_SMOKE))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b, f"{name}: result depends on shuffle partitioning"
