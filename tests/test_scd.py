"""Unit tests for the SCD2 merge on a hand-built dimension (sf-parity lives
in test_oracle_parity.py::scd2_merge_stats)."""

from __future__ import annotations

from pyvectorsearch_spark.operators.scd import scd2_merge


def _merge(spark, current, snapshot, batch_ts=100):
    cur = spark.createDataFrame(
        current, "k int, seg string, valid_from bigint, valid_to bigint"
    )
    snap = spark.createDataFrame(snapshot, "k int, seg string")
    return scd2_merge(cur, snap, key="k", tracked=["seg"], batch_ts=batch_ts)


def _rows(df):
    return {
        (r["k"], r["seg"], r["valid_from"], r["valid_to"]) for r in df.collect()
    }


def test_unchanged_changed_new_deleted(spark):
    current = [
        (1, "a", 0, None),  # unchanged
        (2, "b", 0, None),  # will change to b2
        (3, "c", 0, None),  # will be deleted
        (4, "old", 0, 50),  # closed history: passthrough
        (4, "d", 50, None),  # unchanged open row for 4
    ]
    snapshot = [(1, "a"), (2, "b2"), (4, "d"), (5, "e")]  # 5 is new
    got = _rows(_merge(spark, current, snapshot))
    assert got == {
        (1, "a", 0, None),
        (2, "b", 0, 100),
        (2, "b2", 100, None),
        (3, "c", 0, 100),
        (4, "old", 0, 50),
        (4, "d", 50, None),
        (5, "e", 100, None),
    }


def test_null_attribute_change_detection(spark):
    # NULL -> value and value -> NULL are both changes; NULL -> NULL is not
    current = [(1, None, 0, None), (2, "x", 0, None), (3, None, 0, None)]
    snapshot = [(1, "now"), (2, None), (3, None)]
    got = _rows(_merge(spark, current, snapshot))
    assert (1, None, 0, 100) in got and (1, "now", 100, None) in got
    assert (2, "x", 0, 100) in got and (2, None, 100, None) in got
    assert (3, None, 0, None) in got  # NULL == NULL: unchanged


def test_idempotent_on_identical_snapshot(spark):
    current = [(1, "a", 0, None), (2, "b", 7, None)]
    snapshot = [(1, "a"), (2, "b")]
    got = _rows(_merge(spark, current, snapshot))
    assert got == {(1, "a", 0, None), (2, "b", 7, None)}
