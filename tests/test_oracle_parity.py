"""The local mirror of the driver's t2 correctness gate: every queries() entry
that declares an oracle must match DuckDB exactly at sf0.01."""

from __future__ import annotations

import pytest

from tests.conftest import SF_T2
from tests.oracle_utils import compare_query, register_duckdb_views


def _cases():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    return sorted(o.keys()), q, o


NAMES, _Q, _O = _cases()


@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity(name, spark, duck):
    register_duckdb_views(duck, SF_T2)
    df = _Q[name](spark, SF_T2)
    ok, msg = compare_query(df, _O[name], duck)
    assert ok, f"{name}: {msg}"


def test_every_query_has_entry_or_documented_omission():
    names, q, o = _cases()
    missing = set(o) - set(q)
    assert not missing, f"oracles without queries: {missing}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
