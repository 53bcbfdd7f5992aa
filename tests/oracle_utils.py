"""Mimic the driver's DuckDB-oracle comparison locally: run a Spark query and
its oracle SQL on the same sf dir, compare row count, column names, and
order-insensitive values. Used by tests so the real correctness gate
(CORRECTNESS_r{N}.json) holds no surprises."""

from __future__ import annotations

import math
import numbers
from decimal import Decimal

from pyvectorsearch_spark.sources.tables import TABLES


def register_duckdb_views(con, sf_dir: str) -> None:
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )


def _norm_cell(v):
    """Normalize a cell, keeping the numeric CLASS (int vs float) distinct.

    The driver's value hash distinguishes 5 from 5.0 (r01 evidence: two
    queries whose only Spark/DuckDB divergence was DuckDB's sum(int) ->
    HUGEINT -> pandas float64 hash-failed while matching numerically), so
    the local gate must be exactly as strict: integer-family values compare
    equal across widths (int32/int64 both pass the driver) but never equal
    to a float of the same magnitude.
    """
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", bool(v))
    if isinstance(v, numbers.Integral):  # python int + numpy int8..64
        return ("i", int(v))
    if isinstance(v, Decimal):
        return ("f", round(float(v) + 0.0, 9))
    if isinstance(v, numbers.Real):  # python float + numpy float32/64
        f = float(v)
        if math.isnan(f):
            return ("f", "NaN")
        # kill -0.0 and representation noise below the rounding we emit
        return ("f", round(f + 0.0, 9))
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    try:  # numpy arrays (Spark array cols come back as np.ndarray)
        import numpy as np

        if isinstance(v, np.ndarray):
            return tuple(_norm_cell(x) for x in v.tolist())
    except ImportError:
        pass
    return v


def _normalize(pdf):
    cols = sorted(pdf.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in pdf[cols].itertuples(index=False)]
    return cols, sorted(rows, key=repr)


def compare_query(spark_df, sql: str, con) -> tuple[bool, str]:
    s_pdf = spark_df.toPandas()
    d_pdf = con.sql(sql).df()
    s_cols, s_rows = _normalize(s_pdf)
    d_cols, d_rows = _normalize(d_pdf)
    if s_cols != d_cols:
        return False, f"column mismatch: spark={s_cols} duckdb={d_cols}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    if s_rows != d_rows:
        diff_s = [r for r in s_rows if r not in set(d_rows)][:5]
        diff_d = [r for r in d_rows if r not in set(s_rows)][:5]
        return False, f"value mismatch; spark-only={diff_s} duckdb-only={diff_d}"
    return True, "ok"
