"""Pareto skyline (maximal-vector) operator — the classic "best trade-offs"
OLAP query (Börzsönyi et al., ICDE'01): rows no other row dominates, where a
dominator is ≤ on the minimized column, ≥ on the maximized one, and strictly
better in at least one.

Distributed shape (the standard two-phase skyline): a LOCAL skyline per
partition (vectorized numpy sweep over the partition batch — deliberately
LENIENT: it may keep extra points, never drops a true skyline point, so it
is a lossless prefilter), then an EXACT dominance anti-join over the reduced
candidate set. Random-order data shrinks to O(polylog) candidates per
partition, so the final join is candidates×candidates — bounded, never
corpus×corpus; the full table is touched exactly once, map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    *,
    minimize: str,
    maximize: str,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Exact 2-criteria Pareto skyline: rows where no other row has
    ``minimize`` ≤ and ``maximize`` ≥ with at least one strict. Ties (equal
    on both criteria) are mutually non-dominating — all kept.

    Returns the skyline rows (minimize, maximize, *keep_cols)."""
    import numpy as np
    import pandas as pd

    cols = [minimize, maximize, *keep_cols]
    slim = df.select(*[F.col(c) for c in cols])

    def local_skyline(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mn = pdf[minimize].to_numpy()
            mx = pdf[maximize].to_numpy()
            order = np.lexsort((-mx, mn))  # minimize asc, maximize desc
            best = -np.inf
            keep_idx = []
            for i in order:
                # lenient: ties on the maximize running best are kept; the
                # exact join below removes any survivor that is actually
                # dominated (e.g. equal maximize at strictly higher cost)
                if mx[i] >= best:
                    keep_idx.append(i)
                    best = max(best, mx[i])
            yield pdf.iloc[sorted(keep_idx)]

    cand = slim.mapInPandas(local_skyline, schema=slim.schema)
    a, b = cand.alias("a"), cand.alias("b")
    dominated = (
        (F.col(f"b.{minimize}") <= F.col(f"a.{minimize}"))
        & (F.col(f"b.{maximize}") >= F.col(f"a.{maximize}"))
        & (
            (F.col(f"b.{minimize}") < F.col(f"a.{minimize}"))
            | (F.col(f"b.{maximize}") > F.col(f"a.{maximize}"))
        )
    )
    # candidate set is partition-count-bounded, so the non-equi anti-join
    # (nested-loop over candidates only) is deliberate and cheap
    return a.join(b, dominated, "left_anti").select(*cols)
