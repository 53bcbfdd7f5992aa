"""Vector distance kernels as native Catalyst expressions.

The reference computes squared Euclidean distance with a per-coordinate loop
(``/root/reference/include/pktree.hpp:995-997`` for kNN, ``:1116-1123`` for
range search with early exit). Here each kernel is a columnar expression
(``zip_with`` + ``aggregate``) that stays inside whole-stage codegen — no
Python in the hot path. The per-coordinate early exit (``pktree.hpp:1060``)
is deliberately dropped: vectorized columnar evaluation beats short-circuiting
(SURVEY.md §4 row 5).

All math is double precision, matching the reference (``pktree.hpp:307-309``
uses double for geometry even when points are float) and the DuckDB oracle.
The left-fold accumulation order of ``aggregate`` is deterministic, so results
are reproducible bit-for-bit across runs and engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def vec_is_finite(a: Column | str) -> Column:
    """True iff the vector is non-null AND every component is non-null and
    finite (no NaN, no ±Inf) — the validity contract of the search surface.

    The raw kernels below (`l2_sq`, `dot`, …) follow SQL/IEEE semantics on
    purpose: a NULL element nulls the result, NaN propagates. That is the
    WRONG default for search operators, where a NULL/NaN distance silently
    sorts into (asc: nulls first) or out of (desc: NaN first) the top-k and
    returns garbage neighbors. The reference cannot even represent these
    states (raw C double arrays, ``pktree.hpp:1223-1250`` fixes dim at
    construction), so the Spark engine makes the contract explicit:
    ``knn_join`` / ``range_join`` / ``GridIndex.knn|range`` compile this
    predicate into the distance expression and either raise (default) or
    null-out-and-drop the row (``on_invalid="skip"``). One O(dim) codegen
    predicate per row, zero extra jobs."""
    v = _as_double(a)
    has_bad = F.exists(
        v, lambda x: x.isNull() | F.isnan(x) | (F.abs(x) == F.lit(float("inf")))
    )
    return v.isNotNull() & ~has_bad


def l2_sq(a: Column | str, b: Column | str) -> Column:
    """Squared Euclidean distance Σ(a_i − b_i)² — the reference's only metric
    (``/root/reference/include/pktree.hpp:995-997``). Returns double."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_dist(a: Column | str, b: Column | str) -> Column:
    """Euclidean distance. The reference API is asymmetric: ``search_range``
    takes a Euclidean radius and squares it (``pktree.hpp:933-938``) while kNN
    returns squared distances (caller sqrt's, ``example_cpp/main.cpp:77``).
    We expose both normalized."""
    return F.sqrt(l2_sq(a, b))


def dot(a: Column | str, b: Column | str) -> Column:
    """Inner product Σ a_i·b_i (north-star extension beyond the reference)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_l2(a: Column | str) -> Column:
    """Euclidean norm ‖a‖₂."""
    return F.sqrt(dot(a, a))


def cosine_sim(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity a·b / (‖a‖‖b‖); NULL when either norm is 0."""
    return dot(a, b) / (norm_l2(a) * norm_l2(b))


# SQL fragments for the DuckDB oracle — SAME accumulation order (left fold over
# coordinates ascending) and double math as the Spark expressions above, so
# values agree to the last bit before any rounding.
def duckdb_l2_sq(a: str, b: str, dim: int) -> str:
    return (
        f"list_sum(list_transform(range(1, {dim + 1}), i -> "
        f"(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) ^ 2))"
    )


def duckdb_dot(a: str, b: str, dim: int) -> str:
    return (
        f"list_sum(list_transform(range(1, {dim + 1}), i -> "
        f"CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def duckdb_cosine(a: str, b: str, dim: int) -> str:
    return (
        f"({duckdb_dot(a, b, dim)}) / "
        f"(sqrt({duckdb_dot(a, a, dim)}) * sqrt({duckdb_dot(b, b, dim)}))"
    )
