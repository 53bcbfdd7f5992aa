"""One-call array literals (r11 optimization round).

``F.array(*[F.lit(v) for v in vals])`` pays one py4j round trip PER ELEMENT
at plan-build time (~1 ms each on this driver) plus a CreateArray node per
array for the analyzer/optimizer to walk; the MMD-class queries build
64 × 64-element literal matrices × 3 branches that way — seconds of pure
driver compile cost, constant in data size. ``F.lit(np.ndarray)`` builds the
same array literal in ONE py4j call (Literal.create on a primitive array).

Value semantics are identical: python floats are IEEE doubles either way,
and the integer helpers emit int64, which is what the surrounding
``zip_with`` arithmetic coerces int literals to anyway (every call site
pairs the literal with an ``array<bigint>`` column or casts explicitly).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F


def lit_double_array(vals: Iterable[float]) -> Column:
    """array<double> literal in one py4j call."""
    import numpy as np

    return F.lit(np.asarray(list(vals), dtype=np.float64))


def lit_long_array(vals: Iterable[int]) -> Column:
    """array<bigint> literal in one py4j call."""
    import numpy as np

    return F.lit(np.asarray([int(v) for v in vals], dtype=np.int64))
