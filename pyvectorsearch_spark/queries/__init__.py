"""Query registry: every implemented operator exposed as a (spark, sf_dir) ->
DataFrame callable plus, where SQL-expressible, a DuckDB oracle string.

Modules register via the ``QUERIES`` / ``ORACLES`` dicts they export;
``__spark_entry__`` aggregates them.
"""

from pyvectorsearch_spark.queries import (  # noqa: F401
    analytic_extra,
    dedup,
    multimodal,
    relational,
    streaming,
    temporal,
    text,
    tpch_extra,
    udf,
    vector,
)


def all_queries():
    out = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def all_oracles():
    out = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out


_MODULES = [
    vector,
    relational,
    tpch_extra,
    analytic_extra,
    dedup,
    text,
    multimodal,
    streaming,
    temporal,
    udf,
]


def register(mod) -> None:
    if mod not in _MODULES:
        _MODULES.append(mod)
