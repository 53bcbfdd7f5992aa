"""Round-5: connected_components auto-dispatches to two-star on long chains.

VERDICT r4 item 2: the headline `dedup_clusters` path must not go
round-bound on a pathological chain. `connected_components` now hands the
pair table to `connected_components_twostar` (O(log n) rounds, Kiveris et
al. SoCC 2014) after `switch_after` non-converged min-label rounds.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # soak/property tier: excluded from the default (driver-visible) run, see pytest.ini (r11)


def _chain_pairs(spark, n: int):
    return spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "d1 long, d2 long"
    )


def test_long_chain_dispatches_to_twostar(spark):
    # A 300-node path has diameter 299: min-label alone needs ~299 rounds,
    # far beyond max_iter=25 — before the dispatch this raised RuntimeError.
    from pyvectorsearch_spark.operators.graph import connected_components

    stats: dict = {}
    # start="label" pins the r5 STALL layer in isolation; the r7 degree
    # census (tests/test_round7_graph_start.py) would otherwise catch this
    # chain before any label round runs
    comp = connected_components(
        _chain_pairs(spark, 300), switch_after=4, start="label", _stats=stats
    ).collect()
    assert stats["mode"] == "twostar"
    assert stats["rounds"] == 4  # label rounds spent before the handoff
    got = {r.node: r.cluster for r in comp}
    assert len(got) == 300
    assert set(got.values()) == {0}


def test_near_clique_stays_on_minlabel(spark):
    # Near-dup-shaped graph (two 4-cliques): label mode must converge in a
    # couple of rounds and never hand off — the headline dedup_clusters
    # path. (r7 note: 4-cliques, not triangles — a triangle is a 3-cycle,
    # max degree 2, which the r7 degree census legitimately classifies as
    # cycle-shaped; real dup clusters of size >= 4 keep max degree >= 3.)
    from pyvectorsearch_spark.operators.graph import connected_components

    k4a = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    k4b = [(a, b) for a in (10, 11, 12, 13) for b in (10, 11, 12, 13) if a < b]
    pairs = spark.createDataFrame(k4a + k4b, "d1 long, d2 long")
    stats: dict = {}
    got = {
        r.node: r.cluster
        for r in connected_components(pairs, _stats=stats).collect()
    }
    assert stats["mode"] == "label"
    assert stats["rounds"] <= 3
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 13: 10}


def test_switch_after_none_restores_strict_raise(spark):
    from pyvectorsearch_spark.operators.graph import connected_components

    with pytest.raises(RuntimeError, match="no convergence"):
        connected_components(
            _chain_pairs(spark, 60), max_iter=5, switch_after=None
        ).collect()


def test_dispatch_matches_minlabel_on_mixed_graph(spark):
    # Same output contract either way: a graph with one long chain and one
    # clique, computed via forced dispatch vs strict label mode.
    from pyvectorsearch_spark.operators.graph import connected_components

    rows = [(i, i + 1) for i in range(100, 140)] + [(1, 2), (2, 3), (1, 3)]
    pairs = spark.createDataFrame(rows, "d1 long, d2 long")
    via_dispatch = {
        r.node: r.cluster
        for r in connected_components(pairs, switch_after=2).collect()
    }
    strict = {
        r.node: r.cluster
        for r in connected_components(
            pairs, max_iter=60, switch_after=None
        ).collect()
    }
    assert via_dispatch == strict
