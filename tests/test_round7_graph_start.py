"""Round-7: diameter-aware two-star START (VERDICT r6 ask #7).

`connected_components(start="auto")` runs a degree census (one
exchange-free aggregate) before any label round: max degree ≤ 2 means
every component is a path/cycle (diameter = component size), and
degree-2 dominance means those paths are LONG — the planted long chain
must go straight to two-star (O(log n) rounds from round 1, zero label
rounds), while pair-dominated and clique-shaped graphs keep the
min-label default."""
from __future__ import annotations

import pytest

from pyvectorsearch_spark.operators.graph import connected_components

pytestmark = pytest.mark.slow  # soak/property tier: excluded from the default (driver-visible) run, see pytest.ini (r11)


def _chain(spark, n):
    return spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "d1 long, d2 long"
    )


def test_long_chain_starts_twostar_round_one(spark):
    stats: dict = {}
    comp = connected_components(_chain(spark, 1000), _stats=stats).collect()
    assert stats["mode"] == "twostar"
    assert stats["rounds"] == 0  # ZERO label rounds spent
    assert stats["max_degree"] == 2
    assert stats["deg2_frac"] > 0.95
    got = {r.node: r.cluster for r in comp}
    assert len(got) == 1000 and set(got.values()) == {0}


def test_long_cycle_starts_twostar(spark):
    n = 500
    pairs = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "d1 long, d2 long"
    )
    stats: dict = {}
    comp = connected_components(pairs, _stats=stats).collect()
    assert stats["mode"] == "twostar" and stats["rounds"] == 0
    assert {r.cluster for r in comp} == {0}


def test_pair_dominated_graph_stays_label(spark):
    # the real small-SF dup graph shape: mostly 2-cliques (degree-1
    # endpoints), an occasional triangle — 1-round label convergence;
    # max degree is 2 but interior nodes are rare, census must NOT flip
    pairs = spark.createDataFrame(
        [(2 * i, 2 * i + 1) for i in range(30)] + [(100, 101), (101, 102), (100, 102)],
        "d1 long, d2 long",
    )
    stats: dict = {}
    got = {
        r.node: r.cluster for r in connected_components(pairs, _stats=stats).collect()
    }
    assert stats["mode"] == "label"
    assert stats["max_degree"] == 2 and stats["deg2_frac"] < 0.75
    assert got[101] == 100 and got[1] == 0


def test_mixed_graph_still_caught_by_stall_layer(spark):
    # a hub (degree > 2) hides a long chain: census says "label", the r5
    # stall fallback must still rescue it
    chain = [(i, i + 1) for i in range(200)]
    hub = [(500, x) for x in (501, 502, 503, 504)]
    pairs = spark.createDataFrame(chain + hub, "d1 long, d2 long")
    stats: dict = {}
    comp = connected_components(pairs, switch_after=3, _stats=stats).collect()
    assert stats["max_degree"] > 2  # census correctly declines
    assert stats["mode"] == "twostar" and stats["rounds"] == 3  # stall layer
    got = {r.node: r.cluster for r in comp}
    assert got[200] == 0 and got[504] == 500


def test_forced_modes_and_bad_mode(spark):
    pairs = _chain(spark, 50)
    stats: dict = {}
    a = {
        (r.node, r.cluster)
        for r in connected_components(pairs, start="twostar", _stats=stats).collect()
    }
    assert stats["mode"] == "twostar" and "max_degree" not in stats
    b = {
        (r.node, r.cluster)
        for r in connected_components(pairs, start="label", switch_after=None,
                                      max_iter=60).collect()
    }
    assert a == b
    with pytest.raises(ValueError, match="start mode"):
        connected_components(pairs, start="banana")


def test_strict_mode_skips_census(spark):
    # switch_after=None restores strict r4 behavior: no census, no dispatch
    stats: dict = {}
    with pytest.raises(RuntimeError, match="no convergence"):
        connected_components(
            _chain(spark, 60), max_iter=5, switch_after=None, _stats=stats
        )
    assert "max_degree" not in stats
