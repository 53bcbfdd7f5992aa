"""Round-7: multi-level descent ladder for the distributed grid search.

The round-5 two-stage descent expanded surviving COARSE_TARGET ancestors
straight to their fine members — a per-ancestor fan-out of
n_cells/COARSE_TARGET that reintroduced the |Q|·cells quadratic at sf10
(measured: one stage ground 30+ minutes at 4M probes × ~12.5k cells;
10.4× for 10× rows after the ladder). `_descent_ladder` now yields levels
whose grouped-cell estimates grow ~DESCENT_BRANCH× per stage, so every
stage's pair table is O(|Q| · survivors · branch) at any index depth.

Exactness of the laddered search is pinned by
tests/test_round7_grid_stress.py (1e5 cells, brute-force-equal) and the
grid parity queries; THIS file pins the ladder's shape properties.
"""
from __future__ import annotations

from pyvectorsearch_spark.index.grid import GridIndex


def _fake_index(hist: dict[int, int]) -> GridIndex:
    # _descent_ladder touches only the level histogram (via _local_stats)
    stats = []
    for lvl, n in hist.items():
        for i in range(n):
            stats.append((f"{lvl}_{i}", lvl, (i,), 1))
    return GridIndex(
        df=None, stats_df=None, _local_stats=stats,
        origin=[0.0], width=1.0, dim=1, rank=3, rr=2, ratio=2,
        fine_level=max(hist) if hist else 0, id_col="id", vec_col="v",
    )


class TestDescentLadder:
    def test_strictly_increasing_and_bounded_growth(self):
        # deep pyramid: 100k cells concentrated at deep levels
        hist = {lvl: n for lvl, n in
                [(0, 10), (4, 200), (8, 3000), (12, 30000), (16, 70000)]}
        idx = _fake_index(hist)
        ladder = idx._descent_ladder()
        assert ladder == sorted(set(ladder)), "ladder must strictly increase"
        assert len(ladder) >= 2, "deep index must get a multi-stage ladder"
        # stage i's grouped estimate obeys the geometric schedule
        target = idx.COARSE_TARGET
        for lv in ladder:
            assert idx._grouped_est(lv) <= target
            target *= idx.DESCENT_BRANCH
        # the last ladder stage is strictly coarser than the fine table
        n = sum(hist.values())
        assert idx._grouped_est(ladder[-1]) < n

    def test_first_stage_matches_coarse_level(self):
        hist = {6: 4000, 8: 8000}
        idx = _fake_index(hist)
        assert idx._descent_ladder()[0] == idx._coarse_level()

    def test_shallow_index_single_stage(self):
        # barely above COARSE_THRESHOLD: one coarse stage suffices
        hist = {3: 2500}
        idx = _fake_index(hist)
        ladder = idx._descent_ladder()
        assert ladder == [idx._coarse_level()]

    def test_fanout_per_stage_is_bounded(self):
        hist = {lvl: n for lvl, n in
                [(0, 10), (4, 200), (8, 3000), (12, 30000), (16, 70000)]}
        idx = _fake_index(hist)
        ladder = idx._descent_ladder()
        ests = [idx._grouped_est(lv) for lv in ladder] + [sum(hist.values())]
        for a, b in zip(ests, ests[1:]):
            # each expansion is bounded well below the pre-ladder
            # n_cells/COARSE_TARGET blowup; the schedule allows ~BRANCH with
            # histogram-granularity slack
            assert b / max(a, 1) <= idx.DESCENT_BRANCH * 8

    def test_empty_hist(self):
        idx = _fake_index({})
        assert idx._descent_ladder() == [0]


class TestTailGate:
    """r9 (VERDICT r8 #3): past TAIL_GATE_CELLS the ladder must also bound
    the IMPLICIT final fine expansion — the r8 capacity run paid a ~13×
    tail fan-in at 1.05M cells (607 s for 1000 probes)."""

    DEEP = {16: 70_000, 18: 400_000, 20: 600_000}  # 1.07M cells

    def test_tail_fanin_bounded_on_deep_grid(self):
        idx = _fake_index(self.DEEP)
        ladder = idx._descent_ladder()
        n = sum(self.DEEP.values())
        assert n / idx._grouped_est(ladder[-1]) <= idx.TAIL_FAN

    def test_appended_stages_still_contract_and_increase(self):
        idx = _fake_index(self.DEEP)
        ladder = idx._descent_ladder()
        n = sum(self.DEEP.values())
        assert ladder == sorted(set(ladder))
        ests = [idx._grouped_est(lv) for lv in ladder]
        assert all(a < b for a, b in zip(ests, ests[1:]))
        assert ests[-1] * 2 < n  # never within 2× of fine (r7 negative)

    def test_below_gate_schedule_unchanged(self):
        # the 103k-cell fixture of the tests above sits below the gate:
        # the schedule must stay the pure geometric one (no tail stages),
        # protecting the measured sf10/headline regimes
        hist = {0: 10, 4: 200, 8: 3000, 12: 30000, 16: 70000}
        idx = _fake_index(hist)
        ladder = idx._descent_ladder()
        target = idx.COARSE_TARGET
        for lv in ladder:
            assert idx._grouped_est(lv) <= target
            target *= idx.DESCENT_BRANCH
