"""Round-10: the permanent in-bench host-band calibration row (VERDICT r9
ask #1) and its reuse by the profiler (ask #7).

The calibration workload must be engine-independent, deterministic, and
cheap; `bench.py`'s JSON line must carry the band fields without blowing
the driver's ~2 KB stdout capture window.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


class TestCalibration:
    def test_trial_is_deterministic_and_positive(self):
        # the fixed-seed GEMM asserts its own checksum internally; a
        # wrong answer raises inside the trial
        t = bench.calibration_trial()
        assert 0.0 < t < 30.0

    def test_run_calibration_fields(self):
        c = bench.run_calibration(trials=3)
        assert set(c) == {"min_sec", "median_sec", "band", "noise"}
        assert c["min_sec"] <= c["median_sec"]
        assert c["noise"] >= 1.0
        assert abs(c["band"] - c["min_sec"] / bench.CALIB_REF_SEC) < 0.01

    def test_bench_json_line_stays_compact(self):
        """The driver captures only the stdout tail; the JSON line with
        the new calibration fields must stay well under 2 KB (round 5
        regression: an oversized line recorded parsed: null)."""
        timings = {n: 1.234 for n in bench.HEADLINE}
        out = {
            "metric": "headline_total_sec",
            "value": round(sum(timings.values()), 3),
            "unit": "sec",
            "queries": timings,
            "sf": 0.1,
            "n": 3,
            "median_total_sec": 99.999,
            "spread_file": "/root/repo/BENCH_SPREAD.json",
            "calib_sec": 0.171,
            "spark_calib_sec": 0.712,
            "bw_gbps": 6.51,
            "host_band": 1.006,
            "value_band_normalized": 99.999,
        }
        assert len(json.dumps(out)) < 1900

    def test_normalization_never_inflates(self):
        """band < 1 (host faster than ref) must not inflate the headline:
        the normalizer divides by max(band, 1.0)."""
        assert round(30.0 / max(0.9, 1.0), 3) == 30.0
