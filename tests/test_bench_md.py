"""Scaling-evidence harness units: the Amdahl fit and the BASELINE.md
renderer (pure Python — no Spark session)."""

import json
import os


def _leg(pair, cores, sec, pages=1_000_000):
    return {
        "pair": pair, "cores": cores, "sec": sec, "pages": pages,
        "rounds": 5, "pages_per_sec": pages / sec,
    }


def _cx(lo, hi, legs, effs):
    return {
        "lo": lo, "hi": hi, "legs": legs,
        "pair_efficiencies": effs,
        "median_efficiency": sorted(effs)[len(effs) // 2],
        "spread": round(max(effs) - min(effs), 3),
        "calibration_probes_sec": [3.0, 3.1, 3.2],
        "probe_drift_ratio": 1.07,
        "verdict": "not_met_decidable",
    }


def test_amdahl_fit_recovers_parameters():
    """Fit on synthetic walls generated from known (B, C) must recover them."""
    import bench

    B, C = 70.0, 230.0
    legs = [
        _leg(0, 2, B + C / 2), _leg(0, 8, B + C / 8),
        _leg(1, 2, B + C / 2), _leg(1, 8, B + C / 8),
    ]
    got_B, got_C, got_b = bench._amdahl_fit(_cx(2, 8, legs, [0.45, 0.45]))
    assert abs(got_B - B) < 1e-6
    assert abs(got_C - C) < 1e-6
    assert abs(got_b - B / 5) < 1e-6


def test_write_baseline_md_renders_all_protocols(tmp_path, monkeypatch):
    """The renderer must compose every stored protocol and the fit verdict."""
    import bench

    store = {
        "crawl_8to32": _cx(
            8, 32, [_leg(0, 8, 100.0), _leg(0, 32, 90.0)], [0.28]
        ),
        "crawl_2to8": _cx(
            2, 8, [_leg(0, 2, 185.0), _leg(0, 8, 98.75)], [0.47]
        ),
        "crawl_8to32_xxl": _cx(
            8, 32, [_leg(0, 8, 160.0, 5_000_000), _leg(0, 32, 62.0, 5_000_000)],
            [0.65],
        ),
    }
    monkeypatch.setattr(bench, "_STORE_PATH", str(tmp_path / "BENCH" / "s.json"))
    os.makedirs(tmp_path / "BENCH")
    (tmp_path / "BENCH" / "s.json").write_text(json.dumps(store))
    bench._write_baseline_md(store)
    md = (tmp_path / "BENCH" / "BASELINE.md").read_text()
    assert "Protocol A (primary)" in md
    assert "Protocol A2 (saturation)" in md
    assert "Protocol A3 (round size)" in md
    assert "Amdahl fit" in md
    assert "would need rounds of" in md
    # fit on the synthetic 2->8 walls: B=70, C=230 -> per-page c and the
    # required round size must appear as a sane positive number
    assert "B ≈ 70 s" in md
