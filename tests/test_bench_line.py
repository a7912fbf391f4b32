"""Pin the graded bench artifact's compact line under the driver's
tail-capture window.

Round 12's graded record was ``parsed: null``: the stage-1 compact line
measured 2,028 bytes against a driver capture window measured at EXACTLY
2,000 bytes, so the first 28 bytes were clipped and the JSON never
parsed.  ``bench._compact_line`` now budgets 1,900 bytes (100 bytes of
headroom) and its stage-2 slimming must (a) actually land under that
budget on a worst-case result dict and (b) preserve every graded
quantity.  This test fails if either regresses — e.g. if a future round
adds enough tier keys to push stage 2 back over the window without also
widening the drop set.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


def _worst_case_result() -> dict:
    """A result dict strictly LARGER than any real round has produced:
    round-12's real artifact (the largest to date, 2,750 bytes at stage
    1) plus headroom — four extra LLM-tier queries, an extra sf1 query,
    and max-width floats everywhere a real run emits rounded ones."""
    pt = {"0.1": 0.123456, "1": 1.234567, "10": 12.345678}
    scaling_q = {
        "spark_sec": dict(pt),
        "spark_slope_per_sf": 0.123456,
        "spark_slope_iqr": [0.111111, 0.222222],
        "duckdb_sec": dict(pt),
        "duckdb_slope_per_sf": 0.123456,
        "duckdb_slope_iqr": [0.111111, 0.222222],
        "slope_ratio": 12.34,
        "slope_ratio_range": [11.11, 22.22],
    }
    layout = {
        "build_sec": {"1": "cached", "10": "cached"},
        "q3_sec": {"1": 0.123456, "10": 1.234567},
        "q3_sec_median": {"1": 0.123456, "10": 1.234567},
        "slope_per_sf": 0.123456,
        "slope_iqr": [0.111111, 0.222222],
        "flat_within_noise": False,
        "graded_slope_per_sf": 0.123456,
        "slope_ratio": 12.34,
    }
    llm_keys = [
        "q12", "q13", "q24", "q38", "q40", "q41", "q42", "q43", "q49",
        "q51", "q52", "q53", "q54", "q55", "q64", "q78", "q79", "q80",
        "q81", "q82", "q84", "q85", "q86", "q87", "q98", "q99", "q101",
        "q110", "q121", "q121op",
    ]
    sf1_queries = {f"q{i}": 10.123456 for i in range(1, 9)}
    return {
        "unit": "sec",
        "sf": 0.1,
        "metric": "headline_q1_q7_total_warm",
        "value": 12.345678,
        "queries": {f"q{i}": 10.123456 for i in range(1, 8)},
        "floor_sec": 0.123456,
        "py_floor_sec": 0.2,
        # round-19 additive phase-robustness keys (verdict r18 ask #3)
        "reps": 4,
        "med": {f"q{i}": 10.123456 for i in range(1, 8)},
        "nof": {f"q{i}": 10.123456 for i in range(1, 8)},
        "llm": {k: 10.123456 for k in llm_keys},
        "llm_med": {k: 10.123456 for k in llm_keys},
        "llm_reps": 3,
        "sf1": {
            "queries": sf1_queries,
            "duckdb_warm": dict(sf1_queries),
            "total": 12.345678,
            "duckdb_total": 1.234567,
            "ratio_gross": {k: 99.123456 for k in sf1_queries},
            "floor_sec": 0.123456,
            "py_floor_sec": 0.21,
            "ratio_net_of_floor": {k: 99.123456 for k in sf1_queries},
        },
        "scaling": {
            "q1": dict(scaling_q),
            "q3": dict(scaling_q),
            "q44": dict(scaling_q),
            "dedup": dict(scaling_q),
        },
        "bucketed_q3": dict(layout),
        "denorm_q3": dict(layout),
        "rollup_q1": {
            **layout,
            "q1_sec": {"1": 0.123456, "10": 1.234567},
            "q1_sec_median": {"1": 0.123456, "10": 1.234567},
        },
        "ivf_q44": {
            **layout,
            "probe_sec": {"1": 0.515234, "10": 0.531234},
            "n_clusters": 32,
            "n_probe": 4,
            "vs_bruteforce": 12.34,
        },
        "skew": {
            "rows": 4000000,
            "hot_frac": 0.9,
            "plain_sec": 11.234567,
            "salted_sec": 10.234567,
            "speedup": 12.34,
            "results_identical": True,
        },
    }


def test_compact_line_fits_driver_window():
    line = bench._compact_line(_worst_case_result())
    assert len(line) <= 1900, (
        f"compact bench line is {len(line)} bytes; the driver's "
        "tail-capture window is 2,000 bytes (measured round 12) and the "
        "contract budget is 1,900"
    )
    # and it must still be valid JSON
    json.loads(line)


def test_compact_line_preserves_graded_quantities():
    d = json.loads(bench._compact_line(_worst_case_result()))
    # driver contract keys
    for k in ("metric", "value", "unit", "queries", "sf"):
        assert k in d
    assert len(d["queries"]) == 7
    # round-19 phase-robustness keys survive every slimming stage short
    # of the never-expected stage 3 (PERF needs them to phase-normalize)
    assert len(d["med"]) == 7 and len(d["nof"]) == 7 and d["reps"] == 4
    # every LLM-tier per-query time survives
    assert len(d["llm"]) == 30
    # graded scaling quantities survive for every scaling query
    for q in ("q1", "q3", "q44", "dedup"):
        sq = d["scaling"][q]
        for k in ("spark_slope_per_sf", "duckdb_slope_per_sf",
                  "slope_ratio", "slope_ratio_range"):
            assert k in sq, f"scaling.{q}.{k} dropped from compact line"
    # layout/deployment tiers keep their graded ratios
    for tier in ("bucketed_q3", "denorm_q3", "rollup_q1", "ivf_q44"):
        assert "slope_ratio" in d[tier], f"{tier}.slope_ratio dropped"
        assert "graded_slope_per_sf" in d[tier]
    assert "vs_bruteforce" in d["ivf_q44"]
    # sf1 absolutes + totals survive (floor-nets are diagnostic-only,
    # demoted to bench_full.json per the round-12 verdict)
    assert "queries" in d["sf1"] and "total" in d["sf1"]
    assert "duckdb_total" in d["sf1"]
    # skew keeps its graded verdict pair
    assert d["skew"]["speedup"] == 12.34
    assert d["skew"]["results_identical"] is True


def test_real_round12_artifact_fits():
    """The actual round-12 verbose sidecar — the largest real result dict
    to date and the one that broke the window — must compact under
    budget with its graded scaling keys intact."""
    full_path = Path(__file__).resolve().parents[1] / "bench_full.json"
    if not full_path.exists():
        return
    full = json.loads(full_path.read_text())
    line = bench._compact_line(full)
    assert len(line) <= 1900
    d = json.loads(line)
    if "scaling" in d:
        for q in d["scaling"]:
            assert "slope_ratio" in d["scaling"][q]


def test_compact_line_survives_all_tiers_erroring():
    """Degenerate worst case: every diagnostic tier failed and recorded
    a ~240-char error string. Error strings are not in any drop set, so
    without stage-3 truncation nine of them alone would overflow the
    2,000-byte capture window — the one shape that must NEVER be
    unparseable is the one reporting that everything broke."""
    base = _worst_case_result()
    err = "tier rc=-1: " + "x" * 228
    result = {
        k: ({"error": err} if isinstance(v, dict) and k not in ("queries",) else v)
        for k, v in base.items()
    }
    line = bench._compact_line(result)
    assert len(line) <= 1900
    d = json.loads(line)
    assert d["queries"] == {k: round(v, 3) for k, v in base["queries"].items()}
    assert "error" in d["scaling"] or "error" in d.get("llm", {})
