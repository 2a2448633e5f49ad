"""Driver-contract guard for bench.py's final stdout line (r10):
the driver records only the last 2000 bytes of stdout, so the line
must stay parseable from such a tail no matter how the surface grows."""

from __future__ import annotations

import json


def _record(n_entries: int, n_variants: int) -> dict:
    queries = {}
    for i in range(n_entries):
        name = f"some_rather_long_entry_name_number_{i:03d}"
        queries[name] = 1234.567
        for j in range(n_variants):
            queries[f"{name}.variant_{j}"] = 999.999
    return {
        "metric": "headline_queries_wall",
        "value": 99999.999,
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
        "outlier_reruns": {"a": {}, "b": {}},
        "host_probe": {
            "start": {"py_ms": 1, "blas_ms": 2, "spark_job_ms": 393.3},
            "end": {"py_ms": 1, "blas_ms": 2, "spark_job_ms": 82.2},
        },
        "errors": {"q": "boom"},
    }


def test_compact_line_fits_tail_window_at_current_surface():
    from bench import BENCH_QUERIES, compact_line

    rec = _record(0, 0)
    # the REAL entry names (the synthetic ones above are padded far
    # wider than anything in the registry) + 8 dotted variants each
    for n in BENCH_QUERIES:
        rec["queries"][n] = 1234.567
        for j in range(8):
            rec["queries"][f"{n}.variant_{j}"] = 999.999
    line = compact_line(rec, "BENCH_local.json")
    assert len(line) < 1950
    d = json.loads(line)
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in d
    assert len(d["queries"]) == len(BENCH_QUERIES)
    assert d["n_errors"] == 1


def test_compact_line_truncates_rather_than_overflow():
    from bench import compact_line

    rec = _record(200, 0)  # absurdly wide surface
    line = compact_line(rec, "BENCH_local.json")
    assert len(line) < 1950
    d = json.loads(line)
    assert d["queries_truncated_to_top10"] is True
    assert len(d["queries"]) == 10
    assert d["n_slots"] == 200  # the true count survives truncation


def test_detect_round_reads_newest_driver_artifact(tmp_path, monkeypatch):
    """One canonical record name per round (VERDICT r10 #5): the
    current round = newest driver BENCH_r{N}/CORRECTNESS_r{N} + 1,
    env-pinnable, deterministic fallback when no artifact exists."""
    from bench import detect_round

    monkeypatch.delenv("SPARK_GRAFT_ROUND", raising=False)
    assert detect_round(tmp_path) == 0  # bare repo: still deterministic
    (tmp_path / "BENCH_r3.json").write_text("{}")
    (tmp_path / "CORRECTNESS_r10.json").write_text("{}")
    (tmp_path / "BENCH_r9_local.json").write_text("{}")  # not a driver file
    (tmp_path / "BENCH_sf10_r12.json").write_text("{}")  # not a driver file
    assert detect_round(tmp_path) == 11
    monkeypatch.setenv("SPARK_GRAFT_ROUND", "7")
    assert detect_round(tmp_path) == 7


def test_detect_round_matches_live_repo(monkeypatch):
    """The repo working copy itself must resolve to the round AFTER
    the newest committed driver artifact."""
    import re
    from pathlib import Path

    from bench import detect_round

    monkeypatch.delenv("SPARK_GRAFT_ROUND", raising=False)
    here = Path(__file__).resolve().parent.parent
    newest = max(
        (
            int(m.group(1))
            for p in here.glob("*.json")
            if (
                m := re.fullmatch(
                    r"(?:BENCH|CORRECTNESS)_r(\d+)\.json", p.name
                )
            )
        ),
        default=0,
    )
    assert detect_round(here) == (newest + 1 if newest else 0)
