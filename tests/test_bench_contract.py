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
