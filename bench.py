"""Benchmark runner — the driver's per-round feedback loop.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full compute, no
driver collect).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

# Headline set: one per operator family; extended as the surface grows.
BENCH_QUERIES = [
    "pricing_summary",
    "flagship_revenue",
    "top_orders",
    "outer_join_agg",
    "two_tier_lookup",
    "grouping_multi",
    "window_running",
    "window_rank",
    "session_windows",
    "asof_join",
    "dedup_exact",
    "near_dup_jaccard",
    "near_dup_hash",
    "cosine_topk",
    "ann_variants",
    "event_windows",
    "dist_stats",
    "text_metrics",
    "json_props",
    "range_join_events",
    "stats_moments",
    "salted_agg",
    "trade_analytics",
    "subquery_counts",
    "statement_pipeline",
    "vendor_enrich",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from accounting_etl_spark.registry import all_queries
    from accounting_etl_spark.session import get_spark

    spark = get_spark("bench")
    qs = all_queries()
    names = [n for n in BENCH_QUERIES if n in qs]

    # Warm the JVM + parquet footers once so timings measure the queries.
    qs[names[0]].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # Each query runs three times and reports the fastest pass:
    # steady-state throughput, not whole-stage-codegen compilation
    # (a per-plan one-time cost that dominates at these tiny local
    # SFs) and not scheduler jitter (fixture-bound plans vary ±50%
    # between passes under load).
    def best_of(fn, runs: int = 3) -> float:
        best = float("inf")
        for _ in range(runs):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return round(best, 3)

    timings: dict[str, float] = {}
    for name in names:
        timings[name] = best_of(qs[name].fn)
    # the total counts only top-level entries (the driver-comparable
    # set); dotted sub-keys time each union-tagged variant separately
    # so merged entries stay comparable across rounds
    total = round(sum(timings.values()), 3)
    for name in names:
        if qs[name].variants:
            for vname, vfn in qs[name].variants.items():
                timings[f"{name}.{vname}"] = best_of(vfn, runs=2)

    print(
        json.dumps(
            {
                "metric": "headline_queries_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
