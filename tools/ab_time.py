"""Same-phase A/B timer for optimization grading (VERDICT r11 #6).

Times the given entries/variants with the bench's own methodology
(noop sink, best-of-N wall seconds) and brackets the run with host
probes so two back-to-back invocations (before = changes stashed,
after = changes applied) are comparable within one host phase.

Usage: python tools/ab_time.py NAME[.VARIANT] ... [--sf DIR] [--runs N]
Prints one JSON line: {"probes": {...}, "timings": {...}}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from accounting_etl_spark.registry import all_queries
    from accounting_etl_spark.session import get_spark
    from tools.host_probe import probe_host

    spark = get_spark("ab_time")
    qs = all_queries()
    probes = {"start": probe_host(spark)}
    timings: dict[str, list[float]] = {}
    for name in args.names:
        entry, _, variant = name.partition(".")
        fn = qs[entry].variants[variant] if variant else qs[entry].fn
        samples = []
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"ab: {name}")
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(round(time.time() - t0, 3))
        timings[name] = samples
    probes["end"] = probe_host(spark)
    print(json.dumps({"probes": probes, "timings": timings}))


if __name__ == "__main__":
    main()
