"""Profile a merged union entry against the sum of its variants.

The union-tagged entries run every variant inside ONE job; the dotted
bench keys time each variant in its own job. When the merged total
drifts above the variant sum (VERDICT r7 What's-wrong #1:
``dist_stats`` at 1.33×), this prints where the time goes: entry
best-of-N, per-variant best-of-N, the sum, and the ratio.

Usage:
    python tools/profile_entry.py ENTRY [--sf DIR] [--runs N]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("entry")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--keep-cache",
        action="store_true",
        help="bench-like warm regime: do not clear the cache between runs",
    )
    args = ap.parse_args()

    from accounting_etl_spark.registry import all_queries
    from accounting_etl_spark.session import get_spark

    spark = get_spark("profile_entry")
    q = all_queries()[args.entry]

    def best(fn) -> float:
        samples = []
        for _ in range(args.runs):
            if not args.keep_cache:
                spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        return min(samples)

    # warm JVM/footers
    q.fn(spark, args.sf).write.format("noop").mode("overwrite").save()
    entry_t = best(q.fn)
    var_ts = {}
    for vname, vfn in (q.variants or {}).items():
        var_ts[vname] = best(vfn)
    vsum = sum(var_ts.values())
    print(f"entry {args.entry}: {entry_t:.2f}s")
    for vname, t in sorted(var_ts.items(), key=lambda kv: -kv[1]):
        print(f"  {vname:12s} {t:6.2f}s")
    if vsum:
        print(f"variant sum: {vsum:.2f}s  ratio entry/sum: {entry_t / vsum:.2f}x")


if __name__ == "__main__":
    main()
