"""Dump formatted physical plans for the headline queries — the
artifact behind the scale claims in COVERAGE.md (pushdown, pruning,
broadcast selection, codegen spans).

Usage: python tools/explain_plans.py [names...] > PLANS.txt
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from accounting_etl_spark.registry import all_queries
    from accounting_etl_spark.session import get_spark
    from bench import BENCH_QUERIES

    spark = get_spark("explain")
    qs = all_queries()
    names = sys.argv[1:] or [n for n in BENCH_QUERIES if n in qs]
    sf_dir = "/root/testdata/sf0.001"
    for name in names:
        # each query's INTRINSIC plan: a previous query's persisted
        # shared subframes would otherwise substitute InMemoryRelation
        # into identical analyzed subplans session-wide
        spark.catalog.clearCache()
        print(f"\n{'=' * 72}\n{name}\n{'=' * 72}")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            qs[name].fn(spark, sf_dir).explain("formatted")
        print(buf.getvalue())


if __name__ == "__main__":
    main()
