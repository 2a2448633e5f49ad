"""Dump the formatted physical plan of a registry entry or variant.

Usage: python tools/dump_plan.py NAME[.VARIANT] [--sf DIR] [--out FILE]

The round-11 optimization deliverable (plans/r11/<q>_before.txt /
_after.txt) needs per-VARIANT plans; tools/explain_plans.py only dumps
entries. Cache is cleared first so the dump is the intrinsic plan.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+", help="entry or entry.variant")
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default=None, help="write to FILE (single name)")
    args = ap.parse_args()

    from accounting_etl_spark.registry import all_queries
    from accounting_etl_spark.session import get_spark

    spark = get_spark("dump_plan")
    qs = all_queries()
    for name in args.names:
        entry, _, variant = name.partition(".")
        q = qs[entry]
        fn = q.variants[variant] if variant else q.fn
        spark.catalog.clearCache()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            fn(spark, args.sf).explain("formatted")
        text = f"{'=' * 72}\n{name}  (sf_dir={args.sf})\n{'=' * 72}\n" + buf.getvalue()
        if args.out and len(args.names) == 1:
            Path(args.out).write_text(text)
            print(f"wrote {args.out}")
        else:
            print(text)


if __name__ == "__main__":
    main()
