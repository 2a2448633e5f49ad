"""Dump the formatted physical plan of a registry entry or variant.

Usage: python tools/dump_plan.py NAME[.VARIANT] [--sf DIR] [--out FILE]
       [--keep-checkpoints]

The optimization deliverable (plans/r{N}/<q>_before.txt / _after.txt)
needs per-VARIANT plans; tools/explain_plans.py only dumps entries.
Cache is cleared first so the dump is the intrinsic plan.

Checkpoint handling (VERDICT r11 #1): by default the dump sets
``SPARK_GRAFT_NO_CHECKPOINT=1`` so ``stable_checkpoint`` is a no-op and
the dumped plan shows the FULL logical structure instead of
``Scan ExistingRDD`` stubs — 10 of the 12 r11 dumps were vacuously
identical because every checkpoint truncated the interesting subtree.
The dumped plan is therefore the PRE-checkpoint shape: at execution
time each ``stable_checkpoint`` site materializes its subtree once and
re-reads it, so a subtree appearing N times in the dump executes once
when it is checkpointed in the real pipeline (the dump header carries
this caveat). ``--keep-checkpoints`` restores the old behaviour.

Side-effect caveat (ADVICE r11): building a plan CALLS the query
function, and some variants execute work at plan-build time (driver
collects, index builds, scratch-dir wipes — e.g. near_dup_hash.crawl
writes and wipes its WARC scratch). Dumping such a variant mutates
session state and can race a concurrently running bench; the
``SIDE_EFFECTFUL`` list below triggers a warning, not a refusal.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Variants whose plan BUILD executes jobs / mutates scratch state
# (driver-side epoch loops, index builds, collects). Dumping them is
# allowed but warned about — never dump these while a bench is running.
SIDE_EFFECTFUL = {
    "near_dup_hash.crawl",
    "near_dup_hash.incr",
    "tfidf_terms.bm25_index",
    "tfidf_terms.bm25_index_build",
    "tfidf_terms.bm25_index_serve",
    "ann_variants.pidx",
    "ann_variants.admit",
    "near_dup_jaccard.admit",
    "dist_stats.kmeans",
    "event_windows.rollup",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+", help="entry or entry.variant")
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default=None, help="write to FILE (single name)")
    ap.add_argument(
        "--keep-checkpoints",
        action="store_true",
        help="dump the executed (checkpoint-truncated) plan instead of "
        "the full pre-checkpoint structure",
    )
    args = ap.parse_args()

    if not args.keep_checkpoints:
        os.environ["SPARK_GRAFT_NO_CHECKPOINT"] = "1"

    from accounting_etl_spark.registry import all_queries
    from accounting_etl_spark.session import get_spark

    spark = get_spark("dump_plan")
    qs = all_queries()
    mode = (
        "checkpoint-truncated (executed shape)"
        if args.keep_checkpoints
        else "pre-checkpoint (full structure; each stable_checkpoint "
        "site materializes once at execution)"
    )
    for name in args.names:
        entry, _, variant = name.partition(".")
        q = qs[entry]
        fn = q.variants[variant] if variant else q.fn
        if name in SIDE_EFFECTFUL:
            print(
                f"WARNING: {name} executes jobs / mutates scratch state "
                "at plan-build time — do not dump while a bench runs",
                file=sys.stderr,
            )
        spark.catalog.clearCache()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            fn(spark, args.sf).explain("formatted")
        text = (
            f"{'=' * 72}\n{name}  (sf_dir={args.sf})\n"
            f"checkpoints: {mode}\n{'=' * 72}\n" + buf.getvalue()
        )
        if args.out and len(args.names) == 1:
            Path(args.out).write_text(text)
            print(f"wrote {args.out}")
        else:
            print(text)


if __name__ == "__main__":
    main()
