"""Perturbed-corpus scale control: time the dedup/text family at a
1× and a 10× replica and print the wall ratio per slot.

Usage:
    python tools/scale_control.py SMALL_DIR BIG_DIR [entry ...]

Replicas come from tools/make_scale.py; pass ``--perturb`` there so
the 10× corpus is mostly-unique (the realistic regime) and
``--degenerate`` to plant the byte-distinct / signature-identical
blank mass (VERDICT r6 #1's stress: the identical-signature collapse
and hot-band cap must keep the banded pairing linear in it).

Each slot runs twice per dir (cache cleared between runs, best-of-2)
through the noop sink — full compute, no driver collect. Run on an
idle host; this box swings 2-3× under load (TODO.md).

A failing slot prints an ERROR row and the run continues (r9 lesson:
the sf100p dist_stats disk-exhaustion aborted the whole list and the
remaining slots never ran). For 100×+ replicas size the session to
the data: SPARK_SQL_SHUFFLE_PARTITIONS=128 keeps partitions in the
executor-memory sweet spot, SPARK_GRAFT_CHECKPOINT_DIR moves
checkpoint blocks out of the single-JVM heap onto disk, and
SPARK_DRIVER_MEMORY raises the heap itself.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEFAULT = [
    "dedup_exact",
    "near_dup_jaccard",
    "near_dup_hash",
    "near_dup_hash.minhash",
    "near_dup_hash.simhash",
    "near_dup_hash.image",
    "near_dup_hash.audio",
    "near_dup_hash.video",
    "near_dup_embedding",
    "dedup_clusters",
    "text_metrics",
    "tfidf_terms",
]


def main() -> None:
    small, big = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or DEFAULT

    from accounting_etl_spark.registry import all_queries
    from accounting_etl_spark.session import get_spark

    spark = get_spark("scale_control")
    qs = all_queries()

    def resolve(name: str):
        if "." in name:
            entry, var = name.split(".", 1)
            return qs[entry].variants[var]
        return qs[name].fn

    def best(fn, sf_dir: str) -> float:
        samples = []
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        return min(samples)

    print(f"{'slot':32s} {'1x':>8s} {'10x':>8s} {'ratio':>6s}")
    for name in names:
        try:
            fn = resolve(name)
            a = best(fn, small)
            b = best(fn, big)
        except Exception as exc:  # noqa: BLE001 — isolate per slot
            msg = f"{type(exc).__name__}: {exc}".splitlines()[0][:120]
            print(f"{name:32s} ERROR {msg}", flush=True)
            continue
        print(f"{name:32s} {a:8.2f} {b:8.2f} {b / a:6.1f}", flush=True)


if __name__ == "__main__":
    main()
