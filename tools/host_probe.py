"""Deterministic host-speed reference for cross-round bench reading.

BENCH_r{N}_local.json swings with the box (r8: a uniform ~1.15-1.2x
on code-identical slots vs r7, reproduced in clean sessions). This
probe gives each round an OBJECTIVE host datum to normalize against:

- ``py_ms``: single-core pure-python/hashlib loop (interpreter+CPU).
- ``blas_ms``: 2000x2000 float64 matmul x3 (multicore FPU/memory BW).
- ``spark_job_ms``: mean wall of 20 trivial Spark jobs on local[32]
  (the fixed per-job scheduling overhead every tiny bench slot pays).

Usage: python tools/host_probe.py   # prints one JSON line
Record the output next to the round's bench numbers; compare ratios
before attributing a uniform bench move to code.
"""

from __future__ import annotations

import hashlib
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def probe_host(spark=None) -> dict:
    """The three probe readings as a dict — importable so bench.py can
    embed a datum directly into its JSON record (VERDICT r8 Next #1:
    the probe readings must live IN the bench artifact, not in prose
    next to it). Passing an existing SparkSession reuses it (the
    bench embeds start/end probes around its own session)."""
    t0 = time.time()
    h = b"x" * 64
    for _ in range(400_000):
        h = hashlib.md5(h).digest()
    py_ms = round((time.time() - t0) * 1000, 1)

    import numpy as np

    rng = np.random.default_rng(42)
    a = rng.random((2000, 2000))
    t0 = time.time()
    for _ in range(3):
        a @ a
    blas_ms = round((time.time() - t0) * 1000, 1)

    if spark is None:
        from accounting_etl_spark.session import get_spark

        spark = get_spark("host_probe")
    spark.range(1).count()  # warm the JVM / scheduler
    t0 = time.time()
    n_jobs = 20
    for _ in range(n_jobs):
        spark.range(1000).count()
    spark_job_ms = round((time.time() - t0) * 1000 / n_jobs, 1)
    return {"py_ms": py_ms, "blas_ms": blas_ms, "spark_job_ms": spark_job_ms}


def main() -> None:
    print(json.dumps(probe_host()))


if __name__ == "__main__":
    main()
