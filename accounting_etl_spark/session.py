"""SparkSession factory.

Local-mode defaults tuned per the driver environment (local[32],
single JVM). All correctness-sensitive settings are pinned here:

- ``spark.sql.session.timeZone=UTC`` — the DuckDB oracle compares
  timestamp-derived values; Spark must not apply a local zone.
- AQE on — runtime coalescing/skew handling is the 100 TB posture.
- Arrow on — every Pandas-UDF boundary is Arrow-batched.
- shuffle partitions ~= cores locally (would be set much higher on a
  real 1000-executor cluster; the value is env-overridable).
"""

from __future__ import annotations

import itertools
import os
import threading

from pyspark.sql import SparkSession

_SCRATCH_TRASH_SEQ = itertools.count()


def get_spark(app_name: str = "accounting-etl-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle = os.environ.get("SPARK_SQL_SHUFFLE_PARTITIONS", cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # runtime bloom-filter join pruning: inject a bloom filter from
        # the selective side of a join into the probe-side scan — at
        # 100 TB this prunes shuffle input the static optimizer can't
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.session.timeZone", os.environ.get("SPARK_GRAFT_TZ", "UTC"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
    )
    # Streaming state at 100 TB: the default HDFS-backed state store
    # keeps all state on the executor heap; RocksDB spills to local
    # disk with incremental checkpointing — the right provider for
    # large windowed/session/dedup state. Env-gated (default on; the
    # provider ships with Spark) so tests can pin either.
    if os.environ.get("SPARK_GRAFT_ROCKSDB", "1") == "1":
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        ).config(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing."
            "enabled",
            "true",
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def scratch_dir(spark: SparkSession, name: str) -> str:
    """Deterministic per-application scratch path for queries that
    materialize state (persisted index builds, rollup epochs, WARC
    fixtures) inside a timed run.

    ``mkdtemp`` per invocation leaked one orphan directory per
    bench/gate run (ADVICE r5); instead state lives at
    ``$TMPDIR/etl_spark_state/<applicationId>/<name>`` — repeated
    invocations in one session overwrite in place, and stale
    directories of OTHER applications are swept best-effort on entry
    when old enough that their owner is surely gone (age gate: a
    concurrently-running sibling process keeps its state)."""
    import shutil
    import tempfile
    import time

    root = os.path.join(tempfile.gettempdir(), "etl_spark_state")
    app = spark.sparkContext.applicationId
    os.makedirs(root, exist_ok=True)
    cutoff = time.time() - 6 * 3600
    for entry in os.listdir(root):
        if entry == app:
            continue
        p = os.path.join(root, entry)
        try:
            # writes land nested under <app>/<name>/ without bumping
            # the app root's mtime, so a >6h-running sibling would
            # look stale at the root: gate on the NEWEST mtime found
            # anywhere under the entry (ADVICE r6). Any single fresh
            # mtime proves liveness — stop walking the instant one is
            # found so a live sibling's large tree costs one stat, not
            # a full traversal.
            newest = os.path.getmtime(p)
            for dirpath, _dirs, files in os.walk(p):
                if newest >= cutoff:
                    break
                newest = max(newest, os.path.getmtime(dirpath))
                for f in files:
                    newest = max(
                        newest, os.path.getmtime(os.path.join(dirpath, f))
                    )
        except OSError:
            continue
        if newest < cutoff:
            shutil.rmtree(p, ignore_errors=True)
    path = os.path.join(root, app, name)
    # wipe-in-place without paying the delete on the caller's clock:
    # atomically rename the old tree aside, delete it on a background
    # thread (a crashed run's orphaned *.trash.* dirs fall under the
    # same age sweep above via the app dir)
    if os.path.lexists(path):
        trash = f"{path}.trash.{next(_SCRATCH_TRASH_SEQ)}"
        try:
            os.rename(path, trash)
        except OSError:
            shutil.rmtree(path, ignore_errors=True)
        else:
            threading.Thread(
                target=shutil.rmtree,
                args=(trash,),
                kwargs={"ignore_errors": True},
                daemon=True,
            ).start()
    os.makedirs(path, exist_ok=True)
    # keep our own liveness visible at the root for cheap checks
    try:
        os.utime(os.path.join(root, app))
    except OSError:
        pass
    return path


def scratch_path(spark: SparkSession, name: str) -> str:
    """The :func:`scratch_dir` location WITHOUT wiping it — for
    callers that want to reuse state a prior invocation built in this
    session (e.g. the bench's index-serve timing reading the index
    its build twin wrote). Creates parents; never deletes."""
    import tempfile

    root = os.path.join(tempfile.gettempdir(), "etl_spark_state")
    path = os.path.join(root, spark.sparkContext.applicationId, name)
    os.makedirs(path, exist_ok=True)
    return path
