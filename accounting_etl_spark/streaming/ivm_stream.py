"""Continuously maintained join view — the streaming twin of
operators/ivm.py (what Materialize / Flink SQL keep alive under a
standing query), with BUCKET-SHARDED state so an epoch rewrites only
the key ranges it touches.

State layout (the `streaming/rollup.py` snapshot discipline, three
tables instead of one): the A-side bag, B-side bag and view bag are
each stored as immutable ``epoch=<id>/__pb=<bucket>`` parquet
directories behind ONE atomically-swapped JSON manifest mapping
``table -> bucket -> live directory``. The bucket is
``pmod(xxhash64(join key), n_buckets)`` — a view row lives in its
join key's bucket, so the delta of an epoch can only touch the
buckets of the keys present in that epoch's input deltas:

- reads: only the TOUCHED buckets of A/B/V are loaded (per-epoch
  roots with a partition-pruning ``__pb IN (...)`` filter);
- compute: ``ΔV = ΔA ⋈ B + A ⋈ ΔB + ΔA ⋈ ΔB`` over those buckets
  (operators/ivm.py); new A/B/V bucket states are bag unions;
- writes: fresh ``epoch=<id>`` directories for the touched buckets
  only — untouched buckets keep their live directories. Cost per
  epoch scales with the delta's key footprint, never the view size.

Exactly-once: a committed epoch id in the manifest returns early on
replay; an uncommitted replay recomputes the same merge from the
still-live manifest and overwrites its own directories before the
swap (the crawl/rollup sink contract).
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ivm import MULT, bag_union, join_view_delta

_TABLES = ("a", "b", "v")


def _manifest_path(state_dir: str) -> str:
    return os.path.join(state_dir, "_MANIFEST.json")


def _read_manifest(state_dir: str) -> dict:
    try:
        with open(_manifest_path(state_dir)) as f:
            return json.load(f)
    except OSError:
        return {"epochs": [], "tables": {t: {} for t in _TABLES}}


def _swap_manifest(state_dir: str, manifest: dict) -> None:
    os.makedirs(state_dir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=state_dir, suffix=".manifest.tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, _manifest_path(state_dir))


def _bucket(on: str, n_buckets: int):
    return F.pmod(F.xxhash64(F.col(on)), F.lit(n_buckets)).cast("string")


def _read_buckets(
    spark: SparkSession,
    mapping: dict[str, str],
    buckets: list[str],
    template: DataFrame,
) -> DataFrame:
    """Live state of the given buckets: per-epoch pruned reads
    (one listed root per epoch, `__pb IN (...)` partition filter),
    empty-typed frame when nothing is live yet."""
    live = {b: mapping[b] for b in buckets if b in mapping}
    if not live:
        return template.where(F.lit(False))
    by_epoch: dict[str, list[str]] = {}
    for b, path in live.items():
        by_epoch.setdefault(os.path.dirname(path), []).append(b)
    parts = [
        spark.read.parquet(root)
        .where(F.col("__pb").isin(sorted(bs)))
        .drop("__pb")
        for root, bs in sorted(by_epoch.items())
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _write_buckets(
    df: DataFrame,
    on: str,
    n_buckets: int,
    epoch_dir: str,
    n_touched: int,
) -> set[str]:
    """Write the bucket-partitioned state; return the buckets that
    actually materialized files. A touched bucket whose new state is
    EMPTY (retractions cancelled it, or a delta key had no match to
    carry into this table) writes no ``__pb=`` directory — mapping
    it in the manifest anyway would point the next epoch's read at a
    fileless path (UNABLE_TO_INFER_SCHEMA)."""
    # one task per touched bucket: each writes its bucket's single file
    (
        df.withColumn("__pb", _bucket(on, n_buckets))
        .repartition(max(1, n_touched), "__pb")
        .write.mode("overwrite")
        .partitionBy("__pb")
        .parquet(epoch_dir)
    )
    try:
        names = os.listdir(epoch_dir)
    except OSError:
        names = []
    return {
        n[len("__pb=") :] for n in names if n.startswith("__pb=")
    }


def merge_join_view_epoch(
    state_dir: str,
    da: DataFrame,
    db: DataFrame,
    *,
    on: str,
    epoch_id: int,
    n_buckets: int = 32,
) -> bool:
    """Fold one epoch of signed input deltas (bag form, ``__mult``)
    into the maintained A/B/view state; False on a committed-replay
    early return. ``da``/``db`` may be empty bags."""
    for d in (da, db):
        if MULT not in d.columns:
            raise ValueError("deltas must be in bag form (as_bag)")
    manifest = _read_manifest(state_dir)
    if epoch_id in manifest["epochs"]:
        return False
    spark = da.sparkSession
    # touched buckets: one row per bucket (≤ n_buckets), the one
    # driver-side list — it keys the manifest and the pruned reads
    touched = sorted(
        r["__pb"]
        for r in da.select(_bucket(on, n_buckets).alias("__pb"))
        .union(db.select(_bucket(on, n_buckets).alias("__pb")))
        .distinct()
        .collect()
    )
    if not touched:
        manifest["epochs"] = manifest["epochs"] + [epoch_id]
        _swap_manifest(state_dir, manifest)
        return True
    a_old = _read_buckets(
        spark, manifest["tables"]["a"], touched, da
    )
    b_old = _read_buckets(
        spark, manifest["tables"]["b"], touched, db
    )
    dv = join_view_delta(a_old, da, b_old, db, on)
    v_old = _read_buckets(spark, manifest["tables"]["v"], touched, dv)
    epoch_dir = os.path.join(state_dir, f"epoch={epoch_id:08d}")
    new_states = {
        "a": bag_union(a_old, da),
        "b": bag_union(b_old, db),
        "v": bag_union(v_old, dv),
    }
    for t, df in new_states.items():
        written = _write_buckets(
            df, on, n_buckets, os.path.join(epoch_dir, t), len(touched)
        )
        # touched buckets that wrote rows point at the new epoch;
        # touched buckets now empty leave the mapping entirely (a
        # missing bucket reads as empty) — never the stale pointer
        for b in touched:
            if b in written:
                manifest["tables"][t][b] = os.path.join(
                    epoch_dir, t, f"__pb={b}"
                )
            else:
                manifest["tables"][t].pop(b, None)
    manifest["epochs"] = manifest["epochs"] + [epoch_id]
    _swap_manifest(state_dir, manifest)
    return True


def read_join_view(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """The maintained view bag (every live bucket); None before the
    first non-empty epoch."""
    manifest = _read_manifest(state_dir)
    mapping = manifest["tables"]["v"]
    if not mapping:
        return None
    by_epoch: dict[str, list[str]] = {}
    for b, path in mapping.items():
        by_epoch.setdefault(os.path.dirname(path), []).append(b)
    parts = [
        spark.read.parquet(root)
        .where(F.col("__pb").isin(sorted(bs)))
        .drop("__pb")
        for root, bs in sorted(by_epoch.items())
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def stream_join_view(
    a_stream: DataFrame,
    state_dir: str,
    checkpoint: str,
    *,
    b_static_bag: DataFrame,
    on: str,
    n_buckets: int = 32,
):
    """Wire the maintainer as an exactly-once foreachBatch sink for
    an insert stream on the A side against a static B bag (loaded
    once at epoch 0): each micro-batch becomes a +1 delta batch.
    availableNow trigger; the caller awaits termination."""
    from ..operators.ivm import as_bag

    def _sink(batch: DataFrame, epoch_id: int) -> None:
        empty_b = b_static_bag.where(F.lit(False))
        db = b_static_bag if epoch_id == 0 else empty_b
        merge_join_view_epoch(
            state_dir,
            as_bag(batch),
            db,
            on=on,
            epoch_id=epoch_id,
            n_buckets=n_buckets,
        )

    return (
        a_stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
