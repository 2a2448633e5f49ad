"""Layout maintenance (operators/layout.py): compaction sizing and
range-clustered file statistics."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from accounting_etl_spark.operators.layout import (
    compact,
    table_bytes,
    write_clustered,
)


def _fragmented(spark, tmp_path, n_files=64):
    src = str(tmp_path / "frag")
    (
        spark.range(0, 20_000)
        .withColumn("v", F.col("id") * 2)
        .repartition(n_files)
        .write.parquet(src)
    )
    return src


def test_compact_reduces_file_count_preserving_rows(spark, tmp_path):
    src = _fragmented(spark, tmp_path)
    df = spark.read.parquet(src)
    assert len(df.inputFiles()) >= 60
    total = table_bytes(df)
    assert total > 0
    dst = str(tmp_path / "compacted")
    # target ≈ half the table → expect 2 files
    n = compact(df, dst, target_bytes=-(-total // 2))
    assert n == 2
    back = spark.read.parquet(dst)
    assert len(back.inputFiles()) == 2
    assert back.count() == 20_000
    assert back.agg(F.sum("v")).first()[0] == df.agg(F.sum("v")).first()[0]


def test_write_clustered_files_have_disjoint_ranges(spark, tmp_path):
    df = (
        spark.range(0, 50_000)
        .withColumn("k", (F.col("id") * 7919) % 50_000)  # scrambled key
        .withColumn("payload", F.col("id").cast("string"))
    )
    dst = str(tmp_path / "clustered")
    write_clustered(df, dst, cluster_cols=["k"], num_files=8)
    ranges = []
    for f in sorted(glob.glob(f"{dst}/*.parquet")):
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(
                [md.schema.column(i).name for i in range(md.num_columns)].index("k")
            )
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) == 8
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges {(lo1, hi1)} {(lo2, hi2)}"
    # a point-lookup scan can therefore skip 7 of 8 files on footer
    # stats alone; content unchanged
    back = spark.read.parquet(dst)
    assert back.count() == 50_000


def test_zorder_key_interleaves_bits(spark):
    from accounting_etl_spark.operators.layout import zorder_key

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (255, 255)], "x bigint, y bigint"
    )
    out = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", zorder_key([F.col("x"), F.col("y")], bits=8).alias("z")
        ).collect()
    }
    # col 0 takes even bit positions, col 1 odd: z(3,5) =
    # x bits (011) at 0,2,4 + y bits (101) at 1,3,5 = 1+2+4+32
    assert out[(0, 0)] == 0
    assert out[(1, 0)] == 1
    assert out[(0, 1)] == 2
    assert out[(3, 5)] == 39
    assert out[(255, 255)] == 65535


def test_zorder_key_rejects_overflow(spark):
    import pytest

    from accounting_etl_spark.operators.layout import zorder_key

    with pytest.raises(ValueError):
        zorder_key([F.col("a"), F.col("b"), F.col("c")], bits=22)


def _file_boxes(dst, col):
    boxes = []
    for f in sorted(glob.glob(f"{dst}/*.parquet")):
        md = pq.read_metadata(f)
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        idx = names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        boxes.append((min(mins), max(maxs)))
    return boxes


def test_write_zordered_prunes_both_dimensions(spark, tmp_path):
    from accounting_etl_spark.operators.layout import write_zordered

    # full 256x256 grid in scrambled order; aligned z-files are unions
    # of whole 64x64 quadrants, so a quadrant-aligned 64-wide slab in
    # EITHER dimension overlaps at most ~1/4 of the boxes + merges —
    # range clustering on x alone would leave a y-slab overlapping
    # EVERY file.
    df = (
        spark.range(0, 256 * 256)
        .withColumn("id2", (F.col("id") * 48271) % (256 * 256))
        .select(
            (F.col("id2") % 256).alias("x"),
            (F.col("id2") / 256).cast("bigint").alias("y"),
        )
    )
    dst = str(tmp_path / "zordered")
    write_zordered(df, dst, cluster_cols=["x", "y"], bits=8, num_files=16)
    n_files = len(glob.glob(f"{dst}/*.parquet"))
    assert 8 <= n_files <= 16
    for col in ("x", "y"):
        boxes = _file_boxes(dst, col)
        # alignment: every box spans whole quadrants (never the
        # sampled-boundary straddle that inflates a box to the domain)
        for lo, hi in boxes:
            assert lo % 64 == 0 and (hi + 1) % 64 == 0, (col, lo, hi)
        for lo, hi in [(0, 63), (192, 255)]:
            overlapping = [b for b in boxes if not (b[1] < lo or b[0] > hi)]
            assert len(overlapping) <= (n_files + 1) // 2, (col, boxes)
    back = spark.read.parquet(dst)
    assert back.count() == 256 * 256
    assert back.select(F.countDistinct("x", "y")).first()[0] == 256 * 256
