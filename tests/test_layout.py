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
