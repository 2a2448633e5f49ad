"""Complex-type battery: array/struct functions (SURVEY §1.3 nested
types, §2.8 array ops). Exercised over embeddings (numeric arrays)
and documents (token arrays) with portable semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from . import Q


def q_array_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/slice/contains/position/distinct/sort/reverse/flatten over
    token arrays — the nested-type workhorses."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), " ")
    return docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n"),
        F.concat_ws("|", F.slice(toks, 1, 5)).alias("first5"),
        F.concat_ws("|", F.slice(toks, -3, 3)).alias("last3"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.array_position(toks, "data").cast("bigint").alias("first_data_pos"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_uniq"),
        F.concat_ws("|", F.sort_array(F.array_distinct(toks))).alias("uniq_sorted"),
        F.concat_ws("|", F.reverse(F.slice(toks, 1, 4))).alias("rev4"),
        F.get(F.sort_array(F.array_distinct(toks), asc=False), 0).alias("max_token"),
    )


_ARRAY_SQL = """
WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents)
SELECT doc_id,
  CAST(len(toks) AS BIGINT) AS n,
  array_to_string(toks[1:5], '|') AS first5,
  array_to_string(toks[-3:], '|') AS last3,
  list_contains(toks, 'spark') AS has_spark,
  CAST(list_position(toks, 'data') AS BIGINT) AS first_data_pos,
  CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq,
  array_to_string(list_sort(list_distinct(toks)), '|') AS uniq_sorted,
  array_to_string(list_reverse(toks[1:4]), '|') AS rev4,
  list_sort(list_distinct(toks), 'DESC')[1] AS max_token
FROM t
"""


def q_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element-wise array math over embeddings: min/max/avg/norm-ish
    stats with exact decimal folds (deterministic cross-engine), plus
    symmetric int8 quantization (the storage-reduction step an
    embedding store runs).

    Quantization determinism: scale = max|x|/127 is one double
    division; values round half-up via ``floor(x/scale + 0.5)`` (both
    engines' ``round`` disagree on ties — floor doesn't); the verified
    outputs (L1 mass, max code, saturation count) are pure integers,
    so no float aggregation order can enter the hash.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    el = emb.select(
        "vec_id",
        "label",
        F.explode(F.col("embedding")).alias("x"),
    ).select(
        "vec_id", "label",
        F.col("x").cast("double").cast("decimal(18,9)").alias("xd"),
    )
    stats = el.groupBy("vec_id", "label").agg(
        F.min("xd").cast("double").alias("min_x"),
        F.max("xd").cast("double").alias("max_x"),
        (F.sum("xd").cast("double") / F.count("xd")).alias("mean_x"),
        F.sum(F.col("xd") * F.col("xd")).cast("double").alias("sq_norm"),
        F.count(F.when(F.col("xd") > 0, 1)).alias("n_pos"),
    )
    vec = F.col("embedding").cast("array<double>")
    maxabs = F.array_max(F.transform(vec, F.abs))
    scale = maxabs / F.lit(127.0)
    qarr = F.when(
        maxabs > 0,
        F.transform(vec, lambda x: F.floor(x / scale + 0.5).cast("int")),
    ).otherwise(F.transform(vec, lambda x: F.lit(0)))
    # bind the quantized array before aggregating over it (the same
    # projection-binding rule as the winnowing fingerprints)
    qbase = emb.select("vec_id", scale.alias("q_scale"), qarr.alias("__q"))
    quant = qbase.select(
        "vec_id",
        "q_scale",
        F.aggregate(
            "__q", F.lit(0).cast("bigint"), lambda acc, x: acc + F.abs(x)
        ).alias("q_l1"),
        F.array_max("__q").cast("int").alias("q_max"),
        F.size(F.filter("__q", lambda x: F.abs(x) == 127))
        .cast("bigint")
        .alias("n_sat"),
    )
    return stats.join(quant, "vec_id")


_VECTOR_SQL = """
WITH el AS (
  SELECT vec_id, label,
         CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(18,9)) AS xd
  FROM embeddings
), stats AS (
  SELECT vec_id, label,
    CAST(CAST(min(xd) AS VARCHAR) AS DOUBLE) AS min_x,
    CAST(CAST(max(xd) AS VARCHAR) AS DOUBLE) AS max_x,
    CAST(CAST(SUM(xd) AS VARCHAR) AS DOUBLE) / count(xd) AS mean_x,
    CAST(CAST(SUM(xd * xd) AS VARCHAR) AS DOUBLE) AS sq_norm,
    count(CASE WHEN xd > 0 THEN 1 END) AS n_pos
  FROM el GROUP BY vec_id, label
), v AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd
  FROM embeddings
), q AS (
  SELECT vec_id,
         list_max(list_transform(vd, x -> abs(x))) / 127.0 AS q_scale,
         CASE WHEN list_max(list_transform(vd, x -> abs(x))) > 0
              THEN list_transform(vd, x -> CAST(floor(
                     x / (list_max(list_transform(vd, y -> abs(y))) / 127.0)
                     + 0.5) AS INTEGER))
              ELSE list_transform(vd, x -> 0) END AS qv
  FROM v
)
SELECT s.vec_id, s.label, s.min_x, s.max_x, s.mean_x, s.sq_norm, s.n_pos,
       q.q_scale,
       CAST(list_sum(list_transform(q.qv, x -> abs(x))) AS BIGINT) AS q_l1,
       CAST(list_max(q.qv) AS INTEGER) AS q_max,
       CAST(len(list_filter(q.qv, x -> abs(x) = 127)) AS BIGINT) AS n_sat
FROM stats s JOIN q ON s.vec_id = q.vec_id
"""


def _z_interleave_sql(cols: list[str], bits: int) -> str:
    """DuckDB twin of operators/layout.py::zorder_key — the same
    bit-interleave spelled as shift/and/or terms."""
    d = len(cols)
    terms = [
        f"((((CAST({c} AS BIGINT)) >> {b}) & 1) << {b * d + ci})"
        for ci, c in enumerate(cols)
        for b in range(bits)
    ]
    return " | ".join(terms)


def _z_gather_sql(expr: str, d: int, ci: int, bits: int) -> str:
    """De-interleave dimension ``ci`` back out of a Morton key."""
    terms = [
        f"(((({expr}) >> {b * d + ci}) & 1) << {b})" for b in range(bits)
    ]
    return " | ".join(terms)


def q_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'zorder' variant: Morton (Z-order) clustering keys
    (operators/layout.py::zorder_key) over bounded integer domains of
    the documents table — the multi-dimensional file-clustering key
    behind ``write_zordered``. Two shapes: a 2-D 10-bit key (n) and a
    3-D 8-bit key (first_data_pos), plus the ROUND-TRIP de-interleave
    of the 2-D key back to its inputs (first5 = 'x|y'), which pins
    invertibility — both engines must agree bit for bit on every
    position. Pure shift/and/or expressions, whole-stage codegen."""
    from ..operators.layout import zorder_key

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", "source"
    )
    x = (F.col("doc_id") % 1024).cast("bigint")
    y = (F.col("n_chars") % 1024).cast("bigint")
    z2 = zorder_key([x, y], bits=10)
    z3 = zorder_key(
        [
            (F.col("doc_id") % 256).cast("bigint"),
            (F.col("n_chars") % 256).cast("bigint"),
            (F.length("source") % 256).cast("bigint"),
        ],
        bits=8,
    )
    base = docs.select("doc_id", z2.alias("__z2"), z3.alias("__z3"))
    # de-interleave the 2-D key (gather even/odd bit positions)
    xr = F.lit(0).cast("bigint")
    yr = F.lit(0).cast("bigint")
    for b in range(10):
        bit_x = F.shiftright(F.col("__z2"), 2 * b).bitwiseAND(F.lit(1))
        bit_y = F.shiftright(F.col("__z2"), 2 * b + 1).bitwiseAND(
            F.lit(1)
        )
        xr = xr.bitwiseOR(F.shiftleft(bit_x, b))
        yr = yr.bitwiseOR(F.shiftleft(bit_y, b))
    return base.select(
        F.lit("zorder").alias("variant"),
        "doc_id",
        F.col("__z2").cast("bigint").alias("n"),
        F.concat_ws(
            "|", xr.cast("string"), yr.cast("string")
        ).alias("first5"),
        F.lit(None).cast("string").alias("last3"),
        F.lit(None).cast("boolean").alias("has_spark"),
        F.col("__z3").cast("bigint").alias("first_data_pos"),
        F.lit(None).cast("bigint").alias("n_uniq"),
        F.col("__z2").cast("string").alias("uniq_sorted"),
        F.lit(None).cast("string").alias("rev4"),
        F.lit(None).cast("string").alias("max_token"),
    )


def q_array_battery_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array battery + z-order clustering keys in one union-tagged
    entry (driver cap)."""
    base = q_array_battery(spark, sf_dir).select(
        F.lit("battery").alias("variant"), "*"
    )
    return base.unionByName(q_zorder_keys(spark, sf_dir))


_Z2 = _z_interleave_sql(["doc_id % 1024", "n_chars % 1024"], 10)
_Z3 = _z_interleave_sql(
    ["doc_id % 256", "n_chars % 256", "length(source) % 256"], 8
)

_ZORDER_SQL = f"""
WITH zz AS (
  SELECT doc_id, CAST({_Z2} AS BIGINT) AS z2, CAST({_Z3} AS BIGINT) AS z3
  FROM documents
)
SELECT 'zorder' AS variant, doc_id, z2 AS n,
       CAST({_z_gather_sql('z2', 2, 0, 10)} AS VARCHAR) || '|' ||
       CAST({_z_gather_sql('z2', 2, 1, 10)} AS VARCHAR) AS first5,
       CAST(NULL AS VARCHAR) AS last3,
       CAST(NULL AS BOOLEAN) AS has_spark,
       z3 AS first_data_pos,
       CAST(NULL AS BIGINT) AS n_uniq,
       CAST(z2 AS VARCHAR) AS uniq_sorted,
       CAST(NULL AS VARCHAR) AS rev4,
       CAST(NULL AS VARCHAR) AS max_token
FROM zz
"""

_ARRAY_MERGED_SQL = f"""
SELECT 'battery' AS variant, * FROM ({_ARRAY_SQL})
UNION ALL
SELECT * FROM ({_ZORDER_SQL})
"""

QUERIES: dict[str, Q] = {
    "array_battery": Q(
        q_array_battery_merged,
        _ARRAY_MERGED_SQL,
        variants={
            "battery": q_array_battery,
            "zorder": q_zorder_keys,
        },
    ),
    "vector_stats": Q(q_vector_stats, _VECTOR_SQL),
}
