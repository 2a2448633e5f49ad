"""Reference-parity pipelines as oracle-checked queries (SURVEY §7
M3/M4): statement extraction, COA codes, vendor enrichment, MERGE
upsert — each over the shared literal fixtures (plans/fixtures.py)
so the DuckDB oracle replays the identical input.

The statement oracle SQL re-expresses the full pipeline in ANSI SQL,
with the one documented deviation: clustering is lag-based in SQL
(anchor semantics are sequential); the fixture geometry is built so
both rules agree, and the divergence case is unit-tested against the
applyInPandas operator (tests/test_statement.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.lookup_join import two_tier_lookup_join
from ..operators.upsert import merge_upsert
from ..plans import fixtures as FX
from ..plans.coa import extract_codes
from ..plans.statement import extract_transactions
from . import Q

_BATCH_TS = "2026-02-01 00:00:00"


def q_statement_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """words fixture → transactions (full extraction pipeline)."""
    return extract_transactions(FX.words_df(spark))


_STATEMENT_CORE = f"""
{FX.words_cte()},
cred AS (SELECT path, page, x0, x1, top FROM words WHERE text = 'Credits'),
chg  AS (SELECT path, page, x0, x1, top FROM words WHERE text = 'Charges'),
pair AS (
  SELECT c.path, c.page, c.x1 AS cx1, h.x1 AS hx1,
         row_number() OVER (PARTITION BY c.path, c.page
                            ORDER BY c.top, c.x0, h.top, h.x0) AS rn
  FROM cred c JOIN chg h
    ON c.path = h.path AND c.page = h.page
   AND abs(c.top - h.top) < 2 AND h.x1 > c.x1
), thr AS (
  SELECT path, page, (cx1 + hx1) / 2 AS threshold FROM pair WHERE rn = 1
), hdr0 AS (
  SELECT t.path, t.page, t.top, t.x0 FROM words t
  WHERE t.text = 'Trans'
    AND EXISTS (SELECT 1 FROM words p WHERE p.path = t.path AND p.page = t.page
                AND p.text = 'Post' AND abs(p.top - t.top) < 2)
    AND EXISTS (SELECT 1 FROM words r WHERE r.path = t.path AND r.page = t.page
                AND r.text = 'Reference' AND abs(r.top - t.top) < 2)
), hdr AS (
  SELECT path, page, top AS header_top FROM (
    SELECT *, row_number() OVER (PARTITION BY path, page ORDER BY top, x0) AS rn
    FROM hdr0) WHERE rn = 1
), datw AS (
  SELECT w.path, w.page, w.text, w.x0, w.x1, w.top, t.threshold
  FROM words w
  JOIN thr t ON w.path = t.path AND w.page = t.page
  JOIN hdr h ON w.path = h.path AND w.page = h.page
  WHERE w.top > h.header_top + 5
), flg AS (
  SELECT *, CASE WHEN lag(top) OVER w IS NULL OR top - lag(top) OVER w >= 3
                 THEN 1 ELSE 0 END AS new_r
  FROM datw WINDOW w AS (PARTITION BY path, page ORDER BY top, x0, text)
), rws AS (
  SELECT *, SUM(new_r) OVER (PARTITION BY path, page ORDER BY top, x0, text
                             ROWS UNBOUNDED PRECEDING) AS row_id
  FROM flg
), arr AS (
  SELECT path, page, row_id, min(threshold) AS threshold,
         list(struct_pack(top := top, x0 := x0, text := text, x1 := x1)
              ORDER BY top, x0, text) AS ws
  FROM rws GROUP BY 1, 2, 3
), shaped AS (
  SELECT *, len(ws) AS n FROM arr
  WHERE len(ws) >= 4
    AND regexp_matches(ws[1].text, '^\\d{{2}}/\\d{{2}}$')
    AND regexp_matches(ws[2].text, '^\\d{{2}}/\\d{{2}}$')
), amt AS (
  SELECT *, list_max(list_filter(range(3, n + 1),
            i -> regexp_matches(ws[i].text, '^[\\d,]+\\.\\d{{2}}$'))) AS p
  FROM shaped
), parsed AS (
  SELECT path, page, ws, threshold, p,
         array_to_string(list_transform(range(4, p), i -> ws[i].text), ' ') AS description
  FROM amt WHERE p IS NOT NULL AND p >= 5
), txns AS (
  SELECT path AS src_path, page, ws[2].text AS stmt_date_str,
         description AS vendor,
         CAST(CASE WHEN ws[p].x1 < threshold
              THEN -CAST(replace(replace(ws[p].text, '$', ''), ',', '') AS DECIMAL(12,2))
              ELSE  CAST(replace(replace(ws[p].text, '$', ''), ',', '') AS DECIMAL(12,2))
              END AS DOUBLE) AS amount,
         description, FALSE AS receipt_received
  FROM parsed
  WHERE NOT contains(upper(description), 'PAYMENT THANK YOU')
    AND length(description) >= 3
)"""

_STATEMENT_SQL = f"WITH {_STATEMENT_CORE}\nSELECT * FROM txns"


def q_coa_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COA cell grid → unified codes dim (header classify + gates)."""
    return extract_codes(FX.coa_df(spark))


_COA_SQL = f"""
WITH {FX.coa_cte()},
rt AS (
  SELECT *, upper(array_to_string(list_transform(cells, c -> coalesce(c, '')), ' ')) AS row_text
  FROM coa_cells
), cls AS (
  SELECT *, CASE
    WHEN contains(row_text, 'FUNDER') THEN 'funder'
    WHEN contains(row_text, 'EXP CODE') OR contains(row_text, 'GL CODE')
         OR (contains(row_text, 'EXP') AND contains(row_text, 'CODE')) THEN 'gl'
    WHEN contains(row_text, 'LOC CODE') OR contains(row_text, 'LOCATION CODE')
         OR (contains(row_text, 'LOC') AND contains(row_text, 'CODE')) THEN 'location'
    WHEN contains(row_text, 'PROG CODE') OR contains(row_text, 'PROGRAM CODE')
         OR (contains(row_text, 'PROG') AND contains(row_text, 'CODE')) THEN 'program'
    WHEN contains(row_text, 'DEPT CODE') OR contains(row_text, 'DEPARTMENT CODE')
         OR (contains(row_text, 'DEPT') AND contains(row_text, 'CODE')) THEN 'dept'
    END AS rtype
  FROM rt
), tt AS (
  SELECT path, page, table_idx, rtype AS code_type FROM (
    SELECT *, row_number() OVER (PARTITION BY path, page, table_idx ORDER BY row_idx) AS rn
    FROM cls WHERE row_idx <= 2 AND rtype IS NOT NULL) WHERE rn = 1
), rows_ AS (
  SELECT t.code_type, c.page, c.table_idx, c.row_idx,
         trim(coalesce(c.cells[1], '')) AS code,
         trim(coalesce(c.cells[2], '')) AS name
  FROM coa_cells c JOIN tt t
    ON c.path = t.path AND c.page = t.page AND c.table_idx = t.table_idx
), ok AS (
  SELECT * FROM rows_
  WHERE code <> '' AND name <> ''
    AND NOT contains(upper(code), 'CODE') AND NOT contains(upper(name), 'CODE')
    AND ((code_type = 'funder'   AND regexp_matches(code, '^\\d{{4}}$'))
      OR (code_type = 'gl'       AND regexp_matches(code, '^\\d{{5}}$'))
      OR (code_type = 'location' AND regexp_matches(code, '^\\d{{2}}$'))
      OR (code_type IN ('program', 'dept') AND regexp_matches(code, '^\\d+$')))
)
SELECT code_type, code,
       arg_max(name, CAST(page AS BIGINT) * 1000000 + table_idx * 10000 + row_idx) AS name
FROM ok GROUP BY 1, 2
"""

_DIM_COLS = ["gl_account", "location", "program", "funder", "department"]


def q_vendor_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 enrichment of extracted transactions (two-tier lookup)."""
    txns = extract_transactions(FX.words_df(spark))
    fact = txns.select(
        F.md5(
            F.concat_ws(
                "#",
                "src_path",
                F.col("page").cast("string"),
                "stmt_date_str",
                "description",
            )
        ).alias("txn_key"),
        F.col("vendor").alias("txn_vendor"),
        "amount",
    )
    dim = FX.vendor_df(spark).select("vendor", *_DIM_COLS)
    return two_tier_lookup_join(
        fact,
        dim,
        fact_id="txn_key",
        fact_key="txn_vendor",
        dim_key="vendor",
        dim_cols=_DIM_COLS,
    ).withColumnRenamed("vendor", "matched_vendor")


_ENRICH_SQL = f"""
WITH {_STATEMENT_CORE},
{FX.vendor_cte()},
fact AS (
  SELECT md5(src_path || '#' || CAST(page AS VARCHAR) || '#' || stmt_date_str
             || '#' || description) AS txn_key,
         vendor AS txn_vendor, amount
  FROM txns
), dimv AS (
  SELECT vendor, gl_account, location, program, funder, department FROM vendor_dim
), t1 AS (
  SELECT f.txn_key, f.txn_vendor, f.amount, d.vendor AS matched_vendor,
         d.gl_account, d.location, d.program, d.funder, d.department
  FROM fact f LEFT JOIN dimv d ON f.txn_vendor = d.vendor
), miss AS (
  SELECT txn_key, txn_vendor, amount FROM t1 WHERE matched_vendor IS NULL
), t2 AS (
  SELECT m.txn_key, m.txn_vendor, m.amount, d.vendor AS matched_vendor,
         d.gl_account, d.location, d.program, d.funder, d.department,
         row_number() OVER (PARTITION BY m.txn_key ORDER BY d.vendor) AS rn
  FROM miss m JOIN dimv d ON contains(lower(d.vendor), lower(m.txn_vendor))
)
SELECT txn_key, txn_vendor, amount, matched_vendor, gl_account, location,
       program, funder, department, 1 AS tier
FROM t1 WHERE matched_vendor IS NOT NULL
UNION ALL
SELECT txn_key, txn_vendor, amount, matched_vendor, gl_account, location,
       program, funder, department, 2 AS tier
FROM t2 WHERE rn = 1
UNION ALL
SELECT m.txn_key, m.txn_vendor, m.amount, CAST(NULL AS VARCHAR),
       CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
       CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 0 AS tier
FROM miss m
WHERE NOT EXISTS (SELECT 1 FROM t2 WHERE t2.txn_key = m.txn_key)
"""

_UPDATE_ROWS = [
    ("AMAZON MKTPL", "60010", "03", "800", "1009", "310"),
    ("NEW VENDOR LLC", "50010", "01", "7", "1001", "300"),
]


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 MERGE semantics: update matched codes, insert new vendors."""
    dim = FX.vendor_df(spark).withColumn("updated_at", F.col("created_at"))
    updates = spark.createDataFrame(
        _UPDATE_ROWS,
        "vendor string, gl_account string, location string, program string, "
        "funder string, department string",
    )
    return merge_upsert(
        dim, updates, key="vendor", set_cols=_DIM_COLS, batch_ts=_BATCH_TS
    )


# pre-existing closed version: exercises history passthrough
_SCD2_HISTORY_ROW = (
    "AMAZON MKTPL", "50000", "01", "712", "1001", "300",
    "2024-01-01 00:00:00", "2025-01-01 00:00:00", False,
)
# AMAZON changes (new version), NEW VENDOR inserts, UNRELATED VENDOR is
# byte-identical (no-op — no spurious version churn)
_SCD2_UPDATE_ROWS = [
    *_UPDATE_ROWS,
    ("UNRELATED VENDOR", "50010", "01", "7", "1001", "300"),
]
_SCD2_DDL = (
    "vendor string, gl_account string, location string, program string, "
    "funder string, department string, valid_from string, valid_to string, "
    "is_current boolean"
)


def q_scd2_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 extension: SCD Type-2 history-preserving upsert."""
    from ..operators.upsert import scd2_upsert

    dim = (
        FX.vendor_df(spark)
        .select(
            "vendor",
            *_DIM_COLS,
            F.col("created_at").alias("valid_from"),
            F.lit(None).cast("string").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
        .unionByName(spark.createDataFrame([_SCD2_HISTORY_ROW], _SCD2_DDL))
    )
    updates = spark.createDataFrame(
        _SCD2_UPDATE_ROWS,
        "vendor string, gl_account string, location string, program string, "
        "funder string, department string",
    )
    return scd2_upsert(
        dim, updates, key="vendor", set_cols=_DIM_COLS, batch_ts=_BATCH_TS
    )


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'diff' variant: versioning audit across the SCD1 MERGE — the
    dim before vs after, through operators/diff.py::snapshot_diff.
    Generic-column mapping (README §union-tagging): ts1 = change kind,
    ts2 = comma-joined sorted changed-column names."""
    from ..operators.diff import snapshot_diff

    dim = FX.vendor_df(spark).withColumn("updated_at", F.col("created_at"))
    d = snapshot_diff(dim, q_merge_upsert(spark, sf_dir), "vendor")
    return d.select(
        F.lit("diff").alias("variant"),
        "vendor",
        *_DIM_COLS,
        F.col("change").alias("ts1"),
        F.array_join("changed_cols", ",").alias("ts2"),
        F.lit(None).cast("boolean").alias("is_current"),
    )


_CDC_DELETE_VENDOR = "MEGA STORE OUTLET INC"
_CDC_DDL = (
    "vendor string, gl_account string, location string, program string, "
    "funder string, department string"
)


def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'cdc' variant: Debezium-style change-log apply
    (operators/upsert.py::apply_cdc) — the log replays the dim as
    seq-1 upserts, the MERGE batch as seq-2 upserts, and one seq-3
    delete tombstone; the final state must show the updates applied
    and the deleted vendor gone, in ONE map-side-combining
    aggregation (no per-key window sort). ts1 = the winning event's
    sequence, ts2 = its op."""
    from ..operators.upsert import apply_cdc

    base = (
        FX.vendor_df(spark)
        .select("vendor", *_DIM_COLS)
        .withColumn("seq", F.lit(1))
        .withColumn("op", F.lit("U"))
    )
    upd = (
        spark.createDataFrame(_UPDATE_ROWS, _CDC_DDL)
        .withColumn("seq", F.lit(2))
        .withColumn("op", F.lit("U"))
    )
    dele = (
        spark.createDataFrame([(_CDC_DELETE_VENDOR,)], "vendor string")
        .select(
            "vendor",
            *[F.lit(None).cast("string").alias(c) for c in _DIM_COLS],
        )
        .withColumn("seq", F.lit(3))
        .withColumn("op", F.lit("D"))
    )
    out = apply_cdc(
        base.unionByName(upd).unionByName(dele),
        key="vendor",
        seq_col="seq",
        op_col="op",
        payload_cols=_DIM_COLS,
    )
    return out.select(
        F.lit("cdc").alias("variant"),
        "vendor",
        *_DIM_COLS,
        F.col("seq").cast("string").alias("ts1"),
        F.col("op").alias("ts2"),
        F.lit(None).cast("boolean").alias("is_current"),
    )


def q_upsert_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD1 + SCD2 MERGE semantics + the before/after snapshot diff +
    the CDC change-log apply in one union-tagged entry (driver cap).
    variant 'scd1': ts1/ts2 = created_at/updated_at; variant 'scd2':
    ts1/ts2 = valid_from/valid_to (NULL while open) with the
    is_current flag; variant 'diff': ts1 = change kind, ts2 = changed
    columns; variant 'cdc': ts1 = winning seq, ts2 = winning op."""
    scd1 = q_merge_upsert(spark, sf_dir).select(
        F.lit("scd1").alias("variant"),
        "vendor",
        *_DIM_COLS,
        F.col("created_at").alias("ts1"),
        F.col("updated_at").alias("ts2"),
        F.lit(None).cast("boolean").alias("is_current"),
    )
    scd2 = q_scd2_upsert(spark, sf_dir).select(
        F.lit("scd2").alias("variant"),
        "vendor",
        *_DIM_COLS,
        F.col("valid_from").alias("ts1"),
        F.col("valid_to").alias("ts2"),
        "is_current",
    )
    return (
        scd1.unionByName(scd2)
        .unionByName(q_snapshot_diff(spark, sf_dir))
        .unionByName(q_cdc_apply(spark, sf_dir))
    )


_UPSERT_VARIANTS_SQL = f"""
WITH {FX.vendor_cte()},
dim AS (SELECT *, created_at AS updated_at FROM vendor_dim),
updates(vendor, gl_account, location, program, funder, department) AS (VALUES
    {FX.values_clause(_UPDATE_ROWS)}
),
kept AS (
  SELECT vendor, gl_account, location, program, funder, department,
         created_at, updated_at
  FROM dim d WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.vendor = d.vendor)
), refreshed AS (
  SELECT u.vendor, u.gl_account, u.location, u.program, u.funder, u.department,
         d.created_at, '{_BATCH_TS}' AS updated_at
  FROM updates u JOIN dim d ON u.vendor = d.vendor
), new AS (
  SELECT u.vendor, u.gl_account, u.location, u.program, u.funder, u.department,
         '{_BATCH_TS}' AS created_at, '{_BATCH_TS}' AS updated_at
  FROM updates u WHERE NOT EXISTS (SELECT 1 FROM dim d WHERE d.vendor = u.vendor)
), scd1 AS (
  SELECT * FROM kept UNION ALL SELECT * FROM refreshed UNION ALL SELECT * FROM new
),
scd2_dim(vendor, gl_account, location, program, funder, department,
         valid_from, valid_to, is_current) AS (
  SELECT vendor, gl_account, location, program, funder, department,
         created_at, CAST(NULL AS VARCHAR), TRUE
  FROM vendor_dim
  UNION ALL
  VALUES {FX.values_clause([_SCD2_HISTORY_ROW])}
),
u2(vendor, gl_account, location, program, funder, department) AS (VALUES
    {FX.values_clause(_SCD2_UPDATE_ROWS)}
),
cur AS (SELECT * FROM scd2_dim WHERE is_current),
hist AS (SELECT * FROM scd2_dim WHERE NOT is_current),
j AS (
  SELECT c.*, u.gl_account AS u_gl, u.location AS u_loc, u.program AS u_prog,
         u.funder AS u_fun, u.department AS u_dept,
         u.vendor IS NOT NULL AS has_u
  FROM cur c LEFT JOIN u2 u ON c.vendor = u.vendor
), flag AS (
  SELECT *, has_u AND NOT (
      gl_account IS NOT DISTINCT FROM u_gl
      AND location IS NOT DISTINCT FROM u_loc
      AND program IS NOT DISTINCT FROM u_prog
      AND funder IS NOT DISTINCT FROM u_fun
      AND department IS NOT DISTINCT FROM u_dept) AS changed
  FROM j
), scd2 AS (
  SELECT vendor, gl_account, location, program, funder, department,
         valid_from, valid_to, is_current FROM hist
  UNION ALL
  SELECT vendor, gl_account, location, program, funder, department,
         valid_from, valid_to, is_current FROM flag WHERE NOT changed
  UNION ALL
  SELECT vendor, gl_account, location, program, funder, department,
         valid_from, '{_BATCH_TS}', FALSE FROM flag WHERE changed
  UNION ALL
  SELECT vendor, u_gl, u_loc, u_prog, u_fun, u_dept,
         '{_BATCH_TS}', CAST(NULL AS VARCHAR), TRUE FROM flag WHERE changed
  UNION ALL
  SELECT u.vendor, u.gl_account, u.location, u.program, u.funder, u.department,
         '{_BATCH_TS}', CAST(NULL AS VARCHAR), TRUE
  FROM u2 u WHERE NOT EXISTS (SELECT 1 FROM cur c WHERE c.vendor = u.vendor)
)
SELECT 'scd1' AS variant, vendor, gl_account, location, program, funder,
       department, created_at AS ts1, updated_at AS ts2,
       CAST(NULL AS BOOLEAN) AS is_current
FROM scd1
UNION ALL
SELECT 'scd2' AS variant, vendor, gl_account, location, program, funder,
       department, valid_from AS ts1, valid_to AS ts2, is_current
FROM scd2
UNION ALL
SELECT 'diff' AS variant, vendor, gl_account, location, program, funder,
       department, ts1, ts2, CAST(NULL AS BOOLEAN) AS is_current
FROM (
  SELECT COALESCE(s.vendor, d.vendor) AS vendor,
         CASE WHEN s.vendor IS NULL THEN d.gl_account ELSE s.gl_account END AS gl_account,
         CASE WHEN s.vendor IS NULL THEN d.location ELSE s.location END AS location,
         CASE WHEN s.vendor IS NULL THEN d.program ELSE s.program END AS program,
         CASE WHEN s.vendor IS NULL THEN d.funder ELSE s.funder END AS funder,
         CASE WHEN s.vendor IS NULL THEN d.department ELSE s.department END AS department,
         CASE WHEN d.vendor IS NULL THEN 'added'
              WHEN s.vendor IS NULL THEN 'removed'
              WHEN (d.created_at IS DISTINCT FROM s.created_at)
                OR (d.department IS DISTINCT FROM s.department)
                OR (d.funder IS DISTINCT FROM s.funder)
                OR (d.gl_account IS DISTINCT FROM s.gl_account)
                OR (d.location IS DISTINCT FROM s.location)
                OR (d.program IS DISTINCT FROM s.program)
                OR (d.updated_at IS DISTINCT FROM s.updated_at)
              THEN 'changed' ELSE 'unchanged' END AS ts1,
         CASE WHEN d.vendor IS NULL OR s.vendor IS NULL THEN ''
              ELSE concat_ws(',',
                CASE WHEN d.created_at IS DISTINCT FROM s.created_at THEN 'created_at' END,
                CASE WHEN d.department IS DISTINCT FROM s.department THEN 'department' END,
                CASE WHEN d.funder IS DISTINCT FROM s.funder THEN 'funder' END,
                CASE WHEN d.gl_account IS DISTINCT FROM s.gl_account THEN 'gl_account' END,
                CASE WHEN d.location IS DISTINCT FROM s.location THEN 'location' END,
                CASE WHEN d.program IS DISTINCT FROM s.program THEN 'program' END,
                CASE WHEN d.updated_at IS DISTINCT FROM s.updated_at THEN 'updated_at' END)
         END AS ts2
  FROM dim d FULL OUTER JOIN scd1 s ON d.vendor = s.vendor
) WHERE ts1 <> 'unchanged'
UNION ALL
SELECT 'cdc' AS variant, vendor, gl_account, location, program, funder,
       department, CAST(seq AS VARCHAR) AS ts1, op AS ts2,
       CAST(NULL AS BOOLEAN) AS is_current
FROM (
  SELECT *, row_number() OVER (PARTITION BY vendor ORDER BY seq DESC) AS rn
  FROM (
    SELECT vendor, gl_account, location, program, funder, department,
           1 AS seq, 'U' AS op
    FROM vendor_dim
    UNION ALL
    SELECT *, 2, 'U' FROM updates
    UNION ALL
    SELECT '{_CDC_DELETE_VENDOR}', NULL, NULL, NULL, NULL, NULL, 3, 'D'
  )
) WHERE rn = 1 AND op <> 'D'
"""


def q_excel_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12: the 10-column Excel output projection (sinks/excel.py) —
    Description forced present, Receipt_Received forced False, code
    columns null before enrichment (excel_builder.py:39-52)."""
    from ..sinks.excel import excel_rows

    return excel_rows(extract_transactions(FX.words_df(spark)))


_EXCEL_SQL = f"""
WITH {_STATEMENT_CORE}
SELECT stmt_date_str AS "Date", vendor AS "Vendor",
       description AS "Description",
       CAST(NULL AS VARCHAR) AS "G/L Account",
       CAST(NULL AS VARCHAR) AS "Location",
       CAST(NULL AS VARCHAR) AS "Program",
       CAST(NULL AS VARCHAR) AS "Funder",
       CAST(NULL AS VARCHAR) AS "Dept",
       amount AS "Amount", FALSE AS "Receipt_Received"
FROM txns
"""


QUERIES: dict[str, Q] = {
    "statement_pipeline": Q(q_statement_pipeline, _STATEMENT_SQL),
    "coa_codes": Q(q_coa_codes, _COA_SQL),
    "vendor_enrich": Q(q_vendor_enrich, _ENRICH_SQL),
    "merge_upsert": Q(
        q_upsert_variants,
        _UPSERT_VARIANTS_SQL,
        variants={
            "scd1": q_merge_upsert,
            "scd2": q_scd2_upsert,
            "diff": q_snapshot_diff,
            "cdc": q_cdc_apply,
        },
    ),
    "excel_projection": Q(q_excel_projection, _EXCEL_SQL),
}
