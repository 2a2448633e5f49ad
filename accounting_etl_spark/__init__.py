"""accounting_etl_spark — a PySpark-native analytics engine.

A ground-up re-expression of the data semantics of the reference ETL
pipeline (mamelara/accounting-etl) as lazy DataFrame/SQL plans over
Catalyst, extended with LLM-data-pipeline operators (dedup, similarity
search, multimodal columns, text analysis) designed for 100 TB scale.

Layout:
    session     SparkSession factory (UTC, AQE, Arrow on)
    sources     parquet/binary-file/fixture loaders
    operators   reusable relational operators (sessionize, two-tier
                lookup join, as-of join, top-k, dedup, similarity, merge)
    functions   column-expression helpers (money, text, vectors,
                cross-engine deterministic aggregation)
    queries     the declared query surface (paired with DuckDB oracle SQL)
    plans       end-to-end pipelines (statement extraction, COA, enrich)
    streaming   Structured Streaming surface over the events table
    sinks       driver-side presentation sinks (Excel)
"""

__version__ = "0.1.0"
