"""Declared query surface.

Each module exposes ``QUERIES: dict[str, Q]`` where ``Q`` pairs a
PySpark callable ``(spark, sf_dir) -> DataFrame`` with the equivalent
ANSI SQL for the DuckDB oracle (or ``None`` for ops that are not
SQL-expressible — those get the driver's rows-only check plus unit
tests).

Cross-engine determinism conventions (see functions/detsum.py):
- money/measure sums aggregate in exact decimal, cast to double last;
- averages are decimal-sum / count in double;
- timestamps in output are formatted strings or epoch-second bigints;
- every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Q:
    """A declared query: Spark implementation + optional DuckDB oracle.

    ``variants`` names the sub-queries a union-tagged entry merges
    (the driver-cap consolidation pattern). The driver only sees
    ``fn``/``sql``; bench.py times each variant separately so merged
    entries stay comparable across rounds (BENCH dotted sub-keys).
    """

    fn: Callable[[SparkSession, str], DataFrame]
    sql: Optional[str] = None
    variants: Optional[dict[str, Callable[[SparkSession, str], DataFrame]]] = None
