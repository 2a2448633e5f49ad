"""Cross-engine deterministic aggregation helpers.

Floating-point sums are order-dependent; Spark's partial aggregation
order differs run-to-run and from any single-threaded oracle, so a
``sum(double)`` can never hash-match DuckDB bit-for-bit. The engine
therefore aggregates money/measure columns in *decimal* (exact,
associative, order-independent) and casts the final result to double.
Both engines produce the identical IEEE double for the identical exact
decimal, so results hash-match regardless of execution order or
parallelism. This convention also fixes the reference's float-currency
defect (reference pdf_parser.py:31,393 stores money as Python float).

The matching oracle-SQL idiom is::

    CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)

Averages are expressed as exact-decimal sum divided by count in
*double* arithmetic (single deterministic IEEE division), never the
engine's own ``avg`` (whose internal types differ between engines).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC2 = "decimal(18,2)"
DEC4 = "decimal(18,4)"


def dsum(col: Column | str, dec: str = DEC4) -> Column:
    """Order-independent sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(dec)).cast("double")


def dmean(col: Column | str, dec: str = DEC4) -> Column:
    """Deterministic mean: exact decimal sum / non-null count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(dec)).cast("double") / F.count(c)
