"""Constant array literals without per-element py4j round-trips.

``F.lit`` on a (nested) Python list recursively calls ``lit`` per
element — one py4j round-trip each, so a 16x64 centroid matrix costs
~1000 socket calls (~1.5s of driver wall per plan build, measured in
the ANN queries). Rendering the constant as ONE SQL expression string
and parsing it JVM-side gives the identical foldable
``CreateArray(Literal...)`` tree in a single call.

Bit-exactness: Python ``repr`` of a float is the shortest decimal that
round-trips through IEEE-754 binary64, and Spark's SQL parser reads
``<digits>D`` via ``Double.parseDouble`` (correctly rounded), so the
JVM-side literal is bit-identical to the Python value.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(x: float) -> str:
    if not math.isfinite(x):
        raise ValueError(f"non-finite literal: {x}")
    return f"{float(x)!r}D"


def lit_vector(values: list[float]) -> Column:
    """array<double> literal as one parsed expression."""
    return F.expr("array(" + ",".join(_d(x) for x in values) + ")")


def lit_matrix(rows: list[list[float]]) -> Column:
    """array<array<double>> literal as one parsed expression."""
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(_d(x) for x in row) + ")" for row in rows
        )
        + ")"
    )
