"""Derived-metric scalar expressions (reference operators C1-C3).

The reference computes Euclidean norms of 3-axis sensor vectors inside
its Stream Analytics job:

    SQRT(SQUARE(x) + SQUARE(y) + SQUARE(z))
    (reference stream-analytics/iot-stream-analytics-query.sql:20-30)

Expressed here as pure Catalyst column expressions: they fold into
whole-stage codegen with zero Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def magnitude3(x: Column, y: Column, z: Column) -> Column:
    """sqrt(x^2 + y^2 + z^2), written as x*x+... exactly like the reference
    so extreme doubles (2.365e+305, reference
    iot-central/preview-output-example.json:13) overflow to +inf the same
    way in Spark, DuckDB, and the reference engine."""
    return F.sqrt(x * x + y * y + z * z)
