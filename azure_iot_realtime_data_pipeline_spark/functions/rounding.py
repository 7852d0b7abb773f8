"""Cross-engine-stable rounding.

Spark's `round(double, d)` rounds the double's *shortest decimal
representation* (Java BigDecimal.valueOf), while DuckDB rounds the exact
binary value — e.g. 563.81/8 = 70.476249999... rounds to 70.4763 in
Spark but 70.4762 in DuckDB. For value-hash parity every rounded output
in the query surface uses floor(x*10^d + 0.5)/10^d instead: pure double
ops that produce bit-identical results in any IEEE-754 engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_up(col: Column, digits: int = 4) -> Column:
    scale = float(10**digits)
    return F.floor(col * scale + 0.5) / scale


def sql_round_half_up(expr: str, digits: int = 4) -> str:
    """The identical formula in SQL text, for the DuckDB oracles."""
    scale = 10**digits
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"
