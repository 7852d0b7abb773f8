"""Edge-coercion / serialization expressions (reference operators G1-G5).

Mirrors the .NET worker's row->JSON build for the Power BI push sink
(reference azure-function/PushTelemetryFunction.cs:336-400):

- every numeric NULL coalesces to 0.0        (cs:356-384)
- booleans/BIT coerce to 0.0/1.0             (cs:386-397)
- deviceId NULL coalesces to ""              (cs:341-343)
- timestamps format as UTC yyyy-MM-dd'T'HH:mm:ss.fff'Z'  (cs:349)

All pure Catalyst expressions (JVM-side, codegen'd).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

ISO_MILLIS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"


def coalesce_double(col: Column) -> Column:
    """NULL/non-finite-safe numeric edge coercion: NULL -> 0.0 (G3/G4)."""
    return F.coalesce(col.cast("double"), F.lit(0.0))


def coalesce_device_id(col: Column) -> Column:
    """deviceId NULL -> empty string (G5)."""
    return F.coalesce(col, F.lit(""))


def format_iso_millis(col: Column) -> Column:
    """UTC ISO-8601 with millisecond precision and literal Z (G2)."""
    return F.date_format(col, ISO_MILLIS_FORMAT)


def row_to_json(cols: Sequence[Column]) -> Column:
    """Flat row -> JSON object string (G1), the per-row payload unit of
    the HTTP push sink."""
    return F.to_json(F.struct(*cols))
