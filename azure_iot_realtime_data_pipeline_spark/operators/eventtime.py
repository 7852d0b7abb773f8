"""Event-time policy operators (F3, batch form).

The reference job runs with `events_out_of_order_policy = "Adjust"`,
30 s reorder buffer and 60 s late-arrival tolerance
(reference terraform/main-example.tf:133-136): an out-of-order event's
timestamp is CLAMPED forward to the stream's high-water mark, and events
later than the tolerance are dropped. Structured Streaming's watermark
covers the drop half natively (`withWatermark`, streaming/pipeline.py);
the clamp half is a projection Spark doesn't ship — expressed here as a
running-max window so both halves are batch-testable against a SQL
oracle.

Scale notes: both operators are a single window over (key, arrival
order) — one shuffle on the key, no global sort. The reference's policy
is per-stream; partitioning by device key is the scale-out choice and
matches how a partitioned hub applies the policy per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

LATE_TOLERANCE_SECONDS = 60


def adjust_clamp(
    df: DataFrame,
    ts_col: str = "ts",
    key: str = "user_id",
    order_col: str = "event_id",
) -> DataFrame:
    """ASA `Adjust` policy: clamp each event's timestamp forward to the
    running per-key maximum in arrival order. In-order events pass
    through; out-of-order events get the high-water mark."""
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("adjusted_ts", F.max(F.col(ts_col)).over(w))


def drop_late(
    df: DataFrame,
    ts_col: str = "ts",
    key: str = "user_id",
    order_col: str = "event_id",
    tolerance_seconds: int = LATE_TOLERANCE_SECONDS,
) -> DataFrame:
    """Late-arrival tolerance: drop events more than `tolerance_seconds`
    behind the running per-key high-water mark at their arrival point —
    the batch analog of the streaming watermark discard."""
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hwm = F.max(F.unix_timestamp(F.col(ts_col))).over(w)
    return (
        df.withColumn("_hwm", hwm)
        .filter(F.unix_timestamp(F.col(ts_col)) >= F.col("_hwm") - tolerance_seconds)
        .drop("_hwm")
    )
