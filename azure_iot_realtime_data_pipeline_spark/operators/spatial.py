"""Spatial operators: grid-cell neighbor joins.

The distributed-spatial primitive every warehouse eventually needs
(device clustering, nearby-asset lookup, geofence candidates): an
all-pairs distance join is O(n^2), so points bucket into grid cells
sized >= the search radius and only same-or-adjacent cells join —
candidate generation becomes an equi-join on the cell key, the same
sub-quadratic shape as the MinHash/LSH/IVF families on the text and
embedding sides.

Engine-exactness: coordinates ride as INTEGER tenths of a degree and
the radius predicate compares integer squared distances — no floats,
no haversine (trig is a cross-libm trap; at city scale the flat-grid
metric is the standard approximation and the semantics are exact by
definition, not approximately portable). Cell ids floor a double
division (the one spelling Spark and DuckDB agree on for negatives —
DuckDB's // truncates toward zero, Spark's floor does not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: 3x3 neighborhood offsets, exploded on the PROBE side only — each
#: (a, b) candidate pair is generated exactly once because the build
#: side keeps its single true cell.
_NEIGHBOR_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def grid_neighbor_pairs(
    pts: DataFrame,
    id_col: str,
    lat_t_col: str,
    lon_t_col: str,
    radius_tenths: int = 1,
    cell_tenths: int = 3,
) -> DataFrame:
    """L42 grid-cell neighbor join: unordered pairs of points within
    `radius_tenths` (integer tenths of a degree, Euclidean on the
    grid) of each other. Cells must be at least as wide as the radius
    (validated) so the 3x3 neighborhood is a complete candidate cover.

    Plan: one map-side 9x explode of the probe side, one equi-join on
    the (cell_x, cell_y) key (shuffle-hash pinned — both sides are
    point-sized), integer residual distance filter, a < b dedup built
    into the join condition. Never a cross product; candidate volume
    is sum over cells of 9 * |cell|^2-ish, bounded by density, not n^2.

    Returns (id_a, id_b, d2_tenths) with d2 the exact integer squared
    distance."""
    if cell_tenths < radius_tenths:
        raise ValueError(
            f"cell_tenths ({cell_tenths}) must be >= radius_tenths "
            f"({radius_tenths}) for the 3x3 cover to be complete"
        )
    cx = F.floor(F.col(lat_t_col).cast("double") / F.lit(float(cell_tenths)))
    cy = F.floor(F.col(lon_t_col).cast("double") / F.lit(float(cell_tenths)))
    base = pts.select(
        F.col(id_col).alias("_id"),
        F.col(lat_t_col).cast("long").alias("_lat"),
        F.col(lon_t_col).cast("long").alias("_lon"),
        cx.alias("_cx"),
        cy.alias("_cy"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in _NEIGHBOR_OFFSETS
        ]
    )
    probe = base.select(
        F.col("_id").alias("_ida"),
        F.col("_lat").alias("_lata"),
        F.col("_lon").alias("_lona"),
        F.explode(offsets).alias("_o"),
        F.col("_cx").alias("_cxa"),
        F.col("_cy").alias("_cya"),
    ).select(
        "_ida",
        "_lata",
        "_lona",
        (F.col("_cxa") + F.col("_o.dx")).alias("_pcx"),
        (F.col("_cya") + F.col("_o.dy")).alias("_pcy"),
    )
    r2 = radius_tenths * radius_tenths
    d2 = (F.col("_lata") - F.col("_lat")) * (
        F.col("_lata") - F.col("_lat")
    ) + (F.col("_lona") - F.col("_lon")) * (F.col("_lona") - F.col("_lon"))
    return (
        probe.join(
            base.hint("shuffle_hash"),
            (F.col("_pcx") == F.col("_cx"))
            & (F.col("_pcy") == F.col("_cy"))
            & (F.col("_ida") < F.col("_id")),
        )
        .filter(d2 <= F.lit(r2))
        .select(
            F.col("_ida").alias("id_a"),
            F.col("_id").alias("id_b"),
            d2.alias("d2_tenths"),
        )
    )
