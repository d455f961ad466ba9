"""Planar spatial joins as compositions of existing DataFrame ops.

Not present in the reference (SURVEY.md §2.4: equi-joins only); added
per the custom-operator policy — the standard grid-binning rewrite every
spatial engine (Sedona, PostGIS ST_DWithin plans, BigQuery) uses to turn
a within-radius theta join into an equi-join.

Scale design: cell size = radius is the sweet spot (any point within r
of a probe lies in the probe's 3×3 cell neighborhood, and candidate
volume per probe is the 9-cell point density — never |L|×|R|). Hot
cells (cities) are AQE skew-join territory, the same discipline as the
interval-join time bins. Distance tests are EXACT integer arithmetic on
a planar integer grid (dx² + dy² ≤ r²) — no float haversine in the
predicate; geodetic inputs should be projected/quantized upstream.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# cell-id packing: xcell · _CELL_PACK + ycell. Collision-safe while
# ycell < _CELL_PACK, i.e. while the grid has fewer than 1e6 cells per
# axis — with cell = r that means extent/radius < 1e6, asserted below.
_CELL_PACK = 1_000_000


def grid_radius_join(
    left: DataFrame,
    right: DataFrame,
    radius: int,
    left_xy: Sequence[str] = ("x", "y"),
    right_xy: Sequence[str] = ("x", "y"),
    max_coord: int = 2**20,
) -> DataFrame:
    """Pairs (left, right) with integer-exact planar distance ≤ radius.

    ``left`` is the probe side: each left row explodes map-side to its
    3×3 cell neighborhood; ``right`` rows bin once; candidates meet in
    an EQUI-join on the packed cell id and the exact integer test
    dx² + dy² ≤ r² trims them. Output carries both sides' columns plus
    ``_d2`` (the squared distance, exact).

    ``max_coord`` documents/enforces the exactness and packing bounds:
    coordinates must be non-negative integers < max_coord so squared
    distances stay < 2·max_coord² (< 2⁶³) and the grid stays under
    _CELL_PACK cells per axis.
    """
    if radius <= 0:
        raise ValueError("grid_radius_join: radius must be positive")
    if (max_coord + radius - 1) // radius >= _CELL_PACK:
        raise ValueError(
            "grid_radius_join: grid exceeds the cell-id packing bound "
            f"({_CELL_PACK} cells/axis) — raise radius or re-quantize"
        )
    lx, ly = (F.col(c) for c in left_xy)
    rx, ry = (F.col(c) for c in right_xy)

    def _cell(xc: Column, yc: Column) -> Column:
        return xc * _CELL_PACK + yc

    r_binned = right.withColumn(
        "_cell", _cell(F.floor(rx / radius), F.floor(ry / radius))
    )
    off = left.sparkSession.range(9).select(
        (F.col("id") % 3 - 1).alias("_dx"),
        ((F.col("id") / 3).cast("long") - 1).alias("_dy"),
    )
    l_binned = left.crossJoin(F.broadcast(off)).withColumn(
        "_cell",
        _cell(
            F.floor(lx / radius) + F.col("_dx"),
            F.floor(ly / radius) + F.col("_dy"),
        ),
    ).drop("_dx", "_dy")
    dx = lx - rx
    dy = ly - ry
    d2 = dx * dx + dy * dy
    # the r² literal is formed in PYTHON (an int32 Spark literal product
    # overflows under ANSI constant folding at radius ≥ 46341)
    return (
        l_binned.join(r_binned, "_cell")
        .filter(d2 <= F.lit(radius * radius).cast("long"))
        .withColumn("_d2", d2)
        .drop("_cell")
    )
