"""Spatial proximity joins via grid-cell bucketing.

The scale pattern for "all pairs within radius r" over billions of
points: bucket each point into an r-sized grid cell, expand the PROBE
side to its 3x3 neighborhood, equi-join on the cell key, and verify the
exact distance only inside candidate cells — the geo analogue of the
LSH banding the dedup family uses (candidates from a cheap equi-join,
never a cross join; work is O(points x local density), not O(n^2)).

Everything is codegen arithmetic: cell ids are integer floors, the
distance check is plain IEEE ops, so results are engine-portable and
the whole plan is ONE shuffle pair (build cells / probe cells) plus the
verify filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_grid_cell(
    df: DataFrame, x_col: str, y_col: str, cell: float,
    cx: str = "cx", cy: str = "cy",
) -> DataFrame:
    """Integer grid coordinates at ``cell`` resolution: floor(x / cell).
    ``cell`` must be >= the query radius so any two points within the
    radius land in the same or adjacent cells (the candidate guarantee).
    """
    return df.withColumn(cx, F.floor(F.col(x_col) / F.lit(cell)).cast("bigint")).withColumn(
        cy, F.floor(F.col(y_col) / F.lit(cell)).cast("bigint")
    )


def proximity_pairs(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: float,
) -> DataFrame:
    """All unordered pairs (a, b) with euclidean distance <= ``radius``,
    ``a < b`` by id.  Candidates come from a cell equi-join: the build
    side keeps its single home cell, the probe side explodes to its 3x3
    neighborhood, so every qualifying pair is produced EXACTLY once
    (the build point's home cell is one specific neighbor of the probe
    point's).  Returns ``(id_a, id_b, dist_sq)``.

    Scale: one shuffle per side on (cx, cy); skew follows point density
    — a hot cell is a data hotspot, mitigated by choosing ``cell`` ~
    ``radius`` (smallest neighborhoods that preserve the guarantee).
    """
    a = with_grid_cell(
        points.select(
            F.col(id_col).alias("id_a"),
            F.col(x_col).cast("double").alias("xa"),
            F.col(y_col).cast("double").alias("ya"),
        ),
        "xa", "ya", radius,
    )
    b = with_grid_cell(
        points.select(
            F.col(id_col).alias("id_b"),
            F.col(x_col).cast("double").alias("xb"),
            F.col(y_col).cast("double").alias("yb"),
        ),
        "xb", "yb", radius, cx="bx", cy="by",
    )
    probe = b.select(
        "id_b", "xb", "yb",
        F.explode(
            F.expr(
                "flatten(transform(array(-1, 0, 1), dx -> "
                "transform(array(-1, 0, 1), dy -> struct(bx + dx as cx, by + dy as cy))))"
            )
        ).alias("nc"),
    ).select("id_b", "xb", "yb", F.col("nc.cx").alias("cx"), F.col("nc.cy").alias("cy"))
    cand = a.join(probe, ["cx", "cy"]).filter(F.col("id_a") < F.col("id_b"))
    dx = F.col("xa") - F.col("xb")
    dy = F.col("ya") - F.col("yb")
    dist_sq = dx * dx + dy * dy
    return (
        cand.withColumn("dist_sq", dist_sq)
        .filter(F.col("dist_sq") <= F.lit(radius) * F.lit(radius))
        .select("id_a", "id_b", "dist_sq")
    )
