"""Point-in-polygon zone assignment, UDF-free (reference: the NOAA/NYC
project joins stations to UHF-42 geo zones, work/Projet_Mathis_Romain.docx
and work/Projet/preparation_noaa.ipynb:489-551 — the notebook ships the
nearest-station join, implemented in knn.py; this module adds the
polygon-containment join the zone shapefiles imply).

Containment is the classic even-odd ray cast — count polygon edges a
horizontal ray from the point crosses; odd = inside — expressed entirely
in array lambdas over the vertex list (filter over an index sequence,
element_at for the wrapping edge), so it runs in WholeStageCodegen with
no Python. Identical IEEE arithmetic on both engines makes the crossing
booleans deterministic; the synthetic vertices sit on half-degree
offsets while the station grid is integer-degree, so no point ever lies
exactly on an edge (the one case even-odd is ill-conditioned for).

Scale shape: zones are a broadcast dimension (every real zone table is —
UHF42 has 42 rows); each station evaluates O(vertices) work per zone.
At planetary zone counts, prefilter with a bbox grid join (cell id =
floor(lat/size), the knn_join_grid pattern) before the exact test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cours_datalake_dwh_td_kafka_spark.operators.knn import stations_df
from cours_datalake_dwh_td_kafka_spark.registry import register

#: (zone, vertices) — a box, a triangle, and a CONCAVE L (the case where
#: bbox tests and convex-only winding shortcuts give wrong answers)
ZONES: tuple[tuple[str, tuple[tuple[float, float], ...]], ...] = (
    (
        "box_east",
        ((0.5, -20.5), (40.5, -20.5), (40.5, 20.5), (0.5, 20.5)),
    ),
    (
        "tri_north",
        ((-50.5, 5.5), (-10.5, 5.5), (-30.5, 28.5)),
    ),
    (
        "ell_south",
        (
            (-55.5, -28.5),
            (-15.5, -28.5),
            (-15.5, -15.5),
            (-35.5, -15.5),
            (-35.5, -2.5),
            (-55.5, -2.5),
        ),
    ),
)


def _zone_values_sql() -> str:
    rows = []
    for zone, verts in ZONES:
        pts = ", ".join(f"{{'x': {x}, 'y': {y}}}" for x, y in verts)
        rows.append(f"('{zone}', [{pts}])")
    return ", ".join(rows)


_PIP_SQL = f"""
    WITH polys AS (
      SELECT * FROM (VALUES {_zone_values_sql()}) t(zone, p)
    ),
    pts AS (
      SELECT s_suppkey AS station_id,
             CAST(s_suppkey * 17 % 120 - 60 AS DOUBLE) AS x,
             CAST(s_suppkey * 11 % 60 - 30 AS DOUBLE) AS y
      FROM supplier
    )
    SELECT station_id, zone FROM pts CROSS JOIN polys
    WHERE len(list_filter(generate_series(1, len(p)),
          i -> ((p[i].y > y)
                <> (p[CASE WHEN i = len(p) THEN 1 ELSE i + 1 END].y > y))
               AND x < (p[CASE WHEN i = len(p) THEN 1 ELSE i + 1 END].x
                        - p[i].x)
                       * (y - p[i].y)
                       / nullif(p[CASE WHEN i = len(p) THEN 1
                                 ELSE i + 1 END].y - p[i].y, 0)
                       + p[i].x)) % 2 = 1
    ORDER BY station_id, zone
"""


def point_in_polygon(
    points: DataFrame,
    zones: DataFrame,
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Assign each (x, y) point to every zone whose polygon contains it.
    ``zones`` needs (zone, p) with p an array<struct<x,y>> vertex ring
    (unclosed — the wrapping edge is implicit). Overlapping zones yield
    one row per containment; unassigned points yield none."""
    n = F.size("p")
    nxt = lambda i: F.element_at(  # noqa: E731 — wrapping vertex
        F.col("p"), F.when(i == n, F.lit(1)).otherwise(i + 1)
    )
    cur = lambda i: F.element_at(F.col("p"), i)  # noqa: E731
    # the sign test already excludes horizontal edges, BUT conjunction
    # short-circuiting is a codegen detail, not a semantic guarantee —
    # under ANSI mode a reordered predicate would raise DIVIDE_BY_ZERO.
    # nullif makes the divisor null-safe: a horizontal edge yields NULL,
    # NULL never passes the filter, semantics unchanged (same guard in
    # the oracle SQL).
    crossing = lambda i: (  # noqa: E731
        (cur(i)["y"] > F.col(y)) != (nxt(i)["y"] > F.col(y))
    ) & (
        F.col(x)
        < (nxt(i)["x"] - cur(i)["x"])
        * (F.col(y) - cur(i)["y"])
        / F.nullif(nxt(i)["y"] - cur(i)["y"], F.lit(0.0))
        + cur(i)["x"]
    )
    odd = F.size(F.filter(F.sequence(F.lit(1), n), crossing)) % 2 == 1
    return points.crossJoin(F.broadcast(zones)).where(odd)


def zones_polygons(spark: SparkSession) -> DataFrame:
    rows = [
        (zone, [{"x": float(vx), "y": float(vy)} for vx, vy in verts])
        for zone, verts in ZONES
    ]
    return spark.createDataFrame(
        rows, "zone string, p array<struct<x: double, y: double>>"
    )


@register("station_zone_assignment", _PIP_SQL)
def q_station_zone_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stations (knn.py's deterministic supplier-derived grid; x=lon,
    y=lat) assigned to the three literal zones — box, triangle, and a
    concave L — by the even-odd test."""
    pts = stations_df(spark, sf_dir).select(
        F.col("station_id"),
        F.col("station_lon").alias("x"),
        F.col("station_lat").alias("y"),
    )
    return (
        point_in_polygon(pts, zones_polygons(spark))
        .select("station_id", "zone")
        .orderBy("station_id", "zone")
    )
