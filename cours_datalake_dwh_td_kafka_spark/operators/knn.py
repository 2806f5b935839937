"""Nearest-neighbor (KNN) geo join — SURVEY.md §2.3 J5.

The reference computes "closest weather station per geo zone" as a full
cross join + per-zone rank()==1 (reference: work/Projet/preparation_noaa.ipynb:528-551)
with an explicit "must stay small" warning. Two implementations here:

- ``knn_join``: the reference-shaped crossJoin + rank plan (exact, O(n*m),
  broadcast nested loop). Correctness anchor and fine when one side is
  small-dimension-sized.
- ``knn_join_grid``: the 100-TB path. Stations are bucketed into coarse
  lat/lon grid cells; each zone probes only its 3x3 cell neighborhood, so
  the join is an equi-join on cell id (hash join, shuffle bounded by
  neighborhood size) instead of a cartesian product. Exact whenever the
  true nearest neighbor lies within one cell ring (cell size is chosen
  >= the max observed NN distance; equality vs the naive plan is asserted
  in tests). Zones with an empty neighborhood fall back to the naive path.

Zones/stations are derived deterministically from nation/supplier so the
DuckDB oracle can rebuild the exact same inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cours_datalake_dwh_td_kafka_spark.io import load_table
from cours_datalake_dwh_td_kafka_spark.operators.relational import (
    HAVERSINE_SQL,
    haversine_km,
)
from cours_datalake_dwh_td_kafka_spark.registry import register

# Deterministic synthetic geo: zones from nation, stations from supplier.
_ZONE_LAT = "n_nationkey * 7 % 60 - 30 + 0.25"
_ZONE_LON = "n_nationkey * 13 % 120 - 60 + 0.25"
_STATION_LAT = "s_suppkey * 11 % 60 - 30"
_STATION_LON = "s_suppkey * 17 % 120 - 60"

CELL_DEG = 15.0  # coarse grid: must exceed max NN distance in degrees


def zones_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        F.col("n_nationkey").alias("zone_id"),
        F.expr(_ZONE_LAT).cast("double").alias("zone_lat"),
        F.expr(_ZONE_LON).cast("double").alias("zone_lon"),
    )


def stations_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    return s.select(
        F.col("s_suppkey").alias("station_id"),
        F.expr(_STATION_LAT).cast("double").alias("station_lat"),
        F.expr(_STATION_LON).cast("double").alias("station_lon"),
    )


def nearest_station(zones: DataFrame, stations: DataFrame) -> DataFrame:
    """Reference-shaped exact KNN: crossJoin + rank()==1 (ties kept, matching
    the reference's rank semantics at preparation_noaa.ipynb:546-551)."""
    dist = F.round(
        haversine_km(
            F.col("zone_lat"),
            F.col("zone_lon"),
            F.col("station_lat"),
            F.col("station_lon"),
        ),
        4,
    )
    w = Window.partitionBy("zone_id").orderBy("dist_km", "station_id")
    return (
        zones.crossJoin(F.broadcast(stations))
        .withColumn("dist_km", dist)
        .withColumn("rnk", F.rank().over(w).cast("long"))
        .where(F.col("rnk") == 1)
        .select("zone_id", "station_id", "dist_km")
        .orderBy("zone_id", "station_id")
    )


def nearest_station_grid(
    zones: DataFrame, stations: DataFrame, cell_deg: float = CELL_DEG
) -> DataFrame:
    """Scale path: equi-join on grid cells instead of a cartesian product.

    Stations are replicated into their 3x3 cell neighborhood (9x replication
    of the SMALL side only); zones then equi-join on their own cell id. At
    1000 executors this is a plain hash join shuffled on cell id — no
    broadcast of an O(n*m) product, no driver involvement, and AQE handles
    cell-skew. Zones whose neighborhood holds no station fall back to the
    exact naive join (anti-join to find them — rare by construction).
    """
    cell_lat = F.floor(F.col("station_lat") / cell_deg)
    cell_lon = F.floor(F.col("station_lon") / cell_deg)
    # replicate each station into its neighborhood cells
    offsets = F.expr("explode(flatten(transform(sequence(-1,1), i -> transform(sequence(-1,1), j -> struct(i, j)))))")
    st_cells = (
        stations.withColumn("o", offsets)
        .select(
            "station_id",
            "station_lat",
            "station_lon",
            (cell_lat + F.col("o.i")).alias("cell_lat"),
            (cell_lon + F.col("o.j")).alias("cell_lon"),
        )
    )
    z_cells = zones.withColumn(
        "cell_lat", F.floor(F.col("zone_lat") / cell_deg)
    ).withColumn("cell_lon", F.floor(F.col("zone_lon") / cell_deg))

    dist = F.round(
        haversine_km(
            F.col("zone_lat"),
            F.col("zone_lon"),
            F.col("station_lat"),
            F.col("station_lon"),
        ),
        4,
    )
    w = Window.partitionBy("zone_id").orderBy("dist_km", "station_id")
    candidates = (
        z_cells.join(st_cells, ["cell_lat", "cell_lon"])
        .withColumn("dist_km", dist)
        .withColumn("rnk", F.rank().over(w).cast("long"))
        .where(F.col("rnk") == 1)
        .select("zone_id", "station_id", "dist_km")
    )
    # fallback: zones with zero candidates in their neighborhood
    missed = zones.join(
        candidates.select("zone_id"), "zone_id", "left_anti"
    )
    fallback = nearest_station(missed, stations).select(
        "zone_id", "station_id", "dist_km"
    )
    return candidates.unionByName(fallback).orderBy("zone_id", "station_id")


_KNN_ORACLE = f"""
WITH zones AS (
  SELECT n_nationkey AS zone_id,
         CAST(n_nationkey * 7 % 60 - 30 + 0.25 AS DOUBLE) AS zone_lat,
         CAST(n_nationkey * 13 % 120 - 60 + 0.25 AS DOUBLE) AS zone_lon
  FROM nation
),
stations AS (
  SELECT s_suppkey AS station_id,
         CAST(s_suppkey * 11 % 60 - 30 AS DOUBLE) AS station_lat,
         CAST(s_suppkey * 17 % 120 - 60 AS DOUBLE) AS station_lon
  FROM supplier
),
crossed AS (
  SELECT z.zone_id, s.station_id,
         ROUND({HAVERSINE_SQL.format(
             lat1="z.zone_lat", lon1="z.zone_lon",
             lat2="s.station_lat", lon2="s.station_lon")}, 4) AS dist_km
  FROM zones z CROSS JOIN stations s
),
ranked AS (
  SELECT *, RANK() OVER (PARTITION BY zone_id ORDER BY dist_km, station_id) AS rnk
  FROM crossed
)
SELECT zone_id, station_id, dist_km
FROM ranked WHERE rnk = 1
ORDER BY zone_id, station_id
"""


@register("knn_join", _KNN_ORACLE)
def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return nearest_station(zones_df(spark, sf_dir), stations_df(spark, sf_dir))


@register("knn_join_grid", _KNN_ORACLE)
def q_knn_join_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return nearest_station_grid(
        zones_df(spark, sf_dir), stations_df(spark, sf_dir)
    )
