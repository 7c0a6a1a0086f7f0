"""Geospatial operators for coordinate-bearing tables.

The reference's tables carry plant (Latitude, Longitude) — these are
the distance/proximity ops its users ask for next ("nearest plant",
"plants within r km"), built grid-first so nothing is all-pairs:
a candidate join on coarse lat/lon grid cells (the spatial analogue of
the LSH band join) followed by an exact haversine post-filter. All JVM
trig/column algebra — no UDF, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (haversine; spherical earth)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = F.sin(dlat) ** 2 + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) ** 2
    return F.lit(2 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def grid_cell(lat: Column, lon: Column, cell_deg: float) -> Column:
    """Coarse lat/lon grid id — the bucketing key for proximity joins.
    ``cell_deg`` should be ≥ the search radius in degrees so any point
    within radius lies in the same cell or one of the 8 neighbors."""
    return F.concat_ws(
        ":",
        F.floor(lat / cell_deg).cast("long"),
        F.floor(lon / cell_deg).cast("long"),
    )


def _with_neighbor_cells(df: DataFrame, lat: str, lon: str, cell_deg: float) -> DataFrame:
    """Attach the 9 cells (own + 8 neighbors) each point probes —
    explode is narrow; fan-out is a constant 9×."""
    cells = F.array(
        *[
            F.concat_ws(
                ":",
                (F.floor(F.col(lat) / cell_deg) + di).cast("long"),
                (F.floor(F.col(lon) / cell_deg) + dj).cast("long"),
            )
            for di in (-1, 0, 1)
            for dj in (-1, 0, 1)
        ]
    )
    return df.withColumn("_cell", F.explode(cells))


def points_within_radius(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    left_id: str = "id_a",
    right_id: str = "id_b",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """All (left, right) pairs within ``radius_km`` — grid-bucketed
    candidate equi-join + exact haversine post-filter; never a cross
    join. Cell size = radius expressed in degrees at the equator
    (latitude degrees are uniform; longitude cells narrow toward the
    poles, which only ever ADDS candidate cells, never loses pairs).

    Scale: the equi-join shuffles on the cell id; per-cell population
    is bounded by geography (points/km²), not corpus size, so the
    quadratic stays local — same design as the LSH band join.
    """
    cell_deg = max(radius_km / 111.0, 1e-6)  # 1 lat degree ≈ 111 km
    probes = _with_neighbor_cells(
        left.select(F.col(left_id), F.col(lat_col).alias("_la"), F.col(lon_col).alias("_loa")),
        "_la", "_loa", cell_deg,
    )
    corpus = right.select(
        F.col(right_id),
        F.col(lat_col).alias("_lb"),
        F.col(lon_col).alias("_lob"),
        grid_cell(F.col(lat_col), F.col(lon_col), cell_deg).alias("_cell"),
    )
    return (
        probes.join(corpus, on="_cell")
        .withColumn(
            "distance_km",
            haversine_km(F.col("_la"), F.col("_loa"), F.col("_lb"), F.col("_lob")),
        )
        .filter(F.col("distance_km") <= radius_km)
        .select(left_id, right_id, F.round("distance_km", 3).alias("distance_km"))
        .distinct()
    )
