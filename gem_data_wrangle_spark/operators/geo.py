"""Geospatial operators for coordinate-bearing tables.

The reference's tables carry plant (Latitude, Longitude) — these are
the distance/proximity ops its users ask for next ("nearest plant",
"plants within r km"), built grid-first so nothing is all-pairs:
a candidate join on coarse lat/lon grid cells (the spatial analogue of
the LSH band join) followed by an exact haversine post-filter. All JVM
trig/column algebra — no UDF, no driver loop.
"""

from __future__ import annotations

import math

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


def _lon_ring(cell_deg: float) -> int:
    """Number of longitude cells in the full ring. Cells tile the
    ring UNIFORMLY at width ``360/ring`` (≤ ``cell_deg``): a
    remainder-width seam cell would make "how many cells does this
    angular distance span" irregular at the antimeridian."""
    return max(int(math.ceil(360.0 / cell_deg)), 1)


def _lon_cell_idx(lon: Column, cell_deg: float) -> Column:
    """Longitude cell index in [0, ring): computed on the [0, 360)
    image of the longitude so the ring is contiguous and neighbor
    arithmetic can wrap across the antimeridian (a point at lon
    179.9° IS adjacent to one at −179.9°)."""
    ring = _lon_ring(cell_deg)
    width = 360.0 / ring
    wrapped = ((lon + 180.0) % 360.0 + 360.0) % 360.0
    # the clamp only guards FP rounding at wrapped ≈ 360
    return F.least(F.floor(wrapped / width).cast("long"), F.lit(ring - 1))


def grid_cell(lat: Column, lon: Column, cell_deg: float) -> Column:
    """Coarse lat/lon grid id — the bucketing key for proximity joins.
    ``cell_deg`` should be ≥ the search radius in latitude degrees;
    longitude cells wrap modulo the ring (see ``_lon_cell_idx``)."""
    return F.concat_ws(
        ":",
        F.floor(lat / cell_deg).cast("long"),
        _lon_cell_idx(lon, cell_deg),
    )


def _with_neighbor_cells(
    df: DataFrame, lat: str, lon: str, cell_deg: float
) -> DataFrame:
    """Attach every cell a point must probe: 3 latitude rows × a
    latitude-DEPENDENT longitude span.

    A fixed ±1 longitude neighborhood loses pairs away from the
    equator: ``cell_deg`` is the radius in LATITUDE degrees, but the
    same radius spans ``1/cos(lat)`` times more LONGITUDE degrees —
    at lat 60° a radius-wide pair can sit 2 cells apart, at lat 85°
    11 cells (measured: the 250 km oracle cross-check at ±85°
    synthetic latitudes found 36 of 88 true pairs missing under the
    old ±1 rule). So each probe covers ``w = floor(max_lon_span /
    cell_width) + 1`` cells per side, where ``max_lon_span =
    sec(|lat| + cell_deg) · cell_deg`` is the widest longitude
    separation a radius-close pair can have (worst-case latitude
    either point can occupy; the floor+1 form is the exact bound on
    how many uniform cells an interval of that length can straddle —
    a plain ``ceil`` under-counts when the ratio lands on an
    integer). ``w`` is clamped to the half-ring so polar probes
    degrade to scanning their full latitude band — correct, and
    bounded by the band population, not the corpus. Longitude
    neighbors wrap modulo the ring (antimeridian adjacency).

    Fan-out: 3·(2w+1) cells — 9-15 over the inhabited latitudes
    (w=1 below 55°, 2 below 68°), growing only toward the poles.
    """
    ring = _lon_ring(cell_deg)
    width = 360.0 / ring
    lat_c = F.col(lat)
    edge = F.least(F.abs(lat_c) + F.lit(cell_deg), F.lit(89.999))
    span = F.lit(cell_deg) / F.cos(F.radians(edge))
    w = F.least(
        (F.floor(span / F.lit(width)) + 1).cast("long"),
        F.lit(ring // 2 + 1),
    )
    lat_idx = F.floor(lat_c / cell_deg).cast("long")
    lon_idx = _lon_cell_idx(F.col(lon), cell_deg)
    out = df.withColumn("_dlat", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
    out = out.withColumn("_dlon", F.explode(F.sequence(-w, w)))
    cell = F.concat_ws(
        ":",
        lat_idx + F.col("_dlat"),
        ((lon_idx + F.col("_dlon")) % ring + ring) % ring,
    )
    # near-polar probes cover the whole ring, where 2w+1 > ring makes
    # neighbor indices coincide — dedup so the candidate join never
    # double-counts a (probe, cell) pair
    return (
        out.withColumn("_cell", cell)
        .drop("_dlat", "_dlon")
        .distinct()
    )


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
    join. Cell size = radius expressed in latitude degrees; the probe
    side covers a latitude-dependent longitude span with antimeridian
    wrap (see ``_with_neighbor_cells``), so no pair is lost at any
    latitude — verified against a cross-join oracle over synthetic
    coordinates spanning ±85° (`geo_radius_join` in the registry).

    Scale: the equi-join shuffles on the cell id; per-cell population
    is bounded by geography (points/km²), not corpus size, so the
    quadratic stays local — same design as the LSH band join.
    """
    cell_deg = max(radius_km / 111.0, 1e-6)  # 1 lat degree ≈ 111 km
    probes = _with_neighbor_cells(
        left.select(
            F.col(left_id), F.col(lat_col).alias("_la"), F.col(lon_col).alias("_loa")
        ),
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
