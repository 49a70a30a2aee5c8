"""Geospatial functions — the public ST_* query surface, re-expressed
as JVM expressions with a pushdown-first scale story.

The public system ships a geospatial family (ST_Point, ST_Distance,
ST_Contains/ST_Within, ST_GeomFromText/ST_GeogFromText) with an
H3-based geo index accelerating distance and containment predicates.
This engine's Spark-first mapping:

  * A point is a plain ``struct<x double, y double>`` column
    (x = longitude, y = latitude for geography) — no opaque WKB blobs,
    so points project/compare/group like any other struct.
  * ST_DISTANCE on geography is the haversine great-circle distance in
    meters (mean earth radius, the public geography semantics);
    geometry distance is planar euclidean. Both compile to closed-form
    JVM math — no UDFs.
  * ST_CONTAINS(polygonWKT, point) compiles the polygon ONCE
    (Python-side WKT parse) into an edge-array literal and evaluates
    even-odd ray casting as an F.aggregate fold — pure JVM, linear in
    polygon size, holes handled by crossing parity.
  * THE SCALE PATH IS THE BOUNDING BOX, not the index: every
    radius/polygon search first applies a rectangular lon/lat
    predicate that Parquet min/max stats (and a sorted or
    segment-partitioned layout) can prune on — the same role the
    public H3 index plays (coarse candidate pruning) — and only then
    the exact haversine/ray-cast test. ``grid_cell`` gives a
    partition/bucket key for co-locating spatial joins.

Limitations (documented, not silent): WKT support is POINT and
POLYGON (with holes); MULTIPOLYGON and arbitrary geometry-column
containment raise. Distances near the antimeridian use the raw lon
delta (no wraparound) — split the box at ±180° upstream if that
matters for your data.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6_371_008.7714  # IUGG mean earth radius


def st_point(x: Column | float, y: Column | float) -> Column:
    """Point constructor: struct(x=lon, y=lat)."""
    xc = x if isinstance(x, Column) else F.lit(float(x))
    yc = y if isinstance(y, Column) else F.lit(float(y))
    return F.struct(xc.cast("double").alias("x"), yc.cast("double").alias("y"))


def haversine_m(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Great-circle distance in meters (closed-form JVM math)."""
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = F.pow(F.sin(dlat), 2) + (
        F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.pow(F.sin(dlon), 2)
    )
    return 2 * EARTH_RADIUS_M * F.asin(F.sqrt(a))


def st_distance(p1: Column, p2: Column, geography: bool = True) -> Column:
    """Distance between two point structs: meters on geography
    (haversine), coordinate units on geometry (euclidean)."""
    if geography:
        return haversine_m(p1["x"], p1["y"], p2["x"], p2["y"])
    return F.sqrt(F.pow(p1["x"] - p2["x"], 2) + F.pow(p1["y"] - p2["y"], 2))


# -- WKT -------------------------------------------------------------------
_POINT_RE = re.compile(r"^\s*POINT\s*\(\s*(-?[\d.eE+]+)\s+(-?[\d.eE+]+)\s*\)\s*$", re.I)
_POLY_RE = re.compile(r"^\s*POLYGON\s*\((.*)\)\s*$", re.I | re.S)
_RING_RE = re.compile(r"\(([^()]*)\)")


def parse_wkt_point(wkt: str) -> tuple[float, float]:
    m = _POINT_RE.match(wkt)
    if not m:
        raise ValueError(f"not a WKT POINT: {wkt!r}")
    return float(m.group(1)), float(m.group(2))


def parse_wkt_polygon(wkt: str) -> list[list[tuple[float, float]]]:
    """POLYGON ((ring), (hole), …) → list of rings as (x, y) lists.
    Rings may repeat the first vertex last (standard WKT); the closing
    edge is implied either way."""
    m = _POLY_RE.match(wkt)
    if not m:
        raise ValueError(
            f"not a WKT POLYGON: {wkt!r} (POINT and POLYGON are supported; "
            "MULTIPOLYGON is not)"
        )
    rings = []
    for ring_txt in _RING_RE.findall(m.group(1)):
        pts = []
        for pair in ring_txt.split(","):
            xs = pair.split()
            if len(xs) != 2:
                raise ValueError(f"bad WKT coordinate pair {pair!r}")
            pts.append((float(xs[0]), float(xs[1])))
        if len(pts) >= 2 and pts[0] == pts[-1]:
            pts = pts[:-1]
        if len(pts) < 3:
            raise ValueError("polygon ring needs at least 3 distinct vertices")
        rings.append(pts)
    if not rings:
        raise ValueError(f"empty WKT POLYGON: {wkt!r}")
    return rings


def st_contains(polygon_wkt: str, point: Column) -> Column:
    """Even-odd ray casting of a point struct against a POLYGON literal:
    the rings compile once into an edge-array literal, the crossing
    parity is an F.aggregate fold (pure JVM; holes flip parity back
    out). Boundary points follow standard ray-cast half-open semantics.
    """
    rings = parse_wkt_polygon(polygon_wkt)
    edges = [
        (x1, y1, x2, y2)
        for ring in rings
        for (x1, y1), (x2, y2) in zip(ring, ring[1:] + ring[:1])
    ]
    edge_arr = F.array(
        *[
            F.struct(
                F.lit(x1).alias("x1"), F.lit(y1).alias("y1"),
                F.lit(x2).alias("x2"), F.lit(y2).alias("y2"),
            )
            for x1, y1, x2, y2 in edges
        ]
    )
    px, py = point["x"], point["y"]
    return F.aggregate(
        edge_arr,
        F.lit(False),
        lambda acc, e: F.when(
            ((e["y1"] > py) != (e["y2"] > py))
            & (
                px
                < (e["x2"] - e["x1"]) * (py - e["y1"]) / (e["y2"] - e["y1"])
                + e["x1"]
            ),
            ~acc,
        ).otherwise(acc),
    )


def polygon_bbox(polygon_wkt: str) -> tuple[float, float, float, float]:
    """(min_x, min_y, max_x, max_y) of all rings — the pushdown-able
    candidate filter to apply on raw lon/lat columns BEFORE ray casting."""
    pts = [p for ring in parse_wkt_polygon(polygon_wkt) for p in ring]
    xs, ys = [p[0] for p in pts], [p[1] for p in pts]
    return min(xs), min(ys), max(xs), max(ys)


# -- scale helpers ---------------------------------------------------------
def grid_cell(lon: Column, lat: Column, cell_deg: float = 1.0) -> Column:
    """Stable long grid key for bucketing / co-locating spatial joins
    (the engine's coarse analogue of an H3 cell): floor-divide both
    axes by ``cell_deg`` and pack. 360/cell_deg columns per row of
    cells; neighbors differ by ±1 / ±stride."""
    stride = int(math.ceil(360.0 / cell_deg)) + 1
    ix = F.floor((lon + 180.0) / cell_deg).cast("long")
    iy = F.floor((lat + 90.0) / cell_deg).cast("long")
    return iy * stride + ix


GEO_CELL_COL = "__geo_cell"


def write_geo_partitioned(
    df: DataFrame,
    path: str,
    lon_col: str,
    lat_col: str,
    cell_deg: float = 1.0,
    mode: str = "overwrite",
) -> None:
    """Persist a points table partitioned by its grid cell — the
    engine's geo-index layout (the role the public H3 index plays):
    each cell is a partition directory, so spatial predicates prune to
    the touched cells before any file is opened. Pick ``cell_deg``
    near your typical query radius (too fine → many tiny partitions;
    too coarse → no pruning)."""
    (
        df.withColumn(GEO_CELL_COL, grid_cell(F.col(lon_col), F.col(lat_col), cell_deg))
        .write.partitionBy(GEO_CELL_COL)
        .mode(mode)
        .save(path)
    )


def _covering_cells(
    min_lon: float, max_lon: float, min_lat: float, max_lat: float, cell_deg: float
) -> list[int]:
    """All grid-cell keys intersecting a bbox (the partition candidate
    set for routing)."""
    stride = int(math.ceil(360.0 / cell_deg)) + 1
    ix0 = int(math.floor((min_lon + 180.0) / cell_deg))
    ix1 = int(math.floor((max_lon + 180.0) / cell_deg))
    iy0 = int(math.floor((min_lat + 90.0) / cell_deg))
    iy1 = int(math.floor((max_lat + 90.0) / cell_deg))
    return [
        iy * stride + ix for iy in range(iy0, iy1 + 1) for ix in range(ix0, ix1 + 1)
    ]


def radius_query_partitioned(
    spark,
    path: str,
    lon_col: str,
    lat_col: str,
    center_lon: float,
    center_lat: float,
    radius_m: float,
    cell_deg: float = 1.0,
    max_cells: int = 4096,
) -> DataFrame:
    """Radius search over a geo-partitioned table: the covering cells of
    the search bbox become an IN-list on the PARTITION column (directory
    pruning — untouched cells are never listed or read), then the same
    bbox + exact haversine as points_within_radius. ``cell_deg`` must
    match the written layout. A radius covering more than ``max_cells``
    cells skips the cell filter (the bbox still prunes row groups)."""
    lat_pad = math.degrees(radius_m / EARTH_RADIUS_M)
    cos_lat = math.cos(math.radians(center_lat))
    lon_pad = (
        180.0
        if abs(center_lat) > 85.0 or cos_lat <= 0
        else math.degrees(radius_m / (EARTH_RADIUS_M * cos_lat))
    )
    df = spark.read.parquet(path)
    cells = _covering_cells(
        center_lon - lon_pad, center_lon + lon_pad,
        center_lat - lat_pad, center_lat + lat_pad, cell_deg,
    )
    if len(cells) <= max_cells:
        df = df.where(F.col(GEO_CELL_COL).isin(cells))
    return points_within_radius(
        df, lon_col, lat_col, center_lon, center_lat, radius_m
    ).drop(GEO_CELL_COL)


def points_within_radius(
    df: DataFrame,
    lon_col: str,
    lat_col: str,
    center_lon: float,
    center_lat: float,
    radius_m: float,
) -> DataFrame:
    """Radius search with the scale-correct two-stage shape: a
    rectangular lon/lat pre-filter (reaches the parquet scan as two
    range predicates → min/max row-group pruning; a lat/lon-sorted or
    grid-partitioned layout turns this into real segment pruning),
    then the exact haversine test. Adds ``distance_m``.

    The bbox pads longitude by the radius at the CENTER latitude —
    fine away from the poles; above ~±85° the lon window degenerates
    and is widened to the full circle."""
    lat_pad = math.degrees(radius_m / EARTH_RADIUS_M)
    cos_lat = math.cos(math.radians(center_lat))
    if abs(center_lat) > 85.0 or cos_lat <= 0:
        lon_pad = 180.0
    else:
        lon_pad = math.degrees(radius_m / (EARTH_RADIUS_M * cos_lat))
    lon, lat = F.col(lon_col), F.col(lat_col)
    boxed = df.where(
        (lat >= center_lat - lat_pad)
        & (lat <= center_lat + lat_pad)
        & (lon >= center_lon - lon_pad)
        & (lon <= center_lon + lon_pad)
    )
    dist = haversine_m(lon, lat, F.lit(center_lon), F.lit(center_lat))
    return boxed.withColumn("distance_m", dist).where(F.col("distance_m") <= radius_m)


# -- area ------------------------------------------------------------------
def polygon_area_planar(rings: list[list[tuple[float, float]]]) -> float:
    """Cartesian polygon area (shoelace; holes subtract). The public
    ST_Area semantics for GEOMETRY input — coordinate units squared."""
    total = 0.0
    for idx, ring in enumerate(rings):
        pts = list(ring)
        if pts[0] != pts[-1]:
            pts.append(pts[0])
        s = 0.0
        for (x1, y1), (x2, y2) in zip(pts, pts[1:]):
            s += x1 * y2 - x2 * y1
        area = abs(s) / 2.0
        total += area if idx == 0 else -area
    return total


def polygon_area_spherical(rings: list[list[tuple[float, float]]]) -> float:
    """Spherical polygon area in m² (the GEOGRAPHY reading): the
    Chamberlain & Duquette line-integral formula (NASA JPL publication
    2007; the same closed form GIS libraries use for sphere-model
    geodesic area), holes subtract."""
    import math

    total = 0.0
    for idx, ring in enumerate(rings):
        pts = list(ring)
        if pts[0] != pts[-1]:
            pts.append(pts[0])
        s = 0.0
        for (lon1, lat1), (lon2, lat2) in zip(pts, pts[1:]):
            s += math.radians(lon2 - lon1) * (
                math.sin(math.radians(lat1)) + math.sin(math.radians(lat2))
            )
        area = abs(s) * EARTH_RADIUS_M * EARTH_RADIUS_M / 2.0
        total += area if idx == 0 else -area
    return total
