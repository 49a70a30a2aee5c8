"""Geospatial (functions/geo.py + ST_* dialect surface): haversine
accuracy, ray-cast containment incl. holes, WKT parsing, radius search
with its pushdown bbox, and the SQL handlers."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from apache_pinot_spark.functions import geo as G


def test_haversine_known_distances(spark):
    # Paris (2.3522, 48.8566) — London (-0.1276, 51.5072) ≈ 343.5 km
    df = spark.range(1).select(
        G.haversine_m(F.lit(2.3522), F.lit(48.8566), F.lit(-0.1276), F.lit(51.5072))
        .alias("d")
    )
    d = df.collect()[0]["d"]
    assert abs(d - 343_550) < 1500  # within sphere-model tolerance
    # zero distance and quarter-meridian sanity
    z = spark.range(1).select(
        G.haversine_m(F.lit(10.0), F.lit(20.0), F.lit(10.0), F.lit(20.0)).alias("d")
    ).collect()[0]["d"]
    assert z == 0.0
    q = spark.range(1).select(
        G.haversine_m(F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(90.0)).alias("d")
    ).collect()[0]["d"]
    assert abs(q - math.pi / 2 * G.EARTH_RADIUS_M) < 1.0


def test_st_distance_geometry_euclidean(spark):
    df = spark.range(1).select(
        G.st_distance(G.st_point(0.0, 0.0), G.st_point(3.0, 4.0), geography=False)
        .alias("d")
    )
    assert df.collect()[0]["d"] == 5.0


def test_wkt_parsing():
    assert G.parse_wkt_point("POINT (2.5 -3.5)") == (2.5, -3.5)
    rings = G.parse_wkt_polygon("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    assert rings == [[(0, 0), (10, 0), (10, 10), (0, 10)]]  # closing vertex dropped
    assert G.polygon_bbox("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))") == (0, 0, 10, 10)
    for bad in ("POINT (1)", "MULTIPOLYGON (((0 0, 1 0, 1 1)))",
                "POLYGON ((0 0, 1 1))", "LINESTRING (0 0, 1 1)"):
        with pytest.raises(ValueError):
            (G.parse_wkt_point if bad.startswith("POINT") else G.parse_wkt_polygon)(bad)


def test_st_contains_with_hole(spark):
    wkt = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"
    pts = [(5.0, 2.0, True),   # inside shell, outside hole
           (5.0, 5.0, False),  # inside the hole
           (11.0, 5.0, False), # outside shell
           (1.0, 9.0, True)]
    df = spark.createDataFrame(pts, "x double, y double, want boolean")
    out = df.select("want", G.st_contains(wkt, G.st_point(F.col("x"), F.col("y")))
                    .alias("got")).collect()
    assert all(r["want"] == r["got"] for r in out)


def test_points_within_radius_with_pushdown_bbox(spark):
    # ring of points at known distances from a Berlin-ish center
    center_lon, center_lat = 13.4, 52.5
    rows = []
    for i, km in enumerate([1, 5, 20, 80, 300]):
        dlat = math.degrees(km * 1000 / G.EARTH_RADIUS_M)
        rows.append((i, center_lon, center_lat + dlat, km))
    df = spark.createDataFrame(rows, "id long, lon double, lat double, km long")
    out = G.points_within_radius(df, "lon", "lat", center_lon, center_lat, 25_000)
    got = sorted(r["km"] for r in out.collect())
    assert got == [1, 5, 20]
    assert all(abs(r["distance_m"] - r["km"] * 1000) < 50 for r in out.collect())
    # the bbox must reach the scan as plain range filters (pushdown-able)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Filter" in plan and "lat" in plan


def test_grid_cell_bucketing(spark):
    df = spark.createDataFrame(
        [(13.40, 52.50), (13.45, 52.55), (14.6, 52.5), (13.4, -33.9)],
        "lon double, lat double",
    )
    cells = [r["c"] for r in df.select(G.grid_cell(F.col("lon"), F.col("lat"), 1.0)
                                       .alias("c")).collect()]
    assert cells[0] == cells[1]          # same 1° cell
    assert cells[0] != cells[2]          # neighbor cell east
    assert cells[0] != cells[3]          # other hemisphere
    assert cells[2] - cells[0] == 1      # east neighbor differs by 1


def test_sql_st_family(spark):
    from apache_pinot_spark.sqlfront import PinotEngine

    eng = PinotEngine(spark)
    eng.register(
        "places",
        spark.createDataFrame(
            [("a", 2.3522, 48.8566), ("b", -0.1276, 51.5072), ("c", 5.0, 5.0)],
            "name string, lon double, lat double",
        ),
    )
    d = eng.sql(
        "SELECT ST_DISTANCE(ST_POINT(lon, lat), ST_GEOGFROMTEXT('POINT (2.3522 48.8566)')) AS d "
        "FROM places WHERE name = 'b' LIMIT 1"
    ).collect()[0]["d"]
    assert abs(d - 343_550) < 1500
    inside = eng.sql(
        "SELECT name FROM places "
        "WHERE ST_CONTAINS(ST_GEOMFROMTEXT('POLYGON ((0 0, 10 0, 10 60, 0 60, 0 0))'), "
        "ST_POINT(lon, lat)) ORDER BY name"
    ).collect()
    assert [r["name"] for r in inside] == ["a", "c"]  # b's lon (-0.13) is west of 0
    within = eng.sql(
        "SELECT name FROM places "
        "WHERE ST_WITHIN(ST_POINT(lon, lat), 'POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))') "
        "LIMIT 10"
    ).collect()
    assert [r["name"] for r in within] == ["c"]


def test_sql_st_contains_rejects_column_polygon(spark):
    from apache_pinot_spark.sqlfront import PinotEngine

    eng = PinotEngine(spark)
    with pytest.raises(ValueError, match="WKT string literal"):
        eng.rewrite("SELECT ST_CONTAINS(geom_col, ST_POINT(1, 2)) FROM t")


def test_geo_partitioned_layout_prunes_cells(spark, tmp_path):
    """The geo-index layout: a radius query lists/reads ONLY the
    partition directories of covering cells (checked via inputFiles),
    and returns the same rows as the unpartitioned search."""
    import math as _math

    center_lon, center_lat = 13.4, 52.5
    rows = []
    for i in range(200):  # spread points over ~20 degrees of longitude
        rows.append((i, center_lon - 10 + i * 0.1, center_lat))
    df = spark.createDataFrame(rows, "id long, lon double, lat double")
    path = str(tmp_path / "geo_table")
    G.write_geo_partitioned(df, path, "lon", "lat", cell_deg=1.0)

    radius = 60_000.0  # ~0.9 deg of longitude at 52.5N
    out = G.radius_query_partitioned(
        spark, path, "lon", "lat", center_lon, center_lat, radius, cell_deg=1.0
    )
    want = {
        r["id"]
        for r in G.points_within_radius(
            df, "lon", "lat", center_lon, center_lat, radius
        ).collect()
    }
    assert {r["id"] for r in out.collect()} == want and want
    # pruning: the scan carries the covering-cell IN-list as a PARTITION
    # filter (directory pruning) and the bbox as pushed data filters
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert f"PartitionFilters: [{G.GEO_CELL_COL}" in plan, plan
    assert "GreaterThanOrEqual(lat" in plan  # bbox reached PushedFilters
    assert "distance_m" in out.columns and G.GEO_CELL_COL not in out.columns


def test_st_area_astext_equals(spark):
    """ST_AREA folds WKT-literal polygons to constants (planar default,
    spherical m² with the geography flag, holes subtract, points are
    zero); ST_ASTEXT round-trips point structs; ST_EQUALS is null-safe
    point equality."""
    import math

    import pytest as _pt

    from apache_pinot_spark.sqlfront import PinotEngine

    eng = PinotEngine(spark)
    eng.register("geo1", spark.range(1).selectExpr("CAST(id AS DOUBLE) z"))

    def one(expr):
        return eng.sql(f"SELECT {expr} AS v FROM geo1").collect()[0]["v"]

    # unit square, with a quarter hole
    sq = "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))"
    hole = "POLYGON((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1))"
    assert one(f"ST_AREA('{sq}')") == _pt.approx(16.0)
    assert one(f"ST_AREA('{hole}')") == _pt.approx(16.0 - 4.0)
    assert one(f"ST_AREA(ST_GEOMFROMTEXT('{sq}'))") == _pt.approx(16.0)
    assert one("ST_AREA('POINT(3 4)')") == 0.0
    # spherical: a 1°x1° square at the equator ≈ (111.19 km)² and the
    # constant folds into the PLAN (no per-row work)
    deg = "POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))"
    sph = one(f"ST_AREA('{deg}', 'geography')")
    km = 6_371_008.7714 * math.pi / 180 / 1000  # km per degree
    assert sph / 1e6 == _pt.approx(km * km, rel=0.01)  # within cos(1°) skew
    assert str(one(f"ST_AREA('{sq}')")) in eng.rewrite(
        f"SELECT ST_AREA('{sq}') FROM geo1"
    ).sql
    with _pt.raises(ValueError, match="literal"):
        eng.rewrite("SELECT ST_AREA(z) FROM geo1")
    # astext / equals
    assert one("ST_ASTEXT(ST_POINT(1.5, -2.0))") == "POINT (1.5 -2.0)"
    assert one("ST_EQUALS(ST_POINT(1, 2), ST_POINT(1, 2))") is True
    assert one("ST_EQUALS(ST_POINT(1, 2), ST_POINT(1, 3))") is False
