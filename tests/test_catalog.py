"""Mongo-analog metadata queries (ancillary/mongoqueries.txt:1,3,5) as
pure column predicates, checked against a plain-Python reference."""

import datetime as dt

import pyspark.sql.functions as F

from geocrawl_spark.catalog import (
    geo_within_expr,
    point_in_convex_polygon,
    timestamps_in_range_expr,
)

QUAD = [(0.0, 0.0), (50.0, 5.0), (45.0, 40.0), (-5.0, 35.0)]


def _py_in_quad(x, y, ring=QUAD):
    signs = []
    n = len(ring)
    for i in range(n):
        (x1, y1), (x2, y2) = ring[i], ring[(i + 1) % n]
        signs.append((x2 - x1) * (y - y1) - (y2 - y1) * (x - x1))
    return all(s >= 0 for s in signs) or all(s <= 0 for s in signs)


def test_point_in_convex_polygon(spark):
    pts = [(float(x), float(y)) for x in range(-20, 70, 7) for y in range(-20, 60, 7)]
    df = spark.createDataFrame(pts, "x double, y double")
    got = {
        (r["x"], r["y"]): r["w"]
        for r in df.select(
            "x", "y", point_in_convex_polygon(F.col("x"), F.col("y"), QUAD).alias("w")
        ).collect()
    }
    for (x, y), w in got.items():
        assert w == _py_in_quad(x, y), (x, y)
    assert any(got.values()) and not all(got.values())


def test_geo_within_and_timerange(spark):
    # footprints: gt = [ulx, 1, 0, uly, 0, -1], 10x10 -> square ulx..ulx+10
    rows = []
    t = dt.datetime(2015, 6, 1)
    for i, (ulx, uly) in enumerate([(10.0, 30.0), (200.0, 30.0), (-100.0, 80.0)]):
        rows.append(
            (i, [ulx, 1.0, 0.0, uly, 0.0, -1.0], 10, 10,
             [t + dt.timedelta(days=30 * i)])
        )
    df = spark.createDataFrame(
        rows,
        "id long, geotransform array<double>, x_size int, y_size int, "
        "timestamps array<timestamp>",
    )
    within = df.filter(
        geo_within_expr(F.col("geotransform"), F.col("x_size"), F.col("y_size"), QUAD)
    )
    assert [r["id"] for r in within.collect()] == [0]  # only the 10..20 square

    tr = df.filter(
        timestamps_in_range_expr(F.col("timestamps"), "2015-06-15 00:00:00", "2015-08-15 00:00:00")
    )
    assert sorted(r["id"] for r in tr.collect()) == [1, 2]

    both = df.filter(
        geo_within_expr(F.col("geotransform"), F.col("x_size"), F.col("y_size"), QUAD)
        & timestamps_in_range_expr(F.col("timestamps"), "2015-05-15 00:00:00", "2015-06-15 00:00:00")
    )
    assert [r["id"] for r in both.collect()] == [0]
