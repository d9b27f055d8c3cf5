"""Footprint polygon from the geotransform — GetPolygonFromGeoTransform
(geolib/geom.go:170-178) as pure column arithmetic.

The corner math is GDALApplyGeoTransform at (0,0) and (xSize,ySize):
    ulX = gt[0];                          ulY = gt[3]
    lrX = gt[0] + xs*gt[1] + ys*gt[2];    lrY = gt[3] + xs*gt[4] + ys*gt[5]
and the ring is UL -> (ulX,lrY) -> LR -> (lrX,ulY) -> UL, rendered with
'%f' (6 decimals), exactly the Sprintf at geom.go:175.

Divergence note (documented per SURVEY.md G13/G14): the reference then
round-trips this WKT through OGR, which reformats numbers; we emit the
pre-OGR '%f' form — numerically identical ring, different text formatting.
The reprojection/dateline-clip code in geom.go is dead in the active
pipeline (calls commented out at geoparse/geoparser.go:186-188) and is
not reimplemented.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_WKT_FMT = "POLYGON ((%f %f,%f %f,%f %f,%f %f,%f %f))"


def polygon_wkt_expr(gt: Column, x_size: Column, y_size: Column) -> Column:
    """WKT footprint from geotransform array + raster size (JVM-side)."""
    xs = x_size.cast("double")
    ys = y_size.cast("double")
    ulx = gt[0]
    uly = gt[3]
    lrx = gt[0] + xs * gt[1] + ys * gt[2]
    lry = gt[3] + xs * gt[4] + ys * gt[5]
    return F.format_string(_WKT_FMT, ulx, uly, ulx, lry, lrx, lry, lrx, uly, ulx, uly)


def polygon_wkt_py(gt: list[float], x_size: int, y_size: int) -> str:
    ulx, uly = gt[0], gt[3]
    lrx = gt[0] + x_size * gt[1] + y_size * gt[2]
    lry = gt[3] + x_size * gt[4] + y_size * gt[5]
    return _WKT_FMT.replace("%f", "%.6f") % (
        ulx, uly, ulx, lry, lrx, lry, lrx, uly, ulx, uly,
    )


def duckdb_polygon_sql(gt: str, xs: str, ys: str) -> str:
    """DuckDB expression for the same WKT (1-based list indexing)."""
    ulx, uly = f"{gt}[1]", f"{gt}[4]"
    lrx = f"({gt}[1] + {xs} * {gt}[2] + {ys} * {gt}[3])"
    lry = f"({gt}[4] + {xs} * {gt}[5] + {ys} * {gt}[6])"
    return (
        f"printf('POLYGON ((%f %f,%f %f,%f %f,%f %f,%f %f))', "
        f"{ulx}, {uly}, {ulx}, {lry}, {lrx}, {lry}, {lrx}, {uly}, {ulx}, {uly})"
    )
