"""Queryability layer — the graft's replacement for the reference's
MongoDB stage (ancillary/HOWTO.txt:1, ancillary/mongoqueries.txt:1-5).

The reference ships its parse output to Mongo and queries it with
$geoWithin / timestamp-range / $and predicates.  Here the crawl output
IS a queryable table (Spark SQL over the checkpoint), and the three
reference queries are provided as composable Column predicates:

- spatial containment ($geoWithin analog) as PURE column arithmetic:
  the footprint corners come straight from the geotransform (no WKT
  parsing, no UDF), and point-in-convex-polygon is a conjunction of
  half-plane (cross-product sign) tests — Catalyst-optimizable and
  partition-prunable;
- timestamp-range over the timestamps array via exists();
- their conjunction (mongoqueries.txt:5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .checkpoint import TableIO
from .frontier import read_all_rounds

# the query quad from ancillary/mongoqueries.txt:1 (WGS84 lon/lat ring,
# counter-clockwise, first point repeated)
REFERENCE_QUERY_POLYGON = [
    (123.234617793988, -8.29622877428502),
    (123.174158904668, -9.22904371925462),
    (124.054343056224, -9.29023134099142),
    (124.108805026986, -8.35726649955468),
]


def footprint_corners(gt: Column, x_size: Column, y_size: Column):
    """The 4 footprint corners from the geotransform (geom.go:170-178)."""
    xs = x_size.cast("double")
    ys = y_size.cast("double")
    ul = (gt[0], gt[3])
    ur = (gt[0] + xs * gt[1], gt[3] + xs * gt[4])
    lr = (gt[0] + xs * gt[1] + ys * gt[2], gt[3] + xs * gt[4] + ys * gt[5])
    ll = (gt[0] + ys * gt[2], gt[3] + ys * gt[5])
    return [ul, ur, lr, ll]


def point_in_convex_polygon(
    x: Column, y: Column, ring: list[tuple[float, float]]
) -> Column:
    """Half-plane test: point is inside a convex CCW ring iff every edge
    cross product has the same (non-negative) sign.  Handles CW rings by
    accepting the all-non-positive case too."""
    crosses = []
    n = len(ring)
    for i in range(n):
        (x1, y1), (x2, y2) = ring[i], ring[(i + 1) % n]
        crosses.append((F.lit(x2 - x1)) * (y - F.lit(y1)) - (F.lit(y2 - y1)) * (x - F.lit(x1)))
    all_pos = crosses[0] >= 0
    all_neg = crosses[0] <= 0
    for c in crosses[1:]:
        all_pos = all_pos & (c >= 0)
        all_neg = all_neg & (c <= 0)
    return all_pos | all_neg


def geo_within_expr(
    gt: Column, x_size: Column, y_size: Column, ring: list[tuple[float, float]]
) -> Column:
    """$geoWithin analog: the whole footprint (a convex quad) lies within
    the convex query ring iff all 4 corners do."""
    cond = F.lit(True)
    for cx, cy in footprint_corners(gt, x_size, y_size):
        cond = cond & point_in_convex_polygon(cx, cy, ring)
    return cond


def timestamps_in_range_expr(timestamps: Column, t0: str, t1: str) -> Column:
    """mongoqueries.txt:3 — any timestamp in [t0, t1)."""
    lo = F.lit(t0).cast("timestamp")
    hi = F.lit(t1).cast("timestamp")
    return F.exists(timestamps, lambda t: (t >= lo) & (t < hi))


class MetadataCatalog:
    """SQL-queryable view over a crawl's accumulated output tables."""

    def __init__(self, spark: SparkSession, io: TableIO):
        self.spark = spark
        self.io = io

    def metadata(self) -> DataFrame:
        return read_all_rounds(self.spark, self.io, "metadata")

    def register_views(self) -> None:
        for name in ("metadata", "extracted", "dead_letters", "crawl_log", "admitted"):
            df = read_all_rounds(self.spark, self.io, name)
            if df is not None:
                df.createOrReplaceTempView(name)
        self.io.read_table(self.spark, "frontier").createOrReplaceTempView("frontier")

    # the three reference queries (mongoqueries.txt:1,3,5) ----------------
    def find_within(self, ring=None) -> DataFrame:
        ring = ring or REFERENCE_QUERY_POLYGON
        m = self.metadata()
        return m.filter(
            geo_within_expr(F.col("geotransform"), F.col("x_size"), F.col("y_size"), ring)
        )

    def find_in_timerange(self, t0: str, t1: str) -> DataFrame:
        m = self.metadata()
        return m.filter(timestamps_in_range_expr(F.col("timestamps"), t0, t1))

    def find_within_and_timerange(self, t0: str, t1: str, ring=None) -> DataFrame:
        ring = ring or REFERENCE_QUERY_POLYGON
        m = self.metadata()
        return m.filter(
            geo_within_expr(F.col("geotransform"), F.col("x_size"), F.col("y_size"), ring)
            & timestamps_in_range_expr(F.col("timestamps"), t0, t1)
        )
