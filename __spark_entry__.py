"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``   — flagship crawl-shaped extraction pipeline at sf0.001.
- ``queries()``      — operator sweep from SURVEY.md §2 + training-data ops
                       (implementations in geocrawl_spark/queries_core.py and
                       geocrawl_spark/queries_ml.py).
- ``oracle_sql()``   — equivalent DuckDB SQL per query (same aliases).

The crawl engine itself (frontier/politeness/seen/checkpoint — not
SQL-expressible) is exercised by the pyref golden tests in
tests/test_crawl_golden.py per the north_rule.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:  # robust under importlib-from-path loading
    sys.path.insert(0, _REPO)

from geocrawl_spark import queries_core, queries_ml, queries_pipeline, queries_webidx  # noqa: F401,E402 (registration)
from geocrawl_spark.gdalmeta import extract_gdal_metadata
from geocrawl_spark.geometry import polygon_wkt_expr
from geocrawl_spark.parsers import parse_name_expr
from geocrawl_spark.queries_core import ORACLE_SQL, SPARK_QUERIES

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's crawl->extract->parse pipeline (SURVEY.md
    §3.1/§3.3) as ONE Catalyst plan over sf0.001.

    documents -> synthesize geo-asset URLs -> B1 regex gate -> filename
    parse (13 patterns, G1-G3) -> fake-GDAL extraction with subdataset
    explode (A5/O6) -> B3 filter -> footprint polygon (G12) -> per-pattern
    aggregate.
    """
    d = spark.read.parquet(f"{SF0001}/documents.parquet")
    base = F.element_at(
        F.array(
            F.format_string(
                "LC8%03d%03d2015%03dLGN00_B1.TIF",
                F.col("doc_id") % 233, F.col("doc_id") % 248, 1 + F.col("doc_id") % 365,
            ),
            F.format_string(
                "MCD43A4.A2016%03d.h%02dv%02d.005.2016021123456.nc",
                1 + F.col("doc_id") % 365, F.col("doc_id") % 36, F.col("doc_id") % 18,
            ),
            F.format_string("SRTM_DEM_9_-49_2000022111%02d00.nc", F.col("doc_id") % 60),
            F.format_string("random_file_%d.dat", F.col("doc_id")),
        ),
        (F.col("doc_id") % 4 + 1).cast("int"),
    )
    assets = d.select(
        "doc_id",
        F.concat(
            F.lit("http://host"), (F.col("doc_id") % 5).cast("string"),
            F.lit(".example.org/assets/"), base,
        ).alias("asset_url"),
    )
    gated = assets.filter(
        F.regexp_replace("asset_url", r"\?.*$", "").rlike(r"\.(tiff?|shp|kml|kmz|nc|TIFF?)$")
    )
    parsed = gated.withColumn("parse", parse_name_expr(F.col("asset_url")))
    ok = parsed.filter(F.col("parse.pattern").isNotNull())
    ds = extract_gdal_metadata(ok, "asset_url").filter(F.col("proj_wkt") != "")
    ds = ds.withColumn(
        "polygon",
        polygon_wkt_expr(F.col("geotransform"), F.col("x_size"), F.col("y_size")),
    )
    return (
        ds.groupBy(F.col("parse.pattern").alias("pattern"), F.col("file_type"))
        .agg(
            F.count("*").alias("n_datasets"),
            F.countDistinct("asset_url").alias("n_assets"),
            F.avg("x_size").alias("avg_x_size"),
            F.min(F.col("parse.ts")).alias("min_ts"),
            F.countDistinct("polygon").alias("n_polygons"),
        )
        .orderBy("pattern", "file_type")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family (SURVEY.md §2)."""
    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL, aliased identically to the Spark results."""
    return dict(ORACLE_SQL)
