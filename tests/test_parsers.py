"""13-pattern filename parse + parseTime parity: Python vs Spark vs
hand-derived expectations (geoparse/geoparser.go:40-115)."""

import datetime as dt

import pyspark.sql.functions as F
import pytest

from geocrawl_spark.parsers import (
    ZERO_TIME,
    parse_name_expr,
    parse_name_py,
    parse_time_py,
)

UTC = dt.timezone.utc

# (filename, expected pattern, spot fields, expected timestamp)
CASES = [
    (
        "LC80640052015252LGN00_B1.TIF",
        "landsat",
        {"mission": "8", "path": "064", "row": "005", "year": "2015",
         "julian_day": "252", "processing_level": "LGN00", "band": "B1"},
        dt.datetime(2015, 1, 1, tzinfo=UTC) + dt.timedelta(days=251),
    ),
    (
        "MCD43A4.A2016009.h12v10.005.2016021123456.nc",
        "modis43A4",
        {"year": "2016", "julian_day": "009", "horizontal": "h12",
         "vertical": "v10", "resolution": "005"},
        dt.datetime(2016, 1, 9, tzinfo=UTC),
    ),
    (
        "MCD15A2.A2016009.h12v10.006.2016021123456.nc",
        "modis1",
        {"product": "MCD15A2"},
        dt.datetime(2016, 1, 9, tzinfo=UTC),
    ),
    # NOTE: the reference's [OD|YD] is a single-char class {O,D,|,Y} (a Go
    # pattern bug we reproduce): 'MOD09_GA...' can never match because the
    # satellite eats one char and product needs digits; 'MY09_GA...' does.
    (
        "MY09_GA.A2016009.1200.005.2016009121130.tif",
        "modis2",
        {"satellite": "Y", "product": "09_GA", "collection_version": "005",
         "year": "2016", "julian_day": "009", "hour": "12", "minute": "11",
         "second": "30"},
        dt.datetime(2016, 1, 9, 12, 11, 30, tzinfo=UTC),
    ),
    ("MOD09_GA.A2016009.1200.005.2016009121130.tif", None, None, None),
    (
        "FC.v302.MCD43A4.h12v10.2016.005.nc",
        "modisJP",
        {"product": "FC", "root_product": "MCD43A4", "year": "2016"},
        dt.datetime(2016, 1, 1, tzinfo=UTC),
    ),
    (
        "FC_LR.v302.MCD43A4.h12v10.2016.005.nc",
        "modisJP_LR",
        {"product": "FC_LR"},
        dt.datetime(2016, 1, 1, tzinfo=UTC),
    ),
    (
        "20160103032000-P1S-ABOM_BRF_B03-PRJ_GEOS141_1000-HIMAWARI8-AHI.nc",
        "himawari8",
        {"year": "2016", "month": "01", "day": "03", "hour": "03",
         "minute": "20", "second": "00", "resolution": "1000"},
        dt.datetime(2016, 1, 3, 3, 20, 0, tzinfo=UTC),
    ),
    (
        "LS8_OLITIRS_NBAR_3577_-10_-28_2015.tif",
        "agdc_landsat1",
        {"sensor": "OLITIRS", "correction": "NBAR", "epsg": "3577",
         "x_coord": "-10", "y_coord": "-28", "year": "2015"},
        dt.datetime(2015, 1, 1, tzinfo=UTC),
    ),
    (
        "Elevation_1secSRTM_DEMs_v1.0_DEM-S_Tiles_e141s32dems.nc",
        "elevation_ga",
        {"longitude": "141", "latitude": "32"},
        ZERO_TIME,  # no 'year' group -> Go zero time
    ),
    (
        "chirps-v2.0.2015.dekads.nc",
        "chirps2.0",
        {"year": "2015"},
        dt.datetime(2015, 1, 1, tzinfo=UTC),
    ),
    (
        "tp_3hrs_ERAI_historical_fc-sfc_20150101_20150131.nc",
        "era-interim",
        {"product": "tp", "start_year": "2015", "end_day": "31"},
        ZERO_TIME,  # only start_/end_ fields, no 'year'
    ),
    (
        "LS8_OLI_TIRS_NBART_3577_-10_-28_2015.tif",
        "agdc_landsat2",
        {"sensor": "TIRS", "product": "NBART", "epsg": "3577"},
        dt.datetime(2015, 1, 1, tzinfo=UTC),
    ),
    (
        "SRTM_DEM_9_-49_20000221115400.nc",
        "agdc_dem",
        {"product": "DEM", "x_coord": "9", "y_coord": "-49", "year": "2000",
         "month": "02", "day": "21", "hour": "11", "minute": "54",
         "second": "00"},
        dt.datetime(2000, 2, 21, 11, 54, 0, tzinfo=UTC),
    ),
    ("random_data_file_17.tif", None, None, None),
    ("style.css", None, None, None),
]


@pytest.mark.parametrize("name,pattern,fields,ts", CASES)
def test_python_dialect(name, pattern, fields, ts):
    got_pattern, got_fields, got_ts = parse_name_py("http://h/assets/" + name)
    assert got_pattern == pattern
    if pattern is None:
        return
    for k, v in fields.items():
        assert got_fields[k] == v, (name, k)
    assert got_ts == ts


def test_spark_dialect_matches_python(spark):
    urls = ["http://h/assets/" + n for n, *_ in CASES]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    # ts compared as a formatted string: the Go zero time (year 1) is not
    # representable through PySpark's collect() row converter
    p = parse_name_expr(F.col("url"))
    rows = df.select(
        "url",
        p["pattern"].alias("pattern"),
        p["fields"].alias("fields"),
        F.date_format(p["ts"], "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("ts_str"),
    ).collect()
    for r in rows:
        pat, fields, ts = parse_name_py(r["url"])
        assert r["pattern"] == pat, r["url"]
        if pat is None:
            assert r["fields"] is None
            continue
        assert dict(r["fields"]) == fields, r["url"]
        assert r["ts_str"] == ts.replace(tzinfo=None).isoformat() + "Z", r["url"]


def test_julian_override_precedence():
    """month+day REPLACE the julian-derived date (geoparser.go:92-98)."""
    fields = {"year": "2016", "julian_day": "200", "month": "02", "day": "03",
              "hour": "05"}
    assert parse_time_py(fields) == dt.datetime(2016, 2, 3, 5, 0, 0, tzinfo=UTC)


def test_declaration_order_overlap():
    """MCD43A4 files match both modis43A4 and modis1; declaration order
    must pick modis43A4 (SURVEY.md G1 divergence note)."""
    pat, _, _ = parse_name_py("MCD43A4.A2016009.h12v10.005.2016021123456.nc")
    assert pat == "modis43A4"
