"""Extraction-stage parity: Spark column-math fake-GDAL vs pure-Python twin,
plus the real GetNCTime2 logic (geolib/gdal.go:100-125) in both dialects."""

import pyspark.sql.functions as F

from geocrawl_spark.gdalmeta import (
    extract_gdal_metadata,
    fake_gdal_file_py,
    nc_times_expr,
    nc_times_py,
)
from geocrawl_spark.geometry import polygon_wkt_expr, polygon_wkt_py

ASSETS = [
    "http://host00.example.org/assets/LC80640052015252LGN00_B1.TIF",
    "http://host00.example.org/assets/MCD43A4.A2016009.h12v10.005.2016021123456.nc",
    "http://host01.example.org/assets/chirps-v2.0.2015.dekads.nc",
    "http://host02.example.org/assets/SRTM_DEM_9_-49_20000221115400.nc",
    "http://host03.example.org/assets/LS8_OLITIRS_NBAR_3577_-10_-28_2015.tif",
    "http://host04.example.org/assets/FC.v302.MCD43A4.h12v10.2016.005.nc",
] + [f"http://host05.example.org/assets/file{i}.nc" for i in range(30)]

COVERAGE_ASSETS = ASSETS + [
    f"http://host{h:02d}.example.org/assets/data{i}.{ext}"
    for h in range(3)
    for i in range(20)
    for ext in ("nc", "tif")
]


def test_nc_time_parse_both_dialects(spark):
    cases = [
        ("seconds since 2000-01-01 00:00:00.0", "{12345.5,99.9}"),
        ("hours since 1900-1-1 0:0:0", "{100.5}"),
        ("days since 1970-01-01 00:00:00.0", "{365.0,366.25,1000.75}"),
    ]
    df = spark.createDataFrame(cases, "units string, vals string")
    rows = df.select(
        "units", "vals", nc_times_expr(F.col("units"), F.col("vals")).alias("t")
    ).collect()
    for r in rows:
        assert list(r["t"]) == nc_times_py(r["units"], r["vals"]), r["units"]
    # spot check against hand-derived values (Modf truncation: 12345.5->12345)
    assert nc_times_py(*cases[0])[0] == "2000-01-01T03:25:45Z"
    assert nc_times_py(*cases[1])[0] == "1900-01-05T04:00:00Z"
    assert nc_times_py(*cases[2])[0] == "1971-01-01T00:00:00Z"


def test_extraction_parity(spark):
    df = spark.createDataFrame([(u,) for u in ASSETS], "asset_url string")
    got = extract_gdal_metadata(df, "asset_url")
    got = got.withColumn(
        "polygon",
        F.when(
            F.col("proj_wkt") != "",
            polygon_wkt_expr(F.col("geotransform"), F.col("x_size"), F.col("y_size")),
        ),
    )
    rows = got.orderBy("asset_url", "ds_name").collect()

    expected = []
    for u in sorted(ASSETS):
        g = fake_gdal_file_py(u)
        for ds in sorted(g["datasets"], key=lambda d: d["ds_name"]):
            expected.append((u, g["file_type"], ds))
    assert len(rows) == len(expected)
    for r, (u, driver, ds) in zip(rows, expected):
        assert r["asset_url"] == u
        assert r["file_type"] == driver
        assert r["ds_name"] == ds["ds_name"]
        assert r["raster_count"] == ds["raster_count"]
        assert r["array_type"] == ds["array_type"]
        assert r["x_size"] == ds["x_size"]
        assert r["y_size"] == ds["y_size"]
        assert r["proj_wkt"] == ds["proj_wkt"]
        if ds["geotransform"] is None:
            assert r["geotransform"] is None
        else:
            assert list(r["geotransform"]) == ds["geotransform"]
            assert r["polygon"] == polygon_wkt_py(
                ds["geotransform"], ds["x_size"], ds["y_size"]
            )
        nc = ds["extra_metadata"].get("nc_times")
        got_nc = r["extra_metadata"].get("nc_times") if r["extra_metadata"] else None
        assert (list(got_nc) if got_nc else None) == nc


def test_failed_open_and_b6_coverage():
    """The deterministic fake must cover: failed opens (B3 path), empty raw
    projection coalesced to WGS84 (B6), netCDF subdataset fan-out, and
    every CRS of the proj4 rule table (incl. the non-32633 UTM variant and
    the GDA94/NAD83/Albers codes added in r3)."""
    from geocrawl_spark.gdalmeta import _PROJ_CHOICES, WGS84WKT

    by_wkt = {w: 0 for w in _PROJ_CHOICES if w}
    n_failed = n_wgs = n_multi = 0
    for u in COVERAGE_ASSETS:
        g = fake_gdal_file_py(u)
        if len(g["datasets"]) > 1:
            n_multi += 1
        for ds in g["datasets"]:
            if ds["proj_wkt"] == "":
                n_failed += 1
            elif ds["proj_wkt"] == WGS84WKT:
                n_wgs += 1
            elif ds["proj_wkt"] in by_wkt:
                by_wkt[ds["proj_wkt"]] += 1
    assert n_failed > 0 and n_wgs > 0 and n_multi > 0
    assert all(n > 0 for n in by_wkt.values()), by_wkt


def test_polygon_corner_math():
    # hand-computed: gt=(10, 0.5, 0, 60, 0, -0.25), 100x200
    # lrX = 10 + 100*0.5 = 60 ; lrY = 60 + 200*-0.25 = 10
    wkt = polygon_wkt_py([10.0, 0.5, 0.0, 60.0, 0.0, -0.25], 100, 200)
    assert wkt == (
        "POLYGON ((10.000000 60.000000,10.000000 10.000000,"
        "60.000000 10.000000,60.000000 60.000000,10.000000 60.000000))"
    )


def test_proj4_derived_from_wkt_epsg(spark):
    """proj4 export is DERIVED (EPSG regex + zone arithmetic), not a
    whole-string lookup: WKTs absent from any literal table still export
    (reference active path: geoparse/geoparser.go:203 poly.Proj4())."""
    from geocrawl_spark.gdalmeta import (
        ALBERSWKT,
        GDA94WKT,
        NAD83WKT,
        UTM55SWKT,
        UTMWKT,
        WGS84WKT,
        proj4_of_wkt_expr,
        proj4_of_wkt_py,
    )

    utm17s = UTMWKT.replace('"32633"', '"32717"').replace("zone 33N", "zone 17S")
    webmerc = UTMWKT.replace('"32633"', '"3857"')
    no_authority = 'GEOGCS["WGS 84",DATUM["WGS_1984"]]'
    cases = [
        WGS84WKT, UTMWKT, utm17s, UTM55SWKT, GDA94WKT, NAD83WKT, ALBERSWKT,
        webmerc, no_authority, "",
    ]
    want = [
        "+proj=longlat +datum=WGS84 +no_defs ",
        "+proj=utm +zone=33 +datum=WGS84 +units=m +no_defs ",
        "+proj=utm +zone=17 +south +datum=WGS84 +units=m +no_defs ",
        "+proj=utm +zone=55 +south +datum=WGS84 +units=m +no_defs ",
        "+proj=longlat +ellps=GRS80 +towgs84=0,0,0,0,0,0,0 +no_defs ",
        "+proj=longlat +datum=NAD83 +no_defs ",
        "+proj=aea +lat_1=-18 +lat_2=-36 +lat_0=0 +lon_0=132 +x_0=0 +y_0=0 "
        "+ellps=GRS80 +towgs84=0,0,0,0,0,0,0 +units=m +no_defs ",
        "+proj=merc +a=6378137 +b=6378137 +lat_ts=0 +lon_0=0 +x_0=0 "
        "+y_0=0 +k=1 +units=m +nadgrids=@null +wgs84=0,0,0,0,0,0,0 "
        "+no_defs ",
        "",
        "",
    ]
    assert [proj4_of_wkt_py(w) for w in cases] == want
    df = spark.createDataFrame([(w,) for w in cases], "wkt string")
    got = [
        r["p"] for r in df.select(proj4_of_wkt_expr(F.col("wkt")).alias("p")).collect()
    ]
    assert got == want
