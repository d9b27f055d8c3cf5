"""Geo-asset metadata extraction — the graft analog of GetGDALMetadata
(geolib/gdal.go:155-190) and GetDataSetInfo (geolib/gdal.go:48-78).

The container has no GDAL C library and no real raster bytes, so the
*decode* step ("what GDAL returned for this asset") is a clearly-marked
DETERMINISTIC FAKE: every metadata field is a pure function of
xxhash64(asset_url + '#' + tag), computed identically in the Spark dialect
(pure JVM column expressions — zero Python) and the pure-Python dialect
(pyref oracle).  Everything *around* the fake is real Spark logic:

- subdataset expansion (1 file -> N datasets, gdal.go:181-186) is a real
  ``explode`` over a generated dataset-name array;
- the empty-projection default (gdal.go:66-68)  -> ``coalesce(nullif(...))``;
- netCDF time derivation GetNCTime2 (gdal.go:100-125) — "<unit> since
  <date>" parsing, the two getDate formats (gdal.go:20,91-98), '{...}'
  value-list split, float truncation via Modf, interval arithmetic and
  RFC3339-Z formatting — is implemented as REAL column logic over the fake
  raw metadata strings, and mirrored in Python for the oracle.
"""

from __future__ import annotations

import datetime as dt
import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import xxh64_signed

# exact strings from geolib/gdal.go:43-46 (typos preserved for parity)
GDAL_TYPES = [
    "Unkown", "Byte", "Uint16", "Int16", "UInt32", "Int32", "Float32",
    "Float64", "CInt16", "CInt32", "CFloat32", "CFloat64", "TypeCount",
]

# geolib/gdal.go:23 (WGS84 default used when projection is empty)
WGS84WKT = (
    'GEOGCS["WGS 84",DATUM["WGS_1984",SPHEROID["WGS 84",6378137,'
    '298.257223563,AUTHORITY["EPSG","7030"]],TOWGS84[0,0,0,0,0,0,0],'
    'AUTHORITY["EPSG","6326"]],PRIMEM["Greenwich",0,AUTHORITY["EPSG",'
    '"8901"]],UNIT["degree",0.0174532925199433,AUTHORITY["EPSG","9108"]],'
    'AUTHORITY["EPSG","4326"]]'
)
UTMWKT = (
    'PROJCS["WGS 84 / UTM zone 33N",GEOGCS["WGS 84",DATUM["WGS_1984",'
    'SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],'
    'UNIT["degree",0.0174532925199433]],PROJECTION["Transverse_Mercator"],'
    'UNIT["metre",1],AUTHORITY["EPSG","32633"]]'
)
# additional CRSs plausible for the 13 filename products (Landsat/MODIS
# Australia tiles -> GDA94 + Australian Albers 3577; CONUS products ->
# NAD83; southern-hemisphere UTM) — exercised by the fake-GDAL proj
# selector so proj4 export covers more than one authority code
UTM55SWKT = (
    'PROJCS["WGS 84 / UTM zone 55S",GEOGCS["WGS 84",DATUM["WGS_1984",'
    'SPHEROID["WGS 84",6378137,298.257223563]],PRIMEM["Greenwich",0],'
    'UNIT["degree",0.0174532925199433]],PROJECTION["Transverse_Mercator"],'
    'UNIT["metre",1],AUTHORITY["EPSG","32755"]]'
)
GDA94WKT = (
    'GEOGCS["GDA94",DATUM["Geocentric_Datum_of_Australia_1994",'
    'SPHEROID["GRS 1980",6378137,298.257222101]],PRIMEM["Greenwich",0],'
    'UNIT["degree",0.0174532925199433],AUTHORITY["EPSG","4283"]]'
)
NAD83WKT = (
    'GEOGCS["NAD83",DATUM["North_American_Datum_1983",'
    'SPHEROID["GRS 1980",6378137,298.257222101]],PRIMEM["Greenwich",0],'
    'UNIT["degree",0.0174532925199433],AUTHORITY["EPSG","4269"]]'
)
ALBERSWKT = (
    'PROJCS["GDA94 / Australian Albers",GEOGCS["GDA94",'
    'DATUM["Geocentric_Datum_of_Australia_1994",SPHEROID["GRS 1980",'
    '6378137,298.257222101]],PRIMEM["Greenwich",0],'
    'UNIT["degree",0.0174532925199433]],'
    'PROJECTION["Albers_Conic_Equal_Area"],UNIT["metre",1],'
    'AUTHORITY["EPSG","3577"]]'
)

# proj4 export (reference active path: poly.Proj4() per dataset,
# geoparse/geoparser.go:203 -> OSRExportToProj4, geolib/geom.go:79-85).
# No GDAL/pyproj in this container, so the export is DERIVED from the WKT:
# extract the CRS's own EPSG authority code (the trailing
# AUTHORITY["EPSG","<code>"]] token) with a regex — pure column logic —
# then map code -> proj4 by rule: 4326 longlat, 326xx/327xx UTM north/south
# (zone arithmetic), 3857 web mercator.  Unknown/absent codes yield "",
# matching OSRExportToProj4's failure mode (err -> empty string).
_EPSG_TAIL_RE = r'AUTHORITY\["EPSG","(\d+)"\]\]$'


def epsg_of_wkt_expr(wkt: Column) -> Column:
    """EPSG code of the WKT's root CRS (0 when absent)."""
    code = F.regexp_extract(wkt, _EPSG_TAIL_RE, 1)
    return F.when(code == "", F.lit(0)).otherwise(code.cast("int"))


def proj4_of_epsg_expr(code: Column) -> Column:
    utm_n = code - F.lit(32600)
    utm_s = code - F.lit(32700)
    return (
        F.when(code == 4326, F.lit("+proj=longlat +datum=WGS84 +no_defs "))
        .when(
            (code >= 32601) & (code <= 32660),
            F.format_string(
                "+proj=utm +zone=%d +datum=WGS84 +units=m +no_defs ", utm_n
            ),
        )
        .when(
            (code >= 32701) & (code <= 32760),
            F.format_string(
                "+proj=utm +zone=%d +south +datum=WGS84 +units=m +no_defs ", utm_s
            ),
        )
        .when(
            code == 3857,
            F.lit(
                "+proj=merc +a=6378137 +b=6378137 +lat_ts=0 +lon_0=0 +x_0=0 "
                "+y_0=0 +k=1 +units=m +nadgrids=@null +wgs84=0,0,0,0,0,0,0 "
                "+no_defs "
            ),
        )
        .when(code == 4283, F.lit(_PROJ4_4283))
        .when(code == 4269, F.lit(_PROJ4_4269))
        .when(code == 3577, F.lit(_PROJ4_3577))
        .otherwise(F.lit(""))
    )


# geographic / equal-area codes beyond the WGS84 family (same rule-table
# approach; the container has no pyproj/GDAL so these strings ARE the
# contract, mirrored exactly by the Python twin and the pyref oracle)
_PROJ4_4283 = "+proj=longlat +ellps=GRS80 +towgs84=0,0,0,0,0,0,0 +no_defs "
_PROJ4_4269 = "+proj=longlat +datum=NAD83 +no_defs "
_PROJ4_3577 = (
    "+proj=aea +lat_1=-18 +lat_2=-36 +lat_0=0 +lon_0=132 +x_0=0 +y_0=0 "
    "+ellps=GRS80 +towgs84=0,0,0,0,0,0,0 +units=m +no_defs "
)


def proj4_of_wkt_expr(wkt: Column) -> Column:
    return proj4_of_epsg_expr(epsg_of_wkt_expr(wkt))


def epsg_of_wkt_py(wkt: str) -> int:
    m = re.search(_EPSG_TAIL_RE, wkt)
    return int(m.group(1)) if m else 0


def proj4_of_wkt_py(wkt: str) -> str:
    code = epsg_of_wkt_py(wkt)
    if code == 4326:
        return "+proj=longlat +datum=WGS84 +no_defs "
    if 32601 <= code <= 32660:
        return f"+proj=utm +zone={code - 32600} +datum=WGS84 +units=m +no_defs "
    if 32701 <= code <= 32760:
        return (
            f"+proj=utm +zone={code - 32700} +south +datum=WGS84 +units=m +no_defs "
        )
    if code == 3857:
        return (
            "+proj=merc +a=6378137 +b=6378137 +lat_ts=0 +lon_0=0 +x_0=0 "
            "+y_0=0 +k=1 +units=m +nadgrids=@null +wgs84=0,0,0,0,0,0,0 "
            "+no_defs "
        )
    if code == 4283:
        return _PROJ4_4283
    if code == 4269:
        return _PROJ4_4269
    if code == 3577:
        return _PROJ4_3577
    return ""

EXT_DRIVER = {
    "tif": "GTiff", "tiff": "GTiff", "nc": "netCDF",
    "kml": "KML", "kmz": "LIBKML", "shp": "ESRI Shapefile",
}

# raw time#units variants (exercise all three duration units and both
# getDate formats, geolib/gdal.go:20-21)
NC_UNITS = [
    "seconds since 2000-01-01 00:00:00.0",
    "hours since 1900-1-1 0:0:0",
    "days since 1970-01-01 00:00:00.0",
]
_UNIT_SECONDS = {"seconds": 1, "hours": 3600, "days": 86400}
# Java/Go format pairs for the two getDate formats (gdal.go:20)
_SPARK_DATE_FMTS = ["yyyy-MM-dd HH:mm:ss.S", "yyyy-M-d H:m:s"]
_PY_DATE_FMTS = ["%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S"]


# ---------------------------------------------------------------------------
# deterministic fake "GDAL" field derivations (shared spec)
# ---------------------------------------------------------------------------

def _fh_expr(s: Column, tag: str) -> Column:
    return F.xxhash64(F.concat(s, F.lit("#" + tag)))


def _fh_py(s: str, tag: str) -> int:
    return xxh64_signed((s + "#" + tag).encode("utf-8"))


def ext_of_expr(url: Column) -> Column:
    path = F.regexp_replace(url, r"\?.*$", "")
    return F.lower(F.regexp_extract(path, r"\.([A-Za-z]+)$", 1))


def ext_of_py(url: str) -> str:
    path = re.sub(r"\?.*$", "", url)
    m = re.search(r"\.([A-Za-z]+)$", path)
    return m.group(1).lower() if m else ""


def driver_expr(url: Column) -> Column:
    m = F.create_map(*[F.lit(x) for kv in EXT_DRIVER.items() for x in kv])
    return F.coalesce(m[ext_of_expr(url)], F.lit("Unknown"))


def _dataset_names_expr(url: Column) -> Column:
    """netCDF assets expand to 0..2 subdatasets (gdal.go:172-186)."""
    nsub = F.pmod(_fh_expr(url, "nsub"), F.lit(3))
    is_nc = ext_of_expr(url) == "nc"
    sub_names = F.transform(
        F.sequence(F.lit(1), nsub),
        lambda i: F.format_string('NETCDF:"%s":var%d', url, i),
    )
    return F.when(is_nc & (nsub > 0), sub_names).otherwise(F.array(url))


def _dataset_names_py(url: str) -> list[str]:
    nsub = _fh_py(url, "nsub") % 3
    if ext_of_py(url) == "nc" and nsub > 0:
        return ['NETCDF:"%s":var%d' % (url, i) for i in range(1, nsub + 1)]
    return [url]


# --- per-dataset raw fields (pure function of the attempted ds name) -------
#
# "open failed" (deterministic ~1/7 of datasets) mirrors GDALOpenEx
# returning nil (gdal.go:51-53): the reference appends an all-zero
# GDALDataSet{} — empty ds_name, zeros, empty proj — which the parse
# stage's B3 filter (geoparser.go:184) later drops.

def _open_failed_expr(ds: Column) -> Column:
    return F.pmod(_fh_expr(ds, "pw"), F.lit(7)) == 0


#: fake-GDAL raw-projection selector domain: index -> WKT ("" = the B6
#: empty-projection path; indices >= len fall through to WGS84).  The
#: non-WGS84 entries exercise every proj4 rule family (UTM N, UTM S,
#: GDA94, NAD83, Australian Albers).
_PROJ_CHOICES = [UTMWKT, "", GDA94WKT, NAD83WKT, ALBERSWKT, UTM55SWKT]
_PROJ_SEL_MOD = 9  # 6 named choices + 3 residues of WGS84


def _raw_fields_expr(ds: Column) -> dict[str, Column]:
    proj_sel = F.pmod(_fh_expr(ds, "pw2"), F.lit(_PROJ_SEL_MOD))
    ulx = (F.pmod(_fh_expr(ds, "gx"), F.lit(1400)) - 700).cast("double") * 0.25
    uly = (90 - F.pmod(_fh_expr(ds, "gy"), F.lit(700)).cast("double") * 0.25)
    rot = F.when(F.pmod(_fh_expr(ds, "gr"), F.lit(5)) == 0, F.lit(0.01)).otherwise(F.lit(0.0))
    return {
        "raster_count": (F.pmod(_fh_expr(ds, "rc"), F.lit(4)) + 1).cast("int"),
        "array_type": F.element_at(
            F.array(*[F.lit(t) for t in GDAL_TYPES[1:12]]),
            (F.pmod(_fh_expr(ds, "at"), F.lit(11)) + 1).cast("int"),
        ),
        "x_size": ((F.pmod(_fh_expr(ds, "xs"), F.lit(8)) + 1) * 240).cast("int"),
        "y_size": ((F.pmod(_fh_expr(ds, "ys"), F.lit(8)) + 1) * 180).cast("int"),
        # raw projection as "GDAL" reports it: one of _PROJ_CHOICES
        # (index 1 = empty -> the B6 default-substitution path), else WGS84
        "proj_wkt_raw": F.coalesce(
            *[
                F.when(proj_sel == i, F.lit(w))
                for i, w in enumerate(_PROJ_CHOICES)
            ],
            F.lit(WGS84WKT),
        ),
        "geotransform": F.array(ulx, F.lit(0.25), rot, uly, rot, F.lit(-0.25)),
    }


def _raw_fields_py(ds: str) -> dict:
    proj_sel = _fh_py(ds, "pw2") % _PROJ_SEL_MOD
    ulx = (_fh_py(ds, "gx") % 1400 - 700) * 0.25
    uly = 90 - (_fh_py(ds, "gy") % 700) * 0.25
    rot = 0.01 if _fh_py(ds, "gr") % 5 == 0 else 0.0
    return {
        "raster_count": _fh_py(ds, "rc") % 4 + 1,
        "array_type": GDAL_TYPES[1:12][_fh_py(ds, "at") % 11],
        "x_size": (_fh_py(ds, "xs") % 8 + 1) * 240,
        "y_size": (_fh_py(ds, "ys") % 8 + 1) * 180,
        "proj_wkt_raw": (
            _PROJ_CHOICES[proj_sel] if proj_sel < len(_PROJ_CHOICES) else WGS84WKT
        ),
        "geotransform": [ulx, 0.25, rot, uly, rot, -0.25],
    }


# --- raw netCDF time metadata (what "GDAL" reports) -------------------------

def _nc_raw_expr(ds: Column, is_nc: Column) -> tuple[Column, Column]:
    has_time = is_nc & (F.pmod(_fh_expr(ds, "nt"), F.lit(3)) != 0)
    units = F.element_at(
        F.array(*[F.lit(u) for u in NC_UNITS]),
        (F.pmod(_fh_expr(ds, "nu"), F.lit(3)) + 1).cast("int"),
    )
    nvals = F.pmod(_fh_expr(ds, "nv"), F.lit(4)) + 1
    vals = F.transform(
        F.sequence(F.lit(0), nvals - 1),
        lambda i: F.format_string(
            "%d.5", F.pmod(_fh_expr(F.concat(ds, i.cast("string")), "v"), F.lit(100000))
        ),
    )
    values_str = F.concat(F.lit("{"), F.array_join(vals, ","), F.lit("}"))
    return (
        F.when(has_time, units).otherwise(F.lit(None)),
        F.when(has_time, values_str).otherwise(F.lit(None)),
    )


def _nc_raw_py(ds: str, is_nc: bool) -> tuple[str | None, str | None]:
    if not (is_nc and _fh_py(ds, "nt") % 3 != 0):
        return None, None
    units = NC_UNITS[_fh_py(ds, "nu") % 3]
    nvals = _fh_py(ds, "nv") % 4 + 1
    vals = ["%d.5" % (_fh_py(ds + str(i), "v") % 100000) for i in range(nvals)]
    return units, "{" + ",".join(vals) + "}"


# ---------------------------------------------------------------------------
# REAL logic: GetNCTime2 (geolib/gdal.go:100-125) in both dialects
# ---------------------------------------------------------------------------

def nc_times_expr(units: Column, values: Column) -> Column:
    """'<unit> since <date>' + '{v1,v2,...}' -> array of RFC3339-Z strings.

    Mirrors GetNCTime2 exactly: split on 'since' (gdal.go:105), trim,
    unit -> step seconds (gdal.go:21), date via two formats (gdal.go:20,
    91-98), strip '{}' + split ',' (gdal.go:113), Modf truncation
    (gdal.go:118), start + n*step (gdal.go:119), format
    '2006-01-02T15:04:05Z' (gdal.go:120).
    """
    unit_name = F.trim(F.element_at(F.split(units, "since"), 1))
    step = F.element_at(
        F.create_map(
            F.lit("seconds"), F.lit(1), F.lit("hours"), F.lit(3600),
            F.lit("days"), F.lit(86400),
        ),
        unit_name,
    )
    date_str = F.trim(F.element_at(F.split(units, "since"), 2))
    start = F.coalesce(
        *[F.try_to_timestamp(date_str, F.lit(f)) for f in _SPARK_DATE_FMTS]
    )
    raw_vals = F.split(F.trim(F.translate(values, "{}", "")), ",")
    return F.transform(
        raw_vals,
        lambda v: F.date_format(
            F.timestamp_seconds(
                F.unix_timestamp(start) + v.cast("double").cast("long") * step
            ),
            "yyyy-MM-dd'T'HH:mm:ss'Z'",
        ),
    )


def _getdate_py(s: str) -> dt.datetime | None:
    for fmt in _PY_DATE_FMTS:
        try:
            return dt.datetime.strptime(s, fmt).replace(tzinfo=dt.timezone.utc)
        except ValueError:
            continue
    return None


def nc_times_py(units: str, values: str) -> list[str]:
    parts = units.split("since")
    step = _UNIT_SECONDS[parts[0].strip()]
    start = _getdate_py(parts[1].strip())
    out = []
    for v in values.strip().strip("{}").split(","):
        secs = int(float(v))  # math.Modf truncation toward zero
        t = start + dt.timedelta(seconds=secs * step)
        out.append(t.strftime("%Y-%m-%dT%H:%M:%SZ"))
    return out


# ---------------------------------------------------------------------------
# The extraction operator (Spark): asset urls -> exploded dataset rows
# ---------------------------------------------------------------------------

def extract_gdal_metadata(df: DataFrame, url_col: str = "asset_url") -> DataFrame:
    """1 asset -> N dataset rows with GDALDataSet-shaped columns.

    Column names mirror the JSON tags at geolib/gdal.go:27-36.  Failed
    opens (gdal.go:51-53) yield all-zero rows — empty ``ds_name``/
    ``proj_wkt``, null geotransform — which downstream B3 drops
    (geoparser.go:184).  B6 (empty raw projection -> canned WGS84,
    gdal.go:66-68) is applied HERE, as in the reference.
    """
    url = F.col(url_col)
    df = df.withColumn("file_type", driver_expr(url))
    # subdataset fan-out: a real explode() (O6 / gdal.go:179-186)
    df = df.withColumn("_ds_key", F.explode(_dataset_names_expr(url)))
    ds = F.col("_ds_key")
    failed = _open_failed_expr(ds)
    raw = _raw_fields_expr(ds)
    df = (
        df.withColumn("ds_name", F.when(failed, F.lit("")).otherwise(ds))
        .withColumn("raster_count", F.when(failed, F.lit(0)).otherwise(raw["raster_count"]))
        .withColumn("array_type", F.when(failed, F.lit("")).otherwise(raw["array_type"]))
        .withColumn("x_size", F.when(failed, F.lit(0)).otherwise(raw["x_size"]))
        .withColumn("y_size", F.when(failed, F.lit(0)).otherwise(raw["y_size"]))
        .withColumn(
            "proj_wkt",
            F.when(failed, F.lit("")).otherwise(
                # B6: empty raw projection -> canned WGS84 (gdal.go:66-68)
                F.coalesce(F.nullif(raw["proj_wkt_raw"], F.lit("")), F.lit(WGS84WKT))
            ),
        )
        .withColumn(
            "geotransform",
            F.when(failed, F.lit(None).cast("array<double>")).otherwise(raw["geotransform"]),
        )
    )
    units, values = _nc_raw_expr(ds, (F.col("file_type") == "netCDF") & ~failed)
    df = df.withColumn(
        "nc_times",
        F.when(units.isNotNull(), nc_times_expr(units, values)).otherwise(
            F.lit(None).cast("array<string>")
        ),
    )
    df = df.withColumn(
        "extra_metadata",
        F.when(
            F.col("nc_times").isNotNull(),
            F.create_map(F.lit("nc_times"), F.col("nc_times")),
        ).otherwise(F.from_json(F.lit("{}"), "map<string,array<string>>")),
    )
    return df.drop("_ds_key")


def fake_gdal_file_py(url: str) -> dict:
    """Pure-Python twin of :func:`extract_gdal_metadata` for one asset.

    Returns the GDALFile shape of geolib/gdal.go:38-41.
    """
    driver = EXT_DRIVER.get(ext_of_py(url), "Unknown")
    datasets = []
    for ds in _dataset_names_py(url):
        if _fh_py(ds, "pw") % 7 == 0:  # failed open -> GDALDataSet{} zero value
            datasets.append(
                {
                    "ds_name": "", "raster_count": 0, "array_type": "",
                    "x_size": 0, "y_size": 0, "proj_wkt": "",
                    "geotransform": None, "extra_metadata": {},
                }
            )
            continue
        f = _raw_fields_py(ds)
        units, values = _nc_raw_py(ds, driver == "netCDF")
        extras: dict[str, list[str]] = {}
        if units is not None:
            extras["nc_times"] = nc_times_py(units, values)
        datasets.append(
            {
                "ds_name": ds,
                "raster_count": f["raster_count"],
                "array_type": f["array_type"],
                "x_size": f["x_size"],
                "y_size": f["y_size"],
                "proj_wkt": f["proj_wkt_raw"] or WGS84WKT,
                "geotransform": f["geotransform"],
                "extra_metadata": extras,
            }
        )
    return {"file_type": driver, "datasets": datasets}
