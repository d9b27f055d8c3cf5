"""Local mimic of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row-count,
column names, and order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

from __spark_entry__ import oracle_sql, queries  # noqa: E402
from geocrawl_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if hasattr(v, "isoformat"):
        return v.isoformat().replace("+00:00", "")
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(
        tuple(norm_cell(r[i]) for i in order) for r in rows
    )
    return [c for c in sorted(cols)], out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")
    spark = get_spark(app_name="check-oracle")
    spark.sparkContext.setLogLevel("ERROR")

    qs, osql = queries(), oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in osql:
            print(f"SKIP {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            rel = con.sql(osql[name])
            dcols = list(rel.columns)
            dtypes = [str(t) for t in rel.types]  # from binding, no exec
            drows = rel.fetchall()  # the ONE oracle execution
            # the DRIVER compares pandas materializations: a DuckDB
            # HUGEINT (e.g. un-cast sum(BIGINT)) silently becomes
            # float64 in fetchdf() and hashes 12.0 vs Spark's 12 even
            # when fetchall() values agree — the round-4
            # hyperplane_bucket_stats failure mode.  Flag it from the
            # bound logical types (a second fetchdf() execution used to
            # double the gate's DuckDB wall clock).
            sdt = dict(zip(sdf.schema.names, (f.dataType.simpleString() for f in sdf.schema.fields)))
            drift = [
                c
                for c, dt in zip(dcols, dtypes)
                if (dt in ("HUGEINT", "UHUGEINT") or dt.startswith("DECIMAL"))
                and sdt.get(c) in ("bigint", "int", "smallint", "tinyint")
            ]
            if drift:
                print(f"FAIL {name}: oracle col(s) {drift} materialize as "
                      "float in pandas but are integral in Spark — add a "
                      "::BIGINT cast in the oracle SQL")
                n_fail += 1
                continue
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        sc, sr = norm_rows(scols, srows)
        dc, dr = norm_rows(dcols, drows)
        if sc != dc:
            print(f"FAIL {name}: columns {sc} vs {dc}")
            n_fail += 1
        elif len(sr) != len(dr):
            print(f"FAIL {name}: rowcount {len(sr)} vs {len(dr)}")
            n_fail += 1
        elif sr != dr:
            diff = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"FAIL {name}: values differ, e.g. {diff}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(qs) - n_pass - n_fail} skipped")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
