"""Package geocrawl_spark for spark-submit --py-files deployment.

Produces dist/geocrawl_spark.zip containing only the package sources
(no __pycache__, no tests) with fixed timestamps, so the artifact is
byte-reproducible — the same zip a CI step would ship to a cluster.

Usage: python scripts/make_pyfiles.py [out_zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_zip: str | None = None) -> str:
    out = out_zip or os.path.join(_REPO, "dist", "geocrawl_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(_REPO, "geocrawl_spark")
    names = sorted(
        f for f in os.listdir(pkg)
        if f.endswith(".py") and not f.startswith(".")
    )
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for name in names:
            info = zipfile.ZipInfo(f"geocrawl_spark/{name}")
            info.date_time = (2020, 1, 1, 0, 0, 0)  # reproducible bytes
            info.external_attr = 0o644 << 16
            with open(os.path.join(pkg, name), "rb") as f:
                z.writestr(info, f.read())
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
