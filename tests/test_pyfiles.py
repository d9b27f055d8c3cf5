"""The spark-submit --py-files artifact: reproducible bytes, package
contents, and importability of the zip (the deployment shape the north
rule prescribes; the live spark-submit run is recorded in
BENCH/BASELINE.md rather than re-run per test session)."""

import importlib
import os
import sys
import zipfile

from scripts.make_pyfiles import build


def test_zip_reproducible_and_complete(tmp_path):
    z1 = build(str(tmp_path / "a.zip"))
    z2 = build(str(tmp_path / "b.zip"))
    assert open(z1, "rb").read() == open(z2, "rb").read()  # byte-identical
    names = zipfile.ZipFile(z1).namelist()
    assert "geocrawl_spark/__init__.py" in names
    assert "geocrawl_spark/frontier.py" in names
    assert not any("__pycache__" in n or n.endswith(".pyc") for n in names)


def test_zip_importable_standalone(tmp_path):
    # the zip alone (no repo on sys.path) must resolve the package —
    # what --py-files does on every executor
    z = build(str(tmp_path / "pkg.zip"))
    saved_path, saved_mods = list(sys.path), dict(sys.modules)
    try:
        sys.path = [z] + [
            p for p in sys.path
            if os.path.abspath(p or ".") != os.path.dirname(os.path.dirname(z))
            and "repo" not in os.path.abspath(p or ".")
        ]
        for m in [m for m in sys.modules if m.startswith("geocrawl_spark")]:
            del sys.modules[m]
        pkg = importlib.import_module("geocrawl_spark.canon")
        assert pkg.__file__.startswith(z)
    finally:
        sys.path = saved_path
        sys.modules.update(saved_mods)
