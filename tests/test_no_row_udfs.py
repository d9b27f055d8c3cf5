"""input_hint contract: vectorized pandas/Arrow UDFs only — no per-row
Python UDFs, no RDD API in the engine package."""

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent / "geocrawl_spark"

FORBIDDEN = [
    (re.compile(r"@F\.udf\b|@udf\b|F\.udf\("), "row-at-a-time Python UDF"),
    (re.compile(r"\.rdd\b|sparkContext\.parallelize"), "RDD API"),
    (re.compile(r"\.collect\(\)\s*\)?\s*for\b"), "driver-side loop over collect"),
]


def test_no_row_udfs_or_rdds():
    offenders = []
    for path in PKG.glob("*.py"):
        text = path.read_text()
        for rx, label in FORBIDDEN:
            for m in rx.finditer(text):
                line = text[: m.start()].count("\n") + 1
                offenders.append(f"{path.name}:{line} {label}")
    assert not offenders, offenders
