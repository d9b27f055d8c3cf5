"""Round-snapshot checkpointing (SURVEY.md H4).

The reference has NO resume — a killed crawl restarts from scratch; the
north_rule requires resume-to-identical-ordering, which we get by making
every round a committed snapshot of the full crawl state.

This module is the ``tableio`` indirection from SURVEY.md §7: the API is
Iceberg-shaped (write table version -> commit -> read latest committed),
but since no Iceberg runtime jar is installable in this sandbox it is
backed by Parquet directories plus an atomically-renamed JSON manifest:

    base/rounds/r{N}/{table}/   (parquet)
    base/manifest.json          {"committed": [0, 1, ...], "tables": {...}}

Swap-in path for a real cluster: replace _write/_read with Iceberg
``writeTo(...).createOrReplace()`` + snapshot IDs in the manifest; the
engine code (frontier.py) only touches this API.

Crucially, a round is COMMITTED only after all its tables are fully
written (manifest rename is the commit point), so a kill at any moment
leaves the previous round intact — resume re-reads the last committed
round and, because ordering is a pure function of table state (never of
task scheduling), replays to the identical ordering (tested in
tests/test_crawl_golden.py::test_kill_resume).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession


class TableIO:
    def __init__(self, base_dir: str):
        self.base = base_dir
        os.makedirs(self.base, exist_ok=True)

    # -- manifest ----------------------------------------------------------
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.base, "manifest.json")

    def _read_manifest(self) -> dict:
        if not os.path.exists(self._manifest_path):
            return {"committed": [], "tables": {}}
        with open(self._manifest_path) as f:
            return json.load(f)

    def _write_manifest(self, m: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.base, suffix=".manifest")
        with os.fdopen(fd, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self._manifest_path)  # atomic commit point

    def latest_round(self) -> int | None:
        m = self._read_manifest()
        return max(m["committed"]) if m["committed"] else None

    # -- tables ------------------------------------------------------------
    def _table_path(self, name: str, round_no: int) -> str:
        return os.path.join(self.base, "rounds", f"r{round_no}", name)

    def write_table(self, df: DataFrame, name: str, round_no: int) -> None:
        df.write.mode("overwrite").parquet(self._table_path(name, round_no))

    def read_table(self, spark: SparkSession, name: str, round_no: int | None = None) -> DataFrame:
        if round_no is None:
            round_no = self.latest_round()
            if round_no is None:
                raise FileNotFoundError("no committed rounds")
        return spark.read.parquet(self._table_path(name, round_no))

    def commit_round(self, round_no: int, tables: list[str]) -> None:
        m = self._read_manifest()
        if round_no not in m["committed"]:
            m["committed"].append(round_no)
        m["tables"][str(round_no)] = tables
        self._write_manifest(m)

    def rollback_to(self, round_no: int) -> None:
        """Drop snapshots after ``round_no`` (used by kill/resume tests)."""
        m = self._read_manifest()
        for r in [r for r in m["committed"] if r > round_no]:
            shutil.rmtree(os.path.join(self.base, "rounds", f"r{r}"), ignore_errors=True)
        m["committed"] = [r for r in m["committed"] if r <= round_no]
        m["tables"] = {k: v for k, v in m["tables"].items() if int(k) <= round_no}
        self._write_manifest(m)
