"""Per-host politeness + robots gate.

Reference analog: the ConcLimiter semaphore bounds in-flight extraction
at ``c`` (geolib/conclimiter.go:7-25, geocrawl/geocrawler.go:45-53).  A
web crawl needs the bound *per host*, not just globally, so the graft
enforces: at most ``budget(host)`` fetches per host per round.

Hot-host skew (north_star): one mega-host would put its whole pending
set in one task.  The pop is therefore two-phase:

  phase 1 — group by (host, salt) where salt = pmod(xxhash64(url), S);
            per group, a heapq top-``budget`` inside applyInPandas
            (bounded memory: never materializes more than ``budget``
            rows per group in the heap);
  phase 2 — the <= S*budget survivors per host go through an exact
            per-host window top-``budget``.

The union of per-slice top-k provably contains the per-host top-k, so
the result is EXACTLY the deterministic per-host top-``budget`` by
(priority, url) — identical to the single-threaded pyref — while phase 1
runs at S-way parallelism per host.

Robots semantics (graft analog of the ``-re`` gate before spawning a
worker, geocrawl/geocrawler.go:47): checked once at frontier-admission
time; a denied URL enters the frontier as status='robots_denied' and is
never fetched nor re-admitted.
"""

from __future__ import annotations

import heapq
import re

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BUDGET = 2
DEFAULT_SALT = 4


# ---------------------------------------------------------------------------
# robots
# ---------------------------------------------------------------------------

def path_expr(url: Column) -> Column:
    return F.regexp_replace(url, r"^[a-z][a-z0-9+.\-]*://[^/?]*", "")


def robots_denied_expr(url: Column, disallow: Column) -> Column:
    """True when any disallow prefix matches the URL path (null-safe)."""
    p = path_expr(url)
    return F.coalesce(
        F.exists(disallow, lambda d: p.startswith(d)), F.lit(False)
    )


def robots_denied_py(url: str, disallow: list[str] | None) -> bool:
    path = re.sub(r"^[a-z][a-z0-9+.\-]*://[^/?]*", "", url)
    return any(path.startswith(d) for d in (disallow or []))


# ---------------------------------------------------------------------------
# budget pop
# ---------------------------------------------------------------------------

def _heap_topk(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per (host, salt) slice: smallest ``budget`` rows by (priority, url).

    heapq.nsmallest keeps at most ``budget`` items in memory regardless of
    slice size (E1 in SURVEY.md — the per-partition priority heap).
    """
    if not len(pdf):
        return pdf.drop(columns=["salt"])
    budget = int(pdf["budget"].iloc[0])
    keys = list(zip(pdf["priority"], pdf["url"], pdf.index))
    picked = [i for _, _, i in heapq.nsmallest(budget, keys)]
    return pdf.loc[picked].drop(columns=["salt"])


def pop_batch(
    pending: DataFrame,
    hostbudget: DataFrame,
    salt: int = DEFAULT_SALT,
    method: str = "window",
) -> DataFrame:
    """Deterministic per-host top-``budget`` fetch batch.

    ``pending`` needs (url, host, priority, ...); ``hostbudget`` is
    (host, budget) and is broadcast (small dim — one row per host).
    Returns pending's columns + ``budget``.

    Phase-1 ``method``:
    - ``window`` (default): JVM row_number over (host, salt) partitions —
      whole-stage codegen, no Python crossing; Spark sorts each salted
      partition (skew already defused by the salt).
    - ``heap``: heapq.nsmallest(budget) inside applyInPandas per
      (host, salt) group — O(n log k) memory-bounded pop per slice, the
      north_star formulation; preferable when a single host's pending set
      is so large that sorting it (even salted) would spill.
    Both produce the EXACT same batch (tests/test_politeness.py).
    """
    df = pending.join(F.broadcast(hostbudget), "host", "left").withColumn(
        "budget", F.coalesce(F.col("budget"), F.lit(DEFAULT_BUDGET))
    )
    df = df.withColumn("salt", F.pmod(F.xxhash64("url"), F.lit(salt)))
    if method == "heap":
        schema = df.drop("salt").schema
        phase1 = df.groupBy("host", "salt").applyInPandas(_heap_topk, schema)
    else:
        w1 = Window.partitionBy("host", "salt").orderBy("priority", "url")
        phase1 = (
            df.withColumn("_rk1", F.row_number().over(w1))
            .filter(F.col("_rk1") <= F.col("budget"))
            .drop("_rk1", "salt")
        )
    w = Window.partitionBy("host").orderBy("priority", "url")
    return (
        phase1.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= F.col("budget"))
        .drop("_rk")
    )


def pop_batch_py(
    pending: list[dict], budgets: dict[str, int]
) -> list[dict]:
    """pyref twin: per-host top-budget by (priority, url)."""
    by_host: dict[str, list[dict]] = {}
    for row in pending:
        by_host.setdefault(row["host"], []).append(row)
    out = []
    for host, rows in by_host.items():
        b = budgets.get(host, DEFAULT_BUDGET)
        rows.sort(key=lambda r: (r["priority"], r["url"]))
        out.extend(rows[:b])
    return out
