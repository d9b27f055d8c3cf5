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

#: Opt-in crawl prioritization (CrawlEngine host_rank / PyRefCrawl
#: host_rank): given a per-host rank signal r in [0, PRIO_RANK_MAX]
#: integer millionths (e.g. queries_pipeline.host_pagerank scaled by
#: 1e6), frontier priority becomes
#:     depth * PRIO_SCALE + (PRIO_RANK_MAX - r)
#: BFS depth stays the MAJOR key (reference parity: a deeper page never
#: overtakes a shallower one), higher-ranked hosts pop first within a
#: depth layer, and url remains the final tiebreak.  Pure integer
#: arithmetic so Spark and pyref order identically.
PRIO_RANK_MAX = 1_000_000
PRIO_SCALE = 10_000_000


# ---------------------------------------------------------------------------
# robots
# ---------------------------------------------------------------------------

def path_expr(url: Column) -> Column:
    return F.regexp_replace(url, r"^[a-z][a-z0-9+.\-]*://[^/?]*", "")


# Robots matching implements REP precedence (as standardized by RFC 9309):
# a rule is a path pattern where `*` matches any character run and a
# trailing `$` anchors the path end; among ALL matching Allow/Disallow
# rules the one with the LONGEST raw pattern wins, and on a length tie
# Allow wins; no matching rule means allowed.  Empty patterns are ignored
# (an empty Disallow line traditionally means "allow all").  Both dialects
# implement the identical decision procedure: same pattern-length measure,
# same array order (disallow rules before allow rules), same tie update.


def _rule_rx_expr(p: Column) -> Column:
    """Pattern -> anchored Java regex, built with column ops only:
    strip a trailing `$` (anchor), escape every regex metachar except
    `*`, turn `*` into `.*`, then re-anchor."""
    ends = p.endswith("$")
    core = F.when(ends, p.substr(F.lit(1), F.length(p) - 1)).otherwise(p)
    esc = F.regexp_replace(core, r"([.^$+?(){}\[\]|\\])", r"\\$1")
    body = F.regexp_replace(esc, r"\*", ".*")
    return F.concat(F.lit("^"), body, F.when(ends, F.lit("$")).otherwise(F.lit("")))


def robots_rules_expr(disallow: Column, allow: Column) -> Column:
    """(disallow[], allow[]) -> array<struct<pat, plen, is_allow, wild, rx>>.

    Meant to be evaluated ON THE ROBOTS DIMENSION (one row per host,
    broadcast) so the pattern->regex conversion runs per host; the per-URL
    hot path then only matches.  ``wild`` marks rules that actually need
    the regex — plain prefixes use startswith (no per-row regex compile).
    """

    def rules(arr: Column, is_allow: bool) -> Column:
        arr = F.coalesce(arr, F.array().cast("array<string>"))
        return F.transform(
            F.filter(arr, lambda p: p != ""),
            lambda p: F.struct(
                p.alias("pat"),
                F.length(p).alias("plen"),
                F.lit(is_allow).alias("is_allow"),
                (p.contains("*") | p.endswith("$")).alias("wild"),
                _rule_rx_expr(p).alias("rx"),
            ),
        )

    return F.concat(rules(disallow, False), rules(allow, True))


def robots_denied_rules_expr(url: Column, rules: Column) -> Column:
    """REP longest-match decision against precomputed rules (null-safe:
    absent rules -> allowed).

    The whole decision sits behind a ``size(rules) > 0`` guard: a host
    with no rules (the common case on real crawls — and a NULL from the
    broadcast left join) short-circuits to allowed WITHOUT evaluating
    ``path_expr``'s regex or the filter/aggregate machinery.  CaseWhen
    branches evaluate lazily per row in codegen, so the guard is a pure
    win (identity on the result by construction: no rules -> no match ->
    allowed)."""
    p = path_expr(url)
    matched = F.filter(
        rules,
        lambda r: F.when(r["wild"], F.regexp_like(p, r["rx"])).otherwise(
            p.startswith(r["pat"])
        ),
    )
    best = F.aggregate(
        matched,
        F.struct(F.lit(-1).alias("plen"), F.lit(True).alias("is_allow")),
        lambda acc, r: F.when(
            (r["plen"] > acc["plen"])
            | ((r["plen"] == acc["plen"]) & r["is_allow"] & ~acc["is_allow"]),
            F.struct(r["plen"].alias("plen"), r["is_allow"].alias("is_allow")),
        ).otherwise(acc),
    )
    decision = (best["plen"] >= 0) & ~best["is_allow"]
    return F.when(F.size(rules) > 0, decision).otherwise(F.lit(False))


def robots_denied_expr(
    url: Column, disallow: Column, allow: Column | None = None
) -> Column:
    """Convenience form building the rules inline (null-safe).  For hot
    paths, precompute :func:`robots_rules_expr` on the broadcast robots
    dimension and use :func:`robots_denied_rules_expr` instead."""
    if allow is None:
        allow = F.lit(None).cast("array<string>")
    return robots_denied_rules_expr(url, robots_rules_expr(disallow, allow))


def crawl_delay_cap_expr(delay: Column, round_seconds: int) -> Column:
    """Per-round fetch cap for a robots crawl-delay of ``delay`` seconds:
    max(1, floor(round_seconds / delay)) — the rate a serial polite
    fetcher sustains over one nominal round; NULL (no cap) when the host
    advertises no positive delay.  Shared by CrawlEngine._effective_budget
    and the ``effective_budget`` oracle query."""
    return F.when(
        delay > 0,
        F.greatest(F.lit(1), F.floor(F.lit(round_seconds) / delay)),
    ).cast("long")


def _match_len_py(path: str, pat: str) -> int:
    """Raw-pattern length when ``pat`` matches ``path``, else -1."""
    if pat == "":
        return -1
    ends = pat.endswith("$")
    core = pat[:-1] if ends else pat
    rx = "^" + ".*".join(re.escape(seg) for seg in core.split("*")) + (
        "$" if ends else ""
    )
    return len(pat) if re.match(rx, path) else -1


def robots_denied_py(
    url: str, disallow: list[str] | None, allow: list[str] | None = None
) -> bool:
    """Python twin of :func:`robots_denied_expr` — identical iteration
    order and tie update, so precedence decisions agree exactly."""
    path = re.sub(r"^[a-z][a-z0-9+.\-]*://[^/?]*", "", url)
    best_len, best_allow = -1, True
    for pats, is_allow in ((disallow or [], False), (allow or [], True)):
        for p in pats:
            ln = _match_len_py(path, p)
            if ln < 0:
                continue
            if ln > best_len or (ln == best_len and is_allow and not best_allow):
                best_len, best_allow = ln, is_allow
    return best_len >= 0 and not best_allow


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
