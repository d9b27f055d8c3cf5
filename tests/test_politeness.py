"""Politeness pop: budget invariant, determinism under repartition/salt,
equality with the single-threaded twin; robots gate in both dialects."""

import pandas as pd
import pyspark.sql.functions as F
import pytest

from geocrawl_spark.politeness import (
    pop_batch,
    pop_batch_py,
    robots_denied_expr,
    robots_denied_py,
)


def _pending_pdf():
    rows = []
    # hot host with 200 pending, two small hosts
    for i in range(200):
        rows.append({"url": f"http://hot.org/p/{i:03d}.html", "host": "hot.org",
                     "depth": i % 5, "priority": i % 5})
    for i in range(10):
        rows.append({"url": f"http://a.org/p/{i}.html", "host": "a.org",
                     "depth": 1, "priority": 1})
    rows.append({"url": "http://b.org/", "host": "b.org", "depth": 0, "priority": 0})
    return pd.DataFrame(rows)


BUDGETS = pd.DataFrame({"host": ["hot.org", "a.org"], "budget": [3, 2]})


@pytest.mark.parametrize("salt", [1, 4, 16])
@pytest.mark.parametrize("parts", [1, 7])
@pytest.mark.parametrize("method", ["window", "heap"])
def test_pop_matches_twin_and_budget(spark, salt, parts, method):
    pending = spark.createDataFrame(_pending_pdf()).repartition(parts)
    budgets = spark.createDataFrame(BUDGETS)
    got = pop_batch(pending, budgets, salt=salt, method=method).collect()

    per_host = {}
    for r in got:
        per_host.setdefault(r["host"], []).append(r["url"])
    assert len(per_host["hot.org"]) == 3
    assert len(per_host["a.org"]) == 2
    assert len(per_host["b.org"]) == 1  # DEFAULT_BUDGET floor

    expected = pop_batch_py(
        _pending_pdf().to_dict("records"),
        dict(zip(BUDGETS["host"], BUDGETS["budget"])),
    )
    assert sorted(r["url"] for r in got) == sorted(r["url"] for r in expected)


def test_pop_orders_by_priority_then_url(spark):
    pending = spark.createDataFrame(_pending_pdf())
    budgets = spark.createDataFrame(BUDGETS)
    got = sorted(
        (r["url"] for r in pop_batch(pending, budgets).collect()
         if r["host"] == "hot.org")
    )
    # priority = i%5; the 3 winners are priority-0 urls with smallest url
    assert got == [
        "http://hot.org/p/000.html",
        "http://hot.org/p/005.html",
        "http://hot.org/p/010.html",
    ]


def test_robots_both_dialects(spark):
    cases = [
        ("http://x.org/private/1.html", ["/private/"], True),
        ("http://x.org/public/1.html", ["/private/"], False),
        ("http://x.org/anything", ["/"], True),
        ("http://x.org/a", [], False),
        ("http://x.org/a", None, False),
    ]
    for url, dis, want in cases:
        assert robots_denied_py(url, dis) is want
    df = spark.createDataFrame(
        [(u, d) for u, d, _ in cases], "url string, disallow array<string>"
    )
    got = [
        r["d"]
        for r in df.select(
            robots_denied_expr(F.col("url"), F.col("disallow")).alias("d")
        ).collect()
    ]
    assert got == [w for _, _, w in cases]


def test_robots_precedence_both_dialects(spark):
    """REP longest-match precedence (RFC 9309): wildcards, $ anchors,
    Allow-overrides-Disallow, tie -> Allow; identical in both dialects,
    including via the precomputed-rules fast path the engine uses."""
    from geocrawl_spark.politeness import (
        robots_denied_rules_expr,
        robots_rules_expr,
    )

    cases = [
        ("http://h/private/open/x.html", ["/private/"], ["/private/open/"], False),
        ("http://h/private/other.html", ["/private/"], ["/private/open/"], True),
        ("http://h/p/0.html", ["/"], ["/p/0.html$"], False),
        ("http://h/p/0.html?x", ["/"], ["/p/0.html$"], True),  # anchor miss
        ("http://h/p/17.html", ["/p/*7.html$"], [], True),
        ("http://h/p/17.htmlx", ["/p/*7.html$"], [], False),  # $ anchor
        ("http://h/p/8.html", ["/p/*7.html$"], [], False),
        ("http://h/fish.php", ["/*.php"], [], True),
        ("http://h/a.+b(c)", ["/a.+b(c)"], [], True),  # metachars literal
        ("http://h/axxb", ["/a.+b"], [], False),  # '.' not a wildcard
        ("http://h/ab", ["/ab"], ["/ab"], False),  # equal length -> allow
        ("http://h/a", [""], [], False),  # empty pattern ignored
    ]
    for url, dis, alw, want in cases:
        assert robots_denied_py(url, dis, alw) is want, (url, dis, alw)
    df = spark.createDataFrame(
        [(u, d, a) for u, d, a, _ in cases],
        "url string, disallow array<string>, allow array<string>",
    )
    for expr in (
        robots_denied_expr(F.col("url"), F.col("disallow"), F.col("allow")),
        robots_denied_rules_expr(
            F.col("url"), robots_rules_expr(F.col("disallow"), F.col("allow"))
        ),
    ):
        got = [r["d"] for r in df.select(expr.alias("d")).collect()]
        assert got == [w for _, _, _, w in cases]


def test_global_sequence_matches_global_sort(spark, tmp_path):
    """Distributed fetch_seq rank == the naive single-partition global
    window, its physical plan contains NO SinglePartition exchange, and
    repeated reads give identical ranks (file-anchored, recompute-proof)."""
    import pandas as pd

    from geocrawl_spark.frontier import global_sequence

    pdf = pd.DataFrame(
        {
            "priority": [i % 7 for i in range(5000)],
            "url": [f"http://h{i % 13}.org/p/{i:05d}" for i in range(5000)],
        }
    )
    df = spark.createDataFrame(pdf, "priority long, url string")
    out = global_sequence(df, ["priority", "url"], str(tmp_path / "b"), n_parts=16)
    got = {
        r["url"]: r["fetch_seq"]
        for r in out.select("url", "fetch_seq").collect()
    }
    want = {
        row["url"]: seq
        for seq, row in enumerate(
            sorted(pdf.to_dict("records"), key=lambda r: (r["priority"], r["url"])),
            start=1,
        )
    }
    assert got == want
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    # second action re-reads the immutable files -> identical ranks
    got2 = {r["url"]: r["fetch_seq"] for r in out.collect()}
    assert got2 == want


def test_global_sequence_empty(spark, tmp_path):
    from geocrawl_spark.frontier import global_sequence

    df = spark.range(0).select(
        F.col("id").alias("priority"), F.col("id").cast("string").alias("url")
    )
    out = global_sequence(df, ["priority", "url"], str(tmp_path / "b"))
    assert out.count() == 0 and "fetch_seq" in out.columns
