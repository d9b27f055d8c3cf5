"""Unit tests for the web-index operators (queries_webidx): SURT key
construction, CDX latest-capture-wins semantics, public-suffix
longest-match PLD extraction, and the degree-histogram edge-mass
invariant.  The oracle sweep checks engine parity; these pin the
SEMANTICS on hand-derived expectations."""

import datetime

import pytest
from pyspark.sql import functions as F

from geocrawl_spark.queries_webidx import (
    postings_size_est,
    warc_roundtrip,
    _PSL,
    cdx_latest_capture,
    outlink_degree_hist,
    pld_rollup,
    surt_keys,
)

SF001 = "/root/testdata/sf0.01"


def _docs_dir(spark, tmp_path, n):
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("w w w").alias("text"),
        F.lit("en").alias("lang"),
        F.concat(F.lit("src"), (F.col("id") % 20).cast("string")).alias("source"),
        F.lit(5).cast("long").alias("n_chars"),
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


# ---------------------------------------------------------------------------
# SURT keys
# ---------------------------------------------------------------------------


def test_surt_hand_expectations(spark, tmp_path):
    sf = _docs_dir(spark, tmp_path, 8)
    got = {r["doc_id"]: r["surt"] for r in surt_keys(spark, sf).collect()}
    # doc 0: www.d0.com -> www stripped -> com,d0)/d/0
    assert got[0] == "com,d0)/d/0"
    # doc 1: s.d1.org (www absent, sub label KEPT) -> org,d1,s)/d/1
    assert got[1] == "org,d1,s)/d/1"
    # doc 4: d4.co.uk -> two-label suffix reverses label-by-label
    assert got[4] == "uk,co,d4)/d/4"
    # doc 3: www.s.d3.io -> only the LEADING www is stripped
    assert got[3] == "io,d3,s)/d/3"


def test_surt_sorts_by_registrable_domain(spark, tmp_path):
    """The point of SURT: lexicographic order clusters a domain's pages
    regardless of subdomain spelling."""
    sf = _docs_dir(spark, tmp_path, 200)
    rows = surt_keys(spark, sf).collect()
    by_surt = sorted(r["surt"] for r in rows)
    # every key for d7.* (co.uk suffix class) is contiguous once sorted
    block = [s for s in by_surt if s.startswith("uk,co,d7")]
    lo = by_surt.index(block[0])
    assert by_surt[lo : lo + len(block)] == block


# ---------------------------------------------------------------------------
# CDX latest capture
# ---------------------------------------------------------------------------


def test_cdx_latest_wins_with_event_id_tiebreak(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    t1 = datetime.datetime(2024, 1, 2, 0, 0, 0)
    # user_id 0, event_id % 97 collapses ids 0 and 97 onto ONE urlkey
    rows = [
        (0, t0, 0, "view", 1.0, '{"k": 1}'),
        (97, t1, 0, "view", 1.0, '{"k": 2}'),   # latest ts -> wins
        (194, t1, 0, "view", 1.0, '{"k": 3}'),  # same ts, higher id -> wins
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    out = cdx_latest_capture(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["urlkey"] == "com,site0)/p/0"
    assert r["n_captures"] == 3
    assert r["last_ts"] == int(t1.replace(tzinfo=datetime.timezone.utc).timestamp())
    exp = spark.createDataFrame([('{"k": 3}',)], "p string").select(
        F.md5("p")
    ).first()[0]
    assert r["last_digest"] == exp


def test_cdx_capture_counts_partition_events(spark):
    out = cdx_latest_capture(spark, SF001)
    total = out.agg(F.sum("n_captures")).first()[0]
    n_events = spark.read.parquet(f"{SF001}/events.parquet").count()
    assert total == n_events  # every capture lands in exactly one key


# ---------------------------------------------------------------------------
# PLD extraction
# ---------------------------------------------------------------------------


def test_pld_longest_suffix_wins(spark, tmp_path):
    sf = _docs_dir(spark, tmp_path, len(_PSL) * 13 * 6)
    plds = [r["pld"] for r in pld_rollup(spark, sf).collect()]
    # a host under co.uk must register d<k>.co.uk, never the 1-label "uk"
    # tail (which would produce the bogus PLD "co.uk" with no name label)
    assert any(p.endswith(".co.uk") for p in plds)
    assert "co.uk" not in plds and "gov.uk" not in plds
    # every PLD is exactly one name label + a known suffix
    for p in plds:
        suf = next(s for s in sorted(_PSL, key=len, reverse=True) if p.endswith("." + s))
        name = p[: -(len(suf) + 1)]
        assert "." not in name and name.startswith("d")


def test_pld_rollup_counts_docs_once(spark, tmp_path):
    n = 500
    sf = _docs_dir(spark, tmp_path, n)
    out = pld_rollup(spark, sf)
    assert out.agg(F.sum("n_docs")).first()[0] == n  # total preserved
    # www/sub variants of one PLD collapse: n_hosts > 1 for some rows
    assert out.filter(F.col("n_hosts") > 1).count() > 0


# ---------------------------------------------------------------------------
# degree histogram
# ---------------------------------------------------------------------------


def test_degree_hist_edge_mass_balances(spark):
    out = outlink_degree_hist(spark, SF001).collect()
    mass = {}
    for r in out:
        mass[r["direction"]] = mass.get(r["direction"], 0) + r["n_edges"]
    # every edge has one source and one target: the two directions see
    # the same edge multiset
    assert mass["out"] == mass["in"] > 0
    # the synthetic residue targets skew the in side into >1 bucket
    assert len([r for r in out if r["direction"] == "in"]) > 1


# ---------------------------------------------------------------------------
# WARC round-trip
# ---------------------------------------------------------------------------


def test_warc_roundtrip_all_ok(spark):
    out = warc_roundtrip(spark, SF001)
    n = out.count()
    assert n == 500
    assert out.filter(~F.col("roundtrip_ok")).count() == 0
    r0 = out.filter(F.col("doc_id") == 0).first()
    assert r0["uri"] == "http://host0.example.org/p/0.html"


def test_warc_parse_is_generic_not_positional(spark, tmp_path):
    """A body that CONTAINS header-lookalike text must not confuse the
    parser: only the first blank line splits headers from body."""
    df = spark.createDataFrame(
        [(0, "decoy Content-Length: 9999 and WARC-Target-URI: http://evil/", "en", "src0", 60)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    out = warc_roundtrip(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0]["uri"] == "http://host0.example.org/p/0.html"
    assert out[0]["roundtrip_ok"] is True


# ---------------------------------------------------------------------------
# postings size estimate
# ---------------------------------------------------------------------------


def test_postings_varint_hand_case(spark, tmp_path):
    """Two docs sharing one term: postings for 'x' are [3, 200] ->
    deltas [4, 197] -> varint bytes [1, 2]; singleton term 'y' on doc
    200 -> delta 201 -> 2 bytes."""
    rows = [(3, "x", "en", "src0", 1), (200, "x y", "en", "src0", 3)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    out = {r["t0"]: r for r in postings_size_est(spark, str(tmp_path)).collect()}
    assert out["x"]["n_postings"] == 2 and out["x"]["varint_bytes"] == 3
    assert out["y"]["n_postings"] == 1 and out["y"]["varint_bytes"] == 2
    assert out["x"]["raw_bytes"] == 16


def test_postings_varint_never_exceeds_raw(spark):
    out = postings_size_est(spark, SF001)
    bad = out.filter(F.col("varint_bytes") > F.col("raw_bytes")).count()
    assert bad == 0


# ---------------------------------------------------------------------------
# plan shape (lock the scale claims the docstrings make)
# ---------------------------------------------------------------------------


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_pld_plan_is_broadcast_only(spark):
    """The PSL lookup must stay two broadcast hash joins with no
    doc-keyed shuffle: no SortMergeJoin, and the only hash exchanges
    are the PLD-keyed aggregation (plus the presentation sort)."""
    plan = _plan(pld_rollup(spark, SF001))
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
    # hashpartitioning exchanges must key on pld, never doc_id
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "pld" in ln and "doc_id" not in ln


def test_surt_and_warc_plans_have_no_data_shuffle(spark):
    """Both are single-scan column pipelines: the only exchange allowed
    is the presentation ORDER BY's range partitioning."""
    for df in (surt_keys(spark, SF001), warc_roundtrip(spark, SF001)):
        plan = _plan(df)
        assert "Exchange hashpartitioning" not in plan
        assert plan.count("Exchange") == 1  # rangepartitioning for orderBy


def test_postings_plan_deduplicates_before_explode(spark):
    """array_distinct rides the projection, so the plan must NOT contain
    a (term, doc_id)-keyed deduplication aggregate before the window."""
    plan = _plan(postings_size_est(spark, SF001))
    assert "SortMergeJoin" not in plan
    # exactly: term-window exchange + t0 rollup exchange + orderBy range
    assert plan.count("Exchange hashpartitioning") == 2
