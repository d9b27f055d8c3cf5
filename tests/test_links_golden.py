"""Golden tests for the opt-in link-graph log (log_links=True) and the
crawl -> link graph -> integer PageRank -> host_rank loop over REAL
edges: the engine's per-round `links` table must equal the pyref twin's
edge list exactly (every occurrence, pre-admission-dedup), and
pagerank_integer over host_link_graph must be deterministic with the
teleport mass invariant holding despite dangling hosts."""

import pytest

from geocrawl_spark import synth
from geocrawl_spark.frontier import CrawlEngine, host_link_graph, read_all_rounds
from geocrawl_spark.pyref import PyRefCrawl
from geocrawl_spark.queries_pipeline import _PR_SCALE, pagerank_integer

N_PAGES, N_HOSTS = 80, 6


@pytest.fixture(scope="module")
def runs(spark, tmp_path_factory):
    fx = {
        "pages": synth.gen_pages(N_PAGES, N_HOSTS),
        "seeds": synth.gen_seeds(N_HOSTS),
        "robots": synth.gen_robots(N_HOSTS),
        "budget": synth.gen_hostbudget(N_HOSTS),
    }
    ref = PyRefCrawl(fx["pages"], fx["seeds"], fx["robots"], fx["budget"])
    ref.run(max_rounds=50)
    eng = CrawlEngine(
        spark,
        pages=spark.createDataFrame(
            fx["pages"],
            "url string, warc_ts timestamp, html binary, text string, lang string",
        ),
        seeds=spark.createDataFrame(fx["seeds"]),
        robots=spark.createDataFrame(
            fx["robots"], "host string, disallow array<string>, allow array<string>"
        ),
        hostbudget=spark.createDataFrame(fx["budget"]),
        base_dir=str(tmp_path_factory.mktemp("links")),
        n_shards=4,
        salt=4,
        m_bits=1 << 18,
        k=7,
        log_links=True,
    )
    eng.run(max_rounds=50)
    return eng, ref


def test_links_log_identical(runs):
    eng, ref = runs
    assert eng.crawl_order() == ref.crawl_order  # link logging is a no-op
    df = read_all_rounds(eng.spark, eng.io, "links")
    got = sorted(
        (r["src_url"], r["dst_url"], r["kind"], r["anchor"])
        for r in df.collect()
    )
    want = sorted(ref.links)
    assert got == want and len(got) > 100
    # anchors carry real text (synth pages label their links)
    assert any(a for _, _, _, a in got)
    # duplicates preserved: the log is every occurrence, not a set
    # (project out the anchor — distinct labels on repeated edges)
    assert len(got) > len({(s, d, k) for s, d, k, _ in got})


def test_anchor_snippet_href_parity():
    """The _ANCHOR_SNIPPET_RE contract: the href sequence extracted with
    anchors must equal extract_links_py's exactly — including on a page
    truncated mid-tag (the optional-tail case) — or link admission would
    differ between logging and non-logging engines."""
    from geocrawl_spark.assets import extract_link_anchors_py, extract_links_py

    for i, p in enumerate(synth.gen_pages(120, 7).itertuples()):
        html = p.html if isinstance(p.html, bytes) else bytes(p.html)
        pairs = extract_link_anchors_py(html)
        assert [h for h, _ in pairs] == extract_links_py(html), p.url
    truncated = b'<html><a href="/x.html">text</a>\n<a href="/y.html"'
    pairs = extract_link_anchors_py(truncated)
    assert [h for h, _ in pairs] == extract_links_py(truncated)
    assert pairs == [("/x.html", "text"), ("/y.html", "")]
    messy = b'<a  href="/a/">  spaced \n anchor </a><link href="/c.css"/>'
    assert extract_link_anchors_py(messy) == [
        ("/a/", "spaced anchor"),
        ("/c.css", ""),
    ]


def test_anchor_terms_rollup(runs):
    """anchor_terms == a serial recount over the pyref twin's edge log:
    per-dst-host lowercased whitespace terms, top-5 by (count desc,
    term)."""
    from collections import Counter

    from geocrawl_spark.canon import host_of
    from geocrawl_spark.frontier import anchor_terms

    eng, ref = runs
    counts: dict = {}
    for _, dst, _, anchor in ref.links:
        h = host_of(dst)
        for term in anchor.lower().split(" "):
            if term:
                counts.setdefault(h, Counter())[term] += 1
    want = []
    for h in sorted(counts):
        top = sorted(counts[h].items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        want += [
            (h, t, n, i + 1) for i, (t, n) in enumerate(top)
        ]
    got = [
        (r["host"], r["term"], r["n"], r["rank"])
        for r in anchor_terms(eng.spark, eng.io, k=5).collect()
    ]
    assert got == want and len(got) > 0


def test_real_edge_pagerank(runs):
    eng, _ = runs
    g = host_link_graph(eng.spark, eng.io)
    hosts = (
        g.select("u").union(g.select("v")).distinct().withColumnRenamed("u", "host")
    )
    pr = pagerank_integer(hosts, g)
    rows = {r["host"]: r["pagerank"] for r in pr.collect()}
    assert len(rows) > 0 and all(v > 0 for v in rows.values())
    # mass invariant: floor + dangling leakage only ever loses mass
    assert sum(rows.values()) <= 1.0 + 1e-9
    # deterministic: a second evaluation is bit-identical
    again = {r["host"]: r["pagerank"] for r in pagerank_integer(hosts, g).collect()}
    assert rows == again


def test_real_edge_hits(runs):
    """hits_integer over the engine's REAL logged link graph: L1 mass
    invariants (each score vector sums to <= 1.0, floor leakage only),
    positivity where expected, and bit-identical re-evaluation."""
    from geocrawl_spark.queries_pipeline import hits_integer

    eng, _ = runs
    g = host_link_graph(eng.spark, eng.io)
    hosts = (
        g.select("u").union(g.select("v")).distinct().withColumnRenamed("u", "host")
    )
    rows = {r["host"]: r for r in hits_integer(hosts, g).collect()}
    assert len(rows) > 0
    assert sum(r["authority"] for r in rows.values()) <= 1.0 + 1e-9
    assert sum(r["hub"] for r in rows.values()) <= 1.0 + 1e-9
    assert any(r["authority"] > 0 for r in rows.values())
    assert any(r["hub"] > 0 for r in rows.values())
    again = {r["host"]: r for r in hits_integer(hosts, g).collect()}
    assert {h: (r["authority"], r["hub"]) for h, r in rows.items()} == {
        h: (r["authority"], r["hub"]) for h, r in again.items()
    }
