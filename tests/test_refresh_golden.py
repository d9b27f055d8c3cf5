"""Golden tests for CrawlEngine.refresh (recrawl): after a drained
crawl, re-queue a deterministic url selection on BOTH the engine and the
pyref oracle, run the refresh rounds, and assert exact equality of the
continued ordering, per-round counters, host lineage, and the (unchanged)
seen set.  Also covers: the no-op contract (unknown/pending urls commit
nothing) and the abucket production mode (refresh needs no seen-store
write at all).
"""

import pytest

from geocrawl_spark import synth
from geocrawl_spark.frontier import COUNTER_KEYS, CrawlEngine
from geocrawl_spark.pyref import PyRefCrawl

N_PAGES, N_HOSTS = 80, 6


@pytest.fixture(scope="module")
def fixtures():
    return {
        "pages": synth.gen_pages(N_PAGES, N_HOSTS),
        "seeds": synth.gen_seeds(N_HOSTS),
        "robots": synth.gen_robots(N_HOSTS),
        "budget": synth.gen_hostbudget(N_HOSTS),
    }


def _mk_engine(spark, fixtures, tmpdir, mode):
    return CrawlEngine(
        spark,
        pages=spark.createDataFrame(
            fixtures["pages"],
            "url string, warc_ts timestamp, html binary, text string, lang string",
        ),
        seeds=spark.createDataFrame(fixtures["seeds"]),
        robots=spark.createDataFrame(
            fixtures["robots"], "host string, disallow array<string>, allow array<string>"
        ),
        hostbudget=spark.createDataFrame(fixtures["budget"]),
        base_dir=str(tmpdir),
        mode=mode,
        n_shards=4,
        salt=4,
        m_bits=1 << 18,
        k=7,
        n_buckets=4,
    )


def _refresh_selection(ref):
    """Deterministic refresh set: every 3rd fetched url, one missing url,
    plus an unknown url (must be ignored by both sides)."""
    fetched = sorted({u for _, _, u in ref.crawl_order})
    missing = sorted(
        u for u, row in ref.frontier.items() if row["status"] == "missing"
    )
    return fetched[::3] + missing[:1] + ["http://nowhere.example.org/x.html"]


def _frontier_order(ref):
    return sorted(
        (
            (row["fetch_round"], row["fetch_seq"], u)
            for u, row in ref.frontier.items()
            if row["status"] == "fetched"
        ),
    )


def _run_pair(spark, fixtures, tmpdir, mode):
    ref = PyRefCrawl(
        fixtures["pages"], fixtures["seeds"], fixtures["robots"], fixtures["budget"]
    )
    ref.run(max_rounds=50)
    eng = _mk_engine(spark, fixtures, tmpdir, mode)
    eng.run(max_rounds=50)
    assert eng.crawl_order() == ref.crawl_order  # pre-refresh baseline

    sel = _refresh_selection(ref)
    n_ref = ref.refresh(sel)
    n_eng = eng.refresh(spark.createDataFrame([(u,) for u in sel], "url string"))
    assert n_eng == n_ref > 0

    r_commit = eng.io.latest_round()
    eng_log = eng.run(max_rounds=30)
    ref_log, r = [], r_commit + 1
    while True:
        res = ref.run_round(r)
        if res is None:
            break
        ref_log.append({"round": r, **res})
        r += 1
    return ref, eng, eng_log, ref_log


def test_refresh_golden_exact(spark, fixtures, tmp_path_factory):
    ref, eng, eng_log, ref_log = _run_pair(
        spark, fixtures, tmp_path_factory.mktemp("refresh_exact"), "exact"
    )
    # the refresh actually took multiple rounds (politeness budgets bind)
    assert len(eng_log) >= 2
    got = [{"round": e["round"], **{k: e[k] for k in COUNTER_KEYS}} for e in eng_log]
    want = [{"round": e["round"], **{k: e[k] for k in COUNTER_KEYS}} for e in ref_log]
    assert got == want
    # refreshed pages' re-extracted links all dedupe against the seen set
    assert sum(e["deduped"] for e in eng_log) > 0
    # no new discoveries: refresh re-fetches, it does not re-admit
    assert sum(e["discovered"] for e in eng_log) == 0
    # final ordering: refreshed urls carry their NEW (round, seq); the
    # rest keep the original crawl's
    assert eng.crawl_order() == _frontier_order(ref)
    # seen set untouched by the whole refresh cycle
    assert eng.seen_urls() == ref.seen_urls()
    # engine-native stale selector matches the oracle twin: with the
    # cutoff at the refresh commit, exactly the NON-refreshed originals
    # are stale (refreshed urls carry recent fetch rounds)
    latest = eng.io.latest_round()
    age = latest - (min(e["round"] for e in eng_log) - 1)
    got_stale = sorted(r["url"] for r in eng.stale_urls(age).collect())
    want_stale = ref.stale_urls(age, latest)
    assert got_stale == want_stale
    assert 0 < len(got_stale) < len(ref.crawl_order)


def test_refresh_golden_abucket(spark, fixtures, tmp_path_factory):
    ref, eng, eng_log, ref_log = _run_pair(
        spark, fixtures, tmp_path_factory.mktemp("refresh_abucket"), "abucket"
    )
    got = [{"round": e["round"], **{k: e[k] for k in COUNTER_KEYS}} for e in eng_log]
    want = [{"round": e["round"], **{k: e[k] for k in COUNTER_KEYS}} for e in ref_log]
    assert got == want
    assert eng.crawl_order() == _frontier_order(ref)
    assert eng.seen_urls() == ref.seen_urls()


def test_refresh_noop_commits_nothing(spark, fixtures, tmp_path_factory):
    eng = _mk_engine(spark, fixtures, tmp_path_factory.mktemp("refresh_noop"), "exact")
    eng.run(max_rounds=50)
    before = eng.io.latest_round()
    # unknown url and a still-pending-impossible case: nothing matches
    n = eng.refresh(
        spark.createDataFrame([("http://nowhere.example.org/x.html",)], "url string")
    )
    assert n == 0
    assert eng.io.latest_round() == before  # no round committed


def test_refresh_resume_new_engine(spark, fixtures, tmp_path_factory):
    """H4 x recrawl: after a refresh commit, a BRAND-NEW engine instance
    (fresh driver state, manifest only) continues the recrawl to the
    identical ordering — the kill-between-refresh-and-repop window."""
    ref = PyRefCrawl(
        fixtures["pages"], fixtures["seeds"], fixtures["robots"], fixtures["budget"]
    )
    ref.run(max_rounds=50)
    d = tmp_path_factory.mktemp("refresh_resume")
    eng = _mk_engine(spark, fixtures, d, "exact")
    eng.run(max_rounds=50)
    sel = _refresh_selection(ref)
    n_ref = ref.refresh(sel)
    n_eng = eng.refresh(spark.createDataFrame([(u,) for u in sel], "url string"))
    assert n_eng == n_ref > 0
    r_commit = eng.io.latest_round()
    # "kill": abandon the first engine; a new one resumes from disk
    eng2 = _mk_engine(spark, fixtures, d, "exact")
    eng2.run(max_rounds=30)
    r = r_commit + 1
    while ref.run_round(r) is not None:
        r += 1
    assert eng2.crawl_order() == _frontier_order(ref)
    assert eng2.seen_urls() == ref.seen_urls()
