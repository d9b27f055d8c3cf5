"""Unit tests for the pipeline-resolution suite (queries_pipeline):
connected-components semantics, Gopher repetition edge cases on
hand-built corpora, integer-fixed-point PageRank invariants, and the
growth-stability contract of hash sampling / token sharding."""

import pytest
from pyspark.sql import functions as F

from geocrawl_spark.queries_pipeline import (
    _MIX_DEFAULT,
    _MIX_RATES,
    _PR_SCALE,
    _SHARD_TOKENS,
    _cc_min_label,
    _cc_star,
    dedup_clusters,
    dedup_clusters_star,
    gopher_repetition,
    host_pagerank,
    stratified_sample_hash,
    token_shard_assign,
)

SF001 = "/root/testdata/sf0.01"


def _docs_dir(spark, tmp_path, rows):
    """Write a hand-built documents table shaped like the driver's."""
    df = spark.createDataFrame(
        [(i, t, lang, f"src{i % 20}", len(t)) for i, (t, lang) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.parquet(out)
    return str(tmp_path)


# ---------------------------------------------------------------------------
# connected components
# ---------------------------------------------------------------------------

def test_cc_multi_hop_chain(spark):
    # 1-2-3 is a chain: node 3 never shares an edge with 1, only the
    # transitive closure assigns it label 1 (the A~B, B~C case the
    # docstring motivates); 4-5 is a separate component.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "doc_a long, doc_b long"
    )
    got = {
        (r["doc"], r["lab"]) for r in _cc_min_label(edges).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (4, 4), (5, 4)}


def test_cc_long_path_converges(spark):
    # a 12-node path needs ~11 propagation rounds — exercises the loop
    # (and the convergence witness) well past one iteration
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "doc_a long, doc_b long"
    )
    labels = _cc_min_label(edges).collect()
    assert all(r["lab"] == 0 for r in labels) and len(labels) == 13


def test_cc_star_parity_random_graph(spark):
    # deterministic random graph: 200 nodes, 150 edges (mixed component
    # shapes) — star contraction must agree with min-label propagation
    import random

    rng = random.Random(42)
    pairs = sorted(
        {tuple(sorted(rng.sample(range(200), 2))) for _ in range(150)}
    )
    edges = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    via_prop = {(r["doc"], r["lab"]) for r in _cc_min_label(edges).collect()}
    star_df, phases = _cc_star(edges)
    via_star = {(r["doc"], r["lab"]) for r in star_df.collect()}
    assert via_star == via_prop
    assert phases <= 12  # log-ish, not diameter-ish


def test_cc_star_deep_chain_fast(spark):
    # a 60-node path has diameter 59; star contraction must label it in
    # O(log^2 n) phases, nowhere near the propagation bound
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "doc_a long, doc_b long"
    )
    labels, phases = _cc_star(edges)
    rows = labels.collect()
    assert len(rows) == 61 and all(r["lab"] == 0 for r in rows)
    assert phases <= 14


def test_dedup_clusters_star_matches_propagation(spark):
    a = sorted(map(tuple, dedup_clusters(spark, SF001).collect()))
    b = sorted(map(tuple, dedup_clusters_star(spark, SF001).collect()))
    assert a == b


def test_dedup_clusters_invariants(spark):
    from geocrawl_spark.queries_ml import dedup_ngram_jaccard

    cc = dedup_clusters(spark, SF001).collect()
    by_cluster = {}
    for r in cc:
        by_cluster.setdefault(r["cluster"], []).append(r)
    for cid, members in by_cluster.items():
        ids = sorted(m["doc_id"] for m in members)
        # label is the min member, exactly one keeper, and it is that min
        assert cid == ids[0]
        keepers = [m for m in members if m["is_keeper"] == 1]
        assert len(keepers) == 1 and keepers[0]["doc_id"] == cid
        assert all(m["cluster_size"] == len(members) for m in members)
    # transitive soundness: every verified pair's endpoints co-cluster
    lab = {r["doc_id"]: r["cluster"] for r in cc}
    pairs = dedup_ngram_jaccard(spark, SF001).select("doc_a", "doc_b").collect()
    assert pairs, "no verified near-dup pairs at sf0.01"
    for p in pairs:
        assert lab[p["doc_a"]] == lab[p["doc_b"]]


# ---------------------------------------------------------------------------
# Gopher repetition filters
# ---------------------------------------------------------------------------

def test_gopher_repetition_edges(spark, tmp_path):
    sf = _docs_dir(
        spark,
        tmp_path,
        [
            ("spam spam spam spam spam spam", "en"),  # pure repetition
            # 40 distinct words: every 2-gram unique, top2g_frac small
            (" ".join(f"w{i:02d}token" for i in range(40)), "en"),
            ("one", "en"),  # shorter than any n-gram window
        ],
    )
    rows = {r["doc_id"]: r for r in gopher_repetition(spark, sf).collect()}
    assert rows[0]["keep"] == 0
    assert rows[0]["topword_frac"] == 1.0
    assert rows[0]["dup5g_frac"] > 0  # "spam spam spam spam spam" x2
    assert rows[1]["keep"] == 1
    assert rows[1]["dup5g_frac"] == 0.0
    # single-word doc: no 2/5-grams -> zero fracs, topword 1.0 -> dropped
    assert rows[2]["top2g_frac"] == 0.0 and rows[2]["dup5g_frac"] == 0.0
    assert rows[2]["keep"] == 0


def test_gopher_keep_both_classes_at_sf001(spark):
    # the thresholds must actually discriminate on the driver corpus —
    # an all-keep (or all-drop) result would be a vacuous filter
    agg = (
        gopher_repetition(spark, SF001)
        .groupBy("keep")
        .count()
        .collect()
    )
    counts = {r["keep"]: r["count"] for r in agg}
    assert set(counts) == {0, 1} and min(counts.values()) >= 10


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------

def test_pagerank_invariants(spark):
    rows = host_pagerank(spark, SF001).collect()
    ranks = [r["pagerank"] for r in rows]
    assert len(rows) == 20
    # integer floor-division leaks mass downward only, never upward,
    # and far less than one output ulp per node
    assert 0.99 <= sum(ranks) <= 1.0 + 1e-9
    # the graph is built skewed: a uniform vector means the iteration
    # did nothing (the vacuous-output failure mode)
    assert len(set(ranks)) >= 10
    # every rank carries at least the teleport mass floor
    assert min(ranks) >= (1 - 0.85) / 20 - 1e-6


def test_pagerank_deterministic(spark):
    a = sorted(map(tuple, host_pagerank(spark, SF001).collect()))
    b = sorted(map(tuple, host_pagerank(spark, SF001).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# sampling + sharding
# ---------------------------------------------------------------------------

def test_sample_stable_under_corpus_growth(spark, tmp_path):
    # the md5-threshold rule is per-doc: restricting the corpus must
    # restrict the sample (df.sample() has no such property)
    full = stratified_sample_hash(spark, SF001)
    full_ids = {r["doc_id"] for r in full.collect()}
    half_dir = tmp_path / "half"
    half_dir.mkdir()
    spark.read.parquet(f"{SF001}/documents.parquet").filter(
        F.col("doc_id") < 250
    ).write.parquet(str(half_dir / "documents.parquet"))
    half_ids = {
        r["doc_id"] for r in stratified_sample_hash(spark, str(half_dir)).collect()
    }
    assert half_ids == {i for i in full_ids if i < 250}


def test_sample_rates_and_weights(spark):
    d = spark.read.parquet(f"{SF001}/documents.parquet")
    totals = {r["lang"]: r["count"] for r in d.groupBy("lang").count().collect()}
    got = stratified_sample_hash(spark, SF001).collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in by_lang.items():
        rate = _MIX_RATES.get(lang, _MIX_DEFAULT)
        assert all(abs(r["weight"] - round(1.0 / rate, 4)) < 1e-9 for r in rows)
        # binomial(n, rate) within 4 sigma — deterministic given the salt,
        # the bound just documents the expected concentration
        n = totals[lang]
        sd = (n * rate * (1 - rate)) ** 0.5
        assert abs(len(rows) - n * rate) <= 4 * sd + 1


def test_token_shards_contiguous_and_bounded(spark):
    rows = token_shard_assign(spark, SF001).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r["doc_id"])
        # shards start at 0, are non-decreasing in doc order, and each
        # holds < budget tokens BEFORE its last doc (overflow <= 1 doc)
        assert rs[0]["shard"] == 0
        cum = 0
        for r in rs:
            assert r["shard"] == cum // _SHARD_TOKENS
            cum += r["n_tokens"]
        shards = {r["shard"] for r in rs}
        assert shards == set(range(max(shards) + 1))


def test_decontaminate_flags_only_overlap(spark, tmp_path):
    from geocrawl_spark.queries_pipeline import decontaminate_ngram

    sf = _docs_dir(
        spark,
        tmp_path,
        [
            # doc_id 0 % 97 == 0 -> benchmark member
            ("held out eval question about spark shuffles", "en"),
            # shares the 4-gram "eval question about spark"
            ("training doc repeating eval question about spark shuffles", "en"),
            ("completely different words with no overlap at all", "en"),
        ],
    )
    rows = {r["doc_id"]: r["n_shared_4grams"]
            for r in decontaminate_ngram(spark, sf).collect()}
    assert 1 in rows and rows[1] >= 1
    assert 2 not in rows and 0 not in rows  # benchmark docs never reported


def test_corpus_clean_reason_precedence(spark, tmp_path):
    from geocrawl_spark.queries_pipeline import corpus_clean

    common = " ".join(f"tok{i}word extra{i} filler{i}" for i in range(12))
    sf = _docs_dir(
        spark,
        tmp_path,
        [
            (common, "en"),                      # keeper of the dup pair
            (common, "en"),                      # EXACT dup of doc 0
            (common + " trailing variant", "en"),  # near-dup of doc 0
            ("spam spam spam spam spam spam spam", "en"),  # repetition
            (" ".join(f"w{i:02d}unique" for i in range(40)), "en"),  # clean
        ],
    )
    rows = {r["doc_id"]: r for r in corpus_clean(spark, sf).collect()}
    assert rows[1]["reason"] == "exact_dup" and rows[1]["kept"] == 0
    assert rows[2]["reason"] == "near_dup" and rows[2]["kept"] == 0
    assert rows[3]["reason"] == "repetition" and rows[3]["kept"] == 0
    assert rows[4]["reason"] == "ok" and rows[4]["kept"] == 1
    # the dup-pair keeper survives its own cluster
    assert rows[0]["reason"] in ("ok", "repetition")  # not a dup reason
    assert rows[0]["doc_id"] == 0


# ---------------------------------------------------------------------------
# freshness: recrawl scheduling + tiered refresh
# ---------------------------------------------------------------------------

def test_recrawl_estimator_math(spark, tmp_path):
    """Hand-built fetch log: a hot always-changing page observed long ago
    outranks (and is due before) a cold never-changing one; the integer
    estimator columns match by-hand arithmetic exactly."""
    import datetime as dt

    from geocrawl_spark.queries_pipeline import (
        _RECRAWL_DUE,
        recrawl_schedule,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    # page 1: 4 obs, every one a change, last seen day 1
    for i in range(4):
        rows.append((i, t0 + dt.timedelta(days=1, seconds=i), 1, "purchase", 0.0, "{}"))
    # page 2: 4 obs, zero changes, last seen day 1 (same age as page 1)
    for i in range(4):
        rows.append((10 + i, t0 + dt.timedelta(days=1, seconds=i), 2, "view", 0.0, "{}"))
    # page 3: 3 obs, one change, fetched again at day 10 (the horizon)
    rows.append((20, t0, 3, "purchase", 0.0, "{}"))
    rows.append((21, t0 + dt.timedelta(days=5), 3, "view", 0.0, "{}"))
    rows.append((22, t0 + dt.timedelta(days=10), 3, "view", 0.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    got = {r["page_id"]: r for r in recrawl_schedule(spark, str(tmp_path)).collect()}

    age = 9 * 86400 - 3  # horizon (day 10) - page 1/2 last obs (day 1 + 3 s)
    assert got[1]["change_millionths"] == 1_000_000
    assert got[1]["age_sec"] == age and got[1]["staleness"] == 1_000_000 * age
    assert got[1]["due"] == 1 and got[1]["staleness"] >= _RECRAWL_DUE
    # never-changed page: rate 0 -> staleness 0 regardless of age
    assert got[2]["change_millionths"] == 0
    assert got[2]["staleness"] == 0 and got[2]["due"] == 0
    # just-refetched page: age 0 -> staleness 0 even with changes
    assert got[3]["change_millionths"] == 333_333
    assert got[3]["age_sec"] == 0 and got[3]["due"] == 0


def test_recrawl_due_nonvacuous_at_sf001(spark):
    from geocrawl_spark.queries_pipeline import recrawl_schedule

    due = {
        r["due"]
        for r in recrawl_schedule(spark, SF001).select("due").distinct().collect()
    }
    assert due == {0, 1}  # threshold splits the corpus at test scale


def test_tier_cuts_and_refresh_map(spark):
    from geocrawl_spark.queries_pipeline import _TIER_REFRESH, crawl_tier_assign

    rows = crawl_tier_assign(spark, SF001).collect()
    n = len(rows)
    assert n == 20  # host dimension of the synthetic corpus
    assert sorted(r["rank"] for r in rows) == list(range(1, n + 1))
    by_tier = {}
    for r in rows:
        by_tier.setdefault(r["tier"], []).append(r)
        assert r["refresh_every_rounds"] == _TIER_REFRESH[r["tier"]]
    # top 20% / next 30% / tail split of 20 hosts
    assert {t: len(v) for t, v in by_tier.items()} == {0: 4, 1: 6, 2: 10}
    # tiers follow the ranking: every tier-0 rank < every tier-1 rank < ...
    assert max(r["rank"] for r in by_tier[0]) < min(r["rank"] for r in by_tier[1])
    assert max(r["rank"] for r in by_tier[1]) < min(r["rank"] for r in by_tier[2])


def test_spider_trap_flags_deep_hosts(spark):
    from geocrawl_spark.queries_pipeline import spider_trap_hosts

    rows = {r["host"]: r for r in spider_trap_hosts(spark, SF001).collect()}
    assert len(rows) == 12
    traps = {h for h, r in rows.items() if r["trap"] == 1}
    assert traps == {"host0", "host1"}  # exactly the deep /cal/ hosts
    for h, r in rows.items():
        if h in traps:
            assert r["avg_depth_millionths"] == 4_000_000  # /cal/y/m/d.html
        else:
            assert r["avg_depth_millionths"] == 2_000_000  # /p/N.html
            assert r["n_urls"] <= 30  # bounded shallow url space


# ---------------------------------------------------------------------------
# duplicated-span profile + BM25 retrieval
# ---------------------------------------------------------------------------

def test_dup_span_stats_hand_case(spark, tmp_path):
    from geocrawl_spark.queries_pipeline import _SPAN_W, dup_span_stats

    base = [f"w{i}" for i in range(_SPAN_W + 2)]  # 12 words -> 3 spans
    shared = " ".join(base)
    unique = " ".join(f"u{i}" for i in range(_SPAN_W))  # 10 words -> 1 span
    short = "too short"  # < _SPAN_W words -> no row
    sf = _docs_dir(
        spark,
        tmp_path,
        [(shared, "en"), (shared, "en"), (unique, "en"), (short, "en")],
    )
    rows = {r["doc_id"]: r for r in dup_span_stats(spark, sf).collect()}
    # doc 3 (short) emits nothing; docs 0/1 are full duplicates of each
    # other (every span duplicated); doc 2 is fully unique
    assert set(rows) == {0, 1, 2}
    for d in (0, 1):
        assert rows[d]["n_spans"] == 3
        assert rows[d]["dup_spans"] == 3
        assert rows[d]["dup_permille"] == 1000
    assert rows[2]["n_spans"] == 1
    assert rows[2]["dup_spans"] == 0
    assert rows[2]["dup_permille"] == 0


def test_dup_span_within_doc_repeat_counts(spark, tmp_path):
    # ExactSubstr semantics: a span repeated WITHIN one doc is duplicated
    from geocrawl_spark.queries_pipeline import _SPAN_W, dup_span_stats

    span = " ".join(f"r{i}" for i in range(_SPAN_W))
    text = span + " " + span  # 20 words; spans at pos 0 and 10 are equal
    sf = _docs_dir(spark, tmp_path, [(text, "en")])
    (row,) = dup_span_stats(spark, sf).collect()
    assert row["n_spans"] == _SPAN_W + 1
    assert row["dup_spans"] == 2  # only the two aligned copies collide
    assert row["dup_permille"] == (1000 * 2) // (_SPAN_W + 1)


def test_bm25_ranking_properties(spark, tmp_path):
    from geocrawl_spark.queries_pipeline import _BM25_K, _BM25_TERMS, bm25_topk

    filler = " ".join(["x"] * 30)
    rows = [
        ("spark spark spark join window merge " + filler, "en"),  # all terms
        ("spark " + filler, "en"),
        (filler, "en"),  # no terms -> never ranked
    ] + [(f"noise n{i} " + filler, "en") for i in range(5)]
    sf = _docs_dir(spark, tmp_path, rows)
    got = bm25_topk(spark, sf).collect()
    # only docs containing >=1 query term appear, rank is dense from 1
    assert [r["rnk"] for r in got] == list(range(1, len(got) + 1))
    assert len(got) == 2 and len(got) <= _BM25_K
    assert got[0]["doc_id"] == 0 and got[0]["n_terms"] == len(_BM25_TERMS)
    assert got[1]["doc_id"] == 1 and got[1]["n_terms"] == 1
    assert got[0]["score"] > got[1]["score"] > 0


def test_bm25_plan_shape(spark):
    # inverted-index contract: term filter sits on the exploded tokens
    # (not post-join), dims broadcast, top-k via TakeOrdered (no global
    # sort); the only row_number window runs AFTER the limit.
    from geocrawl_spark.queries_pipeline import bm25_topk

    plan = (
        bm25_topk(spark, SF001)._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert plan.count("Filter term") >= 2  # pushed into tf AND df branches


def test_dedup_incremental_decisions(spark, tmp_path):
    from geocrawl_spark.queries_pipeline import dedup_incremental

    tmpl = " ".join(f"t{i}" for i in range(30))
    rows = []
    # doc 0 (batch): identical to corpus doc 1 -> drop, match=1, jacc=1.0
    rows.append((tmpl, "en"))
    rows.append((tmpl, "en"))
    # docs 2..9 corpus noise (distinct vocab, no bands shared)
    for i in range(2, 10):
        rows.append((" ".join(f"c{i}_{k}" for k in range(20)), "en"))
    # doc 10 (batch): all-fresh vocab -> keep, no candidates
    rows.append((" ".join(f"f{k}" for k in range(20)), "en"))
    sf = _docs_dir(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in dedup_incremental(spark, sf).collect()}
    assert set(got) == {0, 10}  # only batch docs reported
    assert got[0]["keep"] == 0
    assert got[0]["best_match"] == 1
    assert got[0]["best_jacc_millionths"] == 1_000_000
    assert got[10]["keep"] == 1
    assert got[10]["n_candidates"] == 0
    # no-candidate sentinel is -1, not NULL: the output is null-free so the
    # driver's value hash can't diverge on engine-specific NULL renderings
    assert got[10]["best_match"] == -1
    assert got[10]["best_jacc_millionths"] == -1


def test_dedup_incremental_lsh_candidate_below_threshold_kept(spark, tmp_path):
    from geocrawl_spark.queries_pipeline import dedup_incremental

    # batch doc 0 shares a band-minimum shingle run with corpus doc 1
    # (common prefix) but true jaccard stays < 0.5 -> candidate, kept
    prefix = " ".join(f"p{i}" for i in range(8))
    rows = [
        (prefix + " " + " ".join(f"a{i}" for i in range(40)), "en"),
        (prefix + " " + " ".join(f"b{i}" for i in range(40)), "en"),
    ]
    sf = _docs_dir(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in dedup_incremental(spark, sf).collect()}
    r0 = got[0]
    if r0["n_candidates"] > 0:  # band collision depends on min-hash luck
        assert r0["best_jacc_millionths"] < 500_000
    assert r0["keep"] == 1


def test_length_quantiles_nearest_rank(spark, tmp_path):
    from geocrawl_spark.queries_pipeline import length_quantiles

    # en: lengths 10,20,30,40,50 (n=5): p50 -> rank 3 (30), p90 -> rank
    # 1+floor(4*0.9)=4 (40), p99 -> rank 4 (40); de: single doc -> all
    # quantiles equal its length
    rows = [("x" * k, "en") for k in (10, 20, 30, 40, 50)] + [("y" * 7, "de")]
    sf = _docs_dir(spark, tmp_path, rows)
    got = {r["lang"]: r for r in length_quantiles(spark, sf).collect()}
    assert got["en"]["n_docs"] == 5
    assert (got["en"]["p50"], got["en"]["p90"], got["en"]["p99"]) == (30, 40, 40)
    assert (got["de"]["p50"], got["de"]["p90"], got["de"]["p99"]) == (7, 7, 7)


def test_length_quantiles_approx_parity(spark):
    """Production-vs-reference parity (VERDICT r4 item 6): the one-pass
    approx_percentile operator's per-stratum RANK error vs the exact
    nearest-rank operator is bounded by 1 + n/accuracy (the documented
    sketch bound plus one rank of definitional slack between Spark's
    ceil(p*n) convention and nearest-rank 1+floor((n-1)p/100)).  Run at
    the real sf0.1 documents table so the bound is exercised on
    production-shaped strata, not a toy."""
    import duckdb

    from geocrawl_spark.queries_pipeline import (
        length_quantiles,
        length_quantiles_approx,
    )

    sf = "/root/testdata/sf0.1"
    exact = {r["lang"]: r for r in length_quantiles(spark, sf).collect()}
    approx = {r["lang"]: r for r in length_quantiles_approx(spark, sf).collect()}
    assert set(exact) == set(approx)

    # per-stratum sorted lengths (ground truth for rank positions)
    con = duckdb.connect()
    strata = {
        lang: lens
        for lang, lens in con.execute(
            "select lang, list(n_chars order by n_chars) from "
            f"read_parquet('{sf}/documents.parquet') group by lang"
        ).fetchall()
    }
    ACC = 10_000
    for lang, row in approx.items():
        lens = strata[lang]
        n = len(lens)
        assert row["n_docs"] == exact[lang]["n_docs"] == n
        for p in (50, 90, 99):
            v = row[f"p{p}"]
            target = 1 + ((n - 1) * p) // 100  # nearest-rank, 1-indexed
            # empirical rank band of v in the sorted stratum
            import bisect
            lo = bisect.bisect_left(lens, v) + 1
            hi = bisect.bisect_right(lens, v)
            tol = 1 + n // ACC
            dist = 0 if lo <= target <= hi else min(abs(lo - target), abs(hi - target))
            assert dist <= tol, (lang, p, v, target, lo, hi, n)
            # and the exact reference value sits at the target rank
            assert exact[lang][f"p{p}"] == lens[target - 1]


# ---------------------------------------------------------------------------
# unigram surprisal quality + source vocabulary novelty
# ---------------------------------------------------------------------------


def test_unigram_surprisal_hand_case(spark, tmp_path):
    from geocrawl_spark.queries_pipeline import unigram_surprisal

    # corpus: a x7, z x1, r0..r11 x1 -> N=20 tokens, ilog2 via bin length:
    # len(bin(20))=5, sbits(a)=5-len(bin(7))=2, sbits(singletons)=5-1=4
    rows = [
        ("a a a a", "en"),
        ("a a a z", "en"),
        (" ".join(f"r{i}" for i in range(12)), "en"),
    ]
    sf = _docs_dir(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in unigram_surprisal(spark, sf).collect()}
    assert got[0]["n_tokens"] == 4
    assert got[0]["mean_surprisal_millibits"] == 2000
    assert got[0]["max_surprisal_bits"] == 2
    assert got[0]["top10_permille"] == 1000
    assert got[0]["oov_tokens"] == 0
    # doc1: 3x a + 1x z -> (3*2 + 4) * 1000 // 4
    assert got[1]["mean_surprisal_millibits"] == 2500
    assert got[1]["max_surprisal_bits"] == 4
    # top10 by (f desc, tok asc): a + 9 lexicographically-first singletons
    # (r0, r1, r10, r11, r2..r6); z and r7..r9 are outside
    assert got[1]["top10_permille"] == 750
    assert got[2]["n_tokens"] == 12
    assert got[2]["mean_surprisal_millibits"] == 4000
    assert got[2]["top10_permille"] == 750  # 9 of 12 tokens in top-10


def test_source_vocab_novelty_hand_case(spark, tmp_path):
    from geocrawl_spark.queries_pipeline import source_vocab_novelty

    # _docs_dir: doc i -> source src{i%20}; three docs -> three sources
    rows = [
        ("a a a a", "en"),                             # src0 vocab {a}
        ("a a a z", "en"),                             # src1 vocab {a,z}
        (" ".join(f"r{i}" for i in range(12)), "en"),  # src2 vocab {r*}
    ]
    sf = _docs_dir(spark, tmp_path, rows)
    got = {r["source"]: r for r in source_vocab_novelty(spark, sf).collect()}
    assert got["src0"]["n_vocab"] == 1 and got["src0"]["n_unique"] == 0
    assert got["src0"]["novelty_permille"] == 0
    assert got["src1"]["n_vocab"] == 2 and got["src1"]["n_unique"] == 1
    assert got["src1"]["novelty_permille"] == 500
    assert got["src2"]["n_vocab"] == 12 and got["src2"]["n_unique"] == 12
    assert got["src2"]["novelty_permille"] == 1000


# ---------------------------------------------------------------------------
# CCNet-style buckets + PII scrub stats
# ---------------------------------------------------------------------------


def test_perplexity_bucket_assign_hand_case(spark, tmp_path):
    from geocrawl_spark.queries_pipeline import perplexity_bucket_assign

    # en scores (millibits): 1000 < 1750 < 2500 < 3250 < 4000 = 4000
    # (tie between d4/d5 broken by doc_id); de: 3000 < 3500 < 4000
    rows = [
        ("a a a a", "en"),
        ("a a a b1", "en"),
        ("a a b2 b3", "en"),
        ("a b4 b5 b6", "en"),
        ("b7 b8 b9 b10", "en"),
        ("b11 b12 b13 b14", "en"),
        ("x x", "de"),
        ("x y1", "de"),
        ("y2 y3", "de"),
    ]
    sf = _docs_dir(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in perplexity_bucket_assign(spark, sf).collect()}
    assert [got[i]["bucket"] for i in range(6)] == [
        "head", "head", "middle", "middle", "tail", "tail",
    ]
    assert got[4]["score"] == got[5]["score"] == 4000  # doc_id tie-break
    assert [got[i]["bucket"] for i in (6, 7, 8)] == ["head", "middle", "tail"]
    assert got[6]["lang"] == "de" and got[6]["score"] == 3000


def test_pii_scrub_stats_hand_case(spark, tmp_path):
    from geocrawl_spark.queries_pipeline import pii_scrub_stats

    d0 = "contact bob@example.com or alice.smith@mail.co.uk thanks"
    d1 = "server 192.168.0.1 call 555-123-4567 now"
    d2 = "no pii here at all"
    d3 = "+1 (415) 555 2671 is mine"
    sf = _docs_dir(
        spark, tmp_path, [(d0, "en"), (d1, "en"), (d2, "en"), (d3, "en")]
    )
    got = {r["doc_id"]: r for r in pii_scrub_stats(spark, sf).collect()}
    assert (got[0]["n_emails"], got[0]["n_phones"], got[0]["n_ipv4"]) == (2, 0, 0)
    assert got[0]["len_redacted"] == len("contact  or  thanks")
    assert (got[1]["n_emails"], got[1]["n_phones"], got[1]["n_ipv4"]) == (0, 1, 1)
    assert got[1]["len_redacted"] == len("server  call  now")
    assert (got[2]["n_emails"], got[2]["n_phones"], got[2]["n_ipv4"]) == (0, 0, 0)
    assert got[2]["len_redacted"] == got[2]["len_text"] == len(d2)
    assert got[3]["n_phones"] == 1
    assert got[3]["len_redacted"] == len(" is mine")


def test_pii_scrub_stats_cross_engine(spark, tmp_path):
    """The sf corpora contain no PII, so the driver's oracle row for
    pii_scrub_stats is all-zeros; this pins Spark (Java regex) ==
    DuckDB (RE2) on docs where the patterns actually FIRE."""
    import duckdb

    from geocrawl_spark.queries_pipeline import pii_scrub_stats
    from __spark_entry__ import oracle_sql

    rows = [
        ("contact bob@example.com or alice.smith@mail.co.uk thanks", "en"),
        ("server 192.168.0.1 call 555-123-4567 now", "en"),
        ("no pii here at all", "en"),
        ("+1 (415) 555 2671 is mine", "de"),
        ("a a 10.0.0.255 b@c.io overlap 8 800 123 4567 x", "de"),
    ]
    sf = _docs_dir(spark, tmp_path, rows)
    got = sorted(tuple(r) for r in pii_scrub_stats(spark, sf).collect())
    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"'{sf}/documents.parquet/*.parquet'"
    )
    want = sorted(con.execute(oracle_sql()["pii_scrub_stats"]).fetchall())
    assert got == want


# ---------------------------------------------------------------------------
# HITS + bucket-weighted mixture sampling
# ---------------------------------------------------------------------------


def test_hits_integer_star_graph(spark):
    """k spokes all linking one hub-target: the target takes ALL
    authority mass; the spokes split hub mass evenly; the target's own
    hub score is 0 (it links nowhere)."""
    from geocrawl_spark.queries_pipeline import hits_integer

    hosts = spark.createDataFrame(
        [("a",), ("s1",), ("s2",), ("s3",), ("s4",)], "host string"
    )
    edges = spark.createDataFrame(
        [("s1", "a"), ("s2", "a"), ("s3", "a"), ("s4", "a")], "u string, v string"
    )
    got = {r["host"]: r for r in hits_integer(hosts, edges).collect()}
    assert got["a"]["authority"] == 1.0 and got["a"]["hub"] == 0.0
    for sp in ("s1", "s2", "s3", "s4"):
        assert got[sp]["authority"] == 0.0
        assert got[sp]["hub"] == 0.25


def test_quality_mixture_sample_rates(spark):
    """head is kept outright; middle/tail keep-rates land near 0.5/0.1
    (md5 draw over ~167 docs per en bucket at sf0.01); kept is emitted
    for every doc."""
    from geocrawl_spark.queries_pipeline import quality_mixture_sample

    rows = quality_mixture_sample(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 500
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r["kept"])
    assert set(by_bucket["head"]) == {1}
    mid = sum(by_bucket["middle"]) / len(by_bucket["middle"])
    tail = sum(by_bucket["tail"]) / len(by_bucket["tail"])
    assert 0.35 <= mid <= 0.65, mid
    assert 0.0 <= tail <= 0.25, tail


# ---------------------------------------------------------------------------
# hashed linear quality classifier
# ---------------------------------------------------------------------------


def _py_clf_weight(feat: str) -> int:
    """Python recomputation of _clf_weight_expr for hand cases."""
    import hashlib

    return int(hashlib.md5(feat.encode()).hexdigest()[:4], 16) % 2001


def test_quality_classifier_hand_case(spark, tmp_path):
    """Single- and three-word docs: feature set is words + bigrams, the
    score is the centered integer mean of the md5-derived weights —
    recomputed independently in plain Python here."""
    from geocrawl_spark.queries_pipeline import quality_classifier_score

    rows = [("alpha", "en"), ("alpha beta gamma", "en")]
    sf = _docs_dir(spark, tmp_path, rows)
    got = {r["doc_id"]: r for r in quality_classifier_score(spark, sf).collect()}

    w_a = _py_clf_weight("alpha")
    assert got[0]["n_feats"] == 1
    assert got[0]["score_milli"] == 1000 * w_a - 1000000
    assert got[0]["label"] == ("keep" if 1000 * w_a >= 1000000 else "drop")

    feats = ["alpha", "beta", "gamma", "alpha beta", "beta gamma"]
    s = sum(_py_clf_weight(f) for f in feats)
    assert got[1]["n_feats"] == 5
    assert got[1]["score_milli"] == (1000 * s) // 5 - 1000000
    assert got[1]["label"] == (
        "keep" if (1000 * s) // 5 >= 1000000 else "drop"
    )


def test_quality_classifier_both_labels_fire(spark):
    """At sf0.01 both keep and drop decisions occur (the threshold sits
    inside the score distribution, not past its tails) and every score
    respects the [-10^6, 10^6] bound of a [0, 2000]-milli weight mean."""
    from geocrawl_spark.queries_pipeline import quality_classifier_score

    rows = quality_classifier_score(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 500
    labels = {r["label"] for r in rows}
    assert labels == {"keep", "drop"}
    for r in rows:
        assert -1000000 <= r["score_milli"] <= 1000000
        assert (r["label"] == "keep") == (r["score_milli"] >= 0)


# ---------------------------------------------------------------------------
# curation reports: threshold sweep, cluster histogram, source gini
# ---------------------------------------------------------------------------

def test_dedup_threshold_sweep_hand_case(spark, tmp_path):
    from geocrawl_spark.queries_pipeline import (
        _SWEEP_PPM,
        dedup_threshold_sweep,
    )

    # A-triple: identical (jaccard 1.0, 3 pairs); B~C share 7 of 9
    # distinct 3-gram shingles (jppm = 777777 -> counted at <= 0.7
    # thresholds only); D is unrelated vocabulary
    a = "a b c d e f g h"
    b = "p q r s t u v w x y"
    c = "p q r s t u v w x z"
    d = "m1 m2 m3 m4 m5 m6 m7"
    sf = _docs_dir(spark, tmp_path, [(t, "en") for t in (a, a, a, b, c, d)])
    got = {
        r["thr_ppm"]: (r["n_pairs"], r["n_docs"])
        for r in dedup_threshold_sweep(spark, sf).collect()
    }
    assert sorted(got) == sorted(_SWEEP_PPM)  # zero rows never vanish
    assert got[500_000] == (4, 5)
    assert got[600_000] == (4, 5)
    assert got[700_000] == (4, 5)
    assert got[800_000] == (3, 3)
    assert got[900_000] == (3, 3)
    # monotone: raising the threshold can only shed pairs/docs
    seq = [got[t] for t in sorted(got)]
    assert all(x >= y for x, y in zip(seq, seq[1:]))


def test_cluster_size_histogram_hand_case(spark, tmp_path):
    from geocrawl_spark.queries_pipeline import cluster_size_histogram

    a = "a b c d e f g h"
    b = "p q r s t u v w x y"
    c = "p q r s t u v w x z"
    d = "m1 m2 m3 m4 m5 m6 m7"
    sf = _docs_dir(spark, tmp_path, [(t, "en") for t in (a, a, a, b, c, d)])
    got = {
        r["cluster_size"]: (r["n_clusters"], r["n_docs"], r["n_docs_removed"])
        for r in cluster_size_histogram(spark, sf).collect()
    }
    # {A1,A2,A3} is a size-3 clique, {B,C} a size-2 pair; D untouched
    # (never appears — trivially a keeper)
    assert got == {2: (1, 2, 1), 3: (1, 3, 2)}


def test_source_gini_balanced_and_skewed(spark, tmp_path):
    from geocrawl_spark.queries_pipeline import source_gini

    def mk(counts, sub):
        rows = []
        i = 0
        for s, n in enumerate(counts):
            for _ in range(n):
                rows.append((i, f"w{i} x y z", "en", f"src{s}", 10))
                i += 1
        df = spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        out = tmp_path / sub
        df.coalesce(1).write.parquet(str(out / "documents.parquet"))
        return str(out)

    bal = source_gini(spark, mk([5, 5, 5, 5], "bal")).collect()[0]
    assert (bal["gini_permille"], bal["n_sources"], bal["n_docs"]) == (0, 4, 20)
    # counts [1,1,1,17]: G = (2*74 - 5*20) / (4*20) = 48/80 -> 600 permille
    sk = source_gini(spark, mk([1, 1, 1, 17], "skew")).collect()[0]
    assert (sk["gini_permille"], sk["n_sources"], sk["n_docs"]) == (600, 4, 20)


# ---------------------------------------------------------------------------
# Gopher rule gate + topic-balance report
# ---------------------------------------------------------------------------

def test_gopher_quality_flags_each_rule_fires(spark, tmp_path):
    from geocrawl_spark.queries_pipeline import gopher_quality_flags

    import itertools
    import string

    two = [  # distinct 2-char tokens, no stopword collisions
        a + b for a, b in itertools.product(string.ascii_lowercase, repeat=2)
        if a + b not in ("be", "to", "of")
    ]
    docs = [
        # 0: passes every rule (60 words, 2 stopwords, all distinct,
        #    long words, one short token)
        "the of " + " ".join(f"word{i}" for i in range(58)),
        # 1: word count < 50, everything else fine
        "the of word1 word2 word3",
        # 2: mean word length < 3 (2-char soup)
        "the of " + " ".join(two[:58]),
        # 3: zero Gopher stopwords
        " ".join(f"word{i}" for i in range(60)),
        # 4: distinct-word ratio < 0.3 (one word repeated 58x)
        "the of " + " ".join(["same"] * 58),
        # 5: >50% short tokens but mean length still >= 3
        "the of " + " ".join(two[:40]) + " "
        + " ".join(f"longword{i}" for i in range(18)),
    ]
    sf = _docs_dir(spark, tmp_path, [(t, "en") for t in docs])
    got = {r["doc_id"]: r.asDict() for r in
           gopher_quality_flags(spark, sf).collect()}
    assert got[0]["keep"] == 1
    assert got[1]["flag_word_count"] == 0 and got[1]["keep"] == 0
    assert got[2]["flag_word_len"] == 0 and got[2]["keep"] == 0
    assert got[3]["flag_stopwords"] == 0 and got[3]["keep"] == 0
    assert got[4]["flag_distinct"] == 0 and got[4]["keep"] == 0
    assert got[5]["flag_short_tokens"] == 0 and got[5]["keep"] == 0
    # keep is exactly the conjunction of the five flags, every row
    for r in got.values():
        flags = [r["flag_word_count"], r["flag_word_len"],
                 r["flag_stopwords"], r["flag_distinct"],
                 r["flag_short_tokens"]]
        assert r["keep"] == int(all(flags))


def test_topic_source_mix_invariants(spark):
    from geocrawl_spark.queries_pipeline import topic_source_mix

    rows = topic_source_mix(spark, SF001).collect()
    assert rows
    by_cid = {}
    for r in rows:
        by_cid.setdefault(r["cid"], []).append(r)
    total = 0
    for cid, rs in by_cid.items():
        cluster_docs = rs[0]["cluster_docs"]
        assert all(r["cluster_docs"] == cluster_docs for r in rs)
        assert sum(r["n_docs"] for r in rs) == cluster_docs
        total += cluster_docs
        # floor(1000 * n/t) shares: sum in (1000 - n_sources, 1000]
        s = sum(r["share_permille"] for r in rs)
        assert 1000 - len(rs) < s <= 1000
        for r in rs:
            assert r["share_permille"] == (1000 * r["n_docs"]) // cluster_docs
    # every embedded doc lands in exactly one cluster row
    assert total == 500


# ---------------------------------------------------------------------------
# BPE pair statistics + source overlap matrix
# ---------------------------------------------------------------------------

def test_bpe_pair_counts_hand_case(spark, tmp_path):
    from geocrawl_spark.queries_pipeline import bpe_pair_counts

    # vocab: ab x2, cab x1 ->
    #   ab_: pairs (ab, b_) each weight 2
    #   cab_: pairs (ca, ab, b_) each weight 1
    sf = _docs_dir(spark, tmp_path, [("ab ab cab", "en")])
    got = {r["pair"]: r for r in bpe_pair_counts(spark, sf).collect()}
    assert got["ab"]["pair_count"] == 3 and got["ab"]["n_words"] == 2
    assert got["b_"]["pair_count"] == 3 and got["b_"]["n_words"] == 2
    assert got["ca"]["pair_count"] == 1 and got["ca"]["n_words"] == 1
    assert set(got) == {"ab", "b_", "ca"}


def test_bpe_pair_counts_repeated_pair_in_word(spark, tmp_path):
    from geocrawl_spark.queries_pipeline import bpe_pair_counts

    # "aaa" contributes the pair "aa" TWICE per occurrence (positions
    # 1 and 2) — occurrence counting, not distinct-pairs-per-word.
    sf = _docs_dir(spark, tmp_path, [("aaa aaa", "en")])
    got = {r["pair"]: r for r in bpe_pair_counts(spark, sf).collect()}
    assert got["aa"]["pair_count"] == 4 and got["aa"]["n_words"] == 1
    assert got["a_"]["pair_count"] == 2


def test_source_overlap_matrix_hand_case(spark, tmp_path):
    from geocrawl_spark.queries_pipeline import source_overlap_matrix

    # _docs_dir: doc i -> source src{i%20}.  T duplicated at docs 0, 1,
    # and 20 -> verified pairs (0,1) src0xsrc1, (0,20) src0xsrc0 (the
    # intra-source template cell), (1,20) src0xsrc1.  Fillers are
    # 2-word docs (no 3-gram shingles, so no spurious pairs).
    T = " ".join(f"w{i}" for i in range(12))
    rows = [(T, "en"), (T, "en")]
    rows += [(f"x{i} y{i}", "en") for i in range(18)]  # docs 2..19
    rows.append((T, "en"))  # doc 20 -> src0
    sf = _docs_dir(spark, tmp_path, rows)
    got = {
        (r["src_a"], r["src_b"]): r
        for r in source_overlap_matrix(spark, sf).collect()
    }
    assert set(got) == {("src0", "src0"), ("src0", "src1")}
    assert got[("src0", "src0")]["n_pairs"] == 1
    assert got[("src0", "src0")]["n_docs"] == 2
    assert got[("src0", "src1")]["n_pairs"] == 2
    assert got[("src0", "src1")]["n_docs"] == 3


def test_bigram_pmi_hand_case(spark, tmp_path):
    from geocrawl_spark.queries_pipeline import bigram_pmi_top

    # tokens: x*5 y*5 z*1 -> N=11; bigrams: (x,y)*5, (y,x)*4 -> N_b=9;
    # (y,x) is under _PMI_MIN_C and dropped.  The 1-word doc "z"
    # exercises the sequence(1, 0) guard.
    # pmi(x,y) = ilog2(5) + 2*ilog2(11) - ilog2(9) - ilog2(5) - ilog2(5)
    #          = 2 + 6 - 3 - 2 - 2 = 1  (true PMI: log2((5/9)/(25/121))
    #          = 1.43 bits)
    rows = [("x y x y x y x y x y", "en"), ("z", "en")]
    sf = _docs_dir(spark, tmp_path, rows)
    got = bigram_pmi_top(spark, sf).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["w1"], r["w2"], r["c_ab"], r["pmi_bits"]) == ("x", "y", 5, 1)


def test_host_dup_stats_hand_case(spark, tmp_path):
    from geocrawl_spark.queries_pipeline import host_dup_stats

    # _docs_dir: doc i -> src{i % 20}.  Build src0 as a mirror: docs 0,
    # 20, 40, 60 where 20/40/60 copy doc 0's text and doc 60 copies doc
    # 21's (src1) text?  Simpler: 4 docs on src0 (0,20,40,60): 0 unique,
    # 20 and 40 copy doc 0 -> dups, 60 unique => n_docs=4, n_dup=2,
    # quarantined (2*2 >= 4).  src1 (doc 1, 21): doc 21 copies doc 1 ->
    # n_docs=2 n_dup=1, NOT quarantined (n_docs < 4 min guard).
    rows = []
    for i in range(61):
        rows.append((f"filler text {i}", "en"))
    rows[0] = ("the mirrored page", "en")
    rows[20] = ("the mirrored page", "en")
    rows[40] = ("the mirrored page", "en")
    rows[60] = ("unique tail page", "en")
    rows[1] = ("src one page", "en")
    rows[21] = ("src one page", "en")
    sf = _docs_dir(spark, tmp_path, rows)
    got = {r["source"]: r for r in host_dup_stats(spark, sf).collect()}
    assert got["src0"]["n_docs"] == 4 and got["src0"]["n_dup"] == 2
    assert got["src0"]["dup_permille"] == 500
    assert got["src0"]["quarantined"] == 1
    assert got["src1"]["n_docs"] == 3 and got["src1"]["n_dup"] == 1
    assert got["src1"]["quarantined"] == 0  # under the n_docs >= 4 guard


def test_langid_confusion_hand_case(spark, tmp_path):
    from geocrawl_spark.queries_pipeline import langid_confusion

    rows = [
        ("the cat and the hat", "en"),        # en guessed en
        ("el gato y la casa", "en"),          # mislabeled: en -> es
        ("xyzzy plugh", "de"),                # de -> unknown
        ("the dog of a man", "en"),           # en guessed en
    ]
    sf = _docs_dir(spark, tmp_path, rows)
    got = {
        (r["lang"], r["guess"]): (r["n"], r["lang_docs"], r["permille"])
        for r in langid_confusion(spark, sf).collect()
    }
    assert got[("en", "en")] == (2, 3, 666)
    assert got[("en", "es")] == (1, 3, 333)
    assert got[("de", "unknown")] == (1, 1, 1000)
    assert set(got) == {("en", "en"), ("en", "es"), ("de", "unknown")}


# ---------------------------------------------------------------------------
# winnowing fingerprints
# ---------------------------------------------------------------------------

def test_winnow_shared_run_guarantee(spark, tmp_path):
    # Winnowing guarantee (SIGMOD'03): documents sharing a run of at
    # least K + W - 1 = 8 tokens share at least one selected
    # fingerprint, REGARDLESS of where the run sits in each doc.
    from geocrawl_spark.queries_pipeline import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (shared + " tail1 tail2 tail3 filler4 filler5", "en"),
        ("lead1 lead2 lead3 other4 other5 " + shared, "en"),
        ("unrelated words only here nothing matches at all ok fine", "en"),
    ]
    sf = _docs_dir(spark, tmp_path, rows)
    got = {r["doc_id"]: r.asDict() for r in winnow_fingerprints(spark, sf).collect()}
    assert got[0]["shared_fp"] >= 1
    assert got[1]["shared_fp"] >= 1
    assert got[2]["shared_fp"] == 0


def test_winnow_density_and_short_doc(spark, tmp_path):
    from geocrawl_spark.queries_pipeline import (
        _WINNOW_K,
        _WINNOW_W,
        winnow_fingerprints,
    )

    # all-distinct tokens -> all-distinct grams (a repeating token
    # cycle would be a genuine self-duplication that winnowing collapses)
    long_doc = " ".join(f"tok{i}" for i in range(200))
    rows = [
        (long_doc, "en"),
        ("too short", "en"),  # < K tokens: no grams, excluded
        (" ".join(f"w{i}" for i in range(_WINNOW_K + _WINNOW_W - 2)), "en"),
        # exactly K+W-2 tokens -> ngrams = W-1 < W: no window, excluded
    ]
    sf = _docs_dir(spark, tmp_path, rows)
    out = {r["doc_id"]: r.asDict() for r in winnow_fingerprints(spark, sf).collect()}
    assert set(out) == {0}
    r0 = out[0]
    assert r0["n_grams"] == 200 - _WINNOW_K + 1
    assert r0["n_windows"] == r0["n_grams"] - _WINNOW_W + 1
    # density ~ 2/(W+1) = 333 permille; window-min selection can never
    # pick more than one fingerprint per window nor fewer than 1/W
    assert 1000 // _WINNOW_W <= r0["density_permille"] <= 1000
    assert r0["n_fingerprints"] <= r0["n_windows"]


# ---------------------------------------------------------------------------
# integer TF-IDF top terms
# ---------------------------------------------------------------------------

def test_tfidf_topterms_ranks_rare_over_common(spark, tmp_path):
    from geocrawl_spark.queries_pipeline import tfidf_topterms

    # "common" appears in every doc (df=4 -> idf 0 bits with N=4);
    # "rare0" only in doc 0 (df=1 -> idf = ilog2(4) = 2 bits).
    rows = [
        ("common common common rare0 mid", "en"),
        ("common mid x1 x2 x3", "en"),
        ("common y1 y2 y3 y4", "en"),
        ("common z1 z2 z3 z4", "en"),
    ]
    sf = _docs_dir(spark, tmp_path, rows)
    out = tfidf_topterms(spark, sf).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    top0 = by_doc[0][0]
    # rare0: tf=1, score = 1 * (len(bin(4)) - len(bin(1))) = 2
    # common: tf=3, score = 3 * (len(bin(4)) - len(bin(4))) = 0
    # mid: df=2, score = 1 * 1 = 1 -> rare0 wins despite tf=1
    assert top0["term"] == "rare0" and top0["score_bits"] == 2
    assert [r["rk"] for r in by_doc[0]] == [1, 2, 3]
    for rows_ in by_doc.values():
        assert len(rows_) <= 3


def test_tfidf_topterms_tie_breaks_on_term(spark, tmp_path):
    from geocrawl_spark.queries_pipeline import tfidf_topterms

    rows = [("bbb aaa ccc", "en"), ("other words here", "en")]
    sf = _docs_dir(spark, tmp_path, rows)
    out = [r for r in tfidf_topterms(spark, sf).collect() if r["doc_id"] == 0]
    # all three terms tie (tf=1, df=1): alphabetical order decides
    assert [r["term"] for r in out] == ["aaa", "bbb", "ccc"]


# ---------------------------------------------------------------------------
# source_drift_ks / term_source_lift (drift monitoring + domain signatures)
# ---------------------------------------------------------------------------

def test_drift_ks_zero_when_sources_identical(spark, tmp_path):
    from geocrawl_spark.queries_pipeline import source_drift_ks

    # every source gets the same two lengths -> per-source CDF == corpus
    # CDF at every grid point -> KS is exactly 0 for all 20 sources
    rows = [("x" * 30, "en") if i < 20 else ("y" * 120, "en") for i in range(40)]
    sf = _docs_dir(spark, tmp_path, rows)
    out = source_drift_ks(spark, sf).collect()
    assert len(out) == 20
    assert all(r["ks_millionths"] == 0 for r in out)
    assert all(r["n_docs"] == 2 for r in out)


def test_drift_ks_flags_shifted_source(spark, tmp_path):
    from geocrawl_spark.queries_pipeline import source_drift_ks

    # src0 (indices 0 and 20) gets 300-char docs; the other 19 sources get
    # 10-char docs.  At the first grid point (chars <= 49): CDF_src0 = 0/2,
    # CDF_corpus = 38/40 -> |0*40 - 38*2| = 76, ks = 76e6 // (2*40) = 950000
    rows = [
        ("z" * 300, "en") if i % 20 == 0 else ("s" * 10, "en")
        for i in range(40)
    ]
    sf = _docs_dir(spark, tmp_path, rows)
    out = {r["source"]: r for r in source_drift_ks(spark, sf).collect()}
    assert out["src0"]["ks_millionths"] == 950_000
    assert out["src0"]["grid_hi"] == 49
    # the un-shifted sources still drift slightly (src0 pulls the corpus
    # CDF down by 2/40): |2*40 - 38*2| = 4 -> 4e6 // 80 = 50000
    assert out["src1"]["ks_millionths"] == 50_000


def test_drift_ks_bounds_and_grid_at_sf001(spark):
    from geocrawl_spark.queries_pipeline import (
        _KS_CLAMP,
        _KS_STEP,
        source_drift_ks,
    )

    out = source_drift_ks(spark, SF001).collect()
    assert len(out) == 20
    for r in out:
        assert 0 <= r["ks_millionths"] <= 1_000_000
        assert r["grid_hi"] % _KS_STEP == _KS_STEP - 1
        assert 0 < r["grid_hi"] <= _KS_CLAMP


def test_term_lift_finds_exclusive_token(spark, tmp_path):
    from geocrawl_spark.queries_pipeline import _LIFT_TOPK, term_source_lift

    # "zebra" appears 10x, all in src0 (clears the _LIFT_MIN_R=10 gate and
    # is maximally over-represented there); filler is corpus-uniform
    rows = [
        ("zebra " * 5 + "the the the", "en") if i % 20 == 0
        else ("the the the", "en")
        for i in range(40)
    ]
    sf = _docs_dir(spark, tmp_path, rows)
    out = term_source_lift(spark, sf).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    top0 = sorted(by_src["src0"], key=lambda r: r["rk"])[0]
    assert top0["term"] == "zebra" and top0["n_in_source"] == 10
    assert top0["lift_millis"] > 2000  # strongly over-represented
    for rows_ in by_src.values():
        assert len(rows_) <= _LIFT_TOPK
        assert all(r["lift_millis"] > 0 for r in rows_)
        assert sorted(r["rk"] for r in rows_) == list(
            range(1, len(rows_) + 1)
        )
    # "zebra" never ranks for sources that don't contain it
    for src, rows_ in by_src.items():
        if src != "src0":
            assert all(r["term"] != "zebra" for r in rows_)


def test_term_lift_rare_tokens_gated(spark, tmp_path):
    from geocrawl_spark.queries_pipeline import term_source_lift

    # "unicorn" appears only 3x (< _LIFT_MIN_R): excluded from ranking
    # even though its within-source lift would be huge
    rows = [
        ("unicorn unicorn unicorn " + "the " * 20, "en") if i == 0
        else ("the " * 20, "en")
        for i in range(40)
    ]
    sf = _docs_dir(spark, tmp_path, rows)
    out = term_source_lift(spark, sf).collect()
    assert all(r["term"] != "unicorn" for r in out)


def test_drift_and_lift_plan_shapes(spark):
    """source_drift_ks: the grid fill, global-CDF, and total-count
    tables are tiny by construction, so every join must be broadcast —
    no SortMergeJoin.  term_source_lift: the vocab/total dims are
    broadcast (2 BroadcastHashJoin + the scalar-total nested-loop); the
    only tok-keyed exchange is over the already-thinned (source, tok)
    aggregate (<= |sources| rows per token — skew-immune), never over
    raw token volume."""
    from geocrawl_spark.queries_pipeline import source_drift_ks, term_source_lift

    plan = (
        source_drift_ks(spark, SF001)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # load-bearing invariants only (ADVICE r5: exact join/exchange
    # counts were planner-version-sensitive): every dim join broadcast,
    # never a sort-merge join
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 1

    plan = (
        term_source_lift(spark, SF001)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 1
    # the exploded-token aggregation always keys on (source, tok); any
    # tok-only exchange is the global-rate rollup over that thinned
    # aggregate (<= |sources| x V rows), never the raw explode — so at
    # least one (source, tok)-keyed exchange must precede it and the
    # tok-only exchanges stay few
    ex = [
        ln for ln in plan.splitlines()
        if "Exchange hashpartitioning(tok" in ln
    ]
    assert len(ex) <= 2


def test_blocklist_hand_counts(spark, tmp_path):
    from geocrawl_spark.queries_pipeline import blocklist_filter_stats

    # doc 0: 2/10 flagged (200000 ppm) -> drop; doc 1: 0/4 -> keep;
    # doc 2: exactly at 10% (1/10) -> 100000 ppm == threshold -> drop
    rows = [
        ("slow dup a b c d e f g h", "en"),
        ("clean words only here", "en"),
        ("big a b c d e f g h i", "en"),
    ]
    sf = _docs_dir(spark, tmp_path, rows)
    out = {r["doc_id"]: r for r in blocklist_filter_stats(spark, sf).collect()}
    assert out[0]["n_flagged"] == 2 and out[0]["ratio_ppm"] == 200_000
    assert out[0]["keep"] == 0
    assert out[1]["n_flagged"] == 0 and out[1]["keep"] == 1
    assert out[2]["ratio_ppm"] == 100_000 and out[2]["keep"] == 0


def test_blocklist_both_classes_and_plan_at_sf001(spark):
    from geocrawl_spark.queries_pipeline import blocklist_filter_stats

    df = blocklist_filter_stats(spark, SF001)
    keeps = {r["keep"] for r in df.collect()}
    assert keeps == {0, 1}  # the threshold splits the synthetic corpus
    plan = df._jdf.queryExecution().executedPlan().toString()
    # zero-shuffle contract: single scan, per-row codegen, the only
    # exchange is the presentation ORDER BY's range partitioning
    assert "Exchange hashpartitioning" not in plan
    assert "Join" not in plan


def test_vocab_jaccard_hand_case(spark, tmp_path):
    from geocrawl_spark.queries_pipeline import vocab_jaccard_matrix

    # src0: {"a b","b c"}; src1: {"a b","b d"}; src2: {"x y","y z"}
    # (src0,src1): 1 shared / 3 union -> 333333 ppm; src2 overlaps
    # nothing -> its pairs are absent (sparse triangle)
    rows = [("a b c", "en"), ("a b d", "en"), ("x y z", "en")]
    sf = _docs_dir(spark, tmp_path, rows)
    out = vocab_jaccard_matrix(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["source_a"], r["source_b"]) == ("src0", "src1")
    assert r["n_shared"] == 1 and r["vocab_a"] == 2 and r["vocab_b"] == 2
    assert r["jaccard_ppm"] == 333_333


def test_vocab_jaccard_invariants_at_sf001(spark):
    from geocrawl_spark.queries_pipeline import vocab_jaccard_matrix

    out = vocab_jaccard_matrix(spark, SF001).collect()
    # 20 sources, every pair overlaps on this corpus: full triangle
    assert len(out) == 190
    for r in out:
        assert r["source_a"] < r["source_b"]  # upper triangle only
        assert 0 < r["jaccard_ppm"] <= 1_000_000
        assert r["n_shared"] <= min(r["vocab_a"], r["vocab_b"])


def test_gate_agreement_partitions_the_corpus(spark):
    from geocrawl_spark.queries_pipeline import quality_gate_agreement

    out = quality_gate_agreement(spark, SF001).collect()
    # cells partition the corpus exactly; keys are binary; the matrix
    # is sorted by its four keys (the output contract)
    assert sum(r["n_docs"] for r in out) == 500
    keys = [
        (r["rep_keep"], r["flags_keep"], r["block_keep"], r["clf_keep"])
        for r in out
    ]
    assert keys == sorted(keys) and len(set(keys)) == len(keys)
    assert all(set(k) <= {0, 1} for k in keys)
    # marginals must match the source gates exactly (the reuse contract)
    from geocrawl_spark.queries_pipeline import gopher_repetition

    rep_keep_docs = sum(
        r["n_docs"] for r in out if r["rep_keep"] == 1
    )
    direct = gopher_repetition(spark, SF001).filter("keep = 1").count()
    assert rep_keep_docs == direct
