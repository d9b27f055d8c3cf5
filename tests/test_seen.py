"""Sharded seen-filter: Spark cogroup pass vs PySeenFilter twin; bloom
no-false-negative and FPR-bound properties."""

import pandas as pd
import pytest

from geocrawl_spark.seen import PySeenFilter, filter_and_update, init_shards


def _urls(n, prefix="http://h.org/p/"):
    return [f"{prefix}{i}.html" for i in range(n)]


@pytest.mark.parametrize("mode", ["exact", "bloom", "cuckoo"])
def test_spark_matches_python(spark, mode):
    n_shards, m_bits, k = 4, 1 << 16, 7
    first = _urls(200)
    second = _urls(300)  # overlaps first 200

    py = PySeenFilter(mode, n_shards, m_bits, k)
    py_fresh1 = py.add_all(first)
    py_fresh2 = py.add_all(second)

    shards = init_shards(spark, mode, n_shards, m_bits, k)
    cand1 = spark.createDataFrame(
        pd.DataFrame({"url": first, "depth": [1] * len(first)}),
        "url string, depth long",
    )
    fresh1, shards1, _ = filter_and_update(cand1, shards, mode, n_shards, m_bits, k)
    got1 = sorted(r["url"] for r in fresh1.collect())
    assert got1 == sorted(py_fresh1)

    # materialize shard state (as the engine does between passes)
    shards1 = spark.createDataFrame(shards1.toPandas())
    cand2 = spark.createDataFrame(
        pd.DataFrame({"url": second, "depth": [2] * len(second)}),
        "url string, depth long",
    )
    fresh2, shards2, _ = filter_and_update(cand2, shards1, mode, n_shards, m_bits, k)
    got2 = sorted(r["url"] for r in fresh2.collect())
    assert got2 == sorted(py_fresh2)
    # only the 100 genuinely-new urls survive (bloom FPs would show here,
    # deterministically, in both implementations)
    assert set(got2) <= set(second) - set(first)

    n_items = {r["shard_id"]: r["n_items"] for r in shards2.collect()}
    assert sum(n_items.values()) == sum(py.n_items)


def test_anti_join_strategy_matches(spark):
    """The JVM-only anti-join strategy returns the same fresh set as the
    cogroup strategies (it is exact by construction)."""
    import pyspark.sql.functions as F

    from geocrawl_spark.seen import filter_and_update_anti

    first, second = _urls(200), _urls(300)
    py = PySeenFilter("exact", 4, 1 << 16, 7)
    f1 = py.add_all(first)
    f2 = py.add_all(second)

    empty = spark.range(0).select(F.xxhash64(F.col("id").cast("string")).alias("h1"))
    c1 = spark.createDataFrame(
        pd.DataFrame({"url": first, "depth": [1] * len(first)}),
        "url string, depth long",
    )
    fresh1, seen1, stats1, _p1 = filter_and_update_anti(c1, empty)
    assert sorted(r["url"] for r in fresh1.collect()) == sorted(f1)
    seen1 = spark.createDataFrame(seen1.toPandas())
    c2 = spark.createDataFrame(
        pd.DataFrame({"url": second, "depth": [2] * len(second)}),
        "url string, depth long",
    )
    fresh2, seen2, stats2, _p2 = filter_and_update_anti(c2, seen1)
    assert sorted(r["url"] for r in fresh2.collect()) == sorted(f2)
    s = {r["kind"]: (r["n_cand"], r["n_fresh"]) for r in stats2.collect()}
    assert s == {"page": (300, 100)}


def test_anti_bucketed_matches_and_never_shuffles_seen_side(spark):
    """The bucketed anti-join (the 10^10 storage form): same fresh set as
    the in-memory anti strategy, and the physical plan shuffles ONLY the
    candidate batch — the seen table is a bucketed FileScan with no
    Exchange above it, and the append grows the table in place."""
    import pyspark.sql.functions as F

    from geocrawl_spark.seen import (
        create_bucketed_seen_table,
        filter_and_update_anti_bucketed,
    )

    first, second = _urls(300), _urls(500)
    py = PySeenFilter("exact", 4, 1 << 16, 7)
    f1 = py.add_all(first)
    f2 = py.add_all(second)

    create_bucketed_seen_table(spark, "t_seen_bkt", n_buckets=8)
    c1 = spark.createDataFrame(
        pd.DataFrame({"url": first, "depth": [1] * len(first)}),
        "url string, depth long",
    )
    fresh1, append1 = filter_and_update_anti_bucketed(c1, spark, "t_seen_bkt", 8)
    assert sorted(r["url"] for r in fresh1.collect()) == sorted(f1)
    append1()
    fresh1.unpersist()

    c2 = spark.createDataFrame(
        pd.DataFrame({"url": second, "depth": [2] * len(second)}),
        "url string, depth long",
    )
    fresh2, append2 = filter_and_update_anti_bucketed(c2, spark, "t_seen_bkt", 8)
    assert sorted(r["url"] for r in fresh2.collect()) == sorted(f2)
    append2()
    assert spark.table("t_seen_bkt").count() == 500

    # plan shape: exactly one Exchange (candidates), bucketed seen scan.
    # At production size Catalyst picks SMJ on its own (the seen table is
    # far beyond any broadcast threshold); force it here so the assert
    # reflects that regime instead of the tiny-table broadcast choice.
    w = (
        c2.withColumn("h1", F.xxhash64("url"))
        .repartition(8, "h1")
        .groupBy("h1")
        .agg(F.min("url").alias("url"))
    )
    plan = (
        w.join(spark.table("t_seen_bkt").hint("merge"), "h1", "left_anti")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1  # candidates only
    assert "Bucketed: true" in plan  # seen side read bucket-local
    fresh2.unpersist()
    spark.sql("drop table t_seen_bkt")


def test_abucket_engine_store_round_semantics(spark, tmp_path):
    """filter_and_update_abucket (the CrawlEngine mode='abucket' form):
    correct fresh sets across rounds, O(fresh) appends into per-round
    partitions, stats parity, uncommitted-round invisibility (reads filter
    round <= upto), and idempotent re-run via dynamic partition overwrite."""
    import os

    import pyspark.sql.functions as F

    from geocrawl_spark.seen import ensure_seen_store, filter_and_update_abucket

    base = str(tmp_path / "crawl")
    table = ensure_seen_store(spark, base, n_buckets=4, fresh=True)

    first, second = _urls(300), _urls(500)
    py = PySeenFilter("exact", 4, 1 << 16, 7)
    f1 = py.add_all(first)
    f2 = py.add_all(second)

    c1 = spark.createDataFrame(
        pd.DataFrame({"url": first, "depth": [1] * len(first)}),
        "url string, depth long",
    )
    fresh1, stats1, parents1, append1 = filter_and_update_abucket(
        c1, spark, table, 4, upto_round=-1, round_no=0
    )
    assert sorted(r["url"] for r in fresh1.collect()) == sorted(f1)
    append1()
    s = {r["kind"]: (r["n_cand"], r["n_fresh"]) for r in stats1.collect()}
    assert s == {"page": (300, 300)}
    for p in parents1:
        p.unpersist()

    c2 = spark.createDataFrame(
        pd.DataFrame({"url": second, "depth": [2] * len(second)}),
        "url string, depth long",
    )
    fresh2, stats2, parents2, append2 = filter_and_update_abucket(
        c2, spark, table, 4, upto_round=0, round_no=1
    )
    assert sorted(r["url"] for r in fresh2.collect()) == sorted(f2)
    append2()
    s = {r["kind"]: (r["n_cand"], r["n_fresh"]) for r in stats2.collect()}
    assert s == {"page": (500, 200)}
    for p in parents2:
        p.unpersist()

    # per-round partitions on disk; round-1 rows invisible to an
    # upto_round=0 reader (this is what makes crashed rounds harmless)
    assert os.path.exists(os.path.join(base, "seen_store", "round=0"))
    assert os.path.exists(os.path.join(base, "seen_store", "round=1"))
    assert spark.table(table).where("round <= 0").count() == 300
    assert spark.table(table).count() == 500

    # idempotent re-run of round 1 (rollback + replay): dynamic overwrite
    # replaces the partition, no duplicate hashes
    fresh2b, _, parents2b, append2b = filter_and_update_abucket(
        c2, spark, table, 4, upto_round=0, round_no=1
    )
    assert sorted(r["url"] for r in fresh2b.collect()) == sorted(f2)
    append2b()
    assert spark.table(table).count() == 500
    for p in parents2b:
        p.unpersist()

    # plan shape: seen side is a bucketed scan with the round partition
    # filter and NO Exchange above it; only the candidate batch shuffles
    plan = (
        spark.createDataFrame(
            pd.DataFrame({"url": second, "depth": [2] * len(second)}),
            "url string, depth long",
        )
        .withColumn("h1", F.xxhash64("url"))
        .repartition(4, "h1")
        .groupBy("h1")
        .agg(F.min("url").alias("url"))
        .join(
            spark.table(table).where("round <= 1").select("h1").hint("merge"),
            "h1",
            "left_anti",
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1  # candidates only
    assert "Bucketed: true" in plan
    assert "round" in plan.split("PartitionFilters", 1)[1][:200]
    spark.sql(f"drop table {table}")


def test_compaction_bounds_files_and_preserves_membership(spark, tmp_path):
    """compact_seen_store: after many rounds with periodic compaction the
    store's file count stays bounded (vs linear growth in rounds), the
    membership set is IDENTICAL to an uncompacted twin store at every
    step, the base partition id is negative (always visible to round <=
    upto readers) and strictly decreasing across compactions, and the
    manifest guard refuses rollback past the compaction point."""
    import os

    import pyspark.sql.functions as F

    from geocrawl_spark.checkpoint import TableIO
    from geocrawl_spark.seen import (
        _store_partitions,
        compact_seen_store,
        ensure_seen_store,
        filter_and_update_abucket,
    )

    n_buckets, every = 4, 4
    base_c = str(tmp_path / "compacted")
    base_u = str(tmp_path / "uncompacted")
    io = TableIO(base_c)
    t_c = ensure_seen_store(spark, base_c, n_buckets, fresh=True)
    t_u = ensure_seen_store(spark, base_u, n_buckets, fresh=True)

    def round_urls(r):
        # half repeats of the previous round, half fresh
        return _urls(150, f"http://h.org/r{r}/") + _urls(150, f"http://h.org/r{r-1}/")

    n_rounds = 12
    for r in range(n_rounds):
        cand = spark.createDataFrame(
            pd.DataFrame({"url": round_urls(r), "depth": [r] * 300}),
            "url string, depth long",
        )
        got = {}
        for tbl, bdir in ((t_c, base_c), (t_u, base_u)):
            fresh, _stats, parents, append = filter_and_update_abucket(
                cand, spark, tbl, n_buckets, upto_round=r - 1, round_no=r
            )
            got[tbl] = sorted(x["url"] for x in fresh.collect())
            append()
            for p in parents:
                p.unpersist()
        assert got[t_c] == got[t_u], f"membership diverged at round {r}"
        if r > 0 and r % every == 0:
            res = compact_seen_store(spark, base_c, n_buckets, r, io=io)
            assert res is not None and res["base"] < 0
            assert res["files_after"] <= n_buckets

    # file count: compacted store holds base + rounds since last
    # compaction; uncompacted holds one partition per round
    def files(bdir):
        return sum(
            sum(1 for f in os.listdir(p) if not f.startswith((".", "_")))
            for p in _store_partitions(bdir).values()
        )

    parts_c = _store_partitions(base_c)
    assert len(parts_c) <= every + 2  # base + rounds 9..11
    assert len(_store_partitions(base_u)) == n_rounds
    assert files(base_c) < files(base_u)
    # both stores agree on the full membership set
    assert (
        spark.table(t_c).select("h1").distinct().count()
        == spark.table(t_u).select("h1").distinct().count()
        == spark.table(t_u).count()  # uncompacted store has no dupes
    )
    hc = {r["h1"] for r in spark.table(t_c).select("h1").distinct().collect()}
    hu = {r["h1"] for r in spark.table(t_u).select("h1").collect()}
    assert hc == hu

    # second compaction produced a strictly lower base than the first
    res2 = compact_seen_store(spark, base_c, n_buckets, n_rounds - 1, io=io)
    assert res2 is not None and res2["base"] == min(parts_c) - 1
    assert len(_store_partitions(base_c)) == 1  # fully compacted

    # rollback past the compaction point refuses (expire_snapshots trade)
    io.set_meta("x", 1)  # manifest exists
    with pytest.raises(ValueError, match="compacted"):
        io.rollback_to(3)
    for t in (t_c, t_u):
        spark.sql(f"drop table {t}")


def test_engine_crawl_with_compaction_identical(spark, tmp_path):
    """A full CrawlEngine crawl with compact_seen_every=3 produces the
    IDENTICAL crawl ordering, seen set, and counters as one without
    compaction — compaction is invisible to crawl semantics, it only
    bounds the store's file count."""
    from geocrawl_spark import synth
    from geocrawl_spark.frontier import CrawlEngine
    from geocrawl_spark.seen import _store_partitions

    def build(base, **kw):
        return CrawlEngine(
            spark,
            pages=spark.createDataFrame(
                synth.gen_pages(60, 4),
                "url string, warc_ts timestamp, html binary, text string, lang string",
            ),
            seeds=spark.createDataFrame(synth.gen_seeds(4)),
            robots=spark.createDataFrame(
                synth.gen_robots(4),
                "host string, disallow array<string>, allow array<string>",
            ),
            hostbudget=spark.createDataFrame(synth.gen_hostbudget(4)),
            base_dir=base,
            mode="abucket",
            n_buckets=2,
            **kw,
        )

    e1 = build(str(tmp_path / "plain"))
    log1 = e1.run(max_rounds=12)
    e2 = build(str(tmp_path / "compacted"), compact_seen_every=3)
    log2 = e2.run(max_rounds=12)

    assert log1 == log2  # per-round counters identical
    assert e1.crawl_order() == e2.crawl_order()
    assert e1.seen_urls() == e2.seen_urls()
    # compaction actually ran: base partition present, fewer partitions
    parts = _store_partitions(str(tmp_path / "compacted"))
    assert min(parts) < 0
    assert len(parts) < len(_store_partitions(str(tmp_path / "plain")))
    assert e2.io.get_meta("seen_compaction")["base"] < 0


def test_bitmap_strategy_matches_blob(spark):
    """JVM bitmap bloom == blob bloom bit-for-bit: tiny m_bits forces
    real false positives, which must agree exactly (same Kirsch-
    Mitzenmacher positions) with the PySeenFilter blob twin."""
    import pyspark.sql.functions as F

    from geocrawl_spark.seen import filter_and_update_bitmap, init_bitmap

    m_bits, k = 1 << 12, 7  # 4096 bits, 2000+ urls -> plenty of FPs
    first, second = _urls(1200), _urls(2000)

    py = PySeenFilter("bloom", n_shards=1, m_bits=m_bits, k=k)
    f1 = py.add_batch(first)
    f2 = py.add_batch(second)
    # batch-2 novel urls (800) collide with batch-1 bits -> real FPs
    assert len(f2) < len(set(second) - set(first))

    c1 = spark.createDataFrame(
        pd.DataFrame({"url": first, "depth": [1] * len(first)}),
        "url string, depth long",
    )
    fresh1, bm1, stats1, out1 = filter_and_update_bitmap(
        c1, init_bitmap(spark), m_bits, k
    )
    assert sorted(r["url"] for r in fresh1.collect()) == f1
    bm1 = spark.createDataFrame(bm1.toPandas(), "word_id long, bits long")
    out1.unpersist()

    c2 = spark.createDataFrame(
        pd.DataFrame({"url": second, "depth": [2] * len(second)}),
        "url string, depth long",
    )
    fresh2, bm2, stats2, out2 = filter_and_update_bitmap(c2, bm1, m_bits, k)
    assert sorted(r["url"] for r in fresh2.collect()) == f2
    s = {r["kind"]: (r["n_cand"], r["n_fresh"]) for r in stats2.collect()}
    assert s == {"page": (2000, len(f2))}
    out2.unpersist()


def test_bitmap_strategy_plan_is_jvm_only(spark):
    """The bitmap membership plan contains no Python/Arrow operator."""
    import pyspark.sql.functions as F

    from geocrawl_spark.seen import filter_and_update_bitmap, init_bitmap

    c = spark.createDataFrame(
        pd.DataFrame({"url": _urls(10), "depth": [1] * 10}),
        "url string, depth long",
    )
    fresh, bm, stats, out = filter_and_update_bitmap(c, init_bitmap(spark))
    plan = fresh._jdf.queryExecution().executedPlan().toString()
    for marker in ("ArrowEvalPython", "BatchEvalPython", "FlatMapGroupsInPandas"):
        assert marker not in plan
    out.unpersist()


def test_bitmap_within_batch_dedup(spark):
    from geocrawl_spark.seen import filter_and_update_bitmap, init_bitmap

    cand = spark.createDataFrame(
        pd.DataFrame({"url": ["u1", "u1", "u2"], "depth": [5, 2, 1]}),
        "url string, depth long",
    )
    fresh, _, _, out = filter_and_update_bitmap(cand, init_bitmap(spark))
    got = {r["url"]: r["depth"] for r in fresh.collect()}
    assert got == {"u1": 2, "u2": 1}
    out.unpersist()


def test_within_batch_dedup(spark):
    shards = init_shards(spark, "exact", 2, 1 << 10, 3)
    cand = spark.createDataFrame(
        pd.DataFrame({"url": ["u1", "u1", "u2"], "depth": [5, 2, 1]}),
        "url string, depth long",
    )
    fresh, _, _ = filter_and_update(cand, shards, "exact", 2, 1 << 10, 3)
    got = {r["url"]: r["depth"] for r in fresh.collect()}
    assert got == {"u1": 2, "u2": 1}  # min depth wins


def test_bloom_no_false_negatives_and_fpr():
    py = PySeenFilter("bloom", n_shards=2, m_bits=1 << 18, k=7)
    inserted = _urls(5000)
    py.add_all(inserted)
    assert all(py.contains(u) for u in inserted)  # no false negatives
    probe = _urls(5000, prefix="http://other.org/q/")
    fp = sum(py.contains(u) for u in probe)
    assert fp / len(probe) < 0.01  # sized for ~2.6 bits... generous bound


def test_exact_delete_duplicate_keys_in_batch():
    """ADVICE r4: a delete batch holding the SAME key twice must flag
    exactly the elements actually removed — set semantics.  Before the
    fix, np.delete with a repeated index removed one array element while
    the mask claimed N removals, so an n_items counter driven by
    removed.sum() drifted."""
    import numpy as np

    from geocrawl_spark.seen import _insert, delete_from_blob, empty_blob

    keys = np.array([10, 20, 30], dtype=np.uint64)
    blob = _insert(empty_blob("exact", 0, 0), keys, keys)
    batch = np.array([20, 20, 99, 10, 10, 10], dtype=np.uint64)
    blob2, removed = delete_from_blob(blob, batch)
    # one removal per PRESENT distinct key; absent key never flagged
    assert removed.sum() == 2
    assert removed.tolist() == [True, False, False, True, False, False]
    data = np.frombuffer(blob2[4:], dtype=np.uint64)
    assert data.tolist() == [30]
    # idempotent: deleting the same batch again removes nothing
    blob3, removed2 = delete_from_blob(blob2, batch)
    assert removed2.sum() == 0 and blob3 == blob2


def test_cuckoo_no_false_negatives_and_fpr():
    """Cuckoo codec at HIGH load (~76%): every inserted key answers seen
    (no false negatives even after displacement chains), and the FPR on
    unseen keys stays near the 2*slots/2^16 design bound."""
    # 2 shards x (1<<18 bits -> 1024 buckets x 4 slots) = 8192 capacity
    py = PySeenFilter("cuckoo", n_shards=2, m_bits=1 << 18, k=7)
    inserted = _urls(6200)
    assert sorted(py.add_batch(inserted)) == sorted(inserted)
    assert all(py.contains(u) for u in inserted)  # no false negatives
    probe = _urls(50000, prefix="http://other.org/q/")
    fp = sum(py.contains(u) for u in probe)
    # design FPR ~ 2*4/65536 * load ~= 0.009%; allow generous slack
    assert fp / len(probe) < 0.002


def test_cuckoo_delete_then_readmit():
    """The cuckoo differentiator vs bloom: a politeness retraction deletes
    the fingerprint, after which the url is admittable again — and bloom
    refuses the same operation loudly."""
    import pytest as _pytest

    py = PySeenFilter("cuckoo", n_shards=2, m_bits=1 << 14, k=7)
    urls = _urls(300)
    py.add_batch(urls)
    assert py.discard(urls[7])
    assert not py.contains(urls[7])
    assert not py.discard(urls[7])  # second delete finds nothing
    assert py.add(urls[7])  # re-admittable
    assert py.contains(urls[7])
    # untouched keys unaffected by the back-swap repacking
    assert all(py.contains(u) for u in urls)

    bl = PySeenFilter("bloom", n_shards=1, m_bits=1 << 12, k=3)
    bl.add("http://x.org/")
    with _pytest.raises(ValueError, match="bloom"):
        bl.discard("http://x.org/")


def test_cuckoo_insert_order_invariant():
    """Blob layout is a pure function of (prior state, batch SET): the
    Spark cogroup and the pyref twin may present the same fresh batch in
    different orders, so _insert must sort internally."""
    import numpy as np

    from geocrawl_spark.seen import _insert, empty_blob

    blob = empty_blob("cuckoo", 1 << 14, 7)
    h = np.random.default_rng(3).integers(1, 2**63, 500, dtype=np.int64).view(np.uint64)
    assert _insert(blob, h, h) == _insert(blob, h[::-1].copy(), h[::-1].copy())


def test_cuckoo_overflow_raises():
    """Over-capacity insert must fail loudly (sizing bug), never silently
    drop a key — a dropped key would be a FALSE NEGATIVE, re-crawling the
    same url forever."""
    import pytest as _pytest

    tiny = PySeenFilter("cuckoo", n_shards=1, m_bits=16 * 4 * 4, k=7)  # 16 slots
    with _pytest.raises(RuntimeError, match="capacity"):
        tiny.add_batch(_urls(64))


def test_monotone_property():
    """Once seen, always seen (H2 monotonicity)."""
    py = PySeenFilter("exact", 4, 1 << 10, 3)
    urls = _urls(50)
    py.add_all(urls)
    assert py.add_all(urls) == []
