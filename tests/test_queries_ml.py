"""Unit tests for the corpus-scaled IVF family (queries_ml): K derivation,
the per-bucket pair-generation cap (exercised with a tiny pinned cap —
natural buckets never exceed the production cap at test scale), and the
footer-based row counting that feeds both."""

import duckdb
import pytest
from pyspark.sql import functions as F

from geocrawl_spark.queries_ml import (
    _IVF_BUCKET_CAP,
    _IVF_K_MIN,
    _IVF_TARGET_BUCKET,
    _bucket_capped,
    _dot,
    _dvec,
    _ivf_assign_ranked,
    _ivf_k_of,
    _ivf_sql_ctes,
    _na_capped_sql,
    _parquet_num_rows,
    _vec_count,
)

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"
SF1 = "/root/testdata/sf0.1"


def test_k_derivation_integer_formula():
    assert _ivf_k_of(1) == _IVF_K_MIN
    assert _ivf_k_of(_IVF_K_MIN * _IVF_TARGET_BUCKET) == _IVF_K_MIN
    assert _ivf_k_of(_IVF_K_MIN * _IVF_TARGET_BUCKET + 1) == _IVF_K_MIN + 1
    # exact multiples don't over-allocate a bucket
    assert _ivf_k_of(10 * _IVF_TARGET_BUCKET) == 10
    # the two driver scale factors land on DIFFERENT K (the r3 demand)
    assert _ivf_k_of(500) == 8 and _ivf_k_of(2000) == 16


def test_k_matches_duckdb_formula():
    """The kk CTE must derive the same K as _ivf_k_of for any n."""
    con = duckdb.connect()
    for n in (1, 7, 499, 500, 501, 1000, 1999, 2000, 5000, 123457):
        (k,) = con.execute(
            f"select greatest({_IVF_K_MIN}, "
            f"(cast({n} as bigint) + {_IVF_TARGET_BUCKET - 1}) // "
            f"{_IVF_TARGET_BUCKET})"
        ).fetchone()
        assert k == _ivf_k_of(n), n


def test_vec_count_uses_footers(spark):
    # footer path (flat parquet) agrees with a counting job
    e = spark.read.parquet(f"{SF1}/embeddings.parquet")
    assert _vec_count(SF1, "embeddings", e) == e.count() == 2000


def test_parquet_num_rows_refuses_unaccountable(tmp_path, spark):
    # partitioned (nested) layout -> None, never an undercount
    p = str(tmp_path / "part")
    spark.range(100).withColumn("g", F.col("id") % 2).write.partitionBy(
        "g"
    ).parquet(p)
    assert _parquet_num_rows(p) is None
    # flat layout -> exact count
    q = str(tmp_path / "flat")
    spark.range(77).write.parquet(q)
    assert _parquet_num_rows(q) == 77
    # foreign data file beside the parts -> None
    (tmp_path / "flat" / "stray.csv").write_text("a,b\n")
    assert _parquet_num_rows(q) is None


@pytest.fixture(scope="module")
def vectors(spark):
    e = spark.read.parquet(f"{SF001}/embeddings.parquet").select(
        "vec_id", _dvec(F.col("embedding")).alias("e")
    )
    return e.withColumn("nrm", F.sqrt(_dot(F.col("e"), F.col("e"))))


def test_bucket_cap_matches_duckdb(spark, vectors):
    """With a tiny pinned cap the fence actually drops members; Spark and
    DuckDB must keep the identical survivors and produce the identical
    capped near-dup pairs."""
    cap, k = 3, 4
    assign = _ivf_assign_ranked(vectors, k).filter(F.col("rk") == 1)
    na = _bucket_capped(vectors.join(assign.select("vec_id", "cid"), "vec_id"), cap)
    kept = sorted(
        (r["cid"], r["vec_id"]) for r in na.select("cid", "vec_id").collect()
    )
    con = duckdb.connect()
    con.execute(
        f"create view embeddings as select * from '{SF001}/embeddings.parquet'"
    )
    rows = con.execute(
        f"with {_ivf_sql_ctes(k=k)}, {_na_capped_sql(cap)} "
        "select cid, vec_id from na order by cid, vec_id"
    ).fetchall()
    assert kept == [tuple(r) for r in rows]
    # every bucket is capped and total kept = sum(min(bucket, cap))
    per_bucket = {}
    for cid, _ in kept:
        per_bucket[cid] = per_bucket.get(cid, 0) + 1
    assert per_bucket and all(v <= cap for v in per_bucket.values())
    sizes = {
        r["cid"]: r["n"]
        for r in assign.groupBy("cid").agg(F.count("*").alias("n")).collect()
    }
    assert sum(min(v, cap) for v in sizes.values()) == len(kept)
    # at least one bucket was actually truncated (else the test is vacuous)
    assert any(v > cap for v in sizes.values())


def test_production_cap_bounds_pairs():
    """The production cap bounds any bucket's pair fan-out at cap^2/2
    regardless of skew — the arithmetic the 100 TB judgment rests on."""
    assert _IVF_BUCKET_CAP == 8 * _IVF_TARGET_BUCKET
    worst_pairs_per_bucket = _IVF_BUCKET_CAP * (_IVF_BUCKET_CAP - 1) // 2
    assert worst_pairs_per_bucket < 500_000


def test_dedup_containment_asymmetric_hand_case(spark, tmp_path):
    """A small doc fully inside a much larger one: containment 1.0 while
    jaccard stays under the 0.5 dedup threshold — the relation
    dedup_ngram_jaccard structurally cannot report."""
    from geocrawl_spark.queries_ml import dedup_containment, dedup_ngram_jaccard

    small = "w0 w1 w2 w3 w4 w5"  # 4 distinct shingles
    big = " ".join(f"w{i}" for i in range(20))  # 18 shingles, contains all 4
    other = "q0 q1 q2 q3 q4"
    df = spark.createDataFrame(
        [
            (0, small, "en", "src0", len(small)),
            (1, big, "en", "src1", len(big)),
            (2, other, "en", "src2", len(other)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    sf = str(tmp_path)

    got = {(r["doc_sub"], r["doc_sup"]): r for r in dedup_containment(spark, sf).collect()}
    assert set(got) == {(0, 1)}  # only the contained direction fires
    assert got[(0, 1)]["containment_ppm"] == 1_000_000
    # i=4, union=18 -> jaccard 4/18 = 0.2222 < 0.5
    assert got[(0, 1)]["jaccard_ppm"] == (1_000_000 * 4) // 18
    assert dedup_ngram_jaccard(spark, sf).count() == 0


def test_dedup_containment_bounds(spark):
    """Invariants at sf0.01: containment >= jaccard on every emitted
    row (|A∩B|/|A| >= |A∩B|/|A∪B| always), ppm values in range, and
    the directed pair respects the report threshold."""
    from geocrawl_spark.queries_ml import _CONTAIN_PPM, dedup_containment

    rows = dedup_containment(spark, SF01).collect()
    assert len(rows) > 0
    for r in rows:
        assert _CONTAIN_PPM <= r["containment_ppm"] <= 1_000_000
        assert 0 < r["jaccard_ppm"] <= r["containment_ppm"]
        assert r["doc_sub"] != r["doc_sup"]


def test_gemm_blocking_invariant(spark, monkeypatch):
    """The blocked-GEMM all-pairs result is independent of the block
    count: 16-vector blocks (32 blocks at sf0.001, exercising diagonal
    AND off-diagonal tiles plus the least/greatest routing) emit exactly
    the single-tile rows.  Guards the replication logic — a pair routed
    to zero or two groups would show up as a missing or duplicated row."""
    import geocrawl_spark.queries_ml as QM

    one = sorted(
        map(tuple, QM.dedup_embedding_cosine(spark, SF001).collect())
    )
    monkeypatch.setattr(QM, "_GEMM_BLOCK", 16)
    many = sorted(
        map(tuple, QM.dedup_embedding_cosine(spark, SF001).collect())
    )
    assert len(one) > 0
    assert many == one


def test_semdedup_kept_set_is_eps_independent(spark):
    """SemDeDup contract at sf0.01: (1) the kept flag partitions the capped
    membership; (2) no two KEPT members of one cluster are >= eps similar
    (the whole point of the prune); (3) every PRUNED member has a
    same-cluster dominator (>= eps neighbor of strictly lower priority);
    (4) each cluster's minimum-(c_micro, vec_id) member is always kept."""
    from geocrawl_spark.queries_ml import _SEMDEDUP_EPS, semdedup_prune

    out = semdedup_prune(spark, SF01)
    rows = {r["vec_id"]: r for r in out.collect()}
    e = spark.read.parquet(f"{SF01}/embeddings.parquet")
    vecs = {r["vec_id"]: list(r["embedding"]) for r in e.collect()}
    assert set(rows) == set(vecs)  # nothing capped away at this scale

    import itertools
    import math

    def cos3(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 3)

    by_cid: dict[int, list[int]] = {}
    for vid, r in rows.items():
        by_cid.setdefault(r["cid"], []).append(vid)

    def prio(vid):
        return (rows[vid]["c_micro"], vid)

    n_pruned = 0
    for cid, members in by_cid.items():
        # (4) the cluster's minimum-priority member can never be dominated
        assert rows[min(members, key=prio)]["kept"] == 1
        for va, vb in itertools.combinations(sorted(members), 2):
            if cos3(vecs[va], vecs[vb]) >= _SEMDEDUP_EPS:
                # (2) at most one of a >=eps pair survives
                assert rows[va]["kept"] + rows[vb]["kept"] <= 1
        for vid in members:
            if rows[vid]["kept"] == 0:
                n_pruned += 1
                # (3) a pruned member has a dominating >=eps neighbor
                assert any(
                    cos3(vecs[vid], vecs[u]) >= _SEMDEDUP_EPS
                    and prio(u) < prio(vid)
                    for u in members
                    if u != vid
                )
    assert n_pruned > 0  # the synthetic corpus has near-dup families


# ---------------------------------------------------------------------------
# embedding scalar quantization (SQ4 codes)
# ---------------------------------------------------------------------------

def test_sq_codes_roundtrip_bound_and_range(spark, tmp_path):
    """Every 4-bit code must be in [0, 15] and the per-dim reconstruction
    error can never exceed one quantization step, ceil(rng/15) micro-units
    -- the defining SQ guarantee the packed output has to preserve."""
    import math

    from geocrawl_spark.queries_ml import _SQ_LEVELS, _SQ_M, embedding_sq_codes

    dim = 8  # subd = 1 -> one dim per word, codes directly readable
    vecs = [
        (i, [math.sin(i * 7 + d) * (d + 1) for d in range(dim)], "a")
        for i in range(40)
    ]
    df = spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>, label string"
    )
    out = str(tmp_path / "embeddings.parquet")
    df.coalesce(1).write.parquet(out)
    rows = embedding_sq_codes(spark, str(tmp_path)).collect()
    assert len(rows) == 40

    xq = {i: [math.floor(v * 1e6) for v in e] for i, e, _ in vecs}
    mins = [min(xq[i][d] for i in xq) for d in range(dim)]
    maxs = [max(xq[i][d] for i in xq) for d in range(dim)]
    for r in rows:
        codes = [r[f"code{s}"] for s in range(_SQ_M)]
        err_total = 0
        for d in range(dim):
            c = codes[d]  # subd == 1: word s holds dim s's raw code
            assert 0 <= c <= _SQ_LEVELS
            rng = maxs[d] - mins[d]
            recon = mins[d] + (c * rng) // _SQ_LEVELS
            step = -(-rng // _SQ_LEVELS)  # ceil
            assert abs(xq[r["vec_id"]][d] - recon) <= step
            err_total += abs(xq[r["vec_id"]][d] - recon)
        assert r["err_micro"] == err_total


def test_sq_codes_constant_dim_and_determinism(spark, tmp_path):
    from geocrawl_spark.queries_ml import embedding_sq_codes

    # dim 1 is constant across the corpus (rng = 0 -> code 0, err 0)
    vecs = [(i, [float(i), 2.5, float(i % 3)], "x") for i in range(10)]
    df = spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>, label string"
    )
    df.coalesce(1).write.parquet(str(tmp_path / "embeddings.parquet"))
    a = [r.asDict() for r in embedding_sq_codes(spark, str(tmp_path)).collect()]
    b = [r.asDict() for r in embedding_sq_codes(spark, str(tmp_path)).collect()]
    assert a == b  # corpus-stat collect is deterministic
    # constant dim contributes code 0 and zero error: vec 0 has value
    # min in dims 0 and 2 as well -> all-zero codes and zero error
    assert a[0]["vec_id"] == 0 and a[0]["err_micro"] == 0
