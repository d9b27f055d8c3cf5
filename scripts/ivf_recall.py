"""Recall of the trained-IVF approximate operators vs their brute-force
ground truth (VERDICT r2 'Next round' item 3).

Measures, per scale factor:
- sim_ivf_topk: fraction of the true cosine top-3 (brute force over all
  targets, same query set vec_id % 50 == 0) recovered by the n_probe=2
  trained-IVF search;
- dedup_embedding_bucketed: fraction of the true >= 0.4 near-dup pairs
  (dedup_embedding_cosine, the fenced all-pairs spec) recovered by the
  within-trained-bucket pair generation;
- the same two numbers under the round-2 UNTRAINED centroids (first 8
  vectors, n_probe=1) for comparison.

Both sides run in DuckDB (the oracle dialect) — CORRECTNESS_r* already
proves the Spark plans hash-match these formulations, so oracle-vs-oracle
recall equals engine recall.  Appends results to BENCH/BASELINE.md.
"""

from __future__ import annotations

import datetime
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geocrawl_spark.queries_ml import (  # noqa: E402
    _IVF_BUCKET_CAP,
    _ivf_k_of,
    _ivf_nprobe_of,
    _ivf_sql_ctes,
    _na_capped_sql,
    _parquet_num_rows,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _untrained_ctes() -> str:
    """The r2 formulation: centroids = first K vectors, no Lloyd steps
    (K is corpus-derived since r4, identically for both formulations)."""
    return _ivf_sql_ctes(iters=0)


def _topk_sql(ctes: str, n_probe: int) -> str:
    return f"""
    with {ctes},
    q as (select n.vec_id as query_id, e as qe, nrm as qn, a.cid
          from n join assign a using (vec_id)
          where vec_id % 50 = 0 and a.rk <= {n_probe}),
    t as (select n.vec_id as target_id, e as te, nrm as tn, a.cid
          from n join assign a using (vec_id) where a.rk = 1),
    pairs as (select query_id, target_id,
                     round(list_dot_product(qe, te) / (qn * tn), 3) as cos
              from q join t using (cid) where target_id != query_id)
    select query_id, target_id from (
      select *, row_number() over (partition by query_id
                                   order by cos desc, target_id) as rk
      from pairs) where rk <= 3
    """


_TRUE_TOPK = """
    with v as (select vec_id, embedding::DOUBLE[] as e from embeddings),
    n as (select vec_id, e, sqrt(list_dot_product(e, e)) as nrm from v),
    pairs as (
      select q.vec_id as query_id, t.vec_id as target_id,
             round(list_dot_product(q.e, t.e) / (q.nrm * t.nrm), 3) as cos
      from n q join n t on q.vec_id % 50 = 0 and t.vec_id != q.vec_id)
    select query_id, target_id from (
      select *, row_number() over (partition by query_id
                                   order by cos desc, target_id) as rk
      from pairs) where rk <= 3
"""

_TRUE_PAIRS = """
    with v as (select vec_id, embedding::DOUBLE[] as e from embeddings),
    n as (select vec_id, e, sqrt(list_dot_product(e, e)) as nrm from v)
    select a.vec_id as vec_a, b.vec_id as vec_b
    from n a join n b on a.vec_id < b.vec_id
    where list_dot_product(a.e, b.e) / (a.nrm * b.nrm) >= 0.4
"""


def _pairs_sql(ctes: str) -> str:
    return f"""
    with {ctes},
    {_na_capped_sql()}
    select a.vec_id as vec_a, b.vec_id as vec_b
    from na a join na b on a.cid = b.cid and a.vec_id < b.vec_id
    where list_dot_product(a.e, b.e) / (a.nrm * b.nrm) >= 0.4
    """


def _drop_total_sql(ctes: str) -> str:
    """Total vectors excluded from pair generation by the per-bucket cap
    (the 'no silent truncation' report)."""
    return f"""
    with {ctes},
    a1 as (select cid from assign where rk = 1)
    select coalesce(sum(greatest(n - {_IVF_BUCKET_CAP}, 0)), 0)::bigint
    from (select cid, count(*) as n from a1 group by cid)
    """


def _recall(con, approx_sql: str, truth_sql: str) -> tuple[float, int, int]:
    truth = set(map(tuple, con.sql(truth_sql).fetchall()))
    approx = set(map(tuple, con.sql(approx_sql).fetchall()))
    hit = len(truth & approx)
    return (hit / len(truth) if truth else 1.0), hit, len(truth)


def main():
    rows = []
    for sf in ("0.01", "0.1"):
        path = f"/root/testdata/sf{sf}/embeddings.parquet"
        n_vecs = _parquet_num_rows(path)
        k = _ivf_k_of(n_vecs)
        np_ = _ivf_nprobe_of(k)
        con = duckdb.connect()
        con.sql(f"create view embeddings as select * from '{path}'")
        trained, untrained = _ivf_sql_ctes(), _untrained_ctes()
        r_topk, h1, t1 = _recall(con, _topk_sql(trained, np_), _TRUE_TOPK)
        r_topk_u, h2, t2 = _recall(con, _topk_sql(untrained, 1), _TRUE_TOPK)
        r_pairs, h3, t3 = _recall(con, _pairs_sql(trained), _TRUE_PAIRS)
        r_pairs_u, h4, t4 = _recall(con, _pairs_sql(untrained), _TRUE_PAIRS)
        (dropped,) = con.sql(_drop_total_sql(trained)).fetchone()
        rows.append(
            (sf, k, r_topk, f"{h1}/{t1}", r_topk_u, r_pairs, f"{h3}/{t3}",
             r_pairs_u, dropped)
        )
        print(
            f"sf{sf}: n={n_vecs} K={k} np={np_} (corpus-derived); "
            f"topk recall trained(np={np_})={r_topk:.3f} ({h1}/{t1}) "
            f"untrained(np=1)={r_topk_u:.3f}; pair recall trained={r_pairs:.3f} "
            f"({h3}/{t3}) untrained={r_pairs_u:.3f}; "
            f"bucket-cap dropped={dropped}",
            flush=True,
        )

    stamp = datetime.datetime.now(datetime.timezone.utc).isoformat(timespec="seconds")
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n### IVF recall vs brute force ({stamp}, scripts/ivf_recall.py)\n\n"
            "Trained = spherical k-means (K corpus-derived = "
            "max(8, ceil(n/125)), 2 deterministic Lloyd steps) with "
            "n_probe = max(2, floor(sqrt(K))); untrained = same derived "
            "K, no Lloyd steps, n_probe=1.  Ground truth: brute-force "
            "cosine top-3 (same "
            "query set) / all >=0.4 pairs.  'dropped' = vectors excluded "
            "from pair generation by the per-bucket cap "
            f"({_IVF_BUCKET_CAP}) — the no-silent-truncation report "
            "(also an oracle query: ivf_bucket_stats).\n\n"
            "| sf | K | top-3 recall trained | (hits) | top-3 untrained | "
            "pair recall trained | (hits) | pair untrained | dropped |\n"
            "|---|---|---|---|---|---|---|---|---|\n"
        )
        for sf, k, rt, ht, ru, rp, hp, rpu, dropped in rows:
            f.write(
                f"| {sf} | {k} | {rt:.3f} | {ht} | {ru:.3f} | {rp:.3f} | {hp} "
                f"| {rpu:.3f} | {dropped} |\n"
            )


if __name__ == "__main__":
    main()
