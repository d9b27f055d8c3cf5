"""Recall of the random-hyperplane LSH ANN path vs brute-force ground
truth, alongside the trained-IVF numbers (scripts/ivf_recall.py) so the
two scale paths can be compared per BENCH round.

Measures, per scale factor:
- sim_hyperplane_topk: fraction of the true cosine top-3 (brute force
  over all targets, query set vec_id % 50 == 0) recovered by the banded
  sign-signature candidate generation + exact rerank;
- candidate-set economy: mean candidates per query vs corpus size (the
  number the bands/r trade actually buys);
- bucket-cap drop total (the no-silent-truncation report; also an
  oracle query: hyperplane_bucket_stats).

Both sides run in DuckDB (the oracle dialect) — CORRECTNESS_r* proves
the Spark plans hash-match these formulations, so oracle-vs-oracle
recall equals engine recall.  Appends results to BENCH/BASELINE.md.
"""

from __future__ import annotations

import datetime
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from geocrawl_spark.queries_ml import (  # noqa: E402
    _HP_BANDS,
    _HP_BUCKET_CAP,
    _hp_cand_sql,
    _hp_r_of,
    _hp_sql_ctes,
    _parquet_num_rows,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_TOPK_SQL = f"""
    with {_hp_sql_ctes()},
    {_hp_cand_sql()},
    pairs as (select query_id, target_id,
                     round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 3) as cos
              from cand join n a on a.vec_id = cand.query_id
                        join n b on b.vec_id = cand.target_id)
    select query_id, target_id from (
      select *, row_number() over (partition by query_id
                                   order by cos desc, target_id) as rk
      from pairs) where rk <= 3
"""

_CAND_PER_QUERY_SQL = f"""
    with {_hp_sql_ctes()},
    {_hp_cand_sql()}
    select round(count(*) * 1.0 / count(distinct query_id), 1) from cand
"""

_DROP_TOTAL_SQL = f"""
    with {_hp_sql_ctes()}
    select coalesce(sum(greatest(n - {_HP_BUCKET_CAP}, 0)), 0)::bigint
    from (select band, band_val, count(*) as n from bv group by band, band_val)
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


def main():
    rows = []
    for sf in ("0.01", "0.1"):
        path = f"/root/testdata/sf{sf}/embeddings.parquet"
        n_vecs = _parquet_num_rows(path)
        r = _hp_r_of(n_vecs)
        con = duckdb.connect()
        con.sql(f"create view embeddings as select * from '{path}'")
        truth = set(map(tuple, con.sql(_TRUE_TOPK).fetchall()))
        approx = set(map(tuple, con.sql(_TOPK_SQL).fetchall()))
        hit = len(truth & approx)
        recall = hit / len(truth) if truth else 1.0
        (cand_pq,) = con.sql(_CAND_PER_QUERY_SQL).fetchone()
        (dropped,) = con.sql(_DROP_TOTAL_SQL).fetchone()
        rows.append((sf, n_vecs, r, recall, f"{hit}/{len(truth)}", cand_pq, dropped))
        print(
            f"sf{sf}: n={n_vecs} r={r} (corpus-derived, {_HP_BANDS} bands); "
            f"topk recall={recall:.3f} ({hit}/{len(truth)}); "
            f"candidates/query={cand_pq} ({cand_pq / n_vecs:.1%} of corpus); "
            f"bucket-cap dropped={dropped}",
            flush=True,
        )

    stamp = datetime.datetime.now(datetime.timezone.utc).isoformat(timespec="seconds")
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n### Hyperplane-LSH recall vs brute force ({stamp}, "
            "scripts/hyperplane_recall.py)\n\n"
            f"{_HP_BANDS} bands of r sign bits, r corpus-derived = "
            "max(4, ceil(log2(ceil(n/25)))); multi-probe queries (exact "
            "band value + every single-bit flip, Lv et al. VLDB'07); "
            "candidates = vectors sharing any probed band value "
            f"(per-bucket cap {_HP_BUCKET_CAP}, drops reported); "
            "exact cosine rerank.  "
            "Ground truth: brute-force cosine top-3, same query set.  "
            "'cand/query' is the scan economy the banding buys vs a "
            "linear scan of n.\n\n"
            "| sf | n | r | top-3 recall | (hits) | cand/query | dropped |\n"
            "|---|---|---|---|---|---|---|\n"
        )
        for sf, n_vecs, r, recall, hits, cand_pq, dropped in rows:
            f.write(
                f"| {sf} | {n_vecs} | {r} | {recall:.3f} | {hits} "
                f"| {cand_pq} | {dropped} |\n"
            )


if __name__ == "__main__":
    main()
