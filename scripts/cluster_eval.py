"""Measure near-dup CLUSTERING quality: pair-level precision/recall of
the shipped cluster resolution (queries_pipeline.dedup_clusters —
closure over VERIFIED true-Jaccard pairs) against the exact ground
truth: the transitive closure of UNCAPPED all-pairs word 3-gram
Jaccard >= 0.5.

This eval is what motivated the verify-before-closure design: closing
over raw LSH candidates scored pair precision 0.001 (sf0.01) / ~0.000
(sf0.1) at recall 1.0 — one shared band is a hint, not a duplicate, and
transitivity amplifies every false hint into one giant cluster.  The
shipped verified-pair closure scores 1.000/1.000 at both sfs (the
df-cap recall trade does not bite on this corpus).

Pure DuckDB (exact at eval scale; the shipped side reuses the repo's
own oracle SQL, so this measures the ALGORITHM's trade — not an
implementation).

Usage: python scripts/cluster_eval.py [sf_dir ...]
Appends nothing; prints a markdown row per sf for BENCH/BASELINE.md.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

from geocrawl_spark.queries_core import ORACLE_SQL  # noqa: E402
import geocrawl_spark.queries_ml  # noqa: F401,E402 (registration)
import geocrawl_spark.queries_pipeline  # noqa: F401,E402 (registration)

# exact ground truth: transitive closure over TRUE-jaccard >= 0.5 pairs.
# dedup_ngram_jaccard's df-cap only affects candidate GENERATION; at eval
# scale we rebuild the uncapped all-pairs truth directly.
_TRUTH_SQL = """
with recursive sh as (
  select doc_id, unnest(case when len(string_split(text, ' ')) >= 3 then
    list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
           || ' ' || string_split(text, ' ')[i+2])) else [] end) as s
  from documents
),
sizes as (select doc_id, count(*)::bigint as n from sh group by 1),
inter as (
  select a.doc_id as doc_a, b.doc_id as doc_b, count(*)::bigint as i
  from sh a join sh b on a.s = b.s and a.doc_id < b.doc_id
  group by 1, 2
),
tp as (
  select doc_a, doc_b from inter
    join sizes na on doc_a = na.doc_id
    join sizes nb on doc_b = nb.doc_id
  where i / (na.n + nb.n - i) >= 0.5
),
edges as (select doc_a as src, doc_b as dst from tp
          union all select doc_b, doc_a from tp),
reach(doc, lab) as (
  select distinct src, src from edges
  union
  select e.dst, r.lab from reach r join edges e on e.src = r.doc
),
cc as (select doc, min(lab) as cluster from reach group by doc)
select doc, cluster from cc
"""


def _pairs_of(rows) -> set[tuple[int, int]]:
    by = {}
    for doc, c in rows:
        by.setdefault(c, []).append(doc)
    out = set()
    for members in by.values():
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1:]:
                out.add((a, b))
    return out


def main() -> int:
    sfs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    print("| sf | truth pairs | lsh-cc pairs | pair precision | pair recall |")
    print("|---|---|---|---|---|")
    for sf in sfs:
        con = duckdb.connect()
        con.execute(
            f"create view documents as select * from '{sf}/documents.parquet'"
        )
        truth = _pairs_of(con.execute(_TRUTH_SQL).fetchall())
        got = _pairs_of(
            con.execute(
                f"select doc_id, cluster from ({ORACLE_SQL['dedup_clusters']})"
            ).fetchall()
        )
        inter = len(truth & got)
        prec = inter / len(got) if got else 1.0
        rec = inter / len(truth) if truth else 1.0
        print(
            f"| {sf.rsplit('/', 1)[-1]} | {len(truth)} | {len(got)} "
            f"| {prec:.3f} | {rec:.3f} |"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
