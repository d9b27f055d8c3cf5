"""Crawl -> corpus bridge: reshape a finished crawl's per-round
``extracted`` snapshots into the documents-table contract
``(doc_id, text, lang, source, n_chars)`` that every pipeline operator
in :mod:`queries_ml` / :mod:`queries_pipeline` consumes.

This is the seam that makes the two halves of the repo ONE system: the
engine's output (reference live path, ``geocrawl/geocrawler.go:14-63``
extract-per-file) becomes the input of the dedup / quality / mixing
suite without any format adapter in between — a user runs
``sf = corpus_from_crawl(spark, eng.io, out)`` and every
``queries()`` entry works on ``sf`` unchanged.

Scale shape: one projection over the union of round partitions (the
extracted table is already round-partitioned on disk, so the read
prunes like every other engine table), an optional broadcast-size join
against the pages dimension for ``lang``, and a single parquet write.
No shuffle beyond the write's own partitioning; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .canon import host_expr
from .checkpoint import TableIO
from .frontier import read_all_rounds


def corpus_documents(
    spark: SparkSession, io: TableIO, pages: DataFrame | None = None
) -> DataFrame:
    """The documents-contract DataFrame for a finished crawl.

    - ``doc_id``: ``xxhash64(url)`` — deterministic across resumes and
      re-runs (the engine guarantees one extracted row per url: the
      seen filter admits each canonical url once).  Collisions at
      10^10 urls are birthday-expected ~n^2/2^65 = ~2.7 for the whole
      corpus — O(1) but NOT negligible at the design point, so
      downstream must not assume doc_id uniqueness for correctness:
      keeper election tolerates a collision (min(doc_id) just picks a
      different keeper), but pipelines keying exact identity on doc_id
      should swap in the (round, fetch_seq) pair from ``crawl_log``.
    - ``source``: the politeness host (:func:`canon.host_expr`) — the
      natural mixing stratum the reports (source_gini,
      topic_source_mix, host_quality_rollup) group by.
    - ``lang``: joined from the ``pages`` corpus when provided (the
      same DataFrame the engine crawled — urls match by construction),
      else ``'und'``.
    """
    ext = read_all_rounds(spark, io, "extracted")
    if ext is None:
        raise ValueError("no committed extracted tables in this crawl")
    d = ext.select(
        F.xxhash64("url").alias("doc_id"),
        F.col("text_extracted").alias("text"),
        host_expr(F.col("url")).alias("source"),
        F.length("text_extracted").cast("long").alias("n_chars"),
        "url",
    )
    if pages is not None:
        d = d.join(F.broadcast(pages.select("url", "lang")), "url", "left")
        lang = F.coalesce("lang", F.lit("und"))
    else:
        lang = F.lit("und")
    return d.select("doc_id", "text", lang.alias("lang"), "source", "n_chars")


def capture_index(spark: SparkSession, io: TableIO) -> DataFrame:
    """CDX-style capture index over a crawl's REAL extracted rounds:
    one row per URL with ``(surt, url, n_captures, last_round,
    last_content_length, last_digest)`` where the latest capture wins
    by round (each url is extracted at most once per round, so round
    IS the capture timestamp).  The operational twin of the
    ``cdx_latest_capture`` oracle query — the engine's ``refresh()``
    loop produces the multi-capture rows (a refreshed URL re-extracts
    in a later round), and this index is what a reader consults to get
    the CURRENT text plus the change history depth, exactly a web
    archive's CDX latest-capture semantics (the reference analog:
    latest-document-wins lookups over the Mongo store,
    ``ancillary/mongoqueries.txt:3``).

    Scale shape: the extracted read prunes round partitions like every
    engine table; one window keyed on url (the same hash-partitioned
    shuffle the seen filter already keys on), no global sort; the SURT
    key is pure column math riding the same pass."""
    from pyspark.sql import Window

    from .canon import surt_expr

    ext = read_all_rounds(spark, io, "extracted")
    if ext is None:
        raise ValueError("no committed extracted tables in this crawl")
    w = Window.partitionBy("url").orderBy(F.desc("round"))
    wc = Window.partitionBy("url")
    return (
        ext.select(
            "url",
            "round",
            "content_length",
            F.md5(F.encode("text_extracted", "UTF-8")).alias("digest"),
        )
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_captures", F.count("*").over(wc))
        .filter(F.col("rn") == 1)
        .select(
            surt_expr(F.col("url")).alias("surt"),
            "url",
            F.col("n_captures").cast("long").alias("n_captures"),
            F.col("round").cast("long").alias("last_round"),
            F.col("content_length").cast("long").alias("last_content_length"),
            F.col("digest").alias("last_digest"),
        )
    )


def corpus_from_crawl(
    spark: SparkSession,
    io: TableIO,
    out_dir: str,
    pages: DataFrame | None = None,
) -> str:
    """Write ``out_dir/documents.parquet`` in the documents contract and
    return ``out_dir`` — directly usable as the ``sf_dir`` argument of
    every pipeline query."""
    corpus_documents(spark, io, pages).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )
    return out_dir
