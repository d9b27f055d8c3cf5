"""Structured Streaming front-end (SURVEY.md §H).

The reference is a bounded batch program, and the engine's crawl loop is
deliberately batch-iterative (deterministic replay, SURVEY.md §1.3).
This module is the streaming INGEST side a production deployment puts in
front of it: pages land continuously (e.g. WARC ingestion), and we
maintain watermarked per-host arrival metrics and an append-only
extraction stream that the next crawl round reads as its pages snapshot.

Kept small on purpose: the streaming surface reuses the exact same
column expressions as the batch path (canon/host/assets), demonstrating
that every operator here is streaming-safe (no global sorts, no
unbounded state beyond the windowed aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .assets import extract_links_udf, extract_text_udf
from .canon import canonicalize_url_expr, host_expr

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def read_page_stream(spark, path: str, max_files_per_trigger: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


TSV_LINE_SCHEMA = "url string, warc_ts timestamp, lang string, _bad string"


def read_tsv_line_stream(
    spark, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """A6 analog on the streaming side: raw TSV lines parsed PERMISSIVEly —
    a malformed line becomes a row with ``_bad`` set (the dead-letter
    bucket) instead of failing the stream, exactly the reference's
    "Input not recognised" + continue (geoparse/geoparser.go:162-167).
    """
    lines = (
        spark.readStream.option("maxFilesPerTrigger", max_files_per_trigger)
        .text(path)
    )
    rec = F.from_csv(
        F.col("value"),
        TSV_LINE_SCHEMA,
        {"sep": "\t", "mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_bad"},
    )
    return lines.select(rec.alias("r")).select("r.*")


def host_arrival_metrics(pages: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Watermarked per-host, per-hour arrival counts + byte volume.

    Late pages beyond the watermark are dropped (documented semantics);
    state is bounded by (hosts x open windows).
    """
    canon = canonicalize_url_expr(F.col("url"))
    return (
        pages.withColumn("host", host_expr(canon))
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", "1 hour").alias("w"), F.col("host"))
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(F.length("html")).alias("n_bytes"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "host",
            "n_pages",
            "n_bytes",
        )
    )


def streaming_extract(pages: DataFrame) -> DataFrame:
    """Stateless streaming extraction: text + out-links per page —
    the same vectorized UDFs as the batch path, running per micro-batch."""
    return pages.select(
        canonicalize_url_expr(F.col("url")).alias("url"),
        "warc_ts",
        extract_text_udf("html").alias("text_extracted"),
        F.size(extract_links_udf("html")).alias("n_links"),
    )
