"""Structured Streaming front-end: availableNow micro-batch run over a
parquet directory, watermarked windowed agg + stateless extraction."""

import pyspark.sql.functions as F

from geocrawl_spark import synth
from geocrawl_spark.streaming import (
    PAGES_SCHEMA,
    host_arrival_metrics,
    read_page_stream,
    streaming_extract,
)


def _write_pages(spark, tmp_path):
    pdf = synth.gen_pages(60, 4)
    spark.createDataFrame(pdf, PAGES_SCHEMA).repartition(4).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "pages"))
    return str(tmp_path / "pages")


def test_streaming_extract_matches_batch(spark, tmp_path):
    path = _write_pages(spark, tmp_path)
    stream = read_page_stream(spark, path, max_files_per_trigger=1)
    out = str(tmp_path / "out")
    q = (
        streaming_extract(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    batch = streaming_extract(spark.read.parquet(path))
    a = {(r["url"], r["text_extracted"], r["n_links"]) for r in got.collect()}
    b = {(r["url"], r["text_extracted"], r["n_links"]) for r in batch.collect()}
    assert a == b and len(a) == 60


def test_host_arrival_metrics(spark, tmp_path):
    path = _write_pages(spark, tmp_path)
    stream = read_page_stream(spark, path)
    out = str(tmp_path / "metrics")
    q = (
        host_arrival_metrics(stream)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    # append mode emits only watermark-closed windows; with availableNow the
    # final watermark closes all but the max-event-time window
    batch = (
        spark.read.parquet(path)
        .groupBy(F.window("warc_ts", "1 hour"), F.lit(1))
        .count()
    )
    assert got.count() <= batch.count()
    assert got.select(F.sum("n_pages")).collect()[0][0] is not None


def test_tsv_line_stream_permissive(spark, tmp_path):
    """A6 streaming analog: malformed TSV lines flow through as dead-letter
    rows (_bad set) instead of killing the stream."""
    from geocrawl_spark.streaming import read_tsv_line_stream

    src = tmp_path / "tsv"
    src.mkdir()
    good = [
        f"http://h{i}.org/p.html\t2024-01-01 00:0{i}:00\ten" for i in range(5)
    ]
    bad = ["!garbage line", "also not\ta timestamp\there"]
    (src / "part1.txt").write_text("\n".join(good[:3] + bad[:1]) + "\n")
    (src / "part2.txt").write_text("\n".join(good[3:] + bad[1:]) + "\n")

    out = str(tmp_path / "out")
    q = (
        read_tsv_line_stream(spark, str(src))
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 7
    assert got.filter(F.col("_bad").isNotNull()).count() == 2
    ok = got.filter(F.col("_bad").isNull())
    assert ok.count() == 5 and ok.filter(F.col("warc_ts").isNull()).count() == 0
