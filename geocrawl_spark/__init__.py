"""geocrawl_spark — a brand-new PySpark-native URL-frontier crawl engine.

Re-expresses the capabilities of the reference Go pipeline
(monkeybutter/geocrawler, see /root/reference) as an idiomatic Spark
DataFrame program per SURVEY.md:

- frontier scan + regex gate        (reference: geocrawl/geocrawler.go:43-53)
- URL-seen dedup (sharded filter)   (reference: implicit in geolib/walkers.go:53)
- per-host politeness budgets       (reference: geolib/conclimiter.go:7-25)
- vectorized extraction UDFs        (reference: geolib/gdal.go:155-190)
- filename-regex parse + timestamps (reference: geoparse/geoparser.go:40-115)
- geotransform -> polygon WKT       (reference: geolib/geom.go:170-178)
- checkpointed rounds + resume      (reference: absent; required by north_rule)

All heavy computation is either JVM-side column expressions or
Arrow-vectorized pandas UDFs; there is no per-row Python UDF anywhere.
"""

__version__ = "0.1.0"
