"""Web-index operators: the URL-key and capture-index algebra a
Common-Crawl-style archive runs OVER the crawl this engine produces.

Reference parity: the reference's crawl emits one record per discovered
file and keys its Mongo metadata store by a canonical name
(``geolib/walkers.go:49-63``, ``ancillary/mongoqueries.txt``); the
web-scale analog of "canonical key + latest capture wins" is the
SURT / CDX index pair every public web archive uses (the formats are
public: Wayback's SURT ordering and the CDX(J) capture index).  These
four operators close that loop as first-class oracle-gated queries:

- :func:`surt_keys`            — SURT canonical key per URL (G11's sibling)
- :func:`cdx_latest_capture`   — latest-capture-wins CDX rollup (A9 analog)
- :func:`pld_rollup`           — registrable-domain (PLD) extraction via a
                                 broadcast public-suffix dimension (H1's
                                 budget key at archive scale is the PLD,
                                 not the raw host)
- :func:`outlink_degree_hist`  — log2 out-degree histogram of the host
                                 link graph (the shape check a crawl
                                 frontier runs before trusting PageRank)
- :func:`warc_roundtrip`       — WARC/1.0 (ISO 28500) record synthesis
                                 + generic parse-back, asserting the
                                 byte-identical-text invariant at the
                                 storage-format boundary
- :func:`postings_size_est`    — delta+varint byte estimate for the
                                 inverted index ``bm25_topk`` builds

Scale shape: every operator is one corpus scan plus (at most) one
broadcast join against a tiny dimension or one groupBy on a key whose
cardinality is hosts/buckets, never documents.  All arithmetic is
integer or exact-string so the DuckDB twins are hash-identical by
construction.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .queries_core import _q, _t

# ---------------------------------------------------------------------------
# shared deterministic URL synthesis (multi-label hosts, varied suffixes)
# ---------------------------------------------------------------------------

# Tiny deterministic subset of the (public) suffix list: enough to force
# the length-precedence decision a real PSL lookup makes (two-label
# suffixes must beat their one-label tails: doc.co.uk -> doc.co.uk, NOT
# co.uk's tail "uk" -> "co.uk").
_PSL = ["com", "org", "net", "io", "co.uk", "com.au", "gov.uk"]

# host = [www.]<sub.>d<doc_id%13>.<suffix(doc_id%7)>; the www label is
# dropped by SURT/PLD canonicalization, the optional sub label is not.
_N_NAME, _N_SUF = 13, len(_PSL)


def _host_expr():
    """Deterministic multi-label host per doc_id (Spark side)."""
    name = F.concat(F.lit("d"), (F.col("doc_id") % _N_NAME).cast("string"))
    suf = F.element_at(
        F.array(*[F.lit(s) for s in _PSL]), (F.col("doc_id") % _N_SUF + 1).cast("int")
    )
    www = F.when(F.col("doc_id") % 3 == 0, F.lit("www.")).otherwise(F.lit(""))
    sub = F.when(F.col("doc_id") % 2 == 1, F.lit("s.")).otherwise(F.lit(""))
    return F.concat(www, sub, name, F.lit("."), suf)


def _host_sql() -> str:
    """Same host in DuckDB SQL."""
    sufs = ", ".join(f"'{s}'" for s in _PSL)
    return f"""
      case when doc_id % 3 = 0 then 'www.' else '' end
      || case when doc_id % 2 = 1 then 's.' else '' end
      || 'd' || (doc_id % {_N_NAME})::varchar || '.'
      || list_extract([{sufs}], (doc_id % {_N_SUF})::int + 1)
    """


# ---------------------------------------------------------------------------
# SURT canonical keys
# ---------------------------------------------------------------------------


@_q(
    "surt_keys",
    f"""
    with h as (
      select doc_id, {_host_sql()} as host from documents
    )
    select doc_id,
           list_aggregate(
             list_reverse(string_split(regexp_replace(host, '^www\\.', ''), '.')),
             'string_agg', ','
           ) || ')/d/' || doc_id::varchar as surt
    from h
    order by doc_id
    """,
)
def surt_keys(spark, sf_dir):
    """SURT (Sort-friendly URI Reordering Transform) key per URL: strip
    the ``www.`` label, reverse the remaining host labels, join with
    commas, close with ``)`` and the path.  ``s.d3.co.uk/d/42`` ->
    ``uk,co,d3,s)/d/42``.  The public Wayback/Common-Crawl index key —
    it makes one ORDER BY cluster every capture of a registrable domain
    together, so a range scan over the index IS the per-domain crawl
    history (the property the reference gets from Mongo's _id index,
    ``ancillary/mongoqueries.txt``).

    Spark side is the GENERIC transform (:func:`canon.surt_expr` over a
    full URL — authority extraction, www strip, label reversal, path
    carry, all JVM column ops); the oracle runs DuckDB's independent
    list kernels over the same host, so the two engines agree only if
    the canonicalization chain itself agrees.  Scale: one scan, zero
    shuffles (the ORDER BY is presentation-only at the driver gate; at
    archive scale the key feeds a range-partitioned write instead)."""
    from .canon import surt_expr

    d = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("http://"), _host_expr(), F.lit("/d/"), F.col("doc_id").cast("string")
    )
    return d.select("doc_id", surt_expr(url).alias("surt")).orderBy("doc_id")


# ---------------------------------------------------------------------------
# CDX latest-capture index
# ---------------------------------------------------------------------------


@_q(
    "cdx_latest_capture",
    """
    with cap as (
      select 'com,site' || (user_id % 25)::varchar || ')/p/'
               || (event_id % 97)::varchar as urlkey,
             event_id, ts, md5(props) as digest
      from events
    ),
    rk as (
      select urlkey, digest,
             floor(epoch(ts))::bigint as ts_epoch,
             row_number() over (
               partition by urlkey order by ts desc, event_id desc
             ) as rn,
             count(*) over (partition by urlkey) as n_captures
      from cap
    )
    select urlkey, n_captures::bigint as n_captures,
           ts_epoch as last_ts, digest as last_digest
    from rk where rn = 1
    order by urlkey
    """,
)
def cdx_latest_capture(spark, sf_dir):
    """CDX-style capture index rollup: many timestamped captures per
    URL key -> the latest capture wins (ts desc, capture id as the
    deterministic tiebreak), plus the capture count.  This is the
    read-side contract of a web archive's CDX index and the dedup rule
    an incremental recrawl applies before re-storing a page (pairs with
    the engine's ``refresh()`` loop: n_captures is its change-rate
    numerator).  Reference analog: latest-document-wins keyed lookups
    over the Mongo store (``ancillary/mongoqueries.txt:3``).

    Spark: one window (row_number + count over the urlkey partition) —
    a single hash-partitioned shuffle on urlkey, no global sort; the
    digest rides the window so no second join.  Timestamps are emitted
    as epoch BIGINT in both engines (hash-portable by construction)."""
    ev = _t(spark, sf_dir, "events")
    cap = ev.select(
        F.concat(
            F.lit("com,site"),
            (F.col("user_id") % 25).cast("string"),
            F.lit(")/p/"),
            (F.col("event_id") % 97).cast("string"),
        ).alias("urlkey"),
        "event_id",
        "ts",
        F.md5(F.col("props")).alias("digest"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("urlkey").orderBy(F.desc("ts"), F.desc("event_id"))
    wc = Window.partitionBy("urlkey")
    return (
        cap.withColumn("rn", F.row_number().over(w))
        .withColumn("n_captures", F.count("*").over(wc))
        .filter(F.col("rn") == 1)
        .select(
            "urlkey",
            F.col("n_captures").cast("long").alias("n_captures"),
            F.unix_timestamp("ts").cast("long").alias("last_ts"),
            F.col("digest").alias("last_digest"),
        )
        .orderBy("urlkey")
    )


# ---------------------------------------------------------------------------
# registrable-domain (PLD) extraction + rollup
# ---------------------------------------------------------------------------


def _pld_case_sql() -> str:
    """Analytic expected PLD: name label + matched suffix (the www/sub
    labels never survive; two-label suffixes by construction of _PSL)."""
    sufs = ", ".join(f"'{s}'" for s in _PSL)
    return f"""
      'd' || (doc_id % {_N_NAME})::varchar || '.'
      || list_extract([{sufs}], (doc_id % {_N_SUF})::int + 1)
    """


@_q(
    "pld_rollup",
    f"""
    with p as (
      select doc_id, {_pld_case_sql()} as pld, {_host_sql()} as host
      from documents
    )
    select pld, count(distinct host)::bigint as n_hosts,
           count(*)::bigint as n_docs
    from p group by pld order by pld
    """,
)
def pld_rollup(spark, sf_dir):
    """Registrable-domain (pay-level-domain) extraction against a
    public-suffix dimension, then a per-PLD rollup.  At archive scale
    the politeness/budget key is the PLD, not the raw host — one
    registrable domain fans out thousands of ``s.*`` subdomains and a
    per-host budget alone lets it monopolize the frontier (the engine's
    H1 budgets would key on this column on a real crawl).

    Spark is the GENERIC lookup, not the analytic shortcut the oracle
    states: split the host into labels, form the last-1 and last-2
    label tails as candidate suffixes, broadcast-left-join EACH against
    the suffix dimension (7 rows here; the full public list is ~9k —
    still broadcast territory), and coalesce longest-first, so the
    two-label match wins without any per-doc aggregation.  The oracle
    derives the expected PLD analytically from doc_id, so the join
    path is independently checked end to end.

    Scale: one scan + two broadcast hash joins (ZERO doc-keyed
    shuffles — an earlier explode+groupBy-max draft paid one; the
    coalesce-precedence rewrite removed it, plan-checked) + one
    groupBy on PLD (cardinality ~registrable domains, map-side
    combinable)."""
    psl2 = spark.createDataFrame(
        [(s, s.count(".") + 1) for s in _PSL], "suf string, nlab int"
    )
    d = _t(spark, sf_dir, "documents")
    host = _host_expr()
    labs = F.split(F.regexp_replace(host, r"^www\.", ""), r"\.")
    h = d.select(
        "doc_id",
        host.alias("host"),
        labs.alias("labs"),
        F.concat_ws(".", F.slice(labs, -1, 1)).alias("c1"),
        F.concat_ws(".", F.slice(labs, -2, 2)).alias("c2"),
    )
    p1 = F.broadcast(psl2.select(F.col("suf").alias("s1"), F.col("nlab").alias("n1")))
    p2 = F.broadcast(psl2.select(F.col("suf").alias("s2"), F.col("nlab").alias("n2")))
    m = h.join(p2, F.col("c2") == F.col("s2"), "left").join(
        p1, F.col("c1") == F.col("s1"), "left"
    )
    # longest matched suffix wins; PLD = one label before it + the suffix
    best = m.filter(F.col("s2").isNotNull() | F.col("s1").isNotNull()).select(
        "doc_id",
        "host",
        F.concat(
            F.element_at(
                F.col("labs"), -(F.coalesce(F.col("n2"), F.col("n1")) + 1)
            ),
            F.lit("."),
            F.coalesce(F.col("s2"), F.col("s1")),
        ).alias("pld"),
    )
    return (
        best.groupBy("pld")
        .agg(
            F.countDistinct("host").cast("long").alias("n_hosts"),
            F.count("*").cast("long").alias("n_docs"),
        )
        .orderBy("pld")
    )


# ---------------------------------------------------------------------------
# out-degree histogram of the host link graph
# ---------------------------------------------------------------------------


@_q(
    "outlink_degree_hist",
    """
    with rawe as (
      select source as u,
             'src' || (((doc_id % 20) * (doc_id % 20) + 3) % 20) as v
      from documents
      union
      select source as u,
             'src' || (((doc_id % 20) * (doc_id % 20) * (doc_id % 20) + 11) % 20) as v
      from documents
    ),
    degs as (
      select 'out' as direction, count(*)::bigint as deg from rawe group by u
      union all
      select 'in' as direction, count(*)::bigint as deg from rawe group by v
    )
    select direction, length(bin(deg))::bigint as log2_bucket,
           count(*)::bigint as n_hosts,
           sum(deg)::bigint as n_edges
    from degs group by 1, 2 order by 1, 2
    """,
)
def outlink_degree_hist(spark, sf_dir):
    """Log2-bucketed degree histogram of the host link graph, out- and
    in-direction — the one-page shape check a frontier runs before
    trusting link-derived priorities (a heavy top IN bucket = a handful
    of mega-cited hosts that will skew every groupBy keyed on the link
    target; the engine's salted politeness pop and the PageRank flow
    join both care).  Same deterministic edge synthesis as
    ``host_pagerank`` so the two queries describe one graph — the
    quadratic/cubic residue targets make the in-degree side genuinely
    skewed while out-degrees stay near-uniform, exactly the asymmetry
    real webgraphs show.

    The bucket is ``length(bin(degree))`` = floor(log2)+1 — an INTEGER
    via the binary-digit count in both engines (no float log2 edge
    cases at exact powers of two).  Scale: two groupBys keyed on host
    (map-side combinable) feeding one <=128-row histogram groupBy."""
    d = _t(spark, sf_dir, "documents")
    m = F.col("doc_id") % 20
    tgt = lambda poly: F.concat(F.lit("src"), poly.cast("string"))  # noqa: E731
    rawe = (
        d.select(F.col("source").alias("u"), tgt((m * m + 3) % 20).alias("v"))
        .unionByName(
            d.select(F.col("source").alias("u"), tgt((m * m * m + 11) % 20).alias("v"))
        )
        .distinct()
    )
    degs = (
        rawe.groupBy("u")
        .agg(F.count("*").cast("long").alias("deg"))
        .select(F.lit("out").alias("direction"), "deg")
        .unionByName(
            rawe.groupBy("v")
            .agg(F.count("*").cast("long").alias("deg"))
            .select(F.lit("in").alias("direction"), "deg")
        )
    )
    return (
        degs.select(
            "direction",
            F.length(F.bin(F.col("deg"))).cast("long").alias("log2_bucket"),
            "deg",
        )
        .groupBy("direction", "log2_bucket")
        .agg(
            F.count("*").cast("long").alias("n_hosts"),
            F.sum("deg").cast("long").alias("n_edges"),
        )
        .orderBy("direction", "log2_bucket")
    )


# ---------------------------------------------------------------------------
# WARC record round-trip
# ---------------------------------------------------------------------------


@_q(
    "warc_roundtrip",
    """
    with rec as (
      select doc_id, text,
             'WARC/1.0' || chr(13) || chr(10)
             || 'WARC-Type: response' || chr(13) || chr(10)
             || 'WARC-Target-URI: http://host' || (doc_id % 7)::varchar
               || '.example.org/p/' || doc_id::varchar || '.html'
               || chr(13) || chr(10)
             || 'Content-Length: ' || length(text)::varchar
               || chr(13) || chr(10) || chr(13) || chr(10)
             || text as warc
      from documents
    ),
    parsed as (
      select doc_id, text,
             regexp_extract(warc, 'WARC-Target-URI: ([^\\r]+)', 1) as uri,
             regexp_extract(warc, 'Content-Length: ([0-9]+)', 1)::bigint
               as content_length,
             substr(
               warc,
               strpos(warc, chr(13)||chr(10)||chr(13)||chr(10)) + 4
             ) as body
      from rec
    )
    select doc_id, uri, content_length,
           (length(body) = content_length and md5(body) = md5(text))
             as roundtrip_ok
    from parsed order by doc_id
    """,
)
def warc_roundtrip(spark, sf_dir):
    """WARC/1.0 record synthesis + parse-back — the storage format this
    crawl tier actually reads and writes (ISO 28500, the Common Crawl
    container).  Each doc is serialized as a response record (version
    line, WARC-Type / WARC-Target-URI / Content-Length headers, CRLF
    CRLF, body) and then parsed back by a GENERIC header scanner:
    regexp header extraction + split-at-first-blank-line body slicing —
    all JVM string kernels, no Python.  ``roundtrip_ok`` asserts the
    north-rule invariant at the format boundary: the body that comes
    back out is byte-identical (length AND md5) to the text that went
    in.  The oracle builds and parses the same record with DuckDB's
    independent string engine.

    Scale: one scan, zero shuffles, zero UDFs — the parse side is the
    shape a `mapInPandas`-free WARC reader takes over raw archive
    bytes (headers are ASCII; binary payloads ride a binary column)."""
    d = _t(spark, sf_dir, "documents")
    crlf = "\r\n"
    uri = F.concat(
        F.lit("http://host"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.org/p/"),
        F.col("doc_id").cast("string"),
        F.lit(".html"),
    )
    warc = F.concat(
        F.lit("WARC/1.0" + crlf),
        F.lit("WARC-Type: response" + crlf),
        F.lit("WARC-Target-URI: "), uri, F.lit(crlf),
        F.lit("Content-Length: "), F.length("text").cast("string"),
        F.lit(crlf + crlf),
        F.col("text"),
    )
    rec = d.select("doc_id", "text", warc.alias("warc"))
    parsed = rec.select(
        "doc_id",
        "text",
        F.regexp_extract("warc", r"WARC-Target-URI: ([^\r]+)", 1).alias("uri"),
        F.regexp_extract("warc", r"Content-Length: ([0-9]+)", 1)
        .cast("long")
        .alias("content_length"),
        F.element_at(F.split("warc", r"\r\n\r\n", 2), 2).alias("body"),
    )
    return parsed.select(
        "doc_id",
        "uri",
        "content_length",
        (
            (F.length("body") == F.col("content_length"))
            & (F.md5(F.encode("body", "UTF-8")) == F.md5(F.encode("text", "UTF-8")))
        ).alias("roundtrip_ok"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# posting-list compression estimate
# ---------------------------------------------------------------------------


@_q(
    "postings_size_est",
    """
    with p as (
      select distinct unnest(string_split(text, ' ')) as term, doc_id
      from documents
    ),
    d as (
      select term, doc_id,
             coalesce(
               doc_id - lag(doc_id) over (partition by term order by doc_id),
               doc_id + 1
             ) as delta
      from p
    )
    select substr(term, 1, 1) as t0,
           count(distinct term)::bigint as n_terms,
           count(*)::bigint as n_postings,
           sum((length(bin(delta)) + 6) // 7)::bigint as varint_bytes,
           (count(*) * 8)::bigint as raw_bytes
    from d group by 1 order by 1
    """,
)
def postings_size_est(spark, sf_dir):
    """Delta+varint size estimate for the inverted index ``bm25_topk``
    builds — the capacity-planning query an index shard layout starts
    from (how many bytes per posting AFTER gap encoding, per term
    prefix).  Postings are (term, doc_id) distinct; per term the
    doc_ids are gap-encoded (first entry absolute+1 so every delta is
    positive) and each gap costs ``ceil(bits/7)`` varint bytes,
    computed as the INTEGER binary-digit count — exact in both engines.

    Scale: one scan + explode (the per-doc ``array_distinct`` runs
    BEFORE the explode, so (term, doc_id) is unique by construction and
    the plan pays no global distinct exchange), one shuffle keyed on
    term for the lag window (same key the index build itself shuffles
    on, so at scale the two share one exchange), then a <=256-row
    prefix rollup.  raw_bytes (8 B/posting uncompressed) rides along so
    the estimate reads as a ratio without a second query."""
    from pyspark.sql import Window

    from .queries_ml import _words

    d = _t(spark, sf_dir, "documents")
    p = d.select(
        F.explode(F.array_distinct(_words(F.col("text")))).alias("term"), "doc_id"
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    dl = p.withColumn(
        "delta",
        F.coalesce(
            F.col("doc_id") - F.lag("doc_id").over(w), F.col("doc_id") + 1
        ),
    )
    return (
        dl.select(
            F.substring("term", 1, 1).alias("t0"),
            "term",
            ((F.length(F.bin(F.col("delta"))) + 6) / 7).cast("long").alias("vb"),
        )
        .groupBy("t0")
        .agg(
            F.countDistinct("term").cast("long").alias("n_terms"),
            F.count("*").cast("long").alias("n_postings"),
            F.sum("vb").cast("long").alias("varint_bytes"),
            (F.count("*") * 8).cast("long").alias("raw_bytes"),
        )
        .orderBy("t0")
    )
