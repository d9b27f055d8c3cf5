"""Driver-oracle query suite, part 1: crawl-semantics operators expressed
over the driver's generic tables, plus the relational operator sweep
(SURVEY.md §5.2 item 3 — covers B1/B3/B5/B6, C1-C3, D1/D3/D4, E1-E3, F,
G3/G4/G5/G7/G8/G11/G12).

Every query has a Spark callable ``(spark, sf_dir) -> DataFrame`` and an
equivalent DuckDB SQL string; computed columns are aliased identically on
both sides (driver hash-compares values by sorted column name).  Float
aggregates are rounded on both sides to absorb summation-order ulps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .canon import canonicalize_url_expr, host_expr
from .gdalmeta import nc_times_expr
from .parsers import java_pattern
from .politeness import robots_denied_expr

SPARK_QUERIES: dict = {}
ORACLE_SQL: dict[str, str] = {}


def _q(name: str, sql: str | None = None):
    def deco(fn):
        SPARK_QUERIES[name] = fn
        if sql is not None:
            ORACLE_SQL[name] = sql
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# crawl-semantics operators (graft core, SQL-expressible projections)
# ---------------------------------------------------------------------------

# G11: URL canonicalization — oracle states the *expected* canonical form
# analytically, so it independently checks the whole rule chain.
@_q(
    "canon_urls",
    """
    select doc_id,
           'http://host' || (doc_id % 7)::varchar || '.example.org/p/' ||
             doc_id::varchar || '.html' as url_canon,
           'host' || (doc_id % 7)::varchar || '.example.org' as host
    from documents
    """,
)
def canon_urls(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("HTTP://Host"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".Example.ORG:80/p/"),
        F.col("doc_id").cast("string"),
        F.lit(".html#frag"),
    )
    # two-stage projection: host_expr over the PROJECTED canonical column,
    # not over the canon expression — expression substitution would inline
    # the whole canonicalization tree a second time (every row pays it
    # twice; measured 5x slower at sf0.1 — the _grams_expr lesson)
    c = d.select(
        "doc_id", canonicalize_url_expr(raw).alias("url_canon")
    )
    return c.select(
        "doc_id", "url_canon", host_expr(F.col("url_canon")).alias("host")
    )


# E1: the politeness pop shape — per-host top-3 by (priority, url)
@_q(
    "host_topk_pop",
    """
    select doc_id, host, priority from (
      select doc_id,
             'host' || (doc_id % 7)::varchar as host,
             doc_id % 5 as priority,
             row_number() over (
               partition by 'host' || (doc_id % 7)::varchar
               order by doc_id % 5, doc_id
             ) as rk
      from documents) where rk <= 3
    """,
)
def host_topk_pop(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("host"), (F.col("doc_id") % 7).cast("string")).alias("host"),
        (F.col("doc_id") % 5).alias("priority"),
    )
    w = Window.partitionBy("host").orderBy("priority", "doc_id")
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "host", "priority")
    )


# B1: the regex gate before expensive work (geocrawl/geocrawler.go:47)
@_q(
    "regex_gate_count",
    """
    select lang, count(*)::bigint as n_match
    from documents
    where regexp_matches(text, 'scan [a-z]+ merge')
    group by lang
    """,
)
def regex_gate_count(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (
        d.filter(F.col("text").rlike("scan [a-z]+ merge"))
        .groupBy("lang")
        .agg(F.count("*").cast("long").alias("n_match"))
    )


# G1-G3: filename parse + parseTime over synthesized landsat names
@_q(
    "parse_landsat_names",
    """
    select doc_id,
           (2013 + doc_id % 5)::varchar as year,
           lpad((1 + doc_id % 365)::varchar, 3, '0') as julian_day,
           make_timestamp(2013 + doc_id % 5, 1, 1, 0, 0, 0)
             + (doc_id % 365) * interval 1 day as ts
    from documents
    """,
)
def parse_landsat_names(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    fname = F.concat(
        F.lit("LC8"),
        F.lpad((F.col("doc_id") % 233).cast("string"), 3, "0"),
        F.lpad((F.col("doc_id") % 248).cast("string"), 3, "0"),
        (2013 + F.col("doc_id") % 5).cast("string"),
        F.lpad((1 + F.col("doc_id") % 365).cast("string"), 3, "0"),
        F.lit("LGN00_B1.TIF"),
    )
    jp = java_pattern("landsat")
    year = F.regexp_extract(fname, jp, 4)
    jd = F.regexp_extract(fname, jp, 5)
    ts = F.make_timestamp(
        year.cast("int"), F.lit(1), F.lit(1), F.lit(0), F.lit(0), F.lit(0)
    ) + F.make_interval(
        F.lit(0), F.lit(0), F.lit(0), jd.cast("int") - 1, F.lit(0), F.lit(0), F.lit(0)
    )
    return d.select(
        "doc_id", year.alias("year"), jd.alias("julian_day"), ts.alias("ts")
    )


# G12: geotransform -> footprint polygon as pure column math
@_q(
    "geotransform_polygon",
    """
    select l_orderkey, l_linenumber,
           printf('POLYGON ((%f %f,%f %f,%f %f,%f %f,%f %f))',
                  gx, gy, gx, gy + ys * -0.25, gx + xs * 0.25, gy + ys * -0.25,
                  gx + xs * 0.25, gy, gx, gy) as polygon
    from (select l_orderkey, l_linenumber,
                 (l_partkey % 720) * 0.5 - 180 as gx,
                 90 - (l_suppkey % 360) * 0.5 as gy,
                 100 + l_linenumber * 10 as xs,
                 80 + (l_partkey % 7) * 20 as ys
          from lineitem)
    """,
)
def geotransform_polygon(spark, sf_dir):
    from .geometry import polygon_wkt_expr

    li = _t(spark, sf_dir, "lineitem")
    gt = F.array(
        (F.col("l_partkey") % 720).cast("double") * 0.5 - 180,
        F.lit(0.25),
        F.lit(0.0),
        90 - (F.col("l_suppkey") % 360).cast("double") * 0.5,
        F.lit(0.0),
        F.lit(-0.25),
    )
    xs = (100 + F.col("l_linenumber") * 10).cast("int")
    ys = (80 + (F.col("l_partkey") % 7) * 20).cast("int")
    return li.select(
        "l_orderkey", "l_linenumber", polygon_wkt_expr(gt, xs, ys).alias("polygon")
    )


# G4+G5: netCDF "<unit> since <date>" time expansion (geolib/gdal.go:100-125)
@_q(
    "nc_time_expand",
    """
    select event_id,
           strftime(start_ts + to_seconds((trunc(v)::bigint * step)::bigint),
                    '%Y-%m-%dT%H:%M:%SZ') as t
    from (
      select event_id,
             case event_id % 3
               when 0 then timestamp '2000-01-01 00:00:00'
               when 1 then timestamp '1900-01-01 00:00:00'
               else timestamp '1970-01-01 00:00:00' end as start_ts,
             case event_id % 3 when 0 then 1 when 1 then 3600 else 86400 end as step,
             unnest([(event_id % 1000) + 0.5, (event_id % 7) + 0.25]) as v
      from events)
    """,
)
def nc_time_expand(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    units = F.element_at(
        F.array(
            F.lit("seconds since 2000-01-01 00:00:00.0"),
            F.lit("hours since 1900-1-1 0:0:0"),
            F.lit("days since 1970-01-01 00:00:00.0"),
        ),
        (F.col("event_id") % 3 + 1).cast("int"),
    )
    vals = F.format_string(
        "{%d.5,%d.25}", F.col("event_id") % 1000, F.col("event_id") % 7
    )
    return e.select(
        "event_id", F.explode(nc_times_expr(units, vals)).alias("t")
    )


# robots allow/deny gate (graft politeness; exists() higher-order fn)
@_q(
    "robots_gate",
    """
    select doc_id,
           (doc_id % 2 = 0 and doc_id % 3 = 1) as denied
    from documents
    """,
)
def robots_gate(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("http://h.org"),
        F.element_at(
            F.array(F.lit("/p/x.html"), F.lit("/private/y.html"), F.lit("/")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ),
    )
    disallow = F.when(
        F.col("doc_id") % 2 == 0, F.array(F.lit("/private/"))
    ).otherwise(F.array().cast("array<string>"))
    return d.select(
        "doc_id", robots_denied_expr(url, disallow).alias("denied")
    )


# REP precedence gate (RFC 9309): wildcards, $ anchors, longest-match,
# Allow overrides Disallow.  The oracle re-implements the decision
# independently: rules as (regex, pattern-length, is_allow) literals,
# winner = arg_max by (plen, allow-on-tie) over the matching rules.
@_q(
    "robots_precedence",
    """
    with d as (
      select doc_id,
             ['/p/x.html', '/private/y.html', '/private/open/z.html',
              '/p/17.html', '/p/17.htmlx'][(doc_id % 5 + 1)::int] as path
      from documents),
    rules(rx, plen, is_allow) as (values
      ('^/private/', 9, false),
      ('^/p/.*7\\.html$', 11, false),
      ('^/private/open/', 14, true)),
    m as (select d.doc_id, r.plen, r.is_allow
          from d left join rules r on regexp_matches(d.path, r.rx))
    select doc_id,
           coalesce(not arg_max(is_allow, plen * 2 + is_allow::int), false)
             as denied
    from m group by doc_id
    """,
)
def robots_precedence(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("http://h.org"),
        F.element_at(
            F.array(
                F.lit("/p/x.html"), F.lit("/private/y.html"),
                F.lit("/private/open/z.html"), F.lit("/p/17.html"),
                F.lit("/p/17.htmlx"),
            ),
            (F.col("doc_id") % 5 + 1).cast("int"),
        ),
    )
    disallow = F.array(F.lit("/private/"), F.lit("/p/*7.html$"))
    allow = F.array(F.lit("/private/open/"))
    return d.select(
        "doc_id", robots_denied_expr(url, disallow, allow).alias("denied")
    )


# robots.txt REP parsing (robots.parse_robots_txt — where the engine's
# robots dimension comes from on a real crawl): 25 synthetic robots.txt
# bodies built from nation keys exercise group selection (exact
# product-token beats *), comment stripping, case-insensitive directives,
# per-group Crawl-delay, and file-global Sitemap lines.  The oracle states
# the expected parse ANALYTICALLY from the same integer rules (the
# canon_urls pattern), independently checking the whole parser chain.
# Arrays flatten to '|'-joined strings and a missing crawl-delay becomes
# the -1 sentinel, so the value hash never sees engine-specific list or
# null materializations.
@_q(
    "robots_txt_parse",
    """
    with n as (select n_nationkey::BIGINT as k from nation)
    select 'n' || k::varchar || '.example.org' as host,
           case when k % 3 = 0 then '/g' || k::varchar || '/'
                else '/private' || k::varchar || '/' end as disallow_csv,
           case when k % 3 <> 0 and k % 2 = 1
                then '/private' || k::varchar || '/pub/' else '' end as allow_csv,
           (case when k % 3 = 0
                 then (case when k % 2 = 0 then k % 5 + 2 else -1 end)
                 when k % 2 = 0 then k % 5 + 1
                 else -1 end)::BIGINT as crawl_delay,
           case when k % 5 = 0
                then 'http://n' || k::varchar || '.example.org/sm'
                     || k::varchar || '.xml'
                else '' end as sitemap_csv
    from n
    """,
)
def robots_txt_parse(spark, sf_dir):
    from .robots import parse_robots_txt

    n = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("k")
    )
    k = F.col("k")
    ks = k.cast("string")
    host = F.concat(F.lit("n"), ks, F.lit(".example.org"))
    # body lines, each present per an integer rule on k; array_join drops
    # the null (absent) ones.  The star group always exists; every third
    # host adds a specific-agent group whose rules must WIN outright.
    lines = F.array(
        F.when(k % 4 == 0, F.lit("# synthetic robots")),
        F.when(
            k % 5 == 0,
            F.concat(
                F.lit("Sitemap: http://n"), ks,
                F.lit(".example.org/sm"), ks, F.lit(".xml"),
            ),
        ),
        F.lit("User-agent: *"),
        F.when(
            k % 7 == 0, F.concat(F.lit("DISALLOW: /private"), ks, F.lit("/"))
        ).otherwise(F.concat(F.lit("Disallow: /private"), ks, F.lit("/"))),
        F.when(
            k % 2 == 1, F.concat(F.lit("Allow: /private"), ks, F.lit("/pub/"))
        ),
        F.when(
            k % 2 == 0,
            F.concat(F.lit("Crawl-delay: "), (k % 5 + 1).cast("string")),
        ),
        F.when(k % 3 == 0, F.lit("User-Agent: GeoCrawl")),
        F.when(k % 3 == 0, F.concat(F.lit("Disallow: /g"), ks, F.lit("/"))),
        F.when(
            (k % 3 == 0) & (k % 2 == 0),
            F.concat(F.lit("Crawl-delay: "), (k % 5 + 2).cast("string")),
        ),
    )
    bodies = n.select(
        host.alias("host"), F.array_join(lines, "\n").alias("body")
    )
    return parse_robots_txt(bodies).select(
        "host",
        F.array_join("disallow", "|").alias("disallow_csv"),
        F.array_join("allow", "|").alias("allow_csv"),
        F.coalesce("crawl_delay", F.lit(-1)).cast("long").alias("crawl_delay"),
        F.array_join("sitemaps", "|").alias("sitemap_csv"),
    )


# effective politeness budget under crawl-delay (H1 + robots crawl-delay):
# eff = least(base + carry, max(1, floor(round_seconds / delay))), no cap
# when no positive delay — the exact expression CrawlEngine uses
# (politeness.crawl_delay_cap_expr), driven over synthetic per-host inputs.
@_q(
    "effective_budget",
    """
    select s_suppkey::bigint as host_id,
           least(
             s_suppkey % 5 + 1 + s_suppkey % 3,
             coalesce(
               case when s_suppkey % 4 <> 0
                    then greatest(1, floor(60 / ((s_suppkey % 4) * 15))::bigint)
               end,
               s_suppkey % 5 + 1 + s_suppkey % 3)
           )::bigint as budget
    from supplier
    """,
)
def effective_budget(spark, sf_dir):
    from .politeness import crawl_delay_cap_expr

    s = _t(spark, sf_dir, "supplier")
    base = F.col("s_suppkey") % 5 + 1
    carry = F.col("s_suppkey") % 3
    delay = F.when(
        F.col("s_suppkey") % 4 != 0, (F.col("s_suppkey") % 4) * 15
    )  # 15/30/45s delays; every 4th host advertises none
    uncapped = base + carry
    cap = crawl_delay_cap_expr(delay, round_seconds=60)
    return s.select(
        F.col("s_suppkey").cast("long").alias("host_id"),
        F.least(uncapped, F.coalesce(cap, uncapped)).cast("long").alias("budget"),
    )


# ---------------------------------------------------------------------------
# relational sweep (TPC-H-ish; C/D/E/F coverage)
# ---------------------------------------------------------------------------

@_q(
    "q1_pricing_summary",
    """
    select l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) as sum_qty,
           round(sum(l_extendedprice), 2) as sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) as sum_disc_price,
           round(avg(l_quantity), 4) as avg_qty,
           round(avg(l_discount), 4) as avg_disc,
           count(*)::bigint as count_order
    from lineitem
    where l_shipdate <= timestamp '1998-09-02 00:00:00'
    group by l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").cast("long").alias("count_order"),
        )
    )


@_q(
    "q3_shipping_priority",
    """
    select l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue,
           o_orderdate, o_orderpriority
    from customer join orders on c_custkey = o_custkey
                  join lineitem on l_orderkey = o_orderkey
    where c_mktsegment = 'BUILDING'
      and o_orderdate < timestamp '1997-03-15 00:00:00'
      and l_shipdate > timestamp '1997-03-15 00:00:00'
    group by l_orderkey, o_orderdate, o_orderpriority
    order by revenue desc, l_orderkey
    limit 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15 00:00:00").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@_q(
    "q5_revenue_by_nation",
    """
    select n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) as revenue
    from customer
      join orders on c_custkey = o_custkey
      join lineitem on l_orderkey = o_orderkey
      join supplier on l_suppkey = s_suppkey and c_nationkey = s_nationkey
      join nation on c_nationkey = n_nationkey
      join region on n_regionkey = r_regionkey
    where r_name = 'ASIA'
      and o_orderdate >= timestamp '1996-01-01 00:00:00'
      and o_orderdate < timestamp '1997-01-01 00:00:00'
    group by n_name
    """,
)
def q5_revenue_by_nation(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@_q(
    "top3_orders_per_customer",
    """
    select o_custkey, o_orderkey, o_totalprice from (
      select o_custkey, o_orderkey, o_totalprice,
             row_number() over (partition by o_custkey
                                order by o_totalprice desc, o_orderkey) as rk
      from orders) where rk <= 3
    """,
)
def top3_orders_per_customer(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@_q(
    "distinct_parts_per_supplier",
    """
    select l_suppkey, count(distinct l_partkey)::bigint as n_parts
    from lineitem group by l_suppkey
    """,
)
def distinct_parts_per_supplier(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").cast("long").alias("n_parts")
    )


@_q(
    "parts_with_orders_semi",
    """
    select p_partkey, p_brand from part
    where p_partkey in (select l_partkey from lineitem)
    """,
)
def parts_with_orders_semi(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    return p.join(li, p.p_partkey == li.l_partkey, "left_semi").select(
        "p_partkey", "p_brand"
    )


@_q(
    "customers_no_orders_anti",
    """
    select c_custkey, c_name from customer
    where c_custkey not in (
      select o_custkey from orders where o_orderdate >= date '2000-01-01')
    """,
)
def customers_no_orders_anti(spark, sf_dir):
    """Anti-join with a non-vacuous result (customers quiet since 2000):
    a 0-row anti would hash-match trivially and test nothing."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@_q(
    "rollup_customer_counts",
    """
    select coalesce(r_name, 'ALL') as region_name,
           coalesce(n_name, 'ALL') as nation_name,
           count(*)::bigint as n_customers
    from customer join nation on c_nationkey = n_nationkey
                  join region on n_regionkey = r_regionkey
    group by rollup(r_name, n_name)
    """,
)
def rollup_customer_counts(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(F.count("*").cast("long").alias("n_customers"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "n_customers",
        )
    )


@_q(
    "set_ops_orders",
    """
    (select o_orderkey from orders where o_orderpriority = '1-URGENT'
     union
     select o_orderkey from orders where o_totalprice > 400000)
    except
    (select o_orderkey from orders where o_orderpriority = '1-URGENT'
     intersect
     select o_orderkey from orders where o_totalprice > 400000)
    """,
)
def set_ops_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    big = o.filter(F.col("o_totalprice") > 400000).select("o_orderkey")
    return urgent.union(big).distinct().exceptAll(urgent.intersect(big))


@_q(
    "sessionize_events",
    """
    select user_id, count(*)::bigint as n_sessions from (
      select user_id,
             case when lag(ts) over (partition by user_id order by ts, event_id)
                       is null
                  or ts - lag(ts) over (partition by user_id order by ts, event_id)
                       > interval 30 minute
                  then 1 else 0 end as new_session
      from events)
    where new_session = 1
    group by user_id
    """,
)
def sessionize_events(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_session = F.when(
        prev.isNull() | (F.col("ts") - prev > F.expr("INTERVAL 30 MINUTES")),
        1,
    ).otherwise(0)
    return (
        e.withColumn("new_session", new_session)
        .filter(F.col("new_session") == 1)
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("n_sessions"))
    )


@_q(
    "json_extract_events",
    """
    select json_extract_string(props, '$.k')::bigint % 10 as k_bucket,
           count(*)::bigint as n,
           round(sum(value), 2) as sum_value
    from events
    group by 1
    """,
)
def json_extract_events(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long") % 10
    return (
        e.groupBy(k.alias("k_bucket"))
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


# A6: malformed-input tolerance (geoparse/geoparser.go:162-167 — a garbage
# stdin line logs "Input not recognised" and CONTINUES).  Spark analog: a
# PERMISSIVE from_csv with a corrupt-record column; bad rows become a
# dead-letter bucket instead of failing the job.  The TSV lines are built
# deterministically from the documents table (1-in-13 mangled).
@_q(
    "malformed_tsv_ingest",
    """
    select case when doc_id % 13 = 0 then '__corrupt__' else lang end
             as lang_bucket,
           count(*)::bigint as n,
           sum(case when doc_id % 13 = 0 then 0 else n_chars end)::bigint
             as sum_chars
    from documents group by 1
    """,
)
def malformed_tsv_ingest(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    line = F.when(
        F.col("doc_id") % 13 == 0,
        F.concat(F.lit("!garbage "), F.col("doc_id").cast("string")),
    ).otherwise(
        F.concat_ws(
            "\t",
            F.col("doc_id").cast("string"),
            F.col("lang"),
            F.col("n_chars").cast("string"),
        )
    )
    r = F.from_csv(
        line,
        "doc_id bigint, lang string, n_chars bigint, _bad string",
        {"sep": "\t", "mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_bad"},
    )
    parsed = d.select(r.alias("r"))
    bucket = F.when(
        F.col("r._bad").isNotNull(), F.lit("__corrupt__")
    ).otherwise(F.col("r.lang"))
    return parsed.groupBy(bucket.alias("lang_bucket")).agg(
        F.count("*").cast("long").alias("n"),
        F.coalesce(F.sum("r.n_chars"), F.lit(0)).cast("long").alias("sum_chars"),
    )


# G8: to_json(struct)/from_json round-trip — the reference's wire format is
# "path\tgdal\t{json}" (geoparse/geoparser.go:208-213, json.Marshal of the
# nested GDALFile).  The oracle supplies the analytic values, proving
# from_json(to_json(x)) == x field-for-field, including a nested struct and
# a string-level get_json_object probe of the marshalled form.
@_q(
    "json_struct_roundtrip",
    """
    select doc_id, lang as lang_rt, n_chars as n_chars_rt,
           source as source_js
    from documents
    """,
)
def json_struct_roundtrip(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    js = F.to_json(
        F.struct(
            F.col("doc_id"),
            F.col("lang"),
            F.struct(F.col("n_chars"), F.col("source")).alias("m"),
        )
    )
    rt = F.from_json(
        js, "doc_id bigint, lang string, m struct<n_chars: bigint, source: string>"
    )
    return d.select(
        "doc_id",
        rt["lang"].alias("lang_rt"),
        rt["m"]["n_chars"].alias("n_chars_rt"),
        F.get_json_object(js, "$.m.source").alias("source_js"),
    )


@_q(
    "date_trunc_daily",
    """
    select date_trunc('day', ts)::date as day,
           event_type,
           count(*)::bigint as n,
           round(avg(value), 4) as avg_value
    from events group by 1, 2
    """,
)
def date_trunc_daily(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("day", "ts").cast("date").alias("day"), F.col("event_type")
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
    )


# ---------------------------------------------------------------------------
# C5: spatial containment + time-range (the reference's Mongo queries,
# ancillary/mongoqueries.txt:1,3 — here as pure column arithmetic)
# ---------------------------------------------------------------------------

_QUAD = [(0.0, 0.0), (50.0, 5.0), (45.0, 40.0), (-5.0, 35.0)]


def _quad_sql(x: str, y: str) -> str:
    pos, neg = [], []
    n = len(_QUAD)
    for i in range(n):
        (x1, y1), (x2, y2) = _QUAD[i], _QUAD[(i + 1) % n]
        c = f"(({x2} - {x1}) * ({y} - {y1}) - ({y2} - {y1}) * ({x} - {x1}))"
        pos.append(f"{c} >= 0")
        neg.append(f"{c} <= 0")
    return f"(({' and '.join(pos)}) or ({' and '.join(neg)}))"


@_q(
    "spatial_within_quad",
    f"""
    select l_orderkey, l_linenumber,
           {_quad_sql("((l_partkey % 3600) * 0.1 - 180)", "((l_suppkey % 1700) * 0.1 - 85)")} as within
    from lineitem
    """,
)
def spatial_within_quad(spark, sf_dir):
    from .catalog import point_in_convex_polygon

    li = _t(spark, sf_dir, "lineitem")
    x = (F.col("l_partkey") % 3600).cast("double") * 0.1 - 180
    y = (F.col("l_suppkey") % 1700).cast("double") * 0.1 - 85
    return li.select(
        "l_orderkey",
        "l_linenumber",
        point_in_convex_polygon(x, y, _QUAD).alias("within"),
    )


@_q(
    "timerange_exists",
    """
    select user_id,
           len(list_filter(list(ts order by ts),
               t -> t >= timestamp '2024-02-01 00:00:00'
                and t <  timestamp '2024-03-01 00:00:00')) > 0 as has_event
    from events group by user_id
    """,
)
def timerange_exists(spark, sf_dir):
    from .catalog import timestamps_in_range_expr

    e = _t(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        timestamps_in_range_expr(
            F.array_sort(F.collect_list("ts")),
            "2024-02-01 00:00:00",
            "2024-03-01 00:00:00",
        ).alias("has_event")
    )
