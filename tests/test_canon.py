"""Three-dialect agreement + idempotence for URL canonicalization."""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from geocrawl_spark.canon import (
    canonicalize_url,
    canonicalize_url_expr,
    duckdb_canon_sql,
    host_expr,
    host_of,
)

CASES = [
    ("http://Example.COM/a/b.html", "http://example.com/a/b.html"),
    ("HTTP://EXAMPLE.com:80/a.html", "http://example.com/a.html"),
    ("https://example.com:443/", "https://example.com/"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com/a/b/../c.html", "http://example.com/a/c.html"),
    ("http://example.com/a/./b.html", "http://example.com/a/b.html"),
    ("http://example.com/a.html#frag", "http://example.com/a.html"),
    ("http://example.com/a?b=2&a=1", "http://example.com/a?a=1&b=2"),
    ("http://example.com/a?", "http://example.com/a"),
    ("  http://example.com/a.html  ", "http://example.com/a.html"),
    ("example.com/a.html", "http://example.com/a.html"),
    ("http://user:pw@example.com/x", "http://user:pw@example.com/x"),
    ("http://example.com/p/x/../5.html", "http://example.com/p/5.html"),
    ("http://example.com/a/b/c/../../d.html", "http://example.com/a/d.html"),
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_python_dialect(raw, expected):
    assert canonicalize_url(raw) == expected
    # idempotence
    assert canonicalize_url(expected) == expected


def test_spark_dialect(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], "url string")
    got = [r["c"] for r in df.select(canonicalize_url_expr("url").alias("c")).collect()]
    assert got == [e for _, e in CASES]


def test_duckdb_dialect():
    con = duckdb.connect()
    simple = [(r, e) for r, e in CASES if ".." not in r and "./" not in r]
    for raw, expected in simple:
        got = con.execute(
            f"with t(u) as (values (?)) select {duckdb_canon_sql('u')} from t",
            [raw],
        ).fetchone()[0]
        assert got == expected, raw


def test_host(spark):
    urls = [
        ("http://example.com/a", "example.com"),
        ("http://user@example.com:8080/a", "example.com"),
        ("https://sub.host.org/", "sub.host.org"),
    ]
    for u, h in urls:
        assert host_of(u) == h
    df = spark.createDataFrame([(u,) for u, _ in urls], "url string")
    got = [r["h"] for r in df.select(host_expr("url").alias("h")).collect()]
    assert got == [h for _, h in urls]


@settings(max_examples=200, deadline=None)
@given(
    host=st.from_regex(r"[a-zA-Z][a-zA-Z0-9.\-]{0,20}", fullmatch=True),
    path=st.from_regex(r"(/[a-zA-Z0-9._\-]{0,8}){0,4}", fullmatch=True),
    query=st.one_of(st.none(), st.from_regex(r"[a-z]=[0-9](&[a-z]=[0-9]){0,3}", fullmatch=True)),
    frag=st.one_of(st.none(), st.just("sec")),
    scheme=st.sampled_from(["http", "HTTP", "https", "HTTPS"]),
)
def test_idempotent_property(host, path, query, frag, scheme):
    url = f"{scheme}://{host}{path}"
    if query:
        url += "?" + query
    if frag:
        url += "#" + frag
    once = canonicalize_url(url)
    assert canonicalize_url(once) == once
