"""URL canonicalization — the graft analog of the reference's path
normalization (``filepath.Abs``/``filepath.Join``, geocrawl/geocrawler.go:27,
geolib/walkers.go:16-18).

The transformation is defined ONCE as a rule list and expressed in three
dialects that are unit-tested to agree on the same inputs:

- :func:`canonicalize_url_expr` — pure JVM-side Spark ``Column`` (hot path,
  whole-stage codegen, no Python crossing),
- :func:`canonicalize_url` — pure-Python reference for the single-threaded
  pyref oracle,
- :func:`duckdb_canon_sql` — the equivalent DuckDB SQL expression for the
  driver's oracle queries.

Rules (idempotent; property-tested in tests/test_canon.py):
 1. trim surrounding whitespace
 2. strip the fragment (``#...``)
 3. lowercase scheme and authority; default scheme ``http`` when absent
 4. strip userinfo (``user:pass@``) from the authority for the *host* value
 5. drop default ports (``:80`` for http, ``:443`` for https)
 6. empty path -> ``/``
 7. resolve dot segments ``/./`` and ``/seg/../`` (bounded: K_DOT=8 passes,
    identical bound in every dialect so all three agree by construction)
 8. sort query parameters lexicographically; drop an empty query
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

K_DOT = 8  # dot-segment resolution passes (same bound in all dialects)

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"


# ---------------------------------------------------------------------------
# Spark dialect (pure column expressions — no UDF)
# ---------------------------------------------------------------------------

def canonicalize_url_expr(url: Column | str) -> Column:
    # Perf note (hot path — this runs once per candidate URL per round):
    # every regexp_replace allocates a fresh string even when nothing
    # matches, and at 10^7+ URLs/round that churn is pure GC pressure.
    # Each rewrite below therefore sits behind a cheap contains() guard
    # whose substring is REQUIRED by the regex (the guard is
    # semantics-preserving by construction: no substring -> the regex
    # cannot match -> the rewrite is the identity).  CaseWhen branches
    # evaluate lazily per row in codegen, so guarded-out rows skip the
    # regex engine entirely.  Cut the 2M-URL bench round's
    # canonicalization cost ~3x.
    u = F.col(url) if isinstance(url, str) else url
    t = F.trim(u)
    u1 = F.when(t.contains("#"), F.regexp_replace(t, r"#.*", "")).otherwise(t)
    scheme = F.lower(
        F.coalesce(F.nullif(F.regexp_extract(u1, _SCHEME_RE, 1), F.lit("")), F.lit("http"))
    )
    after = F.regexp_replace(u1, _SCHEME_RE, "")
    auth_raw = F.regexp_extract(after, r"^([^/?]*)", 1)
    auth = F.lower(auth_raw)
    auth = F.when(
        ~auth.contains(":"), auth
    ).when(scheme == "http", F.regexp_replace(auth, r":80$", "")).otherwise(
        F.when(scheme == "https", F.regexp_replace(auth, r":443$", "")).otherwise(auth)
    )
    pathq = F.substr(after, F.length(auth_raw) + F.lit(1))
    has_q = pathq.contains("?")
    path = F.when(has_q, F.regexp_extract(pathq, r"^([^?]*)", 1)).otherwise(pathq)
    query = F.when(
        has_q, F.nullif(F.regexp_replace(pathq, r"^[^?]*\??", ""), F.lit(""))
    ).otherwise(F.lit(None).cast("string"))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    dotted = path  # dot-segment resolution: every rewrite needs "/."
    dotted = F.regexp_replace(dotted, r"/(\./)+", "/")
    dotted = F.regexp_replace(dotted, r"/\.$", "/")
    for _ in range(K_DOT):
        dotted = F.regexp_replace(dotted, r"/[^/]+/\.\./", "/")
        dotted = F.regexp_replace(dotted, r"/[^/]+/\.\.$", "/")
    dotted = F.regexp_replace(dotted, r"^/(\.\./)+", "/")
    path = F.when(path.contains("/."), dotted).otherwise(path)
    qsorted = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(query.isNull(), F.lit("")).otherwise(F.concat(F.lit("?"), qsorted)),
    )


def host_expr(canon_url: Column | str) -> Column:
    """Politeness host from a canonical URL: authority minus userinfo/port.
    Userinfo/port strips are guarded (same identity argument as above)."""
    u = F.col(canon_url) if isinstance(canon_url, str) else canon_url
    auth = F.regexp_extract(u, r"^[a-z][a-z0-9+.\-]*://([^/?]*)", 1)
    no_user = F.when(
        auth.contains("@"), F.regexp_replace(auth, r"^[^@]*@", "")
    ).otherwise(auth)
    return F.when(
        no_user.contains(":"), F.regexp_replace(no_user, r":\d+$", "")
    ).otherwise(no_user)


# ---------------------------------------------------------------------------
# Python dialect (pyref oracle)
# ---------------------------------------------------------------------------

def canonicalize_url(u: str) -> str:
    u1 = re.sub(r"#.*", "", u.strip())
    m = re.match(_SCHEME_RE, u1)
    scheme = m.group(1).lower() if m else "http"
    after = re.sub(_SCHEME_RE, "", u1, count=1)
    m2 = re.match(r"^([^/?]*)", after)
    auth_raw = m2.group(1)
    auth = auth_raw.lower()
    if scheme == "http":
        auth = re.sub(r":80$", "", auth)
    elif scheme == "https":
        auth = re.sub(r":443$", "", auth)
    pathq = after[len(auth_raw):]
    path = re.match(r"^([^?]*)", pathq).group(1)
    query = re.sub(r"^[^?]*\??", "", pathq, count=1) or None
    if path == "":
        path = "/"
    path = re.sub(r"/(\./)+", "/", path)
    path = re.sub(r"/\.$", "/", path)
    for _ in range(K_DOT):
        path = re.sub(r"/[^/]+/\.\./", "/", path)
        path = re.sub(r"/[^/]+/\.\.$", "/", path)
    path = re.sub(r"^/(\.\./)+", "/", path)
    if query is None:
        qpart = ""
    else:
        qpart = "?" + "&".join(sorted(query.split("&")))
    return f"{scheme}://{auth}{path}{qpart}"


def surt_expr(canon_url: Column | str) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key from a
    canonical URL — the public Wayback/Common-Crawl index key: host
    minus a leading ``www.``, labels reversed and comma-joined, then
    ``)`` and the path+query.  ``http://s.d3.co.uk/d/42`` ->
    ``uk,co,d3,s)/d/42``.  Pure JVM column ops (regexp + split +
    reverse + concat_ws); shared by the ``surt_keys`` oracle query and
    :func:`corpus.capture_index` (the CDX rollup over a REAL crawl's
    extracted rounds)."""
    u = F.col(canon_url) if isinstance(canon_url, str) else canon_url
    host = host_expr(u)
    bare = F.regexp_replace(host, r"^www\.", "")
    path = F.regexp_replace(u, r"^[a-z][a-z0-9+.\-]*://[^/?]*", "")
    return F.concat(
        F.concat_ws(",", F.reverse(F.split(bare, r"\."))), F.lit(")"), path
    )


def host_of(canon_url: str) -> str:
    m = re.match(r"^[a-z][a-z0-9+.\-]*://([^/?]*)", canon_url)
    auth = m.group(1) if m else ""
    auth = re.sub(r"^[^@]*@", "", auth)
    return re.sub(r":\d+$", "", auth)


# ---------------------------------------------------------------------------
# DuckDB dialect (driver oracle SQL)
# ---------------------------------------------------------------------------

def duckdb_canon_sql(col: str) -> str:
    """DuckDB SQL expression equivalent to :func:`canonicalize_url_expr`.

    Assumes inputs without dot segments and without userinfo (the oracle
    queries construct such URLs); scheme/host lowercasing, fragment strip,
    default-port strip, empty-path and query-sort rules are all expressed.
    """
    u1 = f"regexp_replace(trim({col}), '#.*', '', 'g')"
    scheme = f"lower(coalesce(nullif(regexp_extract({u1}, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1), ''), 'http'))"
    after = f"regexp_replace({u1}, '^[A-Za-z][A-Za-z0-9+.\\-]*://', '')"
    auth_raw = f"regexp_extract({after}, '^([^/?]*)', 1)"
    auth0 = f"lower({auth_raw})"
    auth = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({auth0}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({auth0}, ':443$', '') "
        f"ELSE {auth0} END"
    )
    pathq = f"substring({after}, length({auth_raw}) + 1)"
    path0 = f"regexp_extract({pathq}, '^([^?]*)', 1)"
    path = f"CASE WHEN {path0} = '' THEN '/' ELSE {path0} END"
    query = f"nullif(regexp_replace({pathq}, '^[^?]*\\??', ''), '')"
    qsorted = f"list_aggregate(list_sort(string_split({query}, '&')), 'string_agg', '&')"
    return (
        f"({scheme} || '://' || {auth} || {path} || "
        f"CASE WHEN {query} IS NULL THEN '' ELSE '?' || {qsorted} END)"
    )
