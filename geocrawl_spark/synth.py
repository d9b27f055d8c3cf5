"""Deterministic synthetic page-graph generator (FIXTURES.md §1-5).

Single implementation shared by the Spark pipeline tests and the pyref
oracle (it is a *generator*, not an operator, so it needs no dual
dialect).  Everything is a pure function of (seed, key) via blake2b —
no wall clock, no RNG state — so crawl-ordering goldens are stable.

Graph shape: H hosts with zipf-ish page masses (hot-host skew for the
politeness/salting tests), pages ``/p/{j}.html`` (some ``/private/...``
to exercise robots), out-degree 0-8 with occasional cross-host edges,
geo-asset links whose basenames match the 13 reference filename patterns
(geoparse/geoparser.go:40-52), chaff links, and canonicalization variants
(case, :80 port, fragments, dot segments) of the same logical URL.
"""

from __future__ import annotations

import datetime as dt
import hashlib

import pandas as pd

from .assets import extract_text_py

DEFAULT_SEED = 42
EPOCH = dt.datetime(2015, 1, 1, tzinfo=dt.timezone.utc)


def hq(seed: int, *parts) -> int:
    """Deterministic uint64 from (seed, parts)."""
    key = ("%d|" % seed + "|".join(str(p) for p in parts)).encode()
    return int.from_bytes(hashlib.blake2b(key, digest_size=8).digest(), "big")


# ---------------------------------------------------------------------------
# topology
# ---------------------------------------------------------------------------

def host_name(i: int) -> str:
    return f"host{i:02d}.example.org"


def page_counts(total: int, n_hosts: int) -> list[int]:
    ws = [1.0 / (i + 1) ** 1.2 for i in range(n_hosts)]
    s = sum(ws)
    counts = [max(1, int(round(total * w / s))) for w in ws]
    return counts


def page_path(seed: int, i: int, j: int) -> str:
    h = hq(seed, "priv", i, j) % 10
    if h == 0 and j > 0:
        return f"/private/{j}.html"
    if h == 5 and j > 0:
        # nested under /private/ so an Allow rule can override the
        # Disallow (REP longest-match precedence coverage)
        return f"/private/open/{j}.html"
    return f"/p/{j}.html"


def page_url(seed: int, i: int, j: int) -> str:
    return f"http://{host_name(i)}{page_path(seed, i, j)}"


def link_variant(seed: int, i: int, j: int, k: int) -> str:
    """A non-canonical spelling of page (i, j) — exercises canon rules."""
    url = page_url(seed, i, j)
    v = hq(seed, "var", i, j, k) % 6
    if v == 1:
        return url.replace("http://", "HTTP://").replace(host_name(i), host_name(i).upper())
    if v == 2:
        return url.replace(host_name(i), host_name(i) + ":80")
    if v == 3:
        return url + "#sec1"
    if v == 4 and "/p/" in url:
        return url.replace("/p/", "/p/x/../")
    return url


# asset filename factories — one per reference pattern (FIXTURES.md §3)
def _asset_basename(seed: int, key: int) -> str:
    h = hq(seed, "asset", key)
    year = 2013 + h % 5
    jd = 1 + h % 365
    kind = h % 14
    if kind == 0:
        return f"LC8{h % 233:03d}{h % 248:03d}{year}{jd:03d}LGN00_B{1 + h % 11}.TIF"
    if kind == 1:
        return f"MCD43A4.A{year}{jd:03d}.h{h % 36:02d}v{h % 18:02d}.005.{2016009123456 + h % 1000}.nc"
    if kind == 2:
        return f"MCD15A2.A{year}{jd:03d}.h{h % 36:02d}v{h % 18:02d}.006.{2016009123456 + h % 1000}.nc"
    if kind == 3:
        # satellite char 'Y': the reference's [OD|YD] is a single-char class
        return f"MY09_GA.A{year}{jd:03d}.1200.005.{year}{jd:03d}{h % 24:02d}{h % 60:02d}{h % 60:02d}.tif"
    if kind == 4:
        return f"FC.v302.MCD43A4.h{h % 36:02d}v{h % 18:02d}.{year}.005.nc"
    if kind == 5:
        return f"FC_LR.v302.MCD43A4.h{h % 36:02d}v{h % 18:02d}.{year}.005.nc"
    if kind == 6:
        return (
            f"{year}{1 + h % 12:02d}{1 + h % 28:02d}{h % 24:02d}{h % 60:02d}{h % 60:02d}"
            f"-P1S-ABOM_BRF_B{h % 16:02d}-PRJ_GEOS141_1000-HIMAWARI8-AHI.nc"
        )
    if kind == 7:
        return f"LS8_OLITIRS_NBAR_3577_{h % 30 - 15}_{h % 40 - 20}_{year}.tif"
    if kind == 8:
        return f"LS8_OLI_TIRS_NBART_3577_{h % 30 - 15}_{h % 40 - 20}_{year}.tif"
    if kind == 9:
        return f"Elevation_1secSRTM_DEMs_v1.0_DEM-S_Tiles_e{140 + h % 15}s{10 + h % 35}dems.nc"
    if kind == 10:
        return f"chirps-v2.0.{year}.dekads.nc"
    if kind == 11:
        return (
            f"tp_3hrs_ERAI_historical_fc-sfc_{year}{1 + h % 12:02d}{1 + h % 28:02d}"
            f"_{year}{1 + h % 12:02d}{2 + h % 27:02d}.nc"
        )
    if kind == 12:
        return (
            f"SRTM_DEM_{h % 20 - 10}_{h % 99 - 49}_{year}{1 + h % 12:02d}"
            f"{1 + h % 28:02d}{h % 24:02d}{h % 60:02d}{h % 60:02d}.nc"
        )
    return f"random_data_file_{h % 1000}.tif"  # dead-letter path (B4)


_VOCAB = (
    "spark frontier crawl raster polygon metadata landsat modis tile band "
    "archive dataset index shard bloom budget host queue parse extract"
).split()


def _page_html(seed: int, i: int, j: int, counts: list[int]) -> str:
    h = hq(seed, "page", i, j)
    words = " ".join(
        _VOCAB[hq(seed, "w", i, j, k) % len(_VOCAB)] for k in range(5 + h % 20)
    )
    lines = [
        "<html><head><title>Page %d host%02d</title></head><body>" % (j, i),
        "<h1>Page %d on %s</h1>" % (j, host_name(i)),
        "<p>%s</p>" % words,
    ]
    # page links (frontier edges)
    deg = hq(seed, "deg", i, j) % 9
    for k in range(deg):
        if hq(seed, "x", i, j, k) % 4 == 0 and len(counts) > 1:
            ti = (i + 1 + hq(seed, "th", i, j, k) % (len(counts) - 1)) % len(counts)
        else:
            ti = i
        tj = hq(seed, "tj", i, j, k) % counts[ti]
        lines.append('<a href="%s">link %d</a>' % (link_variant(seed, ti, tj, k), k))
    # geo-asset links (extraction targets)
    n_assets = hq(seed, "na", i, j) % 3
    for k in range(n_assets):
        base = _asset_basename(seed, hq(seed, "ak", i, j, k))
        lines.append('<a href="/assets/%s">asset %d</a>' % (base, k))
    # chaff links (must NOT pass the B1 gate)
    if h % 3 == 0:
        lines.append('<a href="/static/style.css">style</a>')
        lines.append('<a href="https://cdn.example.net/lib.js">js</a>')
    lines.append("</body></html>")
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# tables
# ---------------------------------------------------------------------------

def orphan_url(seed: int, i: int, n: int) -> str:
    """A page listed ONLY in host i's sitemap — no <a href> anywhere in
    the graph reaches it (the /p/o{n} index space is disjoint from the
    /p/{j} space _page_html links into)."""
    return f"http://{host_name(i)}/p/o{n}.html"


def n_orphans(seed: int, i: int) -> int:
    return 1 + hq(seed, "norph", i) % 2


def sitemap_url(i: int) -> str:
    return f"http://{host_name(i)}/sitemap.xml"


def child_sitemap_url(i: int, c: int) -> str:
    """Child sitemap file referenced only by host i's sitemap INDEX."""
    return f"http://{host_name(i)}/sm_{c}.xml"


def rs_orphan_url(seed: int, i: int, n: int) -> str:
    """A page listed ONLY in host i's robots-declared sitemap — neither
    hrefs nor the conventional /sitemap.xml reach the /p/r{n} space."""
    return f"http://{host_name(i)}/p/r{n}.html"


def n_rs_orphans(seed: int, i: int) -> int:
    return 1 + hq(seed, "nrsorph", i) % 2


def has_robots_sitemap(seed: int, i: int) -> bool:
    """Which hosts declare a ``Sitemap:`` directive (about half)."""
    return hq(seed, "rsm", i) % 2 == 0


def robots_sitemap_url(i: int) -> str:
    """Host i's robots-declared sitemap — a NON-conventional path the
    /sitemap.xml convention probe never finds."""
    return f"http://{host_name(i)}/smdir/extra.xml"


def _sitemap_locs(seed: int, i: int, counts: list[int]) -> list[str]:
    """The flat per-host loc list: seed page, a couple of regular pages
    (redundant with the link graph), and every orphan (reachable only
    here)."""
    locs = [page_url(seed, i, 0)]
    for k in range(min(2, counts[i] - 1)):
        locs.append(page_url(seed, i, 1 + hq(seed, "sm", i, k) % (counts[i] - 1)))
    for n in range(n_orphans(seed, i)):
        locs.append(orphan_url(seed, i, n))
    return locs


def page_ts(seed: int, url: str) -> dt.datetime:
    """Deterministic warc_ts for a url (the one gen_pages stamps)."""
    return EPOCH + dt.timedelta(seconds=hq(seed, "ts", url) % 31536000)


def sitemap_lastmod(seed: int, url: str) -> dt.datetime:
    """Deterministic advertised <lastmod>: warc_ts + (-2..+2) days — the
    positive deltas (~2/5 of listed urls) are the STALE ones (site says
    the page changed after the snapshot we hold)."""
    return page_ts(seed, url) + dt.timedelta(days=hq(seed, "lmd", url) % 5 - 2)


def _urlset_xml(locs: list[str], lastmods: list[str | None] | None = None) -> str:
    if lastmods is None:
        lastmods = [None] * len(locs)
    body = "\n".join(
        f"<url><loc>{u}</loc><lastmod>{lm}</lastmod></url>"
        if lm
        else f"<url><loc>{u}</loc></url>"
        for u, lm in zip(locs, lastmods)
    )
    return f'<?xml version="1.0" encoding="UTF-8"?>\n<urlset>\n{body}\n</urlset>'


def _sitemapindex_xml(locs: list[str]) -> str:
    body = "\n".join(f"<sitemap><loc>{u}</loc></sitemap>" for u in locs)
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        f"<sitemapindex>\n{body}\n</sitemapindex>"
    )


def _sitemap_xml(seed: int, i: int, counts: list[int]) -> str:
    """sitemaps.org-style XML (flat urlset form)."""
    return _urlset_xml(_sitemap_locs(seed, i, counts))


def gen_pages(
    total: int = 200,
    n_hosts: int = 8,
    seed: int = DEFAULT_SEED,
    sitemaps: bool = False,
    sitemap_index: bool = False,
    robots_sitemaps: bool = False,
    lastmod: bool = False,
) -> pd.DataFrame:
    """pages(url, warc_ts, html binary, text, lang) per input_hint.

    ``sitemaps=True`` appends, per host, a ``/sitemap.xml`` page (XML
    ``<loc>`` listing) and 1-2 ORPHAN pages it alone references — the
    sitemap-discovery fixtures.  ``sitemap_index=True`` (implies
    sitemaps) makes ``/sitemap.xml`` a ``<sitemapindex>`` naming two
    child ``/sm_{0,1}.xml`` files that split the loc list — the
    recursion fixture.  ``robots_sitemaps=True`` adds, on the hosts
    :func:`has_robots_sitemap` flags, a ``/smdir/extra.xml`` sitemap at
    a non-conventional path listing 1-2 further ``/p/r{n}`` orphans —
    reachable only through the robots ``Sitemap:`` directive
    (pair with ``gen_robots(sitemaps=True)``).  ``lastmod=True``
    (implies sitemaps; flat form) stamps each flat-sitemap ``<loc>``
    with :func:`sitemap_lastmod` — warc_ts +/- up to 2 days, so ~2/5 of
    listed urls advertise a change NEWER than the held snapshot (the
    stale_by_sitemap fixtures).  Default False keeps
    every existing golden's input byte-identical."""
    sitemaps = sitemaps or sitemap_index or robots_sitemaps or lastmod
    counts = page_counts(total, n_hosts)
    rows = []
    langs = ["en", "es", "de"]

    def add(url: str, html: bytes):
        rows.append(
            {
                "url": url,
                "warc_ts": page_ts(seed, url),
                "html": html,
                "text": extract_text_py(html),
                "lang": langs[hq(seed, "lang", url) % 3],
            }
        )

    for i in range(n_hosts):
        for j in range(counts[i]):
            add(page_url(seed, i, j), _page_html(seed, i, j, counts).encode("utf-8"))
    if sitemaps:
        for i in range(n_hosts):
            # orphans reuse the page-html factory at out-of-range j so
            # their OWN outlinks still target real pages
            for n in range(n_orphans(seed, i)):
                add(
                    orphan_url(seed, i, n),
                    _page_html(seed, i, counts[i] + n, counts).encode("utf-8"),
                )
            locs = _sitemap_locs(seed, i, counts)
            if sitemap_index:
                kids = [child_sitemap_url(i, 0), child_sitemap_url(i, 1)]
                add(sitemap_url(i), _sitemapindex_xml(kids).encode("utf-8"))
                add(kids[0], _urlset_xml(locs[0::2]).encode("utf-8"))
                add(kids[1], _urlset_xml(locs[1::2]).encode("utf-8"))
            else:
                lms = (
                    [
                        sitemap_lastmod(seed, u).strftime("%Y-%m-%dT%H:%M:%S")
                        for u in locs
                    ]
                    if lastmod
                    else None
                )
                add(sitemap_url(i), _urlset_xml(locs, lms).encode("utf-8"))
            if robots_sitemaps and has_robots_sitemap(seed, i):
                off = counts[i] + n_orphans(seed, i)
                rs = []
                for n in range(n_rs_orphans(seed, i)):
                    rs.append(rs_orphan_url(seed, i, n))
                    add(
                        rs[-1],
                        _page_html(seed, i, off + n, counts).encode("utf-8"),
                    )
                add(robots_sitemap_url(i), _urlset_xml(rs).encode("utf-8"))
    return pd.DataFrame(rows)


def gen_seeds(n_hosts: int = 8, seed: int = DEFAULT_SEED) -> pd.DataFrame:
    rows = [
        {"url": page_url(seed, i, 0), "priority": 0}
        for i in range(n_hosts)
    ]
    return pd.DataFrame(rows)


def gen_robots(
    n_hosts: int = 8, seed: int = DEFAULT_SEED, sitemaps: bool = False
) -> pd.DataFrame:
    """robots(host, disallow, allow) — covers REP precedence: allow-all
    hosts, prefix disallows, a wildcard+anchored disallow, deny-all with
    an anchored Allow carve-out for the seed, and Allow-overrides-Disallow
    on the /private/open/ subtree.

    ``sitemaps=True`` adds the optional ``sitemaps`` column — the robots
    ``Sitemap:`` directive analog — pointing the :func:`has_robots_sitemap`
    hosts at their non-conventional :func:`robots_sitemap_url` (pair with
    ``gen_pages(robots_sitemaps=True)``).  Default False keeps the
    3-column schema every existing golden builds DataFrames from."""
    rows = []
    for i in range(n_hosts):
        alw: list[str] = []
        if i % 7 == 6:
            dis = ["/"]
            alw = ["/p/0.html$"]  # seed survives: plen 10 beats "/" (1)
        elif i % 5 == 3:
            dis = ["/private/"]
            alw = ["/private/open/"]  # longer Allow overrides Disallow
        elif i % 5 == 1:
            dis = ["/p/*7.html$"]  # wildcard body + end anchor
        else:
            dis = []
        row = {"host": host_name(i), "disallow": dis, "allow": alw}
        if sitemaps:
            row["sitemaps"] = (
                [robots_sitemap_url(i)] if has_robots_sitemap(seed, i) else []
            )
        rows.append(row)
    return pd.DataFrame(rows)


def gen_hostbudget(n_hosts: int = 8, seed: int = DEFAULT_SEED) -> pd.DataFrame:
    rows = [
        {"host": host_name(i), "budget": 1 + hq(seed, "bud", i) % 5}
        for i in range(n_hosts)
    ]
    return pd.DataFrame(rows)
