"""Content-processor parity vs reference golden vectors.

- HTML/CSS extraction sets: ``AnalysisTest.java:18-63``
- robots.txt: ``TestServer.java:31-36`` fixture
- sitemap: ``TestServer.java:37-46`` + ``example-sitemap.xml`` date formats
- changefreq mapping: ``Sitemap.java:149-165``
"""

from chronicrawl_spark.sources import content
from chronicrawl_spark.sources.content import (
    analyze_payload,
    extract_css,
    extract_html,
    parse_changefreq_days,
    parse_robots,
    parse_sitemap,
    try_parse_w3c_date,
)


def test_analysis_html_golden_set():
    # AnalysisTest.java:18-34 — exact golden set
    html = (
        "<title>title1</title><img src=foo.jpg><style>"
        "@font-face { font-family: somefont; src: url(font.woff);}"
        "body { background: url(bg.jpg);  }</style>"
        "<script src=script.js></script><title>title2</title>"
    )
    r = extract_html(html, "http://localhost/")
    got = {f"{u} {t}" for u, t in r.resources}
    assert got == {
        "http://localhost/bg.jpg Image",
        "http://localhost/font.woff Font",
        "http://localhost/foo.jpg Image",
        "http://localhost/script.js Script",
    }
    assert r.title == "title1"
    assert r.has_script


def test_analysis_css_relative():
    # AnalysisTest.java:37-49
    r = extract_css("body { background: url(bg.jpg); }", "http://example.org/styles/test.css")
    assert [(u, t) for u, t in r.resources] == [("http://example.org/styles/bg.jpg", "Image")]


def test_analysis_redirect_location():
    # AnalysisTest.java:52-63 — Location header becomes a link
    r = analyze_payload(None, b"", "http://example.org/dir/redirect", location_header="target")
    assert r.links == ["http://example.org/dir/target"]


def test_fixture_page_extraction():
    # TestServer.java:47-49 — the fixture '/' page
    r = extract_html("<link rel=stylesheet href=style.css><h1>Hello</h1>", "http://h0.example/")
    assert r.resources == [("http://h0.example/style.css", "Stylesheet")]
    assert r.links == []
    assert not r.has_script


def test_link_dedupe_scheme_filter_fragment_strip():
    html = (
        '<a href="/a#one">x</a><a href="/a#two">y</a>'
        '<a href="mailto:x@y.z">m</a><a href="ftp://h/f">f</a>'
        '<a href="https://other.example/b">z</a>'
    )
    r = extract_html(html, "http://h.example/")
    assert r.links == ["http://h.example/a", "https://other.example/b"]


def test_srcset_and_extras():
    html = (
        '<img srcset="small.jpg 480w, big.jpg 1024w">'
        '<img data-src="lazy.png">'
        '<video poster=p.jpg src=v.mp4><source src=s.webm></video>'
    )
    r = extract_html(html, "http://h.example/d/")
    got = dict(r.resources)
    assert got["http://h.example/d/small.jpg"] == "Image"
    assert got["http://h.example/d/big.jpg"] == "Image"
    assert got["http://h.example/d/lazy.png"] == "Image"
    assert got["http://h.example/d/p.jpg"] == "Image"
    assert got["http://h.example/d/v.mp4"] == "Media"
    assert got["http://h.example/d/s.webm"] == "Media"


def test_meta_refresh():
    html = '<meta http-equiv="refresh" content="5; url=/next.html">'
    r = extract_html(html, "http://h.example/")
    assert ("http://h.example/next.html", "Document") in r.resources


def test_robots_fixture():
    # TestServer.java:31-36 — no User-agent line at all (implicit global group)
    rules = parse_robots(b"Sitemap: /sitemap-index.xml\ncrawl-delay: 5\nDisallow: /no\n")
    assert rules.sitemaps == ["/sitemap-index.xml"]
    assert rules.crawl_delay == 5
    assert not rules.is_allowed("http://h.example/no")
    assert not rules.is_allowed("http://h.example/nope")  # prefix match
    assert rules.is_allowed("http://h.example/")
    assert rules.is_allowed("http://h.example/page")


def test_robots_groups_and_wildcards():
    txt = """
User-agent: other
Disallow: /

User-agent: *
Allow: /public
Disallow: /p*te$
Crawl-delay: 2
"""
    rules = parse_robots(txt, "chronicrawl/1.0")
    assert rules.crawl_delay == 2
    assert rules.is_allowed("http://h/x")
    assert not rules.is_allowed("http://h/private")  # /p*te$ matches 'private'? no ->
    # '/p*te$' requires end anchor: '/private' ends with 'te'? yes: p-r-i-v-a-t-e
    assert rules.is_allowed("http://h/public")  # Allow longer match wins


def test_robots_none_allows_all():
    rules = parse_robots(None)
    assert rules.is_allowed("http://h/anything")
    assert rules.crawl_delay is None


def test_sitemap_index_and_urlset():
    # TestServer.java:37-46
    idx = parse_sitemap(
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        "<sitemap><loc>/sitemap.xml</loc></sitemap></sitemapindex>"
    )
    assert len(idx) == 1 and idx[0].loc == "/sitemap.xml" and idx[0].type == "SITEMAP"
    urls = parse_sitemap(
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        "<url><loc>/no</loc></url>"
        "<url><loc>/page</loc><changefreq>daily</changefreq><priority>0.8</priority></url>"
        "</urlset>"
    )
    assert [(e.loc, e.type) for e in urls] == [("/no", "PAGE"), ("/page", "PAGE")]
    assert urls[1].changefreq == "DAILY" and abs(urls[1].priority - 0.8) < 1e-6


def test_example_sitemap_all_date_formats():
    # test-resources/.../example-sitemap.xml — 8 entries, every W3C format
    with open("/root/reference/test-resources/org/netpreserve/chronicrawl/example-sitemap.xml", "rb") as f:
        entries = parse_sitemap(f.read())
    assert len(entries) == 8
    for e in entries:
        assert e.lastmod is not None
        assert try_parse_w3c_date(e.lastmod) is not None, e.lastmod
    freqs = {e.changefreq for e in entries}
    assert freqs == {"DAILY", "YEARLY", "MONTHLY", "HOURLY", "WEEKLY", "NEVER", "ALWAYS"}


def test_changefreq_mapping():
    # Sitemap.java:149-165 — intentionally lossy bucketing, copied exactly
    assert parse_changefreq_days("always") == 1
    assert parse_changefreq_days("HOURLY") == 1
    assert parse_changefreq_days("daily") == 1
    assert parse_changefreq_days("weekly") == 7
    assert parse_changefreq_days("monthly") == 29
    assert parse_changefreq_days("yearly") == 365
    assert parse_changefreq_days("never") == 365
    assert parse_changefreq_days("bogus") is None
    assert parse_changefreq_days(None) is None


def test_status_constants():
    assert content.ROBOTS_DISALLOWED == -9998
    assert content.DNS_LOOKUP_FAILED == -1
    assert content.CONNECT_FAILED == -2
