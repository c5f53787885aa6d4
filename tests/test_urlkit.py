"""Golden vectors for the WHATWG-subset canonicalizer + identity layer.

Covers every URL shape the reference fixtures and tests produce
(TestServer.java site, AnalysisTest relative resolutions, Url.java
origin/pathref decomposition).
"""

from chronicrawl_spark.functions import urlkit
from chronicrawl_spark.functions.urlkit import Url, canonicalize, resolve


def test_basic_canonicalization():
    assert canonicalize("HTTP://Example.ORG") == "http://example.org/"
    assert canonicalize("http://example.org:80/") == "http://example.org/"
    assert canonicalize("https://example.org:443/x") == "https://example.org/x"
    assert canonicalize("http://example.org:8080/") == "http://example.org:8080/"
    assert canonicalize("http://example.org/a/../b") == "http://example.org/b"
    assert canonicalize("http://example.org/a/./b") == "http://example.org/a/b"
    assert canonicalize("http://example.org/a b") == "http://example.org/a%20b"
    assert canonicalize("http://example.org/%7euser") == "http://example.org/%7Euser"
    # fragment stripped by default (Analysis.java:70-73 drops fragments)
    assert canonicalize("http://example.org/p#frag") == "http://example.org/p"
    assert canonicalize("http://example.org/p#frag", keep_fragment=True) == (
        "http://example.org/p#frag"
    )
    # tab/newline stripped per WHATWG
    assert canonicalize("http://exam\nple.org/\tp") == "http://example.org/p"


def test_origin_pathref_decomposition():
    # ref Url.java:38-41 (origin), 60-66 (pathref)
    u = Url("http://Example.org:8080/Path/To?q=1&r=2#frag")
    assert u.origin == "http://example.org:8080"
    assert u.pathref == "/Path/To?q=1&r=2"
    u2 = Url("http://example.org")
    assert u2.origin == "http://example.org"
    assert u2.pathref == "/"
    # query present but empty keeps the '?' (ParsedUrl questionMark semantics)
    u3 = Url("http://example.org/x?")
    assert u3.pathref == "/x?"


def test_identity_hashes_stable():
    u = Url("http://example.org/")
    assert u.origin_id() == urlkit.hash_str("http://example.org")
    assert u.path_id() == urlkit.hash_str("/")
    assert u.id() == urlkit.hash_str("http://example.org/")
    # distinct urls hash distinctly
    assert Url("http://example.org/a").path_id() != Url("http://example.org/b").path_id()


def test_resolve():
    # AnalysisTest.java:52-63 — 302 Location relative resolve
    assert resolve("http://example.org/dir/redirect", "target") == "http://example.org/dir/target"
    # AnalysisTest.java:37-49 — css-relative resolve
    assert resolve("http://example.org/styles/test.css", "bg.jpg") == (
        "http://example.org/styles/bg.jpg"
    )
    assert resolve("http://localhost/", "foo.jpg") == "http://localhost/foo.jpg"
    # absolute-path sitemap (TestServer robots.txt: 'Sitemap: /sitemap-index.xml')
    assert resolve("http://h.example/robots.txt", "/sitemap-index.xml") == (
        "http://h.example/sitemap-index.xml"
    )


def test_ssurt_golden_vectors():
    """Byte-level SSURT vectors, derived by hand from the public ssurt spec
    grammar (iipc/urlcanon ssurt.rst): ``ssurt_host "//" [port] ":" scheme
    ":" path ["?" query]``, ssurt_host = reversed comma-joined labels with
    trailing comma (IP addresses verbatim).  Canonicalization (lowercase
    host, default-port drop, empty path → '/') happens first, as in the
    reference's ParsedUrl pipeline."""
    vectors = {
        "https://www.example.com/": "com,example,www,//:https:/",
        "http://example.org/a?q=1": "org,example,//:http:/a?q=1",
        "http://example.org:8080/a": "org,example,//8080:http:/a",
        "HTTP://Example.ORG:80/a": "org,example,//:http:/a",  # default port dropped
        "http://example.org": "org,example,//:http:/",  # empty path → '/'
        "http://192.168.1.1/x": "192.168.1.1//:http:/x",  # IP not reversed
        "https://a.b.example.co.uk/p/q?x=y": "uk,co,example,b,a,//:https:/p/q?x=y",
    }
    for url, want in vectors.items():
        assert Url(url).ssurt == want, url
    # port field precedes scheme: one host's captures stay contiguous and
    # group by port first (digits sort before ':'), then scheme
    hosts = sorted(Url(u).ssurt for u in [
        "https://example.org/x", "http://example.org/x", "http://example.org:81/x",
    ])
    assert hosts[0].startswith("org,example,//81:")
    assert hosts[1].startswith("org,example,//:http:")
    assert hosts[2].startswith("org,example,//:https:")


def test_ssurt_ordering():
    # ordering by reversed-host form groups hosts hierarchically
    urls = [
        "http://b.example.org/x",
        "http://a.example.org/x",
        "http://example.com/x",
    ]
    ssurts = sorted(Url(u).ssurt for u in urls)
    assert ssurts[0].startswith("com,example")
    assert ssurts[1].startswith("org,example,a")
    assert ssurts[2].startswith("org,example,b")


def test_batch_parts():
    rows = urlkit.batch_parts(["http://Example.org/A?b=1", None, "not a url"])
    assert rows[0][0] == "http://example.org/A?b=1"
    assert rows[0][1] == "http://example.org"
    assert rows[0][2] == "/A?b=1"
    assert rows[1] == (None,) * 7
    assert rows[2] == (None,) * 7


def test_url_parts_udf(spark):
    from pyspark.sql import functions as F

    from chronicrawl_spark.functions.udfs import url_parts

    df = spark.createDataFrame(
        [("HTTP://Example.ORG:80/a/../b?x=1#f",), ("http://h2.example/p",)], ["raw"]
    ).withColumn("u", url_parts(F.col("raw")))
    rows = {r["u"]["url"]: r["u"] for r in df.collect()}
    u = rows["http://example.org/b?x=1"]
    assert u["origin"] == "http://example.org"
    assert u["pathref"] == "/b?x=1"
    assert u["origin_id"] == urlkit.hash_str("http://example.org")
    assert u["path_id"] == urlkit.hash_str("/b?x=1")
