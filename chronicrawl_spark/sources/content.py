"""Content processors: robots.txt, sitemap XML, HTML/CSS link extraction.

From-scratch Python implementations of the behavior the reference gets from
crawler-commons (``Exchange.java:94-96,204-216``), StAX (``Sitemap.java``),
jsoup + SAC CSS (``Analysis.java:169-372``).  Pure functions over strings /
bytes — called in batches from ``mapInPandas``/pandas UDFs, never per-row
from the driver.

Extraction parity targets (fixture-tested in ``tests/test_content.py``):
- ``AnalysisTest.java:18-63`` golden resource/link sets
- ``TestServer.java:21-56`` fixture site
- ``test-resources/.../example-sitemap.xml`` date formats
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

from ..functions.urlkit import Url, parse_canonical, resolve

# ---------------------------------------------------------------- robots.txt

ROBOTS_DISALLOWED = -9998  # Status.java ROBOTS_DISALLOWED
DNS_LOOKUP_FAILED = -1
CONNECT_FAILED = -2
UNEXPECTED_RUNTIME_EXCEPTION = -5


@dataclass
class RobotRules:
    """Parsed robots.txt — crawler-commons SimpleRobotRules subset."""

    # (is_allow, path_pattern) sorted longest-pattern-first at match time
    rules: list = field(default_factory=list)
    crawl_delay: int | None = None  # seconds
    sitemaps: list = field(default_factory=list)

    def is_allowed(self, url: str) -> bool:
        p = parse_canonical(url, False)
        path = p.pathref if p else url
        # longest-pattern-first, first match wins (crawler-commons semantics)
        for is_allow, pattern in sorted(self.rules, key=lambda r: -len(r[1])):
            if _robots_path_matches(pattern, path):
                return is_allow
        return True


def _robots_path_matches(pattern: str, path: str) -> bool:
    if not pattern:
        return False
    if "*" in pattern or pattern.endswith("$"):
        body, anchored = (pattern[:-1], True) if pattern.endswith("$") else (pattern, False)
        regex = ".*".join(re.escape(part) for part in body.split("*"))
        if anchored:
            regex += "$"
        return re.match(regex, path) is not None
    return path.startswith(pattern)


def parse_robots(content: bytes | str | None, user_agent: str = "chronicrawl") -> RobotRules:
    """Parse robots.txt (ref ``Exchange.java:94-96``: SimpleRobotRulesParser).

    Group semantics: directives before the first ``User-agent`` line form an
    implicit global group (the fixture robots.txt has no UA line at all —
    ``TestServer.java:31-36``).  The most specific matching UA group wins;
    ``*`` and the implicit group are fallbacks.
    """
    out = RobotRules()
    if content is None:
        return out
    if isinstance(content, bytes):
        content = content.decode("utf-8", "replace")
    agent = user_agent.lower().split("/")[0]

    groups: list[dict] = []  # {'agents': [...], 'rules': [...], 'delay': int|None}
    implicit = {"agents": None, "rules": [], "delay": None}
    cur = implicit
    last_was_agent = False
    for raw_line in content.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            last_was_agent = False
            continue
        directive, _, value = line.partition(":")
        directive = directive.strip().lower()
        value = value.strip()
        if directive == "sitemap":
            out.sitemaps.append(value)
            last_was_agent = False
        elif directive == "user-agent":
            if last_was_agent:
                cur["agents"].append(value.lower())
            else:
                cur = {"agents": [value.lower()], "rules": [], "delay": None}
                groups.append(cur)
            last_was_agent = True
        elif directive in ("disallow", "allow"):
            cur["rules"].append((directive == "allow", value))
            last_was_agent = False
        elif directive == "crawl-delay":
            try:
                cur["delay"] = int(float(value))
            except ValueError:
                pass
            last_was_agent = False
        else:
            last_was_agent = False

    def pick() -> dict:
        best, best_len = None, -1
        for g in groups:
            for a in g["agents"]:
                if a != "*" and (a in agent or agent in a) and len(a) > best_len:
                    best, best_len = g, len(a)
        if best:
            return best
        for g in groups:
            if "*" in g["agents"]:
                return g
        return implicit

    g = pick()
    out.rules = list(implicit["rules"]) if g is implicit else list(g["rules"])
    out.crawl_delay = g["delay"] if g["delay"] is not None else implicit["delay"]
    return out


# --------------------------------------------------------------- sitemap XML

_SITEMAP_TAG = re.compile(r"^\{[^}]*\}")


@dataclass
class SitemapEntry:
    loc: str
    type: str  # 'PAGE' (urlset) | 'SITEMAP' (sitemapindex) — Sitemap.java:51-69
    changefreq: str | None = None  # upper-cased enum name
    priority: float | None = None
    lastmod: str | None = None  # raw W3C text (store keeps the string)


def parse_sitemap(content: bytes | str) -> list[SitemapEntry]:
    """StAX-equivalent pull parse of urlset/sitemapindex (``Sitemap.java:34-98``)."""
    import xml.etree.ElementTree as ET

    if isinstance(content, bytes):
        content = content.decode("utf-8", "replace")
    root = ET.fromstring(content)
    local = _SITEMAP_TAG.sub("", root.tag)
    if local == "urlset":
        child_tag, entry_type = "url", "PAGE"
    elif local == "sitemapindex":
        child_tag, entry_type = "sitemap", "SITEMAP"
    else:
        raise ValueError("Invalid sitemap. Expected urlset or sitemapindex element")
    entries = []
    for child in root:
        if _SITEMAP_TAG.sub("", child.tag) != child_tag:
            continue
        loc = changefreq = lastmod = None
        priority = None
        for sub in child:
            tag = _SITEMAP_TAG.sub("", sub.tag)
            text = (sub.text or "").strip()
            if tag == "loc":
                loc = text
            elif tag == "changefreq":
                changefreq = text.upper()
            elif tag == "priority":
                try:
                    priority = float(text)
                except ValueError:
                    pass
            elif tag == "lastmod":
                lastmod = text
        if loc:
            entries.append(SitemapEntry(loc, entry_type, changefreq, priority, lastmod))
    return entries


def parse_changefreq_days(changefreq: str | None) -> int | None:
    """changefreq → revisit days (``Sitemap.java:149-165`` — lossy bucketing
    is intentional; copied exactly)."""
    if changefreq is None:
        return None
    c = changefreq.lower()
    if c in ("always", "hourly", "daily"):
        return 1
    if c == "weekly":
        return 7
    if c == "monthly":
        return 29
    if c in ("yearly", "never"):
        return 365
    return None


def try_parse_w3c_date(date: str):
    """Multi-format W3C lastmod parse (``Sitemap.java:100-110``): ISO offset
    datetime, else yyyy[-MM[-dd]].  Returns a datetime/date or None."""
    from datetime import date as ddate
    from datetime import datetime

    try:
        return datetime.fromisoformat(date)
    except ValueError:
        pass
    for fmt, conv in (
        ("%Y-%m-%d", lambda d: d.date()),
        ("%Y-%m", lambda d: d.date().replace(day=1)),
        ("%Y", lambda d: ddate(d.year, 1, 1)),
    ):
        try:
            return conv(datetime.strptime(date, fmt))
        except ValueError:
            continue
    return None


# -------------------------------------------------------- HTML/CSS extraction

# Direct port of the reference regexes (Analysis.java:31-32) — syntax is
# compatible between java.util.regex and Python re for these patterns.
_SRCSET = re.compile(r"[\s,]*(\S*[^,\s])(?:\s(?:[^,(]+|\([^)]*(?:\)|$))*)?", re.M)
_META_REFRESH = re.compile(r"\d+\s*;\s*url=['\"]?(.*?)['\"]?")

_CSS_URL = re.compile(r"url\(\s*(?:'([^']*)'|\"([^\"]*)\"|([^)'\"\s][^)\s]*))\s*\)", re.I)
_CSS_IMPORT = re.compile(r"@import\s+(?:url\(\s*)?['\"]?([^'\")\s;]+)['\"]?\s*\)?", re.I)
_CSS_FONT_FACE = re.compile(r"@font-face\s*\{([^}]*)\}", re.I | re.S)

_VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr", "command", "frame",
}


@dataclass
class AnalysisResult:
    """Mirror of the reference ``Analysis`` outputs (``Analysis.java:36-42``)."""

    resources: list = field(default_factory=list)  # [(url, rtype)] ssurt-sorted, first-wins
    links: list = field(default_factory=list)  # [url] ssurt-sorted, fragment-stripped
    title: str | None = None
    has_script: bool = False


class _Extractor(HTMLParser):
    def __init__(self, base_url: str):
        super().__init__(convert_charrefs=True)
        self.base = base_url
        self.resource_map: dict[str, tuple[str, str]] = {}  # ssurt → (url, type)
        self.link_map: dict[str, str] = {}  # ssurt → url
        self.title: str | None = None
        self.has_script = False
        self._stack: list[str] = []
        self._in_title = False
        self._title_done = False
        self._style_buf: list[str] | None = None

    # -- collection (ref Analysis.java:59-77: ssurt-keyed, first-wins) ------
    def add_resource(self, url: str | None, rtype: str):
        if not url or url.isspace():
            return
        try:
            u = Url(resolve(self.base, url))
        except ValueError:
            return
        self.resource_map.setdefault(u.ssurt, (str(u), rtype))

    def add_link(self, url: str | None):
        if not url or url.isspace():
            return
        try:
            u = Url(resolve(self.base, url))
        except ValueError:
            return
        if u.p.scheme not in ("http", "https"):
            return
        u = u.without_fragment()
        self.link_map.setdefault(u.ssurt, str(u))

    def _srcset(self, value: str | None):
        if not value:
            return
        pos = 0
        while pos < len(value):
            m = _SRCSET.match(value, pos)
            if not m:
                break
            self.add_resource(m.group(1), "Image")
            if m.end() == pos:
                break
            pos = m.end()

    def _css(self, text: str, rtype_default: str = "Image"):
        for m in _CSS_IMPORT.finditer(text):
            self.add_resource(m.group(1), "Stylesheet")
        font_spans = [m.span(1) for m in _CSS_FONT_FACE.finditer(text)]
        for m in _CSS_URL.finditer(text):
            url = m.group(1) or m.group(2) or m.group(3)
            in_font = any(s <= m.start() < e for s, e in font_spans)
            # @import url(...) already captured above
            before = text[max(0, m.start() - 16) : m.start()].lower()
            if "@import" in before:
                continue
            self.add_resource(url, "Font" if in_font else rtype_default)

    # -- HTMLParser events (mirror of Analysis.java:169-254 switch) ---------
    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        style = a.get("style")
        if style and style.strip():
            self._css(style)
        if tag in ("a", "area"):
            self.add_link(a.get("href"))
        elif tag in ("audio", "track"):
            self.add_resource(a.get("src"), "Media")
        elif tag == "command":
            self.add_resource(a.get("icon"), "Image")
        elif tag == "frame":
            self.add_resource(a.get("src"), "Document")
        elif tag in ("img", "source"):
            rtype = "Image"
            if tag == "source" and self._stack and self._stack[-1] in ("audio", "video"):
                rtype = "Media"
            self.add_resource(a.get("src"), rtype)
            self._srcset(a.get("srcset"))
            self.add_resource(a.get("data-src"), rtype)  # extraAttrs=true
            self._srcset(a.get("data-srcset"))
        elif tag == "link":
            if (a.get("rel") or "").lower() == "stylesheet":
                self.add_resource(a.get("href"), "Stylesheet")
        elif tag == "meta":
            if (a.get("http-equiv") or "").lower() == "refresh":
                m = _META_REFRESH.fullmatch(a.get("content") or "")
                if m:
                    self.add_resource(m.group(1), "Document")
        elif tag == "input":
            self.add_resource(a.get("src"), "Image")
        elif tag == "script":
            self.has_script = True
            self.add_resource(a.get("src"), "Script")
        elif tag == "video":
            self.add_resource(a.get("poster"), "Image")
            self.add_resource(a.get("src"), "Media")
        elif tag == "title" and not self._title_done:
            self._in_title = True
            self.title = ""
        elif tag == "style":
            self._style_buf = []
        if tag not in _VOID_TAGS:
            self._stack.append(tag)

    def handle_endtag(self, tag):
        if tag == "title" and self._in_title:
            self._in_title = False
            self._title_done = True
        if tag == "style" and self._style_buf is not None:
            self._css("".join(self._style_buf))
            self._style_buf = None
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i] == tag:
                del self._stack[i:]
                break

    def handle_data(self, data):
        if self._in_title:
            self.title = (self.title or "") + data
        if self._style_buf is not None:
            self._style_buf.append(data)


def extract_html(body: bytes | str, base_url: str) -> AnalysisResult:
    """HTML link/resource extraction (``Analysis.java:169-254``)."""
    if isinstance(body, bytes):
        body = body.decode("utf-8", "replace")
    ex = _Extractor(base_url)
    try:
        ex.feed(body)
        ex.close()
    except Exception:
        pass
    # leftover open <style> (unclosed) — flush like a tolerant parser would
    if ex._style_buf:
        ex._css("".join(ex._style_buf))
    return AnalysisResult(
        resources=[ex.resource_map[k] for k in sorted(ex.resource_map)],
        links=[ex.link_map[k] for k in sorted(ex.link_map)],
        title=ex.title.strip() if ex.title is not None else None,
        has_script=ex.has_script,
    )


def extract_css(body: bytes | str, base_url: str) -> AnalysisResult:
    """CSS resource extraction (``Analysis.java:262-353``): @import →
    Stylesheet, @font-face src url() → Font, other url() → Image."""
    if isinstance(body, bytes):
        body = body.decode("utf-8", "replace")
    ex = _Extractor(base_url)
    ex._css(body)
    return AnalysisResult(
        resources=[ex.resource_map[k] for k in sorted(ex.resource_map)],
        links=[],
    )


def analyze_payload(
    content_type: str | None,
    body: bytes | str | None,
    base_url: str,
    location_header: str | None = None,
) -> AnalysisResult:
    """Dispatch like ``Analysis.parsePayload`` (``Analysis.java:300-317``):
    Location header → link; text/html → HTML parse; text/css → CSS parse."""
    ct = (content_type or "").split(";")[0].strip().lower()
    if ct == "text/html":
        result = extract_html(body or "", base_url)
    elif ct == "text/css":
        result = extract_css(body or "", base_url)
    else:
        result = AnalysisResult()
    if location_header:
        ex = _Extractor(base_url)
        ex.link_map = {Url(u).ssurt: u for u in result.links}
        ex.add_link(location_header)
        result.links = [ex.link_map[k] for k in sorted(ex.link_map)]
    return result


# ----------------------------------------------------------- misc utilities

_BLOCK_TAGS = {
    "p", "div", "br", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5", "h6",
    "tr", "table", "blockquote", "pre", "section", "article", "header",
    "footer", "form",
}


def html_to_text(body: bytes | str) -> str:
    """Block-element-aware HTML → text (ref ``Storage.java:204-223``):
    block tags emit newlines, scripts/styles are dropped, entities decoded."""
    if isinstance(body, bytes):
        body = body.decode("utf-8", "replace")

    class _T(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.out: list[str] = []
            self._skip = 0

        def handle_starttag(self, tag, attrs):
            if tag in ("script", "style"):
                self._skip += 1
            elif tag in _BLOCK_TAGS:
                self.out.append("\n")

        def handle_endtag(self, tag):
            if tag in ("script", "style") and self._skip:
                self._skip -= 1
            elif tag in _BLOCK_TAGS:
                self.out.append("\n")

        def handle_data(self, data):
            if not self._skip:
                self.out.append(data)

    t = _T()
    try:
        t.feed(body)
        t.close()
    except Exception:
        pass
    text = "".join(t.out)
    lines = [" ".join(l.split()) for l in text.split("\n")]
    return "\n".join(l for l in lines if l)


def jpeg_data_url(data: bytes) -> str:
    """``data:image/jpeg;base64,...`` (ref ``Util.java:25-27``)."""
    import base64

    return "data:image/jpeg;base64," + base64.b64encode(data).decode("ascii")
