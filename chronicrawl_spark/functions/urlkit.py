"""URL canonicalization, identity, and SSURT ordering — reference parity layer.

The reference canonicalizes every URL with ``org.netpreserve.urlcanon``'s
WHATWG canonicalizer (``Url.java:21-24``), derives identities as
``xxh64(utf8, seed=0)`` of the canonical string / origin / pathref
(``Url.java:30-66``), and orders link sets by SSURT form (``Url.java:130-140``).

This module is a from-scratch Python implementation of the WHATWG-style
canonicalization subset the engine needs (the ``urlcanon`` PyPI package is
not in the sandbox).  Divergences from java-urlcanon on exotic inputs are
possible and are pinned down by golden-vector tests over every URL shape the
fixtures and reference tests use (``tests/test_urlkit.py``).

Everything here is plain Python operating on *batches* (lists / pandas
Series) so the Spark entry points in ``udfs.py`` stay Arrow-vectorized.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import lru_cache
from urllib.parse import urljoin

from .hashing import hash_str

DEFAULT_PORTS = {"http": "80", "https": "443", "ws": "80", "wss": "443", "ftp": "21"}

_URL_RE = re.compile(
    r"^(?P<scheme>[a-zA-Z][a-zA-Z0-9+.-]*):"
    r"(?P<slashes>/*)"
    r"(?P<authority>[^/?#]*)"
    r"(?P<path>[^?#]*)"
    r"(?P<q>\?[^#]*)?"
    r"(?P<frag>#.*)?$",
    re.DOTALL,
)

# WHATWG: strip ASCII tab/newline anywhere; trim C0 controls + space at ends.
_TAB_NL = re.compile(r"[\t\n\r]")

# Characters we leave as-is in paths (everything else already %-escaped stays).
_PATH_SAFE = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
    "-._~!$&'()*+,;=:@/%"
)
_QUERY_SAFE = _PATH_SAFE | {"?"}
_HEX = "0123456789ABCDEF"


def _pct_normalize(s: str, safe: set) -> str:
    """Uppercase existing %XX escapes; %-encode bytes outside ``safe``."""
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "%" and i + 3 <= n:
            h = s[i + 1 : i + 3]
            if all(x in "0123456789abcdefABCDEF" for x in h):
                out.append("%" + h.upper())
                i += 3
                continue
        if c in safe:
            out.append(c)
        else:
            for b in c.encode("utf-8"):
                out.append("%" + _HEX[b >> 4] + _HEX[b & 15])
        i += 1
    return "".join(out)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 — same algorithm the WHATWG path normalizer applies."""
    output: list[str] = []
    buf = path
    while buf:
        if buf.startswith("../"):
            buf = buf[3:]
        elif buf.startswith("./"):
            buf = buf[2:]
        elif buf.startswith("/./"):
            buf = "/" + buf[3:]
        elif buf == "/.":
            buf = "/"
        elif buf.startswith("/../"):
            buf = "/" + buf[4:]
            if output:
                output.pop()
        elif buf == "/..":
            buf = "/"
            if output:
                output.pop()
        elif buf in (".", ".."):
            buf = ""
        else:
            i = buf.find("/", 1) if buf.startswith("/") else buf.find("/")
            if i == -1:
                output.append(buf)
                buf = ""
            else:
                output.append(buf[:i])
                buf = buf[i:]
    return "".join(output)


@dataclass(frozen=True)
class ParsedUrl:
    """Canonical decomposition mirroring urlcanon's ParsedUrl accessors."""

    scheme: str
    host: str
    port: str  # '' when absent/default
    path: str
    query: str  # without leading '?'
    has_query: bool
    fragment: str  # without leading '#'
    has_fragment: bool

    @property
    def origin(self) -> str:
        # ref Url.java:38-41 — scheme + ':' + slashes + host [+ ':' + port]
        p = f":{self.port}" if self.port else ""
        return f"{self.scheme}://{self.host}{p}"

    @property
    def pathref(self) -> str:
        # ref Url.java:60-62 — path + questionMark + query
        return self.path + ("?" + self.query if self.has_query else "")

    @property
    def url(self) -> str:
        f = "#" + self.fragment if self.has_fragment else ""
        return self.origin + self.pathref + f

    @property
    def ssurt(self) -> str:
        """SSURT form (ref ``Url.java:130-140``, ``Analysis.java:36-37``,
        which delegate to urlcanon's ``ParsedUrl.ssurt()``).

        Implements the grammar of the PUBLIC ssurt spec (iipc/urlcanon
        ``ssurt.rst``): ``ssurt_host "//" [port] ":" scheme ["@" userinfo]
        ":" path ["?" query]`` where ``ssurt_host`` is the dotted host with
        labels reversed, comma-joined, trailing comma — except IP addresses,
        which stay verbatim (no reversal, no comma).  The field order
        (host, port, scheme) is what makes the lexicographic sort group a
        host's captures together across ports/schemes — the property U3/U4
        and the link-set ordering rely on.  Userinfo never appears here
        because ``parse_canonical`` strips it for identity.  Golden vectors
        derived from the spec grammar are pinned in test_urlkit."""
        labels = self.host.split(".")
        is_ip = all(p.isdigit() for p in labels) and len(labels) == 4
        rev = self.host if is_ip else ",".join(reversed(labels)) + ","
        return f"{rev}//{self.port}:{self.scheme}:{self.pathref}"


@lru_cache(maxsize=65536)
def parse_canonical(url: str, keep_fragment: bool = True) -> ParsedUrl | None:
    """WHATWG-style canonicalization (subset):

    - strip tab/CR/LF anywhere, trim controls/space at ends
    - lowercase scheme + host; IDNA-encode non-ASCII hosts
    - drop default port; empty path → '/'
    - dot-segment removal; percent-escape normalization
    """
    if url is None:
        return None
    url = _TAB_NL.sub("", url.strip(" \x00\x01\x02\x03\x04\x05\x06\x07\x08\x0b\x0c\x0e\x0f\x10\x11\x12\x13\x14\x15\x16\x17\x18\x19\x1a\x1b\x1c\x1d\x1e\x1f\x7f"))
    m = _URL_RE.match(url)
    if not m:
        return None
    scheme = m.group("scheme").lower()
    authority = m.group("authority")
    # userinfo (rare; reference fixtures never use it) — strip for identity
    if "@" in authority:
        authority = authority.rsplit("@", 1)[1]
    host, port = authority, ""
    if host.startswith("["):  # IPv6 literal
        end = host.find("]")
        if end != -1 and len(host) > end + 1 and host[end + 1] == ":":
            port = host[end + 2 :]
            host = host[: end + 1]
    elif ":" in host:
        host, port = host.rsplit(":", 1)
    host = host.lower().rstrip(".")
    if any(ord(c) > 127 for c in host):
        try:
            host = host.encode("idna").decode("ascii")
        except UnicodeError:
            pass
    port = port.lstrip("0") or "" if port else ""
    if port == DEFAULT_PORTS.get(scheme, None):
        port = ""
    path = m.group("path") or ""
    if scheme in DEFAULT_PORTS:
        path = _remove_dot_segments(path) if path else "/"
        if not path.startswith("/"):
            path = "/" + path
        path = _pct_normalize(path, _PATH_SAFE)
    q = m.group("q")
    has_query = q is not None
    query = _pct_normalize(q[1:], _QUERY_SAFE) if has_query else ""
    frag = m.group("frag")
    has_fragment = keep_fragment and frag is not None
    fragment = frag[1:] if (frag is not None and keep_fragment) else ""
    return ParsedUrl(scheme, host, port, path, query, has_query, fragment, has_fragment)


def canonicalize(url: str, keep_fragment: bool = False) -> str | None:
    p = parse_canonical(url, keep_fragment)
    return p.url if p else None


def resolve(base: str, ref: str) -> str:
    """Relative-URL resolution (ref ``Url.java:52-54`` java.net.URI.resolve;
    RFC 3986 via urljoin — divergences on empty refs are fixture-tested)."""
    return urljoin(base, ref)


class Url:
    """Driver-side convenience mirroring the reference's ``Url`` class."""

    __slots__ = ("p",)

    def __init__(self, url: str):
        p = parse_canonical(url)
        if p is None:
            raise ValueError(f"unparseable url: {url!r}")
        self.p = p

    def __str__(self) -> str:
        return self.p.url

    @property
    def origin(self) -> str:
        return self.p.origin

    @property
    def pathref(self) -> str:
        return self.p.pathref

    def id(self) -> int:
        return hash_str(str(self))

    def origin_id(self) -> int:
        return hash_str(self.origin)

    def path_id(self) -> int:
        return hash_str(self.pathref)

    def resolve(self, other: str) -> "Url":
        return Url(resolve(str(self), other))

    def without_fragment(self) -> "Url":
        return Url(canonicalize(str(self), keep_fragment=False))

    @property
    def ssurt(self) -> str:
        return self.p.ssurt


# ---------------------------------------------------------------- batch API
# These operate on python lists (called from Arrow-batched pandas UDFs).

def batch_canonicalize(urls, keep_fragment: bool = False):
    return [canonicalize(u, keep_fragment) if u is not None else None for u in urls]


def batch_parts(urls):
    """url → (canon_url, origin, pathref, origin_id, path_id, url_id, ssurt).

    One parse per distinct URL (lru-cached parse + hash) — the hot identity
    path for frontier merges.
    """
    out = []
    for u in urls:
        p = parse_canonical(u, False) if u is not None else None
        if p is None:
            out.append((None, None, None, None, None, None, None))
        else:
            origin, pathref, cu = p.origin, p.pathref, p.url
            out.append(
                (cu, origin, pathref, hash_str(origin), hash_str(pathref), hash_str(cu), p.ssurt)
            )
    return out
