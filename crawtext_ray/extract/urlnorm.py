"""URL normalization + scheme/extension filtering (SURVEY.md §2.2 M1/M2;
reference crawtext: url.py).

Canonicalization contract: resolve relative -> absolute against the base,
strip the fragment, lowercase scheme+host, drop default ports, drop
``utm_*`` tracking params (preserving remaining param order), and strip
the trailing "/" of an empty path.
"""

from __future__ import annotations

from functools import lru_cache
from urllib.parse import parse_qsl, urlencode, urljoin, urlsplit, urlunsplit

# canon_url's output is re-split by is_crawlable/domain_of/adblock on the
# same string; stdlib's internal parse cache holds only 20 entries, so we
# memoize properly (pure function, bounded).
_cached_urlsplit = lru_cache(maxsize=8192)(urlsplit)

_DEFAULT_PORTS = {"http": "80", "https": "443"}

# crawtext: url.py bad-extension list analog (M2)
BAD_EXTENSIONS = frozenset(
    ".jpg .jpeg .png .gif .bmp .webp .svg .ico .tif .tiff "
    ".css .js .json .xml .rss .atom "
    ".pdf .doc .docx .xls .xlsx .ppt .pptx .odt "
    ".zip .gz .tgz .tar .rar .7z .bz2 "
    ".mp3 .wav .ogg .flac .aac .m4a "
    ".mp4 .avi .mov .wmv .flv .mkv .webm .mpg .mpeg "
    ".exe .dmg .apk .iso .bin .swf".split()
)

ALLOWED_SCHEMES = frozenset(["http", "https"])


import re as _re

# already-canonical absolute url: lowercase scheme+host, no port, no
# query/fragment, non-empty path without trailing whitespace — the
# overwhelmingly common outlink shape; bypasses urlsplit entirely
_FAST_CANON = _re.compile(
    r"^(https?)://([a-z0-9](?:[a-z0-9.\-]*[a-z0-9])?)(/[^/?#\s][^?#\s]*)?$"
)


def canon_url(base: str, href: str) -> str:
    """M1: canonical absolute URL, or "" when the result is unusable."""
    try:
        href = href.strip()
        m = _FAST_CANON.match(href)
        if m:
            return f"{m.group(1)}://{m.group(2)}{m.group(3) or ''}"
        if not base or href.startswith(("http://", "https://")):
            absu = href  # urljoin(base, absolute) == absolute; skip the work
        else:
            absu = urljoin(base, href)
        parts = urlsplit(absu)
    except ValueError:
        return ""
    scheme = parts.scheme.lower()
    if scheme not in ALLOWED_SCHEMES:
        return ""
    host = parts.hostname or ""
    if not host:
        return ""
    host = host.lower()
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    # trailing whitespace can survive urljoin when the href had spaces
    # before its fragment; canonical form must be a fixed point
    path = parts.path.rstrip()
    if path == "/":
        path = ""
    query = parts.query
    if query:
        kept = [(k, v) for k, v in parse_qsl(query, keep_blank_values=True)
                if not k.lower().startswith("utm_")]
        query = urlencode(kept)
    return urlunsplit((scheme, netloc, path, query, ""))


def _simple_http_path(url: str) -> str | None:
    """Path component of a plain lowercase-scheme http(s) URL without the
    urlsplit machinery, or None when the shape needs the slow path.
    Equivalence with ``urlsplit(url).path`` on the accepted shapes is
    asserted by a differential test (test_urlnorm)."""
    if url.startswith("https://"):
        i = 8
    elif url.startswith("http://"):
        i = 7
    else:
        return None
    if "\t" in url or "\r" in url or "\n" in url:
        return None  # urlsplit strips these; defer to it
    end = len(url)
    h = url.find("#", i)
    if h != -1:
        end = h
    q = url.find("?", i)
    if q != -1 and q < end:
        end = q
    if "[" in url[i:end] or "]" in url[i:end]:
        # brackets anywhere before the fragment/query (netloc OR userinfo,
        # path-less or not): urlsplit validates placement and may raise —
        # defer so malformed-bracket URLs stay non-crawlable
        return None
    s = url.find("/", i)
    if s == -1 or s >= end:
        return ""
    return url[s:end]


def _simple_http_host(url: str) -> str | None:
    """Lowercased host of a plain lowercase-scheme http(s) URL without the
    urlsplit machinery, or None when the shape needs the slow path.
    Equivalence with ``(urlsplit(url).hostname or "").lower()`` on the
    accepted shapes is asserted by a differential test (test_urlnorm)."""
    if url.startswith("https://"):
        i = 8
    elif url.startswith("http://"):
        i = 7
    else:
        return None
    if "\t" in url or "\r" in url or "\n" in url:
        return None  # urlsplit strips these; defer to it
    end = len(url)
    for sep in "/?#":
        j = url.find(sep, i)
        if j != -1 and j < end:
            end = j
    netloc = url[i:end]
    if "[" in netloc or "]" in netloc:
        # IPv6 (or brackets anywhere in the authority, incl. userinfo):
        # urlsplit validates bracket placement and may raise — defer,
        # BEFORE stripping userinfo, so "http://a]b@host/" stays on the
        # slow path and keeps domain_of's "" contract
        return None
    at = netloc.rfind("@")
    if at != -1:
        netloc = netloc[at + 1:]
    colon = netloc.find(":")
    if colon != -1:
        netloc = netloc[:colon]
    return netloc.lower()


def has_bad_extension(url: str) -> bool:
    """M2: media/binary extension test on the path."""
    path = _simple_http_path(url)
    if path is None:
        try:
            path = _cached_urlsplit(url).path
        except ValueError:
            return True
    path = path.lower()
    dot = path.rfind(".")
    if dot == -1:
        return False
    return path[dot:] in BAD_EXTENSIONS


def is_crawlable(url: str) -> bool:
    """M2 combined filter: http(s) scheme and no bad extension."""
    # fast path: the lowercase "http(s)://" prefix IS the scheme test
    path = _simple_http_path(url)
    if path is not None:
        path = path.lower()
        dot = path.rfind(".")
        return dot == -1 or path[dot:] not in BAD_EXTENSIONS
    try:
        scheme = _cached_urlsplit(url).scheme.lower()
    except ValueError:
        return False
    return scheme in ALLOWED_SCHEMES and not has_bad_extension(url)


def domain_of(url: str) -> str:
    """Scalar fn (SURVEY.md §2.9): lowercased host, or ""."""
    host = _simple_http_host(url)
    if host is not None:
        return host
    try:
        return (_cached_urlsplit(url).hostname or "").lower()
    except ValueError:
        return ""
