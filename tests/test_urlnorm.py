"""M1/M2 URL normalization + filtering (reference crawtext: url.py)."""

from crawtext_ray.extract.urlnorm import (
    canon_url,
    domain_of,
    has_bad_extension,
    is_crawlable,
)


def test_relative_resolution():
    assert canon_url("http://a.com/x/y", "z") == "http://a.com/x/z"
    assert canon_url("http://a.com/x/", "../up") == "http://a.com/up"
    assert canon_url("http://a.com", "//b.com/p") == "http://b.com/p"


def test_fragment_stripped():
    assert canon_url("http://a.com", "/p#frag") == "http://a.com/p"


def test_scheme_host_lowercased_default_port_dropped():
    assert canon_url("", "HTTP://WWW.Example.COM:80/P") == "http://www.example.com/P"
    assert canon_url("", "https://a.com:443/x") == "https://a.com/x"
    assert canon_url("", "https://a.com:8443/x") == "https://a.com:8443/x"


def test_empty_path_trailing_slash_stripped():
    assert canon_url("", "http://a.com/") == "http://a.com"


def test_utm_params_dropped_order_preserved():
    assert (
        canon_url("", "http://a.com/p?b=2&utm_source=x&a=1&utm_campaign=y")
        == "http://a.com/p?b=2&a=1"
    )


def test_non_http_schemes_rejected():
    assert canon_url("http://a.com", "mailto:x@y.z") == ""
    assert canon_url("http://a.com", "javascript:void(0)") == ""
    assert canon_url("", "ftp://a.com/f") == ""


def test_bad_extensions():
    assert has_bad_extension("http://a.com/img.JPG")
    assert has_bad_extension("http://a.com/x/y.pdf")
    assert not has_bad_extension("http://a.com/article")
    assert not has_bad_extension("http://a.com/article.html")
    assert is_crawlable("http://a.com/ok")
    assert not is_crawlable("http://a.com/f.zip")


def test_domain_of():
    assert domain_of("http://Sub.Example.com:8080/p") == "sub.example.com"
    assert domain_of("not a url") == ""


def test_simple_http_path_differential():
    """_simple_http_path must equal urlsplit().path wherever it claims a
    result; shapes it declines fall back to urlsplit in the callers."""
    from urllib.parse import urlsplit

    from crawtext_ray.extract.urlnorm import _simple_http_path

    cases = [
        "http://a.com/x/y.pdf",
        "https://a.com",
        "http://a.com/",
        "http://a.com/p?q=1.zip",
        "http://a.com/p#frag.gif",
        "http://a.com/p?x=1#f",
        "http://a.com/p#f?x=1.png",
        "http://a.com/a%2Fb.c",
        "http:///rootless.path",
        "https://host:8080/with.port",
        "http://user:pw@host/with.auth",
        "http://a.com/trailing.",
        "http://a.com/.hidden",
        "http://a.com/..",
        "http://a.com/path with space.doc",
        "https://a.com/?only=query",
        "http://a.com#only-frag",
    ]
    for u in cases:
        fast = _simple_http_path(u)
        assert fast is not None, u
        assert fast == urlsplit(u).path, u
    # declined shapes: slow path must be used (None), never a wrong answer
    for u in [
        "HTTP://a.com/x",          # uppercase scheme prefix
        "ftp://a.com/x",
        "http://[::1]/v6.path",    # IPv6 netloc
        "http://a.com/tab\t.pdf",  # urlsplit strips unsafe bytes
        "relative/path.png",
        "",
    ]:
        assert _simple_http_path(u) is None, u


def test_is_crawlable_differential_vs_urlsplit():
    """is_crawlable fast path agrees with a pure-urlsplit reference
    implementation across url shapes (byte-identity guard for M2)."""
    from urllib.parse import urlsplit

    from crawtext_ray.extract.urlnorm import (
        ALLOWED_SCHEMES,
        BAD_EXTENSIONS,
        is_crawlable,
    )

    def ref(url: str) -> bool:
        try:
            parts = urlsplit(url)
        except ValueError:
            return False
        if parts.scheme.lower() not in ALLOWED_SCHEMES:
            return False
        path = parts.path.lower()
        dot = path.rfind(".")
        return dot == -1 or path[dot:] not in BAD_EXTENSIONS

    cases = [
        "http://a.com/ok", "http://a.com/f.zip", "https://a.com",
        "HTTP://A.com/F.ZIP", "https://a.com/x.HtMl", "ftp://a.com/f",
        "http://a.com/p?x=.pdf", "http://a.com/p#.pdf",
        "http://a.com/deep/path/file.webm", "http://[::1]/x.png",
        "mailto:x@y.z", "", "not a url", "http://a.com/a.b.c.exe",
        "https://host:443/x.y", "http://a.com/%2e%2e/f.js",
        # malformed brackets: urlsplit raises, so these must NOT leak
        # into the frontier (path-less and userinfo-bracket shapes)
        "http://[invalid", "http://a]b@host/page", "http://a[b@host",
        "http://host]x", "http://[::1",
    ]
    for u in cases:
        assert is_crawlable(u) == ref(u), u


def test_simple_http_host_differential():
    """_simple_http_host must equal (urlsplit().hostname or '').lower()
    wherever it claims a result; declined shapes fall back to urlsplit."""
    from urllib.parse import urlsplit

    from crawtext_ray.extract.urlnorm import _simple_http_host

    cases = [
        "http://a.com/x", "https://A.Com", "http://a.com",
        "http://Sub.Example.com:8080/p", "http://host:/p",
        "http://user:pw@Host.com/x", "http://@host/x",
        "http://a@b@c.com/x",          # rightmost @ wins
        "http:///rootless", "http://", "https://host?q=1", "http://h#f",
        "http://host:bad/p",           # hostname ignores port validity
        "http://xn--bcher-kva.example/x",
        "http://a.com:80?x@y",         # @ in query, not netloc
    ]
    for u in cases:
        fast = _simple_http_host(u)
        assert fast is not None, u
        assert fast == (urlsplit(u).hostname or "").lower(), u
    for u in [
        "HTTP://a.com/x", "ftp://a.com/x", "http://[::1]/x",
        "http://[::1]:8080/x", "http://a\t.com/x", "rel/x", "",
        "http://a]b@evil.com/x",   # bracket in USERINFO: urlsplit raises
        "http://a[b@evil.com/x",
    ]:
        assert _simple_http_host(u) is None, u
    # and domain_of keeps its "" contract on those (urlsplit ValueError)
    from crawtext_ray.extract.urlnorm import domain_of
    assert domain_of("http://a]b@evil.com/x") == ""


def test_should_block_memo():
    """Memoized verdicts equal fresh ones, and the memo is bounded."""
    from crawtext_ray.extract.adblock import AdblockRules

    rules = AdblockRules(["||ads.example.com^", "/banner/", "@@||ads.example.com/ok/"])
    cases = [
        ("http://ads.example.com/x", True),
        ("http://ads.example.com/ok/x", False),
        ("http://a.com/banner/1.gif", True),
        ("http://a.com/fine", False),
    ]
    for u, want in cases:
        assert rules.should_block(u) == want, u
        assert rules.should_block(u) == want, u  # memo hit path
    rules._verdicts = dict.fromkeys(map(str, range((1 << 17) - 1)), False)
    assert rules.should_block("http://a.com/banner/2.gif") is True
    assert len(rules._verdicts) <= (1 << 17)
