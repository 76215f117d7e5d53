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
