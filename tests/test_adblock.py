"""F1–F3 Adblock-style filtering (EasyList syntax subset)."""

from crawtext_ray.extract.adblock import AdblockRules
from crawtext_ray.extract.dom import parse_html

RULES = [
    "! comment line",
    "||ads.example.com^",
    "/banner/",
    "&ad_box_",
    "|http://exact.start.example/x",
    "swf|",
    "/promo/*/track",
    "@@||ads.example.com/allowed/",
    "only-on-domain$domain=special.example|~sub.special.example",
    "##.ad-banner",
    "###ad-slot",
    "##aside.promo",
    "#@#.ad-banner-editorial",
]


def rules():
    return AdblockRules(RULES)


def test_domain_anchor():
    r = rules()
    assert r.should_block("http://ads.example.com/x")
    assert r.should_block("https://sub.ads.example.com/x")
    assert not r.should_block("http://notads.example.com/x")
    assert not r.should_block("http://ads.example.com.evil.net/x".replace("ads.example.com.", "other."))


def test_substring_and_wildcard():
    r = rules()
    assert r.should_block("http://a.com/banner/top")
    assert r.should_block("http://a.com/p?x=1&ad_box_2=3")
    assert r.should_block("http://a.com/promo/v1/track")
    assert not r.should_block("http://a.com/promotion/track")


def test_start_end_anchor():
    r = rules()
    assert r.should_block("http://exact.start.example/x")
    assert not r.should_block("http://pre.exact.start.example/x")
    assert r.should_block("http://a.com/movie.swf")
    assert not r.should_block("http://a.com/movie.swf.html")


def test_exception_beats_block():
    r = rules()
    assert not r.should_block("http://ads.example.com/allowed/thing")
    assert r.should_block("http://ads.example.com/other")


def test_domain_option():
    r = rules()
    assert r.should_block("http://special.example/only-on-domain")
    assert not r.should_block("http://other.example/only-on-domain")
    assert not r.should_block("http://sub.special.example/only-on-domain")


def test_element_hiding_and_exception():
    r = rules()
    root = parse_html(
        '<body><div class="ad-banner">x</div><div id="ad-slot">y</div>'
        '<aside class="promo">z</aside><aside class="other">keep</aside>'
        '<div class="ad-banner-editorial">keep2</div>'
        '<div class="ad-banner ad-banner-editorial">hidden: block rule class present</div>'
        "</body>"
    )
    removed = r.hide_elements(root)
    body = root.find_first("body")
    texts = body.text_content()
    assert "keep" in texts and "keep2" in texts
    assert "x" not in texts and "y" not in texts and "z" not in texts
    # the combined-class node matches .ad-banner AND the #@# exception -> kept
    assert "hidden: block rule class present" in texts
    assert removed == 3
