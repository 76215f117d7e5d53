"""C1–C6 document cleaner branches (reference goose: goose/cleaners.py)."""

from crawtext_ray.extract import cleaners
from crawtext_ray.extract.dom import parse_html


def text(root):
    return root.text_content()


def test_c1_comments_removed():
    r = parse_html("<p>a<!-- gone -->b</p>")
    cleaners.remove_comments(r)
    assert not any(n.tag == "#comment" for n in r.iter())
    assert text(r) == "ab"


def test_c2_scripts_styles_removed_with_content():
    r = parse_html(
        "<body><script>var x=1;</script><style>p{}</style>"
        "<noscript>ns</noscript><p>keep</p></body>"
    )
    cleaners.remove_scripts_styles(r)
    assert text(r).strip() == "keep"


def test_c3_naughty_ids_classes():
    r = parse_html(
        '<body><div class="sidebar">s</div><div id="footer">f</div>'
        '<div name="comment">c</div><div class="story">keep</div></body>'
    )
    cleaners.remove_naughty_nodes(r)
    assert text(r).strip() == "keep"


def test_c3_never_removes_body():
    r = parse_html('<body class="sidebar"><p>keep</p></body>')
    cleaners.remove_naughty_nodes(r)
    assert r.find_first("body") is not None


def test_c4_targeted_regexes():
    r = parse_html(
        '<body><div class="caption">x</div><div class="my facebook plugin">y</div>'
        '<div class="pre-facebook">kept</div><p>keep</p></body>'
    )
    cleaners.remove_targeted_nodes(r)
    t = text(r)
    assert "x" not in t and "y" not in t
    assert "kept" in t and "keep" in t


def test_c5_em_unwrap_unless_img():
    r = parse_html("<p><em>plain</em> <em><img src=x>img</em></p>")
    cleaners.clean_em_tags(r)
    ems = list(r.iter("em"))
    assert len(ems) == 1  # the one with the img survives
    assert "plain" in text(r)


def test_c5_drop_caps_and_para_spans():
    r = parse_html(
        '<p><span class="dropcap">D</span>rop and <span>inline</span></p>'
        "<div><span>outside-para stays</span></div>"
    )
    cleaners.remove_drop_caps(r)
    cleaners.clean_para_spans(r)
    p = r.find_first("p")
    assert p.text_content() == "Drop and inline"
    assert not list(p.iter("span"))
    assert r.find_first("div").find_first("span") is not None


def test_c6_pure_div_becomes_p():
    r = parse_html("<body><div>just text <b>inline</b></div></body>")
    cleaners.div_to_para(r)
    assert r.find_first("p") is not None
    assert r.find_first("p").text_content() == "just text inline"


def test_c6_mixed_div_wraps_runs():
    r = parse_html(
        "<body><div>lead text<p>real para</p>trailing <i>run</i></div></body>"
    )
    cleaners.div_to_para(r)
    div = r.find_first("div")
    tags = [c.tag for c in div.children]
    assert tags == ["p", "p", "p"]
    assert div.children[0].text_content() == "lead text"
    assert div.children[1].text_content() == "real para"
    assert div.children[2].text_content() == "trailing run"


def test_fused_remove_unwanted_equals_sequential():
    """The fused single-pass removal must produce the same tree as the
    sequential C1→C2→F3→C3→C4 passes on generator pages."""
    from crawtext_ray.extract.adblock import default_rules
    from crawtext_ray.extract.dom import parse_html, serialize
    from crawtext_ray.extract.encoding import decode_html
    from fixtures.gen_pages import build_page

    rules = default_rules()
    for row_id in (0, 13, 77, 256, 999):
        html, _ = decode_html(build_page(row_id)["html"])
        a = parse_html(html)
        cleaners.remove_unwanted(a, rules)

        b = parse_html(html)
        cleaners.remove_comments(b)
        cleaners.remove_scripts_styles(b)
        rules.hide_elements(b)
        cleaners.remove_naughty_nodes(b)
        cleaners.remove_targeted_nodes(b)

        assert serialize(a) == serialize(b), f"divergence on row {row_id}"
