"""X1–X4 gravity scoring (reference goose: goose/extractors.py)."""

from crawtext_ray.extract.dom import parse_html
from crawtext_ray.extract.scoring import (
    calculate_best_node,
    is_high_link_density,
    nodes_to_check,
)

RICH = (
    "this is a paragraph with plenty of the usual common words that we "
    "expect to see because they are part of the language and of the test"
)


def test_x1_candidates_in_doc_order():
    r = parse_html("<body><p>a</p><pre>b</pre><table><tr><td>c</td></tr></table></body>")
    tags = [n.tag for n in nodes_to_check(r)]
    assert tags == ["p", "pre", "td"]


def test_x2_link_density():
    no_links = parse_html("<p>four plain words here</p>").find_first("p")
    assert not is_high_link_density(no_links)
    farm = parse_html(
        '<div><a href=x>one</a> <a href=y>two</a> <a href=z>three</a></div>'
    ).find_first("div")
    assert is_high_link_density(farm)
    article = parse_html(
        f'<p>{RICH} with <a href=x>one link</a> only</p>'
    ).find_first("p")
    assert not is_high_link_density(article)
    link_only = parse_html('<div><a href=x><img src=i></a></div>').find_first("div")
    assert is_high_link_density(link_only)


def test_x3_x4_top_node_selection():
    html = (
        "<body>"
        f'<div id="article"><p>{RICH}</p><p>{RICH}</p><p>{RICH}</p></div>'
        f'<div id="other"><p>{RICH}</p></div>'
        "</body>"
    )
    r = parse_html(html)
    res = calculate_best_node(r, "en")
    assert res.top_node is not None
    assert res.top_node.get("id") == "article"
    assert res.top_node_score > 0
    assert len(res.kept_candidates) == 4


def test_x3_poor_paragraphs_not_kept():
    r = parse_html("<body><div><p>two words</p><p>market report</p></div></body>")
    res = calculate_best_node(r, "en")
    assert res.top_node is None


def test_x4_tie_break_earliest_wins():
    para = f"<p>{RICH}</p>"
    r = parse_html(f'<body><div id="a">{para}</div><div id="b">{para}</div></body>')
    res = calculate_best_node(r, "en")
    # equal scores: strict > keeps the first-touched parent
    assert res.top_node.get("id") == "a"


def test_x3_negative_scoring_bottom_quarter():
    paras = "".join(f"<p>{RICH}</p>" for _ in range(20))
    r = parse_html(f'<body><div id="big">{paras}</div></body>')
    res = calculate_best_node(r, "en")
    assert res.top_node is not None
    # all 20 kept; the bottom 25% got negative boosts but the node survives
    assert len(res.kept_candidates) == 20
