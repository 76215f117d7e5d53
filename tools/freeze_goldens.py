"""Golden extraction corpus generator (FIXTURES.md §C; SURVEY.md §5.2).

Writes ``tests/golden/<case>/{input.html,meta.json,expected.txt}`` where
``expected.txt`` holds the exact ``extracted_text`` bytes the frozen
SURVEY §2.7 contract produces. Goldens are generated ONCE by the reviewed
implementation, committed, and never regenerated silently: any later diff
is a regression (``python -m tools.freeze_goldens --check`` / pytest).

Hand-authored cases cover the operator branches (C1–C6, X2/X3/X5/X6/X9,
title splitters, encodings, adblock classes); generator-sampled cases
freeze 40 deterministic synthetic pages end-to-end.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

RICH_EN = (
    "this is a paragraph with plenty of the usual common words that we "
    "expect to see because they are part of the language and of the test"
)
RICH_FR = (
    "ce paragraphe contient un grand nombre de mots que nous avons dans la "
    "langue et que nous voyons dans les textes avec les articles et les accents"
)

CASES: dict[str, dict] = {}


def case(name: str, html: bytes, url: str = "http://golden.example/page",
         lang: str | None = "en", note: str = ""):
    CASES[name] = {"html": html, "url": url, "lang": lang, "note": note}


def p(text: str) -> str:
    return f"<p>{text}</p>"


ARTICLE3 = f'<div id="art">{p(RICH_EN)}{p(RICH_EN)}{p(RICH_EN)}</div>'

case("c1_comment_removed",
     f"<body><!-- boilerplate comment with the and of -->{ARTICLE3}</body>".encode(),
     note="C1: comment text must not leak into output")
case("c2_script_style",
     ("<body><script>var the_and_of = 1;</script><style>p{color:red}</style>"
      f"{ARTICLE3}</body>").encode(),
     note="C2: script/style content dropped")
case("c3_naughty_classes",
     (f'<body><div class="sidebar">{RICH_EN}</div><div id="footer">{RICH_EN}</div>'
      f"{ARTICLE3}</body>").encode(),
     note="C3: stopword-rich boilerplate removed by class/id")
case("c4_targeted",
     (f'<body><div class="caption">{RICH_EN}</div>'
      f'<div class="x facebook y">{RICH_EN}</div>{ARTICLE3}</body>').encode(),
     note="C4: targeted regex removals")
case("c5_inline_cleanup",
     (f'<body><div id="art"><p><em>Emphasis</em> start {RICH_EN}</p>'
      f'<p><span class="dropcap">D</span>rop {RICH_EN}</p>'
      f'<p><span>span inside para</span> {RICH_EN}</p></div></body>').encode(),
     note="C5: em/drop-cap/span unwrapping")
case("c6_div_to_para",
     (f'<body><div id="art"><div>{RICH_EN}</div><div>{RICH_EN}</div>'
      f'<div>lead text<p>{RICH_EN}</p>tail run</div></div></body>').encode(),
     note="C6: pure divs become paragraphs; mixed divs wrap runs")
case("x2_linkfarm_rejected",
     ('<body><div id="farm">' + "".join(f'<a href="/l/{i}">item {i}</a> ' for i in range(15))
      + f"</div>{ARTICLE3}</body>").encode(),
     note="X2: high link density container never wins")
case("x3_boost_path",
     (f'<body><div id="art"><p>short opener with a few of the words</p>'
      f"{p(RICH_EN)}{p(RICH_EN)}</p></div></body>").encode(),
     note="X3: boostable early paragraph followed by rich siblings")
case("x3_negative_bottom",
     ("<body><div id='art'>" + "".join(p(RICH_EN) for _ in range(20)) + "</div></body>").encode(),
     note="X3: n>15 bottom quarter negative boosts")
case("x4_tie_first_wins",
     (f'<body><div id="a">{p(RICH_EN)}</div><div id="b">{p(RICH_EN)}</div></body>').encode(),
     note="X4: strict > argmax, earliest parent wins")
case("x5_sibling_direct_join",
     (f'<body><div id="content"><p>direct sibling {RICH_EN}</p>'
      f'<div id="art">{p(RICH_EN)}{p(RICH_EN)}{p(RICH_EN)}</div></div></body>').encode(),
     note="X5: direct <p> sibling joins unconditionally")
case("x5_sibling_threshold",
     (f'<body><div id="content"><div class="intro"><p>{RICH_EN}</p>'
      f'<p>tiny weak bit</p></div>'
      f'<div id="art">{p(RICH_EN)}{p(RICH_EN)}{p(RICH_EN)}</div></div></body>').encode(),
     note="X5: wrapped sibling paragraphs pass/fail max(10,0.3*score)")
case("x6_child_prune",
     (f'<body><div id="art">{p(RICH_EN)}{p(RICH_EN)}{p(RICH_EN)}'
      f'<table><tr><td>tiny</td></tr></table>'
      f'<div>' + "".join(f'<a href="/x{i}">link {i}</a>' for i in range(8)) + "</div>"
      f"</div></body>").encode(),
     note="X6: structural/link-dense children pruned from top node")
case("x8_inline_flatten",
     (f'<body><div id="art"><p><b>Bold</b> <i>ital</i> <strong>strong</strong> '
      f'{RICH_EN} <a href="/in">anchor words</a> tail<br>after break</p>'
      f"{p(RICH_EN)}{p(RICH_EN)}</div></body>").encode(),
     note="X8: a->text; b/strong/i/sup/em unwrap; br -> space")
case("x9_fewwords",
     (f'<body><div id="art">{p(RICH_EN)}<p>photo credit agency</p>'
      f"{p(RICH_EN)}{p(RICH_EN)}</div></body>").encode(),
     note="X9: <3 stopword paragraphs dropped")
case("title_pipe_longest",
     (f"<head><title>Site Name | The Much Longer Headline Of The Story</title></head>"
      f"<body>{ARTICLE3}</body>").encode(),
     note="M5: pipe splitter, longest fragment")
case("title_dash",
     (f"<head><title>The Headline Words - example.com</title></head>"
      f"<body>{ARTICLE3}</body>").encode(),
     note="M5: dash splitter")
case("enc_latin1_meta",
     (f'<head><meta charset="ISO-8859-1"><title>Caf\xe9 | Tr\xe8s long titre du '
      f'journal</title></head><body><div id="art"><p>{RICH_FR} caf\xe9 d\xe9j\xe0'
      f"</p><p>{RICH_FR}</p><p>{RICH_FR}</p></div></body>").encode("latin-1"),
     url="http://golden.example/fr", lang="fr",
     note="M3: meta charset latin-1 with accents")
case("enc_utf8_bom",
     (b"\xef\xbb\xbf" + f"<body><div id='art'><p>{RICH_EN} café</p>"
      f"{p(RICH_EN)}{p(RICH_EN)}</div></body>".encode("utf-8")),
     note="M3: BOM utf-8")
case("enc_broken_bytes",
     (f"<body>{ARTICLE3}".encode() + b"\xff\xfe broken trailing \xf3"),
     note="M3: undecodable tail never crashes, errors=replace")
case("adblock_element_hide",
     (f'<body><div class="ad-banner">great deal of the day for all of you</div>'
      f'<div id="ad-slot">{RICH_EN}</div>{ARTICLE3}</body>').encode(),
     note="F3: element-hiding removes stopword-rich ad containers")
case("adblock_blocked_url",
     f"<body>{ARTICLE3}</body>".encode(),
     url="http://ads.tracker.example/page",
     note="F2: page url matches ||ads. -> status=blocked, empty text")
case("empty_nav_only",
     ('<body><div class="menu"><a href="/a">A</a> <a href="/b">B</a></div>'
      "<div>thin content</div></body>").encode(),
     note="no scored node -> status=empty")
case("lang_fr_stopwords",
     (f'<html lang="fr"><body><div id="art"><p>{RICH_FR}</p><p>{RICH_FR}</p>'
      f"<p>{RICH_FR}</p></div></body></html>").encode("utf-8"),
     url="http://golden.example/fr2", lang=None,
     note="M8: meta lang drives stopword table")
case("malformed_unclosed",
     (f"<body><div id='art'><p>{RICH_EN}<p>{RICH_EN}"
      f"<p>{RICH_EN}<div class='footer'>junk").encode(),
     note="lenient parse: implicit closes, truncated input")


def _generator_cases(n: int = 100) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from fixtures.gen_pages import build_page

    for row_id in range(0, n * 25, 25):  # spread across the id space
        page = build_page(row_id)
        case(
            f"gen_{row_id:05d}",
            page["html"],
            url=page["url"],
            lang=page["lang"],
            note=f"generator page row_id={row_id}, expected={page['expected_status']}",
        )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="verify committed goldens instead of writing")
    ap.add_argument("--out", default="tests/golden")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from crawtext_ray.extract.adblock import default_rules
    from crawtext_ray.extract.article import extract_article

    _generator_cases()
    rules = default_rules()
    diffs = 0
    for name, spec in CASES.items():
        art = extract_article(spec["html"], spec["url"], spec["lang"], rules)
        expected = art["extracted_text"].encode("utf-8")
        d = os.path.join(args.out, name)
        if args.check:
            with open(os.path.join(d, "expected.txt"), "rb") as f:
                want = f.read()
            if want != expected:
                print(f"DIFF {name}")
                diffs += 1
            continue
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "input.html"), "wb") as f:
            f.write(spec["html"])
        with open(os.path.join(d, "meta.json"), "w") as f:
            json.dump(
                {
                    "url": spec["url"],
                    "lang": spec["lang"],
                    "note": spec["note"],
                    "status": art["status"],
                    "title": art["title"],
                },
                f, indent=1, sort_keys=True,
            )
        with open(os.path.join(d, "expected.txt"), "wb") as f:
            f.write(expected)
    if args.check:
        print("golden check:", "FAIL" if diffs else "OK", f"({len(CASES)} cases)")
        return 1 if diffs else 0
    print(f"wrote {len(CASES)} golden cases to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
