"""Byte-identity golden corpus (FIXTURES.md §C; BASELINE.json:6
"per-url extracted text byte-identical ... validated by pytest
golden-file comparisons").

Each case compares ``extract_article(...)["extracted_text"]`` bytes
against the committed ``expected.txt`` — exact, no normalization.
"""

import json
import os

import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

CASES = sorted(
    d for d in os.listdir(GOLDEN_DIR)
    if os.path.isdir(os.path.join(GOLDEN_DIR, d))
) if os.path.isdir(GOLDEN_DIR) else []


@pytest.fixture(scope="module")
def rules():
    from crawtext_ray.extract.adblock import default_rules

    return default_rules()


@pytest.mark.parametrize("case", CASES)
def test_golden_bytes(case, rules):
    from crawtext_ray.extract.article import extract_article

    d = os.path.join(GOLDEN_DIR, case)
    with open(os.path.join(d, "input.html"), "rb") as f:
        html = f.read()
    with open(os.path.join(d, "meta.json")) as f:
        meta = json.load(f)
    with open(os.path.join(d, "expected.txt"), "rb") as f:
        expected = f.read()

    art = extract_article(html, meta["url"], meta["lang"], rules)
    got = art["extracted_text"].encode("utf-8")
    assert got == expected, f"golden byte mismatch in {case}"
    assert art["status"] == meta["status"]
    assert art["title"] == meta["title"]


def test_corpus_exists_and_covers_branches():
    assert len(CASES) >= 100
    for needed in (
        "c1_comment_removed", "c6_div_to_para", "x2_linkfarm_rejected",
        "x5_sibling_threshold", "x9_fewwords", "enc_latin1_meta",
        "adblock_blocked_url", "malformed_unclosed",
    ):
        assert needed in CASES
