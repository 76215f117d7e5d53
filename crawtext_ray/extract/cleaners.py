"""Document cleaner — boilerplate removal before scoring (SURVEY.md §2.4
C1–C6; reference goose: goose/cleaners.py::DocumentCleaner).

All operations mutate the parsed tree in place, in the fixed order
C1 → C2 → (F3 element-hide, applied by the caller) → C3 → C4 → C5 → C6.
Every regex list lives in version-controlled resources (SURVEY.md §2.7
item 2) and is compiled once per process.
"""

from __future__ import annotations

import re
from functools import lru_cache
from importlib import resources as _ilr

from .dom import COMMENT, Node

BLOCK_TAGS = frozenset(
    ["a", "blockquote", "dl", "div", "img", "ol", "p", "pre", "table", "ul"]
)


@lru_cache(maxsize=1)
def _naughty_re() -> "re.Pattern[str]":
    """C3 boilerplate id/class/name alternation, order-significant, from
    resources/boilerplate_patterns.txt (goose: goose/cleaners.py REGEX
    analog)."""
    ref = _ilr.files("crawtext_ray") / "resources" / "boilerplate_patterns.txt"
    pats = [ln.strip() for ln in ref.read_text(encoding="utf-8").splitlines() if ln.strip()]
    return re.compile("|".join(re.escape(p) for p in pats), re.IGNORECASE)


# C4 targeted regexes (goose: clean_body_classes / remove_nodes_regex)
_TARGETED_RES = [
    re.compile(r"^caption$"),
    re.compile(r" google "),
    re.compile(r"^[^entry-]more.*$"),
    re.compile(r"[^-]facebook"),
    re.compile(r"facebook-broadcasting"),
    re.compile(r"[^-]twitter"),
]

_DROP_CAP_RE = re.compile(r"drop_?cap(ital)?", re.IGNORECASE)


def remove_comments(root: Node) -> None:
    """C1 (goose: remove_comments)."""
    for n in root.walk():
        if n.tag == COMMENT and n.parent is not None:
            n.parent.remove(n)


def remove_scripts_styles(root: Node) -> None:
    """C2 (goose: remove_scripts_styles): drop script/style/noscript with
    their text content."""
    for n in root.walk():
        if n.tag in ("script", "style", "noscript") and n.parent is not None:
            n.parent.remove(n)


def remove_naughty_nodes(root: Node) -> None:
    """C3 (goose: clean_bad_tags): remove elements whose id/class/name
    matches the boilerplate alternation. html/body are never removed."""
    rx = _naughty_re()
    for n in root.walk():
        if n.parent is None or n.tag in ("html", "body", "#document"):
            continue
        ident = n.id_class_name()
        if ident and rx.search(ident) and n.parent is not None:
            n.parent.remove(n)


def remove_targeted_nodes(root: Node) -> None:
    """C4: targeted regex removals on class/id."""
    for n in root.walk():
        if n.parent is None or n.tag in ("html", "body", "#document"):
            continue
        ident = n.id_class_name()
        if ident and any(rx.search(ident) for rx in _TARGETED_RES):
            if n.parent is not None:
                n.parent.remove(n)


def clean_em_tags(root: Node) -> None:
    """C5a (goose: clean_em_tags): unwrap <em> without <img> descendants."""
    for n in root.walk("em"):
        if n.parent is not None and n.find_first("img") is None:
            n.unwrap()


def remove_drop_caps(root: Node) -> None:
    """C5b (goose: remove_drop_caps): unwrap styled drop-cap spans."""
    for n in root.walk("span"):
        if n.parent is None:
            continue
        if _DROP_CAP_RE.search(n.get("class")) or _DROP_CAP_RE.search(n.get("id")):
            n.unwrap()


def clean_para_spans(root: Node) -> None:
    """C5c (goose: clean_para_spans): unwrap spans inside paragraphs."""
    for p in root.walk("p"):
        for n in p.walk("span"):
            if n.parent is not None:
                n.unwrap()


def _has_block_descendant(div: Node) -> bool:
    for n in div.iter():
        if n is div:
            continue
        if n.tag in BLOCK_TAGS:
            return True
    return False


def div_to_para(root: Node) -> None:
    """C6 (goose: div_to_para + get_replacement_nodes): a div with no
    block-level descendants becomes a <p>; inside mixed divs, contiguous
    runs of text/inline children are wrapped in new <p> elements while
    block children stay in place."""
    for div in root.walk("div"):
        if div.parent is None:
            continue
        if not _has_block_descendant(div):
            div.tag = "p"
            continue
        new_children: list[Node] = []
        cur_p: Node | None = None

        def emit_text(s: str) -> None:
            nonlocal cur_p
            if cur_p is None:
                if not s.strip():
                    return
                cur_p = Node("p", order=div.order)
            if cur_p.children:
                cur_p.children[-1].tail += s
            else:
                cur_p.text += s

        def flush() -> None:
            nonlocal cur_p
            if cur_p is not None and (cur_p.text.strip() or cur_p.children):
                new_children.append(cur_p)
            cur_p = None

        emit_text(div.text)
        div.text = ""
        for child in div.children:
            tail = child.tail
            child.tail = ""
            if child.tag in BLOCK_TAGS or child.tag == COMMENT:
                flush()
                new_children.append(child)
            else:
                if cur_p is None:
                    cur_p = Node("p", order=child.order)
                cur_p.append(child)
            emit_text(tail)
        flush()
        div.children = []
        for c in new_children:
            div.append(c)


def remove_unwanted(root: Node, rules=None) -> None:
    """Fused single-pass removal of C1 (comments), C2 (script/style),
    F3 (element-hiding rules) and C3/C4 (boilerplate id/class) — the
    removal criteria are disjoint and order-independent, so one walk
    produces the same tree as the sequential passes (verified by the
    golden corpus); profiling showed the five separate full-tree walks
    were ~15% of extraction."""
    rx = _naughty_re()
    hide = rules.hide_rules if rules is not None else ()
    hide_exc = rules.hide_exceptions if rules is not None else ()
    for n in root.walk():
        if n.parent is None:
            continue
        tag = n.tag
        if tag == COMMENT or tag in ("script", "style", "noscript"):
            n.parent.remove(n)
            continue
        if tag in ("html", "body", "#document"):
            continue
        if hide and not tag.startswith("#"):
            cands = rules.hide_candidates(n)
            if cands and any(h.matches(n) for h in cands) and not any(
                h.matches(n) for h in hide_exc
            ):
                if n.parent is not None:
                    n.parent.remove(n)
                continue
        ident = n.id_class_name()
        if ident and (rx.search(ident) or any(r.search(ident) for r in _TARGETED_RES)):
            if n.parent is not None:
                n.parent.remove(n)


def clean_document(root: Node) -> None:
    """Full C1–C6 ordering (F3 element hiding is applied by the caller
    between C2 and C3 when adblock rules are configured)."""
    remove_comments(root)
    remove_scripts_styles(root)
    remove_naughty_nodes(root)
    remove_targeted_nodes(root)
    clean_em_tags(root)
    remove_drop_caps(root)
    clean_para_spans(root)
    div_to_para(root)
