"""Lenient HTML DOM on stdlib ``html.parser`` (SURVEY.md §7.5, operator M4).

The reference (goose: goose/parsers.py::Parser) wraps lxml.html; lxml is
absent from this environment, so we build a small deterministic tree over
``html.parser.HTMLParser`` events: void-element table, HTML5-lite implicit
close rules, attribute dicts (first value wins), parent/children links,
document-order ids (the determinism anchor for top-node tie-breaks,
SURVEY.md §2.5 X4), lxml-style ``text``/``tail`` model, itertext, and
tag/class/id matching for the cleaner and element-hiding filters.

Determinism contract (SURVEY.md §2.7 item 7): document order == parser
event order; every node carries a monotonically increasing ``order`` id
assigned at creation.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator

COMMENT = "#comment"

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# HTML5-lite implicit-close table: starting <key> closes an open <value>.
_P_CLOSERS = frozenset(
    "address article aside blockquote details div dl fieldset figcaption figure "
    "footer form h1 h2 h3 h4 h5 h6 header hgroup hr main menu nav ol p pre "
    "section table ul".split()
)
_IMPLICIT_CLOSE = {
    "li": frozenset(["li"]),
    "dt": frozenset(["dt", "dd"]),
    "dd": frozenset(["dt", "dd"]),
    "tr": frozenset(["tr", "td", "th"]),
    "td": frozenset(["td", "th"]),
    "th": frozenset(["td", "th"]),
    "option": frozenset(["option"]),
    "optgroup": frozenset(["option", "optgroup"]),
    "thead": frozenset(["thead", "tbody", "tfoot"]),
    "tbody": frozenset(["thead", "tbody", "tfoot"]),
    "tfoot": frozenset(["thead", "tbody"]),
}


class Node:
    """One element (or comment) in the tree.

    lxml-style text model: ``text`` is the character data before the first
    child; each child's ``tail`` is the character data between that child's
    end tag and the next sibling (or the parent's end tag).
    """

    __slots__ = (
        "tag", "attrs", "parent", "children", "text", "tail", "order",
        "gravity_score", "gravity_nodes",
    )

    def __init__(self, tag: str, attrs: dict[str, str] | None = None, order: int = -1):
        self.tag = tag
        self.attrs = attrs if attrs is not None else {}
        self.parent: Node | None = None
        self.children: list[Node] = []
        self.text: str = ""
        self.tail: str = ""
        self.order = order
        self.gravity_score: float = 0.0
        self.gravity_nodes: int = 0

    # -- structure ---------------------------------------------------------
    def append(self, child: "Node") -> None:
        child.parent = self
        self.children.append(child)

    def insert(self, index: int, child: "Node") -> None:
        child.parent = self
        self.children.insert(index, child)

    def index(self, child: "Node") -> int:
        return self.children.index(child)

    def remove(self, child: "Node", keep_tail: bool = True) -> None:
        """Remove ``child`` subtree. Its tail text is preserved by default
        (attached to the previous sibling's tail, else to our ``text``) —
        the text-preserving removal semantics frozen for goldens."""
        i = self.children.index(child)
        if keep_tail and child.tail:
            if i > 0:
                self.children[i - 1].tail += child.tail
            else:
                self.text += child.tail
        del self.children[i]
        child.parent = None

    def drop_tree(self) -> None:
        if self.parent is not None:
            self.parent.remove(self)

    def unwrap(self) -> None:
        """lxml ``drop_tag``: remove this element but splice its text and
        children into the parent at the same position."""
        parent = self.parent
        if parent is None:
            return
        i = parent.children.index(self)
        prev = parent.children[i - 1] if i > 0 else None

        def _append_text(s: str) -> None:
            nonlocal prev
            if not s:
                return
            if prev is not None:
                prev.tail += s
            else:
                parent.text += s

        del parent.children[i]
        _append_text(self.text)
        for c in self.children:
            c.parent = parent
            parent.children.insert(i, c)
            i += 1
            prev = c
        _append_text(self.tail)
        self.parent = None

    # -- traversal ---------------------------------------------------------
    def iter(self, tag: str | None = None) -> Iterator["Node"]:
        """Depth-first, document order, self included (iterative — the
        recursive-generator form profiled ~2x slower on deep trees)."""
        stack = [self]
        while stack:
            n = stack.pop()
            if tag is None or n.tag == tag:
                yield n
            stack.extend(reversed(n.children))

    def find_all(self, tags: frozenset[str] | set[str]) -> list["Node"]:
        return [n for n in self.iter() if n.tag in tags]

    def find_first(self, tag: str) -> "Node | None":
        for n in self.iter(tag):
            return n
        return None

    def itertext(self) -> Iterator[str]:
        if self.tag == COMMENT:
            return
        if self.text:
            yield self.text
        for c in self.children:
            yield from c.itertext()
            if c.tail:
                yield c.tail

    def text_content(self) -> str:
        return "".join(self.itertext())

    # -- attribute helpers -------------------------------------------------
    def get(self, name: str, default: str = "") -> str:
        return self.attrs.get(name, default)

    def classes(self) -> list[str]:
        return self.get("class").split()

    def id_class_name(self) -> str:
        """Concatenated id/class/name attribute text, the string the
        boilerplate regexes (C3/C4) match against."""
        parts = [self.get("id"), self.get("class"), self.get("name")]
        return " ".join(p for p in parts if p)

    def previous_siblings(self) -> list["Node"]:
        """Siblings before this node, nearest first (goose walk_siblings)."""
        if self.parent is None:
            return []
        sibs = self.parent.children
        i = sibs.index(self)
        return list(reversed(sibs[:i]))

    def following_siblings(self) -> list["Node"]:
        if self.parent is None:
            return []
        sibs = self.parent.children
        i = sibs.index(self)
        return sibs[i + 1:]

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"<Node {self.tag} order={self.order} attrs={self.attrs}>"


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#document", order=0)
        self.stack: list[Node] = [self.root]
        self._order = 1

    # helpers
    def _new_node(self, tag: str, attrs: list[tuple[str, str | None]]) -> Node:
        # HTMLParser delivers tag and attribute NAMES already lowercased
        d: dict[str, str] = {}
        for k, v in attrs:
            if k not in d:  # first value wins (determinism contract)
                d[k] = v if v is not None else ""
        n = Node(tag, d, self._order)
        self._order += 1
        return n

    def updatepos(self, i: int, j: int) -> int:
        # line/col tracking feeds only error messages we never surface;
        # HTMLParser.goahead only needs the returned scan position
        return j

    def _add_text(self, data: str) -> None:
        cur = self.stack[-1]
        if cur.children:
            cur.children[-1].tail += data
        else:
            cur.text += data

    # parser events
    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        # implicit closes
        closers = _IMPLICIT_CLOSE.get(tag)
        top = self.stack[-1].tag
        if tag in _P_CLOSERS and top == "p":
            self.stack.pop()
        elif closers and top in closers:
            self.stack.pop()
        node = self._new_node(tag, attrs)
        self.stack[-1].append(node)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        node = self._new_node(tag, attrs)
        self.stack[-1].append(node)

    def handle_endtag(self, tag: str) -> None:
        if tag in VOID_ELEMENTS:
            return
        # pop to the matching open tag if present; ignore stray end tags
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data: str) -> None:
        if data:
            self._add_text(data)

    def handle_comment(self, data: str) -> None:
        n = Node(COMMENT, order=self._order)
        self._order += 1
        n.text = data
        self.stack[-1].append(n)

    def handle_decl(self, decl: str) -> None:  # <!DOCTYPE ...>
        pass

    def unknown_decl(self, data: str) -> None:
        pass


def parse_html(html: str) -> Node:
    """Parse (possibly broken) HTML into a Node tree; never raises on
    malformed markup — html.parser is lenient by construction."""
    b = _TreeBuilder()
    b.feed(html)
    b.close()
    return b.root


def serialize(node: Node) -> str:
    """Debug/test serializer (not part of the byte-identity contract)."""
    out: list[str] = []

    def walk(n: Node) -> None:
        if n.tag == COMMENT:
            out.append(f"<!--{n.text}-->")
        elif n.tag == "#document":
            if n.text:
                out.append(n.text)
            for c in n.children:
                walk(c)
                if c.tail:
                    out.append(c.tail)
            return
        else:
            attrs = "".join(f' {k}="{v}"' for k, v in n.attrs.items())
            if n.tag in VOID_ELEMENTS:
                out.append(f"<{n.tag}{attrs}/>")
            else:
                out.append(f"<{n.tag}{attrs}>")
        if n.tag not in VOID_ELEMENTS and n.tag != COMMENT:
            if n.text:
                out.append(n.text)
            for c in n.children:
                walk(c)
                if c.tail:
                    out.append(c.tail)
            out.append(f"</{n.tag}>")

    walk(node)
    return "".join(out)
