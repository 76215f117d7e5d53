"""Boolean keyword relevance query (SURVEY.md §2.2 M7; reference
crawtext: query.py::Query).

Grammar (case-insensitive):

    expr   := term ("OR" term)*
    term   := factor (("AND")? factor)*      # juxtaposition = AND
    factor := "NOT" factor | "(" expr ")" | word | "quoted phrase"

Matching semantics (frozen so the DuckDB oracle can mirror it exactly):
- tokenization of the document: lowercase, tokens = runs of [a-z0-9]
  (ASCII; oracle: regexp_split_to_array(lower(text), '[^a-z0-9]+'))
- a bare word matches iff it is a member of the token set
- a quoted phrase matches iff its lowercased text is a substring of the
  lowercased document
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_WORD_RE = re.compile(r"[a-z0-9]+")


def doc_tokens(text: str) -> frozenset[str]:
    return frozenset(_WORD_RE.findall(text.lower()))


# ---- AST ----------------------------------------------------------------
@dataclass
class _Word:
    w: str

    def eval(self, tokens: frozenset[str], lowered: str, hits: list[str]) -> bool:
        ok = self.w in tokens
        if ok:
            hits.append(self.w)
        return ok


@dataclass
class _Phrase:
    p: str

    def eval(self, tokens: frozenset[str], lowered: str, hits: list[str]) -> bool:
        ok = self.p in lowered
        if ok:
            hits.append(self.p)
        return ok


@dataclass
class _Not:
    a: object

    def eval(self, tokens, lowered, hits) -> bool:
        sub: list[str] = []
        return not self.a.eval(tokens, lowered, sub)


@dataclass
class _And:
    parts: list

    def eval(self, tokens, lowered, hits) -> bool:
        return all(p.eval(tokens, lowered, hits) for p in self.parts)


@dataclass
class _Or:
    parts: list

    def eval(self, tokens, lowered, hits) -> bool:
        ok = False
        for p in self.parts:
            if p.eval(tokens, lowered, hits):
                ok = True  # no short-circuit: collect all matched terms
        return ok


_TOKENIZER = re.compile(r'"([^"]*)"|\(|\)|[^\s()]+')


class QueryError(ValueError):
    pass


class Query:
    """Compile once on the driver; evaluate per row inside map_batches."""

    def __init__(self, expression: str):
        self.expression = expression
        toks: list[str] = []
        for m in _TOKENIZER.finditer(expression):
            if m.group(1) is not None:
                toks.append('"' + m.group(1) + '"')
            else:
                toks.append(m.group(0))
        self._toks = toks
        self._pos = 0
        self.ast = self._parse_expr()
        if self._pos != len(self._toks):
            raise QueryError(f"trailing tokens in query: {self._toks[self._pos:]}")

    # recursive-descent parser
    def _peek(self) -> str | None:
        return self._toks[self._pos] if self._pos < len(self._toks) else None

    def _next(self) -> str:
        t = self._toks[self._pos]
        self._pos += 1
        return t

    def _parse_expr(self):
        parts = [self._parse_term()]
        while self._peek() is not None and self._peek().upper() == "OR":
            self._next()
            parts.append(self._parse_term())
        return parts[0] if len(parts) == 1 else _Or(parts)

    def _parse_term(self):
        parts = [self._parse_factor()]
        while True:
            t = self._peek()
            if t is None or t == ")" or t.upper() == "OR":
                break
            if t.upper() == "AND":
                self._next()
                t = self._peek()
                if t is None:
                    raise QueryError("dangling AND")
            parts.append(self._parse_factor())
        return parts[0] if len(parts) == 1 else _And(parts)

    def _parse_factor(self):
        t = self._peek()
        if t is None:
            raise QueryError("unexpected end of query")
        if t.upper() == "NOT":
            self._next()
            return _Not(self._parse_factor())
        if t == "(":
            self._next()
            node = self._parse_expr()
            if self._peek() != ")":
                raise QueryError("missing )")
            self._next()
            return node
        if t == ")":
            raise QueryError("unexpected )")
        self._next()
        if t.startswith('"') and t.endswith('"'):
            return _Phrase(t[1:-1].lower())
        return _Word(t.lower())

    def match(self, text: str) -> bool:
        lowered = text.lower()
        return self.ast.eval(doc_tokens(text), lowered, [])

    def match_with_terms(self, text: str) -> tuple[bool, list[str]]:
        lowered = text.lower()
        hits: list[str] = []
        ok = self.ast.eval(doc_tokens(text), lowered, hits)
        # de-dup, order-preserving
        seen: set[str] = set()
        out = [h for h in hits if not (h in seen or seen.add(h))]
        return ok, out if ok else []
