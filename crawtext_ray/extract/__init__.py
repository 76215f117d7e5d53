"""Pure-Python deterministic extraction core (no Ray imports allowed).

Public surface:
- :func:`crawtext_ray.extract.article.extract_article` — the golden-pinned
  bytes-in → article-dict-out function (goose ``Goose().extract`` analog).
- :mod:`dom`, :mod:`cleaners`, :mod:`scoring`, :mod:`output`, :mod:`metas`
  — the operator stages (SURVEY.md §2.4–§2.6).
- :mod:`adblock`, :mod:`urlnorm`, :mod:`query`, :mod:`stopwords`,
  :mod:`encoding` — filtering + scalar helpers.
"""

from .article import extract_article  # noqa: F401
