"""M7 boolean relevance query (reference crawtext: query.py)."""

import pytest

from crawtext_ray.extract.query import Query, QueryError


def test_single_word():
    q = Query("climate")
    assert q.match("The climate is changing")
    assert not q.match("The weather is nice")
    assert not q.match("climatology")  # token, not substring


def test_and_or_not():
    q = Query("climate AND energy")
    assert q.match("climate and energy report")
    assert not q.match("climate report")
    q = Query("climate OR energy")
    assert q.match("energy report")
    q = Query("climate AND NOT coal")
    assert q.match("climate report")
    assert not q.match("climate and coal")


def test_juxtaposition_is_and():
    q = Query("climate energy")
    assert q.match("energy and climate")
    assert not q.match("only climate")


def test_parentheses():
    q = Query("(a OR b) AND NOT (c OR d)")
    assert q.match("a x")
    assert not q.match("a c")
    assert q.match("b y")


def test_phrase_matching():
    q = Query('"climate change" AND report')
    assert q.match("the climate change report")
    assert not q.match("climate report of change")


def test_case_insensitive():
    # both terms and operators match case-insensitively
    assert Query("CLIMATE").match("climate x")
    assert Query("climate and energy").match("Climate ENERGY text")


def test_matched_terms():
    ok, terms = Query("a OR b OR c").match_with_terms("b and c here")
    assert ok
    assert set(terms) == {"b", "c"}


def test_errors():
    with pytest.raises(QueryError):
        Query("(a OR b")
    with pytest.raises(QueryError):
        Query("a AND")
    with pytest.raises(QueryError):
        Query("")
