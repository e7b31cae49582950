"""QueryParser structure tests (reference QueryParserTest.swift)."""

from swiftsoup_spark.select.queryparser import parse_query, QueryError
from swiftsoup_spark.select import evaluators as E
import pytest


def test_or_gets_correct_precedence():
    # "a b, c d, e f" == (a AND b) OR (c AND d) OR (e AND f)
    ev = parse_query("a b, c d, e f")
    assert isinstance(ev, E.Or)
    assert len(ev.evals) == 3
    for inner in ev.evals:
        assert isinstance(inner, E.And)
        assert len(inner.evals) == 2
        assert isinstance(inner.evals[0], E.Tag)
        assert isinstance(inner.evals[1], E.Ancestor)


def test_parses_multi_correctly():
    ev = parse_query(".foo > ol, ol > li + li")
    assert isinstance(ev, E.Or)
    left, right = ev.evals
    assert isinstance(left, E.And)
    assert isinstance(left.evals[0], E.Tag)          # ol
    assert isinstance(left.evals[1], E.ImmediateParent)
    assert isinstance(right, E.And)
    assert isinstance(right.evals[0], E.Tag)          # li
    assert isinstance(right.evals[1], E.ImmediatePreviousSibling)
    assert isinstance(right.evals[1].inner, E.And)    # (ol > li)


def test_bad_queries_raise():
    for q in ("", "p:unknownpseudo", "p:has(", "[", "p:nth-child(x)"):
        with pytest.raises(QueryError):
            parse_query(q)


def test_cache_returns_same_object():
    assert parse_query("div.cache-probe") is parse_query("div.cache-probe")
