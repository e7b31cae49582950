"""TextNode behavior (reference TextNodeTest.swift)."""

import re

from swiftsoup_spark import parse
from swiftsoup_spark.kernel.mutations import split_text, wrap


def sn(s):
    return re.sub(r"\n\s*", "", s)


def test_text_bean():
    doc = parse("<p>One <span>two &amp;</span> three &amp;</p>")
    p = doc.select("p")[0]
    span = doc.select("span")[0]
    assert span.text() == "two &"
    assert span.text_nodes()[0].arena.text[span.text_nodes()[0].id] == "two &"
    tn = p.child_nodes()[2]
    assert tn.arena.text[tn.id] == " three &"
    tn.arena.text[tn.id] = " POW!"
    assert sn(p.html()) == "One <span>two &amp;</span> POW!"


def test_split_text_parents():
    doc = parse("<div>Hello there</div>")
    div = doc.select("div")[0]
    tn = div.text_nodes()[0]
    tail = split_text(div.arena, tn.id, 6)
    assert div.arena.text[tn.id] == "Hello "
    assert div.arena.text[tail] == "there"
    div.arena.text[tail] = "there!"
    assert div.text() == "Hello there!"
    assert div.arena.parent[tail] == div.arena.parent[tn.id]


def test_split_and_embolden():
    doc = parse("<div>Hello there</div>")
    div = doc.select("div")[0]
    tn = div.text_nodes()[0]
    tail = split_text(div.arena, tn.id, 6)
    wrap(div.arena, tail, "<b></b>")
    assert sn(div.html()) == "Hello <b>there</b>"


def test_supplementary_character():
    ch = chr(135361)
    doc = parse(ch)
    t = doc.body().text_nodes()[0]
    assert doc.body().text() == ch
