"""Selector conformance, ported from the reference SelectorTest/CssTest
(/root/reference/Tests/SwiftSoupTests/SelectorTest.swift)."""

from swiftsoup_spark import parse


def ids(els):
    return [e.attr("id") for e in els]


def test_by_tag():
    els = parse("<div id=1><div id=2><p>Hello</p></div></div><DIV id=3>").select("DIV".lower())
    assert ids(els) == ["1", "2", "3"]
    assert parse("<div id=1></div>").select("span") == []


def test_by_id():
    els = parse("<div><p id=foo>Hello</p><p id=foo>Foo two!</p></div>").select("#foo")
    assert [e.text() for e in els] == ["Hello", "Foo two!"]
    assert parse("<div id=1></div>").select("#foo") == []


def test_by_class():
    els = parse("<p id=0 class='ONE two'><p id=1 class='one'><p id=2 class='two'>").select("p.One".lower())
    assert ids(els) == ["0", "1"]
    assert parse("<div class='one'></div>").select(".foo") == []
    assert len(parse("<div class='One-Two'></div>").select(".one-two")) == 1


def test_by_attribute():
    h = ("<div Title=Foo /><div Title=Bar /><div Style=Qux /><div title=Bam />"
         "<div title=SLAM /><div data-name='with spaces'/>")
    doc = parse(h)
    assert len(doc.select("[title]")) == 4
    assert len(doc.select("[TITLE=foo]".lower())) == 1
    assert len(doc.select('[title="foo"]')) == 1
    assert len(doc.select('[title="Foo"]')) == 1
    dn = doc.select('[data-name="with spaces"]')
    assert len(dn) == 1
    assert dn[0].attr("data-name") == "with spaces"

    not_ = doc.select("div[title!=bar]")
    assert len(not_) == 5
    assert not_[0].attr("title") == "Foo"

    starts = doc.select("[title^=ba]")
    assert [e.attr("title") for e in starts] == ["Bar", "Bam"]
    ends = doc.select("[title$=am]")
    assert [e.attr("title") for e in ends] == ["Bam", "SLAM"]
    contains = doc.select("[title*=a]")
    assert len(contains) == 3


def test_attribute_prefix():
    doc = parse("<p data-one=1 data-two=2 title=three><p data-two=4>")
    assert len(doc.select("[^data-]")) == 2
    assert len(doc.select("[^unknown]")) == 0


def test_attribute_regex():
    doc = parse('<p><img src=foo.png id=1><img src=bar.jpg id=2><img src=qux.JPEG id=3>'
                '<img src=old.gif><img></p>')
    imgs = doc.select("img[src~=(?i)\\.(png|jpe?g)]")
    assert ids(imgs) == ["1", "2", "3"]


def test_descendant():
    html = ("<div id=one><p class=alpha><span class=item>One</span></p></div>"
            "<p class=alpha><span class=item>Two</span></p>")
    doc = parse(html)
    assert [e.text() for e in doc.select("div span")] == ["One"]
    assert [e.text() for e in doc.select("div .item")] == ["One"]
    assert [e.text() for e in doc.select("div#one span.item")] == ["One"]


def test_combinators():
    doc = parse("<div id=1><p id=2><span id=3>x</span></p><p id=4>y</p>"
                "<p id=5>z</p></div><p id=6>")
    assert ids(doc.select("div > p")) == ["2", "4", "5"]
    assert ids(doc.select("div p")) == ["2", "4", "5"]
    assert ids(doc.select("p + p")) == ["4", "5"]
    assert ids(doc.select("p ~ p")) == ["4", "5"]
    assert ids(doc.select("p > span")) == ["3"]
    assert ids(doc.select("div span")) == ["3"]


def test_grouped_or():
    doc = parse("<div id=1 /><span id=2 /><p id=3 />")
    assert ids(doc.select("div, p")) == ["1", "3"]


def test_pseudo_index():
    doc = parse("<div><p id=0>a<p id=1>b<p id=2>c<p id=3>d</div>")
    assert ids(doc.select("p:lt(2)")) == ["0", "1"]
    assert ids(doc.select("p:gt(1)")) == ["2", "3"]
    assert ids(doc.select("p:eq(2)")) == ["2"]


def test_pseudo_structural():
    doc = parse("<div id=d1><p id=1><span>s</span></p><p id=2>t</p></div>"
                "<div id=d2><p id=3>u</p></div>")
    assert ids(doc.select("div:has(span)")) == ["d1"]
    assert ids(doc.select("p:has(span)")) == ["1"]
    assert ids(doc.select("p:not(:has(span))")) == ["2", "3"]
    assert ids(doc.select("p:contains(t)")) == ["2"]
    assert ids(doc.select("p:containsOwn(u)")) == ["3"]
    assert ids(doc.select("p:matches(^[tu]$)")) == ["2", "3"]


def test_contains_case_insensitive():
    doc = parse("<p id=1>The Rain.</p><p id=2>The RAIN.</p>")
    assert ids(doc.select("p:contains(rain)")) == ["1", "2"]


def test_contains_data():
    doc = parse("<div id=1><script>var x = 1;</script></div><div id=2><style>.x{}</style></div>")
    assert ids(doc.select("div:containsData(var)")) == ["1"]
    assert ids(doc.select("div:containsData(.x)")) == ["2"]


def test_nth_child():
    doc = parse("<div><p id=1><p id=2><p id=3><p id=4><p id=5></div>")
    assert ids(doc.select("p:nth-child(odd)")) == ["1", "3", "5"]
    assert ids(doc.select("p:nth-child(even)")) == ["2", "4"]
    assert ids(doc.select("p:nth-child(3n+1)")) == ["1", "4"]
    assert ids(doc.select("p:nth-child(-n+2)")) == ["1", "2"]
    assert ids(doc.select("p:nth-last-child(2)")) == ["4"]
    assert ids(doc.select("p:nth-child(2)")) == ["2"]


def test_nth_of_type():
    doc = parse("<div><span id=s1>x</span><p id=1></p><p id=2></p>"
                "<span id=s2>y</span><p id=3></p></div>")
    assert ids(doc.select("p:nth-of-type(2)")) == ["2"]
    assert ids(doc.select("span:nth-of-type(2)")) == ["s2"]
    assert ids(doc.select("p:first-of-type")) == ["1"]
    assert ids(doc.select("p:last-of-type")) == ["3"]


def test_first_last_only():
    doc = parse("<div><p id=1>a</p><p id=2>b</p></div><div><p id=3>c</p></div>")
    assert ids(doc.select("p:first-child")) == ["1", "3"]
    assert ids(doc.select("p:last-child")) == ["2", "3"]
    assert ids(doc.select("p:only-child")) == ["3"]


def test_empty_and_root():
    doc = parse("<div id=1></div><div id=2> </div><div id=3><!-- c --></div>")
    assert ids(doc.select("div:empty")) == ["1", "3"]
    assert [e.tag_name for e in doc.select(":root")] == ["html"]


def test_leading_combinator():
    doc = parse("<div id=1><p id=2><span id=3></span></p></div>")
    div = doc.select("#1")[0]
    assert ids(div.select("> p")) == ["2"]
    assert ids(div.select("> p > span")) == ["3"]


def test_nested_has():
    doc = parse("<div id=1><p><span>x</span></p></div><div id=2><p>y</p></div>")
    assert ids(doc.select("div:has(p:has(span))")) == ["1"]


def test_namespaced_tag():
    doc = parse("<fb:comment id=1 /><p id=2>")
    assert ids(doc.select("fb|comment")) == ["1"]
    assert ids(doc.select("*|comment")) == ["1"]


def test_wildcard():
    doc = parse("<div id=1><p id=2>")
    names = [e.tag_name for e in doc.select("*")]
    assert names == ["#root", "html", "head", "body", "div", "p"]


def test_select_within():
    doc = parse("<div id=out><div id=in><p id=1>x</p></div></div><p id=2>y</p>")
    inner = doc.select("#in")[0]
    assert ids(inner.select("p")) == ["1"]
    # descendant match can see ancestors above the context root
    assert ids(inner.select("div p")) == ["1"]


def test_matches_is():
    doc = parse("<div id=1 class=foo><p>x</p></div>")
    div = doc.select("#1")[0]
    assert div.matches("div.foo")
    assert not div.matches("p")


def test_selector_spans_document_order():
    doc = parse("<p id=1><b id=2>x</b></p><span id=3><p id=4>z</p></span>")
    assert ids(doc.select("p, b, span")) == ["1", "2", "3", "4"]
