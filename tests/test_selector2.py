"""Second selector-conformance batch, ported from the reference
SelectorTest.swift:551-985 (descendant/child/sibling combinators, case
insensitivity, pseudo combinations, context-root restriction)."""

from swiftsoup_spark import parse


def ids(els):
    return [e.attr("id") for e in els]


def test_descendant_and_root_restriction():
    h = "<div class=head><p class=first>Hello</p><p>There</p></div><p>None</p>"
    doc = parse(h)
    root = doc.get_elements_by_class("HEAD")[0]
    els = root.select(".head p")
    assert [e.text() for e in els] == ["Hello", "There"]
    assert [e.text() for e in root.select("p.first")] == ["Hello"]
    assert root.select("p .first") == []
    # ancestors above the context root are invisible
    assert root.select("body div.head") == []


def test_and_combinations():
    h = "<div id=1 class='foo bar' title=bar name=qux><p class=foo title=bar>Hello</p></div"
    doc = parse(h)
    assert [e.tag_name for e in doc.select("div.foo")] == ["div"]
    assert [e.tag_name for e in doc.select("div .foo")] == ["p"]
    assert [e.tag_name for e in doc.select("div#1.foo.bar[title=bar][name=qux]")] == ["div"]
    assert [e.tag_name for e in doc.select("div *.foo")] == ["p"]


def test_deeper_descendant():
    h = ("<div class=head><p><span class=first>Hello</div>"
         "<div class=head><p class=first><span>Another</span><p>Again</div>")
    doc = parse(h)
    root = doc.get_elements_by_class("head")[0]
    els = root.select("div p .first")
    assert [e.text() for e in els] == ["Hello"]
    assert els[0].tag_name == "span"
    assert root.select("body p .first") == []


def test_parent_child_element():
    doc = parse("<div id=1><div id=2><div id = 3></div></div></div><div id=4></div>")
    assert ids(doc.select("div > div")) == ["2", "3"]
    assert ids(doc.select("div#1 > div")) == ["2"]


def test_parent_with_class_child():
    doc = parse("<h1 class=foo><a href=1 /></h1><h1 class=foo>"
                "<a href=2 class=bar /></h1><h1><a href=3 /></h1>")
    assert len(doc.select("h1 > a")) == 3
    assert len(doc.select("h1.foo > a")) == 2
    assert len(doc.select("h1.foo > a.bar")) == 1


def test_parent_child_star():
    doc = parse("<div id=1><p>Hello<p><b>there</b></p></div><div id=2><span>Hi</span></div>")
    assert [e.tag_name for e in doc.select("div > *")] == ["p", "p", "span"]


def test_multi_child_descent():
    doc = parse("<div id=foo><h1 class=bar><a href=http://example.com/>One</a></h1></div>")
    assert [e.tag_name for e in doc.select("div#foo > h1.bar > a[href*=example]")] == ["a"]


def test_case_insensitive():
    doc = parse("<dIv tItle=bAr><div>")
    assert len(doc.select("div")) == 2
    assert len(doc.select("div[title]")) == 1
    assert len(doc.select("div[title=bar]")) == 1
    assert len(doc.select("div[title=barbarella]")) == 0


def test_adjacent_siblings():
    doc = parse("<ol><li>One<li>Two<li>Three</ol>")
    assert [e.text() for e in doc.select("li + li")] == ["Two", "Three"]
    doc2 = parse("<ol><li id=1>One<li id=2>Two<li id=3>Three</ol>")
    assert [e.text() for e in doc2.select("li#1 + li#2")] == ["Two"]
    assert doc2.select("li#1 + li#3") == []


def test_mix_combinator():
    doc = parse("<div class=foo><ol><li>One<li>Two<li>Three</ol></div>")
    assert [e.text() for e in doc.select("body > div.foo li + li")] == ["Two", "Three"]


def test_mix_combinator_group():
    doc = parse("<div class=foo><ol><li>One<li>Two<li>Three</ol></div>")
    els = doc.select(".foo > ol, ol > li + li")
    assert els[0].tag_name == "ol"
    assert [e.text() for e in els[1:]] == ["Two", "Three"]


def test_general_siblings():
    doc = parse("<ol><li id=1>One<li id=2>Two<li id=3>Three</ol>")
    assert [e.text() for e in doc.select("#1 ~ #3")] == ["Three"]


def test_characters_in_id_and_class():
    doc = parse("<div><p id='a1-foo_bar'>One</p><p class='b2-qux_bif'>Two</p></div>")
    assert doc.get_element_by_id("a1-foo_bar").text() == "One"
    assert doc.get_elements_by_class("b2-qux_bif")[0].text() == "Two"
    assert doc.select("#a1-foo_bar")[0].text() == "One"
    assert doc.select(".b2-qux_bif")[0].text() == "Two"


def test_leading_combinator_not_nested():
    doc = parse("<div><p><span>One</span><span>Two</span></p></div>")
    p = doc.select("div > p")[0]
    assert [e.text() for e in p.select("> span")] == ["One", "Two"]
    doc2 = parse("<div id=1><div id=2><div id=3></div></div></div>")
    assert doc2.select("div").select("> div")[0].attr("id") == "2"


def test_pseudo_lt_gt_eq():
    doc = parse("<div><p>One</p><p>Two</p><p>Three</p></div><div><p>Four</p>")
    assert [e.text() for e in doc.select("div p:lt(2)")] == ["One", "Two", "Four"]
    assert [e.text() for e in doc.select("div p:gt(0)")] == ["Two", "Three"]
    assert [e.text() for e in doc.select("div p:eq(0)")] == ["One", "Four"]
    assert [e.text() for e in doc.select("div:eq(0) p:eq(0)")] == ["One"]
    assert [e.text() for e in doc.select("div p:gt(0):lt(2)")] == ["Two"]


def test_pseudo_combined():
    doc = parse("<div class='foo'><p>One</p><p>Two</p></div><div><p>Three</p><p>Four</p></div>")
    assert [e.text() for e in doc.select("div.foo p:gt(0)")] == ["Two"]


def test_pseudo_has():
    doc = parse("<div id=0><p><span>Hello</span></p></div> "
                "<div id=1><span class=foo>There</span></div> "
                "<div id=2><p>Not</p></div>")
    assert ids(doc.select("div:has(span)")) == ["0", "1"]
    assert ids(doc.select("div:has(> span)")) == ["1"]
    assert ids(doc.select("div:has(span.foo)")) == ["1"]
    assert ids(doc.select("div:has(p):not(:has(span))")) == ["2"]


def test_has_variants():
    doc = parse("<div id=0><p><span>Hello</span></p></div> "
                "<div id=1><span class=foo>There</span></div> "
                "<div id=2><p>Not</p></div>")
    assert ids(doc.select("div:has([class]")) == ["1"]  # unclosed paren tolerated
    assert ids(doc.select("div:has(span, p)")) == ["0", "1", "2"]
    els = doc.body().select(":has(p)")
    assert els[0].tag_name == "body"
    assert ids(els[1:]) == ["0", "2"]


def test_nested_has_with_text_pseudos():
    doc = parse("<div><p><span>One</span></p></div> <div><p>Two</p></div>")
    assert [e.text() for e in doc.select("div:has(p:has(span))")] == ["One"]
    assert [e.text() for e in doc.select("div:has(p:matches((?i)two))")] == ["Two"]
    assert [e.text() for e in doc.select("div:has(p:contains(two))")] == ["Two"]


def test_pseudo_contains_details():
    doc = parse("<div><p>The Rain.</p> <p class=light>The <i>rain</i>.</p> <p>Rain, the.</p></div>")
    assert len(doc.select("p:contains(Rain)")) == 3
    ps2 = doc.select("p:contains(the rain)")
    assert [p.html() for p in ps2] == ["The Rain.", "The <i>rain</i>."]
    ps3 = doc.select("p:contains(the Rain):has(i)")
    assert [p.attr("class") for p in ps3] == ["light"]
    assert len(doc.select(".light:contains(rain)")) == 1
    # 8 per the reference: the Document root is an Element and matches
    assert len(doc.select(":contains(rain)")) == 8


def test_contains_with_parentheses():
    doc = parse("<div><p id=1>This (is good)</p><p id=2>This is bad)</p>")
    assert ids(doc.select("p:contains(this (is good))")) == ["1"]
    assert ids(doc.select("p:contains(this is bad\\))")) == ["2"]


def test_contains_own_details():
    doc = parse("<p id=1>Hello <b>there</b> now</p>")
    assert ids(doc.select("p:containsOwn(Hello now)")) == ["1"]
    assert doc.select("p:containsOwn(there)") == []


def test_contains_data_details():
    doc = parse("<div><p>Some text</p><script>var foo = 'bar';</script>"
                "<style>.red { color: red; }</style></div>")
    scripts = doc.select("script:containsData(foo)")
    assert [s.data() for s in scripts] == ["var foo = 'bar';"]
    assert len(doc.select("script:containsData(FOO)")) == 1
    assert len(doc.select("style:containsData(red)")) == 1
    assert doc.select("p:containsData(text)") == []


# --- round-3 ports: SelectorTest.swift:943-1008 ----------------------------

def test_matches_own():
    # SelectorTest.testMatchesOwn
    doc = parse("<p id=1>Hello <b>there</b> now</p>")
    p1 = doc.select("p:matchesOwn((?i)hello now)")
    assert ids(p1) == ["1"]
    assert doc.select("p:matchesOwn(there)") == []


def test_relaxed_tags():
    # SelectorTest.testRelaxedTags: underscore and dash in tag selectors
    doc = parse("<abc_def id=1>Hello</abc_def> <abc-def id=2>There</abc-def>")
    assert ids(doc.select("abc_def")) == ["1"]
    assert ids(doc.select("abc-def")) == ["2"]


def test_handles_commas_in_selector():
    # SelectorTest.testHandlesCommasInSelector: comma inside [attr=] and
    # inside :matches(...) must not split the selector group
    doc = parse("<p name='1,2'>One</p><div>Two</div>"
                "<ol><li>123</li><li>Text</li></ol>")
    assert len(doc.select("[name=1,2]")) == 1
    containers = doc.select("div, li:matches([0-9,]+)")
    assert [e.tag_name for e in containers] == ["div", "li"]
    assert containers[1].text() == "123"


def test_select_supplementary_character():
    # SelectorTest.testSelectSupplementaryCharacter (astral-plane key,
    # value, and text)
    s = chr(135361)
    doc = parse("<div k" + s + "='" + s + "'>^" + s + "$</div>")
    assert doc.select("div[k" + s + "]")[0].tag_name == "div"
    assert doc.select("div:containsOwn(" + s + ")")[0].tag_name == "div"


def test_select_class_with_space():
    # SelectorTest.testSelectClassWithSpace: quoted values are unquoted
    # then trimmed (AttributeKeyPair); escaped trailing space stays
    doc = parse('<div class="value">class without space</div>\n'
                '<div class="value ">class with space</div>')
    for css in ('div[class=value ]', 'div[class="value "]'):
        found = doc.select(css)
        assert [e.text() for e in found] == [
            "class without space", "class with space"]
    assert doc.select('div[class="value\\ "]') == []


def test_select_same_elements():
    # SelectorTest.testSelectSameElements: Elements.select dedups the
    # union across the set's roots
    doc = parse("<div>one</div><div>one</div>")
    els = doc.select("div")
    assert len(els) == 2
    assert len(els.select(":contains(one)")) == 2
