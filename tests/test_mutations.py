"""DOM mutation + Elements bulk-op parity (reference ElementTest /
NodeTest / ElementsTest mutation sections)."""

import re

from swiftsoup_spark import parse, parse_body_fragment


def sn(s: str) -> str:
    return re.sub(r"\n\s*", "", s)


def test_append_prepend():
    doc = parse("<div id=1><p>one</p></div>")
    d = doc.select("#1")[0]
    d.append_html("<p>two</p>")
    d.prepend_html("<p>zero</p>")
    assert [p.text() for p in d.select("p")] == ["zero", "one", "two"]


def test_before_after():
    doc = parse("<div><p id=a>A</p></div>")
    a = doc.select("#a")[0]
    a.before("<p id=b>B</p>")
    a.after("<p id=c>C</p>")
    assert [p.attr("id") for p in doc.select("div p")] == ["b", "a", "c"]


def test_wrap():
    doc = parse("<div><p><b>This</b> is <b>SwiftSoup</b></p></div>")
    p = doc.select("p")[0]
    p.wrap("<div class='head'></div>")
    assert sn(doc.body().html()) == (
        "<div><div class=\"head\"><p><b>This</b> is <b>SwiftSoup</b></p></div></div>")


def test_unwrap():
    doc = parse("<div>One <span>Two <b>Three</b></span> Four</div>")
    doc.select("span")[0].unwrap()
    assert sn(doc.body().html()) == "<div>One Two <b>Three</b> Four</div>"


def test_replace_with():
    doc = parse("<div><p id=1>One</p><p id=2>Two</p></div>")
    p2 = doc.select("#2")[0]
    p1 = doc.select("#1")[0]
    p1.replace_with(p2)
    assert [p.attr("id") for p in doc.select("div p")] == ["2"]


def test_empty_and_set_text():
    doc = parse("<div id=1><p>Hello</p></div>")
    d = doc.select("#1")[0]
    d.set_text("replaced")
    assert d.text() == "replaced"
    assert len(d.children()) == 0
    d.set_html("<span>new</span>")
    assert sn(d.html()) == "<span>new</span>"
    d.empty()
    assert d.html() == ""


def test_class_ops():
    doc = parse("<div class='one two'></div>")
    d = doc.select("div")[0]
    d.add_class("three")
    assert d.attr("class") == "one two three"
    d.remove_class("two")
    assert d.attr("class") == "one three"
    d.toggle_class("one")
    d.toggle_class("four")
    assert d.attr("class") == "three four"
    assert d.has_class("FOUR")  # case-insensitive


def test_tag_rename():
    doc = parse("<p>Hello</p>")
    doc.select("p")[0].set_tag_name("div")
    assert sn(doc.body().html()) == "<div>Hello</div>"


def test_split_text():
    from swiftsoup_spark.kernel.mutations import split_text
    doc = parse("<div>Hello there</div>")
    d = doc.select("div")[0]
    tn = d.text_nodes()[0]
    split_text(d.arena, tn.id, 6)
    assert d.arena.text[tn.id] == "Hello "
    assert len(d.child_nodes()) == 2
    assert d.text() == "Hello there"


def test_elements_bulk():
    doc = parse("<p class=a>One</p><p class=a>Two</p><span>Three</span>")
    ps = doc.select("p")
    assert ps.text() == "One Two"
    assert ps.each_text() == ["One", "Two"]
    ps.set_attr("data-x", "1")
    assert doc.select("[data-x]").text() == "One Two"
    assert ps.attr("class") == "a"
    assert ps.is_(".a")
    assert not ps.is_("span")
    assert ps.eq(1).text() == "Two"
    assert ps.not_(":contains(one)").text() == "Two"


def test_elements_parents():
    doc = parse("<div id=out><div id=in><p>x</p></div></div>")
    parents = doc.select("p").parents()
    assert [e.attr("id") or e.tag_name for e in parents] == ["in", "out", "body", "html"]


def test_elements_select_within():
    doc = parse("<div><p id=1>a</p></div><div><p id=2>b</p></div><p id=3>c</p>")
    divs = doc.select("div")
    assert [p.attr("id") for p in divs.select("p")] == ["1", "2"]


def test_elements_traverse():
    doc = parse("<div><p><b>x</b></p></div>")
    seen = []
    doc.select("div").traverse(lambda n, d: seen.append((n.node_name, d)))
    assert seen == [("div", 0), ("p", 1), ("b", 2), ("#text", 3)]


def test_parse_body_fragment():
    doc = parse_body_fragment("<p>one</p><p>two</p>")
    assert len(doc.body().children()) == 2
    assert doc.head() is not None
    assert doc.text() == "one two"


def test_get_elements_family():
    doc = parse("<div id=d class='c x' title=t><p class=c>in</p></div><p title=q>out</p>")
    assert doc.get_element_by_id("d").tag_name == "div"
    assert len(doc.get_elements_by_class("c")) == 2
    assert len(doc.get_elements_by_attribute("title")) == 2
    assert len(doc.get_elements_by_attribute_value("title", "q")) == 1
    assert [e.tag_name for e in doc.select("div")[0].get_all_elements()] == ["div", "p"]


def test_sibling_navigation():
    doc = parse("<div><p id=1>a</p><p id=2>b</p><p id=3>c</p></div>")
    p2 = doc.select("#2")[0]
    assert p2.next_element_sibling().attr("id") == "3"
    assert p2.previous_element_sibling().attr("id") == "1"
    assert [e.attr("id") for e in p2.siblings()] == ["1", "3"]
    assert p2.elem_sibling_index() == 1


def test_form_element_association():
    doc = parse("""<form id=f action='/submit'>
      <input type=text name=user value=jo>
      <input type=checkbox name=flag checked>
      <input type=checkbox name=off>
      <input type=radio name=pick value=a>
      <input type=radio name=pick value=b checked>
      <textarea name=msg>Hello</textarea>
      <select name=sel><option value=1>one<option value=2 selected>two</select>
      <input type=submit name=go value=Go disabled>
    </form>""")
    form = doc.select("form")[0].as_form()
    assert form is not None
    assert len(form.elements()) == 8
    assert form.form_data() == [
        ("user", "jo"), ("flag", "on"), ("pick", "b"),
        ("msg", "Hello"), ("sel", "2"),
    ]


def test_form_tracks_fostered_controls():
    # control outside the form subtree (table foster) still belongs to it
    doc = parse("<table><form><input name=q value=x><td>one</td></table>")
    form = doc.select("form")[0].as_form()
    assert form.form_data() == [("q", "x")]


# --- ported FormElementTest cases (reference FormElementTest.swift) -------

def test_form_has_associated_controls():
    from swiftsoup_spark.api import parse
    html = ("<form id=1><button id=1><fieldset id=2 /><input id=3>"
            "<keygen id=4><object id=5><output id=6>"
            "<select id=7><option></select><textarea id=8><p id=9>")
    d = parse(html)
    form = d.select("form")[0].as_form()
    assert len(form.elements()) == 8


def test_form_child_inputs_are_direct_children():
    from swiftsoup_spark.api import parse
    html = ('<html><body><form name="FORM0" method="post">'
            '<input type="hidden" name="a" value="1">'
            '<input type="hidden" name="b" value="2">'
            '<input type="hidden" name="c"></form></body></html>')
    d = parse(html)
    direct = d.select("form[name=FORM0] > input")
    assert len(direct) == 3
    with_value = [e for e in direct if e.attr("value")]
    assert len(with_value) == 2


def test_form_children_tree_structure():
    from swiftsoup_spark.api import parse
    d = parse("<form id='f'><div><input name='a'></div><input name='b'></form>")
    direct = d.select("form#f > input")
    assert len(direct) == 1
    assert direct[0].attr("name") == "b"
    assert len(d.select("form#f input")) == 2


def test_nested_form_elements_structure():
    from swiftsoup_spark.api import parse
    d = parse('<form name="test"><select name="sel">'
              '<option value="1">One</option></select>'
              '<textarea name="ta">text</textarea>'
              '<input name="in" value="val"></form>')
    form = d.select("form[name=test]")[0]
    assert len(form.children()) == 3
    assert form.children()[0].tag_name == "select"
