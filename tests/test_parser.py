"""Tree-builder conformance cases ported from the reference HtmlParserTest
(/root/reference/Tests/SwiftSoupTests/HtmlParserTest.swift). Covers rough
attributes, comments, unterminated tags, RCDATA/RAWTEXT, script escapes,
tables/foster parenting, adoption agency, base href, CDATA, frameset."""

import re

from swiftsoup_spark import parse, parse_body_fragment
from swiftsoup_spark.kernel.arena import COMMENT, TEXT, DATA


def sn(s: str) -> str:
    """TextUtil.stripNewlines"""
    return re.sub(r"\n\s*", "", s)


def body_html(html: str) -> str:
    return parse(html).body().html()


def test_parses_multibyte_attributes():
    html = '<div foo="若い"></div>'
    assert body_html(html) == html


def test_parses_rough_attributes():
    doc = parse('<html><head><title>First!</title></head><body>'
                '<p class="foo > bar">First post! <img src="foo.png" /></p></body></html>')
    p = doc.body().children()[0]
    assert p.tag_name == "p"
    assert p.attr("class") == "foo > bar"


def test_parses_quite_rough_attributes():
    doc = parse("<p =a>One<a <p>Something</p>Else")
    assert doc.body().html() == '<p =a>One<a <p>Something</a></p>\n<a <p>Else</a>'


def test_parses_rough_attributes2():
    doc = parse("<p .....>")
    assert doc.body().html() == "<p .....></p>"


def test_parses_comments():
    doc = parse("<html><head></head><body><img src=foo>"
                "<!-- <table><tr><td></table> --><p>Hello</p></body></html>")
    body = doc.body()
    nodes = body.child_nodes()
    assert nodes[1].node_type == COMMENT
    assert nodes[1].arena.text[nodes[1].id] == " <table><tr><td></table> "
    p = body.children()[1]
    assert p.text() == "Hello"


def test_comment_start_dash_dash():
    doc = parse("<div><!---x--></div>")
    c = doc.select("div")[0].child_nodes()[0]
    assert c.arena.text[c.id] == "x"


def test_comment_end_bang():
    doc = parse("<div><!--x!--></div>")
    c = doc.select("div")[0].child_nodes()[0]
    assert c.arena.text[c.id] == "x!"


def test_unterminated_comment():
    doc = parse("<p>Hello<!-- <tr><td>")
    p = doc.select("p")[0]
    assert p.text() == "Hello"
    nodes = p.child_nodes()
    assert nodes[0].arena.text[nodes[0].id] == "Hello"
    assert nodes[1].arena.text[nodes[1].id] == " <tr><td>"


def test_multibyte_comment():
    doc = parse("<div><!-- 你好-世界 --><p>OK</p></div>")
    c = doc.select("div")[0].child_nodes()[0]
    assert c.arena.text[c.id] == " 你好-世界 "


def test_drops_unterminated_tag():
    doc = parse("<p")
    assert len(doc.select("p")) == 0
    assert doc.text() == ""
    doc = parse("<div id=1<p id='2'")
    assert doc.text() == ""


def test_drops_unterminated_attribute():
    doc = parse('<p id="foo')
    assert doc.text() == ""


def test_unterminated_textarea():
    doc = parse("<body><p><textarea>one<p>two")
    t = doc.select("textarea")[0]
    assert t.text() == "one"
    assert doc.select("p")[1].text() == "two"


def test_unterminated_option():
    doc = parse("<body><p><select><option>One<option>Two</p><p>Three</p>")
    options = doc.select("option")
    assert len(options) == 2
    assert options[0].text() == "One"
    assert options[1].text() == "TwoThree"


def test_space_after_tag():
    doc = parse('<div > <a name="top"></a ><p id=1 >Hello</p></div>')
    assert sn(doc.body().html()) == '<div> <a name="top"></a><p id="1">Hello</p></div>'


def test_creates_document_structure():
    html = "<meta name=keywords /><link rel=stylesheet /><title>SwiftSoup</title>" \
           "<p>Hello world</p>"
    doc = parse(html)
    head = doc.head()
    body = doc.body()
    assert len(doc.children()) == 1  # html
    assert len(doc.children()[0].children()) == 2
    assert len(head.children()) == 3
    assert len(body.children()) == 1
    assert head.get_elements_by_tag("meta")[0].attr("name") == "keywords"
    assert len(body.get_elements_by_tag("meta")) == 0
    assert doc.title() == "SwiftSoup"
    assert body.text() == "Hello world"
    assert body.children()[0].text() == "Hello world"


def test_creates_structure_from_body_snippet():
    html = "foo <b>bar</b> baz"
    doc = parse(html)
    assert doc.text() == "foo bar baz"


def test_handles_data_only_tags():
    t = "<style>font-family: bold</style>"
    tels = parse(t).select("style")
    assert tels[0].data() == "font-family: bold"
    assert tels[0].text() == ""

    s = "<p>Hello</p><script>obj.insert('<a rel=\"none\" />');\ni++;</script><p>There</p>"
    doc = parse(s)
    assert doc.text() == "Hello There"
    assert doc.select("script")[0].data() == "obj.insert('<a rel=\"none\" />');\ni++;"


def test_handles_text_after_data():
    h = "<html><body>pre <script>inner</script> aft</body></html>"
    doc = parse(h)
    assert sn(doc.outer_html()) == ("<html><head></head><body>pre <script>inner"
                                    "</script> aft</body></html>")


def test_handles_text_area():
    doc = parse("<textarea>Hello</textarea>")
    els = doc.select("textarea")
    assert els[0].text() == "Hello"


def test_preserves_space_in_textarea():
    doc = parse("<textarea>\n\tOne\n\tTwo\n\tThree\n</textarea>")
    expect = "One\n\tTwo\n\tThree"  # the leading and trailing spaces are trimmed by text()
    el = doc.select("textarea")[0]
    assert el.text() == expect


def test_preserves_space_in_script():
    doc = parse("<script>\nOne\n\tTwo\n\tThree\n</script>")
    expect = "\nOne\n\tTwo\n\tThree\n"
    el = doc.select("script")[0]
    assert el.data() == expect


def test_does_not_create_implicit_lists():
    h = "<li>Point one<li>Point two"
    doc = parse(h)
    ol = doc.select("ul")
    assert len(ol) == 0
    lis = doc.select("li")
    assert len(lis) == 2
    assert lis[0].parent().tag_name == "body"

    h2 = "<ol><li><p>Point the first<li><p>Point the second"
    doc2 = parse(h2)
    assert len(doc2.select("ul")) == 0
    lis2 = doc2.select("ol li")
    assert len(lis2) == 2
    assert lis2[0].text() == "Point the first"
    assert lis2[1].text() == "Point the second"
    assert lis2[0].children()[0].tag_name == "p"


def test_discards_naked_tds():
    h = "<td>Hello<td><p>There<p>now"
    doc = parse(h)
    assert sn(doc.body().html()) == "Hello<p>There</p><p>now</p>"


def test_handles_nested_implicit_table():
    doc = parse("<table><td>1</td></tr> <td>2</td></tr> <td> <table><td>3</td> <td>4</td></table> <tr><td>5</table>")
    assert sn(doc.body().html()) == (
        "<table><tbody><tr><td>1</td></tr> <tr><td>2</td></tr> <tr><td> "
        "<table><tbody><tr><td>3</td> <td>4</td></tr></tbody></table> </td></tr>"
        "<tr><td>5</td></tr></tbody></table>")


def test_handles_what_wg_expenses_table_example():
    doc = parse("<table> <colgroup> <col> <colgroup> <col> <col> <col> <thead> <tr> <th> <th>2008 <th>2007 <th>2006 <tbody> <tr> <th scope=rowgroup> Research and development <td> $ 1,109 <td> $ 782 <td> $ 712 <tr> <th scope=row> Percentage of net sales <td> 3.4% <td> 3.3% <td> 3.7% <tbody> <tr> <th scope=rowgroup> Selling, general, and administrative <td> $ 3,761 <td> $ 2,963 <td> $ 2,433 <tr> <th scope=row> Percentage of net sales <td> 11.6% <td> 12.3% <td> 12.6% </table>")
    assert sn(doc.body().html()) == "<table> <colgroup> <col /> </colgroup><colgroup> <col /> <col /> <col /> </colgroup><thead> <tr> <th> </th><th>2008 </th><th>2007 </th><th>2006 </th></tr></thead><tbody> <tr> <th scope=\"rowgroup\"> Research and development </th><td> $ 1,109 </td><td> $ 782 </td><td> $ 712 </td></tr><tr> <th scope=\"row\"> Percentage of net sales </th><td> 3.4% </td><td> 3.3% </td><td> 3.7% </td></tr></tbody><tbody> <tr> <th scope=\"rowgroup\"> Selling, general, and administrative </th><td> $ 3,761 </td><td> $ 2,963 </td><td> $ 2,433 </td></tr><tr> <th scope=\"row\"> Percentage of net sales </th><td> 11.6% </td><td> 12.3% </td><td> 12.6% </td></tr></tbody></table>"


def test_handles_tbody_table():
    doc = parse("<html><head></head><body><table><tbody><tr><td>aaa</td><td>bbb</td></tr></tbody></table></body></html>")
    assert sn(doc.body().html()) == "<table><tbody><tr><td>aaa</td><td>bbb</td></tr></tbody></table>"


def test_handles_implicit_caption_close():
    doc = parse("<table><caption>A caption<td>One<td>Two")
    assert sn(doc.body().html()) == ("<table><caption>A caption</caption><tbody><tr>"
                                     "<td>One</td><td>Two</td></tr></tbody></table>")


def test_no_table_direct_in_table():
    doc = parse("<table> <td>One <td><table><td>Two</table> <table><td>Three")
    assert sn(doc.body().html()) == ("<table> <tbody><tr><td>One </td><td><table>"
                                     "<tbody><tr><td>Two</td></tr></tbody></table> <table><tbody><tr><td>Three"
                                     "</td></tr></tbody></table></td></tr></tbody></table>")


def test_ignores_dupe_end_tr_tag():
    doc = parse("<table><tr><td>One</td><td><table><tr><td>Two</td></tr></tr></table></td><td>Three</td></tr></table>")
    assert sn(doc.body().html()) == ("<table><tbody><tr><td>One</td><td><table>"
                                     "<tbody><tr><td>Two</td></tr></tbody></table></td><td>Three</td></tr>"
                                     "</tbody></table>")


def test_handles_base_tags():
    h = "<a href=1>#</a><base href='/2/'><a href='3'>#</a><base href='http://bar'><a href=/4>#</a>"
    doc = parse(h, "http://foo/")
    assert doc.arena.base_uri == "http://foo/2/"  # first base wins, resolved
    anchors = doc.select("a")
    assert len(anchors) == 3
    assert anchors[0].abs_url("href") == "http://foo/2/1"
    assert anchors[1].abs_url("href") == "http://foo/2/3"
    assert anchors[2].abs_url("href") == "http://foo/4"


def test_protocol_relative_url():
    doc = parse("<img src='//example.net/img.jpg'>", "https://example.com/")
    assert doc.select("img")[0].abs_url("src") == "https://example.net/img.jpg"


def test_cdata():
    doc = parse("<div id=1><![CDATA[<html>\n<foo><&amp;]]></div>")
    div = doc.select("#1")[0]
    assert div.text() == "<html> <foo><&amp;"  # CDATA is a plain TextNode
    assert len(div.children()) == 0
    assert len(div.child_nodes()) == 1


def test_unclosed_cdata_at_eof():
    h = "<![CDATA[]]"
    doc = parse(h)
    assert doc is not None


def test_handles_unclosed_title_at_eof():
    assert parse("<title>Data").title() == "Data"
    assert parse("<title>Data<").title() == "Data<"
    assert parse("<title>Data</").title() == "Data</"
    assert parse("<title>Data</t").title() == "Data</t"
    assert parse("<title>Data</ti").title() == "Data</ti"
    assert parse("<title>Data</title>").title() == "Data"
    assert parse("<title>Data</title >").title() == "Data"


def test_handles_unclosed_title():
    one = parse("<title>One <b>Two <b>Three</TITLE><p>Test</p>")
    assert one.title() == "One <b>Two <b>Three"
    assert one.select("p")[0].text() == "Test"

    # breakout: '<b' with no '</title' ahead closes the title
    two = parse("<title>One<b>Two <p>Test</p>")
    assert two.title() == "One"
    assert two.select("p")[0].text() == "Test"


def test_handles_unclosed_script_at_eof():
    assert parse("<script>Data").select("script")[0].data() == "Data"
    assert parse("<script>Data<").select("script")[0].data() == "Data<"
    assert parse("<script>Data</sc").select("script")[0].data() == "Data</sc"
    assert parse("<script>Data</-sc").select("script")[0].data() == "Data</-sc"
    assert parse("<script>Data</sc-").select("script")[0].data() == "Data</sc-"
    assert parse("<script>Data</sc--").select("script")[0].data() == "Data</sc--"
    assert parse("<script>Data</script>").select("script")[0].data() == "Data"
    assert parse("<script>Data</script").select("script")[0].data() == "Data"
    assert parse("<script>Data</script ").select("script")[0].data() == "Data"
    assert parse("<script>Data</script n").select("script")[0].data() == "Data"
    assert parse("<script>Data</script n=").select("script")[0].data() == "Data"
    assert parse("<script>Data</script n=\"").select("script")[0].data() == "Data"
    assert parse("<script>Data</script n=\"p").select("script")[0].data() == "Data"


def test_handles_escaped_script():
    doc = parse("<script><!-- one <script>Blah</script> --></script>")
    assert doc.select("script")[0].data() == "<!-- one <script>Blah</script> -->"


def test_handles_unclosed_raw_text_at_eof():
    assert parse("<style>Data").select("style")[0].data() == "Data"
    assert parse("<style>Data</st").select("style")[0].data() == "Data</st"
    assert parse("<style>Data</style>").select("style")[0].data() == "Data"
    assert parse("<style>Data</style").select("style")[0].data() == "Data"
    assert parse("<style>Data</-style").select("style")[0].data() == "Data</-style"
    assert parse("<style>Data</style-").select("style")[0].data() == "Data</style-"
    assert parse("<style>Data</style--").select("style")[0].data() == "Data</style--"


def test_no_implicit_form_for_text_areas():
    doc = parse("<textarea>One</textarea>")
    assert sn(doc.body().html()) == "<textarea>One</textarea>"


def test_handles_unknown_tags():
    h = "<div><foo title=bar>Hello<foo title=qux>there</foo></div>"
    doc = parse(h)
    foos = doc.select("foo")
    assert len(foos) == 2
    assert foos[0].attr("title") == "bar"
    assert foos[1].attr("title") == "qux"
    assert foos[1].text() == "there"


def test_handles_unknown_namespace_tags():
    h = "<foo:bar id='1' /><abc:def id=2>Foo<p>Hello</p></abc:def><foo:bar>There</foo:bar>"
    doc = parse(h)
    assert sn(doc.body().html()) == ("<foo:bar id=\"1\" /><abc:def id=\"2\">Foo<p>Hello"
                                     "</p></abc:def><foo:bar>There</foo:bar>")


def test_handles_empty_blocks():
    h = "<div id=1></div><div id=2><img /></div>"
    doc = parse(h)
    div1 = doc.select("#1")[0]
    assert len(div1.children()) == 0


def test_handles_multi_closing_body():
    h = "<body><p>Hello</body><p>there</p></body></body></html><p>now"
    doc = parse(h)
    assert len(doc.select("p")) == 3
    assert len(doc.body().children()) == 3


def test_handles_unclosed_definition_lists():
    h = "<dt>Foo<dd>Bar<dt>Qux<dd>Zug"
    doc = parse(h)
    assert len(doc.select("dt")) == 2
    dts = doc.select("dt")
    assert len(dts) == 2
    assert dts[1].text() == "Qux"


def test_handles_blocks_in_definitions():
    h = "<dl><dt><div id=1>Term</div></dt><dd><div id=2>Def</div></dd></dl>"
    doc = parse(h)
    assert doc.select("#1")[0].parent().tag_name == "dt"
    assert doc.select("#2")[0].parent().tag_name == "dd"


def test_handles_frames():
    h = "<html><head><script></script><noscript></noscript></head>" \
        "<frameset><frame src=foo></frame><frame src=foo></frameset></html>"
    doc = parse(h)
    assert sn(doc.outer_html()) == ("<html><head><script></script><noscript>"
                                    "</noscript></head><frameset><frame src=\"foo\" /><frame src=\"foo\" />"
                                    "</frameset></html>")


def test_ignores_content_after_frameset():
    h = "<html><head><title>One</title></head><frameset><frame /><frame /></frameset><table></table></html>"
    doc = parse(h)
    assert sn(doc.outer_html()) == ("<html><head><title>One</title></head>"
                                    "<frameset><frame /><frame /></frameset></html>")


def test_handles_misnested_tags_b_i():
    h = "<p>1<b>2<i>3</b>4</i>5</p>"
    doc = parse(h)
    assert doc.body().html() == "<p>1<b>2<i>3</i></b><i>4</i>5</p>"


def test_handles_misnested_tags_b_p():
    h = "<b>1<p>2</b>3</p>"
    doc = parse(h)
    assert doc.body().html() == "<b>1</b>\n<p><b>2</b>3</p>"


def test_handles_unexpected_markup_in_tables():
    h = "<table><b><tr><td>aaa</td></tr>bbb</table>ccc"
    doc = parse(h)
    assert sn(doc.body().html()) == ("<b></b><b>bbb</b><table><tbody><tr><td>aaa"
                                     "</td></tr></tbody></table><b>ccc</b>")


def test_handles_unclosed_formatting_elements():
    from swiftsoup_spark.kernel.serializer import OutputSettings, serialize
    h = "<!DOCTYPE html>\n<p><b class=x><b class=x><b><b class=x><b class=x><b>X\n<p>X\n<p><b><b class=x><b>X\n<p></b></b></b></b></b></b>X"
    doc = parse(h)
    want = ("<!doctype html>\n"
            "<html>\n"
            "<head></head>\n"
            "<body>\n"
            "<p><b class=\"x\"><b class=\"x\"><b><b class=\"x\"><b class=\"x\"><b>X </b></b></b></b></b></b></p>\n"
            "<p><b class=\"x\"><b><b class=\"x\"><b class=\"x\"><b>X </b></b></b></b></b></p>\n"
            "<p><b class=\"x\"><b><b class=\"x\"><b class=\"x\"><b><b><b class=\"x\"><b>X </b></b></b></b></b></b></b></b></p>\n"
            "<p>X</p>\n"
            "</body>\n"
            "</html>")
    out = serialize(doc.arena, 0, OutputSettings(indent_amount=0)).strip(" \n")
    assert out == want


def test_handles_unclosed_anchors():
    doc = parse("<a href='http://example.com/'>Link<p>Error link</a>")
    want = ("<a href=\"http://example.com/\">Link</a>\n"
            "<p><a href=\"http://example.com/\">Error link</a></p>")
    assert doc.body().html() == want


def test_reconstruct_formatting_elements():
    h = "<p><b class=one>One <i>Two <b>Three</p><p>Hello</p>"
    doc = parse(h)
    assert doc.body().html() == ("<p><b class=\"one\">One <i>Two <b>Three</b></i>"
                                 "</b></p>\n<p><b class=\"one\"><i><b>Hello</b></i></b></p>")


def test_reconstruct_formatting_elements_in_table():
    h = "<p><b>One</p> <table><tr><td><p><i>Three<p>Four</i></td></tr></table> <p>Five</p>"
    doc = parse(h)
    expect = ("<p><b>One</b></p><b> <table><tbody><tr><td><p><i>Three</i></p><p><i>"
              "Four</i></p></td></tr></tbody></table> <p>Five</p></b>")
    assert sn(doc.body().html()) == expect


def test_doctype_quirks():
    doc = parse("<!doctype html><html></html>")
    assert doc.arena.quirks == 0


def test_finds_charset_in_malformed_meta():
    h = "<meta http-equiv=Content-Type content=text/html; charset=gb2312>"
    doc = parse(h)
    assert doc.select("meta")[0].attr("charset") == "gb2312"


def test_empty_document_has_html_and_body():
    doc = parse("")
    assert doc.head() is not None
    assert doc.body() is not None


def test_xml_declaration_is_not_element():
    doc = parse("<?xml encoding='UTF-8' ?><body>One</body>")
    # sniffed as XML document (reference parse auto-detect)
    assert doc.text() == "One"


def test_handles_entities_in_text():
    doc = parse("<p>A &lt; B &amp; C &gt; D &quot;E&quot; &copy; &unknown")
    assert doc.text() == 'A < B & C > D "E" © &unknown'


def test_numeric_entities():
    doc = parse("<p>&#65;&#x42;&#67;</p>")
    assert doc.text() == "ABC"
