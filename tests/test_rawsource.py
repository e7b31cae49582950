"""Raw-source serialization fast path (reference Node.rawSourceSlice,
Node.swift:1144-1183; Document.patchedOuterHtmlUTF8 / sourcePatches,
Document.swift:450-594; close-span stamping HtmlTreeBuilder.swift:355-410,
580-592).

In non-pretty mode, clean subtrees with complete source ranges re-emit
the ORIGINAL bytes (attribute quoting/case/entity forms preserved), and
an unmutated document emits its source verbatim. Mutations dirty node +
ancestors and force a rebuild of exactly the affected region. Deliberate
deviation from the reference: when a mutation cannot be localized to a
complete source range, we fall back to the full tree walk instead of
silently dropping the change (the reference's collect() skips it)."""

import pytest

from swiftsoup_spark.kernel.arena import Document
from swiftsoup_spark.kernel.serializer import OutputSettings, serialize
from swiftsoup_spark.kernel.treebuilder import HtmlTreeBuilder

NP = dict(pretty_print=False)


def pparse(src: str) -> Document:
    """Force the Python kernel (the C builder does not stamp close spans
    yet, so raw only engages on Python-built arenas)."""
    return Document(HtmlTreeBuilder().parse(src), 0)


def ser(doc: Document, nid=None) -> str:
    return serialize(doc.arena, 0 if nid is None else nid, OutputSettings(**NP))


# --------------------------------------------------------------- engagement

def test_unmutated_document_emits_source_verbatim():
    src = '<!DOCTYPE HTML><HTML><Body CLASS=main>a &amp; b<br></Body></HTML>'
    assert ser(pparse(src)) == src


def test_unmutated_document_with_trailing_comment_no_duplication():
    # the after-after-body comment attaches to the Document, OUTSIDE
    # <html>'s subtree: EOF stamping would double-emit it; the splice
    # path emits the source exactly once
    src = '<html><body>x</body></html><!--tail-->'
    assert ser(pparse(src)) == src


def test_element_raw_slice_preserves_source_quirks():
    src = '<div id=a ><p CLASS=x>hi &amp; bye</p><br><!--c--></div >tail'
    d = pparse(src)
    div = d.select('div').first()
    assert ser(d, div.id) == '<div id=a ><p CLASS=x>hi &amp; bye</p><br><!--c--></div >'
    p = d.select('p').first()
    assert ser(d, p.id) == '<p CLASS=x>hi &amp; bye</p>'


def test_pretty_mode_never_raw():
    src = '<div id=a ><p CLASS=x>hi</p></div >'
    d = pparse(src)
    pretty = serialize(d.arena, 0)  # default OutputSettings: pretty
    assert 'id="a"' in pretty and 'class="x"' in pretty
    assert 'CLASS' not in pretty


def test_void_and_comment_nodes_raw():
    src = '<div><IMG SRC=x.png ><!-- note --></div>'
    d = pparse(src)
    img = d.select('img').first()
    assert ser(d, img.id) == '<IMG SRC=x.png >'
    assert '<!-- note -->' in ser(d, d.select('div').first().id)


def test_bogus_comment_raw_is_source_faithful():
    # `</ x>` becomes a comment node; raw emit reproduces the original
    # bytes (reference insert(commentToken) complete:true)
    src = '<div></ x></div>'
    d = pparse(src)
    assert ser(d, d.select('div').first().id) == src


# --------------------------------------------------------------- mutations

def test_attr_mutation_rebuilds_exactly_the_subtree():
    src = '<section><p id=a >one</p><p id=b >two</p></section>'
    d = pparse(src)
    d.select('#a').first().set_attr('k', 'v')
    # document splice: #a rebuilt (canonical quoting), #b still raw
    assert ser(d) == ('<section><p id="a" k="v">one</p>'
                      '<p id=b >two</p></section>')


def test_remove_rebuilds_parent():
    src = '<ul><li id=a >1</li><li id=b >2</li></ul>'
    d = pparse(src)
    d.select('#a').first().remove()
    # the parent is the mutation site: its whole patch rebuilds
    # canonically (reference splices with allowRawSource:false)
    assert ser(d) == '<ul><li id="b">2</li></ul>'


def test_append_html_set_text_class_ops_dirty():
    src = '<div><span id=s >x</span></div>'
    d = pparse(src)
    s = d.select('#s').first()
    s.add_class('c1')
    assert 'class="c1"' in ser(d)
    s.set_text('y')
    assert '>y</span>' in ser(d)
    d.select('div').first().append_html('<em>e</em>')
    assert ser(d).endswith('<em>e</em></div>')


def test_set_tag_name_and_wrap_dirty():
    src = '<div><i id=a >x</i></div>'
    d = pparse(src)
    d.select('#a').first().set_tag_name('em')
    assert '<em id="a">x</em>' in ser(d)
    d2 = pparse(src)
    d2.select('#a').first().wrap('<b></b>')
    assert '<b><i id="a">x</i></b>' in ser(d2)


def test_unlocalizable_mutation_bails_to_tree_walk():
    # body has no explicit end tag -> no complete range anywhere on the
    # chain -> splice bails; the change MUST still appear (deviation
    # from the reference, which drops it)
    src = '<body><p>x'
    d = pparse(src)
    d.body().set_attr('k', 'v')
    out = ser(d)
    assert 'k="v"' in out
    assert '<p>x</p>' in out  # full rebuild materializes implied end tags


def test_title_set_through_head():
    src = '<html><head><title>Old</title></head><body>b</body></html>'
    d = pparse(src)
    d.set_title('New')
    out = ser(d)
    assert '<title>New</title>' in out
    assert out.count('body') == 2  # body region untouched (raw)


# ------------------------------------------------- building-time reparents

def test_foster_parented_table_never_raw():
    # text fostered out of the table: table's source span contains bytes
    # whose DOM nodes live BEFORE the table
    src = '<div><table>foster<tr><td>c</td></tr></table></div>'
    d = pparse(src)
    t = d.select('table').first()
    assert d.arena.src_close[t.id] == -2
    # unmutated document: source verbatim is correct (reparse re-fosters)
    assert ser(d) == src
    # but the table SUBTREE must rebuild — raw would leak the fostered
    # text back inside
    tout = ser(d, t.id)
    assert 'foster' not in tout
    assert '<td>c</td>' in tout
    # a mutation inside the table patches the td in place; the spliced
    # output reparses to the same (re-fostered) DOM
    d.select('td').first().set_attr('m', '1')
    out = ser(d)
    assert out == '<div><table>foster<tr><td m="1">c</td></tr></table></div>'
    d2 = pparse(out)
    assert d2.select('td').first().attr('m') == '1'
    tb = d2.select('table').first()
    assert 'foster' not in ser(d2, tb.id)  # still fostered out


def test_adoption_agency_no_stale_raw():
    src = '<p>1<b>2<i>3</b>4</i>5</p>'
    d = pparse(src)
    out = ser(d)
    # the <i> is split by the adoption agency; raw emit of any involved
    # element must not resurrect the original mis-nesting
    d2 = pparse(out)
    assert d2.text() == d.text()
    assert len(d2.select('i')) == len(d.select('i'))


def test_rcdata_title_not_stamped_but_correct():
    src = '<head><title>a &lt; b</title></head>'
    d = pparse(src)
    t = d.select('title').first()
    # synthetic pending end tag carries no source span -> conservative
    assert d.arena.src_close[t.id] == -1
    assert ser(d, t.id) == '<title>a &lt; b</title>'


# ------------------------------------------------------------- invariants

ROUNDTRIP_CORPUS = [
    '<!doctype html><html><head><title>T</title></head><body><p>x</p></body></html>',
    '<div CLASS=A id=b ><P>one<p>two</div>',
    '<table><tr><td>1<td>2<tr><td>3</table>',
    '<p>1<b>2<i>3</b>4</i>5</p>',
    '<ul><li>a<li>b<li>c</ul>done',
    '<div><script>if (a < b) x();</script><style>p>i{}</style></div>',
    '<svg><circle r=1 /></svg><p>after</p>',
    '<form><input name=a value="1"><textarea>t</textarea></form>',
    '<html><body>x</body></html><!--tail-->',
    '<div>&copy; &#169; &AMP; &notareal;</div>',
    '<pre>  spaced\n  lines  </pre>',
    '<div></ bogus></div>',
]


@pytest.mark.parametrize('src', ROUNDTRIP_CORPUS)
def test_nonpretty_raw_output_reparses_to_same_dom(src):
    d = pparse(src)
    out = ser(d)
    d2 = pparse(out)
    assert d2.text() == d.text()
    # canonical serialization of the reparse matches canonical of the
    # original (DOM-equality proxy)
    canon = OutputSettings(pretty_print=False)
    d.arena.source = None   # force full rebuild for canonical form
    d2.arena.source = None
    assert (serialize(d2.arena, 0, canon) == serialize(d.arena, 0, canon))


@pytest.mark.parametrize('src', ROUNDTRIP_CORPUS)
def test_mutated_splice_matches_full_rebuild_semantics(src):
    d = pparse(src)
    for el in d.select('p,li,td,b,div'):
        el.set_attr('m', '1')
        break
    out = ser(d)
    # reference semantics check: reparse(splice) == reparse(full rebuild)
    d_ref = pparse(src)
    for el in d_ref.select('p,li,td,b,div'):
        el.set_attr('m', '1')
        break
    d_ref.arena.source = None  # full tree walk
    rebuilt = ser(d_ref)
    canon = OutputSettings(pretty_print=False)
    a1 = pparse(out); a2 = pparse(rebuilt)
    a1.arena.source = None; a2.arena.source = None
    assert serialize(a1.arena, 0, canon) == serialize(a2.arena, 0, canon)


def test_c_built_arena_raw_parity():
    # api.parse routes through the C builder, which stamps the same
    # close spans as the Python kernel (differential-fuzzed in
    # test_arena_build.py): non-pretty output is source-faithful and
    # byte-identical across both engines
    from swiftsoup_spark.api import parse
    src = '<div id=a ><p CLASS=x>hi</p></div >'
    d = parse(src)
    d.output_settings.pretty_print = False
    assert d.outer_html() == src
    assert d.outer_html() == ser(pparse(src))
    # mutation splices identically too
    d.select('p').first().set_attr('k', 'v')
    dp = pparse(src)
    dp.select('p').first().set_attr('k', 'v')
    assert d.outer_html() == ser(dp)


def test_body_fragment_shell_not_source_verbatim():
    # the shell restructure must not let the document splice path emit
    # the bare fragment source (reference shell docs carry no
    # sourceBuffer); per-node raw slices still engage inside
    from swiftsoup_spark.api import parse_body_fragment
    src = '<span CLASS=orig ><a href="/x">go</a></span>'
    d = parse_body_fragment(src)
    d.output_settings.pretty_print = False
    assert d.outer_html() == (
        '<html><head></head><body>' + src + '</body></html>')


def test_fragment_parse_raw():
    from swiftsoup_spark.kernel.treebuilder import HtmlTreeBuilder
    a, roots = HtmlTreeBuilder().parse_fragment(
        '<b id=x >bold</b> plain', 'div')
    out = OutputSettings(pretty_print=False)
    b = roots[0]
    assert serialize(a, b, out) == '<b id=x >bold</b>'


def test_append_element_marks_dirty():
    # arena.py Element.append_element reaches arena.append_child
    # directly; without mark_dirty the raw document path returned the
    # original source verbatim, silently dropping the new element
    from swiftsoup_spark.api import parse
    d = parse('<html><head></head><body><p>hi</p></body></html>')
    d.output_settings.pretty_print = False
    d.body().append_element('div').set_text('new')
    out = d.outer_html()
    assert '<div>new</div>' in out


def test_foster_parent_invalidates_row_spans():
    # 'X' is foster-parented before the table but lies inside the
    # source spans of tbody AND tr: none of them may raw re-emit
    from swiftsoup_spark.api import parse
    src = ('<table><tbody><tr>X<td>a</td></tr>'
           '<tr><td>b</td></tr></tbody></table>')
    d = parse(src)
    d.output_settings.pretty_print = False
    tr = d.select('tr')[0]
    assert 'X' not in tr.outer_html()
    assert tr.outer_html() == '<tr><td>a</td></tr>'
    # a patch anchored inside the tr must keep the fostered node in
    # the document splice
    d.select('td')[0].set_text('MUT')
    out = d.outer_html()
    assert 'X' in out and 'MUT' in out
    assert out == ('<table><tbody><tr>X<td>MUT</td></tr>'
                   '<tr><td>b</td></tr></tbody></table>')


def test_patched_doc_respects_xml_syntax():
    # _patched_doc must honor the same xml-syntax guard as the
    # per-node raw path: raw HTML bytes are not valid xml output
    from swiftsoup_spark.api import parse
    d = parse('<p>hi<br></p>')
    d.output_settings.pretty_print = False
    d.output_settings.syntax = 'xml'
    assert '<br />' in d.outer_html()
    # and a mutated document must not mix dialects
    d.select('p').first().set_attr('k', 'v')
    out = d.outer_html()
    assert '<br />' in out and 'k="v"' in out
