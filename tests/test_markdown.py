"""DOM → Markdown (ops/markdown.py): element battery, nesting,
whitespace discipline, and skip rules."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftsoup_spark.api import parse  # noqa: E402
from swiftsoup_spark.ops.markdown import markdown_of  # noqa: E402


CASES = [
    ('<body><h1>Title</h1><p>Hello <b>bold</b> and <i>it</i>.</p></body>',
     '# Title\n\nHello **bold** and *it*.'),
    ('<h6>deep</h6>', '###### deep'),
    ('<p>See <a href="/x">link text</a> now</p>',
     'See [link text](/x) now'),
    # anchors with no href degrade to text
    ('<p><a name="top">plain</a></p>', 'plain'),
    ('<ul><li>one</li><li>two <b>b</b></li></ul><p>after</p>',
     '- one\n- two **b**\n\nafter'),
    ('<ol><li>first</li><li>second</li></ol>', '1. first\n1. second'),
    ('<ul><li>a<ul><li>nested</li></ul></li></ul>', '- a\n  - nested'),
    ('<pre>  raw\n  text</pre>', '```\n  raw\n  text\n```'),
    ('<pre>\nlead newline dropped</pre>', '```\nlead newline dropped\n```'),
    ('<p>inline <code>x = 1</code> code</p>', 'inline `x = 1` code'),
    ('<blockquote><p>quoted</p><p>more</p></blockquote>',
     '> quoted\n\n> more'),
    ('<p>a</p><hr><p>b</p>', 'a\n\n---\n\nb'),
    ('<p><img src="/i.png" alt="pic"> done</p>', '![pic](/i.png) done'),
    ('<p><img src="/i.png"></p>', '![](/i.png)'),
    ('<p>line one<br>line two</p>', 'line one\\\nline two'),
    ('<h2>Sub</h2><div><p>para</p></div>', '## Sub\n\npara'),
    # script/style content never leaks; text nodes join like text()
    ('<p>skip<script>bad()</script>ped</p>', 'skipped'),
    ('<style>p{}</style><p>x</p>', 'x'),
    # whitespace-only content collapses away
    ('<div> \n\t </div><p>only</p>', 'only'),
    # table content flattens to text blocks (documented subset)
    ('<table><tr><td>A</td><td>B</td></tr></table>', 'A B'),
]


@pytest.mark.parametrize("html,want", CASES)
def test_markdown(html, want):
    assert markdown_of(parse(html)) == want


def test_pages_template_closed_form():
    # mirrors the driver oracle: the synthesized page template has a
    # closed-form markdown
    html = ('<html><head><meta charset="utf-8"><title>Doc 7 &amp; friends'
            '</title></head><body><div id="main" class="content article">'
            '<h1>Doc 7</h1><p>some text</p><p>some text</p></div>'
            '<div class="nav footer"><a href="/l/7" class="next">'
            'next &gt;</a></div></body></html>')
    assert markdown_of(parse(html)) == (
        '# Doc 7\n\nsome text\n\nsome text\n\n[next >](/l/7)')
