"""Charset detection (reference DataUtil/Document charset handling):
BOM, <meta charset>, http-equiv content-type, UTF-8 default."""

from swiftsoup_spark.api import decode_html, parse


def test_utf8_default():
    assert decode_html("héllo".encode("utf-8")) == "héllo"


def test_bom_utf8():
    assert decode_html(b"\xef\xbb\xbf<p>hi</p>") == "<p>hi</p>"


def test_bom_utf16():
    data = "<p>hi</p>".encode("utf-16")
    assert decode_html(data) == "<p>hi</p>"


def test_meta_charset():
    html = '<html><head><meta charset="shift_jis"></head><body>こんにちは</body></html>'
    data = html.encode("shift_jis")
    assert "こんにちは" in decode_html(data)


def test_meta_http_equiv():
    html = ('<html><head><meta http-equiv="Content-Type" '
            'content="text/html; charset=gb2312"></head><body>你好</body></html>')
    data = html.encode("gb2312")
    doc = parse(data)
    assert doc.text() == "你好"


def test_malformed_meta_charset():
    # charset in malformed meta (HtmlParserTest testfindsCharsetInMalformedMeta)
    doc = parse("<meta http-equiv=Content-Type content=text/html; charset=gb2312>")
    assert doc.select("meta")[0].attr("charset") == "gb2312"


def test_invalid_bytes_replaced():
    data = b"<html><body>ok \xff</body></html>"
    doc = parse(data)
    assert "ok" in doc.text()


def test_unknown_charset_falls_back():
    data = b'<meta charset="not-a-charset"><p>x</p>'
    assert "<p>x</p>" in decode_html(data)
