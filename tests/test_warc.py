"""WARC source (sources/warc.py): byte-level round trip, CC framing,
non-response skipping, corrupt-input bails, and the Spark binaryFile ->
warc_pages -> extract_pages path over real .warc.gz files."""

import gzip
import io
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftsoup_spark.sources.warc import (  # noqa: E402
    build_warc_gz, iter_warc_records, response_pages, warc_pages)

RECS = [("https://a.test/1", "2026-01-01T00:00:00Z", b"<p>one</p>"),
        ("https://b.test/2", "2026-01-01T00:00:01Z",
         "<p>café two</p>".encode()),
        ("https://c.test/3", "2026-01-01T00:00:02Z", b"<p>three</p>")]


def test_roundtrip():
    data = build_warc_gz(RECS)
    got = [(u, d, b) for u, d, b in response_pages(data)]
    assert got == RECS


def test_one_member_per_record():
    # CC framing: N records -> N gzip members, each independently
    # decompressible (what makes per-record random access possible)
    data = build_warc_gz(RECS)
    members = 0
    pos = 0
    import zlib
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        rec = d.decompress(data[pos:])
        assert rec.startswith(b"WARC/1.0\r\n")
        members += 1
        if not d.unused_data:
            break
        pos = len(data) - len(d.unused_data)
    assert members == len(RECS)


def test_plain_warc_and_multi_record_member():
    # the spec also allows many records per member / uncompressed files
    gz = io.BytesIO()
    raw = b""
    for u, d, b in RECS:
        raw += gzip.decompress(build_warc_gz([(u, d, b)]))
    assert [r for r in response_pages(raw)] == RECS          # plain
    with gzip.GzipFile(fileobj=gz, mode="wb", mtime=0) as f:
        f.write(raw)
    assert [r for r in response_pages(gz.getvalue())] == RECS  # 1 member


def test_non_response_records_skipped():
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
            b"Content-Length: 9\r\n\r\nsoftware\n\r\n\r\n")
    gz = io.BytesIO()
    with gzip.GzipFile(fileobj=gz, mode="wb", mtime=0) as f:
        f.write(info)
    data = gz.getvalue() + build_warc_gz(RECS[:1])
    assert len(list(iter_warc_records(data))) == 2
    assert [u for u, _, _ in response_pages(data)] == [RECS[0][0]]


def test_non_200_and_truncated_bail():
    body = b"HTTP/1.1 404 Not Found\r\n\r\nnope"
    rec = ("WARC/1.0\r\nWARC-Type: response\r\n"
           "WARC-Target-URI: https://x.test/\r\n"
           f"Content-Length: {len(body)}\r\n\r\n").encode() + body
    gz = io.BytesIO()
    with gzip.GzipFile(fileobj=gz, mode="wb", mtime=0) as f:
        f.write(rec)
    assert list(response_pages(gz.getvalue())) == []
    # truncated archive: parsed records stop cleanly, no raise
    data = build_warc_gz(RECS)
    assert list(response_pages(data[: len(data) // 2])) in (
        [], [RECS[0]], RECS[:2])
    assert list(response_pages(b"garbage")) == []


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    yield get_spark(master="local[4]", app="warc-test")


def test_binaryfile_to_extraction(spark, tmp_path_factory):
    # the real source path: .warc.gz files on disk -> binaryFile ->
    # warc_pages -> the extraction kernel
    from swiftsoup_spark.spark.extract import extract_pages
    d = tmp_path_factory.mktemp("warc")
    html = ("<html><head><title>W{i}</title></head>"
            "<body><div id=main><p>page {i} text</p></div></body></html>")
    for shard in range(3):
        recs = [(f"https://w.test/{shard}/{i}", "2026-01-01T00:00:00Z",
                 html.format(i=f"{shard}_{i}").encode())
                for i in range(5)]
        (d / f"part-{shard}.warc.gz").write_bytes(build_warc_gz(recs))
    arch = spark.read.format("binaryFile").load(str(d))
    pages = warc_pages(arch)
    out = {r["url"]: (r["text"], r["title"])
           for r in extract_pages(pages).collect()}
    assert len(out) == 15
    assert out["https://w.test/2/4"] == ("W2_4 page 2_4 text", "W2_4")
