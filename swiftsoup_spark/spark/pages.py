"""Deterministic Common-Crawl-style ``pages`` table synthesizer.

The north rule's input is an Iceberg table
``(url string, warc_ts timestamp, html binary, text string, lang string)``.
This module derives it deterministically from the driver-provided
``documents`` table with ONE shared SQL expression that both Spark SQL and
DuckDB evaluate identically — so every extraction query has a closed-form
ANSI-SQL oracle over the same parquet inputs (no external data, seed-free).

Template (np = 1 + doc_id % 4 identical paragraphs):

  <html><head><meta charset="utf-8"><title>Doc {id} &amp; friends</title>
  </head><body><div id="main" class="content article"><h1>Doc {id}</h1>
  <p>{text}</p> × np
  </div><div class="nav footer"><a href="/l/{id}" class="next">next &gt;</a>
  </div></body></html>

The static parts exercise entity decoding (&amp;, &gt;), attribute parsing,
id/class selectors, and block-boundary text joins.
"""

from __future__ import annotations

# epoch seconds of 2026-01-01T00:00:00Z
TS0 = 1767225600

# Common-dialect SQL fragments (valid in Spark SQL and DuckDB).
URL_SQL = "'https://' || source || '.docs.test/' || lang || '/p' || doc_id"
NP_SQL = "(1 + doc_id % 4)"
HTML_SQL = (
    "'<html><head><meta charset=\"utf-8\"><title>Doc ' || doc_id || "
    "' &amp; friends</title></head><body>"
    "<div id=\"main\" class=\"content article\"><h1>Doc ' || doc_id || '</h1>' || "
    f"repeat('<p>' || text || '</p>', {NP_SQL}) || "
    "'</div><div class=\"nav footer\"><a href=\"/l/' || doc_id || "
    "'\" class=\"next\">next &gt;</a></div></body></html>'"
)

# Expected-value fragments (the oracle side of the extraction contract).
# text in the documents table is single-space-normalized already; the
# kernel's whitespace rules therefore reduce to these concatenations.
EXPECTED_MAIN_TEXT_SQL = (
    f"'Doc ' || doc_id || ' ' || trim(repeat(text || ' ', {NP_SQL}))"
)
EXPECTED_DOC_TEXT_SQL = (
    "'Doc ' || doc_id || ' & friends Doc ' || doc_id || ' ' || "
    f"trim(repeat(text || ' ', {NP_SQL})) || ' next >'"
)
EXPECTED_TITLE_SQL = "'Doc ' || doc_id || ' & friends'"


def pages_select(docs_table: str = "documents", html_as: str = "string") -> str:
    """SELECT statement producing the pages table from ``documents``.

    ``html_as='binary'`` wraps html in an engine-appropriate cast (Spark);
    the oracle never needs the binary form.
    """
    html = HTML_SQL
    if html_as == "binary":
        html = f"encode({HTML_SQL}, 'utf-8')"
    return (
        f"SELECT {URL_SQL} AS url, "
        f"{TS0} + doc_id AS ts_epoch, "
        f"{html} AS html, "
        f"text, lang, doc_id, source "
        f"FROM {docs_table}"
    )


def load_documents(spark, sf_dir: str, repartition: bool = True):
    """Register the documents view. The parquet is a single small file →
    one input split; repartition the tiny base BEFORE the html synthesis
    fans out, so downstream parse work spreads across all cores without
    shuffling the synthesized bytes."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if repartition:
        df = df.repartition(spark.sparkContext.defaultParallelism * 2, "doc_id")
    df.createOrReplaceTempView("documents")
    return df


def pages_df(spark, sf_dir: str, html_as: str = "string"):
    """The synthesized pages DataFrame (deterministic, distributed)."""
    load_documents(spark, sf_dir)
    return spark.sql(pages_select("documents", html_as=html_as))


# --- oracle-corpus variant templates ---------------------------------------
# Each variant exercises a parser subsystem that the primary template does
# not, with a CLOSED-FORM expected-text SQL both Spark SQL and DuckDB
# evaluate identically — turning pytest-only parity (tables/foster
# parenting, adoption agency, pre/br/nbsp, entity-heavy attrs) into hard
# driver CORRECTNESS rows. (reference parity: HtmlParserTest.swift:609,
# 632, 661; ElementTest.swift:56-114)
VARIANT_TEMPLATES = {
    # text inside <table> is foster-parented BEFORE the table; cells join
    # with block spaces (since round 2 the C fast path handles fostering
    # natively — fz_begin/fz_end in _fastpath.c — so this variant rides
    # the C path end to end)
    "tables": (
        "'<html><head><title>T ' || doc_id || '</title></head><body>"
        "<table>FOST' || doc_id || '<tr><td>A ' || text || '</td>"
        "<td>B' || doc_id || '</td></tr></table><p>after</p></body></html>'",
        "'T ' || doc_id || ' FOST' || doc_id || ' A ' || text || ' B' ||"
        " doc_id || ' after'"),
    # well-formed table (caption/thead/tbody/th/td, no fostered content):
    # stays on the C fast path's native table insertion modes
    # (InTable..InCell) — the driver gate thereby exercises BOTH table
    # code paths: 'tables' → foster bail→Python kernel, 'tables_clean' →
    # C table modes
    "tables_clean": (
        "'<html><head><title>T ' || doc_id || '</title></head><body>"
        "<table><caption>Cap ' || doc_id || '</caption>"
        "<thead><tr><th>H1</th><th>H2</th></tr></thead>"
        "<tbody><tr><td>A ' || text || '</td><td>B' || doc_id || '</td></tr>"
        "<tr><td colspan=\"2\">C' || doc_id || '</td></tr></tbody></table>"
        "<p>after</p></body></html>'",
        "'T ' || doc_id || ' Cap ' || doc_id || ' H1 H2 A ' || text ||"
        " ' B' || doc_id || ' C' || doc_id || ' after'"),
    # misnested <b><i></b></i> triggers the adoption-agency repair;
    # extracted text stays in source order
    "misnested": (
        "'<html><body><p><b>Bold ' || doc_id || ' <i>both</b> italic ' ||"
        " text || '</i></p><p>plain</p></body></html>'",
        "'Bold ' || doc_id || ' both italic ' || text || ' plain'"),
    # <pre> preserves interior whitespace/newlines (leading run trimmed by
    # the final text() trim); <br> and &nbsp; normalize to single spaces
    "pre": (
        "'<html><body><pre>  line1' || chr(10) || '  line2 ' || doc_id ||"
        " '</pre><p>a<br>b&nbsp;' || text || '</p></body></html>'",
        "'line1' || chr(10) || '  line2 ' || doc_id || ' a b ' || text"),
    # inline SVG subtree (ubiquitous on modern pages): parsed through the
    # generic insert at full reference parity (the reference's
    # ForeignContent body is a stub — HtmlTreeBuilderState.swift:2436);
    # svg is a block, its <title> is rcdata, unknown children are inline
    "svg": (
        "'<html><body><p>pre ' || doc_id || '</p>"
        "<svg viewBox=\"0 0 10 10\"><title>icon</title>"
        "<circle cx=\"5\"></circle><text x=\"1\">lbl ' || doc_id ||"
        " '</text></svg><p>post ' || text || '</p></body></html>'",
        "'pre ' || doc_id || ' iconlbl ' || doc_id || ' post ' || text"),
    # charset detection through the binary-html decode gate
    # (api.decode_html: BOM strip on even rows, <meta charset> sniff +
    # ISO-8859-1 decode on odd rows — reference DataUtil/Document charset
    # handling). The only variant whose html column is BINARY; é round-
    # trips through both encodings.
    "charset": (
        "CASE WHEN doc_id % 2 = 0 THEN concat(unhex('EFBBBF'), encode("
        "'<html><head><title>B ' || doc_id || '</title></head><body>"
        "<p>café ' || text || '</p></body></html>', 'UTF-8')) "
        "ELSE encode('<html><head><meta charset=\"iso-8859-1\">"
        "<title>L ' || doc_id || '</title></head><body><p>café ' || text ||"
        " '</p></body></html>', 'ISO-8859-1') END",
        "CASE WHEN doc_id % 2 = 0 THEN 'B ' ELSE 'L ' END || doc_id ||"
        " ' café ' || text"),
    # multi-level heading structure (h1/h2/h3 with text between) for the
    # outline operator (ops/outline.py); also a plain extract-text corpus
    "headings": (
        "'<html><body><h1>Doc ' || doc_id || '</h1><h2>Intro</h2><p>' ||"
        " text || '</p><h2>Body ' || doc_id || '</h2><h3>Deep</h3><p>' ||"
        " text || '</p><h2>End</h2></body></html>'",
        "'Doc ' || doc_id || ' Intro ' || text || ' Body ' || doc_id ||"
        " ' Deep ' || text || ' End'"),
    # head-section governance metadata (canonical/robots/OpenGraph) for
    # ops/pagemeta.py; canonical is relative on odd docs (absUrl path),
    # robots content varies and includes the 'none' shorthand
    "headmeta": (
        "'<html><head>"
        "<link rel=\"canonical\" href=\"' || CASE WHEN doc_id % 3 = 0 "
        "THEN 'https://canon.test/c' || doc_id "
        "ELSE '/c' || doc_id END || '\">"
        "<meta name=\"robots\" content=\"' || CASE CAST(doc_id % 4 AS INT) "
        "WHEN 0 THEN 'index, follow' WHEN 1 THEN 'NoIndex , follow' "
        "WHEN 2 THEN 'index,nofollow' ELSE 'none' END || '\">"
        "<meta property=\"og:title\" content=\"OG ' || doc_id || '\">"
        "<meta property=\"og:type\" content=\"article\">"
        "</head><body><p>' || text || '</p></body></html>'",
        "'' || text"),
    # schema.org structured data: a JSON-LD script (absent on doc_id%5=4
    # pages — the null path), plus a microdata itemscope whose itemprop
    # values exercise both value sources (element text AND meta@content).
    # script data is a DataNode, excluded from text() (expected text
    # proves it); the head/body JSON braces are literal SQL text.
    "structdata": (
        "'<html><head><title>S ' || doc_id || '</title>' || "
        "CASE WHEN doc_id % 5 = 4 THEN '' ELSE "
        "'<script type=\"application/ld+json\">"
        "{\"@type\":\"Article\",\"headline\":\"Doc ' || doc_id || '\","
        "\"wordCount\":' || (doc_id % 97) || ',"
        "\"author\":{\"@type\":\"Person\",\"name\":\"A' || (doc_id % 7) ||"
        " '\"}}</script>' END || "
        "'</head><body>"
        "<div itemscope itemtype=\"https://schema.org/Product\">"
        "<span itemprop=\"name\">P ' || doc_id || '</span>"
        "<meta itemprop=\"sku\" content=\"SKU-' || doc_id || '\">"
        "<span itemprop=\"price\">' || (doc_id % 50) || '</span></div>"
        "<p>' || text || '</p></body></html>'",
        "'S ' || doc_id || ' P ' || doc_id || ' ' || (doc_id % 50) ||"
        " ' ' || text"),
    # entity decoding in text AND attribute values (&amp; &lt; &gt; &quot;
    # &nbsp;)
    "entities": (
        "'<html><body><a href=\"/x?a=1&amp;b=2\" title=\"T&quot;q\">L&lt;' ||"
        " doc_id || '&gt; &amp;&nbsp;' || text || '</a></body></html>'",
        "'L<' || doc_id || '> & ' || text"),
}


def variant_pages_df(spark, sf_dir: str, name: str):
    """(url, html) pages for one oracle-corpus variant template."""
    load_documents(spark, sf_dir)
    html_sql, _ = VARIANT_TEMPLATES[name]
    return spark.sql(
        f"SELECT {URL_SQL} AS url, {html_sql} AS html FROM documents")


def variant_oracle_sql(name: str) -> str:
    """DuckDB oracle for the variant's extracted text."""
    _, exp_sql = VARIANT_TEMPLATES[name]
    return f"SELECT {URL_SQL} AS url, {exp_sql} AS text FROM documents"
