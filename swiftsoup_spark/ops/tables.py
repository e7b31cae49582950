"""HTML table extraction to structured rows — tables are the densest
fact payload in a web corpus and structured (row, cells) output is what
table-QA / table-grounding training sets consume.

``doc_tables`` walks a parsed Document: every <table> yields its <tr>
rows (nearest-enclosing-table discipline, so nested tables don't leak
rows into their parent) and every row its direct <th>/<td> cell texts
(whitespace-normalized like ``text()``; colspan cells stay one cell —
documented). The Spark operator runs it in the fused apply_kernel
stage and explodes (url, table_idx, row_idx, cells) with two
posexplodes — structure stays JVM-side arrays, no Python re-entry.
"""

from __future__ import annotations

from pyspark.sql import functions as F, types as T


def doc_tables(doc) -> list[list[list[str]]]:
    """tables -> rows -> cell texts for one parsed Document."""
    arena = doc.arena
    out = []
    for tbl in doc.select("table"):
        rows = []
        for tr in tbl.select("tr"):
            # nearest enclosing table must be THIS table (nested tables
            # emit their own rows, not their ancestors')
            anc = tr.parent()
            while anc is not None and anc.tag_name != "table":
                anc = anc.parent()
            if anc is None or anc.id != tbl.id:
                continue
            cells = [c.text() for c in tr.children()
                     if c.tag_name in ("th", "td")]
            rows.append(cells)
        out.append(rows)
    return out


TABLES_FIELD = T.StructField(
    "tables", T.ArrayType(T.ArrayType(T.ArrayType(T.StringType()))))


def extract_tables(pages_df):
    """pages(url, html) -> (url, table_idx, row_idx, cells) exploded
    table rows."""
    from swiftsoup_spark.spark.extract import apply_kernel

    def row(tb, s):
        from swiftsoup_spark.api import parse
        return (doc_tables(parse(s)),)

    per_doc = apply_kernel(pages_df, row, [TABLES_FIELD])
    t = per_doc.select(
        "url", F.posexplode("tables").alias("table_idx", "rows"))
    return (t.select("url", F.col("table_idx").cast("int").alias("table_idx"),
                     F.posexplode("rows").alias("row_idx", "cells"))
            .select("url", "table_idx",
                    F.col("row_idx").cast("int").alias("row_idx"), "cells"))
