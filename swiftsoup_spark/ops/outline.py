"""Document structure outputs: heading outline rows.

A training/retrieval pipeline wants per-document structure, not just a
text blob: the h1-h6 outline in document order drives section-aware
chunking, title-path metadata for retrieval contexts, and structure
quality filters (no-heading pages, heading spam).  One fused kernel
pass (parse once, one selector evaluation) emits parallel
(level, text) arrays; the row explosion is a JVM-side ``posexplode``
of ``arrays_zip`` — no second parse, no Python in the explode.

Reference parity: the outline is ``select("h1,h2,h3,h4,h5,h6")`` in
Collector document order (reference Collector.swift DFS order) with
``Element.text()`` per heading (Element.swift:1705); levels come from
the tag name."""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

_HEADINGS_CSS = "h1,h2,h3,h4,h5,h6"


def headings_outline(pages_df, in_col: str = "html",
                     keep_cols: tuple = ("url",)):
    """-> (keep_cols..., idx int, level int, text string): one row per
    heading element in document order.  Pages without headings emit no
    rows (posexplode of an empty zip)."""
    from swiftsoup_spark.spark.extract import apply_kernel, fast_parse

    def row(tb, s):
        from swiftsoup_spark.select.engine import select as sel

        arena = fast_parse(tb, s)
        ids = sel(arena, 0, _HEADINGS_CSS)
        return ([int(arena.tag_name(i)[1]) for i in ids],
                [arena.node_text(i) for i in ids])

    out = apply_kernel(
        pages_df, row,
        [T.StructField("levels", T.ArrayType(T.IntegerType())),
         T.StructField("texts", T.ArrayType(T.StringType()))],
        in_col=in_col, keep_cols=keep_cols)
    z = F.arrays_zip(F.col("levels"), F.col("texts"))
    return (out.select(*keep_cols, F.posexplode(z).alias("idx", "z"))
            .select(*keep_cols, "idx",
                    F.col("z.levels").alias("level"),
                    F.col("z.texts").alias("text")))
