"""Page-level metadata governance extraction.

Three head-section signals every crawl pipeline extracts before any
content decision (reference parity: these are ordinary ``select()`` +
``attr()`` operations — Element.swift attribute access + the selector
engine — composed into one kernel pass per concern):

* canonical URL — ``link[rel=canonical]`` href resolved against the
  document base (Node.absUrl semantics), the key for canonical-group
  dedup upstream of ``ops/urlnorm``;
* robots directives — ``meta[name=robots]`` content tokenized on
  commas, case-insensitive, whitespace-tolerant (the RFC 9309
  companion convention): noindex/nofollow booleans;
* OpenGraph pairs — ``meta[property^="og:"]`` (property, content)
  rows in document order, the de-facto social/preview metadata.

All three are fused scan→kernel stages (apply_kernel / mapInArrow):
no shuffle, no Python outside the Arrow batch."""

from __future__ import annotations

from pyspark.sql import functions as F, types as T


def page_directives(pages_df, in_col: str = "html",
                    keep_cols: tuple = ("url",)):
    """-> (keep_cols..., canonical string|null, noindex bool,
    nofollow bool): one row per page."""
    from swiftsoup_spark.spark.extract import apply_kernel, fast_parse

    def row(tb, s, base_url):
        from swiftsoup_spark.kernel.arena import Element
        from swiftsoup_spark.select.engine import select as sel

        arena = fast_parse(tb, s)
        if not arena.base_uri:        # no <base href> -> page url is base
            arena.base_uri = base_url or ""
        canon = None
        ids = sel(arena, 0, 'link[rel=canonical]')
        if ids:
            canon = Element(arena, ids[0]).abs_url("href") or None
        noindex = nofollow = False
        for i in sel(arena, 0, 'meta[name=robots]'):
            content = (arena.attrs[i] or {}).get("content") or ""
            toks = {t.strip().lower() for t in content.split(",")}
            noindex = noindex or "noindex" in toks or "none" in toks
            nofollow = nofollow or "nofollow" in toks or "none" in toks
        return canon, noindex, nofollow

    return apply_kernel(
        pages_df, row,
        [T.StructField("canonical", T.StringType()),
         T.StructField("noindex", T.BooleanType()),
         T.StructField("nofollow", T.BooleanType())],
        in_col=in_col, keep_cols=keep_cols, ctx_col="url")


def og_meta(pages_df, in_col: str = "html", keep_cols: tuple = ("url",)):
    """-> (keep_cols..., idx int, prop string, content string): one row
    per og:* meta tag in document order."""
    from swiftsoup_spark.spark.extract import apply_kernel, fast_parse

    def row(tb, s):
        from swiftsoup_spark.select.engine import select as sel

        arena = fast_parse(tb, s)
        props, contents = [], []
        for i in sel(arena, 0, 'meta[property^="og:"]'):
            a = arena.attrs[i] or {}
            props.append(a.get("property") or "")
            contents.append(a.get("content") or "")
        return props, contents

    out = apply_kernel(
        pages_df, row,
        [T.StructField("props", T.ArrayType(T.StringType())),
         T.StructField("contents", T.ArrayType(T.StringType()))],
        in_col=in_col, keep_cols=keep_cols)
    z = F.arrays_zip(F.col("props"), F.col("contents"))
    return (out.select(*keep_cols, F.posexplode(z).alias("idx", "z"))
            .select(*keep_cols, "idx",
                    F.col("z.props").alias("prop"),
                    F.col("z.contents").alias("content")))
