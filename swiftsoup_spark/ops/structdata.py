"""schema.org structured-data extraction (JSON-LD + HTML microdata).

Two page-metadata surfaces every knowledge/commerce crawl pipeline
extracts (reference parity: both are ordinary selector + attribute /
data-node reads — SwiftSoup's ``select()``, ``Element.data()`` for
script bodies, ``attr()`` — composed per concern; the JSON decode then
happens JVM-side, never in Python):

* **JSON-LD** — ``script[type="application/ld+json"]`` bodies. The
  kernel pass only *lifts* the raw JSON string out of the DOM (script
  content is a DataNode, invisible to text()); field extraction is
  Catalyst ``get_json_object`` on the lifted column, so the JSON parse
  runs inside whole-stage codegen and the Arrow batch carries one
  string per page, not a parsed tree.
* **Microdata** — ``[itemprop]`` elements resolved to their NEAREST
  ``[itemscope]`` ancestor (the HTML microdata ownership rule), with
  per-tag value sources: meta→content, a/link→href, img/audio/video/
  embed/source→src, time→datetime, data→value, else element text.
  Emitted as (item_idx, prop_idx, itemtype, prop, value) rows in
  document order via one JVM posexplode.

Both are fused scan→kernel stages (apply_kernel / mapInArrow): no
shuffle, no Python outside the Arrow batch, output linear in the
number of annotated nodes.
"""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

__all__ = ["jsonld_raw", "jsonld_fields", "microdata_items"]

_LD_SEL = 'script[type="application/ld+json"]'

# microdata value source by tag (HTML spec 5.2.5 "values")
_ATTR_SOURCE = {
    "meta": "content", "a": "href", "link": "href", "area": "href",
    "img": "src", "audio": "src", "video": "src", "embed": "src",
    "iframe": "src", "source": "src", "track": "src",
    "time": "datetime", "data": "value", "meter": "value",
}


def jsonld_raw(pages_df, in_col: str = "html", keep_cols: tuple = ("url",)):
    """-> (keep_cols..., ld_json string|null): the first JSON-LD script
    body per page, raw."""
    from swiftsoup_spark.spark.extract import apply_kernel, fast_parse

    def row(tb, s):
        from swiftsoup_spark.kernel.arena import Element
        from swiftsoup_spark.select.engine import select as sel

        arena = fast_parse(tb, s)
        ids = sel(arena, 0, _LD_SEL)
        if not ids:
            return (None,)
        return (Element(arena, ids[0]).data(),)

    return apply_kernel(
        pages_df, row, [T.StructField("ld_json", T.StringType())],
        in_col=in_col, keep_cols=keep_cols)


def jsonld_fields(pages_df, in_col: str = "html",
                  keep_cols: tuple = ("url",)):
    """-> (keep_cols..., ld_type, headline, word_count, author): typed
    Article fields off the JSON-LD blob, all-null when absent."""
    j = F.col("ld_json")
    return (jsonld_raw(pages_df, in_col, keep_cols)
            .select(*keep_cols,
                    F.get_json_object(j, "$['@type']").alias("ld_type"),
                    F.get_json_object(j, "$.headline").alias("headline"),
                    F.get_json_object(j, "$.wordCount").cast("long")
                    .alias("word_count"),
                    F.get_json_object(j, "$.author.name").alias("author")))


def microdata_items(pages_df, in_col: str = "html",
                    keep_cols: tuple = ("url",)):
    """-> (keep_cols..., item_idx, prop_idx, itemtype, prop, value):
    one row per itemprop, grouped under its nearest itemscope ancestor,
    document order on both indexes."""
    from swiftsoup_spark.spark.extract import apply_kernel, fast_parse

    def row(tb, s):
        from swiftsoup_spark.kernel.arena import Element
        from swiftsoup_spark.select.engine import select as sel

        arena = fast_parse(tb, s)
        scopes = sel(arena, 0, "[itemscope]")
        order = {nid: idx for idx, nid in enumerate(scopes)}
        items, props, values = [], [], []
        for nid in sel(arena, 0, "[itemprop]"):
            p = arena.parent[nid]
            while p > 0 and p not in order:
                p = arena.parent[p]
            if p not in order:
                continue          # itemprop outside any itemscope: skip
            a = arena.attrs[nid] or {}
            src = _ATTR_SOURCE.get(arena.tag_name(nid))
            if src is not None:
                val = a.get(src) or ""
            else:
                val = Element(arena, nid).text()
            items.append(order[p])
            props.append(a.get("itemprop") or "")
            values.append(val)
        types = [(arena.attrs[s] or {}).get("itemtype") or "" for s in scopes]
        return ([types[i] for i in items], items, props, values)

    arr = T.ArrayType
    out = apply_kernel(
        pages_df, row,
        [T.StructField("itypes", arr(T.StringType())),
         T.StructField("iidx", arr(T.IntegerType())),
         T.StructField("props", arr(T.StringType())),
         T.StructField("vals", arr(T.StringType()))],
        in_col=in_col, keep_cols=keep_cols)
    z = F.arrays_zip(F.col("itypes"), F.col("iidx"),
                     F.col("props"), F.col("vals"))
    return (out.select(*keep_cols, F.posexplode(z).alias("prop_idx", "z"))
            .select(*keep_cols,
                    F.col("z.iidx").cast("long").alias("item_idx"),
                    F.col("prop_idx").cast("long"),
                    F.col("z.itypes").alias("itemtype"),
                    F.col("z.props").alias("prop"),
                    F.col("z.vals").alias("value")))
