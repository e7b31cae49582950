"""SQL-callable kernel functions (SURVEY §4.3: the optional
FunctionCatalog sugar): after ``register_sql_functions(spark)``, SQL
users can call the extraction kernel without touching the DataFrame
API::

    SELECT url, html_text(html) AS text FROM pages
    SELECT html_select_text(html, 'div#main p') FROM pages
    SELECT html_clean(body, 'basic') FROM fragments

All functions are ``pandas_udf`` Series->Series kernels: one Python
invocation per Arrow batch, never per row. ``html_text``/``html_title``
route the whole batch through the C streaming extractor
(``fastpath.batch_doc_text`` — the same zero-copy Arrow-buffer path
``spark/extract.py`` uses) with per-document Python-kernel fallback on
bail-out; the selector/clean functions run the full kernel per document
inside the batch loop (selector compilation is LRU-cached per worker).
"""

import pandas as pd


def _batch_text_title(series, which: int):
    """Series[html] -> Series[text|title] via the batched C fast path.
    ``which``: 0 = text, 1 = title."""
    import pyarrow as pa

    from swiftsoup_spark.kernel.fastpath import batch_doc_text, doc_text

    def slow(h):
        from swiftsoup_spark.api import parse
        h = h or ""
        r = doc_text(h)
        if r is not None:
            return r[which]
        d = parse(h)
        return d.text() if which == 0 else d.title()

    s = series.fillna("")
    try:
        arr = pa.Array.from_pandas(s, type=pa.string())
    except pa.ArrowInvalid:
        arr = None
    if arr is not None:
        br = batch_doc_text(arr)
        if br is not None:
            out_arr, bail_idx = br[which], br[2]
            out = out_arr.to_pandas()
            out.index = s.index
            for i in bail_idx:
                out.iat[i] = slow(s.iat[i])
            return out
    return pd.Series([slow(h) for h in s], index=s.index)


def register_sql_functions(spark):
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.StringType())
    def html_text(html: pd.Series) -> pd.Series:
        return _batch_text_title(html, 0)

    @pandas_udf(T.StringType())
    def html_title(html: pd.Series) -> pd.Series:
        return _batch_text_title(html, 1)

    @pandas_udf(T.ArrayType(T.StringType()))
    def html_select_text(html: pd.Series, css: pd.Series) -> pd.Series:
        from swiftsoup_spark.api import parse
        return pd.Series(
            [[el.text() for el in parse(h or "").select(c or "*")]
             for h, c in zip(html, css)], index=html.index)

    @pandas_udf(T.ArrayType(T.StringType()))
    def html_select_attr(html: pd.Series, css: pd.Series,
                         attr: pd.Series) -> pd.Series:
        from swiftsoup_spark.api import parse
        return pd.Series(
            [[el.attr(a) for el in parse(h or "").select(c or "*")]
             for h, c, a in zip(html, css, attr)], index=html.index)

    @pandas_udf(T.StringType())
    def html_clean(html: pd.Series, whitelist: pd.Series) -> pd.Series:
        from swiftsoup_spark.clean.cleaner import clean_html
        return pd.Series(
            [clean_html(h or "", w or "basic")
             for h, w in zip(html, whitelist)], index=html.index)

    udfs = {"html_text": html_text, "html_title": html_title,
            "html_select_text": html_select_text,
            "html_select_attr": html_select_attr, "html_clean": html_clean}
    for name, fn in udfs.items():
        spark.udf.register(name, fn)
    return udfs
