"""SQL-callable kernel functions (SURVEY §4.3: the optional
FunctionCatalog sugar): after ``register_sql_functions(spark)``, SQL
users can call the extraction kernel without touching the DataFrame
API::

    SELECT url, html_text(html) AS text FROM pages
    SELECT html_select_text(html, 'div#main p') FROM pages
    SELECT html_clean(body, 'basic') FROM fragments

All functions are Arrow-optimized Python UDFs (batched over Arrow,
not row-pickled); ``html_text``/``html_title`` ride the C fast path
with per-document fallback, the selector/clean functions run the full
kernel."""

from __future__ import annotations


def register_sql_functions(spark) -> None:
    from pyspark.sql import types as T
    from pyspark.sql.functions import udf

    def _parse(html):
        from swiftsoup_spark.api import parse
        return parse(html if html is not None else "")

    def html_text(html: str) -> str:
        from swiftsoup_spark.kernel.fastpath import doc_text
        r = doc_text(html or "")
        if r is not None:
            return r[0]
        return _parse(html).text()

    def html_title(html: str) -> str:
        from swiftsoup_spark.kernel.fastpath import doc_text
        r = doc_text(html or "")
        if r is not None:
            return r[1]
        return _parse(html).title()

    def html_select_text(html: str, css: str) -> list:
        d = _parse(html)
        return [el.text() for el in d.select(css or "*")]

    def html_select_attr(html: str, css: str, attr: str) -> list:
        d = _parse(html)
        return [el.attr(attr) for el in d.select(css or "*")]

    def html_clean(html: str, whitelist: str) -> str:
        from swiftsoup_spark.clean.cleaner import clean_html
        return clean_html(html or "", whitelist or "basic")

    spark.udf.register(
        "html_text", udf(html_text, T.StringType(), useArrow=True))
    spark.udf.register(
        "html_title", udf(html_title, T.StringType(), useArrow=True))
    spark.udf.register(
        "html_select_text",
        udf(html_select_text, T.ArrayType(T.StringType()), useArrow=True))
    spark.udf.register(
        "html_select_attr",
        udf(html_select_attr, T.ArrayType(T.StringType()), useArrow=True))
    spark.udf.register(
        "html_clean", udf(html_clean, T.StringType(), useArrow=True))
