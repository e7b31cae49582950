"""Arrow-batched extraction kernels: the Spark-facing physical operators.

Every operator here is a ``mapInArrow`` stage: the per-document kernel
(tokenize -> tree-build -> select/extract/clean) runs inside Arrow
record batches — the "vectorized pandas/Arrow UDF, never per-row
Python" contract of the north star, minus even the pandas Series
materialization (measured ~2x overhead on megabyte string columns, so
all paths use raw Arrow batches; commit 7be95ce's finding applied
everywhere).

Selector compilation happens ONCE per worker process (driver-side
string -> broadcast by closure -> compiled lazily and cached by
``parse_query``'s LRU), mirroring the reference's QueryParser cache.
"""

from pyspark.sql import functions as F, types as T

SPAN_SCHEMA = T.ArrayType(T.StructType([
    T.StructField("node", T.IntegerType()),
    T.StructField("start", T.LongType()),
    T.StructField("end", T.LongType()),
]))


def _to_str(v) -> str:
    if v is None:
        return ""
    if isinstance(v, (bytes, bytearray)):
        from swiftsoup_spark.api import decode_html
        return decode_html(bytes(v))
    return v


def fast_parse(tb, s: str, track_spans: bool = False):
    """Full DOM build for the selector/clean/metrics operators: the C
    arena builder (kernel/fastpath.build_arena, byte-identical to the
    Python kernel, differential-fuzzed) with per-document fallback to
    ``tb.parse`` on bail-out."""
    from swiftsoup_spark.kernel.fastpath import build_arena
    arena = build_arena(s, track_spans=track_spans)
    return arena if arena is not None else tb.parse(s)


def apply_kernel(df, row_fn, out_fields, in_col="html", keep_cols=("url",),
                 track_spans=False, ctx_col=None):
    """Generic Arrow-batched kernel stage.

    ``row_fn(tree_builder, html_str) -> tuple`` runs per document inside
    ``mapInArrow``; its results become the ``out_fields`` columns
    appended to ``keep_cols``. One fused stage pipelined with the scan
    (no shuffle, no pandas); Catalyst prunes the scan to
    (keep_cols, in_col).

    ``ctx_col``: name of a keep column whose per-row value is passed as
    a third argument — ``row_fn(tb, s, ctx)`` — e.g. the page url as
    the document base URI for absUrl resolution.
    """
    import pyarrow as pa

    src = df.select(*keep_cols, in_col)
    keep_fields = [f for f in src.schema.fields if f.name != in_col]
    out_schema = T.StructType(keep_fields + list(out_fields))
    keep_names = [f.name for f in keep_fields]
    out_names = [f.name for f in out_schema.fields]

    def batches(it):
        from pyspark.sql.pandas.types import to_arrow_type
        from swiftsoup_spark.kernel.treebuilder import HtmlTreeBuilder

        tb = HtmlTreeBuilder(track_spans=track_spans)
        out_types = [to_arrow_type(f.dataType) for f in out_fields]
        for batch in it:
            cols = [[] for _ in out_fields]
            ctx = batch.column(ctx_col) if ctx_col is not None else None
            for i, raw in enumerate(batch.column(in_col)):
                if ctx is None:
                    vals = row_fn(tb, _to_str(raw.as_py()))
                else:
                    vals = row_fn(tb, _to_str(raw.as_py()), ctx[i].as_py())
                for c, v in zip(cols, vals):
                    c.append(v)
            arrays = [batch.column(nm) for nm in keep_names] + [
                pa.array(c, t) for c, t in zip(cols, out_types)]
            yield pa.RecordBatch.from_arrays(arrays, out_names)

    return src.mapInArrow(batches, out_schema)


def select_over(df, css: str, mode: str = "text", out_col: str = "vals",
                in_col: str = "html", keep_cols=("url",)):
    """-> (keep_cols..., out_col: array<string>) of per-match values in
    document order. mode: 'text' | 'own_text' | 'outer_html' | 'tag' |
    'attr:<key>' | 'abs:<key>' (absolute URL resolved against the
    document base, reference Node.absUrl)."""
    attr_key = mode[5:] if mode.startswith("attr:") else None
    abs_key = mode[4:] if mode.startswith("abs:") else None

    def row(tb, s):
        from swiftsoup_spark.kernel.serializer import serialize
        from swiftsoup_spark.select.engine import select as sel

        arena = fast_parse(tb, s)
        ids = sel(arena, 0, css)
        if attr_key is not None:
            return ([(arena.attrs[i] or {}).get(attr_key) or "" for i in ids],)
        if abs_key is not None:
            from swiftsoup_spark.kernel.arena import Element
            return ([Element(arena, i).abs_url(abs_key) for i in ids],)
        if mode == "text":
            return ([arena.node_text(i) for i in ids],)
        if mode == "own_text":
            return ([arena.own_text(i) for i in ids],)
        if mode == "outer_html":
            return ([serialize(arena, i) for i in ids],)
        if mode == "tag":
            return ([arena.tag_name(i) for i in ids],)
        raise ValueError(mode)

    return apply_kernel(
        df, row, [T.StructField(out_col, T.ArrayType(T.StringType()))],
        in_col=in_col, keep_cols=keep_cols)


def select_count_over(df, css: str, out_col: str = "n",
                      in_col: str = "html", keep_cols=("url",)):
    """-> (keep_cols..., out_col: int) matches per document."""
    def row(tb, s):
        from swiftsoup_spark.select.engine import select as sel
        return (len(sel(fast_parse(tb, s), 0, css)),)

    return apply_kernel(df, row, [T.StructField(out_col, T.IntegerType())],
                        in_col=in_col, keep_cols=keep_cols)


def spans_over(df, css: str, out_col: str = "spans",
               in_col: str = "html", keep_cols=("url",)):
    """-> (keep_cols..., out_col: array<struct<node,start,end>>) source
    spans of selector matches (char offsets into the input)."""
    def row(tb, s):
        from swiftsoup_spark.select.engine import select as sel
        arena = fast_parse(tb, s, track_spans=True)
        ids = sel(arena, 0, css)
        return ([{"node": i, "start": arena.src_start[i],
                  "end": arena.src_end[i]} for i in ids],)

    return apply_kernel(df, row, [T.StructField(out_col, SPAN_SCHEMA)],
                        in_col=in_col, keep_cols=keep_cols, track_spans=True)


def clean_over(df, whitelist: str = "basic", out_col: str = "clean_html",
               in_col: str = "body", keep_cols=("url",)):
    """-> (keep_cols..., out_col) sanitized body html
    (reference SwiftSoup.clean)."""
    def row(tb, s):
        from swiftsoup_spark.clean.cleaner import clean_html as _clean
        return (_clean(s, whitelist),)

    return apply_kernel(df, row, [T.StructField(out_col, T.StringType())],
                        in_col=in_col, keep_cols=keep_cols)


def metrics_over(df, in_col: str = "html", keep_cols=("url",)):
    """-> (keep_cols..., n_nodes, parse_errors) exact parse metrics
    (full DOM build; no fast path by construction)."""
    def row(tb, s):
        arena = fast_parse(tb, s)
        return (len(arena.parent) - 1, arena.errors)

    return apply_kernel(
        df, row,
        [T.StructField("n_nodes", T.IntegerType()),
         T.StructField("parse_errors", T.IntegerType())],
        in_col=in_col, keep_cols=keep_cols)


def extract_pages(pages_df, css_scope: str | None = None, keep_cols: tuple = (),
                  metrics: bool = False):
    """pages(url, html, ...) -> (url, *keep_cols, text, title[, n_nodes,
    parse_errors]).

    Hot path: ``mapInArrow`` — the kernel reads/writes pyarrow arrays
    directly (measured ~2× the throughput of the pandas_udf path; pandas
    Series materialization of megabyte string columns is pure overhead).
    One fused stage pipelined with the scan, no shuffle; Catalyst prunes
    the scan to (url, html, *keep_cols).

    When ``metrics`` is False and ``css_scope`` is None or a simple
    ``#id`` selector (the boilerplate-strip shape), each document
    first tries the compiled C streaming extractor
    (kernel/fastpath.doc_text, ~30× the Python kernel) and falls back to
    the full Python parse per-document on bail-out — output is
    byte-identical either way (tests/test_fastpath.py). ``metrics=True``
    adds exact (n_nodes, parse_errors) columns, which require the full
    DOM build, so every document takes the Python kernel (used by the
    resumable pipeline for lineage manifests).
    """
    import pyarrow as pa
    from pyspark.sql import types as T

    src = pages_df.select("url", *keep_cols, "html")
    keep_fields = [f for f in src.schema.fields if f.name != "html"]
    out_fields = keep_fields + [
        T.StructField("text", T.StringType()),
        T.StructField("title", T.StringType())]
    if metrics:
        out_fields += [T.StructField("n_nodes", T.IntegerType()),
                       T.StructField("parse_errors", T.IntegerType())]
    out_schema = T.StructType(out_fields)
    keep_names = [f.name for f in keep_fields]
    out_names = [f.name for f in out_fields]

    def batches(it):
        from swiftsoup_spark.kernel.treebuilder import HtmlTreeBuilder
        from swiftsoup_spark.kernel.arena import Document
        from swiftsoup_spark.select.engine import select as sel
        from swiftsoup_spark.kernel.fastpath import (
            arena_doc_text, batch_doc_text, doc_text, scope_to_id)

        scope_id = scope_to_id(css_scope)
        use_fast = (css_scope is None or scope_id is not None) and not metrics
        tb = HtmlTreeBuilder(track_spans=False)
        for batch in it:
            htmls = batch.column("html")
            if use_fast:
                # zero-copy batch over the Arrow utf8 buffers: no per-row
                # Python strings on input, C-built Arrow buffers on output
                br = batch_doc_text(htmls, scope_id)
                if br is not None:
                    text_arr, title_arr, bail_idx = br
                    if bail_idx:
                        texts = text_arr.to_pylist()
                        titles = title_arr.to_pylist()
                        for i in bail_idx:
                            s = _to_str(htmls[i].as_py())
                            # tier 2: C arena build + C node_text walk
                            r2 = arena_doc_text(s, scope_id)
                            if r2 is not None:
                                texts[i], titles[i] = r2
                                continue
                            arena = tb.parse(s)
                            if css_scope:
                                mm = sel(arena, 0, css_scope)
                                texts[i] = arena.node_text(mm[0]) if mm else ""
                            else:
                                texts[i] = arena.node_text(0)
                            titles[i] = Document(arena, 0).title()
                        text_arr = pa.array(texts, pa.string())
                        title_arr = pa.array(titles, pa.string())
                    arrays = [batch.column(nm) for nm in keep_names] + [
                        text_arr, title_arr]
                    yield pa.RecordBatch.from_arrays(arrays, out_names)
                    continue
            texts, titles, nodes, errs = [], [], [], []
            for raw in htmls:
                s = _to_str(raw.as_py())
                if use_fast:
                    r = doc_text(s, scope_id)
                    if r is not None:
                        texts.append(r[0])
                        titles.append(r[1])
                        continue
                arena = tb.parse(s)
                if css_scope:
                    m = sel(arena, 0, css_scope)
                    texts.append(arena.node_text(m[0]) if m else "")
                else:
                    texts.append(arena.node_text(0))
                titles.append(Document(arena, 0).title())
                if metrics:
                    nodes.append(len(arena.parent) - 1)
                    errs.append(arena.errors)
            arrays = [batch.column(n) for n in keep_names] + [
                pa.array(texts, pa.string()), pa.array(titles, pa.string())]
            if metrics:
                arrays += [pa.array(nodes, pa.int32()),
                           pa.array(errs, pa.int32())]
            yield pa.RecordBatch.from_arrays(arrays, out_names)

    return src.mapInArrow(batches, out_schema)
