"""Mixed-format corpus extraction: sniff-and-route in ONE fused kernel.

A real Common-Crawl-style table carries more than HTML — the payload
column is opaque binary and the format is a per-document property, not
a partition property. ``extract_any_over`` routes each document inside
one ``mapInArrow`` stage:

  * payload starts with ``%PDF-``  -> the from-scratch PDF extractor
    (``ops.pdftext``; documented bails surface as NULL text)
  * anything else -> charset-aware decode (``api.decode_html``: BOM +
    ``<meta charset>`` sniff) + the two-tier C HTML extractor
    (streaming -> C arena walk) with the byte-identical Python kernel
    as final fallback

Scale shape: routing is a per-document branch inside the same fused
Scan -> MapInArrow stage every other extractor uses — no shuffle, no
per-format job split, no second pass over the table. A format split
("repartition by format, run two jobs") would shuffle 100 TB to save
nothing: both kernels are already per-document.
"""

from __future__ import annotations

from pyspark.sql import types as T


def extract_any_over(df, payload_col: str = "payload",
                     keep_cols: tuple = ("url",)):
    """(keep_cols..., fmt, text) — format-sniffed extraction per doc."""
    import pyarrow as pa

    src = df.select(*keep_cols, payload_col)
    keep_fields = [f for f in src.schema.fields if f.name != payload_col]
    out_schema = T.StructType(keep_fields + [
        T.StructField("fmt", T.StringType()),
        T.StructField("text", T.StringType())])
    keep_names = [f.name for f in keep_fields]
    out_names = [f.name for f in out_schema.fields]

    def batches(it):
        from swiftsoup_spark.api import decode_html
        from swiftsoup_spark.kernel.fastpath import doc_text
        from swiftsoup_spark.kernel.treebuilder import HtmlTreeBuilder
        from swiftsoup_spark.ops.pdftext import extract_pdf_text_bytes

        tb = HtmlTreeBuilder()
        for batch in it:
            fmts, texts = [], []
            for raw in batch.column(payload_col):
                b = raw.as_py()
                if b is None:
                    fmts.append(None)
                    texts.append(None)
                elif b.startswith(b"%PDF-"):
                    fmts.append("pdf")
                    texts.append(extract_pdf_text_bytes(b))
                else:
                    fmts.append("html")
                    s = decode_html(b)
                    r = doc_text(s)  # two C tiers; None -> Python kernel
                    texts.append(r[0] if r is not None
                                 else tb.parse(s).node_text(0))
            yield pa.RecordBatch.from_arrays(
                [batch.column(nm) for nm in keep_names]
                + [pa.array(fmts, pa.string()), pa.array(texts, pa.string())],
                out_names)

    return src.mapInArrow(batches, out_schema)


def synthesize_mixed(df, html_col: str = "html", text_col: str = "text",
                     id_col: str = "doc_id", keep_cols: tuple = ("url",),
                     out_col: str = "payload"):
    """Deterministic mixed corpus for the driver gate: even ids carry
    the utf-8 HTML bytes, odd ids a synthesized PDF (``build_mini_pdf``
    variant ``id % 4``)."""
    import pyarrow as pa

    from swiftsoup_spark.ops.pdftext import build_mini_pdf

    keep = [c for c in keep_cols if c != id_col]
    src = df.select(id_col, *keep, html_col, text_col)
    out_schema = T.StructType(
        [T.StructField(id_col, df.schema[id_col].dataType)]
        + [T.StructField(c, df.schema[c].dataType) for c in keep]
        + [T.StructField(out_col, T.BinaryType())])

    def batches(it):
        for batch in it:
            ids = batch.column(id_col)
            htmls = batch.column(html_col)
            texts = batch.column(text_col)
            payloads = []
            for i, h, t in zip(ids, htmls, texts):
                did = i.as_py()
                if did % 2 == 0:
                    payloads.append((h.as_py() or "").encode("utf-8"))
                else:
                    payloads.append(build_mini_pdf(t.as_py() or "", did % 4))
            yield pa.RecordBatch.from_arrays(
                [ids] + [batch.column(c) for c in keep]
                + [pa.array(payloads, pa.binary())],
                [id_col] + keep + [out_col])

    return src.mapInArrow(batches, out_schema)
