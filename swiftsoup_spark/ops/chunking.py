"""Token-window document chunking — the step between a cleaned corpus
and a training shard: split every document into fixed-size token
windows with overlap, so sequence packing sees bounded pieces and no
document boundary leaks context.

Pure codegen (split → transform over a computed start sequence →
slice/join → posexplode): no Python, no shuffle — the explode is
map-side and the output is immediately writable partition-by-partition.
Windows advance by ``chunk - overlap`` tokens; the last window is the
remainder (may be shorter; a document shorter than one chunk yields
exactly one window). Token = whitespace word here; swap the splitter
for the BPE pre-tokenizer column (``textstats.bpe_token_count``'s
pattern) when budgeting in subword units.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def chunk_documents(df, text_col: str = "text", id_col: str = "doc_id",
                    chunk: int = 128, overlap: int = 16):
    """(id, text) -> (id, chunk_idx, chunk_text, n_tokens) windows."""
    from swiftsoup_spark.ops.hof import with_array

    if not 0 <= overlap < chunk:
        raise ValueError("need 0 <= overlap < chunk")
    step = chunk - overlap

    # the split array is BOUND as a lambda variable (ops/hof.py): a
    # closure over the computed split re-evaluates it per window
    # (CollapseProject inlines staged projections into lambda bodies),
    # turning O(n) chunking into O(n^2/step) on long documents
    def windows(w):
        n = F.size(w)
        # number of windows: 1 + ceil(max(n - chunk, 0) / step)
        extra = F.greatest(n - chunk, F.lit(0))
        n_win = (F.lit(1) + F.ceil(extra / step)).cast("int")
        return F.transform(
            F.sequence(F.lit(0), n_win - 1),
            lambda i: F.array_join(F.slice(w, i * step + 1, chunk), " "))

    chunks = with_array(F.split(F.col(text_col), " "), windows)
    out = df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk_text"))
    return out.select(
        id_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        "chunk_text",
        F.size(F.split("chunk_text", " ")).cast("int").alias("n_tokens"))


def chunk_documents_sql(chunk: int = 128, overlap: int = 16,
                        table: str = "documents") -> str:
    """DuckDB replay of :func:`chunk_documents` over ``table``."""
    step = chunk - overlap
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM {table}),
n AS (SELECT doc_id, w,
             CAST(1 + ceil(greatest(len(w) - {chunk}, 0) / {step}.0)
                  AS INTEGER) AS n_win
      FROM t)
SELECT doc_id,
       CAST(i - 1 AS INTEGER) AS chunk_idx,
       array_to_string(w[(i - 1) * {step} + 1 :
                         (i - 1) * {step} + {chunk}], ' ') AS chunk_text,
       CAST(len(string_split(array_to_string(
           w[(i - 1) * {step} + 1 : (i - 1) * {step} + {chunk}], ' '),
           ' ')) AS INTEGER) AS n_tokens
FROM n, LATERAL (SELECT unnest(generate_series(1, n_win)) AS i)
"""
