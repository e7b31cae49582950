"""DOM template fingerprinting: cluster pages by structural shape.

CMS-generated sites render thousands of pages off a handful of
templates; grouping pages by a structure-only fingerprint (the DFS
tag-name sequence of the element tree, content ignored) is the standard
first step for host-level boilerplate discovery and template-aware
sampling. Reference parity: the tag sequence is exactly the reference's
NodeTraversor document order over element nodes
(NodeTraversor.swift:20-60); we read it straight off the flat arena,
where node ids ARE the DFS order.

Scale shape: the fingerprint is one md5 per page computed inside the
same fused scan→mapInArrow stage as every kernel op — the html never
shuffles; only the tiny (host, fp) pairs reach the groupBy, which is
map-side partial-aggregated. Template skew (one host = one template at
10^9 pages) is safe: count() partials reduce each map task's
contribution to one row per (host, fp).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F, types as T

__all__ = ["dom_fingerprints", "template_clusters"]


def dom_fingerprints(pages_df, in_col: str = "html",
                     keep_cols: tuple = ("url",)):
    """Append ``fp`` (md5 hex of the '/'-joined DFS tag sequence) and
    ``n_nodes`` (element count) per page."""
    from swiftsoup_spark.spark.extract import apply_kernel, fast_parse

    def row(tb, s):
        arena = fast_parse(tb, s)
        tags = [arena.tag_name(i) for i in arena.element_descendants(0)]
        path = "/".join(tags)
        return (hashlib.md5(path.encode("utf-8")).hexdigest(), len(tags))

    return apply_kernel(
        pages_df, row,
        [T.StructField("fp", T.StringType()),
         T.StructField("n_nodes", T.LongType())],
        in_col=in_col, keep_cols=keep_cols)


def template_clusters(pages_df, in_col: str = "html",
                      url_col: str = "url"):
    """(host, fp, n_pages): template clusters per host, largest shapes
    first in downstream sorts."""
    fps = dom_fingerprints(pages_df, in_col=in_col, keep_cols=(url_col,))
    host = F.regexp_extract(F.col(url_col), r"^[a-z]+://([^/]+)", 1)
    return (fps.select(host.alias("host"), "fp")
            .groupBy("host", "fp")
            .agg(F.count(F.lit(1)).alias("n_pages")))
