"""Host-level link-graph analytics: edge extraction + PageRank.

Crawl prioritization and spam filtering over a Common-Crawl-style corpus
run on the HOST graph (hosts are ~10^7 where pages are ~10^12, so the
iteration state fits comfortably while edge extraction is the only
corpus-scale pass).

PageRank here is *fixed-point deterministic*: ranks are BIGINT e12
(1.0 == 10^12) and each edge contribution is
``floor(((rank*damping) * (w / outw)) / 1000)`` — the only floating
step is a correctly-rounded per-edge IEEE multiply/divide written in
the identical operation order on both sides, and the summation that a
distributed engine reorders is over exact BIGINTs, so results are
bit-identical across partitionings, parallelism levels, AND the DuckDB
oracle (which replays the same iterations as unrolled CTEs). The
truncation loses < 1e-9 of mass per edge per iteration — irrelevant for
ranking, decisive for verifiability.

Scale notes: each iteration joins the edge list with the rank table on
src_host and aggregates by dst_host — two hash shuffles of the EDGE
table per iteration at worst; when the rank table fits executors (hosts
do), broadcasting it makes the join map-side and the per-iteration cost
one dst-keyed aggregate. Lineage is truncated per iteration
(localCheckpoint) exactly like ops/dedup.connected_components.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SCALE = 10 ** 12


def pagerank_fixedpoint(edges, iters: int = 5, damping_permille: int = 850,
                        checkpoint: bool = True):
    """Weighted PageRank over (src_host, dst_host, w) edges.

    Returns (host, rank_e12). Every host present as src or dst is a
    node starting at rank 1.0 (= 10^12); per iteration
    ``rank' = (1000 - damping) * 10^9 + Σ_in floor(((rank * damping) *
    (w / outw)) / 1000)``. Hosts without inlinks keep the teleport term.
    Dangling hosts (no outlinks) leak their damped mass — documented,
    standard for ranking use; the planted graph in the driver query has
    none by construction.
    """
    teleport = (1000 - damping_permille) * (SCALE // 1000)
    nodes = (edges.select(F.col("src_host").alias("host"))
             .unionByName(edges.select(F.col("dst_host").alias("host")))
             .distinct())
    outw = edges.groupBy("src_host").agg(F.sum("w").alias("outw"))
    ew = edges.join(outw, "src_host")
    rank = nodes.select("host", F.lit(SCALE).cast("long").alias("rank_e12"))
    for _ in range(iters):
        contrib = (ew.join(F.broadcast(rank),
                           F.col("src_host") == F.col("host"))
                   .select(F.col("dst_host"),
                           F.floor(((F.col("rank_e12") * damping_permille)
                                    * (F.col("w").cast("double")
                                       / F.col("outw"))) / 1000)
                           .cast("long").alias("c"))
                   .groupBy("dst_host").agg(F.sum("c").alias("c")))
        rank = (nodes.join(contrib,
                           nodes["host"] == contrib["dst_host"], "left")
                .select("host",
                        (F.lit(teleport)
                         + F.coalesce("c", F.lit(0))).cast("long")
                        .alias("rank_e12")))
        if checkpoint:
            rank = rank.localCheckpoint(eager=False)
    return rank


def pagerank_oracle_sql(edges_cte: str, iters: int = 5,
                        damping_permille: int = 850) -> str:
    """DuckDB replay of :func:`pagerank_fixedpoint` as unrolled CTEs.
    ``edges_cte`` must be a CTE body selecting (src_host, dst_host, w).
    Returns a full query ``WITH ... SELECT host, rank_e12``."""
    teleport = (1000 - damping_permille) * (SCALE // 1000)
    parts = [f"edges AS ({edges_cte})",
             "nodes AS (SELECT DISTINCT src_host AS host FROM edges "
             "UNION SELECT DISTINCT dst_host FROM edges)",
             "outw AS (SELECT src_host, SUM(w) AS outw FROM edges "
             "GROUP BY 1)",
             f"r0 AS (SELECT host, CAST({SCALE} AS BIGINT) AS rank_e12 "
             f"FROM nodes)"]
    for i in range(iters):
        parts.append(f"""r{i + 1} AS (
  SELECT n.host,
         CAST({teleport} + coalesce(s.c, 0) AS BIGINT) AS rank_e12
  FROM nodes n LEFT JOIN (
    SELECT e.dst_host AS host,
           SUM(CAST(floor(((r.rank_e12 * {damping_permille})
                           * (CAST(e.w AS DOUBLE) / o.outw)) / 1000)
               AS BIGINT)) AS c
    FROM edges e
    JOIN r{i} r ON e.src_host = r.host
    JOIN outw o ON o.src_host = e.src_host
    GROUP BY 1) s ON n.host = s.host)""")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT host, rank_e12 FROM r{iters}")
