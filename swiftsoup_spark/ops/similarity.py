"""Similarity search over an embedding column (array<float>).

Baseline: brute-force cosine top-k — broadcast the (small) query set,
compute dot products with higher-order array functions (JVM-side, no
Python), window-rank per query. Scale paths:

* :func:`bucketed_topk` — probe a caller-provided coarse partition
  (``label``); the join on the bucket key prunes the candidate set.
* :func:`ivf_topk` — a real IVF: centroids are *trained* (hash-sampled
  seeds + one Lloyd iteration, both deterministic and SQL-replayable),
  every vector is assigned by argmax-cosine, and each query multi-probes
  its ``nprobe`` nearest centroids. The candidate join is an equi hash
  join on the centroid id against a broadcast of (query, probed-centroid)
  rows — at 10^9 vectors this scans ~nprobe/k of the corpus per query
  instead of all of it, and the training cost is one top-k sample plus
  one partial-aggregated average (k·d doubles on the driver, broadcast
  back as plan literals)."""

from __future__ import annotations

from pyspark.sql import Window, functions as F


def _cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def brute_force_topk(emb_df, n_queries: int = 8, k: int = 5):
    """Top-k cosine neighbors for the first ``n_queries`` vectors.
    Returns (query_id, neighbor_id, rank, sim)."""
    base = emb_df.select("vec_id", _as_double("embedding").alias("v"))
    q = (base.filter(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv")))
    joined = base.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("query_id"))
    sims = joined.select(
        "query_id", F.col("vec_id").alias("neighbor_id"),
        _cosine(F.col("qv"), F.col("v")).alias("sim_raw"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_raw").desc(), F.col("neighbor_id"))
    return (sims.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("sim_raw", 4).alias("sim")))


def bucketed_topk(emb_df, n_queries: int = 8, k: int = 5, bucket_col: str = "label"):
    """Pre-bucketed top-k: probe only the query's EXISTING bucket column
    (an upstream partitioner's assignment — no training here, nprobe=1).
    The join on the bucket key prunes to ~1/n_buckets of the corpus per
    query; for a trained coarse quantizer with multi-probe, use
    :func:`ivf_topk`."""
    base = emb_df.select(
        "vec_id", F.col(bucket_col).alias("bucket"), _as_double("embedding").alias("v"))
    q = (base.filter(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("query_id"), F.col("bucket").alias("qb"),
                 F.col("v").alias("qv")))
    joined = base.join(F.broadcast(q), F.col("bucket") == F.col("qb")) \
                 .filter(F.col("vec_id") != F.col("query_id"))
    sims = joined.select(
        "query_id", F.col("vec_id").alias("neighbor_id"),
        _cosine(F.col("qv"), F.col("v")).alias("sim_raw"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_raw").desc(), F.col("neighbor_id"))
    return (sims.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("sim_raw", 4).alias("sim")))


def _lit_vec(vals):
    return F.array(*[F.lit(float(x)) for x in vals])


def _best_centroid(v_col, centroids):
    """argmax-cosine centroid id for a vector column, ties -> smaller id.

    ``centroids`` is a list of plain-float lists, folded into the plan as
    literals (broadcast-by-construction; k·d doubles, no shuffle)."""
    scored = F.array(*[
        F.struct(_cosine(v_col, _lit_vec(c)).alias("sim"),
                 F.lit(-j).alias("negid"))
        for j, c in enumerate(centroids)])
    best = F.array_max(scored)
    return (-best["negid"]).alias("cid"), scored


def train_centroids(emb_df, k: int = 8, round_digits: int = 9,
                    iters: int = 1):
    """Deterministic k-means-lite coarse quantizer: k seed vectors chosen
    by md5(vec_id) order (a uniform hash sample, cheap top-k — no full
    sort), ``iters`` Lloyd iterations (assign-to-centroid by cosine,
    average), each averaged centroid rounded to ``round_digits`` so an
    independent SQL replay (different summation order) lands on identical
    values. Returns a list of k lists of floats, centroid id = seed rank.

    Scale: the seed pick is TakeOrderedAndProject over (md5, vec_id);
    each Lloyd round is one partial-aggregated groupBy over (cid, dim) —
    k·d result rows to the driver, broadcast back as plan literals. One
    round is enough for a coarse quantizer whose job is bucket pruning,
    not clustering quality (gated in tests/test_similarity_ivf.py)."""
    base = emb_df.select("vec_id", _as_double("embedding").alias("v"))
    seed_rows = (base
                 .withColumn("h", F.md5(F.col("vec_id").cast("string")))
                 .orderBy("h", "vec_id").limit(k)
                 .select("v").collect())
    seeds = [list(r["v"]) for r in seed_rows]
    dims = len(seeds[0])
    centroids = seeds
    for _ in range(iters):
        cid, _ = _best_centroid(F.col("v"), centroids)
        avg_rows = (base.select(cid, "v")
                    .select("cid", F.posexplode("v").alias("dim", "val"))
                    .groupBy("cid", "dim").agg(F.avg("val").alias("av"))
                    .collect())
        cents = {}
        for r in avg_rows:
            cents.setdefault(r["cid"], {})[r["dim"]] = round(r["av"],
                                                             round_digits)
        # a centroid whose Lloyd cluster came up empty keeps its vector
        centroids = [
            [cents[j][d] for d in range(dims)] if j in cents else centroids[j]
            for j in range(k)]
    return centroids


def ivf_topk(emb_df, n_queries: int = 8, k: int = 5, n_centroids: int = 8,
             nprobe: int = 2, centroids=None, iters: int = 1):
    """Trained-IVF approximate top-k: assign the corpus to argmax-cosine
    centroid buckets, multi-probe each query's ``nprobe`` nearest
    centroids, exact re-rank inside the probed buckets.

    The candidate join is `assign ⋈ broadcast(query × probed-cid)` on the
    centroid id — an equi broadcast-hash join, never a cartesian — so the
    per-query scan cost is ~nprobe/n_centroids of the corpus. Recall vs
    the exact baseline is gated in tests (>= 0.95 at nprobe=2 on the test
    corpus; see tests/test_similarity_ivf.py)."""
    if centroids is None:
        centroids = train_centroids(emb_df, k=n_centroids, iters=iters)
    base = emb_df.select("vec_id", _as_double("embedding").alias("v"))
    cid, scored = _best_centroid(F.col("v"), centroids)
    assign = base.select("vec_id", cid, "v")

    # per-query probed centroid list: top-nprobe by (sim desc, cid asc) —
    # sort the scored struct array descending; (sim, -cid) makes the
    # lexicographic order implement the tie-break.
    probes = F.transform(
        F.slice(F.reverse(F.array_sort(scored)), 1, nprobe),
        lambda s: -s["negid"])
    q = (base.filter(F.col("vec_id") < n_queries)
         .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
                 F.explode(probes).alias("qcid")))
    joined = (assign.join(F.broadcast(q), F.col("cid") == F.col("qcid"))
              .filter(F.col("vec_id") != F.col("query_id")))
    sims = joined.select(
        "query_id", F.col("vec_id").alias("neighbor_id"),
        _cosine(F.col("qv"), F.col("v")).alias("sim_raw"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_raw").desc(), F.col("neighbor_id"))
    return (sims.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank",
                    F.round("sim_raw", 4).alias("sim")))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def hyperplanes(n_planes: int, dim: int):
    """Deterministic pseudo-random hyperplanes for sign-LSH: component
    (p, d) is md5("lsh:p:d") mapped to [-1, 1) and rounded to 6 decimals
    so an independent SQL replay can fold the identical literals into
    its plan. No RNG state, no driver/executor divergence."""
    import hashlib
    return [[round(int(hashlib.md5(f"lsh:{p}:{d}".encode())
                       .hexdigest()[:8], 16) / 2.0 ** 31 - 1.0, 6)
             for d in range(dim)]
            for p in range(n_planes)]


def embed_lsh_near_dup(emb_df, threshold: float = 0.9, n_planes: int = 24,
                       band_bits: int = 6, dim: int = 64):
    """Embedding-cosine near-duplicate pairs at corpus scale: banded
    random-hyperplane (sign) LSH instead of the all-pairs cross join.

    Each vector gets ``n_planes`` sign bits (bit p = dot(v, plane_p) >= 0;
    P[bits agree] = 1 - angle/pi, the classic SimHash bound), grouped
    into ``n_planes/band_bits`` bands; candidate pairs share at least one
    whole band (ONE exploded self-join on (band, value) — the same
    scale-safe shape as ``dedup.simhash_near_dup``/MinHash-LSH), then
    exact cosine verifies, so precision wrt ``threshold`` is 1 and only
    recall is probabilistic (1-(1-p^band_bits)^n_bands; ~0.999 for
    sim>=0.98 pairs at the 24/6 default, gated in tests).

    Scale design: the band join shuffles only (band, value, vec_id) —
    vectors do NOT ride the explode; candidates re-acquire their vectors
    via two equi hash joins on vec_id (one shuffle of the table each,
    vs n_bands copies through the self-join). A random unrelated pair
    collides per band with ~2^-band_bits, bounding candidate blowup;
    exactly-identical vectors share every band, so collapse exact
    duplicates to representatives upstream (cf. ``_exact_collapse`` in
    ops/dedup.py) when the corpus has verbatim embedding dups.

    Returns (i, j, sim_e4) with i < j, sim_e4 = round(sim, 4) * 10^4.
    """
    if n_planes % band_bits:
        raise ValueError("n_planes must be a multiple of band_bits")
    n_bands = n_planes // band_bits
    planes = hyperplanes(n_planes, dim)
    base = emb_df.select("vec_id", _as_double("embedding").alias("v"))
    bits = [F.when(_dot(F.col("v"), _lit_vec(p)) >= 0, 1).otherwise(0)
            for p in planes]
    bands = []
    for b in range(n_bands):
        expr = F.lit(0)
        for i in range(band_bits):
            expr = expr + bits[b * band_bits + i] * F.lit(1 << i)
        bands.append(expr)
    sig = base.select("vec_id", F.array(*bands).alias("bands"))
    e = sig.select("vec_id", F.posexplode("bands").alias("band", "bv"))
    cand = (e.alias("a").join(
                e.alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bv") == F.col("b.bv"))
                & (F.col("a.vec_id") < F.col("b.vec_id")))
            .select(F.col("a.vec_id").alias("i"),
                    F.col("b.vec_id").alias("j"))
            .distinct())
    va = base.select(F.col("vec_id").alias("i"), F.col("v").alias("va"))
    vb = base.select(F.col("vec_id").alias("j"), F.col("v").alias("vb"))
    sims = (cand.join(va, "i").join(vb, "j")
            .select("i", "j",
                    F.round(_cosine(F.col("va"), F.col("vb")), 4)
                     .alias("sim")))
    return (sims.filter(F.col("sim") >= threshold)
            .select("i", "j",
                    F.round(F.col("sim") * 10000).cast("long")
                     .alias("sim_e4")))


def cosine_near_dup_pairs(emb_df, threshold: float = 0.95, limit_ids: int = 200):
    """Embedding-cosine near-duplicate pairs over a bounded id range."""
    base = (emb_df.filter(F.col("vec_id") < limit_ids)
            .select("vec_id", _as_double("embedding").alias("v")))
    a = base.select(F.col("vec_id").alias("i"), F.col("v").alias("va"))
    b = base.select(F.col("vec_id").alias("j"), F.col("v").alias("vb"))
    return (a.crossJoin(b).filter(F.col("i") < F.col("j"))
            .select("i", "j", F.round(_cosine(F.col("va"), F.col("vb")), 4).alias("sim"))
            .filter(F.col("sim") >= threshold))


def pool_embeddings(emb_df, group_col: str = "label",
                    vec_col: str = "embedding"):
    """Element-wise vector pooling per group: (group, dim, sum_e6,
    n_vecs) — the centroid/mean-pool building block (doc embeddings
    from chunk embeddings, class prototypes, cluster updates) in an
    EXACT form. Each float element is quantized once —
    ``round(v * 1e6)``, a single correctly-rounded IEEE multiply + an
    away-from-zero round, identical in Spark and DuckDB — and all
    reduction is over exact BIGINTs, so the pooled sums are
    bit-identical across partitionings and engines (the mean is
    ``sum_e6 / n_vecs / 1e6``, left to the caller).

    Scale: one posexplode (dim × rows) + one (group, dim)-keyed groupBy
    with map-side combines — the standard shape for 10^9 vectors; no
    Python, no window, no collect."""
    return (emb_df.select(F.col(group_col).alias("grp"),
                          F.posexplode(vec_col).alias("dim", "v"))
            .groupBy("grp", "dim")
            .agg(F.sum(F.round(F.col("v").cast("double") * 1000000)
                       .cast("long")).alias("sum_e6"),
                 F.count("*").alias("n_vecs"))
            .select(F.col("grp").alias(group_col),
                    F.col("dim").cast("int").alias("dim"),
                    "sum_e6", "n_vecs"))


def pool_embeddings_sql(group_expr: str = "label",
                        table: str = "embeddings") -> str:
    """DuckDB replay of :func:`pool_embeddings`."""
    return f"""
WITH e AS (SELECT {group_expr} AS grp, embedding AS v FROM {table}),
x AS (SELECT grp, i - 1 AS dim,
             CAST(round(CAST(v[CAST(i AS INTEGER)] AS DOUBLE) * 1000000)
                  AS BIGINT) AS q
      FROM e, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i))
SELECT grp AS {group_expr}, CAST(dim AS INTEGER) AS dim,
       SUM(q) AS sum_e6, count(*) AS n_vecs
FROM x GROUP BY 1, 2
"""


def embed_decontam(emb_df, bench_df, threshold_e4: int = 9500):
    """Benchmark decontamination in EMBEDDING space — the semantic
    complement of the n-gram probe (ops/decontam): a corpus item is
    contaminated when its max cosine against ANY benchmark vector
    reaches the threshold, catching paraphrased/reformatted benchmark
    leakage that shingle matching misses.

    Scale shape: benchmark sets are small by construction (a few
    thousand eval items), so the bench side broadcasts and the corpus
    side stays map-only — a BroadcastNestedLoopJoin scoring k bench
    vectors per corpus row, then ONE vec_id-keyed partial-aggregable
    max (rows already co-located, so the combine collapses to one row
    per vector before any exchange). Similarity crosses the gate as
    round-4dp e4 integers — the same cross-engine-exact convention as
    cosine_near_dup.
    """
    base = emb_df.select("vec_id", _as_double("embedding").alias("v"))
    bench = bench_df.select(_as_double("embedding").alias("bv"))
    sims = (base.crossJoin(F.broadcast(bench))
            .select("vec_id",
                    F.round(F.round(_cosine(F.col("v"), F.col("bv")), 4)
                            * 10000).cast("long").alias("sim_e4")))
    return (sims.groupBy("vec_id")
            .agg(F.max("sim_e4").alias("max_sim_e4"))
            .select("vec_id", "max_sim_e4",
                    (F.col("max_sim_e4") >= threshold_e4)
                    .alias("contaminated")))


def semdedup(emb_df, n_clusters: int = 8, threshold_e4: int = 9500,
             centroids=None, iters: int = 1):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540 — public paper): coarse-cluster the embedding
    space with the same deterministic k-means-lite quantizer as IVF
    (:func:`train_centroids`), then inside each cluster drop every
    vector that has a lower-id neighbor at cosine >= threshold. The
    survivor of a duplicate group is its lowest vec_id — deterministic
    and local to each over-threshold pair, no iterative clustering.

    Returns (vec_id, cid, kept) for EVERY input vector.

    Scale shape: the pair stage is an intra-cluster self-join on the
    centroid id — O(n^2/k) work vs all-pairs O(n^2); at 10^9+ vectors
    pick k ~ sqrt(n) (the paper's regime: ~sqrt(n)-sized buckets) so
    each bucket's quadratic term stays bounded and the join is an
    ordinary shuffled equi join on cid. Centroids fold into the plan
    as literals (k*d doubles — broadcast by construction). Similarity
    crosses the engine gate as round-4dp e4 integers, the same
    convention as cosine_near_dup/embed_decontam.
    """
    if centroids is None:
        centroids = train_centroids(emb_df, k=n_clusters, iters=iters)
    base = emb_df.select("vec_id", _as_double("embedding").alias("v"))
    cid, _ = _best_centroid(F.col("v"), centroids)
    assign = base.select("vec_id", cid, "v")
    left = assign.select(F.col("vec_id").alias("i"),
                         F.col("cid").alias("ci"), F.col("v").alias("vi"))
    right = assign.select(F.col("vec_id").alias("j"),
                          F.col("cid").alias("cj"), F.col("v").alias("vj"))
    dropped = (left.join(right, (F.col("ci") == F.col("cj"))
                         & (F.col("i") < F.col("j")))
               .select("j",
                       F.round(F.round(_cosine(F.col("vi"), F.col("vj")), 4)
                               * 10000).cast("long").alias("sim_e4"))
               .filter(F.col("sim_e4") >= threshold_e4)
               .select("j").distinct())
    return (assign.join(dropped, assign["vec_id"] == dropped["j"], "left")
            .select(F.col("vec_id").cast("int").alias("vec_id"),
                    F.col("cid").cast("int").alias("cid"),
                    F.col("j").isNull().alias("kept")))
