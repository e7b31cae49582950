"""Trained-IVF ANN gates (VERDICT r3 item 2).

Three properties, each tested where it is actually decidable:

1. **Recall** — on a corpus with real cluster structure (10 tight cosine
   clusters, deterministic seed), IVF at nprobe=2 must recover >= 95% of
   the exact brute-force top-k. Recall is a property of data
   clusterability: the sf*/embeddings.parquet vectors are near-uniform
   noise (brute-force top-5 neighbors share the query's `label` only
   ~11% of the time), so on THAT table no coarse quantizer can beat
   ~nprobe/k — the oracle gate there checks hash-exactness of the index
   build instead (see __spark_entry__.q_ann_ivf).
2. **Determinism** — training twice yields identical centroids
   (hash-sampled seeds, rounded Lloyd averages).
3. **Plan shape** — the candidate join is an equi broadcast-hash join on
   the centroid id; no cartesian product anywhere in the probe plan.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    yield get_spark(master="local[4]", app="ivf-test")


@pytest.fixture(scope="module")
def clustered(spark):
    """500 vectors in 10 tight cosine clusters, deterministic."""
    rng = np.random.default_rng(7)
    k, per, d = 10, 50, 64
    cent = rng.normal(size=(k, d))
    cent /= np.linalg.norm(cent, axis=1, keepdims=True)
    vecs = np.vstack([cent[j] + 0.15 * rng.normal(size=(per, d))
                      for j in range(k)]).astype(np.float32)
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(k * per)]
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def test_ivf_recall_on_clustered_corpus(clustered):
    from swiftsoup_spark.ops.similarity import brute_force_topk, ivf_topk
    bf = _pairs(brute_force_topk(clustered, n_queries=8, k=5))
    ivf = _pairs(ivf_topk(clustered, n_queries=8, k=5,
                          n_centroids=10, nprobe=2, iters=1))
    recall = len(bf & ivf) / len(bf)
    assert recall >= 0.95, f"recall {recall:.3f} < 0.95"


def test_ivf_nprobe1_still_high_recall_when_clusters_tight(clustered):
    from swiftsoup_spark.ops.similarity import brute_force_topk, ivf_topk
    bf = _pairs(brute_force_topk(clustered, n_queries=8, k=5))
    ivf = _pairs(ivf_topk(clustered, n_queries=8, k=5,
                          n_centroids=10, nprobe=1, iters=1))
    assert len(bf & ivf) / len(bf) >= 0.9


def test_training_is_deterministic(clustered):
    from swiftsoup_spark.ops.similarity import train_centroids
    c1 = train_centroids(clustered, k=10, iters=1)
    c2 = train_centroids(clustered, k=10, iters=1)
    assert c1 == c2


def test_more_lloyd_iters_keeps_recall(clustered):
    from swiftsoup_spark.ops.similarity import brute_force_topk, ivf_topk
    bf = _pairs(brute_force_topk(clustered, n_queries=8, k=5))
    ivf = _pairs(ivf_topk(clustered, n_queries=8, k=5,
                          n_centroids=10, nprobe=2, iters=3))
    assert len(bf & ivf) / len(bf) >= 0.95


def test_ivf_plan_is_pruned_broadcast_join(spark):
    from swiftsoup_spark.ops.similarity import ivf_topk
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    df = ivf_topk(emb, n_queries=8, k=5, n_centroids=8, nprobe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_uniform_noise_documented_degenerate(spark):
    """On the near-uniform sf embeddings, IVF recall is ~nprobe/k — the
    documented degenerate case (neighbors are spread over all buckets).
    This pins the *reason* the recall gate runs on clustered data."""
    from swiftsoup_spark.ops.similarity import brute_force_topk, ivf_topk
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    bf = _pairs(brute_force_topk(emb, n_queries=8, k=5))
    ivf = _pairs(ivf_topk(emb, n_queries=8, k=5, n_centroids=8, nprobe=2))
    recall = len(bf & ivf) / len(bf)
    # sanity floor: still clearly better than a single random bucket,
    # and the probed fraction of the corpus is only nprobe/k = 1/4
    assert 0.2 <= recall < 0.95, recall


def test_embed_decontam_discrimination_and_plan(spark):
    # planted: vec 100 is a near-copy of bench vec 0 (paraphrase leak),
    # vec 101 is orthogonal — only 100 (and the bench members
    # themselves) may flag
    from swiftsoup_spark.ops.similarity import embed_decontam
    dim = 8
    bench_rows = [(0, [1.0] + [0.0] * (dim - 1)),
                  (1, [0.0, 1.0] + [0.0] * (dim - 2))]
    near = [0.999] + [0.02] * (dim - 1)
    orth = [0.0] * (dim - 2) + [1.0, 0.0]
    rows = bench_rows + [(100, near), (101, orth)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    bench = emb.filter("vec_id < 2")
    out = {r.vec_id: (r.max_sim_e4, r.contaminated)
           for r in embed_decontam(emb, bench).collect()}
    assert out[0] == (10000, True) and out[1] == (10000, True)
    assert out[100][1] is True and out[100][0] >= 9900
    assert out[101][1] is False
    plan = embed_decontam(emb, bench)._jdf.queryExecution().executedPlan().toString()
    # bench side must broadcast; the corpus side must not shuffle
    # before the per-vector partial max
    assert "BroadcastNestedLoopJoin" in plan, plan
