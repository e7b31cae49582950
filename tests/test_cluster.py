"""Near-dup clustering: connected components over the LSH pair graph.

Covers the closure semantics (chains, singletons, min-label choice), the
O(log diameter) round bound of pointer jumping, and the
``filter(doc_id == cluster_id)`` dedup contract of ``near_dup_clusters``.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftsoup_spark.ops.dedup import connected_components, near_dup_clusters


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    yield get_spark(master="local[4]", app="cluster-test")


def _cc(spark, edges, n, **kw):
    e = spark.createDataFrame(edges, "i long, j long")
    v = spark.createDataFrame([(i,) for i in range(1, n + 1)], "doc_id long")
    rows = connected_components(e, v, **kw).collect()
    return {r.doc_id: r.cluster_id for r in rows}


def test_chain_singletons_and_min_label(spark):
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (7, 9)], 9)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 6, 7: 7, 8: 8, 9: 7}


def test_edge_order_irrelevant(spark):
    # same component reached from either end; labels are min doc_id
    a = _cc(spark, [(5, 4), (4, 3), (3, 2), (2, 1)], 5)
    b = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)], 5)
    assert a == b == {i: 1 for i in range(1, 6)}


def test_long_chain_converges_within_log_rounds(spark):
    # pointer jumping halves path length every round: a 64-node chain
    # must close in <= ~log2(64)+2 rounds, far below a max_iter that
    # plain O(diameter) propagation would blow through
    n = 64
    got = _cc(spark, [(i, i + 1) for i in range(1, n)], n, max_iter=9)
    assert got == {i: 1 for i in range(1, n + 1)}


def test_triangle_plus_bridge(spark):
    got = _cc(spark, [(2, 3), (3, 4), (2, 4), (4, 6)], 6)
    assert got == {1: 1, 2: 2, 3: 2, 4: 2, 5: 5, 6: 2}


def test_near_dup_clusters_dedup_contract(spark):
    docs = spark.createDataFrame(
        [(0, "a b c d e f"),        # near-dup group {0,1} (one word off)
         (1, "a b c d e g"),
         (2, "a b c d e f"),        # exact dup of 0 -> same cluster
         (3, "x y z w q r"),        # singleton
         ],
        "doc_id long, text string")
    out = near_dup_clusters(docs, threshold=0.5)
    got = {r.doc_id: r.cluster_id for r in out.collect()}
    assert got[0] == got[1] == got[2] == 0
    assert got[3] == 3
    reps = sorted(r.doc_id for r in
                  out.filter("doc_id = cluster_id").collect())
    assert reps == [0, 3]
