"""char_entropy (ops/textstats.py) and consensus_near_dup_clusters
(ops/dedup.py): quantized-entropy semantics, alphabet-bounded shuffle
shape, ensemble-closure structure, and DuckDB replays."""

import os
import sys

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftsoup_spark.ops.dedup import (  # noqa: E402
    connected_components, consensus_near_dup_clusters, minhash_lsh_pairs,
    simhash_near_dup)
from swiftsoup_spark.ops.textstats import (  # noqa: E402
    char_entropy, char_entropy_sql)


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    yield get_spark(master="local[4]", app="entropy-consensus-test")


# ---------------------------------------------------------------- entropy

def test_entropy_values(spark):
    rows = [(0, "aaaaaaaaaa"),       # single char: 0 millibits
            (1, "ababababab"),       # 2 chars evenly: bits(10)-bits(5)=1
            (2, ""),                 # empty: all zeros
            (3, "x")]                # N=1: bits(1)-bits(1)=0
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_chars, r.n_distinct, r.entropy_milli)
           for r in char_entropy(df).collect()}
    assert got == {0: (10, 1, 0), 1: (10, 2, 1000),
                   2: (0, 0, 0), 3: (1, 1, 0)}


def test_entropy_orders_junk_below_text(spark):
    df = spark.createDataFrame(
        [(0, "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz"),
         (1, "the quick brown fox jumps over the lazy dog again")],
        "doc_id long, text string")
    got = {r.doc_id: r.entropy_milli for r in char_entropy(df).collect()}
    assert got[0] < got[1]


def test_entropy_duckdb_replay(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = sorted(map(tuple, char_entropy(docs).collect()))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                "read_parquet('/root/testdata/sf0.001/documents.parquet')")
    want = sorted(map(tuple, con.sql(char_entropy_sql()).fetchall()))
    assert got == want


# -------------------------------------------------------------- consensus

def _docs_df(spark):
    return (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .filter(F.col("doc_id") < 200))


def test_consensus_is_cc_of_union(spark):
    """Structural identity: consensus clusters == connected components
    of (minhash pairs UNION simhash pairs) computed independently."""
    df = _docs_df(spark)
    mh = minhash_lsh_pairs(df, threshold=0.5).select("i", "j")
    sh = simhash_near_dup(df, max_hamming=3).select("i", "j")
    edges = mh.unionByName(sh).distinct()
    want = sorted(map(tuple,
                      connected_components(edges, df).collect()))
    got = sorted(map(tuple,
                     consensus_near_dup_clusters(df, threshold=0.5,
                                                 max_hamming=3)
                     .collect()))
    assert got == want
    assert len(got) == df.count()


def test_consensus_merges_detector_specific_edges(spark):
    """Planted chain: A-B is a one-token edit (SimHash hamming 1,
    Jaccard 0.969) and B-C shares 91% of its word set but carries
    repeated junk triples that push SimHash past the hamming bound
    (MinHash catches B-C at threshold 0.4, SimHash does not). With a
    0.99 Jaccard threshold the MinHash legs all vanish and ONLY the
    SimHash edge survives; at 0.4 the consensus closure chains A-B-C
    into one cluster neither regime produces alone."""
    base = " ".join(f"w{i}" for i in range(64))
    a, b = base, base.replace("w63", "w63x")
    c = " ".join(f"w{i}" for i in range(60)) + " " + " ".join(
        f"u{i} u{i} u{i}" for i in range(2))
    df = spark.createDataFrame(
        [(0, a), (1, b), (2, c), (3, "totally different content here")],
        "doc_id long, text string")
    mh = {(r.i, r.j) for r in
          minhash_lsh_pairs(df, threshold=0.4).select("i", "j").collect()}
    sh = {(r.i, r.j) for r in
          simhash_near_dup(df, max_hamming=3).select("i", "j").collect()}
    assert (0, 1) in sh and (1, 2) not in sh     # simhash: edit-close only
    assert (1, 2) in mh                          # minhash: set-overlap leg
    # simhash-only regime: minhash threshold excludes even the A-B pair
    strict = {r.doc_id: r.cluster_id for r in
              consensus_near_dup_clusters(df, threshold=0.99,
                                          max_hamming=3).collect()}
    assert strict[0] == strict[1] == 0 and strict[2] == 2 and strict[3] == 3
    # union regime: the A-B-C chain closes into one cluster
    loose = {r.doc_id: r.cluster_id for r in
             consensus_near_dup_clusters(df, threshold=0.4,
                                         max_hamming=3).collect()}
    assert loose[0] == loose[1] == loose[2] == 0 and loose[3] == 3


def test_consensus_partitioning_invariance(spark):
    df = _docs_df(spark)
    a = sorted(map(tuple,
                   consensus_near_dup_clusters(df.coalesce(1)).collect()))
    b = sorted(map(tuple,
                   consensus_near_dup_clusters(df.repartition(7))
                   .collect()))
    assert a == b
