"""Count-min sketch: never-underestimate invariant, exactness in the
collision-free regime, DuckDB replay, merge property."""

import os
import sys
from collections import Counter

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftsoup_spark.ops.cms import (D_ROWS, W_BUCKETS, cms_probe,
                                     cms_sketch, cms_sketch_sql)


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    return get_spark(master="local[4]", app="test-cms")


TEXTS = [
    "the cat sat on the mat",
    "the dog ate the cat food",
    "mat and dog and cat",
    "rare1 appears once",
    "", "   ",
]


def _true_counts():
    c = Counter()
    for t in TEXTS:
        c.update(w for w in t.split(" ") if w)
    return c


def test_probe_never_underestimates(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    truth = _true_counts()
    probes = spark.createDataFrame(
        [(w,) for w in list(truth) + ["absent-token"]], "token string")
    est = {r.token: r.est
           for r in cms_probe(docs, probes).collect()}
    for w, n in truth.items():
        assert est[w] >= n, (w, est[w], n)
    # ~18 distinct tokens in 4x256 buckets: collisions are essentially
    # impossible, so estimates are exact and the absent probe reads 0
    assert est == {**truth, "absent-token": 0}


def test_sketch_matches_duckdb(spark):
    import duckdb
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    got = sorted((r.r, r.bucket, r.c) for r in cms_sketch(docs).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)",
                    [(i, t) for i, t in enumerate(TEXTS)])
    want = sorted(map(tuple, con.execute(cms_sketch_sql()).fetchall()))
    assert got == want
    # total mass per row == total token count
    n = sum(_true_counts().values())
    for r in range(D_ROWS):
        assert sum(c for rr, _b, c in got if rr == r) == n


def test_merge_is_counter_addition(spark):
    a = spark.createDataFrame([(0, TEXTS[0]), (1, TEXTS[1])],
                              "doc_id long, text string")
    b = spark.createDataFrame([(2, TEXTS[2]), (3, TEXTS[3])],
                              "doc_id long, text string")
    u = a.unionByName(b)
    sa = {(r.r, r.bucket): r.c for r in cms_sketch(a).collect()}
    sb = {(r.r, r.bucket): r.c for r in cms_sketch(b).collect()}
    su = {(r.r, r.bucket): r.c for r in cms_sketch(u).collect()}
    merged = {k: sa.get(k, 0) + sb.get(k, 0) for k in set(sa) | set(sb)}
    assert su == merged
    assert all(0 <= b_ < W_BUCKETS for _r, b_ in su)
