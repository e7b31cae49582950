"""Fixed-point PageRank gates (ops/linkgraph.py).

1. Closed-form check: on a symmetric 2-cycle the stationary rank is
   1.0 per node and the fixed-point iteration must sit exactly on it
   (teleport + damped full transfer).
2. A sink-heavier graph ranks the popular node strictly higher.
3. Bit-determinism: different input partitionings produce identical
   rank_e12 values (the integer-sum property).
4. Cross-dialect: DuckDB's unrolled-CTE replay returns the identical
   integers on the same edge list.
5. Weighted edges: doubling an edge weight shifts rank the right way.
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftsoup_spark.ops import linkgraph as L  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    yield get_spark(master="local[4]", app="linkgraph-test")


def _edges(spark, rows, parts=1):
    df = spark.createDataFrame(
        rows, "src_host: string, dst_host: string, w: long")
    return df.repartition(parts)


def _ranks(df):
    return {r["host"]: r["rank_e12"] for r in df.collect()}


def test_two_cycle_stationary(spark):
    e = _edges(spark, [("a", "b", 1), ("b", "a", 1)])
    r = _ranks(L.pagerank_fixedpoint(e, iters=5))
    # rank = 0.15 + 0.85 * rank ; stationary at 1.0 (floor exact here)
    assert r["a"] == 10 ** 12
    assert r["b"] == 10 ** 12


def test_popular_node_wins(spark):
    # a<->c alternate phases of the 2-cycle, so compare only facts that
    # hold at every iteration: the inlink-less node sits exactly on the
    # teleport term and both cycle nodes are strictly above it
    e = _edges(spark, [("a", "c", 1), ("b", "c", 1), ("c", "a", 1)])
    r = _ranks(L.pagerank_fixedpoint(e, iters=8))
    assert r["b"] == 150 * 10 ** 9
    assert r["a"] > r["b"] and r["c"] > r["b"]
    # and the phase average approximates the stationary order c > a
    r9 = _ranks(L.pagerank_fixedpoint(e, iters=9))
    assert r["c"] + r9["c"] > r["a"] + r9["a"]


def test_partitioning_bit_determinism(spark):
    rows = [(f"h{i}", f"h{(i * 3 + 1) % 7}", 1 + i % 4) for i in range(7)]
    r1 = _ranks(L.pagerank_fixedpoint(_edges(spark, rows, parts=1)))
    r2 = _ranks(L.pagerank_fixedpoint(_edges(spark, rows, parts=5)))
    assert r1 == r2


def test_matches_duckdb_replay(spark):
    rows = [(f"h{i}", f"h{(i * 3 + 1) % 7}", 1 + i % 4) for i in range(7)]
    sp = _ranks(L.pagerank_fixedpoint(_edges(spark, rows)))
    vals = ", ".join(f"('{s}', '{d}', {w})" for s, d, w in rows)
    sql = L.pagerank_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src_host, dst_host, w)")
    dk = dict(duckdb.connect().execute(sql).fetchall())
    assert sp == dk


def test_weight_shifts_rank(spark):
    base = [("a", "b", 1), ("a", "c", 1), ("b", "a", 1), ("c", "a", 1)]
    heavy = [("a", "b", 3), ("a", "c", 1), ("b", "a", 1), ("c", "a", 1)]
    r0 = _ranks(L.pagerank_fixedpoint(_edges(spark, base)))
    r1 = _ranks(L.pagerank_fixedpoint(_edges(spark, heavy)))
    assert r0["b"] == r0["c"]
    assert r1["b"] > r1["c"]


def test_dangling_mass_redistributed(spark):
    # 'sink' has no outlinks; its damped mass must flow back uniformly.
    # Graph: a->sink, b->sink, a<->b — sink would otherwise leak ~all
    # damped mass and every rank would decay toward teleport-only.
    rows = [("a", "sink", 1), ("b", "sink", 1),
            ("a", "b", 1), ("b", "a", 1)]
    r = _ranks(L.pagerank_fixedpoint(_edges(spark, rows), iters=5))
    leak = _ranks(L.pagerank_fixedpoint(_edges(spark, rows), iters=5,
                                        dangling=False))
    # redistribution conserves mass: total stays ~n * 1e12 (floor slack
    # < iters * n * 1000); the leaking variant loses sink's damped mass
    n = 3
    assert sum(r.values()) > 0.999 * n * 10 ** 12
    assert sum(leak.values()) < 0.9 * n * 10 ** 12
    assert r["sink"] > leak["sink"]
    # DuckDB unrolled-CTE replay with the dangling share is bit-exact
    import duckdb as dk
    vals = ", ".join(f"('{s}', '{d}', {w})" for s, d, w in rows)
    sql = L.pagerank_oracle_sql(
        f"SELECT * FROM (VALUES {vals}) AS t(src_host, dst_host, w)")
    assert r == dict(dk.connect().execute(sql).fetchall())


def test_dangling_bit_determinism(spark):
    rows = [(f"h{i}", f"h{(i * 3 + 1) % 9}", 1 + i % 4) for i in range(7)]
    rows.append(("h1", "lonesink", 2))
    one = _ranks(L.pagerank_fixedpoint(_edges(spark, rows, parts=1)))
    many = _ranks(L.pagerank_fixedpoint(_edges(spark, rows, parts=5)))
    assert one == many
