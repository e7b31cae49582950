"""HyperLogLog sketch: bit-exact registers, estimate error band,
merge = max property."""

import hashlib
import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftsoup_spark.ops.hll import (M_REGISTERS, hll_estimate,
                                     hll_oracle_sql, hll_registers,
                                     hll_sketch)


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    return get_spark(master="local[4]", app="test-hll")


def _py_register(value: str):
    """Reference register computation straight from the definition."""
    hx = hashlib.md5(value.encode()).hexdigest()
    idx = int(hx[0:3], 16) % M_REGISTERS
    v = int(hx[3:16], 16)
    rho = 52 if v == 0 else 53 - v.bit_length()
    return idx, rho


def test_registers_match_python_replay(spark):
    vals = [f"value-{i}" for i in range(500)]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v string")
    got = {(r.idx, ): r.r for r in hll_registers(df, "g", "v").collect()}
    want = {}
    for v in vals:
        idx, rho = _py_register(v)
        want[(idx,)] = max(want.get((idx,), 0), rho)
    assert got == want


def test_sketch_matches_duckdb_oracle(spark):
    import duckdb
    rows = [(i, f"doc {i % 700} text", ["en", "de", "fr"][i % 3])
            for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = sorted((r.lang, r.v_set, r.s_scaled)
                 for r in hll_sketch(df, "lang", "text").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR,"
                " lang VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
    want = sorted(map(tuple, con.execute(
        hll_oracle_sql("lang", "text", group_alias="lang")).fetchall()))
    assert got == want


def test_estimate_error_band(spark):
    # standard error for m=1024 is ~3.25%; assert a generous 4-sigma
    for true_n in (300, 5000):
        vals = [(f"item-{i}-{true_n}",) for i in range(true_n)] * 3
        df = spark.createDataFrame([("g", v[0]) for v in vals],
                                   "g string, v string")
        row = hll_sketch(df, "g", "v").collect()[0]
        est = hll_estimate(row.v_set, row.s_scaled)
        assert abs(est - true_n) / true_n < 0.13, (true_n, est)


def test_merge_is_register_max(spark):
    # sketch(A ∪ B) == per-register max of sketch(A), sketch(B)
    a = [("x", f"a{i}") for i in range(400)]
    b = [("x", f"a{i}") for i in range(200, 600)]
    df_a = spark.createDataFrame(a, "g string, v string")
    df_b = spark.createDataFrame(b, "g string, v string")
    df_u = spark.createDataFrame(a + b, "g string, v string")
    ra = {r.idx: r.r for r in hll_registers(df_a, "g", "v").collect()}
    rb = {r.idx: r.r for r in hll_registers(df_b, "g", "v").collect()}
    ru = {r.idx: r.r for r in hll_registers(df_u, "g", "v").collect()}
    merged = {i: max(ra.get(i, 0), rb.get(i, 0))
              for i in set(ra) | set(rb)}
    assert ru == merged


def test_estimate_small_range_linear_counting():
    # v_set well under 2.5m kicks in linear counting exactly
    v_set, m = 10, M_REGISTERS
    s = (m - v_set) * (1 << 52) + v_set * (1 << 51)
    est = hll_estimate(v_set, s)
    assert abs(est - m * math.log(m / (m - v_set))) < 1e-9
