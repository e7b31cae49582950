"""Duplicated-span block detection gates (ops/dedup.duplicate_span_blocks).

Blocks are hashed on an offset grid (origins 0 and block/2), so
n_blocks counts BOTH grids.

1. Exact-duplicate documents: every block flagged (frac 1.0).
2. A block-aligned shared prefix flags one block per grid per doc.
3. Within-doc repetition of a full block counts as duplication.
4. Duplicates misaligned by block/2 ARE caught (the offset grid);
   misalignment by a non-multiple of block/2 is still missed for
   short spans — the residual caveat, pinned so it stays explicit.
5. Docs shorter than one block report zero blocks, never crash.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftsoup_spark.ops import dedup as D  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    yield get_spark(master="local[4]", app="span-dedup-test")


def _w(n, tag):
    return " ".join(f"{tag}{i}" for i in range(n))


def _run(spark, rows, block=4):
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    return {r["doc_id"]: r for r in
            D.duplicate_span_blocks(df, block=block).collect()}


def test_exact_dup_docs_fully_flagged(spark):
    body = _w(8, "x")          # grid0: 2 blocks; grid2: 1 block
    out = _run(spark, [(0, body), (1, body), (2, _w(8, "y"))])
    assert out[0]["n_blocks"] == 3 and out[0]["n_dup_blocks"] == 3
    assert out[0]["dup_block_frac_e6"] == 1000000
    assert out[1]["n_dup_blocks"] == 3
    assert out[2]["n_dup_blocks"] == 0


def test_shared_aligned_prefix(spark):
    pre = "p0 p1 p2 p3"
    out = _run(spark, [(0, f"{pre} {_w(4, 'a')}"),
                       (1, f"{pre} {_w(4, 'b')}")])
    # grids: [p0..p3], [a0..a3], offset-2 [p2 p3 a0 a1]; only the
    # aligned prefix block is shared
    assert out[0]["n_blocks"] == 3
    assert out[0]["n_dup_blocks"] == 1
    assert out[1]["n_dup_blocks"] == 1


def test_within_doc_repetition(spark):
    blockt = "r0 r1 r2 r3"
    out = _run(spark, [(0, f"{blockt} {blockt}")])
    assert out[0]["n_dup_blocks"] == 2
    assert out[0]["n_blocks"] == 3


def test_halfblock_misaligned_duplicate_caught(spark):
    # the shared span sits at token 0 in doc 0 and token 2 (= block/2)
    # in doc 1: no grid-0 alignment, but doc 1's offset-2 grid cuts the
    # span identically to doc 0's grid 0 -> caught
    span = "s0 s1 s2 s3"
    out = _run(spark, [(0, f"{span} {_w(4, 'a')}"),
                       (1, f"q0 q1 {span} {_w(2, 'b')}")])
    assert out[0]["n_dup_blocks"] >= 1
    assert out[1]["n_dup_blocks"] >= 1


def test_odd_misaligned_duplicate_missed(spark):
    pre = "p0 p1 p2 p3"
    # shift by ONE word (not a multiple of block/2) -> still missed for
    # a span this short: the residual granularity caveat
    out = _run(spark, [(0, f"{pre} {_w(4, 'a')}"),
                       (1, f"shift {pre} {_w(3, 'b')}")])
    assert out[0]["n_dup_blocks"] == 0
    assert out[1]["n_dup_blocks"] == 0


def test_short_docs_zero_blocks(spark):
    out = _run(spark, [(0, "one two"), (1, _w(4, "z"))])
    assert out[0]["n_blocks"] == 0
    assert out[0]["dup_block_frac_e6"] == 0
    assert out[1]["n_blocks"] == 1
