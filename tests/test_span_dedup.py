"""Duplicated-span block detection gates (ops/dedup.duplicate_span_blocks).

1. Exact-duplicate documents: every block flagged (frac 1.0).
2. A block-aligned shared prefix flags exactly one block per doc.
3. Within-doc repetition of a full block counts as duplication.
4. Misaligned duplicates are missed (the documented granularity
   caveat) — pinned so the behavior is explicit, not accidental.
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
    body = _w(8, "x")          # 2 blocks of 4
    out = _run(spark, [(0, body), (1, body), (2, _w(8, "y"))])
    assert out[0]["n_blocks"] == 2 and out[0]["n_dup_blocks"] == 2
    assert out[0]["dup_block_frac_e6"] == 1000000
    assert out[1]["n_dup_blocks"] == 2
    assert out[2]["n_dup_blocks"] == 0


def test_shared_aligned_prefix(spark):
    pre = "p0 p1 p2 p3"
    out = _run(spark, [(0, f"{pre} {_w(4, 'a')}"),
                       (1, f"{pre} {_w(4, 'b')}")])
    assert out[0]["n_blocks"] == 2
    assert out[0]["n_dup_blocks"] == 1
    assert out[1]["n_dup_blocks"] == 1


def test_within_doc_repetition(spark):
    blockt = "r0 r1 r2 r3"
    out = _run(spark, [(0, f"{blockt} {blockt}")])
    assert out[0]["n_dup_blocks"] == 2


def test_misaligned_duplicate_missed(spark):
    pre = "p0 p1 p2 p3"
    # doc 1 shifts the shared text by one word -> different block cuts
    out = _run(spark, [(0, f"{pre} {_w(4, 'a')}"),
                       (1, f"shift {pre} {_w(3, 'b')}")])
    assert out[0]["n_dup_blocks"] == 0
    assert out[1]["n_dup_blocks"] == 0


def test_short_docs_zero_blocks(spark):
    out = _run(spark, [(0, "one two"), (1, _w(4, "z"))])
    assert out[0]["n_blocks"] == 0
    assert out[0]["dup_block_frac_e6"] == 0
    assert out[1]["n_blocks"] == 1
