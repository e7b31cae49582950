"""Gates for winnowing fingerprints (ops/winnow).

1. **Reference parity** — Spark fingerprints match a sequential
   reference implementation of the MOSS algorithm (packed-BIGINT
   min-of-window with rightmost tie-break) on texts with repeats.
2. **Detection guarantee** — a shared substring of length k + w - 1
   between two docs always yields >= 1 shared fingerprint (the paper's
   correctness property), even when the rest of the docs differ.
3. **Oracle parity** — winnow_pairs matches the DuckDB SQL replay on a
   corpus with planted copied passages and boilerplate (df-pruned).
4. **df prune** — a k-gram present in every doc produces no pairs.
"""

import hashlib
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftsoup_spark.ops.winnow import (winnow_fingerprints,  # noqa: E402
                                        winnow_pairs, winnow_pairs_sql)

K, W = 16, 8


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    yield get_spark(master="local[4]", app="winnow-test")


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _ref_fps(text: str, k: int = K, w: int = W):
    """Sequential winnowing: (fp, pos) set, rightmost min per window."""
    B = 1 << 24
    if len(text) < k + w - 1:
        return set()
    hs = [_h(text[i:i + k]) * B + (B - 1 - i)
          for i in range(len(text) - k + 1)]
    out = set()
    for j in range(len(hs) - w + 1):
        enc = min(hs[j:j + w])
        out.add((enc // B, B - 1 - enc % B))
    return out


TEXTS = [
    "the quick brown fox jumps over the lazy dog again and again today",
    "a completely different sentence about spark shuffles and parquet io",
    "prefix words then the quick brown fox jumps over the lazy dog too",
    "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa repeated run with ties inside",
]


def test_matches_reference(spark):
    df = spark.createDataFrame(list(enumerate(TEXTS)),
                               "doc_id: long, text: string")
    got = {}
    for r in winnow_fingerprints(df, K, W).collect():
        got.setdefault(r["doc_id"], set()).add((r["fp"], r["pos"]))
    for i, t in enumerate(TEXTS):
        assert got.get(i, set()) == _ref_fps(t), f"doc {i}"


def test_detection_guarantee(spark):
    # any shared substring of length k + w - 1 must share a fingerprint
    core = "SHARED-PASSAGE-XYZ-0123"          # len 23 = K + W - 1
    assert len(core) == K + W - 1
    texts = ["left filler words " + core + " right side padding",
             "totally other start " + core + " and other ending"]
    a, b = (_ref_fps(t) for t in texts)
    assert {f for f, _ in a} & {f for f, _ in b}
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id: long, text: string")
    rows = winnow_pairs(df, K, W, max_df=8, min_shared=1).collect()
    assert [(r["i"], r["j"]) for r in rows] == [(0, 1)]


def test_pairs_match_oracle(spark):
    passage = "winnowing finds copied passages with a provable floor"
    boiler = " copyright footer boilerplate text on every single page"
    texts = [
        "doc zero has " + passage + " inside it" + boiler,
        "doc one is unrelated content entirely about join skew" + boiler,
        "doc two also contains " + passage + " copied wholesale" + boiler,
        "doc three shares nothing long enough with the others" + boiler,
        "doc four quotes " + passage + " one more time" + boiler,
    ]
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id: long, text: string")
    srows = sorted(tuple(r)
                   for r in winnow_pairs(df, K, W, max_df=4,
                                         min_shared=2).collect())
    con = duckdb.connect()
    vals = ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
    con.execute(f"CREATE TABLE documents AS SELECT * FROM (VALUES {vals}) "
                "AS t(doc_id, text)")
    orows = sorted(con.execute(
        winnow_pairs_sql(K, W, max_df=4, min_shared=2)).fetchall())
    assert srows == orows
    pairs = {(i, j) for i, j, _ in srows}
    # the three passage-carrying docs pair up; boilerplate (df=5 > 4)
    # never creates a pair with the unrelated docs
    assert {(0, 2), (0, 4), (2, 4)} <= pairs
    assert not any({1, 3} & {i, j} for i, j in pairs)


def test_df_prune_kills_universal_grams(spark):
    texts = ["same exact boilerplate line here %d" % i for i in range(5)]
    # the shared prefix is > k+w-1 chars and present in ALL 5 docs
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id: long, text: string")
    assert winnow_pairs(df, K, W, max_df=4, min_shared=1).count() == 0
