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


# ------------------------------------------------- passage excision

def _excise_corpus():
    copied = ("this exact passage was copied verbatim across both "
              "documents and is quite long indeed")
    return copied, [
        (0, "unique preamble zero. " + copied + " unique tail zero."),
        (1, "different head one -- " + copied + " -- plus a coda one."),
        (2, "entirely original content with nothing shared at all, "
            "long enough to fingerprint cleanly."),
        (3, "short"),
        (4, ""),
    ]


def test_excise_cuts_shared_keeps_unique(spark):
    from swiftsoup_spark.ops.winnow import excise_shared_passages
    copied, rows = _excise_corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           excise_shared_passages(df, k=K, w=W).collect()}
    # the copied passage is gone from both carriers (interior tiling:
    # at most ~K+W boundary chars may survive at each end)
    for d in (0, 1):
        assert out[d].n_spans >= 1
        assert copied[K + W:-(K + W)] not in out[d].text_clean
        assert out[d].n_cut >= len(copied) - 2 * (K + W)
    # unique text survives up to the documented boundary slop: the
    # span extends k+w-1 chars FORWARD past the last shared
    # fingerprint, so up to ~k+w leading chars of the tail may go
    assert "unique preamble zero." in out[0].text_clean
    assert "tail zero." in out[0].text_clean
    # untouched docs pass through byte-identical
    assert out[2].text_clean == rows[2][1] and out[2].n_cut == 0
    assert out[3].text_clean == "short" and out[3].n_spans == 0
    assert out[4].text_clean == "" and out[4].n_spans == 0


def test_excise_duckdb_replay(spark):
    import pandas as pd

    from swiftsoup_spark.ops.winnow import (excise_shared_passages,
                                            excise_shared_passages_sql)
    _, rows = _excise_corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(map(tuple, excise_shared_passages(df, k=K, w=W)
                     .collect()))
    con = duckdb.connect()
    con.register("documents",
                 pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = sorted(map(tuple,
                      con.sql(excise_shared_passages_sql(k=K, w=W))
                      .fetchall()))
    assert got == want


def test_excise_partitioning_invariance(spark):
    from swiftsoup_spark.ops.winnow import excise_shared_passages
    _, rows = _excise_corpus()
    df = spark.createDataFrame(rows * 3, "doc_id long, text string") \
        .distinct()
    a = sorted(map(tuple,
                   excise_shared_passages(df.coalesce(1)).collect()))
    b = sorted(map(tuple,
                   excise_shared_passages(df.repartition(5)).collect()))
    assert a == b


def test_excise_overlapping_spans_merge(spark):
    """Two shared passages closer than k+w-1 chars merge into ONE span
    (gaps-and-islands), and the gap text between them is cut with the
    merged span rather than double-counted."""
    from swiftsoup_spark.ops.winnow import excise_shared_passages
    p1 = "first shared passage body long enough to fingerprint alpha"
    p2 = "second shared passage body long enough to fingerprint beta"
    rows = [
        (0, "AA " + p1 + " x " + p2 + " ZZ"),       # 1-char-ish gap
        (1, "BB " + p1 + " y " + p2 + " YY"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           excise_shared_passages(df, k=K, w=W).collect()}
    assert out[0].n_spans == 1 and out[1].n_spans == 1
