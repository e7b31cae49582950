"""Gates for distributed BPE merge induction (ops/bpe.bpe_train).

1. **Reference parity** — Spark AND the DuckDB oracle SQL both match a
   hand-rolled sequential BPE (tuple-state, leftmost-non-overlapping
   merge) on a corpus exercising ties, overlapping pairs (``aaa``) and
   case/punctuation folding.
2. **Overlap semantics** — ``a a a`` merges to ``[aa, a]``, never
   ``[a, aa]`` or ``[aa, aa]``.
3. **Encoding safety** — a merged symbol whose text ends with the left
   half of the next pair must not false-match (the ,,-boundary
   invariant).
4. **Determinism** — two runs produce identical merge tables.
"""

import collections
import os
import re
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from swiftsoup_spark.ops.bpe import (bpe_encode, bpe_encode_sql,  # noqa: E402
                                     bpe_train, bpe_train_sql)


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    yield get_spark(master="local[4]", app="bpe-test")


def _ref_bpe(texts, n):
    """Sequential reference implementation over symbol tuples."""
    wc = collections.Counter()
    for t in texts:
        for w in re.split("[^a-z]+", t.lower()):
            if len(w) >= 2:
                wc[w] += 1
    vocab = collections.Counter()
    for w, c in wc.items():
        vocab[tuple(w)] += c
    out = []
    for r in range(1, n + 1):
        pc = collections.Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        out.append((r, " ".join(best), "".join(best), pc[best]))
        nv = collections.Counter()
        for syms, c in vocab.items():
            s, i, ns = list(syms), 0, []
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == best:
                    ns.append(s[i] + s[i + 1])
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            nv[tuple(ns)] += c
        vocab = nv
    return out


TEXTS = ["the theme of the thesis", "other weather, rather the lathe!",
         "aaa aaaa the the the", "Banana bandana the",
         "abab ababab ba baba"]


def _duck_rows(texts, n):
    con = duckdb.connect()
    vals = ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
    con.execute(f"CREATE TABLE documents AS SELECT * FROM (VALUES {vals}) "
                "AS t(doc_id, text)")
    return sorted(con.execute(bpe_train_sql(n)).fetchall())


def test_matches_reference_and_oracle(spark):
    expected = [tuple(x) for x in _ref_bpe(TEXTS, 8)]
    df = spark.createDataFrame(list(enumerate(TEXTS)),
                               "doc_id: long, text: string")
    srows = sorted(tuple(r) for r in bpe_train(df, 8).collect())
    assert srows == expected
    assert _duck_rows(TEXTS, 8) == expected


def test_overlap_leftmost(spark):
    df = spark.createDataFrame([(0, "aaa")], "doc_id: long, text: string")
    rows = bpe_train(df, 2).collect()
    # round 1: (a,a) count 2 -> state [aa, a]; round 2: (aa, a) count 1
    assert (rows[0]["pair"], rows[0]["pair_count"]) == ("a a", 2)
    assert (rows[1]["pair"], rows[1]["pair_count"]) == ("aa a", 1)


def test_boundary_no_false_match(spark):
    # after merging (b,a) -> "ba", the word "bab" is [ba, b]; the pair
    # "a b" exists only in "ab"-shaped words, and a substring-level
    # match inside "ba b" must NOT fire.
    texts = ["ba ba ba bab", "ab"]
    expected = [tuple(x) for x in _ref_bpe(texts, 3)]
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id: long, text: string")
    srows = sorted(tuple(r) for r in bpe_train(df, 3).collect())
    assert srows == expected
    assert _duck_rows(texts, 3) == expected


def _ref_encode(texts, n, k):
    """Token frequencies of the final merged vocab state (the encode
    side): run the reference trainer's vocab loop, then weight each
    surviving symbol by its word count."""
    wc = collections.Counter()
    for t in texts:
        for w in re.split("[^a-z]+", t.lower()):
            if len(w) >= 2:
                wc[w] += 1
    vocab = collections.Counter()
    for w, c in wc.items():
        vocab[tuple(w)] += c
    for _ in range(n):
        pc = collections.Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        nv = collections.Counter()
        for syms, c in vocab.items():
            s, i, ns = list(syms), 0, []
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == best:
                    ns.append(s[i] + s[i + 1])
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            nv[tuple(ns)] += c
        vocab = nv
    tok = collections.Counter()
    for syms, c in vocab.items():
        for s in syms:
            tok[s] += c
    return sorted(tok.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def test_encode_matches_reference_and_oracle(spark):
    expected = [tuple(x) for x in _ref_encode(TEXTS, 6, 15)]
    df = spark.createDataFrame(list(enumerate(TEXTS)),
                               "doc_id: long, text: string")
    srows = [(r["token"], r["n"])
             for r in bpe_encode(df, 6, k=15).collect()]
    assert srows == expected
    con = duckdb.connect()
    vals = ", ".join(f"({i}, '{t}')" for i, t in enumerate(TEXTS))
    con.execute(f"CREATE TABLE documents AS SELECT * FROM (VALUES {vals}) "
                "AS t(doc_id, text)")
    assert con.execute(bpe_encode_sql(6, k=15)).fetchall() == expected


def test_encode_merged_tokens_surface(spark):
    # "th" and "the" should dominate the TEXTS corpus after 6 merges:
    # the top token must be multi-character, proving merges applied.
    df = spark.createDataFrame(list(enumerate(TEXTS)),
                               "doc_id: long, text: string")
    rows = bpe_encode(df, 6, k=5).collect()
    assert len(rows[0]["token"]) > 1


def test_deterministic(spark):
    df = spark.createDataFrame(list(enumerate(TEXTS)),
                               "doc_id: long, text: string")
    a = [tuple(r) for r in bpe_train(df, 5).collect()]
    b = [tuple(r) for r in bpe_train(df, 5).collect()]
    assert a == b
