"""LSH skew guard + vectorized simhash regression tests."""

import pytest
from pyspark.sql import Row, functions as F


@pytest.fixture(scope="module")
def spark():
    from swiftsoup_spark.spark.session import get_spark
    s = get_spark(master="local[4]", app="dedup-guard", shuffle_partitions=4)
    yield s


def test_lsh_duplicate_heavy_corpus_bounded(spark):
    """10k exact copies must not produce a quadratic pair blowup: the
    bucket join runs on one representative, and intra-group pairs of
    oversized groups are suppressed (exact_dedup's job)."""
    from swiftsoup_spark.ops.dedup import minhash_lsh_pairs
    rows = [Row(doc_id=i, text="the same viral page words") for i in range(10000)]
    rows += [Row(doc_id=20000 + i, text=f"distinct doc {i} about topic {i}")
             for i in range(20)]
    df = spark.createDataFrame(rows)
    out = minhash_lsh_pairs(df, threshold=0.5)
    assert out.count() < 10000   # not ~5e7

    # small groups still expand fully: 3 copies -> 3 pairs at jaccard 1.0
    df2 = spark.createDataFrame(
        [Row(doc_id=i, text="alpha beta gamma") for i in range(3)]
        + [Row(doc_id=10, text="unrelated totally different words")])
    got = sorted((r.i, r.j, r.jaccard)
                 for r in minhash_lsh_pairs(df2, threshold=0.5).collect())
    assert got == [(0, 1, 1.0), (0, 2, 1.0), (1, 2, 1.0)]


def test_lsh_cross_group_pairs_expand(spark):
    """Near-dup (not identical) groups: every cross-group member pair
    appears with the representatives' jaccard."""
    from swiftsoup_spark.ops.dedup import minhash_lsh_pairs
    a = "one two three four five six seven eight"
    b = "one two three four five six seven XDIFF"   # jaccard 7/9
    rows = [Row(doc_id=0, text=a), Row(doc_id=1, text=a),
            Row(doc_id=2, text=b)]
    got = sorted((r.i, r.j, round(r.jaccard, 4))
                 for r in minhash_lsh_pairs(
                     spark.createDataFrame(rows), threshold=0.5).collect())
    jac = round(7 / 9, 4)
    assert got == [(0, 1, 1.0), (0, 2, jac), (1, 2, jac)]


def test_lsh_large_group_rep_pairs_survive(spark):
    """A group over max_group loses only its intra-group pairs — its
    REPRESENTATIVE's cross-group near-dup pairs must still surface
    (viral content keeps its near-dups)."""
    from swiftsoup_spark.ops.dedup import minhash_lsh_pairs
    viral = "one two three four five six seven eight"
    near = "one two three four five six seven XDIFF"   # jaccard 7/9
    rows = [Row(doc_id=i, text=viral) for i in range(5)]
    rows.append(Row(doc_id=100, text=near))
    got = sorted((r.i, r.j, round(r.jaccard, 4))
                 for r in minhash_lsh_pairs(
                     spark.createDataFrame(rows), threshold=0.5,
                     max_group=3).collect())
    jac = round(7 / 9, 4)
    # intra-group (10 pairs) suppressed; rep (doc 0) x near-dup kept
    assert got == [(0, 100, jac)]


def test_simhash_near_dup_duplicate_heavy_bounded(spark):
    """Exact-dup pre-collapse: 5k copies of one page must not explode
    the banded join; cross-group pairs survive via the representative,
    within-group exact dupes come back at hamming 0."""
    from swiftsoup_spark.ops.dedup import simhash_near_dup
    rows = [Row(doc_id=i, text="the same viral page words") for i in range(5000)]
    rows += [Row(doc_id=90000 + i, text=f"distinct doc {i} topic {i} zz{i}")
             for i in range(10)]
    df = spark.createDataFrame(rows)
    out = simhash_near_dup(df, max_hamming=3, max_group=100)
    # within-group pairs of the oversized group are suppressed
    assert out.filter((F.col("i") < 5000) & (F.col("j") < 5000)).count() == 0

    # small groups: exact dupes expand at hamming 0, cross pairs inherit
    rows2 = [Row(doc_id=0, text="alpha beta gamma delta"),
             Row(doc_id=1, text="alpha beta gamma delta"),
             Row(doc_id=9, text="completely unrelated different words here")]
    got = sorted((r.i, r.j, r.hamming)
                 for r in simhash_near_dup(
                     spark.createDataFrame(rows2)).collect())
    assert got == [(0, 1, 0)]


def test_simhash_vectorized_matches_definition(spark):
    """numpy simhash == the per-bit scalar definition."""
    import hashlib
    from swiftsoup_spark.ops.dedup import simhash

    def scalar(t):
        acc = [0] * 64
        for w in (t or "").split(" "):
            h = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
            for b in range(64):
                acc[b] += 1 if (h >> b) & 1 else -1
        v = sum(1 << b for b in range(64) if acc[b] > 0)
        return v - (1 << 64) if v >= 1 << 63 else v

    texts = ["hello world hello", "", "a", "x y z " * 5,
             "unicode éü中文 words"]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    got = {r.doc_id: r.simhash for r in simhash(df).collect()}
    for i, t in enumerate(texts):
        assert got[i] == scalar(t), t
