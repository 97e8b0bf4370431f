"""Cross-implementation drift guard: the pure-Python xxh64 reference
(functions/xxh64.py — the source of the q34 oracle fixture and the
simulator's rotation mirror) must agree bit-for-bit with Spark's JVM
``xxhash64`` on strings covering every code path (empty, <4B, <8B tails,
4B/8B strides, the 32B block loop, multi-byte UTF-8).
"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from spiderman_spark.functions.xxh64 import pick_rotating, xxh64_signed

EDGE_CASES = [
    "",
    "a",
    "ab",
    "abc",
    "abcd",
    "abcde",
    "abcdefg",
    "abcdefgh",
    "abcdefghi",
    "0:tok",
    "x" * 31,
    "y" * 32,
    "z" * 33,
    "w" * 100,
    "日本語テキスト",
    "émoji 🎉 mixé",
]


def _spark_hashes(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    return {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}


def test_xxh64_matches_spark_edge_cases(spark):
    got = _spark_hashes(spark, EDGE_CASES)
    for s in EDGE_CASES:
        assert xxh64_signed(s.encode()) == got[s], repr(s)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet=string.printable, min_size=0, max_size=120),
        min_size=1,
        max_size=30,
        unique=True,
    )
)
def test_xxh64_matches_spark_random(spark, values):
    got = _spark_hashes(spark, values)
    for s in values:
        assert xxh64_signed(s.encode()) == got[s], repr(s)


def test_pick_rotating_mirrors_spark(spark):
    """Driver-side rotation (simulator middleware mirror) == the engine's
    ``scalars.pick_rotating`` column expression."""
    from spiderman_spark.functions.scalars import pick_rotating as col_pick

    options = ["UA-alpha", "UA-beta", "UA-gamma"]
    urls = [f"http://h{i}.test/p/{i * 7}" for i in range(50)]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: r["ua"]
        for r in df.select("url", col_pick(options, F.col("url")).alias("ua")).collect()
    }
    for u in urls:
        assert pick_rotating(options, u) == got[u]


def test_xxh64_perm_matches_spark_two_column_fold(spark):
    """The r5 MinHash permutation family — xxhash64(xxhash64(gram), i) —
    must be replicated bit-for-bit by the pure-Python xxh64_perm chain
    (hashLong then hashInt with seed threading), across sign boundaries
    and permutation indices."""
    from spiderman_spark.functions.xxh64 import xxh64, xxh64_perm_signed

    values = EDGE_CASES
    df = spark.createDataFrame([(v,) for v in values], "g string")
    for i in (0, 1, 7, 31):
        got = {
            r["g"]: r["h"]
            for r in df.select(
                "g", F.xxhash64(F.xxhash64("g"), F.lit(i)).alias("h")
            ).collect()
        }
        for g in values:
            assert xxh64_perm_signed(xxh64(g.encode()), i) == got[g], (g, i)
