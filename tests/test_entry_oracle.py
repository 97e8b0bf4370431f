"""Mirror of the driver's correctness gate: run each __spark_entry__ query on
Spark AND its oracle SQL on DuckDB over the same parquet, compare row count,
column names, and order-insensitive values (SURVEY.md §5.2.2).
"""

import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def normalize(cols, rows):
    """Sort columns by name, then rows — the driver's order-insensitive compare."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in idx) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


ORACLED = sorted(set(entrymod.queries()) & set(entrymod.oracle_sql()))
ROWS_ONLY = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, ddb, name):
    qdf = entrymod.queries()[name](spark, SF_DIR)
    spark_rows = [tuple(r) for r in qdf.collect()]
    spark_cols = qdf.columns

    res = ddb.execute(entrymod.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = [tuple(r) for r in res.fetchall()]

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs oracle {len(duck_rows)}"
    )
    sc, sr = normalize(spark_cols, spark_rows)
    dc, dr = normalize(duck_cols, duck_rows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(sr, dr)) if a != b
    ]
    assert not mismatches, f"{name}: first value mismatch {mismatches[0]}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    qdf = entrymod.queries()[name](spark, SF_DIR)
    n = qdf.count()
    assert n >= 0
    assert len(qdf.columns) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_fixture_files_current(tmp_path):
    """The committed oracle fixtures must equal a fresh regeneration from the
    simulator / pure-Python hash reference (guards fixture drift)."""
    import pandas as pd

    from . import make_fixtures

    got = make_fixtures.write_all(str(tmp_path))
    assert got == {
        "q27_crawl_order.parquet": 31,
        "q28_images.parquet": 36,
        "q34_gram_hashes.parquet": 31 * make_fixtures.MINHASH_K,
    }
    for name in got:
        fresh = pd.read_parquet(os.path.join(str(tmp_path), name))
        committed = pd.read_parquet(os.path.join(make_fixtures.FIXDIR, name))
        pd.testing.assert_frame_equal(fresh, committed)


def test_q34_fixture_covers_engine_grams(spark):
    """Every gram the ENGINE tokenizer (Java \\s semantics) produces over the
    oracle-gate corpus must exist in the committed q34 hash fixture: the
    oracle inner-joins on g, so a missing gram would silently corrupt the
    DuckDB-side signature minima instead of failing loudly."""
    import pandas as pd

    from spiderman_spark.operators import dedup

    fixture_grams = set(
        pd.read_parquet(os.path.join(make_fixtures_dir(), "q34_gram_hashes.parquet"))
        .g.unique()
    )
    base = os.path.dirname(SF_DIR)
    candidates = [
        d
        for d in dict.fromkeys(
            [SF_DIR, os.path.join(base, "sf0.001"), os.path.join(base, "sf0.01")]
        )
        if os.path.isdir(d)
    ]
    if not candidates:
        pytest.skip(f"no test corpus found near {SF_DIR}")
    for sf in candidates:
        docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
        engine_grams = {
            r["g"]
            for r in docs.select(
                F.explode(dedup.word_ngrams(F.col("text"), 1)).alias("g")
            )
            .distinct()
            .collect()
        }
        missing = engine_grams - fixture_grams
        assert not missing, f"{sf}: engine grams absent from fixture: {sorted(missing)[:10]}"


def make_fixtures_dir():
    from . import make_fixtures

    return make_fixtures.FIXDIR
