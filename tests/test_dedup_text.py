"""Text near-dup operators: MinHash+LSH recall vs exact Jaccard, SimHash
hamming properties (both hash families), on top of the full DuckDB oracles in
test_entry_oracle.py.
"""

import os

from pyspark.sql import functions as F

from spiderman_spark.operators import dedup

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_minhash_lsh_subset_and_recall(spark):
    """LSH pairs verify candidates exactly → subset of the exact pairs; the
    banded sketch must keep recall high at the operating threshold."""
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.jaccard_pairs(docs, "doc_id", "text", n=1, threshold=0.6).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", n=1, k=32, bands=8, threshold=0.6
        ).collect()
    }
    assert lsh <= exact
    assert exact and len(lsh) / len(exact) >= 0.9, (len(lsh), len(exact))


def _hamming_hex(a: str, b: str) -> int:
    return bin(int(a, 16) ^ int(b, 16)).count("1")


def test_simhash_properties_both_families(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank " * 4
    near = base.replace("lazy", "idle")
    far = "completely different words about astrophysics and galaxy rotation curves " * 4
    df = spark.createDataFrame(
        [("d1", base), ("d2", base), ("d3", near), ("d4", far)],
        "doc_id string, text string",
    )
    hx = {r["did"]: r["simhash_hex"] for r in dedup.simhash_hex(df, "doc_id", "text").collect()}
    assert len(hx["d1"]) == 16 and set(hx["d1"]) <= set("0123456789abcdef")
    assert hx["d1"] == hx["d2"]  # identical text → identical hash
    assert _hamming_hex(hx["d1"], hx["d3"]) <= 12  # near-dup → close
    assert _hamming_hex(hx["d1"], hx["d4"]) > 16  # unrelated → far
    xx = {r["did"]: r["simhash"] for r in dedup.simhash(df, "doc_id", "text").collect()}
    assert xx["d1"] == xx["d2"]
    assert bin((xx["d1"] ^ xx["d3"]) & ((1 << 64) - 1)).count("1") <= 12
    assert bin((xx["d1"] ^ xx["d4"]) & ((1 << 64) - 1)).count("1") > 16
