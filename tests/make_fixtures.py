"""Materialize oracle fixtures the DuckDB side cannot compute itself:

- q27/q28: SIMULATOR-derived expected outputs for the end-to-end crawl
  queries (single-threaded scrapy-redis-semantics oracle + pure corpus/image
  generators — independent of the Spark engine).
- q34: per-(permutation, gram) xxhash64 values for the fast MinHash family,
  computed by the INDEPENDENT pure-Python ``functions.xxh64`` over the
  distinct tokens of the driver's sf0.01 documents table (DuckDB has no
  xxhash64; the Python and JVM implementations are cross-checked in
  tests/test_xxh64.py, so this fixture is not an echo of the engine).

NO Spark code runs here.  ``tests/test_entry_oracle.py::
test_fixture_files_current`` regenerates everything and fails on drift.

Regenerate with:  python tests/make_fixtures.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from spiderman_spark import corpusgen as cg
from spiderman_spark import imagecodec as ic
from spiderman_spark import simulator as sim

FIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")

# must mirror q27/q28 in __spark_entry__.py
SPEC = cg.UNIT
CALLBACKS = {"list": True, "detail": False, "file": False}
BUDGET = 16


def crawl_ref() -> sim.SimResult:
    return sim.simulate_crawl(
        sim.corpus_as_dict(SPEC),
        sim.make_seeds(SPEC),
        politeness=sim.Politeness(max_per_round=BUDGET),
        callbacks=dict(CALLBACKS),
    )


def q27_expected() -> pd.DataFrame:
    ref = crawl_ref()
    df = pd.DataFrame(
        ref.crawl_order, columns=["rank", "round", "url", "host", "attempt"]
    )
    # q27's config carries no U3 middleware: the engine stamps empty ua/cookie
    df["ua"] = ""
    df["cookie"] = ""
    return df.astype(
        {"rank": "int64", "round": "int32", "attempt": "int32"}
    )


def q28_expected() -> pd.DataFrame:
    """Expected images-table projection (image_id, w, h, fmt, phash, verified).

    Success is order-independent: http_status is a pure function of the url,
    so a file URL discovered by the crawl downloads iff its status is 200
    (retryable codes are persistent → retries exhaust; missing/non-retryable
    fail immediately).  verified=True because the corpus images decode to
    exactly their declared metadata by construction (full-verify config)."""
    ref = crawl_ref()
    urls = sorted({it["file_url"] for it in ref.items.get("zhifang_file", [])})
    rows = []
    for url in urls:
        if cg.http_status(SPEC, url) != 200:
            continue
        image_id = cg.md5_upper(url)
        w, h = ic.gen_dims(SPEC.seed, image_id, SPEC.img_lo, SPEC.img_hi)
        fmt = ic.pick_fmt(SPEC.seed, image_id)
        px = ic.gen_pixels(SPEC.seed, image_id, w, h)
        rows.append((image_id, w, h, fmt, ic.average_phash(px), True))
    df = pd.DataFrame(
        rows, columns=["image_id", "w", "h", "fmt", "phash", "verified"]
    )
    return df.astype({"w": "int32", "h": "int32", "phash": "int64"})


TESTDATA_SFS = ("sf0.001", "sf0.01", "sf0.1")  # oracle runs at sf0.01;
# pytest at sf0.001 — cover every scale's vocabulary (identical by generator
# construction; the union guards against that assumption)
MINHASH_K = 32  # must mirror q34_minhash_lsh_fast


def q34_gram_hashes() -> pd.DataFrame:
    """(i, g, h): signed xxhash64('<i>:' || gram) for every distinct token of
    the driver documents tables × every MinHash permutation, from the pure-
    Python reference implementation (same tokenization as word_ngrams n=1 /
    the q18 oracle's regexp_split_to_array(trim(text), '\\s+'))."""
    import re

    import pyarrow.parquet as pq

    from spiderman_spark.functions.xxh64 import xxh64_signed

    grams: set[str] = set()
    for sf in TESTDATA_SFS:
        path = os.path.join("/root/testdata", sf, "documents.parquet")
        if not os.path.exists(path):
            continue
        for t in pq.read_table(path, columns=["text"]).column("text").to_pylist():
            # SUPERSET of the engine's tokens: Spark's Java \s and trim are
            # ASCII-only while Python's are Unicode, so split with re.ASCII
            # over both the raw and the Python-stripped text — extra grams
            # are harmless (the oracle inner-joins on g), missing grams
            # silently corrupt the DuckDB-side signature minima
            for variant in ((t or ""), (t or "").strip()):
                grams.update(re.split(r"\s+", variant, flags=re.ASCII))
    rows = [
        (i, g, xxh64_signed(f"{i}:{g}".encode()))
        for g in sorted(grams)
        for i in range(MINHASH_K)
    ]
    return pd.DataFrame(rows, columns=["i", "g", "h"]).astype(
        {"i": "int32", "h": "int64"}
    )


def write_all(outdir: str = FIXDIR) -> dict:
    os.makedirs(outdir, exist_ok=True)
    out = {
        "q27_crawl_order.parquet": q27_expected(),
        "q28_images.parquet": q28_expected(),
        "q34_gram_hashes.parquet": q34_gram_hashes(),
    }
    for name, df in out.items():
        df.to_parquet(os.path.join(outdir, name), index=False)
    return {k: len(v) for k, v in out.items()}


if __name__ == "__main__":
    print(write_all())
