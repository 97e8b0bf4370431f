"""Materialize SIMULATOR-derived expected outputs for the end-to-end crawl
queries (q27 crawl order, q28 image download) as parquet fixtures, so the
driver's DuckDB oracle can check them with ``read_parquet(...)`` instead of a
rows-only pass (round-1 VERDICT next-step #6).

The fixtures come from the single-threaded reference simulator
(spiderman_spark.simulator — the scrapy-redis-semantics oracle, independent
of the Spark engine) plus the pure corpus/image generators; NO Spark code
runs here.  ``tests/test_entry_oracle.py::test_fixture_files_current``
regenerates them and fails if the committed files drift.

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


def write_all(outdir: str = FIXDIR) -> dict:
    os.makedirs(outdir, exist_ok=True)
    out = {
        "q27_crawl_order.parquet": q27_expected(),
        "q28_images.parquet": q28_expected(),
    }
    for name, df in out.items():
        df.to_parquet(os.path.join(outdir, name), index=False)
    return {k: len(v) for k, v in out.items()}


if __name__ == "__main__":
    print(write_all())
