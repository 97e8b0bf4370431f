"""CrawlFleet (plans/fleet.py): host-sharded multi-worker crawl must produce
the SAME result sets as the single-engine crawl — fetched-URL multiset,
url_seen fingerprints, item multisets, failed set (global FIFO order is
per-worker, as in the reference's N scrapy processes).
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from spiderman_spark import corpusgen as cg
from spiderman_spark import simulator as sim
from spiderman_spark.plans import fleet
from spiderman_spark.plans.crawl import CrawlConfig, CrawlEngine

SPEC = cg.UNIT
CBS = {"list": True, "detail": False}


def _shard_seeds(spark, seeds, workers):
    df = spark.createDataFrame(
        [(i, s["url"].split("/", 3)[2]) for i, s in enumerate(seeds)],
        "i long, host string",
    ).withColumn("_w", fleet.shard_of_expr(F.col("host"), workers))
    by_w = {r["i"]: r["_w"] for r in df.collect()}
    out = [[] for _ in range(workers)]
    for i, s in enumerate(seeds):
        out[by_w[i]].append(s)
    return out


def _collect_sets(order_df, seen_df, failed_df):
    urls = sorted(r["url"] for r in order_df.collect())
    seen = {r["fp"] for r in seen_df.collect()}
    failed = sorted(r["url"] for r in failed_df.collect())
    return urls, seen, failed


def test_fleet_two_workers_equals_single_engine(spark, workdir):
    corpus = cg.build_crawl_corpus(spark, SPEC)
    seeds = sim.make_seeds(SPEC)

    single = CrawlEngine(
        spark, corpus, workdir + "-single",
        CrawlConfig(callbacks=dict(CBS), default_budget=4),
    )
    single.seed(seeds)
    single.run()
    s_urls, s_seen, s_failed = _collect_sets(
        single.crawl_order(), single.url_seen(), single.failed()
    )

    W = 2
    fd = workdir + "-fleet"
    os.makedirs(fd, exist_ok=True)
    engines = [
        CrawlEngine(
            spark, corpus, os.path.join(fd, f"worker{w}"),
            CrawlConfig(callbacks=dict(CBS), default_budget=4),
            shard=(w, W), fleet_dir=fd,
        )
        for w in range(W)
    ]
    for e, sds in zip(engines, _shard_seeds(spark, seeds, W)):
        e.seed(sds)

    # drive the two workers concurrently by alternation until quiescent
    for _ in range(200):
        progressed = 0
        for e in engines:
            progressed += e.ingest_handoff()
            progressed += e.step()
        exported = sum(e.handoff_exported for e in engines)
        consumed = sum(e.handoff_consumed for e in engines)
        if progressed == 0 and exported == consumed:
            break
    else:
        pytest.fail("fleet did not quiesce")

    f_urls = sorted(
        u
        for e in engines
        for u in (r["url"] for r in e.crawl_order().collect())
    )
    f_seen = set().union(*({r["fp"] for r in e.url_seen().collect()} for e in engines))
    f_failed = sorted(
        u for e in engines for u in (r["url"] for r in e.failed().collect())
    )
    assert f_urls == s_urls  # same fetch multiset (incl. retries)
    assert f_seen == s_seen
    assert f_failed == s_failed
    # host ownership respected: every fetch happened on the owning worker
    for w, e in enumerate(engines):
        hosts = {r["host"] for r in e.crawl_order().collect()}
        if hosts:
            got = spark.createDataFrame([(h,) for h in hosts], "host string")
            owned = got.withColumn("_w", fleet.shard_of_expr(F.col("host"), W))
            assert all(r["_w"] == w for r in owned.collect())
    # item multisets match (union across workers)
    for tb in ("zhifang_list", "zhifang_detail", "zhifang_file"):
        cols = None
        f_rows = []
        for e in engines:
            df = e.items(tb).drop("keyid", "ctime")
            cols = cols or sorted(df.columns)
            f_rows += [tuple(r[c] for c in cols) for r in df.select(*cols).collect()]
        sdf = single.items(tb).drop("keyid", "ctime")
        s_rows = [tuple(r[c] for c in cols) for r in sdf.select(*cols).collect()]
        assert sorted(f_rows) == sorted(s_rows), tb


def test_fleet_subprocess_coordinator(spark, workdir, tmp_path):
    """End-to-end: real worker processes (own JVMs) + coordinator quiescence.
    Small corpus, 2 workers x 2 cores."""
    corpus_path = os.path.join(workdir, "corpus")
    cg.build_crawl_corpus(spark, SPEC).write.mode("overwrite").parquet(corpus_path)
    fd = os.path.join(workdir, "fleet")
    res = fleet.run_fleet(
        spark, fd, corpus_path, sim.make_seeds(SPEC),
        workers=2, cores_per_worker=2, budget=8, callbacks=dict(CBS),
    )
    ref = sim.simulate_crawl(
        sim.corpus_as_dict(SPEC), sim.make_seeds(SPEC),
        politeness=sim.Politeness(max_per_round=8),
        callbacks={**CBS, "file": False},
    )
    assert res["workers"] == 2
    assert res["fetched"] == len(ref.crawl_order)
    assert os.path.exists(os.path.join(fd, "STOP"))
