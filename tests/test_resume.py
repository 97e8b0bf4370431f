"""M7 — checkpoint/resume: kill the crawl after round k (with a torn partial
append), resume from the snapshot manifests, and end bit-identical to an
uninterrupted run (north rule: resumable from snapshot checkpoints).
"""

from spiderman_spark import corpusgen as cg
from spiderman_spark import simulator as sim
from spiderman_spark.plans.crawl import CrawlConfig, CrawlEngine

from .test_crawl_parity import DEDUP_CBS, assert_parity

SPEC = cg.UNIT


def build(spark, wd):
    corpus = cg.build_crawl_corpus(spark, SPEC)
    return CrawlEngine(
        spark, corpus, wd,
        CrawlConfig(callbacks=dict(DEDUP_CBS), default_budget=3),
    )


def test_crawl_kill_resume_bit_identical(spark, workdir):
    seeds = sim.make_seeds(SPEC)

    engine = build(spark, workdir)
    engine.seed(seeds)
    engine.step()
    engine.step()  # two committed rounds
    # torn write: a crash mid-round leaves appends past the checkpoint
    engine.catalog.table("crawl_order").append(
        spark.createDataFrame(
            [(12345, 777, "http://torn/x", "torn", 0, "", "")],
            "rank long, round int, url string, host string, attempt int,"
            " ua string, cookie string",
        )
    )
    engine.catalog.table("url_seen").append(
        spark.createDataFrame(
            [("deadbeef", 1, "http://torn/x")], "fp string, url_hash long, url string"
        )
    )

    resumed = build(spark, workdir)
    assert resumed.resume()
    assert resumed.round == 2
    assert resumed.crawl_order().where("round = 777").count() == 0
    assert resumed.url_seen().where("fp = 'deadbeef'").count() == 0
    summary = resumed.run()

    ref = sim.simulate_crawl(
        sim.corpus_as_dict(SPEC), seeds,
        politeness=sim.Politeness(max_per_round=3),
        callbacks={**DEDUP_CBS, "file": False},
    )
    # resumed.run() reports only post-resume rounds; take the table's truth
    full_summary = {
        "rounds": resumed.round,
        "fetched": resumed.crawl_order().count(),
    }
    assert_parity(resumed, full_summary, ref)


def test_resume_is_noop_after_clean_finish(spark, workdir):
    engine = build(spark, workdir)
    engine.seed(sim.make_seeds(SPEC))
    engine.run()
    order_before = engine.crawl_order().count()
    again = build(spark, workdir)
    assert again.resume()
    assert again.step() == 0  # frontier exhausted — nothing re-fetched
    assert again.crawl_order().count() == order_before
