"""M8 — streaming skin: one frontier round per micro-batch must produce
results bit-identical to the batch driver loop (and to the simulator).
"""

from spiderman_spark import corpusgen as cg
from spiderman_spark import simulator as sim
from spiderman_spark.plans.crawl import CrawlConfig, CrawlEngine
from spiderman_spark.streaming.runner import StreamingCrawlRunner

from .test_crawl_parity import DEDUP_CBS, assert_parity

SPEC = cg.UNIT


def test_streaming_rounds_match_batch_loop(spark, workdir):
    corpus = cg.build_crawl_corpus(spark, SPEC)
    engine = CrawlEngine(
        spark, corpus, workdir,
        CrawlConfig(callbacks=dict(DEDUP_CBS), default_budget=3),
    )
    seeds = sim.make_seeds(SPEC)
    engine.seed(seeds)
    summary = StreamingCrawlRunner(engine, idle_number=2).run(timeout_sec=600)
    assert summary["rounds"] > 0

    ref = sim.simulate_crawl(
        sim.corpus_as_dict(SPEC), seeds,
        politeness=sim.Politeness(max_per_round=3),
        callbacks={**DEDUP_CBS, "file": False},
    )
    assert_parity(engine, summary, ref)
