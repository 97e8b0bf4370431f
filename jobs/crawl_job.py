"""Crawl job CLI — spark-submit entry point mirroring the reference's
``python SP_JOBS/zhifang_job.py -p <pages> -n <workers>`` (SURVEY.md §3.1).

Ship the package with:

    zip -r spiderman_spark.zip spiderman_spark
    spark-submit --py-files spiderman_spark.zip jobs/crawl_job.py \
        -p 10 --budget 64 --workdir /data/crawl-state \
        [--corpus /data/crawl_corpus.parquet] [--patch] [--streaming] [--resume]

``-n`` (worker count) has no analogue: parallelism comes from the cluster
(``--num-executors``), which is the whole point of the Spark rewrite.
Without ``--corpus`` the deterministic synthetic web (corpusgen) plays the
network, sized by ``-p``.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="frontier crawl job")
    ap.add_argument("-p", "--pages", type=int, default=10)
    ap.add_argument("--budget", type=int, default=16, help="per-host fetches/round")
    ap.add_argument("--workdir", required=True, help="state-table directory")
    ap.add_argument("--corpus", default=None, help="crawl corpus parquet path")
    ap.add_argument("--patch", action="store_true", help="patch-crawl missing work")
    ap.add_argument("--streaming", action="store_true", help="rounds as micro-batches")
    ap.add_argument("--resume", action="store_true", help="resume from checkpoint")
    ap.add_argument("--dont-filter", default="list,detail",
                    help="callbacks that skip the dupefilter (csv)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("spiderman-spark-crawl")
        # call-site capture is error-enrichment only; in the crawl loop it
        # is ~0.4 s/round of driver time (same toggle as bench/fleet workers)
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .getOrCreate()
    )
    from spiderman_spark import corpusgen as cg
    from spiderman_spark import simulator as sim
    from spiderman_spark.plans.crawl import CrawlConfig, CrawlEngine

    spec = cg.CorpusSpec(list_pages=args.pages)
    corpus = (
        spark.read.parquet(args.corpus)
        if args.corpus
        else cg.build_crawl_corpus(spark, spec)
    )
    nofilter = set(args.dont_filter.split(",")) if args.dont_filter else set()
    cfg = CrawlConfig(
        callbacks={cb: cb in nofilter for cb in ("list", "detail")},
        default_budget=args.budget,
    )
    engine = CrawlEngine(spark, corpus, args.workdir, cfg)

    if args.resume:
        if not engine.resume():
            print("no checkpoint found", file=sys.stderr)
            return 2
    elif args.patch:
        from spiderman_spark.plans import patch

        seeds = patch.make_patch_seeds(
            spark,
            engine.items("zhifang_list"),
            engine.items("zhifang_detail"),
            args.pages,
            lambda p: cg.list_url(spec, p),
        )
        # frontier-only reseed: the previously crawled items/url_seen in this
        # workdir are exactly what the patch completes — never reset them
        engine.seed(seeds, preserve_state=True)
    else:
        engine.seed(sim.make_seeds(spec))

    if args.streaming:
        from spiderman_spark.streaming.runner import StreamingCrawlRunner

        summary = StreamingCrawlRunner(engine).run()
    else:
        summary = engine.run()
    print(summary)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
