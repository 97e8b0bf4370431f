"""Attachment download job CLI — spark-submit entry point mirroring the
reference's ``python execute_download.py -s zhifang [-b bizdate] [-o]``
(SURVEY.md §3.3, `execute_download.py:17-78`).

    spark-submit --py-files spiderman_spark.zip jobs/download_job.py \
        --workdir /data/crawl-state --bizdate 20240101 \
        [--image-corpus /data/images.parquet] [--overwrite] \
        [--verify-fraction 0.15] [--resume]

Reads the crawl state's ``zhifang_file`` meta table, fetches + decodes +
verifies image bytes, MERGEs statuses back, and appends verified rows to the
``images`` table.  ``-n``/SSH fan-out is replaced by cluster executors.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description="attachment download job")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--pages", type=int, default=10, help="synthetic corpus size")
    ap.add_argument("--bizdate", default="20240101")
    ap.add_argument("--budget", type=int, default=16)
    ap.add_argument("--corpus", default=None, help="status corpus parquet")
    ap.add_argument("--image-corpus", default=None, help="image corpus parquet")
    ap.add_argument("--overwrite", action="store_true")
    ap.add_argument("--verify-fraction", type=float, default=1.0)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("spiderman-spark-download")
        # call-site capture is error-enrichment only; in the crawl loop it
        # is ~0.4 s/round of driver time (same toggle as bench/fleet workers)
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .getOrCreate()
    )
    from spiderman_spark import corpusgen as cg
    from spiderman_spark.plans.crawl import CrawlEngine
    from spiderman_spark.plans.download import DownloadConfig, ImageDownloader

    spec = cg.CorpusSpec(list_pages=args.pages)
    status = (
        spark.read.parquet(args.corpus)
        if args.corpus
        else cg.build_crawl_corpus(spark, spec)
    )
    images = (
        spark.read.parquet(args.image_corpus)
        if args.image_corpus
        else cg.build_image_corpus(spark, spec)
    )
    dl = ImageDownloader(
        spark, status, images, args.workdir,
        DownloadConfig(
            bizdate=args.bizdate,
            default_budget=args.budget,
            overwrite=args.overwrite,
            verify_fraction=args.verify_fraction,
        ),
    )
    if args.resume:
        if not dl.resume():
            print("no checkpoint found", file=sys.stderr)
            return 2
    else:
        file_meta = CrawlEngine(spark, status, args.workdir).items("zhifang_file")
        dl.make_job(file_meta)
    summary = dl.run()
    print(summary)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
