"""spark-submit job CLIs (entry-point parity, SURVEY.md §3) and the
kafka-monitor analogue (S18/T6) — batch and streaming paths.
"""

import os
import sys

from spiderman_spark import corpusgen as cg
from spiderman_spark.sources import sinks
from spiderman_spark.streaming.monitor import price_alerts

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))


def test_crawl_job_cli_end_to_end(spark, workdir):
    import crawl_job

    rc = crawl_job.main(["-p", "3", "--budget", "8", "--workdir", workdir])
    assert rc == 0
    # state exists and a resume run is a no-op success
    rc2 = crawl_job.main(["-p", "3", "--budget", "8", "--workdir", workdir, "--resume"])
    assert rc2 == 0


def test_download_job_cli_end_to_end(spark, workdir):
    import crawl_job
    import download_job

    assert crawl_job.main(["-p", "3", "--budget", "8", "--workdir", workdir]) == 0
    rc = download_job.main(
        ["--workdir", workdir, "--pages", "3", "--budget", "8",
         "--verify-fraction", "1.0"]
    )
    assert rc == 0
    from spiderman_spark.plans.download import ImageDownloader, DownloadConfig

    dl = ImageDownloader(
        spark, cg.build_crawl_corpus(spark, cg.CorpusSpec(list_pages=3)),
        cg.build_image_corpus(spark, cg.CorpusSpec(list_pages=3)),
        workdir, DownloadConfig(),
    )
    imgs = dl.images()
    assert imgs.count() > 0
    assert imgs.where("verified").count() == imgs.count()


def test_price_monitor_batch_and_stream(spark, workdir):
    # batch path over a kafka-shaped frame from real items
    items = spark.createDataFrame(
        [("a", "单价7999元"), ("b", "单价8000元"), ("c", "单价3000元"), ("d", "n/a")],
        "title string, price string",
    )
    frame = sinks.kafka_frame(items, "zhifang_list", "2024-01-01 00:00:00")
    alerts = price_alerts(frame, threshold=8000)
    got = {(r["tablename"], r["price_value"]) for r in alerts.collect()}
    assert got == {("zhifang_list", 7999), ("zhifang_list", 3000)}

    # streaming path: same Column logic on a file stream of the same frame
    src_dir = os.path.join(workdir, "frames")
    frame.write.mode("overwrite").json(src_dir)
    stream = spark.readStream.schema("key string, value string").json(src_dir)
    q = (
        price_alerts(stream, threshold=8000)
        .writeStream.format("memory")
        .queryName("alerts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT tablename, price_value FROM alerts").collect()
    assert {(r["tablename"], r["price_value"]) for r in rows} == got
