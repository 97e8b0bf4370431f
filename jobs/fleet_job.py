"""Fleet crawl CLI — the reference's ``python SP_JOBS/zhifang_job.py -p P -n N``
multi-worker form (`SP_JOBS/job.py:79-109` spawns N scrapy processes): here
``-n`` launches N host-sharded Spark worker JVMs (plans/fleet.py).

    zip -r spiderman_spark.zip spiderman_spark
    spark-submit --py-files spiderman_spark.zip jobs/fleet_job.py \
        -p 50 -n 4 --cores 8 --fleet-dir /data/fleet \
        [--corpus /data/crawl_corpus.parquet] [--budget 64] [--weighted]

``--weighted`` plans an explicit LPT host->worker assignment from corpus host
counts (in production: from frontier/crawl-history statistics) instead of
hash sharding — the explicit-skew-handling path.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser(description="multi-worker frontier crawl")
    ap.add_argument("-p", "--pages", type=int, default=10)
    ap.add_argument("-n", "--workers", type=int, default=2)
    ap.add_argument("--cores", type=int, default=8, help="cores per worker JVM")
    ap.add_argument("--budget", type=int, default=16)
    ap.add_argument("--fleet-dir", required=True)
    ap.add_argument("--corpus", default=None)
    ap.add_argument("--weighted", action="store_true",
                    help="LPT host assignment by corpus host counts")
    ap.add_argument("--pin-cpus", action="store_true")
    ap.add_argument("--driver-mem", default="8g")
    ap.add_argument("--dont-filter", default="list,detail")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("spiderman-spark-fleet")
        # call-site capture is error-enrichment only; in the crawl loop it
        # is ~0.4 s/round of driver time (same toggle as bench/fleet workers)
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .getOrCreate()
    )
    from spiderman_spark import corpusgen as cg
    from spiderman_spark import simulator as sim
    from spiderman_spark.plans import fleet

    spec = cg.CorpusSpec(list_pages=args.pages)
    if args.corpus:
        corpus_path = args.corpus
    else:
        import tempfile

        corpus_path = tempfile.mkdtemp(prefix="fleet-corpus-") + "/corpus"
        cg.build_crawl_corpus(spark, spec).write.mode("overwrite").parquet(corpus_path)
    nofilter = set(args.dont_filter.split(",")) if args.dont_filter else set()
    callbacks = {cb: cb in nofilter for cb in ("list", "detail")}
    host_map = None
    if args.weighted:
        counts = [
            (r["host"], r["count"])
            for r in spark.read.parquet(corpus_path).groupBy("host").count().collect()
        ]
        host_map = fleet.plan_host_assignment(counts, args.workers)
    res = fleet.run_fleet(
        spark, args.fleet_dir, corpus_path, sim.make_seeds(spec),
        workers=args.workers, cores_per_worker=args.cores, budget=args.budget,
        callbacks=callbacks, driver_mem=args.driver_mem, host_map=host_map,
        pin_cpus=args.pin_cpus,
    )
    res.pop("per_worker", None)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
