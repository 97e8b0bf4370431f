"""Patch crawl (SURVEY.md §3.2): losses in the item tables are re-derived
relationally and re-crawled to completeness.
"""

from pyspark.sql import functions as F

from spiderman_spark import corpusgen as cg
from spiderman_spark import simulator as sim
from spiderman_spark.plans import patch
from spiderman_spark.plans.crawl import CrawlConfig, CrawlEngine

SPEC = cg.UNIT
CBS = {"list": True, "detail": False}


def crawl(spark, wd, seeds):
    engine = CrawlEngine(
        spark, cg.build_crawl_corpus(spark, SPEC), wd,
        CrawlConfig(callbacks=dict(CBS), default_budget=8),
    )
    engine.seed(seeds)
    engine.run()
    return engine


def test_patch_rederives_missing_work(spark, workdir):
    full = crawl(spark, workdir + "-full", sim.make_seeds(SPEC))
    list_full = full.items("zhifang_list")
    detail_full = full.items("zhifang_detail")

    # damage: drop every list row of pages {2, 4} and details of one page
    list_lost = list_full.where(~F.col("pagenum").isin("2", "4"))
    detail_lost = detail_full.join(
        list_full.where(F.col("pagenum") == "3").select(F.col("pkey").alias("fkey")),
        "fkey",
        "left_anti",
    )

    # relational re-derivation (A2 + J1)
    miss_pages = patch.missing_list_pages(spark, list_lost, SPEC.list_pages)
    assert [r["pagenum"] for r in miss_pages.collect()] == [2, 4]
    miss_det = patch.missing_details(list_lost, detail_lost)
    # page-3 details are missing; pages 2/4 rows are gone from list so they
    # can't appear in the detail patch (they return via the list patch)
    assert {r["pagenum"] for r in miss_det.collect()} == {"3"}

    seeds = patch.make_patch_seeds(
        spark, list_lost, detail_lost, SPEC.list_pages,
        lambda p: cg.list_url(SPEC, p),
    )
    assert [s["callback"] for s in seeds[:2]] == ["list", "list"]
    patched = crawl(spark, workdir + "-patch", seeds)

    # union of surviving + patched tables reaches full coverage
    list_all = list_lost.unionByName(patched.items("zhifang_list"))
    detail_all = detail_lost.unionByName(patched.items("zhifang_detail"))
    assert {r["pagenum"] for r in list_all.select("pagenum").distinct().collect()} == {
        str(p) for p in range(1, SPEC.list_pages + 1)
    }
    # every discovered pkey has a detail row (modulo urls whose detail fetch
    # failed persistently in the corpus — those fail in the full crawl too)
    full_pkeys = {r["pkey"] for r in list_full.select("pkey").distinct().collect()}
    full_fkeys = {r["fkey"] for r in detail_full.select("fkey").distinct().collect()}
    got_fkeys = {r["fkey"] for r in detail_all.select("fkey").distinct().collect()}
    assert got_fkeys == full_fkeys
    assert full_pkeys - got_fkeys == full_pkeys - full_fkeys  # same persistent failures

    # and the list-item multiset for recovered pages matches the original
    rec = patched.items("zhifang_list").where(F.col("pagenum").isin("2", "4"))
    orig = list_full.where(F.col("pagenum").isin("2", "4"))
    cols = ["title", "desc", "location", "price", "detail_full_url", "pkey", "pagenum"]
    assert sorted(map(tuple, rec.select(*cols).collect())) == sorted(
        map(tuple, orig.select(*cols).collect())
    )
