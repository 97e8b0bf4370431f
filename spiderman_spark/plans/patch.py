"""Patch crawl (SURVEY.md §3.2, entry point B) — anti-entropy by relational
difference.

Reference (`/root/reference/SP_JOBS/zhifang_job_patch.py`): the analytic store
is the source of truth for what's been crawled; the frontier is rebuilt from
what's *missing*:

- ``make_list_job`` (`:30-38`): ``SELECT pagenum FROM zhifang_list GROUP BY
  pagenum`` then Python set-difference vs ``range(1, pages+1)`` → re-seed only
  never-crawled list pages (A1 + A2).
- ``make_detail_job`` (`:53-76`): ``list LEFT JOIN detail ON pkey = fkey WHERE
  detail.keyid IS NULL`` → re-request details that were discovered but never
  stored (J1), carrying ``fkey``/``pagenum`` meta.

Spark mapping: both are single left_anti joins — Catalyst picks broadcast vs
shuffle by stats (the pages side is a generated range, always broadcast; the
list↔detail join hash-partitions on the 32-hex pkey, uniformly distributed by
construction so no skew handling is needed).  The resulting requests are
seeded into a fresh CrawlEngine frontier in deterministic order (pagenum for
lists; (pagenum, pkey) for details — the reference's SQL row order is
engine-dependent, this is the deterministic choice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def missing_list_pages(spark: SparkSession, list_items: DataFrame, pages: int) -> DataFrame:
    """A1+A2: pages in [1, pages] with no zhifang_list row. Returns
    (pagenum int) sorted."""
    crawled = list_items.select(F.col("pagenum").cast("int").alias("pagenum")).distinct()
    return (
        spark.range(1, pages + 1)
        .select(F.col("id").cast("int").alias("pagenum"))
        .join(crawled, "pagenum", "left_anti")
        .orderBy("pagenum")
    )


def missing_details(list_items: DataFrame, detail_items: DataFrame) -> DataFrame:
    """J1: list rows whose pkey has no detail row (fkey). Returns
    (detail_full_url, pagenum, pkey) sorted by (pagenum, pkey)."""
    return (
        list_items.select("detail_full_url", "pagenum", "pkey")
        .join(
            detail_items.select(F.col("fkey").alias("pkey")),
            "pkey",
            "left_anti",
        )
        .orderBy(F.col("pagenum").cast("int"), "pkey")
    )


def make_patch_seeds(
    spark: SparkSession,
    list_items: DataFrame,
    detail_items: DataFrame,
    pages: int,
    url_of_page,
) -> list[dict]:
    """Both patch jobs as one ordered seed list: missing list pages first
    (reference pushes list jobs then detail jobs, `zhifang_job_patch.py:97-99`),
    then never-detailed rows with fkey/pagenum meta."""
    seeds = [
        {
            "url": url_of_page(r["pagenum"]),
            "method": "GET",
            "callback": "list",
            "meta": {"pagenum": str(r["pagenum"])},
        }
        for r in missing_list_pages(spark, list_items, pages).collect()
    ]
    seeds += [
        {
            "url": r["detail_full_url"],
            "method": "GET",
            "callback": "detail",
            "meta": {"fkey": r["pkey"], "pagenum": str(r["pagenum"])},
        }
        for r in missing_details(list_items, detail_items).collect()
    ]
    return seeds
