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


def make_patch_seed_df(
    spark: SparkSession,
    list_items: DataFrame,
    detail_items: DataFrame,
    pages: int,
    url_of_page,
) -> DataFrame:
    """Both patch jobs as ONE DataFrame with a deterministic order key — the
    scale path (feed to ``CrawlEngine.seed_from_df(df, ["k0","k1","k2"])``).

    The unbounded side (never-detailed rows, proportional to what the store
    is missing) never leaves the cluster: its URLs come straight from the
    ``detail_full_url`` column of the anti-join.  The missing-list-pages side
    is bounded by the CLI ``-p pages`` argument (reference
    `SP_JOBS/zhifang_job.py:45-56`), so its page→url literal map is
    legitimately driver-sized.

    Order key mirrors ``make_patch_seeds``: list seeds first (k0=0, by
    pagenum), then detail seeds (k0=1, by (pagenum, pkey)).  ``meta_json`` is
    built with the exact ``json.dumps`` spelling (keys are hex/digits — no
    escaping needed) so the two seed paths are byte-identical."""
    if pages >= 1:
        page_url_map = F.create_map(
            *[F.lit(x) for p in range(1, pages + 1) for x in (p, url_of_page(p))]
        )
        list_seeds = missing_list_pages(spark, list_items, pages).select(
            F.lit(0).alias("k0"),
            F.col("pagenum").alias("k1"),
            F.lit("").alias("k2"),
            page_url_map[F.col("pagenum")].alias("url"),
            F.lit("list").alias("callback"),
            F.concat(
                F.lit('{"pagenum": "'), F.col("pagenum").cast("string"), F.lit('"}')
            ).alias("meta_json"),
        )
    else:
        list_seeds = spark.createDataFrame(
            [],
            "k0 int, k1 int, k2 string, url string, callback string,"
            " meta_json string",
        )
    detail_seeds = missing_details(list_items, detail_items).select(
        F.lit(1).alias("k0"),
        F.col("pagenum").cast("int").alias("k1"),
        F.col("pkey").alias("k2"),
        F.col("detail_full_url").alias("url"),
        F.lit("detail").alias("callback"),
        F.concat(
            F.lit('{"fkey": "'), F.col("pkey"),
            F.lit('", "pagenum": "'), F.col("pagenum"), F.lit('"}'),
        ).alias("meta_json"),
    )
    return list_seeds.unionByName(detail_seeds)


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
