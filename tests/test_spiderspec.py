"""SpiderSpec (easy_scrapy analogue): wire a brand-new spider — different
parse logic, different item schema, no codegen — through the same engine, and
keep bit-exact parity with the simulator running the same spec.
"""

import json

from spiderman_spark import corpusgen as cg
from spiderman_spark import simulator as sim
from spiderman_spark.functions.scalars import DIRTY_WORDS  # noqa: F401 (import check)
from spiderman_spark.plans.crawl import CrawlConfig, CrawlEngine
from spiderman_spark.spiderspec import ZHIFANG, SpiderSpec

SPEC = cg.UNIT


def pricebot_parse(url, body):
    """A new spider: list pages only, one price row per listing, no children."""
    doc = json.loads(body)
    if doc.get("kind") != "list":
        return [], []
    items = [
        (
            "pricebot_prices",
            {
                "pagenum": str(doc["pagenum"]),
                "title": row["title"],
                "price_raw": row["price"],
            },
        )
        for row in doc["rows"]
    ]
    return items, []


PRICEBOT = SpiderSpec(
    name="pricebot",
    item_tables={"pricebot_prices": "pagenum string, title string, price_raw string"},
    callbacks={"list": True},
    parse=pricebot_parse,
    page_callbacks=("list",),
)


def test_custom_spider_through_engine(spark, workdir):
    corpus = cg.build_crawl_corpus(spark, SPEC)
    engine = CrawlEngine(
        spark, corpus, workdir,
        CrawlConfig(callbacks=dict(PRICEBOT.callbacks), default_budget=3,
                    spider="pricebot"),
        spec=PRICEBOT,
    )
    seeds = sim.make_seeds(SPEC)
    engine.seed(seeds)
    summary = engine.run()

    ref = sim.simulate_crawl(
        sim.corpus_as_dict(SPEC), seeds,
        politeness=sim.Politeness(max_per_round=3),
        callbacks=dict(PRICEBOT.callbacks),
        parse_fn=pricebot_parse,
        page_callbacks=PRICEBOT.page_callbacks,
    )
    got_order = [
        (r["rank"], r["round"], r["url"]) for r in engine.crawl_order().orderBy("rank").collect()
    ]
    assert got_order == [(a, b, c) for a, b, c, _, _ in ref.crawl_order]
    assert summary["rounds"] == ref.rounds

    items = engine.items("pricebot_prices")
    assert {"pagenum", "title", "price_raw", "keyid", "bizdate", "ctime", "spider"} <= set(items.columns)
    ref_items = ref.items["pricebot_prices"]
    got = sorted(
        (r["pagenum"], r["title"], r["price_raw"]) for r in items.collect()
    )
    want = sorted((i["pagenum"], i["title"], i["price_raw"]) for i in ref_items)
    assert got == want
    assert items.where("spider = 'pricebot'").count() == items.count()
    # list-only spider: no detail/image children ever entered the frontier
    assert engine.crawl_order().where("url LIKE '%/detail/%'").count() == 0
