"""Two-phase global rank (operators/ranks.py): equals the single-window rank
bit-for-bit, with NO single-partition Exchange in the plan — the scale
property the crawl round relies on (VERDICT round-1 item 3).
"""

import random

from spiderman_spark.operators import ranks

from .test_plans import plan_of


def _ranked(spark, rows, nparts):
    df = spark.createDataFrame(rows, "seq long, payload string").repartition(7)
    part = ranks.range_prepare(df, ["seq"], nparts).persist()
    offsets, total = ranks.collect_offsets(part)
    out = ranks.with_rank(part, ["seq"], "rank", offsets, base=100)
    return part, out, offsets, total


def test_rank_matches_global_window(spark):
    rng = random.Random(5)
    seqs = rng.sample(range(100000), 500)
    rows = [(s, f"p{s}") for s in seqs]
    part, out, offsets, total = _ranked(spark, rows, 8)
    assert total == 500
    got = {r["seq"]: r["rank"] for r in out.collect()}
    want = {s: 100 + i + 1 for i, s in enumerate(sorted(seqs))}
    assert got == want
    part.unpersist()


def test_rank_empty_and_single_partition_inputs(spark):
    part, out, offsets, total = _ranked(spark, [], 8)
    assert total == 0 and out.count() == 0
    part.unpersist()
    part, out, offsets, total = _ranked(spark, [(3, "a"), (1, "b")], 1)
    assert [r["rank"] for r in out.orderBy("seq").collect()] == [101, 102]
    part.unpersist()


def test_rank_plan_has_no_single_partition_exchange(spark):
    rows = [(s, f"p{s}") for s in range(1000)]
    part, out, offsets, total = _ranked(spark, rows, 8)
    plan = plan_of(out)
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" in plan.lower()
    part.unpersist()


def test_round_frames_have_no_single_partition_exchange(spark, workdir):
    """End-to-end: the crawl round's ranked/children frames (the former
    global windows) must carry no single-partition Exchange."""
    from spiderman_spark import corpusgen as cg
    from spiderman_spark import simulator as sim
    from spiderman_spark.operators import politeness
    from spiderman_spark.plans.crawl import CrawlConfig, CrawlEngine

    spec = cg.UNIT
    engine = CrawlEngine(
        spark, cg.build_crawl_corpus(spark, spec), workdir,
        CrawlConfig(callbacks={"list": True, "detail": False}, default_budget=4),
    )
    engine.seed(sim.make_seeds(spec))
    pending = engine._read("frontier", "seq long, url string, host string,"
                           " method string, callback string, req_body string,"
                           " meta_json string, attempt int")
    tagged = politeness.select_eligible(pending, 4, None, 8)
    eligible = tagged.where("is_eligible").drop("is_eligible")
    epart = ranks.range_prepare(eligible, ["seq"], 8)
    offsets, n = ranks.collect_offsets(epart)
    ranked = ranks.with_rank(epart, ["seq"], "rank", offsets)
    plan = plan_of(ranked)
    assert "Exchange SinglePartition" not in plan
    assert n > 0
