"""Physical-plan quality gates: the optimizations the 100 TB posture relies
on must actually appear in the plans — broadcast joins for small sides,
predicate pushdown into parquet scans, column pruning, and no Python row
processing outside Arrow stages.
"""

import os

from pyspark.sql import functions as F

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def plan_of(df) -> str:
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_fk_join_broadcasts_dim_side(spark):
    plan = plan_of(entrymod.q13_join_agg_revenue(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_rollup_pushes_filter_and_prunes_columns(spark):
    plan = plan_of(entrymod.q14_lineitem_rollup(spark, SF_DIR))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or "l_shipdate" in plan.split("PushedFilters")[1].split("]")[0]
    # only the needed columns reach the scan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_comment" not in read_schema and "l_orderkey" not in read_schema
    assert "l_quantity" in read_schema


def test_anti_join_is_broadcast(spark):
    plan = plan_of(entrymod.q01_patch_antijoin(spark, SF_DIR))
    assert "LeftAnti, BuildRight" in plan or "BroadcastHashJoin" in plan


def test_status_filter_pushed_to_scan(spark):
    plan = plan_of(entrymod.q06_status_filter(spark, SF_DIR))
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "event_type" in pushed and "value" in pushed


def test_crawl_fetch_join_broadcasts_batch_not_corpus(spark):
    """The per-round eligible batch must be the broadcast side; the corpus
    scan must never shuffle (SURVEY.md J3 / crawl.py scale posture)."""
    from spiderman_spark import corpusgen as cg

    corpus = cg.build_crawl_corpus(spark, cg.UNIT)
    batch = spark.createDataFrame(
        [(0, cg.list_url(cg.UNIT, 1))], "seq long, url string"
    )
    fetched = corpus.join(F.broadcast(batch), "url", "inner")
    plan = plan_of(fetched)
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan  # corpus side not shuffled


def test_dedup_exact_partial_aggregation(spark):
    """exact dedup must do map-side partial aggregation (two HashAggregates
    around one exchange), not shuffle raw rows."""
    plan = plan_of(entrymod.q16_dedup_exact(spark, SF_DIR))
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_whole_stage_codegen_covers_relational_queries(spark):
    """AQE wraps plans in AdaptiveSparkPlan before execution, hiding codegen
    markers — disable it briefly to assert the rollup compiles into
    whole-stage-codegen'd stages."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = plan_of(entrymod.q14_lineitem_rollup(spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "codegen id" in plan  # Spark 4 formatted-mode codegen marker


def test_parse_rebalance_modes_are_semantically_neutral(spark, tmp_path):
    """The BENCH_XXL hub-skew fix (parse_rebalance) must not change results:
    engine == simulator bit-for-bit with the knob OFF too (the ON mode is
    covered by the whole parity suite)."""
    from spiderman_spark import corpusgen as cg
    from spiderman_spark import simulator as sim
    from spiderman_spark.plans.crawl import CrawlConfig, CrawlEngine

    cfg = CrawlConfig(
        callbacks={"list": True, "detail": True}, parse_rebalance=False
    )
    assert CrawlConfig().parse_rebalance is True  # default ON
    engine = CrawlEngine(
        spark, cg.build_crawl_corpus(spark, cg.UNIT), str(tmp_path), cfg
    )
    seeds = sim.make_seeds(cg.UNIT)
    engine.seed(seeds)
    engine.run()
    ref = sim.simulate_crawl(
        sim.corpus_as_dict(cg.UNIT), seeds,
        callbacks={"list": True, "detail": True, "file": False},
    )
    got = [
        (r["rank"], r["round"], r["url"], r["host"], r["attempt"])
        for r in engine.crawl_order().orderBy("rank").collect()
    ]
    assert got == ref.crawl_order


def _exchange_blocks(plan: str) -> list[str]:
    """Split a formatted plan's detail section into per-node blocks and
    return those that are shuffle Exchanges."""
    blocks, cur = [], []
    for line in plan.splitlines():
        if line.startswith("(") and ") " in line:
            if cur:
                blocks.append("\n".join(cur))
            cur = [line]
        elif cur:
            cur.append(line)
    if cur:
        blocks.append("\n".join(cur))
    return [b for b in blocks if b.split("\n", 1)[0].rstrip().endswith("Exchange")]


def test_embedding_lsh_band_exchanges_are_narrow(spark):
    """Round-4 verdict #2: the embedding-LSH band self-joins must shuffle
    only (id, sketch-long) rows — no Exchange keyed on a band slice
    (shiftright of the sketch) may carry an embedding vector column.  At
    production dims a vector-carrying band exchange multiplies the dominant
    shuffle's bytes by ~bands×."""
    from spiderman_spark.operators import similarity

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    dim = len(emb.select("embedding").first()[0])
    lazy = similarity.embedding_neardup_lsh(
        emb, dim=dim, threshold=0.35, materialize=False
    )
    plan = plan_of(lazy)
    band_exchanges = [
        b for b in _exchange_blocks(plan) if "shiftright" in b
    ]
    assert band_exchanges, "expected band-keyed exchanges in the lazy plan"
    for b in band_exchanges:
        input_line = next(l for l in b.splitlines() if l.startswith("Input"))
        assert "va" not in input_line and "vb" not in input_line and "vec" not in input_line, b


def test_embedding_verify_broadcast_gate_is_bytes_aware(spark):
    """A row-count-only gate would force a multi-GB broadcast at production
    embedding dims; the verify-join gate must also bound estimated bytes."""
    from spiderman_spark.operators.similarity import _verify_broadcast_ok

    mb256 = 256 << 20
    assert _verify_broadcast_ok(10_000, 64, 2_000_000, mb256)
    # 1M rows x 4096 dims: under the row cap, ~32 GB estimated -> refused
    assert not _verify_broadcast_ok(1_000_000, 4096, 2_000_000, mb256)
    # same rows at small dim: fine
    assert _verify_broadcast_ok(400_000, 64, 2_000_000, mb256)
    # over the row cap always refused; unknown count (lazy mode) refused
    assert not _verify_broadcast_ok(3_000_000, 8, 2_000_000, mb256)
    assert not _verify_broadcast_ok(None, 8, 2_000_000, mb256)
