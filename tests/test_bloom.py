"""Bloom filter tests (SURVEY.md §5.2.4): bit-level equivalence with the
reference algorithm (`/root/reference/SP/bloom_dupefilter.py:28-51`), measured
FP rate, distributed-build equivalence, and crawl-parity with the pre-filter on.
"""

import random
import string
from hashlib import md5

import numpy as np
import pytest

from spiderman_spark import corpusgen as cg
from spiderman_spark import simulator as sim
from spiderman_spark.operators.bloom import (
    SEEDS,
    BloomConfig,
    BloomSet,
    bit_indices,
    build_bloom,
)
from spiderman_spark.plans.crawl import CrawlConfig, CrawlEngine

from .test_crawl_parity import DEDUP_CBS, assert_parity


# ---- independent oracle: full-precision Python ints, straight from the
# documented reference math (m = mem*8*2^20 bits; shard = int(hex[:2],16)%num;
# per seed: ret = ret + seed*ret + ord(ch) over hexdigest chars; ret & (m-1)).

def oracle_indices(value: str, cfg: BloomConfig):
    hexd = md5(value.encode()).hexdigest()
    shard = int(hexd[0:2], 16) % cfg.num_shards
    out = []
    for seed in SEEDS[: cfg.k]:
        ret = 0
        for ch in hexd:
            ret += seed * ret + ord(ch)  # arbitrary precision, no wrap
        out.append(ret & (cfg.m_bits - 1))
    return shard, out


def rand_strings(n, rng):
    return [
        "".join(rng.choices(string.ascii_letters + string.digits + ":/._?&", k=rng.randint(5, 60)))
        for _ in range(n)
    ]


@pytest.mark.parametrize(
    "cfg",
    [
        BloomConfig(num_shards=1, mem_mb=1, k=7),
        BloomConfig(num_shards=4, mem_mb=2, k=5),
        BloomConfig(num_shards=3, mem_mb=256, k=7),  # reference default mem/k
    ],
    ids=["1shard", "4shard-k5", "refmem"],
)
def test_bit_indices_match_reference_math(cfg):
    rng = random.Random(1234)
    values = rand_strings(500, rng) + [f"http://h{i}.test/p/{i}" for i in range(100)]
    shards, idx = bit_indices(values, cfg)
    for i, v in enumerate(values):
        o_shard, o_idx = oracle_indices(v, cfg)
        assert shards[i] == o_shard, v
        assert list(idx[i]) == o_idx, v


def test_add_then_contains_and_fp_rate():
    cfg = BloomConfig(num_shards=2, mem_mb=1, k=7)  # m = 2^23 bits ≈ 8.4M
    rng = random.Random(99)
    added = rand_strings(5000, rng)
    probes = rand_strings(20000, rng)
    bs = BloomSet(cfg)
    bs.add_many(added)
    # no false negatives, ever
    assert bs.contains_many(added).all()
    # FP rate ≈ (1 - e^{-kn/m})^k; n=5000/2 shards, m=2^23 → ~1e-15; with the
    # shard split FP should be essentially zero at this load. Allow slack.
    fresh = [p for p in probes if p not in set(added)]
    fp = bs.contains_many(fresh).mean()
    assert fp < 0.001, fp


def test_distributed_build_matches_driver_build(spark):
    cfg = BloomConfig(num_shards=4, mem_mb=1, k=7)
    rng = random.Random(7)
    values = rand_strings(3000, rng)
    df = spark.createDataFrame([(v,) for v in values], "fp string").repartition(8)
    dist = build_bloom(df, "fp", cfg)
    local = BloomSet(cfg)
    local.add_many(values)
    assert np.array_equal(dist.bitmaps, local.bitmaps)


def test_crawl_parity_with_bloom_prefilter(spark, workdir):
    """The pre-filter must not change results: exact anti-join stays the
    source of truth (README.md:169 missed-crawl risk stays at zero)."""
    spec = cg.UNIT
    corpus_df = cg.build_crawl_corpus(spark, spec)
    engine = CrawlEngine(
        spark,
        corpus_df,
        workdir,
        CrawlConfig(
            callbacks=dict(DEDUP_CBS),
            default_budget=3,
            bloom=BloomConfig(num_shards=2, mem_mb=1, k=7),
        ),
    )
    seeds = sim.make_seeds(spec)
    engine.seed(seeds)
    summary = engine.run()
    ref = sim.simulate_crawl(
        sim.corpus_as_dict(spec), seeds,
        politeness=sim.Politeness(max_per_round=3),
        callbacks={**DEDUP_CBS, "file": False},
    )
    assert_parity(engine, summary, ref)
    # broadcast lifecycle: superseded bitmap broadcasts are destroyed on merge
    # (no per-round leak) and at most one handle is ever live
    assert engine.bloom_broadcasts_dropped >= 1
    # the engine's merged bitmap equals a fresh build over the final url_seen
    rebuilt = BloomSet(engine.cfg.bloom)
    rebuilt.add_many([r["fp"] for r in engine.url_seen().collect()])
    assert np.array_equal(engine.bloom.bitmaps, rebuilt.bitmaps)
