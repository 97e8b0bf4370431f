"""Property-based light checks (SURVEY.md §5.2 item 6) over randomized
corpus shapes, budgets, and priorities — run against the Spark-free
simulator (the parity-locked oracle, so every invariant proven here is an
invariant of the engine by the bit-exact parity suite), plus one engine
idempotence test."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from spiderman_spark import corpusgen as cg
from spiderman_spark import simulator as sim

SPECS = st.builds(
    cg.CorpusSpec,
    seed=st.integers(1, 10_000),
    hosts=st.integers(1, 4),
    list_pages=st.integers(1, 4),
    details_per_page=st.integers(1, 4),
    images_per_detail=st.just(0),
    overlap=st.integers(0, 2),
    fail_mod=st.sampled_from([3, 5, 37]),
    small_mod=st.sampled_from([4, 53]),
    mega_host=st.booleans(),
)


def _simulate(spec, budget, callbacks, priorities=None):
    seeds = sim.make_seeds(spec)
    if priorities:
        for i, s in enumerate(seeds):
            s["priority"] = priorities[i % len(priorities)]
    return sim.simulate_crawl(
        sim.corpus_as_dict(spec),
        seeds,
        politeness=sim.Politeness(max_per_round=budget),
        callbacks=callbacks,
    )


@settings(max_examples=25, deadline=None)
@given(spec=SPECS, budget=st.integers(1, 6))
def test_invariants_dedup_mode(spec, budget):
    """Dedup mode: no URL fetched twice at the same attempt; politeness
    budget never exceeded; ranks dense ascending; retries bounded."""
    res = _simulate(spec, budget, {"list": True, "detail": False, "file": False})
    # ranks dense ascending: 1..N
    ranks = [t[0] for t in res.crawl_order]
    assert ranks == list(range(1, len(ranks) + 1))
    # politeness: per (round, host) counts never exceed the budget
    assert all(n <= budget for n in res.fetch_counts.values())
    # dedup: a detail URL is fetched at most once per attempt number
    seen_pairs = set()
    for (_, _, url, _, att) in res.crawl_order:
        if "/detail/" in url:
            assert (url, att) not in seen_pairs
            seen_pairs.add((url, att))
    # retries bounded by retry_times
    assert all(t[4] <= sim.Politeness().retry_times for t in res.crawl_order)


@settings(max_examples=15, deadline=None)
@given(spec=SPECS, budget=st.integers(1, 5))
def test_rerun_is_identical(spec, budget):
    """Determinism: simulating the same inputs twice is bit-identical."""
    cbs = {"list": True, "detail": True, "file": False}
    a = _simulate(spec, budget, cbs)
    b = _simulate(spec, budget, cbs)
    assert a.crawl_order == b.crawl_order
    assert a.url_seen == b.url_seen
    assert a.failed == b.failed


@settings(max_examples=15, deadline=None)
@given(
    spec=SPECS,
    budget=st.integers(1, 5),
    priorities=st.lists(st.integers(-3, 3), min_size=1, max_size=5),
)
def test_priority_invariants(spec, budget, priorities):
    """Priorities: uniform priorities == the FIFO run exactly (any constant,
    not just 0); mixed priorities keep the same fetched multiset — priority
    is ordering-only semantics (bit-exact ordering itself is covered by the
    engine-vs-simulator parity test)."""
    cbs = {"list": True, "detail": True, "file": False}
    fifo = _simulate(spec, budget, cbs)
    uniform = _simulate(spec, budget, cbs, priorities=[2])
    assert [t[2] for t in uniform.crawl_order] == [t[2] for t in fifo.crawl_order]
    mixed = _simulate(spec, budget, cbs, priorities=priorities)
    assert sorted(t[2] for t in mixed.crawl_order) == sorted(
        t[2] for t in fifo.crawl_order
    )


def test_engine_step_after_exhaustion_is_idempotent(spark, workdir):
    """Engine-level dedup idempotence (SURVEY §5.2): once the frontier is
    exhausted, further step() calls fetch nothing and leave every state
    table's snapshot version untouched."""
    from spiderman_spark.plans.crawl import CrawlConfig, CrawlEngine

    spec = cg.UNIT
    corpus = cg.build_crawl_corpus(spark, spec)
    engine = CrawlEngine(spark, corpus, workdir, CrawlConfig())
    engine.seed(sim.make_seeds(spec))
    engine.run()
    versions = {
        t: engine.catalog.table(t).current_version()
        for t in ("frontier", "url_seen", "crawl_order", "items_raw", "failed")
    }
    assert engine.step() == 0
    assert engine.step() == 0
    after = {
        t: engine.catalog.table(t).current_version()
        for t in ("frontier", "url_seen", "crawl_order", "items_raw", "failed")
    }
    assert after == versions
