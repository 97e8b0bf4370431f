"""Large-star/small-star connected components (round-3 verdict #5):
property-equal to min-label propagation on random graphs, and converging in
far fewer rounds than graph diameter on a path graph.
"""

import random

import pytest
from pyspark.sql import functions as F

from spiderman_spark.operators import dedup


def _labels(df):
    return {(r["did"], r["rep"]) for r in df.collect()}


def _run_both(spark, edges, max_iters_minlabel=40, max_iters_star=25):
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    s_min, s_star = {}, {}
    ml = dedup.neardup_components(
        pairs, max_iters=max_iters_minlabel, algorithm="minlabel", stats_out=s_min
    )
    st = dedup.neardup_components(
        pairs, max_iters=max_iters_star, algorithm="star", stats_out=s_star
    )
    return _labels(ml), _labels(st), s_min, s_star


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_star_equals_minlabel_random_graphs(spark, seed):
    rng = random.Random(seed)
    n = 60
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(45)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    ml, st, _, _ = _run_both(spark, edges)
    assert ml == st


def test_star_on_clique_plus_bridges(spark):
    """The near-dup shape the operator exists for: cliques joined by short
    bridges, plus an isolated pair."""
    clique1 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    clique2 = [(10 + i, 10 + j) for i in range(4) for j in range(i + 1, 4)]
    edges = clique1 + clique2 + [(4, 10)] + [(100, 101)]
    ml, st, _, _ = _run_both(spark, edges)
    assert ml == st
    reps = {r for _, r in st}
    assert reps == {0, 100}  # one merged component min 0, isolated pair min 100


def test_star_halves_rounds_on_path_graph(spark):
    """Path 0-1-2-...-16 (diameter 16): min-label needs diameter rounds;
    the star variant shortcuts toward the minimum in ~log rounds."""
    edges = [(i, i + 1) for i in range(16)]
    ml, st, s_min, s_star = _run_both(spark, edges)
    assert ml == st
    assert all(r == 0 for _, r in st)
    assert s_min["iterations"] >= 16
    assert s_star["iterations"] * 2 <= s_min["iterations"], (s_star, s_min)


def test_auto_switches_to_star_on_long_path(spark):
    """Round-4 verdict #6: on a long-path graph (diameter >> switch_after)
    the 'auto' default contracts after switch_after minlabel rounds and
    finishes with star — far fewer total rounds than the diameter."""
    edges = [(i, i + 1) for i in range(32)]  # diameter 32
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    s = {}
    auto = dedup.neardup_components(pairs, max_iters=40, stats_out=s)
    assert s["switched"] and s["algorithm_used"] == "star"
    assert s["iterations"] < 16, s  # vs 32 minlabel rounds
    assert _labels(auto) == {(i, 0) for i in range(33)}


def test_auto_stays_minlabel_on_clique(spark):
    """Short-diameter near-dup shapes converge inside the switch budget and
    never pay the star rounds."""
    clique = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    pairs = spark.createDataFrame(clique, "id_a long, id_b long")
    s = {}
    auto = dedup.neardup_components(pairs, stats_out=s)
    assert not s["switched"] and s["algorithm_used"] == "minlabel"
    assert _labels(auto) == {(i, 0) for i in range(6)}


def test_self_pair_vertices_covered_by_both_algorithms(spark):
    """ADVICE r4: a vertex whose ONLY pair is a self-pair must appear
    (self-labelled) under every algorithm — the drop-in-equal contract."""
    pairs = spark.createDataFrame(
        [(7, 7), (2, 3), (3, 4)], "id_a long, id_b long"
    )
    want = {(7, 7), (2, 2), (3, 2), (4, 2)}
    for alg in ("minlabel", "star", "auto"):
        got = _labels(dedup.neardup_components(pairs, algorithm=alg))
        assert got == want, (alg, got)


def test_star_empty_and_failfast(spark):
    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert dedup.neardup_components(empty, algorithm="star").count() == 0
    pairs = spark.createDataFrame([(i, i + 1) for i in range(40)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="not converged"):
        dedup.neardup_components(pairs, algorithm="star", max_iters=1)
    with pytest.raises(ValueError, match="unknown algorithm"):
        dedup.neardup_components(pairs, algorithm="wat")


def test_star_matches_q37_shape(spark):
    """Same (did, rep) as minlabel over REAL LSH pairs (the q37 input) at
    sf0.001 — the drop-in-replacement contract."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", n=1, k=32, bands=8, threshold=0.6
    )
    pairs = pairs.localCheckpoint()
    ml = dedup.neardup_components(pairs)
    st = dedup.neardup_components(pairs, algorithm="star")
    assert _labels(ml) == _labels(st)
