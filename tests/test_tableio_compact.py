"""Size-tiered compaction + empty-append semantics on the TableIO seam
(round-4 verdict #1 and ADVICE low #2).

The claim under test: compaction I/O is proportional to APPENDED bytes, not
table size — entries at/above the threshold carry over verbatim (same
immutable files, never re-read), only the small per-round append parts are
bin-packed; and an empty append commits nothing, so idle rounds do not grow
the reader's file list.
"""

import os

from pyspark.sql import functions as F

from spiderman_spark.tableio import Catalog


def _mtimes(tb, entry):
    out = {}
    for dirpath, _dirs, files in os.walk(os.path.join(tb.root, entry)):
        for f in files:
            p = os.path.join(dirpath, f)
            out[p] = os.path.getmtime(p)
    return out


def test_compact_small_packs_only_small_parts(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    tb = cat.table("t")
    # one BIG base part, then several small append parts
    tb.append(spark.range(50_000).select(F.col("id").alias("v")).coalesce(1))
    base_entry = tb._manifest()["files"][0]
    base_bytes = tb.part_bytes(base_entry)
    base_mtimes = _mtimes(tb, base_entry)
    append_sizes = []
    for i in range(4):
        tb.append(
            spark.range(i * 10, i * 10 + 10).select(F.col("id").alias("v")).coalesce(1)
        )
        append_sizes.append(tb.part_bytes(tb._manifest()["files"][-1]))
    assert len(tb._manifest()["files"]) == 5
    threshold = max(append_sizes) + 1
    assert base_bytes >= threshold  # the fixture premise

    stats = tb.compact_small(threshold, ddl="v long")
    # I/O proportional to appended bytes: exactly the 4 small parts were read
    assert stats == {
        "compacted": 4,
        "kept": 1,
        "bytes_read": sum(append_sizes),
    }
    files = tb._manifest()["files"]
    assert len(files) == 2  # base + one packed part
    assert base_entry in files  # carried over verbatim ...
    assert _mtimes(tb, base_entry) == base_mtimes  # ... bytes untouched
    # contents preserved exactly
    got = sorted(r["v"] for r in tb.read(ddl="v long").collect())
    assert got == sorted(list(range(50_000)) + [i * 10 + j for i in range(4) for j in range(10)])


def test_compact_small_noop_below_two_parts(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    tb = cat.table("t")
    tb.append(spark.range(10).coalesce(1))
    v = tb.current_version()
    stats = tb.compact_small(1 << 30, ddl="id long")
    assert stats["compacted"] == 0
    assert tb.current_version() == v  # nothing committed


def test_compact_small_amortizes_across_cycles(spark, tmp_path):
    """Once a packed part outgrows the threshold it becomes base: later
    cycles never re-read it (the size-tiered invariant)."""
    cat = Catalog(spark, str(tmp_path))
    tb = cat.table("t")
    for i in range(6):
        tb.append(spark.range(i * 5, i * 5 + 5).coalesce(1))
    sizes = [tb.part_bytes(f) for f in tb._manifest()["files"]]
    threshold = max(sizes) + 1
    tb.compact_small(threshold, ddl="id long")
    packed = tb._manifest()["files"][-1]
    packed_bytes = tb.part_bytes(packed)
    if packed_bytes >= threshold:
        # crossed into base: the next cycle must not touch it
        tb.append(spark.range(100, 105).coalesce(1))
        tb.append(spark.range(105, 110).coalesce(1))
        stats = tb.compact_small(threshold, ddl="id long")
        assert packed in tb._manifest()["files"]
        assert stats["bytes_read"] < packed_bytes
    assert sorted(r["id"] for r in tb.read(ddl="id long").collect()) == sorted(
        [i for i in range(30)] + ([] if packed_bytes < threshold else list(range(100, 110)))
    )


def test_compact_small_refuses_bucketed(spark, tmp_path):
    import pytest

    cat = Catalog(spark, str(tmp_path))
    tb = cat.table("t")
    tb.replace_bucketed(
        spark.range(100).select(F.col("id").cast("string").alias("k")), "k", 4
    )
    with pytest.raises(ValueError, match="bucketed"):
        tb.compact_small(1 << 20)


def test_append_drop_empty_commits_nothing(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    tb = cat.table("t")
    tb.append(spark.range(5).coalesce(1))
    v, nfiles = tb.current_version(), len(tb._manifest()["files"])
    empty = spark.range(5).where("id < 0")
    tb.append(empty, drop_empty=True)
    assert tb.current_version() == v
    assert len(tb._manifest()["files"]) == nfiles
    # without the flag the old growth behavior is preserved
    tb.append(empty)
    assert len(tb._manifest()["files"]) == nfiles + 1


def test_crawl_url_seen_file_count_stays_flat(spark, tmp_path):
    """Engine integration: across rounds with idle appends and compaction,
    url_seen's manifest file list stays O(1) in rounds and the crawl result
    is byte-identical to the pre-compaction semantics (same seen set)."""
    from spiderman_spark import corpusgen as cg
    from spiderman_spark import simulator as sim
    from spiderman_spark.plans.crawl import CrawlConfig, CrawlEngine

    spec = cg.UNIT
    corpus = cg.build_crawl_corpus(spark, spec)
    eng = CrawlEngine(
        spark,
        corpus,
        str(tmp_path / "wd"),
        CrawlConfig(default_budget=4, compact_every=2),
    )
    eng.seed(sim.make_seeds(spec)[:2])
    counts = []
    for _ in range(8):
        if eng.step() == 0:
            break
        counts.append(len(eng.catalog.table("url_seen")._manifest()["files"]))
    # compaction every 2 rounds keeps the list bounded by the cycle length
    assert max(counts) <= 3, counts
