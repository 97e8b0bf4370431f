"""Multimodal operators (image stats / resize / stubbed frame+audio) and
embedding-cosine near-dup (exact + LSH recall).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spiderman_spark import corpusgen as cg
from spiderman_spark import imagecodec as ic
from spiderman_spark.operators import multimodal as mm
from spiderman_spark.operators import similarity as simi

SPEC = cg.UNIT


@pytest.fixture(scope="module")
def images(spark):
    return cg.build_image_corpus(spark, SPEC).cache()


def test_image_stats_match_driver_numpy(spark, images):
    got = {r["image_id"]: r for r in mm.image_stats(images).collect()}
    sample = images.limit(5).collect()
    for r in sample:
        px = ic.decode(bytes(r["bytes"]), r["fmt"])
        g = got[r["image_id"]]
        assert (g["w"], g["h"]) == (r["w"], r["h"])
        means = px.reshape(-1, 3).mean(axis=0)
        assert abs(g["mean_r"] - means[0]) < 1e-9
        assert abs(g["brightness"] - means.mean()) < 1e-9
        assert g["phash"] == ic.average_phash(px)


def test_resize_shapes_and_content(spark, images):
    out = mm.resize_images(images, 8, 8).collect()
    assert all((r["w"], r["h"], r["fmt"]) == (8, 8, "rgb8") for r in out)
    # resized content equals driver-side block-mean of the decoded original
    orig = {r["image_id"]: r for r in images.collect()}
    for r in out[:5]:
        src = orig[r["image_id"]]
        px = ic.decode(bytes(src["bytes"]), src["fmt"])
        want = mm._block_mean_resize(px, 8, 8)
        assert np.array_equal(ic.decode_rgb8(bytes(r["bytes"])), want)


def test_stubs_raise_without_fake_and_run_with_fake(spark):
    media = spark.createDataFrame([("m1",), ("m2",)], "media_id string")
    with pytest.raises(Exception) as ei:
        mm.sample_frames(media).count()
    assert "NotImplementedError" in str(ei.value) or "video decode" in str(ei.value)
    frames = mm.sample_frames(media, every_nth=3, max_frames=2, fake=True).collect()
    assert len(frames) == 4  # 2 media x 2 frames
    assert {r["frame_idx"] for r in frames} == {0, 3}
    # deterministic across runs
    again = mm.sample_frames(media, every_nth=3, max_frames=2, fake=True).collect()
    assert sorted((r["media_id"], r["frame_idx"], bytes(r["frame_bytes"])) for r in frames) == \
        sorted((r["media_id"], r["frame_idx"], bytes(r["frame_bytes"])) for r in again)
    au = mm.audio_features(media, fake=True).collect()
    assert len(au) == 2 and all(r["rms"] > 0 for r in au)


def test_embedding_neardup_exact_and_lsh_recall(spark):
    """The driver embeddings have no natural near-dups (max pair cosine
    ~0.48), so plant them: perturbed copies of 25 vectors must surface as
    (original, copy) pairs, exactly and via LSH with high recall."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.limit(25).collect()
    rng = np.random.RandomState(7)
    dups = [
        (
            int(r["vec_id"]) + 100000,
            [float(x + rng.normal(0, 0.01)) for x in r["embedding"]],
            r["label"],
        )
        for r in base
    ]
    planted = emb.select("vec_id", "embedding", "label").unionByName(
        spark.createDataFrame(dups, "vec_id long, embedding array<float>, label string")
    )
    exact = simi.embedding_neardup_exact(planted, threshold=0.95)
    exact_pairs = {(r["id_a"], r["id_b"]) for r in exact.collect()}
    want = {(int(r["vec_id"]), int(r["vec_id"]) + 100000) for r in base}
    assert want <= exact_pairs
    assert len(exact_pairs) < 100  # no false flood at 0.95
    lsh = simi.embedding_neardup_lsh(planted, dim=64, threshold=0.95, planes=16, bands=4)
    lsh_pairs = {(r["id_a"], r["id_b"]) for r in lsh.collect()}
    # LSH verifies candidates exactly → subset; recall must be high
    assert lsh_pairs <= exact_pairs
    recall = len(lsh_pairs & want) / len(want)
    assert recall >= 0.8, recall


def test_ivf_topk_trained_recall_and_plan(spark):
    """IVF ANN (q35 family): planted near-identical copies must be retrieved
    as each query's top neighbor — a near-dup shares its query's nearest
    centroid list except on a boundary, which nprobe=2 covers.  Also asserts
    the scale contract: centroid assignment is a narrow projection (no
    Exchange in its plan) and every corpus row lands in exactly one list."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.limit(25).collect()
    rng = np.random.RandomState(11)
    dups = [
        (
            int(r["vec_id"]) + 100000,
            [float(x + rng.normal(0, 0.01)) for x in r["embedding"]],
            int(r["label"]),
        )
        for r in base
    ]
    planted = emb.unionByName(
        spark.createDataFrame(dups, "vec_id long, embedding array<float>, label int")
    )
    cents = simi.ivf_train(planted, dim=64, k=8, iters=2)
    assert len(cents) == 8 and all(len(v) == 64 for _, v in cents)
    queries = planted.where(F.col("vec_id") < 25)
    got = simi.ivf_topk(planted, queries, cents, k=1, nprobe=2)
    hits = {
        (r["query_id"], r["neighbor_id"])
        for r in got.collect()
        if r["neighbor_id"] == r["query_id"] + 100000
    }
    assert len(hits) / 25 >= 0.9, hits
    assigned = simi._nearest_centroids(
        planted.selectExpr("vec_id AS rid", "embedding AS v"), "rid", "v", cents, 1
    )
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert assigned.count() == planted.count()  # one list per row
    assert assigned.select("rid").distinct().count() == planted.count()


def test_ivf_candidates_unique_no_distinct(spark):
    """The IVF candidate stream is unique by construction (corpus rows land
    in exactly one list, queries probe distinct cids), so ivf_topk carries no
    distinct: assert uniqueness holds on real data AND that the plan has no
    aggregate-shaped exchange between the probe join and the re-rank window
    (the round-3 verdict's redundant vector-carrying shuffle)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 5)
    cents = simi.anchor_centroids(64, 8)
    c = simi._nearest_centroids(
        emb.selectExpr("vec_id AS neighbor_id", "embedding AS cv"),
        "neighbor_id", "cv", cents, 1,
    )
    q = simi._nearest_centroids(
        queries.selectExpr("vec_id AS query_id", "embedding AS qv"),
        "query_id", "qv", cents, 2,
    )
    cand = (
        c.join(F.broadcast(q), "cid")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
    )
    assert cand.count() == cand.distinct().count()  # unique by construction
    plan = (
        simi.ivf_topk(emb, queries, cents, k=5, nprobe=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # exactly the exchanges the plan NEEDS: the broadcast of the probed query
    # side and the window's hash exchange on query_id — no HashAggregate
    # (what a distinct would compile to) anywhere
    assert "HashAggregate" not in plan and "SortAggregate" not in plan


def test_phash_band_validation(spark, images):
    """ADVICE guard: bands that don't divide 64 silently drop bits from
    every band (recall loss) → hard error; max_hamming >= bands breaks the
    pigeonhole losslessness guarantee → explicit warning, not silence."""
    import warnings

    with pytest.raises(ValueError, match="divide 64"):
        mm.phash_neardup_pairs(images, max_hamming=2, bands=3)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        mm.phash_neardup_pairs(images, max_hamming=4, bands=4)
    assert any("pigeonhole" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        mm.phash_neardup_pairs(images, max_hamming=3, bands=4)
    assert not any("pigeonhole" in str(x.message) for x in w)


def test_resize_upscale_no_nan(spark, images):
    """ADVICE fix: upscaling must map every output cell to a source (the old
    source->bin scatter left empty bins -> 0/0 NaN cast to uint8)."""
    import numpy as np

    from spiderman_spark import imagecodec as ic

    out = mm.resize_images(images, 48, 48).collect()
    assert len(out) > 0
    for r in out:
        px = ic.decode(bytes(r["bytes"]), "rgb8")
        assert px.shape == (48, 48, 3)
        assert np.isfinite(px.astype(np.float64)).all()
    # driver-side invariants: up equals nearest gather, mixed axes work
    rng = np.random.RandomState(7)
    src = rng.randint(0, 256, size=(5, 9, 3)).astype(np.uint8)
    up = mm._block_mean_resize(src, 20, 11)
    yi = (np.arange(11) * 5) // 11
    xi = (np.arange(20) * 9) // 20
    assert np.array_equal(up, src[yi][:, xi])
    mixed = mm._block_mean_resize(src, 4, 13)  # up in h, down in w
    assert mixed.shape == (13, 4, 3)


def test_phash_neardup_pairs_lossless(spark, images):
    """q38 family: at max_hamming < bands the band filter is LOSSLESS by
    pigeonhole, so the operator must equal driver-side brute force exactly;
    a planted byte-identical copy must surface as a hamming-0 pair."""
    import itertools

    base = images.select("image_id", "phash")
    copy = base.limit(1).select(
        F.concat(F.lit("copy-"), "image_id").alias("image_id"), "phash"
    )
    planted = base.unionByName(copy)
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in mm.phash_neardup_pairs(planted, max_hamming=3).collect()
    }
    rows = planted.collect()
    want = set()
    for x, y in itertools.combinations(sorted(rows, key=lambda r: r["image_id"]), 2):
        h = bin((x["phash"] ^ y["phash"]) & ((1 << 64) - 1)).count("1")
        if h <= 3:
            want.add((x["image_id"], y["image_id"], h))
    assert got == want
    src = copy.collect()[0]["image_id"]
    assert any(a == src or b == src for a, b, _ in got)  # hamming-0 planted pair


def test_lit_dvec_matches_lit_elementwise(spark):
    """_lit_dvec inlines a double vector as ONE parsed expr string; every
    element must be bit-identical to the F.lit double it replaces (repr is
    the shortest round-trip decimal and both parsers are correctly-rounded).
    Covers the real hyperplane/centroid vectors plus adversarial values:
    exact integers, BOTH signed zeros, denormal-ish magnitudes that repr in
    scientific notation, and the non-finite values that must render as
    CAST literals (``nanD`` would resolve as a column name)."""
    vecs = [simi._projection_vec(64, p) for p in range(4)]
    vecs += [cv for _, cv in simi.anchor_centroids(64, 4)]
    vecs.append([-1.0, 0.0, -0.0, 1.0, 4.656612873077393e-10, -2.5e-300, 1e16])
    vecs.append([float("nan"), float("inf"), float("-inf"), 0.5])
    for v in vecs:
        row = (
            spark.range(1)
            .select(
                F.array(*[F.lit(float(x)) for x in v]).alias("a"),
                simi._lit_dvec(v).alias("b"),
            )
            .collect()[0]
        )
        # bit-identity, not ==: distinguishes -0.0 from 0.0 and holds for
        # NaN (where == is False even against itself)
        import struct

        pa = [struct.pack("<d", x) for x in row["a"]]
        pb = [struct.pack("<d", x) for x in row["b"]]
        assert pa == pb
        assert any(struct.unpack("<d", p)[0] != 0.0 for p in pa)  # non-trivial


def test_ivf_train_non_finite_inputs_fail_loudly(spark):
    """Garbage embeddings must fail loudly, never silently corrupt
    centroids.  Any non-finite coordinate (and any magnitude big enough to
    overflow the norm/dot folds — |x| ≳ 1.3e154 at dim 8) turns the rounded
    cosine NaN in the FIRST assignment, where the ANSI long-cast raises a
    CAST_OVERFLOW that names NaN explicitly.  An inf CENTROID is
    arithmetically unreachable past that gate: overflowing avg's sum would
    need group_count × |x| > 1.8e308 with |x| small enough that the same
    row's norm stayed finite — ~1e154 rows.  (A NaN/inf centroid handed
    DIRECTLY to ivf_topk still plan-builds — _lit_dvec renders CAST
    literals — and dies with the same actionable NaN cast error, not
    UNRESOLVED_COLUMN.)"""
    rows = [("v%d" % i, [float(i + j + 1) for j in range(8)]) for i in range(20)]
    for bad in ([float("nan")] + [1.0] * 7, [1.7e308] * 8):
        df = spark.createDataFrame(
            rows + [("bad", bad)], "vec_id string, embedding array<double>"
        )
        with pytest.raises(Exception, match="NaN"):
            simi.ivf_train(df, dim=8, k=2, iters=1)
