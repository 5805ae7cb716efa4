"""Tests for the training-data-pipeline extras: simhash, embedding LSH
near-dup, ANN (brute force vs IVF recall), multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_simhash_identical_texts_collide(spark, docs):
    from apt_search_engine_spark.extras.dedup import simhash64

    # duplicate a doc under a new id: identical text -> identical simhash
    d0 = docs.limit(1).withColumn("doc_id", F.lit(10_000_000))
    sigs = simhash64(docs.limit(1).union(d0)).collect()
    assert len(sigs) == 2
    assert sigs[0].simhash == sigs[1].simhash


def test_simhash_candidates_and_hamming(spark, docs):
    from apt_search_engine_spark.extras.dedup import (
        hamming64,
        simhash64,
        simhash_candidates,
    )

    base = docs.limit(20)
    dup = base.limit(3).withColumn("doc_id", F.col("doc_id") + 10_000_000)
    sigs = simhash64(base.union(dup)).cache()
    cands = simhash_candidates(sigs)
    pairs = {(r.doc_a, r.doc_b) for r in cands.collect()}
    for i in [r.doc_id for r in base.limit(3).select("doc_id").collect()]:
        assert (i, i + 10_000_000) in pairs
    # hamming of identical sigs is 0
    j = sigs.alias("a").join(
        sigs.alias("b"),
        F.col("a.doc_id") + 10_000_000 == F.col("b.doc_id"),
    ).select(hamming64(F.col("a.simhash"), F.col("b.simhash")).alias("h"))
    assert all(r.h == 0 for r in j.collect())


def test_simhash_regression_vs_explode_shape(spark, docs):
    """The restructured simhash64 (64 partially-aggregated sums, one
    groupBy(doc_id)) must produce signatures identical to the original
    explode-64-rows-per-(doc,term) shape it replaced."""
    from apt_search_engine_spark.extras.dedup import _tokens, simhash64

    sample = docs.limit(50)
    tf = _tokens(sample).groupBy("doc_id", "term").agg(F.count("*").alias("cnt"))
    bits = (
        tf.withColumn("h", F.xxhash64("term"))
        .select(
            "doc_id", "cnt", "h",
            F.explode(F.sequence(F.lit(0), F.lit(63))).alias("bit"),
        )
        .withColumn(
            "vote",
            F.expr(
                "CASE WHEN (shiftright(h, bit) & 1L) = 1L THEN cnt ELSE -cnt END"
            ),
        )
    )
    old = {
        r.doc_id: r.simhash
        for r in (
            bits.groupBy("doc_id", "bit")
            .agg(F.sum("vote").alias("v"))
            .withColumn(
                "bitval",
                F.expr("CASE WHEN v > 0 THEN shiftleft(1L, bit) ELSE 0L END"),
            )
            .groupBy("doc_id")
            .agg(F.sum("bitval").cast("long").alias("simhash"))
            .collect()
        )
    }
    new = {r.doc_id: r.simhash for r in simhash64(sample).collect()}
    assert new == old


def test_simhash_md5_hex_matches_bands(spark, docs):
    """The hex encoding is exactly the four 16-bit band values, band 3
    high — and banded candidates pair duplicated texts."""
    from apt_search_engine_spark.extras.dedup import (
        _simhash_md5_bandframe,
        simhash64_md5_hex,
        simhash_md5_candidates,
    )

    sample = docs.limit(20)
    bands = {r.doc_id: (r.b0, r.b1, r.b2, r.b3)
             for r in _simhash_md5_bandframe(sample).collect()}
    for r in simhash64_md5_hex(sample).collect():
        b0, b1, b2, b3 = bands[r.doc_id]
        assert r.sig_hex == f"{b3:04x}{b2:04x}{b1:04x}{b0:04x}"
    dup = sample.limit(2).withColumn("doc_id", F.col("doc_id") + 10_000_000)
    pairs = {(r.doc_a, r.doc_b)
             for r in simhash_md5_candidates(sample.union(dup)).collect()}
    for i in [r.doc_id for r in sample.limit(2).select("doc_id").collect()]:
        assert (i, i + 10_000_000) in pairs


def test_embedding_neardup_recall_on_planted(spark, emb):
    """Recall of the multi-table hyperplane LSH on PLANTED near-dups
    (cos ~0.98): with 2 tables x 8 planes the per-pair collision rate is
    1-(1-(1-theta/pi)^8)^2 ~ 0.83, so >=60% of 20 planted pairs must
    surface; every surfaced pair must clear the threshold exactly."""
    from apt_search_engine_spark.extras.dedup import embedding_neardup_pairs

    rng = np.random.default_rng(99)
    rows = emb.orderBy("vec_id").limit(20).collect()
    planted = []
    for r in rows:
        v = np.array(r.embedding, dtype=np.float64)
        noise = rng.standard_normal(len(v)) * 0.02 * np.linalg.norm(v) / np.sqrt(len(v))
        planted.append((int(r.vec_id) + 1_000_000, (v + noise).tolist()))
    plus = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding")).union(
        spark.createDataFrame(planted, "vec_id long, embedding array<double>")
    )
    pairs = embedding_neardup_pairs(
        plus, threshold=0.9, n_planes=8, n_tables=2
    ).collect()
    found = {(r.vec_a, r.vec_b) for r in pairs}
    hits = sum(1 for r in rows if (int(r.vec_id), int(r.vec_id) + 1_000_000) in found)
    assert hits >= 12, f"planted-pair recall too low: {hits}/20"
    assert all(r.cos >= 0.9 for r in pairs)


def test_embedding_neardup_finds_planted(spark, emb):
    from apt_search_engine_spark.extras.dedup import embedding_neardup_pairs

    # plant an exact duplicate vector under a new id
    dup = emb.filter(F.col("vec_id") == 5).withColumn("vec_id", F.lit(999_999))
    pairs = embedding_neardup_pairs(emb.union(dup), threshold=0.99)
    got = {(r.vec_a, r.vec_b): r.cos for r in pairs.collect()}
    assert (5, 999_999) in got
    assert got[(5, 999_999)] == pytest.approx(1.0)


def test_ann_brute_force_matches_numpy(spark, emb):
    from apt_search_engine_spark.extras.ann import brute_force_topk

    rows = emb.orderBy("vec_id").collect()
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    ids = np.array([r.vec_id for r in rows])
    q = X[0]
    cos = (X @ q) / (np.linalg.norm(X, axis=1) * np.linalg.norm(q))
    order = sorted(range(len(ids)), key=lambda i: (-round(cos[i], 6), ids[i]))[:10]
    want = [int(ids[i]) for i in order]
    got = [r.vec_id for r in brute_force_topk(emb, q.tolist(), k=10).collect()]
    assert got == want


def test_ivf_recall(spark, emb):
    from apt_search_engine_spark.extras.ann import brute_force_topk, ivf_topk

    q = emb.filter(F.col("vec_id") == 3).first().embedding
    exact = {r.vec_id for r in brute_force_topk(emb, list(q), k=10).collect()}
    approx = {r.vec_id for r in ivf_topk(emb, list(q), k=10, nlist=8, nprobe=4).collect()}
    # probing half the cells must recover most of the true top-10
    assert len(exact & approx) >= 6
    # and probing ALL cells must be exact
    full = {r.vec_id for r in ivf_topk(emb, list(q), k=10, nlist=8, nprobe=8).collect()}
    assert full == exact


def test_ivf_mllib_recall_at_10x(spark, emb):
    """The MLlib-KMeans scale path: centroids trained distributed over
    10x the base fixture (5,000 vectors) must give IVF recall >= 7/10 of
    the exact top-10 when probing a quarter of the cells."""
    from apt_search_engine_spark.extras.ann import brute_force_topk, ivf_topk

    rows = emb.orderBy("vec_id").collect()
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    rng = np.random.default_rng(11)
    data = []
    for rep in range(10):
        noise = rng.standard_normal(X.shape) * (0.05 if rep else 0.0)
        for i, r in enumerate(rows):
            data.append((int(r.vec_id) + rep * 100_000, (X[i] + noise[i]).tolist()))
    big = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    q = X[3].tolist()
    exact = [r.vec_id for r in brute_force_topk(big, q, k=10).collect()]
    approx = {
        r.vec_id
        for r in ivf_topk(big, q, k=10, nlist=16, nprobe=4, method="mllib").collect()
    }
    assert len(set(exact) & approx) >= 7, (exact, approx)


def test_multimodal_features(spark):
    from apt_search_engine_spark.extras.multimodal import (
        FEATURE_DIM,
        extract_features,
        frame_sample_plan,
        synth_media,
    )

    media = synth_media(spark, 30)
    feats = extract_features(media).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r.feature) == FEATURE_DIM
        assert r.n_bytes > 0
    # determinism: same payload -> same feature
    again = extract_features(media).collect()
    assert [list(r.feature) for r in again] == [list(r.feature) for r in feats]
    frames = frame_sample_plan(media, every_ms=1000)
    n_videos = media.filter(F.col("kind") == "video").count()
    assert frames.count() >= n_videos  # at least one frame per video
    assert frames.groupBy("media_id").count().agg(F.min("count")).first()[0] >= 1


def test_multimodal_hexhash_variant_matches_python_and_sql(spark):
    """The SQL-portable hex-hash fake feature (driver-entry variant): the
    Arrow path reproduces the pure-Python kernel, and the generated
    DuckDB oracle reproduces both (same check the driver runs)."""
    import duckdb

    from apt_search_engine_spark.extras.multimodal import (
        _fake_feature_hexhash,
        extract_features,
        multimodal_features_sql,
        synth_media,
    )

    media = synth_media(spark, 12)
    feats = extract_features(media, hex_hash=True).collect()
    by_id = {r.media_id: r for r in feats}
    for row in media.collect():
        expect = _fake_feature_hexhash(bytes(row.payload))
        got = by_id[row.media_id].feature
        assert [round(float(x), 6) for x in got] == [
            round(float(x), 6) for x in expect
        ]
    # oracle parity on the rounded sums (exact multiples of 1/128; the
    # sums hit exact .xxxxxx5 halfway points, where Spark's F.round and
    # DuckDB's round both go HALF_UP — emulate that, not Python's
    # banker's rounding)
    from decimal import ROUND_HALF_UP, Decimal

    odf = duckdb.connect().execute(multimodal_features_sql(12)).fetchdf()
    oracle = {r.media_id: r.feature_sum for r in odf.itertuples()}
    for r in feats:
        exact = Decimal(sum(float(x) for x in r.feature))
        s = float(exact.quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))
        assert abs(oracle[r.media_id] - s) < 1e-9, r.media_id


def test_multimodal_stub_raises_without_fake(spark):
    from apt_search_engine_spark.extras.multimodal import extract_features, synth_media

    with pytest.raises(Exception, match="decode stub|NotImplementedError"):
        extract_features(synth_media(spark, 3), deterministic_fake=False).collect()


def test_simhash_auto_bands_rule():
    """Documented bucket-occupancy bound: auto_bands keeps expected
    random-collision occupancy n / 2^(64/n_bands) <= target (16 default);
    4x16-bit bands until ~2^24 docs, then 2x32-bit."""
    from apt_search_engine_spark.extras.dedup import auto_bands

    assert auto_bands(60_000) == 4
    assert auto_bands((1 << 16) * 16) == 4          # boundary inclusive
    assert auto_bands((1 << 16) * 16 + 1) == 2      # occupancy would exceed
    assert auto_bands(10**9) == 2
    assert auto_bands(10**12) == 2                   # capped: shard or minhash
    for n in (10_000, 10**7, 10**10):
        b = auto_bands(n)
        assert n <= (1 << (64 // b)) * 16 or b == 2


def test_simhash_bucket_cap_drops_stop_bands_keeps_true_dups(spark, docs):
    """A band value shared by many unrelated docs (stop band) is dropped
    under bucket_cap, while planted exact duplicates still pair through
    their other bands; without a cap the hot bucket's quadratic pairs
    dominate the output."""
    from apt_search_engine_spark.extras.dedup import (
        simhash64,
        simhash_candidates,
    )

    base = docs.limit(20)
    dup = base.limit(3).withColumn("doc_id", F.col("doc_id") + 10_000_000)
    sigs = simhash64(base.union(dup))
    # plant a hot band: 12 synthetic docs agreeing ONLY on band 0
    # (low 16 bits) — pairwise hamming of the other bands is large,
    # so these are pure stop-band noise
    hot = spark.createDataFrame(
        [(20_000_000 + i, (i << 17) | 0xBEEF) for i in range(12)],
        "doc_id long, simhash long",
    )
    all_sigs = sigs.union(hot).cache()

    uncapped = {
        (r.doc_a, r.doc_b) for r in simhash_candidates(all_sigs).collect()
    }
    capped = {
        (r.doc_a, r.doc_b)
        for r in simhash_candidates(all_sigs, bucket_cap=8).collect()
    }
    planted = {
        (i, i + 10_000_000)
        for i in [r.doc_id for r in base.limit(3).select("doc_id").collect()]
    }
    hot_pairs = {
        (a, b) for (a, b) in uncapped if a >= 20_000_000 and b >= 20_000_000
    }
    assert hot_pairs and hot_pairs <= uncapped      # 12*11/2 noise pairs exist
    assert planted <= capped                        # true dups survive the cap
    assert not (hot_pairs & capped)                 # stop band fully dropped
    assert len(capped) < len(uncapped)


def test_simhash_md5_candidates_cap_and_default_unchanged(spark, docs):
    """bucket_cap on the md5 oracle variant composes without changing the
    pinned default output (driver compare relies on the defaults)."""
    from apt_search_engine_spark.extras.dedup import simhash_md5_candidates

    sample = docs.limit(30)
    default = {
        (r.doc_a, r.doc_b) for r in simhash_md5_candidates(sample).collect()
    }
    relaxed = {
        (r.doc_a, r.doc_b)
        for r in simhash_md5_candidates(sample, bucket_cap=10**6).collect()
    }
    assert default == relaxed  # a cap far above corpus size is a no-op


# ------------------------------- sequence packing (concat-and-cut layout)
def test_pack_sequences_layout_invariants(spark):
    """Beyond the DuckDB hash pair (test_docops): the packed layout must
    be CONTIGUOUS per shard — each doc starts exactly where the previous
    one ended — with seq_offset < capacity and straddles true iff the
    doc crosses a capacity boundary."""
    from apt_search_engine_spark.extras.docops import (
        PACK_CAPACITY,
        q_pack_sequences,
    )

    rows = q_pack_sequences(spark, "/root/testdata/sf0.001").collect()
    assert rows, "packer produced no rows"
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    assert len(by_shard) > 1, "sharding degenerate at sf0.001"
    saw_straddle = False
    for shard, docs in by_shard.items():
        docs.sort(key=lambda r: r.doc_id)
        pos = 0
        for r in docs:
            assert 0 <= r.seq_offset < PACK_CAPACITY
            assert r.seq_idx == pos // PACK_CAPACITY, (shard, r)
            assert r.seq_offset == pos % PACK_CAPACITY, (shard, r)
            end = pos + r.n_tokens
            assert r.straddles == ((end - 1) // PACK_CAPACITY != r.seq_idx)
            saw_straddle |= r.straddles
            pos = end
    assert saw_straddle, "fixture never crosses a capacity boundary"
