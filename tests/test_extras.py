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


def test_multimodal_stub_raises_without_fake(spark):
    from apt_search_engine_spark.extras.multimodal import extract_features, synth_media

    with pytest.raises(Exception, match="decode stub|NotImplementedError"):
        extract_features(synth_media(spark, 3), deterministic_fake=False).collect()
