"""Offline index merge (indexing/merge.py — Lucene IndexMergeTool
analog): merging per-shard indexes must be score-bit-equal to a fresh
build over the union, across every query family, and must refuse
overlapping or tombstoned shards."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from apt_search_engine_spark.config import MAX_POSTINGS_PER_ROW
from apt_search_engine_spark.indexing.build import IndexBuilder
from apt_search_engine_spark.indexing.merge import merge_indexes
from apt_search_engine_spark.query.engine import SearchEngine

QUERIES = [
    "travel guide",
    '"travel guide"',
    '"travel guide" AND europe',
    "travel OR tips",
]


@pytest.fixture(scope="module")
def merged_setup(spark, tmp_path_factory):
    """Three conv-hash shards built independently + a fresh build over
    the union + their 3-way merge."""
    from apt_search_engine_spark.corpus import gen_corpus_spark

    base = str(tmp_path_factory.mktemp("merge"))
    tr = gen_corpus_spark(spark, 36)
    shard = F.pmod(F.xxhash64("conv_id"), F.lit(3))
    dirs = []
    for i in range(3):
        d = os.path.join(base, f"s{i}")
        IndexBuilder(spark, d, n_batches=1).build(tr.filter(shard == i))
        dirs.append(d)
    full = os.path.join(base, "full")
    IndexBuilder(spark, full, n_batches=1).build(tr)
    out = os.path.join(base, "merged")
    meta = merge_indexes(spark, dirs, out)
    return dirs, full, out, meta


def _rows(engine, fn, *a, **kw):
    return sorted((r.doc_id, r.score) for r in fn(*a, **kw).collect())


def test_merge_matches_fresh_build_scores(spark, merged_setup):
    _, full, out, meta = merged_setup
    em = SearchEngine(spark, index_dir=out)
    ef = SearchEngine(spark, index_dir=full)
    assert em.n_docs == ef.n_docs and em.total_len == ef.total_len
    assert meta["n_docs"] == ef.n_docs
    for q in QUERIES:
        got = _rows(em, em.search_df, q, k=30)
        want = _rows(ef, ef.search_df, q, k=30)
        assert got == want and got, q  # bit-equal scores, same docs
    # pruned + BM25 scorers over the re-derived blocks/doc_len
    assert _rows(em, em.search_df_wand, "travel guide", k=30) == _rows(
        ef, ef.search_df_wand, "travel guide", k=30
    )
    assert _rows(em, em.search_bm25_df, "travel guide", k=30) == _rows(
        ef, ef.search_bm25_df, "travel guide", k=30
    )
    assert _rows(em, em.search_bm25_wand_df, "travel guide", k=30) == _rows(
        ef, ef.search_bm25_wand_df, "travel guide", k=30
    )


def test_merge_lexicon_and_meta_match_fresh(spark, merged_setup):
    _, full, out, _ = merged_setup
    lex_m = {
        (r.term, r.df)
        for r in spark.read.parquet(os.path.join(out, "lexicon")).collect()
    }
    lex_f = {
        (r.term, r.df)
        for r in spark.read.parquet(os.path.join(full, "lexicon")).collect()
    }
    assert lex_m == lex_f


def test_merge_segment_invariants(spark, merged_setup):
    """Re-chunked segments stay capped and per-term ordinal ranges stay
    disjoint and sorted (the blocks invariant)."""
    _, _, out, _ = merged_setup
    segs = (
        spark.read.parquet(os.path.join(out, "postings"))
        .select("term", "ord_lo", "ord_hi", F.size("doc_ords").alias("n"))
        .collect()
    )
    assert segs and all(0 < r.n <= MAX_POSTINGS_PER_ROW for r in segs)
    by_term: dict[str, list] = {}
    for r in segs:
        by_term.setdefault(r.term, []).append((r.ord_lo, r.ord_hi))
    for term, ranges in by_term.items():
        ranges.sort()
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            assert hi1 < lo2, f"overlapping segment ranges for {term}"
    # ordinal space is dense across the merged doc_map
    dm = spark.read.parquet(os.path.join(out, "doc_map"))
    n = dm.count()
    assert dm.agg(F.max("doc_ord")).collect()[0][0] == n - 1
    assert dm.select("doc_ord").distinct().count() == n


def test_merge_refuses_overlap_and_tombstones(spark, merged_setup, tmp_path):
    dirs, _, _, _ = merged_setup
    with pytest.raises(ValueError, match="overlap"):
        merge_indexes(
            spark, [dirs[0], dirs[0]], str(tmp_path / "dup_out")
        )
    # tombstone one shard -> merge must refuse until purged
    from apt_search_engine_spark.indexing.deletes import delete_docs

    victim = (
        spark.read.parquet(os.path.join(dirs[1], "doc_map"))
        .limit(1)
        .collect()[0]
        .doc_id
    )
    delete_docs(spark, dirs[1], [victim])
    try:
        with pytest.raises(ValueError, match="tombstones"):
            merge_indexes(
                spark, [dirs[0], dirs[1]], str(tmp_path / "tomb_out")
            )
    finally:
        from apt_search_engine_spark.indexing.deletes import purge_deleted

        purge_deleted(spark, dirs[1])


def test_merge_refuses_single_source(spark, merged_setup, tmp_path):
    dirs, _, _, _ = merged_setup
    with pytest.raises(ValueError, match="two source"):
        merge_indexes(spark, [dirs[0]], str(tmp_path / "one_out"))


def test_merged_index_supports_delete_and_purge(spark, merged_setup, tmp_path):
    """The merged index participates in the normal lifecycle: tombstone a
    doc, results drop it immediately, purge rewrites cleanly and stats
    recount (the docBase renumbering leaves a gap, which later merges
    handle via max-ordinal offsets)."""
    import shutil

    from apt_search_engine_spark.indexing.deletes import (
        delete_docs,
        purge_deleted,
    )
    from apt_search_engine_spark.query.engine import SearchEngine

    _, _, out, _ = merged_setup
    # work on a copy — other tests read the merged index
    work = str(tmp_path / "m2")
    shutil.copytree(out, work)
    eng = SearchEngine(spark, index_dir=work)
    top = eng.search_df("travel guide", k=5).collect()
    assert top
    victim = top[0].doc_id
    delete_docs(spark, work, [victim])
    eng = SearchEngine(spark, index_dir=work)
    assert victim not in {
        r.doc_id for r in eng.search_df("travel guide", k=5).collect()
    }
    n_before = eng.n_docs
    assert purge_deleted(spark, work) == 1
    eng = SearchEngine(spark, index_dir=work)
    assert eng.n_docs == n_before - 1
    assert victim not in {
        r.doc_id for r in eng.search_df("travel guide", k=50).collect()
    }


def test_merge_single_doc_shard_offsets(spark, tmp_path):
    """A shard whose only doc has ordinal 0 has ordinal-space size 1 —
    the falsy-zero `max_ord or -1` bug collapsed the next shard's
    offset onto it, colliding two different docs on one merged ordinal
    (review finding)."""
    from apt_search_engine_spark.corpus import gen_corpus_spark

    tr = gen_corpus_spark(spark, 3).limit(40).cache()
    one = tr.orderBy("conv_id", "turn_idx").limit(1)
    rest = tr.subtract(one)
    a, b_dir, out = (
        str(tmp_path / "one"),
        str(tmp_path / "rest"),
        str(tmp_path / "m"),
    )
    IndexBuilder(spark, a, n_batches=1).build(one)
    IndexBuilder(spark, b_dir, n_batches=1).build(rest)
    assert (
        spark.read.parquet(os.path.join(a, "doc_map"))
        .agg(F.max("doc_ord"))
        .collect()[0][0]
        == 0
    )
    merge_indexes(spark, [a, b_dir], out)
    dm = spark.read.parquet(os.path.join(out, "doc_map"))
    n = dm.count()
    # dense, collision-free ordinal space over the union
    assert dm.select("doc_ord").distinct().count() == n
    assert dm.agg(F.max("doc_ord")).collect()[0][0] == n - 1
