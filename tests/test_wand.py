"""Block-max WAND parity: the pruned compressed-blocks scorer must return
exactly the same top-k (doc_ids rank-identical, scores to 1e-9 rel) as the
exact DataFrame plan — WAND only skips slices whose upper bound is below
the current kth score, so top-k scores are exact (SURVEY.md 4.2 item 3)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from apt_search_engine_spark.indexing.build import with_postings_struct

QUERIES = [
    "travel guide",
    "travel guide europe tips",
    "spark shuffle index query",
    "europe",
    "guide guide travel",  # duplicate words: exact path dedups, so must WAND
    "zzzunknownzzz",  # no hit
    "the and of",  # stopwords: indexed never, query side keeps them (P1)
    "travel zzzunknownzzz",  # mix of hit and miss terms
]


def _rows(df):
    return [(r.doc_id, r.score) for r in df.collect()]


@pytest.mark.parametrize("query", QUERIES)
def test_wand_matches_exact(engine, query):
    exact = _rows(engine.search_df(query, k=10))
    wand = _rows(engine.search_df_wand(query, k=10))
    assert [d for d, _ in wand] == [d for d, _ in exact], query
    for (_, sw), (_, se) in zip(wand, exact):
        assert sw == pytest.approx(se, rel=1e-9)


def test_wand_small_slices_and_spanning_blocks(spark, engine, index_dir):
    """Force many ordinal slices (width 64 << block size 128) so blocks span
    slice boundaries and the dedup mask + multi-partition heap paths run."""
    from apt_search_engine_spark.query.wand import wand_topk

    term_mult = {"travel": 1, "guid": 1}  # stemmed forms
    buckets = sorted({engine._bucket(t) for t in term_mult})
    blocks = (
        spark.read.parquet(os.path.join(index_dir, "blocks"))
        .filter(F.col("term_bucket").isin(buckets))
        .filter(F.col("term").isin(list(term_mult)))
    )
    doc_map = spark.read.parquet(os.path.join(index_dir, "doc_map"))
    wand = [
        (r.doc_id, r.score)
        for r in wand_topk(
            spark,
            blocks,
            doc_map,
            term_mult,
            engine.term_dfs(list(term_mult)),
            engine.n_docs,
            10,
            slice_ords=64,
        ).collect()
    ]
    exact = _rows(engine.search_df("travel guide", k=10))
    assert [d for d, _ in wand] == [d for d, _ in exact]
    for (_, sw), (_, se) in zip(wand, exact):
        assert sw == pytest.approx(se, rel=1e-9)


def test_wand_k_larger_than_matches(engine):
    exact = _rows(engine.search_df("europe tips", k=10_000))
    wand = _rows(engine.search_df_wand("europe tips", k=10_000))
    assert wand == pytest.approx(exact)


def test_wand_falls_back_for_phrase(engine):
    """Phrase queries need positions; search_df_wand must delegate to the
    exact plan and produce identical results."""
    exact = _rows(engine.search_df('"travel guide"', k=10))
    via_wand_api = _rows(engine.search_df_wand('"travel guide"', k=10))
    assert via_wand_api == exact


def test_doc_map_dense_and_ordered(spark, index_dir):
    rows = spark.read.parquet(os.path.join(index_dir, "doc_map")).collect()
    by_ord = sorted(rows, key=lambda r: r.doc_ord)
    assert [r.doc_ord for r in by_ord] == list(range(len(rows)))
    ids = [r.doc_id for r in by_ord]
    assert ids == sorted(ids)


def test_wand_plan_has_no_row_python(engine):
    plan = (
        engine.search_df_wand("travel guide", 10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan  # Arrow-batched mapInPandas only


def test_wand_doc_map_translation_is_point_lookup(engine):
    """VERDICT r3 'what's wrong' #3: the final ord->doc_id translation
    must not JOIN against the corpus-sized doc_map (the k-row side
    broadcasts but the map side scans). The returned plan must be a
    filtered doc_map read (isin -> parquet In pushdown on the
    ordinal-ordered files) with scores stamped from a literal map — no
    join node at all."""
    df = engine.search_df_wand("travel guide", 10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "doc_map" in plan
    assert "Join" not in plan
    # the ordinal filter reaches the parquet scan
    assert "PushedFilters: [In(doc_ord" in plan, plan


def test_exact_path_translation_is_point_lookup(engine):
    """Same contract for the exact scoring paths (disk indexes score in
    ordinal space end-to-end; only the final k rows translate)."""
    for df in (
        engine.search_df("travel guide", 10),
        engine.search_bm25_df("travel guide", 10),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "doc_map" in plan
        assert "Join" not in plan
        assert "PushedFilters: [In(doc_ord" in plan, plan


def test_phrase_semi_join_precedes_positions_aggregate(engine):
    """VERDICT r3 'what's wrong' #2: the phrase candidate aggregate must
    only see docs containing the RAREST term — i.e. the optimized plan
    has a left-semi join BELOW the map_from_entries aggregate, so a head
    term's full postings never cross the aggregate shuffle."""
    fd = engine._phrase_filtered(["travel", "guid"])
    plan = fd._jdf.queryExecution().optimizedPlan().toString()
    # the adjacency check is the fused Arrow filter over aggregated rows
    i_adj = plan.find("ArrowEvalPython")
    assert i_adj != -1, plan
    i_agg = plan.find("Aggregate", i_adj)
    assert i_agg != -1, plan
    assert "LeftSemi" in plan[i_agg:], plan


def test_wtfs_decode_matches_reference_kernel(spark, index_dir):
    """Per-doc wtf in blocks == tf * sum(tag weights) from canonical postings."""
    import numpy as np

    from apt_search_engine_spark.analysis.analyzer import tag_weight
    from apt_search_engine_spark.indexing import codec

    blocks = spark.read.parquet(f"{index_dir}/blocks").collect()
    # group segment rows per term, ordinal-ordered (a term may span
    # several segment rows — a dict would silently keep only one)
    canonical: dict[str, list] = {}
    for r in with_postings_struct(
        spark.read.parquet(f"{index_dir}/postings"),
        spark.read.parquet(f"{index_dir}/doc_map"),
    ).collect():
        canonical.setdefault(r.term, []).append(r)
    for segs in canonical.values():
        segs.sort(key=lambda r: r.doc_ords[0])
    for term in list(canonical)[:50]:
        bs = sorted([b for b in blocks if b.term == term], key=lambda b: b.lo_ord)
        got = np.concatenate([codec.decode_tfs(b.wtfs) for b in bs])
        want = [
            p.tf * (sum(tag_weight(t) for t in p.tags) if p.tags else 0.5)
            for seg in canonical[term]
            for p in seg.postings
        ]
        assert got.tolist() == pytest.approx(want), term
        for b in bs:
            w = codec.decode_tfs(b.wtfs)
            assert b.block_max_wtf == pytest.approx(float(w.max()))
            ords = codec.decode_doc_ids(b.doc_ids_vb)
            assert b.lo_ord == int(ords[0]) and b.hi_ord == int(ords[-1])
