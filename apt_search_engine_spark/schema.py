"""Fixed StructType schemas for every table the engine reads or writes.

The reference's schemas are implied by MongoDB writer code only
(SURVEY.md section 1.1); declaring them once here is the schema-first
replacement. Input table shape is fixed by BASELINE.json `input_hint`.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Input: Iceberg/Parquet table of multi-turn transcripts (input_hint).
TRANSCRIPTS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# Analyzer UDF output: one row per input turn.
ANALYZED = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField(
            "postings",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("term", T.StringType(), False),
                        T.StructField("tf", T.DoubleType(), False),
                        T.StructField("positions", T.ArrayType(T.IntegerType()), False),
                        T.StructField("tags", T.ArrayType(T.StringType()), False),
                    ]
                )
            ),
            False,
        ),
    ]
)

# Per-(term, doc) posting entry struct of the RECONSTRUCTED view
# (indexing.build.with_postings_struct) — the API/test-facing shape.
POSTING_ENTRY = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tf", T.DoubleType(), False),
        T.StructField("positions", T.ArrayType(T.IntegerType()), False),
        T.StructField("tags", T.ArrayType(T.StringType()), False),
    ]
)

# Canonical index (FIXTURES.md section P): one row per (term, segment of
# <= MAX_POSTINGS_PER_ROW docs) — segmenting bounds row size on Zipfian
# head terms — postings sorted by doc ordinal (== doc_id order; the
# doc_map assigns ordinals in global doc_id order) within and across a
# term's segments, directory-partitioned by term_bucket for lookup
# pruning.
#
# Storage is COLUMNAR-IN-ROW: parallel arrays instead of array<struct>.
# Tags are stored as prefix COUNTS (n_titles/n_h1s per posting; analyzer
# emits tags ordered title..h1..body), not per-position strings — at
# 10^12 turns, materialized tag strings would dominate index bytes, and
# building array<struct> rows costs an unvectorized per-element codegen
# loop at merge time. Layout v8 drops per-posting doc_id STRINGS for the
# same reason: string keys were ~40% of index bytes and the dominant
# payload of the merge shuffle/assembly/write; the doc_map table holds
# each string exactly once and consumers translate on pruned reads.
# Consumers reconstruct the struct/tags view lazily on (term-pruned)
# reads: indexing.build.with_postings_struct(df, doc_map).
POSTINGS = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        # dense doc ordinals, sorted — the only per-posting doc key
        T.StructField("doc_ords", T.ArrayType(T.LongType()), False),
        # tf and wtf (the score kernel minus the idf factor) are NOT
        # stored (layout v10): both are exact closed forms of the small
        # ints below — tf = (occ+1)/(dl+xtra), wtf = tagsum * tf — and
        # consumers derive them on pruned reads (build.wtf_expr /
        # WTFS_FROM_SEGMENT_EXPR), bit-identical to the analyzer
        # delta+varbyte-encoded per-posting positions (layout v9): one
        # binary per posting; decode via indexing.codec.decode_doc_ids
        # (consumers: phrase adjacency, reconstructed API view)
        T.StructField("positions_vb", T.ArrayType(T.BinaryType()), False),
        T.StructField("n_titles", T.ArrayType(T.IntegerType()), False),
        T.StructField("n_h1s", T.ArrayType(T.IntegerType()), False),
        # scalar ordinal range of the sorted postings arrays, so lineage
        # stats and range pruning never touch the nested columns
        T.StructField("ord_lo", T.LongType(), False),
        T.StructField("ord_hi", T.LongType(), False),
        T.StructField("term_bucket", T.IntegerType(), False),
        T.StructField("occs", T.ArrayType(T.IntegerType()), True),
        T.StructField("dls", T.ArrayType(T.IntegerType()), True),
        # per-posting quirk-Q2 remainder: tt (tf denominator) = dl + xtra
        T.StructField("xtras", T.ArrayType(T.IntegerType()), True),
    ]
)

# Lexicon (dictionary): term -> document frequency, bucket-partitioned like
# postings for the same pruning. df lives HERE, not on postings rows:
# stamping df onto segments would need all of a head term's segments
# colocated in one task (a Window/join shuffle keyed by term) — at 10^12
# turns a head term is ~10^11 postings, i.e. a guaranteed straggler/OOM.
# The lexicon instead comes from a partial (map-side combined) aggregate of
# segment sizes — vocab-sized output, no skew — and query paths join it
# broadcast-style on the handful of query terms.
LEXICON = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("df", T.IntegerType(), False),
        T.StructField("term_bucket", T.IntegerType(), False),
    ]
)

# Compressed companion for block-max WAND (FIXTURES.md section P).
# Block identity/order = lo_ord (disjoint strictly-increasing ranges).
POSTING_BLOCKS = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("n_docs", T.IntegerType(), False),
        T.StructField("doc_ids_vb", T.BinaryType(), False),
        # per-doc weighted tf: tf * sum(tag_weights) — the score kernel
        # minus the idf factor; WAND scores directly from this. Blocks
        # store ONLY what the WAND scorer decodes (layout v5): raw tfs and
        # packed positions were dead weight — positions live once, in the
        # canonical postings table the phrase path reads.
        T.StructField("wtfs", T.BinaryType(), False),
        # max over docs in block of wtf — multiply by floor(6000/df) at
        # query time for the block's score upper bound
        T.StructField("block_max_wtf", T.DoubleType(), False),
        # ordinal range covered by the block (for slice assignment / skips)
        T.StructField("lo_ord", T.LongType(), False),
        T.StructField("hi_ord", T.LongType(), False),
        T.StructField("term_bucket", T.IntegerType(), False),
    ]
)

# Build lineage / metrics (FIXTURES.md section L; north-rule requirement).
LINEAGE = T.StructType(
    [
        T.StructField("build_id", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("term_lo", T.StringType(), True),
        T.StructField("term_hi", T.StringType(), True),
        T.StructField("doc_lo", T.StringType(), True),
        T.StructField("doc_hi", T.StringType(), True),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("n_postings", T.LongType(), False),
        T.StructField("build_ms", T.LongType(), False),
        T.StructField("snapshot_id", T.StringType(), False),
    ]
)

# Slim projection of transcripts used for result assembly (S9).
DOC_META = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("ps", T.ArrayType(T.StringType()), True),
    ]
)

# Search result row (reference RankedDocument,
# server/src/main/java/ranker/RankedDocument.java:3-14).
RANKED_DOCUMENT = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("score", T.DoubleType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("snippet", T.StringType(), True),
    ]
)
