"""Deduplication operators for large-scale training-data pipelines.

Complements the exact/minhash/jaccard ops in docops.py (those carry DuckDB
oracles) with the ops whose primitives aren't SQL-expressible across both
engines:

  - simhash64: 64-bit SimHash over admitted tokens (bit-majority of
    per-token xxhash64), near-dup candidates = identical band of bits.
  - embedding near-dup: cosine >= threshold pairs via LSH bucketing
    (random-hyperplane signs), avoiding the O(n^2) cross join.

All distributed work is native Spark expressions (bit ops, aggregates) —
no Python on the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from apt_search_engine_spark.analysis.stopwords import STOPWORDS

_STOPS = sorted(STOPWORDS)


def _tokens(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    arr = F.split(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", " "), r"\s+"
    )
    t = docs.select(F.col(id_col).alias("doc_id"), F.explode(arr).alias("term"))
    return t.filter(
        (F.length("term") > 1)
        & ~F.col("term").rlike("^[0-9]+$")
        & ~F.col("term").isin(_STOPS)
    )


def simhash64(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per doc: for each bit j, sign of sum over tokens of
    (+count if bit j of xxhash64(token) set else -count). Pure JVM bit
    arithmetic: shiftright + bitwise and, one explode over 64 bit indices
    of the (small) distinct-term-per-doc frame."""
    tf = _tokens(docs, text_col, id_col).groupBy("doc_id", "term").agg(
        F.count("*").alias("cnt")
    )
    hashed = tf.withColumn("h", F.xxhash64("term"))
    bits = hashed.select(
        "doc_id",
        "cnt",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("bit"),
    ).withColumn(
        "vote",
        F.expr("CASE WHEN (shiftright(h, bit) & 1L) = 1L THEN cnt ELSE -cnt END"),
    )
    sigs = (
        bits.groupBy("doc_id", "bit")
        .agg(F.sum("vote").alias("v"))
        .withColumn(
            "bitval", F.expr("CASE WHEN v > 0 THEN shiftleft(1L, bit) ELSE 0L END")
        )
        .groupBy("doc_id")
        .agg(F.sum("bitval").cast("long").alias("simhash"))
    )
    return sigs


def simhash_candidates(sigs: DataFrame, n_bands: int = 4) -> DataFrame:
    """Near-dup candidate pairs: docs sharing any 16-bit band of the
    simhash (Hamming-distance-bounded LSH)."""
    width = 64 // n_bands
    bands = sigs.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("b"),
    ).withColumn(
        "bv",
        F.expr(f"shiftright(simhash, b * {width}) & {(1 << width) - 1}L"),
    )
    x, y = bands.alias("x"), bands.alias("y")
    return (
        x.join(
            y,
            (F.col("x.b") == F.col("y.b"))
            & (F.col("x.bv") == F.col("y.bv"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )


def hamming64(col_a, col_b):
    """Hamming distance between two 64-bit signature columns (popcount of
    xor via bit_count)."""
    return F.bit_count(col_a.bitwiseXOR(col_b))


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicates: LSH bucket on random-hyperplane sign bits
    (deterministic pseudo-planes from xxhash64 of (dim, plane)), exact
    cosine verify within buckets only. At 100 TB the bucket join replaces
    the quadratic cross join; plane count tunes recall."""
    v = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v"))
    dim = len(v.select("v").first().v)
    # deterministic pseudo-random plane matrix as a SQL literal:
    # plane[p][d] = sign bits from a splitmix-style integer hash
    import numpy as np

    rng = np.random.default_rng(12345)
    planes = rng.standard_normal((n_planes, dim))
    plane_lit = (
        "array("
        + ", ".join(
            "array(" + ", ".join(f"{x:.17g}D" for x in row) + ")" for row in planes
        )
        + ")"
    )
    sig_expr = (
        f"aggregate(sequence(0, {n_planes - 1}), 0L, (acc, p) -> acc + "
        f"CASE WHEN aggregate(zip_with(v, {plane_lit}[p], (x, w) -> x * w), 0D, "
        f"(a, z) -> a + z) > 0 THEN shiftleft(1L, p) ELSE 0L END)"
    )
    sigs = v.withColumn("bucket", F.expr(sig_expr))
    x, y = sigs.alias("x"), sigs.alias("y")
    dot = "aggregate(zip_with(x.v, y.v, (a, b) -> a * b), 0D, (acc, z) -> acc + z)"
    nx = "sqrt(aggregate(zip_with(x.v, x.v, (a, b) -> a * b), 0D, (acc, z) -> acc + z))"
    ny = "sqrt(aggregate(zip_with(y.v, y.v, (a, b) -> a * b), 0D, (acc, z) -> acc + z))"
    return (
        x.join(
            y,
            (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .withColumn("cos", F.expr(f"{dot} / ({nx} * {ny})"))
        .filter(F.col("cos") >= threshold)
        .select(
            F.col("x.vec_id").alias("vec_a"),
            F.col("y.vec_id").alias("vec_b"),
            F.round("cos", 6).alias("cos"),
        )
    )
