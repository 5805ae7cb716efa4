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


def _votes(tf: DataFrame, bit_pred) -> DataFrame:
    """One groupBy(doc_id) with 64 partially-aggregated vote sums: vote
    for bit j = +cnt if bit j of the term hash is set else -cnt. The
    previous shape exploded 64 rows per (doc, term) into a
    groupBy(doc_id, bit) — 64x the shuffle row count; 64 sum() columns
    keep map-side combine (one row per doc per map partition) and stay
    entirely in JVM codegen."""
    votes = [
        F.sum(
            F.expr(f"CASE WHEN {bit_pred(j)} THEN cnt ELSE -cnt END")
        ).alias(f"v{j}")
        for j in range(64)
    ]
    return tf.groupBy("doc_id").agg(*votes)


def simhash64(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per doc: for each bit j, sign of sum over tokens of
    (+count if bit j of xxhash64(token) set else -count). Pure JVM bit
    arithmetic, single doc-keyed aggregate (no per-bit row explosion)."""
    tf = _tokens(docs, text_col, id_col).groupBy("doc_id", "term").agg(
        F.count("*").alias("cnt")
    )
    hashed = tf.withColumn("h", F.xxhash64("term"))
    per_doc = _votes(hashed, lambda j: f"(shiftright(h, {j}) & 1L) = 1L")
    # bit 63 contributes the sign bit: its two's-complement value is long
    # min, which sums to exactly the packed signed signature (same value
    # the old shiftleft(1L, 63) aggregate wrapped to)
    sig = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN "
        + (f"{1 << j}L" if j < 63 else f"{-(1 << 63)}L")
        + " ELSE 0L END)"
        for j in range(64)
    )
    return per_doc.select("doc_id", F.expr(sig).cast("long").alias("simhash"))


# ---------------------------------------------------------------- md5 variant
# Same SimHash, bit source = md5 hex digits instead of xxhash64, so a
# DuckDB oracle can compute identical signatures with portable string
# math: bit j of term = bit (j % 4) of hex digit (j // 4) of md5(term).
_HEXDIGITS = "0123456789abcdef"


def _md5_bit_pred(j: int) -> str:
    return (
        f"(shiftright(locate(substring(hx, {1 + j // 4}, 1), '{_HEXDIGITS}') - 1, "
        f"{j % 4}) & 1) = 1"
    )


def _band_expr(b: int) -> str:
    """16-bit band value from the vote columns (bits 16b .. 16b+15)."""
    return " + ".join(
        f"(CASE WHEN v{16 * b + j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(16)
    )


def _simhash_md5_bandframe(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, b0..b3): the four 16-bit bands of the md5-bit SimHash."""
    tf = _tokens(docs, text_col, id_col).groupBy("doc_id", "term").agg(
        F.count("*").alias("cnt")
    )
    hashed = tf.withColumn("hx", F.md5("term"))
    per_doc = _votes(hashed, _md5_bit_pred)
    return per_doc.select(
        "doc_id",
        *[F.expr(_band_expr(b)).cast("int").alias(f"b{b}") for b in range(4)],
    )


def simhash64_md5_hex(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, sig_hex): md5-bit SimHash as a 16-char hex string
    (band 3 high) — an engine-portable signature encoding (no int64
    overflow semantics involved on either side)."""
    bands = _simhash_md5_bandframe(docs, text_col, id_col)
    return bands.select(
        "doc_id",
        F.lower(
            F.format_string("%04x%04x%04x%04x", "b3", "b2", "b1", "b0")
        ).alias("sig_hex"),
    )


def simhash_md5_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_cap: int | None = None,
) -> DataFrame:
    """Near-dup candidate pairs from the md5-bit SimHash: docs sharing
    any 16-bit band (banded LSH join — one row per doc per band, never
    all-pairs). This is the SQL-portable oracle variant (defaults pinned
    by the driver compare); `bucket_cap` drops stop-band buckets like
    `simhash_candidates`, and the xxhash64 `simhash64` +
    `simhash_candidates(n_bands=None)` pair is the corpus-size-scaled
    library path."""
    bands = _simhash_md5_bandframe(docs, text_col, id_col)
    long_bands = bands.select(
        "doc_id",
        F.explode(
            F.expr("array(struct(0 as b, b0 as bv), struct(1 as b, b1 as bv), "
                   "struct(2 as b, b2 as bv), struct(3 as b, b3 as bv))")
        ).alias("e"),
    ).select("doc_id", F.col("e.b").alias("b"), F.col("e.bv").alias("bv"))
    long_bands = _drop_hot_buckets(long_bands, bucket_cap)
    x, y = long_bands.alias("x"), long_bands.alias("y")
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


def auto_bands(n_docs: int, target_occupancy: int = 16) -> int:
    """Band count for `simhash_candidates` scaled to corpus size (round-2
    VERDICT: fixed 16-bit bands mean bucket occupancy grows ~n/65536, so
    the within-bucket self-join turns quadratic at 10^9+ docs). Picks the
    most bands (best recall) whose RANDOM-collision expected bucket
    occupancy n / 2^(64/n_bands) stays <= target_occupancy:

        n <= 2^20 (* target):  4 bands x 16 bits
        larger:                2 bands x 32 bits  (occupancy < 1 up to
                                                   ~4.3e9 * target docs)

    Past that, SimHash's 64 bits are exhausted — shard the corpus or use
    the MinHash family (its band value concatenates two 128-bit hashes,
    so buckets only form on real signature agreement)."""
    for n_bands in (4, 2):
        if n_docs <= (1 << (64 // n_bands)) * target_occupancy:
            return n_bands
    return 2


def simhash_candidates(
    sigs: DataFrame,
    n_bands: int | None = 4,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Near-dup candidate pairs: docs sharing any (64/n_bands)-bit band of
    the simhash (Hamming-distance-bounded LSH).

    Scale controls (either; both compose):
      - `n_bands=None` sizes bands from the corpus via `auto_bands` (one
        count() of the sig frame) — wider bands keep random-collision
        bucket occupancy bounded as n grows.
      - `bucket_cap` drops "stop bands" — buckets holding more than `cap`
        docs (skew: boilerplate/empty docs collapse to few signatures,
        and any shared band value with k docs costs k^2/2 join pairs).
        A band shared by thousands of docs carries no near-dup signal
        (same rationale as hot-shingle removal in the Jaccard verifier);
        true near-dups still pair through their other, colder bands.
        With a cap every surviving bucket emits <= cap*(cap-1)/2 pairs,
        so worst-case join output is linear in the number of buckets
        rather than quadratic in the hottest bucket."""
    if n_bands is None:
        n_bands = auto_bands(sigs.count())
    width = 64 // n_bands
    bands = sigs.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("b"),
    ).withColumn(
        "bv",
        F.expr(f"shiftright(simhash, b * {width}) & {(1 << width) - 1}L"),
    )
    bands = _drop_hot_buckets(bands, bucket_cap)
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


def _drop_hot_buckets(bands: DataFrame, bucket_cap: int | None) -> DataFrame:
    """Anti-join band rows whose (b, bv) bucket exceeds `bucket_cap` docs.
    One partial-aggregated count over the band frame + a broadcast-able
    anti join (the hot set is tiny by construction — at most
    n_rows/cap buckets qualify)."""
    if bucket_cap is None:
        return bands
    hot = (
        bands.groupBy("b", "bv")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > bucket_cap)
        .select("b", "bv")
    )
    return bands.join(hot, ["b", "bv"], "left_anti")


def _sql_md5_votes() -> str:
    """The 64 DuckDB vote-sum expressions mirroring _md5_bit_pred."""
    exprs = []
    for j in range(64):
        bit = (
            f"(((strpos('{_HEXDIGITS}', substr(md5(term), {1 + j // 4}, 1)) - 1) "
            f">> {j % 4}) & 1) = 1"
        )
        exprs.append(f"sum(CASE WHEN {bit} THEN cnt ELSE -cnt END) AS v{j}")
    return ",\n         ".join(exprs)


def _sql_md5_bands() -> str:
    bands = []
    for b in range(4):
        parts = " + ".join(
            f"(CASE WHEN v{16 * b + j} > 0 THEN {1 << j} ELSE 0 END)"
            for j in range(16)
        )
        bands.append(f"({parts})::INT AS b{b}")
    return ",\n         ".join(bands)


def _simhash_sql_prefix() -> str:
    from apt_search_engine_spark.extras.docops import _SQL_TOKS

    return (
        _SQL_TOKS
        + f"""
, tf AS (SELECT doc_id, term, count(*) AS cnt FROM toks GROUP BY doc_id, term)
, votes AS (
  SELECT doc_id,
         {_sql_md5_votes()}
  FROM tf GROUP BY doc_id
)
, bands AS (
  SELECT doc_id,
         {_sql_md5_bands()}
  FROM votes
)"""
    )


def simhash_md5_hex_sql() -> str:
    return (
        _simhash_sql_prefix()
        + "\nSELECT doc_id, lower(printf('%04x%04x%04x%04x', b3, b2, b1, b0)) AS sig_hex FROM bands"
    )


def simhash_md5_candidates_sql() -> str:
    return (
        _simhash_sql_prefix()
        + """
, longb AS (
  SELECT doc_id, 0 AS b, b0 AS bv FROM bands
  UNION ALL SELECT doc_id, 1, b1 FROM bands
  UNION ALL SELECT doc_id, 2, b2 FROM bands
  UNION ALL SELECT doc_id, 3, b3 FROM bands
)
SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
FROM longb x JOIN longb y ON x.b = y.b AND x.bv = y.bv AND x.doc_id < y.doc_id"""
    )


def hamming64(col_a, col_b):
    """Hamming distance between two 64-bit signature columns (popcount of
    xor via bit_count)."""
    return F.bit_count(col_a.bitwiseXOR(col_b))


def _neardup_planes(n_tables: int, n_planes: int, dim: int):
    """Deterministic plane tensor (n_tables, n_planes, dim), seeded —
    shared verbatim (as %.17g literals) by the Spark plan and the DuckDB
    oracle so bucket bits and cosines are bit-identical."""
    import numpy as np

    rng = np.random.default_rng(12345)
    return rng.standard_normal((n_tables, n_planes, dim))


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 12,
    n_tables: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicates: candidate pairs = same random-
    hyperplane sign bucket in ANY of `n_tables` independent LSH tables
    (recall 1-(1-r)^T for per-table collision rate r), exact cosine
    verify on candidates only. At 100 TB the bucket join replaces the
    quadratic cross join; the verify join runs on the (distinct)
    candidate pairs, not on buckets, so multi-table union never
    re-scores a pair twice."""
    v = emb.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    dim = len(v.select("v").first().v)
    planes = _neardup_planes(n_tables, n_planes, dim)

    def plane_lit(t: int) -> str:
        return (
            "array("
            + ", ".join(
                "array(" + ", ".join(f"{x:.17g}D" for x in row) + ")"
                for row in planes[t]
            )
            + ")"
        )

    def bucket_expr(t: int) -> str:
        return (
            f"aggregate(sequence(0, {n_planes - 1}), 0L, (acc, p) -> acc + "
            f"CASE WHEN aggregate(zip_with(v, {plane_lit(t)}[p], (x, w) -> x * w), 0D, "
            f"(a, z) -> a + z) > 0 THEN shiftleft(1L, p) ELSE 0L END)"
        )

    table_structs = ", ".join(
        f"struct({t} as t, ({bucket_expr(t)}) as bucket)" for t in range(n_tables)
    )
    sigs = v.select(
        "vec_id", F.explode(F.expr(f"array({table_structs})")).alias("e")
    ).select("vec_id", F.col("e.t").alias("t"), F.col("e.bucket").alias("bucket"))
    x, y = sigs.alias("x"), sigs.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.t") == F.col("y.t"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(F.col("x.vec_id").alias("vec_a"), F.col("y.vec_id").alias("vec_b"))
        .distinct()
    )
    va = v.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    vb = v.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    dot = "aggregate(zip_with(va, vb, (a, b) -> a * b), 0D, (acc, z) -> acc + z)"
    nx = "sqrt(aggregate(zip_with(va, va, (a, b) -> a * b), 0D, (acc, z) -> acc + z))"
    ny = "sqrt(aggregate(zip_with(vb, vb, (a, b) -> a * b), 0D, (acc, z) -> acc + z))"
    return (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .withColumn("cos", F.expr(f"{dot} / ({nx} * {ny})"))
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", F.round("cos", 6).alias("cos"))
    )


def embedding_neardup_sql(
    threshold: float, n_planes: int, n_tables: int, dim: int
) -> str:
    """DuckDB oracle for embedding_neardup_pairs over the registered
    `embeddings` view — same plane literals, same IEEE op order (list_sum
    folds left-to-right like Spark's aggregate)."""
    planes = _neardup_planes(n_tables, n_planes, dim)

    def plane_row_lit(t: int, p: int) -> str:
        return "[" + ", ".join(f"{x:.17g}::DOUBLE" for x in planes[t][p]) + "]"

    def bucket_expr(t: int) -> str:
        bits = " + ".join(
            f"(CASE WHEN list_sum(list_transform(range(1, {dim + 1}), "
            f"i -> v[i] * ({plane_row_lit(t, p)})[i])) > 0 THEN {1 << p} ELSE 0 END)"
            for p in range(n_planes)
        )
        return f"({bits})"

    table_rows = "\n  UNION ALL ".join(
        f"SELECT vec_id, {t} AS t, {bucket_expr(t)} AS bucket, v FROM e"
        for t in range(n_tables)
    )
    rng = f"range(1, {dim + 1})"
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
sigs AS (
  {table_rows}
),
cand AS (
  SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
  FROM sigs x JOIN sigs y ON x.t = y.t AND x.bucket = y.bucket AND x.vec_id < y.vec_id
),
scored AS (
  SELECT c.vec_a, c.vec_b,
         list_sum(list_transform({rng}, i -> a.v[i] * b.v[i]))
         / (sqrt(list_sum(list_transform({rng}, i -> a.v[i] * a.v[i])))
            * sqrt(list_sum(list_transform({rng}, i -> b.v[i] * b.v[i])))) AS cos
  FROM cand c
  JOIN e a ON a.vec_id = c.vec_a
  JOIN e b ON b.vec_id = c.vec_b
)
SELECT vec_a, vec_b, round(cos, 6) AS cos
FROM scored WHERE cos >= {threshold!r}::DOUBLE"""
