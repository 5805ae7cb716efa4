"""Driver-checkable operator suite over /root/testdata tables.

Each operator exists twice, kept in sync in this one file:
  SPARK_QUERIES[name](spark, sf_dir) -> DataFrame   (the engine, Spark-first)
  ORACLE_SQL[name]                                  (ANSI SQL for DuckDB)

These exercise the engine's SQL-expressible building blocks over the
driver-provided `documents(doc_id, text, lang, source, n_chars)` table —
tokenize/admission/tf (quirks Q1/Q2 math), df + floor-division IDF,
candidate intersection, positional phrase adjacency, top-k scoring — plus
the large-scale training-data-pipeline operators (dedup family, similarity
search, text analysis) and generic join/window coverage on the TPC-H-ish
tables. The Porter-stemmed full-engine paths are NOT here (stemming is not
expressible in SQL); those are verified engine-vs-oracle in tests/ and
exposed as rows-only queries in __spark_entry__.py.

Float parity rules: every cross-term float aggregate is rounded (6 dp) on
BOTH sides; pure ratios of integers are exact IEEE and left unrounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from apt_search_engine_spark.analysis.stopwords import STOPWORDS

_STOPS_SQL = ", ".join("'" + w.replace("'", "''") + "'" for w in sorted(STOPWORDS))
_STOPS_LIST = sorted(STOPWORDS)

QUERY_TERMS = ("table", "scan", "query")
PHRASE = ("table", "hash")  # frequent adjacent pair in the driver corpus


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _raw_arr():
    return F.split(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]", " "), r"\s+")


def _toks(docs: DataFrame) -> DataFrame:
    """Admitted tokens with pre-filter positions (T1+T2+T3, no stemming)."""
    t = docs.select("doc_id", F.posexplode(_raw_arr()).alias("pos", "term"))
    return t.filter(
        (F.length("term") > 1)
        & ~F.col("term").rlike("^[0-9]+$")
        & ~F.col("term").isin(_STOPS_LIST)
    )


_MEMO: dict = {}


def _memo(spark, sf_dir, key, builder):
    """Suite-level reuse: the driver's correctness gate runs every entry
    in ONE session, and the upstream frames shared by many entries (the
    admitted-token stream, the LSH candidate pairs) dominate its wall.
    Persist each once per (session, sf_dir). persist() is lazy — a
    single-op caller only pays the storage write of partitions it
    computes anyway — and MEMORY_AND_DISK spills instead of OOMing at
    cluster scale."""
    from pyspark import StorageLevel

    # applicationId (not id(spark)): a restarted session must never see
    # a cached frame belonging to a stopped SparkContext
    app = spark.sparkContext.applicationId
    k = (app, sf_dir, key)
    if k not in _MEMO:
        # evict entries of other applications: their contexts are stopped
        # (frames unusable, storage already gone with the executors) — a
        # long-lived driver cycling sessions must not accumulate handles
        for stale in [m for m in _MEMO if m[0] != app]:
            del _MEMO[stale]
        _MEMO[k] = builder().persist(StorageLevel.MEMORY_AND_DISK)
    return _MEMO[k]


def _toks_of(spark, sf_dir) -> DataFrame:
    return _memo(spark, sf_dir, "toks", lambda: _toks(_docs(spark, sf_dir)))


# SQL CTE prefix shared by token-based oracles
_SQL_TOKS = f"""
WITH base AS (
  SELECT doc_id,
         string_split_regex(regexp_replace(lower(text), '[^a-z0-9]', ' ', 'g'), '\\s+') AS arr
  FROM documents
), toks AS (
  SELECT doc_id, tok AS term, ord - 1 AS pos
  FROM (SELECT doc_id, unnest(arr) AS tok, generate_subscripts(arr, 1) AS ord FROM base)
  WHERE length(tok) > 1 AND NOT regexp_full_match(tok, '\\d+')
        AND tok NOT IN ({_STOPS_SQL})
)
"""


# --------------------------------------------------------------------- T1-T5
def q_tokenize_tf(spark, sf_dir):
    toks = _toks_of(spark, sf_dir)
    agg = toks.groupBy("doc_id", "term").agg(F.count("*").alias("occ"))
    tot = agg.groupBy("doc_id").agg(F.sum(F.col("occ") + 1).alias("total"))
    return agg.join(tot, "doc_id").select(
        "doc_id",
        "term",
        "occ",
        ((F.col("occ") + 1).cast("double") / F.col("total")).alias("tf"),
    )


SQL_TOKENIZE_TF = _SQL_TOKS + """
, agg AS (SELECT doc_id, term, count(*) AS occ FROM toks GROUP BY doc_id, term)
, tot AS (SELECT doc_id, sum(occ + 1) AS total FROM agg GROUP BY doc_id)
SELECT a.doc_id, a.term, a.occ, (a.occ + 1)::DOUBLE / t.total AS tf
FROM agg a JOIN tot t USING (doc_id)
"""


# ------------------------------------------------------------------- df/IDF
def q_term_df(spark, sf_dir):
    return (
        _toks_of(spark, sf_dir)
        .groupBy("term")
        .agg(F.countDistinct("doc_id").cast("int").alias("df"))
        .withColumn(
            "idf_floor", F.floor(F.lit(6000) / F.col("df")).cast("int")
        )
    )


SQL_TERM_DF = _SQL_TOKS + """
SELECT term, count(DISTINCT doc_id)::INT AS df,
       (6000 // count(DISTINCT doc_id))::INT AS idf_floor
FROM toks GROUP BY term
"""


# ------------------------------------------------------------ P4 candidates
def q_candidate_and(spark, sf_dir):
    return (
        _toks_of(spark, sf_dir)
        .filter(F.col("term").isin(list(PHRASE)))
        .groupBy("doc_id")
        .agg(F.countDistinct("term").alias("nt"))
        .filter(F.col("nt") == len(PHRASE))
        .select("doc_id")
    )


SQL_CANDIDATE_AND = _SQL_TOKS + f"""
SELECT doc_id FROM toks WHERE term IN ('{PHRASE[0]}', '{PHRASE[1]}')
GROUP BY doc_id HAVING count(DISTINCT term) = 2
"""


# ------------------------------------------------------------------ P5 phrase
def q_phrase_adjacency(spark, sf_dir):
    toks = _toks_of(spark, sf_dir)
    p1 = (
        toks.filter(F.col("term") == PHRASE[0])
        .groupBy("doc_id")
        .agg(F.collect_list("pos").alias("ps1"))
    )
    p2 = (
        toks.filter(F.col("term") == PHRASE[1])
        .groupBy("doc_id")
        .agg(F.collect_list("pos").alias("ps2"))
    )
    return (
        p1.join(p2, "doc_id")
        .filter(
            F.expr("size(array_intersect(transform(ps1, x -> x + 1), ps2)) > 0")
        )
        .select("doc_id")
    )


SQL_PHRASE_ADJACENCY = _SQL_TOKS + f"""
, p1 AS (SELECT doc_id, list(pos) AS ps FROM toks WHERE term = '{PHRASE[0]}' GROUP BY doc_id)
, p2 AS (SELECT doc_id, list(pos) AS ps FROM toks WHERE term = '{PHRASE[1]}' GROUP BY doc_id)
SELECT p1.doc_id FROM p1 JOIN p2 USING (doc_id)
WHERE len(list_intersect(list_transform(p1.ps, x -> x + 1), p2.ps)) > 0
"""


# ----------------------------------------------------------- R2-R4 scoring
def q_bag_topk_score(spark, sf_dir):
    """Reference scoring math on unstemmed admitted tokens: per (term,doc)
    contribution = tf * floor(6000/df) * 0.5 * occ (all-body tags -> one
    0.5 weight per position), summed per doc, x uniform prior 1/N."""
    docs = _docs(spark, sf_dir)
    toks = _toks_of(spark, sf_dir)
    agg = toks.groupBy("doc_id", "term").agg(F.count("*").alias("occ"))
    tot = agg.groupBy("doc_id").agg(F.sum(F.col("occ") + 1).alias("total"))
    dfs = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        agg.filter(F.col("term").isin(list(QUERY_TERMS)))
        .join(tot, "doc_id")
        .join(dfs, "term")
        .withColumn(
            "contrib",
            ((F.col("occ") + 1).cast("double") / F.col("total"))
            * F.floor(F.lit(6000) / F.col("df")).cast("double")
            * F.lit(0.5)
            * F.col("occ"),
        )
        .groupBy("doc_id")
        .agg(F.sum("contrib").alias("raw"))
        .crossJoin(n)
        .select("doc_id", F.round(F.col("raw") / F.col("n_docs"), 6).alias("score"))
    )
    return scored


SQL_BAG_TOPK_SCORE = _SQL_TOKS + f"""
, agg AS (SELECT doc_id, term, count(*) AS occ FROM toks GROUP BY doc_id, term)
, tot AS (SELECT doc_id, sum(occ + 1) AS total FROM agg GROUP BY doc_id)
, dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term)
, n AS (SELECT count(*) AS n_docs FROM documents)
SELECT a.doc_id,
       round(sum(((a.occ + 1)::DOUBLE / t.total) * ((6000 // d.df)::DOUBLE) * 0.5 * a.occ)
             / any_value(n.n_docs), 6) AS score
FROM agg a JOIN tot t USING (doc_id) JOIN dfs d USING (term) CROSS JOIN n
WHERE a.term IN ('{QUERY_TERMS[0]}', '{QUERY_TERMS[1]}', '{QUERY_TERMS[2]}')
GROUP BY a.doc_id
"""


# ------------------------------------------------------------- dedup: exact
def q_dedup_exact(spark, sf_dir):
    return (
        _docs(spark, sf_dir)
        .groupBy(F.md5(F.col("text")).alias("h"))
        .agg(F.count("*").alias("n"), F.min("doc_id").alias("keeper"))
    )


SQL_DEDUP_EXACT = """
SELECT md5(text) AS h, count(*) AS n, min(doc_id) AS keeper
FROM documents GROUP BY md5(text)
"""


# ------------------------------------------------------ dedup: minhash sigs
_N_HASHES = 8
_N_BANDS = 4  # 2 hashes per band


def _shingles(docs: DataFrame) -> DataFrame:
    """Word 3-gram shingles over the raw normalized split array."""
    return (
        docs.select("doc_id", _raw_arr().alias("arr"))
        .filter(F.size("arr") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(arr) - 3), "
                    "i -> concat_ws(' ', arr[i], arr[i+1], arr[i+2]))"
                )
            ).alias("shingle"),
        )
    )


_SQL_SHINGLES = """
WITH base AS (
  SELECT doc_id,
         string_split_regex(regexp_replace(lower(text), '[^a-z0-9]', ' ', 'g'), '\\s+') AS arr
  FROM documents
), sh AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(arr) - 1),
                i -> arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2])) AS shingle
  FROM base WHERE len(arr) >= 3
)
"""


def q_decontaminate_ngram(spark, sf_dir):
    """Benchmark decontamination — the training-data op that removes docs
    sharing verbatim n-grams with an evaluation set (the reason eval
    scores stay honest). Eval set here: the deterministic 1-in-20 slice
    of documents by md5(doc_id); a real pipeline passes its benchmark
    table instead. A doc is contaminated when ANY of its word 3-gram
    shingles appears in the eval set's shingles.

    Plan shape at 100 TB: the eval shingle set is benchmark-sized (small)
    — distinct + broadcast semi-join against the training shingle stream,
    then a groupBy(doc_id) for the per-doc verdict; no self-join, no
    skew (the semi-join probe side never amplifies)."""
    docs = _docs(spark, sf_dir)
    is_eval = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long") % 20 == 0
    )
    tagged = docs.withColumn("is_eval", is_eval)
    eval_sh = (
        _shingles(tagged.filter("is_eval"))
        .select("shingle")
        .distinct()
    )
    train_sh = _shingles(tagged.filter(~F.col("is_eval"))).select(
        "doc_id", "shingle"
    )
    hits = (
        train_sh.join(F.broadcast(eval_sh), "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.countDistinct("shingle").cast("int").alias("n_shared_ngrams"))
    )
    return (
        tagged.filter(~F.col("is_eval"))
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shared_ngrams", F.lit(0)).alias("n_shared_ngrams"),
            (F.coalesce("n_shared_ngrams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


SQL_DECONTAMINATE_NGRAM = """
WITH tagged AS (
  SELECT doc_id, text,
         (('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INT % 20 = 0) AS is_eval
  FROM documents
), base AS (
  SELECT doc_id, is_eval,
         string_split_regex(regexp_replace(lower(text), '[^a-z0-9]', ' ', 'g'), '\\s+') AS arr
  FROM tagged
), sh AS (
  SELECT doc_id, is_eval,
         unnest(list_transform(range(1, len(arr) - 1),
                i -> arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2])) AS shingle
  FROM base WHERE len(arr) >= 3
), eval_sh AS (
  SELECT DISTINCT shingle FROM sh WHERE is_eval
), hits AS (
  SELECT s.doc_id, count(DISTINCT s.shingle)::INT AS n_shared_ngrams
  FROM sh s JOIN eval_sh e USING (shingle)
  WHERE NOT s.is_eval
  GROUP BY s.doc_id
)
SELECT t.doc_id,
       coalesce(h.n_shared_ngrams, 0) AS n_shared_ngrams,
       coalesce(h.n_shared_ngrams, 0) > 0 AS contaminated
FROM tagged t LEFT JOIN hits h USING (doc_id)
WHERE NOT t.is_eval
"""


def _minhash_sig_wide(docs: DataFrame) -> DataFrame:
    """One row per doc, one column per salted minhash: a single
    groupBy(doc_id) with _N_HASHES partial-min aggregates over the
    shingle rows. Same md5 inputs (salt-as-string || '|' || shingle) as
    the row-per-(doc,salt) formulation, so values are bit-identical —
    but there is no x8 shingle-row explosion and no second
    collect_list aggregation: map-side combine reduces each partition
    to n_docs rows before the only shuffle."""
    sh = _shingles(docs)
    return sh.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{salt}|"), F.col("shingle")))).alias(
                f"m{salt}"
            )
            for salt in range(_N_HASHES)
        ]
    )


def q_minhash_signatures(spark, sf_dir):
    wide = _minhash_sig_wide(_docs(spark, sf_dir))
    return wide.select(
        "doc_id",
        F.posexplode(
            F.array(*[F.col(f"m{salt}") for salt in range(_N_HASHES)])
        ).alias("salt", "minh"),
    )


SQL_MINHASH_SIGNATURES = _SQL_SHINGLES + f"""
, salts AS (SELECT unnest(range(0, {_N_HASHES})) AS salt)
SELECT doc_id, salt, min(md5(salt::VARCHAR || '|' || shingle)) AS minh
FROM sh CROSS JOIN salts GROUP BY doc_id, salt
"""


# --------------------------------------------------- dedup: minhash LSH pairs
def q_minhash_pairs(spark, sf_dir):
    """Banded-LSH candidate pairs; memoized because three gate entries
    (minhash_pairs, neardup_components, ngram_jaccard) consume the same
    frame."""
    return _memo(
        spark, sf_dir, "minhash_pairs", lambda: _minhash_pairs_plan(spark, sf_dir)
    )


def _minhash_pairs_plan(spark, sf_dir):
    # band rows memoized under the same key q_cross_dedup uses, so a gate
    # run computes the shingle/minhash subtree once for both entries
    return minhash_pairs_df(
        _docs(spark, sf_dir),
        bands=_memo(
            spark,
            sf_dir,
            "minhash_bands",
            lambda: _minhash_bands(_docs(spark, sf_dir)),
        ),
    )


def _minhash_bands(docs: DataFrame) -> DataFrame:
    """LSH band rows (doc_id, b, bv) — band value = concat of the band's
    two 128-bit minhashes, so buckets collide only on real signature
    agreement. Shared by the self-join pair finder and the cross-corpus
    dedup (new-vs-reference semi-join)."""
    sig = _minhash_sig_wide(docs).select(
        "doc_id",
        F.array(*[F.col(f"m{salt}") for salt in range(_N_HASHES)]).alias("s"),
    )
    return sig.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {_N_BANDS - 1}), "
                "b -> struct(b as b, concat(s[2*b], s[2*b+1]) as bv))"
            )
        ).alias("band"),
    ).select("doc_id", F.col("band.b").alias("b"), F.col("band.bv").alias("bv"))


def minhash_pairs_df(docs: DataFrame, bands: DataFrame | None = None) -> DataFrame:
    """Banded-LSH candidate pairs over an arbitrary documents frame
    (doc_id, text) — the DataFrame-level surface extras/curate.py
    composes; the sf_dir entries above wrap it.

    Plan: ONE pass over the band rows — groupBy(b, bv) buckets, then
    within-bucket pair explosion in JVM array functions. The previous
    self-join evaluated the bands subtree (shingles + 8 salted md5
    minhashes over the whole corpus) twice and shuffled both copies;
    this shuffles the same rows once and never recomputes the subtree.
    Output is identical: unordered pairs sharing any band bucket, with
    doc_a < doc_b (array_sort fixes orientation), distinct across bands.
    Bucket width is bounded for real corpora — bv is the concat of two
    128-bit minhashes, so a bucket IS a near-dup group; a size-n dup
    cluster emits its n(n-1)/2 pairs either way (output-bound, not a
    plan artifact)."""
    if bands is None:
        bands = _minhash_bands(docs)
    buckets = (
        # collect_set, not collect_list: an input frame with duplicate
        # doc_id rows must not yield (d, d) self-pairs — the old
        # self-join's strict doc_a < doc_b could never produce them
        bands.groupBy("b", "bv")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pair_expr = (
        "flatten(transform(sequence(0, size(ids) - 2), i -> "
        "transform(slice(ids, i + 2, size(ids) - i - 1), "
        "y -> struct(ids[i] AS doc_a, y AS doc_b))))"
    )
    return (
        buckets.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


# shared CTE chain: shingles -> salted minhashes -> signatures -> band rows
_SQL_BANDS = _SQL_SHINGLES + f"""
, salts AS (SELECT unnest(range(0, {_N_HASHES})) AS salt)
, mh AS (
  SELECT doc_id, salt, min(md5(salt::VARCHAR || '|' || shingle)) AS minh
  FROM sh CROSS JOIN salts GROUP BY doc_id, salt
)
, sig AS (SELECT doc_id, list(minh ORDER BY salt) AS s FROM mh GROUP BY doc_id)
, bands AS (
  SELECT doc_id, b, s[2*b + 1] || s[2*b + 2] AS bv
  FROM sig, LATERAL (SELECT unnest(range(0, {_N_BANDS})) AS b)
)
"""

SQL_MINHASH_PAIRS = _SQL_BANDS + """
SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
FROM bands x JOIN bands y ON x.b = y.b AND x.bv = y.bv AND x.doc_id < y.doc_id
"""


# ------------------------- dedup: near-dup clusters (connected components)
def connected_components(
    pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """Min-label propagation over undirected candidate-pair edges:
    returns (doc_id, component) for every doc appearing in `pairs`,
    component = the lexicographically smallest doc_id reachable — the
    canonical representative a dedup pipeline keeps. Pairwise LSH output
    is NOT a dedup decision (near-dup similarity is transitive in
    practice but pairs are not closed under it); clustering is the step
    that turns candidate pairs into keep/drop sets.

    Scale shape: each round is one shuffle join (edges x labels) + a
    map-side-combined min aggregate; rounds = cluster diameter, and
    near-dup clusters are small and dense (diameter 2-3), so the loop is
    a handful of bounded jobs with cached frames (previous iteration
    unpersisted). At extreme edge counts swap the body for the
    alternating large-star/small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) — same
    DataFrame surface, fewer rounds on high-diameter graphs."""
    edges = pairs.select(F.col(src).alias("x"), F.col(dst).alias("y"))
    edges = (
        edges.union(edges.select(F.col("y").alias("x"), F.col("x").alias("y")))
        .distinct()
        .cache()
    )
    labels = (
        edges.select(F.col("x").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .cache()
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels.withColumnRenamed("node", "y"), "y")
            .groupBy("x")
            .agg(F.min("label").alias("nbr_min"))
            .withColumnRenamed("x", "node")
        )
        new = (
            labels.withColumnRenamed("label", "old")
            .join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("old"), F.coalesce("nbr_min", F.col("old"))
                ).alias("label"),
                "old",
            )
            .cache()
        )
        changed = new.filter(F.col("label") != F.col("old")).count()
        labels.unpersist()
        labels = new.select("node", "label")
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("component")
    )


def q_neardup_components(spark, sf_dir):
    """Memoized like the pairs frame it consumes: dedup_keep_best reruns
    the same label-propagation loop otherwise (suite-level reuse)."""
    return _memo(
        spark,
        sf_dir,
        "neardup_components",
        lambda: connected_components(q_minhash_pairs(spark, sf_dir)),
    )


# transitive closure in SQL: component = min reachable node. The UNION
# (not UNION ALL) dedups rows, so the recursion terminates on cycles;
# candidate-pair graphs at the gate scale are tiny, so closure is cheap.
SQL_NEARDUP_COMPONENTS = _SQL_SHINGLES.replace(
    "WITH base", "WITH RECURSIVE base", 1
) + f"""
, salts AS (SELECT unnest(range(0, {_N_HASHES})) AS salt)
, mh AS (
  SELECT doc_id, salt, min(md5(salt::VARCHAR || '|' || shingle)) AS minh
  FROM sh CROSS JOIN salts GROUP BY doc_id, salt
)
, sig AS (SELECT doc_id, list(minh ORDER BY salt) AS s FROM mh GROUP BY doc_id)
, bands AS (
  SELECT doc_id, b, s[2*b + 1] || s[2*b + 2] AS bv
  FROM sig, LATERAL (SELECT unnest(range(0, {_N_BANDS})) AS b)
)
, pairs AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x JOIN bands y ON x.b = y.b AND x.bv = y.bv AND x.doc_id < y.doc_id
)
, edges AS (
  SELECT doc_a AS x, doc_b AS y FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
)
, nodes AS (SELECT DISTINCT x AS node FROM edges)
, reach(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.y, r.label FROM reach r JOIN edges e ON e.x = r.node
)
SELECT node AS doc_id, min(label) AS component FROM reach GROUP BY node
"""


# ------------------------------------- dedup: canonical pick per cluster
def q_dedup_keep_best(spark, sf_dir):
    """Pipeline composition: canonical-document selection per near-dup
    cluster. Every doc gets (component, n_tokens, keep): docs inside an
    LSH cluster keep only the longest member (raw non-empty token count,
    tiebreak ascending doc_id — deterministic); docs outside any cluster
    are their own component and always kept. This is the step a training
    pipeline runs after near-dup clustering to materialize the deduped
    corpus.

    Plan shape at 100 TB: n_tokens is map-only (array size, no explode);
    the component frame is bounded by LSH candidate pairs (a tiny corpus
    fraction) so both the inner join and the anti join broadcast it; the
    row_number window partitions by component — cluster-sized groups,
    never corpus-sized skew."""
    comps = q_neardup_components(spark, sf_dir)
    ntok = _docs(spark, sf_dir).select(
        "doc_id",
        F.size(F.filter(_raw_arr(), lambda x: x != "")).cast("long").alias(
            "n_tokens"
        ),
    )
    w = Window.partitionBy("component").orderBy(
        F.desc("n_tokens"), F.asc("doc_id")
    )
    clustered = ntok.join(F.broadcast(comps), "doc_id").select(
        "doc_id",
        "component",
        "n_tokens",
        (F.row_number().over(w) == 1).alias("keep"),
    )
    singles = ntok.join(F.broadcast(comps), "doc_id", "left_anti").select(
        "doc_id",
        F.col("doc_id").alias("component"),
        "n_tokens",
        F.lit(True).alias("keep"),
    )
    return clustered.unionByName(singles)


SQL_DEDUP_KEEP_BEST = SQL_NEARDUP_COMPONENTS.replace(
    "SELECT node AS doc_id, min(label) AS component FROM reach GROUP BY node",
    """\
, comp AS (SELECT node AS doc_id, min(label) AS component FROM reach GROUP BY node)
, ntok AS (
  SELECT doc_id, len(list_filter(arr, x -> x <> ''))::BIGINT AS n_tokens
  FROM base
)
SELECT n.doc_id, c.component, n.n_tokens,
       (row_number() OVER (PARTITION BY c.component
                           ORDER BY n.n_tokens DESC, n.doc_id ASC) = 1) AS keep
FROM ntok n JOIN comp c USING (doc_id)
UNION ALL
SELECT n.doc_id, n.doc_id AS component, n.n_tokens, true AS keep
FROM ntok n LEFT JOIN comp c USING (doc_id)
WHERE c.doc_id IS NULL""",
)


# ------------------------------------------- dedup: n-gram Jaccard (on LSH)
def q_ngram_jaccard(spark, sf_dir):
    pairs = q_minhash_pairs(spark, sf_dir)
    dsh = _shingles(_docs(spark, sf_dir)).distinct()
    # Restrict the shingle frame to LSH-candidate docs BEFORE the
    # co-shingle self-join: without this the join computes intersections
    # for EVERY co-shingled doc pair — quadratic on hot shingles (a
    # common 3-gram shared by 10^6 docs is 10^12 join rows at scale).
    # Candidate docs are a tiny fraction of the corpus by construction.
    cand_docs = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    dshc = dsh.join(cand_docs, "doc_id", "left_semi")
    # per-doc shingle counts are doc-local, so the candidate-restricted
    # frame yields the same ca/cb values without a full-corpus aggregate
    cnt = dshc.groupBy("doc_id").agg(F.count("*").alias("c"))
    a, b = dshc.alias("a"), dshc.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    return (
        pairs.join(inter, ["doc_a", "doc_b"])
        .join(cnt.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("c", "ca"), "doc_a")
        .join(cnt.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("c", "cb"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter").cast("double")
                / (F.col("ca") + F.col("cb") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
    )


SQL_NGRAM_JACCARD = _SQL_SHINGLES + f"""
, salts AS (SELECT unnest(range(0, {_N_HASHES})) AS salt)
, mh AS (
  SELECT doc_id, salt, min(md5(salt::VARCHAR || '|' || shingle)) AS minh
  FROM sh CROSS JOIN salts GROUP BY doc_id, salt
)
, sig AS (SELECT doc_id, list(minh ORDER BY salt) AS s FROM mh GROUP BY doc_id)
, bands AS (
  SELECT doc_id, b, s[2*b + 1] || s[2*b + 2] AS bv
  FROM sig, LATERAL (SELECT unnest(range(0, {_N_BANDS})) AS b)
)
, pairs AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x JOIN bands y ON x.b = y.b AND x.bv = y.bv AND x.doc_id < y.doc_id
)
, dsh AS (SELECT DISTINCT doc_id, shingle FROM sh)
, cand_docs AS (
  SELECT doc_a AS doc_id FROM pairs UNION SELECT doc_b AS doc_id FROM pairs
)
, dshc AS (SELECT * FROM dsh WHERE doc_id IN (SELECT doc_id FROM cand_docs))
, cnt AS (SELECT doc_id, count(*) AS c FROM dshc GROUP BY doc_id)
, inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM dshc a JOIN dshc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT p.doc_a, p.doc_b,
       round(i.inter::DOUBLE / (ca.c + cb.c - i.inter), 6) AS jaccard
FROM pairs p
JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
JOIN cnt ca ON ca.doc_id = p.doc_a
JOIN cnt cb ON cb.doc_id = p.doc_b
"""


# ------------------------------------------------ similarity: cosine to q=0
def q_embedding_cosine(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    dot = "aggregate(zip_with(v, qv, (x, y) -> x * y), 0D, (acc, z) -> acc + z)"
    n1 = "sqrt(aggregate(zip_with(v, v, (x, y) -> x * y), 0D, (acc, z) -> acc + z))"
    n2 = "sqrt(aggregate(zip_with(qv, qv, (x, y) -> x * y), 0D, (acc, z) -> acc + z))"
    return (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(F.expr(dot) / (F.expr(n1) * F.expr(n2)), 6).alias("cos"),
        )
    )


SQL_EMBEDDING_COSINE = """
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings)
, q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
SELECT e.vec_id,
       round(list_sum(list_transform(range(1, 65), i -> e.v[i] * q.qv[i])) /
             (sqrt(list_sum(list_transform(range(1, 65), i -> e.v[i] * e.v[i]))) *
              sqrt(list_sum(list_transform(range(1, 65), i -> q.qv[i] * q.qv[i])))), 6) AS cos
FROM e CROSS JOIN q WHERE e.vec_id <> 0
"""


# -------------------------------------------------- text analysis operators
def q_stopword_ratio(spark, sf_dir):
    raw = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(_raw_arr()).alias("tok"))
        .filter(F.col("tok") != "")
    )
    return raw.groupBy("doc_id").agg(
        F.round(
            F.sum(F.when(F.col("tok").isin(_STOPS_LIST), 1).otherwise(0)).cast(
                "double"
            )
            / F.count("*"),
            6,
        ).alias("stop_ratio"),
        F.count("*").alias("n_tokens"),
    )


SQL_STOPWORD_RATIO = f"""
WITH base AS (
  SELECT doc_id,
         string_split_regex(regexp_replace(lower(text), '[^a-z0-9]', ' ', 'g'), '\\s+') AS arr
  FROM documents
), raw AS (SELECT doc_id, unnest(arr) AS tok FROM base)
SELECT doc_id,
       round(sum(CASE WHEN tok IN ({_STOPS_SQL}) THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 6) AS stop_ratio,
       count(*) AS n_tokens
FROM raw WHERE tok <> '' GROUP BY doc_id
"""


def q_quality_score(spark, sf_dir):
    raw = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(_raw_arr()).alias("tok"))
        .filter(F.col("tok") != "")
    )
    return raw.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.round(F.avg(F.length("tok")), 6).alias("mean_tok_len"),
        F.round(
            F.sum(F.when(F.col("tok").rlike("^[0-9]+$"), 1).otherwise(0)).cast(
                "double"
            )
            / F.count("*"),
            6,
        ).alias("digit_ratio"),
    )


SQL_QUALITY_SCORE = """
WITH base AS (
  SELECT doc_id,
         string_split_regex(regexp_replace(lower(text), '[^a-z0-9]', ' ', 'g'), '\\s+') AS arr
  FROM documents
), raw AS (SELECT doc_id, unnest(arr) AS tok FROM base)
SELECT doc_id, count(*) AS n_tokens,
       round(avg(length(tok)), 6) AS mean_tok_len,
       round(sum(CASE WHEN regexp_full_match(tok, '\\d+') THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 6) AS digit_ratio
FROM raw WHERE tok <> '' GROUP BY doc_id
"""


def q_token_counts(spark, sf_dir):
    toks = _toks_of(spark, sf_dir)
    raw = (
        _docs(spark, sf_dir)
        .select(F.explode(_raw_arr()).alias("tok"))
        .filter(F.col("tok") != "")
    )
    return raw.agg(F.count("*").alias("total_raw_tokens")).crossJoin(
        toks.agg(
            F.count("*").alias("admitted_tokens"),
            F.countDistinct("term").alias("distinct_terms"),
        )
    )


SQL_TOKEN_COUNTS = _SQL_TOKS + """
, raw AS (
  SELECT unnest(arr) AS tok FROM base
)
SELECT (SELECT count(*) FROM raw WHERE tok <> '') AS total_raw_tokens,
       (SELECT count(*) FROM toks) AS admitted_tokens,
       (SELECT count(DISTINCT term) FROM toks) AS distinct_terms
"""


# window/stride in whitespace tokens for the sliding chunker — typical
# training-data pre-tokenizer chunk shape (fixed context budget with
# overlap so no span is split across chunk boundaries unseen)
CHUNK_WINDOW = 64
CHUNK_STRIDE = 48


def q_chunk_sliding(spark, sf_dir):
    """Sliding-window text chunking for training-data pipelines: each doc
    becomes ceil(n/stride) overlapping chunks of <= CHUNK_WINDOW
    whitespace tokens (stride CHUNK_STRIDE, overlap 16). All native
    array expressions — sequence/transform/slice/array_join run inside
    whole-stage codegen on the raw token array, no shuffle at all until
    a downstream consumer groups; at 100 TB this is a pure map job. The
    reference has no chunker (its unit is the whole page); this is part
    of the LLM-pipeline extension family."""
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.filter(_raw_arr(), lambda x: x != "").alias("arr"),
    )
    sized = docs.withColumn("n", F.size("arr")).filter(F.col("n") > 0)
    chunks = sized.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, n - 1, {CHUNK_STRIDE}), s -> "
                f"struct(cast(s / {CHUNK_STRIDE} as int) as chunk_idx, "
                f"cast(least({CHUNK_WINDOW}, n - s) as int) as n_tokens, "
                f"array_join(slice(arr, s + 1, {CHUNK_WINDOW}), ' ') "
                f"as chunk_text))"
            )
        ).alias("c"),
    )
    return chunks.select("doc_id", "c.chunk_idx", "c.n_tokens", "c.chunk_text")


SQL_CHUNK_SLIDING = f"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split_regex(regexp_replace(lower(text),
                     '[^a-z0-9]', ' ', 'g'), '\\s+'), x -> x <> '') AS arr
  FROM documents
), sized AS (
  SELECT doc_id, arr, len(arr) AS n FROM base WHERE len(arr) > 0
), starts AS (
  SELECT doc_id, arr, n, unnest(range(0, n, {CHUNK_STRIDE})) AS s FROM sized
)
SELECT doc_id,
       (s / {CHUNK_STRIDE})::INT AS chunk_idx,
       least({CHUNK_WINDOW}, n - s)::INT AS n_tokens,
       array_to_string(arr[s + 1 : s + {CHUNK_WINDOW}], ' ') AS chunk_text
FROM starts
"""


# ------------------------------- sequence packing (concat-and-cut layout)
PACK_CAPACITY = 256  # tokens per packed training sequence
PACK_SHARDS = 8  # independent packing streams


def q_pack_sequences(spark, sf_dir):
    """Concat-and-cut sequence packing: assign every doc a position in a
    fixed-capacity packed-sequence layout (the concat-everything,
    cut-at-capacity scheme LLM training pipelines use). Docs are
    deterministically sharded by md5(doc_id) into PACK_SHARDS
    independent packing streams; within a shard, corpus order (doc_id)
    fixes a running token offset, and seq_idx/seq_offset locate the doc
    inside the packed sequences. Scale shape: the only non-map work is
    one window per shard — shards are hash-balanced, so at 10^12 turns
    each stream's cumsum is an independent partition-local scan (raise
    PACK_SHARDS with the corpus; the layout stays deterministic for any
    shard count). `straddles` marks docs cut by a capacity boundary.
    The reference has no packer (it serves pages, it doesn't train);
    LLM-pipeline extension family."""
    sized = (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            F.size(F.filter(_raw_arr(), lambda x: x != "")).alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
        .withColumn(
            "shard",
            (
                F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
                .cast("long") % PACK_SHARDS
            ).cast("int"),
        )
    )
    w = Window.partitionBy("shard").orderBy("doc_id")
    cum = sized.withColumn("cum", F.sum("n_tokens").over(w))
    start = F.col("cum") - F.col("n_tokens")
    seq_idx = F.floor(start / PACK_CAPACITY).cast("int")
    return cum.select(
        "doc_id",
        "shard",
        "n_tokens",
        seq_idx.alias("seq_idx"),
        (start % PACK_CAPACITY).cast("int").alias("seq_offset"),
        (F.floor((F.col("cum") - 1) / PACK_CAPACITY).cast("int") != seq_idx).alias(
            "straddles"
        ),
    )


SQL_PACK_SEQUENCES = f"""
WITH base AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(regexp_replace(lower(text),
             '[^a-z0-9]', ' ', 'g'), '\\s+'), x -> x <> ''))::INT AS n_tokens,
         (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT
          % {PACK_SHARDS})::INT AS shard
  FROM documents
), sized AS (
  SELECT * FROM base WHERE n_tokens > 0
), cum AS (
  SELECT doc_id, shard, n_tokens,
         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
  FROM sized
)
SELECT doc_id, shard, n_tokens,
       ((cum - n_tokens) // {PACK_CAPACITY})::INT AS seq_idx,
       ((cum - n_tokens) % {PACK_CAPACITY})::INT AS seq_offset,
       ((cum - 1) // {PACK_CAPACITY}) <> ((cum - n_tokens) // {PACK_CAPACITY})
         AS straddles
FROM cum
"""


def q_doc_fingerprint(spark, sf_dir):
    return (
        _toks_of(spark, sf_dir)
        .groupBy("doc_id")
        .agg(
            F.md5(F.concat_ws(" ", F.array_sort(F.collect_set("term")))).alias(
                "fingerprint"
            )
        )
    )


SQL_DOC_FINGERPRINT = _SQL_TOKS + """
SELECT doc_id,
       md5(array_to_string(list_sort(list(DISTINCT term)), ' ')) AS fingerprint
FROM toks GROUP BY doc_id
"""


# ------------------------------------- repetition signals (quality filter)
def _runlen_agg(arr_expr: str, finish: str) -> str:
    """Run-length scan over a SORTED string array as one JVM `aggregate`
    expression: the accumulator carries (prev gram, current run length,
    max run, duplicated-token sum) and `finish` picks the wanted stat.
    Equal grams are adjacent after array_sort, so a single linear pass
    yields the same counts a groupBy(gram) would — without the shuffle."""
    return (
        f"aggregate({arr_expr}, "
        "named_struct('prev', cast(null as string), 'run', 0, "
        "'best', 0, 'dup', 0), "
        "(acc, x) -> if(x = acc.prev, "
        "named_struct('prev', x, 'run', acc.run + 1, "
        "'best', greatest(acc.best, acc.run + 1), "
        "'dup', acc.dup + if(acc.run = 1, 2, 1)), "
        "named_struct('prev', x, 'run', 1, "
        "'best', greatest(acc.best, 1), 'dup', acc.dup)), "
        f"acc -> {finish})"
    )


def q_repetition_signals(spark, sf_dir):
    """Word n-gram repetition signals (Gopher/C4-style quality filters
    for LLM training data): per document, the most frequent bigram's
    occurrence count and mass fraction, and the fraction of trigram
    tokens that belong to a repeated trigram. Deliberately map-only:
    bigram/trigram arrays are built with zip_with over the word array,
    array_sort makes equal grams adjacent, and a single `aggregate`
    run-length scan extracts max-occurrence / duplicated-mass — zero
    shuffle, pure per-row JVM expression work, so at 100 TB this is an
    embarrassingly parallel map job (the explode+groupBy(doc_id, gram)
    alternative would shuffle a corpus-sized gram stream on doc_id).
    The reference has no repetition filter (its unit is the whole page);
    LLM-pipeline extension family."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", F.filter(_raw_arr(), lambda x: x != "").alias("w")
    )
    sized = docs.withColumn("n", F.size("w")).filter(F.col("n") >= 3)
    grams = sized.select(
        "doc_id",
        "n",
        F.expr(
            "array_sort(zip_with(slice(w, 1, n - 1), slice(w, 2, n - 1), "
            "(a, b) -> concat(a, ' ', b)))"
        ).alias("big"),
        F.expr(
            "array_sort(zip_with(zip_with(slice(w, 1, n - 2), "
            "slice(w, 2, n - 2), (a, b) -> concat(a, ' ', b)), "
            "slice(w, 3, n - 2), (g, c) -> concat(g, ' ', c)))"
        ).alias("tri"),
    )
    # each run-length scan is parsed ONCE and the Column reused: the two
    # consumers then hold the same expression tree (same lambda-variable
    # ids), so subexpression elimination can merge them — two separately
    # parsed copies are not semantically equal and were each evaluated
    big_best = F.expr(_runlen_agg("big", "acc.best"))
    tri_dup = F.expr(_runlen_agg("tri", "acc.dup"))
    return grams.select(
        "doc_id",
        F.col("n").cast("int").alias("n_words"),
        big_best.cast("int").alias("top_bigram_occ"),
        (big_best.cast("double") / (F.col("n") - 1)).alias("top_bigram_frac"),
        tri_dup.cast("int").alias("dup_trigram_toks"),
        (tri_dup.cast("double") / (F.col("n") - 2)).alias("dup_trigram_frac"),
    )


SQL_REPETITION_SIGNALS = r"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(regexp_replace(lower(text),
                     '[^a-z0-9]', ' ', 'g'), '\s+'), x -> x <> '') AS w
  FROM documents
), base AS (SELECT doc_id, w, len(w) AS n FROM w WHERE len(w) >= 3),
toks AS (
  SELECT doc_id, tok AS t, ord,
         lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY ord) AS t1,
         lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY ord) AS t2
  FROM (SELECT doc_id, unnest(w) AS tok,
               generate_subscripts(w, 1) AS ord FROM base)
),
bigc AS (SELECT doc_id, t || ' ' || t1 AS g, count(*) AS c
         FROM toks WHERE t1 IS NOT NULL GROUP BY doc_id, g),
bigagg AS (SELECT doc_id, max(c) AS top_occ, sum(c) AS nb
           FROM bigc GROUP BY doc_id),
tric AS (SELECT doc_id, t || ' ' || t1 || ' ' || t2 AS g, count(*) AS c
         FROM toks WHERE t2 IS NOT NULL GROUP BY doc_id, g),
triagg AS (SELECT doc_id,
                  sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup,
                  sum(c) AS nt
           FROM tric GROUP BY doc_id)
SELECT b.doc_id,
       base.n::INT AS n_words,
       b.top_occ::INT AS top_bigram_occ,
       (b.top_occ::DOUBLE / b.nb) AS top_bigram_frac,
       t.dup::INT AS dup_trigram_toks,
       (t.dup::DOUBLE / t.nt) AS dup_trigram_frac
FROM bigagg b JOIN triagg t USING (doc_id) JOIN base USING (doc_id)
"""


# --------------------------------------------------- PII scrub (LLM hygiene)
_PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PII_SSN = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"
_PII_PHONE = r"\b555-[0-9]{4}\b"


def q_pii_scrub(spark, sf_dir):
    """PII detection + redaction (emails, SSN-shaped ids, 555-phone
    numbers): per-doc match counts and the scrubbed text with typed
    placeholders. The synthetic corpus carries no PII, so deterministic
    PII is first injected from doc_id arithmetic (same expression on
    both engines) to make the check non-vacuous. Everything is native
    regexp_extract_all / regexp_replace — map-only, whole-stage codegen,
    no shuffle; at 100 TB a pure map job. Replacement order (email →
    SSN → phone) is fixed and mirrored in the oracle. LLM-pipeline
    extension family (reference has no scrubber)."""
    d = F.col("doc_id")
    inj = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                d % 3 == 0,
                F.concat(
                    F.lit(" contact user"),
                    d.cast("string"),
                    F.lit("@example.com now"),
                ),
            ).otherwise(""),
            F.when(
                d % 5 == 0,
                F.concat(
                    F.lit(" call 555-"),
                    F.lpad((d % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(""),
            F.when(
                d % 7 == 0,
                F.concat(
                    F.lit(" ssn 123-45-"),
                    F.lpad((d % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(""),
        ).alias("t"),
    ).filter((d % 3 == 0) | (d % 5 == 0) | (d % 7 == 0))
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), _PII_EMAIL, "<EMAIL>"),
            _PII_SSN,
            "<SSN>",
        ),
        _PII_PHONE,
        "<PHONE>",
    )
    return inj.select(
        "doc_id",
        F.size(F.regexp_extract_all("t", F.lit(_PII_EMAIL), F.lit(0)))
        .cast("int")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("t", F.lit(_PII_PHONE), F.lit(0)))
        .cast("int")
        .alias("n_phones"),
        F.size(F.regexp_extract_all("t", F.lit(_PII_SSN), F.lit(0)))
        .cast("int")
        .alias("n_ssns"),
        scrubbed.alias("scrubbed"),
    )


SQL_PII_SCRUB = r"""
WITH inj AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0 THEN ' contact user'
                 || doc_id::VARCHAR || '@example.com now' ELSE '' END
         || CASE WHEN doc_id % 5 = 0 THEN ' call 555-'
                 || lpad((doc_id % 10000)::VARCHAR, 4, '0') ELSE '' END
         || CASE WHEN doc_id % 7 = 0 THEN ' ssn 123-45-'
                 || lpad((doc_id % 10000)::VARCHAR, 4, '0') ELSE '' END
         AS t
  FROM documents
  WHERE doc_id % 3 = 0 OR doc_id % 5 = 0 OR doc_id % 7 = 0
)
SELECT doc_id,
       len(regexp_extract_all(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}'))::INT AS n_emails,
       len(regexp_extract_all(t, '\b555-[0-9]{4}\b'))::INT AS n_phones,
       len(regexp_extract_all(t, '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b'))::INT AS n_ssns,
       regexp_replace(
         regexp_replace(
           regexp_replace(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
           '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '<SSN>', 'g'),
         '\b555-[0-9]{4}\b', '<PHONE>', 'g') AS scrubbed
FROM inj
"""


# ------------------------------------------- deterministic sampling / splits
# Training pipelines never use rand() for held-out splits: membership must
# be a pure function of the document identity so re-runs, backfills and
# incremental ingests land every doc in the same split forever. Bucket =
# first 8 hex chars of md5(doc_id) mod _SAMPLE_BUCKETS — uniform, engine-
# portable (same expression runs in DuckDB for the oracle), and map-only:
# at 100 TB this is a pure narrow projection, no shuffle, no state.
_SAMPLE_BUCKETS = 10_000
# train/val/test boundaries in buckets (90% / 5% / 5%)
_SPLIT_TRAIN, _SPLIT_VAL = 9_000, 9_500


def _sample_bucket(col):
    """Deterministic bucket in [0, _SAMPLE_BUCKETS) from any key column."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
        .cast("long") % _SAMPLE_BUCKETS
    ).cast("int")


_SQL_BUCKET = (
    f"(('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT "
    f"% {_SAMPLE_BUCKETS})::INT"
)


def q_sample_split(spark, sf_dir):
    """Deterministic train/val/test assignment (90/5/5) keyed on doc_id.
    The reference has no split operator (it serves, it doesn't train);
    this is the LLM-pipeline extension family. Pure map — whole-stage
    codegen, zero shuffle, and stable under re-ingest: a doc's split
    never changes when the corpus around it grows."""
    bucketed = _docs(spark, sf_dir).select(
        "doc_id", _sample_bucket(F.col("doc_id")).alias("bucket")
    )
    return bucketed.select(
        "doc_id",
        "bucket",
        F.when(F.col("bucket") < _SPLIT_TRAIN, "train")
        .when(F.col("bucket") < _SPLIT_VAL, "val")
        .otherwise("test")
        .alias("split"),
    )


SQL_SAMPLE_SPLIT = f"""
WITH b AS (
  SELECT doc_id, {_SQL_BUCKET} AS bucket FROM documents
)
SELECT doc_id, bucket,
       CASE WHEN bucket < {_SPLIT_TRAIN} THEN 'train'
            WHEN bucket < {_SPLIT_VAL} THEN 'val'
            ELSE 'test' END AS split
FROM b
"""


# --------------------------------------- composed curation pipeline entry
# quality-gate constants shared with extras/curate.py (defined here so the
# oracle SQL below and the library defaults can never drift apart)
CURATE_MIN_TOKENS = 5
CURATE_MAX_DIGIT_PCT = 50


def q_curate_corpus(spark, sf_dir):
    """The composed end-to-end curation pipeline (extras/curate.py) over
    the documents table: the deterministic 1-in-20 md5(doc_id) slice
    plays the held-out benchmark (same rule as decontaminate_ngram);
    the remaining docs are exact-deduped, near-dup-cluster pruned,
    decontaminated against the benchmark, quality-gated and split.
    One row per training doc with every verdict + split — the frame
    jobs/curate.py materializes."""
    from apt_search_engine_spark.extras.curate import curate

    docs = _docs(spark, sf_dir)
    is_eval = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long") % 20 == 0
    )
    return curate(
        docs.filter(~is_eval),
        eval_docs=docs.filter(is_eval),
        min_tokens=CURATE_MIN_TOKENS,
        max_digit_pct=CURATE_MAX_DIGIT_PCT,
    )


SQL_CURATE_CORPUS = f"""
WITH RECURSIVE tagged AS (
  SELECT doc_id, text,
         (('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INT % 20 = 0) AS is_eval
  FROM documents
), base AS (
  SELECT doc_id, is_eval, md5(text) AS h,
         string_split_regex(regexp_replace(lower(text), '[^a-z0-9]', ' ', 'g'), '\\s+') AS arr
  FROM tagged
), ntok AS (
  SELECT doc_id, h, {_SQL_BUCKET} AS bucket,
         len(list_filter(arr, x -> x <> ''))::BIGINT AS n_tokens,
         len(list_filter(arr, x -> regexp_full_match(x, '[0-9]+')))::BIGINT AS n_digit
  FROM base WHERE NOT is_eval
), keepers AS (
  SELECT h, min(doc_id) AS keeper FROM ntok GROUP BY h
), sh AS (
  SELECT doc_id, is_eval,
         unnest(list_transform(range(1, len(arr) - 1),
                i -> arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2])) AS shingle
  FROM base WHERE len(arr) >= 3
), mh AS (
  SELECT doc_id, salt, min(md5(salt::VARCHAR || '|' || shingle)) AS minh
  FROM (SELECT doc_id, shingle FROM sh WHERE NOT is_eval)
       CROSS JOIN (SELECT unnest(range(0, {_N_HASHES})) AS salt)
  GROUP BY doc_id, salt
), sig AS (SELECT doc_id, list(minh ORDER BY salt) AS s FROM mh GROUP BY doc_id)
, bands AS (
  SELECT doc_id, b, s[2*b + 1] || s[2*b + 2] AS bv
  FROM sig, LATERAL (SELECT unnest(range(0, {_N_BANDS})) AS b)
), pairs AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x JOIN bands y ON x.b = y.b AND x.bv = y.bv AND x.doc_id < y.doc_id
), edges AS (
  SELECT doc_a AS x, doc_b AS y FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
), nodes AS (SELECT DISTINCT x AS node FROM edges)
, reach(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.y, r.label FROM reach r JOIN edges e ON e.x = r.node
), comp AS (SELECT node AS doc_id, min(label) AS component FROM reach GROUP BY node)
, nd AS (
  SELECT n.doc_id,
         (row_number() OVER (PARTITION BY c.component
                             ORDER BY n.n_tokens DESC, n.doc_id ASC) <> 1
         ) AS neardup_drop
  FROM ntok n JOIN comp c USING (doc_id)
), eval_sh AS (SELECT DISTINCT shingle FROM sh WHERE is_eval)
, contam AS (
  SELECT DISTINCT s.doc_id FROM sh s JOIN eval_sh e USING (shingle)
  WHERE NOT s.is_eval
), flags AS (
  SELECT n.doc_id, n.n_tokens,
         (n.doc_id <> k.keeper) AS exact_dup,
         coalesce(nd.neardup_drop, false) AS neardup_drop,
         (c.doc_id IS NOT NULL) AS contaminated,
         (n.n_tokens < {CURATE_MIN_TOKENS}
          OR n.n_digit * 100 > n.n_tokens * {CURATE_MAX_DIGIT_PCT}) AS low_quality,
         CASE WHEN n.bucket < {_SPLIT_TRAIN} THEN 'train'
              WHEN n.bucket < {_SPLIT_VAL} THEN 'val'
              ELSE 'test' END AS split
  FROM ntok n
  JOIN keepers k USING (h)
  LEFT JOIN nd USING (doc_id)
  LEFT JOIN contam c USING (doc_id)
)
SELECT doc_id, n_tokens, exact_dup, neardup_drop, contaminated, low_quality,
       NOT (exact_dup OR neardup_drop OR contaminated OR low_quality) AS kept,
       split
FROM flags
"""



# per-source keep rates for the stratified sampler, in buckets out of
# _SAMPLE_BUCKETS (data-mixing weights: upsample src0, downsample the
# long tail). A real pipeline reads these from a config table; the scale
# shape is the same either way — broadcast join against a rates dim.
_STRATA_RATES = {"src0": 5_000, "src1": 2_500}
_STRATA_DEFAULT = 1_000


def q_sample_stratified(spark, sf_dir):
    """Stratified deterministic sampling: each source (stratum) keeps a
    configured fraction of its docs, membership again a pure function of
    doc_id. The rates live in a tiny dim table broadcast against the
    corpus — the 100 TB shape (rates change per mixing experiment; the
    scan side never reshuffles). Keep iff bucket < rate_buckets."""
    rates = spark.createDataFrame(
        [(k, v) for k, v in sorted(_STRATA_RATES.items())],
        "source string, rate_buckets int",
    )
    docs = _docs(spark, sf_dir).select(
        "doc_id", "source", _sample_bucket(F.col("doc_id")).alias("bucket")
    )
    return (
        docs.join(F.broadcast(rates), "source", "left")
        .withColumn(
            "rate_buckets",
            F.coalesce("rate_buckets", F.lit(_STRATA_DEFAULT)),
        )
        .filter(F.col("bucket") < F.col("rate_buckets"))
        .select("doc_id", "source", "bucket")
    )


SQL_SAMPLE_STRATIFIED = f"""
WITH rates AS (
  SELECT * FROM (VALUES {', '.join(f"('{k}', {v})" for k, v in sorted(_STRATA_RATES.items()))})
         AS t(source, rate_buckets)
), b AS (
  SELECT doc_id, source, {_SQL_BUCKET} AS bucket FROM documents
)
SELECT b.doc_id, b.source, b.bucket
FROM b LEFT JOIN rates USING (source)
WHERE b.bucket < coalesce(rates.rate_buckets, {_STRATA_DEFAULT})
"""


# ------------------------------------- corpus-LM quality + source-mix stats
def q_unigram_logprob(spark, sf_dir):
    """Unigram-LM document scoring: mean per-token log-probability under
    the corpus's own unigram distribution — the cheap stand-in for the
    KenLM-style perplexity filters training pipelines run; gibberish and
    boilerplate-heavy docs score far below prose. No smoothing needed:
    the vocabulary is fit on the corpus it scores. Distinct from
    q_quality_score (surface heuristics); this is the distributional
    signal.

    Scale shape: per-doc term occs (map-side-combined groupBy), a
    zipf-bounded vocab aggregate over strictly fewer rows, then a hash
    join of occs with the vocab on term — never the raw exploded token
    stream. Head-term fan-in on that join is bounded by n_docs per term
    (the shape AQE skew-join splits); the single-row corpus total rides
    a broadcast crossJoin."""
    occ = (
        _toks_of(spark, sf_dir)
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("occ"))
    )
    vocab = occ.groupBy("term").agg(F.sum("occ").alias("cnt"))
    total = vocab.agg(F.sum("cnt").cast("double").alias("t"))
    return (
        occ.join(vocab, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("occ").alias("n_tokens"),
            F.round(
                F.sum(F.col("occ") * F.log(F.col("cnt") / F.col("t")))
                / F.sum("occ"),
                6,
            ).alias("mean_logprob"),
        )
    )


SQL_UNIGRAM_LOGPROB = _SQL_TOKS + """
, occ AS (
  SELECT doc_id, term, count(*) AS occ FROM toks GROUP BY doc_id, term
), vocab AS (
  SELECT term, sum(occ) AS cnt FROM occ GROUP BY term
), tot AS (SELECT sum(cnt)::DOUBLE AS t FROM vocab)
SELECT occ.doc_id, sum(occ.occ)::BIGINT AS n_tokens,
       round(sum(occ.occ * ln(vocab.cnt / tot.t)) / sum(occ.occ), 6) AS mean_logprob
FROM occ JOIN vocab USING (term) CROSS JOIN tot
GROUP BY occ.doc_id
"""


_MIX_ALPHA = 0.7  # sampling temperature (multilingual-LM mixing convention)


def q_domain_stats(spark, sf_dir):
    """Per-source corpus-mix statistics + temperature-sampling weight:
    share_s = n_docs_s / N, weight_s proportional to share_s^alpha
    renormalized (alpha = 0.7, the multilingual-sampling temperature
    convention) — the table a mixing scheduler reads to set per-source
    rates, the stats-producing complement of q_sample_stratified's
    rate-consuming side.

    Scale shape: ONE map-side-combined aggregate over the corpus; the
    result is dimension-sized (one row per source), so the empty-frame
    normalizing windows run on a handful of rows driver-adjacent —
    the single-partition window warning does not apply to a dim."""
    d = (
        _docs(spark, sf_dir)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 6).alias("mean_chars"),
        )
    )
    w = Window.partitionBy()
    s = d.select(
        "source",
        "n_docs",
        "mean_chars",
        (F.col("n_docs") / F.sum("n_docs").over(w)).alias("share"),
    )
    raw = F.pow(F.col("share"), F.lit(_MIX_ALPHA))
    return s.select(
        "source",
        "n_docs",
        "mean_chars",
        "share",
        F.round(raw / F.sum(raw).over(w), 6).alias("mix_weight"),
    )


SQL_DOMAIN_STATS = f"""
WITH d AS (
  SELECT source, count(*) AS n_docs, round(avg(n_chars), 6) AS mean_chars
  FROM documents GROUP BY source
), s AS (
  SELECT source, n_docs, mean_chars,
         n_docs / sum(n_docs) OVER () AS share
  FROM d
)
SELECT source, n_docs, mean_chars, share,
       round(pow(share, {_MIX_ALPHA}) / sum(pow(share, {_MIX_ALPHA})) OVER (), 6)
           AS mix_weight
FROM s
"""


# -------------- curation: duplicate spans / importance weights / LM filters
def _adj_pairs(spark, sf_dir) -> DataFrame:
    """Adjacent admitted-token pairs per doc — the shared upstream of the
    DSIR / bigram-LM / PMI operators (memoized like the token stream; the
    gate runs all three in one session). One window sort per doc, no
    self-join: the pair stream has exactly n_tokens - 1 rows per doc."""

    def build():
        toks = _toks_of(spark, sf_dir)
        w = Window.partitionBy("doc_id").orderBy("pos")
        return toks.select(
            "doc_id",
            F.col("term").alias("a"),
            F.lead("term").over(w).alias("b"),
        ).filter(F.col("b").isNotNull())

    return _memo(spark, sf_dir, "adj_pairs", build)


# SQL CTE mirror of _adj_pairs (extends _SQL_TOKS)
_SQL_ADJ = _SQL_TOKS + """
, pairs AS (
  SELECT doc_id, term AS a, lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS b
  FROM toks QUALIFY b IS NOT NULL
)
"""


_DUP_K = 5  # duplicated-span gram width (admitted-token 5-grams)


def q_dup_span_coverage(spark, sf_dir):
    """Exact-substring duplicate-span coverage — the Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better") signal
    at word granularity: per doc, how many admitted-token positions are
    covered by a 5-gram that occurs >= 2 times corpus-wide. Curation
    pipelines threshold `dup_frac` to drop boilerplate-heavy docs, or
    use the covered spans as a training-time loss mask. Complements
    minhash/simhash (whole-doc near-dup): this finds verbatim spans
    inside otherwise-distinct docs.

    Scale shape: one window sort per doc (the chunker's shape) to stamp
    ordinals and build grams; grams are md5-hashed so the duplicate
    groupBy shuffles 32-byte keys, never raw text; occurrences reach the
    coverage step via a semi-join against the duplicated-gram set (no
    self-join, no positions explosion). The interval union is closed
    form for equal-length sorted intervals — sum(min(K, start - prev))
    with one lag() window per doc — so coverage is O(occurrences), not
    O(occurrences x K)."""
    toks = _toks_of(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy("pos")
    grams = toks.select(
        "doc_id",
        F.row_number().over(w).alias("i"),
        F.md5(
            F.concat_ws(
                " ",
                F.col("term"),
                *[F.lead("term", j).over(w) for j in range(1, _DUP_K)],
            )
        ).alias("g"),
        F.lead("term", _DUP_K - 1).over(w).isNotNull().alias("full"),
    ).filter("full")
    dup = grams.groupBy("g").agg(F.count("*").alias("c")).filter("c >= 2")
    occ = grams.join(dup.select("g"), "g", "left_semi")
    w2 = Window.partitionBy("doc_id").orderBy("i")
    cov = (
        occ.select(
            "doc_id",
            F.coalesce(
                F.least(
                    F.lit(_DUP_K), F.col("i") - F.lag("i").over(w2)
                ),
                F.lit(_DUP_K),
            ).alias("add"),
        )
        .groupBy("doc_id")
        .agg(F.sum("add").alias("dup_tokens"))
    )
    n = toks.groupBy("doc_id").agg(F.count("*").alias("n_tokens"))
    return n.join(cov, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("dup_tokens", F.lit(0).cast("long")).alias("dup_tokens"),
        F.round(
            F.coalesce("dup_tokens", F.lit(0).cast("long"))
            / F.col("n_tokens"),
            6,
        ).alias("dup_frac"),
    )


SQL_DUP_SPAN_COVERAGE = _SQL_TOKS + f"""
, ordd AS (
  SELECT doc_id, row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS i, term
  FROM toks
), grams AS (
  SELECT doc_id, i,
         md5(term || ' ' || lead(term, 1) OVER w || ' ' || lead(term, 2) OVER w
             || ' ' || lead(term, 3) OVER w || ' ' || lead(term, 4) OVER w) AS g
  FROM ordd WINDOW w AS (PARTITION BY doc_id ORDER BY i)
  QUALIFY lead(term, {_DUP_K - 1}) OVER w IS NOT NULL
), dup AS (
  SELECT g FROM grams GROUP BY g HAVING count(*) >= 2
), occ AS (
  SELECT doc_id, i FROM grams WHERE g IN (SELECT g FROM dup)
), cov0 AS (
  SELECT doc_id,
         coalesce(least({_DUP_K}, i - lag(i) OVER (PARTITION BY doc_id ORDER BY i)),
                  {_DUP_K}) AS add
  FROM occ
), cov AS (
  SELECT doc_id, sum(add)::BIGINT AS dup_tokens FROM cov0 GROUP BY doc_id
), n AS (
  SELECT doc_id, count(*)::BIGINT AS n_tokens FROM toks GROUP BY doc_id
)
SELECT n.doc_id, n.n_tokens,
       coalesce(cov.dup_tokens, 0) AS dup_tokens,
       round(coalesce(cov.dup_tokens, 0) / n.n_tokens, 6) AS dup_frac
FROM n LEFT JOIN cov USING (doc_id)
"""


_DSIR_B = 4096  # hashed-feature buckets (constant — the stats table is tiny)
_DSIR_TARGET_LANG = "en"  # target distribution: the corpus's English slice


def q_dsir_weights(spark, sf_dir):
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): hashed-bigram features,
    per-doc mean log-likelihood ratio log(p_target / p_raw) with add-one
    smoothing over the bucket space. Target = the corpus's `lang = 'en'`
    slice (a real pipeline passes its high-quality reference corpus);
    raw = the whole pool. Docs whose feature mix resembles the target
    score high — the weight importance-resampling selects on.

    Scale shape: the feature space is a CONSTANT B = 4096 buckets, so
    both distribution tables are tiny and broadcast; the per-doc pass is
    one map-side-combined groupBy(doc_id, bucket) plus a broadcast join —
    nothing grows with vocabulary. The portable md5-prefix bucket hash
    (same trick as the minhash family) keeps Spark and the DuckDB oracle
    bit-identical."""
    pairs = _adj_pairs(spark, sf_dir)
    docs = _docs(spark, sf_dir).select(
        "doc_id", (F.col("lang") == _DSIR_TARGET_LANG).alias("is_t")
    )
    feats = pairs.join(docs, "doc_id").select(
        "doc_id",
        "is_t",
        (
            F.conv(
                F.substring(F.md5(F.concat_ws(" ", "a", "b")), 1, 6), 16, 10
            ).cast("long")
            % _DSIR_B
        ).cast("int").alias("bucket"),
    )
    occ = feats.groupBy("doc_id", "bucket").agg(F.count("*").alias("n"))
    bstats = feats.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("ct"),
        F.count("*").alias("cr"),
    )
    totals = bstats.agg(
        F.sum("ct").cast("double").alias("t_tot"),
        F.sum("cr").cast("double").alias("r_tot"),
    )
    return (
        occ.join(F.broadcast(bstats), "bucket")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_feats"),
            F.round(
                F.sum(
                    F.col("n")
                    * (
                        F.log(
                            (F.col("ct") + 1) / (F.col("t_tot") + _DSIR_B)
                        )
                        - F.log(
                            (F.col("cr") + 1) / (F.col("r_tot") + _DSIR_B)
                        )
                    )
                )
                / F.sum("n"),
                6,
            ).alias("dsir_logweight"),
        )
    )


SQL_DSIR_WEIGHTS = _SQL_ADJ + f"""
, feats AS (
  SELECT p.doc_id, d.lang = '{_DSIR_TARGET_LANG}' AS is_t,
         (('0x' || substr(md5(a || ' ' || b), 1, 6))::BIGINT % {_DSIR_B})::INT AS bucket
  FROM pairs p JOIN documents d USING (doc_id)
), occ AS (
  SELECT doc_id, bucket, count(*) AS n FROM feats GROUP BY doc_id, bucket
), bstats AS (
  SELECT bucket,
         sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
         count(*) AS cr
  FROM feats GROUP BY bucket
), totals AS (
  SELECT sum(ct)::DOUBLE AS t_tot, sum(cr)::DOUBLE AS r_tot FROM bstats
)
SELECT occ.doc_id, sum(occ.n)::BIGINT AS n_feats,
       round(sum(occ.n * (ln((bstats.ct + 1) / (totals.t_tot + {_DSIR_B}))
                          - ln((bstats.cr + 1) / (totals.r_tot + {_DSIR_B}))))
             / sum(occ.n), 6) AS dsir_logweight
FROM occ JOIN bstats USING (bucket) CROSS JOIN totals
GROUP BY occ.doc_id
"""


_LM_LAMBDA = 0.8  # bigram weight in the interpolated LM


def q_bigram_logprob(spark, sf_dir):
    """Interpolated bigram-LM document scoring — the distributional
    quality filter one step past q_unigram_logprob: mean per-token
    log(lambda * p(b|a) + (1 - lambda) * p(b)) over each doc's adjacent
    admitted-token pairs, with both distributions fit on the corpus
    itself (so every doc bigram exists in the model — no OOV smoothing
    needed beyond the unigram backoff). Wikipedia-style perplexity
    filtering without shipping a KenLM binary.

    Scale shape: bigram counts are one map-side-combined groupBy over
    the pair stream; context counts derive from the bigram table
    (strictly fewer rows); scoring is hash joins on term keys (the
    AQE-skew-splittable shape) plus a broadcast of the single-row
    total. Never joins or re-explodes the raw token stream."""
    pairs = _adj_pairs(spark, sf_dir)
    cb = pairs.groupBy("a", "b").agg(F.count("*").alias("cb"))
    ca = cb.groupBy("a").agg(F.sum("cb").alias("ca"))
    uni = _toks_of(spark, sf_dir).groupBy("term").agg(
        F.count("*").alias("cu")
    )
    tot = uni.agg(F.sum("cu").cast("double").alias("tu"))
    lam, one_minus = _LM_LAMBDA, 1 - _LM_LAMBDA
    scored = (
        pairs.join(cb, ["a", "b"])
        .join(ca, "a")
        .join(uni.withColumnRenamed("term", "b"), "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.log(
                F.lit(lam) * F.col("cb") / F.col("ca")
                + F.lit(one_minus) * F.col("cu") / F.col("tu")
            ).alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_scored"),
        F.round(F.sum("lp") / F.count("*"), 6).alias("mean_logprob"),
    )


# literals via repr() so the SQL doubles are bit-identical to Spark's
SQL_BIGRAM_LOGPROB = _SQL_ADJ + f"""
, cb AS (
  SELECT a, b, count(*) AS cb FROM pairs GROUP BY a, b
), ca AS (
  SELECT a, sum(cb) AS ca FROM cb GROUP BY a
), uni AS (
  SELECT term, count(*) AS cu FROM toks GROUP BY term
), tot AS (SELECT sum(cu)::DOUBLE AS tu FROM uni)
SELECT p.doc_id, count(*)::BIGINT AS n_scored,
       round(sum(ln({_LM_LAMBDA!r} * cb.cb / ca.ca + {1 - _LM_LAMBDA!r} * uni.cu / tot.tu))
             / count(*), 6) AS mean_logprob
FROM pairs p
JOIN cb ON p.a = cb.a AND p.b = cb.b
JOIN ca ON p.a = ca.a
JOIN uni ON p.b = uni.term
CROSS JOIN tot
GROUP BY p.doc_id
"""


_PMI_MIN_COUNT = 5  # collocation support floor (trims the long tail)
_PMI_TOPK = 50


def q_pmi_topk(spark, sf_dir):
    """Corpus collocation mining: top-50 adjacent admitted-token pairs by
    pointwise mutual information, support >= 5. The vocabulary-building /
    tokenizer-merge signal (and a compact corpus-drift fingerprint a
    pipeline can diff across snapshots). Deterministic cutoff: ranked by
    the 6-dp-rounded PMI with (a, b) as the tiebreak.

    Scale shape: the pair table is map-side-combined and support-trimmed
    BEFORE any join (the >= 5 filter drops the hapax tail, the bulk of
    vocab^2); unigram counts join on single term keys; the two one-row
    totals broadcast; the final top-k is TakeOrderedAndProject — no
    global sort materializes."""
    pairs = _adj_pairs(spark, sf_dir)
    cb = (
        pairs.groupBy("a", "b")
        .agg(F.count("*").alias("n_pair"))
        .filter(F.col("n_pair") >= _PMI_MIN_COUNT)
    )
    uni = _toks_of(spark, sf_dir).groupBy("term").agg(
        F.count("*").alias("cu")
    )
    tb = pairs.agg(F.count("*").cast("double").alias("tb"))
    tu = uni.agg(F.sum("cu").cast("double").alias("tu"))
    scored = (
        cb.join(uni.select(F.col("term").alias("a"), F.col("cu").alias("ca")), "a")
        .join(uni.select(F.col("term").alias("b"), F.col("cu").alias("cbu")), "b")
        .crossJoin(F.broadcast(tb))
        .crossJoin(F.broadcast(tu))
        .select(
            "a",
            "b",
            "n_pair",
            F.round(
                F.log(
                    (F.col("n_pair") / F.col("tb"))
                    / ((F.col("ca") / F.col("tu")) * (F.col("cbu") / F.col("tu")))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), "a", "b").limit(_PMI_TOPK)


SQL_PMI_TOPK = _SQL_ADJ + f"""
, cb AS (
  SELECT a, b, count(*) AS n_pair FROM pairs GROUP BY a, b
  HAVING count(*) >= {_PMI_MIN_COUNT}
), uni AS (
  SELECT term, count(*) AS cu FROM toks GROUP BY term
), tb AS (SELECT count(*)::DOUBLE AS tb FROM pairs),
tu AS (SELECT sum(cu)::DOUBLE AS tu FROM uni)
SELECT cb.a, cb.b, cb.n_pair,
       round(ln((cb.n_pair / tb.tb) / ((ua.cu / tu.tu) * (ub.cu / tu.tu))), 6) AS pmi
FROM cb
JOIN uni ua ON cb.a = ua.term
JOIN uni ub ON cb.b = ub.term
CROSS JOIN tb CROSS JOIN tu
ORDER BY pmi DESC, cb.a, cb.b
LIMIT {_PMI_TOPK}
"""


# ----------------------------------------------- generic join/agg/window ops
def q_top_customers(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
            F.count("*").alias("n_orders"),
        )
    )


SQL_TOP_CUSTOMERS = """
SELECT c_custkey, round(sum(o_totalprice), 2) AS total_spend,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey
"""


def q_events_window(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id", "user_id", F.row_number().over(w).alias("rn")
    )


SQL_EVENTS_WINDOW = """
SELECT event_id, user_id,
       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
FROM events
"""


# ------------------------------------------------- event-stream analytics
# Time math is exact integer epoch-microseconds on both engines
# (unix_micros vs epoch_us; session tz pinned UTC in session.py so the
# parquet TIMESTAMP_NTZ -> TIMESTAMP cast is the identity) — no float
# epochs, no tz-dependent rendering in the compared output.
_SESSION_GAP_US = 8 * 3600 * 1_000_000  # 8h of inactivity closes a session


def _events_us(spark, sf_dir) -> DataFrame:
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return e.withColumn(
        "ep_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )


def q_sessionize(spark, sf_dir):
    """Gap-based sessionization — the classic event-stream operator
    (user activity split into sessions wherever the inactivity gap
    exceeds a threshold), used for engagement metrics and as the
    grouping key for per-session transcript assembly.

    Scale shape: ONE window sort per user stamps the session boundary
    flags and their running sum (the session ordinal) in the same
    window frame — no self-join, no per-session explosion — then a
    map-side-combined groupBy((user, session)) aggregates. The only
    shuffle key is user_id; a skewed power user is still one
    partition's worth of rows, bounded by that user's event count."""
    e = _events_us(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ep_us", "event_id")
    prev = F.lag("ep_us").over(w)
    brk = F.when(
        prev.isNull() | (F.col("ep_us") - prev > _SESSION_GAP_US), 1
    ).otherwise(0)
    sess = e.select("user_id", "event_id", "value", "ep_us").withColumn(
        "session_seq",
        F.sum(brk).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("ep_us").alias("start_us"),
        F.max("ep_us").alias("end_us"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


SQL_SESSIONIZE = f"""
WITH ev AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS ep_us FROM events
), flagged AS (
  SELECT user_id, event_id, value, ep_us,
         CASE WHEN lag(ep_us) OVER w IS NULL
                OR ep_us - lag(ep_us) OVER w > {_SESSION_GAP_US}
              THEN 1 ELSE 0 END AS brk
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ep_us, event_id)
), sessed AS (
  SELECT user_id, event_id, value, ep_us,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ep_us, event_id
                        ROWS UNBOUNDED PRECEDING)::BIGINT AS session_seq
  FROM flagged
)
SELECT user_id, session_seq, count(*)::BIGINT AS n_events,
       min(ep_us) AS start_us, max(ep_us) AS end_us,
       round(sum(value), 6) AS sum_value
FROM sessed GROUP BY user_id, session_seq
"""


def q_asof_attribution(spark, sf_dir):
    """As-of join — for each purchase, the latest click by the same user
    at or before it (last-touch attribution). Spark has no ASOF JOIN;
    the engine composes it as union-tag + one running `last(...,
    ignorenulls)` window per user — a single sort, never an inequality
    join (which Spark would plan as a per-user cartesian). The oracle
    IS DuckDB's native ASOF JOIN, so the composition is checked against
    a first-class implementation of the semantics.

    Ties: clicks sort before purchases at equal ts (side 0 < 1), so
    "at or before" is inclusive, matching ASOF's >=; among clicks with
    identical (user, ts) the max event_id wins — the right side is
    pre-deduped to one row per (user, ts), which also makes the ASOF
    tie deterministic. No-match rows keep -1 sentinels (both engines)
    instead of NULL: nullable-int frames stringify differently across
    pandas dtypes, and the sentinel is lineage-friendly anyway."""
    e = _events_us(spark, sf_dir)
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ep_us")
        .agg(F.max("event_id").alias("click_event_id"))
    )
    purch = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ep_us"
    )
    tagged = clicks.select(
        "user_id",
        "ep_us",
        F.lit(0).alias("side"),
        "click_event_id",
        F.lit(None).cast("long").alias("purchase_id"),
    ).unionByName(
        purch.select(
            "user_id",
            "ep_us",
            F.lit(1).alias("side"),
            F.lit(None).cast("long").alias("click_event_id"),
            "purchase_id",
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ep_us", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        tagged.withColumn(
            "last_click", F.last("click_event_id", ignorenulls=True).over(w)
        )
        .withColumn(
            "last_click_us",
            F.last(
                F.when(F.col("side") == 0, F.col("ep_us")), ignorenulls=True
            ).over(w),
        )
        .filter(F.col("side") == 1)
    )
    return out.select(
        F.col("purchase_id").alias("event_id"),
        "user_id",
        F.col("ep_us").alias("purchase_us"),
        F.coalesce("last_click", F.lit(-1)).alias("click_event_id"),
        F.coalesce("last_click_us", F.lit(-1)).alias("click_us"),
    )


SQL_ASOF_ATTRIBUTION = """
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ep_us FROM events
), clicks AS (
  SELECT user_id, ep_us, max(event_id) AS click_event_id
  FROM ev WHERE event_type = 'click' GROUP BY user_id, ep_us
), purch AS (
  SELECT user_id, event_id, ep_us FROM ev WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ep_us AS purchase_us,
       coalesce(c.click_event_id, -1) AS click_event_id,
       coalesce(c.ep_us, -1) AS click_us
FROM purch p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ep_us >= c.ep_us
"""


def q_funnel_counts(spark, sf_dir):
    """Ordered funnel: users who viewed, then clicked strictly after
    their first view, then purchased strictly after that first
    qualifying click. Step timestamps are first-occurrence (min), so
    each stage is one map-side-combined groupBy(user) plus an
    equi-join on user_id against the (strictly smaller) previous
    stage — never a per-user sequence materialization."""
    e = _events_us(spark, sf_dir)
    a = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ep_us").alias("ta"))
    )
    b = (
        e.filter(F.col("event_type") == "click")
        .join(a, "user_id")
        .filter(F.col("ep_us") > F.col("ta"))
        .groupBy("user_id")
        .agg(F.min("ep_us").alias("tb"))
    )
    c = (
        e.filter(F.col("event_type") == "purchase")
        .join(b, "user_id")
        .filter(F.col("ep_us") > F.col("tb"))
        .groupBy("user_id")
        .agg(F.min("ep_us").alias("tc"))
    )

    def step(df, n, name):
        return df.agg(F.count("*").alias("n_users")).select(
            F.lit(n).alias("step"),
            F.lit(name).alias("step_name"),
            "n_users",
        )

    return (
        step(a, 1, "view")
        .unionByName(step(b, 2, "click"))
        .unionByName(step(c, 3, "purchase"))
    )


SQL_FUNNEL_COUNTS = """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS ep_us FROM events
), a AS (
  SELECT user_id, min(ep_us) AS ta FROM ev WHERE event_type = 'view'
  GROUP BY user_id
), b AS (
  SELECT e.user_id, min(e.ep_us) AS tb
  FROM ev e JOIN a USING (user_id)
  WHERE e.event_type = 'click' AND e.ep_us > a.ta
  GROUP BY e.user_id
), c AS (
  SELECT e.user_id, min(e.ep_us) AS tc
  FROM ev e JOIN b USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ep_us > b.tb
  GROUP BY e.user_id
)
SELECT 1 AS step, 'view' AS step_name, count(*)::BIGINT AS n_users FROM a
UNION ALL
SELECT 2, 'click', count(*)::BIGINT FROM b
UNION ALL
SELECT 3, 'purchase', count(*)::BIGINT FROM c
"""


# ------------------------------------------- cross-corpus (increment) dedup
def q_cross_dedup(spark, sf_dir):
    """Dedup a NEW corpus increment against an existing REFERENCE corpus
    — the shape every refreshed crawl runs: keep a new doc only if it is
    neither byte-identical to nor a near-duplicate of anything already
    held. Slices here are a deterministic 1-in-5 md5 split of documents
    (a real pipeline passes its snapshot tables).

    Scale shape: exact = one semi-join on md5(text) (32-byte keys);
    near = band rows of the new slice semi-joined against the DISTINCT
    band buckets of the reference slice — candidate generation only
    touches colliding buckets, and the reference side reduces to its
    bucket set (vocabulary-sized, not corpus-sized after distinct).
    Neither flag path compares documents pairwise.

    On the driver corpus the near_dup branch fires (9 docs at sf0.01);
    exact_dup is corpus-inherently all-False (the synthetic tables hold
    zero byte-identical texts anywhere, verified) — that path's semi-join
    is independently value-exercised by dedup_exact."""
    docs = _docs(spark, sf_dir)
    is_new = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long") % 5 == 0
    )
    tagged = docs.withColumn("is_new", is_new)
    new = tagged.filter("is_new")
    ref = tagged.filter(~F.col("is_new"))
    exact = (
        new.select("doc_id", F.md5("text").alias("h"))
        .join(
            ref.select(F.md5("text").alias("h")).distinct(), "h", "left_semi"
        )
        .select("doc_id")
        .withColumn("ex", F.lit(True))
    )
    # memoized: both semi-join sides of `near` reference this subtree, and
    # unpersisted Spark would recompute the corpus-wide shingle explosion
    # + 8 md5 min-aggregates once per side
    bands = _memo(
        spark, sf_dir, "minhash_bands", lambda: _minhash_bands(docs)
    )
    near = (
        bands.join(new.select("doc_id"), "doc_id", "left_semi")
        .join(
            bands.join(ref.select("doc_id"), "doc_id", "left_semi")
            .select("b", "bv")
            .distinct(),
            ["b", "bv"],
            "left_semi",
        )
        .select("doc_id")
        .distinct()
        .withColumn("nd", F.lit(True))
    )
    return (
        new.select("doc_id")
        .join(exact, "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("ex", F.lit(False)).alias("exact_dup"),
            F.coalesce("nd", F.lit(False)).alias("near_dup"),
            (
                ~F.coalesce("ex", F.lit(False))
                & ~F.coalesce("nd", F.lit(False))
            ).alias("keep"),
        )
    )


SQL_CROSS_DEDUP = _SQL_BANDS + """
, tagged AS (
  SELECT doc_id, text,
         (('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INT % 5 = 0) AS is_new
  FROM documents
), exact AS (
  SELECT DISTINCT t.doc_id, TRUE AS ex
  FROM tagged t
  JOIN (SELECT DISTINCT md5(text) AS h FROM tagged WHERE NOT is_new) r
    ON md5(t.text) = r.h
  WHERE t.is_new
), near AS (
  SELECT DISTINCT x.doc_id, TRUE AS nd
  FROM bands x
  JOIN tagged tx ON x.doc_id = tx.doc_id AND tx.is_new
  JOIN bands y ON x.b = y.b AND x.bv = y.bv
  JOIN tagged ty ON y.doc_id = ty.doc_id AND NOT ty.is_new
)
SELECT n.doc_id,
       coalesce(e.ex, FALSE) AS exact_dup,
       coalesce(nr.nd, FALSE) AS near_dup,
       (NOT coalesce(e.ex, FALSE) AND NOT coalesce(nr.nd, FALSE)) AS keep
FROM (SELECT doc_id FROM tagged WHERE is_new) n
LEFT JOIN exact e USING (doc_id)
LEFT JOIN near nr USING (doc_id)
"""


# --------------------------------------------- TF-IDF cosine retrieval
_TFIDF_K = 10


def q_tfidf_cosine_topk(spark, sf_dir):
    """Query-by-example: top-10 documents by TF-IDF cosine similarity to
    the corpus's min-doc_id document — the sparse-vector retrieval
    baseline next to the dense-embedding ANN family. idf = ln(N/df)
    over docs with admitted tokens.

    Scale shape: weights are one groupBy(doc, term); the query vector
    is ONE document's terms (broadcast side of the term join), so the
    dot product only touches postings of query terms — exactly the
    inverted-index access pattern, expressed relationally. Norms are a
    second map-side-combined groupBy; the two one-row totals broadcast;
    top-k is TakeOrderedAndProject."""
    toks = _toks_of(spark, sf_dir)
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    nd = tf.select("doc_id").distinct().agg(
        F.count("*").cast("double").alias("n_docs")
    )
    w = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "term",
            (F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).alias("w"),
        )
    )
    qid = tf.agg(F.min("doc_id").alias("qid"))
    qw = (
        w.join(F.broadcast(qid), w.doc_id == F.col("qid"))
        .select("term", F.col("w").alias("qw"))
    )
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    qnorm = qw.agg(F.sqrt(F.sum(F.col("qw") * F.col("qw"))).alias("qnrm"))
    return (
        w.join(F.broadcast(qw), "term")
        .groupBy("doc_id")
        .agg(F.sum(F.col("w") * F.col("qw")).alias("dot"))
        .join(norms, "doc_id")
        .crossJoin(F.broadcast(qnorm))
        .crossJoin(F.broadcast(qid))
        .filter(F.col("doc_id") != F.col("qid"))
        .select(
            "doc_id",
            F.round(F.col("dot") / (F.col("nrm") * F.col("qnrm")), 6).alias(
                "cos"
            ),
        )
        .orderBy(F.desc("cos"), "doc_id")
        .limit(_TFIDF_K)
    )


SQL_TFIDF_COSINE_TOPK = _SQL_TOKS + f"""
, tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
), dfreq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), nd AS (SELECT count(DISTINCT doc_id)::DOUBLE AS n_docs FROM tf),
w AS (
  SELECT tf.doc_id, tf.term, tf.tf * ln(nd.n_docs / dfreq.df) AS w
  FROM tf JOIN dfreq USING (term) CROSS JOIN nd
), qid AS (SELECT min(doc_id) AS qid FROM tf),
qw AS (
  SELECT term, w AS qw FROM w CROSS JOIN qid WHERE w.doc_id = qid.qid
), norms AS (
  SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc_id
), qnorm AS (SELECT sqrt(sum(qw * qw)) AS qnrm FROM qw)
SELECT w.doc_id, round(sum(w.w * qw.qw) / (any_value(norms.nrm) * any_value(qnorm.qnrm)), 6) AS cos
FROM w JOIN qw USING (term)
JOIN norms ON w.doc_id = norms.doc_id
CROSS JOIN qnorm CROSS JOIN qid
WHERE w.doc_id != qid.qid
GROUP BY w.doc_id
ORDER BY cos DESC, w.doc_id
LIMIT {_TFIDF_K}
"""


# -------------------------------------------------------------- language ID
# Marker-word n-gram heuristic (training-pipeline op): score each language
# by occurrences of its top function words in the raw token stream (NO
# stopword filter — the markers ARE stopwords), pick (hits DESC, lang ASC),
# 'und' when nothing matched. On the synthetic corpus text is language-
# independent, so this validates Spark==DuckDB agreement on the
# deterministic classifier, not ground-truth recovery.
_LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "in", "is", "that"),
    "de": ("der", "die", "und", "ist", "nicht", "das", "ein"),
    "es": ("el", "los", "que", "una", "por", "con", "para"),
    "fr": ("le", "la", "et", "les", "des", "un", "une"),
}


def q_lang_id(spark, sf_dir):
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    markers = spark.createDataFrame(
        [(l, w) for l, ws in _LANG_MARKERS.items() for w in ws],
        "mlang string, term string",
    )
    raw = docs.select(
        "doc_id", F.explode(_raw_arr()).alias("term")
    ).filter(F.length("term") > 0)
    hits = raw.join(F.broadcast(markers), "term").groupBy(
        "doc_id", "mlang"
    ).agg(F.count("*").alias("hits"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("hits"), F.asc("mlang"))
    best = (
        hits.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "mlang", "hits")
    )
    return (
        docs.select("doc_id")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("mlang", F.lit("und")).alias("lang_pred"),
            F.coalesce("hits", F.lit(0)).cast("long").alias("marker_hits"),
        )
    )


_MARKER_VALUES = ", ".join(
    f"('{l}', '{w}')" for l, ws in _LANG_MARKERS.items() for w in ws
)

SQL_LANG_ID = f"""
WITH markers(mlang, term) AS (VALUES {_MARKER_VALUES})
, base AS (
  SELECT doc_id,
         string_split_regex(regexp_replace(lower(text), '[^a-z0-9]', ' ', 'g'), '\\s+') AS arr
  FROM documents
), raw AS (
  SELECT doc_id, unnest(arr) AS term FROM base
), hits AS (
  SELECT r.doc_id, m.mlang, count(*) AS hits
  FROM raw r JOIN markers m USING (term)
  WHERE length(r.term) > 0
  GROUP BY r.doc_id, m.mlang
), best AS (
  SELECT doc_id, mlang, hits,
         row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, mlang ASC) AS rn
  FROM hits
)
SELECT d.doc_id,
       coalesce(b.mlang, 'und') AS lang_pred,
       coalesce(b.hits, 0)::BIGINT AS marker_hits
FROM (SELECT doc_id FROM documents) d
LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)
"""


# ------------------------------------------------------- P7 boolean algebra
# Reference: left-fold set algebra over segment doc-sets — AND=retainAll,
# OR=addAll, NOT=removeAll (S/processor/QueryProcessor.java:245-255).
# candidate_and covers AND; these cover OR (union-distinct) and NOT
# (anti-join), each on single-term segments like the reference's bare words.
def q_boolean_or(spark, sf_dir):
    toks = _toks_of(spark, sf_dir)
    a = toks.filter(F.col("term") == PHRASE[0]).select("doc_id")
    b = toks.filter(F.col("term") == QUERY_TERMS[1]).select("doc_id")
    return a.union(b).distinct()


SQL_BOOLEAN_OR = _SQL_TOKS + f"""
SELECT doc_id FROM toks WHERE term = '{PHRASE[0]}'
UNION
SELECT doc_id FROM toks WHERE term = '{QUERY_TERMS[1]}'
"""


def q_boolean_not(spark, sf_dir):
    toks = _toks_of(spark, sf_dir)
    a = toks.filter(F.col("term") == PHRASE[0]).select("doc_id").distinct()
    b = toks.filter(F.col("term") == PHRASE[1]).select("doc_id")
    return a.join(b, "doc_id", "left_anti")


SQL_BOOLEAN_NOT = _SQL_TOKS + f"""
SELECT DISTINCT doc_id FROM toks WHERE term = '{PHRASE[0]}'
EXCEPT
SELECT doc_id FROM toks WHERE term = '{PHRASE[1]}'
"""


# ----------------------------------------------------- ANN brute-force top-k
# Similarity-search baseline (instructions: brute-force cosine top-k over
# the embedding column); tie-broken on (rounded cos DESC, vec_id ASC) so the
# k-row set is deterministic across engines.
def q_ann_topk(spark, sf_dir):
    from apt_search_engine_spark.extras.ann import cosine_expr

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    return (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", F.round(F.expr(cosine_expr("v", "qv")), 6).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(10)
    )


SQL_ANN_TOPK = """
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings)
, q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
SELECT e.vec_id,
       round(list_sum(list_transform(range(1, len(v) + 1), i -> v[i] * qv[i]))
             / (sqrt(list_sum(list_transform(v, x -> x * x)))
                * sqrt(list_sum(list_transform(qv, x -> x * x)))), 6) AS cos
FROM e CROSS JOIN q WHERE e.vec_id <> 0
ORDER BY cos DESC, e.vec_id ASC LIMIT 10
"""


# ------------------------------------------------------ ANN batched queries
# The at-scale shape of similarity search: a (small) query SET broadcast
# against the corpus, per-query top-k via window rank — one shuffle by
# query id, no per-query job. Queries = vec_ids 0..4.
def q_ann_batch_topk(spark, sf_dir):
    from apt_search_engine_spark.extras.ann import cosine_expr

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    qs = e.filter(F.col("vec_id") <= 4).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    w = Window.partitionBy("q_id").orderBy(
        F.desc("cos"), F.asc("vec_id")
    )
    return (
        e.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.round(F.expr(cosine_expr("v", "qv")), 6).alias("cos"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("q_id", "vec_id", "cos", "rnk")
    )


SQL_ANN_BATCH_TOPK = """
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings)
, qs AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id <= 4)
, scored AS (
  SELECT qs.q_id, e.vec_id,
         round(list_sum(list_transform(range(1, len(v) + 1), i -> v[i] * qv[i]))
               / (sqrt(list_sum(list_transform(v, x -> x * x)))
                  * sqrt(list_sum(list_transform(qv, x -> x * x)))), 6) AS cos
  FROM e CROSS JOIN qs WHERE e.vec_id <> qs.q_id
), ranked AS (
  SELECT q_id, vec_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rnk
  FROM scored
)
SELECT q_id, vec_id, cos, rnk FROM ranked WHERE rnk <= 3
"""


# ------------------------------------------------------------ S3 URL normalize
# Reference URL normalizer (S/Crawler/URLNormalizer.java:11-151): lowercase
# scheme+host, strip www., drop default port, drop fragment, drop empty
# query params, sort query params, strip trailing slash. Exercised on
# deterministic URL-shaped strings synthesized from (source, doc_id) —
# the testdata has no URL column (transcripts use natural keys; SURVEY S3).
def q_url_normalize(spark, sf_dir):
    raw = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.lit("HTTPS://WWW.Example.COM:443/docs/"),
            F.col("source"),
            F.lit("/"),
            F.col("doc_id").cast("string"),
            F.lit("/?z=26&empty=&a=1#frag"),
        ).alias("url"),
    )
    scheme = "lower(split_part(url, '://', 1))"
    rest = "split_part(url, '://', 2)"
    hostport = f"split_part({rest}, '/', 1)"
    host = (
        f"regexp_replace(regexp_replace(lower({hostport}), ':443$', ''),"
        " '^www\\\\.', '')"
    )
    pathq = f"substring({rest}, length({hostport}) + 1)"
    path0 = f"split_part(split_part({pathq}, '?', 1), '#', 1)"
    path = f"regexp_replace({path0}, '/$', '')"
    qstr = f"split_part(split_part({pathq}, '?', 2), '#', 1)"
    params = (
        f"array_join(array_sort(filter(split({qstr}, '&'),"
        " p -> p != '' AND NOT p LIKE '%=')), '&')"
    )
    return raw.select(
        "doc_id",
        F.expr(
            f"concat({scheme}, '://', {host}, {path},"
            f" CASE WHEN {params} = '' THEN '' ELSE concat('?', {params}) END)"
        ).alias("norm_url"),
    )


SQL_URL_NORMALIZE = """
WITH raw AS (
  SELECT doc_id,
         'HTTPS://WWW.Example.COM:443/docs/' || source || '/' || doc_id
           || '/?z=26&empty=&a=1#frag' AS url
  FROM documents
), parts AS (
  SELECT doc_id,
         lower(split_part(url, '://', 1)) AS scheme,
         split_part(split_part(url, '://', 2), '/', 1) AS hostport,
         split_part(url, '://', 2) AS rest
  FROM raw
), comps AS (
  SELECT doc_id, scheme,
         regexp_replace(regexp_replace(lower(hostport), ':443$', ''), '^www\\.', '') AS host,
         substring(rest, length(hostport) + 1) AS pathq
  FROM parts
), pq AS (
  SELECT doc_id, scheme, host,
         regexp_replace(split_part(split_part(pathq, '?', 1), '#', 1), '/$', '') AS path,
         array_to_string(list_sort(list_filter(
           string_split(split_part(split_part(pathq, '?', 2), '#', 1), '&'),
           p -> p <> '' AND NOT p LIKE '%=')), '&') AS params
  FROM comps
)
SELECT doc_id,
       scheme || '://' || host || path ||
       CASE WHEN params = '' THEN '' ELSE '?' || params END AS norm_url
FROM pq
"""


# ----------------------------------------------------------------- R9 snippet
# Reference snippet choice (S/ranker/Snippeterr.java:14-59): among
# paragraphs of length <= 1000, pick max by (#distinct query segments
# present, then total case-insensitive substring frequency); first-seen
# wins ties. Paragraph analog for flat text = '. '-split sentences; only
# docs where some sentence matches are returned (reference only snippets
# result docs, which by construction contain query terms).
def q_snippet_pick(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    segs = list(QUERY_TERMS)
    paras = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), "\\. ")).alias("pidx", "p")
    ).filter((F.length("p") <= 1000) & (F.length("p") > 0))
    lp = "lower(p)"
    nseg = " + ".join(
        f"CASE WHEN {lp} LIKE '%{s}%' THEN 1 ELSE 0 END" for s in segs
    )
    freq = " + ".join(
        f"((length({lp}) - length(replace({lp}, '{s}', ''))) / {len(s)})"
        for s in segs
    )
    scored = paras.select(
        "doc_id",
        "pidx",
        "p",
        F.expr(nseg).alias("nseg"),
        F.expr(freq).cast("int").alias("freq"),
    ).filter(F.col("nseg") > 0)
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("nseg"), F.desc("freq"), F.asc("pidx")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "pidx", F.col("p").alias("snippet"), "nseg", "freq")
    )


_SNIP_NSEG = " + ".join(
    f"CASE WHEN lower(p) LIKE '%{s}%' THEN 1 ELSE 0 END" for s in QUERY_TERMS
)
_SNIP_FREQ = " + ".join(
    f"((length(lower(p)) - length(replace(lower(p), '{s}', ''))) / {len(s)})"
    for s in QUERY_TERMS
)

SQL_SNIPPET_PICK = f"""
WITH paras AS (
  SELECT doc_id, ord - 1 AS pidx, p
  FROM (SELECT doc_id, unnest(arr) AS p, generate_subscripts(arr, 1) AS ord
        FROM (SELECT doc_id, string_split_regex(text, '\\. ') AS arr FROM documents))
  WHERE length(p) <= 1000 AND length(p) > 0
), scored AS (
  SELECT doc_id, pidx, p,
         {_SNIP_NSEG} AS nseg,
         ({_SNIP_FREQ})::INT AS freq
  FROM paras
), ranked AS (
  SELECT doc_id, pidx, p AS snippet, nseg, freq,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY nseg DESC, freq DESC, pidx ASC) AS rn
  FROM scored WHERE nseg > 0
)
SELECT doc_id, pidx, snippet, nseg, freq FROM ranked WHERE rn = 1
"""


# -------------------------------------------------------- S11 graph invert
# Reference: out-link adjacency lists reread and inverted into the reverse
# graph for PageRank (S/Crawler/Main.java:116-142). Inversion = explode the
# out_links array, group by destination, collect sources. Adjacency is
# synthesized deterministically (each doc links to the next two doc_ids in
# its source) — testdata has no link column.
def q_link_graph_invert(spark, sf_dir):
    d = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("url"), "source"
    )
    w = Window.partitionBy("source").orderBy("url")
    adj = d.select(
        "url",
        F.array_compact(
            F.array(F.lead("url", 1).over(w), F.lead("url", 2).over(w))
        ).alias("out_links"),
    )
    return (
        adj.select(F.col("url").alias("src"), F.explode("out_links").alias("dst"))
        .groupBy("dst")
        .agg(
            F.array_join(F.array_sort(F.collect_list("src")), ",").alias("in_links"),
            F.count("*").alias("n_in"),
        )
    )


SQL_LINK_GRAPH_INVERT = """
WITH d AS (SELECT doc_id::VARCHAR AS url, source FROM documents),
adj AS (
  SELECT url,
         lead(url, 1) OVER (PARTITION BY source ORDER BY url) AS l1,
         lead(url, 2) OVER (PARTITION BY source ORDER BY url) AS l2
  FROM d
), edges AS (
  SELECT url AS src, l1 AS dst FROM adj WHERE l1 IS NOT NULL
  UNION ALL
  SELECT url AS src, l2 AS dst FROM adj WHERE l2 IS NOT NULL
)
SELECT dst, array_to_string(list_sort(list(src)), ',') AS in_links,
       count(*) AS n_in
FROM edges GROUP BY dst
"""


# ------------------------------------------- curation: per-source quota cap
_QUOTA_K = 10


def q_quota_sample(spark, sf_dir):
    """Per-source document quota — cap every source at K docs, chosen by
    a deterministic hash order (not arrival order, which is crawl-biased,
    and not random, which is irreproducible). The standard web-curation
    move for taming a corpus dominated by a handful of mega-domains
    before temperature mixing (see q_domain_stats).

    Scale shape: one window sort keyed by source. A mega-source is one
    partition's worth of rows but the sort is per-partition and the
    output is truncated at K; for sources with billions of docs, swap
    row_number for a per-source top-K aggregate (bounded heap) — same
    semantics, no full sort. Hash order means re-runs over a grown
    corpus keep previously-selected docs stable except at the K margin."""
    docs = _docs(spark, sf_dir)
    key = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source").orderBy(key, "doc_id")
    return docs.select(
        "doc_id", "source", F.row_number().over(w).alias("rk")
    ).filter(F.col("rk") <= _QUOTA_K)


SQL_QUOTA_SAMPLE = f"""
SELECT doc_id, source, rk FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk
  FROM documents)
WHERE rk <= {_QUOTA_K}
"""


# ---------------------------------- curation: CCNet-style perplexity buckets
def q_perplexity_buckets(spark, sf_dir):
    """CCNet-style quality bucketing: rank documents by their LM score
    (mean unigram log-probability, q_unigram_logprob) and split into
    head / middle / tail tertiles — the canonical cheap filter for
    "keep head, sample middle, drop tail" curation recipes.

    The tertile split here is exact (ntile over a total order) for
    oracle parity; at 100 TB the same recipe runs as two approxQuantile
    thresholds broadcast into a CASE — the buckets are a filter input,
    not an exact artifact, so approximate boundaries are the documented
    scale path. Ordering ties are broken by doc_id, so the split is
    deterministic on both engines."""
    lp = q_unigram_logprob(spark, sf_dir)
    w = Window.orderBy(F.desc("mean_logprob"), "doc_id")
    return lp.select(
        "doc_id",
        "mean_logprob",
        F.ntile(3).over(w).alias("tile"),
    ).withColumn(
        "bucket",
        F.when(F.col("tile") == 1, "head")
        .when(F.col("tile") == 2, "middle")
        .otherwise("tail"),
    )


SQL_PERPLEXITY_BUCKETS = _SQL_TOKS + """
, occ AS (
  SELECT doc_id, term, count(*) AS occ FROM toks GROUP BY doc_id, term
), vocab AS (
  SELECT term, sum(occ) AS cnt FROM occ GROUP BY term
), tot AS (SELECT sum(cnt)::DOUBLE AS t FROM vocab)
, lp AS (
  SELECT occ.doc_id,
         round(sum(occ.occ * ln(vocab.cnt / tot.t)) / sum(occ.occ), 6)
           AS mean_logprob
  FROM occ JOIN vocab USING (term) CROSS JOIN tot
  GROUP BY occ.doc_id
)
SELECT doc_id, mean_logprob, tile,
       CASE WHEN tile = 1 THEN 'head'
            WHEN tile = 2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM (SELECT doc_id, mean_logprob,
             ntile(3) OVER (ORDER BY mean_logprob DESC, doc_id) AS tile
      FROM lp)
"""


# ------------------------------------ fingerprinting: winnowing (MOSS-style)
_WINNOW_K = 3  # k-gram length in admitted tokens
_WINNOW_W = 4  # winnowing window: consecutive k-grams per selection


def q_winnow_fingerprint(spark, sf_dir):
    """Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, the
    MOSS algorithm): hash every k-token shingle, slide a window of w
    consecutive shingles, keep each window's minimal hash. Guarantees
    any shared run of k+w-1 tokens between two documents yields at
    least one shared selected fingerprint — the robust upgrade over
    q_doc_fingerprint's plain rolling hash, at ~1/w the stored hashes.

    Ties inside a window are broken by the leftmost position: hash and
    zero-padded position are concatenated into one string so a plain
    min() is the (hash, pos)-lexicographic argmin on both engines.

    Scale shape: per-doc window functions over the admitted-token
    stream — one shuffle keyed by doc_id, linear work, output bounded
    by n_grams/1 (dedup collapses runs of the same winner). No joins."""
    toks = _toks_of(spark, sf_dir)
    w_seq = Window.partitionBy("doc_id").orderBy("pos")
    g = (
        toks.withColumn("t1", F.lead("term", 1).over(w_seq))
        .withColumn("t2", F.lead("term", 2).over(w_seq))
        .filter(F.col("t2").isNotNull())
        .select(
            "doc_id",
            "pos",
            F.concat(
                F.md5(F.concat_ws(" ", "term", "t1", "t2")),
                F.lpad(F.col("pos").cast("string"), 10, "0"),
            ).alias("hp"),
        )
    )
    w_win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(0, _WINNOW_W - 1)
    )
    sel = g.select("doc_id", F.min("hp").over(w_win).alias("sel")).distinct()
    return sel.select(
        "doc_id",
        F.substring("sel", 1, 32).alias("fingerprint"),
        F.substring("sel", 33, 10).cast("int").alias("pos"),
    )


SQL_WINNOW_FINGERPRINT = _SQL_TOKS + f"""
, grams AS (
  SELECT doc_id, pos,
         term || ' ' || lead(term, 1) OVER w || ' ' || lead(term, 2) OVER w
           AS gram,
         lead(term, 2) OVER w AS t2
  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), hp AS (
  SELECT doc_id, pos,
         md5(gram) || lpad(pos::VARCHAR, 10, '0') AS hp
  FROM grams WHERE t2 IS NOT NULL
), sel AS (
  SELECT DISTINCT doc_id,
         min(hp) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN CURRENT ROW
                       AND {_WINNOW_W - 1} FOLLOWING) AS sel
  FROM hp
)
SELECT doc_id, substr(sel, 1, 32) AS fingerprint,
       substr(sel, 33, 10)::INT AS pos
FROM sel
"""


# ---------------------------- cardinality sketch: K-minimum-values (KMV)
_KMV_K = 64
_KMV_SCALE = float(1 << 60)  # 16^15: 15-hex-digit hash -> [0, 1) fraction


def q_kmv_distinct(spark, sf_dir):
    """Per-source distinct-term cardinality via the K-minimum-values
    sketch (Bar-Yossef et al. 2002): keep the K smallest hash values of
    the set; estimate |set| = (K-1) / u_K where u_K is the K-th smallest
    hash as a [0,1) fraction. Unlike HLL (whose register layout is
    implementation-defined, so Spark and DuckDB estimates can never
    hash-match), KMV is DETERMINISTIC given the hash — both engines
    compute the identical estimate bit-for-bit pre-rounding, so this
    sketch is fully oracle-paired. Sources with fewer than K distinct
    terms fall back to the exact count (standard KMV behavior; the
    sketch IS the set there). exact_distinct is emitted alongside so
    the estimate's error is visible in the result.

    Scale shape: the K smallest per group is a bounded-heap aggregate;
    here a per-source window row_number (K rows survive per source).
    KMV sketches merge by union+truncate — the same monoid shape the
    streaming session state uses — making this the distributed-friendly
    distinct counter when exact countDistinct's shuffle is too wide."""
    docs = _docs(spark, sf_dir)
    toks = (
        docs.select("source", F.explode(_raw_arr()).alias("term"))
        .filter(F.col("term") != "")
        .distinct()
    )
    h = toks.select("source", F.md5("term").alias("hh"))
    w = Window.partitionBy("source").orderBy("hh")
    kth = (
        h.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == _KMV_K)
        .select(
            "source",
            F.expr("cast(conv(substr(hh, 1, 15), 16, 10) as double)").alias(
                "uk"
            ),
        )
    )
    exact = toks.groupBy("source").agg(
        F.countDistinct("term").alias("exact_distinct")
    )
    est = F.when(
        F.col("uk").isNull(), F.col("exact_distinct").cast("double")
    ).otherwise(
        F.round(
            F.lit(float(_KMV_K - 1)) * F.lit(_KMV_SCALE) / F.col("uk"), 4
        )
    )
    return exact.join(kth, "source", "left").select(
        "source", "exact_distinct", est.alias("kmv_estimate")
    )


SQL_KMV_DISTINCT = f"""
WITH toks AS (
  SELECT DISTINCT source, tok AS term FROM (
    SELECT source,
           unnest(string_split_regex(
             regexp_replace(lower(text), '[^a-z0-9]', ' ', 'g'), '\\s+'))
             AS tok
    FROM documents) WHERE tok <> ''
), r AS (
  SELECT source, md5(term) AS hh,
         row_number() OVER (PARTITION BY source ORDER BY md5(term)) AS rk
  FROM toks
), kth AS (
  SELECT source, (('0x' || substr(hh, 1, 15))::UBIGINT)::DOUBLE AS uk
  FROM r WHERE rk = {_KMV_K}
), ex AS (
  SELECT source, count(DISTINCT term) AS exact_distinct
  FROM toks GROUP BY source
)
SELECT ex.source, ex.exact_distinct,
       CASE WHEN kth.uk IS NULL THEN ex.exact_distinct::DOUBLE
            ELSE round({float(_KMV_K - 1)} * {_KMV_SCALE} / kth.uk, 4)
       END AS kmv_estimate
FROM ex LEFT JOIN kth USING (source)
"""


# ------------------------------------- keyword extraction: per-doc TF-IDF
_KEYWORD_K = 3


def q_keyword_topk(spark, sf_dir):
    """Per-document top-K TF-IDF keywords — the tagging/faceting step
    pipelines run after tokenization (smooth ln(N/df) IDF, not the
    engine's floor-quirk variant, which lives in bag_topk_score).
    Ordering is on the ROUNDED weight with a term tiebreak so rank is
    deterministic and engine-independent.

    Scale shape: doc-term occs (map-side combined), df aggregate over
    strictly fewer rows, one hash join on term, then a per-doc window
    top-K — the window partitions by doc_id, so no global sort; at
    planet scale swap row_number for a bounded per-doc heap aggregate
    (same semantics) if doc vocabularies are ever unbounded."""
    occ = (
        _toks_of(spark, sf_dir)
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("occ"))
    )
    # N as a lazy broadcast single-row aggregate (the tfidf_cosine idiom),
    # not an eager .count(): constructing this frame must not run a job
    nd = _docs(spark, sf_dir).agg(
        F.count("*").cast("double").alias("n_docs")
    )
    df = occ.groupBy("term").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("weight"), F.asc("term")
    )
    return (
        occ.join(df, "term")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("occ") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("weight"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _KEYWORD_K)
    )


SQL_KEYWORD_TOPK = _SQL_TOKS + f"""
, occ AS (
  SELECT doc_id, term, count(*) AS occ FROM toks GROUP BY doc_id, term
), df AS (
  SELECT term, count(*) AS df FROM occ GROUP BY term
), nd AS (SELECT count(*)::DOUBLE AS n FROM documents)
SELECT doc_id, term, weight, rk FROM (
  SELECT occ.doc_id, occ.term,
         round(occ.occ * ln(nd.n / df.df), 6) AS weight,
         row_number() OVER (
           PARTITION BY occ.doc_id
           ORDER BY round(occ.occ * ln(nd.n / df.df), 6) DESC, occ.term
         ) AS rk
  FROM occ JOIN df USING (term) CROSS JOIN nd
) WHERE rk <= {_KEYWORD_K}
"""


def _winnow_fp_of(spark, sf_dir) -> DataFrame:
    """Fingerprint frame shared by the winnow_fingerprint entry and the
    candidate-pair join — memoized so the gate computes it once."""
    return _memo(
        spark, sf_dir, "winnow_fp", lambda: q_winnow_fingerprint(spark, sf_dir)
    )


# ----------------------------- dedup: winnowing-fingerprint candidate pairs
_WINNOW_BUCKET_CAP = 20  # drop stop-fingerprints shared by more docs
_WINNOW_MIN_SHARED = 2  # >= 2 shared selections = candidate pair


def q_winnow_candidate_pairs(spark, sf_dir):
    """Near-dup candidates by shared winnowing fingerprints — the
    plagiarism-detection shape (MOSS): two docs sharing >= 2 selected
    fingerprints share (with the winnowing guarantee) two k-token runs,
    a much stronger local-overlap signal than one bag-level minhash
    band. Complements the minhash/simhash family: winnowing catches
    copied PASSAGES inside otherwise different documents, which
    whole-doc sketches dilute away.

    Scale shape: like the LSH band joins — group by fingerprint,
    drop stop-fingerprint buckets past a cap (worst-case join fan-out
    cap^2 per bucket, documented like simhash's bucket_cap), self-join
    only within buckets, then a pair-level count filter. Never
    all-pairs."""
    fp = (
        _winnow_fp_of(spark, sf_dir)
        .select("doc_id", "fingerprint")
        .distinct()
    )
    sized = (
        fp.groupBy("fingerprint")
        .agg(F.count("*").alias("nd"))
        .filter(
            (F.col("nd") >= 2) & (F.col("nd") <= _WINNOW_BUCKET_CAP)
        )
        .select("fingerprint")
    )
    c = fp.join(sized, "fingerprint")
    a, b = c.alias("a"), c.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fingerprint") == F.col("b.fingerprint"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.countDistinct("a.fingerprint").alias("n_shared"))
        .filter(F.col("n_shared") >= _WINNOW_MIN_SHARED)
    )


SQL_WINNOW_CANDIDATE_PAIRS = (
    "WITH fp AS (SELECT DISTINCT doc_id, fingerprint FROM ("
    + SQL_WINNOW_FINGERPRINT
    + f"""))
, sized AS (
  SELECT fingerprint FROM fp GROUP BY 1
  HAVING count(*) BETWEEN 2 AND {_WINNOW_BUCKET_CAP}
), c AS (
  SELECT f.doc_id, f.fingerprint FROM fp f JOIN sized USING (fingerprint)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       count(DISTINCT a.fingerprint) AS n_shared
FROM c a JOIN c b
  ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(DISTINCT a.fingerprint) >= {_WINNOW_MIN_SHARED}
"""
)


# --------------------------------------- event analytics: ROLLUP aggregation
def q_rollup_counts(spark, sf_dir):
    """Multi-granularity event rollup: counts and value sums per
    (event_type, hour-of-day), per event_type, and grand total in one
    pass — GROUP BY ROLLUP, the OLAP primitive dashboards page. Hour is
    derived by integer epoch math (tz-independent on both engines);
    rollup NULL markers are coalesced to sentinels ('ALL', -1) because
    the subtotal rows are data, not missing values, and nullable-int
    frames stringify differently across pandas dtypes.

    Scale shape: Spark plans ROLLUP as Expand (3 grouping sets) + one
    hash aggregate with map-side partials — one shuffle whose key count
    is bounded by |types| x 24, independent of row count."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    hr = F.expr(
        "(unix_micros(cast(ts as timestamp)) div 3600000000) % 24"
    ).alias("hr")
    return (
        e.select("event_type", hr, "value")
        .rollup("event_type", "hr")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce("hr", F.lit(-1)).alias("hr"),
            "n",
            "sum_value",
        )
    )


SQL_ROLLUP_COUNTS = """
SELECT coalesce(event_type, 'ALL') AS event_type,
       coalesce(hr, -1) AS hr,
       count(*) AS n, round(sum(value), 4) AS sum_value
FROM (SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hr, value
      FROM events)
GROUP BY ROLLUP (event_type, hr)
"""


# ----------------------- curation: weighted importance-resampling draw
_WSAMPLE_K = 100


def q_weighted_sample(spark, sf_dir):
    """The draw that consumes q_dsir_weights: a weighted sample WITHOUT
    replacement via the Gumbel-top-K trick (equivalently
    Efraimidis-Spirakis 2006 in log form) — key = logweight + Gumbel
    noise, keep the global top K. The "noise" is a deterministic
    hash-uniform per doc (same md5-prefix construction as the sampling
    family), so the draw is seed-stable and cluster-reproducible while
    being a faithful weighted sample in distribution.

    Parity: every per-row op is scalar IEEE on identical inputs; the
    only engine divergence is libm ln (<= 1 ulp), contracted by the
    9 dp key rounding with doc_id tiebreak. Scale shape: orderBy+limit
    plans TakeOrderedAndProject — per-partition bounded heaps reduced
    on the driver, never a global sort."""
    # the weights frame is shared with the dsir_weights gate entry —
    # memoize it so the driver's one-session correctness run computes
    # the DSIR distributions once
    lw = _memo(
        spark, sf_dir, "dsir", lambda: q_dsir_weights(spark, sf_dir)
    ).select("doc_id", "dsir_logweight")
    h = F.expr(
        "cast(conv(substr(md5(concat('ws|', cast(doc_id as string))),"
        " 1, 15), 16, 10) as double)"
    )
    u = (h + F.lit(1.0)) / F.lit(float((1 << 60) + 2))  # strict (0,1)
    key = F.round(F.col("dsir_logweight") - F.log(-F.log(u)), 9)
    return (
        lw.select("doc_id", key.alias("sample_key"))
        .orderBy(F.desc("sample_key"), F.asc("doc_id"))
        .limit(_WSAMPLE_K)
    )


SQL_WEIGHTED_SAMPLE = (
    "WITH lw AS (SELECT doc_id, dsir_logweight FROM ("
    + SQL_DSIR_WEIGHTS
    + f"""))
SELECT doc_id,
       round(dsir_logweight - ln(-ln(
         ((('0x' || substr(md5('ws|' || doc_id::VARCHAR), 1, 15))::UBIGINT)::DOUBLE + 1.0)
         / {float((1 << 60) + 2)!r})), 9) AS sample_key
FROM lw
ORDER BY sample_key DESC, doc_id
LIMIT {_WSAMPLE_K}
"""
)


# ----------------------------------------- event analytics: PIVOT (wide)
_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_pivot_counts(spark, sf_dir):
    """PIVOT — long-to-wide per-user event-type counts, the feature-
    matrix shape ML pipelines hand to trainers. The pivot VALUES are
    pinned explicitly: with an explicit list Spark plans ONE pass
    (grouped conditional aggregates, no distinct-values pre-query) and
    the output schema is stable however the data drifts — both
    properties you want at 100 TB."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        e.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(_EVENT_TYPES))
    )


SQL_PIVOT_COUNTS = (
    "SELECT user_id, "
    + ", ".join(
        f"count(*) FILTER (event_type = '{t}') AS {t}"
        for t in _EVENT_TYPES
    )
    + " FROM events GROUP BY user_id"
)


# ------------------------------------- event analytics: cohort retention
def q_cohort_retention(spark, sf_dir):
    """Weekly cohort-retention matrix: users are cohorted by the week of
    their first event; each cell counts distinct users from cohort week
    C active in week C+offset. Weeks are integer epoch-week indices
    (epoch_us div week) — no calendar/tz dependence.

    Scale shape: distinct (user, week) first — collapsing the event
    stream to at most users x weeks rows before anything else — then a
    per-user min for the cohort and one bounded groupBy. The join of
    (user, week) against the per-user cohort is keyed by user_id; both
    sides are user-bounded, AQE handles the power-user skew."""
    wk_us = 7 * 24 * 3600 * 1_000_000
    e = _events_us(spark, sf_dir)
    uw = e.select(
        "user_id", F.expr(f"ep_us div {wk_us}").alias("wk")
    ).distinct()
    cohort = uw.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    return (
        uw.join(cohort, "user_id")
        .groupBy("cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


SQL_COHORT_RETENTION = """
WITH uw AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS wk FROM events
), coh AS (
  SELECT user_id, min(wk) AS cohort_wk FROM uw GROUP BY user_id
)
SELECT cohort_wk, wk - cohort_wk AS week_offset,
       count(DISTINCT user_id) AS n_users
FROM uw JOIN coh USING (user_id)
GROUP BY cohort_wk, week_offset
"""


# --------------------------------------------- OLAP: TPC-H-shaped aggregates
def q_tpch_pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped pricing summary over lineitem: the canonical
    scan-heavy aggregate (filter -> 6-group hash agg with compound
    float expressions). Exercises predicate pushdown to the parquet
    scan and map-side partial aggregation — at 100 TB this is one
    full-scan + a 6-row shuffle.

    Sums are rounded to 2 dp (magnitudes ~1e8; partial-agg ordering
    differences are ~1e-7), averages to 6 dp."""
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


SQL_TPCH_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
         AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_revenue_by_nation(spark, sf_dir):
    """TPC-H Q5-shaped star join: revenue per customer nation within one
    region and order-date year, over lineitem x orders x customer x
    nation x region. The dimension tables (nation, region) are
    broadcast; the date filter is applied to orders before the fact
    join so the pushed predicate prunes the big probe side. At 100 TB
    the only shuffles are the two fact-fact hash joins on their
    natural keys."""
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet").filter(
        F.col("r_name") == "ASIA"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


SQL_REVENUE_BY_NATION = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


# ----------------------------------- token budgeting: BPE-ish pre-tokenizer
# GPT-2-style pre-tokenizer split, simplified to the RE2/Java-regex
# common subset (no lookahead): optional leading space + letter run /
# digit run / punctuation run. This is the count that tracks an actual
# BPE tokenizer's budget far better than whitespace words (punctuation
# and digits tokenize separately).
_BPE_PAT = r" ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+"


def q_bpe_token_counts(spark, sf_dir):
    """Per-document token-budget estimates: whitespace words vs BPE-ish
    pre-tokens (the training-cost denominator). Pure JVM regex — one
    map-only pass, no explode, no shuffle beyond none at all; at 100 TB
    this pipelines with the scan."""
    docs = _docs(spark, sf_dir)
    ws = F.when(F.trim("text") == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
    )
    return docs.select(
        "doc_id",
        ws.alias("n_ws_tokens"),
        # F.lit, not an F.expr f-string: a SQL string literal would eat
        # the pattern's backslash (\s -> s) and silently count whitespace
        # runs as punctuation tokens
        F.regexp_count(F.lower(F.col("text")), F.lit(_BPE_PAT)).alias(
            "n_bpe_tokens"
        ),
    )


SQL_BPE_TOKEN_COUNTS = r"""
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(string_split_regex(trim(text), '\s+')) END
         AS n_ws_tokens,
       len(regexp_extract_all(lower(text), ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+'))
         AS n_bpe_tokens
FROM documents
"""


# ------------------------------------------------ range join (bucketed)
_RJ_BUCKET_US = 3_600_000_000  # 1h buckets
_RJ_DAY_US = 86_400_000_000


def range_join_by_bucket(
    left: DataFrame,
    ts_col: str,
    right: DataFrame,
    start_col: str,
    end_col: str,
    bucket_us: int = _RJ_BUCKET_US,
) -> DataFrame:
    """Point-in-interval range join as a composition Spark can plan as an
    EQUI join: both sides are keyed by a coarse time bucket (intervals
    exploded into every bucket they span via sequence()), joined on the
    bucket, then the exact BETWEEN residual filters. A raw
    `l.ts BETWEEN r.start AND r.end` join has no equi-key, so Spark
    plans BroadcastNestedLoopJoin — O(|L| x |R|) compared work; the
    bucketed form shuffles/broadcasts on the bucket key and compares
    only same-bucket pairs (asserted in tests/test_plan_shape.py).
    Choose bucket_us near the median interval width: cost is
    |L| + sum(interval_width/bucket) join rows.
    Keeps every column of both sides; inner semantics."""
    lb = left.withColumn("_b", F.expr(f"{ts_col} div {bucket_us}"))
    rb = right.withColumn(
        "_b",
        F.explode(
            F.expr(
                f"sequence({start_col} div {bucket_us},"
                f" {end_col} div {bucket_us})"
            )
        ),
    )
    return (
        lb.join(rb, "_b")
        .filter(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) <= F.col(end_col))
        )
        .drop("_b")
    )


def q_range_join_events(spark, sf_dir):
    """Range join demo over the event stream: a synthetic global
    promo-window table (one 10:00-14:00 UTC window per active day,
    derived deterministically from the data) is range-joined to events
    by timestamp containment. No user equi-key — exactly the shape that
    degenerates to a nested-loop join without the bucket trick."""
    e = _events_us(spark, sf_dir).select("event_id", "ep_us")
    days = e.select(
        F.expr(f"ep_us div {_RJ_DAY_US}").alias("promo_id")
    ).distinct()
    iv = days.select(
        "promo_id",
        (F.col("promo_id") * _RJ_DAY_US + 10 * _RJ_BUCKET_US).alias(
            "start_us"
        ),
        (F.col("promo_id") * _RJ_DAY_US + 14 * _RJ_BUCKET_US).alias("end_us"),
    )
    return range_join_by_bucket(e, "ep_us", iv, "start_us", "end_us").select(
        "event_id", "promo_id"
    )


SQL_RANGE_JOIN_EVENTS = f"""
WITH ev AS (
  SELECT event_id, epoch_us(ts) AS ep_us FROM events
), days AS (
  SELECT DISTINCT ep_us // {_RJ_DAY_US} AS promo_id FROM ev
), iv AS (
  SELECT promo_id,
         promo_id * {_RJ_DAY_US} + 10 * {_RJ_BUCKET_US} AS start_us,
         promo_id * {_RJ_DAY_US} + 14 * {_RJ_BUCKET_US} AS end_us
  FROM days
)
SELECT e.event_id, i.promo_id
FROM ev e JOIN iv i ON e.ep_us >= i.start_us AND e.ep_us <= i.end_us
"""


# ----------------------------------- distribution stats: exact percentiles
def q_percentile_stats(spark, sf_dir):
    """Per-source length-distribution statistics: exact p50/p90 of doc
    length plus mean — the distribution fingerprint curation dashboards
    track per source (a source whose p90 collapses after a filter change
    is the canary). Spark `percentile` and DuckDB `quantile_cont` share
    the linear-interpolation definition, so values match bit-for-bit
    pre-rounding.

    Scale note: exact percentile buffers each group's values (bounded by
    docs-per-source here). For unbounded groups the documented scale
    path is approx_percentile(col, p, accuracy) — a fixed-size sketch
    with identical call shape."""
    return _docs(spark, sf_dir).groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.expr("percentile(n_chars, 0.5)"), 6).alias("p50_chars"),
        F.round(F.expr("percentile(n_chars, 0.9)"), 6).alias("p90_chars"),
        F.round(F.avg("n_chars"), 6).alias("mean_chars"),
    )


SQL_PERCENTILE_STATS = """
SELECT source, count(*) AS n_docs,
       round(quantile_cont(n_chars, 0.5), 6) AS p50_chars,
       round(quantile_cont(n_chars, 0.9), 6) AS p90_chars,
       round(avg(n_chars), 6) AS mean_chars
FROM documents GROUP BY source
"""


# --------------------------------- embedding analytics: per-label centroids
def q_group_centroids(spark, sf_dir):
    """Per-label embedding centroids, one row per (label, dim) — the
    embedding-space source/cluster profile used for drift detection and
    as seed centroids for IVF training (extras/ann.py). Emitted in long
    form (label, dim, mean) rather than re-assembled arrays: the long
    form is what both downstream joins and the oracle compare want.

    Scale shape: posexplode multiplies rows by dim, but the map-side
    partial aggregate collapses them before the shuffle — the exchange
    carries only |labels| x dims partial sums, independent of corpus
    size."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return (
        emb.select("label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(
            F.round(F.avg("v"), 6).alias("mean_v"),
            F.count("*").alias("n_vecs"),
        )
    )


SQL_GROUP_CENTROIDS = """
SELECT label, ord - 1 AS dim, round(avg(v), 6) AS mean_v,
       count(*) AS n_vecs
FROM (SELECT label, unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS ord
      FROM embeddings)
GROUP BY label, ord - 1
"""


SPARK_QUERIES = {
    "tokenize_tf": q_tokenize_tf,
    "lang_id": q_lang_id,
    "term_df": q_term_df,
    "candidate_and": q_candidate_and,
    "phrase_adjacency": q_phrase_adjacency,
    "bag_topk_score": q_bag_topk_score,
    "dedup_exact": q_dedup_exact,
    "minhash_signatures": q_minhash_signatures,
    "minhash_pairs": q_minhash_pairs,
    "decontaminate_ngram": q_decontaminate_ngram,
    "neardup_components": q_neardup_components,
    "dedup_keep_best": q_dedup_keep_best,
    "curate_corpus": q_curate_corpus,
    "ngram_jaccard": q_ngram_jaccard,
    "embedding_cosine": q_embedding_cosine,
    "stopword_ratio": q_stopword_ratio,
    "quality_score": q_quality_score,
    "token_counts": q_token_counts,
    "chunk_sliding": q_chunk_sliding,
    "pack_sequences": q_pack_sequences,
    "doc_fingerprint": q_doc_fingerprint,
    "repetition_signals": q_repetition_signals,
    "pii_scrub": q_pii_scrub,
    "sample_split": q_sample_split,
    "sample_stratified": q_sample_stratified,
    "unigram_logprob": q_unigram_logprob,
    "bigram_logprob": q_bigram_logprob,
    "dup_span_coverage": q_dup_span_coverage,
    "dsir_weights": lambda spark, sf_dir: _memo(
        spark, sf_dir, "dsir", lambda: q_dsir_weights(spark, sf_dir)
    ),
    "pmi_topk": q_pmi_topk,
    "domain_stats": q_domain_stats,
    "top_customers": q_top_customers,
    "events_window": q_events_window,
    "sessionize": q_sessionize,
    "asof_attribution": q_asof_attribution,
    "funnel_counts": q_funnel_counts,
    "cross_dedup": q_cross_dedup,
    "tfidf_cosine_topk": q_tfidf_cosine_topk,
    "boolean_or": q_boolean_or,
    "boolean_not": q_boolean_not,
    "ann_topk": q_ann_topk,
    "url_normalize": q_url_normalize,
    "snippet_pick": q_snippet_pick,
    "link_graph_invert": q_link_graph_invert,
    "ann_batch_topk": q_ann_batch_topk,
    "quota_sample": q_quota_sample,
    "perplexity_buckets": q_perplexity_buckets,
    "winnow_fingerprint": _winnow_fp_of,
    "rollup_counts": q_rollup_counts,
    "cohort_retention": q_cohort_retention,
    "tpch_pricing_summary": q_tpch_pricing_summary,
    "revenue_by_nation": q_revenue_by_nation,
    "percentile_stats": q_percentile_stats,
    "group_centroids": q_group_centroids,
    "range_join_events": q_range_join_events,
    "bpe_token_counts": q_bpe_token_counts,
    "winnow_candidate_pairs": q_winnow_candidate_pairs,
    "keyword_topk": q_keyword_topk,
    "kmv_distinct": q_kmv_distinct,
    "pivot_counts": q_pivot_counts,
    "weighted_sample": q_weighted_sample,
}

ORACLE_SQL = {
    "tokenize_tf": SQL_TOKENIZE_TF,
    "lang_id": SQL_LANG_ID,
    "term_df": SQL_TERM_DF,
    "candidate_and": SQL_CANDIDATE_AND,
    "phrase_adjacency": SQL_PHRASE_ADJACENCY,
    "bag_topk_score": SQL_BAG_TOPK_SCORE,
    "dedup_exact": SQL_DEDUP_EXACT,
    "minhash_signatures": SQL_MINHASH_SIGNATURES,
    "minhash_pairs": SQL_MINHASH_PAIRS,
    "decontaminate_ngram": SQL_DECONTAMINATE_NGRAM,
    "neardup_components": SQL_NEARDUP_COMPONENTS,
    "dedup_keep_best": SQL_DEDUP_KEEP_BEST,
    "curate_corpus": SQL_CURATE_CORPUS,
    "ngram_jaccard": SQL_NGRAM_JACCARD,
    "embedding_cosine": SQL_EMBEDDING_COSINE,
    "stopword_ratio": SQL_STOPWORD_RATIO,
    "quality_score": SQL_QUALITY_SCORE,
    "token_counts": SQL_TOKEN_COUNTS,
    "chunk_sliding": SQL_CHUNK_SLIDING,
    "pack_sequences": SQL_PACK_SEQUENCES,
    "doc_fingerprint": SQL_DOC_FINGERPRINT,
    "repetition_signals": SQL_REPETITION_SIGNALS,
    "pii_scrub": SQL_PII_SCRUB,
    "sample_split": SQL_SAMPLE_SPLIT,
    "sample_stratified": SQL_SAMPLE_STRATIFIED,
    "unigram_logprob": SQL_UNIGRAM_LOGPROB,
    "bigram_logprob": SQL_BIGRAM_LOGPROB,
    "dup_span_coverage": SQL_DUP_SPAN_COVERAGE,
    "dsir_weights": SQL_DSIR_WEIGHTS,
    "pmi_topk": SQL_PMI_TOPK,
    "domain_stats": SQL_DOMAIN_STATS,
    "top_customers": SQL_TOP_CUSTOMERS,
    "events_window": SQL_EVENTS_WINDOW,
    "sessionize": SQL_SESSIONIZE,
    "asof_attribution": SQL_ASOF_ATTRIBUTION,
    "funnel_counts": SQL_FUNNEL_COUNTS,
    "cross_dedup": SQL_CROSS_DEDUP,
    "tfidf_cosine_topk": SQL_TFIDF_COSINE_TOPK,
    "boolean_or": SQL_BOOLEAN_OR,
    "boolean_not": SQL_BOOLEAN_NOT,
    "ann_topk": SQL_ANN_TOPK,
    "url_normalize": SQL_URL_NORMALIZE,
    "snippet_pick": SQL_SNIPPET_PICK,
    "link_graph_invert": SQL_LINK_GRAPH_INVERT,
    "ann_batch_topk": SQL_ANN_BATCH_TOPK,
    "quota_sample": SQL_QUOTA_SAMPLE,
    "perplexity_buckets": SQL_PERPLEXITY_BUCKETS,
    "winnow_fingerprint": SQL_WINNOW_FINGERPRINT,
    "rollup_counts": SQL_ROLLUP_COUNTS,
    "cohort_retention": SQL_COHORT_RETENTION,
    "tpch_pricing_summary": SQL_TPCH_PRICING_SUMMARY,
    "revenue_by_nation": SQL_REVENUE_BY_NATION,
    "percentile_stats": SQL_PERCENTILE_STATS,
    "group_centroids": SQL_GROUP_CENTROIDS,
    "range_join_events": SQL_RANGE_JOIN_EVENTS,
    "bpe_token_counts": SQL_BPE_TOKEN_COUNTS,
    "winnow_candidate_pairs": SQL_WINNOW_CANDIDATE_PAIRS,
    "keyword_topk": SQL_KEYWORD_TOPK,
    "kmv_distinct": SQL_KMV_DISTINCT,
    "pivot_counts": SQL_PIVOT_COUNTS,
    "weighted_sample": SQL_WEIGHTED_SAMPLE,
}
