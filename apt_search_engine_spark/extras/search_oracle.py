"""DuckDB oracles for the flagship Porter-stemmed search paths.

Round-1 gap (VERDICT): the 5 `search_*` driver entries were rows-only
because Porter stemming "is not SQL-expressible". But stemming is a pure
per-token function, so its restriction to the corpus vocabulary IS
relational data: this module computes the stem map for every admitted
token of the canonical correctness corpus with the SAME golden-vector-
tested stemmer the engine uses (analysis/porter.py) and embeds it as a
VALUES table inside the generated SQL. Everything else in the flagship
pipeline — the Q1/Q2 tf arithmetic, Q3 substring tag counts, df +
floor-division IDF, P4 candidate intersection, P5 positional adjacency,
P7 boolean set algebra, Q7 first-word gate, Q12 filtered-df recount,
R2-R5 scoring/top-k, and R9 snippet selection + highlighting — is plain
SQL over the registered `documents` view, mirroring
server/src/main/java/processor/QueryProcessor.java:32-281 and
server/src/main/java/ranker/Ranker.java:168-342 semantics exactly as the
engine reproduces them.

Float parity is exact-then-rounded: both engines compute tf, wtf and the
per-doc score with the same IEEE-754 operation order (DuckDB `list_sum`
folds left-to-right like Spark's `aggregate`, verified sequential), the
per-doc term fold runs in ascending term order on both sides
(determinism contract, SURVEY.md 7.4), and only the final score column
is rounded (6 dp) for the hash compare — so the top-k row SET is decided
on bit-identical scores, not rounded ones.

The generated SQL is bound to the corpus it was generated from (the stem
map is corpus-specific); the driver's correctness gate always runs at
sf0.01, so `oracle_sql()` generates against CANONICAL_SF_DIR.
"""

from __future__ import annotations

import os

from apt_search_engine_spark.analysis.analyzer import process_heading_text
from apt_search_engine_spark.analysis.porter import MemoStemmer
from apt_search_engine_spark.config import IDF_NUMERATOR, TURN_PAD
from apt_search_engine_spark.extras.docops import _STOPS_SQL
from apt_search_engine_spark.query import parser


# Spark's F.round on a double is BigDecimal.valueOf(x) (shortest decimal
# string) rounded HALF_UP; DuckDB's round(double) rounds the raw binary
# value. On exact .5 decimal boundaries (e.g. a raw score of 0.0643125,
# whose double is 0.06431249999...) the two disagree by one ulp of the
# rounded column even when the raw scores are bit-identical. ROUND6
# reproduces Spark's rule in DuckDB: shortest-string -> exact DECIMAL ->
# half-away round (== HALF_UP for the positive scores here).
ROUND6 = "round(CAST(CAST(score AS VARCHAR) AS DECIMAL(38,18)), 6)::DOUBLE"

# the driver's DuckDB correctness compare always runs at this scale
CANONICAL_SF_DIR = "/root/testdata/sf0.01"

# the driver-contract reference queries (__spark_entry__.py)
NORMAL_QUERY = "table scan query"
PHRASE_QUERY = '"table hash"'
BOOLEAN_QUERY = '"table hash" AND merge'
# the batch entry's reference query set: bag-of-words queries with
# overlapping terms (the batch plan reads the shared buckets once) plus
# a no-hit query (empty branch of the UNION ALL). Phrase/boolean queries
# fall back to the exact per-query plan inside the engine — that branch
# is parity-tested in tests/test_bm25.py, not gate-oracled, because
# bm25_topk_sql is the bag-of-words scorer only.
BATCH_QUERIES = {
    "q1": NORMAL_QUERY,
    "q2": "table merge",
    "q3": "query index join",
    "q4": "zzz_nonexistent_term",
}

# Adapter channels (_adapt_documents): the title channel of the SHARED
# gate index is the literal "title" (quirk Q11, Tokenizer.java:143); the
# h1 channel is the transcript ROLE column, which the adapter draws
# deterministically (md5 of the source doc_id) from a 4-value list that
# OVERLAPS the corpus vocabulary — so T6 tag weighting is non-vacuous in
# every search_* oracle (r4 VERDICT missing #1: the old constant
# role='user' never intersected any sf vocabulary and the whole tag
# path was gate-invisible). Reference semantics at stake:
# S/Indexer/Tokenizer.java:135-192 (substring tag counts),
# S/ranker/Ranker.java:43-66 (weight fold).
_ADAPTER_TITLE_TEXT = "title"
_ADAPTER_ROLES = ("user", "scan agent", "merge bot", "table writer")
_ROLE_MD5_POS = 5
# The TITLE-WEIGHT gate index (search_title_weight_topk) feeds the
# title channel from the transcript TOOL column instead of the Q11
# literal (IndexBuilder channels override) — same md5 rule, different
# hex position, vocabulary-overlapping values.
_ADAPTER_TOOLS = ("search", "query table", "hash index", "scan merge")
_TOOL_MD5_POS = 6


def _channel_case_sql(values: tuple, pos: int) -> str:
    """SQL CASE yielding the stem-PROCESSED heading text for the md5
    channel rule (value index = ascii(md5-hex char at `pos`) % len).
    Processing happens HERE at generation time with the engine's
    stemmer, so the SQL only ever sees literals."""
    stemmer = MemoStemmer()
    arms = " ".join(
        f"WHEN {i} THEN '{process_heading_text(v, stemmer)}'"
        for i, v in enumerate(values)
    )
    return (
        f"CASE ascii(substr(md5(documents.doc_id::VARCHAR), {pos}, 1))"
        f" % {len(values)} {arms} END"
    )


def _admitted_vocab_sql(channel_cols: str = "") -> str:
    """CTE text yielding admitted raw tokens with pre-filter positions —
    the EXACT text reused by both the vocab extraction and the oracle
    queries, so the stem map covers every token the SQL admits.
    `channel_cols` appends per-doc processed heading-text columns (the
    md5 channel rules) to the docs CTE."""
    return f"""
docs AS (
  SELECT source || '#' ||
         lpad((row_number() OVER (PARTITION BY source ORDER BY documents.doc_id) - 1)::VARCHAR,
              {TURN_PAD}, '0') AS doc_id,
         text{channel_cols}
  FROM documents
),
base AS (
  SELECT doc_id,
         string_split_regex(regexp_replace(lower(text), '[^a-z0-9]', ' ', 'g'), '\\s+') AS arr
  FROM docs
),
rawtoks AS (
  SELECT doc_id, tok, ord - 1 AS pos
  FROM (SELECT doc_id, unnest(arr) AS tok, generate_subscripts(arr, 1) AS ord FROM base)
),
admitted AS (
  SELECT doc_id, tok, pos FROM rawtoks
  WHERE length(tok) > 1 AND NOT regexp_full_match(tok, '\\d+')
        AND tok NOT IN ({_STOPS_SQL})
)"""


def _corpus_stem_values(sf_dir: str) -> str:
    """(raw, stem) VALUES rows for every distinct admitted token in
    sf_dir's documents table, stemmed with the engine's stemmer. Tokens
    are [a-z0-9]+ by construction — no quoting hazards."""
    import duckdb

    con = duckdb.connect()
    try:
        path = os.path.join(sf_dir, "documents.parquet").replace("'", "''")
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')"
        )
        toks = [
            r[0]
            for r in con.execute(
                "WITH " + _admitted_vocab_sql() + " SELECT DISTINCT tok FROM admitted"
            ).fetchall()
        ]
    finally:
        con.close()
    stemmer = MemoStemmer()
    rows = sorted((t, stemmer(t)) for t in toks)
    return ", ".join(f"('{raw}', '{stem}')" for raw, stem in rows)


def _agg_ctes(stem_values: str, channel_cols: str = "") -> str:
    """Shared prefix: documents -> admitted tokens -> stemmed terms ->
    per-(doc, term) raw occurrence count `occ` + ordered positions `ps`.
    Exactly the rows the engine's analyzer emits (occ == len(positions),
    analyzer.analyze_batch_flat)."""
    return f"""stems(raw, stem) AS (VALUES {stem_values}),
{_admitted_vocab_sql(channel_cols)},
toks AS (
  SELECT a.doc_id, s.stem AS term, a.pos
  FROM admitted a JOIN stems s ON s.raw = a.tok
  WHERE s.stem <> ''
),
agg AS (
  SELECT doc_id, term, count(*) AS occ, list(pos ORDER BY pos) AS ps
  FROM toks GROUP BY doc_id, term
)"""


def _postings_ctes(stem_values: str, title_from_tool: bool = False) -> str:
    """Shared CTE chain: documents -> per-(doc, stemmed term) postings
    with occ, ordered positions, tf (quirks Q1/Q2) and wtf (the stored
    tag-weight closed form, build.py _WTF_EXPR) under the adapter
    heading channels: title = the Q11 literal, h1 = the per-doc md5-rule
    ROLE (Q3 substring counts against the processed heading text). With
    `title_from_tool` the title channel is the per-doc md5-rule TOOL
    instead of the Q11 literal — the title-weight gate index's channel
    override."""
    stemmer = MemoStemmer()
    proc_title_lit = process_heading_text(_ADAPTER_TITLE_TEXT, stemmer)

    def _subcount(hay: str) -> str:
        # non-overlapping left-to-right substring count == Python
        # str.count; `hay` is a SQL string expression (literal or the
        # docs CTE's per-doc processed channel column)
        return (
            f"(length({hay}) - length(replace({hay}, term, ''))) // length(term)"
        )

    channel_cols = (
        ",\n         "
        + _channel_case_sql(_ADAPTER_ROLES, _ROLE_MD5_POS)
        + " AS h1txt"
    )
    if title_from_tool:
        channel_cols += (
            ",\n         "
            + _channel_case_sql(_ADAPTER_TOOLS, _TOOL_MD5_POS)
            + " AS titxt"
        )
        title_hay = "d.titxt"
    else:
        title_hay = f"'{proc_title_lit}'"

    return f"""
{_agg_ctes(stem_values, channel_cols)},
tot AS (SELECT doc_id, sum(occ + 1) AS total FROM agg GROUP BY doc_id),
nd AS (SELECT count(*) AS n_docs FROM documents),
tagged AS (
  SELECT a.doc_id, a.term, a.occ, a.ps, d.h1txt,
         (a.occ + 1)::DOUBLE / t.total AS tf,
         least({_subcount(title_hay)}, a.occ) AS n_title
  FROM agg a JOIN tot t USING (doc_id) JOIN docs d USING (doc_id)
),
tagged2 AS (
  SELECT doc_id, term, occ, ps, tf, n_title,
         least({_subcount('h1txt')}, occ - n_title) AS n_h1
  FROM tagged
),
w AS (
  SELECT doc_id, term, occ, ps, n_title, n_h1,
         ((4.0::DOUBLE * n_title + 2.5::DOUBLE * n_h1)
          + 0.5::DOUBLE * (occ - n_title - n_h1)) * tf AS wtf
  FROM tagged2
)"""


def _score_sql(
    filtered_cte: str,
    scoring_terms: list[str],
    gate: str | None,
    k: int = 10,
    with_prior: bool = False,
    exclude_sql: str | None = None,
) -> str:
    """Score `fp` (the filtered postings CTE) exactly like
    SearchEngine._score: contrib = wtf * floor(idf_num/df) * multiplicity,
    df recounted from fp (quirk Q12 — callers override with a true-df fp
    for the normal path), optional first-word semi-join gate (quirk Q7),
    per-doc fold in ascending term order, * prior, top-k. With
    `with_prior` the caller must define a `pri(url, prior)` CTE and the
    per-doc sum multiplies `coalesce(prior, 1/n_docs)` instead of the
    uniform constant (engine `_apply_prior`, Ranker.java:196 absent-key
    default; urls == doc_ids under the fixed adapter)."""
    mult: dict[str, int] = {}
    for t in scoring_terms:
        mult[t] = mult.get(t, 0) + 1
    mult_case = (
        "CASE term "
        + " ".join(f"WHEN '{t}' THEN {c}::DOUBLE" for t, c in sorted(mult.items()))
        + " ELSE 0::DOUBLE END"
    )
    present = ", ".join(f"'{t}'" for t in sorted(mult))
    gate_sql = (
        f" AND c.doc_id IN (SELECT doc_id FROM contribs WHERE term = '{gate}')"
        if gate is not None
        else ""
    )
    if exclude_sql is not None:
        # tombstoned docs never reach the top-k, but df and n_docs stay
        # full-corpus: Lucene-style delete-before-purge semantics
        # (indexing/deletes.py; the engine stamps build-time df and the
        # pre-delete n_docs the same way)
        gate_sql += f" AND c.doc_id NOT IN ({exclude_sql})"
    if with_prior:
        scored = f"""scored AS (
  SELECT c.doc_id,
         list_sum(list(c.contrib ORDER BY c.term))
           * coalesce(p.prior, 1.0::DOUBLE / (SELECT n_docs FROM nd)) AS score
  FROM contribs c LEFT JOIN pri p ON p.url = c.doc_id
  WHERE true{gate_sql}
  GROUP BY c.doc_id, p.prior
)"""
    else:
        scored = f"""scored AS (
  SELECT c.doc_id,
         list_sum(list(c.contrib ORDER BY c.term))
           * (1.0::DOUBLE / (SELECT n_docs FROM nd)) AS score
  FROM contribs c
  WHERE true{gate_sql}
  GROUP BY c.doc_id
)"""
    return f"""{filtered_cte},
dfs AS (SELECT term, count(*) AS df FROM fp GROUP BY term),
contribs AS (
  SELECT fp.doc_id, fp.term,
         fp.wtf * ((greatest({IDF_NUMERATOR}, nd.n_docs) // d.df)::DOUBLE)
                * ({mult_case}) AS contrib
  FROM fp JOIN dfs d USING (term) CROSS JOIN nd
  WHERE fp.term IN ({present})
),
{scored},
topk AS (
  SELECT doc_id, score FROM scored WHERE score <> 0.0
  ORDER BY score DESC, doc_id ASC LIMIT {k}
)"""


def _phrase_cand_cte(terms: list[str]) -> str:
    """P4+P5: docs containing every distinct term where term positions
    satisfy the shift-intersection fold (engine _phrase_filtered)."""
    distinct = sorted(set(terms))
    joins = [f"agg a0 " if i == 0 else f"JOIN agg a{i} USING (doc_id)" for i in range(len(distinct))]
    alias = {t: f"a{i}" for i, t in enumerate(distinct)}
    conds = " AND ".join(f"{alias[t]}.term = '{t}'" for t in distinct)
    base = f"{alias[terms[0]]}.ps"
    for i, t in enumerate(terms[1:], start=1):
        base = f"list_intersect({base}, list_transform({alias[t]}.ps, x -> x - {i}))"
    return (
        "cand AS (\n  SELECT a0.doc_id FROM "
        + " ".join(joins)
        + f"\n  WHERE {conds} AND len({base}) > 0\n)"
    )


def normal_topk_sql(stem_values: str, query: str, k: int = 10) -> str:
    """handleNormal + RankDocuments: OR semantics, true df, no gate."""
    p = parser.parse(query)
    words = sorted({w for w in p.query_words if w.upper() not in parser.OPERATORS})
    present = ", ".join(f"'{t}'" for t in words)
    # normal path uses the build-time (true) df: recounting over fp IS the
    # true df because fp is unfiltered (every posting of the term)
    filtered = f"fp AS (SELECT * FROM w WHERE term IN ({present}))"
    return (
        "WITH "
        + _postings_ctes(stem_values)
        + ",\n"
        + _score_sql(filtered, words, gate=None, k=k)
        + "\nSELECT doc_id, " + ROUND6 + " AS score FROM topk"
    )


DELETED_RULE_SQL = (
    "SELECT doc_id FROM docs WHERE substr(md5(doc_id), 1, 1) IN ('0','1','2')"
)


def deleted_topk_sql(stem_values: str, query: str, k: int = 10) -> str:
    """Normal-path top-k UNDER DELETION: docs matching the deterministic
    ~19% md5 tombstone rule (mirrored by the Spark entry, which resolves
    the same rule over doc_map into SearchEngine(deleted_ids=...)) never
    reach the top-k, while df and n_docs stay full-corpus — the
    delete-before-purge semantics of indexing/deletes.py."""
    p = parser.parse(query)
    words = sorted({w for w in p.query_words if w.upper() not in parser.OPERATORS})
    present = ", ".join(f"'{t}'" for t in words)
    filtered = f"fp AS (SELECT * FROM w WHERE term IN ({present}))"
    return (
        "WITH "
        + _postings_ctes(stem_values)
        + ",\n"
        + _score_sql(filtered, words, gate=None, k=k, exclude_sql=DELETED_RULE_SQL)
        + "\nSELECT doc_id, " + ROUND6 + " AS score FROM topk"
    )


def prior_topk_sql(stem_values: str, query: str, k: int = 10) -> str:
    """S10/R3 integrated: handleNormal + RankDocuments with a NON-UNIFORM
    per-URL prior (Ranker.java:196 pageRanks.get(url), absent-key default
    1/n). The prior table is a deterministic md5-derived function of the
    doc_id covering ~half the docs — cheap to restate in SQL (unlike a
    12-level pagerank CTE chain) while still exercising BOTH branches
    (joined prior and coalesce default) of the engine's `_apply_prior`
    on every query; the pagerank-fed integration itself is parity-tested
    in tests/test_prior.py. Value and coverage formulas are computed
    identically in Spark (`__spark_entry__._prior_q`)."""
    p = parser.parse(query)
    words = sorted({w for w in p.query_words if w.upper() not in parser.OPERATORS})
    present = ", ".join(f"'{t}'" for t in words)
    filtered = f"fp AS (SELECT * FROM w WHERE term IN ({present}))"
    pri = """pri AS (
  SELECT d.doc_id AS url,
         (1 + ascii(substr(md5(d.doc_id), 1, 1)) % 7)::DOUBLE
           / nd.n_docs::DOUBLE AS prior
  FROM docs d CROSS JOIN nd
  WHERE ascii(substr(md5(d.doc_id), 2, 1)) % 2 = 0
)"""
    return (
        "WITH "
        + _postings_ctes(stem_values)
        + ",\n"
        + pri
        + ",\n"
        + _score_sql(filtered, words, gate=None, k=k, with_prior=True)
        + "\nSELECT doc_id, " + ROUND6 + " AS score FROM topk"
    )


def phrase_topk_sql(stem_values: str, query: str, k: int = 10) -> str:
    """handlePhrase + PhraseRank: candidate AND -> adjacency -> score
    with filtered-df recount (Q12) and first-word gate (Q7)."""
    p = parser.parse(query)
    terms = p.query_words
    distinct = sorted(set(terms))
    present = ", ".join(f"'{t}'" for t in distinct)
    filtered = (
        _phrase_cand_cte(terms)
        + f",\nfp AS (SELECT w.* FROM w JOIN cand USING (doc_id) WHERE w.term IN ({present}))"
    )
    words = p.scoring_words
    gate = words[0] if words else None
    return (
        "WITH "
        + _postings_ctes(stem_values)
        + ",\n"
        + _score_sql(filtered, words, gate=gate, k=k)
        + "\nSELECT doc_id, " + ROUND6 + " AS score FROM topk"
    )


def boolean_topk_sql(stem_values: str, query: str, k: int = 10) -> str:
    """handlePhraseWithBoolean + PhraseAndBoolRank for the driver query
    '"<phrase>" AND <word>': left-fold set algebra on segment doc sets,
    postings filtered to the merged set, boolean structure discarded for
    scoring (Q8)."""
    p = parser.parse(query)
    segments = [s for s in p.segments if not parser.is_operator(s)]
    operators = parser.extract_operators(p.segments)
    assert (
        len(segments) == 2
        and operators == ["AND"]
        and segments[0].startswith('"')
        and not segments[1].startswith('"')
    ), "generator covers the driver-contract shape: \"phrase\" AND word"
    phrase_terms = [parser.stem(w) for w in parser.tokenize(segments[0][1:-1])]
    bare = parser.stem(segments[1])
    all_terms = sorted(set(phrase_terms) | {bare})
    present = ", ".join(f"'{t}'" for t in all_terms)
    filtered = (
        _phrase_cand_cte(phrase_terms)
        + f""",
mdocs AS (SELECT DISTINCT doc_id FROM agg WHERE term = '{bare}'),
merged AS (SELECT doc_id FROM cand INTERSECT SELECT doc_id FROM mdocs),
fp AS (SELECT w.* FROM w JOIN merged USING (doc_id) WHERE w.term IN ({present}))"""
    )
    words = p.scoring_words
    gate = words[0] if words else None
    return (
        "WITH "
        + _postings_ctes(stem_values)
        + ",\n"
        + _score_sql(filtered, words, gate=gate, k=k)
        + "\nSELECT doc_id, " + ROUND6 + " AS score FROM topk"
    )


def snippets_topk_sql(stem_values: str, query: str, k: int = 10) -> str:
    """search(..., with_snippets=True) on a normal query: top-k + doc_meta
    (url = doc_id, title = adapter tool = '') + R9 snippet. Snippet terms
    for normal queries are the RAW operator-split segments
    (Ranker.java:202) — here the single segment string. Sentence split
    reproduces Python's `(?<=[.!?])\\s+` via a marker substitution (RE2
    has no lookbehind)."""
    p = parser.parse(query)
    assert p.qtype == "normal" and len(p.segments) == 1
    seg = p.segments[0].lower()
    esc = seg.replace("'", "''")
    # regex-escape for the highlight pattern (segment is alnum+spaces here)
    import re as _re

    pat = _re.escape(seg).replace("'", "''")
    base = normal_topk_sql(stem_values, query, k)
    # strip the final SELECT; reuse its CTE chain
    body = base[: base.rindex("\nSELECT doc_id")]
    return (
        body
        + f""",
paras AS (
  SELECT doc_id, ord - 1 AS pidx, p
  FROM (
    SELECT doc_id, unnest(sarr) AS p, generate_subscripts(sarr, 1) AS ord
    FROM (
      SELECT d.doc_id,
             string_split(regexp_replace(d.text, '([.!?])\\s+', '\\1' || chr(30), 'g'),
                          chr(30)) AS sarr
      FROM docs d JOIN topk USING (doc_id)
      WHERE length(coalesce(d.text, '')) > 0
    )
  )
),
eligible AS (
  SELECT doc_id, pidx, p,
         CASE WHEN contains(lower(p), '{esc}') THEN 1 ELSE 0 END AS nseg,
         (length(lower(p)) - length(replace(lower(p), '{esc}', ''))) // {len(seg)} AS freq
  FROM paras WHERE length(p) <= 1000
),
best AS (
  SELECT doc_id, p,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY nseg DESC, freq DESC, pidx ASC) AS rn
  FROM eligible
)
SELECT t.doc_id, t.doc_id AS url,
       round(CAST(CAST(t.score AS VARCHAR) AS DECIMAL(38,18)), 6)::DOUBLE AS score,
       '' AS title,
       coalesce(regexp_replace(b.p, '{pat}', '<b>\\0</b>', 'gi'), '') AS snippet
FROM topk t LEFT JOIN (SELECT doc_id, p FROM best WHERE rn = 1) b USING (doc_id)"""
    )


def _bm25_stats(
    sf_dir: str, stem_values: str, terms: list[str]
) -> tuple[int, int, dict[str, int]]:
    """(n_docs, total_len, {term: df}) for the corpus — the SAME corpus
    statistics the engine reads from its index meta/lexicon (n_docs =
    input row count, total_len = sum of admitted occurrence counts,
    df = docs containing the term), computed here over the parquet so the
    generator can bake the idf/avgdl-derived constants into the SQL as
    the exact doubles the engine uses."""
    import duckdb

    con = duckdb.connect()
    try:
        path = os.path.join(sf_dir, "documents.parquet").replace("'", "''")
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')"
        )
        n_docs = con.execute("SELECT count(*) FROM documents").fetchone()[0]
        prefix = "WITH " + _agg_ctes(stem_values)
        total_len = con.execute(
            prefix + " SELECT coalesce(sum(occ), 0) FROM agg"
        ).fetchone()[0]
        present = ", ".join(f"'{t}'" for t in sorted(set(terms)))
        dfs = dict(
            con.execute(
                prefix
                + f" SELECT term, count(*) FROM agg WHERE term IN ({present})"
                " GROUP BY term"
            ).fetchall()
        )
    finally:
        con.close()
    return int(n_docs), int(total_len), {t: int(d) for t, d in dfs.items()}


def bm25_topk_sql(
    stem_values: str,
    query: str,
    sf_dir: str = CANONICAL_SF_DIR,
    k: int = 10,
) -> str:
    """Okapi BM25 top-k oracle (engine.search_bm25_df, bag-of-words
    path). idf per term and the K(dl) = c0 + c1*dl constants are
    computed in PYTHON here (engine.bm25_idf — the same function the
    engine calls) and embedded as double literals, so neither engine
    evaluates ln() at runtime and every remaining operation is
    fixed-association IEEE-754 arithmetic on identical doubles: scores
    compare bit-identically pre-rounding."""
    from apt_search_engine_spark.query.engine import (
        BM25_B,
        BM25_K1,
        bm25_idf,
    )

    p = parser.parse(query)
    words = sorted(
        {w for w in p.query_words if w.upper() not in parser.OPERATORS}
    )
    n_docs, total_len, dfs = _bm25_stats(sf_dir, stem_values, words)
    words = [w for w in words if dfs.get(w)]
    if not words:
        return "SELECT '' AS doc_id, 0.0::DOUBLE AS score WHERE false"
    avgdl = total_len / n_docs
    k1p1 = BM25_K1 + 1.0
    c0 = BM25_K1 * (1.0 - BM25_B)
    c1 = BM25_K1 * BM25_B / avgdl
    idf_case = (
        "CASE a.term "
        + " ".join(
            f"WHEN '{t}' THEN {bm25_idf(dfs[t], n_docs)!r}::DOUBLE"
            for t in words
        )
        + " ELSE 0::DOUBLE END"
    )
    present = ", ".join(f"'{t}'" for t in words)
    return f"""WITH {_agg_ctes(stem_values)},
dlen AS (SELECT doc_id, sum(occ) AS dl FROM agg GROUP BY doc_id),
contribs AS (
  SELECT a.doc_id, a.term,
         ({idf_case})
         * ((a.occ::DOUBLE * {k1p1!r}::DOUBLE)
            / (a.occ::DOUBLE + ({c0!r}::DOUBLE + {c1!r}::DOUBLE * d.dl::DOUBLE))) AS contrib
  FROM agg a JOIN dlen d USING (doc_id)
  WHERE a.term IN ({present})
),
scored AS (
  SELECT doc_id, list_sum(list(contrib ORDER BY term)) AS score
  FROM contribs GROUP BY doc_id
),
topk AS (SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id ASC LIMIT {k})
SELECT doc_id, {ROUND6} AS score FROM topk"""


def bm25f_topk_sql(
    stem_values: str,
    query: str,
    sf_dir: str = CANONICAL_SF_DIR,
    k: int = 10,
) -> str:
    """Simple BM25F oracle (engine.search_bm25f_df, default weights =
    the reference tag-weight vector). tagged2 carries per-(doc, term)
    n_title / n_h1 under the fixed adapter channels; h2/h3 do not exist
    in the adapter, so their engine-side terms multiply exact zeros and
    adding them cannot change any IEEE-754 double (x + w*0.0 == x) —
    the SQL states only the realizable fields, in the same textual
    left-association as the engine expression."""
    from apt_search_engine_spark.query.engine import (
        BM25_B,
        BM25_K1,
        BM25F_WEIGHTS,
        bm25_idf,
    )

    p = parser.parse(query)
    words = sorted(
        {w for w in p.query_words if w.upper() not in parser.OPERATORS}
    )
    n_docs, total_len, dfs = _bm25_stats(sf_dir, stem_values, words)
    words = [w for w in words if dfs.get(w)]
    if not words:
        return "SELECT '' AS doc_id, 0.0::DOUBLE AS score WHERE false"
    avgdl = total_len / n_docs
    k1p1 = BM25_K1 + 1.0
    c0 = BM25_K1 * (1.0 - BM25_B)
    c1 = BM25_K1 * BM25_B / avgdl
    wt = BM25F_WEIGHTS
    idf_case = (
        "CASE a.term "
        + " ".join(
            f"WHEN '{t}' THEN {bm25_idf(dfs[t], n_docs)!r}::DOUBLE"
            for t in words
        )
        + " ELSE 0::DOUBLE END"
    )
    present = ", ".join(f"'{t}'" for t in words)
    tfw = (
        f"({wt['title']!r}::DOUBLE * a.n_title::DOUBLE"
        f" + {wt['h1']!r}::DOUBLE * a.n_h1::DOUBLE"
        f" + {wt['body']!r}::DOUBLE *"
        f" (a.occ::DOUBLE - a.n_title::DOUBLE - a.n_h1::DOUBLE))"
    )
    return f"""WITH {_postings_ctes(stem_values)},
dlen AS (SELECT doc_id, sum(occ) AS dl FROM agg GROUP BY doc_id),
contribs AS (
  SELECT a.doc_id, a.term,
         ({idf_case})
         * (({tfw} * {k1p1!r}::DOUBLE)
            / ({tfw} + ({c0!r}::DOUBLE + {c1!r}::DOUBLE * d.dl::DOUBLE))) AS contrib
  FROM tagged2 a JOIN dlen d USING (doc_id)
  WHERE a.term IN ({present})
),
scored AS (
  SELECT doc_id, list_sum(list(contrib ORDER BY term)) AS score
  FROM contribs GROUP BY doc_id
),
topk AS (SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id ASC LIMIT {k})
SELECT doc_id, {ROUND6} AS score FROM topk"""


def bm25_batch_topk_sql(
    stem_values: str,
    queries: dict[str, str],
    sf_dir: str = CANONICAL_SF_DIR,
    k: int = 10,
) -> str:
    """Batched multi-query BM25 oracle (engine.search_bm25_batch_df):
    UNION ALL of the per-query bm25_topk_sql with the query_id stamped —
    semantically 'each query's top-k, independently', which is exactly
    the batch plan's per-query contract."""
    parts = [
        f"SELECT '{qid}' AS query_id, * FROM (\n"
        + bm25_topk_sql(stem_values, queries[qid], sf_dir, k)
        + "\n)"
        for qid in sorted(queries)
    ]
    return "\nUNION ALL\n".join(parts)


# Multi-term-rewrite gate parameters (engine.search_prefix_df /
# search_fuzzy_df / suggest_terms_df / facet_counts_df). Chosen non-vacuous
# on the canonical sf0.01 vocabulary: prefix 's' matches 6 stems so
# max_expansions=4 exercises the deterministic cap; 'sow' is within
# Levenshtein 1 of exactly {slow, row}.
PREFIX_QUERY = "s"
PREFIX_MAX_EXPANSIONS = 4
FUZZY_WORD = "sow"
FUZZY_MAX_DIST = 1
SUGGEST_K = 4
# General wildcard gate fixture: `s*a*` matches {scan, small, spark,
# stream} on the sf0.01 vocabulary; the cap of 3 exercises the
# deterministic (df DESC, term ASC) TopTermsRewrite branch.
WILDCARD_PATTERN = "s*a*"
WILDCARD_MAX_EXPANSIONS = 3
# Spell-correction gate fixture: two dist-1 typos, two dist-2 typos, one
# in-vocabulary word (must yield no row) and one hopeless string (no
# candidate within max_dist — no row).
SPELL_WORDS = ["jion", "scan", "strean", "tabel", "windoq", "zzzzqq"]
SPELL_MAX_DIST = 2
# More-like-this gate fixture: seed doc + a term cap that lands on a
# selection-score tie (broken term ASC on both sides).
MLT_DOC = "src0#000000"
MLT_MAX_TERMS = 5
# Query-time synonym gate fixture (stem space): two in-vocabulary
# synonym targets plus one absent target (must contribute nothing).
SYN_PAIRS = [("tabl", "row"), ("scan", "stream"), ("queri", "zzz_absent")]
SYN_QUERY = "table scan query"
# deterministic (doc_id -> facet) rule the facet gate entry mirrors in
# Spark (element_at is 1-based there too)
FACET_RULE_SQL = (
    "['en', 'de', 'fr', 'es'][ascii(substr(md5(doc_id), 3, 1)) % 4 + 1]"
)


def _expansion_score_sql(
    exp_cte: str, k: int = 10, exclude_doc: str | None = None
) -> str:
    """Score a server-derived expansion set (the prefix/fuzzy multi-term
    rewrite): the caller supplies an `exp(term)` CTE selecting expanded
    terms out of `tdf` — per-term true df over the unfiltered postings,
    which equals the lexicon df the engine's expansion reads. Every
    expanded term scores with multiplicity 1, true df, and no gate:
    exactly engine._score over _exploded(with_df=True). `exclude_doc`
    drops one doc before the top-k (the more-like-this seed)."""
    excl = (
        f" AND doc_id <> '{exclude_doc}'" if exclude_doc is not None else ""
    )
    return f"""tdf AS (SELECT term, count(*) AS df FROM w GROUP BY term),
{exp_cte},
fp AS (SELECT w.* FROM w JOIN exp USING (term)),
contribs AS (
  SELECT fp.doc_id, fp.term,
         fp.wtf * ((greatest({IDF_NUMERATOR}, nd.n_docs) // d.df)::DOUBLE)
           AS contrib
  FROM fp JOIN tdf d USING (term) CROSS JOIN nd
),
scored AS (
  SELECT doc_id,
         list_sum(list(contrib ORDER BY term))
           * (1.0::DOUBLE / (SELECT n_docs FROM nd)) AS score
  FROM contribs GROUP BY doc_id
),
topk AS (
  SELECT doc_id, score FROM scored WHERE score <> 0.0{excl}
  ORDER BY score DESC, doc_id ASC LIMIT {k}
)"""


def prefix_topk_sql(
    stem_values: str,
    prefix: str = PREFIX_QUERY,
    k: int = 10,
    max_expansions: int = PREFIX_MAX_EXPANSIONS,
) -> str:
    """Prefix query `pre*`: expand to the max_expansions highest-df
    vocabulary terms starting with the prefix (df DESC, term ASC — the
    engine's deterministic TopTermsRewrite cap), then score the
    expansion as a bag-of-words OR query."""
    exp = (
        f"exp AS (SELECT term FROM tdf WHERE starts_with(term, '{prefix}')\n"
        f"  ORDER BY df DESC, term ASC LIMIT {max_expansions})"
    )
    return (
        "WITH "
        + _postings_ctes(stem_values)
        + ",\n"
        + _expansion_score_sql(exp, k)
        + "\nSELECT doc_id, " + ROUND6 + " AS score FROM topk"
    )


def fuzzy_topk_sql(
    stem_values: str,
    word: str = FUZZY_WORD,
    k: int = 10,
    max_dist: int = FUZZY_MAX_DIST,
    max_expansions: int = 50,
) -> str:
    """Fuzzy query `word~d`: expand to vocabulary terms within
    Levenshtein distance d (distance ASC, df DESC, term ASC cap —
    engine.expand_fuzzy), score as bag-of-words OR. DuckDB's
    levenshtein == Spark's F.levenshtein (plain unweighted edit
    distance)."""
    exp = (
        f"exp AS (SELECT term FROM tdf\n"
        f"  WHERE levenshtein(term, '{word}') <= {max_dist}\n"
        f"  ORDER BY levenshtein(term, '{word}') ASC, df DESC, term ASC\n"
        f"  LIMIT {max_expansions})"
    )
    return (
        "WITH "
        + _postings_ctes(stem_values)
        + ",\n"
        + _expansion_score_sql(exp, k)
        + "\nSELECT doc_id, " + ROUND6 + " AS score FROM topk"
    )


def wildcard_topk_sql(
    stem_values: str,
    pattern: str = WILDCARD_PATTERN,
    k: int = 10,
    max_expansions: int = WILDCARD_MAX_EXPANSIONS,
) -> str:
    """General wildcard query (`te*t` shape, engine.search_wildcard_df):
    expand to the max_expansions highest-df vocabulary terms matching
    the glob as SQL LIKE (`*` -> %, `?` -> _; engine._glob_to_like),
    capped (df DESC, term ASC), then score the expansion as a
    bag-of-words OR query."""
    like = pattern.replace("*", "%").replace("?", "_")
    exp = (
        f"exp AS (SELECT term FROM tdf WHERE term LIKE '{like}'\n"
        f"  ORDER BY df DESC, term ASC LIMIT {max_expansions})"
    )
    return (
        "WITH "
        + _postings_ctes(stem_values)
        + ",\n"
        + _expansion_score_sql(exp, k)
        + "\nSELECT doc_id, " + ROUND6 + " AS score FROM topk"
    )


def spell_correct_sql(
    stem_values: str,
    words: list[str] | None = None,
    max_dist: int = SPELL_MAX_DIST,
    k: int = 1,
) -> str:
    """Spell correction (engine.suggest_spelling_df): for each input
    word whose analyzed stem is NOT in the vocabulary, the k nearest
    vocabulary terms by (levenshtein ASC, df DESC, term ASC) within
    max_dist. The (word, stem) pairs are computed with the engine's
    stemmer at SQL-gen time (same VALUES-table pattern as the corpus
    stem map); DuckDB's levenshtein == Spark's F.levenshtein."""
    words = SPELL_WORDS if words is None else words
    wl = ", ".join(
        f"('{w}', '{parser.stem(w)}')" for w in sorted(set(words))
    )
    return (
        "WITH "
        + _agg_ctes(stem_values)
        + f""",
tdf AS (SELECT term, count(*)::BIGINT AS df FROM agg GROUP BY term),
wl(word, stem) AS (VALUES {wl}),
unknown AS (
  SELECT word, stem FROM wl
  WHERE stem NOT IN (SELECT term FROM tdf)
),
cand AS (
  SELECT u.word, t.term AS suggestion,
         levenshtein(t.term, u.stem)::INT AS dist, t.df,
         row_number() OVER (
           PARTITION BY u.word
           ORDER BY levenshtein(t.term, u.stem) ASC, t.df DESC, t.term ASC
         ) AS rnk
  FROM unknown u JOIN tdf t
    ON abs(length(t.term) - length(u.stem)) <= {max_dist}
   AND levenshtein(t.term, u.stem) <= {max_dist}
)
SELECT word, suggestion, dist, df FROM cand WHERE rnk <= {k}
ORDER BY word ASC, dist ASC, df DESC, suggestion ASC"""
    )


def synonym_topk_sql(
    stem_values: str,
    query: str = SYN_QUERY,
    pairs: list[tuple[str, str]] | None = None,
    k: int = 10,
) -> str:
    """Query-time synonym expansion (engine.search_synonym_df): the
    query's bag-of-words plus each word's mapped synonyms, scored as the
    standard multi-term rewrite. The expanded term set is derived at
    SQL-gen time from the same fixed pairs the driver entry feeds the
    engine; synonyms absent from the vocabulary drop out in the postings
    join on both sides."""
    pairs = SYN_PAIRS if pairs is None else pairs
    p = parser.parse(query)
    words = sorted(
        {w for w in p.query_words if w.upper() not in parser.OPERATORS}
    )
    terms = set(words)
    mapping: dict[str, list[str]] = {}
    for t, s in pairs:
        mapping.setdefault(t, []).append(s)
    for w in words:
        terms.update(mapping.get(w, []))
    vals = ", ".join(f"('{t}')" for t in sorted(terms))
    exp = f"exp AS (SELECT term FROM (VALUES {vals}) AS t(term))"
    return (
        "WITH "
        + _postings_ctes(stem_values)
        + ",\n"
        + _expansion_score_sql(exp, k)
        + "\nSELECT doc_id, " + ROUND6 + " AS score FROM topk"
    )


def mlt_topk_sql(
    stem_values: str,
    doc_id: str = MLT_DOC,
    k: int = 10,
    max_terms: int = MLT_MAX_TERMS,
) -> str:
    """More-like-this (engine.more_like_this_df): select the seed doc's
    max_terms most characteristic terms by occ * floor(idf_num/df) —
    integer arithmetic, ties broken term ASC, reproducing
    engine.mlt_terms exactly — then score them as a bag-of-words OR
    query with the seed itself excluded before the top-k."""
    exp = f"""seedv AS (SELECT term, occ FROM agg WHERE doc_id = '{doc_id}'),
exp AS (
  SELECT s.term
  FROM seedv s JOIN tdf d USING (term) CROSS JOIN nd
  ORDER BY s.occ * (greatest({IDF_NUMERATOR}, nd.n_docs) // d.df) DESC,
           s.term ASC
  LIMIT {max_terms}
)"""
    return (
        "WITH "
        + _postings_ctes(stem_values)
        + ",\n"
        + _expansion_score_sql(exp, k, exclude_doc=doc_id)
        + "\nSELECT doc_id, " + ROUND6 + " AS score FROM topk"
    )


# NEAR gate parameters: 'table NEAR/3 hash' — a strict superset of the
# adjacent phrase "table hash" (non-vacuous AND discriminative vs the
# phrase entry's candidate set)
NEAR_W1, NEAR_W2, NEAR_SLOP = "table", "hash", 3


def near_topk_sql(
    stem_values: str,
    w1: str = NEAR_W1,
    w2: str = NEAR_W2,
    slop: int = NEAR_SLOP,
    k: int = 10,
) -> str:
    """NEAR/slop proximity (engine.search_near_df): candidates = docs
    where some position of stem(w1) and some position of stem(w2) lie
    within `slop` of each other (either order); scoring = the phrase
    path's filtered-df recount + first-word gate."""
    t1, t2 = parser.stem(w1.strip().lower()), parser.stem(w2.strip().lower())
    words = sorted({t1, t2})
    present = ", ".join(f"'{t}'" for t in words)
    filtered = f"""cand AS (
  SELECT a.doc_id FROM agg a JOIN agg b USING (doc_id)
  WHERE a.term = '{t1}' AND b.term = '{t2}'
    AND len(list_filter(a.ps,
          x -> len(list_filter(b.ps, y -> abs(x - y) <= {slop})) > 0)) > 0
),
fp AS (SELECT w.* FROM w JOIN cand USING (doc_id) WHERE w.term IN ({present}))"""
    return (
        "WITH "
        + _postings_ctes(stem_values)
        + ",\n"
        + _score_sql(filtered, words, gate=t1, k=k)
        + "\nSELECT doc_id, " + ROUND6 + " AS score FROM topk"
    )


def sloppy_topk_sql(
    stem_values: str,
    w1: str = NEAR_W1,
    w2: str = NEAR_W2,
    slop: int = NEAR_SLOP,
    k: int = 10,
) -> str:
    """Sloppy phrase `"w1 w2"~slop` (engine.search_near_df with
    ordered=True): candidates require some position of stem(w1)
    FOLLOWED by a position of stem(w2) within `slop` — a superset of
    the adjacent phrase (slop 1 in this direction == adjacency) and a
    subset of unordered NEAR/slop; scoring identical to the phrase
    path."""
    t1, t2 = parser.stem(w1.strip().lower()), parser.stem(w2.strip().lower())
    words = sorted({t1, t2})
    present = ", ".join(f"'{t}'" for t in words)
    filtered = f"""cand AS (
  SELECT a.doc_id FROM agg a JOIN agg b USING (doc_id)
  WHERE a.term = '{t1}' AND b.term = '{t2}'
    AND len(list_filter(a.ps,
          x -> len(list_filter(b.ps, y -> y - x BETWEEN 1 AND {slop})) > 0)) > 0
),
fp AS (SELECT w.* FROM w JOIN cand USING (doc_id) WHERE w.term IN ({present}))"""
    return (
        "WITH "
        + _postings_ctes(stem_values)
        + ",\n"
        + _score_sql(filtered, words, gate=t1, k=k)
        + "\nSELECT doc_id, " + ROUND6 + " AS score FROM topk"
    )


# fielded gate parameters: h1:'table' — matches docs whose md5-rule
# role contains 'table' ('table writer') AND that contain the term
FIELD_QUERY_FIELD = "h1"
FIELD_QUERY = "table"
# title-weight gate query (over the tool-fed title index)
TITLE_WEIGHT_QUERY = "table scan query"


def fielded_topk_sql(
    stem_values: str,
    field: str = FIELD_QUERY_FIELD,
    query: str = FIELD_QUERY,
    k: int = 10,
) -> str:
    """Fielded search field:term... (engine.search_field_df): every
    scoring term needs >= 1 occurrence TAGGED with the channel (T6's
    substring-count assignment decides membership — here the per-doc
    md5-rule role feeds h1), df recounted over the restriction (quirk
    Q12), then the reference scorer unchanged."""
    assert field in ("title", "h1"), "adapter realizes title/h1 only"
    ncol = f"n_{field}"
    p = parser.parse(query)
    words = sorted(
        {w for w in p.query_words if w.upper() not in parser.OPERATORS}
    )
    present = ", ".join(f"'{t}'" for t in words)
    filtered = (
        f"fp AS (SELECT doc_id, term, wtf FROM w"
        f" WHERE term IN ({present}) AND {ncol} > 0)"
    )
    return (
        "WITH "
        + _postings_ctes(stem_values)
        + ",\n"
        + _score_sql(filtered, words, gate=None, k=k)
        + "\nSELECT doc_id, " + ROUND6 + " AS score FROM topk"
    )


def title_weight_topk_sql(
    stem_values: str, query: str = TITLE_WEIGHT_QUERY, k: int = 10
) -> str:
    """Normal-path top-k over the TITLE-WEIGHT index (title channel fed
    by the md5-rule tool instead of the Q11 literal): occurrences whose
    term substring-matches the processed tool text score at the 4.0
    title weight (Ranker.java:43-52), so the ranking diverges from the
    shared index's on the same query — the title arm of the T6/R1 fold
    is gate-visible."""
    p = parser.parse(query)
    words = sorted(
        {w for w in p.query_words if w.upper() not in parser.OPERATORS}
    )
    present = ", ".join(f"'{t}'" for t in words)
    filtered = f"fp AS (SELECT * FROM w WHERE term IN ({present}))"
    return (
        "WITH "
        + _postings_ctes(stem_values, title_from_tool=True)
        + ",\n"
        + _score_sql(filtered, words, gate=None, k=k)
        + "\nSELECT doc_id, " + ROUND6 + " AS score FROM topk"
    )


# n-term sloppy gate parameters: '"table hash merge"~4' — 14 matching
# sf0.01 docs, a strict superset of the slop-0 exact phrase (2 docs)
SLOPPY3_WORDS = ("table", "hash", "merge")
SLOPPY3_SLOP = 4


def sloppy3_topk_sql(
    stem_values: str,
    words: tuple = SLOPPY3_WORDS,
    slop: int = SLOPPY3_SLOP,
    k: int = 10,
) -> str:
    """N-term sloppy phrase (engine.search_sloppy_df — Lucene
    PhraseQuery slop, in-order chains): candidates = docs containing a
    strictly increasing chain p1 < ... < pn over the stems' positions
    with span p_n - p_1 <= slop + n - 1; scoring = the phrase path's
    filtered-df recount + first-word gate. The EXISTS chain is restated
    as nested list_filters (the engine's greedy minimal-chain scan is
    an equivalent decision procedure)."""
    stems = [parser.stem(w.strip().lower()) for w in words]
    assert len(stems) == len(set(stems)) >= 3, "generator wants >=3 distinct stems"
    budget = slop + len(stems) - 1
    present = ", ".join(f"'{t}'" for t in stems)
    joins = ["agg a0"] + [
        f"JOIN agg a{i} USING (doc_id)" for i in range(1, len(stems))
    ]
    conds = " AND ".join(
        f"a{i}.term = '{t}'" for i, t in enumerate(stems)
    )
    # nested EXISTS chain, innermost checks the span budget vs x0
    inner = f"z{len(stems) - 1} - z0 <= {budget}"
    for i in range(len(stems) - 1, 0, -1):
        inner = (
            f"len(list_filter(a{i}.ps, z{i} -> z{i} > z{i - 1}"
            f" AND {inner})) > 0"
        )
    chain = f"len(list_filter(a0.ps, z0 -> {inner})) > 0"
    filtered = (
        "cand AS (\n  SELECT a0.doc_id FROM "
        + " ".join(joins)
        + f"\n  WHERE {conds} AND {chain}\n),\n"
        + f"fp AS (SELECT w.* FROM w JOIN cand USING (doc_id)"
        f" WHERE w.term IN ({present}))"
    )
    return (
        "WITH "
        + _postings_ctes(stem_values)
        + ",\n"
        + _score_sql(filtered, stems, gate=stems[0], k=k)
        + "\nSELECT doc_id, " + ROUND6 + " AS score FROM topk"
    )


def match_count_sql(stem_values: str, query: str = NORMAL_QUERY) -> str:
    """Exact total match count (engine.match_count_df): the size of the
    FULL ranked list the reference returns (SearchController
    totalCount) — count of docs with nonzero score under the query's
    plan, phrase gate/candidate semantics included."""
    p = parser.parse(query)
    if p.qtype == "phrase":
        terms = p.query_words
        distinct = sorted(set(terms))
        present = ", ".join(f"'{t}'" for t in distinct)
        filtered = (
            _phrase_cand_cte(terms)
            + f",\nfp AS (SELECT w.* FROM w JOIN cand USING (doc_id)"
            f" WHERE w.term IN ({present}))"
        )
        words = p.scoring_words
        gate = words[0] if words else None
    else:
        words = sorted(
            {w for w in p.query_words if w.upper() not in parser.OPERATORS}
        )
        present = ", ".join(f"'{t}'" for t in words)
        filtered = f"fp AS (SELECT * FROM w WHERE term IN ({present}))"
        gate = None
    return (
        "WITH "
        + _postings_ctes(stem_values)
        + ",\n"
        + _score_sql(filtered, words, gate=gate, k=1)
        + "\nSELECT count(*)::BIGINT AS n_matches FROM scored WHERE score <> 0.0"
    )


def suggest_terms_sql(
    stem_values: str, prefix: str = PREFIX_QUERY, k: int = SUGGEST_K
) -> str:
    """Server-side suggestions: top-k vocabulary terms by df for a
    prefix (engine.suggest_terms_df — one lexicon scan)."""
    return (
        "WITH "
        + _agg_ctes(stem_values)
        + f""",
tdf AS (SELECT term, count(*)::BIGINT AS df FROM agg GROUP BY term)
SELECT term, df FROM tdf WHERE starts_with(term, '{prefix}')
ORDER BY df DESC, term ASC LIMIT {k}"""
    )


def facet_counts_sql(
    stem_values: str, query: str = NORMAL_QUERY
) -> str:
    """Facet counts over the query's OR match set (engine
    facet_counts_df): distinct matching docs joined to a deterministic
    md5-derived (doc_id -> facet) table, counted per facet."""
    p = parser.parse(query)
    words = sorted({w for w in p.query_words if w.upper() not in parser.OPERATORS})
    present = ", ".join(f"'{t}'" for t in words)
    return (
        "WITH "
        + _agg_ctes(stem_values)
        + f""",
match AS (SELECT DISTINCT doc_id FROM agg WHERE term IN ({present})),
fac AS (SELECT doc_id, {FACET_RULE_SQL} AS facet FROM docs)
SELECT facet, count(*)::BIGINT AS n_docs
FROM match JOIN fac USING (doc_id)
GROUP BY facet ORDER BY n_docs DESC, facet ASC"""
    )


def build_search_oracles(sf_dir: str = CANONICAL_SF_DIR) -> dict[str, str]:
    """The 5 flagship oracle SQL strings for the given corpus. Raises if
    the corpus is unreadable (callers treat that as 'no oracle')."""
    sv = _corpus_stem_values(sf_dir)
    bm25 = bm25_topk_sql(sv, NORMAL_QUERY, sf_dir)
    batch = bm25_batch_topk_sql(sv, BATCH_QUERIES, sf_dir)
    return {
        "search_bm25_batch_topk": batch,
        "search_normal_topk": normal_topk_sql(sv, NORMAL_QUERY),
        "search_phrase_topk": phrase_topk_sql(sv, PHRASE_QUERY),
        "search_boolean_topk": boolean_topk_sql(sv, BOOLEAN_QUERY),
        # WAND is rank+score identical to the exact plan (tests/test_wand.py)
        "search_wand_topk": normal_topk_sql(sv, NORMAL_QUERY),
        "search_snippets_topk": snippets_topk_sql(sv, NORMAL_QUERY),
        "search_prior_topk": prior_topk_sql(sv, NORMAL_QUERY),
        "search_deleted_topk": deleted_topk_sql(sv, NORMAL_QUERY),
        # WAND under deletion is rank+score identical to the exact
        # deleted plan (tests/test_deletes.py) — same oracle
        "search_deleted_wand_topk": deleted_topk_sql(sv, NORMAL_QUERY),
        "search_bm25_topk": bm25,
        # block-max WAND BM25 is rank+score identical to the exact BM25
        # plan (tests/test_bm25.py) — same oracle
        "search_bm25_wand_topk": bm25,
        "search_prefix_topk": prefix_topk_sql(sv),
        # WAND over the expansion is rank+score identical to the exact
        # rewrite (tests/test_multiterm.py) — same oracle
        "search_prefix_wand_topk": prefix_topk_sql(sv),
        "search_fuzzy_topk": fuzzy_topk_sql(sv),
        "suggest_terms": suggest_terms_sql(sv),
        "facet_counts": facet_counts_sql(sv),
        "search_match_count": match_count_sql(sv, NORMAL_QUERY),
        "search_phrase_match_count": match_count_sql(sv, PHRASE_QUERY),
        "search_near_topk": near_topk_sql(sv),
        "search_bm25f_topk": bm25f_topk_sql(sv, NORMAL_QUERY, sf_dir),
        "search_wildcard_topk": wildcard_topk_sql(sv),
        # WAND over the wildcard expansion is rank+score identical to
        # the exact rewrite (tests/test_multiterm.py) — same oracle
        "search_wildcard_wand_topk": wildcard_topk_sql(sv),
        "spell_correct": spell_correct_sql(sv),
        "more_like_this_topk": mlt_topk_sql(sv),
        "search_synonym_topk": synonym_topk_sql(sv),
        "search_sloppy_topk": sloppy_topk_sql(sv),
        "search_sloppy3_topk": sloppy3_topk_sql(sv),
        "search_field_topk": fielded_topk_sql(sv),
        "search_title_weight_topk": title_weight_topk_sql(sv),
    }
