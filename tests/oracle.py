"""Pure-Python oracle: executable spec of the reference engine.

Reimplements, dict-for-dict, the reference's index build + query processing
+ ranking so the Spark engine can be tested for rank identity without
running the Java (no MongoDB/Maven here). Control flow follows:

  - index build: server/src/main/java/Indexer/Tokenizer.java (via the shared
    analyzer module, T1-T6 + quirks Q1-Q5 and the literal-"title" channel
    bug Q11 at Tokenizer.java:143)
  - query processing: server/src/main/java/processor/QueryProcessor.java
    (classification :32-38, handleNormal :121-128, handlePhrase :130-173,
    checkPhraseMatch :175-200, handlePhraseWithBoolean :202-281,
    splitQuery :284-287)
  - ranking: server/src/main/java/ranker/Ranker.java (RankDocuments
    :168-230, PhraseRank :295-342, PhraseAndBoolRank :395-434,
    calculateRelevance :55-66 incl. the int-division IDF)
  - snippets: server/src/main/java/ranker/Snippeterr.java

Documented deviations (SURVEY.md section 7.4): per-doc scores sum in
ascending term order; ties broken by doc_id asc; the doc prior is uniform
1/N_docs (transcripts have no link graph) — all mirrored by the engine.
"""

from __future__ import annotations

import re

from apt_search_engine_spark.analysis.analyzer import analyze_doc, tag_weight
from apt_search_engine_spark.analysis.porter import MemoStemmer
from apt_search_engine_spark.config import (
    IDF_NUMERATOR,
    SNIPPET_MAX_LEN,
    make_doc_id,
)

_stemmer = MemoStemmer()

_QUERY_CLEAN = re.compile(r"[^a-z0-9\s]")
_WS = re.compile(r"\s+")
# Java: query.split("(?= AND | OR | NOT )|(?<= AND | OR | NOT )") — Python
# needs fixed-width lookbehind branches, split points are identical.
_BOOL_SPLIT = re.compile(r"(?= AND | OR | NOT )|(?<= AND )|(?<= OR )|(?<= NOT )")
_SENTENCE_SPLIT = re.compile(r"(?<=[.!?])\s+")


def query_tokenize(q: str) -> list[str]:
    """processor/Tokenizer.java:7-23 — NO stopword/length/digit filter."""
    cleaned = _QUERY_CLEAN.sub(" ", q.lower()).strip()
    return [w for w in _WS.split(cleaned) if w]


def contains_boolean(q: str) -> bool:
    ql = q.lower()
    return " and " in ql or " or " in ql or " not " in ql


def classify(q: str) -> str:
    if '"' in q:
        return "phrase+boolean" if contains_boolean(q) else "phrase"
    return "normal+boolean" if contains_boolean(q) else "normal"


def split_query(q: str) -> list[str]:
    return [p.strip() for p in _BOOL_SPLIT.split(q)]


_OPS = ("AND", "OR", "NOT")


def _is_op(part: str) -> bool:
    return part.upper() in _OPS


class OracleEngine:
    """In-memory index + query engine over adapter documents."""

    def __init__(self, docs: list[dict], priors: dict[str, float] | None = None):
        """docs: [{doc_id, body, title, h1s: [..], ps: [..]}]
        (FIXTURES.md section A adapter shape). `priors` is the optional
        per-URL pagerank map (Ranker.java pageRanks); URLs == doc_ids in
        the fixture shape. Absent keys default to the uniform 1/N."""
        self.docs = {d["doc_id"]: d for d in docs}
        self.n_docs = len(docs)
        self.priors = priors or {}
        # inverted: term -> {doc_id: {tf, positions, tags}}
        self.inverted: dict[str, dict[str, dict]] = {}
        for d in docs:
            # Q11: the title channel processes the literal string "title"
            # (Tokenizer.java:143), NOT the document title.
            headings = [("title", ["title"]), ("h1", d.get("h1s", []))]
            tm = analyze_doc(d.get("body"), headings, _stemmer)
            for term, info in tm.items():
                if not info["positions"]:  # Q6 (DBManager.java:241-247)
                    continue
                self.inverted.setdefault(term, {})[d["doc_id"]] = info

    # --- reference prior (Ranker.java:196): pageRanks.get(url) with the
    # uniform 1/N default for absent URLs; uniform everywhere when no
    # prior map is given (transcripts default, documented deviation) ---
    def prior(self, url: str) -> float:
        return self.priors.get(url, 1.0 / self.n_docs)

    # --- query-side term fetch (P2) ---
    def _docs_for_words(self, terms) -> dict[str, dict[str, dict]]:
        return {t: dict(self.inverted[t]) for t in terms if t in self.inverted}

    # --- handleNormal (QueryProcessor.java:121-128) ---
    def _handle_normal(self, terms: list[str]) -> dict[str, dict[str, dict]]:
        filtered = [t for t in terms if t.upper() not in _OPS]
        return self._docs_for_words(filtered)

    # --- handlePhrase (QueryProcessor.java:130-173) ---
    def _handle_phrase(self, terms: list[str]) -> dict[str, dict[str, dict]]:
        if not terms:
            return {}
        term_docs = self._docs_for_words(terms)
        common: set[str] | None = None
        for t in terms:
            ids = set(term_docs.get(t, {}))
            common = ids if common is None else (common & ids)
        candidates = sorted(common or ())

        def phrase_match(doc_id: str) -> bool:
            base = None
            for i, t in enumerate(terms):
                positions = term_docs.get(t, {}).get(doc_id, {}).get("positions")
                if not positions:
                    return False
                shifted = {p - i for p in positions if p - i >= 0}
                base = shifted if base is None else (base & shifted)
                if not base:
                    return False
            return bool(base)

        matched = [d for d in candidates if phrase_match(d)]
        out: dict[str, dict[str, dict]] = {}
        for t in terms:
            for d in matched:
                out.setdefault(t, {})[d] = term_docs[t][d]
        return out

    # --- handlePhraseWithBoolean (QueryProcessor.java:202-281) ---
    def _handle_phrase_boolean(self, query: str) -> dict[str, dict[str, dict]]:
        parts = split_query(query)
        operators = [p.upper() for p in parts if _is_op(p)]
        seg_results: list[dict[str, dict[str, dict]]] = []
        for part in parts:
            if _is_op(part):
                continue
            if part.startswith('"') and part.endswith('"'):
                phrase = part[1:-1]
                tokens = [_stemmer(w) for w in query_tokenize(phrase)]
                seg_results.append(self._handle_phrase(tokens))
            else:
                term = _stemmer(part.lower())
                seg_results.append({term: self.inverted.get(term, {}).copy()}
                                   if term in self.inverted else {term: {}})

        doc_id_sets = [set().union(*(set(v) for v in r.values())) if r else set()
                       for r in seg_results]
        merged = set(doc_id_sets[0]) if doc_id_sets else set()
        for i in range(1, len(doc_id_sets)):
            op = operators[i - 1] if i - 1 < len(operators) else None
            cur = doc_id_sets[i]
            if op == "AND":
                merged &= cur
            elif op == "OR":
                merged |= cur
            elif op == "NOT":
                merged -= cur

        final: dict[str, dict[str, dict]] = {}
        for r in seg_results:
            for term, docs in r.items():
                filtered = {d: v for d, v in docs.items() if d in merged}
                if filtered:
                    final[term] = filtered
        return final

    # --- calculateRelevance (Ranker.java:55-66) ---
    # IEEE association per the SURVEY 7.4 determinism contract (the
    # reference's own accumulation is multi-threaded and racy, so its
    # ulp-level ordering is not even deterministic): contrib =
    # (tagsum * tf) * idf with tagsum an EXACT sum of the binary-
    # fraction weights — the association the engine's stored/derived
    # wtf column and every generated DuckDB oracle implement, so all
    # three agree bit-for-bit pre-rounding (the reference's per-
    # occurrence weight*(tf*idf) loop agrees in real arithmetic and
    # to <= 1 ulp in doubles).
    @staticmethod
    def _relevance(df: int, tf: float, tags: list[str]) -> float:
        tagsum = sum(tag_weight(t) for t in tags) if tags else 0.5
        return (tagsum * tf) * (IDF_NUMERATOR // df)  # Java int division

    # --- RankDocuments (Ranker.java:168-230) ---
    def _rank_normal(self, term_docs: dict[str, dict[str, dict]]):
        raw: dict[str, float] = {}
        # deterministic: ascending term order, prior multiplied ONCE on
        # the per-doc sum (SURVEY.md 7.4 — the engine's _apply_prior
        # shape; the reference multiplies per term inside its racy
        # accumulation loop, real-arithmetic-equal)
        for term in sorted(term_docs):
            docs = term_docs[term]
            df = len(docs)
            for doc_id in docs:
                info = docs[doc_id]
                tfidf = self._relevance(df, info["tf"], info["tags"])
                if tfidf == 0.0:
                    continue
                raw[doc_id] = raw.get(doc_id, 0.0) + tfidf
        return {d: v * self.prior(d) for d, v in raw.items() if v != 0.0}

    # --- PhraseRank (Ranker.java:295-342): first-term gating (Q7),
    # df = filtered candidate count (Q12) ---
    def _rank_phrase(self, term_docs: dict[str, dict[str, dict]], query_words: list[str]):
        scores: dict[str, float] = {}
        if not query_words or query_words[0] not in term_docs:
            return scores
        for doc_id in term_docs[query_words[0]]:
            total = 0.0
            # NB: the reference iterates the word LIST — duplicate words
            # contribute twice (Ranker.java:311). Sorted for deterministic
            # float association only; duplicates preserved.
            for w in sorted(query_words):
                docs = term_docs.get(w)
                if not docs or doc_id not in docs:
                    continue
                info = docs[doc_id]
                total += self._relevance(len(docs), info["tf"], info["tags"])
            total *= self.prior(doc_id)
            if total == 0.0:
                continue
            scores[doc_id] = total
        return scores

    def search(self, query: str, k: int = 10, with_snippets: bool = False):
        """Full pipeline. Returns list of result dicts sorted by
        (score desc, doc_id asc), top-k."""
        qtype = classify(query)
        if '"' in query:
            query_words = self._extract_words_with_boolean(query)
        else:
            query_words = [_stemmer(w) for w in query_tokenize(query)]

        if qtype == "phrase+boolean":
            term_docs = self._handle_phrase_boolean(query)
        elif qtype == "phrase":
            term_docs = self._handle_phrase(query_words)
        else:
            term_docs = self._handle_normal(query_words)

        if qtype in ("phrase", "phrase+boolean"):
            if qtype == "phrase":
                scoring_words = query_words
            else:
                # PhraseAndBoolRank (Ranker.java:409-424): strip quotes,
                # drop operators, split on single spaces, stem each (Q8)
                scoring_words = []
                for part in split_query(query):
                    if _is_op(part):
                        continue
                    if part.startswith('"') and part.endswith('"'):
                        part = part[1:-1]
                    for w in part.split(" "):
                        scoring_words.append(_stemmer(w.lower()))
            scores = self._rank_phrase(term_docs, scoring_words)
            snippet_words = scoring_words
        else:
            scores = self._rank_normal(term_docs)
            snippet_words = split_query(query)  # raw segments (Ranker.java:202)

        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out = []
        for doc_id, score in ranked:
            d = self.docs[doc_id]
            row = {
                "doc_id": doc_id,
                "url": doc_id,
                "score": score,
                "title": d.get("title"),
            }
            if with_snippets:
                row["snippet"] = generate_snippet(d.get("ps") or [], snippet_words)
            out.append(row)
        return out

    @staticmethod
    def _extract_words_with_boolean(query: str) -> list[str]:
        """extractQueryWordsWithBoolean (QueryProcessor.java:296-309)."""
        words: list[str] = []
        for part in split_query(query):
            if _is_op(part):
                continue
            if part.startswith('"') and part.endswith('"'):
                words.extend(_stemmer(w) for w in query_tokenize(part[1:-1]))
            else:
                words.append(_stemmer(part.lower()))
        return words


# --- Snippeterr (server/src/main/java/ranker/Snippeterr.java) --------------

def generate_snippet(paragraphs: list[str], query_words: list[str]) -> str:
    best, best_score, best_terms = "", -1.0, -1.0
    for p in paragraphs:
        score, n_terms = 0, 0
        pl = p.lower()
        for term in query_words:
            if not term:
                continue
            f = pl.count(term.lower())
            score += f
            if f:
                n_terms += 1
        if len(p) <= SNIPPET_MAX_LEN and (
            n_terms > best_terms or (n_terms == best_terms and score > best_score)
        ):
            best, best_score, best_terms = p, score, n_terms
    for term in query_words:
        if term:
            best = re.sub(
                re.escape(term), lambda m: f"<b>{m.group(0)}</b>", best, flags=re.I
            )
    return best


# --- adapter: transcripts rows -> oracle documents -------------------------

def adapt_rows(rows) -> list[dict]:
    """FIXTURES.md section A: one document per turn."""
    docs = []
    for r in rows:
        docs.append(
            {
                "doc_id": make_doc_id(r["conv_id"], int(r["turn_idx"])),
                "body": r["text"],
                "title": r["tool"],
                "h1s": [r["role"]] if r["role"] else [],
                "ps": _SENTENCE_SPLIT.split(r["text"]) if r["text"] else [],
            }
        )
    return docs
