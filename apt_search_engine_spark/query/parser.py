"""Query parsing: classification, tokenization, boolean splitting.

Mirrors server/src/main/java/processor/QueryProcessor.java:32-38 (classify),
processor/Tokenizer.java:7-23 (tokenize — deliberately NO stopword/length/
digit filter, unlike the index side: a stopword-only query finds nothing
because stopwords were never indexed), and QueryProcessor.java:284-309
(splitQuery / extractQueryWordsWithBoolean).

Boolean detection is case-INsensitive (:116-119) but the split regex only
matches uppercase ' AND | OR | NOT ' (:285) — reproduced as-is: 'x and y'
classifies as boolean yet stays one segment.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from apt_search_engine_spark.analysis.porter import MemoStemmer

_stemmer = MemoStemmer()

_CLEAN = re.compile(r"[^a-z0-9\s]")
_WS = re.compile(r"\s+")
# Java lookaround split, rewritten with fixed-width lookbehind branches for
# Python's re; split points are identical.
_BOOL_SPLIT = re.compile(r"(?= AND | OR | NOT )|(?<= AND )|(?<= OR )|(?<= NOT )")

OPERATORS = ("AND", "OR", "NOT")

# Extension query syntax (NOT in the reference grammar) recognized by the
# serving/CLI layers before the reference parser runs: `pre*` (prefix
# expansion), `word~1` / `word~2` (fuzzy), `w1 NEAR/3 w2` (unordered
# proximity, slop 1-99). One bare term per wildcard; all case-insensitive
# (match groups should be lowercased before hitting the engine — the
# vocabulary is lowercase by analysis).
MULTITERM_RE = re.compile(r"([a-z0-9]+)(?:(\*)|~([12]))", re.I)
NEAR_RE = re.compile(r"([a-z0-9]+)\s+NEAR/([1-9][0-9]?)\s+([a-z0-9]+)", re.I)
# Sloppy phrase `"w1 w2"~k` (Lucene PhraseQuery with slop, two-word
# form): ordered proximity — w1 must precede w2 within k positions.
SLOPPY_RE = re.compile(
    r'"\s*([a-z0-9]+)\s+([a-z0-9]+)\s*"~([1-9][0-9]?)', re.I
)
# N-word sloppy phrase `"w1 w2 w3 ..."~k` (>= 3 words): Lucene
# PhraseQuery slop over in-order chains — span excess <= k
# (engine.search_sloppy_df; k=0 is excluded here because `~0` is the
# exact phrase, which the plain quoted syntax already serves).
SLOPPY_N_RE = re.compile(
    r'"\s*([a-z0-9]+(?:\s+[a-z0-9]+){2,})\s*"~([1-9][0-9]?)', re.I
)
# General wildcard pattern (`te*t`, `t?st`, `*ing`): `*` = any run, `?` =
# any single char, anywhere in the term. The trailing-star-only shape
# (`pre*`) is dispatched to the cheaper prefix path by MULTITERM_RE
# first, so this matches only patterns the prefix rewrite can't serve.
# Requires at least one wildcard AND at least one literal char (a bare
# `*` / `??` would be an unbounded vocabulary dump, not a query).
WILDCARD_RE = re.compile(
    r"(?=[a-z0-9*?]*[*?])(?=[*?]*[a-z0-9])[a-z0-9*?]+", re.I
)


def stem(word: str) -> str:
    """Reference Stemmer.stem lowercases before stemming
    (processor/Stemmer.java:9)."""
    return _stemmer(word.lower())


def tokenize(q: str) -> list[str]:
    cleaned = _CLEAN.sub(" ", q.lower()).strip()
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


def is_operator(part: str) -> bool:
    return part.upper() in OPERATORS


def extract_operators(parts: list[str]) -> list[str]:
    return [p.upper() for p in parts if is_operator(p)]


@dataclass
class ParsedQuery:
    raw: str
    qtype: str            # normal | normal+boolean | phrase | phrase+boolean
    query_words: list[str]  # stemmed, in order (duplicates preserved)
    segments: list[str]     # raw operator-split segments (incl. operators)

    @property
    def scoring_words(self) -> list[str]:
        """Words the ranker iterates for phrase-family queries
        (Ranker.java:399-424, quirk Q8: boolean structure discarded)."""
        if self.qtype == "phrase":
            return self.query_words
        words: list[str] = []
        for part in self.segments:
            if is_operator(part):
                continue
            if part.startswith('"') and part.endswith('"'):
                part = part[1:-1]
            words.extend(stem(w) for w in part.split(" "))
        return words


def parse(query: str) -> ParsedQuery:
    qtype = classify(query)
    segments = split_query(query)
    if '"' in query:
        words: list[str] = []
        for part in segments:
            if is_operator(part):
                continue
            if part.startswith('"') and part.endswith('"'):
                words.extend(stem(w) for w in tokenize(part[1:-1]))
            else:
                words.append(stem(part))
        query_words = words
    else:
        query_words = [stem(w) for w in tokenize(query)]
    return ParsedQuery(raw=query, qtype=qtype, query_words=query_words, segments=segments)
