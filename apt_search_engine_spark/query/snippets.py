"""Snippet generation (server/src/main/java/ranker/Snippeterr.java).

Runs driver-side over the top-k rows only (k <= tens) — deliberately off
the distributed hot path, like the reference generates snippets only for
docs entering the result set (Ranker.java:202).

Selection: among paragraphs of length <= 1000, maximize (number of distinct
query words present, then total case-insensitive substring frequency);
every match is wrapped in <b>...</b> (Snippeterr.java:14-90).
"""

from __future__ import annotations

import re

from apt_search_engine_spark.config import SNIPPET_MAX_LEN

_SENTENCE_SPLIT = re.compile(r"(?<=[.!?])\s+")


def split_paragraphs(text: str) -> list[str]:
    """Transcript analog of the reference's `ps` paragraph list
    (FIXTURES.md section A): sentence-split the turn text."""
    return _SENTENCE_SPLIT.split(text) if text else []


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
