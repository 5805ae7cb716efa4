"""Document analyzer: T1-T6 of SURVEY.md section 2.2, batch-vectorized.

Reimplements, over Arrow/pandas batches, what the reference computes per
document in server/src/main/java/Indexer/Tokenizer.java:

  T1 normalize+split   (:37-38,90)     lower, [^a-z0-9]->space, split \\s+
  T2 positions         (:92,110)       index in the PRE-filter split array
  T3 admission filter  (:95)           drop len<=1 | all-digits | stopword
  T4 Porter stem       (:98-104)       memoized; empty stem -> drop
  T5 tf                (:108-116)      count = occurrences+1 (quirk Q1);
                                       totalTerms = kept positions +
                                       distinct terms (quirk Q2);
                                       tf = count/totalTerms
  T6 tags              (:135-192)      'body' default; heading channels
                                       overwrite by SUBSTRING count of the
                                       stem in the stem-processed heading
                                       text (quirk Q3), earliest positions
                                       first, channel order title,h1,h2,h3,
                                       h456

Java split() semantics note: a leading delimiter yields a leading empty
token (which then occupies position 0 and is dropped by the length filter);
Python's re.split does the same, so positions line up bit-for-bit.

The same function body serves the pure-Python oracle (tests/oracle.py runs
it one document at a time) and the Spark index build (pandas UDF runs it
one Arrow batch at a time) — parity by construction.
"""

from __future__ import annotations

import re
from typing import Iterable, Sequence

import numpy as np
import pandas as pd

from .porter import MemoStemmer
from .stopwords import STOPWORDS

_SPLIT_RE = re.compile(r"\s+")
_DIGITS_RE = re.compile(r"\d+")

# Heading channels in the order the reference applies them
# (server/src/main/java/Indexer/Tokenizer.java:143-171). Tag weights at
# ranker/Ranker.java:43-52 — note the stored tag for the h4/h5/h6 bucket is
# the string 'h456' (Tokenizer.java:169), which falls through to the
# DEFAULT arm of the weight switch; see TAG_WEIGHTS below.
HEADING_CHANNELS = ("title", "h1", "h2", "h3", "h456")

TAG_WEIGHTS = {
    "title": 4.0,
    "h1": 2.5,
    "h2": 2.0,
    "h3": 1.5,
    "h4": 1.0,
    "h5": 1.0,
    "h6": 1.0,
    # every other tag -- including 'body' AND the literal 'h456' the indexer
    # writes (reference switch has no 'h456' arm) -- scores the default:
}
DEFAULT_TAG_WEIGHT = 0.5


def tag_weight(tag: str) -> float:
    return TAG_WEIGHTS.get(tag.lower(), DEFAULT_TAG_WEIGHT)


def normalize_split(text: str) -> list[str]:
    """T1 for one string: lower, non-alnum -> space, split on whitespace."""
    return _SPLIT_RE.split(re.sub(r"[^a-z0-9]", " ", text.lower()))


def _admit(word: str) -> bool:
    """T3: keep a raw token?"""
    return len(word) > 1 and not _DIGITS_RE.fullmatch(word) and word not in STOPWORDS


def process_heading_text(text: str, stemmer) -> str:
    """Reference processHeadingText (Tokenizer.java:42-65): T1+T3+T4 on a
    heading string, kept stems joined by single spaces."""
    out = []
    for w in normalize_split(text):
        if not _admit(w):
            continue
        s = stemmer(w)
        if s:
            out.append(s)
    return " ".join(out)


def _count_substring(text: str, word: str) -> int:
    """Reference countWordOccurrences (Tokenizer.java:122-133): left-to-right
    non-overlapping substring count == str.count."""
    return text.count(word) if word else 0


def analyze_doc(
    body: str,
    headings: Sequence[tuple[str, Iterable[str]]] = (),
    stemmer=None,
) -> dict[str, dict]:
    """Analyze ONE document. Returns {term: {tf, positions, tags}}.

    `headings` is an ordered sequence of (tag_name, texts) pairs, e.g.
    [("title", ["bash"]), ("h1", ["assistant"])]. Empty body -> {} (T7,
    Indexer.java:210-214).
    """
    if stemmer is None:
        stemmer = MemoStemmer()
    if body is None or not body.strip():
        return {}

    words = normalize_split(body)
    token_map: dict[str, dict] = {}
    for i, w in enumerate(words):
        if not _admit(w):
            continue
        s = stemmer(w)
        if not s:
            continue
        t = token_map.get(s)
        if t is None:
            # quirk Q1: constructor count=1 AND increment on first hit
            token_map[s] = t = {"count": 1.0, "positions": []}
        t["count"] += 1.0
        t["positions"].append(i)

    # quirk Q2: totalTerms = sum of int(count) = kept positions + n terms
    total_terms = sum(int(t["count"]) for t in token_map.values())
    if total_terms > 0:
        for t in token_map.values():
            t["count"] = t["count"] / total_terms

    # T6 tags
    for t in token_map.values():
        t["tags"] = ["body"] * len(t["positions"])
    for tag_name, texts in headings:
        for text in texts:
            if not text:
                continue
            processed = process_heading_text(text, stemmer)
            for term, t in token_map.items():
                n = _count_substring(processed, term)
                if n > 0:
                    replaced = 0
                    tags = t["tags"]
                    for i in range(len(tags)):
                        if replaced >= n:
                            break
                        if tags[i] == "body":
                            tags[i] = tag_name
                            replaced += 1

    return {
        term: {"tf": t["count"], "positions": t["positions"], "tags": t["tags"]}
        for term, t in token_map.items()
    }


# ---------------------------------------------------------------------------
# Batch path (Arrow/pandas) — used inside the Spark index build UDF.
# ---------------------------------------------------------------------------

def analyze_batch(
    bodies: pd.Series,
    title: pd.Series | None = None,
    h1: pd.Series | None = None,
) -> list[list[dict]]:
    """Analyze a batch of documents with cross-document vectorization.

    Tokenization, admission filtering and unique-term stemming are
    vectorized across the whole batch (pandas C string ops + one stem call
    per DISTINCT raw token in the batch — the reference's memo-cache trick,
    Tokenizer.java:40,98-104, amortized further). Per-document tag
    assignment (T6) runs on the small per-doc term maps.

    Returns, per input row, a list of posting dicts
    {term, tf, positions, tags} (empty list for blank bodies).
    """
    n = len(bodies)
    stemmer = MemoStemmer()
    b = bodies.fillna("").astype(str)
    nonblank = b.str.strip().str.len() > 0  # T7
    norm = b.str.lower().str.replace(r"[^a-z0-9]", " ", regex=True)
    split = norm.str.split(r"\s+")

    lens = np.fromiter((len(x) if ok else 0 for x, ok in zip(split, nonblank)), dtype=np.int64, count=n)
    total = int(lens.sum())
    if total == 0:
        return [[] for _ in range(n)]

    flat = np.empty(total, dtype=object)
    doc_idx = np.repeat(np.arange(n), lens)
    off = 0
    for i in range(n):
        if lens[i]:
            flat[off : off + lens[i]] = split.iat[i]
            off += lens[i]
    starts = np.zeros(n, dtype=np.int64)
    starts[1:] = np.cumsum(lens)[:-1]
    pos = np.arange(total) - starts[doc_idx]

    toks = pd.Series(flat)
    # T3 vectorized: length > 1, not all digits, not stopword
    keep = (
        (toks.str.len() > 1)
        & ~toks.str.fullmatch(r"\d+", na=False)
        & ~toks.isin(STOPWORDS)
    ).to_numpy()

    toks_k = toks[keep]
    doc_k = doc_idx[keep]
    pos_k = pos[keep]

    # T4: stem once per distinct raw token in the batch
    codes, uniques = pd.factorize(toks_k)
    stemmed_u = np.array([stemmer(u) for u in uniques], dtype=object)
    stems = stemmed_u[codes] if len(codes) else np.empty(0, dtype=object)
    nonempty = np.array([s != "" for s in stems], dtype=bool)
    doc_k, pos_k, stems = doc_k[nonempty], pos_k[nonempty], stems[nonempty]

    # group by (doc, term); pos_k is already in encounter order per doc
    df = pd.DataFrame({"doc": doc_k, "term": stems, "pos": pos_k})
    grouped = df.groupby(["doc", "term"], sort=False)["pos"].agg(list)

    # per-doc totals (quirks Q1/Q2): kept positions + distinct terms
    per_doc: list[dict[str, dict]] = [dict() for _ in range(n)]
    for (d, term), positions in grouped.items():
        per_doc[d][term] = {"count": float(len(positions) + 1), "positions": positions}

    results: list[list[dict]] = []
    for i in range(n):
        tm = per_doc[i]
        if not tm:
            results.append([])
            continue
        total_terms = sum(int(t["count"]) for t in tm.values())
        headings: list[tuple[str, list[str]]] = []
        if title is not None and isinstance(title.iat[i], str) and title.iat[i]:
            headings.append(("title", [title.iat[i]]))
        if h1 is not None and isinstance(h1.iat[i], str) and h1.iat[i]:
            headings.append(("h1", [h1.iat[i]]))
        for t in tm.values():
            t["tags"] = ["body"] * len(t["positions"])
        for tag_name, texts in headings:
            for text in texts:
                processed = process_heading_text(text, stemmer)
                for term, t in tm.items():
                    c = _count_substring(processed, term)
                    if c > 0:
                        replaced = 0
                        tags = t["tags"]
                        for j in range(len(tags)):
                            if replaced >= c:
                                break
                            if tags[j] == "body":
                                tags[j] = tag_name
                                replaced += 1
        results.append(
            [
                {
                    "term": term,
                    "tf": t["count"] / total_terms,
                    "positions": t["positions"],
                    "tags": t["tags"],
                }
                for term, t in tm.items()
            ]
        )
    return results
