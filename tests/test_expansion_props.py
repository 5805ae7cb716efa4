"""Property tests for the multi-term expansion primitives: the glob ->
LIKE translation must agree with Python's fnmatch semantics on the
vocabulary character set, and the fuzzy length band must never exclude a
true within-distance candidate (it is a NECESSARY condition)."""

from __future__ import annotations

import fnmatch
import re

from hypothesis import given, settings, strategies as st

from apt_search_engine_spark.query.engine import SearchEngine

_TERM = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=12)
_PATTERN = st.text(alphabet="abcz019*?", min_size=1, max_size=8)


def _like_match(like: str, term: str) -> bool:
    # reference implementation of SQL LIKE over [a-z0-9] terms:
    # % = any run, _ = one char (no escapes needed on this alphabet)
    rex = "".join(
        ".*" if c == "%" else "." if c == "_" else re.escape(c) for c in like
    )
    return re.fullmatch(rex, term) is not None


@settings(max_examples=300, deadline=None)
@given(pattern=_PATTERN, term=_TERM)
def test_glob_to_like_matches_fnmatch(pattern, term):
    like = SearchEngine._glob_to_like(pattern)
    # fnmatch's * / ? are exactly the glob semantics the engine documents
    assert _like_match(like, term) == fnmatch.fnmatchcase(term, pattern)


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(max_examples=300, deadline=None)
@given(a=_TERM, b=_TERM, d=st.integers(min_value=0, max_value=3))
def test_length_band_is_necessary_for_edit_distance(a, b, d):
    """|len(a) - len(b)| <= d is implied by levenshtein(a,b) <= d — the
    pre-filter the fuzzy and spell paths use can only remove true
    negatives."""
    if _levenshtein(a, b) <= d:
        assert abs(len(a) - len(b)) <= d


@settings(max_examples=100, deadline=None)
@given(pattern=st.text(alphabet="*?", min_size=1, max_size=4))
def test_pure_wildcard_patterns_refused(pattern):
    """Patterns with no literal character are vocabulary dumps, not
    queries — expand_wildcard contracts to return nothing for them
    (checked here via the same strip rule, engine-side behavior pinned
    in tests/test_multiterm.py)."""
    assert not pattern.strip("*?")
