"""Porter stemmer, Snowball variant — pure-Python, dependency-free.

The reference stems with ``org.tartarus.snowball.ext.PorterStemmer``
(lucene-analyzers-common 8.11.2; wrapper at
server/src/main/java/processor/Stemmer.java:3-12).  That class implements
the *Snowball* edition of the 1980 Porter algorithm, which departs from the
published paper in three documented ways, all reproduced here:

1. The ``y``-as-vowel rule is implemented by consonant-marking: an initial
   ``y`` and any ``y`` immediately following a vowel are treated as
   consonants (marked ``Y``); every other ``y`` is a vowel.
2. Step 2 uses ``(m>0) bli -> ble`` instead of the paper's ``abli -> able``.
3. Step 2 adds ``(m>0) logi -> log``.

The implementation mirrors the structure of Snowball's ``porter.sbl``:
regions ``p1``/``p2`` are computed once on the ``Y``-marked word and suffix
rules test region membership, which is equivalent to the paper's measure
conditions (m>0 == suffix inside R1, m>1 == inside R2).

No third-party stemmer package exists in this environment, hence the
vendored implementation.  It is shared verbatim by the Spark analyzer UDF
(apt_search_engine_spark/analysis/analyzer.py) and the pure-Python oracle
(tests/oracle.py), so engine-vs-oracle stemming parity holds by
construction; golden vectors in tests/test_porter.py guard the algorithm
itself.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouy")  # lowercase y == vowel; marked 'Y' == consonant


def _mark_ys(word: str) -> str:
    """Consonant-mark: initial y and y-after-vowel become 'Y'."""
    if "y" not in word:
        return word
    out = []
    prev_vowel = False
    for i, ch in enumerate(word):
        if ch == "y" and (i == 0 or prev_vowel):
            out.append("Y")
            prev_vowel = False
        else:
            out.append(ch)
            prev_vowel = ch in _VOWELS
    return "".join(out)


def _past_vc(word: str, start: int) -> int:
    """Snowball `gopast v  gopast non-v`: position just past the first
    non-vowel that follows the first vowel at/after `start`; len(word) if
    no such transition exists."""
    n = len(word)
    i = start
    while i < n and word[i] not in _VOWELS:
        i += 1
    if i == n:
        return n
    i += 1  # past the first vowel
    while i < n and word[i] in _VOWELS:
        i += 1
    if i == n:
        return n
    return i + 1  # past the first non-vowel after it


def _regions(word: str) -> tuple[int, int]:
    """Snowball p1/p2. A suffix lying entirely at/after p1 satisfies m>0
    for the remaining stem; at/after p2 satisfies m>1."""
    p1 = _past_vc(word, 0)
    p2 = _past_vc(word, p1)
    return p1, p2


class _Stem:
    __slots__ = ("w", "p1", "p2")

    def __init__(self, word: str):
        self.w = _mark_ys(word)
        self.p1, self.p2 = _regions(self.w)

    # -- condition helpers (all relative to current self.w) ----------------
    def _in_r1(self, suffix_len: int) -> bool:
        return len(self.w) - suffix_len >= self.p1

    def _in_r2(self, suffix_len: int) -> bool:
        return len(self.w) - suffix_len >= self.p2

    def _has_vowel_before(self, suffix_len: int) -> bool:
        return any(c in _VOWELS for c in self.w[: len(self.w) - suffix_len])

    def _short_v(self, end: int | None = None) -> bool:
        """Snowball shortv at position `end` (default: end of word):
        ...non-v, v, non-v_WXY reading left-to-right, ending at `end`."""
        w = self.w if end is None else self.w[:end]
        if len(w) < 3:
            return False
        c3, c2, c1 = w[-3], w[-2], w[-1]
        return (
            c3 not in _VOWELS
            and c2 in _VOWELS
            and c1 not in _VOWELS
            and c1 not in "wxY"
        )

    # -- steps --------------------------------------------------------------
    def step1a(self) -> None:
        w = self.w
        if w.endswith("sses"):
            self.w = w[:-2]
        elif w.endswith("ies"):
            self.w = w[:-2]
        elif w.endswith("ss"):
            pass
        elif w.endswith("s"):
            self.w = w[:-1]

    def step1b(self) -> None:
        w = self.w
        if w.endswith("eed"):
            if self._in_r1(3):
                self.w = w[:-1]
            return
        if w.endswith("ed") and self._has_vowel_before(2):
            stem = w[:-2]
        elif w.endswith("ing") and self._has_vowel_before(3):
            stem = w[:-3]
        else:
            return
        self.w = stem
        if stem.endswith(("at", "bl", "iz")):
            self.w = stem + "e"
        elif stem[-2:] in ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt"):
            self.w = stem[:-1]
        elif len(stem) == self.p1 and self._short_v():
            # cursor exactly at p1 (m==1) and *o  ->  add e
            self.w = stem + "e"

    def step1c(self) -> None:
        w = self.w
        if w and w[-1] in "yY" and any(c in _VOWELS for c in w[:-1]):
            self.w = w[:-1] + "i"

    _STEP2 = (
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("bli", "ble"),  # snowball: bli->ble
        ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
        ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
        ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
        ("biliti", "ble"), ("logi", "log"),  # snowball addition
    )

    _STEP3 = (
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    )

    _STEP4 = (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    )

    def _longest(self, rules) -> tuple[str, str] | None:
        """Longest-suffix match first (Snowball `among` semantics)."""
        best = None
        for suf, rep in rules:
            if self.w.endswith(suf) and (best is None or len(suf) > len(best[0])):
                best = (suf, rep)
        return best

    def step2(self) -> None:
        m = self._longest(self._STEP2)
        if m and self._in_r1(len(m[0])):
            self.w = self.w[: -len(m[0])] + m[1]

    def step3(self) -> None:
        m = self._longest(self._STEP3)
        if m and self._in_r1(len(m[0])):
            self.w = self.w[: -len(m[0])] + m[1]

    def step4(self) -> None:
        best = None
        for suf in self._STEP4:
            if self.w.endswith(suf) and (best is None or len(suf) > len(best)):
                best = suf
        if best is None:
            return
        if best == "ion":
            # (m>1) (*S or *T) ION ->
            if self._in_r2(3) and len(self.w) > 3 and self.w[-4] in "st":
                self.w = self.w[:-3]
        elif self._in_r2(len(best)):
            self.w = self.w[: -len(best)]

    def step5a(self) -> None:
        if self.w.endswith("e"):
            if self._in_r2(1) or (self._in_r1(1) and not self._short_v(len(self.w) - 1)):
                self.w = self.w[:-1]

    def step5b(self) -> None:
        if self.w.endswith("ll") and self._in_r2(1):
            self.w = self.w[:-1]

    def result(self) -> str:
        return self.w.replace("Y", "y")


def stem(word: str) -> str:
    """Stem one lowercase token. Words of length <= 2 are returned as-is
    (Snowball porter bails out below 3 characters)."""
    if len(word) <= 2:
        return word
    s = _Stem(word)
    s.step1a()
    s.step1b()
    s.step1c()
    s.step2()
    s.step3()
    s.step4()
    s.step5a()
    s.step5b()
    return s.result()


class MemoStemmer:
    """Memoizing wrapper mirroring the reference's per-process stem cache
    (server/src/main/java/Indexer/Tokenizer.java:40,98-104)."""

    def __init__(self):
        self._cache: dict[str, str] = {}

    def __call__(self, word: str) -> str:
        c = self._cache.get(word)
        if c is None:
            c = stem(word)
            self._cache[word] = c
        return c
