"""Analyzer unit tests: quirks Q1-Q5 + Q11, and batch==single parity."""

import pandas as pd
import pytest

from apt_search_engine_spark.analysis.analyzer import (
    analyze_batch,
    analyze_doc,
    process_heading_text,
    tag_weight,
)
from apt_search_engine_spark.analysis.porter import MemoStemmer


def test_q1_q2_tf_formula():
    # "spark spark data" -> terms spark(occ 2), data(occ 1)
    # counts: spark=3, data=2 (Q1: occ+1); totalTerms=5 (Q2)
    tm = analyze_doc("spark spark data")
    assert tm["spark"]["tf"] == pytest.approx(3 / 5)
    assert tm["data"]["tf"] == pytest.approx(2 / 5)


def test_q4_prefilter_positions():
    # positions number the PRE-filter split array: stopwords/digits/1-char
    # words occupy slots. "the spark 42 x data" -> spark@1, data@4
    tm = analyze_doc("the spark 42 x data")
    assert tm["spark"]["positions"] == [1]
    assert tm["data"]["positions"] == [4]


def test_leading_punctuation_shifts_positions():
    # Java split yields a leading "" element for leading delimiters;
    # ".spark data" -> ["", "spark", "data"] -> spark@1, data@2
    tm = analyze_doc(".spark data")
    assert tm["spark"]["positions"] == [1]
    assert tm["data"]["positions"] == [2]


def test_q5_apostrophe_stopwords_dead():
    # "can't" splits to "can"/"t": "can" IS a plain stopword entry so it
    # drops, "t" drops by length. But "cant" (no apostrophe) is not in the
    # effective list -> kept.
    tm = analyze_doc("can't cant data")
    assert "cant" in tm
    assert tm["cant"]["positions"] == [2]  # ["can", "t", "cant", "data"]


def test_admission_filter():
    tm = analyze_doc("the 123 a ab spark")
    assert set(tm) == {"ab", "spark"}


def test_empty_doc():
    assert analyze_doc("") == {}
    assert analyze_doc("   ") == {}
    assert analyze_doc(None) == {}


def test_stem_merging():
    # "guides" and "guide" both stem to "guid": one term, merged positions
    tm = analyze_doc("guide guides")
    assert list(tm) == ["guid"]
    assert tm["guid"]["positions"] == [0, 1]
    assert tm["guid"]["tf"] == pytest.approx(3 / 3)


def test_q3_substring_tag_matching():
    # heading "starting" stems to "start"; body term "art" is a SUBSTRING of
    # "start" -> art gets the heading tag even though the heading never
    # contains the word "art" (Tokenizer.java:122-133)
    tm = analyze_doc("art gallery", headings=[("h1", ["starting"])])
    assert tm["art"]["tags"] == ["h1"]
    assert tm["galleri"]["tags"] == ["body"]


def test_tag_overwrite_first_come():
    # two occurrences in heading -> overwrite exactly 2 earliest body tags
    tm = analyze_doc(
        "spark a spark b spark", headings=[("h1", ["spark sparkles"])]
    )
    # processHeadingText("spark sparkles") = "spark sparkl";
    # substring count of "spark" in it = 2
    assert tm["spark"]["tags"] == ["h1", "h1", "body"]


def test_q11_literal_title_channel():
    # Reference fillTags passes the literal string "title" as the title
    # channel text (Tokenizer.java:143): term "titl" (from body "titles")
    # matches; the real title content never does.
    tm = analyze_doc("titles and content", headings=[("title", ["title"])])
    assert tm["titl"]["tags"] == ["title"]


def test_channel_order_precedence():
    # title channel processed before h1: both match, title wins position 0
    tm = analyze_doc(
        "spark spark", headings=[("title", ["spark"]), ("h1", ["spark"])]
    )
    assert tm["spark"]["tags"] == ["title", "h1"]


def test_tag_weights_reference_switch():
    # ranker/Ranker.java:43-52 — note stored tag 'h456' hits default
    assert tag_weight("title") == 4.0
    assert tag_weight("h1") == 2.5
    assert tag_weight("h2") == 2.0
    assert tag_weight("h3") == 1.5
    assert tag_weight("h4") == 1.0
    assert tag_weight("h456") == 0.5  # reference switch has no 'h456' arm
    assert tag_weight("body") == 0.5


def test_process_heading_text():
    s = MemoStemmer()
    assert process_heading_text("The Starting Guide!", s) == "start guid"
    assert process_heading_text("a 123 x", s) == ""


def test_batch_matches_single():
    bodies = [
        "the spark 42 x data",
        "can't cant data",
        "",
        "guide guides travel guide",
        "titles use user",
        "art starting spark spark",
    ]
    tools = ["bash", "", "search", "edit", "", "browse"]
    roles = ["user", "assistant", "system", "user", "assistant", "tool"]
    batch = analyze_batch(
        pd.Series(bodies), pd.Series(["title"] * len(bodies)), pd.Series(roles)
    )
    for i, body in enumerate(bodies):
        headings = [("title", ["title"])]
        if roles[i]:
            headings.append(("h1", [roles[i]]))
        single = analyze_doc(body, headings)
        got = {p["term"]: p for p in batch[i]}
        assert set(got) == set(single), f"row {i}"
        for term, info in single.items():
            assert got[term]["tf"] == pytest.approx(info["tf"]), (i, term)
            assert list(got[term]["positions"]) == info["positions"], (i, term)
            assert list(got[term]["tags"]) == info["tags"], (i, term)


def test_batch_full_heading_channels_match_analyze_doc():
    """T6 over ALL five channels: batch (prefix counts) == per-doc
    oracle (tag overwrite loop), including the sequential remaining-
    positions cap across channels in reference order."""
    bodies = pd.Series(
        [
            "alpha beta alpha gamma delta epsilon",
            "alpha alpha alpha beta",
            "gamma gamma beta beta delta",
            "",
        ]
    )
    chans = {
        "title": pd.Series(["alpha beta", "alpha", "", ""]),
        "h1": pd.Series(["alpha", "alpha alpha", "gamma", "alpha"]),
        "h2": pd.Series(["gamma", "alpha", "beta beta", ""]),
        "h3": pd.Series(["delta", "", "delta", ""]),
        "h456": pd.Series(["epsilon", "beta", "gamma", ""]),
    }
    batch = analyze_batch(bodies, **chans)
    for i, body in enumerate(bodies):
        headings = [(name, [chans[name][i]]) for name in
                    ("title", "h1", "h2", "h3", "h456")]
        want = analyze_doc(body, headings)
        got = {p["term"]: p for p in batch[i]}
        assert set(got) == set(want)
        for term, w in want.items():
            assert got[term]["tags"] == w["tags"], (i, term)
            assert got[term]["tf"] == pytest.approx(w["tf"], rel=1e-12)
            assert got[term]["positions"] == w["positions"]


def test_h456_tag_scores_default_weight():
    # the stored tag is the literal 'h456', which has no arm in the
    # reference weight switch -> DEFAULT 0.5, same as body (Ranker.java:43-52)
    assert tag_weight("h456") == 0.5
    assert tag_weight("h2") == 2.0
    assert tag_weight("h3") == 1.5
