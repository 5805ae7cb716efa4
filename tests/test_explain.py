"""Score explanation (engine.explain — Lucene IndexSearcher.explain
analog): the per-term breakdown must reproduce the ranked plan's score
BIT-EXACTLY for every query type, and the structural fields (df, idf,
multiplicity, gate) must match the oracle's semantics."""

from __future__ import annotations

import json
import threading
import urllib.parse
import urllib.request

import pytest

from apt_search_engine_spark.config import IDF_NUMERATOR


QUERIES = [
    "travel guide",
    '"travel guide"',
    '"travel guide" AND europe',
    "travel travel guide",  # duplicate word -> multiplicity 2
]


@pytest.mark.parametrize("query", QUERIES)
def test_explain_reproduces_ranked_scores_bit_exact(engine, query):
    top = engine.search_df(query, k=5).collect()
    assert top, f"query {query!r} must match on the seeded corpus"
    for r in top:
        exp = engine.explain(query, r.doc_id)
        assert exp["matched"], exp
        assert exp["score"] == r.score  # bit-exact, not approx
        # contributions fold to the pre-prior raw in ascending term order
        raw = 0.0
        for d in exp["terms"]:
            assert d["idf"] == float(IDF_NUMERATOR // d["df"])
            assert d["contrib"] == d["wtf"] * d["idf"] * d["multiplicity"]
            raw += d["contrib"]
        assert raw * exp["prior"] == r.score
        terms = [d["term"] for d in exp["terms"]]
        assert terms == sorted(terms)


def test_explain_multiplicity_and_nonmatching_doc(engine, oracle):
    # normal queries dedupe words (reference handleNormal); duplicates
    # multiply only in phrase-family scoring words (quirk Q8,
    # Ranker.java:311) — '"travel guide" AND travel' flattens to
    # [travel, guid, travel]
    q = '"travel guide" AND travel'
    top = engine.search_df(q, k=1).collect()
    assert top
    exp = engine.explain(q, top[0].doc_id)
    mult = {d["term"]: d["multiplicity"] for d in exp["terms"]}
    assert mult.get("travel") == 2
    assert exp["score"] == top[0].score
    # a doc without the terms: no match, zero score
    miss = engine.explain("travel guide", "no#such#doc")
    assert not miss["matched"] and miss["score"] == 0.0 and miss["terms"] == []


def test_explain_gate_failure(engine, oracle):
    """A doc containing only the non-first phrase words fails the Q7
    gate and must explain as gate_failed, matching its absence from the
    ranked results."""
    q = '"travel guide"'
    parsed_first = "travel"
    # find a doc with 'guid' but not 'travel' (stems)
    guid_docs = set(oracle.inverted.get("guid", {}))
    travel_docs = set(oracle.inverted.get(parsed_first, {}))
    only_guid = sorted(guid_docs - travel_docs)
    if not only_guid:
        pytest.skip("corpus lacks a guid-without-travel doc")
    exp = engine.explain(q, only_guid[0])
    assert not exp["matched"] and exp["score"] == 0.0


def test_explain_endpoint(engine):
    from apt_search_engine_spark.jobs.serve import serve

    httpd = serve(engine, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        top = engine.search_df("travel guide", k=1).collect()
        qs = urllib.parse.urlencode(
            {"query": "travel guide", "doc": top[0].doc_id}
        )
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/explain?{qs}", timeout=120
        ) as r:
            body = json.loads(r.read())
        assert body["matched"] and body["score"] == top[0].score
        assert body["terms"] and all(
            {"term", "df", "idf", "wtf", "contrib"} <= set(d)
            for d in body["terms"]
        )
    finally:
        httpd.shutdown()
