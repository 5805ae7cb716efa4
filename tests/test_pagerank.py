"""PageRank parity: Spark DataFrame job vs the pure-Python port of
Ranker.calculatePageRank (quirks: multi-edges, valid-out-degree, dangling
mass in the damping term, successive-delta convergence Q9, stale-return)."""

from __future__ import annotations

import random

import pytest

from apt_search_engine_spark.ranking.pagerank import pagerank, pagerank_oracle

# the commented-out 3-page fixture from server/src/main/java/ranker/main.java:59-64
F1_GRAPH = {
    "www.f1.com": ["www.f2.com", "www.f13.com"],
    "www.f2.com": ["www.f13.com", "www.f1.com"],
    "www.f13.com": ["www.f1.com"],
}


def _spark_ranks(spark, graph):
    adj = spark.createDataFrame(
        [(u, v) for u, v in graph.items()], "url string, out_links array<string>"
    )
    return {r.url: r.rank for r in pagerank(spark, adj).collect()}


def test_reference_toy_graph(spark):
    want = pagerank_oracle(F1_GRAPH)
    got = _spark_ranks(spark, F1_GRAPH)
    assert set(got) == set(want)
    for u in want:
        assert got[u] == pytest.approx(want[u], rel=1e-9), u
    # sanity: ranks sum to ~1 and f1 (most inbound) wins
    assert sum(want.values()) == pytest.approx(1.0, abs=0.05)
    assert max(want, key=want.get) == "www.f1.com"


def test_random_multigraph_with_dangling_and_unknown_targets(spark):
    rng = random.Random(7)
    pages = [f"p{i}" for i in range(40)]
    graph = {}
    for p in pages:
        outs = []
        for _ in range(rng.randint(0, 6)):
            outs.append(rng.choice(pages))          # may duplicate: multi-edge
        if rng.random() < 0.2:
            outs.append(f"unknown{rng.randint(0, 5)}")  # link to uncrawled page
        if rng.random() < 0.15:
            outs = []                                # dangling page
        graph[p] = outs
    want = pagerank_oracle(graph)
    got = _spark_ranks(spark, graph)
    assert set(got) == set(want)
    for u in want:
        assert got[u] == pytest.approx(want[u], rel=1e-9), u


def test_oracle_quirks():
    # single page, no links: dangling mass returns to itself
    r = pagerank_oracle({"a": []})
    assert r["a"] == pytest.approx(1.0)
    # two pages, one-way multi-edge: duplicates must not change a single
    # source's contribution (it is split by its own out-degree)
    r2 = pagerank_oracle({"a": ["b", "b"], "b": []})
    r2_single = pagerank_oracle({"a": ["b"], "b": []})
    # duplicates double the contribution terms AND the out-degree, canceling:
    assert r2["b"] == pytest.approx(r2_single["b"], rel=1e-9)


def test_hits_star_graph_and_empty(spark):
    """HITS sanity on a star graph (hub h points at three leaves): the
    hub concentrates all hub mass (hub=1), leaves split authority
    equally (1/sqrt(3) each), and leaves have hub 0 / the hub authority
    0. Empty adjacency returns an empty frame instead of dividing by a
    zero norm."""
    import math

    from apt_search_engine_spark.ranking.hits import hits_fixed

    adj = spark.createDataFrame(
        [("h", ["a", "b", "c"]), ("a", []), ("b", []), ("c", [])],
        "url string, out_links array<string>",
    )
    got = {r.url: (r.authority, r.hub) for r in hits_fixed(spark, adj, 4).collect()}
    third = round(1 / math.sqrt(3), 9)
    assert got["h"] == (0.0, 1.0)
    assert got["a"] == got["b"] == got["c"] == (third, 0.0)

    empty = spark.createDataFrame([], "url string, out_links array<string>")
    assert hits_fixed(spark, empty, 4).count() == 0
