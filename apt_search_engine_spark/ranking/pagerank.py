"""PageRank (SURVEY.md R8) as an iterative DataFrame job + pure oracle.

Reproduces server/src/main/java/ranker/Ranker.java:87-152 exactly,
including its quirks:

  - N = number of FORWARD-graph keys (pages with a stored adjacency row);
    targets that never crawled a row are scored-into but never scored.
  - out-degree counts only links to known pages, DUPLICATES INCLUDED, and
    each duplicate edge contributes separately (multi-edge semantics of
    the reverse adjacency lists, Crawler/Main.java:131-141).
  - dangling mass (rank of pages with zero valid out-links) is
    redistributed uniformly INSIDE the damping term:
    new = (1-d)/N + d * (sum in-contrib + dangling/N).
  - convergence tests the CHANGE of the L1 delta between successive
    iterations (|diff_i - diff_{i-1}| < 0.001, prev init 100 — quirk Q9,
    Ranker.java:142-144), not the delta itself.
  - on convergence the loop breaks BEFORE adopting the new ranks: the
    returned map is one iteration STALE (Ranker.java:142-147). Faithfully
    reproduced; rank ORDER is unaffected in practice but values differ.

The Spark version runs contributions as an edges-join-ranks shuffle per
iteration with the per-iteration scalars (dangling mass, L1 delta)
collected via aggregates; ranks persist each round and localCheckpoint
every few rounds to cut lineage (swap for reliable checkpointing on a
cluster)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

DAMPING = 0.85
CONV_THRESHOLD = 0.001
MAX_ITERS = 100
_CHECKPOINT_EVERY = 8


# ---------------------------------------------------------------- oracle
def pagerank_oracle(url_graph: dict[str, list[str]]) -> dict[str, float]:
    """Line-by-line pure-Python port of Ranker.calculatePageRank, with the
    reverse graph built like Crawler/Main.java:131-141 (duplicates kept)."""
    reverse: dict[str, list[str]] = {}
    for src, outs in url_graph.items():
        for dst in outs:
            reverse.setdefault(dst, []).append(src)

    known = set(url_graph)
    n = len(url_graph)
    ranks = {p: 1.0 / n for p in known}
    out_counts = {
        p: sum(1 for l in (url_graph.get(p) or []) if l in known) for p in known
    }
    prev_diff = 100.0
    for _ in range(MAX_ITERS):
        dangling = sum(ranks[p] for p in known if out_counts.get(p, 0) == 0)
        new_ranks = {}
        for target in known:
            contrib = 0.0
            for src in reverse.get(target, []):
                oc = out_counts.get(src, 0)
                if oc > 0:
                    contrib += ranks[src] / oc
            new_ranks[target] = (1 - DAMPING) / n + DAMPING * (
                contrib + dangling / n
            )
        curr_diff = sum(abs(new_ranks[p] - ranks[p]) for p in known)
        if abs(curr_diff - prev_diff) < CONV_THRESHOLD:
            break  # quirk: new_ranks discarded — stale map returned
        ranks = new_ranks
        prev_diff = curr_diff
    return ranks


# ----------------------------------------------------- fixed-iteration form
def pagerank_fixed(
    spark: SparkSession, adjacency: DataFrame, n_iters: int = 12
) -> DataFrame:
    """Exactly `n_iters` power iterations of the reference recurrence
    (same edges/out-degree/dangling-mass math as `pagerank`, no
    convergence stop). This is the driver-contract surface paired with a
    DuckDB oracle: a fixed iteration count removes the threshold
    comparison whose FP boundary could flip between engines, while the
    quirky stop rule (Q9 + stale-map return) stays verified against the
    line-by-line Python oracle in tests/test_pagerank.py.

    Dangling mass rides a cross-joined aggregate instead of a
    per-iteration collect. Each iteration eagerly localCheckpoints the new
    ranks: the recurrence reads `ranks` TWICE (dangling mass +
    contributions), so a lazy multi-iteration plan doubles per round —
    2^k recomputation between checkpoints. Per-round truncation keeps the
    work linear in n_iters (12 tiny jobs beat one exponential plan)."""
    adjacency = adjacency.select("url", "out_links")
    nodes = adjacency.select("url")
    n = nodes.count()
    if n == 0:
        return spark.createDataFrame([], "url string, rank double")
    edges = (
        adjacency.select("url", F.explode_outer("out_links").alias("dst"))
        .withColumnRenamed("url", "src")
        .join(nodes.withColumnRenamed("url", "dst"), "dst", "left_semi")
    )
    out_counts = (
        nodes.join(
            edges.groupBy("src").agg(F.count("*").alias("oc")),
            nodes.url == F.col("src"),
            "left",
        )
        .select("url", F.coalesce("oc", F.lit(0)).alias("out_count"))
        .persist()
    )
    edges_w = (
        edges.join(out_counts, edges.src == out_counts.url)
        .select("src", "dst", "out_count")
        .persist()
    )
    ranks = nodes.select("url", F.lit(1.0 / n).alias("rank"))
    for i in range(n_iters):
        dang = (
            ranks.join(out_counts, "url")
            .filter(F.col("out_count") == 0)
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        contribs = (
            edges_w.join(ranks, edges_w.src == ranks.url)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("out_count")).alias("c"))
        )
        ranks = (
            nodes.join(contribs, nodes.url == contribs.dst, "left")
            .crossJoin(dang)
            .select(
                "url",
                (
                    F.lit((1 - DAMPING) / n)
                    + F.lit(DAMPING)
                    * (F.coalesce("c", F.lit(0.0)) + F.col("dm") / F.lit(float(n)))
                ).alias("rank"),
            )
        )
        ranks = ranks.localCheckpoint()
    return ranks


def pagerank_fixed_oracle_sql(n_iters: int = 12, limit: int = 512) -> str:
    """DuckDB oracle for the driver's pagerank entry: the SAME
    deterministic toy graph synthesized from the `documents` view (each
    doc links to the next two doc_ids in its source), unrolled
    `n_iters` levels. Damping contracts cross-engine FP sum-order noise
    (~1e-16/iter), so round(rank, 9) is deterministic."""
    lines = [
        f"""
WITH d AS MATERIALIZED (SELECT doc_id::VARCHAR AS url, source FROM documents ORDER BY doc_id LIMIT {limit}),
adj AS MATERIALIZED (
  SELECT url,
         lead(url, 1) OVER (PARTITION BY source ORDER BY url) AS l1,
         lead(url, 2) OVER (PARTITION BY source ORDER BY url) AS l2
  FROM d
),
edges AS MATERIALIZED (
  SELECT url AS src, l1 AS dst FROM adj WHERE l1 IS NOT NULL
  UNION ALL
  SELECT url AS src, l2 AS dst FROM adj WHERE l2 IS NOT NULL
),
nodes AS MATERIALIZED (SELECT url FROM adj),
nn AS MATERIALIZED (SELECT count(*)::DOUBLE AS n FROM nodes),
oc AS MATERIALIZED (
  SELECT nodes.url, count(e.src) AS out_count
  FROM nodes LEFT JOIN edges e ON e.src = nodes.url GROUP BY nodes.url
),
r0 AS MATERIALIZED (SELECT url, 1.0::DOUBLE / (SELECT n FROM nn) AS rank FROM nodes)"""
    ]
    for i in range(1, n_iters + 1):
        p = i - 1
        lines.append(
            f""",
d{i} AS MATERIALIZED (
  SELECT coalesce(sum(r.rank), 0.0::DOUBLE) AS dm
  FROM r{p} r JOIN oc ON oc.url = r.url WHERE oc.out_count = 0
),
c{i} AS MATERIALIZED (
  SELECT e.dst AS url, sum(r.rank / o.out_count) AS c
  FROM edges e JOIN r{p} r ON r.url = e.src JOIN oc o ON o.url = e.src
  GROUP BY e.dst
),
r{i} AS MATERIALIZED (
  SELECT nodes.url,
         (1.0::DOUBLE - {DAMPING}::DOUBLE) / (SELECT n FROM nn)
         + {DAMPING}::DOUBLE * (coalesce(c{i}.c, 0.0::DOUBLE)
                        + (SELECT dm FROM d{i}) / (SELECT n FROM nn)) AS rank
  FROM nodes LEFT JOIN c{i} ON c{i}.url = nodes.url
)"""
        )
    lines.append(f"\nSELECT url, round(rank, 9) AS rank FROM r{n_iters}")
    return "".join(lines)


# ----------------------------------------------------------------- spark
def pagerank(spark: SparkSession, adjacency: DataFrame) -> DataFrame:
    """`adjacency`: (url string, out_links array<string>), one row per
    known page (the URLGraph). Returns (url, rank)."""
    adjacency = adjacency.select("url", "out_links").persist()
    nodes = adjacency.select("url")
    n = nodes.count()
    if n == 0:
        adjacency.unpersist()
        return spark.createDataFrame([], "url string, rank double")

    # multi-edges, restricted to known targets (valid out-degree)
    edges = (
        adjacency.select("url", F.explode_outer("out_links").alias("dst"))
        .withColumnRenamed("url", "src")
        .join(nodes.withColumnRenamed("url", "dst"), "dst", "left_semi")
    )
    out_counts = (
        nodes.join(
            edges.groupBy("src").agg(F.count("*").alias("oc")),
            nodes.url == F.col("src"),
            "left",
        )
        .select("url", F.coalesce("oc", F.lit(0)).alias("out_count"))
        .persist()
    )
    # static per-edge divisor
    edges_w = (
        edges.join(out_counts, edges.src == out_counts.url)
        .select("src", "dst", "out_count")
        .persist()
    )

    ranks = nodes.select("url", F.lit(1.0 / n).alias("rank")).persist()
    # uniform init makes the first dangling mass a count, not a sum; every
    # later iteration's dangling sum rides the convergence aggregate below
    # (one driver action per iteration, not two)
    dangling = out_counts.filter("out_count = 0").count() / n
    prev_diff = 100.0
    for i in range(MAX_ITERS):
        contribs = (
            edges_w.join(ranks, edges_w.src == ranks.url)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("out_count")).alias("c"))
        )
        new_ranks = (
            nodes.join(contribs, nodes.url == contribs.dst, "left")
            .select(
                "url",
                (
                    F.lit((1 - DAMPING) / n)
                    + F.lit(DAMPING)
                    * (F.coalesce("c", F.lit(0.0)) + F.lit(dangling / n))
                ).alias("rank"),
            )
            .persist()
        )
        if i % _CHECKPOINT_EVERY == _CHECKPOINT_EVERY - 1:
            new_ranks = new_ranks.localCheckpoint()
        stats = (
            new_ranks.join(ranks.withColumnRenamed("rank", "old"), "url")
            .join(out_counts, "url")
            .agg(
                F.sum(F.abs(F.col("rank") - F.col("old"))).alias("diff"),
                F.coalesce(
                    F.sum(F.when(F.col("out_count") == 0, F.col("rank"))),
                    F.lit(0.0),
                ).alias("next_dangling"),
            )
            .collect()[0]
        )
        curr_diff = stats["diff"]
        if abs(curr_diff - prev_diff) < CONV_THRESHOLD:
            new_ranks.unpersist()
            break  # quirk-faithful: keep the STALE ranks
        ranks.unpersist()
        ranks = new_ranks
        prev_diff = curr_diff
        dangling = stats["next_dangling"]
    adjacency.unpersist()
    out_counts.unpersist()
    edges_w.unpersist()
    return ranks
