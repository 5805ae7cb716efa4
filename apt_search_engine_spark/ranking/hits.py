"""HITS (hubs & authorities, Kleinberg 1999) as a fixed-iteration
DataFrame job — the second iterative graph ranking next to PageRank
(`ranking/pagerank.py`), exercising the alternating two-score update
with per-iteration L2 normalization that PageRank's single stochastic
recurrence does not.

Scale/parity design mirrors pagerank_fixed: static edge frames persisted
once; each half-iteration is one hash join + map-side-combined groupBy;
per-iteration localCheckpoint truncates the doubling lazy plan (each
score frame is read twice: by the opposite update and by its own norm).
Normalization sums are cross-joined single-row aggregates, never driver
collects. FP parity: both engines sum doubles in different orders
(~1e-16 relative per iteration, not amplified because every iteration
renormalizes), so the final round(…, 9) is deterministic cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _edges(adjacency: DataFrame):
    nodes = adjacency.select("url")
    edges = (
        adjacency.select("url", F.explode_outer("out_links").alias("dst"))
        .withColumnRenamed("url", "src")
        .join(nodes.withColumnRenamed("url", "dst"), "dst", "left_semi")
        .filter(F.col("dst").isNotNull())
    )
    return nodes, edges


def hits_fixed(
    spark: SparkSession, adjacency: DataFrame, n_iters: int = 8
) -> DataFrame:
    """Exactly `n_iters` HITS iterations over (url, out_links array):
    auth(v) = sum of hub over in-edges, hub(u) = sum of auth over
    out-edges, each L2-normalized. Returns (url, authority, hub),
    rounded to 9 dp. Nodes with no in-edges have authority 0 (exact on
    both engines); empty graphs return all-zero scores rather than
    dividing by a zero norm."""
    adjacency = adjacency.select("url", "out_links")
    nodes, edges = _edges(adjacency)
    if not nodes.head(1):
        return spark.createDataFrame(
            [], "url string, authority double, hub double"
        )
    edges = edges.persist()
    auth = nodes.select("url", F.lit(1.0).alias("s"))
    hub = nodes.select("url", F.lit(1.0).alias("s"))

    def _half(scores: DataFrame, join_on: str, group_on: str) -> DataFrame:
        raw = (
            nodes.join(
                edges.join(
                    scores.withColumnRenamed("url", join_on), join_on
                )
                .groupBy(group_on)
                .agg(F.sum("s").alias("c")),
                nodes.url == F.col(group_on),
                "left",
            )
            .select("url", F.coalesce("c", F.lit(0.0)).alias("s"))
        )
        norm = raw.agg(
            F.sqrt(F.sum(F.col("s") * F.col("s"))).alias("nrm")
        )
        return (
            raw.crossJoin(norm)
            .select(
                "url",
                F.when(F.col("nrm") == 0.0, F.lit(0.0))
                .otherwise(F.col("s") / F.col("nrm"))
                .alias("s"),
            )
            .localCheckpoint()
        )

    for _ in range(n_iters):
        auth = _half(hub, "src", "dst")  # authority <- hubs pointing in
        hub = _half(auth, "dst", "src")  # hub <- authorities pointed at
    # auth/hub are localCheckpointed materializations: edges is no longer
    # reachable from the returned plan, so release its cached blocks (the
    # pagerank_fixed persist/unpersist discipline)
    edges.unpersist()
    return (
        auth.withColumnRenamed("s", "a")
        .join(hub.withColumnRenamed("s", "h"), "url")
        .select(
            "url",
            F.round("a", 9).alias("authority"),
            F.round("h", 9).alias("hub"),
        )
    )


def hits_fixed_oracle_sql(n_iters: int = 8, limit: int = 512) -> str:
    """DuckDB oracle for the driver's hits entry: the SAME deterministic
    toy graph the pagerank entry synthesizes from the `documents` view
    (each doc links to the next two doc_ids within its source),
    unrolled n_iters levels with per-level L2 normalization."""
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
a0 AS MATERIALIZED (SELECT url, 1.0::DOUBLE AS s FROM nodes),
h0 AS MATERIALIZED (SELECT url, 1.0::DOUBLE AS s FROM nodes)"""
    ]
    for i in range(1, n_iters + 1):
        p = i - 1
        lines.append(
            f""",
ar{i} AS MATERIALIZED (
  SELECT nodes.url, coalesce(t.c, 0.0::DOUBLE) AS s
  FROM nodes LEFT JOIN (
    SELECT e.dst AS url, sum(h.s) AS c
    FROM edges e JOIN h{p} h ON h.url = e.src GROUP BY e.dst
  ) t ON t.url = nodes.url
),
an{i} AS MATERIALIZED (SELECT sqrt(sum(s * s)) AS nrm FROM ar{i}),
a{i} AS MATERIALIZED (
  SELECT url, CASE WHEN (SELECT nrm FROM an{i}) = 0 THEN 0.0::DOUBLE
                   ELSE s / (SELECT nrm FROM an{i}) END AS s
  FROM ar{i}
),
hr{i} AS MATERIALIZED (
  SELECT nodes.url, coalesce(t.c, 0.0::DOUBLE) AS s
  FROM nodes LEFT JOIN (
    SELECT e.src AS url, sum(a.s) AS c
    FROM edges e JOIN a{i} a ON a.url = e.dst GROUP BY e.src
  ) t ON t.url = nodes.url
),
hn{i} AS MATERIALIZED (SELECT sqrt(sum(s * s)) AS nrm FROM hr{i}),
h{i} AS MATERIALIZED (
  SELECT url, CASE WHEN (SELECT nrm FROM hn{i}) = 0 THEN 0.0::DOUBLE
                   ELSE s / (SELECT nrm FROM hn{i}) END AS s
  FROM hr{i}
)"""
        )
    lines.append(
        f"""
SELECT a{n_iters}.url, round(a{n_iters}.s, 9) AS authority,
       round(h{n_iters}.s, 9) AS hub
FROM a{n_iters} JOIN h{n_iters} ON h{n_iters}.url = a{n_iters}.url"""
    )
    return "".join(lines)
