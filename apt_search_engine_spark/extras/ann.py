"""Similarity search over an embedding column (array<float>).

Two paths, same contract (top-k neighbors by cosine):

  - brute_force_topk: exact; dot products as native Spark expressions
    (zip_with/aggregate — JVM codegen, no Python), TakeOrderedAndProject
    for the global top-k. The correctness baseline.
  - ivf_topk: scale path — k-means-lite (fixed seeded centroids, one
    assignment pass) partitions vectors into nlist cells; the query probes
    only the nprobe nearest cells. At 100 TB the cell assignment is the
    partition key, so a probe scans nprobe/nlist of the data.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def _as_double(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return emb.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    )


def _vec_lit(vec) -> str:
    return "array(" + ", ".join(f"{float(x):.17g}D" for x in vec) + ")"


_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, z) -> acc + z)"
_NORM = "sqrt(" + _DOT + ")"


def cosine_expr(a: str, b: str) -> str:
    return (
        f"{_DOT.format(a=a, b=b)} / "
        f"({_NORM.format(a=a, b=a)} * {_NORM.format(a=b, b=b)})"
    )


def brute_force_topk(
    emb: DataFrame, query_vec, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of a literal query vector."""
    v = _as_double(emb, id_col, vec_col)
    q = _vec_lit(query_vec)
    return (
        v.withColumn("cos", F.expr(cosine_expr("v", q)))
        .select("vec_id", F.round("cos", 6).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def kmeans_numpy(X: np.ndarray, nlist: int, iters: int = 5) -> np.ndarray:
    """Seeded Lloyd iterations on an in-memory sample. Shared by the
    Spark path (train_centroids) and the DuckDB oracle generator
    (__spark_entry__), which recomputes identical centroids from the
    same ordered sample read via pyarrow — same floats, same cells."""
    rng = np.random.default_rng(7)
    cent = X[rng.choice(len(X), size=min(nlist, len(X)), replace=False)]
    for _ in range(iters):
        d = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = X[m].mean(axis=0)
    return cent


def train_centroids(emb: DataFrame, nlist: int = 16, sample: int = 2048,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    iters: int = 5) -> np.ndarray:
    """K-means on a driver-side ordered sample (deterministic, oracle-
    replicable). For full-data training at scale use
    train_centroids_mllib."""
    rows = (
        _as_double(emb, id_col, vec_col)
        .orderBy("vec_id")
        .limit(sample)
        .collect()
    )
    return kmeans_numpy(np.array([r.v for r in rows]), nlist, iters)


def train_centroids_mllib(emb: DataFrame, nlist: int = 16, seed: int = 7,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding") -> np.ndarray:
    """Centroids via MLlib KMeans over the FULL distributed dataset —
    the scale path (the driver-sample variant caps training data at a
    collect; at 100 TB the sample is unrepresentative and the collect a
    bottleneck). Seeded for reproducibility within a fixed
    data/partitioning layout; recall vs brute force is asserted in
    tests/test_extras.py at 10x the base fixture."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = _as_double(emb, id_col, vec_col).select(
        array_to_vector(F.col("v")).alias("features")
    )
    model = KMeans(k=nlist, seed=seed, featuresCol="features").fit(feats)
    return np.array([np.asarray(c) for c in model.clusterCenters()])


def assign_cells(emb: DataFrame, centroids: np.ndarray,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF cell assignment as a native expression: argmin squared distance
    to the (broadcast-literal) centroid matrix."""
    v = _as_double(emb, id_col, vec_col)
    cents = (
        "array(" + ", ".join(_vec_lit(c) for c in centroids) + ")"
    )
    n = len(centroids)
    dist = (
        f"transform(sequence(0, {n - 1}), c -> "
        f"aggregate(zip_with(v, {cents}[c], (x, y) -> (x - y) * (x - y)), 0D, "
        f"(acc, z) -> acc + z))"
    )
    return v.withColumn(
        "cell", F.expr(f"array_position({dist}, array_min({dist})) - 1").cast("int")
    )


def ivf_topk(emb: DataFrame, query_vec, k: int = 10, nlist: int = 16,
             nprobe: int = 4, centroids: np.ndarray | None = None,
             id_col: str = "vec_id", vec_col: str = "embedding",
             method: str = "driver-sample") -> DataFrame:
    """Approximate top-k: probe the nprobe cells nearest the query.
    method='driver-sample' trains on a deterministic ordered sample
    (oracle-replicable); method='mllib' trains distributed KMeans over
    the full data (the 100 TB path)."""
    if centroids is None:
        if method == "mllib":
            centroids = train_centroids_mllib(
                emb, nlist, id_col=id_col, vec_col=vec_col
            )
        else:
            centroids = train_centroids(emb, nlist, id_col=id_col, vec_col=vec_col)
    q = np.asarray(query_vec, dtype=float)
    d = ((centroids - q[None, :]) ** 2).sum(axis=1)
    probe = sorted(int(i) for i in d.argsort()[:nprobe])
    cells = assign_cells(emb, centroids, id_col, vec_col)
    qlit = _vec_lit(q)
    return (
        cells.filter(F.col("cell").isin(probe))
        .withColumn("cos", F.expr(cosine_expr("v", qlit)))
        .select("vec_id", F.round("cos", 6).alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def ivf_oracle_sql(sf_dir: str, k: int = 10, nlist: int = 16,
                   nprobe: int = 4, sample: int = 2048) -> str:
    """DuckDB oracle for the driver's ann_ivf_topk entry: recomputes the
    SAME seeded centroids from the same ordered sample in pure
    numpy/pyarrow (kmeans_numpy is the shared routine), embeds them as
    %.17g literals exactly like the Spark plan does, and restates cell
    assignment (first-argmin), probe pruning, cosine and top-k in SQL.
    Identical floats on both sides -> identical cells and ranks."""
    import os

    import pyarrow.parquet as pq

    t = (
        pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
        .to_pandas()
        .sort_values("vec_id")
    )
    t = t[t["vec_id"] != 0]
    X = np.array(t["embedding"].tolist(), dtype=np.float64)
    q = np.array(
        pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
        .to_pandas()
        .set_index("vec_id")
        .loc[0, "embedding"],
        dtype=np.float64,
    )
    centroids = kmeans_numpy(X[:sample], nlist)
    d = ((centroids - q[None, :]) ** 2).sum(axis=1)
    probe = sorted(int(i) for i in d.argsort()[:nprobe])
    dim = X.shape[1]
    rng = f"range(1, {dim + 1})"

    def cent_lit(c) -> str:
        return "[" + ", ".join(f"{float(x):.17g}::DOUBLE" for x in c) + "]"

    dists = ", ".join(
        f"list_sum(list_transform({rng}, i -> (v[i] - ({cent_lit(c)})[i]) "
        f"* (v[i] - ({cent_lit(c)})[i])))"
        for c in centroids
    )
    qlit = "[" + ", ".join(f"{float(x):.17g}::DOUBLE" for x in q) + "]"
    probe_list = ", ".join(str(p) for p in probe)
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
           FROM embeddings WHERE vec_id <> 0),
cells AS (
  SELECT vec_id, v, list_position(dl, list_min(dl)) - 1 AS cell
  FROM (SELECT vec_id, v, [{dists}] AS dl FROM e)
),
probed AS (
  SELECT vec_id,
         list_sum(list_transform({rng}, i -> v[i] * ({qlit})[i]))
         / (sqrt(list_sum(list_transform({rng}, i -> v[i] * v[i])))
            * sqrt(list_sum(list_transform({rng}, i -> ({qlit})[i] * ({qlit})[i])))) AS cos
  FROM cells WHERE cell IN ({probe_list})
)
SELECT vec_id, round(cos, 6) AS cos
FROM probed ORDER BY round(cos, 6) DESC, vec_id ASC LIMIT {k}"""
