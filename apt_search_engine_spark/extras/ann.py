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


def train_centroids(emb: DataFrame, nlist: int = 16, sample: int = 2048,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    iters: int = 5) -> np.ndarray:
    """Tiny k-means on a driver-side sample (deterministic: ordered sample,
    fixed seed). Good enough to demonstrate the IVF layout; a production
    build would use MLlib KMeans over the full data."""
    rows = (
        _as_double(emb, id_col, vec_col)
        .orderBy("vec_id")
        .limit(sample)
        .collect()
    )
    X = np.array([r.v for r in rows])
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
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: probe the nprobe cells nearest the query."""
    if centroids is None:
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
