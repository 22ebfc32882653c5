"""Deterministic fixed-iteration k-means over embedding columns — the
clustering step of SemDeDup-style semantic dedup and training-mixture
balancing (cluster, then sample/dedup within clusters).

No reference analogue (the reference's only unsupervised step is
IsolationForest outlier detection, outlier_detection.py); this is the
web-scale addition the task brief's similarity-search family implies.

Determinism contract (what makes this ORACLE-CHECKABLE, unlike MLlib's
KMeans): init = the k embeddings with the smallest ids; a FIXED number of
Lloyd iterations; squared-L2 distances via the repo's sequential-fold
convention (aggregate/zip_with ≡ DuckDB list_reduce — bitwise-identical
inputs); centroids ROUNDED to 6dp after every update in both engines, so
engine-specific double-accumulation order in the per-dim means cannot
drift (a flip needs a true mean within ~1e-15 of a 0.5e-6 boundary);
argmin ties break to the lowest cluster index.

Scale shape: per iteration, ONE narrow map (k×dim literal arithmetic per
row — centroids ride inside the expression, the plan-level equivalent of
a broadcast) + ONE groupBy(cluster) aggregate whose result is k×(dim+1)
values — the same bounded driver fence as the IVF partials
(similarity.py). No shuffle of the embedding column beyond the k-row agg.
At extreme dim×k, pass ``gemm=True``: the assignment runs as a pandas-UDF
BLAS matmul (same init, same rounded JVM-side centroid update) —
assignments verified identical on real data, only the oracle twin is lost.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class KMeansEmptyCluster(RuntimeError):
    """A cluster lost all members mid-iteration: the result would need an
    engine-specific repair rule, so fail loudly instead (choose a smaller k
    or different init ids)."""


def _centroid_sql_literal(c: list[float], engine: str) -> str:
    """Float64 list literal via repr (exact round-trip) + string→double
    cast (correctly rounded, identical in both engines; bare decimal
    literals would parse as DECIMAL in Spark)."""
    if engine == "spark":
        return "array(" + ", ".join(f"cast('{x!r}' as double)" for x in c) + ")"
    return "[" + ", ".join(f"'{x!r}'::double" for x in c) + "]"


def _dist_sql(v: str, cent: str, dim: int, engine: str) -> str:
    """Sequential-fold squared-L2 distance (knn_cosine fold convention)."""
    if engine == "spark":
        return (f"aggregate(zip_with({v}, {cent}, (x, y) -> (x - y) * (x - y)), "
                f"cast(0.0 as double), (acc, x) -> acc + x)")
    return (f"list_reduce(list_prepend(0.0::double, "
            f"list_transform(generate_series(1, {dim}), "
            f"i -> (({v})[i] - ({cent})[i]) * (({v})[i] - ({cent})[i]))), "
            f"(acc, x) -> acc + x)")


def _assign(pts: DataFrame, cents: list[list[float]]) -> DataFrame:
    """Attach the argmin-distance ``cluster`` column; ties break to the
    lowest cluster index. Distances staged as columns (multi-referenced by
    least() and the case chain) so each fold runs once per row."""
    k, dim = len(cents), len(cents[0])
    d = {f"_d{j}": F.expr(_dist_sql(
            "_v", _centroid_sql_literal(c, "spark"), dim, "spark"))
         for j, c in enumerate(cents)}
    df = pts.withColumns(d)
    m = F.least(*[F.col(f"_d{j}") for j in range(k)])
    cl = F.when(F.col("_d0") == m, 0)
    for j in range(1, k):
        cl = cl.when(F.col(f"_d{j}") == m, j)
    return df.withColumn("cluster", cl.cast("int")).drop(*d.keys())


def _assign_gemm(pts: DataFrame, cents: list[list[float]]) -> DataFrame:
    """GEMM twin of :func:`_assign` — the SCALE kernel for large dim×k.

    argmin_j ||v - c_j||² computed as ||v||² − 2·(M @ Cᵀ) + ||c_j||² in one
    BLAS matmul per Arrow batch (centroids ride in the closure, materialized
    once per worker). np.argmin returns the FIRST minimum, matching the
    exact path's tie-to-lowest-cluster case chain; the float64 accumulation
    order differs from the sequential fold, so a flip needs two centroids
    equidistant to ~1e-12 — asserted identical on real data in
    tests/test_clustering.py.
    """
    c = np.asarray(cents, dtype=np.float64)  # (k, dim)
    cn = (c * c).sum(axis=1)

    @F.pandas_udf("int")
    def _argmin(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for vecs in batches:
            m = np.stack(vecs.to_numpy()).astype(np.float64)
            d = ((m * m).sum(axis=1)[:, None]
                 - 2.0 * (m @ c.T) + cn[None, :])
            yield pd.Series(d.argmin(axis=1).astype("int32"),
                            index=vecs.index)

    return pts.withColumn("cluster", _argmin(F.col("_v")))


# GEMM-vs-fold distance discrepancy is ≤ ~1e-12 for unit-scale 64-dim
# vectors (different float64 accumulation orders of the same quantity); a
# best-vs-runner-up gap above this margin proves the fold argmin equals the
# GEMM argmin, so the interpreted folds only ever run on the rare ambiguous
# rows (guide §3.2 logic applied to argmin: the fast path may defer, never
# decide, a boundary case)
_GEMM_ARGMIN_MARGIN = 1e-6


def _py_fold_dist2(v, cj) -> float:
    """Bit-identical Python twin of the SQL sequential fold
    ``aggregate(zip_with(v, c, (x,y)->(x-y)*(x-y)), 0.0, +)``: plain
    float arithmetic in the same order gives the same IEEE doubles."""
    acc = 0.0
    for x, y in zip(v, cj):
        d = x - y
        acc += d * d
    return acc


def _assign_exact_checked(pts: DataFrame,
                          cents: list[list[float]]) -> DataFrame:
    """Exact-fold-equivalent assignment at GEMM speed, ONE Arrow pass: a
    BLAS matmul per batch yields each row's argmin and its
    best-vs-second-best distance gap; only rows with a gap below
    :data:`_GEMM_ARGMIN_MARGIN` — where float64 accumulation order could
    in principle flip a ~1e-12 difference — are re-scored inside the same
    batch with the bit-identical Python sequential fold (same IEEE
    addition order as the SQL fold, same tie-to-lowest-index argmin), so
    the output is exactly the oracle semantics with no second pass, no
    union, no per-row interpreted folds."""
    c = np.asarray(cents, dtype=np.float64)
    cn = (c * c).sum(axis=1)
    cl = [list(map(float, cj)) for cj in cents]

    @F.pandas_udf("int")
    def _argmin_checked(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for vecs in batches:
            m = np.stack(vecs.to_numpy()).astype(np.float64)
            d = ((m * m).sum(axis=1)[:, None]
                 - 2.0 * (m @ c.T) + cn[None, :])
            best = d.argmin(axis=1).astype("int32")
            part = np.partition(d, 1, axis=1)
            for i in np.nonzero(
                    part[:, 1] - part[:, 0] < _GEMM_ARGMIN_MARGIN)[0]:
                v = [float(x) for x in m[i]]
                dists = [_py_fold_dist2(v, cj) for cj in cl]
                best[i] = dists.index(min(dists))
            yield pd.Series(best, index=vecs.index, dtype="int32")

    return pts.withColumn(
        "cluster", _argmin_checked.asNondeterministic()(F.col("_v")))


def kmeans_assign(df: DataFrame, k: int = 8, iters: int = 2,
                  vec_col: str = "embedding",
                  id_col: str = "vec_id", gemm: bool = False) -> DataFrame:
    """(id, cluster) after ``iters`` Lloyd iterations from the
    smallest-id init. See module docstring for the determinism contract.

    ``gemm=True`` swaps the interpreted sequential-fold assignment for the
    pandas-UDF BLAS kernel (:func:`_assign_gemm`): same smallest-id init,
    same JVM-side rounded-mean centroid update (so centroids stay
    bit-identical while assignments agree), ~10× less interpreter work per
    row — the production path; the fold path remains the oracle twin.
    """
    assign = _assign_gemm if gemm else _assign_exact_checked
    pts = df.select(
        F.col(id_col),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("_v"))
    init = pts.orderBy(id_col).limit(k).collect()
    cents = [list(r["_v"]) for r in init]
    dim = len(cents[0])
    for _ in range(iters):
        assigned = assign(pts, cents)
        rows = (assigned.groupBy("cluster")
                .agg(*[F.round(F.avg(F.col("_v")[i]), 6).alias(f"m{i}")
                       for i in range(dim)])
                .collect())  # bounded fence: k rows x dim doubles
        if len(rows) < k:
            raise KMeansEmptyCluster(f"{k - len(rows)} empty cluster(s)")
        by_cluster = {r["cluster"]: [r[f"m{i}"] for i in range(dim)]
                      for r in rows}
        cents = [by_cluster[j] for j in range(k)]
    return assign(pts, cents).select(id_col, "cluster")


def duckdb_kmeans_ctes(table: str = "embeddings", k: int = 8,
                       iters: int = 2, dim: int = 64,
                       vec_col: str = "embedding",
                       id_col: str = "vec_id") -> str:
    """The twin's CTE chain (no WITH keyword, no final select) ending in
    ``afinal(vec_id, v, cluster)`` — reusable by queries that compose
    k-means with further stages (e.g. within-cluster near-dup)."""
    dist = _dist_sql("p.v", "c.c", dim, "duck")

    def assign_cte(name, cent):
        return f"""
        {name} as (
            select vec_id, v, cluster from (
                select p.{id_col} as vec_id, p.v, c.cluster,
                       row_number() over (
                           partition by p.{id_col}
                           order by {dist} asc, c.cluster asc) as rn
                from pts p cross join {cent} c
            ) where rn = 1
        )"""

    means = ", ".join(f"round(avg(v[{i + 1}]), 6)" for i in range(dim))
    ctes = [f"""
        pts as (select {id_col}, list_transform({vec_col}, x -> x::double)
                           as v
                from {table}),
        cent0 as (
            select row_number() over (order by {id_col}) - 1 as cluster, v as c
            from (select {id_col}, v from pts order by {id_col} limit {k})
        )"""]
    for t in range(iters):
        ctes.append(assign_cte(f"a{t}", f"cent{t}"))
        ctes.append(f"""
        cent{t + 1} as (
            select cluster, [{means}] as c
            from a{t} group by cluster
        )""")
    ctes.append(assign_cte("afinal", f"cent{iters}"))
    return ", ".join(ctes)


def duckdb_kmeans_sql(table: str = "embeddings", k: int = 8,
                      iters: int = 2, dim: int = 64,
                      vec_col: str = "embedding",
                      id_col: str = "vec_id") -> str:
    """Chained-CTE twin: cent0 = smallest-id embeddings; per iteration an
    assignment CTE (row_number over (dist, cluster)) and a rounded per-dim
    mean CTE; final assignment against the last centroids."""
    ctes = duckdb_kmeans_ctes(table, k, iters, dim, vec_col, id_col)
    return (f"with {ctes} "
            f"select vec_id as {id_col}, cast(cluster as int) as cluster "
            f"from afinal")
