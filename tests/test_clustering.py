"""Deterministic k-means: separation on crafted gaussian-free clusters,
tie-to-lowest-index argmin, loud empty-cluster failure."""

import pytest

from data_quality_autohealer_spark.operators.clustering import (
    KMeansEmptyCluster, kmeans_assign,
)


def _pts(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_separates_obvious_clusters(spark):
    # three tight blobs around (0,0), (10,0), (0,10); init ids 0,1,2 are
    # one point from each blob, so 2 iterations converge exactly
    blobs = [(0.0, 0.0), (10.0, 0.0), (0.0, 10.0)]
    rows = []
    for b, (bx, by) in enumerate(blobs):
        for i in range(5):
            rows.append((b + 3 * i, [bx + 0.1 * i, by - 0.1 * i]))
    out = {r["vec_id"]: r["cluster"]
           for r in kmeans_assign(_pts(spark, rows), k=3, iters=2).collect()}
    for b in range(3):
        members = {out[b + 3 * i] for i in range(5)}
        assert len(members) == 1  # each blob lands in exactly one cluster
    assert {out[0], out[1], out[2]} == {0, 1, 2}  # blobs in distinct clusters


def test_deterministic_across_runs(spark):
    rows = [(i, [float(i % 7), float((i * 3) % 5)]) for i in range(40)]
    a = sorted(kmeans_assign(_pts(spark, rows), k=4, iters=2).collect())
    b = sorted(kmeans_assign(_pts(spark, rows), k=4, iters=2).collect())
    assert a == b


def test_equidistant_tie_breaks_to_lowest_cluster(spark):
    # two identical init points -> every point equidistant to clusters 0/1
    # -> all assigned to 0 -> cluster 1 empties -> loud failure
    rows = [(0, [1.0, 1.0]), (1, [1.0, 1.0]), (2, [1.2, 1.0]),
            (3, [0.9, 1.1])]
    with pytest.raises(KMeansEmptyCluster):
        kmeans_assign(_pts(spark, rows), k=2, iters=1)


def test_real_embeddings_objective_decreases(spark):
    """Lloyd invariant on the real embeddings table: the within-cluster
    SSE after 2 update iterations is strictly below the init-assignment
    SSE. (Label purity is NOT asserted — the synthetic labels are not
    separable: per-label noise radius ~0.99 vs centroid spread ~0.2.)"""
    import numpy as np

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    def sse(iters):
        out = kmeans_assign(emb, k=8, iters=iters).join(emb, "vec_id")
        rows = out.select("cluster", "embedding").collect()
        by = {}
        for r in rows:
            by.setdefault(r["cluster"], []).append(
                np.array(r["embedding"], dtype="float64"))
        total = 0.0
        for v in by.values():
            m = np.mean(v, axis=0)
            total += sum(float(np.sum((e - m) ** 2)) for e in v)
        return total

    assert sse(2) < sse(0)


def test_gemm_assignment_matches_fold(spark):
    """The production GEMM kernel (gemm=True) must reproduce the oracle
    path's assignments exactly on the real embeddings table — same init,
    same rounded centroid updates, argmin ties to the lowest cluster."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {r["vec_id"]: r["cluster"]
             for r in kmeans_assign(emb, k=8, iters=2).collect()}
    fast = {r["vec_id"]: r["cluster"]
            for r in kmeans_assign(emb, k=8, iters=2, gemm=True).collect()}
    assert exact == fast


def test_gemm_tie_breaks_to_lowest_cluster(spark):
    # identical init points -> exactly tied distances; np.argmin must take
    # the first (lowest) cluster, emptying cluster 1 -> loud failure, the
    # same contract as the fold path
    rows = [(0, [1.0, 1.0]), (1, [1.0, 1.0]), (2, [1.2, 1.0]),
            (3, [0.9, 1.1])]
    with pytest.raises(KMeansEmptyCluster):
        kmeans_assign(_pts(spark, rows), k=2, iters=1, gemm=True)


def test_semantic_neardup_fast_matches_oracle_chain(spark):
    """Full-chain equality: GEMM k-means blocking + chunked-GEMM cosine
    pairs produce the identical pair set (and 6dp sims) as the
    oracle-checked interpreted chain."""
    import __spark_entry__ as entry_mod

    sf = "/root/testdata/sf0.001"
    qs = entry_mod.queries()
    exact = {(r["id_a"], r["id_b"]): r["cosine_sim"]
             for r in qs["semantic_neardup"](spark, sf).collect()}
    fast = {(r["id_a"], r["id_b"]): r["cosine_sim"]
            for r in qs["semantic_neardup_fast"](spark, sf).collect()}
    assert set(exact) == set(fast) and len(exact) > 0
    for pair, sim in exact.items():
        assert abs(sim - fast[pair]) <= 1e-6
