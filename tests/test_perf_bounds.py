"""The reference's own performance assertions, re-applied to this rebuild
(BASELINE.md: profiling <30 s for 100k rows — tests/test_profiler.py:94-110;
detection <5 s per batch — tests/test_ensemble.py:161-177). The fused
single-pass profiler beats the reference's per-column job storm by orders of
magnitude; bounds here are kept at the reference's numbers so the test is an
apples-to-apples 'matches-or-beats' gate, not a flaky micro-benchmark."""

import time

import numpy as np
import pyspark.sql.functions as F

from data_quality_autohealer_spark import synth
from data_quality_autohealer_spark.operators import profiler
from data_quality_autohealer_spark.operators.scoring import score_batch
from data_quality_autohealer_spark.plans.pipeline import score_pages


def test_profile_100k_rows_under_reference_bound(spark):
    # reference bound: <30 s for 100,000 rows x 2 cols (value + category)
    df = spark.range(100_000).select(
        (F.col("id") % 97).cast("double").alias("value"),
        (F.col("id") % 5).cast("string").alias("category"))
    t0 = time.perf_counter()
    row = profiler.profile(df).collect()[0]
    dt = time.perf_counter() - t0
    assert row["row_count"] == 100_000
    assert dt < 30.0, f"profiling took {dt:.1f}s (reference bound 30s)"


def test_detection_batch_under_reference_bound():
    # reference bound: <5 s per detection call; ours scores a 2048-doc Arrow
    # batch (the reference scored ONE profile) in the same budget
    pdf = synth.gen_pages_pdf(np.arange(2048))
    score_batch(pdf["text"].head(16))  # model warmup
    t0 = time.perf_counter()
    out = score_batch(pdf["text"])
    dt = time.perf_counter() - t0
    assert len(out) == 2048
    assert dt < 5.0, f"batch scoring took {dt:.1f}s (reference bound 5s)"


def test_profile_consistency(spark):
    # reference: profiling variance bound (test_profiler.py:216-236) —
    # here determinism is exact, not statistical
    df = spark.range(1000).select(
        (F.col("id") * 3 % 101).cast("double").alias("v"))
    a = profiler.profile(df, exact_percentiles=True).collect()[0]
    b = profiler.profile(df, exact_percentiles=True).collect()[0]
    assert a == b


def test_e2e_filter_throughput_floor(spark):
    # loose floor so the test is stable under host noise: 20k docs end-to-end
    # in <60 s on whatever cores the test session has
    pages = synth.gen_pages_df(spark, 20_000, num_partitions=8)
    score_pages(pages).where("keep").count()  # warm workers
    t0 = time.perf_counter()
    kept = score_pages(pages).where("keep").count()
    dt = time.perf_counter() - t0
    assert kept > 0 and dt < 60.0, f"{dt:.1f}s for 20k docs"
