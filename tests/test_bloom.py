"""Distributed Bloom filter: no false negatives, bounded false-positive
rate, partitioning-independent bits, shuffle-free probe plan, and the
decontamination contract (drops ⊇ exact matches, over-drop ≈ FPR only)."""

import numpy as np
import pyspark.sql.functions as F

from data_quality_autohealer_spark.operators import bloom


def _texts(spark, ids, prefix="doc"):
    return spark.createDataFrame(
        [(i, f"{prefix} number {i} with some body") for i in ids],
        "doc_id long, text string")


def test_no_false_negatives_and_fpr(spark):
    members = _texts(spark, range(2000))
    bits = bloom.build_bloom(members, "text", m_bits=1 << 18, k=5)
    # every member must test positive
    tested = bloom.might_contain(members, "text", bits, k=5)
    assert tested.where(~F.col("_in_bloom")).count() == 0
    # non-members: ~ (1 - e^{-kn/m})^k ≈ 0.15% at n=2000, m=2^18, k=5;
    # allow a generous 10x margin
    others = _texts(spark, range(10_000, 20_000))
    fp = bloom.might_contain(others, "text", bits, k=5) \
        .where(F.col("_in_bloom")).count()
    assert fp / 10_000 < 0.015, f"FPR {fp/10_000:.4f}"


def test_bits_independent_of_partitioning(spark):
    df = _texts(spark, range(500))
    a = bloom.build_bloom(df.repartition(1), "text", m_bits=1 << 16, k=4)
    b = bloom.build_bloom(df.repartition(13), "text", m_bits=1 << 16, k=4)
    assert np.array_equal(a, b)


def test_bits_independent_of_chunking(spark):
    # the executor-side OR-reduce chunks the bitmap; the chunk size is a
    # physical knob only — bits must be identical at any chunk_bytes,
    # including one that doesn't divide m/8 and one bigger than m/8
    df = _texts(spark, range(300)).repartition(7)
    ref = bloom.build_bloom(df, "text", m_bits=1 << 16, k=4)
    for cb in (1 << 20, 1000, 64):
        assert np.array_equal(
            ref, bloom.build_bloom(df, "text", m_bits=1 << 16, k=4,
                                   chunk_bytes=cb)), cb


def test_null_values_not_represented_and_kept(spark):
    # advice-r04: xxhash64(NULL) is a constant — one NULL row in the
    # reference must NOT drop every NULL-text doc in the new corpus.
    # Build side filters NULLs; probe side reports false for NULLs.
    ref = spark.createDataFrame(
        [(0, None), (1, "ref body one"), (2, "ref body two")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(10, None), (11, None), (12, "ref body one"), (13, "fresh body")],
        "doc_id long, text string")
    bits = bloom.build_bloom(ref, "text", m_bits=1 << 16, k=4)
    # bits for a NULL-only frame: nothing set at all
    null_only = spark.createDataFrame([(9, None)], "doc_id long, text string")
    assert not bloom.build_bloom(null_only, "text", 1 << 16, 4).any()
    kept = bloom.decontaminate_bloom(new, ref, "text", m_bits=1 << 16, k=4)
    ids = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    assert ids == [10, 11, 13]  # NULLs kept, verbatim match dropped


def test_decontaminate_drops_ref_docs_without_shuffle(spark):
    # ref = every 5th doc's text; decontamination must drop exactly those
    # (texts are unique per id, FPR ~0 at this m/n) and keep the rest
    all_docs = _texts(spark, range(1000))
    ref = all_docs.where("doc_id % 5 = 0")
    kept = bloom.decontaminate_bloom(all_docs, ref, "text",
                                     m_bits=1 << 20, k=5)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert all(i % 5 != 0 for i in ids)
    # over-drop (false positives) is at most a handful at this sizing
    assert len(ids) >= 800 - 5
    # the probe side is shuffle-free: scan -> hash -> UDF -> filter
    probed = bloom.might_contain(
        all_docs, "text", bloom.build_bloom(ref, "text", 1 << 20, 5), 5)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bloom_probe_in_streaming_equals_batch(spark, tmp_path):
    """The probe is a stateless projection+filter, so it drops into a
    Structured Streaming plan unchanged — incremental ingest can
    decontaminate each micro-batch against the corpus Bloom without any
    state store. Kept set must equal the batch path's."""
    all_docs = _texts(spark, range(300))
    ref = all_docs.where("doc_id % 5 = 0")
    bits = bloom.build_bloom(ref, "text", m_bits=1 << 20, k=5)

    src = str(tmp_path / "bloom_stream_src")
    all_docs.repartition(3).write.parquet(src)
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    filtered = bloom.might_contain(stream, "text", bits, k=5) \
        .where(~F.col("_in_bloom")).drop("_in_bloom")
    q = (filtered.writeStream.format("memory").queryName("bloom_stream_t")
         .outputMode("append").trigger(availableNow=True).start())
    try:
        assert q.awaitTermination(120), "stream did not finish in 120s"
    finally:
        q.stop()
    got = {r["doc_id"] for r in
           spark.sql("select doc_id from bloom_stream_t").collect()}
    batch = {r["doc_id"] for r in bloom.decontaminate_bloom(
        all_docs, ref, "text", m_bits=1 << 20, k=5)
        .select("doc_id").collect()}
    assert got == batch and len(got) > 0


def test_probe_accepts_prebroadcast_handle(spark):
    """Repeated passes can share ONE broadcast of the bit array (the
    caller owns unpersist); results identical to the array form."""
    ref = _texts(spark, range(0, 500, 5))
    alldocs = _texts(spark, range(500))
    bits = bloom.build_bloom(ref, "text", m_bits=1 << 18, k=5)
    bc = spark.sparkContext.broadcast(bits)
    try:
        via_bc = {r["doc_id"] for r in
                  bloom.might_contain(alldocs, "text", bc, k=5)
                  .where(F.col("_in_bloom")).select("doc_id").collect()}
        via_arr = {r["doc_id"] for r in
                   bloom.might_contain(alldocs, "text", bits, k=5)
                   .where(F.col("_in_bloom")).select("doc_id").collect()}
        assert via_bc == via_arr and via_bc
    finally:
        bc.unpersist()
