"""Distributed Bloom filter over a DataFrame column — the O(1)-memory
membership structure for corpus decontamination at 10^12 docs, where the
reference set is too large to broadcast as an exact hash set and a shuffle
semi-join per wave is too expensive.

(Spark's internal BloomFilterAggregate/might_contain pair backs its runtime
join filters but is not registered as a public SQL function in this build —
probed; UNRESOLVED_ROUTINE — so this is the same construction in
numpy/Arrow form.)

Construction: values are hashed JVM-side with ``xxhash64`` (cheap, inside
codegen), then each 64-bit value sets ``k`` bits via Kirsch-Mitzenmacher
double hashing (g_i = h1 + i*h2 mod m — provably as good as k independent
hashes). Each partition builds a local bit array in numpy, splits it into
fixed CHUNKS and emits one (chunk_id, bytes) row per NON-ZERO chunk; a
``groupBy(chunk_id).applyInPandas`` stage OR-reduces the partials
executor-side, so the driver receives exactly m/8 bytes (one row per
chunk) REGARDLESS of input partition count — the round-4 version shipped
(num_partitions × m/8) bytes through the driver, which at 10^5 scan
partitions is ~100 GiB. Bitwise OR is commutative and associative, so the
result is independent of partitioning/scheduling — fully deterministic for
a given item set and (m, k).

Memory shape: shuffle ≤ (num_partitions × m/8) bytes (less when chunks
stay all-zero), driver fence exactly m/8; m = 2^23 bits = 1 MiB covers
~10^6 items at ~2% FPR with k=5. Size m ≈ 10 bits/item for ~1% FPR.
Membership tests run as a vectorized pandas UDF with the bit array
broadcast once per worker.

NULL semantics (advice-r04): NULL values are NOT represented — the build
side filters them out (xxhash64(NULL) is a constant, so one NULL row would
otherwise alias EVERY null onto a single key) and the probe side reports
``false`` for NULL inputs, i.e. decontamination always KEEPS null-text
docs (the line_dedup convention: null is absence, not a value).

Decontamination direction: false POSITIVES drop extra new docs — the safe
direction for "never train on the reference set"; there are no false
negatives.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bit_positions(h64: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit indices from 64-bit hashes (Kirsch-Mitzenmacher).
    h2 is forced odd so successive probes cycle the whole table."""
    v = h64.astype(np.uint64)
    h1 = v & np.uint64(0xFFFFFFFF)
    h2 = ((v >> np.uint64(32)) | np.uint64(1))
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None])
            % np.uint64(m_bits)).astype(np.int64)


def build_bloom(df: DataFrame, col: str, m_bits: int = 1 << 23,
                k: int = 5, chunk_bytes: int = 1 << 16) -> np.ndarray:
    """Packed uint8 bit array (length m_bits/8) containing every
    ``xxhash64(col)`` of ``df``'s non-NULL values. m_bits must be a
    multiple of 8.

    Two-stage executor-side reduce: per-partition partial bitmaps are
    emitted as (chunk_id, chunk_bytes)-sized pieces (all-zero chunks
    skipped) and OR-combined per chunk_id before the driver collects one
    row per chunk — the driver fence is exactly m/8 bytes however many
    partitions the build scan has."""
    if m_bits % 8:
        raise ValueError("m_bits must be a multiple of 8")
    m_bytes = m_bits // 8
    cb = min(chunk_bytes, m_bytes)
    n_chunks = -(-m_bytes // cb)

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.zeros(m_bytes, dtype=np.uint8)
        saw = False
        for pdf in batches:
            saw = True
            pos = _bit_positions(pdf["_h"].to_numpy(), m_bits, k).ravel()
            np.bitwise_or.at(bits, pos >> 3,
                             np.left_shift(np.uint8(1),
                                           (pos & 7).astype(np.uint8)))
        if saw:
            ids = [c for c in range(n_chunks)
                   if bits[c * cb:(c + 1) * cb].any()]
            if ids:
                yield pd.DataFrame({
                    "chunk_id": ids,
                    "bits": [bits[c * cb:(c + 1) * cb].tobytes()
                             for c in ids]})

    def or_chunks(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = np.frombuffer(pdf["bits"].iloc[0], dtype=np.uint8).copy()
        for b in pdf["bits"].iloc[1:]:
            acc |= np.frombuffer(b, dtype=np.uint8)
        return pd.DataFrame({"chunk_id": [int(pdf["chunk_id"].iloc[0])],
                             "bits": [acc.tobytes()]})

    rows = (df.where(F.col(col).isNotNull())
            .select(F.xxhash64(F.col(col)).alias("_h"))
            .mapInPandas(partials, schema="chunk_id int, bits binary")
            .groupBy("chunk_id")
            .applyInPandas(or_chunks, schema="chunk_id int, bits binary")
            .collect())
    out = np.zeros(m_bytes, dtype=np.uint8)
    for r in rows:
        c = r["chunk_id"]
        out[c * cb:c * cb + len(r["bits"])] = np.frombuffer(r["bits"],
                                                            dtype=np.uint8)
    return out


def might_contain(df: DataFrame, col: str, bloom_bits,
                  k: int = 5, out_col: str = "_in_bloom") -> DataFrame:
    """Boolean column: every bit of the value's k probes is set (no false
    negatives; false positives at the filter's design rate). NULL values
    test ``false`` — the build side never represents them (xxhash64(NULL)
    is a constant that would alias all NULLs onto one key).

    The bit array ships as a Spark BROADCAST variable, not a closure
    capture: a closure rides inside the serialized task/UDF payload on
    every stage that uses it, while a broadcast is torrent-distributed
    once per executor — the difference between fine and painful at
    m = 2^30 bits (128 MiB) for a 10^8-item reference set.

    Lifecycle: pass a numpy array for one-shot use (the broadcast is
    created here and reclaimed by GC + ContextCleaner when the returned
    frame is dropped), or pre-broadcast it yourself
    (``sc.broadcast(bits)``) and pass the Broadcast handle when running
    REPEATED passes against one filter — then one copy serves them all
    and you own ``.unpersist()``."""
    from pyspark.broadcast import Broadcast
    if isinstance(bloom_bits, Broadcast):
        bc = bloom_bits
        m_bits = len(bc.value) * 8
    else:
        bc = df.sparkSession.sparkContext.broadcast(bloom_bits)
        m_bits = len(bloom_bits) * 8

    @F.pandas_udf("boolean")
    def _test(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        bits = bc.value  # fetched once per executor
        for h in batches:
            pos = _bit_positions(h.to_numpy(), m_bits, k)
            hit = (bits[pos >> 3]
                   & np.left_shift(np.uint8(1), (pos & 7).astype(np.uint8)))
            yield pd.Series((hit != 0).all(axis=1), index=h.index)

    return df.withColumn(out_col, F.when(
        F.col(col).isNull(), F.lit(False)
    ).otherwise(_test(F.xxhash64(F.col(col)))))


def decontaminate_bloom(new_df: DataFrame, ref_df: DataFrame,
                        col: str = "text", m_bits: int = 1 << 23,
                        k: int = 5) -> DataFrame:
    """Drop every new doc whose ``col`` (probably) appears verbatim in the
    reference corpus: build the Bloom over ref once, filter new with NO
    shuffle (scan → xxhash64 → pandas-UDF probe → filter). The exact
    anti-join twin shuffles both sides; this touches the reference corpus
    once and streams the new side. False positives only over-drop.
    NULL-``col`` docs are always KEPT (never representable in the filter;
    see module doc)."""
    bloom = build_bloom(ref_df, col, m_bits, k)
    return (might_contain(new_df, col, bloom, k)
            .where(~F.col("_in_bloom")).drop("_in_bloom"))
