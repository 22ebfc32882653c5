"""Deduplication operators for training-data pipelines: exact, MinHash+LSH,
SimHash, n-gram Jaccard.

The reference has no dedup operator (its nearest miss is a duplicate-rows test
fixture, /root/reference/tests/test_profiler.py:82-92); these are the
web-scale additions a 10^12-doc corpus pipeline needs.

Engine-parity design: hash primitives are built on md5 (available and
identical in Spark, DuckDB, and Python hashlib), so every operator here has
an exact DuckDB SQL twin for the correctness oracle. At production scale,
swap md5 for xxhash64 (one line) — md5 keeps the cross-engine oracle honest.

Scale notes:
  * exact dedup: one shuffle on the text hash — dedup on md5(text) (fixed
    width) rather than raw text so shuffle rows stay small.
  * MinHash LSH: signatures are computed shuffle-free per partition (native
    exprs); the only shuffle is the band-bucket groupBy, whose fan-in is the
    duplicate-cluster size (bounded by construction).
  * SimHash: explode(words) → two-level agg; partial aggregation is
    algebraic so map-side combine keeps the shuffle proportional to
    #distinct (doc, bit) pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# shared expression builders (Spark SQL + DuckDB SQL from one definition)
# ---------------------------------------------------------------------------


def _words(text: str, engine: str) -> str:
    # canonical ASCII-whitespace tokenizer shared with functions.text_heuristics
    # (explicit class: Java \s / RE2 \s / Python \s all disagree on \x0b and
    # Unicode whitespace)
    from ..functions.text_heuristics import _duck_words, _spark_words
    if engine == "spark":
        return _spark_words(text)
    return _duck_words(text)


def _ngrams_distinct(text: str, n: int, engine: str) -> str:
    """Distinct word n-grams (shingles) of a document."""
    w = _words(text, engine)
    if engine == "spark":
        joined = " || ' ' || ".join(f"{w}[i + {j}]" for j in range(n))
        ng = (f"case when size({w}) < {n} then array(concat_ws(' ', {w})) "
              f"else transform(sequence(0, size({w}) - {n}), i -> {joined}) end")
        return f"array_distinct({ng})"
    joined = " || ' ' || ".join(f"{w}[i + {j}]" for j in range(n))
    ng = (f"case when len({w}) < {n} then [array_to_string({w}, ' ')] "
          f"else list_transform(generate_series(1, len({w}) - {n - 1}), i -> {joined}) end")
    return f"list_distinct({ng})"


def minhash_sig_exprs(text: str, k: int, n: int, engine: str) -> list[str]:
    """k MinHash signature values: min over shingles of md5(seed|shingle).

    md5 hex strings order identically in every engine (ASCII), so the min is
    engine-independent. Returns SQL fragments aliased sig_0..sig_{k-1}.
    """
    ng = _ngrams_distinct(text, n, engine)
    out = []
    for i in range(k):
        if engine == "spark":
            out.append(
                f"array_min(transform({ng}, g -> md5(concat('{i}|', g)))) as sig_{i}"
            )
        else:
            out.append(
                f"list_min(list_transform({ng}, g -> md5('{i}|' || g))) as sig_{i}"
            )
    return out


def band_exprs(k: int, rows_per_band: int, engine: str) -> list[str]:
    """LSH band keys: md5 of the concatenated signature rows in each band."""
    bands = []
    n_bands = k // rows_per_band
    for b in range(n_bands):
        sigs = [f"sig_{b * rows_per_band + r}" for r in range(rows_per_band)]
        if engine == "spark":
            bands.append(f"md5(concat_ws('|', {', '.join(sigs)})) as band_{b}")
        else:
            concat = " || '|' || ".join(sigs)
            bands.append(f"md5({concat}) as band_{b}")
    return bands


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------


def exact_dedup_groups(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Exact-duplicate groups: one row per distinct text with the minimal id
    as representative and the duplicate count. Shuffles md5(text) (16 bytes),
    not the full text."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("rep_id"),
             F.count(F.lit(1)).cast("long").alias("dup_count"))
    )


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep exactly one row (minimal id) per distinct text."""
    w = exact_dedup_groups(df, text_col, id_col).select(
        F.col("rep_id").alias(id_col))
    return df.join(w, on=id_col, how="left_semi")


def with_minhash(df: DataFrame, text_col: str = "text", k: int = 8,
                 shingle_n: int = 3) -> DataFrame:
    """Attach sig_0..sig_{k-1} MinHash columns (native exprs, shuffle-free)."""
    return df.selectExpr("*", *minhash_sig_exprs(text_col, k, shingle_n, "spark"))


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", k: int = 8,
                      rows_per_band: int = 2, shingle_n: int = 3) -> DataFrame:
    """Candidate near-duplicate pairs: docs sharing any LSH band bucket.

    Self-join per band on the band key; dedup pairs across bands. Bucket
    sizes are duplicate-cluster sizes, so the join fan-out is bounded.
    """
    sig = with_minhash(df.select(id_col, text_col), text_col, k, shingle_n)
    n_bands = k // rows_per_band
    banded = sig.selectExpr(id_col, *band_exprs(k, rows_per_band, "spark"))
    stacked = banded.select(
        F.col(id_col),
        F.explode(F.array(*[
            F.concat(F.lit(f"{b}:"), F.col(f"band_{b}")) for b in range(n_bands)
        ])).alias("bucket"),
    )
    a = stacked.alias("a")
    b = stacked.alias("b")
    pairs = (
        a.join(b, (F.col(f"a.bucket") == F.col(f"b.bucket"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    return pairs


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.5,
                        block_cols: list[str] | None = None) -> DataFrame:
    """Pairwise n-gram Jaccard similarity above a threshold.

    Blocked self-join (same ``block_cols`` values) to avoid the full O(N²)
    cross product; at web scale use minhash_lsh_pairs to generate candidates
    and this only to verify them.
    """
    ng = _ngrams_distinct(text_col, n, "spark")
    base = df.selectExpr(id_col, *(block_cols or []), f"{ng} as ngrams")
    a, b = base.alias("a"), base.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    for c in (block_cols or []):
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    jac = (F.size(F.array_intersect(F.col("a.ngrams"), F.col("b.ngrams")))
           / F.size(F.array_union(F.col("a.ngrams"), F.col("b.ngrams"))))
    return (
        a.join(b, cond)
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                F.round(jac, 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


SIMHASH_BITS = 16


def simhash(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """SimHash fingerprint (16-bit, md5-derived word hashes → SQL-twin-able).

    explode(words) → per-(doc, word) ±1 bit contributions → groupBy(doc) sums
    → sign-pack. Algebraic aggregation ⇒ map-side combine; the shuffle carries
    one row per (doc, word occurrence) of ~20 bytes.
    """
    words = df.selectExpr(
        id_col, f"explode({_words(text_col, 'spark')}) as w"
    ).withColumn(
        # 16-bit word hash from md5 hex (engine-portable)
        "wh", F.conv(F.substring(F.md5("w"), 1, 4), 16, 10).cast("int")
    )
    bit_sums = words.groupBy(id_col).agg(*[
        F.sum(F.when(F.shiftright(F.col("wh"), b).bitwiseAND(1) == 1, 1)
              .otherwise(-1)).alias(f"s{b}")
        for b in range(SIMHASH_BITS)
    ])
    fp = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return bit_sums.select(F.col(id_col), fp.cast("int").alias("simhash"))


def duckdb_simhash_sql(table: str = "documents", text_col: str = "text",
                       id_col: str = "doc_id") -> str:
    """Exact DuckDB twin of :func:`simhash`."""
    words = _words(text_col, "duck")
    bit_sum = ", ".join(
        f"sum(case when (wh >> {b}) & 1 = 1 then 1 else -1 end) as s{b}"
        for b in range(SIMHASH_BITS)
    )
    fp = " + ".join(
        f"(case when s{b} > 0 then {1 << b} else 0 end)"
        for b in range(SIMHASH_BITS)
    )
    return f"""
        with exploded as (
            select {id_col}, unnest({words}) as w from {table}
        ), hashed as (
            select {id_col},
                   ('0x' || substr(md5(w), 1, 4))::int as wh
            from exploded
        ), sums as (
            select {id_col}, {bit_sum} from hashed group by {id_col}
        )
        select {id_col}, ({fp})::int as simhash from sums
    """
