"""Skew handling for per-host aggregations: explicit salting (north_rule)
on top of AQE's runtime skew-join splitting.

Web corpora are Zipf-skewed by host (a handful of mega-hosts own a large
share of URLs — the synthetic corpus reproduces this, synth.py Zipf s≈1.2).
A plain ``groupBy(host)`` sends every row of a mega-host to one reducer.
Two-phase salted aggregation bounds any single task at ~1/S of the hottest
host:

  phase 1: groupBy(host, salt)  — salt = pmod(xxhash64(url), S)
           partial aggregates spread over S reducers per host
  phase 2: groupBy(host)        — combine S partials (tiny)

Only algebraic aggregates (sum/count/min/max) can be salted this way;
that is all the metrics rollup needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HOST_RE = r"https?://([^/]+)/"


def host_expr(url_col: str = "url"):
    return F.regexp_extract(F.col(url_col), HOST_RE, 1)


def per_host_metrics_salted(scored: DataFrame, num_salts: int = 16,
                            url_col: str = "url") -> DataFrame:
    """Per-host docs_in/docs_kept/drop_rate via two-phase salted aggregation."""
    salted = scored.withColumn("_host", host_expr(url_col)).withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(url_col)), F.lit(num_salts)))
    partial = salted.groupBy("_host", "_salt").agg(
        F.count(F.lit(1)).alias("_in"),
        F.sum(F.col("keep").cast("long")).alias("_kept"),
    )
    return (partial.groupBy("_host")
            .agg(F.sum("_in").alias("docs_in"),
                 F.sum("_kept").alias("docs_kept"))
            .withColumn("drop_rate", F.round(
                1.0 - F.col("docs_kept") / F.col("docs_in"), 6))
            .withColumnRenamed("_host", "host"))


def salted_stats(df: DataFrame, key_col: str, value_col: str, id_col: str,
                 num_salts: int = 16) -> DataFrame:
    """Generic two-phase salted count/sum/min/max of ``value_col`` grouped by
    ``key_col`` — identical result to a plain groupBy (the salt only spreads
    reducers), so it has an exact plain-SQL oracle twin.

    Sum is carried in integer cents (accumulation-order-independent; double
    sums flip the last ulp between partitionings/engines); NULL/NaN rows are
    excluded up front in both engines.
    """
    c = F.col
    cents = F.expr(f"cast(round({value_col} * 100, 0) as bigint)")
    clean = df.where(c(value_col).isNotNull() & ~F.isnan(value_col))
    salted = clean.withColumn(
        "_salt", F.pmod(F.xxhash64(c(id_col)), F.lit(num_salts)))
    partial = salted.groupBy(key_col, "_salt").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(cents).alias("_sum_cents"),
        F.min(value_col).alias("_min"),
        F.max(value_col).alias("_max"),
    )
    return (partial.groupBy(key_col).agg(
        F.sum("_n").alias("n_rows"),
        F.sum("_sum_cents").cast("long").alias("sum_cents"),
        F.round(F.min("_min"), 6).alias("min_value"),
        F.round(F.max("_max"), 6).alias("max_value"),
    ))


def duckdb_salted_stats_sql(table: str, key_col: str, value_col: str) -> str:
    """Plain-groupBy oracle twin of :func:`salted_stats` (salting is a
    physical rewrite; the logical result is a plain aggregate)."""
    return f"""
        select {key_col},
               count(*)::bigint as n_rows,
               (sum(round({value_col} * 100, 0)::bigint))::bigint as sum_cents,
               round(min({value_col}), 6) as min_value,
               round(max({value_col}), 6) as max_value
        from {table}
        where {value_col} is not null and not isnan({value_col})
        group by {key_col}
    """


def per_host_metrics_plain(scored: DataFrame,
                           url_col: str = "url") -> DataFrame:
    """Single-phase twin (for equivalence tests and unskewed inputs)."""
    return (scored.withColumn("host", host_expr(url_col))
            .groupBy("host")
            .agg(F.count(F.lit(1)).alias("docs_in"),
                 F.sum(F.col("keep").cast("long")).alias("docs_kept"))
            .withColumn("drop_rate", F.round(
                1.0 - F.col("docs_kept") / F.col("docs_in"), 6)))
