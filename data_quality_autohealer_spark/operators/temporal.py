"""Temporal join operators Spark lacks as built-ins: as-of join and
time-range join, composed from shuffle-efficient DataFrame primitives
(no per-key collects, no O(N·M) cross products).

No reference analogue (the reference joins nothing on time); these are the
standard event-attribution joins a web-scale events pipeline needs, built
the way the task brief prescribes — "a composition of existing DataFrame
ops" rather than a UDF.

Scale shapes:
- ``asof_join`` is the union+window trick: tag both sides, union, ONE
  window per key ordered by (ts, side, tie-break) carrying the last right
  row forward as a packed struct. Exactly one shuffle of
  (keys + ts + payload), the same partitioning a sort-merge join would
  need — but no join at all, so no fan-out and a skewed key costs only a
  sort. 10^12 rows: identical plan.
- ``time_range_join`` is the bucket-overlap trick (the Flink interval-join
  layout): right rows replicate into 3 coarse time buckets (b-1, b, b+1
  with bucket width == window), the join runs on (key, bucket) equality —
  an EQUI-join Catalyst can hash/sort-merge — and the exact |Δt| ≤ window
  predicate filters the bucket-boundary false pairs. Replication factor is
  the constant 3; output cost ∝ true pairs, never |L|×|R|.

Determinism contract (for the DuckDB oracle twins): the as-of match is the
right row maximizing (right_ts, tie_col) among right_ts <= left_ts —
a total order, no arbitrary picks at equal timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str, right_ts: str, payload: list[str],
              tie_col: str, suffix: str = "_asof") -> DataFrame:
    """Backward (inclusive) as-of join: every left row gains ``right_ts``
    and ``payload`` of the latest right row with ``right_ts <= left_ts``
    per ``on`` key (NULLs when no prior right row exists). Ties on
    right_ts break by the greatest ``tie_col`` — deterministic.

    The matched right row travels as ONE packed struct through a single
    ``last(_match, ignorenulls=True)`` window ordered by
    (ts, side, tie) with right rows (side 0) sorting before left rows
    (side 1) at equal ts — inclusive <= semantics with no join.
    """
    lcols = left.columns
    # rows with NULL join keys never match in the DuckDB twin's equi-join;
    # drop them from the right side so Spark's window (which groups NULL
    # keys into one partition) agrees: NULL-key left rows stay unmatched.
    # NULL right_ts likewise: the twin's right_ts <= left_ts never matches
    # NULL, but Spark sorts a NULL _ts FIRST in the window, where its
    # packed _match could be adopted by a left row with no other prior
    # right row — drop those rows for the same reason.
    right = right.where(F.col(right_ts).isNotNull())
    for k in on:
        right = right.where(F.col(k).isNotNull())
    pack = F.struct(F.col(right_ts).alias("_mts"),
                    *[F.col(p).alias(p) for p in payload])
    r = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(tie_col).alias("_tie"),
        pack.alias("_match"))
    l = left.select(
        "*",
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[tie_col].dataType).alias("_tie"),
        F.lit(None).cast(r.schema["_match"].dataType).alias("_match"))
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l.unionByName(r.select(*l.columns))
    w = (Window.partitionBy(*on)
         .orderBy(F.col("_ts").asc(), F.col("_side").asc(),
                  F.col("_tie").asc_nulls_first())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    m = F.last("_match", ignorenulls=True).over(w)
    return (u.withColumn("_m", m)
            .where(F.col("_side") == 1)
            .select(*lcols,
                    F.col("_m._mts").alias(f"{right_ts}{suffix}"),
                    *[F.col(f"_m.{p}").alias(f"{p}{suffix}")
                      for p in payload]))


def duckdb_asof_sql(left_sql: str, right_sql: str, on: list[str],
                    left_ts: str, right_ts: str, payload: list[str],
                    tie_col: str, left_cols: list[str],
                    suffix: str = "_asof") -> str:
    """Oracle twin via explicit ranking (NOT DuckDB's native ASOF JOIN,
    which picks arbitrarily among equal right_ts rows): right rows ranked
    per key by (ts, tie); each left row takes the max-rank row with
    right_ts <= left_ts through an inequality join + arg-max. Independent
    query shape from the Spark union+window plan."""
    key_eq = " and ".join(f"l.{k} = r.{k}" for k in on)
    lc = ", ".join(f"l.{c}" for c in left_cols)
    pay = ", ".join(f"rr.{p} as {p}{suffix}" for p in payload)
    return f"""
        with l as ({left_sql}),
        r as (select *, row_number() over (
                  partition by {', '.join(on)}
                  order by {right_ts} asc, {tie_col} asc nulls first) as _rn
              from ({right_sql})
              where {' and '.join(f'{k} is not null' for k in on)}),
        best as (
            select {lc}, max(r._rn) as _rn
            from l left join r on {key_eq} and r.{right_ts} <= l.{left_ts}
            group by {lc}
        )
        select {', '.join(f'best.{c}' for c in left_cols)},
               rr.{right_ts} as {right_ts}{suffix}, {pay}
        from best
        left join r rr
          on {' and '.join(f'best.{k} = rr.{k}' for k in on)}
         and best._rn = rr._rn
    """


def time_range_join(left: DataFrame, right: DataFrame, on: list[str],
                    left_ts: str, right_ts: str, window_sec: int,
                    right_cols: list[str],
                    suffix: str = "_r") -> DataFrame:
    """All (left, right) pairs with the same key and
    ``|left_ts - right_ts| <= window_sec`` (interval/range join), as a
    pure equi-join on (key, coarse time bucket) plus the exact predicate.
    Self-pairs (identical row on both sides) are the caller's concern."""
    w = int(window_sec)
    if w < 1:
        # the bucket-overlap proof assumes whole-second windows; w == 0
        # would silently divide-by-zero into NULL buckets (empty join)
        raise ValueError(f"window_sec must be >= 1 second, got {window_sec}")
    lb = F.floor(F.unix_timestamp(F.col(left_ts)) / w)
    rb = F.floor(F.unix_timestamp(F.col(right_ts)) / w)
    l = left.withColumn("_b", lb)
    r = (right.select(*on, right_ts, *right_cols)
         .withColumn("_b", F.explode(F.array(rb - 1, rb, rb + 1))))
    # cast handles TIMESTAMP_NTZ parquet columns (unix_micros requires
    # TIMESTAMP); the session-tz offset is identical on both sides so the
    # difference is tz-invariant
    dt = F.abs(F.unix_micros(F.col(f"l.{left_ts}").cast("timestamp"))
               - F.unix_micros(F.col(f"r.{right_ts}").cast("timestamp")))
    joined = (l.alias("l").join(
        r.alias("r"),
        F.expr(" and ".join([f"l.{k} = r.{k}" for k in on]
                            + ["l._b = r._b"])))
        .where(dt <= w * 1_000_000))
    return (joined.select(
        *[F.col(f"l.{c}") for c in left.columns],
        F.col(f"r.{right_ts}").alias(f"{right_ts}{suffix}"),
        *[F.col(f"r.{c}").alias(f"{c}{suffix}") for c in right_cols]))


def duckdb_time_range_sql(left_sql: str, right_sql: str, on: list[str],
                          left_ts: str, right_ts: str, window_sec: int,
                          right_cols: list[str], left_cols: list[str],
                          suffix: str = "_r") -> str:
    """Oracle twin: the naive inequality join (fine at oracle scale)."""
    key_eq = " and ".join(f"l.{k} = r.{k}" for k in on)
    lc = ", ".join(f"l.{c}" for c in left_cols)
    rc = ", ".join(f"r.{c} as {c}{suffix}" for c in right_cols)
    return f"""
        with l as ({left_sql}), r as ({right_sql})
        select {lc}, r.{right_ts} as {right_ts}{suffix}, {rc}
        from l join r
          on {key_eq}
         and abs(epoch_us(l.{left_ts}) - epoch_us(r.{right_ts}))
             <= {window_sec} * 1000000
    """
