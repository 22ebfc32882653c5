"""Gap-based session windows over event streams.

Reference analogue: none (the reference's Kafka loop has no event-time
semantics at all — SURVEY §2.8); this is the Structured-Streaming-native
operator a web-scale event pipeline needs. ``F.session_window`` works
identically in batch and streaming (with a watermark upstream in the
streaming case), so the same function serves both; the batch form has an
exact SQL twin (gaps-and-islands with lag + running sum) used as the
DuckDB oracle.

Semantics note: Spark merges session windows that overlap, i.e. an event
starts a NEW session iff ts − prev_ts ≥ gap — exactly the islands break
condition in the twin.

Scale shape: one shuffle on the session key (user), then Spark's native
session-window merge; sums carried in integer cents (order-independent);
NaN values contribute 0 to the sum in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(events: DataFrame, gap: str = "4 hours",
               key_col: str = "user_id", ts_col: str = "ts",
               value_col: str = "value") -> DataFrame:
    """Per-key gap sessions: (key, session_start_us, n_events, sum_cents)."""
    cents = F.expr(
        f"case when {value_col} is null or isnan({value_col}) then 0 "
        f"else cast(round({value_col} * 100, 0) as bigint) end")
    return (events
            .groupBy(key_col, F.session_window(ts_col, gap))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(cents).cast("long").alias("sum_cents"))
            .select(key_col,
                    # parquet timestamps load as TIMESTAMP_NTZ; cast for
                    # unix_micros (session TZ is pinned to UTC so the cast
                    # is value-preserving)
                    F.unix_micros(F.col("session_window.start")
                                  .cast("timestamp"))
                    .alias("session_start_us"),
                    "n_events", "sum_cents"))


def duckdb_sessionize_sql(table: str = "events", gap_us: int = 14_400_000_000,
                          key_col: str = "user_id", ts_col: str = "ts",
                          value_col: str = "value",
                          id_col: str = "event_id") -> str:
    """Gaps-and-islands twin of :func:`sessionize` (gap in microseconds)."""
    return f"""
        with o as (
            select {key_col}, {ts_col}, {value_col}, {id_col},
                   lag({ts_col}) over (partition by {key_col}
                       order by {ts_col}, {id_col}) as prev
            from {table}
        ),
        m as (
            select *, case when prev is null
                           or epoch_us({ts_col}) - epoch_us(prev) >= {gap_us}
                      then 1 else 0 end as brk
            from o
        ),
        s as (
            select *, sum(brk) over (partition by {key_col}
                order by {ts_col}, {id_col} rows unbounded preceding) as sid
            from m
        )
        select {key_col},
               epoch_us(min({ts_col}))::bigint as session_start_us,
               count(*)::bigint as n_events,
               (sum(case when {value_col} is null or isnan({value_col})
                         then 0
                         else round({value_col} * 100, 0)::bigint
                    end))::bigint as sum_cents
        from s group by {key_col}, sid
    """
