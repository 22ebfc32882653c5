"""Training-mixture curation operators: deterministic stratified sampling,
quality stratification, and per-group term census — the selection layer a
large-scale training-data pipeline runs AFTER filtering/dedup.

No reference analogue (the reference stops at detect/remediate); these are
web-scale-pipeline necessities in the same first-class style as
operators/dedup.py: every operator is a pair of engine-identical builders
(Spark exprs + DuckDB SQL) so the driver's oracle gate hash-checks them.

Scale shapes:
- ``stratified_sample`` is a pure per-row predicate (hash → fraction →
  compare): shuffle-free, trivially partition-parallel, and REPRODUCIBLE —
  the same (salt, id) always lands on the same side, so re-runs and
  resumed jobs select the identical sample without coordination.
- ``quality_strata`` keeps the exact global-ntile window ONLY as the
  oracle twin (it sorts on a single partition); ``exact_ntile=False`` is
  the scale path — percentile_approx cut points (one agg, bounded driver
  fence) + a shuffle-free per-row bucket lookup, the A2/A8 pattern.
- ``top_terms_per_group`` explodes words (the one genuinely token-volume
  shuffle here) but Spark's hash aggregate does map-side partial counts,
  so shuffle volume is O(distinct (group, word)) per partition, not
  O(tokens); the final top-k is a per-group window over the counted frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text_heuristics as th
from . import dedup

# 6-dp sampling grid: integer mod then one double division — both engines
# produce the bit-identical fraction, so the keep predicate is exact.
_FRAC_MOD = 1_000_000


def _hash_frac_sql(id_expr: str, salt: str, engine: str) -> str:
    """Deterministic uniform fraction in [0, 1) from (salt, id): the shared
    60-bit md5 base hash (dedup._hash_base) mod 10^6 / 10^6."""
    if engine == "spark":
        keyed = f"concat('{salt}:', cast({id_expr} as string))"
    else:
        keyed = f"'{salt}:' || {id_expr}"
    hb = dedup._hash_base(keyed, engine)
    return f"(({hb}) % {_FRAC_MOD}) / cast({_FRAC_MOD} as double)"


def _rate_case_sql(strata_col: str, rates: dict[str, float],
                   default_rate: float) -> str:
    if not rates:  # CASE with zero WHEN branches is a parse error
        return f"cast({default_rate} as double)"
    whens = " ".join(f"when '{s}' then cast({r} as double)"
                     for s, r in sorted(rates.items()))
    return (f"case {strata_col} {whens} "
            f"else cast({default_rate} as double) end")


def stratified_sample(df: DataFrame, rates: dict[str, float],
                      strata_col: str = "lang", id_col: str = "doc_id",
                      default_rate: float = 0.0,
                      salt: str = "samp") -> DataFrame:
    """Deterministic per-stratum subsample: keep a row iff
    hash_frac(salt, id) < rate[stratum]. Changing ``salt`` draws an
    independent sample; rates are exact on the 10^-6 grid."""
    frac = _hash_frac_sql(id_col, salt, "spark")
    rate = _rate_case_sql(strata_col, rates, default_rate)
    # filter on the STAGED column (one md5+conv pass per row, the repo's
    # stage-and-reference convention); round(frac, 6) == frac exactly since
    # frac already lives on the 1e-6 grid, so the predicate is unchanged
    return (df.withColumn("sample_frac", F.expr(f"round({frac}, 6)"))
            .where(F.expr(f"sample_frac < {rate}")))


def duckdb_stratified_sample_sql(table: str, rates: dict[str, float],
                                 strata_col: str = "lang",
                                 id_col: str = "doc_id",
                                 default_rate: float = 0.0,
                                 salt: str = "samp",
                                 select_cols: str = "doc_id, lang") -> str:
    frac = _hash_frac_sql(id_col, salt, "duck")
    rate = _rate_case_sql(strata_col, rates, default_rate)
    return (f"select {select_cols}, round({frac}, 6) as sample_frac "
            f"from {table} where {frac} < {rate}")


def quality_strata(df: DataFrame, score_col: str, n_tiles: int = 4,
                   id_col: str = "doc_id",
                   exact_ntile: bool = True) -> DataFrame:
    """ntile quality stratification + per-stratum census (the curation
    step that feeds mixture weights): deterministic tie-break on id.

    ``exact_ntile=True`` is the ORACLE twin: a global ntile window —
    exactly equal-count tiles, but Spark sorts the whole frame on ONE
    partition (its own WindowExec WARN). ``exact_ntile=False`` is the
    SCALE path (the A2/A8 exact→approx swap): one ``percentile_approx``
    aggregate yields n_tiles−1 cut points (a bounded driver fence), then a
    shuffle-free per-row bucket lookup + the same census agg. Tile counts
    become approximate (value-bucketing: boundary ties land together) —
    the right trade at 10^12 rows, where a single-reducer sort is not.
    """
    if exact_ntile:
        from pyspark.sql.window import Window

        w = Window.orderBy(F.col(score_col).asc(), F.col(id_col).asc())
        tiled = df.withColumn("stratum", F.ntile(n_tiles).over(w))
    else:
        qs = [i / n_tiles for i in range(1, n_tiles)]
        cuts = df.select(F.percentile_approx(
            score_col, qs, 10_000).alias("c")).first()["c"]
        if cuts is None:
            # empty (or all-NULL-score) frame: percentile_approx yields
            # NULL — return the same empty census the exact path produces
            tiled = df.withColumn(
                "stratum", F.lit(None).cast("int")).where(F.lit(False))
        else:
            # bucket b (1-based) = first cut the score does not exceed;
            # scores above every cut land in the top tile. NULL scores sort
            # FIRST under the exact path's ascending window (stratum 1) —
            # mirror that, instead of falling through every <= to the top
            b = F.lit(n_tiles)
            for i in range(n_tiles - 2, -1, -1):
                b = F.when(F.col(score_col) <= F.lit(cuts[i]), i + 1) \
                    .otherwise(b)
            b = F.when(F.col(score_col).isNull(), 1).otherwise(b)
            tiled = df.withColumn("stratum", b.cast("int"))
    return (tiled.groupBy("stratum")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min(score_col).alias("min_score"),
                 F.max(score_col).alias("max_score"))
            .orderBy("stratum"))


def duckdb_quality_strata_sql(table: str, score_expr: str,
                              n_tiles: int = 4,
                              id_col: str = "doc_id") -> str:
    return f"""
        with s as (select {id_col}, {score_expr} as score from {table}),
        t as (select score,
                     ntile({n_tiles}) over (order by score asc, {id_col} asc)
                         as stratum
              from s)
        select stratum, count(*)::bigint as n_docs,
               min(score) as min_score, max(score) as max_score
        from t group by stratum order by stratum
    """


def token_budget_sample(df: DataFrame, budgets: dict[str, int],
                        token_col: str = "word_count",
                        strata_col: str = "lang", id_col: str = "doc_id",
                        default_budget: int = 0,
                        salt: str = "tb",
                        keep_cols: tuple = ()) -> DataFrame:
    """Deterministic per-stratum doc selection up to a TOKEN budget (the
    mixture knob real training mixes are specified in — tokens, not docs):
    docs ordered by the shared hash fraction (reproducible under re-runs /
    resume, same contract as stratified_sample), kept while the stratum's
    running token total stays within budget. Whole docs only — the first
    doc that would overflow the budget is dropped (along with the rest of
    its stratum order).

    Scale shape: one window per stratum over (frac, id) carrying a bigint
    cumsum — the sequence_pack shape. Strata are languages (dozens), so
    per-stratum sorts distribute; a single mega-stratum would need the
    range-partitioned two-pass cumsum instead.
    """
    frac = _hash_frac_sql(id_col, salt, "spark")
    budget = _rate_case_sql(strata_col, {s: float(b)
                                         for s, b in budgets.items()},
                            float(default_budget))
    from pyspark.sql.window import Window

    w = (Window.partitionBy(strata_col)
         .orderBy(F.expr(f"round({frac}, 6)").asc(), F.col(id_col).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (df.withColumn("cum_tokens",
                          F.sum(F.col(token_col).cast("long")).over(w))
            .where(F.col("cum_tokens") <= F.expr(budget).cast("long"))
            .select(id_col, strata_col,
                    F.col(token_col).cast("long").alias("n_tokens"),
                    "cum_tokens", *keep_cols))


def duckdb_token_budget_sql(table: str, budgets: dict[str, int],
                            token_expr: str = "word_count",
                            strata_col: str = "lang",
                            id_col: str = "doc_id",
                            default_budget: int = 0,
                            salt: str = "tb") -> str:
    frac = _hash_frac_sql(id_col, salt, "duck")
    budget = _rate_case_sql(strata_col, {s: float(b)
                                         for s, b in budgets.items()},
                            float(default_budget))
    return f"""
        with t as (
            select {id_col}, {strata_col},
                   ({token_expr})::bigint as n_tokens,
                   round({frac}, 6) as _frac
            from {table}
        ),
        c as (
            select {id_col}, {strata_col}, n_tokens,
                   -- DuckDB sum(bigint) over a window yields HUGEINT,
                   -- which pandas/driver hashing renders as float64 —
                   -- cast back to match Spark's long
                   (sum(n_tokens) over (
                       partition by {strata_col}
                       order by _frac asc, {id_col} asc
                       rows between unbounded preceding and current row)
                   )::bigint as cum_tokens
            from t
        )
        select {id_col}, {strata_col}, n_tokens, cum_tokens
        from c where cum_tokens <= ({budget})::bigint
    """


def top_terms_per_group(df: DataFrame, text_col: str = "text",
                        group_col: str = "lang", k: int = 10) -> DataFrame:
    """Top-k most frequent whitespace tokens per group (vocabulary census).
    explode → hash-agg count (map-side partial combine) → per-group
    row_number top-k; ties broken alphabetically for determinism."""
    from pyspark.sql.window import Window

    words = (df.select(group_col,
                       F.explode(F.expr(th._spark_words(text_col)))
                       .alias("term"))
             .groupBy(group_col, "term")
             .agg(F.count(F.lit(1)).cast("long").alias("n")))
    w = (Window.partitionBy(group_col)
         .orderBy(F.col("n").desc(), F.col("term").asc()))
    return (words.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def duckdb_top_terms_sql(table: str, text_col: str = "text",
                         group_col: str = "lang", k: int = 10) -> str:
    words = th._duck_words(text_col)
    return f"""
        with w as (select {group_col}, unnest({words}) as term from {table}),
        c as (select {group_col}, term, count(*)::bigint as n
              from w group by {group_col}, term),
        r as (select {group_col}, term, n,
                     row_number() over (partition by {group_col}
                         order by n desc, term asc) as rank
              from c)
        select {group_col}, term, n, rank::int as rank from r
        where rank <= {k}
    """


# ---------------------------------------------------------------------------
# Domain blocklist filtering (round 6)
# ---------------------------------------------------------------------------


def apply_domain_blocklist(df: DataFrame, blocklist: DataFrame,
                           url_col: str = "url",
                           id_col: str = "doc_id") -> DataFrame:
    """UT1-style domain blocklist filtering: flag every doc whose URL's
    REGISTERED domain appears in the blocklist — subdomains match for
    free (``ads.host3.example`` collapses to ``host3.example`` before the
    join), the semantics curation pipelines want from adult/malware lists.

    ``blocklist``: one column ``domain`` of registered domains. It is
    broadcast (real UT1 categories are a few MB — never shuffle the
    corpus against a dim table); the corpus side is a shuffle-free
    projection, so the whole op adds zero exchanges to a scan.

    Returns (id, host, reg_domain, blocked) — a flag, not a drop:
    downstream decides (curation convention: null/absence is never a
    silent drop)."""
    from ..functions import urls
    base = (df.selectExpr(id_col, f"{urls.host_sql(url_col, 'spark')} as host")
            .selectExpr(id_col, "host",
                        f"{urls.registered_domain_sql('host', 'spark')}"
                        f" as reg_domain"))
    bl = blocklist.selectExpr("domain as _bl_domain").distinct()
    return (base.join(F.broadcast(bl),
                      base.reg_domain == F.col("_bl_domain"), "left")
            .selectExpr(id_col, "host", "reg_domain",
                        "_bl_domain is not null as blocked"))


# deterministic sandbox stand-in for an external UT1 list: registered
# domains whose md5 starts with hex 0-3 (a stable ~25% of domains)
_BL_PRED = "substring(md5(reg_domain), 1, 1) in ('0', '1', '2', '3')"


def synthetic_blocklist(df: DataFrame, url_col: str = "url",
                        id_col: str = "doc_id") -> DataFrame:
    """Derive the deterministic stand-in blocklist (``domain`` column) from
    the corpus itself — no external data ships in this sandbox; a real
    pipeline reads the UT1 parquet/CSV instead and nothing else changes."""
    from ..functions import urls
    return (df.selectExpr(f"{urls.host_sql(url_col, 'spark')} as host")
            .selectExpr(f"{urls.registered_domain_sql('host', 'spark')}"
                        f" as reg_domain")
            .where(_BL_PRED)
            .selectExpr("reg_domain as domain").distinct())


def duckdb_domain_blocklist_sql(table_with_url: str, url_col: str = "url",
                                id_col: str = "doc_id") -> str:
    """Engine twin of :func:`apply_domain_blocklist` fed by
    :func:`synthetic_blocklist` — one query, same md5 predicate."""
    from ..functions import urls
    host = urls.host_sql(url_col, "duck")
    reg = urls.registered_domain_sql("host", "duck")
    pred = _BL_PRED.replace("substring(", "substr(")
    return f"""
        with base as (
            select {id_col}, host, {reg} as reg_domain
            from (select {id_col}, {host} as host from {table_with_url})
        ), bl as (
            select distinct reg_domain as bl_domain from base
            where {pred}
        )
        select {id_col}, host, reg_domain,
               bl.bl_domain is not null as blocked
        from base left join bl on base.reg_domain = bl.bl_domain
    """


# ---------------------------------------------------------------------------
# Temperature-weighted mixture allocation (round 6)
# ---------------------------------------------------------------------------


def temperature_mix_allocation(df: DataFrame, total_budget: int,
                               alpha: float = 0.5,
                               token_col: str = "word_count",
                               strata_col: str = "lang",
                               scale: int = 1_000_000) -> DataFrame:
    """Split a total token budget across strata by temperature sampling
    (multilingual-training standard: weight T_i^alpha instead of T_i, so
    low-resource strata are up-sampled; alpha=1 is proportional, alpha→0
    uniform).

    Exactness: alpha=0.5 (the default) computes sqrt, which IEEE-754
    requires to be exactly rounded — bit-identical in Spark, DuckDB and
    numpy — then rounds HALF_UP to a micro-int; weight sums and the
    allocation are pure bigint arithmetic from there (order-independent,
    oracle-checkable). Any other alpha goes through pow(), whose last ulp
    is libm's choice — fine for the CLI, NOT oracle-exact (CLAUDE.md
    ln()/libm rule).

    Allocations floor-divide, so up to n_strata-1 tokens of the budget
    stay unallocated — callers wanting exhaustion give the remainder to
    their largest stratum. ``total_budget * max(s_micro)`` must stay
    below 2^63, i.e. budget below ~9.2e18 / (sqrt(max stratum tokens) ·
    scale): s_micro ≈ sqrt(tokens)·scale, so at 1e12 tokens/stratum and
    the default scale=1e6 the budget is bounded at ~9.2e6; callers with
    planet-scale budgets drop ``scale`` to 1e3 (bound ~9.2e9) or pre-
    divide the budget.

    Scale shape: one agg to strata cardinality (dozens of languages /
    thousands of domains), then an unpartitioned window over that tiny
    frame — never over the corpus.

    Returns (strata, token_count, weight, alloc_tokens).
    """
    from pyspark.sql.window import Window
    per = df.groupBy(strata_col).agg(
        F.sum(F.col(token_col).cast("long")).alias("token_count"))
    if alpha == 0.5:
        s = f"floor(sqrt(cast(token_count as double)) * {scale} + 0.5)"
    else:
        s = (f"floor(power(cast(token_count as double), "
             f"cast({alpha!r} as double)) * {scale} + 0.5)")
    staged = per.selectExpr(strata_col, "token_count",
                            f"cast({s} as bigint) as s_micro")
    total = F.sum("s_micro").over(Window.partitionBy())
    return (staged.withColumn("_tot", total)
            .selectExpr(
                strata_col, "token_count",
                "floor(s_micro / cast(_tot as double) * 1e6 + 0.5) / 1e6"
                " as weight",
                f"({total_budget} * s_micro) div _tot as alloc_tokens"))


def duckdb_temperature_mix_sql(table: str, total_budget: int,
                               token_expr: str = "word_count",
                               strata_col: str = "lang",
                               scale: int = 1_000_000) -> str:
    """Engine twin of :func:`temperature_mix_allocation` (alpha=0.5 only —
    the sqrt path is the exactly-rounded one)."""
    return f"""
        with per as (
            select {strata_col}, sum(({token_expr})::bigint)::bigint
                       as token_count
            from {table} group by {strata_col}
        ), staged as (
            select {strata_col}, token_count,
                   floor(sqrt(token_count::double) * {scale} + 0.5)::bigint
                       as s_micro
            from per
        ), tot as (
            select sum(s_micro)::bigint as t from staged
        )
        select {strata_col}, token_count,
               floor(s_micro / (t::double) * 1e6 + 0.5) / 1e6 as weight,
               ({total_budget} * s_micro) // t as alloc_tokens
        from staged cross join tot
    """


# ---------------------------------------------------------------------------
# CCNet-style per-group stratification (round 6)
# ---------------------------------------------------------------------------


def grouped_quality_strata(df: DataFrame, score_col: str,
                           group_col: str = "lang", n_tiles: int = 3,
                           id_col: str = "doc_id",
                           exact_ntile: bool = True,
                           labels: tuple = ("tail", "middle", "head")
                           ) -> DataFrame:
    """CCNet-style per-group quality buckets: ntile WITHIN each group
    (head/middle/tail per language is the canonical web-filter split —
    Wenzek et al. 2020 bucket by per-language LM score; any deterministic
    score column works, the distilled classifier's integer score being
    the oracle-exact feed).

    Unlike the global ``quality_strata`` window, the exact path here
    distributes: each reducer sorts ONE group's rows. It is still the
    oracle twin only — a 10^12-row mega-language needs
    ``exact_ntile=False``: per-group percentile_approx cut points (one
    agg to groups × (n_tiles−1) doubles), BROADCAST back, then a
    shuffle-free per-row bucket lookup feeding the same census (tile
    counts become approximate at value ties; NULL scores land in the
    bottom bucket on both paths).

    Returns (group, stratum, bucket, n_docs, min_score, max_score);
    ``bucket`` labels apply when ``len(labels) == n_tiles``.
    """
    from pyspark.sql.window import Window
    if exact_ntile:
        w = Window.partitionBy(group_col).orderBy(
            F.col(score_col).asc(), F.col(id_col).asc())
        tiled = df.withColumn("stratum", F.ntile(n_tiles).over(w))
    else:
        qs = [i / n_tiles for i in range(1, n_tiles)]
        cuts = df.groupBy(group_col).agg(
            F.percentile_approx(score_col, qs, 10_000).alias("_cuts"))
        b = F.lit(n_tiles)
        for i in range(n_tiles - 2, -1, -1):
            b = F.when(F.col(score_col) <= F.expr(f"_cuts[{i}]"), i + 1) \
                .otherwise(b)
        b = F.when(F.col(score_col).isNull(), 1).otherwise(b)
        tiled = (df.join(F.broadcast(cuts), group_col)
                 .withColumn("stratum", b.cast("int")))
    out = (tiled.groupBy(group_col, "stratum")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.min(score_col).alias("min_score"),
                F.max(score_col).alias("max_score")))
    lab = "cast(null as string)"
    if labels and len(labels) == n_tiles:
        lab = ("case stratum " + " ".join(
            f"when {i + 1} then '{l}'" for i, l in enumerate(labels))
            + " end")
    return out.selectExpr(group_col, "stratum", f"{lab} as bucket",
                          "n_docs", "min_score", "max_score") \
        .orderBy(group_col, "stratum")


def duckdb_grouped_strata_sql(table_sql: str, score_col: str,
                              group_col: str = "lang", n_tiles: int = 3,
                              id_col: str = "doc_id",
                              labels: tuple = ("tail", "middle", "head")
                              ) -> str:
    """Engine twin of :func:`grouped_quality_strata` (exact path).
    ``table_sql``: a full SELECT yielding (id, group, score)."""
    lab = "cast(null as varchar)"
    if labels and len(labels) == n_tiles:
        lab = ("case stratum " + " ".join(
            f"when {i + 1} then '{l}'" for i, l in enumerate(labels))
            + " end")
    return f"""
        with _gstrata as (
            select {group_col}, {score_col},
                   ntile({n_tiles}) over (partition by {group_col}
                       order by {score_col} asc, {id_col} asc) as stratum
            from ({table_sql})
        )
        select {group_col}, stratum, {lab} as bucket,
               count(*)::bigint as n_docs,
               min({score_col}) as min_score,
               max({score_col}) as max_score
        from _gstrata group by {group_col}, stratum
        order by {group_col}, stratum
    """
