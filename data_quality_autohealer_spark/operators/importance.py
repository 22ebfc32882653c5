"""DSIR-style data-selection importance weighting (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling" — public;
reference repo has no analogue, this is LLM-pipeline surface).

Score every raw document by how target-like its hashed word n-gram
(unigram + bigram) distribution is: per-bucket importance weights are
learned from the corpus itself — target docs (e.g. a trusted
high-quality slice; a real pipeline points this at Wikipedia/books and
nothing else changes) versus the rest — and each doc's score is the sum
of its feature counts times the bucket weights. High scores read
"target-like"; curation keeps the top slice.

Engine-exact by construction (the repo's oracle conventions):

- Features hash through the shared 60-bit md5 base hash
  (dedup._hash_base) into ``N_BUCKETS`` buckets.
- DSIR's log-likelihood-ratio weights would be libm ``ln()`` — last-ulp
  engine-dependent. Instead the NORMALIZED polarity weight
  ``w_b = ((t_b+α)·R − (r_b+α)·T) / ((t_b+α)·R + (r_b+α)·T)`` where
  t/r are the bucket's target/raw counts and T/R the (smoothed) totals:
  the cross-products normalize the two distributions exactly in BIGINT
  (t/T vs r/R scale-free), the single division is IEEE exactly-rounded,
  and one HALF_UP micro-int rounding makes per-doc sums
  order-independent exact integers. Monotone in the likelihood ratio,
  bounded [-1, 1] — same selection ORDER as DSIR's log-ratio.
- Unseen buckets (scoring a NEW corpus against stored weights) take the
  smoothed prior ``w0 = (R − T)/(R + T)`` — never silently 0.

Numeric bound: the bigint cross-products require ``(t+α)·R < 2^63`` —
totals below ~3·10^9 features per side. Beyond that (a 100 TB census),
floor-divide t, r, T, R by a common power of two first (deterministic,
both engines) — the ratio is scale-free so the weights are unchanged up
to the documented rounding.

Scale shape (100 TB): one map-side-combined groupBy(doc, bucket) for the
feature stack, one groupBy(bucket) census (≤ N_BUCKETS rows out), the
weight table BROADCAST to the scoring join, one shuffle for the per-doc
integer sum. The totals row rides a broadcast cross-join — no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup

N_BUCKETS = 4096
ALPHA = 1

_D = "cast({} as double)"
WORD_RE = "[a-z]+"


def _words_expr(engine: str, t: str) -> str:
    if engine == "spark":
        return f"regexp_extract_all(lower(coalesce({t}, '')), '{WORD_RE}', 0)"
    return f"regexp_extract_all(lower(coalesce({t}, '')), '{WORD_RE}')"


def _features_expr(engine: str, w: str) -> str:
    """Unigrams + space-joined bigrams of the staged word array ``w``."""
    if engine == "spark":
        big = (f"case when size({w}) < 2 then array() "
               f"else transform(sequence(1, size({w}) - 1), "
               f"i -> concat(element_at({w}, i), ' ', "
               f"element_at({w}, i + 1))) end")
        return f"concat({w}, {big})"
    big = (f"case when len({w}) < 2 then []::varchar[] "
           f"else list_transform(generate_series(1, len({w}) - 1), "
           f"i -> {w}[i] || ' ' || {w}[i + 1]) end")
    return f"list_concat({w}, {big})"


def hashed_ngram_counts(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        n_buckets: int = N_BUCKETS) -> DataFrame:
    """(id, bucket, cnt) — the hashed unigram+bigram feature stack.
    Stage-then-explode per the InferFiltersFromGenerate rule."""
    staged = df.select(
        id_col, F.expr(_words_expr("spark", text_col)).alias("_ws"))
    staged = staged.select(
        id_col, F.expr(_features_expr("spark", "_ws")).alias("_fs"))
    ex = (staged.select(id_col, F.explode_outer("_fs").alias("g"))
          .where("g is not null"))
    bucket = f"({dedup._hash_base('g', 'spark')}) % {n_buckets}"
    return (ex.select(id_col, F.expr(bucket).alias("bucket"))
            .groupBy(id_col, "bucket")
            .agg(F.count(F.lit(1)).alias("cnt")))


def _weights_from_counts(counts: DataFrame, flags: DataFrame,
                         id_col: str, alpha: int) -> DataFrame:
    """Weights from an existing (id, bucket, cnt) stack. Totals come from
    an UNPARTITIONED window over the ≤N_BUCKETS-row census — trivially
    one reducer on a tiny frame, and it avoids re-evaluating the census
    subtree that a separate totals agg + cross-join would force (integer
    sums, so order-independent and engine-exact either way)."""
    pq = (counts.join(flags, id_col)
          .groupBy("bucket")
          .agg((F.lit(alpha) + F.sum(F.expr(
                  "case when _is_t then cnt else 0 end"))).alias("p"),
               (F.lit(alpha) + F.sum(F.expr(
                  "case when _is_t then 0 else cnt end"))).alias("q")))
    pq = pq.selectExpr(
        "bucket", "p", "q",
        "sum(p) over () as _T", "sum(q) over () as _R")
    num = "(p * _R - q * _T)"
    den = "(p * _R + q * _T)"
    w = (f"cast(floor({_D.format(num)} / {_D.format(den)} * "
         f"{_D.format(1000000)} + {_D.format('0.5')}) as bigint)")
    w0 = (f"cast(floor({_D.format('(_R - _T)')} / "
          f"{_D.format('(_R + _T)')} * {_D.format(1000000)} + "
          f"{_D.format('0.5')}) as bigint)")
    return pq.selectExpr("bucket", f"{w} as w_micro", f"{w0} as w0_micro")


def dsir_weights(df: DataFrame, target_pred: str,
                 text_col: str = "text", id_col: str = "doc_id",
                 n_buckets: int = N_BUCKETS,
                 alpha: int = ALPHA) -> DataFrame:
    """Per-bucket importance weights from a corpus split by the
    engine-shared SQL predicate ``target_pred`` (over ``df`` columns).
    Returns one row per OBSERVED bucket plus the totals:
    ``(bucket, w_micro, w0_micro)`` — ``w0_micro`` (constant across
    rows) is the unseen-bucket prior."""
    counts = hashed_ngram_counts(df, text_col, id_col, n_buckets)
    flags = df.selectExpr(id_col, f"({target_pred}) as _is_t")
    return _weights_from_counts(counts, flags, id_col, alpha)


def dsir_scores(df: DataFrame, target_pred: str,
                text_col: str = "text", id_col: str = "doc_id",
                n_buckets: int = N_BUCKETS,
                alpha: int = ALPHA,
                weights: DataFrame | None = None) -> DataFrame:
    """Score EVERY doc:
    ``(id, n_features, dsir_score_micro, score_per_feat_micro, selected)``.

    ``dsir_score_micro`` is the exact integer Σ cnt_b·w_micro_b;
    ``score_per_feat_micro`` the length-normalized HALF_UP average (long
    docs don't win on length alone); ``selected`` cuts at target-like
    (normalized score > 0). Pass stored ``weights`` to score a NEW corpus
    against a previously-learned target (unseen buckets take the prior).
    """
    counts = hashed_ngram_counts(df, text_col, id_col, n_buckets)
    if weights is None:
        # in-corpus: share ONE feature stack between training and scoring
        # (common lineage; Spark evaluates it per branch — at 100×
        # persist(counts) first if the corpus scan dominates). Every
        # scored bucket was observed in training BY CONSTRUCTION, so the
        # unseen-bucket prior is unreachable and the w0 frame (whose max
        # agg would re-evaluate the whole census subtree) is skipped.
        flags = df.selectExpr(id_col, f"({target_pred}) as _is_t")
        weights = _weights_from_counts(counts, flags, id_col, alpha)
        joined = (counts.join(
            F.broadcast(weights.select("bucket", "w_micro")),
            "bucket", "left")
            .selectExpr(id_col, "cnt",
                        "coalesce(w_micro, 0) as _w"))
    else:
        # stored weights (a materialized table — the w0 scan is cheap):
        # buckets the training corpus never saw take the smoothed prior
        w0 = weights.select(F.max("w0_micro").alias("_w0"))
        joined = (counts.join(
            F.broadcast(weights.select("bucket", "w_micro")),
            "bucket", "left")
            .crossJoin(F.broadcast(w0))
            .selectExpr(id_col, "cnt",
                        "coalesce(w_micro, _w0) as _w"))
    scored = (joined.groupBy(id_col)
              .agg(F.sum(F.expr("cnt * _w")).alias("_s"),
                   F.sum("cnt").alias("_n")))
    per = (f"cast(floor(coalesce(_s, 0) / {_D.format('greatest(_n, 1)')} "
           f"+ {_D.format('0.5')}) as bigint)")
    return (df.select(id_col)
            .join(scored, id_col, "left")
            .withColumn("_n", F.expr("coalesce(_n, 0)"))
            .selectExpr(
                id_col,
                "cast(_n as bigint) as n_features",
                "cast(coalesce(_s, 0) as bigint) as dsir_score_micro",
                f"{per} as score_per_feat_micro",
                f"{per} > 0 as selected"))


def save_weights(weights: DataFrame, path: str,
                 n_buckets: int = N_BUCKETS, alpha: int = ALPHA,
                 target_desc: str = "") -> None:
    """Persist a learned weight table (train once against the target
    corpus, score every future crawl wave against it). A ``_dsir_params``
    sidecar rides in the SAME filesystem (sources/fsio — hdfs:/s3a:
    safe); loading validates it so weights trained under one hashing
    config can never silently score under another (the signature-index
    sidecar convention)."""
    import json

    spark = weights.sparkSession
    weights.coalesce(1).write.mode("overwrite").parquet(path)
    from ..sources import fsio
    fsio.write_text(spark, f"{path}/_dsir_params.json", json.dumps(
        {"n_buckets": n_buckets, "alpha": alpha,
         "target": target_desc}, sort_keys=True))


def load_weights(spark, path: str, n_buckets: int = N_BUCKETS,
                 alpha: int = ALPHA) -> DataFrame:
    """Load a persisted weight table; fail loudly on a missing or
    mismatched params sidecar."""
    import json

    from ..sources import fsio
    raw = fsio.read_text(spark, f"{path}/_dsir_params.json")
    if raw is None:
        raise ValueError(
            f"DSIR weights at {path} have no _dsir_params.json sidecar — "
            f"refusing to score against unverifiable hashing params")
    params = json.loads(raw)
    got = {"n_buckets": params.get("n_buckets"), "alpha": params.get("alpha")}
    want = {"n_buckets": n_buckets, "alpha": alpha}
    if got != want:
        raise ValueError(
            f"DSIR weights at {path} were trained with {got}, caller "
            f"expects {want} — scores would be silently wrong")
    weights = spark.read.parquet(path)
    # validate the TABLE, not just the sidecar (ADVICE r06): an empty
    # table scores every doc 0/not-selected and duplicate bucket rows
    # double-count features in the scoring join — both silent
    from pyspark.sql import functions as F
    chk = weights.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("bucket").alias("nb")).collect()[0]
    if int(chk["n"]) == 0 or int(chk["n"]) != int(chk["nb"]):
        raise ValueError(
            f"DSIR weights at {path} are invalid: {int(chk['n'])} rows, "
            f"{int(chk['nb'])} distinct buckets — an empty or "
            f"bucket-duplicated table scores silently wrong; retrain with "
            f"save_weights")
    return weights


def duckdb_dsir_sql(table: str = "documents",
                    target_pred: str = "lang = 'en'",
                    text_col: str = "text", id_col: str = "doc_id",
                    n_buckets: int = N_BUCKETS,
                    alpha: int = ALPHA) -> str:
    """The whole weights+score pipeline as one DuckDB query (twin of
    :func:`dsir_scores` with in-corpus weights)."""
    words = _words_expr("duck", text_col)
    feats = _features_expr("duck", "_ws")
    bucket = f"({dedup._hash_base('g', 'duck')}) % {n_buckets}"
    num = "(p * _R - q * _T)"
    den = "(p * _R + q * _T)"
    w = (f"floor({_D.format(num)} / {_D.format(den)} * "
         f"{_D.format(1000000)} + {_D.format('0.5')})::bigint")
    per = (f"floor(coalesce(_s, 0) / {_D.format('greatest(_n, 1)')} "
           f"+ {_D.format('0.5')})::bigint")
    return f"""
        with base as materialized (
            select {id_col}, ({target_pred}) as _is_t, {words} as _ws
            from {table}
        ),
        fx as (select {id_col}, _is_t, unnest({feats}) as g from base),
        bc as materialized (
            select {id_col}, any_value(_is_t) as _is_t,
                   {bucket} as bucket, count(*)::bigint as cnt
            from fx where g is not null group by {id_col}, {bucket}
        ),
        pq as materialized (
            select bucket,
                   ({alpha} + sum(case when _is_t then cnt else 0 end)
                   )::bigint as p,
                   ({alpha} + sum(case when _is_t then 0 else cnt end)
                   )::bigint as q
            from bc group by bucket
        ),
        tot as (select sum(p)::bigint as _T, sum(q)::bigint as _R from pq),
        w as materialized (
            select bucket, {w} as w_micro from pq, tot
        ),
        s as (
            select bc.{id_col}, sum(bc.cnt * w.w_micro)::bigint as _s,
                   sum(bc.cnt)::bigint as _n
            from bc join w using (bucket) group by bc.{id_col}
        )
        select d.{id_col},
               coalesce(s._n, 0)::bigint as n_features,
               coalesce(s._s, 0)::bigint as dsir_score_micro,
               {per} as score_per_feat_micro,
               {per} > 0 as selected
        from {table} d left join s on d.{id_col} = s.{id_col}
    """
