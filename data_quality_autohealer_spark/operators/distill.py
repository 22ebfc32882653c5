"""Quality-classifier distillation (VERDICT r05 #7): a fastText-style
supervised linear head over hashed character-trigram features, trained on
the heuristic keep/drop labels — the standard web-filter pattern (public:
Joulin et al. 2016 fastText; NBSVM, Wang & Manning 2012): distill the
rule ensemble into ONE calibrated score the curation layer can cut on.

Deterministic, closed-form, engine-exact by construction:

- Features: lowercased char 3-grams hashed into ``n_buckets`` buckets via
  the repo's shared 60-bit md5 base hash (dedup._hash_base) — the one
  cross-engine hash.
- Weights: NBSVM-inspired *polarity* weights
  ``w_b = round6((p_b - q_b) / (p_b + q_b))`` with additive smoothing,
  where p/q are the bucket's trigram counts over keep/drop training docs.
  Deliberately NOT a log-count ratio: ln() is libm-dependent at the last
  ulp and could flip a 6dp rounding between JVM and DuckDB, while
  (p-q)/(p+q) is a single IEEE-exact division of exact integers —
  monotone in p/q, bounded [-1, 1], same per-feature polarity.
- Scores: weights are stored as micro-ints (×1e6, HALF_UP) so the per-doc
  score is an ORDER-INDEPENDENT exact integer sum
  ``score_micro = Σ cnt_b * w_micro_b`` — no float accumulation anywhere.
- Train split: the shared deterministic hash-fraction predicate
  (curation._hash_frac_sql), train_frac of docs; everything is scored.

Scale shape (100 TB): the trigram stack is a map-side-combined groupBy on
(doc, bucket); the weight table is ``n_buckets`` rows — broadcast to the
scoring join; one shuffle for the per-doc integer sum. No driver-side
loops, no iterations, no floats in any aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import curation, dedup

N_BUCKETS = 2048
ALPHA = 1                # additive smoothing (counts, exact)
TRAIN_FRAC = "0.8"       # hash-fraction train split, 1e-6 grid
SALT = "distill"

_D = "cast({} as double)"


def _trigrams_expr(engine: str, t: str) -> str:
    """Char-3-gram array of the (already lowercased/coalesced) ``t``."""
    if engine == "spark":
        # sequence(1, 0) DESCENDS in Spark — guard short strings explicitly
        return (f"case when length({t}) < 3 then array() "
                f"else transform(sequence(1, length({t}) - 2), "
                f"i -> substring({t}, i, 3)) end")
    return (f"list_transform(generate_series(1, "
            f"greatest(len({t}) - 2, 0)), i -> substr({t}, i, 3))")


def _bucket_expr(engine: str, g: str, n_buckets: int) -> str:
    return f"({dedup._hash_base(g, engine)}) % {n_buckets}"


def hashed_trigram_counts(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id",
                          n_buckets: int = N_BUCKETS) -> DataFrame:
    """(id, bucket, cnt) — the hashed feature stack. Stage-then-explode
    per the InferFiltersFromGenerate rule."""
    staged = df.select(
        id_col, F.expr(f"lower(coalesce({text_col}, ''))").alias("_t"))
    staged = staged.select(
        id_col, F.expr(_trigrams_expr("spark", "_t")).alias("_tg"))
    ex = (staged.select(id_col, F.explode_outer("_tg").alias("g"))
          .where("g is not null"))
    return (ex.select(id_col, F.expr(
                _bucket_expr("spark", "g", n_buckets)).alias("bucket"))
            .groupBy(id_col, "bucket")
            .agg(F.count(F.lit(1)).alias("cnt")))


def train_polarity_weights(labeled: DataFrame, label_col: str = "keep",
                           text_col: str = "text", id_col: str = "doc_id",
                           n_buckets: int = N_BUCKETS,
                           alpha: int = ALPHA) -> DataFrame:
    """(bucket, w_micro) from a TRAINING frame carrying ``label_col``."""
    counts = hashed_trigram_counts(labeled, text_col, id_col, n_buckets)
    j = counts.join(labeled.select(id_col, label_col), id_col)
    pq = j.groupBy("bucket").agg(
        (F.lit(alpha) + F.sum(F.expr(
            f"case when {label_col} then cnt else 0 end"))).alias("p"),
        (F.lit(alpha) + F.sum(F.expr(
            f"case when {label_col} then 0 else cnt end"))).alias("q"))
    w = (f"cast(floor((p - q) / (p + q) * {_D.format(1000000)} "
         f"+ {_D.format('0.5')}) as bigint)")
    return pq.selectExpr("bucket", f"{w} as w_micro")


def score_documents(df: DataFrame, weights: DataFrame,
                    text_col: str = "text", id_col: str = "doc_id",
                    n_buckets: int = N_BUCKETS) -> DataFrame:
    """(id, score_micro, keep_pred): exact integer score sum; docs with no
    trigrams score 0. The weight table is broadcast (n_buckets rows)."""
    counts = hashed_trigram_counts(df, text_col, id_col, n_buckets)
    scored = (counts.join(F.broadcast(weights), "bucket")
              .groupBy(id_col)
              .agg(F.sum(F.expr("cnt * w_micro")).alias("_s")))
    return (df.select(id_col)
            .join(scored, id_col, "left")
            .selectExpr(id_col,
                        "cast(coalesce(_s, 0) as bigint) as score_micro",
                        "coalesce(_s, 0) > 0 as keep_pred"))


def distill_quality_classifier(labeled: DataFrame,
                               label_col: str = "keep",
                               text_col: str = "text",
                               id_col: str = "doc_id",
                               n_buckets: int = N_BUCKETS,
                               alpha: int = ALPHA,
                               salt: str = SALT,
                               train_frac: str = TRAIN_FRAC) -> DataFrame:
    """Train on the hash-fraction split, score EVERY doc. Returns
    (id, score_micro, keep_pred, keep_heur, is_train)."""
    frac = curation._hash_frac_sql(id_col, salt, "spark")
    staged = labeled.withColumn(
        "is_train", F.expr(f"{frac} < {_D.format(train_frac)}"))
    weights = train_polarity_weights(
        staged.where("is_train"), label_col, text_col, id_col,
        n_buckets, alpha)
    scores = score_documents(staged, weights, text_col, id_col, n_buckets)
    return (scores.join(
        staged.selectExpr(id_col, f"{label_col} as keep_heur", "is_train"),
        id_col))


def duckdb_distill_sql(labels_cte: str, label_col: str = "keep",
                       text_col: str = "text", id_col: str = "doc_id",
                       n_buckets: int = N_BUCKETS, alpha: int = ALPHA,
                       salt: str = SALT,
                       train_frac: str = TRAIN_FRAC) -> str:
    """The whole train+score pipeline as one DuckDB query.
    ``labels_cte`` must select ``{id_col}, {text_col}, {label_col}``."""
    frac = curation._hash_frac_sql(id_col, salt, "duck")
    tg = _trigrams_expr("duck", "_t")
    bucket = _bucket_expr("duck", "g", n_buckets)
    w = (f"floor((p - q) / (p + q) * {_D.format(1000000)} "
         f"+ {_D.format('0.5')})::bigint")
    return f"""
        with labs as materialized ({labels_cte}),
        base as materialized (
            select {id_col}, {label_col},
                   {frac} < {_D.format(train_frac)} as is_train,
                   lower(coalesce({text_col}, '')) as _t
            from labs
        ),
        tg as (select {id_col}, {label_col}, is_train, unnest({tg}) as g
               from base),
        bc as materialized (
            select {id_col}, any_value({label_col}) as {label_col},
                   any_value(is_train) as is_train,
                   {bucket} as bucket, count(*)::bigint as cnt
            from tg group by {id_col}, {bucket}
        ),
        w as materialized (
            select bucket, {w} as w_micro from (
                select bucket,
                       ({alpha} + sum(case when {label_col} then cnt
                                      else 0 end))::bigint as p,
                       ({alpha} + sum(case when {label_col} then 0
                                      else cnt end))::bigint as q
                from bc where is_train group by bucket
            )
        ),
        s as (
            select bc.{id_col},
                   sum(bc.cnt * w.w_micro)::bigint as _s
            from bc join w using (bucket) group by bc.{id_col}
        )
        select base.{id_col},
               coalesce(s._s, 0)::bigint as score_micro,
               coalesce(s._s, 0) > 0 as keep_pred,
               base.{label_col} as keep_heur,
               base.is_train
        from base left join s on base.{id_col} = s.{id_col}
    """
