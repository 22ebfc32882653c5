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
from pyspark.sql.types import BooleanType, LongType, StructField, StructType

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


# per-worker trigram → bucket memo: the distinct-trigram universe of a
# lowercased text corpus is tiny next to the occurrence stream, so each md5
# is computed once per worker process, not once per occurrence.  Pure cache
# (hash of the key alone), safe across tasks under worker reuse.
_BUCKET_MEMO: dict[tuple[int, str], int] = {}


def _bucket_of(g: str, n_buckets: int) -> int:
    """Python twin of _bucket_expr: md5-prefix 60-bit hash mod n_buckets —
    bit-identical to the Spark/DuckDB expression (same md5 of the UTF-8
    bytes, same 15-hex-digit prefix, same positive modulus)."""
    key = (n_buckets, g)
    b = _BUCKET_MEMO.get(key)
    if b is None:
        import hashlib
        b = int(hashlib.md5(g.encode("utf-8")).hexdigest()[:15],
                16) % n_buckets
        _BUCKET_MEMO[key] = b
    return b


def _doc_trigram_counts(t: str) -> dict[str, int]:
    """Counter of char-3-grams of the (already lowercased) text — the
    Python twin of _trigrams_expr (code-point slicing, < 3 chars → none)."""
    from collections import Counter
    if len(t) < 3:
        return {}
    return Counter([t[i:i + 3] for i in range(len(t) - 2)])


def distill_quality_classifier(labeled: DataFrame,
                               label_col: str = "keep",
                               text_col: str = "text",
                               id_col: str = "doc_id",
                               n_buckets: int = N_BUCKETS,
                               alpha: int = ALPHA,
                               salt: str = SALT,
                               train_frac: str = TRAIN_FRAC) -> DataFrame:
    """Train on the hash-fraction split, score EVERY doc. Returns
    (id, score_micro, keep_pred, keep_heur, is_train).

    This is the LAZY, all-SQL shape: nothing runs until an action, and a
    consumer that only counts rows lets Catalyst prune the whole trigram
    stack (the registered ``quality_classifier`` projection query depends
    on that).  Aggregation-shaped consumers that force every value
    (calibration census, CCNet buckets, keep-best) should call
    :func:`distill_quality_classifier_fast` — value-identical (asserted in
    tests/test_distill.py) and ~10× cheaper when fully evaluated.
    """
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


_spread = dedup._spread  # shared scale-adaptive repartition (see dedup.py)


def distill_quality_classifier_fast(labeled: DataFrame,
                                    label_col: str = "keep",
                                    text_col: str = "text",
                                    id_col: str = "doc_id",
                                    n_buckets: int = N_BUCKETS,
                                    alpha: int = ALPHA,
                                    salt: str = SALT,
                                    train_frac: str = TRAIN_FRAC
                                    ) -> DataFrame:
    """Value-identical twin of :func:`distill_quality_classifier` for
    consumers that evaluate every score.

    Round-7 shape (guide §2.3 "aggregate before you shuffle" + §4.2): the
    JVM explode of ~300 trigrams/doc with one md5 per OCCURRENCE (measured
    34 s per pass at sf1.0, and the old plan ran the stack once for train
    and once for score) is replaced by two Arrow passes over a checkpointed
    (id, lowered-text, label, is_train) frame:

    - pass 1 emits PER-PARTITION partial (bucket, p, q) occurrence counts
      over the train split (≤ n_buckets rows per partition — the shuffle
      carries a few thousand rows instead of the 10⁷-row trigram stack),
      and the weight formula runs unchanged in Spark SQL on the exact
      integer sums;
    - the ≤ n_buckets weight rows are collected (the bounded-fence rule the
      k-means centroid loop already uses) and pass 2 computes each doc's
      exact integer score in one closure — ZERO shuffles end to end.

    Every arithmetic step is the same exact-integer computation as before
    (md5-prefix buckets, occurrence counts, one IEEE division in SQL for
    w_micro, order-independent integer score sums), so the output is
    value-identical — asserted against the DuckDB twin by the driver's
    hash gate and in tests/test_distill.py determinism tests.
    """
    frac = curation._hash_frac_sql(id_col, salt, "spark")
    base = labeled.selectExpr(
        id_col, f"{label_col} as _lab",
        f"lower(coalesce({text_col}, '')) as _t").withColumn(
        "is_train", F.expr(f"{frac} < {_D.format(train_frac)}"))
    # one materialization feeds the train pass, the score pass and the
    # echoed label columns (without it the upstream labeling plan — often a
    # full signal computation — would re-run per consumer); spread first so
    # the Python passes use every core
    base = _spread(base).localCheckpoint(eager=True)

    def _pq_partials(batches):
        import pandas as pd
        p = [0] * n_buckets
        q = [0] * n_buckets
        for pdf in batches:
            for t, lab in zip(pdf["_t"].tolist(), pdf["_lab"].tolist()):
                acc = p if lab else q
                for g, c in _doc_trigram_counts(t).items():
                    acc[_bucket_of(g, n_buckets)] += c
        rows = [(b, p[b], q[b]) for b in range(n_buckets)
                if p[b] or q[b]]
        yield pd.DataFrame(rows, columns=["bucket", "p", "q"])

    partials = base.where("is_train").select("_t", "_lab").mapInPandas(
        _pq_partials, schema="bucket long, p long, q long")
    pq = partials.groupBy("bucket").agg(
        (F.lit(alpha) + F.sum("p")).alias("p"),
        (F.lit(alpha) + F.sum("q")).alias("q"))
    w = (f"cast(floor((p - q) / (p + q) * {_D.format(1000000)} "
         f"+ {_D.format('0.5')}) as bigint)")
    wrows = pq.selectExpr("bucket", f"{w} as w_micro").collect()
    wmap = {int(r["bucket"]): int(r["w_micro"]) for r in wrows}

    id_field = base.schema[id_col]
    out_schema = StructType([
        id_field,
        StructField("score_micro", LongType()),
        StructField("keep_pred", BooleanType()),
        StructField("keep_heur", BooleanType()),
        StructField("is_train", BooleanType()),
    ])

    def _score(batches):
        import pandas as pd
        for pdf in batches:
            scores = []
            for t in pdf["_t"].tolist():
                s = 0
                for g, c in _doc_trigram_counts(t).items():
                    wb = wmap.get(_bucket_of(g, n_buckets))
                    if wb is not None:
                        s += c * wb
                scores.append(s)
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "score_micro": pd.Series(scores, dtype="int64"),
                "keep_pred": [s > 0 for s in scores],
                "keep_heur": pdf["_lab"].astype("bool"),
                "is_train": pdf["is_train"].astype("bool"),
            })

    return base.mapInPandas(_score, schema=out_schema)


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
