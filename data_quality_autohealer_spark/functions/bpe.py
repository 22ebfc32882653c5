"""Deterministic distributed BPE tokenizer training (VERDICT r05 #3).

Reference parity: the reference pipeline budgets text by token counts but
ships only a fixed regex scheme (no analogue of learned vocab — this is a
first-class addition for the LLM-data-pipeline layer; see SURVEY §2.15).

Algorithm (canonical byte-pair encoding, Sennrich et al. 2016, public):
pre-tokenize to lowercase ``[a-z]+`` words, split each word into single
characters plus a ``</w>`` end-of-word marker, then repeat ``num_merges``
times: count adjacent symbol pairs weighted by word frequency, merge the
most frequent pair (ties broken lexicographically on (left, right)), and
re-segment every word. Fixed merge count + total tie order = byte-stable
merges on any engine.

Engine-identical representation — the double-delimiter trick
------------------------------------------------------------
A word's symbol sequence is stored as a STRING with each boundary marked
by ``||`` and the ends wrapped: ``[h,e,y,</w>]`` -> ``||h||e||y||</w>||``.
Applying merge (l, r) is then ONE literal string replace::

    replace(repr, '|l||r|', '|lr|')

Both Spark's and DuckDB's ``replace`` scan left-to-right non-overlapping,
and because adjacent pair occurrences share TWO delimiter characters while
the pattern consumes only one on each side, chained merges work exactly
like the canonical pairwise pass: ``a a a a`` -> ``aa aa`` (a single-space
delimiter would yield ``aa a a`` — the first match eats the shared
boundary). Symbols never contain ``|``, so a pattern can never match a
symbol's interior, and no merge rule carries ``</w>`` on its LEFT side
(nothing follows a word-final symbol), so applying merges to a whole
document's concatenated representation can never match across word
boundaries — document tokenization is therefore a pure per-row expression
chain with ZERO shuffles. tests/test_bpe.py proves equality against a
pure-Python canonical BPE on adversarial words (runs, alternations).

Scale shape (100 TB): training aggregates the WORD CENSUS once (the only
corpus-wide shuffle — distinct words, not occurrences); each of the R
merge rounds shuffles only (symbol-pair, freq) partial aggregates over
census rows and collects exactly ONE row to the driver. Tokenization
applies R literal replaces per document — no join, no shuffle, stays in
whole-stage codegen. For a trillion-token corpus, cap the census with
``min_freq`` (rare-word tail does not move pair counts at the head).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

END_WORD = "</w>"
WORD_RE = "[a-z]+"
_ALLOWED = set("abcdefghijklmnopqrstuvwxyz</>")

DEFAULT_MERGES = 16


# ---------------------------------------------------------------------------
# Spark side
# ---------------------------------------------------------------------------


def word_census(df: DataFrame, text_col: str = "text",
                min_freq: int = 1) -> DataFrame:
    """(word, freq) census of lowercase ``[a-z]+`` runs — the one
    corpus-wide aggregation training needs. explode_outer + null guard per
    the InferFiltersFromGenerate rule (CLAUDE.md)."""
    staged = df.select(
        F.expr(f"regexp_extract_all(lower(coalesce({text_col}, '')), "
               f"'{WORD_RE}', 0)").alias("_ws"))
    words = (staged.select(F.explode_outer("_ws").alias("word"))
             .where(F.col("word").isNotNull()))
    census = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    if min_freq > 1:
        census = census.where(F.col("freq") >= min_freq)
    return census


def _initial_repr_expr(word_col: str = "word"):
    # 'ab' -> '||a||b||</w>||'
    return F.expr(f"concat('||', regexp_replace({word_col}, '(.)', '$1||'), "
                  f"'{END_WORD}||')")


def _merge_pattern(left: str, right: str) -> tuple[str, str]:
    bad = (set(left) | set(right)) - _ALLOWED
    if bad:  # symbols are [a-z]+ and </w> concatenations by construction
        raise ValueError(f"unexpected symbol characters {bad!r}")
    return f"|{left}||{right}|", f"|{left}{right}|"


# word-census sizes up to this collect to the driver for the in-memory
# canonical trainer (a census row is a short word + a count — 2M rows is a
# few tens of MB, the bounded-fence rule); larger vocabularies keep the
# fully distributed loop
DRIVER_CENSUS_MAX = 200_000


def _train_merges_driver(words: dict[str, int],
                         num_merges: int) -> list[dict]:
    """Canonical in-memory BPE over a (word → freq) census — the same
    overlapping pair counts, (freq desc, lhs asc, rhs asc) argmax and
    left-to-right non-overlapping merge application as the distributed
    loop (ASCII string ordering is identical in Python and Spark), so the
    merge list is byte-identical (tests/test_bpe.py)."""
    from collections import Counter

    vocab = {w: tuple(w) + (END_WORD,) for w in words}
    merges: list[dict] = []
    for rank in range(1, num_merges + 1):
        counts: Counter = Counter()
        for w, f in words.items():
            syms = vocab[w]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            raise ValueError(
                f"corpus exhausted after {rank - 1} merges; "
                f"num_merges={num_merges} needs a larger corpus")
        (left, right), f = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append({"merge_rank": rank, "lhs": left, "rhs": right,
                       "merged": left + right, "freq": int(f)})
        for w, syms in vocab.items():
            if left not in syms:
                continue
            new, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == left
                        and syms[i + 1] == right):
                    new.append(left + right)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            vocab[w] = tuple(new)
    return merges


def train_bpe_merges(df: DataFrame, text_col: str = "text",
                     num_merges: int = DEFAULT_MERGES,
                     min_freq: int = 1,
                     census_driver_max: int = DRIVER_CENSUS_MAX
                     ) -> list[dict]:
    """Train ``num_merges`` BPE merges; returns
    ``[{"merge_rank", "lhs", "rhs", "merged", "freq"}, ...]``.

    Round 7 (guide §1.2 — fix the distributed algorithm first): the word
    census is tiny next to the corpus (distinct lowercase words), so when
    it fits ``census_driver_max`` rows it is collected ONCE and the merge
    loop runs in memory — num_merges Spark jobs collapse into one
    aggregation job. Byte-identical merges to the distributed loop
    (asserted in tests/test_bpe.py); the distributed path below remains
    for larger vocabularies and stays the documented oracle twin.

    Distributed path, each round: stage the symbol array, posexplode
    adjacent pairs, one partial-aggregated groupBy over the census, argmax
    by (freq desc, lhs asc, rhs asc) — a 1-row collect — then one literal
    replace appended to the census's repr lineage. Raises if the corpus
    runs out of mergeable pairs before ``num_merges`` (the fixed-depth
    DuckDB oracle twin cannot terminate early, so neither may we)."""
    census = (word_census(df, text_col, min_freq)
              .withColumn("repr", _initial_repr_expr("word"))
              .persist())
    n_census = census.count()
    if n_census <= census_driver_max:
        try:
            rows = census.select("word", "freq").collect()
        finally:
            census.unpersist()
        return _train_merges_driver(
            {r["word"]: int(r["freq"]) for r in rows}, num_merges)
    merges: list[dict] = []
    try:
        cur = census
        for rank in range(1, num_merges + 1):
            staged = cur.select(
                "freq", F.split("repr", "[|][|]").alias("s"))
            pairs = (staged
                     .select("freq", "s",
                             F.posexplode_outer("s").alias("i", "l"))
                     .where("l is not null and i >= 1 and i <= size(s) - 3")
                     .selectExpr("freq", "l",
                                 "element_at(s, i + 2) as r"))
            best = (pairs.groupBy("l", "r").agg(F.sum("freq").alias("f"))
                    .orderBy(F.desc("f"), F.asc("l"), F.asc("r"))
                    .limit(1).collect())
            if not best:
                raise ValueError(
                    f"corpus exhausted after {rank - 1} merges; "
                    f"num_merges={num_merges} needs a larger corpus")
            left, right, freq = best[0]["l"], best[0]["r"], best[0]["f"]
            pat, rep = _merge_pattern(left, right)
            cur = cur.withColumn(
                "repr", F.replace(F.col("repr"), F.lit(pat), F.lit(rep)))
            merges.append({"merge_rank": rank, "lhs": left, "rhs": right,
                           "merged": left + right, "freq": int(freq)})
    finally:
        census.unpersist()
    return merges


def merges_df(spark: SparkSession, merges: list[dict]) -> DataFrame:
    return spark.createDataFrame(
        [(m["merge_rank"], m["lhs"], m["rhs"], m["merged"], m["freq"])
         for m in merges],
        "merge_rank int, lhs string, rhs string, merged string, freq long")


def save_merges(spark: SparkSession, merges: list[dict],
                path: str) -> None:
    """Persist a trained merge list (train once, tokenize everywhere —
    the tokenizer analogue of the langid/perplexity save/load contract).
    Parquet through the session's Hadoop FS, so hdfs:/s3a: paths work."""
    merges_df(spark, merges).coalesce(1).write.mode("overwrite").parquet(
        path)


def load_merges(spark: SparkSession, path: str) -> list[dict]:
    """Load a persisted merge list; validates rank contiguity (a partial
    or reordered table silently mis-tokenizes, so fail loudly)."""
    rows = sorted(spark.read.parquet(path).collect(),
                  key=lambda r: r["merge_rank"])
    merges = [{"merge_rank": r["merge_rank"], "lhs": r["lhs"],
               "rhs": r["rhs"], "merged": r["merged"],
               "freq": r["freq"]} for r in rows]
    want = list(range(1, len(merges) + 1))
    if [m["merge_rank"] for m in merges] != want or not merges:
        raise ValueError(
            f"BPE vocab at {path} is not a contiguous rank-1..R merge "
            f"list (got ranks {[m['merge_rank'] for m in merges]!r}) — "
            f"applying it would silently mis-tokenize")
    for m in merges:
        if m["merged"] != m["lhs"] + m["rhs"]:
            raise ValueError(f"corrupt merge row {m!r}")
    return merges


def with_bpe_token_counts(df: DataFrame, merges: list[dict],
                          text_col: str = "text",
                          out_col: str = "n_tokens_bpe") -> DataFrame:
    """Append the per-document token count under a trained merge list as
    ``out_col``, preserving every other column. Shuffle-free — the
    whole-document representation goes through R literal replaces (merge
    rules never match across word boundaries; see module docstring), so
    the plan stays scan + project at any scale."""
    words = F.expr(f"regexp_extract_all(lower(coalesce({text_col}, '')), "
                   f"'{WORD_RE}', 0)")
    out = df.withColumn("_ws", words)
    repr0 = F.expr(
        "concat('||', array_join(transform(_ws, "
        f"w -> concat(regexp_replace(w, '(.)', '$1||'), '{END_WORD}')), "
        "'||'), '||')")
    out = out.withColumn("_nw", F.size("_ws")).withColumn("_repr", repr0)
    for m in merges:
        pat, rep = _merge_pattern(m["lhs"], m["rhs"])
        out = out.withColumn(
            "_repr", F.replace(F.col("_repr"), F.lit(pat), F.lit(rep)))
    return (out.withColumn(
        out_col,
        F.expr("cast(case when _nw = 0 then 0 "
               "else size(split(_repr, '[|][|]')) - 2 end as bigint)"))
        .drop("_ws", "_nw", "_repr"))


def doc_token_counts(df: DataFrame, merges: list[dict],
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """``(id_col, n_tokens_bpe)`` — see :func:`with_bpe_token_counts`."""
    return with_bpe_token_counts(
        df.select(id_col, text_col), merges, text_col).select(
        id_col, "n_tokens_bpe")


def doc_tokens(df: DataFrame, merges: list[dict],
               text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """``(id_col, tokens array<string>)`` — the actual token sequence a
    packing/training job consumes (same replace chain; the final split's
    non-empty cells ARE the tokens, in document order). Shuffle-free."""
    words = F.expr(f"regexp_extract_all(lower(coalesce({text_col}, '')), "
                   f"'{WORD_RE}', 0)")
    out = df.select(id_col, words.alias("_ws"))
    repr0 = F.expr(
        "concat('||', array_join(transform(_ws, "
        f"w -> concat(regexp_replace(w, '(.)', '$1||'), '{END_WORD}')), "
        "'||'), '||')")
    out = out.select(id_col, repr0.alias("_repr"))
    for m in merges:
        pat, rep = _merge_pattern(m["lhs"], m["rhs"])
        out = out.withColumn(
            "_repr", F.replace(F.col("_repr"), F.lit(pat), F.lit(rep)))
    return out.select(
        id_col,
        F.expr("filter(split(_repr, '[|][|]'), s -> s != '')")
        .alias("tokens"))


# ---------------------------------------------------------------------------
# DuckDB twins (engine-identical SQL, fixed-depth unrolled merge loop)
# ---------------------------------------------------------------------------


def duckdb_bpe_cte(num_merges: int = DEFAULT_MERGES,
                   table: str = "documents",
                   text_col: str = "text") -> str:
    """The unrolled training chain as a WITH-clause body: census -> r0,
    then per round N: sN (split), pN (adjacent pair counts), bN (argmax,
    ties lexicographic), rN (one literal replace). ``rN``/``bN`` are what
    consumers select from."""
    parts = [
        f"words as (select unnest(regexp_extract_all("
        f"lower(coalesce({text_col}, '')), '{WORD_RE}')) as word "
        f"from {table})",
        "census as materialized (select word, count(*)::bigint as freq "
        "from words group by word)",
        "r0 as materialized (select '||' || regexp_replace(word, '(.)', '\\1||', 'g') "
        f"|| '{END_WORD}||' as repr, freq from census)",
    ]
    for n in range(1, num_merges + 1):
        prev = f"r{n - 1}"
        parts.append(
            f"s{n} as materialized (select string_split(repr, '||') as s, freq "
            f"from {prev})")
        parts.append(
            f"p{n} as materialized (select s[i] as l, s[i+1] as r, "
            f"sum(freq)::bigint as f "
            f"from (select s, freq, unnest(range(2, len(s) - 1)) as i "
            f"from s{n}) group by l, r)")
        parts.append(
            f"b{n} as materialized (select l, r, f from p{n} "
            f"order by f desc, l, r limit 1)")
        parts.append(
            f"r{n} as materialized (select replace(repr, "
            f"(select '|' || l || '||' || r || '|' from b{n}), "
            f"(select '|' || l || r || '|' from b{n})) as repr, freq "
            f"from {prev})")
    return ",\n".join(parts)


def duckdb_bpe_vocab_sql(num_merges: int = DEFAULT_MERGES,
                         table: str = "documents",
                         text_col: str = "text") -> str:
    sel = "\nunion all ".join(
        f"select {n} as merge_rank, l as lhs, r as rhs, "
        f"l || r as merged, f as freq from b{n}"
        for n in range(1, num_merges + 1))
    return (f"with {duckdb_bpe_cte(num_merges, table, text_col)}\n"
            f"select * from ({sel})")


def _duckdb_doc_chain(num_merges: int, table: str, text_col: str,
                      id_col: str) -> str:
    """WITH-clause body ending at dr{num_merges} (per-doc repr chain)."""
    parts = [
        duckdb_bpe_cte(num_merges, table, text_col),
        f"dw as (select {id_col}, regexp_extract_all("
        f"lower(coalesce({text_col}, '')), '{WORD_RE}') as ws "
        f"from {table})",
        f"dr0 as materialized (select {id_col}, len(ws) as nw, "
        "'||' || array_to_string(list_transform(ws, "
        "w -> regexp_replace(w, '(.)', '\\1||', 'g') || "
        f"'{END_WORD}'), '||') || '||' as repr from dw)",
    ]
    for n in range(1, num_merges + 1):
        parts.append(
            f"dr{n} as materialized (select {id_col}, nw, replace(repr, "
            f"(select '|' || l || '||' || r || '|' from b{n}), "
            f"(select '|' || l || r || '|' from b{n})) as repr "
            f"from dr{n - 1})")
    return ",\n".join(parts)


def duckdb_bpe_token_count_sql(num_merges: int = DEFAULT_MERGES,
                               table: str = "documents",
                               text_col: str = "text",
                               id_col: str = "doc_id") -> str:
    body = _duckdb_doc_chain(num_merges, table, text_col, id_col)
    return (f"with {body}\n"
            f"select {id_col}, (case when nw = 0 then 0 "
            f"else len(string_split(repr, '||')) - 2 end)::bigint "
            f"as n_tokens_bpe from dr{num_merges}")


def duckdb_bpe_encode_sql(num_merges: int = DEFAULT_MERGES,
                          table: str = "documents",
                          text_col: str = "text",
                          id_col: str = "doc_id") -> str:
    """Token ARRAYS under the trained vocab (twin of :func:`doc_tokens`)."""
    body = _duckdb_doc_chain(num_merges, table, text_col, id_col)
    return (f"with {body}\n"
            f"select {id_col}, "
            f"list_filter(string_split(repr, '||'), s -> s != '') "
            f"as tokens from dr{num_merges}")
