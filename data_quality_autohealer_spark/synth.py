"""Deterministic synthetic Common-Crawl-style page generator.

Reference analogue: BadDataGenerator
(/root/reference/src/utils/bad_data_generator.py:23-288) — seeded synthetic
data with injected quality issues at known rates. Rebuilt for web pages: each
row_id maps through splitmix64 to a quality slice, language, host (Zipf-skewed
on purpose — exercises salting), and text, as a PURE FUNCTION of row_id — the
same bytes regardless of partitioning, executor count, or engine (used both
by Spark ``mapInPandas`` and directly in pandas by the oracle tests).

Slice layout per FIXTURES.md §1 (row_id % 100):
  0-54  clean prose            → keep
  55-62 too-short              → gopher.word_count
  63-68 gibberish long words   → gopher.mean_word_length (+perplexity)
  69-74 symbol-heavy           → gopher.symbol_ratio
  75-82 repetitive             → gopher.dup_ngram
  83-88 wrong-language         → langid
  89-93 word salad             → perplexity
  94-97 PII-laden clean        → keep, scrubbed_text != text
  98-99 toxic terms            → keep+scrub (1-2 hits) or drop (>max_tox)
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .functions.langid import SEED_CORPORA

# space-delimited languages only (the word-based slice constructions need
# splittable corpora); langid.LANGS additionally knows zh
SYNTH_LANGS = ("en", "de", "fr", "es", "it", "nl")
from .functions.scrub import TOXICITY_WORDS

EPOCH_BASE = np.datetime64("2026-01-01T00:00:00")
NUM_HOSTS = 1000
ZIPF_S = 1.2

PAGES_SCHEMA_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

_WORDS = {lang: SEED_CORPORA[lang].split() for lang in SYNTH_LANGS}
_CONSONANTS = np.array(list("bcdfgjklmnpqrstvwxz"))

# Zipf inverse-CDF table over NUM_HOSTS hosts.
_zipf_w = 1.0 / np.power(np.arange(1, NUM_HOSTS + 1, dtype=np.float64), ZIPF_S)
_ZIPF_CDF = np.cumsum(_zipf_w) / _zipf_w.sum()


def _mix(x: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64 over uint64 arrays; pure function of (row_id, salt)."""
    z = x.astype(np.uint64) + np.uint64(salt * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _u(x: np.ndarray, salt: int, mod: int) -> np.ndarray:
    return (_mix(x, salt) % np.uint64(mod)).astype(np.int64)


def _consecutive_words(words: list[str], start: int, count: int) -> list[str]:
    n = len(words)
    return [words[(start + j) % n] for j in range(count)]


def _gen_text_one(rid: int, slice_id: int, lang: str, h: int) -> tuple[str, str]:
    """Returns (text, claimed_lang). Pure function of its arguments."""
    words = _WORDS[lang]
    claimed = lang
    if slice_id < 55:  # clean prose
        # cap below ~the seed-corpus length so wrap-around repetition stays
        # under the dup-ngram thresholds
        wc = 50 + h % 130
        toks = _consecutive_words(words, h % len(words), wc)
    elif slice_id < 63:  # too-short
        wc = 5 + h % 40
        toks = _consecutive_words(words, h % len(words), wc)
    elif slice_id < 69:  # gibberish long words
        wc = 60 + h % 100
        idx = _mix(np.arange(wc, dtype=np.uint64) + np.uint64(rid), 7)
        toks = []
        for j in range(wc):
            g = int(idx[j])
            ln = 11 + g % 5
            toks.append("".join(
                _CONSONANTS[(g >> (k % 8)) % len(_CONSONANTS)] for k in range(ln)
            ))
        claimed = "en"
    elif slice_id < 75:  # symbol-heavy
        wc = 60 + h % 100
        base = _consecutive_words(words, h % len(words), wc)
        toks = []
        for j, w in enumerate(base):
            toks.append(w)
            if j % 4 == 0:
                toks.append("{##}" if j % 8 == 0 else "=>")
    elif slice_id < 83:  # repetitive
        phrase = _consecutive_words(words, h % len(words), 8)
        k = 12 + h % 12
        toks = phrase * k
    elif slice_id < 89:  # wrong-language: text lang != claimed
        wc = 60 + h % 200
        toks = _consecutive_words(words, h % len(words), wc)
        others = [lg for lg in SYNTH_LANGS if lg != lang]
        claimed = others[h % len(others)]
    elif slice_id < 94:  # word salad (same language, shuffled positions)
        wc = 60 + h % 150
        pos = _mix(np.arange(wc, dtype=np.uint64) + np.uint64(rid), 11)
        toks = [words[int(p) % len(words)] for p in pos]
    elif slice_id < 98:  # PII-laden clean prose
        wc = 60 + h % 80
        toks = _consecutive_words(words, h % len(words), wc)
        pii = [
            f"user{h % 997}@example.com",
            f"{100 + h % 800}-{10 + h % 80}-{1000 + h % 8000}",  # SSN shape
            f"555-{100 + h % 800}-{1000 + h % 8000}",            # phone shape
            f"10.{h % 250}.{(h >> 8) % 250}.{(h >> 16) % 250}",  # IP
        ]
        n_inject = 1 + h % 3
        for i in range(n_inject):
            toks.insert((7 * (i + 1) + h % 5) % max(len(toks), 1), pii[(h + i) % 4])
        claimed = lang
    else:  # toxic terms
        wc = 60 + h % 80
        toks = _consecutive_words(words, h % len(words), wc)
        n_tox = 1 + h % 5  # 1-2 → scrub only; >2 → drop
        for i in range(n_tox):
            toks.insert((5 * (i + 1)) % max(len(toks), 1),
                        TOXICITY_WORDS[(h + i) % len(TOXICITY_WORDS)])
    return " ".join(toks), claimed


def gen_pages_pdf(ids: np.ndarray) -> pd.DataFrame:
    """Generate pages for the given row_ids. Deterministic, partition-safe."""
    ids = np.asarray(ids, dtype=np.uint64)
    n = len(ids)
    slice_ids = (ids % np.uint64(100)).astype(np.int64)
    h_arr = _u(ids, 1, 1 << 62)
    lang_idx = _u(ids, 2, len(SYNTH_LANGS))
    host_u = _u(ids, 3, 1 << 53).astype(np.float64) / float(1 << 53)
    host_rank = np.searchsorted(_ZIPF_CDF, host_u, side="left") + 1

    texts = np.empty(n, dtype=object)
    claimed = np.empty(n, dtype=object)
    for i in range(n):
        texts[i], claimed[i] = _gen_text_one(
            int(ids[i]), int(slice_ids[i]), SYNTH_LANGS[lang_idx[i]], int(h_arr[i])
        )
    urls = np.array(
        [f"https://host{r}.example.com/p/{int(i)}" for r, i in zip(host_rank, ids)],
        dtype=object,
    )
    ts = EPOCH_BASE + (ids % np.uint64(86400 * 90)).astype("timedelta64[s]")
    # realistic page chrome (nav + linkfarm + article + footer) so the
    # WARC front edge exercises main-content extraction for real; the
    # chrome constants live beside the extractor they exist to test
    from .functions.html_extract import CHROME_PREFIX, CHROME_SUFFIX
    pre = CHROME_PREFIX.encode("utf-8")
    suf = CHROME_SUFFIX.encode("utf-8")
    html = np.array(
        [pre + t.encode("utf-8") + suf for t in texts],
        dtype=object,
    )
    return pd.DataFrame({
        "url": urls,
        "warc_ts": pd.Series(ts.astype("datetime64[ns]")).dt.tz_localize("UTC"),
        "html": html,
        "text": texts,
        "lang": claimed,
    })


def gen_pages_df(spark, n: int, num_partitions: int | None = None):
    """Distributed generation: spark.range → mapInPandas(gen_pages_pdf)."""
    rng = spark.range(0, n, numPartitions=num_partitions or spark.sparkContext.defaultParallelism)

    def _gen(batches):
        for pdf in batches:
            yield gen_pages_pdf(pdf["id"].to_numpy())

    return rng.mapInPandas(_gen, schema=PAGES_SCHEMA_DDL)
