"""PII + toxicity scrubbing — ONE implementation shared by the Spark pandas
UDF and the pandas oracle, so scrubbed text is byte-identical by construction.

Reference analogue: the quarantine/winsorize/coerce remediation steps
(/root/reference/src/remediation/airflow_dags/outlier_remediation.py:89-137,
type_mismatch.py:79-94) — "fix the bad values, keep the row" — re-expressed as
regex substitution over document text.

Pattern constraints: every pattern must be valid and semantically identical in
Python ``re`` (this module / the oracle / the Spark pandas UDF) AND RE2
(the DuckDB oracle twins in ``duckdb_scrub_sql``): no lookarounds, no
backreferences, ASCII word boundaries only.
"""

from __future__ import annotations

import re

import pandas as pd

# Order matters: SSN before PHONE (both are digit-dash shapes), EMAIL first
# (usernames may contain digits), IP last.
PII_PATTERNS: list[tuple[str, str, str]] = [
    # (name, pattern, replacement)
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("phone", r"\b(\+?1[-. ])?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}\b", "<PHONE>"),
    ("ip", r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
]

# Mild deterministic toxicity wordlist (placeholder lexicon; swap for a real
# one in production via config). Lowercase; matched case-insensitively.
TOXICITY_WORDS: tuple[str, ...] = (
    "damn", "hell", "crap", "idiot", "moron", "stupid", "jerk", "loser",
)
TOX_PATTERN = r"(?i)\b(" + "|".join(TOXICITY_WORDS) + r")\b"
TOX_REPLACEMENT = "<TOX>"

# re.ASCII: Python \b is Unicode-aware by default but RE2/DuckDB \b is
# ASCII-only — without the flag, 'damnés' scrubs differently in the two
# engines (RE2 sees a word boundary after 'damn'; Unicode-\b does not).
# The pattern STRINGS stay identical in both engines; only the Python
# compile flag changes.
_COMPILED_PII = [(name, re.compile(pat, re.ASCII), repl)
                 for name, pat, repl in PII_PATTERNS]
_COMPILED_TOX = re.compile(TOX_PATTERN, re.ASCII)

PII_COUNT_COLS = ["n_email", "n_ssn", "n_phone", "n_ip"]


# superset pre-filters: every PII pattern requires '@' (email) or a digit
# (ssn/phone/ip); toxicity requires one of the wordlist stems. Documents
# matching none of the triggers cannot match any pattern — they skip the 10
# count/replace passes entirely. False positives just take the slow path and
# come out unchanged, so output equality is preserved.
_DIGIT_RE = re.compile("[0-9]")
_TOX_TRIGGER = re.compile("(?i)" + "|".join(TOXICITY_WORDS), re.ASCII)


def _scrub_full(s: pd.Series) -> pd.DataFrame:
    out = pd.DataFrame(index=s.index)
    for name, pat, repl in _COMPILED_PII:
        out[f"n_{name}"] = s.str.count(pat).astype("int64")
        s = s.str.replace(pat, repl, regex=True)
    out["n_tox"] = s.str.count(_COMPILED_TOX).astype("int64")
    s = s.str.replace(_COMPILED_TOX, TOX_REPLACEMENT, regex=True)
    out.insert(0, "scrubbed_text", s)
    return out


def scrub_series(text: pd.Series) -> pd.DataFrame:
    """Vectorized scrub of a batch of documents.

    Returns a DataFrame with columns
    ``scrubbed_text, n_email, n_ssn, n_phone, n_ip, n_tox`` aligned to the
    input index. This exact function runs inside the Spark pandas UDF and
    inside the oracle — byte-identical output by construction.

    Fast path: one combined superset regex screens the batch; only documents
    with a potential hit (a few % of a web corpus) run the 10 sequential
    count/replace passes — clean documents pass through untouched (identical
    output by definition: no pattern matched ⇒ all counts 0, text unchanged).
    """
    s = text.fillna("")
    hit = (s.str.contains("@", regex=False)
           | s.str.contains(_DIGIT_RE, regex=True)
           | s.str.contains(_TOX_TRIGGER, regex=True))
    out = pd.DataFrame(index=s.index)
    out["scrubbed_text"] = s
    for name, _, _ in PII_PATTERNS:
        out[f"n_{name}"] = 0
    out["n_tox"] = 0
    if hit.any():
        sub = _scrub_full(s[hit])
        out.loc[hit, sub.columns] = sub
    for c in out.columns:
        if c != "scrubbed_text":
            out[c] = out[c].astype("int64")
    return out


def scrub_text(text: str) -> tuple[str, dict[str, int]]:
    """Single-string convenience twin of :func:`scrub_series` (tests)."""
    df = scrub_series(pd.Series([text]))
    row = df.iloc[0]
    counts = {c: int(row[c]) for c in PII_COUNT_COLS + ["n_tox"]}
    return row["scrubbed_text"], counts


# ---------------------------------------------------------------------------
# DuckDB oracle twins (RE2). Same patterns, same order, same replacements.
# ---------------------------------------------------------------------------


def duckdb_scrub_sql(text_col: str = "text") -> dict[str, str]:
    """SQL fragments: scrubbed_text + per-type counts, matching scrub_series."""
    expr = f"coalesce({text_col}, '')"
    counts: dict[str, str] = {}
    for name, pat, repl in PII_PATTERNS:
        counts[f"n_{name}"] = (
            f"len(regexp_extract_all({expr}, '{pat}'))::bigint"
        )
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    counts["n_tox"] = f"len(regexp_extract_all({expr}, '{TOX_PATTERN}'))::bigint"
    expr = f"regexp_replace({expr}, '{TOX_PATTERN}', '{TOX_REPLACEMENT}', 'g')"
    # count columns reference the PRE-replacement text at each stage, exactly
    # like scrub_series; build as nested select in the caller.
    return {"scrubbed_text": expr, **counts}
