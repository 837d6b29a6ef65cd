"""Text-analysis column expressions for the LLM-data-pipeline extensions.

All pure native expressions (no UDFs) so they run inside whole-stage
codegen and scale linearly with partitions at 100 TB. Every expression is
deliberately mirror-able in ANSI/DuckDB SQL for the oracle gate — regex
syntax is restricted to the common subset of Java regex (Spark) and RE2
(DuckDB): no lookarounds, only literal classes and ``\\b`` word bounds.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny deterministic English stopword set shared with the oracle SQL.
STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
STOPWORD_RE = r"\b(" + "|".join(STOPWORDS) + r")\b"
PUNCT_RE = r"[.,!?;:]"

# Marker words per language for the n-gram/heuristic language id. CASE
# chain, first match wins, default 'en'. (Synthetic corpora won't carry
# real language signal; the operator contract is the deterministic rule.)
LANG_MARKERS = [
    ("de", r"\b(der|die|das|und|nicht|ist)\b"),
    ("fr", r"\b(le|la|les|et|est|pas)\b"),
    ("es", r"\b(el|los|las|y|es|no)\b"),
    ("zh", r"[一-鿿]"),
]


def token_count(text: Column) -> Column:
    """Whitespace-token count; empty/blank text counts 0 tokens."""
    trimmed = F.trim(text)
    return (
        F.when(text.isNull() | (trimmed == ""), F.lit(0))
        .otherwise(F.size(F.split(trimmed, r"\s+")))
        .cast("int")
    )


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars (0.0 for empty), rounded 6dp."""
    n = F.length(text)
    return F.when(n.isNull() | (n == 0), F.lit(0.0)).otherwise(
        F.round(F.regexp_count(text, F.lit(PUNCT_RE)) / n, 6)
    )


def stopword_ratio(text: Column) -> Column:
    """Stopword tokens / total tokens (0.0 when no tokens), rounded 6dp."""
    toks = token_count(text)
    hits = F.regexp_count(F.lower(text), F.lit(STOPWORD_RE))
    return F.when(toks == 0, F.lit(0.0)).otherwise(F.round(hits / toks, 6))


def quality_score(text: Column) -> Column:
    """Deterministic document quality heuristic in [0, 1], rounded 6dp.

    0.4 * length component (chars/500 capped at 1)
    + 0.3 * (1 - punctuation ratio)
    + 0.3 * stopword presence (ratio/0.1 capped at 1 — some stopwords
      indicate natural prose; none indicates keyword spam).
    """
    length_c = F.least(F.length(F.coalesce(text, F.lit(""))) / F.lit(500.0), F.lit(1.0))
    punct_c = F.lit(1.0) - punct_ratio(text)
    stop_c = F.least(stopword_ratio(text) / F.lit(0.1), F.lit(1.0))
    return F.round(0.4 * length_c + 0.3 * punct_c + 0.3 * stop_c, 6)


def lang_id_expr(text: Column) -> Column:
    """Heuristic language id: first-match CASE over marker regexes, else 'en'."""
    lowered = F.lower(text)
    expr: Column | None = None
    for lang, pattern in LANG_MARKERS:
        cond = F.regexp_count(lowered, F.lit(pattern)) > 0
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    assert expr is not None
    return expr.otherwise(F.lit("en"))


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(F.coalesce(text, F.lit(""))), r"\s+", " "))


def rolling_fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.

    md5 exists in both Spark and DuckDB, making the fingerprint
    oracle-checkable; near-dup variants (MinHash/SimHash) live in
    operators.dedup.
    """
    return F.md5(normalize_text(text))
