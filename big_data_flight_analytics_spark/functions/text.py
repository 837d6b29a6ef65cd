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

# Char-trigram language id. Per language, a fixed profile of 12
# high-frequency character trigrams (ASCII, within-word — classic
# Cavnar/Trenkle-style n-gram profiles, truncated hard so the scorer
# stays a single native regexp_count per language). A document's score
# per language = non-overlapping occurrences of any profile trigram in
# the lowercased text; the prediction is the max-score language with
# ties broken in LANG_PRIORITY order and 'en' as the zero-score
# default. CJK text is scored by codepoint-range count instead (Latin
# trigrams can't see it). All equal-length alternations, so Java regex
# (Spark) and RE2 (DuckDB) count identically — fully oracle-checkable.
# On keyword-soup synthetic corpora the prediction is arbitrary-but-
# deterministic; on natural prose the profiles behave like a real
# (small) trigram classifier — see the truth-table test.
LANG_TRIGRAMS: dict[str, tuple[str, ...]] = {
    "de": ("der", "und", "ein", "ich", "sch", "die", "che",
           "ung", "gen", "den", "ber", "ten"),
    "fr": ("les", "des", "que", "est", "eur", "ait", "ans",
           "par", "une", "our", "ais", "ont"),
    "es": ("los", "las", "del", "con", "por", "una", "ado",
           "nte", "ara", "ien", "cio", "ndo"),
    "en": ("the", "and", "ing", "ion", "ent", "tio", "for",
           "tha", "ter", "hat", "ere", "his"),
}
LANG_ZH_RE = r"[一-鿿]"
# tie-break chain order; 'en' is the CASE default (covers all-zero)
LANG_PRIORITY = ("zh", "de", "fr", "es")


def _trigram_pattern(lang: str) -> str:
    return "(" + "|".join(LANG_TRIGRAMS[lang]) + ")"


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
    """Char-trigram language id (see LANG_TRIGRAMS): argmax of per-
    language trigram-profile counts, ties to LANG_PRIORITY order,
    'en' when every score is zero.

    Cost note: the winner-selection CASE repeats each score expression
    in several comparisons; Catalyst does not CSE across when-branches,
    so this is ~25 regexp_counts per row — still map-only, linear, and
    cheap next to any shuffle, but don't lift it into a hot inner loop.
    """
    lowered = F.lower(text)
    scores: dict[str, Column] = {
        lang: F.regexp_count(lowered, F.lit(_trigram_pattern(lang)))
        for lang in LANG_TRIGRAMS
    }
    scores["zh"] = F.regexp_count(lowered, F.lit(LANG_ZH_RE))
    expr: Column | None = None
    for lang in LANG_PRIORITY:
        cond = scores[lang] > 0
        for other, s in scores.items():
            if other != lang:
                cond = cond & (scores[lang] >= s)
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    assert expr is not None
    return expr.otherwise(F.lit("en"))


def lang_case_sql(text_expr: str = "text") -> str:
    """The DuckDB-SQL mirror of :func:`lang_id_expr` — one CASE
    expression (no alias) generated from the same trigram tables, so
    the operator and its oracle can never drift."""
    counts = {
        lang: (
            f"len(regexp_extract_all(lower({text_expr}), "
            f"'{_trigram_pattern(lang)}'))"
        )
        for lang in LANG_TRIGRAMS
    }
    counts["zh"] = (
        f"len(regexp_extract_all(lower({text_expr}), '[\\x{{4e00}}-\\x{{9fff}}]'))"
    )
    branches = []
    for lang in LANG_PRIORITY:
        conds = [f"{counts[lang]} > 0"] + [
            f"{counts[lang]} >= {s}" for other, s in counts.items() if other != lang
        ]
        branches.append(
            "WHEN " + "\n              AND ".join(conds) + f" THEN '{lang}'"
        )
    joined = "\n         ".join(branches)
    return f"CASE\n         {joined}\n         ELSE 'en'\n       END"


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
