"""Document-level text analysis operators (training-data pipeline).

All native expressions over the ``documents`` table shape
(doc_id, text, ...). Linear per-partition work, no shuffles — at 100 TB
these run map-only over the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from big_data_flight_analytics_spark.functions.text import (
    lang_id_expr,
    punct_ratio,
    quality_score,
    rolling_fingerprint,
    stopword_ratio,
    token_count,
)

# BPE-ish tokenization: letter runs, single digits, or single
# non-alphanumeric marks — a crude proxy for subword token counts.
BPE_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach token counts, ratios, quality, language id, fingerprint."""
    t = F.col(text_col)
    return (
        df.withColumn("n_chars_calc", F.length(t).cast("int"))
        .withColumn("n_tokens", token_count(t))
        .withColumn("n_bpe_tokens", F.regexp_count(t, F.lit(BPE_RE)).cast("int"))
        .withColumn("punct_ratio", punct_ratio(t))
        .withColumn("stopword_ratio", stopword_ratio(t))
        .withColumn("quality", quality_score(t))
        .withColumn("lang_pred", lang_id_expr(t))
        .withColumn("fingerprint", rolling_fingerprint(t))
    )


def tokens(text_col: str = "text"):
    """Whitespace tokens of the lowercased, trimmed text (array<string>)."""
    return F.split(F.trim(F.lower(F.col(text_col))), r"\s+")


def shingle_expr(toks: "Column", n: int = 3) -> "Column":  # noqa: F821
    """Distinct n-gram shingles from a token-array column, O(len) per row.

    Built as arrays_zip of n shifted slices + one transform — each
    input sub-expression is evaluated a constant number of times. (A
    per-index ``element_at(toks, i+j)`` formulation embeds a copy of the
    token expression per access, and Catalyst's projection collapsing
    can inline a ``split`` there, re-tokenizing the text O(shingles*n)
    times per row — measured ~10x slower on the shingle-join pipeline.)
    """
    size = F.size(toks)
    width = F.greatest(size - n + 1, F.lit(0))
    slices = [F.slice(toks, j + 1, width) for j in range(n)]
    grams = F.transform(
        F.arrays_zip(*slices),
        lambda x: F.concat_ws(" ", *[x[str(j)] for j in range(n)]),
    )
    return F.when(size >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def ngram_multiset_expr(toks: "Column", n: int = 2) -> "Column":  # noqa: F821
    """n-gram MULTISET (duplicates kept) from a token array — the input
    to repetition metrics (Gopher-style duplicated-n-gram fraction),
    where frequency is the signal that ``shingle_expr``'s
    ``array_distinct`` would destroy. Same shifted-slices construction
    (see shingle_expr for the projection-collapsing rationale)."""
    size = F.size(toks)
    width = F.greatest(size - n + 1, F.lit(0))
    slices = [F.slice(toks, j + 1, width) for j in range(n)]
    grams = F.transform(
        F.arrays_zip(*slices),
        lambda x: F.concat_ws(" ", *[x[str(j)] for j in range(n)]),
    )
    return F.when(size >= n, grams).otherwise(F.array().cast("array<string>"))


def word_shingles(text_col: str = "text", n: int = 3):
    """Shingles straight from a text column (inline; prefer the two-step
    ``df.select(tokens(...))`` + ``shingle_expr`` in hot paths — see
    ``shingle_expr`` docstring)."""
    return shingle_expr(tokens(text_col), n)
