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
    normalize_text,
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


def word_shingles(text_col: str = "text", n: int = 3):
    """Distinct n-gram word shingles as array<string> (empty if < n tokens).

    Built with sequence/transform higher-order functions — JVM-side,
    no UDF. Shingle i joins tokens [i, i+n).
    """
    toks = tokens(text_col)
    size = F.size(toks)
    idx = F.sequence(F.lit(0), size - n)  # inclusive; valid when size >= n
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.when(size >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )
