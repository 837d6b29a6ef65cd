"""LLM-data-pipeline extension queries over documents/embeddings.

Dedup, similarity search, text analysis, multimodal plumbing — the
operators a 100 TB training-data pipeline needs beyond the reference's
surface. Every entry is oracle-checkable: MinHash/SimHash signatures
are built on md5 (bit-identical in Spark and DuckDB — see
operators/dedup.py), so even the LSH paths run under the full
rows/schema/value-hash gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_flight_analytics_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from big_data_flight_analytics_spark.operators.multimodal import (
    attach_binary_payload,
    extract_features,
)
from big_data_flight_analytics_spark.operators.similarity import (
    brute_force_topk,
    embedding_neardup_pairs,
    lsh_bucketed_topk,
)
from big_data_flight_analytics_spark.operators.sampling import stratified_sample
from big_data_flight_analytics_spark.operators.text import (
    text_stats,
    tfidf_top_terms,
    tokens,
    top_ngrams,
)
from big_data_flight_analytics_spark.functions.text import (
    lang_case_sql,
    rolling_fingerprint,
)
from big_data_flight_analytics_spark.plans.tables import load
from big_data_flight_analytics_spark.stages import stage

# DuckDB mirror of lang_id_expr, generated from the same trigram
# tables (functions/text.py) so the Spark expression and every oracle
# using lang_pred can never drift.
_LANG_CASE = lang_case_sql()

JACCARD_THRESHOLD = 0.05
N_QUERY_VECS = 5
TOPK = 3


def _jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d2's pair pipeline as a shareable stage (parents of d6/d8).

    Outside ``stages.shared_stages()`` this is a plain call — each query
    stays independent for the oracle gate. Inside (bench, single-pass
    pipeline) d2/d6/d8 share one persisted pair frame instead of
    running the shingle/posting/join pipeline three times.
    """
    return stage(
        ("jaccard_pairs", sf_dir, JACCARD_THRESHOLD, MAX_SHINGLE_DF),
        lambda: ngram_jaccard_pairs(
            load(spark, sf_dir, "documents"),
            threshold=JACCARD_THRESHOLD,
            max_df=MAX_SHINGLE_DF,
        ),
    )


def _jaccard_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d6's transitive clusters as a shareable stage (parent of d8)."""
    from big_data_flight_analytics_spark.operators.graph import dedup_clusters

    return stage(
        ("dedup_clusters", sf_dir, JACCARD_THRESHOLD, MAX_SHINGLE_DF),
        lambda: dedup_clusters(
            _jaccard_pairs(spark, sf_dir), load(spark, sf_dir, "documents")
        ),
    )


# ---------------------------------------------------------------------------
# T1 — text analysis suite (language id, quality, token counts,
# fingerprint) — one map-only pass over documents.
# ---------------------------------------------------------------------------

def t1_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return text_stats(docs).select(
        "doc_id",
        "n_chars_calc",
        "n_tokens",
        "n_bpe_tokens",
        "punct_ratio",
        "stopword_ratio",
        "quality",
        "lang_pred",
        "fingerprint",
    )


# Mirrors functions/text.py exactly: same regexes (common Java/RE2
# subset), same rounding, same stopword list, same marker CASE order.
T1_SQL = r"""
WITH base AS (
    SELECT doc_id,
           text,
           length(text) AS n_chars_calc,
           CASE WHEN text IS NULL OR trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_bpe,
           len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
           len(regexp_extract_all(lower(text),
               '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS n_stop
    FROM documents
), ratios AS (
    SELECT *,
           CASE WHEN n_chars_calc IS NULL OR n_chars_calc = 0 THEN 0.0
                ELSE ROUND(n_punct * 1.0 / n_chars_calc, 6) END AS punct_ratio,
           CASE WHEN n_tokens = 0 THEN 0.0
                ELSE ROUND(n_stop * 1.0 / n_tokens, 6) END AS stopword_ratio
    FROM base
)
SELECT doc_id,
       CAST(n_chars_calc AS INTEGER) AS n_chars_calc,
       CAST(n_tokens AS INTEGER) AS n_tokens,
       CAST(n_bpe AS INTEGER) AS n_bpe_tokens,
       punct_ratio,
       stopword_ratio,
       ROUND(0.4 * LEAST(length(COALESCE(text, '')) / 500.0, 1.0)
             + 0.3 * (1.0 - punct_ratio)
             + 0.3 * LEAST(stopword_ratio / 0.1, 1.0), 6) AS quality,
       __LANG_CASE__ AS lang_pred,
       md5(trim(regexp_replace(lower(COALESCE(text, '')), '\s+', ' ', 'g')))
           AS fingerprint
FROM ratios
""".replace("__LANG_CASE__", _LANG_CASE)


# ---------------------------------------------------------------------------
# D1 — exact dedup via content fingerprint (hash-groupBy)
# ---------------------------------------------------------------------------

def d1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(load(spark, sf_dir, "documents"))


D1_SQL = r"""
SELECT md5(trim(regexp_replace(lower(COALESCE(text, '')), '\s+', ' ', 'g')))
           AS fingerprint,
       MIN(doc_id) AS canonical_doc_id,
       COUNT(*) AS dup_count
FROM documents
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# T9 — PII/URL scrub (training-data hygiene). The synthetic corpus
# contains no PII, so the query deterministically injects an email
# (doc_id % 2 == 0), a URL (doc_id % 3 == 0), and a phone-style digit
# run (every doc) derived from doc_id — identically in Spark and the
# oracle — then scrubs. The regexes are therefore exercised against
# real matches and the oracle verifies replacement + counts exactly;
# tests/test_text_corpus.py asserts no pattern survives scrubbing.
# ---------------------------------------------------------------------------


def t9_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.text import scrub_pii

    docs = load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    pii_text = F.concat(
        F.col("text"),
        F.when(
            did % 2 == 0,
            F.concat(
                F.lit(" contact user"),
                did.cast("string"),
                F.lit("@mail.example.com"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit(" see https://example.org/doc/"),
                did.cast("string"),
                F.lit("?ref=abc"),
            ),
        ).otherwise(F.lit("")),
        F.lit(" call 415-555-"),
        F.lpad((did % 10000).cast("string"), 4, "0"),
    )
    synth = docs.select(did.alias("doc_id"), pii_text.alias("text"))
    return scrub_pii(synth).select(
        "doc_id", "clean_text", "n_emails", "n_urls", "n_digit_runs"
    )


T9_SQL = r"""
WITH synth AS (
    SELECT doc_id,
           text
           || CASE WHEN doc_id % 2 = 0
                THEN ' contact user' || CAST(doc_id AS VARCHAR)
                     || '@mail.example.com'
                ELSE '' END
           || CASE WHEN doc_id % 3 = 0
                THEN ' see https://example.org/doc/'
                     || CAST(doc_id AS VARCHAR) || '?ref=abc'
                ELSE '' END
           || ' call 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               AS text
    FROM documents
)
SELECT doc_id,
       regexp_replace(
           regexp_replace(
               regexp_replace(text, '(https?://|www\.)[^\s]+', '<URL>', 'g'),
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\d[\d\- ().]{5,}\d', '<NUM>', 'g') AS clean_text,
       len(regexp_extract_all(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
       len(regexp_extract_all(text, '(https?://|www\.)[^\s]+')) AS n_urls,
       len(regexp_extract_all(text, '\d[\d\- ().]{5,}\d')) AS n_digit_runs
FROM synth
"""


# ---------------------------------------------------------------------------
# D11 — paragraph-grain dedup (C4/RefinedWeb style): dedup at paragraph
# grain corpus-wide keeping first occurrence, then reconstruct documents
# from surviving paragraphs. The synthetic corpus has no newline
# structure (zero documents contain "\n\n"), so the catalog entry uses a
# literal token boundary (" the ") as the paragraph separator to
# exercise real multi-paragraph behavior (sf0.01: ~1.27k paragraphs,
# ~54 cross-document dups removed); real corpora use the operator's
# default "\n\n".
# ---------------------------------------------------------------------------

D11_PARA_SEP = " the "


def d11_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.dedup import paragraph_dedup

    return paragraph_dedup(
        load(spark, sf_dir, "documents"), sep=D11_PARA_SEP
    )


D11_SQL = """
WITH paras AS (
    SELECT doc_id,
           unnest(string_split(text, ' the ')) AS para,
           generate_subscripts(string_split(text, ' the '), 1) AS idx,
           len(string_split(text, ' the ')) AS n_paras
    FROM documents
), ranked AS (
    SELECT *,
           row_number() OVER (PARTITION BY para ORDER BY doc_id, idx) AS rn
    FROM paras
)
SELECT doc_id,
       string_agg(para, ' the ' ORDER BY idx) AS clean_text,
       first(n_paras) AS n_paras,
       COUNT(*) AS n_kept
FROM ranked
WHERE rn = 1
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# T26 — boilerplate excision (C4's other line rule, complementing
# d11): a paragraph in >= T26_MAX_DF distinct documents is template
# noise — remove EVERY copy, where d11 keeps one. Same " the "
# separator convention as d11 (corpus has no newline structure); the
# boilerplate set is 8-72 paragraphs across test scales, i.e. the
# anti-join side is broadcast-tiny by the rule's own definition.
# ---------------------------------------------------------------------------

T26_MAX_DF = 3


def t26_boilerplate_excision(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.dedup import (
        boilerplate_excision,
    )

    return boilerplate_excision(
        load(spark, sf_dir, "documents"),
        sep=D11_PARA_SEP,
        max_df=T26_MAX_DF,
    )


# I13 — incremental boilerplate maintenance: paragraph DOCUMENT
# frequency is additive over disjoint document batches (each doc
# counts a paragraph once), so the corpus-wide boilerplate set stays
# current under ingest with one full-outer sum — the i1 contract on
# the t26 rule. The entry splits documents 80/20 (the i-series
# convention), folds the two df states, excises the WHOLE corpus
# against the folded state, and must reproduce from-scratch t26
# bit-for-bit (same oracle).


def i13_boilerplate_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.cache import tracked_persist
    from big_data_flight_analytics_spark.operators.dedup import (
        boilerplate_excision,
        paragraph_df_fold,
        paragraph_df_state,
    )

    docs = load(spark, sf_dir, "documents")
    base = paragraph_df_state(
        docs.filter(F.col("doc_id") % 5 != 0), sep=D11_PARA_SEP
    )
    delta = paragraph_df_state(
        docs.filter(F.col("doc_id") % 5 == 0), sep=D11_PARA_SEP
    )
    folded = paragraph_df_fold(tracked_persist(base), tracked_persist(delta))
    return boilerplate_excision(
        docs, sep=D11_PARA_SEP, max_df=T26_MAX_DF, df_state=folded
    )


T26_SQL = f"""
WITH paras AS (
    SELECT doc_id,
           unnest(string_split(text, ' the ')) AS para,
           generate_subscripts(string_split(text, ' the '), 1) AS idx,
           len(string_split(text, ' the ')) AS n_paras
    FROM documents
), bp AS (
    SELECT para FROM (
        SELECT para, COUNT(DISTINCT doc_id) AS df FROM paras GROUP BY para
    ) WHERE df >= {T26_MAX_DF}
)
SELECT doc_id,
       string_agg(para, ' the ' ORDER BY idx) AS clean_text,
       first(n_paras) AS n_paras,
       COUNT(*) AS n_kept
FROM paras
WHERE para NOT IN (SELECT para FROM bp)
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# T3 — Gopher-style quality metrics: mean token length, alphabetic
# fraction, and the duplicated-bigram fraction (max bigram frequency /
# total bigrams — repetition is a top spam/boilerplate signal). Scalars
# are map-only; the repetition ratio is one doc-keyed aggregation
# joined back co-partitioned.
# ---------------------------------------------------------------------------


def t3_gopher_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.text import (
        ngram_multiset_expr,
        tokens,
    )

    docs = load(spark, sf_dir, "documents")
    toked = docs.select(F.col("doc_id"), F.col("text"), tokens("text").alias("__toks"))
    n_tok = F.size("__toks")
    tok_chars = F.aggregate(
        F.transform("__toks", lambda t: F.length(t)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    n_chars = F.length("text")
    # top-bigram count computed MAP-SIDE per row (r16, guide §2.1): the
    # max multiset count of a doc's own bigrams == the longest
    # equal-run in its sorted bigram array, a per-row sort + fold — the
    # former explode + groupBy(doc, bg) + groupBy(doc) + join-back
    # re-tokenized the corpus a second time and shuffled every bigram
    # twice to compute a quantity that never leaves the row. Measured
    # 2.86 -> see OPTIMIZATION_r16.md; plan is one pass, zero Exchange.
    bgs = F.array_sort(ngram_multiset_expr(F.col("__toks"), 2))
    top_run = F.aggregate(
        bgs,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(
                    F.lit(1).cast("long")
                ),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    n_bg = F.size(bgs)
    return toked.select(
        "doc_id",
        F.when(n_tok > 0, F.round(tok_chars / n_tok, 6))
        .otherwise(F.lit(0.0))
        .alias("mean_token_len"),
        F.when(n_chars > 0, F.round(F.regexp_count(F.col("text"), F.lit("[a-z]")) / n_chars, 6))
        .otherwise(F.lit(0.0))
        .alias("alpha_ratio"),
        F.when(n_bg > 0, F.round(top_run / n_bg, 6))
        .otherwise(F.lit(0.0))
        .alias("top_bigram_ratio"),
    )


T3_SQL = r"""
WITH toks AS (
    SELECT doc_id, text,
           regexp_split_to_array(trim(lower(text)), '\s+') AS t
    FROM documents
), base AS (
    SELECT doc_id,
           CASE WHEN len(t) > 0
                THEN ROUND(list_sum(list_transform(t, x -> length(x))) * 1.0
                           / len(t), 6)
                ELSE 0.0 END AS mean_token_len,
           CASE WHEN length(text) > 0
                THEN ROUND(len(regexp_extract_all(text, '[a-z]')) * 1.0
                           / length(text), 6)
                ELSE 0.0 END AS alpha_ratio
    FROM toks
), bigrams AS (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t)),
                                 i -> t[i] || ' ' || t[i + 1])) AS bg
    FROM toks WHERE len(t) >= 2
), freqs AS (
    SELECT doc_id, bg, COUNT(*) AS c FROM bigrams GROUP BY doc_id, bg
), rep AS (
    SELECT doc_id, ROUND(MAX(c) * 1.0 / SUM(c), 6) AS top_bigram_ratio
    FROM freqs GROUP BY doc_id
)
SELECT b.doc_id, b.mean_token_len, b.alpha_ratio,
       COALESCE(r.top_bigram_ratio, 0.0) AS top_bigram_ratio
FROM base b LEFT JOIN rep r ON b.doc_id = r.doc_id
"""


# ---------------------------------------------------------------------------
# T4 — per-document top-k TF-IDF terms (distributed inverted index +
# corpus statistics — the classic "build the index" pipeline job).
# Result sets are ranked on integer keys only (tf desc, df asc, term);
# the rounded ln-score rides along as a value column (ln parity at 4dp
# verified Spark-vs-DuckDB over the full df domain).
# ---------------------------------------------------------------------------

TFIDF_TOPK = 3


def t4_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, k=TFIDF_TOPK)


T4_SQL = rf"""
WITH toks AS (
    SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
    FROM documents
), terms AS (
    SELECT doc_id, unnest(t) AS term FROM toks
), tf AS (
    SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
    FROM terms WHERE term != '' GROUP BY doc_id, term
), dfreq AS (
    SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
), n AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
), scored AS (
    SELECT doc_id, term, tf, df,
           ROUND(tf * (LN((n_docs + 1.0) / (df + 1.0)) + 1.0), 4) AS tfidf,
           ROW_NUMBER() OVER (
               PARTITION BY doc_id
               ORDER BY tf DESC, df ASC, term ASC) AS rn
    FROM tf JOIN dfreq USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df, tfidf FROM scored WHERE rn <= {TFIDF_TOPK}
"""


# ---------------------------------------------------------------------------
# T5 — corpus-level top-k n-gram counts (the canonical MapReduce word/
# ngram-count job): multiset trigrams, map-side partial agg, global
# top-k via per-partition heap (TakeOrderedAndProject — never a full
# sort). Integer-only, deterministic tie-break on the gram string.
# ---------------------------------------------------------------------------

NGRAM_N = 3
NGRAM_TOPK = 20


def t5_ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return top_ngrams(docs, n=NGRAM_N, k=NGRAM_TOPK)


T5_SQL = rf"""
WITH toks AS (
    SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS t
    FROM documents
), grams AS (
    SELECT CASE WHEN len(t) >= {NGRAM_N} THEN
               list_transform(range(1, len(t) - {NGRAM_N - 2}),
                   i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])
           ELSE [] END AS g
    FROM toks
), flat AS (
    SELECT unnest(g) AS gram FROM grams
)
SELECT gram, CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM flat GROUP BY gram
ORDER BY n_occurrences DESC, gram ASC
LIMIT {NGRAM_TOPK}
"""


# ---------------------------------------------------------------------------
# T6 — deterministic stratified subsample: downsample the dominant
# languages by md5-bucket (reproducible under any partitioning — the
# corpus-rebalancing counterpart of the t2 train/val split). The rate
# table is a broadcast dim; the document side never shuffles.
# ---------------------------------------------------------------------------

STRATA_RATES = {"en": 10, "zh": 40}


def t6_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return stratified_sample(docs, STRATA_RATES).select("doc_id", "lang", "source")


def _t6_sql() -> str:
    # md5 hex -> int via ascii arithmetic (same decode as t2/d3)
    digit = (
        "(CASE WHEN ascii(substr(h, {i}, 1)) < 58"
        " THEN ascii(substr(h, {i}, 1)) - 48"
        " ELSE ascii(substr(h, {i}, 1)) - 87 END)"
    )
    expr = digit.format(i=1)
    for t in range(1, 4):
        expr = f"({expr} * 16 + {digit.format(i=1 + t)})"
    rates = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in sorted(STRATA_RATES.items())
    )
    return f"""
WITH hashed AS (
    SELECT doc_id, lang, source, md5(CAST(doc_id AS VARCHAR)) AS h
    FROM documents
)
SELECT doc_id, lang, source FROM hashed
WHERE {expr} % 100 < (CASE lang {rates} ELSE 100 END)
"""


T6_SQL = _t6_sql()


# ---------------------------------------------------------------------------
# T12 — corpus-frequency quality signals (CCNet-style LM-filter proxy):
# mean token corpus frequency + rare-token fraction per document.
# Log-free so the oracle hashes bit-exact (see operators/text.py).
# ---------------------------------------------------------------------------

T12_RARE_BELOW = 5


def t12_rare_token_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.text import rare_token_score

    return rare_token_score(
        load(spark, sf_dir, "documents"), rare_below=T12_RARE_BELOW
    )


T12_SQL = rf"""
WITH posting AS (
    SELECT doc_id,
           unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
    FROM documents
), vocab AS (
    SELECT tok, COUNT(*) AS tf FROM posting GROUP BY tok
)
SELECT doc_id,
       COUNT(*) AS n_tokens,
       ROUND(AVG(tf), 6) AS mean_tf,
       ROUND(SUM(CASE WHEN tf < {T12_RARE_BELOW} THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 6) AS rare_frac
FROM posting JOIN vocab USING (tok)
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# T10 — source-weighted mixture sampling (data mixing): downsample
# sources to target mixture weights with maximal retention — the
# bottleneck source is kept whole, the rest thinned deterministically.
# Oracle mirrors the double arithmetic in the same operation order, so
# thresholds are bit-identical.
# ---------------------------------------------------------------------------

T10_TARGETS = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
T10_RESOLUTION = 10_000


def t10_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.sampling import mixture_sample

    docs = load(spark, sf_dir, "documents")
    return mixture_sample(
        docs, T10_TARGETS, resolution=T10_RESOLUTION
    ).select("doc_id", "source")


def _t10_sql() -> str:
    digit = (
        "(CASE WHEN ascii(substr(h, {i}, 1)) < 58"
        " THEN ascii(substr(h, {i}, 1)) - 48"
        " ELSE ascii(substr(h, {i}, 1)) - 87 END)"
    )
    expr = digit.format(i=1)
    for t in range(1, 4):
        expr = f"({expr} * 16 + {digit.format(i=1 + t)})"
    weights = " ".join(
        f"WHEN '{k}' THEN {v!r}" for k, v in sorted(T10_TARGETS.items())
    )
    return f"""
WITH tgt AS (
    SELECT source, CASE source {weights} END AS w
    FROM (SELECT DISTINCT source FROM documents)
    WHERE CASE source {weights} END IS NOT NULL
), counts AS (
    SELECT d.source, t.w, COUNT(*) AS n
    FROM documents d JOIN tgt t USING (source)
    GROUP BY d.source, t.w
), scaled AS (
    SELECT source,
           FLOOR({float(T10_RESOLUTION)} * w
                 * (SELECT MIN(n / w) FROM counts) / n) AS thresh
    FROM counts
), hashed AS (
    SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS h
    FROM documents
)
SELECT doc_id, source
FROM hashed JOIN scaled USING (source)
WHERE {expr} % {T10_RESOLUTION} < thresh
"""


T10_SQL = _t10_sql()


# ---------------------------------------------------------------------------
# T11 — sequence packing: assign documents to ~target-token packed
# training sequences (greedy contiguous fill within hash buckets) —
# the sharding/packing step between a curated corpus and fixed-length
# training examples. Window is bucket-partitioned (never global).
# ---------------------------------------------------------------------------

T11_TARGET_TOKENS = 512
T11_BUCKETS = 32


def t11_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.functions.text import token_count
    from big_data_flight_analytics_spark.operators.sampling import pack_sequences

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).cast("bigint").alias("n_tokens")
    )
    return pack_sequences(
        docs, T11_TARGET_TOKENS, buckets=T11_BUCKETS
    ).select("doc_id", "n_tokens", "bucket", "seq_id")


def _t11_sql() -> str:
    digit = (
        "(CASE WHEN ascii(substr(h, {i}, 1)) < 58"
        " THEN ascii(substr(h, {i}, 1)) - 48"
        " ELSE ascii(substr(h, {i}, 1)) - 87 END)"
    )
    expr = digit.format(i=1)
    for t in range(1, 4):
        expr = f"({expr} * 16 + {digit.format(i=1 + t)})"
    return f"""
WITH toks AS (
    SELECT doc_id,
           CASE WHEN text IS NULL OR trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
               AS n_tokens,
           md5(CAST(doc_id AS VARCHAR)) AS h
    FROM documents
), bucketed AS (
    SELECT doc_id, n_tokens, {expr} % {T11_BUCKETS} AS bucket
    FROM toks
), packed AS (
    SELECT doc_id, n_tokens, bucket,
           SUM(n_tokens) OVER (
               PARTITION BY bucket ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) - n_tokens AS cum_before
    FROM bucketed
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       bucket,
       bucket * 4294967296 + CAST(FLOOR(cum_before * 1.0 / {T11_TARGET_TOKENS}) AS BIGINT)
           AS seq_id
FROM packed
"""


T11_SQL = _t11_sql()


# ---------------------------------------------------------------------------
# T7 — winnowing document fingerprints (Schleimer/Wilkerson/Aiken):
# window-min shingle hashes, the local fingerprinting scheme whose
# guarantee (shared substrings >= window+k-1 tokens always share a
# fingerprint) lets near-dup candidate joins run over ~2/(window+1) of
# the positions. Map-only — the only data movement is the explode.
# ---------------------------------------------------------------------------

WINNOW_K = 3
WINNOW_WINDOW = 4


def _winnow_fps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t7's fingerprint frame as a shareable stage (d10 consumes the
    same frame as its posting input in single-pass runs)."""
    from big_data_flight_analytics_spark.operators.text import (
        winnow_fingerprints,
    )

    return stage(
        ("winnow_fps", sf_dir, WINNOW_K, WINNOW_WINDOW),
        lambda: winnow_fingerprints(
            load(spark, sf_dir, "documents"), k=WINNOW_K, window=WINNOW_WINDOW
        ),
    )


def t7_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _winnow_fps(spark, sf_dir)


T7_SQL = rf"""
WITH toks AS (
    SELECT doc_id,
           regexp_split_to_array(trim(lower(text)), '\s+') AS t
    FROM documents
), sh AS (
    SELECT doc_id,
           CASE WHEN len(t) >= {WINNOW_K} THEN
               list_transform(range(1, len(t) - {WINNOW_K - 2}),
                   i -> md5(t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]))
           ELSE [] END AS h
    FROM toks
), wins AS (
    SELECT doc_id,
           list_distinct(list_transform(
               range(1, greatest(len(h) - {WINNOW_WINDOW}, 0) + 2),
               j -> list_min(h[j : least(j + {WINNOW_WINDOW - 1}, len(h))])
           )) AS fps
    FROM sh
    WHERE len(h) > 0
)
SELECT doc_id, unnest(fps) AS fingerprint FROM wins
"""


# ---------------------------------------------------------------------------
# D10 — near-dup pairs via winnowed-fingerprint candidates: t7's
# fingerprints doing their actual job. Same exact-verify contract as
# d2 but the inverted-index join runs over ~2/(window+1) of the
# posting volume; recall bounded by the winnowing guarantee (shared
# runs >= window+k-1 tokens are never missed).
# ---------------------------------------------------------------------------


def d10_winnow_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.dedup import (
        winnow_jaccard_pairs,
    )

    docs = load(spark, sf_dir, "documents")
    return winnow_jaccard_pairs(
        docs,
        k=WINNOW_K,
        window=WINNOW_WINDOW,
        threshold=JACCARD_THRESHOLD,
        fingerprints=_winnow_fps(spark, sf_dir),
    )


def _d10_sql() -> str:
    return rf"""
WITH toks AS (
    SELECT doc_id,
           regexp_split_to_array(trim(lower(text)), '\s+') AS t
    FROM documents
), mh AS (
    SELECT doc_id,
           CASE WHEN len(t) >= {WINNOW_K} THEN
               list_transform(range(1, len(t) - {WINNOW_K - 2}),
                   i -> md5(t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]))
           ELSE [] END AS h
    FROM toks
), fps AS (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
               range(1, greatest(len(h) - {WINNOW_WINDOW}, 0) + 2),
               j -> list_min(h[j : least(j + {WINNOW_WINDOW - 1}, len(h))])
           ))) AS f
    FROM mh
    WHERE len(h) > 0
), candidates AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM fps a JOIN fps b ON a.f = b.f AND a.doc_id < b.doc_id
), sh AS (
    SELECT doc_id,
           CASE WHEN len(t) >= {WINNOW_K} THEN
               list_distinct(list_transform(range(1, len(t) - {WINNOW_K - 2}),
                   i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]))
           ELSE [] END AS shingles
    FROM toks
), verified AS (
    SELECT doc_a, doc_b,
           ROUND(
               len(list_intersect(sa.shingles, sb.shingles)) * 1.0 /
               (len(sa.shingles) + len(sb.shingles)
                - len(list_intersect(sa.shingles, sb.shingles))), 4) AS jaccard
    FROM candidates
    JOIN sh sa ON sa.doc_id = doc_a
    JOIN sh sb ON sb.doc_id = doc_b
)
SELECT doc_a, doc_b, jaccard FROM verified
WHERE jaccard >= {JACCARD_THRESHOLD}
"""


D10_SQL = _d10_sql()


# ---------------------------------------------------------------------------
# T8 — per-(source, language) corpus quality report: the dataset-card
# rollup a curation pipeline publishes per shard. Quality sums run in
# DECIMAL (exact, order-independent — the a8 pattern) so the hash gate
# holds; the token median is Spark's exact percentile, which matches
# DuckDB quantile_cont bit-for-bit (the a7 pattern).
# ---------------------------------------------------------------------------


def t8_source_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    stats = text_stats(docs).select("source", "lang_pred", "n_tokens", "quality")
    return stats.groupBy("source", "lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.sum(F.col("quality").cast("decimal(18,6)")), 6)
        .cast("double")
        .alias("sum_quality"),
        F.min("quality").alias("min_quality"),
        F.max("quality").alias("max_quality"),
        F.percentile("n_tokens", 0.5).alias("p50_tokens"),
    )


T8_SQL = rf"""
WITH base AS (
    SELECT source,
           text,
           length(text) AS n_chars_calc,
           CASE WHEN text IS NULL OR trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
           len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
           len(regexp_extract_all(lower(text),
               '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS n_stop
    FROM documents
), ratios AS (
    SELECT *,
           CASE WHEN n_chars_calc IS NULL OR n_chars_calc = 0 THEN 0.0
                ELSE ROUND(n_punct * 1.0 / n_chars_calc, 6) END AS punct_ratio,
           CASE WHEN n_tokens = 0 THEN 0.0
                ELSE ROUND(n_stop * 1.0 / n_tokens, 6) END AS stopword_ratio
    FROM base
), stats AS (
    SELECT source,
           n_tokens,
           ROUND(0.4 * LEAST(length(COALESCE(text, '')) / 500.0, 1.0)
                 + 0.3 * (1.0 - punct_ratio)
                 + 0.3 * LEAST(stopword_ratio / 0.1, 1.0), 6) AS quality,
           {_LANG_CASE} AS lang_pred
    FROM ratios
)
SELECT source,
       lang_pred,
       COUNT(*) AS n_docs,
       CAST(ROUND(SUM(CAST(quality AS DECIMAL(18,6))), 6) AS DOUBLE) AS sum_quality,
       MIN(quality) AS min_quality,
       MAX(quality) AS max_quality,
       quantile_cont(n_tokens, 0.5) AS p50_tokens
FROM stats
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# D9 — cross-source near-dup overlap matrix: for every pair of sources,
# how many near-dup pairs straddle them. The data-governance rollup a
# curation team uses to find which crawls/feeds are re-hosting each
# other's content. Third consumer of the shared d2 pair stage (with d6,
# d8): in a single-pass run the pair pipeline is computed once for all
# three. The pair frame is tiny relative to the corpus, so attaching
# sources is two joins the optimizer is free to broadcast; at 100 TB
# with a huge pair set they degrade gracefully to shuffle hash joins on
# doc_id.
# ---------------------------------------------------------------------------


def d9_cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    pairs = _jaccard_pairs(spark, sf_dir)
    sided = (
        pairs.join(
            docs.select(
                F.col("doc_id").alias("doc_a"), F.col("source").alias("__sa")
            ),
            "doc_a",
        )
        .join(
            docs.select(
                F.col("doc_id").alias("doc_b"), F.col("source").alias("__sb")
            ),
            "doc_b",
        )
    )
    return (
        sided.select(
            F.least("__sa", "__sb").alias("source_a"),
            F.greatest("__sa", "__sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# D9_SQL is defined after D2_SQL (it embeds the pair CTE).


# ---------------------------------------------------------------------------
# D2 — n-gram Jaccard near-dup pairs (inverted-index join)
# ---------------------------------------------------------------------------

# Hot-shingle candidate cap: inactive at sf0.01 (max observed df is 7,
# keeping oracle parity exact); at sf0.1 prunes 1.27M -> ~460k candidate
# pairs and caps the quadratic growth beyond.
MAX_SHINGLE_DF = 10


def d2_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _jaccard_pairs(spark, sf_dir)


D2_SQL = rf"""
WITH toks AS (
    SELECT doc_id,
           regexp_split_to_array(trim(lower(text)), '\s+') AS t
    FROM documents
), sh AS (
    SELECT doc_id,
           CASE WHEN len(t) >= 3 THEN
               list_distinct(list_transform(range(1, len(t) - 1),
                   i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]))
           ELSE [] END AS shingles
    FROM toks
), posting AS (
    SELECT doc_id, unnest(shingles) AS s FROM sh
), rare AS (
    SELECT s FROM posting GROUP BY s HAVING COUNT(*) <= {MAX_SHINGLE_DF}
), capped AS (
    SELECT doc_id, s FROM posting JOIN rare USING (s)
), candidates AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM capped a JOIN capped b ON a.s = b.s AND a.doc_id < b.doc_id
), verified AS (
    SELECT doc_a, doc_b,
           ROUND(
               len(list_intersect(sa.shingles, sb.shingles)) * 1.0 /
               (len(sa.shingles) + len(sb.shingles)
                - len(list_intersect(sa.shingles, sb.shingles))), 4) AS jaccard
    FROM candidates
    JOIN sh sa ON sa.doc_id = doc_a
    JOIN sh sb ON sb.doc_id = doc_b
)
SELECT doc_a, doc_b, jaccard FROM verified WHERE jaccard >= {JACCARD_THRESHOLD}
"""


D9_SQL = rf"""
WITH pairs AS (
    {D2_SQL}
)
SELECT least(sa.source, sb.source) AS source_a,
       greatest(sa.source, sb.source) AS source_b,
       COUNT(*) AS n_pairs
FROM pairs
JOIN documents sa ON pairs.doc_a = sa.doc_id
JOIN documents sb ON pairs.doc_b = sb.doc_id
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# D3 / D4 — MinHash-LSH and SimHash near-dup. md5-based signatures (see
# operators/dedup.py module docstring) make both fully oracle-checkable;
# the skew caps are mirrored in the SQL so parity holds at any value.
# ---------------------------------------------------------------------------

# Band buckets holding more docs than this are dropped before the pair
# join (inactive at sf<=0.1 — max observed band population is 4 — but at
# 100 TB boilerplate corpora concentrate quadratic candidate work there).
MAX_BAND_DF = 50

# SimHash chunk buckets ARE hot at test scale (near-zero signatures from
# short docs: max bucket 128 docs at sf0.01, 1338 at sf0.1 — superlinear)
# so this cap is active protection, not just insurance.
MAX_CHUNK_DF = 100


def d3_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # a shareable stage: d14's ensemble reuses these pairs in a
    # single-pass run instead of re-running the signature pipeline
    return stage(
        ("minhash_pairs", sf_dir, JACCARD_THRESHOLD, MAX_BAND_DF),
        lambda: minhash_lsh_pairs(
            load(spark, sf_dir, "documents"),
            threshold=JACCARD_THRESHOLD,
            max_band_df=MAX_BAND_DF,
        ),
    )


def d4_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stage(
        ("simhash_pairs", sf_dir, 32, 3, 4, MAX_CHUNK_DF),
        lambda: simhash_pairs(
            load(spark, sf_dir, "documents"),
            bits=32,
            max_hamming=3,
            chunks=4,
            max_chunk_df=MAX_CHUNK_DF,
        ),
    )


def _minhash_sig_ctes() -> str:
    """The shared MinHash signature CTE chain (toks -> ... -> bands):
    one md5 per shingle, two 28-bit ints from the hex via ascii
    arithmetic, permutations (h1 + j*h2) mod 2^31-1, banded keys — the
    literal SQL restatement of operators/dedup._minhash_band_posting,
    consumed by both the d3 pair oracle and the i4 ingest oracle."""
    digit = (
        "(CASE WHEN ascii(substr(h, {i}, 1)) < 58"
        " THEN ascii(substr(h, {i}, 1)) - 48"
        " ELSE ascii(substr(h, {i}, 1)) - 87 END)"
    )

    def hex_int(start: int, width: int) -> str:
        expr = digit.format(i=start)
        for t in range(1, width):
            expr = f"({expr} * 16 + {digit.format(i=start + t)})"
        return expr

    mins = ",\n           ".join(
        f"MIN((CAST(h1 AS BIGINT) + {j} * CAST(h2 AS BIGINT)) % 2147483647)"
        f" AS s{j}"
        for j in range(16)
    )
    band_exprs = ", ".join(
        "md5(concat_ws('|', '{bi}', s{a}, s{b}, s{c}, s{d}))".format(
            bi=bi, a=bi * 4, b=bi * 4 + 1, c=bi * 4 + 2, d=bi * 4 + 3
        )
        for bi in range(4)
    )
    return rf"""toks AS (
    SELECT doc_id,
           regexp_split_to_array(trim(lower(text)), '\s+') AS t
    FROM documents
), sh AS (
    SELECT doc_id,
           CASE WHEN len(t) >= 3 THEN
               list_distinct(list_transform(range(1, len(t) - 1),
                   i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]))
           ELSE [] END AS shingles
    FROM toks
), ne AS MATERIALIZED (
    -- MATERIALIZED (here and bands): referenced two/three times by
    -- the consumers; DuckDB inlines CTEs by default, so the whole
    -- tokenize+shingle(+signature) chain would re-evaluate per
    -- reference (the _pagerank_fp_sql lesson)
    SELECT doc_id, shingles FROM sh WHERE len(shingles) > 0
), posting AS (
    SELECT doc_id, unnest(shingles) AS s FROM ne
), hashed AS (
    SELECT doc_id, md5(s) AS h FROM posting
), hh AS (
    SELECT doc_id,
           {hex_int(1, 7)} AS h1,
           {hex_int(8, 7)} AS h2
    FROM hashed
), sigs AS (
    SELECT doc_id,
           {mins}
    FROM hh GROUP BY doc_id
), bands AS MATERIALIZED (
    SELECT doc_id, unnest([{band_exprs}]) AS band_key FROM sigs
)"""


def _d3_sql() -> str:
    """MinHash pair oracle: shared signature chain + banded candidates
    with the hot-bucket cap + exact-Jaccard verify — the literal SQL
    restatement of operators/dedup.minhash_lsh_pairs."""
    return rf"""
WITH {_minhash_sig_ctes()}, small AS (
    SELECT band_key FROM bands GROUP BY band_key HAVING COUNT(*) <= {MAX_BAND_DF}
), capped AS (
    SELECT doc_id, band_key FROM bands JOIN small USING (band_key)
), candidates AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM capped a JOIN capped b
      ON a.band_key = b.band_key AND a.doc_id < b.doc_id
), verified AS (
    SELECT doc_a, doc_b,
           ROUND(
               len(list_intersect(sa.shingles, sb.shingles)) * 1.0 /
               (len(sa.shingles) + len(sb.shingles)
                - len(list_intersect(sa.shingles, sb.shingles))), 4) AS jaccard
    FROM candidates
    JOIN ne sa ON sa.doc_id = doc_a
    JOIN ne sb ON sb.doc_id = doc_b
)
SELECT doc_a, doc_b, jaccard FROM verified WHERE jaccard >= {JACCARD_THRESHOLD}
"""


D3_SQL = _d3_sql()


def _d4_sql() -> str:
    """SimHash oracle: md5 hex digits -> per-bit sign sums -> signature,
    pigeonhole chunk joins with the hot-bucket cap, hamming verify —
    the literal SQL restatement of operators/dedup.simhash_pairs."""
    digit = (
        "CASE WHEN ascii(substr(h, {i}, 1)) < 58"
        " THEN ascii(substr(h, {i}, 1)) - 48"
        " ELSE ascii(substr(h, {i}, 1)) - 87 END AS d{d}"
    )
    digits = ",\n           ".join(digit.format(i=i + 1, d=i) for i in range(8))
    bitsums = ",\n           ".join(
        f"SUM(CASE WHEN (d{k // 4} >> {k % 4}) & 1 = 1 THEN 1 ELSE -1 END) AS b{k}"
        for k in range(32)
    )
    sigterms = "\n             + ".join(
        f"CASE WHEN b{k} > 0 THEN {1 << k}::BIGINT ELSE 0::BIGINT END"
        for k in range(32)
    )
    return rf"""
WITH toks AS (
    SELECT doc_id,
           unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS t
    FROM documents
), hashed AS (
    SELECT doc_id, md5(t) AS h FROM toks
), digits AS (
    SELECT doc_id,
           {digits}
    FROM hashed
), sums AS (
    SELECT doc_id,
           {bitsums}
    FROM digits GROUP BY doc_id
), sig AS (
    SELECT doc_id,
           {sigterms} AS sim
    FROM sums
), posting AS (
    SELECT doc_id, sim, c.ck AS ck, (sim >> (c.ck * 8)) & 255 AS cv
    FROM sig, range(0, 4) c(ck)
), small AS (
    SELECT ck, cv FROM posting GROUP BY ck, cv HAVING COUNT(*) <= {MAX_CHUNK_DF}
), capped AS (
    SELECT doc_id, sim, ck, cv FROM posting JOIN small USING (ck, cv)
), pairs AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.sim, b.sim)) AS INTEGER) AS hamming
    FROM capped a JOIN capped b
      ON a.ck = b.ck AND a.cv = b.cv AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 3
"""


D4_SQL = _d4_sql()


# ---------------------------------------------------------------------------
# V1 — brute-force cosine top-k (baseline ANN)
# ---------------------------------------------------------------------------

def v1_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return brute_force_topk(emb, queries, k=TOPK)


V1_SQL = f"""
WITH q AS (
    SELECT vec_id AS query_id, embedding AS qv FROM embeddings
    WHERE vec_id < {N_QUERY_VECS}
), scored AS (
    SELECT q.query_id,
           e.vec_id AS neighbor_id,
           CASE WHEN sqrt(list_dot_product(q.qv, q.qv))
                       * sqrt(list_dot_product(e.embedding, e.embedding)) = 0
                  THEN 0.0 ELSE ROUND(
             list_dot_product(q.qv, e.embedding) /
             (sqrt(list_dot_product(q.qv, q.qv))
              * sqrt(list_dot_product(e.embedding, e.embedding))), 4) END AS sim
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> q.query_id
), ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, neighbor_id ASC) AS rn
    FROM scored
)
SELECT query_id, neighbor_id, sim FROM ranked WHERE rn <= {TOPK}
"""


# ---------------------------------------------------------------------------
# V2 — sign-LSH bucketed approximate top-k (scale path; deterministic,
# so oracle-checkable)
# ---------------------------------------------------------------------------

LSH_BITS = 4


def v2_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return lsh_bucketed_topk(emb, queries, k=TOPK, bits=LSH_BITS)


V2_SQL = f"""
WITH sig AS (
    SELECT vec_id, embedding,
           (CASE WHEN embedding[1] > 0 THEN 8 ELSE 0 END +
            CASE WHEN embedding[2] > 0 THEN 4 ELSE 0 END +
            CASE WHEN embedding[3] > 0 THEN 2 ELSE 0 END +
            CASE WHEN embedding[4] > 0 THEN 1 ELSE 0 END) AS bucket
    FROM embeddings
), q AS (
    SELECT vec_id AS query_id, embedding AS qv, bucket FROM sig
    WHERE vec_id < {N_QUERY_VECS}
), scored AS (
    SELECT q.query_id,
           e.vec_id AS neighbor_id,
           CASE WHEN sqrt(list_dot_product(q.qv, q.qv))
                       * sqrt(list_dot_product(e.embedding, e.embedding)) = 0
                  THEN 0.0 ELSE ROUND(
             list_dot_product(q.qv, e.embedding) /
             (sqrt(list_dot_product(q.qv, q.qv))
              * sqrt(list_dot_product(e.embedding, e.embedding))), 4) END AS sim
    FROM sig e JOIN q ON e.bucket = q.bucket
    WHERE e.vec_id <> q.query_id
), ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, neighbor_id ASC) AS rn
    FROM scored
)
SELECT query_id, neighbor_id, sim FROM ranked WHERE rn <= {TOPK}
"""


# ---------------------------------------------------------------------------
# D5 — embedding-cosine near-dup pairs (sign-bucket candidates + exact
# verify; deterministic -> oracle-checkable)
# ---------------------------------------------------------------------------

NEARDUP_SIM = 0.4
# 128 rows/bucket: bucket pair-work stays bounded while recall stays
# useful; at sf0.1 (2000 vecs) this derives bits=4 — the same width the
# 10x scaling study validated — and keeps growing with log2(corpus).
NEARDUP_TARGET_BUCKET = 128
# Two disjoint sign windows (round 9, VERDICT r8 #7): the measured
# price/benefit curve says probes=2 DOMINATES the single-window
# config — d13 recall vs exhaustive truth 0.184 -> 0.351 (1.9x) at
# ~5% runtime cost, i3's curve 0.194 -> 0.369 (DEDUP_QUALITY.md).
# The catalog showcases the config we'd recommend at 100 TB; the
# probes lever stays exposed for callers who want 1 or 4.
NEARDUP_PROBES = 2


def _embedding_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d5's pair frame as a shareable stage (d13 marks from it)."""
    return stage(
        ("embedding_pairs", sf_dir, NEARDUP_SIM, NEARDUP_TARGET_BUCKET,
         NEARDUP_PROBES),
        lambda: embedding_neardup_pairs(
            load(spark, sf_dir, "embeddings"),
            threshold=NEARDUP_SIM,
            target_bucket_size=NEARDUP_TARGET_BUCKET,
            probes=NEARDUP_PROBES,
        ),
    )


def d5_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # bits defaults to None -> adaptive_bits(COUNT(*)): the scale-safe
    # configuration (fixed bits=4 measured 23x runtime at 10x corpus).
    # Deterministic in the corpus count, so the oracle recomputes the
    # identical width from COUNT(*) and parity holds at every sf.
    return _embedding_pairs(spark, sf_dir)


# params mirrors operators/similarity.adaptive_bits: bits =
# max(1, ceil(log2(max(n / target, 2)))); bucket0/bucket1 are the same
# big-endian sign integers sign_bucket() builds over the two disjoint
# windows [1, bits] and [bits+1, 2*bits]; UNION dedupes cross-window
# pairs before scoring, mirroring _bucket_scored_pairs' dropDuplicates.
D5_SQL = f"""
WITH params AS (
    SELECT GREATEST(1, CAST(CEIL(LOG2(GREATEST(
               COUNT(*) / {NEARDUP_TARGET_BUCKET}.0, 2.0))) AS INTEGER)) AS bits
    FROM embeddings
), sig AS MATERIALIZED (
    -- MATERIALIZED: referenced four times below; DuckDB would
    -- otherwise inline and recompute the signatures per reference
    SELECT vec_id, embedding,
           list_sum(list_transform(range(1, bits + 1),
               i -> CASE WHEN embedding[i] > 0
                         THEN (1 << (bits - i)) ELSE 0 END)) AS bucket0,
           list_sum(list_transform(range(1, bits + 1),
               i -> CASE WHEN embedding[bits + i] > 0
                         THEN (1 << (bits - i)) ELSE 0 END)) AS bucket1
    FROM embeddings, params
), cand AS (
    -- dedupe cross-window pairs on the ID pair only (arrays rejoin
    -- after), mirroring _bucket_scored_pairs' dropDuplicates
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM sig a JOIN sig b ON a.bucket0 = b.bucket0 AND a.vec_id < b.vec_id
    UNION
    SELECT a.vec_id, b.vec_id
    FROM sig a JOIN sig b ON a.bucket1 = b.bucket1 AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b,
       CASE WHEN sqrt(list_dot_product(a.embedding, a.embedding))
                   * sqrt(list_dot_product(b.embedding, b.embedding)) = 0
              THEN 0.0 ELSE ROUND(
         list_dot_product(a.embedding, b.embedding) /
         (sqrt(list_dot_product(a.embedding, a.embedding))
          * sqrt(list_dot_product(b.embedding, b.embedding))), 4) END AS sim
FROM cand JOIN sig a ON a.vec_id = cand.vec_a
          JOIN sig b ON b.vec_id = cand.vec_b
WHERE CASE WHEN sqrt(list_dot_product(a.embedding, a.embedding))
                   * sqrt(list_dot_product(b.embedding, b.embedding)) = 0
              THEN 0.0 ELSE ROUND(
         list_dot_product(a.embedding, b.embedding) /
         (sqrt(list_dot_product(a.embedding, a.embedding))
          * sqrt(list_dot_product(b.embedding, b.embedding))), 4) END >= {NEARDUP_SIM}
"""


# ---------------------------------------------------------------------------
# V4 — kNN graph construction: every vector's top-k cosine neighbors
# among its sign-LSH bucket mates — the all-vectors counterpart of d5's
# threshold pairs and the input artifact for SemDeDup-style semantic
# curation. Same adaptive bucket scheme as d5, mirrored in the oracle;
# the top-k window partitions by vector id (bounded partitions).
# ---------------------------------------------------------------------------

KNN_K = 5
KNN_PROBES = 2  # measured recall@5 vs exact kNN at sf0.01:
#                 probes 1 -> 0.38, 2 -> 0.59, 4 -> 0.84, 8 -> 0.98
#                 (near-isotropic synthetic vectors — the axis-sign
#                 scheme's hardest case; see BASELINE.md)
# Fixed-point similarity grain (round 8): the kNN edge set is decided
# by cosine RANKING with a rank<=k cutoff, so a 1-ulp divergence in an
# oracle engine's double fold order or ROUND version flips boundary
# edges — the r7 driver-red signature on g1. FLOOR-scaling each
# elementwise product to int64 before summation makes the score exact
# and engine-version-independent (error < dim/scale = 6.4e-14; values
# are |x| <= 0.58 over 64 dims, so per-term <= 3.4e14 and sums
# <= 2.2e16 — ample int64 headroom).
SIM_FP_SCALE = 10**15


def v4_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    # a shareable stage: g1's centrality pass consumes the same graph
    from big_data_flight_analytics_spark.operators.similarity import (
        knn_graph,
    )

    return stage(
        ("knn_graph", sf_dir, KNN_K, NEARDUP_TARGET_BUCKET, KNN_PROBES,
         SIM_FP_SCALE),
        lambda: knn_graph(
            load(spark, sf_dir, "embeddings"),
            k=KNN_K,
            target_bucket_size=NEARDUP_TARGET_BUCKET,
            probes=KNN_PROBES,
            fp_scale=SIM_FP_SCALE,
        ),
    )


# ---------------------------------------------------------------------------
# G1 — kNN-graph PageRank: which vectors are hubs of their semantic
# neighborhood (a centrality signal for curation — SemDeDup prunes
# redundancy, centrality finds representatives). Iterative join+agg
# rounds over the shared v4 graph stage. Runs in exact int64
# FIXED-POINT (scale 1e12, damping 17/20, floor division) so integer
# addition's associativity makes the result engine- and
# partitioning-independent — the accumulation-order blocker that kept
# the float variant rows-only is gone, and the full hash gate applies.
# The oracle unrolls the 5 iterations as chained CTEs over the same
# v4 graph SQL. Float variant (``pagerank``) remains for
# tolerance-based use; its 1e-9 python differential lives in
# TestPageRank.
# ---------------------------------------------------------------------------

PAGERANK_ITER = 5
PAGERANK_SCALE = 10**12


def g1_knn_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.graph import (
        pagerank_fixedpoint,
    )

    g = v4_knn_graph(spark, sf_dir)
    return pagerank_fixedpoint(
        g.select(F.col("vec_a").alias("src"), F.col("vec_b").alias("dst")),
        num_iter=PAGERANK_ITER,
        scale=PAGERANK_SCALE,
    )


V4_SQL = f"""
WITH params AS (
    SELECT GREATEST(1, CAST(CEIL(LOG2(GREATEST(
               COUNT(*) / {NEARDUP_TARGET_BUCKET}.0, 2.0))) AS INTEGER)) AS bits
    FROM embeddings
), sig AS (
    -- Fixed-point similarity (round 8): rank-deciding scores must not
    -- depend on an engine version's double fold order or ROUND
    -- implementation (the r7 driver-red signature). Each elementwise
    -- product is FLOOR-scaled to an int64 grain BEFORE summation —
    -- integer addition is associative-exact, and float*float is exact
    -- in double, so dot and the squared norms are bit-identical in any
    -- engine. CAST to DOUBLE[] keeps the per-element products the same
    -- doubles Spark computes from float casts.
    -- Two DISJOINT sign windows (multi-probe): bucket0 over dims
    -- [1, bits], bucket1 over [bits+1, 2*bits].
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding,
           CAST(list_sum(list_transform(
               range(1, len(embedding) + 1),
               i -> CAST(FLOOR(CAST(embedding[i] AS DOUBLE)
                               * CAST(embedding[i] AS DOUBLE)
                               * {SIM_FP_SCALE}.0) AS BIGINT)))
               AS BIGINT) AS nsq,
           list_sum(list_transform(range(1, bits + 1),
               i -> CASE WHEN embedding[i] > 0
                         THEN (1 << (bits - i)) ELSE 0 END)) AS bucket0,
           list_sum(list_transform(range(1, bits + 1),
               i -> CASE WHEN embedding[bits + i] > 0
                         THEN (1 << (bits - i)) ELSE 0 END)) AS bucket1
    FROM embeddings, params
), cand AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           a.embedding AS ea, b.embedding AS eb,
           a.nsq AS na, b.nsq AS nb
    FROM sig a JOIN sig b ON a.bucket0 = b.bucket0 AND a.vec_id <> b.vec_id
    UNION
    SELECT a.vec_id, b.vec_id, a.embedding, b.embedding, a.nsq, b.nsq
    FROM sig a JOIN sig b ON a.bucket1 = b.bucket1 AND a.vec_id <> b.vec_id
), scored AS (
    -- exact int64 dot grain; final divide runs in double but every
    -- input is an exact integer and sqrt/mul/div are correctly-rounded
    -- IEEE-754 ops — bit-identical cross-engine, no ROUND anywhere
    SELECT vec_a, vec_b,
           CASE WHEN na <= 0 OR nb <= 0 THEN 0.0
                ELSE CAST(CAST(list_sum(list_transform(
                         range(1, len(ea) + 1),
                         i -> CAST(FLOOR(ea[i] * eb[i]
                                         * {SIM_FP_SCALE}.0) AS BIGINT)))
                         AS BIGINT) AS DOUBLE)
                     / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE)))
           END AS sim
    FROM cand
), ranked AS (
    SELECT vec_a, vec_b, sim,
           CAST(ROW_NUMBER() OVER (PARTITION BY vec_a
                                   ORDER BY sim DESC, vec_b ASC) AS INTEGER)
               AS rank
    FROM scored
)
SELECT vec_a, vec_b, sim, rank FROM ranked WHERE rank <= {KNN_K}
"""


def _pagerank_fp_sql(
    edges_sql: str,
    num_iter: int = PAGERANK_ITER,
    scale: int = PAGERANK_SCALE,
    damping_num: int = 17,
    damping_den: int = 20,
) -> str:
    """Unrolled fixed-point PageRank as chained DuckDB CTEs.

    Mirrors ``operators.graph.pagerank_fixedpoint`` op-for-op: int64
    rank units out of ``scale``, floor division everywhere (all values
    non-negative, so DuckDB's ``//`` == Spark's ``DIV``), damping as
    the rational num/den. Integer addition is associative-exact, so
    the unrolled CTE chain and Spark's iterative plan agree bit-for-bit
    regardless of join order or partitioning.
    """
    base_num = damping_den - damping_num
    parts = [
        # MATERIALIZED matters: DuckDB inlines CTEs by default, so
        # without it the (expensive) edge-list SQL would re-evaluate
        # once per reference — nodes x2, deg, and every iteration's
        # contribution join (measured 239 s -> ~13 s at sf0.01).
        f"""WITH edges AS MATERIALIZED (
    SELECT DISTINCT vec_a AS s, vec_b AS d FROM ( {edges_sql} )
),
nodes AS MATERIALIZED (SELECT s AS node FROM edges UNION SELECT d FROM edges),
nn AS (SELECT COUNT(*) AS n FROM nodes),
deg AS MATERIALIZED (SELECT s AS node, COUNT(*) AS deg FROM edges GROUP BY 1),
r0 AS (SELECT node, {scale} // n AS r FROM nodes, nn)"""
    ]
    for k in range(1, num_iter + 1):
        p = k - 1
        parts.append(
            f"""r{p}m AS MATERIALIZED (SELECT node, r FROM r{p}),
d{k} AS (
    SELECT COALESCE(SUM(r), 0) AS dang
    FROM r{p}m LEFT JOIN deg USING (node) WHERE deg IS NULL
),
i{k} AS (
    SELECT e.d AS node, SUM(p.r // dg.deg) AS inr
    FROM r{p}m p JOIN deg dg ON p.node = dg.node
                 JOIN edges e ON e.s = p.node
    GROUP BY 1
),
r{k} AS (
    SELECT no.node,
           {base_num} * {scale} // ({damping_den} * nn.n)
           + {damping_num} * (COALESCE(i.inr, 0) + dk.dang // nn.n)
             // {damping_den} AS r
    FROM nodes no LEFT JOIN i{k} i ON no.node = i.node, d{k} dk, nn
)"""
        )
    body = ",\n".join(parts)
    # CAST to BIGINT (round 9): the iterated integer sums propagate
    # HUGEINT through the CTE chain and the driver's pandas
    # canonicalizer mis-hashes int128 output columns (VERDICT r8 —
    # the probe with an INT output was green over the same edges
    # while the raw-sum output was red). Driver-safe envelope is
    # BIGINT/DOUBLE/VARCHAR/DATE/TS/BOOLEAN only.
    return (
        f"{body}\n"
        f"SELECT node, CAST(r AS BIGINT) AS rank_fp FROM r{num_iter}"
    )


G1_SQL = _pagerank_fp_sql(V4_SQL)


# ---------------------------------------------------------------------------
# G2 — kNN-graph triangles + local clustering coefficient (round 9):
# the graph-quality counterpart to g1's centrality. Near-dup
# neighborhoods are cliquish (lcc -> 1), topical hubs are star-like
# (lcc -> 0) — a curation signal over the SAME shared v4 graph stage.
# Degree-oriented wedge closing (node-iterator++) bounds wedge work by
# sum(out_deg choose 2), out_deg <= O(sqrt(m)) — the hub that would
# explode under naive enumeration generates zero wedges. Exact integer
# counts; the lcc division is one correctly-rounded double op on exact
# int inputs, so the full hash gate applies.
# ---------------------------------------------------------------------------


def g2_knn_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.graph import (
        triangle_clustering,
    )

    g = v4_knn_graph(spark, sf_dir)
    return triangle_clustering(
        g.select(F.col("vec_a").alias("src"), F.col("vec_b").alias("dst"))
    )


def _g2_sql(edges_sql: str) -> str:
    """Literal SQL restatement of operators/graph.triangle_clustering
    over the v4 edge SQL. Orientation spelled as the same boolean
    algebra as the Spark plan (no row-value comparisons — zero
    cross-engine comparison-semantics surface)."""
    return f"""
WITH edges AS MATERIALIZED (
    SELECT DISTINCT vec_a AS s, vec_b AS d FROM ( {edges_sql} )
), und AS MATERIALIZED (
    SELECT DISTINCT LEAST(s, d) AS a, GREATEST(s, d) AS b
    FROM edges WHERE s <> d
), deg AS MATERIALIZED (
    SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
    FROM (SELECT a AS node FROM und UNION ALL SELECT b FROM und)
    GROUP BY 1
), oriented AS MATERIALIZED (
    SELECT CASE WHEN da.degree < db.degree
                  OR (da.degree = db.degree AND a < b)
                THEN a ELSE b END AS u,
           CASE WHEN da.degree < db.degree
                  OR (da.degree = db.degree AND a < b)
                THEN b ELSE a END AS v,
           CASE WHEN da.degree < db.degree
                  OR (da.degree = db.degree AND a < b)
                THEN db.degree ELSE da.degree END AS dv
    FROM und JOIN deg da ON da.node = und.a
             JOIN deg db ON db.node = und.b
), tri AS MATERIALIZED (
    SELECT w1.u, w1.v AS x, w2.v AS y
    FROM oriented w1
    JOIN oriented w2 ON w1.u = w2.u
    JOIN oriented c ON c.u = w1.v AND c.v = w2.v
    WHERE w1.dv < w2.dv OR (w1.dv = w2.dv AND w1.v < w2.v)
), per_node AS (
    SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles
    FROM (SELECT u AS node FROM tri
          UNION ALL SELECT x FROM tri
          UNION ALL SELECT y FROM tri)
    GROUP BY 1
)
SELECT deg.node, deg.degree,
       CAST(COALESCE(p.triangles, 0) AS BIGINT) AS triangles,
       CASE WHEN deg.degree < 2 THEN 0.0
            ELSE CAST(2 * COALESCE(p.triangles, 0) AS DOUBLE)
                 / CAST(deg.degree * (deg.degree - 1) AS DOUBLE)
       END AS lcc
FROM deg LEFT JOIN per_node p USING (node)
"""


G2_SQL = _g2_sql(V4_SQL)


# ---------------------------------------------------------------------------
# D14 — dedup-method ensemble: the union of the three text near-dup
# detectors (n-gram Jaccard, MinHash-LSH, SimHash) with per-method
# provenance flags — the agreement/complementarity report a curation
# pipeline uses to pick its method mix. Pure composition: reuses d2's
# shared pair stage in single-pass runs; the ensemble adds one
# small-key aggregation over the union of pair lists (pair lists, not
# posting lists — the cheap side of each pipeline).
# ---------------------------------------------------------------------------


def d14_dedup_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    j = d2_ngram_jaccard(spark, sf_dir).select(
        "doc_a", "doc_b",
        F.lit(1).alias("__j"), F.lit(0).alias("__m"), F.lit(0).alias("__s"),
    )
    m = d3_minhash_lsh(spark, sf_dir).select(
        "doc_a", "doc_b",
        F.lit(0).alias("__j"), F.lit(1).alias("__m"), F.lit(0).alias("__s"),
    )
    s = d4_simhash(spark, sf_dir).select(
        "doc_a", "doc_b",
        F.lit(0).alias("__j"), F.lit(0).alias("__m"), F.lit(1).alias("__s"),
    )
    return (
        j.unionByName(m)
        .unionByName(s)
        .groupBy("doc_a", "doc_b")
        .agg(
            (F.max("__j") == 1).alias("by_jaccard"),
            (F.max("__m") == 1).alias("by_minhash"),
            (F.max("__s") == 1).alias("by_simhash"),
            (F.max("__j") + F.max("__m") + F.max("__s"))
            .cast("int")
            .alias("n_methods"),
        )
    )


D14_SQL = f"""
WITH u AS (
    SELECT doc_a, doc_b, 1 AS jj, 0 AS mm, 0 AS ss
    FROM ( {D2_SQL} )
    UNION ALL
    SELECT doc_a, doc_b, 0, 1, 0 FROM ( {D3_SQL} )
    UNION ALL
    SELECT doc_a, doc_b, 0, 0, 1 FROM ( {D4_SQL} )
)
SELECT doc_a, doc_b,
       MAX(jj) = 1 AS by_jaccard,
       MAX(mm) = 1 AS by_minhash,
       MAX(ss) = 1 AS by_simhash,
       CAST(MAX(jj) + MAX(mm) + MAX(ss) AS INTEGER) AS n_methods
FROM u GROUP BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# D13 — SemDeDup-style semantic pruning: drop every vector with a
# lower-id bucket mate above the d5 similarity threshold
# (chain-transitive — see the operator docstring for the
# keep-one-per-cluster alternative). Pure composition over the d5
# pair pipeline; output marks EVERY vector so the curation decision
# is auditable, not just the survivor list.
# ---------------------------------------------------------------------------


def d13_semantic_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.similarity import (
        semantic_prune,
    )

    emb = load(spark, sf_dir, "embeddings")
    return semantic_prune(
        emb,
        threshold=NEARDUP_SIM,
        target_bucket_size=NEARDUP_TARGET_BUCKET,
        pairs=_embedding_pairs(spark, sf_dir),
    )


D13_SQL = f"""
WITH pairs AS (
    {D5_SQL}
)
SELECT vec_id,
       vec_id IN (SELECT vec_b FROM pairs) AS pruned
FROM embeddings
"""


# ---------------------------------------------------------------------------
# M1 — multimodal binary plumbing: payload + mapInPandas feature stub.
# Oracle checks the Arrow plumbing end-to-end because the stub decode is
# a deterministic function of the payload bytes.
# ---------------------------------------------------------------------------

def m1_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return extract_features(attach_binary_payload(docs))


M1_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(COALESCE(text, ''))) AS INTEGER) AS n_bytes,
       CAST(octet_length(encode(COALESCE(text, ''))) % 640 AS INTEGER) AS fake_width,
       CAST((octet_length(encode(COALESCE(text, ''))) * 7) % 480 AS INTEGER)
           AS fake_height
FROM documents
"""


# ---------------------------------------------------------------------------
# M2 — frame sampling: the 1->N mapInPandas expansion a video frame
# sampler uses — one output row per sampled payload offset, expansion
# vectorized inside the Arrow batch (numpy repeat + ragged arange,
# no per-row Python). The decode itself stays a deterministic stub
# (no media libs here); every Spark-side piece — schema contract,
# batch iteration, row expansion, partition parallelism — is real and
# oracle-checked. No shuffle: map-only over the scan.
# ---------------------------------------------------------------------------

M2_FRAME_BYTES = 64


def m2_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.multimodal import (
        frame_sample_stub,
    )

    docs = load(spark, sf_dir, "documents")
    return frame_sample_stub(
        attach_binary_payload(docs), every_n_bytes=M2_FRAME_BYTES
    ).select(
        "doc_id", "frame_no", F.col("offset").alias("frame_offset")
    )


# ---------------------------------------------------------------------------
# M3 — frame-grain exact dedup over the binary payload: which fixed-64-
# byte slices repeat corpus-wide (the video-pipeline dup-frame scan).
# Pure native expressions — sequence/explode + binary substring + md5,
# one shuffle on the frame fingerprint. Oracle contract: the corpus is
# pure ASCII (octet_length == length, asserted in tests), so DuckDB's
# char-wise VARCHAR substring slices the identical bytes Spark's binary
# substring does, and md5(VARCHAR) hashes the same octets as
# Spark's md5(BINARY).
# ---------------------------------------------------------------------------


def m3_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.multimodal import (
        frame_dedup,
    )

    docs = load(spark, sf_dir, "documents")
    return frame_dedup(
        attach_binary_payload(docs), every_n_bytes=M2_FRAME_BYTES
    )


M3_SQL = f"""
WITH frames AS (
    SELECT doc_id,
           CAST(u.f AS INTEGER) AS frame_no,
           substring(COALESCE(text, ''),
                     CAST(u.f AS INTEGER) * {M2_FRAME_BYTES} + 1,
                     {M2_FRAME_BYTES}) AS frame_txt
    FROM documents,
         UNNEST(range((octet_length(encode(COALESCE(text, '')))
                       + {M2_FRAME_BYTES} - 1) // {M2_FRAME_BYTES})) AS u(f)
), hashed AS (
    SELECT md5(frame_txt) AS fingerprint,
           doc_id * 1000000 + frame_no AS pos
    FROM frames
)
SELECT fingerprint,
       COUNT(*) AS n_frames,
       CAST(MIN(pos) // 1000000 AS BIGINT) AS first_doc_id,
       CAST(MIN(pos) % 1000000 AS BIGINT) AS first_frame_no
FROM hashed
GROUP BY 1 HAVING COUNT(*) >= 2
"""


M2_SQL = f"""
WITH lens AS (
    SELECT doc_id, octet_length(encode(COALESCE(text, ''))) AS n
    FROM documents
)
SELECT doc_id,
       CAST(u.f AS INTEGER) AS frame_no,
       CAST(u.f * {M2_FRAME_BYTES} AS INTEGER) AS frame_offset
FROM lens, UNNEST(range((n + {M2_FRAME_BYTES} - 1) // {M2_FRAME_BYTES})) AS u(f)
"""


# ---------------------------------------------------------------------------
# D7 — benchmark decontamination: corpus docs sharing >= K shingles
# with a (broadcast-small) benchmark set — asymmetric containment, the
# eval-leakage guard symmetric Jaccard misses.
# ---------------------------------------------------------------------------

N_BENCH_DOCS = 5
MIN_SHARED = 2


def d7_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.dedup import (
        containment_overlap,
    )

    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < N_BENCH_DOCS)
    corpus = docs.filter(F.col("doc_id") >= N_BENCH_DOCS)
    return containment_overlap(corpus, bench, min_shared=MIN_SHARED)


D7_SQL = rf"""
WITH toks AS (
    SELECT doc_id,
           regexp_split_to_array(trim(lower(text)), '\s+') AS t
    FROM documents
), sh AS (
    SELECT doc_id,
           CASE WHEN len(t) >= 3 THEN
               list_distinct(list_transform(range(1, len(t) - 1),
                   i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]))
           ELSE [] END AS shingles
    FROM toks
), bench AS (
    SELECT doc_id AS bench_doc, unnest(shingles) AS sh FROM sh
    WHERE doc_id < {N_BENCH_DOCS}
), corpus AS (
    SELECT doc_id AS corpus_doc, unnest(shingles) AS sh FROM sh
    WHERE doc_id >= {N_BENCH_DOCS}
)
SELECT bench_doc, corpus_doc, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM corpus JOIN bench USING (sh)
GROUP BY bench_doc, corpus_doc
HAVING COUNT(*) >= {MIN_SHARED}
"""


# ---------------------------------------------------------------------------
# D20 — normalized-containment decontamination: short-benchmark-in-long-
# document eval leakage. Benchmark items are 12-token MID-SLICES of
# every 50th document (deterministic, in-plan), so a near-dup of the
# source doc elsewhere in the corpus "contains the benchmark" exactly
# the way a quoted eval item does — while its symmetric Jaccard vs the
# tiny slice is far below any d2/d3 threshold. Membership by integer
# cross-multiply (n_shared*100 >= pct*|bench|); containment double is
# display-only.
# ---------------------------------------------------------------------------

D20_SLICE_START = 5  # 1-based token position
D20_SLICE_LEN = 12
D20_BENCH_EVERY = 50
D20_PCT = 50
D20_NGRAM = 3


def d20_bench_slices(docs: DataFrame) -> DataFrame:
    """The planted benchmark set shared by d20/d21 and bench_stream's
    s8: 12-token mid-slices of every ``D20_BENCH_EVERY``-th document
    (deterministic, in-plan)."""
    from big_data_flight_analytics_spark.operators.text import tokens

    return (
        docs.select("doc_id", tokens("text").alias("__tk"))
        .filter(F.col("doc_id") % D20_BENCH_EVERY == 0)
        .filter(F.size("__tk") >= D20_SLICE_START + D20_SLICE_LEN - 1)
        .select(
            "doc_id",
            F.concat_ws(
                " ", F.slice("__tk", D20_SLICE_START, D20_SLICE_LEN)
            ).alias("text"),
        )
    )


def _decon_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d20's contaminated (corpus_doc, bench_doc) pairs as a shareable
    stage — t24's decon step replays exactly this frame, so a
    single-pass run builds the posting join once (the d2/d6 treatment
    applied to the assembly chain's second-most-expensive parent)."""
    from big_data_flight_analytics_spark.operators.dedup import (
        containment_decon_pairs,
    )

    docs = load(spark, sf_dir, "documents")
    return stage(
        ("decon_pairs", sf_dir, D20_NGRAM, D20_PCT),
        lambda: containment_decon_pairs(
            docs, d20_bench_slices(docs), n=D20_NGRAM, threshold_pct=D20_PCT
        )
        # bench items are slices OF corpus docs: the source doc trivially
        # contains its own slice — real decon flags everything else
        .filter(F.col("corpus_doc") != F.col("bench_doc")),
    )


def d20_containment_decon(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _decon_pairs(spark, sf_dir)


# Gram expression and range bound derived from D20_NGRAM (the d19
# lesson — never hardcode the expansion next to an interpolated bound).
_D20_GRAM_EXPR = " || ' ' || ".join(
    f"tk[i + {k}]" for k in range(D20_NGRAM)
)
_D20_BGRAM_EXPR = " || ' ' || ".join(
    f"btk[i + {k}]" for k in range(D20_NGRAM)
)
D20_SQL = rf"""
WITH toks AS (
    SELECT doc_id,
           regexp_split_to_array(trim(lower(text)), '\s+') AS tk
    FROM documents
), bench AS (
    SELECT doc_id AS bench_doc,
           tk[{D20_SLICE_START}:{D20_SLICE_START + D20_SLICE_LEN - 1}] AS btk
    FROM toks
    WHERE doc_id % {D20_BENCH_EVERY} = 0
      AND len(tk) >= {D20_SLICE_START + D20_SLICE_LEN - 1}
), bsh AS (
    SELECT bench_doc,
           list_distinct(CASE WHEN len(btk) >= {D20_NGRAM} THEN
               list_transform(range(1, len(btk) - {D20_NGRAM - 2}),
                   i -> {_D20_BGRAM_EXPR})
           ELSE [] END) AS s
    FROM bench
), bsz AS (
    SELECT bench_doc, len(s) AS bsz FROM bsh
), bp AS (
    SELECT bench_doc, unnest(s) AS g FROM bsh
), csh AS (
    SELECT doc_id AS corpus_doc,
           list_distinct(CASE WHEN len(tk) >= {D20_NGRAM} THEN
               list_transform(range(1, len(tk) - {D20_NGRAM - 2}),
                   i -> {_D20_GRAM_EXPR})
           ELSE [] END) AS s
    FROM toks
), cp AS (
    SELECT corpus_doc, unnest(s) AS g FROM csh
)
SELECT bench_doc, corpus_doc,
       CAST(COUNT(*) AS BIGINT) AS n_shared,
       ROUND(COUNT(*) * 1.0 / ANY_VALUE(bsz), 4) AS containment
FROM bp JOIN cp USING (g) JOIN bsz USING (bench_doc)
WHERE corpus_doc != bench_doc
GROUP BY bench_doc, corpus_doc
HAVING COUNT(*) * 100 >= {D20_PCT} * ANY_VALUE(bsz)
"""


# ---------------------------------------------------------------------------
# D21 — decontamination EXCISION: the action half of d20 (as d16 is to
# d15). Tokens covered by any length-n window that appears in the
# benchmark set are removed; the novel remainder is rejoined in order
# (Lee et al. 2022 excise rather than drop — the rest of the document
# is still good training data). Same planted benchmark as d20; window
# n=6 so the 12-token slices carry 7 windows each. Runs shorter than
# n tokens are below the excision grain and stay.
# ---------------------------------------------------------------------------

D21_N = 6


def d21_decon_excise(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.dedup import (
        contaminated_window_marks,
        excise_repeated_spans,
    )

    docs = load(spark, sf_dir, "documents")
    marks = contaminated_window_marks(
        docs, d20_bench_slices(docs), n=D21_N
    )
    return excise_repeated_spans(docs, n=D21_N, marks=marks)


_D21_GRAM = " || ' ' || ".join(f"t[i + {j}]" for j in range(D21_N)).replace(
    "t[i + 0]", "t[i]"
)
_D21_BGRAM = " || ' ' || ".join(
    f"btk[i + {j}]" for j in range(D21_N)
).replace("btk[i + 0]", "btk[i]")

D21_SQL = rf"""
WITH toks AS (
    SELECT doc_id, text,
           CASE WHEN text IS NULL OR trim(text) = '' THEN []
                ELSE regexp_split_to_array(trim(lower(text)), '\s+')
           END AS t
    FROM documents
), base AS (
    SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
           t[CAST(u.i AS BIGINT) + 1] AS tok
    FROM toks, UNNEST(range(len(t))) AS u(i)
), bench AS (
    SELECT t[{D20_SLICE_START}:{D20_SLICE_START + D20_SLICE_LEN - 1}] AS btk
    FROM toks
    WHERE doc_id % {D20_BENCH_EVERY} = 0
      AND len(t) >= {D20_SLICE_START + D20_SLICE_LEN - 1}
), bgrams AS (
    SELECT DISTINCT unnest(CASE WHEN len(btk) >= {D21_N} THEN
        list_transform(range(1, len(btk) - {D21_N - 2}),
            i -> md5({_D21_BGRAM}))
    ELSE [] END) AS g
    FROM bench
), grams AS (
    SELECT doc_id,
           CASE WHEN len(t) >= {D21_N} THEN
               list_transform(range(1, len(t) - {D21_N - 2}),
                   i -> md5({_D21_GRAM}))
           ELSE [] END AS h
    FROM toks
), gpos AS (
    SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
           h[CAST(u.i AS BIGINT) + 1] AS g
    FROM grams, UNNEST(range(len(h))) AS u(i)
), marked AS (
    SELECT p.doc_id, p.pos FROM gpos p JOIN bgrams USING (g)
), covered AS (
    SELECT DISTINCT m.doc_id, CAST(u.j AS BIGINT) AS pos
    FROM marked m, UNNEST(range(m.pos, m.pos + {D21_N})) AS u(j)
), kept AS (
    SELECT b.doc_id, b.pos, b.tok
    FROM base b ANTI JOIN covered c USING (doc_id, pos)
), rebuilt AS (
    SELECT doc_id,
           string_agg(tok, ' ' ORDER BY pos) AS clean_text,
           CAST(COUNT(*) AS BIGINT) AS n_kept
    FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       COALESCE(r.clean_text, '') AS clean_text,
       COALESCE(r.n_kept, 0) AS n_kept,
       CAST(len(t.t) AS BIGINT) - COALESCE(r.n_kept, 0) AS n_removed
FROM toks t LEFT JOIN rebuilt r USING (doc_id)
"""


# ---------------------------------------------------------------------------
# T21 — in-engine quality classifier under the hash gate: batch
# perceptron over md5-hashed word-bigram bucket counts
# (operators/classifier.py). Training is all-int64 (no learning rate,
# no sigmoid — EXP is not engine-proven the way LN is), so the trained
# model is a pure function of the data and the oracle replays training
# as unrolled CTE rounds (the pagerank/Lloyd doctrine for supervised
# learning). Self-supervised label: lexical diversity >= 1/2 — the
# Gopher repetition axis; real labels drop in unchanged.
# ---------------------------------------------------------------------------

T21_BUCKETS = 256
T21_ITER = 4


def t21_perceptron_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.classifier import (
        perceptron_quality,
    )

    return perceptron_quality(
        load(spark, sf_dir, "documents"),
        n_buckets=T21_BUCKETS,
        n_iter=T21_ITER,
    )


def _t21_sql() -> str:
    b = T21_BUCKETS
    head = rf"""
WITH tok AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                       x -> x <> '') AS t
    FROM documents
    WHERE text IS NOT NULL AND trim(text) <> ''
), lab AS (
    SELECT doc_id,
           CASE WHEN 2 * len(list_distinct(t)) >= len(t)
                THEN 1 ELSE -1 END AS y,
           t
    FROM tok
), grams AS (
    SELECT doc_id, y,
           md5(unnest(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i + 1]))) AS h
    FROM lab
), feat AS MATERIALIZED (
    SELECT doc_id, y,
           CAST(('0x' || substring(h, 1, 4)) AS BIGINT) % {b} AS bucket,
           CAST(COUNT(*) AS BIGINT) AS x
    FROM grams GROUP BY doc_id, y, bucket
), w1 AS MATERIALIZED (
    SELECT bucket, CAST(SUM(y * x) AS BIGINT) AS w FROM feat GROUP BY bucket
)"""
    rounds = []
    for r in range(2, T21_ITER + 1):
        rounds.append(rf""", m{r} AS MATERIALIZED (
    SELECT doc_id, y,
           CAST(SUM(x * COALESCE(w, 0)) AS BIGINT) AS margin
    FROM feat LEFT JOIN w{r - 1} USING (bucket)
    GROUP BY doc_id, y
), g{r} AS (
    SELECT bucket, CAST(SUM(y * x) AS BIGINT) AS g
    FROM feat
    JOIN (SELECT doc_id FROM m{r} WHERE y * margin <= 0) mis USING (doc_id)
    GROUP BY bucket
), w{r} AS MATERIALIZED (
    SELECT COALESCE(a.bucket, c.bucket) AS bucket,
           COALESCE(a.w, 0) + COALESCE(c.g, 0) AS w
    FROM w{r - 1} a FULL JOIN g{r} c ON a.bucket = c.bucket
)""")
    n = T21_ITER
    tail = rf""", mf AS (
    SELECT doc_id, y,
           CAST(SUM(x * COALESCE(w, 0)) AS BIGINT) AS margin
    FROM feat LEFT JOIN w{n} USING (bucket)
    GROUP BY doc_id, y
)
SELECT doc_id, y AS label, margin,
       CAST(CASE WHEN margin > 0 THEN 1 ELSE -1 END AS BIGINT) AS pred
FROM mf
"""
    return head + "".join(rounds) + tail


T21_SQL = _t21_sql()


# ---------------------------------------------------------------------------
# D22 — sketch-containment screen: MinHash-estimated containment
# (Broder estimator + exact set sizes, integer cross-multiply flag
# rule) over the d20 benchmark framing. The zero-shuffle scale path:
# benchmark sketches broadcast, every corpus doc scored map-side —
# the screening pass whose survivors d20's exact posting join then
# verifies at candidate count. Estimator noise at slice-sized sets is
# the documented trade (precision/recall vs exact d20 in
# DEDUP_QUALITY.md).
# ---------------------------------------------------------------------------

D22_PERMS = 32


def d22_sketch_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.dedup import (
        sketch_containment_pairs,
    )

    docs = load(spark, sf_dir, "documents")
    return (
        sketch_containment_pairs(
            docs,
            d20_bench_slices(docs),
            n=D20_NGRAM,
            num_perm=D22_PERMS,
            threshold_pct=D20_PCT,
        )
        # a slice's own source doc trivially contains it (d20 rule)
        .filter(F.col("corpus_doc") != F.col("bench_doc"))
    )


def _d22_sql() -> str:
    mins = ",\n           ".join(
        f"MIN((CAST(h1 AS BIGINT) + {j} * CAST(h2 AS BIGINT))"
        f" % 2147483647) AS s{j}"
        for j in range(D22_PERMS)
    )
    match_terms = "\n             + ".join(
        f"(CASE WHEN c.s{j} = b.s{j} THEN 1 ELSE 0 END)"
        for j in range(D22_PERMS)
    )
    gram = "t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]"
    bgram = "bt[i] || ' ' || bt[i + 1] || ' ' || bt[i + 2]"
    return rf"""
WITH toks AS (
    SELECT doc_id,
           regexp_split_to_array(trim(lower(text)), '\s+') AS t
    FROM documents
), cse AS (
    SELECT doc_id AS corpus_doc,
           CASE WHEN len(t) >= {D20_NGRAM} THEN
               list_distinct(list_transform(range(1, len(t) - {D20_NGRAM - 2}),
                   i -> {gram}))
           ELSE [] END AS s
    FROM toks
), cpost AS (
    SELECT corpus_doc, md5(unnest(s)) AS h
    FROM cse WHERE len(s) > 0
), chh AS (
    SELECT corpus_doc,
           CAST(('0x' || substring(h, 1, 7)) AS BIGINT) AS h1,
           CAST(('0x' || substring(h, 8, 7)) AS BIGINT) AS h2
    FROM cpost
), csig AS MATERIALIZED (
    SELECT corpus_doc, CAST(COUNT(*) AS BIGINT) AS corpus_size,
           {mins}
    FROM chh GROUP BY corpus_doc
), bsl AS (
    SELECT doc_id AS bench_doc,
           t[{D20_SLICE_START}:{D20_SLICE_START + D20_SLICE_LEN - 1}] AS bt
    FROM toks
    WHERE doc_id % {D20_BENCH_EVERY} = 0
      AND len(t) >= {D20_SLICE_START + D20_SLICE_LEN - 1}
), bse AS (
    SELECT bench_doc,
           CASE WHEN len(bt) >= {D20_NGRAM} THEN
               list_distinct(list_transform(range(1, len(bt) - {D20_NGRAM - 2}),
                   i -> {bgram}))
           ELSE [] END AS s
    FROM bsl
), bpost AS (
    SELECT bench_doc, md5(unnest(s)) AS h
    FROM bse WHERE len(s) > 0
), bhh AS (
    SELECT bench_doc,
           CAST(('0x' || substring(h, 1, 7)) AS BIGINT) AS h1,
           CAST(('0x' || substring(h, 8, 7)) AS BIGINT) AS h2
    FROM bpost
), bsig AS MATERIALIZED (
    SELECT bench_doc, CAST(COUNT(*) AS BIGINT) AS bench_size,
           {mins}
    FROM bhh GROUP BY bench_doc
), scored AS (
    SELECT b.bench_doc, c.corpus_doc,
           CAST({match_terms} AS BIGINT) AS n_match,
           b.bench_size, c.corpus_size
    FROM csig c CROSS JOIN bsig b
    WHERE c.corpus_doc <> b.bench_doc
)
SELECT bench_doc, corpus_doc, n_match, bench_size, corpus_size,
       CAST(FLOOR(
           CAST(100 * n_match * (bench_size + corpus_size) AS DOUBLE)
           / CAST(({D22_PERMS} + n_match) * bench_size AS DOUBLE)
       ) AS BIGINT) AS est_pct
FROM scored
WHERE 100 * n_match * (bench_size + corpus_size)
      >= {D20_PCT} * ({D22_PERMS} + n_match) * bench_size
"""


D22_SQL = _d22_sql()


# ---------------------------------------------------------------------------
# T20 — hashed char-n-gram language ID: per-doc integer LLR against K
# reference class profiles (operators/langid.py — the t18 DSIR
# machinery pointed at classification). The labeled reference slice is
# every T20_REF_EVERY-th doc (its `lang` column); every held-out doc
# is scored against all K profiles and argmax-classified, tie-broken
# to the smallest label. Profile table is K x T20_BUCKETS rows —
# corpus-size-independent broadcast. On the engine's synthetic corpus
# the lang labels are text-independent, so accuracy is chance — the
# planted-language truth study (separable vocabularies, accuracy 1.0)
# lives in tests/test_langid.py.
# ---------------------------------------------------------------------------

T20_NGRAM = 3
T20_BUCKETS = 256
T20_GRAIN = 1_000_000
T20_REF_EVERY = 10


def t20_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.langid import (
        langid_hashed_ngrams,
        langid_profiles,
    )

    docs = load(spark, sf_dir, "documents")
    ref = docs.filter(
        (F.col("doc_id") % T20_REF_EVERY == 0) & F.col("lang").isNotNull()
    ).select("lang", "text")
    profiles = langid_profiles(
        ref,
        label_col="lang",
        n=T20_NGRAM,
        n_buckets=T20_BUCKETS,
        grain=T20_GRAIN,
    )
    held = docs.filter(F.col("doc_id") % T20_REF_EVERY != 0)
    pred = langid_hashed_ngrams(
        held,
        profiles,
        label_col="lang",
        n=T20_NGRAM,
        n_buckets=T20_BUCKETS,
    )
    return pred.join(held.select("doc_id", "lang"), "doc_id").select(
        "doc_id", "lang", "pred_lang", "llr_fp", "n_grams"
    )


# shared profile-build CTE chain (norm -> ... -> w): consumed by the
# t20 classification oracle AND the i5 incremental-fold oracle (which
# must equal the from-scratch weights this chain computes)
_T20_PROFILE_CTES = rf"""norm AS (
    SELECT doc_id, lang, trim(lower(text)) AS s
    FROM documents
    WHERE text IS NOT NULL
), ref AS (
    SELECT lang AS label, s FROM norm
    WHERE doc_id % {T20_REF_EVERY} = 0 AND lang IS NOT NULL
      AND len(s) >= {T20_NGRAM}
), refg AS (
    SELECT label,
           unnest(list_transform(range(1, len(s) - {T20_NGRAM - 2}),
                                 i -> s[i:i + {T20_NGRAM - 1}])) AS g
    FROM ref
), refb AS (
    SELECT label,
           CAST(('0x' || substring(md5(g), 1, 4)) AS BIGINT)
               % {T20_BUCKETS} AS bucket
    FROM refg
), cnt AS (
    SELECT label, bucket, CAST(COUNT(*) AS BIGINT) AS c
    FROM refb GROUP BY label, bucket
), stot AS (
    SELECT label, CAST(SUM(c) AS BIGINT) AS s_c FROM cnt GROUP BY label
), btot AS (
    SELECT bucket, CAST(SUM(c) AS BIGINT) AS c_all FROM cnt GROUP BY bucket
), tot AS (
    SELECT CAST(SUM(c) AS BIGINT) AS s_all FROM cnt
), grid AS (
    SELECT l.label, b.bucket
    FROM (SELECT DISTINCT label FROM cnt) l
    CROSS JOIN (SELECT unnest(range({T20_BUCKETS})) AS bucket) b
), w AS (
    SELECT g.label, g.bucket,
           CAST(FLOOR({T20_GRAIN} * LN(
               CAST((COALESCE(c.c, 0) + 1)
                    * (t.s_all + {T20_BUCKETS}) AS DOUBLE)
               / CAST((COALESCE(bt.c_all, 0) + 1)
                    * (st.s_c + {T20_BUCKETS}) AS DOUBLE)
           )) AS BIGINT) AS w_fp
    FROM grid g
    LEFT JOIN cnt c ON c.label = g.label AND c.bucket = g.bucket
    LEFT JOIN btot bt ON bt.bucket = g.bucket
    JOIN stot st ON st.label = g.label
    CROSS JOIN tot t
)"""

T20_SQL = rf"""
WITH {_T20_PROFILE_CTES}, held AS (
    SELECT doc_id, lang, s FROM norm
    WHERE doc_id % {T20_REF_EVERY} <> 0 AND len(s) >= {T20_NGRAM}
), hg AS (
    SELECT doc_id,
           unnest(list_transform(range(1, len(s) - {T20_NGRAM - 2}),
                                 i -> s[i:i + {T20_NGRAM - 1}])) AS g
    FROM held
), hb AS (
    SELECT doc_id,
           CAST(('0x' || substring(md5(g), 1, 4)) AS BIGINT)
               % {T20_BUCKETS} AS bucket
    FROM hg
), sc AS (
    SELECT doc_id, label,
           CAST(SUM(w_fp) AS BIGINT) AS llr_fp,
           CAST(COUNT(*) AS BIGINT) AS n_grams
    FROM hb JOIN w USING (bucket)
    GROUP BY doc_id, label
), ranked AS (
    SELECT doc_id, label, llr_fp, n_grams,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY llr_fp DESC, label ASC) AS rn
    FROM sc
)
SELECT h.doc_id, h.lang, r.label AS pred_lang, r.llr_fp, r.n_grams
FROM ranked r JOIN held h USING (doc_id)
WHERE r.rn = 1
"""


# ---------------------------------------------------------------------------
# I5 — incremental langid profile update: the i1-i4 ingest contract
# applied to the t20 model state. The persisted state is the SPARSE
# count frame (label, bucket, cnt) — counts are additive, so an
# arriving labeled batch folds in with one full-outer sum over
# <= 2 x K x 256 rows and the weight grid re-derives from counts in
# O(K x 256), never rescanning the reference corpus. The entry splits
# the t20 reference slice 80/20, folds the 20% delta into the 80%
# base counts, and must produce weights BIT-IDENTICAL to training
# from scratch on the union — which is exactly what the oracle
# computes (the shared t20 profile chain).
# ---------------------------------------------------------------------------


def i5_langid_profile_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.langid import (
        langid_count_frame,
        langid_counts_fold,
        langid_profiles_from_counts,
    )

    docs = load(spark, sf_dir, "documents")
    labeled = docs.filter(
        (F.col("doc_id") % T20_REF_EVERY == 0) & F.col("lang").isNotNull()
    )
    base_counts = langid_count_frame(
        labeled.filter(F.col("doc_id") % (5 * T20_REF_EVERY) != 0),
        label_col="lang",
        n=T20_NGRAM,
        n_buckets=T20_BUCKETS,
    )
    delta_counts = langid_count_frame(
        labeled.filter(F.col("doc_id") % (5 * T20_REF_EVERY) == 0),
        label_col="lang",
        n=T20_NGRAM,
        n_buckets=T20_BUCKETS,
    )
    return langid_profiles_from_counts(
        langid_counts_fold(base_counts, delta_counts, label_col="lang"),
        label_col="lang",
        n_buckets=T20_BUCKETS,
        grain=T20_GRAIN,
    )


I5_LANGID_SQL = rf"""
WITH {_T20_PROFILE_CTES}
SELECT g.label AS lang, g.bucket, g.w_fp
FROM w g
"""


# ---------------------------------------------------------------------------
# A11 — mergeable exact-grain histogram quantiles: single-pass
# distribution stats under the ingest contract (operators/sketches.py).
# a7's exact percentiles sort the corpus; the 100 TB answer is a
# mergeable sketch — a fixed-grain integer histogram whose state is
# O(value_range/grain) rows no matter the corpus, built with one
# map-combined groupBy and folded incrementally (counts are additive).
# Unlike t-digest/KLL the bucket answers are exact integers, so the
# operator stays under the DuckDB hash gate. I6 — the fold proof:
# 80/20 split histograms folded together must produce quantiles
# BIT-IDENTICAL to one pass over the full table — the oracle for both
# entries is the same from-scratch SQL.
# ---------------------------------------------------------------------------

A11_GRAIN_CENTS = 100_000  # $1,000 buckets over o_totalprice cents
A11_QS = (1, 5, 25, 50, 75, 90, 95, 99)


def _order_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # dollars -> integer cents: FLOOR(x*100 + 0.5) is the same IEEE
    # double op chain in both engines — exact for TPC-H price ranges
    return load(spark, sf_dir, "orders").select(
        F.col("o_orderkey"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )


def a11_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.sketches import (
        fixed_grain_histogram,
        histogram_quantiles,
    )

    hist = fixed_grain_histogram(
        _order_cents(spark, sf_dir), "cents", A11_GRAIN_CENTS
    )
    return histogram_quantiles(hist, A11_GRAIN_CENTS, A11_QS).select(
        "q", "target_rank", "bucket", F.col("lo").alias("lo_cents")
    )


def i6_histogram_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.sketches import (
        fixed_grain_histogram,
        histogram_fold,
        histogram_quantiles,
    )

    cents = _order_cents(spark, sf_dir)
    base = fixed_grain_histogram(
        cents.filter(F.col("o_orderkey") % 5 != 0), "cents", A11_GRAIN_CENTS
    )
    delta = fixed_grain_histogram(
        cents.filter(F.col("o_orderkey") % 5 == 0), "cents", A11_GRAIN_CENTS
    )
    return histogram_quantiles(
        histogram_fold(base, delta), A11_GRAIN_CENTS, A11_QS
    ).select("q", "target_rank", "bucket", F.col("lo").alias("lo_cents"))


# A12 — grouped histogram quantiles: the per-key form of a11 (the
# "p99 per tenant" production ask). Same sketch machinery with the
# group key threaded through: state is O(groups x buckets), the fold
# key is (group, bucket), and the cumulative window is PARTITIONED by
# group — it scales with group count instead of being the documented
# single global window. Grouped by o_orderpriority over the same
# cents/grain framing as a11; oracle mirrors with PARTITION BY.


def a12_grouped_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.sketches import (
        fixed_grain_histogram,
        histogram_quantiles,
    )

    cents = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    hist = fixed_grain_histogram(
        cents, "cents", A11_GRAIN_CENTS, group_cols=("priority",)
    )
    return histogram_quantiles(
        hist, A11_GRAIN_CENTS, A11_QS, group_cols=("priority",)
    ).select(
        "priority", "q", "target_rank", "bucket",
        F.col("lo").alias("lo_cents"),
    )


A12_SQL = rf"""
WITH c AS (
    SELECT o_orderpriority AS priority,
           CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
    FROM orders WHERE o_totalprice IS NOT NULL
), h AS (
    SELECT priority,
           CAST(FLOOR(CAST(cents AS DOUBLE) / {A11_GRAIN_CENTS}) AS BIGINT)
               AS bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM c GROUP BY 1, 2
), tot AS (
    SELECT priority, CAST(SUM(cnt) AS BIGINT) AS total
    FROM h GROUP BY priority
), cum AS (
    SELECT priority, bucket,
           CAST(SUM(cnt) OVER (PARTITION BY priority ORDER BY bucket)
                AS BIGINT) AS cum
    FROM h
), tq AS (
    SELECT priority, CAST(q AS BIGINT) AS q,
           CAST(FLOOR(CAST(q * total + 99 AS DOUBLE) / 100) AS BIGINT)
               AS target_rank
    FROM (SELECT UNNEST([{", ".join(str(q) for q in A11_QS)}]) AS q)
    CROSS JOIN tot
)
SELECT tq.priority, tq.q, tq.target_rank,
       CAST(MIN(c2.bucket) AS BIGINT) AS bucket,
       CAST(MIN(c2.bucket) * {A11_GRAIN_CENTS} AS BIGINT) AS lo_cents
FROM tq JOIN cum c2
  ON c2.priority = tq.priority AND c2.cum >= tq.target_rank
GROUP BY 1, 2, 3
"""


A11_SQL = rf"""
WITH c AS (
    SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
    FROM orders WHERE o_totalprice IS NOT NULL
), h AS (
    SELECT CAST(FLOOR(CAST(cents AS DOUBLE) / {A11_GRAIN_CENTS}) AS BIGINT)
               AS bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM c GROUP BY 1
), tot AS (
    SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM h
), cum AS (
    SELECT bucket,
           CAST(SUM(cnt) OVER (ORDER BY bucket) AS BIGINT) AS cum
    FROM h
), tq AS (
    SELECT CAST(q AS BIGINT) AS q,
           CAST(FLOOR(CAST(q * total + 99 AS DOUBLE) / 100) AS BIGINT)
               AS target_rank
    FROM (SELECT UNNEST([{", ".join(str(q) for q in A11_QS)}]) AS q)
    CROSS JOIN tot
)
SELECT tq.q, tq.target_rank,
       CAST(MIN(c2.bucket) AS BIGINT) AS bucket,
       CAST(MIN(c2.bucket) * {A11_GRAIN_CENTS} AS BIGINT) AS lo_cents
FROM tq JOIN cum c2 ON c2.cum >= tq.target_rank
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# A13 — KMV distinct sketch: single-pass mergeable distinct counts
# (operators/sketches.py kmv_*). a6-style exact COUNT(DISTINCT) shuffles
# every distinct value; the 100 TB answer is the k-minimum-values sketch
# — state is the k smallest 60-bit value hashes (<= k rows per group,
# corpus-size-independent), built with one pruned shuffle and folded
# incrementally (set union, idempotent). The estimator (k-1)*2^60/h_(k)
# is EXACT integer arithmetic both engines reproduce bit-identically
# (Spark DECIMAL div == DuckDB HUGEINT //), so the sketch sits under
# the hash gate; n_exact rides along to show accuracy (~1/sqrt(k-2)).
# I7 — the fold proof: 80/20 split sketches folded together must equal
# the from-scratch sketch STATE bit-for-bit (same oracle replays one
# pass over the union). Streaming face: KMVSink (s14).
# ---------------------------------------------------------------------------

A13_K = 128


def a13_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.sketches import (
        kmv_estimate,
        kmv_sketch,
    )

    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"), "o_custkey"
    )
    sketch = kmv_sketch(orders, "o_custkey", A13_K, group_cols=("priority",))
    est = kmv_estimate(sketch, A13_K, group_cols=("priority",))
    exact = (
        orders.filter(F.col("o_custkey").isNotNull())
        .groupBy("priority")
        .agg(F.countDistinct("o_custkey").cast("long").alias("n_exact"))
    )
    return est.join(F.broadcast(exact), "priority").select(
        "priority", "sketch_n", "kth_hash", "n_distinct_est", "n_exact"
    )


def i7_kmv_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.sketches import (
        kmv_fold,
        kmv_sketch,
    )

    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    base = kmv_sketch(
        orders.filter(F.col("o_orderkey") % 5 != 0), "o_custkey", A13_K
    )
    delta = kmv_sketch(
        orders.filter(F.col("o_orderkey") % 5 == 0), "o_custkey", A13_K
    )
    return kmv_fold(base, delta, A13_K).select("rank", "h")


A13_SQL = rf"""
WITH hv AS (
    SELECT o_orderpriority AS priority,
           CAST(('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 15))
                AS BIGINT) AS h
    FROM orders WHERE o_custkey IS NOT NULL
), d AS (
    SELECT DISTINCT priority, h FROM hv
), r AS (
    SELECT priority, h,
           ROW_NUMBER() OVER (PARTITION BY priority ORDER BY h) AS rnk
    FROM d
), s AS (
    SELECT priority,
           CAST(MAX(rnk) AS BIGINT) AS sketch_n,
           CAST(MAX(h) AS BIGINT) AS kth_hash
    FROM r WHERE rnk <= {A13_K} GROUP BY priority
), ex AS (
    SELECT o_orderpriority AS priority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact
    FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1
)
SELECT s.priority, s.sketch_n, s.kth_hash,
       CAST(CASE WHEN s.sketch_n < {A13_K} THEN s.sketch_n
                 ELSE ({A13_K - 1}::HUGEINT
                       * {1 << 60}::HUGEINT)
                      // GREATEST(s.kth_hash, 1)
            END AS BIGINT) AS n_distinct_est,
       ex.n_exact
FROM s JOIN ex USING (priority)
"""


I7_KMV_SQL = rf"""
WITH d AS (
    SELECT DISTINCT
           CAST(('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 15))
                AS BIGINT) AS h
    FROM orders WHERE o_custkey IS NOT NULL
), r AS (
    SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rnk FROM d
)
SELECT CAST(rnk AS BIGINT) AS "rank", h FROM r WHERE rnk <= {A13_K}
"""


# ---------------------------------------------------------------------------
# A14 — count-min heavy hitters: the frequency member of the mergeable
# sketch trio (a11 quantiles, a13 distinct, a14 frequencies;
# operators/sketches.py cms_*). Exact top-k term counting shuffles the
# whole vocabulary; the CMS grid is depth x width int64 counters no
# matter the corpus, folds additively, and answers point-frequency
# probes with min-over-rows — overestimates only, error <= 2N/width
# w.p. 1-(1/2)^depth. The entry counts whitespace tokens over
# documents (Zipfian — the sketch's home turf), takes the exact top
# 20 (deterministic ties on the term string), and probes the grid for
# each: n_cms >= n_exact is the CMS guarantee, visible per row. Salted
# md5 bucket hashes and integer mins keep both engines bit-identical.
# I8 — the fold proof: 80/20 doc split grids folded together must
# equal the from-scratch grid STATE bit-for-bit.
# ---------------------------------------------------------------------------

A14_CMS_WIDTH = 1024
A14_TOPK = 20


def _doc_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.text import tokens

    return (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(F.explode(tokens("text")).alias("term"))
    )


def a14_cms_heavy_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.sketches import (
        cms_estimate,
        cms_sketch,
    )

    from big_data_flight_analytics_spark.cache import once_checkpoint

    # ONE posting pass (r16): the old shape exploded the corpus for
    # the exact counts AND again for the CMS grid, and the tiny
    # exact-top frame's full-count lineage re-ran per consumer. The
    # per-term count frame (vocabulary-sized) is checkpointed once;
    # exact-top sorts it and the grid sketches it weighted — SUM of
    # per-term counts per cell == counting raw occurrences.
    terms = _doc_terms(spark, sf_dir)
    counts = once_checkpoint(
        terms.groupBy("term").agg(
            F.count(F.lit(1)).cast("long").alias("n_exact")
        )
    )
    exact_top = (
        counts.orderBy(F.col("n_exact").desc(), F.col("term").asc())
        .limit(A14_TOPK)
    )
    grid = cms_sketch(counts, "term", A14_CMS_WIDTH, weight_col="n_exact")
    est = cms_estimate(grid, exact_top, "term", A14_CMS_WIDTH)
    return est.join(F.broadcast(exact_top), "term").select(
        "term", "n_exact", "n_cms"
    )


def i8_cms_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.sketches import (
        cms_fold,
        cms_sketch,
    )

    docs = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    from big_data_flight_analytics_spark.operators.text import tokens

    def terms_of(side: DataFrame) -> DataFrame:
        return side.select(F.explode(tokens("text")).alias("term"))

    base = cms_sketch(
        terms_of(docs.filter(F.col("doc_id") % 5 != 0)), "term", A14_CMS_WIDTH
    )
    delta = cms_sketch(
        terms_of(docs.filter(F.col("doc_id") % 5 == 0)), "term", A14_CMS_WIDTH
    )
    return cms_fold(base, delta).select("row_j", "bucket", "cnt")


_A14_POSTING = r"""
    SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
    FROM documents WHERE text IS NOT NULL
"""

_A14_GRID = rf"""
    SELECT CAST(j.j AS BIGINT) AS row_j,
           CAST(('0x' || substring(md5(CAST(j.j AS VARCHAR) || ':' || p.term),
                                   1, 15)) AS BIGINT) % {A14_CMS_WIDTH}
               AS bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM posting p CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS j) j
    GROUP BY 1, 2
"""

A14_SQL = rf"""
WITH posting AS ({_A14_POSTING}),
exact AS (
    SELECT term, CAST(COUNT(*) AS BIGINT) AS n_exact
    FROM posting GROUP BY term
    ORDER BY n_exact DESC, term ASC LIMIT {A14_TOPK}
),
cms AS ({_A14_GRID}),
probes AS (
    SELECT e.term, e.n_exact, CAST(j.j AS BIGINT) AS row_j,
           CAST(('0x' || substring(md5(CAST(j.j AS VARCHAR) || ':' || e.term),
                                   1, 15)) AS BIGINT) % {A14_CMS_WIDTH}
               AS bucket
    FROM exact e CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS j) j
)
SELECT p.term, p.n_exact,
       CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS n_cms
FROM probes p LEFT JOIN cms c USING (row_j, bucket)
GROUP BY p.term, p.n_exact
"""

I8_CMS_SQL = rf"""
WITH posting AS ({_A14_POSTING})
{_A14_GRID}
"""


# ---------------------------------------------------------------------------
# T22 — content-defined chunking (operators/text.py cdc_chunks):
# boundaries fall after tokens whose md5 is 0 mod the divisor, so an
# insertion perturbs only its own chunk and every other chunk keeps
# its exact fingerprint — the property that makes chunk-level dedup
# survive near-duplicate documents with edits (Rabin/Gear CDC at
# token grain; t13's fixed-size chunks shift wholesale instead).
# D23 — chunk-level dedup over the t22 fingerprints: per document,
# how many of its chunks appear in at least one other document (an
# inverted-index join on chunk_fp, never all-pairs).
# ---------------------------------------------------------------------------

T22_DIVISOR = 8


def t22_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.text import cdc_chunks

    return cdc_chunks(
        load(spark, sf_dir, "documents"), divisor=T22_DIVISOR
    ).select("doc_id", "chunk_id", "n_tokens", "chunk_fp")


def d23_cdc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.text import cdc_chunks

    chunks = cdc_chunks(
        load(spark, sf_dir, "documents"), divisor=T22_DIVISOR
    )
    # Examined r16, kept as-is (measured): the chunk lineage IS
    # referenced twice (this aggregate + the join back), but both
    # rewrites that run it once measured SLOWER at sf0.1 min-of-3 —
    # eager checkpoint 1.52 -> 1.88 s (materialization barrier vs
    # overlapping branch stages), chunk_fp-window collect_set
    # 1.52 -> 4.19 s (WindowExec sort + per-partition set buffering).
    # The hash agg + broadcast-able join is the cheapest shape here.
    fp_docs = chunks.groupBy("chunk_fp").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs")
    )
    return (
        chunks.join(fp_docs, "chunk_fp")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_shared_chunks"),
        )
    )


_T22_CHUNKS = rf"""
t AS (
    SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS a
    FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
), toks AS (
    SELECT doc_id, UNNEST(range(0, len(a))) AS idx, UNNEST(a) AS tok
    FROM t
), b AS (
    SELECT doc_id, idx, tok,
           CASE WHEN CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT)
                     % {T22_DIVISOR} = 0
                THEN 1 ELSE 0 END AS is_b
    FROM toks
), c AS (
    SELECT doc_id, idx, tok,
           CAST(COALESCE(SUM(is_b) OVER (
               PARTITION BY doc_id ORDER BY idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS chunk_id
    FROM b
), g AS (
    SELECT doc_id, chunk_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           md5(string_agg(tok, ' ' ORDER BY idx)) AS chunk_fp
    FROM c GROUP BY 1, 2
)
"""

T22_SQL = rf"""
WITH {_T22_CHUNKS}
SELECT doc_id, chunk_id, n_tokens, chunk_fp FROM g
"""

D23_SQL = rf"""
WITH {_T22_CHUNKS},
fp AS (
    SELECT chunk_fp, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM g GROUP BY chunk_fp
)
SELECT g.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN fp.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_shared_chunks
FROM g JOIN fp USING (chunk_fp)
GROUP BY g.doc_id
"""


# ---------------------------------------------------------------------------
# A16 — quantile binning via the histogram sketch (the sketch->APPLY
# pattern, completing a11's lifecycle: build -> fold (i6) -> stream
# (s13) -> apply): quartile boundaries come off the O(buckets) sketch,
# pivot to ONE broadcast row, and every order bins map-side with three
# integer comparisons — no sort, no second shuffle over the corpus.
# This is the feature-engineering shape (Spark ML's QuantileDiscretizer
# fit/transform) expressed as two declarative passes whose arithmetic
# both engines replay bit-exactly. Output: bin populations per order
# priority (bin = # of quartile lower-bounds <= value, 0..3).
# ---------------------------------------------------------------------------


def a16_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.sketches import (
        fixed_grain_histogram,
        histogram_quantiles,
    )

    cents = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice").isNotNull())
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
        )
    )
    hist = fixed_grain_histogram(cents, "cents", A11_GRAIN_CENTS)
    bounds = (
        histogram_quantiles(hist, A11_GRAIN_CENTS, (25, 50, 75))
        .groupBy()
        .pivot("q", [25, 50, 75])
        .agg(F.first("lo"))
        .select(
            F.col("25").alias("q25_lo"),
            F.col("50").alias("q50_lo"),
            F.col("75").alias("q75_lo"),
        )
    )
    binned = cents.crossJoin(F.broadcast(bounds)).select(
        "priority",
        (
            (F.col("cents") >= F.col("q25_lo")).cast("long")
            + (F.col("cents") >= F.col("q50_lo")).cast("long")
            + (F.col("cents") >= F.col("q75_lo")).cast("long")
        ).alias("bin"),
    )
    return binned.groupBy("priority", "bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )


A16_SQL = rf"""
WITH c AS (
    SELECT o_orderpriority AS priority,
           CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
    FROM orders WHERE o_totalprice IS NOT NULL
), h AS (
    SELECT CAST(FLOOR(CAST(cents AS DOUBLE) / {A11_GRAIN_CENTS}) AS BIGINT)
               AS bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM c GROUP BY 1
), tot AS (
    SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM h
), cum AS (
    SELECT bucket,
           CAST(SUM(cnt) OVER (ORDER BY bucket) AS BIGINT) AS cum
    FROM h
), tq AS (
    SELECT CAST(q AS BIGINT) AS q,
           CAST(FLOOR(CAST(q * total + 99 AS DOUBLE) / 100) AS BIGINT)
               AS target_rank
    FROM (SELECT UNNEST([25, 50, 75]) AS q) CROSS JOIN tot
), qb AS (
    SELECT tq.q,
           CAST(MIN(c2.bucket) * {A11_GRAIN_CENTS} AS BIGINT) AS lo
    FROM tq JOIN cum c2 ON c2.cum >= tq.target_rank
    GROUP BY tq.q
), bounds AS (
    SELECT MIN(CASE WHEN q = 25 THEN lo END) AS q25_lo,
           MIN(CASE WHEN q = 50 THEN lo END) AS q50_lo,
           MIN(CASE WHEN q = 75 THEN lo END) AS q75_lo
    FROM qb
)
SELECT c.priority,
       CAST((CASE WHEN c.cents >= b.q25_lo THEN 1 ELSE 0 END)
          + (CASE WHEN c.cents >= b.q50_lo THEN 1 ELSE 0 END)
          + (CASE WHEN c.cents >= b.q75_lo THEN 1 ELSE 0 END)
            AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM c CROSS JOIN bounds b
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# J12 — fuzzy blocked match (operators/joins.py fuzzy_blocked_join):
# the entity-resolution shape — equi-join on the stable attributes two
# records of one entity agree on (blocking), verify the dirty field
# with Levenshtein (matching). A second "dirty catalog" is derived
# deterministically from part names (word 2 vowel-stripped — a typo
# generator both engines replay); blocking on the four clean words
# keeps the fuzzy comparison inside blocks, and the edit distance is
# the textbook unit-cost DP in both engines, so every pair's ``lev``
# hashes bit-exactly. ``matched`` flags the <= 4 recoveries — colors
# with 5+ vowels honestly exceed the bound and stay visible as misses.
# ---------------------------------------------------------------------------

J12_MAX_DIST = 2


def j12_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.joins import (
        fuzzy_blocked_join,
    )

    w = F.split(F.col("p_name"), " ")
    counts = (
        load(spark, sf_dir, "part")
        .select(
            F.element_at(w, 1).alias("adj"),
            F.element_at(w, 2).alias("noun"),
        )
        .groupBy("adj", "noun")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )
    dirty = (
        counts.select(
            F.regexp_replace(F.col("adj"), "[aeiou]", "").alias("adj_dirty"),
            "noun",
            "n_rows",
        )
        .groupBy("adj_dirty", "noun")
        .agg(F.sum("n_rows").cast("long").alias("n_rows"))
    )
    clean = counts.select(F.col("adj").alias("adj_clean"), "noun").distinct()
    pairs = fuzzy_blocked_join(
        dirty, clean, ["noun"], "adj_dirty", "adj_clean"
    )
    return pairs.select(
        "noun",
        "adj_dirty",
        "adj_clean",
        F.col("lev").cast("long").alias("lev"),
        (F.col("lev") <= J12_MAX_DIST).alias("matched"),
        "n_rows",
    )


J12_SQL = rf"""
WITH named AS (
    SELECT string_split(p_name, ' ')[1] AS adj,
           string_split(p_name, ' ')[2] AS noun
    FROM part
), counts AS (
    SELECT adj, noun, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM named GROUP BY 1, 2
), dirty AS (
    SELECT regexp_replace(adj, '[aeiou]', '', 'g') AS adj_dirty, noun,
           CAST(SUM(n_rows) AS BIGINT) AS n_rows
    FROM counts GROUP BY 1, 2
), clean AS (
    SELECT DISTINCT adj AS adj_clean, noun FROM counts
)
SELECT d.noun, d.adj_dirty, c.adj_clean,
       CAST(levenshtein(d.adj_dirty, c.adj_clean) AS BIGINT) AS lev,
       levenshtein(d.adj_dirty, c.adj_clean) <= {J12_MAX_DIST} AS matched,
       d.n_rows
FROM dirty d JOIN clean c USING (noun)
"""


# ---------------------------------------------------------------------------
# A15 — KMV set-operation estimates (operators/sketches.py
# kmv_set_overlap): the Theta-sketch use case. Two corpora's key sets
# are sketched independently (never co-shuffled); union cardinality
# comes from the folded sketch and intersection from the fraction of
# union-sample hashes present in BOTH sketches — |A∩B| ~= n_both *
# |A∪B| / k in the same exact DECIMAL-div arithmetic as a13. The
# entry overlaps URGENT-order customers with HIGH-order customers and
# carries the exact figures alongside (cheap at test scale; at 100 TB
# you would skip them — that is the point of the sketch).
# ---------------------------------------------------------------------------


def a15_sketch_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.sketches import (
        kmv_set_overlap,
        kmv_sketch,
    )

    orders = load(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_custkey"
    )
    side_a = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    side_b = orders.filter(F.col("o_orderpriority") == "2-HIGH")
    ov = kmv_set_overlap(
        kmv_sketch(side_a, "o_custkey", A13_K),
        kmv_sketch(side_b, "o_custkey", A13_K),
        A13_K,
    )
    au = side_a.filter(F.col("o_custkey").isNotNull()).select(
        "o_custkey"
    ).distinct()
    bu = side_b.filter(F.col("o_custkey").isNotNull()).select(
        "o_custkey"
    ).distinct()
    exact = au.unionByName(bu).distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_exact_union")
    ).crossJoin(
        au.join(bu, "o_custkey").agg(
            F.count(F.lit(1)).cast("long").alias("n_exact_intersect")
        )
    )
    return ov.crossJoin(F.broadcast(exact))


_A15_SIDE = r"""
    SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rnk
    FROM (
        SELECT DISTINCT
               CAST(('0x' || substring(md5(CAST(o_custkey AS VARCHAR)),
                                       1, 15)) AS BIGINT) AS h
        FROM orders
        WHERE o_orderpriority = '{prio}' AND o_custkey IS NOT NULL
    )
"""

A15_SQL = rf"""
WITH ra AS ({_A15_SIDE.format(prio="1-URGENT")}),
sa AS (SELECT h FROM ra WHERE rnk <= {A13_K}),
rb AS ({_A15_SIDE.format(prio="2-HIGH")}),
sb AS (SELECT h FROM rb WHERE rnk <= {A13_K}),
ru AS (
    SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rnk
    FROM (SELECT h FROM sa UNION SELECT h FROM sb)
), un AS (SELECT h, rnk FROM ru WHERE rnk <= {A13_K}),
agg AS (
    SELECT CAST(COALESCE(MAX(un.rnk), 0) AS BIGINT) AS sketch_n,
           CAST(MAX(un.h) AS BIGINT) AS kth_hash,
           CAST(SUM(CASE WHEN sa.h IS NOT NULL AND sb.h IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_both
    FROM un LEFT JOIN sa ON sa.h = un.h LEFT JOIN sb ON sb.h = un.h
), est AS (
    SELECT sketch_n, kth_hash, n_both,
           CAST(CASE WHEN sketch_n < {A13_K} THEN sketch_n
                     ELSE ({A13_K - 1}::HUGEINT * {1 << 60}::HUGEINT)
                          // GREATEST(kth_hash, 1)
                END AS BIGINT) AS n_union_est
    FROM agg
), ex AS (
    SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_exact_union
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_custkey IS NOT NULL
), ix AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_intersect
    FROM (SELECT DISTINCT o_custkey FROM orders
          WHERE o_orderpriority = '1-URGENT' AND o_custkey IS NOT NULL)
    JOIN (SELECT DISTINCT o_custkey AS c2 FROM orders
          WHERE o_orderpriority = '2-HIGH' AND o_custkey IS NOT NULL)
      ON o_custkey = c2
)
SELECT est.sketch_n, est.kth_hash, est.n_union_est, est.n_both,
       CAST((est.n_both::HUGEINT * est.n_union_est::HUGEINT)
            // GREATEST(est.sketch_n, 1) AS BIGINT) AS n_intersect_est,
       ex.n_exact_union, ix.n_exact_intersect
FROM est CROSS JOIN ex CROSS JOIN ix
"""


# ---------------------------------------------------------------------------
# A17 — grouped count-min sketch: the per-key form of a14 (the
# "per-tenant frequency sketch" production ask), mirroring what a12
# does for the histogram family. State is O(sources x depth x width),
# the fold key is (source, row_j, bucket), and probes join on the
# composite key. Exact top-5 terms PER SOURCE (window partitioned by
# source — scales with sources) probed against the grouped grid.
# ---------------------------------------------------------------------------

A17_TOPK = 5


def a17_grouped_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.sketches import (
        cms_estimate,
        cms_sketch,
    )
    from big_data_flight_analytics_spark.operators.text import tokens
    from pyspark.sql import Window

    from big_data_flight_analytics_spark.cache import once_checkpoint

    terms = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("source", F.explode(tokens("text")).alias("term"))
    )
    # ONE posting pass (r16, the a14 rework): per-(source, term)
    # counts checkpointed; top-k ranks them and the grouped grid
    # sketches them weighted (SUM of counts per cell == counting raw
    # occurrences).
    counts = once_checkpoint(
        terms.groupBy("source", "term").agg(
            F.count(F.lit(1)).cast("long").alias("n_exact")
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.col("n_exact").desc(), F.col("term").asc()
    )
    topk = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= A17_TOPK)
        .drop("rn")
    )
    grid = cms_sketch(
        counts, "term", A14_CMS_WIDTH,
        group_cols=("source",), weight_col="n_exact",
    )
    est = cms_estimate(
        grid, topk, "term", A14_CMS_WIDTH, group_cols=("source",)
    )
    return est.join(F.broadcast(topk), ["source", "term"]).select(
        "source", "term", "n_exact", "n_cms"
    )


_A17_POSTING = r"""
    SELECT source,
           unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
    FROM documents WHERE text IS NOT NULL
"""

A17_SQL = rf"""
WITH posting AS ({_A17_POSTING}),
counts AS (
    SELECT source, term, CAST(COUNT(*) AS BIGINT) AS n_exact
    FROM posting GROUP BY 1, 2
), topk AS (
    SELECT source, term, n_exact
    FROM (
        SELECT source, term, n_exact,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY n_exact DESC, term ASC) AS rn
        FROM counts
    ) WHERE rn <= {A17_TOPK}
), cms AS (
    SELECT p.source, CAST(j.j AS BIGINT) AS row_j,
           CAST(('0x' || substring(md5(CAST(j.j AS VARCHAR) || ':' || p.term),
                                   1, 15)) AS BIGINT) % {A14_CMS_WIDTH}
               AS bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM posting p CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS j) j
    GROUP BY 1, 2, 3
), probes AS (
    SELECT t.source, t.term, t.n_exact, CAST(j.j AS BIGINT) AS row_j,
           CAST(('0x' || substring(md5(CAST(j.j AS VARCHAR) || ':' || t.term),
                                   1, 15)) AS BIGINT) % {A14_CMS_WIDTH}
               AS bucket
    FROM topk t CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS j) j
)
SELECT p.source, p.term, p.n_exact,
       CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS n_cms
FROM probes p
LEFT JOIN cms c
  ON c.source = p.source AND c.row_j = p.row_j AND c.bucket = p.bucket
GROUP BY p.source, p.term, p.n_exact
"""


# ---------------------------------------------------------------------------
# A18 — sketch-based join-size estimation (the count-min inner
# product, AGMS lineage): |A join B on k| = sum_k f_A(k) * f_B(k),
# estimated as min over the depth rows of the bucketwise product of
# the two sides' CMS grids — an OVERESTIMATE only (collisions add
# cross terms), computable from two fixed-size sketches without
# touching either corpus again. This is the query-optimizer
# primitive: join reordering and skew decisions need the size BEFORE
# running the join. The entry estimates the many-to-many
# events.user_id x orders.o_custkey join and carries the exact size
# alongside (the demonstration baseline; at 100 TB you would not run
# it — that is the point). All integer arithmetic, bit-exact in both
# engines.
# ---------------------------------------------------------------------------


A18_WIDTH = 8192  # expected cross-term error |A|*|B|/width — width is
# the accuracy lever and the grid stays 3 x 8192 int64s regardless of
# corpus (e.g. sf0.01: exact 95,614 vs estimate ~113k at 8192 — the
# visible gap IS the documented overestimate bound)


def a18_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.sketches import (
        cms_sketch,
    )

    ev = load(spark, sf_dir, "events").select(
        F.col("user_id").alias("k")
    )
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k")
    )
    ge = cms_sketch(ev, "k", A18_WIDTH).select(
        "row_j", "bucket", F.col("cnt").alias("cnt_a")
    )
    go = cms_sketch(orders, "k", A18_WIDTH).select(
        "row_j", "bucket", F.col("cnt").alias("cnt_b")
    )
    per_row = (
        ge.join(go, ["row_j", "bucket"])
        .groupBy("row_j")
        .agg(
            F.sum(F.col("cnt_a") * F.col("cnt_b"))
            .cast("long")
            .alias("row_est")
        )
    )
    est = per_row.agg(F.min("row_est").cast("long").alias("n_cms_est"))
    exact = ev.join(orders, "k").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact")
    )
    return est.crossJoin(F.broadcast(exact))


A18_SQL = rf"""
WITH ev AS (
    SELECT user_id AS k FROM events WHERE user_id IS NOT NULL
), ords AS (
    SELECT o_custkey AS k FROM orders WHERE o_custkey IS NOT NULL
), j AS (SELECT UNNEST([0, 1, 2]) AS j),
ge AS (
    SELECT CAST(j.j AS BIGINT) AS row_j,
           CAST(('0x' || substring(md5(CAST(j.j AS VARCHAR) || ':'
                                       || CAST(k AS VARCHAR)), 1, 15))
                AS BIGINT) % {A18_WIDTH} AS bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt_a
    FROM ev CROSS JOIN j GROUP BY 1, 2
), go AS (
    SELECT CAST(j.j AS BIGINT) AS row_j,
           CAST(('0x' || substring(md5(CAST(j.j AS VARCHAR) || ':'
                                       || CAST(k AS VARCHAR)), 1, 15))
                AS BIGINT) % {A18_WIDTH} AS bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt_b
    FROM ords CROSS JOIN j GROUP BY 1, 2
), per_row AS (
    SELECT ge.row_j, CAST(SUM(ge.cnt_a * go.cnt_b) AS BIGINT) AS row_est
    FROM ge JOIN go USING (row_j, bucket)
    GROUP BY ge.row_j
), est AS (
    SELECT CAST(MIN(row_est) AS BIGINT) AS n_cms_est FROM per_row
), ex AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_exact
    FROM ev JOIN ords USING (k)
)
SELECT est.n_cms_est, ex.n_exact FROM est CROSS JOIN ex
"""


# ---------------------------------------------------------------------------
# J11 — Bloom-filter semi join (operators/joins.py bloom_semi_join):
# the pre-shuffle fact filter for key sets too big to broadcast raw.
# Urgent orders' keys become a fixed m-bit bitset (packed 32 bits per
# int64 word — <= m/32 rows however many keys); lineitem probes it
# with two map-side broadcast joins + bit tests and only the
# survivors reach the exact join that removes false positives. The
# entry reports, per returnflag, how many rows the bloom passed vs
# truly matched — n_false_positives is the measured fp cost, and
# n_bloom_candidates >= n_true_matches is the no-false-negative
# guarantee, visible per row. Salted md5 positions and integer bit
# ops replay bit-identically in DuckDB.
# ---------------------------------------------------------------------------

J11_BLOOM_BITS = 1 << 17


def j11_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.joins import (
        bloom_semi_join,
    )

    urgent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    cand = bloom_semi_join(
        li, "l_orderkey", urgent, "o_orderkey", J11_BLOOM_BITS
    )
    flagged = cand.join(
        urgent.withColumnRenamed("o_orderkey", "l_orderkey")
        .distinct()
        .withColumn("__hit", F.lit(1)),
        "l_orderkey",
        "left",
    )
    return flagged.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n_bloom_candidates"),
        F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
        .cast("long")
        .alias("n_true_matches"),
        F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_false_positives"),
    )


J11_SQL = rf"""
WITH urgent AS (
    SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
), pos AS (
    SELECT CAST(('0x' || substring(
               md5(CAST(j.j AS VARCHAR) || ':'
                   || CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT)
               % {J11_BLOOM_BITS} AS p
    FROM urgent CROSS JOIN (SELECT UNNEST([0, 1]) AS j) j
), words AS (
    SELECT p // 32 AS word_idx,
           bit_or(1::BIGINT << CAST(p % 32 AS INTEGER)) AS word
    FROM pos GROUP BY 1
), probe AS (
    SELECT l_orderkey, l_returnflag,
           CAST(('0x' || substring(md5('0:' || CAST(l_orderkey AS VARCHAR)),
                                   1, 15)) AS BIGINT)
               % {J11_BLOOM_BITS} AS p0,
           CAST(('0x' || substring(md5('1:' || CAST(l_orderkey AS VARCHAR)),
                                   1, 15)) AS BIGINT)
               % {J11_BLOOM_BITS} AS p1
    FROM lineitem
), cand AS (
    SELECT pr.l_orderkey, pr.l_returnflag
    FROM probe pr
    JOIN words w0 ON w0.word_idx = pr.p0 // 32
                 AND ((w0.word >> CAST(pr.p0 % 32 AS INTEGER)) & 1) = 1
    JOIN words w1 ON w1.word_idx = pr.p1 // 32
                 AND ((w1.word >> CAST(pr.p1 % 32 AS INTEGER)) & 1) = 1
), hits AS (
    SELECT DISTINCT o_orderkey FROM urgent
)
SELECT c.l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_bloom_candidates,
       CAST(SUM(CASE WHEN h.o_orderkey IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_true_matches,
       CAST(SUM(CASE WHEN h.o_orderkey IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_positives
FROM cand c LEFT JOIN hits h ON h.o_orderkey = c.l_orderkey
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# J13 — ADVISED semi join: a18's CMS join-size estimate made
# actionable (operators/joins.py planned_semi_join). The advisor
# gathers (n_keys, CMS-estimated matching fact rows, n_fact) and picks
# broadcast / bloom_semi_join / shuffle against the documented
# thresholds; the k2-style skewed fixture (~80% of lineitem collapses
# onto ONE hot part key that is NOT in the key set) is exactly the
# shape where the bloom pre-filter wins — the hot rows are shed
# map-side before any shuffle. BROADCAST_MAX here is scaled down so
# the key side (400 keys at sf0.01) exceeds it — the real bound is
# executor memory; what the entry demonstrates is the decision rule
# and the chosen plan (PLANS.md shows the word-table probes). The
# RESULT is strategy-invariant (bloom false positives die in the
# exact join), so the oracle is the plain semi join + GROUP BY and
# holds at every scale even where the advisor picks a different
# regime (sf0.001's 40 keys broadcast; sf0.01/sf0.1 go bloom).
# ---------------------------------------------------------------------------

J13_BROADCAST_MAX = 100
J13_CMS_WIDTH = 1 << 16  # a18 error ~ |A|*|B|/width: sized so the
# sf0.1 estimate (600k x 4k keys -> ~+36k overcount) stays decisive
J13_MOD = 5  # same hot-key fixture as k2 (relational_queries.K2_MOD)
J13_HOT_KEY = 1


def j13_advised_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.joins import (
        planned_semi_join,
    )

    li = load(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_partkey") % J13_MOD != 0, F.lit(J13_HOT_KEY))
        .otherwise(F.col("l_partkey"))
        .cast("long")
        .alias("p_key"),
        "l_quantity",
    )
    keys = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_partkey") % J13_MOD == 0)
        .select(F.col("p_partkey").cast("long").alias("p_key"))
    )
    survivors, _strategy = planned_semi_join(
        li,
        "p_key",
        keys,
        "p_key",
        width=J13_CMS_WIDTH,
        broadcast_max_rows=J13_BROADCAST_MAX,
    )
    return survivors.groupBy(
        (F.col("p_key") % 100).alias("key_mod")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
    )


J13_SQL = f"""
WITH li AS (
    SELECT CASE WHEN l_partkey % {J13_MOD} <> 0 THEN {J13_HOT_KEY}
                ELSE l_partkey END AS p_key,
           l_quantity
    FROM lineitem
), keys AS (
    SELECT DISTINCT p_partkey AS p_key FROM part
    WHERE p_partkey % {J13_MOD} = 0
)
SELECT p_key % 100 AS key_mod,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       ROUND(SUM(l_quantity), 2) AS total_qty
FROM li JOIN keys USING (p_key)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# J15/J16 — the radius join's SCALE-SAFE reporting shapes (judge ask
# r14 #4). j7 materializes every (point, site) pair in radius — the
# 10x checkpoint showed its ANSWER growing 99.9x under verbatim
# duplication, an anti-shape for a reporting surface at 100 TB. These
# siblings keep the same join but bound the output by construction:
# J15 aggregates to per-site distinct-point counts (O(sites) rows —
# the reference's actual downstream,
# AirportAircraftCountStream.java:62-75), J16 ranks to the k nearest
# sites per point (O(points*k) rows). Same synthesized coordinate
# fixture as j7; J15 exercises the latitude-BANDED equi-join path
# (j7 covers broadcast; result equivalence of the two paths is also
# unit-pinned in tests/test_geo.py).
# ---------------------------------------------------------------------------

J16_K = 3


def _geo_frames(spark: SparkSession, sf_dir: str):
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    points = customer.select(
        F.col("c_custkey").alias("custkey"),
        (((F.col("c_custkey") * 7) % 141) - 70.0).alias("latitude"),
        (((F.col("c_custkey") * 13) % 361) - 180.0).alias("longitude"),
    )
    sites = supplier.select(
        F.col("s_suppkey").alias("suppkey"),
        (((F.col("s_suppkey") * 37) % 141) - 70.0).alias("site_latitude"),
        (((F.col("s_suppkey") * 91) % 361) - 180.0).alias("site_longitude"),
    )
    return points, sites


def j15_geo_radius_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.geo import (
        radius_site_counts,
    )
    from big_data_flight_analytics_spark.plans.relational_queries import (
        GEO_RADIUS_KM,
    )

    points, sites = _geo_frames(spark, sf_dir)
    return radius_site_counts(
        points,
        sites,
        point_id="custkey",
        site_id="suppkey",
        radius_km=GEO_RADIUS_KM,
        use_banding=True,
    )


def j16_geo_nearest_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.geo import (
        radius_nearest_k,
    )
    from big_data_flight_analytics_spark.plans.relational_queries import (
        GEO_RADIUS_KM,
    )

    points, sites = _geo_frames(spark, sf_dir)
    out = radius_nearest_k(
        points,
        sites,
        point_id="custkey",
        site_id="suppkey",
        k=J16_K,
        radius_km=GEO_RADIUS_KM,
        use_banding=False,
    )
    return out.select(
        "custkey",
        "suppkey",
        F.round(F.col("distance_km"), 3).alias("dist_km"),
        "rank",
    )


_GEO_PAIRS_SQL = """
WITH points AS (
    SELECT c_custkey AS custkey,
           ((c_custkey * 7) % 141) - 70.0 AS plat,
           ((c_custkey * 13) % 361) - 180.0 AS plon
    FROM customer
), sites AS (
    SELECT s_suppkey AS suppkey,
           ((s_suppkey * 37) % 141) - 70.0 AS slat,
           ((s_suppkey * 91) % 361) - 180.0 AS slon
    FROM supplier
), pairs AS (
    SELECT custkey, suppkey,
           2 * 6371.0 * atan2(
               sqrt(
                   sin(radians(slat - plat) / 2) * sin(radians(slat - plat) / 2)
                   + cos(radians(plat)) * cos(radians(slat))
                     * sin(radians(slon - plon) / 2) * sin(radians(slon - plon) / 2)
               ),
               sqrt(greatest(1 - (
                   sin(radians(slat - plat) / 2) * sin(radians(slat - plat) / 2)
                   + cos(radians(plat)) * cos(radians(slat))
                     * sin(radians(slon - plon) / 2) * sin(radians(slon - plon) / 2)
               ), 0))
           ) AS d
    FROM points CROSS JOIN sites
)
"""

def _j15_sql() -> str:
    from big_data_flight_analytics_spark.plans.relational_queries import (
        GEO_RADIUS_KM,
    )

    return (
        _GEO_PAIRS_SQL
        + f"""
SELECT suppkey,
       CAST(COUNT(DISTINCT custkey) AS BIGINT) AS n_points
FROM pairs WHERE d <= {GEO_RADIUS_KM}
GROUP BY 1
"""
    )


def _j16_sql() -> str:
    from big_data_flight_analytics_spark.plans.relational_queries import (
        GEO_RADIUS_KM,
    )

    return (
        _GEO_PAIRS_SQL
        + f"""
, ranked AS (
    SELECT custkey, suppkey, d,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY custkey ORDER BY d, suppkey
           ) AS BIGINT) AS rank
    FROM pairs WHERE d <= {GEO_RADIUS_KM}
)
SELECT custkey, suppkey, ROUND(d, 3) AS dist_km, rank
FROM ranked WHERE rank <= {J16_K}
"""
    )


J15_SQL = _j15_sql()
J16_SQL = _j16_sql()


# ---------------------------------------------------------------------------
# I14 — incremental geo counts: j15's per-site distinct-point counts
# maintained under ingest via the IDEMPOTENT pair-set fold
# (operators/geo.radius_pairs_state/_fold — the state store the
# reference's speed layer keeps per airport). The entry splits points
# into a 80% base and 20% arrival batch, folds the two pair states,
# and derives counts; the oracle restates j15's from-scratch counts
# over ALL points — the delta path must be invisible (the i1
# contract). Fold class: idempotent (union+distinct), so the s21
# streaming face needs no batch marker and replays are algebraic
# no-ops.
# ---------------------------------------------------------------------------


def i14_geo_count_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.geo import (
        radius_counts_from_state,
        radius_pairs_fold,
        radius_pairs_state,
    )
    from big_data_flight_analytics_spark.plans.relational_queries import (
        GEO_RADIUS_KM,
    )

    points, sites = _geo_frames(spark, sf_dir)
    base = points.filter(F.col("custkey") % 5 != 0)
    delta = points.filter(F.col("custkey") % 5 == 0)
    kw = dict(
        point_id="custkey",
        site_id="suppkey",
        radius_km=GEO_RADIUS_KM,
        use_banding=True,
    )
    folded = radius_pairs_fold(
        radius_pairs_state(base, sites, **kw),
        radius_pairs_state(delta, sites, **kw),
    )
    return radius_counts_from_state(folded, "suppkey", "custkey")


I14_SQL = J15_SQL


# ---------------------------------------------------------------------------
# D6 — dedup clustering: connected components over the D2 near-dup pair
# graph. Pairs -> transitive clusters -> canonical doc per cluster; the
# last stage of a dedup pipeline. Oracle: recursive CTE reachability
# (min reachable id == component min, identical to the Spark fixpoint).
# ---------------------------------------------------------------------------


def d6_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _jaccard_clusters(spark, sf_dir)


D6_SQL = rf"""
WITH RECURSIVE pairs AS (
    {D2_SQL}
), edges AS (
    SELECT doc_a AS s, doc_b AS d FROM pairs
    UNION ALL
    SELECT doc_b AS s, doc_a AS d FROM pairs
), reach(id, lbl) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.id
)
SELECT id AS doc_id,
       MIN(lbl) AS cluster_id,
       (id = MIN(lbl)) AS is_canonical
FROM reach GROUP BY id
"""


# ---------------------------------------------------------------------------
# T23 — leakage-safe train/val split: the t2 hash split keyed by the
# d6 near-dup CLUSTER instead of the document, so every member of a
# near-dup cluster lands on the same side — the split-leakage guard
# (a val doc whose near-duplicate sits in train silently inflates
# eval scores; doc-keyed splits cannot prevent it). ``naive_split``
# (the doc-keyed rule) rides along with ``naive_crosses`` flagging
# exactly the docs the naive rule would have separated from their
# cluster's side — the measured leak surface. Scale shape: the d6
# cluster stage dominates (shared via stage()); the split itself is
# map-only column math.
# ---------------------------------------------------------------------------

T23_TRAIN_PCT = 90


def t23_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    clusters = _jaccard_clusters(spark, sf_dir)

    def bucket(col):
        return (
            F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10)
            .cast("long")
            % 100
        )

    def side(col):
        return F.when(
            bucket(col) < T23_TRAIN_PCT, F.lit("train")
        ).otherwise(F.lit("val"))

    return clusters.select(
        "doc_id",
        "cluster_id",
        side(F.col("cluster_id")).alias("split"),
        side(F.col("doc_id")).alias("naive_split"),
    ).withColumn(
        "naive_crosses", F.col("naive_split") != F.col("split")
    )


T23_SQL = rf"""
WITH RECURSIVE pairs AS (
    {D2_SQL}
), edges AS (
    SELECT doc_a AS s, doc_b AS d FROM pairs
    UNION ALL
    SELECT doc_b AS s, doc_a AS d FROM pairs
), reach(id, lbl) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.id
), clusters AS (
    SELECT id AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY id
), sides AS (
    SELECT doc_id, cluster_id,
           CASE WHEN CAST(('0x' || substring(
                    md5(CAST(cluster_id AS VARCHAR)), 1, 4)) AS BIGINT)
                    % 100 < {T23_TRAIN_PCT}
                THEN 'train' ELSE 'val' END AS split,
           CASE WHEN CAST(('0x' || substring(
                    md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT)
                    % 100 < {T23_TRAIN_PCT}
                THEN 'train' ELSE 'val' END AS naive_split
    FROM clusters
)
SELECT doc_id, cluster_id, split, naive_split,
       naive_split <> split AS naive_crosses
FROM sides
"""


# ---------------------------------------------------------------------------
# D8 — end-to-end corpus curation: the composition a training-data
# pipeline actually materializes. Near-dup clusters (D6) pick one
# canonical doc per cluster; quality gates (T1 heuristics) drop short /
# low-quality docs; the output carries language id, token count,
# quality, and how many near-dups the surviving doc represents.
# Scale shape: the pair pipeline dominates; everything added here is
# one doc-keyed aggregate (cluster sizes), one doc-keyed join, and
# map-only column math.
# ---------------------------------------------------------------------------

D8_MIN_TOKENS = 25
D8_MIN_QUALITY = 0.6


def d8_curated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    clusters = _jaccard_clusters(spark, sf_dir)
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("int").alias("cluster_size")
    )
    canon = (
        clusters.filter(F.col("is_canonical"))
        .join(sizes, "cluster_id")
        .select("doc_id", "cluster_size")
    )
    stats = text_stats(docs).select("doc_id", "lang_pred", "n_tokens", "quality")
    return (
        stats.join(canon, "doc_id")
        .filter(
            (F.col("n_tokens") >= D8_MIN_TOKENS)
            & (F.col("quality") >= D8_MIN_QUALITY)
        )
        .select("doc_id", "lang_pred", "n_tokens", "quality", "cluster_size")
    )


D8_SQL = rf"""
WITH RECURSIVE pairs AS (
    {D2_SQL}
), edges AS (
    SELECT doc_a AS s, doc_b AS d FROM pairs
    UNION ALL
    SELECT doc_b AS s, doc_a AS d FROM pairs
), reach(id, lbl) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.id
), clusters AS (
    SELECT id AS doc_id,
           MIN(lbl) AS cluster_id,
           (id = MIN(lbl)) AS is_canonical
    FROM reach GROUP BY id
), sizes AS (
    SELECT cluster_id, CAST(COUNT(*) AS INTEGER) AS cluster_size
    FROM clusters GROUP BY cluster_id
), base AS (
    SELECT doc_id, text,
           length(text) AS n_chars_calc,
           CASE WHEN text IS NULL OR trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
           len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
           len(regexp_extract_all(lower(text),
               '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS n_stop
    FROM documents
), ratios AS (
    SELECT *,
           CASE WHEN n_chars_calc IS NULL OR n_chars_calc = 0 THEN 0.0
                ELSE ROUND(n_punct * 1.0 / n_chars_calc, 6) END AS punct_ratio,
           CASE WHEN n_tokens = 0 THEN 0.0
                ELSE ROUND(n_stop * 1.0 / n_tokens, 6) END AS stopword_ratio
    FROM base
), stats AS (
    SELECT doc_id,
           CAST(n_tokens AS INTEGER) AS n_tokens,
           ROUND(0.4 * LEAST(length(COALESCE(text, '')) / 500.0, 1.0)
                 + 0.3 * (1.0 - punct_ratio)
                 + 0.3 * LEAST(stopword_ratio / 0.1, 1.0), 6) AS quality,
           {_LANG_CASE} AS lang_pred
    FROM ratios
)
SELECT s.doc_id, s.lang_pred, s.n_tokens, s.quality, z.cluster_size
FROM stats s
JOIN clusters c ON s.doc_id = c.doc_id AND c.is_canonical
JOIN sizes z ON c.cluster_id = z.cluster_id
WHERE s.n_tokens >= {D8_MIN_TOKENS} AND s.quality >= {D8_MIN_QUALITY}
"""


# ---------------------------------------------------------------------------
# T24 — END-TO-END corpus assembly: the full chain a training run
# actually consumes, as ONE hash-gated entry — the composition proof
# that the pipeline stages (d8 curation, d20 decontamination, t23
# leakage-safe split, t10 mixture, t11 packing) agree on a single
# corpus. Reads documents, emits packed training sequences:
#
#   near-dup cluster (d6 stage, shared) -> canonical + quality gates
#   (d8) -> drop d20-contaminated docs -> cluster-keyed train/val
#   split (t23) -> source-mixture thin the TRAIN side (t10; val is
#   kept whole for stable eval) -> pack each split into ~512-token
#   sequences (t11, per-(split, bucket) windows).
#
# Scale shape: the shared d6 pair stage dominates (inverted-index
# candidates, never all-pairs); decon is a broadcast-small benchmark
# join; split/mixture are map-only column math off broadcast
# threshold frames; packing windows are (split, bucket)-partitioned —
# parallelism == shard count, never a global window. Nothing here
# adds a shuffle the standalone stages don't already pay.
# ---------------------------------------------------------------------------


def t24_corpus_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.sampling import (
        mixture_sample,
        pack_sequences,
    )

    docs = load(spark, sf_dir, "documents")
    clusters = _jaccard_clusters(spark, sf_dir)

    # d8 curation: canonical member per near-dup cluster + quality gates
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("int").alias("cluster_size")
    )
    canon = (
        clusters.filter(F.col("is_canonical"))
        .join(sizes, "cluster_id")
        .select("doc_id", "cluster_id", "cluster_size")
    )
    stats = text_stats(docs).select(
        "doc_id", "lang_pred", "n_tokens", "quality"
    )
    curated = (
        stats.join(canon, "doc_id")
        .join(docs.select("doc_id", "source"), "doc_id")
        .filter(
            (F.col("n_tokens") >= D8_MIN_TOKENS)
            & (F.col("quality") >= D8_MIN_QUALITY)
        )
    )

    # d20 decontamination: drop docs containing a benchmark slice
    # (the pair frame is the shared _decon_pairs stage — one posting
    # join serves d20 and this chain in a single-pass run)
    contaminated = (
        _decon_pairs(spark, sf_dir)
        .select(F.col("corpus_doc").alias("doc_id"))
        .distinct()
    )
    clean = curated.join(F.broadcast(contaminated), "doc_id", "left_anti")

    # t23 leakage-safe split: hash the CLUSTER id, so every member of a
    # near-dup cluster lands on one side; restrict to mixture sources
    split_bucket = (
        F.conv(
            F.substring(F.md5(F.col("cluster_id").cast("string")), 1, 4),
            16,
            10,
        ).cast("long")
        % 100
    )
    # NOT materialized (r16, measured): the three consumers (mixture
    # counts, mixture keep, val branch) do re-run this lineage, but its
    # parents are persisted shared stages in a catalog pass and the
    # re-executions overlap as concurrent stages — an eager checkpoint
    # barrier measured slower standalone (11.9 -> 12.2 s min-of-3).
    sided = clean.filter(
        F.col("source").isin(sorted(T10_TARGETS))
    ).withColumn(
        "split",
        F.when(split_bucket < T23_TRAIN_PCT, F.lit("train")).otherwise(
            F.lit("val")
        ),
    )

    # t10 mixture on the train side only (eval stays whole), then t11
    # packing per split — disjoint frames, so the two bucket-partitioned
    # windows are exactly one (split, bucket)-partitioned window
    train = mixture_sample(
        sided.filter(F.col("split") == "train"),
        T10_TARGETS,
        resolution=T10_RESOLUTION,
    )
    val = sided.filter(F.col("split") == "val")
    packed = pack_sequences(
        train, T11_TARGET_TOKENS, buckets=T11_BUCKETS
    ).unionByName(
        pack_sequences(val, T11_TARGET_TOKENS, buckets=T11_BUCKETS)
    )
    return packed.select(
        "doc_id",
        "source",
        "lang_pred",
        "n_tokens",
        "quality",
        "cluster_id",
        "cluster_size",
        "split",
        "bucket",
        "seq_id",
    )


_T24_BUCKET32 = (
    "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) "
    f"AS BIGINT) % {T11_BUCKETS}"
)
T24_SQL = rf"""
WITH RECURSIVE pairs AS (
    {D2_SQL}
), edges AS (
    SELECT doc_a AS s, doc_b AS d FROM pairs
    UNION ALL
    SELECT doc_b AS s, doc_a AS d FROM pairs
), reach(id, lbl) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.id
), clusters AS (
    SELECT id AS doc_id,
           MIN(lbl) AS cluster_id,
           (id = MIN(lbl)) AS is_canonical
    FROM reach GROUP BY id
), sizes AS (
    SELECT cluster_id, CAST(COUNT(*) AS INTEGER) AS cluster_size
    FROM clusters GROUP BY cluster_id
), base AS (
    SELECT doc_id, text,
           length(text) AS n_chars_calc,
           CASE WHEN text IS NULL OR trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
           len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
           len(regexp_extract_all(lower(text),
               '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS n_stop
    FROM documents
), ratios AS (
    SELECT *,
           CASE WHEN n_chars_calc IS NULL OR n_chars_calc = 0 THEN 0.0
                ELSE ROUND(n_punct * 1.0 / n_chars_calc, 6) END AS punct_ratio,
           CASE WHEN n_tokens = 0 THEN 0.0
                ELSE ROUND(n_stop * 1.0 / n_tokens, 6) END AS stopword_ratio
    FROM base
), stats AS (
    SELECT doc_id,
           CAST(n_tokens AS INTEGER) AS n_tokens,
           ROUND(0.4 * LEAST(length(COALESCE(text, '')) / 500.0, 1.0)
                 + 0.3 * (1.0 - punct_ratio)
                 + 0.3 * LEAST(stopword_ratio / 0.1, 1.0), 6) AS quality,
           {_LANG_CASE} AS lang_pred
    FROM ratios
), curated AS (
    SELECT s.doc_id, d.source, s.lang_pred, s.n_tokens, s.quality,
           c.cluster_id, z.cluster_size
    FROM stats s
    JOIN clusters c ON s.doc_id = c.doc_id AND c.is_canonical
    JOIN sizes z ON c.cluster_id = z.cluster_id
    JOIN documents d ON d.doc_id = s.doc_id
    WHERE s.n_tokens >= {D8_MIN_TOKENS} AND s.quality >= {D8_MIN_QUALITY}
), dtoks AS (
    SELECT doc_id,
           regexp_split_to_array(trim(lower(text)), '\s+') AS tk
    FROM documents
), dbench AS (
    SELECT doc_id AS bench_doc,
           tk[{D20_SLICE_START}:{D20_SLICE_START + D20_SLICE_LEN - 1}] AS btk
    FROM dtoks
    WHERE doc_id % {D20_BENCH_EVERY} = 0
      AND len(tk) >= {D20_SLICE_START + D20_SLICE_LEN - 1}
), dbsh AS (
    SELECT bench_doc,
           list_distinct(CASE WHEN len(btk) >= {D20_NGRAM} THEN
               list_transform(range(1, len(btk) - {D20_NGRAM - 2}),
                   i -> {_D20_BGRAM_EXPR})
           ELSE [] END) AS s
    FROM dbench
), dbsz AS (
    SELECT bench_doc, len(s) AS bsz FROM dbsh
), dbp AS (
    SELECT bench_doc, unnest(s) AS g FROM dbsh
), dcsh AS (
    SELECT doc_id AS corpus_doc,
           list_distinct(CASE WHEN len(tk) >= {D20_NGRAM} THEN
               list_transform(range(1, len(tk) - {D20_NGRAM - 2}),
                   i -> {_D20_GRAM_EXPR})
           ELSE [] END) AS s
    FROM dtoks
), dcp AS (
    SELECT corpus_doc, unnest(s) AS g FROM dcsh
), contaminated AS (
    SELECT DISTINCT corpus_doc AS doc_id FROM (
        SELECT corpus_doc
        FROM dbp JOIN dcp USING (g) JOIN dbsz USING (bench_doc)
        WHERE corpus_doc != bench_doc
        GROUP BY bench_doc, corpus_doc
        HAVING COUNT(*) * 100 >= {D20_PCT} * ANY_VALUE(bsz)
    )
), sided AS (
    SELECT cu.*,
           CASE WHEN CAST(('0x' || substring(
                    md5(CAST(cluster_id AS VARCHAR)), 1, 4)) AS BIGINT)
                    % 100 < {T23_TRAIN_PCT}
                THEN 'train' ELSE 'val' END AS split
    FROM curated cu
    WHERE cu.doc_id NOT IN (SELECT doc_id FROM contaminated)
      AND cu.source IN ({", ".join(f"'{k}'" for k in sorted(T10_TARGETS))})
), tgt AS (
    SELECT source,
           CASE source {" ".join(
               f"WHEN '{k}' THEN {v!r}" for k, v in sorted(T10_TARGETS.items())
           )} END AS w
    FROM (SELECT DISTINCT source FROM sided WHERE split = 'train')
), tcounts AS (
    SELECT s.source, t.w, COUNT(*) AS n
    FROM sided s JOIN tgt t USING (source)
    WHERE s.split = 'train'
    GROUP BY s.source, t.w
), scaled AS (
    SELECT source,
           FLOOR({float(T10_RESOLUTION)} * w
                 * (SELECT MIN(n / w) FROM tcounts) / n) AS thresh
    FROM tcounts
), sampled AS (
    SELECT s.* FROM sided s JOIN scaled USING (source)
    WHERE s.split = 'train'
      AND CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))
               AS BIGINT) % {T10_RESOLUTION} < thresh
    UNION ALL
    SELECT s.* FROM sided s WHERE s.split = 'val'
), packed AS (
    SELECT *,
           {_T24_BUCKET32} AS bucket,
           SUM(n_tokens) OVER (
               PARTITION BY split, {_T24_BUCKET32}
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) - n_tokens AS cum_before
    FROM sampled
)
SELECT doc_id, source, lang_pred, n_tokens, quality, cluster_id,
       cluster_size, split, bucket,
       bucket * 4294967296
           + CAST(FLOOR(cum_before * 1.0 / {T11_TARGET_TOKENS}) AS BIGINT)
           AS seq_id
FROM packed
"""


# ---------------------------------------------------------------------------
# T25 — dataset card: the summary artifact a corpus release ships
# with (per-source volume, token/char totals, quality distribution
# endpoints, language mix + deterministic top language). Derived
# entirely from the mergeable (source, lang_pred)-grain state
# (operators/quality.dataset_card_state) — the state grain is chosen
# so the NON-mergeable-looking columns (n_langs, top_lang) still
# derive after folds. I12 proves exactly that: the 80/20 doc split
# folded via dataset_card_fold must reproduce this report bit-exactly
# (same oracle), extending the i-series to the reporting plane.
# ---------------------------------------------------------------------------


def t25_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.quality import (
        dataset_card_report,
        dataset_card_state,
    )

    docs = load(spark, sf_dir, "documents")
    return dataset_card_report(dataset_card_state(docs))


def i12_dataset_card_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.cache import once_checkpoint
    from big_data_flight_analytics_spark.operators.quality import (
        dataset_card_fold,
        dataset_card_report,
        dataset_card_state,
    )

    docs = load(spark, sf_dir, "documents")
    # ONE text_stats pass for both sides (r16, the i11 pattern): the
    # side flag joins the state grouping key, so each side's rows
    # aggregate exactly as the old two filtered passes did; the tiny
    # (source, lang, side) state is checkpointed once and the fold
    # reads filters of it. The fold itself is unchanged — the i1
    # contract (delta path invisible vs from-scratch oracle) still
    # exercises a real merge of independently-aggregated states.
    states = once_checkpoint(
        dataset_card_state(
            docs.withColumn("__late", F.col("doc_id") % 5 == 0),
            side_col="__late",
        )
    )
    base = states.filter(~F.col("__late")).drop("__late")
    delta = states.filter(F.col("__late")).drop("__late")
    return dataset_card_report(dataset_card_fold(base, delta))


T25_SQL = rf"""
WITH base AS (
    SELECT doc_id, text,
           length(text) AS n_chars_calc,
           CASE WHEN text IS NULL OR trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
           len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
           len(regexp_extract_all(lower(text),
               '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS n_stop
    FROM documents
), ratios AS (
    SELECT *,
           CASE WHEN n_chars_calc IS NULL OR n_chars_calc = 0 THEN 0.0
                ELSE ROUND(n_punct * 1.0 / n_chars_calc, 6) END AS punct_ratio,
           CASE WHEN n_tokens = 0 THEN 0.0
                ELSE ROUND(n_stop * 1.0 / n_tokens, 6) END AS stopword_ratio
    FROM base
), stats AS (
    SELECT doc_id,
           CAST(n_tokens AS INTEGER) AS n_tokens,
           n_chars_calc,
           ROUND(0.4 * LEAST(length(COALESCE(text, '')) / 500.0, 1.0)
                 + 0.3 * (1.0 - punct_ratio)
                 + 0.3 * LEAST(stopword_ratio / 0.1, 1.0), 6) AS quality,
           {_LANG_CASE} AS lang_pred
    FROM ratios
), st AS (
    SELECT d.source, s.lang_pred,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(s.n_tokens) AS BIGINT) AS n_tokens_total,
           CAST(SUM(s.n_chars_calc) AS BIGINT) AS n_chars_total,
           CAST(SUM(CAST(FLOOR(s.quality * 1000000 + 0.5) AS BIGINT))
                AS BIGINT) AS q_micro_total,
           MIN(s.quality) AS min_quality,
           MAX(s.quality) AS max_quality
    FROM stats s JOIN documents d USING (doc_id)
    GROUP BY 1, 2
), per_src AS (
    SELECT source,
           CAST(SUM(n_docs) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens_total) AS BIGINT) AS n_tokens_total,
           CAST(SUM(n_chars_total) AS BIGINT) AS n_chars_total,
           CAST(SUM(q_micro_total) AS BIGINT) AS q_micro_total,
           MIN(min_quality) AS min_quality,
           MAX(max_quality) AS max_quality,
           CAST(COUNT(*) AS BIGINT) AS n_langs
    FROM st GROUP BY 1
), top AS (
    SELECT source, lang_pred AS top_lang FROM (
        SELECT source, lang_pred,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY n_docs DESC, lang_pred ASC)
                   AS rn
        FROM st
    ) WHERE rn = 1
)
SELECT p.source, p.n_docs, p.n_tokens_total, p.n_chars_total,
       ROUND(CAST(p.q_micro_total AS DOUBLE) / p.n_docs / 1000000.0, 6)
           AS mean_quality,
       p.min_quality, p.max_quality, p.n_langs, t.top_lang
FROM per_src p JOIN top t USING (source)
"""


# ---------------------------------------------------------------------------
# T13 — fixed-token chunking with overlap: the context-window prep step
# between a curated corpus and an embedding / training / retrieval
# pipeline. Map-only (sequence + explode over the scan — no shuffle);
# chunk grain is the unit a RAG index or packed-sequence builder
# consumes downstream.
# ---------------------------------------------------------------------------

T13_CHUNK = 64
T13_OVERLAP = 16
_T13_STEP = T13_CHUNK - T13_OVERLAP


def t13_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.text import chunk_tokens

    docs = load(spark, sf_dir, "documents")
    return chunk_tokens(docs, chunk_size=T13_CHUNK, overlap=T13_OVERLAP)


T13_SQL = rf"""
WITH toks AS (
    SELECT doc_id,
           CASE WHEN text IS NULL OR trim(text) = '' THEN []
                ELSE regexp_split_to_array(trim(text), '\s+') END AS t
    FROM documents
), starts AS (
    -- starts stop before len - overlap: a start inside the final
    -- overlap would emit a pure suffix of the prior chunk
    SELECT doc_id, t,
           unnest(range(0, greatest(len(t) - {T13_OVERLAP}, 1), {_T13_STEP}))
               AS s
    FROM toks WHERE len(t) > 0
)
SELECT doc_id,
       CAST(s // {_T13_STEP} AS INTEGER) AS chunk_id,
       CAST(least({T13_CHUNK}, len(t) - s) AS INTEGER) AS n_chunk_tokens,
       array_to_string(t[s + 1 : s + {T13_CHUNK}], ' ') AS chunk_text
FROM starts
"""


# ---------------------------------------------------------------------------
# T14 — lexical diversity: type-token ratio + hapax fraction per doc —
# the intra-document diversity signal complementing t1 (surface
# ratios), t3 (repetition), and t12 (corpus-relative frequency).
# Ratios are single IEEE divisions of exact integer counts (log-free
# oracle contract).
# ---------------------------------------------------------------------------


def t14_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.text import (
        lexical_diversity,
    )

    docs = load(spark, sf_dir, "documents")
    return lexical_diversity(docs)


T14_SQL = r"""
WITH toks AS (
    SELECT doc_id,
           unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
    FROM documents
    WHERE text IS NOT NULL AND trim(text) <> ''
), tc AS (
    SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       ROUND(COUNT(*) / CAST(SUM(c) AS DOUBLE), 6) AS ttr,
       ROUND(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) / CAST(SUM(c) AS DOUBLE), 6)
           AS hapax_frac
FROM tc GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# D12 — keep-best dedup: near-dup clusters (D6) keep their LONGEST
# member, not the min-id one — the C4/RefinedWeb policy where dropping
# the shorter near-dups preserves the most content per cluster. Same
# shared pair/cluster stages as d6/d8; the selection adds one doc-keyed
# join and one cluster-partitioned row_number.
# ---------------------------------------------------------------------------


def d12_keep_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.functions.text import token_count
    from big_data_flight_analytics_spark.operators.graph import (
        canonical_by_score,
    )

    docs = load(spark, sf_dir, "documents")
    clusters = _jaccard_clusters(spark, sf_dir)
    scored = docs.select(
        "doc_id", token_count(F.col("text")).cast("bigint").alias("n_tokens")
    )
    return canonical_by_score(clusters, scored, "n_tokens")


D12_SQL = rf"""
WITH RECURSIVE pairs AS (
    {D2_SQL}
), edges AS (
    SELECT doc_a AS s, doc_b AS d FROM pairs
    UNION ALL
    SELECT doc_b AS s, doc_a AS d FROM pairs
), reach(id, lbl) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.id
), clusters AS (
    SELECT id AS doc_id, MIN(lbl) AS cluster_id
    FROM reach GROUP BY id
), scored AS (
    SELECT doc_id,
           CAST(CASE WHEN text IS NULL OR trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END
                AS BIGINT) AS n_tokens
    FROM documents
), ranked AS (
    SELECT c.cluster_id, c.doc_id, s.n_tokens,
           ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                              ORDER BY s.n_tokens DESC, c.doc_id ASC) AS rn,
           COUNT(*) OVER (PARTITION BY c.cluster_id) AS cluster_size
    FROM clusters c JOIN scored s USING (doc_id)
)
SELECT cluster_id,
       doc_id AS kept_doc_id,
       n_tokens,
       CAST(cluster_size AS BIGINT) AS cluster_size
FROM ranked WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# D15 — exact repeated-substring spans (Lee et al. 2022 grain): per
# doc, the maximal token spans whose every 8-token window recurs in the
# corpus. Distributed suffix-array replacement: mark positions by
# corpus-frequent gram hash (one shuffle on the gram), merge adjacent
# marks per doc (one shuffle on the doc; the span groupBy reuses it).
# ---------------------------------------------------------------------------

D15_N = 8


def _repeated_marks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d15/d16's gram-frequency mark as a shareable stage — the heavy
    gram shuffle runs once per single-pass pipeline instead of twice."""
    from big_data_flight_analytics_spark.operators.dedup import (
        repeated_window_marks,
    )

    return stage(
        ("repeated_marks", sf_dir, D15_N, 2),
        lambda: repeated_window_marks(
            load(spark, sf_dir, "documents"), n=D15_N, min_count=2
        ),
    )


def d15_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.dedup import repeated_spans

    return repeated_spans(
        load(spark, sf_dir, "documents"),
        n=D15_N,
        marks=_repeated_marks(spark, sf_dir),
    )


_D15_GRAM = " || ' ' || ".join(f"t[i + {j}]" for j in range(D15_N)).replace(
    "t[i + 0]", "t[i]"
)

D15_SQL = rf"""
WITH toks AS (
    SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
    FROM documents
), grams AS (
    SELECT doc_id,
           CASE WHEN len(t) >= {D15_N} THEN
               list_transform(range(1, len(t) - {D15_N - 2}),
                   i -> md5({_D15_GRAM}))
           ELSE [] END AS h
    FROM toks
), pos AS (
    SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
           h[CAST(u.i AS BIGINT) + 1] AS g
    FROM grams, UNNEST(range(len(h))) AS u(i)
), counts AS (
    SELECT g, COUNT(*) AS c FROM pos GROUP BY 1
), marked AS (
    SELECT p.doc_id, p.pos FROM pos p JOIN counts USING (g) WHERE c >= 2
), runs AS (
    SELECT doc_id, pos,
           CASE WHEN lag(pos) OVER w IS NULL
                     OR pos - lag(pos) OVER w > 1
                THEN 1 ELSE 0 END AS nf
    FROM marked WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
), sess AS (
    SELECT doc_id, pos,
           SUM(nf) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS rid
    FROM runs
)
SELECT doc_id,
       MIN(pos) AS span_start,
       MAX(pos) + {D15_N - 1} AS span_end_tok,
       CAST(COUNT(*) AS BIGINT) AS n_windows
FROM sess GROUP BY doc_id, rid
"""


# ---------------------------------------------------------------------------
# D16 — substring-dedup REWRITE: the action half of d15. Tokens covered
# by any corpus-repeated 8-gram window are excised and the remainder
# rejoined in order (canonical lowercased/normalized form). Every doc
# appears in the output, including untouched (n_removed = 0) and
# fully-boilerplate (clean_text = '') ones.
# ---------------------------------------------------------------------------


def d16_excise_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.dedup import (
        excise_repeated_spans,
    )

    return excise_repeated_spans(
        load(spark, sf_dir, "documents"),
        n=D15_N,
        marks=_repeated_marks(spark, sf_dir),
    )


D16_SQL = rf"""
WITH toks AS (
    SELECT doc_id, text,
           CASE WHEN text IS NULL OR trim(text) = '' THEN []
                ELSE regexp_split_to_array(trim(lower(text)), '\s+')
           END AS t
    FROM documents
), base AS (
    SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
           t[CAST(u.i AS BIGINT) + 1] AS tok
    FROM toks, UNNEST(range(len(t))) AS u(i)
), grams AS (
    SELECT doc_id,
           CASE WHEN len(t) >= {D15_N} THEN
               list_transform(range(1, len(t) - {D15_N - 2}),
                   i -> md5({_D15_GRAM}))
           ELSE [] END AS h
    FROM toks
), gpos AS (
    SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
           h[CAST(u.i AS BIGINT) + 1] AS g
    FROM grams, UNNEST(range(len(h))) AS u(i)
), counts AS (
    SELECT g, COUNT(*) AS c FROM gpos GROUP BY 1
), marked AS (
    SELECT p.doc_id, p.pos FROM gpos p JOIN counts USING (g) WHERE c >= 2
), covered AS (
    SELECT DISTINCT m.doc_id, CAST(u.j AS BIGINT) AS pos
    FROM marked m, UNNEST(range(m.pos, m.pos + {D15_N})) AS u(j)
), kept AS (
    SELECT b.doc_id, b.pos, b.tok
    FROM base b ANTI JOIN covered c USING (doc_id, pos)
), rebuilt AS (
    SELECT doc_id,
           string_agg(tok, ' ' ORDER BY pos) AS clean_text,
           CAST(COUNT(*) AS BIGINT) AS n_kept
    FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       COALESCE(r.clean_text, '') AS clean_text,
       COALESCE(r.n_kept, 0) AS n_kept,
       CAST(len(t.t) AS BIGINT) - COALESCE(r.n_kept, 0) AS n_removed
FROM toks t LEFT JOIN rebuilt r USING (doc_id)
"""


# ---------------------------------------------------------------------------
# D17 — per-source dedup report: the curation dashboard a corpus owner
# reads before training. Per source: doc count, docs participating in
# an exact-dup group, token volume, tokens inside corpus-repeated
# 8-gram spans (the d16 removal), and the removal rate. Composition:
# the exact-dup flag is one fingerprint-partitioned window; the
# repeated-token counts reuse the shared d15/d16 gram-mark stage; the
# final rollup is one groupBy(source). Ratios are integer-over-integer
# — exact IEEE, no rounding tolerance needed (rounded 6dp for
# presentation).
# ---------------------------------------------------------------------------


def d17_source_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    toks = tokens("text")
    per_doc = docs.select(
        "doc_id",
        "source",
        rolling_fingerprint(F.col("text")).alias("__f"),
        F.when(
            F.trim(F.coalesce(F.col("text"), F.lit(""))) != "", F.size(toks)
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("__n_toks"),
    )
    dup_flag = (
        F.count(F.lit(1)).over(Window.partitionBy("__f")) >= 2
    ).alias("__is_dup")
    flagged = per_doc.select("doc_id", "source", "__n_toks", dup_flag)

    marks = _repeated_marks(spark, sf_dir)
    covered_per_doc = (
        marks.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (D15_N - 1))
            ).alias("pos"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("__removed"))
    )
    joined = flagged.join(covered_per_doc, "doc_id", "left")
    removed = F.coalesce("__removed", F.lit(0))
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("__is_dup"), 1).otherwise(0))
        .cast("long")
        .alias("dup_docs"),
        F.sum("__n_toks").alias("tokens_total"),
        F.sum(removed).alias("tokens_removed"),
        F.round(
            F.sum(removed).cast("double")
            / F.sum("__n_toks").cast("double"),
            6,
        ).alias("removal_rate"),
    )


D17_SQL = rf"""
WITH toks AS (
    SELECT doc_id, source, text,
           CASE WHEN text IS NULL OR trim(text) = '' THEN []
                ELSE regexp_split_to_array(trim(lower(text)), '\s+')
           END AS t
    FROM documents
), grams AS (
    SELECT doc_id,
           CASE WHEN len(t) >= {D15_N} THEN
               list_transform(range(1, len(t) - {D15_N - 2}),
                   i -> md5({_D15_GRAM}))
           ELSE [] END AS h
    FROM toks
), gpos AS (
    SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
           h[CAST(u.i AS BIGINT) + 1] AS g
    FROM grams, UNNEST(range(len(h))) AS u(i)
), counts AS (
    SELECT g, COUNT(*) AS c FROM gpos GROUP BY 1
), marked AS (
    SELECT p.doc_id, p.pos FROM gpos p JOIN counts USING (g) WHERE c >= 2
), covered AS (
    SELECT DISTINCT m.doc_id, CAST(u.j AS BIGINT) AS pos
    FROM marked m, UNNEST(range(m.pos, m.pos + {D15_N})) AS u(j)
), cov_per_doc AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS removed
    FROM covered GROUP BY 1
), fp AS (
    SELECT doc_id, source,
           md5(trim(regexp_replace(lower(COALESCE(text, '')), '\s+', ' ',
                                   'g'))) AS f,
           CAST(len(t) AS BIGINT) AS n_toks
    FROM toks
), gs AS (
    SELECT f, COUNT(*) AS c FROM fp GROUP BY 1
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_docs,
       CAST(SUM(n_toks) AS BIGINT) AS tokens_total,
       CAST(SUM(COALESCE(removed, 0)) AS BIGINT) AS tokens_removed,
       ROUND(CAST(SUM(COALESCE(removed, 0)) AS DOUBLE)
             / CAST(SUM(n_toks) AS DOUBLE), 6) AS removal_rate
FROM fp JOIN gs USING (f) LEFT JOIN cov_per_doc USING (doc_id)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# V5 — int8-quantized ANN: candidates ranked by the EXACT integer dot
# product of per-vector affine codes (the 4x-compressed index is the
# only thing the full scan touches), then an exact double-accumulated
# rerank over k*expand candidates fetched by id. The candidate stage
# carries zero cross-engine float risk by construction; the rerank
# reuses the kNN-graph DOUBLE[] precision contract.
# ---------------------------------------------------------------------------

V5_EXPAND = 4


def v5_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.similarity import (
        quantized_topk,
    )

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return quantized_topk(emb, queries, k=TOPK, expand=V5_EXPAND)


V5_SQL = f"""
WITH quant AS (
    SELECT vec_id, embedding,
           CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS amin,
           CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS amax
    FROM embeddings
), scaled AS (
    SELECT vec_id, embedding, amin,
           CASE WHEN amax > amin THEN (amax - amin) / 255.0 ELSE 1.0 END
               AS scale
    FROM quant
), codes AS (
    -- mirrors quantize_vectors: codes + the indexed reconstruction
    -- scalars (amin/scale/code-sum/dim/true norm). DOUBLE[] cast = the
    -- kNN-graph precision contract for every float accumulation.
    SELECT vec_id, amin, scale,
           CAST(embedding AS DOUBLE[]) AS dv,
           list_transform(embedding,
               x -> CAST(FLOOR((CAST(x AS DOUBLE) - amin) / scale + 0.5)
                         AS BIGINT)) AS qv,
           len(embedding) AS d
    FROM scaled
), idx AS (
    SELECT vec_id, amin, scale, dv, qv, d,
           CAST(list_aggregate(qv, 'sum') AS BIGINT) AS qsum,
           sqrt(list_dot_product(dv, dv)) AS norm
    FROM codes
), q AS (
    SELECT vec_id AS query_id, qv AS qq, dv AS qdv,
           amin AS qamin, scale AS qscale, qsum AS qqsum, norm AS qnorm
    FROM idx WHERE vec_id < {N_QUERY_VECS}
), cand AS (
    -- reconstructed cosine, ONE fixed association shared with Spark:
    -- ((d*ca*qa + ca*qs*qqs) + qa*cs*cqs) + cs*qs*intdot, over cn*qn
    SELECT q.query_id, c.vec_id AS neighbor_id,
           CASE WHEN c.norm * q.qnorm = 0 THEN 0.0 ELSE
               (c.d * c.amin * q.qamin
                + c.amin * q.qscale * q.qqsum
                + q.qamin * c.scale * c.qsum
                + c.scale * q.qscale * list_dot_product(c.qv, q.qq))
               / (c.norm * q.qnorm) END AS qdot
    FROM idx c CROSS JOIN q
    WHERE c.vec_id <> q.query_id
), short AS (
    SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY qdot DESC, neighbor_id ASC) AS rn
        FROM cand
    ) WHERE rn <= {TOPK} * {V5_EXPAND}
), scored AS (
    SELECT s.query_id, s.neighbor_id,
           CASE WHEN sqrt(list_dot_product(qs.qdv, qs.qdv))
                     * sqrt(list_dot_product(cv.dv, cv.dv)) = 0
                THEN 0.0 ELSE ROUND(list_dot_product(qs.qdv, cv.dv) /
                 (sqrt(list_dot_product(qs.qdv, qs.qdv))
                  * sqrt(list_dot_product(cv.dv, cv.dv))), 4) END AS sim
    FROM short s
    JOIN codes cv ON cv.vec_id = s.neighbor_id
    JOIN q qs ON qs.query_id = s.query_id
)
SELECT query_id, neighbor_id, sim FROM (
    SELECT query_id, neighbor_id, sim,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, neighbor_id ASC) AS rn
    FROM scored
) WHERE rn <= {TOPK}
"""


# ---------------------------------------------------------------------------
# V6 — product-quantization ANN (the FAISS-standard compressed index):
# m=16 subspaces x 16 centroids -> 16-byte codes per 64-dim vector
# (16x compression); ADC candidate scoring via per-query centroid
# lookup tables, exact rerank over k*expand. Codebooks default to the
# min-id stub (same pluggable contract as IVF's centroids) so the
# whole query stays oracle-checkable; pq_codebooks_kmeans is the
# trained path (measured recall 0.72 vs stub 0.48 at m=8/expand=8 on
# the near-isotropic test vectors — the hardest case for any
# quantizer; see TestPqTopk).
# ---------------------------------------------------------------------------

V6_M = 16
V6_SUB = 64 // V6_M
V6_KCENT = 16
V6_EXPAND = 4


def v6_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.similarity import pq_topk

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return pq_topk(
        emb, queries, k=TOPK, m=V6_M, kcent=V6_KCENT, expand=V6_EXPAND
    )


_V6_PJ = ",\n           ".join(
    f"SUM(CASE WHEN j = {j} THEN lutv END) AS p{j}" for j in range(V6_M)
)
_V6_SUM = " + ".join(f"p{j}" for j in range(V6_M))

V6_SQL = f"""
WITH dv AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), cb AS (
    SELECT CAST(u.j AS BIGINT) AS j, vec_id AS c,
           v[CAST(u.j * {V6_SUB} + 1 AS BIGINT) :
             CAST((u.j + 1) * {V6_SUB} AS BIGINT)] AS centroid
    FROM dv, UNNEST(range({V6_M})) AS u(j)
    WHERE vec_id < {V6_KCENT}
), subs AS (
    SELECT vec_id, CAST(u.j AS BIGINT) AS j,
           v[CAST(u.j * {V6_SUB} + 1 AS BIGINT) :
             CAST((u.j + 1) * {V6_SUB} AS BIGINT)] AS sv
    FROM dv, UNNEST(range({V6_M})) AS u(j)
), codes AS (
    -- nearest centroid per (vector, subspace); (dist, c) struct min =
    -- Spark's F.min(struct(d, c)) tie-break on the lowest centroid id
    SELECT s.vec_id AS neighbor_id, s.j,
           (MIN({{'d': list_dot_product(cb.centroid, cb.centroid)
                       - (2.0 * list_dot_product(s.sv, cb.centroid)),
                  'c': cb.c}})).c AS c
    FROM subs s JOIN cb ON cb.j = s.j
    GROUP BY 1, 2
), lut AS (
    SELECT s.vec_id AS query_id, s.j, cb.c,
           list_dot_product(s.sv, cb.centroid) AS lutv
    FROM subs s JOIN cb ON cb.j = s.j
    WHERE s.vec_id < {N_QUERY_VECS}
), partials AS (
    SELECT l.query_id, co.neighbor_id, co.j, l.lutv
    FROM codes co JOIN lut l ON l.j = co.j AND l.c = co.c
    WHERE co.neighbor_id <> l.query_id
), adc AS (
    SELECT query_id, neighbor_id,
           {_V6_PJ}
    FROM partials GROUP BY 1, 2
), norms AS (
    SELECT vec_id, sqrt(list_dot_product(v, v)) AS nrm FROM dv
), scored0 AS (
    SELECT a.query_id, a.neighbor_id,
           CASE WHEN nc.nrm * nq.nrm = 0 THEN 0.0
                ELSE ({_V6_SUM}) / (nc.nrm * nq.nrm) END AS adc_score
    FROM adc a
    JOIN norms nc ON nc.vec_id = a.neighbor_id
    JOIN norms nq ON nq.vec_id = a.query_id
), short AS (
    SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY adc_score DESC,
                                           neighbor_id ASC) AS rn
        FROM scored0
    ) WHERE rn <= {TOPK} * {V6_EXPAND}
), scored AS (
    SELECT s.query_id, s.neighbor_id,
           CASE WHEN sqrt(list_dot_product(qv.v, qv.v))
                     * sqrt(list_dot_product(cv.v, cv.v)) = 0
                THEN 0.0 ELSE ROUND(list_dot_product(qv.v, cv.v) /
                 (sqrt(list_dot_product(qv.v, qv.v))
                  * sqrt(list_dot_product(cv.v, cv.v))), 4) END AS sim
    FROM short s
    JOIN dv cv ON cv.vec_id = s.neighbor_id
    JOIN dv qv ON qv.vec_id = s.query_id
)
SELECT query_id, neighbor_id, sim FROM (
    SELECT query_id, neighbor_id, sim,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, neighbor_id ASC) AS rn
    FROM scored
) WHERE rn <= {TOPK}
"""


# ---------------------------------------------------------------------------
# V7 — TRAINED-codebook PQ under the full hash gate (VERDICT r7
# stretch): v6 gates the min-id stub codebooks; here the codebooks are
# actually LEARNED — n_iter rounds of Lloyd k-means per subspace —
# and the training is itself oracle-replayable because it runs on
# int64 grains (operators/similarity.kmeans_fixedpoint_subspaces):
# integer distances, struct-min tie-breaks, FLOOR(double-division)
# centroid updates. Downstream, every rank-deciding value (integer
# grain ADC, fixed-point norms, fixed-point rerank cosine) is exact —
# the whole chain is form-robust by construction (no double fold
# order, no ROUND, per the r8 doctrine). The oracle unrolls the Lloyd
# rounds as MATERIALIZED CTEs over the same grains.
# ---------------------------------------------------------------------------

V7_M = 8
V7_SUB = 64 // V7_M
V7_KCENT = 16
V7_EXPAND = 4
V7_ITER = 4
V7_SCALE = 10**6
V7_NSQ_SCALE = V7_SCALE * V7_SCALE  # norm grain matching the ADC units
V7_FP = 10**15  # rerank cosine grain (same contract as v4)


def v7_pq_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.similarity import (
        pq_topk_trained,
    )

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return pq_topk_trained(
        emb,
        queries,
        k=TOPK,
        m=V7_M,
        kcent=V7_KCENT,
        expand=V7_EXPAND,
        n_iter=V7_ITER,
        scale=V7_SCALE,
        fp_scale=V7_FP,
    )


def _pq_trained_sql() -> str:
    """Unrolled exact-grain trained-PQ oracle (see V7 banner).

    Mirrors ``pq_topk_trained`` stage-for-stage: grain table -> seeded
    codebooks -> ``V7_ITER`` Lloyd rounds (assignment via ROW_NUMBER
    over (int dist, c), update via FLOOR(CAST(sum AS DOUBLE)/n) —
    matching Spark's min(struct) and floor-div constructions exactly)
    -> integer encode/LUT/ADC -> fixed-point rerank. MATERIALIZED CTEs
    keep DuckDB from re-inlining the chain per reference (the
    pagerank-oracle lesson).
    """
    m, sub, kc, s = V7_M, V7_SUB, V7_KCENT, V7_SCALE
    dist = (
        f"list_sum(list_transform(range(1, {sub} + 1), "
        "i -> (e.vq[i] - cb.cq[i]) * (e.vq[i] - cb.cq[i])))"
    )
    mean_elems = ", ".join(
        f"CAST(FLOOR(CAST(SUM(vq[{i + 1}]) AS DOUBLE) / COUNT(*)) AS BIGINT)"
        for i in range(sub)
    )
    per_j = ",\n           ".join(
        f"SUM(CASE WHEN j = {j} THEN lutv END) AS p{j}" for j in range(m)
    )
    sum_pj = " + ".join(f"p{j}" for j in range(m))
    parts = [
        f"""WITH e AS MATERIALIZED (
    SELECT vec_id AS id, CAST(u.j AS BIGINT) AS j,
           list_transform(range(1, {sub} + 1),
               i -> CAST(FLOOR(CAST(embedding[CAST(u.j AS BIGINT) * {sub} + i]
                                    AS DOUBLE) * {s}.0) AS BIGINT)) AS vq
    FROM embeddings, UNNEST(range({m})) AS u(j)
),
c0 AS MATERIALIZED (
    SELECT j, id AS c, vq AS cq FROM e WHERE id < {kc}
)"""
    ]
    for r in range(1, V7_ITER + 1):
        parts.append(
            f"""a{r} AS (
    SELECT id, j, vq, c FROM (
        SELECT e.id, e.j, e.vq, cb.c,
               ROW_NUMBER() OVER (PARTITION BY e.id, e.j
                   ORDER BY {dist} ASC, cb.c ASC) AS rn
        FROM e JOIN c{r - 1} cb ON cb.j = e.j
    ) WHERE rn = 1
),
m{r} AS (
    SELECT j, c, list_value({mean_elems}) AS cq
    FROM a{r} GROUP BY 1, 2
),
c{r} AS MATERIALIZED (
    SELECT p.j, p.c, COALESCE(m.cq, p.cq) AS cq
    FROM c{r - 1} p LEFT JOIN m{r} m ON m.j = p.j AND m.c = p.c
)"""
        )
    t = V7_ITER
    parts.append(
        f"""codes AS (
    SELECT id AS neighbor_id, j, c FROM (
        SELECT e.id, e.j, cb.c,
               ROW_NUMBER() OVER (PARTITION BY e.id, e.j
                   ORDER BY {dist} ASC, cb.c ASC) AS rn
        FROM e JOIN c{t} cb ON cb.j = e.j
    ) WHERE rn = 1
),
lut AS (
    SELECT e.id AS query_id, e.j, cb.c,
           CAST(list_sum(list_transform(range(1, {sub} + 1),
               i -> e.vq[i] * cb.cq[i])) AS BIGINT) AS lutv
    FROM e JOIN c{t} cb ON cb.j = e.j
    WHERE e.id < {N_QUERY_VECS}
),
partials AS (
    SELECT l.query_id, co.neighbor_id, co.j, l.lutv
    FROM codes co JOIN lut l ON l.j = co.j AND l.c = co.c
    WHERE co.neighbor_id <> l.query_id
),
adc AS (
    SELECT query_id, neighbor_id,
           {per_j}
    FROM partials GROUP BY 1, 2
),
nsq AS MATERIALIZED (
    SELECT vec_id,
           CAST(list_sum(list_transform(range(1, 64 + 1),
               i -> CAST(FLOOR(CAST(embedding[i] AS DOUBLE)
                               * CAST(embedding[i] AS DOUBLE)
                               * {V7_NSQ_SCALE}.0) AS BIGINT)))
               AS BIGINT) AS n2
    FROM embeddings
),
scored0 AS (
    SELECT a.query_id, a.neighbor_id,
           CASE WHEN nc.n2 <= 0 OR nq.n2 <= 0 THEN 0.0
                ELSE CAST(({sum_pj}) AS DOUBLE)
                     / (sqrt(CAST(nc.n2 AS DOUBLE))
                        * sqrt(CAST(nq.n2 AS DOUBLE))) END AS adc_score
    FROM adc a
    JOIN nsq nc ON nc.vec_id = a.neighbor_id
    JOIN nsq nq ON nq.vec_id = a.query_id
),
short AS (
    SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY adc_score DESC,
                                           neighbor_id ASC) AS rn
        FROM scored0
    ) WHERE rn <= {TOPK} * {V7_EXPAND}
),
nfp AS MATERIALIZED (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           CAST(list_sum(list_transform(range(1, 64 + 1),
               i -> CAST(FLOOR(CAST(embedding[i] AS DOUBLE)
                               * CAST(embedding[i] AS DOUBLE)
                               * {V7_FP}.0) AS BIGINT)))
               AS BIGINT) AS nf
    FROM embeddings
),
scored AS (
    SELECT sh.query_id, sh.neighbor_id,
           CASE WHEN qv.nf <= 0 OR cv.nf <= 0 THEN 0.0
                ELSE CAST(CAST(list_sum(list_transform(range(1, 64 + 1),
                         i -> CAST(FLOOR(qv.v[i] * cv.v[i] * {V7_FP}.0)
                                   AS BIGINT))) AS BIGINT) AS DOUBLE)
                     / (sqrt(CAST(qv.nf AS DOUBLE))
                        * sqrt(CAST(cv.nf AS DOUBLE))) END AS sim
    FROM short sh
    JOIN nfp cv ON cv.vec_id = sh.neighbor_id
    JOIN nfp qv ON qv.vec_id = sh.query_id
)"""
    )
    body = ",\n".join(parts)
    return (
        body
        + f"""
SELECT query_id, neighbor_id, sim FROM (
    SELECT query_id, neighbor_id, sim,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, neighbor_id ASC) AS rn
    FROM scored
) WHERE rn <= {TOPK}"""
    )


V7_SQL = _pq_trained_sql()


# ---------------------------------------------------------------------------
# V8 — IVF-PQ (FAISS's production index shape): a trained COARSE
# quantizer partitions the corpus into cells, a trained product
# quantizer encodes each vector's RESIDUAL (exact int64 grain
# subtraction), and queries probe only the nprobe nearest cells —
# the inverted-file cut that makes PQ usable at corpus scale. Both
# trainings are the exact-grain Lloyd (same operator as v7, m=1 for
# the coarse pass), candidate scoring is the inner-product ADC
# decomposition dot(q,x) ~ dot(q,cell) + sum_j LUT[j,code_j] with
# every term an int64 grain dot (cell-independent LUT, unlike
# L2-ADC), probe selection is integer L2 with (dist,cell) ties, and
# the rerank is the v4 fixed-point cosine — the whole two-quantizer
# chain is an engine-portable pure function of the data under the
# hash gate.
# ---------------------------------------------------------------------------

V8_COARSE_K = 16
V8_NPROBE = 4
V8_M = 8
V8_SUB = 64 // V8_M
V8_KCENT = 16
V8_CITER = 2  # recall plateaus at 2 rounds on this corpus (0.82 vs
V8_PITER = 2  # 0.80 at 3/3, measured) and each round is ~1 s of
#               scheduling-bound loop cost — BASELINE.md round-8
V8_EXPAND = 4
V8_SCALE = 10**6
V8_NSQ_SCALE = V8_SCALE * V8_SCALE
V8_FP = 10**15


def v8_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.similarity import (
        ivfpq_topk,
    )

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return ivfpq_topk(
        emb,
        queries,
        k=TOPK,
        coarse_k=V8_COARSE_K,
        nprobe=V8_NPROBE,
        m=V8_M,
        kcent=V8_KCENT,
        expand=V8_EXPAND,
        coarse_iter=V8_CITER,
        pq_iter=V8_PITER,
        scale=V8_SCALE,
        fp_scale=V8_FP,
    )


def _lloyd_cte_rounds(e: str, pfx: str, sub: int, n_iter: int) -> list:
    """CTE strings for ``n_iter`` exact-grain Lloyd rounds over the
    (id, j, vq) CTE ``e`` seeded by ``{pfx}c0`` — the SQL mirror of
    ``operators.similarity._lloyd_rounds`` (ROW_NUMBER over
    (int dist, c) == Spark's min(struct); FLOOR(CAST(sum AS DOUBLE)/n)
    == Spark's floor-of-double-division — see the v7 banner)."""
    dist = (
        f"list_sum(list_transform(range(1, {sub} + 1), "
        "i -> (e.vq[i] - cb.cq[i]) * (e.vq[i] - cb.cq[i])))"
    )
    mean_elems = ", ".join(
        f"CAST(FLOOR(CAST(SUM(vq[{i + 1}]) AS DOUBLE) / COUNT(*)) AS BIGINT)"
        for i in range(sub)
    )
    parts = []
    for r in range(1, n_iter + 1):
        parts.append(
            f"""{pfx}a{r} AS (
    SELECT id, j, vq, c FROM (
        SELECT e.id, e.j, e.vq, cb.c,
               ROW_NUMBER() OVER (PARTITION BY e.id, e.j
                   ORDER BY {dist} ASC, cb.c ASC) AS rn
        FROM {e} e JOIN {pfx}c{r - 1} cb ON cb.j = e.j
    ) WHERE rn = 1
),
{pfx}m{r} AS (
    SELECT j, c, list_value({mean_elems}) AS cq
    FROM {pfx}a{r} GROUP BY 1, 2
),
{pfx}c{r} AS MATERIALIZED (
    SELECT p.j, p.c, COALESCE(m.cq, p.cq) AS cq
    FROM {pfx}c{r - 1} p
    LEFT JOIN {pfx}m{r} m ON m.j = p.j AND m.c = p.c
)"""
        )
    return parts


def _ivfpq_sql() -> str:
    """Unrolled exact-grain IVF-PQ oracle (see V8 banner)."""
    s = V8_SCALE
    cdist = (
        "list_sum(list_transform(range(1, 64 + 1), "
        "i -> (g.vq[i] - co.ccq[i]) * (g.vq[i] - co.ccq[i])))"
    )
    pq_dist = (
        f"list_sum(list_transform(range(1, {V8_SUB} + 1), "
        "i -> (e2.vq[i] - cb.cq[i]) * (e2.vq[i] - cb.cq[i])))"
    )
    per_j = ",\n           ".join(
        f"SUM(CASE WHEN j = {j} THEN lutv END) AS p{j}"
        for j in range(V8_M)
    )
    sum_pj = " + ".join(["qc"] + [f"p{j}" for j in range(V8_M)])
    parts = [
        f"""WITH g AS MATERIALIZED (
    SELECT vec_id AS id,
           list_transform(range(1, 64 + 1),
               i -> CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * {s}.0)
                         AS BIGINT)) AS vq
    FROM embeddings
),
e1 AS MATERIALIZED (SELECT id, CAST(0 AS BIGINT) AS j, vq FROM g),
kcc0 AS MATERIALIZED (
    SELECT j, id AS c, vq AS cq FROM e1 WHERE id < {V8_COARSE_K}
)"""
    ]
    parts.extend(_lloyd_cte_rounds("e1", "kc", 64, V8_CITER))
    parts.append(
        f"""coarse AS MATERIALIZED (
    SELECT c AS cell, cq AS ccq FROM kcc{V8_CITER}
),
asg AS MATERIALIZED (
    SELECT id, cell,
           list_transform(range(1, 64 + 1), i -> vq[i] - ccq[i]) AS rq
    FROM (
        SELECT g.id, co.cell, g.vq, co.ccq,
               ROW_NUMBER() OVER (PARTITION BY g.id
                   ORDER BY {cdist} ASC, co.cell ASC) AS rn
        FROM g, coarse co
    ) WHERE rn = 1
),
e2 AS MATERIALIZED (
    SELECT id, CAST(u.j AS BIGINT) AS j,
           rq[CAST(u.j * {V8_SUB} + 1 AS BIGINT) :
              CAST((u.j + 1) * {V8_SUB} AS BIGINT)] AS vq
    FROM asg, UNNEST(range({V8_M})) AS u(j)
),
pqc0 AS MATERIALIZED (
    SELECT j, id AS c, vq AS cq FROM e2 WHERE id < {V8_KCENT}
)"""
    )
    parts.extend(_lloyd_cte_rounds("e2", "pq", V8_SUB, V8_PITER))
    parts.append(
        f"""pqcb AS MATERIALIZED (SELECT j, c, cq FROM pqc{V8_PITER}),
codes AS MATERIALIZED (
    SELECT x.id AS neighbor_id, x.j, x.c, a.cell
    FROM (
        SELECT id, j, c FROM (
            SELECT e2.id, e2.j, cb.c,
                   ROW_NUMBER() OVER (PARTITION BY e2.id, e2.j
                       ORDER BY {pq_dist} ASC, cb.c ASC) AS rn
            FROM e2 JOIN pqcb cb ON cb.j = e2.j
        ) WHERE rn = 1
    ) x JOIN asg a ON a.id = x.id
),
probes AS (
    SELECT query_id, cell, qc FROM (
        SELECT g.id AS query_id, co.cell,
               CAST(list_sum(list_transform(range(1, 64 + 1),
                   i -> g.vq[i] * co.ccq[i])) AS BIGINT) AS qc,
               ROW_NUMBER() OVER (PARTITION BY g.id
                   ORDER BY {cdist} ASC, co.cell ASC) AS rn
        FROM g, coarse co
        WHERE g.id < {N_QUERY_VECS}
    ) WHERE rn <= {V8_NPROBE}
),
qsub AS (
    SELECT id AS query_id, CAST(u.j AS BIGINT) AS j,
           vq[CAST(u.j * {V8_SUB} + 1 AS BIGINT) :
              CAST((u.j + 1) * {V8_SUB} AS BIGINT)] AS qs
    FROM g, UNNEST(range({V8_M})) AS u(j)
    WHERE id < {N_QUERY_VECS}
),
lut AS (
    SELECT q.query_id, q.j, cb.c,
           CAST(list_sum(list_transform(range(1, {V8_SUB} + 1),
               i -> q.qs[i] * cb.cq[i])) AS BIGINT) AS lutv
    FROM qsub q JOIN pqcb cb ON cb.j = q.j
),
cand AS (
    SELECT p.query_id, co.neighbor_id, co.j, l.lutv, p.qc
    FROM codes co
    JOIN probes p ON p.cell = co.cell
    JOIN lut l ON l.query_id = p.query_id
              AND l.j = co.j AND l.c = co.c
    WHERE co.neighbor_id <> p.query_id
),
adc AS (
    SELECT query_id, neighbor_id, CAST(MIN(qc) AS BIGINT) AS qc,
           {per_j}
    FROM cand GROUP BY 1, 2
),
nsq AS MATERIALIZED (
    SELECT vec_id,
           CAST(list_sum(list_transform(range(1, 64 + 1),
               i -> CAST(FLOOR(CAST(embedding[i] AS DOUBLE)
                               * CAST(embedding[i] AS DOUBLE)
                               * {V8_NSQ_SCALE}.0) AS BIGINT)))
               AS BIGINT) AS n2
    FROM embeddings
),
scored0 AS (
    SELECT a.query_id, a.neighbor_id,
           CASE WHEN nc.n2 <= 0 OR nq.n2 <= 0 THEN 0.0
                ELSE CAST(({sum_pj}) AS DOUBLE)
                     / (sqrt(CAST(nc.n2 AS DOUBLE))
                        * sqrt(CAST(nq.n2 AS DOUBLE))) END AS adc_score
    FROM adc a
    JOIN nsq nc ON nc.vec_id = a.neighbor_id
    JOIN nsq nq ON nq.vec_id = a.query_id
),
short AS (
    SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY adc_score DESC,
                                           neighbor_id ASC) AS rn
        FROM scored0
    ) WHERE rn <= {TOPK} * {V8_EXPAND}
),
nfp AS MATERIALIZED (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           CAST(list_sum(list_transform(range(1, 64 + 1),
               i -> CAST(FLOOR(CAST(embedding[i] AS DOUBLE)
                               * CAST(embedding[i] AS DOUBLE)
                               * {V8_FP}.0) AS BIGINT)))
               AS BIGINT) AS nf
    FROM embeddings
),
scored AS (
    SELECT sh.query_id, sh.neighbor_id,
           CASE WHEN qv.nf <= 0 OR cv.nf <= 0 THEN 0.0
                ELSE CAST(CAST(list_sum(list_transform(range(1, 64 + 1),
                         i -> CAST(FLOOR(qv.v[i] * cv.v[i] * {V8_FP}.0)
                                   AS BIGINT))) AS BIGINT) AS DOUBLE)
                     / (sqrt(CAST(qv.nf AS DOUBLE))
                        * sqrt(CAST(cv.nf AS DOUBLE))) END AS sim
    FROM short sh
    JOIN nfp cv ON cv.vec_id = sh.neighbor_id
    JOIN nfp qv ON qv.vec_id = sh.query_id
)"""
    )
    body = ",\n".join(parts)
    return (
        body
        + f"""
SELECT query_id, neighbor_id, sim FROM (
    SELECT query_id, neighbor_id, sim,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, neighbor_id ASC) AS rn
    FROM scored
) WHERE rn <= {TOPK}"""
    )


V8_SQL = _ivfpq_sql()


# ---------------------------------------------------------------------------
# V9 — HYBRID retrieval via reciprocal-rank fusion: the lexical and
# semantic top-k lists for the same query documents, fused score-free
# with RRF (operators/similarity.rrf_fuse) — the standard production
# retrieval combiner (BM25-family lists + ANN lists have incomparable
# score scales; ranks are the only safe common currency). Semantic
# list: v1's brute-force cosine over the aligned embeddings table.
# Lexical list: exact distinct-token Jaccard against the query docs
# via an inverted-index join — the QUERY token side is tiny (the
# retrieval batch) and broadcasts, so candidates are
# O(docs sharing a token with some query), never all pairs, and the
# fact side shuffles once for the (query, doc) intersection count.
# Both lists rank on ROUNDED similarity with id tie-break (the v1
# doctrine), so every fused rrf value is an exact function of integer
# ranks and replays bit-identically cross-engine.
# ---------------------------------------------------------------------------

V9_LIST_K = 10
V9_TOPK = 5
V9_K_RRF = 60


def _lexical_jaccard_topk(
    spark: SparkSession, sf_dir: str, n_queries: int, k: int
) -> DataFrame:
    from big_data_flight_analytics_spark.operators.text import tokens

    docs = load(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    # ONE tokenize pass (r16): the old shape referenced the exploded
    # token frame three times (sizes agg, query side, probe side), so
    # the corpus tokenize+array_distinct+explode lineage executed
    # multiple times and the per-doc sizes came back through two extra
    # joins. Carrying the set size ALONGSIDE the explode (8 bytes per
    # posting row, map-side only) lets the one (query, doc) aggregate
    # collect intersection count and both sizes together — same
    # integers, same Jaccard, one corpus pass, one shuffle.
    arr = docs.select(
        "doc_id",
        F.array_distinct(
            F.filter(tokens("text"), lambda x: x != "")
        ).alias("__arr"),
    )
    tok = arr.select(
        "doc_id",
        F.size("__arr").cast("long").alias("__sz"),
        F.explode("__arr").alias("__t"),
    )
    q_tok = tok.filter(F.col("doc_id") < n_queries).select(
        F.col("doc_id").alias("query_id"),
        F.col("__sz").alias("__qsz"),
        "__t",
    )
    inter = (
        tok.join(F.broadcast(q_tok), "__t")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__i"),
            F.first("__qsz").alias("__qsz"),
            F.first("__sz").alias("__sz"),
        )
    )
    scored = inter.select(
        "query_id",
        F.col("doc_id").alias("neighbor_id"),
        F.round(
            F.col("__i")
            / (F.col("__qsz") + F.col("__sz") - F.col("__i")),
            4,
        ).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def v9_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.similarity import (
        rrf_fuse,
    )

    emb = load(spark, sf_dir, "embeddings")
    sem = brute_force_topk(
        emb, emb.filter(F.col("vec_id") < N_QUERY_VECS), k=V9_LIST_K
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    sem_ranked = sem.withColumn(
        "rank", F.row_number().over(w).cast("long")
    )
    lex_ranked = _lexical_jaccard_topk(
        spark, sf_dir, N_QUERY_VECS, V9_LIST_K
    )
    return rrf_fuse(
        [sem_ranked, lex_ranked], k=V9_TOPK, k_rrf=V9_K_RRF
    )


# the full lexical+semantic+fusion CTE chain, shared verbatim by the
# v9 entry and the v11 retrieval-composition oracle (ending at
# ``final``: per-query fused candidates with exact integer-rank rrf)
_V9_CTES = f"""
WITH q AS (
    SELECT vec_id AS query_id, embedding AS qv FROM embeddings
    WHERE vec_id < {N_QUERY_VECS}
), sem_scored AS (
    SELECT q.query_id,
           e.vec_id AS neighbor_id,
           CASE WHEN sqrt(list_dot_product(q.qv, q.qv))
                       * sqrt(list_dot_product(e.embedding, e.embedding)) = 0
                  THEN 0.0 ELSE ROUND(
             list_dot_product(q.qv, e.embedding) /
             (sqrt(list_dot_product(q.qv, q.qv))
              * sqrt(list_dot_product(e.embedding, e.embedding))), 4) END
               AS sim
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> q.query_id
), sem_ranked AS (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, neighbor_id ASC) AS rank
    FROM sem_scored
), tok AS (
    SELECT doc_id, UNNEST(list_distinct(list_filter(
               regexp_split_to_array(trim(lower(text)), '\\s+'),
               x -> x <> ''))) AS t
    FROM documents WHERE text IS NOT NULL
), sizes AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM tok GROUP BY 1
), inter AS (
    SELECT qt.doc_id AS query_id, dt.doc_id,
           CAST(COUNT(*) AS BIGINT) AS i
    FROM tok dt JOIN (SELECT * FROM tok WHERE doc_id < {N_QUERY_VECS}) qt
      ON dt.t = qt.t AND dt.doc_id <> qt.doc_id
    GROUP BY 1, 2
), lex_scored AS (
    SELECT i.query_id, i.doc_id AS neighbor_id,
           ROUND(CAST(i.i AS DOUBLE) / (qs.sz + ds.sz - i.i), 4) AS sim
    FROM inter i
    JOIN sizes qs ON qs.doc_id = i.query_id
    JOIN sizes ds ON ds.doc_id = i.doc_id
), lex_ranked AS (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, neighbor_id ASC) AS rank
    FROM lex_scored
), lists AS (
    SELECT query_id, neighbor_id, 1.0 / ({V9_K_RRF} + rank) AS c
    FROM sem_ranked WHERE rank <= {V9_LIST_K}
    UNION ALL
    SELECT query_id, neighbor_id, 1.0 / ({V9_K_RRF} + rank) AS c
    FROM lex_ranked WHERE rank <= {V9_LIST_K}
), fused AS (
    SELECT query_id, neighbor_id, SUM(c) AS rrf,
           CAST(COUNT(*) AS BIGINT) AS n_lists
    FROM lists GROUP BY 1, 2
), final AS (
    SELECT query_id, neighbor_id, rrf, n_lists,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY rrf DESC, neighbor_id ASC)
                AS BIGINT) AS rank
    FROM fused
)"""

V9_SQL = (
    _V9_CTES
    + f"""
SELECT query_id, neighbor_id, ROUND(rrf, 6) AS rrf, n_lists, rank
FROM final WHERE rank <= {V9_TOPK}
"""
)


# ---------------------------------------------------------------------------
# I2 — incremental dedup maintenance: the persisted fingerprint index
# absorbs one new ingest batch with O(delta) work (delta-only shuffle +
# one join against the index; the index never re-shuffles when stored
# bucketed by fingerprint). The catalog entry deterministically splits
# documents into a 90% "already indexed" corpus and a 10% arrival
# batch; the oracle restates the same assignment rule from scratch, so
# the delta path must be invisible in the result — the same contract as
# i1's algebraic-partials merge.
# ---------------------------------------------------------------------------


def i2_dedup_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.incremental import (
        dedup_delta,
        dedup_index,
    )

    docs = load(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 10 != 0)
    delta = docs.filter(F.col("doc_id") % 10 == 0)
    assignments, _updated = dedup_delta(dedup_index(base), delta)
    return assignments.select(
        "doc_id", "fingerprint", "canonical_doc_id", "dup_of_index"
    )


I2_SQL = r"""
WITH fp AS (
    SELECT doc_id,
           md5(trim(regexp_replace(lower(COALESCE(text, '')), '\s+', ' ', 'g')))
               AS fingerprint
    FROM documents
), delta AS (
    SELECT * FROM fp WHERE doc_id % 10 = 0
), base_idx AS (
    SELECT fingerprint, MIN(doc_id) AS base_canonical
    FROM fp WHERE doc_id % 10 <> 0 GROUP BY 1
), delta_min AS (
    SELECT fingerprint, MIN(doc_id) AS delta_canonical
    FROM delta GROUP BY 1
)
SELECT d.doc_id,
       d.fingerprint,
       LEAST(COALESCE(b.base_canonical, dm.delta_canonical),
             dm.delta_canonical) AS canonical_doc_id,
       b.base_canonical IS NOT NULL AS dup_of_index
FROM delta d
JOIN delta_min dm USING (fingerprint)
LEFT JOIN base_idx b USING (fingerprint)
"""


# ---------------------------------------------------------------------------
# T15 — BPE merge learning under the full oracle gate: the first K
# merge rules learned from the documents corpus (tokenizer training —
# the model-state half of an LLM data pipeline). The merge table is a
# pure, partition-invariant function of the corpus (ties break on
# count desc, pair lexicographic — pinned by TestBpe), so the hash
# gate applies. The oracle unrolls the K greedy rounds as chained
# CTEs; the within-word left-to-right merge is expressed as a string
# replace over individually-sep-wrapped symbols ("\x1fa\x1f\x1fb\x1f"
# -> "\x1fab\x1f"), which scans left-to-right without overlap — the
# exact semantics of the Arrow-batched merge in operators/bpe.py.
# min_count=1 here so both engines always complete K rounds (the
# early-stop is exercised in pytest).
# ---------------------------------------------------------------------------

BPE_MERGES = 10


def _bpe_merge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge table as a (tiny) DataFrame stage — shared
    between t15 (the table IS the result) and t16 (tokenization with
    it), so a single-pass catalog run learns once. The table is
    driver-side model state; framing it lets the generic ``stage()``
    seam cache it like any other shared stage."""
    from big_data_flight_analytics_spark.operators.bpe import (
        learn_bpe_merges,
    )

    def build() -> DataFrame:
        docs = load(spark, sf_dir, "documents")
        merges = learn_bpe_merges(docs, BPE_MERGES, min_count=1)
        return spark.createDataFrame(
            [(i + 1, a, b) for i, (a, b) in enumerate(merges)],
            schema="merge_rank int, sym_a string, sym_b string",
        )

    return stage(("bpe_merges", sf_dir, BPE_MERGES), build)


def t15_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _bpe_merge_table(spark, sf_dir)


def _bpe_rounds(k: int = BPE_MERGES) -> list:
    """The shared CTE chain (v0 + k greedy rounds) both BPE oracles
    compose: ``_bpe_sql`` (the t15 merge table) and ``_bpe_apply_sql``
    (tokenization with the learned table)."""
    parts = [
        """WITH v0 AS MATERIALIZED (
  SELECT chr(31) || array_to_string(list_append(string_split(w, ''), '</w>'),
                                    chr(31)||chr(31)) || chr(31) AS ws,
         COUNT(*) AS freq
  FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
        FROM documents) t
  WHERE w <> ''
  GROUP BY 1
)"""
    ]
    for i in range(1, k + 1):
        p = i - 1
        parts.append(
            f"""p{i} AS (
  SELECT l[idx] AS a, l[idx + 1] AS b, SUM(freq) AS n
  FROM (SELECT freq, string_split(trim(ws, chr(31)), chr(31)||chr(31)) AS l
        FROM v{p}) s,
       UNNEST(generate_series(1, len(l) - 1)) AS u(idx)
  GROUP BY 1, 2
),
t{i} AS (SELECT a, b FROM p{i} ORDER BY n DESC, a ASC, b ASC LIMIT 1),
v{i} AS MATERIALIZED (
  SELECT replace(ws, chr(31)||t.a||chr(31)||chr(31)||t.b||chr(31),
                 chr(31)||t.a||t.b||chr(31)) AS ws, freq
  FROM v{p}, t{i} t
)"""
        )
    return parts


def _bpe_sql(k: int = BPE_MERGES) -> str:
    """Unrolled greedy BPE as chained DuckDB CTEs (see T15 banner)."""
    body = ",\n".join(_bpe_rounds(k))
    finals = "\nUNION ALL\n".join(
        f"SELECT {i} AS merge_rank, a AS sym_a, b AS sym_b FROM t{i}"
        for i in range(1, k + 1)
    )
    return body + "\n" + finals


def _bpe_apply_sql(k: int = BPE_MERGES, as_string: bool = False) -> str:
    """BPE apply-side oracle: tokenize documents with the K merges the
    round chain just learned — per-doc token arrays in word order plus
    counts, mirroring ``operators.bpe.tokenize_with_merges``.

    Docs whose text yields no words keep a row with an empty token
    array (LEFT JOIN back to documents), matching the operator.

    ``as_string=True`` (the T16 catalog form, round 9) emits the token
    list joined with ' ' instead of the raw LIST column: the driver's
    pandas canonicalizer cannot sort list-typed columns (r8 `err` row —
    ``TypeError: unhashable type: 'list'``), so catalog outputs must
    stay scalar. The join is lossless for the hash gate (tokens never
    contain whitespace: words are split on \\s+ first). The array form
    remains for the pytest differential (TestBpeApplyOracle) and
    library callers.
    """
    parts = list(_bpe_rounds(k))
    parts.append(
        """words AS (
    SELECT doc_id, w, idx FROM (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w,
               generate_subscripts(
                   regexp_split_to_array(trim(lower(text)), '\\s+'), 1
               ) AS idx
        FROM documents)
    WHERE w <> ''
),
a0 AS (
    SELECT doc_id, idx,
           chr(31) || array_to_string(
               list_append(string_split(w, ''), '</w>'),
               chr(31)||chr(31)) || chr(31) AS ws
    FROM words
)"""
    )
    for i in range(1, k + 1):
        parts.append(
            f"""a{i} AS (
    SELECT w.doc_id, w.idx,
           replace(w.ws, chr(31)||t.a||chr(31)||chr(31)||t.b||chr(31),
                   chr(31)||t.a||t.b||chr(31)) AS ws
    FROM a{i - 1} w, t{i} t
)"""
        )
    parts.append(
        f"""toks AS (
    SELECT doc_id,
           flatten(list(string_split(trim(ws, chr(31)), chr(31)||chr(31))
                        ORDER BY idx)) AS bpe_tokens
    FROM a{k} GROUP BY doc_id
)"""
    )
    body = ",\n".join(parts)
    token_col = (
        "array_to_string(COALESCE(t.bpe_tokens, []), ' ') AS tokens"
        if as_string
        else "COALESCE(t.bpe_tokens, []) AS bpe_tokens"
    )
    return (
        body
        + f"""
SELECT d.doc_id,
       {token_col},
       CAST(COALESCE(len(t.bpe_tokens), 0) AS BIGINT) AS n_bpe_tokens
FROM documents d LEFT JOIN toks t USING (doc_id)"""
    )


T15_SQL = _bpe_sql()


# ---------------------------------------------------------------------------
# T16 — BPE apply side (tokenization) under the full oracle gate: the
# production-volume half — learn the K-merge table (same chain as
# t15), then tokenize every document with it. Spark side is the
# Arrow-batched map-only ``tokenize_with_merges`` (merge table ships
# by closure, per-batch word memoization, zero shuffle — the pass
# that runs at corpus scale); oracle is the pre-validated
# ``_bpe_apply_sql`` replace chain (TestBpeApplyOracle differential,
# r7). Promotion per VERDICT r7 #6.
#
# Catalog output is SCALAR-only (round 9): the driver's pandas
# canonicalizer crashes on list columns, so the entry projects
# array_join(bpe_tokens, ' ') — lossless for the hash gate since
# tokens never contain whitespace. Library callers keep the array
# form via tokenize_with_merges directly.
# ---------------------------------------------------------------------------


def t16_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.bpe import (
        tokenize_with_merges,
    )

    # ten-row model-state collect (the merge table), not a data funnel
    merges = [
        (r["sym_a"], r["sym_b"])
        for r in _bpe_merge_table(spark, sf_dir)
        .orderBy("merge_rank")
        .collect()
    ]
    return tokenize_with_merges(
        load(spark, sf_dir, "documents"), merges
    ).select(
        "doc_id",
        F.array_join("bpe_tokens", " ").alias("tokens"),
        "n_bpe_tokens",
    )


T16_SQL = _bpe_apply_sql(as_string=True)


# ---------------------------------------------------------------------------
# T27 — tokenizer FERTILITY report: BPE tokens per whitespace word,
# per source — the standard tokenizer-QA number (a tokenizer trained
# on one distribution "over-fragments" another; fertility per slice
# is how that is caught before training). Composes the t15 merge
# table -> t16 corpus tokenization -> per-source ratio; integer token
# sums, one map-only tokenize pass + one tiny hash agg. The oracle
# replays the full learned-BPE chain (the t16 oracle as a nested CTE)
# and re-derives the ratio — so the gate certifies the tokenizer, the
# word count, AND the report arithmetic agree end-to-end.
# ---------------------------------------------------------------------------


def t27_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    merges = [
        (r["sym_a"], r["sym_b"])
        for r in _bpe_merge_table(spark, sf_dir)
        .orderBy("merge_rank")
        .collect()
    ]
    # ONE definition of the accounting: t27 is i15's state over the
    # whole corpus plus the shared report projection — a drifted copy
    # here would silently diverge the i15 differential (review r15)
    return _fertility_report(_fertility_state(docs, merges))


T27_SQL = rf"""
WITH bpe AS (
{_bpe_apply_sql(as_string=True)}
), words AS (
    SELECT doc_id, source,
           CAST(len(list_filter(
               regexp_split_to_array(trim(lower(COALESCE(text, ''))), '\s+'),
               x -> x <> '')) AS BIGINT) AS n_words
    FROM documents
)
SELECT w.source,
       CAST(SUM(b.n_bpe_tokens) AS BIGINT) AS n_bpe,
       CAST(SUM(w.n_words) AS BIGINT) AS n_words,
       CASE WHEN SUM(w.n_words) > 0
            THEN ROUND(CAST(SUM(b.n_bpe_tokens) AS DOUBLE)
                       / SUM(w.n_words), 4) END AS fertility
FROM bpe b JOIN words w USING (doc_id)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# V10 — MMR diversified rerank (Carbonell & Goldstein 1998): after the
# ANN family answers "what is nearest", MMR answers "what is nearest
# WITHOUT redundancy" — greedy k-step selection maximizing
# lam*sim(q,d) - (1-lam)*max_selected sim(d,s). Fixed-step unroll, so
# the oracle replays the greedy loop as CTE layers (the Lloyd /
# perceptron doctrine applied to retrieval); all sims are v1-rounded,
# lam is a tenths integer, ties break on item id. Frames past the one
# corpus scoring pass are retrieval-batch-sized.
# ---------------------------------------------------------------------------

V10_N_CANDS = 8
V10_K = 3
V10_LAM_TENTHS = 5


def v10_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.similarity import (
        mmr_rerank,
    )

    emb = load(spark, sf_dir, "embeddings")
    return mmr_rerank(
        emb,
        emb.filter(F.col("vec_id") < N_QUERY_VECS),
        n_candidates=V10_N_CANDS,
        k=V10_K,
        lam_tenths=V10_LAM_TENTHS,
    )


def _mmr_sql_tail(k: int, lam_tenths: int) -> str:
    """The k-step MMR greedy unroll as CTE layers, shared by v10 and
    the v11 retrieval composition. Assumes two CTEs are in scope:
    ``cands(query_id, neighbor_id, sim)`` — sim is whatever relevance
    the caller ranks by — and ``pairs(query_id, a, b, sab)`` — the
    candidate-pair redundancy sims. Emits ``, s1 AS (...)...`` plus
    the final UNION ALL select."""
    lam = lam_tenths / 10.0
    oml = (10 - lam_tenths) / 10.0
    s1 = f""", s1 AS (
    SELECT query_id, neighbor_id, CAST(1 AS BIGINT) AS step,
           ROUND({lam} * sim, 6) AS score
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY sim DESC, neighbor_id ASC)
            AS rn
        FROM cands
    ) WHERE rn = 1
)"""
    steps = []
    for i in range(2, k + 1):
        prev_sel = " UNION ALL ".join(
            f"SELECT query_id, neighbor_id FROM s{j}" for j in range(1, i)
        )
        steps.append(f""", sel{i} AS (
    {prev_sel}
), r{i} AS (
    SELECT c.* FROM cands c
    LEFT JOIN sel{i} s ON s.query_id = c.query_id
                      AND s.neighbor_id = c.neighbor_id
    WHERE s.neighbor_id IS NULL
), p{i} AS (
    SELECT r.query_id, r.neighbor_id, MAX(p.sab) AS pen
    FROM r{i} r
    JOIN pairs p ON p.query_id = r.query_id AND p.a = r.neighbor_id
    JOIN sel{i} s ON s.query_id = p.query_id AND s.neighbor_id = p.b
    GROUP BY 1, 2
), s{i} AS (
    SELECT query_id, neighbor_id, CAST({i} AS BIGINT) AS step,
           ROUND(score0, 6) AS score
    FROM (
        SELECT r.query_id, r.neighbor_id,
               {lam} * r.sim - {oml} * p.pen AS score0,
               ROW_NUMBER() OVER (
                   PARTITION BY r.query_id
                   ORDER BY {lam} * r.sim - {oml} * p.pen DESC,
                            r.neighbor_id ASC) AS rn
        FROM r{i} r
        JOIN p{i} p ON p.query_id = r.query_id
                   AND p.neighbor_id = r.neighbor_id
    ) WHERE rn = 1
)""")
    tail = "\nSELECT * FROM s1" + "".join(
        f"\nUNION ALL SELECT * FROM s{i}" for i in range(2, k + 1)
    )
    return s1 + "".join(steps) + tail


# v1-doctrine 4dp cosine between two embedding-carrying aliases —
# shared by the v10 and v11 oracles
_COS_TMPL = """
           CASE WHEN sqrt(list_dot_product({l}.embedding, {l}.embedding))
                       * sqrt(list_dot_product({r}.embedding, {r}.embedding)) = 0
                  THEN 0.0 ELSE ROUND(
             list_dot_product({l}.embedding, {r}.embedding) /
             (sqrt(list_dot_product({l}.embedding, {l}.embedding))
              * sqrt(list_dot_product({r}.embedding, {r}.embedding))), 4) END
"""


def _v10_sql() -> str:
    cos = _COS_TMPL
    head = f"""
WITH q AS (
    SELECT vec_id AS query_id, embedding FROM embeddings
    WHERE vec_id < {N_QUERY_VECS}
), scored AS (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           {cos.format(l='q', r='e')} AS sim
    FROM embeddings e CROSS JOIN q
    WHERE e.vec_id <> q.query_id
), cands AS (
    SELECT query_id, neighbor_id, sim FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY sim DESC, neighbor_id ASC)
            AS rn
        FROM scored
    ) WHERE rn <= {V10_N_CANDS}
), pairs AS (
    SELECT c1.query_id, c1.neighbor_id AS a, c2.neighbor_id AS b,
           {cos.format(l='e1', r='e2')} AS sab
    FROM cands c1
    JOIN cands c2 ON c1.query_id = c2.query_id
                 AND c1.neighbor_id <> c2.neighbor_id
    JOIN embeddings e1 ON e1.vec_id = c1.neighbor_id
    JOIN embeddings e2 ON e2.vec_id = c2.neighbor_id
)"""
    return head + _mmr_sql_tail(V10_K, V10_LAM_TENTHS)


V10_SQL = _v10_sql()


# ---------------------------------------------------------------------------
# V11 — the END-TO-END retrieval composition (judge ask r15 #6): the
# pieces v9 and v10 gate separately are chained into ONE hash-gated
# entry — lexical Jaccard list + semantic cosine list (the v9 stages,
# called through the same functions) -> reciprocal-rank fusion
# (rrf_fuse, the v9 combiner) -> MMR diversified rerank
# (mmr_rerank_candidates, the v10 greedy core). The proof is the
# INTERFACES: fusion decides relevance (per-query min-max-normalized
# rrf, 4dp — rrf and cosine live on incomparable scales, so the fused
# score is normalized into the penalty's [0, 1] before MMR mixes
# them), embeddings decide only the redundancy penalty, and the oracle
# replays the full chain off the shared v9 CTE text + the shared MMR
# step generator. All frames downstream of the corpus-wide list
# builds are retrieval-batch-sized (queries x k), so the composition
# adds no corpus rescans to what v9 already pays.
# ---------------------------------------------------------------------------

V11_N_CANDS = 8
V11_K = 3
V11_LAM_TENTHS = 5


def v11_retrieval_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.similarity import (
        mmr_rerank_candidates,
        rrf_fuse,
    )

    emb = load(spark, sf_dir, "embeddings")
    sem = brute_force_topk(
        emb, emb.filter(F.col("vec_id") < N_QUERY_VECS), k=V9_LIST_K
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    sem_ranked = sem.withColumn(
        "rank", F.row_number().over(w).cast("long")
    )
    lex_ranked = _lexical_jaccard_topk(
        spark, sf_dir, N_QUERY_VECS, V9_LIST_K
    )
    fused = rrf_fuse(
        [sem_ranked, lex_ranked], k=V11_N_CANDS, k_rrf=V9_K_RRF
    )
    # fusion decides relevance: per-query min-max normalization puts
    # the rrf score on the penalty cosine's [0, 1] scale (all-equal
    # rrf degenerates to 1.0 — pure-diversity selection)
    wq = Window.partitionBy("query_id")
    lo = F.min("rrf").over(wq)
    hi = F.max("rrf").over(wq)
    rel = fused.select(
        "query_id",
        "neighbor_id",
        F.when(hi == lo, F.lit(1.0))
        .otherwise(F.round((F.col("rrf") - lo) / (hi - lo), 4))
        .alias("sim"),
    )
    return mmr_rerank_candidates(
        rel, emb, k=V11_K, lam_tenths=V11_LAM_TENTHS
    )


def _v11_sql() -> str:
    head = (
        _V9_CTES
        + f""", fusedc AS (
    SELECT query_id, neighbor_id, ROUND(rrf, 6) AS rrf
    FROM final WHERE rank <= {V11_N_CANDS}
), cands AS (
    SELECT query_id, neighbor_id,
           CASE WHEN mx = mn THEN 1.0
                ELSE ROUND((rrf - mn) / (mx - mn), 4) END AS sim
    FROM (
        SELECT query_id, neighbor_id, rrf,
               MIN(rrf) OVER (PARTITION BY query_id) AS mn,
               MAX(rrf) OVER (PARTITION BY query_id) AS mx
        FROM fusedc
    )
), pairs AS (
    SELECT c1.query_id, c1.neighbor_id AS a, c2.neighbor_id AS b,
           {_COS_TMPL.format(l='e1', r='e2')} AS sab
    FROM cands c1
    JOIN cands c2 ON c1.query_id = c2.query_id
                 AND c1.neighbor_id <> c2.neighbor_id
    JOIN embeddings e1 ON e1.vec_id = c1.neighbor_id
    JOIN embeddings e2 ON e2.vec_id = c2.neighbor_id
)"""
    )
    return head + _mmr_sql_tail(V11_K, V11_LAM_TENTHS)


V11_SQL = _v11_sql()


# ---------------------------------------------------------------------------
# I15 — incremental tokenizer fertility: t27 maintained under ingest.
# The per-source (n_bpe, n_words) sums are ADDITIVE over disjoint doc
# batches GIVEN A FROZEN MERGE TABLE — the t20/s10 model-state
# contract: the tokenizer is model state trained once; what folds is
# the corpus accounting. The entry freezes t27's own merge table,
# computes the state on an 80% base and a 20% arrival batch
# separately, full-outer-sums them, and re-derives the report; the
# oracle is t27's from-scratch SQL, so the delta path must be
# invisible (the i1 contract). No dedicated streaming sink: the fold
# class (additive sums, marker-guarded) is exactly s20's
# DatasetCardSink — a fertility sink would be a mechanical clone, so
# the streaming face is deliberately not duplicated.
# ---------------------------------------------------------------------------


def _fertility_state(docs: DataFrame, merges) -> DataFrame:
    from big_data_flight_analytics_spark.operators.bpe import (
        tokenize_with_merges,
    )

    bpe = tokenize_with_merges(docs, merges).select(
        "doc_id", "n_bpe_tokens"
    )
    toks = F.filter(
        F.split(
            F.trim(F.lower(F.coalesce(F.col("text"), F.lit("")))), r"\s+"
        ),
        lambda x: x != "",
    )
    words = docs.select(
        "doc_id", "source", F.size(toks).cast("long").alias("n_words")
    )
    return (
        bpe.join(words, "doc_id")
        .groupBy("source")
        .agg(
            F.sum("n_bpe_tokens").cast("long").alias("n_bpe"),
            F.sum("n_words").cast("long").alias("n_words"),
        )
    )


def _fertility_fold(base: DataFrame, delta: DataFrame) -> DataFrame:
    b = base.select(
        "source",
        F.col("n_bpe").alias("__b1"),
        F.col("n_words").alias("__b2"),
    )
    d = delta.select(
        "source",
        F.col("n_bpe").alias("__d1"),
        F.col("n_words").alias("__d2"),
    )
    z = F.lit(0).cast("long")
    return b.join(d, "source", "full").select(
        "source",
        (F.coalesce("__b1", z) + F.coalesce("__d1", z)).alias("n_bpe"),
        (F.coalesce("__b2", z) + F.coalesce("__d2", z)).alias("n_words"),
    )


def _fertility_report(state: DataFrame) -> DataFrame:
    """The shared (source, n_bpe, n_words, fertility) projection both
    t27 and i15 emit — zero-word sources report NULL fertility."""
    return state.select(
        "source",
        "n_bpe",
        "n_words",
        F.when(
            F.col("n_words") > 0,
            F.round(F.col("n_bpe") / F.col("n_words"), 4),
        ).alias("fertility"),
    )


def i15_fertility_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.cache import tracked_persist

    docs = load(spark, sf_dir, "documents")
    # frozen model state: the SAME merge table t27 uses (trained once)
    merges = [
        (r["sym_a"], r["sym_b"])
        for r in _bpe_merge_table(spark, sf_dir)
        .orderBy("merge_rank")
        .collect()
    ]
    base = _fertility_state(docs.filter(F.col("doc_id") % 5 != 0), merges)
    delta = _fertility_state(docs.filter(F.col("doc_id") % 5 == 0), merges)
    folded = _fertility_fold(
        tracked_persist(base), tracked_persist(delta)
    )
    return _fertility_report(folded)


I15_SQL = T27_SQL


# ---------------------------------------------------------------------------
# T17 — BM25 retrieval under the full oracle gate: top-k documents for
# a fixed query term set, the search-side capability the corpus
# catalog lacked (TF-IDF t4 profiles documents; this RANKS them for a
# query). Scoring is exact-grain end to end — the tf normalization is
# an exact int64 rational (multiplied through by 1000*S), idf is
# LN on identical exact-int ratios FLOOR-ed at a coarse grain (the
# driver-proven T4 pattern), and the score sum is pure integer
# arithmetic — so ranking can never flip across engines or versions.
# Plan: scan + one-row broadcast agg + map + TakeOrderedAndProject;
# zero posting-list shuffles (see operators/text.py::bm25_topk).
# ---------------------------------------------------------------------------

BM25_TERMS = ("spark", "join", "window", "dup")
BM25_TOPK = 10
BM25_GRAIN = 1_000_000


def t17_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.text import bm25_topk

    docs = load(spark, sf_dir, "documents")
    return bm25_topk(docs, list(BM25_TERMS), k=BM25_TOPK, grain=BM25_GRAIN)


def _bm25_sql() -> str:
    """Mirror of bm25_topk's exact-grain arithmetic in plain CTE SQL
    (no correlated subqueries — the r8 form-robustness doctrine)."""
    g = BM25_GRAIN
    tf_cols = ",\n           ".join(
        f"CAST(len(list_filter(t, x -> x = '{term}')) AS BIGINT) AS tf{i}"
        for i, term in enumerate(BM25_TERMS)
    )
    df_cols = ",\n           ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(BM25_TERMS))
    )
    score_terms = " + ".join(
        f"((tf{i} * 2200 * s_tokens * {g}) // "
        f"(1000 * s_tokens * tf{i} + 300 * s_tokens + 900 * dl * n_docs))"
        f" * CAST(FLOOR({g} * LN(CAST(2 * n_docs + 2 AS DOUBLE) / "
        f"CAST(2 * df{i} + 1 AS DOUBLE))) AS BIGINT)"
        for i in range(len(BM25_TERMS))
    )
    matched = " + ".join(
        f"CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END"
        for i in range(len(BM25_TERMS))
    )
    return rf"""
WITH tok AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                       x -> x <> '') AS t
    FROM documents
    WHERE text IS NOT NULL AND trim(text) <> ''
), per_doc AS (
    SELECT doc_id,
           {tf_cols},
           CAST(len(t) AS BIGINT) AS dl
    FROM tok
), totals AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(dl) AS BIGINT) AS s_tokens,
           {df_cols}
    FROM per_doc
), scored AS (
    SELECT doc_id,
           CAST({matched} AS BIGINT) AS matched,
           dl,
           CAST({score_terms} AS BIGINT) AS score_fp
    FROM per_doc CROSS JOIN totals
)
SELECT doc_id, matched, dl, score_fp
FROM scored WHERE matched > 0
ORDER BY score_fp DESC, doc_id
LIMIT {BM25_TOPK}
"""


T17_SQL = _bm25_sql()


# ---------------------------------------------------------------------------
# T18 — DSIR importance weights under the full oracle gate (Xie et
# al., NeurIPS 2023: Data Selection via Importance Resampling). Every
# document scored by the add-one-smoothed log likelihood ratio of its
# hashed-bigram profile between a TARGET domain (source='src0') and
# the RAW corpus — the standard "make the corpus look like the target
# domain" selection signal. All ranking-relevant arithmetic is exact:
# md5-bucketed features (the t2/t6/d3 hash family, bit-identical
# cross-engine), int64 bucket counts, FLOOR(grain*LN(exact-int
# ratio)) weights, integer per-doc sums. Plan: one bigram explode,
# one 256-bucket map-combined agg, O(256) weight broadcast, one
# per-doc agg (see operators/sampling.py::dsir_weights).
# ---------------------------------------------------------------------------

DSIR_TARGET = "src0"
DSIR_BUCKETS = 256
DSIR_GRAIN = 1_000_000


def t18_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.sampling import (
        dsir_weights,
    )

    docs = load(spark, sf_dir, "documents")
    return dsir_weights(
        docs, DSIR_TARGET, n_buckets=DSIR_BUCKETS, grain=DSIR_GRAIN
    )


def _dsir_sql() -> str:
    # md5 hex -> int via ascii arithmetic (same decode as t2/t6/d3)
    digit = (
        "(CASE WHEN ascii(substr(h, {i}, 1)) < 58"
        " THEN ascii(substr(h, {i}, 1)) - 48"
        " ELSE ascii(substr(h, {i}, 1)) - 87 END)"
    )
    expr = digit.format(i=1)
    for t in range(1, 4):
        expr = f"({expr} * 16 + {digit.format(i=1 + t)})"
    g, b = DSIR_GRAIN, DSIR_BUCKETS
    return rf"""
WITH tok AS (
    SELECT doc_id, source,
           list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                       x -> x <> '') AS t
    FROM documents
    WHERE text IS NOT NULL AND trim(text) <> ''
), grams AS (
    SELECT doc_id, source,
           md5(unnest(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i + 1]))) AS h
    FROM tok
), bucketed AS (
    SELECT doc_id, source, {expr} % {b} AS bucket FROM grams
), bc AS (
    SELECT bucket,
           SUM(CASE WHEN source = '{DSIR_TARGET}' THEN 1 ELSE 0 END) AS cnt_t,
           COUNT(*) AS cnt_r
    FROM bucketed GROUP BY bucket
), tot AS (
    SELECT CAST(SUM(cnt_t) AS BIGINT) AS s_t,
           CAST(SUM(cnt_r) AS BIGINT) AS s_r
    FROM bc
), w AS (
    SELECT bucket,
           CAST(FLOOR({g} * LN(
               CAST((cnt_t + 1) * (s_r + {b}) AS DOUBLE)
               / CAST((cnt_r + 1) * (s_t + {b}) AS DOUBLE))) AS BIGINT)
           AS w_fp
    FROM bc CROSS JOIN tot
)
SELECT doc_id, source,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(w_fp) AS BIGINT) AS dsir_fp
FROM bucketed JOIN w USING (bucket)
GROUP BY doc_id, source
"""


T18_SQL = _dsir_sql()


# ---------------------------------------------------------------------------
# T19 — self-trained bigram-LM perplexity scoring under the full
# oracle gate (round 9): the CCNet-style quality filter (Wenzek et
# al. 2020 — LM perplexity against the corpus register) the text
# family lacked: t3/t8 score surface stats, t18 reweights toward a
# target; this scores each document by how UNLIKE the corpus its
# token transitions are (add-one bigram NLL). All rank-deciding sums
# are exact int64 over FLOOR-grained log-probs (the driver-proven
# T4/T17 LN-on-exact-int-ratios pattern). Plan: one bigram explode ->
# per-(doc,a,b) multiplicities; the c2/c1 model tables derive from
# that frame and rejoin on their own keys (vocabulary-sized, NOT
# pinned broadcast — at 100 TB they are co-partitioned shuffle
# joins); V is a one-row broadcast scalar.
# ---------------------------------------------------------------------------

T19_GRAIN = 1_000_000


def t19_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.text import (
        bigram_lm_score,
    )

    return bigram_lm_score(
        load(spark, sf_dir, "documents"), grain=T19_GRAIN
    )


def _lm_perplexity_sql() -> str:
    g = T19_GRAIN
    return rf"""
WITH tok AS MATERIALIZED (
    SELECT doc_id,
           list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                       x -> x <> '') AS t
    FROM documents
    WHERE text IS NOT NULL AND trim(text) <> ''
), pair AS MATERIALIZED (
    SELECT doc_id, a, b, CAST(COUNT(*) AS BIGINT) AS m
    FROM (
        SELECT doc_id, t[i] AS a, t[i + 1] AS b
        FROM tok, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
        WHERE len(t) >= 2
    )
    GROUP BY 1, 2, 3
), c2 AS (
    SELECT a, b, CAST(SUM(m) AS BIGINT) AS c2 FROM pair GROUP BY 1, 2
), c1 AS (
    SELECT a, CAST(SUM(m) AS BIGINT) AS c1 FROM pair GROUP BY 1
), vocab AS (
    SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v
    FROM (SELECT unnest(t) AS w FROM tok)
), scored AS (
    SELECT p.doc_id,
           CAST(SUM(p.m) AS BIGINT) AS n_bigrams,
           CAST(-SUM(p.m * CAST(FLOOR({g} * LN(
                    CAST(c2.c2 + 1 AS DOUBLE)
                    / CAST(c1.c1 + vocab.v AS DOUBLE))) AS BIGINT))
                AS BIGINT) AS nll_fp
    FROM pair p
    JOIN c2 ON c2.a = p.a AND c2.b = p.b
    JOIN c1 ON c1.a = p.a
    CROSS JOIN vocab
    GROUP BY 1
)
SELECT d.doc_id,
       CAST(COALESCE(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(s.nll_fp, 0) AS BIGINT) AS nll_fp,
       CAST(CASE WHEN COALESCE(s.n_bigrams, 0) > 0
                 THEN s.nll_fp // s.n_bigrams ELSE 0 END
            AS BIGINT) AS avg_nll_fp
FROM documents d LEFT JOIN scored s USING (doc_id)
"""


T19_SQL = _lm_perplexity_sql()


# ---------------------------------------------------------------------------
# D18 — cluster-scoped SemDeDup under the full oracle gate (Abbas et
# al. 2023, arXiv:2303.09540 — the paper's actual k-means-cluster
# formulation; d13 is the sign-LSH-scoped variant). Exact-grain Lloyd
# k-means (the v7/v8 trainer with m=1) clusters the embedding space;
# cosine near-dups are sought only within each cluster; the transitive
# lowest-id keep-rule marks the pruned set. Every rank/membership
# decision is engine-version-independent: integer Lloyd distances with
# struct-min ties, FLOOR(double-division) centroid updates, and
# fixed-point cosine (int64 grain dot + exact-int norms) against the
# threshold. The oracle replays training as unrolled CTE rounds
# (shared _lloyd_cte_rounds) and must land on the identical clustering
# and pair set — that is what puts a trained-clustering dedup pass
# under the hash gate.
# ---------------------------------------------------------------------------

D18_K = 16
D18_ITER = 3
D18_SCALE = 10**6


def d18_semdedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.similarity import (
        semdedup_kmeans,
    )

    return semdedup_kmeans(
        load(spark, sf_dir, "embeddings"),
        k=D18_K,
        n_iter=D18_ITER,
        threshold=NEARDUP_SIM,
        scale=D18_SCALE,
        fp_scale=SIM_FP_SCALE,
    )


def _semdedup_sql() -> str:
    s, fp, k, r = D18_SCALE, SIM_FP_SCALE, D18_K, D18_ITER
    dist = (
        "list_sum(list_transform(range(1, 64 + 1), "
        "i -> (e.vq[i] - cb.cq[i]) * (e.vq[i] - cb.cq[i])))"
    )
    parts = [
        f"""WITH g AS MATERIALIZED (
    SELECT vec_id AS id,
           list_transform(range(1, 64 + 1),
               i -> CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * {s}.0)
                         AS BIGINT)) AS vq
    FROM embeddings
),
e1 AS MATERIALIZED (SELECT id, CAST(0 AS BIGINT) AS j, vq FROM g),
kmc0 AS MATERIALIZED (
    SELECT j, id AS c, vq AS cq FROM e1 WHERE id < {k}
)"""
    ]
    parts.extend(_lloyd_cte_rounds("e1", "km", 64, r))
    parts.append(
        f"""cells AS MATERIALIZED (
    SELECT id, cell FROM (
        SELECT e.id, cb.c AS cell,
               ROW_NUMBER() OVER (PARTITION BY e.id
                   ORDER BY {dist} ASC, cb.c ASC) AS rn
        FROM e1 e JOIN kmc{r} cb ON cb.j = e.j
    ) WHERE rn = 1
),
v AS MATERIALIZED (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
           CAST(list_sum(list_transform(
               range(1, len(embedding) + 1),
               i -> CAST(FLOOR(CAST(embedding[i] AS DOUBLE)
                               * CAST(embedding[i] AS DOUBLE)
                               * {fp}.0) AS BIGINT)))
               AS BIGINT) AS nsq
    FROM embeddings
),
pruned AS (
    SELECT DISTINCT pb.id AS pid
    FROM cells pa JOIN cells pb
      ON pa.cell = pb.cell AND pa.id < pb.id
    JOIN v a ON a.vec_id = pa.id
    JOIN v b ON b.vec_id = pb.id
    WHERE CASE WHEN a.nsq <= 0 OR b.nsq <= 0 THEN 0.0
               ELSE CAST(CAST(list_sum(list_transform(
                        range(1, len(a.emb) + 1),
                        i -> CAST(FLOOR(a.emb[i] * b.emb[i]
                                        * {fp}.0) AS BIGINT)))
                        AS BIGINT) AS DOUBLE)
                    / (sqrt(CAST(a.nsq AS DOUBLE))
                       * sqrt(CAST(b.nsq AS DOUBLE)))
          END >= {NEARDUP_SIM}
)"""
    )
    body = ",\n".join(parts)
    return (
        body
        + """
SELECT c.id AS vec_id, c.cell, (p.pid IS NOT NULL) AS pruned
FROM cells c LEFT JOIN pruned p ON p.pid = c.id"""
    )


D18_SQL = _semdedup_sql()


# ---------------------------------------------------------------------------
# I3 — incremental embedding dedup under the full oracle gate: the i2
# ingest contract (persisted index absorbs one arriving batch with
# O(delta) work) in embedding space. Documents-style 80/20 split of
# the embeddings table: the 80% base acts as the persisted sign-LSH
# index (bucket scheme fixed by the BASE count — the index's scheme,
# not the union's), the 20% delta is the arrival batch; every delta
# vector is marked against the lowest base vector in its bucket with
# fixed-point cosine >= threshold. All rank/membership arithmetic is
# exact (sign buckets, int64 grain dot/norms — the d18/v4 doctrine).
# Plan: base map-side signatures + broadcast delta + one small agg —
# the base never shuffles (at 100 TB it is stored bucketed by the
# bucket id), which is what makes per-batch ingest dedup affordable.
# ---------------------------------------------------------------------------


def i3_embedding_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.similarity import (
        embedding_index_delta,
    )

    emb = load(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 0)
    delta = emb.filter(F.col("vec_id") % 5 == 0)
    return embedding_index_delta(
        base,
        delta,
        threshold=NEARDUP_SIM,
        target_bucket_size=NEARDUP_TARGET_BUCKET,
        fp_scale=SIM_FP_SCALE,
        probes=NEARDUP_PROBES,
    )


# Two disjoint index windows (probes=2, round 9 — the measured
# dominant config: recall 0.194 -> 0.369 at ~2x candidate volume,
# DEDUP_QUALITY.md). cand UNIONs the per-window equi-joins (dedupe
# before scoring, mirroring the operator); MIN over the unioned
# qualifying set is window-order-independent.
I3_SQL = f"""
WITH params AS (
    SELECT GREATEST(1, CAST(CEIL(LOG2(GREATEST(
               COUNT(*) / {NEARDUP_TARGET_BUCKET}.0, 2.0))) AS INTEGER)) AS bits
    FROM embeddings WHERE vec_id % 5 <> 0
), sig AS MATERIALIZED (
    -- MATERIALIZED: referenced four times; DuckDB would otherwise
    -- inline and recompute the signature transforms per reference
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
           CAST(list_sum(list_transform(
               range(1, len(embedding) + 1),
               i -> CAST(FLOOR(CAST(embedding[i] AS DOUBLE)
                               * CAST(embedding[i] AS DOUBLE)
                               * {SIM_FP_SCALE}.0) AS BIGINT)))
               AS BIGINT) AS nsq,
           list_sum(list_transform(range(1, bits + 1),
               i -> CASE WHEN embedding[i] > 0
                         THEN (1 << (bits - i)) ELSE 0 END)) AS bucket0,
           list_sum(list_transform(range(1, bits + 1),
               i -> CASE WHEN embedding[bits + i] > 0
                         THEN (1 << (bits - i)) ELSE 0 END)) AS bucket1
    FROM embeddings, params
), cand AS (
    -- dedupe cross-window pairs on the ID pair only (arrays rejoin
    -- after), mirroring the operator's dropDuplicates-before-score
    SELECT d.vec_id AS did, b.vec_id AS bid
    FROM sig d JOIN sig b ON b.bucket0 = d.bucket0
    WHERE d.vec_id % 5 = 0 AND b.vec_id % 5 <> 0
    UNION
    SELECT d.vec_id, b.vec_id
    FROM sig d JOIN sig b ON b.bucket1 = d.bucket1
    WHERE d.vec_id % 5 = 0 AND b.vec_id % 5 <> 0
), m AS (
    SELECT did AS vec_id, MIN(bid) AS matched_base_id
    FROM cand JOIN sig d ON d.vec_id = cand.did
              JOIN sig b ON b.vec_id = cand.bid
    WHERE CASE WHEN b.nsq <= 0 OR d.nsq <= 0 THEN 0.0
               ELSE CAST(CAST(list_sum(list_transform(
                        range(1, len(b.emb) + 1),
                        i -> CAST(FLOOR(b.emb[i] * d.emb[i]
                                        * {SIM_FP_SCALE}.0) AS BIGINT)))
                        AS BIGINT) AS DOUBLE)
                    / (sqrt(CAST(b.nsq AS DOUBLE))
                       * sqrt(CAST(d.nsq AS DOUBLE)))
          END >= {NEARDUP_SIM}
    GROUP BY 1
)
SELECT d.vec_id, m.matched_base_id,
       m.matched_base_id IS NOT NULL AS dup_of_index
FROM (SELECT vec_id FROM embeddings WHERE vec_id % 5 = 0) d
LEFT JOIN m ON m.vec_id = d.vec_id
"""


# ---------------------------------------------------------------------------
# I4 — incremental MinHash near-dup ingest under the full oracle gate
# (round 9): the last member of the ingest trio — i2 marks arriving
# docs against an exact-fingerprint index, i3 against an embedding
# sign-LSH index, i4 against a MinHash BAND index (text-Jaccard
# near-dups, the Lee et al. 2022 dedup regime at ingest time). Same
# 80/20 split contract as i3. MinHash parameters are data-independent,
# so base and delta sign separately yet agree exactly with joint
# signing — which is what lets the base postings persist as the index.
# The hot-bucket cap applies to the BASE side only (bucket population
# is an index-build-time property). Plan: delta postings broadcast
# into the (at scale, band_key-bucketed) base postings; exact-Jaccard
# verify touches only candidate ids; one small agg. O(delta) per
# batch, the base never rescans.
# ---------------------------------------------------------------------------


def i4_minhash_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.dedup import (
        minhash_index_delta,
    )

    docs = load(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 5 != 0)
    delta = docs.filter(F.col("doc_id") % 5 == 0)
    return minhash_index_delta(
        base,
        delta,
        threshold=JACCARD_THRESHOLD,
        max_band_df=MAX_BAND_DF,
    )


def _i4_sql() -> str:
    return rf"""
WITH {_minhash_sig_ctes()}, bsmall AS (
    SELECT band_key FROM bands WHERE doc_id % 5 <> 0
    GROUP BY band_key HAVING COUNT(*) <= {MAX_BAND_DF}
), cand AS (
    SELECT DISTINCT b.doc_id AS doc_a, d.doc_id AS doc_b
    FROM bands b JOIN bsmall USING (band_key)
                 JOIN bands d ON d.band_key = b.band_key
    WHERE b.doc_id % 5 <> 0 AND d.doc_id % 5 = 0
), verified AS (
    SELECT doc_a, doc_b,
           ROUND(
               len(list_intersect(sa.shingles, sb.shingles)) * 1.0 /
               (len(sa.shingles) + len(sb.shingles)
                - len(list_intersect(sa.shingles, sb.shingles))), 4) AS jaccard
    FROM cand
    JOIN ne sa ON sa.doc_id = doc_a
    JOIN ne sb ON sb.doc_id = doc_b
), m AS (
    SELECT doc_b AS doc_id, MIN(doc_a) AS matched_base_id
    FROM verified WHERE jaccard >= {JACCARD_THRESHOLD}
    GROUP BY 1
)
SELECT d.doc_id, m.matched_base_id,
       m.matched_base_id IS NOT NULL AS dup_of_index
FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) d
LEFT JOIN m USING (doc_id)
"""


I4_SQL = _i4_sql()


# ---------------------------------------------------------------------------
# D19 — sparse tf-idf cosine pairs (operators/dedup.sparse_cosine_pairs).
# The sparse-VECTOR similarity join: complements d2 (set Jaccard — ignores
# term frequency), d4 (SimHash — lossy projection) and d5 (dense embedding
# cosine). Terms are 3-gram PHRASES with multiplicity: the synthetic corpus
# has only ~31 distinct unigrams (every doc contains nearly every word, so
# unigram idf carries zero signal — the boilerplate-corpus shape the
# operator docstring calls out); the trigram space is ~27k terms at sf0.1
# with max df 25. The cosine distribution is strongly bimodal (background
# <= ~0.10, planted near-dups >= ~0.98), so THRESHOLD=0.5 sits in the gap
# and membership is decided far from any double-rounding boundary.
# max_df mirrors d2's MAX_SHINGLE_DF ethos: hot phrases are dropped from
# CANDIDATE GENERATION only (cosine is then exact over full vectors), so
# the cap is a recall-only lever and the oracle mirrors it exactly.
# ---------------------------------------------------------------------------

D19_NGRAM = 3
D19_GRAIN = 100
D19_MAX_DF = 10
D19_COS_THRESHOLD = 0.5


def d19_sparse_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.dedup import (
        sparse_cosine_pairs,
    )

    return sparse_cosine_pairs(
        load(spark, sf_dir, "documents"),
        threshold=D19_COS_THRESHOLD,
        grain=D19_GRAIN,
        max_df=D19_MAX_DF,
        ngram=D19_NGRAM,
    )


# Mirror of sparse_cosine_pairs. idf_fp = FLOOR(grain *
# LN((N+1)/(df+1))) + grain on exact-int inputs (the t17/t18/t19 LN
# doctrine); weights and all dot/norm sums are int64 (< 2^62 by the
# in-plan guard, so DuckDB's HUGEINT accumulation and Spark's int64
# agree exactly); the final cosine is correctly-rounded IEEE double
# ops on exact ints (the v4 pattern) — bit-identical cross-engine.
# The gram expression and its range bound are BOTH derived from
# D19_NGRAM (ADVICE r10: a hardcoded trigram expansion would silently
# desync from the Spark plan if the constant moved).
_D19_GRAM_EXPR = " || ' ' || ".join(f"t[i + {k}]" for k in range(D19_NGRAM))
D19_SQL = rf"""
WITH toks AS (
    SELECT doc_id,
           regexp_split_to_array(trim(lower(text)), '\s+') AS t
    FROM documents
), grams AS (
    SELECT doc_id, unnest(CASE WHEN len(t) >= {D19_NGRAM} THEN
        list_transform(range(1, len(t) - {D19_NGRAM - 2}),
            i -> {_D19_GRAM_EXPR})
        ELSE [] END) AS term
    FROM toks
), tf AS (
    -- term identity = 60-bit md5 slice, mirroring the Spark plan's
    -- feature hashing (collisions merge identically in both engines)
    SELECT doc_id,
           CAST(('0x' || substring(md5(term), 1, 15)) AS BIGINT) AS term,
           COUNT(*) AS tf
    FROM grams WHERE term != '' GROUP BY 1, 2
), dfq AS (
    SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
), nd AS (
    SELECT COUNT(*) AS n_docs FROM documents
), idf AS (
    SELECT term,
           CAST(FLOOR({D19_GRAIN} * LN((n_docs + 1) * 1.0 / (df + 1)))
                AS BIGINT) + {D19_GRAIN} AS idf_fp
    FROM dfq, nd
), weights AS (
    SELECT doc_id, tf.term, CAST(tf * idf_fp AS BIGINT) AS w
    FROM tf JOIN idf ON tf.term = idf.term
), norms AS (
    SELECT doc_id, CAST(SUM(w * w) AS BIGINT) AS nsq
    FROM weights GROUP BY 1
), rare AS (
    SELECT term FROM weights GROUP BY term HAVING COUNT(*) <= {D19_MAX_DF}
), capped AS (
    SELECT doc_id, term FROM weights JOIN rare USING (term)
), cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM capped a JOIN capped b ON a.term = b.term AND a.doc_id < b.doc_id
), dots AS (
    SELECT doc_a, doc_b, CAST(SUM(wa.w * wb.w) AS BIGINT) AS dot
    FROM cand
    JOIN weights wa ON wa.doc_id = doc_a
    JOIN weights wb ON wb.doc_id = doc_b AND wb.term = wa.term
    GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(dot AS DOUBLE) /
       (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE))) AS cos
FROM dots
JOIN norms na ON na.doc_id = doc_a
JOIN norms nb ON nb.doc_id = doc_b
WHERE CAST(dot AS DOUBLE) /
      (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE)))
      >= {D19_COS_THRESHOLD}
"""


EXTENSION_QUERIES = {
    "t1_text_stats": t1_text_stats,
    "t15_bpe_merges": t15_bpe_merges,
    "t16_bpe_tokenize": t16_bpe_tokenize,
    "t17_bm25_topk": t17_bm25_topk,
    "t18_dsir_weights": t18_dsir_weights,
    "t19_lm_perplexity": t19_lm_perplexity,
    "d18_semdedup_clusters": d18_semdedup_clusters,
    "i3_embedding_delta": i3_embedding_delta,
    "i4_minhash_delta": i4_minhash_delta,
    "d19_sparse_cosine": d19_sparse_cosine,
    "i2_dedup_delta": i2_dedup_delta,
    "t3_gopher_metrics": t3_gopher_metrics,
    "t4_tfidf_top_terms": t4_tfidf_top_terms,
    "t5_ngram_counts": t5_ngram_counts,
    "t6_stratified_sample": t6_stratified_sample,
    "t7_winnow_fingerprints": t7_winnow_fingerprints,
    "t8_source_quality": t8_source_quality,
    "t9_pii_scrub": t9_pii_scrub,
    "t10_mixture_sample": t10_mixture_sample,
    "t11_pack_sequences": t11_pack_sequences,
    "t12_rare_token_score": t12_rare_token_score,
    "t13_chunk_documents": t13_chunk_documents,
    "t14_lexical_diversity": t14_lexical_diversity,
    "d12_keep_longest": d12_keep_longest,
    "d9_cross_source_overlap": d9_cross_source_overlap,
    "d10_winnow_jaccard": d10_winnow_jaccard,
    "d1_exact_dedup": d1_exact_dedup,
    "d11_paragraph_dedup": d11_paragraph_dedup,
    "d2_ngram_jaccard": d2_ngram_jaccard,
    "d3_minhash_lsh": d3_minhash_lsh,
    "d4_simhash": d4_simhash,
    "v1_cosine_topk": v1_cosine_topk,
    "v2_lsh_topk": v2_lsh_topk,
    "d5_embedding_neardup": d5_embedding_neardup,
    "v4_knn_graph": v4_knn_graph,
    "v5_quantized_topk": v5_quantized_topk,
    "v6_pq_topk": v6_pq_topk,
    "v7_pq_trained_topk": v7_pq_trained_topk,
    "v8_ivfpq_topk": v8_ivfpq_topk,
    "v9_rrf_fusion": v9_rrf_fusion,
    "v10_mmr_rerank": v10_mmr_rerank,
    "v11_retrieval_pipeline": v11_retrieval_pipeline,
    "g1_knn_pagerank": g1_knn_pagerank,
    "g2_knn_triangles": g2_knn_triangles,
    "d13_semantic_prune": d13_semantic_prune,
    "d14_dedup_ensemble": d14_dedup_ensemble,
    "d15_repeated_spans": d15_repeated_spans,
    "d16_excise_spans": d16_excise_spans,
    "d17_source_dedup_report": d17_source_dedup_report,
    "d6_dedup_clusters": d6_dedup_clusters,
    "d7_decontamination": d7_decontamination,
    "d20_containment_decon": d20_containment_decon,
    "d21_decon_excise": d21_decon_excise,
    "t20_langid": t20_langid,
    "d22_sketch_containment": d22_sketch_containment,
    "t21_perceptron_quality": t21_perceptron_quality,
    "i5_langid_profile_delta": i5_langid_profile_delta,
    "a11_histogram_quantiles": a11_histogram_quantiles,
    "i6_histogram_delta": i6_histogram_delta,
    "a12_grouped_quantiles": a12_grouped_quantiles,
    "a13_kmv_distinct": a13_kmv_distinct,
    "i7_kmv_delta": i7_kmv_delta,
    "a14_cms_heavy_terms": a14_cms_heavy_terms,
    "i8_cms_delta": i8_cms_delta,
    "j11_bloom_semi_join": j11_bloom_semi_join,
    "a15_sketch_overlap": a15_sketch_overlap,
    "t22_cdc_chunks": t22_cdc_chunks,
    "d23_cdc_dedup": d23_cdc_dedup,
    "j12_fuzzy_match": j12_fuzzy_match,
    "a16_quantile_binning": a16_quantile_binning,
    "a17_grouped_cms": a17_grouped_cms,
    "a18_join_size_estimate": a18_join_size_estimate,
    "t23_leakage_safe_split": t23_leakage_safe_split,
    "t24_corpus_assembly": t24_corpus_assembly,
    "j13_advised_semi_join": j13_advised_semi_join,
    "t25_dataset_card": t25_dataset_card,
    "i12_dataset_card_delta": i12_dataset_card_delta,
    "t26_boilerplate_excision": t26_boilerplate_excision,
    "i13_boilerplate_delta": i13_boilerplate_delta,
    "j15_geo_radius_counts": j15_geo_radius_counts,
    "j16_geo_nearest_k": j16_geo_nearest_k,
    "i14_geo_count_delta": i14_geo_count_delta,
    "t27_tokenizer_fertility": t27_tokenizer_fertility,
    "i15_fertility_delta": i15_fertility_delta,
    "d8_curated_corpus": d8_curated_corpus,
    "m1_multimodal_features": m1_multimodal_features,
    "m2_frame_sample": m2_frame_sample,
    "m3_frame_dedup": m3_frame_dedup,
}

EXTENSION_ORACLES = {
    "t1_text_stats": T1_SQL,
    "t15_bpe_merges": T15_SQL,
    "t16_bpe_tokenize": T16_SQL,
    "t17_bm25_topk": T17_SQL,
    "t18_dsir_weights": T18_SQL,
    "t19_lm_perplexity": T19_SQL,
    "d18_semdedup_clusters": D18_SQL,
    "i3_embedding_delta": I3_SQL,
    "i4_minhash_delta": I4_SQL,
    "d19_sparse_cosine": D19_SQL,
    "i2_dedup_delta": I2_SQL,
    "t3_gopher_metrics": T3_SQL,
    "t4_tfidf_top_terms": T4_SQL,
    "t5_ngram_counts": T5_SQL,
    "t6_stratified_sample": T6_SQL,
    "t7_winnow_fingerprints": T7_SQL,
    "t8_source_quality": T8_SQL,
    "t9_pii_scrub": T9_SQL,
    "t10_mixture_sample": T10_SQL,
    "t11_pack_sequences": T11_SQL,
    "t12_rare_token_score": T12_SQL,
    "t13_chunk_documents": T13_SQL,
    "t14_lexical_diversity": T14_SQL,
    "d12_keep_longest": D12_SQL,
    "d9_cross_source_overlap": D9_SQL,
    "d10_winnow_jaccard": D10_SQL,
    "d1_exact_dedup": D1_SQL,
    "d11_paragraph_dedup": D11_SQL,
    "d2_ngram_jaccard": D2_SQL,
    "d3_minhash_lsh": D3_SQL,
    "d4_simhash": D4_SQL,
    "v1_cosine_topk": V1_SQL,
    "v2_lsh_topk": V2_SQL,
    "d5_embedding_neardup": D5_SQL,
    "v4_knn_graph": V4_SQL,
    "g1_knn_pagerank": G1_SQL,
    "g2_knn_triangles": G2_SQL,
    "v5_quantized_topk": V5_SQL,
    "v6_pq_topk": V6_SQL,
    "v7_pq_trained_topk": V7_SQL,
    "v8_ivfpq_topk": V8_SQL,
    "d13_semantic_prune": D13_SQL,
    "d14_dedup_ensemble": D14_SQL,
    "d15_repeated_spans": D15_SQL,
    "d16_excise_spans": D16_SQL,
    "d17_source_dedup_report": D17_SQL,
    "d6_dedup_clusters": D6_SQL,
    "d7_decontamination": D7_SQL,
    "d20_containment_decon": D20_SQL,
    "d21_decon_excise": D21_SQL,
    "t20_langid": T20_SQL,
    "d22_sketch_containment": D22_SQL,
    "t21_perceptron_quality": T21_SQL,
    "i5_langid_profile_delta": I5_LANGID_SQL,
    "a11_histogram_quantiles": A11_SQL,
    "i6_histogram_delta": A11_SQL,
    "a12_grouped_quantiles": A12_SQL,
    "a13_kmv_distinct": A13_SQL,
    "i7_kmv_delta": I7_KMV_SQL,
    "a14_cms_heavy_terms": A14_SQL,
    "i8_cms_delta": I8_CMS_SQL,
    "j11_bloom_semi_join": J11_SQL,
    "a15_sketch_overlap": A15_SQL,
    "t22_cdc_chunks": T22_SQL,
    "d23_cdc_dedup": D23_SQL,
    "j12_fuzzy_match": J12_SQL,
    "a16_quantile_binning": A16_SQL,
    "a17_grouped_cms": A17_SQL,
    "a18_join_size_estimate": A18_SQL,
    "t23_leakage_safe_split": T23_SQL,
    "t24_corpus_assembly": T24_SQL,
    "j13_advised_semi_join": J13_SQL,
    "v9_rrf_fusion": V9_SQL,
    "v10_mmr_rerank": V10_SQL,
    "v11_retrieval_pipeline": V11_SQL,
    "j15_geo_radius_counts": J15_SQL,
    "j16_geo_nearest_k": J16_SQL,
    "i14_geo_count_delta": I14_SQL,
    "t27_tokenizer_fertility": T27_SQL,
    "i15_fertility_delta": I15_SQL,
    "t25_dataset_card": T25_SQL,
    "i12_dataset_card_delta": T25_SQL,
    "t26_boilerplate_excision": T26_SQL,
    "i13_boilerplate_delta": T26_SQL,
    "d8_curated_corpus": D8_SQL,
    "m1_multimodal_features": M1_SQL,
    "m2_frame_sample": M2_SQL,
    "m3_frame_dedup": M3_SQL,
}


# ---------------------------------------------------------------------------
# T28 — per-source n-gram novelty (operators/text.source_ngram_novelty):
# what fraction of each source's distinct trigram vocabulary exists
# nowhere else in the corpus. Gram-level counterpart of d9's pair-level
# cross-source overlap; O(sources) output, both heavy shuffles keyed on
# the gram hash.
# ---------------------------------------------------------------------------


def t28_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.text import (
        source_ngram_novelty,
    )

    docs = load(spark, sf_dir, "documents")
    return source_ngram_novelty(docs, n=NGRAM_N)


T28_SQL = rf"""
WITH toks AS (
    SELECT source, regexp_split_to_array(trim(lower(text)), '\s+') AS t
    FROM documents
), grams AS (
    SELECT source,
           CASE WHEN len(t) >= {NGRAM_N} THEN
               list_transform(range(1, len(t) - {NGRAM_N - 2}),
                   i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])
           ELSE [] END AS g
    FROM toks
), pairs AS (
    SELECT DISTINCT source, unnest(g) AS gram FROM grams
), per_gram AS (
    SELECT gram, CAST(COUNT(*) AS BIGINT) AS n_sources
    FROM pairs GROUP BY gram
)
SELECT p.source,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN g.n_sources = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_exclusive,
       CAST(SUM(CASE WHEN g.n_sources = 1 THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS novelty
FROM pairs p JOIN per_gram g USING (gram)
GROUP BY 1
"""

EXTENSION_QUERIES["t28_ngram_novelty"] = t28_ngram_novelty
EXTENSION_ORACLES["t28_ngram_novelty"] = T28_SQL


# ---------------------------------------------------------------------------
# V12 — metadata-FILTERED vector search: top-k cosine among the
# embeddings whose paired document passes a metadata predicate
# (lang + min length) — the "filtered ANN" query every production
# vector store grows once documents carry attributes. Strategy here is
# PRE-FILTER: the predicate joins/prunes the corpus BEFORE any
# distance math, so the expensive part runs on the survivors only —
# the right posture whenever the predicate is selective and the right
# baseline always (exact over the filtered set is the recall oracle
# for any post-filter ANN variant; for low-selectivity predicates the
# scale alternative is the v3 IVF probe with over-fetch + post-filter,
# whose recall this entry would referee). The doc join is an equi-join
# on the id both sides carry; queries stay broadcast.
# ---------------------------------------------------------------------------

V12_LANG = "en"
V12_MIN_CHARS = 200


def v12_filtered_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    docs = load(spark, sf_dir, "documents")
    allowed = docs.filter(
        (F.col("lang") == V12_LANG) & (F.col("n_chars") >= V12_MIN_CHARS)
    ).select(F.col("doc_id").alias("vec_id"))
    corpus = emb.join(allowed, "vec_id")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return brute_force_topk(corpus, queries, k=TOPK)


V12_SQL = f"""
WITH allowed AS (
    SELECT doc_id AS vec_id FROM documents
    WHERE lang = '{V12_LANG}' AND n_chars >= {V12_MIN_CHARS}
), q AS (
    SELECT vec_id AS query_id, embedding AS qv FROM embeddings
    WHERE vec_id < {N_QUERY_VECS}
), scored AS (
    SELECT q.query_id,
           e.vec_id AS neighbor_id,
           CASE WHEN sqrt(list_dot_product(q.qv, q.qv))
                       * sqrt(list_dot_product(e.embedding, e.embedding)) = 0
                  THEN 0.0 ELSE ROUND(
             list_dot_product(q.qv, e.embedding) /
             (sqrt(list_dot_product(q.qv, q.qv))
              * sqrt(list_dot_product(e.embedding, e.embedding))), 4) END AS sim
    FROM embeddings e
    JOIN allowed USING (vec_id)
    CROSS JOIN q
    WHERE e.vec_id <> q.query_id
), ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, neighbor_id ASC) AS rn
    FROM scored
)
SELECT query_id, neighbor_id, sim FROM ranked WHERE rn <= {TOPK}
"""

EXTENSION_QUERIES["v12_filtered_ann"] = v12_filtered_ann
EXTENSION_ORACLES["v12_filtered_ann"] = V12_SQL


# ---------------------------------------------------------------------------
# I16 — incremental BM25 corpus stats (the t17 index's maintenance
# face): corpus statistics (n_docs, s_tokens, df per term) are plain
# int64 sums — the ADDITIVE fold class — so base + delta split stats
# fold into exactly the full-corpus stats, and scoring against the
# folded row must reproduce t17 bit-for-bit (same oracle). The per-doc
# frame is built ONCE (tokenization is the expensive pass) and both
# split stats derive from it; at 100 TB the fold is what lets an
# ingest pipeline keep BM25 idf/avgdl current per batch — O(batch)
# text work plus a two-row fold — instead of rescanning the corpus,
# with the scoring pass unchanged.
# ---------------------------------------------------------------------------


def i16_bm25_stats_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.cache import tracked_persist
    from big_data_flight_analytics_spark.operators.text import (
        bm25_per_doc,
        bm25_stats,
        bm25_stats_fold,
        bm25_topk,
    )

    docs = load(spark, sf_dir, "documents")
    per_doc = tracked_persist(bm25_per_doc(docs, list(BM25_TERMS)))
    n = len(BM25_TERMS)
    base = bm25_stats(per_doc.filter(F.col("doc_id") % 5 != 0), n)
    delta = bm25_stats(per_doc.filter(F.col("doc_id") % 5 == 0), n)
    folded = bm25_stats_fold(base, delta)
    return bm25_topk(
        docs,
        list(BM25_TERMS),
        k=BM25_TOPK,
        grain=BM25_GRAIN,
        totals=folded,
        per_doc=per_doc,
    )


EXTENSION_QUERIES["i16_bm25_stats_delta"] = i16_bm25_stats_delta
EXTENSION_ORACLES["i16_bm25_stats_delta"] = T17_SQL


# ---------------------------------------------------------------------------
# I17 — incremental per-source novelty (t28's maintenance face): the
# report's state is the distinct (gram, source) pair set — the
# SET-UNION fold class (i3/i4/i13's) — so base-split state UNION
# delta-split state, deduped, equals the full-corpus state and the
# report off the folded state must reproduce t28 bit-for-bit (same
# oracle). Per delta batch the work is O(batch) tokenization + one
# distinct against state; no full-corpus rescan.
# ---------------------------------------------------------------------------


def i17_novelty_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.text import (
        novelty_from_pairs,
        novelty_pairs,
    )

    docs = load(spark, sf_dir, "documents")
    base = novelty_pairs(docs.filter(F.col("doc_id") % 5 != 0), n=NGRAM_N)
    delta = novelty_pairs(docs.filter(F.col("doc_id") % 5 == 0), n=NGRAM_N)
    folded = base.unionByName(delta).distinct()
    return novelty_from_pairs(folded)


EXTENSION_QUERIES["i17_novelty_delta"] = i17_novelty_delta
EXTENSION_ORACLES["i17_novelty_delta"] = T28_SQL


# ---------------------------------------------------------------------------
# V13 — ANN recall referee, in-catalog: recall@k of the v2 sign-LSH
# bucketed search against the v1 exact list, per query. The
# DEDUP_QUALITY.md recall claims as an ORACLE-GATED entry: both lists
# are deterministic catalog queries, the overlap is an integer count
# and recall an int/int ratio, so the quality measurement itself
# hash-checks cross-engine. O(queries) output; cost is the two
# searches it referees (which share the corpus scan).
# ---------------------------------------------------------------------------


def v13_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.cache import once_checkpoint

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    # the exact list is referenced twice (n_exact agg + the overlap
    # join) and its lineage is the corpus x queries brute-force scorer
    # — eager checkpoint of the queries x k id pairs runs that scorer
    # once (r16); the approx list has a single consumer, left lazy
    exact = once_checkpoint(
        brute_force_topk(emb, queries, k=TOPK).select(
            "query_id", "neighbor_id"
        )
    )
    approx = lsh_bucketed_topk(
        emb, queries, k=TOPK, bits=LSH_BITS
    ).select("query_id", "neighbor_id")
    n_exact = exact.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact")
    )
    n_overlap = (
        exact.join(approx, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlap"))
    )
    return (
        n_exact.join(n_overlap, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce(F.col("n_overlap"), F.lit(0))
            .cast("long")
            .alias("n_overlap"),
        )
        .withColumn(
            "recall",
            F.col("n_overlap").cast("double")
            / F.col("n_exact").cast("double"),
        )
    )


V13_SQL = f"""
WITH exact AS (
    SELECT query_id, neighbor_id FROM ({V1_SQL})
), approx AS (
    SELECT query_id, neighbor_id FROM ({V2_SQL})
), ne AS (
    SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact
    FROM exact GROUP BY 1
), nov AS (
    SELECT e.query_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
    FROM exact e JOIN approx a
      ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
    GROUP BY 1
)
SELECT ne.query_id, ne.n_exact,
       CAST(COALESCE(nov.n_overlap, 0) AS BIGINT) AS n_overlap,
       CAST(COALESCE(nov.n_overlap, 0) AS DOUBLE)
           / CAST(ne.n_exact AS DOUBLE) AS recall
FROM ne LEFT JOIN nov ON ne.query_id = nov.query_id
"""

EXTENSION_QUERIES["v13_lsh_recall"] = v13_lsh_recall
EXTENSION_ORACLES["v13_lsh_recall"] = V13_SQL


# ---------------------------------------------------------------------------
# D24 — near-dup method referee (the v13 pattern aimed at dedup):
# precision/recall of d4's SimHash pair set against d2's n-gram
# Jaccard pair set as ground truth — DEDUP_QUALITY's method-agreement
# claims as an oracle-gated entry. All counts are integers over two
# deterministic pair sets (both already hash-verified), the ratios
# int/int; output is ONE row. Cost is the two pipelines it referees —
# and both are `stage()`-shared, so in a bench/pipeline pass the pair
# frames come from the shared stages d2/d4 already built.
# ---------------------------------------------------------------------------


def d24_simhash_referee(spark: SparkSession, sf_dir: str) -> DataFrame:
    jac = _jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    sim = d4_simhash(spark, sf_dir).select("doc_a", "doc_b")
    both = jac.join(sim, ["doc_a", "doc_b"])
    counts = (
        jac.agg(F.count(F.lit(1)).cast("long").alias("n_jaccard"))
        .crossJoin(
            sim.agg(F.count(F.lit(1)).cast("long").alias("n_simhash"))
        )
        .crossJoin(
            both.agg(F.count(F.lit(1)).cast("long").alias("n_both"))
        )
    )
    return counts.select(
        "n_jaccard",
        "n_simhash",
        "n_both",
        (
            F.col("n_both").cast("double")
            / F.col("n_simhash").cast("double")
        ).alias("precision"),
        (
            F.col("n_both").cast("double")
            / F.col("n_jaccard").cast("double")
        ).alias("recall"),
    )


D24_SQL = f"""
WITH jac AS (
    SELECT doc_a, doc_b FROM ({D2_SQL})
), sim AS (
    SELECT doc_a, doc_b FROM ({D4_SQL})
), b AS (
    SELECT j.doc_a, j.doc_b FROM jac j JOIN sim s
      ON j.doc_a = s.doc_a AND j.doc_b = s.doc_b
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM jac) AS n_jaccard,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM sim) AS n_simhash,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS n_both,
       CAST((SELECT COUNT(*) FROM b) AS DOUBLE)
           / CAST((SELECT COUNT(*) FROM sim) AS DOUBLE) AS precision,
       CAST((SELECT COUNT(*) FROM b) AS DOUBLE)
           / CAST((SELECT COUNT(*) FROM jac) AS DOUBLE) AS recall
"""

EXTENSION_QUERIES["d24_simhash_referee"] = d24_simhash_referee
EXTENSION_ORACLES["d24_simhash_referee"] = D24_SQL
