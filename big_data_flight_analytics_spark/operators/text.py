"""Document-level text analysis operators (training-data pipeline).

All native expressions over the ``documents`` table shape
(doc_id, text, ...). The per-document stats are linear per-partition
work with no shuffles — at 100 TB they run map-only over the scan. The
corpus-level operators (TF-IDF, n-gram counts) shuffle only on their
aggregation keys with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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


# PII scrub patterns (training-data hygiene). Written in the syntax
# subset Java regex (Spark) and RE2 (DuckDB oracle) share: no
# lookaround, no backrefs — the same literal pattern string runs in
# both engines. Replacement ordering matters: URLs first (an email-like
# userinfo inside a URL becomes part of <URL>), then emails, then long
# digit runs; the placeholder tokens contain no '@'/'/'/digits, so a
# later pass never re-matches an earlier replacement.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_URL_RE = r"(https?://|www\.)[^\s]+"
PII_DIGITS_RE = r"\d[\d\- ().]{5,}\d"


def scrub_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "clean_text"
) -> DataFrame:
    """Scrub emails, URLs, and long digit runs (phones/SSNs/cards).

    Adds ``out_col`` with matches replaced by ``<URL>``/``<EMAIL>``/
    ``<NUM>`` placeholders, plus per-type raw match counts
    (``n_emails``, ``n_urls``, ``n_digit_runs``) measured on the
    ORIGINAL text. Pure native ``regexp_replace``/``regexp_count``
    chain — map-only, no shuffle, whole-stage-codegen at any scale.
    """
    t = F.col(text_col)
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_URL_RE, "<URL>"),
            PII_EMAIL_RE,
            "<EMAIL>",
        ),
        PII_DIGITS_RE,
        "<NUM>",
    )
    return (
        df.withColumn("n_emails", F.regexp_count(t, F.lit(PII_EMAIL_RE)).cast("bigint"))
        .withColumn("n_urls", F.regexp_count(t, F.lit(PII_URL_RE)).cast("bigint"))
        .withColumn("n_digit_runs", F.regexp_count(t, F.lit(PII_DIGITS_RE)).cast("bigint"))
        .withColumn(out_col, scrubbed)
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


def tfidf_top_terms(
    docs: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document top-k TF-IDF terms via a distributed inverted index.

    The classic corpus-statistics shape: explode tokens (map-side),
    aggregate term frequency per (doc, term), derive document frequency
    per term from the TF frame (one extra shuffle on ``term``, input
    already one row per (doc, term)), then rank within each document.
    Corpus size enters as an in-plan scalar (``crossJoin(broadcast())``
    — no driver ``collect()``), so the whole computation is one lazily
    optimized plan.

    Scale notes: every shuffle key here is fine-grained ((doc, term),
    term, doc) — no global funnel. The df frame is NOT broadcast: at
    corpus scale the distinct-term dimension is itself huge, so the
    tf-df join stays a shuffle join on ``term``. Ranking uses a window
    partitioned by document (bounded partitions).

    The score is ``tf * (ln((N+1)/(df+1)) + 1)`` (smoothed idf,
    sklearn-style). Ranking uses only integer keys (tf desc, df asc,
    term asc) so result sets are deterministic regardless of float
    rounding; the rounded score is carried as a value column.
    """
    toks = docs.select(id_col, tokens(text_col).alias("t"))
    terms = toks.select(id_col, F.explode("t").alias("term")).where(
        F.col("term") != ""
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))
                    )
                    + F.lit(1.0)
                ),
                4,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(id_col, "term", "tf", "df", "tfidf")
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 3,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003): hash every k-gram shingle, slide a ``window`` over the
    hash sequence, keep each window's MINIMUM — the classic
    local-fingerprinting guarantee (any shared substring of length
    >= window+k-1 contributes at least one common fingerprint, so
    matching docs share fingerprints without comparing full texts).

    Output: one row per distinct (doc, fingerprint). Shape: hash each
    shingle ONCE, posexplode, and take sliding-window minima with a
    doc-partitioned window frame — one shuffle on the doc key plus the
    final distinct. (A pure-array formulation with nested
    transform/arrays_zip lambdas is shuffle-free on paper but loses
    badly in practice: Spark evaluates higher-order functions
    interpreted, outside whole-stage codegen, and projection collapsing
    re-evaluates the embedded hash pipeline per reference — measured
    18 s for 5k docs on one core vs well under a second for this plan.
    The window form is plain codegen-able expressions, parallelizes by
    partition, and at 100 TB is the same explode-shuffle d2's posting
    join already pays.) Downstream near-dup candidate generation joins
    on the fingerprint exactly like d2's shingle posting join, but over
    the winnowed ~2/(window+1) fraction of positions — the standard way
    to cut posting volume ~5-10x while keeping the matching guarantee.

    md5 is the hash (bit-identical in Spark and DuckDB — the same trick
    that makes MinHash/SimHash oracle-checkable, operators/dedup.py).
    Docs with fewer than k tokens have no shingles and emit nothing;
    docs with fewer than ``window`` shingles emit the min over what
    exists (one short window — standard winnowing tail behavior).
    """
    hashes = F.transform(
        # multiset positions, NOT array_distinct: winnowing is
        # positional — repeated shingles occupy distinct windows
        ngram_multiset_expr(tokens(text_col), k),
        lambda g: F.md5(g),
    )
    sh = docs.select(
        F.col(id_col), F.posexplode(hashes).alias("__pos", "__h")
    )
    by_doc = Window.partitionBy(id_col)
    frame = (
        by_doc.orderBy("__pos")
        .rowsBetween(Window.currentRow, window - 1)
    )
    return (
        sh.select(
            F.col(id_col),
            F.col("__pos"),
            F.min("__h").over(frame).alias("fingerprint"),
            F.count(F.lit(1)).over(by_doc).alias("__m"),
        )
        # window START positions only: 0..m-window (all full windows),
        # clamped so short docs keep pos 0 (the min over what exists)
        .filter(
            F.col("__pos")
            <= F.greatest(F.col("__m") - window, F.lit(0))
        )
        .select(F.col(id_col), "fingerprint")
        .distinct()
    )


def rare_token_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rare_below: int = 5,
) -> DataFrame:
    """Corpus-frequency quality signals per document (CCNet-style LM
    filtering proxy, without the LM): the mean corpus frequency of a
    doc's tokens and the fraction of its tokens that are corpus-rare
    (fewer than ``rare_below`` occurrences). Garbage/misspelled/OCR
    text scores high on ``rare_frac``; boilerplate scores high on
    ``mean_tf``.

    Deliberately log-free: a log-prob variant needs ``ln``, whose last
    ulp differs between the JVM and DuckDB and breaks bit-exact oracle
    hashing. Sums and counts here are exact integers (< 2^53), so the
    final divisions are IEEE-identical cross-engine after 6dp rounding.

    Plan: one token-posting explode, one vocab count agg, one
    posting-to-vocab equi-join (broadcast at dim-sized vocab,
    shuffle-hash at web-scale vocab — both fine; token keys are
    high-cardinality), one per-doc agg. At 100 TB: two shuffles on
    token + one on doc id, all with map-side partial aggregation.
    """
    posting = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("tok")
    )
    vocab = posting.groupBy("tok").agg(F.count(F.lit(1)).alias("tf"))
    return (
        posting.join(vocab, "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(F.avg("tf"), 6).alias("mean_tf"),
            F.round(
                F.sum((F.col("tf") < rare_below).cast("bigint"))
                / F.count(F.lit(1)),
                6,
            ).alias("rare_frac"),
        )
    )


def chunk_tokens(
    docs: DataFrame,
    chunk_size: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into fixed-token-count chunks with overlap — the
    context-window preparation step between a curated corpus and an
    embedding / training / retrieval pipeline (RAG chunking, long-doc
    truncation with stride).

    Chunk starts are ``0, step, 2*step, ...`` for ``step = chunk_size -
    overlap``, stopping before ``n_tokens - overlap`` so a trailing
    chunk always carries at least one token the previous chunk did not
    (a start inside the final overlap would emit a pure suffix of the
    prior chunk — duplicate retrieval candidates / wasted training
    tokens). The last chunk may still be shorter than ``chunk_size``
    (the slice clamps at the end of the document). Case and punctuation
    are preserved — chunks are re-joined from the ORIGINAL whitespace
    tokens, not the lowercased analysis tokens.

    Plan: map-only — one ``sequence`` + ``explode`` over the scan, no
    shuffle, no window. At 100 TB this chunker runs at scan speed and
    parallelizes per input split; output order is irrelevant because
    (doc, chunk_id) is the key downstream.
    """
    if overlap >= chunk_size:
        raise ValueError(
            f"overlap ({overlap}) must be < chunk_size ({chunk_size})"
        )
    step = chunk_size - overlap
    t = F.col(text_col)
    toks = F.when(
        t.isNull() | (F.trim(t) == ""), F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(t), r"\s+"))
    n = F.size(F.col("__toks"))
    return (
        docs.select(F.col(id_col), toks.alias("__toks"))
        .filter(F.size(F.col("__toks")) > 0)
        .select(
            F.col(id_col),
            F.col("__toks"),
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(n - overlap - 1, F.lit(0)),
                    F.lit(step),
                )
            ).alias("__start"),
        )
        .select(
            F.col(id_col),
            (F.col("__start") / step).cast("int").alias("chunk_id"),
            F.least(F.lit(chunk_size), n - F.col("__start"))
            .cast("int")
            .alias("n_chunk_tokens"),
            F.array_join(
                F.slice(F.col("__toks"), F.col("__start") + 1, chunk_size),
                " ",
            ).alias("chunk_text"),
        )
    )


def top_ngrams(
    docs: DataFrame, n: int = 3, k: int = 20, text_col: str = "text"
) -> DataFrame:
    """Corpus-level top-k n-gram counts (the canonical MapReduce job).

    Multiset n-grams (duplicates kept — frequency IS the signal) are
    built per row with the shifted-slices construction, exploded
    map-side, and hash-aggregated with map-side partial combine; the
    global top-k is a ``TakeOrderedAndProject`` (per-partition heap +
    driver merge of k rows), never a full sort. Ties break on the gram
    string so the top-k SET is deterministic.
    """
    toks = docs.select(tokens(text_col).alias("t"))
    grams = toks.select(F.explode(ngram_multiset_expr(F.col("t"), n)).alias("gram"))
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("gram").asc())
        .limit(k)
    )


def lexical_diversity(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Type-token ratio and hapax fraction per document.

    Lexical diversity separates natural prose from keyword stuffing and
    template boilerplate (low TTR) and from OCR noise / gibberish (very
    high hapax fraction) — complementary to the frequency-based signals
    in ``rare_token_score`` (corpus-relative) and ``text_stats``
    (surface ratios): this one is purely intra-document.

    Output: (id_col, n_tokens, n_distinct, n_hapax, ttr, hapax_frac).

    Empty/whitespace-only/null documents emit NO row (mirrors the
    oracle's ``trim(text) <> ''`` filter): ``split('')`` would
    otherwise yield a phantom ``['']`` token scoring the doc a
    nonsense ttr of 1.0.

    Log-free oracle contract: counts are exact integers; each ratio is
    ONE IEEE division of exact integers, rounded to 6dp — bit-identical
    cross-engine. Plan: one token explode, one (doc, token) hash agg,
    one doc agg — two shuffles, both with map-side partial combine.
    """
    t = F.col(text_col)
    per_tok = (
        docs.filter(t.isNotNull() & (F.trim(t) != ""))
        .select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = F.sum("c")
    return per_tok.groupBy(id_col).agg(
        n.cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.sum((F.col("c") == 1).cast("bigint")).cast("bigint").alias("n_hapax"),
        F.round(F.count(F.lit(1)) / n, 6).alias("ttr"),
        F.round(F.sum((F.col("c") == 1).cast("bigint")) / n, 6).alias(
            "hapax_frac"
        ),
    )


def bm25_per_doc(
    docs: DataFrame,
    terms: "list[str] | tuple[str, ...]",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document BM25 inputs (id, tf0..tfN-1, dl) for a fixed term
    set: the one-corpus-traversal stage of ``bm25_topk``, factored out
    so the incremental face (i16) can tokenize ONCE and derive split
    stats from this frame instead of re-reading text per split."""
    n = len(terms)
    t = F.col(text_col)
    toks = F.filter(tokens(text_col), lambda x: x != "")
    acc0 = F.array(*([F.lit(0).cast("long")] * (n + 1)))

    def _step(acc, x):
        slots = [
            acc[i] + F.when(x == F.lit(terms[i]), 1).otherwise(0)
            for i in range(n)
        ]
        slots.append(acc[n] + 1)
        return F.array(*slots)

    counts = F.aggregate(toks, acc0, _step)
    packed = F.struct(
        *[counts[i].alias(f"tf{i}") for i in range(n)],
        counts[n].alias("dl"),
    )
    # Generate (explode) is a projection-collapse barrier: the single
    # `counts` aggregate evaluates exactly once per row no matter how
    # many slots downstream projections extract.
    return (
        docs.filter(t.isNotNull() & (F.trim(t) != ""))
        .select(F.col(id_col), F.explode(F.array(packed)).alias("_c"))
        .select(id_col, "_c.*")
    )


def bm25_stats(per_doc: DataFrame, n_terms: int) -> DataFrame:
    """Corpus statistics (n_docs, s_tokens, df0..dfN-1) from a
    ``bm25_per_doc`` frame — one tiny single-row aggregate. Every
    column is an int64 SUM/COUNT, so stats over corpus SPLITS are
    MERGEABLE: ``bm25_stats_fold`` of split stats equals the stats of
    the union, which is the whole incremental-index claim (i16)."""
    return per_doc.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("s_tokens"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(n_terms)
        ],
    )


def bm25_stats_fold(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold two BM25 stats rows (additive class: plain int64 sums —
    commutative and associative, so N split stats fold in any order
    and a streaming sink can maintain them O(delta) per batch)."""
    cols = base.columns
    return base.unionByName(delta).agg(
        *[F.sum(c).cast("long").alias(c) for c in cols]
    )


def bm25_topk(
    docs: DataFrame,
    terms: "list[str] | tuple[str, ...]",
    k: int = 10,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1_tenths: int = 12,
    b_hundredths: int = 75,
    grain: int = 1_000_000,
    totals: DataFrame | None = None,
    per_doc: DataFrame | None = None,
) -> DataFrame:
    """Top-k documents for a fixed term set under BM25, exact-grain.

    Classic Okapi BM25 (Robertson et al.; the Lucene ``1 +`` idf
    variant so weights never go negative) with the scoring pipeline
    restructured so every ranking decision is int64 arithmetic:

    - tf normalization ``tf*(k1+1) / (tf + k1*(1-b) + k1*b*dl/avgdl)``
      is an exact rational once multiplied through by ``1000*S``
      (``S``=total corpus tokens, ``avgdl=S/N``): with ``k1=k1_tenths/10``
      and ``b=b_hundredths/100``,
      ``num = tf*(1000+100*k1_tenths)*S`` and
      ``den = 1000*S*tf + k1_tenths*(100-b_hundredths)*S
      + k1_tenths*b_hundredths*dl*N`` are both int64; the grain is the
      exact integer quotient ``(num*grain) DIV den``.
    - idf is ``FLOOR(grain * LN((2N+2)/(2*df+1)))``: numerator and
      denominator are exact ints, the division and LN run on identical
      doubles in any engine, and the coarse FLOOR grain absorbs any
      sub-ulp libm wobble (the driver-proven T4 pattern, hardened).
    - score = sum of ``idf_fp * tfnorm_fp`` — integer adds/multiplies,
      associative, fold-order- and engine-version-independent. Ties
      break on ``id_col``.

    Plan (the 100 TB story): per-doc tf/dl come from ONE traversal of
    the token array (an ``aggregate`` with len(terms)+1 accumulator
    slots) behind an explode barrier so projection collapsing cannot
    re-tokenize per extracted column (the shingle_expr lesson); corpus
    stats are a single tiny global aggregate broadcast back
    (crossJoin(broadcast) — the A4 scalar-subquery pattern); ranking is
    TakeOrderedAndProject. No posting-list shuffle at all: scan +
    one-row agg + map + top-k. int64 headroom: ``num*grain ~
    2200*tf*S*1e6`` — fine through ~1e9 total corpus tokens; beyond
    that drop ``grain`` or promote the quotient to DECIMAL(38,0).

    Output: (id_col, matched, dl, score_fp), score_fp descending.

    ``totals`` overrides the corpus-stats aggregate (a one-row frame
    shaped like ``bm25_stats``) — the incremental face scores against
    FOLDED split stats (i16) and a serving layer scores against a
    maintained stats store without rescanning the corpus. ``per_doc``
    likewise overrides the tokenization stage with a pre-built (and
    typically persisted) ``bm25_per_doc`` frame so callers deriving
    split stats from it pay the corpus traversal once.
    """
    n = len(terms)
    if per_doc is None:
        # eagerly checkpointed (r16): the corpus-stats aggregate AND
        # the scoring projection both reference per_doc, so the
        # tokenize + (len(terms)+1)-slot array traversal over every
        # document ran twice. The frame itself is narrow (id, dl, one
        # int per term) — materializing it once costs far less than a
        # second corpus tokenization at any scale.
        from big_data_flight_analytics_spark.cache import once_checkpoint

        per_doc = once_checkpoint(
            bm25_per_doc(docs, terms, text_col=text_col, id_col=id_col)
        )
    if totals is None:
        totals = bm25_stats(per_doc, n)
    scored = per_doc.crossJoin(F.broadcast(totals))

    num_mult = 1000 + 100 * k1_tenths          # (k1+1) * 1000
    den_k1 = k1_tenths * (100 - b_hundredths)  # k1*(1-b) * 1000
    den_dl = k1_tenths * b_hundredths          # k1*b     * 1000
    # overflow guard BEFORE any int64 product can wrap (the
    # dsir_weights/rolling_zscore pattern): tf_i <= dl bounds every
    # per-term numerator by dl*num_mult*s_tokens*grain, checked in
    # double (1e-16 relative error absorbed by the 2x headroom to
    # 2^63). Spark's non-ANSI int64 wraps SILENTLY while DuckDB
    # raises, so past ~1e9 corpus tokens the two sides would diverge
    # quietly-wrong vs loud — this makes Spark fail loud too.
    # assert_true returns NULL when the bound holds; anchoring num0 on
    # .isNull() keeps the check inside codegen with zero effect on
    # passing rows. Remedy per docstring: drop `grain` or promote the
    # quotient to DECIMAL(38,0).
    bound_ok = F.assert_true(
        F.col("dl").cast("double") * F.lit(float(num_mult))
        * F.col("s_tokens").cast("double") * F.lit(float(grain))
        <= F.lit(float(1 << 62)),
        F.lit(
            "bm25_topk: dl*(k1+1)*1000*s_tokens*grain exceeds 2^62 — "
            "int64 would wrap; lower `grain` or promote to DECIMAL "
            "(see docstring)"
        ),
    )
    proj = [F.col(id_col)]
    for i in range(n):
        num_expr = (
            F.col(f"tf{i}") * F.lit(num_mult) * F.col("s_tokens")
            * F.lit(grain)
        )
        # one anchored guard per row is enough (bound is tf-independent)
        if i == 0:
            num_expr = F.when(bound_ok.isNull(), num_expr)
        proj.append(num_expr.alias(f"num{i}"))
        proj.append(
            (
                F.lit(1000) * F.col("s_tokens") * F.col(f"tf{i}")
                + F.lit(den_k1) * F.col("s_tokens")
                + F.lit(den_dl) * F.col("dl") * F.col("n_docs")
            ).alias(f"den{i}")
        )
        proj.append(
            F.floor(
                F.lit(float(grain))
                * F.log(
                    (F.lit(2) * F.col("n_docs") + F.lit(2)).cast("double")
                    / (F.lit(2) * F.col(f"df{i}") + F.lit(1)).cast("double")
                )
            ).alias(f"idf{i}")
        )
        proj.append((F.col(f"tf{i}") > 0).cast("long").alias(f"m{i}"))
    proj.append(F.col("dl"))
    scored = scored.select(*proj)

    score = None
    matched = None
    for i in range(n):
        term_score = F.expr(f"num{i} DIV den{i}") * F.col(f"idf{i}")
        score = term_score if score is None else score + term_score
        matched = F.col(f"m{i}") if matched is None else matched + F.col(f"m{i}")
    return (
        scored.select(
            F.col(id_col),
            matched.cast("long").alias("matched"),
            F.col("dl").cast("long").alias("dl"),
            score.cast("long").alias("score_fp"),
        )
        .filter(F.col("matched") > 0)
        .orderBy(F.col("score_fp").desc(), F.col(id_col))
        .limit(k)
    )


def bigram_lm_score(
    docs: DataFrame,
    grain: int = 1_000_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Self-trained bigram-LM negative log-likelihood per document —
    the CCNet-style perplexity quality filter: documents whose token
    transitions are unlike the corpus (boilerplate, gibberish, wrong
    register) score a high per-token NLL and can be filtered or
    bucketed on it.

    Model: add-one-smoothed bigram LM trained on the corpus itself.
    ``P(b|a) = (c2(a,b) + 1) / (c1(a) + V)`` with ``c2`` the corpus
    bigram count, ``c1(a)`` the bigram-head count, ``V`` the distinct
    vocabulary size. Per-bigram log-probs are FLOOR-ed to an integer
    ``grain`` (the driver-proven T4/T17 pattern: LN on identical
    exact-int ratios, coarse grain absorbing sub-ulp libm wobble), so
    every rank-deciding sum is pure int64 — engine-independent.
    Headroom: |per-bigram| <= grain * ln(2^63) ~ 4.4e7, so even a
    1e9-token document sums to < 2^56.

    Plan (the 100 TB story): ONE aggregation of the exploded bigram
    frame to per-(doc, a, b) multiplicities m; the global ``c2``/``c1``
    tables derive FROM that frame (shuffles keyed on (a,b) and (a) —
    map-side partials make them vocabulary-, not corpus-, sized);
    scoring rejoins the count tables on the same keys (AQE broadcasts
    them while they fit; at corpus scale they are co-partitioned
    shuffle joins — deliberately NOT pinned broadcast, the model table
    grows with the vocabulary). ``V`` enters as a one-row broadcast
    (the A4 scalar pattern). Docs with fewer than two tokens keep a
    row with ``n_bigrams = 0`` (left join back).

    Output: (id_col, n_bigrams, nll_fp, avg_nll_fp) — ``nll_fp``
    the summed negative log-prob at ``grain``, ``avg_nll_fp`` its
    integer mean per bigram (the cross-length comparable score).
    """
    t = F.col(text_col)
    toks = F.filter(tokens(text_col), lambda x: x != "")
    tok = docs.filter(t.isNotNull() & (F.trim(t) != "")).select(
        F.col(id_col), toks.alias("__t")
    )
    big = tok.filter(F.size("__t") >= 2).select(
        id_col,
        F.explode(
            F.zip_with(
                F.slice("__t", 1, F.size("__t") - 1),
                F.slice("__t", 2, F.size("__t") - 1),
                lambda a, b: F.struct(a.alias("a"), b.alias("b")),
            )
        ).alias("__ab"),
    ).select(id_col, F.col("__ab.a").alias("a"), F.col("__ab.b").alias("b"))
    pair = big.groupBy(id_col, "a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    # c2/c1 via windows on the pair frame (r16, the d19 df-window
    # pattern): the old shape built c2 and c1 as separate aggregates of
    # `pair` and joined them back, so the tokenize + bigram-explode +
    # hash-agg lineage executed THREE times (Spark shares no subplans
    # across DataFrame references). The window form computes the model
    # tables in the same lineage — one corpus pass, two count-carrying
    # exchanges — and the summed values are the identical integers
    # (SUM(m) over the full (a,b) / (a) partition == the joined-back
    # aggregate). Skew note: a window partition holds DISTINCT
    # (doc, a, b) rows for one head word, the same key profile the old
    # c1 join-back shuffled; the d19/df rework accepted this exposure
    # for one-pass lineage and measurement agrees here.
    pair = pair.withColumn(
        "c2", F.sum("m").over(Window.partitionBy("a", "b"))
    ).withColumn("c1", F.sum("m").over(Window.partitionBy("a")))
    vocab = (
        tok.select(F.explode("__t").alias("__w"))
        .agg(F.count_distinct("__w").cast("long").alias("v"))
    )
    logp = F.floor(
        F.lit(float(grain))
        * F.log(
            (F.col("c2") + 1).cast("double")
            / (F.col("c1") + F.col("v")).cast("double")
        )
    ).cast("long")
    scored = (
        pair.crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.sum("m").cast("long").alias("n_bigrams"),
            (-F.sum(F.col("m") * logp)).cast("long").alias("nll_fp"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("nll_fp", F.lit(0)).cast("long").alias("nll_fp"),
            F.when(
                F.coalesce("n_bigrams", F.lit(0)) > 0,
                F.expr("nll_fp DIV n_bigrams"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("avg_nll_fp"),
        )
    )


def cdc_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    divisor: int = 8,
) -> DataFrame:
    """Content-defined chunking at token granularity: a chunk boundary
    falls AFTER every token whose 60-bit md5 hash is 0 mod ``divisor``
    (expected chunk length = divisor tokens). Boundaries depend only on
    local content, so inserting or deleting tokens perturbs ONLY the
    chunk containing the edit — downstream chunks keep their exact
    fingerprints (pinned by test). Fixed-size chunking (chunk_tokens)
    shifts every subsequent chunk instead; CDC is what makes chunk-level
    dedup survive near-duplicate documents with insertions — the same
    reason backup systems chunk this way (Rabin/Gear CDC), applied at
    token grain so both engines replay it exactly.

    Output: (id_col, chunk_id, n_tokens, chunk_fp) with chunk_id the
    0-based chunk ordinal and chunk_fp = md5 of the space-joined chunk
    tokens. Scale shape: one posexplode + a per-document window + one
    grouped fold — everything partitioned by document, no global state.
    Empty/NULL texts emit nothing."""
    toks = docs.filter(
        F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != "")
    ).select(
        id_col, F.posexplode(tokens(text_col)).alias("idx", "tok")
    )
    boundary = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long")
        % divisor
        == 0
    ).cast("long")
    w = (
        Window.partitionBy(id_col)
        .orderBy("idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chunked = toks.select(
        id_col,
        "idx",
        "tok",
        F.coalesce(F.sum(boundary).over(w), F.lit(0))
        .cast("long")
        .alias("chunk_id"),
    )
    return (
        chunked.groupBy(id_col, "chunk_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("idx", "tok"))
                        ),
                        lambda s: s["tok"],
                    ),
                )
            ).alias("chunk_fp"),
        )
    )


def source_ngram_novelty(
    docs: DataFrame,
    n: int = 3,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source n-gram novelty: the fraction of a source's distinct
    n-gram vocabulary that appears in NO other source.

    The gram-level complement of the pair-level ``d9`` overlap report:
    d9 says which sources re-host each other's documents; novelty says
    how much of a source's raw phrasing is its own — the signal a
    mixture designer uses to decide whether adding a crawl actually
    adds new text or just re-weights existing text. Shape: one explode
    to DISTINCT (gram, source) pairs, a gram-keyed count of sources
    per gram (the two shuffles, both on the gram hash — no skew
    because the pairs are pre-deduped), a co-partitioned join back,
    and an O(sources) final agg. Novelty is an int64/int64 ratio cast
    to double, so it hashes bit-exactly cross-engine.
    """
    return novelty_from_pairs(
        novelty_pairs(docs, n, source_col=source_col, text_col=text_col)
    )


def novelty_pairs(
    docs: DataFrame,
    n: int = 3,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """The novelty report's STATE: distinct (gram, source) pairs.

    The set-union fold class — pair sets from corpus splits union
    (with a distinct) into the full corpus's pair set, so the report
    maintains incrementally (i17): O(batch) tokenization per delta,
    one distinct over state whose size is bounded by the corpus
    vocabulary x sources (grams are int64-hash-free here — the string
    gram is the key both engines share; hash if vocabulary scale ever
    demands it, the d19 precedent)."""
    return (
        docs.select(
            F.col(source_col).alias("source"), tokens(text_col).alias("t")
        )
        .select(
            "source",
            F.explode(ngram_multiset_expr(F.col("t"), n)).alias("gram"),
        )
        .distinct()
    )


def novelty_from_pairs(pairs: DataFrame) -> DataFrame:
    """Per-source novelty report off a (gram, source) pair state.

    n_sources rides a gram-partitioned window (r16, the d19 df-window
    pattern) instead of a separate aggregate joined back: the old
    shape referenced ``pairs`` twice, so the whole state lineage (for
    t28/i17 the corpus explode + distinct) executed twice. A gram's
    window partition holds at most one row per source — bounded
    everywhere, no skew exposure — and COUNT over the full partition
    is the identical integer the join carried."""
    return (
        pairs.withColumn(
            "n_sources",
            F.count(F.lit(1))
            .over(Window.partitionBy("gram"))
            .cast("long"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum((F.col("n_sources") == 1).cast("long"))
            .cast("long")
            .alias("n_exclusive"),
        )
        .select(
            "source",
            "n_grams",
            "n_exclusive",
            (
                F.col("n_exclusive").cast("double")
                / F.col("n_grams").cast("double")
            ).alias("novelty"),
        )
    )
