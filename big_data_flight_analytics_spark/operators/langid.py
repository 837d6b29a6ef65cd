r"""Hashed char-n-gram language / domain identification (t20).

The one LLM-pipeline stage the catalog lacked: score every document
against K reference class profiles (languages, domains, sources) and
pick the most likely class — the classic n-gram language-ID heuristic
(Cavnar & Trenkle-style character n-grams) re-expressed in the t18
DSIR machinery so it runs corpus-size-independent and lands under the
exact-value hash gate:

- features are CHARACTER n-grams (default trigrams) of the
  lowercased/trimmed text, hashed into ``n_buckets`` md5 buckets —
  the same ``md5_bucket`` family as t2/t6/t18, so one hash governs
  all sampling/weighting decisions;
- per class c and bucket b, the profile weight is the add-one-
  smoothed log-likelihood ratio of the class against the POOLED
  reference background,
  ``ln( ((cnt_c[b]+1)/(S_c+B)) / ((cnt_all[b]+1)/(S_all+B)) )``,
  stored as the FLOOR-scaled int64 ``w_fp`` (the t18 exact-grain
  contract: LN on identical doubles built from exact-int cross
  products, so every engine floors the same value);
- a document's score for class c is the integer SUM of its gram-
  occurrence weights (multiset — repeated grams count); the predicted
  class is the argmax, tie-broken deterministically to the smallest
  label via min over ``struct(-score, label)``.

Scale (the 100 TB story): the profile table is K x n_buckets rows no
matter the corpus size — it broadcasts forever. Classification is one
char-gram explode, a broadcast join multiplying each gram by K
(K = number of classes, single digits), and two map-side-combined
aggregates (per (doc, class), then per doc). No corpus-keyed shuffle
other than the per-doc aggregate; nothing grows with the reference
corpus after profile build.

Caveat — measured cross-engine boundary (tests/test_unicode_parity.py):
character positions are code points in both Spark and DuckDB, and the
canonical chain (lower/trim/length/substring/md5/``\s+`` split) is
bit-exact across engines for combining marks, precomposed accents,
Greek/Cyrillic, CJK, Hangul, emoji (surrogates/modifiers/ZWJ),
ligatures, fullwidth forms, and NBSP/ideographic spaces. It diverges
on exactly two character classes, because Spark ``lower`` applies the
FULL (contextual, one-to-many) Unicode case mapping while DuckDB's is
the SIMPLE one-to-one mapping: word-final Greek capital sigma (ς vs
σ) and dotted capital I U+0130 (``i``+U+0307 vs ``i``). Oracles are
exact for any text free of those two; each engine alone remains
deterministic on them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from big_data_flight_analytics_spark.operators.sampling import md5_bucket

LANGID_NGRAM = 3
LANGID_BUCKETS = 256
LANGID_GRAIN = 1_000_000


def _canonical(text_col: str) -> Column:
    """The module's canonical text form: lowercased, trimmed, NULL->''."""
    return F.lower(F.trim(F.coalesce(F.col(text_col), F.lit(""))))


def _grams_of(s: Column, n: int) -> Column:
    """Char n-gram MULTISET of an ALREADY-CANONICAL string column.

    Callers must project the canonical string into its own column
    first: expressions inside a ``transform`` lambda are re-evaluated
    per element (no CSE across the lambda boundary), so an inline
    lower(trim(text)) argument turns the gram build O(len^2) per doc
    — measured 2.1x slower on the sf0.1 corpus.

    Multiset because term frequency is the langid signal. Strings
    shorter than ``n`` yield an empty array — ``F.sequence`` would
    count backwards on a negative span, so the guard is explicit.
    """
    return F.when(
        F.length(s) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(s) - (n - 1)),
            lambda i: F.substring(s, i, n),
        ),
    ).otherwise(F.array().cast("array<string>"))


def char_ngram_expr(text_col: str, n: int = LANGID_NGRAM) -> Column:
    """Character n-gram MULTISET of the canonical (lower/trim) text.

    Convenience single-expression form (tests, ad-hoc use). The
    operators below use the two-step ``_canonical`` projection +
    ``_grams_of`` instead — see ``_grams_of`` for why.
    """
    return _grams_of(_canonical(text_col), n)


def langid_count_frame(
    reference: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    n: int = LANGID_NGRAM,
    n_buckets: int = LANGID_BUCKETS,
) -> DataFrame:
    """Sparse (label_col, bucket, cnt) gram-bucket counts — the
    PERSISTED profile state. Counts are ADDITIVE, which is what makes
    the i5 ingest contract work: an arriving labeled batch's counts
    fold into the stored frame with one tiny full-outer sum
    (``langid_counts_fold``) and the weight grid re-derives from
    counts alone in O(K x n_buckets) — the reference corpus is never
    rescanned."""
    return (
        reference.select(
            F.col(label_col), _canonical(text_col).alias("__s")
        )
        .select(
            label_col, F.explode(_grams_of(F.col("__s"), n)).alias("__g")
        )
        .select(
            label_col, md5_bucket(F.col("__g"), n_buckets).alias("bucket")
        )
        .groupBy(label_col, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def langid_counts_fold(
    base_counts: DataFrame,
    delta_counts: DataFrame,
    label_col: str = "label",
) -> DataFrame:
    """Fold an arriving batch's counts into the stored count frame:
    one full-outer join over <= 2 x K x n_buckets sparse rows —
    O(delta + stored-state), corpus-independent."""
    b = base_counts.select(label_col, "bucket", F.col("cnt").alias("__b"))
    d = delta_counts.select(label_col, "bucket", F.col("cnt").alias("__d"))
    return b.join(d, [label_col, "bucket"], "full").select(
        label_col,
        "bucket",
        (
            F.coalesce(F.col("__b"), F.lit(0))
            + F.coalesce(F.col("__d"), F.lit(0))
        ).alias("cnt"),
    )


def langid_profiles_from_counts(
    counts: DataFrame,
    label_col: str = "label",
    n_buckets: int = LANGID_BUCKETS,
    grain: int = LANGID_GRAIN,
    _product_bound: int = 1 << 62,
) -> DataFrame:
    """Weight grid from a (label, bucket, cnt) count frame — shared by
    the from-scratch path and the i5 incremental fold (identical
    weights by construction: the grid is a pure function of counts).
    See ``langid_profiles`` for the output contract.

    The count frame is eagerly checkpointed (r16): FIVE consumers
    reference it (the grid's distinct labels, label/bucket/grand
    totals, and the weight join) and Spark shares no subplans across
    DataFrame references, so an unchecked frame re-runs its whole
    lineage — for t20 that lineage is the reference corpus scan +
    char-gram explode + one md5 per gram, executed five times
    (measured: 5 of t20's 6 corpus-explode subtrees were this frame).
    The frame itself is K x n_buckets rows — model-state-sized at any
    corpus scale, so materializing it once is free; ``once_checkpoint``
    (not ``persist``) because a cached plan re-materializes per
    consumer thread and measured ~20%% SLOWER than even the
    quintuple recompute here, while the checkpointed LocalRelation-
    style scan is read at memory speed by all five."""
    from big_data_flight_analytics_spark.cache import once_checkpoint

    counts = once_checkpoint(
        counts.select(label_col, "bucket", F.col("cnt").alias("__c"))
    )
    label_totals = counts.groupBy(label_col).agg(
        F.sum("__c").cast("long").alias("__s_c")
    )
    bucket_totals = counts.groupBy("bucket").agg(
        F.sum("__c").cast("long").alias("__c_all")
    )
    grand_total = counts.agg(F.sum("__c").cast("long").alias("__s_all"))
    grid = (
        counts.select(label_col)
        .distinct()
        .crossJoin(
            counts.sparkSession.range(n_buckets).select(
                F.col("id").cast("long").alias("bucket")
            )
        )
    )
    bound_ok = F.assert_true(
        F.coalesce(
            (F.col("__c_all") + 1).cast("double")
            * (F.col("__s_all") + n_buckets).cast("double"),
            F.lit(0.0),
        )
        <= F.lit(float(_product_bound)),
        F.lit(
            "langid_profiles: (cnt+1)*(S+B) exceeds 2^62 — int64 would "
            "wrap; cast to double before multiplying or promote to "
            "DECIMAL (see docstring)"
        ),
    )
    return (
        grid.join(F.broadcast(counts), [label_col, "bucket"], "left")
        .join(F.broadcast(bucket_totals), "bucket", "left")
        .join(F.broadcast(label_totals), label_col)
        .crossJoin(F.broadcast(grand_total))
        .select(
            label_col,
            "bucket",
            F.when(
                bound_ok.isNull(),
                F.floor(
                    F.lit(float(grain))
                    * F.log(
                        (
                            (F.coalesce(F.col("__c"), F.lit(0)) + 1)
                            * (F.col("__s_all") + n_buckets)
                        ).cast("double")
                        / (
                            (F.coalesce(F.col("__c_all"), F.lit(0)) + 1)
                            * (F.col("__s_c") + n_buckets)
                        ).cast("double")
                    )
                ),
            )
            .cast("long")
            .alias("w_fp"),
        )
    )


def langid_profiles(
    reference: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    n: int = LANGID_NGRAM,
    n_buckets: int = LANGID_BUCKETS,
    grain: int = LANGID_GRAIN,
    _product_bound: int = 1 << 62,
) -> DataFrame:
    """Class profiles from a labeled reference corpus.

    Output: the FULL (label x bucket) grid — K x ``n_buckets`` rows of
    (label_col, bucket, w_fp) — so classification is a plain broadcast
    join with no missing-bucket special case (add-one smoothing covers
    buckets a class never produced).

    The int64 cross products are bounded by
    ``(cnt_all+1) * (S_all+B)`` (every class count <= the background
    count); the t18 assert_true bound guard fails loud before a wrap
    could corrupt a weight. Past ~2^31 reference grams, cast the
    factors to double before multiplying (still deterministic — same
    two int64s round the same way) or promote to DECIMAL(38,0).

    Composition of ``langid_count_frame`` + ``langid_profiles_from_
    counts``: persist the count frame instead of the weights to get
    the i5 ingest contract (fold arriving labeled batches with
    ``langid_counts_fold``, re-derive weights in O(K x n_buckets)).
    """
    return langid_profiles_from_counts(
        langid_count_frame(reference, label_col, text_col, n, n_buckets),
        label_col=label_col,
        n_buckets=n_buckets,
        grain=grain,
        _product_bound=_product_bound,
    )


def langid_hashed_ngrams(
    docs: DataFrame,
    profiles: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
    n: int = LANGID_NGRAM,
    n_buckets: int = LANGID_BUCKETS,
) -> DataFrame:
    """Classify every document against the profile table.

    ``profiles`` must be the full grid ``langid_profiles`` emits (or a
    stored copy of it — the table is tiny and persists naturally as
    model state, the t15/t16 pattern). ``n``/``n_buckets`` must match
    the profile build; they are data-independent, so batches and
    stored profiles agree by construction.

    Output: (id_col, pred_<label_col>, llr_fp, n_grams) — one row per
    document with >= 1 char n-gram. Ties (identical integer scores)
    break to the SMALLEST label: min over struct(-llr, label), exactly
    mirrored by the oracle's ORDER BY llr DESC, label ASC ranking.
    """
    grams = (
        docs.select(F.col(id_col), _canonical(text_col).alias("__s"))
        .select(id_col, F.explode(_grams_of(F.col("__s"), n)).alias("__g"))
        .select(id_col, md5_bucket(F.col("__g"), n_buckets).alias("bucket"))
    )
    scores = (
        grams.join(F.broadcast(profiles), "bucket")
        .groupBy(id_col, label_col)
        .agg(
            F.sum("w_fp").cast("long").alias("__llr"),
            F.count(F.lit(1)).cast("long").alias("__n"),
        )
    )
    best = scores.groupBy(id_col).agg(
        F.min(
            F.struct(
                (-F.col("__llr")).alias("__neg"),
                F.col(label_col).alias("__lbl"),
            )
        ).alias("__best"),
        F.max("__n").alias("n_grams"),
    )
    return best.select(
        id_col,
        F.col("__best.__lbl").alias(f"pred_{label_col}"),
        (-F.col("__best.__neg")).cast("long").alias("llr_fp"),
        "n_grams",
    )
