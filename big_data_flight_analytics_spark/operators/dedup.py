"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Scale design:
- exact dedup = hash-groupBy on a content fingerprint, canonical row =
  min(id) — deterministic, one shuffle on the fingerprint;
- n-gram Jaccard = inverted-index join (explode shingles, equi-join on
  shingle, count shared) — never an O(n^2) cross join; the shingle join
  key distributes well because shingles are high-cardinality;
- MinHash-LSH = signature -> bands -> bucket equi-join -> exact verify.
  Candidate generation cost scales with bucket collisions, not n^2;
- SimHash = per-doc 32-bit signature; near-dup candidates via
  chunk-match (pigeonhole) equi-joins, verified by hamming distance.

All signatures are built from md5, which exists bit-identically in both
Spark and DuckDB, so MinHash/SimHash are fully oracle-checkable:
- MinHash hashes each shingle ONCE with md5, parses two 28-bit ints
  h1, h2 from the hex (Spark: conv(substr, 16, 10); DuckDB oracle: an
  ascii-arithmetic digit chain — both are exactly the integer value of
  the hex chars), and derives permutation j as (h1 + j*h2) mod (2^31-1)
  — a classic universal-hash family, all integer arithmetic with no
  64-bit overflow.
- SimHash token bits come from the md5 hex digits via the same digit
  decode: bit k of the hash = bit (k mod 4) of hex digit (k div 4).

Skew safety at 100-TB scale (both are recall trades, mirrored exactly in
the oracle SQL so parity is preserved):
- empty-shingle docs are dropped BEFORE MinHash banding (they can never
  pass the Jaccard verify, and a shared sentinel bucket would otherwise
  generate d*(d-1)/2 candidates over all short docs);
- ``max_band_df`` / ``max_chunk_df`` caps drop LSH buckets whose
  population exceeds the cap before the pair join, bounding per-bucket
  candidate work exactly like ``max_df`` does for the shingle posting
  join in ``ngram_jaccard_pairs``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# column-metadata key carrying the sep a paragraph-df state was built
# with (paragraph_df_state -> boilerplate_excision mismatch guard)
_SEP_META_KEY = "graft.paragraph_sep"

from big_data_flight_analytics_spark.cache import tracked_persist
from big_data_flight_analytics_spark.functions.text import rolling_fingerprint
from big_data_flight_analytics_spark.operators.text import (
    ngram_multiset_expr,
    tokens,
)


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Group by content fingerprint; keep canonical min(id) + dup count."""
    return (
        df.select(rolling_fingerprint(F.col(text_col)).alias("fingerprint"), id_col)
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def paragraph_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
) -> DataFrame:
    """C4-style paragraph-grain exact dedup with document reconstruction.

    Splits each document on ``sep``, keeps only the FIRST occurrence of
    every distinct paragraph corpus-wide (first = lowest
    ``(doc_id, position)``), and rebuilds each document from its
    surviving paragraphs in original order. Documents whose every
    paragraph already appeared elsewhere vanish entirely — the C4 /
    RefinedWeb line-grain rule generalized to any separator.

    Output: ``id_col, clean_text, n_paras`` (original), ``n_kept``.

    Scale: one explode, one window partitioned by paragraph text (high
    cardinality; the only heavy keys are boilerplate paragraphs — which
    is exactly what gets deduped away), one hash agg per doc. Nothing
    quadratic; every shuffle keys on paragraph or doc id.

    ``sep`` is a Java regex in Spark's ``split`` — keep it
    literal-safe (no metacharacters) so the DuckDB oracle's literal
    ``string_split`` stays equivalent.
    """
    toked = df.select(
        F.col(id_col), F.split(F.col(text_col), sep).alias("__paras")
    )
    paras = toked.select(
        F.col(id_col),
        F.size("__paras").cast("bigint").alias("n_paras"),
        F.posexplode("__paras").alias("idx", "para"),
    )
    first_seen = Window.partitionBy("para").orderBy(id_col, "idx")
    kept = (
        paras.withColumn("rn", F.row_number().over(first_seen))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "para"))),
                lambda x: x["para"],
            ),
            sep,
        ).alias("clean_text"),
        F.first("n_paras").alias("n_paras"),
        F.count(F.lit(1)).alias("n_kept"),
    )


def boilerplate_excision(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
    max_df: int = 3,
    df_state: DataFrame | None = None,
) -> DataFrame:
    """C4's OTHER line rule: a paragraph occurring in >= ``max_df``
    distinct documents corpus-wide is boilerplate (nav bars, cookie
    banners, license headers) — remove EVERY copy, including the
    first. Contrast :func:`paragraph_dedup`, which keeps one copy:
    dedup treats repetition as redundancy, excision treats it as
    template noise that was never content. Frequency counts DOCUMENTS
    (not occurrences), so a paragraph repeated inside one quirky doc
    is not boilerplate.

    Output: ``id_col, clean_text, n_paras`` (original), ``n_kept``.
    Documents whose every paragraph is boilerplate vanish (same
    contract as paragraph_dedup).

    Scale: one explode, one paragraph-keyed distinct-count aggregate
    whose >= max_df survivors form a SMALL broadcast anti-join side
    (boilerplate vocabularies are tiny by definition), one hash agg
    per doc. The hot paragraphs that would skew a window here never
    reach one — they are exactly the rows the anti join removes.

    ``df_state``: pass a (para, df) frame (``paragraph_df_state`` /
    ``paragraph_df_fold``) to excise against an incrementally
    maintained corpus-wide frequency instead of recounting — the i13
    ingest path. The state MUST have been built with the same ``sep``
    (and the same tokenization) as this call: paragraph keys from a
    different split silently fail to match and the anti join excises
    nothing. States built by ``paragraph_df_state`` carry their sep as
    column metadata on ``para``; a carried sep that disagrees with
    this call's raises instead of silently no-opping (ADVICE r14).
    """
    toked = df.select(
        F.col(id_col), F.split(F.col(text_col), sep).alias("__paras")
    )
    paras = toked.select(
        F.col(id_col),
        F.size("__paras").cast("bigint").alias("n_paras"),
        F.posexplode("__paras").alias("idx", "para"),
    )
    if df_state is None:
        df_state = paragraph_df_state(df, id_col, text_col, sep)
    else:
        stored = df_state.schema["para"].metadata.get(_SEP_META_KEY)
        if stored is not None and stored != sep:
            raise ValueError(
                "boilerplate_excision: df_state was built with "
                f"sep={stored!r} but this call splits on {sep!r} — "
                "paragraph keys would never match and nothing would "
                "be excised; rebuild the state with the same sep"
            )
    boiler = df_state.filter(F.col("df") >= max_df).select("para")
    kept = paras.join(F.broadcast(boiler), "para", "left_anti")
    return kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "para"))),
                lambda x: x["para"],
            ),
            sep,
        ).alias("clean_text"),
        F.first("n_paras").alias("n_paras"),
        F.count(F.lit(1)).alias("n_kept"),
    )


def paragraph_df_state(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
) -> DataFrame:
    """Mergeable state for the boilerplate rule: per-paragraph DOCUMENT
    frequency — ``(para, df)``. Because a paragraph is counted once per
    document and arriving batches carry DISJOINT document sets, df is
    ADDITIVE across batches (the i1 contract): the corpus-wide
    boilerplate set stays current under ingest without rescanning
    history. State is O(distinct paragraphs). The builder's ``sep``
    rides along as column metadata on ``para`` so a later
    ``boilerplate_excision`` against this state can detect a sep
    mismatch loudly (metadata survives a parquet round trip)."""
    toked = df.select(
        F.col(id_col), F.split(F.col(text_col), sep).alias("__paras")
    )
    return (
        toked.select(F.col(id_col), F.explode("__paras").alias("para"))
        .groupBy("para")
        .agg(F.count_distinct(F.col(id_col)).cast("long").alias("df"))
        .select(
            F.col("para").alias("para", metadata={_SEP_META_KEY: sep}),
            "df",
        )
    )


def paragraph_df_fold(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold two disjoint-document-subset df states: full-outer sum on
    the paragraph key — O(state), associative and commutative. Folding
    states built with DIFFERENT seps is a key-space mixup and raises;
    the (agreed) sep metadata is re-attached so folded state keeps the
    mismatch guard."""
    sep_b = base.schema["para"].metadata.get(_SEP_META_KEY)
    sep_d = delta.schema["para"].metadata.get(_SEP_META_KEY)
    if sep_b is not None and sep_d is not None and sep_b != sep_d:
        raise ValueError(
            f"paragraph_df_fold: states built with different seps "
            f"({sep_b!r} vs {sep_d!r}) share no paragraph key space"
        )
    sep = sep_b if sep_b is not None else sep_d
    b = base.select("para", F.col("df").alias("__b"))
    d = delta.select("para", F.col("df").alias("__d"))
    out = b.join(d, "para", "full").select(
        "para",
        (
            F.coalesce(F.col("__b"), F.lit(0))
            + F.coalesce(F.col("__d"), F.lit(0))
        ).cast("long").alias("df"),
    )
    if sep is not None:
        out = out.select(
            F.col("para").alias("para", metadata={_SEP_META_KEY: sep}),
            "df",
        )
    return out


def _shingled(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    # two-step: materialize the token array, THEN build shingles from the
    # column reference (inline split would re-tokenize per element_at)
    from big_data_flight_analytics_spark.operators.text import shingle_expr, tokens

    toked = df.select(F.col(id_col), tokens(text_col).alias("__toks"))
    return toked.select(
        F.col(id_col), shingle_expr(F.col("__toks"), n).alias("shingles")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
    max_df: int | None = None,
) -> DataFrame:
    """All doc pairs (a < b) with n-gram-shingle Jaccard >= threshold.

    Inverted-index join: docs sharing zero shingles never meet, so the
    candidate set is sparse. Output: doc_a, doc_b, jaccard (4dp).

    ``max_df`` (scale lever): shingles occurring in more than ``max_df``
    documents are excluded from CANDIDATE GENERATION only — a hot
    shingle in d docs contributes d*(d-1)/2 candidate pairs (quadratic
    in corpus growth when the shingle space saturates, measured 25x
    runtime at 10x corpus) but almost no signal. Jaccard is then
    verified on the FULL shingle sets via array_intersect, so emitted
    values are exact; only pairs whose every shared shingle is hot can
    be missed (recall trade, standard in dedup pipelines).
    """
    sh = _shingled(df, id_col, text_col, n)
    posting = sh.select(F.col(id_col), F.explode("shingles").alias("sh"))

    if max_df is None:
        sizes = sh.select(F.col(id_col), F.size("shingles").alias("n_sh"))
        a = posting.select(F.col(id_col).alias("doc_a"), "sh")
        b = posting.select(F.col(id_col).alias("doc_b"), "sh")
        inter = (
            a.join(b, "sh")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
        sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
        sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
        jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        return (
            inter.join(sa, "doc_a")
            .join(sb, "doc_b")
            .withColumn("jaccard", F.round(jac, 4))
            .filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard")
        )

    # all joins/shuffles run over 8-byte xxhash64 shingle ids instead of
    # ~20-byte strings (intersection COUNTS are identical — an in-pair
    # collision needs two distinct shingles at the same 64-bit value,
    # p ~ 80^2/2^64 — so Jaccard values and oracle parity are unchanged)
    hsh = sh.select(
        F.col(id_col),
        F.transform("shingles", lambda s: F.xxhash64(s)).alias("shingles"),
    )
    # the hashed-shingle frame feeds the posting branch AND both verify
    # broadcast sides; persisting computes the tokenize+shingle+hash
    # pipeline once instead of three times (min-of-3 A/B: 3.7 -> 3.3 s
    # at sf0.1). MEMORY_AND_DISK default spills at scale; the handle is
    # registered so catalog drivers release it after the terminal
    # action (see cache.release_tracked).
    hsh = tracked_persist(hsh)
    posting_h = hsh.select(F.col(id_col), F.explode("shingles").alias("sh"))
    capped = _cap_bucket_population(posting_h, ["sh"], max_df)
    a = capped.select(F.col(id_col).alias("doc_a"), "sh")
    b = capped.select(F.col(id_col).alias("doc_b"), "sh")
    candidates = (
        a.join(b, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return _verify_jaccard(candidates, hsh, id_col, threshold)


def winnow_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    window: int = 4,
    threshold: float = 0.2,
    max_df: int | None = None,
    fingerprints: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs with WINNOWED-fingerprint candidate generation.

    ``fingerprints`` lets a single-pass pipeline inject an
    already-built ``winnow_fingerprints`` frame (same ``k``/``window``)
    — the t7/d10 stage seam.

    NOTE (eager): constructing this frame runs a Spark job immediately
    — the hashed-shingle verify frame is materialized eagerly (both
    sides of the verify join consume it), so callers building plans
    speculatively pay the tokenize+shingle+hash pass up front.

    Same verify-exact contract as ``ngram_jaccard_pairs`` (emitted
    Jaccard values are computed on the FULL shingle sets), but the
    inverted-index join runs over winnowing fingerprints
    (text.winnow_fingerprints) instead of every shingle — ~2/(window+1)
    of the posting volume, the standard way to cut candidate-join cost
    at corpus scale. Recall trade is the winnowing guarantee: pairs
    sharing a contiguous run of >= window+k-1 tokens always share a
    fingerprint and are found; pairs whose overlap is only scattered
    short shingles can be missed. ``max_df`` caps hot-fingerprint
    buckets exactly like the shingle version.
    """
    from big_data_flight_analytics_spark.operators.text import (
        winnow_fingerprints,
    )

    fps = (
        fingerprints
        if fingerprints is not None
        else winnow_fingerprints(
            df, k=k, window=window, text_col=text_col, id_col=id_col
        )
    )
    posting = fps.withColumnRenamed("fingerprint", "sh")
    if max_df is not None:
        posting = _cap_bucket_population(posting, ["sh"], max_df)
    a = posting.select(F.col(id_col).alias("doc_a"), "sh")
    b = posting.select(F.col(id_col).alias("doc_b"), "sh")
    candidates = (
        a.join(b, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    # hashed shingle ids for the exact verify (intersection counts are
    # what matters — see ngram_jaccard_pairs). Both sides of the verify
    # join consume this frame and Spark shares no subplans, so without
    # materialization the tokenize+shingle+hash corpus pipeline runs
    # twice (r16); eager checkpoint per the round's
    # persist-vs-checkpoint doctrine (the d3 A/B).
    from big_data_flight_analytics_spark.cache import once_checkpoint

    hsh = once_checkpoint(
        _shingled(df, id_col, text_col, k).select(
            F.col(id_col),
            F.transform("shingles", lambda s: F.xxhash64(s)).alias("shingles"),
        )
    )
    return _verify_jaccard(candidates, hsh, id_col, threshold)


def containment_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_shared: int = 2,
) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing >= ``min_shared``
    n-gram shingles with any benchmark doc.

    Asymmetric containment (not symmetric Jaccard): a training document
    that CONTAINS a benchmark item must be flagged even when the rest
    of the document makes the Jaccard similarity tiny — the standard
    eval-leakage guard for training corpora.

    Scale design: the benchmark side is small by nature (an eval set),
    so its shingle posting list BROADCASTS; the corpus posting streams
    past it map-side — no corpus shuffle for the probe, one shuffle to
    aggregate shared-shingle counts per (benchmark, corpus) pair.
    Output: bench_doc, corpus_doc, n_shared.
    """
    bench_posting = F.broadcast(
        _shingled(benchmark, id_col, text_col, n).select(
            F.col(id_col).alias("bench_doc"), F.explode("shingles").alias("sh")
        )
    )
    corpus_posting = _shingled(corpus, id_col, text_col, n).select(
        F.col(id_col).alias("corpus_doc"), F.explode("shingles").alias("sh")
    )
    return (
        corpus_posting.join(bench_posting, "sh")
        .groupBy("bench_doc", "corpus_doc")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def containment_decon_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold_pct: int = 50,
) -> DataFrame:
    """Normalized-containment decontamination: corpus docs containing
    at least ``threshold_pct`` percent of a benchmark item's distinct
    n-gram shingles.

    The score is the ASYMMETRIC containment |A∩B| / |A| with A the
    BENCHMARK item's shingle set — the quantity that catches a short
    eval item quoted inside a long training document, where both
    symmetric Jaccard (|A∩B| / |A∪B| ≈ 0 because the document
    dominates the union — d2/d3's measure) and a raw shared-shingle
    floor (d7's ``min_shared``, which can't distinguish 3-of-80 from
    3-of-4) stay silent.

    Determinism: membership is decided by the INTEGER cross-multiply
    ``n_shared * 100 >= threshold_pct * |A|`` (exact in int64 — no
    float threshold compare to flip between engines); the reported
    ``containment`` double is one correctly-rounded IEEE divide of
    exact ints, rounded to 4dp for display only.

    Scale design (same as ``containment_overlap``): a benchmark is
    small by nature, so its shingle posting AND sizes broadcast; the
    corpus posting streams past map-side — no corpus shuffle for the
    probe, one shuffle for the per-pair aggregate. A shared-shingle
    bucket is bounded by the benchmark's size, so no ``max_df`` cap is
    needed. If the benchmark ever outgrows broadcast, band its posting
    with ``_minhash_band_posting`` and verify exactly as here.

    Output: bench_doc, corpus_doc, n_shared, containment. Pairs where
    the two ids coincide are NOT excluded — callers framing bench items
    as slices of corpus docs filter self-matches themselves.
    """
    bsh = _shingled(benchmark, id_col, text_col, n)
    bench_sizes = F.broadcast(
        bsh.select(
            F.col(id_col).alias("bench_doc"),
            F.size("shingles").alias("__bsz"),
        )
    )
    bench_posting = F.broadcast(
        bsh.select(
            F.col(id_col).alias("bench_doc"), F.explode("shingles").alias("sh")
        )
    )
    corpus_posting = _shingled(corpus, id_col, text_col, n).select(
        F.col(id_col).alias("corpus_doc"), F.explode("shingles").alias("sh")
    )
    shared = (
        corpus_posting.join(bench_posting, "sh")
        .groupBy("bench_doc", "corpus_doc")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.join(bench_sizes, "bench_doc")
        .filter(
            F.col("n_shared") * F.lit(100)
            >= F.lit(threshold_pct) * F.col("__bsz")
        )
        .select(
            "bench_doc",
            "corpus_doc",
            "n_shared",
            F.round(F.col("n_shared") / F.col("__bsz"), 4).alias(
                "containment"
            ),
        )
    )


def _cap_bucket_population(
    posting: DataFrame, keys: list[str], cap: int
) -> DataFrame:
    """Drop posting rows whose bucket holds more than ``cap`` entries.

    Implemented as a count over a window partitioned by the bucket key
    rather than groupBy + semi-join: one shuffle, and the output stays
    hash-partitioned on the key, so the self-join that follows in every
    caller reuses the partitioning instead of exchanging again
    (measured ~20% faster end-to-end on the shingle join).
    """
    w = Window.partitionBy(*keys)
    return (
        posting.withColumn("__df", F.count(F.lit(1)).over(w))
        .filter(F.col("__df") <= cap)
        .drop("__df")
    )


def _verify_jaccard(
    candidates: DataFrame, sh: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Exact Jaccard over full shingle arrays for candidate pairs.

    ``sh`` may carry raw shingle strings or hashed shingle ids — only
    intersection/union counts enter the result.
    """
    sh_a = sh.select(F.col(id_col).alias("doc_a"), F.col("shingles").alias("__sh_a"))
    sh_b = sh.select(F.col(id_col).alias("doc_b"), F.col("shingles").alias("__sh_b"))
    inter = F.size(F.array_intersect("__sh_a", "__sh_b"))
    union = F.size("__sh_a") + F.size("__sh_b") - inter
    return (
        candidates.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.when(union > 0, inter / union).otherwise(F.lit(0.0)), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 16,
    bands: int = 4,
    threshold: float = 0.2,
    max_band_df: int | None = None,
) -> DataFrame:
    """Near-dup pairs via MinHash banding, verified with exact Jaccard.

    bands x rows layout (rows = num_perm / bands): docs agreeing on ALL
    rows of any band become candidates (equi-join on the band hash —
    never a cross join); candidates are then verified against the exact
    n-gram Jaccard so output precision is 100%.

    Skew safety: docs with zero shingles (< n tokens) are dropped before
    banding — they cannot pass the verify, and a shared empty-signature
    bucket would otherwise pair every short doc with every other.
    ``max_band_df`` additionally drops band buckets holding more than
    that many docs (a bucket of d docs costs d*(d-1)/2 candidate pairs;
    boilerplate-heavy corpora concentrate there) — a recall-only trade,
    emitted pairs stay exact.
    """
    assert num_perm % bands == 0
    # Empty-shingle docs (< n tokens) are excluded STRUCTURALLY: the
    # posting explode emits no rows for an empty array, so they get no
    # signature, no band, and no candidates — no sentinel bucket, and no
    # size() filter either (a filter on the array re-derives the whole
    # tokenize+shingle tree under projection collapsing: measured
    # split() x15 in the optimized plan with it, x1 without).
    sh = _shingled(df, id_col, text_col, n)
    # reused by the signature posting AND the Jaccard-verify broadcast —
    # materialize to run the shingle pipeline once. Eager checkpoint,
    # not persist (r16): the d3 A/B showed the cached-plan path ~0.7 s
    # slower on both interleaved rounds (the round's
    # persist-vs-checkpoint doctrine).
    from big_data_flight_analytics_spark.cache import once_checkpoint

    sh = once_checkpoint(sh)
    posting = _minhash_band_posting(sh, id_col, num_perm, bands)

    if max_band_df is not None:
        posting = _cap_bucket_population(posting, ["band_key"], max_band_df)

    a = posting.select(F.col(id_col).alias("doc_a"), "band_key")
    b = posting.select(F.col(id_col).alias("doc_b"), "band_key")
    candidates = (
        a.join(b, "band_key").filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    # verify ONLY the candidates: exact Jaccard over full shingle arrays
    # — candidate-count work, not the full inverted-index pair join
    return _verify_jaccard(candidates, sh, id_col, threshold)


def _minhash_band_posting(
    sh: DataFrame, id_col: str, num_perm: int, bands: int
) -> DataFrame:
    """(id, band_key) posting rows from a shingle frame — the shared
    signature pipeline of ``minhash_lsh_pairs`` and
    ``minhash_index_delta`` (a signature depends only on the doc's own
    shingles, so split and joint computation agree exactly).

    Signature via explode + hash-agg: ONE md5 per shingle occurrence,
    two 28-bit ints parsed from its hex, and all num_perm permutations
    derived as (h1 + j*h2) mod p — integer min buffers instead of
    per-permutation md5 strings (no array lambdas either: projection
    collapsing re-derives the shingle array under each lambda,
    measured 4x slower). One shuffle on the doc id. Shingle arrays are
    distinct-element, so the min over posting rows equals the min over
    the array. conv() parses the hex halves in one call each (the
    equivalent 7-digit ascii chain compiles to a much larger codegen
    unit); the oracle SQL keeps the ascii arithmetic — only the VALUES
    must match, and both are exactly the integer value of the hex
    chars. All band keys emit in one select + one explode — a single
    pass over the aggregate instead of a bands-way union re-running it
    per branch.
    """
    rows = num_perm // bands
    posting_sh = sh.select(F.col(id_col), F.explode("shingles").alias("__sh"))
    hh = posting_sh.select(
        F.col(id_col), F.md5("__sh").alias("__h")
    ).select(
        F.col(id_col),
        F.conv(F.substring("__h", 1, 7), 16, 10).cast("long").alias("__h1"),
        F.conv(F.substring("__h", 8, 7), 16, 10).cast("long").alias("__h2"),
    )
    sig = hh.groupBy(id_col).agg(
        *[
            F.min((F.col("__h1") + F.lit(j) * F.col("__h2")) % MINHASH_P).alias(
                f"__s{j}"
            )
            for j in range(num_perm)
        ]
    )
    band_structs = [
        F.md5(
            F.concat_ws(
                "|",
                F.lit(str(bi)),
                *[F.col(f"__s{bi * rows + r}") for r in range(rows)],
            )
        )
        for bi in range(bands)
    ]
    return sig.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("band_key")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 16,
) -> DataFrame:
    """(id, n_shingles, sig) — the full MinHash signature ARRAY plus
    the exact shingle-set size, per document.

    Same permutation family as ``_minhash_band_posting`` (one md5 per
    shingle, two 28-bit hex ints, perms (h1 + j*h2) mod 2^31-1) but
    keeping every slot instead of banding them away: slot-level
    agreement between two signatures estimates Jaccard, and with the
    exact sizes stored alongside, containment (see
    ``sketch_containment_pairs``). Shingle-less docs (< n tokens) are
    structurally absent, exactly like the banded pipeline.
    """
    sh = _shingled(df, id_col, text_col, n)
    hh = (
        sh.select(F.col(id_col), F.explode("shingles").alias("__sh"))
        .select(F.col(id_col), F.md5("__sh").alias("__h"))
        .select(
            F.col(id_col),
            F.conv(F.substring("__h", 1, 7), 16, 10)
            .cast("long")
            .alias("__h1"),
            F.conv(F.substring("__h", 8, 7), 16, 10)
            .cast("long")
            .alias("__h2"),
        )
    )
    sig = hh.groupBy(id_col).agg(
        # shingle arrays are distinct-element, so COUNT(*) over the
        # exploded rows IS the exact set size
        F.count(F.lit(1)).cast("long").alias("n_shingles"),
        *[
            F.min(
                (F.col("__h1") + F.lit(j) * F.col("__h2")) % MINHASH_P
            ).alias(f"__s{j}")
            for j in range(num_perm)
        ],
    )
    return sig.select(
        F.col(id_col),
        "n_shingles",
        F.array(*[F.col(f"__s{j}") for j in range(num_perm)]).alias("sig"),
    )


def sketch_containment_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 32,
    threshold_pct: int = 50,
) -> DataFrame:
    """Estimated-containment decontamination SCREEN from MinHash
    sketches — the zero-shuffle scale path in front of d20's exact
    posting join.

    ``containment_decon_pairs`` computes |A∩B|/|A| exactly, which
    costs a posting join keyed on shingles. At 100 TB the screening
    form is this: sign the benchmark once (small by contract),
    broadcast the K sketches + exact sizes, and score every corpus
    document map-side against all of them — no shuffle touches the
    corpus beyond its own one signature aggregate. Survivors then go
    through the exact verify at candidate count, not corpus count.

    Estimator (Broder): slot agreement m of ``num_perm`` estimates
    Jaccard J ~= m/num_perm; with exact sizes sa=|A| (benchmark),
    sb=|B|, containment |A∩B|/|A| = J(sa+sb)/((1+J)sa), so the flag
    rule cross-multiplies to INTEGERS —
    ``100*m*(sa+sb) >= pct*(num_perm+m)*sa`` — engine-independent
    exactly like d20's membership rule (no floats decide a row).
    ``est_pct`` = FLOOR of the same ratio for reporting. The estimate
    is noisy at small set sizes (a 12-token slice has ~10 shingles):
    the screen trades exactness for the zero-shuffle plan, and its
    precision/recall against the exact operator is measured in
    DEDUP_QUALITY.md.

    Output: (bench_doc, corpus_doc, n_match, bench_size, corpus_size,
    est_pct) for flagged pairs; zero-agreement pairs never flag.
    """
    b = minhash_signatures(benchmark, id_col, text_col, n, num_perm).select(
        F.col(id_col).alias("bench_doc"),
        F.col("n_shingles").alias("bench_size"),
        F.col("sig").alias("__bsig"),
    )
    c = minhash_signatures(corpus, id_col, text_col, n, num_perm).select(
        F.col(id_col).alias("corpus_doc"),
        F.col("n_shingles").alias("corpus_size"),
        F.col("sig").alias("__csig"),
    )
    m = F.aggregate(
        F.zip_with(
            "__bsig", "__csig", lambda x, y: (x == y).cast("long")
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    num = F.lit(100) * F.col("n_match") * (
        F.col("bench_size") + F.col("corpus_size")
    )
    den = (F.lit(num_perm) + F.col("n_match")) * F.col("bench_size")
    return (
        c.crossJoin(F.broadcast(b))
        .withColumn("n_match", m)
        .filter(num >= F.lit(threshold_pct) * den)
        .select(
            "bench_doc",
            "corpus_doc",
            "n_match",
            "bench_size",
            "corpus_size",
            F.floor(num.cast("double") / den.cast("double"))
            .cast("long")
            .alias("est_pct"),
        )
    )


def minhash_index_frame(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 16,
    bands: int = 4,
) -> DataFrame:
    """(id, shingles, bands) — the PERSISTED MinHash index payload.

    Precomputing both the shingle set (the verify side) and the band
    keys (the candidate side) once at index build/absorb time is what
    makes a streaming refresh O(batch): without it every micro-batch
    re-tokenizes, re-shingles, and re-signs the WHOLE base corpus just
    to mark a handful of arriving rows. Shingle-less docs (< n tokens)
    keep an empty bands array — they can never collide, matching the
    from-text pipeline which emits no signature for them.
    """
    sh = _shingled(docs, id_col, text_col, n)
    posting = _minhash_band_posting(sh, id_col, num_perm, bands)
    per_doc = posting.groupBy(id_col).agg(
        F.collect_list("band_key").alias("bands")
    )
    return sh.join(per_doc, id_col, "left").select(
        F.col(id_col),
        "shingles",
        F.coalesce(
            F.col("bands"), F.array().cast("array<string>")
        ).alias("bands"),
    )


def minhash_index_delta(
    base: DataFrame,
    delta: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 16,
    bands: int = 4,
    threshold: float = 0.2,
    max_band_df: int | None = None,
    base_index: DataFrame | None = None,
) -> DataFrame:
    """Near-dup-mark ONE arriving document batch against a persisted
    MinHash band index: the ingest contract (i2 exact / i3 embedding)
    in text-Jaccard space — the trio's missing member.

    The 100 TB ingest pattern: the base corpus's (id, band_key)
    postings are the persisted index (stored BUCKETED by band_key so
    this operator never re-shuffles the base); each arriving batch is
    signed with the SAME permutation scheme (MinHash parameters are
    data-independent, so split and joint signing agree exactly),
    broadcast against the base postings, candidates are verified with
    exact n-gram Jaccard — base shingles are fetched only for
    candidate ids — and every delta doc with a qualifying base doc is
    marked a known near-dup of the lowest such base id. Work per
    refresh: one delta-side map + O(candidates) verifies; the base is
    never rescanned quadratically.

    ``max_band_df`` caps BASE band buckets (the index side — bucket
    population is an index-build-time property), the same recall-only
    hot-bucket trade as ``minhash_lsh_pairs``.

    Output: one row per DELTA doc — (id_col, matched_base_id nullable,
    dup_of_index), mirroring ``embedding_index_delta``.

    ``base_index`` (the O(batch) refresh path): a precomputed
    ``minhash_index_frame`` — (id, shingles, bands) — replaces the
    from-text base pipeline entirely, so a refresh does NO base-side
    tokenize/shingle/md5 work at all: base postings come from
    exploding the stored bands, verify shingles from the stored
    arrays. This is what "the base postings are the persisted index"
    means operationally; ``MinHashIndexSink`` maintains exactly this
    frame. ``base`` is ignored when ``base_index`` is given.
    """
    assert num_perm % bands == 0
    if base_index is not None:
        sh_b = tracked_persist(base_index.select(F.col(id_col), "shingles"))
        post_b = base_index.select(
            F.col(id_col), F.explode("bands").alias("band_key")
        )
    else:
        sh_b = tracked_persist(_shingled(base, id_col, text_col, n))
        post_b = _minhash_band_posting(sh_b, id_col, num_perm, bands)
    sh_d = tracked_persist(_shingled(delta, id_col, text_col, n))
    if max_band_df is not None:
        post_b = _cap_bucket_population(post_b, ["band_key"], max_band_df)
    post_d = _minhash_band_posting(sh_d, id_col, num_perm, bands)
    candidates = (
        post_b.select(F.col(id_col).alias("doc_a"), "band_key")
        .join(
            F.broadcast(
                post_d.select(F.col(id_col).alias("doc_b"), "band_key")
            ),
            "band_key",
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    # ids are disjoint across base/delta (ingest contract), so one
    # unioned shingle frame serves both verify sides
    verified = _verify_jaccard(
        candidates, sh_b.unionByName(sh_d), id_col, threshold
    )
    matches = verified.groupBy("doc_b").agg(
        F.min("doc_a").alias("matched_base_id")
    )
    return (
        delta.select(id_col)
        .join(
            F.broadcast(matches.withColumnRenamed("doc_b", id_col)),
            id_col,
            "left",
        )
        .select(
            id_col,
            "matched_base_id",
            F.col("matched_base_id").isNotNull().alias("dup_of_index"),
        )
    )


def _hex_digit(h: Column, i: int) -> Column:
    """Value 0-15 of the (1-based) i-th char of a lowercase hex string.

    ascii arithmetic — '0'-'9' are 48-57, 'a'-'f' are 97-102 — so both
    Spark and DuckDB compute the identical integer without any
    engine-specific hex parser.
    """
    a = F.ascii(F.substring(h, i, 1))
    return F.when(a < 58, a - 48).otherwise(a - 87)


# Mersenne prime for the (h1 + j*h2) mod p universal-hash family used by
# the MinHash permutations: h1, h2 are 28-bit md5 substrings, so
# h1 + 15*h2 < 2^33 — no 64-bit overflow in either engine.
MINHASH_P = (1 << 31) - 1


def simhash_signature(text_col: str = "text", bits: int = 32) -> Column:
    """SimHash: sign-sum of per-token hash bits -> integer signature.

    Token hash = md5(token); bit k of the hash is bit (k mod 4) of hex
    digit (k div 4) — cross-engine (see module docstring). For each bit
    k, sum +1/-1 over tokens; signature bit k = 1 iff the sum is
    positive. One aggregate pass per bit over the token-hash array
    (shift amounts must be Python ints for shiftright), all JVM-side.
    """
    from big_data_flight_analytics_spark.operators.text import tokens

    # the signature accumulates into ONE 64-bit long (1 << k terms), so
    # bit 63 would wrap sign and anything wider overflows — widen to an
    # array of longs if a >63-bit signature is ever needed
    assert 0 < bits <= 63
    hashes = F.transform(tokens(text_col), lambda t: F.md5(t))

    def bit_merge(k: int):
        # binary lambda factory: pyspark counts lambda params, so the
        # bit index must be closed over, not a default arg
        def merge(acc: Column, h: Column) -> Column:
            bit = F.shiftright(_hex_digit(h, k // 4 + 1), k % 4).bitwiseAND(F.lit(1))
            return acc + F.when(bit == 1, F.lit(1)).otherwise(F.lit(-1))

        return merge

    sig = F.lit(0).cast("long")
    for k in range(bits):
        bit_sum = F.aggregate(hashes, F.lit(0), bit_merge(k))
        sig = sig + F.when(bit_sum > 0, F.lit(1 << k).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32
) -> DataFrame:
    """(id, sim) signatures via explode + hash-aggregate — single pass.

    Equivalent to ``simhash_signature`` but token hashes are computed
    once (explode), the hex digits of each md5 are decoded once into
    ``bits/4`` small ints, and the per-bit popcounts are PACKED two to
    an aggregate: lane b of a 64-bit sum accumulates bit b's 0/1 at
    offset 32*b, so ``bits/2`` sums replace ``bits`` (aggregate-buffer
    updates dominate this agg — packing measured 13x faster at sf0.1,
    bit-identical output). Lane width 32 bits caps documents at 2^32-1
    tokens, far beyond any real document. Sign rule: bit k set iff
    ones(k) > tokens/2, i.e. 2*ones > n — exactly the +1/-1 sign-sum > 0
    of the per-token fold. Duplicate tokens weigh by multiplicity; one
    shuffle on the doc id.
    """
    from big_data_flight_analytics_spark.operators.text import tokens

    # single-long signature: see simhash_signature — 60 is the widest
    # multiple of 4 that fits without sign-wrap
    assert bits % 4 == 0 and 0 < bits <= 60
    n_digits = bits // 4
    toked = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("__t"))
    hashed = toked.select(F.col(id_col), F.md5("__t").alias("__h"))
    digits = hashed.select(
        F.col(id_col),
        *[_hex_digit(F.col("__h"), i + 1).alias(f"__d{i}") for i in range(n_digits)],
    )
    packs = []
    for i in range(n_digits):
        d = F.col(f"__d{i}").cast("long")
        for half in range(2):
            lo_bit = F.shiftright(d, 2 * half).bitwiseAND(F.lit(1))
            hi_bit = F.shiftright(d, 2 * half + 1).bitwiseAND(F.lit(1))
            packed = lo_bit + F.shiftleft(hi_bit.cast("long"), 32)
            packs.append(F.sum(packed).alias(f"__p{i}_{half}"))
    agg = digits.groupBy(id_col).agg(F.count(F.lit(1)).alias("__n"), *packs)

    lane_mask = F.lit((1 << 32) - 1)
    sig = F.lit(0).cast("long")
    for k in range(bits):
        i, b = k // 4, k % 4
        ones = F.shiftright(F.col(f"__p{i}_{b // 2}"), 32 * (b % 2)).bitwiseAND(
            lane_mask
        )
        sig = sig + F.when(
            2 * ones > F.col("__n"), F.lit(1 << k).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return agg.select(F.col(id_col), sig.alias("sim"))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
    max_hamming: int = 3,
    chunks: int = 4,
    max_chunk_df: int | None = None,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Pigeonhole: with ``chunks`` signature chunks and max_hamming <
    chunks, any qualifying pair agrees exactly on >= 1 chunk -> candidate
    generation is ``chunks`` equi-joins on chunk value, then an exact
    hamming verify via bit_count(xor).

    ``max_chunk_df`` (skew cap): near-zero signatures from short docs
    concentrate in few (chunk, value) buckets, and a bucket of d docs
    costs d*(d-1)/2 join pairs; buckets holding more than the cap are
    dropped before the pair join. Recall-only trade — a qualifying pair
    is missed only if EVERY chunk it agrees on is hot.
    """
    assert max_hamming < chunks
    chunk_bits = bits // chunks
    mask = (1 << chunk_bits) - 1
    sig = simhash_signatures(df, id_col, text_col, bits)
    # all chunk postings from one explode — a single pass over the
    # signature aggregate instead of a ``chunks``-way union re-running
    # it per branch
    chunk_structs = [
        F.struct(
            F.lit(ci).alias("ck"),
            F.shiftright(F.col("sim"), ci * chunk_bits)
            .bitwiseAND(F.lit(mask))
            .alias("cv"),
        )
        for ci in range(chunks)
    ]
    posting = sig.select(
        F.col(id_col), "sim", F.explode(F.array(*chunk_structs)).alias("__c")
    ).select(F.col(id_col), "sim", F.col("__c.ck").alias("ck"), F.col("__c.cv").alias("cv"))

    if max_chunk_df is not None:
        posting = _cap_bucket_population(posting, ["ck", "cv"], max_chunk_df)

    a = posting.select(
        F.col(id_col).alias("doc_a"), F.col("sim").alias("sim_a"), "ck", "cv"
    )
    b = posting.select(
        F.col(id_col).alias("doc_b"), F.col("sim").alias("sim_b"), "ck", "cv"
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        a.join(b, ["ck", "cv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def repeated_window_marks(
    docs: DataFrame,
    n: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Positions whose length-n token window recurs corpus-wide.

    The shared heavy stage of ``repeated_spans`` (report) and
    ``excise_repeated_spans`` (rewrite): hash every n-gram window once,
    count occurrences over a gram-partitioned window (one shuffle on
    the gram hash), keep window-start positions with count >=
    ``min_count``. Output: (id_col, pos).
    """
    hashes = F.transform(
        ngram_multiset_expr(tokens(text_col), n), lambda g: F.md5(g)
    )
    pos = docs.select(F.col(id_col), F.posexplode(hashes).alias("pos", "__g"))
    by_gram = Window.partitionBy("__g")
    return (
        pos.withColumn("__c", F.count(F.lit(1)).over(by_gram))
        .filter(F.col("__c") >= min_count)
        .select(id_col, "pos")
    )


def contaminated_window_marks(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Positions whose length-n token window appears ANYWHERE in the
    benchmark set — the decontamination form of
    ``repeated_window_marks`` (membership in the benchmark's gram set
    replaces corpus-frequency as the mark criterion).

    Feeding these marks to ``excise_repeated_spans`` removes the
    quoted eval material and keeps the rest of the document — the
    surgical alternative to dropping every doc d20 flags (Lee et al.
    2022 excise rather than delete for exactly this reason: the novel
    remainder is still good training data).

    Scale: the benchmark gram set is small by nature and broadcasts;
    the corpus position stream joins map-side — no corpus shuffle
    here at all (the excision's anti-join shuffles on the doc id
    downstream). Runs shorter than ``n`` tokens inside a document
    match no window and are not marked: n is the excision grain.
    Output: (id_col, pos).
    """
    gram_hashes = F.transform(
        ngram_multiset_expr(tokens(text_col), n), lambda g: F.md5(g)
    )
    bench_grams = F.broadcast(
        benchmark.select(F.explode(gram_hashes).alias("__g")).distinct()
    )
    pos = corpus.select(
        F.col(id_col), F.posexplode(gram_hashes).alias("pos", "__g")
    )
    return pos.join(bench_grams, "__g").select(id_col, "pos")


def repeated_spans(
    docs: DataFrame,
    n: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    marks: DataFrame | None = None,
) -> DataFrame:
    """Exact repeated-substring spans: the suffix-array dedup grain.

    Finds, per document, the maximal token spans whose every length-n
    token window also occurs elsewhere in the corpus (or again in the
    same document) — the substring-level duplication that document- and
    paragraph-grain dedup miss (boilerplate headers, licence blocks,
    templated sentences). This is the distributed re-formulation of the
    suffix-array approach of "Deduplicating Training Data Makes
    Language Models Better" (Lee et al., 2022): a suffix array is
    infeasible across 100 TB, but marking positions by corpus-frequent
    n-gram hash + merging adjacent marked positions yields the same
    >= n-token repeated spans with two linear shuffles (positions by
    gram hash for the frequency mark, then by doc for the run merge —
    the merge groupBy reuses the doc Exchange).

    Output: (doc_id, span_start, span_end_tok, n_windows) — token
    offsets inclusive, span covers tokens [span_start, span_end_tok].
    Windows are positional (multiset), so in-doc repetition also
    marks. md5 grams keep the operator oracle-checkable.

    ``marks`` lets a single-pass pipeline share the frequency-marked
    positions with ``excise_repeated_spans`` (see the plans-layer
    stage seam).
    """
    marked = (
        marks
        if marks is not None
        else repeated_window_marks(docs, n, min_count, id_col, text_col)
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    new_run = F.when(
        F.lag("pos").over(w).isNull()
        | (F.col("pos") - F.lag("pos").over(w) > 1),
        1,
    ).otherwise(0)
    sess = marked.withColumn(
        "__rid",
        F.sum(new_run).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        sess.groupBy(id_col, "__rid")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + n - 1).cast("long").alias("span_end_tok"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(id_col, "span_start", "span_end_tok", "n_windows")
    )


def excise_repeated_spans(
    docs: DataFrame,
    n: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    marks: DataFrame | None = None,
) -> DataFrame:
    """Substring-dedup rewrite: drop every corpus-repeated n-token run.

    The action half of ``repeated_spans`` — Lee et al. remove the
    repeated substrings rather than whole documents, keeping the
    novel remainder. Tokens covered by ANY corpus-frequent n-gram
    window are excised; the survivors are rejoined in original order
    (lowercased/whitespace-normalized, the same canonical form every
    fingerprint in this module uses).

    Output: (doc_id, clean_text, n_kept, n_removed) for every doc,
    including untouched ones (n_removed = 0) and fully-boilerplate ones
    (clean_text = '').

    Shape (r17, the covered-set rebuild): the gram-frequency mark is
    d15's; each doc's marked window STARTS collect into one sorted
    in-row array (a shuffle of marked positions only — ~24 B/row vs
    the former token-grain anti-join Exchange), merge into covered
    intervals with the sorted-runs fold (starts <= n apart chain into
    one interval, exactly the union of their [pos, pos+n-1] windows),
    and the clean text is the doc's own token array sliced at the
    interval GAPS — all map-side after one doc-keyed join. Removes,
    vs the r16 shape: the window->offset explode + distinct, the
    token-grain anti-join, the token-collect rebuild aggregate, and
    the third corpus pass for n_total (it rides the same row now).
    """
    toks = tokens(text_col)
    marked = (
        marks
        if marks is not None
        else repeated_window_marks(docs, n, min_count, id_col, text_col)
    )
    starts_df = marked.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(F.col("pos").cast("long"))
        ).alias("__ms")
    )
    base = (
        docs.select(
            F.col(id_col),
            F.when(
                F.trim(F.coalesce(F.col(text_col), F.lit(""))) != "", toks
            )
            .otherwise(F.array().cast("array<string>"))
            .alias("__tk"),
        )
        .join(starts_df, id_col, "left")
        .select(
            id_col,
            "__tk",
            F.coalesce(
                F.col("__ms"), F.array().cast("array<bigint>")
            ).alias("__ms"),
        )
    )
    # merged covered intervals: a start within n of its predecessor
    # extends the same interval (its window overlaps or abuts the
    # previous one), so interval heads are exactly the sorted starts
    # more than n after their predecessor
    ms = F.col("__ms")
    # empty-guard: F.sequence(1, 0) counts BACKWARDS (the _grams_of
    # caveat), so the size>0 branch gate is load-bearing; the
    # greatest-guard inside is too — OR does not short-circuit under
    # ANSI, so the i==1 probe must still read a valid index
    heads = F.when(
        F.size(ms) > 0,
        F.filter(
            F.sequence(F.lit(1), F.size(ms)),
            lambda i: (i == 1)
            | (
                F.element_at(ms, i)
                - F.element_at(ms, F.greatest(i - 1, F.lit(1)))
                > n
            ),
        ),
    ).otherwise(F.array().cast("array<int>"))
    with_heads = base.select(
        id_col, "__tk", "__ms", heads.alias("__hd")
    )
    hd = F.col("__hd")
    next_heads = F.concat(
        F.slice(hd, F.lit(2), F.greatest(F.size(hd) - 1, F.lit(0))),
        F.array(F.size(ms) + 1),
    )
    intervals = F.when(
        F.size(ms) > 0,
        F.zip_with(
            hd,
            next_heads,
            lambda h, nh: F.struct(
                F.element_at(ms, h).alias("s"),
                (F.element_at(ms, nh - 1) + (n - 1)).alias("e"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<s: bigint, e: bigint>>"))
    with_iv = with_heads.select(
        id_col, "__tk", intervals.alias("__iv")
    )
    tk, iv = F.col("__tk"), F.col("__iv")
    # kept tokens = the gaps around the covered intervals, in order
    gap_starts = F.concat(
        F.array(F.lit(0)), F.transform(iv, lambda v: v["e"] + 1)
    )
    gap_ends = F.concat(
        F.transform(iv, lambda v: v["s"] - 1), F.array(F.size(tk) - 1)
    )
    kept = F.flatten(
        F.zip_with(
            gap_starts,
            gap_ends,
            lambda gs, ge: F.slice(
                tk, (gs + 1).cast("int"), F.greatest(ge - gs + 1, F.lit(0)).cast("int")
            ),
        )
    )
    # kept is projected once (three consumers below; HOF expressions
    # see no CSE — the MMR staged-column lesson)
    with_kept = with_iv.select(
        id_col, F.size(tk).cast("long").alias("__nt"), kept.alias("__kept")
    )
    return with_kept.select(
        id_col,
        F.array_join(F.col("__kept"), " ").alias("clean_text"),
        F.size("__kept").cast("long").alias("n_kept"),
        (F.col("__nt") - F.size("__kept")).cast("long").alias("n_removed"),
    )


def sparse_cosine_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    grain: int = 100,
    max_df: int | None = None,
    ngram: int = 1,
) -> DataFrame:
    """All doc pairs (a < b) with tf-idf COSINE >= threshold — the
    sparse-vector similarity join (news-style near-dup / same-story
    detection; complements d2's set Jaccard, d4's frequency SimHash,
    d5's dense-embedding cosine).

    ``ngram`` sets the TERM space: 1 = whitespace unigrams; n>1 =
    n-gram phrases WITH multiplicity (``ngram_multiset_expr`` — tf is
    the signal, so d2's ``array_distinct`` shingles would be wrong
    here). Phrase terms matter when the unigram vocabulary is tiny
    relative to the corpus (every doc shares every word and idf
    carries no signal — exactly the shape of template-generated or
    boilerplate-heavy corpora).

    Exact-grain scoring under the LN doctrine (DESIGN.md #6): idf is
    ``FLOOR(grain * LN((N+1)/(df+1))) + grain`` (sklearn-smoothed, so
    weights never hit 0) computed once per TERM — a small key domain
    with exact-int LN inputs, identical doubles in any engine. Weights
    ``w = tf * idf_fp`` and all dots/norms are int64 sums of int64
    products; the final cosine is correctly-rounded IEEE double ops on
    exact ints (the v4 pattern), so the pair set is decided
    deterministically cross-engine.

    Overflow discipline (the bm25/dsir pattern): every weight is
    guarded ``w < 2^31`` in-plan (fail-loud assert_true; remedy:
    lower ``grain``), making each product < 2^62; the norm SUM is
    double-checked against 2^62 with a parallel double accumulation
    (1e-16 relative error absorbed by the 2x headroom), and every dot
    is then bounded by Cauchy-Schwarz: dot <= sqrt(na*nb) <=
    max(na, nb) < 2^62 — no further guard needed because all weights
    are non-negative, so every partial sum is <= the total.

    ``max_df`` (scale lever, the d2 contract): terms in more than
    ``max_df`` docs are dropped from CANDIDATE GENERATION only — a hot
    term in d docs contributes d*(d-1)/2 candidates and almost no idf
    signal. Cosine is then computed on the FULL weight vectors of the
    candidates, so emitted values are exact (precision 1.0; recall
    trade only).

    Plan (r16 rework — same output, ~2x less intermediate volume):
    tf agg on (doc, term); df via a term-partitioned WINDOW on the tf
    frame (one exchange replaces the old df-agg + shuffle-join-back,
    and the cap becomes a plain ``df <= max_df`` filter instead of a
    second posting pass); one-row N broadcast; then the dot is
    computed as an EXACT algebraic split: the capped-term self-join
    aggregates each pair's partial dot DIRECTLY (the join that used to
    only emit candidates now also does the capped half of the math),
    and a correction join adds the dropped-hot-term contributions for
    exactly those pairs — expanding candidates by each doc's DROPPED
    terms only (~half the rows of the old full-vector expansion;
    integer addition is associative, so partial + correction is
    bit-identical to the single-sum formulation and the oracle is
    unchanged). Output: doc_a, doc_b, cos.

    Term identity is a 60-bit md5-derived int64 (feature hashing),
    not the term string: every downstream shuffle, SMJ sort buffer,
    and the persisted weight frame carry 8 bytes instead of a phrase
    string (measured: the 30x-corpus run OOMed 32-way on string terms
    and fits after hashing). A collision merges two terms' tf/df
    IDENTICALLY in both engines — the oracle mirrors the same md5
    slice — and the expected collision count is ~n_terms^2 / 2^61
    (<< 1 below a billion distinct terms), so the trade is size, not
    determinism.
    """
    term_arr = (
        tokens(text_col)
        if ngram == 1
        else ngram_multiset_expr(tokens(text_col), ngram)
    )
    toks = (
        df.select(F.col(id_col), F.explode(term_arr).alias("__t"))
        .where(F.col("__t") != "")
        .select(
            F.col(id_col),
            F.conv(F.substring(F.md5("__t"), 1, 15), 16, 10)
            .cast("long")
            .alias("term"),
        )
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    # df via window: the tf frame re-partitions on `term` ONCE and the
    # per-term count rides along — the old shape (df agg on term, then
    # shuffle-join back onto tf) paid that exchange twice plus an SMJ
    tf = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )
    n = df.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    # idf per (doc, term) row off the windowed df — same value per
    # term as the old per-term frame (identical exact-int LN inputs)
    idf_fp = (
        F.floor(
            F.lit(grain)
            * F.log(
                (F.col("n_docs") + F.lit(1)).cast("double")
                / (F.col("df") + F.lit(1)).cast("double")
            )
        ).cast("long")
        + F.lit(grain)
    )
    w_raw = F.col("tf") * idf_fp
    # fail loud BEFORE any product can exceed int64: w < 2^31 makes
    # every w*w and wa*wb < 2^62. assert_true returns NULL on pass, so
    # anchoring the weight on .isNull() (the bm25_topk idiom) forces
    # the check to evaluate per row inside codegen with zero effect on
    # passing rows. (A coalesce(w, guard, w) anchor is DEAD here —
    # w_raw is never NULL, so coalesce short-circuits before the
    # guard; the ADVICE r9 finding.)
    guard = F.assert_true(
        w_raw < F.lit(2**31),
        F.lit(
            "sparse_cosine_pairs: tf*idf_fp >= 2^31 — products would "
            "overflow int64; lower `grain` (or pre-trim giant docs)"
        ),
    )
    # eagerly checkpointed (r16, was tracked_persist): weights feeds
    # the norms agg, the capped self-join (twice), and the dropped-term
    # correction (twice) — a cached plan re-materializes through
    # InMemoryRelation per consumer and measured ~1 s slower than the
    # checkpointed scan on the full query (7.7 vs 6.6 s warm).
    # once_checkpoint: single-pass frame, localCheckpoint only (no
    # durable-file leak on clusters — ADVICE r16).
    from big_data_flight_analytics_spark.cache import once_checkpoint

    weights = once_checkpoint(
        tf.crossJoin(F.broadcast(n)).select(
            F.col(id_col),
            "term",
            F.when(guard.isNull(), w_raw).alias("w"),
            "df",
        )
    )
    norms = weights.groupBy(id_col).agg(
        F.sum(F.col("w") * F.col("w")).alias("nsq"),
        F.sum((F.col("w") * F.col("w")).cast("double")).alias("__nsqd"),
    )
    norm_guard = F.assert_true(
        F.col("__nsqd") < F.lit(float(2**62)),
        F.lit(
            "sparse_cosine_pairs: doc norm^2 approaches 2^63 — the "
            "int64 sum would wrap silently; lower `grain`"
        ),
    )
    norms = norms.select(
        F.col(id_col),
        F.when(norm_guard.isNull(), F.col("nsq")).alias("nsq"),
    )
    capped = weights if max_df is None else weights.filter(
        F.col("df") <= max_df
    )
    ca = capped.select(
        F.col(id_col).alias("doc_a"), "term", F.col("w").alias("wa")
    )
    cb = capped.select(
        F.col(id_col).alias("doc_b"), "term", F.col("w").alias("wb")
    )
    # the capped-term self-join both GENERATES the candidate pairs and
    # aggregates their capped-half partial dots in the same pass (the
    # old shape emitted bare candidates here and re-joined each pair
    # against its FULL weight vector downstream)
    # checkpointed: feeds both the correction join and the final sum —
    # without it the capped self-join would evaluate twice (same
    # persist-vs-checkpoint measurement as `weights` above)
    partial = once_checkpoint(
        ca.join(cb, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot_capped"))
    )
    if max_df is None:
        dots = partial.select(
            "doc_a", "doc_b", F.col("dot_capped").alias("dot")
        )
    else:
        dropped_a = weights.filter(F.col("df") > max_df).select(
            F.col(id_col).alias("doc_a"), "term", F.col("w").alias("wa")
        )
        dropped_b = weights.filter(F.col("df") > max_df).select(
            F.col(id_col).alias("doc_b"), "term", F.col("w").alias("wb")
        )
        corr = (
            partial.select("doc_a", "doc_b")
            .join(dropped_a, "doc_a")
            .join(dropped_b, ["doc_b", "term"])
            .groupBy("doc_a", "doc_b")
            .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot_dropped"))
        )
        dots = (
            partial.join(corr, ["doc_a", "doc_b"], "left")
            .select(
                "doc_a",
                "doc_b",
                (
                    F.col("dot_capped")
                    + F.coalesce(F.col("dot_dropped"), F.lit(0))
                ).alias("dot"),
            )
        )
    na = norms.select(F.col(id_col).alias("doc_a"), F.col("nsq").alias("na"))
    nb = norms.select(F.col(id_col).alias("doc_b"), F.col("nsq").alias("nb"))
    cos = F.col("dot").cast("double") / (
        F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))
    )
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select("doc_a", "doc_b", cos.alias("cos"))
        .filter(F.col("cos") >= threshold)
    )
