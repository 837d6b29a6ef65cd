"""Deterministic sampling operators (training-data pipeline).

Reproducible corpus subsampling: every decision is a pure function of
the row key (md5-bucket), never of partitioning, task order, or an RNG
— rerunning the pipeline on re-shuffled input selects the identical
rows, which is what makes dataset cards and ablations reproducible.
Contrast with ``DataFrame.sample``/``sampleBy``, whose Bernoulli draw
depends on partition layout.

Map-only except for the broadcast of the (tiny) per-stratum rate table
— at 100 TB this is a single pass over the scan with no shuffle.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BUCKETS = 100


def md5_bucket(key: Column, buckets: int = BUCKETS) -> Column:
    """Deterministic [0, buckets) bucket from a key column: first 4 hex
    digits of md5, decoded. Same construction as the train/val split
    (``t2``), so one hash family governs all sampling decisions."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 4), 16, 10).cast("long")
        % buckets
    )


def stratified_sample(
    df: DataFrame,
    rates: Mapping[str, int],
    key_col: str = "doc_id",
    strata_col: str = "lang",
    default_pct: int = 100,
) -> DataFrame:
    """Keep ``rates[stratum]`` percent of each stratum (default
    ``default_pct`` for unlisted strata), chosen deterministically by
    key hash.

    The standard corpus-rebalancing op: downsample the dominant
    language/source without touching the rest. The rate table is a
    broadcast dimension (one row per stratum), so the plan is
    scan → broadcast-left-join → filter: no shuffle of the fact side,
    and Catalyst pushes column pruning through.
    """
    spark = df.sparkSession
    rates_df = spark.createDataFrame(
        [(k, int(v)) for k, v in sorted(rates.items())],
        f"{strata_col} string, pct int",
    )
    kept = (
        df.join(F.broadcast(rates_df), strata_col, "left")
        .withColumn("pct", F.coalesce(F.col("pct"), F.lit(int(default_pct))))
        .where(md5_bucket(F.col(key_col)) < F.col("pct"))
        .drop("pct")
    )
    # restore the caller's column order (the join moved strata_col first)
    return kept.select(*df.columns)


def mixture_sample(
    df: DataFrame,
    targets: Mapping[str, float],
    key_col: str = "doc_id",
    source_col: str = "source",
    resolution: int = 10_000,
) -> DataFrame:
    """Downsample sources to hit target mixture WEIGHTS with maximal
    retention — the data-mixing step of a training pipeline ("40%
    web, 30% code, 30% books").

    The bottleneck source (largest observed-count deficit relative to
    its weight) is kept whole; every other source is thinned
    deterministically (md5-bucket on ``key_col``) to match the target
    proportions. Sources absent from ``targets`` are dropped. The
    achieved mixture is exact up to 1/``resolution`` hash-bucket
    granularity.

    Plan: one tiny per-source count agg (broadcast back), a broadcast
    scalar for the bottleneck scale, then a map-side filter — the fact
    table is scanned once and never shuffled. Per-source keep
    thresholds use double arithmetic in a fixed operation order so the
    DuckDB oracle computes bit-identical thresholds.
    """
    spark = df.sparkSession
    tgt = spark.createDataFrame(
        [(k, float(v)) for k, v in sorted(targets.items())],
        f"{source_col} string, __w double",
    )
    counts = (
        df.join(F.broadcast(tgt), source_col, "inner")
        .groupBy(source_col, "__w")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    # achievable total scale: min over sources of n_s / w_s
    scale = counts.agg(F.min(F.col("__n") / F.col("__w")).alias("__scale"))
    thresholds = counts.crossJoin(F.broadcast(scale)).select(
        source_col,
        F.floor(
            F.lit(float(resolution)) * F.col("__w") * F.col("__scale")
            / F.col("__n")
        ).alias("__thresh"),
    )
    kept = (
        df.join(F.broadcast(thresholds), source_col, "inner")
        .where(md5_bucket(F.col(key_col), resolution) < F.col("__thresh"))
        .drop("__thresh")
    )
    return kept.select(*df.columns)


def pack_sequences(
    df: DataFrame,
    target_tokens: int,
    tokens_col: str = "n_tokens",
    key_col: str = "doc_id",
    buckets: int = 32,
) -> DataFrame:
    """Assign documents to ~``target_tokens`` packed training sequences
    (greedy contiguous fill) — the packing step before tokenized
    examples become fixed-length context windows.

    Documents are hash-bucketed (md5 on ``key_col``), ordered
    deterministically by key within each bucket, and a running token
    total assigns each doc to the sequence its cumulative span starts
    in: ``seq_in_bucket = floor(cum_before / target_tokens)``. A doc
    straddling a boundary belongs to the sequence it starts in (real
    packers split or pad there; assignment grain is what matters for
    sharding). Output adds ``bucket`` and a globally-unique ``seq_id``
    (bucket * 2^32 + seq_in_bucket).

    Scale: the window is partitioned by bucket, so parallelism ==
    ``buckets`` — set it to your shard count (hundreds at 100 TB), not
    the default 32. One shuffle on bucket; everything after is a local
    sort + running sum.
    """
    b = md5_bucket(F.col(key_col), buckets).alias("bucket")
    w = (
        Window.partitionBy("bucket")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(tokens_col).over(w)
    seq_in_bucket = F.floor(
        (cum - F.col(tokens_col)) / F.lit(int(target_tokens))
    )
    return df.withColumn("bucket", b).withColumn(
        "seq_id", F.col("bucket") * F.lit(2**32) + seq_in_bucket
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis A-ES).

    Every row gets the key ``u^(1/w)`` where ``u`` is a deterministic
    hash-uniform of ``(id, seed)``; the k largest keys are the sample.
    The A-ES guarantee: the result is distributed exactly as sequential
    weighted draws without replacement — but computed as one
    embarrassingly-parallel map + a top-k, so it works identically at
    any scale and any partitioning (the hash makes it a pure function
    of the DATA: same corpus + seed -> same sample on 1 or 1000
    executors — reproducible training subsets, unlike rand()-based
    sampling which changes under retry/repartition).

    Rows with non-positive/null weights are excluded (they can never
    be drawn). Ranking ties (impossible in practice at 2^53 hash
    resolution) break on ``id_col``.
    """
    from big_data_flight_analytics_spark.operators.core import top_k

    u = (
        F.abs(F.xxhash64(F.col(id_col), F.lit(seed)))
        .bitwiseAND(F.lit((1 << 53) - 1))
        + 1
    ) / F.lit(float(1 << 53))  # (0, 1]
    key = F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double"))
    keyed = df.filter(F.col(weight_col) > 0).withColumn("__aes_key", key)
    # TakeOrderedAndProject, never a global window: each partition
    # keeps its local top-k, the driver merges k-sized heaps
    return top_k(
        keyed, [F.col("__aes_key").desc(), F.col(id_col).asc()], k
    ).drop("__aes_key")


def dsir_weights(
    docs: DataFrame,
    target_value: str,
    *,
    target_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    grain: int = 1_000_000,
    _product_bound: int = 1 << 62,
) -> DataFrame:
    """DSIR-style importance weights from hashed-bigram features.

    Data Selection via Importance Resampling (Xie et al., NeurIPS
    2023): score every document by how much its hashed n-gram profile
    looks like a TARGET domain versus the RAW corpus. Per md5 bucket b
    of word bigrams, the weight is the add-one-smoothed log likelihood
    ratio ``ln( ((cnt_t[b]+1)/(S_t+B)) / ((cnt_r[b]+1)/(S_r+B)) )``;
    a document's score is the sum of its bigram-occurrence weights
    (multiset — repeated bigrams count, per the paper's bag-of-hashed-
    ngrams model). High scores = target-like; downstream selection is
    a threshold/top-k over the score (t6/t10-style).

    Exact-grain contract: bucket counts and totals are int64; each
    weight is ``FLOOR(grain * LN(exact-int product ratio))`` — LN on
    identical doubles (the driver-proven T4/T17 pattern) — and the
    per-doc score is an integer SUM of bucket weights, associative and
    engine-version-independent. int64 headroom: the ratio products are
    ``(cnt+1)*(S+B) < ~1e13`` at sf0.1; past ~1e9 corpus tokens cast
    to double BEFORE multiplying (still deterministic — same two
    int64s round the same way) or promote to DECIMAL(38,0).

    Plan (100 TB story): one bigram explode, ONE hash agg keyed on
    n_buckets (256) fixed buckets with map-side partial combine +
    conditional target counts (no second pass for the target
    distribution), a one-row totals agg over 256 rows, weights
    broadcast back to the exploded grams, one per-doc agg. Two real
    shuffles, both map-combined; the weight table is O(n_buckets)
    regardless of corpus size, so the broadcast never grows.

    Output: (id_col, target_col, n_bigrams, dsir_fp) — one row per
    document with >= 1 bigram.
    """
    from big_data_flight_analytics_spark.operators.text import (
        ngram_multiset_expr,
        tokens,
    )

    t = F.col(text_col)
    toks = F.filter(tokens(text_col), lambda x: x != "")
    grams = (
        docs.filter(t.isNotNull() & (F.trim(t) != ""))
        .select(
            F.col(id_col),
            F.col(target_col),
            F.explode(ngram_multiset_expr(toks, 2)).alias("gram"),
        )
        .select(
            id_col,
            target_col,
            md5_bucket(F.col("gram"), n_buckets).alias("bucket"),
        )
    )
    is_target = (F.col(target_col) == target_value).cast("long")
    # eagerly checkpointed (r16): both the weight grid's main branch
    # and the totals broadcast reference this 256-row frame, and each
    # unchecked reference re-runs the full corpus bigram explode + md5
    # — one redundant corpus pass removed. once_checkpoint, not
    # persist: the tiny materialized frame is read directly; a cached
    # plan measured slower than the recompute it saved (the t20/i11
    # finding).
    from big_data_flight_analytics_spark.cache import once_checkpoint

    bucket_counts = once_checkpoint(
        grams.groupBy("bucket").agg(
            F.sum(is_target).alias("cnt_t"),
            F.count(F.lit(1)).alias("cnt_r"),
        )
    )
    totals = bucket_counts.agg(
        F.sum("cnt_t").cast("long").alias("s_t"),
        F.sum("cnt_r").cast("long").alias("s_r"),
    )
    # overflow guard BEFORE any int64 product can wrap (the
    # rolling_zscore pattern): cnt_t <= cnt_r and s_t <= s_r, so
    # (cnt_r+1)*(s_r+B) bounds both the numerator and denominator
    # products. Checked in double (1e-16 relative error absorbed by
    # the 2x headroom to 2^63); assert_true returns NULL when the
    # bound holds, so anchoring on .isNull() keeps the check inside
    # codegen with zero effect on passing rows. Remedy per docstring:
    # cast to double before multiplying, or promote to DECIMAL(38,0).
    bound_ok = F.assert_true(
        F.coalesce(
            (F.col("cnt_r") + 1).cast("double")
            * (F.col("s_r") + n_buckets).cast("double"),
            F.lit(0.0),
        )
        <= F.lit(float(_product_bound)),
        F.lit(
            "dsir_weights: (cnt+1)*(S+B) exceeds 2^62 — int64 would "
            "wrap; cast to double before multiplying or promote to "
            "DECIMAL (see docstring)"
        ),
    )
    weights = (
        bucket_counts.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.when(
                bound_ok.isNull(),
                F.floor(
                    F.lit(float(grain))
                    * F.log(
                        (
                            (F.col("cnt_t") + 1)
                            * (F.col("s_r") + n_buckets)
                        ).cast("double")
                        / (
                            (F.col("cnt_r") + 1)
                            * (F.col("s_t") + n_buckets)
                        ).cast("double")
                    )
                ),
            ).alias("w_fp"),
        )
    )
    return (
        grams.join(F.broadcast(weights), "bucket")
        .groupBy(id_col, target_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("w_fp").cast("long").alias("dsir_fp"),
        )
    )
