"""In-engine quality classifier: batch perceptron over hashed n-gram
features, trained distributed under the exact-value hash gate (t21).

The LLM-pipeline stage this covers: a fasttext-style linear quality
filter (the DCLM / FineWeb-Edu shape — hashed bag-of-ngrams features,
linear decision) trained INSIDE the engine on labeled documents, then
applied to the whole corpus. Logistic loss needs a sigmoid (EXP is not
proven engine-identical the way LN is), so training uses the batch
PERCEPTRON: per round, sum y*x over the currently-misclassified docs
and add it to the weights — every quantity an int64, which makes the
trained model a pure, engine-portable function of the data (the
kmeans/pagerank doctrine applied to supervised learning) and lets the
DuckDB oracle replay training as unrolled CTE rounds.

Plan per round (the 100 TB shape):
- the weight table is ``n_buckets`` rows no matter the corpus — it
  broadcasts forever;
- margins: one broadcast join feature-rows x weights + one doc-keyed
  aggregate (map-side combined);
- gradient: one semi-join of feature rows against misclassified doc
  ids + one bucket-keyed aggregate to <= n_buckets rows. The
  misclassified set is O(corpus) rows in early rounds (round 2 can
  be nearly every doc), so it is NEVER broadcast — the semi-join
  rides the hash(id) partitioning both sides already carry (feat by
  construction; mis because the margin groupBy preserved it), so no
  side reshuffles.
Two corpus-keyed shuffles per round, both map-combined; the feature
frame is built once and persisted (one corpus pass total).

The train/apply split mirrors the langid (t20/s10) model-state
contract: ``perceptron_weights`` trains once and the weight table
persists as model state; ``perceptron_apply`` scores any batch of
documents against a stored table — the stateless, broadcast-join-only
shape the s11 ingest sink runs per micro-batch.

int64 bounds: |w_b| grows by at most the corpus's total gram count per
round; a doc's margin is bounded by its gram count times max|w|.
Past ~1e9 labeled grams, scale counts down (feature clipping) or
promote the margin sum to DECIMAL(38,0) — the in-plan guard below
fails loud before a wrap could corrupt a decision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from big_data_flight_analytics_spark.cache import tracked_persist
from big_data_flight_analytics_spark.operators.sampling import md5_bucket

W_BOUND = 1 << 40  # per-round guard: far under int64, far over real data


def _weight_guard(n_iter: int, bound: int = W_BOUND):
    return F.assert_true(
        F.coalesce(F.abs(F.col("w")) <= F.lit(bound), F.lit(True)),
        F.lit(
            "perceptron_quality: |w| exceeded 2^40 — margin sums could "
            f"wrap int64 within {n_iter} rounds at this feature scale; "
            "clip feature counts or promote margins to DECIMAL(38,0)"
        ),
    )


def perceptron_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
) -> DataFrame:
    """(id_col, y, bucket, x): md5-hashed word-bigram bucket COUNTS
    (multiset — the dsir/t18 feature family) plus the self-supervised
    label. Label (derivable by both engines from the text alone):
    y = +1 iff the doc's lexical diversity is at least 1/2
    (2 * distinct tokens >= total tokens), else -1 — the Gopher-style
    repetition axis. Callers with real labels join them in instead and
    everything downstream is unchanged. Docs with no bigram (empty /
    single-token / NULL text) produce no rows.

    The label is projected BEFORE the explode. A non-generator column
    sharing a select with ``explode`` lands in the Generate node's
    OUTPUT projection, re-evaluating it once per exploded row — for
    this label that is array_distinct over the full token array per
    BIGRAM, measured 2x on the whole entry (the post-Generate sibling
    of the projection-collapse hazard ``shingle_expr`` documents).
    Staging (y, grams) in their own per-doc projection keeps the
    Generate child evaluating y once per document.
    """
    from big_data_flight_analytics_spark.operators.text import (
        ngram_multiset_expr,
        tokens,
    )

    t = F.col(text_col)
    toks = F.filter(tokens(text_col), lambda x: x != "")
    lab = docs.filter(t.isNotNull() & (F.trim(t) != "")).select(
        F.col(id_col),
        # 2*distinct >= total — integer compare, engine-identical
        F.when(
            F.size(F.array_distinct(toks)) * 2 >= F.size(toks), F.lit(1)
        )
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("y"),
        ngram_multiset_expr(toks, 2).alias("__gs"),
    )
    base = lab.select(
        id_col, "y", F.explode(F.col("__gs")).alias("__g")
    )
    return base.groupBy(
        id_col, "y", md5_bucket(F.col("__g"), n_buckets).alias("bucket")
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))


def _margins(
    feat: DataFrame, weights: DataFrame, id_col: str, n_iter: int, bound: int
) -> DataFrame:
    """(id_col, y, margin) under ``weights``, guard evaluated in-plan."""
    guard = _weight_guard(n_iter, bound)
    guarded = weights.select(
        "bucket", F.when(guard.isNull(), F.col("w")).alias("w")
    )
    return (
        feat.join(F.broadcast(guarded), "bucket", "left")
        .groupBy(id_col, "y")
        .agg(
            F.sum(F.col("x") * F.coalesce(F.col("w"), F.lit(0)))
            .cast("long")
            .alias("margin")
        )
    )


def _packed(feat: DataFrame, id_col: str) -> DataFrame:
    """(id_col, y, __bx array<struct<bucket, x>>): one row per labeled
    document — the whole feature multiset packed in-row, so a training
    round's margin is a per-row integer fold instead of a broadcast
    join + doc-keyed aggregate (r17, guide §2.4). One exchange builds
    it (the same hash(id)-class shuffle the former repartition paid)."""
    return feat.groupBy(id_col, "y").agg(
        F.collect_list(F.struct("bucket", "x")).alias("__bx")
    )


def _guard_wd(wd: dict, n_iter: int, bound: int) -> None:
    """Driver-side twin of ``_weight_guard`` for driver-held weight
    state (same failure point — before the round that would consume
    the weights — and same message contract)."""
    if any(abs(v) > bound for v in wd.values()):
        raise ValueError(
            "perceptron_quality: |w| exceeded 2^40 — margin sums could "
            f"wrap int64 within {n_iter} rounds at this feature scale; "
            "clip feature counts or promote margins to DECIMAL(38,0)"
        )


def _w_row(spark, wd: dict, n_buckets: int) -> DataFrame:
    """Dense weight array as ONE broadcast data row (missing buckets
    are the 0 the former LEFT join coalesced)."""
    return spark.createDataFrame(
        [([int(wd.get(b, 0)) for b in range(n_buckets)],)],
        "__w array<bigint>",
    )


def _packed_margins(
    packed: DataFrame, w_row: DataFrame, id_col: str
) -> DataFrame:
    """(id_col, y, margin, __bx) — margin as the in-row integer fold
    ``sum(x * w[bucket])``: the identical int64 the former broadcast
    join + SUM aggregate produced (integer addition is order-free)."""
    margin = F.aggregate(
        F.col("__bx"),
        F.lit(0).cast("long"),
        lambda acc, bx: acc
        + bx["x"] * F.element_at(F.col("__w"), (bx["bucket"] + 1).cast("int")),
    )
    return packed.crossJoin(F.broadcast(w_row)).select(
        id_col, "y", margin.alias("margin"), "__bx"
    )


def _train(
    packed: DataFrame,
    id_col: str,
    n_iter: int,
    _w_bound: int,
    n_buckets: int,
) -> dict:
    """The training loop over a PERSISTED packed feature frame;
    returns the final driver-held weight dict.

    Weight state lives on the DRIVER between rounds (<= n_buckets
    int64s — the Lloyd/BPE model-state collect class, bounded by a
    hyper-parameter, never by corpus size) and returns to executors as
    a dense broadcast array row. Per round, ONE Spark job with NO
    joins and NO doc-grain shuffle (r17): a map pass folds each doc's
    margin in-row, misclassified rows explode their features, and the
    bucket-keyed gradient agg collects <= n_buckets rows. The r16
    shape additionally paid a broadcast weights join + a doc-keyed
    margin aggregate + a semi-join per round. The driver-side dict
    merge is the same full-join coalesce-sum algebra, so trained
    weights are bit-identical and the oracle's unrolled-CTE replay
    still matches. The |w| guard moves driver-side (`_guard_wd`) —
    same failure point, same message.
    """
    from big_data_flight_analytics_spark.cache import loop_confs

    spark = packed.sparkSession

    # round 1: w_0 = 0 -> y*margin = 0 <= 0 -> every doc misclassified
    w0 = (
        packed.select("y", F.explode("__bx").alias("__f"))
        .groupBy(F.col("__f.bucket").alias("bucket"))
        .agg(F.sum(F.col("y") * F.col("__f.x")).cast("long").alias("w"))
    )
    # this collect doubles as the feature-frame materialization action
    wd = {int(r["bucket"]): int(r["w"]) for r in w0.collect()}
    # scheduling-bound tiny-frame loop — the BPE/Lloyd loop_confs
    # contract applies (no join relies on AQE broadcast conversion)
    nparts = max(1, packed.rdd.getNumPartitions())
    with loop_confs(spark, nparts):
        for _ in range(n_iter - 1):
            _guard_wd(wd, n_iter, _w_bound)
            # standard perceptron rule: doc is misclassified iff
            # y*(w.x) <= 0 (sign(margin) != y, with 0 counted wrong)
            grad = (
                _packed_margins(packed, _w_row(spark, wd, n_buckets), id_col)
                .filter(F.col("y") * F.col("margin") <= 0)
                .select("y", F.explode("__bx").alias("__f"))
                .groupBy(F.col("__f.bucket").alias("bucket"))
                .agg(
                    F.sum(F.col("y") * F.col("__f.x"))
                    .cast("long")
                    .alias("__g")
                )
            )
            # dict merge == the old full-join coalesce-sum: buckets
            # absent from grad keep w; buckets absent from w start at 0
            for r in grad.collect():
                b = int(r["bucket"])
                wd[b] = wd.get(b, 0) + int(r["__g"])
    return wd


def _finalize(margins: DataFrame, id_col: str) -> DataFrame:
    return margins.select(
        id_col,
        F.col("y").alias("label"),
        "margin",
        F.when(F.col("margin") > 0, F.lit(1))
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("pred"),
    )


def perceptron_weights(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    n_iter: int = 4,
    _w_bound: int = W_BOUND,
) -> DataFrame:
    """Train only: the (bucket, w) weight table — model state to
    persist (the t15 merge-table / t20 profile pattern) and apply to
    any later batch with ``perceptron_apply``. <= n_buckets rows no
    matter the corpus. ``n_buckets``/``n_iter`` are part of the model:
    stored weights only score documents featurized with the same
    ``n_buckets``."""
    packed = tracked_persist(
        _packed(perceptron_features(docs, id_col, text_col, n_buckets), id_col)
    )
    wd = _train(packed, id_col, n_iter, _w_bound, n_buckets)
    return packed.sparkSession.createDataFrame(
        sorted((int(b), int(v)) for b, v in wd.items()),
        "bucket bigint, w bigint",
    )


def perceptron_apply(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    _w_bound: int = W_BOUND,
) -> DataFrame:
    """Score documents against a stored weight table — stateless, one
    corpus pass: featurize, broadcast-join the <= n_buckets weight
    rows, one doc-keyed margin aggregate. The per-micro-batch shape
    the s11 ingest sink runs. Output matches ``perceptron_quality``:
    (id_col, label, margin, pred), pred = +1 iff margin > 0."""
    feat = perceptron_features(docs, id_col, text_col, n_buckets)
    return _finalize(_margins(feat, weights, id_col, 1, _w_bound), id_col)


def perceptron_quality(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    n_iter: int = 4,
    _w_bound: int = W_BOUND,
) -> DataFrame:
    """Train + apply the hashed-bigram batch perceptron on one corpus
    (the t21 catalog entry): ``perceptron_weights`` then the final
    margin pass, sharing ONE persisted feature frame so the corpus is
    featurized exactly once.

    Training: w_1[b] = sum over ALL docs of y*x_b (round 1 against
    w_0 = 0 gives every doc y*margin = 0 <= 0 — misclassified for
    BOTH labels); rounds 2..n_iter add sum(y*x) over docs the
    current w misclassifies under the standard perceptron rule
    y*(w.x) <= 0, so false positives (y=-1, margin > 0) get
    corrective negative updates and correctly-classified docs never
    reinforce. No learning rate: integer updates keep every engine
    bit-identical.

    Output: one row per document with >= 1 bigram —
    (id_col, label, margin, pred), pred = +1 iff final margin > 0.
    """
    spark = docs.sparkSession
    packed = tracked_persist(
        _packed(perceptron_features(docs, id_col, text_col, n_buckets), id_col)
    )
    wd = _train(packed, id_col, n_iter, _w_bound, n_buckets)
    _guard_wd(wd, n_iter, _w_bound)
    final = _packed_margins(
        packed, _w_row(spark, wd, n_buckets), id_col
    ).select(id_col, "y", "margin")
    return _finalize(final, id_col)
