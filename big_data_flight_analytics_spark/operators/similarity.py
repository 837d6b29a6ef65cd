"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — broadcast the (small) query set
against the corpus, rank per query. Fully partition-parallel: each corpus
partition scores its rows; TakeOrdered/window reduces to k.

Scale path: sign-LSH bucketing (axis-aligned random hyperplanes): corpus
and queries get a b-bit sign signature; candidates come from an
equi-join on the bucket id, so the per-query candidate set shrinks
~2^b x (at recall cost). Deterministic — oracle-expressible in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from big_data_flight_analytics_spark.cache import loop_checkpoint, loop_confs
from big_data_flight_analytics_spark.functions.vector import (
    cosine_fixedpoint_from_nsq,
    cosine_from_norms,
    cosine_similarity,
    dot_product,
    l2_norm,
    norm_sq_fixedpoint,
)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dp: int = 4,
) -> DataFrame:
    """Top-k cosine neighbors per query (query_id, neighbor_id, sim).

    Ranking uses the ROUNDED similarity with neighbor-id tie-break so
    results are stable across engines/precision. Self-matches excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        l2_norm(F.col(vec_col)).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        l2_norm(F.col(vec_col)).alias("__cn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_from_norms(
                F.col("__qvec"), F.col("__cvec"),
                F.col("__qn"), F.col("__cn"), dp=dp,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim")
    )


def sign_bucket(vec_col: str = "embedding", bits: int = 4, offset: int = 0):
    """Axis-aligned sign-LSH bucket id from ``bits`` components starting
    at dimension ``offset`` (0-based). Components beyond the vector's
    length read as bit 0 (``element_at`` past the end is NULL) — pick
    ``offset + bits <= dim`` for a genuinely independent probe."""
    v = F.col(vec_col)
    bucket = F.lit(0)
    for i in range(bits):
        bit = (
            F.when(F.element_at(v, offset + i + 1) > 0, F.lit(1))
            .otherwise(F.lit(0))
        )
        bucket = bucket * 2 + bit
    return bucket


def _probe_dim_guard(vec_col: str, need: int, op: str):
    """In-plan guard: the highest sign-window dimension must exist.

    ``sign_bucket`` reads past-end components as bit 0, so an
    oversized ``probes * bits`` silently collapses the outer windows
    into duplicates of each other — the promised recall quietly never
    materializes. assert_true returns NULL when the bound holds
    (raises otherwise), so anchoring the last probe's bucket on
    ``.isNull()`` keeps the check inside codegen with zero effect on
    passing rows and zero extra jobs. NULL vectors pass through
    (coalesce) — they bucket to 0 exactly as before the guard.
    """
    return F.assert_true(
        F.coalesce(F.size(F.col(vec_col)) >= F.lit(need), F.lit(True)),
        F.lit(
            f"{op}: probes*bits={need} exceeds the vector dimension — "
            "sign windows past the end read as bit 0 and duplicate "
            "each other, silently losing the promised recall; lower "
            "probes or bits"
        ),
    )


def adaptive_bits(n: int, target_bucket_size: int = 256) -> int:
    """Sign-LSH bit width for an ``n``-row corpus: enough buckets that
    the mean population is ~``target_bucket_size``. Deterministic in
    ``n``, so an oracle can recompute it from COUNT(*) (GREATEST /
    CEIL / LOG2 are IEEE-double in both engines; powers of two hit
    exact log2 values, so the ceil never straddles an ulp)."""
    import math

    return max(1, math.ceil(math.log2(max(n / target_bucket_size, 2))))


def embedding_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int | None = None,
    dp: int = 4,
    target_bucket_size: int = 256,
    corpus_count: int | None = None,
    probes: int = 1,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, sim >= threshold).

    Candidate generation via the sign-LSH bucket equi-join (same-bucket
    pairs only), exact cosine verify. At 100 TB the bucket join replaces
    the O(n^2) cross join; recall is bounded by the bucket scheme (pairs
    straddling a sign boundary on the first ``bits`` dims are missed) —
    the implemented recall lever is multi-probe (``probes`` in the
    shared ``_bucket_scored_pairs`` core): candidates union several
    disjoint sign windows, recovering boundary-straddling pairs at
    ~linear cost (measured curve in BASELINE.md).

    Scale lever: within-bucket work is quadratic in bucket population
    (measured 23x runtime at 10x corpus with fixed bits=4), so ``bits``
    must grow ~log2(n) with the corpus. The default ``bits=None``
    derives it via ``adaptive_bits`` — the scale-safe configuration, and
    still oracle-reproducible because the oracle recomputes the same
    width from COUNT(*). The count is taken on a persisted corpus so the
    signature scan reuses the cached data instead of re-reading the
    source; at warehouse scale pass ``corpus_count`` from table/catalog
    statistics instead (a 100 TB corpus should not be cached for a
    count), which keeps the plan fully lazy with a single scan.
    """
    return _bucket_scored_pairs(
        corpus, id_col, vec_col, bits, dp, target_bucket_size,
        corpus_count, ordered=True, probes=probes,
    ).filter(F.col("sim") >= threshold)


def _bucket_scored_pairs(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    bits: int | None,
    dp: int,
    target_bucket_size: int,
    corpus_count: int | None,
    ordered: bool,
    probes: int = 1,
    fp_scale: int | None = None,
) -> DataFrame:
    """Exact-cosine-scored same-bucket candidate pairs — the shared
    candidate-generation core of ``embedding_neardup_pairs`` (ordered
    a < b, thresholded by the caller) and ``knn_graph`` (both
    directions, ranked by the caller). Any change to the bucketing
    scheme (multi-probe, rotated bucketings, the persist-for-count
    pattern) belongs HERE — the d5 and v4 oracles both mirror this
    logic and must be updated in lockstep.

    ``probes`` > 1 unions candidates from ``probes`` DISJOINT sign
    windows (dimensions [p*bits, (p+1)*bits)): a pair straddling one
    window's sign boundary is recovered by another — the recall lever
    the single-probe scheme trades away. Cost is ~probes x the
    candidate volume; duplicates are dropped before scoring reaches
    the caller (a pair's sim is identical from every probe).
    Requires ``probes * bits <= dim`` for independent probes.

    ``fp_scale`` switches the similarity to the exact-grain fixed-point
    form (``cosine_fixedpoint_from_nsq``): dot and squared norms are
    int64 sums of FLOOR-scaled elementwise products, so the score —
    and any rank boundary decided by it — is bit-identical across
    engines AND engine versions (no double fold order, no ROUND).
    ``dp`` is ignored in that mode. Used by the kNN-graph family,
    where a rank-5 boundary flip changes every downstream edge.
    """
    if probes < 1:
        raise ValueError(f"probes must be >= 1, got {probes}")
    if bits is None:
        if corpus_count is None:
            from big_data_flight_analytics_spark.cache import tracked_persist

            corpus = tracked_persist(corpus)
            corpus_count = corpus.count()
        bits = adaptive_bits(corpus_count, target_bucket_size)
    pair_filter = (
        F.col("vec_a") < F.col("vec_b")
        if ordered
        else F.col("vec_a") != F.col("vec_b")
    )
    norm_expr = (
        norm_sq_fixedpoint(F.col(vec_col), fp_scale)
        if fp_scale is not None
        else l2_norm(F.col(vec_col))
    )
    frames = []
    for p in range(probes):
        bucket = sign_bucket(vec_col, bits, offset=p * bits)
        if p == probes - 1:
            # the outermost window's top dimension bounds them all
            guard = _probe_dim_guard(
                vec_col, probes * bits, "_bucket_scored_pairs"
            )
            bucket = F.when(guard.isNull(), bucket)
        sig = corpus.select(
            F.col(id_col),
            F.col(vec_col).alias("__v"),
            norm_expr.alias("__n"),
            bucket.alias("__bucket"),
        )
        a = sig.select(
            F.col(id_col).alias("vec_a"), F.col("__v").alias("__va"),
            F.col("__n").alias("__na"), "__bucket",
        )
        b = sig.select(
            F.col(id_col).alias("vec_b"), F.col("__v").alias("__vb"),
            F.col("__n").alias("__nb"), "__bucket",
        )
        frames.append(
            a.join(b, "__bucket")
            .filter(pair_filter)
            .select("vec_a", "vec_b", "__va", "__vb", "__na", "__nb")
        )
    cand = frames[0]
    for f in frames[1:]:
        cand = cand.unionByName(f)
    sim_expr = (
        cosine_fixedpoint_from_nsq(
            F.col("__va"), F.col("__vb"),
            F.col("__na"), F.col("__nb"), fp_scale,
        )
        if fp_scale is not None
        else cosine_from_norms(
            F.col("__va"), F.col("__vb"),
            F.col("__na"), F.col("__nb"), dp=dp,
        )
    )
    scored = cand.select("vec_a", "vec_b", sim_expr.alias("sim"))
    if len(frames) > 1:
        # dedupe AFTER scoring (r16): a pair co-bucketed in several
        # probe windows is scored once per probe (a bounded CPU
        # duplicate — the sim from every probe is the identical
        # value), but the dedup exchange then carries (a, b, sim) —
        # ~24 bytes/row — instead of two full embedding vectors
        # (~2 KB/row at dim 128). Shuffle metadata, not payloads
        # (guide §2.3/§8); the surviving (a, b, sim) set is identical
        # either way. Measured: wash at sf0.1 (the dot is CPU-bound
        # locally), ~100x fewer dedup-exchange bytes at any scale.
        scored = scored.dropDuplicates(["vec_a", "vec_b"])
    return scored


def kmeans_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
) -> DataFrame:
    """Seeded k-means centroid table for ``ivf_topk``: (__cid, __cvec).

    Distributed Lloyd iterations over a k-means|| init
    (``pyspark.ml.clustering.KMeans``) — the corpus never leaves the
    cluster; only the ``n_centroids`` centers (inherently driver-side
    model state) come back to build the tiny centroid table. The fixed
    ``seed`` makes runs repeatable on identical data/partitioning,
    though unlike the min-id stub the result is not an engine-portable
    deterministic function of the data — hence centroids are an
    ``ivf_topk`` INPUT, not part of the oracle-checked catalog query.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = corpus.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_centroids, seed=seed, maxIter=max_iter).fit(feats)
    centers = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return corpus.sparkSession.createDataFrame(
        centers, schema="__cid long, __cvec array<double>"
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dp: int = 4,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: coarse-quantize the corpus into
    ``n_centroids`` cells, probe only the ``nprobe`` nearest cells per
    query, rank exact cosine within the probed candidates.

    Default centroid selection is deterministic (the ``n_centroids``
    corpus vectors with the smallest ids) so the oracle can reproduce
    it; pass ``centroids`` (``(__cid, __cvec)``, e.g. from
    ``kmeans_centroids``) for data-adaptive cells with real ANN recall
    — every stage downstream of the centroid table is unchanged.

    Scale design (r16, guide §2.4): the centroid table is packed into
    ONE broadcast array row, so cell assignment is a per-row
    ``array_max`` fold — the corpus never shuffles for assignment at
    all (the former max_by hash aggregate still exchanged |corpus|
    rows with their vectors), and the per-query probe selection is a
    sorted ``slice`` of the same fold, not a window. The only shuffle
    left in the whole operator is the final per-query top-k window
    over candidate scores. Per-query work drops from |corpus| to
    ~|corpus| * nprobe / n_centroids. Recall is bounded by the probe
    count — raise ``nprobe`` toward ``n_centroids`` to trade speed
    back for exactness.
    """
    if centroids is None:
        centroids = (
            corpus.orderBy(F.col(id_col).asc())
            .limit(n_centroids)
            .select(
                F.col(id_col).alias("__cid"), F.col(vec_col).alias("__cvec")
            )
        )
    # centroids travel as DATA packed c-ascending into one array row
    # (the _cent_rows_df doctrine — never expression literals);
    # sort_array order does not affect results (argmax/sort below are
    # by (csim, -cid), unique), it just keeps the pack deterministic
    cents_arr = F.broadcast(
        centroids.select(
            F.struct(
                F.col("__cid").alias("c"),
                F.col("__cvec").alias("v"),
                l2_norm(F.col("__cvec")).alias("n"),
            ).alias("__ce")
        ).agg(F.sort_array(F.collect_list("__ce")).alias("__cents"))
    )

    def scored_structs(df: DataFrame, out_id: str) -> DataFrame:
        # per row: array<struct<s, t, c>> of (csim, -cid, cid) over the
        # packed centroids — row norm computed once, reused for every
        # centroid AND carried to the final pair scoring. struct
        # ordering by (s, t) is exactly the former (csim DESC, cid ASC)
        # under max/descending sort; c rides along as payload (t
        # determines c, so it never decides a comparison).
        return df.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias("__v"),
            l2_norm(F.col(vec_col)).alias("__n"),
        ).crossJoin(cents_arr).select(
            out_id,
            "__v",
            "__n",
            F.transform(
                "__cents",
                lambda ce: F.struct(
                    cosine_from_norms(
                        F.col("__v"), ce["v"], F.col("__n"), ce["n"], dp=dp
                    ).alias("s"),
                    (-ce["c"]).alias("t"),
                    ce["c"].alias("c"),
                ),
            ).alias("__scored"),
        )

    # corpus assignment (1 cell per row): map-side argmax — identical
    # ordering to the former max_by(struct(__v,__n,__cid),
    # struct(csim, -cid)) aggregate, zero shuffle
    assigned = scored_structs(corpus, "neighbor_id").select(
        "neighbor_id",
        "__v",
        "__n",
        F.array_max("__scored")["c"].alias("__cell"),
    )
    # probes: top-nprobe cells per query as a descending sorted slice —
    # same (csim DESC, cid ASC) order the former row_number window used
    probes = scored_structs(queries, "query_id").select(
        "query_id",
        "__v",
        "__n",
        F.explode(
            F.slice(F.reverse(F.array_sort("__scored")), 1, nprobe)
        ).alias("__probe"),
    ).select(
        "query_id", "__v", "__n", F.col("__probe")["c"].alias("__cell")
    )
    scored = (
        # broadcast the probe side (|queries| * nprobe rows) so the
        # assigned corpus never shuffles for the candidate join
        assigned.join(
            F.broadcast(
                probes.select(
                    "query_id",
                    F.col("__v").alias("__qv"),
                    F.col("__n").alias("__qn"),
                    "__cell",
                )
            ),
            "__cell",
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_from_norms(
                F.col("__qv"), F.col("__v"),
                F.col("__qn"), F.col("__n"), dp=dp,
            ).alias("sim"),
        )
    )
    # no dedup needed: each corpus row lives in exactly one cell, so a
    # (query, neighbor) pair can appear at most once
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim")
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 4,
    dp: int = 4,
) -> DataFrame:
    """Approximate top-k: rank only within the query's sign-LSH bucket.

    The bucket equi-join replaces the cross join — at 100 TB the corpus
    shuffles once on bucket id (or is bucketed at rest) and each query
    touches ~corpus/2^bits candidates.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        l2_norm(F.col(vec_col)).alias("__qn"),
        sign_bucket(vec_col, bits).alias("__bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        l2_norm(F.col(vec_col)).alias("__cn"),
        sign_bucket(vec_col, bits).alias("__bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "__bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_from_norms(
                F.col("__qvec"), F.col("__cvec"),
                F.col("__qn"), F.col("__cn"), dp=dp,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "sim")
    )


def knn_graph(
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int | None = None,
    dp: int = 4,
    target_bucket_size: int = 256,
    corpus_count: int | None = None,
    probes: int = 1,
    fp_scale: int | None = None,
) -> DataFrame:
    """Approximate k-nearest-neighbor graph over the whole corpus.

    Every vector gets its top-``k`` most-cosine-similar neighbors among
    its sign-LSH bucket mates — the all-pairs counterpart of
    ``embedding_neardup_pairs`` (which thresholds) and the input
    artifact for semantic-dedup / clustering pipelines that operate on
    a kNN graph rather than a threshold pair list (SemDeDup-style
    corpus curation).

    Output: (vec_a, vec_b, sim, rank) with rank 1..k per vec_a;
    a vector with no bucket mate in ANY probe emits no rows.

    ``probes`` is the recall lever: candidates union ``probes``
    disjoint sign windows (dims [p*bits, (p+1)*bits); keep
    probes * bits <= dim). Measured recall@5 vs exact kNN on the
    near-isotropic sf0.01 corpus: 0.38 / 0.59 / 0.84 / 0.98 at
    1 / 2 / 4 / 8 probes, at ~linear candidate cost (BASELINE.md).

    Scale: the bucket equi-join replaces the O(n^2) cross join;
    ``adaptive_bits`` grows the bucket count with the corpus so
    within-bucket work stays ~target_bucket_size^2 per bucket. The
    top-k window partitions by vector id — bounded partitions (bucket
    population), never corpus-wide. Ties at the k boundary break on
    neighbor id, so the graph is deterministic.

    ``fp_scale`` (recommended for oracle-gated consumers, e.g. the
    PageRank family) ranks by the exact-grain fixed-point cosine — the
    k-boundary edge set then cannot flip with an oracle engine's
    reduction fold order or ROUND version (see
    ``cosine_fixedpoint_from_nsq``); ``dp`` is ignored in that mode.
    """
    scored = _bucket_scored_pairs(
        corpus, id_col, vec_col, bits, dp, target_bucket_size,
        corpus_count, ordered=False, probes=probes, fp_scale=fp_scale,
    )
    w = Window.partitionBy("vec_a").orderBy(
        F.col("sim").desc(), F.col("vec_b").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def semantic_prune(
    corpus: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pairs: DataFrame | None = None,
    **neardup_kwargs,
) -> DataFrame:
    """SemDeDup-style semantic pruning over embedding space.

    ``pairs`` lets a single-pass pipeline inject the d5 pair frame
    (same threshold/bucketing) — the d5/d13 stage seam.

    A vector is pruned iff ANY lower-id vector in its sign-LSH bucket
    is cosine-similar above ``threshold`` — including a lower vector
    that was itself pruned. On similarity CHAINS (sim(1,2) and sim(2,3)
    above threshold but sim(1,3) below) this is deliberately more
    aggressive than an iterative keep-first sweep: 3 is pruned here
    because of 2, where keep-first would retain it once 2 fell. The
    transitive rule is one scalable join; true keep-first is inherently
    sequential per similar set (each decision depends on earlier
    keeps) — if that semantics is required, run connected components
    over the pair graph (``operators/graph.dedup_clusters``) and keep
    one per cluster instead.

    Output: (id_col, pruned) for EVERY corpus vector — filtering
    ``~pruned`` yields the semantically deduplicated corpus.

    Pure composition: candidate pairs come from
    ``embedding_neardup_pairs`` (bucketed, capped, never all-pairs), so
    the scale properties are inherited; the marking adds one distinct
    on pruned ids and one left join keyed by vector id.
    """
    if pairs is None:
        pairs = embedding_neardup_pairs(
            corpus, threshold=threshold, id_col=id_col, vec_col=vec_col,
            **neardup_kwargs,
        )
    pruned = (
        pairs.select(F.col("vec_b").alias(id_col))
        .distinct()
        .withColumn("__pruned", F.lit(True))
    )
    # shuffle-hash, not sort-merge: both sides are corpus-scale (the
    # pruned set can approach corpus size, so broadcast is NOT safe),
    # and the join key is a unique id — hashing beats sorting two
    # corpus-sized relations. AQE would often make this call at
    # runtime; the hint pins it.
    return (
        corpus.select(id_col)
        .join(pruned.hint("shuffle_hash"), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("__pruned"), F.lit(False)).alias("pruned"),
        )
    )


def semdedup_kmeans(
    corpus: DataFrame,
    k: int = 16,
    n_iter: int = 3,
    threshold: float = 0.4,
    dim: int = 64,
    scale: int = 10**6,
    fp_scale: int = 10**15,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cluster-scoped SemDeDup (Abbas et al. 2023, arXiv:2303.09540).

    The paper's actual formulation: k-means-cluster the embedding
    space, then look for cosine near-duplicates ONLY within each
    cluster — the cluster assignment replaces the sign-LSH bucket of
    ``semantic_prune`` (d13) as the candidate scope. Clusters follow
    data density where sign buckets cut axis-aligned planes, so at
    equal candidate volume the cluster scope catches near-dups that
    straddle a sign boundary. Keep-rule matches ``semantic_prune``'s
    transitive lowest-id convention (see that docstring for why true
    keep-first needs connected components instead).

    Deterministic end-to-end, hence full-oracle-gateable: centroids
    come from the exact-grain Lloyd trainer
    (``kmeans_fixedpoint_subspaces`` with m=1 — integer distances,
    struct-min ties, FLOOR(double-division) updates, min-id seed);
    assignment is argmin over integer distances (ties to lowest
    centroid id); the within-cluster similarity is fixed-point cosine
    (``cosine_fixedpoint_from_nsq`` — no fold-order or ROUND-version
    dependence). An oracle replays training as unrolled CTE rounds and
    lands on the identical clustering and pair set.

    Scale: training + assignment are the v7/v8 Lloyd shape (linear
    per-round, kcent-row broadcast) and cost ~n*k*(n_iter+1) distance
    evaluations; the within-cluster self-join costs ~n^2/(2k) cosine
    evaluations. Total is minimized near k ~ sqrt(n/(2*(n_iter+1))),
    and MEASURED at 10x verbatim (n=20k, BASELINE.md round 8): k=16
    took 43.5 s vs k=160 at 138 s — the assignment term dominates
    well past the naive n/target rule, so grow k like sqrt(n), not n.
    Two caps bound the pair join regardless: cluster population
    n/k ~ sqrt(n) keeps per-cluster pair volume ~n*(n_iter+1)*2
    (linear in corpus), and recall is k-insensitive for true
    near-dups (identical/near-identical vectors co-cluster at any k —
    measured: pruned set 18228 vs 18177 at k=16 vs 160). SemDeDup
    itself runs 50k clusters on LAION-440M ~ the same sqrt-scale
    ballpark. The pruned-mark join is keyed on the unique vector id —
    shuffle-hash, both sides corpus-scale (same rationale as
    ``semantic_prune``).

    Output: (id_col, cell, pruned) for EVERY corpus vector.
    """
    from big_data_flight_analytics_spark.cache import tracked_persist

    grains = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(float(scale))),
    )
    e = tracked_persist(
        corpus.select(
            F.col(id_col).alias("id"),
            F.lit(0).cast("long").alias("j"),
            grains.alias("vq"),
        )
    )
    state = kmeans_fixedpoint_state(
        corpus, m=1, kcent=k, dim=dim, n_iter=n_iter, scale=scale,
        id_col=id_col, vec_col=vec_col, grain_frame=e,
    )
    # map-side assignment: one broadcast row carries all k centroids
    # packed in an array; argmin is a per-row fold — replaces the
    # former k-way fan-out join + groupBy(id) argmin shuffle (§2.4)
    cells = e.join(
        F.broadcast(_cent_rows_df(corpus.sparkSession, state)), "j"
    ).select(
        "id",
        _argmin_c(F.col("vq"), F.col("__cents")).alias("cell"),
    )
    mem = tracked_persist(
        cells.join(
            corpus.select(
                F.col(id_col).alias("id"), F.col(vec_col).alias("__e")
            ),
            "id",
        ).select(
            "id",
            "cell",
            "__e",
            norm_sq_fixedpoint(F.col("__e"), fp_scale).alias("__nsq"),
        )
    )
    a = mem.select(
        "cell",
        F.col("id").alias("__ia"),
        F.col("__e").alias("__ea"),
        F.col("__nsq").alias("__na"),
    )
    b = mem.select(
        "cell",
        F.col("id").alias("__ib"),
        F.col("__e").alias("__eb"),
        F.col("__nsq").alias("__nb"),
    )
    sim = cosine_fixedpoint_from_nsq(
        F.col("__ea"), F.col("__eb"), F.col("__na"), F.col("__nb"), fp_scale
    )
    # shuffle-hash, not sort-merge: both sides are corpus-scale and the
    # key has only k distinct values — sorting two corpus-sized
    # relations buys nothing over a per-partition hash build, and the
    # sort would spill first at scale. (Parallelism is bounded by k
    # either way; that is the cluster scope's nature, and the k ~
    # n/target growth rule restores it as the corpus grows.)
    pruned = (
        a.join(b.hint("shuffle_hash"), "cell")
        .filter(F.col("__ia") < F.col("__ib"))
        .filter(sim >= threshold)
        .select(F.col("__ib").alias("id"))
        .distinct()
        .withColumn("__pruned", F.lit(True))
    )
    return (
        cells.join(pruned.hint("shuffle_hash"), "id", "left")
        .select(
            F.col("id").alias(id_col),
            "cell",
            F.coalesce(F.col("__pruned"), F.lit(False)).alias("pruned"),
        )
    )


def embedding_index_frame(
    corpus: DataFrame,
    bits: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fp_scale: int = 10**15,
    probes: int = 1,
) -> DataFrame:
    """(id, vec, nsq, buckets) — the PERSISTED embedding-index payload.

    Precomputes what ``embedding_index_delta`` otherwise derives from
    the raw base vectors on EVERY refresh: the fixed-point squared
    norm (a full-dim aggregate per vector — the dominant base-side map
    cost) and one sign bucket per disjoint probe window. With these
    stored, a refresh touches base vectors only for the candidate
    pairs it actually scores — per-trigger work O(batch + candidates).
    The probe-dim guard runs here (index build time), where the
    bits/probes scheme is fixed.
    """
    if probes < 1:
        raise ValueError(f"probes must be >= 1, got {probes}")
    guard = _probe_dim_guard(vec_col, probes * bits, "embedding_index_frame")
    buckets = [
        sign_bucket(vec_col, bits, offset=p * bits) for p in range(probes)
    ]
    buckets[-1] = F.when(guard.isNull(), buckets[-1])
    return corpus.select(
        F.col(id_col),
        F.col(vec_col),
        norm_sq_fixedpoint(F.col(vec_col), fp_scale).alias("nsq"),
        F.array(*[b.cast("long") for b in buckets]).alias("buckets"),
    )


def embedding_index_delta(
    base: DataFrame,
    delta: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int | None = None,
    target_bucket_size: int = 256,
    base_count: int | None = None,
    fp_scale: int = 10**15,
    probes: int = 1,
    base_index: DataFrame | None = None,
) -> DataFrame:
    """Dedup ONE arriving embedding batch against a persisted base
    corpus: the ``incremental.dedup_delta`` ingest contract (i2) in
    embedding space.

    The 100 TB ingest pattern: the base corpus's sign-LSH signatures
    are the persisted index (at scale, stored BUCKETED by the bucket
    id so this operator never re-shuffles the base); each arriving
    batch is signed with the INDEX's bucket scheme (``bits`` fixed at
    index-build time — pass it, or let it derive from the base count
    like ``embedding_neardup_pairs``), broadcast against the base
    postings, and every delta vector whose bucket holds a base vector
    with fixed-point cosine >= ``threshold`` is marked a known
    near-dup of the lowest qualifying base id. Work per refresh is one
    base-side map + O(|delta| x bucket population) pair scores — the
    base is never rescanned quadratically and never shuffled.

    Every decision is engine-version-independent (the d18/v4
    doctrine): md5-free sign buckets, ``cosine_fixedpoint_from_nsq``
    scoring, MIN over qualifying base ids.

    Output: one row per DELTA vector — (id_col, matched_base_id
    nullable, dup_of_index). Recall is bounded by the bucket scheme
    exactly as for d5/d13; ``probes`` > 1 is the same recall lever as
    ``_bucket_scored_pairs`` — the index stores one signature column
    per DISJOINT sign window (dims [p*bits, (p+1)*bits)), a base-dup
    straddling one window's boundary is recovered by another, and the
    result stays deterministic (MIN over the unioned qualifying set;
    duplicate cross-window pairs are dropped before scoring).
    """
    if probes < 1:
        raise ValueError(f"probes must be >= 1, got {probes}")
    if bits is None:
        if base_index is not None:
            raise ValueError(
                "embedding_index_delta: pass the index's `bits` with "
                "base_index — the bucket scheme is fixed at build time "
                "and must not re-derive from a growing base"
            )
        n = base_count if base_count is not None else base.count()
        bits = adaptive_bits(n, target_bucket_size)

    def sig(df: DataFrame, tag: str, p: int) -> DataFrame:
        bucket = sign_bucket(vec_col, bits, offset=p * bits)
        if p == probes - 1:
            guard = _probe_dim_guard(
                vec_col, probes * bits, "embedding_index_delta"
            )
            bucket = F.when(guard.isNull(), bucket)
        return df.select(
            F.col(id_col).alias(f"__{tag}_id"),
            bucket.alias("bucket"),
            F.col(vec_col).alias(f"__{tag}_e"),
            norm_sq_fixedpoint(F.col(vec_col), fp_scale).alias(
                f"__{tag}_n"
            ),
        )

    def sig_from_index(p: int) -> DataFrame:
        # the O(batch) refresh path: norms and per-window buckets come
        # from the persisted ``embedding_index_frame`` — no base-side
        # per-vector arithmetic at refresh time
        bucket = F.element_at("buckets", p + 1)
        if p == probes - 1:
            # stored-scheme drift guard (ADVICE r11): a frame built
            # under a different probes count signs the delta under one
            # scheme while base buckets live under another — near-zero
            # recall with no error (element_at past the end is NULL
            # and just drops candidates). bits itself is not cheaply
            # recoverable from the frame, but a probes mismatch is;
            # same zero-job in-plan anchor as _probe_dim_guard.
            guard = F.assert_true(
                F.size("buckets") == F.lit(probes),
                F.lit(
                    "embedding_index_delta: base_index stores a probes "
                    f"count different from the requested {probes} — the "
                    "bucket scheme is fixed at index-build time; pass "
                    "the bits/probes the frame was built with"
                ),
            )
            bucket = F.when(guard.isNull(), bucket)
        return base_index.select(
            F.col(id_col).alias("__b_id"),
            bucket.alias("bucket"),
            F.col(vec_col).alias("__b_e"),
            F.col("nsq").alias("__b_n"),
        )

    frames = [
        (sig_from_index(p) if base_index is not None else sig(base, "b", p))
        .join(F.broadcast(sig(delta, "d", p)), "bucket")
        .select("__b_id", "__d_id", "__b_e", "__d_e", "__b_n", "__d_n")
        for p in range(probes)
    ]
    cand = frames[0]
    for f in frames[1:]:
        cand = cand.unionByName(f)
    if probes > 1:
        cand = cand.dropDuplicates(["__b_id", "__d_id"])
    matches = (
        cand.filter(
            cosine_fixedpoint_from_nsq(
                F.col("__b_e"), F.col("__d_e"),
                F.col("__b_n"), F.col("__d_n"), fp_scale,
            )
            >= threshold
        )
        .groupBy("__d_id")
        .agg(F.min("__b_id").alias("matched_base_id"))
    )
    return (
        delta.select(id_col)
        .join(
            F.broadcast(matches.withColumnRenamed("__d_id", id_col)),
            id_col,
            "left",
        )
        .select(
            id_col,
            "matched_base_id",
            F.col("matched_base_id").isNotNull().alias("dup_of_index"),
        )
    )


def quantize_vectors(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector int8 scalar quantization: the 4x-smaller ANN index.

    Each vector is affinely mapped onto [0, 255] by its own min/max
    (``q_i = floor((x_i - min)/scale + 0.5)``); the frame keeps the
    codes plus the original vector. At 100 TB the codes are what the
    candidate stage scans — a quarter of the float32 bytes, so 4x the
    vectors per executor-memory-byte — and the floats are only fetched
    for the small rerank set.

    Every arithmetic step is an explicit double op (identical IEEE
    bits in any engine); the codes themselves are exact integers.
    Alongside the codes the index row carries the reconstruction
    parameters (``amin``, ``scale``, the code sum, the vector's true
    l2 norm and its length) — the per-vector scalars every SQ index
    stores so a pair's approximate dot product can be RECONSTRUCTED
    from pure per-pair integer work:

        dot(a,b) ~ d*amin_a*amin_b + amin_a*s_b*sum(q_b)
                   + amin_b*s_a*sum(q_a) + s_a*s_b*sum(q_a*q_b)

    (only the last term is pair-dependent; everything else is indexed.)
    """
    v = F.col(vec_col)
    amin = F.array_min(v).cast("double")
    amax = F.array_max(v).cast("double")
    staged = df.select(
        F.col(id_col),
        v.alias(vec_col),
        amin.alias("amin"),
        F.when(amax > amin, (amax - amin) / F.lit(255.0))
        .otherwise(F.lit(1.0))
        .alias("scale"),
    )
    qv = F.transform(
        F.col(vec_col),
        lambda x: F.floor(
            (x.cast("double") - F.col("amin")) / F.col("scale") + F.lit(0.5)
        ).cast("long"),
    )
    return staged.select(
        id_col,
        vec_col,
        qv.alias("qv"),
        "amin",
        "scale",
        F.aggregate(
            qv, F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("qsum"),
        F.size(v).alias("dim"),
        l2_norm(v).alias("norm"),
    )


def _int_dot(a, b):
    """Exact int64 dot product of two code arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    expand: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dp: int = 4,
) -> DataFrame:
    """Top-k cosine neighbors via int8-code candidates + exact rerank.

    Two-stage ANN: (1) rank the corpus per query by the RECONSTRUCTED
    cosine from the quantization codes and keep ``k * expand``
    candidates — the stage that scans everything touches only the 4x-
    compressed codes plus five indexed scalars per vector, and its one
    pair-dependent term is EXACT int64 arithmetic; (2) rerank only the
    candidates with the exact double-accumulated cosine (the same
    precision contract as the kNN graph), fetching original vectors by
    id — at scale a join against the float store for
    O(k * expand * |queries|) rows, never a full scan.

    Determinism: the reconstruction combines indexed doubles in ONE
    fixed association (mirrored verbatim in the oracle SQL), so the
    candidate ordering is bit-identical cross-engine; ties break on
    neighbor id. Recall is a measured trade (see TestQuantizedTopk);
    ``expand`` is the knob that buys recall back.
    """
    cq = quantize_vectors(corpus, id_col, vec_col)
    qq = quantize_vectors(queries, id_col, vec_col)
    c_side = cq.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("qv").alias("__cq"),
        F.col("amin").alias("__ca"),
        F.col("scale").alias("__cs"),
        F.col("qsum").alias("__cqs"),
        F.col("dim").alias("__d"),
        F.col("norm").alias("__cn0"),
    )
    q_side = qq.select(
        F.col(id_col).alias("query_id"),
        F.col("qv").alias("__qq"),
        F.col("amin").alias("__qa"),
        F.col("scale").alias("__qs"),
        F.col("qsum").alias("__qqs"),
        F.col("norm").alias("__qn0"),
    )
    qdot = _int_dot(F.col("__cq"), F.col("__qq"))
    recon = (
        F.col("__d") * F.col("__ca") * F.col("__qa")
        + F.col("__ca") * F.col("__qs") * F.col("__qqs")
        + F.col("__qa") * F.col("__cs") * F.col("__cqs")
        + F.col("__cs") * F.col("__qs") * qdot
    )
    denom = F.col("__cn0") * F.col("__qn0")
    score = F.when(denom == 0, F.lit(0.0)).otherwise(recon / denom)
    cand = (
        c_side.crossJoin(F.broadcast(q_side))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", score.alias("__qdot"))
    )
    w_cand = Window.partitionBy("query_id").orderBy(
        F.col("__qdot").desc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        cand.withColumn("__rn", F.row_number().over(w_cand))
        .filter(F.col("__rn") <= k * expand)
        .select("query_id", "neighbor_id")
    )
    c_vec = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        l2_norm(F.col(vec_col)).alias("__cn"),
    )
    q_vec = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        l2_norm(F.col(vec_col)).alias("__qn"),
    )
    reranked = (
        shortlist.join(c_vec, "neighbor_id")
        .join(F.broadcast(q_vec), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_from_norms(
                F.col("__qvec"), F.col("__cvec"),
                F.col("__qn"), F.col("__cn"), dp=dp,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        reranked.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", "sim")
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    m: int = 4,
    kcent: int = 16,
    expand: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dp: int = 4,
    codebooks: DataFrame | None = None,
) -> DataFrame:
    """Product-quantization ANN: the FAISS-standard compressed index.

    The vector is split into ``m`` subspaces; each subvector is encoded
    as the id of its nearest codebook centroid (``kcent`` per
    subspace), so the stored code is m small ints (m=4, kcent=16 -> 2
    BYTES per 64-dim vector, a 128x compression). Candidate scoring is
    asymmetric-distance (ADC): the query precomputes its dot product
    against every centroid (m x kcent lookups), and a corpus vector's
    approximate dot is the sum of its codes' lookups — no float vector
    is touched until the exact rerank over ``k * expand`` candidates.

    ``codebooks`` defaults to the deterministic min-id stub (the
    ``kcent`` lowest-id vectors' subvectors — same pluggable-stub
    contract as ``ivf_topk``, which keeps the operator fully
    oracle-checkable; swap in per-subspace k-means where recall
    matters). Expected shape: (j int, c int, centroid array).

    Determinism contract: centroid assignment breaks distance ties on
    the lowest centroid id (min over (dist, c) structs); per-pair ADC
    sums add the m subspace lookups in ONE fixed order (per-subspace
    conditional sums, then a literal j=0..m-1 addition chain), and the
    rerank reuses the kNN-graph double-accumulation contract — every
    float every engine computes is bit-identical.

    At 100 TB: encode once, store the codes (2 bytes/vector) bucketed
    by id; the ADC scan reads codes only. The shuffles here (per-id
    argmin, per-(query, id) sum) are linear in corpus x m.
    """
    sub = dim // m
    if sub * m != dim:
        raise ValueError("dim must divide evenly into m subspaces")

    if codebooks is None:
        # min-id stub: centroid c = the seed's own id. Assumes ids are
        # dense from 0 (true for the testdata; pass explicit codebooks
        # — e.g. per-subspace k-means output — for arbitrary corpora)
        seeds = corpus.filter(F.col(id_col) < kcent).select(
            F.col(id_col).alias("c"), F.col(vec_col)
        )
        codebooks = seeds.select(
            "c",
            F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("j"),
            F.col(vec_col).alias("__v"),
        ).select(
            "j",
            "c",
            F.slice(
                F.col("__v"), F.col("j") * sub + 1, F.lit(sub)
            ).alias("centroid"),
        )

    # encode corpus: per (id, j), nearest centroid with (dist, c) tie-break.
    # The squared distance drops the ||sub||^2 term: it is constant per
    # (id, j), so argmin(cc - 2ac) == argmin(aa + cc - 2ac) in exact
    # arithmetic, and BOTH engines compute the same reduced expression
    # (mirrored in the oracle) so cross-engine parity is unaffected.
    # ||centroid||^2 is precomputed ONCE per centroid on the broadcast
    # side instead of per candidate row — together these cut the encode
    # stage's dot products 3x (the dominant FLOPs: corpus x m x kcent
    # candidate rows).
    #
    # ADC is fully map-side (r17, the v7/v8 shape): the codebook frame
    # is packed IN-ENGINE (codebooks stay pluggable DataFrames — two
    # tiny aggregates, no driver collect) into one broadcast row whose
    # ``__grid[j+1]`` holds subspace j's c-ascending centroid array;
    # each corpus row folds out its m code POSITIONS, each query row
    # folds out its full m x kcent LUT in the same grid order, and the
    # candidate score is a per-row j-ascending fold — the identical
    # doubles the former per-(query, j, c) join + groupBy(query,
    # neighbor) aggregate shuffled corpus x m rows to add. Positions
    # (not c values) index the LUT, so sparse/non-dense c stay exact.
    # L2 norms ride the same projections: no norms scans, no joins.
    codebooks = codebooks.withColumn(
        "__cc", dot_product(F.col("centroid"), F.col("centroid"))
    )
    grid_row = (
        codebooks.groupBy("j")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("c", "centroid", "__cc"))
            ).alias("__cents")
        )
        .groupBy()
        .agg(F.array_sort(F.collect_list(F.struct("j", "__cents"))).alias("__gs"))
        # j is dense 0..m-1 by the codebook contract, so position == j
        .select(F.transform("__gs", lambda s: s["__cents"]).alias("__grid"))
    )

    def sub_of(vec, j):
        return F.slice(vec, j * sub + 1, F.lit(sub))

    codes_arr = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: F.array_min(
            F.transform(
                F.element_at(F.col("__grid"), (j + 1).cast("int")),
                lambda cent, i: F.struct(
                    (
                        cent["__cc"]
                        - F.lit(2.0)
                        * dot_product(
                            sub_of(F.col("__v"), j), cent["centroid"]
                        )
                    ).alias("d"),
                    cent["c"].alias("c"),
                    i.alias("i"),
                ),
            )
        )["i"],
    )
    enc = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("__v"),
            l2_norm(F.col(vec_col)).alias("__cn"),
        )
        .crossJoin(F.broadcast(grid_row))
        .select("neighbor_id", codes_arr.alias("__codes"), "__cn")
    )
    lut_grid = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: F.transform(
            F.element_at(F.col("__grid"), (j + 1).cast("int")),
            lambda cent: dot_product(
                sub_of(F.col("__v"), j), cent["centroid"]
            ),
        ),
    )
    q_lut = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__v"),
            l2_norm(F.col(vec_col)).alias("__qn"),
        )
        .crossJoin(F.broadcast(grid_row))
        .select("query_id", lut_grid.alias("__lut"), "__qn")
    )
    score = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(
            F.element_at(F.col("__lut"), (j + 1).cast("int")),
            (F.element_at(F.col("__codes"), (j + 1).cast("int")) + 1).cast(
                "int"
            ),
        ),
    )
    denom = F.col("__cn") * F.col("__qn")
    scored = (
        enc.crossJoin(F.broadcast(q_lut))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            # zero-norm guard (same contract as cosine_from_norms):
            # 0.0, never engine-specific NULL-vs-NaN ordering
            F.when(denom == 0, F.lit(0.0))
            .otherwise(score / denom)
            .alias("__adc"),
        )
    )
    w_cand = Window.partitionBy("query_id").orderBy(
        F.col("__adc").desc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        scored.withColumn("__rn", F.row_number().over(w_cand))
        .filter(F.col("__rn") <= k * expand)
        .select("query_id", "neighbor_id")
    )
    c_vec = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        l2_norm(F.col(vec_col)).alias("__cn"),
    )
    q_vec = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        l2_norm(F.col(vec_col)).alias("__qn"),
    )
    reranked = (
        shortlist.join(c_vec, "neighbor_id")
        .join(F.broadcast(q_vec), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_from_norms(
                F.col("__qvec"), F.col("__cvec"),
                F.col("__qn"), F.col("__cn"), dp=dp,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        reranked.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", "sim")
    )


def kmeans_fixedpoint_subspaces(
    corpus: DataFrame,
    m: int = 8,
    kcent: int = 16,
    dim: int = 64,
    n_iter: int = 4,
    scale: int = 10**6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    grain_frame: DataFrame | None = None,
) -> DataFrame:
    """DataFrame face of ``kmeans_fixedpoint_state`` — (j, c, cq) rows."""
    state = kmeans_fixedpoint_state(
        corpus, m, kcent, dim, n_iter, scale, id_col, vec_col,
        grain_frame=grain_frame,
    )
    return _cents_df(corpus.sparkSession, state)


def kmeans_fixedpoint_state(
    corpus: DataFrame,
    m: int = 8,
    kcent: int = 16,
    dim: int = 64,
    n_iter: int = 4,
    scale: int = 10**6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    grain_frame: DataFrame | None = None,
) -> dict:
    """Engine-portable trained PQ codebooks: exact-grain Lloyd k-means.

    Per (subspace j, centroid c), runs ``n_iter`` Lloyd rounds over the
    corpus subvectors QUANTIZED to int64 grains (``FLOOR(x * scale)``),
    so every rank-deciding quantity is exact integer arithmetic:

    - distances are integer sums of squared grain differences —
      associative, no fold-order dependence;
    - assignment ties break on the lowest centroid id (min over
      (dist, c) structs);
    - the centroid update is ``FLOOR(CAST(sum AS DOUBLE) / n)`` per
      dimension — sums are exact in double (|sum| << 2^53), the IEEE
      divide is correctly rounded, and the floor of that identical
      double is identical in any engine. (Plain integer division is
      deliberately avoided: engines disagree on negative-operand
      truncate-vs-floor, and grains are signed.)

    Init = the ``kcent`` lowest-id vectors' subvectors (the same
    deterministic seed as the min-id stub), so the whole training run —
    unlike ``pq_codebooks_kmeans``'s MLlib fit — is a pure,
    partition-invariant, ENGINE-PORTABLE function of the data: an
    oracle can replay it as unrolled SQL CTE rounds and land on
    bit-identical codebooks. That is what puts the trained-PQ path
    under the driver hash gate (VERDICT r7 stretch).

    Output: (j, c, cq array<long>) — centroid grains; divide by
    ``scale`` for the double-space centroids.

    Scale: each round is one broadcast join (m centroid-array rows,
    map-side — no row fan-out) + ONE hash aggregate over |corpus| x m
    rows; the centroid state stays kcent x m rows of driver state
    (collected per round — the BPE-merge-table collect class, bounded
    by hyper-parameters, never by corpus size), so lineage never
    compounds. At 100 TB: identical shape, with the corpus frame
    persisted once and the per-round shuffle linear in corpus size
    (standard distributed Lloyd).
    """
    sub = dim // m
    if sub * m != dim:
        raise ValueError("dim must divide evenly into m subspaces")
    grains = F.transform(
        F.slice(F.col("__v"), F.col("j") * sub + 1, F.lit(sub)),
        lambda x: F.floor(x.cast("double") * F.lit(float(scale))),
    )
    from big_data_flight_analytics_spark.cache import tracked_persist

    # the grain frame feeds every Lloyd round (and, in pq_topk_trained,
    # the encode stage after training): persist it once instead of
    # re-scanning the corpus n_iter+1 times. ``grain_frame`` lets the
    # caller hand in an already-persisted (id, j, vq) frame.
    if grain_frame is not None:
        e = grain_frame
    else:
        e = tracked_persist(
            corpus.select(
                F.col(id_col).alias("id"),
                F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("j"),
                F.col(vec_col).alias("__v"),
            ).select("id", "j", grains.alias("vq"))
        )
    # ``id < kcent`` is "the kcent lowest-id vectors" ONLY for dense
    # 0-based id spaces (true of this engine's vec_id contract and
    # required for the oracle's identical seed); with offset or sparse
    # ids the codebook would silently shrink or go empty and every
    # downstream centroid/assignment would be degenerate with no
    # error. Guard IN-PLAN (zero extra jobs — an eager seeds.count()
    # here cost the v7/v8/d18 trio ~3 s/round, r10 residual): left-join
    # the expected (c, j) seed grid against the actual seed rows
    # aggregated per (j, c), so a missing id surfaces as a NULL count
    # and a DUPLICATE id (which would silently fan the grid out into
    # duplicate centroid rows) as count > 1 — either way assert_true
    # fails loud during the checkpoint materialization that already
    # happens. The aggregate is kcent x m rows on the broadcast side,
    # once, pre-loop — not a per-round cost (ADVICE r11).
    expected = (
        corpus.sparkSession.range(kcent)
        .select(
            F.col("id").alias("c"),
            F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("j"),
        )
    )
    seed_rows = (
        e.filter(F.col("id") < kcent)
        .groupBy(F.col("j"), F.col("id").alias("c"))
        .agg(
            F.min("vq").alias("__cq"),
            F.count(F.lit(1)).alias("__nc"),
        )
    )
    seed_guard = F.assert_true(
        F.coalesce(F.col("__nc"), F.lit(0)) == F.lit(1),
        F.lit(
            f"kmeans_fixedpoint_subspaces: every id below kcent={kcent} "
            "must appear exactly once in the seed — ids must be dense, "
            "0-based and unique for the id<kcent seed (re-key the "
            "corpus with a dense unique id, or lower kcent below the "
            "corpus size)"
        ),
    )
    seed_frame = (
        expected.join(F.broadcast(seed_rows), ["j", "c"], "left")
        # assert_true is NULL on pass (raises otherwise): anchoring cq
        # on guard.isNull() keeps the check in codegen, cost-free on
        # passing rows (the d19 anchor pattern)
        .select("j", "c", F.when(seed_guard.isNull(), F.col("__cq")).alias("cq"))
    )
    # the seed frame goes straight into _lloyd_rounds' fused round 0
    # (no separate seed-collect round-trip; the guard fires inside that
    # round's job) — see _lloyd_rounds for the measured rationale
    # scheduling-bound tiny-frame loop: pin shuffle width to the grain
    # frame's own (data-proportional) partition count and drop AQE for
    # the loop's duration — the loop's only join is an explicit
    # broadcast(), so the PageRank AQE caveat does not apply
    nparts = max(1, e.rdd.getNumPartitions())
    with loop_confs(corpus.sparkSession, nparts):
        cents = _lloyd_rounds(e, seed_frame, sub, n_iter)
    return cents


def _int_sqdist(a, b):
    """Exact int64 squared L2 distance between two grain arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _int_dot(a, b):
    """Exact int64 dot product between two grain arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _collect_cents(cents_df: DataFrame) -> dict:
    """Materialize a (j, c, cq) centroid frame as driver state.

    kcent x m rows of grain arrays — the same O(model) collect class as
    the BPE merge table (bpe.py): bounded by hyper-parameters, never by
    corpus size. Any in-plan guard (the kmeans seed assert) fires here.
    """
    return {
        (int(r["j"]), int(r["c"])): [int(x) for x in r["cq"]]
        for r in cents_df.collect()
    }


def _cent_rows_df(spark, cents: dict) -> DataFrame:
    """Driver centroid state -> one broadcast-side row per subspace:
    ``(j, __cents array<struct<c, cq>>)``, packed c-ascending.

    Centroids travel as DATA — a tiny LocalRelation broadcast-joined
    on ``j`` — never as expression literals: baking kcent x m x sub
    int64 literals into ``array(struct(...))``/``map_from_arrays``
    expressions re-pays Catalyst analysis + codegen compile on every
    Lloyd round, measured 2-4x SLOWER than even the DataFrame-state
    loop (d18 7.4->17.3 s, v7 5.6->21.7 s, v8 8.2->30.7 s, quiet-host
    min-of-3 at sf0.1 — the r16 literal-centroid rejection). A
    broadcast of m rows keeps the plan tree constant-size while the
    argmin stays a map-side fold.
    """
    js = sorted({j for (j, _c) in cents})
    rows = [
        (
            int(j),
            [
                (int(c), [int(x) for x in cq])
                for (jj, c), cq in sorted(cents.items())
                if jj == j
            ],
        )
        for j in js
    ]
    return spark.createDataFrame(
        rows,
        "j int, __cents array<struct<c: bigint, cq: array<bigint>>>",
    )


def _cent_grid_df(spark, cents: dict, m: int) -> DataFrame:
    """Driver centroid state -> ONE broadcast row carrying every
    subspace: ``__grid[j+1]`` is subspace j's c-ascending
    ``array<struct<c, cq>>`` (the `_cent_rows_df` packing, all m rows
    folded into a single nested array). Lets a consumer that needs ALL
    subspaces per input row — the map-side PQ encode/LUT (one fold per
    subspace over the wide vector) — take one crossJoin of one row
    instead of an m-way join on ``j``. Data, never literals (the
    ``_cent_rows_df`` doctrine)."""
    grid = [
        [
            (int(c), [int(x) for x in cq])
            for (jj, c), cq in sorted(cents.items())
            if jj == j
        ]
        for j in range(m)
    ]
    return spark.createDataFrame(
        [(grid,)],
        "__grid array<array<struct<c: bigint, cq: array<bigint>>>>",
    )


def _cents_df(spark, cents: dict) -> DataFrame:
    """Driver centroid state -> (j, c, cq) DataFrame (public shape)."""
    rows = [
        (int(j), int(c), [int(x) for x in cq])
        for (j, c), cq in sorted(cents.items())
    ]
    return spark.createDataFrame(
        rows, "j bigint, c bigint, cq array<bigint>"
    )


def _argmin_c(vq, cents_arr):
    """Nearest-centroid id via a map-side fold over the packed array.

    ``array_min`` over struct(d, c) = min over (dist, centroid-id) —
    the same exact-integer ordering the former broadcast-join +
    groupBy(min) produced, with zero shuffle and no kcent-way row
    fan-out.
    """
    return F.array_min(
        F.transform(
            cents_arr,
            lambda cent: F.struct(
                _int_sqdist(vq, cent["cq"]).alias("d"),
                cent["c"].alias("c"),
            ),
        )
    )["c"]


def _lloyd_rounds(
    e: DataFrame, seed_frame: DataFrame, sub: int, n_iter: int
) -> dict:
    """n_iter exact-grain Lloyd rounds over driver-held centroid state.

    Round 0 is FUSED with the seed materialization: the assignment
    joins the seed rows packed per subspace (``sort_array`` packs
    c-ascending — the same order ``_cent_rows_df`` uses), and the
    empty-cluster fallback left-joins the seed rows in the same job, so
    the first collect already returns merged round-0 centroids. The
    former separate seed collect was one extra driver round-trip
    (~0.4 s warm) per kmeans call.

    Per round, ONE Spark job: broadcast the m centroid-array rows, join
    on ``j`` (no row fan-out — the kcent centroids arrive packed in one
    array per row), argmin as a map-side fold, then the (j, c) means
    aggregate collected as kcent x m rows. The former DataFrame-state
    loop paid, per round, a kcent-way fan-out join + a corpus-sized
    groupBy(id, j) argmin shuffle + the means shuffle + an eager
    localCheckpoint write; measured on v7/v8/d18 that loop was ~75-85%
    of query wall-clock (guide §1.1, §2.4). This shape keeps one
    corpus-sized shuffle per round (the means) and nothing else. Every
    rank-deciding value is still computed IN-ENGINE (integer argmin,
    FLOOR(double-division) means); the driver only ferries exact int64s
    between rounds — kcent x m rows, the BPE-merge-table collect class,
    bounded by hyper-parameters — so results are bit-identical and the
    oracle's unrolled-CTE replay still matches.

    Empty cluster -> keep the previous centroid (dict merge == the old
    left-join + coalesce).

    Column expressions are built ONCE outside the loop: a Column is
    plan-independent and reusable across DataFrames, and rebuilding the
    sub-wide agg/floor lists plus the argmin lambda fold per round was
    ~1 s/round of pure py4j expression construction (measured round
    split: createDF 0.03, expression build 0.9-1.0, collect 0.8) —
    more than the round's actual Spark work.
    """
    spark = e.sparkSession
    if n_iter <= 0:
        return _collect_cents(seed_frame)
    argmin_col = _argmin_c(F.col("vq"), F.col("__cents")).alias("c")
    agg_cols = [
        F.sum(F.col("vq")[i]).alias(f"__s{i}") for i in range(sub)
    ]
    n_col = F.count(F.lit(1)).alias("__n")
    new_col = F.array(
        *[
            F.floor(F.col(f"__s{i}").cast("double") / F.col("__n"))
            for i in range(sub)
        ]
    ).alias("__new")

    def means_of(carr: DataFrame) -> DataFrame:
        assigned = e.join(F.broadcast(carr), "j").select(
            "j", argmin_col, "vq"
        )
        return (
            assigned.groupBy("j", "c")
            .agg(n_col, *agg_cols)
            .select("j", "c", new_col)
        )

    # fused round 0: pack the seed rows per subspace in-engine and
    # merge means with the seed fallback inside the one collect job
    packed_seed = seed_frame.groupBy("j").agg(
        F.sort_array(F.collect_list(F.struct("c", "cq"))).alias("__cents")
    )
    merged0 = seed_frame.join(means_of(packed_seed), ["j", "c"], "left").select(
        "j",
        "c",
        F.coalesce(F.col("__new"), F.col("cq")).alias("cq"),
    )
    cents = _collect_cents(merged0)
    for _ in range(n_iter - 1):
        means = means_of(_cent_rows_df(spark, cents))
        new = {
            (int(r["j"]), int(r["c"])): [int(x) for x in r["__new"]]
            for r in means.collect()
        }
        cents = {k: new.get(k, v) for k, v in cents.items()}
    return cents


def pq_topk_trained(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    m: int = 8,
    kcent: int = 16,
    expand: int = 4,
    dim: int = 64,
    n_iter: int = 4,
    scale: int = 10**6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fp_scale: int = 10**15,
) -> DataFrame:
    """Trained-codebook PQ top-k with EVERY stage exact-grain.

    The form-robust sibling of ``pq_topk``: codebooks come from
    ``kmeans_fixedpoint_subspaces`` (engine-portable integer Lloyd),
    and — unlike v6's double-dot ADC — every rank-deciding value here
    is an exact int64 or a correctly-rounded function of exact int64s,
    so no stage can diverge with an oracle engine's double fold order
    or ROUND version (the r7 g1 failure class, eliminated by
    construction):

    - encode: integer grain distances to the trained grain centroids,
      (dist, c) struct-min tie-break;
    - ADC: the lookup table is the integer grain dot
      ``sum(vq_i * cq_i)`` per (query, j, c); a candidate's score sums
      its m lookups — integer addition, associative;
    - normalization: exact fixed-point squared norms
      (``norm_sq_fixedpoint`` at ``scale**2`` so units match the grain
      dot), sqrt/divide correctly rounded from exact ints;
    - rerank: ``cosine_fixedpoint_from_nsq`` at ``fp_scale`` — the
      same contract as the kNN graph (v4).

    Same candidate/rerank shape and shuffle budget as ``pq_topk``; the
    training adds ``n_iter`` small join+agg rounds (see
    ``kmeans_fixedpoint_subspaces``). Compression/recall trade is the
    standard PQ one; recall vs the min-id stub is pinned in
    ``TestPqTrainedExact``.
    """
    from big_data_flight_analytics_spark.cache import tracked_persist

    sub = dim // m
    if sub * m != dim:
        raise ValueError("dim must divide evenly into m subspaces")
    grains = F.transform(
        F.slice(F.col("__v"), F.col("j") * sub + 1, F.lit(sub)),
        lambda x: F.floor(x.cast("double") * F.lit(float(scale))),
    )

    def sub_grains(df: DataFrame, out_id: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(out_id),
            F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("j"),
            F.col(vec_col).alias("__v"),
        ).select(out_id, "j", grains.alias("vq"))

    # one persisted grain frame serves the n_iter Lloyd rounds AND the
    # encode stage — the corpus is scanned once for the whole query
    corpus_grains = tracked_persist(sub_grains(corpus, "id"))
    cb = kmeans_fixedpoint_state(
        corpus, m, kcent, dim, n_iter, scale, id_col, vec_col,
        grain_frame=corpus_grains,
    )
    # ---- ADC, fully map-side (r17, guide §2.4): ONE broadcast row
    # carries all m packed codebooks (`_cent_grid_df`); each corpus row
    # computes its m codes as a per-subspace argmin fold over its own
    # wide vector, with the fixed-point norm riding the same
    # projection, and each query row computes its whole m x kcent LUT
    # the same way. The candidate score is then a per-row fold —
    # score = sum_j LUT[j][code_j], the identical integer sum the
    # former per-(query, j, c) join + groupBy(query, neighbor)
    # aggregate shuffled a corpus x m row set to produce. Removes, per
    # query: the encode join, the LUT fan-out join, the corpus-scale
    # ADC groupBy Exchange, and the norms_c corpus scan + join.
    spark = corpus.sparkSession
    nsq_scale = scale * scale
    cb_grid = F.broadcast(_cent_grid_df(spark, cb, m))

    def sub_grain_of(vec, j):
        return F.transform(
            F.slice(vec, j * sub + 1, F.lit(sub)),
            lambda x: F.floor(x.cast("double") * F.lit(float(scale))),
        )

    codes_arr = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: _argmin_c(
            sub_grain_of(F.col("__v"), j),
            F.element_at(F.col("__grid"), (j + 1).cast("int")),
        ),
    )
    enc = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("__v"),
            norm_sq_fixedpoint(F.col(vec_col), nsq_scale).alias("__cn"),
        )
        .crossJoin(cb_grid)
        .select("neighbor_id", codes_arr.alias("__codes"), "__cn")
    )
    lut_grid = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: F.transform(
            F.element_at(F.col("__grid"), (j + 1).cast("int")),
            lambda cent: _int_dot(sub_grain_of(F.col("__v"), j), cent["cq"]),
        ),
    )
    q_lut = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__v"),
            norm_sq_fixedpoint(F.col(vec_col), nsq_scale).alias("__qn"),
        )
        .crossJoin(cb_grid)
        .select("query_id", lut_grid.alias("__lut"), "__qn")
    )
    score_int = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0).cast("long"),
        lambda acc, j: acc
        + F.element_at(
            F.element_at(F.col("__lut"), (j + 1).cast("int")),
            (F.element_at(F.col("__codes"), (j + 1).cast("int")) + 1).cast(
                "int"
            ),
        ),
    )
    scored = (
        enc.crossJoin(F.broadcast(q_lut))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.when(
                (F.col("__cn") <= 0) | (F.col("__qn") <= 0), F.lit(0.0)
            )
            .otherwise(
                score_int.cast("double")
                / (
                    F.sqrt(F.col("__cn").cast("double"))
                    * F.sqrt(F.col("__qn").cast("double"))
                )
            )
            .alias("__adc"),
        )
    )
    w_cand = Window.partitionBy("query_id").orderBy(
        F.col("__adc").desc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        scored.withColumn("__rn", F.row_number().over(w_cand))
        .filter(F.col("__rn") <= k * expand)
        .select("query_id", "neighbor_id")
    )
    c_vec = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        norm_sq_fixedpoint(F.col(vec_col), fp_scale).alias("__cnsq"),
    )
    q_vec = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        norm_sq_fixedpoint(F.col(vec_col), fp_scale).alias("__qnsq"),
    )
    reranked = (
        shortlist.join(c_vec, "neighbor_id")
        .join(F.broadcast(q_vec), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_fixedpoint_from_nsq(
                F.col("__qvec"), F.col("__cvec"),
                F.col("__qnsq"), F.col("__cnsq"), fp_scale,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        reranked.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", "sim")
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    coarse_k: int = 16,
    nprobe: int = 4,
    m: int = 8,
    kcent: int = 16,
    expand: int = 4,
    dim: int = 64,
    coarse_iter: int = 3,
    pq_iter: int = 3,
    scale: int = 10**6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fp_scale: int = 10**15,
) -> DataFrame:
    """IVF-PQ: the FAISS-standard production ANN index, exact-grain.

    Two trained quantizers compose (both via the engine-portable
    integer Lloyd of ``kmeans_fixedpoint_subspaces``): a COARSE
    quantizer partitions the corpus into ``coarse_k`` cells, and a
    product quantizer encodes each vector's RESIDUAL (vector minus its
    cell centroid — exact int64 grain subtraction) as ``m`` codes.
    Queries probe only the ``nprobe`` nearest cells, so the candidate
    scan touches ~nprobe/coarse_k of the corpus — the inverted-file
    cut that makes PQ usable at corpus scale.

    Scoring uses the inner-product ADC decomposition
    ``dot(q, x) ~ dot(q, cell_centroid) + sum_j LUT[j, code_j]`` with
    ``LUT[j, c] = dot(q_subvector_j, pq_centroid)`` — in the IP
    formulation the lookup table is CELL-INDEPENDENT (m x kcent per
    query), unlike L2-ADC's per-probe tables. Every term is an int64
    grain dot, so candidate ranking is exact integer arithmetic
    normalized by fixed-point norms; probe selection is integer L2
    distance with (dist, cell) tie-break; the rerank is the v4
    fixed-point cosine. The whole chain — both trainings included —
    is an engine-portable pure function of the data, oracle-replayable
    as unrolled CTEs (same doctrine as v7).

    At 100 TB: train on a sample or the full corpus (both linear),
    encode once (codes: m bytes-ish per vector + a cell id), store
    codes bucketed by cell; per query the ADC join reads only the
    probed cells' codes. The shuffles are the two Lloyd loops (tiny
    centroid tables, broadcast joins), the encode aggregate, and the
    per-(query, candidate) sum — all linear in corpus x m.
    """
    from big_data_flight_analytics_spark.cache import tracked_persist

    sub = dim // m
    if sub * m != dim:
        raise ValueError("dim must divide evenly into m subspaces")
    full_grains = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(float(scale))),
    )
    nsq_scale = scale * scale
    # the fixed-point ADC norm rides the one persisted corpus pass so
    # the scorer needs no norms_c scan or join (r17)
    cg = tracked_persist(
        corpus.select(
            F.col(id_col).alias("id"),
            full_grains.alias("vq"),
            norm_sq_fixedpoint(F.col(vec_col), nsq_scale).alias("__cn"),
        )
    )
    spark = corpus.sparkSession

    # ---- coarse quantizer: Lloyd over FULL-vector grains (one
    # "subspace" of width dim)
    e1 = cg.select("id", F.lit(0).alias("j"), "vq")
    init1 = e1.filter(F.col("id") < coarse_k).select(
        "j", F.col("id").alias("c"), F.col("vq").alias("cq")
    )
    # seeds stay a frame: _lloyd_rounds' fused round 0 packs and
    # merges them inside its first collect job (one round-trip per
    # Lloyd call; see _lloyd_rounds for the measured rationale)
    nparts = max(1, cg.rdd.getNumPartitions())
    with loop_confs(spark, nparts):
        coarse_state = _lloyd_rounds(e1, init1, dim, coarse_iter)
    # all coarse_k cells packed cell-ascending into ONE broadcast row:
    # assignment and probe selection both become per-row folds over the
    # joined array — no kcent-way fan-out, no argmin shuffle, no window
    # (guide §2.4); data-not-literals per the _cent_rows_df rationale
    coarse_rows = F.broadcast(
        _cent_rows_df(spark, coarse_state).select("__cents")
    )

    # ---- cell assignment + exact residual grains, map-side: per row,
    # argmin over the packed cell array — min over struct(d, cell)
    # reproduces the former min_by (dist, cell) tie-break exactly
    best_cell = F.array_min(
        F.transform(
            F.col("__cents"),
            lambda ct: F.struct(
                _int_sqdist(F.col("vq"), ct["cq"]).alias("d"),
                ct["c"].alias("cell"),
                ct["cq"].alias("ccq"),
            ),
        )
    )
    assigned = (
        cg.crossJoin(coarse_rows)
        .select("id", "vq", "__cn", best_cell.alias("__best"))
        .select(
            "id",
            F.col("__best.cell").alias("cell"),
            F.zip_with(
                F.col("vq"), F.col("__best.ccq"), lambda a, b: a - b
            ).alias("rq"),
            "__cn",
        )
    )
    assigned = tracked_persist(assigned)

    # ---- product quantizer: Lloyd over residual sub-grains. ``cell``
    # rides along so the encode stage needs no join back to assigned
    # (the former corpus x corpus SHUFFLE_HASH join).
    er = assigned.select(
        "id",
        "cell",
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("j"),
        F.slice(F.col("rq"), F.col("j") * sub + 1, F.lit(sub)).alias("vq"),
    )
    er = tracked_persist(er)
    init2 = er.filter(F.col("id") < kcent).select(
        "j", F.col("id").alias("c"), F.col("vq").alias("cq")
    )
    with loop_confs(spark, nparts):
        pq_state = _lloyd_rounds(er, init2, sub, pq_iter)
    pq_grid = F.broadcast(_cent_grid_df(spark, pq_state, m))

    # ---- encode, fully map-side (r17): per corpus row, all m codes
    # come from one fold over its own residual grains against the
    # packed pq grid (`_cent_grid_df`) — one crossJoin of one
    # broadcast row. The former per-(id, j) encode consumed the er
    # explode through a join and fed a per-(query, j, c) LUT join +
    # corpus-scale groupBy(query, neighbor) Exchange; the candidate
    # score is now a per-row fold over the code array (identical
    # integer sum), and the ADC norm rides the persisted corpus pass,
    # so the norms_c scan + join are gone too.
    codes_arr = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: _argmin_c(
            F.slice(F.col("rq"), j * sub + 1, F.lit(sub)),
            F.element_at(F.col("__grid"), (j + 1).cast("int")),
        ),
    )
    cand_base = (
        assigned.crossJoin(pq_grid)
        .select(
            F.col("id").alias("neighbor_id"),
            "cell",
            codes_arr.alias("__codes"),
            "__cn",
        )
    )

    # ---- query side: grains, probes, LUT, coarse dot
    qg = tracked_persist(
        queries.select(
            F.col(id_col).alias("query_id"),
            full_grains.alias("vq"),
            norm_sq_fixedpoint(F.col(vec_col), nsq_scale).alias("__qn"),
        )
    )
    # probe selection is map-side too: per query, sort the joined cell
    # array by (dist asc, cell asc) — the former window's exact order —
    # and keep the first nprobe entries; no fan-out, no window shuffle
    probe_sorted = F.array_sort(
        F.transform(
            F.col("__cents"),
            lambda ct: F.struct(
                _int_sqdist(F.col("vq"), ct["cq"]).alias("__d"),
                ct["c"].alias("cell"),
                _int_dot(F.col("vq"), ct["cq"]).alias("__qc"),
            ),
        )
    )
    # probes AND the full m x kcent LUT computed in ONE map-side pass
    # per query (the LUT is cell-independent in the IP formulation, so
    # it rides every probe row of its query unchanged)
    lut_grid = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: F.transform(
            F.element_at(F.col("__grid"), (j + 1).cast("int")),
            lambda cent: _int_dot(
                F.slice(F.col("vq"), j * sub + 1, F.lit(sub)), cent["cq"]
            ),
        ),
    )
    qside = (
        qg.crossJoin(coarse_rows)
        .crossJoin(pq_grid)
        .select(
            "query_id",
            F.explode(F.slice(probe_sorted, 1, nprobe)).alias("__p"),
            lut_grid.alias("__lut"),
            "__qn",
        )
        .select(
            "query_id",
            F.col("__p.cell").alias("cell"),
            F.col("__p.__qc").alias("__qc"),
            "__lut",
            "__qn",
        )
    )

    # ---- ADC over probed cells only — per-row fold, no groupBy:
    # score = coarse dot + sum_j LUT[j][code_j], the identical integer
    # sum the former per-(query, j, c) join + aggregate produced
    score_int = F.col("__qc") + F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0).cast("long"),
        lambda acc, j: acc
        + F.element_at(
            F.element_at(F.col("__lut"), (j + 1).cast("int")),
            (F.element_at(F.col("__codes"), (j + 1).cast("int")) + 1).cast(
                "int"
            ),
        ),
    )
    scored = (
        cand_base.join(F.broadcast(qside), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.when(
                (F.col("__cn") <= 0) | (F.col("__qn") <= 0), F.lit(0.0)
            )
            .otherwise(
                score_int.cast("double")
                / (
                    F.sqrt(F.col("__cn").cast("double"))
                    * F.sqrt(F.col("__qn").cast("double"))
                )
            )
            .alias("__adc"),
        )
    )
    w_cand = Window.partitionBy("query_id").orderBy(
        F.col("__adc").desc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        scored.withColumn("__rn", F.row_number().over(w_cand))
        .filter(F.col("__rn") <= k * expand)
        .select("query_id", "neighbor_id")
    )
    c_vec = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        norm_sq_fixedpoint(F.col(vec_col), fp_scale).alias("__cnsq"),
    )
    q_vec = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        norm_sq_fixedpoint(F.col(vec_col), fp_scale).alias("__qnsq"),
    )
    reranked = (
        shortlist.join(c_vec, "neighbor_id")
        .join(F.broadcast(q_vec), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_fixedpoint_from_nsq(
                F.col("__qvec"), F.col("__cvec"),
                F.col("__qnsq"), F.col("__cnsq"), fp_scale,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        reranked.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", "sim")
    )


def pq_codebooks_kmeans(
    corpus: DataFrame,
    m: int = 4,
    kcent: int = 16,
    dim: int = 64,
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Trained PQ codebooks: per-subspace k-means (the FAISS recipe).

    ``m`` tiny KMeans fits over the subvector marginals; same
    determinism caveat as ``kmeans_centroids`` (seeded, repeatable on
    identical data, but not an engine-portable function of the data —
    an INPUT to ``pq_topk``, not part of its oracle contract).
    """
    sub = dim // m
    frames = []
    for j in range(m):
        sub_df = corpus.select(
            F.slice(F.col(vec_col), j * sub + 1, sub).alias("embedding")
        )
        cents = kmeans_centroids(
            sub_df, n_centroids=kcent, vec_col="embedding", seed=seed + j
        )
        frames.append(
            cents.select(
                F.lit(j).alias("j"),
                F.col("__cid").alias("c"),
                F.col("__cvec").alias("centroid"),
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def rrf_fuse(
    rankings: "list[DataFrame]",
    k: int = 5,
    k_rrf: int = 60,
    query_col: str = "query_id",
    item_col: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) of
    top-k candidate lists: rrf(q, d) = sum over lists of
    1 / (k_rrf + rank_list(q, d)), items absent from a list
    contribute nothing — the standard score-free hybrid-retrieval
    combiner (lexical BM25/Jaccard lists fused with semantic ANN
    lists without calibrating their incomparable scores).

    Each input frame carries (query_col, item_col, rank_col) with
    1-based integer ranks. Output: (query_col, item_col, rrf, n_lists,
    rank) — the fused top ``k`` per query, ranked by rrf descending
    with item-id tie-break.

    Cross-engine determinism: every rrf value is an exact function of
    small-integer ranks (IEEE double division, both engines evaluate
    bit-identically) — and because FP addition is NOT associative, the
    per-item sum is folded over the item's SORTED rank array rather
    than aggregated in shuffle-arrival order: with 3+ lists, two items
    holding the same rank multiset are exact ties that an
    order-nondeterministic sum could split by a ulp and break ahead of
    the item-id tie-break. ``rrf`` is additionally rounded for display
    only AFTER ranking. Scale: each list is O(queries x k) rows; the
    fuse is one union + one (query, item) hash aggregate + one
    per-query window — nothing touches the corpora that produced the
    lists.
    """
    tagged = [
        r.select(
            F.col(query_col),
            F.col(item_col),
            F.col(rank_col).cast("long").alias("__r"),
        )
        for r in rankings
    ]
    allc = tagged[0]
    for t in tagged[1:]:
        allc = allc.unionByName(t)
    fused = allc.groupBy(query_col, item_col).agg(
        F.aggregate(
            F.array_sort(F.collect_list("__r")),
            F.lit(0.0),
            lambda acc, r: acc + F.lit(1.0) / (F.lit(k_rrf) + r),
        ).alias("__rrf"),
        F.count(F.lit(1)).cast("long").alias("n_lists"),
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col("__rrf").desc(), F.col(item_col).asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            query_col,
            item_col,
            F.round(F.col("__rrf"), 6).alias("rrf"),
            "n_lists",
            "rank",
        )
    )


def mmr_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    n_candidates: int = 8,
    k: int = 3,
    lam_tenths: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dp: int = 4,
) -> DataFrame:
    """Maximal-marginal-relevance rerank (Carbonell & Goldstein 1998):
    greedily pick ``k`` of the ``n_candidates`` nearest neighbors per
    query, each step maximizing
    ``lam * sim(q, d) - (1 - lam) * max over selected s of sim(d, s)``
    — the standard retrieval diversifier (relevance alone returns
    near-duplicates; the penalty term spends the budget on DIFFERENT
    relevant items).

    Output: (query_id, neighbor_id, step, score) — step 1..k in
    selection order; step 1 carries no penalty.

    Engine-portable by the Lloyd/perceptron doctrine: the greedy loop
    is a FIXED k-step unroll (the oracle replays it as k CTE layers),
    every similarity is the v1-rounded ``dp``-decimal cosine, lam is a
    tenths-integer so both engines compute the identical double
    arithmetic from identical inputs, and every argmax tie-breaks on
    the item id. Scale shape: candidates are O(queries x n) rows and
    pair sims O(queries x n^2) — retrieval-batch-sized frames
    (everything downstream of the one corpus-wide scoring pass), so
    the k-step loop is scheduling-bound like BPE, never a corpus
    rescan.
    """
    cands = brute_force_topk(
        corpus, queries, k=n_candidates, id_col=id_col, vec_col=vec_col,
        dp=dp,
    )
    return mmr_rerank_candidates(
        cands, corpus, k=k, lam_tenths=lam_tenths, id_col=id_col,
        vec_col=vec_col, dp=dp,
    )


def mmr_rerank_candidates(
    cands: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    lam_tenths: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dp: int = 4,
) -> DataFrame:
    """The MMR greedy core over an ALREADY-CHOSEN candidate list —
    ``cands`` carries (query_id, neighbor_id, sim) where ``sim`` is
    the relevance the caller ranks by (v10 passes raw cosine; the v11
    retrieval composition passes the per-query min-max-normalized RRF
    score, so hybrid fusion decides relevance and embeddings decide
    only the redundancy penalty). The penalty side always comes from
    ``corpus`` vectors for the candidate ids. Same determinism
    contract as :func:`mmr_rerank` (fixed k-step unroll, ``dp``-rounded
    cosines, tenths-integer lam, id tie-breaks).

    Shape (r17): the whole greedy selection is ONE map-side fold. A
    query's entire MMR state — its ≤ n_candidates (id, sim, vec, norm)
    rows — is collected into a single row (`collect_list` after the
    one vector-attach join), and the k greedy steps run as an unrolled
    expression over that array: per step, the penalty is an
    `array_max` of dp-rounded cosines against the selected-so-far
    sub-array and the argmax is an `array_max` over (score, -id)
    structs (score desc, id asc — the former window order). The r16
    shape paid, per step, three joins + a window + a union + an eager
    checkpoint job over tiny frames — ~2.4 s of driver-bound job
    overhead in v11 (guide §2.4: the scheduling cost of k tiny jobs
    dwarfs their work). Now the operator is lazy again (no eager
    checkpoints), runs one aggregate + one projection past the vector
    join, and the per-step algebra is unchanged:

    - step 1 ranks by raw sim (id tie-break), no penalty;
    - step i ≥ 2: eligible = unselected candidates having a corpus
      vector AND at least one selected item with a vector (the former
      pairs/pen INNER joins dropped exactly those rows);
    - pen(c) = max over selected s of the dp-rounded cosine(c, s) —
      `array_max` over doubles == the former MAX aggregate;
    - score = lam*sim - (1-lam)*pen on identical doubles, ROUND(…, 6)
      applied to the same value at output only.
    """
    lam = F.lit(lam_tenths / 10.0)
    one_m_lam = F.lit((10 - lam_tenths) / 10.0)
    vecs = corpus.select(
        F.col(id_col).alias("__vid"),
        F.col(vec_col).alias("__v"),
        l2_norm(F.col(vec_col)).alias("__n"),
    )
    # LEFT join: a candidate with no corpus vector still competes on
    # relevance at step 1 (the r16 shape kept raw `cands` for step 1
    # and only the pair frame was inner-joined); its NULL vec excludes
    # it from penalties and from steps >= 2, exactly as the missing
    # pair rows did.
    cv = cands.join(
        vecs, cands["neighbor_id"] == vecs["__vid"], "left"
    ).select("query_id", "neighbor_id", "sim", "__v", "__n")
    packed = cv.groupBy("query_id").agg(
        F.collect_list(
            F.struct("neighbor_id", "sim", "__v", "__n")
        ).alias("__cs")
    )

    def pick(arr, key):
        """argmax by (key desc, neighbor_id asc): max over (key, -id),
        carrying id alongside — ids are unique, so the struct order
        reproduces the former row_number window exactly."""
        return F.array_max(
            F.transform(
                arr,
                lambda c: F.struct(
                    key(c).alias("k"),
                    (-c["neighbor_id"]).alias("nid"),
                    c["neighbor_id"].alias("id"),
                ),
            )
        )

    # Each step's argmax lands in its OWN projection column before the
    # next step references it: higher-order-function lambdas block
    # Catalyst's common-subexpression elimination, so inlining step
    # i-1's `array_max` expression into step i re-evaluates it many
    # times per row — measured 3-4x SLOWER than the r16 join loop.
    # Staged columns are referenced more than once downstream, which
    # also stops CollapseProject from re-inlining them.
    cs = F.col("__cs")
    stage = packed.withColumn("__sel1", pick(cs, lambda c: c["sim"]))
    # NOTE: single-arg lambdas only — F.filter/F.transform treat a
    # two-arg lambda as (element, index)
    for step in range(2, k + 1):
        prev_ids = F.array(
            *[F.col(f"__sel{j}")["id"] for j in range(1, step)]
        )
        # selected-so-far items that carry a vector: the only penalty
        # sources (empty when an earlier step selected nothing — then
        # nothing is eligible below, matching the former inner joins)
        stage = stage.withColumn(
            f"__sv{step}",
            F.filter(
                cs,
                lambda c: F.arrays_overlap(
                    F.array(c["neighbor_id"]), prev_ids
                )
                & c["__v"].isNotNull(),
            ),
        )
        sv = F.col(f"__sv{step}")

        def score_of(c, _sv=sv):
            pen = F.array_max(
                F.transform(
                    _sv,
                    lambda s: cosine_from_norms(
                        c["__v"], s["__v"], c["__n"], s["__n"], dp=dp
                    ),
                )
            )
            return lam * c["sim"] - one_m_lam * pen

        eligible = F.filter(
            cs,
            lambda c: c["__v"].isNotNull()
            & (F.size(sv) > 0)
            & ~F.arrays_overlap(F.array(c["neighbor_id"]), prev_ids),
        )
        stage = stage.withColumn(f"__sel{step}", pick(eligible, score_of))
    out_steps = [
        F.struct(
            F.col("__sel1")["id"].alias("neighbor_id"),
            F.lit(1).cast("long").alias("step"),
            F.round(lam * F.col("__sel1")["k"], 6).alias("score"),
        )
    ] + [
        F.struct(
            F.col(f"__sel{step}")["id"].alias("neighbor_id"),
            F.lit(step).cast("long").alias("step"),
            F.round(F.col(f"__sel{step}")["k"], 6).alias("score"),
        )
        for step in range(2, k + 1)
    ]
    return (
        stage.select(
            "query_id",
            F.explode(
                F.filter(
                    F.array(*out_steps),
                    lambda s: s["neighbor_id"].isNotNull(),
                )
            ).alias("__s"),
        )
        .select(
            "query_id",
            F.col("__s.neighbor_id").alias("neighbor_id"),
            F.col("__s.step").alias("step"),
            F.col("__s.score").alias("score"),
        )
    )
