"""Connected components over a pair graph — dedup clustering.

Near-dup operators (``ngram_jaccard_pairs``, ``minhash_lsh_pairs``,
``simhash_pairs``, ``embedding_neardup_pairs``) emit PAIRS; a dedup
pipeline needs CLUSTERS (transitive closure) so each group keeps one
canonical document. This operator labels every vertex with the minimum
vertex id reachable from it — deterministic, engine-independent.

Algorithm: min-label propagation to fixpoint. Each iteration sends each
vertex's current label to its neighbors and takes the min — a join + a
hash aggregate. Iterations needed = graph diameter; near-dup clusters
are tiny, flat graphs (diameter ~2-4), so the loop converges in a
handful of rounds. The per-iteration driver-side ``count()`` is ONE
scalar job on the (vertex-sized) change set — the standard convergence
check for iterative DataFrame algorithms.

Scale design:
- The loop runs ONLY over edge endpoints. Isolated vertices (the vast
  majority of a deduped corpus — most documents are in no near-dup
  pair) never enter the loop; they are attached at the end with a
  broadcast anti-join. Loop frames are O(edges), not O(documents).
- The edge frame is eagerly ``localCheckpoint``-ed once: this both
  truncates the (possibly expensive) pair-generation lineage and lets
  AQE size its partitions to the real edge volume. The loop then runs
  with ``spark.sql.shuffle.partitions`` pinned to that edge-derived
  count and AQE disabled (both restored in a ``finally``): cached
  plans do NOT get AQE output-partition coalescing
  (``spark.sql.optimizer.canChangeCachedPlanOutputPartitioning`` is
  false by default), so without the pin an 882-edge graph would run 32
  reduce tasks per round, and AQE's stage-by-stage materialization
  adds ~0.3 s of scheduling latency per round on frames this small.
  On a cluster, swap ``localCheckpoint`` for ``checkpoint`` with a
  durable dir (call site marked) so executor loss cannot invalidate
  the edge frame.
- For web-scale graphs with high-degree hubs, the large-star /
  small-star variant (Kiveris et al., "Connected Components in
  MapReduce and Beyond") halves rounds; plain min-propagation is the
  right trade for bounded-size dedup clusters.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from big_data_flight_analytics_spark.cache import (
    loop_checkpoint,
    tracked_persist,
)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    vertices: DataFrame | None = None,
    id_col: str = "id",
    max_iter: int = 25,
    num_partitions: int | None = None,
    allow_nonconverged: bool = False,
) -> DataFrame:
    """Label each vertex with min reachable vertex id (cluster_id).

    ``edges`` is treated as undirected. ``vertices`` (optional, column
    ``id_col``) adds isolated vertices, which come back labeled with
    their own id. Output: (``id_col``, cluster_id).

    Raises ``RuntimeError`` if ``max_iter`` rounds pass without
    reaching the fixpoint (labels would be silently wrong for any
    component of diameter > max_iter); pass ``allow_nonconverged=True``
    to downgrade that to a warning.
    """
    sym = edges.select(
        F.col(src).alias("__s"), F.col(dst).alias("__d")
    ).union(edges.select(F.col(dst).alias("__s"), F.col(src).alias("__d")))
    # dedup parallel edges once up front (every iteration joins this);
    # the EAGER localCheckpoint truncates the pair-generation lineage
    # and materializes with AQE-sized partitions — cluster swap point:
    # .checkpoint() with a durable dir
    e = sym.distinct().transform(loop_checkpoint)
    if num_partitions is None:
        # inherit AQE's sizing of the materialized edge frame so loop
        # shuffles match the real data volume (1 task at test scale,
        # proportional at cluster scale)
        num_partitions = max(1, e.rdd.getNumPartitions())

    # loop frames are O(edge endpoints): isolated vertices are attached
    # after convergence, below
    labels = (
        e.select(F.col("__s").alias(id_col))
        .distinct()
        .select(F.col(id_col), F.col(id_col).alias("cluster_id"))
        .coalesce(num_partitions)
    )

    spark = edges.sparkSession
    aqe0 = spark.conf.get("spark.sql.adaptive.enabled")
    parts0 = spark.conf.get("spark.sql.shuffle.partitions")
    prev = None
    changed = 0
    try:
        # pin the loop's shuffle width to the edge-derived count and
        # skip AQE's per-stage re-planning: every frame in the loop is
        # O(edges) and already correctly sized, so AQE can only add
        # scheduling latency here (see module docstring)
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", str(num_partitions))
        for _ in range(max_iter):
            # one shuffle + ONE action per iteration: self rows carry
            # the old label tagged, so the same aggregate yields the
            # new label AND the change flag — no separate compare join
            # or second job
            tagged = labels.select(
                F.col(id_col),
                F.col("cluster_id").alias("__lbl"),
                F.lit(True).alias("__self"),
            )
            msgs = e.join(labels, e["__s"] == labels[id_col]).select(
                F.col("__d").alias(id_col),
                F.col("cluster_id").alias("__lbl"),
                F.lit(False).alias("__self"),
            )
            agg = (
                tagged.union(msgs)
                .groupBy(id_col)
                .agg(
                    F.min("__lbl").alias("cluster_id"),
                    F.min(F.when(F.col("__self"), F.col("__lbl"))).alias("__old"),
                )
                .persist()
            )
            changed = agg.filter(F.col("cluster_id") != F.col("__old")).count()
            if prev is not None:
                prev.unpersist()
            prev = agg
            labels = agg.select(F.col(id_col), "cluster_id")
            if changed == 0:
                break
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe0)
        spark.conf.set("spark.sql.shuffle.partitions", parts0)
    if changed != 0:
        msg = (
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); a component has diameter "
            f"> max_iter and its labels are NOT final"
        )
        if allow_nonconverged:
            warnings.warn(msg, RuntimeWarning, stacklevel=2)
        else:
            if prev is not None:
                prev.unpersist()
            raise RuntimeError(msg)

    # materialize the converged labels (tiny: one row per edge
    # endpoint) so the last loop cache can be released — no persisted
    # frame escapes this operator
    final = labels.transform(loop_checkpoint)
    if prev is not None:
        prev.unpersist()

    if vertices is not None:
        isolated = (
            vertices.select(F.col(id_col))
            .join(F.broadcast(final.select(id_col)), id_col, "left_anti")
            .select(F.col(id_col), F.col(id_col).alias("cluster_id"))
        )
        final = final.union(isolated)
    return final


def dedup_clusters(
    pairs: DataFrame,
    documents: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "doc_a",
    pair_b: str = "doc_b",
) -> DataFrame:
    """Cluster docs by near-dup pairs; mark each doc's canonical doc.

    Output: (doc_id, cluster_id, is_canonical) — ``cluster_id`` is the
    min doc id of the cluster, singletons are their own canonical.
    Filtering ``is_canonical`` yields the deduplicated corpus.
    """
    labeled = connected_components(
        pairs, src=pair_a, dst=pair_b,
        vertices=documents.select(F.col(id_col).alias("id")),
        id_col="id",
    )
    return labeled.select(
        F.col("id").alias(id_col),
        "cluster_id",
        (F.col("id") == F.col("cluster_id")).alias("is_canonical"),
    )


def canonical_by_score(
    clusters: DataFrame,
    scored_docs: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Pick each cluster's keeper by a quality score, not by min id.

    Production dedup pipelines (C4 / RefinedWeb style) keep the BEST
    member of a near-dup cluster — typically the longest or
    highest-quality one — rather than an arbitrary canonical.
    ``clusters`` is ``dedup_clusters`` output (doc_id, cluster_id, ...);
    ``scored_docs`` carries ``(id_col, score_col)``. Highest score wins,
    ties break on min doc id so the choice is deterministic.

    Output: (cluster_id, kept_doc_id, <score_col>, cluster_size).

    Plan: one doc-keyed equi-join and one cluster-partitioned
    ``row_number`` window. Cluster sizes are bounded by near-dup
    neighborhoods (not corpus size), so the window partitions stay
    small at any scale; the join shuffles on doc id with AQE free to
    broadcast the smaller side.
    """
    from pyspark.sql import Window

    joined = clusters.select(id_col, "cluster_id").join(
        scored_docs.select(id_col, score_col), id_col
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return (
        joined.select(
            "cluster_id",
            F.col(id_col),
            F.col(score_col),
            F.row_number().over(w).alias("__rn"),
            F.count(F.lit(1))
            .over(Window.partitionBy("cluster_id"))
            .cast("bigint")
            .alias("cluster_size"),
        )
        .filter(F.col("__rn") == 1)
        .select(
            "cluster_id",
            F.col(id_col).alias("kept_doc_id"),
            score_col,
            "cluster_size",
        )
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    num_iter: int = 10,
    damping: float = 0.85,
    num_partitions: int | None = None,
) -> DataFrame:
    """PageRank over a directed edge list: (node, rank).

    The canonical iterative-algorithm shape this engine supports beyond
    fixpoint labeling (``connected_components``): each round is one
    join (ranks -> out-edges) + one aggregation (contributions by
    destination), with dangling-node mass redistributed uniformly via a
    one-row aggregate crossJoined back (in-plan — no driver collect).
    Lineage is truncated per round with an eager localCheckpoint
    (cluster swap point: durable ``checkpoint()``), and loop-frame
    partitioning is pinned so every iteration shuffles the same way —
    the same discipline as the connected-components loop.

    Ranks sum to 1 (within float accumulation) every round. Fixed
    ``num_iter`` — PageRank converges geometrically (damping^k); ten
    rounds is the classic default. Ordering within float ties is not
    guaranteed; results are verified against a reference implementation
    under tolerance in pytest, not the bit-exact oracle gate (sums over
    variable-cardinality neighbor sets are accumulation-order
    dependent — the documented boundary of the hash-gate contract).
    """
    e = (
        edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
        .distinct()
        .transform(loop_checkpoint)
    )
    if num_partitions is None:
        num_partitions = max(1, e.rdd.getNumPartitions())

    nodes = (
        e.select(F.col("__s").alias("node"))
        .union(e.select(F.col("__d").alias("node")))
        .distinct()
        .coalesce(num_partitions)
        .transform(loop_checkpoint)
    )
    n_total = nodes.count()
    if n_total == 0:
        # empty graph -> empty ranks (not a ZeroDivisionError)
        return nodes.select("node", F.lit(0.0).alias("rank"))
    # out-degree is loop-INVARIANT: attach it to the node frame once
    # (checkpointed) and let the rank frame carry it through every
    # round. The former per-round ranks->out_deg join re-evaluated the
    # degree aggregation TWICE per iteration (the dangling branch and
    # the contribution branch each own a copy of the join lineage —
    # Spark shares no subplans); now the dangling mass is a filter+agg
    # over the checkpointed rank frame and the loop has no degree join
    # at all (r16, guide §2.4).
    out_deg = e.groupBy(F.col("__s").alias("node")).agg(
        F.count(F.lit(1)).alias("__deg")
    )
    nodes_deg = loop_checkpoint(
        nodes.join(out_deg, "node", "left").coalesce(num_partitions)
    )
    base = F.lit((1.0 - damping) / n_total)

    ranks = nodes_deg.select("node", "__deg", F.lit(1.0 / n_total).alias("rank"))
    for _ in range(num_iter):
        # dangling mass: nodes with no out-edges spread rank everywhere
        dangling = ranks.filter(F.col("__deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dang")
        )
        contribs = (
            ranks.filter(F.col("__deg").isNotNull())
            .join(e, ranks.node == e.__s)
            .select(
                F.col("__d").alias("node"),
                (F.col("rank") / F.col("__deg")).alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        ranks = (
            nodes_deg.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "__deg",
                (
                    base
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("__in"), F.lit(0.0))
                        + F.col("__dang") / n_total
                    )
                ).alias("rank"),
            )
            .coalesce(num_partitions)
            .transform(loop_checkpoint)
        )
    return ranks.select("node", "rank")


def pagerank_fixedpoint(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    num_iter: int = 5,
    damping_num: int = 17,
    damping_den: int = 20,
    scale: int = 10**12,
    num_partitions: int | None = None,
) -> DataFrame:
    """PageRank in exact int64 fixed-point: (node, rank_fp).

    The float ``pagerank`` above is accumulation-order dependent (sums
    over variable-cardinality neighbor sets), which kept it outside the
    bit-exact oracle gate. This variant makes every arithmetic step an
    int64 operation — integer addition is associative-exact, so ANY
    engine computing the same formula produces the same bits:

    - ranks are integer "rank units" out of ``scale`` (default 1e12);
      initial rank = ``scale DIV n``
    - damping is the rational ``damping_num/damping_den`` (17/20 =
      0.85); base = ``(den-num)*scale DIV (den*n)`` (a Python int —
      exact)
    - per-edge contribution = ``rank DIV out_degree`` (integer floor
      division; all values non-negative, so floor == truncate in every
      engine)
    - dangling mass redistributes as ``dang DIV n``
    - update: ``base + (num * (in + dang DIV n)) DIV den``

    Overflow bound: every rank <= scale (floors only lose mass), so the
    largest intermediate is ``num * scale`` = 1.7e13 << 2^63. Floor
    rounding leaks ~1 unit per op (<= 1e-12 relative at the default
    scale) and leaks identically in both engines — the point is
    determinism, and the leaked mass is far below any ranking use.

    Same physical shape as ``pagerank``: per round one join + one agg,
    in-plan dangling mass via broadcast crossJoin, pinned loop
    partitioning, per-round localCheckpoint lineage truncation
    (via ``loop_checkpoint`` — durable on a cluster).

    Measured negative result (r7): pinning the loop's shuffle width
    with AQE disabled — the discipline that pays off for the
    connected-components and BPE loops — REGRESSED this loop ~1.7x at
    sf0.1. Checkpointed frames carry no size stats, so the static
    planner demotes the rank->out-degree and contribution joins from
    AQE's runtime broadcast conversion; at PageRank's frame sizes that
    costs more than the per-round scheduling latency saves. Keep AQE
    on here.
    """
    e = (
        edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
        .distinct()
        .transform(loop_checkpoint)
    )
    if num_partitions is None:
        num_partitions = max(1, e.rdd.getNumPartitions())

    nodes = (
        e.select(F.col("__s").alias("node"))
        .union(e.select(F.col("__d").alias("node")))
        .distinct()
        .coalesce(num_partitions)
        .transform(loop_checkpoint)
    )
    n_total = nodes.count()
    if n_total == 0:
        return nodes.select("node", F.lit(0).cast("long").alias("rank_fp"))
    # loop-invariant degree rides the checkpointed node/rank frames —
    # same rationale as the float variant above (r16, guide §2.4): the
    # per-round ranks->out_deg join evaluated the degree aggregation
    # twice per iteration (dangling + contribution branches); now the
    # loop body has no degree join and the dangling mass is a
    # filter+agg over the already-materialized rank frame. Integer
    # sums over identical groups — bit-identical ranks.
    out_deg = e.groupBy(F.col("__s").alias("node")).agg(
        F.count(F.lit(1)).alias("__deg")
    )
    nodes_deg = loop_checkpoint(
        nodes.join(out_deg, "node", "left").coalesce(num_partitions)
    )
    base = ((damping_den - damping_num) * scale) // (damping_den * n_total)

    ranks = nodes_deg.select(
        "node", "__deg", F.lit(scale // n_total).cast("long").alias("__r")
    )
    for _ in range(num_iter):
        dangling = ranks.filter(F.col("__deg").isNull()).agg(
            F.coalesce(F.sum("__r"), F.lit(0)).cast("long").alias("__dang")
        )
        contribs = (
            ranks.filter(F.col("__deg").isNotNull())
            .join(e, ranks.node == e.__s)
            .select(
                F.col("__d").alias("node"),
                F.expr("__r DIV __deg").alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").cast("long").alias("__in"))
        )
        ranks = (
            nodes_deg.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "__deg",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_num} * (coalesce(__in, CAST(0 AS BIGINT))"
                        f" + __dang DIV {n_total})) DIV {damping_den}"
                    )
                )
                .cast("long")
                .alias("__r"),
            )
            .coalesce(num_partitions)
            .transform(loop_checkpoint)
        )
    return ranks.select("node", F.col("__r").alias("rank_fp"))


def triangle_clustering(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle count + local clustering coefficient:
    (node, degree, triangles, lcc).

    The standard distributed triangle algorithm (node-iterator++ /
    Cohen's MapReduce formulation): symmetrize to distinct undirected
    edges, ORIENT each edge from its (degree, id)-smaller endpoint to
    the larger, enumerate wedges by self-joining the oriented
    adjacency on the center, and close each wedge against the oriented
    edge set. Orientation is the scale lever: every triangle is
    counted exactly once, and the wedge count is bounded by
    sum(out_deg choose 2) with out_deg <= O(sqrt(m)) — the hub node
    that would generate deg^2 wedges under naive enumeration generates
    none, because all its edges point INTO it. On a kNN graph
    (out-degree <= k before symmetrization) the bound is k-small
    everywhere.

    Clustering coefficient = 2*T / (d*(d-1)) — a graph-quality signal
    for curation: near-dup neighborhoods are cliquish (lcc -> 1),
    topical hubs are star-like (lcc -> 0). Determinism: triangle and
    degree counts are exact integers; the final division is one
    correctly-rounded IEEE-754 double op on exact integer inputs, so
    any engine produces the same bits (no float accumulation
    anywhere). deg < 2 yields lcc = 0.0 by definition (no wedge).

    Plan: one distinct + one degree agg + two degree joins, the wedge
    self-join (shuffle on the center node), the closing join (shuffle
    on the edge pair), one count agg. No driver-side state. Every join
    is pinned ShuffledHashJoin (the v8/d18 discipline): both sides are
    node- or edge-scale — the corpus itself, never broadcastable at
    100 TB — and hash beats sort-merge on already-shuffled integer
    keys; AQE may still locally convert where runtime stats allow.
    ``und``, ``deg`` and ``oriented`` are persisted (released by the
    caller's ``release_tracked``): Spark shares no subplans across
    DataFrame references, so without the pins each multiply-referenced
    frame would re-run its (possibly expensive — e.g. the kNN
    pipeline) lineage per reference; measured 98 s -> ~8 s on the g2
    catalog entry at sf0.001, and the corner/endpoint counts explode
    one array per row instead of unioning per-column branches so each
    input is read once.
    """
    und = tracked_persist(
        edges.filter(F.col(src) != F.col(dst))
        .select(
            F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
        )
        .distinct()
    )
    # one pass over und (explode both endpoints), not a 2-branch
    # unionAll (Spark shares no subplans: each branch re-scans its
    # input); persisted because THREE consumers reference deg (two
    # orientation joins + the final left join) and each reference
    # would otherwise re-run the degree aggregation (guide §2.3)
    deg = tracked_persist(
        und.select(
            F.explode(F.array(F.col("a"), F.col("b"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    # orient toward the (degree, id)-larger endpoint; spelled as plain
    # boolean algebra (not struct comparison) so the oracle SQL is a
    # literal restatement with zero cross-engine comparison semantics
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = tracked_persist(
        und.join(
            deg.select(
                F.col("node").alias("a"), F.col("degree").alias("da")
            ).hint("shuffle_hash"),
            "a",
        )
        .join(
            deg.select(
                F.col("node").alias("b"), F.col("degree").alias("db")
            ).hint("shuffle_hash"),
            "b",
        )
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
            F.when(lower_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
        )
    )
    w1 = oriented.select(
        F.col("u"), F.col("v").alias("x"), F.col("dv").alias("dx")
    )
    w2 = oriented.select(
        F.col("u"), F.col("v").alias("y"), F.col("dv").alias("dy")
    )
    # wedge (x, y) ordered by the same total order, so the closing
    # oriented edge can only be x -> y: one equi-join, no OR-join
    wedges = w1.join(w2.hint("shuffle_hash"), "u").filter(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    closing = oriented.select(
        F.col("u").alias("x"), F.col("v").alias("y")
    )
    triangles = wedges.join(
        closing.hint("shuffle_hash"), ["x", "y"]
    ).select("u", "x", "y")
    # each triangle contributes its three corners in ONE pass
    # (explode), not a 3-branch unionAll: triangles is unpersisted by
    # design (it is consumed exactly once now), and the former three
    # branches each re-executed the whole wedge+closing join lineage —
    # measured ~2 s per extra execution on the g2 entry at sf0.1,
    # the query's dominant cost (guide §2.3: don't recompute what you
    # can read once)
    per_node = (
        triangles.select(
            F.explode(
                F.array(F.col("u"), F.col("x"), F.col("y"))
            ).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("triangles"))
    )
    return (
        deg.join(per_node.hint("shuffle_hash"), "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce(F.col("triangles"), F.lit(0).cast("long")).alias(
                "triangles"
            ),
            F.when(F.col("degree") < 2, F.lit(0.0))
            .otherwise(
                (2 * F.coalesce(F.col("triangles"), F.lit(0))).cast("double")
                / (F.col("degree") * (F.col("degree") - 1)).cast("double")
            )
            .alias("lcc"),
        )
    )
