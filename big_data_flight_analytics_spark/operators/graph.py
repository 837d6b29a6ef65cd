"""Connected components over a pair graph — dedup clustering.

Near-dup operators (``ngram_jaccard_pairs``, ``minhash_lsh_pairs``,
``simhash_pairs``, ``embedding_neardup_pairs``) emit PAIRS; a dedup
pipeline needs CLUSTERS (transitive closure) so each group keeps one
canonical document. This operator labels every vertex with the minimum
vertex id reachable from it — deterministic, engine-independent.

Algorithm: min-label propagation to fixpoint. Each iteration sends each
vertex's current label to its neighbors and takes the min — a join + a
hash aggregate, both shuffling on the vertex id so AQE reuses the
exchange layout across iterations. Iterations needed = graph diameter;
near-dup clusters are tiny, flat graphs (diameter ~2-4), so the loop
converges in a handful of rounds. The per-iteration driver-side
``count()`` is ONE scalar job on the (vertex-sized) change set — the
standard convergence check for iterative DataFrame algorithms.

Scale notes:
- ``localCheckpoint`` truncates the lineage each iteration; without it
  the plan doubles per round and Catalyst analysis dominates. On a
  cluster, swap for ``checkpoint`` with a durable checkpoint dir (the
  call site is marked) so executor loss cannot invalidate labels.
- For web-scale graphs with high-degree hubs, the large-star /
  small-star variant (Kiveris et al., "Connected Components in
  MapReduce and Beyond") halves rounds; plain min-propagation is the
  right trade for bounded-size dedup clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    vertices: DataFrame | None = None,
    id_col: str = "id",
    max_iter: int = 25,
) -> DataFrame:
    """Label each vertex with min reachable vertex id (cluster_id).

    ``edges`` is treated as undirected. ``vertices`` (optional, column
    ``id_col``) adds isolated vertices, which come back labeled with
    their own id. Output: (``id_col``, cluster_id).
    """
    sym = edges.select(
        F.col(src).alias("__s"), F.col(dst).alias("__d")
    ).union(edges.select(F.col(dst).alias("__s"), F.col(src).alias("__d")))
    # dedup parallel edges once up front (every iteration joins this);
    # localCheckpoint truncates the (possibly expensive) pair-generation
    # lineage after the first materialization — cluster swap point:
    # .checkpoint() with a durable dir
    e = sym.distinct().localCheckpoint(eager=False)

    verts = e.select(F.col("__s").alias(id_col))
    if vertices is not None:
        verts = verts.union(vertices.select(F.col(id_col)))
    labels = verts.distinct().select(
        F.col(id_col), F.col(id_col).alias("cluster_id")
    )

    prev = None
    for _ in range(max_iter):
        # one shuffle + ONE action per iteration: self rows carry the
        # old label tagged, so the same aggregate yields the new label
        # AND the change flag — no separate compare join or second job
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
    return labels


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
