"""Vector (array<float>) column expressions for similarity search.

Built on ``F.zip_with`` / ``F.aggregate`` higher-order functions —
JVM-side per-element loops over array columns, no Python boundary, no
shuffle. At 100 TB these scale embarrassingly parallel: each partition
computes its own similarities; only the top-k reduction shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column, b: Column) -> Column:
    """Sum of elementwise products, computed in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_from_norms(
    a: Column, b: Column, na: Column, nb: Column, dp: int | None = 6
) -> Column:
    """Cosine similarity with the norms supplied by the caller.

    Bit-identical to ``cosine_similarity`` (sqrt of the same dot product
    yields the same double whether computed once per vector or once per
    pair) but lets pairwise operators hoist the two l2_norm passes out
    of the pair loop — at k pairs per vector that removes ~2/3 of the
    per-pair flops.
    """
    denom = na * nb
    sim = F.when(denom == 0, F.lit(0.0)).otherwise(dot_product(a, b) / denom)
    return F.round(sim, dp) if dp is not None else sim


def cosine_similarity(a: Column, b: Column, dp: int | None = 6) -> Column:
    """Cosine similarity with zero-norm guard (0.0), optionally rounded.

    Rounding (default 6dp) keeps results hash-comparable with oracle
    engines that evaluate in a different operation order.
    """
    denom = l2_norm(a) * l2_norm(b)
    sim = F.when(denom == 0, F.lit(0.0)).otherwise(dot_product(a, b) / denom)
    return F.round(sim, dp) if dp is not None else sim
