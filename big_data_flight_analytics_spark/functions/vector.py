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


def dot_fixedpoint(a: Column, b: Column, scale: int) -> Column:
    """Order-independent int64 dot product: sum of FLOOR(x*y*scale).

    Each elementwise product is FLOOR-scaled to an int64 grain BEFORE
    summation, so the accumulation is integer addition — associative
    and therefore identical under any fold order, partitioning, or
    engine version. The inputs to the floor are deterministic too:
    float*float is exact in double, and the *scale multiply and FLOOR
    are correctly-rounded IEEE-754 ops, so two engines fed the same
    floats produce the same int64 regardless of how their double
    reductions would have folded. This is the exact-grain doctrine
    (DESIGN.md round 7) applied to dot products; absolute error vs the
    true dot is < dim/scale.
    """
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: F.floor(
                x.cast("double") * y.cast("double") * F.lit(float(scale))
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def norm_sq_fixedpoint(a: Column, scale: int) -> Column:
    """Int64 grain of the squared l2 norm: sum of FLOOR(x*x*scale)."""
    return dot_fixedpoint(a, a, scale)


def cosine_fixedpoint_from_nsq(
    a: Column, b: Column, nsq_a: Column, nsq_b: Column, scale: int
) -> Column:
    """Engine-version-independent cosine from fixed-point components.

    dot and the two squared norms are exact int64 grains
    (``dot_fixedpoint``); the final divide runs in double, but every
    input is an exact integer and sqrt/multiply/divide are
    correctly-rounded IEEE-754 ops — so the resulting double is
    bit-identical across engines, with NO dependence on reduction fold
    order or any ROUND implementation. Built so ranking decisions
    (top-k edges) derived from the value cannot flip between the Spark
    plan and a DuckDB oracle even across DuckDB versions.
    """
    sim = dot_fixedpoint(a, b, scale).cast("double") / (
        F.sqrt(nsq_a.cast("double")) * F.sqrt(nsq_b.cast("double"))
    )
    return F.when(
        (nsq_a <= 0) | (nsq_b <= 0), F.lit(0.0)
    ).otherwise(sim)


def cosine_similarity(a: Column, b: Column, dp: int | None = 6) -> Column:
    """Cosine similarity with zero-norm guard (0.0), optionally rounded.

    Rounding (default 6dp) keeps results hash-comparable with oracle
    engines that evaluate in a different operation order.
    """
    denom = l2_norm(a) * l2_norm(b)
    sim = F.when(denom == 0, F.lit(0.0)).otherwise(dot_product(a, b) / denom)
    return F.round(sim, dp) if dp is not None else sim
