"""Scalar column-expression library (F* in SURVEY §2.8).

Everything here is a *native column expression* — JVM-side, inside
whole-stage codegen, no Python UDFs — so Catalyst can constant-fold,
push down, and vectorize. The reference computed these either with Spark
built-ins (batch layer) or with plain Java lambdas (speed layer,
e.g. haversine at AirportAircraftCountStream.java:79-88 and the
callsign->airline-code rules at AirlineAircraftCountStream.java:74-85);
both map to pure column expressions here.
"""

from big_data_flight_analytics_spark.functions.scalar import (
    airline_code_from_callsign,
    haversine_km,
    hhmm_to_str,
    minmax_normalize_expr,
)
from big_data_flight_analytics_spark.functions.text import (
    lang_id_expr,
    punct_ratio,
    quality_score,
    rolling_fingerprint,
    stopword_ratio,
    token_count,
)
from big_data_flight_analytics_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_norm,
)

__all__ = [
    "airline_code_from_callsign",
    "cosine_similarity",
    "dot_product",
    "haversine_km",
    "hhmm_to_str",
    "l2_norm",
    "lang_id_expr",
    "minmax_normalize_expr",
    "punct_ratio",
    "quality_score",
    "rolling_fingerprint",
    "stopword_ratio",
    "token_count",
]
