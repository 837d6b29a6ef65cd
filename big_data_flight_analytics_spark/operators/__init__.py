"""Composable DataFrame -> DataFrame operators (SURVEY §2 inventory).

core        P*/A*/W*/O*/R* relational operators
joins       J* dimension-enrichment and self joins
geo         J7 haversine radius join (broadcast + banding pre-filter)
dedup       exact / MinHash-LSH / SimHash / n-gram-Jaccard dedup
similarity  brute-force + LSH-bucketed cosine top-k
text        document-level text analysis operators
multimodal  binary-column decode/feature plumbing (mapInPandas)
"""

from big_data_flight_analytics_spark.operators.core import (
    add_global_stats,
    bucketize,
    count_if,
    group_count,
    having,
    minmax_normalize,
    mode_per_group,
    top_k,
    unpivot,
)
from big_data_flight_analytics_spark.operators.joins import (
    dedup_dim_join,
    enrich_left,
)

__all__ = [
    "add_global_stats",
    "bucketize",
    "count_if",
    "dedup_dim_join",
    "enrich_left",
    "group_count",
    "having",
    "minmax_normalize",
    "mode_per_group",
    "top_k",
    "unpivot",
]
