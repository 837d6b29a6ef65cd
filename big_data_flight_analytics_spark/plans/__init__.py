"""Named query catalogs.

relational_queries   SURVEY §2 operator inventory over the driver's
                     TPC-H-ish testdata (the DuckDB-oracle gate)
extension_queries    LLM-data-pipeline operators (dedup, similarity,
                     text analysis, multimodal) over documents/embeddings
flight_queries       the reference's nine flight-domain queries + lookups
                     over flight-schema DataFrames (unit-tested on
                     synthesized fixtures)
"""

from big_data_flight_analytics_spark.plans.catalog import ORACLES, QUERIES

__all__ = ["ORACLES", "QUERIES"]
