"""big_data_flight_analytics_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
``nkusla/big-data-flight-analytics`` reference pipeline (batch flight
analytics + Kafka-Streams speed layer), re-expressed Spark-first:

- batch = DataFrame/Catalyst (explicit schemas, broadcast dim joins,
  partial+final hash aggregation, AQE);
- speed layer = Structured Streaming (watermarked tumbling windows in
  append mode reproduce the reference's emit-final suppression);
- extensions = LLM-data-pipeline operators (dedup, similarity search,
  text analysis, multimodal plumbing) designed partition-parallel.

Layout:
    session     SparkSession builder with scale-aware defaults
    schemas     explicit StructTypes (flights domain + driver testdata)
    constants   thresholds baked into reference query semantics
    functions   scalar column expressions (haversine, hhmm, text stats...)
    operators   composable DataFrame -> DataFrame operators
    sources     readers / writers / upsert sinks
    plans       named query catalogs (flight domain + testdata-adapted)
    streaming   Structured Streaming jobs (enrichment, windowed counts)
"""

from big_data_flight_analytics_spark.session import get_session, session_builder

__all__ = ["get_session", "session_builder"]

__version__ = "0.1.0"
