"""Structured Streaming speed layer (SURVEY §2.9, S1-S7).

The reference's Kafka Streams topology (StreamProcessor.java:25-68) maps
to Structured Streaming jobs over the same operator library:

- GlobalKTable lookups      -> stream-static broadcast joins
- selectKey + filter        -> derived key columns + filters
- 1-min tumbling, no grace  -> window(ts, "1 minute") + watermark("0 seconds")
- suppress(untilWindowCloses) -> outputMode("append") (emit-on-close)
- HashSet distinct-count    -> collect_set size (exact) or
                               approx_count_distinct (HLL scale path)
- Kafka Connect Mongo upsert -> foreachBatch keyed merge
"""

from big_data_flight_analytics_spark.streaming.enrichment import (
    enrich_stream,
    parse_opensky,
    transformed_stream,
)
from big_data_flight_analytics_spark.streaming.windowed_counts import (
    airline_aircraft_counts,
    airport_aircraft_counts,
)

__all__ = [
    "airline_aircraft_counts",
    "airport_aircraft_counts",
    "enrich_stream",
    "parse_opensky",
    "transformed_stream",
]
