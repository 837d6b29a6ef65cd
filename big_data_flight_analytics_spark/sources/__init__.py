"""Sources and sinks (SURVEY §2.1, IO1-IO13)."""

from big_data_flight_analytics_spark.sources.readers import (
    read_csv,
    read_json,
    read_orc,
    read_parquet,
)
from big_data_flight_analytics_spark.sources.replay import FileReplay
from big_data_flight_analytics_spark.sources.writers import (
    kafka_message_frame,
    upsert_foreach_batch,
    write_json,
    write_orc,
    write_parquet,
)

__all__ = [
    "FileReplay",
    "kafka_message_frame",
    "read_csv",
    "read_json",
    "read_orc",
    "read_parquet",
    "upsert_foreach_batch",
    "write_json",
    "write_orc",
    "write_parquet",
]
