from __future__ import annotations

import pytest

from big_data_flight_analytics_spark.session import session_builder


@pytest.fixture(scope="session")
def spark():
    s = (
        session_builder(app_name="tests", master="local[8]", shuffle_partitions=4)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
