"""Unified named-query catalog: the driver contract surface.

QUERIES maps name -> (spark, sf_dir) -> DataFrame.
ORACLES maps name -> DuckDB SQL over the pre-registered testdata views.
Every QUERIES key without an ORACLES entry gets the driver's weaker
rows-only check (documented per query).
"""

from __future__ import annotations

from big_data_flight_analytics_spark.plans.analytic_queries import (
    ANALYTIC_ORACLES,
    ANALYTIC_QUERIES,
)
from big_data_flight_analytics_spark.plans.extension_queries import (
    EXTENSION_ORACLES,
    EXTENSION_QUERIES,
)
from big_data_flight_analytics_spark.plans.relational_queries import (
    RELATIONAL_ORACLES,
    RELATIONAL_QUERIES,
)

QUERIES = {**RELATIONAL_QUERIES, **EXTENSION_QUERIES, **ANALYTIC_QUERIES}
ORACLES = {**RELATIONAL_ORACLES, **EXTENSION_ORACLES, **ANALYTIC_ORACLES}

assert set(ORACLES) <= set(QUERIES), "oracle without a query"
