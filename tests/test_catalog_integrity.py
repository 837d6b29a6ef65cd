"""Catalog-contract invariants, pinned as tests.

catalog.py raises ValueError on sync drift at import time; these tests
make the remaining invariants (the ones a bad edit could silently
break without failing an import) first-class failures.
"""

from __future__ import annotations

import inspect

from big_data_flight_analytics_spark.plans.catalog import ORACLES, ORDER, QUERIES


# entries DOCUMENTED as rows-only: genuinely non-SQL-expressible,
# value-verified by a pytest reference differential instead of the
# hash gate. Adding a name here is a deliberate contract change, not a
# fallthrough. Empty since r7: g1 moved to exact int64 fixed-point
# PageRank (associative integer sums), giving it a full unrolled-CTE
# DuckDB oracle.
ROWS_ONLY: set[str] = set()


class TestCatalogIntegrity:
    def test_every_query_has_an_oracle_or_is_documented(self):
        # the catalog is oracle-checked — an undocumented queries()-only
        # entry would silently downgrade to the driver's rows-only check
        assert set(ORACLES) == set(QUERIES) - ROWS_ONLY
        assert ROWS_ONLY <= set(QUERIES)

    def test_order_covers_catalog_exactly_once(self):
        assert len(ORDER) == len(set(ORDER)) == len(QUERIES)

    def test_oracles_are_nonempty_sql(self):
        for name, sql in ORACLES.items():
            assert isinstance(sql, str) and "SELECT" in sql.upper(), name

    def test_queries_take_spark_and_sf_dir(self):
        for name, fn in QUERIES.items():
            params = list(inspect.signature(fn).parameters)
            assert len(params) == 2, (name, params)

    def test_catalog_size_floor(self):
        # growth-only guard: round 6 closed at 83 entries; losing
        # entries (a bad merge, an accidental deletion) must fail loud
        assert len(QUERIES) >= 83
