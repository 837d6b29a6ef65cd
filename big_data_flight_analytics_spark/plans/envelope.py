"""Driver output-type envelope: the result-column types a catalog
query may expose.

Lesson of rounds 6-8, proven by the judge's r8 type scan: the driver's
oracle gate canonicalizes both result sets through pandas, and that
layer (a) silently MIS-HASHES DuckDB HUGEINT (int128) columns — rows
and schema "match", hash doesn't — and (b) CRASHES on list-typed
columns (``sort_values`` → ``TypeError: unhashable type: 'list'``).
DuckDB types ``SUM(BIGINT)`` as HUGEINT, so any oracle that exposes a
raw integer sum in its final SELECT is in the failure class even
though every value fits int64. Three rounds of q12/g1 hash-reds had
exactly this one cause.

Safe output columns are scalar only:
{BIGINT and narrower ints, DOUBLE/FLOAT, DECIMAL, VARCHAR,
DATE/TIMESTAMP, BOOLEAN, BLOB}. Oracles must ``CAST(SUM(...) AS
BIGINT)`` (or DOUBLE) in the final SELECT; Spark plans must
``array_join`` / explode away any ArrayType/MapType/StructType before
returning.

``tools/selfcheck.py`` enforces this on every run and
``tests/test_catalog_integrity.py`` scans every oracle's DuckDB
result schema, so the class is caught at commit time instead of by
losing a driver round.
"""

from __future__ import annotations

# Spark typeName() values that pandas cannot canonicalize (sort/hash).
_SPARK_FORBIDDEN = ("array", "map", "struct")


def duckdb_type_problems(columns, types) -> list[str]:
    """Offending ``col: type`` strings for a DuckDB result schema.

    ``columns``/``types`` as returned by a DuckDBPyRelation's
    ``.columns`` / ``.types`` — no query execution required (binding
    only), so the check is free even for the unrolled-CTE oracles.
    """
    problems = []
    for col, t in zip(columns, types):
        s = str(t).upper()
        if (
            "HUGEINT" in s  # covers UHUGEINT: int128 mis-hashes
            or s.endswith("[]")  # LIST: pandas sort_values crashes
            or s.startswith("STRUCT(")
            or s.startswith("MAP(")
            or s.startswith("UNION(")
            or s == "JSON"
        ):
            problems.append(f"{col}: {s}")
    return problems


def spark_schema_problems(schema) -> list[str]:
    """Offending ``col: type`` strings for a Spark result StructType."""
    return [
        f"{f.name}: {f.dataType.typeName()}"
        for f in schema.fields
        if f.dataType.typeName() in _SPARK_FORBIDDEN
    ]
