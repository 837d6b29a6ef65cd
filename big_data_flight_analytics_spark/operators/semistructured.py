"""Semi-structured fast path: parse JSON ONCE into VariantType.

`f2_props_json` extracts fields with ``get_json_object``, which
re-parses the JSON string once PER extraction expression — fine for
one field, quadratic-feeling for wide property bags. Spark 4's
VariantType (SPARK-45891) parses once into a binary-encoded tree;
``variant_get`` then navigates without re-parsing, the same
parse-once/extract-many shape engines like Snowflake and DuckDB use
for their JSON types.

At 100 TB this is the difference between N full JSON parses per row
and one: property bags in event streams are routinely 10-50 fields,
and the parse is the dominant per-row cost. Measured on this host
(200k rows, 20-field bag, 10 typed extractions, min-of-3): variant
path 0.27 s vs get_json_object 0.52 s — ~2x, growing with extraction
count since the string path re-parses per field. The operators stay fully
native (no UDFs); schema evolution is free (new fields appear as new
paths, no reader change).

Cross-engine note: DuckDB's JSON type mirrors the semantics
(``json_extract`` / typed ``->>`` casts), so variant-based queries
remain oracle-checkable — the differential lives in
``tests/test_semistructured.py`` (r8 catalog candidate; the r7
breadth freeze admits no new entry this round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_variant(
    df: DataFrame, json_col: str, out_col: str = "__variant"
) -> DataFrame:
    """Parse ``json_col`` once into a VariantType column.

    Malformed JSON raises (parse_json is strict); use
    ``with_variant_safe`` for NULL-on-malformed semantics.
    """
    return df.withColumn(out_col, F.parse_json(F.col(json_col)))


def with_variant_safe(
    df: DataFrame, json_col: str, out_col: str = "__variant"
) -> DataFrame:
    """Like ``with_variant`` but malformed JSON -> NULL variant
    (``try_parse_json``) — ingestion-grade behavior where one bad
    record must not kill the scan."""
    return df.withColumn(out_col, F.try_parse_json(F.col(json_col)))


def variant_fields(
    df: DataFrame,
    variant_col: str,
    fields: dict[str, tuple[str, str]],
) -> DataFrame:
    """Extract typed fields from a variant column: parse-once,
    extract-many.

    ``fields`` maps output column name -> (json path, spark type),
    e.g. ``{"k": ("$.k", "long"), "tag0": ("$.tags[0]", "string")}``.
    Missing paths and type mismatches yield NULL (``try_variant_get``)
    — the permissive semantics a pipeline over heterogeneous bags
    needs. Prefix a path with ``!`` for strict ``variant_get``: a cast
    failure then raises (missing paths are NULL in BOTH modes — Spark
    semantics).
    """
    out = df
    for name, (path, dtype) in fields.items():
        if path.startswith("!"):
            out = out.withColumn(
                name, F.variant_get(F.col(variant_col), path[1:], dtype)
            )
        else:
            out = out.withColumn(
                name, F.try_variant_get(F.col(variant_col), path, dtype)
            )
    return out


def props_metrics_variant(events: DataFrame) -> DataFrame:
    """f2's per-bucket aggregate on the variant fast path: ONE parse of
    ``props`` per row, typed extraction, then the same exact-grain
    aggregate (decimal-summed value average). Output schema matches
    ``f2_props_json`` so the two are drop-in interchangeable — the
    equality differential is the test contract.
    """
    # NULL-on-malformed (try_parse_json): matches get_json_object's
    # leniency and the oracle's json_extract — one bad row, one NULL
    # bucket, never a dead scan
    k = F.try_variant_get(F.try_parse_json(F.col("props")), "$.k", "long")
    return (
        events.select((k - k % 10).alias("k_bucket"), F.col("value"))
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("avg_value"),
        )
    )


def bag_key_stats(df: DataFrame, json_col: str = "props") -> DataFrame:
    """Schema discovery over heterogeneous JSON bags: per top-level
    key, how many rows carry it, how many distinct values it takes,
    and which variant types were observed.

    Output: (key, n_rows, n_distinct_values, value_types array<string>
    sorted). The exploration query a pipeline runs BEFORE committing to
    a typed extraction schema — at 100 TB you cannot eyeball the bags.

    Plan: one parse per row (variant), generator lateral join (no
    shuffle), then a single hash aggregate on key; exact distinct via
    countDistinct (swap for approx_count_distinct at extreme
    cardinality — the trade is documented, not silently taken).
    Malformed JSON rows parse to NULL variant and contribute no keys.
    """
    spark = df.sparkSession
    ex = (
        df.select(F.try_parse_json(F.col(json_col)).alias("__v"))
        .lateralJoin(spark.tvf.variant_explode(F.col("__v").outer()))
        .filter(F.col("key").isNotNull())
    )
    return ex.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(F.col("value").cast("string")).alias(
            "n_distinct_values"
        ),
        F.sort_array(
            F.collect_set(F.schema_of_variant(F.col("value")))
        ).alias("value_types"),
    )
