"""Bucketed table writer — the co-located-join scale primitive.

Writing both sides of a recurring join bucketed (and sorted) by the
join key lets every subsequent join run WITHOUT a shuffle: each task
reads matching bucket files from both tables and merges them directly.
At 100 TB this converts the nightly fact-to-fact join from the
cluster's largest exchange into a scan — you pay one bucketed write,
then every downstream join is exchange-free (verified in
tests/test_bucketed.py by asserting the joined plan contains ZERO
hash exchanges).

Bucket count guidance: buckets x target-file-size ~ table size;
the bucket count must MATCH across tables joined together (Spark only
elides the shuffle when both sides agree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Save ``df`` as a bucketed (optionally sorted) catalog table.

    Bucketing requires the table catalog (``saveAsTable``) — plain
    ``parquet(path)`` writes cannot record bucket metadata.
    """
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
