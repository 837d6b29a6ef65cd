"""10x scaling study for the dedup/similarity operators.

Builds key-shifted 10x replicas of documents/embeddings from sf0.1
(text/vectors copied verbatim — harsher than fresh data for dedup ops,
since every doc gains 9 more exact near-dups), then times the heavy
catalog queries at 1x vs 10x. Sub-linear-to-linear growth (<= ~6x for
the LSH family) is the pass bar; quadratic offenders show up as >20x.

Usage: python tools/scaling_study.py [base_sf_dir] [replica_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

QUERIES = [
    "t1_text_stats",
    "t3_gopher_metrics",
    "d1_exact_dedup",
    "d2_ngram_jaccard",
    "d3_minhash_lsh",
    "d4_simhash",
    "d5_embedding_neardup",
    "d6_dedup_clusters",
    "d7_decontamination",
    "v2_lsh_topk",
]


def build_replica(base: str, out: str, copies: int = 10) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for table, key in (("documents", "doc_id"), ("embeddings", "vec_id")):
        src = os.path.join(base, f"{table}.parquet")
        dst = os.path.join(out, f"{table}.parquet")
        if os.path.exists(dst):
            continue
        parts = " UNION ALL ".join(
            f"SELECT {key} + {i * 10_000_000} AS {key}, * EXCLUDE ({key}) "
            f"FROM read_parquet('{src}')"
            for i in range(copies)
        )
        con.sql(f"COPY ({parts}) TO '{dst}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT COUNT(*) FROM read_parquet('{dst}')").fetchone()[0]
        print(f"replica {table}: {n} rows")


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1x"
    build_replica(base, out)

    import __spark_entry__ as entrymod
    from big_data_flight_analytics_spark.session import get_session

    spark = get_session(app_name="scaling_study")
    qs = entrymod.queries()
    print(f"{'query':28s} {'1x':>8s} {'10x':>8s} {'growth':>7s}")
    for name in QUERIES:
        t = time.time()
        n1 = qs[name](spark, base).count()
        t1 = time.time() - t
        t = time.time()
        n10 = qs[name](spark, out).count()
        t10 = time.time() - t
        print(
            f"{name:28s} {t1:8.2f} {t10:8.2f} {t10 / t1:6.1f}x"
            f"   rows {n1} -> {n10}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
