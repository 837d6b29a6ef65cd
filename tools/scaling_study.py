"""Scaling study for the dedup/similarity operators.

Two replica models, two different stress axes:

- verbatim (default, 10x): text/vectors copied with shifted keys —
  harsher than fresh data for dedup ops, since every doc gains 9 more
  exact near-dups and every LSH bucket population multiplies.
- fresh (``--fresh``, for 30-100x): per-replica token tagging for text
  and per-replica rotation for embeddings, so replicas share no
  shingles and no near-identical vectors. This models CORPUS GROWTH
  (the 100 TB axis): per-shingle/per-bucket density stays constant
  while volume scales, so the expected cost curve is ~linear in
  copies. Verbatim replication cannot measure this regime — at 100
  copies every shingle exceeds ``max_df`` and candidate generation
  goes trivially empty.

Sub-linear-to-linear growth is the pass bar (<= ~6x at 10x verbatim;
<= ~1.5x-per-copy at 100x fresh); quadratic offenders show up as >20x.

Usage: python tools/scaling_study.py [base_sf_dir] [replica_dir]
           [copies] [--fresh] [query ...]
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
    "j9_asof_events_orders",
    "s4_user_sessions",
    "s5_session_windows",
    "m2_frame_sample",
    "t7_winnow_fingerprints",
    "t19_lm_perplexity",
    "i4_minhash_delta",
    "g2_knn_triangles",
    "d19_sparse_cosine",
    "d20_containment_decon",
]

# (table, primary key, other key columns shifted in lockstep).
# Shifting user_id/o_custkey by the same per-replica offset keeps the
# events<->orders key spaces aligned while making replicas' users
# disjoint: per-key history depth stays constant as volume scales —
# the corpus-growth axis for the temporal operators (as-of join,
# sessionization), whose windows partition by those keys.
TABLES = (
    ("documents", "doc_id", ()),
    ("embeddings", "vec_id", ()),
    ("events", "event_id", ("user_id",)),
    ("orders", "o_orderkey", ("o_custkey",)),
    # star-schema tables in lockstep so fact->dim keys stay aligned
    # across replicas (dims scale with the facts — the realistic growth
    # model for TPC-H-shaped data)
    ("lineitem", "l_orderkey", ("l_partkey", "l_suppkey")),
    ("part", "p_partkey", ()),
    ("supplier", "s_suppkey", ()),
    ("customer", "c_custkey", ()),
)


def build_replica(
    base: str, out: str, copies: int = 10, fresh: bool = False
) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for table, key, lockstep in TABLES:
        src = os.path.join(base, f"{table}.parquet")
        dst = os.path.join(out, f"{table}.parquet")
        if os.path.exists(dst):
            continue
        parts = []
        for i in range(copies):
            shift = "".join(
                f"{c} + {i * 10_000_000} AS {c}, " for c in lockstep
            )
            cols = (
                f"{key} + {i * 10_000_000} AS {key}, {shift}"
                f"* EXCLUDE ({key}{''.join(', ' + c for c in lockstep)})"
            )
            if fresh and table == "documents":
                # tag every token with the replica id: replicas share
                # zero shingles, per-shingle density stays constant
                cols = (
                    f"{key} + {i * 10_000_000} AS {key}, "
                    f"regexp_replace(text, '(\\S+)', 'r{i}\\1', 'g') AS text, "
                    f"* EXCLUDE ({key}, text)"
                )
            elif fresh and table == "embeddings":
                # rotate the vector by the replica id (a rotated
                # gaussian vector is ~orthogonal to the original) and
                # sign-flip past 64 copies — 128 distinct transforms,
                # so no two replicas carry identical vectors and
                # cross-replica near-dups stay absent
                rot = i % 64
                vec = "embedding"
                if rot:
                    vec = f"(embedding[{rot + 1}:] || embedding[1:{rot}])"
                if i >= 64:
                    vec = f"list_transform({vec}, x -> -x)"
                if vec != "embedding":
                    cols = (
                        f"{key} + {i * 10_000_000} AS {key}, "
                        f"{vec}::FLOAT[] AS embedding, "
                        f"* EXCLUDE ({key}, embedding)"
                    )
            parts.append(f"SELECT {cols} FROM read_parquet('{src}')")
        # small row groups keep the replica SPLITTABLE: duckdb's default
        # ~122k-row groups left 10x documents/embeddings as ONE row
        # group — structurally serial in Spark no matter the core count
        # (r17 scaling study) — which a real 100 TB layout never is
        con.sql(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{dst}' "
            "(FORMAT PARQUET, ROW_GROUP_SIZE 4096)"
        )
        n = con.sql(f"SELECT COUNT(*) FROM read_parquet('{dst}')").fetchone()[0]
        print(f"replica {table}: {n} rows ({'fresh' if fresh else 'verbatim'})")
    # fixed-size GLOBAL dims copy through unchanged: nation/region do
    # not scale with the corpus (the realistic growth model), and the
    # nationkey domain is untouched by the key shifting above, so
    # shifted customers/suppliers still resolve their nations
    for table in ("nation", "region"):
        src = os.path.join(base, f"{table}.parquet")
        dst = os.path.join(out, f"{table}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            con.sql(
                f"COPY (SELECT * FROM read_parquet('{src}')) TO '{dst}'"
                " (FORMAT PARQUET)"
            )


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--fresh"]
    fresh = "--fresh" in sys.argv[1:]
    base = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
    out = args[1] if len(args) > 1 else "/tmp/sf1x"
    copies = int(args[2]) if len(args) > 2 else 10
    queries = args[3:] if len(args) > 3 else QUERIES
    build_replica(base, out, copies, fresh)

    import __spark_entry__ as entrymod
    from big_data_flight_analytics_spark.session import get_session

    spark = get_session(app_name="scaling_study")
    label = f"{copies}x"
    print(f"{'query':28s} {'1x':>8s} {label:>8s} {'growth':>7s}")
    qs = entrymod.queries()
    from big_data_flight_analytics_spark.cache import release_tracked

    # JVM/codegen warmup outside every timed region: with a short query
    # list the first measurement would otherwise be dominated by
    # session startup, not the operator
    qs[queries[0]](spark, base).count()
    release_tracked()

    for name in queries:
        t = time.time()
        n1 = qs[name](spark, base).count()
        t1 = time.time() - t
        release_tracked()
        t = time.time()
        nx = qs[name](spark, out).count()
        tx = time.time() - t
        release_tracked()
        print(
            f"{name:28s} {t1:8.2f} {tx:8.2f} {tx / t1:6.1f}x"
            f"   rows {n1} -> {nx}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
