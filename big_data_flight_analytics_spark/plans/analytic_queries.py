"""Advanced analytic catalog queries: as-of join, sessionization,
multi-dimensional rollup, pivot, and IVF approximate nearest neighbor.

These widen the engine beyond the reference's surface with the
operators a warehouse/training-data pipeline leans on daily. Every
entry runs under the full oracle gate (rows/schema/value-hash vs
DuckDB).

Parity notes (see BASELINE.md / tools/selfcheck.py):
- timestamps are never emitted — epoch micros BIGINTs only;
- session/as-of ordering always carries explicit tie-break columns;
- double sums are accumulated as DECIMAL (exact, order-independent)
  then cast back to DOUBLE, so engine-specific accumulation order
  cannot flip a rounding boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_flight_analytics_spark.operators.similarity import ivf_topk
from big_data_flight_analytics_spark.operators.temporal import (
    asof_join,
    session_stats,
)
from big_data_flight_analytics_spark.plans.tables import load

# ---------------------------------------------------------------------------
# J9 — as-of join: each event gets the most recent order of the same
# customer (order_date <= event_ts; ties -> largest orderkey).
# Union-window strategy: ONE shuffle on the key, no range explosion.
# ---------------------------------------------------------------------------


def j9_asof_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        "o_orderdate",
        "o_orderkey",
        "o_totalprice",
    )
    joined = asof_join(
        events.select("event_id", "user_id", "ts"),
        orders,
        on="user_id",
        left_time="ts",
        right_time="o_orderdate",
        payload={"o_orderkey": "asof_orderkey", "o_totalprice": "asof_totalprice"},
        right_tie="o_orderkey",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("event_us"),
        "asof_orderkey",
        "asof_totalprice",
    )


J9_SQL = """
WITH l AS (
    SELECT event_id, user_id, epoch_us(ts) AS t FROM events
), r AS (
    SELECT o_custkey AS user_id, epoch_us(o_orderdate) AS t,
           o_orderkey, o_totalprice
    FROM orders
), u AS (
    SELECT event_id, user_id, t, 1 AS side, CAST(NULL AS BIGINT) AS tie,
           CAST(NULL AS BIGINT) AS p_key, CAST(NULL AS DOUBLE) AS p_price
    FROM l
    UNION ALL
    SELECT NULL, user_id, t, 0, o_orderkey, o_orderkey, o_totalprice FROM r
), filled AS (
    SELECT event_id, user_id, t, side,
           LAST_VALUE(p_key IGNORE NULLS) OVER w AS asof_orderkey,
           LAST_VALUE(p_price IGNORE NULLS) OVER w AS asof_totalprice
    FROM u
    WINDOW w AS (PARTITION BY user_id ORDER BY t ASC, side ASC, tie ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, t AS event_us, asof_orderkey, asof_totalprice
FROM filled WHERE side = 1
"""


# ---------------------------------------------------------------------------
# J14 — as-of join with TOLERANCE (kdb wj / QuestDB "ASOF ...
# TOLERANCE" semantics): the most recent match counts only if it is
# RECENT ENOUGH — a purchase is attributed to the user's last click
# only within the attribution window; anything staler is no match at
# all (NULL payloads), which plain as-of cannot express. Composition:
# the same one-shuffle union-window as-of (j9) carrying the matched
# timestamp as payload, then a map-only staleness gate. Attribution
# rate here: 683 of 1981 purchases have a click within 1 day at
# sf0.01 — both branches well-populated at every scale.
# ---------------------------------------------------------------------------

J14_TOL_US = 86_400 * 1_000_000  # 1-day attribution window


def j14_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("cts"),
        F.col("event_id").alias("click_id"),
        "value",
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_time="ts",
        right_time="cts",
        payload={
            "click_id": "asof_click_id",
            "cts": "asof_click_ts",
            "value": "asof_click_value",
        },
        right_tie="click_id",
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    aus = F.unix_micros(F.col("asof_click_ts").cast("timestamp"))
    within = F.col("asof_click_ts").isNotNull() & (
        (us - aus) <= J14_TOL_US
    )
    return joined.select(
        "event_id",
        "user_id",
        us.alias("event_us"),
        F.when(within, F.col("asof_click_id")).alias("asof_click_id"),
        F.when(within, F.col("asof_click_value")).alias("asof_click_value"),
        F.when(within, us - aus).alias("asof_gap_us"),
    )


J14_SQL = f"""
WITH l AS (
    SELECT event_id, user_id, epoch_us(ts) AS t FROM events
    WHERE event_type = 'purchase'
), r AS (
    SELECT user_id, epoch_us(ts) AS t, event_id AS click_id, value
    FROM events WHERE event_type = 'click'
), u AS (
    SELECT event_id, user_id, t, 1 AS side, CAST(NULL AS BIGINT) AS tie,
           CAST(NULL AS BIGINT) AS p_id, CAST(NULL AS BIGINT) AS p_t,
           CAST(NULL AS DOUBLE) AS p_v
    FROM l
    UNION ALL
    SELECT NULL, user_id, t, 0, click_id, click_id, t, value FROM r
), filled AS (
    SELECT event_id, user_id, t, side,
           LAST_VALUE(p_id IGNORE NULLS) OVER w AS a_id,
           LAST_VALUE(p_t IGNORE NULLS) OVER w AS a_t,
           LAST_VALUE(p_v IGNORE NULLS) OVER w AS a_v
    FROM u
    WINDOW w AS (PARTITION BY user_id ORDER BY t ASC, side ASC, tie ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, t AS event_us,
       CASE WHEN t - a_t <= {J14_TOL_US} THEN a_id END AS asof_click_id,
       CASE WHEN t - a_t <= {J14_TOL_US} THEN a_v END AS asof_click_value,
       CASE WHEN t - a_t <= {J14_TOL_US} THEN t - a_t END AS asof_gap_us
FROM filled WHERE side = 1
"""


# ---------------------------------------------------------------------------
# S4 — gap sessionization (30-min inactivity) -> per-session stats.
# lag + running sum over one per-user window; micros-exact arithmetic.
# ---------------------------------------------------------------------------

SESSION_GAP_S = 1800


def s4_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return session_stats(
        events.select("user_id", "event_id", "ts"),
        key_col="user_id",
        ts_col="ts",
        gap_seconds=SESSION_GAP_S,
        tie_col="event_id",
    ).select("user_id", "session_idx", "n_events", "start_us", "end_us", "duration_us")


S4_SQL = f"""
WITH e AS (
    SELECT user_id, event_id, epoch_us(ts) AS us FROM events
), flags AS (
    SELECT user_id, event_id, us,
           CASE WHEN lag(us) OVER w IS NULL
                     OR us - lag(us) OVER w > {SESSION_GAP_S} * 1000000
                THEN 1 ELSE 0 END AS nf
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC)
), sess AS (
    SELECT user_id, us,
           CAST(SUM(nf) OVER (PARTITION BY user_id
                              ORDER BY us ASC, event_id ASC
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS session_idx
    FROM flags
)
SELECT user_id, session_idx,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(us) AS start_us,
       MAX(us) AS end_us,
       MAX(us) - MIN(us) AS duration_us
FROM sess GROUP BY user_id, session_idx
"""


# ---------------------------------------------------------------------------
# S5 — native session windows: the same gap-sessionization as S4 but
# through Spark's built-in ``session_window`` aggregate (the operator
# Structured Streaming uses for streaming sessionization; identical
# code runs on a stream). Semantics verified empirically: events merge
# while the time delta is <= gap (a delta of exactly ``gap`` merges),
# and the session end is last-event-time + gap — the oracle encodes
# both rules. One shuffle on the user key, merge happens inside the
# session-window aggregate (no window-function pass).
# ---------------------------------------------------------------------------


def s5_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return (
        events.select("user_id", "ts")
        .groupBy(
            "user_id",
            F.session_window("ts", f"{SESSION_GAP_S} seconds").alias("w"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
        )
    )


S5_SQL = f"""
WITH e AS (
    SELECT user_id, event_id, epoch_us(ts) AS us FROM events
), flags AS (
    SELECT user_id, us,
           CASE WHEN lag(us) OVER w IS NULL
                     OR us - lag(us) OVER w > {SESSION_GAP_S} * 1000000
                THEN 1 ELSE 0 END AS nf
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC)
), sess AS (
    SELECT user_id, us,
           SUM(nf) OVER (PARTITION BY user_id ORDER BY us ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_idx
    FROM flags
)
SELECT user_id,
       MIN(us) AS session_start_us,
       MAX(us) + {SESSION_GAP_S} * 1000000 AS session_end_us,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM sess GROUP BY user_id, session_idx
"""


# ---------------------------------------------------------------------------
# A8 — multi-dimensional rollup: revenue cube over returnflag x
# linestatus with grouping id. DECIMAL-accumulated sums (exact,
# order-independent) cast back to DOUBLE.
# ---------------------------------------------------------------------------


def a8_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Rollup via re-aggregation of the FINEST grouping, not
    # `df.rollup(...)`: Catalyst's rollup inserts an Expand node that
    # triples every input row BEFORE the partial aggregate (measured
    # 2.7 s vs 0.9 s at sf0.1). Aggregating (flag, status) once and
    # rolling the tiny 8-row result up is semantically identical here
    # because count/sum re-aggregate exactly — DECIMAL sums make the
    # re-summation order-independent too. At 100 TB the win grows: the
    # expensive pass over the fact table happens once instead of once
    # per grouping-set.
    li = load(spark, sf_dir, "lineitem")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    fine = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(revenue).alias("__rev"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("__qty"),
    )
    lvl0 = fine.select(
        "l_returnflag", "l_linestatus", F.lit(0).cast("long").alias("gid"),
        "__n", "__rev", "__qty",
    )
    lvl1 = (
        fine.groupBy("l_returnflag")
        .agg(F.sum("__n").alias("__n"), F.sum("__rev").alias("__rev"),
             F.sum("__qty").alias("__qty"))
        .select(
            "l_returnflag", F.lit(None).cast("string").alias("l_linestatus"),
            F.lit(1).cast("long").alias("gid"), "__n", "__rev", "__qty",
        )
    )
    lvl3 = (
        fine.groupBy()
        .agg(F.sum("__n").alias("__n"), F.sum("__rev").alias("__rev"),
             F.sum("__qty").alias("__qty"))
        .select(
            F.lit(None).cast("string").alias("l_returnflag"),
            F.lit(None).cast("string").alias("l_linestatus"),
            F.lit(3).cast("long").alias("gid"), "__n", "__rev", "__qty",
        )
    )
    return lvl0.unionByName(lvl1).unionByName(lvl3).select(
        "l_returnflag", "l_linestatus", "gid",
        F.col("__n").alias("n_items"),
        F.col("__rev").cast("double").alias("revenue"),
        F.col("__qty").cast("double").alias("sum_qty"),
    )


A8_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


# ---------------------------------------------------------------------------
# R4 — pivot: order totals per priority, one column per order status.
# Explicit pivot values keep the plan single-pass (no distinct-scan job).
# ---------------------------------------------------------------------------

ORDER_STATUSES = ["F", "O", "P"]


def r4_pivot_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ORDER_STATUSES)
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"))
    )


R4_SQL = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'F'
                     THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
            AS DOUBLE) AS "F",
       CAST(SUM(CASE WHEN o_orderstatus = 'O'
                     THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
            AS DOUBLE) AS "O",
       CAST(SUM(CASE WHEN o_orderstatus = 'P'
                     THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
            AS DOUBLE) AS "P"
FROM orders GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# V3 — IVF approximate top-k over embeddings: deterministic coarse
# centroids, nprobe-cell probing, exact cosine within candidates.
# ---------------------------------------------------------------------------

N_QUERY_VECS = 5
TOPK = 3
N_CENTROIDS = 16
NPROBE = 4


def v3_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return ivf_topk(
        emb, queries, k=TOPK, n_centroids=N_CENTROIDS, nprobe=NPROBE
    )


V3_SQL = f"""
WITH cents AS (
    SELECT vec_id AS cid, embedding AS cvec FROM embeddings
    ORDER BY vec_id ASC LIMIT {N_CENTROIDS}
), cscored AS (
    SELECT e.vec_id, e.embedding, c.cid,
           ROUND(
             list_dot_product(e.embedding, c.cvec) /
             (sqrt(list_dot_product(e.embedding, e.embedding))
              * sqrt(list_dot_product(c.cvec, c.cvec))), 4) AS csim
    FROM embeddings e CROSS JOIN cents c
), assigned AS (
    SELECT vec_id AS neighbor_id, embedding AS nv, cid AS cell FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY csim DESC, cid ASC) AS rn
        FROM cscored
    ) WHERE rn <= 1
), probes AS (
    SELECT vec_id AS query_id, embedding AS qv, cid AS cell FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY csim DESC, cid ASC) AS rn
        FROM cscored WHERE vec_id < {N_QUERY_VECS}
    ) WHERE rn <= {NPROBE}
), scored AS (
    SELECT p.query_id, a.neighbor_id,
           ROUND(
             list_dot_product(p.qv, a.nv) /
             (sqrt(list_dot_product(p.qv, p.qv))
              * sqrt(list_dot_product(a.nv, a.nv))), 4) AS sim
    FROM assigned a JOIN probes p ON a.cell = p.cell
    WHERE a.neighbor_id <> p.query_id
), ranked AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, neighbor_id ASC) AS rn
    FROM scored
)
SELECT query_id, neighbor_id, sim FROM ranked WHERE rn <= {TOPK}
"""


# ---------------------------------------------------------------------------
# F2 — JSON extraction: parse the `props` JSON column, bucket the `k`
# field, aggregate. get_json_object is JVM-side (Jackson) — the JSON
# path never leaves codegen, no UDF.
# ---------------------------------------------------------------------------


def f2_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    # VariantType fast path (Spark 4): parse the props bag ONCE into a
    # binary-encoded tree and extract typed — measured ~2x over
    # get_json_object at 10 extractions and growing with field count
    # (operators/semistructured.py). Verified equal to the string path
    # on real data (tests/test_semistructured.py); the DuckDB oracle is
    # representation-agnostic (same values either way).
    events = load(spark, sf_dir, "events")
    # try_parse_json, not parse_json: one malformed props row must
    # contribute a NULL bucket (get_json_object's old semantics, and
    # the DuckDB oracle's lenient json_extract), not kill the query
    k = F.try_variant_get(
        F.try_parse_json(F.col("props")), "$.k", "long"
    )
    return (
        events.select(
            (k - k % 10).alias("k_bucket"),
            F.col("value"),
        )
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact decimal accumulation (events.value is a 2dp
            # measure): order-free sum, one deterministic quotient —
            # raw AVG over doubles under ROUND is the q12-class risk
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("avg_value"),
        )
    )


F2_SQL = """
WITH parsed AS (
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, value
    FROM events
)
SELECT k - k % 10 AS k_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*), 4) AS avg_value
FROM parsed GROUP BY k_bucket
"""


# ---------------------------------------------------------------------------
# F3 — bag-key schema discovery (the variant family's catalog
# promotion, VERDICT r7 #5): per top-level JSON key, how many rows
# carry it and how many distinct values it takes — the exploration
# query a pipeline runs BEFORE committing to a typed extraction
# schema. events.props is a homogeneous {"k": int} bag, so the query
# first derives a genuinely heterogeneous bag in-plan
# (to_json(struct(...)) drops NULL fields, making `big_value` a
# conditionally-present key), then runs the real discovery operator:
# parse-once variant + variant_explode lateral join (map-side, no
# shuffle) + one hash aggregate. The oracle computes the same stats
# relationally (conditional UNION ALL of key/value pairs) — no
# engine JSON dependence at all, per the r8 form-robustness doctrine.
# value_types stays pytest-gated (schema_of_variant strings have no
# engine-neutral oracle form).
# ---------------------------------------------------------------------------


def f3_bag_key_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.semistructured import (
        bag_key_stats,
    )

    ev = load(spark, sf_dir, "events")
    bag = ev.select(
        F.to_json(
            F.struct(
                F.col("event_type"),
                F.col("user_id"),
                F.when(F.col("value") > 50, F.col("value")).alias(
                    "big_value"
                ),
                F.try_variant_get(
                    F.try_parse_json(F.col("props")), "$.k", "long"
                ).alias("k"),
            )
        ).alias("bag")
    )
    return bag_key_stats(bag, "bag").select(
        "key", "n_rows", "n_distinct_values"
    )


F3_SQL = """
WITH src AS (
    SELECT event_type, user_id,
           CASE WHEN value > 50 THEN value END AS big_value,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
), kv AS (
    SELECT 'event_type' AS key, event_type AS v
    FROM src WHERE event_type IS NOT NULL
    UNION ALL
    SELECT 'user_id', CAST(user_id AS VARCHAR)
    FROM src WHERE user_id IS NOT NULL
    UNION ALL
    SELECT 'big_value', CAST(big_value AS VARCHAR)
    FROM src WHERE big_value IS NOT NULL
    UNION ALL
    SELECT 'k', CAST(k AS VARCHAR) FROM src WHERE k IS NOT NULL
)
SELECT key, COUNT(*) AS n_rows, COUNT(DISTINCT v) AS n_distinct_values
FROM kv GROUP BY 1
"""


# ---------------------------------------------------------------------------
# F4 — parse-once / extract-many (the other half of the variant
# family's catalog promotion, VERDICT r7 #5): ONE try_parse_json per
# row feeding FIVE typed extractions through the module's
# ``variant_fields`` API — top-level scalars, a NESTED path ($.m.k,
# $.m.cents) and an array index ($.tags[1]) — then an exact-grain
# aggregate. This is the shape that motivates VariantType at 100 TB:
# the string path re-parses the bag once per extraction (5x the parse
# cost here); the variant path parses once (measured ~2x at 10
# extractions, operators/semistructured.py). events.props is a
# homogeneous {"k": int} bag, so the bag is derived in-plan
# (to_json(struct(...)) — null fields drop, exercising missing-path
# NULLs), and the oracle recomputes relationally from the same source
# columns — zero engine-JSON dependence (r8 form-robustness doctrine).
# Measures stay integer end to end: cents as DECIMAL(18,2)*100 -> long
# round-trips JSON exactly; counts/sums are int64.
# ---------------------------------------------------------------------------


def f4_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.semistructured import (
        variant_fields,
        with_variant_safe,
    )

    ev = load(spark, sf_dir, "events")
    k = F.try_variant_get(F.try_parse_json(F.col("props")), "$.k", "long")
    bag = ev.select(
        F.to_json(
            F.struct(
                F.col("event_type"),
                F.col("user_id"),
                F.struct(
                    k.alias("k"),
                    (F.col("value").cast("decimal(18,2)") * 100)
                    .cast("long")
                    .alias("cents"),
                ).alias("m"),
                F.array(
                    F.col("event_type"),
                    F.when(F.col("value") > 50, F.lit("big")).otherwise(
                        F.lit("small")
                    ),
                ).alias("tags"),
            )
        ).alias("bag")
    )
    extracted = variant_fields(
        with_variant_safe(bag, "bag", "__v"),
        "__v",
        {
            "ev_type": ("$.event_type", "string"),
            "uid": ("$.user_id", "long"),
            "k": ("$.m.k", "long"),
            "cents": ("$.m.cents", "long"),
            "size_tag": ("$.tags[1]", "string"),
        },
    )
    return (
        extracted.groupBy("ev_type", "size_tag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("sum_cents"),
            F.countDistinct("uid").cast("long").alias("n_users"),
            F.sum((F.col("k") >= 50).cast("long")).cast("long").alias(
                "n_high_k"
            ),
        )
    )


F4_SQL = """
WITH src AS (
    SELECT event_type AS ev_type,
           user_id AS uid,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
           CASE WHEN value > 50 THEN 'big' ELSE 'small' END AS size_tag
    FROM events
)
SELECT ev_type, size_tag,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS sum_cents,
       CAST(COUNT(DISTINCT uid) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN k >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_k
FROM src GROUP BY ev_type, size_tag
"""


# ---------------------------------------------------------------------------
# W3 — running total per key (cumulative analytic frame); W4 — lag
# deltas per key. Classic ordered-analytics; DECIMAL accumulation for
# the running sum so partial-order differences can't flip a rounding.
# ---------------------------------------------------------------------------


def w3_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        # o_orderdate is TIMESTAMP_NTZ; cast is identity under the UTC
        # session default
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("order_us"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )


W3_SQL = """
SELECT o_custkey, o_orderkey,
       epoch_us(o_orderdate) AS order_us,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate ASC, o_orderkey ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS running_total
FROM orders
"""


def w4_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    us = F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (us - F.lag(us).over(w)).alias("gap_us"),
    )


W4_SQL = """
SELECT o_custkey, o_orderkey,
       epoch_us(o_orderdate)
         - lag(epoch_us(o_orderdate))
             OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate ASC, o_orderkey ASC) AS gap_us
FROM orders
"""


# ---------------------------------------------------------------------------
# J10 — interval (range) join, grain-bucketed: per-priority launch
# windows [first order, +180 days] joined to lineitem shipdates. The
# grain equi-join is the 100 TB path (theta -> equi on day bucket);
# tests prove it equals the broadcast NLJ form.
# ---------------------------------------------------------------------------

INTERVAL_DAYS = 180


def j10_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.intervals import interval_join

    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    iv = (
        orders.groupBy("o_orderpriority")
        .agg(F.min("o_orderdate").alias("iv_start"))
        .withColumn("iv_end", F.col("iv_start") + F.expr(f"INTERVAL {INTERVAL_DAYS} DAYS"))
    )
    joined = interval_join(
        li.select("l_shipdate", F.col("l_quantity")),
        iv,
        ts_col="l_shipdate",
        use_grain=True,
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_qty"),
    )


J10_SQL = f"""
WITH iv AS (
    SELECT o_orderpriority,
           MIN(o_orderdate) AS iv_start,
           MIN(o_orderdate) + INTERVAL {INTERVAL_DAYS} DAY AS iv_end
    FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem JOIN iv
  ON l_shipdate >= iv_start AND l_shipdate <= iv_end
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# T2 — deterministic hash split (train/val): md5-mod assignment, the
# standard reproducible held-out split for training corpora. Same
# ascii-arithmetic hex decode as the LSH oracles, so fully checkable.
# ---------------------------------------------------------------------------

TRAIN_PCT = 90


def t2_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        % 100
    )
    return docs.select(
        "doc_id",
        "lang",
        F.when(bucket < TRAIN_PCT, F.lit("train")).otherwise(F.lit("val")).alias(
            "split"
        ),
    )


def _t2_sql() -> str:
    digit = (
        "(CASE WHEN ascii(substr(h, {i}, 1)) < 58"
        " THEN ascii(substr(h, {i}, 1)) - 48"
        " ELSE ascii(substr(h, {i}, 1)) - 87 END)"
    )
    expr = digit.format(i=1)
    for t in range(1, 4):
        expr = f"({expr} * 16 + {digit.format(i=1 + t)})"
    return f"""
WITH hashed AS (
    SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents
)
SELECT doc_id, lang,
       CASE WHEN {expr} % 100 < {TRAIN_PCT} THEN 'train' ELSE 'val' END AS split
FROM hashed
"""


T2_SQL = _t2_sql()


# ---------------------------------------------------------------------------
# W5 — rank-family analytics: ntile quartiles, percent_rank, cume_dist
# over a fully-determined order (balance, custkey). percent_rank and
# cume_dist are integer ratios — exact IEEE in both engines, no rounding.
# ---------------------------------------------------------------------------


def w5_balance_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT Window.orderBy() (an unpartitioned window funnels the whole
    # table through one task): distributed global row numbers via
    # range-partition + per-partition rank + broadcast offsets, then
    # ntile/percent_rank/cume_dist derived arithmetically — exact
    # integer ratios, bit-identical to the oracle's native window
    # functions because (c_acctbal, c_custkey) is a total order.
    from big_data_flight_analytics_spark.operators.ranks import (
        global_row_numbers,
        ntile_from_rn,
    )

    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    ranked = global_row_numbers(cust, ["c_acctbal", "c_custkey"], out_col="__rn")
    n_total = cust.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    rn, n = F.col("__rn"), F.col("__n")
    return ranked.crossJoin(F.broadcast(n_total)).select(
        "c_custkey",
        "c_acctbal",
        ntile_from_rn(rn, n, 4).alias("quartile"),
        # percent_rank of a single-row input is 0.0, not 0/0=NULL
        F.when(n == 1, F.lit(0.0))
        .otherwise((rn - 1) / (n - 1))
        .alias("pct_rank"),
        (rn / n).alias("cume"),
    )


W5_SQL = """
SELECT c_custkey, c_acctbal,
       CAST(ntile(4) OVER w AS INTEGER) AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume
FROM customer
WINDOW w AS (ORDER BY c_acctbal ASC, c_custkey ASC)
"""


# ---------------------------------------------------------------------------
# C1 — CUBE over (returnflag, linestatus), Expand-free: aggregate the
# finest grouping once, derive all four grouping sets by re-aggregating
# the tiny result (see a8_rollup_revenue for the rationale).
# ---------------------------------------------------------------------------


def c1_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    fine = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(revenue).alias("__rev"),
    )

    def level(keys: list[str], gid: int) -> DataFrame:
        agged = (
            fine.groupBy(*keys).agg(
                F.sum("__n").alias("__n"), F.sum("__rev").alias("__rev")
            )
            if keys
            # grand total on an EMPTY fact: SUM of no rows is NULL but
            # the engines' CUBE/ROLLUP/GROUPING SETS () set emits
            # COUNT(*)=0 — coalesce the count (revenue stays NULL, the
            # SUM-over-empty contract both engines share)
            else fine.groupBy().agg(
                F.coalesce(F.sum("__n"), F.lit(0)).alias("__n"),
                F.sum("__rev").alias("__rev"),
            )
        )
        cols = []
        for c in ("l_returnflag", "l_linestatus"):
            cols.append(
                F.col(c) if c in keys else F.lit(None).cast("string").alias(c)
            )
        return agged.select(
            *cols, F.lit(gid).cast("long").alias("gid"), "__n", "__rev"
        )

    cube = (
        level(["l_returnflag", "l_linestatus"], 0)
        .unionByName(level(["l_returnflag"], 1))
        .unionByName(level(["l_linestatus"], 2))
        .unionByName(level([], 3))
    )
    return cube.select(
        "l_returnflag",
        "l_linestatus",
        "gid",
        F.col("__n").alias("n_items"),
        F.col("__rev").cast("double").alias("revenue"),
    )


C1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
"""


# ---------------------------------------------------------------------------
# C2 — ROLLUP revenue (c1's hierarchical sibling): subtotals along ONE
# drill path (returnflag -> linestatus -> derived ship year) instead
# of the cube's full lattice — the report shape financial/hierarchy
# rollups actually use (4 levels, not 2^3 groupings). Ship year stands
# in for the classic shipmode drill level (the synthetic lineitem
# carries no shipmode), rendered as a string identically by both
# engines. Same single-scan plan
# doctrine as c1: one fine-grain partial aggregate, each coarser level
# re-aggregated from it (DECIMAL sums, order-independent), never a
# second pass over the fact table.
# ---------------------------------------------------------------------------


def c2_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.cache import tracked_persist

    li = load(spark, sf_dir, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate").cast("string")
    )
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    hierarchy = ["l_returnflag", "l_linestatus", "ship_year"]
    # four levels re-read the fine frame: pin it (it is O(groups))
    fine = tracked_persist(
        li.groupBy(*hierarchy).agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(revenue).alias("__rev"),
        )
    )

    def level(depth: int) -> DataFrame:
        keys = hierarchy[:depth]
        agged = (
            fine.groupBy(*keys).agg(
                F.sum("__n").alias("__n"), F.sum("__rev").alias("__rev")
            )
            if keys
            # grand total on an EMPTY fact: SUM of no rows is NULL but
            # the engines' CUBE/ROLLUP/GROUPING SETS () set emits
            # COUNT(*)=0 — coalesce the count (revenue stays NULL, the
            # SUM-over-empty contract both engines share)
            else fine.groupBy().agg(
                F.coalesce(F.sum("__n"), F.lit(0)).alias("__n"),
                F.sum("__rev").alias("__rev"),
            )
        )
        # GROUPING bitmask: grouped-away columns (the hierarchy tail)
        # set their bit, leftmost column = MSB — ROLLUP emits gids
        # 0, 1, 3, 7 for depths 3, 2, 1, 0
        gid = (1 << (len(hierarchy) - depth)) - 1
        cols = [
            F.col(c) if c in keys else F.lit(None).cast("string").alias(c)
            for c in hierarchy
        ]
        return agged.select(
            *cols, F.lit(gid).cast("long").alias("gid"), "__n", "__rev"
        )

    rolled = (
        level(3)
        .unionByName(level(2))
        .unionByName(level(1))
        .unionByName(level(0))
    )
    return rolled.select(
        *hierarchy,
        "gid",
        F.col("__n").alias("n_items"),
        F.col("__rev").cast("double").alias("revenue"),
    )


C2_SQL = """
WITH li AS (
    SELECT l_returnflag, l_linestatus,
           CAST(YEAR(l_shipdate) AS VARCHAR) AS ship_year,
           l_extendedprice, l_discount
    FROM lineitem
)
SELECT l_returnflag, l_linestatus, ship_year,
       CAST(GROUPING(l_returnflag, l_linestatus, ship_year) AS BIGINT)
           AS gid,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue
FROM li
GROUP BY ROLLUP(l_returnflag, l_linestatus, ship_year)
"""


# ---------------------------------------------------------------------------
# C3 — GROUPING SETS revenue: the third and fully-general sibling of
# c1 (CUBE = every subset) and c2 (ROLLUP = one drill path). Arbitrary
# report sets — per-(returnflag, year), per-(linestatus, year),
# per-year, grand total — the two cross-axis yearly breakdowns a
# finance report actually juxtaposes, with NO interest in the lattice
# between them. Distinct from a9_grouping_sets, which exercises
# Spark's NATIVE groupingSets API (Expand-based physical plan: the
# fact rows are replicated once per set) over two flat sets; c3 is
# the Expand-FREE face: one fine-grain partial
# aggregate over the union of all grouping columns, each requested
# set re-aggregated from the O(groups) frame (DECIMAL sums,
# order-independent); the fact table is scanned exactly once.
# GROUPING bitmask per set matches the engines' GROUPING() contract
# (bit set = column grouped away, leftmost = MSB).
# ---------------------------------------------------------------------------


def c3_grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.cache import tracked_persist

    li = load(spark, sf_dir, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate").cast("string")
    )
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    all_cols = ["l_returnflag", "l_linestatus", "ship_year"]
    fine = tracked_persist(
        li.groupBy(*all_cols).agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(revenue).alias("__rev"),
        )
    )
    sets = [
        ["l_returnflag", "ship_year"],
        ["l_linestatus", "ship_year"],
        ["ship_year"],
        [],
    ]

    def one_set(keys: list[str]) -> DataFrame:
        agged = (
            fine.groupBy(*keys).agg(
                F.sum("__n").alias("__n"), F.sum("__rev").alias("__rev")
            )
            if keys
            # grand total on an EMPTY fact: SUM of no rows is NULL but
            # the engines' CUBE/ROLLUP/GROUPING SETS () set emits
            # COUNT(*)=0 — coalesce the count (revenue stays NULL, the
            # SUM-over-empty contract both engines share)
            else fine.groupBy().agg(
                F.coalesce(F.sum("__n"), F.lit(0)).alias("__n"),
                F.sum("__rev").alias("__rev"),
            )
        )
        gid = sum(
            1 << (len(all_cols) - 1 - i)
            for i, c in enumerate(all_cols)
            if c not in keys
        )
        cols = [
            F.col(c) if c in keys else F.lit(None).cast("string").alias(c)
            for c in all_cols
        ]
        return agged.select(
            *cols, F.lit(gid).cast("long").alias("gid"), "__n", "__rev"
        )

    out = one_set(sets[0])
    for s in sets[1:]:
        out = out.unionByName(one_set(s))
    return out.select(
        *all_cols,
        "gid",
        F.col("__n").alias("n_items"),
        F.col("__rev").cast("double").alias("revenue"),
    )


C3_SQL = """
WITH li AS (
    SELECT l_returnflag, l_linestatus,
           CAST(YEAR(l_shipdate) AS VARCHAR) AS ship_year,
           l_extendedprice, l_discount
    FROM lineitem
)
SELECT l_returnflag, l_linestatus, ship_year,
       CAST(GROUPING(l_returnflag, l_linestatus, ship_year) AS BIGINT)
           AS gid,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue
FROM li
GROUP BY GROUPING SETS (
    (l_returnflag, ship_year),
    (l_linestatus, ship_year),
    (ship_year),
    ()
)
"""


# ---------------------------------------------------------------------------
# P1 — table profiling: per-column null/distinct/min/max stats in one
# scan + one shuffle (unpivot + hash agg), not a job per column.
# ---------------------------------------------------------------------------


def p1_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.profile import profile

    return profile(load(spark, sf_dir, "orders"))


def _p1_sql() -> str:
    canon = {
        "o_orderkey": "CAST(o_orderkey AS VARCHAR)",
        "o_custkey": "CAST(o_custkey AS VARCHAR)",
        "o_orderstatus": "o_orderstatus",
        "o_totalprice": "CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)",
        "o_orderdate": "CAST(epoch_us(o_orderdate) AS VARCHAR)",
        "o_orderpriority": "o_orderpriority",
    }
    branches = [
        f"""
SELECT '{name}' AS col_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct,
       MIN(v) AS min_val,
       MAX(v) AS max_val
FROM (SELECT {expr} AS v FROM orders)"""
        for name, expr in canon.items()
    ]
    return "\nUNION ALL\n".join(branches)


P1_SQL = _p1_sql()


# ---------------------------------------------------------------------------
# Q10 — TPC-H Q5-shaped 6-way star join: revenue per nation for one
# region and one order-date year. The fact table joins three broadcast
# dims plus orders; Catalyst reorders and broadcasts (verified: all dim
# joins are BroadcastHashJoin, orders filter pushed to the scan).
# ---------------------------------------------------------------------------

Q10_REGION = "ASIA"
Q10_YEAR = 1996


def q10_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        li.join(
            orders.filter(F.year("o_orderdate") == Q10_YEAR),
            li["l_orderkey"] == orders["o_orderkey"],
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == Q10_REGION)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(revenue).cast("double").alias("revenue"),
        )
    )


Q10_SQL = f"""
SELECT n_name,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey AND year(o_orderdate) = {Q10_YEAR}
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey AND r_name = '{Q10_REGION}'
GROUP BY n_name
"""


# ---------------------------------------------------------------------------
# H1 — SCD Type-2 merge: version the customer segment dimension with
# each customer's latest order priority as the incoming update. Changed
# keys close their open version and append a new one; history rows and
# unchanged keys pass through.
# ---------------------------------------------------------------------------


def h1_scd2_customer_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.scd import (
        latest_updates,
        scd2_merge,
    )

    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    current = cust.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit(0).cast("long").alias("valid_from_us"),
        F.lit(None).cast("long").alias("valid_to_us"),
        F.lit(True).alias("is_current"),
    )
    upd = latest_updates(
        orders.select(
            F.col("o_custkey").alias("c_custkey"),
            F.col("o_orderpriority").alias("segment"),
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("ts"),
            "o_orderkey",
        ),
        key="c_custkey",
        ts_col="ts",
        tie_col="o_orderkey",
    )
    return scd2_merge(
        current, upd, key="c_custkey", attr="segment", update_ts_us="ts"
    )


H1_SQL = """
WITH cur AS (
    SELECT c_custkey, c_mktsegment AS segment,
           CAST(0 AS BIGINT) AS valid_from_us,
           CAST(NULL AS BIGINT) AS valid_to_us,
           TRUE AS is_current
    FROM customer
), upd AS (
    SELECT c_custkey, new_attr, ts FROM (
        SELECT o_custkey AS c_custkey,
               o_orderpriority AS new_attr,
               epoch_us(o_orderdate) AS ts,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey DESC)
                   AS rn
        FROM orders
    ) WHERE rn = 1
), j AS (
    SELECT cur.c_custkey, cur.segment, cur.valid_from_us, cur.valid_to_us,
           cur.is_current, upd.new_attr, upd.ts,
           COALESCE(upd.new_attr IS NOT NULL
                    AND upd.new_attr <> cur.segment
                    AND upd.ts > cur.valid_from_us, FALSE) AS chg
    FROM cur LEFT JOIN upd USING (c_custkey)
)
SELECT c_custkey, segment, valid_from_us, valid_to_us, is_current
FROM j WHERE NOT chg
UNION ALL
SELECT c_custkey, segment, valid_from_us, ts AS valid_to_us,
       FALSE AS is_current
FROM j WHERE chg
UNION ALL
SELECT c_custkey, new_attr AS segment, ts AS valid_from_us,
       CAST(NULL AS BIGINT) AS valid_to_us, TRUE AS is_current
FROM j WHERE chg
"""


# ---------------------------------------------------------------------------
# H3 — POINT-IN-TIME join against the SCD2 dimension: every order
# attached to the segment version valid AT ITS ORDER DATE
# (valid_from <= ts < valid_to, open version = NULL to), aggregated to
# orders/revenue per as-of segment — the "what did the dimension say
# when the fact happened" lookup that is the entire point of keeping
# SCD2 history (h1 builds it; this consumes it). Physical shape: an
# EQUI-join on the customer key with the interval predicate as a
# post-join filter — versions per key are bounded (SCD2 history
# depth), so the equi-join fans out O(versions) and the filter keeps
# exactly one row per fact; no range-join blowup, and the fact side
# shuffles once on the key it already carries. (For deep-history
# dimensions the union-window as-of of j9 is the alternative shape —
# same machinery, one window instead of the fan-out.)
# ---------------------------------------------------------------------------


def h3_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.cache import tracked_persist

    dim = tracked_persist(h1_scd2_customer_segment(spark, sf_dir))
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
            "__ts"
        ),
        F.col("o_totalprice"),
    )
    pit = orders.join(dim, "c_custkey").filter(
        (F.col("valid_from_us") <= F.col("__ts"))
        & (
            F.col("valid_to_us").isNull()
            | (F.col("__ts") < F.col("valid_to_us"))
        )
    )
    return pit.groupBy(F.col("segment").alias("asof_segment")).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2
        )
        .cast("double")
        .alias("revenue"),
    )


H3_SQL = f"""
WITH scd AS (
{H1_SQL}
), facts AS (
    SELECT o_custkey AS c_custkey, epoch_us(o_orderdate) AS ts,
           o_totalprice
    FROM orders
)
SELECT d.segment AS asof_segment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(ROUND(SUM(CAST(f.o_totalprice AS DECIMAL(18,2))), 2)
            AS DOUBLE) AS revenue
FROM facts f JOIN scd d USING (c_custkey)
WHERE d.valid_from_us <= f.ts
  AND (d.valid_to_us IS NULL OR f.ts < d.valid_to_us)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# W6 — RANGE-framed window: 7-day trailing revenue per customer. The
# frame is value-based (epoch seconds), not row-based — a different
# window machinery than W3's ROWS frame.
# ---------------------------------------------------------------------------

TRAILING_S = 7 * 24 * 3600


def w6_trailing_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load(spark, sf_dir, "orders")
    sec = F.unix_micros(F.col("o_orderdate").cast("timestamp")) / 1_000_000
    with_sec = orders.withColumn("__sec", sec.cast("long"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("__sec").asc())
        .rangeBetween(-TRAILING_S, 0)
    )
    return with_sec.select(
        "o_custkey",
        "o_orderkey",
        F.col("__sec").alias("order_s"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("trailing_7d_revenue"),
    )


W6_SQL = f"""
WITH o AS (
    SELECT o_custkey, o_orderkey,
           CAST(epoch_us(o_orderdate) // 1000000 AS BIGINT) AS order_s,
           o_totalprice
    FROM orders
)
SELECT o_custkey, o_orderkey, order_s,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY order_s ASC
                      RANGE BETWEEN {TRAILING_S} PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS trailing_7d_revenue
FROM o
"""


# ---------------------------------------------------------------------------
# U1 — set operators: INTERSECT / EXCEPT with SQL set semantics
# (distinct). Customers holding both an urgent and a low-priority
# order, and those urgent-only.
# ---------------------------------------------------------------------------


def u1_priority_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    low = orders.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    both = urgent.intersect(low).select(
        "o_custkey", F.lit("both").alias("bucket")
    )
    # subtract == SQL EXCEPT (distinct set semantics)
    urgent_only = urgent.subtract(low).select(
        "o_custkey", F.lit("urgent_only").alias("bucket")
    )
    return both.unionByName(urgent_only)


U1_SQL = """
SELECT o_custkey, 'both' AS bucket FROM (
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
)
UNION ALL
SELECT o_custkey, 'urgent_only' AS bucket FROM (
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
)
"""


# ---------------------------------------------------------------------------
# B1 — ordered event funnel: signup -> view -> purchase, each step
# strictly after the user's previous-step timestamp. One user-keyed
# aggregation per step; event-type filters push to the scan.
# ---------------------------------------------------------------------------

B1_STEPS = ("signup", "view", "purchase")


def b1_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.behavior import (
        ordered_funnel,
    )

    events = load(spark, sf_dir, "events")
    return ordered_funnel(events, B1_STEPS)


B1_SQL = f"""
WITH s1 AS (
    SELECT user_id, MIN(ts) AS t FROM events
    WHERE event_type = '{B1_STEPS[0]}' GROUP BY user_id
), s2 AS (
    SELECT e.user_id, MIN(e.ts) AS t
    FROM events e JOIN s1 USING (user_id)
    WHERE e.event_type = '{B1_STEPS[1]}' AND e.ts > s1.t
    GROUP BY e.user_id
), s3 AS (
    SELECT e.user_id, MIN(e.ts) AS t
    FROM events e JOIN s2 USING (user_id)
    WHERE e.event_type = '{B1_STEPS[2]}' AND e.ts > s2.t
    GROUP BY e.user_id
)
SELECT CAST(1 AS INTEGER) AS step_idx, '{B1_STEPS[0]}' AS step,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n_users
UNION ALL
SELECT CAST(2 AS INTEGER), '{B1_STEPS[1]}',
       (SELECT CAST(COUNT(*) AS BIGINT) FROM s2)
UNION ALL
SELECT CAST(3 AS INTEGER), '{B1_STEPS[2]}',
       (SELECT CAST(COUNT(*) AS BIGINT) FROM s3)
"""


# ---------------------------------------------------------------------------
# B2 — weekly cohort retention: users cohorted by first active day,
# retained-at-offset-w = active on any day in [first+7w, first+7w+7).
# Calendar-agnostic (no week-start convention to drift cross-engine).
# ---------------------------------------------------------------------------


def b2_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.behavior import (
        weekly_retention,
    )

    events = load(spark, sf_dir, "events")
    return weekly_retention(events)


B2_SQL = """
WITH first_day AS (
    SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
    FROM events GROUP BY user_id
), active AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
)
SELECT cohort_day,
       CAST(date_diff('day', cohort_day, day) // 7 AS BIGINT) AS week_offset,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM active JOIN first_day USING (user_id)
GROUP BY cohort_day, week_offset
"""


# ---------------------------------------------------------------------------
# B3 — first-order event transition matrix: consecutive-event pairs
# per user (ts order, event_id tie-break), counted over all users.
# One user-partitioned lead window, one small-key aggregation.
# ---------------------------------------------------------------------------


def b3_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.behavior import (
        event_transitions,
    )

    events = load(spark, sf_dir, "events")
    return event_transitions(events)


B3_SQL = """
WITH seq AS (
    SELECT event_type AS from_type,
           LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
           ) AS to_type
    FROM events
)
SELECT from_type, to_type,
       CAST(COUNT(*) AS BIGINT) AS n_transitions
FROM seq WHERE to_type IS NOT NULL
GROUP BY from_type, to_type
"""


# ---------------------------------------------------------------------------
# A9 — GROUPING SETS that are neither a rollup nor a cube: revenue by
# priority and, independently, by status — two one-dimensional
# aggregates in one pass over orders (Spark expands the grouping sets
# map-side; a rollup/cube cannot express this pair).
# ---------------------------------------------------------------------------


def a9_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderpriority"], ["o_orderstatus"]],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .select("o_orderpriority", "o_orderstatus", "n_orders", "revenue")
    )


A9_SQL = """
SELECT o_orderpriority, o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
"""


# ---------------------------------------------------------------------------
# S6 — first-touch per (user, event type): the batch mirror of the
# streaming first-seen dedup (streaming/stateful.first_seen_dedup) —
# same earliest-occurrence-wins semantics, same (ts, id) tie-break, as
# one partitioned row_number. Serving shape for first-touch
# attribution tables.
# ---------------------------------------------------------------------------


def s6_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        events.select(
            "user_id",
            "event_type",
            F.col("ts").alias("first_ts"),
            F.col("event_id").alias("first_event_id"),
            F.row_number().over(w).alias("__rn"),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


S6_SQL = """
SELECT user_id, event_type, first_ts, first_event_id FROM (
    SELECT user_id, event_type,
           ts AS first_ts,
           event_id AS first_event_id,
           ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                              ORDER BY ts ASC, event_id ASC) AS rn
    FROM events
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# TS1 — gap-fill / LOCF resample: each user's event `value` series
# regularized onto a fixed 6-hour grid, empty buckets carrying the
# last observation forward — the hypertable resample op. LOCF copies
# exact doubles (no arithmetic), so the oracle hashes bit-exact.
# ---------------------------------------------------------------------------

TS1_STEP_S = 6 * 3600


def ts1_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.temporal import gap_fill

    events = load(spark, sf_dir, "events")
    return gap_fill(events, step_s=TS1_STEP_S)


TS1_SQL = f"""
WITH obs AS (
    SELECT user_id,
           CAST(FLOOR(epoch_us(ts) / ({TS1_STEP_S} * 1000000.0)) AS BIGINT)
               AS bucket,
           value,
           ROW_NUMBER() OVER (
               PARTITION BY user_id,
                   CAST(FLOOR(epoch_us(ts) / ({TS1_STEP_S} * 1000000.0))
                        AS BIGINT)
               ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
), per AS (
    SELECT user_id, bucket, value FROM obs WHERE rn = 1
), bounds AS (
    SELECT user_id, MIN(bucket) AS mn, MAX(bucket) AS mx
    FROM per GROUP BY user_id
), grid AS (
    SELECT user_id, unnest(range(mn, mx + 1)) AS bucket FROM bounds
)
SELECT g.user_id,
       g.bucket * {TS1_STEP_S} AS bucket_start_s,
       last_value(p.value IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
       p.value IS NOT NULL AS is_observed
FROM grid g LEFT JOIN per p USING (user_id, bucket)
"""


# ---------------------------------------------------------------------------
# TS2 — linear-interpolation gap fill: same grid as TS1, empty buckets
# interpolate between the surrounding observations. The interpolation
# expression keeps one fixed association (prev + (next-prev) * frac,
# rounded 6dp) mirrored in the oracle so doubles hash bit-exact.
# ---------------------------------------------------------------------------


def ts2_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.temporal import gap_fill

    events = load(spark, sf_dir, "events")
    return gap_fill(events, step_s=TS1_STEP_S, method="linear")


TS2_SQL = f"""
WITH obs AS (
    SELECT user_id,
           CAST(FLOOR(epoch_us(ts) / ({TS1_STEP_S} * 1000000.0)) AS BIGINT)
               AS bucket,
           value,
           ROW_NUMBER() OVER (
               PARTITION BY user_id,
                   CAST(FLOOR(epoch_us(ts) / ({TS1_STEP_S} * 1000000.0))
                        AS BIGINT)
               ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
), per AS (
    SELECT user_id, bucket, value FROM obs WHERE rn = 1
), bounds AS (
    SELECT user_id, MIN(bucket) AS mn, MAX(bucket) AS mx
    FROM per GROUP BY user_id
), grid AS (
    SELECT user_id, unnest(range(mn, mx + 1)) AS bucket FROM bounds
), joined AS (
    SELECT g.user_id, g.bucket, p.value AS v
    FROM grid g LEFT JOIN per p USING (user_id, bucket)
), ctx AS (
    SELECT user_id, bucket, v,
           last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
           last_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY bucket
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb,
           first_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY bucket
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
           first_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY bucket
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
    FROM joined
)
SELECT user_id,
       bucket * {TS1_STEP_S} AS bucket_start_s,
       CASE WHEN v IS NOT NULL THEN v
            ELSE ROUND(pv + (nv - pv) * ((bucket - pb) / (nb - pb)), 6)
       END AS value,
       v IS NOT NULL AS is_observed
FROM ctx
"""


# ---------------------------------------------------------------------------
# TS3 — trailing-window z-score anomalies: each order scored against
# its customer's previous 5 orders; |z| > 2 flags the spike/crash
# rows. The operator demands an exact integer value grain (cents via
# floor(x*100 + 0.5) — identical double arithmetic in both engines),
# which keeps every frame aggregate exact int64 and the z expression a
# single deterministic IEEE cast/sqrt/divide chain. One shuffle on the
# customer key; O(window) state per row.
# ---------------------------------------------------------------------------


def ts3_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.temporal import rolling_zscore

    orders = load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("__cents"),
    )
    scored = rolling_zscore(
        orders,
        key="o_custkey",
        order=["o_orderdate", "o_orderkey"],
        int_value_col="__cents",
        window=5,
        min_periods=3,
    )
    return scored.filter(F.abs(F.col("zscore")) > 2).select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_totalprice").alias("totalprice"),
        "zscore",
    )


TS3_SQL = """
WITH c AS (
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
    FROM orders
), w AS (
    SELECT o_custkey, o_orderkey, o_totalprice, cents,
           COUNT(cents) OVER f AS n,
           SUM(cents) OVER f AS s,
           SUM(cents * cents) OVER f AS ss
    FROM c
    WINDOW f AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING)
), z AS (
    SELECT o_custkey, o_orderkey, o_totalprice,
           CASE WHEN n >= 3 AND n * ss - s * s > 0
                THEN ROUND(CAST(cents * n - s AS DOUBLE)
                           / sqrt(CAST(n * ss - s * s AS DOUBLE)), 6)
           END AS zscore
    FROM w
)
SELECT o_custkey AS custkey,
       o_orderkey AS orderkey,
       o_totalprice AS totalprice,
       zscore
FROM z
WHERE ABS(zscore) > 2
"""


# ---------------------------------------------------------------------------
# S7 — per-window top-k leaderboard: the BATCH form of
# streaming.windowed_counts.windowed_topk_query (identical
# windowed_key_counts + rank_topk code runs on the stream; the
# streaming differential is tests/test_streaming_topk.py — this entry
# puts the same semantics under the oracle gate).
# ---------------------------------------------------------------------------


def s7_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.streaming.windowed_counts import (
        rank_topk,
        windowed_key_counts,
    )

    events = load(spark, sf_dir, "events").select(
        F.col("ts").alias("event_time"), "event_type"
    )
    counts = windowed_key_counts(
        events, "event_type", window="1 minute", watermark="0 seconds"
    )
    return rank_topk(counts, k=3, key_col="event_type")


S7_SQL = """
WITH counts AS (
    SELECT (epoch_us(ts) // 60000000) * 60 AS window_start_epoch,
           event_type,
           COUNT(*) AS n_events
    FROM events GROUP BY 1, 2
)
SELECT window_start_epoch, event_type, n_events,
       CAST(ROW_NUMBER() OVER (PARTITION BY window_start_epoch
                               ORDER BY n_events DESC, event_type ASC)
            AS INTEGER) AS rank
FROM counts
QUALIFY rank <= 3
"""


# ---------------------------------------------------------------------------
# B5 — conversion-latency histogram: per user, seconds from FIRST
# 'click' to the first 'purchase' AFTER it, bucketed into hour bands.
# One user-hash Exchange serves both first-touch windows (the funnel
# pattern); micros arithmetic is exact integer end-to-end.
# ---------------------------------------------------------------------------

B5_BUCKET_S = 6 * 3600


def b5_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load(spark, sf_dir, "events")
    ev = events.select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
    )
    by_user = Window.partitionBy("user_id")
    first_click = F.min(
        F.when(F.col("event_type") == "click", F.col("us"))
    ).over(by_user)
    per_user = ev.withColumn("__click_us", first_click)
    first_purchase_after = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("us") > F.col("__click_us")),
            F.col("us"),
        )
    ).over(by_user)
    lat = (
        per_user.withColumn("__purchase_us", first_purchase_after)
        .groupBy("user_id")
        .agg(
            F.first("__click_us").alias("__c"),
            F.first("__purchase_us").alias("__p"),
        )
        .filter(F.col("__c").isNotNull() & F.col("__p").isNotNull())
        .select(
            # integer `div`, not float `/`: exact at any magnitude
            F.expr("(__p - __c) div 1000000").alias("latency_s")
        )
    )
    return (
        lat.groupBy(
            (F.col("latency_s") - F.col("latency_s") % B5_BUCKET_S).alias(
                "bucket_start_s"
            )
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


B5_SQL = f"""
WITH ev AS (
    SELECT user_id, event_type, epoch_us(ts) AS us FROM events
), firsts AS (
    SELECT user_id,
           MIN(CASE WHEN event_type = 'click' THEN us END) AS c
    FROM ev GROUP BY 1
), pairs AS (
    SELECT f.user_id, f.c,
           MIN(CASE WHEN e.event_type = 'purchase' AND e.us > f.c
                    THEN e.us END) AS p
    FROM firsts f JOIN ev e USING (user_id)
    GROUP BY 1, 2
), lat AS (
    SELECT CAST((p - c) // 1000000 AS BIGINT) AS latency_s
    FROM pairs WHERE c IS NOT NULL AND p IS NOT NULL
)
SELECT latency_s - latency_s % {B5_BUCKET_S} AS bucket_start_s,
       COUNT(*) AS n_users
FROM lat GROUP BY 1
"""


# ---------------------------------------------------------------------------
# A10 — correlation from sufficient statistics: per-brand
# corr(quantity, price) computed from exact integer/decimal sums
# (n, Sx, Sy, Sxy, Sxx, Syy) rather than the engine's corr() — the
# accumulation is order-independent (exact decimal), each SUM casts to
# double deterministically, and the final Pearson formula is one fixed
# IEEE chain, so the result is bit-identical cross-engine where a
# native corr() would drift in the last ulp. The sufficient-statistic
# form is also what makes the measure ALGEBRAIC — partials merge, the
# i1/i2 incremental-maintenance contract.
# ---------------------------------------------------------------------------


def a10_brand_price_qty_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("__q"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("__c"),
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    sums = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(dec(F.col("__q"))).alias("__sx"),
            F.sum(dec(F.col("__c"))).alias("__sy"),
            F.sum(dec(F.col("__q") * F.col("__c"))).alias("__sxy"),
            F.sum(dec(F.col("__q") * F.col("__q"))).alias("__sxx"),
            F.sum(dec(F.col("__c") * F.col("__c"))).alias("__syy"),
        )
    )
    n = F.col("n_items").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sxy = F.col("__sxy").cast("double")
    sxx = F.col("__sxx").cast("double")
    syy = F.col("__syy").cast("double")
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    # zero-variance groups (single row / constant measure) have no
    # defined correlation: NULL in BOTH engines, never NULL-vs-NaN
    defined = (n * sxx - sx * sx > 0) & (n * syy - sy * sy > 0)
    return sums.select(
        "p_brand",
        "n_items",
        F.when(defined, F.round(corr, 6)).alias("qty_price_corr"),
    )


A10_SQL = """
WITH facts AS (
    SELECT l_partkey,
           CAST(l_quantity AS BIGINT) AS q,
           CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
    FROM lineitem
), sums AS (
    SELECT p_brand,
           COUNT(*) AS n_items,
           SUM(CAST(q AS HUGEINT)) AS sx,
           SUM(CAST(c AS HUGEINT)) AS sy,
           SUM(CAST(q * c AS HUGEINT)) AS sxy,
           SUM(CAST(q * q AS HUGEINT)) AS sxx,
           SUM(CAST(c * c AS HUGEINT)) AS syy
    FROM facts JOIN part ON p_partkey = l_partkey
    GROUP BY 1
)
SELECT p_brand,
       CAST(n_items AS BIGINT) AS n_items,
       CASE WHEN CAST(n_items AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
             AND CAST(n_items AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
       THEN ROUND(
           (CAST(n_items AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (sqrt(CAST(n_items AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * sqrt(CAST(n_items AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
       END AS qty_price_corr
FROM sums
"""


# ---------------------------------------------------------------------------
# H2 — CDC MERGE snapshot: a deterministic insert/update/delete
# changeset (synthesized from orders: deletes every 17th orderkey,
# inserts for shifted keys, updates otherwise; last writer per key by
# (o_orderdate, o_orderkey)) folded into the customer snapshot. The
# oracle restates MERGE semantics directly: anti-join passthrough UNION
# surviving last-writer rows. One changeset shuffle + one key join —
# the batch mirror of the streaming upsert sink.
# ---------------------------------------------------------------------------


def h2_cdc_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.scd import apply_changes

    base = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    changes = orders.select(
        F.when(F.col("o_custkey") % 50 == 0, F.col("o_custkey") + 1000000)
        .otherwise(F.col("o_custkey"))
        .alias("c_custkey"),
        F.when(F.col("o_orderkey") % 17 == 0, F.lit("D"))
        .when(F.col("o_custkey") % 3 == 0, F.lit("I"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.concat(F.lit("cdc#"), F.col("o_orderkey").cast("string")).alias(
            "c_name"
        ),
        (F.col("o_orderkey") % 25).cast("int").alias("c_nationkey"),
        F.col("o_totalprice").alias("c_acctbal"),
        F.col("o_orderpriority").alias("c_mktsegment"),
        "o_orderdate",
        "o_orderkey",
    )
    return apply_changes(
        base,
        changes,
        key="c_custkey",
        seq=["o_orderdate", "o_orderkey"],
        payload=["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    )


H2_SQL = """
WITH changes AS (
    SELECT CASE WHEN o_custkey % 50 = 0 THEN o_custkey + 1000000
                ELSE o_custkey END AS c_custkey,
           CASE WHEN o_orderkey % 17 = 0 THEN 'D'
                WHEN o_custkey % 3 = 0 THEN 'I'
                ELSE 'U' END AS op,
           concat('cdc#', CAST(o_orderkey AS VARCHAR)) AS c_name,
           CAST(o_orderkey % 25 AS INTEGER) AS c_nationkey,
           o_totalprice AS c_acctbal,
           o_orderpriority AS c_mktsegment,
           o_orderdate, o_orderkey
    FROM orders
), last AS (
    SELECT * FROM (
        SELECT c.*,
               ROW_NUMBER() OVER (PARTITION BY c_custkey
                                  ORDER BY o_orderdate DESC,
                                           o_orderkey DESC) AS rn
        FROM changes c
    ) WHERE rn = 1
)
SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM last)
UNION ALL
SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
FROM last WHERE op <> 'D'
"""


# ---------------------------------------------------------------------------
# B4 — first-k ordered path tally: each user's first-5 event-type
# journey prefix counted across the population. One Exchange serves
# both the ranking window and the per-user collapse (same user-hash
# partitioning); the path tally shuffles one row per user.
# ---------------------------------------------------------------------------


def b4_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.behavior import top_paths

    return top_paths(load(spark, sf_dir, "events"), k_steps=5)


B4_SQL = """
WITH ranked AS (
    SELECT user_id, ts, event_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts ASC, event_id ASC) AS rn
    FROM events
), paths AS (
    SELECT user_id,
           string_agg(event_type, '>' ORDER BY ts ASC, event_id ASC) AS path
    FROM ranked WHERE rn <= 5 GROUP BY user_id
)
SELECT path, COUNT(*) AS n_users FROM paths GROUP BY 1
"""


ANALYTIC_QUERIES = {
    "j9_asof_events_orders": j9_asof_events_orders,
    "j14_asof_tolerance": j14_asof_tolerance,
    "ts3_rolling_zscore": ts3_rolling_zscore,
    "b4_top_paths": b4_top_paths,
    "h2_cdc_snapshot": h2_cdc_snapshot,
    "a10_brand_price_qty_corr": a10_brand_price_qty_corr,
    "b5_conversion_latency": b5_conversion_latency,
    "s7_windowed_topk": s7_windowed_topk,
    "s4_user_sessions": s4_user_sessions,
    "s5_session_windows": s5_session_windows,
    "a8_rollup_revenue": a8_rollup_revenue,
    "r4_pivot_order_status": r4_pivot_order_status,
    "v3_ivf_topk": v3_ivf_topk,
    "f2_props_json": f2_props_json,
    "f3_bag_key_stats": f3_bag_key_stats,
    "f4_variant_extract": f4_variant_extract,
    "w3_running_revenue": w3_running_revenue,
    "w4_order_gaps": w4_order_gaps,
    "j10_interval_join": j10_interval_join,
    "t2_train_val_split": t2_train_val_split,
    "w5_balance_quartiles": w5_balance_quartiles,
    "c1_cube_revenue": c1_cube_revenue,
    "c2_rollup_revenue": c2_rollup_revenue,
    "c3_grouping_sets_revenue": c3_grouping_sets_revenue,
    "h3_point_in_time_join": h3_point_in_time_join,
    "p1_profile_orders": p1_profile_orders,
    "q10_region_revenue": q10_region_revenue,
    "h1_scd2_customer_segment": h1_scd2_customer_segment,
    "w6_trailing_revenue": w6_trailing_revenue,
    "u1_priority_overlap": u1_priority_overlap,
    "b1_funnel_steps": b1_funnel_steps,
    "b2_weekly_retention": b2_weekly_retention,
    "b3_event_transitions": b3_event_transitions,
    "a9_grouping_sets": a9_grouping_sets,
    "s6_first_touch": s6_first_touch,
    "ts1_gap_fill": ts1_gap_fill,
    "ts2_interpolate": ts2_interpolate,
}

ANALYTIC_ORACLES = {
    "j9_asof_events_orders": J9_SQL,
    "j14_asof_tolerance": J14_SQL,
    "s4_user_sessions": S4_SQL,
    "s5_session_windows": S5_SQL,
    "a8_rollup_revenue": A8_SQL,
    "r4_pivot_order_status": R4_SQL,
    "v3_ivf_topk": V3_SQL,
    "f2_props_json": F2_SQL,
    "f3_bag_key_stats": F3_SQL,
    "f4_variant_extract": F4_SQL,
    "w3_running_revenue": W3_SQL,
    "w4_order_gaps": W4_SQL,
    "j10_interval_join": J10_SQL,
    "t2_train_val_split": T2_SQL,
    "w5_balance_quartiles": W5_SQL,
    "c1_cube_revenue": C1_SQL,
    "c2_rollup_revenue": C2_SQL,
    "c3_grouping_sets_revenue": C3_SQL,
    "h3_point_in_time_join": H3_SQL,
    "p1_profile_orders": P1_SQL,
    "q10_region_revenue": Q10_SQL,
    "h1_scd2_customer_segment": H1_SQL,
    "w6_trailing_revenue": W6_SQL,
    "u1_priority_overlap": U1_SQL,
    "b1_funnel_steps": B1_SQL,
    "b2_weekly_retention": B2_SQL,
    "b3_event_transitions": B3_SQL,
    "a9_grouping_sets": A9_SQL,
    "s6_first_touch": S6_SQL,
    "ts1_gap_fill": TS1_SQL,
    "ts2_interpolate": TS2_SQL,
    "ts3_rolling_zscore": TS3_SQL,
    "b4_top_paths": B4_SQL,
    "h2_cdc_snapshot": H2_SQL,
    "a10_brand_price_qty_corr": A10_SQL,
    "b5_conversion_latency": B5_SQL,
    "s7_windowed_topk": S7_SQL,
}


# ---------------------------------------------------------------------------
# TS4 — OHLC resampling bars (operators/temporal.py ohlc_bars): the
# canonical time-series downsampling shape (open/high/low/close per
# key and bucket). Selection-only semantics — endpoint values are
# PICKED by a total order (time, then event_id), never computed — so
# raw doubles hash bit-exactly cross-engine with zero rounding
# choreography. Plan: ONE exchange shared by both endpoint ranks and
# the grouped extremes.
# ---------------------------------------------------------------------------

TS4_STEP_S = 6 * 3600


def ts4_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.temporal import ohlc_bars

    return ohlc_bars(load(spark, sf_dir, "events"), step_s=TS4_STEP_S)


TS4_SQL = f"""
WITH base AS (
    SELECT event_type AS key,
           CAST(FLOOR(epoch_us(ts) / ({TS4_STEP_S} * 1000000.0)) AS BIGINT)
               AS bucket,
           epoch_us(ts) AS us, event_id, value AS v
    FROM events WHERE value IS NOT NULL
), ranked AS (
    SELECT key, bucket, v,
           ROW_NUMBER() OVER (PARTITION BY key, bucket
                              ORDER BY us ASC, event_id ASC) AS ra,
           ROW_NUMBER() OVER (PARTITION BY key, bucket
                              ORDER BY us DESC, event_id DESC) AS rd
    FROM base
)
SELECT key AS event_type,
       CAST(bucket * {TS4_STEP_S} AS BIGINT) AS bucket_start_s,
       MIN(CASE WHEN ra = 1 THEN v END) AS open,
       MAX(v) AS high,
       MIN(v) AS low,
       MIN(CASE WHEN rd = 1 THEN v END) AS close,
       CAST(COUNT(*) AS BIGINT) AS n_obs
FROM ranked GROUP BY 1, 2
"""

ANALYTIC_QUERIES["ts4_ohlc_bars"] = ts4_ohlc_bars
ANALYTIC_ORACLES["ts4_ohlc_bars"] = TS4_SQL


# I9 — OHLC fold proof: ohlc_state carries endpoint selection keys
# precisely so disjoint subsets MERGE (re-select min/max endpoint
# structs, combine extremes, sum counts) — 80/20 event split folded
# must equal the one-pass bars bit-for-bit; same from-scratch oracle
# as ts4. Extends the incremental contract (i1-i8) to resampling.


def i9_ohlc_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.temporal import (
        ohlc_finalize,
        ohlc_fold,
        ohlc_state,
    )

    events = load(spark, sf_dir, "events")
    base = ohlc_state(
        events.filter(F.col("event_id") % 5 != 0), step_s=TS4_STEP_S
    )
    delta = ohlc_state(
        events.filter(F.col("event_id") % 5 == 0), step_s=TS4_STEP_S
    )
    return ohlc_finalize(ohlc_fold(base, delta), step_s=TS4_STEP_S)


ANALYTIC_QUERIES["i9_ohlc_delta"] = i9_ohlc_delta
ANALYTIC_ORACLES["i9_ohlc_delta"] = TS4_SQL


# I11 — incremental sessionization: the HARD mergeable case (state is
# not a simple additive/set fold — sessions can span the split). The
# fold contract requires a TIME boundary, which is exactly what
# incremental ingest provides (arriving data is later than ingested
# data): the only possible merge is the boundary pair per key, no
# cascade can follow, so folding is O(sessions). The entry splits
# events at the integer midpoint of the observed time range,
# sessionizes each half independently, folds, and must reproduce
# from-scratch s4 bit-for-bit (same oracle).


def i11_session_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.cache import once_checkpoint
    from big_data_flight_analytics_spark.operators.temporal import (
        _micros,
        session_fold,
        session_stats,
    )

    events = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts"
    )
    us = _micros("ts")
    cut = events.agg(
        F.floor(
            (F.min(us) + F.max(us)).cast("double") / 2
        ).cast("long").alias("__cut")
    )
    with_cut = events.crossJoin(F.broadcast(cut))

    # ONE sessionization pass for both halves (r16): tagging each
    # event with its side and partitioning the session window on
    # (user_id, side) computes exactly the per-side sessions the old
    # two filtered passes produced — same row groups, same gap rule —
    # while scanning events once and paying one shuffle+sort instead
    # of two scans, two shuffles, and two broadcast builds of the cut.
    tagged = with_cut.select(
        "user_id",
        "event_id",
        "ts",
        (us > F.col("__cut")).alias("__late"),
    )
    # the fold references each state 3x (kept rows, boundary-session
    # extraction, bridge); eagerly checkpointing the SESSION-grain
    # state — tiny next to events — keeps this ONE sessionization pass
    # total instead of six re-computations. once_checkpoint, not
    # persist: measured 2.3 s vs 4.5 s (persist) vs 3.0 s (two-pass
    # HEAD) — a cached plan re-materializes per consumer thread while
    # the checkpointed frame is scanned directly.
    states = once_checkpoint(
        session_stats(
            tagged,
            key_col=["user_id", "__late"],
            ts_col="ts",
            gap_seconds=SESSION_GAP_S,
            tie_col="event_id",
        ).select("user_id", "__late", "start_us", "end_us", "n_events")
    )
    base = states.filter(~F.col("__late")).drop("__late")
    delta = states.filter(F.col("__late")).drop("__late")
    return session_fold(base, delta, "user_id", SESSION_GAP_S).select(
        "user_id",
        "session_idx",
        "n_events",
        "start_us",
        "end_us",
        "duration_us",
    )


ANALYTIC_QUERIES["i11_session_delta"] = i11_session_delta
ANALYTIC_ORACLES["i11_session_delta"] = S4_SQL


# ---------------------------------------------------------------------------
# W7 — LAG-framed window over a PRE-AGGREGATED frame: month-over-month
# revenue growth. The classic report shape whose scale posture is the
# interesting part: the global (unpartitioned) window is fine HERE
# because it runs over the monthly aggregate — O(months) rows however
# large the fact table — so the single-partition sort the lag needs is
# driver-trivial and the heavy lifting stays in the partial-agg
# groupBy underneath. Growth is a ratio of two decimal-exact doubles
# both engines divide identically (one IEEE op), so no rounding
# choreography is needed. Reference: the reference's weekly trend
# report (orchestration/src/batch_process.py) stops at the grouped
# counts; the lag/growth layer is the extension.
# ---------------------------------------------------------------------------


def w7_revenue_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )
    w = Window.orderBy(F.col("yr").asc(), F.col("mo").asc())
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "yr",
        "mo",
        "n_orders",
        "revenue",
        ((F.col("revenue") - prev) / prev).alias("mom_growth"),
    )


W7_SQL = """
WITH monthly AS (
    SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
    FROM orders GROUP BY 1, 2
)
SELECT yr, mo, n_orders, revenue,
       (revenue - LAG(revenue) OVER (ORDER BY yr ASC, mo ASC))
           / LAG(revenue) OVER (ORDER BY yr ASC, mo ASC) AS mom_growth
FROM monthly
"""

ANALYTIC_QUERIES["w7_revenue_mom_growth"] = w7_revenue_mom_growth
ANALYTIC_ORACLES["w7_revenue_mom_growth"] = W7_SQL


# ---------------------------------------------------------------------------
# H4 — SCD2 temporal diff: the segment MIGRATION MATRIX between a
# historical snapshot (the version valid AT an as-of instant — same
# interval predicate as h3's point-in-time join, aimed at the dimension
# itself instead of facts) and the current state. Answers "which
# segments did customers move between since T" — the audit query SCD2
# history exists to make answerable. Output is O(segments^2) however
# many customers there are; both snapshot reads share h1's one build
# (tracked_persist) and the matrix groupBy is the only shuffle on top.
# ---------------------------------------------------------------------------

H4_ASOF_US = 896659200000000  # 1998-06-01 UTC in epoch micros


def h4_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.cache import tracked_persist

    dim = tracked_persist(h1_scd2_customer_segment(spark, sf_dir))
    then = dim.filter(
        (F.col("valid_from_us") <= H4_ASOF_US)
        & (
            F.col("valid_to_us").isNull()
            | (F.lit(H4_ASOF_US) < F.col("valid_to_us"))
        )
    ).select("c_custkey", F.col("segment").alias("segment_then"))
    now = dim.filter(F.col("is_current")).select(
        "c_custkey", F.col("segment").alias("segment_now")
    )
    return (
        then.join(now, "c_custkey")
        .groupBy("segment_then", "segment_now")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
        .withColumn(
            "moved", F.col("segment_then") != F.col("segment_now")
        )
    )


H4_SQL = f"""
WITH scd AS (
{H1_SQL}
), then_v AS (
    SELECT c_custkey, segment AS segment_then
    FROM scd
    WHERE valid_from_us <= {H4_ASOF_US}
      AND (valid_to_us IS NULL OR {H4_ASOF_US} < valid_to_us)
), now_v AS (
    SELECT c_custkey, segment AS segment_now FROM scd WHERE is_current
)
SELECT segment_then, segment_now,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       segment_then <> segment_now AS moved
FROM then_v JOIN now_v USING (c_custkey)
GROUP BY 1, 2
"""

ANALYTIC_QUERIES["h4_segment_migration"] = h4_segment_migration
ANALYTIC_ORACLES["h4_segment_migration"] = H4_SQL


# ---------------------------------------------------------------------------
# TS5 — truncated exponentially-weighted moving average (the online
# smoother): each user's CURRENT smoothed value over their last
# EWMA_TAPS events with alpha = 1/2, i.e. weights 2^-i. The recursive
# EWMA is order-dependent and so engine-hostile; the truncated form is
# a FIXED 16-term linear combination, expressible as a lead-chain over
# ONE descending window — the same exchange serves the ranking that
# keeps only each user's latest event, so the whole query is one
# shuffle on the key it already carries and the output is O(users),
# corpus-size-independent. Weights are exact binary fractions and both
# engines evaluate the identical left-folded expression tree, so the
# doubles hash bit-exactly with zero rounding choreography.
# ---------------------------------------------------------------------------

EWMA_TAPS = 16


def ts5_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    num = None
    den = None
    for i in range(EWMA_TAPS):
        wt = 2.0 ** (-i)
        v = F.col("value") if i == 0 else F.lead("value", i).over(w)
        term = F.when(v.isNotNull(), F.lit(wt) * v).otherwise(F.lit(0.0))
        wterm = F.when(v.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
        num = term if num is None else num + term
        den = wterm if den is None else den + wterm
    return (
        events.select(
            "user_id",
            "event_id",
            (num / den).alias("ewma_value"),
            F.row_number().over(w).alias("__rn"),
        )
        .filter(F.col("__rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("latest_event_id"),
            "ewma_value",
        )
    )


def _ts5_sql() -> str:
    over = (
        "OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC)"
    )
    nums, dens = [], []
    for i in range(EWMA_TAPS):
        wt = repr(2.0 ** (-i))
        v = "value" if i == 0 else f"LEAD(value, {i}) {over}"
        nums.append(
            f"CASE WHEN {v} IS NOT NULL THEN {wt} * {v} ELSE 0.0 END"
        )
        dens.append(f"CASE WHEN {v} IS NOT NULL THEN {wt} ELSE 0.0 END")
    return f"""
SELECT user_id, event_id AS latest_event_id,
       ({' + '.join(nums)})
       / ({' + '.join(dens)}) AS ewma_value
FROM events
QUALIFY ROW_NUMBER() {over} = 1
"""


TS5_SQL = _ts5_sql()

ANALYTIC_QUERIES["ts5_ewma"] = ts5_ewma
ANALYTIC_ORACLES["ts5_ewma"] = TS5_SQL


# ---------------------------------------------------------------------------
# J17 — FORWARD as-of join (operators/temporal.asof_join_forward):
# each order attached to the customer's NEXT event at-or-after the
# order date — the time-to-next-touch lookup (j9 answers "what
# preceded this", j17 answers "what followed"). Same one-shuffle
# union-window shape with the frame flipped; the gap in micros is an
# exact int64 difference.
# ---------------------------------------------------------------------------


def j17_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.temporal import (
        asof_join_forward,
    )

    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey"),
        F.col("o_custkey").alias("user_id"),
        "o_orderdate",
    )
    events = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    joined = asof_join_forward(
        orders,
        events,
        on="user_id",
        left_time="o_orderdate",
        right_time="ts",
        payload={
            "event_id": "next_event_id",
            "event_type": "next_event_type",
        },
        right_tie="event_id",
    )
    return joined.select(
        "o_orderkey",
        "user_id",
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
            "order_us"
        ),
        "next_event_id",
        "next_event_type",
    )


J17_SQL = """
WITH l AS (
    SELECT o_orderkey, o_custkey AS user_id, epoch_us(o_orderdate) AS t
    FROM orders
), r AS (
    SELECT user_id, epoch_us(ts) AS t, event_id, event_type FROM events
), u AS (
    SELECT o_orderkey, user_id, t, 0 AS side, CAST(NULL AS BIGINT) AS tie,
           CAST(NULL AS BIGINT) AS p_id, CAST(NULL AS VARCHAR) AS p_type
    FROM l
    UNION ALL
    SELECT NULL, user_id, t, 1, event_id, event_id, event_type FROM r
), filled AS (
    SELECT o_orderkey, user_id, t, side,
           FIRST_VALUE(p_id IGNORE NULLS) OVER w AS next_event_id,
           FIRST_VALUE(p_type IGNORE NULLS) OVER w AS next_event_type
    FROM u
    WINDOW w AS (PARTITION BY user_id ORDER BY t ASC, side ASC, tie ASC
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT o_orderkey, user_id, t AS order_us, next_event_id, next_event_type
FROM filled WHERE side = 0
"""

ANALYTIC_QUERIES["j17_asof_forward"] = j17_asof_forward
ANALYTIC_ORACLES["j17_asof_forward"] = J17_SQL


# ---------------------------------------------------------------------------
# R5 — MULTI-AGGREGATE pivot: r4 pivoted one measure; this pivots the
# (status x {order count, revenue}) grid in one pass — Spark names the
# columns <status>_<alias> when pivot carries multiple aggs, the
# oracle mirrors the grid as explicit conditional aggregates. Same
# single-shuffle shape as r4 (the pivot IS a groupBy with a known
# key domain).
# ---------------------------------------------------------------------------


def r5_pivot_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ORDER_STATUSES)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("rev"),
        )
    )


def _r5_sql() -> str:
    cols = []
    for s in ORDER_STATUSES:
        cols.append(
            f"CAST(COUNT(CASE WHEN o_orderstatus = '{s}' THEN 1 END)"
            f" AS BIGINT) AS {s}_n"
        )
        cols.append(
            f"CAST(SUM(CASE WHEN o_orderstatus = '{s}'"
            f" THEN CAST(o_totalprice AS DECIMAL(18,2)) END)"
            f" AS DOUBLE) AS {s}_rev"
        )
    return (
        "SELECT o_orderpriority,\n       "
        + ",\n       ".join(cols)
        + "\nFROM orders GROUP BY o_orderpriority"
    )


R5_SQL = _r5_sql()

ANALYTIC_QUERIES["r5_pivot_multi_agg"] = r5_pivot_multi_agg
ANALYTIC_ORACLES["r5_pivot_multi_agg"] = R5_SQL
