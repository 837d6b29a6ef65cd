"""SURVEY §2 operator inventory as named queries over the driver testdata.

Each query exercises one or more operators from the reference's surface
(IDs cited per query), adapted to the TPC-H-ish tables per FIXTURES.md §7
(flights -> orders/lineitem, dims -> customer/nation/supplier,
opensky stream -> events). Every query has a matching DuckDB oracle in
ORACLES with *identical output column names* — the driver sorts columns
by name before value-hashing.

Float-parity rules used throughout (so Spark and DuckDB hash-match):
- ratios of integer counts are exact IEEE divisions — safe unrounded,
  rounded for presentation;
- averages/sums of doubles accumulate in engine-specific order — always
  rounded (2dp for price-scale magnitudes, 4dp for [0,1] ratios);
- DuckDB SUM/COUNT over integers yields HUGEINT/BIGINT — oracle SQL
  casts to match Spark's long/int output schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_flight_analytics_spark.functions.scalar import (
    hhmm_to_str,
    minmax_normalize_expr,
)
from big_data_flight_analytics_spark.operators.core import (
    add_global_stats,
    bucketize,
    count_if,
    group_count,
    having,
    mode_per_group,
    top_k,
    unpivot,
)
from big_data_flight_analytics_spark.operators.geo import radius_join
from big_data_flight_analytics_spark.operators.joins import dedup_dim_join, enrich_left
from big_data_flight_analytics_spark.plans.tables import load

# HAVING floor for per-customer order counts (median is 10 at every sf —
# keeps ~half the groups, drops ~half, exercising both sides; the
# reference's analogous MIN_FLIGHTS_THRESHOLD is shared.py:13).
MIN_ORDERS = 10
HIGH_VALUE = 300_000.0


# ---------------------------------------------------------------------------
# Q1 — multi-measure hash agg + conditional count (A1, A2)
# reference: batch_process.py:14-20
# Exactness: averages accumulate on an exact integer grain, not raw
# doubles — AVG over doubles is accumulation-order dependent, and
# "ROUND absorbs the ulp wobble" is exactly the environment-specific
# hash-gate risk that bit q12 on the driver host. avg_qty sums
# integral quantities as int64; avg_revenue fixes the per-row product
# at a 1e-4 grain with FLOOR (no rounding-mode ties: floor is
# unambiguous, and the multiply/add feeding it are identical IEEE ops
# in both engines), accumulated as DECIMAL so the sum is exact and
# order-free at any scale. The quotient chain is then a fixed
# left-to-right double expression, identical bits everywhere.
# ---------------------------------------------------------------------------

def q1_supplier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    rev_fixed = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
        + F.lit(0.5)
    ).cast("decimal(18,0)")
    return (
        li.groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            count_if(F.col("l_discount") > 0.05, "high_discount_items"),
            F.round(
                F.sum(F.col("l_quantity").cast("long"))
                * F.lit(1.0)
                / F.count(F.lit(1)),
                4,
            ).alias("avg_qty"),
            F.round(
                F.sum(rev_fixed).cast("double")
                / F.count(F.lit(1))
                / F.lit(10000.0),
                2,
            ).alias("avg_revenue"),
        )
        .filter(F.col("n_items") > 50)
    )


Q1_SQL = f"""
SELECT l_suppkey AS suppkey,
       COUNT(*) AS n_items,
       COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS high_discount_items,
       ROUND(SUM(CAST(l_quantity AS BIGINT)) * 1.0 / COUNT(*), 4) AS avg_qty,
       ROUND(CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000
                                 + 0.5) AS DECIMAL(18,0))) AS DOUBLE)
             / COUNT(*) / 10000.0, 2) AS avg_revenue
FROM lineitem
GROUP BY l_suppkey
HAVING COUNT(*) > 50
"""


# ---------------------------------------------------------------------------
# Q2 — group-count + count-if + HAVING on two keys (A1, A2, P8)
# reference: batch_process.py:37-44 (delayed share per route)
# ---------------------------------------------------------------------------

def q2_status_priority_delays(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    agg = orders.groupBy(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        count_if(F.col("o_totalprice") > HIGH_VALUE, "high_value_orders"),
    )
    return having(agg, F.col("n_orders") > 1000).withColumn(
        "high_value_rate", F.round(F.col("high_value_orders") / F.col("n_orders"), 4)
    )


Q2_SQL = f"""
SELECT o_orderstatus AS status,
       o_orderpriority AS priority,
       COUNT(*) AS n_orders,
       COUNT(CASE WHEN o_totalprice > {HIGH_VALUE} THEN 1 END) AS high_value_orders,
       ROUND(COUNT(CASE WHEN o_totalprice > {HIGH_VALUE} THEN 1 END) * 1.0
             / COUNT(*), 4) AS high_value_rate
FROM orders
GROUP BY 1, 2
HAVING COUNT(*) > 1000
"""


# ---------------------------------------------------------------------------
# Q3 — FLAGSHIP: group-count -> HAVING -> global stats -> scores -> dim
# join -> top-k (A1, P8, W1-as-crossjoin, J1, O1, O3)
# reference: batch_process.py:53-93 (top-10 busiest airports with
# busyness/share scores). Scale note: the reference computes min/max/sum
# with an unpartitioned window (batch_process.py:65-69); here the stats
# come from a 1-row aggregate broadcast back — no single-partition funnel.
# ---------------------------------------------------------------------------

def q3_busiest_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")

    counts = group_count(orders, ["o_custkey"], alias="n_orders")
    counts = having(counts, F.col("n_orders") > MIN_ORDERS)
    counts = add_global_stats(
        counts,
        {
            "__mn": F.min("n_orders"),
            "__mx": F.max("n_orders"),
            "__tot": F.sum("n_orders"),
        },
    )
    span = F.when(F.col("__mx") > F.col("__mn"), F.col("__mx") - F.col("__mn")).otherwise(
        F.lit(1)
    )
    scored = counts.select(
        F.col("o_custkey").alias("custkey"),
        F.col("n_orders"),
        F.round((F.col("n_orders") - F.col("__mn")) * 100.0 / span, 2).alias(
            "busyness_score"
        ),
        F.round(F.col("n_orders") * 100.0 / F.col("__tot").cast("double"), 4).alias(
            "share_pct"
        ),
    )
    enriched = enrich_left(
        scored,
        customer,
        "custkey",
        "c_custkey",
        select={"c_name": "customer_name", "c_mktsegment": "segment"},
    )
    return top_k(enriched, [F.col("n_orders").desc(), F.col("custkey").asc()], 10)


Q3_SQL = f"""
WITH counts AS (
    SELECT o_custkey AS custkey, COUNT(*) AS n_orders
    FROM orders GROUP BY 1 HAVING COUNT(*) > {MIN_ORDERS}
), stats AS (
    SELECT MIN(n_orders) AS mn, MAX(n_orders) AS mx,
           CAST(SUM(n_orders) AS DOUBLE) AS tot
    FROM counts
)
SELECT c.custkey, c.n_orders,
       ROUND((c.n_orders - s.mn) * 100.0 /
             (CASE WHEN s.mx > s.mn THEN s.mx - s.mn ELSE 1 END), 2)
           AS busyness_score,
       ROUND(c.n_orders * 100.0 / s.tot, 4) AS share_pct,
       cu.c_name AS customer_name,
       cu.c_mktsegment AS segment
FROM counts c
CROSS JOIN stats s
LEFT JOIN customer cu ON cu.c_custkey = c.custkey
ORDER BY c.n_orders DESC, c.custkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Q4 — calendar grouping (F: weekofyear; A1, A2)
# reference: batch_process.py:97-111 (weekly flight counts)
# ---------------------------------------------------------------------------

def q4_weekly_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy(
        F.year("o_orderdate").alias("yr"),
        F.weekofyear("o_orderdate").alias("week"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        count_if(F.col("o_orderstatus") == "F", "fulfilled"),
        # exact decimal accumulation (order-free), double on the way
        # out — the w3/a9 pattern; a raw double SUM under ROUND is the
        # q12-class environment risk
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_value"),
    )


Q4_SQL = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(weekofyear(o_orderdate) AS INTEGER) AS week,
       COUNT(*) AS n_orders,
       COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS fulfilled,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS total_value
FROM orders
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Q5 — global aggregate + stack-unpivot of k measures (A3, R1)
# reference: batch_process.py:119-135 (avg delay by reason, unpivoted)
# ---------------------------------------------------------------------------

def q5_measure_averages(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")

    # exact-grain averages (order-free accumulation; see Q1 banner):
    # quantities are integral, money columns have <= 2 decimals, the
    # revenue product is fixed at a 1e-4 grain with FLOOR
    def dec_avg(col: str, dp: int):
        return F.round(
            F.sum(F.col(col).cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1)),
            dp,
        )

    rev_fixed = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
        + F.lit(0.5)
    ).cast("decimal(18,0)")
    agg = li.agg(
        F.round(
            F.sum(F.col("l_quantity").cast("long"))
            * F.lit(1.0)
            / F.count(F.lit(1)),
            4,
        ).alias("quantity"),
        dec_avg("l_extendedprice", 2).alias("extendedprice"),
        dec_avg("l_discount", 4).alias("discount"),
        dec_avg("l_tax", 4).alias("tax"),
        F.round(
            F.sum(rev_fixed).cast("double")
            / F.count(F.lit(1))
            / F.lit(10000.0),
            2,
        ).alias("revenue"),
    )
    return unpivot(
        agg,
        id_cols=[],
        value_cols=["quantity", "extendedprice", "discount", "tax", "revenue"],
        var_name="measure",
        value_name="avg_value",
    )


Q5_SQL = """
SELECT 'quantity' AS measure,
       ROUND(SUM(CAST(l_quantity AS BIGINT)) * 1.0 / COUNT(*), 4)
           AS avg_value FROM lineitem
UNION ALL
SELECT 'extendedprice',
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*), 2) FROM lineitem
UNION ALL
SELECT 'discount',
       ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*), 4) FROM lineitem
UNION ALL
SELECT 'tax',
       ROUND(CAST(SUM(CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*), 4) FROM lineitem
UNION ALL
SELECT 'revenue',
       ROUND(CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000
                                 + 0.5) AS DECIMAL(18,0))) AS DOUBLE)
             / COUNT(*) / 10000.0, 2) FROM lineitem
"""


# ---------------------------------------------------------------------------
# Q6 — day-of-week conditional counts (A2; F: dayofweek)
# reference: batch_process.py:141-152 (cancellations per day-of-week).
# Spark dayofweek: 1 = Sunday; DuckDB dayofweek: 0 = Sunday -> oracle +1.
# ---------------------------------------------------------------------------

def q6_dow_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(F.dayofweek("ts").alias("dow"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            count_if(F.col("event_type") == "click", "clicks"),
        )
        .withColumn("click_rate", F.round(F.col("clicks") / F.col("n_events"), 4))
    )


Q6_SQL = """
SELECT CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
       COUNT(*) AS n_events,
       COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS clicks,
       ROUND(COUNT(CASE WHEN event_type = 'click' THEN 1 END) * 1.0
             / COUNT(*), 4) AS click_rate
FROM events
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q7 — right-exclusive bucketize -> labeled categories (R3)
# reference: batch_process.py:160-170 (Distance buckets, Bucketizer
# semantics: [lo, hi), last bucket open-ended)
# ---------------------------------------------------------------------------

PRICE_EDGES = [0.0, 100_000.0, 200_000.0, 300_000.0, 400_000.0, float("inf")]
PRICE_LABELS = ["0-100k", "100k-200k", "200k-300k", "300k-400k", "400k+"]


def q7_price_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    bucketed = bucketize(orders, "o_totalprice", PRICE_EDGES, PRICE_LABELS, out="price_bucket")
    return bucketed.groupBy("price_bucket").agg(
        F.count(F.lit(1)).alias("n_orders"),
        # exact decimal accumulation (see Q1 banner)
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast(
                "double"
            )
            / F.count(F.lit(1)),
            2,
        ).alias("avg_price"),
    )


Q7_SQL = """
SELECT CASE
         WHEN o_totalprice >= 0 AND o_totalprice < 100000 THEN '0-100k'
         WHEN o_totalprice >= 100000 AND o_totalprice < 200000 THEN '100k-200k'
         WHEN o_totalprice >= 200000 AND o_totalprice < 300000 THEN '200k-300k'
         WHEN o_totalprice >= 300000 AND o_totalprice < 400000 THEN '300k-400k'
         WHEN o_totalprice >= 400000 THEN '400k+'
       END AS price_bucket,
       COUNT(*) AS n_orders,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*), 2) AS avg_price
FROM orders
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q8 — per-group rate vs global rate, in-plan scalar (A4 as crossJoin)
# reference: batch_process.py:186-207 (problematic routes: route delay
# rate >= 1.2x global; the reference collect()s the global scalar — here
# it stays in-plan as a broadcast cross join so the query is one plan)
# ---------------------------------------------------------------------------

def q8_problematic_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    joined = enrich_left(orders, customer, "o_custkey", "c_custkey",
                         select={"c_mktsegment": "segment"})
    seg = joined.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        count_if(F.col("o_totalprice") > HIGH_VALUE, "high_value_orders"),
    )
    glob = orders.agg(
        (
            count_if(F.col("o_totalprice") > HIGH_VALUE) / F.count(F.lit(1))
        ).alias("__grate")
    )
    rate = F.col("high_value_orders") / F.col("n_orders")
    return (
        seg.crossJoin(F.broadcast(glob))
        .select(
            "segment",
            "n_orders",
            F.round(rate, 4).alias("high_value_rate"),
            F.round(rate / F.col("__grate"), 4).alias("problem_score"),
        )
        .filter(F.col("problem_score") >= 1.0)
    )


Q8_SQL = f"""
WITH seg AS (
    SELECT c.c_mktsegment AS segment,
           COUNT(*) AS n_orders,
           COUNT(CASE WHEN o.o_totalprice > {HIGH_VALUE} THEN 1 END) AS hv
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
), overall AS (
    SELECT COUNT(CASE WHEN o_totalprice > {HIGH_VALUE} THEN 1 END) * 1.0
           / COUNT(*) AS grate
    FROM orders
)
SELECT segment, n_orders,
       ROUND(hv * 1.0 / n_orders, 4) AS high_value_rate,
       ROUND((hv * 1.0 / n_orders) / grate, 4) AS problem_score
FROM seg CROSS JOIN overall
WHERE ROUND((hv * 1.0 / n_orders) / grate, 4) >= 1.0
"""


# ---------------------------------------------------------------------------
# Q9 — unpivot k string columns -> trim-empty filter -> count (R2, P7)
# reference: batch_process.py:216-232 (Div1..Div5 diversion airports)
# ---------------------------------------------------------------------------

def q9_part_attributes(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    long = unpivot(
        part,
        id_cols=["p_partkey"],
        value_cols=["p_brand", "p_type"],
        var_name="attr",
        value_name="val",
    )
    cleaned = long.filter(F.trim(F.coalesce(F.col("val"), F.lit(""))) != "")
    return having(
        cleaned.groupBy("attr", "val").agg(F.count(F.lit(1)).alias("n_parts")),
        F.col("n_parts") > 5,
    )


Q9_SQL = """
WITH long AS (
    SELECT p_partkey, 'p_brand' AS attr, p_brand AS val FROM part
    UNION ALL
    SELECT p_partkey, 'p_type', p_type FROM part
)
SELECT attr, val, COUNT(*) AS n_parts
FROM long
WHERE TRIM(COALESCE(val, '')) <> ''
GROUP BY 1, 2
HAVING COUNT(*) > 5
"""


# ---------------------------------------------------------------------------
# L1 — min-max normalization with span guard (A8) + rounding parity
# reference: aircrafts_lookup_to_kafka.py:47-59
# ---------------------------------------------------------------------------

def l1_customer_balance_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    base = customer.select(
        F.col("c_custkey").alias("custkey"),
        F.round(F.col("c_acctbal"), 2).alias("acctbal"),
        F.col("c_acctbal").alias("__raw"),
    )
    stats = add_global_stats(base, {"__mn": F.min("__raw"), "__mx": F.max("__raw")})
    return stats.select(
        "custkey",
        "acctbal",
        minmax_normalize_expr(
            F.col("__raw"), F.col("__mn"), F.col("__mx"), dp=4
        ).alias("balance_score"),
    )


L1_SQL = """
WITH s AS (SELECT MIN(c_acctbal) AS mn, MAX(c_acctbal) AS mx FROM customer)
SELECT c_custkey AS custkey,
       ROUND(c_acctbal, 2) AS acctbal,
       ROUND((COALESCE(c_acctbal, 0) - s.mn) /
             (CASE WHEN s.mx > s.mn THEN s.mx - s.mn ELSE 1.0 END), 4)
           AS balance_score
FROM customer CROSS JOIN s
"""


# ---------------------------------------------------------------------------
# L2 — per-group mode with deterministic tie-break (A9, W2)
# reference: flights_lookup_to_kafka.py:30-46
# ---------------------------------------------------------------------------

def l2_user_top_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    m = mode_per_group(events, ["user_id"], "event_type")
    return m.select("user_id", F.col("event_type").alias("top_event_type"))


L2_SQL = """
WITH counted AS (
    SELECT user_id, event_type, COUNT(*) AS cnt
    FROM events GROUP BY 1, 2
), ranked AS (
    SELECT user_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY cnt DESC, event_type ASC) AS rn
    FROM counted
)
SELECT user_id, event_type AS top_event_type FROM ranked WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# L3 — the full flights_lookup chain (J4 derived-key join + A9 dual
# mode with desc-count/asc-value tie-break + A5 first() carry + J5
# self-result join + F hhmm codec), the reference's most intricate
# batch query, restated over events x customer x nation.
# reference: flights_lookup_to_kafka.py:19-54
# ---------------------------------------------------------------------------

def l3_flights_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """callsign analog = mktsegment + '-' + nationkey (dim attr + key
    piece, like ICAO + flight number); per callsign the mode of the
    event HHMM ("CRSArrTime") and of a second derived code
    ("CRSDepTime"), each with the reference's desc-count/asc-value
    tie-break, carried group name via first() (functionally dependent
    on the key, so deterministic), then the arr x dep self-join and
    %02d:%02d formatting. Both dims broadcast; the two mode branches
    shuffle on the derived key only."""
    events = load(spark, sf_dir, "events")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")

    cust = customer.filter(
        F.length(F.trim(F.coalesce(F.col("c_mktsegment"), F.lit("")))) > 0
    )
    df = (
        events.join(
            F.broadcast(cust), events["user_id"] == cust["c_custkey"], "inner"
        )
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
            "inner",
        )
        .withColumn(
            "callsign",
            F.concat(
                F.col("c_mktsegment"), F.lit("-"), F.col("c_nationkey").cast("string")
            ),
        )
        .filter(F.length(F.trim(F.col("callsign"))) > 0)
        .withColumn("arr_hhmm", F.hour("ts") * 100 + F.minute("ts"))
        .withColumn("dep_hhmm", (F.col("event_id") * 7) % 2400)
    )
    arr = mode_per_group(
        df, ["callsign"], "arr_hhmm", carry={"group_name": F.first("n_name")}
    ).select("callsign", F.col("arr_hhmm").alias("mode_arr"), "group_name")
    dep = mode_per_group(df, ["callsign"], "dep_hhmm").select(
        "callsign", F.col("dep_hhmm").alias("mode_dep")
    )
    # both mode outputs are ≤1 row per callsign; broadcasting the
    # narrower side keeps the arr x dep self-join sort-free (BHJ)
    return arr.join(F.broadcast(dep), "callsign").select(
        "callsign",
        "group_name",
        hhmm_to_str(F.col("mode_arr")).alias("arr_time"),
        hhmm_to_str(F.col("mode_dep")).alias("dep_time"),
    )


L3_SQL = """
WITH base AS (
    SELECT e.event_id,
           c.c_mktsegment || '-' || c.c_nationkey AS callsign,
           n.n_name,
           hour(e.ts) * 100 + minute(e.ts) AS arr_hhmm,
           (e.event_id * 7) % 2400 AS dep_hhmm
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE length(trim(COALESCE(c.c_mktsegment, ''))) > 0
      AND length(trim(c.c_mktsegment || '-' || c.c_nationkey)) > 0
), arr_counts AS (
    -- first(n_name): functionally dependent on callsign -> MIN is the
    -- same value, deterministically
    SELECT callsign, arr_hhmm, COUNT(*) AS cnt, MIN(n_name) AS group_name
    FROM base GROUP BY 1, 2
), dep_counts AS (
    SELECT callsign, dep_hhmm, COUNT(*) AS cnt
    FROM base GROUP BY 1, 2
), arr_mode AS (
    SELECT callsign, arr_hhmm, group_name
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY callsign
                                       ORDER BY cnt DESC, arr_hhmm ASC) AS rn
          FROM arr_counts)
    WHERE rn = 1
), dep_mode AS (
    SELECT callsign, dep_hhmm
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY callsign
                                       ORDER BY cnt DESC, dep_hhmm ASC) AS rn
          FROM dep_counts)
    WHERE rn = 1
)
SELECT a.callsign,
       a.group_name,
       printf('%02d:%02d', CAST(FLOOR(a.arr_hhmm / 100.0) AS INTEGER),
              a.arr_hhmm % 100) AS arr_time,
       printf('%02d:%02d', CAST(FLOOR(d.dep_hhmm / 100.0) AS INTEGER),
              d.dep_hhmm % 100) AS dep_time
FROM arr_mode a JOIN dep_mode d USING (callsign)
"""


# ---------------------------------------------------------------------------
# F1 — HHMM time codec (F: hhmm_to_str via format_string)
# reference: flights_lookup_to_kafka.py:15-16
# ---------------------------------------------------------------------------

def f1_hhmm_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    hhmm = F.hour("ts") * 100 + F.minute("ts")
    return (
        events.select(hhmm_to_str(hhmm).alias("hhmm"))
        .groupBy("hhmm")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


F1_SQL = """
SELECT printf('%02d:%02d',
              CAST(FLOOR((hour(ts) * 100 + minute(ts)) / 100.0) AS INTEGER),
              (hour(ts) * 100 + minute(ts)) % 100) AS hhmm,
       COUNT(*) AS n_events
FROM events
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# J1 — left broadcast dim-join chain (J1, J2)
# reference: shared.py:28-39 (airline + airport enrichment)
# ---------------------------------------------------------------------------

def j1_enrich_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    step1 = enrich_left(
        orders, customer, "o_custkey", "c_custkey",
        select={"c_name": "customer_name", "c_nationkey": "__nk"},
    )
    step2 = enrich_left(step1, nation, "__nk", "n_nationkey",
                        select={"n_name": "nation_name"})
    return step2.select(
        F.col("o_orderkey").alias("orderkey"),
        "customer_name",
        "nation_name",
        F.col("o_totalprice").alias("totalprice"),
    )


J1_SQL = """
SELECT o_orderkey AS orderkey,
       c.c_name AS customer_name,
       n.n_name AS nation_name,
       o_totalprice AS totalprice
FROM orders o
LEFT JOIN customer c ON o.o_custkey = c.c_custkey
LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
"""


# ---------------------------------------------------------------------------
# J3 — dedup-dim-then-join (A7, J3)
# reference: aircrafts_lookup_to_kafka.py:35-42. The dup-keyed dim is
# synthesized by doubling supplier; rows with equal keys are identical so
# dropDuplicates is deterministic here.
# ---------------------------------------------------------------------------

def j3_dedup_supplier_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").withColumnRenamed("l_suppkey", "s_suppkey")
    supplier = load(spark, sf_dir, "supplier")
    dup_dim = supplier.unionAll(supplier)
    joined = dedup_dim_join(li, dup_dim, "s_suppkey", how="inner")
    return joined.groupBy(F.col("s_name").alias("supplier_name")).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
    )


J3_SQL = """
WITH dim AS (
    SELECT DISTINCT * FROM (
        SELECT * FROM supplier UNION ALL SELECT * FROM supplier
    )
)
SELECT s.s_name AS supplier_name,
       COUNT(*) AS n_items,
       ROUND(SUM(l.l_quantity), 2) AS total_qty
FROM lineitem l JOIN dim s ON l.l_suppkey = s.s_suppkey
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# J7 — haversine radius join (geo theta join)
# reference: AirportAircraftCountStream.java:79-88,201-237 (50 km match);
# coordinates synthesized deterministically from keys. The broadcast
# nested-loop path is exercised here; the latitude-banded equi-join path
# is unit-tested for result equivalence in tests/test_geo.py.
# ---------------------------------------------------------------------------

GEO_RADIUS_KM = 3000.0


def j7_geo_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    points = customer.select(
        F.col("c_custkey").alias("custkey"),
        (((F.col("c_custkey") * 7) % 141) - 70.0).alias("latitude"),
        (((F.col("c_custkey") * 13) % 361) - 180.0).alias("longitude"),
    )
    sites = supplier.select(
        F.col("s_suppkey").alias("suppkey"),
        (((F.col("s_suppkey") * 37) % 141) - 70.0).alias("site_latitude"),
        (((F.col("s_suppkey") * 91) % 361) - 180.0).alias("site_longitude"),
    )
    pairs = radius_join(points, sites, radius_km=GEO_RADIUS_KM, use_banding=False)
    return pairs.select(
        "custkey", "suppkey", F.round(F.col("distance_km"), 3).alias("dist_km")
    )


J7_SQL = f"""
WITH points AS (
    SELECT c_custkey AS custkey,
           ((c_custkey * 7) % 141) - 70.0 AS plat,
           ((c_custkey * 13) % 361) - 180.0 AS plon
    FROM customer
), sites AS (
    SELECT s_suppkey AS suppkey,
           ((s_suppkey * 37) % 141) - 70.0 AS slat,
           ((s_suppkey * 91) % 361) - 180.0 AS slon
    FROM supplier
), pairs AS (
    SELECT custkey, suppkey,
           2 * 6371.0 * atan2(
               sqrt(
                   sin(radians(slat - plat) / 2) * sin(radians(slat - plat) / 2)
                   + cos(radians(plat)) * cos(radians(slat))
                     * sin(radians(slon - plon) / 2) * sin(radians(slon - plon) / 2)
               ),
               sqrt(greatest(1 - (
                   sin(radians(slat - plat) / 2) * sin(radians(slat - plat) / 2)
                   + cos(radians(plat)) * cos(radians(slat))
                     * sin(radians(slon - plon) / 2) * sin(radians(slon - plon) / 2)
               ), 0))
           ) AS d
    FROM points CROSS JOIN sites
)
SELECT custkey, suppkey, ROUND(d, 3) AS dist_km
FROM pairs WHERE d <= {GEO_RADIUS_KM}
"""


# ---------------------------------------------------------------------------
# J8 — semi/anti join primitives (library extension, SURVEY §2.3 note:
# not in the reference's surface, exposed because MIN_FLIGHTS-style
# qualification patterns benefit). Customers WITH vs WITHOUT a
# high-value urgent order, tagged and unioned.
# ---------------------------------------------------------------------------

URGENT_VALUE = 400_000.0


def j8_semi_anti_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.joins import anti_join, semi_join

    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    qualifying = orders.filter(
        (F.col("o_totalprice") > URGENT_VALUE)
        & (F.col("o_orderpriority") == "1-URGENT")
    )
    base = customer.select(F.col("c_custkey").alias("custkey"))
    with_q = semi_join(base, qualifying, "custkey", "o_custkey").withColumn(
        "bucket", F.lit("has_urgent_high_value")
    )
    without_q = anti_join(base, qualifying, "custkey", "o_custkey").withColumn(
        "bucket", F.lit("no_urgent_high_value")
    )
    return with_q.unionAll(without_q)


J8_SQL = f"""
SELECT c_custkey AS custkey, 'has_urgent_high_value' AS bucket
FROM customer
WHERE EXISTS (
    SELECT 1 FROM orders WHERE o_custkey = c_custkey
      AND o_totalprice > {URGENT_VALUE} AND o_orderpriority = '1-URGENT'
)
UNION ALL
SELECT c_custkey, 'no_urgent_high_value'
FROM customer
WHERE NOT EXISTS (
    SELECT 1 FROM orders WHERE o_custkey = c_custkey
      AND o_totalprice > {URGENT_VALUE} AND o_orderpriority = '1-URGENT'
)
"""


# ---------------------------------------------------------------------------
# K1 — salted two-stage aggregation (skew mitigation; results must equal
# a plain GROUP BY, which is exactly what the oracle runs)
# ---------------------------------------------------------------------------

def k1_salted_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.skew import salted_group_agg

    orders = load(spark, sf_dir, "orders")
    out = salted_group_agg(
        orders,
        ["o_custkey"],
        # decimal partials: the whole point of the salt test is that
        # the two-stage (salted) accumulation must equal the one-stage
        # oracle — exact decimal sums make that an identity instead of
        # a ROUND-masked float coincidence (q12-class risk)
        partial_aggs={
            "__n": F.count(F.lit(1)),
            "__sum": F.sum(F.col("o_totalprice").cast("decimal(18,2)")),
        },
        combine_aggs={
            "n_orders": F.sum("__n"),
            "total_value": F.sum("__sum").cast("double"),
        },
    )
    return out.select(
        F.col("o_custkey").alias("custkey"), "n_orders", "total_value"
    )


K1_SQL = """
SELECT o_custkey AS custkey,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS total_value
FROM orders
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# K2 — skewed join + aggregation under a genuinely hot key (zipfian-ish
# fixture derived deterministically from lineitem: ~80% of 600k rows
# collapse onto ONE part key). Composes both skew operators k1 leaves
# untouched: salted_broadcast_join spreads the hot fact key over salt
# buckets for the dim join, salted_group_agg spreads the equally-hot
# post-join brand key for the final aggregate. The oracle is the plain
# unsalted join+GROUP BY — salting must be invisible in the result.
# ---------------------------------------------------------------------------

K2_HOT_KEY = 1
K2_MOD = 5


def k2_skewed_brand_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.skew import (
        salted_broadcast_join,
        salted_group_agg,
    )

    li = load(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_partkey") % K2_MOD != 0, F.lit(K2_HOT_KEY))
        .otherwise(F.col("l_partkey"))
        .cast("long")
        .alias("p_key"),
        "l_quantity",
    )
    part = load(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("long").alias("p_key"), "p_brand"
    )
    joined = salted_broadcast_join(li, part, "p_key", how="inner")
    return salted_group_agg(
        joined,
        ["p_brand"],
        partial_aggs={
            "__n": F.count(F.lit(1)),
            "__qty": F.sum("l_quantity"),
        },
        combine_aggs={
            "n_items": F.sum("__n"),
            "total_qty": F.round(F.sum("__qty"), 2),
        },
    ).select("p_brand", "n_items", "total_qty")


K2_SQL = f"""
WITH li AS (
    SELECT CASE WHEN l_partkey % {K2_MOD} <> 0 THEN {K2_HOT_KEY}
                ELSE l_partkey END AS p_key,
           l_quantity
    FROM lineitem
)
SELECT p_brand,
       COUNT(*) AS n_items,
       ROUND(SUM(l_quantity), 2) AS total_qty
FROM li JOIN part ON p_partkey = p_key
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# I1 — incremental aggregate maintenance: the materialized aggregate is
# refreshed by folding per-partition PARTIAL aggregates (here the fact
# table deterministically split into three "arrival batches"), never by
# rescanning history. The oracle is the plain full-scan GROUP BY — the
# algebraic merge must be invisible in the result, like k1/k2's
# salting. DECIMAL-accumulated sums keep the merge order-independent.
# ---------------------------------------------------------------------------


def i1_incremental_priority_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from big_data_flight_analytics_spark.operators.incremental import (
        merge_partial_aggregates,
        partial_aggregate,
    )

    orders = load(spark, sf_dir, "orders")
    parts = [
        partial_aggregate(
            orders.filter(F.col("o_orderkey") % 3 == i),
            ["o_orderpriority"],
            partials={
                "__n": F.count(F.lit(1)),
                "__sum": F.sum(F.col("o_totalprice").cast("decimal(18,2)")),
                "__min": F.min("o_totalprice"),
                "__max": F.max("o_totalprice"),
            },
        )
        for i in range(3)
    ]
    return merge_partial_aggregates(
        parts,
        ["o_orderpriority"],
        combine={
            "n_orders": F.sum("__n"),
            "total_value": F.round(F.sum("__sum"), 2).cast("double"),
            "min_value": F.min("__min"),
            "max_value": F.max("__max"),
        },
    ).select(
        F.col("o_orderpriority").alias("priority"),
        "n_orders",
        "total_value",
        "min_value",
        "max_value",
    )


I1_SQL = """
SELECT o_orderpriority AS priority,
       COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
           AS total_value,
       MIN(o_totalprice) AS min_value,
       MAX(o_totalprice) AS max_value
FROM orders
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# O3 — top-k via TakeOrderedAndProject (O1, O3)
# reference: batch_process.py:85
# ---------------------------------------------------------------------------

def o3_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return top_k(
        orders.select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
        ),
        [F.col("totalprice").desc(), F.col("orderkey").asc()],
        10,
    )


O3_SQL = """
SELECT o_orderkey AS orderkey, o_totalprice AS totalprice
FROM orders
ORDER BY totalprice DESC, orderkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# A6 — distinct (A6)
# reference: transform.py:58
# ---------------------------------------------------------------------------

def a6_distinct_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events").select("event_type").distinct()


A6_SQL = "SELECT DISTINCT event_type FROM events"


# ---------------------------------------------------------------------------
# W2 — ranked top-n per partition (W2)
# reference: flights_lookup_to_kafka.py:37-46
# ---------------------------------------------------------------------------

def w2_top3_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
            F.col("rn").cast("int").alias("rn"),
        )
    )


W2_SQL = """
SELECT o_orderpriority AS priority,
       o_orderkey AS orderkey,
       o_totalprice AS totalprice,
       CAST(rn AS INTEGER) AS rn
FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                 ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
    FROM orders
)
WHERE rn <= 3
"""


# ---------------------------------------------------------------------------
# S2 — tumbling-window distinct count, batch-expressible form (S2, S4, A10)
# reference: AirlineAircraftCountStream.java:29-51 (1-min tumbling
# windows, exact distinct aircraft per key). The streaming form (watermark
# + append) lives in streaming/windowed_counts.py and is asserted
# equivalent to this batch form in tests/test_streaming.py. Window starts
# are emitted as epoch seconds so timestamp precision never enters the
# hash comparison.
# ---------------------------------------------------------------------------

def s2_windowed_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Two-level distinct (see operators/profile.py): count_distinct
    # alongside a plain count makes Catalyst Expand-double every event
    # through the shuffle; pre-aggregating per (window, type, user)
    # reconstructs both measures exactly and map-side-combines instead.
    events = load(spark, sf_dir, "events")
    per_user = events.groupBy(
        F.window("ts", "1 minute").alias("w"), "event_type", "user_id"
    ).agg(F.count(F.lit(1)).alias("__cnt"))
    return (
        per_user.groupBy("w", "event_type")
        .agg(
            F.count(F.when(F.col("user_id").isNotNull(), 1)).alias(
                "uniq_users"
            ),
            F.sum("__cnt").alias("n_events"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_epoch"),
            "event_type",
            "uniq_users",
            "n_events",
        )
    )


S2_SQL = """
SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS window_start_epoch,
       event_type,
       COUNT(DISTINCT user_id) AS uniq_users,
       COUNT(*) AS n_events
FROM events
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# A7 — exact percentiles (library extension: distribution stats the
# reference lacks; Spark exact `percentile` matches DuckDB quantile_cont
# bit-for-bit — linear interpolation both)
# ---------------------------------------------------------------------------

def a7_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.percentile("o_totalprice", 0.5).alias("p50"),
        F.percentile("o_totalprice", 0.9).alias("p90"),
        F.percentile("o_totalprice", 0.99).alias("p99"),
    )


A7_SQL = """
SELECT o_orderpriority AS priority,
       quantile_cont(o_totalprice, 0.5) AS p50,
       quantile_cont(o_totalprice, 0.9) AS p90,
       quantile_cont(o_totalprice, 0.99) AS p99
FROM orders
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# S3 — sliding-window distinct counts (extension beyond the reference's
# tumbling-only surface; batch-expressible form — every event belongs to
# duration/slide = 2 epoch-aligned windows)
# ---------------------------------------------------------------------------

def s3_sliding_window_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "2 minutes", "1 minute").alias("w"), "event_type"
        )
        .agg(F.count_distinct(F.col("user_id")).alias("uniq_users"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_epoch"),
            "event_type",
            "uniq_users",
        )
    )


S3_SQL = """
WITH starts AS (
    SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS s0, user_id, event_type
    FROM events
), assigned AS (
    SELECT s0 AS window_start_epoch, user_id, event_type FROM starts
    UNION ALL
    SELECT s0 - 60, user_id, event_type FROM starts
)
SELECT window_start_epoch, event_type,
       COUNT(DISTINCT user_id) AS uniq_users
FROM assigned
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Q11 — correlated scalar subquery, decorrelated: lineitems priced at
# their part's minimum (TPC-H Q2's min-cost-supplier shape). BOTH
# sides write the decorrelation explicitly — min-per-key aggregate +
# equi-join — the Spark side to pin the single-shuffle plan, the
# oracle (since r8) because q12 proved correlated forms are
# driver-DuckDB-version-fragile. Equality on the raw DOUBLE is exact:
# both engines compare the same parquet values, no arithmetic
# performed.
# ---------------------------------------------------------------------------


def q11_cheapest_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    mins = li.groupBy("l_partkey").agg(
        F.min("l_extendedprice").alias("cheapest_price")
    )
    return (
        li.select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(mins, "l_partkey")
        .filter(F.col("l_extendedprice") == F.col("cheapest_price"))
        .join(part.select("p_partkey", "p_brand"),
              F.col("l_partkey") == F.col("p_partkey"))
        .select("p_partkey", "p_brand", "l_suppkey", "cheapest_price")
    )


# Oracle decorrelated (round 8, proactive): q12 proved the driver's
# DuckDB version can disagree with a correlated-scalar-subquery FORM
# while local DuckDB passes bit-exact — so no oracle keeps one. Plain
# pre-aggregated CTE join, semantically identical.
Q11_SQL = """
WITH mins AS (
    SELECT l_partkey, MIN(l_extendedprice) AS cheapest_price
    FROM lineitem GROUP BY 1
)
SELECT p_partkey, p_brand, l_suppkey,
       l_extendedprice AS cheapest_price
FROM lineitem
JOIN mins ON mins.l_partkey = lineitem.l_partkey
JOIN part ON lineitem.l_partkey = p_partkey
WHERE l_extendedprice = mins.cheapest_price
"""


# ---------------------------------------------------------------------------
# Q12 — small-quantity revenue by brand (TPC-H Q17 shape): lineitems
# whose quantity falls below 20% of their part's average quantity.
# BOTH sides use the decorrelated per-part-aggregate + equi-join form
# (the oracle since r8 — see the note at Q12_SQL); in the Spark plan —
# probe-side shuffle lands on the same l_partkey hash partitioning the
# aggregate just produced, and the brand dim is a broadcast.
# Determinism: ZERO float ops in the predicate. Quantities are
# integral, and 0.2 = 1/5, so "qty < 0.2 * (s/n)" is rewritten to the
# exact-int64 form "5 * qty * n < s" with qty cast to long and s kept
# as an integer sum — hash-stable under any engine/version arithmetic
# (the previous float form 0.2*(s/n) hash-mismatched on the driver's
# DuckDB while passing bit-exact locally). Magnitude check: qty <= ~50,
# n <= rows-per-part; 5*50*n overflows int64 only past ~7e16 rows per
# part. Revenue accumulates in exact int64 cents (floor(x*100+0.5) —
# identical double arithmetic both engines).
# ---------------------------------------------------------------------------


def q12_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("__qty"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("__cents"),
    )
    stats = li.groupBy("l_partkey").agg(
        F.sum("__qty").alias("__s"), F.count(F.lit(1)).alias("__n")
    )
    small = li.join(stats, "l_partkey").filter(
        F.lit(5) * F.col("__qty") * F.col("__n") < F.col("__s")
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        small.join(
            F.broadcast(part), small.l_partkey == part.p_partkey, "inner"
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("__cents").alias("revenue_cents"),
        )
    )


# Oracle output is CAST ... AS BIGINT on the sum (round 9): three
# rounds of hash-red on this entry had ONE cause — DuckDB types
# SUM(BIGINT) as HUGEINT (int128), and the driver's pandas
# canonicalizer mis-hashes int128 columns (VERDICT r8: the r8 probe
# run isolated it — a bare integer GROUP BY with a raw SUM was red
# while the identical query with cast outputs was green). Only
# {BIGINT, DOUBLE, VARCHAR, DATE/TIMESTAMP, BOOLEAN} output columns
# are driver-safe; tools/selfcheck.py now enforces this envelope.
Q12_SQL = """
WITH st AS (
    SELECT l_partkey,
           SUM(CAST(l_quantity AS BIGINT)) AS s,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY 1
)
SELECT p_brand,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN st ON st.l_partkey = l.l_partkey
JOIN part p ON p.p_partkey = l.l_partkey
WHERE 5 * CAST(l.l_quantity AS BIGINT) * st.n < st.s
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q13 — dominant-supplier semi-join chain (TPC-H Q20 shape): suppliers
# who carry more than 15% of some part's total lineitem quantity. Both
# sides decorrelate to two aggregates over the SAME
# (l_partkey[, l_suppkey]) grouping — in Spark the pair agg's shuffle
# already co-partitions the window that attaches the part total — then
# one semi join into the supplier dim. Since r8 the membership
# predicate is EXACT INT64 (0.15 = 3/20 -> "20*pair > 3*total" over
# long sums) and the oracle is a plain CTE join (no correlated HAVING,
# no IN): q12 proved correlated forms AND float row-membership
# arithmetic are the two driver-version fragility classes.
# ---------------------------------------------------------------------------


def q13_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        F.col("l_quantity").cast("long").alias("__qty"),
    )
    # ONE fact shuffle on l_partkey serves everything downstream:
    # HashPartitioning(partkey) satisfies the (partkey, suppkey) pair
    # aggregate's clustered distribution AND the whole-partition window
    # that attaches the part total — no pair/total re-shuffle, no join.
    pair = (
        li.repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("__qty").alias("__pair_qty"))
    )
    w_part = Window.partitionBy("l_partkey")
    dominant = (
        pair.withColumn("__part_qty", F.sum("__pair_qty").over(w_part))
        .filter(
            F.lit(20) * F.col("__pair_qty") > F.lit(3) * F.col("__part_qty")
        )
        .select("l_suppkey")
        .distinct()
    )
    supplier = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return supplier.join(
        dominant, supplier.s_suppkey == dominant.l_suppkey, "left_semi"
    )


Q13_SQL = """
WITH pair AS (
    SELECT l_partkey, l_suppkey,
           SUM(CAST(l_quantity AS BIGINT)) AS pq
    FROM lineitem GROUP BY 1, 2
), tot AS (
    SELECT l_partkey, SUM(pq) AS tq FROM pair GROUP BY 1
), dominant AS (
    SELECT DISTINCT l_suppkey
    FROM pair JOIN tot USING (l_partkey)
    WHERE 20 * pq > 3 * tq
)
SELECT s_suppkey, s_name
FROM supplier JOIN dominant ON s_suppkey = l_suppkey
"""


# ---------------------------------------------------------------------------
# U2 — full-outer reconciliation: per-key activity counts from two
# independent sources (events vs orders over the shared user/customer
# key space), FULL OUTER joined with a presence indicator — the
# source-reconciliation report every ingestion pipeline runs. Both
# inputs pre-aggregate to one row per key BEFORE the join, so the full
# outer join moves |keys| rows, never facts.
# ---------------------------------------------------------------------------


def u2_activity_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load(spark, sf_dir, "events")
        .groupBy(F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    od = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    # full outer can't broadcast; the default would be a SortMergeJoin.
    # Both sides arrive hash-partitioned on user_id from their groupBys,
    # so a shuffled-hash join adds NO exchange and skips both sorts —
    # the same pin d13's marking join uses.
    joined = ev.join(od.hint("SHUFFLE_HASH"), "user_id", "full_outer")
    return joined.select(
        "user_id",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.when(
            F.col("n_events").isNotNull() & F.col("n_orders").isNotNull(),
            F.lit("both"),
        )
        .when(F.col("n_events").isNotNull(), F.lit("events_only"))
        .otherwise(F.lit("orders_only"))
        .alias("presence"),
    )


U2_SQL = """
WITH ev AS (
    SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY 1
), od AS (
    SELECT o_custkey AS user_id, COUNT(*) AS n_orders FROM orders GROUP BY 1
)
SELECT user_id,
       COALESCE(n_events, 0) AS n_events,
       COALESCE(n_orders, 0) AS n_orders,
       CASE WHEN n_events IS NOT NULL AND n_orders IS NOT NULL THEN 'both'
            WHEN n_events IS NOT NULL THEN 'events_only'
            ELSE 'orders_only' END AS presence
FROM ev FULL OUTER JOIN od USING (user_id)
"""


# ---------------------------------------------------------------------------
# P2 — declarative constraint report (Deequ/dbt-test shape): every
# row-level expectation folds into ONE aggregate over ONE scan
# (violations are conditional sums; uniqueness rides the same agg via
# count-distinct); the referential check is one broadcast anti-join
# count. The mixed pass/fail outcome is intentional — range and
# accepted-set checks are tuned to actually catch rows.
# ---------------------------------------------------------------------------


def p2_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.quality import (
        constraint_report,
    )

    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    return constraint_report(
        orders,
        not_null=["o_custkey"],
        unique=["o_orderkey"],
        ranges={"o_totalprice": (0.0, 400_000.0)},
        in_set={"o_orderstatus": ["F", "O"]},
        fks=[("o_custkey", customer, "c_custkey")],
    )


P2_SQL = """
WITH base AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS checked,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS v1,
           CAST(SUM(CASE WHEN o_totalprice IS NOT NULL
                              AND (o_totalprice < 0.0
                                   OR o_totalprice > 400000.0)
                         THEN 1 ELSE 0 END) AS BIGINT) AS v2,
           CAST(SUM(CASE WHEN o_orderstatus IS NOT NULL
                              AND o_orderstatus NOT IN ('F', 'O')
                         THEN 1 ELSE 0 END) AS BIGINT) AS v3,
           CAST(SUM(CASE WHEN o_orderkey IS NOT NULL THEN 1 ELSE 0 END)
                - COUNT(DISTINCT o_orderkey) AS BIGINT) AS v4
    FROM orders
), fk AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS v FROM orders
    WHERE o_custkey IS NOT NULL
      AND o_custkey NOT IN (SELECT c_custkey FROM customer)
)
SELECT 'not_null(o_custkey)' AS check_name, v1 AS violations, checked,
       v1 = 0 AS passed FROM base
UNION ALL
SELECT 'range(o_totalprice)', v2, checked, v2 = 0 FROM base
UNION ALL
SELECT 'in_set(o_orderstatus)', v3, checked, v3 = 0 FROM base
UNION ALL
SELECT 'unique(o_orderkey)', v4, checked, v4 = 0 FROM base
UNION ALL
SELECT 'fk(o_custkey)', v, (SELECT checked FROM base), v = 0 FROM fk
"""


# ---------------------------------------------------------------------------
# Q14 — dormant high-balance customers (TPC-H Q22 shape): customers
# whose balance exceeds the positive-balance average and who placed NO
# order on/after the fixed dormancy cutoff — a scalar subquery
# (decorrelated to a one-row aggregate crossJoin(broadcast), the A4
# pattern) composed with an anti join against the pushed-down recent
# slice (the date filter reaches the orders scan).
# DECIMAL-exact sum for the average (order-independent), one final
# IEEE division.
# ---------------------------------------------------------------------------


Q14_CUTOFF = "2001-01-01"


def q14_dormant_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= Q14_CUTOFF)
        .select("o_custkey")
    )
    avg_pos = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("__avg")
        )
    )
    return (
        cust.crossJoin(F.broadcast(avg_pos))
        .filter(F.col("c_acctbal") > F.col("__avg"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2
            )
            .cast("double")
            .alias("total_balance"),
        )
    )


Q14_SQL = """
WITH avg_pos AS (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
           / COUNT(*) AS a
    FROM customer WHERE c_acctbal > 0
)
SELECT c_mktsegment AS segment,
       COUNT(*) AS n_customers,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
           AS total_balance
FROM customer, avg_pos
WHERE c_acctbal > a
  AND c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderdate >= TIMESTAMP '2001-01-01')
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q15 — TPC-H Q21-shaped "blame the sole late supplier": per supplier,
# how many multi-supplier orders were late ONLY because of them. The
# classic shape is a double correlated EXISTS/NOT EXISTS self-join on
# lineitem; the engine form (and the form-robust oracle, r8 doctrine)
# is two stacked aggregations over ONE fact pass — per (order,
# supplier) lateness, then per-order supplier/late counts — and a
# semi-join back, so the fact is scanned once and every shuffle keys
# on the order key it already carries. "Late" = shipped more than
# Q15_LATE_DAYS after the order date (the synthetic dates are
# independent, so the threshold sits at the distribution's right
# tail for Q21-like selectivity). Output is every blamed supplier
# (no LIMIT: a cutoff would tie-break on counts and hash-compare
# unstably; the report is small — O(suppliers)).
# ---------------------------------------------------------------------------

Q15_LATE_DAYS = 1800
_Q15_LATE_US = Q15_LATE_DAYS * 86_400 * 1_000_000


def q15_blame_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        F.unix_micros(F.col("l_shipdate").cast("timestamp")).alias(
            "__ship_us"
        ),
    )
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
            "__ord_us"
        ),
    )
    per_os = (
        li.join(orders, "l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("__ship_us") > F.col("__ord_us") + _Q15_LATE_US,
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).alias("__was_late")
        )
    )
    # per-order totals ride an order-partitioned window (r16, the d19
    # df-window pattern): the old per_o aggregate + join-back
    # referenced per_os twice, so the lineitem-orders join and the
    # (order, supplier) aggregate each executed twice. A window
    # partition holds one row per supplier of one order — bounded by
    # order width, no skew — and COUNT/SUM over the full partition
    # are the identical integers the join carried.
    w_o = Window.partitionBy("l_orderkey")
    blamed = (
        per_os.withColumn("__n_s", F.count(F.lit(1)).over(w_o))
        .withColumn("__n_late", F.sum("__was_late").over(w_o))
        .filter(
            (F.col("__was_late") == 1)
            & (F.col("__n_s") >= 2)
            & (F.col("__n_late") == 1)
        )
    )
    supplier = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    return (
        blamed.join(F.broadcast(supplier), "l_suppkey")
        .groupBy(F.col("s_name").alias("supplier_name"))
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )


Q15_SQL = f"""
WITH j AS (
    SELECT l.l_orderkey AS ok, l.l_suppkey AS sk,
           CASE WHEN epoch_us(l.l_shipdate)
                     > epoch_us(o.o_orderdate) + {_Q15_LATE_US}
                THEN 1 ELSE 0 END AS late
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), per_os AS (
    SELECT ok, sk, MAX(late) AS was_late FROM j GROUP BY 1, 2
), per_o AS (
    SELECT ok, COUNT(*) AS n_s, SUM(was_late) AS n_late
    FROM per_os GROUP BY 1
)
SELECT s.s_name AS supplier_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM per_os p
JOIN per_o q USING (ok)
JOIN supplier s ON s.s_suppkey = p.sk
WHERE p.was_late = 1 AND q.n_s >= 2 AND q.n_late = 1
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# P3 — k-anonymity / l-diversity audit (operators/quality.py
# k_anonymity_report): the governance counterpart of the t9 PII scrub.
# scrub_pii removes DIRECT identifiers; this measures the INDIRECT
# ones — per quasi-identifier group (nation x market segment), how
# many customers share the combination (the group's k) and how many
# distinct sensitive values it holds (the l; account balance at $1000
# grain). One map-combined groupBy; scales with group count.
# ---------------------------------------------------------------------------

P3_K = 5
P3_L = 3


def p3_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.quality import (
        k_anonymity_report,
    )

    customers = load(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_bucket"),
    )
    return k_anonymity_report(
        customers,
        ["c_nationkey", "c_mktsegment"],
        "bal_bucket",
        k=P3_K,
        l_div=P3_L,
    )


P3_SQL = f"""
SELECT c_nationkey, c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS group_n,
       CAST(COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000) AS BIGINT))
            AS BIGINT) AS l_distinct,
       COUNT(*) >= {P3_K} AS meets_k,
       COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000) AS BIGINT)) >= {P3_L}
           AS meets_l
FROM customer
GROUP BY 1, 2
"""


RELATIONAL_QUERIES = {
    "q12_small_quantity_revenue": q12_small_quantity_revenue,
    "q13_dominant_suppliers": q13_dominant_suppliers,
    "u2_activity_reconciliation": u2_activity_reconciliation,
    "p2_constraint_report": p2_constraint_report,
    "p3_k_anonymity": p3_k_anonymity,
    "q14_dormant_high_balance": q14_dormant_high_balance,
    "q15_blame_suppliers": q15_blame_suppliers,
    "q1_supplier_stats": q1_supplier_stats,
    "q2_status_priority_delays": q2_status_priority_delays,
    "q3_busiest_customers": q3_busiest_customers,
    "q4_weekly_orders": q4_weekly_orders,
    "q5_measure_averages": q5_measure_averages,
    "q6_dow_events": q6_dow_events,
    "q7_price_buckets": q7_price_buckets,
    "q8_problematic_segments": q8_problematic_segments,
    "q9_part_attributes": q9_part_attributes,
    "l1_customer_balance_norm": l1_customer_balance_norm,
    "l2_user_top_event": l2_user_top_event,
    "l3_flights_lookup": l3_flights_lookup,
    "f1_hhmm_histogram": f1_hhmm_histogram,
    "j1_enrich_orders": j1_enrich_orders,
    "j3_dedup_supplier_join": j3_dedup_supplier_join,
    "j7_geo_radius": j7_geo_radius,
    "j8_semi_anti_customers": j8_semi_anti_customers,
    "k1_salted_counts": k1_salted_counts,
    "k2_skewed_brand_counts": k2_skewed_brand_counts,
    "i1_incremental_priority_revenue": i1_incremental_priority_revenue,
    "o3_topk_orders": o3_topk_orders,
    "a6_distinct_event_types": a6_distinct_event_types,
    "w2_top3_per_priority": w2_top3_per_priority,
    "s2_windowed_distinct_users": s2_windowed_distinct_users,
    "a7_price_percentiles": a7_price_percentiles,
    "s3_sliding_window_users": s3_sliding_window_users,
    "q11_cheapest_suppliers": q11_cheapest_suppliers,
}

RELATIONAL_ORACLES = {
    "q1_supplier_stats": Q1_SQL,
    "q2_status_priority_delays": Q2_SQL,
    "q3_busiest_customers": Q3_SQL,
    "q4_weekly_orders": Q4_SQL,
    "q5_measure_averages": Q5_SQL,
    "q6_dow_events": Q6_SQL,
    "q7_price_buckets": Q7_SQL,
    "q8_problematic_segments": Q8_SQL,
    "q9_part_attributes": Q9_SQL,
    "l1_customer_balance_norm": L1_SQL,
    "l2_user_top_event": L2_SQL,
    "l3_flights_lookup": L3_SQL,
    "f1_hhmm_histogram": F1_SQL,
    "j1_enrich_orders": J1_SQL,
    "j3_dedup_supplier_join": J3_SQL,
    "j7_geo_radius": J7_SQL,
    "j8_semi_anti_customers": J8_SQL,
    "k1_salted_counts": K1_SQL,
    "k2_skewed_brand_counts": K2_SQL,
    "i1_incremental_priority_revenue": I1_SQL,
    "o3_topk_orders": O3_SQL,
    "a6_distinct_event_types": A6_SQL,
    "w2_top3_per_priority": W2_SQL,
    "s2_windowed_distinct_users": S2_SQL,
    "a7_price_percentiles": A7_SQL,
    "s3_sliding_window_users": S3_SQL,
    "q11_cheapest_suppliers": Q11_SQL,
    "q12_small_quantity_revenue": Q12_SQL,
    "q13_dominant_suppliers": Q13_SQL,
    "u2_activity_reconciliation": U2_SQL,
    "p2_constraint_report": P2_SQL,
    "p3_k_anonymity": P3_SQL,
    "q14_dormant_high_balance": Q14_SQL,
    "q15_blame_suppliers": Q15_SQL,
}


# I10 — mergeable k-anonymity: the governance audit under the ingest
# contract. State = counts at (QI, sensitive-bucket) grain — additive,
# so an arriving batch folds with one full-outer sum and the report
# re-derives in O(state); the released-data audit stays current
# without rescanning the corpus. 80/20 customer split folded must
# reproduce the from-scratch p3 report bit-for-bit (same oracle).


def i10_kanon_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.quality import (
        k_anonymity_fold,
        k_anonymity_from_state,
        k_anonymity_state,
    )

    customers = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_bucket"),
    )
    qi = ["c_nationkey", "c_mktsegment"]
    base = k_anonymity_state(
        customers.filter(F.col("c_custkey") % 5 != 0), qi, "bal_bucket"
    )
    delta = k_anonymity_state(
        customers.filter(F.col("c_custkey") % 5 == 0), qi, "bal_bucket"
    )
    return k_anonymity_from_state(
        k_anonymity_fold(base, delta, qi, "bal_bucket"),
        qi,
        "bal_bucket",
        k=P3_K,
        l_div=P3_L,
    )


RELATIONAL_QUERIES["i10_kanon_delta"] = i10_kanon_delta
RELATIONAL_ORACLES["i10_kanon_delta"] = P3_SQL


# ---------------------------------------------------------------------------
# Q16 — TPC-H Q18-shaped large-volume customers: orders whose total
# lineitem quantity clears a threshold, attributed to their customers
# and top-k'd by order value. The classic "HAVING over a groupBy
# feeding a join" decorrelation: the inner agg groups the fact on the
# key it already carries (l_orderkey — no extra exchange beyond the
# one agg shuffle), the survivors are a tiny fraction, so the
# orders/customer attachment broadcasts THEM, not the fact. Quantity
# sums are integer-valued doubles (< 2^53), so SUM is
# order-insensitive and exact in both engines; top-k is
# TakeOrderedAndProject with full deterministic tie-breaks.
# ---------------------------------------------------------------------------

Q16_MIN_QTY = 150
Q16_TOP_K = 100


def q16_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.core import top_k

    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > Q16_MIN_QTY)
    )
    joined = (
        orders.join(
            F.broadcast(big), orders["o_orderkey"] == big["l_orderkey"]
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias(
                "orderdate_us"
            ),
            "o_totalprice",
            "sum_qty",
        )
    )
    return top_k(
        joined,
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        Q16_TOP_K,
    )


Q16_SQL = f"""
WITH big AS (
    SELECT l_orderkey, SUM(l_quantity) AS sum_qty
    FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > {Q16_MIN_QTY}
)
SELECT c_name, c_custkey, o_orderkey,
       epoch_us(o_orderdate) AS orderdate_us,
       o_totalprice, sum_qty
FROM orders
JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT {Q16_TOP_K}
"""

RELATIONAL_QUERIES["q16_large_volume_customers"] = q16_large_volume_customers
RELATIONAL_ORACLES["q16_large_volume_customers"] = Q16_SQL


# ---------------------------------------------------------------------------
# Q17 — TPC-H Q7-shaped bilateral trade flows: revenue shipped between
# two chosen nations, both directions, by year. The canonical "fact
# joined through two different dimension paths" shape: the lineitem
# side resolves supplier -> nation, the orders side resolves
# customer -> nation, and the (supp_nation, cust_nation) pair filter
# keeps the two directed flows. Physical posture: every dimension
# (supplier, customer, nation, and the year-filtered orders' slice is
# NOT small — orders joins on the orderkey the fact carries, one
# shuffle pair; the three genuine dims broadcast). The pair filter is
# pushed into the broadcast nation joins as disjunctive membership
# (n_name IN (A, B) on both paths), so non-participating nations prune
# BEFORE the fact join, and the exact pair condition
# (supp <> cust nation) filters after.
# ---------------------------------------------------------------------------

Q17_NATION_A = "NATION_3"
Q17_NATION_B = "NATION_7"


def q17_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    pair = nation.filter(
        F.col("n_name").isin(Q17_NATION_A, Q17_NATION_B)
    )
    supp_n = supp.join(
        F.broadcast(pair), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust_n = cust.join(
        F.broadcast(pair.select(
            F.col("n_nationkey").alias("cn_key"),
            F.col("n_name").alias("cust_nation"),
        )),
        F.col("c_nationkey") == F.col("cn_key"),
    ).select("c_custkey", "cust_nation")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        li.join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_n), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(revenue).cast("double").alias("revenue"),
        )
    )


Q17_SQL = f"""
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
    AND sn.n_name IN ('{Q17_NATION_A}', '{Q17_NATION_B}')
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
    AND cn.n_name IN ('{Q17_NATION_A}', '{Q17_NATION_B}')
WHERE sn.n_name <> cn.n_name
GROUP BY 1, 2, 3
"""

RELATIONAL_QUERIES["q17_trade_flows"] = q17_trade_flows
RELATIONAL_ORACLES["q17_trade_flows"] = Q17_SQL


# ---------------------------------------------------------------------------
# U3 — EXCEPT ALL multiset difference: order priorities a customer
# holds MORE of than the corpus-median customer... kept simpler and
# honest: the multiset of (custkey, priority) order slots minus ONE
# slot per (custkey, priority) — i.e. "every repeat beyond the first"
# — via Spark's exceptAll against the distinct set. u1 pinned the
# DISTINCT set-op semantics (INTERSECT/EXCEPT); this pins the ALL
# (bag) semantics, whose row multiplicities engines get wrong when
# they rewrite through joins. Aggregated to O(priorities) counts so
# the output is corpus-size-independent.
# ---------------------------------------------------------------------------


def u3_repeat_priority_slots(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    slots = orders.select(
        "o_custkey", F.col("o_orderpriority").alias("priority")
    )
    repeats = slots.exceptAll(slots.distinct())
    return repeats.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n_repeat_slots"),
        F.countDistinct("o_custkey").cast("long").alias("n_customers"),
    )


U3_SQL = """
WITH slots AS (
    SELECT o_custkey, o_orderpriority AS priority FROM orders
), repeats AS (
    SELECT o_custkey, priority FROM slots
    EXCEPT ALL
    SELECT DISTINCT o_custkey, priority FROM slots
)
SELECT priority,
       CAST(COUNT(*) AS BIGINT) AS n_repeat_slots,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
FROM repeats GROUP BY 1
"""

RELATIONAL_QUERIES["u3_repeat_priority_slots"] = u3_repeat_priority_slots
RELATIONAL_ORACLES["u3_repeat_priority_slots"] = U3_SQL


# ---------------------------------------------------------------------------
# I18 — incremental top-k (o3's maintenance face): top-k is a
# SEMILATTICE fold — top_k(base's top-k UNION delta's top-k) equals
# top-k of the union — so a serving layer keeps an O(k) state per
# feed and folds candidate lists instead of rescanning history (the
# fold class behind every "leaderboard" sink). Ties break on the key,
# so the folded set is deterministic; oracle is o3's.
# ---------------------------------------------------------------------------


def i18_topk_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_flight_analytics_spark.operators.core import top_k

    sel = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_totalprice").alias("totalprice"),
    )
    spec = [F.col("totalprice").desc(), F.col("orderkey").asc()]
    base = top_k(sel.filter(F.col("orderkey") % 5 != 0), spec, 10)
    delta = top_k(sel.filter(F.col("orderkey") % 5 == 0), spec, 10)
    return top_k(base.unionByName(delta), spec, 10)


RELATIONAL_QUERIES["i18_topk_delta"] = i18_topk_delta
RELATIONAL_ORACLES["i18_topk_delta"] = O3_SQL


# ---------------------------------------------------------------------------
# Q18 — TPC-H Q15-shaped top supplier per quarter WITH TIES: the
# rank()==1 face (every supplier achieving the quarter's max revenue
# survives) — deliberately distinct from w2/o3's row_number/limit
# top-k, which break ties; Q15's "WHERE s_revenue = (SELECT MAX...)"
# is exactly rank()==1, decorrelated. Revenue is per (quarter,
# supplier) in exact int64 cents, so the max-equality decision is
# integer — no float boundary can disagree cross-engine. One agg
# shuffle + one window over the quarter-grain aggregate (O(quarters x
# suppliers) rows, already tiny) + a broadcast name attach.
# ---------------------------------------------------------------------------


def q18_top_suppliers_with_ties(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
        + F.lit(0.5)
    ).cast("long")
    per = li.groupBy(
        F.year("l_shipdate").alias("yr"),
        F.quarter("l_shipdate").alias("qtr"),
        "l_suppkey",
    ).agg(F.sum(cents).alias("revenue_cents"))
    w = Window.partitionBy("yr", "qtr").orderBy(
        F.col("revenue_cents").desc()
    )
    return (
        per.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") == 1)
        .drop("rnk")
        .join(
            F.broadcast(supp.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "yr",
            "qtr",
            F.col("l_suppkey").alias("suppkey"),
            "s_name",
            "revenue_cents",
        )
    )


Q18_SQL = """
WITH per AS (
    SELECT CAST(year(l_shipdate) AS INTEGER) AS yr,
           CAST(quarter(l_shipdate) AS INTEGER) AS qtr,
           l_suppkey,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100
                               + 0.5) AS BIGINT)) AS BIGINT)
               AS revenue_cents
    FROM lineitem GROUP BY 1, 2, 3
), ranked AS (
    SELECT *, RANK() OVER (PARTITION BY yr, qtr
                           ORDER BY revenue_cents DESC) AS rnk
    FROM per
)
SELECT yr, qtr, l_suppkey AS suppkey, s_name, revenue_cents
FROM ranked JOIN supplier ON l_suppkey = s_suppkey
WHERE rnk = 1
"""

RELATIONAL_QUERIES["q18_top_suppliers_with_ties"] = (
    q18_top_suppliers_with_ties
)
RELATIONAL_ORACLES["q18_top_suppliers_with_ties"] = Q18_SQL
