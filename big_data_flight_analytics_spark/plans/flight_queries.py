"""The reference's nine batch queries + lookup pipelines, re-expressed
as composable functions over conforming DataFrames.

Parity notes:
- semantics (grouping keys, HAVING floors, conditional-count null
  handling, tie-breaks, when/otherwise guards) follow the reference
  exactly — citations per function;
- physical strategy is Spark-first: global statistics attach via
  broadcast cross join instead of the reference's unpartitioned window
  (batch_process.py:65-69) or driver collect() (batch_process.py:188-192,
  aircrafts_lookup_to_kafka.py:47-53) — same results, one plan, no
  single-partition funnel, no driver round-trip;
- every dimension join broadcasts the dim side.

Inputs are DataFrames (not paths) so the same queries run on HDFS
parquet, local fixtures, or testdata-shaped frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from big_data_flight_analytics_spark.constants import (
    DELAY_THRESHOLD,
    DISTANCE_BUCKET_EDGES,
    MIN_FLIGHTS_THRESHOLD,
    PROBLEMATIC_SCORE,
)
from big_data_flight_analytics_spark.functions.scalar import hhmm_to_str
from big_data_flight_analytics_spark.operators.core import add_global_stats, count_if
from big_data_flight_analytics_spark.operators.joins import dedup_dim_join
from big_data_flight_analytics_spark.schemas import FLIGHTS_RAW_SCHEMA


# --- dimension enrichment (shared.py:28-39) --------------------------------

def join_airlines(df: DataFrame, airlines: DataFrame) -> DataFrame:
    """Left join on AirlineCode == IATA; adds AirlineName (shared.py:28-32)."""
    dim = airlines.select("IATA", F.col("Name").alias("AirlineName"))
    joined = df.join(F.broadcast(dim), df["AirlineCode"] == dim["IATA"], "left")
    return joined.drop(dim["IATA"])


def join_airports(df: DataFrame, airports: DataFrame) -> DataFrame:
    """Left join on AirportCode == iata; adds lat/lon/AirportName
    (shared.py:34-39)."""
    dim = airports.select(
        "iata", "latitude", "longitude", F.col("name").alias("AirportName")
    )
    joined = df.join(F.broadcast(dim), df["AirportCode"] == dim["iata"], "left")
    return joined.drop(dim["iata"])


# --- Q1 airline stats (batch_process.py:10-31) -----------------------------

def airline_stats(
    flights: DataFrame, airlines: DataFrame,
    min_flights: int = MIN_FLIGHTS_THRESHOLD,
) -> DataFrame:
    agg = (
        flights.groupBy(F.col("IATA").alias("AirlineCode"))
        .agg(
            F.avg(
                F.abs(F.col("ActualElapsedTime") - F.col("CRSElapsedTime"))
            ).alias("AvgErrorMinutes"),
            F.count(F.lit(1)).alias("FlightCount"),
            count_if(F.col("ArrDelayMinutes") > DELAY_THRESHOLD, "DelayedFlightCount"),
        )
        .filter(F.col("FlightCount") > min_flights)
        .withColumn(
            "OnTimePerformance",
            (1.0 - (F.col("DelayedFlightCount") / F.col("FlightCount"))) * 100,
        )
        .drop("FlightCount", "DelayedFlightCount")
        .orderBy(F.col("OnTimePerformance").desc())
    )
    return join_airlines(agg, airlines)


# --- Q2 airport departure delays (batch_process.py:33-51) ------------------

def airport_departure_delays(
    flights: DataFrame, airports: DataFrame,
    min_flights: int = MIN_FLIGHTS_THRESHOLD,
) -> DataFrame:
    agg = (
        flights.groupBy("Origin", "OriginCityName", "OriginStateName")
        .agg(
            F.avg(F.col("DepDelayMinutes")).alias("AvgDepDelayMinutes"),
            F.count(F.lit(1)).alias("FlightCount"),
        )
        .filter(F.col("FlightCount") > min_flights)
        .drop("FlightCount")
        .orderBy(F.col("AvgDepDelayMinutes").desc())
        .withColumnRenamed("Origin", "AirportCode")
    )
    return join_airports(agg, airports)


# --- Q3 busiest airports (batch_process.py:53-93) --------------------------

def busiest_airports(
    flights: DataFrame, airports: DataFrame, use_window: bool = False,
    min_flights: int = MIN_FLIGHTS_THRESHOLD,
) -> DataFrame:
    """Busyness/share scoring; exact when/otherwise guards of
    batch_process.py:70-79 (max==min -> 100.0; total<=0 -> 0.0).

    ``use_window=True`` reproduces the reference's unpartitioned-window
    physical shape for equivalence testing; the default broadcast
    cross-join computes identical values without the one-partition
    shuffle.
    """
    return join_airports(
        _scored_airports(flights, use_window, min_flights), airports
    )


def _scored_airports(
    flights: DataFrame, use_window: bool = False,
    min_flights: int = MIN_FLIGHTS_THRESHOLD,
) -> DataFrame:
    counts = (
        flights.groupBy("Origin", "OriginCityName", "OriginStateName")
        .agg(F.count(F.col("Origin")).alias("FlightCount"))
        .filter(F.col("FlightCount") > min_flights)
        .withColumnRenamed("Origin", "AirportCode")
        .withColumnRenamed("OriginCityName", "CityName")
        .withColumnRenamed("OriginStateName", "StateName")
    )
    counts = add_global_stats(
        counts,
        {
            "_min": F.min("FlightCount"),
            "_max": F.max("FlightCount"),
            "_total": F.sum("FlightCount"),
        },
        use_window=use_window,
    )
    scored = (
        counts.withColumn(
            "BusynessScorePercent",
            F.when(F.col("_max") == F.col("_min"), 100.0).otherwise(
                (F.col("FlightCount") - F.col("_min"))
                / (F.col("_max") - F.col("_min"))
                * 100
            ),
        )
        .withColumn(
            "ShareOfTotalFlightsPercent",
            F.when(
                F.col("_total") > 0, F.col("FlightCount") / F.col("_total") * 100
            ).otherwise(0.0),
        )
        .drop("_min", "_max", "_total")
        .orderBy(F.col("BusynessScorePercent").desc())
    )
    return scored


def top_busiest_airports(
    flights: DataFrame, airports: DataFrame, k: int = 10,
    min_flights: int = MIN_FLIGHTS_THRESHOLD,
) -> DataFrame:
    """The curated top-k slice written to the lake and shipped to the
    streaming geo lookup (batch_process.py:85-91) — the batch->stream
    handoff of the lambda architecture.

    The reference limits AFTER the metadata join, where Spark's join
    does not preserve the upstream sort — which k rows survive is
    plan-dependent (observed returning non-top rows). We implement the
    evident intent deterministically: TakeOrderedAndProject on the
    scored frame (score desc, code asc tie-break) BEFORE the broadcast
    dim join — which also enriches only k rows instead of every
    airport."""
    top = (
        _scored_airports(flights, min_flights=min_flights)
        .orderBy(
            F.col("BusynessScorePercent").desc(), F.col("AirportCode").asc()
        )
        .limit(k)
    )
    return join_airports(top, airports)


# --- Q4 busiest weeks (batch_process.py:95-113) ----------------------------

def busiest_weeks(
    flights: DataFrame, min_flights: int = MIN_FLIGHTS_THRESHOLD
) -> DataFrame:
    return (
        flights.groupBy(
            F.col("Month"), F.weekofyear(F.col("FlightDate")).alias("WeekOfYear")
        )
        .agg(
            F.count(F.lit(1)).alias("FlightCount"),
            count_if(F.col("ArrDelayMinutes") > DELAY_THRESHOLD, "DelayedFlightCount"),
        )
        .withColumn(
            "DelayedFlightPercent",
            F.when(
                F.col("FlightCount") > 0,
                F.col("DelayedFlightCount") / F.col("FlightCount") * 100,
            ).otherwise(None),
        )
        .filter(F.col("FlightCount") > min_flights)
        .orderBy(F.col("FlightCount").desc())
    )


# --- Q5 delay reasons (batch_process.py:115-137) ---------------------------

DELAY_REASONS = [
    ("CarrierDelay", "AvgCarrierDelayMinutes"),
    ("WeatherDelay", "AvgWeatherDelayMinutes"),
    ("NASDelay", "AvgNASDelayMinutes"),
    ("SecurityDelay", "AvgSecurityDelayMinutes"),
    ("LateAircraftDelay", "AvgLateAircraftDelayMinutes"),
]


def delay_reasons(flights: DataFrame) -> DataFrame:
    agg = flights.agg(
        *[F.avg(src).alias(alias) for src, alias in DELAY_REASONS]
    )
    pairs = ", ".join(f"'{src}', {alias}" for src, alias in DELAY_REASONS)
    return agg.select(
        F.expr(f"stack({len(DELAY_REASONS)}, {pairs}) as (DelayReason, AvgDelayMinutes)")
    )


# --- Q6 cancellations by day-of-week (batch_process.py:139-154) ------------

def days_with_cancellations(
    flights: DataFrame, min_flights: int = MIN_FLIGHTS_THRESHOLD
) -> DataFrame:
    return (
        flights.groupBy("DayOfWeek")
        .agg(
            F.count(F.lit(1)).alias("FlightCount"),
            count_if(F.col("Cancelled") == 1, "CancellationCount"),
        )
        .filter(F.col("FlightCount") > min_flights)
        .withColumn(
            "CancellationPercent",
            F.when(
                F.col("FlightCount") > 0,
                F.col("CancellationCount") / F.col("FlightCount") * 100,
            ).otherwise(None),
        )
        .orderBy(F.col("CancellationPercent").desc())
    )


# --- Q7 distance-delay correlation (batch_process.py:156-182) --------------

def distance_delay_correlation(
    flights: DataFrame, min_flights: int = MIN_FLIGHTS_THRESHOLD
) -> DataFrame:
    """Right-exclusive distance buckets (ml.Bucketizer semantics,
    batch_process.py:160-170) as a native when-chain: DistanceCategory
    is the numeric bucket index (double, as Bucketizer emits),
    DistanceBucket the label, last bucket open-ended '2500+'."""
    splits = DISTANCE_BUCKET_EDGES
    labels = [
        f"{int(splits[i])}-{int(splits[i + 1])}" for i in range(len(splits) - 2)
    ]
    labels.append(f"{int(splits[-2])}+")

    d = F.col("Distance")
    cat = None
    for i in range(len(labels)):
        lo, hi = splits[i], splits[i + 1]
        cond = (d >= lo) if hi == float("inf") else (d >= lo) & (d < hi)
        cat = F.when(cond, float(i)) if cat is None else cat.when(cond, float(i))
    label = F.coalesce(
        *[
            F.when(F.col("DistanceCategory") == i, lab)
            for i, lab in enumerate(labels)
        ]
    )

    bucketed = flights.withColumn("DistanceCategory", cat).withColumn(
        "DistanceBucket", label
    )
    return (
        bucketed.groupBy("DistanceCategory", "DistanceBucket")
        .agg(
            count_if(F.col("ArrDelayMinutes") > DELAY_THRESHOLD, "DelayedFlightCount"),
            F.avg("Distance").alias("AvgDistance"),
            F.count(F.lit(1)).alias("FlightCount"),
        )
        .filter(F.col("FlightCount") > min_flights)
        .withColumn(
            "ProbabilityOfDelay", F.col("DelayedFlightCount") / F.col("FlightCount")
        )
        .drop("DelayedFlightCount", "FlightCount")
        .orderBy("DistanceCategory")
    )


# --- Q8 problematic routes (batch_process.py:184-210) ----------------------

def problematic_routes(
    flights: DataFrame, min_flights: int = MIN_FLIGHTS_THRESHOLD
) -> DataFrame:
    """Route delay rate vs global rate. The reference collect()s the
    global scalar to the driver (batch_process.py:188-192); here it
    stays in-plan via broadcast cross join — identical arithmetic
    (x100 percents, total>0 / overall>0 guards, >= 1.2 floor)."""
    glob = flights.agg(
        F.count(F.lit(1)).alias("_total"),
        count_if(F.col("ArrDelayMinutes") > DELAY_THRESHOLD, "_delayed"),
    ).select(
        F.when(
            F.col("_total") > 0, F.col("_delayed") / F.col("_total") * 100
        ).otherwise(0.0).alias("_overall_pct")
    )

    route_stats = (
        flights.groupBy(
            F.col("Origin").alias("OriginCode"),
            F.col("Dest").alias("DestCode"),
            F.col("OriginCityName"),
            F.col("DestCityName"),
        )
        .agg(
            F.count(F.lit(1)).alias("FlightCount"),
            count_if(F.col("ArrDelayMinutes") > DELAY_THRESHOLD, "DelayedFlightCount"),
        )
        .filter(F.col("FlightCount") > min_flights)
    )

    route_pct = F.col("DelayedFlightCount") / F.col("FlightCount") * 100
    return (
        route_stats.crossJoin(F.broadcast(glob))
        .withColumn(
            "Route", F.concat(F.col("OriginCode"), F.lit("-"), F.col("DestCode"))
        )
        .withColumn(
            "ProblematicScore",
            F.when(
                F.col("_overall_pct") > 0, route_pct / F.col("_overall_pct")
            ).otherwise(F.lit(1.0)),
        )
        .filter(F.col("ProblematicScore") >= PROBLEMATIC_SCORE)
        .orderBy(F.col("ProblematicScore").desc())
        .select(
            "Route", "OriginCode", "DestCode", "OriginCityName", "DestCityName",
            "FlightCount", "ProblematicScore",
        )
    )


# --- Q9 diverted flights by airport (batch_process.py:212-235) -------------

DIV_COLS = ["Div1Airport", "Div2Airport", "Div3Airport", "Div4Airport", "Div5Airport"]


def diverted_flights_by_airport(
    flights: DataFrame, airports: DataFrame, min_flights: int = MIN_FLIGHTS_THRESHOLD
) -> DataFrame:
    stack_expr = ", ".join(f"'{c}', {c}" for c in DIV_COLS)
    unpivoted = (
        flights.filter(F.col("Diverted") == 1)
        .select(F.expr(f"stack({len(DIV_COLS)}, {stack_expr}) as (_src, AirportCode)"))
        .select("AirportCode")
    )
    counts = (
        unpivoted.filter(
            F.col("AirportCode").isNotNull() & (F.trim(F.col("AirportCode")) != "")
        )
        .groupBy("AirportCode")
        .agg(F.count(F.lit(1)).alias("DivertedFlightCount"))
        .orderBy(F.col("DivertedFlightCount").desc())
        .filter(F.col("DivertedFlightCount") > min_flights)
    )
    return join_airports(counts, airports)


# --- L1 aircrafts lookup (aircrafts_lookup_to_kafka.py:20-60) --------------

def aircrafts_lookup(
    flights: DataFrame,
    aircrafts: DataFrame,
    normalize_delay: bool = True,
    min_flights: int = 0,
) -> DataFrame:
    agg = (
        flights.filter(
            F.col("Tail_Number").isNotNull() & (F.col("Tail_Number") != "")
        )
        .groupBy(F.col("Tail_Number").alias("TailNumber"))
        .agg(
            F.avg(F.col("CarrierDelay")).alias("AvgCarrierDelayMinutes"),
            F.count(F.lit(1)).alias("FlightCount"),
        )
        .withColumn(
            "AvgCarrierDelayMinutes", F.round(F.col("AvgCarrierDelayMinutes"), 2)
        )
    )
    dim = aircrafts.select(
        F.col("registration").alias("TailNumber"), F.col("icao24")
    )
    result = (
        dedup_dim_join(agg, dim, "TailNumber", how="inner")
        .select("icao24", "AvgCarrierDelayMinutes", "FlightCount")
        .filter(F.col("FlightCount") >= min_flights)
        .orderBy("icao24")
    )
    if normalize_delay:
        # reference collect()s min/max (lines 47-53, with the `or 0`
        # null-coalesce); in-plan equivalent with the same guards
        result = add_global_stats(
            result,
            {
                "_min_d": F.coalesce(F.min("AvgCarrierDelayMinutes"), F.lit(0.0)),
                "_max_d": F.coalesce(F.max("AvgCarrierDelayMinutes"), F.lit(0.0)),
            },
        )
        span = F.when(
            F.col("_max_d") > F.col("_min_d"), F.col("_max_d") - F.col("_min_d")
        ).otherwise(F.lit(1.0))
        result = result.withColumn(
            "DelayScore01",
            F.round((F.col("AvgCarrierDelayMinutes") - F.col("_min_d")) / span, 4),
        ).drop("_min_d", "_max_d")
    return result


# --- L2 flights lookup (flights_lookup_to_kafka.py:20-55) ------------------

def flights_lookup(flights: DataFrame, airlines: DataFrame) -> DataFrame:
    airlines_f = (
        airlines.withColumnRenamed("Name", "AirlineName")
        .filter(F.length(F.trim(F.coalesce(F.col("ICAO"), F.lit("")))) > 0)
    )
    df = (
        flights.join(
            F.broadcast(airlines_f), flights["IATA"] == airlines_f["IATA"], "inner"
        )
        .withColumn(
            "callsign",
            F.concat(
                F.col("ICAO"),
                F.col("Flight_Number_Operating_Airline").cast("string"),
            ),
        )
        .drop("IATA", "ICAO")
        .filter(F.length(F.trim(F.col("callsign"))) > 0)
    )

    arr_counts = df.groupBy("callsign", "CRSArrTime").agg(
        F.count(F.lit(1)).alias("cnt"), F.first("AirlineName").alias("AirlineName")
    )
    dep_counts = df.groupBy("callsign", "CRSDepTime").agg(
        F.count(F.lit(1)).alias("cnt")
    )

    w_arr = Window.partitionBy("callsign").orderBy(F.desc("cnt"), F.asc("CRSArrTime"))
    w_dep = Window.partitionBy("callsign").orderBy(F.desc("cnt"), F.asc("CRSDepTime"))

    arr_mode = (
        arr_counts.withColumn("rn", F.row_number().over(w_arr))
        .filter(F.col("rn") == 1)
        .select("callsign", F.col("CRSArrTime").alias("mode_arr"), "AirlineName")
    )
    dep_mode = (
        dep_counts.withColumn("rn", F.row_number().over(w_dep))
        .filter(F.col("rn") == 1)
        .select("callsign", F.col("CRSDepTime").alias("mode_dep"))
    )

    return (
        # both mode frames are tiny by construction (≤1 row per
        # callsign); broadcasting the narrower side drops the catalog's
        # only SortMergeJoin
        arr_mode.join(F.broadcast(dep_mode), "callsign")
        .withColumn("CRSArrTime", hhmm_to_str(F.col("mode_arr")))
        .withColumn("CRSDepTime", hhmm_to_str(F.col("mode_dep")))
        .select("callsign", "AirlineName", "CRSArrTime", "CRSDepTime")
        .orderBy("callsign")
    )


# --- T1 ETL: raw CSV -> curated parquet (transform.py:46-77) ---------------

KEEP_COLUMNS = [f.name for f in FLIGHTS_RAW_SCHEMA.fields]


def transform_raw(df: DataFrame) -> DataFrame:
    """Raw CSV frame -> curated 34-column frame + file_year.

    One pass; the caller writes with ``partition_by=["file_year"]``
    (sources.writers.write_parquet) instead of the reference's
    driver-side per-year loop + coalesce(1) (transform.py:58-70).
    """
    stripped = [c.strip() for c in df.columns]
    df = df.toDF(*stripped)
    df = df.withColumn(
        "file_year",
        F.regexp_extract(F.input_file_name(), r"Flights_(\d{4})", 1),
    )
    return (
        df.select(*KEEP_COLUMNS, "file_year")
        .withColumnRenamed("IATA_Code_Operating_Airline", "IATA")
    )


def run_etl(df: DataFrame, out_path: str, single_file: bool = False) -> None:
    from big_data_flight_analytics_spark.sources.writers import write_parquet

    curated = transform_raw(df).sortWithinPartitions("FlightDate")
    write_parquet(
        curated, out_path, partition_by=["file_year"], single_file=single_file
    )
