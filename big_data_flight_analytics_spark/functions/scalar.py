"""Core scalar expressions: geo, time codecs, normalization, callsign rules."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from big_data_flight_analytics_spark.constants import EARTH_RADIUS_KM


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km, closed-form column expression.

    Semantics of the reference's Java implementation
    (reference: AirportAircraftCountStream.java:79-88) as a native
    expression: runs inside whole-stage codegen, no UDF, usable in join
    conditions and streaming filters.
    """
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    sin_dlat = F.sin(dlat / 2)
    sin_dlon = F.sin(dlon / 2)
    a = (
        sin_dlat * sin_dlat
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * sin_dlon * sin_dlon
    )
    # clamp: float error can push a infinitesimally above 1 for
    # near-antipodal points; sqrt of the negative would be NaN
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.atan2(
        F.sqrt(a), F.sqrt(F.greatest(1 - a, F.lit(0.0)))
    )


def hhmm_to_str(col: Column) -> Column:
    """HHMM-encoded int (e.g. 1345) -> "13:45" string.

    reference: flights_lookup_to_kafka.py:15-16 —
    ``format_string("%02d:%02d", floor(col/100), col % 100)``.
    """
    return F.format_string("%02d:%02d", F.floor(col / 100).cast("int"), (col % 100).cast("int"))


def airline_code_from_callsign(callsign: Column) -> Column:
    """Callsign -> airline-code classification rules.

    Truth table (reference: AirlineAircraftCountStream.java:74-85):
      null/blank          -> "UNKNOWN"
      leading 'N'         -> "PRIVATE"   (US tail-number callsigns)
      trimmed length < 3  -> the trimmed callsign, uppercased
      otherwise           -> first 3 chars, uppercased
    """
    trimmed = F.upper(F.trim(callsign))
    return (
        F.when(callsign.isNull() | (F.trim(callsign) == ""), F.lit("UNKNOWN"))
        .when(trimmed.startswith("N"), F.lit("PRIVATE"))
        .when(F.length(trimmed) < 3, trimmed)
        .otherwise(F.substring(trimmed, 1, 3))
    )


def minmax_normalize_expr(col: Column, mn: Column, mx: Column, dp: int = 4) -> Column:
    """(x - min) / span rounded to ``dp``; span guarded to 1.0 when max <= min.

    reference: aircrafts_lookup_to_kafka.py:47-59 — including the
    ``or 0`` null-coalesce of the input (line 53) and the span guard
    (line 54). Null inputs normalize as 0.
    """
    span = F.when(mx > mn, mx - mn).otherwise(F.lit(1.0))
    x = F.coalesce(col, F.lit(0.0))
    return F.round((x - mn) / span, dp)
