"""Geospatial radius join (SURVEY §2.3 J7).

The reference's speed layer nested-loop-scans a global airport store per
message and emits (airport, aircraft) pairs within 50 km
(reference: AirportAircraftCountStream.java:201-237, haversine 79-88,
radius 39). Spark-first mapping:

- small right side (e.g. top-10 airports): broadcast cross join +
  haversine filter — the broadcast nested-loop join IS the right plan;
- large right side: 2D-cell pre-join. Both sides get an integer
  latitude band key ``floor(lat / band_deg)`` subdivided into
  longitude cells (width from the exact haversine inversion with the
  band's worst-case cos(lat), antimeridian wrap, one-cell near-pole
  fallback); points can only match airports in their own or adjacent
  cell, so the cross join shrinks to an equi-join on (band, cell)
  plus the exact haversine filter.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from big_data_flight_analytics_spark.constants import (
    AIRPORT_RADIUS_KM,
    EARTH_RADIUS_KM,
)
from big_data_flight_analytics_spark.functions.scalar import haversine_km

# km per degree of latitude ON THE ENGINE'S OWN SPHERE: every pruning
# bound (bounding box, band width) must be consistent with the 6371 km
# radius ``haversine_km`` measures with, or the box is ~0.11% too
# narrow and drops true pairs at the radius margin (caught by the 2D
# cell equality test at 8000 km: a d=7999.4 pair with dlat past the
# old 111.32-based limit). The WGS84 "~111.32 km" figure belongs to a
# different sphere than the one distances are computed on.
KM_PER_DEG_LAT = math.pi / 180.0 * EARTH_RADIUS_KM  # ~111.19493

# ADVICE r15: the exact engine-sphere constant removed the old 111.32
# box's accidental slack, leaving the prefilter's strict-superset
# property resting on ulp-level agreement between |dlat| <= R/K and
# the sin/asin haversine round-trip at a pure-meridian pair sitting
# exactly at the radius. One part in 1e12 of deliberate widening makes
# the superset robust (candidate counts change negligibly; membership
# is still decided by the exact haversine filter alone).
_PREFILTER_SLACK = 1.0 + 1e-12


def radius_join(
    points: DataFrame,
    sites: DataFrame,
    radius_km: float = AIRPORT_RADIUS_KM,
    point_lat: str = "latitude",
    point_lon: str = "longitude",
    site_lat: str = "site_latitude",
    site_lon: str = "site_longitude",
    distance_col: str = "distance_km",
    use_banding: bool | None = None,
    band_threshold: int = 1000,
    site_count: int | None = None,
    lon_cells: bool = True,
) -> DataFrame:
    """All (point, site) pairs within ``radius_km`` (haversine), one row each.

    One point may match many sites — reference semantics
    (AirportAircraftCountStream.java:224-235). Null point coordinates are
    dropped first (reference: :59).

    ``use_banding=None`` auto-picks: broadcast cross join below
    ``band_threshold`` sites (plan: BroadcastNestedLoopJoin over a
    ~KB-scale side), banded equi-join above it. Pass ``site_count``
    (from table/catalog statistics) to make that decision without the
    extra count job, keeping the plan fully lazy.

    The banded path keys on 2D CELLS by default (``lon_cells=True``):
    latitude bands of ``radius/KM_PER_DEG_LAT`` degrees, each subdivided into
    longitude cells whose width is corrected by the band's worst-case
    cos(latitude) — so a cell spans >= radius everywhere in the band
    and own-or-adjacent-cell candidates are a strict superset of the
    circle. Longitude wraps at the antimeridian via pmod; bands whose
    required lon width exceeds the circle degenerate to one cell
    (automatic near-pole fallback — cos -> 0 makes nlon = 1), which is
    exactly the lat-only behavior. ``lon_cells=False`` restores plain
    latitude bands (the v1 path, kept for the equality tests).
    """
    pts = points.filter(F.col(point_lat).isNotNull() & F.col(point_lon).isNotNull())
    dist = haversine_km(
        F.col(point_lat), F.col(point_lon), F.col(site_lat), F.col(site_lon)
    )
    # cheap bounding-box prefilter before the trig: a pair can only be
    # within R km if its latitude delta is <= R/KM_PER_DEG_LAT deg
    # (the engine-sphere constant above — NOT 111.32). Pure
    # comparison, cuts haversine evaluations ~(180*band)/R-fold; the box
    # is a strict superset of the circle so results are unchanged.
    # (Longitude is not boxed: degrees shrink by cos(lat) and a correct
    # guard costs nearly what it saves at dimension-scale site counts.)
    lat_box = (
        F.abs(F.col(point_lat) - F.col(site_lat))
        <= radius_km / KM_PER_DEG_LAT * _PREFILTER_SLACK
    )

    if use_banding is None:
        # decide from caller-provided statistics when available; the
        # fallback count of the small side is acceptable only because
        # sites tables are dimension-scale — at true scale pass
        # site_count or use_banding=True.
        if site_count is None:
            site_count = sites.count()
        use_banding = site_count > band_threshold

    if not use_banding:
        joined = pts.crossJoin(F.broadcast(sites)).filter(lat_box)
        return joined.withColumn(distance_col, dist).filter(
            F.col(distance_col) <= radius_km
        )

    band_deg = max(radius_km / KM_PER_DEG_LAT * _PREFILTER_SLACK, 1e-6)
    p_band = F.floor(F.col(point_lat) / band_deg)
    s_band = F.floor(F.col(site_lat) / band_deg)
    # A point's radius can only reach sites in its own band or the two
    # adjacent ones: replicate each site into 3 band keys (site side is
    # the smaller one), then equi-join on band — a hash join, not a
    # nested loop.
    sites3 = sites.withColumn(
        "__band", F.explode(F.array(s_band - 1, s_band, s_band + 1))
    )
    if not lon_cells:
        # lat_box before the trig (r16): band candidates span up to
        # 2 band widths of latitude delta; the exact box halves the
        # haversine evaluations and is a strict superset of the circle
        # (same filter the broadcast path applies), so membership is
        # still decided by the haversine alone.
        joined = (
            pts.withColumn("__band", p_band)
            .join(sites3, "__band")
            .filter(lat_box)
        )
        return (
            joined.withColumn(distance_col, dist)
            .filter(F.col(distance_col) <= radius_km)
            .drop("__band")
        )

    # exact haversine inversion for the required cell width: for any
    # pair within R, sin^2(dlon/2) * cos(lat_p) * cos(lat_s) <=
    # sin^2(R / 2R_earth), so dlon <= 2 asin(sin(R/2R_e) / cos(phi_max))
    # with phi_max the largest |lat| EITHER side of the pair can have —
    # the band's own edge PLUS one band (the site may sit in the
    # adjacent, more poleward band). The exact asin form matters: the
    # linear band_deg/cos approximation undershoots by O(width^3) and
    # could drop a boundary pair at wide radii.
    # same 1e-12 widening as the lat bounds: the asin inversion is
    # exact in real arithmetic, not in floats
    half_sin = min(
        math.sin(radius_km / (2.0 * EARTH_RADIUS_KM)) * _PREFILTER_SLACK, 1.0
    )

    def _nlon(band: Column) -> Column:
        # Near the poles cos -> 0 drives the ratio past 1; the clamp
        # turns the width into the half/full circle and nlon bottoms
        # out at 1-2 — own+adjacent cells then cover every cell, which
        # is the lat-only fallback, for exactly the bands where lon
        # cells cannot be made correct.
        edge = (
            F.greatest(F.abs(band * band_deg), F.abs((band + 1) * band_deg))
            + band_deg
        )
        ratio = F.lit(half_sin) / F.cos(
            F.radians(F.least(edge, F.lit(90.0)))
        )
        width_deg = F.degrees(2.0 * F.asin(F.least(ratio, F.lit(1.0))))
        return (
            F.greatest(
                F.lit(1), F.floor(360.0 / F.greatest(width_deg, F.lit(1e-9)))
            )
        ).cast("long")

    def _cell(lon: Column, n: Column) -> Column:
        # lon in [-180, 180] -> cell in [0, n); pmod folds lon = 180
        # onto cell 0 (== lon = -180, the same meridian)
        return F.pmod(F.floor((lon + 180.0) * n / 360.0), n)

    p_n = _nlon(F.col("__band"))
    pts_k = pts.withColumn("__band", p_band).withColumn(
        "__lcell", _cell(F.col(point_lon), p_n)
    )
    # per replica band, this band's own discretization; replicate the
    # site into its cell and both neighbors, WRAPPED — array_distinct
    # collapses the wrap-around duplicates tiny nlon produces (nlon <=
    # 3 would otherwise emit the same cell twice and duplicate every
    # matched pair downstream)
    s_n = _nlon(F.col("__band"))
    s_c = _cell(F.col(site_lon), s_n)
    sites_k = sites3.withColumn(
        "__lcell",
        F.explode(
            F.array_distinct(
                F.array(
                    F.pmod(s_c - 1, s_n), s_c, F.pmod(s_c + 1, s_n)
                )
            )
        ),
    )
    # lat_box before the trig (r16) — see the lat-only branch above.
    joined = pts_k.join(sites_k, ["__band", "__lcell"]).filter(lat_box)
    return (
        joined.withColumn(distance_col, dist)
        .filter(F.col(distance_col) <= radius_km)
        .drop("__band", "__lcell")
    )


def within_radius_pred(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column, radius_km: float
) -> Column:
    """Reusable predicate form for ad-hoc theta joins."""
    return haversine_km(lat1, lon1, lat2, lon2) <= radius_km


def radius_site_counts(
    points: DataFrame,
    sites: DataFrame,
    point_id: str,
    site_id: str,
    radius_km: float = AIRPORT_RADIUS_KM,
    point_lat: str = "latitude",
    point_lon: str = "longitude",
    site_lat: str = "site_latitude",
    site_lon: str = "site_longitude",
    **radius_kwargs,
) -> DataFrame:
    """Distinct points within ``radius_km`` of each site —
    ``(site_id, n_points)``, the reference's ACTUAL downstream shape
    (AirportAircraftCountStream.java:62-75 counts distinct aircraft
    per airport; it never serves the raw pair stream).

    The 100 TB point of this operator: :func:`radius_join`'s pair
    output grows O(points x sites-in-radius) — verbatim-replicating
    the inputs 10x grew j7's ANSWER 99.9x — which is an anti-shape
    for a reporting surface. Aggregating to per-site counts inside
    the same plan keeps the result O(sites) no matter the corpus,
    and the pair stream exists only between the join and a
    map-side-combined count_distinct: nothing O(pairs) is ever
    persisted, collected, or returned. Sites with no point in radius
    are absent (inner-join semantics, matching the reference's
    state-store behavior of only materializing seen airports).
    """
    pairs = radius_join(
        points,
        sites,
        radius_km=radius_km,
        point_lat=point_lat,
        point_lon=point_lon,
        site_lat=site_lat,
        site_lon=site_lon,
        **radius_kwargs,
    )
    # COUNT, not COUNT DISTINCT (r16): radius_join emits every
    # (point, site) pair AT MOST ONCE on both physical paths — the
    # broadcast path is a plain cross join, and the banded path
    # matches a point's single (band, cell) key against
    # array_distinct'd site replicas, so no pair can meet twice
    # (pinned by TestRadiusSiteCounts.test_count_equals_distinct).
    # Dropping the distinct removes the per-group dedup state from
    # the aggregate while counting the identical set.
    return pairs.groupBy(site_id).agg(
        F.count(F.col(point_id)).cast("long").alias("n_points")
    )


def radius_nearest_k(
    points: DataFrame,
    sites: DataFrame,
    point_id: str,
    site_id: str,
    k: int = 3,
    radius_km: float = AIRPORT_RADIUS_KM,
    point_lat: str = "latitude",
    point_lon: str = "longitude",
    site_lat: str = "site_latitude",
    site_lon: str = "site_longitude",
    distance_col: str = "distance_km",
    **radius_kwargs,
) -> DataFrame:
    """The ``k`` nearest sites within ``radius_km`` of each point —
    the bounded-output reporting form of the radius join when the
    per-pair detail matters: output O(points x k) by construction
    instead of O(all pairs in radius).

    Ranking partitions by point (high-cardinality window — every key
    holds at most the point's in-radius site count) and orders by
    (distance, site_id): the id tie-break makes rank deterministic
    when two sites share coordinates (grid-synthesized keys collide),
    and distance comparisons replay cross-engine because both engines
    evaluate the same double-precision haversine on the same inputs
    (the j7-proven boundary). Points with no site in radius are
    absent (same inner contract as :func:`radius_site_counts`).
    """
    from pyspark.sql import Window

    pairs = radius_join(
        points,
        sites,
        radius_km=radius_km,
        point_lat=point_lat,
        point_lon=point_lon,
        site_lat=site_lat,
        site_lon=site_lon,
        distance_col=distance_col,
        **radius_kwargs,
    )
    w = Window.partitionBy(point_id).orderBy(
        F.col(distance_col).asc(), F.col(site_id).asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(point_id, site_id, distance_col, "rank")
    )


def radius_pairs_state(
    points: DataFrame,
    sites: DataFrame,
    point_id: str,
    site_id: str,
    radius_km: float = AIRPORT_RADIUS_KM,
    **radius_kwargs,
) -> DataFrame:
    """Mergeable state behind :func:`radius_site_counts`: the DISTINCT
    (site_id, point_id) pairs within radius — the LIFETIME-distinct
    variant of the reference speed layer's per-airport seen-aircraft
    set. (The reference itself windows that set: AirportAircraftCount-
    Stream.java:62-75 fills a HashSet per 1-minute tumbling window, so
    its state is window-bounded and its counts per-window; windowing/
    TTL is the state-bounding option for the lifetime variant,
    alongside per-site KMV.) The set is IDEMPOTENT under fold (union +
    distinct — the KMV/Bloom class of DESIGN.md's fold-class table):
    re-folding a replayed batch is an algebraic no-op, so the
    streaming face needs no batch marker for correctness. State is
    O(pairs in radius) — the price of EXACT lifetime-distinct counts
    under ingest."""
    pairs = radius_join(
        points, sites, radius_km=radius_km, **radius_kwargs
    )
    return pairs.select(site_id, point_id).distinct()


def radius_pairs_fold(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold two pair states: set union — idempotent, associative,
    commutative. O(state) with one distinct shuffle keyed on the pair."""
    return base.unionByName(delta).distinct()


def radius_counts_from_state(
    state: DataFrame, site_id: str, point_id: str
) -> DataFrame:
    """Derive the per-site distinct-point counts from a pair state —
    bit-equal to :func:`radius_site_counts` over the union of every
    folded point batch (pinned by test and the i14 oracle)."""
    return state.groupBy(site_id).agg(
        F.count(F.col(point_id)).cast("long").alias("n_points")
    )
