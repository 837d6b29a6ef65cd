"""Thresholds baked into the reference's query semantics.

reference: orchestration/src/shared.py:12-13 (DELAY_THRESHOLD,
MIN_FLIGHTS_THRESHOLD); AirportAircraftCountStream.java:39 (50 km radius);
AirlineAircraftCountStream.java:29,38 (1-minute tumbling, no grace).
"""

# Minutes of arrival/departure delay beyond which a flight counts as
# "delayed" (reference: shared.py:12).
DELAY_THRESHOLD = 15.0

# HAVING-style floor applied after nearly every group-count
# (reference: shared.py:13).
MIN_FLIGHTS_THRESHOLD = 100

# Geo-match radius for the airport proximity stream join
# (reference: AirportAircraftCountStream.java:39).
AIRPORT_RADIUS_KM = 50.0

# Streaming tumbling window duration; no grace period — late records are
# dropped at window close (reference: AirlineAircraftCountStream.java:29,38).
STREAM_WINDOW = "1 minute"
STREAM_WATERMARK = "0 seconds"

# Distance bucket edges used by Q7 distance-category analysis
# (reference: batch_process.py:160-166): right-exclusive, last bucket
# open-ended and labeled "2500+".
DISTANCE_BUCKET_EDGES = [0.0, 250.0, 500.0, 750.0, 1000.0, 1250.0, 1500.0,
                         1750.0, 2000.0, 2250.0, 2500.0, float("inf")]

# Problematic-route score floor (reference: batch_process.py:206 — routes
# whose delay rate is >= 1.2x the global average).
PROBLEMATIC_SCORE = 1.2

EARTH_RADIUS_KM = 6371.0
