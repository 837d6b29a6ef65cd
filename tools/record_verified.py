"""Record driver verification rounds into the catalog rotation state.

After a round's CORRECTNESS_r{N}.json lands, run

    python tools/record_verified.py CORRECTNESS_r05.json 5

Every query with a fully-green row (rows+schema+hash match, or
rows-only for oracle-less entries) gets its entry in
``plans/verified_rounds.json`` bumped to N. The catalog sorts
least-recently-verified first from that file, so names that fell past
the driver's 50-entry window automatically rotate back to the front of
the next round's window.
"""

from __future__ import annotations

import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
VERIFIED_PATH = os.path.join(
    _HERE, "..", "big_data_flight_analytics_spark", "plans",
    "verified_rounds.json",
)


def green(row: dict) -> bool:
    if row.get("err"):
        return False
    # hash_match/schema_match are absent for oracle-less (rows-only)
    # entries; an explicit False on either means drift and must keep the
    # query in next round's driver window.
    return (
        bool(row.get("rows_match"))
        and row.get("hash_match") is not False
        and row.get("schema_match") is not False
    )


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    artifact, round_no = sys.argv[1], int(sys.argv[2])
    with open(artifact) as fh:
        rows = json.load(fh)
    with open(VERIFIED_PATH) as fh:
        verified = json.load(fh)
    bumped = []
    for name, row in rows.items():
        if green(row):
            verified[name] = max(verified.get(name, 0), round_no)
            bumped.append(name)
        else:
            print(f"NOT green, unchanged: {name}: {row}")
    with open(VERIFIED_PATH, "w") as fh:
        json.dump(verified, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"bumped {len(bumped)} queries to round {round_no}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
