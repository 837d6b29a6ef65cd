"""Reset rotation state for queries whose implementation changed.

A green driver row attests the CODE that produced it; editing a
query's plan or oracle invalidates that attestation. Run

    python tools/invalidate_verified.py name [name ...]

to drop the named queries to round 0 in ``verified_rounds.json`` so
they lead the next driver window (same effect as being brand new).
"""

from __future__ import annotations

import json
import os
import sys

VERIFIED_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..",
    "big_data_flight_analytics_spark", "plans", "verified_rounds.json",
)


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print(__doc__)
        return 2
    with open(VERIFIED_PATH) as fh:
        verified = json.load(fh)
    unknown = [n for n in names if n not in verified]
    for n in names:
        verified.pop(n, None)
    with open(VERIFIED_PATH, "w") as fh:
        json.dump(verified, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"invalidated {len(names)} ({len(unknown)} had no recorded round)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
