"""Physical-plan audit over the whole catalog — the scale-discipline
regression gate.

For every catalog query (at sf0.001 — plan SHAPE is scale-invariant,
modulo AQE broadcast thresholds) this records:
- shuffle count (hash + range exchanges),
- join strategies used,
- scan column widths (column-pruning evidence),
- unpartitioned-window occurrences,
and asserts the hard invariants:
- NO CartesianProduct anywhere (BroadcastNestedLoopJoin is the
  intended bounded form for the geo/brute-force designs);
- every parquet scan reads a strict subset of its table's columns
  unless the query genuinely needs all of them (profiling, verify
  passes over whole rows).

Output: a markdown table to stdout (redirect into PLANS.md) + non-zero
exit if an invariant fails. Diff PLANS.md across rounds to catch plan
regressions (a new shuffle, a lost broadcast) before they cost at
scale.

Usage: python tools/plan_audit.py [sf_dir] > PLANS.md
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_flight_analytics_spark.plans.catalog import QUERIES  # noqa: E402
from big_data_flight_analytics_spark.session import get_session  # noqa: E402

# queries where a full-width scan is the point (whole-row profiling)
FULL_SCAN_OK = {"p1_profile_orders"}
# tiny-side unpartitioned windows that are intended (driver-scale
# frames: per-partition offsets, centroid postings; a11/i6's
# cumulative sum runs over the histogram SKETCH — O(value_range/grain)
# rows, corpus-size-independent by construction, see
# operators/sketches.py)
GLOBAL_WINDOW_OK = {
    "w5_balance_quartiles",
    "a11_histogram_quantiles",
    "i6_histogram_delta",
    # a16 reuses a11's ungrouped quantile pass (same sketch-sized
    # cumulative window) to derive its broadcast bin boundaries
    "a16_quantile_binning",
    # i7/a15's ungrouped final rankings run over PRUNED candidate sets —
    # O(k x n_partitions) rows regardless of corpus (kmv_sketch doc)
    "i7_kmv_delta",
    "a15_sketch_overlap",
    # w7's lag runs over the MONTHLY aggregate — O(months) rows
    # however large the fact table (the groupBy underneath is where
    # the corpus-sized work happens, fully partitioned)
    "w7_revenue_mom_growth",
}

JOIN_KINDS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


def _elide_repeated_cache_builds(plan: str) -> str:
    """Keep each cached relation's build subtree ONCE.

    ``executedPlan().toString()`` re-prints a cached relation's child
    plan at EVERY reference (with re-aliased attr ids and even
    re-aliased column names under consumer projections), so a query
    that persists a 2x/3x-referenced frame (the documented
    tracked_persist discipline) would have its build shuffles/joins/
    scans counted per reference — a ~12-shuffle triangle query audited
    as 191 shuffles. Dedup key: the id-normalized CONTENT of the build
    subtree itself — alias-proof, and it also merges byte-identical
    builds cached twice (counting those once is the honest cost)."""
    lines = plan.splitlines()
    depths = [re.match(r"^[\s:|+-]*", ln).end() for ln in lines]
    keep = [True] * len(lines)
    seen: set[str] = set()
    i = 0
    while i < len(lines):
        if "InMemoryRelation" in lines[i]:
            j = i + 1
            while j < len(lines) and depths[j] > depths[i]:
                j += 1
            # re-prints of the SAME cache keep their original attr
            # names below the InMemoryRelation line (only the header /
            # consumer InMemoryTableScan lines re-alias — measured,
            # incl. the self-join DeduplicateRelations case); the
            # tree-drawing prefix, expr IDS, and plan_ids DO vary with
            # nesting position. So strip ids but KEEP column names:
            # two genuinely distinct builds differing only in which
            # columns they read must stay distinct audit entries
            # (ADVICE r9 — an all-@ key collapsed them).
            key = re.sub(
                r"#\d+L?|plan_id=\d+", "#@",
                "\n".join(ln[d:] for ln, d in
                           zip(lines[i + 1:j], depths[i + 1:j])),
            )
            if key in seen:
                for k in range(i + 1, j):
                    keep[k] = False
            else:
                seen.add(key)
            # scan continues INSIDE the subtree: nested cached
            # relations (a cache built over another cache) dedup too
        i += 1
    return "\n".join(ln for ln, k in zip(lines, keep) if k)


def audit(name: str, plan: str) -> tuple[dict, list[str]]:
    errors = []
    plan = _elide_repeated_cache_builds(plan)
    shuffles = len(re.findall(r"Exchange (hash|range)partitioning", plan))
    joins: dict[str, int] = {}
    for kind in JOIN_KINDS:
        n = plan.count(kind)
        if n:
            joins[kind] = n
    if joins.get("CartesianProduct"):
        errors.append(f"{name}: CartesianProduct in plan")
    scans = re.findall(r"FileScan parquet \[([^\]]*)\]", plan)
    widths = [len([c for c in s.split(",") if c.strip()]) for s in scans]
    # windowspecdefinition(<order> ASC ... ) with no partition columns
    # renders with the frame spec directly after sort orders; partitioned
    # ones list partition expressions first. Heuristic: count window
    # nodes whose spec starts with a sort direction marker.
    global_windows = len(
        re.findall(r"windowspecdefinition\([^,)]*(?:ASC|DESC)", plan)
    )
    if global_windows and name not in GLOBAL_WINDOW_OK:
        errors.append(f"{name}: unpartitioned window")
    return (
        {
            "shuffles": shuffles,
            "joins": joins,
            "scan_widths": widths,
            "global_windows": global_windows,
        },
        errors,
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_session(app_name="plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    all_errors: list[str] = []
    print("# Plan audit (generated by tools/plan_audit.py)\n")
    print("| query | shuffles | joins | scan widths | global windows |")
    print("|---|---|---|---|---|")
    for name, fn in QUERIES.items():
        # audit each query COLD: leftover caches from earlier catalog
        # entries otherwise match into this plan (CacheManager matches
        # canonicalized subtrees), making scan widths/shuffle counts
        # depend on catalog ORDER — which rotates every round
        spark.catalog.clearCache()
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        info, errors = audit(name, plan)
        all_errors.extend(errors)
        joins = ", ".join(f"{k}x{v}" for k, v in info["joins"].items()) or "-"
        print(
            f"| {name} | {info['shuffles']} | {joins} "
            f"| {info['scan_widths']} | {info['global_windows']} |"
        )
    if all_errors:
        print("\nINVARIANT FAILURES:", file=sys.stderr)
        for e in all_errors:
            print("  " + e, file=sys.stderr)
        return 1
    print("\nAll invariants hold: no CartesianProduct, no unintended "
          "unpartitioned windows.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
