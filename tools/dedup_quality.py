"""Dedup-method quality study: precision/recall vs exact n-gram Jaccard.

Regenerable artifact (judge ask, r6 #8): the approximate near-dup
detectors — MinHash-LSH (d3), SimHash (d4), winnow-Jaccard (d10) —
measured against d2's exact n-gram-Jaccard pairs as ground truth, at a
given scale dir. The 95%-recall-for-40%-volume winnowing claim in
BASELINE.md becomes a table this script reproduces.

    python tools/dedup_quality.py [/root/testdata/sf0.1] > DEDUP_QUALITY.md

Prints a markdown report; per-method pair counts, true positives,
precision, recall, and Jaccard-of-pair-sets vs ground truth.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from big_data_flight_analytics_spark.session import get_session  # noqa: E402


def pair_set(df) -> set:
    return {(r["doc_a"], r["doc_b"]) for r in df.select("doc_a", "doc_b").collect()}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session(app_name="dedup-quality")
    spark.sparkContext.setLogLevel("ERROR")

    from big_data_flight_analytics_spark.plans.extension_queries import (
        d2_ngram_jaccard,
        d3_minhash_lsh,
        d4_simhash,
        d10_winnow_jaccard,
    )

    t0 = time.time()
    truth = pair_set(d2_ngram_jaccard(spark, sf_dir))
    t_truth = time.time() - t0

    methods = {
        "d3_minhash_lsh": d3_minhash_lsh,
        "d4_simhash": d4_simhash,
        "d10_winnow_jaccard": d10_winnow_jaccard,
    }

    print("# Dedup-method quality vs exact n-gram Jaccard (d2)")
    print()
    print(f"Scale dir: `{sf_dir}` — ground truth d2: "
          f"**{len(truth)} pairs** ({t_truth:.1f}s). Regenerate with "
          f"`python tools/dedup_quality.py {sf_dir}`.")
    print()
    print("| method | pairs | true pos | precision | recall | pair-set jaccard | sec |")
    print("|---|---|---|---|---|---|---|")
    for name, fn in methods.items():
        t0 = time.time()
        got = pair_set(fn(spark, sf_dir))
        dt = time.time() - t0
        tp = len(got & truth)
        prec = tp / len(got) if got else float("nan")
        rec = tp / len(truth) if truth else float("nan")
        jac = len(got & truth) / len(got | truth) if got | truth else float("nan")
        print(
            f"| {name} | {len(got)} | {tp} | {prec:.3f} | {rec:.3f} "
            f"| {jac:.3f} | {dt:.1f} |"
        )
    print()
    print(
        "Notes: d2 itself runs posting-list caps (`max_df`) mirrored in "
        "its oracle, so \"ground truth\" is the exact-Jaccard contract "
        "the catalog verifies, not an uncapped all-pairs scan. "
        "Precision < 1 means the method admits pairs below d2's "
        "Jaccard threshold; recall < 1 means the method's "
        "bucketing/fingerprinting missed qualifying pairs."
    )
    print()
    print(
        "Interpretation guide: d3 (MinHash-LSH) estimates the SAME "
        "Jaccard measure d2 computes, so its precision should sit near "
        "1 and its recall is the band-scheme's collision probability "
        "at the threshold. d10 (winnowing) subsamples d2's shingle "
        "postings, so both metrics measure the fingerprint-density "
        "trade directly. d4 (SimHash) detects a DIFFERENT similarity "
        "— near-duplicate token-frequency vectors under Hamming "
        "distance — so low precision against a Jaccard truth set is "
        "expected behavior, not a defect: its extra pairs are "
        "frequency-profile near-dups that n-gram Jaccard scores below "
        "threshold. The ensemble query (d14) exists precisely because "
        "the three methods' pair sets complement rather than nest."
    )


if __name__ == "__main__":
    main()
