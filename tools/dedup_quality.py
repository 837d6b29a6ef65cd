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

    from big_data_flight_analytics_spark.plans.extension_queries import (
        d19_sparse_cosine,
    )

    methods = {
        "d3_minhash_lsh": d3_minhash_lsh,
        "d4_simhash": d4_simhash,
        "d10_winnow_jaccard": d10_winnow_jaccard,
        "d19_sparse_cosine": d19_sparse_cosine,
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
        "the three methods' pair sets complement rather than nest. "
        "d19 (trigram tf-idf cosine) also scores a different measure — "
        "WEIGHTED overlap, where rare shared trigrams dominate — and "
        "its `max_df` candidate cap drops pairs whose every shared "
        "trigram is common, so read its two columns as: precision = "
        "how often high tf-idf cosine implies high plain Jaccard, "
        "recall = how much of the Jaccard set survives idf weighting "
        "plus the cap."
    )
    containment_section(spark, sf_dir)
    semantic_section(spark, sf_dir)


def containment_section(spark, sf_dir: str) -> None:
    """d20: planted short-in-long contamination — the case the
    symmetric-Jaccard methods structurally miss.

    Plants the d20 benchmark items (12-token mid-slices of every 50th
    doc) and checks which detectors flag a corpus doc that contains
    one: d20's normalized containment vs d2's symmetric Jaccard
    between the SLICE and the containing doc."""
    import time

    from pyspark.sql import functions as F

    from big_data_flight_analytics_spark.operators.dedup import (
        containment_decon_pairs,
        ngram_jaccard_pairs,
    )
    from big_data_flight_analytics_spark.plans.extension_queries import (
        D20_NGRAM,
        D20_PCT,
        JACCARD_THRESHOLD,
        d20_bench_slices,
    )
    from big_data_flight_analytics_spark.plans.tables import load

    docs = load(spark, sf_dir, "documents")
    # the SAME constructor the catalog query and bench_stream use, so
    # the quality report can never desync from them (ADVICE r11)
    bench = d20_bench_slices(docs)
    n_bench = bench.count()
    t0 = time.time()
    caught = [
        (r["bench_doc"], r["corpus_doc"])
        for r in containment_decon_pairs(
            docs, bench, n=D20_NGRAM, threshold_pct=D20_PCT
        )
        .filter(F.col("corpus_doc") != F.col("bench_doc"))
        .collect()
    ]
    t_d20 = time.time() - t0
    # what symmetric Jaccard sees for the SAME (slice, containing-doc)
    # pairs: union slice (ids shifted clear of doc ids) with the docs,
    # score everything above zero, and read off the caught pairs'
    # symmetric values
    shift = 10_000_000
    both = bench.select(
        (F.col("doc_id") + shift).alias("doc_id"), "text"
    ).unionByName(docs.select("doc_id", "text"))
    sym = {
        (min(r["doc_a"], r["doc_b"]), max(r["doc_a"], r["doc_b"])): r[
            "jaccard"
        ]
        for r in ngram_jaccard_pairs(
            both, n=D20_NGRAM, threshold=0.0
        ).collect()
    }
    jac_of_caught = sorted(
        sym.get((min(b + shift, c), max(b + shift, c)), 0.0)
        for b, c in caught
    )
    med = jac_of_caught[len(jac_of_caught) // 2] if jac_of_caught else 0.0
    below = {
        t: sum(1 for j in jac_of_caught if j < t) for t in (0.2, 0.5, 0.8)
    }
    print()
    print("# Containment decontamination (d20) vs symmetric Jaccard")
    print()
    print(
        f"Benchmark items: {n_bench} planted 12-token mid-slices "
        f"(the d20 catalog framing). d20 flags corpus docs containing "
        f">= {D20_PCT}% of a slice's trigrams: **{len(caught)} "
        f"contaminated (bench, doc) pairs** ({t_d20:.1f}s). The SAME "
        f"slice-vs-doc pairs scored with symmetric Jaccard: "
        f"min {jac_of_caught[0] if jac_of_caught else 0:.3f} / "
        f"median {med:.3f} / "
        f"max {jac_of_caught[-1] if jac_of_caught else 0:.3f} — "
        f"{below[0.2]} of {len(caught)} fall below a 0.2 near-dup "
        f"threshold, {below[0.5]} below 0.5, {below[0.8]} below 0.8. "
        f"Caveat for this corpus: documents are short (25-90 "
        f"trigrams), so a 10-trigram contained slice still registers "
        f"a nonzero Jaccard that d2's permissive "
        f"{JACCARD_THRESHOLD} catalog threshold happens to clear; at "
        f"real document lengths the union term grows with the "
        f"document while the intersection stays bounded by the slice, "
        f"driving symmetric Jaccard toward 0 — the asymmetric "
        f"|A∩B|/|A| is length-invariant (see "
        f"`TestContainmentDecon::test_symmetric_jaccard_misses_the_"
        f"same_pair` for the constructed long-doc case, and the "
        f"length sweep below for the measured curve)."
    )
    containment_length_section(spark, sf_dir)


def containment_length_section(spark, sf_dir: str) -> None:
    """d20 recall vs host-document length (judge ask, r11 #5).

    The short-doc caveat above, measured: every d20 benchmark slice is
    planted into a synthetic HOST document 1x / 10x / 100x the corpus
    length (unique filler tokens, so the slice is the only shared
    material), and both detectors score the planted (slice, host)
    pairs. Containment |A∩B|/|A| is invariant in the host length by
    construction — recall must stay 1.0 — while symmetric Jaccard
    decays as ~|slice|/|host| and falls through every catalog
    threshold at realistic document lengths.
    """
    import time

    from pyspark.sql import functions as F

    from big_data_flight_analytics_spark.operators.dedup import (
        containment_decon_pairs,
        ngram_jaccard_pairs,
    )
    from big_data_flight_analytics_spark.plans.extension_queries import (
        D20_NGRAM,
        D20_PCT,
        JACCARD_THRESHOLD,
        d20_bench_slices,
    )
    from big_data_flight_analytics_spark.plans.tables import load

    host_shift, slice_shift = 10_000_000, 20_000_000
    bench = d20_bench_slices(load(spark, sf_dir, "documents")).cache()
    n_bench = bench.count()

    def filler(tag: str, cnt: int):
        return F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(cnt)),
                lambda j: F.concat(
                    F.lit(tag),
                    F.col("doc_id").cast("string"),
                    F.lit("x"),
                    j.cast("string"),
                ),
            ),
            " ",
        )

    print()
    print("# d20 containment recall vs host-document length")
    print()
    print(
        f"Each of the {n_bench} benchmark slices planted mid-document "
        f"into a unique-filler host at growing lengths; planted pair = "
        f"(slice, its host). Containment threshold {D20_PCT}%, d2 "
        f"catalog Jaccard threshold {JACCARD_THRESHOLD}."
    )
    print()
    print(
        "| host tokens | planted | d20 flagged | d20 recall "
        "| sym-J median | sym-J max | sym-J >= "
        f"{JACCARD_THRESHOLD} | sec |"
    )
    print("|---|---|---|---|---|---|---|---|")
    for n_fill in (24, 240, 2400):
        half = n_fill // 2
        hosts = bench.select(
            (F.col("doc_id") + host_shift).alias("doc_id"),
            F.concat_ws(
                " ", filler("fa", half), F.col("text"), filler("fb", half)
            ).alias("text"),
        )
        t0 = time.time()
        planted_found = {
            r["bench_doc"]
            for r in containment_decon_pairs(
                hosts, bench, n=D20_NGRAM, threshold_pct=D20_PCT
            )
            .filter(
                F.col("corpus_doc") == F.col("bench_doc") + host_shift
            )
            .collect()
        }
        t_d20 = time.time() - t0
        rec = len(planted_found) / n_bench if n_bench else float("nan")
        both = bench.select(
            (F.col("doc_id") + slice_shift).alias("doc_id"), "text"
        ).unionByName(hosts)
        sym = sorted(
            r["jaccard"]
            for r in ngram_jaccard_pairs(both, n=D20_NGRAM, threshold=0.0)
            .filter(
                (
                    F.least("doc_a", "doc_b")
                    == F.greatest("doc_a", "doc_b")
                    - (slice_shift - host_shift)
                )
            )
            .collect()
        )
        med = sym[len(sym) // 2] if sym else 0.0
        mx = sym[-1] if sym else 0.0
        over = sum(1 for j in sym if j >= JACCARD_THRESHOLD)
        print(
            f"| ~{n_fill + 12} | {n_bench} | {len(planted_found)} "
            f"| {rec:.3f} | {med:.3f} | {mx:.3f} | {over} "
            f"| {t_d20:.1f} |"
        )
    print()
    print(
        "Reading: the d20 recall column must stay 1.000 down the sweep "
        "(containment is normalized by the SLICE'S gram count, which "
        "never changes); the symmetric-Jaccard columns show the same "
        "planted pairs sliding under every near-dup threshold as the "
        "host grows — at ~250 tokens (an ordinary web page) symmetric "
        "methods already score the contamination as noise. This is the "
        "long-document case the corpus's 25-90-trigram docs cannot "
        "exhibit (caveat above), produced by construction."
    )
    sketch_containment_section(spark, sf_dir)


def sketch_containment_section(spark, sf_dir: str) -> None:
    """d22 sketch screen vs exact d20 containment (same framing).

    The screen exists for the 100 TB plan shape (benchmark sketches
    broadcast, corpus scored map-side, zero corpus shuffle beyond its
    own signature aggregate); this table measures what the estimator
    noise costs at slice-sized sets, and at which SCREEN threshold the
    screen keeps every exact-flagged pair (the screen-loose /
    verify-exact operating point).
    """
    import time

    from pyspark.sql import functions as F

    from big_data_flight_analytics_spark.operators.dedup import (
        containment_decon_pairs,
        sketch_containment_pairs,
    )
    from big_data_flight_analytics_spark.plans.extension_queries import (
        D20_NGRAM,
        D20_PCT,
        D22_PERMS,
        d20_bench_slices,
    )
    from big_data_flight_analytics_spark.plans.tables import load

    docs = load(spark, sf_dir, "documents")
    bench = d20_bench_slices(docs)
    t0 = time.time()
    exact = {
        (r["bench_doc"], r["corpus_doc"])
        for r in containment_decon_pairs(
            docs, bench, n=D20_NGRAM, threshold_pct=D20_PCT
        )
        .filter(F.col("corpus_doc") != F.col("bench_doc"))
        .collect()
    }
    t_exact = time.time() - t0
    print()
    print("# d22 sketch-containment screen vs exact d20")
    print()
    print(
        f"Exact truth: {len(exact)} pairs at containment >= {D20_PCT}% "
        f"({t_exact:.1f}s). Screen: {D22_PERMS}-perm MinHash Broder "
        f"estimator + exact sizes; the catalog entry runs screen "
        f"pct = {D20_PCT}."
    )
    print()
    print("| screen pct | flagged | exact kept | screen recall | precision | sec |")
    print("|---|---|---|---|---|---|")
    for pct in (25, 50, 75):
        t0 = time.time()
        got = {
            (r["bench_doc"], r["corpus_doc"])
            for r in sketch_containment_pairs(
                docs, bench, n=D20_NGRAM, num_perm=D22_PERMS,
                threshold_pct=pct,
            )
            .filter(F.col("corpus_doc") != F.col("bench_doc"))
            .collect()
        }
        dt = time.time() - t0
        tp = len(got & exact)
        rec = tp / len(exact) if exact else float("nan")
        prec = tp / len(got) if got else float("nan")
        print(
            f"| {pct} | {len(got)} | {tp} | {rec:.3f} | {prec:.3f} "
            f"| {dt:.1f} |"
        )
    print()
    print("num_perm sweep at the loose screen (pct 25):")
    print()
    print("| num_perm | flagged | exact kept | screen recall | sec |")
    print("|---|---|---|---|---|")
    for nperm in (16, 32, 64):
        t0 = time.time()
        got = {
            (r["bench_doc"], r["corpus_doc"])
            for r in sketch_containment_pairs(
                docs, bench, n=D20_NGRAM, num_perm=nperm, threshold_pct=25
            )
            .filter(F.col("corpus_doc") != F.col("bench_doc"))
            .collect()
        }
        dt = time.time() - t0
        tp = len(got & exact)
        rec = tp / len(exact) if exact else float("nan")
        print(f"| {nperm} | {len(got)} | {tp} | {rec:.3f} | {dt:.1f} |")
    print()
    print(
        "Reading: recall is the number that matters — a screen pct low "
        "enough to keep recall ~1.0 makes the sketch pass a safe "
        "pre-filter whose survivors d20 verifies exactly at candidate "
        "count. Precision < 1 is the estimator's variance at ~10-"
        "shingle slices (each flagged-but-unconfirmed pair just costs "
        "one exact verify); the num_perm sweep shows what more slots "
        "buy. When the benchmark is small enough to broadcast its full "
        "shingle postings, d20's exact broadcast form IS the screen — "
        "d22's niche is the benchmark too large for exact postings but "
        "fine as sketches."
    )


def semantic_section(spark, sf_dir: str) -> None:
    """Embedding-space candidate-scope quality (d13 LSH vs d18 k-means).

    Ground truth: the EXHAUSTIVE all-pairs transitive prune — a vector
    is prunable iff ANY lower-id vector in the whole corpus is
    cosine-similar above the threshold (what an unbounded scope would
    mark). Both operators restrict the candidate scope (sign-LSH
    buckets / k-means clusters), so their pruned sets are subsets of
    truth: precision is 1.0 by construction and RECALL measures what
    the scope restriction costs — the semantic-dedup analog of the
    text table above.
    """
    import time

    from pyspark.sql import functions as F

    from big_data_flight_analytics_spark.functions.vector import (
        cosine_fixedpoint_from_nsq,
        norm_sq_fixedpoint,
    )
    from big_data_flight_analytics_spark.plans.extension_queries import (
        NEARDUP_SIM,
        SIM_FP_SCALE,
        d13_semantic_prune,
        d18_semdedup_clusters,
    )
    from big_data_flight_analytics_spark.plans.tables import load

    emb = load(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id",
        F.col("embedding").alias("__e"),
        norm_sq_fixedpoint(F.col("embedding"), SIM_FP_SCALE).alias("__n"),
    ).cache()
    lo = v.select(
        F.col("vec_id").alias("__ia"),
        F.col("__e").alias("__ea"),
        F.col("__n").alias("__na"),
    )
    hi = v.select(
        F.col("vec_id").alias("__ib"),
        F.col("__e").alias("__eb"),
        F.col("__n").alias("__nb"),
    )
    t0 = time.time()
    # measurement-only O(n^2) scan: the point is an UNRESTRICTED truth
    # set, which no catalog query would ever run at corpus scale
    truth = {
        r["__ib"]
        for r in lo.crossJoin(hi)
        .filter(F.col("__ia") < F.col("__ib"))
        .filter(
            cosine_fixedpoint_from_nsq(
                F.col("__ea"), F.col("__eb"), F.col("__na"), F.col("__nb"),
                SIM_FP_SCALE,
            )
            >= NEARDUP_SIM
        )
        .select("__ib")
        .distinct()
        .collect()
    }
    t_truth = time.time() - t0
    print()
    print("# Semantic-dedup candidate-scope quality (embedding space)")
    print()
    print(
        f"Ground truth: exhaustive all-pairs transitive prune at cosine >= "
        f"{NEARDUP_SIM} — **{len(truth)} prunable vectors** "
        f"({t_truth:.1f}s, measurement-only O(n^2) scan). Scoped methods "
        f"mark subsets of this (precision 1.0 by construction); recall "
        f"is the scope restriction's cost."
    )
    print()
    print("| method | scope | pruned | recall | sec |")
    print("|---|---|---|---|---|")
    from big_data_flight_analytics_spark.operators.similarity import (
        semantic_prune,
    )

    def prune_probes1(spark, sf_dir):
        # the single-window counterfactual: the catalog entry was
        # promoted to probes=2 in round 9 (the measured dominant
        # config); this row shows what the promotion bought
        return semantic_prune(
            load(sf_dir=sf_dir, spark=spark, name="embeddings"),
            threshold=NEARDUP_SIM,
            target_bucket_size=128,
            probes=1,
        )

    for name, scope, fn in (
        ("d13_semantic_prune", "2 disjoint sign windows (probes=2)",
         d13_semantic_prune),
        ("d13 @ probes=1", "single sign window (pre-r9 config)",
         prune_probes1),
        ("d18_semdedup_clusters", "k-means clusters", d18_semdedup_clusters),
    ):
        t0 = time.time()
        got = {
            r["vec_id"]
            for r in fn(spark, sf_dir).filter("pruned").collect()
        }
        dt = time.time() - t0
        extra = got - truth
        rec = len(got & truth) / len(truth) if truth else float("nan")
        print(
            f"| {name} | {scope} | {len(got)} | {rec:.3f} | {dt:.1f} |"
        )
        assert not extra, f"{name} pruned outside truth: {sorted(extra)[:5]}"
    print()
    print(
        "Interpretation: both scopes use the same fixed-point cosine "
        "and threshold, so every divergence from truth is a missed "
        "CANDIDATE pair (two similar vectors that landed in different "
        "buckets/clusters), never a scoring difference. Clusters "
        "follow data density where sign buckets cut axis-aligned "
        "planes — compare the recall column to see what that buys on "
        "this corpus."
    )
    delta_section(spark, sf_dir)
    minhash_delta_section(spark, sf_dir)
    cdc_edit_robustness_section(spark, sf_dir)
    v8_recall_section(spark, sf_dir)
    retrieval_quality_section(spark, sf_dir)


def delta_section(spark, sf_dir: str) -> None:
    """Ingest-dedup (i3) recall vs probes, against brute-force truth.

    Same contract as the scoped table above, on the i3 catalog split
    (80% base index / 20% arriving delta): truth = every delta vector
    with ANY base vector at fixed-point cosine >= threshold
    (measurement-only O(base x delta) scan); each probe count is a
    strict subset (asserted), recall is the bucket-scheme's hit rate.
    """
    import time

    from pyspark.sql import functions as F

    from big_data_flight_analytics_spark.functions.vector import (
        cosine_fixedpoint_from_nsq,
        norm_sq_fixedpoint,
    )
    from big_data_flight_analytics_spark.operators.similarity import (
        embedding_index_delta,
    )
    from big_data_flight_analytics_spark.plans.extension_queries import (
        NEARDUP_SIM,
        NEARDUP_TARGET_BUCKET,
        SIM_FP_SCALE,
    )
    from big_data_flight_analytics_spark.plans.tables import load

    emb = load(spark, sf_dir, "embeddings").cache()
    base = emb.filter("vec_id % 5 != 0")
    delta = emb.filter("vec_id % 5 = 0")

    def side(df, t):
        return df.select(
            F.col("vec_id").alias(f"{t}_id"),
            F.col("embedding").alias(f"{t}_e"),
            norm_sq_fixedpoint(F.col("embedding"), SIM_FP_SCALE).alias(
                f"{t}_n"
            ),
        )

    t0 = time.time()
    truth = {
        r[0]
        for r in side(base, "b")
        .crossJoin(side(delta, "d"))
        .filter(
            cosine_fixedpoint_from_nsq(
                F.col("b_e"), F.col("d_e"), F.col("b_n"), F.col("d_n"),
                SIM_FP_SCALE,
            )
            >= NEARDUP_SIM
        )
        .select("d_id")
        .distinct()
        .collect()
    }
    t_truth = time.time() - t0
    print()
    print("# Ingest-dedup (i3) recall vs probes")
    print()
    print(
        f"Truth: {len(truth)} delta vectors with a base near-dup at "
        f"cosine >= {NEARDUP_SIM} ({t_truth:.1f}s brute force). The "
        f"catalog entry runs probes=2 (promoted round 9); the lever "
        f"is the index storing more sign windows."
    )
    print()
    print("| probes | known | recall | sec |")
    print("|---|---|---|---|")
    for p in (1, 2, 4):
        t0 = time.time()
        got = {
            r["vec_id"]
            for r in embedding_index_delta(
                base, delta, threshold=NEARDUP_SIM,
                target_bucket_size=NEARDUP_TARGET_BUCKET,
                fp_scale=SIM_FP_SCALE, probes=p,
            ).collect()
            if r["dup_of_index"]
        }
        dt = time.time() - t0
        assert got <= truth, f"probes={p} marked outside truth"
        rec = len(got) / len(truth) if truth else float("nan")
        print(f"| {p} | {len(got)} | {rec:.3f} | {dt:.1f} |")
    d5_probes_section(spark, sf_dir)


def d5_probes_section(spark, sf_dir: str) -> None:
    """d5 pair recall vs probes at the catalog threshold (judge ask,
    r11 stretch #8) — completes the embedding family's tuning picture
    next to the i3 and d13 probes tables.

    Truth: the exhaustive all-pairs set at fixed-point cosine >=
    NEARDUP_SIM (measurement-only O(n^2); no catalog query runs this).
    Every probes config generates a subset (same scoring, restricted
    candidates — asserted); recall is the bucket scheme's pair hit
    rate. The catalog entry runs probes=NEARDUP_PROBES.
    """
    import time

    from pyspark.sql import functions as F

    from big_data_flight_analytics_spark.functions.vector import (
        cosine_fixedpoint_from_nsq,
        norm_sq_fixedpoint,
    )
    from big_data_flight_analytics_spark.operators.similarity import (
        embedding_neardup_pairs,
    )
    from big_data_flight_analytics_spark.plans.extension_queries import (
        NEARDUP_PROBES,
        NEARDUP_SIM,
        NEARDUP_TARGET_BUCKET,
        SIM_FP_SCALE,
    )
    from big_data_flight_analytics_spark.plans.tables import load

    emb = load(spark, sf_dir, "embeddings").cache()

    def side(t):
        return emb.select(
            F.col("vec_id").alias(f"{t}_id"),
            F.col("embedding").alias(f"{t}_e"),
            norm_sq_fixedpoint(F.col("embedding"), SIM_FP_SCALE).alias(
                f"{t}_n"
            ),
        )

    t0 = time.time()
    truth = {
        (r["a_id"], r["b_id"])
        for r in side("a")
        .crossJoin(side("b"))
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(
            cosine_fixedpoint_from_nsq(
                F.col("a_e"), F.col("b_e"), F.col("a_n"), F.col("b_n"),
                SIM_FP_SCALE,
            )
            >= NEARDUP_SIM
        )
        .select("a_id", "b_id")
        .collect()
    }
    t_truth = time.time() - t0
    print()
    print("# d5 pair recall vs probes")
    print()
    print(
        f"Truth: {len(truth)} pairs at cosine >= {NEARDUP_SIM} "
        f"({t_truth:.1f}s brute force). Catalog entry runs "
        f"probes={NEARDUP_PROBES}."
    )
    print()
    print("| probes | pairs | recall | sec |")
    print("|---|---|---|---|")
    for p in (1, 2, 4):
        t0 = time.time()
        got = {
            (r["doc_a"], r["doc_b"])
            for r in embedding_neardup_pairs(
                emb,
                threshold=NEARDUP_SIM,
                target_bucket_size=NEARDUP_TARGET_BUCKET,
                probes=p,
            )
            .select(
                F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
            )
            .collect()
        }
        dt = time.time() - t0
        assert got <= truth, f"d5 probes={p} emitted pairs outside truth"
        rec = len(got) / len(truth) if truth else float("nan")
        print(f"| {p} | {len(got)} | {rec:.3f} | {dt:.1f} |")


def minhash_delta_section(spark, sf_dir: str) -> None:
    """Ingest-dedup (i4) recall vs the band scheme, against exact truth.

    Truth: every delta doc (doc_id %% 5 == 0) with ANY base doc at
    exact n-gram Jaccard >= threshold — an UNCAPPED posting join
    (measurement-only; no band buckets, no max_df). i4's exact verify
    makes its precision 1.0 by construction (asserted); recall is the
    banding scheme's collision rate at the corpus's actual similarity
    levels, and (num_perm, bands) is the lever — more bands at fixed
    rows/band buy recall with index size, the classical
    1-(1-j^r)^b curve.
    """
    import time

    from pyspark.sql import functions as F

    from big_data_flight_analytics_spark.operators.dedup import (
        _shingled,
        minhash_index_delta,
    )
    from big_data_flight_analytics_spark.plans.extension_queries import (
        JACCARD_THRESHOLD,
        MAX_BAND_DF,
    )
    from big_data_flight_analytics_spark.plans.tables import load

    docs = load(spark, sf_dir, "documents")
    base = docs.filter("doc_id % 5 != 0")
    delta = docs.filter("doc_id % 5 = 0")

    def posting(df, t):
        sh = _shingled(df, "doc_id", "text", 3).filter(
            F.size("shingles") > 0
        )
        return sh.select(
            F.col("doc_id").alias(f"{t}_id"),
            F.size("shingles").alias(f"{t}_n"),
            F.explode("shingles").alias("s"),
        )

    t0 = time.time()
    common = (
        posting(base, "b")
        .join(posting(delta, "d"), "s")
        .groupBy("b_id", "d_id", "b_n", "d_n")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    truth = {
        r[0]
        for r in common.filter(
            F.col("c")
            >= JACCARD_THRESHOLD * (F.col("b_n") + F.col("d_n") - F.col("c"))
        )
        .select("d_id")
        .distinct()
        .collect()
    }
    t_truth = time.time() - t0
    print()
    print("# Ingest-dedup (i4) recall vs the MinHash band scheme")
    print()
    print(
        f"Truth: {len(truth)} delta docs with a base doc at exact "
        f"n-gram Jaccard >= {JACCARD_THRESHOLD} ({t_truth:.1f}s, "
        f"uncapped posting join). The catalog entry runs num_perm=16 /"
        f" bands=4 (4 rows/band) with the max_band_df={MAX_BAND_DF} "
        f"hot-bucket cap."
    )
    print()
    print("| num_perm | bands | rows/band | known | recall | sec |")
    print("|---|---|---|---|---|---|")
    for num_perm, bands in ((16, 4), (16, 8), (32, 8)):
        t0 = time.time()
        got = {
            r["doc_id"]
            for r in minhash_index_delta(
                base,
                delta,
                num_perm=num_perm,
                bands=bands,
                threshold=JACCARD_THRESHOLD,
                max_band_df=MAX_BAND_DF,
            ).collect()
            if r["dup_of_index"]
        }
        dt = time.time() - t0
        assert got <= truth, f"({num_perm},{bands}) marked outside truth"
        rec = len(got) / len(truth) if truth else float("nan")
        print(
            f"| {num_perm} | {bands} | {num_perm // bands} "
            f"| {len(got)} | {rec:.3f} | {dt:.1f} |"
        )


def cdc_edit_robustness_section(spark, sf_dir: str) -> None:
    """t22/d23 chunk-survival under edits vs fixed-size chunking.

    Protocol: every 10th document gets a near-duplicate twin with K
    tokens inserted at 20% depth (deterministic). For each chunking
    scheme, measure what fraction of the ORIGINAL's chunk fingerprints
    the edited twin still carries (survival = what chunk-level dedup
    can still catch). CDC boundaries depend only on local content, so
    survival should stay high as K grows; fixed-size chunks shift
    wholesale after the edit point, so their survival caps near the
    edit depth.
    """
    import time

    from pyspark.sql import functions as F

    from big_data_flight_analytics_spark.operators.text import (
        cdc_chunks,
        chunk_tokens,
        tokens,
    )
    from big_data_flight_analytics_spark.plans.tables import load

    docs = (
        load(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % 10 == 0) & F.col("text").isNotNull())
        .select("doc_id", "text")
        .cache()
    )

    print()
    print("# CDC chunk survival under insertions (t22/d23 vs fixed-size)")
    print()
    print(
        "Every 10th doc gets a twin with K tokens inserted at 20% "
        "depth; survival = fraction of the original's chunk "
        "fingerprints the twin still carries (what chunk-grain dedup "
        "still catches). CDC divisor 8 vs fixed chunk_size 8."
    )
    print()
    print("| K inserted | cdc survival | fixed survival | cdc sec | fixed sec |")
    print("|---|---|---|---|---|")

    def survival(chunks_fn, df_orig, df_edit):
        # dedup both sides on (doc_id, fp): repeated identical chunks
        # in one doc would fan the left join out and overcount hits
        a = (
            chunks_fn(df_orig)
            .select("doc_id", F.col("chunk_fp").alias("fp"))
            .dropDuplicates(["doc_id", "fp"])
        )
        b = (
            chunks_fn(df_edit)
            .select("doc_id", F.col("chunk_fp").alias("fp"))
            .dropDuplicates(["doc_id", "fp"])
        )
        per = (
            a.join(b.withColumn("__hit", F.lit(1)), ["doc_id", "fp"], "left")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("hit"),
            )
            .agg(F.sum("hit").alias("h"), F.sum("n").alias("n"))
            .collect()[0]
        )
        return per["h"] / per["n"] if per["n"] else float("nan")

    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    for k in (2, 7, 8):
        ins = F.array(*[F.lit(f"zzins{i}") for i in range(k)])
        cut = F.floor(F.size(toks) * 0.2).cast("int")
        edited = docs.select(
            "doc_id",
            F.concat_ws(
                " ",
                F.concat(
                    F.slice(toks, 1, cut),
                    ins,
                    F.slice(
                        toks, cut + 1, F.size(toks) - cut
                    ),
                ),
            ).alias("text"),
        )
        t0 = time.time()
        cdc_s = survival(
            lambda d: cdc_chunks(d, divisor=8), docs, edited
        )
        t_cdc = time.time() - t0
        t0 = time.time()
        fix_s = survival(
            lambda d: chunk_tokens(d, chunk_size=8, overlap=0).select(
                "doc_id",
                F.md5("chunk_text").alias("chunk_fp"),
            ),
            docs,
            edited,
        )
        t_fix = time.time() - t0
        print(
            f"| {k} | {cdc_s:.3f} | {fix_s:.3f} "
            f"| {t_cdc:.1f} | {t_fix:.1f} |"
        )
    print()
    print(
        "Reading: CDC survival is INDEPENDENT of K — the insertion "
        "perturbs only the chunk containing it (plus at most one "
        "neighbor when an inserted token creates a boundary). "
        "Fixed-size survival depends on ALIGNMENT LUCK: when K is an "
        "exact multiple of chunk_size (K=8 here) the downstream "
        "chunks shift by whole chunks and re-match content-"
        "identically, but ANY other K (2, 7) misaligns every chunk "
        "after the edit and survival collapses to the pre-edit "
        "prefix. Real edits don't come in chunk-sized units, so the "
        "misaligned rows are the representative ones — this fragility "
        "is the reason d23 dedups on CDC fingerprints rather than "
        "t13's fixed windows."
    )




def v8_recall_section(spark, sf_dir: str) -> None:
    """IVF-PQ recall vs (nprobe, codebook granularity) — judge stretch
    r13 #8. v8's BASELINE rows report cost; this table reports what
    the two quantization knobs BUY against exact cosine top-k truth.
    Run it on the 30x fresh corpus (/tmp/sf30f13) for the production
    regime; any embeddings dir works. Measurement uses its own wider
    query set (40 queries, k=5) so recall has finer granularity than
    the 5x3 catalog config."""
    import time

    from pyspark.sql import functions as F

    from big_data_flight_analytics_spark.operators.similarity import (
        brute_force_topk,
        ivfpq_topk,
    )
    from big_data_flight_analytics_spark.plans.extension_queries import (
        V8_CITER,
        V8_COARSE_K,
        V8_EXPAND,
        V8_FP,
        V8_M,
        V8_PITER,
        V8_SCALE,
    )
    from big_data_flight_analytics_spark.plans.tables import load

    N_Q, K = 40, 5
    emb = load(spark, sf_dir, "embeddings").cache()
    n_corpus = emb.count()
    queries = emb.filter(F.col("vec_id") < N_Q).cache()

    t0 = time.time()
    truth = {}
    for r in brute_force_topk(emb, queries, k=K).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    t_truth = time.time() - t0

    print()
    print("# v8 IVF-PQ recall vs (nprobe, kcent)")
    print()
    print(
        f"Corpus {n_corpus} vectors ({sf_dir}); truth = exact cosine "
        f"top-{K} for {N_Q} queries ({t_truth:.1f}s brute scan, "
        f"measurement-only). Catalog config marked *. Training "
        f"iterations fixed at the catalog's ({V8_CITER}/{V8_PITER}); "
        f"coarse_k {V8_COARSE_K}."
    )
    print()
    print("| kcent | nprobe | probed frac | recall@5 | sec |")
    print("|---|---|---|---|---|")
    for kcent in (16, 32):
        for nprobe in (1, 2, 4, 8):
            t0 = time.time()
            got = {}
            res = ivfpq_topk(
                emb,
                queries,
                k=K,
                coarse_k=V8_COARSE_K,
                nprobe=nprobe,
                m=V8_M,
                kcent=kcent,
                expand=V8_EXPAND,
                coarse_iter=V8_CITER,
                pq_iter=V8_PITER,
                scale=V8_SCALE,
                fp_scale=V8_FP,
            )
            for r in res.collect():
                got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
            dt = time.time() - t0
            rec = sum(
                len(got.get(q, set()) & t) / len(t)
                for q, t in truth.items()
            ) / len(truth)
            star = " *" if (kcent, nprobe) == (16, 4) else ""
            print(
                f"| {kcent}{star} | {nprobe} | "
                f"{nprobe / V8_COARSE_K:.2f} | {rec:.3f} | {dt:.1f} |"
            )
    print()
    print(
        "Reading: recall climbs with nprobe (more cells scanned) and "
        "with kcent (finer residual codebooks rank candidates closer "
        "to true cosine order before the exact rerank). The probed "
        "fraction column is the scan-cost lever: recall at nprobe=4 "
        "touching 1/4 of the corpus is the production trade the "
        "catalog pins."
    )




def retrieval_quality_section(spark, sf_dir: str) -> None:
    """v9/v10 quality evidence (round 15): fusion only earns its keep
    if the lexical and semantic lists carry DIFFERENT information, and
    MMR only earns its keep if the diversity penalty buys measurably
    lower redundancy for measurably little relevance. Both measured
    against the same exact-cosine machinery the v8 table uses."""
    import time

    from pyspark.sql import functions as F

    from big_data_flight_analytics_spark.operators.similarity import (
        brute_force_topk,
        mmr_rerank,
    )
    from big_data_flight_analytics_spark.plans.extension_queries import (
        _lexical_jaccard_topk,
    )
    from big_data_flight_analytics_spark.plans.tables import load

    N_Q, K_LIST = 40, 10
    emb = load(spark, sf_dir, "embeddings").cache()
    queries = emb.filter(F.col("vec_id") < N_Q).cache()

    print()
    print("# v9/v10 retrieval quality (round 15)")
    print()

    # --- v9: list disagreement --------------------------------------
    sem = {}
    for r in brute_force_topk(emb, queries, k=K_LIST).collect():
        sem.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    lex = {}
    for r in _lexical_jaccard_topk(spark, sf_dir, N_Q, K_LIST).collect():
        lex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    shared_q = sorted(set(sem) & set(lex))
    jac = [
        len(sem[q] & lex[q]) / len(sem[q] | lex[q]) for q in shared_q
    ]
    mean_jac = sum(jac) / len(jac) if jac else float("nan")
    print(
        f"v9 list disagreement ({len(shared_q)} queries, top-{K_LIST} "
        f"lists): mean Jaccard(lexical, semantic) = **{mean_jac:.3f}** "
        "— the two modalities mostly surface DIFFERENT candidates "
        "(high overlap would make fusion a no-op; near-zero overlap "
        "on synthetic isotropic embeddings vs token text is the "
        "expected regime, and RRF is exactly the combiner that needs "
        "no calibrated scores to merge them)."
    )
    print()

    # --- v10: diversity/relevance trade ------------------------------
    print("v10 MMR at k=3, candidates=8: mean pairwise cosine among")
    print("the selected set (redundancy, lower = more diverse) and")
    print("mean query relevance, per lambda — relevance-only is")
    print("lam=1.0; the catalog pins lam=0.5.")
    print()
    print("| lambda | mean pairwise sim | mean relevance | sec |")
    print("|---|---|---|---|")
    vecs = {
        r["vec_id"]: r["embedding"]
        for r in emb.filter(F.col("vec_id") < 200_000).collect()
    }

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return 0.0 if na * nb == 0 else num / (na * nb)

    simq = {}
    for r in brute_force_topk(emb, queries, k=8).collect():
        simq[(r["query_id"], r["neighbor_id"])] = r["sim"]
    for tenths in (3, 5, 7, 10):
        t0 = time.time()
        sel = {}
        for r in mmr_rerank(
            emb, queries, n_candidates=8, k=3, lam_tenths=tenths
        ).collect():
            sel.setdefault(r["query_id"], []).append(r["neighbor_id"])
        dt = time.time() - t0
        pair_sims, rels = [], []
        for q, items in sel.items():
            for i, a in enumerate(items):
                rels.append(simq[(q, a)])
                for b in items[i + 1:]:
                    pair_sims.append(cos(vecs[a], vecs[b]))
        mps = sum(pair_sims) / len(pair_sims)
        mr = sum(rels) / len(rels)
        star = " *" if tenths == 5 else ""
        print(
            f"| {tenths / 10:.1f}{star} | {mps:.4f} | {mr:.4f} | {dt:.1f} |"
        )
    print()
    print(
        "Reading: pairwise similarity among the selected set falls as "
        "lambda drops (the penalty spends budget on different items) "
        "while mean relevance degrades only mildly until lambda gets "
        "small — the knee is the tradeoff MMR exists to expose. The "
        "driver-side vector math here is measurement code over "
        "retrieval-batch-sized sets, not an engine path."
    )


if __name__ == "__main__":
    main()
