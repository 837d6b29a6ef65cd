"""Corpus-level text operators: TF-IDF, n-gram counts, stratified sample.

Hand-computable semantics checks (SURVEY §5.3 style) plus the
determinism invariants that make these safe at 100 TB: results must be
invariant to partitioning, and ranking ties must break on stable keys.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row

from big_data_flight_analytics_spark.operators.sampling import (
    md5_bucket,
    stratified_sample,
)
from big_data_flight_analytics_spark.operators.text import (
    tfidf_top_terms,
    top_ngrams,
)

from pyspark.sql import functions as F


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


class TestTfidfTopTerms:
    def test_tf_df_values(self, spark):
        df = _docs(spark, ["a a b", "a c", "c c c"])
        out = {
            (r["doc_id"], r["term"]): (r["tf"], r["df"])
            for r in tfidf_top_terms(df, k=5).collect()
        }
        # tf counts within doc, df = number of docs containing term
        assert out[(0, "a")] == (2, 2)
        assert out[(0, "b")] == (1, 1)
        assert out[(1, "c")] == (1, 2)
        assert out[(2, "c")] == (3, 2)

    def test_rare_term_scores_higher_than_common(self, spark):
        # same tf=1 in doc 1: 'c' is in 2 docs, 'a' in 2 docs, but a
        # df=1 term must outscore a df=3 term at equal tf
        df = _docs(spark, ["x common", "y common", "common z"])
        rows = tfidf_top_terms(df, k=1).collect()
        top = {r["doc_id"]: r["term"] for r in rows}
        # each doc's unique term (df=1) beats 'common' (df=3)
        assert top == {0: "x", 1: "y", 2: "z"}

    def test_k_cap_and_tie_break(self, spark):
        # doc 0 has four distinct terms all tf=1 df=1: tie breaks on
        # term asc, so k=2 must select the lexicographically first two
        df = _docs(spark, ["d c b a"])
        rows = tfidf_top_terms(df, k=2).collect()
        assert sorted(r["term"] for r in rows) == ["a", "b"]

    def test_partition_invariance(self, spark):
        df = _docs(spark, ["a a b", "a c d", "c c e", "b d f"])
        base = set(map(tuple, tfidf_top_terms(df, k=2).collect()))
        shuf = set(map(tuple, tfidf_top_terms(df.repartition(7), k=2).collect()))
        assert base == shuf


class TestTopNgrams:
    def test_counts_and_multiset(self, spark):
        # 'a b c' appears twice inside one doc -> multiset must count 2
        df = _docs(spark, ["a b c a b c", "a b c"])
        out = {r["gram"]: r["n_occurrences"] for r in top_ngrams(df, n=3, k=10).collect()}
        assert out["a b c"] == 3
        assert out["b c a"] == 1
        assert out["c a b"] == 1

    def test_short_docs_produce_no_grams(self, spark):
        df = _docs(spark, ["one two", "x"])
        assert top_ngrams(df, n=3, k=10).count() == 0

    def test_k_limit_with_deterministic_ties(self, spark):
        # every gram count=1; top-2 must be the lexicographically first
        df = _docs(spark, ["b q r", "a q r", "c q r"])
        rows = top_ngrams(df, n=3, k=2).collect()
        assert [r["gram"] for r in rows] == ["a q r", "b q r"]


class TestStratifiedSample:
    def _frame(self, spark, n=400):
        rows = [
            Row(doc_id=i, lang=("en" if i % 2 == 0 else ("zh" if i % 4 == 1 else "fr")),
                source=f"s{i % 3}")
            for i in range(n)
        ]
        return spark.createDataFrame(rows)

    def test_unlisted_stratum_kept_fully(self, spark):
        df = self._frame(spark)
        out = stratified_sample(df, {"en": 0})
        fr_in = df.where(F.col("lang") == "fr").count()
        fr_out = out.where(F.col("lang") == "fr").count()
        assert fr_in == fr_out
        assert out.where(F.col("lang") == "en").count() == 0

    def test_rate_is_approximate_and_deterministic(self, spark):
        df = self._frame(spark, n=1000)
        out1 = {r["doc_id"] for r in stratified_sample(df, {"en": 20}).collect()}
        out2 = {
            r["doc_id"]
            for r in stratified_sample(df.repartition(13), {"en": 20}).collect()
        }
        # identical selection regardless of partitioning
        assert out1 == out2
        en_kept = sum(1 for i in out1 if i % 2 == 0)
        # md5-bucket < 20 of 100: binomial around 0.2 * 500
        assert 60 <= en_kept <= 140

    def test_column_order_preserved(self, spark):
        df = self._frame(spark)
        assert stratified_sample(df, {"en": 50}).columns == df.columns

    def test_bucket_range(self, spark):
        df = self._frame(spark, n=300)
        mn, mx = (
            df.select(md5_bucket(F.col("doc_id")).alias("b"))
            .agg(F.min("b"), F.max("b"))
            .collect()[0]
        )
        assert mn >= 0 and mx < 100


class TestRareTokenScore:
    def test_frequencies_and_rare_fraction(self, spark):
        from big_data_flight_analytics_spark.operators.text import (
            rare_token_score,
        )

        # "common" appears 6x corpus-wide, every other token once
        df = spark.createDataFrame([
            Row(doc_id=1, text="common common common alpha"),
            Row(doc_id=2, text="common common common beta"),
            Row(doc_id=3, text="gamma delta"),
        ])
        out = {r["doc_id"]: r for r in
               rare_token_score(df, rare_below=2).collect()}
        # doc 1: tokens tf = [6,6,6,1] -> mean 4.75, rare(tf<2) 1/4
        assert out[1]["n_tokens"] == 4
        assert out[1]["mean_tf"] == 4.75
        assert out[1]["rare_frac"] == 0.25
        # doc 3: both tokens unique -> all rare
        assert out[3]["rare_frac"] == 1.0
        assert out[3]["mean_tf"] == 1.0

    def test_garbage_text_scores_rarer_than_prose(self, spark):
        from big_data_flight_analytics_spark.operators.text import (
            rare_token_score,
        )

        prose = "the cat sat on the mat and the dog sat too"
        rows = [Row(doc_id=i, text=prose) for i in range(20)]
        rows.append(Row(doc_id=99, text="xq7f zzkw qpvnn mx9r jjjq"))
        out = {r["doc_id"]: r["rare_frac"]
               for r in rare_token_score(
                   spark.createDataFrame(rows), rare_below=5
               ).collect()}
        assert out[99] == 1.0  # OCR-garbage: every token corpus-rare
        assert out[0] == 0.0   # repeated prose: nothing rare


class TestMixtureSample:
    def _frame(self, spark):
        # deliberately unbalanced: 3000 web, 600 code, 400 books
        rows = (
            [Row(doc_id=i, source="web") for i in range(3000)]
            + [Row(doc_id=10_000 + i, source="code") for i in range(600)]
            + [Row(doc_id=20_000 + i, source="books") for i in range(400)]
        )
        return spark.createDataFrame(rows)

    def test_hits_target_mixture_with_bottleneck_kept_whole(self, spark):
        from big_data_flight_analytics_spark.operators.sampling import (
            mixture_sample,
        )

        # books is the bottleneck: 400 / 0.2 = 2000 achievable total
        out = mixture_sample(
            self._frame(spark), {"web": 0.5, "code": 0.3, "books": 0.2}
        )
        by_src = {
            r["source"]: r["n"]
            for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        assert by_src["books"] == 400  # kept whole
        # web thinned to ~1000 of 3000, code to ~600 of 600
        assert 900 <= by_src["web"] <= 1100
        assert by_src["code"] >= 550
        # achieved proportions within hash-variance of targets
        total = sum(by_src.values())
        assert abs(by_src["web"] / total - 0.5) < 0.05
        assert abs(by_src["books"] / total - 0.2) < 0.05

    def test_untargeted_source_dropped_and_deterministic(self, spark):
        from big_data_flight_analytics_spark.operators.sampling import (
            mixture_sample,
        )

        df = self._frame(spark)
        out1 = {r["doc_id"] for r in
                mixture_sample(df, {"web": 0.7, "code": 0.3}).collect()}
        out2 = {r["doc_id"] for r in
                mixture_sample(df.repartition(17), {"web": 0.7, "code": 0.3}).collect()}
        assert out1 == out2  # partitioning-independent selection
        assert not any(i >= 20_000 for i in out1)  # books dropped


class TestPackSequences:
    def test_capacity_and_contiguity_invariants(self, spark):
        from big_data_flight_analytics_spark.operators.sampling import (
            pack_sequences,
        )

        rng = random.Random(13)
        rows = [Row(doc_id=i, n_tokens=rng.randint(1, 300)) for i in range(2000)]
        target = 1000
        out = pack_sequences(
            spark.createDataFrame(rows), target, buckets=8
        ).collect()
        assert len(out) == 2000  # assignment, never drops or duplicates
        # rebuild each bucket's order and check the greedy-fill rule
        by_bucket: dict[int, list] = {}
        for r in out:
            by_bucket.setdefault(r["bucket"], []).append(r)
        for bucket, docs in by_bucket.items():
            docs.sort(key=lambda r: r["doc_id"])
            cum = 0
            for r in docs:
                want_seq = bucket * 2**32 + cum // target
                assert r["seq_id"] == want_seq, (bucket, r["doc_id"])
                cum += r["n_tokens"]
        # sequences are reasonably full: average span ≈ target
        n_seqs = len({r["seq_id"] for r in out})
        total_tokens = sum(r["n_tokens"] for r in out)
        assert total_tokens / n_seqs >= 0.7 * target

    def test_deterministic_under_repartition(self, spark):
        from big_data_flight_analytics_spark.operators.sampling import (
            pack_sequences,
        )

        rows = [Row(doc_id=i, n_tokens=(i * 37) % 200 + 1) for i in range(500)]
        df = spark.createDataFrame(rows)
        a = {(r["doc_id"], r["seq_id"])
             for r in pack_sequences(df, 500, buckets=4).collect()}
        b = {(r["doc_id"], r["seq_id"])
             for r in pack_sequences(df.repartition(11), 500, buckets=4).collect()}
        assert a == b


class TestChunkTokens:
    def test_exact_cover_no_overlap(self, spark):
        from big_data_flight_analytics_spark.operators.text import chunk_tokens

        docs = _docs(spark, ["a b c d e f"])
        out = chunk_tokens(docs, chunk_size=3, overlap=0).collect()
        got = {r["chunk_id"]: (r["chunk_text"], r["n_chunk_tokens"]) for r in out}
        assert got == {0: ("a b c", 3), 1: ("d e f", 3)}

    def test_overlap_stride(self, spark):
        from big_data_flight_analytics_spark.operators.text import chunk_tokens

        docs = _docs(spark, ["t0 t1 t2 t3 t4 t5 t6"])
        out = chunk_tokens(docs, chunk_size=4, overlap=2).collect()
        got = {r["chunk_id"]: r["chunk_text"] for r in out}
        # step 2: starts 0,2,4 — a start at 6 (inside the final
        # overlap) would emit 't6', a pure suffix of chunk 2
        assert got == {
            0: "t0 t1 t2 t3",
            1: "t2 t3 t4 t5",
            2: "t4 t5 t6",
        }

    def test_every_token_covered_and_case_preserved(self, spark):
        from big_data_flight_analytics_spark.operators.text import chunk_tokens

        text = "The Quick BROWN fox JUMPS over the LAZY dog again and again"
        docs = _docs(spark, [text])
        rows = sorted(
            chunk_tokens(docs, chunk_size=5, overlap=2).collect(),
            key=lambda r: r["chunk_id"],
        )
        toks = text.split()
        step = 3
        for r in rows:
            start = r["chunk_id"] * step
            assert r["chunk_text"].split() == toks[start : start + 5]
        # full reconstruction: non-overlapped prefix of each chunk
        rebuilt = []
        for r in rows:
            rebuilt.extend(r["chunk_text"].split()[: step if r["chunk_id"] < rows[-1]["chunk_id"] else 5])
        assert rebuilt[: len(toks)] == toks

    def test_empty_and_null_text_dropped(self, spark):
        from big_data_flight_analytics_spark.operators.text import chunk_tokens

        docs = spark.createDataFrame(
            [Row(doc_id=0, text=""), Row(doc_id=1, text="   "), Row(doc_id=2, text=None), Row(doc_id=3, text="x")]
        )
        out = chunk_tokens(docs, chunk_size=4, overlap=1).collect()
        assert [(r["doc_id"], r["chunk_text"]) for r in out] == [(3, "x")]

    def test_bad_overlap_raises(self, spark):
        import pytest

        from big_data_flight_analytics_spark.operators.text import chunk_tokens

        docs = _docs(spark, ["a"])
        with pytest.raises(ValueError):
            chunk_tokens(docs, chunk_size=4, overlap=4)

    def test_map_only_plan(self, spark):
        from big_data_flight_analytics_spark.operators.text import chunk_tokens

        docs = _docs(spark, ["a b c"] * 10)
        plan = (
            chunk_tokens(docs, chunk_size=2, overlap=1)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan and "Window" not in plan


class TestLexicalDiversity:
    def test_hand_computed(self, spark):
        from big_data_flight_analytics_spark.operators.text import (
            lexical_diversity,
        )

        # "a a b c": 4 tokens, 3 distinct, hapax = {b, c}
        docs = _docs(spark, ["a a b c"])
        r = lexical_diversity(docs).collect()[0]
        assert (r["n_tokens"], r["n_distinct"], r["n_hapax"]) == (4, 3, 2)
        assert r["ttr"] == 0.75
        assert r["hapax_frac"] == 0.5

    def test_case_folded(self, spark):
        from big_data_flight_analytics_spark.operators.text import (
            lexical_diversity,
        )

        docs = _docs(spark, ["The the THE"])
        r = lexical_diversity(docs).collect()[0]
        assert (r["n_tokens"], r["n_distinct"], r["n_hapax"]) == (3, 1, 0)

    def test_all_unique(self, spark):
        from big_data_flight_analytics_spark.operators.text import (
            lexical_diversity,
        )

        docs = _docs(spark, ["w1 w2 w3"])
        r = lexical_diversity(docs).collect()[0]
        assert r["ttr"] == 1.0 and r["hapax_frac"] == 1.0


class TestWeightedSample:
    def test_deterministic_across_partitionings(self, spark):
        from pyspark.sql import Row

        from big_data_flight_analytics_spark.operators.sampling import (
            weighted_sample,
        )

        rows = [Row(doc_id=i, w=float(1 + i % 5)) for i in range(500)]
        df1 = spark.createDataFrame(rows).repartition(2)
        df2 = spark.createDataFrame(rows).repartition(17, "doc_id")
        s1 = sorted(r["doc_id"] for r in weighted_sample(df1, "w", 50).collect())
        s2 = sorted(r["doc_id"] for r in weighted_sample(df2, "w", 50).collect())
        assert s1 == s2 and len(s1) == 50

    def test_weights_bias_inclusion(self, spark):
        from pyspark.sql import Row

        from big_data_flight_analytics_spark.operators.sampling import (
            weighted_sample,
        )

        # 5000 light (w=1) + 5000 heavy (w=10); A-ES inclusion odds for
        # a k=1000 sample strongly favor the heavy class. Deterministic
        # under the fixed seed, so the bound is stable, not flaky.
        rows = [Row(doc_id=i, w=1.0 if i < 5000 else 10.0) for i in range(10000)]
        df = spark.createDataFrame(rows)
        sample = weighted_sample(df, "w", 1000, seed=7).collect()
        heavy = sum(1 for r in sample if r["w"] == 10.0)
        assert len(sample) == 1000
        assert heavy > 800  # ~10x odds; uniform sampling would give ~500

    def test_nonpositive_weights_excluded(self, spark):
        from pyspark.sql import Row

        from big_data_flight_analytics_spark.operators.sampling import (
            weighted_sample,
        )

        df = spark.createDataFrame(
            [Row(doc_id=1, w=0.0), Row(doc_id=2, w=-1.0), Row(doc_id=3, w=2.0)]
        )
        got = [r["doc_id"] for r in weighted_sample(df, "w", 10).collect()]
        assert got == [3]

    def test_matches_python_reference_exactly(self, spark):
        """The sample is a pure function of (data, seed): recompute the
        A-ES keys in python from the same xxhash64 values and compare
        the top-k EXACTLY (java.lang.Math.pow and python math.pow are
        both correctly-rounded for these operands in practice; the
        ranking margin between distinct hash-uniforms dwarfs any ulp)."""
        import math

        from pyspark.sql import Row
        from pyspark.sql import functions as F

        from big_data_flight_analytics_spark.operators.sampling import (
            weighted_sample,
        )

        rows = [Row(doc_id=i, w=float(1 + (i * 13) % 7)) for i in range(300)]
        df = spark.createDataFrame(rows)
        hashes = {
            r["doc_id"]: r["h"]
            for r in df.select(
                "doc_id", F.xxhash64("doc_id", F.lit(0)).alias("h")
            ).collect()
        }
        keys = {}
        for r in rows:
            u = ((abs(hashes[r.doc_id]) & ((1 << 53) - 1)) + 1) / float(1 << 53)
            keys[r.doc_id] = math.pow(u, 1.0 / r.w)
        want = sorted(
            sorted(keys, key=lambda d: (-keys[d], d))[:40]
        )
        got = sorted(r["doc_id"] for r in weighted_sample(df, "w", 40).collect())
        assert got == want


class TestBm25Topk:
    """bm25_topk: exact-grain Okapi BM25 over a fixed term set."""

    @staticmethod
    def _py_bm25(texts, terms, grain=1_000_000, k1_tenths=12, b_hundredths=75):
        """Independent integer-arithmetic replica of the scoring contract."""
        import math

        docs = [
            (i, [w for w in t.strip().lower().split() if w])
            for i, t in enumerate(texts)
            if t is not None and t.strip()
        ]
        n_docs = len(docs)
        s_tokens = sum(len(toks) for _, toks in docs)
        dfs = {t: sum(1 for _, toks in docs if t in toks) for t in terms}
        out = []
        for i, toks in docs:
            dl = len(toks)
            score = 0
            matched = 0
            for t in terms:
                tf = toks.count(t)
                if tf:
                    matched += 1
                num = tf * (1000 + 100 * k1_tenths) * s_tokens * grain
                den = (
                    1000 * s_tokens * tf
                    + k1_tenths * (100 - b_hundredths) * s_tokens
                    + k1_tenths * b_hundredths * dl * n_docs
                )
                idf = math.floor(
                    grain * math.log((2 * n_docs + 2) / (2 * dfs[t] + 1))
                )
                score += (num // den) * idf
            if matched:
                out.append((i, matched, dl, score))
        out.sort(key=lambda r: (-r[3], r[0]))
        return out

    def test_matches_integer_reference(self, spark):
        from big_data_flight_analytics_spark.operators.text import bm25_topk

        texts = [
            "spark join window spark fast",
            "join join join table scan",
            "window dup window",
            "the a table scan row",
            "dup dup spark",
            "",
            None,
            "   ",
        ]
        terms = ["spark", "join", "dup"]
        got = [
            tuple(r)
            for r in bm25_topk(_docs(spark, texts), terms, k=10).collect()
        ]
        assert got == self._py_bm25(texts, terms)

    def test_rare_term_dominates_and_ties_break_on_id(self, spark):
        from big_data_flight_analytics_spark.operators.text import bm25_topk

        # 'rare' in one doc, 'common' everywhere: the rare-term doc
        # must outrank same-length common-term docs; identical docs tie
        # and break on doc_id ascending.
        texts = ["common rare x", "common y z", "common y z", "common y z"]
        rows = bm25_topk(
            _docs(spark, texts), ["common", "rare"], k=4
        ).collect()
        assert rows[0]["doc_id"] == 0 and rows[0]["matched"] == 2
        assert [r["doc_id"] for r in rows[1:]] == [1, 2, 3]
        assert len({r["score_fp"] for r in rows[1:]}) == 1

    def test_partition_invariance(self, spark):
        from big_data_flight_analytics_spark.operators.text import bm25_topk

        rng = random.Random(7)
        vocab = ["spark", "join", "dup", "scan", "row", "agg", "the"]
        texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30)))
            for _ in range(120)
        ]
        base = [
            tuple(r)
            for r in bm25_topk(_docs(spark, texts), ["spark", "dup"], k=15)
            .collect()
        ]
        shuf = [
            tuple(r)
            for r in bm25_topk(
                _docs(spark, texts).repartition(13), ["spark", "dup"], k=15
            ).collect()
        ]
        assert base == shuf

    def test_no_match_empty(self, spark):
        from big_data_flight_analytics_spark.operators.text import bm25_topk

        out = bm25_topk(_docs(spark, ["a b", "c d"]), ["zzz"], k=5)
        assert out.count() == 0


class TestDsirWeights:
    """dsir_weights: hashed-bigram importance scores (DSIR)."""

    def test_target_like_docs_score_higher(self, spark):
        from big_data_flight_analytics_spark.operators.sampling import (
            dsir_weights,
        )

        # target domain speaks "alpha beta"; raw background speaks
        # "gamma delta". A held-out doc in target language must
        # outscore a held-out doc in background language.
        rows = [
            Row(doc_id=i, source="tgt", text="alpha beta " * 10)
            for i in range(5)
        ] + [
            Row(doc_id=10 + i, source="bg", text="gamma delta " * 10)
            for i in range(20)
        ] + [
            Row(doc_id=100, source="bg", text="alpha beta alpha beta"),
            Row(doc_id=101, source="bg", text="gamma delta gamma delta"),
        ]
        out = {
            r["doc_id"]: r["dsir_fp"]
            for r in dsir_weights(
                spark.createDataFrame(rows), "tgt", n_buckets=64
            ).collect()
        }
        assert out[100] > out[101]

    def test_multiset_counting_scales_score(self, spark):
        from big_data_flight_analytics_spark.operators.sampling import (
            dsir_weights,
        )

        # doc 1 repeats the same bigram 3x as often as doc 0 -> its
        # score is ~3x (exactly, in integer arithmetic: same single
        # bucket weight summed 2 vs 6 times).
        rows = [
            Row(doc_id=0, source="bg", text="a b a"),      # 2 bigrams
            Row(doc_id=1, source="bg", text="a b a b a b a"),  # 6
            Row(doc_id=2, source="tgt", text="a b"),
        ]
        out = {
            r["doc_id"]: r
            for r in dsir_weights(
                spark.createDataFrame(rows), "tgt", n_buckets=64
            ).collect()
        }
        assert out[0]["n_bigrams"] == 2 and out[1]["n_bigrams"] == 6
        assert out[1]["dsir_fp"] == 3 * out[0]["dsir_fp"]

    def test_partition_invariance(self, spark):
        from big_data_flight_analytics_spark.operators.sampling import (
            dsir_weights,
        )

        rng = random.Random(11)
        vocab = ["spark", "join", "dup", "scan", "row", "agg"]
        rows = [
            Row(
                doc_id=i,
                source="tgt" if i % 5 == 0 else f"src{i % 3}",
                text=" ".join(
                    rng.choice(vocab) for _ in range(rng.randint(0, 25))
                ),
            )
            for i in range(150)
        ]
        df = spark.createDataFrame(rows)
        base = {tuple(r) for r in dsir_weights(df, "tgt").collect()}
        shuf = {
            tuple(r)
            for r in dsir_weights(df.repartition(13), "tgt").collect()
        }
        assert base == shuf

    def test_overflow_guard_fails_loud(self, spark):
        from big_data_flight_analytics_spark.operators.sampling import (
            dsir_weights,
        )

        rows = [
            Row(doc_id=0, source="bg", text="a b c d"),
            Row(doc_id=1, source="tgt", text="a b"),
        ]
        df = spark.createDataFrame(rows)
        with pytest.raises(Exception, match="exceeds 2\\^62"):
            dsir_weights(df, "tgt", _product_bound=1).collect()
        # and untouched data still passes with the real bound
        assert dsir_weights(df, "tgt").count() == 2


class TestBigramLmScore:
    """t19: self-trained add-one bigram-LM NLL vs a python reference."""

    @staticmethod
    def _reference(texts, grain=1_000_000):
        import math
        from collections import Counter

        toks = {i: t.lower().split() for i, t in texts.items()}
        c2, c1 = Counter(), Counter()
        vocab = set()
        for ws in toks.values():
            vocab.update(ws)
            for a, b in zip(ws, ws[1:]):
                c2[(a, b)] += 1
                c1[a] += 1
        v = len(vocab)
        out = {}
        for i, ws in toks.items():
            if len(ws) < 2:
                out[i] = (0, 0, 0)
                continue
            nll = 0
            for a, b in zip(ws, ws[1:]):
                nll -= math.floor(
                    grain * math.log((c2[(a, b)] + 1) / (c1[a] + v))
                )
            n = len(ws) - 1
            out[i] = (n, nll, nll // n)
        return out

    def test_matches_python_reference(self, spark):
        from big_data_flight_analytics_spark.operators.text import (
            bigram_lm_score,
        )

        texts = {
            1: "the cat sat on the mat",
            2: "the cat sat on the cat",
            3: "zq xv qqq zq xv",   # rare transitions -> high NLL
            4: "single",            # no bigrams
            5: "the cat sat on the mat the cat sat",
        }
        docs = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in texts.items()]
        )
        got = {
            r["doc_id"]: (r["n_bigrams"], r["nll_fp"], r["avg_nll_fp"])
            for r in bigram_lm_score(docs).collect()
        }
        assert got == self._reference(texts)
        # the quality signal points the right way: the gibberish doc's
        # per-bigram NLL exceeds the in-register docs'
        assert got[3][2] > got[1][2] and got[3][2] > got[5][2]

    def test_partition_invariance_and_empty_docs(self, spark):
        from big_data_flight_analytics_spark.operators.text import (
            bigram_lm_score,
        )

        rng = random.Random(11)
        words = ["alpha", "beta", "gamma", "delta", "eps"]
        rows = [
            Row(
                doc_id=i,
                text=" ".join(rng.choice(words) for _ in range(rng.randint(0, 12))),
            )
            for i in range(120)
        ]
        rows.append(Row(doc_id=999, text=None))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        run = lambda d: sorted(tuple(r) for r in bigram_lm_score(d).collect())
        a = run(docs)
        assert a == run(docs.repartition(13))
        by_id = {r[0]: r for r in a}
        assert by_id[999] == (999, 0, 0, 0)  # null text keeps a zero row
        assert len(a) == 121


class TestBm25DefinitionalTruth:
    """_py_bm25 above replicates the integer-grain contract; like the
    r12 perceptron bug, a definitional mistake would survive that
    mirror. Truth here is the TEXTBOOK Okapi BM25 (float, k1=1.2,
    b=0.75, the +0.5-smoothed idf ln((N - df + 0.5)/(df + 0.5) + 1)):
    the engine's integer-grain ranking must induce the same order on a
    fixture with distinct float scores."""

    def test_integer_grain_ranking_matches_float_okapi(self, spark):
        import math

        from big_data_flight_analytics_spark.operators.text import bm25_topk

        texts = [
            "spark join window spark fast spark",
            "join join join table scan",
            "window dup window scan scan window",
            "the a table scan row here",
            "dup dup spark dup",
            "spark alone",
        ]
        terms = ["spark", "join", "dup", "window"]
        docs = [(i, t.split()) for i, t in enumerate(texts)]
        n = len(docs)
        avgdl = sum(len(tk) for _, tk in docs) / n
        dfs = {t: sum(1 for _, tk in docs if t in tk) for t in terms}
        k1, b = 1.2, 0.75

        def score(toks):
            s = 0.0
            for t in terms:
                tf = toks.count(t)
                if not tf:
                    continue
                idf = math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1)
                s += idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * len(toks) / avgdl)
                )
            return s

        want = [
            i
            for i, _ in sorted(
                ((i, score(tk)) for i, tk in docs if score(tk) > 0),
                key=lambda r: (-r[1], r[0]),
            )
        ]
        got = [
            r["doc_id"]
            for r in bm25_topk(_docs(spark, texts), terms, k=10).collect()
        ]
        assert got == want


class TestBigramLmDefinitionalTruth:
    """Truth from the textbook definition (float add-one-smoothed
    bigram LM trained on the corpus itself), not from the engine's
    integer formulation: the descaled nll_fp must sit within the
    accumulated floor-loss bound of the float NLL for every doc."""

    def test_fixedpoint_nll_tracks_float_lm(self, spark):
        import math

        from big_data_flight_analytics_spark.operators.text import (
            bigram_lm_score,
        )

        texts = [
            "the cat sat on the mat",
            "the cat sat on the cat",
            "dog dog dog dog",
            "a completely different sentence here",
            "the mat sat",
            "single",
        ]
        toks = [t.split() for t in texts]
        c2, c1 = {}, {}
        for tk in toks:
            for a, b in zip(tk, tk[1:]):
                c2[(a, b)] = c2.get((a, b), 0) + 1
                c1[a] = c1.get(a, 0) + 1
        v = len({w for tk in toks for w in tk})
        want = {}
        for i, tk in enumerate(toks):
            pairs = list(zip(tk, tk[1:]))
            want[i] = (
                -sum(
                    math.log((c2[(a, b)] + 1) / (c1[a] + v))
                    for a, b in pairs
                ),
                len(pairs),
            )
        grain = 1_000_000
        got = {
            r["doc_id"]: (r["nll_fp"], r["n_bigrams"])
            for r in bigram_lm_score(_docs(spark, texts), grain).collect()
        }
        for i, (nll, nb) in want.items():
            assert got[i][1] == nb
            # each of the nb per-bigram floors loses < 1 grain unit
            assert 0 <= got[i][0] - nll * grain <= nb + 1, (
                i, got[i][0] / grain, nll
            )


class TestDsirDefinitionalTruth:
    """Truth from the paper's definition (Xie et al. 2023: add-one-
    smoothed LLR of hashed-bigram profiles, target vs raw corpus),
    replicated in pure-Python floats with an independent md5 bucketer:
    the descaled dsir_fp must sit within the per-bucket floor-loss
    bound of the float score for every doc."""

    def test_fixedpoint_score_tracks_float_llr(self, spark):
        import hashlib
        import math

        from big_data_flight_analytics_spark.operators.sampling import (
            dsir_weights,
        )

        n_buckets, grain = 64, 1_000_000
        rows = [
            Row(doc_id=i, source="tgt", text="alpha beta gamma alpha beta")
            for i in range(4)
        ] + [
            Row(doc_id=10 + i, source="bg",
                text="delta epsilon zeta delta epsilon")
            for i in range(8)
        ] + [
            Row(doc_id=100, source="bg", text="alpha beta alpha"),
            Row(doc_id=101, source="bg", text="delta epsilon delta"),
        ]

        def bucket(g):
            return int(hashlib.md5(g.encode()).hexdigest()[:4], 16) % \
                n_buckets

        cnt_t, cnt_r = {}, {}
        per_doc = {}
        for r in rows:
            tk = r.text.split()
            bs = [bucket(f"{a} {b}") for a, b in zip(tk, tk[1:])]
            per_doc[r.doc_id] = bs
            for b in bs:
                cnt_r[b] = cnt_r.get(b, 0) + 1
                if r.source == "tgt":
                    cnt_t[b] = cnt_t.get(b, 0) + 1
        s_t, s_r = sum(cnt_t.values()), sum(cnt_r.values())

        def w(b):
            return math.log(
                ((cnt_t.get(b, 0) + 1) / (s_t + n_buckets))
                / ((cnt_r.get(b, 0) + 1) / (s_r + n_buckets))
            )

        want = {i: sum(w(b) for b in bs) for i, bs in per_doc.items()}
        got = {
            r["doc_id"]: (r["dsir_fp"], r["n_bigrams"])
            for r in dsir_weights(
                spark.createDataFrame(rows), "tgt", n_buckets=n_buckets,
                grain=grain,
            ).collect()
        }
        assert set(got) == set(want)
        for i, bs in per_doc.items():
            fp, nb = got[i]
            assert nb == len(bs)
            # each bucket weight floors away < 1 grain unit, summed
            # with multiplicity -> total downward drift < nb (+1 slack)
            assert -(nb + 1) <= fp - want[i] * grain <= 1, (
                i, fp / grain, want[i]
            )
        # and the definitional separation the operator exists for
        assert got[100][0] > got[101][0]


class TestCdcChunks:
    """t22/d23: content-defined chunking — the shift-robustness
    property that motivates CDC over fixed-size chunking, plus edge
    semantics."""

    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_insertion_perturbs_only_the_edited_chunk(self, spark):
        from big_data_flight_analytics_spark.operators.text import (
            cdc_chunks,
            chunk_tokens,
        )

        import random

        rng = random.Random(61)
        words = [f"w{rng.randint(0, 500)}" for _ in range(400)]
        original = " ".join(words)
        # insert two tokens near the front: every later CDC chunk must
        # keep its exact fingerprint
        edited = " ".join(words[:5] + ["INSERTED", "TOKENS"] + words[5:])
        df = self._docs(spark, [(1, original), (2, edited)])
        chunks = cdc_chunks(df, divisor=8).collect()
        fps = {1: set(), 2: set()}
        for r in chunks:
            fps[r["doc_id"]].add(r["chunk_fp"])
        shared = fps[1] & fps[2]
        n1 = len(fps[1])
        # all but the edited chunk survive (one boundary chunk changed,
        # possibly its neighbor if the insertion created a boundary)
        assert len(shared) >= n1 - 2
        # contrast: fixed-size chunking shifts wholesale — nearly
        # nothing downstream of the edit survives
        fixed = chunk_tokens(df, chunk_size=8, overlap=0)
        ffps = {1: set(), 2: set()}
        for r in fixed.select(
            "doc_id", F.md5("chunk_text").alias("fp")
        ).collect():
            ffps[r["doc_id"]].add(r["fp"])
        assert len(ffps[1] & ffps[2]) < len(shared)

    def test_chunks_partition_the_token_stream(self, spark):
        from big_data_flight_analytics_spark.operators.text import (
            cdc_chunks,
        )

        text = " ".join(f"t{i}" for i in range(100))
        got = cdc_chunks(self._docs(spark, [(7, text)]), divisor=4).collect()
        assert sum(r["n_tokens"] for r in got) == 100
        ids = sorted(r["chunk_id"] for r in got)
        assert ids == list(range(len(ids)))  # dense 0-based ordinals

    def test_empty_and_null_texts_emit_nothing(self, spark):
        from big_data_flight_analytics_spark.operators.text import (
            cdc_chunks,
        )

        df = self._docs(spark, [(1, ""), (2, None), (3, "  "), (4, "ok")])
        got = cdc_chunks(df, divisor=8).collect()
        assert {r["doc_id"] for r in got} == {4}

    def test_identical_docs_share_every_chunk(self, spark):
        from big_data_flight_analytics_spark.operators.text import (
            cdc_chunks,
        )

        text = " ".join(f"x{i % 40}" for i in range(200))
        df = self._docs(spark, [(1, text), (2, text)])
        per_doc = {}
        for r in cdc_chunks(df, divisor=8).collect():
            per_doc.setdefault(r["doc_id"], set()).add(
                (r["chunk_id"], r["chunk_fp"])
            )
        assert per_doc[1] == per_doc[2]


class TestLeakageSafeSplit:
    """t23: near-dup cluster members must land on one side."""

    def test_clusters_never_straddle_and_naive_leak_is_flagged(self, spark):
        from big_data_flight_analytics_spark.plans.catalog import QUERIES

        df = QUERIES["t23_leakage_safe_split"](
            spark, "/root/testdata/sf0.001"
        ).cache()
        try:
            straddling = (
                df.groupBy("cluster_id")
                .agg(F.countDistinct("split").alias("n"))
                .filter(F.col("n") > 1)
                .count()
            )
            assert straddling == 0
            # the flag marks exactly the docs whose naive side differs
            rows = df.filter("naive_crosses").collect()
            assert all(r["naive_split"] != r["split"] for r in rows)
            # and flagged docs are never their own cluster canonical
            # (a singleton's split IS its naive split)
            assert all(r["doc_id"] != r["cluster_id"] for r in rows)
        finally:
            df.unpersist()


class TestCorpusAssembly:
    """t24's structural guarantees, definitional (the hash gate proves
    cross-engine equality; these pin properties equality can't)."""

    def _result(self, spark):
        from big_data_flight_analytics_spark.plans.extension_queries import (
            t24_corpus_assembly,
        )

        return t24_corpus_assembly(spark, "/root/testdata/sf0.001").cache()

    def test_no_cluster_spans_splits_and_packing_is_contiguous(self, spark):
        from big_data_flight_analytics_spark.plans.extension_queries import (
            T10_TARGETS,
            T11_TARGET_TOKENS,
        )

        rows = self._result(spark).collect()
        assert rows, "assembly emitted an empty corpus"
        # leakage-safe: a cluster id maps to exactly one split
        sides = {}
        for r in rows:
            assert sides.setdefault(r["cluster_id"], r["split"]) == r["split"]
        # only targeted sources survive the mixture
        assert {r["source"] for r in rows} <= set(T10_TARGETS)
        # canonical-only: one row per doc
        ids = [r["doc_id"] for r in rows]
        assert len(ids) == len(set(ids))
        # packing: within each (split, bucket), seq assignment is the
        # greedy running-total rule over doc_id order
        from collections import defaultdict

        groups = defaultdict(list)
        for r in rows:
            groups[(r["split"], r["bucket"])].append(r)
        for members in groups.values():
            members.sort(key=lambda r: r["doc_id"])
            cum = 0
            for r in members:
                assert (
                    r["seq_id"] % (1 << 32) == cum // T11_TARGET_TOKENS
                )
                cum += r["n_tokens"]

    def test_assembly_is_a_subset_of_curation_minus_contamination(self, spark):
        from big_data_flight_analytics_spark.plans.extension_queries import (
            D20_NGRAM,
            D20_PCT,
            d8_curated_corpus,
            d20_bench_slices,
        )
        from big_data_flight_analytics_spark.operators.dedup import (
            containment_decon_pairs,
        )
        from big_data_flight_analytics_spark.plans.tables import load
        from pyspark.sql import functions as F

        sf = "/root/testdata/sf0.001"
        got = {r["doc_id"] for r in self._result(spark).collect()}
        curated = {
            r["doc_id"] for r in d8_curated_corpus(spark, sf).collect()
        }
        docs = load(spark, sf, "documents")
        dirty = {
            r["corpus_doc"]
            for r in containment_decon_pairs(
                docs,
                d20_bench_slices(docs),
                n=D20_NGRAM,
                threshold_pct=D20_PCT,
            )
            .filter(F.col("corpus_doc") != F.col("bench_doc"))
            .collect()
        }
        assert got <= curated - dirty
        assert not (got & dirty)


class TestSourceNgramNovelty:
    """t28: a source whose trigrams appear nowhere else scores 1.0; a
    verbatim re-host scores 0.0 on the shared grams; counts are over
    DISTINCT grams per source."""

    def test_exclusive_shared_and_distinctness(self, spark):
        from big_data_flight_analytics_spark.operators.text import (
            source_ngram_novelty,
        )

        docs = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta", "A"),   # grams: ab g, b g d
                (2, "alpha beta gamma delta", "B"),   # re-host of doc 1
                (3, "unique own phrasing here", "C"),
                # duplicate gram WITHIN source C must count once
                (4, "unique own phrasing here", "C"),
            ],
            "doc_id long, text string, source string",
        )
        got = {
            r["source"]: (r["n_grams"], r["n_exclusive"], r["novelty"])
            for r in source_ngram_novelty(docs, n=3).collect()
        }
        # A and B share both trigrams -> zero novelty
        assert got["A"] == (2, 0, 0.0)
        assert got["B"] == (2, 0, 0.0)
        # C's two trigrams exist only in C; in-source dup not double-counted
        assert got["C"] == (2, 2, 1.0)
