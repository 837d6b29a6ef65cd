"""t20: hashed char-n-gram language ID — planted-language truth study
plus edge semantics.

The engine's synthetic corpus has text-independent lang labels, so the
catalog entry only proves determinism; THIS file proves the classifier
works — three planted pseudo-languages with separable character
distributions, trained on half the docs, must classify the held-out
half perfectly.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from big_data_flight_analytics_spark.operators.langid import (
    char_ngram_expr,
    langid_hashed_ngrams,
    langid_profiles,
)

# Disjoint syllable inventories: each pseudo-language reuses its own
# char trigrams and never the others' — separable by construction,
# the way real languages separate (th/er/on vs sch/ein/ung vs que/los).
LANG_SYLLABLES = {
    "aaa": ["pato", "keti", "lumo", "sira", "veno"],
    "bbb": ["xyzq", "wvxz", "qzyx", "zxqv", "yqzw"],
    "ccc": ["brgr", "krzd", "trfd", "drbl", "grtk"],
}


def _docs(spark, per_lang=30, words=12, seed=11):
    rng = random.Random(seed)
    rows = []
    i = 0
    for lang, syl in sorted(LANG_SYLLABLES.items()):
        for _ in range(per_lang):
            text = " ".join(rng.choice(syl) for _ in range(words))
            rows.append(Row(doc_id=i, lang=lang, text=text))
            i += 1
    return spark.createDataFrame(rows)


class TestPlantedLanguages:
    def test_heldout_accuracy_is_perfect(self, spark):
        docs = _docs(spark)
        ref = docs.filter(F.col("doc_id") % 2 == 0).select(
            F.col("lang").alias("label"), "text"
        )
        held = docs.filter(F.col("doc_id") % 2 != 0)
        pred = langid_hashed_ngrams(held, langid_profiles(ref))
        scored = pred.join(held.select("doc_id", "lang"), "doc_id")
        n = scored.count()
        correct = scored.filter(F.col("pred_label") == F.col("lang")).count()
        assert n == 45  # 15 held-out docs per language
        assert correct == n  # separable languages: accuracy 1.0

    def test_profiles_are_a_full_grid(self, spark):
        docs = _docs(spark, per_lang=5)
        prof = langid_profiles(
            docs.select(F.col("lang").alias("label"), "text"), n_buckets=64
        )
        assert prof.count() == 3 * 64
        assert prof.filter(F.col("w_fp").isNull()).count() == 0

    def test_deterministic_tie_breaks_to_smallest_label(self, spark):
        # two classes with IDENTICAL reference text -> identical
        # profiles -> every doc ties -> smallest label must win
        ref = spark.createDataFrame([
            Row(label="zz_lang", text="pato keti lumo sira"),
            Row(label="aa_lang", text="pato keti lumo sira"),
        ])
        doc = spark.createDataFrame([Row(doc_id=1, text="keti lumo pato")])
        got = langid_hashed_ngrams(doc, langid_profiles(ref)).collect()
        assert got[0]["pred_label"] == "aa_lang"


class TestProfileDelta:
    """i5: the count frame is additive — folding an arriving labeled
    batch must reproduce from-scratch training bit-identically."""

    def test_fold_equals_scratch(self, spark):
        from big_data_flight_analytics_spark.operators.langid import (
            langid_count_frame,
            langid_counts_fold,
            langid_profiles,
            langid_profiles_from_counts,
        )

        docs = _docs(spark)
        ref = docs.select(F.col("lang").alias("label"), "text", "doc_id")
        base = ref.filter(F.col("doc_id") % 3 != 0)
        delta = ref.filter(F.col("doc_id") % 3 == 0)
        folded = langid_profiles_from_counts(
            langid_counts_fold(
                langid_count_frame(base), langid_count_frame(delta)
            )
        )
        scratch = langid_profiles(ref)
        got = {
            (r["label"], r["bucket"]): r["w_fp"] for r in folded.collect()
        }
        want = {
            (r["label"], r["bucket"]): r["w_fp"] for r in scratch.collect()
        }
        assert got == want

    def test_new_label_arrives_only_in_delta(self, spark):
        from big_data_flight_analytics_spark.operators.langid import (
            langid_count_frame,
            langid_counts_fold,
            langid_profiles_from_counts,
        )

        base = spark.createDataFrame(
            [Row(label="aaa", text="pato keti lumo sira")]
        )
        delta = spark.createDataFrame(
            [Row(label="zzz", text="xyzq wvxz qzyx")]
        )
        prof = langid_profiles_from_counts(
            langid_counts_fold(
                langid_count_frame(base), langid_count_frame(delta)
            ),
            n_buckets=32,
        )
        assert prof.count() == 2 * 32  # the grid grew with the class
        assert {r["label"] for r in prof.select("label").distinct().collect()} == {
            "aaa", "zzz",
        }

    def test_empty_delta_is_identity(self, spark):
        from big_data_flight_analytics_spark.operators.langid import (
            langid_count_frame,
            langid_counts_fold,
        )

        base = spark.createDataFrame(
            [Row(label="aaa", text="pato keti lumo sira")]
        )
        empty = spark.createDataFrame([], "label string, text string")
        folded = langid_counts_fold(
            langid_count_frame(base), langid_count_frame(empty)
        )
        got = {
            (r["label"], r["bucket"]): r["cnt"] for r in folded.collect()
        }
        want = {
            (r["label"], r["bucket"]): r["cnt"]
            for r in langid_count_frame(base).collect()
        }
        assert got == want


class TestCharNgramExpr:
    @pytest.mark.parametrize(
        "text,want",
        [
            ("abcd", ["abc", "bcd"]),
            ("  AbC  ", ["abc"]),  # trim + lower canonicalization
            ("ab", []),  # below the gram width
            ("", []),
            (None, []),
        ],
    )
    def test_grams(self, spark, text, want):
        got = (
            spark.createDataFrame([Row(text=text)], "text string")
            .select(char_ngram_expr("text").alias("g"))
            .collect()[0]["g"]
        )
        assert got == want

    def test_multiset_repetition_scales_the_score(self, spark):
        # term frequency is the signal: a doc repeating a class's
        # grams 3x scores 3x the single occurrence (integer sum)
        ref = spark.createDataFrame([
            Row(label="a", text="pato pato pato keti"),
            Row(label="b", text="xyzq wvxz qzyx zxqv"),
        ])
        prof = langid_profiles(ref)
        one = langid_hashed_ngrams(
            spark.createDataFrame([Row(doc_id=1, text="pato")]), prof
        ).collect()[0]
        three = langid_hashed_ngrams(
            spark.createDataFrame([Row(doc_id=1, text="patopatopato")]), prof
        ).collect()[0]
        assert one["pred_label"] == "a" and three["pred_label"] == "a"
        assert three["n_grams"] == 10 and one["n_grams"] == 2

    def test_gramless_docs_are_excluded(self, spark):
        ref = spark.createDataFrame(
            [Row(label="a", text="pato keti"), Row(label="b", text="xyzq")]
        )
        docs = spark.createDataFrame([
            Row(doc_id=1, text="pato keti lumo"),
            Row(doc_id=2, text="ab"),
            Row(doc_id=3, text=None),
        ])
        got = langid_hashed_ngrams(docs, langid_profiles(ref)).collect()
        assert [r["doc_id"] for r in got] == [1]


class TestMultilingualProfiles:
    """Round 14: non-ASCII from pinned boundary to capability — real
    accented-language profiles, with NFC-lite canonicalization
    (functions/unicode.py) unifying combining-mark and precomposed
    encodings before gram hashing."""

    VOCAB = {
        "fra": ["café", "déjà", "élève", "garçon", "être", "voilà", "où"],
        "deu": ["über", "schön", "grüße", "mädchen", "läuft", "küche"],
        "ces": ["čaj", "děkuji", "žlutý", "přítel", "škola", "řeka"],
    }

    def _docs(self, spark, form, per_lang=20, words=10, seed=17):
        import random
        import unicodedata

        rng = random.Random(seed)
        rows, i = [], 0
        for lang, vocab in sorted(self.VOCAB.items()):
            for _ in range(per_lang):
                text = " ".join(rng.choice(vocab) for _ in range(words))
                rows.append(
                    Row(
                        doc_id=i,
                        lang=lang,
                        text=unicodedata.normalize(form, text),
                    )
                )
                i += 1
        return spark.createDataFrame(rows)

    def _normalized(self, df):
        from big_data_flight_analytics_spark.functions.unicode import (
            nfc_lite,
        )

        return df.withColumn("text", nfc_lite(F.col("text")))

    def test_accented_profiles_classify_perfectly(self, spark):
        docs = self._normalized(self._docs(spark, "NFC"))
        ref = docs.filter(F.col("doc_id") % 2 == 0).select(
            F.col("lang").alias("label"), "text"
        )
        held = docs.filter(F.col("doc_id") % 2 != 0)
        pred = langid_hashed_ngrams(held, langid_profiles(ref))
        scored = pred.join(held.select("doc_id", "lang"), "doc_id")
        n = scored.count()
        assert n == 30
        assert scored.filter(F.col("pred_label") == F.col("lang")).count() == n

    def test_nfd_docs_classify_identically_after_nfc_lite(self, spark):
        # profiles from NFC text; the SAME held-out docs arrive NFD-
        # encoded — after nfc_lite both encodings predict identically
        ref = self._normalized(
            self._docs(spark, "NFC").filter(F.col("doc_id") % 2 == 0)
        ).select(F.col("lang").alias("label"), "text")
        profiles = langid_profiles(ref)

        def predict(form):
            held = self._normalized(
                self._docs(spark, form).filter(F.col("doc_id") % 2 != 0)
            )
            return {
                r["doc_id"]: r["pred_label"]
                for r in langid_hashed_ngrams(held, profiles).collect()
            }

        got_nfc, got_nfd = predict("NFC"), predict("NFD")
        assert got_nfc == got_nfd
        assert len(got_nfd) == 30
