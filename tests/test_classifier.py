"""t21: batch-perceptron quality classifier — planted separable truth,
label semantics, guard behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from big_data_flight_analytics_spark.operators.classifier import (
    perceptron_quality,
)


def _planted(spark, per_class=20):
    """Separable by construction: repetitive docs (one word repeated —
    diversity 1/n, label -1) use one vocabulary; diverse docs (12
    distinct words per doc drawn from a SHARED 30-word pool, label +1)
    use another. Both classes share bigrams within themselves and none
    across, so the class signal accumulates in class-owned buckets and
    a working perceptron must reach accuracy 1.0."""
    pool = [f"fresh{k}" for k in range(30)]
    rows = []
    for i in range(per_class):
        rows.append(Row(
            doc_id=i,
            text=" ".join([f"boiler{i % 5}"] * 12),  # 1 distinct / 12
        ))
        rows.append(Row(
            doc_id=100 + i,
            text=" ".join(pool[(i + j) % 30] for j in range(12)),
        ))
    return spark.createDataFrame(rows)


class TestPerceptronQuality:
    def test_planted_separable_reaches_perfect_accuracy(self, spark):
        docs = _planted(spark)
        out = perceptron_quality(docs, n_iter=4).collect()
        assert len(out) == 40
        assert all(r["pred"] == r["label"] for r in out)
        # both classes present — the win isn't a constant prediction
        assert {r["label"] for r in out} == {1, -1}

    def test_label_rule_is_the_diversity_boundary(self, spark):
        docs = spark.createDataFrame([
            # 2 distinct of 4 tokens: 2*2 >= 4 -> +1 (boundary inclusive)
            Row(doc_id=1, text="a b a b"),
            # 2 distinct of 5: 4 < 5 -> -1
            Row(doc_id=2, text="a b a b a"),
        ])
        got = {
            r["doc_id"]: r["label"]
            for r in perceptron_quality(docs, n_iter=1).collect()
        }
        assert got == {1: 1, 2: -1}

    def test_gramless_and_empty_docs_are_excluded(self, spark):
        docs = spark.createDataFrame(
            [
                Row(doc_id=1, text="single"),
                Row(doc_id=2, text="   "),
                Row(doc_id=3, text=None),
                Row(doc_id=4, text="two tokens here now"),
            ],
            "doc_id long, text string",
        )
        got = [r["doc_id"] for r in perceptron_quality(docs).collect()]
        assert got == [4]

    def test_weight_guard_fires_on_configured_bound(self, spark):
        docs = _planted(spark, per_class=5)
        with pytest.raises(Exception, match="margin sums could"):
            perceptron_quality(docs, n_iter=2, _w_bound=1).collect()

    def test_false_positive_negative_is_corrected(self, spark):
        """A y=-1 doc whose bigrams overlap the positive class starts
        round 2 as a FALSE POSITIVE (margin > 0). The unsigned rule
        `margin <= 0` can never select it for an update (its weights
        would stay wrong forever); the standard rule y*(w.x) <= 0
        must correct it.

        Arithmetic (no bucket collisions): neg doc "a b a b a" has
        x = {ab:2, ba:2}; each of the 3 pos docs "a b Xi a b Yi" has
        x = {ab:2, bXi:1, Xia:1, bYi:1}. Round-1 w[ab] = 2*3-2 = 4,
        w[ba] = -2 -> neg margin = 2*4-2*2 = 4 > 0 (false positive).
        One corrective update (-2 on ab and ba) flips it to
        2*2-2*4 = -4 < 0 while every positive stays > 0."""
        docs = spark.createDataFrame(
            [Row(doc_id=0, text="a b a b a")]
            + [
                Row(doc_id=1 + i, text=f"a b p{i} a b q{i}")
                for i in range(3)
            ]
        )
        out = {
            r["doc_id"]: r
            for r in perceptron_quality(
                docs, n_iter=3, n_buckets=4096
            ).collect()
        }
        assert out[0]["label"] == -1
        assert all(out[1 + i]["label"] == 1 for i in range(3))
        # the false positive is corrected AND the positives survive
        assert out[0]["pred"] == -1, (
            "y=-1 false positive was never corrected — the "
            "misclassification rule is ignoring the label sign"
        )
        assert all(r["pred"] == r["label"] for r in out.values())

    def test_train_apply_split_equals_combined(self, spark):
        """perceptron_apply(docs, perceptron_weights(docs)) must equal
        perceptron_quality(docs) — the s11 stored-weights path and the
        t21 catalog entry are the same model."""
        from big_data_flight_analytics_spark.operators.classifier import (
            perceptron_apply,
            perceptron_weights,
        )

        docs = _planted(spark)
        w = perceptron_weights(docs, n_iter=3)
        split = {
            r["doc_id"]: (r["label"], r["margin"], r["pred"])
            for r in perceptron_apply(docs, w).collect()
        }
        combined = {
            r["doc_id"]: (r["label"], r["margin"], r["pred"])
            for r in perceptron_quality(docs, n_iter=3).collect()
        }
        assert split == combined

    def test_training_is_input_order_invariant(self, spark):
        docs = _planted(spark)
        a = {
            (r["doc_id"], r["margin"])
            for r in perceptron_quality(docs, n_iter=3).collect()
        }
        b = {
            (r["doc_id"], r["margin"])
            for r in perceptron_quality(
                docs.orderBy(F.rand(7)).repartition(7), n_iter=3
            ).collect()
        }
        assert a == b
