"""Empty-input robustness for the continuation operators.

An engine operator must degrade to an empty (or all-pass) result on an
empty frame — not throw from a window over nothing, a sequence over
null bounds, or a divide-by-zero aggregate. sf0 of every pipeline.
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


def _empty(spark, **cols):
    t = {"long": LongType(), "string": StringType()}
    schema = StructType([StructField(k, t[v], True) for k, v in cols.items()])
    return spark.createDataFrame([], schema)


class TestEmptyInputs:
    def test_rolling_zscore_empty(self, spark):
        from big_data_flight_analytics_spark.operators.temporal import (
            rolling_zscore,
        )

        df = _empty(spark, k="long", t="long", v="long")
        assert (
            rolling_zscore(df, key="k", order=["t"], int_value_col="v").count()
            == 0
        )

    def test_top_paths_empty(self, spark):
        from big_data_flight_analytics_spark.operators.behavior import (
            top_paths,
        )

        df = _empty(
            spark, user_id="long", event_id="long", ts="long",
            event_type="string",
        )
        assert top_paths(df).count() == 0

    def test_dedup_delta_empty_sides(self, spark):
        from big_data_flight_analytics_spark.operators.incremental import (
            dedup_delta,
            dedup_index,
        )

        empty = _empty(spark, doc_id="long", text="string")
        docs = spark.createDataFrame([Row(doc_id=1, text="x")])
        # empty delta against a real index
        assign, updated = dedup_delta(dedup_index(docs), empty)
        assert assign.count() == 0
        assert updated.count() == 1
        # real delta against an empty index
        assign, updated = dedup_delta(dedup_index(empty), docs)
        rows = assign.collect()
        assert len(rows) == 1 and not rows[0]["dup_of_index"]

    def test_repeated_spans_and_excise_empty(self, spark):
        from big_data_flight_analytics_spark.operators.dedup import (
            excise_repeated_spans,
            repeated_spans,
        )

        empty = _empty(spark, doc_id="long", text="string")
        assert repeated_spans(empty).count() == 0
        assert excise_repeated_spans(empty).count() == 0

    def test_frame_dedup_empty(self, spark):
        from big_data_flight_analytics_spark.operators.multimodal import (
            frame_dedup,
        )

        df = spark.createDataFrame(
            [], StructType([
                StructField("doc_id", LongType(), True),
                StructField("payload", StringType(), True),
            ]),
        ).withColumn("payload", F.encode(F.coalesce("payload", F.lit("")), "utf-8"))
        assert frame_dedup(df).count() == 0

    def test_quantized_topk_empty_queries(self, spark):
        from big_data_flight_analytics_spark.operators.similarity import (
            quantized_topk,
        )

        corpus = spark.createDataFrame(
            [Row(vec_id=i, embedding=[float(i), 1.0]) for i in range(5)]
        )
        assert quantized_topk(corpus, corpus.limit(0)).count() == 0

    def test_apply_changes_empty_changeset(self, spark):
        from big_data_flight_analytics_spark.operators.scd import apply_changes

        base = spark.createDataFrame([Row(k=1, v="a")])
        changes = _empty(spark, k="long", op="string", v="string", seq="long")
        out = apply_changes(base, changes, key="k", seq=["seq"], payload=["v"])
        assert [(r["k"], r["v"]) for r in out.collect()] == [(1, "a")]

    def test_constraint_report_empty_frame_all_pass(self, spark):
        from big_data_flight_analytics_spark.operators.quality import (
            constraint_report,
        )

        df = _empty(spark, k="long", s="string")
        rep = constraint_report(
            df, not_null=["k"], unique=["k"], in_set={"s": ["A"]}
        ).collect()
        assert len(rep) == 3
        assert all(r["passed"] and r["checked"] == 0 for r in rep)

    def test_fold_session_events_empty(self):
        from big_data_flight_analytics_spark.streaming.transform_state import (
            fold_session_events,
        )

        assert fold_session_events(None, [], 10) == ([], None)
        assert fold_session_events((0, 5, 2), [], 10) == ([], (0, 5, 2))

    def test_pagerank_empty_graph(self, spark):
        from big_data_flight_analytics_spark.operators.graph import pagerank

        df = _empty(spark, src="long", dst="long")
        assert pagerank(df, num_iter=3).count() == 0
