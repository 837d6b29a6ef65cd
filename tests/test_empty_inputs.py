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


class TestEmptyInputsRound14:
    """sf0 behavior of the round-14 operators: folds over empty
    sides, excision of an empty corpus, the advisor on zero-row
    frames, and card reports with nothing ingested."""

    def test_boilerplate_excision_empty(self, spark):
        from big_data_flight_analytics_spark.operators.dedup import (
            boilerplate_excision,
            paragraph_df_fold,
            paragraph_df_state,
        )

        docs = _empty(spark, doc_id="long", text="string")
        assert boilerplate_excision(docs, sep=" @@ ").count() == 0
        empty_state = paragraph_df_state(docs, sep=" @@ ")
        assert empty_state.count() == 0
        # fold with one empty side is identity
        real = paragraph_df_state(
            spark.createDataFrame(
                [(1, "a @@ b")], "doc_id long, text string"
            ),
            sep=" @@ ",
        )
        got = {
            r["para"]: r["df"]
            for r in paragraph_df_fold(real, empty_state).collect()
        }
        assert got == {"a": 1, "b": 1}

    def test_dataset_card_empty(self, spark):
        from big_data_flight_analytics_spark.operators.quality import (
            dataset_card_fold,
            dataset_card_report,
            dataset_card_state,
        )

        docs = _empty(spark, doc_id="long", source="string", text="string")
        state = dataset_card_state(docs)
        assert state.count() == 0
        assert dataset_card_report(state).count() == 0
        real = dataset_card_state(
            spark.createDataFrame(
                [(1, "s", "the and of it all")],
                "doc_id long, source string, text string",
            )
        )
        folded = dataset_card_fold(real, state)
        assert dataset_card_report(folded).count() == 1

    def test_session_fold_empty_delta(self, spark):
        from big_data_flight_analytics_spark.operators.temporal import (
            session_fold,
            session_stats,
        )

        import datetime as dt

        events = spark.createDataFrame(
            [
                (1, "u", dt.datetime(2024, 1, 1, 0, 0)),
                (2, "u", dt.datetime(2024, 1, 1, 2, 0)),
            ],
            "event_id long, user_id string, ts timestamp",
        )
        base = session_stats(events, "user_id", "ts", 1800, "event_id").select(
            "user_id", "start_us", "end_us", "n_events"
        )
        empty = base.filter("1 = 0")
        folded = session_fold(base, empty, "user_id", 1800)
        assert folded.count() == 2  # re-rank of base, nothing merged
        assert session_fold(empty, empty, "user_id", 1800).count() == 0

    def test_advisor_empty_frames(self, spark):
        from big_data_flight_analytics_spark.operators.joins import (
            advise_join_strategy,
            planned_semi_join,
        )

        fact = _empty(spark, k="long", v="long")
        keys = _empty(spark, kk="long")
        out, strat = planned_semi_join(fact, "k", keys, "kk")
        # 0 keys <= any broadcast bound -> broadcast; result empty
        assert strat == "broadcast"
        assert out.count() == 0
        # the pure rule: empty fact never picks bloom (est 0 of 0)
        assert advise_join_strategy(10**9, 0, 0) == "shuffle"

    def test_nfc_lite_null_and_empty(self, spark):
        from big_data_flight_analytics_spark.functions.unicode import (
            nfc_lite,
        )

        df = spark.createDataFrame(
            [(0, ""), (1, None)], "id long, text string"
        )
        got = {
            r["id"]: r["s"]
            for r in df.select(
                "id", nfc_lite(F.col("text")).alias("s")
            ).collect()
        }
        assert got == {0: "", 1: None}


class TestCubeFamilyEmptyFact:
    """c1/c2/c3: the grand-total grouping set over an EMPTY fact must
    match the engines' CUBE/ROLLUP/GROUPING SETS contract — one () row
    with COUNT(*) = 0 and SUM = NULL — not a NULL count (review r15)."""

    _SCHEMA = (
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp"
    )

    def test_grand_total_row_is_zero_not_null(self, spark, tmp_path):
        import duckdb

        from big_data_flight_analytics_spark.plans.analytic_queries import (
            C1_SQL,
            C2_SQL,
            C3_SQL,
            c1_cube_revenue,
            c2_rollup_revenue,
            c3_grouping_sets_revenue,
        )

        sf_dir = str(tmp_path)
        spark.createDataFrame([], self._SCHEMA).write.parquet(
            f"{sf_dir}/lineitem.parquet"
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW lineitem AS SELECT * FROM "
            f"'{sf_dir}/lineitem.parquet/*.parquet'"
        )
        for fn, sql, n_grand_gid in (
            (c1_cube_revenue, C1_SQL, 3),
            (c2_rollup_revenue, C2_SQL, 7),
            (c3_grouping_sets_revenue, C3_SQL, 7),
        ):
            got = {r["gid"]: r.asDict() for r in fn(spark, sf_dir).collect()}
            want_rows = con.sql(sql).fetchall()
            # both engines: exactly one row (the grand total), count 0
            assert set(got) == {n_grand_gid}, fn.__name__
            grand = got[n_grand_gid]
            assert grand["n_items"] == 0, fn.__name__
            assert grand["revenue"] is None, fn.__name__
            assert len(want_rows) == 1, fn.__name__
            # the oracle's grand row: count column is 0, revenue NULL
            oracle_counts = [
                v for v in want_rows[0] if isinstance(v, int)
            ]
            assert 0 in oracle_counts, fn.__name__
