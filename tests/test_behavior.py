"""Behavioral analytics: ordered funnels and cohort retention.

The funnel tests pin the ORDERED semantics — a user whose later-step
event type occurs only BEFORE the earlier step must not advance — which
is exactly the case a min-per-type-then-compare formulation gets wrong.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from big_data_flight_analytics_spark.operators.behavior import (
    ordered_funnel,
    weekly_retention,
)


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour, 0, 0)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # u1 completes the funnel in order.
        ("u1", "signup", _ts(1)),
        ("u1", "view", _ts(2)),
        ("u1", "purchase", _ts(3)),
        # u2 viewed ONLY BEFORE signing up: must stop at step 1.
        ("u2", "view", _ts(1)),
        ("u2", "signup", _ts(2)),
        ("u2", "purchase", _ts(3)),
        # u3 views before AND after signup: the pre-signup view must
        # not block the post-signup one.
        ("u3", "view", _ts(1)),
        ("u3", "signup", _ts(2)),
        ("u3", "view", _ts(4)),
        # u3's purchase lands between signup and the qualifying view —
        # ordered semantics: no conversion.
        ("u3", "purchase", _ts(3)),
        # u4 never signs up.
        ("u4", "view", _ts(1)),
        ("u4", "purchase", _ts(2)),
    ]
    return spark.createDataFrame(rows, "user_id string, event_type string, ts timestamp")


class TestOrderedFunnel:
    def test_step_counts(self, events):
        out = ordered_funnel(events, ("signup", "view", "purchase"))
        got = {r["step"]: r["n_users"] for r in out.collect()}
        # signup: u1,u2,u3; view-after-signup: u1,u3; purchase-after: u1
        assert got == {"signup": 3, "view": 2, "purchase": 1}

    def test_step_idx_and_types(self, events):
        out = ordered_funnel(events, ("signup", "view", "purchase"))
        rows = sorted(out.collect(), key=lambda r: r["step_idx"])
        assert [r["step_idx"] for r in rows] == [1, 2, 3]
        assert [r["step"] for r in rows] == ["signup", "view", "purchase"]
        assert dict(out.dtypes)["n_users"] == "bigint"

    def test_single_step(self, events):
        out = ordered_funnel(events, ("purchase",))
        assert out.collect()[0]["n_users"] == 4

    def test_empty_steps_raises(self, events):
        with pytest.raises(ValueError):
            ordered_funnel(events, ())

    def test_strictly_after(self, spark):
        # Same-timestamp events do NOT advance the funnel (strict >).
        df = spark.createDataFrame(
            [("u", "a", _ts(1)), ("u", "b", _ts(1))],
            "user_id string, event_type string, ts timestamp",
        )
        got = {r["step"]: r["n_users"] for r in ordered_funnel(df, ("a", "b")).collect()}
        assert got == {"a": 1, "b": 0}


class TestWeeklyRetention:
    def test_offsets_and_counts(self, spark):
        rows = [
            # u1 first active day 1; active again day 8 (offset 1) and
            # twice in offset 2 week (days 15, 16 — counted once).
            ("u1", _ts(1)),
            ("u1", _ts(8)),
            ("u1", _ts(15)),
            ("u1", _ts(16)),
            # u2 cohorts on day 2; returns day 8 — 6 days later is
            # still offset 0 by the days/7 rule.
            ("u2", _ts(2)),
            ("u2", _ts(8)),
        ]
        df = spark.createDataFrame(rows, "user_id string, ts timestamp")
        out = weekly_retention(df)
        got = {
            (r["cohort_day"].isoformat(), r["week_offset"]): r["n_users"]
            for r in out.collect()
        }
        assert got == {
            ("2024-01-01", 0): 1,
            ("2024-01-01", 1): 1,
            ("2024-01-01", 2): 1,
            ("2024-01-02", 0): 1,
        }

    def test_same_day_events_dedup(self, spark):
        # Many events on one day count the user once at offset 0.
        rows = [("u", _ts(1, h)) for h in range(5)]
        df = spark.createDataFrame(rows, "user_id string, ts timestamp")
        out = weekly_retention(df).collect()
        assert len(out) == 1 and out[0]["n_users"] == 1

    def test_no_unpartitioned_window(self, spark):
        rows = [("u", _ts(1)), ("v", _ts(2))]
        df = spark.createDataFrame(rows, "user_id string, ts timestamp")
        plan = weekly_retention(df)._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan


class TestEventTransitions:
    def test_counts_and_ordering(self, spark):
        from big_data_flight_analytics_spark.operators.behavior import (
            event_transitions,
        )

        rows = [
            # u1: a -> b -> a
            (1, "u1", "a", _ts(1)),
            (2, "u1", "b", _ts(2)),
            (3, "u1", "a", _ts(3)),
            # u2: b -> b
            (4, "u2", "b", _ts(1)),
            (5, "u2", "b", _ts(2)),
            # u3: single event, no transition
            (6, "u3", "a", _ts(1)),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id string, event_type string, ts timestamp"
        )
        got = {
            (r["from_type"], r["to_type"]): r["n_transitions"]
            for r in event_transitions(df).collect()
        }
        assert got == {("a", "b"): 1, ("b", "a"): 1, ("b", "b"): 1}

    def test_tie_breaks_on_event_id(self, spark):
        from big_data_flight_analytics_spark.operators.behavior import (
            event_transitions,
        )

        # Two simultaneous events: event_id decides the sequence.
        rows = [
            (10, "u", "x", _ts(1)),
            (2, "u", "y", _ts(1)),
            (30, "u", "z", _ts(2)),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id string, event_type string, ts timestamp"
        )
        got = {
            (r["from_type"], r["to_type"]): r["n_transitions"]
            for r in event_transitions(df).collect()
        }
        # order: y (id 2) -> x (id 10) -> z
        assert got == {("y", "x"): 1, ("x", "z"): 1}

    def test_no_cross_user_transitions(self, spark):
        from big_data_flight_analytics_spark.operators.behavior import (
            event_transitions,
        )

        rows = [(1, "u1", "a", _ts(1)), (2, "u2", "b", _ts(2))]
        df = spark.createDataFrame(
            rows, "event_id long, user_id string, event_type string, ts timestamp"
        )
        assert event_transitions(df).count() == 0


class TestTopPaths:
    def test_paths_ordered_and_truncated(self, spark):
        from pyspark.sql import Row

        from big_data_flight_analytics_spark.operators.behavior import top_paths

        rows = [
            # user 1: out-of-order arrival, path must follow ts
            Row(user_id=1, event_id=3, ts=3, event_type="c"),
            Row(user_id=1, event_id=1, ts=1, event_type="a"),
            Row(user_id=1, event_id=2, ts=2, event_type="b"),
            # user 2: same path
            Row(user_id=2, event_id=4, ts=1, event_type="a"),
            Row(user_id=2, event_id=5, ts=2, event_type="b"),
            Row(user_id=2, event_id=6, ts=3, event_type="c"),
            # user 3: 4 events, k_steps=3 truncates
            Row(user_id=3, event_id=7, ts=1, event_type="a"),
            Row(user_id=3, event_id=8, ts=2, event_type="x"),
            Row(user_id=3, event_id=9, ts=3, event_type="y"),
            Row(user_id=3, event_id=10, ts=4, event_type="z"),
        ]
        out = top_paths(spark.createDataFrame(rows), k_steps=3)
        got = {r["path"]: r["n_users"] for r in out.collect()}
        assert got == {"a>b>c": 2, "a>x>y": 1}

    def test_tie_break_on_event_id(self, spark):
        from pyspark.sql import Row

        from big_data_flight_analytics_spark.operators.behavior import top_paths

        rows = [
            Row(user_id=1, event_id=2, ts=1, event_type="b"),
            Row(user_id=1, event_id=1, ts=1, event_type="a"),
        ]
        out = top_paths(spark.createDataFrame(rows), k_steps=5)
        assert out.collect()[0]["path"] == "a>b"

    def test_single_exchange_feeds_window_and_collapse(self, spark):
        from pyspark.sql import Row

        from big_data_flight_analytics_spark.operators.behavior import top_paths

        df = spark.createDataFrame(
            [Row(user_id=i % 3, event_id=i, ts=i, event_type="t") for i in range(9)]
        )
        plan = top_paths(df)._jdf.queryExecution().executedPlan().toString()
        # one Exchange on user hash (window + groupBy(user)) + one for
        # the final path tally — never three
        assert plan.count("Exchange") == 2


class TestDatasetCard:
    """t25/i12: the reporting-plane mergeable state — fold == scratch,
    and the deliberately non-mergeable-LOOKING columns (n_langs,
    top_lang) derive correctly because the state grain is (source,
    lang), not source."""

    def _docs(self, spark):
        rows = [
            # src "a": 3 docs, two langs (trigram tables in
            # functions/text.LANG_TRIGRAMS: en needs the/and/ing...,
            # es needs los/las/del/con...)
            (0, "a", "the cat and the dog went running for the door"),
            (1, "a", "the dog and the cat for the morning thing"),
            (2, "a", "los perros y las gatas del campo con una flor"),
            # src "b": 2 docs, one lang; tie-break never needed
            (3, "b", "the bird and the fish for the evening thing"),
            (4, "b", "the fish and the bird for the winter thing"),
        ]
        return spark.createDataFrame(
            rows, "doc_id long, source string, text string"
        )

    def test_fold_equals_scratch(self, spark):
        from big_data_flight_analytics_spark.operators.quality import (
            dataset_card_fold,
            dataset_card_report,
            dataset_card_state,
        )

        docs = self._docs(spark)
        scratch = {
            r["source"]: r.asDict()
            for r in dataset_card_report(dataset_card_state(docs)).collect()
        }
        base = dataset_card_state(docs.filter("doc_id % 2 = 0"))
        delta = dataset_card_state(docs.filter("doc_id % 2 = 1"))
        folded = {
            r["source"]: r.asDict()
            for r in dataset_card_report(
                dataset_card_fold(base, delta)
            ).collect()
        }
        assert folded == scratch
        assert set(scratch) == {"a", "b"}

    def test_language_columns_derive_from_state_grain(self, spark):
        from big_data_flight_analytics_spark.operators.quality import (
            dataset_card_report,
            dataset_card_state,
        )

        docs = self._docs(spark)
        got = {
            r["source"]: (r["n_langs"], r["top_lang"], r["n_docs"])
            for r in dataset_card_report(dataset_card_state(docs)).collect()
        }
        assert got["a"][0] == 2  # two predicted langs in source a
        assert got["a"][2] == 3
        assert got["b"][0] == 1
        # top_lang = most docs; source a has 2 of one lang, 1 of other
        from big_data_flight_analytics_spark.operators.text import (
            text_stats,
        )
        from collections import Counter

        langs = Counter(
            r["lang_pred"]
            for r in text_stats(docs.filter("source = 'a'")).collect()
        )
        assert got["a"][1] == langs.most_common(1)[0][0]

    def test_fold_with_disjoint_languages_unions_the_mix(self, spark):
        from big_data_flight_analytics_spark.operators.quality import (
            dataset_card_fold,
            dataset_card_report,
            dataset_card_state,
        )

        docs = self._docs(spark)
        # split source a BY LANGUAGE: each side sees one lang only;
        # the folded card must still report n_langs = 2
        base = dataset_card_state(docs.filter("doc_id IN (0, 1)"))
        delta = dataset_card_state(docs.filter("doc_id = 2"))
        got = {
            r["source"]: r["n_langs"]
            for r in dataset_card_report(
                dataset_card_fold(base, delta)
            ).collect()
        }
        assert got["a"] == 2
