"""j11: Bloom-filter semi join — no-false-negative guarantee, empty
key set, null keys, fp monotonicity in filter size."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_flight_analytics_spark.operators.joins import (
    bloom_filter_words,
    bloom_semi_join,
)


def _facts(spark, keys):
    return spark.createDataFrame(
        [(k, f"row{i}") for i, k in enumerate(keys)], "k long, payload string"
    )


def _keys(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "key long")


class TestBloomSemiJoin:
    def test_no_false_negatives_ever(self, spark):
        # every true member must pass the filter, at any m — even a
        # tiny saturated one
        facts = _facts(spark, range(500))
        keys = _keys(spark, range(0, 500, 7))
        for m in (64, 1 << 14):
            got = {
                r["k"]
                for r in bloom_semi_join(
                    facts, "k", keys, "key", m
                ).collect()
            }
            assert set(range(0, 500, 7)) <= got

    def test_wide_filter_passes_exactly_the_members(self, spark):
        # 72 keys in 2^17 bits: collision odds across both salted rows
        # are negligible and the hash layout is deterministic — the
        # candidate set IS the true semi join
        facts = _facts(spark, range(500))
        keys = _keys(spark, range(0, 500, 7))
        got = {
            r["k"]
            for r in bloom_semi_join(facts, "k", keys, "key", 1 << 17).collect()
        }
        assert got == set(range(0, 500, 7))

    def test_fp_count_shrinks_with_filter_size(self, spark):
        facts = _facts(spark, range(2000))
        keys = _keys(spark, range(0, 2000, 11))
        n_small = bloom_semi_join(facts, "k", keys, "key", 256).count()
        n_big = bloom_semi_join(facts, "k", keys, "key", 1 << 16).count()
        assert n_big <= n_small
        assert n_big >= len(range(0, 2000, 11))

    def test_empty_key_set_passes_nothing(self, spark):
        facts = _facts(spark, range(50))
        empty = _keys(spark, [])
        assert bloom_semi_join(facts, "k", empty, "key", 1024).count() == 0

    def test_null_fact_keys_never_match(self, spark):
        facts = spark.createDataFrame(
            [(None, "a"), (3, "b")], "k long, payload string"
        )
        keys = _keys(spark, [3])
        got = bloom_semi_join(facts, "k", keys, "key", 1024).collect()
        assert [r["payload"] for r in got] == ["b"]

    def test_word_table_is_bounded_by_m_over_32(self, spark):
        words = bloom_filter_words(
            _keys(spark, range(10000)), "key", 512
        ).collect()
        assert len(words) <= 512 // 32
        assert all(r["word"] is not None for r in words)

    def test_payload_columns_survive_the_probe(self, spark):
        facts = _facts(spark, [1, 2, 3])
        keys = _keys(spark, [2])
        got = bloom_semi_join(facts, "k", keys, "key", 1 << 16)
        assert set(got.columns) == {"k", "payload"}
        assert got.filter(F.col("k") == 2).count() == 1


class TestFuzzyBlockedJoin:
    """j12: blocking + Levenshtein matching."""

    def test_comparison_stays_inside_blocks(self, spark):
        from big_data_flight_analytics_spark.operators.joins import (
            fuzzy_blocked_join,
        )

        a = spark.createDataFrame(
            [("widget", "cold"), ("bolt", "cold")], "noun string, x string"
        )
        b = spark.createDataFrame(
            [("widget", "cld"), ("rod", "cld")], "noun string, y string"
        )
        got = fuzzy_blocked_join(a, b, ["noun"], "x", "y").collect()
        assert len(got) == 1  # only the widget block pairs up
        assert got[0]["noun"] == "widget" and got[0]["lev"] == 1

    def test_max_dist_filters_and_distance_is_textbook(self, spark):
        from big_data_flight_analytics_spark.operators.joins import (
            fuzzy_blocked_join,
        )

        a = spark.createDataFrame(
            [("k", "kitten")], "blk string, x string"
        )
        b = spark.createDataFrame(
            [("k", "sitting"), ("k", "kitten")], "blk string, y string"
        )
        all_pairs = {
            (r["y"], r["lev"])
            for r in fuzzy_blocked_join(a, b, ["blk"], "x", "y").collect()
        }
        assert all_pairs == {("sitting", 3), ("kitten", 0)}
        kept = fuzzy_blocked_join(
            a, b, ["blk"], "x", "y", max_dist=2
        ).collect()
        assert [r["y"] for r in kept] == ["kitten"]

    def test_vowel_stripped_names_recover_their_originals(self, spark):
        from pyspark.sql import functions as FF

        from big_data_flight_analytics_spark.operators.joins import (
            fuzzy_blocked_join,
        )

        adjs = ["cold", "small", "large", "blue", "green", "red"]
        clean = spark.createDataFrame(
            [("widget", a) for a in adjs], "noun string, adj string"
        )
        dirty = clean.select(
            "noun",
            FF.regexp_replace("adj", "[aeiou]", "").alias("adj_dirty"),
            FF.col("adj").alias("truth"),
        )
        pairs = fuzzy_blocked_join(
            dirty, clean, ["noun"], "adj_dirty", "adj", max_dist=2
        )
        rows = pairs.collect()
        got = {(r["adj_dirty"], r["adj"]) for r in rows}
        # every dirty form recovers its own original within distance 2
        for a in adjs:
            stripped = "".join(ch for ch in a if ch not in "aeiou")
            assert (stripped, a) in got
        # ambiguous candidates exist (cld~red at 2 — real entity
        # resolution), but the TRUE original is always the strict
        # minimum-distance match for its dirty form
        best = {}
        for r in rows:
            cur = best.get(r["adj_dirty"])
            if cur is None or r["lev"] < cur[1]:
                best[r["adj_dirty"]] = (r["adj"], r["lev"])
        for a in adjs:
            stripped = "".join(ch for ch in a if ch not in "aeiou")
            assert best[stripped][0] == a
