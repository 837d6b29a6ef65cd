"""Distributed BPE learning == the sequential reference, merge-for-merge."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Row

from big_data_flight_analytics_spark.operators.bpe import (
    END,
    learn_bpe_merges,
    segment_with_merges,
    word_vocab,
)


def _reference_bpe(texts, n_merges, min_count=2):
    """Pure-python Sennrich-style BPE with the same tie-break."""
    vocab = Counter()
    for t in texts:
        for w in t.lower().split():
            vocab[tuple(list(w) + [END])] += 1
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, freq in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += freq
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        (a, b), _n = best
        merges.append((a, b))
        new_vocab = Counter()
        for syms, freq in vocab.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new_vocab[tuple(res)] += freq
        vocab = new_vocab
    return merges


class TestBpe:
    TEXTS = [
        "low lower lowest newer new news",
        "low low lower newest wide wider widest",
        "new newer news lowest widest wide",
    ]

    def test_learned_merges_match_reference_exactly(self, spark):
        docs = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(self.TEXTS)]
        )
        got = learn_bpe_merges(docs, n_merges=12)
        want = _reference_bpe(self.TEXTS, n_merges=12)
        assert got == want
        assert len(got) >= 8  # enough signal in the corpus to learn

    def test_segmentation_compresses_frequent_words(self, spark):
        docs = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(self.TEXTS)]
        )
        merges = learn_bpe_merges(docs, n_merges=12)
        low = segment_with_merges("low", merges)
        assert len(low) <= 2  # 'low' is frequent -> few symbols
        unseen = segment_with_merges("zzz", merges)
        assert unseen == ["z", "z", "z", END]  # falls back to chars

    def test_min_count_stops_learning(self, spark):
        docs = spark.createDataFrame([Row(doc_id=0, text="a b c d")])
        # every word is one char: the only pairs are (char, END), each
        # seen once -> below min_count=2, nothing learned
        assert learn_bpe_merges(docs, n_merges=5) == []

    def test_vocab_shape(self, spark):
        docs = spark.createDataFrame([Row(doc_id=0, text="aa Aa bb")])
        rows = {
            tuple(r["syms"]): r["freq"]
            for r in word_vocab(docs).collect()
        }
        # lowercased tokens: 'aa' twice, 'bb' once
        assert rows == {("a", "a", END): 2, ("b", "b", END): 1}

    def test_tokenize_matches_per_word_reference(self, spark):
        from big_data_flight_analytics_spark.operators.bpe import (
            tokenize_with_merges,
        )

        docs = spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(self.TEXTS)]
            + [Row(doc_id=99, text=None)]
        )
        merges = learn_bpe_merges(docs, n_merges=12)
        got = {
            r["doc_id"]: (list(r["bpe_tokens"]), r["n_bpe_tokens"])
            for r in tokenize_with_merges(docs, merges).collect()
        }
        for i, t in enumerate(self.TEXTS):
            want = []
            for w in t.lower().split():
                want.extend(segment_with_merges(w, merges))
            assert got[i] == (want, len(want))
        assert got[99] == ([], 0)  # null text -> empty tokenization

    def test_tokenize_is_map_only(self, spark):
        from big_data_flight_analytics_spark.operators.bpe import (
            tokenize_with_merges,
        )

        docs = spark.createDataFrame([Row(doc_id=0, text="a b")])
        plan = (
            tokenize_with_merges(docs, [("a", "</w>")])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan

    def test_merges_invariant_under_repartitioning(self, spark):
        """The learned table is a pure function of the corpus: identical
        merges from 1-partition and 13-partition layouts (the tie-break
        is what makes the argmax partition-independent)."""
        rows = [Row(doc_id=i, text=t) for i, t in enumerate(self.TEXTS * 3)]
        a = learn_bpe_merges(spark.createDataFrame(rows).coalesce(1), 8)
        b = learn_bpe_merges(
            spark.createDataFrame(rows).repartition(13), 8
        )
        assert a == b and len(a) == 8

    def test_loop_confs_restore_is_unset_aware(self, spark):
        """The loop's session-conf pin must restore a previously-UNSET
        conf to unset — not freeze the engine default as an explicit
        value (ADVICE r7)."""
        from big_data_flight_analytics_spark.operators.bpe import (
            _loop_confs,
        )

        key = "spark.sql.adaptive.enabled"
        before = spark.conf.get(key, None)
        try:
            spark.conf.unset(key)
            with _loop_confs(spark, 3):
                assert spark.conf.get(key) == "false"
                assert (
                    spark.conf.get("spark.sql.shuffle.partitions") == "3"
                )
            assert spark.conf.get(key, None) is None
            # explicitly-set values restore to the explicit value
            spark.conf.set(key, "true")
            with _loop_confs(spark, 2):
                assert spark.conf.get(key) == "false"
            assert spark.conf.get(key, None) == "true"
        finally:
            if before is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, before)


class TestBpeBatched:
    TEXTS = TestBpe.TEXTS

    def _docs(self, spark):
        return spark.createDataFrame(
            [Row(doc_id=i, text=t) for i, t in enumerate(self.TEXTS)]
        )

    def test_batch_k1_reduces_to_classic(self, spark):
        from big_data_flight_analytics_spark.operators.bpe import (
            learn_bpe_merges_batched,
        )

        classic = _reference_bpe(self.TEXTS, 8)
        batched = learn_bpe_merges_batched(self._docs(spark), 8, batch_k=1)
        assert batched == classic

    def test_batched_merges_are_round_disjoint_and_high_fidelity(
        self, spark
    ):
        from big_data_flight_analytics_spark.operators.bpe import (
            learn_bpe_merges_batched,
        )

        classic = set(_reference_bpe(self.TEXTS, 8))
        batched = learn_bpe_merges_batched(self._docs(spark), 8, batch_k=4)
        assert len(batched) == len(set(batched)) == 8
        # the fidelity trade is bounded: on this corpus the batched
        # table recovers most of the classic table (deviation only
        # where classic re-counts between adjacent merges)
        assert len(set(batched) & classic) >= 6

    def test_partition_invariance(self, spark):
        from big_data_flight_analytics_spark.operators.bpe import (
            learn_bpe_merges_batched,
        )

        a = learn_bpe_merges_batched(
            self._docs(spark).repartition(1), 6, batch_k=3
        )
        b = learn_bpe_merges_batched(
            self._docs(spark).repartition(7), 6, batch_k=3
        )
        assert a == b

    def test_disjoint_apply_equals_sequential_apply(self, spark):
        # one round's physical rewrite: applying a disjoint pair set in
        # a single pass must equal applying the pairs one at a time
        from big_data_flight_analytics_spark.operators.bpe import (
            _merge_disjoint_pairs,
            _merge_pair,
            word_vocab,
        )

        vocab = word_vocab(self._docs(spark))
        pairs = [("l", "o"), ("e", "r")]  # symbol-disjoint
        multi = {
            (tuple(r["syms"]), r["freq"])
            for r in _merge_disjoint_pairs(vocab, pairs).collect()
        }
        seq = vocab
        for a, b in pairs:
            seq = _merge_pair(seq, a, b)
        sequential = {
            (tuple(r["syms"]), r["freq"]) for r in seq.collect()
        }
        assert multi == sequential


class TestBpeMergeStageSharing:
    def test_single_learn_serves_t15_and_t16_in_shared_scope(
        self, spark, monkeypatch
    ):
        """In a single-pass (shared_stages) run, t15 and t16 must share
        ONE merge-table learn — the stage() seam, not two sequential
        learning loops."""
        import os

        import pytest as _pytest

        sf = "/root/testdata/sf0.001"
        if not os.path.exists(f"{sf}/documents.parquet"):
            _pytest.skip("testdata not present")

        import big_data_flight_analytics_spark.operators.bpe as bpe_mod
        from big_data_flight_analytics_spark.plans.extension_queries import (
            t15_bpe_merges,
            t16_bpe_tokenize,
        )
        from big_data_flight_analytics_spark.stages import shared_stages

        calls = {"n": 0}
        real = bpe_mod.learn_bpe_merges

        def counting(*a, **k):
            calls["n"] += 1
            return real(*a, **k)

        monkeypatch.setattr(bpe_mod, "learn_bpe_merges", counting)
        with shared_stages():
            n_rules = t15_bpe_merges(spark, sf).count()
            n_docs = t16_bpe_tokenize(spark, sf).count()
        assert calls["n"] == 1
        assert n_rules == 10 and n_docs == 500


class TestBpeApplyOracle:
    """Apply-side DuckDB differential: tokenize_with_merges vs the
    unrolled replace-chain SQL (`_bpe_apply_sql`) on real testdata.

    This is the r8 catalog candidate's oracle, verified in pytest now
    so promotion costs only a registration (the r7 breadth freeze
    admits no second new entry)."""

    def test_matches_duckdb_on_sf0001_documents(self, spark):
        import duckdb
        import os
        import pytest as _pytest

        sf = "/root/testdata/sf0.001"
        if not os.path.exists(f"{sf}/documents.parquet"):
            _pytest.skip("testdata not present")

        from big_data_flight_analytics_spark.operators.bpe import (
            learn_bpe_merges,
            tokenize_with_merges,
        )
        from big_data_flight_analytics_spark.plans.extension_queries import (
            BPE_MERGES,
            _bpe_apply_sql,
        )

        docs = spark.read.parquet(f"{sf}/documents.parquet")
        merges = learn_bpe_merges(docs, BPE_MERGES, min_count=1)
        got = {
            r["doc_id"]: (list(r["bpe_tokens"]), r["n_bpe_tokens"])
            for r in tokenize_with_merges(docs, merges).collect()
        }

        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS "
            f"SELECT * FROM '{sf}/documents.parquet'"
        )
        want = {
            int(r[0]): (list(r[1]), int(r[2]))
            for r in con.sql(_bpe_apply_sql()).fetchall()
        }
        assert set(got) == set(want)
        assert got == want
